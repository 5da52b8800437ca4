"""Dataset storage round-trips: array store (ADIOS-equivalent) and pickle
(ref: tests/test_datasetclass_inheritance.py:35-208)."""

import numpy as np
import pytest

from hydragnn_tpu.graph import GraphSample
from hydragnn_tpu.data.arraystore import GraphArrayStore, GraphStoreWriter
from hydragnn_tpu.data.pickledataset import (
    SimplePickleDataset,
    SimplePickleWriter,
)


def make_samples(n=7, seed=0):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        nn_ = rng.randint(3, 9)
        e = rng.randint(2, 12)
        out.append(
            GraphSample(
                x=rng.randn(nn_, 2).astype(np.float32),
                pos=rng.randn(nn_, 3).astype(np.float32),
                edge_index=np.stack(
                    [rng.randint(0, nn_, e), rng.randint(0, nn_, e)]
                ).astype(np.int64),
                y_graph=rng.randn(2).astype(np.float32),
                y_node=rng.randn(nn_, 1).astype(np.float32),
                energy=np.float32(rng.randn()),
                forces=rng.randn(nn_, 3).astype(np.float32),
                dataset_id=i % 3,
            )
        )
    return out


def assert_sample_equal(a: GraphSample, b: GraphSample):
    np.testing.assert_allclose(a.x, b.x)
    np.testing.assert_allclose(a.pos, b.pos)
    np.testing.assert_array_equal(a.edge_index, b.edge_index)
    np.testing.assert_allclose(a.y_graph, b.y_graph)
    np.testing.assert_allclose(a.y_node, b.y_node)
    np.testing.assert_allclose(a.energy, b.energy)
    np.testing.assert_allclose(a.forces, b.forces)
    assert a.dataset_id == b.dataset_id


@pytest.mark.parametrize("preload", [False, True])
def test_arraystore_roundtrip(tmp_path, preload):
    samples = make_samples()
    w = GraphStoreWriter(str(tmp_path / "store"), attrs={"pna_deg": [0, 1, 2]})
    w.extend(samples)
    w.save()
    ds = GraphArrayStore(str(tmp_path / "store"), preload=preload)
    assert len(ds) == len(samples)
    assert ds.attrs["pna_deg"] == [0, 1, 2]
    for i in range(len(samples)):
        assert_sample_equal(samples[i], ds[i])


def test_arraystore_multi_shard(tmp_path):
    s = make_samples(6)
    w0 = GraphStoreWriter(str(tmp_path / "store"), rank=0)
    w0.extend(s[:3]); w0.save()
    w1 = GraphStoreWriter(str(tmp_path / "store"), rank=1)
    w1.extend(s[3:]); w1.save()
    ds = GraphArrayStore(str(tmp_path / "store"))
    assert len(ds) == 6
    for i in range(6):
        assert_sample_equal(s[i], ds[i])


def test_pickle_roundtrip(tmp_path):
    samples = make_samples(5)
    SimplePickleWriter(samples, str(tmp_path / "pkl"), label="trainset",
                       nmax_persubdir=2, attrs={"minmax": [0, 1]})
    ds = SimplePickleDataset(str(tmp_path / "pkl"), label="trainset")
    assert len(ds) == 5
    assert ds.attrs["minmax"] == [0, 1]
    for i in range(5):
        assert_sample_equal(samples[i], ds[i])
