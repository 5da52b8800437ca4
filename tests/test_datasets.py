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


def test_distdataset_shard_local_and_remote_gets():
    """DDStore-mode DistDataset: each rank serves its shard over TCP; any
    rank fetches any sample (ref: utils/datasets/distdataset.py get +
    pyddstore one-sided windows). Two ranks simulated in-process."""
    import numpy as np

    from hydragnn_tpu.data.distdataset import DistDataset
    from hydragnn_tpu.graph import GraphSample

    rng = np.random.RandomState(0)
    data = [
        GraphSample(
            x=rng.randn(4, 2).astype(np.float32),
            pos=rng.randn(4, 3).astype(np.float32),
            edge_index=np.stack([[0, 1, 2], [1, 2, 3]]),
            y_graph=np.asarray([float(i)], np.float32),
        )
        for i in range(10)
    ]

    ds0 = DistDataset(data, process_index=0, process_count=2,
                      endpoints=["127.0.0.1:0", "127.0.0.1:0"])
    ds1 = DistDataset(data, process_index=1, process_count=2,
                      endpoints=[ds0.endpoints[0], "127.0.0.1:0"])
    ds0.endpoints[1] = ds1.endpoints[1]
    try:
        assert len(ds0) == len(ds1) == 10
        assert list(ds0.local_indices()) == list(range(5))
        assert list(ds1.local_indices()) == list(range(5, 10))
        ds0.epoch_begin()
        # local + remote gets from both sides, interleaved and repeated
        # (persistent connections must survive multiple requests)
        for i in [0, 7, 3, 9, 7, 2, 5]:
            got = ds0[i]
            np.testing.assert_allclose(got.y_graph, [float(i)])
            np.testing.assert_array_equal(got.x, data[i].x)
        for i in [6, 1, 0, 8, 4]:
            got = ds1[i]
            np.testing.assert_allclose(got.y_graph, [float(i)])
        ds0.epoch_end()
    finally:
        ds0.close()
        ds1.close()


def test_distdataset_without_endpoints_rejects_remote():
    import numpy as np
    import pytest as _pytest

    from hydragnn_tpu.data.distdataset import DistDataset
    from hydragnn_tpu.graph import GraphSample

    rng = np.random.RandomState(1)
    data = [
        GraphSample(
            x=rng.randn(3, 1).astype(np.float32),
            pos=rng.randn(3, 3).astype(np.float32),
            edge_index=np.stack([[0, 1], [1, 2]]),
            y_graph=np.zeros(1, np.float32),
        )
        for _ in range(4)
    ]
    ds = DistDataset(data, process_index=0, process_count=2)
    assert ds[0] is data[0]
    with _pytest.raises(IndexError):
        ds[3]
