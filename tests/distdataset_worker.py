"""Subprocess worker for the multi-process DistDataset test: builds the
same deterministic dataset, serves its shard over TCP, fetches EVERY global
index (local + remote) and checks values (ref: DDStore one-sided gets,
hydragnn/utils/datasets/distdataset.py:160-183)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from hydragnn_tpu.graph import GraphSample  # noqa: E402
from hydragnn_tpu.data.distdataset import DistDataset  # noqa: E402


def make_data(n=23):
    rng = np.random.RandomState(7)
    out = []
    for i in range(n):
        nn = 4
        out.append(GraphSample(
            x=np.full((nn, 1), float(i), np.float32),
            pos=rng.randn(nn, 3).astype(np.float32),
            edge_index=np.asarray([[0, 1, 2, 3], [1, 2, 3, 0]]),
            y_graph=np.asarray([float(i) * 2.0], np.float32),
        ))
    return out


def main():
    rank = int(sys.argv[1])
    size = int(sys.argv[2])
    endpoints = sys.argv[3].split(",")
    barrier_dir = sys.argv[4] if len(sys.argv) > 4 else None
    data = make_data()
    ds = DistDataset(
        data, process_index=rank, process_count=size, endpoints=endpoints
    )
    # rendezvous: both servers must be up before cross-fetches start
    import time

    deadline = time.time() + 30
    while time.time() < deadline:
        try:
            ds.epoch_begin()
            for idx in range(len(ds)):
                s = ds[idx]
                assert float(s.x[0, 0]) == float(idx), (idx, s.x[0, 0])
                assert float(s.y_graph[0]) == 2.0 * idx
            ds.epoch_end()
            break
        except (ConnectionError, OSError):
            time.sleep(0.5)
    else:
        raise SystemExit("could not reach peer shard server")
    # second epoch reuses persistent connections
    ds.epoch_begin()
    remote = [i for i in range(len(ds)) if i not in ds.local_indices()]
    for idx in remote:
        assert float(ds[idx].x[0, 0]) == float(idx)
    ds.epoch_end()
    # barrier: keep this shard's server alive until every peer finished its
    # remote gets (otherwise the fast worker's exit kills the slow one's
    # data source — exactly the failure MPI window fencing prevents)
    if barrier_dir is not None:
        import time

        open(os.path.join(barrier_dir, f"done_{rank}"), "w").close()
        deadline = time.time() + 60
        while time.time() < deadline:
            if all(
                os.path.exists(os.path.join(barrier_dir, f"done_{r}"))
                for r in range(size)
            ):
                break
            time.sleep(0.1)
    ds.close()
    print(f"rank {rank}: OK ({len(remote)} remote gets)")


if __name__ == "__main__":
    main()
