"""Distributed in-memory dataset — the DDStore equivalent.

The reference's DDStore (ref: hydragnn/utils/datasets/distdataset.py:22-183;
adiosdataset.py:645-689) shards samples across MPI ranks and serves remote
``get``s through one-sided MPI windows with per-epoch fencing
(train_validate_test.py:469-563).

TPU-native mapping: each JAX *process* (host) keeps its contiguous shard in
RAM; the loader is shard-local — every host trains on its own shard and the
DistributedSampler semantics (disjoint per-rank subsets) are preserved by
construction, so cross-host random gets are not needed on the hot path.

For workloads that DO need any-rank random access (the reference's DDStore
contract, e.g. globally-shuffled sampling across hosts), pass
``endpoints=[...]``: every host runs a tiny TCP shard server (a thread) and
``__getitem__`` fetches remote samples over the host network — the TPU-pod
analogue of DDStore's one-sided MPI windows (host NICs / DCN; device ICI is
never involved in data loading). Connections are persistent and the protocol
is a length-prefixed pickle per request. ``epoch_begin/end`` keep API parity
with the reference's window fencing (reads are allowed at any time here).
"""

from __future__ import annotations

import pickle
import socket
import struct as _struct
import threading
from typing import List, Optional, Sequence

import numpy as np

from hydragnn_tpu.graph import GraphSample


def nsplit(seq: Sequence, n: int) -> List[List]:
    """Contiguous near-even split (ref: distributed.py:364-367)."""
    k, m = divmod(len(seq), n)
    out = []
    i = 0
    for j in range(n):
        step = k + (1 if j < m else 0)
        out.append(list(seq[i : i + step]))
        i += step
    return out


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("shard server connection closed")
        buf += chunk
    return buf


class ShardServer:
    """Serves this host's shard over TCP (DDStore window equivalent).

    Protocol: request = 8-byte big-endian local index; response = 8-byte
    length + pickled GraphSample. One thread per client connection (clients
    keep persistent sockets, so the thread count is ~process_count)."""

    def __init__(self, samples: Sequence[GraphSample], host: str, port: int):
        self.samples = samples
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.port = self.sock.getsockname()[1]  # resolved when port was 0
        self.sock.listen(64)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def _accept_loop(self):
        while not self._stop.is_set():
            try:
                conn, _ = self.sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._serve, args=(conn,), daemon=True
            ).start()

    def _serve(self, conn: socket.socket):
        try:
            while True:
                (idx,) = _struct.unpack(">q", _recv_exact(conn, 8))
                payload = pickle.dumps(
                    self.samples[idx], protocol=pickle.HIGHEST_PROTOCOL
                )
                conn.sendall(_struct.pack(">q", len(payload)) + payload)
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def close(self):
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass


class DistDataset:
    """ref: utils/datasets/distdataset.py:22-183.

    ``endpoints``: optional ``["host:port", ...]`` (one per process, index =
    process rank) enabling any-rank random gets: this process serves its
    shard at ``endpoints[rank]`` and fetches remote samples from the owner's
    server. Without endpoints, access is shard-local (the training hot path
    never needs more)."""

    def __init__(
        self,
        data: Sequence[GraphSample],
        label: str = "dataset",
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        endpoints: Optional[Sequence[str]] = None,
    ):
        import jax

        self.label = label
        rank = jax.process_index() if process_index is None else process_index
        size = jax.process_count() if process_count is None else process_count
        self.rank, self.size = rank, size
        shards = nsplit(list(data), size)
        self.local = shards[rank]
        self.shard_sizes = [len(s) for s in shards]
        self.offsets = np.concatenate([[0], np.cumsum(self.shard_sizes)])
        self.total = int(self.offsets[-1])

        self.endpoints = list(endpoints) if endpoints is not None else None
        self._server: Optional[ShardServer] = None
        self._conns: dict = {}
        self._lock = threading.Lock()
        if self.endpoints is not None:
            host, port = self.endpoints[rank].rsplit(":", 1)
            self._server = ShardServer(self.local, host, int(port))
            # rebroadcast the resolved port (":0" auto-pick, used in tests)
            self.endpoints[rank] = f"{host}:{self._server.port}"

    def __len__(self) -> int:
        return self.total

    def local_indices(self) -> range:
        return range(
            int(self.offsets[self.rank]), int(self.offsets[self.rank + 1])
        )

    def _remote_get(self, owner: int, local_idx: int) -> GraphSample:
        with self._lock:
            conn = self._conns.get(owner)
            if conn is None:
                host, port = self.endpoints[owner].rsplit(":", 1)
                conn = socket.create_connection((host, int(port)))
                conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
                self._conns[owner] = conn
            conn.sendall(_struct.pack(">q", local_idx))
            (n,) = _struct.unpack(">q", _recv_exact(conn, 8))
            return pickle.loads(_recv_exact(conn, n))

    def __getitem__(self, idx: int) -> GraphSample:
        owner = int(np.searchsorted(self.offsets, idx, side="right") - 1)
        if owner == self.rank:
            return self.local[idx - int(self.offsets[owner])]
        if self.endpoints is not None:
            return self._remote_get(owner, idx - int(self.offsets[owner]))
        raise IndexError(
            f"sample {idx} lives on process {owner}; shard-local loaders "
            "should only touch local_indices() — pass endpoints= for "
            "any-rank random gets (DDStore mode)"
        )

    # epoch fencing API parity (ref: train_validate_test.py:469-563)
    def epoch_begin(self) -> None:
        pass

    def epoch_end(self) -> None:
        pass

    def close(self) -> None:
        with self._lock:
            for c in self._conns.values():
                try:
                    c.close()
                except OSError:
                    pass
            self._conns.clear()
        if self._server is not None:
            self._server.close()
