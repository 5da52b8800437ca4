"""Benchmark: message-aggregation (SpMM) throughput vs HBM speed-of-light.

North-star metric (BASELINE.md): gather + segment-sum aggregation — THE hot
op of every message-passing layer — as a fraction of the HBM roofline per
chip. The roofline denominator is the gather+scatter formulation's minimum
HBM traffic (E*F message reads + N*F output writes + edge ids) — the
reference's torch_scatter path cannot beat it. This framework's default
path for small-uniform-graph batches (the workload below) is the slotted
dense block-diagonal adjacency bmm (collate(dense_adjacency='auto') →
ops/segment.adjacency_spmm): the [G, S, S] adjacency is built once per
batch at collate and reused across layers/steps, so the per-step device op
is ONE batched MXU matmul with no gather, no scatter, and no edge array —
it moves less than the scatter formulation's mandatory traffic and can
exceed fraction 1.0 of that roofline. Measured paths, fastest eligible
first: dense adjacency bmm, fused adjacency-block Pallas kernel, XLA
gather+segment_sum.

Workload: 1024 graphs x 128 nodes, average degree 16, F=128 (N=131k nodes,
E=2.1M edges) — the *batched molecular graph* structure this framework (and
the reference, which trains on atomistic datasets — SURVEY.md §2) actually
runs: node ids contiguous per graph, edges receiver-sorted, both endpoints of
every edge inside one graph. An earlier revision of this bench drew senders
uniformly over all 131k nodes; that is not a graph batch, and XLA's row
gather is strongly locality-sensitive (5.3 ms graph-local vs ~46 ms global-
random for the same E), so the old numbers understated the real path ~6x.

Measurement: `iters` SpMMs inside ONE lax.scan with a data dependency
between iterations — per-call timing on tunneled TPU runtimes measures
dispatch overhead and result-cache hits, not device time.

Robustness: the Pallas kernel's remote Mosaic compile can be slow on
tunneled TPU setups, so the measurement runs in a time-boxed subprocess and
falls back to the XLA path if it exceeds the deadline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import subprocess
import sys
import time


def hbm_bandwidth_bytes(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    table = {
        "tpu v5 lite": 819e9,  # v5e
        "tpu v5e": 819e9,
        "tpu v5p": 2765e9,
        "tpu v4": 1228e9,
        "tpu v6 lite": 1640e9,  # v6e (Trillium)
        "tpu v6e": 1640e9,
    }
    for k, v in table.items():
        if k in kind:
            return v
    return 819e9  # default to v5e


MEASURED_BW = 347e9  # streaming ceiling of the tunneled v5e (fetch-
# terminated elementwise probe; bench/results/device_calibration_r2.md)


def measure_giant() -> dict:
    """Giant single-graph SpMM: 131k-node / 1.05M-edge 2D Moore lattice,
    ordered by ``band_order`` (cost-model pick between natural raster and
    RCM — raster wins on the torus, its wrap edges absorbed by the band
    kernel's outlier tiles), through the BCSR band-aligned matmul
    (ops/bcsr.py, x_passes=2 ~1e-5 relative; fetch-terminated timing)."""
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "bench"))
    from giant_graph_spmm import lattice_graph

    from hydragnn_tpu.data.ordering import band_order
    from hydragnn_tpu.ops.bcsr import BandDir, build_bcsr, bcsr_spmm

    ei, n = lattice_graph((362, 362), "moore")
    perm = band_order(ei, n)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n)
    ei = inv[ei]
    order = np.argsort(ei[1])
    send, recv = ei[0][order], ei[1][order]
    e = send.shape[0]
    # production shape: collate pads node slots to lane multiples, so the
    # per-layer x carries a 128-aligned row count (the raw 362^2 = 131044
    # would otherwise re-pad — a full [N, F] copy — inside every call)
    n = -(-n // 128) * 128
    bc = build_bcsr(send, recv, None, n)
    x = jnp.asarray(np.random.RandomState(0).randn(n, 128).astype(np.float32))
    iters = 30

    @jax.jit
    def loop(v, b):
        def body(v, _):
            out = bcsr_spmm(v, b, 2)
            # 1-element in-place chain on the scan carry: keeps the
            # iteration data-dependent WITHOUT a full [N, F] elementwise
            # pass (which added ~0.3-0.4 ms/iter of pure HBM traffic to
            # every round-3 giant measurement)
            v = jax.lax.dynamic_update_slice(
                v, v[:1, :1] + out[:1, :1] * np.float32(1e-38), (0, 0)
            )
            return v, out[0, 0]

        return jax.lax.scan(body, v, None, length=iters)

    r = loop(x, bc)
    float(np.asarray(r[1])[-1])  # warm + flush (completion barrier)
    giant_dts = []
    for t in range(3):
        arg = x * np.float32(1.0 + (t + 1) * 1e-7)
        jax.block_until_ready(arg)
        t0 = time.perf_counter()
        r = loop(arg, bc)
        float(np.asarray(r[1])[-1])
        giant_dts.append((time.perf_counter() - t0) / iters)
    dt = min(giant_dts)

    # training-path figure: bf16 x, single MXU pass (what mixed-precision
    # training actually runs; the headline above stays fp32-exact)
    x16 = x.astype(jnp.bfloat16)

    @jax.jit
    def loop16(v, b):
        def body(v, _):
            out = bcsr_spmm(v, b, 1)
            v = jax.lax.dynamic_update_slice(
                v, (v[:1, :1].astype(jnp.float32)
                    + out[:1, :1].astype(jnp.float32)
                    * np.float32(1e-38)).astype(v.dtype), (0, 0)
            )
            return v, out[0, 0]

        return jax.lax.scan(body, v, None, length=iters)

    r = loop16(x16, bc)
    float(np.asarray(r[1])[-1])
    dt16 = float("inf")
    for t in range(3):
        arg = (x * np.float32(1.0 + (t + 1) * 1e-7)).astype(jnp.bfloat16)
        jax.block_until_ready(arg)
        t0 = time.perf_counter()
        r = loop16(arg, bc)
        float(np.asarray(r[1])[-1])
        dt16 = min(dt16, (time.perf_counter() - t0) / iters)
    bw = hbm_bandwidth_bytes(jax.devices()[0])
    # TWO traffic models, reported side by side (round-2 VERDICT asked for
    # the reconciliation): `roof` is the IDEAL gather+scatter formulation's
    # mandatory bytes (speed-of-light denominator — what any edge-list
    # kernel must move); `actual` is what the BCSR banded kernel moves
    # given its static tile structure (tiles once + x-chunk ring misses x
    # split passes + the fp32 output). fraction_vs_* = SoL fractions;
    # achieved_bw_* = kernel efficiency against its own traffic.
    roof = e * 128 * 4 + n * 128 * 4 + e * 8
    F = 128
    d_ = bc.fwd
    passes = 2
    if isinstance(d_, BandDir):
        # band windows are DMA'd whole per block (fp32, split in VMEM)
        actual = (
            d_.a.nbytes + d_.oa.nbytes
            + d_.num_blocks * d_.width * F * 4
            + d_.oa.shape[0] * d_.oa.shape[-1] * F * 4
            + d_.num_blocks * d_.block * F * 4
        )
    else:
        C = d_.a.shape[-1]
        n_misses = int(np.asarray(d_.dma_flag > 0).sum())
        actual = (
            d_.a.nbytes
            + n_misses * C * F * 2 * passes
            + d_.num_blocks * d_.block * F * 4
        )
    return {
        "giant_graph_fraction_vs_spec": round(roof / bw / dt, 4),
        "giant_graph_fraction_vs_measured_bw": round(
            roof / MEASURED_BW / dt, 4
        ),
        "giant_graph_actual_traffic_mb": round(actual / 1e6, 1),
        "giant_graph_achieved_bw_gbs": round(actual / dt / 1e9, 1),
        "giant_graph_achieved_bw_fraction_of_measured": round(
            actual / MEASURED_BW / dt, 4
        ),
        "giant_graph_ms": round(dt * 1e3, 3),
        "giant_graph_medges_per_s": round(e / dt / 1e6, 1),
        "giant_graph_bf16_ms": round(dt16 * 1e3, 3),
        "giant_graph_bf16_medges_per_s": round(e / dt16 / 1e6, 1),
        "giant_graph_n_trials": len(giant_dts),
        "giant_graph_trial_ms": [round(d * 1e3, 3) for d in giant_dts],
        "giant_graph_stdev_ms": round(float(np.std(giant_dts)) * 1e3, 3),
    }


def measure(path: str) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    bw = hbm_bandwidth_bytes(dev)

    G, NV, D, F = 1024, 128, 16, 128  # graphs, nodes/graph, avg degree
    N = G * NV
    E = N * D

    rng = np.random.RandomState(0)
    # batched-graph edge list: receiver-sorted, senders within the same graph
    gbase = np.repeat(np.arange(G, dtype=np.int64) * NV, NV * D)
    receivers = (gbase + np.repeat(np.tile(np.arange(NV), G), D)).astype(
        np.int32
    )
    senders = (gbase + rng.randint(0, NV, E)).astype(np.int32)
    x = rng.randn(N, F).astype(np.float32)

    xd = jax.device_put(jnp.asarray(x), dev)
    sd = jax.device_put(jnp.asarray(senders), dev)
    rd = jax.device_put(jnp.asarray(receivers), dev)

    if path == "dense":
        # default framework path for this workload (collate
        # dense_adjacency='auto'): host-built block-diagonal adjacency,
        # aggregation = one batched MXU bmm (ops/segment.adjacency_spmm).
        # The A build happens once per batch at collate (host, off the
        # device critical path) and is reused across every layer and the
        # backward — excluded from the timed loop exactly as in training.
        from hydragnn_tpu.ops.segment import adjacency_spmm

        A = np.zeros((G, NV, NV), np.float32)
        np.add.at(
            A,
            (
                receivers.astype(np.int64) // NV,
                receivers.astype(np.int64) % NV,
                senders.astype(np.int64) % NV,
            ),
            1.0,
        )
        import ml_dtypes

        Ad = jax.device_put(
            jnp.asarray(A.astype(ml_dtypes.bfloat16)), dev
        )  # exact: integer multiplicities < 256 (same as collate)
        spmm_fn = lambda v: adjacency_spmm(Ad, v)
    elif path == "pallas":
        # FUSED adjacency-block SpMM kernel: gather+reduce in one pass, no
        # [E, F] message intermediate in HBM (ops/pallas_spmm.py)
        from hydragnn_tpu.ops.pallas_spmm import _spmm_fused_impl

        wd = jnp.ones((E,), jnp.float32)
        # mask/unit-weight path: int8 adjacency build (exact multiplicities,
        # 2x MXU rate), single bf16 A term (exact < 256 edge multiplicity)
        spmm_fn = lambda v: _spmm_fused_impl(
            v, sd, rd, wd, N, a_passes=1, a_int8=True
        )
    else:
        spmm_fn = lambda v: jax.ops.segment_sum(
            v[sd], rd, N, indices_are_sorted=True
        )

    iters = 20

    # Time a scan of `iters` SpMMs inside ONE device program: remote/tunneled
    # runtimes add O(10ms) dispatch overhead per launch, which swamps the
    # device time of a ~ms kernel when timed call-by-call. The tiny
    # out-feedback (x += out * 1e-30) chains iterations so XLA can neither
    # reorder nor elide them; its cost (N*F adds) is negligible vs E*F.
    @jax.jit
    def spmm_loop(x):
        def body(x, _):
            out = spmm_fn(x)
            return x + out * np.float32(1e-30), out[0, 0]
        x, probe = jax.lax.scan(body, x, None, length=iters)
        return x, probe

    r = spmm_loop(xd)
    float(np.asarray(r[1])[-1])  # warm + flush: block_until_ready through
    # the tunnel is NOT a completion barrier — only a host FETCH is
    # (bench/results/device_calibration_r2.md methodology)
    trial_dts = []
    for trial in range(3):
        arg = xd * np.float32(1.0000001 + trial * 1e-7)
        jax.block_until_ready(arg)
        t0 = time.perf_counter()
        xf, probe = spmm_loop(arg)
        float(np.asarray(probe)[-1])
        trial_dts.append((time.perf_counter() - t0) / iters)
    dt = min(trial_dts)

    edges_per_s = E / dt
    bytes_moved = E * F * 4 + N * F * 4 + E * 8
    fraction = (bytes_moved / bw) / dt
    return {
        "metric": "spmm_aggregation_fraction_of_hbm_sol",
        "value": round(float(fraction), 4),
        "unit": f"fraction_of_scatter_SOL({edges_per_s:.3e}_edges_per_s,{path})",
        "vs_baseline": round(float(fraction), 4),
        "batched_fraction_vs_measured_bw": round(
            (bytes_moved / MEASURED_BW) / dt, 4
        ),
        "batched_ms": round(dt * 1e3, 3),
        # run-to-run variance made machine-readable: headline = min of
        # n_trials; drift vs a previous round within ~3 stdev is device/
        # tunnel attachment noise, not a regression (round-2/3 lesson:
        # the same program measured 1.34 -> 1.68 ms across re-attachments)
        "n_trials": len(trial_dts),
        "trial_ms": [round(d * 1e3, 3) for d in trial_dts],
        "stdev_ms": round(float(np.std(trial_dts)) * 1e3, 3),
        # vs_baseline denominates the measured time by a FIXED formula
        # (the gather+scatter formulation's mandatory bytes at the v5e
        # spec bandwidth), so run-to-run movement reflects the device/
        # tunnel attachment, not a workload change: round 1 measured the
        # same program at 1.34 ms, rounds 2-3 at 1.56-1.68 ms on the
        # re-attached device (bench/results/train_step_r3.md has the
        # round-3 variant sweep); round 3 adds the Pallas block-diagonal
        # bmm (ops/pallas_bmm.py) to claw the schedule back
        "denominator": "scatter_formulation_bytes / v5e_spec_819GBs",
    }


def _run_json(cmd, timeout):
    """Run a subprocess, return its last JSON stdout line (or None)."""
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        for line in reversed(out.stdout.splitlines()):
            if line.startswith("{"):
                return json.loads(line)
    except (subprocess.TimeoutExpired, json.JSONDecodeError):
        pass
    return None


def main():
    if len(sys.argv) > 1 and sys.argv[1] in ("--dense", "--pallas", "--xla"):
        print(json.dumps(measure(sys.argv[1][2:])))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--giant":
        print(json.dumps(measure_giant()))
        return
    # fastest eligible path first, each in a time-boxed subprocess (remote
    # Mosaic compiles can be slow on tunneled TPU runtimes)
    here = os.path.abspath(__file__)
    result = None
    for args, timeout in (
        (["--dense"], 900), (["--pallas"], 900), (["--xla"], 900)
    ):
        result = _run_json([sys.executable, here] + args, timeout)
        if result is not None:
            break
    if result is None:
        result = {
            "metric": "spmm_aggregation_fraction_of_hbm_sol",
            "value": 0.0, "unit": "bench_failed", "vs_baseline": 0.0,
        }
    # progressive output: the LAST complete JSON line is the answer, so a
    # driver-side kill between stages still leaves a valid result
    print(json.dumps(result), flush=True)
    # giant single-graph BCSR number alongside the batched one
    giant = _run_json([sys.executable, here, "--giant"], 800)
    if giant:
        result.update(giant)
        print(json.dumps(result), flush=True)
    # GFM-shape train-step MFU (EGNN h866 L4, bf16 — the SC25 config).
    # --fused: slotted collate + the fused per-graph-block edge kernel
    # (ops/pallas_egnn.py) — 32.9 ms vs 123 ms unfused in round 3. The
    # remote Mosaic compile can take ~10 min cold, hence the long box.
    ts = _run_json(
        [
            sys.executable,
            os.path.join(os.path.dirname(here), "bench", "train_step.py"),
            "--json", "--hidden", "866", "--bf16", "--fused",
            "--steps", "8", "--trials", "2",
        ],
        1500,
    )
    if ts is None:  # fused kernel compile timed out: record unfused
        ts = _run_json(
            [
                sys.executable,
                os.path.join(os.path.dirname(here), "bench",
                             "train_step.py"),
                "--json", "--hidden", "866", "--bf16", "--steps", "8",
                "--trials", "2",
            ],
            800,
        )
    if ts:
        result["train_step_ms"] = ts.get("ms_per_step")
        result["train_step_n_trials"] = ts.get("n_trials")
        result["train_step_trial_ms"] = ts.get("trial_ms_per_step")
        result["train_step_stdev_ms"] = ts.get("stdev_ms_per_step")
        result["train_step_mfu"] = ts.get("mfu_vs_spec_peak")
        result["train_step_mfu_vs_measured_peak"] = ts.get(
            "mfu_vs_measured_peak"
        )
        result["train_step_shape"] = ts.get("shape")
        print(json.dumps(result), flush=True)
    # the SC25 composed workload: GFM260 5+5-branch decoder set on the
    # same conv stack (round-4; bench/results/train_step_r4.md)
    mb = _run_json(
        [
            sys.executable,
            os.path.join(os.path.dirname(here), "bench", "train_step.py"),
            "--json", "--hidden", "866", "--bf16", "--fused",
            "--multibranch", "--steps", "8", "--trials", "2",
        ],
        1500,
    )
    if mb:
        result["multibranch_step_ms"] = mb.get("ms_per_step")
        result["multibranch_mfu"] = mb.get("mfu_vs_spec_peak")
        result["multibranch_mfu_vs_measured_peak"] = mb.get(
            "mfu_vs_measured_peak"
        )
        result["multibranch_trial_ms"] = mb.get("trial_ms_per_step")
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
