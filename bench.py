"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.json north star): aligned Gbp/s/chip on 10kbp e=5% pairs
(BASELINE config #2, cost path): the banded batched Myers kernel
(`astarpa_tpu/ops/pallas_banded.py`) at the smallest band that certifies
ALL of 4096 distinct generated pairs (SW=32; the shared-schedule
threshold pays each pair's |m-n| and bucket-skew, so the distinct-pair
tail needs one more word group than the old 8-replicated input),
exactness cross-checked against the NumPy oracle per run.

``vs_baseline`` compares against the single-core A*PA2 reference kernel
doing the *same banded work* (n * band_words * 32 cells/pair) at its
measured ~23.7 DP cells/ns/core (in-repo criterion snapshot
`pa-bitpacking/bench.json` 256x64 scalar row = 1383.7ns => ~11.8 cells/ns,
x2 SIMD factor per `pa-bitpacking/src/lib.rs:6-7`).

Timing methodology: this environment tunnels the TPU through a proxy whose
``block_until_ready`` can return before execution completes and whose
input-transfer dominates single calls.  We therefore time K kernel
invocations chained *inside one jit* (inputs varied per iteration to
prevent hoisting) and force a host readback of the reduced result.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

N = 10_000
E = 0.05
BATCH = 4096
BAND_WORDS = 32
K = 8

# Hard wall-clock cap: the TPU rides a tunnel that can wedge mid-run, and a
# hung readback would otherwise block the driver forever.
DEADLINE_S = int(os.environ.get("BENCH_DEADLINE_S", "2700"))
PROBE_TIMEOUT_S = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "420"))


def _fail_json(reason: str) -> None:
    print(
        json.dumps(
            {
                "metric": f"aligned Gbp/s/chip (config#2: {N}bp e={E} banded cost, batch={BATCH})",
                "value": 0.0,
                "unit": "Gbp/s",
                "vs_baseline": 0.0,
                "error": reason,
            }
        )
    )


def _probe_device() -> bool:
    """Check the TPU is reachable without risking an indefinite hang: device
    init + one tiny computation + host readback in a subprocess under a
    timeout."""
    code = (
        "import jax, jax.numpy as jnp; import numpy as np; "
        "d = jax.devices()[0]; "
        "print(float(np.asarray(jnp.ones((8, 128)).sum())), d.platform)"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=PROBE_TIMEOUT_S,
            capture_output=True,
        )
        return r.returncode == 0 and b"1024.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if not _probe_device():
        _fail_json(
            f"TPU device unreachable (init+readback probe timed out after "
            f"{PROBE_TIMEOUT_S}s — axon tunnel down?)"
        )
        return

    def _deadline(signum, frame):
        _fail_json(f"bench exceeded {DEADLINE_S}s deadline (tunnel wedged mid-run?)")
        os._exit(0)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(DEADLINE_S)

    import jax
    import jax.numpy as jnp

    from astarpa_tpu import generate, oracle
    from astarpa_tpu.ops import banded, pallas_banded, pallas_myers

    # 4096 DISTINCT pairs (round-2 verdict: 8 replicated pairs were fine
    # for kernel timing but thin for certification diversity).
    pairs = generate.generate_batch(
        BATCH, N, E, generate.ErrorModel.UNIFORM, seed=42
    )
    (a0, a1, pb0, pb1, ns, ms), _ = pallas_myers.pack_batch_staggered(
        pairs, lane_multiple=BATCH
    )

    # Exactness gate: certified band results must match the oracle.
    costs = np.asarray(
        pallas_banded.banded_cost_tpu(a0, a1, pb0, pb1, ns, ms, band_words=BAND_WORDS)
    )
    thr = banded.band_threshold(
        BAND_WORDS, np.asarray(ns), np.asarray(ms), a0.shape[0], pb0.shape[0] * 32
    )
    assert (costs <= thr).all(), "band too narrow for config #2"
    expected = [oracle.levenshtein(a, b) for a, b in pairs[:8]]
    assert list(costs[:8]) == expected, (list(costs[:8]), expected)

    @jax.jit
    def many(a0, a1, pb0, pb1, ns, ms):
        def body(i, acc):
            a0i = a0 ^ i.astype(jnp.uint32)
            c = pallas_banded.banded_cost_tpu(
                a0i, a1, pb0, pb1, ns, ms, band_words=BAND_WORDS
            )
            return acc + c

        return jax.lax.fori_loop(0, K, body, jnp.zeros((BATCH,), jnp.int32))

    # Warmup / compile (forced readback).
    np.asarray(many(a0, a1, pb0, pb1, ns, ms))

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(many(a0, a1, pb0, pb1, ns, ms))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K

    total_bp = BATCH * N
    gbps = total_bp / dt / 1e9
    cells_per_s = N * BAND_WORDS * 32 * BATCH / dt

    # Reference single core doing the same banded work at ~23.7 cells/ns.
    ref_gbps = 23.7e9 / (BAND_WORDS * 32) / 1e9

    # cost+CIGAR end-to-end (BASELINE north star includes CIGAR parity):
    # steady-state wall-clock of the pipelined streaming runner
    # (BatchAligner.align_iter, the serving shape): batch k's native traces
    # + checkpoint transfers drain while batch k+1 packs and dispatches.
    # Per batch: pack + ck kernel ladder + staged device->host checkpoint
    # readback + native DT-burst traceback.  On this single-core host
    # behind the ~7MB/s axon tunnel the trace+readback side is host/link-
    # bound; the device cost path above is the kernel metric.
    from astarpa_tpu.parallel.runner import BatchAligner

    cig_batch = 2048
    extra = generate.generate_batch(
        cig_batch, N, E, generate.ErrorModel.UNIFORM, seed=43
    )
    # 5 batches: the r5 align pipeline is depth 2 (dispatch_start(k+1)
    # precedes finish(k); yields trail by two batches), so a 3-batch
    # stream has a single thin mid-stream period sample.
    cig_batches = [
        pairs[:cig_batch],
        pairs[cig_batch:],
        extra,
        pairs[:cig_batch],
        extra,
    ]
    ba = BatchAligner(band_words=BAND_WORDS, lane_multiple=cig_batch)
    ba.align(cig_batches[0])  # compile/warm
    marks = [time.perf_counter()]
    outs = []
    for res, _st in ba.align_iter(iter(cig_batches)):
        outs.append(res)
        marks.append(time.perf_counter())
    for (a, b), (c, cig) in zip(cig_batches[-1][:8], outs[-1][:8]):
        assert c == oracle.levenshtein(a, b)
        assert cig.verify(a, b) == c
    # Steady state: exclude the ramp-in first yield (one extra dispatch)
    # and the drain-only last yield.
    per_batch = np.diff(marks)
    steady = per_batch[1:-1] if len(per_batch) > 2 else per_batch
    align_dt = float(steady.mean())
    align_gbps = cig_batch * N / align_dt / 1e9

    # North-star parity ratio (BASELINE.md: ">=10x aggregate aligned-bp/s
    # of single-core A*PA2" WITH CIGARs): measure the repo's own
    # single-core reference twin — AstarPa2Params presets over the native
    # block backend (`astarpa_tpu/aligners/astarpa2.py`, the faithful
    # re-expression of `astarpa2/src/lib.rs:38-53`) — on pairs from the
    # SAME 10kbp e=5% input, and report cost_cigar_gbps / ref_core_gbps.
    ref_core = {}
    try:
        from astarpa_tpu.aligners.astarpa2 import AstarPa2Params

        ref_pairs = pairs[:16]
        best, best_name = 0.0, None
        for name, mk in (("simple", AstarPa2Params.simple),
                         ("full", AstarPa2Params.full)):
            al = mk().make_aligner(True)
            c0, cig0 = al.align(*ref_pairs[0])  # warm: native lib, tables
            assert cig0.verify(*ref_pairs[0]) == c0
            t0 = time.perf_counter()
            for a, b in ref_pairs:
                al.align(a, b)
            gb = sum(len(a) for a, _ in ref_pairs) / (
                time.perf_counter() - t0
            ) / 1e9
            if gb > best:
                best, best_name = gb, name
        ref_core = {
            "ref_core_gbps": round(best, 5),
            "ref_core_preset": best_name,
            "cost_cigar_vs_ref_core": round(align_gbps / best, 2),
            "ref_core_note": (
                "repo's own A*PA2 twin (Python driver + native block "
                "kernels); its Python orchestration understates the Rust "
                "reference by roughly an order of magnitude, so read this "
                "with the cost-only vs_baseline ratio (reference kernel "
                "cells/ns) alongside"
            ),
        }
    except Exception as exc:  # pragma: no cover - bench resilience
        ref_core = {"ref_core_error": repr(exc)[:200]}

    # Config #5 (BASELINE): 500kbp ONT-like e=15% cost certification —
    # the big-band path (shared/per-pair pinned kernel with TB-shrunk
    # residency; round-2 verdict item 1).  Small batch: the metric is
    # per-bp throughput.
    c5 = {}
    try:
        from astarpa_tpu.parallel import runner as runner_mod

        c5_pairs = generate.generate_batch(
            128, 500_000, 0.15, generate.ErrorModel.UNIFORM, seed=7
        )
        c5b_pairs = generate.generate_batch(
            128, 500_000, 0.15, generate.ErrorModel.UNIFORM, seed=8
        )
        # e=15% distance (~0.13n) needs ~2048-word bands: start the ladder
        # there (the big-band pinned regime) instead of paying 6 failed
        # compile-heavy rungs.
        # Uniform same-length batches gain nothing from per-pair domains
        # (no skew/|m-n| terms to save); the shared big-band pinned path
        # is the product config here.
        del ba  # drop the streaming section's aligner (flush threads, hints)
        ba5 = BatchAligner(band_words=2048, lane_multiple=128,
                           domain_mode="off")
        # Warm TWICE on the full batch: the first run (2048-word start)
        # records the measured tight-band hint, the second compiles the
        # hint-start geometry the timed runs actually use (a hint-started
        # rung is a fresh kernel geometry; Mosaic caches it cross-process,
        # so this is one-time).
        ba5.cost(c5_pairs)
        ba5.cost(c5_pairs)
        t0 = time.perf_counter()
        costs5, stats5 = ba5.cost_with_stats(c5_pairs)
        c5_single = time.perf_counter() - t0
        # Config #5 IS the streaming config (BASELINE: "multi-host
        # streaming, 500kbp ONT-like e=15%"): the serving metric is the
        # steady-state per-batch period of the pipelined cost stream
        # (batch k+1's pack + dispatch overlap batch k's in-flight
        # kernel).  min over the steady periods absorbs the tunnel's ~2x
        # per-run transfer variance at this batch size.
        c5_stream = [c5_pairs, c5b_pairs, c5_pairs, c5b_pairs]
        marks5 = [time.perf_counter()]
        outs5 = []
        for costs_k, _st in ba5.cost_iter(iter(c5_stream)):
            outs5.append(costs_k)
            marks5.append(time.perf_counter())
        steady5 = np.diff(marks5)[1:]
        c5_dt = float(steady5.min())
        # Exact check via the full-height native Myers (the A* oracle
        # explodes at 15% divergence; numpy DP is intractable at 500kbp).
        ref_c = oracle.levenshtein_myers(*c5_pairs[0])
        assert int(costs5[0]) == ref_c, (int(costs5[0]), ref_c)
        ref_cb = oracle.levenshtein_myers(*c5b_pairs[0])
        assert int(outs5[1][0]) == ref_cb, (int(outs5[1][0]), ref_cb)
        assert int(outs5[0][0]) == ref_c
        c5 = {
            "config5_mbps": round(128 * 500_000 / c5_dt / 1e6, 2),
            "config5_s": round(c5_dt, 2),
            "config5_single_s": round(c5_single, 2),
            "config5_kernel": stats5.kernel,
            "config5_note": (
                "500kbp e=15% batch=128 cost, pipelined cost_iter steady "
                "state (min steady period of a 4-batch stream), "
                "oracle-spot-checked"
            ),
        }
        # CIGAR serving stream at the same shape: the depth-2 align
        # pipeline (r5) hides the native traces, the checkpoint readback,
        # and the pack behind the next batch's in-flight striped-ck
        # kernel — the full-parity flagship metric.
        try:
            ba5c = BatchAligner(band_words=2048, lane_multiple=128,
                                domain_mode="off", ck_col_block=16384)
            ba5c.align(c5_pairs)  # warm 1: hint + ck geometry compile
            ba5c.align(c5_pairs)  # warm 2: the hint-start rung sequence
            c5c_stream = [c5_pairs, c5b_pairs, c5_pairs, c5b_pairs,
                          c5_pairs]
            marks5c = [time.perf_counter()]
            outs5c = []
            for res_k, _st in ba5c.align_iter(iter(c5c_stream)):
                outs5c.append(res_k)
                marks5c.append(time.perf_counter())
            dt5c = float(np.diff(marks5c)[1:-1].min())
            cc, cigc = outs5c[-1][0]
            assert cc == ref_c and cigc.verify(*c5_pairs[0]) == cc
            ccb, cigcb = outs5c[1][0]
            assert ccb == ref_cb and cigcb.verify(*c5b_pairs[0]) == ccb
            c5.update(
                config5_cigar_ms_per_pair=round(dt5c / 128 * 1e3, 1),
                config5_cigar_mbps=round(128 * 500_000 / dt5c / 1e6, 2),
                config5_cigar_note=(
                    "500kbp e=15% batch=128 cost+CIGAR, depth-2 align "
                    "pipeline steady state (min mid period of a 5-batch "
                    "stream), CIGARs verified"
                ),
            )
        except Exception as exc:  # pragma: no cover - bench resilience
            c5["config5_cigar_error"] = repr(exc)[:200]
    except Exception as exc:  # pragma: no cover - bench resilience
        c5 = {"config5_error": repr(exc)[:200]}

    result = {
        "metric": f"aligned Gbp/s/chip (config#2: {N}bp e={E} banded cost, batch={BATCH})",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "vs_baseline": round(gbps / ref_gbps, 3),
        # Co-headline (BASELINE.md north star is distance + CIGAR parity):
        "cost_cigar_gbps": round(align_gbps, 4),
        **{k: v for k, v in ref_core.items()
           if k == "cost_cigar_vs_ref_core"},
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": BATCH,
            "pair_bp": N,
            "band_rows": BAND_WORDS * 32,
            "ms_per_batch": round(dt * 1e3, 4),
            "dp_cells_per_s": f"{cells_per_s:.3e}",
            "kernel": "pallas banded (SW x pairs-tile uint32)",
            "exactness": "certified + oracle-checked this run",
            "cost_cigar_gbps": round(align_gbps, 4),
            "cost_cigar_ms_per_pair": round(align_dt / cig_batch * 1e3, 3),
            "cost_cigar_batch": cig_batch,
            "cost_cigar_note": (
                "steady-state pipelined align_iter (batch k traces overlap "
                "batch k+1 pack/dispatch): pack + cost-kernel ladder + "
                "batched direct whole-pair DT traces from the certified "
                "costs (zero checkpoint readback at this cost scale); "
                "host side is 1 core behind a ~7MB/s device->host tunnel"
            ),
            **ref_core,
            **c5,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
