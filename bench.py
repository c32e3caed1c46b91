"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.json north star): aligned Gbp/s/chip.  Current benchmark
config: batched bitpacked cost-only NW via the Pallas staggered kernel on
1kbp e=1% pairs (BASELINE config #1); later rounds switch to the banded
10kbp e=5% config (#2) as the batched band-doubling pipeline lands.

``vs_baseline`` compares against the single-core A*PA2 reference kernel
throughput derived from the in-repo criterion snapshot
(`pa-bitpacking/bench.json` 256x64 scalar row = 1383.7ns => ~11.8 cells/ns,
x2 SIMD factor per `pa-bitpacking/src/lib.rs:6-7` => ~23.7 DP cells/ns/core).
For config #1 the reference would band-double (~n * 4*64 cells/pair), so its
aligned throughput is ~23.7e9 / 256 ~= 0.092 Gbp/s/core; we charge ourselves
actual wall time on the full rectangle.

Timing methodology: this environment tunnels the TPU through a proxy whose
``block_until_ready`` can return before execution completes and whose
input-transfer dominates single calls.  We therefore time K kernel
invocations chained *inside one jit* (inputs varied per iteration to
prevent hoisting) and force a host readback of the reduced result.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from astarpa_tpu import generate
    from astarpa_tpu.ops import pallas_myers

    n = 1000
    e = 0.01
    batch = 1024
    K = 20
    pairs = generate.generate_batch(batch, n, e, generate.ErrorModel.UNIFORM, seed=42)
    (a0, a1, pb0, pb1, ns, ms), _ = pallas_myers.pack_batch_staggered(
        pairs, lane_multiple=batch
    )

    @jax.jit
    def many(a0, a1, pb0, pb1, ns, ms):
        def body(i, acc):
            a0i = a0 ^ i.astype(jnp.uint32)
            c = pallas_myers.nw_cost(a0i, a1, pb0, pb1, ns, ms, lanes_per_program=256)
            return acc + c
        return jax.lax.fori_loop(0, K, body, jnp.zeros((batch,), jnp.int32))

    # Warmup / compile (forced readback).
    np.asarray(many(a0, a1, pb0, pb1, ns, ms))

    times = []
    for _ in range(4):
        t0 = time.perf_counter()
        np.asarray(many(a0, a1, pb0, pb1, ns, ms))
        times.append(time.perf_counter() - t0)
    dt = min(times) / K

    total_bp = batch * n
    gbps = total_bp / dt / 1e9
    S = pb0.shape[0]
    n_max = a0.shape[0]
    cells_per_s = n_max * S * 32 * batch / dt

    ref_gbps = 23.7e9 / (4 * 64) / 1e9  # ~0.0926

    result = {
        "metric": "aligned Gbp/s/chip (config#1: 1kbp e=1% cost-only, batch=1024)",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "vs_baseline": round(gbps / ref_gbps, 3),
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": batch,
            "pair_bp": n,
            "ms_per_batch": round(dt * 1e3, 4),
            "dp_cells_per_s": f"{cells_per_s:.3e}",
            "kernel": "pallas staggered (S x lanes uint32)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
