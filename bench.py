"""Benchmark driver: prints ONE JSON line with the headline metric.

Metric (BASELINE.json north star): aligned Gbp/s/chip. Current benchmark
config: batched bitpacked cost-only NW on 1kbp e=1% pairs (BASELINE config
#1); later rounds switch to the banded 10kbp e=5% config (#2) as the batch
band-doubling pipeline lands on device.

``vs_baseline`` compares against the single-core A*PA2 reference kernel
throughput derived from the in-repo criterion snapshot
(`pa-bitpacking/bench.json` 256x64 scalar row = 1383.7ns => ~11.8 cells/ns,
x2 SIMD factor per `pa-bitpacking/src/lib.rs:6-7` => ~23.7 DP cells/ns/core).
For config #1 (full-rectangle cost of 1kbp pairs) the reference would use
band-doubling (~n*4d cells); we charge it the same *aligned-bp* accounting:
reference aligned-bp/s on this config ~= 23.7e9 cells/s / (n * 4*max(d,64)
cells per pair) * n bp ~= 23.7e9 / (4*64) ~= 92 Mbp/s/core. This constant is
recorded below and revisited as the benchmark config upgrades.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from astarpa_tpu import generate
    from astarpa_tpu.aligners import nw
    from astarpa_tpu.ops import myers

    n = 1000
    e = 0.01
    batch = 512
    pairs = generate.generate_batch(batch, n, e, generate.ErrorModel.UNIFORM, seed=42)

    packed = nw.pack_batch(pairs)
    args = (
        packed["a0"], packed["a1"], packed["pb0"], packed["pb1"], packed["n"], packed["m"]
    )

    # Warmup / compile.
    costs = myers.nw_cost_batch(*args)
    costs.block_until_ready()

    # Timed runs.
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        costs = myers.nw_cost_batch(*args)
    costs.block_until_ready()
    dt = (time.perf_counter() - t0) / reps

    total_bp = sum(len(a) for a, _ in pairs)
    gbps = total_bp / dt / 1e9
    cells = int(packed["a0"].shape[1]) * int(packed["pb0"].shape[1]) * 32 * batch
    cells_per_s = cells * reps / (dt * reps)

    # Reference baseline for this config (see module docstring): ~0.092 Gbp/s.
    ref_gbps = 23.7e9 / (4 * 64) / 1e9

    result = {
        "metric": "aligned Gbp/s/chip (config#1: 1kbp e=1% cost-only, batch=512)",
        "value": round(gbps, 4),
        "unit": "Gbp/s",
        "vs_baseline": round(gbps / ref_gbps, 3),
        "detail": {
            "device": str(jax.devices()[0]),
            "batch": batch,
            "pair_bp": n,
            "seconds_per_batch": round(dt, 4),
            "dp_cells_per_s": f"{cells_per_s:.3e}",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
