#!/usr/bin/env python
"""Kernel-variant micro-benchmarks with self-checks.

The `pa-bitpacking` criterion bench equivalent (`benches/nw/main.rs`):
every variant's distances are cross-checked against the NumPy oracle before
timing, and timing chains K invocations inside one jit with a forced
readback (see bench.py for why, on the axon TPU tunnel).

Usage: python scripts/bench_kernels.py [--batch 1024] [--n 10000] [--reps 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def time_variant(fn, args, batch, K=4, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(*a):
        def body(i, acc):
            return acc + fn(a[0] ^ i.astype(jnp.uint32), *a[1:])

        return jax.lax.fori_loop(0, K, body, jnp.zeros((batch,), jnp.int32))

    np.asarray(many(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(many(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / K


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--n", type=int, default=10000)
    p.add_argument("--e", type=float, default=0.05)
    p.add_argument("--band-words", type=int, default=24)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--skip-full", action="store_true",
                   help="skip the O(n*m) full-rectangle variants")
    args = p.parse_args()

    import functools

    import jax

    from astarpa_tpu import generate, oracle
    from astarpa_tpu.ops import banded, myers, pallas_banded, pallas_myers

    B, n, e, SW = args.batch, args.n, args.e, args.band_words
    pairs = generate.generate_batch(8, n, e, generate.ErrorModel.UNIFORM, seed=3)
    pairs = pairs * (B // 8)
    (a0, a1, pb0, pb1, ns, ms), _ = pallas_myers.pack_batch_staggered(
        pairs, lane_multiple=B
    )
    expected = [oracle.levenshtein(a, b) for a, b in pairs[:8]]
    S = pb0.shape[0]
    on_tpu = jax.default_backend() == "tpu"

    variants = {}
    variants["banded/jnp"] = (
        functools.partial(banded.banded_cost, band_words=SW),
        n * SW * 32,
    )
    if on_tpu:
        variants["banded/pallas"] = (
            functools.partial(pallas_banded.banded_cost_tpu, band_words=SW),
            n * SW * 32,
        )
    if not args.skip_full:
        variants["full/jnp-vmap"] = (
            lambda a0, a1, pb0, pb1, ns, ms: jax.vmap(myers.nw_cost_padded)(
                a0.T, a1.T, pb0.T, pb1.T, ns, ms
            ),
            n * S * 32,
        )
        if n <= 2500:
            # The staggered kernel holds the whole a-plane in VMEM —
            # config #1 shapes (~1kbp) only.
            variants["full/pallas-staggered"] = (
                functools.partial(pallas_myers.nw_cost, lanes_per_program=min(512, B)),
                n * S * 32,
            )

    results = {}
    for name, (fn, cells_per_pair) in variants.items():
        got = np.asarray(fn(a0, a1, pb0, pb1, ns, ms))[:8]
        ok = list(got) == expected
        if not ok and name.startswith("banded"):
            # Banded variants are upper bounds; only certified results must
            # match, which bench.py checks — report but continue.
            ok = all(g >= x for g, x in zip(got, expected))
        assert ok, (name, list(got), expected)
        dt = time_variant(fn, (a0, a1, pb0, pb1, ns, ms), B, reps=args.reps)
        results[name] = {
            "ms_per_batch": round(dt * 1e3, 3),
            "Tcells_per_s": round(cells_per_pair * B / dt / 1e12, 3),
            "Gbp_per_s": round(n * B / dt / 1e9, 3),
        }
        print(f"{name:24s} {json.dumps(results[name])}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
