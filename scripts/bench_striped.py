"""Striped-kernel A/B bench: big-band / full-height geometries.

Times `ops.striped.striped_cost_tpu` (and pinned at comparable SW) with
the chained-jit methodology (tunnel-proof), static_windows=True so the
call is traced-safe inside the chain — conservative absolute numbers,
consistent across variants.

Usage: python scripts/bench_striped.py [--n 500000] [--sw 4096]
       [--ws 1024] [--tb 512] [--batch 128] [--reps 3] [--pinned]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=500_000)
    p.add_argument("--e", type=float, default=0.15)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--sw", type=int, default=4096)
    p.add_argument("--ws", type=int, default=1024)
    p.add_argument("--tb", type=int, default=512)
    p.add_argument("--K", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--pinned", action="store_true",
                   help="also time the pinned kernel at the same SW")
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from astarpa_tpu import generate
    from astarpa_tpu.ops import pallas_myers
    from astarpa_tpu.ops.striped import striped_cost_tpu

    B, n, SW = args.batch, args.n, args.sw
    base = generate.generate_batch(8, n, args.e,
                                   generate.ErrorModel.UNIFORM, seed=3)
    pairs = base * (B // 8)
    (a0, a1, pb0, pb1, ns, ms), _ = pallas_myers.pack_batch_staggered(
        pairs, lane_multiple=B
    )
    S = pb0.shape[0]
    print(f"geometry: n_max={a0.shape[0]} S={S} SW={SW} WS={args.ws} "
          f"TB={args.tb} B={B}", flush=True)

    def timed(name, fn):
        @jax.jit
        def many(a0, a1, pb0, pb1, ns, ms):
            def body(i, acc):
                c = fn(a0 ^ i.astype(jnp.uint32), a1, pb0, pb1, ns, ms)
                return acc + c
            return jax.lax.fori_loop(0, args.K, body,
                                     jnp.zeros((B,), jnp.int32))

        t0 = time.perf_counter()
        np.asarray(many(a0, a1, pb0, pb1, ns, ms))
        print(f"{name}: warm/compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(many(a0, a1, pb0, pb1, ns, ms))
            times.append(time.perf_counter() - t0)
        dt = min(times) / args.K
        cells = n * min(SW, S) * 32 * B
        print(name, json.dumps({
            "s_per_batch": round(dt, 3),
            "Tcells_per_s": round(cells / dt / 1e12, 3),
            "Mbp_per_s": round(n * B / dt / 1e6, 2),
        }), flush=True)

    timed(
        f"striped sw{SW} ws{args.ws} tb{args.tb}",
        functools.partial(striped_cost_tpu, band_words=SW,
                          stripe_words=args.ws, time_block=args.tb,
                          static_windows=True),
    )
    if args.pinned:
        from astarpa_tpu.ops.pinned import pinned_cost_tpu

        timed(
            f"pinned sw{SW}",
            functools.partial(pinned_cost_tpu, band_words=SW,
                              static_windows=True),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
