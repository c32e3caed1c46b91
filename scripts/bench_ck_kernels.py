"""Checkpoint-kernel A/B: pinned_ck vs striped_ck at big shared bands.

Times the ck-emitting kernels (cost + window planes + top_val) with the
chained-jit methodology; the planes stay device-resident (only the summed
cost vector reads back), so this isolates kernel rate from the readback.

Usage: python scripts/bench_ck_kernels.py [--n 500000] [--sw 2048]
       [--cb 16384] [--batch 128] [--reps 3] [--which both|pinned|striped]
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
    p.add_argument("--sw", type=int, default=2048)
    p.add_argument("--cb", type=int, default=16384)
    p.add_argument("--ws", type=int, default=512)
    p.add_argument("--tb", type=int, default=512)
    p.add_argument("--K", type=int, default=2)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--which", default="both",
                   choices=("both", "pinned", "striped"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from astarpa_tpu import generate
    from astarpa_tpu.ops import pallas_myers

    B, n, SW = args.batch, args.n, args.sw
    base = generate.generate_batch(8, n, args.e,
                                   generate.ErrorModel.UNIFORM, seed=3)
    pairs = base * (B // 8)
    (a0, a1, pb0, pb1, ns, ms), _ = pallas_myers.pack_batch_staggered(
        pairs, lane_multiple=B
    )
    S = pb0.shape[0]
    print(f"geometry: n_max={a0.shape[0]} S={S} SW={SW} CB={args.cb} B={B}",
          flush=True)

    def timed(name, fn):
        @jax.jit
        def many(a0, a1, pb0, pb1, ns, ms):
            def body(i, acc):
                costs = fn(a0 ^ i.astype(jnp.uint32), a1, pb0, pb1, ns, ms)[0]
                return acc + costs
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
        }), flush=True)

    if args.which in ("both", "striped"):
        import functools

        from astarpa_tpu.ops.striped import striped_ck_tpu

        timed(
            f"striped-ck sw{SW} cb{args.cb}",
            functools.partial(striped_ck_tpu, band_words=SW,
                              col_block=args.cb, stripe_words=args.ws,
                              time_block=args.tb, static_windows=True),
        )
    if args.which in ("both", "pinned"):
        import functools

        from astarpa_tpu.ops.pinned import pinned_ck_tpu

        timed(
            f"pinned-ck sw{SW} cb{args.cb}",
            functools.partial(pinned_ck_tpu, band_words=SW,
                              col_block=args.cb, static_windows=True),
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
