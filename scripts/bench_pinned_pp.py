"""Benchmark the per-pair pinned kernel on real TPU: direct pallas call
(device-resident planes) vs the public API end-to-end, vs the shared
pinned kernel at identical geometry.

Usage: python scripts/bench_pinned_pp.py [n_bp] [sw] [B]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from astarpa_tpu import generate
from astarpa_tpu.ops import banded
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered
from astarpa_tpu.ops import pinned as P


def main():
    n_bp = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    sw = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    B_req = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    e = float(sys.argv[4]) if len(sys.argv) > 4 else 0.1

    pairs = [generate.uniform_seeded(n_bp, e, s) for s in range(B_req)]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    sched, thr = banded.pair_gap_schedule(
        np.asarray(n), np.asarray(m), sw, n_max, S
    )
    B = a0.shape[1]
    cells = n_max * sw * 32 * B

    # ---- direct pallas call on pre-staged planes
    n_np = np.asarray(n, np.int64)
    sched_np = np.ascontiguousarray(sched.astype(np.uint8))
    lo = np.cumsum(sched_np.astype(np.int32), axis=0)
    last_col = np.clip(n_np - 1, 0, n_max - 1)
    loend = lo[last_col, np.arange(B)].astype(np.int32)
    plan = P._plan_pp(
        lo.min(1).astype(np.int64), lo.max(1).astype(np.int64), sw, 1024
    )
    RW, TB, D, n_tb, T_pad = (
        plan["RW"], plan["TB"], plan["D"], plan["n_tb"], plan["T_pad"]
    )
    print(f"n={n_bp} sw={sw} B={B}: RW={RW} D={D} T_pad={T_pad}")
    ev = np.zeros((T_pad + 1, B), np.uint8)
    rows, cols = np.nonzero(sched_np)
    tt = rows + lo[rows, cols]
    ev[tt + (sw - 1), cols] |= 1
    ev[tt - 1, cols] |= 2
    ev[:sw] |= 1
    ev = ev[:T_pad]
    cap = np.zeros(T_pad + 1, np.uint8)
    tcap = (np.maximum(n_np, 1) - 1 + loend)[None, :] + np.arange(sw)[:, None]
    cap[np.minimum(tcap.reshape(-1), T_pad)] = 1
    cap_bits = P._pack_bits_np(cap[:T_pad])
    anye = P._pack_bits_np(np.bitwise_or.reduce(ev, axis=1) & 1)
    anya = P._pack_bits_np((np.bitwise_or.reduce(ev, axis=1) >> 1) & 1)
    S_pad = int(plan["base"].max()) + RW
    ntiles = B // 128
    pb0j = jnp.concatenate(
        [jnp.asarray(pb0),
         jnp.broadcast_to(jnp.asarray(pb0)[-1], (max(S_pad - S, 0), B))], 0
    )
    pb1j = jnp.concatenate(
        [jnp.asarray(pb1),
         jnp.broadcast_to(jnp.asarray(pb1)[-1], (max(S_pad - S, 0), B))], 0
    )
    code = ((jnp.asarray(a0) & 1) | ((jnp.asarray(a1) & 1) << 1)).astype(
        jnp.uint32
    )
    code = jnp.concatenate(
        [code, jnp.zeros((T_pad - n_max, B), jnp.uint32)], 0
    )
    argsd = [
        jnp.asarray(anye), jnp.asarray(anya), jnp.asarray(cap_bits),
        jnp.asarray(plan["base"]), jnp.asarray(plan["roll"]),
        jnp.moveaxis(pb0j.reshape(S_pad, ntiles, 128), 1, 0),
        jnp.moveaxis(pb1j.reshape(S_pad, ntiles, 128), 1, 0),
        jnp.moveaxis(code.reshape(T_pad, ntiles, 128), 1, 0),
        jnp.moveaxis(
            jnp.asarray(ev).astype(jnp.uint32).reshape(T_pad, ntiles, 128),
            1, 0,
        ),
        jnp.asarray(np.asarray(n, np.int32)).reshape(ntiles, 1, 128),
        jnp.asarray(np.asarray(m, np.int32)).reshape(ntiles, 1, 128),
        jnp.asarray(loend).reshape(ntiles, 1, 128),
    ]
    call = P._pinned_pp_call(RW, TB, D, sw, ntiles, n_tb, False)
    got = np.asarray(call(*argsd)).reshape(B) + np.asarray(n, np.int32)
    time.sleep(2)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(call(*argsd))
        best = min(best, time.perf_counter() - t0)
        time.sleep(2)
    print(f"pp-direct : best {best*1000:.0f} ms, {cells/best/1e12:.2f} Tcells/s",
          flush=True)

    # ---- public API end-to-end (host planning + event build + upload)
    def api():
        return np.asarray(
            P.pinned_cost_pp_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, schedule=sched
            )
        )

    r = api()
    assert (r[:B0] == got[:B0]).all(), "API result != direct result"
    time.sleep(2)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = api()
        best = min(best, time.perf_counter() - t0)
        time.sleep(2)
    print(f"pp-api    : best {best*1000:.0f} ms, {cells/best/1e12:.2f} Tcells/s",
          flush=True)

    # ---- shared pinned at same geometry
    def shr():
        return np.asarray(
            P.pinned_cost_tpu(a0, a1, pb0, pb1, n, m, band_words=sw)
        )

    _ = shr()
    time.sleep(2)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = shr()
        best = min(best, time.perf_counter() - t0)
        time.sleep(2)
    print(f"shared    : best {best*1000:.0f} ms, {cells/best/1e12:.2f} Tcells/s",
          flush=True)


if __name__ == "__main__":
    main()
