"""Fine-grained pack + kernel profile of config #5 shapes.

Caches the generated pairs in /tmp so repeated profiling runs skip the
~77s generate.  Run SOLO.
"""
import os
import pickle
import time
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

CACHE = "/tmp/c5_pairs.pkl"


def load_pairs():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            return pickle.load(f)
    from astarpa_tpu import generate
    pairs = generate.generate_batch(128, 500_000, 0.15,
                                    generate.ErrorModel.UNIFORM, seed=7)
    with open(CACHE, "wb") as f:
        pickle.dump(pairs, f)
    return pairs


def main():
    import jax
    import jax.numpy as jnp
    from astarpa_tpu.ops import pallas_myers, bitpack
    from astarpa_tpu.parallel.runner import BatchAligner
    from astarpa_tpu.parallel import runner as runner_mod

    pairs = load_pairs()
    print("pairs loaded", flush=True)

    # --- stage A: host byte staging ---
    for rep in range(2):
        t0 = time.perf_counter()
        B0 = len(pairs)
        B = 128
        ns = np.array([len(a) for a, _ in pairs], dtype=np.int32)
        ms = np.array([len(b) for _, b in pairs], dtype=np.int32)
        n_max = max(8, int(ns.max()))
        S = max(1, bitpack.n_words(int(ms.max())))
        q = 2048
        n_q = -(-n_max // q) * q
        ratio = -(-(S * bitpack.W * 256) // n_max)
        n_max2 = n_q
        S2 = max(S, -(-(n_q * ratio) // (256 * bitpack.W)))
        acodes = np.zeros((B, n_max2), dtype=np.uint8)
        bcodes = np.full((B, S2 * bitpack.W), 0xFF, dtype=np.uint8)
        for idx, (a, b) in enumerate(pairs):
            acodes[idx, : len(a)] = np.frombuffer(a, np.uint8)
            bcodes[idx, : len(b)] = np.frombuffer(b, np.uint8)
        t_host = time.perf_counter() - t0
        print(f"rep{rep} host staging: {t_host:.3f}s  (n_max={n_max2} S={S2})",
              flush=True)

        # --- stage B: upload ---
        t0 = time.perf_counter()
        da = jax.device_put(acodes)
        db = jax.device_put(bcodes)
        jax.block_until_ready((da, db))
        t_up = time.perf_counter() - t0
        mb = (acodes.nbytes + bcodes.nbytes) / 1e6
        print(f"rep{rep} upload {mb:.0f}MB: {t_up:.3f}s "
              f"({mb/max(t_up,1e-9):.0f} MB/s)", flush=True)

        # --- stage C: device plane math ---
        t0 = time.perf_counter()
        planes = pallas_myers._pack_planes(da, db, S2)
        jax.block_until_ready(planes)
        t_planes = time.perf_counter() - t0
        print(f"rep{rep} _pack_planes (jit, device): {t_planes:.3f}s", flush=True)

        # --- stage C2: code-plane build (what pinned actually consumes) ---
        a0, a1, pb0, pb1 = planes

        @jax.jit
        def codeplane(a0, a1):
            return ((a0 & 1) | ((a1 & 1) << 1)).astype(jnp.uint32)

        t0 = time.perf_counter()
        cp = codeplane(a0, a1)
        jax.block_until_ready(cp)
        print(f"rep{rep} codeplane from a0/a1: {time.perf_counter()-t0:.3f}s",
              flush=True)

        # --- stage C3: direct code plane from uint8 codes (bypass a0/a1) ---
        @jax.jit
        def codeplane_direct(ac):
            return (((ac >> 1) & 3).astype(jnp.uint32)).T

        t0 = time.perf_counter()
        cp2 = codeplane_direct(da)
        jax.block_until_ready(cp2)
        print(f"rep{rep} codeplane direct from u8: {time.perf_counter()-t0:.3f}s",
              flush=True)
        del cp, cp2, planes, a0, a1, pb0, pb1, da, db

    # --- stage D: full kernel path timing with pinned internals ---
    ba5 = BatchAligner(band_words=2048, lane_multiple=128, domain_mode="off")
    ba5.cost(pairs[:2])
    from astarpa_tpu.ops import pinned as pinned_mod
    for rep in range(2):
        t0 = time.perf_counter()
        costs, stats = ba5.cost_with_stats(pairs)
        print(f"rep{rep} full cost_with_stats: {time.perf_counter()-t0:.2f}s "
              f"retries={stats.band_retries} kernel={runner_mod.LAST_KERNEL}",
              flush=True)


main()
