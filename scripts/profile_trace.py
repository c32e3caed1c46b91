"""Profile the native checkpoint traceback (host-only, no TPU needed).

Builds per-column window planes with the compiled jnp ``banded_fill`` on
CPU, derives the ck-kernel checkpoint contract (subsampled planes +
recomputed top_val) for several CB values, then times
``native.trace_banded_ck`` — so the DT-burst vs readback tradeoff is
measurable without the tunnel (or interpret mode) in the loop.

Run from the repo root:  JAX_PLATFORMS='' JAX_PLATFORM_NAME=cpu \
    python scripts/profile_trace.py [n_bp] [e] [n_pairs] [band_words]
"""

import sys
import time

sys.path.insert(0, ".")

import jax

# The axon sitecustomize latches JAX_PLATFORMS=axon before this script
# runs; pin CPU through the live config (see tests/conftest.py).
jax.config.update("jax_platforms", "cpu")

import numpy as np

from astarpa_tpu import generate, native
from astarpa_tpu.ops import banded
from astarpa_tpu.ops.bitpack import W
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
E = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
NP_ = int(sys.argv[3]) if len(sys.argv) > 3 else 8
SW = int(sys.argv[4]) if len(sys.argv) > 4 else 32

pairs = generate.generate_batch(NP_, N, E, generate.ErrorModel.UNIFORM, seed=3)
(a0, a1, pb0, pb1, ns, ms), B0 = pack_batch_staggered(pairs, lane_multiple=NP_)
n_max, S = a0.shape[0], pb0.shape[0]

t0 = time.perf_counter()
costs, vp_cols, vm_cols = banded.banded_fill(
    a0, a1, pb0, pb1, ns, ms, band_words=SW
)
costs = np.asarray(costs)[:B0]
vp_cols = np.asarray(vp_cols)  # (n_max, SW, B): state after column i+1
vm_cols = np.asarray(vm_cols)
print(f"[banded_fill on CPU: {time.perf_counter()-t0:.1f}s]", flush=True)

shift = banded.shift_at_array(n_max, S, SW)  # shift before column i (0-based)

# top_val after column C (1-based) = sum_{i<C} (1 + shift[i]*delta_i) with
# delta_i = popcount(vp[0]) - popcount(vm[0]) of the state BEFORE column i
# (i.e. after column i-1; all-ones init for i=0).  All columns are active
# here (equal-length pairs, n == n_max).
assert int(np.asarray(ns)[:B0].min()) == n_max
top_p = np.empty((n_max, B0), np.int64)
top_p[0] = W  # popcount of all-ones init word
top_p[1:] = np.bitwise_count(vp_cols[:-1, 0, :B0]).astype(np.int64) - \
    np.bitwise_count(vm_cols[:-1, 0, :B0]).astype(np.int64)
tv_all = np.cumsum(1 + shift[:, None] * top_p, axis=0)  # tv after col i+1

for CB in (256, 512, 1024, 2048, 4096, 8192, 16384):
    n_ck = n_max // CB + 1
    ckvp = np.zeros((n_ck, SW, B0), np.uint32)
    ckvm = np.zeros((n_ck, SW, B0), np.uint32)
    cktv = np.zeros((n_ck, B0), np.int32)
    ckvp[0] = 0xFFFFFFFF
    for k in range(1, n_ck):
        ckvp[k] = vp_cols[k * CB - 1, :, :B0]
        ckvm[k] = vm_cols[k * CB - 1, :, :B0]
        cktv[k] = tv_all[k * CB - 1]
    ck_bytes = (ckvp[:, :, 0].nbytes * 2 + cktv[:, 0].nbytes)

    # Warm + verify once.
    for slot in range(B0):
        a, b = pairs[slot]
        cost, cig = native.trace_banded_ck(
            a, b, S, ckvp[:, :, slot], ckvm[:, :, slot], cktv[:, slot],
            shift, SW, CB,
        )
        assert cost == costs[slot], (CB, slot, cost, costs[slot])
        assert cig.verify(a, b) == cost

    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        for slot in range(B0):
            a, b = pairs[slot]
            native.trace_banded_ck(
                a, b, S, ckvp[:, :, slot], ckvm[:, :, slot], cktv[:, slot],
                shift, SW, CB, known_cost=int(costs[slot]),
            )
    dt = (time.perf_counter() - t0) / (reps * B0)

    t0 = time.perf_counter()
    for slot in range(B0):
        a, b = pairs[slot]
        native.trace_banded_ck(
            a, b, S, ckvp[:, :, slot], ckvm[:, :, slot], cktv[:, slot],
            shift, SW, CB, use_dt=False,
        )
    dt_nodt = (time.perf_counter() - t0) / B0

    print(
        f"CB={CB:5d}  trace {dt*1e3:7.3f} ms/pair   (stripe-only "
        f"{dt_nodt*1e3:7.3f})   ck {ck_bytes/1024:7.1f} KB/pair",
        flush=True,
    )
