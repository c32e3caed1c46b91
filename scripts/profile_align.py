"""Phase-by-phase timing of the cost+CIGAR path on the real TPU.

Replicates one rung of ``BatchAligner._align_bucket_ck`` (band certifies
everything at 10kbp e=5% with band_words=32) with timers around each phase:
pack, upload, ck kernel, certified-slice gather, readback, native traces.

Run from repo root: python scripts/profile_align.py [batch]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = 10_000
E = 0.05
SW = 32

import jax

from astarpa_tpu import generate, native
from astarpa_tpu.ops import banded
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered
from astarpa_tpu.parallel.runner import BatchAligner

pairs = generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=42)

# Warm end-to-end first (compile).
ba = BatchAligner(band_words=SW, lane_multiple=B)
ba.align(pairs)
t0 = time.perf_counter()
res = ba.align(pairs)
total = time.perf_counter() - t0
print(f"align() warm total: {total*1e3:8.1f} ms  ({total/B*1e3:.3f} ms/pair)")

# -- phases ---------------------------------------------------------------
t0 = time.perf_counter()
args, B0 = pack_batch_staggered(pairs, B)
t_pack = time.perf_counter() - t0
a0, a1, pb0, pb1, n, m = args
n_max, S = a0.shape[0], pb0.shape[0]

t0 = time.perf_counter()
dev = [jax.device_put(x) for x in (a0, a1, pb0, pb1)]
jax.block_until_ready(dev)
t_up = time.perf_counter() - t0
a0d, a1d, pb0d, pb1d = dev

CB = max(1024, SW)
from astarpa_tpu.ops.pallas_banded import banded_ck_tpu

# warm the kernel at these shapes
got, ckvp, ckvm, cktv = banded_ck_tpu(
    a0d, a1d, pb0d, pb1d, n, m, band_words=SW, col_block=CB,
    pairs_per_program=_pp if (_pp := 512) and B >= 512 else 128,
)
_ = np.asarray(got)

t0 = time.perf_counter()
got, ckvp, ckvm, cktv = banded_ck_tpu(
    a0d, a1d, pb0d, pb1d, n, m, band_words=SW, col_block=CB,
    pairs_per_program=_pp,
)
costs = np.asarray(got)[:B0]
t_kernel = time.perf_counter() - t0

t0 = time.perf_counter()
sel = np.arange(B0)
ck_slices = (ckvp[:, :, sel], ckvm[:, :, sel], cktv[:, sel])
jax.block_until_ready(ck_slices)
t_gather = time.perf_counter() - t0

t0 = time.perf_counter()
vp = np.asarray(ck_slices[0])
vm = np.asarray(ck_slices[1])
tv = np.asarray(ck_slices[2])
t_read = time.perf_counter() - t0
ck_mb = (vp.nbytes + vm.nbytes + tv.nbytes) / 2**20

shift = banded.shift_at_array(n_max, S, SW)
t0 = time.perf_counter()
for slot in range(B0):
    a, b = pairs[slot]
    cost, cig = native.trace_banded_ck(
        a, b, S, vp[:, :, slot], vm[:, :, slot], tv[:, slot], shift, SW, CB,
    )
    assert cost == costs[slot]
t_trace = time.perf_counter() - t0

print(f"pack:        {t_pack*1e3:8.1f} ms")
print(f"upload:      {t_up*1e3:8.1f} ms")
print(f"ck kernel:   {t_kernel*1e3:8.1f} ms   (dispatch+exec+cost readback)")
print(f"ck gather:   {t_gather*1e3:8.1f} ms")
print(f"ck readback: {t_read*1e3:8.1f} ms   ({ck_mb:.1f} MB)")
print(f"traces:      {t_trace*1e3:8.1f} ms   ({t_trace/B0*1e3:.3f} ms/pair)")
acc = t_pack + t_up + t_kernel + t_gather + t_read + t_trace
print(f"sum:         {acc*1e3:8.1f} ms   vs align() {total*1e3:.1f} ms")
