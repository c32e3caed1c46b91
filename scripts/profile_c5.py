"""Stage-level profile of config #5 (500kbp e=15% batch=128 cost).

Times pack (host numpy byte copy), upload+plane math, kernel dispatch,
readback, and ladder overhead separately, by monkeypatching timing hooks
around pack_batch_staggered and the kernel call.  Run SOLO (one core).
"""
import time
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

t_import0 = time.perf_counter()
from astarpa_tpu import generate
from astarpa_tpu.parallel import runner as runner_mod
from astarpa_tpu.parallel.runner import BatchAligner
from astarpa_tpu.ops import pallas_myers
print(f"imports: {time.perf_counter()-t_import0:.2f}s", flush=True)

STAGES = {}


def mark(name, dt):
    STAGES.setdefault(name, []).append(dt)


_orig_pack = pallas_myers.pack_batch_staggered


def timed_pack(pairs, lane_multiple=512, shape_quantum=None):
    t0 = time.perf_counter()
    out = _orig_pack(pairs, lane_multiple, shape_quantum)
    # The jitted _pack_planes is async; block to separate upload+planes
    # from kernel time.
    import jax
    jax.block_until_ready(out[0][:4])
    mark("pack_total", time.perf_counter() - t0)
    return out


pallas_myers.pack_batch_staggered = timed_pack
runner_mod.pack_batch_staggered = timed_pack

_orig_kernel = BatchAligner._kernel


def timed_kernel(self, *args, **kw):
    t0 = time.perf_counter()
    out = _orig_kernel(self, *args, **kw)
    import jax
    jax.block_until_ready(out)
    mark(f"kernel_dispatch_block(sw={args[6]})", time.perf_counter() - t0)
    return out


BatchAligner._kernel = timed_kernel

t0 = time.perf_counter()
import pickle, os
if os.path.exists("/tmp/c5_pairs.pkl"):
    with open("/tmp/c5_pairs.pkl", "rb") as f:
        c5_pairs = pickle.load(f)
else:
    c5_pairs = generate.generate_batch(128, 500_000, 0.15,
                                       generate.ErrorModel.UNIFORM, seed=7)
    with open("/tmp/c5_pairs.pkl", "wb") as f:
        pickle.dump(c5_pairs, f)
print(f"load/generate: {time.perf_counter()-t0:.2f}s", flush=True)

ba5 = BatchAligner(band_words=2048, lane_multiple=128, domain_mode="off")
t0 = time.perf_counter()
ba5.cost(c5_pairs[:2])
print(f"warm (2 pairs): {time.perf_counter()-t0:.2f}s", flush=True)

for rep in range(3):
    STAGES.clear()
    t0 = time.perf_counter()
    costs5, stats5 = ba5.cost_with_stats(c5_pairs)
    total = time.perf_counter() - t0
    lines = [f"run{rep}: total={total:.2f}s retries={stats5.band_retries}"]
    for k, v in STAGES.items():
        lines.append(f"  {k}: {sum(v):.2f}s over {len(v)} calls {['%.2f' % x for x in v]}")
    acc = sum(sum(v) for v in STAGES.values())
    lines.append(f"  other(host ladder/cert/np.asarray): {total-acc:.2f}s")
    print("\n".join(lines), flush=True)
