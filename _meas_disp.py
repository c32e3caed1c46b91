import time
import numpy as np
from astarpa_tpu import generate, oracle
from astarpa_tpu.parallel import runner as rmod
from astarpa_tpu.parallel.runner import BatchAligner
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered as _orig_pack
import astarpa_tpu.ops.pallas_myers as pm

N, E, B = 10_000, 0.05, 2048
batches = [generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=300+k)
           for k in range(4)]

ba = BatchAligner(band_words=32, lane_multiple=B, direct_dt=True)
ba.align(batches[0]); ba.align(batches[0])

# instrument: pack, kernel-call, cost-asarray
T = dict(pack=0.0, kern=0.0, read=0.0, jobs=0.0)
import astarpa_tpu.parallel.runner as R
orig_kernel = ba._kernel
def k2(*a, **kw):
    t0 = time.perf_counter(); r = orig_kernel(*a, **kw); T['kern'] += time.perf_counter()-t0; return r
ba._kernel = k2
def pack2(*a, **kw):
    t0 = time.perf_counter(); r = _orig_pack(*a, **kw); T['pack'] += time.perf_counter()-t0; return r
R.pack_batch_staggered = pack2  # not imported at module level in runner? check
orig_asarray = np.asarray
t_marks = []
for k in range(1, 4):
    T2 = dict(T)
    t0 = time.perf_counter()
    res, st, jobs = ba._align_dispatch(batches[k])
    t1 = time.perf_counter()
    ba._flush_traces(jobs, batches[k], res)
    t2 = time.perf_counter()
    print(f"batch{k}: dispatch={t1-t0:.2f}s (kern-call={T['kern']-T2['kern']:.2f}) flush={t2-t1:.2f}s", flush=True)
for (a, b), (c, cig) in zip(batches[3][:2], res[:2]):
    assert c == oracle.levenshtein(a, b) and cig.verify(a, b) == c
print("ok", flush=True)
