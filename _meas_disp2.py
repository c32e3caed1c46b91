import time
import numpy as np
from astarpa_tpu import generate, oracle
import astarpa_tpu.ops.pallas_myers as pm
from astarpa_tpu.parallel.runner import BatchAligner

N, E, B = 10_000, 0.05, 2048
batches = [generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=300+k)
           for k in range(4)]

ba = BatchAligner(band_words=32, lane_multiple=B, direct_dt=True)
ba.align(batches[0]); ba.align(batches[0])

T = dict(pack=0.0)
_orig_pack = pm.pack_batch_staggered
def pack2(*a, **kw):
    t0 = time.perf_counter(); r = _orig_pack(*a, **kw); T['pack'] += time.perf_counter()-t0; return r
pm.pack_batch_staggered = pack2

_oa = np.asarray
import builtins
for k in range(1, 4):
    p0 = T['pack']
    t0 = time.perf_counter()
    res, st, jobs = ba._align_dispatch(batches[k])
    t1 = time.perf_counter()
    print(f"batch{k}: dispatch={t1-t0:.2f}s pack={T['pack']-p0:.2f}s", flush=True)
    ba._flush_traces(jobs, batches[k], res)
