import time
import numpy as np
from astarpa_tpu import generate, oracle
from astarpa_tpu.parallel.runner import BatchAligner

N, E, B = 10_000, 0.05, 2048
batches = [generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=200+k)
           for k in range(4)]

for direct in (True, False):
    ba = BatchAligner(band_words=32, lane_multiple=B, direct_dt=direct)
    ba.align(batches[0]); ba.align(batches[0])
    disp, flsh = [], []
    orig_d, orig_f = ba._align_dispatch, ba._flush_traces
    def timed_d(pairs, _o=orig_d):
        t0 = time.perf_counter(); r = _o(pairs); disp.append(time.perf_counter()-t0); return r
    def timed_f(jobs, pairs, results, _o=orig_f):
        t0 = time.perf_counter(); r = _o(jobs, pairs, results); flsh.append(time.perf_counter()-t0); return r
    ba._align_dispatch = timed_d
    ba._flush_traces = timed_f
    t0 = time.perf_counter()
    outs = [r for r, _ in ba.align_iter(iter(batches))]
    tot = time.perf_counter() - t0
    for (a, b), (c, cig) in zip(batches[-1][:2], outs[-1][:2]):
        assert c == oracle.levenshtein(a, b) and cig.verify(a, b) == c
    print(f"direct={direct} total={tot:.2f}s dispatch={np.round(disp,2).tolist()} flush={np.round(flsh,2).tolist()}", flush=True)
