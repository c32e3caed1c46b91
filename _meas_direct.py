import time
import numpy as np
from astarpa_tpu import generate, oracle
from astarpa_tpu.parallel.runner import BatchAligner

N, E, B = 10_000, 0.05, 2048
batches = [generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=100+k)
           for k in range(5)]

for direct in (False, True, False, True):
    ba = BatchAligner(band_words=32, lane_multiple=B, direct_dt=direct)
    # Warm TWICE: band hints change the rung sequence between calls.
    r0, st0 = ba.align_with_stats(batches[0])
    ba.align(batches[0])
    marks = [time.perf_counter()]
    outs = []
    for res, st in ba.align_iter(iter(batches)):
        outs.append(res)
        marks.append(time.perf_counter())
    per = np.diff(marks)
    steady = per[1:-1]
    for (a, b), (c, cig) in zip(batches[-1][:4], outs[-1][:4]):
        assert c == oracle.levenshtein(a, b) and cig.verify(a, b) == c
    print(f"direct={direct} steady={steady.mean()*1e3:.0f}ms/batch "
          f"({steady.mean()/B*1e3:.3f} ms/pair, {B*N/steady.mean()/1e9:.4f} Gbp/s) "
          f"per={np.round(per,2).tolist()} direct_traces={st0.direct_traces}", flush=True)
