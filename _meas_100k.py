import time
import numpy as np
from astarpa_tpu import generate, oracle
from astarpa_tpu.parallel.runner import BatchAligner

N, E, B = 100_000, 0.10, 128
batches = [generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=500+k)
           for k in range(4)]

for direct in (True, False):
    ba = BatchAligner(band_words=32, lane_multiple=B, domain_mode="off", direct_dt=direct)
    ba.align(batches[0]); ba.align(batches[0])
    marks = [time.perf_counter()]
    outs = []
    for res, st in ba.align_iter(iter(batches)):
        outs.append(res); marks.append(time.perf_counter())
    per = np.diff(marks); steady = per[1:-1]
    a, b = batches[-1][0]; c, cig = outs[-1][0]
    assert c == oracle.levenshtein_myers(a, b) and cig.verify(a, b) == c
    print(f"direct={direct} steady={steady.mean():.2f}s/batch ({steady.mean()/B:.3f} s/pair) "
          f"per={np.round(per,2).tolist()} dt={st.direct_traces}", flush=True)
