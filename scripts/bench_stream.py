"""Steady-state cost+CIGAR throughput via the pipelined align_iter.

Times a stream of distinct-pair batches through BatchAligner.align_iter
(batch k's traces + checkpoint transfers drain while batch k+1 packs and
dispatches) and reports warm per-batch wall clock — the serving-shape
counterpart of bench.py's single align() co-headline.

Run from repo root: python scripts/bench_stream.py [n_bp] [e] [batch] [nbatch]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
E = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
B = int(sys.argv[3]) if len(sys.argv) > 3 else 512
NB = int(sys.argv[4]) if len(sys.argv) > 4 else 5
CKCB = int(sys.argv[5]) if len(sys.argv) > 5 else None

from astarpa_tpu import generate, oracle
from astarpa_tpu.parallel.runner import BatchAligner

batches = [
    generate.generate_batch(B, N, E, generate.ErrorModel.UNIFORM, seed=100 + k)
    for k in range(NB)
]

ba = BatchAligner(band_words=32, lane_multiple=B, ck_col_block=CKCB)
# Warm: compile + caches on batch 0's shapes.
ba.align(batches[0][: min(B, 64)])
ba.align(batches[0])

t0 = time.perf_counter()
marks = [t0]
outs = []
for res, stats in ba.align_iter(iter(batches)):
    outs.append(res)
    marks.append(time.perf_counter())
total = marks[-1] - t0

# Oracle spot-check on the last batch.
for (a, b), (c, cig) in zip(batches[-1][:4], outs[-1][:4]):
    assert c == oracle.levenshtein(a, b)
    assert cig.verify(a, b) == c

per = np.diff(marks)
# Steady state: exclude the ramp-in first yield (one extra dispatch) and
# the drain-only last yield (no overlapped dispatch — systematically
# cheap, it would overstate throughput).
steady = per[1:-1].mean() if len(per) > 2 else per.mean()
print(f"batches: {['%.0fms' % (d * 1e3) for d in per]}", flush=True)
print(
    f"steady-state: {steady*1e3:.0f} ms/batch  {steady/B*1e3:.3f} ms/pair  "
    f"{B*N/steady/1e9:.4f} Gbp/s cost+CIGAR",
    flush=True,
)
print(f"whole stream: {NB*B*N/total/1e9:.4f} Gbp/s over {NB} batches",
      flush=True)
