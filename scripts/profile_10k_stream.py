"""10kbp e=5% align_iter steady state (real TPU, run SOLO).

The bench's cost+CIGAR co-headline shape: 2048-pair batches through the
pipelined runner with direct DT traces.  Caches pairs in /tmp.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np

CACHE = "/tmp/pairs_10k_e05.pkl"
if os.path.exists(CACHE):
    with open(CACHE, "rb") as f:
        batches = pickle.load(f)
else:
    from astarpa_tpu import generate
    batches = [
        generate.generate_batch(2048, 10_000, 0.05,
                                generate.ErrorModel.UNIFORM, seed=40 + k)
        for k in range(3)
    ]
    with open(CACHE, "wb") as f:
        pickle.dump(batches, f)
print("pairs ready", flush=True)

from astarpa_tpu import oracle
from astarpa_tpu.parallel.runner import BatchAligner

ba = BatchAligner(band_words=32, lane_multiple=2048)
t0 = time.perf_counter()
ba.align(batches[0])
print(f"warm0: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
ba.align(batches[0])
print(f"warm1: {time.perf_counter()-t0:.2f}s", flush=True)

for rep in range(2):
    stream = [batches[0], batches[1], batches[2], batches[1]]
    marks = [time.perf_counter()]
    outs = []
    for res, _st in ba.align_iter(iter(stream)):
        outs.append(res)
        marks.append(time.perf_counter())
    d = np.diff(marks)
    per_pair = d[1:].min() / 2048 * 1e3
    print(f"rep{rep}: periods {[f'{x:.2f}' for x in d]} "
          f"steady_min={d[1:].min():.2f}s = {per_pair:.3f} ms/pair "
          f"({2048*10_000/d[1:].min()/1e9:.4f} Gbp/s)", flush=True)
for (a, b), (c, cig) in zip(batches[1][:4], outs[-1][:4]):
    assert cig.verify(a, b) == c == oracle.levenshtein(a, b)
print("spot-verified", flush=True)
