"""Streaming config #5: steady-state cost_iter period on the real TPU.

Run SOLO.  Caches both 128-pair 500kbp batches in /tmp.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np


def cached(path, seed):
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    from astarpa_tpu import generate
    pairs = generate.generate_batch(128, 500_000, 0.15,
                                    generate.ErrorModel.UNIFORM, seed=seed)
    with open(path, "wb") as f:
        pickle.dump(pairs, f)
    return pairs


pairs_a = cached("/tmp/c5_pairs.pkl", 7)
pairs_b = cached("/tmp/c5_pairs_b.pkl", 8)
print("pairs ready", flush=True)

from astarpa_tpu.parallel import runner as rmod
from astarpa_tpu.parallel.runner import BatchAligner

ba5 = BatchAligner(band_words=2048, lane_multiple=128, domain_mode="off")
for w in range(2):
    t0 = time.perf_counter()
    ba5.cost(pairs_a)
    print(f"warm{w}: {time.perf_counter()-t0:.2f}s", flush=True)

for rep in range(2):
    stream = [pairs_a, pairs_b, pairs_a, pairs_b]
    marks = [time.perf_counter()]
    for costs_k, _st in ba5.cost_iter(iter(stream)):
        marks.append(time.perf_counter())
    d = np.diff(marks)
    print(f"rep{rep}: periods {[f'{x:.2f}' for x in d]} "
          f"steady_min={d[1:].min():.2f}s "
          f"({128*500_000/d[1:].min()/1e6:.2f} Mbp/s) "
          f"kernel={rmod.LAST_KERNEL}", flush=True)
