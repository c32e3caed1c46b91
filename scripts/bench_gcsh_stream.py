"""gcsh vs plain: streaming cost at the small-batch 500kbp serving shape.

The gcsh claim: with domain builds PREFETCHED (batch k+1's native hull
builds run during batch k's device waits), the 4-5x thinner per-pair
bands beat the shared-band kernel even on this 1-core host.  Streams
8-pair 500kbp e=15% batches (padded to 128 lanes either way) through
cost_iter in both modes and reports steady-state periods.

Run SOLO:  python scripts/bench_gcsh_stream.py [mode ...]
"""
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np

with open("/tmp/c5_pairs.pkl", "rb") as f:
    pairs_a = pickle.load(f)
with open("/tmp/c5_pairs_b.pkl", "rb") as f:
    pairs_b = pickle.load(f)

batches = [pairs_a[:8], pairs_b[:8], pairs_a[8:16], pairs_b[8:16]]
modes = sys.argv[1:] or ["off", "gcsh"]

from astarpa_tpu import oracle
from astarpa_tpu.parallel import runner as rmod
from astarpa_tpu.parallel.runner import BatchAligner

ref0 = oracle.levenshtein_myers(*batches[0][0])

for mode in modes:
    ba = BatchAligner(band_words=2048, lane_multiple=128, domain_mode=mode)
    for w in range(2):
        t0 = time.perf_counter()
        costs = ba.cost(batches[0])
        print(f"{mode} warm{w}: {time.perf_counter()-t0:.2f}s "
              f"kernel={rmod.LAST_KERNEL}", flush=True)
    assert int(costs[0]) == ref0, (int(costs[0]), ref0)
    for rep in range(2):
        marks = [time.perf_counter()]
        outs = []
        for costs_k, _st in ba.cost_iter(iter(batches)):
            outs.append(costs_k)
            marks.append(time.perf_counter())
        d = np.diff(marks)
        assert int(outs[0][0]) == ref0
        print(f"{mode} rep{rep}: periods {[f'{x:.2f}' for x in d]} "
              f"steady_min={d[1:].min():.2f}s "
              f"({8*500_000/d[1:].min()/1e6:.2f} Mbp/s) "
              f"kernel={rmod.LAST_KERNEL}", flush=True)
