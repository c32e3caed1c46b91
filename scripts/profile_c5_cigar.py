"""500kbp e=15% cost+CIGAR timing across checkpoint intervals (real TPU).

Uses the cached config #5 pairs (see profile_c5b.py); 8 real pairs on
128 lanes (the e=15% CIGAR serving shape).  Warm twice per aligner (band
hints change the rung sequence between call 1 and 2).  Run SOLO.
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np

CACHE = "/tmp/c5_pairs.pkl"
with open(CACHE, "rb") as f:
    pairs = pickle.load(f)
NP_ = int(sys.argv[1]) if len(sys.argv) > 1 else 8
CBS = [int(x) for x in sys.argv[2:]] or [4096, 8192, 16384]
pairs = pairs[:NP_]

from astarpa_tpu import oracle
from astarpa_tpu.parallel import runner as rmod
from astarpa_tpu.parallel.runner import BatchAligner

ref0 = oracle.levenshtein_myers(*pairs[0])

for CB in CBS:
    ba = BatchAligner(band_words=2048, lane_multiple=128, domain_mode="off",
                      ck_col_block=CB)
    for w in range(2):
        t0 = time.perf_counter()
        res = ba.align(pairs)
        print(f"CB={CB} warm{w}: {time.perf_counter()-t0:.2f}s "
              f"kernel={rmod.LAST_KERNEL}", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = ba.align(pairs)
        best = min(best, time.perf_counter() - t0)
    assert res[0][0] == ref0
    for (a, b), (c, cig) in zip(pairs[:2], res[:2]):
        assert cig.verify(a, b) == c
    print(f"CB={CB}: {best:.2f}s = {best/NP_:.3f} s/pair "
          f"({NP_*500_000/best/1e6:.2f} Mbp/s cost+CIGAR)", flush=True)
