"""gcsh vs plain at HIGH divergence (500kbp e=25%, 8 pairs).

Above ~e=20% the shared-band ladder needs ~2d/32 words — past the pinned
ceiling, onto the striped kernel — while gcsh hulls stay several times
thinner.  Run SOLO:  python scripts/bench_gcsh_highe.py [e] [n_pairs]
"""
import os
import pickle
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import numpy as np

E = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
NP_ = int(sys.argv[2]) if len(sys.argv) > 2 else 8
MODEL = os.environ.get("C5_MODEL", "uniform")

CACHE = f"/tmp/c5_pairs_e{E}_{MODEL}.pkl"
if os.path.exists(CACHE):
    with open(CACHE, "rb") as f:
        pairs = pickle.load(f)
else:
    from astarpa_tpu import generate
    model = {m.value: m for m in generate.ErrorModel}[MODEL]
    pairs = generate.generate_batch(NP_, 500_000, E, model, seed=21)
    with open(CACHE, "wb") as f:
        pickle.dump(pairs, f)
print("pairs ready", flush=True)

from astarpa_tpu import oracle
from astarpa_tpu.parallel import runner as rmod
from astarpa_tpu.parallel.runner import BatchAligner

t0 = time.perf_counter()
ref0 = oracle.levenshtein_myers(*pairs[0])
print(f"oracle d={ref0} ({ref0/500_000:.3f}n) in "
      f"{time.perf_counter()-t0:.1f}s", flush=True)

for mode in (sys.argv[3:] or ["gcsh", "off"]):
    ba = BatchAligner(band_words=2048, lane_multiple=128, domain_mode=mode)
    times = []
    for w in range(4):
        t0 = time.perf_counter()
        costs, st = ba.cost_with_stats(pairs)
        dt = time.perf_counter() - t0
        times.append(dt)
        print(f"{mode} run{w}: {dt:.2f}s kernel={rmod.LAST_KERNEL} "
              f"retries={st.band_retries}", flush=True)
    assert int(costs[0]) == ref0, (int(costs[0]), ref0)
    best = min(times[2:])
    print(f"{mode}: best warm {best:.2f}s "
          f"({NP_*500_000/best/1e6:.2f} Mbp/s)", flush=True)
