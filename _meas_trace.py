import time
import numpy as np
from astarpa_tpu import generate, oracle, native
from astarpa_tpu.ops import banded

N, E = 10_000, 0.05
pairs = [generate.generate_model(N, E, generate.ErrorModel.UNIFORM, seed=s) for s in range(16)]
jobs = []
for a, b in pairs:
    d = oracle.levenshtein(a, b)
    S = -(-len(b) // 32); n_max = len(a); diag = (n_max, S * 32)
    sw = 32
    shift = banded.shift_at_array(n_max, S, sw, diag)
    jobs.append((a, b, S, shift, sw, d))

# warm
native.trace_direct(*jobs[0][:5], known_cost=jobs[0][5])
t0 = time.perf_counter()
for a, b, S, shift, sw, d in jobs:
    c, cig = native.trace_direct(a, b, S, shift, sw, known_cost=d)
    assert c == d
dt = (time.perf_counter() - t0) / len(jobs)
print(f"direct: {dt*1e3:.3f} ms/pair", flush=True)

import os
os.environ["ASTARPA_TRACE_PROF"] = "1"
native.trace_direct(*jobs[1][:5], known_cost=jobs[1][5])
