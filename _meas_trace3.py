import time
import numpy as np
from astarpa_tpu import generate, oracle, native
from astarpa_tpu.ops import banded

N = 10_000
for E in (0.01, 0.02, 0.05, 0.10, 0.15):
    ts = []
    for s in range(6):
        a, b = generate.generate_model(N, E, generate.ErrorModel.UNIFORM, seed=10*s+1)
        d = oracle.levenshtein(a, b)
        if d > 2048: break
        S = -(-len(b) // 32); diag = (len(a), S * 32)
        sw = min(S, max(8, -(-int(d*1.4)//32//8*8+8)))
        shift = banded.shift_at_array(len(a), S, sw, diag)
        t0 = time.perf_counter()
        c, cig = native.trace_direct(a, b, S, shift, sw, known_cost=d)
        ts.append(time.perf_counter() - t0)
        assert c == d
    if ts:
        print(f"e={E} d~{d} trace={min(ts)*1e3:.3f} ms", flush=True)
