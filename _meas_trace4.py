import numpy as np
from astarpa_tpu import generate, oracle, native
from astarpa_tpu.ops import banded

N = 10_000
for E in (0.05, 0.10):
    a, b = generate.generate_model(N, E, generate.ErrorModel.UNIFORM, seed=51)
    d = oracle.levenshtein(a, b)
    S = -(-len(b) // 32); diag = (len(a), S * 32)
    sw = min(S, max(8, -(-int(d*1.4)//32//8*8+8)))
    shift = banded.shift_at_array(len(a), S, sw, diag)
    c, cig = native.trace_direct(a, b, S, shift, sw, known_cost=d)
    print("d=", d, flush=True)
