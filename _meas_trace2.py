import numpy as np
from astarpa_tpu import generate, oracle, native
from astarpa_tpu.ops import banded

N, E = 10_000, 0.05
a, b = generate.generate_model(N, E, generate.ErrorModel.UNIFORM, seed=3)
d = oracle.levenshtein(a, b)
S = -(-len(b) // 32); n_max = len(a); diag = (n_max, S * 32)
sw = 32
shift = banded.shift_at_array(n_max, S, sw, diag)
c, cig = native.trace_direct(a, b, S, shift, sw, known_cost=d)
assert c == d and cig.verify(a, b) == d
print("ok d=", d, flush=True)
