"""On-device parity check for the Pallas kernel at realistic shapes.

Run on real TPU (default env): python scripts/check_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from astarpa_tpu import generate, oracle
from astarpa_tpu.ops import pallas_myers


def main():
    rng = np.random.default_rng(7)
    pairs = [(b"ACTCGCT", b"AACTCGTT"), (b"A", b"T"), (b"ACGT", b"ACGT"), (b"AAAA", b"A")]
    for n in [1, 31, 32, 33, 100, 257, 1000]:
        for e in [0.0, 0.1, 0.5]:
            pairs.append(
                generate.generate_model(n, e, generate.ErrorModel.UNIFORM, int(rng.integers(1 << 31)))
            )
    for m in generate.ErrorModel:
        pairs.append(generate.generate_model(500, 0.15, m, 3))
    got = list(pallas_myers.nw_cost_pairs(pairs, lanes_per_program=256))
    want = [oracle.levenshtein(a, b) for a, b in pairs]
    assert got == want, [
        (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
    ]
    print(f"TPU parity OK on {len(pairs)} pairs")


if __name__ == "__main__":
    main()
