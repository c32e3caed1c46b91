import numpy as np
import pytest

from astarpa_tpu import generate, oracle

# Hardcoded tricky pairs, mirroring the reference harness's fixed cases
# (pa-test/src/lib.rs:7-20).
TRICKY = [
    (b"TTGGGTCAATCAGCCAGTTTTTA", b"TTTGAGTGGGTCATCACCGATTTTAT"),
    (b"ACTGACCAGT", b"CCGACAGGA"),
    (b"AGTTTTAT", b"ACCGATTTTTA"),
    (b"CTCTCTTCTCTCTCTA", b"CCTCTCTCTCTCCTCTC"),
    (b"AGTGGGTTGCCTTCATTCCG", b"AGTGGTGTCTTCAGGCCTTCATTCCG"),
    (b"GCACGTCGCCCCCCGCCCGCG", b"GCCCGCCCGCCCGCCCCCGCCCCC"),
    (b"", b""),
    (b"", b"ACGT"),
    (b"ACGT", b""),
    (b"A", b"T"),
]


def _naive(a: bytes, b: bytes) -> int:
    n, m = len(a), len(b)
    D = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        D[i][0] = i
    for j in range(m + 1):
        D[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i][j] = min(
                D[i - 1][j] + 1,
                D[i][j - 1] + 1,
                D[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return D[n][m]


@pytest.mark.parametrize("a,b", TRICKY)
def test_oracle_vs_naive(a, b):
    expected = _naive(a, b)
    assert oracle.levenshtein(a, b) == expected
    assert oracle.levenshtein_exp(a, b) == expected


def test_oracle_random_grid():
    rng = np.random.default_rng(0)
    for n in [1, 2, 5, 17, 64, 100]:
        for e in [0.0, 0.05, 0.3, 1.0]:
            a, b = generate.generate_model(n, e, generate.ErrorModel.UNIFORM, int(rng.integers(1 << 31)))
            expected = _naive(a, b)
            assert oracle.levenshtein(a, b) == expected
            assert oracle.levenshtein_exp(a, b) == expected


def test_oracle_align_cigar():
    for n, e in [(10, 0.2), (50, 0.1), (100, 0.3)]:
        for model in generate.ErrorModel:
            a, b = generate.generate_model(n, e, model, seed=n)
            cost, cigar = oracle.align(a, b)
            assert cost == oracle.levenshtein(a, b)
            assert cigar.verify(a, b) == cost


def test_generate_deterministic():
    a1, b1 = generate.generate_model(100, 0.1, generate.ErrorModel.UNIFORM, 42)
    a2, b2 = generate.generate_model(100, 0.1, generate.ErrorModel.UNIFORM, 42)
    assert a1 == a2 and b1 == b2


def test_generate_models_shapes():
    for model in generate.ErrorModel:
        a, b = generate.generate_model(200, 0.1, model, 7)
        assert len(a) > 0
        assert set(a) <= set(b"ACGT")
        assert set(b) <= set(b"ACGT")
        # Error rate sanity: edit distance should be positive but bounded.
        d = oracle.levenshtein(a, b)
        assert 0 < d <= 2 * 0.1 * 200 + 25
