"""Affine cost models, affine NW, and diagonal transition vs oracles.

Oracle: a dense affine DP written independently here (Gotoh), plus the
unit-cost NumPy Levenshtein for the linear case."""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.affine import AffineCost
from astarpa_tpu.base import DiagonalTransition, NwAffine

INF = 1 << 28


def gotoh(a: bytes, b: bytes, sub: int, open_: int, extend: int) -> int:
    """Independent dense gap-affine oracle."""
    n, m = len(a), len(b)
    M = np.full((n + 1, m + 1), INF, np.int64)
    I = np.full((n + 1, m + 1), INF, np.int64)
    D = np.full((n + 1, m + 1), INF, np.int64)
    M[0, 0] = 0
    for j in range(1, m + 1):
        I[0, j] = open_ + extend * j
        M[0, j] = I[0, j]
    for i in range(1, n + 1):
        D[i, 0] = open_ + extend * i
        M[i, 0] = D[i, 0]
        for j in range(1, m + 1):
            I[i, j] = min(M[i, j - 1] + open_ + extend, I[i, j - 1] + extend)
            D[i, j] = min(M[i - 1, j] + open_ + extend, D[i - 1, j] + extend)
            s = 0 if a[i - 1] == b[j - 1] else sub
            M[i, j] = min(M[i - 1, j - 1] + s, I[i, j], D[i, j])
    return int(M[n, m])


CASES = [(30, 0.1), (60, 0.2), (90, 0.3), (50, 0.0)]


def _pairs(seed0):
    return [generate.uniform_seeded(n, e, seed0 + i) for i, (n, e) in enumerate(CASES)]


def test_nw_affine_unit_matches_levenshtein():
    for band in (False, True):
        nw = NwAffine(AffineCost.unit(), band_doubling=band)
        for a, b in _pairs(1):
            cost, cigar = nw.align(a, b)
            assert cost == oracle.levenshtein(a, b)
            assert cigar.verify(AffineCost.unit(), a, b) == cost


@pytest.mark.parametrize("sub,open_,extend", [(1, 1, 1), (2, 3, 1), (1, 4, 2)])
def test_nw_affine_gotoh(sub, open_, extend):
    cm = AffineCost.affine_model(sub, open_, extend)
    nw = NwAffine(cm, band_doubling=False)
    for a, b in _pairs(11):
        cost, cigar = nw.align(a, b)
        assert cost == gotoh(a, b, sub, open_, extend)
        assert cigar.verify(cm, a, b) == cost


def test_nw_affine_band_doubling_gotoh():
    cm = AffineCost.affine_model(2, 3, 1)
    nw = NwAffine(cm, band_doubling=True)
    for a, b in _pairs(21):
        cost, cigar = nw.align(a, b)
        assert cost == gotoh(a, b, 2, 3, 1)
        assert cigar.verify(cm, a, b) == cost


def test_nw_double_affine():
    cm = AffineCost.double_affine(1, 2, 2, 8, 1)
    nw = NwAffine(cm, band_doubling=False)
    for a, b in _pairs(31):
        cost, cigar = nw.align(a, b)
        assert cigar.verify(cm, a, b) == cost
        # Double affine <= each single-affine bound.
        assert cost <= gotoh(a, b, 1, 2, 2)
        assert cost <= gotoh(a, b, 1, 8, 1)


def test_dt_unit_cost():
    dt = DiagonalTransition()
    for a, b in _pairs(41) + [(b"", b"ACG"), (b"ACG", b""), (b"A", b"A")]:
        cost, cigar = dt.align(a, b)
        assert cost == oracle.levenshtein(a, b)
        assert cigar.verify(AffineCost.unit(), a, b) == cost


@pytest.mark.parametrize("sub,open_,extend", [(1, 1, 1), (2, 3, 1)])
def test_dt_affine(sub, open_, extend):
    cm = AffineCost.affine_asymmetric(sub, open_, extend, open_, extend)
    dt = DiagonalTransition(cm)
    for a, b in _pairs(51):
        cost, cigar = dt.align(a, b)
        assert cost == gotoh(a, b, sub, open_, extend), (a, b)
        assert cigar.verify(cm, a, b) == cost


def test_dt_divide_and_conquer():
    dt = DiagonalTransition(dc=True)
    for n, e in ((200, 0.1), (500, 0.15), (800, 0.05)):
        a, b = generate.uniform_seeded(n, e, n)
        cost, cigar = dt.align(a, b)
        assert cost == oracle.levenshtein(a, b)
        assert cigar.verify(AffineCost.unit(), a, b) == cost


def test_cost_model_queries():
    cm = AffineCost.affine_model(1, 2, 1)
    assert cm.gap_cost((0, 0), (0, 5)) == 2 + 5  # insert 5
    assert cm.gap_cost((0, 0), (5, 5)) == 0
    assert cm.extend_cost((0, 0), (5, 0)) == 5
    lin = AffineCost.unit()
    assert lin.gap_cost((0, 0), (3, 7)) == 4
    assert lin.min_ins_extend == 1 and lin.max_del_extend == 1
