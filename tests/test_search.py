"""Semi-global search tests vs a NumPy semi-global DP oracle
(mirrors the reference's only Python-exposed API, `pa_python`)."""

import numpy as np
import pytest

from astarpa_tpu import generate
from astarpa_tpu.search import search
from astarpa_tpu.types import CigarOp


def _rand_seq(rng, size: int) -> bytes:
    return rng.choice(np.frombuffer(b"ACGT", np.uint8), size=size).tobytes()


def semiglobal_oracle(pattern: bytes, text: bytes, unmatched: float):
    """Dense DP with free top edge and fractional left-column costs,
    matching the reference's v0 seeding exactly."""
    m, n = len(pattern), len(text)
    # A seed bit at row idx adds +1 to all D[j > idx][0].
    left = np.zeros(m + 1, np.int64)
    if unmatched > 0:
        i = 0
        while True:
            idx = int(np.ceil(i / unmatched))
            if idx >= m:
                break
            left[idx + 1 :] += 1
            i += 1
    D = np.zeros((m + 1, n + 1), np.int64)
    D[:, 0] = left
    wild = {ord("N"): b"ACGT", ord("*"): b"ACGT", ord("Y"): b"CT", ord("R"): b"AG"}

    def is_match(pj, tc):
        if pj in wild:
            return tc in wild[pj]
        return pj == tc

    for j in range(1, m + 1):
        for i in range(1, n + 1):
            sub = D[j - 1][i - 1] + (0 if is_match(pattern[j - 1], text[i - 1]) else 1)
            D[j][i] = min(sub, D[j - 1][i] + 1, D[j][i - 1] + 1)
    out = list(D[m, :]) + list(D[:m, n][::-1] + (left[m] - left[:m][::-1]))
    return out, D


def test_reference_docstring_example():
    res = search(b"AC", b"CTTACTTA", 0.0)
    assert res.out == [0, 0, 1, 2, 1, 0, 1, 2, 1, 0, 0]


@pytest.mark.parametrize("unmatched", [0.0, 0.5, 1.0])
@pytest.mark.parametrize("plen", [5, 17, 32, 47, 64])
def test_search_out_vs_oracle(plen, unmatched):
    rng = np.random.default_rng(plen * 10 + int(unmatched * 10))
    for trial in range(3):
        text = _rand_seq(rng, 150)
        pattern = _rand_seq(rng, plen)
        res = search(pattern, text, unmatched)
        exp, _ = semiglobal_oracle(pattern, text, unmatched)
        assert res.out == exp, (trial, pattern, text)


def test_search_wildcards():
    rng = np.random.default_rng(5)
    text = _rand_seq(rng, 120)
    pattern = bytearray(_rand_seq(rng, 20))
    pattern[3] = ord("N")
    pattern[7] = ord("*")
    pattern[11] = ord("Y")
    pattern[15] = ord("R")
    pattern = bytes(pattern)
    res = search(pattern, text, 0.0)
    exp, _ = semiglobal_oracle(pattern, text, 0.0)
    assert res.out == exp


def test_search_finds_embedded_pattern():
    rng = np.random.default_rng(9)
    pattern = _rand_seq(rng, 30)
    noise1 = _rand_seq(rng, 70)
    noise2 = _rand_seq(rng, 50)
    text = noise1 + pattern + noise2
    res = search(pattern, text, 0.0)
    end = len(noise1) + len(pattern)
    assert res.out[end] == 0
    cigar, poss = res.trace(end)
    assert poss[0] == (len(noise1), 0)
    assert poss[-1] == (end, len(pattern))
    assert all(e.op == CigarOp.MATCH for e in cigar.ops)


def test_search_trace_costs():
    rng = np.random.default_rng(11)
    pattern = _rand_seq(rng, 25)
    a, b = generate.uniform_seeded(25, 0.2, 3)
    text = _rand_seq(rng, 40) + b + _rand_seq(rng, 40)
    res = search(a, text, 0.0)
    # Every bottom-row index must trace to a CIGAR of exactly its cost.
    for idx in range(0, len(text) + 1, 7):
        cigar, poss = res.trace(idx)
        cost = sum(e.cnt for e in cigar.ops if e.op != CigarOp.MATCH)
        assert cost == res.out[idx]
        # The path consumes the whole pattern down to a free start.
        assert poss[-1][1] == len(a)


def test_search_trace_right_column():
    res = search(b"ACGTACGT", b"TTACGTAC", 0.0)
    n = 8
    for idx in range(n + 1, len(res.out), 3):
        cigar, poss = res.trace(idx)
        cost = sum(e.cnt for e in cigar.ops if e.op != CigarOp.MATCH)
        j_end = res.idx_to_pos(idx).j
        assert poss[-1][1] == j_end
        assert cost <= res.out[idx]
