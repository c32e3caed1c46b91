import numpy as np
import pytest

from astarpa_tpu.types import (
    Cigar,
    CigarOp,
    Pos,
    codes_to_seq,
    seq_to_codes,
)


def test_seq_codes_roundtrip():
    s = b"ACGTACGTTTGGCCAA"
    assert codes_to_seq(seq_to_codes(s)) == s


def test_codes_values():
    assert list(seq_to_codes(b"ACTG")) == [0, 1, 2, 3]


def test_cigar_push_merges():
    c = Cigar()
    c.push(CigarOp.MATCH, 3)
    c.push(CigarOp.MATCH, 2)
    c.push(CigarOp.SUB)
    assert c.to_string() == "5=1X"


def test_cigar_roundtrip():
    s = "10=2X3I4D1="
    assert Cigar.from_string(s).to_string() == s


def test_cigar_verify_ok():
    a = b"ACTCGCT"
    b = b"AACTCGTT"
    # One insertion of A at front, sub in the middle: cost 2.
    c = Cigar.from_string("1I5=1X1=")
    assert c.verify(a, b) == 2


def test_cigar_verify_bad_match_raises():
    with pytest.raises(AssertionError):
        Cigar.from_string("2=").verify(b"AC", b"AG")


def test_cigar_verify_incomplete_raises():
    with pytest.raises(AssertionError):
        Cigar.from_string("1=").verify(b"AC", b"AC")


def test_cigar_path():
    c = Cigar.from_string("2=1I1D")
    path = c.to_path()
    assert path[0] == Pos(0, 0)
    assert path[-1] == Pos(3, 3)
    assert len(path) == 5


def test_from_path():
    a, b = b"ACT", b"AGT"
    path = [Pos(0, 0), Pos(1, 1), Pos(2, 2), Pos(3, 3)]
    c = Cigar.from_path(a, b, path)
    assert c.to_string() == "1=1X1="
    assert c.verify(a, b) == 1
