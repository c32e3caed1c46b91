"""Oracle-based integration tests for the block band-doubling aligner.

Mirrors the reference test strategy (`pa-test/src/lib.rs`, SURVEY.md §4):
cost must equal the oracle exactly and the CIGAR must verify.
"""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.aligners.astarpa2 import AstarPa2Params, Domain
from astarpa_tpu.aligners.band import DoublingStart, DoublingType
from dataclasses import replace

TRICKY = [
    (b"TTGGGTCAATCAGCCAGTTTTTA", b"TTTGAGTGGGTCATCACCGATTTTAT"),
    (b"ACTGACCAGT", b"CCGACAGGA"),
    (b"AGTTTTAT", b"ACCGATTTTTA"),
    (b"CTCTCTTCTCTCTCTA", b"CCTCTCTCTCTCCTCTC"),
    (b"AGTGGGTTGCCTTCATTCCG", b"AGTGGTGTCTTCAGGCCTTCATTCCG"),
    (b"GCACGTCGCCCCCCGCCCGCG", b"GCCCGCCCGCCCGCCCCCGCCCCC"),
    (b"A", b"A"),
    (b"A", b"T"),
    (b"ACGT", b"ACGT"),
]


def check_aligner(aligner, a, b, ctx=""):
    expected = oracle.levenshtein(a, b)
    cost, cigar, _ = aligner.cost_or_align(a, b, True)
    assert cost == expected, f"{ctx}: cost {cost} != {expected} for {a!r} {b!r}"
    assert cigar is not None, ctx
    assert cigar.verify(a, b) == cost, ctx


def gen_grid(seed=1234, sizes=(1, 5, 20, 64, 100, 257, 512), errors=(0.0, 0.05, 0.2, 0.5)):
    rng = np.random.default_rng(seed)
    for n in sizes:
        for e in errors:
            for model in generate.ErrorModel:
                yield generate.generate_model(n, e, model, int(rng.integers(1 << 31))), (n, e, model)


@pytest.mark.parametrize("a,b", TRICKY)
def test_nw_tricky(a, b):
    check_aligner(AstarPa2Params.nw().make_aligner(True), a, b)


@pytest.mark.parametrize("a,b", TRICKY)
def test_simple_tricky(a, b):
    check_aligner(AstarPa2Params.simple().make_aligner(True), a, b)


def test_nw_grid():
    aligner = AstarPa2Params.nw().make_aligner(True)
    for (a, b), ctx in gen_grid(seed=1, sizes=(1, 20, 64, 100), errors=(0.0, 0.1, 0.5)):
        check_aligner(aligner, a, b, str(ctx))


def test_simple_grid():
    aligner = AstarPa2Params.simple().make_aligner(True)
    for (a, b), ctx in gen_grid(seed=2):
        check_aligner(aligner, a, b, str(ctx))


def test_simple_no_dt_trace_grid():
    params = replace(AstarPa2Params.simple(), dt_trace=False)
    aligner = params.make_aligner(True)
    for (a, b), ctx in gen_grid(seed=3, sizes=(20, 100, 300), errors=(0.05, 0.3)):
        check_aligner(aligner, a, b, str(ctx))


def test_gap_start_domain():
    params = replace(
        AstarPa2Params.simple(),
        domain=Domain.GAP_START,
        heuristic=None,
        doubling=DoublingType.band_doubling(DoublingStart.GAP, 2.0),
        sparse_h=False,
    )
    aligner = params.make_aligner(True)
    for (a, b), ctx in gen_grid(seed=4, sizes=(10, 100, 300), errors=(0.05, 0.2)):
        check_aligner(aligner, a, b, str(ctx))


def test_gap_gap_domain():
    params = replace(
        AstarPa2Params.simple(),
        domain=Domain.GAP_GAP,
        heuristic=None,
        doubling=DoublingType.band_doubling(DoublingStart.GAP, 2.0),
        sparse_h=False,
    )
    aligner = params.make_aligner(True)
    for (a, b), ctx in gen_grid(seed=5, sizes=(10, 100, 300), errors=(0.05, 0.2)):
        check_aligner(aligner, a, b, str(ctx))


def test_dijkstra_domain():
    from astarpa_tpu.heuristic.distances import NoCost

    params = replace(AstarPa2Params.simple(), heuristic=NoCost())
    aligner = params.make_aligner(True)
    for (a, b), ctx in gen_grid(seed=6, sizes=(10, 100), errors=(0.05, 0.2)):
        check_aligner(aligner, a, b, str(ctx))


def test_non_sparse_h():
    params = replace(AstarPa2Params.simple(), sparse_h=False)
    aligner = params.make_aligner(True)
    for (a, b), ctx in gen_grid(seed=7, sizes=(10, 150), errors=(0.1,)):
        check_aligner(aligner, a, b, str(ctx))


def test_longer_pair():
    a, b = generate.generate_model(2000, 0.05, generate.ErrorModel.UNIFORM, 99)
    check_aligner(AstarPa2Params.simple().make_aligner(True), a, b, "2kbp")


def test_cost_only():
    aligner = AstarPa2Params.simple().make_aligner(False)
    a, b = generate.generate_model(500, 0.1, generate.ErrorModel.UNIFORM, 17)
    assert aligner.cost(a, b) == oracle.levenshtein(a, b)


def _local_doubling_params(**over):
    return replace(
        AstarPa2Params.full(), doubling=DoublingType.local_doubling(), **over
    )


def test_local_doubling_grid():
    """Local doubling (working variant of `local_doubling.rs:4-243`, which
    the reference marks broken): oracle cost + verified CIGAR across the
    size/error grid."""
    aligner = _local_doubling_params().make_aligner(True)
    for (a, b), ctx in gen_grid(seed=8, sizes=(10, 100, 300, 700), errors=(0.05, 0.2)):
        check_aligner(aligner, a, b, str(ctx))


def test_local_doubling_tricky_and_adversarial():
    aligner = _local_doubling_params().make_aligner(True)
    for a, b in TRICKY:
        check_aligner(aligner, a, b, "tricky")
    # unrelated + reversed + high-error pairs exercise the grow/back-propagate
    # machinery (every block ends up at a large f).
    a1, _ = generate.generate_model(300, 0.0, generate.ErrorModel.UNIFORM, 11)
    a2, _ = generate.generate_model(300, 0.0, generate.ErrorModel.UNIFORM, 12)
    check_aligner(aligner, a1, a2, "unrelated")
    check_aligner(aligner, a1, bytes(a1[::-1]), "reversed")
    check_aligner(
        aligner, *generate.generate_model(500, 0.3, generate.ErrorModel.UNIFORM, 21),
        "high-error",
    )


def test_local_doubling_variants():
    """Both incremental-doubling modes and both h walks stay exact."""
    a, b = generate.generate_model(800, 0.12, generate.ErrorModel.UNIFORM, 31)
    for inc in (True, False):
        for sph in (True, False):
            aligner = _local_doubling_params(
                incremental_doubling=inc, sparse_h=sph
            ).make_aligner(True)
            check_aligner(aligner, a, b, f"inc={inc} sparse_h={sph}")
