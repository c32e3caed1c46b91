"""Native C++ A* runtime: parity vs the Python runtime and the oracle."""

import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.native import astarpa_native, available

pytestmark = pytest.mark.skipif(not available(), reason="no native toolchain")


@pytest.mark.parametrize("dt", [False, True], ids=["astar", "astar-dt"])
@pytest.mark.parametrize("prune", ["none", "start", "end", "both"])
@pytest.mark.parametrize("r", [1, 2])
def test_native_matrix(r, prune, dt):
    for k in (8, 12):
        seed = k * 100 + r
        for n in (20, 80, 200, 500):
            for e in (0.0, 0.1, 0.25):
                seed += 1
                a, b = generate.uniform_seeded(n, e, seed)
                cost, cigar = astarpa_native(a, b, r=r, k=k, prune=prune, dt=dt)
                assert cost == oracle.levenshtein(a, b), (n, e, k, r, prune, dt)
                assert cigar.verify(a, b) == cost


def test_native_csh():
    for seed in (1, 2, 3):
        a, b = generate.uniform_seeded(150, 0.15, seed)
        cost, cigar = astarpa_native(a, b, r=1, k=8, use_gap_cost=False)
        assert cost == oracle.levenshtein(a, b)
        assert cigar.verify(a, b) == cost


def test_native_matches_python_default():
    from astarpa_tpu.astar import astarpa as astarpa_py

    for seed in (5, 6):
        for model in generate.ErrorModel:
            a, b = generate.generate_model(300, 0.12, model, seed)
            c_native, g_native = astarpa_native(a, b)
            c_py, _ = astarpa_py(a, b)
            assert c_native == c_py
            assert g_native.verify(a, b) == c_native


def test_native_stats():
    a, b = generate.uniform_seeded(400, 0.1, 7)
    cost, cigar, stats = astarpa_native(a, b, r=1, k=10, with_stats=True)
    assert cost == oracle.levenshtein(a, b)
    assert stats["expanded"] > 0
    assert stats["explored"] >= stats["expanded"]
    assert stats["pruned"] > 0


def test_native_tricky():
    cases = [
        (b"A", b"A"),
        (b"A", b"C"),
        (b"ACGT" * 16, b"ACGT" * 16),
        (b"AAAAAAAAAAAAAAAA", b"TTTTTTTTTTTTTTTT"),
        (b"ACGTACGTACGTACGTACGT", b"ACGTACGTACGTACGTACGT"[::-1]),
    ]
    for a, b in cases:
        cost, cigar = astarpa_native(a, b, r=1, k=4)
        assert cost == oracle.levenshtein(a, b), (a, b)
        assert cigar.verify(a, b) == cost


def test_native_randomized_stress():
    """Randomized config sweep hammering the incremental contours ripple
    (the regime of the reference's own regression bugs: high error rates,
    small k, heavy pruning)."""
    import random

    rng = random.Random(99)
    models = list(generate.ErrorModel)
    for _ in range(150):
        n = rng.randrange(10, 400)
        e = rng.choice([0.0, 0.1, 0.3, 0.5, 1.0])
        a, b = generate.generate_model(n, e, rng.choice(models), rng.randrange(1 << 30))
        cost, cigar = astarpa_native(
            a, b,
            r=rng.choice([1, 2]),
            k=rng.choice([3, 4, 6, 8]),
            prune=rng.choice(["start", "end", "both", "none"]),
            dt=rng.random() < 0.5,
            use_gap_cost=rng.random() < 0.8,
        )
        assert cost == oracle.levenshtein(a, b)
        assert cigar.verify(a, b) == cost


def test_native_pq_shifts_observed():
    """With pruning on, queue shifts should actually fire on easy inputs."""
    a, b = generate.uniform_seeded(5000, 0.02, 11)
    cost, cigar, stats = astarpa_native(a, b, with_stats=True)
    assert cost == oracle.levenshtein(a, b)
    assert stats["pruned"] > 0


def test_aligner_params_native_plumbing():
    """--aligner astarpa-native honors dt/heuristic (advisor finding: they
    were silently ignored) and rejects unsupported heuristics."""
    import pytest

    from astarpa_tpu import generate, oracle
    from astarpa_tpu.params import AlignerParams, HeuristicParams, HeuristicType

    p = AlignerParams(
        aligner="astarpa-native", dt=False,
        heuristic=HeuristicParams(heuristic=HeuristicType.CSH, k=8, r=1),
    )
    a, b = generate.uniform_seeded(300, 0.1, 3)
    cost, cigar = p.build().align(a, b)
    assert cost == oracle.levenshtein(a, b) and cigar.verify(a, b) == cost
    with pytest.raises(ValueError):
        AlignerParams(
            aligner="astarpa-native",
            heuristic=HeuristicParams(heuristic=HeuristicType.SH),
        ).build()


def test_native_trace_direct():
    """Whole-pair direct DT trace: CIGAR from the certified cost alone (a
    single synthesized column-0 checkpoint; no device planes)."""
    import numpy as np

    from astarpa_tpu import native
    from astarpa_tpu.ops import banded

    for s, (n_bp, e) in enumerate([(800, 0.05), (3000, 0.1), (500, 0.3),
                                   (2000, 0.0), (64, 0.5)]):
        a, b = generate.uniform_seeded(n_bp, e, 7000 + s)
        d = oracle.levenshtein(a, b)
        S = max(1, -(-len(b) // 32))
        n_max = len(a)
        diag = (n_max, S * 32)
        sw = 8
        while sw < S:
            thr = banded.band_threshold(
                sw, np.array([len(a)]), np.array([len(b)]), *diag)
            if d <= int(thr[0]):
                break
            sw *= 2
        sw = min(sw, S)
        shift = banded.shift_at_array(n_max, S, sw, diag)
        cost, cig = native.trace_direct(a, b, S, shift, sw, known_cost=d)
        assert cost == d
        assert cig.verify(a, b) == d
