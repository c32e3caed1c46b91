"""Differential tests: fast structures vs brute-force oracles, run in
lockstep through full alignments (mirror of `astarpa/src/tests.rs:111-118`
and `pa-heuristic/src/heuristic/wrappers.rs:40-95`)."""

import random

import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.astar import AstarPa
from astarpa_tpu.heuristic.bruteforce import (
    BruteForceContours,
    BruteForceGCSH,
    EqualHeuristic,
)
from astarpa_tpu.heuristic.contours import Arrow, Contours
from astarpa_tpu.heuristic.csh import CSH, GCSH
from astarpa_tpu.heuristic.distances import GapCost, NoCost
from astarpa_tpu.heuristic.matches import MatchConfig
from astarpa_tpu.heuristic.prune import Prune, Pruning
from astarpa_tpu.types import Pos


@pytest.mark.parametrize("dt", [False, True], ids=["astar", "astar-dt"])
@pytest.mark.parametrize("prune", [False, True], ids=["noprune", "prune"])
@pytest.mark.parametrize("use_gap", [False, True], ids=["csh", "gcsh"])
def test_equal_heuristic_lockstep(use_gap, prune, dt):
    """Every h query during an alignment must agree between the brute-force
    GCSH oracle and the contour-based CSH/GCSH."""
    pruning = Pruning(Prune.START) if prune else Pruning.disabled()
    for k, r in ((8, 1), (8, 2)):
        mc = MatchConfig(k=k, r=r)
        fast = GCSH(mc, pruning) if use_gap else CSH(mc, pruning)
        slow = BruteForceGCSH(mc, GapCost() if use_gap else NoCost(), pruning)
        aligner = AstarPa(dt=dt, h=EqualHeuristic(slow, fast))
        for seed in (11, 12):
            for n, e in ((40, 0.1), (100, 0.2)):
                a, b = generate.uniform_seeded(n, e, seed * n)
                (cost, cigar), _ = aligner.align_with_stats(a, b)
                assert cost == oracle.levenshtein(a, b)
                assert cigar.verify(a, b) == cost


def _random_arrow_groups(rng, n_points, max_coord, max_score):
    """Arrows grouped by start, reverse-sorted by LexPos(start) like the
    contour builders expect."""
    starts = set()
    while len(starts) < n_points:
        starts.add(Pos(rng.randrange(max_coord), rng.randrange(max_coord)))
    groups = []
    for s in sorted(starts, reverse=True):
        arrows = []
        for _ in range(rng.randrange(1, 3)):
            e = Pos(
                s.i + rng.randrange(1, 12),
                s.j + rng.randrange(1, 12),
            )
            arrows.append(Arrow(s, e, rng.randrange(1, max_score + 1)))
        groups.append((s, arrows))
    return groups


def test_contours_vs_bruteforce_random():
    rng = random.Random(99)
    for trial in range(20):
        groups = _random_arrow_groups(rng, 30, 120, 2)
        fast = Contours()
        fast.build(groups)
        slow = BruteForceContours()
        slow.build(groups)
        for _ in range(200):
            q = Pos(rng.randrange(130), rng.randrange(130))
            assert fast.score(q) == slow.score(q), (trial, q)
        # Hint-based queries agree with plain queries.
        hint = None
        for _ in range(50):
            q = Pos(rng.randrange(130), rng.randrange(130))
            v, hint = fast.score_with_hint(q, hint)
            assert v == slow.score(q)
