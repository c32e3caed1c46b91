"""Differential tests for the heuristic engine.

Mirrors the reference's `EqualHeuristic` strategy (`wrappers.rs:5-120`):
the fast layered contours must agree with an O(M^2) brute-force chain DP at
every query, and GCSH-guided alignment must stay oracle-exact.
"""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.types import Pos
from astarpa_tpu.heuristic.contours import Arrow, Contours
from astarpa_tpu.heuristic.csh import CSH, CSHI, GCSH
from astarpa_tpu.heuristic.matches import MatchConfig, find_matches
from astarpa_tpu.heuristic.prune import Prune, Pruning
from astarpa_tpu.heuristic.seeds import Seeds


def brute_force_scores(groups):
    """O(M^2) chain DP over arrows grouped by start (rev-sorted)."""
    starts, values = [], []

    def score_at(q):
        best = 0
        for s, v in zip(starts, values):
            if s.i >= q.i and s.j >= q.j:
                best = max(best, v)
        return best

    for start, arrows in groups:
        v = max(a.score + score_at(a.end) for a in arrows)
        starts.append(start)
        values.append(v)
    return score_at


def random_arrow_groups(rng, num, max_score=2):
    """Random consistent arrows: end >= start componentwise."""
    starts = sorted(
        {(int(rng.integers(0, 60)), int(rng.integers(0, 60))) for _ in range(num)},
        reverse=True,
    )
    groups = []
    for i, j in starts:
        arrows = []
        for _ in range(int(rng.integers(1, 3))):
            score = int(rng.integers(1, max_score + 1))
            end = Pos(i + int(rng.integers(0, 9)), j + int(rng.integers(0, 9)))
            arrows.append(Arrow(Pos(i, j), end, score))
        groups.append((Pos(i, j), arrows))
    return groups


@pytest.mark.parametrize("seed", range(8))
def test_contours_vs_bruteforce(seed):
    rng = np.random.default_rng(seed)
    groups = random_arrow_groups(rng, 40)
    c = Contours(groups)
    bf = brute_force_scores(groups)
    hint = None
    for _ in range(300):
        q = Pos(int(rng.integers(0, 75)), int(rng.integers(0, 75)))
        expected = bf(q)
        assert c.score(q) == expected, f"score({q})"
        got, hint = c.score_with_hint(q, hint)
        assert got == expected, f"score_with_hint({q})"


def test_exact_matches_complete():
    # r=1 matcher must find exactly the exact k-mer matches of disjoint seeds.
    a, b = generate.generate_model(300, 0.1, generate.ErrorModel.UNIFORM, 5)
    k = 8
    ms = find_matches(a, b, MatchConfig(k=k, r=1), transform_filter=False)
    got = {(m.start.i, m.start.j) for m in ms.matches}
    want = set()
    for i in range(0, len(a) - k + 1, k):
        for j in range(len(b) - k + 1):
            if a[i : i + k] == b[j : j + k]:
                want.add((i, j))
    assert got == want
    for m in ms.matches:
        assert m.match_cost == 0 and m.seed_potential == 1


def test_inexact_matches_sound_and_complete():
    a, b = generate.generate_model(200, 0.15, generate.ErrorModel.UNIFORM, 9)
    k = 8
    ms = find_matches(a, b, MatchConfig(k=k, r=2), transform_filter=False)
    # Soundness: every match must describe a real <=cost alignment.
    for m in ms.matches:
        sub_a = a[m.start.i : m.end.i]
        sub_b = b[m.start.j : m.end.j]
        d = oracle.levenshtein(sub_a, sub_b)
        assert d <= m.match_cost, (m, d)
    # Completeness for cost-0: all exact matches present.
    got0 = {(m.start.i, m.start.j) for m in ms.matches if m.match_cost == 0}
    for i in range(0, len(a) - k + 1, k):
        for j in range(len(b) - k + 1):
            if a[i : i + k] == b[j : j + k]:
                assert (i, j) in got0


def test_seeds_transform_roundtrip():
    seeds = Seeds.fixed_length(100, 10, 2)
    for i in range(0, 101, 7):
        for j in range(0, 50, 11):
            t = seeds.transform(Pos(i, j))
            # transform_back is only defined for seed-start columns.
            if seeds.is_seed_start(Pos(i, j)) or i == 100:
                assert seeds.transform_back(t) == Pos(i, j)


def test_gcsh_h_admissible_and_h0():
    # h must lower-bound the true remaining distance at (0,0).
    for seed in range(5):
        a, b = generate.generate_model(500, 0.08, generate.ErrorModel.UNIFORM, seed)
        h = GCSH(MatchConfig(k=12, r=1), Pruning.disabled()).build(a, b)
        d = oracle.levenshtein(a, b)
        assert h.h(Pos(0, 0)) <= d
        assert h.h(Pos(len(a), len(b))) == 0


def test_csh_vs_bruteforce_h():
    # CSH (no gap cost): compare h at many positions against brute force.
    a, b = generate.generate_model(200, 0.1, generate.ErrorModel.UNIFORM, 3)
    params = CSH(MatchConfig(k=8, r=1), Pruning.disabled(), use_gap_cost=False)
    h = params.build(a, b)

    ms = find_matches(a, b, MatchConfig(k=8, r=1), transform_filter=False)
    groups = []
    cur = None
    for m in reversed(sorted(ms.matches, key=lambda m: (m.start.i, m.start.j))):
        if cur is None or m.start != cur[0]:
            groups.append((m.start, []))
            cur = (m.start, None)
        groups[-1][1].append(Arrow(m.start, m.end, m.score()))
    bf = brute_force_scores(groups)

    rng = np.random.default_rng(0)
    for _ in range(200):
        pos = Pos(int(rng.integers(0, len(a) + 1)), int(rng.integers(0, len(b) + 1)))
        p = h.seeds.pot(pos)
        val = bf(pos)
        expected = h.distance(pos, Pos(len(a), len(b))) if val == 0 else p - val
        assert h.h(pos) == expected, pos
