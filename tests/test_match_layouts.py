"""Exact-match finder layout variants (`exact.rs:15-472`) are one data
structure benched five ways in the reference; here the parity contract is
that every layout produces the IDENTICAL match list."""

import pytest

from astarpa_tpu import generate
from astarpa_tpu.heuristic.matches import (
    EXACT_LAYOUTS,
    MatchConfig,
    _match_key,
    find_matches,
)


def _keys(ms):
    return [_match_key(m) for m in ms.matches]


@pytest.mark.parametrize("layout", [l for l in EXACT_LAYOUTS if l != "hash"])
@pytest.mark.parametrize("n,e,k", [(300, 0.1, 6), (1000, 0.05, 8), (700, 0.3, 7)])
def test_layout_parity(layout, n, e, k):
    for seed in range(3):
        a, b = generate.generate_model(n, e, generate.ErrorModel.UNIFORM, seed=seed)
        cfg = MatchConfig(k=k, r=1)
        ref = find_matches(a, b, cfg, transform_filter=True)
        got = find_matches(a, b, cfg, transform_filter=True, layout=layout)
        assert _keys(got) == _keys(ref), (layout, seed)
        assert [s.seed_cost for s in got.seeds.seeds] == [
            s.seed_cost for s in ref.seeds.seeds
        ]


@pytest.mark.parametrize("layout", ["hash_b", "csr", "qgram_index"])
def test_layout_parity_unfiltered(layout):
    # sliding_window requires the transform filter (as in the reference);
    # the other layouts must agree with hash_a unfiltered too.
    a, b = generate.generate_model(500, 0.15, generate.ErrorModel.UNIFORM, seed=7)
    cfg = MatchConfig(k=6, r=1)
    ref = find_matches(a, b, cfg, transform_filter=False)
    got = find_matches(a, b, cfg, transform_filter=False, layout=layout)
    assert _keys(got) == _keys(ref)


@pytest.mark.parametrize("layout", ["csr", "qgram_index", "sliding_window"])
def test_layout_parity_local_pruning(layout):
    # Layouts that share hash_a's (reverse-j) push order must agree under
    # local pruning as well (pruning decisions depend on push order).
    for seed in range(3):
        a, b = generate.generate_model(
            800, 0.12, generate.ErrorModel.UNIFORM, seed=10 + seed
        )
        cfg = MatchConfig(k=7, r=1, local_pruning=2)
        ref = find_matches(a, b, cfg, transform_filter=True)
        got = find_matches(a, b, cfg, transform_filter=True, layout=layout)
        assert _keys(got) == _keys(ref), (layout, seed)


def test_layout_skewed_and_tiny():
    # Length-skewed pairs stress the sliding window's i-range bounds;
    # tiny inputs stress the empty-table edges.
    a, _ = generate.generate_model(900, 0.0, generate.ErrorModel.UNIFORM, seed=3)
    for bl in (40, 300, 899):
        b = a[:bl]
        cfg = MatchConfig(k=6, r=1)
        ref = find_matches(a, b, cfg, transform_filter=True)
        for layout in EXACT_LAYOUTS:
            got = find_matches(a, b, cfg, transform_filter=True, layout=layout)
            assert _keys(got) == _keys(ref), (layout, bl)
    for layout in EXACT_LAYOUTS:
        tiny = find_matches(b"ACGT", b"AC", MatchConfig(k=3, r=1), True,
                            layout=layout)
        assert isinstance(tiny.matches, list)


def test_qgram_index_k_guard():
    a, b = generate.generate_model(100, 0.1, generate.ErrorModel.UNIFORM, seed=0)
    with pytest.raises(ValueError):
        find_matches(a, b, MatchConfig(k=15, r=1), True, layout="qgram_index")
    # k=14 would allocate a ~2 GiB offset table on this host; guarded too.
    with pytest.raises(ValueError):
        find_matches(a, b, MatchConfig(k=14, r=1), True, layout="qgram_index")


def test_layout_mum_guard():
    # The max_matches (MUM) path has one implementation; a non-default
    # layout must not be silently ignored there.
    a, b = generate.generate_model(100, 0.1, generate.ErrorModel.UNIFORM, seed=0)
    with pytest.raises(NotImplementedError):
        find_matches(a, b, MatchConfig(k=6, r=1, max_matches=1), True,
                     layout="csr")


def test_layout_r2_guard():
    a, b = generate.generate_model(100, 0.1, generate.ErrorModel.UNIFORM, seed=0)
    with pytest.raises(NotImplementedError):
        find_matches(a, b, MatchConfig(k=6, r=2), True, layout="csr")
