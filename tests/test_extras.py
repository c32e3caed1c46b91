"""Tests for the auxiliary components: testing harness, timer, converters,
variable-k matching, PathHeuristic, fuzzer plumbing."""

import subprocess
import sys

import numpy as np
import pytest

from astarpa_tpu import generate, oracle, testing
from astarpa_tpu.astar import AstarPa
from astarpa_tpu.heuristic.csh import CSH, GCSH
from astarpa_tpu.heuristic.matches import MatchConfig
from astarpa_tpu.heuristic.prune import Prune, Pruning
from astarpa_tpu.heuristic.suffix_array import minimal_unique_matches
from astarpa_tpu.utils.timer import Timer


class _Obj:
    calls = 0
    dur = 0.0


def test_sampling_timer():
    o = _Obj()
    for _ in range(128):
        t = Timer.each(64, o, "calls")
        t.end(o, "dur")
    assert o.calls == 128
    assert o.dur >= 0.0


def test_testing_harness_astarpa():
    from astarpa_tpu.astar import AstarPa

    aligner = AstarPa(dt=True, h=GCSH(MatchConfig(k=8, r=1), Pruning(Prune.START)))
    testing.check_aligner_up_to(aligner, max_n=120, samples=10)


def test_testing_harness_catches_bad_aligner():
    class Bad:
        def align(self, a, b):
            return 0, None

    with pytest.raises(AssertionError):
        testing.check_aligner_up_to(Bad(), max_n=50, samples=3)


def test_converters(tmp_path):
    from astarpa_tpu.pairs_io import read_pairs, txt_to_seq, nanosim_to_seq

    txt = tmp_path / "in.txt"
    txt.write_bytes(b"ACGT\nACGA\nTTTT\nTTAT\n")
    n = txt_to_seq(str(txt), str(tmp_path / "out.seq"))
    assert n == 2
    pairs = list(read_pairs(str(tmp_path / "out.seq")))
    assert pairs == [(b"ACGT", b"ACGA"), (b"TTTT", b"TTAT")]

    ref = tmp_path / "ref.fa"
    ref.write_bytes(b">chr1\nACGTACGTACGTACGTACGT\n")
    reads = tmp_path / "reads.fa"
    # chrom_refpos_aligned_..._head_mid_tail
    reads.write_bytes(b">chr1_4_aligned_0_F_2_8_3\nTTACGTACGTAGG\n")
    n = nanosim_to_seq(str(ref), str(reads), str(tmp_path / "ns.seq"))
    assert n == 1
    (pair,) = list(read_pairs(str(tmp_path / "ns.seq")))
    assert pair == (b"ACGTACGT", b"ACGTACGT")


def test_variable_k_matching_in_astar():
    for r in (1, 2):
        h = CSH(MatchConfig(k=0, r=r, max_matches=4), Pruning.disabled())
        aligner = AstarPa(dt=True, h=h)
        for seed in (1, 2):
            a, b = generate.uniform_seeded(250, 0.12, seed)
            (cost, cigar), _ = aligner.align_with_stats(a, b)
            assert cost == oracle.levenshtein(a, b)
            assert cigar.verify(a, b) == cost


def test_mum_matches_are_bounded():
    a, b = generate.uniform_seeded(400, 0.1, 9)
    ms = minimal_unique_matches(a, b, 1, max_matches=2)
    # Each seed has at most max_matches occurrences.
    from collections import Counter

    per_seed = Counter(m.start.i for m in ms.matches)
    assert all(v <= 2 for v in per_seed.values())


def test_path_heuristic():
    from astarpa_tpu.experimental import PathHeuristic

    inner = GCSH(MatchConfig(k=8, r=1), Pruning.disabled())
    ph = PathHeuristic(inner)
    for seed in (3, 4):
        a, b = generate.uniform_seeded(200, 0.1, seed)
        cost, inst = ph.build_with_cost(a, b)
        assert cost == oracle.levenshtein(a, b)
        # The pre-pruned heuristic still admits the optimal cost.
        aligner = AstarPa(dt=False, h=_Prebuilt(inst))
        (c2, cigar), _ = aligner.align_with_stats(a, b)
        assert c2 == cost
        assert cigar.verify(a, b) == c2


class _Prebuilt:
    def __init__(self, inst):
        self.inst = inst

    def build(self, a, b):
        return self.inst


def test_fuzzer_smoke():
    r = subprocess.run(
        [sys.executable, "scripts/fuzz.py", "--aligner", "astarpa", "--iters", "15",
         "--max-n", "80", "--seed", "7"],
        capture_output=True, text=True, cwd=".",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "no failures" in r.stdout


def test_scalar_layouts_bit_identical():
    """All five scalar traversal orders (`pa-bitpacking/src/scalar.rs:9-99`
    mirrors) produce bit-identical (vp, vm, hp, hm) and the oracle distance."""
    from astarpa_tpu.ops import bitpack, layouts
    from astarpa_tpu.types import seq_to_codes

    for seed, n, e in [(1, 96, 0.1), (2, 200, 0.3), (3, 64, 0.0)]:
        a, b = generate.generate_model(n, e, generate.ErrorModel.UNIFORM, seed)
        b = b[: (len(b) // 32) * 32]  # word-aligned rows: no padding terms
        a0, a1 = bitpack.pack_a(seq_to_codes(a))
        pb0, pb1 = bitpack.pack_b(seq_to_codes(b))
        ref = None
        for name, fn in layouts.LAYOUTS.items():
            got = fn(a0, a1, pb0, pb1)
            if ref is None:
                ref = got
                d = layouts.distance(got[2], got[3], len(b))
                assert d == oracle.levenshtein(a, b), (seed, name, d)
            else:
                for x, y in zip(ref, got):
                    assert (x == y).all(), (seed, name)


def test_compressed_history_exact_and_sparse():
    """dt_align_compressed: oracle-exact costs, verifying CIGARs, and the
    compressed store really is sparse — after sweeping to the final path
    it holds exactly cost+1 anchors (one per error edge plus the root)."""
    from astarpa_tpu.experimental.compressed_history import (
        CompressedHistory,
        TracebackState,
        dt_align_compressed,
    )

    rng = np.random.default_rng(11)
    cases = [(b"", b""), (b"A", b""), (b"", b"ACGT"), (b"ACGT", b"ACGT"),
             (b"AAAA", b"AACAA"), (b"ACAC", b"CACA")]
    for n, e in [(20, 0.1), (64, 0.05), (130, 0.2), (200, 0.02), (80, 0.5)]:
        a, b = generate.generate_model(n, e, generate.ErrorModel.UNIFORM,
                                       seed=int(rng.integers(1 << 30)))
        cases.append((a, b))
    for a, b in cases:
        cost, cigar, hist = dt_align_compressed(a, b)
        assert cost == oracle.levenshtein(a, b), (a, b)
        assert cigar.verify(a, b) == cost
        # The returned store was swept to the final path: exactly one
        # anchor per error edge plus the root.
        assert len(hist.states) == cost + 1

    # Round-trip of the anchor walk itself on a known path.  A sub parent
    # must sit on the SAME diagonal as its child segment (dd == 0); a del
    # parent one below (dd == -1).  Chain: 2= then SUB at (2,2)->(3,3),
    # 1= to (4,4), DEL at (4,4)->(5,4), 1= to (6,5).
    h = CompressedHistory()
    p1 = h.push(TracebackState.from_coords(2, 2), h.ROOT)  # sub parent, d=0
    p2 = h.push(TracebackState.from_coords(4, 4), p1)  # del parent, d=0
    cig = h.traceback(TracebackState.from_coords(6, 5), p2)
    assert cig.to_string() == "2=1X1=1D1="


def test_levenshtein_myers_pad_g_regression():
    """Regression: the full-height Myers oracle read the PADDED bottom row
    (S*32), and pad char 0xFF 2-bit-encodes to code 3 == 'G' — pad rows
    matched real G's and the extended-row distance under-reported the
    true one (found via scripts/profile_direct.py: 12/256 10kbp pairs off
    by one; a trailing-G input is the minimal shape).  The oracle now
    reads the final column's vertical deltas masked to row m."""
    from astarpa_tpu import native, oracle

    if not native.available():
        import pytest

        pytest.skip("no native toolchain")
    a = b"A" + b"G" * 40
    bb = b"A"
    assert oracle.levenshtein(a, bb) == 40
    assert oracle.levenshtein_myers(a, bb) == 40
    # m > n with an interior G run (the generated-pair failure class).
    a2 = b"ACGTACGG" * 6
    b2 = a2 + b"GG"
    assert oracle.levenshtein_myers(a2, b2) == oracle.levenshtein(a2, b2)


def test_affine_gap_seed_cost():
    """AffineGapSeedCost (`distances.rs:383-647`, live arms): gap + seed
    distance for affine costs, branch and formula variants."""
    from astarpa_tpu.heuristic.distances import (
        AffineGapSeedCost,
        SimpleAffineCost,
    )
    from astarpa_tpu.types import Pos

    c = SimpleAffineCost(sub=1, open=1, extend=1)
    h = AffineGapSeedCost(k=3, r=1, c=c).build(b"A" * 9, b"A" * 9)
    hf = AffineGapSeedCost(k=3, r=1, c=c, formula=True).build(b"A" * 9, b"A" * 9)
    # Same diagonal: p seeds crossed at cost r each.
    assert h.distance(Pos(0, 0), Pos(9, 9)) == 3
    assert h.distance(Pos(1, 1), Pos(8, 8)) == 1  # seeds in [ceil(1/3), floor(8/3)) = [1, 2)
    # No seeds: pure affine gap.
    assert h.distance(Pos(7, 7), Pos(8, 11)) == 1 + 3
    assert h.distance(Pos(7, 9), Pos(8, 8)) == 1 + 2
    # Insertions across seeds: all-in-one vs spread evenly (min of the two).
    # p=2, d=3: one-seed = o + e*3 + (p-1)*r = 5; even (2+1 split) =
    # (o+2e) + (o+e) = 5.
    assert h.distance(Pos(0, 0), Pos(6, 9)) == 5
    assert hf.distance(Pos(0, 0), Pos(6, 9)) == 5
    # Deletions keep only the gap lower bound (the reference's own FIXME).
    assert h.distance(Pos(0, 3), Pos(9, 9)) == 1 + 3
    # h() is distance-to-target.
    assert h.h(Pos(0, 0)) == h.distance(Pos(0, 0), Pos(9, 9))
    # Wider costs: open=3, extend=2.
    c2 = SimpleAffineCost(sub=1, open=3, extend=2)
    h2 = AffineGapSeedCost(k=3, r=1, c=c2).build(b"A" * 12, b"A" * 12)
    # p=4 seeds, d=2 insertions: one-seed = 3+4+3 = 10; even spread over 4
    # seeds (two seeds get 1 each) = 2*(3+2) = 10.
    assert h2.distance(Pos(0, 0), Pos(12, 14)) == 10
    # Non-negative over a grid of states for both variants.
    for args in ((3, 1, c, False), (3, 1, c, True), (4, 2, c2, False),
                 (4, 2, c2, True)):
        hh = AffineGapSeedCost(*args).build(b"A" * 16, b"A" * 16)
        for fi in range(0, 16, 3):
            for fj in range(0, 16, 3):
                assert hh.distance(Pos(fi, fj), Pos(16, 16)) >= 0, (args, fi, fj)
