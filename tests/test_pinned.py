"""Pinned-word staggered big-band kernel vs sliding kernel + oracle."""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.ops import banded
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered
from astarpa_tpu.ops.pinned import pinned_cost_tpu


def test_pinned_vs_sliding_and_oracle():
    """The pinned kernel's band is a superset of the sliding kernel's:
    results are <= the sliding kernel's, and certified results (cost <=
    band_threshold) equal the oracle — the runner uses the same acceptance
    logic for both kernels."""
    pairs = [
        generate.generate_model(
            100 + (s * 29) % 150, [0.0, 0.05, 0.15, 0.3][s % 4],
            list(generate.ErrorModel)[s % 4], 60 + s,
        )
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    exp = [oracle.levenshtein(a, b) for a, b in pairs]
    certified_any = np.zeros(B0, bool)
    for SW in (4, 12):
        SW = min(SW, S)
        got = np.asarray(
            pinned_cost_tpu(
                np.asarray(a0), np.asarray(a1), np.asarray(pb0),
                np.asarray(pb1), np.asarray(n), np.asarray(m),
                band_words=SW, time_block=128, interpret=True,
            )
        )
        sld = np.asarray(banded.banded_cost(a0, a1, pb0, pb1, n, m, band_words=SW))
        thr = banded.band_threshold(
            SW, np.asarray(n)[:B0], np.asarray(m)[:B0], n_max, S * 32
        )
        ok = np.asarray(sld)[:B0] <= thr
        for p in range(B0):
            assert got[p] >= exp[p] or got[p] >= (1 << 30)
            assert got[p] <= sld[p] or got[p] >= (1 << 30)
            if ok[p]:
                assert got[p] == exp[p], (SW, p, got[p], exp[p])
        certified_any |= ok
    assert certified_any.all()


def test_pinned_compaction_path():
    """Small time blocks force residency compaction between blocks."""
    pairs = [generate.uniform_seeded(250, 0.1, 10 + s) for s in range(128)]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    got = np.asarray(
        pinned_cost_tpu(
            np.asarray(a0), np.asarray(a1), np.asarray(pb0), np.asarray(pb1),
            np.asarray(n), np.asarray(m), band_words=6, time_block=64,
            interpret=True,
        )
    )
    sld = np.asarray(banded.banded_cost(a0, a1, pb0, pb1, n, m, band_words=6))
    thr = banded.band_threshold(
        6, np.asarray(n)[:B0], np.asarray(m)[:B0], a0.shape[0], pb0.shape[0] * 32
    )
    for p in range(B0):
        if sld[p] <= thr[p]:
            assert got[p] == oracle.levenshtein(*pairs[p])


def test_pinned_perpair_vs_sliding_and_oracle():
    """Per-pair-schedule pinned kernel (interpret mode): results are a
    superset-band refinement of the sliding per-pair kernel (got <= sliding)
    and exact wherever the gap-schedule certificate accepts."""
    from astarpa_tpu.ops.pinned import pinned_cost_pp_tpu

    pairs = [
        generate.uniform_seeded(500 + (s * 53) % 260, [0.03, 0.1, 0.22][s % 3],
                                40 + s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    exp = [oracle.levenshtein(a, b) for a, b in pairs]
    certified_any = np.zeros(B0, dtype=bool)
    for sw in (8, 24):
        sched, thr = banded.pair_gap_schedule(
            np.asarray(n), np.asarray(m), sw, n_max, S
        )
        sld = np.asarray(
            banded.banded_cost_pp(a0, a1, pb0, pb1, n, m, sched, band_words=sw)
        )[:B0]
        got = np.asarray(
            pinned_cost_pp_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, schedule=sched,
                time_block=128, interpret=True,
            )
        )[:B0]
        ok = sld <= thr
        for p in range(B0):
            assert got[p] >= exp[p]
            assert got[p] <= sld[p]
            if ok[p]:
                assert got[p] == exp[p], (sw, p, got[p], exp[p])
        certified_any |= ok
    assert certified_any.all()


def test_pinned_perpair_broadcast_matches_shared():
    """A per-pair schedule equal to the shared bucket schedule reproduces
    the shared pinned kernel bit-for-bit (including compaction blocks)."""
    from astarpa_tpu.ops.pinned import pinned_cost_pp_tpu

    pairs = [generate.uniform_seeded(300 + s % 40, 0.12, 700 + s) for s in range(128)]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    B = a0.shape[1]
    sw = 8
    shift = banded.shift_at_array(n_max, S, sw)
    sched = np.broadcast_to(shift[:, None], (n_max, B)).astype(np.uint8)
    pp = np.asarray(
        pinned_cost_pp_tpu(a0, a1, pb0, pb1, n, m, band_words=sw,
                           schedule=sched, time_block=64, interpret=True)
    )
    sh = np.asarray(
        pinned_cost_tpu(a0, a1, pb0, pb1, n, m, band_words=sw,
                        time_block=64, interpret=True)
    )
    assert (pp == sh).all()


@pytest.mark.slow
def test_pinned_ck_matches_sliding_ck():
    """Pinned checkpoint emission is bit-identical to the sliding ck
    kernel on every checkpoint a traceback can read (k*CB <= n_p; past a
    pair's end the sliding kernel freezes while pinned keeps computing)."""
    from astarpa_tpu.ops.pallas_banded import banded_ck_tpu
    from astarpa_tpu.ops.pinned import pinned_ck_tpu

    pairs = [
        generate.uniform_seeded(2500 + (s * 137) % 600, [0.03, 0.1][s % 2], s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    sw, CB = 16, 1024
    gots, svp, svm, stv = map(np.asarray, banded_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
        pairs_per_program=128, interpret=True))
    gotp, pvp, pvm, ptv = map(np.asarray, pinned_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
        time_block=256, interpret=True))
    assert (gots == gotp).all()
    n_np = np.asarray(n)
    for k in range(min(svp.shape[0], pvp.shape[0])):
        live = n_np >= k * CB
        assert (svp[k][:, live] == pvp[k][:, live]).all(), k
        assert (svm[k][:, live] == pvm[k][:, live]).all(), k
        assert (stv[k][live] == ptv[k][live]).all(), k


def test_pinned_ck_native_trace():
    """CIGARs from pinned-kernel checkpoints via the native DT-burst
    traceback verify against the oracle end-to-end."""
    from astarpa_tpu import native
    from astarpa_tpu.ops.pinned import pinned_ck_tpu

    if not native.available():
        pytest.skip("no native toolchain")
    pairs = [
        generate.uniform_seeded(2200 + 61 * s, [0.04, 0.12][s % 2], 30 + s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    sw, CB = 24, 1024
    costs, ckvp, ckvm, cktv = map(np.asarray, pinned_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
        time_block=256, interpret=True))
    thr = banded.band_threshold(
        sw, np.asarray(n)[:B0], np.asarray(m)[:B0], n_max, S * 32
    )
    shift = banded.shift_at_array(n_max, S, sw)
    checked = 0
    for p in range(0, B0, 17):
        if costs[p] > thr[p]:
            continue
        a, b = pairs[p]
        cost, cig = native.trace_banded_ck(
            a, b, S, ckvp[:, :, p], ckvm[:, :, p], cktv[:, p], shift, sw, CB,
        )
        assert cost == costs[p] == oracle.levenshtein(a, b)
        assert cig.verify(a, b) == cost
        checked += 1
    assert checked >= 4


@pytest.mark.slow
def test_pinned_pp_ck_matches_sliding_ck():
    """Per-pair pinned checkpoint emission is bit-identical to the sliding
    per-pair ck kernel on every readable checkpoint."""
    from astarpa_tpu.ops.pallas_banded import banded_ck_tpu
    from astarpa_tpu.ops.pinned import pinned_ck_pp_tpu

    pairs = [
        generate.uniform_seeded(2500 + (s * 137) % 600, [0.03, 0.1][s % 2], s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    sw, CB = 16, 1024
    sched, thr = banded.pair_gap_schedule(
        np.asarray(n), np.asarray(m), sw, n_max, S
    )
    gots, svp, svm, stv = map(np.asarray, banded_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
        pairs_per_program=128, interpret=True, schedule=sched))
    gotp, pvp, pvm, ptv = map(np.asarray, pinned_ck_pp_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, schedule=sched, col_block=CB,
        time_block=256, interpret=True))
    assert (gots == gotp).all()
    n_np = np.asarray(n)
    for k in range(min(svp.shape[0], pvp.shape[0])):
        live = n_np >= k * CB
        assert (svp[k][:, live] == pvp[k][:, live]).all(), k
        assert (svm[k][:, live] == pvm[k][:, live]).all(), k
        assert (stv[k][live] == ptv[k][live]).all(), k


@pytest.mark.slow
def test_pinned_pp_ck_native_trace():
    """CIGARs from per-pair pinned checkpoints via the native traceback
    with per-pair schedules verify against the oracle."""
    from astarpa_tpu import native
    from astarpa_tpu.ops.pinned import pinned_ck_pp_tpu

    if not native.available():
        pytest.skip("no native toolchain")
    pairs = [
        generate.uniform_seeded(2200 + 61 * s, [0.04, 0.1][s % 2], 30 + s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    sw, CB = 24, 1024
    sched, thr = banded.pair_gap_schedule(
        np.asarray(n), np.asarray(m), sw, n_max, S
    )
    costs, ckvp, ckvm, cktv = map(np.asarray, pinned_ck_pp_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, schedule=sched, col_block=CB,
        time_block=256, interpret=True))
    checked = 0
    for p in range(0, B0, 17):
        if costs[p] > thr[p]:
            continue
        a, b = pairs[p]
        sc = np.ascontiguousarray(sched[:, p], np.int32)
        cost, cig = native.trace_banded_ck(
            a, b, S, ckvp[:, :, p], ckvm[:, :, p], cktv[:, p], sc, sw, CB,
        )
        assert cost == costs[p] == oracle.levenshtein(a, b)
        assert cig.verify(a, b) == cost
        checked += 1
    assert checked >= 4
