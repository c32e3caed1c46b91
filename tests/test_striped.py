"""Striped (HBM-carry) pinned kernel: parity + full-height exactness."""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.ops import banded
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered
from astarpa_tpu.ops.pinned import pinned_cost_tpu
from astarpa_tpu.ops.striped import striped_cost_tpu


@pytest.mark.slow
def test_striped_matches_pinned():
    """Bit-identical to the single-residency pinned kernel across stripe
    geometries (the HBM carry hand-off is exact), including bands taller
    than one stripe and the full profile height."""
    pairs = [
        generate.uniform_seeded(700 + (s * 97) % 300, [0.03, 0.12, 0.25][s % 3], s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    S = pb0.shape[0]
    for sw, WS, TB in [(16, 8, 64), (24, 8, 128), (S, 8, 64), (S, 16, 128)]:
        got = np.asarray(striped_cost_tpu(
            a0, a1, pb0, pb1, n, m, band_words=sw, stripe_words=WS,
            time_block=TB, interpret=True))
        pin = np.asarray(pinned_cost_tpu(
            a0, a1, pb0, pb1, n, m, band_words=sw, time_block=TB,
            interpret=True))
        assert (got == pin).all(), (sw, WS, TB)


@pytest.mark.slow
def test_striped_full_height_exact():
    """At band_words >= S the striped kernel is exact full-height DP (no
    certificate needed), even for pairs no banded certificate accepts."""
    pairs = [
        generate.uniform_seeded(400 + 37 * s, [0.3, 0.5][s % 2], 70 + s)
        for s in range(128)
    ]
    # plus adversarial: reversed / unrelated sequences
    a, _ = generate.uniform_seeded(500, 0.0, 99)
    pairs[0] = (a, bytes(a[::-1]))
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    S = pb0.shape[0]
    got = np.asarray(striped_cost_tpu(
        a0, a1, pb0, pb1, n, m, band_words=S, stripe_words=8,
        time_block=64, interpret=True))[:B0]
    for p in range(0, B0, 9):
        assert got[p] == oracle.levenshtein(*pairs[p]), p


@pytest.mark.slow
def test_striped_ck_matches_sliding_ck():
    """Striped checkpoint emission carries the sliding ck kernel's exact
    window planes + top_val under the 8-ALIGNED-TOP layout: striped plane
    rows [lo&7, lo&7 + SW) must be bit-identical to sliding rows [0, SW)
    on every checkpoint a traceback can read — including checkpoint
    windows that SPAN stripe boundaries (SW+8 > WS below)."""
    from astarpa_tpu.ops.pallas_banded import banded_ck_tpu
    from astarpa_tpu.ops.striped import striped_ck_tpu

    pairs = [
        generate.uniform_seeded(600 + (s * 137) % 200, [0.03, 0.12][s % 2], s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    sw, CB = 16, 64
    gots, svp, svm, stv = map(np.asarray, banded_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
        pairs_per_program=128, interpret=True))
    gotk, kvp, kvm, ktv = map(np.asarray, striped_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
        stripe_words=16, time_block=64, interpret=True))
    lo = np.concatenate([[0], np.cumsum(banded.shift_at_array(n_max, S, sw))])
    n_np = np.asarray(n)
    # Cost parity on covered lanes (striped flags uncovered lanes INF).
    covered = (np.asarray(m) - lo[np.clip(n_np - 1, 0, n_max - 1) + 1] * 32) <= sw * 32
    assert (gots[covered] == gotk[covered]).all()
    checked = 0
    for k in range(1, min(svp.shape[0], kvp.shape[0])):
        live = n_np >= k * CB
        pad = int(lo[k * CB]) & 7
        assert (svp[k][:, live] == kvp[k, pad:pad + sw][:, live]).all(), k
        assert (svm[k][:, live] == kvm[k, pad:pad + sw][:, live]).all(), k
        assert (stv[k][live] == ktv[k][live]).all(), k
        checked += 1
    assert checked >= 4


@pytest.mark.slow
def test_striped_static_windows_parity():
    """static_windows=True (the traced-safe mesh mode) is bit-identical:
    the scalar capture windows are work-skipping hints only."""
    from astarpa_tpu.ops.pallas_banded import banded_ck_tpu
    from astarpa_tpu.ops.striped import striped_ck_tpu

    pairs = [
        generate.uniform_seeded(400 + 31 * s, [0.04, 0.2][s % 2], 5 + s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    c_dyn = np.asarray(striped_cost_tpu(
        a0, a1, pb0, pb1, n, m, band_words=16, stripe_words=16,
        time_block=64, interpret=True))
    c_sta = np.asarray(striped_cost_tpu(
        a0, a1, pb0, pb1, n, m, band_words=16, stripe_words=16,
        time_block=64, interpret=True, static_windows=True))
    assert (c_dyn == c_sta).all()
    dyn = list(map(np.asarray, striped_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=16, col_block=64,
        stripe_words=16, time_block=64, interpret=True)))
    sta = list(map(np.asarray, striped_ck_tpu(
        a0, a1, pb0, pb1, n, m, band_words=16, col_block=64,
        stripe_words=16, time_block=64, interpret=True,
        static_windows=True)))
    for d, s in zip(dyn, sta):
        assert (d == s).all()


@pytest.mark.slow
def test_striped_ck_native_trace_full_height():
    """Big-band/full-height CIGARs off the striped kernel: the native
    traceback consumes the 8-aligned-top checkpoint planes directly (the
    wrapper infers the layout from the plane shape) and verifies against
    the oracle — including at full profile height, where no other ck
    kernel can run."""
    import pytest

    from astarpa_tpu import native
    from astarpa_tpu.ops.striped import striped_ck_tpu

    if not native.available():
        pytest.skip("no native toolchain")
    pairs = [
        generate.uniform_seeded(300 + 9 * s, [0.05, 0.3][s % 2], 11 + s)
        for s in range(128)
    ]
    args, B0 = pack_batch_staggered(pairs, lane_multiple=128)
    a0, a1, pb0, pb1, n, m = args
    n_max, S = a0.shape[0], pb0.shape[0]
    sw = -(-S // 8) * 8  # full height, rounded to the ck kernel's grain
    pb0p = np.concatenate([np.asarray(pb0)] + [np.asarray(pb0)[-1:]] * (sw - S))
    pb1p = np.concatenate([np.asarray(pb1)] + [np.asarray(pb1)[-1:]] * (sw - S))
    CB = 128
    costs, ckvp, ckvm, cktv = map(np.asarray, striped_ck_tpu(
        a0, a1, pb0p, pb1p, n, m, band_words=sw, col_block=CB,
        stripe_words=24, time_block=64, interpret=True))
    shift = banded.shift_at_array(n_max, sw, sw)
    checked = 0
    for p in range(0, B0, 17):
        a, b = pairs[p]
        cost, cig = native.trace_banded_ck(
            a, b, sw, ckvp[:, :, p], ckvm[:, :, p], cktv[:, p], shift, sw, CB,
        )
        assert cost == costs[p] == oracle.levenshtein(a, b)
        assert cig.verify(a, b) == cost
        checked += 1
    assert checked >= 4
