"""Striped (HBM-carry) pinned kernel: parity + full-height exactness."""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.ops import banded
from astarpa_tpu.ops.pallas_myers import pack_batch_staggered
from astarpa_tpu.ops.pinned import pinned_cost_tpu
from astarpa_tpu.ops.striped import striped_cost_tpu


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
