"""Kernel self-checks: bitpacked Myers vs the NumPy oracle DP.

Mirrors the reference's kernel-test strategy (`pa-bitpacking` benches
self-check against `bio::levenshtein`, SURVEY.md §4).
"""

import numpy as np
import pytest

from astarpa_tpu import generate, oracle
from astarpa_tpu.ops import bitpack
from astarpa_tpu.ops.bitpack import W
from astarpa_tpu.types import seq_to_codes
from astarpa_tpu.aligners import nw


def test_pack_b_roundtrip_eq():
    # eq_mask must flag exactly the matching rows.
    b = b"ACGTACGTGGTTAACC" * 3
    codes_b = seq_to_codes(b)
    pb0, pb1 = bitpack.pack_b(codes_b)
    for ch in b"ACGT":
        a0, a1 = bitpack.pack_a(seq_to_codes(bytes([ch])))
        eq = bitpack.eq_mask(a0[0], a1[0], pb0, pb1)
        got = [(int(eq[j // W]) >> (j % W)) & 1 for j in range(len(b))]
        want = [1 if b[j] == ch else 0 for j in range(len(b))]
        assert got == want


def test_popcount32():
    xs = np.array([0, 1, 0xFFFFFFFF, 0x80000000, 0x0F0F0F0F], dtype=np.uint32)
    assert list(bitpack.popcount32(xs)) == [0, 1, 32, 1, 16]


def _check_block_vs_oracle(a: bytes, b: bytes):
    """compute_block over the full rectangle must reproduce oracle column diffs."""
    import jax.numpy as jnp
    from astarpa_tpu.ops import myers

    ca0, ca1 = bitpack.pack_a(seq_to_codes(a))
    pb0, pb1 = bitpack.pack_b(seq_to_codes(b))
    nwords = len(pb0)
    n, m = len(a), len(b)

    vp = jnp.full((nwords,), np.uint32(0xFFFFFFFF), dtype=jnp.uint32)
    vm = jnp.zeros((nwords,), dtype=jnp.uint32)
    hp_in = jnp.ones((n,), dtype=jnp.uint32)
    hm_in = jnp.zeros((n,), dtype=jnp.uint32)
    vp, vm, hp_out, hm_out = myers.compute_block(
        jnp.asarray(ca0), jnp.asarray(ca1), jnp.asarray(pb0), jnp.asarray(pb1),
        vp, vm, hp_in, hm_in,
    )
    D = oracle.dp_matrix(a, b)
    # Right-edge vertical diffs must match D[n][j+1] - D[n][j] for j < m.
    vp_np, vm_np = np.asarray(vp), np.asarray(vm)
    for j in range(m):
        got = ((int(vp_np[j // W]) >> (j % W)) & 1) - ((int(vm_np[j // W]) >> (j % W)) & 1)
        want = int(D[n][j + 1] - D[n][j])
        assert got == want, f"v diff at row {j}: {got} != {want}"
    # Bottom h_out (at the padded bottom) is only meaningful when m % W == 0.
    if m % W == 0 and m > 0:
        hs = np.asarray(hp_out).astype(np.int64) - np.asarray(hm_out).astype(np.int64)
        want_h = [int(D[i + 1][m] - D[i][m]) for i in range(n)]
        assert list(hs) == want_h


@pytest.mark.parametrize(
    "n,m_extra,e,seed",
    [
        (1, 0, 0.0, 1),
        (5, 3, 0.5, 2),
        (32, 0, 0.1, 3),
        (33, 5, 0.2, 4),
        (64, 0, 0.05, 5),
        (100, 17, 0.15, 6),
        (128, -20, 0.3, 7),
    ],
)
def test_compute_block_vs_oracle(n, m_extra, e, seed):
    a, b = generate.generate_model(n, e, generate.ErrorModel.UNIFORM, seed)
    if m_extra > 0:
        b = b + generate.random_seq(m_extra, np.random.default_rng(seed))
    elif m_extra < 0 and len(b) > -m_extra:
        b = b[:m_extra]
    if not b:
        b = b"A"
    _check_block_vs_oracle(a, b)


def test_nw_cost_single():
    a, b = b"ACTCGCT", b"AACTCGTT"
    assert nw.nw_cost(a, b) == 2  # reference astarpa-c/example.c asserts 2


def test_nw_cost_batch_grid():
    pairs = []
    expected = []
    rng = np.random.default_rng(42)
    for n in [1, 7, 31, 32, 33, 64, 100, 255, 300]:
        for e in [0.0, 0.1, 0.4]:
            a, b = generate.generate_model(n, e, generate.ErrorModel.UNIFORM, int(rng.integers(1 << 31)))
            pairs.append((a, b))
            expected.append(oracle.levenshtein(a, b))
    got = nw.nw_cost_batch(pairs)
    assert list(got) == expected


def test_nw_cost_error_models():
    pairs, expected = [], []
    for model in generate.ErrorModel:
        for seed in [1, 2, 3]:
            a, b = generate.generate_model(150, 0.2, model, seed)
            pairs.append((a, b))
            expected.append(oracle.levenshtein(a, b))
    got = nw.nw_cost_batch(pairs)
    assert list(got) == expected


def test_nw_cost_unequal_lengths():
    pairs = [
        (b"A" * 10, b"A" * 200),
        (b"ACGT" * 50, b"ACGT" * 2),
        (b"A", b"T" * 33),
    ]
    expected = [oracle.levenshtein(a, b) for a, b in pairs]
    assert list(nw.nw_cost_batch(pairs)) == expected
