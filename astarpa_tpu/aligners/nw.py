"""Full-rectangle bitpacked NW: the minimum end-to-end slice.

Batched exact edit distance on device (cost only), the analog of running the
reference's `pa_bitpacking::simd::compute` over the whole matrix
(`astarpa2_nw` without band logic, `astarpa2/src/lib.rs:38-41`).

Pairs are padded to shared ``(max_n, max_words)`` shapes so one compiled
kernel serves a whole batch (XLA static shapes); padding is exact — padded
rows match nothing and padded columns are skipped in the scan carry.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..types import seq_to_codes
from ..ops import bitpack
from ..ops.bitpack import W
from ..ops import myers


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def pack_batch(pairs: list[tuple[bytes, bytes]], pad_cols: int = 64, pad_words: int = 2):
    """Pack a batch of byte-string pairs into padded device arrays.

    Returns dict of arrays: a0/a1 (B, max_n), pb0/pb1 (B, max_words),
    n (B,), m (B,).
    """
    B = len(pairs)
    ns = np.array([len(a) for a, _ in pairs], dtype=np.int32)
    ms = np.array([len(b) for _, b in pairs], dtype=np.int32)
    max_n = max(1, _round_up(int(ns.max(initial=0)), pad_cols))
    max_words = max(1, _round_up(bitpack.n_words(int(ms.max(initial=0))), pad_words))

    a0 = np.zeros((B, max_n), dtype=np.uint32)
    a1 = np.zeros((B, max_n), dtype=np.uint32)
    pb0 = np.zeros((B, max_words), dtype=np.uint32)
    pb1 = np.zeros((B, max_words), dtype=np.uint32)
    for idx, (a, b) in enumerate(pairs):
        ca0, ca1 = bitpack.pack_a(seq_to_codes(a))
        a0[idx, : len(a)] = ca0
        a1[idx, : len(a)] = ca1
        b0, b1 = bitpack.pack_b(seq_to_codes(b), num_words=max_words)
        pb0[idx] = b0
        pb1[idx] = b1
    # Host numpy: callers (jit / device_put) decide device placement.
    return dict(a0=a0, a1=a1, pb0=pb0, pb1=pb1, n=ns, m=ms)


def nw_cost_batch(pairs: list[tuple[bytes, bytes]]) -> np.ndarray:
    """Exact edit distances for a batch of pairs (device compute)."""
    if not pairs:
        return np.zeros((0,), dtype=np.int32)
    batch = pack_batch(pairs)
    costs = myers.nw_cost_batch(
        batch["a0"], batch["a1"], batch["pb0"], batch["pb1"], batch["n"], batch["m"]
    )
    return np.asarray(costs)


def nw_cost(a: bytes, b: bytes) -> int:
    """Exact edit distance of one pair."""
    return int(nw_cost_batch([(a, b)])[0])
