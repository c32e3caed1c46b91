"""Shape-bucketed device entry points for the block DP.

The astarpa2-style driver computes variable-sized blocks
(``ncols x nwords``); XLA wants static shapes, so these wrappers pad to
shape buckets (columns masked in the scan carry, extra below-band words
computed-and-discarded, which is exact: DP values at row j depend only on
rows <= j) and memoize one compiled kernel per bucket.

Mirrors `astarpa2/src/blocks.rs:686-748` (`compute_block`) and
`pa_bitpacking::simd::fill` (`simd.rs:326-437`) at the API level.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .myers import step_word

U32 = jnp.uint32
_ONES_NP = np.uint32(0xFFFFFFFF)


@jax.jit
def _compute(a0, a1, pb0, pb1, vp, vm, hp_in, hm_in, ncols, nwords):
    """Masked block compute: right-edge v planes + bottom h bits per column.

    Columns with index >= ncols leave the carry untouched.  The returned
    bottom h is the chain value after word ``nwords - 1`` — the true bottom
    of the requested range, not of the shape-bucket padding below it.
    """

    def col_step(carry, xs):
        vp, vm, i = carry
        ca0, ca1, hp, hm = xs
        eq = (ca0 ^ pb0) & (ca1 ^ pb1)

        def word_step(h, xs_w):
            hp, hm = h
            eq_w, vp_w, vm_w = xs_w
            vp_w, vm_w, hp, hm = step_word(eq_w, vp_w, vm_w, hp, hm)
            return (hp, hm), (vp_w, vm_w, hp, hm)

        _, (vp2, vm2, hps, hms) = jax.lax.scan(word_step, (hp, hm), (eq, vp, vm))
        hp_o = hps[nwords - 1]
        hm_o = hms[nwords - 1]
        active = i < ncols
        vp = jnp.where(active, vp2, vp)
        vm = jnp.where(active, vm2, vm)
        hp_o = jnp.where(active, hp_o, U32(0))
        hm_o = jnp.where(active, hm_o, U32(0))
        return (vp, vm, i + 1), (hp_o, hm_o)

    (vp, vm, _), (hp_out, hm_out) = jax.lax.scan(
        col_step, (vp, vm, jnp.int32(0)), (a0, a1, hp_in, hm_in)
    )
    return vp, vm, hp_out, hm_out


@jax.jit
def _fill(a0, a1, pb0, pb1, vp, vm, hp_in, hm_in, ncols):
    """Masked block fill: v planes after *every* column (for traceback)."""

    def col_step(carry, xs):
        vp, vm, i = carry
        ca0, ca1, hp, hm = xs
        eq = (ca0 ^ pb0) & (ca1 ^ pb1)

        def word_step(h, xs_w):
            hp, hm = h
            eq_w, vp_w, vm_w = xs_w
            vp_w, vm_w, hp, hm = step_word(eq_w, vp_w, vm_w, hp, hm)
            return (hp, hm), (vp_w, vm_w)

        (hp_o, hm_o), (vp2, vm2) = jax.lax.scan(word_step, (hp, hm), (eq, vp, vm))
        active = i < ncols
        vp = jnp.where(active, vp2, vp)
        vm = jnp.where(active, vm2, vm)
        return (vp, vm, i + 1), (vp, vm)

    (vp, vm, _), (vp_cols, vm_cols) = jax.lax.scan(
        col_step, (vp, vm, jnp.int32(0)), (a0, a1, hp_in, hm_in)
    )
    return vp_cols, vm_cols


def _round_up(x: int, mult: int) -> int:
    return -(-x // mult) * mult


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _pad_cols(arr: np.ndarray, size: int, fill: int = 0) -> np.ndarray:
    out = np.full(size, fill, dtype=np.uint32)
    out[: len(arr)] = arr
    return out


class BlockKernel:
    """Host-facing kernel wrapper around one pair's packed profiles.

    Holds the full packed ``a`` planes and ``b`` word-planes on host, and
    dispatches padded device calls for column ranges x word ranges.
    """

    #: Class-level switch: None = auto (native when available).  The jnp
    #: path stays as the device twin; tests force both.
    use_native: bool | None = None

    def __init__(self, a0, a1, pb0, pb1, col_bucket: int = 256):
        self.a0 = np.ascontiguousarray(a0, dtype=np.uint32)
        self.a1 = np.ascontiguousarray(a1, dtype=np.uint32)
        self.pb0 = np.ascontiguousarray(pb0, dtype=np.uint32)
        self.pb1 = np.ascontiguousarray(pb1, dtype=np.uint32)
        self.col_bucket = col_bucket
        # Stats, mirroring BlockStats (`blocks.rs:76-84`).
        self.computed_lanes = 0
        self.computed_cols = 0
        if BlockKernel.use_native is None:
            from .. import native

            self._native = native.available()
        else:
            self._native = bool(BlockKernel.use_native)

    def _slices(self, i0: int, i1: int, w0: int, w1: int, col_bucket=None):
        ncols = i1 - i0
        nwords = w1 - w0
        ncols_p = _round_up(max(ncols, 1), col_bucket or self.col_bucket)
        nwords_p = _next_pow2(max(nwords, 1))
        a0 = _pad_cols(self.a0[i0:i1], ncols_p)
        a1 = _pad_cols(self.a1[i0:i1], ncols_p)
        pb0 = np.zeros(nwords_p, dtype=np.uint32)
        pb1 = np.zeros(nwords_p, dtype=np.uint32)
        avail = max(0, min(w1 + (nwords_p - nwords), len(self.pb0)) - w0)
        pb0[:avail] = self.pb0[w0 : w0 + avail]
        pb1[:avail] = self.pb1[w0 : w0 + avail]
        return ncols, ncols_p, nwords, nwords_p, a0, a1, pb0, pb1

    def compute(self, i0, i1, w0, w1, vp, vm, hp_in=None, hm_in=None):
        """Compute columns (i0, i1] over word rows [w0, w1).

        vp/vm: (w1-w0,) uint32 left-edge vertical diffs (consumed).
        hp_in/hm_in: optional (i1-i0,) top-edge h bits; default +1.
        Returns (vp, vm, hp_out, hm_out) as numpy, cropped to true sizes.
        """
        if self._native:
            from .. import native

            ncols = i1 - i0
            nwords = w1 - w0
            a0 = np.ascontiguousarray(self.a0[i0:i1])
            a1 = np.ascontiguousarray(self.a1[i0:i1])
            pb0 = np.zeros(nwords, np.uint32)
            pb1 = np.zeros(nwords, np.uint32)
            avail = max(0, min(w1, len(self.pb0)) - w0)
            pb0[:avail] = self.pb0[w0 : w0 + avail]
            pb1[:avail] = self.pb1[w0 : w0 + avail]
            vp_o = np.ascontiguousarray(vp, np.uint32).copy()
            vm_o = np.ascontiguousarray(vm, np.uint32).copy()
            hp = np.ascontiguousarray(
                hp_in if hp_in is not None else np.ones(ncols, np.uint32),
                np.uint32,
            ).copy()
            hm = np.ascontiguousarray(
                hm_in if hm_in is not None else np.zeros(ncols, np.uint32),
                np.uint32,
            ).copy()
            native.block_compute(a0, a1, pb0, pb1, vp_o, vm_o, hp, hm)
            self.computed_lanes += nwords * ncols
            self.computed_cols += ncols
            return vp_o, vm_o, hp, hm

        ncols, ncols_p, nwords, nwords_p, a0, a1, pb0, pb1 = self._slices(i0, i1, w0, w1)
        vp_p = np.full(nwords_p, _ONES_NP, dtype=np.uint32)
        vm_p = np.zeros(nwords_p, dtype=np.uint32)
        vp_p[:nwords] = vp
        vm_p[:nwords] = vm
        hp = _pad_cols(hp_in if hp_in is not None else np.ones(ncols, np.uint32), ncols_p)
        hm = _pad_cols(hm_in if hm_in is not None else np.zeros(ncols, np.uint32), ncols_p)
        vp_o, vm_o, hp_o, hm_o = _compute(
            jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(pb0), jnp.asarray(pb1),
            jnp.asarray(vp_p), jnp.asarray(vm_p), jnp.asarray(hp), jnp.asarray(hm),
            jnp.int32(ncols), jnp.int32(nwords),
        )
        self.computed_lanes += nwords * ncols
        self.computed_cols += ncols
        return (
            np.asarray(vp_o)[:nwords],
            np.asarray(vm_o)[:nwords],
            np.asarray(hp_o)[:ncols],
            np.asarray(hm_o)[:ncols],
        )

    def fill(self, i0, i1, w0, w1, vp, vm):
        """Like compute but returns per-column v planes (ncols, nwords)."""
        if self._native:
            from .. import native

            ncols = i1 - i0
            nwords = w1 - w0
            a0 = np.ascontiguousarray(self.a0[i0:i1])
            a1 = np.ascontiguousarray(self.a1[i0:i1])
            pb0 = np.zeros(nwords, np.uint32)
            pb1 = np.zeros(nwords, np.uint32)
            avail = max(0, min(w1, len(self.pb0)) - w0)
            pb0[:avail] = self.pb0[w0 : w0 + avail]
            pb1[:avail] = self.pb1[w0 : w0 + avail]
            vp_c = np.ascontiguousarray(vp, np.uint32).copy()
            vm_c = np.ascontiguousarray(vm, np.uint32).copy()
            hp = np.ones(ncols, np.uint32)
            hm = np.zeros(ncols, np.uint32)
            vp_cols = np.zeros((ncols, nwords), np.uint32)
            vm_cols = np.zeros((ncols, nwords), np.uint32)
            native.block_fill(a0, a1, pb0, pb1, vp_c, vm_c, hp, hm,
                              vp_cols, vm_cols)
            self.computed_lanes += nwords * ncols
            self.computed_cols += ncols
            return vp_cols, vm_cols

        ncols, ncols_p, nwords, nwords_p, a0, a1, pb0, pb1 = self._slices(
            i0, i1, w0, w1, col_bucket=64
        )
        vp_p = np.full(nwords_p, _ONES_NP, dtype=np.uint32)
        vm_p = np.zeros(nwords_p, dtype=np.uint32)
        vp_p[:nwords] = vp
        vm_p[:nwords] = vm
        hp = _pad_cols(np.ones(ncols, np.uint32), ncols_p)
        hm = _pad_cols(np.zeros(ncols, np.uint32), ncols_p)
        vp_cols, vm_cols = _fill(
            jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(pb0), jnp.asarray(pb1),
            jnp.asarray(vp_p), jnp.asarray(vm_p), jnp.asarray(hp), jnp.asarray(hm),
            jnp.int32(ncols),
        )
        self.computed_lanes += nwords * ncols
        self.computed_cols += ncols
        return np.asarray(vp_cols)[:ncols, :nwords], np.asarray(vm_cols)[:ncols, :nwords]
