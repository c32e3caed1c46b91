"""Pallas TPU kernel: anti-diagonally staggered bitpacked Myers DP.

The speed-of-light design for the hot op (SURVEY.md §2.1 TPU mapping):

- Each VPU *lane* processes one pair of the batch (data parallelism).
- Each *sublane* holds one 32-row word of that pair's row range, so a
  single (S, LANES) uint32 tile advances ``S x LANES x 32`` DP cells per
  ~25 elementwise ops.
- Words are staggered along the anti-diagonal exactly like the reference's
  SIMD kernel (`pa-bitpacking/src/simd.rs:98-315`): at step ``t`` word ``w``
  processes column ``t - w``; the horizontal difference flows down one
  sublane per step through a shift register, and the per-word ``a``
  character planes enter at sublane 0 and shift down alongside.

Ragged batches are handled with per-lane activity masks (pairs of different
lengths finish at different steps; inactive (word, lane) cells keep their
state).  This kernel computes cost-only full-rectangle NW; the banded batch
pipeline reuses it per column block with shifted word windows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitpack import W

U32 = jnp.uint32
_ONES = 0xFFFFFFFF  # plain int: jnp scalars may not be captured by kernels


def _shift_down(x, new_row):
    """Shift sublanes down by one, inserting ``new_row`` at sublane 0."""
    if x.shape[0] == 1:
        return new_row
    return jnp.concatenate([new_row, x[:-1, :]], axis=0)


def _nw_kernel(a0_ref, a1_ref, pb0_ref, pb1_ref, n_ref, vp_ref, vm_ref):
    S, L = pb0_ref.shape
    n_max = a0_ref.shape[0]
    pb0 = pb0_ref[:]
    pb1 = pb1_ref[:]
    n = n_ref[:]  # (1, L) int32, broadcasts over sublanes
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (S, L), 0)

    def body(t, state):
        vp, vm, a0s, a1s, hop, hom = state
        # New a-char planes enter at the top word.
        tc = jnp.minimum(t, n_max - 1)
        a0_new = a0_ref[pl.ds(tc, 1), :]
        a1_new = a1_ref[pl.ds(tc, 1), :]
        a0s = _shift_down(a0s, a0_new)
        a1s = _shift_down(a1s, a1_new)
        # Horizontal diffs flow down one sublane per step; +1 at the top row.
        hin_p = _shift_down(hop, jnp.ones((1, L), U32))
        hin_m = _shift_down(hom, jnp.zeros((1, L), U32))

        eq = (a0s ^ pb0) & (a1s ^ pb1)
        # Myers column step (cf. ops.myers.step_word, inlined for fusion).
        vx = eq | vm
        eq2 = eq | hin_m
        hx = (((eq2 & vp) + vp) ^ vp) | eq2
        hp = vm | ~(hx | vp)
        hm = vp & hx
        hop_new = hp >> (W - 1)
        hom_new = hm >> (W - 1)
        hp = (hp << 1) | hin_p
        hm = (hm << 1) | hin_m
        vp_new = hm | ~(vx | hp)
        vm_new = hp & vx

        # Word w is active at step t iff 0 <= t - w < n(lane).
        tcol = t - row_idx
        act = (tcol >= 0) & (tcol < n)
        vp = jnp.where(act, vp_new, vp)
        vm = jnp.where(act, vm_new, vm)
        hop = jnp.where(act, hop_new, hop)
        hom = jnp.where(act, hom_new, hom)
        return vp, vm, a0s, a1s, hop, hom

    vp = jnp.full((S, L), _ONES, U32)
    vm = jnp.zeros((S, L), U32)
    zeros = jnp.zeros((S, L), U32)
    vp, vm, *_ = jax.lax.fori_loop(
        0, n_max + S - 1, body, (vp, vm, zeros, zeros, zeros, zeros)
    )
    vp_ref[:] = vp
    vm_ref[:] = vm


@functools.partial(jax.jit, static_argnames=("lanes_per_program",))
def nw_right_edge(a0, a1, pb0, pb1, n, lanes_per_program: int = 512):
    """Right-edge v planes at column ``n`` per pair.

    Args:
      a0, a1: (n_max, B) uint32 exploded a-char planes (column-major).
      pb0, pb1: (S, B) uint32 packed negated b profiles.
      n: (B,) int32 true a-lengths.

    Returns (vp, vm) of shape (S, B).
    """
    n_max, B = a0.shape
    S = pb0.shape[0]
    L = min(lanes_per_program, B)
    assert B % L == 0, (B, L)
    grid = (B // L,)

    return pl.pallas_call(
        _nw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_max, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_max, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((S, L), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, L), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, B), jnp.uint32),
            jax.ShapeDtypeStruct((S, B), jnp.uint32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=30 * (n_max + S) * S * B, bytes_accessed=(2 * n_max * B + 6 * S * B) * 4,
            transcendentals=0,
        ),
    )(a0, a1, pb0, pb1, n.astype(jnp.int32).reshape(1, B))


def _value_up_to(vp, vm, m):
    """sum of v diffs of rows [0, m) per lane; vp/vm (S, B), m (B,)."""
    S, B = vp.shape
    rows = jnp.arange(S, dtype=jnp.int32)[:, None] * W
    full = jnp.clip(m[None, :] - rows, 0, W)
    mask = jnp.where(full >= W, U32(_ONES), (U32(1) << full.astype(jnp.uint32)) - U32(1))
    pc = lambda x: jax.lax.population_count(x).astype(jnp.int32)
    return jnp.sum(pc(vp & mask) - pc(vm & mask), axis=0)


@functools.partial(jax.jit, static_argnames=("lanes_per_program",))
def nw_cost(a0, a1, pb0, pb1, n, m, lanes_per_program: int = 512):
    """Batched full-rectangle NW edit distances via the staggered kernel."""
    vp, vm = nw_right_edge(a0, a1, pb0, pb1, n, lanes_per_program)
    return n.astype(jnp.int32) + _value_up_to(vp, vm, m.astype(jnp.int32))


def pack_batch_staggered(pairs, lane_multiple: int = 512,
                         shape_quantum: int | None = None):
    """Pack byte pairs into the (n_max, B)/(S, B) layout of this kernel.

    Fully vectorized over the batch (one 2-D codes matrix per side; the
    per-pair python work is just the byte copy) — packing 4096 x 10kbp
    pairs takes ~100ms, not seconds.

    shape_quantum: round the padded column count UP to this multiple and
    set the profile height from a 1/256-quantized bucket-diagonal ratio,
    so a stream of same-sized batches reuses one compiled kernel geometry
    — with exact shapes, every batch's slightly different max-m forced a
    multi-second Mosaic recompile per batch.  The shared band schedule's
    slope is S*W/n_max, so preserving the RATIO (not just rounding S)
    keeps the band_threshold skew penalty bounded by ~n/256 extra rows.
    """
    from . import bitpack

    B0 = len(pairs)
    B = max(lane_multiple, -(-B0 // lane_multiple) * lane_multiple)
    ns = np.array([len(a) for a, _ in pairs] + [1] * (B - B0), dtype=np.int32)
    ms = np.array([len(b) for _, b in pairs] + [1] * (B - B0), dtype=np.int32)
    n_max = max(8, int(ns.max()))
    S = max(1, bitpack.n_words(int(ms.max())))
    if shape_quantum:
        n_q = -(-n_max // shape_quantum) * shape_quantum
        ratio = -(-(S * bitpack.W * 256) // n_max)  # ceil, 1/256ths
        n_max = n_q
        S = max(S, -(-(n_q * ratio) // (256 * bitpack.W)))

    from .. import native

    if native.available():
        # Native pack (GIL-released C++): 2-bit codes + b bit planes built
        # straight from the pair buffers — no (B, n_max) uint8 staging and
        # ~4x fewer bytes over the ~90MB/s host->device tunnel; the device
        # just unpacks/transposes (bit-identical to the numpy path,
        # tests/test_pack.py).
        a4, pb0pm, pb1pm = native.pack_batch_planes(pairs, B, n_max, S)
        a0, a1, pb0, pb1 = _unpack_planes(
            jnp.asarray(a4), jnp.asarray(pb0pm), jnp.asarray(pb1pm),
            n_max=n_max,
        )
        # ns/ms stay HOST-resident numpy: the runner reads them per rung
        # (_diag, band_threshold, direct_cap) and a device-resident copy
        # costs a ~35ms tunnel round-trip per np.asarray — measured ~40%
        # of the 10kbp align_iter steady-state period.  Kernel dispatches
        # auto-upload them (16KB, the fast direction).
        return (a0, a1, pb0, pb1, ns, ms), B0

    acodes = np.zeros((B, n_max), dtype=np.uint8)
    bcodes = np.full((B, S * bitpack.W), 0xFF, dtype=np.uint8)  # pad char
    for idx, (a, b) in enumerate(pairs):
        acodes[idx, : len(a)] = np.frombuffer(a, np.uint8)
        bcodes[idx, : len(b)] = np.frombuffer(b, np.uint8)
    # Bit-plane math runs on device (uint8 codes upload 4x less data than
    # uint32 planes, and the transposes are free there).
    a0, a1, pb0, pb1 = _pack_planes(acodes, bcodes, S)
    return (a0, a1, pb0, pb1, ns, ms), B0


@functools.partial(jax.jit, static_argnames=("n_max",))
def _unpack_planes(a4, pb0pm, pb1pm, n_max: int):
    """Device half of the native pack: unpack 4-per-byte a codes into the
    (n_max, B) sign-mask planes and transpose the pair-major b planes."""
    B = a4.shape[0]
    shifts = (jnp.arange(4, dtype=jnp.uint8) * 2)[None, None, :]
    ac = ((a4[:, :, None] >> shifts) & 3).reshape(B, -1)
    ac = ac[:, :n_max].astype(jnp.uint32)
    a0 = (jnp.uint32(0) - (ac & 1)).T
    a1 = (jnp.uint32(0) - ((ac >> 1) & 1)).T
    return a0, a1, pb0pm.T, pb1pm.T


@functools.partial(jax.jit, static_argnames=("S",))
def _pack_planes(acodes, bcodes, S: int):
    from . import bitpack

    W = bitpack.W
    B = acodes.shape[0]
    ac = ((acodes >> 1) & 3).astype(jnp.uint32)
    bc = ((bcodes >> 1) & 3).astype(jnp.uint32)  # pad 0xFF -> code 3
    a0 = (jnp.uint32(0) - (ac & 1)).T
    a1 = (jnp.uint32(0) - ((ac >> 1) & 1)).T
    shifts = jnp.arange(W, dtype=jnp.uint32)
    bits0 = ((bc & 1) ^ 1).reshape(B, S, W)
    bits1 = (((bc >> 1) & 1) ^ 1).reshape(B, S, W)
    pb0 = (bits0 << shifts).sum(axis=2, dtype=jnp.uint32).T
    pb1 = (bits1 << shifts).sum(axis=2, dtype=jnp.uint32).T
    return a0, a1, pb0, pb1


def nw_cost_pairs(pairs, lanes_per_program: int = 512):
    """Convenience: edit distances for a list of byte pairs."""
    if not pairs:
        return np.zeros(0, np.int32)
    args, B0 = pack_batch_staggered(pairs, lane_multiple=lanes_per_program)
    costs = nw_cost(*args, lanes_per_program=lanes_per_program)
    return np.asarray(costs)[:B0]
