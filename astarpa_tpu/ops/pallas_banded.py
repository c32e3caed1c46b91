"""Pallas TPU kernel: banded batched Myers DP (the production cost path).

Same algorithm and bit-exact schedules as the jnp reference
(:mod:`astarpa_tpu.ops.banded`), engineered for the VPU:

- Pairs occupy both sublanes *and* lanes: state arrays are
  ``(SW, P8, 128)`` uint32 with ``P8 * 128`` pairs per program, so each of
  the SW unrolled word-steps is a full-tile elementwise op advancing
  ``P8*128*32`` DP cells (the staggered full-rectangle kernel in
  :mod:`pallas_myers` instead lays one pair's words on sublanes).
- The word loop is a *python* loop (SW is static) — fully unrolled for
  SW <= 64 (the horizontal diff flows register-to-register); larger bands
  run a ``fori`` over 8-word groups so kernel IR stays bounded.
- ``a``-char planes stream from HBM in column blocks via the grid; v/window
  state persists in VMEM scratch across the sequential column-block grid
  dimension.

ONE state machine (`_columns`) serves every variant; thin entry shims pick:

- emit mode: cost-only (`banded_cost_tpu`), full fill (`banded_fill_tpu`,
  stores every column's planes), or checkpointed (`banded_ck_tpu`, stores
  window planes + top_val once per column block — the production CIGAR
  path; the native trace_banded_ck DT-bursts between checkpoints).
- schedule mode: *shared* — one host-precomputed rational bucket schedule
  (scalar-prefetched bits; predicated whole-window rotation every ~W
  columns; entering words from pre-gathered per-block profile slabs), or
  *per-pair* — every pair slides its own window on its own schedule
  (vector shift masks from packed bit planes, per-pair masked roll, and
  entering words streamed as pre-gathered `(n, B)` planes).  Per-pair
  schedules are what let the band follow each pair's own diagonal or a
  heuristic-informed domain (`astarpa_tpu.ops.banded.pair_gap_schedule`,
  `astarpa_tpu.domain`), the re-expression of the reference's
  heuristic-restricted computation (`astarpa2/src/domain.rs:117-235`).

Band doubling, bucketing, and acceptance live in
:mod:`astarpa_tpu.parallel.runner`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .banded import shift_at_array
from .bitpack import W

U32 = jnp.uint32
_ONES = 0xFFFFFFFF
INF32 = 1 << 30

EMIT_COST = 0
EMIT_FILL = 1
EMIT_CK = 2


def _myers_word(eqw, vpw, vmw, hp, hm):
    """One Myers uint32 word step; hp/hm are 1-bit carries (in u32)."""
    vx = eqw | vmw
    eq2 = eqw | hm
    hx = (((eq2 & vpw) + vpw) ^ vpw) | eq2
    hpo = vmw | ~(hx | vpw)
    hmo = vpw & hx
    hp_next = hpo >> (W - 1)
    hm_next = hmo >> (W - 1)
    hpo = (hpo << 1) | hp
    hmo = (hmo << 1) | hm
    return hmo | ~(vx | hpo), hpo & vx, hp_next, hm_next


def _columns(r, *, SW: int, IB: int, emit: int, per_pair: bool,
             win_any: bool, Q: int = 1, can_shift: bool = True, R: int = 1):
    """The shared column loop over one grid block.

    ``r`` is a namespace dict of refs; which keys exist depends on the
    mode (see the entry shims).  Runs IB columns: slide window(s) per the
    schedule, one banded Myers column, emit, capture results.

    Per-pair mode: schedules are quantized so shifts can only occur at
    columns that are multiples of ``Q`` (builders delay shifts, see
    banded.quantize_schedule); the masked whole-window roll and the
    schedule reads then amortize over Q plain columns, keeping the hot
    column body free of any per-pair control flow.
    """
    k = pl.program_id(1)
    P8 = r["n"].shape[1]

    @pl.when(k == 0)
    def _init():
        r["vp"][:] = jnp.full(r["vp"].shape, _ONES, U32)
        r["vm"][:] = jnp.zeros(r["vm"].shape, U32)
        if win_any:
            # Large bands: the initial window lives in HBM (a VMEM input
            # would double the band's VMEM footprint); one DMA per program.
            p = pl.program_id(0)
            c0 = pltpu.make_async_copy(
                r["wn0"].at[:, p], r["w0"].at[0:SW], r["dma"]
            )
            c0.start()
            c0.wait()
            c1 = pltpu.make_async_copy(
                r["wn1"].at[:, p], r["w1"].at[0:SW], r["dma"]
            )
            c1.start()
            c1.wait()
        else:
            r["w0"][0:SW] = r["wn0"][:, 0]
            r["w1"][0:SW] = r["wn1"][:, 0]
        r["top_val"][:] = jnp.zeros((P8, 128), jnp.int32)
        r["top_rows"][:] = jnp.zeros((P8, 128), jnp.int32)
        # Pairs with n == 0 are captured here (cost = m).
        r["res"][:] = r["m"][0]
        if not per_pair:
            r["lo"][0] = 0

    if emit == EMIT_CK:
        # Checkpoint: state + top_val entering this emission window
        # (grouped for large bands to bound temporaries).  With IB < CB
        # (R > 1) only every R-th input block starts a window; the out
        # block is revisited (unwritten) in between.
        def _emit_ck():
            r["cktv"][0, 0] = r["top_val"][:]
            if SW <= 64:
                r["ckvp"][0] = r["vp"][0:SW][:, None]
                r["ckvm"][0] = r["vm"][0:SW][:, None]
            else:
                def _ckcopy(g, _):
                    base = g * 8
                    r["ckvp"][0, pl.ds(base, 8)] = (
                        r["vp"][pl.ds(base, 8)][:, None]
                    )
                    r["ckvm"][0, pl.ds(base, 8)] = (
                        r["vm"][pl.ds(base, 8)][:, None]
                    )
                    return 0

                jax.lax.fori_loop(0, SW // 8, _ckcopy, 0)

        if R == 1:
            _emit_ck()
        else:
            pl.when(k % R == 0)(_emit_ck)

    n = r["n"][0]
    m = r["m"][0]
    nmin = jnp.min(n)
    pc = lambda x: jax.lax.population_count(x).astype(jnp.int32)

    def shift_group(g):
        """Per-pair masked window roll at a Q-group boundary: every pair
        whose (quantized) schedule shifts at column k*IB + g*Q rolls its
        window one word down.  Runs once per Q columns — all vector ops,
        amortized to <1 op/column."""
        sel1 = r["smf"][g, 0]  # (P8, 128) u32 0/1
        do_shift = sel1 > 0
        r["top_val"][:] = jnp.where(
            do_shift,
            r["top_val"][:] + pc(r["vp"][0]) - pc(r["vm"][0]),
            r["top_val"][:],
        )
        r["top_rows"][:] = r["top_rows"][:] + W * sel1.astype(jnp.int32)
        e0 = r["ent0"][g, 0]
        e1 = r["ent1"][g, 0]
        if SW <= 64:
            vp = r["vp"][:]
            vm = r["vm"][:]
            w0 = r["w0"][:]
            w1 = r["w1"][:]
            sel = do_shift[None]
            r["vp"][:] = jnp.where(
                sel,
                jnp.concatenate([vp[1:], jnp.full((1, P8, 128), _ONES, U32)], 0),
                vp,
            )
            r["vm"][:] = jnp.where(
                sel,
                jnp.concatenate([vm[1:], jnp.zeros((1, P8, 128), U32)], 0),
                vm,
            )
            r["w0"][:] = jnp.where(sel, jnp.concatenate([w0[1:], e0[None]], 0), w0)
            r["w1"][:] = jnp.where(sel, jnp.concatenate([w1[1:], e1[None]], 0), w1)
        else:
            def roll(gg, _):
                base = gg * 8
                sel = do_shift[None]
                r["vp"][pl.ds(base, 8)] = jnp.where(
                    sel, r["vp"][pl.ds(base + 1, 8)], r["vp"][pl.ds(base, 8)]
                )
                r["vm"][pl.ds(base, 8)] = jnp.where(
                    sel, r["vm"][pl.ds(base + 1, 8)], r["vm"][pl.ds(base, 8)]
                )
                r["w0"][pl.ds(base, 8)] = jnp.where(
                    sel, r["w0"][pl.ds(base + 1, 8)], r["w0"][pl.ds(base, 8)]
                )
                r["w1"][pl.ds(base, 8)] = jnp.where(
                    sel, r["w1"][pl.ds(base + 1, 8)], r["w1"][pl.ds(base, 8)]
                )
                return 0

            jax.lax.fori_loop(0, SW // 8, roll, 0)
            r["vp"][SW - 1] = jnp.where(
                do_shift, jnp.full((P8, 128), _ONES, U32), r["vp"][SW - 1]
            )
            r["vm"][SW - 1] = jnp.where(
                do_shift, jnp.zeros((P8, 128), U32), r["vm"][SW - 1]
            )
            r["w0"][SW - 1] = jnp.where(do_shift, e0, r["w0"][SW - 1])
            r["w1"][SW - 1] = jnp.where(do_shift, e1, r["w1"][SW - 1])

    def col(t, carry):
        i = k * IB + t

        # --- window slide (shared schedule only: real control flow on the
        # scalar-prefetched bit — Mosaic cannot select whole vectors on a
        # scalar predicate, and the branch skips all work ~31/32 columns).
        # can_shift=False (SW >= S: the window already covers the profile,
        # the schedule has no shifts) skips TRACING the branch — at SW=1
        # its ref slices would be statically out of bounds.
        if not per_pair and can_shift:
            @pl.when((r["shift"][i >> 5] >> (i & 31)) & 1 > 0)
            def _shift_shared():
                r["top_val"][:] = (
                    r["top_val"][:] + pc(r["vp"][0]) - pc(r["vm"][0])
                )
                r["top_rows"][:] = r["top_rows"][:] + W
                lo = r["lo"][0]
                off = lo - r["lo_block"][k]
                if SW <= 64:
                    vp = r["vp"][:]
                    vm = r["vm"][:]
                    r["vp"][:] = jnp.concatenate(
                        [vp[1:], jnp.full((1, P8, 128), _ONES, U32)], 0
                    )
                    r["vm"][:] = jnp.concatenate(
                        [vm[1:], jnp.zeros((1, P8, 128), U32)], 0
                    )
                    r["w0"][:] = jnp.concatenate(
                        [r["w0"][1:], r["sb0"][0, pl.ds(off, 1), 0]], 0
                    )
                    r["w1"][:] = jnp.concatenate(
                        [r["w1"][1:], r["sb1"][0, pl.ds(off, 1), 0]], 0
                    )
                else:
                    # Grouped shift: ascending 8-word copies never overlap
                    # their later reads, and scratch is padded by one group
                    # so the +1-offset read stays in bounds; keeps
                    # temporaries one tile-group, not O(SW) (the VMEM
                    # stack limit).
                    def roll(g, _):
                        base = g * 8
                        r["vp"][pl.ds(base, 8)] = r["vp"][pl.ds(base + 1, 8)]
                        r["vm"][pl.ds(base, 8)] = r["vm"][pl.ds(base + 1, 8)]
                        r["w0"][pl.ds(base, 8)] = r["w0"][pl.ds(base + 1, 8)]
                        r["w1"][pl.ds(base, 8)] = r["w1"][pl.ds(base + 1, 8)]
                        return 0

                    jax.lax.fori_loop(0, SW // 8, roll, 0)
                    r["vp"][SW - 1] = jnp.full((P8, 128), _ONES, U32)
                    r["vm"][SW - 1] = jnp.zeros((P8, 128), U32)
                    r["w0"][SW - 1] = r["sb0"][0, off, 0]
                    r["w1"][SW - 1] = r["sb1"][0, off, 0]
                r["lo"][0] = lo + 1

        # --- one banded column.  Small bands: fully unrolled (register h
        # chain).  Large bands: fori over groups of 8 words (one sublane
        # tile) so the kernel size stays bounded — a fully unrolled SW=512
        # body is megabytes of IR and breaks the compiler.
        ca0 = r["a0"][t, 0]
        ca1 = r["a1"][t, 0]
        active = i < n
        if SW <= 64:
            vp = r["vp"][:]
            vm = r["vm"][:]
            w0 = r["w0"][:]
            w1 = r["w1"][:]
            hp = jnp.ones((P8, 128), U32)
            hm = jnp.zeros((P8, 128), U32)
            new_vp = []
            new_vm = []
            for w in range(SW):
                eqw = (ca0 ^ w0[w]) & (ca1 ^ w1[w])
                nvp, nvm, hp, hm = _myers_word(eqw, vp[w], vm[w], hp, hm)
                new_vp.append(nvp)
                new_vm.append(nvm)
            vp2 = jnp.stack(new_vp)
            vm2 = jnp.stack(new_vm)

            if emit == EMIT_COST:
                # Fast path: before the shortest pair ends, every lane is
                # active — skip the two (SW, P8, 128) masked selects.
                @pl.when(i < nmin)
                def _store_all():
                    r["vp"][:] = vp2
                    r["vm"][:] = vm2

                @pl.when(i >= nmin)
                def _store_masked():
                    r["vp"][:] = jnp.where(active[None], vp2, vp)
                    r["vm"][:] = jnp.where(active[None], vm2, vm)
            else:
                r["vp"][:] = jnp.where(active[None], vp2, vp)
                r["vm"][:] = jnp.where(active[None], vm2, vm)
        else:
            assert SW % 8 == 0, "large bands must be multiples of 8 words"

            def group(g, h):
                hp, hm = h
                base = g * 8
                vp = r["vp"][pl.ds(base, 8)]
                vm = r["vm"][pl.ds(base, 8)]
                w0 = r["w0"][pl.ds(base, 8)]
                w1 = r["w1"][pl.ds(base, 8)]
                new_vp = []
                new_vm = []
                for w in range(8):
                    eqw = (ca0 ^ w0[w]) & (ca1 ^ w1[w])
                    nvp, nvm, hp, hm = _myers_word(eqw, vp[w], vm[w], hp, hm)
                    new_vp.append(nvp)
                    new_vm.append(nvm)
                vp2 = jnp.stack(new_vp)
                vm2 = jnp.stack(new_vm)
                r["vp"][pl.ds(base, 8)] = jnp.where(active[None], vp2, vp)
                r["vm"][pl.ds(base, 8)] = jnp.where(active[None], vm2, vm)
                return hp, hm

            jax.lax.fori_loop(
                0, SW // 8, group,
                (jnp.ones((P8, 128), U32), jnp.zeros((P8, 128), U32)),
            )
        r["top_val"][:] = jnp.where(active, r["top_val"][:] + 1, r["top_val"][:])

        if emit == EMIT_FILL:
            # Stream this column's planes out for traceback.
            if SW <= 64:
                r["vpall"][t] = r["vp"][0:SW][:, None]
                r["vmall"][t] = r["vm"][0:SW][:, None]
            else:
                def _fillcopy(g, _):
                    base = g * 8
                    r["vpall"][t, pl.ds(base, 8)] = r["vp"][pl.ds(base, 8)][:, None]
                    r["vmall"][t, pl.ds(base, 8)] = r["vm"][pl.ds(base, 8)][:, None]
                    return 0

                jax.lax.fori_loop(0, SW // 8, _fillcopy, 0)

        # --- capture per-pair results at their final column (only possible
        # once the shortest pair can finish).
        done = i == n - 1

        @pl.when((i >= nmin - 1) & jnp.any(done))
        def _capture():
            rows = m - r["top_rows"][:]
            if SW <= 64:
                vp = r["vp"][0:SW]
                vm = r["vm"][0:SW]
                base = jax.lax.broadcasted_iota(jnp.int32, (SW, P8, 128), 0) * W
                full = jnp.clip(rows[None] - base, 0, W)
                mask = jnp.where(
                    full >= W,
                    U32(_ONES),
                    (U32(1) << full.astype(jnp.uint32)) - U32(1),
                )
                val = jnp.sum(pc(vp & mask) - pc(vm & mask), axis=0)
            else:
                # Grouped masked popcount accumulation (see the shift).
                def acc(g, val):
                    gb = g * 8
                    vp = r["vp"][pl.ds(gb, 8)]
                    vm = r["vm"][pl.ds(gb, 8)]
                    base = (
                        jax.lax.broadcasted_iota(jnp.int32, (8, P8, 128), 0) + gb
                    ) * W
                    full = jnp.clip(rows[None] - base, 0, W)
                    mask = jnp.where(
                        full >= W,
                        U32(_ONES),
                        (U32(1) << full.astype(jnp.uint32)) - U32(1),
                    )
                    return val + jnp.sum(pc(vp & mask) - pc(vm & mask), axis=0)

                val = jax.lax.fori_loop(
                    0, SW // 8, acc, jnp.zeros((P8, 128), jnp.int32)
                )
            got = r["top_val"][:] + val
            got = jnp.where(rows <= SW * W, got, INF32)
            r["res"][:] = jnp.where(done, got, r["res"][:])

        return carry

    if per_pair:
        assert IB % Q == 0
        import os as _os

        if _os.environ.get("ASTARPA_EXP_NOSHIFT"):  # timing bisection only
            jax.lax.fori_loop(0, IB, col, 0)
        else:
            def col_pp(t, carry):
                @pl.when(t % Q == 0)
                def _maybe_shift():
                    shift_group(t // Q)

                return col(t, carry)

            jax.lax.fori_loop(0, IB, col_pp, 0)
    else:
        jax.lax.fori_loop(0, IB, col, 0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        r["result"][0] = r["res"][:]


# --- entry shims: unpack positional refs into the namespace dict ----------


def _kernel_shared(shift_ref, lo_block_ref,
                   a0, a1, wn0, wn1, sb0, sb1, n, m,
                   *rest, SW, IB, R, emit, win_any, can_shift=True):
    names = {"result": 0}
    if emit == EMIT_FILL:
        names = {"result": 0, "vpall": 1, "vmall": 2}
    elif emit == EMIT_CK:
        names = {"result": 0, "ckvp": 1, "ckvm": 2, "cktv": 3}
    n_out = len(names)
    outs = rest[:n_out]
    scratch = rest[n_out:]
    r = {
        "shift": shift_ref, "lo_block": lo_block_ref,
        "a0": a0, "a1": a1, "wn0": wn0, "wn1": wn1, "sb0": sb0, "sb1": sb1,
        "n": n, "m": m,
        "vp": scratch[0], "vm": scratch[1], "w0": scratch[2], "w1": scratch[3],
        "top_val": scratch[4], "top_rows": scratch[5], "res": scratch[6],
        "lo": scratch[7],
    }
    if win_any:
        r["dma"] = scratch[8]
    for nm, idx in names.items():
        r[nm] = outs[idx]
    _columns(r, SW=SW, IB=IB, R=R, emit=emit, per_pair=False,
             win_any=win_any, can_shift=can_shift)


def _kernel_perpair(a0, a1, wn0, wn1, smf, ent0, ent1, n, m,
                    *rest, SW, IB, R, emit, win_any, Q):
    names = {"result": 0}
    if emit == EMIT_FILL:
        names = {"result": 0, "vpall": 1, "vmall": 2}
    elif emit == EMIT_CK:
        names = {"result": 0, "ckvp": 1, "ckvm": 2, "cktv": 3}
    n_out = len(names)
    outs = rest[:n_out]
    scratch = rest[n_out:]
    r = {
        "a0": a0, "a1": a1, "wn0": wn0, "wn1": wn1,
        "smf": smf, "ent0": ent0, "ent1": ent1,
        "n": n, "m": m,
        "vp": scratch[0], "vm": scratch[1], "w0": scratch[2], "w1": scratch[3],
        "top_val": scratch[4], "top_rows": scratch[5], "res": scratch[6],
    }
    if win_any:
        r["dma"] = scratch[7]
    for nm, idx in names.items():
        r[nm] = outs[idx]
    _columns(r, SW=SW, IB=IB, R=R, emit=emit, per_pair=True,
             win_any=win_any, Q=Q)


# --- host-side assembly -----------------------------------------------------


def _pack_bits(flags: np.ndarray) -> np.ndarray:
    """(n,) 0/1 -> (ceil(n/32),) uint32 little-bit-endian."""
    n = flags.shape[0]
    out = np.zeros((n + 31) // 32, np.uint32)
    idx = np.nonzero(flags)[0]
    np.bitwise_or.at(out, idx >> 5, np.uint32(1) << (idx & 31).astype(np.uint32))
    return out


def _default_col_block(SW: int, PP: int, n_max: int, emit: int,
                       per_pair: bool = False) -> int:
    """Empirically validated VMEM policy (the compiler's effective limit is
    ~16MB with internal margins): small bands use the tuned a-block size;
    large bands shrink the column block so window state (16*SW*PP) +
    initial-window input (8*SW*PP) + a-blocks fit.  Per-pair schedules
    stream twice the column planes (entering-word planes next to the
    a-planes), so their blocks are half-sized."""
    if emit == EMIT_FILL:
        return min(16, max(n_max, 1))
    streams = 4 if per_pair else 2
    # Streamed blocks are double-buffered by the pipeline; per-pair mode
    # streams group-granular planes (1/Q of the a-planes), so its a-blocks
    # get the same budget.
    budget_bytes = 2 ** 23
    if SW <= 64:
        cb = max(32, min(512, budget_bytes // (PP * 8 * streams)))
    else:
        budget = 10 * 2 ** 20 - (24 + (8 if per_pair else 0)) * SW * PP
        if budget <= 16 * streams * 8 * PP:
            # Capacity, not a programming error: callers (the domain
            # ladder) catch this and fall back to the shared-band path.
            raise ValueError(
                f"band_words={SW} too large for pairs_per_program={PP}; "
                "reduce PP"
            )
        cb = max(8, min(128, budget // (16 * streams * PP)) // 8 * 8)
    if emit == EMIT_CK:
        cb = max(cb, min(1024, max(n_max, 1)))
    return min(cb, max(n_max, 1))


def pick_input_block(CB: int, PP: int, Q: int | None = None) -> int:
    """Input-block size for the checkpointing kernel: the largest divisor
    of CB from (512, 256, 128, 64, 32) whose double-buffered char slab
    (16 bytes/column/pair) fits a ~5MB budget; the smallest divisor when
    none fits; CB itself when CB has no such divisor.  ONE definition —
    `parallel.runner._select_pp` prices VMEM with this same function, so
    the model can never approve a geometry the kernel won't build."""
    divs = [c for c in (512, 256, 128, 64, 32)
            if CB % c == 0 and (Q is None or c % Q == 0)]
    ib = CB
    for c in divs:
        ib = c
        if 16 * c * PP <= 5 * 2**20:
            break
    return ib


def _banded_call(a0, a1, pb0, pb1, n, m, band_words, col_block,
                 pairs_per_program, interpret, emit, schedule, Q=32,
                 diag=None):
    n_max, B = a0.shape
    S = pb0.shape[0]
    SW = min(band_words, S)
    per_pair = schedule is not None
    PP = min(pairs_per_program, B)
    if per_pair:
        # The vectorized masked roll adds O(SW*PP) scoped temporaries on
        # top of the column body's; half-sized programs keep the Mosaic
        # stack under its 16MB limit.
        PP = min(PP, 2048)
    assert B % PP == 0 and PP % 128 == 0, (B, PP)
    P8 = PP // 128

    CB = col_block if col_block is not None else _default_col_block(
        SW, PP, n_max, emit, per_pair
    )
    CB = min(CB, max(n_max, 1))
    if per_pair:
        # Group-granular schedule reads: blocks cover whole Q-groups.
        CB = max(Q, CB // Q * Q)
    # Checkpoint mode streams inputs at IB (a divisor of CB) so the VMEM
    # slab (16 bytes/column/pair double-buffered) stays bounded while the
    # checkpoint interval CB — which sets the readback volume — can grow
    # freely; emission is gated on entering every R-th input block.
    IB = pick_input_block(CB, PP, Q if per_pair else None) if (
        emit == EMIT_CK
    ) else CB
    R = CB // IB
    n_steps = -(-n_max // IB)
    n_pad = n_steps * IB
    n_ck = -(-n_pad // CB)
    n_blocks = n_steps  # grid length along the column axis
    if n_pad != n_max:
        pad = jnp.zeros((n_pad - n_max, B), jnp.uint32)
        a0 = jnp.concatenate([a0, pad], 0)
        a1 = jnp.concatenate([a1, pad], 0)

    win_idx = np.minimum(np.arange(SW), S - 1)
    wn0 = jnp.asarray(pb0)[win_idx].reshape(SW, B)
    wn1 = jnp.asarray(pb1)[win_idx].reshape(SW, B)

    inputs = []
    in_specs = []
    scalar_args = []
    if per_pair:
        # Traced (device-side) schedule prep so per-pair calls stay
        # composable under an outer jit; all gathers are one-shot O(n*B).
        # Shifts may only occur at multiples of Q (quantized schedules,
        # banded.quantize_schedule), so the shift masks and entering-word
        # planes live at group granularity.
        sched = jnp.asarray(schedule).astype(jnp.uint32)
        assert sched.shape == (n_max, B), (sched.shape, (n_max, B))
        if n_pad != n_max:
            sched = jnp.concatenate(
                [sched, jnp.zeros((n_pad - n_max, B), jnp.uint32)], 0
            )
        smf = sched[::Q]  # (n_pad//Q, B) 0/1 group shift masks
        # Entering word planes: the word sliding in if pair p shifts at
        # column i is lo_p(i) + SW - 1 (post-shift top + window height - 1).
        # Q-quantized schedules shift only AT group boundaries (the kernel
        # reads smf alone), so lo at the boundaries is the cumsum of smf —
        # Q x less scan traffic than the per-column cumsum.
        lo_grp = jnp.cumsum(smf.astype(jnp.int32), axis=0)
        ent_idx = jnp.minimum(lo_grp + (SW - 1), S - 1)
        ent0 = jnp.take_along_axis(jnp.asarray(pb0), ent_idx, axis=0)
        ent1 = jnp.take_along_axis(jnp.asarray(pb1), ent_idx, axis=0)
        inputs += [
            smf.reshape(n_pad // Q, B // PP, P8, 128),
            ent0.reshape(n_pad // Q, B // PP, P8, 128),
            ent1.reshape(n_pad // Q, B // PP, P8, 128),
        ]
        in_specs += [
            pl.BlockSpec((IB // Q, 1, P8, 128), lambda p, k, *s: (k, p, 0, 0)),
            pl.BlockSpec((IB // Q, 1, P8, 128), lambda p, k, *s: (k, p, 0, 0)),
            pl.BlockSpec((IB // Q, 1, P8, 128), lambda p, k, *s: (k, p, 0, 0)),
        ]
    else:
        shift = shift_at_array(n_max, S, SW, diag)
        shift = np.concatenate(
            [shift, np.zeros(n_pad - n_max, np.int32)]
        ).astype(np.int32)
        shift_bits = _pack_bits(shift)
        # Per column-block profile slabs: only the words *entering* during
        # that block live in VMEM (keeps VMEM O(band), not O(m)).
        lo = np.concatenate([[0], np.cumsum(shift)]).astype(np.int32)
        lo_block = lo[np.arange(n_blocks) * IB]
        shifts_per_block = (
            lo[np.minimum((np.arange(n_blocks) + 1) * IB, n_pad)] - lo_block
        )
        # Rounded up so a stream of buckets with slightly different true
        # diagonals (diag) shares one compiled geometry.
        slab_words = -(-(int(shifts_per_block.max(initial=0)) + 1) // 8) * 8
        gather_idx = np.minimum(
            (lo_block + SW)[:, None] + np.arange(slab_words)[None, :], S - 1
        )
        sb0 = jnp.asarray(pb0)[gather_idx.reshape(-1)].reshape(
            n_blocks, slab_words, B
        )
        sb1 = jnp.asarray(pb1)[gather_idx.reshape(-1)].reshape(
            n_blocks, slab_words, B
        )
        scalar_args = [jnp.asarray(shift_bits), jnp.asarray(lo_block)]
        inputs += [
            sb0.reshape(n_blocks, slab_words, B // PP, P8, 128),
            sb1.reshape(n_blocks, slab_words, B // PP, P8, 128),
        ]
        in_specs += [
            pl.BlockSpec(
                (1, slab_words, 1, P8, 128), lambda p, k, *s: (k, 0, p, 0, 0)
            ),
            pl.BlockSpec(
                (1, slab_words, 1, P8, 128), lambda p, k, *s: (k, 0, p, 0, 0)
            ),
        ]

    a0t = a0.reshape(n_pad, B // PP, P8, 128)
    a1t = a1.reshape(n_pad, B // PP, P8, 128)
    wn0t = wn0.reshape(SW, B // PP, P8, 128)
    wn1t = wn1.reshape(SW, B // PP, P8, 128)
    nt = n.astype(jnp.int32).reshape(B // PP, P8, 128)
    mt = m.astype(jnp.int32).reshape(B // PP, P8, 128)

    win_any = SW > 256 and not interpret
    win_spec = (
        pl.BlockSpec(memory_space=pltpu.ANY)
        if win_any
        else pl.BlockSpec((SW, 1, P8, 128), lambda p, k, *s: (0, p, 0, 0))
    )
    ab_spec = pl.BlockSpec((IB, 1, P8, 128), lambda p, k, *s: (k, p, 0, 0))
    vec_spec = pl.BlockSpec((1, P8, 128), lambda p, k, *s: (p, 0, 0))

    out_shapes = [jax.ShapeDtypeStruct((B // PP, P8, 128), jnp.int32)]
    out_specs = [vec_spec]
    if emit == EMIT_FILL:
        out_shapes += [
            jax.ShapeDtypeStruct((n_pad, SW, B // PP, P8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_pad, SW, B // PP, P8, 128), jnp.uint32),
        ]
        out_specs += [
            pl.BlockSpec((IB, SW, 1, P8, 128), lambda p, k, *s: (k, 0, p, 0, 0)),
            pl.BlockSpec((IB, SW, 1, P8, 128), lambda p, k, *s: (k, 0, p, 0, 0)),
        ]
    elif emit == EMIT_CK:
        out_shapes += [
            jax.ShapeDtypeStruct((n_ck, SW, B // PP, P8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_ck, SW, B // PP, P8, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n_ck, B // PP, P8, 128), jnp.int32),
        ]
        # The out block is revisited for R consecutive grid steps (written
        # only on the first — checkpoint emission), then written back when
        # k//R advances: standard Pallas revisit semantics.
        out_specs += [
            pl.BlockSpec((1, SW, 1, P8, 128),
                         lambda p, k, *s: (k // R, 0, p, 0, 0)),
            pl.BlockSpec((1, SW, 1, P8, 128),
                         lambda p, k, *s: (k // R, 0, p, 0, 0)),
            pl.BlockSpec((1, 1, P8, 128), lambda p, k, *s: (k // R, p, 0, 0)),
        ]

    # Scratch padded by one group so the grouped shift's +1-offset reads
    # stay in bounds (large bands only).
    SWP = SW + 8 if SW > 64 else SW
    scratch = [
        pltpu.VMEM((SWP, P8, 128), jnp.uint32),
        pltpu.VMEM((SWP, P8, 128), jnp.uint32),
        pltpu.VMEM((SWP, P8, 128), jnp.uint32),
        pltpu.VMEM((SWP, P8, 128), jnp.uint32),
        pltpu.VMEM((P8, 128), jnp.int32),
        pltpu.VMEM((P8, 128), jnp.int32),
        pltpu.VMEM((P8, 128), jnp.int32),
    ]
    if not per_pair:
        scratch.append(pltpu.SMEM((1,), jnp.int32))
    if win_any:
        scratch.append(pltpu.SemaphoreType.DMA)

    out_specs_tree = tuple(out_specs) if len(out_specs) > 1 else out_specs[0]
    if per_pair:
        kernel = functools.partial(
            _kernel_perpair, SW=SW, IB=IB, R=R, emit=emit, win_any=win_any,
            Q=Q,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(B // PP, n_blocks),
            in_specs=[ab_spec, ab_spec, win_spec, win_spec] + in_specs
            + [vec_spec, vec_spec],
            out_specs=out_specs_tree,
            scratch_shapes=scratch,
        )
        call_args = [a0t, a1t, wn0t, wn1t] + inputs + [nt, mt]
    else:
        kernel = functools.partial(
            _kernel_shared, SW=SW, IB=IB, R=R, emit=emit, win_any=win_any,
            can_shift=SW < S,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B // PP, n_blocks),
            in_specs=[ab_spec, ab_spec, win_spec, win_spec] + in_specs
            + [vec_spec, vec_spec],
            out_specs=out_specs_tree,
            scratch_shapes=scratch,
        )
        call_args = scalar_args + [a0t, a1t, wn0t, wn1t] + inputs + [nt, mt]

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes) if len(out_shapes) > 1 else out_shapes[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=30 * n_pad * SW * B,
            bytes_accessed=(2 * n_pad * B) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*call_args)

    if emit == EMIT_COST:
        return outs.reshape(B)
    if emit == EMIT_FILL:
        res, vpall, vmall = outs
        return (
            res.reshape(B),
            vpall.reshape(n_pad, SW, B)[:n_max],
            vmall.reshape(n_pad, SW, B)[:n_max],
        )
    res, ckvp, ckvm, cktv = outs
    return (
        res.reshape(B),
        ckvp.reshape(n_ck, SW, B),
        ckvm.reshape(n_ck, SW, B),
        cktv.reshape(n_ck, B),
    )


# --- public entry points -----------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("band_words", "col_block", "pairs_per_program", "interpret",
                     "schedule_quantum", "diag"),
)
def banded_cost_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int,
    col_block: int | None = None, pairs_per_program: int = 4096,
    interpret: bool = False, schedule=None, schedule_quantum: int = 32,
    diag=None,
):
    """Banded batched edit-distance upper bounds (Pallas kernel).

    Same contract as :func:`astarpa_tpu.ops.banded.banded_cost`:
    a0/a1 (n_max, B), pb0/pb1 (S, B), n/m (B,) -> (B,) int32.
    ``schedule``: optional per-pair (n_max, B) 0/1 shift array (see
    banded.pair_gap_schedule / astarpa_tpu.domain); None = shared bucket
    schedule.

    Measured on one v5e chip (10kbp e=5%, SW=24, B=4096): ~2.3-2.5
    Tcells/s / ~3 Gbp/s aligned at the default PP=4096, CB=128.
    """
    return _banded_call(
        a0, a1, pb0, pb1, n, m, band_words, col_block, pairs_per_program,
        interpret, EMIT_COST, schedule, schedule_quantum, diag,
    )


@functools.partial(
    jax.jit,
    static_argnames=("band_words", "col_block", "pairs_per_program", "interpret",
                     "schedule_quantum", "diag"),
)
def banded_fill_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int,
    col_block: int = 16, pairs_per_program: int = 1024, interpret: bool = False,
    schedule=None, schedule_quantum: int = 32, diag=None,
):
    """Pallas fill: (costs, vp_cols, vm_cols) like banded.banded_fill."""
    return _banded_call(
        a0, a1, pb0, pb1, n, m, band_words, col_block, pairs_per_program,
        interpret, EMIT_FILL, schedule, schedule_quantum, diag,
    )


@functools.partial(
    jax.jit,
    static_argnames=("band_words", "col_block", "pairs_per_program", "interpret",
                     "schedule_quantum", "diag"),
)
def banded_ck_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int,
    col_block: int = 1024, pairs_per_program: int = 1024, interpret: bool = False,
    schedule=None, schedule_quantum: int = 32, diag=None,
):
    """Banded cost + per-block window checkpoints (Pallas kernel).

    Returns (costs (B,), ck_vp (n_blocks, SW, B), ck_vm, ck_tv (n_blocks, B))
    where checkpoint k is the window state + top_val after column k*CB
    (CB = min(col_block, n_max)); the native trace_banded_ck evaluates
    checkpoint columns directly and DT-bursts/recomputes in between.
    """
    return _banded_call(
        a0, a1, pb0, pb1, n, m, band_words, col_block, pairs_per_program,
        interpret, EMIT_CK, schedule, schedule_quantum, diag,
    )
