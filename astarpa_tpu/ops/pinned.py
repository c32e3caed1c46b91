"""Pinned-word staggered banded kernel: the big-band cost path.

The sliding-window kernel (:mod:`pallas_banded`) lays pairs on sublanes
and lanes; at large bands VMEM forces few pairs per program and sublane
utilization collapses (PP=128 -> 1/8 tiles).  This kernel transposes the
layout: **words on sublanes, 128 pairs on lanes**, with v-state pinned to
ABSOLUTE word indices — the window never slides, so there is no data
movement on shifts at all.

The intra-column h chain is broken by an anti-diagonal stagger: at step
``t`` the resident word ``w`` processes column ``c = t - w``.  Its inputs
are its own v state (step t-1, same word) and word ``w-1``'s h carry from
step t-1 (same column) — one whole-array vector step per t, full sublane
tiles at any band height (cf. the reference's SIMD stagger,
`pa-bitpacking/src/simd.rs:98-226`, re-expressed for the VPU).

Band boundaries become *event streams* precomputed on the host from the
bucket schedule (events are one-per-step scalars, prefetched as SMEM bit
masks):

- enter: word w joins at the band bottom -> its v row resets to ONES,
- absorb: word w leaves at the band top -> its value joins the running
  top boundary sum (gated per pair on the pair still being alive),
- top: the column's top word receives the +1 Ukkonen carry,
- capture: at each pair's final column the still-banded words' masked
  values accumulate (when-gated; only ~SW + length-spread steps fire).

Words below the band bottom compute garbage harmlessly (h flows only
downward; their v is reset on entry); words past the band top likewise.
The computed region is therefore [lo(c), resident bottom) — a *superset*
of the sliding kernel's band, so results are <= the sliding kernel's and
the same certificates apply (`banded.band_threshold`).

Residency: only ``RW ~ SW + O(TB * slope)`` words are resident; between
time blocks the state compacts upward by a fixed stride D under a
prefetched roll flag (static-shape grouped copies).
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


def _pack_bits_np(flags: np.ndarray) -> np.ndarray:
    out = np.zeros((len(flags) + 31) // 32, np.uint32)
    idx = np.nonzero(flags)[0]
    np.bitwise_or.at(out, idx >> 5, np.uint32(1) << (idx & 31).astype(np.uint32))
    return out


def _residency(enter_bits: np.ndarray, absorb_bits: np.ndarray, T: int,
               TB: int):
    """Per-block word bases / roll flags / residency RW from the word
    enter/absorb event streams.  Active words at time t span
    [wmin(t), wmax(t)]: wmax = words entered so far - 1; wmin = words
    absorbed so far.  Fixed-stride compaction: base advances by D under a
    per-block flag."""
    entered = np.cumsum(enter_bits.astype(np.int64))
    absorbed = np.cumsum(absorb_bits.astype(np.int64))
    n_tb = -(-T // TB)
    T_pad = n_tb * TB
    wmax_blk = np.zeros(n_tb, np.int64)
    wmin_blk = np.zeros(n_tb, np.int64)
    for k in range(n_tb):
        s, e = k * TB, min((k + 1) * TB, T)
        wmax_blk[k] = entered[e - 1] - 1
        wmin_blk[k] = absorbed[s] - 1 if s > 0 else 0
        wmin_blk[k] = max(0, min(wmin_blk[k], wmax_blk[k]))
    deltas = 1
    if n_tb > 1:
        deltas = max(
            int(np.diff(wmax_blk).max(initial=1)),
            int(np.diff(wmin_blk).max(initial=1)),
            1,
        )
    D = max(8, -(-deltas // 8) * 8)
    base = np.zeros(n_tb, np.int64)
    roll = np.zeros(n_tb, np.uint8)  # roll at the START of block k
    RW = 0
    b = 0
    for k in range(n_tb):
        if k > 0:
            b = base[k - 1]
            # roll (possibly needed) so the block's max word fits
            while wmax_blk[k] - b + 1 > 0 and wmin_blk[k] - b >= D:
                b += D
                roll[k] += 1
        base[k] = b
        RW = max(RW, int(wmax_blk[k] - b + 1))
    assert (roll <= 1).all(), "block shifts exceed one compaction stride"
    RW = -(-max(RW, D + 8) // 8) * 8
    return dict(
        T=T, T_pad=T_pad, n_tb=n_tb, TB=TB, D=D, RW=RW,
        base=base.astype(np.int32), roll=roll.astype(np.int32),
    )


def _fits_shared(plan, tb: int) -> bool:
    """Scoped-VMEM model for the shared/ck pinned kernels: ~10 RW-sized
    stack arrays (6 persistent + step temporaries) + ~4 TB-sized stream
    buffers <= 13.5MB (fitted from Mosaic OOM reports; measured 16.71M
    at RW=3024/TB=1024 against the 16MB limit)."""
    return 10 * plan["RW"] * 128 * 4 + 4 * tb * 128 * 4 <= 27 * 2 ** 19


@functools.lru_cache(maxsize=None)
def _plan(n_max: int, S: int, SW: int, TB: int, diag=None):
    """Host-side stagger plan for the bucket schedule (cached per
    geometry — the O(n_max) numpy planning repeats identically for every
    call of a streamed batch shape).

    Returns a dict of event bit masks over staggered time, per-block word
    bases/roll flags, and the residency RW.  Treat the contents as
    immutable (shared across calls).
    """
    shift = shift_at_array(n_max, S, SW, diag)
    lo = np.concatenate([[0], np.cumsum(shift)]).astype(np.int64)  # lo[c] pre-col? ->
    lo = lo[1:]  # lo[c] = top word DURING column c (post-shift), len n_max
    n_words_live = int(lo[-1]) + SW  # words 0 .. n_words_live-1 ever in band
    w_ids = np.arange(n_words_live, dtype=np.int64)
    # enter column: first c with lo[c] + SW > w  <=>  lo[c] >= w - SW + 1
    enterc = np.searchsorted(lo, np.maximum(w_ids - SW + 1, 0), side="left")
    # exit column: first c with lo[c] > w; n_max if never
    exitc = np.searchsorted(lo, w_ids + 1, side="left")
    enter_t = enterc + w_ids
    absorb_t = exitc + w_ids  # only valid where exitc < n_max
    T = int(n_max - 1 + n_words_live)  # last capture: t = n_max-1 + (last word)
    T += 1

    enter_bits = np.zeros(T, np.uint8)
    enter_bits[enter_t] = 1
    absorb_bits = np.zeros(T, np.uint8)
    ab = absorb_t[exitc < n_max]
    absorb_bits[ab] = 1
    # top events: column c's top word lo[c] at t = c + lo[c]
    top_t = np.arange(n_max, dtype=np.int64) + lo
    top_bits = np.zeros(T, np.uint8)
    top_bits[top_t] = 1

    plan = _residency(enter_bits, absorb_bits, T, TB)
    # Events ship as per-WORD times read at the word counters + scalar
    # windows, NOT per-t bit planes: Mosaic compile time scales with the
    # scalar-prefetch footprint (measured ~14min -> ~40s on the striped
    # kernel), and top events are exactly the non-absorb steps up to the
    # last top time (the c + lo(c) map skips absorb times).
    NEVER = np.int32(2 ** 30)
    plan.update(
        shift=shift, lo=lo, n_words_live=n_words_live,
        ent_t=np.concatenate(
            [enter_t.astype(np.int32), np.full(8, NEVER, np.int32)]
        ),
        abs_t=np.concatenate(
            [
                np.where(exitc < n_max, absorb_t, NEVER).astype(np.int32),
                np.full(8, NEVER, np.int32),
            ]
        ),
        last_top=np.int32(top_t[-1]),
    )
    return plan


def _plan_pp(lo_min: np.ndarray, lo_max: np.ndarray, SW: int, TB: int):
    """Residency plan for per-pair schedules, from the cross-pair window
    envelopes: word w becomes resident when the FIRST pair's band reaches
    it (driven by lo_max) and leaves when the LAST pair's band passes it
    (driven by lo_min).  Per-pair enter/absorb/top events live in the
    streamed event plane, not here."""
    n_max = len(lo_max)
    n_words_live = int(lo_max[-1]) + SW
    w_ids = np.arange(n_words_live, dtype=np.int64)
    enterc = np.searchsorted(lo_max, np.maximum(w_ids - SW + 1, 0), side="left")
    exitc = np.searchsorted(lo_min, w_ids + 1, side="left")
    T = int(n_max - 1 + n_words_live) + 1
    enter_bits = np.zeros(T, np.uint8)
    enter_bits[enterc + w_ids] = 1
    absorb_bits = np.zeros(T, np.uint8)
    ab = (exitc + w_ids)[exitc < n_max]
    absorb_bits[ab] = 1
    plan = _residency(enter_bits, absorb_bits, T, TB)
    plan["n_words_live"] = n_words_live
    return plan


def _pinned_kernel(
    # scalar prefetch
    ent_ref, abs_ref, lims_ref, base_ref, roll_ref,
    # inputs (profile + char planes whole in HBM; windows DMA'd per block)
    p0_ref, p1_ref, code_ref, n_ref, m_ref, loend_ref,
    # output
    out_ref,
    # scratch
    vp, vm, aux, acc, tot, sc, p0v, p1v, axv, dma,
    *, RW: int, TB: int, D: int, SW: int,
):
    r = dict(
        ent=ent_ref, abs=abs_ref, lims=lims_ref,
        base=base_ref, roll=roll_ref, p0=p0_ref, p1=p1_ref, code=code_ref,
        n=n_ref, m=m_ref, loend=loend_ref, out=out_ref,
        vp=vp, vm=vm, aux=aux, acc=acc, tot=tot, sc=sc, p0v=p0v, p1v=p1v,
        axv=axv, dma=dma,
    )
    _pinned_body(r, RW=RW, TB=TB, D=D, SW=SW, emit_ck=False)


def _pinned_ck_kernel(
    # scalar prefetch (+ckst: per-checkpoint capture start times)
    ent_ref, abs_ref, lims_ref, base_ref, roll_ref, ckst_ref,
    # inputs
    p0_ref, p1_ref, code_ref, n_ref, m_ref, loend_ref,
    # outputs (+per-checkpoint window planes / top_val in HBM)
    out_ref, ckvp_ref, ckvm_ref, cktv_ref,
    # scratch (+8-row capture staging and its DMA semaphore)
    vp, vm, aux, acc, tot, sc, p0v, p1v, axv, vst8, mst8, tvst, dma, dma2,
    *, RW: int, TB: int, D: int, SW: int,
):
    r = dict(
        ent=ent_ref, abs=abs_ref, lims=lims_ref,
        base=base_ref, roll=roll_ref, p0=p0_ref, p1=p1_ref, code=code_ref,
        n=n_ref, m=m_ref, loend=loend_ref, out=out_ref,
        vp=vp, vm=vm, aux=aux, acc=acc, tot=tot, sc=sc, p0v=p0v, p1v=p1v,
        axv=axv, dma=dma,
        ckst=ckst_ref, ckvp=ckvp_ref, ckvm=ckvm_ref, cktv=cktv_ref,
        vst8=vst8, mst8=mst8, tvst=tvst, dma2=dma2,
    )
    _pinned_body(r, RW=RW, TB=TB, D=D, SW=SW, emit_ck=True)


def _pinned_body(
    r, *, RW: int, TB: int, D: int, SW: int, emit_ck: bool,
):
    ent_ref, abs_ref, lims_ref = r["ent"], r["abs"], r["lims"]
    base_ref, roll_ref = r["base"], r["roll"]
    p0_ref, p1_ref, code_ref = r["p0"], r["p1"], r["code"]
    n_ref, m_ref, loend_ref, out_ref = r["n"], r["m"], r["loend"], r["out"]
    vp, vm, aux, acc, tot, sc = r["vp"], r["vm"], r["aux"], r["acc"], r["tot"], r["sc"]
    p0v, p1v, axv, dma = r["p0v"], r["p1v"], r["axv"], r["dma"]
    k = pl.program_id(1)
    p = pl.program_id(0)
    lanes = 128

    # Resident profile window [base_k, base_k + RW) and this block's char
    # chunk [k*TB - base_k, ...+TB): one DMA each per block (the windows of
    # consecutive blocks overlap almost entirely, so shipping pre-gathered
    # slabs would duplicate the profile ~RW/D times).
    base_k = base_ref[k]
    cp0 = pltpu.make_async_copy(p0_ref.at[p, pl.ds(base_k, RW)], p0v, dma)
    cp0.start()
    cp1 = pltpu.make_async_copy(p1_ref.at[p, pl.ds(base_k, RW)], p1v, dma)
    cax = pltpu.make_async_copy(
        code_ref.at[p, pl.ds(k * TB - base_k, TB)], axv, dma
    )
    cp0.wait()
    cp1.start()
    cp1.wait()
    cax.start()
    cax.wait()

    @pl.when(k == 0)
    def _init():
        vp[:] = jnp.full((RW, lanes), _ONES, U32)
        vm[:] = jnp.zeros((RW, lanes), U32)
        aux[:] = jnp.zeros((RW, lanes), U32)
        acc[:] = jnp.zeros((RW, lanes), jnp.int32)
        tot[:] = jnp.zeros((8, lanes), jnp.int32)
        sc[0] = 0  # nextw   (next word to absorb == current top word)
        sc[1] = 0  # nextent (next word to enter)
        sc[6] = abs_ref[0]  # cached next absorb time
        sc[7] = ent_ref[0]  # cached next enter time
        if emit_ck:
            sc[2] = 1   # next checkpoint index (row 0 = host-filled init)
            sc[3] = SW  # capture row; SW = no capture window active
            sc[4] = r["ckst"][1]  # cached next checkpoint start time
            sc[5] = 0   # first captured word of the active window

    @pl.when((k > 0) & (roll_ref[k] > 0))
    def _compact():
        # Slots shift up by D; bottom D slots become fresh (v garbage is
        # fine — they reset at their enter events); exiting acc flushes.
        flushed = jnp.sum(acc[pl.ds(0, D)], axis=0)
        tot[0] = tot[0] + flushed

        def mv(g, _):
            b = g * 8
            vp[pl.ds(b, 8)] = vp[pl.ds(b + D, 8)]
            vm[pl.ds(b, 8)] = vm[pl.ds(b + D, 8)]
            aux[pl.ds(b, 8)] = aux[pl.ds(b + D, 8)]
            acc[pl.ds(b, 8)] = acc[pl.ds(b + D, 8)]
            return 0

        jax.lax.fori_loop(0, (RW - D) // 8, mv, 0)
        acc[pl.ds(RW - D, D)] = jnp.zeros((D, lanes), jnp.int32)

    n = n_ref[0, 0]
    m = m_ref[0, 0]
    loend = loend_ref[0, 0]
    pc = lambda x: jax.lax.population_count(x).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (RW, lanes), 0)

    def bit(ref, t):
        return (ref[t >> 5] >> (t & 31)) & 1 > 0

    ngrp = RW // 8
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)

    def step(tt, carry):
        t = k * TB + tt
        # Next-event times are CACHED in SMEM registers (refreshed with a
        # dynamic-index read only when an event fires); was_abs BEFORE the
        # counter moves — top events are exactly the non-absorb steps up
        # to the last top time.
        was_abs = t == sc[6]

        # -- absorb: the current top word's value joins the boundary sum
        # (state after its last column = after step t-1), only for pairs
        # still alive at that column (t - w <= n_p - 1).  Masked whole-
        # array ops: dynamic sublane indexing is off the table on Mosaic.
        @pl.when(was_abs)
        def _absorb():
            s = sc[0] - base_k
            alive = ((t - sc[0]) <= n - 1)[None, :]
            sel = (iota == s) & alive
            acc[:] = acc[:] + jnp.where(sel, pc(vp[:]) - pc(vm[:]), 0)
            sc[0] = sc[0] + 1
            sc[6] = abs_ref[sc[0]]

        # -- enter: the band bottom reaches a new word -> fresh v.
        @pl.when(t == sc[7])
        def _enter():
            sel = iota == (sc[1] - base_k)
            vp[:] = jnp.where(sel, U32(_ONES), vp[:])
            vm[:] = jnp.where(sel, U32(0), vm[:])
            sc[1] = sc[1] + 1
            sc[7] = ent_ref[sc[1]]

        # -- one staggered step.  The char codes and h carries live packed
        # in one `aux` array (bits 0-1 code, 2-3 carry) that shifts down a
        # word per step; the shift + Myers update run fused per 8-word
        # group (descending, so each group reads its upper neighbor before
        # it is overwritten) — intermediates stay in registers instead of
        # round-tripping (RW, 128) temporaries through VMEM per op.
        top_now = (t <= lims_ref[0]) & jnp.logical_not(was_abs)
        s_top = sc[0] - base_k
        new0 = axv[tt]

        def group(up, b8):
            sel_top = top_now & ((iota8 + b8) == s_top)
            auxg = jnp.where(sel_top, (up & U32(3)) | U32(4), up)
            code = auxg & 3
            hp = (auxg >> 2) & 1
            hm = auxg >> 3
            a0m = jnp.zeros((8, lanes), U32) - (code & 1)
            a1m = jnp.zeros((8, lanes), U32) - (code >> 1)
            eqg = (a0m ^ p0v[pl.ds(b8, 8)]) & (a1m ^ p1v[pl.ds(b8, 8)])
            vpw = vp[pl.ds(b8, 8)]
            vmw = vm[pl.ds(b8, 8)]
            vx = eqg | vmw
            eq2 = eqg | hm
            hx = (((eq2 & vpw) + vpw) ^ vpw) | eq2
            hpo = vmw | ~(hx | vpw)
            hmo = vpw & hx
            hp_n = hpo >> (W - 1)
            hm_n = hmo >> (W - 1)
            hpo = (hpo << 1) | hp
            hmo = (hmo << 1) | hm
            vp[pl.ds(b8, 8)] = hmo | ~(vx | hpo)
            vm[pl.ds(b8, 8)] = hpo & vx
            aux[pl.ds(b8, 8)] = code | (hp_n << 2) | (hm_n << 3)
            return 0

        # Full unrolling of the group loop compiles for minutes at real
        # band sizes; the dynamic-offset fori is within ~15% of it.
        def grp_body(i, c):
            g = (ngrp - 1) - i
            b8 = g * 8
            group(aux[pl.ds(b8 - 1, 8)], b8)
            return c

        jax.lax.fori_loop(0, ngrp - 1, grp_body, 0)
        group(jnp.concatenate([new0[None], aux[pl.ds(0, 7)]], 0), 0)

        if emit_ck:
            # -- checkpoint capture: the state "after column ckcol" lands
            # on an anti-diagonal (word w finishes it at t = ckcol-1 + w),
            # so the window planes are captured one row per step into an
            # 8-row staging tile (iota8 select on the aligned sub-row) and
            # DMA'd out per aligned group.  At the window start the top
            # word IS the window top (no absorb can fire at that step),
            # so w0 = sc[0]; top_val = columns-done + absorbed-sum
            # (tot + acc; final-column capture contributions only ever
            # pollute lanes whose pair already ended — their later
            # checkpoints are never read by the traceback).
            @pl.when(t == sc[4])
            def _ck_begin():
                sc[3] = 0
                sc[5] = sc[0]
                ckcol = t - sc[0] + 1
                r["tvst"][0] = tot[0] + jnp.sum(acc[:], axis=0) + ckcol
                cpt = pltpu.make_async_copy(
                    r["tvst"], r["cktv"].at[p, sc[2]], r["dma2"]
                )
                cpt.start()
                cpt.wait()

            @pl.when(sc[3] < SW)
            def _ck_capture():
                s = sc[3]
                row = sc[5] + s - base_k
                sel8 = iota8 == (s % 8)
                r["vst8"][:] = jnp.where(sel8, vp[row][None, :], r["vst8"][:])
                r["mst8"][:] = jnp.where(sel8, vm[row][None, :], r["mst8"][:])
                sc[3] = s + 1

                @pl.when(s % 8 == 7)
                def _ck_flush8():
                    s8 = s - 7
                    cpv = pltpu.make_async_copy(
                        r["vst8"], r["ckvp"].at[p, sc[2], pl.ds(s8, 8)],
                        r["dma2"],
                    )
                    cpv.start()
                    cpv.wait()
                    cpm = pltpu.make_async_copy(
                        r["mst8"], r["ckvm"].at[p, sc[2], pl.ds(s8, 8)],
                        r["dma2"],
                    )
                    cpm.start()
                    cpm.wait()

                    @pl.when(s + 1 == SW)
                    def _ck_done():
                        sc[2] = sc[2] + 1
                        sc[4] = r["ckst"][sc[2]]

        # -- capture at each pair's final column (scalar-window-gated;
        # the per-pair masks are exact): the word on the capture diagonal
        # adds its masked value.
        @pl.when((t >= lims_ref[1]) & (t < lims_ref[2]))
        def _capture():
            w_abs = iota + base_k
            on_diag = w_abs == (t + 1) - n[None, :]
            in_band = (w_abs >= loend[None, :]) & (w_abs < loend[None, :] + SW)
            rows = m[None, :] - w_abs * W
            full = jnp.clip(rows, 0, W)
            mask = jnp.where(
                full >= W, U32(_ONES), (U32(1) << full.astype(U32)) - U32(1)
            )
            sel = on_diag & in_band
            acc[:] = acc[:] + jnp.where(sel, pc(vp[:] & mask) - pc(vm[:] & mask), 0)

        return carry

    jax.lax.fori_loop(0, TB, step, 0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        out_ref[0, 0] = tot[0] + jnp.sum(acc[:], axis=0)


@functools.lru_cache(maxsize=None)
def _pinned_shared_call(RW, TB, D, SW, ntiles, n_tb, interpret):
    """jit-cached pallas caller per static geometry (re-tracing the pallas
    closure every call costs ~0.5s of host time otherwise)."""
    kernel = functools.partial(_pinned_kernel, RW=RW, TB=TB, D=D, SW=SW)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(ntiles, n_tb),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # p0 (ntiles, S_pad, 128)
                pl.BlockSpec(memory_space=pltpu.ANY),  # p1
                pl.BlockSpec(memory_space=pltpu.ANY),  # code (ntiles, C_pad, 128)
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.int32),
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SMEM((8,), jnp.int32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((TB, 128), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def pinned_cost_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int, time_block: int = 1024,
    interpret: bool = False, static_windows: bool = False, diag=None,
):
    """Big-band banded edit distances, pinned-word staggered layout.

    Same contract as :func:`pallas_banded.banded_cost_tpu` with the shared
    bucket schedule, except the computed region extends to the residency
    bottom (a superset of the SW band), so results are <= the sliding
    kernel's and the same `band_threshold` certificate applies.
    B must be a multiple of 128; one program handles 128 pairs.

    static_windows=True makes the call TRACED-SAFE (usable inside
    shard_map / jit with traced n, m): the scalar capture window becomes
    the full time range instead of the value-derived union — a pure
    work-skipping hint; the in-kernel per-pair masks are exact either
    way (~15% more step work).
    """
    n_max, B = a0.shape
    S = pb0.shape[0]
    SW = min(band_words, S)
    assert B % 128 == 0
    ntiles = B // 128

    plan, TB = _select_tb(n_max, S, SW, time_block, diag)
    lims = _shared_lims(plan, n, m, SW, static_windows)
    return _pinned_cost_entry(n_max, S, SW, TB, ntiles, interpret, diag)(
        a0, a1, pb0, pb1, n, m, lims
    )


def _select_tb(n_max, S, SW, time_block, diag):
    """Residency is ~SW + TB + D (the initial word burst overlaps steady
    entries): when a big band overflows VMEM at the default time block,
    retry with smaller blocks before giving up — TB=256 lifts the usable
    shared-band ceiling to ~2.2k words."""
    plan = None
    for TB_try in (time_block, 512, 256):
        if TB_try > time_block:
            continue
        plan = _plan(n_max, S, SW, TB_try, diag)
        if _fits_shared(plan, TB_try):
            return plan, TB_try
    raise ValueError(
        f"pinned residency RW={plan['RW']} exceeds VMEM; use the sliding kernel"
    )


def _shared_lims(plan, n, m, SW, static_windows):
    """Per-pair capture windows t in [n_p - 1 + lo(n_p-1), +SW): the
    scalar union range gates the capture work (the in-kernel per-pair
    masks are exact).  static_windows=True derives no values from n/m
    (traced-safe)."""
    T_pad = plan["T_pad"]
    if static_windows:
        cap0, cap1 = 0, int(T_pad)
    else:
        lo = plan["lo"]
        n_np = np.asarray(n).astype(np.int64)
        loend = lo[np.clip(n_np - 1, 0, len(lo) - 1)]
        cap0 = int((n_np - 1 + loend)[n_np > 0].min(initial=0))
        cap1 = int(
            min((n_np - 1 + loend + SW)[n_np > 0].max(initial=0), T_pad)
        )
    return np.array([plan["last_top"], cap0, cap1, 0], np.int32)


@functools.lru_cache(maxsize=None)
def _pinned_cost_entry(n_max, S, SW, TB, ntiles, interpret, diag):
    """ONE jitted function per geometry covering prep (profile padding,
    char-code plane, tile transposes) + the pallas call + the certificate
    post-pass.  Eagerly dispatching the ~10 prep ops per call cost ~1s of
    tunnel round-trips at 500kbp batches; fused they are a few device
    kernels inside one dispatch."""
    plan = _plan(n_max, S, SW, TB, diag)
    RW, D, n_tb, T_pad = plan["RW"], plan["D"], plan["n_tb"], plan["T_pad"]
    B = ntiles * 128
    S_pad = int(plan["base"].max(initial=0)) + RW
    lo32 = np.asarray(plan["lo"], np.int32)
    call = _pinned_shared_call(RW, TB, D, SW, ntiles, n_tb, interpret)

    def fn(a0, a1, pb0, pb1, n, m, lims):
        n_j = jnp.asarray(n).astype(jnp.int32)
        m_j = jnp.asarray(m).astype(jnp.int32)
        loend_j = jnp.take(
            jnp.asarray(lo32), jnp.clip(n_j - 1, 0, n_max - 1)
        )
        # Whole profile planes padded so every [base_k, base_k + RW)
        # window is in bounds (pad rows replicate the S-1 clamp, matching
        # the sliding kernel's entering-word clamp), and whole char-code
        # planes padded so every block's [k*TB - base_k, +TB) chunk is in
        # bounds.
        pb0j = jnp.asarray(pb0)
        pb1j = jnp.asarray(pb1)
        if S_pad > S:
            pb0j = jnp.concatenate(
                [pb0j, jnp.broadcast_to(pb0j[-1], (S_pad - S, B))], 0
            )
            pb1j = jnp.concatenate(
                [pb1j, jnp.broadcast_to(pb1j[-1], (S_pad - S, B))], 0
            )
        code = ((jnp.asarray(a0) & 1) | ((jnp.asarray(a1) & 1) << 1)).astype(
            jnp.uint32
        )
        if T_pad > n_max:
            code = jnp.concatenate(
                [code, jnp.zeros((T_pad - n_max, B), jnp.uint32)], 0
            )
        out = call(
            jnp.asarray(plan["ent_t"]),
            jnp.asarray(plan["abs_t"]),
            jnp.asarray(lims),
            jnp.asarray(plan["base"]),
            jnp.asarray(plan["roll"]),
            jnp.moveaxis(pb0j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(pb1j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(code.reshape(T_pad, ntiles, 128), 1, 0),
            n_j.reshape(ntiles, 1, 128),
            m_j.reshape(ntiles, 1, 128),
            loend_j.reshape(ntiles, 1, 128),
        )
        res = out.reshape(B) + n_j
        # The band must still cover row m at each pair's final column.
        covered = (m_j - loend_j * W) <= SW * W
        return jnp.where(covered, res, INF32)

    return jax.jit(fn)


# --- per-pair schedules ------------------------------------------------------
#
# Every pair slides its own band (the domain-ladder bands of
# astarpa_tpu/domain.py).  The key identity: all per-pair events derive
# from the pair's shift schedule.  With lo_p(c) = the pair's window top
# word DURING column c,
#
#   top event    at t = c + lo_p(c)            (every column; the map is
#                                               strictly increasing and
#                                               skips exactly one t per
#                                               shift column),
#   absorb event at t = c + lo_p(c) - 1        (shift columns only: the
#                                               skipped t values — so
#                                               top = NOT absorb),
#   enter event  at t = c + lo_p(c) + SW - 1   (shift columns only; plus
#                                               the initial burst w < SW
#                                               at t = w),
#
# so the streamed event plane needs only two bits per (t, pair): enter and
# absorb.  The shared kernel's SMEM counters become per-lane vector
# counters; the top-carry injection point s_top becomes a lane vector.
# Residency (base/roll/RW) comes from the cross-pair lo envelopes
# (`_plan_pp`): enters driven by lo_max, absorbs by lo_min.


def _pinned_pp_kernel(
    # scalar prefetch
    anye_ref, anya_ref, cap_ref, base_ref, roll_ref,
    # inputs (profile/char/event planes whole in HBM; windows DMA'd per block)
    p0_ref, p1_ref, code_ref, ev_ref, n_ref, m_ref, loend_ref,
    # output
    out_ref,
    # scratch
    vp, vm, aux, acc, tot, cnt, p0v, p1v, axv, evv, dma,
    *, RW: int, TB: int, D: int, SW: int,
):
    _pinned_pp_body(
        anye_ref, anya_ref, cap_ref, base_ref, roll_ref,
        p0_ref, p1_ref, code_ref, ev_ref, n_ref, m_ref, loend_ref,
        out_ref, vp, vm, aux, acc, tot, cnt, p0v, p1v, axv, evv, dma,
        ck=None, RW=RW, TB=TB, D=D, SW=SW, CB=0,
    )


def _pinned_pp_ck_kernel(
    # scalar prefetch (+ per-checkpoint start times / window spans)
    anye_ref, anya_ref, cap_ref, base_ref, roll_ref, ckst_ref, cklen_ref,
    # inputs (+ per-checkpoint per-pair window-top plane)
    p0_ref, p1_ref, code_ref, ev_ref, lockp_ref, n_ref, m_ref, loend_ref,
    # outputs (+ checkpoint planes)
    out_ref, ckvp_ref, ckvm_ref, cktv_ref,
    # scratch (+ full staging planes: capture target rows differ per lane)
    vp, vm, aux, acc, tot, cnt, p0v, p1v, axv, evv,
    vpst, vmst, tvst, sck, dma, dma2,
    *, RW: int, TB: int, D: int, SW: int, CB: int,
):
    ck = dict(
        st=ckst_ref, clen=cklen_ref, lop=lockp_ref,
        vp=ckvp_ref, vm=ckvm_ref, tv=cktv_ref,
        vpst=vpst, vmst=vmst, tvst=tvst, sck=sck, dma2=dma2,
    )
    _pinned_pp_body(
        anye_ref, anya_ref, cap_ref, base_ref, roll_ref,
        p0_ref, p1_ref, code_ref, ev_ref, n_ref, m_ref, loend_ref,
        out_ref, vp, vm, aux, acc, tot, cnt, p0v, p1v, axv, evv, dma,
        ck=ck, RW=RW, TB=TB, D=D, SW=SW, CB=CB,
    )


def _pinned_pp_body(
    anye_ref, anya_ref, cap_ref, base_ref, roll_ref,
    p0_ref, p1_ref, code_ref, ev_ref, n_ref, m_ref, loend_ref,
    out_ref, vp, vm, aux, acc, tot, cnt, p0v, p1v, axv, evv, dma,
    *, ck, RW: int, TB: int, D: int, SW: int, CB: int,
):
    k = pl.program_id(1)
    p = pl.program_id(0)
    lanes = 128

    base_k = base_ref[k]
    cp0 = pltpu.make_async_copy(p0_ref.at[p, pl.ds(base_k, RW)], p0v, dma)
    cp0.start()
    cp1 = pltpu.make_async_copy(p1_ref.at[p, pl.ds(base_k, RW)], p1v, dma)
    cax = pltpu.make_async_copy(
        code_ref.at[p, pl.ds(k * TB - base_k, TB)], axv, dma
    )
    cev = pltpu.make_async_copy(ev_ref.at[p, pl.ds(k * TB, TB)], evv, dma)
    cp0.wait()
    cp1.start()
    cp1.wait()
    cax.start()
    cax.wait()
    cev.start()
    cev.wait()

    @pl.when(k == 0)
    def _init():
        vp[:] = jnp.full((RW, lanes), _ONES, U32)
        vm[:] = jnp.zeros((RW, lanes), U32)
        aux[:] = jnp.zeros((RW, lanes), U32)
        acc[:] = jnp.zeros((RW, lanes), jnp.int32)
        tot[:] = jnp.zeros((8, lanes), jnp.int32)
        cnt[:] = jnp.zeros((8, lanes), jnp.int32)  # row 0 nextw, row 1 nextent
        if ck is not None:
            sck = ck["sck"]
            sck[0] = 1  # next checkpoint index (row 0 = host-filled init)
            sck[1] = 0  # steps into the active capture window
            sck[3] = 0  # window length; 0 = inactive
            sck[2] = ck["st"][1]  # cached next window start time

    @pl.when((k > 0) & (roll_ref[k] > 0))
    def _compact():
        flushed = jnp.sum(acc[pl.ds(0, D)], axis=0)
        tot[0] = tot[0] + flushed

        def mv(g, _):
            b = g * 8
            vp[pl.ds(b, 8)] = vp[pl.ds(b + D, 8)]
            vm[pl.ds(b, 8)] = vm[pl.ds(b + D, 8)]
            aux[pl.ds(b, 8)] = aux[pl.ds(b + D, 8)]
            acc[pl.ds(b, 8)] = acc[pl.ds(b + D, 8)]
            return 0

        jax.lax.fori_loop(0, (RW - D) // 8, mv, 0)
        acc[pl.ds(RW - D, D)] = jnp.zeros((D, lanes), jnp.int32)

    n = n_ref[0, 0]
    m = m_ref[0, 0]
    loend = loend_ref[0, 0]
    pc = lambda x: jax.lax.population_count(x).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (RW, lanes), 0)
    ngrp = RW // 8
    iota8 = jax.lax.broadcasted_iota(jnp.int32, (8, lanes), 0)

    def bit(ref, t):
        return (ref[t >> 5] >> (t & 31)) & 1 > 0

    def step(tt, carry):
        t = k * TB + tt
        evt = evv[tt].astype(jnp.int32)  # (128,) event byte per pair
        aflag = (evt & 2) > 0

        # -- absorb: each flagged pair's current top word joins its
        # boundary sum (state after its last column = after step t-1),
        # gated on the pair still being alive at that column.  The outer
        # pl.when on the cross-pair ANY bit skips the masked whole-array
        # work on the ~3/4 of steps where no pair has an event.
        @pl.when(bit(anya_ref, t))
        def _absorb():
            nextw = cnt[0]
            alive = (t - nextw) <= n - 1
            sel_a = (
                (iota == (nextw - base_k)[None, :]) & (aflag & alive)[None, :]
            )
            acc[:] = acc[:] + jnp.where(sel_a, pc(vp[:]) - pc(vm[:]), 0)
            cnt[0] = nextw + jnp.where(aflag, 1, 0)

        # -- enter: each flagged pair's band bottom reaches a new word.
        @pl.when(bit(anye_ref, t))
        def _enter():
            eflag = (evt & 1) > 0
            sel_e = (iota == (cnt[1] - base_k)[None, :]) & eflag[None, :]
            vp[:] = jnp.where(sel_e, U32(_ONES), vp[:])
            vm[:] = jnp.where(sel_e, U32(0), vm[:])
            cnt[1] = cnt[1] + jnp.where(eflag, 1, 0)

        # -- one staggered step (same fused group walk as the shared
        # kernel).  The +1 top carry lands per pair at its own top word:
        # injected into the carry STREAM before the walk — word s_top's
        # input carry is aux[s_top - 1] (or the entering new0 lane when
        # s_top == 0) — as ONE masked whole-array op per step.  (A
        # per-group lane-vector select on s_top costs 2.4x the whole
        # kernel: Mosaic re-broadcasts the vector every group.)
        top_flag = jnp.logical_not(aflag)
        s_top = cnt[0] - base_k  # (128,) per-pair top slot
        sel_t = top_flag[None, :] & (iota == (s_top - 1)[None, :])
        aux[:] = jnp.where(sel_t, (aux[:] & U32(3)) | U32(4), aux[:])
        new0 = axv[tt]
        new0 = jnp.where(
            top_flag & (s_top == 0), (new0 & U32(3)) | U32(4), new0
        )

        def group(up, b8):
            auxg = up
            code = auxg & 3
            hp = (auxg >> 2) & 1
            hm = auxg >> 3
            a0m = jnp.zeros((8, lanes), U32) - (code & 1)
            a1m = jnp.zeros((8, lanes), U32) - (code >> 1)
            eqg = (a0m ^ p0v[pl.ds(b8, 8)]) & (a1m ^ p1v[pl.ds(b8, 8)])
            vpw = vp[pl.ds(b8, 8)]
            vmw = vm[pl.ds(b8, 8)]
            vx = eqg | vmw
            eq2 = eqg | hm
            hx = (((eq2 & vpw) + vpw) ^ vpw) | eq2
            hpo = vmw | ~(hx | vpw)
            hmo = vpw & hx
            hp_n = hpo >> (W - 1)
            hm_n = hmo >> (W - 1)
            hpo = (hpo << 1) | hp
            hmo = (hmo << 1) | hm
            vp[pl.ds(b8, 8)] = hmo | ~(vx | hpo)
            vm[pl.ds(b8, 8)] = hpo & vx
            aux[pl.ds(b8, 8)] = code | (hp_n << 2) | (hm_n << 3)
            return 0

        def grp_body(i, c):
            g = (ngrp - 1) - i
            b8 = g * 8
            group(aux[pl.ds(b8 - 1, 8)], b8)
            return c

        jax.lax.fori_loop(0, ngrp - 1, grp_body, 0)
        group(jnp.concatenate([new0[None], aux[pl.ds(0, 7)]], 0), 0)

        if ck is not None:
            # -- per-pair checkpoint capture: the state after shared column
            # ckcol = ckidx*CB lands on the anti-diagonal (absolute word
            # w = t - ckcol + 1 for ALL lanes — only the staging TARGET row
            # s_p = w - lo_p(ckcol) differs per lane), so the source is one
            # dynamic row read and the write one masked whole-(SW,128) op.
            # The window [lo_min, lo_max + SW) is the cross-pair union;
            # lanes outside their own [0, SW) range simply match no row.
            sck = ck["sck"]
            iota_sw = jax.lax.broadcasted_iota(jnp.int32, (SW, lanes), 0)

            @pl.when(t == sck[2])
            def _ckpp_begin():
                sck[1] = 0
                sck[3] = ck["clen"][sck[0]]

            @pl.when(sck[1] < sck[3])
            def _ckpp_capture():
                j = sck[1]
                ckidx = sck[0]
                lop = ck["lop"][ckidx, 0]  # (128,) per-pair window top
                w = t - ckidx * CB + 1
                src = w - base_k
                s_p = w - lop
                sel = iota_sw == s_p[None, :]
                ck["vpst"][:] = jnp.where(sel, vp[src][None, :], ck["vpst"][:])
                ck["vmst"][:] = jnp.where(sel, vm[src][None, :], ck["vmst"][:])

                # top_val snapshot per lane at its own window start (gated
                # to the lo-spread prefix so the acc reduction stays rare).
                @pl.when(j <= sck[3] - SW)
                def _tv():
                    tvsel = s_p == 0
                    ck["tvst"][0] = jnp.where(
                        tvsel,
                        tot[0] + jnp.sum(acc[:], axis=0) + ckidx * CB,
                        ck["tvst"][0],
                    )

                sck[1] = j + 1

                @pl.when(j + 1 == sck[3])
                def _ckpp_flush():
                    c1 = pltpu.make_async_copy(
                        ck["vpst"], ck["vp"].at[p, ckidx], ck["dma2"]
                    )
                    c1.start()
                    c1.wait()
                    c2 = pltpu.make_async_copy(
                        ck["vmst"], ck["vm"].at[p, ckidx], ck["dma2"]
                    )
                    c2.start()
                    c2.wait()
                    c3 = pltpu.make_async_copy(
                        ck["tvst"], ck["tv"].at[p, ckidx], ck["dma2"]
                    )
                    c3.start()
                    c3.wait()
                    sck[0] = ckidx + 1
                    sck[2] = ck["st"][ckidx + 1]

        # -- capture at each pair's final column (when-gated; cap bits are
        # the union over pairs, per-lane masks pick the right words).
        @pl.when(bit(cap_ref, t))
        def _capture():
            w_abs = iota + base_k
            on_diag = w_abs == (t + 1) - n[None, :]
            in_band = (w_abs >= loend[None, :]) & (w_abs < loend[None, :] + SW)
            rows = m[None, :] - w_abs * W
            full = jnp.clip(rows, 0, W)
            mask = jnp.where(
                full >= W, U32(_ONES), (U32(1) << full.astype(U32)) - U32(1)
            )
            sel = on_diag & in_band
            acc[:] = acc[:] + jnp.where(sel, pc(vp[:] & mask) - pc(vm[:] & mask), 0)

        return carry

    jax.lax.fori_loop(0, TB, step, 0)

    @pl.when(k == pl.num_programs(1) - 1)
    def _finish():
        out_ref[0, 0] = tot[0] + jnp.sum(acc[:], axis=0)


@functools.lru_cache(maxsize=None)
def _pinned_pp_call(RW, TB, D, SW, ntiles, n_tb, interpret):
    kernel = functools.partial(_pinned_pp_kernel, RW=RW, TB=TB, D=D, SW=SW)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(ntiles, n_tb),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # p0 (ntiles, S_pad, 128)
                pl.BlockSpec(memory_space=pltpu.ANY),  # p1
                pl.BlockSpec(memory_space=pltpu.ANY),  # code (ntiles, T_pad, 128)
                pl.BlockSpec(memory_space=pltpu.ANY),  # ev (ntiles, T_pad, 128)
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((RW, 128), jnp.uint32),   # vp
                pltpu.VMEM((RW, 128), jnp.uint32),   # vm
                pltpu.VMEM((RW, 128), jnp.uint32),   # aux
                pltpu.VMEM((RW, 128), jnp.int32),    # acc
                pltpu.VMEM((8, 128), jnp.int32),     # tot
                pltpu.VMEM((8, 128), jnp.int32),     # cnt (vector counters)
                pltpu.VMEM((RW, 128), jnp.uint32),   # p0v
                pltpu.VMEM((RW, 128), jnp.uint32),   # p1v
                pltpu.VMEM((TB, 128), jnp.uint32),   # axv
                pltpu.VMEM((TB, 128), jnp.uint32),   # evv
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def _pp_run(n_max, B, S, SW, TB, RW, D, n_tb, T_pad, S_pad, interpret):
    """jit-wrapped device prep + kernel call per static geometry.  The
    event plane arrives as a host-built uint8 plane (host->device upload
    is fast even on the tunnel rig; a device-side SCATTER of the O(n*B)
    event times costs ~20x the whole kernel on TPU) and widens to u32 on
    device (Mosaic cannot do dynamic single-row u8 loads)."""
    ntiles = B // 128

    def run(a0, a1, pb0, pb1, n, m, ev8, loend, anye_bits, anya_bits,
            cap_bits, base, roll):
        nn = jnp.asarray(n).astype(jnp.int32)
        mm = jnp.asarray(m).astype(jnp.int32)
        ev = jnp.asarray(ev8).astype(jnp.uint32)
        pb0j = jnp.asarray(pb0)
        pb1j = jnp.asarray(pb1)
        if S_pad > S:
            pb0j = jnp.concatenate(
                [pb0j, jnp.broadcast_to(pb0j[-1], (S_pad - S, B))], 0
            )
            pb1j = jnp.concatenate(
                [pb1j, jnp.broadcast_to(pb1j[-1], (S_pad - S, B))], 0
            )
        code = ((jnp.asarray(a0) & 1) | ((jnp.asarray(a1) & 1) << 1)).astype(
            jnp.uint32
        )
        if T_pad > n_max:
            code = jnp.concatenate(
                [code, jnp.zeros((T_pad - n_max, B), jnp.uint32)], 0
            )

        out = _pinned_pp_call(RW, TB, D, SW, ntiles, n_tb, interpret)(
            anye_bits,
            anya_bits,
            cap_bits,
            base,
            roll,
            jnp.moveaxis(pb0j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(pb1j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(code.reshape(T_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(ev.reshape(T_pad, ntiles, 128), 1, 0),
            nn.reshape(ntiles, 1, 128),
            mm.reshape(ntiles, 1, 128),
            jnp.asarray(loend).reshape(ntiles, 1, 128),
        )
        res = out.reshape(B) + nn
        # The band must still cover row m at each pair's final column.
        covered = (mm - jnp.asarray(loend) * W) <= SW * W
        return jnp.where(covered, res, INF32)

    return jax.jit(run)


def pinned_cost_pp_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int, schedule,
    time_block: int = 1024, interpret: bool = False,
):
    """Big-band banded edit distances with PER-PAIR shift schedules on the
    pinned-word staggered layout.

    Same contract as :func:`pallas_banded.banded_cost_tpu` with
    ``schedule`` — a host (n_max, B) 0/1 uint8 array, <=1 shift/column,
    column 0 unshifted — except the computed region is a superset of each
    pair's scheduled band, so results are <= the sliding per-pair kernel's
    and the domain ladder's ``cost <= f`` certificate applies unchanged.

    EVERY lane's schedule participates in the residency envelopes: callers
    must fill ignored/padding lanes with a live pair's schedule (an
    all-zero lane pins the window to word 0 and explodes RW).

    Raises ValueError when the residency (band + cross-pair spread) would
    exceed VMEM — callers fall back to the sliding kernel.
    """
    n_max, B = a0.shape
    S = pb0.shape[0]
    SW = min(band_words, S)
    assert B % 128 == 0
    sched_np = np.ascontiguousarray(np.asarray(schedule, dtype=np.uint8))
    assert sched_np.shape == (n_max, B)

    # Cross-pair window envelopes + per-pair last-column tops.  Pair-major
    # (transposed) accumulate: contiguous along the scan axis (~4x the
    # column-major cumsum) and chunked so the int32 lo plane never
    # materializes whole at long reads.
    n_np = np.asarray(n, np.int64)
    m_np = np.asarray(m, np.int64)
    last_col = np.clip(n_np - 1, 0, n_max - 1)
    sched_T = np.ascontiguousarray(sched_np.T)  # (B, n_max)
    lo_min = None
    lo_max = None
    loend = np.zeros(B, np.int32)
    chunks = []  # (pair_range, loT) for the event pass below
    for s in range(0, B, 128):
        loT = np.add.accumulate(
            sched_T[s : s + 128], axis=1, dtype=np.int32
        )  # (chunk, n_max)
        mn = loT.min(axis=0)
        mx = loT.max(axis=0)
        lo_min = mn if lo_min is None else np.minimum(lo_min, mn)
        lo_max = mx if lo_max is None else np.maximum(lo_max, mx)
        prs = np.arange(s, min(s + 128, B))
        loend[prs] = loT[prs - s, last_col[prs]]
        chunks.append((s, loT))

    # Residency is ~SW + cross-pair spread + TB: retry with smaller time
    # blocks before giving up (see pinned_cost_tpu).  The per-pair step's
    # masked enter/absorb/top-prepass ops add several RW-sized stack
    # temporaries over the shared kernel; coefficients fitted from two
    # Mosaic scoped-vmem OOM reports (25.2M and 20.8M): ~13 RW-arrays +
    # ~4 TB-arrays of scoped VMEM.
    def _fits(p, tb):
        return 13 * p["RW"] * 128 * 4 + 4 * tb * 128 * 4 <= 29 * 2 ** 19  # 14.5MB

    plan = None
    for TB_try in (time_block, 512, 256):
        if TB_try > time_block:
            continue
        plan = _plan_pp(lo_min.astype(np.int64), lo_max.astype(np.int64), SW,
                        TB_try)
        if _fits(plan, TB_try):
            break
    RW, TB, D, n_tb, T_pad = (
        plan["RW"], plan["TB"], plan["D"], plan["n_tb"], plan["T_pad"]
    )
    base = plan["base"]
    if not _fits(plan, TB):
        raise ValueError(
            f"pinned residency RW={RW} exceeds VMEM; use the sliding kernel"
        )
    S_pad = int(base.max(initial=0)) + RW

    # Event plane (bit 0 enter / bit 1 absorb), built on host: events are
    # sparse (2 per shift) and numpy fancy-index scatter is ~100x the TPU
    # scatter's throughput; upload is the fast direction on this rig.
    ev = np.zeros((T_pad + 1, B), np.uint8)
    for s, loT in chunks:
        prows, ccols = np.nonzero(sched_T[s : s + 128])
        tt = ccols + loT[prows, ccols]
        ev[tt + (SW - 1), prows + s] |= 1
        ev[tt - 1, prows + s] |= 2
    ev[:SW] |= 1  # initial burst: words w < SW enter at t = w (all pairs)
    ev = ev[:T_pad]

    # Per-pair capture window bits (union over pairs), packed to u32.
    cap = np.zeros(T_pad + 1, np.uint8)
    tcap = (np.maximum(n_np, 1) - 1 + loend)[None, :] + np.arange(SW)[:, None]
    cap[np.minimum(tcap.reshape(-1), T_pad)] = 1
    cap_bits = _pack_bits_np(cap[:T_pad])
    # Cross-pair ANY-event masks gate the masked whole-array enter/absorb
    # work (pairs on similar schedules leave ~3/4 of steps event-free).
    anye_bits = _pack_bits_np(np.bitwise_or.reduce(ev, axis=1) & 1)
    anya_bits = _pack_bits_np((np.bitwise_or.reduce(ev, axis=1) >> 1) & 1)

    run = _pp_run(n_max, B, max(S, 1), SW, TB, RW, D, n_tb, T_pad,
                  max(S_pad, S, 1), interpret)
    return run(
        a0, a1, pb0, pb1,
        np.asarray(n, np.int32),
        np.asarray(m, np.int32),
        ev,
        loend,
        anye_bits,
        anya_bits,
        cap_bits,
        base,
        plan["roll"],
    )


# --- checkpoint emission (big-band CIGAR path) -------------------------------


@functools.lru_cache(maxsize=None)
def _pinned_ck_call(RW, TB, D, SW, ntiles, n_tb, n_ck, interpret):
    kernel = functools.partial(_pinned_ck_kernel, RW=RW, TB=TB, D=D, SW=SW)
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=6,
            grid=(ntiles, n_tb),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # p0 (ntiles, S_pad, 128)
                pl.BlockSpec(memory_space=pltpu.ANY),  # p1
                pl.BlockSpec(memory_space=pltpu.ANY),  # code (ntiles, C_pad, 128)
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # ckvp
                pl.BlockSpec(memory_space=pltpu.ANY),  # ckvm
                pl.BlockSpec(memory_space=pltpu.ANY),  # cktv
            ),
            scratch_shapes=[
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.int32),
                pltpu.VMEM((8, 128), jnp.int32),
                pltpu.SMEM((8,), jnp.int32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((RW, 128), jnp.uint32),
                pltpu.VMEM((TB, 128), jnp.uint32),
                pltpu.VMEM((8, 128), jnp.uint32),   # vst8 capture staging
                pltpu.VMEM((8, 128), jnp.uint32),   # mst8
                pltpu.VMEM((8, 128), jnp.int32),    # tvst
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,            # dma2: checkpoint writes
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, n_ck, SW, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, n_ck, SW, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, n_ck, 8, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


def pinned_ck_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int, col_block: int | None = None,
    time_block: int = 1024, interpret: bool = False,
    static_windows: bool = False, diag=None,
):
    """Big-band banded cost + per-block window checkpoints on the pinned
    layout (shared bucket schedule).

    Same contract as :func:`pallas_banded.banded_ck_tpu`: returns
    ``(costs (B,), ck_vp (n_ck, SW, B), ck_vm, ck_tv (n_ck, B))`` where
    checkpoint k is the window state + top_val after column ``k*CB``
    (row 0 = the all-ones init), consumed unchanged by the native
    ``trace_banded_ck``.  The state after column ckcol lies on an
    anti-diagonal of the staggered schedule (word w finishes it at step
    ckcol-1+w), captured row-by-row into an 8-row staging tile and DMA'd
    out — requires ``CB >= SW`` so capture windows never overlap.
    """
    n_max, B = a0.shape
    S = pb0.shape[0]
    SW = min(band_words, S)
    assert B % 128 == 0 and SW % 8 == 0
    ntiles = B // 128
    CB = col_block if col_block else max(1024, SW)
    CB = min(max(CB, SW), max(n_max, 1))

    plan, TB = _select_tb(n_max, S, SW, time_block, diag)
    lims = _shared_lims(plan, n, m, SW, static_windows)
    return _pinned_ck_entry(n_max, S, SW, TB, CB, ntiles, interpret, diag)(
        a0, a1, pb0, pb1, n, m, lims
    )


@functools.lru_cache(maxsize=None)
def _pinned_ck_entry(n_max, S, SW, TB, CB, ntiles, interpret, diag):
    """Jitted prep + pallas + checkpoint post-pass per geometry (see
    :func:`_pinned_cost_entry`)."""
    plan = _plan(n_max, S, SW, TB, diag)
    RW, D, n_tb, T_pad = plan["RW"], plan["D"], plan["n_tb"], plan["T_pad"]
    B = ntiles * 128
    S_pad = int(plan["base"].max(initial=0)) + RW
    lo = plan["lo"]
    lo32 = np.asarray(lo, np.int32)
    n_ck = n_max // CB + 1

    # Checkpoint-capture start TIMES, indexed by the checkpoint counter:
    # window k (k >= 1) begins at t = k*CB - 1 + lo[k*CB - 1].
    NEVER = np.int32(2 ** 30)
    ckst = np.full(n_ck + 8, NEVER, np.int32)
    for ck in range(1, n_ck):
        ckcol = ck * CB
        ckst[ck] = ckcol - 1 + int(lo[ckcol - 1])

    call = _pinned_ck_call(RW, TB, D, SW, ntiles, n_tb, n_ck, interpret)

    def fn(a0, a1, pb0, pb1, n, m, lims):
        n_j = jnp.asarray(n).astype(jnp.int32)
        m_j = jnp.asarray(m).astype(jnp.int32)
        loend_j = jnp.take(
            jnp.asarray(lo32), jnp.clip(n_j - 1, 0, n_max - 1)
        )
        pb0j = jnp.asarray(pb0)
        pb1j = jnp.asarray(pb1)
        if S_pad > S:
            pb0j = jnp.concatenate(
                [pb0j, jnp.broadcast_to(pb0j[-1], (S_pad - S, B))], 0
            )
            pb1j = jnp.concatenate(
                [pb1j, jnp.broadcast_to(pb1j[-1], (S_pad - S, B))], 0
            )
        code = ((jnp.asarray(a0) & 1) | ((jnp.asarray(a1) & 1) << 1)).astype(
            jnp.uint32
        )
        if T_pad > n_max:
            code = jnp.concatenate(
                [code, jnp.zeros((T_pad - n_max, B), jnp.uint32)], 0
            )
        out, ckvp, ckvm, cktv = call(
            jnp.asarray(plan["ent_t"]),
            jnp.asarray(plan["abs_t"]),
            jnp.asarray(lims),
            jnp.asarray(plan["base"]),
            jnp.asarray(plan["roll"]),
            jnp.asarray(ckst),
            jnp.moveaxis(pb0j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(pb1j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(code.reshape(T_pad, ntiles, 128), 1, 0),
            n_j.reshape(ntiles, 1, 128),
            m_j.reshape(ntiles, 1, 128),
            loend_j.reshape(ntiles, 1, 128),
        )
        res = out.reshape(B) + n_j
        covered = (m_j - loend_j * W) <= SW * W
        costs = jnp.where(covered, res, INF32)
        # Checkpoint row 0 = the all-ones init (never written by the
        # kernel).
        ckvp = ckvp.at[:, 0].set(jnp.uint32(_ONES))
        ckvm = ckvm.at[:, 0].set(jnp.uint32(0))
        cktv = cktv.at[:, 0].set(0)
        ckvp = jnp.moveaxis(ckvp, 0, 2).reshape(n_ck, SW, B)
        ckvm = jnp.moveaxis(ckvm, 0, 2).reshape(n_ck, SW, B)
        cktv = jnp.moveaxis(cktv[:, :, 0, :], 0, 1).reshape(n_ck, B)
        return costs, ckvp, ckvm, cktv

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _pinned_pp_ck_call(RW, TB, D, SW, ntiles, n_tb, n_ck, CB, interpret):
    kernel = functools.partial(
        _pinned_pp_ck_kernel, RW=RW, TB=TB, D=D, SW=SW, CB=CB
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=7,
            grid=(ntiles, n_tb),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),  # p0 (ntiles, S_pad, 128)
                pl.BlockSpec(memory_space=pltpu.ANY),  # p1
                pl.BlockSpec(memory_space=pltpu.ANY),  # code (ntiles, T_pad, 128)
                pl.BlockSpec(memory_space=pltpu.ANY),  # ev (ntiles, T_pad, 128)
                pl.BlockSpec(
                    (n_ck, 1, 128), lambda p, k, *s: (0, p, 0)
                ),  # per-ck per-pair window tops
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, 128), lambda p, k, *s: (p, 0, 0)),
                pl.BlockSpec(memory_space=pltpu.ANY),  # ckvp
                pl.BlockSpec(memory_space=pltpu.ANY),  # ckvm
                pl.BlockSpec(memory_space=pltpu.ANY),  # cktv
            ),
            scratch_shapes=[
                pltpu.VMEM((RW, 128), jnp.uint32),   # vp
                pltpu.VMEM((RW, 128), jnp.uint32),   # vm
                pltpu.VMEM((RW, 128), jnp.uint32),   # aux
                pltpu.VMEM((RW, 128), jnp.int32),    # acc
                pltpu.VMEM((8, 128), jnp.int32),     # tot
                pltpu.VMEM((8, 128), jnp.int32),     # cnt
                pltpu.VMEM((RW, 128), jnp.uint32),   # p0v
                pltpu.VMEM((RW, 128), jnp.uint32),   # p1v
                pltpu.VMEM((TB, 128), jnp.uint32),   # axv
                pltpu.VMEM((TB, 128), jnp.uint32),   # evv
                pltpu.VMEM((SW, 128), jnp.uint32),   # vpst capture staging
                pltpu.VMEM((SW, 128), jnp.uint32),   # vmst
                pltpu.VMEM((8, 128), jnp.int32),     # tvst
                pltpu.SMEM((8,), jnp.int32),         # sck
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ntiles, 1, 128), jnp.int32),
            jax.ShapeDtypeStruct((ntiles, n_ck, SW, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, n_ck, SW, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ntiles, n_ck, 8, 128), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )
    return jax.jit(call)


@functools.lru_cache(maxsize=None)
def _pp_ck_run(n_max, B, S, SW, TB, RW, D, n_tb, T_pad, S_pad, n_ck, CB,
               interpret):
    """jit-wrapped device prep + per-pair checkpointing call (see _pp_run)."""
    ntiles = B // 128

    def run(a0, a1, pb0, pb1, n, m, ev8, loend, lo_ckp, anye_bits, anya_bits,
            cap_bits, ckst, cklen, base, roll):
        nn = jnp.asarray(n).astype(jnp.int32)
        mm = jnp.asarray(m).astype(jnp.int32)
        ev = jnp.asarray(ev8).astype(jnp.uint32)
        pb0j = jnp.asarray(pb0)
        pb1j = jnp.asarray(pb1)
        if S_pad > S:
            pb0j = jnp.concatenate(
                [pb0j, jnp.broadcast_to(pb0j[-1], (S_pad - S, B))], 0
            )
            pb1j = jnp.concatenate(
                [pb1j, jnp.broadcast_to(pb1j[-1], (S_pad - S, B))], 0
            )
        code = ((jnp.asarray(a0) & 1) | ((jnp.asarray(a1) & 1) << 1)).astype(
            jnp.uint32
        )
        if T_pad > n_max:
            code = jnp.concatenate(
                [code, jnp.zeros((T_pad - n_max, B), jnp.uint32)], 0
            )

        out, ckvp, ckvm, cktv = _pinned_pp_ck_call(
            RW, TB, D, SW, ntiles, n_tb, n_ck, CB, interpret
        )(
            anye_bits,
            anya_bits,
            cap_bits,
            base,
            roll,
            ckst,
            cklen,
            jnp.moveaxis(pb0j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(pb1j.reshape(S_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(code.reshape(T_pad, ntiles, 128), 1, 0),
            jnp.moveaxis(ev.reshape(T_pad, ntiles, 128), 1, 0),
            jnp.asarray(lo_ckp).reshape(n_ck, ntiles, 128),
            nn.reshape(ntiles, 1, 128),
            mm.reshape(ntiles, 1, 128),
            jnp.asarray(loend).reshape(ntiles, 1, 128),
        )
        res = out.reshape(B) + nn
        covered = (mm - jnp.asarray(loend) * W) <= SW * W
        costs = jnp.where(covered, res, INF32)
        ckvp = ckvp.at[:, 0].set(jnp.uint32(_ONES))
        ckvm = ckvm.at[:, 0].set(jnp.uint32(0))
        cktv = cktv.at[:, 0].set(0)
        ckvp = jnp.moveaxis(ckvp, 0, 2).reshape(n_ck, SW, B)
        ckvm = jnp.moveaxis(ckvm, 0, 2).reshape(n_ck, SW, B)
        cktv = jnp.moveaxis(cktv[:, :, 0, :], 0, 1).reshape(n_ck, B)
        return costs, ckvp, ckvm, cktv

    return jax.jit(run)


def pinned_ck_pp_tpu(
    a0, a1, pb0, pb1, n, m, band_words: int, schedule, col_block: int,
    time_block: int = 1024, interpret: bool = False,
):
    """Per-pair-schedule big-band cost + checkpoints on the pinned layout.

    The per-pair twin of :func:`pinned_ck_tpu`: checkpoint COLUMNS are
    shared (k * col_block) but each pair's stored window starts at its own
    ``lo_p(ckcol)``; the capture sweep is still one dynamic source-row
    read per step (the absolute word is shared), only the staging target
    row differs per lane (masked whole-array write).  Same contract as
    :func:`pallas_banded.banded_ck_tpu` with a per-pair ``schedule``.

    Requires ``col_block >= SW + max cross-pair lo-spread at any
    checkpoint`` (capture windows must not overlap); raises ValueError
    otherwise — callers fall back to the sliding ck kernel.
    """
    n_max, B = a0.shape
    S = pb0.shape[0]
    SW = min(band_words, S)
    assert B % 128 == 0
    sched_np = np.ascontiguousarray(np.asarray(schedule, dtype=np.uint8))
    assert sched_np.shape == (n_max, B)
    CB = col_block
    if CB < SW or CB > max(n_max, 1):
        # Silently clamping here would desync the caller's host-side trace
        # mirror (which must pass the SAME CB to the native traceback).
        raise ValueError("col_block out of range for the pinned ck kernel")
    n_ck = n_max // CB + 1

    n_np = np.asarray(n, np.int64)
    m_np = np.asarray(m, np.int64)
    last_col = np.clip(n_np - 1, 0, n_max - 1)
    sched_T = np.ascontiguousarray(sched_np.T)
    lo_min = None
    lo_max = None
    loend = np.zeros(B, np.int32)
    lo_ckp = np.zeros((n_ck, B), np.int32)
    ckcols = np.arange(1, n_ck) * CB - 1  # lo AFTER column k*CB
    chunks = []
    for s in range(0, B, 128):
        loT = np.add.accumulate(sched_T[s : s + 128], axis=1, dtype=np.int32)
        mn = loT.min(axis=0)
        mx = loT.max(axis=0)
        lo_min = mn if lo_min is None else np.minimum(lo_min, mn)
        lo_max = mx if lo_max is None else np.maximum(lo_max, mx)
        prs = np.arange(s, min(s + 128, B))
        loend[prs] = loT[prs - s, last_col[prs]]
        if len(ckcols):
            lo_ckp[1:, prs] = loT[:, ckcols].T
        chunks.append((s, loT))

    def _fits(p, tb):
        return (
            13 * p["RW"] * 128 * 4 + 4 * tb * 128 * 4 + 2 * SW * 128 * 4
            <= 29 * 2 ** 19
        )

    plan = None
    for TB_try in (time_block, 512, 256):
        if TB_try > time_block:
            continue
        plan = _plan_pp(lo_min.astype(np.int64), lo_max.astype(np.int64), SW,
                        TB_try)
        if _fits(plan, TB_try):
            break
    RW, TB, D, n_tb, T_pad = (
        plan["RW"], plan["TB"], plan["D"], plan["n_tb"], plan["T_pad"]
    )
    base = plan["base"]
    if not _fits(plan, TB):
        raise ValueError(
            f"pinned residency RW={RW} exceeds VMEM; use the sliding kernel"
        )
    S_pad = int(base.max(initial=0)) + RW

    ev = np.zeros((T_pad + 1, B), np.uint8)
    for s, loT in chunks:
        prows, ccols = np.nonzero(sched_T[s : s + 128])
        tt = ccols + loT[prows, ccols]
        ev[tt + (SW - 1), prows + s] |= 1
        ev[tt - 1, prows + s] |= 2
    ev[:SW] |= 1
    ev = ev[:T_pad]
    cap = np.zeros(T_pad + 1, np.uint8)
    tcap = (np.maximum(n_np, 1) - 1 + loend)[None, :] + np.arange(SW)[:, None]
    cap[np.minimum(tcap.reshape(-1), T_pad)] = 1
    cap_bits = _pack_bits_np(cap[:T_pad])
    anye_bits = _pack_bits_np(np.bitwise_or.reduce(ev, axis=1) & 1)
    anya_bits = _pack_bits_np((np.bitwise_or.reduce(ev, axis=1) >> 1) & 1)

    # Per-checkpoint capture windows (must not overlap).
    NEVER = np.int32(2 ** 30)
    ckst = np.full(n_ck + 8, NEVER, np.int32)
    cklen = np.zeros(n_ck + 8, np.int32)
    for ckk in range(1, n_ck):
        lom = int(lo_ckp[ckk].min())
        span = int(lo_ckp[ckk].max()) - lom
        ckst[ckk] = ckk * CB - 1 + lom
        cklen[ckk] = span + SW
    for ckk in range(1, n_ck - 1):
        if ckst[ckk] + cklen[ckk] > ckst[ckk + 1]:
            raise ValueError(
                "checkpoint capture windows overlap (CB too small for the "
                "cross-pair lo spread); use the sliding ck kernel"
            )

    run = _pp_ck_run(n_max, B, max(S, 1), SW, TB, RW, D, n_tb, T_pad,
                     max(S_pad, S, 1), n_ck, CB, interpret)
    return run(
        a0, a1, pb0, pb1,
        np.asarray(n, np.int32),
        np.asarray(m, np.int32),
        ev,
        loend,
        lo_ckp,
        anye_bits,
        anya_bits,
        cap_bits,
        ckst,
        cklen,
        base,
        plan["roll"],
    )
