"""Batch/streaming alignment runtime: the performance product.

The reference is single-pair single-threaded; the TPU framework's unit of
scale is a *batch* of independent pairs (SURVEY.md §2.6): pairs are bucketed
by padded shape, packed into device arrays, aligned with the banded batched
kernel (:mod:`astarpa_tpu.ops.banded`), and certified per pair; uncertified
pairs retry with a doubled band — the batch-level re-expression of the
reference's ``exponential_search`` (`astarpa2/src/band.rs:100-141`).

Multi-chip/multi-host: one ``batch`` mesh axis.  Inputs are sharded along
it with ``NamedSharding``; each pair's DP state stays on one device; the
only collectives are the result gather and ``psum``-style stat merges that
XLA inserts at readout.  No TP/PP analog exists — the unit of work is one
pair (SURVEY.md §2.6).

Kernel routing policy (one table; the code lives in ``_local_cost`` /
``_ck_kernel`` / ``_mesh_ck_kind`` / ``_domain_kernel``, the constants
below ``LAST_KERNEL``):

===========================  =================================================
geometry                     kernel
===========================  =================================================
band < 640 words, PP >= 512  sliding pairs-tile (`ops/pallas_banded`) — batch
                             amortization wins at small healthy-pp bands
band >= 640 words, or any    striped HBM boundary-carry (`ops/striped`) — no
band >= 64 when PP < 512     band ceiling (full-height exact DP), FIRST choice
                             since r5 (beats pinned at every measured band);
                             ck under the 8-aligned-top plane contract
striped guards fail (sw%8,   pinned words-on-sublanes (`ops/pinned`) — flat
CB < SW+8, B%128) and band   throughput in band height; VMEM residency guard
in [64, 2240] with PP < 512  with TB auto-shrink 1024->512->256, sliding on
or band in [640, 2240]       overflow
per-pair (domain) schedules  same ladder with per-pair modes: sliding per-pair
                             below 512 words, pinned-pp above (event streams),
                             jnp fallback off-TPU
off-TPU / no 128-lane tile   bit-identical jnp references (`ops/banded`)
===========================  =================================================

Checkpoint (CIGAR) dispatch follows the same table with ck-emitting
variants; under a mesh every shard runs the selected kernel via
``shard_map`` (pinned/striped in traced-safe static-window mode).
"""

from __future__ import annotations

import functools
import os
import sys
import time as _time
from dataclasses import dataclass, field

import numpy as np

from ..types import Cigar
from ..ops.bitpack import W, n_words

INF = 1 << 30

#: ASTARPA_STREAM_PROF=1: per-phase stderr lines for the streaming
#: runners (pack / dispatch / certify-sync / stage / flush-wait) — the
#: align_iter sibling of ASTARPA_TRACE_PROF.  Diagnostic only.
_STREAM_PROF = os.environ.get("ASTARPA_STREAM_PROF", "") == "1"


def _sprof(msg: str) -> None:
    if _STREAM_PROF:
        print(f"[sprof {_time.perf_counter():.3f}] {msg}", file=sys.stderr,
              flush=True)

# Certified-cost ceiling for direct whole-pair DT traces — must not exceed
# the native burst budget (native.DIRECT_DT_MAX; trace_direct asserts).
_DIRECT_DT_MAX = 1 << 14


@dataclass
class BatchStats:
    pairs: int = 0
    buckets: int = 0
    band_retries: int = 0
    cells_computed: int = 0
    aligned_bp: int = 0
    # Pairs whose CIGAR came from the direct whole-pair DT trace (no
    # checkpoint kernel, no checkpoint readback).
    direct_traces: int = 0
    # Best-effort label of the device kernel serving this run: a snapshot
    # of the module-level LAST_KERNEL, which is written at *trace* time.
    # Warm lru-cached jit dispatches don't re-trace (the label then reflects
    # the most recent trace anywhere in the process), and the pipelined
    # align_iter/cost_iter threads can interleave writes — so treat this as
    # a diagnostic for fresh single-run introspection (the routing itself is
    # deterministic per geometry; the snapshot is what's best-effort).
    kernel: str | None = None


@dataclass
class BatchAligner:
    """Aligns many pairs data-parallel on the available devices.

    Args:
      band_words: initial band height in uint32 words (doubled on failure).
      lane_multiple: batch padding granularity (VPU lane tiles).
      mesh: optional ``jax.sharding.Mesh`` with a ``batch`` axis; inputs are
        sharded over it.  None = single default device.
    """

    band_words: int = 8
    lane_multiple: int = 256
    mesh: object = None
    max_band_doublings: int = 8
    # Force the Pallas kernel in interpret mode off-TPU (tests/dry runs
    # exercise the exact TPU kernel-selection + shard_map path on CPU).
    pallas_interpret: bool = False
    # Domain-restricted per-pair bands (the re-expression of the
    # reference's band doubling + A* domain, `astarpa2/src/band.rs:100-141`
    # + `domain.rs:117-235`): buckets of pairs >= domain_min_bp run an f
    # ladder where each pair's window follows its own domain hull:
    #   "gap"  — closed-form cost-f parallelogram (no host work; removes
    #            the bucket-skew and |m-n| certificate penalties),
    #   "gcsh" — fwd+rev GCSH heuristic domain sampled by the native
    #            runtime (much thinner bands at high divergence; costs
    #            ~1-3s of host CPU per 500kbp pair to build, parallel
    #            across pairs on multi-core hosts),
    #   "auto" — gcsh when the native runtime is available and the host
    #            has >= 8 cores to amortize builds; gap otherwise,
    #   "off"  — plain shared-bucket Ukkonen band ladder only.
    domain_mode: str = "auto"
    domain_min_bp: int = 32768
    domain_k: int = 12
    domain_r: int = 2
    max_f_rounds: int = 10
    # Checkpoint interval (columns) for the ck/trace path; None =
    # max(4096, band).  The device->host
    # checkpoint readback shrinks ~1/CB while the native DT-burst trace is
    # ~flat in CB (x-drop live-window bursts; see native trace prof) until
    # very long segments start paying pruned-burst retries.
    ck_col_block: int | None = None
    # Direct whole-pair DT traces: when a rung's certification threshold
    # fits the native backward-burst budget (native.DIRECT_DT_MAX), the
    # rung runs the plain COST kernel and certified pairs are traced
    # host-side from the certified cost alone — zero checkpoint planes on
    # the device->host link (its ~7MB/s + ~150ms/transfer is the dominant
    # steady-state term for small/medium pairs).  Purely a dispatch
    # choice; exactness is carried by the same certificates either way.
    direct_dt: bool = True
    # Padded-geometry quantum for packing ("auto": none below 4kbp, 512 to
    # 32kbp, 2048 above).  A stream of same-shaped batches then reuses ONE
    # compiled kernel geometry instead of paying a multi-second Mosaic
    # recompile for every batch's slightly different max-m (see
    # ops.pallas_myers.pack_batch_staggered shape_quantum).
    shape_quantum: object = "auto"
    # Warm-start band hints: bucket-class -> the tightest band the last
    # bucket of that class NEEDED (band_for_cost of its certified costs).
    # In a stream of similar batches the ladder then
    # starts AT the certifying rung (no probe rung, no extra device sync);
    # distribution drift is caught by the normal certificate + rung
    # prediction.  Purely a starting point — never affects exactness.
    _band_hints: dict = field(default_factory=dict, repr=False)
    # Sticky diagonal aims per packed geometry (see _diag).
    _diag_hints: dict = field(default_factory=dict, repr=False)
    # Prefetched gcsh domain builds: (id(pairs), bucket) -> Future of the
    # handle list, submitted by the streaming runners while the previous
    # batch's kernel is in flight (builds are GIL-released ctypes calls,
    # so they overlap device waits even on one core).
    _domain_prefetch: dict = field(default_factory=dict, repr=False)
    _prefetch_ex: object = field(default=None, repr=False)

    @staticmethod
    def _bucket_class(bucket_pairs) -> int:
        n_top = max(len(a) for a, _ in bucket_pairs)
        ncls, size = 0, 64
        while size < n_top:
            size = int(size * 1.5) + 1
            ncls += 1
        return ncls

    @staticmethod
    def _note_need(need_max: int, costs, slots, n, m, B0: int, diag) -> int:
        """Running max of the TIGHT band the certified pairs actually
        needed (band_for_cost inverse) — what the warm-start hint records.
        Recording the rung band instead would ratchet: one outlier batch
        would inflate the start band for its whole class forever, since a
        too-high start always certifies and re-records itself."""
        if not slots:
            return need_max
        from ..ops import banded

        sel = np.asarray(slots)
        need = banded.band_for_cost(
            np.asarray(costs)[sel], np.asarray(n)[:B0][sel],
            np.asarray(m)[:B0][sel], *diag,
        )
        # Quantize to the ladder's rung grid (pow2 to 64, then multiples
        # of 64): a raw need drifts a few words between batches, and a
        # drifting start band would be a NEW kernel geometry (multi-second
        # recompile) per batch.
        b = int(need.max()) + 1
        if b <= 64:
            p = 4
            while p < b:
                p *= 2
            b = p
        else:
            b = -(-b // 64) * 64
        return max(need_max, b)

    def _shape_quantum(self, bucket_pairs) -> int | None:
        if self.shape_quantum != "auto":
            return self.shape_quantum or None
        n_top = max(len(a) for a, _ in bucket_pairs)
        if n_top <= 4096:
            return None
        return 512 if n_top <= 32768 else 2048

    def _diag(self, n, m, B0: int, n_max: int, S: int) -> tuple:
        """STICKY quantized bucket diagonal for schedules + thresholds: aim
        the shared band at the pairs' real max (n, m) instead of the padded
        plane bottom — shape padding (shape_quantum) then costs zero band
        rows.  The aim is remembered per packed geometry and reused while
        the new batch's max-m sits within a small budget (~n/128) below it,
        because ``diag`` is a static jit arg: every distinct value costs a
        multi-second XLA wrapper compile, so a stream of similar batches
        must converge on ONE value.  Soundness: band_threshold's dev term
        measures each pair against this same diagonal, so the <=budget
        overshoot is priced into the certificate."""
        n_arr = np.asarray(n)[:B0]
        m_arr = np.asarray(m)[:B0]
        n_top = max(1, int(n_arr.max()))
        m_top = int(m_arr.max())
        cand = -(-(m_top * n_max) // n_top)  # rescale slope to padded cols
        cand = min(-(-cand // 32) * 32, S * W)
        # The aim need not sit above every m — band_threshold's dev term
        # prices |aim - m| in BOTH directions — so reuse symmetrically.
        budget = max(64, n_top >> 7)
        key = (n_max, S)
        prev = self._diag_hints.get(key)
        if prev is not None and abs(cand - prev) <= budget:
            return (n_max, prev)
        self._diag_hints[key] = cand
        return (n_max, cand)

    def _cb(self, sw: int, n_max: int) -> int:
        if self.ck_col_block:
            base = self.ck_col_block
        else:
            # n_max/32 keeps the checkpoint count ~32 regardless of pair
            # length: the device->host readback shrinks 1/CB while the
            # native DT bursts stay flat in CB (x-drop live windows), and
            # the per-segment burst cost is bounded by the band — a
            # certified distance satisfies d <= ~16*sw, so the segment
            # distance d*CB/n <= sw/2 always fits the burst budget.
            # Measured at 500kbp e=15% x128: CB 4096 -> 16384 cut
            # cost+CIGAR from ~0.3 to 0.076 s/pair (readback-bound).
            base = max(4096, sw, n_max // 32)
        # sw+8: the striped ck kernel's 8-aligned capture windows need
        # CB >= SW + 8 (the other ck kernels accept any CB >= SW).
        # Rounded to a multiple of 512 (unless clamped by n_max) so the
        # sliding ck kernel can stream inputs at a small divisor block
        # while emitting checkpoints every CB columns.
        cb = max(base, sw + 8)
        cb = -(-cb // 512) * 512
        return min(cb, max(n_max, 1))

    def cost(self, pairs) -> np.ndarray:
        costs, _ = self.cost_with_stats(pairs)
        return costs

    def cost_with_stats(self, pairs) -> tuple[np.ndarray, BatchStats]:
        """Exact edit distances for a list of byte pairs."""
        stats = BatchStats(pairs=len(pairs))
        out = np.full(len(pairs), -1, dtype=np.int64)

        # Trivial pairs never hit the device.
        todo: list[int] = []
        for idx, (a, b) in enumerate(pairs):
            if len(a) == 0 or len(b) == 0:
                out[idx] = len(a) + len(b)
            else:
                todo.append(idx)

        for bucket in _buckets(pairs, todo):
            stats.buckets += 1
            mode = self._resolve_domain_mode(pairs, bucket, want_cigars=False)
            if mode:
                self._domain_ladder(pairs, bucket, out, stats, mode=mode)
            else:
                self._run_bucket(pairs, bucket, out, stats)

        stats.aligned_bp = sum(len(a) for a, _ in pairs)
        assert (out >= 0).all()
        return out, stats

    # -- internals -----------------------------------------------------------

    def _run_bucket(self, pairs, idxs: list[int], out: np.ndarray, stats: BatchStats) -> None:
        rung = self._rung_start(pairs, self._new_ladder(pairs, idxs), stats)
        while rung is not None:
            rung = self._rung_finish(pairs, out, stats, rung)

    def _new_ladder(self, pairs, idxs: list[int]) -> dict:
        """Fresh band-ladder state for one bucket.  The warm-start hint
        REPLACES the configured start band (it is the measured tight need
        of the last same-class bucket, 64-word quantized with margin): a
        large configured band_words would otherwise put a permanent floor
        under the ladder and waste kernel cells forever.  A drifted batch
        that fails the hint rung retries via the normal certificate
        ladder."""
        cls = self._bucket_class([pairs[i] for i in idxs])
        return dict(
            cls=cls,
            band=self._band_hints.get(cls) or self.band_words,
            need_max=1,
            pending=list(idxs),
            attempt=0,
            # (args, B0, members): reused across rungs while the padded
            # batch wouldn't shrink much — repacking costs host time and
            # an upload per rung, extra already-certified lanes only
            # device time (the cheap resource; cf.
            # `astarpa2/src/domain.rs:452-455` reuse).
            packed=None,
        )

    def _rung_start(self, pairs, lad: dict, stats: BatchStats) -> dict:
        """Dispatch ONE band rung: repack if the pending set shrank, pick
        the window, launch the cost kernel ASYNCHRONOUSLY.  The device
        result is not synced here — `cost_iter` packs and dispatches the
        next batch while this rung is in flight; :meth:`_rung_finish`
        certifies."""
        from ..ops.pallas_myers import pack_batch_staggered

        if lad["packed"] is None or 2 * len(lad["pending"]) <= len(
            lad["packed"][2]
        ):
            bucket_pairs = [pairs[i] for i in lad["pending"]]
            args, B0 = pack_batch_staggered(
                bucket_pairs, self._pack_multiple(),
                shape_quantum=self._shape_quantum(bucket_pairs),
            )
            args = self._shard(args)
            lad["packed"] = (args, B0, list(lad["pending"]))
        args, B0, members = lad["packed"]
        a0, a1, pb0, pb1, n, m = args
        n_max, S = a0.shape[0], pb0.shape[0]
        diag = self._diag(n, m, B0, n_max, S)
        sw = min(lad["band"], S)
        # Skewed buckets (m_max > W * n_max) have no valid <=1-word/column
        # shift schedule; and the last ladder rung clamps to the always-
        # exact full-height window so the ladder converges for any input.
        if S > max(n_max, 1) or lad["attempt"] >= self.max_band_doublings:
            sw = S
        costs_dev = self._kernel(a0, a1, pb0, pb1, n, m, sw, S, diag)
        stats.cells_computed += n_max * sw * W * len(members)
        stats.kernel = LAST_KERNEL
        return dict(lad=lad, costs_dev=costs_dev, sw=sw, S=S, diag=diag)

    def _rung_finish(self, pairs, out, stats: BatchStats, rung: dict):
        """Sync + certify one in-flight rung; returns the next in-flight
        rung (retry at a wider band) or None when the bucket is done."""
        from ..ops import banded

        lad = rung["lad"]
        args, B0, members = lad["packed"]
        _a0, _a1, _pb0, _pb1, n, m = args
        sw, S, diag = rung["sw"], rung["S"], rung["diag"]
        costs = np.asarray(rung["costs_dev"])[:B0]
        if sw >= S:
            # Full-height window: always exact.
            ok = np.ones(B0, dtype=bool)
        else:
            thr = banded.band_threshold(
                sw, np.asarray(n)[:B0], np.asarray(m)[:B0], *diag
            )
            ok = costs <= thr
        pending_set = set(lad["pending"])
        nxt = []
        fail_slots = []
        ok_slots = []
        for slot, i in enumerate(members):
            if i not in pending_set:
                continue
            if ok[slot]:
                out[i] = int(costs[slot])
                ok_slots.append(slot)
            else:
                nxt.append(i)
                fail_slots.append(slot)
        lad["need_max"] = self._note_need(
            lad["need_max"], costs, ok_slots, n, m, B0, diag
        )
        lad["pending"] = nxt
        if not nxt:
            self._band_hints[lad["cls"]] = lad["need_max"]
            return None
        assert sw < S, "full-height window must certify every pair"
        stats.band_retries += 1
        lad["band"] = self._next_band(lad["band"], costs, fail_slots, n, m,
                                      B0, diag)
        lad["attempt"] += 1
        return self._rung_start(pairs, lad, stats)

    def cost_iter(self, batches):
        """Pipelined streaming costs: yields one ``(costs, stats)`` per
        input batch, in order.  Batch k+1's host pack + first-rung
        dispatch run while batch k's kernel is still in flight on the
        device (jax dispatch is async; the sync happens at
        certification), so in steady state per-batch wall-clock ~= the
        kernel time and the pack rides the device gap — the cost-path
        sibling of :meth:`align_iter` (BASELINE config #5's streaming
        shape).  Domain-mode buckets and band retries are handled
        synchronously at finish time (rare in a hint-warmed stream)."""
        pending = None
        for pairs in batches:
            cur = self._cost_dispatch(pairs)
            if pending is not None:
                yield self._cost_finish(*pending)
            pending = cur
        if pending is not None:
            yield self._cost_finish(*pending)

    def _cost_dispatch(self, pairs):
        stats = BatchStats(pairs=len(pairs))
        out = np.full(len(pairs), -1, dtype=np.int64)
        todo: list[int] = []
        for idx, (a, b) in enumerate(pairs):
            if len(a) == 0 or len(b) == 0:
                out[idx] = len(a) + len(b)
            else:
                todo.append(idx)
        jobs = []
        for bucket in _buckets(pairs, todo):
            stats.buckets += 1
            mode = self._resolve_domain_mode(pairs, bucket, want_cigars=False)
            if mode:
                if mode == "gcsh":
                    # Builds start NOW on the background thread; the
                    # ladder (run at finish time) pops them — they overlap
                    # the next batch's in-flight kernel.
                    self._prefetch_domains(pairs, want_cigars=False)
                jobs.append((mode, bucket, None))
            else:
                rung = self._rung_start(
                    pairs, self._new_ladder(pairs, bucket), stats
                )
                jobs.append((None, bucket, rung))
        return pairs, stats, out, jobs

    def _cost_finish(self, pairs, stats, out, jobs):
        for mode, bucket, rung in jobs:
            if mode:
                self._domain_ladder(pairs, bucket, out, stats, mode=mode)
            else:
                while rung is not None:
                    rung = self._rung_finish(pairs, out, stats, rung)
        stats.aligned_bp = sum(len(a) for a, _ in pairs)
        assert (out >= 0).all()
        return out, stats

    def _next_band(self, band, costs, fail_slots, n, m, B0, diag) -> int:
        """Jump the ladder to the band the failed pairs' banded upper bounds
        certify at (see :func:`ops.banded.band_for_cost`), falling back to
        doubling when a result is the INF sentinel.  A +1 word pad absorbs
        the skew-term drift a repack of the surviving pairs can introduce;
        the certificate re-check keeps correctness either way."""
        from ..ops import banded

        sel = np.asarray(fail_slots)
        c = np.asarray(costs)[sel]
        finite = c < INF // 2
        # Lanes whose band never reached their target row return the INF
        # sentinel — no bound for them, so keep at least the doubling floor.
        floor = band * 2 if not finite.all() else band + 1
        if not finite.any():
            return floor
        sel = sel[finite]
        need = banded.band_for_cost(
            c[finite], np.asarray(n)[:B0][sel], np.asarray(m)[:B0][sel],
            *diag,
        )
        return max(floor, int(need.max()) + 1)

    def _pack_multiple(self, for_ck: bool = False) -> int:
        """Batch padding granularity: the configured lane multiple, raised
        (a) to >=128 lanes whenever the Pallas kernels are reachable — they
        need >=128 pairs per program, and a 4-pair batch padded to 128
        lanes costs only device time, vs. falling off onto the host
        fallback (measured 16.7 s/pair instead of ~0.1 at 100kbp) — and
        (b) under a mesh so every shard still gets a full program."""
        import math

        import jax

        lm = self.lane_multiple
        if jax.default_backend() == "tpu" or self.pallas_interpret:
            lm = lm * 128 // math.gcd(lm, 128)
        if self.mesh is not None:
            ndev = self.mesh.devices.size
            need = ndev * 128 if for_ck else ndev
            lm = lm * need // math.gcd(lm, need)
        return lm

    def _resolve_domain_mode(self, pairs, idxs, want_cigars: bool) -> str | None:
        """Returns "gap"/"gcsh" when the bucket should use the per-pair
        domain ladder, else None (plain shared ladder).

        "auto" policy: per-pair schedules run on kernels ~1.2-3.4x slower
        per cell than the shared bucket kernel, so they must SAVE at least
        that many cells to win.  gcsh saves via hull thinning (2-5x at
        e>=10%) — worth the host build only on >=8-core hosts.  gap saves
        only the bucket skew terms (per-pair |m-n| + diagonal spread), so
        a UNIFORM bucket gains nothing: auto demotes gap to the plain
        shared ladder unless the skew terms rival the expected band."""
        if self.domain_mode == "off":
            return None
        big = max(len(pairs[i][0]) for i in idxs) >= self.domain_min_bp
        if not big and self.domain_mode == "auto":
            return None
        mode = self.domain_mode
        if mode == "auto":
            import os

            from .. import native

            mode = (
                "gcsh"
                if native.available() and (os.cpu_count() or 1) >= 8
                else "gap"
            )
            if mode == "gap":
                # Bucket skew terms (what per-pair gap bands save) vs a
                # ~6% divergence prior (what any band must cover anyway).
                ns = np.array([len(pairs[i][0]) for i in idxs], np.int64)
                ms = np.array([len(pairs[i][1]) for i in idxs], np.int64)
                n_max = max(int(ns.max()), 1)
                m_max = int(ms.max())
                g = np.abs(ms - ns)
                dev = np.abs(m_max * ns // n_max - ms)
                skew = int((g + 2 * dev).max())
                if skew < (n_max // 16) * 3 // 2:
                    return None
        if mode == "gcsh":
            from .. import native

            if not native.available():
                mode = "gap"
        if want_cigars:
            import jax

            from .. import native

            on_tpu = jax.default_backend() == "tpu" or self.pallas_interpret
            # _pack_multiple pads to >=128 lanes whenever the Pallas path is
            # reachable, so no lane_multiple gate is needed here.
            if not (on_tpu and native.available()):
                return None
        return mode

    def _build_gcsh_handles(self, bucket_pairs):
        """Native fwd+rev GCSH domain builds for one bucket (GIL-released
        ctypes; parallel across pairs on multi-core hosts)."""
        import os
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        workers = min(len(bucket_pairs), os.cpu_count() or 1)
        if workers > 1:
            with ThreadPoolExecutor(workers) as ex:
                return list(
                    ex.map(
                        lambda ab: native.DomainHandle(
                            ab[0], ab[1], k=self.domain_k, r=self.domain_r
                        ),
                        bucket_pairs,
                    )
                )
        return [
            native.DomainHandle(a, b, k=self.domain_k, r=self.domain_r)
            for a, b in bucket_pairs
        ]

    def _prefetch_domains(self, pairs, want_cigars: bool) -> None:
        """Submit gcsh domain builds for ``pairs``' buckets on a background
        thread.  Called by the streaming runners for the batch AFTER the
        one being dispatched: the builds then run during the current
        batch's device waits (both sides release the GIL), so on steady
        state the dominant gcsh host cost rides the kernel gap instead of
        serializing with it.  No-op for buckets that don't resolve to
        gcsh; _domain_ladder pops the matching future."""
        todo = [i for i, (a, b) in enumerate(pairs) if len(a) and len(b)]
        for bucket in _buckets(pairs, todo):
            if self._resolve_domain_mode(pairs, bucket, want_cigars) != "gcsh":
                continue
            key = (id(pairs), tuple(bucket))
            if key in self._domain_prefetch:
                continue
            if self._prefetch_ex is None:
                from concurrent.futures import ThreadPoolExecutor

                self._prefetch_ex = ThreadPoolExecutor(1)
            bucket_pairs = [pairs[i] for i in bucket]
            self._domain_prefetch[key] = self._prefetch_ex.submit(
                self._build_gcsh_handles, bucket_pairs
            )

    def _domain_ladder(self, pairs, idxs, out, stats, results=None,
                       mode: str = "gcsh",
                       trace_jobs: list | None = None) -> None:
        """f ladder over heuristic-restricted per-pair bands (the batched
        re-expression of `astarpa2`'s band doubling + A* domain): sample
        each pair's fwd+rev GCSH domain at its own f, run ONE device pass
        for the bucket with per-pair window schedules, accept pairs whose
        banded result is <= their f (the standard doubling certificate),
        and feed the rejected pairs' banded upper bounds back as the next
        f — so f converges to just above the true distance instead of
        overshooting by the doubling factor.
        """
        import jax

        from .. import native
        from ..domain import domain_schedule
        from ..ops import banded
        from ..ops.pallas_myers import pack_batch_staggered

        bucket_pairs = [pairs[i] for i in idxs]
        args, B0 = pack_batch_staggered(
            bucket_pairs, self._pack_multiple(for_ck=results is not None),
            shape_quantum=self._shape_quantum(bucket_pairs),
        )
        args = self._shard(args)
        a0, a1, pb0, pb1, n, m = args
        n_max, S = a0.shape[0], pb0.shape[0]
        B = a0.shape[1]
        ndev = 1 if self.mesh is None else self.mesh.devices.size
        step = 64 if n_max <= 200_000 else 128
        if mode == "gcsh":
            # GIL-released ctypes builds: parallel across pairs on real
            # hosts (this is the dominant host cost of the gcsh ladder).
            # A streaming runner may have PREFETCHED this bucket's handles
            # while the previous batch's kernel was in flight (see
            # _prefetch_domains) — the build then costs ~nothing of the
            # steady-state period even on one core.
            fut = self._domain_prefetch.pop((id(pairs), tuple(idxs)), None)
            if fut is not None:
                handles = fut.result()
            else:
                handles = self._build_gcsh_handles(bucket_pairs)
        else:
            handles = [_GapDomainProvider(a, b) for a, b in bucket_pairs]
        flush_here = trace_jobs is None
        if flush_here:
            trace_jobs = []
        try:
            # First-round f: h0 plus a ~25% margin for gcsh (unpruned GCSH
            # underestimates d by ~10-20% at high divergence, so f=h0 almost
            # always fails and pays a second round; the hull at 1.25*h0 is
            # roughly as wide as the exact-f hull, so one padded round beats
            # thin-fail + exact-retry).  Gap domains already carry their own
            # divergence allowance in h0.
            pad = (lambda h0: h0 + h0 // 4) if mode == "gcsh" else (lambda h0: h0)
            f = np.array([max(pad(h.h0), 2 * W) for h in handles], np.int64)
            pending = list(range(B0))
            for _ in range(self.max_f_rounds):
                scheds = {}
                sw_need = 1
                quantum = 32
                for slot in pending:
                    ps = None
                    while ps is None:
                        dom = handles[slot].sample(int(f[slot]), step)
                        ps = domain_schedule(dom)
                        if ps is None:
                            # Empty domain: certainly dist > f.
                            f[slot] += max(f[slot] // 4, 64)
                    scheds[slot] = ps
                    sw_need = max(sw_need, ps.band_words)
                    quantum = min(quantum, ps.quantum)
                # Quantize the band so the jit cache sees few distinct
                # kernels (pow2 up to 64, then multiples of 64).
                sw = sw_need
                if sw <= 64:
                    p = 4
                    while p < sw:
                        p *= 2
                    sw = p
                else:
                    sw = -(-sw // 64) * 64
                sw = min(sw, S)
                ck_mode = results is not None
                # Direct round: every pair this round certifies at cost
                # <= f[slot] <= the burst budget, so CIGARs come from
                # direct whole-pair DT traces (per-pair schedules only
                # matter for the trace's recompute fallback) and the
                # round runs the per-pair COST kernel — no checkpoint
                # planes, no ck-kernel VMEM constraints.
                direct_rnd = (
                    ck_mode
                    and self.direct_dt
                    and int(max(f[slot] for slot in pending)) <= _DIRECT_DT_MAX
                )
                if sw >= S or (
                    ck_mode
                    and not direct_rnd
                    and _select_pp(B // ndev, sw, max_pp=1024,
                                   cb=self._cb(sw, n_max)) < 128
                ):
                    break  # band no longer thin; plain ladder is better
                sched_arr = np.zeros((n_max, B), np.uint8)
                for slot in pending:
                    sc = scheds[slot].sched
                    sched_arr[: len(sc), slot] = sc
                # Idle lanes (padding + already-certified pairs) get a live
                # pair's schedule: the pinned kernel's residency envelopes
                # span ALL lanes, and an all-zero lane would pin the window
                # to word 0.  Their results are ignored.
                fill = scheds[pending[0]].sched
                idle = np.ones(B, bool)
                idle[np.asarray(pending)] = False
                if idle.any():
                    sched_arr[: len(fill), idle] = fill[:, None]
                try:
                    got = self._domain_kernel(
                        a0, a1, pb0, pb1, n, m, sw, sched_arr, quantum,
                        want_ck=results is not None and not direct_rnd,
                    )
                except ValueError:
                    # No per-pair kernel can serve this band (pinned-pp
                    # residency AND the sliding per-pair column-block model
                    # both over VMEM — e.g. high-divergence pairs whose
                    # hulls approach the full Ukkonen band): the domain
                    # saving is gone, finish on the always-converging
                    # shared-band ladder below.
                    break
                stats.kernel = LAST_KERNEL
                if results is None or direct_rnd:
                    costs = np.asarray(got)[:B0]
                else:
                    costs_dev, ckvp, ckvm, cktv = got
                    costs = np.asarray(costs_dev)[:B0]
                stats.cells_computed += n_max * sw * W * len(pending)
                done = [
                    slot for slot in pending
                    if costs[slot] <= f[slot] and costs[slot] < INF // 2
                ]
                if done and results is not None and direct_rnd:
                    stats.direct_traces += len(done)
                    for slot in done:
                        sc = np.ascontiguousarray(scheds[slot].sched, np.int32)
                        trace_jobs.append(_TraceJob(
                            pair=idxs[slot], slices=None, pos=0, shift=sc,
                            s_words=S, sw=sw, cb=0, want=int(costs[slot]),
                        ))
                elif done and results is not None:
                    sel = np.asarray(done)
                    # Device-side gather of the certified pairs' checkpoints;
                    # the staged async copies stream while later f-rounds and
                    # buckets dispatch, and drain behind the thread-pooled
                    # traces at flush time.
                    chunks = _stage_ck_chunks(
                        ckvp[:, :, sel], ckvm[:, :, sel], cktv[:, sel],
                        len(done),
                    )
                    # Must mirror _banded_call's effective (Q-rounded) CB.
                    CB = self._cb(sw, n_max)
                    CB = max(quantum, CB // quantum * quantum)
                    for pos, slot in enumerate(done):
                        i = idxs[slot]
                        sc = np.ascontiguousarray(scheds[slot].sched, np.int32)
                        c0, sl = _chunk_of(chunks, pos)
                        trace_jobs.append(_TraceJob(
                            pair=i, slices=sl, pos=pos - c0, shift=sc,
                            s_words=S, sw=sw, cb=CB, want=int(costs[slot]),
                        ))
                for slot in done:
                    out[idxs[slot]] = int(costs[slot])
                pending = [s for s in pending if s not in set(done)]
                if not pending:
                    return
                stats.band_retries += 1
                for slot in pending:
                    ub = int(costs[slot])
                    nxt = max(int(f[slot] * 5 // 4) + 1, f[slot] + 64)
                    if ub < INF // 2:
                        nxt = max(nxt, ub)
                    f[slot] = nxt
            # Ladder exhausted / band grew past usefulness: finish the
            # stragglers on the always-converging plain path.
            rest = [idxs[s] for s in pending]
            if results is None:
                self._run_bucket(pairs, rest, out, stats)
            else:
                self._align_bucket_ck(
                    pairs, rest, results, stats, trace_jobs=trace_jobs
                )
                self._flush_traces(trace_jobs, pairs, results)
                for i in rest:
                    out[i] = results[i][0]
        finally:
            if flush_here:
                self._flush_traces(trace_jobs, pairs, results)
            for h in handles:
                h.close()

    def _domain_kernel(self, a0, a1, pb0, pb1, n, m, sw, sched_arr, quantum,
                       want_ck):
        import jax

        from ..ops import banded

        B = a0.shape[1]
        n_max = a0.shape[0]
        ndev = 1 if self.mesh is None else self.mesh.devices.size
        CB = self._cb(sw, n_max)
        pp = _select_pp(B // ndev, sw, max_pp=1024 if want_ck else 2048,
                        cb=CB if want_ck else 0)
        on_tpu = jax.default_backend() == "tpu" or self.pallas_interpret
        if self.mesh is not None and on_tpu and pp >= 128:
            # Multi-chip product path: the per-pair Pallas kernel (cost or
            # checkpointing) runs on every shard via shard_map; schedules
            # shard along the batch axis with the inputs (SURVEY.md §2.6).
            from jax.sharding import NamedSharding, PartitionSpec as P

            sched_dev = jax.device_put(
                np.ascontiguousarray(sched_arr),
                NamedSharding(self.mesh, P(None, "batch")),
            )
            return _sharded_domain(
                self.mesh, sw, quantum, self.pallas_interpret, want_ck, CB, pp
            )(a0, a1, pb0, pb1, n, m, sched_dev)
        global LAST_KERNEL
        if want_ck:
            if (
                PINNED_ENABLED
                and jax.default_backend() == "tpu"
                and not self.pallas_interpret
                and self.mesh is None
                and sw >= PINNED_PP_MIN_SW
                and B % 128 == 0
            ):
                # Big domain bands: per-pair pinned checkpoint kernel.  CB
                # must mirror the sliding kernel's Q-rounding so the host
                # trace mirror in _domain_ladder stays consistent.
                from ..ops.pinned import pinned_ck_pp_tpu

                CBq = max(quantum, CB // quantum * quantum)
                try:
                    out = pinned_ck_pp_tpu(
                        a0, a1, pb0, pb1, n, m, band_words=sw,
                        schedule=sched_arr, col_block=CBq,
                    )
                    LAST_KERNEL = "pinned-pp-ck"
                    return out
                except (ValueError, jax.errors.JaxRuntimeError):
                    pass  # residency/window constraints; sliding below
            from ..ops.pallas_banded import banded_ck_tpu

            assert on_tpu and pp >= 128
            return banded_ck_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                pairs_per_program=pp, interpret=self.pallas_interpret,
                schedule=sched_arr, schedule_quantum=quantum,
            )
        if (
            PINNED_ENABLED
            and jax.default_backend() == "tpu"
            and not self.pallas_interpret
            and self.mesh is None
            and sw >= PINNED_PP_MIN_SW
            and B % 128 == 0
        ):
            # Big per-pair bands ride the pinned-word layout: full sublane
            # tiles at any band height, vs the sliding kernel's PP=128
            # collapse (the round-2 config-#5 gap).
            from ..ops.pinned import pinned_cost_pp_tpu

            try:
                out = pinned_cost_pp_tpu(
                    a0, a1, pb0, pb1, n, m, band_words=sw, schedule=sched_arr
                )
                LAST_KERNEL = "pinned-perpair"
                return out
            except ValueError:
                pass  # residency (band + cross-pair spread) over VMEM
            except jax.errors.JaxRuntimeError:
                # Mosaic scoped-VMEM OOM at compile time (the host-side
                # model is a fitted approximation): same fallback.
                pass
        if on_tpu and pp >= 128:
            from ..ops.pallas_banded import banded_cost_tpu

            return banded_cost_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, pairs_per_program=pp,
                interpret=self.pallas_interpret, schedule=sched_arr,
                schedule_quantum=quantum,
            )
        return banded.banded_cost_pp(
            a0, a1, pb0, pb1, n, m, sched_arr, band_words=sw
        )

    def _kernel(self, a0, a1, pb0, pb1, n, m, sw: int, S: int, diag=None):
        """Dispatch the banded cost kernel: single device, or `shard_map`
        over the mesh's batch axis so *every* shard runs the same
        kernel-selection logic (Pallas on TPU shards; jnp elsewhere).

        The mesh path is the multi-chip product (SURVEY.md §2.6): each
        device computes its batch shard with the production Pallas kernel;
        the only cross-device communication is the result gather XLA
        inserts at readout.
        """
        if sw > 64:
            # Large bands use the grouped word loop: multiples of 8 words.
            sw = min(-(-sw // 8) * 8, S)
        if self.mesh is None:
            return _local_cost(
                a0, a1, pb0, pb1, n, m, sw=sw,
                interpret=self.pallas_interpret, diag=diag,
            )
        return _sharded_cost(self.mesh, sw, self.pallas_interpret, diag)(
            a0, a1, pb0, pb1, n, m
        )

    def _shard(self, args):
        if self.mesh is None:
            return args
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard_cols = NamedSharding(self.mesh, P(None, "batch"))
        shard_vec = NamedSharding(self.mesh, P("batch"))
        a0, a1, pb0, pb1, n, m = args
        ndev = self.mesh.devices.size
        B = a0.shape[1]
        if B % ndev != 0:
            pad = -B % ndev
            a0 = _pad_cols(a0, pad)
            a1 = _pad_cols(a1, pad)
            pb0 = _pad_cols(pb0, pad)
            pb1 = _pad_cols(pb1, pad)
            n = np.concatenate([np.asarray(n), np.ones(pad, np.int32)])
            m = np.concatenate([np.asarray(m), np.ones(pad, np.int32)])
        return (
            jax.device_put(a0, shard_cols),
            jax.device_put(a1, shard_cols),
            jax.device_put(pb0, shard_cols),
            jax.device_put(pb1, shard_cols),
            jax.device_put(np.asarray(n), shard_vec),
            jax.device_put(np.asarray(m), shard_vec),
        )

    # -- CIGAR path ------------------------------------------------------------

    def align(self, pairs) -> list[tuple[int, Cigar]]:
        return self.align_with_stats(pairs)[0]

    def align_with_stats(self, pairs) -> tuple[list[tuple[int, Cigar]], BatchStats]:
        """Costs + CIGARs in ONE device pass per band-doubling rung: the
        checkpointing kernel runs *inside* the ladder, so certified pairs
        are traced immediately from their certifying rung's checkpoints
        (native DT-burst traceback, `native/astarpa_native.cpp::
        trace_banded_ck`).  Off-TPU / small-lane configs fall back to a
        cost ladder + fill-based trace; without a native toolchain, to the
        host block aligner.
        """
        import jax

        from .. import native

        if native.available() and (
            jax.default_backend() == "tpu" or self.pallas_interpret
        ):
            return self._align_combined(pairs)

        costs, stats = self.cost_with_stats(pairs)
        if not native.available():
            return self._align_host_fallback(pairs, costs), stats

        results: list = [None] * len(pairs)
        todo = []
        for idx, (a, b) in enumerate(pairs):
            if len(a) == 0 or len(b) == 0:
                results[idx] = (int(costs[idx]), _trivial_cigar(a, b))
            else:
                todo.append(idx)

        for bucket in _buckets(pairs, todo):
            self._trace_bucket(pairs, bucket, costs, results)
        return results, stats

    def _align_combined(self, pairs) -> tuple[list[tuple[int, Cigar]], BatchStats]:
        """TPU fast path: band-doubling ladder over the checkpointing Pallas
        kernel; each rung both certifies costs and yields the checkpoints
        its certified pairs are traced from (no second DP pass)."""
        results, stats, trace_jobs = self._align_dispatch(pairs)
        self._flush_traces(trace_jobs, pairs, results)
        return results, stats

    def _align_dispatch(self, pairs):
        """Device half of :meth:`_align_combined`: runs the full ladder and
        stages every certified pair's checkpoint readback (async copies in
        flight), but does NOT drain the traces.  Returns
        ``(results, stats, trace_jobs)``; the caller owns the flush."""
        return self._align_dispatch_finish(self._align_dispatch_start(pairs))

    def _align_dispatch_start(self, pairs):
        """Pack + dispatch the FIRST rung of every non-domain bucket
        asynchronously (cost-vector copies in flight, nothing synced);
        domain-mode buckets defer whole to finish time with their gcsh
        builds prefetched.  ``align_iter`` starts the next batch here
        while the previous batch's rungs are still in flight — the
        align-path sibling of :meth:`_cost_dispatch`."""
        stats = BatchStats(pairs=len(pairs))
        results: list = [None] * len(pairs)
        todo: list[int] = []
        for idx, (a, b) in enumerate(pairs):
            if len(a) == 0 or len(b) == 0:
                results[idx] = (len(a) + len(b), _trivial_cigar(a, b))
            else:
                todo.append(idx)
        # One deferred trace list across ALL buckets: bucket k's traces and
        # chunk transfers drain behind bucket k+1's pack/dispatch instead of
        # blocking it.
        trace_jobs: list = []
        jobs = []
        try:
            for bucket in _buckets(pairs, todo):
                stats.buckets += 1
                mode = self._resolve_domain_mode(pairs, bucket,
                                                 want_cigars=True)
                if mode:
                    if mode == "gcsh":
                        # Builds start NOW on the background thread; the
                        # ladder (run at finish time) pops them.
                        self._prefetch_domains(pairs, want_cigars=True)
                    jobs.append((mode, bucket, None, None))
                else:
                    lad = self._new_align_ladder(pairs, bucket)
                    rung = self._align_rung_start(pairs, lad, stats,
                                                  trace_jobs, results)
                    jobs.append((None, bucket, lad, rung))
        except BaseException:
            self._flush_traces(trace_jobs, pairs, results)
            raise
        return pairs, results, stats, trace_jobs, jobs

    def _align_dispatch_finish(self, state):
        """Certify + stage every in-flight rung from
        :meth:`_align_dispatch_start` (running any retry rungs and
        domain-mode ladders synchronously) and return
        ``(results, stats, trace_jobs)``; the caller owns the flush."""
        pairs, results, stats, trace_jobs, jobs = state
        outc = np.full(len(pairs), -1, dtype=np.int64)
        try:
            for mode, bucket, lad, rung in jobs:
                if mode:
                    self._domain_ladder(
                        pairs, bucket, outc, stats, results=results,
                        mode=mode, trace_jobs=trace_jobs,
                    )
                else:
                    while rung is not None:
                        rung = self._align_rung_finish(
                            pairs, results, stats, lad, rung, trace_jobs
                        )
        except BaseException:
            # Leave no staged-but-undrained jobs behind on the error path.
            self._flush_traces(trace_jobs, pairs, results)
            raise
        stats.aligned_bp = sum(len(a) for a, _ in pairs)
        return results, stats, trace_jobs

    def align_iter(self, batches):
        """Pipelined streaming alignment: yields one ``(results, stats)``
        per input batch, in order.  Batch k's host traces and checkpoint
        transfers drain on a side thread WHILE batch k+1 packs and runs its
        device ladder (the native ctypes calls and the device->host
        transfer waits both release the GIL) — in steady state the link and
        the host trace pool stay busy through the device dispatch gaps,
        which single ``align()`` calls spend idle.

        The production serving shape (SURVEY.md §2.6 streaming runner):
        ``for results, stats in aligner.align_iter(batch_source): ...``.
        Falls back to per-batch ``align_with_stats`` off-TPU.
        """
        import jax
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        if not (native.available() and (
            jax.default_backend() == "tpu" or self.pallas_interpret
        )):
            for pairs in batches:
                yield self.align_with_stats(pairs)
            return

        # Three-stage software pipeline: dispatch_start(k+1) runs BEFORE
        # finish(k) syncs — batch k's kernel + cost-vector transfer ride
        # the link while batch k+1 packs (the align-path analog of
        # cost_iter's split-rung ladder) — and flush(k) traces on a side
        # thread under dispatch_start(k+2)/finish(k+1).  Yields trail the
        # input by up to two batches.
        started = None    # (pairs, state) dispatched, not certified
        flushing = None   # (results, stats, fut)
        it = iter(batches)
        sentinel = object()
        with ThreadPoolExecutor(1) as ex:
            nxt = next(it, sentinel)
            while nxt is not sentinel:
                t0 = _time.perf_counter()
                cur = (nxt, self._align_dispatch_start(nxt))
                _sprof(f"align_start {_time.perf_counter()-t0:.3f}s")
                nxt = next(it, sentinel)
                if started is not None:
                    p_pairs, p_state = started
                    t0 = _time.perf_counter()
                    results, stats, trace_jobs = self._align_dispatch_finish(
                        p_state
                    )
                    _sprof(f"align_finish {_time.perf_counter()-t0:.3f}s")
                    if flushing is not None:
                        t0 = _time.perf_counter()
                        flushing[2].result()
                        _sprof(f"flush-wait {_time.perf_counter()-t0:.3f}s")
                        yield flushing[0], flushing[1]
                    flushing = (results, stats, ex.submit(
                        self._flush_traces, trace_jobs, p_pairs, results
                    ))
                started = cur
            if started is not None:
                p_pairs, p_state = started
                results, stats, trace_jobs = self._align_dispatch_finish(
                    p_state
                )
                if flushing is not None:
                    flushing[2].result()
                    yield flushing[0], flushing[1]
                self._flush_traces(trace_jobs, p_pairs, results)
                yield results, stats

    def _align_bucket_ck(self, pairs, idxs, results, stats,
                         trace_jobs: list | None = None) -> None:
        # Caller-owned job list = traces drain after ALL buckets dispatch;
        # local list = drain on return (standalone use).
        flush_here = trace_jobs is None
        if flush_here:
            trace_jobs = []
        try:
            lad = self._new_align_ladder(pairs, idxs)
            rung = self._align_rung_start(pairs, lad, stats, trace_jobs,
                                          results)
            while rung is not None:
                rung = self._align_rung_finish(pairs, results, stats, lad,
                                               rung, trace_jobs)
        finally:
            if flush_here:
                self._flush_traces(trace_jobs, pairs, results)

    def _new_align_ladder(self, pairs, idxs: list[int]) -> dict:
        """Fresh band-ladder state for one CIGAR bucket — the align-path
        sibling of :meth:`_new_ladder` (hint replaces the configured start
        band; ``packed`` is reused across rungs)."""
        cls = self._bucket_class([pairs[i] for i in idxs])
        return dict(
            cls=cls,
            band=self._band_hints.get(cls) or self.band_words,
            need_max=1,
            pending=list(idxs),
            attempt=0,
            packed=None,
        )

    def _align_rung_start(self, pairs, lad: dict, stats: BatchStats,
                          trace_jobs: list, results) -> dict | None:
        """Pack (if the pending set shrank) + dispatch ONE align rung
        ASYNCHRONOUSLY: the cost vector's device->host copy (and, on the
        ck path, the optimistic checkpoint chunk copies) are issued here,
        but nothing syncs — ``align_iter`` packs and dispatches the next
        batch while this rung is in flight; :meth:`_align_rung_finish`
        certifies and stages the traces.  Returns ``None`` when the
        bucket was completed on the cost-ladder fallback (no ck kernel
        fits the geometry)."""
        from ..ops import banded
        from ..ops.pallas_myers import pack_batch_staggered

        if lad["packed"] is None or 2 * len(lad["pending"]) <= len(
            lad["packed"][2]
        ):
            t0 = _time.perf_counter()
            bucket_pairs = [pairs[i] for i in lad["pending"]]
            args, B0 = pack_batch_staggered(
                bucket_pairs, self._pack_multiple(for_ck=True),
                shape_quantum=self._shape_quantum(bucket_pairs),
            )
            args = self._shard(args)
            lad["packed"] = (args, B0, list(lad["pending"]))
            _sprof(f"pack B0={B0} {_time.perf_counter()-t0:.3f}s")
        args, B0, members = lad["packed"]
        a0, a1, pb0, pb1, n, m = args
        n_max, S = a0.shape[0], pb0.shape[0]
        diag = self._diag(n, m, B0, n_max, S)
        sw = min(lad["band"], S)
        if S > max(n_max, 1) or lad["attempt"] >= self.max_band_doublings:
            sw = S
        if sw > 64:
            sw = min(-(-sw // 8) * 8, S)
        ndev = 1 if self.mesh is None else self.mesh.devices.size
        thr = None
        if sw < S:
            thr = banded.band_threshold(
                sw, np.asarray(n)[:B0], np.asarray(m)[:B0], *diag
            )
        # Direct-DT rung: every pair certifying at this rung has cost <=
        # thr <= the native backward-burst budget, so the host trace
        # recovers its whole path from the certified cost alone (one DT
        # burst landing on the exact column-0 values).  The rung then
        # runs the plain COST kernel and zero checkpoint bytes cross the
        # device->host link.  Full-height rungs (thr None) are exact, so
        # n+m bounds their certified costs.
        if thr is not None:
            direct_cap = int(thr.max())
        else:
            direct_cap = int(
                np.asarray(n)[:B0].max() + np.asarray(m)[:B0].max()
            )
        direct = self.direct_dt and direct_cap <= _DIRECT_DT_MAX
        t0 = _time.perf_counter()
        opt_chunks = None
        ckvp = ckvm = cktv = None
        if direct:
            got = self._kernel(a0, a1, pb0, pb1, n, m, sw, S, diag)
            CB = 0
            # Start the cost vector's copy NOW: the certify sync then
            # costs ~nothing once the next batch's pack has hidden the
            # kernel+link latency.
            copy = getattr(got, "copy_to_host_async", None)
            if copy is not None:
                copy()
        else:
            # DT bursts make long checkpoint intervals cheap, and the
            # device->host readback shrinks with 1/CB.
            CB = self._cb(sw, n_max)
            pp = _select_pp(a0.shape[1] // ndev, sw, max_pp=1024, cb=CB)
            if pp < 128:
                if self.mesh is None:
                    big_ok = self._striped_ck_ok(sw, a0.shape[1])
                else:
                    big_ok = self._mesh_ck_kind(
                        sw, n_max, S, a0.shape[1], CB, pp, diag
                    ) != "sliding"
                if not big_ok:
                    # Band too tall for every ck kernel (sliding VMEM
                    # model fails and no big-band layout can serve):
                    # finish the remaining pairs on the cost ladder +
                    # trace fallback.
                    self._flush_traces(trace_jobs, pairs, results)
                    sub = np.full(len(pairs), -1, dtype=np.int64)
                    self._run_bucket(pairs, lad["pending"], sub, stats)
                    self._trace_bucket(pairs, lad["pending"], sub, results)
                    return None
            got, ckvp, ckvm, cktv = self._ck_kernel(
                a0, a1, pb0, pb1, n, m, sw, CB, pp, diag
            )
            # Optimistic readback: start streaming every member lane's
            # checkpoints BEFORE the certification sync — the transfers
            # hide the cost-readback latency, and the common case (a
            # predicted rung certifies everything) needs them all.  A
            # failed rung wastes at most _OPT_READBACK_BYTES of link.
            lanes = len(members)
            per_lane = 4 * (
                int(ckvp.size) + int(ckvm.size) + int(cktv.size)
            ) // max(1, int(ckvp.shape[2]))
            if per_lane * lanes <= _OPT_READBACK_BYTES:
                # Queue the (tiny) cost vector's copy FIRST so
                # certification isn't stuck behind megabytes of
                # checkpoint bytes on the link.
                copy = getattr(got, "copy_to_host_async", None)
                if copy is not None:
                    copy()
                opt_chunks = _stage_ck_chunks(ckvp, ckvm, cktv, lanes)
        stats.cells_computed += n_max * sw * W * len(members)
        stats.kernel = LAST_KERNEL
        _sprof(f"dispatch sw={sw} direct={direct} "
               f"{_time.perf_counter()-t0:.3f}s")
        return dict(
            got=got, ckvp=ckvp, ckvm=ckvm, cktv=cktv, opt_chunks=opt_chunks,
            direct=direct, sw=sw, S=S, thr=thr, diag=diag, CB=CB,
            n_max=n_max,
        )

    def _align_rung_finish(self, pairs, results, stats: BatchStats,
                           lad: dict, rung: dict,
                           trace_jobs: list) -> dict | None:
        """Sync + certify one in-flight align rung, stage its certified
        pairs' trace jobs, and return the next in-flight rung (retry at a
        wider band) or ``None`` when the bucket is done."""
        from ..ops import banded

        args, B0, members = lad["packed"]
        _a0, _a1, _pb0, _pb1, n, m = args
        sw, S, thr, diag, CB = (rung["sw"], rung["S"], rung["thr"],
                                rung["diag"], rung["CB"])
        direct, opt_chunks, n_max = (rung["direct"], rung["opt_chunks"],
                                     rung["n_max"])
        t0 = _time.perf_counter()
        costs = np.asarray(rung["got"])[:B0]
        _sprof(f"certify-sync {_time.perf_counter()-t0:.3f}s")
        t0 = _time.perf_counter()
        if sw >= S:
            ok = np.ones(B0, dtype=bool)
        else:
            ok = costs <= thr
        pending_set = set(lad["pending"])
        sel = [slot for slot, i in enumerate(members)
               if i in pending_set and ok[slot]]
        fail_slots = [slot for slot, i in enumerate(members)
                      if i in pending_set and not ok[slot]]
        next_pending = [members[slot] for slot in fail_slots]
        if sel and direct:
            shift = banded.shift_at_array(n_max, S, sw, diag)
            stats.direct_traces += len(sel)
            for slot in sel:
                trace_jobs.append(_TraceJob(
                    pair=members[slot], slices=None, pos=0,
                    shift=shift, s_words=S, sw=sw, cb=0,
                    want=int(costs[slot]),
                ))
        elif sel:
            # Defer the traces until the whole ladder has dispatched; the
            # staged chunk copies stream behind the thread-pooled traces
            # at flush time.  When the optimistic copies were not issued
            # (big buffers), gather only certified lanes — the host link
            # is the scarce resource.
            shift = banded.shift_at_array(n_max, S, sw, diag)
            if opt_chunks is None:
                sel_arr = np.asarray(sel)
                chunks = _stage_ck_chunks(
                    rung["ckvp"][:, :, sel_arr], rung["ckvm"][:, :, sel_arr],
                    rung["cktv"][:, sel_arr], len(sel),
                )
            else:
                chunks = opt_chunks
            for pos, slot in enumerate(sel):
                p = slot if opt_chunks is not None else pos
                c0, sl = _chunk_of(chunks, p)
                trace_jobs.append(_TraceJob(
                    pair=members[slot], slices=sl, pos=p - c0,
                    shift=shift, s_words=S, sw=sw, cb=CB,
                    want=int(costs[slot]),
                ))
        _sprof(f"stage jobs={len(sel)} {_time.perf_counter()-t0:.3f}s")
        lad["need_max"] = self._note_need(lad["need_max"], costs, sel, n, m,
                                          B0, diag)
        lad["pending"] = next_pending
        if not next_pending:
            self._band_hints[lad["cls"]] = lad["need_max"]
            return None
        assert sw < S, "full-height window must certify every pair"
        stats.band_retries += 1
        lad["band"] = self._next_band(lad["band"], costs, fail_slots, n, m,
                                      B0, diag)
        lad["attempt"] += 1
        return self._align_rung_start(pairs, lad, stats, trace_jobs, results)

    def _striped_ck_ok(self, sw: int, B: int) -> bool:
        """Can the striped ck kernel (HBM-resident state, no VMEM band
        ceiling) serve this geometry — single device or per mesh shard?"""
        import jax

        ndev = 1 if self.mesh is None else self.mesh.devices.size
        return (
            (jax.default_backend() == "tpu" or self.pallas_interpret)
            and sw % 8 == 0
            and B % ndev == 0
            and (B // ndev) % 128 == 0
        )

    def _mesh_ck_kind(self, sw: int, n_max: int, S: int, B: int, CB: int,
                      pp: int, diag=None) -> str:
        """Big-band layout for the sharded ck dispatch: pinned when the
        band fits its VMEM residency (checked host-side — inside shard_map
        a compile-time OOM is not catchable), striped when the sliding
        VMEM model fails or the band exceeds the pinned ceiling."""
        import jax

        ndev = self.mesh.devices.size
        if not (
            (jax.default_backend() == "tpu" or self.pallas_interpret)
            and B % ndev == 0
            and (B // ndev) % 128 == 0
        ):
            return "sliding"
        if (
            (sw >= STRIPED_MIN_SW or (pp < 512 and sw >= 64))
            and sw % 8 == 0
            and CB >= sw + 8
        ):
            return "striped"  # beats pinned at every measured band (r5)
        if (
            PINNED_ENABLED
            and PINNED_MIN_SW <= sw <= PINNED_MAX_SW
            and CB >= sw
        ):
            from ..ops.pinned import _fits_shared, _plan

            for TB in (1024, 512, 256):
                if _fits_shared(_plan(n_max, S, sw, TB, diag), TB):
                    return "pinned"
        if (pp < 128 or sw > PINNED_MAX_SW) and sw % 8 == 0:
            return "striped"
        return "sliding"

    def _ck_kernel(self, a0, a1, pb0, pb1, n, m, sw: int, CB: int, pp: int,
                   diag=None):
        """Checkpointing-kernel dispatch: single device, or shard_map over
        the mesh's batch axis (every shard runs the Pallas ck kernel; the
        per-pair traces are host work that parallelizes across hosts).
        Big shared bands route to the striped ck kernel FIRST (HBM
        boundary carries, no VMEM band ceiling, 8-aligned-top checkpoint
        contract — since the r5 dynamic group range it beats pinned-ck
        across the whole band range, 0.99 vs 0.67 Tcells/s at 500kbp
        SW=2048); the pinned ck kernel is the fallback below
        STRIPED_MIN_SW when the sliding kernel's pairs-per-program
        collapses."""
        import jax

        global LAST_KERNEL
        if self.mesh is None:
            # Striped-ck routing: everywhere the striped kernel can serve
            # and the sliding kernel is collapsed or the band is big —
            # since the r5 dynamic group range it beats pinned-ck at every
            # measured band (0.99 vs 0.67 Tcells/s at 500kbp SW=2048
            # CB=16384, scripts/bench_ck_kernels.py; 1.25-1.44x at
            # SW=64-512, scripts/bench_striped.py).
            if (
                (
                    sw >= STRIPED_MIN_SW
                    or pp < 128
                    or sw > PINNED_MAX_SW
                    or (pp < 512 and sw >= 64)
                )
                and self._striped_ck_ok(sw, a0.shape[1])
                and CB >= sw + 8
            ):
                from ..ops.striped import striped_ck_tpu

                LAST_KERNEL = "striped-ck"
                return striped_ck_tpu(
                    a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                    interpret=self.pallas_interpret, diag=diag,
                )
            # Pinned routing (striped fallback): big shared bands; smaller
            # bands too when the sliding kernel's pairs-per-program
            # collapses (tiny batches / CB-heavy VMEM) — pinned keeps full
            # sublane tiles at ANY band height, sliding at PP<512 runs
            # ~0.35 Tcells/s.
            pinned_band = PINNED_MIN_SW <= sw <= PINNED_MAX_SW or (
                pp < 512 and 64 <= sw <= PINNED_MAX_SW and sw % 8 == 0
            )
            if (
                PINNED_ENABLED
                and jax.default_backend() == "tpu"
                and not self.pallas_interpret
                and pinned_band
                and a0.shape[1] % 128 == 0
                and CB >= sw
            ):
                from ..ops.pinned import pinned_ck_tpu

                try:
                    out = pinned_ck_tpu(
                        a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                        diag=diag,
                    )
                    LAST_KERNEL = "pinned-ck"
                    return out
                except (ValueError, jax.errors.JaxRuntimeError):
                    pass  # residency over VMEM; striped/sliding below
            if (pp < 128 or sw > PINNED_MAX_SW) and self._striped_ck_ok(
                sw, a0.shape[1]
            ):
                from ..ops.striped import striped_ck_tpu

                LAST_KERNEL = "striped-ck"
                return striped_ck_tpu(
                    a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                    interpret=self.pallas_interpret, diag=diag,
                )
            assert pp >= 128, "no ck kernel can serve this geometry"
            from ..ops.pallas_banded import banded_ck_tpu

            LAST_KERNEL = "pallas-ck"
            return banded_ck_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                pairs_per_program=pp, interpret=self.pallas_interpret,
                diag=diag,
            )
        kind = self._mesh_ck_kind(
            sw, a0.shape[0], pb0.shape[0], a0.shape[1], CB, pp, diag
        )
        # Label at DISPATCH time (the trace-time writes inside the cached
        # shard_map'd fn don't re-run on jit/lru cache hits).
        LAST_KERNEL = {"pinned": "pinned-ck-sharded",
                       "striped": "striped-ck-sharded"}.get(
                           kind, "pallas-ck-sharded")
        return _sharded_ck(self.mesh, sw, CB, pp, self.pallas_interpret,
                           kind, diag)(a0, a1, pb0, pb1, n, m)

    def _flush_traces(self, trace_jobs: list, pairs, results) -> None:
        """Drain deferred checkpoint traces.  Every job's chunk already has
        its device->host copy in flight (issued at job creation by
        :func:`_stage_ck_chunks`), so the blocking ``np.asarray`` here
        completes in arrival order while a thread pool traces the chunks
        that already arrived (both the native calls and the transfer wait
        release the GIL).  Clears ``trace_jobs``."""
        if not trace_jobs:
            return
        import os
        from concurrent.futures import ThreadPoolExecutor

        from .. import native

        def run(job: "_TraceJob", vp, vm, tv):
            a, b = pairs[job.pair]
            # known_cost: the device ladder already certified this pair's
            # exact distance, so the trace skips its O(CB*SW) final-stripe
            # recompute of the target value; the per-segment landing checks
            # against the checkpoint planes still verify the path.
            cost, cigar = native.trace_banded_ck(
                a, b, job.s_words, vp[:, :, job.pos], vm[:, :, job.pos],
                tv[:, job.pos], job.shift, job.sw, job.cb,
                known_cost=job.want,
            )
            # cost == want by construction under known_cost; exactness is
            # carried by the per-segment landing checks against the
            # checkpoint planes (a wrong cost fails them -> the wrapper
            # asserts on the negative return) and by cigar.verify in tests.
            return job.pair, cost, cigar

        def run_direct(jobs: list):
            # Whole-pair DT traces from the certified costs: pure host
            # work, ONE multi-threaded native call for the whole rung
            # group (the jobs share a rung schedule by construction).
            res = native.trace_direct_batch(
                [pairs[j.pair] for j in jobs], jobs[0].s_words,
                jobs[0].shift, jobs[0].sw, [j.want for j in jobs],
            )
            return [(j.pair, c, cig) for j, (c, cig) in zip(jobs, res)]

        groups: dict[int, list] = {}
        order: list[int] = []
        for job in trace_jobs:
            # Direct jobs group per rung (shared schedule); checkpoint
            # jobs per staged chunk.
            key = id(job.shift) if job.slices is None else id(job.slices)
            if key not in groups:
                order.append(key)
            groups.setdefault(key, []).append(job)
        workers = max(1, min(len(trace_jobs), os.cpu_count() or 1))
        futures = []
        direct_futs = []
        with ThreadPoolExecutor(workers) as ex:
            for key in order:
                jobs = groups[key]
                if jobs[0].slices is None:
                    direct_futs.append(ex.submit(run_direct, jobs))
                    continue
                vp_d, vm_d, tv_d = jobs[0].slices
                vp = np.asarray(vp_d)
                vm = np.asarray(vm_d)
                tv = np.asarray(tv_d)
                for job in jobs:
                    futures.append(ex.submit(run, job, vp, vm, tv))
            for f in direct_futs:
                for i, cost, cigar in f.result():
                    results[i] = (cost, cigar)
            for f in futures:
                i, cost, cigar = f.result()
                results[i] = (cost, cigar)
        trace_jobs.clear()

    def _trace_bucket(self, pairs, idxs, costs, results) -> None:
        from .. import native
        from ..ops import banded
        from ..ops.bitpack import W, n_words
        from ..ops.pallas_myers import pack_batch_staggered

        # Known-cost pairs within the burst budget trace directly — no
        # pack, no kernel, no checkpoint readback; just a certifying
        # schedule for the trace's recompute fallback.
        if self.direct_dt and native.available():
            direct_idx = [i for i in idxs if costs[i] <= _DIRECT_DT_MAX]
            if direct_idx:
                ns = np.array([len(pairs[i][0]) for i in direct_idx],
                              np.int32)
                ms = np.array([len(pairs[i][1]) for i in direct_idx],
                              np.int32)
                n_max = max(8, int(ns.max()))
                S = max(1, n_words(int(ms.max())))
                diag = self._diag(ns, ms, len(direct_idx), n_max, S)
                want = np.asarray([costs[i] for i in direct_idx])
                sw = min(self.band_words, S)
                while sw < S:
                    thr = banded.band_threshold(sw, ns, ms, *diag)
                    if (want <= thr).all():
                        break
                    sw *= 2
                sw = min(sw, S)
                if sw > 64:
                    sw = min(-(-sw // 8) * 8, S)
                shift = banded.shift_at_array(n_max, S, sw, diag)
                jobs = [
                    _TraceJob(pair=i, slices=None, pos=0, shift=shift,
                              s_words=S, sw=sw, cb=0, want=int(costs[i]))
                    for i in direct_idx
                ]
                self._flush_traces(jobs, pairs, results)
                idxs = [i for i in idxs if costs[i] > _DIRECT_DT_MAX]
                if not idxs:
                    return

        bucket_pairs = [pairs[i] for i in idxs]
        args, B0 = pack_batch_staggered(
            bucket_pairs, self._pack_multiple(for_ck=True),
            shape_quantum=self._shape_quantum(bucket_pairs),
        )
        a0, a1, pb0, pb1, n, m = args
        n_max, S = a0.shape[0], pb0.shape[0]
        diag = self._diag(n, m, B0, n_max, S)
        # Wide-enough certified band for every pair in the bucket.
        sw = min(self.band_words, S)
        while sw < S:
            thr = banded.band_threshold(
                sw, np.asarray(n)[:B0], np.asarray(m)[:B0], *diag
            )
            if (np.asarray([costs[i] for i in idxs]) <= thr).all():
                break
            sw *= 2
        sw = min(sw, S)
        import jax

        B = a0.shape[1]
        if sw > 64:
            sw = min(-(-sw // 8) * 8, S)
        shift = banded.shift_at_array(n_max, S, sw, diag)
        CB = self._cb(sw, n_max)
        pp = _select_pp(B, sw, max_pp=1024, cb=CB)
        if (jax.default_backend() == "tpu" or self.pallas_interpret) and (
            pp >= 128 or self._striped_ck_ok(sw, B)
        ):
            # Checkpoint path: O(n/CB) readback; native C++ DT-bursts (or
            # recomputes stripes) in between (`trace.rs:231-416,71-125`).
            # Same dispatch as the combined ladder (pinned-ck for big
            # shared bands, sliding otherwise).
            got, ckvp, ckvm, cktv = self._ck_kernel(
                a0, a1, pb0, pb1, n, m, sw, CB, pp, diag
            )
            # Only the real pairs' checkpoints cross the (slow) device->host
            # link; the staged copies stream behind the thread-pooled traces.
            chunks = _stage_ck_chunks(
                ckvp[:, :, :B0], ckvm[:, :, :B0], cktv[:, :B0], B0
            )
            jobs = []
            for slot, i in enumerate(idxs):
                c0, sl = _chunk_of(chunks, slot)
                jobs.append(_TraceJob(
                    pair=i, slices=sl, pos=slot - c0, shift=shift,
                    s_words=S, sw=sw, cb=CB, want=int(costs[i]),
                ))
            self._flush_traces(jobs, pairs, results)
            return
        if sw > 64 and native.available():
            # Bands too large for the jnp fill's memory: exact per-pair
            # traceback on the host — the native A* runtime at moderate
            # divergence, the band-doubling block aligner (native block
            # backend) when divergence is high enough that A*'s open set
            # explodes (~>8% of the shorter sequence).
            from ..aligners.astarpa2 import AstarPa2Params
            from ..native import astarpa_native

            block_aligner = None
            for i in idxs:
                a, b = pairs[i]
                if int(costs[i]) * 12 >= min(len(a), len(b)):
                    if block_aligner is None:
                        block_aligner = AstarPa2Params.simple().make_aligner(True)
                    cost, cigar = block_aligner.align(a, b)
                else:
                    cost, cigar = astarpa_native(a, b)
                assert cost == costs[i], (cost, costs[i])
                results[i] = (cost, cigar)
            return
        got, vp_cols, vm_cols = banded.banded_fill(
            a0, a1, pb0, pb1, n, m, band_words=sw, diag=diag
        )
        vp_cols = np.asarray(vp_cols[:, :, :B0])
        vm_cols = np.asarray(vm_cols[:, :, :B0])
        lo = np.cumsum(shift).astype(np.int32)  # top word after col i's shift
        for slot, i in enumerate(idxs):
            a, b = pairs[i]
            cost, cigar = native.trace_banded(
                a, b,
                vp_cols[: len(a), :, slot], vm_cols[: len(a), :, slot],
                lo[: len(a)], sw,
            )
            assert cost == costs[i], (cost, costs[i])
            results[i] = (cost, cigar)

    def _align_host_fallback(self, pairs, costs) -> list[tuple[int, Cigar]]:
        from ..aligners.astarpa2 import AstarPa2Params

        aligner = AstarPa2Params.simple().make_aligner(True)
        results = []
        for (a, b), c in zip(pairs, costs):
            cost, cigar = aligner.align(a, b)
            assert cost == c, f"device cost {c} != trace cost {cost}"
            results.append((cost, cigar))
        return results


class _GapDomainProvider:
    """Heuristic-free domain provider: the cost-f parallelogram (closed
    form, no host build cost).  Same interface as native.DomainHandle."""

    def __init__(self, a: bytes, b: bytes):
        self.n, self.m = len(a), len(b)
        # First-round f: the gap bound plus a small divergence allowance
        # (~6%); the feedback ladder converges from either side.
        self.h0 = abs(self.m - self.n) + max(self.n, 1) // 16

    def sample(self, f_max: int, step: int = 64):
        from ..domain import gap_domain

        return gap_domain(self.n, self.m, f_max, step)

    def close(self) -> None:
        pass


def _trivial_cigar(a: bytes, b: bytes) -> Cigar:
    from ..types import CigarOp

    cigar = Cigar()
    if len(a):
        cigar.push(CigarOp.DEL, len(a))
    if len(b):
        cigar.push(CigarOp.INS, len(b))
    return cigar


from dataclasses import dataclass as _dc


@_dc
class _TraceJob:
    """One deferred checkpoint trace: pair index + its column in a staged
    readback chunk (whose device->host copy is already in flight).
    ``slices is None`` marks a *direct* whole-pair DT trace (no device
    checkpoints at all; traced from the certified cost ``want``)."""

    pair: int
    slices: tuple | None  # (ckvp, ckvm, cktv) device arrays of ONE chunk
    pos: int       # this pair's column within the chunk
    shift: np.ndarray
    s_words: int
    sw: int
    cb: int
    want: int


# The tunnel rig's device->host link has ~150ms per-transfer latency on top
# of ~7MB/s bandwidth, so the readback strategy is: few transfers, all
# issued asynchronously as early as possible.  Chunks of ~2MB let the
# thread-pooled traces of chunk k overlap the transfer of chunk k+1.
_CHUNK_TARGET_BYTES = 2 * 2**20
# Ceiling for the *optimistic* pre-certification readback (checkpoints of
# every lane stream to the host before the cost vector arrives; a failed
# rung wastes at most this many bytes — ~1.1s of link here, nothing on a
# PCIe-class host).  8MB covers a 4096-lane 10kbp batch at CB=2048, where
# losing the optimistic overlap measured ~2x worse than the waste risk.
_OPT_READBACK_BYTES = 8 * 2**20


def _stage_ck_chunks(ckvp, ckvm, cktv, lanes: int):
    """Split checkpoint planes into per-lane-range chunks and start an async
    device->host copy for each; returns ``[(c0, c1, (vp, vm, tv)), ...]``.

    Issuing every copy up front pays the link's per-transfer latency once
    (the copies pipeline behind each other) instead of once per blocking
    ``np.asarray`` at trace time."""
    per_lane = 4 * (
        int(ckvp.size) + int(ckvm.size) + int(cktv.size)
    ) // max(1, int(ckvp.shape[2]))
    n_chunks = int(max(1, min(8, per_lane * lanes // _CHUNK_TARGET_BYTES)))
    step = -(-lanes // n_chunks)
    chunks = []
    for c0 in range(0, lanes, step):
        c1 = min(lanes, c0 + step)
        sl = (ckvp[:, :, c0:c1], ckvm[:, :, c0:c1], cktv[:, c0:c1])
        for x in sl:
            copy = getattr(x, "copy_to_host_async", None)
            if copy is not None:
                copy()
        chunks.append((c0, c1, sl))
    return chunks


def _chunk_of(chunks, p: int):
    for c0, c1, sl in chunks:
        if c0 <= p < c1:
            return c0, sl
    raise AssertionError(f"position {p} outside staged chunks")


@functools.lru_cache(maxsize=None)
def _sharded_ck(mesh, sw: int, CB: int, pp: int, interpret: bool,
                kind: str = "sliding", diag=None):
    """shard_map'd checkpointing kernel over the mesh's batch axis: every
    shard runs the Pallas ck kernel on its own pairs; checkpoints come back
    sharded along the pair axis (`astarpa2/src/blocks/trace.rs:16-135`
    ridden by the mesh instead of bypassed).  ``kind`` picks the big-band
    layout per shard: "pinned"/"striped" run in traced-safe
    static-window mode (n/m are traced inside shard_map)."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_banded import banded_ck_tpu

    def fn(a0, a1, pb0, pb1, n, m):
        # NB: no LAST_KERNEL writes here — this body runs only at trace
        # time (jit + lru cache hits skip it); the dispatch-time label is
        # set in BatchAligner._ck_kernel from the same `kind`.
        if kind == "pinned":
            from ..ops.pinned import pinned_ck_tpu

            return pinned_ck_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                interpret=interpret, static_windows=True, diag=diag,
            )
        if kind == "striped":
            from ..ops.striped import striped_ck_tpu

            return striped_ck_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                interpret=interpret, static_windows=True, diag=diag,
            )
        return banded_ck_tpu(
            a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
            pairs_per_program=pp, interpret=interpret, diag=diag,
        )

    cols = P(None, "batch")
    vec = P("batch")
    ck3 = P(None, None, "batch")
    ck2 = P(None, "batch")
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(cols, cols, cols, cols, vec, vec),
            out_specs=(vec, ck3, ck3, ck2),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=None)
def _sharded_domain(mesh, sw: int, Q: int, interpret: bool, want_ck: bool,
                    CB: int, pp: int):
    """shard_map'd per-pair-schedule kernel (cost or checkpointing) over
    the mesh's batch axis; schedules shard with the pairs."""
    import jax
    from jax.sharding import PartitionSpec as P

    from ..ops.pallas_banded import banded_cost_tpu, banded_ck_tpu

    def fn(a0, a1, pb0, pb1, n, m, sched):
        global LAST_KERNEL
        if want_ck:
            LAST_KERNEL = "pallas-ck-perpair-sharded"
            return banded_ck_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw, col_block=CB,
                pairs_per_program=pp, interpret=interpret,
                schedule=sched, schedule_quantum=Q,
            )
        LAST_KERNEL = "pallas-perpair-sharded"
        return banded_cost_tpu(
            a0, a1, pb0, pb1, n, m, band_words=sw, pairs_per_program=pp,
            interpret=interpret, schedule=sched, schedule_quantum=Q,
        )

    cols = P(None, "batch")
    vec = P("batch")
    out = (vec, P(None, None, "batch"), P(None, None, "batch"), P(None, "batch")) if want_ck else vec
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(cols, cols, cols, cols, vec, vec, cols),
            out_specs=out,
            check_vma=False,
        )
    )


def _select_pp(B: int, sw: int, max_pp: int = 4096, cb: int = 0) -> int:
    """Largest pairs-per-program whose window state fits VMEM (above 256
    words the initial window lives in HBM, so only the 4 state arrays scale
    with the band); 0 if no >=128 multiple divides the batch.

    ``cb``: checkpoint column-block of the ck kernel, whose per-grid-step
    input slab (two uint32 char planes of CB columns x PP pairs, DOUBLE-
    buffered by the Pallas pipeline -> 16 bytes/column/pair) also lives in
    VMEM.  Inputs stream at an IB block (a divisor of CB picked inside
    _banded_call), so the slab term is IB-sized, not CB — except when CB
    is not divisible by 512 (n_max-clamped small buckets), where the
    whole CB block is the slab.  Without any slab term, CB=2048 at
    PP=512 measured 17.3M against the 16M scoped limit."""
    per_word = 17 if sw > 256 else 24
    if cb:
        from ..ops.pallas_banded import pick_input_block
    for cand in (4096, 2048, 1024, 512, 256, 128):
        if cand > max_pp:
            continue
        slab = pick_input_block(cb, cand) if cb else 0
        need = (per_word * sw + 16 * slab) * cand
        if cand <= B and B % cand == 0 and need < 11 * 2**20:
            return cand
    return 0


#: Kernel chosen by the most recent `_local_cost` *trace* ("pallas"/"jnp");
#: test introspection only (cache hits don't re-trace, so don't rely on it
#: being refreshed per call).
LAST_KERNEL = None


#: Route bands in [MIN, MAX] words to the pinned-word staggered kernel
#: (ops/pinned.py): words on sublanes keep full tiles at any band height
#: (~1.2 Tcells/s SW-equivalent, ~3.5x the sliding kernel's 0.35 once
#: VMEM forces the sliding kernel to PP=128).  Below MIN the sliding
#: pairs-tile kernel's batch amortization wins; above MAX the pinned
#: residency (~1.5x band) exceeds VMEM — sliding HBM-window takes over.
PINNED_ENABLED = True
PINNED_MIN_SW = 640
#: Above this the pinned residency (RW ~ SW + TB + D) exceeds scoped VMEM
#: even at TB=256 (the kernel's own guard re-checks and the sliding
#: HBM-window kernel takes over).
PINNED_MAX_SW = 2240
#: From this band up, the striped HBM-carry kernel is preferred
#: UNCONDITIONALLY (even where the sliding kernel's pairs-per-program is
#: healthy); below it, striped is still tried first whenever the sliding
#: kernel collapses (pp < 512, sw >= 64).  Since the dynamic in-kernel
#: group range (r5: the word walk skips absorbed / not-yet-entered groups
#: per STEP, with the top word's char code read directly from the chunk
#: instead of ferried through absorbed rows) the striped kernel beats the
#: pinned kernel at EVERY measured shared band (same-run A/Bs,
#: scripts/bench_striped.py, WS=512 TB=512: 500kbp x128 SW=768 pinned
#: 0.79 vs striped 0.97 Tcells/s; SW=1024 0.80 vs 0.99; SW=2048 0.67 vs
#: 1.01; 100kbp x128 SW=64/128/256/512 pinned 0.42/0.57/0.70/0.76 vs
#: striped 0.60/0.76/0.88/0.93; full height 1.00), so pinned survives as
#: the exception path (striped ValueError) and the per-pair kernel.
STRIPED_MIN_SW = 640
#: Per-pair schedules route to the pinned kernel (ops/pinned.py per-pair
#: mode) above this band: the sliding per-pair kernel drops to PP=128 and
#: ~0.35 Tcells/s there, while the pinned layout keeps full tiles.  Its
#: own VMEM residency guard (band + cross-pair envelope spread) still
#: applies and falls back to sliding when exceeded.
PINNED_PP_MIN_SW = 512


def _local_cost(a0, a1, pb0, pb1, n, m, *, sw: int, interpret: bool,
                diag=None):
    """Per-device kernel selection: Pallas whenever this shard's batch
    supports a >=128-pair program on a TPU backend (or interpret mode is
    forced); bit-identical jnp formulation otherwise.  Large shared bands
    use the pinned staggered kernel (results <= the sliding kernel's and
    certified by the same thresholds, so acceptance logic is unchanged)."""
    import jax

    from ..ops import banded

    global LAST_KERNEL
    B = a0.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    pp = _select_pp(B, sw)
    # Pinned routing (fallback only since r5): big shared bands; smaller
    # bands too when the sliding kernel's pairs-per-program collapses
    # (tiny batches) — pinned keeps full sublane tiles at any band height.
    pinned_band = PINNED_MIN_SW <= sw <= PINNED_MAX_SW or (
        pp < 512 and 64 <= sw <= PINNED_MAX_SW and sw % 8 == 0
    )
    # Striped routing: the whole regime where the sliding kernel's
    # pairs-per-program collapses, plus everything past the pinned VMEM
    # ceiling.  Since the r5 dynamic group range the striped kernel beats
    # pinned at EVERY measured shared band (100kbp x128, WS=512 TB=512:
    # SW=64 0.60 vs 0.42 Tcells/s, SW=128 0.76 vs 0.57, SW=256 0.88 vs
    # 0.70, SW=512 0.93 vs 0.76; 500kbp SW=2048 1.01 vs 0.67), so it is
    # tried FIRST everywhere it can serve; pinned is the exception path.
    striped_band = (
        sw > PINNED_MAX_SW
        or sw >= STRIPED_MIN_SW
        or (pp < 512 and sw >= 64 and sw % 8 == 0)
    )

    def _try_pinned():
        if not pinned_band:
            return None
        from ..ops.pinned import pinned_cost_tpu

        # Traced inputs (inside shard_map / an outer jit) use static
        # capture windows — the traced-safe mode; big-band cost then
        # rides the pinned kernel on every mesh shard too.
        try:
            out = pinned_cost_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw,
                static_windows=isinstance(a0, jax.core.Tracer), diag=diag,
            )
        except (ValueError, jax.errors.JaxRuntimeError):
            return None  # residency over VMEM for this bucket
        return "pinned", out

    def _try_striped():
        if not striped_band:
            return None
        # HBM-striped state: no band ceiling (includes the full-height
        # ladder clamp).
        from ..ops.striped import striped_cost_tpu

        try:
            out = striped_cost_tpu(
                a0, a1, pb0, pb1, n, m, band_words=sw,
                static_windows=isinstance(a0, jax.core.Tracer), diag=diag,
            )
        except (ValueError, jax.errors.JaxRuntimeError):
            return None
        return "striped", out

    if PINNED_ENABLED and on_tpu and not interpret and B % 128 == 0:
        for attempt in (_try_striped, _try_pinned):
            got = attempt()
            if got is not None:
                LAST_KERNEL, out = got
                return out
    use_pallas = pp >= 128 and (on_tpu or interpret)
    LAST_KERNEL = "pallas" if use_pallas else "jnp"
    if use_pallas:
        from ..ops.pallas_banded import banded_cost_tpu

        return banded_cost_tpu(
            a0, a1, pb0, pb1, n, m,
            band_words=sw, pairs_per_program=pp, interpret=interpret,
            diag=diag,
        )
    return banded.banded_cost(a0, a1, pb0, pb1, n, m, band_words=sw,
                              diag=diag)


@functools.lru_cache(maxsize=None)
def _sharded_cost(mesh, sw: int, interpret: bool, diag=None):
    """shard_map'd banded cost over the mesh's batch axis.  Cached per
    (mesh, band, diag) so jax.jit's trace cache is effective across
    batches."""
    import jax
    from jax.sharding import PartitionSpec as P

    fn = functools.partial(_local_cost, sw=sw, interpret=interpret, diag=diag)
    cols = P(None, "batch")
    vec = P("batch")
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(cols, cols, cols, cols, vec, vec),
            out_specs=vec,
            # pallas_call out_shapes carry no vma annotations; the body is
            # purely per-shard (no collectives), so vma checking adds nothing.
            check_vma=False,
        )
    )


def _pad_cols(x, pad: int):
    x = np.asarray(x)
    return np.concatenate([x, np.zeros((x.shape[0], pad), x.dtype)], axis=1)


def _buckets(pairs, idxs: list[int], growth: float = 1.5) -> list[list[int]]:
    """Group pair indices into shape buckets: geometric n-classes so padding
    waste is bounded by ``growth``; within a class, one bucket (m_max is
    checked against the banded kernel's one-shift-per-column requirement
    m_max <= W * n_max, guaranteed here by splitting skewed pairs off)."""
    by_class: dict[tuple[int, int], list[int]] = {}
    for i in idxs:
        a, b = pairs[i]
        ncls = 0
        size = 64
        while size < len(a):
            size = int(size * growth) + 1
            ncls += 1
        skew = 0 if len(b) <= W * max(1, len(a)) else 1
        by_class.setdefault((ncls, skew), []).append(i)
    out = []
    for (_, skew), members in sorted(by_class.items()):
        if skew:
            # Extremely skewed pairs (m > 32n): full-height window per pair.
            out.extend([[i] for i in members])
        else:
            out.append(members)
    return out
