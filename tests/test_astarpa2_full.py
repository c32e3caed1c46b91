"""End-to-end tests for GCSH-guided alignment (astarpa2-full equivalent).

Mirrors the reference's configuration-matrix tests (`astarpa2/src/tests.rs`).
"""

import numpy as np
import pytest
from dataclasses import replace

from astarpa_tpu import generate, oracle
from astarpa_tpu.aligners.astarpa2 import AstarPa2Params
from astarpa_tpu.heuristic.csh import CSH, GCSH
from astarpa_tpu.heuristic.matches import MatchConfig
from astarpa_tpu.heuristic.prune import Prune, Pruning

TRICKY = [
    (b"TTGGGTCAATCAGCCAGTTTTTA", b"TTTGAGTGGGTCATCACCGATTTTAT"),
    (b"ACTGACCAGT", b"CCGACAGGA"),
    (b"AGTTTTAT", b"ACCGATTTTTA"),
    (b"CTCTCTTCTCTCTCTA", b"CCTCTCTCTCTCCTCTC"),
    (b"AGTGGGTTGCCTTCATTCCG", b"AGTGGTGTCTTCAGGCCTTCATTCCG"),
    (b"GCACGTCGCCCCCCGCCCGCG", b"GCCCGCCCGCCCGCCCCCGCCCCC"),
]


def check(params, a, b, ctx=""):
    expected = oracle.levenshtein(a, b)
    cost, cigar, _ = params.make_aligner(True).cost_or_align(a, b, True)
    assert cost == expected, f"{ctx}: {cost} != {expected}"
    assert cigar.verify(a, b) == cost, ctx


def variants():
    # GCSH/CSH x r x prune x local_pruning x incremental_doubling.
    full = AstarPa2Params.full()
    yield "full-default", full
    yield "full-r2", replace(
        full, heuristic=GCSH(MatchConfig(k=10, r=2, local_pruning=14), Pruning(Prune.START)),
    )
    yield "full-noprune", replace(
        full,
        prune=False,
        heuristic=GCSH(MatchConfig(k=12, r=1, local_pruning=0), Pruning.disabled()),
    )
    yield "full-no-id", replace(full, incremental_doubling=False)
    yield "csh-nogap", replace(
        full,
        heuristic=CSH(MatchConfig(k=10, r=1, local_pruning=0), Pruning(Prune.START)),
    )
    yield "full-no-dt", replace(full, dt_trace=False)
    yield "full-k6", replace(
        full, heuristic=GCSH(MatchConfig(k=6, r=1, local_pruning=4), Pruning(Prune.START)),
    )
    # Non-sparse h frontier walk (`domain.rs:169-180`): every shipped preset
    # sets sparse_h=True, so cover the dense branch explicitly.
    yield "full-dense-h", replace(full, sparse_h=False)


@pytest.mark.parametrize("name,params", list(variants()))
def test_full_tricky(name, params):
    for a, b in TRICKY:
        check(params, a, b, name)


@pytest.mark.parametrize("name,params", list(variants()))
def test_full_grid(name, params):
    rng = np.random.default_rng(hash(name) % (1 << 31))
    for n in [30, 100, 256, 513]:
        for e in [0.0, 0.05, 0.2]:
            for model in generate.ErrorModel:
                a, b = generate.generate_model(n, e, model, int(rng.integers(1 << 31)))
                check(params, a, b, f"{name} n={n} e={e} {model}")


@pytest.mark.slow
def test_full_long():
    # Native block backend lifts the practical ceiling well past the old
    # 3kbp (round-1 verdict item): 50kbp in a few seconds.
    a, b = generate.generate_model(50_000, 0.08, generate.ErrorModel.UNIFORM, 1)
    check(AstarPa2Params.full(), a, b, "50kbp")


def test_block_kernel_native_jnp_parity():
    """The native block backend is bit-identical to the jnp scans."""
    import numpy as np

    from astarpa_tpu.ops import bitpack
    from astarpa_tpu.ops.block_kernel import BlockKernel

    from astarpa_tpu.types import seq_to_codes

    a, b = generate.generate_model(700, 0.12, generate.ErrorModel.UNIFORM, 9)
    a0, a1 = bitpack.pack_a(seq_to_codes(a))
    pb0, pb1 = bitpack.pack_b(seq_to_codes(b))
    kernels = []
    for flag in (True, False):
        BlockKernel.use_native = flag
        try:
            kernels.append(BlockKernel(a0, a1, pb0, pb1))
        finally:
            BlockKernel.use_native = None
    kn, kj = kernels
    rng = np.random.default_rng(0)
    vp = rng.integers(0, 1 << 32, 8, dtype=np.uint32)
    vm = (~vp) & rng.integers(0, 1 << 32, 8, dtype=np.uint32)
    outs = [k.compute(0, 256, 0, 8, vp.copy(), vm.copy()) for k in (kn, kj)]
    for x, y in zip(*outs):
        assert (np.asarray(x) == np.asarray(y)).all()
    fills = [k.fill(10, 80, 1, 6, vp[:5].copy(), vm[:5].copy()) for k in (kn, kj)]
    for x, y in zip(*fills):
        assert (np.asarray(x) == np.asarray(y)).all()


def test_astarpa_entry():
    from astarpa_tpu import api

    for a, b in TRICKY:
        cost, cigar = api.astarpa(a, b)
        assert cost == oracle.levenshtein(a, b)
        assert cigar.verify(a, b) == cost
    cost, _ = api.astarpa(b"ACTCGCT", b"AACTCGTT")
    assert cost == 2


def test_incremental_doubling_self_check(monkeypatch):
    """Debug recompute (`blocks.rs:473-543`): every ID block must be
    bit-identical to a from-scratch computation."""
    from astarpa_tpu.aligners import block as block_mod
    from astarpa_tpu.aligners.astarpa2 import AstarPa2Params
    from astarpa_tpu import generate, oracle

    monkeypatch.setattr(block_mod, "_DEBUG_ID", True)
    aligner = AstarPa2Params.full().make_aligner(True)
    for seed in (1, 2):
        a, b = generate.uniform_seeded(400, 0.15, seed)
        cost, cigar = aligner.align(a, b)
        assert cost == oracle.levenshtein(a, b)
        assert cigar.verify(a, b) == cost
