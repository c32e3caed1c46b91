"""Top-level single-pair API (mirror of `astarpa2/src/lib.rs:38-53` and
`astarpa/src/lib.rs:56-129`)."""

from __future__ import annotations

from .aligners.astarpa2 import AstarPa2Params
from .types import Cigar


def astarpa2_nw(a: bytes, b: bytes) -> tuple[int, Cigar]:
    """Full n*m bitpacked NW with traceback."""
    cost, cigar, _ = AstarPa2Params.nw().make_aligner(True).cost_or_align(a, b, True)
    return cost, cigar


def astarpa2_simple(a: bytes, b: bytes) -> tuple[int, Cigar]:
    """Gap-heuristic band doubling (A*PA2-simple)."""
    cost, cigar, _ = AstarPa2Params.simple().make_aligner(True).cost_or_align(a, b, True)
    return cost, cigar


def astarpa2_full(a: bytes, b: bytes) -> tuple[int, Cigar]:
    """GCSH-guided band doubling with pruning (A*PA2-full)."""
    cost, cigar, _ = AstarPa2Params.full().make_aligner(True).cost_or_align(a, b, True)
    return cost, cigar


def astarpa(a: bytes, b: bytes) -> tuple[int, Cigar]:
    """Default full-strength alignment.

    The reference's `astarpa()` (astarpa/src/lib.rs:62-64) runs A* with GCSH
    (r=2, k=15) in DT space; this framework re-expresses that as the
    equivalent exact block band-doubling DP guided by the same heuristic
    (the TPU-shaped formulation; identical costs).
    """
    from .heuristic.csh import GCSH
    from .heuristic.matches import MatchConfig
    from .heuristic.prune import Prune, Pruning
    from dataclasses import replace

    params = replace(
        AstarPa2Params.full(),
        heuristic=GCSH(MatchConfig(k=15, r=2, local_pruning=0), Pruning(Prune.START)),
    )
    cost, cigar, _ = params.make_aligner(True).cost_or_align(a, b, True)
    return cost, cigar
