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
    """Default A*PA alignment (`astarpa/src/lib.rs:56-64`): A* in the
    diagonal-transition state space guided by GCSH (r=2, k=15) with match
    pruning by start."""
    from .astar import astarpa as _astarpa

    return _astarpa(a, b)


def astarpa_gcsh(a: bytes, b: bytes, r: int, k: int, prune) -> tuple[int, Cigar]:
    """A*PA with custom GCSH parameters (`astarpa/src/lib.rs:69-77`)."""
    from .astar import astarpa_gcsh as _gcsh

    return _gcsh(a, b, r, k, prune)
