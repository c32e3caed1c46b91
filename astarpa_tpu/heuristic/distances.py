"""Distance heuristics (mirror of `pa-heuristic/src/heuristic/distances.rs`).

These are stateless lower-bound distance functions used as plug-in
heuristics for the A* domain of the block aligner.  Each instance exposes
the same protocol as the full GCSH instance (:mod:`astarpa_tpu.heuristic.csh`):
``h(pos)``, ``h_with_hint(pos, hint)``, plus no-op pruning hooks.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..types import Pos


class HeuristicInstance:
    """Protocol default implementations (cf. `heuristic.rs:40-188`)."""

    def h(self, pos: Pos) -> int:
        raise NotImplementedError

    def h_with_hint(self, pos: Pos, hint):
        return self.h(pos), hint

    def root_potential(self) -> int:
        return 0

    def default_hint(self):
        return None

    # Pruning hooks: no-ops for distance heuristics.
    def update_contours(self, pos: Pos) -> None:
        pass

    def prune_block(self, i_range, j_range) -> None:
        pass

    def is_seed_start_or_end(self, pos: Pos) -> bool:
        return False


@dataclass
class NoCostI(HeuristicInstance):
    """h = 0 everywhere (Dijkstra), `distances.rs:24-56`."""

    def h(self, pos: Pos) -> int:
        return 0

    def distance(self, from_pos: Pos, to_pos: Pos) -> int:
        return 0


@dataclass
class GapCostI(HeuristicInstance):
    """h(u) = |Δi - Δj| to the target, `distances.rs:96-137` (unit costs)."""

    target: Pos

    def h(self, pos: Pos) -> int:
        return abs((self.target.i - pos.i) - (self.target.j - pos.j))

    def distance(self, from_pos: Pos, to_pos: Pos) -> int:
        return abs((to_pos.i - from_pos.i) - (to_pos.j - from_pos.j))


@dataclass
class MaxCostI(HeuristicInstance):
    """h(u) = max(Δi, Δj), `distances.rs:60-92`."""

    target: Pos

    def h(self, pos: Pos) -> int:
        return max(self.target.i - pos.i, self.target.j - pos.j)

    def distance(self, from_pos: Pos, to_pos: Pos) -> int:
        return max(to_pos.i - from_pos.i, to_pos.j - from_pos.j)


class NoCost:
    """Heuristic factory for NoCostI (builder-pattern parity)."""

    def build(self, a: bytes, b: bytes) -> NoCostI:
        return NoCostI()

    name = "None"


class GapCost:
    def build(self, a: bytes, b: bytes) -> GapCostI:
        return GapCostI(Pos(len(a), len(b)))

    name = "Gap"
