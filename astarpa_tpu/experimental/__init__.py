"""Experimental prototypes (re-design of the `astarpa-next` crate, L9)."""

from .path_pruning import PathHeuristic

__all__ = ["PathHeuristic"]
