#!/usr/bin/env python
"""Generate visualizer figures (the `pa-bin/examples/*figures*` role).

Renders the explored/expanded state space of the A* and block aligners to
PNG frames and a self-contained interactive HTML page.

Usage: python scripts/figures.py [--out figures/] [-n 500] [-e 0.1]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, ".")

from astarpa_tpu import generate  # noqa: E402
from astarpa_tpu.vis import VisConfig, When  # noqa: E402
from astarpa_tpu.vis.html import export_html  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="figures")
    p.add_argument("-n", type=int, default=500)
    p.add_argument("-e", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=31415)
    args = p.parse_args()
    out = Path(args.out)
    a, b = generate.uniform_seeded(args.n, args.e, args.seed)

    # A* with GCSH, per-layer frames.
    from astarpa_tpu.astar import AstarPa
    from astarpa_tpu.heuristic.csh import GCSH
    from astarpa_tpu.heuristic.matches import MatchConfig
    from astarpa_tpu.heuristic.prune import Prune, Pruning

    d = out / "astarpa"
    v = VisConfig(draw=When.LAYERS, save=str(d), cell_size=2)
    aligner = AstarPa(dt=True, h=GCSH(MatchConfig(k=8, r=1), Pruning(Prune.START)), v=v)
    (cost, _), _ = aligner.align_with_stats(a, b)
    export_html(d, d / "astarpa.html", title=f"A*PA n={args.n} e={args.e} cost={cost}")
    print(f"wrote {d}/astarpa.html ({len(list(d.glob('*.png')))} frames)")

    # Block aligner, final frame.
    from astarpa_tpu.aligners.astarpa2 import AstarPa2Params

    d2 = out / "astarpa2"
    aligner2 = AstarPa2Params.simple().make_aligner(True)
    aligner2.v = VisConfig(draw=When.LAST, save=str(d2), cell_size=2)
    cost2, _ = aligner2.align(a, b)
    export_html(d2, d2 / "astarpa2.html", title=f"A*PA2 n={args.n} cost={cost2}")
    print(f"wrote {d2}/astarpa2.html")
    assert cost == cost2
    return 0


if __name__ == "__main__":
    sys.exit(main())
