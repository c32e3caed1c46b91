"""Visualizer tests: callback wiring, PNG frames, HTML export."""

import zlib

import numpy as np

from astarpa_tpu import generate, oracle
from astarpa_tpu.astar import AstarPa
from astarpa_tpu.heuristic.csh import GCSH
from astarpa_tpu.heuristic.matches import MatchConfig
from astarpa_tpu.heuristic.prune import Prune, Pruning
from astarpa_tpu.vis import NoVis, VisConfig, When
from astarpa_tpu.vis.canvas import png_bytes
from astarpa_tpu.vis.html import export_html


def test_png_roundtrip_header():
    img = np.zeros((4, 6, 3), np.uint8)
    img[1, 2] = (255, 0, 0)
    data = png_bytes(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR dims
    import struct

    w, h = struct.unpack(">II", data[16:24])
    assert (w, h) == (6, 4)
    # IDAT decompresses to H * (1 + W*3) filter-prefixed rows.
    idat_start = data.index(b"IDAT") + 4
    idat_len = struct.unpack(">I", data[data.index(b"IDAT") - 4 : data.index(b"IDAT")])[0]
    raw = zlib.decompress(data[idat_start : idat_start + idat_len])
    assert len(raw) == 4 * (1 + 6 * 3)


def test_astar_with_visualizer(tmp_path):
    v = VisConfig(draw=When.LAYERS, save=str(tmp_path), cell_size=1)
    aligner = AstarPa(
        dt=False, h=GCSH(MatchConfig(k=8, r=1), Pruning(Prune.START)), v=v
    )
    a, b = generate.uniform_seeded(120, 0.1, 5)
    (cost, cigar), _ = aligner.align_with_stats(a, b)
    assert cost == oracle.levenshtein(a, b)
    frames = list(tmp_path.glob("*.png"))
    assert frames, "visualizer produced no frames"
    export_html(tmp_path, tmp_path / "vis.html")
    html = (tmp_path / "vis.html").read_text()
    assert "data:image/png;base64," in html


def test_astarpa2_with_visualizer(tmp_path):
    from astarpa_tpu.aligners.astarpa2 import AstarPa2Params

    v = VisConfig(draw=When.LAST, save=str(tmp_path), cell_size=1)
    aligner = AstarPa2Params.simple().make_aligner(True)
    aligner.v = v
    a, b = generate.uniform_seeded(200, 0.08, 6)
    cost, cigar = aligner.align(a, b)
    assert cost == oracle.levenshtein(a, b)
    assert list(tmp_path.glob("*last.png"))


def test_novis_absorbs_everything():
    v = NoVis().build(b"A", b"C")
    v.expand((0, 0), 0, 0)
    v.whatever_hook(1, 2, 3)
    v.new_layer()


def test_visualizer_panels(tmp_path):
    """Contour-layer, DT-space, and f-profile panels render
    (`visualizer.rs:1265-1281,1608,1798` re-expressions)."""
    v = VisConfig(
        draw=When.LAST, save=str(tmp_path), cell_size=1,
        draw_contours=True, draw_dt=True, draw_f=True,
    )
    aligner = AstarPa(
        dt=False, h=GCSH(MatchConfig(k=8, r=1), Pruning(Prune.START)), v=v
    )
    a, b = generate.uniform_seeded(150, 0.12, 8)
    (cost, cigar), _ = aligner.align_with_stats(a, b)
    assert cost == oracle.levenshtein(a, b)
    frames = list(tmp_path.glob("*.png"))
    assert frames, "no frame written"
    # The composed image must be taller than the grid alone (panels added).
    inst = v.build(a, b)
    inst.dt_states = [(0, 0), (3, 2)]
    inst.f_profile = {0: 5, 3: 9}
    img = inst.render()
    assert img.shape[0] > (len(b) // inst.d + 2)


def test_figure_suite_smoke(tmp_path):
    """The figure suite (scripts/figures.py — the `pa-bin/examples/*figures*`
    role) renders every family in --small mode."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "figures", Path(__file__).parent.parent / "scripts" / "figures.py"
    )
    figures = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(figures)
    # One cheap family per aligner class keeps this a smoke test.
    for fig in ("layers", "no-matches", "local-doubling"):
        assert figures.main(["--small", "--out", str(tmp_path), "--fig", fig]) == 0
    assert list(tmp_path.glob("layers-gcsh/*.png"))
    assert list(tmp_path.glob("no-matches/*.png"))
    assert list(tmp_path.glob("local-doubling/*.png"))
