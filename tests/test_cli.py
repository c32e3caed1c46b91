"""CLI smoke tests (pa-bin parity surface, `pa-bin/src/main.rs:9-37`):
generated + file input, batch/cost/chunk modes, {cost},{cigar} CSV out."""

import numpy as np
import pytest

from astarpa_tpu import cli, generate, oracle
from astarpa_tpu.types import Cigar


def _run(args, tmp_path, name="out.csv"):
    out = tmp_path / name
    rc = cli.main(args + ["--output", str(out)])
    assert rc == 0
    return out.read_text().strip().splitlines()


def _check_lines(lines, pairs):
    assert len(lines) == len(pairs)
    for (a, b), line in zip(pairs, lines):
        cost_s, cigar_s = line.split(",", 1)
        assert int(cost_s) == oracle.levenshtein(a, b)
        if cigar_s:
            assert Cigar.from_string(cigar_s).verify(a, b) == int(cost_s)


def test_cli_generated_batch(tmp_path):
    lines = _run(
        ["--length", "300", "--error-rate", "0.08", "--cnt", "5",
         "--seed", "11", "--aligner", "batch"],
        tmp_path,
    )
    pairs = generate.generate_batch(
        5, 300, 0.08, generate.ErrorModel.UNIFORM, 11
    )
    _check_lines(lines, pairs)


def test_cli_batch_chunked_matches_unchunked(tmp_path):
    args = ["--length", "250", "--error-rate", "0.05", "--cnt", "7",
            "--seed", "3", "--aligner", "batch"]
    plain = _run(args, tmp_path, "plain.csv")
    chunked = _run(args + ["--chunk", "3"], tmp_path, "chunked.csv")
    assert plain == chunked
    pairs = generate.generate_batch(
        7, 250, 0.05, generate.ErrorModel.UNIFORM, 3
    )
    _check_lines(chunked, pairs)


def test_cli_no_cigar_and_file_input(tmp_path):
    pairs = generate.generate_batch(
        3, 200, 0.1, generate.ErrorModel.UNIFORM, 5
    )
    seq = tmp_path / "pairs.seq"
    seq.write_text(
        "".join(f">{a.decode()}\n<{b.decode()}\n" for a, b in pairs)
    )
    lines = _run(
        ["--input", str(seq), "--aligner", "batch", "--no-cigar"], tmp_path
    )
    assert [int(l.rstrip(",")) for l in lines] == [
        oracle.levenshtein(a, b) for a, b in pairs
    ]
