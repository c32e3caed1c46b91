"""Command-line interface (mirror of `pa-bin/src/main.rs:9-37`).

Aligns pairs from a file or a generated dataset and writes
``{cost},{cigar}`` CSV lines.

Examples:
    python -m astarpa_tpu.cli --input pairs.seq
    python -m astarpa_tpu.cli --length 1000 --error-rate 0.05 --cnt 10
"""

from __future__ import annotations

import argparse
import sys

from . import generate
from .aligners.astarpa2 import AstarPa2Params
from .pairs_io import read_pairs


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="astarpa-tpu", description="TPU-native exact global pairwise aligner"
    )
    p.add_argument("--input", "-i", help=".seq, .txt, or FASTA file with sequence pairs")
    p.add_argument("--output", "-o", help="write a .csv of {cost},{cigar} lines")
    p.add_argument(
        "--aligner",
        default="astarpa2-full",
        choices=["astarpa", "astarpa2-simple", "astarpa2-full", "nw"],
    )
    p.add_argument("--no-cigar", action="store_true", help="cost only")
    # Generated input (pa-generate DatasetGenerator equivalent).
    p.add_argument("--length", "-n", type=int, help="length of generated sequences")
    p.add_argument("--error-rate", "-e", type=float, default=0.05)
    p.add_argument("--cnt", type=int, default=1, help="number of generated pairs")
    p.add_argument("--seed", type=int, default=31415)
    p.add_argument(
        "--error-model",
        default="uniform",
        choices=[m.value for m in generate.ErrorModel],
    )
    return p


def build_aligner(name: str, trace: bool):
    if name == "astarpa2-simple":
        return AstarPa2Params.simple().make_aligner(trace)
    if name == "astarpa2-full":
        return AstarPa2Params.full().make_aligner(trace)
    if name == "nw":
        return AstarPa2Params.nw().make_aligner(trace)
    if name == "astarpa":
        from .astar import AstarPa
        from .heuristic.csh import GCSH
        from .heuristic.matches import MatchConfig
        from .heuristic.prune import Prune, Pruning

        return AstarPa(dt=True, h=GCSH(MatchConfig(k=15, r=2), Pruning(Prune.START)))
    raise ValueError(name)


def main(argv=None) -> int:
    args = make_parser().parse_args(argv)
    if (args.input is None) == (args.length is None):
        print("error: exactly one of --input or --length is required", file=sys.stderr)
        return 2

    if args.input is not None:
        pairs = read_pairs(args.input)
    else:
        pairs = generate.generate_batch(
            args.cnt, args.length, args.error_rate,
            generate.ErrorModel(args.error_model), args.seed,
        )

    aligner = build_aligner(args.aligner, not args.no_cigar)
    out = open(args.output, "w") if args.output else sys.stdout
    try:
        for a, b in pairs:
            cost, cigar = aligner.align(a, b)
            out.write(f"{cost},{cigar.to_string() if cigar is not None else ''}\n")
    finally:
        if args.output:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
