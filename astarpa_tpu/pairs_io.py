"""Sequence-pair file IO (mirror of `pa-bin/src/lib.rs:69-131`).

Formats:
- ``.seq``: alternating lines ``>A-seq`` / ``<B-seq`` (prefixes stripped).
- ``.txt``: alternating raw lines.
- ``.fa/.fasta/.fna``: consecutive FASTA records paired up.
"""

from __future__ import annotations

import os
from typing import Iterator


def read_pairs(path: str) -> Iterator[tuple[bytes, bytes]]:
    ext = os.path.splitext(path)[1].lower()
    if ext in (".seq", ".txt"):
        with open(path, "rb") as f:
            lines = [l.rstrip(b"\r\n") for l in f if l.strip()]
        for i in range(0, len(lines) - 1, 2):
            a, b = lines[i], lines[i + 1]
            if ext == ".seq":
                assert a[:1] == b">", f"line {i}: expected '>' prefix"
                assert b[:1] == b"<", f"line {i + 1}: expected '<' prefix"
                a, b = a[1:], b[1:]
            yield a, b
    elif ext in (".fa", ".fasta", ".fna"):
        records = list(_read_fasta(path))
        for i in range(0, len(records) - 1, 2):
            yield records[i], records[i + 1]
    else:
        raise ValueError(f"Unknown file extension {ext!r}; use .seq/.txt/.fa/.fasta/.fna")


def _read_fasta(path: str) -> Iterator[bytes]:
    seq: list[bytes] = []
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line.startswith(b">"):
                if seq:
                    yield b"".join(seq)
                    seq = []
            elif line:
                seq.append(line)
    if seq:
        yield b"".join(seq)


def write_pairs_seq(path: str, pairs: list[tuple[bytes, bytes]]) -> None:
    with open(path, "wb") as f:
        for a, b in pairs:
            f.write(b">" + a + b"\n<" + b + b"\n")
