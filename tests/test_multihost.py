"""Multi-host streaming runner: stripe logic, stats merge, output shards.

Real multi-process runs need jax.distributed; here host striping is
simulated with explicit (process_index, process_count) and the stats merge
runs over the 8-virtual-device CPU mesh."""

import numpy as np

from astarpa_tpu import generate, oracle
from astarpa_tpu.parallel.multihost import (
    MultiHostRunner,
    _merge_counts,
    host_stripe,
    init_distributed,
)
from astarpa_tpu.parallel.runner import BatchAligner


def test_host_stripe_partition():
    n, pc = 23, 4
    stripes = [host_stripe(n, p, pc) for p in range(pc)]
    allidx = sorted(int(i) for s in stripes for i in s)
    assert allidx == list(range(n))
    for p, s in enumerate(stripes):
        assert all(i % pc == p for i in s)


def test_init_distributed_single_process():
    pi, pc = init_distributed()
    assert pi == 0 and pc == 1


def test_merge_counts_single_process():
    assert _merge_counts(7, 1000) == (7, 1000)


def test_merge_counts_exact_beyond_float32():
    """Counters above the 2^24 float32 integer range merge exactly (16-bit
    limb decomposition; advisor finding: the old float32 path rounded)."""
    vals = (2**53 - 111, 2**24 + 1, 41_000_000, 0)
    assert _merge_counts(*vals) == vals


def test_runner_two_simulated_hosts(tmp_path):
    pairs = [
        generate.generate_model(100 + 17 * s, 0.1, generate.ErrorModel.UNIFORM, s)
        for s in range(9)
    ]
    expected = [oracle.levenshtein(a, b) for a, b in pairs]
    runner = MultiHostRunner(BatchAligner(band_words=4, lane_multiple=8), batch_size=4)
    seen = {}
    for p in range(2):
        out = tmp_path / f"shard{p}.csv"
        res = runner.run(
            pairs, out_path=str(out), process_index=p, process_count=2
        )
        stripe = host_stripe(len(pairs), p, 2)
        costs = [int(l.split(",")[0]) for l in out.read_text().splitlines()]
        assert res.local_pairs == len(stripe)
        for i, c in zip(stripe, costs):
            seen[int(i)] = c
    assert [seen[i] for i in range(len(pairs))] == expected


def test_runner_with_cigars(tmp_path):
    pairs = [generate.uniform_seeded(80, 0.15, s) for s in range(4)]
    runner = MultiHostRunner(BatchAligner(band_words=4, lane_multiple=8), batch_size=2)
    out = tmp_path / "shard.csv"
    runner.run(pairs, out_path=str(out), with_cigars=True)
    lines = out.read_text().splitlines()
    assert len(lines) == len(pairs)
    from astarpa_tpu.types import Cigar

    for (a, b), line in zip(pairs, lines):
        cost, cig = line.split(",", 1)
        assert Cigar.from_string(cig).verify(a, b) == int(cost) == oracle.levenshtein(a, b)
