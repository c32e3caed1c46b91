"""Multi-host streaming runner: stripe logic, stats merge, output shards.

Real multi-process runs need jax.distributed; here host striping is
simulated with explicit (process_index, process_count) and the stats merge
runs over the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

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


@pytest.mark.slow
def test_two_process_distributed_merge(tmp_path):
    """Real jax.distributed: two OS processes on the CPU backend, each
    aligning its stripe and merging stats over the global device mesh."""
    import json
    import os
    import subprocess
    import sys

    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(
        """
import os, sys, json
os.environ["JAX_PLATFORMS"] = ""
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
pid = int(sys.argv[1])
jax.distributed.initialize(coordinator_address="127.0.0.1:%d",
                           num_processes=2, process_id=pid)
from astarpa_tpu import generate
from astarpa_tpu.parallel.multihost import MultiHostRunner
from astarpa_tpu.parallel.runner import BatchAligner
pairs = [generate.uniform_seeded(60 + 7 * s, 0.1, s) for s in range(9)]
runner = MultiHostRunner(BatchAligner(band_words=4, lane_multiple=8), batch_size=4)
res = runner.run(pairs, out_path=sys.argv[2])
print(json.dumps({"pid": pid, "local": res.local_pairs,
                  "global": res.global_pairs, "gbp": res.global_bp}))
""" % port
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(p), str(tmp_path / f"out{p}.csv")],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]
        outs.append(json.loads(out.decode().strip().splitlines()[-1]))
    total_bp = sum(len(a) for a, _ in [
        __import__("astarpa_tpu").generate.uniform_seeded(60 + 7 * s, 0.1, s)
        for s in range(9)
    ])
    for o in outs:
        assert o["global"] == 9
        assert o["gbp"] == total_bp
    assert outs[0]["local"] + outs[1]["local"] == 9
