"""gcsh domain-build shardability measurement (the multi-core-host story).

On this 1-core rig no wall-clock speedup is possible, so this measures the
two facts the >=8-core auto policy rests on:

1. WORK CONSERVATION: per-pair build cost is flat in batch size (the build
   is embarrassingly parallel across pairs — no shared state).
2. NO THREADING PENALTY: wall time with a `ThreadPoolExecutor(8)` over the
   GIL-released native builds equals serial wall time on one core (the
   pool adds no serialization; each call releases the GIL for its whole
   duration, so N real cores run N builds concurrently).

Together: on an N-core host, a B-pair bucket's build wall-clock is
B * per_pair / N — the number `_resolve_domain_mode`'s >=8-core gate uses.

Run SOLO (host-timing):  python scripts/bench_gcsh_build_scaling.py [n_bp]
"""
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
K, R = (12, 2) if N > 200_000 else (10, 2)

from astarpa_tpu import generate, native

assert native.available()
pairs = generate.generate_batch(8, N, 0.10, seed=17)
print(f"n={N} k={K} r={R}", flush=True)

# Warm (mmap, allocator).
native.DomainHandle(*pairs[0], k=K, r=R).close()


def build(ab):
    h = native.DomainHandle(ab[0], ab[1], k=K, r=R)
    h.close()


# 1. Work conservation: serial per-pair cost vs batch size.
for B in (1, 2, 4, 8):
    t0 = time.perf_counter()
    for ab in pairs[:B]:
        build(ab)
    dt = time.perf_counter() - t0
    print(f"serial B={B}: {dt:.3f}s total, {dt/B*1000:.1f} ms/pair",
          flush=True)

# 2. Thread-pool overhead on one core: should match serial B=8.
for workers in (2, 4, 8):
    t0 = time.perf_counter()
    with ThreadPoolExecutor(workers) as ex:
        list(ex.map(build, pairs))
    dt = time.perf_counter() - t0
    print(f"pool workers={workers} B=8: {dt:.3f}s total, "
          f"{dt/8*1000:.1f} ms/pair", flush=True)
