#!/usr/bin/env python
"""Benchmark: HTJ2K decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

The workload is config 1/2 territory from BASELINE.json: a committed
2048x1080 8-bit grayscale reversible-5/3 codestream produced by the
reference encoder (bench_data/gray_2048x1080_rev.j2c).  vs_baseline is
our decode MP/s divided by single-threaded ojph_expand MP/s measured
on this host (the reference publishes no numbers — BASELINE.md), or
null when the oracle binaries are absent.
"""
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
# Persistent XLA compile cache: keeps repeat bench runs out of the
# (slow, remote on axon) compiler.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(REPO, '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')
FIXTURE = os.path.join(REPO, 'bench_data', 'gray_2048x1080_rev.j2c')
ORACLE = os.path.join(REPO, '.oracle', 'bin', 'ojph_expand')
MP = 2048 * 1080 / 1e6


def bench_ours(data: bytes) -> float:
    import numpy as np
    from openjph_tpu import decode_tpu
    ref = np.load(os.path.join(REPO, 'bench_data', 'gray_2048x1080.npy'))
    planes = decode_tpu(data)  # warmup: compiles every kernel variant
    assert np.array_equal(planes[0], ref.astype(np.int32)), \
        'bench decode is not bit-exact'
    iters = 5
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            decode_tpu(data)
        best = min(best, (time.perf_counter() - t0) / iters)
    return MP / best


def bench_oracle() -> float:
    if not os.path.exists(ORACLE):
        return 0.0
    out = os.path.join(tempfile.mkdtemp(), 'out.pgm')
    best = float('inf')
    for _ in range(5):
        t0 = time.perf_counter()
        subprocess.run([ORACLE, '-i', FIXTURE, '-o', out],
                       check=True, capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return MP / best


def main():
    data = open(FIXTURE, 'rb').read()
    ours = bench_ours(data)
    base = bench_oracle()
    print(json.dumps({
        'metric': 'decode_throughput_2048x1080_gray_lossless',
        'value': round(ours, 2),
        'unit': 'MP/s',
        'vs_baseline': round(ours / base, 3) if base else None,
    }))


if __name__ == '__main__':
    sys.exit(main())
