#!/usr/bin/env python
"""Benchmark: sustained HTJ2K video decode throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Workload: an 8-frame 2048x1080 8-bit grayscale reversible-5/3
sequence (distinct per-frame content, synthesized deterministically
and encoded by this package; every decode is asserted bit-exact
against the source frames).  Decode runs through decode_tpu_batch —
the video path that batches same-geometry frames into one device
dispatch.  vs_baseline divides our MP/s by single-threaded
ojph_expand decoding the identical streams on this host (the
reference publishes no numbers — BASELINE.md), or null when the
oracle binaries are absent.
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
sys.path.insert(0, REPO)

ORACLE = os.path.join(REPO, '.oracle', 'bin', 'ojph_expand')
W, H, NFRAMES = 2048, 1080, 8
MP = W * H * NFRAMES / 1e6


def make_frames():
    """Distinct natural-ish frames: drifting 2D sines + film grain."""
    import numpy as np
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rng = np.random.RandomState(42)
    frames = []
    for k in range(NFRAMES):
        img = (127 + 60 * np.sin(xx / 97.0 + k * 0.8)
               * np.cos(yy / 83.0 - k * 0.35)
               + 40 * np.sin((xx + yy) / 211.0 + k)
               + rng.normal(0, 6, (H, W)))
        frames.append(np.clip(img, 0, 255).astype(np.int32))
    return frames


def bench_ours(frames, streams):
    import numpy as np
    from openjph_tpu import VideoDecoder
    vd = VideoDecoder()
    vd.submit(streams)               # warmup: compiles every variant
    outs = vd.collect()
    for k in range(NFRAMES):
        assert np.array_equal(outs[k][0], frames[k]), \
            f'frame {k} decode is not bit-exact'
    # sustained pipelined decode, 2 bursts in flight
    nburst = 5
    t0 = time.perf_counter()
    vd.submit(streams)
    vd.submit(streams)
    for _ in range(nburst - 2):
        vd.collect()
        vd.submit(streams)
    while vd.depth:
        vd.collect()
    dt = time.perf_counter() - t0
    return MP * nburst / dt


def bench_oracle(streams):
    if not os.path.exists(ORACLE):
        return 0.0
    tmp = tempfile.mkdtemp()
    paths = []
    for k, s in enumerate(streams):
        p = os.path.join(tmp, f'f{k}.j2c')
        open(p, 'wb').write(s)
        paths.append(p)
    out = os.path.join(tmp, 'out.pgm')
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for p in paths:
            subprocess.run([ORACLE, '-i', p, '-o', out],
                           check=True, capture_output=True)
        best = min(best, time.perf_counter() - t0)
    return MP / best


def main():
    from openjph_tpu import encode
    frames = make_frames()
    streams = [encode([f], bit_depth=8, reversible=True,
                      num_decomps=5, block_size=(64, 64))
               for f in frames]
    ours = bench_ours(frames, streams)
    base = bench_oracle(streams)
    print(json.dumps({
        'metric': 'decode_throughput_8x2048x1080_gray_lossless',
        'value': round(ours, 2),
        'unit': 'MP/s',
        'vs_baseline': round(ours / base, 3) if base else None,
    }))


if __name__ == '__main__':
    main()
