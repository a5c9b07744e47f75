#!/usr/bin/env python
"""Benchmark: sustained HTJ2K video decode into TPU device memory.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

Workload: 2048x1080 8-bit grayscale reversible-5/3 bursts (8 frames
each, distinct synthetic content, encoded by this package; decode
verified bit-exact against the source frames before timing).

What is measured — the TPU serving path: compressed bytes in, decoded
frames resident in HBM (`VideoDecoder(to_device=True)`), where an
on-device consumer (a model under jit) reads them.  The decoded
pixels never cross the host link; Tier-1, dequant, DWT synthesis and
sample conversion all run in one fused device graph per burst.

vs_baseline: the reference delivering frames to the same place.
ojph_expand decodes on the host (we time it, best of 3), then the raw
pixels must be uploaded to the device (we time `jax.device_put`,
best of 3).  The baseline is credited with PERFECT pipelining:
cost = max(decode, upload), not their sum.  The reference publishes
no throughput numbers of its own (BASELINE.md), so this measured
anchor is the baseline.  vs_baseline is null if the oracle binary is
absent.
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


def make_frames(nsets: int = 2):
    """Distinct natural-ish frames: drifting 2D sines + film grain.
    ``nsets`` independent bursts so successive uploads carry different
    bytes (no transport-level dedup of repeated buffers)."""
    import numpy as np
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    rng = np.random.RandomState(42)
    sets = []
    for s in range(nsets):
        frames = []
        for k in range(NFRAMES):
            t = s * NFRAMES + k
            img = (127 + 60 * np.sin(xx / 97.0 + t * 0.8)
                   * np.cos(yy / 83.0 - t * 0.35)
                   + 40 * np.sin((xx + yy) / 211.0 + t)
                   + rng.normal(0, 6, (H, W)))
            frames.append(np.clip(img, 0, 255).astype(np.int32))
        sets.append(frames)
    return sets


def bench_ours(frame_sets, stream_sets):
    import jax
    import numpy as np
    from openjph_tpu import VideoDecoder
    vd = VideoDecoder(to_device=True)
    # warmup compiles + bit-exactness check via an explicit host fetch
    vd.submit(stream_sets[0])
    outs = vd.collect_on_device()
    host = np.asarray(outs[0][0])
    for k in range(NFRAMES):
        assert np.array_equal(host[k], frame_sets[0][k]), \
            f'frame {k} decode is not bit-exact'
    # sustained decode into HBM, 2 bursts in flight, alternating
    # content; best of 3 runs — the axon tunnel's bandwidth is very
    # noisy and the oracle side below is also credited best-of-3
    nburst = 6
    best = 0.0
    for _ in range(3):
        last = None
        t0 = time.perf_counter()
        for i in range(2):
            vd.submit(stream_sets[i % len(stream_sets)])
        for i in range(nburst - 2):
            last = vd.collect_on_device()
            vd.submit(stream_sets[i % len(stream_sets)])
        while vd.depth:
            last = vd.collect_on_device()
        jax.block_until_ready(last)
        vd.drain_errors()
        dt = time.perf_counter() - t0
        best = max(best, MP * nburst / dt)
    return best


def bench_oracle(stream_sets, frame_sets):
    """max(host decode, upload) per burst -> MP/s, best of 3 each."""
    if not os.path.exists(ORACLE):
        return 0.0
    import jax
    import numpy as np
    streams = stream_sets[0]
    tmp = tempfile.mkdtemp()
    paths = []
    for k, s in enumerate(streams):
        p = os.path.join(tmp, f'f{k}.j2c')
        open(p, 'wb').write(s)
        paths.append(p)
    out = os.path.join(tmp, 'out.pgm')
    t_dec = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        for p in paths:
            subprocess.run([ORACLE, '-i', p, '-o', out],
                           check=True, capture_output=True)
        t_dec = min(t_dec, time.perf_counter() - t0)
    # upload of the decoded burst (distinct buffers per repeat) via
    # the best transport available to a real consumer: device_put,
    # blocked until the bytes are resident.  A warmup put first — the
    # link ramps (long-fat-pipe window growth) and the baseline should
    # be credited its steady-state bandwidth, like ours.
    warm = jax.device_put(np.zeros((NFRAMES, H, W), np.uint8))
    jax.block_until_ready(warm)
    t_up = float('inf')
    for r in range(3):
        burst = np.stack(
            [f.astype(np.uint8) + r for f in frame_sets[r % 2]])
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(burst))
        t_up = min(t_up, time.perf_counter() - t0)
    return MP / max(t_dec, t_up)


def main():
    from openjph_tpu import encode
    frame_sets = make_frames()
    stream_sets = [[encode([f], bit_depth=8, reversible=True,
                           num_decomps=5, block_size=(64, 64))
                    for f in frames] for frames in frame_sets]
    ours = bench_ours(frame_sets, stream_sets)
    base = bench_oracle(stream_sets, frame_sets)
    print(json.dumps({
        'metric': 'decode_to_hbm_8x2048x1080_gray_lossless',
        'value': round(ours, 2),
        'unit': 'MP/s',
        'vs_baseline': round(ours / base, 3) if base else None,
    }))


if __name__ == '__main__':
    main()
