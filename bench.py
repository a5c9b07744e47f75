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
pixels never cross the host link; raw segment bytes upload (exactly
the coded size — unstuffing runs on-device), and Tier-1, dequant,
DWT synthesis and sample conversion run in one fused device graph
per burst.

vs_baseline: the reference delivering frames to the same place —
ojph_expand decodes on the host, then the raw pixels move to the
device.  The baseline is credited with PERFECT pipelining
(cost = max(decode, upload), not the sum) and its upload is timed
with a forced device-side read (device_put's ready signal is
enqueue-only on tunneled backends).  The tunnel's bandwidth drifts
minute to minute, so ours and the baseline are measured in
INTERLEAVED rounds and the ratio is the median of per-round ratios;
the reported value is the median of our rounds.  The reference
publishes no throughput numbers of its own (BASELINE.md), so this
measured anchor is the baseline.  vs_baseline is null if the oracle
binary is absent.
"""
import json
import os
import statistics
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
NBURST = 8
ROUNDS = 6


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


def ours_once(vd, stream_sets):
    """One sustained-decode round (NBURST bursts, 2 in flight)."""
    import jax
    last = None
    t0 = time.perf_counter()
    for i in range(2):
        vd.submit(stream_sets[i % len(stream_sets)])
    for i in range(NBURST - 2):
        last = vd.collect_on_device()
        vd.submit(stream_sets[i % len(stream_sets)])
    while vd.depth:
        last = vd.collect_on_device()
    jax.block_until_ready(last)
    vd.drain_errors()
    return MP * NBURST / (time.perf_counter() - t0)


def oracle_once(paths, out, touch, frames, r):
    """One baseline round: host decode of the burst + honest upload
    (device-side sum forces the bytes across the link)."""
    import numpy as np
    t0 = time.perf_counter()
    for p in paths:
        subprocess.run([ORACLE, '-i', p, '-o', out],
                       check=True, capture_output=True)
    t_dec = time.perf_counter() - t0
    burst = np.stack([f.astype(np.uint8) + r for f in frames])
    # perfect pipelining credits the baseline a continuously-streaming
    # link (no slow-start after the decode gap): warm it, then time
    int(touch(np.frombuffer(os.urandom(4 << 20), np.uint8)))
    t0 = time.perf_counter()
    int(touch(burst))
    t_up = time.perf_counter() - t0
    if os.environ.get('OJTPU_BENCH_DEBUG'):
        print(f'  base r{r}: t_dec={t_dec*1e3:.0f}ms '
              f't_up={t_up*1e3:.0f}ms', file=sys.stderr)
    return MP / max(t_dec, t_up)


def main():
    import numpy as np
    from openjph_tpu import VideoDecoder, encode
    frame_sets = make_frames()
    stream_sets = [[encode([f], bit_depth=8, reversible=True,
                           num_decomps=5, block_size=(64, 64))
                    for f in frames] for frames in frame_sets]

    vd = VideoDecoder(to_device=True)
    # warmup compiles + bit-exactness check via an explicit host fetch
    vd.submit(stream_sets[0])
    outs = vd.collect_on_device()
    host = np.asarray(outs[0][0])
    for k in range(NFRAMES):
        assert np.array_equal(host[k], frame_sets[0][k]), \
            f'frame {k} decode is not bit-exact'

    have_oracle = os.path.exists(ORACLE)
    touch = paths = out = None
    if have_oracle:
        import jax
        import jax.numpy as jnp
        tmp = tempfile.mkdtemp()
        paths = []
        for k, s in enumerate(stream_sets[0]):
            p = os.path.join(tmp, f'f{k}.j2c')
            open(p, 'wb').write(s)
            paths.append(p)
        out = os.path.join(tmp, 'out.pgm')
        tsum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
        touch = lambda a: tsum(a)  # noqa: E731
        int(touch(np.zeros((NFRAMES, H, W), np.uint8)))  # warm

    ours, ratios = [], []
    for r in range(ROUNDS):
        o = ours_once(vd, stream_sets)
        if os.environ.get('OJTPU_BENCH_DEBUG'):
            print(f'  ours r{r}: {o:.1f} MP/s', file=sys.stderr)
        ours.append(o)
        if have_oracle:
            b = oracle_once(paths, out, touch, frame_sets[r % 2], r)
            ratios.append(o / b)
    print(json.dumps({
        'metric': 'decode_to_hbm_8x2048x1080_gray_lossless',
        'value': round(statistics.median(ours), 2),
        'unit': 'MP/s',
        'vs_baseline': round(statistics.median(ratios), 3)
        if ratios else None,
    }))


if __name__ == '__main__':
    main()
