#!/usr/bin/env python
"""Benchmark: sustained HTJ2K encode + decode on the TPU serving path.

Prints one JSON line PER METRIC — the headline serving metric
(decode_to_hbm_...) is printed LAST — and writes the full list to
BENCH_FULL.json:

  encode_8x2048x1080_gray_lossless     VideoEncoder burst path,
                                       frames in -> .j2c bytes out,
                                       vs ojph_compress on the same
                                       frames (BASELINE.md config 1/4
                                       shape; hooks ojph_compress.cpp:1222)
  decode_2048x1080_rgb_97_ict          BASELINE.md config 2: 9/7 lossy
                                       ICT RGB streams encoded by the
                                       reference itself, decoded to HBM,
                                       vs ojph_expand + upload
  decode_device_only_...               data-resident figure: coded
                                       words already in HBM, fused
                                       graph timed alone (kernel
                                       speed-of-light tracking)
  encode_device_only_...               frames already in HBM, encode
                                       graph timed alone
  decode_to_hbm_8x2048x1080_gray_lossless   the round-1 headline:
                                       compressed bytes in, decoded
                                       frames resident in HBM
                                       (VideoDecoder(to_device=True))
  wire_upload                          companion link measurement
                                       (fresh bytes host->HBM MB/s);
                                       the serving-encode bound on
                                       this rig

With OJTPU_BENCH_FULLCONFIGS=1, bench_configs_full() additionally
measures BASELINE configs 2-5 device-only in BOTH directions — RGB
9/7 ICT encode, 4K RGBA12 multi-tile decode+encode, 8K 16-bit 9/7
decode+encode, and the sharded 8192x8192 64-tile mosaic decode —
each against the oracle CLI running the identical job, recorded to
BENCH_CONFIGS.json.

vs_baseline: the reference doing the same job on this host
(ojph_expand/ojph_compress, timed the same interleaved way; decode
baselines are credited with PERFECT pipelining of decode and upload
— cost = max, not sum — with a forced device-side read).  The tunnel
bandwidth drifts minute to minute, so ours and the baseline run in
INTERLEAVED rounds and the ratio is the median of per-round ratios;
the reported value is the median of our rounds.  The reference
publishes no numbers of its own (BASELINE.md), so these measured
anchors are the baseline.  vs_baseline is null without the oracle.
"""
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
# Persistent XLA compile cache: keeps repeat bench runs out of the
# (slow, remote on axon) compiler.
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR',
                      os.path.join(REPO, '.jax_cache'))
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '0.5')
os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES', '-1')
sys.path.insert(0, REPO)

ORACLE_EXPAND = os.path.join(REPO, '.oracle', 'bin', 'ojph_expand')
ORACLE_COMPRESS = os.path.join(REPO, '.oracle', 'bin', 'ojph_compress')
W, H, NFRAMES = 2048, 1080, 8
MP = W * H * NFRAMES / 1e6
NBURST = 8
ROUNDS = 6
ROUNDS2 = 3 if not os.environ.get('OJTPU_BENCH_FAST') else 2
DBG = bool(os.environ.get('OJTPU_BENCH_DEBUG'))

_results = []


def _emit(metric, values, ratios, unit='MP/s', baseline=None,
          extra=None):
    """``baseline`` is the absolute reference figure (same unit) the
    ratios divide by — persisted so cross-round trends decompose into
    ours-vs-wire drift; ``extra`` merges free-form context keys."""
    rec = {'metric': metric,
           'value': round(statistics.median(values), 2),
           'unit': unit,
           'vs_baseline': round(statistics.median(ratios), 3)
           if ratios else None}
    if baseline is not None:
        rec['baseline_' + ('mps' if unit == 'MP/s' else unit.lower())] \
            = round(baseline, 2)
    if extra:
        rec.update(extra)
    _results.append(rec)
    print(json.dumps(rec), flush=True)


def _dbg(msg):
    if DBG:
        print(msg, file=sys.stderr)


def _wire_probe_up(tsum, nbytes):
    """Host->device MB/s on fresh bytes (no transport dedup)."""
    buf = np.frombuffer(os.urandom(nbytes), np.uint8)
    t0 = time.perf_counter()
    int(tsum(buf))
    return nbytes / 1e6 / (time.perf_counter() - t0)


def _wire_probe_down(nbytes):
    """Device->host MB/s on a freshly-uploaded buffer (distinct
    content per call so no layer can dedup the fetch)."""
    import jax
    darr = jax.device_put(np.frombuffer(os.urandom(nbytes), np.uint8))
    jax.block_until_ready(darr)
    t0 = time.perf_counter()
    np.asarray(darr)
    return nbytes / 1e6 / (time.perf_counter() - t0)


def make_frames(nsets: int = 2, rgb: bool = False):
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
            g = np.clip(img, 0, 255).astype(np.int32)
            if rgb:
                r = np.clip(img + 25 * np.sin(yy / 50.0 + t), 0,
                            255).astype(np.int32)
                b = np.clip(img - 20 * np.cos(xx / 61.0 - t), 0,
                            255).astype(np.int32)
                frames.append(np.stack([r, g, b], axis=-1))
            else:
                frames.append(g)
        sets.append(frames)
    return sets


def _write_pgm(path, img):
    import numpy as np
    with open(path, 'wb') as f:
        f.write(b'P5\n%d %d\n255\n' % (img.shape[1], img.shape[0]))
        f.write(img.astype(np.uint8).tobytes())


def _write_ppm(path, img):
    import numpy as np
    with open(path, 'wb') as f:
        f.write(b'P6\n%d %d\n255\n' % (img.shape[1], img.shape[0]))
        f.write(img.astype(np.uint8).tobytes())


# ---------------------------------------------------------------------------
# decode to HBM (headline) + its device-only variant
# ---------------------------------------------------------------------------

def ours_decode_once(vd, stream_sets, depth: int = 3):
    """One sustained-decode round (NBURST bursts, ``depth`` in
    flight: 3 measured ~3% over 2 — deep enough to hide prep, shallow
    enough not to thrash the single-channel tunnel)."""
    import jax
    last = None
    t0 = time.perf_counter()
    for i in range(depth):
        vd.submit(stream_sets[i % len(stream_sets)])
    for i in range(NBURST - depth):
        last = vd.collect_on_device()
        vd.submit(stream_sets[(i + depth) % len(stream_sets)])
    while vd.depth:
        last = vd.collect_on_device()
    jax.block_until_ready(last)
    vd.drain_errors()
    return MP * NBURST / (time.perf_counter() - t0)


def oracle_decode_once(paths, out, touch, frames, r):
    """One baseline round: host decode of the burst + honest upload
    (device-side sum forces the bytes across the link)."""
    import numpy as np
    t0 = time.perf_counter()
    for p in paths:
        subprocess.run([ORACLE_EXPAND, '-i', p, '-o', out],
                       check=True, capture_output=True)
    t_dec = time.perf_counter() - t0
    burst = np.stack([np.asarray(f, np.uint8).reshape(H, -1) + r
                      for f in frames])
    # perfect pipelining credits the baseline a continuously-streaming
    # link (no slow-start after the decode gap): warm it, then time
    int(touch(np.frombuffer(os.urandom(4 << 20), np.uint8)))
    t0 = time.perf_counter()
    int(touch(burst))
    t_up = time.perf_counter() - t0
    _dbg(f'  base r{r}: t_dec={t_dec*1e3:.0f}ms t_up={t_up*1e3:.0f}ms')
    return MP / max(t_dec, t_up), t_dec


def _oracle_stage(stream_sets):
    """Write one burst's streams to files; return (paths, out, touch)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    tmp = tempfile.mkdtemp()
    paths = []
    for k, s in enumerate(stream_sets[0]):
        p = os.path.join(tmp, f'f{k}.j2c')
        open(p, 'wb').write(s)
        paths.append(p)
    out = os.path.join(tmp, 'out.pgm')
    tsum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    touch = lambda a: tsum(a)  # noqa: E731
    int(touch(np.zeros((4 << 20,), np.uint8)))  # warm/compile
    return paths, out, touch


def bench_decode_gray(stream_sets, frame_sets):
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

    have_oracle = os.path.exists(ORACLE_EXPAND)
    if have_oracle:
        paths, out, touch = _oracle_stage(stream_sets)

    # decode-direction wire companion (round-5 demand): the serving
    # decode uploads the coded words (+ meta) and downloads nothing
    # (to_device=True), so the in-round bound is coded-bytes-up at
    # the measured link rate
    import jax
    import jax.numpy as jnp
    tsum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    int(tsum(np.zeros((1 << 20,), np.uint8)))
    bytes_up = int(sum(len(x) for x in stream_sets[0]) * 1.10)

    ours, ratios, base_decs, bases = [], [], [], []
    wire_up, bound = [], []
    for r in range(ROUNDS):
        o = ours_decode_once(vd, stream_sets)
        _dbg(f'  ours r{r}: {o:.1f} MP/s')
        ours.append(o)
        up = _wire_probe_up(tsum, bytes_up)
        wire_up.append(up)
        bound.append(MP / (bytes_up / 1e6 / up))
        _dbg(f'  wire r{r}: {up:.1f} MB/s up -> bound '
             f'{bound[-1]:.1f} MP/s')
        if have_oracle:
            b, t_dec = oracle_decode_once(paths, out, touch,
                                          frame_sets[r % 2], r)
            ratios.append(o / b)
            bases.append(b)
            base_decs.append(MP / t_dec)
    wire = {'up': wire_up, 'bound': bound, 'bytes_up_per_burst': bytes_up}
    return (ours, ratios,
            statistics.median(base_decs) if base_decs else None,
            statistics.median(bases) if bases else None, wire)


def _timed_device_rounds(runner_call, n_work: int, mp, label,
                         reps: int = 4):
    """Time ROUNDS2 rounds of ``reps`` device dispatches without EVER
    re-timing work the tunnel has seen: the tunnel backend dedups a
    repeated (executable, resident-args) execution, and its
    jax.block_until_ready is asynchronous, so every timed dispatch
    must be a DISTINCT work item and every rep's (small) result plane
    must be fetched inside the timed window.  ``runner_call(w)``
    dispatches work item w (0 is the warm-up, never re-timed) and
    returns a jax array whose fetch forces completion.  Requires
    n_work >= 1 + ROUNDS2 * reps."""
    import numpy as np
    assert n_work >= 1 + ROUNDS2 * reps, \
        f'{label}: need {1 + ROUNDS2 * reps} distinct bursts, ' \
        f'got {n_work}'
    np.asarray(runner_call(0))          # compile + warm + real sync
    vals = []
    for r in range(ROUNDS2):
        t0 = time.perf_counter()
        outs = [runner_call(1 + r * reps + i)
                for i in range(reps)]
        # ONE sync: the device executes dispatches in order, so
        # fetching the LAST rep's (small) result plane forces every
        # rep in the round; fetching all reps would add reps x the
        # tunnel's ~25 ms d2h latency to a device-only measurement
        np.asarray(outs[-1])
        vals.append(mp * reps / (time.perf_counter() - t0))
        _dbg(f'  {label} r{r}: {vals[-1]:.1f} MP/s')
    return vals


def bench_decode_device_only(stream_sets, base_dec_mps):
    """Data-resident decode: coded words already in HBM; the fused
    graph (on-device unstuff -> Tier-1 -> dequant -> DWT -> color) is
    timed alone.  Baseline = ojph_expand's host decode alone."""
    import jax
    import numpy as np
    from openjph_tpu.tpu.pipeline import (TpuDecoder, _build_plan,
                                          _make_runner, _pack,
                                          _pack_auto)
    packed = []
    pairs_sets = []
    for streams in stream_sets:
        decs = [TpuDecoder(s) for s in streams]
        plans = [_build_plan(d) for d in decs]
        assert all(p is not None for p in plans)
        pairs = list(zip(decs, plans))
        pairs_sets.append(pairs)
        packed.append(_pack_auto(pairs))
    # ONE runner serves every set, so every set's plan must agree on
    # the static stream layout (content-dependent word caps could in
    # principle differ across noise variants)
    key0 = pairs_sets[0][0][1].key
    assert all(p.key == key0 for pairs in pairs_sets
               for _, p in pairs), \
        'bench stream sets disagree on plan key; per-set runners needed'
    # ...and on the pack mode: differing unstuff K buckets take the
    # max (always correct, marginally slower); any dense-fallback set
    # forces dense for all
    modes = {m for m, _ in packed}
    if 0 in modes:
        mode = 0
        packed = [(0, _pack(pairs)) for pairs in pairs_sets]
    else:
        mode = max(modes)
    runner = _make_runner(pairs_sets[0][0][1], NFRAMES,
                          device_unstuff=mode)
    dargs_sets = [tuple(jax.device_put(a) for a in args)
                  for _, args in packed]
    vals = _timed_device_rounds(
        lambda w: runner(*dargs_sets[w])[0],   # err plane -> sync
        len(dargs_sets), MP, 'dev-only dec')
    ratios = [v / base_dec_mps for v in vals] if base_dec_mps else []
    return vals, ratios


# ---------------------------------------------------------------------------
# encode (VideoEncoder burst path) + device-only variant
# ---------------------------------------------------------------------------

def bench_encode_gray(frame_sets, stream_sets):
    import numpy as np
    from openjph_tpu import VideoEncoder, decode
    kw = dict(bit_depth=8, reversible=True, num_decomps=5,
              block_size=(64, 64))
    ve = VideoEncoder(**kw)
    ve.submit(frame_sets[0])
    streams = ve.collect()  # warm compile
    got = decode(streams[0])[0]
    assert np.array_equal(got, frame_sets[0][0]), \
        'encode round-trip is not bit-exact'

    have_oracle = os.path.exists(ORACLE_COMPRESS)
    if have_oracle:
        tmp = tempfile.mkdtemp()
        pgms = []
        for k, f in enumerate(frame_sets[0]):
            p = os.path.join(tmp, f'f{k}.pgm')
            _write_pgm(p, f)
            pgms.append(p)
        out_j2c = os.path.join(tmp, 'out.j2c')

    def ours_once():
        t0 = time.perf_counter()
        for i in range(2):
            ve.submit(frame_sets[i % len(frame_sets)])
        for i in range(NBURST - 2):
            ve.collect()
            ve.submit(frame_sets[i % len(frame_sets)])
        while ve.depth:
            ve.collect()
        return MP * NBURST / (time.perf_counter() - t0)

    def base_once():
        t0 = time.perf_counter()
        for p in pgms:
            subprocess.run(
                [ORACLE_COMPRESS, '-i', p, '-o', out_j2c,
                 '-reversible', 'true', '-num_decomps', '5'],
                check=True, capture_output=True)
        return MP / (time.perf_counter() - t0)

    # wire companions, BOTH directions, in the SAME rounds: the
    # serving-encode round trip is pixels up + coded words down, so
    # the in-round bound = MP / (t_up + t_down) (serialized) and
    # MP / max(t_up, t_down) (perfect duplex overlap; the 2-worker io
    # pipeline approaches this).  Measuring the link next to each
    # round makes the ratio self-explaining against tunnel drift.
    import jax
    import jax.numpy as jnp
    tsum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    bytes_per_burst = W * H * NFRAMES       # uint8 upload dtype
    # coded words down per burst ~= the streams' coded bytes (+~8%
    # chunk padding in the dense fetch)
    bytes_down = int(sum(len(x) for x in stream_sets[0]) * 1.08)
    int(tsum(np.zeros((1 << 20,), np.uint8)))   # warm/compile
    _wire_probe_down(1 << 20)                   # warm

    ours, ratios, bases = [], [], []
    wire_up, wire_down, bound_ser, bound_dup = [], [], [], []
    for r in range(ROUNDS2):
        o = ours_once()
        _dbg(f'  ours enc r{r}: {o:.1f} MP/s')
        ours.append(o)
        up = _wire_probe_up(tsum, bytes_per_burst)
        down = _wire_probe_down(bytes_down)
        wire_up.append(up)
        wire_down.append(down)
        t_up = bytes_per_burst / 1e6 / up
        t_down = bytes_down / 1e6 / down
        bound_ser.append(MP / (t_up + t_down))
        bound_dup.append(MP / max(t_up, t_down))
        _dbg(f'  wire r{r}: {up:.1f} MB/s up, {down:.1f} MB/s down '
             f'-> bound {bound_ser[-1]:.1f}..{bound_dup[-1]:.1f} MP/s')
        if have_oracle:
            b = base_once()
            _dbg(f'  base enc r{r}: {b:.1f} MP/s')
            ratios.append(o / b)
            bases.append(b)
    wire = {'up': wire_up, 'down': wire_down,
            'bound_serialized': bound_ser, 'bound_duplex': bound_dup,
            'bytes_down_per_burst': bytes_down}
    return (ours, ratios,
            statistics.median(bases) if bases else None,
            wire, bytes_per_burst)


def bench_encode_device_only(frame_sets, base_enc_mps):
    """Frames already in HBM; the fused encode graph (conversion ->
    DWT -> quant -> HT cleanup coder + dense pack) timed alone."""
    import jax
    import numpy as np
    from openjph_tpu.codec import build_encoder, normalize_planes
    from openjph_tpu.tpu.encode_pipeline import (TpuEncoder,
                                                 _narrow_tile_plane)
    from openjph_tpu.core.geometry import build_tile, build_tile_grid
    enc = build_encoder((H, W), 1, encoder_cls=TpuEncoder, bit_depth=8,
                        reversible=True, num_decomps=5,
                        block_size=(64, 64))
    trs = build_tile_grid(enc.siz)
    geom = build_tile(enc.hdr, 0, trs[0])
    plan = enc._build_enc_plan(geom)
    if plan is None:
        return [], []
    runner = enc._make_enc_runner(plan, NFRAMES)
    # distinct burst per rep + await every output: the tunnel backend
    # dedups repeated identical executions (see bench_decode_device_only)
    dstacks = [jax.device_put(np.stack(
        [_narrow_tile_plane(enc.siz, geom, 0, normalize_planes(f)[0])
         for f in frames])) for frames in frame_sets]
    vals = _timed_device_rounds(
        lambda w: runner(dstacks[w])[1],   # aux plane -> sync
        len(dstacks), MP, 'dev-only enc')
    ratios = [v / base_enc_mps for v in vals] if base_enc_mps else []
    return vals, ratios


# ---------------------------------------------------------------------------
# config 2: 2048x1080 RGB 9/7 ICT lossy decode (reference-encoded)
# ---------------------------------------------------------------------------

def bench_decode_rgb97(rgb_sets):
    import numpy as np
    from openjph_tpu import VideoDecoder
    if not os.path.exists(ORACLE_COMPRESS):
        return None
    tmp = tempfile.mkdtemp()
    stream_sets = []
    ppm0 = []
    for si, frames in enumerate(rgb_sets):
        streams = []
        for k, f in enumerate(frames):
            ppm = os.path.join(tmp, f'r{si}_{k}.ppm')
            _write_ppm(ppm, f)
            j2c = os.path.join(tmp, f'r{si}_{k}.j2c')
            subprocess.run(
                [ORACLE_COMPRESS, '-i', ppm, '-o', j2c,
                 '-qstep', '0.002', '-num_decomps', '5'],
                check=True, capture_output=True)
            streams.append(open(j2c, 'rb').read())
            if si == 0:
                ppm0.append(j2c)
        stream_sets.append(streams)

    vd = VideoDecoder(to_device=True)
    vd.submit(stream_sets[0])
    outs = vd.collect_on_device()
    # quality check vs the reference decoder (PAE <= 1 on the float
    # 9/7 path; the encode was PSNR-matched by construction: same
    # stream)
    out_ppm = os.path.join(tmp, 'chk.ppm')
    subprocess.run([ORACLE_EXPAND, '-i', ppm0[0], '-o', out_ppm],
                   check=True, capture_output=True)
    raw = open(out_ppm, 'rb').read()
    hdr_end = raw.index(b'255\n') + 4
    ref = np.frombuffer(raw[hdr_end:], np.uint8).reshape(H, W, 3)
    got = np.stack([np.asarray(outs[0][c])[0] for c in range(3)],
                   axis=-1)
    pae = int(np.abs(got.astype(np.int32)
                     - ref.astype(np.int32)).max())
    assert pae <= 1, f'9/7 decode PAE vs reference = {pae}'

    import jax
    import jax.numpy as jnp
    tsum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    touch = lambda a: int(tsum(a))  # noqa: E731
    touch(np.zeros((4 << 20,), np.uint8))
    out = os.path.join(tmp, 'out.ppm')

    ours, ratios, bases = [], [], []
    for r in range(ROUNDS2):
        o = ours_decode_once(vd, stream_sets)
        _dbg(f'  ours rgb r{r}: {o:.1f} MP/s')
        ours.append(o)
        t0 = time.perf_counter()
        for p in ppm0:
            subprocess.run([ORACLE_EXPAND, '-i', p, '-o', out],
                           check=True, capture_output=True)
        t_dec = time.perf_counter() - t0
        burst = np.stack([f.astype(np.uint8) + r for f in rgb_sets[0]])
        touch(np.frombuffer(os.urandom(4 << 20), np.uint8))
        t0 = time.perf_counter()
        touch(burst)
        t_up = time.perf_counter() - t0
        b = MP / max(t_dec, t_up)
        _dbg(f'  base rgb r{r}: {b:.1f} MP/s '
             f'(dec {t_dec*1e3:.0f}ms up {t_up*1e3:.0f}ms)')
        ratios.append(o / b)
        bases.append(b)
    return ours, ratios, statistics.median(bases)


def _oracle_rounds(cmd, mp, rounds=None):
    """Time ``rounds`` runs of an oracle CLI command; MP/s each."""
    vals = []
    for _ in range(ROUNDS2 if rounds is None else rounds):
        t0 = time.perf_counter()
        subprocess.run(cmd, check=True, capture_output=True)
        vals.append(mp / (time.perf_counter() - t0))
    return vals


def _timed_decode_streams(streams, mp, metric, base_cmd=None, reps=2):
    """Device-only decode timing over DISTINCT self-encoded streams;
    optional oracle baseline command run in adjacent rounds (the
    tunnel does not touch the host-only baseline, so interleaving
    buys nothing here)."""
    import jax
    from openjph_tpu.tpu.pipeline import (TpuDecoder, _build_plan,
                                          _make_runner, _pack,
                                          _pack_auto)
    packed = []
    pairs_l = []
    for stream in streams:
        dec = TpuDecoder(stream)
        plan = _build_plan(dec)
        if plan is None:
            print(f'{metric}: stream not fused-path eligible',
                  file=sys.stderr)
            return
        pairs_l.append([(dec, plan)])
        packed.append(_pack_auto(pairs_l[-1]))
    key0 = pairs_l[0][0][1].key
    assert all(p.key == key0 for pl_ in pairs_l
               for _, p in pl_), \
        'variant streams disagree on plan key'
    modes = {m for m, _ in packed}
    if 0 in modes:
        mode = 0
        packed = [(0, _pack(p)) for p in pairs_l]
    else:
        mode = max(modes)
    runner = _make_runner(pairs_l[0][0][1], 1,
                          device_unstuff=mode)
    dargs_sets = [tuple(jax.device_put(a) for a in args)
                  for _, args in packed]
    vals = _timed_device_rounds(
        lambda w: runner(*dargs_sets[w])[0],
        len(dargs_sets), mp, metric, reps=reps)
    ratios, base = [], None
    if base_cmd is not None:
        bases = _oracle_rounds(base_cmd, mp, rounds=len(vals))
        ratios = [v / b for v, b in zip(vals, bases)]
        base = statistics.median(bases)
    _emit(metric, vals, ratios, baseline=base)


def _timed_encode_device_only(burst_sets, mp, metric, enc_kwargs,
                              base_cmd=None, base_mp=None, reps=2):
    """Device-only encode timing: each DISTINCT work item is a burst
    of same-shape frames; per tile-geometry class the (frame, tile)
    pairs batch on the fused encode runner's frame axis.  Inputs are
    device-resident before timing and only the runner dispatches
    (conversion -> MCT -> DWT -> quant -> Tier-1 + dense pack) are
    timed.  Optional oracle = ojph_compress on the same content
    (ojph_compress.cpp:1222's own timing hook runs the identical
    job).  ``burst_sets``: list of work items, each a list of frames,
    each frame a list of per-component planes.  ``mp`` = megapixels
    per work item (all frames)."""
    import jax
    from openjph_tpu.codec import build_encoder
    from openjph_tpu.core.geometry import build_tile, build_tile_grid
    from openjph_tpu.tpu.encode_pipeline import (TpuEncoder,
                                                 _narrow_tile_plane)
    nc = len(burst_sets[0][0])
    nframes = len(burst_sets[0])
    shape = burst_sets[0][0][0].shape
    enc = build_encoder(shape, nc, encoder_cls=TpuEncoder,
                        **enc_kwargs)
    trs = build_tile_grid(enc.siz)
    geoms = [build_tile(enc.hdr, i, tr) for i, tr in enumerate(trs)]
    plans = [enc._build_enc_plan(g) for g in geoms]
    if any(p is None for p in plans):
        print(f'{metric}: not fused-encode eligible', file=sys.stderr)
        return
    classes, by_key = [], {}
    for ti, p in enumerate(plans):
        cls = by_key.get(p.key)
        if cls is None:
            cls = {'plan': p, 'tiles': []}
            by_key[p.key] = cls
            classes.append(cls)
        cls['tiles'].append(ti)
    runners = [enc._make_enc_runner(c['plan'],
                                    nframes * len(c['tiles']))
               for c in classes]
    work = []
    for frames in burst_sets:
        assert len(frames) == nframes
        dsets = []
        for cls in classes:
            dsets.append([jax.device_put(np.stack(
                [_narrow_tile_plane(enc.siz, geoms[ti], c, fr[c])
                 for fr in frames for ti in cls['tiles']]))
                for c in range(nc)])
        work.append(dsets)

    def call(w):
        aux = None
        for ci, stacks in enumerate(work[w]):
            aux = runners[ci](*stacks)[1]
        return aux      # device executes in dispatch order: fetching
        # the LAST class's aux plane forces the whole work item

    vals = _timed_device_rounds(call, len(work), mp, metric,
                                reps=reps)
    ratios, base = [], None
    if base_cmd is not None:
        # base_mp: megapixels of ONE oracle run (the oracle encodes a
        # single frame per invocation; burst items may hold several)
        bases = _oracle_rounds(base_cmd, base_mp or mp,
                               rounds=len(vals))
        ratios = [v / b for v, b in zip(vals, bases)]
        base = statistics.median(bases)
    _emit(metric, vals, ratios, baseline=base)


def _mosaic_device_only(n_work):
    """BASELINE config 5 (the mosaic): decode of an 8192x8192 gray
    64-tile (1024x1024) codestream with the tiles batched on the
    sharded MosaicDecoder's frame axis — ONE device dispatch for the
    whole mosaic, device-compute-only, distinct mosaics per rep.
    Oracle = ojph_expand decoding the identical multi-tile stream
    (tile loop: ojph_codestream_local.cpp:912-1115)."""
    import jax
    from openjph_tpu.parallel.tiles import MosaicEncoder, MosaicDecoder
    from openjph_tpu.tpu.pipeline import _bucket, _pack
    HM = WM = 8192
    mp = HM * WM / 1e6
    yy, xx = np.mgrid[0:HM, 0:WM].astype(np.float32)
    rng = np.random.RandomState(11)
    menc = MosaicEncoder(bit_depth=8, reversible=True, num_decomps=5,
                         tile_size=(1024, 1024))
    mosaics = []
    for v in range(n_work):
        img = np.clip(127 + 90 * np.sin(xx / 151.0 + v)
                      * np.cos(yy / 117.0 - v)
                      + rng.normal(0, 8, (HM, WM)), 0,
                      255).astype(np.int32)
        mosaics.append(menc.encode([img]))
        _dbg(f'  mosaic {v}: {len(mosaics[-1])/1e6:.1f} MB coded')
    mds = [MosaicDecoder(m) for m in mosaics]
    assert all(len(md.classes) == 1 for md in mds), \
        'uniform 8192/1024 grid must form one geometry class'
    # unify dense word buckets ACROSS mosaics so one traced runner
    # serves every variant (same unification MosaicDecoder applies
    # within a stream, lifted over the variant axis)
    all_plans = [p for md in mds for p in md.tile_plans.values()]
    g0 = mds[0].classes[0]['plan'].groups
    wmax = [tuple(max(p.groups[i].words[j] for p in all_plans)
                  for j in range(3)) for i in range(len(g0))]
    rmax = [tuple(max(p.groups[i].rwords[j] for p in all_plans)
                  for j in range(2)) for i in range(len(g0))]
    for p in all_plans:
        for i, g in enumerate(p.groups):
            g.words, g.rwords = wmax[i], rmax[i]
        p.key = (tuple((g.gid, g.w, g.h, g.n_pad, g.words, g.rwords)
                       for g in p.groups),) + p.key[1:]
    plan0 = mds[0].classes[0]['plan']
    tiles0 = mds[0].classes[0]['tiles']
    F = max(_bucket(len(tiles0), lo=8), mds[0].ndev)
    runner = mds[0]._runner(plan0.key, F)
    dargs = []
    for md in mds:
        tiles = md.classes[0]['tiles']
        args = _pack([(md.dec, md.tile_plans[ti]) for ti in tiles]
                     + [(md.dec, md.tile_plans[tiles[0]])]
                     * (F - len(tiles)))
        dargs.append(tuple(jax.device_put(a) for a in args))
    vals = _timed_device_rounds(
        lambda w: runner(*dargs[w])[0],
        len(dargs), mp, 'mosaic dec', reps=max(1, (n_work - 1)
                                               // ROUNDS2))
    tmp = tempfile.mkdtemp()
    mpath = os.path.join(tmp, 'mosaic.j2c')
    open(mpath, 'wb').write(mosaics[0])
    out = os.path.join(tmp, 'out.pgm')
    bases = _oracle_rounds([ORACLE_EXPAND, '-i', mpath, '-o', out],
                           mp, rounds=len(vals))
    ratios = [v / b for v, b in zip(vals, bases)]
    _emit('decode_device_only_mosaic_8k_64tile', vals, ratios,
          baseline=statistics.median(bases),
          extra={'tiles': len(tiles0),
                 'tiles_per_s': round(
                     statistics.median(vals) / mp * len(tiles0), 1)})


def bench_mosaic_16k_device(n_work):
    """Round-5 demand: a device-backed >8K mosaic figure.  16384x16384
    gray, 256 tiles of 1024x1024, ingested tile-by-tile
    (encode_chunked) and decoded through the sub-batched streaming
    machinery (_run_classes, batch_tiles=64) on the REAL chip —
    host prep + upload + sharded dispatch per sub-batch inside the
    timed window, decoded tiles left DEVICE-RESIDENT (sink mode
    'device-resident': the per-sub-batch comps arrays are forced via
    the error-plane fetch and dropped; the pixel drain to host is the
    tunnel's business, not the codec's).  Oracle = ojph_expand on the
    identical multi-tile stream."""
    import jax
    from openjph_tpu.parallel.tiles import MosaicEncoder, MosaicDecoder
    HM = WM = 16384
    TILE = 1024
    mp = HM * WM / 1e6

    def tile_content(v, y0, x0, h, w):
        yy = np.arange(y0, y0 + h, dtype=np.float32)[:, None]
        xx = np.arange(x0, x0 + w, dtype=np.float32)[None, :]
        img = (127 + 90 * np.sin(xx / 151.0 + v)
               * np.cos(yy / 117.0 - v)
               + 17 * np.sin((xx + yy) / 53.0))
        return np.clip(img, 0, 255).astype(np.int32)

    menc = MosaicEncoder(bit_depth=8, reversible=True, num_decomps=5,
                         tile_size=(TILE, TILE), batch_tiles=64)
    streams = []
    for v in range(n_work):
        def reader(ti, geom, v=v):
            r = geom.comps[0].rect
            return [tile_content(v, r.y0, r.x0, r.h, r.w)]
        streams.append(menc.encode_chunked(reader, (HM, WM),
                                           num_comps=1))
        _dbg(f'  16k mosaic {v}: {len(streams[-1])/1e6:.1f} MB coded')
    mds = [MosaicDecoder(s, batch_tiles=64) for s in streams]
    ntiles = len(mds[0].dec.tiles)

    def call(w):
        errs = None
        for _tiles, _comps, errs in mds[w]._run_classes():
            pass
        return errs   # small fetch forces every dispatched sub-batch

    vals = _timed_device_rounds(call, len(mds), mp, '16k mosaic dec',
                                reps=1)
    tmp = tempfile.mkdtemp()
    mpath = os.path.join(tmp, 'm16k.j2c')
    open(mpath, 'wb').write(streams[0])
    out = os.path.join(tmp, 'out.pgm')
    bases = _oracle_rounds([ORACLE_EXPAND, '-i', mpath, '-o', out],
                           mp, rounds=len(vals))
    ratios = [v / b for v, b in zip(vals, bases)]
    _emit('decode_to_device_mosaic_16k_256tile', vals, ratios,
          baseline=statistics.median(bases),
          extra={'tiles': ntiles, 'sink': 'device-resident',
                 'batch_tiles': 64,
                 'tiles_per_s': round(
                     statistics.median(vals) / mp * ntiles, 1)})


def bench_configs_full():
    """BASELINE configs 2-5, both directions, device-compute-only,
    each with its oracle baseline on the same content:

      config 2: 2048x1080 RGB 9/7 ICT         encode (decode is the
                                              serving bench's rgb row)
      config 3: 4K 12-bit RGBA lossless,      decode + encode
                1024x1024 tiles
      config 4: 8K 16-bit 9/7 frame           decode + encode
      config 5: 8192x8192 64-tile mosaic      decode (sharded
                                              MosaicDecoder)

    Streams are self-encoded; all fused graphs are timed HBM->HBM
    with DISTINCT inputs per rep (the tunnel backend dedups repeated
    identical executions)."""
    from openjph_tpu import encode
    from openjph_tpu.utils.imageio import write_tiff
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:2160, 0:4096].astype(np.float32)
    n_work = 1 + ROUNDS2 * 2

    def variants(n=n_work):
        return [(2048 + 1500 * np.sin(xx / 131.0 + v)
                 * np.cos(yy / 97.0 - v)
                 + rng.normal(0, 40, (2160, 4096))) for v in range(n)]

    tmp = tempfile.mkdtemp()
    bases = variants()

    # ---- config 2: 2048x1080 RGB 9/7 ICT, encode direction (each
    # work item is an 8-frame burst; oracle encodes 1 frame/run) ----
    rgb_sets = make_frames(nsets=n_work, rgb=True)
    ppm2 = os.path.join(tmp, 'c2.ppm')
    _write_ppm(ppm2, rgb_sets[0][0])
    _timed_encode_device_only(
        [[[np.ascontiguousarray(f[..., c]) for c in range(3)]
          for f in frames] for frames in rgb_sets],
        MP, 'encode_device_only_2k_rgb_97_ict',
        dict(bit_depth=8, reversible=False, base_delta=0.002,
             num_decomps=5),
        base_cmd=[ORACLE_COMPRESS, '-i', ppm2,
                  '-o', os.path.join(tmp, 'c2.j2c'),
                  '-qstep', '0.002', '-num_decomps', '5'],
        base_mp=W * H / 1e6)

    # ---- config 3: 4K RGBA 12-bit lossless, 1024x1024 tiles ----
    planes3 = [[np.clip(b + c * 97, 0, 4095).astype(np.int32)
                for c in range(4)] for b in bases]
    s3s = [encode(p, bit_depth=12, reversible=True, num_decomps=5,
                  tile_size=(1024, 1024)) for p in planes3]
    p3 = os.path.join(tmp, 'c3.j2c')
    open(p3, 'wb').write(s3s[0])
    _timed_decode_streams(
        s3s, 4096 * 2160 / 1e6, 'decode_device_only_4k_rgba12_tiles',
        base_cmd=[ORACLE_EXPAND, '-i', p3,
                  '-o', os.path.join(tmp, 'c3out.tif')])
    # oracle reads 12-in-16 TIFF samples MSB-aligned (tif_in shifts
    # them down to the requested -bit_depth)
    tif3 = os.path.join(tmp, 'c3.tif')
    write_tiff(tif3, (np.stack(planes3[0], axis=-1)
                      .astype(np.uint16) << 4))
    _timed_encode_device_only(
        [[p] for p in planes3],
        4096 * 2160 / 1e6, 'encode_device_only_4k_rgba12_tiles',
        dict(bit_depth=12, reversible=True, num_decomps=5,
             tile_size=(1024, 1024)),
        base_cmd=[ORACLE_COMPRESS, '-i', tif3,
                  '-o', os.path.join(tmp, 'c3b.j2c'),
                  '-bit_depth', '12', '-reversible', 'true',
                  '-num_decomps', '5', '-tile_size', '{1024,1024}'])

    # ---- config 4: 8K 16-bit 9/7 lossy frame (delta keeps Kmax on
    # the 32-bit fused path) ----
    planes4 = [[np.clip(np.kron(b, np.ones((2, 2))) * 16, 0,
                        65535).astype(np.int32)] for b in bases]
    s4s = [encode(p, bit_depth=16, reversible=False,
                  base_delta=0.25, num_decomps=5) for p in planes4]
    p4 = os.path.join(tmp, 'c4.j2c')
    open(p4, 'wb').write(s4s[0])
    _timed_decode_streams(
        s4s, 8192 * 4320 / 1e6, 'decode_device_only_8k_16bit_97',
        base_cmd=[ORACLE_EXPAND, '-i', p4,
                  '-o', os.path.join(tmp, 'c4out.pgm')])
    pgm4 = os.path.join(tmp, 'c4.pgm')
    with open(pgm4, 'wb') as f:
        f.write(b'P5\n8192 4320\n65535\n')
        f.write(planes4[0][0].astype('>u2').tobytes())
    _timed_encode_device_only(
        [[p] for p in planes4],
        8192 * 4320 / 1e6, 'encode_device_only_8k_16bit_97',
        dict(bit_depth=16, reversible=False, base_delta=0.25,
             num_decomps=5),
        base_cmd=[ORACLE_COMPRESS, '-i', pgm4,
                  '-o', os.path.join(tmp, 'c4b.j2c'),
                  '-qstep', '0.25', '-num_decomps', '5'])

    # ---- config 5: the mosaic ----
    _mosaic_device_only(n_work)
    # ...and the >8K device-backed row (round-5 demand): 16K**2
    # through the sub-batched streaming machinery on the chip
    bench_mosaic_16k_device(1 + ROUNDS2)


def main():
    from openjph_tpu import encode
    # 1 + ROUNDS2*4 distinct sets: the device-only benches must never
    # re-time an execution the tunnel has already seen (result dedup
    # on repeated resident-args dispatches), so every timed rep in
    # every round gets its own burst
    frame_sets = make_frames(nsets=1 + ROUNDS2 * 4)
    stream_sets = [[encode([f], bit_depth=8, reversible=True,
                           num_decomps=5, block_size=(64, 64))
                    for f in frames] for frames in frame_sets]

    # secondary metrics are best-effort: a failure must not take down
    # the headline serving number
    try:
        (enc_vals, enc_ratios, base_enc, wire,
         bytes_per_burst) = bench_encode_gray(frame_sets, stream_sets)
        enc_med = statistics.median(enc_vals)
        bser = statistics.median(wire['bound_serialized'])
        bdup = statistics.median(wire['bound_duplex'])
        _emit('encode_8x2048x1080_gray_lossless', enc_vals, enc_ratios,
              baseline=base_enc,
              extra={'bytes_up_per_burst': bytes_per_burst,
                     'bytes_down_per_burst':
                         wire['bytes_down_per_burst'],
                     'wire_bound_serialized_mps': round(bser, 2),
                     'wire_bound_duplex_mps': round(bdup, 2),
                     'bound_utilization':
                         round(enc_med / bser, 3)})
        # the serving-encode bound on this rig is the wire round trip
        # (pixels up + coded words down); recording both directions
        # next to the ratio makes a <1.0 encode ratio
        # self-explaining (wire physics, not the codec)
        _emit('wire_upload', wire['up'], [], unit='MB/s')
        _emit('wire_download', wire['down'], [], unit='MB/s')
    except Exception as e:  # noqa: BLE001
        base_enc = None
        print(f'encode bench failed: {e!r}', file=sys.stderr)
    try:
        r = bench_decode_rgb97(make_frames(nsets=2, rgb=True))
        if r is not None:
            _emit('decode_2048x1080_rgb_97_ict', r[0], r[1],
                  baseline=r[2])
    except Exception as e:  # noqa: BLE001
        print(f'rgb 9/7 bench failed: {e!r}', file=sys.stderr)

    (ours, ratios, base_dec, base_serve,
     dec_wire) = bench_decode_gray(stream_sets, frame_sets)

    try:
        vals, rr = bench_decode_device_only(stream_sets, base_dec)
        _emit('decode_device_only_8x2048x1080_gray_lossless', vals, rr,
              baseline=base_dec)
    except Exception as e:  # noqa: BLE001
        print(f'device-only decode bench failed: {e!r}', file=sys.stderr)
    try:
        vals, rr = bench_encode_device_only(frame_sets, base_enc)
        if vals:
            _emit('encode_device_only_8x2048x1080_gray_lossless',
                  vals, rr, baseline=base_enc)
    except Exception as e:  # noqa: BLE001
        print(f'device-only encode bench failed: {e!r}', file=sys.stderr)
    if os.environ.get('OJTPU_BENCH_FULLCONFIGS'):
        # configs 2-5 cost minutes of stream construction + compiles;
        # opt-in so the driver's per-round run stays bounded (their
        # metrics are recorded to BENCH_CONFIGS.json below)
        try:
            n0 = len(_results)
            bench_configs_full()
            with open(os.path.join(REPO, 'BENCH_CONFIGS.json'),
                      'w') as f:
                json.dump(_results[n0:], f, indent=1)
        except Exception as e:  # noqa: BLE001
            print(f'config 2-5 bench failed: {e!r}', file=sys.stderr)

    # headline LAST (the driver records the final JSON line)
    dec_med = statistics.median(ours)
    dec_bound = statistics.median(dec_wire['bound'])
    _emit('wire_upload_decode_rounds', dec_wire['up'], [], unit='MB/s')
    _emit('decode_to_hbm_8x2048x1080_gray_lossless', ours, ratios,
          baseline=base_serve,
          extra={'bytes_up_per_burst': dec_wire['bytes_up_per_burst'],
                 'wire_bound_mps': round(dec_bound, 2),
                 'bound_utilization': round(dec_med / dec_bound, 3)})
    with open(os.path.join(REPO, 'BENCH_FULL.json'), 'w') as f:
        json.dump(_results, f, indent=1)


if __name__ == '__main__':
    main()
