"""Mosaic decode/encode at realistic scale (BASELINE config 5 shape).

Two axes the toy-sized tests (test_mosaic.py) don't cover:
 - an 8Kx8K image streamed tile-by-tile through the chunked-ingest
   encoder and the streaming-sink decoder (the full-image pixel array
   never exists on the host; memory is bounded by one geometry
   class's tile batch), sharded over the virtual mesh;
 - many tile geometry classes (codeblock grids anchor to the canvas,
   so odd tile sizes give nearly one class per tile) decoded through
   the single-plan fused path, bit-exact against the reference's own
   encode of the same image.
"""
import os
import subprocess
import time

import numpy as np
import pytest

from conftest import ORACLE_BIN, requires_oracle, run_oracle

from openjph_tpu.parallel.mesh import make_mesh
from openjph_tpu.parallel.tiles import MosaicDecoder, MosaicEncoder

N8K = 8192
TILE = 512


def _tile_content(y0, x0, h, w):
    """Deterministic per-tile pixels, generated on demand (the 8K
    image is never materialized whole)."""
    yy = (np.arange(y0, y0 + h, dtype=np.int64)[:, None])
    xx = (np.arange(x0, x0 + w, dtype=np.int64)[None, :])
    return ((yy * 31 + xx * 17 + ((yy * xx) >> 6)) % 256) \
        .astype(np.int32)


@pytest.mark.slow
def test_mosaic_8k_chunked_sharded():
    mesh = make_mesh()
    me = MosaicEncoder(mesh, reversible=True, num_decomps=3,
                       tile_size=(TILE, TILE))

    def reader(ti, geom):
        r = geom.comps[0].rect
        return [_tile_content(r.y0, r.x0, r.h, r.w)]

    t0 = time.perf_counter()
    stream = me.encode_chunked(reader, (N8K, N8K), num_comps=1)
    t_enc = time.perf_counter() - t0
    assert len(stream) > 1 << 20

    md = MosaicDecoder(stream, mesh)
    ntiles = len(md.dec.tiles)
    assert ntiles == (N8K // TILE) ** 2
    seen = set()

    def sink(ti, planes):
        r = md.dec.tiles[ti].geom.comps[0].rect
        assert np.array_equal(planes[0],
                              _tile_content(r.y0, r.x0, r.h, r.w)), \
            f'tile {ti} mismatch'
        seen.add(ti)

    t0 = time.perf_counter()
    md.decode_to(sink)
    t_shard = time.perf_counter() - t0
    assert seen == set(range(ntiles))

    # sequential comparison: the SAME sub-batched machinery on a
    # 1-device mesh (memory stays bounded by one sub-batch, so this
    # runs under xdist too — the whole-64MP single-dispatch variant
    # it replaces could crash loaded xdist workers)
    md1 = MosaicDecoder(stream, make_mesh(1))
    first = {}
    t0 = time.perf_counter()
    md1.decode_to(lambda ti, planes:
                  first.setdefault(0, planes[0]) if ti == 0 else None)
    t_seq = time.perf_counter() - t0
    assert np.array_equal(first[0], _tile_content(0, 0, TILE, TILE))
    print(f'\n8K mosaic: encode(chunked) {t_enc:.1f}s; sharded '
          f'{ntiles / t_shard:.1f} tiles/s; sequential(1-dev) '
          f'{ntiles / t_seq:.1f} tiles/s')


@requires_oracle
@pytest.mark.slow
def test_mosaic_many_geometry_classes(tmp_path, rng):
    """>= 16 distinct tile geometry classes in one stream (odd tile
    size + image offset), reference-encoded, decoded bit-exact by the
    single-plan fused path; the plan must span every class."""
    from openjph_tpu import decode_tpu
    from openjph_tpu.tpu.pipeline import TpuDecoder, _build_plan
    from openjph_tpu.utils.imageio import write_pnm
    img = rng.randint(0, 256, (1021, 769)).astype(np.int32)
    src = str(tmp_path / 's.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 's.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c,
               '-reversible', 'true', '-num_decomps', '2',
               '-tile_size', '{255,253}', '-image_offset', '{1,2}')
    stream = open(j2c, 'rb').read()
    dec = TpuDecoder(stream)
    keys = set()
    for ti in range(len(dec.tiles)):
        p = _build_plan(TpuDecoder(stream), (ti,))
        assert p is not None
        keys.add((tuple((g.gid, g.w, g.h, g.n_pad)
                        for g in p.groups),) + p.key[1:])
    assert len(keys) >= 16, f'only {len(keys)} geometry classes'
    out = decode_tpu(stream)
    assert np.array_equal(out[0], img)


N32K = 32768
TILE32 = 1024


def _persist_row(rec):
    """Merge one row into MOSAIC_SCALE.json (a list of rows keyed by
    'image'; tolerates the legacy single-object format)."""
    import json
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, 'MOSAIC_SCALE.json')
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
        rows = data if isinstance(data, list) else [data]
    rows = [r for r in rows if r.get('image') != rec['image']]
    rows.append(rec)
    with open(path, 'w') as f:
        json.dump(rows, f, indent=1)
    return rows


@pytest.mark.slow
def test_mosaic_32k_memory_bounded():
    """Config-5 scale proof past 8K: a 32768x32768 (1 gigapixel)
    mosaic streamed through encode_chunked and decode_to.  The whole
    image never exists on the host (a 32K int32 plane alone is 4 GB):
    large geometry classes dispatch in batch_tiles sub-batches, and a
    VmRSS sampler asserts the peak memory DELTA over the run stays
    under 2 GB.  Reference analogue: 4 GB tile-parts / TLM partial
    access (ojph_codestream.h:153-173).  The measured figures persist
    to MOSAIC_SCALE.json for the bench record."""
    import json
    import threading

    def vmrss_mb():
        anon = total = 0.0
        with open('/proc/self/status') as f:
            for line in f:
                if line.startswith('VmRSS:'):
                    total = int(line.split()[1]) / 1024.0
                elif line.startswith('RssAnon:'):
                    anon = int(line.split()[1]) / 1024.0
        return anon, total

    def smooth_tile(y0, x0, h, w):
        # low-entropy content: the memory claim under test is the
        # FRAMEWORK's (image never materialized; buffers ~ 2x the
        # codestream + one sub-batch), so the codestream itself must
        # stay small next to the 4 GB raw image — dense content at
        # ~1 B/px would put a ~1 GB stream (held by the bytes API,
        # like the reference's mem_infile) inside the budget
        yy = (np.arange(y0, y0 + h, dtype=np.int64)[:, None])
        xx = (np.arange(x0, x0 + w, dtype=np.int64)[None, :])
        return (((yy * 5 + xx * 3) >> 6) % 256).astype(np.int32)

    anon0, rss0 = vmrss_mb()
    peak = [anon0, rss0]
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            a, t = vmrss_mb()
            peak[0] = max(peak[0], a)
            peak[1] = max(peak[1], t)
            stop.wait(0.2)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    try:
        mesh = make_mesh()
        me = MosaicEncoder(mesh, batch_tiles=32, reversible=True,
                           num_decomps=2, tile_size=(TILE32, TILE32))

        def reader(ti, geom):
            r = geom.comps[0].rect
            return [smooth_tile(r.y0, r.x0, r.h, r.w)]

        t0 = time.perf_counter()
        stream = me.encode_chunked(reader, (N32K, N32K), num_comps=1)
        t_enc = time.perf_counter() - t0
        assert len(stream) > 1 << 20

        md = MosaicDecoder(stream, mesh, batch_tiles=32)
        ntiles = len(md.dec.tiles)
        assert ntiles == (N32K // TILE32) ** 2  # 1024 tiles
        seen = 0
        rng = np.random.RandomState(9)
        check = set(rng.choice(ntiles, 24, replace=False).tolist()) \
            | {0, ntiles - 1}

        def sink(ti, planes):
            nonlocal seen
            seen += 1
            if ti in check:
                r = md.dec.tiles[ti].geom.comps[0].rect
                assert np.array_equal(
                    planes[0], smooth_tile(r.y0, r.x0, r.h, r.w)), \
                    f'tile {ti} mismatch'

        t0 = time.perf_counter()
        md.decode_to(sink)
        t_dec = time.perf_counter() - t0
        assert seen == ntiles
    finally:
        stop.set()
        th.join(timeout=2)

    delta = peak[1] - rss0
    rec = {'image': f'{N32K}x{N32K}', 'tiles': ntiles,
           'stream_mb': round(len(stream) / 1e6, 1),
           'encode_chunked_s': round(t_enc, 1),
           'decode_to_s': round(t_dec, 1),
           'tiles_per_s_decode': round(ntiles / t_dec, 1),
           'rss_anon_delta_mb': round(peak[0] - anon0, 1),
           'rss_peak_delta_mb': round(delta, 1),
           'backend': 'cpu-8dev-virtual-mesh'}
    _persist_row(rec)
    print('\n32K mosaic:', rec)
    assert delta < 2048, f'peak RSS delta {delta:.0f} MB >= 2 GB'


N100K = 100000
TILE100 = 1024


@pytest.mark.skipif(not os.environ.get('OJTPU_RUN_10GP'),
                    reason='10-gigapixel run is opt-in '
                           '(OJTPU_RUN_10GP=1; ~30 min on the CPU '
                           'virtual mesh)')
def test_mosaic_100k_memory_flat():
    """Config 5 at its STATED scale: 100000x100000 (10 gigapixels)
    through encode_chunked -> a disk file (streaming tile-part
    writer) and mmap -> decode_to.  Proves O(sub-batch) memory: the
    anonymous-RSS delta of the 10 GP run must stay within ~1.35x of
    the 1 GP (32K) run's delta — a flat curve, not just a ceiling.
    The codestream lives on disk both directions (the reference's
    FILE* path, ojph_file.h j2c_outfile/j2c_infile); mmap'd stream
    pages are file-backed and evictable, so the assertion samples
    RssAnon (VmRSS is reported alongside).  Reference analogue: 4 GB
    tile-parts + TLM partial access (ojph_codestream.h:153-173)."""
    import json
    import mmap
    import tempfile
    import threading

    def rss_mb():
        anon = total = 0.0
        with open('/proc/self/status') as f:
            for line in f:
                if line.startswith('VmRSS:'):
                    total = int(line.split()[1]) / 1024.0
                elif line.startswith('RssAnon:'):
                    anon = int(line.split()[1]) / 1024.0
        return anon, total

    def smooth_tile(y0, x0, h, w):
        yy = (np.arange(y0, y0 + h, dtype=np.int64)[:, None])
        xx = (np.arange(x0, x0 + w, dtype=np.int64)[None, :])
        return (((yy * 5 + xx * 3) >> 6) % 256).astype(np.int32)

    mesh = make_mesh()

    def phase(n_img):
        """One file-backed encode_chunked -> mmap decode_to run at
        n_img**2; returns (anon_delta, vmrss_delta, figures)."""
        anon0, tot0 = rss_mb()
        peak = [anon0, tot0]
        stop = threading.Event()

        def sampler():
            while not stop.is_set():
                a, t = rss_mb()
                peak[0] = max(peak[0], a)
                peak[1] = max(peak[1], t)
                stop.wait(0.5)

        th = threading.Thread(target=sampler, daemon=True)
        th.start()
        path = os.path.join(tempfile.mkdtemp(), f'mosaic{n_img}.j2c')
        try:
            me = MosaicEncoder(mesh, batch_tiles=32, reversible=True,
                               num_decomps=2,
                               tile_size=(TILE100, TILE100))

            def reader(ti, geom):
                r = geom.comps[0].rect
                return [smooth_tile(r.y0, r.x0, r.h, r.w)]

            t0 = time.perf_counter()
            with open(path, 'wb') as f:
                me.encode_chunked(reader, (n_img, n_img),
                                  num_comps=1, out=f)
            t_enc = time.perf_counter() - t0
            stream_mb = os.path.getsize(path) / 1e6
            assert stream_mb > 1.0

            with open(path, 'rb') as fobj:
                mm = mmap.mmap(fobj.fileno(), 0,
                               access=mmap.ACCESS_READ)
                md = MosaicDecoder(mm, mesh, batch_tiles=32)
                ntiles = len(md.dec.tiles)
                assert ntiles == (-(-n_img // TILE100)) ** 2
                seen = 0
                rng_ = np.random.RandomState(11)
                check = set(rng_.choice(ntiles, 24,
                                        replace=False).tolist()) \
                    | {0, ntiles - 1}

                def sink(ti, planes):
                    nonlocal seen
                    seen += 1
                    if ti in check:
                        r = md.dec.tiles[ti].geom.comps[0].rect
                        assert np.array_equal(
                            planes[0],
                            smooth_tile(r.y0, r.x0, r.h, r.w)), \
                            f'tile {ti} mismatch'

                t0 = time.perf_counter()
                md.decode_to(sink)
                t_dec = time.perf_counter() - t0
                assert seen == ntiles
        finally:
            stop.set()
            th.join(timeout=2)
            try:
                os.unlink(path)
            except OSError:
                pass
        return (peak[0] - anon0, peak[1] - tot0,
                dict(tiles=ntiles, stream_mb=stream_mb, t_enc=t_enc,
                     t_dec=t_dec))

    # same-context 1 GP base first: cold-start overhead (first
    # compiles, allocator arenas) lands in THIS phase, so the 10 GP
    # delta that follows is the pure incremental cost — comparing
    # against a row recorded in a different process warmth would make
    # the assertion context-dependent
    base_anon, _, base_fig = phase(N32K)
    d_anon, d_tot, fig = phase(N100K)
    ntiles = fig['tiles']

    rec = {'image': f'{N100K}x{N100K}', 'tiles': ntiles,
           'stream_mb': round(fig['stream_mb'], 1),
           'encode_chunked_s': round(fig['t_enc'], 1),
           'decode_to_s': round(fig['t_dec'], 1),
           'tiles_per_s_decode': round(ntiles / fig['t_dec'], 1),
           'rss_anon_delta_mb': round(d_anon, 1),
           'rss_peak_delta_mb': round(d_tot, 1),
           'base_1gp_anon_delta_mb': round(base_anon, 1),
           'stream_on_disk': True,
           'backend': 'cpu-8dev-virtual-mesh'}
    _persist_row(rec)
    print('\n100K mosaic:', rec,
          f'(in-process 1 GP base: {base_anon:.0f} MB anon)')
    # flat-memory contract: 10x the pixels / 9.4x the tiles may cost
    # at most ~1.35x the same-context 1 GP delta (+256 MB slack for
    # the O(tiles) records/geometry metadata)
    assert d_anon <= 1.35 * base_anon + 256, \
        f'10 GP anon delta {d_anon:.0f} MB vs in-process 1 GP ' \
        f'{base_anon:.0f} MB'
