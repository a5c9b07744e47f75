"""Parity: the Pallas HT cleanup ENCODER kernel + dense packer vs the
verified records path (block_encode.py + pack_cleanup_segments) —
segments must be byte-identical.

Runs the kernel in Pallas interpret mode on the CPU test mesh; the
same code path compiles via Mosaic on a real chip.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openjph_tpu import native
from openjph_tpu.tpu.block_encode import encode_cleanup_core
from openjph_tpu.tpu.block_encode_pallas import encode_cleanup_pallas
from openjph_tpu.tpu.encode_pipeline import _ebucket

pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason='needs the native library')


def _caps(w, h, kmax):
    qw, qh = (w + 1) // 2, (h + 1) // 2
    pairs = (qw + 1) // 2
    return (_ebucket(qh * pairs * 18 // 32 + 2),
            _ebucket(qh * pairs * 34 // 32 + 2),
            _ebucket(qw * qh * 4 * (kmax + 1) // 32 + 2))


@pytest.mark.parametrize('w,h,kmax', [(16, 16, 8), (32, 16, 5),
                                      (4, 4, 8), (6, 10, 12)])
def test_encode_kernel_segments_match_records(rng, w, h, kmax):
    n = 128
    hp, wp = ((h + 1) // 2) * 2, ((w + 3) // 4) * 4
    mag = rng.randint(0, 1 << kmax, (n, h, w)).astype(np.uint32)
    mag[0] = 0          # zero block
    mag[1, 2:] = 0      # sparse block
    sign = rng.randint(0, 2, (n, h, w)).astype(np.uint32) << 31
    buf = np.zeros((n, hp, wp), np.uint32)
    buf[:, :h, :w] = np.where(mag != 0, sign, 0) | (mag << (31 - kmax))
    p = np.full(n, 31 - kmax, np.int32)

    mel_e, vlc_c, vlc_l, ms_v, ms_l = encode_cleanup_core(
        jnp.asarray(buf), jnp.asarray(p), w, h)
    sw = lambda a: np.asarray(a).swapaxes(0, 1)
    pairs = ((w + 1) // 2 + 1) // 2
    qh = (h + 1) // 2
    pairs_real = np.full(n, qh * pairs, np.int64)
    stride = h * w * 5 + 256
    out_r, lens_r = native.pack_cleanup_segments(
        sw(mel_e), sw(vlc_c), sw(vlc_l), sw(ms_v), sw(ms_l),
        pairs_real, out_stride=stride)

    caps = _caps(w, h, kmax)
    melw, vlcw, msw, bits, ovf = encode_cleanup_pallas(
        jnp.asarray(buf), jnp.asarray(p), w, h, caps, interpret=True)
    melw, vlcw, msw, bits, ovf = (np.asarray(x) for x in
                                  (melw, vlcw, msw, bits, ovf))
    assert not ovf.any()
    cnts = (bits + 31) // 32
    meta = np.zeros((n, 6), np.int64)
    chunks = []
    cur = 0
    for i in range(n):
        for si, pln in ((0, melw), (1, vlcw), (2, msw)):
            c = int(cnts[i, si])
            meta[i, si * 2] = cur
            meta[i, si * 2 + 1] = int(bits[i, si])
            chunks.append(pln[i, :c])
            cur += c
    dense = np.concatenate(chunks)
    out_p, lens_p = native.pack_from_dense(dense, meta,
                                           out_stride=stride)
    for i in range(n):
        assert lens_r[i] == lens_p[i], f'lane {i} length'
        assert np.array_equal(out_r[i, :lens_r[i]],
                              out_p[i, :lens_p[i]]), f'lane {i} bytes'


def test_kernel_qhl_matches_per_height(rng):
    """Height-merged parity: lanes of true heights 4/7/10/16 encoded
    in ONE group (kernel qhl gate) must pack byte-identical to each
    height encoded separately at its natural shape."""
    w, hmax, kmax = 16, 16, 8
    heights = [4, 7, 10, 16, 13]
    n = 128
    mag = rng.randint(0, 1 << kmax, (n, hmax, w)).astype(np.uint32)
    sign = rng.randint(0, 2, (n, hmax, w)).astype(np.uint32) << 31
    full = (np.where(mag != 0, sign, 0) | (mag << (31 - kmax))) \
        .astype(np.uint32)
    p = np.full(n, 31 - kmax, np.int32)
    hs = np.array([heights[i % len(heights)] for i in range(n)])
    buf = full.copy()
    for i in range(n):
        buf[i, hs[i]:] = 0          # zero-pad below the true height
    qhl = (hs + 1) // 2
    caps = _caps(w, hmax, kmax)
    stride = hmax * w * 5 + 256

    melw, vlcw, msw, bits, ovf = encode_cleanup_pallas(
        jnp.asarray(buf), jnp.asarray(p), w, hmax, caps,
        qhl=jnp.asarray(qhl, np.int32), interpret=True)
    melw, vlcw, msw, bits, ovf = (np.asarray(x) for x in
                                  (melw, vlcw, msw, bits, ovf))
    assert not ovf.any()

    for i in range(n):
        h = int(hs[i])
        hp = ((h + 1) // 2) * 2
        one = np.ascontiguousarray(buf[i:i + 1, :hp])
        mel_e, vlc_c, vlc_l, ms_v, ms_l = encode_cleanup_core(
            jnp.asarray(one), jnp.asarray(p[i:i + 1]), w, h)
        sw = lambda a: np.asarray(a).swapaxes(0, 1)
        pairs = ((w + 1) // 2 + 1) // 2
        pairs_real = np.array([((h + 1) // 2) * pairs], np.int64)
        out_r, lens_r = native.pack_cleanup_segments(
            sw(mel_e), sw(vlc_c), sw(vlc_l), sw(ms_v), sw(ms_l),
            pairs_real, out_stride=stride)

        cnts = (bits[i] + 31) // 32
        meta = np.zeros((1, 6), np.int64)
        chunks = []
        cur = 0
        for si, pln in ((0, melw), (1, vlcw), (2, msw)):
            c = int(cnts[si])
            meta[0, si * 2] = cur
            meta[0, si * 2 + 1] = int(bits[i, si])
            chunks.append(pln[i, :c])
            cur += c
        dense = np.concatenate(chunks) if chunks else \
            np.zeros(1, np.uint32)
        out_p, lens_p = native.pack_from_dense(dense, meta,
                                               out_stride=stride)
        assert lens_r[0] == lens_p[0], f'lane {i} (h={h}) length'
        assert np.array_equal(out_r[0, :lens_r[0]],
                              out_p[0, :lens_p[0]]), \
            f'lane {i} (h={h}) bytes'


def test_pipeline_mixed_height_groups(rng, monkeypatch):
    """Same-width blocks with different true heights share one
    height-merged encode group; the kernel's per-lane qhl gate must
    stop each short lane's emission at its own rows instead of
    encoding phantom padding rows (caught at 100x150x3, whose w=19
    r1 blocks come in h=12 and h=13)."""
    import openjph_tpu.tpu.pipeline as pl
    import openjph_tpu.tpu.block_encode_pallas as bep
    from openjph_tpu import encode
    from openjph_tpu.tpu.encode_pipeline import encode_tpu

    orig = bep.encode_cleanup_pallas_cat
    monkeypatch.setattr(
        bep, 'encode_cleanup_pallas_cat',
        lambda buf, p, w, h, caps, qhl=None: orig(
            buf, p, w, h, caps, qhl=qhl, interpret=True))
    monkeypatch.setattr(pl, '_USE_PALLAS', True)
    img = rng.randint(0, 256, (100, 150, 3)).astype(np.int32)
    assert encode_tpu(img, reversible=True, num_decomps=3) \
        == encode(img, reversible=True, num_decomps=3)


def test_pipeline_odd_tile_grid(rng, monkeypatch):
    """Odd tile grid (75x201 over 64x64 tiles, 32x32 blocks): many
    block widths and heights per width class.  Byte parity of the
    merged-group pallas path vs the host encoder — the geometry that
    previously forced the scan fallback (per-(w,h) kernel blowup)."""
    import openjph_tpu.tpu.pipeline as pl
    import openjph_tpu.tpu.block_encode_pallas as bep
    from openjph_tpu import encode
    from openjph_tpu.tpu.encode_pipeline import encode_tpu

    orig = bep.encode_cleanup_pallas_cat
    monkeypatch.setattr(
        bep, 'encode_cleanup_pallas_cat',
        lambda buf, p, w, h, caps, qhl=None: orig(
            buf, p, w, h, caps, qhl=qhl, interpret=True))
    monkeypatch.setattr(pl, '_USE_PALLAS', True)
    img = rng.randint(0, 256, (75, 201)).astype(np.int32)
    kw = dict(reversible=True, num_decomps=2, tile_size=(64, 64),
              block_size=(32, 32))
    assert encode_tpu(img, **kw) == encode(img, **kw)


def test_encode_kernel_lane_tiling(rng, monkeypatch):
    """Shrunken VMEM budget forces the encode kernel's lane-axis grid
    tiling (+ lane padding when the tile doesn't divide the sublane
    count); packed segments must stay byte-identical to the records
    path."""
    import openjph_tpu.tpu.block_encode_pallas as BE
    monkeypatch.setattr(BE, '_VMEM_BUDGET', 1 << 18)
    w = h = 16
    kmax = 8
    n = 3 * 128  # S = 3, budget forces SB = 8: pads to S = 8
    hp, wp = h, w
    mag = rng.randint(0, 1 << kmax, (n, h, w)).astype(np.uint32)
    sign = rng.randint(0, 2, (n, h, w)).astype(np.uint32) << 31
    buf = (np.where(mag != 0, sign, 0) | (mag << (31 - kmax))) \
        .astype(np.uint32)
    buf = np.ascontiguousarray(buf.reshape(n, hp, wp))
    p = np.full(n, 31 - kmax, np.int32)

    mel_e, vlc_c, vlc_l, ms_v, ms_l = encode_cleanup_core(
        jnp.asarray(buf), jnp.asarray(p), w, h)
    sw = lambda a: np.asarray(a).swapaxes(0, 1)
    pairs = ((w + 1) // 2 + 1) // 2
    qh = (h + 1) // 2
    pairs_real = np.full(n, qh * pairs, np.int64)
    stride = h * w * 5 + 256
    out_r, lens_r = native.pack_cleanup_segments(
        sw(mel_e), sw(vlc_c), sw(vlc_l), sw(ms_v), sw(ms_l),
        pairs_real, out_stride=stride)

    caps = _caps(w, h, kmax)
    melw, vlcw, msw, bits, ovf = encode_cleanup_pallas(
        jnp.asarray(buf), jnp.asarray(p), w, h, caps, interpret=True)
    melw, vlcw, msw, bits, ovf = (np.asarray(x) for x in
                                  (melw, vlcw, msw, bits, ovf))
    assert not ovf.any()
    assert melw.shape[0] == n  # padding sliced off
    cnts = (bits + 31) // 32
    meta = np.zeros((n, 6), np.int64)
    chunks = []
    cur = 0
    for i in range(n):
        for si, pln in ((0, melw), (1, vlcw), (2, msw)):
            c = int(cnts[i, si])
            meta[i, si * 2] = cur
            meta[i, si * 2 + 1] = int(bits[i, si])
            chunks.append(pln[i, :c])
            cur += c
    dense = np.concatenate(chunks)
    out_p, lens_p = native.pack_from_dense(dense, meta,
                                           out_stride=stride)
    for i in range(n):
        assert lens_r[i] == lens_p[i], f'lane {i} length'
        assert np.array_equal(out_r[i, :lens_r[i]],
                              out_p[i, :lens_p[i]]), f'lane {i} bytes'
