"""Bounds-safety of the native cleanup-segment packers.

The C++ emitters (MelEnc/VlcEnc 4096-byte scratch, MsEnc writing into
the caller's row) must never write out of bounds, no matter how
adversarial the device-side records are; overflow is reported as
lens[i] == 0 and the caller falls back to the scalar encoder
(reference behavior: ojph_block_encoder.cpp caps segments at
2..65534 bytes and the arena is pre-sized, so overflow cannot happen
there — here the guard replaces the arena contract).

These tests drive the packers directly with random and worst-case
records.  Memory errors would crash the process or corrupt the numpy
canary rows we check.
"""
import numpy as np
import pytest

from openjph_tpu import native

if native._load() is None:  # pragma: no cover
    pytest.skip("native library unavailable", allow_module_level=True)


def test_pack_cleanup_segments_random_records():
    rng = np.random.default_rng(0)
    n, steps = 8, 1056  # 64x64 block worth of quad pairs (33*32)
    for trial in range(6):
        mel_e = rng.integers(-1, 2, (n, steps, 3)).astype(np.int8)
        vlc_c = rng.integers(0, 1 << 16, (n, steps, 6)).astype(np.uint16)
        # VLC lengths 0..16 per word: worst case ~12 bytes/step >> stride
        vlc_l = rng.integers(0, 17, (n, steps, 6)).astype(np.uint8)
        ms_v = rng.integers(0, 1 << 32, (n, steps, 8)).astype(np.uint32)
        ms_l = rng.integers(0, 33, (n, steps, 8)).astype(np.uint8)
        pairs_real = np.full(n, steps, np.int64)
        # Tight stride forces the MsEnc/VlcEnc/MelEnc overflow paths.
        out_stride = [64, 256, 1024, 4096, 8192, 65536][trial]
        out, lens = native.pack_cleanup_segments(
            mel_e, vlc_c, vlc_l, ms_v, ms_l, pairs_real, out_stride)
        assert out.shape == (n, out_stride)
        assert np.all(lens >= 0)
        assert np.all(lens <= out_stride)


def test_pack_cleanup_segments_vlc_flood():
    # All-ones maximal-length VLC words: >4096 bytes of backward VLC,
    # must trip VlcEnc.ovf (not scribble past its stack buffer).
    n, steps = 2, 1056
    mel_e = np.full((n, steps, 3), -1, np.int8)
    vlc_c = np.full((n, steps, 6), 0xFFFF, np.uint16)
    vlc_l = np.full((n, steps, 6), 16, np.uint8)
    ms_v = np.zeros((n, steps, 8), np.uint32)
    ms_l = np.zeros((n, steps, 8), np.uint8)
    pairs_real = np.full(n, steps, np.int64)
    out, lens = native.pack_cleanup_segments(
        mel_e, vlc_c, vlc_l, ms_v, ms_l, pairs_real, out_stride=1 << 16)
    assert np.all(lens == 0)  # overflow reported, no crash


def test_pack_cleanup_segments_mel_flood():
    # Alternating MEL events emit ~2 bits/event; 3*1056 events ≈ 800B —
    # raise steps via pairs_stride to push MEL past 4096 bytes.
    n, steps = 1, 20000
    rng = np.random.default_rng(1)
    mel_e = rng.integers(0, 2, (n, steps, 3)).astype(np.int8)
    vlc_c = np.zeros((n, steps, 6), np.uint16)
    vlc_l = np.zeros((n, steps, 6), np.uint8)
    ms_v = np.zeros((n, steps, 8), np.uint32)
    ms_l = np.zeros((n, steps, 8), np.uint8)
    pairs_real = np.full(n, steps, np.int64)
    out, lens = native.pack_cleanup_segments(
        mel_e, vlc_c, vlc_l, ms_v, ms_l, pairs_real, out_stride=1 << 16)
    assert np.all(lens == 0)


def test_pack_from_dense_random():
    rng = np.random.default_rng(2)
    for out_stride in (64, 512, 4096):
        n = 16
        dense = rng.integers(0, 1 << 32, 4096).astype(np.uint32)
        meta = np.zeros((n, 6), np.int64)
        for i in range(n):
            for s in range(3):
                off = int(rng.integers(0, 2048))
                bits = int(rng.integers(0, (4096 - off) * 32))
                meta[i, s * 2] = off
                meta[i, s * 2 + 1] = bits
        out, lens = native.pack_from_dense(dense, meta, out_stride)
        assert out.shape == (n, out_stride)
        assert np.all(lens >= 0)
        assert np.all(lens <= out_stride)


def test_native_block_decoder_matches_python():
    """The C++ scalar block decoder (native.decode_codeblock, the
    >30-bit-plane host path) must be bit-identical to the Python
    reference (coding/decoder.py) on real coded blocks across
    depths, pass counts and stripe-causal mode."""
    import os
    os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    from openjph_tpu import decode, encode
    from openjph_tpu.coding.decoder import decode_codeblock_py
    rng = np.random.default_rng(5)
    checked = []
    orig = native.decode_codeblock

    def spy(data, mm, npass, l1, l2, w, h, sc=False):
        out = orig(data, mm, npass, l1, l2, w, h, sc)
        ref = decode_codeblock_py(data, mm, npass, l1, l2, w, h, sc)
        assert out.dtype == ref.dtype
        assert np.array_equal(out, ref), (mm, npass, w, h, sc)
        checked.append(mm)
        return out

    native.decode_codeblock = spy
    try:
        for bd, sgn, ht, vc in [(8, False, 3, False), (8, False, 2, True),
                                (32, False, 1, False),
                                (30, True, 1, False)]:
            lo = -(1 << (bd - 1)) if sgn else 0
            hi = (1 << (bd - 1)) if sgn else (1 << bd)
            img = ((np.arange(50 * 70, dtype=np.int64) * 40503)
                   % (hi - lo) + lo).reshape(50, 70)
            img[rng.random((50, 70)) < 0.4] = 0
            s = encode([img], bit_depth=bd, is_signed=sgn,
                       reversible=True, num_decomps=2, ht_passes=ht,
                       vert_causal=vc)
            decode(s)
    finally:
        native.decode_codeblock = orig
    assert checked and max(checked) >= 30  # 64-bit path exercised


def test_native_block_encoder_matches_python():
    """The C++ scalar cleanup encoder (native.encode_codeblock, the
    encoder64 >30-bit-plane host path) must be byte-identical to the
    Python reference (coding/encoder.py) across both sample regimes,
    block geometries and sparsities — single-block and the threaded
    batch entry."""
    from openjph_tpu.coding.encoder import encode_codeblock as py_enc
    rng = np.random.default_rng(7)
    for trial in range(60):
        bits = 64 if trial % 2 else 32
        w = int(rng.integers(1, 65))
        h = int(rng.integers(1, 65))
        kmax = int(rng.integers(1, 36 if bits == 64 else 31))
        mm = kmax - 1
        p = (30 if bits == 32 else 62) - mm
        mag_bits = min(kmax, 38)
        mags = rng.integers(0, 1 << mag_bits, size=(h, w),
                            dtype=np.uint64)
        mags *= rng.random((h, w)) < rng.uniform(0.05, 0.9)
        signs = rng.integers(0, 2, size=(h, w),
                             dtype=np.uint64) << np.uint64(bits - 1)
        buf = (mags << np.uint64(p)) | signs
        if bits == 32:
            buf = buf.astype(np.uint32)
        ref = py_enc(buf, mm, w, h, bits=bits)
        got = native.encode_codeblock(buf, mm, w, h, bits=bits)
        assert got == ref, (trial, bits, w, h, kmax)


def test_native_block_encoder_batch_matches_single():
    """encode_codeblock_batch must agree with per-block calls (same
    segments, any thread count)."""
    from openjph_tpu.coding.encoder import encode_codeblock as py_enc
    rng = np.random.default_rng(8)
    for bits, mm in [(32, 12), (64, 34)]:
        p = (30 if bits == 32 else 62) - mm
        subs = []
        for _ in range(9):
            w = int(rng.integers(1, 65))
            h = int(rng.integers(1, 65))
            mags = rng.integers(0, 1 << min(mm + 1, 38), size=(h, w),
                                dtype=np.uint64)
            mags *= rng.random((h, w)) < 0.5
            signs = rng.integers(0, 2, size=(h, w),
                                 dtype=np.uint64) << np.uint64(bits - 1)
            subs.append((mags << np.uint64(p)) | signs)
        for nthreads in (1, 3):
            segs = native.encode_codeblock_batch(subs, mm, bits=bits,
                                                 nthreads=nthreads)
            for s, seg in zip(subs, segs):
                ref = py_enc(s, mm, s.shape[1], s.shape[0], bits=bits)
                assert seg == ref
