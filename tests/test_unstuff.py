"""On-device unstuffing (tpu/unstuff.py) parity with the host paths.

The device kernel must rebuild EXACTLY the dense word streams of
bitprep.prep_cleanup_streams_np (the verified host reference) from
raw segment bytes, and the full fused decode with
OJTPU_DEVICE_UNSTUFF forced on must stay bit-exact end-to-end.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from openjph_tpu.tpu.bitprep import prep_cleanup_streams_np
from openjph_tpu.tpu.unstuff import unstuff_mel, unstuff_ms, unstuff_vlc


def _rand_segment(rng, lcup, scup):
    """Random stuffing-legal segment bytes of length lcup with the
    given scup (we only need reader-side legality: bytes are
    arbitrary — the unstuffer must mirror the reader, which accepts
    anything)."""
    d = rng.randint(0, 256, lcup).astype(np.uint8)
    # encode scup into the last two bytes like the real codestream
    d[-1] = (scup >> 4) & 0xFF
    d[-2] = (d[-2] & 0xF0) | (scup & 0xF)
    return d


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_unstuff_matches_numpy_reference(seed):
    rng = np.random.RandomState(seed)
    n = 64
    lcups = rng.randint(4, 600, n)
    scups = np.array([rng.randint(2, min(lc, 4079) + 1) for lc in lcups])
    datas = [_rand_segment(rng, int(lc), int(sc))
             for lc, sc in zip(lcups, scups)]
    ref = prep_cleanup_streams_np(datas, lcups, scups)
    wm, wv, ws = (ref['mel'].shape[1], ref['vlc'].shape[1],
                  ref['ms'].shape[1])

    # device layout: each lane's d[0:lcup-1], byte lcup-2 |= 0xF; the
    # MEL and VLC streams share the suffix (forward/backward)
    ms_n = lcups - scups
    sh_n = scups - 1
    sizes = lcups - 1
    # lead/tail margins per the unstuff blob contract (the window
    # fetch is a clipped contiguous slice per lane)
    lead = 4 * (wm + wv + ws + 516)   # covers the combined raw view
    base = np.zeros_like(sizes)
    base[0] = lead
    np.cumsum(sizes[:-1], out=base[1:])
    base[1:] += lead
    total = int(sizes.sum()) + 2 * lead
    blob = np.zeros(-(-(total + 1) // 4) * 4, np.uint8)
    for i, d in enumerate(datas):
        lc = int(lcups[i])
        o = int(base[i])
        blob[o:o + lc - 1] = d[:lc - 1]
        blob[o + lc - 2] |= 0xF
    jb = jnp.asarray(blob.view(np.uint32))
    boff = jnp.asarray(base, jnp.int32)
    got_ms = np.asarray(unstuff_ms(
        jb, boff, jnp.asarray(ms_n, jnp.int32), ws))
    got_mel = np.asarray(unstuff_mel(
        jb, boff + jnp.asarray(ms_n, jnp.int32),
        jnp.asarray(sh_n, jnp.int32), wm))
    got_vlc = np.asarray(unstuff_vlc(
        jb, boff + jnp.asarray(ms_n, jnp.int32),
        jnp.asarray(sh_n, jnp.int32), wv))
    np.testing.assert_array_equal(got_ms, ref['ms'])
    np.testing.assert_array_equal(got_mel, ref['mel'])
    np.testing.assert_array_equal(got_vlc, ref['vlc'])

    # the combined-window raw views (ONE gather per lane) must equal
    # the three per-stream fetches they replace in the raw-T1 path
    from openjph_tpu.tpu.unstuff import (_lane_words_fwd,
                                         _lane_words_rev,
                                         derive_raw_views)
    msn_j = jnp.asarray(ms_n, jnp.int32)
    shn_j = jnp.asarray(sh_n, jnp.int32)
    raw_ms, raw_mel, raw_vlc = derive_raw_views(
        jb, boff, msn_j, shn_j, (wm, wv, ws))
    ref_ms = np.asarray(_lane_words_fwd(jb, boff, ws))
    ref_mel = np.asarray(_lane_words_fwd(jb, boff + msn_j, wm))
    ref_vlc = np.asarray(_lane_words_rev(jb, boff + msn_j, shn_j, wv))
    # beyond-stream bytes are kernel-masked; compare only the
    # in-stream byte positions of each view
    def _mask(a, nbytes):
        a = np.asarray(a).copy()
        k = np.arange(a.shape[1], dtype=np.int64)[None, :]
        for m in range(4):
            sel = (k * 4 + m) >= nbytes[:, None]
            a[sel] = a[sel] & ~np.uint32(0xFF << (8 * m))
        return a
    np.testing.assert_array_equal(_mask(raw_ms, ms_n),
                                  _mask(ref_ms, ms_n))
    np.testing.assert_array_equal(_mask(raw_mel, sh_n),
                                  _mask(ref_mel, sh_n))
    np.testing.assert_array_equal(_mask(raw_vlc, sh_n),
                                  _mask(ref_vlc, sh_n))


def test_device_unstuff_pipeline_bit_exact(monkeypatch):
    """Full fused decode with on-device unstuffing forced on (CPU)."""
    import openjph_tpu.tpu.pipeline as P
    from openjph_tpu import encode
    monkeypatch.setattr(P, '_DEVICE_UNSTUFF', True)
    rng = np.random.RandomState(7)
    for shape, kw in [((120, 90), dict(reversible=True, num_decomps=3)),
                      ((77, 65), dict(reversible=True, num_decomps=5,
                                      block_size=(32, 32))),
                      ((64, 300), dict(reversible=True, num_decomps=2,
                                       block_size=(16, 64)))]:
        img = rng.randint(0, 256, shape).astype(np.int32)
        s = encode(img, bit_depth=8, **kw)
        dec = P.TpuDecoder(s)
        out = dec.decode()
        np.testing.assert_array_equal(out[0], img)


def test_device_unstuff_video_batch(monkeypatch):
    import openjph_tpu.tpu.pipeline as P
    from openjph_tpu import encode
    monkeypatch.setattr(P, '_DEVICE_UNSTUFF', True)
    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 256, (64, 96)).astype(np.int32)
              for _ in range(4)]
    streams = [encode(f, bit_depth=8, reversible=True, num_decomps=3)
               for f in frames]
    outs = P.decode_tpu_batch(streams)
    for f, o in zip(frames, outs):
        np.testing.assert_array_equal(o[0], f)


def test_budget_fallback_roundtrip(monkeypatch):
    """A burst whose stuffing density exceeds the unstuff kernel's
    K-candidate budget must fall back to the host-unstuff runner and
    still decode bit-exact (forced by shrinking the budget)."""
    import openjph_tpu.tpu.pipeline as P
    import openjph_tpu.tpu.unstuff as U
    from openjph_tpu import encode
    monkeypatch.setattr(P, '_DEVICE_UNSTUFF', True)
    monkeypatch.setattr(U, 'MAX_DELETED_BITS', 1)
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (128, 128)).astype(np.int32)
    s = encode(img, bit_depth=8, reversible=True, num_decomps=3)
    dec = P.TpuDecoder(s)
    plan = P._build_plan(dec)
    mode, args = P._pack_auto([(dec, plan)])
    assert mode == 0  # fell back to the dense-words path
    out = P.decode_tpu(s)
    np.testing.assert_array_equal(out[0], img)


def _reader_words(reader, nwords, fwd=False):
    out = []
    for _ in range(nwords):
        out.append(reader.fetch(32) if fwd else reader.fetch())
        reader.advance(32)
    return np.asarray(out, np.uint32)


@pytest.mark.parametrize('d', [
    # VLC nibble 0xF: its bit 3 must OR into the next byte's b0
    # (rev_struct carry); crafted, unreachable from valid encoders
    bytes([0x12, 0x34, 0x56, 0xF0, 0x05]),
    bytes([0x12, 0x34, 0x56, 0x73, 0x05]),   # nib == 7 variant
    # stuffed 0xFF with b7=1 dangling into the next byte (VLC + MS)
    bytes([0xFF, 0xFF, 0xFF, 0x91, 0x05]),
    bytes([0xAA, 0xFF, 0x7F, 0x91, 0x05]),
    # dangled bit on the LAST VLC byte (stays visible before fill)
    bytes([0x12, 0xFF, 0xFF, 0xF5, 0x05]),
])
def test_carry_semantics_vs_scalar_readers(d):
    """The vectorized unstuffers must reproduce the scalar readers'
    (reference-port) OR-carry behavior on crafted segments where the
    dangled bit is nonzero."""
    from openjph_tpu.coding.decoder import FwdReader, RevReader
    lcup = len(d)
    scup = lcup  # whole segment is MEL/VLC; ms empty
    # --- VLC ---
    ref = _reader_words(RevReader(d, lcup, scup), 4)
    got_np = prep_cleanup_streams_np([d], np.array([lcup]),
                                     np.array([scup]))['vlc'][0][:4]
    np.testing.assert_array_equal(got_np, ref, err_msg='numpy vlc')
    lead = 4 * (6 + 514)  # unstuff blob margin contract
    blob = np.zeros(lead * 2 + 16, np.uint8)
    blob[lead:lead + lcup - 1] = np.frombuffer(d, np.uint8)[:lcup - 1]
    blob[lead + lcup - 2] |= 0xF
    got_dev = np.asarray(unstuff_vlc(
        jnp.asarray(blob.view(np.uint32)),
        jnp.asarray([lead], jnp.int32),
        jnp.asarray([scup - 1], jnp.int32), 6))[0][:4]
    np.testing.assert_array_equal(got_dev, ref, err_msg='device vlc')
    from openjph_tpu import native
    if native.have_native():
        got_nat = native.prep_cleanup_streams(
            [d], np.array([lcup]), np.array([scup]),
            min_words=(4, 4, 4))['vlc'][0][:4]
        np.testing.assert_array_equal(got_nat, ref,
                                      err_msg='native vlc')
    # --- MagSgn over the same bytes ---
    ref = _reader_words(FwdReader(d, 0, lcup, 0xFF), 4, fwd=True)
    got_np = prep_cleanup_streams_np(
        [d + b'\x00\x22'], np.array([lcup + 2]),
        np.array([2]))['ms'][0][:4]
    np.testing.assert_array_equal(got_np, ref, err_msg='numpy ms')
    blob2 = np.zeros(lead * 2 + 16, np.uint8)
    blob2[lead:lead + lcup] = np.frombuffer(d, np.uint8)
    got_dev = np.asarray(unstuff_ms(
        jnp.asarray(blob2.view(np.uint32)),
        jnp.asarray([lead], jnp.int32),
        jnp.asarray([lcup], jnp.int32), 6))[0][:4]
    np.testing.assert_array_equal(got_dev, ref, err_msg='device ms')
    if native.have_native():
        got_nat = native.prep_cleanup_streams(
            [d + b'\x00\x22'], np.array([lcup + 2]),
            np.array([2]), min_words=(4, 4, 4))['ms'][0][:4]
        np.testing.assert_array_equal(got_nat, ref,
                                      err_msg='native ms')


@pytest.mark.parametrize('seed', [0, 1])
def test_unstuff_refine_matches_numpy_reference(seed):
    """SigProp/MagRef on-device unstuffers vs prep_refine_streams_np
    (the refinement segment d[lcup : lcup+len2])."""
    from openjph_tpu.tpu.block_refine import prep_refine_streams_np
    from openjph_tpu.tpu.unstuff import unstuff_mrp, unstuff_spp
    rng = np.random.RandomState(100 + seed)
    n = 64
    lcups = rng.randint(4, 200, n)
    len2s = rng.randint(0, 300, n)
    # heavy-stuffing lanes: lots of 0xFF / 0x7F-low bytes
    datas = []
    for lc, l2 in zip(lcups, len2s):
        d = rng.randint(0, 256, int(lc + l2)).astype(np.uint8)
        hot = rng.rand(int(lc + l2)) < 0.3
        d[hot] = rng.choice([0xFF, 0x7F, 0xFE, 0x90],
                            size=int(hot.sum()))
        datas.append(d)
    ref = prep_refine_streams_np(datas, lcups, len2s)
    ws, wm = ref['spp'].shape[1], ref['mrp'].shape[1]

    # device layout: refine bytes only, one run per lane (+ the blob
    # contract's lead/tail margins)
    lead = 4 * (max(ws, wm) + 514)
    base = np.zeros(n, np.int64)
    base[0] = lead
    np.cumsum(len2s[:-1], out=base[1:])
    base[1:] += lead
    total = int(len2s.sum()) + 2 * lead
    blob = np.zeros(-(-(total + 1) // 4) * 4, np.uint8)
    for i, d in enumerate(datas):
        o = int(base[i])
        blob[o:o + len2s[i]] = d[lcups[i]:lcups[i] + len2s[i]]
    jb = jnp.asarray(blob.view(np.uint32))
    boff = jnp.asarray(base, jnp.int32)
    nb = jnp.asarray(len2s, jnp.int32)
    got_spp = np.asarray(unstuff_spp(jb, boff, nb, ws))
    got_mrp = np.asarray(unstuff_mrp(jb, boff, nb, wm))
    np.testing.assert_array_equal(got_spp, ref['spp'])
    np.testing.assert_array_equal(got_mrp, ref['mrp'])
