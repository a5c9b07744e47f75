"""Batched SigProp/MagRef refine kernel vs the scalar oracle.

The scalar decoder (coding/decoder.py) is line-faithful to
ojph_block_decoder32.cpp and oracle-verified (test_multipass.py);
the batched kernel (tpu/block_refine.py) must reproduce it bit-exactly
for mixed batches of 1/2/3-pass blocks, varying heights within a
height-merged group, and both stripe-causal modes.
"""
import numpy as np
import pytest

from openjph_tpu.coding.decoder import decode_codeblock
from openjph_tpu.coding.encoder import (encode_codeblock,
                                        encode_codeblock_multipass)
from openjph_tpu.tpu.bitprep import prep_cleanup_streams_np
from openjph_tpu.tpu.block_refine import (decode_cleanup_refine,
                                          prep_refine_streams_np)


def _rand_block(rng, w, h, kmax, density=0.4):
    m = rng.randint(0, 1 << (kmax - 1), (h, w))
    m[rng.rand(h, w) > density] = 0
    sgn = (rng.rand(h, w) < 0.5).astype(np.uint32)
    return ((sgn << 31)
            | (m.astype(np.uint32) << (31 - kmax))).astype(np.uint32)


def _batch_decode(items, W, Hmax):
    """items: list of (data, lcup, len2, mm, npasses, h, causal)."""
    datas = [it[0] for it in items]
    lcups = np.array([it[1] for it in items], np.int64)
    scups = np.array([(int(d[lc - 1]) << 4) + (int(d[lc - 2]) & 0xF)
                      for d, lc in zip(datas, lcups)], np.int64)
    len2s = np.array([it[2] for it in items], np.int64)
    mms = np.array([it[3] for it in items], np.int32)
    nps = np.array([it[4] for it in items], np.int32)
    hs = np.array([it[5] for it in items], np.int32)
    caus = np.array([it[6] for it in items], bool)
    streams = prep_cleanup_streams_np(datas, lcups, scups)
    ref = prep_refine_streams_np(datas, lcups, len2s)
    nps = np.where(len2s == 0, np.minimum(nps, 1), nps)
    dec, err = decode_cleanup_refine(
        streams['mel'], streams['vlc'], streams['ms'],
        ref['spp'], ref['mrp'], (30 - mms).astype(np.int32), nps,
        hs, caus, W, Hmax)
    assert not np.asarray(err).any()
    return np.asarray(dec)


@pytest.mark.parametrize('w,h', [(16, 16), (8, 8), (64, 64), (36, 20)])
def test_refine_batch_matches_scalar(rng, w, h):
    kmax = 8
    mm = kmax - 2
    items, refs = [], []
    for i in range(12):
        passes = (i % 3) + 1
        causal = bool(i & 1)
        buf = _rand_block(rng, w, h, kmax)
        if passes == 1:
            seg1 = encode_codeblock(buf, mm, w, h)
            seg2 = b''
        else:
            seg1, seg2 = encode_codeblock_multipass(
                buf, mm, w, h, num_passes=passes)
        data = seg1 + seg2
        items.append((np.frombuffer(data, np.uint8), len(seg1),
                      len(seg2), mm, passes, h, causal))
        refs.append(decode_codeblock(data, mm, passes, len(seg1),
                                     len(seg2), w, h,
                                     stripe_causal=causal))
    dec = _batch_decode(items, w, h)
    for i, r in enumerate(refs):
        np.testing.assert_array_equal(dec[i], r, err_msg=f'lane {i}')


def test_refine_batch_mixed_heights(rng):
    """Height-merged group: lanes with different true heights padded
    to the group max; rows past a lane's height are don't-care but
    must not perturb rows within it."""
    w, kmax = 16, 8
    mm = kmax - 2
    heights = [16, 13, 7, 4, 1, 16, 9, 3]
    items, refs = [], []
    for i, h in enumerate(heights):
        passes = (i % 3) + 1
        buf = _rand_block(rng, w, h, kmax, density=0.6)
        if passes == 1:
            seg1, seg2 = encode_codeblock(buf, mm, w, h), b''
        else:
            seg1, seg2 = encode_codeblock_multipass(
                buf, mm, w, h, num_passes=passes)
        data = seg1 + seg2
        items.append((np.frombuffer(data, np.uint8), len(seg1),
                      len(seg2), mm, passes, h, False))
        refs.append(decode_codeblock(data, mm, passes, len(seg1),
                                     len(seg2), w, h))
    dec = _batch_decode(items, w, max(heights))
    for i, (r, h) in enumerate(zip(refs, heights)):
        np.testing.assert_array_equal(dec[i, :h], r,
                                      err_msg=f'lane {i} h={h}')


def test_refine_sparse_and_dense(rng):
    """Extremes: near-empty blocks (MEL run coding dominates) and
    fully-dense blocks (maximum SigProp/MagRef traffic)."""
    w = h = 32
    kmax = 10
    mm = kmax - 2
    items, refs = [], []
    for density, passes in [(0.02, 3), (1.0, 3), (0.02, 2), (1.0, 2)]:
        buf = _rand_block(rng, w, h, kmax, density=density)
        buf[0, 0] |= np.uint32(1) << np.uint32(31 - kmax)  # non-empty
        seg1, seg2 = encode_codeblock_multipass(buf, mm, w, h,
                                                num_passes=passes)
        data = seg1 + seg2
        items.append((np.frombuffer(data, np.uint8), len(seg1),
                      len(seg2), mm, passes, h, False))
        refs.append(decode_codeblock(data, mm, passes, len(seg1),
                                     len(seg2), w, h))
    dec = _batch_decode(items, w, h)
    for i, r in enumerate(refs):
        np.testing.assert_array_equal(dec[i], r, err_msg=f'case {i}')
