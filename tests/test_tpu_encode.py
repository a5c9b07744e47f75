"""Batched JAX HT encoder + C++ packer vs the scalar Python encoder:
final cleanup segments must be byte-identical."""
import numpy as np
import pytest

from openjph_tpu import native
from openjph_tpu.coding.encoder import encode_codeblock
from openjph_tpu.tpu.block_encode import encode_cleanup


def _smag(plane, kmax):
    sign = np.where(plane < 0, np.uint32(0x80000000), np.uint32(0))
    mag = np.abs(plane.astype(np.int64)).astype(np.uint32)
    return sign | (mag << np.uint32(31 - kmax))


def _encode_batch(blocks, kmax, w, h):
    n = len(blocks)
    hp = ((h + 1) // 2) * 2
    wp = ((w + 3) // 4) * 4
    buf = np.zeros((n, hp, wp), np.uint32)
    for i, b in enumerate(blocks):
        buf[i, :h, :w] = b
    p = np.full(n, 31 - kmax, np.int32)
    mel_e, vlc_c, vlc_l, ms_v, ms_l = encode_cleanup(buf, p, w, h)
    to_nsfirst = lambda a: np.asarray(a).swapaxes(0, 1)
    pairs = ((w + 1) // 2 + 1) // 2
    pairs_real = np.full(n, ((h + 1) // 2) * pairs, np.int64)
    out, lens = native.pack_cleanup_segments(
        to_nsfirst(mel_e), to_nsfirst(vlc_c), to_nsfirst(vlc_l),
        to_nsfirst(ms_v), to_nsfirst(ms_l), pairs_real,
        out_stride=h * w * 5 + 256)
    return out, lens


@pytest.mark.parametrize('w,h', [(64, 64), (32, 32), (64, 28), (16, 16),
                                 (4, 4), (5, 3), (64, 1), (1, 64),
                                 (33, 17), (64, 34)])
def test_encoder_parity(rng, w, h):
    kmax = 10
    blocks = []
    for i in range(8):
        if i % 4 == 0:
            plane = rng.randint(-500, 500, size=(h, w))
        elif i % 4 == 1:
            plane = (rng.rand(h, w) < 0.1) * rng.randint(-500, 500,
                                                         size=(h, w))
        elif i % 4 == 2:
            plane = np.zeros((h, w), np.int64)
            plane[0, 0] = 13
        else:
            plane = rng.randint(-3, 4, size=(h, w))
        blocks.append(_smag(plane.astype(np.int32), kmax))
    out, lens = _encode_batch(blocks, kmax, w, h)
    for i, b in enumerate(blocks):
        ref = encode_codeblock(b, kmax - 1, w, h)
        got = bytes(out[i, :lens[i]])
        assert got == ref, f'block {i} ({w}x{h}) mismatch'


def test_encoder_height_merge(rng):
    """Blocks of different true heights in one padded batch."""
    kmax = 12
    w = 64
    heights = [64, 28, 14, 7, 3, 64]
    blocks = [
        _smag(rng.randint(-2000, 2000, size=(hh, w)).astype(np.int32),
              kmax) for hh in heights]
    n = len(blocks)
    hmax = 64
    hp = hmax
    wp = w
    buf = np.zeros((n, hp, wp), np.uint32)
    for i, b in enumerate(blocks):
        buf[i, :b.shape[0], :w] = b
    p = np.full(n, 31 - kmax, np.int32)
    mel_e, vlc_c, vlc_l, ms_v, ms_l = encode_cleanup(buf, p, w, hmax)
    sw = lambda a: np.asarray(a).swapaxes(0, 1)
    pairs = ((w + 1) // 2 + 1) // 2
    pairs_real = np.array([((hh + 1) // 2) * pairs for hh in heights],
                          np.int64)
    out, lens = native.pack_cleanup_segments(
        sw(mel_e), sw(vlc_c), sw(vlc_l), sw(ms_v), sw(ms_l), pairs_real,
        out_stride=hmax * w * 5 + 256)
    for i, (b, hh) in enumerate(zip(blocks, heights)):
        ref = encode_codeblock(b, kmax - 1, w, hh)
        assert bytes(out[i, :lens[i]]) == ref, f'height {hh} mismatch'
