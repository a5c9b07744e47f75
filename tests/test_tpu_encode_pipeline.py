"""TPU encode pipeline: byte parity with the scalar encoder (which is
itself byte-exact with ojph_compress), plus oracle interop."""
import numpy as np
import pytest

from conftest import requires_oracle, run_oracle

from openjph_tpu import decode, encode, encode_tpu
from openjph_tpu.utils.imageio import read_pnm, write_pnm


def _img(rng, w, h, bd=8):
    ramp = (np.arange(w)[None, :] + np.arange(h)[:, None]) % (1 << bd)
    noise = rng.randint(0, 1 << bd, size=(h, w))
    return np.where((np.arange(h)[:, None] // 8) % 2 == 0, ramp,
                    noise).astype(np.int32)


@pytest.mark.parametrize('w,h,nd,bs', [
    (256, 256, 5, (64, 64)), (77, 65, 3, (32, 32)),
    (128, 96, 3, (16, 16)), (33, 33, 2, (4, 4)),
    (1024, 4, 5, (32, 32)), (4, 1024, 5, (32, 32)),
])
def test_encode_tpu_matches_scalar(rng, w, h, nd, bs):
    img = _img(rng, w, h)
    a = encode(img, reversible=True, num_decomps=nd, block_size=bs)
    b = encode_tpu(img, reversible=True, num_decomps=nd, block_size=bs)
    assert a == b
    assert np.array_equal(decode(b)[0], img)


def test_encode_tpu_rgb_mct(rng):
    img = np.stack([_img(rng, 130, 77) for _ in range(3)], axis=-1)
    a = encode(img, reversible=True, num_decomps=3)
    b = encode_tpu(img, reversible=True, num_decomps=3)
    assert a == b


def test_encode_tpu_lossy(rng):
    img = _img(rng, 256, 256)
    a = encode(img, reversible=False, base_delta=0.01)
    b = encode_tpu(img, reversible=False, base_delta=0.01)
    assert a == b


def test_encode_tpu_multitile(rng):
    img = _img(rng, 128, 96)
    a = encode(img, reversible=True, num_decomps=3, tile_size=(33, 33))
    b = encode_tpu(img, reversible=True, num_decomps=3,
                   tile_size=(33, 33))
    assert a == b


def test_encode_tpu_16bit(rng):
    img = _img(rng, 100, 80, bd=16)
    a = encode(img, bit_depth=16, reversible=True)
    b = encode_tpu(img, bit_depth=16, reversible=True)
    assert a == b


@requires_oracle
def test_encode_tpu_oracle_reads(tmp_path, rng):
    img = _img(rng, 200, 150)
    stream = encode_tpu(img, reversible=True)
    j2c = str(tmp_path / 'ours.j2c')
    open(j2c, 'wb').write(stream)
    out = str(tmp_path / 'dec.pgm')
    run_oracle('ojph_expand', '-i', j2c, '-o', out)
    assert np.array_equal(read_pnm(out).astype(np.int32), img)


@requires_oracle
def test_encode_tpu_byte_parity_with_ojph(tmp_path, rng):
    img = _img(rng, 256, 192)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c,
               '-reversible', 'true')
    ref = open(j2c, 'rb').read()
    ours = encode_tpu(img, reversible=True)
    i, j = ref.find(b'\xff\x90'), ours.find(b'\xff\x90')
    assert ref[i:] == ours[j:]
