"""End-to-end TPU decode pipeline vs oracle streams and the numpy path."""
import numpy as np
import pytest

from conftest import requires_oracle, run_oracle

from openjph_tpu import decode, decode_tpu, encode
from openjph_tpu.utils.imageio import read_pnm, write_pnm


def _img(rng, w, h, bd=8):
    ramp = (np.arange(w)[None, :] + np.arange(h)[:, None]) % (1 << bd)
    noise = rng.randint(0, 1 << bd, size=(h, w))
    return np.where((np.arange(h)[:, None] // 8) % 2 == 0, ramp,
                    noise).astype(np.int32)


@requires_oracle
@pytest.mark.parametrize('w,h,nd', [(256, 256, 5), (77, 65, 3),
                                    (512, 512, 5)])
def test_tpu_decode_lossless(tmp_path, rng, w, h, nd):
    img = _img(rng, w, h)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible',
               'true', '-num_decomps', str(nd))
    stream = open(j2c, 'rb').read()
    got = decode_tpu(stream)[0]
    assert np.array_equal(got, img)


@requires_oracle
def test_tpu_decode_rgb_mct(tmp_path, rng):
    img = np.stack([_img(rng, 130, 77) for _ in range(3)], axis=-1)
    src = str(tmp_path / 'src.ppm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible',
               'true')
    planes = decode_tpu(open(j2c, 'rb').read())
    for c in range(3):
        assert np.array_equal(planes[c], img[..., c])


@requires_oracle
def test_tpu_decode_lossy(tmp_path, rng):
    img = _img(rng, 256, 256)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-qstep', '0.01')
    stream = open(j2c, 'rb').read()
    out = str(tmp_path / 'ref_dec.pgm')
    run_oracle('ojph_expand', '-i', j2c, '-o', out)
    ref_dec = read_pnm(out).astype(np.int32)
    mine = np.clip(decode_tpu(stream)[0], 0, 255)
    # float DWT on a different backend: allow +-1 sample wobble
    assert np.abs(mine - ref_dec).max() <= 1
    mse = np.mean((mine - img) ** 2.0)
    mse_ref = np.mean((ref_dec - img) ** 2.0)
    assert mse <= mse_ref * 1.01


def test_tpu_decode_multitile(rng):
    img = _img(rng, 128, 96)
    stream = encode(img, reversible=True, num_decomps=3,
                    tile_size=(33, 33))
    assert np.array_equal(decode_tpu(stream)[0], img)


def test_tpu_matches_numpy_path(rng):
    img = _img(rng, 120, 88)
    stream = encode(img, reversible=True, num_decomps=4)
    a = decode(stream)[0]
    b = decode_tpu(stream)[0]
    assert np.array_equal(a, b)


def test_tpu_skip_res(rng):
    img = _img(rng, 128, 128)
    stream = encode(img, reversible=True, num_decomps=4)
    a = decode(stream, skip_res=2)[0]
    b = decode_tpu(stream, skip_res=2)[0]
    assert np.array_equal(a, b)
