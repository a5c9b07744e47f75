"""End-to-end parity tests against the reference OpenJPH binaries.

Mirrors the reference's golden-stream test strategy
(tests/test_executables.cpp): our encoder's streams must decode
bit-exact in ojph_expand; ojph_compress streams must decode bit-exact in
our decoder; and (stronger than the reference requires) our coded tile
bytes are byte-identical to ojph_compress output.
"""
import os

import numpy as np
import pytest

from conftest import requires_oracle, run_oracle

from openjph_tpu import decode, encode
from openjph_tpu.utils.imageio import read_pnm, write_pnm


def _gray_image(rng, w, h, bit_depth=8):
    ramp = (np.arange(w)[None, :] + np.arange(h)[:, None]) \
        % (1 << bit_depth)
    noise = rng.randint(0, 1 << bit_depth, size=(h, w))
    mix = np.where((np.arange(h)[:, None] // 8) % 2 == 0, ramp, noise)
    return mix.astype(np.int32)


def _rgb_image(rng, w, h, bit_depth=8):
    return np.stack([_gray_image(rng, w, h, bit_depth) for _ in range(3)],
                    axis=-1).astype(np.int32)


def _tile_bytes(stream: bytes) -> bytes:
    i = stream.find(b'\xff\x90')
    return stream[i:]


@requires_oracle
@pytest.mark.parametrize('w,h,nd,bs', [
    (64, 64, 2, 64), (64, 64, 5, 64), (512, 512, 5, 64),
    (77, 65, 5, 32), (33, 33, 3, 16), (16, 16, 2, 4),
    (1024, 4, 5, 32), (4, 1024, 5, 32), (512, 8, 5, 64), (8, 512, 5, 64),
    (5, 5, 1, 64), (1, 128, 5, 64), (128, 1, 5, 64), (1, 1, 0, 64),
])
def test_gray_lossless_parity(tmp_path, rng, w, h, nd, bs):
    img = _gray_image(rng, w, h)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible', 'true',
               '-num_decomps', str(nd), '-block_size',
               f'{{{bs},{bs}}}')
    ref_stream = open(j2c, 'rb').read()

    # our decoder matches ojph_expand on the reference stream
    out = str(tmp_path / 'ref_dec.pgm')
    run_oracle('ojph_expand', '-i', j2c, '-o', out)
    ref_dec = read_pnm(out).astype(np.int32)
    mine = decode(ref_stream)[0]
    assert np.array_equal(ref_dec, mine)
    if (w, h) != (1, 1):
        # the reference itself is lossy on a degenerate 1x1 image; we
        # match its decode bit-exactly either way
        assert np.array_equal(img, mine)  # lossless

    # our encoder produces byte-identical tile bytes — except at
    # num_decomps=0, where we deliberately allocate one more LL
    # bitplane than the reference (its Kmax truncates the DC-shifted
    # minimum and it is lossy on its own streams; core/quant.py)
    ours = encode(img, bit_depth=8, reversible=True, num_decomps=nd,
                  block_size=(bs, bs))
    if nd > 0:
        assert _tile_bytes(ours) == _tile_bytes(ref_stream)

    # and ojph_expand reads our stream bit-exact (at nd0 it recovers
    # the true source, which the reference's own stream cannot)
    oj2c = str(tmp_path / 'ours.j2c')
    open(oj2c, 'wb').write(ours)
    out2 = str(tmp_path / 'ours_dec.pgm')
    run_oracle('ojph_expand', '-i', oj2c, '-o', out2)
    want = img if nd == 0 else ref_dec
    assert np.array_equal(read_pnm(out2).astype(np.int32), want)


@requires_oracle
@pytest.mark.parametrize('prog', ['LRCP', 'RLCP', 'RPCL', 'PCRL', 'CPRL'])
def test_rgb_prog_orders(tmp_path, rng, prog):
    img = _rgb_image(rng, 130, 77)
    src = str(tmp_path / 'src.ppm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible', 'true',
               '-prog_order', prog, '-num_decomps', '3')
    ref_stream = open(j2c, 'rb').read()
    planes = decode(ref_stream)
    for c in range(3):
        assert np.array_equal(planes[c], img[..., c])

    po = ['LRCP', 'RLCP', 'RPCL', 'PCRL', 'CPRL'].index(prog)
    ours = encode([img[..., c] for c in range(3)], reversible=True,
                  num_decomps=3, prog_order=po)
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)


@requires_oracle
@pytest.mark.parametrize('tile,off', [((32, 32), (0, 0)),
                                      ((33, 33), (0, 0)),
                                      ((60, 40), (5, 7))])
def test_multi_tile(tmp_path, rng, tile, off):
    img = _gray_image(rng, 128, 96)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible', 'true',
               '-tile_size', f'{{{tile[0]},{tile[1]}}}',
               '-num_decomps', '3')
    ref_stream = open(j2c, 'rb').read()
    mine = decode(ref_stream)[0]
    assert np.array_equal(mine, img)

    ours = encode(img, reversible=True, num_decomps=3, tile_size=tile)
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)


@requires_oracle
def test_precincts(tmp_path, rng):
    img = _gray_image(rng, 256, 256)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible', 'true',
               '-num_decomps', '3',
               '-precincts', '{128,128},{64,64}')
    ref_stream = open(j2c, 'rb').read()
    assert np.array_equal(decode(ref_stream)[0], img)
    ours = encode(img, reversible=True, num_decomps=3,
                  precincts=[(128, 128), (64, 64)])
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)


@requires_oracle
def test_lossy_97(tmp_path, rng):
    img = _gray_image(rng, 256, 256)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-qstep', '0.01')
    ref_stream = open(j2c, 'rb').read()
    out = str(tmp_path / 'ref_dec.pgm')
    run_oracle('ojph_expand', '-i', j2c, '-o', out)
    ref_dec = read_pnm(out).astype(np.int32)
    mine = decode(ref_stream)[0]
    # decode parity: bit-exact against the reference decoder after the
    # app-layer clamp its PGM writer applies (ojph_img_io.cpp:106-113)
    mine_clamped = np.clip(mine, 0, 255)
    assert np.array_equal(ref_dec, mine_clamped)

    # our lossy encoder: stream decodes with PSNR >= reference's
    ours = encode(img, reversible=False, base_delta=0.01)
    oj2c = str(tmp_path / 'ours.j2c')
    open(oj2c, 'wb').write(ours)
    out2 = str(tmp_path / 'ours_dec.pgm')
    run_oracle('ojph_expand', '-i', oj2c, '-o', out2)
    ours_dec = read_pnm(out2).astype(np.int32)
    mse_ref = np.mean((ref_dec - img) ** 2.0)
    mse_ours = np.mean((ours_dec - img) ** 2.0)
    assert mse_ours <= mse_ref * 1.0001
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)


@requires_oracle
def test_16bit_lossless(tmp_path, rng):
    img = _gray_image(rng, 120, 80, bit_depth=16)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint16), maxval=65535)
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-reversible', 'true')
    ref_stream = open(j2c, 'rb').read()
    assert np.array_equal(decode(ref_stream)[0], img)
    ours = encode(img, bit_depth=16, reversible=True)
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)


def test_zero_decomps_lossless(rng):
    """num_decomps=0: the reference's set_rev_quant writes B+0 so its
    Kmax is one bitplane short of the DC-shifted minimum and its own
    compress|expand round-trip corrupts extreme samples; we allocate
    the extra bitplane (core/quant.py) and round-trip exactly."""
    for sgn in (False, True):
        lo, hi = (-128, 128) if sgn else (0, 256)
        img = rng.randint(lo, hi, (33, 17)).astype(np.int32)
        img[0, 0] = lo          # the sample the reference corrupts
        s = encode([img], bit_depth=8, is_signed=sgn,
                   reversible=True, num_decomps=0)
        assert np.array_equal(decode(s)[0], img)


@requires_oracle
def test_yuv420_parity(tmp_path, rng):
    """4:2:0 downsampled components (yuv_in layout: luma full-res,
    chroma halved both ways), matching the reference's YUV coverage."""
    w, h = 128, 96
    y = _gray_image(rng, w, h)
    u = _gray_image(rng, w // 2, h // 2)
    v = _gray_image(rng, w // 2, h // 2)
    planes = [y, u, v]
    src = str(tmp_path / 'src.yuv')
    with open(src, 'wb') as f:
        for p in planes:
            f.write(p.astype(np.uint8).tobytes())
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c,
               '-dims', f'{{{w},{h}}}', '-num_comps', '3',
               '-downsamp', '{1,1},{2,2}', '-bit_depth', '8',
               '-signed', 'false', '-reversible', 'true',
               '-num_decomps', '3')
    ref_stream = open(j2c, 'rb').read()
    got = decode(ref_stream)
    for c in range(3):
        assert np.array_equal(got[c], planes[c])
    ours = encode(planes, reversible=True, num_decomps=3,
                  downsamplings=[(1, 1), (2, 2), (2, 2)])
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)


@requires_oracle
def test_qfactor_parity(tmp_path, rng):
    """-qfactor visual weighting must reproduce the reference's QCD
    and coded bytes (ojph_params.cpp:599+ visual weight tables)."""
    img = _rgb_image(rng, 128, 96)
    src = str(tmp_path / 'src.ppm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c, '-qfactor', '85')
    ref_stream = open(j2c, 'rb').read()
    ours = encode([img[..., c] for c in range(3)], qfactor=85,
                  reversible=False)
    assert _tile_bytes(ours) == _tile_bytes(ref_stream)
    # and the whole main header except the COM version string
    i_ref = ref_stream.find(b'\xff\x64')
    i_our = ours.find(b'\xff\x64')
    assert ref_stream[:i_ref] == ours[:i_our]


@requires_oracle
def test_comment_marker(tmp_path, rng):
    """encode(comments=...) emits a COM the oracle accepts
    (comment_exchange, ojph_codestream_local.cpp:686-704)."""
    img = _gray_image(rng, 64, 64)
    s = encode(img, reversible=True, comments=['hello htj2k'])
    assert b'hello htj2k' in s
    j2c = str(tmp_path / 'c.j2c')
    open(j2c, 'wb').write(s)
    out = str(tmp_path / 'c.pgm')
    run_oracle('ojph_expand', '-i', j2c, '-o', out)
    assert np.array_equal(read_pnm(out).astype(np.int32), img)
    # the decoder surfaces it
    from openjph_tpu.core.markers import read_main_header
    hdr = read_main_header(s)
    assert any(c.data == b'hello htj2k' for c in hdr.comments)


def test_empty_tilepart(rng):
    """A tile-part division boundary with no packets (Psot=14) is
    legal — the reference's -tileparts R output contains them for
    slim edge tiles and ojph_expand accepts them."""
    img = rng.randint(0, 256, (92, 100)).astype(np.int32)
    s = encode([img], reversible=True, num_decomps=1,
               tileparts='R', tile_size=(33, 33))
    import struct
    # the stream really does contain an empty tile-part
    assert any(struct.unpack('>I', s[i + 6:i + 10])[0] == 14
               for i in range(len(s) - 10)
               if s[i:i + 2] == b'\xff\x90')
    assert np.array_equal(decode(s)[0], img)
