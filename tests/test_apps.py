"""CLI apps: flag dialect, formats, and interop with the oracle CLIs."""
import numpy as np
import pytest

from conftest import requires_oracle, run_oracle

from openjph_tpu.apps.compress import main as compress_main
from openjph_tpu.apps.expand import main as expand_main
from openjph_tpu.utils.imageio import read_pnm, write_pnm, write_raw


def _img(rng, w, h):
    return rng.randint(0, 256, size=(h, w)).astype(np.int32)


def test_cli_roundtrip_gray(tmp_path, rng):
    img = _img(rng, 120, 88)
    src = str(tmp_path / 'in.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'out.j2c')
    assert compress_main(['-i', src, '-o', j2c, '-reversible', 'true',
                          '-num_decomps', '3']) == 0
    dst = str(tmp_path / 'out.pgm')
    assert expand_main(['-i', j2c, '-o', dst]) == 0
    assert np.array_equal(read_pnm(dst).astype(np.int32), img)


def test_cli_roundtrip_rgb_tileparts(tmp_path, rng):
    img = np.stack([_img(rng, 96, 64) for _ in range(3)], axis=-1)
    src = str(tmp_path / 'in.ppm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'out.j2c')
    assert compress_main(['-i', src, '-o', j2c, '-reversible', 'true',
                          '-tileparts', 'R', '-tlm_marker', 'true',
                          '-prog_order', 'RPCL']) == 0
    dst = str(tmp_path / 'out.ppm')
    assert expand_main(['-i', j2c, '-o', dst]) == 0
    assert np.array_equal(read_pnm(dst).astype(np.int32), img)


def test_cli_raw_roundtrip(tmp_path, rng):
    img = rng.randint(-(1 << 11), 1 << 11, size=(40, 56)) \
        .astype(np.int32)
    src = str(tmp_path / 'in.raw')
    write_raw(src, img, 12, True)
    j2c = str(tmp_path / 'out.j2c')
    assert compress_main(['-i', src, '-o', j2c, '-reversible', 'true',
                          '-dims', '{56,40}', '-bit_depth', '12',
                          '-signed', 'true']) == 0
    dst = str(tmp_path / 'out.raw')
    assert expand_main(['-i', j2c, '-o', dst]) == 0
    from openjph_tpu.utils.imageio import read_raw
    assert np.array_equal(read_raw(dst, 56, 40, 12, True), img)


def test_cli_bad_args(tmp_path):
    assert compress_main(['-i']) == 1
    assert compress_main(['-nonsense', 'x', '-i', 'a', '-o', 'b']) == 1
    assert expand_main(['-i', str(tmp_path / 'missing.j2c'),
                        '-o', str(tmp_path / 'o.pgm')]) == 1


def test_cli_skip_res(tmp_path, rng):
    img = _img(rng, 128, 128)
    src = str(tmp_path / 'in.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'out.j2c')
    assert compress_main(['-i', src, '-o', j2c, '-reversible',
                          'true']) == 0
    dst = str(tmp_path / 'half.pgm')
    assert expand_main(['-i', j2c, '-o', dst, '-skip_res', '1']) == 0
    assert read_pnm(dst).shape == (64, 64)


@requires_oracle
def test_cli_interop_with_oracle(tmp_path, rng):
    img = _img(rng, 200, 150)
    src = str(tmp_path / 'in.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ours.j2c')
    assert compress_main(['-i', src, '-o', j2c, '-reversible',
                          'true']) == 0
    out = str(tmp_path / 'oracle.pgm')
    run_oracle('ojph_expand', '-i', j2c, '-o', out)
    assert np.array_equal(read_pnm(out).astype(np.int32), img)
    # oracle encodes, our CLI decodes
    j2c2 = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c2, '-qstep', '0.01')
    dst = str(tmp_path / 'ours.pgm')
    assert expand_main(['-i', j2c2, '-o', dst]) == 0
