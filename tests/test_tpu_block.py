"""Batched JAX HT block decoder vs the scalar oracle decoder, on
codeblocks extracted from real ojph_compress streams."""
import numpy as np
import pytest

from conftest import requires_oracle, run_oracle

from openjph_tpu.codec import Decoder
from openjph_tpu.coding.decoder import decode_codeblock
from openjph_tpu.tpu.bitprep import prep_cleanup_streams
from openjph_tpu.tpu.block_decode import decode_cleanup
from openjph_tpu.utils.imageio import write_pnm


def _collect_blocks(dec: Decoder):
    """Yield (data, missing_msbs, lcup, w, h) for every coded block."""
    for st in dec.tiles:
        for c, comp in enumerate(st.geom.comps):
            for r, res in enumerate(comp.resolutions):
                for b in range(4):
                    sb = res.bands[b]
                    if sb is None or sb.empty:
                        continue
                    coded = st.coded[c][r][b]
                    for g in sb.blocks:
                        cb = coded[g.cb_y * sb.num_cb_x + g.cb_x]
                        if cb is None or not cb.data \
                                or cb.num_passes != 1 \
                                or cb.pass_length[0] < 2:
                            continue
                        yield (bytes(cb.data), cb.missing_msbs,
                               cb.pass_length[0], g.rect.w, g.rect.h)


def _check_stream(stream: bytes):
    dec = Decoder(stream)
    groups = {}
    for data, missing, lcup, w, h in _collect_blocks(dec):
        groups.setdefault((w, h), []).append((data, missing, lcup))
    assert groups, 'no coded blocks found'
    total = 0
    for (w, h), blocks in groups.items():
        datas = [b[0] for b in blocks]
        missings = np.array([b[1] for b in blocks], np.int32)
        lcups = np.array([b[2] for b in blocks], np.int64)
        scups = np.array([(d[lc - 1] << 4) + (d[lc - 2] & 0xF)
                          for d, lc in zip(datas, lcups)], np.int64)
        assert np.all((scups >= 2) & (scups <= lcups))
        streams = prep_cleanup_streams(datas, lcups, scups)
        p = (30 - missings).astype(np.int32)
        got, err = decode_cleanup(streams['mel'], streams['vlc'],
                                  streams['ms'], p, w, h)
        got = np.asarray(got)
        assert not np.asarray(err).any()
        for i, (data, missing, lcup) in enumerate(blocks):
            ref = decode_codeblock(data, missing, 1, lcup, 0, w, h)
            assert np.array_equal(got[i], ref), \
                f'block {i} of group {(w, h)} mismatches'
            total += 1
    return total


def _img(rng, w, h, bd=8):
    ramp = (np.arange(w)[None, :] * 3 + np.arange(h)[:, None]) \
        % (1 << bd)
    noise = rng.randint(0, 1 << bd, size=(h, w))
    smooth = ((np.arange(w)[None, :] + np.arange(h)[:, None]) // 4) \
        % (1 << bd)
    sel = (np.arange(h)[:, None] // 16) % 3
    return np.where(sel == 0, ramp,
                    np.where(sel == 1, noise, smooth)).astype(np.int32)


@requires_oracle
@pytest.mark.parametrize('w,h,nd,bs,extra', [
    (256, 256, 5, 64, []),
    (77, 65, 5, 32, []),
    (120, 90, 3, 16, []),
    (64, 64, 2, 4, []),
    (256, 256, 5, 64, ['-qstep', '0.01']),
    (333, 257, 5, 64, ['-qstep', '0.002']),
])
def test_jax_block_decoder_parity(tmp_path, rng, w, h, nd, bs, extra):
    img = _img(rng, w, h)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint8))
    j2c = str(tmp_path / 'ref.j2c')
    args = ['-i', src, '-o', j2c, '-num_decomps', str(nd),
            '-block_size', f'{{{bs},{bs}}}']
    if not extra:
        args += ['-reversible', 'true']
    run_oracle('ojph_compress', *args + extra)
    n = _check_stream(open(j2c, 'rb').read())
    assert n > 0


@requires_oracle
def test_jax_block_decoder_16bit(tmp_path, rng):
    img = _img(rng, 100, 80, bd=16)
    src = str(tmp_path / 'src.pgm')
    write_pnm(src, img.astype(np.uint16), maxval=65535)
    j2c = str(tmp_path / 'ref.j2c')
    run_oracle('ojph_compress', '-i', src, '-o', j2c,
               '-reversible', 'true')
    _check_stream(open(j2c, 'rb').read())
