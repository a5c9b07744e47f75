"""Randomized oracle interop sweep.

The reference's golden suite covers a hand-picked matrix
(test_executables.cpp:463-1726).  This sweep drives randomized
configurations both directions against the oracle binaries:
`ojph_compress` output must decode bit-exact in our fused pipeline,
and our encoder's output must be byte-identical from SOT onward to
the oracle's for the same settings (our COM comment differs).
Deterministic seed; each case is a fresh geometry, so this also
exercises plan/skeleton caching across many shapes.
"""
import os
import subprocess

import numpy as np
import pytest

from conftest import ORACLE_BIN, have_oracle

pytestmark = pytest.mark.skipif(
    not have_oracle(), reason='reference OpenJPH binaries not built')


def _write_pgm(path, img):
    with open(path, 'wb') as fh:
        fh.write(b'P5\n%d %d\n255\n' % (img.shape[1], img.shape[0]))
        fh.write(img.astype(np.uint8).tobytes())


def _write_ppm(path, img):
    with open(path, 'wb') as fh:
        fh.write(b'P6\n%d %d\n255\n' % (img.shape[1], img.shape[0]))
        fh.write(img.astype(np.uint8).tobytes())


@pytest.mark.parametrize('case', range(18))
def test_random_config_interop(case, tmp_path):
    from openjph_tpu import encode
    from openjph_tpu.tpu.pipeline import decode_tpu
    rng = np.random.RandomState(1000 + case)
    h = int(rng.randint(8, 200))
    w = int(rng.randint(8, 200))
    nc = int(rng.choice([1, 3]))
    nd = int(rng.randint(0, 6))
    bs = int(rng.choice([4, 8, 16, 32, 64]))
    bs2 = int(rng.choice([4, 8, 16, 32, 64]))
    po = ['LRCP', 'RLCP', 'RPCL', 'PCRL', 'CPRL'][rng.randint(5)]
    shape = (h, w) if nc == 1 else (h, w, 3)
    img = rng.randint(0, 256, shape).astype(np.int32)

    src = tmp_path / ('in.pgm' if nc == 1 else 'in.ppm')
    (_write_pgm if nc == 1 else _write_ppm)(str(src), img)
    oj2c = tmp_path / 'oracle.j2c'
    subprocess.run(
        [os.path.join(ORACLE_BIN, 'ojph_compress'), '-i', str(src),
         '-o', str(oj2c), '-reversible', 'true',
         '-num_decomps', str(nd), '-prog_order', po,
         '-block_size', '{%d,%d}' % (bs, bs2)],
        check=True, capture_output=True)

    # their stream -> our fused decode, bit-exact.  At num_decomps=0
    # the oracle's Kmax is one bitplane short, so ITS stream clips
    # extreme samples — the ground truth there is the reference
    # decoder's own output, which we must match exactly.
    if nd == 0:
        dec_ref = tmp_path / ('ref.pgm' if nc == 1 else 'ref.ppm')
        subprocess.run(
            [os.path.join(ORACLE_BIN, 'ojph_expand'), '-i', str(oj2c),
             '-o', str(dec_ref)], check=True, capture_output=True)
        raw = dec_ref.read_bytes()
        expect = np.frombuffer(raw[raw.index(b'255\n') + 4:],
                               np.uint8).reshape(img.shape) \
            .astype(np.int32)
    else:
        expect = img
    outs = decode_tpu(oj2c.read_bytes())
    for c, p in enumerate(outs):
        ref = expect if nc == 1 else expect[..., c]
        np.testing.assert_array_equal(p, ref, err_msg=f'case {case}')

    # our stream for the same settings: byte parity from SOT.
    # Exception: at num_decomps=0 we deliberately write one extra LL
    # bitplane — the reference's own Kmax there is one short and its
    # lossless round-trip wraps -2^(B-1) (quant.py:make_rev_qcd); the
    # oracle must still decode OUR stream bit-exact.
    ours = encode(img, reversible=True, num_decomps=nd,
                  prog_order=po, block_size=(bs, bs2))
    if nd == 0:
        oj = tmp_path / 'ours.j2c'
        oj.write_bytes(ours)
        dst = tmp_path / ('out.pgm' if nc == 1 else 'out.ppm')
        subprocess.run(
            [os.path.join(ORACLE_BIN, 'ojph_expand'), '-i', str(oj),
             '-o', str(dst)], check=True, capture_output=True)
        raw = dst.read_bytes()
        pix = np.frombuffer(raw[raw.index(b'255\n') + 4:], np.uint8)
        np.testing.assert_array_equal(
            pix.reshape(img.shape).astype(np.int32), img,
            err_msg=f'case {case}: oracle decode of ours')
        return
    theirs = oj2c.read_bytes()
    i, j = ours.find(b'\xff\x90'), theirs.find(b'\xff\x90')
    assert ours[i:] == theirs[j:], f'case {case}: SOT parity'
