"""High-precision (>28 bit) sample support: the 64-bit coder path
(ojph_*_codeblock64, ojph_block_decoder64.cpp) — full-range ramps must
round-trip bit-exact, and streams must interop with the reference
binaries (tests/test_executables.cpp:283-430 is the reference's
equivalent ramp suite).
"""
import numpy as np
import pytest

from openjph_tpu import decode, encode

from conftest import ORACLE_BIN, requires_oracle
import os
import subprocess


def _ramp(bd, signed, n=64):
    lo = -(1 << (bd - 1)) if signed else 0
    hi = (1 << (bd - 1)) if signed else (1 << bd)
    v = (np.arange(n * n, dtype=np.int64) * 2654435761) % (hi - lo) + lo
    return v.reshape(n, n)


@pytest.mark.parametrize('bd', [30, 31, 32])
@pytest.mark.parametrize('signed', [False, True])
def test_64bit_roundtrip(bd, signed):
    img = _ramp(bd, signed)
    s = encode([img], bit_depth=bd, is_signed=signed, reversible=True,
               num_decomps=2)
    d = decode(s)[0]
    assert np.array_equal(d.astype(np.int64), img)


@requires_oracle
def test_64bit_oracle_reads_ours(tmp_path):
    img = _ramp(32, False)
    s = encode([img], bit_depth=32, is_signed=False, reversible=True,
               num_decomps=2)
    j2c = tmp_path / 'w32.j2c'
    j2c.write_bytes(s)
    out = tmp_path / 'w32.raw'
    subprocess.run([os.path.join(ORACLE_BIN, 'ojph_expand'),
                    '-i', str(j2c), '-o', str(out)],
                   check=True, capture_output=True)
    got = np.frombuffer(out.read_bytes(), dtype='<u4').reshape(64, 64)
    assert np.array_equal(got.astype(np.int64), img)


@requires_oracle
def test_64bit_we_match_oracle_decode(tmp_path):
    img = _ramp(32, False)
    raw = tmp_path / 'in.raw'
    raw.write_bytes(img.astype('<u4').tobytes())
    j2c = tmp_path / 'o32.j2c'
    subprocess.run([os.path.join(ORACLE_BIN, 'ojph_compress'),
                    '-i', str(raw), '-o', str(j2c),
                    '-dims', '{64,64}', '-num_comps', '1',
                    '-signed', 'false', '-bit_depth', '32',
                    '-downsamp', '{1,1}', '-reversible', 'true',
                    '-num_decomps', '2'],
                   check=True, capture_output=True)
    out = tmp_path / 'o32.raw'
    subprocess.run([os.path.join(ORACLE_BIN, 'ojph_expand'),
                    '-i', str(j2c), '-o', str(out)],
                   check=True, capture_output=True)
    oracle = np.frombuffer(out.read_bytes(), dtype='<u4').reshape(64, 64)
    ours = decode(j2c.read_bytes())[0]
    # the reference wraps mod 2^32 when its guard-bit choice leaves
    # kmax short (its own round trip is lossy then); parity means we
    # reproduce its decode exactly
    assert np.array_equal(ours.astype(np.uint32), oracle)


def _max_kmax(stream: bytes) -> int:
    from openjph_tpu.codec import Decoder
    dec = Decoder(stream)
    km = 0
    for st in dec.tiles:
        for comp in st.geom.comps:
            for res in comp.resolutions:
                for b in range(4):
                    sb = res.bands[b]
                    if sb is not None and not sb.empty:
                        km = max(km, sb.kmax)
    return km


@pytest.mark.parametrize('signed', [False, True])
def test_kmax_gt32_rct_roundtrip(signed):
    """Kmax > 32 (the encoder64 regime, ojph_block_encoder.cpp:1026):
    32-bit + RCT + 5-level 5/3 reaches Kmax 35; the u_q extension and
    64-bit sample path must round-trip bit-exact.  (The reference APPS
    cannot express 3-component 32-bit output, so this is a library-
    level contract; single-component >32 interop is oracle-tested
    below.)"""
    planes = [_ramp(32, signed) + s for s in range(3)]
    if signed:
        planes = [np.clip(p, -(1 << 31), (1 << 31) - 1) for p in planes]
    else:
        planes = [np.clip(p, 0, (1 << 32) - 1) for p in planes]
    s = encode(planes, bit_depth=32, is_signed=signed, reversible=True,
               num_decomps=5, color_transform=True)
    assert _max_kmax(s) > 32
    out = decode(s)
    for c in range(3):
        assert np.array_equal(out[c].astype(np.int64), planes[c])


@requires_oracle
def test_kmax_gt32_oracle_both_directions(tmp_path):
    """Single-component 32-bit signed at 5 decomps reaches Kmax 34:
    the oracle must decode our stream bit-exact, and we must decode
    the oracle's own encode of the same samples bit-exact."""
    img = _ramp(32, True)
    s = encode([img], bit_depth=32, is_signed=True, reversible=True,
               num_decomps=5)
    assert _max_kmax(s) > 32
    j2c = tmp_path / 'k34.j2c'
    j2c.write_bytes(s)
    out = tmp_path / 'k34.raw'
    subprocess.run([os.path.join(ORACLE_BIN, 'ojph_expand'),
                    '-i', str(j2c), '-o', str(out)],
                   check=True, capture_output=True)
    got = np.frombuffer(out.read_bytes(), dtype='<i4').reshape(64, 64)
    assert np.array_equal(got.astype(np.int64), img)

    raw = tmp_path / 'in.raw'
    raw.write_bytes(img.astype('<i4').tobytes())
    oj2c = tmp_path / 'o34.j2c'
    subprocess.run([os.path.join(ORACLE_BIN, 'ojph_compress'),
                    '-i', str(raw), '-o', str(oj2c),
                    '-dims', '{64,64}', '-num_comps', '1',
                    '-signed', 'true', '-bit_depth', '32',
                    '-downsamp', '{1,1}', '-reversible', 'true',
                    '-num_decomps', '5'],
                   check=True, capture_output=True)
    ostream = oj2c.read_bytes()
    assert _max_kmax(ostream) > 32
    mine = decode(ostream)[0]
    assert np.array_equal(mine.astype(np.int64), img)
