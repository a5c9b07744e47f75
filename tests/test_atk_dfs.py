"""Part-2 ATK (arbitrary lifting kernels) and DFS (arbitrary
decomposition structures) — wire format, round trips, and oracle
parity.

The reference decodes both (param_atk::read ojph_params.cpp:2770-2866;
param_dfs ojph_params.cpp:2530-2660; resolution DFS layouts
ojph_resolution.cpp:60-430) but has no write path for them, so parity
runs one way: our encoder emits ATK/DFS codestreams, the oracle
ojph_expand must reconstruct them identically to our decoder.
"""
import dataclasses
import os
import subprocess
import tempfile

import numpy as np
import pytest

from conftest import ORACLE_BIN, requires_oracle

from openjph_tpu import codec, decode_tpu
from openjph_tpu.core import markers as mk
from openjph_tpu.core.atk import ATK_IRV97, ATK_REV53, AtkKernel
from openjph_tpu.core.markers import Dfs
from openjph_tpu.utils.imageio import read_pnm


def _siz(w, h, nc=1, bd=8, xo=0, yo=0):
    s = mk.Siz()
    s.xsiz, s.ysiz = w, h
    s.xosiz, s.yosiz = xo, yo
    s.comps = [mk.CompInfo(bd, False, 1, 1) for _ in range(nc)]
    return s


def _dfs_encoder(siz, types, reversible=True, num_decomps=None, **kw):
    """All components share one DFS; signaled per component via COC
    (param_cod::is_dfs_defined is COC-only; the main COD carries the
    decomposition count)."""
    nd = num_decomps if num_decomps is not None else len(types)
    wk = mk.DWT_REV53 if reversible else mk.DWT_IRV97
    dfs = Dfs.from_types(0, types)
    cod = mk.Cod(num_decomps=nd, wavelet_kern=wk,
                 mc_trans=kw.pop('mc_trans', 0))
    cocs = {c: mk.Cod(num_decomps=nd, wavelet_kern=wk, comp_idx=c,
                      dfs_idx=0)
            for c in range(siz.num_comps)}
    return codec.Encoder(siz, cod, cocs=cocs, dfs_list=[dfs], **kw)


def _oracle_decode(stream, ext='.pgm'):
    exe = os.path.join(ORACLE_BIN, 'ojph_expand')
    with tempfile.TemporaryDirectory() as td:
        j2c = os.path.join(td, 'x.j2c')
        out = os.path.join(td, 'x' + ext)
        with open(j2c, 'wb') as f:
            f.write(stream)
        r = subprocess.run([exe, '-i', j2c, '-o', out],
                           capture_output=True, text=True)
        assert r.returncode == 0, f'oracle decode failed: {r.stderr}'
        return read_pnm(out)  # [h, w] or [h, w, 3]


# ---------------------------------------------------------------------------
# ATK marker wire format
# ---------------------------------------------------------------------------

def test_atk_marker_roundtrip_reversible():
    k = AtkKernel(index=5, reversible=True,
                  steps=((3, 8, 4), (-2, 1, 2), (1, 2, 2)), coeff_type=1)
    raw = k.to_bytes()
    assert raw[:2] == b'\xff\x79'
    k2 = AtkKernel.from_bytes(raw[4:])
    assert k2 == k


def test_atk_marker_roundtrip_irreversible():
    for ct in (2, 3):
        k = AtkKernel(index=3, reversible=False,
                      steps=(0.25, -1.5, 0.125, -0.75),
                      K=1.5, coeff_type=ct)
        k2 = AtkKernel.from_bytes(k.to_bytes()[4:])
        assert k2.index == 3 and not k2.reversible
        assert np.allclose(k2.steps, k.steps)
        assert np.isclose(k2.K, 1.5)


def test_atk_marker_rejects_unsupported():
    k = AtkKernel(index=2, reversible=True, steps=((1, 2, 2),),
                  coeff_type=0)
    body = bytearray(k.to_bytes()[4:])
    body[0] &= ~0x08  # clear WS bit -> ARB filter
    with pytest.raises(ValueError, match='ARB'):
        AtkKernel.from_bytes(bytes(body))
    body = bytearray(k.to_bytes()[4:])
    body[0] |= 0x20  # m_init = 1
    with pytest.raises(ValueError, match='m_init'):
        AtkKernel.from_bytes(bytes(body))


def test_builtin_kernels_match_hardwired():
    # ojph_params.cpp:2870-2896
    assert ATK_REV53.reversible and ATK_REV53.num_steps == 2
    assert not ATK_IRV97.reversible and ATK_IRV97.num_steps == 4
    assert np.isclose(ATK_IRV97.K, 1.230174104914001)


# ---------------------------------------------------------------------------
# ATK end-to-end
# ---------------------------------------------------------------------------

REV_KERNELS = [
    # 5/3 written explicitly as an ATK segment
    AtkKernel(index=2, reversible=True, steps=((1, 2, 2), (-1, 1, 1)),
              coeff_type=0),
    # 4-step reversible (a 13/7-like cascade), 8-bit coeffs
    AtkKernel(index=2, reversible=True,
              steps=((1, 16, 5), (-1, 8, 4), (1, 2, 2), (-1, 1, 1)),
              coeff_type=0),
    # odd step count, 16-bit coeffs
    AtkKernel(index=7, reversible=True,
              steps=((9, 16, 5), (1, 2, 2), (-1, 1, 1)), coeff_type=1),
]


@pytest.mark.parametrize('kern', REV_KERNELS)
def test_atk_reversible_roundtrip(rng, kern):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    cod = mk.Cod(num_decomps=3, wavelet_kern=kern.index)
    enc = codec.Encoder(_siz(61, 93), cod, atks=[kern])
    stream = enc.encode([img])
    assert np.array_equal(codec.decode(stream)[0], img)


@requires_oracle
@pytest.mark.parametrize('kern', REV_KERNELS)
def test_atk_reversible_oracle(rng, kern):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    cod = mk.Cod(num_decomps=3, wavelet_kern=kern.index)
    enc = codec.Encoder(_siz(61, 93), cod, atks=[kern])
    stream = enc.encode([img])
    assert np.array_equal(_oracle_decode(stream), img)


IRV_KERNELS = [
    # 9/7 written explicitly as an ATK segment (float32 coeffs)
    dataclasses.replace(ATK_IRV97, index=2),
    # double-precision coeffs
    dataclasses.replace(ATK_IRV97, index=2, coeff_type=3),
    # odd step count: exercises the storage-plane K-scaling path
    AtkKernel(index=4, reversible=False,
              steps=(0.25, -0.3, -1.1), K=1.1, coeff_type=2),
]


@requires_oracle
@pytest.mark.parametrize('kern', IRV_KERNELS)
def test_atk_irreversible_oracle_matches_ours(rng, kern):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    cod = mk.Cod(num_decomps=3, wavelet_kern=kern.index)
    enc = codec.Encoder(_siz(61, 93), cod, atks=[kern],
                        base_delta=1 / 1024.)
    stream = enc.encode([img])
    ours = codec.decode(stream)[0]
    # distortion sanity + bit-exact agreement with the oracle decoder
    assert np.mean((ours - img) ** 2.0) < 2.0
    assert np.array_equal(_oracle_decode(stream), ours)


def test_atk_tpu_pipeline_roundtrip(rng):
    """The fused TPU decode path compiles per-kernel lifting chains."""
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    kern = REV_KERNELS[1]
    cod = mk.Cod(num_decomps=3, wavelet_kern=kern.index)
    stream = codec.Encoder(_siz(61, 93), cod, atks=[kern]).encode([img])
    assert np.array_equal(decode_tpu(stream)[0], img)


def test_atk_missing_marker_rejected(rng):
    img = rng.randint(0, 256, (32, 32)).astype(np.int32)
    kern = REV_KERNELS[0]
    cod = mk.Cod(num_decomps=2, wavelet_kern=2)
    stream = codec.Encoder(_siz(32, 32), cod, atks=[kern]).encode([img])
    # excise the ATK marker segment: decoder must flag the dangling ref
    i = stream.find(b'\xff\x79')
    ln = int.from_bytes(stream[i + 2:i + 4], 'big')
    broken = stream[:i] + stream[i + 2 + ln:]
    with pytest.raises(ValueError, match='ATK'):
        codec.decode(broken)


# ---------------------------------------------------------------------------
# DFS end-to-end
# ---------------------------------------------------------------------------

DFS_CASES = [
    [Dfs.HORZ_DWT] * 3,
    [Dfs.VERT_DWT] * 3,
    [Dfs.BIDIR_DWT, Dfs.HORZ_DWT, Dfs.VERT_DWT],
    [Dfs.NO_DWT, Dfs.BIDIR_DWT, Dfs.HORZ_DWT],
    [Dfs.HORZ_DWT, Dfs.HORZ_DWT, Dfs.VERT_DWT, Dfs.VERT_DWT,
     Dfs.BIDIR_DWT],
]


@pytest.mark.parametrize('types', DFS_CASES)
def test_dfs_reversible_roundtrip(rng, types):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    enc = _dfs_encoder(_siz(61, 93), types)
    stream = enc.encode([img])
    assert np.array_equal(codec.decode(stream)[0], img)
    # DFS layouts run the TPU decoder's per-band path
    assert np.array_equal(decode_tpu(stream)[0], img)


@requires_oracle
@pytest.mark.parametrize('types', DFS_CASES)
def test_dfs_reversible_oracle(rng, types):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    stream = _dfs_encoder(_siz(61, 93), types).encode([img])
    assert np.array_equal(_oracle_decode(stream), img)


@requires_oracle
def test_dfs_odd_canvas_offset_oracle(rng):
    """Odd canvas origin flips the lifting phase on every level."""
    img = rng.randint(0, 256, (64, 47)).astype(np.int32)
    types = [Dfs.HORZ_DWT, Dfs.VERT_DWT, Dfs.BIDIR_DWT]
    stream = _dfs_encoder(_siz(47 + 3, 64 + 5, xo=3, yo=5),
                          types).encode([img])
    assert np.array_equal(codec.decode(stream)[0], img)
    assert np.array_equal(_oracle_decode(stream), img)


@requires_oracle
def test_dfs_irreversible_oracle_matches_ours(rng):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    types = [Dfs.VERT_DWT, Dfs.BIDIR_DWT, Dfs.HORZ_DWT]
    stream = _dfs_encoder(_siz(61, 93), types, reversible=False,
                          base_delta=1 / 1024.).encode([img])
    ours = codec.decode(stream)[0]
    assert np.mean((ours - img) ** 2.0) < 2.0
    assert np.array_equal(_oracle_decode(stream), ours)


@requires_oracle
def test_dfs_rgb_mct_oracle(rng):
    img = rng.randint(0, 256, (40, 52, 3)).astype(np.int32)
    types = [Dfs.HORZ_DWT, Dfs.BIDIR_DWT]
    enc = _dfs_encoder(_siz(52, 40, nc=3), types, mc_trans=1)
    stream = enc.encode([img[..., c] for c in range(3)])
    got = codec.decode(stream)
    for c in range(3):
        assert np.array_equal(got[c], img[..., c])
    oc = _oracle_decode(stream, ext='.ppm')
    assert np.array_equal(oc, img)


def test_dfs_multitile_roundtrip(rng):
    img = rng.randint(0, 256, (75, 90)).astype(np.int32)
    siz = _siz(90, 75)
    siz.xtsiz, siz.ytsiz = 48, 40
    stream = _dfs_encoder(siz, [Dfs.VERT_DWT, Dfs.HORZ_DWT,
                                Dfs.BIDIR_DWT]).encode([img])
    assert np.array_equal(codec.decode(stream)[0], img)


def test_dfs_skip_res_downsamp(rng):
    """Skipped-resolution decode honours the per-axis DFS downsampling
    (param_dfs::get_res_downsamp, ojph_params.cpp:2575-2594)."""
    img = rng.randint(0, 256, (96, 80)).astype(np.int32)
    types = [Dfs.BIDIR_DWT, Dfs.HORZ_DWT, Dfs.VERT_DWT]
    stream = _dfs_encoder(_siz(80, 96), types).encode([img])
    # skip the finest level (BIDIR at the top of the list order means
    # level 1 = finest): level 1 type is types[0]
    out = codec.decode(stream, skip_res=1)[0]
    assert out.shape == (48, 40)  # BIDIR level: halves both axes
    out = codec.decode(stream, skip_res=2)[0]
    assert out.shape == (48, 20)  # then HORZ level: halves x only
    out = codec.decode(stream, skip_res=3)[0]
    assert out.shape == (24, 20)  # then VERT level: halves y only


def test_dfs_band_layout_matches_reference_indexing():
    """QCD entry order follows param_dfs::get_subband_idx
    (ojph_params.cpp:2550-2572)."""
    # types are finest-level first: level 1 = VERT, 2 = HORZ, 3 = BIDIR
    types = [Dfs.VERT_DWT, Dfs.HORZ_DWT, Dfs.BIDIR_DWT]
    dfs = Dfs.from_types(0, types)
    nd = 3
    # resolution r uses decomposition level nd - r + 1
    assert dfs.get_dwt_type(nd) == Dfs.BIDIR_DWT       # res 1
    assert dfs.get_subband_idx(nd, 1, 1) == 1
    assert dfs.get_subband_idx(nd, 1, 3) == 3
    assert dfs.get_subband_idx(nd, 2, 1) == 4          # HORZ level
    assert dfs.get_subband_idx(nd, 3, 2) == 5          # VERT level
    # skipping from the finest: VERT halves y, then HORZ halves x,
    # then BIDIR halves both
    assert dfs.get_res_downsamp(1) == (1, 2)
    assert dfs.get_res_downsamp(2) == (2, 2)
    assert dfs.get_res_downsamp(3) == (4, 4)


def test_dfs_missing_marker_rejected(rng):
    img = rng.randint(0, 256, (32, 32)).astype(np.int32)
    stream = _dfs_encoder(_siz(32, 32),
                          [Dfs.HORZ_DWT, Dfs.VERT_DWT]).encode([img])
    i = stream.find(b'\xff\x72')  # DFS marker
    ln = int.from_bytes(stream[i + 2:i + 4], 'big')
    broken = stream[:i] + stream[i + 2 + ln:]
    with pytest.raises(ValueError, match='DFS'):
        codec.decode(broken)


# ---------------------------------------------------------------------------
# combined: custom kernel + custom decomposition
# ---------------------------------------------------------------------------

@requires_oracle
def test_atk_plus_dfs_oracle(rng):
    img = rng.randint(0, 256, (93, 61)).astype(np.int32)
    kern = REV_KERNELS[1]
    dfs = Dfs.from_types(0, [Dfs.HORZ_DWT, Dfs.BIDIR_DWT, Dfs.VERT_DWT])
    cod = mk.Cod(num_decomps=3, wavelet_kern=kern.index)
    coc = mk.Cod(num_decomps=3, wavelet_kern=kern.index, comp_idx=0,
                 dfs_idx=0)
    enc = codec.Encoder(_siz(61, 93), cod, cocs={0: coc},
                        atks=[kern], dfs_list=[dfs])
    stream = enc.encode([img])
    assert np.array_equal(codec.decode(stream)[0], img)
    assert np.array_equal(_oracle_decode(stream), img)


# ---------------------------------------------------------------------------
# Round 5: DFS layouts on the FUSED path (previously slow-path only)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('types', [
    [Dfs.HORZ_DWT] * 3,
    [Dfs.VERT_DWT] * 3,
    [Dfs.BIDIR_DWT, Dfs.HORZ_DWT, Dfs.VERT_DWT],
    [Dfs.NO_DWT, Dfs.BIDIR_DWT, Dfs.HORZ_DWT],
    [Dfs.BIDIR_DWT, Dfs.BIDIR_DWT, Dfs.NO_DWT],
])
def test_dfs_stream_takes_fused_path(rng, types):
    """The planner must handle H-/V-only and NO_DWT levels (no slow-
    path bailout, ojph_resolution.cpp:104-187) and the fused runner's
    1-D/pass-through synthesis must be bit-exact."""
    from openjph_tpu.tpu.pipeline import TpuDecoder, _build_plan
    img = rng.randint(0, 256, (120, 200)).astype(np.int32)
    stream = _dfs_encoder(_siz(200, 120), types).encode([img])
    d = TpuDecoder(stream)
    plan = _build_plan(d)
    assert plan is not None, 'DFS stream fell off the fused path'
    out = d._decode_fast(plan)[0]
    assert np.array_equal(out.astype(np.int64), img)


def test_dfs_mosaic_shards(rng):
    """A multi-tile DFS stream shards over the mesh (MosaicDecoder no
    longer refuses DFS layouts)."""
    from openjph_tpu.parallel.tiles import MosaicDecoder
    siz = _siz(256, 128)
    siz.xtsiz = siz.ytsiz = 64
    img = rng.randint(0, 256, (128, 256)).astype(np.int32)
    stream = _dfs_encoder(
        siz, [Dfs.BIDIR_DWT, Dfs.HORZ_DWT]).encode([img])
    out = MosaicDecoder(stream).decode()
    assert np.array_equal(out[0], img)
