"""JAX TPU ops vs the NumPy oracle: DWT, color, quantization.

The reversible (integer) paths must match bit-exactly; the
irreversible float32 paths must match to float32 ulp tolerance.
"""
import numpy as np
import pytest

from openjph_tpu.ops import color as nclr
from openjph_tpu.ops import dwt as ndwt
from openjph_tpu.tpu import color as jclr
from openjph_tpu.tpu import dwt as jdwt
from openjph_tpu.tpu import quant as jq


def _rand_plane(rng, h, w, lo=-512, hi=512, dtype=np.int32):
    return rng.randint(lo, hi, size=(h, w)).astype(dtype)


SHAPES = [(64, 64), (65, 64), (64, 65), (33, 77), (1, 64), (64, 1),
          (2, 2), (5, 3), (1, 1), (128, 96)]
ORIGINS = [(0, 0), (1, 0), (0, 1), (1, 1)]


@pytest.mark.parametrize('shape', SHAPES)
@pytest.mark.parametrize('origin', ORIGINS)
def test_rev53_2d_parity(rng, shape, origin):
    h, w = shape
    x0, y0 = origin
    x = _rand_plane(rng, h, w)
    ref = ndwt.fwd_dwt2d(x, x0, y0, True)
    got = jdwt.fwd_dwt2d(x, (x0 & 1) == 0, (y0 & 1) == 0, True)
    for r, g in zip(ref, got):
        assert np.array_equal(r, np.asarray(g))
    back = jdwt.inv_dwt2d(*[np.asarray(g) for g in got],
                          (x0 & 1) == 0, (y0 & 1) == 0, True)
    assert np.array_equal(np.asarray(back), x)


@pytest.mark.parametrize('shape', SHAPES)
@pytest.mark.parametrize('origin', ORIGINS[:2])
def test_irv97_2d_parity(rng, shape, origin):
    h, w = shape
    x0, y0 = origin
    x = _rand_plane(rng, h, w).astype(np.float32) / 37.0
    ref = ndwt.fwd_dwt2d(x, x0, y0, False)
    got = jdwt.fwd_dwt2d(x, (x0 & 1) == 0, (y0 & 1) == 0, False)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(r, np.asarray(g), rtol=2e-6, atol=2e-5)
    back = jdwt.inv_dwt2d(*got, (x0 & 1) == 0, (y0 & 1) == 0, False)
    np.testing.assert_allclose(np.asarray(back), x, rtol=2e-5, atol=1e-3)


def test_rct_parity(rng):
    r = _rand_plane(rng, 40, 56, -4096, 4096)
    g = _rand_plane(rng, 40, 56, -4096, 4096)
    b = _rand_plane(rng, 40, 56, -4096, 4096)
    ref = nclr.rct_forward(r.astype(np.int64), g.astype(np.int64),
                           b.astype(np.int64))
    got = jclr.rct_forward(r, g, b)
    for rr, gg in zip(ref, got):
        assert np.array_equal(rr.astype(np.int32), np.asarray(gg))
    back = jclr.rct_backward(*got)
    for orig, bb in zip((r, g, b), back):
        assert np.array_equal(orig, np.asarray(bb))


def test_ict_parity(rng):
    r, g, b = (rng.rand(40, 56).astype(np.float32) - 0.5 for _ in range(3))
    ref = nclr.ict_forward(r, g, b)
    got = jclr.ict_forward(r, g, b)
    for rr, gg in zip(ref, got):
        np.testing.assert_allclose(rr, np.asarray(gg), rtol=1e-6,
                                   atol=1e-7)


@pytest.mark.parametrize('bd,signed,nlt3', [
    (8, False, False), (8, True, False), (16, False, False),
    (12, True, True), (16, True, True)])
def test_rev_convert_parity(rng, bd, signed, nlt3):
    lo = -(1 << (bd - 1)) if signed else 0
    hi = (1 << (bd - 1)) if signed else (1 << bd)
    x = rng.randint(lo, hi, size=(33, 47)).astype(np.int32)
    ref = nclr.rev_convert_in(x, bd, signed, nlt3)
    got = jclr.rev_convert_in(x, bd, signed, nlt3)
    assert np.array_equal(ref, np.asarray(got))
    back = jclr.rev_convert_out(np.asarray(got), bd, signed, nlt3)
    ref_back = nclr.rev_convert_out(ref.astype(np.int64), bd, signed, nlt3)
    assert np.array_equal(ref_back.astype(np.int32), np.asarray(back))


@pytest.mark.parametrize('bd,signed', [(8, False), (12, False), (8, True)])
def test_irv_convert_parity(rng, bd, signed):
    lo = -(1 << (bd - 1)) if signed else 0
    hi = (1 << (bd - 1)) if signed else (1 << bd)
    x = rng.randint(lo, hi, size=(21, 35)).astype(np.int32)
    f_ref = nclr.irv_convert_to_float(x, bd, signed, False)
    f_got = jclr.irv_convert_to_float(x, bd, signed, False)
    np.testing.assert_array_equal(f_ref, np.asarray(f_got))
    i_ref = nclr.irv_convert_to_integer(f_ref, bd, signed, False)
    i_got = jclr.irv_convert_to_integer(np.asarray(f_got), bd, signed,
                                        False)
    assert np.array_equal(i_ref.astype(np.int32), np.asarray(i_got))


def test_tx_cb_roundtrip_rev(rng):
    kmax = 10
    plane = rng.randint(-500, 500, size=(64, 64)).astype(np.int32)
    smag, vals = jq.tx_to_cb(plane, kmax, 0.0, True)
    # mirror the numpy path in codec.py
    sign = np.where(plane < 0, np.uint32(0x80000000), np.uint32(0))
    mag = np.abs(plane.astype(np.int64)).astype(np.uint32)
    ref_val = mag << np.uint32(31 - kmax)
    assert np.array_equal(np.asarray(smag), sign | ref_val)
    assert np.array_equal(np.asarray(vals), ref_val)
    back = jq.tx_from_cb(np.asarray(smag), kmax, 0.0, True)
    assert np.array_equal(np.asarray(back), plane)


def test_tx_cb_roundtrip_irv(rng):
    delta = 1.0 / 512
    plane = (rng.rand(32, 32).astype(np.float32) - 0.5)
    smag, _ = jq.tx_to_cb(plane, 12, 1.0 / delta, False)
    back = jq.tx_from_cb(np.asarray(smag), 12, delta, False)
    np.testing.assert_allclose(np.asarray(back), plane, atol=delta)
