"""Quantization parameter derivation for encoding.

Builds QCD/QCC marker contents: reversible exponents from BIBO gains of
the lifting analysis cascade, and irreversible step sizes from energy
gains.  The gain tables are the standard 5/3 and 9/7 filter-cascade
constants used across JPEG 2000 implementations (see Taubman &
Marcellin, "JPEG2000", ch. 10); parity checked against
/root/reference/src/core/codestream/ojph_params.cpp:497-595,1495-1612.
"""
import math
from typing import List

from .markers import Qcd, DWT_REV53

# sqrt of energy gain of the synthesis cascade, per decomposition count.
# index = number of decompositions (0..33)
SQRT_ENERGY_GAIN_97_L = [
    1.0000e+00, 1.4021e+00, 2.0304e+00, 2.9012e+00, 4.1153e+00, 5.8245e+00,
    8.2388e+00, 1.1652e+01, 1.6479e+01, 2.3304e+01, 3.2957e+01, 4.6609e+01,
    6.5915e+01, 9.3217e+01, 1.3183e+02, 1.8643e+02, 2.6366e+02, 3.7287e+02,
    5.2732e+02, 7.4574e+02, 1.0546e+03, 1.4915e+03, 2.1093e+03, 2.9830e+03,
    4.2185e+03, 5.9659e+03, 8.4371e+03, 1.1932e+04, 1.6874e+04, 2.3864e+04,
    3.3748e+04, 4.7727e+04, 6.7496e+04, 9.5454e+04]
SQRT_ENERGY_GAIN_97_H = [
    1.4425e+00, 1.9669e+00, 2.8839e+00, 4.1475e+00, 5.8946e+00, 8.3472e+00,
    1.1809e+01, 1.6701e+01, 2.3620e+01, 3.3403e+01, 4.7240e+01, 6.6807e+01,
    9.4479e+01, 1.3361e+02, 1.8896e+02, 2.6723e+02, 3.7792e+02, 5.3446e+02,
    7.5583e+02, 1.0689e+03, 1.5117e+03, 2.1378e+03, 3.0233e+03, 4.2756e+03,
    6.0467e+03, 8.5513e+03, 1.2093e+04, 1.7103e+04, 2.4187e+04, 3.4205e+04,
    4.8373e+04, 6.8410e+04, 9.6747e+04, 1.3682e+05]
SQRT_ENERGY_GAIN_53_L = [
    1.0000e+00, 1.2247e+00, 1.3229e+00, 1.5411e+00, 1.7139e+00, 1.9605e+00,
    2.2044e+00, 2.5047e+00, 2.8277e+00, 3.2049e+00, 3.6238e+00, 4.1033e+00,
    4.6423e+00, 5.2548e+00, 5.9462e+00, 6.7299e+00, 7.6159e+00, 8.6193e+00,
    9.7544e+00, 1.1039e+01, 1.2493e+01, 1.4139e+01, 1.6001e+01, 1.8108e+01,
    2.0493e+01, 2.3192e+01, 2.6246e+01, 2.9702e+01, 3.3614e+01, 3.8041e+01,
    4.3051e+01, 4.8721e+01, 5.5138e+01, 6.2399e+01]
SQRT_ENERGY_GAIN_53_H = [
    1.0458e+00, 1.3975e+00, 1.4389e+00, 1.7287e+00, 1.8880e+00, 2.1841e+00,
    2.4392e+00, 2.7830e+00, 3.1341e+00, 3.5576e+00, 4.0188e+00, 4.5532e+00,
    5.1494e+00, 5.8301e+00, 6.5963e+00, 7.4663e+00, 8.4489e+00, 9.5623e+00,
    1.0821e+01, 1.2247e+01, 1.3860e+01, 1.5685e+01, 1.7751e+01, 2.0089e+01,
    2.2735e+01, 2.5729e+01, 2.9117e+01, 3.2952e+01, 3.7292e+01, 4.2203e+01,
    4.7761e+01, 5.4051e+01, 6.1170e+01, 6.9226e+01]

# BIBO (bounded-input bounded-output) gains of the analysis cascade
BIBO_GAIN_97_L = [
    1.0000e+00, 1.3803e+00, 1.3328e+00, 1.3067e+00, 1.3028e+00] + \
    [1.3001e+00, 1.2993e+00, 1.2992e+00] + [1.2992e+00] * 26
BIBO_GAIN_97_H = [
    1.2976e+00, 1.3126e+00, 1.2757e+00, 1.2352e+00, 1.2312e+00] + \
    [1.2285e+00, 1.2280e+00, 1.2278e+00] + [1.2278e+00] * 26
BIBO_GAIN_53_L = [
    1.0000e+00, 1.5000e+00, 1.6250e+00, 1.6875e+00, 1.6963e+00, 1.7067e+00,
    1.7116e+00, 1.7129e+00, 1.7141e+00, 1.7145e+00, 1.7151e+00, 1.7152e+00,
    1.7155e+00, 1.7155e+00, 1.7156e+00] + [1.7156e+00] * 19
BIBO_GAIN_53_H = [
    2.0000e+00, 2.5000e+00, 2.7500e+00, 2.8047e+00, 2.8198e+00, 2.8410e+00,
    2.8558e+00, 2.8601e+00, 2.8628e+00, 2.8656e+00, 2.8662e+00, 2.8667e+00,
    2.8669e+00, 2.8670e+00, 2.8671e+00] + [2.8671e+00] * 19


def _f32(x: float) -> float:
    """Round to float32 like the reference's float tables."""
    import struct as _s
    return _s.unpack('f', _s.pack('f', x))[0]


def make_rev_qcd(num_decomps: int, bit_depth: int, employs_rct: bool,
                 comp_idx=None) -> Qcd:
    """Reversible quantization exponents (ojph_params.cpp:1495-1539)."""
    B = bit_depth + (1 if employs_rct else 0)
    exps: List[int] = []
    bibo_l = _f32(BIBO_GAIN_53_L[num_decomps])
    X = math.ceil(math.log2(bibo_l * bibo_l))
    exps.append(B + X)
    for d in range(num_decomps, 0, -1):
        bl = _f32(BIBO_GAIN_53_L[d])
        bh = _f32(BIBO_GAIN_53_H[d - 1])
        X = math.ceil(math.log2(bh * bl))
        exps.append(B + X)
        exps.append(B + X)
        X = math.ceil(math.log2(bh * bh))
        exps.append(B + X)
    max_bx = max(exps)
    if max_bx > 38:
        raise ValueError(f'required precision {max_bx} bits exceeds 38')
    guard_bits = max(1, max_bx - 31)
    sqcd = guard_bits << 5
    spqcd = [((e - guard_bits) & 0xFF) << 3 for e in exps]
    return Qcd(sqcd, spqcd, comp_idx)


def _encode_spqcd(delta: float) -> int:
    """Float delta -> (exp<<11 | mantissa) (ojph_params.cpp:1602-1612)."""
    exp = 0
    while delta < 1.0:
        exp += 1
        delta *= 2.0
    mantissa = int(round(delta * (1 << 11))) - (1 << 11)
    mantissa = mantissa if mantissa < (1 << 11) else 0x7FF
    return (exp << 11) | mantissa


def make_irrev_qcd(num_decomps: int, base_delta: float,
                   comp_idx=None) -> Qcd:
    """Irreversible (9/7) quantization steps (ojph_params.cpp:1542-1599).

    Visual weighting (Qfactor) is not applied here; see make_qfactor_qcd.
    """
    guard_bits = 1
    sqcd = (guard_bits << 5) | 0x2
    sp: List[int] = []
    gl = _f32(SQRT_ENERGY_GAIN_97_L[num_decomps])
    sp.append(_encode_spqcd(base_delta / (gl * gl)))
    for d in range(num_decomps, 0, -1):
        gl = _f32(SQRT_ENERGY_GAIN_97_L[d])
        gh = _f32(SQRT_ENERGY_GAIN_97_H[d - 1])
        sp.append(_encode_spqcd(base_delta / (gh * gl)))
        sp.append(_encode_spqcd(base_delta / (gl * gh)))
        sp.append(_encode_spqcd(base_delta / (gh * gh)))
    return Qcd(sqcd, sp, comp_idx)


def default_irrev_delta(bit_depth: int) -> float:
    """Default qstep when unspecified (ojph_params.cpp:1456-1459)."""
    return 1.0 / (1 << min(16, bit_depth))
