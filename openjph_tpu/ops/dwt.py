"""Wavelet lifting transforms: reversible 5/3 (integer) and irreversible
9/7 (float32), whole-array formulation.

The reference computes these line-by-line with a ring of lifting buffers
(ojph_resolution.cpp:461-949, ojph_transform.cpp:203-850); on TPU we
instead transform whole subband planes at once.  Per lifting step, each
phase array is symmetric-extended by one sample, which is equivalent to
the reference's per-step `lp[-1]=lp[0]; lp[w]=lp[w-1]` handling, so the
integer path is bit-exact with OpenJPH.

Conventions:
 - ``even`` means the resolution rect starts at an even canvas
   coordinate (horz: x0, vert: y0); the low-pass phase takes samples at
   even canvas positions.
 - 5/3 steps (T.800 / init_rev53, ojph_params.cpp:2884-2896):
   predict  H -= (L0 + L1) >> 1 ; update L += (H0 + H1 + 2) >> 2
 - 9/7 steps (init_irv97, ojph_params.cpp:2870-2881) applied in the
   ATK order with K scaling applied per direction.
"""
from __future__ import annotations

import numpy as np

# 9/7 lifting coefficients and scaling (ojph_params.cpp:2870-2881).
IRV97_K = np.float32(1.230174104914001)
IRV97_STEPS = (np.float32(0.443506852043971),   # step 0 (update 2)
               np.float32(0.882911075530934),   # step 1
               np.float32(-0.052980118572961),  # step 2
               np.float32(-1.586134342059924))  # step 3 (predict 1)
# 5/3 steps as (a, b, e) (ojph_params.cpp:2884-2896)
REV53_STEPS = ((1, 2, 2), (-1, 1, 1))


def _ext(a: np.ndarray, axis: int) -> np.ndarray:
    """Symmetric-extend by one sample on both ends along axis."""
    first = np.take(a, [0], axis=axis)
    last = np.take(a, [a.shape[axis] - 1], axis=axis)
    return np.concatenate([first, a, last], axis=axis)


def _rev_step(a: int, b: int, e: int, dst, s0, s1, synthesis: bool):
    """One reversible lifting step: dst ± ((b + a*(s0+s1)) >> e) with the
    reference's special cases (gen_rev_vert_step32,
    ojph_transform.cpp:209-257).  Arrays are int32/int64; >> is
    arithmetic."""
    if a == 1:
        d = (b + s0 + s1) >> e
    elif a == -1 and b == 1 and e == 1:
        d = -((s0 + s1) >> e)
    elif a == -1:
        d = (b - (s0 + s1)) >> e
    else:
        d = (b + a * (s0 + s1)) >> e
    return dst - d if synthesis else dst + d


def fwd_rev53_1d(x: np.ndarray, even: bool, axis: int):
    """Forward 5/3 along axis; returns (L, H)."""
    x = np.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n == 1:
        if even:
            return (np.moveaxis(x, 0, axis),
                    np.moveaxis(x[:0], 0, axis))
        return (np.moveaxis(x[:0], 0, axis),
                np.moveaxis(x * 2, 0, axis))
    lp = x[0::2] if even else x[1::2]
    hp = x[1::2] if even else x[0::2]
    cur_even = even
    for (a, b, e) in reversed(REV53_STEPS):
        lpe = np.concatenate([lp[:1], lp, lp[-1:]], axis=0)
        off = 1 if cur_even else 0
        hw = hp.shape[0]
        hp = _rev_step(a, b, e, hp, lpe[off:off + hw],
                       lpe[off + 1:off + 1 + hw], synthesis=False)
        lp, hp = hp, lp
        cur_even = not cur_even
    return np.moveaxis(lp, 0, axis), np.moveaxis(hp, 0, axis)


def inv_rev53_1d(L: np.ndarray, H: np.ndarray, even: bool, axis: int):
    """Inverse 5/3 along axis; returns interleaved signal."""
    L = np.moveaxis(L, axis, 0)
    H = np.moveaxis(H, axis, 0)
    n = L.shape[0] + H.shape[0]
    if n == 1:
        out = L if even else (H >> 1)
        return np.moveaxis(out, 0, axis)
    aug, oth = L.copy(), H.copy()
    ev = even
    for (a, b, e) in REV53_STEPS:
        othe = np.concatenate([oth[:1], oth, oth[-1:]], axis=0)
        off = 0 if ev else 1
        aw = aug.shape[0]
        aug = _rev_step(a, b, e, aug, othe[off:off + aw],
                        othe[off + 1:off + 1 + aw], synthesis=True)
        aug, oth = oth, aug
        ev = not ev
    L2, H2 = aug, oth  # after num_steps swaps, roles are restored
    out = np.empty((n,) + L.shape[1:], dtype=L.dtype)
    if even:
        out[0::2], out[1::2] = L2, H2
    else:
        out[1::2], out[0::2] = L2, H2
    return np.moveaxis(out, 0, axis)


def fwd_irv97_1d(x: np.ndarray, even: bool, axis: int):
    """Forward 9/7 along axis (float32); returns (L, H) with K scaling
    applied (L *= 1/K, H *= K) as in gen_irv_horz_ana."""
    x = np.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n == 1:
        if even:
            return np.moveaxis(x, 0, axis), np.moveaxis(x[:0], 0, axis)
        return (np.moveaxis(x[:0], 0, axis),
                np.moveaxis(x * np.float32(2.0), 0, axis))
    lp = x[0::2] if even else x[1::2]
    hp = x[1::2] if even else x[0::2]
    cur_even = even
    for a in reversed(IRV97_STEPS):
        lpe = np.concatenate([lp[:1], lp, lp[-1:]], axis=0)
        off = 1 if cur_even else 0
        hw = hp.shape[0]
        hp = hp + a * (lpe[off:off + hw] + lpe[off + 1:off + 1 + hw])
        lp, hp = hp, lp
        cur_even = not cur_even
    lp = lp * (np.float32(1.0) / IRV97_K)
    hp = hp * IRV97_K
    return np.moveaxis(lp, 0, axis), np.moveaxis(hp, 0, axis)


def inv_irv97_1d(L: np.ndarray, H: np.ndarray, even: bool, axis: int):
    """Inverse 9/7 along axis (float32)."""
    L = np.moveaxis(L, axis, 0)
    H = np.moveaxis(H, axis, 0)
    n = L.shape[0] + H.shape[0]
    if n == 1:
        out = L if even else H * np.float32(0.5)
        return np.moveaxis(out, 0, axis)
    aug = L * IRV97_K
    oth = H * (np.float32(1.0) / IRV97_K)
    ev = even
    for a in IRV97_STEPS:
        othe = np.concatenate([oth[:1], oth, oth[-1:]], axis=0)
        off = 0 if ev else 1
        aw = aug.shape[0]
        aug = aug - a * (othe[off:off + aw] + othe[off + 1:off + 1 + aw])
        aug, oth = oth, aug
        ev = not ev
    L2, H2 = aug, oth
    out = np.empty((n,) + L.shape[1:], dtype=np.float32)
    if even:
        out[0::2], out[1::2] = L2, H2
    else:
        out[1::2], out[0::2] = L2, H2
    return np.moveaxis(out, 0, axis)


def fwd_dwt2d(x: np.ndarray, x0: int, y0: int, reversible: bool):
    """One 2D analysis level on a resolution plane whose top-left canvas
    coordinate is (x0, y0).  Returns (LL, HL, LH, HH).

    Vertical first then horizontal, matching resolution::push_line
    (the two orders commute for separable lifting, and the reference
    interleaves them line-wise; bit-exactness verified against the
    oracle)."""
    h_even = (x0 & 1) == 0
    v_even = (y0 & 1) == 0
    f1d = fwd_rev53_1d if reversible else fwd_irv97_1d
    Lv, Hv = f1d(x, v_even, axis=0)
    LL, HL = f1d(Lv, h_even, axis=1)
    LH, HH = f1d(Hv, h_even, axis=1)
    return LL, HL, LH, HH


def inv_dwt2d(LL, HL, LH, HH, x0: int, y0: int, reversible: bool):
    """One 2D synthesis level; inverse of fwd_dwt2d."""
    h_even = (x0 & 1) == 0
    v_even = (y0 & 1) == 0
    i1d = inv_rev53_1d if reversible else inv_irv97_1d
    Lv = i1d(LL, HL, h_even, axis=1)
    Hv = i1d(LH, HH, h_even, axis=1)
    return i1d(Lv, Hv, v_even, axis=0)
