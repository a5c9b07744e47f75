"""Wavelet lifting transforms on TPU: whole-plane jittable JAX ops.

Reversible 5/3 (int32, bit-exact with the reference's integer lifting,
ojph_transform.cpp:209-332) and irreversible 9/7 (float32,
init_irv97 coefficients, ojph_params.cpp:2870-2881).

TPU-first formulation: one deinterleave into (L, H) phase planes, then
each lifting step is a fused elementwise op over the whole phase plane
with a one-sample symmetric boundary extension.  XLA fuses the
extension + add + shift chains into single VPU passes; there is no
line ring buffer (that is a CPU cache idiom, see SURVEY.md §2.4).

All functions are shape-polymorphic Python that traces to static
shapes under jit; `even` flags are static (they derive from the
resolution rect origin, known at trace time).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

IRV97_K = 1.230174104914001
IRV97_STEPS = (0.443506852043971,   # update 2
               0.882911075530934,
               -0.052980118572961,
               -1.586134342059924)  # predict 1
REV53_STEPS = ((1, 2, 2), (-1, 1, 1))


def _ext(a: jax.Array, axis: int) -> jax.Array:
    """Symmetric-extend by one sample on both ends along axis."""
    first = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
    last = jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                axis=axis)
    return jnp.concatenate([first, a, last], axis=axis)


def _rev_step(a: int, b: int, e: int, dst, s0, s1, synthesis: bool):
    """One reversible lifting step with the reference's special cases
    (gen_rev_vert_step32, ojph_transform.cpp:209-257)."""
    if a == 1:
        d = (b + s0 + s1) >> e
    elif a == -1 and b == 1 and e == 1:
        d = -((s0 + s1) >> e)
    elif a == -1:
        d = (b - (s0 + s1)) >> e
    else:
        d = (b + a * (s0 + s1)) >> e
    return dst - d if synthesis else dst + d


def _phase_split(x, even: bool, axis: int):
    n = x.shape[axis]
    idx_l = slice(0, n, 2) if even else slice(1, n, 2)
    idx_h = slice(1, n, 2) if even else slice(0, n, 2)
    sl = [slice(None)] * x.ndim
    sl[axis] = idx_l
    lp = x[tuple(sl)]
    sl[axis] = idx_h
    hp = x[tuple(sl)]
    return lp, hp


def _interleave(L, H, even: bool, axis: int):
    n = L.shape[axis] + H.shape[axis]
    shape = list(L.shape)
    shape[axis] = n
    out = jnp.zeros(shape, dtype=L.dtype)
    sl = [slice(None)] * L.ndim
    sl[axis] = slice(0, n, 2) if even else slice(1, n, 2)
    out = out.at[tuple(sl)].set(L)
    sl[axis] = slice(1, n, 2) if even else slice(0, n, 2)
    out = out.at[tuple(sl)].set(H)
    return out


def _take(a, start, size, axis):
    return jax.lax.slice_in_dim(a, start, start + size, axis=axis)


def fwd_rev53_1d(x: jax.Array, even: bool, axis: int):
    """Forward 5/3 along axis; returns (L, H)."""
    n = x.shape[axis]
    if n == 1:
        empty = _take(x, 0, 0, axis)
        return (x, empty) if even else (empty, x * 2)
    lp, hp = _phase_split(x, even, axis)
    cur_even = even
    for (a, b, e) in reversed(REV53_STEPS):
        lpe = _ext(lp, axis)
        off = 1 if cur_even else 0
        hw = hp.shape[axis]
        hp = _rev_step(a, b, e, hp, _take(lpe, off, hw, axis),
                       _take(lpe, off + 1, hw, axis), synthesis=False)
        lp, hp = hp, lp
        cur_even = not cur_even
    return lp, hp


def inv_rev53_1d(L: jax.Array, H: jax.Array, even: bool, axis: int):
    """Inverse 5/3 along axis; returns the interleaved signal."""
    n = L.shape[axis] + H.shape[axis]
    if n == 1:
        return L if even else (H >> 1)
    aug, oth = L, H
    ev = even
    for (a, b, e) in REV53_STEPS:
        othe = _ext(oth, axis)
        off = 0 if ev else 1
        aw = aug.shape[axis]
        aug = _rev_step(a, b, e, aug, _take(othe, off, aw, axis),
                        _take(othe, off + 1, aw, axis), synthesis=True)
        aug, oth = oth, aug
        ev = not ev
    return _interleave(aug, oth, even, axis)


def fwd_irv97_1d(x: jax.Array, even: bool, axis: int):
    """Forward 9/7 along axis (float32) with K scaling applied."""
    n = x.shape[axis]
    if n == 1:
        empty = _take(x, 0, 0, axis)
        return (x, empty) if even else (empty, x * jnp.float32(2.0))
    lp, hp = _phase_split(x, even, axis)
    cur_even = even
    for a in reversed(IRV97_STEPS):
        lpe = _ext(lp, axis)
        off = 1 if cur_even else 0
        hw = hp.shape[axis]
        hp = hp + jnp.float32(a) * (_take(lpe, off, hw, axis)
                                    + _take(lpe, off + 1, hw, axis))
        lp, hp = hp, lp
        cur_even = not cur_even
    return (lp * jnp.float32(1.0 / IRV97_K), hp * jnp.float32(IRV97_K))


def inv_irv97_1d(L: jax.Array, H: jax.Array, even: bool, axis: int):
    """Inverse 9/7 along axis (float32)."""
    n = L.shape[axis] + H.shape[axis]
    if n == 1:
        return L if even else H * jnp.float32(0.5)
    aug = L * jnp.float32(IRV97_K)
    oth = H * jnp.float32(1.0 / IRV97_K)
    ev = even
    for a in IRV97_STEPS:
        othe = _ext(oth, axis)
        off = 0 if ev else 1
        aw = aug.shape[axis]
        aug = aug - jnp.float32(a) * (_take(othe, off, aw, axis)
                                      + _take(othe, off + 1, aw, axis))
        aug, oth = oth, aug
        ev = not ev
    return _interleave(aug, oth, even, axis)


@partial(jax.jit, static_argnums=(1, 2, 3))
def fwd_dwt2d(x: jax.Array, h_even: bool, v_even: bool, reversible: bool):
    """One 2D analysis level; returns (LL, HL, LH, HH).

    Parity: resolution::push_line vertical lifting ring fused with
    horizontal analysis (ojph_resolution.cpp:530-710), computed here as
    whole-plane vertical-then-horizontal lifting."""
    f1d = fwd_rev53_1d if reversible else fwd_irv97_1d
    Lv, Hv = f1d(x, v_even, axis=x.ndim - 2)
    LL, HL = f1d(Lv, h_even, axis=x.ndim - 1)
    LH, HH = f1d(Hv, h_even, axis=x.ndim - 1)
    return LL, HL, LH, HH


@partial(jax.jit, static_argnums=(4, 5, 6))
def inv_dwt2d(LL, HL, LH, HH, h_even: bool, v_even: bool,
              reversible: bool):
    """One 2D synthesis level; inverse of fwd_dwt2d
    (resolution::pull_line, ojph_resolution.cpp:713-949)."""
    i1d = inv_rev53_1d if reversible else inv_irv97_1d
    Lv = i1d(LL, HL, h_even, axis=LL.ndim - 1)
    Hv = i1d(LH, HH, h_even, axis=LL.ndim - 1)
    return i1d(Lv, Hv, v_even, axis=LL.ndim - 2)
