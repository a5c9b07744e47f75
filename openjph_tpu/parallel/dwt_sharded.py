"""Row-sharded DWT lifting with ICI halo exchange.

For tiles too large for one chip (BASELINE.json config 5: 100Kx100K
mosaics), planes are sharded by rows across a mesh axis and the
vertical lifting steps exchange one boundary row per step with
jax.lax.ppermute — the TPU-native equivalent of the reference's
`line_buf` pre_size margin cells (ojph_mem.h:176-189) and the +-1
sample overlap of its lifting ring (ojph_resolution.cpp:468-520).
Horizontal lifting is embarrassingly row-parallel and stays local.

Constraints (asserted by callers): the global vertical origin is even,
and every shard holds an even number of rows, so the even/odd phase
split never crosses a shard boundary.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..tpu.dwt import (IRV97_K, IRV97_STEPS, REV53_STEPS, _rev_step,
                       fwd_rev53_1d, inv_rev53_1d,
                       fwd_irv97_1d, inv_irv97_1d)


def _fetch_next_first(x, axis_name):
    """Every shard receives the *next* shard's first row (for the last
    shard: its own last row, i.e. symmetric extension)."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    first = x[:1]
    perm = [(s, (s - 1) % n) for s in range(n)]
    recv = jax.lax.ppermute(first, axis_name, perm)
    return jnp.where(i == n - 1, x[-1:], recv)


def _fetch_prev_last(x, axis_name):
    """Every shard receives the *previous* shard's last row (for shard
    0: its own first row)."""
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    last = x[-1:]
    perm = [(s, (s + 1) % n) for s in range(n)]
    recv = jax.lax.ppermute(last, axis_name, perm)
    return jnp.where(i == 0, x[:1], recv)


def _vert_step_rev(a, b, e, dst, src, off, axis_name, synthesis):
    """One sharded vertical lifting step: dst[i] +-=
    f(src[i+off-1], src[i+off]) with halo rows from the neighbours."""
    lo = _fetch_prev_last(src, axis_name)
    hi = _fetch_next_first(src, axis_name)
    ext = jnp.concatenate([lo, src, hi], axis=0)
    m = dst.shape[0]
    s0 = jax.lax.dynamic_slice_in_dim(ext, off, m, 0)
    s1 = jax.lax.dynamic_slice_in_dim(ext, off + 1, m, 0)
    return _rev_step(a, b, e, dst, s0, s1, synthesis)


def _vert_step_irv(alpha, dst, src, off, axis_name, synthesis):
    lo = _fetch_prev_last(src, axis_name)
    hi = _fetch_next_first(src, axis_name)
    ext = jnp.concatenate([lo, src, hi], axis=0)
    m = dst.shape[0]
    s0 = jax.lax.dynamic_slice_in_dim(ext, off, m, 0)
    s1 = jax.lax.dynamic_slice_in_dim(ext, off + 1, m, 0)
    d = jnp.float32(alpha) * (s0 + s1)
    return dst - d if synthesis else dst + d


def fwd_vert_sharded(x, axis_name, reversible: bool):
    """Vertical analysis on a row-sharded plane (local shard view).
    Local rows must be even; global origin even.  Returns (L, H) local
    halves."""
    lp, hp = x[0::2], x[1::2]
    cur_even = True
    if reversible:
        steps = list(reversed(REV53_STEPS))
        for (a, b, e) in steps:
            off = 1 if cur_even else 0
            hp = _vert_step_rev(a, b, e, hp, lp, off, axis_name, False)
            lp, hp = hp, lp
            cur_even = not cur_even
        return lp, hp
    for alpha in reversed(IRV97_STEPS):
        off = 1 if cur_even else 0
        hp = _vert_step_irv(alpha, hp, lp, off, axis_name, False)
        lp, hp = hp, lp
        cur_even = not cur_even
    return (lp * jnp.float32(1.0 / IRV97_K), hp * jnp.float32(IRV97_K))


def inv_vert_sharded(L, H, axis_name, reversible: bool):
    """Vertical synthesis on row-sharded half planes; returns the
    interleaved local plane."""
    if reversible:
        aug, oth = L, H
        ev = True
        for (a, b, e) in REV53_STEPS:
            off = 0 if ev else 1
            aug = _vert_step_rev(a, b, e, aug, oth, off, axis_name, True)
            aug, oth = oth, aug
            ev = not ev
    else:
        aug = L * jnp.float32(IRV97_K)
        oth = H * jnp.float32(1.0 / IRV97_K)
        ev = True
        for alpha in IRV97_STEPS:
            off = 0 if ev else 1
            aug = _vert_step_irv(alpha, aug, oth, off, axis_name, True)
            aug, oth = oth, aug
            ev = not ev
    n = L.shape[0] + H.shape[0]
    out = jnp.zeros((n,) + L.shape[1:], L.dtype)
    out = out.at[0::2].set(aug)
    out = out.at[1::2].set(oth)
    return out


def fwd_dwt2d_sharded(x, axis_name, reversible: bool):
    """One 2D analysis level on a row-sharded plane: sharded vertical
    lifting (halo ppermute) + local horizontal lifting.  Assumes even
    origins.  Returns local (LL, HL, LH, HH)."""
    Lv, Hv = fwd_vert_sharded(x, axis_name, reversible)
    f1d = fwd_rev53_1d if reversible else fwd_irv97_1d
    LL, HL = f1d(Lv, True, axis=1)
    LH, HH = f1d(Hv, True, axis=1)
    return LL, HL, LH, HH


def inv_dwt2d_sharded(LL, HL, LH, HH, axis_name, reversible: bool):
    """Inverse of fwd_dwt2d_sharded."""
    i1d = inv_rev53_1d if reversible else inv_irv97_1d
    Lv = i1d(LL, HL, True, axis=1)
    Hv = i1d(LH, HH, True, axis=1)
    return inv_vert_sharded(Lv, Hv, axis_name, reversible)
