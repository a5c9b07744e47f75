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

from ..core.atk import ATK_IRV97, ATK_REV53, AtkKernel

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


def fwd_atk_1d(x: jax.Array, even: bool, axis: int, kernel: AtkKernel):
    """Forward lifting along axis with an arbitrary first-order kernel;
    returns (L, H).  ``kernel`` is static — each kernel compiles its own
    fused elementwise chain.

    Defined as the exact inverse of the reference's synthesis state
    machine (see ops/dwt.py:fwd_atk_1d): synthesis step j updates the
    L-storage plane for even j, H-storage for odd j, at phase parity
    even^(j&1); analysis undoes steps Natk-1 .. 0, then scales storage
    (L *= 1/K, H *= K)."""
    n = x.shape[axis]
    if n == 0:
        return x, x  # empty line: both bands empty (reference skips)
    if n == 1:
        empty = _take(x, 0, 0, axis)
        if even:
            return x, empty
        scaled = (x * 2) if kernel.reversible else (x * jnp.float32(2.0))
        return empty, scaled
    P = list(_phase_split(x, even, axis))
    for j in range(kernel.num_steps - 1, -1, -1):
        bidx = j & 1
        ev_j = even if (j & 1) == 0 else not even
        B, O = P[bidx], P[1 - bidx]
        Oe = _ext(O, axis)
        off = 0 if ev_j else 1
        bw = B.shape[axis]
        s0 = _take(Oe, off, bw, axis)
        s1 = _take(Oe, off + 1, bw, axis)
        if kernel.reversible:
            a, b, e = kernel.steps[j]
            P[bidx] = _rev_step(a, b, e, B, s0, s1, synthesis=False)
        else:
            P[bidx] = B + jnp.float32(kernel.steps[j]) * (s0 + s1)
    if not kernel.reversible:
        K = kernel.K
        P[0] = P[0] * jnp.float32(1.0 / K)
        P[1] = P[1] * jnp.float32(K)
    return P[0], P[1]


def inv_atk_1d(L: jax.Array, H: jax.Array, even: bool, axis: int,
               kernel: AtkKernel):
    """Inverse lifting along axis (gen_rev/irv_horz_syn); returns the
    interleaved signal."""
    n = L.shape[axis] + H.shape[axis]
    if n == 0:
        return L  # empty line (reference skips)
    if n == 1:
        if even:
            return L
        return (H >> 1) if kernel.reversible else H * jnp.float32(0.5)
    if kernel.reversible:
        aug, oth = L, H
    else:
        K = kernel.K
        aug = L * jnp.float32(K)
        oth = H * jnp.float32(1.0 / K)
    ev = even
    for s in kernel.steps:
        othe = _ext(oth, axis)
        off = 0 if ev else 1
        aw = aug.shape[axis]
        if kernel.reversible:
            a, b, e = s
            aug = _rev_step(a, b, e, aug, _take(othe, off, aw, axis),
                            _take(othe, off + 1, aw, axis), synthesis=True)
        else:
            aug = aug - jnp.float32(s) * (_take(othe, off, aw, axis)
                                          + _take(othe, off + 1, aw, axis))
        aug, oth = oth, aug
        ev = not ev
    if kernel.num_steps % 2:
        aug, oth = oth, aug
    return _interleave(aug, oth, even, axis)


def fwd_rev53_1d(x: jax.Array, even: bool, axis: int):
    """Forward 5/3 along axis; returns (L, H)."""
    return fwd_atk_1d(x, even, axis, ATK_REV53)


def inv_rev53_1d(L: jax.Array, H: jax.Array, even: bool, axis: int):
    """Inverse 5/3 along axis; returns the interleaved signal."""
    return inv_atk_1d(L, H, even, axis, ATK_REV53)


def fwd_irv97_1d(x: jax.Array, even: bool, axis: int):
    """Forward 9/7 along axis (float32) with K scaling applied."""
    return fwd_atk_1d(x, even, axis, ATK_IRV97)


def inv_irv97_1d(L: jax.Array, H: jax.Array, even: bool, axis: int):
    """Inverse 9/7 along axis (float32)."""
    return inv_atk_1d(L, H, even, axis, ATK_IRV97)


def _kernel_for(reversible: bool, kernel: AtkKernel) -> AtkKernel:
    return kernel or (ATK_REV53 if reversible else ATK_IRV97)


# jitted single-axis entry points for Part-2 DFS levels that split in
# only one direction (resolution::push_line/pull_line one-way paths)
fwd_atk_1d_jit = partial(jax.jit, static_argnums=(1, 2, 3))(fwd_atk_1d)
inv_atk_1d_jit = partial(jax.jit, static_argnums=(2, 3, 4))(inv_atk_1d)


@partial(jax.jit, static_argnums=(1, 2, 3, 4))
def fwd_dwt2d(x: jax.Array, h_even: bool, v_even: bool, reversible: bool,
              kernel: AtkKernel = None):
    """One 2D analysis level; returns (LL, HL, LH, HH).

    Parity: resolution::push_line vertical lifting ring fused with
    horizontal analysis (ojph_resolution.cpp:530-710), computed here as
    whole-plane vertical-then-horizontal lifting."""
    k = _kernel_for(reversible, kernel)
    Lv, Hv = fwd_atk_1d(x, v_even, x.ndim - 2, k)
    LL, HL = fwd_atk_1d(Lv, h_even, x.ndim - 1, k)
    LH, HH = fwd_atk_1d(Hv, h_even, x.ndim - 1, k)
    return LL, HL, LH, HH


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def inv_dwt2d(LL, HL, LH, HH, h_even: bool, v_even: bool,
              reversible: bool, kernel: AtkKernel = None):
    """One 2D synthesis level; inverse of fwd_dwt2d
    (resolution::pull_line, ojph_resolution.cpp:713-949)."""
    k = _kernel_for(reversible, kernel)
    Lv = inv_atk_1d(LL, HL, h_even, LL.ndim - 1, k)
    Hv = inv_atk_1d(LH, HH, h_even, LL.ndim - 1, k)
    return inv_atk_1d(Lv, Hv, v_even, LL.ndim - 2, k)
