"""Color transforms and sample conversions on TPU (jittable JAX).

Parity: /root/reference/src/core/transform/ojph_colour.cpp:220-568.
All elementwise — XLA fuses these into the DWT prologue/epilogue.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

ALPHA_R = 0.299
ALPHA_G = 0.587
ALPHA_B = 0.114
BETA_CB = 0.5 / (1 - 0.114)
BETA_CR = 0.5 / (1 - 0.299)
GAMMA_CB2G = 2.0 * 0.114 * (1.0 - 0.114) / 0.587
GAMMA_CR2G = 2.0 * 0.299 * (1.0 - 0.299) / 0.587
GAMMA_CB2B = 2.0 * (1.0 - 0.114)
GAMMA_CR2R = 2.0 * (1.0 - 0.299)


def rct_forward(r, g, b):
    """Reversible color transform (gen_rct_forward,
    ojph_colour.cpp:443-490)."""
    y = (r + (g << 1) + b) >> 2
    cb = b - g
    cr = r - g
    return y, cb, cr


def rct_backward(y, cb, cr):
    g = y - ((cb + cr) >> 2)
    r = cr + g
    b = cb + g
    return r, g, b


def ict_forward(r, g, b):
    """Irreversible color transform (gen_ict_forward,
    ojph_colour.cpp:545-556); float32."""
    y = (jnp.float32(ALPHA_R) * r + jnp.float32(ALPHA_G) * g
         + jnp.float32(ALPHA_B) * b)
    cb = jnp.float32(BETA_CB) * (b - y)
    cr = jnp.float32(BETA_CR) * (r - y)
    return y, cb, cr


def ict_backward(y, cb, cr):
    g = y - jnp.float32(GAMMA_CR2G) * cr - jnp.float32(GAMMA_CB2G) * cb
    r = y + jnp.float32(GAMMA_CR2R) * cr
    b = y + jnp.float32(GAMMA_CB2B) * cb
    return r, g, b


@partial(jax.jit, static_argnums=(1, 2, 3))
def rev_convert_in(x, bit_depth: int, is_signed: bool, nlt_type3: bool):
    """Image samples -> signed representation, reversible path
    (tile::push, ojph_tile.cpp:349-359)."""
    x = x.astype(jnp.int32)
    shift = 1 << (bit_depth - 1)
    if is_signed and nlt_type3:
        return jnp.where(x >= 0, x, -x - (shift + 1))
    return x if is_signed else x - shift


@partial(jax.jit, static_argnums=(1, 2, 3))
def rev_convert_out(x, bit_depth: int, is_signed: bool, nlt_type3: bool):
    """Inverse of rev_convert_in (tile::pull, ojph_tile.cpp:443-453)."""
    shift = 1 << (bit_depth - 1)
    if is_signed and nlt_type3:
        return jnp.where(x >= 0, x, -x - (shift + 1))
    return x if is_signed else x + shift


@partial(jax.jit, static_argnums=(1, 2, 3))
def irv_convert_to_float(x, bit_depth: int, is_signed: bool,
                         nlt_type3: bool):
    """Integer samples -> normalized float32
    (local_gen_irv_convert_to_float, ojph_colour.cpp:387-422)."""
    x = x.astype(jnp.int32)
    mul = jnp.float32(1.0 / float(1 << bit_depth))
    if is_signed:
        if nlt_type3:
            bias = (1 << (bit_depth - 1)) + 1
            x = jnp.where(x >= 0, x, -x - bias)
    else:
        x = x - (1 << (bit_depth - 1))
    return x.astype(jnp.float32) * mul


@partial(jax.jit, static_argnums=(1, 2, 3))
def irv_convert_to_integer(x, bit_depth: int, is_signed: bool,
                           nlt_type3: bool):
    """float32 -> integer samples with saturation and ojph_round
    semantics (local_gen_irv_convert_to_integer,
    ojph_colour.cpp:315-366; ojph_round, ojph_arch.h:317-326)."""
    neg_limit = jnp.int64(-(1 << (bit_depth - 1))) \
        if bit_depth >= 32 else jnp.int32(-(1 << (bit_depth - 1)))
    mul = jnp.float32(float(1 << bit_depth))
    t = x.astype(jnp.float32) * mul
    fl_up = jnp.float32(float(1 << (bit_depth - 1)))
    fl_low = jnp.float32(-float(1 << (bit_depth - 1)))
    up_lim = (1 << (bit_depth - 1)) - 1
    tr = t + jnp.where(t >= 0, jnp.float32(0.5), jnp.float32(-0.5))
    v = jnp.trunc(tr).astype(jnp.int32)
    v = jnp.where(t >= fl_low, v, neg_limit)
    v = jnp.where(t < fl_up, v, up_lim)
    if is_signed:
        if nlt_type3:
            bias = (1 << (bit_depth - 1)) + 1
            v = jnp.where(v >= 0, v, -v - bias)
        return v
    return v + (1 << (bit_depth - 1))
