"""Quantization / sign-magnitude transfer on TPU (jittable JAX).

tx_to_cb / tx_from_cb parity:
/root/reference/src/core/codestream/ojph_codestream_gen.cpp:59-168.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnums=(1, 3))
def tx_to_cb(plane, kmax: int, delta_inv, reversible: bool):
    """Subband samples -> sign-magnitude uint32 (sign bit 31, magnitude
    aligned so coded bitplanes end at bit 30-missing_msbs).

    Returns (samples, vals) where vals feeds the reference's max_val
    accounting (gen_rev/irv_tx_to_cb32)."""
    if reversible:
        p32 = plane.astype(jnp.int32)
        sign = jnp.where(p32 < 0, jnp.uint32(0x80000000), jnp.uint32(0))
        mag = jnp.abs(p32).astype(jnp.uint32)
        val = mag << jnp.uint32(31 - kmax)  # wraps mod 2^32 like the C code
        return sign | val, val
    t = jnp.trunc(plane.astype(jnp.float32) * jnp.float32(delta_inv))
    t = t.astype(jnp.int32)
    sign = jnp.where(t < 0, jnp.uint32(0x80000000), jnp.uint32(0))
    val = jnp.abs(t).astype(jnp.uint32)
    return sign | val, val


@partial(jax.jit, static_argnums=(1, 3))
def tx_from_cb(block, kmax: int, delta, reversible: bool):
    """Sign-magnitude -> subband samples (gen_rev/irv_tx_from_cb32)."""
    mag = (block & jnp.uint32(0x7FFFFFFF))
    neg = (block >> jnp.uint32(31)).astype(bool)
    if reversible:
        val = (mag >> jnp.uint32(31 - kmax)).astype(jnp.int32)
        return jnp.where(neg, -val, val)
    val = mag.astype(jnp.float32) * jnp.float32(delta)
    return jnp.where(neg, -val, val)
