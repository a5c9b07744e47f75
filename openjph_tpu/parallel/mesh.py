"""Device-mesh scale-out for the HTJ2K codec.

Three sharding axes map the codec onto a TPU pod slice
(SURVEY.md §2.4):
 - 'b' (block-parallel): codeblock batches shard over chips — the
   dominant axis; each chip decodes/encodes its slice of the batch
   with no communication (codeblocks are independent by construction,
   ojph_subband.cpp:292-333).
 - row-sharded spatial: large tiles shard by rows; DWT lifting
   exchanges halo rows over ICI (parallel.dwt_sharded).
 - frames across hosts over DCN: plain data parallelism at the
   pipeline level (one stream per process; no in-graph comms).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..tpu.block_decode import decode_cleanup_core


def make_mesh(n_devices: Optional[int] = None, axis: str = 'b') -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def pad_to_multiple(n: int, m: int) -> int:
    return -(-n // m) * m


@partial(jax.jit, static_argnums=(0, 5, 6))
def _decode_sharded(mesh, mel, vlc, ms, p, width, height):
    shard = NamedSharding(mesh, P('b'))
    mel = jax.lax.with_sharding_constraint(mel, shard)
    vlc = jax.lax.with_sharding_constraint(vlc, shard)
    ms = jax.lax.with_sharding_constraint(ms, shard)
    p = jax.lax.with_sharding_constraint(p, shard)
    return decode_cleanup_core(mel, vlc, ms, p, width, height)


def decode_blocks_sharded(mesh: Mesh, streams, p, width: int,
                          height: int):
    """Decode a batch of same-shape cleanup segments sharded over the
    mesh 'b' axis.  Lane count must divide evenly by the mesh size
    (pad with replicas via pad_to_multiple)."""
    return _decode_sharded(mesh, streams['mel'], streams['vlc'],
                           streams['ms'], p, width, height)
