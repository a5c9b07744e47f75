"""Multi-device sharding tests on the virtual 8-device CPU mesh:
sharded block decode and halo-exchange DWT must match the single-device
ops bit-exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from openjph_tpu import encode
from openjph_tpu.codec import Decoder
from openjph_tpu.coding.decoder import decode_codeblock
from openjph_tpu.ops import dwt as ndwt
from openjph_tpu.parallel import dwt_sharded as pdwt
from openjph_tpu.parallel.mesh import (decode_blocks_sharded, make_mesh,
                                       pad_to_multiple)
from openjph_tpu.tpu.bitprep import prep_cleanup_streams


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize('reversible', [True, False])
def test_sharded_dwt_parity(rng, reversible):
    mesh = make_mesh(axis='y')
    h, w = 128, 96
    dtype = np.int32 if reversible else np.float32
    x = rng.randint(-500, 500, size=(h, w)).astype(dtype)

    fwd = shard_map(
        lambda a: pdwt.fwd_dwt2d_sharded(a, 'y', reversible),
        mesh=mesh, in_specs=P('y', None),
        out_specs=(P('y', None),) * 4)
    LL, HL, LH, HH = jax.jit(fwd)(x)
    ref = ndwt.fwd_dwt2d(x, 0, 0, reversible)
    for a, b in zip(ref, (LL, HL, LH, HH)):
        if reversible:
            assert np.array_equal(a, np.asarray(b))
        else:
            np.testing.assert_allclose(a, np.asarray(b), rtol=2e-6,
                                       atol=2e-4)

    inv = shard_map(
        lambda a, b, c, d: pdwt.inv_dwt2d_sharded(a, b, c, d, 'y',
                                                  reversible),
        mesh=mesh, in_specs=(P('y', None),) * 4,
        out_specs=P('y', None))
    back = jax.jit(inv)(LL, HL, LH, HH)
    if reversible:
        assert np.array_equal(np.asarray(back), x)
    else:
        np.testing.assert_allclose(np.asarray(back), x, rtol=2e-5,
                                   atol=2e-3)


def test_sharded_block_decode(rng):
    img = rng.randint(0, 256, size=(256, 256)).astype(np.int32)
    stream = encode(img, reversible=True, num_decomps=2)
    dec = Decoder(stream)
    st = dec.tiles[0]
    blocks = []
    for c, comp in enumerate(st.geom.comps):
        for r, res in enumerate(comp.resolutions):
            for b in range(4):
                sb = res.bands[b]
                if sb is None or sb.empty:
                    continue
                coded = dec.tiles[0].coded[c][r][b]
                for g in sb.blocks:
                    cb = coded[g.cb_y * sb.num_cb_x + g.cb_x]
                    if cb and cb.data and (g.rect.w, g.rect.h) == (64, 64):
                        blocks.append((bytes(cb.data), cb.missing_msbs,
                                       cb.pass_length[0]))
    assert len(blocks) >= 8
    mesh = make_mesh()
    n = pad_to_multiple(len(blocks), 8)
    blocks += [blocks[0]] * (n - len(blocks))
    datas = [b[0] for b in blocks]
    lcups = np.array([b[2] for b in blocks], np.int64)
    miss = np.array([b[1] for b in blocks], np.int32)
    scups = np.array([(d[lc - 1] << 4) + (d[lc - 2] & 0xF)
                      for d, lc in zip(datas, lcups)], np.int64)
    streams = prep_cleanup_streams(datas, lcups, scups)
    got, err = decode_blocks_sharded(
        mesh, streams, (30 - miss).astype(np.int32), 64, 64)
    assert not np.asarray(err).any()
    for i, (d, m, lc) in enumerate(blocks):
        ref = decode_codeblock(d, m, 1, lc, 0, 64, 64)
        assert np.array_equal(np.asarray(got)[i], ref)
