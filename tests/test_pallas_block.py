"""Parity: the Pallas HT cleanup decoder kernel vs the verified
lax.scan implementation (block_decode.py).

On the CPU test mesh the kernel runs in Pallas interpret mode, so this
covers the kernel logic (bit-window readers, chunked table gathers,
scratch rotation) without TPU hardware; the same code path compiles
via Mosaic on a real chip.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openjph_tpu import encode
from openjph_tpu.tpu.pipeline import TpuDecoder, _build_plan
from openjph_tpu.tpu.block_decode import decode_cleanup
from openjph_tpu.tpu.block_decode_pallas import decode_cleanup_pallas


def _group_inputs(stream):
    dec = TpuDecoder(stream)
    plan = _build_plan(dec)
    assert plan is not None
    gds = dec._group_arrays(plan)
    out = []
    for g, gd in zip(plan.groups, gds):
        out.append((g, (gd['mel'], gd['vlc'], gd['ms'], gd['p'],
                        gd['qhl'])))
    return out


@pytest.mark.parametrize('shape,bs', [((64, 80), 32), ((40, 52), 16)])
def test_pallas_matches_scan(rng, shape, bs, monkeypatch):
    # force 128-lane padding as on the TPU path
    import openjph_tpu.tpu.pipeline as P
    monkeypatch.setattr(P, '_USE_PALLAS', True)
    img = (rng.randint(0, 256, shape)).astype(np.int32)
    stream = encode([img], bit_depth=8, reversible=True,
                    block_size=(bs, bs), num_decomps=2)
    for g, (mel, vlc, ms, p, qhl) in _group_inputs(stream):
        ref, eref = decode_cleanup(jnp.asarray(mel), jnp.asarray(vlc),
                                   jnp.asarray(ms), jnp.asarray(p),
                                   g.w, g.h)
        out, err = decode_cleanup_pallas(
            jnp.asarray(mel), jnp.asarray(vlc), jnp.asarray(ms),
            jnp.asarray(p), g.w, g.h, jnp.asarray(qhl),
            interpret=True)
        ref = np.asarray(ref)
        out = np.asarray(out)
        for i in range(len(g.members)):
            hh = int(qhl[i]) * 2
            assert np.array_equal(out[i, :hh], ref[i, :hh]), \
                f'lane {i} of group w={g.w}'
        assert not np.asarray(err)[:len(g.members)].any()


@pytest.mark.parametrize('budget', [1 << 18, 1 << 20])
def test_pallas_lane_tiling(rng, budget, monkeypatch):
    """Shrunken VMEM budget forces the lane-axis grid tiling (and,
    when the tile doesn't divide the sublane count, the lane-padding
    path); results must stay bit-identical to the scan decoder."""
    import openjph_tpu.tpu.pipeline as P
    import openjph_tpu.tpu.block_decode_pallas as BP
    monkeypatch.setattr(P, '_USE_PALLAS', True)
    monkeypatch.setattr(BP, '_VMEM_BUDGET', budget)
    img = (rng.randint(0, 256, (96, 128))).astype(np.int32)
    stream = encode([img], bit_depth=8, reversible=True,
                    block_size=(32, 32), num_decomps=2)
    for g, (mel, vlc, ms, p, qhl) in _group_inputs(stream):
        ref, _ = decode_cleanup(jnp.asarray(mel), jnp.asarray(vlc),
                                jnp.asarray(ms), jnp.asarray(p),
                                g.w, g.h)
        out, err = decode_cleanup_pallas(
            jnp.asarray(mel), jnp.asarray(vlc), jnp.asarray(ms),
            jnp.asarray(p), g.w, g.h, jnp.asarray(qhl),
            interpret=True)
        ref = np.asarray(ref)
        out = np.asarray(out)
        for i in range(len(g.members)):
            hh = int(qhl[i]) * 2
            assert np.array_equal(out[i, :hh], ref[i, :hh]), \
                f'lane {i} of group w={g.w} (budget {budget})'
        assert not np.asarray(err)[:len(g.members)].any()
