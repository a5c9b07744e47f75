"""Parity: the Pallas cleanup decoder's RAW reader mode (in-kernel
byte unstuffing, block_decode_pallas raw=True) vs the verified
lax.scan implementation on dense (host/XLA-unstuffed) windows.

The raw mode consumes exactly what the device packer ships for the
XLA-unstuff path — each lane's stuffed bytes d[0:lcup-1] with the
MagSgn prefix forward and the MEL/VLC shared suffix forward /
reversed (pipeline._pack_device blob contract) — and unstuffs inside
the kernel's readers like the reference's dec_mel_st / rev_struct /
frwd_struct32 (ojph_block_decoder32.cpp:63-723).  Interpret mode on
the CPU mesh; the same code path compiles via Mosaic on a chip.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from openjph_tpu import encode
from openjph_tpu.tpu.pipeline import TpuDecoder, _build_plan, \
    _pack_device
from openjph_tpu.tpu.block_decode import decode_cleanup
from openjph_tpu.tpu.block_decode_pallas import \
    decode_cleanup_pallas_raw
from openjph_tpu.tpu.unstuff import _lane_words_fwd, _lane_words_rev


def _raw_group_inputs(stream):
    """Rebuild the runner's raw-mode per-group kernel inputs from the
    device packer's single blob+meta buffer (pipeline._make_runner
    raw_t1 branch)."""
    dec = TpuDecoder(stream)
    plan = _build_plan(dec)
    assert plan is not None
    assert not plan.has_refine
    r = _pack_device([(dec, plan)])
    assert r is not None, 'stream exceeded the unstuff budget'
    (buf,), _uk = r
    tl = sum(g.n_pad for g in plan.groups)
    meta = buf[buf.shape[0] - tl * 8:].view(np.int32).reshape(tl, 8)
    words = jnp.asarray(buf)
    out = []
    s0 = 0
    for g in plan.groups:
        mg = meta[s0:s0 + g.n_pad]
        s0 += g.n_pad
        lane_off = jnp.asarray(mg[:, 0])
        ms_n = jnp.asarray(mg[:, 1])
        sh_n = jnp.asarray(mg[:, 2])
        wm, wv_, ws_ = g.words
        ms = _lane_words_fwd(words, lane_off, ws_)
        mel = _lane_words_fwd(words, lane_off + ms_n, wm)
        vlc = _lane_words_rev(words, lane_off + ms_n, sh_n, wv_)
        out.append((g, (mel, vlc, ms, mg[:, 6], mg[:, 7], ms_n, sh_n)))
    return dec, plan, out


def _dense_ref(dec, plan):
    """Scan-decoder outputs on the host-unstuffed dense windows."""
    refs = []
    for g, gd in zip(plan.groups, dec._group_arrays(plan)):
        ref, _ = decode_cleanup(jnp.asarray(gd['mel']),
                                jnp.asarray(gd['vlc']),
                                jnp.asarray(gd['ms']),
                                jnp.asarray(gd['p']), g.w, g.h)
        refs.append((np.asarray(ref), gd['qhl']))
    return refs


@pytest.mark.parametrize('shape,bs,noise', [((64, 80), 32, 40),
                                            ((40, 52), 16, 90),
                                            ((128, 96), 64, 120)])
def test_pallas_raw_matches_scan(rng, shape, bs, noise, monkeypatch):
    import openjph_tpu.tpu.pipeline as P
    monkeypatch.setattr(P, '_USE_PALLAS', True)
    # heavy noise drives more 0xFF/0x7F coded bytes (stuffing events)
    img = rng.randint(0, 256, shape).astype(np.int32)
    img[::3] = np.clip(img[::3] + rng.randint(-noise, noise,
                                              img[::3].shape), 0, 255)
    stream = encode([img], bit_depth=8, reversible=True,
                    block_size=(bs, bs), num_decomps=2)
    dec, plan, groups = _raw_group_inputs(stream)
    refs = _dense_ref(dec, plan)
    for (g, (mel, vlc, ms, p, qhl, msn, shn)), (ref, qhl_d) in \
            zip(groups, refs):
        out, err = decode_cleanup_pallas_raw(
            mel, vlc, ms, jnp.asarray(p), g.w, g.h,
            jnp.asarray(qhl), msn, shn, interpret=True)
        out = np.asarray(out)
        for i in range(len(g.members)):
            hh = int(qhl[i]) * 2
            assert np.array_equal(out[i, :hh], ref[i, :hh]), \
                f'lane {i} of group w={g.w} h={g.h}'
        assert not np.asarray(err)[:len(g.members)].any()
