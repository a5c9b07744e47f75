"""Batched HT cleanup-pass block decoder on TPU (JAX lax.scan).

Decodes N same-shape codeblocks at once; the codeblock is the batch
axis (SURVEY.md §2.4: codeblock independence is *the* TPU parallel
axis).  Within a block the three bitstreams force sequential decode in
quad raster order, exactly as in the reference
(ojph_block_decoder32.cpp:855-1316); the scan body is vectorized over
the N lanes, so each sequential step is an 8x128-lane VPU op.

Streams arrive pre-unstuffed as dense LSB-first uint32 words (see
bitprep.py).  Reader state per lane is a 64-bit window kept as two
uint32 (TPU has no native 64-bit integers) + a bit count + word index;
each stream does at most one masked word-gather per scan step.

Covers the cleanup pass only — the OpenJPH encoder emits exactly one
pass (ojph_codeblock.cpp:142-175), so this is the hot path.  Blocks
with SigProp/MagRef passes or >30 bitplanes fall back to the scalar
decoder (coding/decoder.py) in the pipeline layer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.tables import MEL_E, get_tables

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


# ---------------------------------------------------------------------------
# Bit-window reader: state pytree (lo, hi, nbits, widx) per lane.
# Invariant: logical window = lo | hi<<32, valid low `nbits` bits,
# consumed LSB-first.  refill() guarantees nbits >= 32.
# ---------------------------------------------------------------------------

def _reader_init(n):
    z = jnp.zeros((n,), _U32)
    return (z, z, jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32))


def _refill(state, words):
    lo, hi, nb, wi = state
    wic = jnp.minimum(wi, words.shape[1] - 1)  # clamp onto guard word
    w = jnp.take_along_axis(words, wic[:, None].astype(jnp.int32),
                            axis=1, mode='clip')[:, 0]
    need = nb < 32
    nbu = nb.astype(_U32)
    sh_lo = jnp.where(nb == 0, w, lo | (w << jnp.minimum(nbu, 31)))
    sh_hi = jnp.where(nb == 0, _u32(0),
                      w >> (_u32(32) - jnp.clip(nbu, 1, 31)))
    lo2 = jnp.where(need, sh_lo, lo)
    hi2 = jnp.where(need, sh_hi, hi)
    nb2 = jnp.where(need, nb + 32, nb)
    wi2 = jnp.where(need, wi + 1, wi)
    return (lo2, hi2, nb2, wi2)


def _advance(state, n):
    """Consume n in [0, 32] bits (n may vary per lane)."""
    lo, hi, nb, wi = state
    n = n.astype(jnp.int32) if hasattr(n, 'astype') \
        else jnp.full_like(nb, n)
    nc = jnp.clip(n, 1, 31).astype(_U32)
    lo_mid = (lo >> nc) | (hi << (_u32(32) - nc))
    lo2 = jnp.where(n == 0, lo, jnp.where(n == 32, hi, lo_mid))
    hi2 = jnp.where(n == 0, hi, jnp.where(n == 32, _u32(0), hi >> nc))
    return (lo2, hi2, nb - n, wi)


def _peek(state):
    return state[0]


def _extract(state, k):
    """Read k (per-lane, 0..31) bits LSB-first."""
    k = k.astype(jnp.int32) if hasattr(k, 'astype') \
        else jnp.full((state[0].shape[0],), k, jnp.int32)
    mask = (_u32(1) << jnp.clip(k, 0, 31).astype(_U32)) - _u32(1)
    mask = jnp.where(k >= 32, _u32(0xFFFFFFFF), mask)
    val = state[0] & mask
    return val, _advance(state, k)


def _bitrev(v, length, maxlen=5):
    """Bit-reverse the low `length` bits of v (length <= maxlen)."""
    r = jnp.zeros_like(v)
    for i in range(maxlen):
        bit = (v >> _u32(i)) & _u32(1)
        pos = (length - 1 - i).astype(jnp.int32)
        r = r | jnp.where(pos >= 0,
                          bit << jnp.clip(pos, 0, 31).astype(_U32),
                          _u32(0))
    return r


# ---------------------------------------------------------------------------
# MEL decoder (dec_mel_st, ojph_block_decoder32.cpp:63-269), vectorized.
# State: (reader, k); `run` is carried by the caller.
# ---------------------------------------------------------------------------

# numpy at module scope: materializing a device array at import time
# would initialize the JAX backend as a side effect of
# `import openjph_tpu` (breaking jax.distributed setup ordering)
_MEL_E_NP = np.asarray(MEL_E, np.int32)


def _mel_get_run(mask, mel_st, mel_k, run):
    """Masked MEL run decode; lanes where ~mask keep their state."""
    eva = jnp.take(jnp.asarray(_MEL_E_NP), jnp.clip(mel_k, 0, 12),
                   mode='clip')
    b, st1 = _extract(mel_st, jnp.where(mask, 1, 0))
    one = mask & (b == 1)
    vrev, st2 = _extract(st1, jnp.where(mask & (b == 0), eva, 0))
    v = _bitrev(vrev, jnp.asarray(eva, jnp.int32))
    run_one = ((_u32(1) << eva.astype(_U32)) - _u32(1)) << _u32(1)
    run_zero = (v << _u32(1)) + _u32(1)
    new_run = jnp.where(one, run_one, run_zero).astype(jnp.int32)
    new_k = jnp.where(one, jnp.minimum(mel_k + 1, 12),
                      jnp.maximum(mel_k - 1, 0))
    return (jnp.where(mask, new_run, run),
            st2, jnp.where(mask, new_k, mel_k))


# ---------------------------------------------------------------------------
# Step 1: MEL + VLC + UVLC -> per-quad (inf, u) records
# (ojph_block_decoder32.cpp:855-1088)
# ---------------------------------------------------------------------------

def _tables_jax():
    t = get_tables()
    vlc = jnp.asarray(np.concatenate([t['dec_vlc0'], t['dec_vlc1']])
                      .astype(np.uint32))
    uvlc = jnp.asarray(np.concatenate([t['dec_uvlc0'], t['dec_uvlc1']])
                       .astype(np.uint32))
    return vlc, uvlc


def _step1(mel_w, vlc_w, qw: int, qh: int):
    """Returns (inf [N, qh, qw2], u [N, qh, qw2]) with qw2 = padded qw."""
    n = mel_w.shape[0]
    vlc_tbl, uvlc_tbl = _tables_jax()
    pairs = (qw + 1) // 2
    qw2 = pairs * 2
    steps = qh * pairs

    qx2s = np.tile(np.arange(pairs) * 2, qh).astype(np.int32)
    qys = np.repeat(np.arange(qh), pairs).astype(np.int32)
    initial = (qys == 0)
    row_start = (qx2s == 0)
    row_end = (qx2s == (pairs - 1) * 2)
    second = (qx2s + 1) < qw
    xs = (jnp.asarray(qx2s), jnp.asarray(initial),
          jnp.asarray(row_start), jnp.asarray(row_end),
          jnp.asarray(second))

    mel0 = _reader_init(n)
    vlc0 = _reader_init(n)
    # run = mel.get_run() before the quad loop (decoder32.cpp:862)
    mel0 = _refill(mel0, mel_w)
    run0, mel0, melk0 = _mel_get_run(
        jnp.ones((n,), bool), mel0, jnp.zeros((n,), jnp.int32),
        jnp.zeros((n,), jnp.int32))

    zrow = jnp.zeros((n, qw2 + 3), _U32)
    carry0 = (vlc0, mel0, melk0, run0, jnp.zeros((n,), _U32),
              zrow, zrow)

    def step(carry, x):
        qx2, initial, row_start, row_end, second = x
        vlc_st, mel_st, mel_k, run, c_q, inf_prev, inf_cur = carry
        vlc_st = _refill(vlc_st, vlc_w)
        mel_st = _refill(mel_st, mel_w)
        c_q = jnp.where(row_start, _u32(0), c_q)
        a0 = jax.lax.dynamic_slice_in_dim(inf_prev, qx2, 1, axis=1)[:, 0]
        a1 = jax.lax.dynamic_slice_in_dim(inf_prev, qx2 + 1, 1,
                                          axis=1)[:, 0]
        a2 = jax.lax.dynamic_slice_in_dim(inf_prev, qx2 + 2, 1,
                                          axis=1)[:, 0]
        tbl_base = jnp.where(initial, 0, 1024).astype(jnp.int32)
        ubase = jnp.where(initial, 0, 320).astype(jnp.int32)

        # ---- first quad of the pair ----
        c_q = jnp.where(initial, c_q,
                        c_q | ((a0 & _u32(0xA0)) << _u32(2))
                        | ((a1 & _u32(0x20)) << _u32(4)))
        idx0 = tbl_base + (c_q + (_peek(vlc_st) & _u32(0x7F))) \
            .astype(jnp.int32)
        t0 = jnp.take(vlc_tbl, idx0, mode='clip')
        cz = (c_q == 0)
        run = jnp.where(cz, run - 2, run)
        t0 = jnp.where(cz & (run != -1), _u32(0), t0)
        run, mel_st, mel_k = _mel_get_run(cz & (run < 0), mel_st,
                                          mel_k, run)
        inf_cur = jax.lax.dynamic_update_slice_in_dim(
            inf_cur, t0[:, None], qx2, axis=1)
        c_q = jnp.where(
            initial,
            ((t0 & _u32(0x10)) << _u32(3)) | ((t0 & _u32(0xE0)) << _u32(2)),
            ((t0 & _u32(0x40)) << _u32(2)) | ((t0 & _u32(0x80)) << _u32(1))
            | (a0 & _u32(0x80)) | ((a1 & _u32(0xA0)) << _u32(2))
            | ((a2 & _u32(0x20)) << _u32(4)))
        vlc_st = _advance(vlc_st, (t0 & _u32(7)).astype(jnp.int32))

        # ---- second quad of the pair ----
        idx1 = tbl_base + (c_q + (_peek(vlc_st) & _u32(0x7F))) \
            .astype(jnp.int32)
        t1 = jnp.take(vlc_tbl, idx1, mode='clip')
        cz1 = (c_q == 0) & second
        run = jnp.where(cz1, run - 2, run)
        t1 = jnp.where(cz1 & (run != -1), _u32(0), t1)
        run, mel_st, mel_k = _mel_get_run(cz1 & (run < 0), mel_st,
                                          mel_k, run)
        t1 = jnp.where(second, t1, _u32(0))
        inf_cur = jax.lax.dynamic_update_slice_in_dim(
            inf_cur, t1[:, None], qx2 + 1, axis=1)
        c_q = jnp.where(
            initial,
            ((t1 & _u32(0x10)) << _u32(3)) | ((t1 & _u32(0xE0)) << _u32(2)),
            ((t1 & _u32(0x40)) << _u32(2)) | ((t1 & _u32(0x80)) << _u32(1))
            | (a1 & _u32(0x80)))
        vlc_st = _advance(vlc_st, (t1 & _u32(7)).astype(jnp.int32))

        # ---- u decode for the pair (decoder32.cpp:1001-1088) ----
        uvlc_mode = ((t0 & _u32(8)) << _u32(3)) | ((t1 & _u32(8)) << _u32(4))
        needu = initial & (uvlc_mode == 0xC0)
        run = jnp.where(needu, run - 2, run)
        uvlc_mode = jnp.where(needu & (run == -1), uvlc_mode + _u32(0x40),
                              uvlc_mode)
        run, mel_st, mel_k = _mel_get_run(needu & (run < 0), mel_st,
                                          mel_k, run)
        uidx = ubase + (uvlc_mode + (_peek(vlc_st) & _u32(0x3F))) \
            .astype(jnp.int32)
        ue = jnp.take(uvlc_tbl, uidx, mode='clip')
        vlc_st = _advance(vlc_st, (ue & _u32(7)).astype(jnp.int32))
        ue = ue >> _u32(3)
        length = (ue & _u32(0xF)).astype(jnp.int32)
        tmp, vlc_st = _extract(vlc_st, length)
        ue = ue >> _u32(4)
        len0 = (ue & _u32(7)).astype(_U32)
        ue = ue >> _u32(3)
        kappa = jnp.where(initial, _u32(1), _u32(0))
        u0 = kappa + (ue & _u32(7)) + (tmp & ~(_u32(0xFF) << len0))
        u1 = kappa + (ue >> _u32(3)) + (tmp >> len0)
        u1 = jnp.where(second, u1, _u32(0))

        inf_prev = jnp.where(row_end, inf_cur, inf_prev)
        inf_cur = jnp.where(row_end, jnp.zeros_like(inf_cur), inf_cur)
        carry = (vlc_st, mel_st, mel_k, run, c_q, inf_prev, inf_cur)
        return carry, (t0, t1, u0, u1)

    _, (t0s, t1s, u0s, u1s) = jax.lax.scan(step, carry0, xs)
    # [steps, N] -> [N, qh, qw2]
    inf = jnp.stack([t0s, t1s], axis=-1).reshape(qh, pairs, n, 2)
    inf = jnp.transpose(inf, (2, 0, 1, 3)).reshape(n, qh, qw2)
    u = jnp.stack([u0s, u1s], axis=-1).reshape(qh, pairs, n, 2)
    u = jnp.transpose(u, (2, 0, 1, 3)).reshape(n, qh, qw2)
    return inf, u


# ---------------------------------------------------------------------------
# Step 2: MagSgn exponent reconstruction & sample fill
# (ojph_block_decoder32.cpp:1089-1316)
# ---------------------------------------------------------------------------

def _step2(ms_w, inf, u, p, qw: int, qh: int, width: int, qh_lim=None):
    n = ms_w.shape[0]
    steps = qh * qw
    qxs = np.tile(np.arange(qw), qh).astype(np.int32)
    qys = np.repeat(np.arange(qh), qw).astype(np.int32)
    initial = (qys == 0)
    row_start = (qxs == 0)
    row_end = (qxs == qw - 1)
    two_cols = (qxs * 2 + 1) < width
    if qh_lim is None:
        qh_lim = jnp.full((n,), qh, jnp.int32)
    # per-step quad records, gathered on host side of the scan
    inf_s = jnp.transpose(inf[:, :, :qw].reshape(n, steps), (1, 0))
    u_s = jnp.transpose(u[:, :, :qw].reshape(n, steps), (1, 0))
    xs = (jnp.asarray(qxs), jnp.asarray(qys), jnp.asarray(initial),
          jnp.asarray(row_start),
          jnp.asarray(row_end), jnp.asarray(two_cols), inf_s, u_s)

    pu = p.astype(_U32)
    mmsbp2 = (_u32(32) - pu).astype(_U32)  # missing_msbs + 2

    ms0 = _reader_init(n)
    zrow = jnp.zeros((n, qw + 2), _U32)
    carry0 = (ms0, zrow, zrow, jnp.zeros((n,), _U32),
              jnp.zeros((n,), bool))

    def step(carry, x):
        qx, qy, initial, row_start, row_end, two_cols, q_inf, u_q = x
        ms_st, scr, newv, prev_vn, err = carry
        gamma = q_inf & _u32(0xF0)
        gamma = gamma & (gamma - _u32(0x10))
        s0 = jax.lax.dynamic_slice_in_dim(scr, qx, 1, axis=1)[:, 0]
        s1 = jax.lax.dynamic_slice_in_dim(scr, qx + 1, 1, axis=1)[:, 0]
        emax_v = s0 | s1
        emax = (_u32(31) - jax.lax.clz(emax_v | _u32(2))).astype(_U32)
        kappa = jnp.where(gamma != 0, emax, _u32(1))
        U_q = jnp.where(initial, u_q, u_q + kappa)
        # height-merged batches: rows past a block's real quad-row count
        # decode fill garbage that is cropped later; don't flag errors
        err = err | ((U_q > mmsbp2) & (qy < qh_lim))

        vals = []
        v_ns = []
        for bit in range(4):
            col = bit >> 1
            sig = ((q_inf >> _u32(4 + bit)) & _u32(1)) != 0
            if col == 1:
                sig = sig & two_cols
            ms_st = _refill(ms_st, ms_w)
            m_n = jnp.where(
                sig, (U_q - ((q_inf >> _u32(12 + bit)) & _u32(1)))
                .astype(jnp.int32), 0)
            m_n = jnp.clip(m_n, 0, 31)  # valid streams: m_n <= 31
            ms_val = _peek(ms_st)
            ms_st = _advance(ms_st, m_n)
            m_nu = m_n.astype(_U32)
            v_n = ms_val & ((_u32(1) << m_nu) - _u32(1))
            v_n = v_n | (((q_inf >> _u32(8 + bit)) & _u32(1)) << m_nu)
            v_n = v_n | _u32(1)
            v_n = jnp.where(sig, v_n, _u32(0))
            val = jnp.where(
                sig, (ms_val << _u32(31))
                | ((v_n + _u32(2)) << (pu - _u32(1))), _u32(0))
            vals.append(val)
            v_ns.append(v_n)

        # scratch bookkeeping (row-1 samples feed next quad row's kappa)
        newv = jax.lax.dynamic_update_slice_in_dim(
            newv, (prev_vn | v_ns[1])[:, None], qx, axis=1)
        prev_vn = v_ns[3]
        newv_end = jax.lax.dynamic_update_slice_in_dim(
            newv, prev_vn[:, None], qw, axis=1)
        scr = jnp.where(row_end, newv_end, scr)
        newv = jnp.where(row_end, jnp.zeros_like(newv), newv)
        prev_vn = jnp.where(row_end, _u32(0), prev_vn)
        carry = (ms_st, scr, newv, prev_vn, err)
        return carry, jnp.stack(vals, axis=-1)

    carry, vals = jax.lax.scan(step, carry0, xs)
    err = carry[4]
    # vals [steps, N, 4] with bit order (col0row0, col0row1, col1row0,
    # col1row1) -> dec [N, 2qh, 2qw]
    v = vals.reshape(qh, qw, n, 2, 2)  # [qy, qx, n, col, row]
    dec = jnp.transpose(v, (2, 0, 4, 1, 3)).reshape(n, qh * 2, qw * 2)
    return dec, err


def decode_cleanup_core(mel_w, vlc_w, ms_w, p, width: int, height: int,
                        qh_lim=None):
    """Traceable body of decode_cleanup (for fusing into larger graphs).

    qh_lim [N] (optional): per-lane true quad-row count for
    height-merged batches — rows >= qh_lim decode garbage that the
    caller crops; errors there are suppressed.
    """
    qw = (width + 1) >> 1
    qh = (height + 1) >> 1
    inf, u = _step1(mel_w, vlc_w, qw, qh)
    dec, err = _step2(ms_w, inf, u, p, qw, qh, width, qh_lim)
    return dec[:, :height, :width], err


@partial(jax.jit, static_argnums=(4, 5))
def decode_cleanup(mel_w, vlc_w, ms_w, p, width: int, height: int):
    """Decode N same-shape cleanup segments.

    Args: dense streams from bitprep ([N, W_*] uint32), p = 30 -
    missing_msbs per block [N] int32; static block width/height.
    Returns (dec [N, height, width] uint32 sign-magnitude, err [N]).
    """
    return decode_cleanup_core(mel_w, vlc_w, ms_w, p, width, height)
