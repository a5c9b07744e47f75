"""Pallas TPU kernel: batched HT cleanup-pass block decoder.

Same algorithm as block_decode.py (the verified lax.scan reference,
itself matching ojph_block_decoder32.cpp:742-1316), but compiled as a
single Mosaic kernel so the per-quad sequential decode runs as
straight-line VPU code instead of ~1500 XLA ops per scan step.

Data layout: the codeblock batch lives on vector registers as
(S, 128) lanes (S sublane rows of 128 lanes).  The three unstuffed
bitstreams arrive as (W, S, 128) word planes (word index outermost) so
an elementwise op over one word plane is a single vreg op.  The grid
iterates over quad rows; all decoder state (bit-window readers, MEL
state, the inter-row significance scratch) persists in VMEM scratch
across grid steps, and each step writes one decoded quad row
(2 sample rows) to the output.

Per-lane divergent memory access (each lane sits at a different word
of its own stream) has no native TPU primitive; refills use a
mask-multiply-reduce over the word plane, and the 2048-entry VLC
tables are gathered through Mosaic's native 128-lane dynamic_gather in
16 chunk passes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..coding.tables import MEL_E, get_tables

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def _gather128(chunk, lo):
    """chunk (S,128) replicated row; lo (S,128) int32 in [0,128)."""
    dn = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(chunk, lo[..., None], dn, slice_sizes=(1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _tbl_lookup(tbl_ref, idx, nchunks: int):
    """Look up tbl[idx] where tbl_ref is (nchunks,128) u32, idx (S,128)."""
    s = idx.shape[0]
    hi = (idx >> 7).astype(jnp.int32)
    lo = (idx & 127).astype(jnp.int32)
    out = jnp.zeros(idx.shape, _U32)
    for c in range(nchunks):
        chunk = jnp.broadcast_to(tbl_ref[pl.ds(c, 1), :], (s, 128))
        g = _gather128(chunk, lo)
        out = jnp.where(hi == c, g, out)
    return out


def _mel_exp(k):
    """MEL exponent table {0,0,0,1,1,1,2,2,2,3,3,4,5}[k] arithmetically
    (ojph_block_decoder32.cpp:95: dec_mel_st exp table)."""
    return jnp.where(k >= 11, k - 7, jnp.minimum(k // 3, 3))


def _fetch(words_ref, wi, nwords: int):
    """words_ref (W,S,128); wi (S,128) int32 -> word per lane (clamped)."""
    wic = jnp.minimum(wi, nwords - 1)
    iota = lax.broadcasted_iota(jnp.int32, (nwords,) + wi.shape, 0)
    m = iota == wic[None]
    wsel = jnp.where(m, lax.bitcast_convert_type(words_ref[:],
                                                 jnp.int32), 0)
    return lax.bitcast_convert_type(jnp.sum(wsel, axis=0), _U32)


# -- 64-bit bit window kept as (lo, hi, nbits, word_index), all (S,128) ----

def _refill(lo, hi, nb, wi, words_ref, nwords: int):
    # NB: min/max/clip stay in int32 — unsigned min/max crashes the
    # Mosaic compiler on this target.
    w = _fetch(words_ref, wi, nwords)
    need = nb < 32
    sh_lo = jnp.where(nb == 0, w,
                      lo | (w << jnp.minimum(nb, 31).astype(_U32)))
    sh_hi = jnp.where(nb == 0, _u32(0),
                      w >> (_u32(32) - jnp.clip(nb, 1, 31).astype(_U32)))
    return (jnp.where(need, sh_lo, lo), jnp.where(need, sh_hi, hi),
            jnp.where(need, nb + 32, nb), jnp.where(need, wi + 1, wi))


def _advance(lo, hi, nb, n):
    n = n.astype(jnp.int32) if hasattr(n, 'astype') \
        else jnp.full_like(nb, n)
    nc = jnp.clip(n, 1, 31).astype(_U32)
    lo_mid = (lo >> nc) | (hi << (_u32(32) - nc))
    lo2 = jnp.where(n == 0, lo, jnp.where(n == 32, hi, lo_mid))
    hi2 = jnp.where(n == 0, hi, jnp.where(n == 32, _u32(0), hi >> nc))
    return lo2, hi2, nb - n


def _bitrev(v, length, maxlen=5):
    r = jnp.zeros_like(v)
    for i in range(maxlen):
        bit = (v >> _u32(i)) & _u32(1)
        pos = (length - 1 - i).astype(jnp.int32)
        r = r | jnp.where(pos >= 0,
                          bit << jnp.clip(pos, 0, 31).astype(_U32),
                          _u32(0))
    return r


def _make_kernel(qw: int, qh: int, S: int, wm: int, wv: int, ws: int,
                 width: int):
    pairs = (qw + 1) // 2
    qw2 = pairs * 2

    def mel_get_run(mask, mel, mel_k, run):
        lo, hi, nb, wi = mel
        eva = _mel_exp(jnp.clip(mel_k, 0, 12))
        nbit = jnp.where(mask, 1, 0)
        b = lo & ((_u32(1) << nbit.astype(_U32)) - _u32(1))
        lo, hi, nb = _advance(lo, hi, nb, nbit)
        one = mask & (b == 1)
        nev = jnp.where(mask & (b == 0), eva, 0)
        vrev = lo & ((_u32(1) << jnp.clip(nev, 0, 31).astype(_U32))
                     - _u32(1))
        lo, hi, nb = _advance(lo, hi, nb, nev)
        v = _bitrev(vrev, eva)
        run_one = ((_u32(1) << eva.astype(_U32)) - _u32(1)) << _u32(1)
        run_zero = (v << _u32(1)) + _u32(1)
        new_run = jnp.where(one, run_one, run_zero).astype(jnp.int32)
        new_k = jnp.where(one, jnp.minimum(mel_k + 1, 12),
                          jnp.maximum(mel_k - 1, 0))
        return (jnp.where(mask, new_run, run), (lo, hi, nb, wi),
                jnp.where(mask, new_k, mel_k))

    def kernel(melw, vlcw, msw, p_ref, qhl_ref, vlct, uvlct,
               dec_out, err_out,
               mel_s, vlc_s, ms_s, misc_s, inf_prev, inf_cur, u_row,
               scr, newv):
        r = pl.program_id(0)
        zero = jnp.zeros((S, 128), _U32)
        zi = jnp.zeros((S, 128), jnp.int32)

        @pl.when(r == 0)
        def _init():
            for sref in (mel_s, vlc_s, ms_s):
                sref[:] = jnp.zeros_like(sref)
            misc_s[:] = jnp.zeros_like(misc_s)
            inf_prev[:] = jnp.zeros_like(inf_prev)
            inf_cur[:] = jnp.zeros_like(inf_cur)
            scr[:] = jnp.zeros_like(scr)
            newv[:] = jnp.zeros_like(newv)
            err_out[:] = jnp.zeros_like(err_out)
            # initial MEL refill + first get_run (decoder32.cpp:862)
            mel = _refill(zero, zero, zi, zi, melw, wm)
            run0, mel, melk0 = mel_get_run(
                jnp.ones((S, 128), bool), mel, zi, zi)
            mel_s[0], mel_s[1] = mel[0], mel[1]
            misc_s[0], misc_s[1] = (mel[2].astype(_U32),
                                    mel[3].astype(_U32))
            misc_s[2] = melk0.astype(_U32)
            misc_s[3] = run0.astype(_U32)
            vlc = _refill(zero, zero, zi, zi, vlcw, wv)
            vlc_s[0], vlc_s[1] = vlc[0], vlc[1]
            misc_s[4], misc_s[5] = (vlc[2].astype(_U32),
                                    vlc[3].astype(_U32))
            ms = _refill(zero, zero, zi, zi, msw, ws)
            ms_s[0], ms_s[1] = ms[0], ms[1]
            misc_s[6], misc_s[7] = (ms[2].astype(_U32),
                                    ms[3].astype(_U32))
            misc_s[8] = zero  # reserved
            misc_s[9] = zero  # prev_vn (step2 carry)

        initial = r == 0
        mel = (mel_s[0], mel_s[1], misc_s[0].astype(jnp.int32),
               misc_s[1].astype(jnp.int32))
        vlc = (vlc_s[0], vlc_s[1], misc_s[4].astype(jnp.int32),
               misc_s[5].astype(jnp.int32))
        mel_k = misc_s[2].astype(jnp.int32)
        run = misc_s[3].astype(jnp.int32)
        c_q = zero  # reset per row (row_start in the scan version)

        tbl_off = jnp.where(initial, 0, 1024)
        u_off = jnp.where(initial, 0, 320)

        # ---------------- step 1: one quad row (VLC/MEL/UVLC) -----------
        def pair_body(pi, carry):
            vlc, mel, mel_k, run, c_q = carry
            qx2 = pi * 2
            vlc = _refill(*vlc, vlcw, wv)
            mel = _refill(*mel, melw, wm)
            a0 = inf_prev[pl.ds(qx2, 1)][0]
            a1 = inf_prev[pl.ds(qx2 + 1, 1)][0]
            a2 = inf_prev[pl.ds(qx2 + 2, 1)][0]
            second = (qx2 + 1) < qw

            c_q = jnp.where(initial, c_q,
                            c_q | ((a0 & _u32(0xA0)) << _u32(2))
                            | ((a1 & _u32(0x20)) << _u32(4)))
            idx0 = tbl_off + (c_q + (vlc[0] & _u32(0x7F))) \
                .astype(jnp.int32)
            t0 = _tbl_lookup(vlct, idx0, 16)
            cz = (c_q == 0)
            run = jnp.where(cz, run - 2, run)
            t0 = jnp.where(cz & (run != -1), _u32(0), t0)
            run, mel, mel_k = mel_get_run(cz & (run < 0), mel, mel_k,
                                          run)
            inf_cur[pl.ds(qx2, 1)] = t0[None]
            c_q = jnp.where(
                initial,
                ((t0 & _u32(0x10)) << _u32(3))
                | ((t0 & _u32(0xE0)) << _u32(2)),
                ((t0 & _u32(0x40)) << _u32(2))
                | ((t0 & _u32(0x80)) << _u32(1))
                | (a0 & _u32(0x80)) | ((a1 & _u32(0xA0)) << _u32(2))
                | ((a2 & _u32(0x20)) << _u32(4)))
            lo, hi, nb = _advance(vlc[0], vlc[1], vlc[2],
                                  (t0 & _u32(7)).astype(jnp.int32))
            vlc = (lo, hi, nb, vlc[3])

            idx1 = tbl_off + (c_q + (vlc[0] & _u32(0x7F))) \
                .astype(jnp.int32)
            t1 = _tbl_lookup(vlct, idx1, 16)
            cz1 = (c_q == 0) & second
            run = jnp.where(cz1, run - 2, run)
            t1 = jnp.where(cz1 & (run != -1), _u32(0), t1)
            run, mel, mel_k = mel_get_run(cz1 & (run < 0), mel, mel_k,
                                          run)
            t1 = jnp.where(second, t1, _u32(0))
            inf_cur[pl.ds(qx2 + 1, 1)] = t1[None]
            c_q = jnp.where(
                initial,
                ((t1 & _u32(0x10)) << _u32(3))
                | ((t1 & _u32(0xE0)) << _u32(2)),
                ((t1 & _u32(0x40)) << _u32(2))
                | ((t1 & _u32(0x80)) << _u32(1))
                | (a1 & _u32(0x80)))
            lo, hi, nb = _advance(vlc[0], vlc[1], vlc[2],
                                  (t1 & _u32(7)).astype(jnp.int32))
            vlc = (lo, hi, nb, vlc[3])

            # u decode for the pair
            uvlc_mode = ((t0 & _u32(8)) << _u32(3)) \
                | ((t1 & _u32(8)) << _u32(4))
            needu = initial & (uvlc_mode == 0xC0)
            run = jnp.where(needu, run - 2, run)
            uvlc_mode = jnp.where(needu & (run == -1),
                                  uvlc_mode + _u32(0x40), uvlc_mode)
            run, mel, mel_k = mel_get_run(needu & (run < 0), mel,
                                          mel_k, run)
            uidx = u_off + (uvlc_mode + (vlc[0] & _u32(0x3F))) \
                .astype(jnp.int32)
            ue = _tbl_lookup(uvlct, uidx, 6)
            lo, hi, nb = _advance(vlc[0], vlc[1], vlc[2],
                                  (ue & _u32(7)).astype(jnp.int32))
            ue = ue >> _u32(3)
            length = (ue & _u32(0xF)).astype(jnp.int32)
            mask_l = (_u32(1) << jnp.clip(length, 0, 31).astype(_U32)) \
                - _u32(1)
            tmp = lo & jnp.where(length >= 32, _u32(0xFFFFFFFF), mask_l)
            lo, hi, nb = _advance(lo, hi, nb, length)
            vlc = (lo, hi, nb, vlc[3])
            ue = ue >> _u32(4)
            len0 = (ue & _u32(7)).astype(_U32)
            ue = ue >> _u32(3)
            kappa = jnp.where(initial, _u32(1), _u32(0))
            u0 = kappa + (ue & _u32(7)) + (tmp & ~(_u32(0xFF) << len0))
            u1 = kappa + (ue >> _u32(3)) + (tmp >> len0)
            u1 = jnp.where(second, u1, _u32(0))
            u_row[pl.ds(qx2, 1)] = u0[None]
            u_row[pl.ds(qx2 + 1, 1)] = u1[None]
            return (vlc, mel, mel_k, run, c_q)

        vlc, mel, mel_k, run, c_q = lax.fori_loop(
            0, pairs, pair_body, (vlc, mel, mel_k, run, c_q))

        mel_s[0], mel_s[1] = mel[0], mel[1]
        misc_s[0], misc_s[1] = mel[2].astype(_U32), mel[3].astype(_U32)
        misc_s[2] = mel_k.astype(_U32)
        misc_s[3] = run.astype(_U32)
        vlc_s[0], vlc_s[1] = vlc[0], vlc[1]
        misc_s[4], misc_s[5] = vlc[2].astype(_U32), vlc[3].astype(_U32)

        # ---------------- step 2: MagSgn sample fill --------------------
        ms = (ms_s[0], ms_s[1], misc_s[6].astype(jnp.int32),
              misc_s[7].astype(jnp.int32))
        prev_vn = misc_s[9]
        err = err_out[:]
        p = p_ref[:].astype(_U32)
        mmsbp2 = _u32(32) - p
        qhl = qhl_ref[:]
        in_lim = r < qhl

        def quad_body(qx, carry):
            ms, prev_vn, err = carry
            q_inf = inf_cur[pl.ds(qx, 1)][0]
            u_q = u_row[pl.ds(qx, 1)][0]
            gamma = q_inf & _u32(0xF0)
            gamma = gamma & (gamma - _u32(0x10))
            s0 = scr[pl.ds(qx, 1)][0]
            s1 = scr[pl.ds(qx + 1, 1)][0]
            emax_v = s0 | s1
            emax = (_u32(31) - lax.clz(emax_v | _u32(2))).astype(_U32)
            kappa = jnp.where(gamma != 0, emax, _u32(1))
            U_q = jnp.where(initial, u_q, u_q + kappa)
            err = err | jnp.where((U_q > mmsbp2) & in_lim,
                                  _u32(1), _u32(0))
            two_cols = (qx * 2 + 1) < width

            vals = []
            v_ns = []
            for bit in range(4):
                col = bit >> 1
                sig = ((q_inf >> _u32(4 + bit)) & _u32(1)) != 0
                if col == 1:
                    sig = sig & two_cols
                ms = _refill(*ms, msw, ws)
                m_n = jnp.where(
                    sig, (U_q - ((q_inf >> _u32(12 + bit)) & _u32(1)))
                    .astype(jnp.int32), 0)
                m_n = jnp.clip(m_n, 0, 31)
                ms_val = ms[0]
                lo, hi, nb = _advance(ms[0], ms[1], ms[2], m_n)
                ms = (lo, hi, nb, ms[3])
                m_nu = m_n.astype(_U32)
                v_n = ms_val & ((_u32(1) << m_nu) - _u32(1))
                v_n = v_n | (((q_inf >> _u32(8 + bit)) & _u32(1))
                             << m_nu)
                v_n = v_n | _u32(1)
                v_n = jnp.where(sig, v_n, _u32(0))
                val = jnp.where(
                    sig, (ms_val << _u32(31))
                    | ((v_n + _u32(2)) << (p - _u32(1))), _u32(0))
                vals.append(val)
                v_ns.append(v_n)

            newv[pl.ds(qx, 1)] = (prev_vn | v_ns[1])[None]
            prev_vn = v_ns[3]
            dec_out[0, pl.ds(qx * 4, 1)] = vals[0][None]
            dec_out[0, pl.ds(qx * 4 + 1, 1)] = vals[1][None]
            dec_out[0, pl.ds(qx * 4 + 2, 1)] = vals[2][None]
            dec_out[0, pl.ds(qx * 4 + 3, 1)] = vals[3][None]
            return (ms, prev_vn, err)

        ms, prev_vn, err = lax.fori_loop(0, qw, quad_body,
                                         (ms, prev_vn, err))
        err_out[:] = err
        ms_s[0], ms_s[1] = ms[0], ms[1]
        misc_s[6], misc_s[7] = ms[2].astype(_U32), ms[3].astype(_U32)

        # rotate rows: inf_prev <- inf_cur, scr <- newv (+ tail), clear
        newv[pl.ds(qw, 1)] = prev_vn[None]
        misc_s[9] = jnp.zeros((S, 128), _U32)
        inf_prev[:] = inf_cur[:]
        inf_cur[:] = jnp.zeros_like(inf_cur)
        scr[:] = newv[:]
        newv[:] = jnp.zeros_like(newv)

    return kernel


def _tables_chunks():
    t = get_tables()
    vlc = np.concatenate([t['dec_vlc0'], t['dec_vlc1']]) \
        .astype(np.uint32)                      # 2048
    uvlc = np.concatenate([t['dec_uvlc0'], t['dec_uvlc1']]) \
        .astype(np.uint32)                      # 320 + 256 = 576
    uvlc = np.pad(uvlc, (0, 768 - uvlc.size))
    return vlc.reshape(16, 128), uvlc.reshape(6, 128)


@partial(jax.jit, static_argnums=(5, 6, 7))
def _run_pallas(melw, vlcw, msw, p, qhl, dims, nlanes,
                interpret=False):
    """melw.. [N, W] u32; p, qhl [N] i32; dims=(qw,qh,width); nlanes=N."""
    qw, qh, width = dims
    S = nlanes // 128
    wm, wv, ws = melw.shape[1], vlcw.shape[1], msw.shape[1]

    kern = _make_kernel(qw, qh, S, wm, wv, ws, width)

    vlct, uvlct = _tables_chunks()

    def tr(w):
        return w.reshape(S, 128, w.shape[1]).transpose(2, 0, 1)

    grid = (qh,)
    const = lambda r: (0, 0, 0)
    dec, err = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wm, S, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((wv, S, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((ws, S, 128), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qw * 4, S, 128), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, 128), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qh, qw * 4, S, 128), jnp.uint32),
            jax.ShapeDtypeStruct((S, 128), jnp.uint32),
        ],
        interpret=interpret,
        scratch_shapes=[
            pltpu.VMEM((2, S, 128), jnp.uint32),   # mel lo/hi
            pltpu.VMEM((2, S, 128), jnp.uint32),   # vlc lo/hi
            pltpu.VMEM((2, S, 128), jnp.uint32),   # ms lo/hi
            pltpu.VMEM((10, S, 128), jnp.uint32),  # misc state
            pltpu.VMEM((((qw + 1) // 2) * 2 + 3, S, 128),
                       jnp.uint32),                # inf_prev (qw2+3)
            pltpu.VMEM((((qw + 1) // 2) * 2 + 3, S, 128),
                       jnp.uint32),                # inf_cur
            pltpu.VMEM((((qw + 1) // 2) * 2, S, 128),
                       jnp.uint32),                # u_row
            pltpu.VMEM((qw + 2, S, 128), jnp.uint32),  # scr
            pltpu.VMEM((qw + 2, S, 128), jnp.uint32),  # newv
        ],
    )(tr(melw), tr(vlcw), tr(msw),
      p.reshape(S, 128), qhl.reshape(S, 128), vlct, uvlct)

    # (qh, qw*4, S, 128) -> [N, 2qh, 2qw]; sample n = dx*2 + dy
    d = dec.reshape(qh, qw, 2, 2, S * 128)       # (r, qx, dx, dy, lane)
    d = d.transpose(4, 0, 3, 1, 2).reshape(S * 128, qh * 2, qw * 2)
    return d, err.reshape(S * 128) != 0


def decode_cleanup_pallas(melw, vlcw, msw, p, width: int, height: int,
                          qh_lim=None, interpret: bool = False):
    """Drop-in for decode_cleanup_core on TPU backends.

    Inputs as in block_decode.decode_cleanup: [N, W] u32 word rows,
    p = 30 - missing_msbs [N]; N must be a multiple of 128.
    Returns (dec [N, height, width] uint32, err [N] bool).
    """
    n = melw.shape[0]
    qw = (width + 1) >> 1
    qh = (height + 1) >> 1
    if qh_lim is None:
        qh_lim = jnp.full((n,), qh, jnp.int32)
    dec, err = _run_pallas(melw, vlcw, msw,
                           jnp.asarray(p, jnp.int32),
                           jnp.asarray(qh_lim, jnp.int32),
                           (qw, qh, width), n, interpret)
    return dec[:, :height, :width], err
