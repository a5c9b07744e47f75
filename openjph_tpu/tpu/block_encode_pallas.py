"""Pallas TPU kernel: batched HT cleanup-pass block ENCODER with
on-device bit packing.

Mirror of block_decode_pallas.py.  The lax.scan encoder
(block_encode.py) emits fixed-width per-quad-pair records that the
host packs into segments — ~60 bytes of record per pair, which makes
the device->host link the encode bottleneck.  This kernel runs the
same per-pair math (significance/EMB exponents, VLC/UVLC codeword
lookup, MEL run-length coding) AND packs the three bitstreams into
dense LSB-first u32 word planes on device, so only ~coded-size bytes
travel to the host, where a C++ stuffer (pack_from_dense) applies
byte stuffing, the backward VLC byte order, MEL/VLC fuse termination
and the scup word (ojph_block_encoder.cpp:273-533, 412-441).

Layout and cost model follow the decoder kernel: lanes on (S, 128)
vregs, grid over quad rows, writer state in VMEM scratch.  Bit writes
buffer in per-stream multi-limb windows (MEL/VLC 160 bits, MagSgn
544); completed words flush to the output planes on a STATIC schedule
(MagSgn/VLC every 2nd pair, MEL every 4th) through a constant-trip
page window — dynamic-trip loops and conds cost ~4-5 us each on v5e,
so the flush path contains none in the common case (see _flush_many).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..coding.tables import get_tables

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def _gather128(chunk, lo):
    dn = lax.GatherDimensionNumbers(
        offset_dims=(), collapsed_slice_dims=(1,), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))
    return lax.gather(chunk, lo[..., None], dn, slice_sizes=(1, 1),
                      mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)


def _tbl_lookup(tbl_ref, idx, nchunks: int):
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
    return jnp.where(k >= 11, k - 7, jnp.minimum(k // 3, 3))


# ---------------------------------------------------------------------------
# Variable-limb bit writer.  State: (w0..w{NL-1}, nb, wi, ovf); bits
# appended LSB-first at position nb; completed words scatter to the
# output plane at word index wi per lane.  NL = len(state) - 3: MEL
# and VLC carry 5 limbs (160 bits), MagSgn 17 (544 bits) so TWO
# pairs' <=496 appended bits accumulate between static flush points
# — the per-quad cond-gated flush was ~84% of kernel time in round 3
# (xprof), and its dynamic-trip page loops ~70% in round 4.
# ---------------------------------------------------------------------------

_NLIMB = 5          # MEL window limbs
_NLIMB_VLC = 7      # VLC window limbs (224 bits: 4 pairs x <=40 + 31)
_NLIMB_MS = 32      # MagSgn window limbs (1024 bits: 4 pairs x <=248
                    # + a 31-bit residual, exactly)


def _append(st, v, ln):
    """Append ln (per-lane, 0..31) bits of v at position nb.

    Bits that would land beyond the window's last limb are dropped by
    the masked limb writes, so that condition raises the lane's ovf
    flag (-> scalar fallback for the burst); it only occurs when the
    flush deferral path starves a lane (see _flush_many)."""
    NL = len(st) - 3
    w = list(st[:NL])
    nb, wi, ovf = st[NL], st[NL + 1], st[NL + 2]
    ln = ln.astype(jnp.int32) if hasattr(ln, 'astype') \
        else jnp.full_like(nb, ln)
    ovf = ovf | jnp.where(nb + ln > 32 * NL, _u32(1), _u32(0))
    v = v & ((_u32(1) << jnp.clip(ln, 0, 31).astype(_U32)) - _u32(1))
    limb = nb >> 5
    off = (nb & 31).astype(_U32)
    lo_ins = v << off
    hi_ins = jnp.where(off == 0, _u32(0),
                       v >> (_u32(32) - jnp.clip(nb & 31, 1, 31)
                             .astype(_U32)))
    out = []
    for k in range(NL):
        x = w[k]
        x = jnp.where(limb == k, x | lo_ins, x)
        if k > 0:
            x = jnp.where(limb == k - 1, x | hi_ins, x)
        out.append(x)
    return (*out, nb + ln, wi, ovf)


# Page height for the gated word scatter: a completed word lands at a
# per-lane index, which has no native scatter primitive, so the plane
# write is a masked read-modify-write — gated to the pages holding
# some flushing lane's word index (lanes emit at similar rates, so
# the span is a few pages out of the worst-case cap).  8-row pages
# measured 14% faster than 32 on v5e (xprof: the flush passes are
# ~84% of this kernel; smaller pages cut their data movement).
_PAGE = 8


def _flush_many(st, out_ref, nwords: int, npop: int):
    """Pop up to ``npop`` completed words per lane in ONE page pass.

    The per-word flush costs a masked page read-modify-write each; a
    stream that appends >32 bits between flush points (MagSgn: up to
    248 per pair) pays it per word.  Batching the pops writes rows
    [wi, wi+kpop) in the same page pass with one extra select per
    extra word.  The page pass is an EXACT dynamic-range fori over
    the pages holding some flushing lane's rows.  A dynamic-trip
    scf.for costs ~4-5 us on v5e no matter how little it does, so the
    flush SCHEDULE minimizes instances instead: every stream flushes
    ONCE per 4-pair group into a window wide enough to hold the whole
    group's appends (constant-trip windows with lane deferral were
    tried — 3x faster on homogeneous content, but lanes of different
    bands emit at rates spread continuously, so deferred lanes
    starved and overflowed on real imagery, silently dropping every
    burst to the scalar fallback).  When every lane is idle the range
    is empty (pmin > pmax) and the loop body never runs, so callers
    need no jnp.any-gated lax.cond."""
    NL = len(st) - 3
    w = list(st[:NL])
    nb, wi, ovf = st[NL], st[NL + 1], st[NL + 2]
    kpop = jnp.minimum(nb >> 5, npop)
    doit = kpop > 0
    ovf = ovf | jnp.where(doit & (wi + kpop > nwords), _u32(1),
                          _u32(0))
    wic = jnp.minimum(wi, nwords - 1)
    kc = jnp.minimum(kpop, nwords - wic)   # clamp writes in bounds

    def write_rows(rows, base, serve):
        iota = lax.broadcasted_iota(
            jnp.int32, rows.shape, 0) + base
        rel = iota - wic[None]
        val = rows
        for j in range(npop):
            mj = (rel == j) & (kc[None] > j) & serve[None]
            val = jnp.where(mj, w[j][None], val)
        return val

    if nwords <= _PAGE or nwords % _PAGE:
        out_ref[:] = write_rows(out_ref[:], 0, doit)
    else:
        pmin = jnp.min(jnp.where(doit, wic, nwords - 1)) // _PAGE
        pmax = jnp.max(jnp.where(doit, wic + kc - 1, 0)) // _PAGE

        def body(pg, carry):
            rows = out_ref[pl.ds(pg * _PAGE, _PAGE)]
            out_ref[pl.ds(pg * _PAGE, _PAGE)] = \
                write_rows(rows, pg * _PAGE, doit)
            return carry

        lax.fori_loop(pmin, pmax + 1, body, 0)
    # shift the window down by kpop limbs: binary decomposition
    # (log2(npop) masked passes instead of NL*npop equality selects)
    neww = list(w)
    sh = 1
    while sh <= npop:
        cond = (kpop & sh) != 0
        neww = [jnp.where(cond,
                          neww[k + sh] if k + sh < NL
                          else jnp.zeros_like(neww[k]), neww[k])
                for k in range(NL)]
        sh <<= 1
    return (*neww, nb - (kpop << 5), wi + kpop, ovf)


def _drain(st, out_ref, nwords: int):
    """Flush everything including a partial last word (end of block):
    promote the trailing partial word to a full one, then ONE exact
    dynamic-range flush popping up to the whole window."""
    NL = len(st) - 3
    nb, wi, ovf = st[NL], st[NL + 1], st[NL + 2]
    nb2 = (nb + 31) & ~31
    return _flush_many((*st[:NL], nb2, wi, ovf), out_ref, nwords, NL)


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

# scratch rows in the u32 state buffer: MEL 5 limbs + nb/wi/ovf (8
# rows), VLC 7+3 (10), MagSgn 32+3 (35), then 4 context rows
_MELW, _VLCW, _MSW = 0, 8, 18
_MRUN, _MK, _CQ, _MAXE = 53, 54, 55, 56
_STATE_ROWS_ENC = 57


def _enc_tables_chunks():
    t = get_tables()
    vlc = np.concatenate([t['enc_vlc0'], t['enc_vlc1']]) \
        .astype(np.uint32)                         # 4096
    uv = t['enc_uvlc'].astype(np.uint32)           # [75, 6]
    uvp = np.zeros((4, 128), np.uint32)
    uvp[0, :75] = uv[:, 0]
    uvp[1, :75] = uv[:, 1]
    uvp[2, :75] = uv[:, 2]
    uvp[3, :75] = uv[:, 3]
    return vlc.reshape(32, 128), uvp


def _make_kernel(qw: int, qh: int, S: int, wp: int,
                 wm: int, wv: int, ws: int,
                 interp: bool = False):
    pairs = (qw + 1) >> 1

    def ld_writer(state, base, nl=_NLIMB):
        return tuple(
            state[base + k] if k not in (nl, nl + 1)
            else state[base + k].astype(jnp.int32)
            for k in range(nl + 2)) + (state[base + nl + 2],)

    def st_writer(state, base, st):
        nl = len(st) - 3
        for k in range(nl):
            state[base + k] = st[k]
        state[base + nl] = st[nl].astype(_U32)
        state[base + nl + 1] = st[nl + 1].astype(_U32)
        state[base + nl + 2] = st[nl + 2]

    def kernel(buf, p_ref, qhl_ref, vlct, uvt,
               melw, vlcw, msw, meta_out,
               state, e_val, cx_val):
        # grid = (lane tiles, quad rows); rows innermost, state
        # re-initializes at each tile's row 0
        r = pl.program_id(1)
        zero = jnp.zeros((S, 128), _U32)
        zi = jnp.zeros((S, 128), jnp.int32)
        # per-lane quad-height limit (decode kernel's qhl, mirrored):
        # lanes whose block is shorter than the group height stop
        # emitting past their own rows, so one kernel covers every
        # height of a width class (height-merged groups)
        live = r < qhl_ref[:].astype(jnp.int32)

        @pl.when(r == 0)
        def _init():
            state[:] = jnp.zeros_like(state)
            e_val[:] = jnp.zeros_like(e_val)
            cx_val[:] = jnp.zeros_like(cx_val)
            melw[:] = jnp.zeros_like(melw)
            vlcw[:] = jnp.zeros_like(vlcw)
            msw[:] = jnp.zeros_like(msw)
            meta_out[:] = jnp.zeros_like(meta_out)

        init = r == 0
        mel = ld_writer(state, _MELW)
        vlc = ld_writer(state, _VLCW, _NLIMB_VLC)
        ms = ld_writer(state, _MSW, _NLIMB_MS)
        mrun = state[_MRUN].astype(jnp.int32)
        mk = state[_MK].astype(jnp.int32)
        c_q = jnp.where(init, zero, state[_CQ])
        max_e = state[_MAXE].astype(jnp.int32)
        p = p_ref[:].astype(_U32)

        def mel_event(mask, bit, mel, mrun, mk):
            """MEL run-length coder, one event (MelEnc::encode)."""
            thresh = jnp.int32(1) << jnp.clip(_mel_exp(mk), 0, 7)
            nz = mask & ~bit
            run2 = jnp.where(nz, mrun + 1, mrun)
            hit = nz & (run2 >= thresh)
            # hit: emit '1'; bit: emit '0' + exp(mk) bits of run
            # (MSB-first)
            e = _mel_exp(mk)
            isb = mask & bit
            # reverse low e bits of run for LSB-first dense order
            rev = jnp.zeros_like(mrun)
            for i in range(5):
                b = (mrun >> i) & 1
                pos = e - 1 - i
                rev = rev | jnp.where(pos >= 0,
                                      b << jnp.clip(pos, 0, 31), 0)
            # codeword: hit -> '1' (1 bit); isb -> '0' + e bits
            cw = jnp.where(hit, _u32(1),
                           jnp.where(isb, (rev << 1).astype(_U32),
                                     _u32(0)))
            ln = jnp.where(hit, 1, jnp.where(isb, 1 + e, 0))
            mel = _append(mel, cw, ln)
            mrun3 = jnp.where(hit | isb, 0, run2)
            mk2 = jnp.where(hit, jnp.minimum(mk + 1, 12),
                            jnp.where(isb, jnp.maximum(mk - 1, 0), mk))
            return mel, mrun3, mk2

        def uvlc_gather(idx):
            i = jnp.clip(idx, 0, 74).astype(jnp.int32)
            pre = _gather128(jnp.broadcast_to(uvt[pl.ds(0, 1), :],
                                              (S, 128)), i)
            pln = _gather128(jnp.broadcast_to(uvt[pl.ds(1, 1), :],
                                              (S, 128)), i)
            suf = _gather128(jnp.broadcast_to(uvt[pl.ds(2, 1), :],
                                              (S, 128)), i)
            sln = _gather128(jnp.broadcast_to(uvt[pl.ds(3, 1), :],
                                              (S, 128)), i)
            return pre, pln, suf, sln

        def qsample(t):
            val = ((t + t) >> p) & ~_u32(1)
            sig = val != 0
            v1 = val - _u32(1)
            # exponents stay int32: unsigned min/max crashes Mosaic
            e = jnp.where(sig, (_u32(32) - lax.clz(v1))
                          .astype(jnp.int32), 0)
            s = jnp.where(sig, (val - _u32(2)) + (t >> _u32(31)),
                          _u32(0))
            return sig, e, s

        def pair_once(j, carry, fl_ms, fl_vlc, fl_mel):
            mel, vlc, ms, mrun, mk, c_q, max_e = carry
            row_start = j == 0
            second = (2 * j + 1) < qw
            le = 2 * j

            ev0 = e_val[pl.ds(0, 1)][0].astype(jnp.int32)
            ev1 = e_val[pl.ds(1, 1)][0].astype(jnp.int32)
            max_e = jnp.where(row_start,
                              jnp.maximum(ev0, ev1) - 1, max_e)
            cx0 = cx_val[pl.ds(0, 1)][0].astype(jnp.int32)
            cx1 = cx_val[pl.ds(1, 1)][0].astype(jnp.int32)
            c_q = jnp.where(
                row_start,
                jnp.where(init, zero, (cx0 + (cx1 << 2)).astype(_U32)),
                c_q)
            e_val[pl.ds(0, 1)] = jnp.where(row_start, zero,
                                           ev0.astype(_U32))[None]
            cx_val[pl.ds(0, 1)] = jnp.where(row_start, zero,
                                            cx0.astype(_U32))[None]

            # fetch 2x4 sample tile: buf block is (2, wp, S, 128)
            sg = [None] * 8
            ee = [None] * 8
            ss = [None] * 8
            for qi in range(2):
                for k, (rr, cc) in enumerate(((0, 0), (1, 0),
                                              (0, 1), (1, 1))):
                    col = 4 * j + 2 * qi + cc
                    t = buf[rr, pl.ds(col, 1)][0]
                    sig, e, s = qsample(t)
                    sg[qi * 4 + k] = sig
                    ee[qi * 4 + k] = e
                    ss[qi * 4 + k] = s
            rho0 = (sg[0].astype(_U32) | (sg[1].astype(_U32) << 1)
                    | (sg[2].astype(_U32) << 2)
                    | (sg[3].astype(_U32) << 3))
            rho1 = (sg[4].astype(_U32) | (sg[5].astype(_U32) << 1)
                    | (sg[6].astype(_U32) << 2)
                    | (sg[7].astype(_U32) << 3))
            rho1 = jnp.where(second, rho1, _u32(0))
            emax0 = jnp.maximum(jnp.maximum(ee[0], ee[1]),
                                jnp.maximum(ee[2], ee[3]))
            emax1 = jnp.maximum(jnp.maximum(ee[4], ee[5]),
                                jnp.maximum(ee[6], ee[7]))

            # ---- quad 0 ----
            two0 = (rho0 & (rho0 - _u32(1))) != 0
            kappa0 = jnp.where(init, 1,
                               jnp.where(two0,
                                         jnp.maximum(1, max_e), 1))
            Uq0 = jnp.maximum(emax0, kappa0)
            u_q0 = (Uq0 - kappa0).astype(jnp.int32)
            eps0 = zero
            for k in range(4):
                hit = (ee[k] == emax0) & (ee[k] > 0)
                eps0 = eps0 | (jnp.where((u_q0 > 0) & hit, _u32(1),
                                         _u32(0)) << _u32(k))
            prev_b = e_val[pl.ds(le, 1)][0].astype(jnp.int32)
            e_val[pl.ds(le, 1)] = jnp.maximum(prev_b, ee[1]) \
                .astype(_U32)[None]
            nxt1 = e_val[pl.ds(le + 1, 1)][0].astype(jnp.int32)
            nxt2 = e_val[pl.ds(le + 2, 1)][0].astype(jnp.int32)
            max_e = jnp.where(init, max_e, jnp.maximum(nxt1, nxt2) - 1)
            e_val[pl.ds(le + 1, 1)] = ee[3].astype(_U32)[None]
            cxp = cx_val[pl.ds(le, 1)][0].astype(jnp.int32)
            cx_val[pl.ds(le, 1)] = (cxp | ((rho0 & _u32(2)) >> 1)
                                    .astype(jnp.int32)).astype(_U32)[None]
            cq1b1 = cx_val[pl.ds(le + 1, 1)][0].astype(jnp.int32)
            cq1b2 = cx_val[pl.ds(le + 2, 1)][0].astype(jnp.int32)
            c_q1_base = (cq1b1 + (cq1b2 << 2)).astype(_U32)
            cx_val[pl.ds(le + 1, 1)] = ((rho0 & _u32(8)) >> 3)[None]

            tbase = jnp.where(init, 0, 2048)
            idx0 = tbase + ((c_q << 8) + (rho0 << 4) + eps0) \
                .astype(jnp.int32)
            tuple0 = _tbl_lookup(vlct, idx0, 32)
            vlc = _append(vlc, tuple0 >> _u32(8),
                          jnp.where(live,
                                    (tuple0 >> _u32(4)) & _u32(7),
                                    _u32(0)).astype(jnp.int32))
            mel, mrun, mk = mel_event(live & (c_q == 0), rho0 != 0,
                                      mel, mrun, mk)
            for k in range(4):
                m = jnp.where(((rho0 >> _u32(k)) & _u32(1)) != 0,
                              (Uq0.astype(_U32)
                               - ((tuple0 >> _u32(k)) & _u32(1))),
                              _u32(0))
                m = lax.bitcast_convert_type(
                    jnp.minimum(m.astype(jnp.int32), 31), _U32)
                m = jnp.where(live, m, _u32(0))
                ms = _append(ms, ss[k], m.astype(jnp.int32))
            # no mid-pair flush: the 320-bit MagSgn window holds both
            # quads' <=248 bits until the single pair-end flush

            # ---- quad 1 ----
            c_q1 = jnp.where(
                init, (rho0 >> 1) | (rho0 & _u32(1)),
                c_q1_base | ((rho0 & _u32(4)) >> 1)
                | ((rho0 & _u32(8)) >> 2))
            two1 = (rho1 & (rho1 - _u32(1))) != 0
            kappa1 = jnp.where(init, 1,
                               jnp.where(two1,
                                         jnp.maximum(1, max_e), 1))
            Uq1 = jnp.maximum(emax1, kappa1)
            u_q1 = jnp.where(second, Uq1 - kappa1, 0) \
                .astype(jnp.int32)
            eps1 = zero
            for k in range(4):
                hit = (ee[4 + k] == emax1) & (ee[4 + k] > 0)
                eps1 = eps1 | (jnp.where((u_q1 > 0) & hit, _u32(1),
                                         _u32(0)) << _u32(k))
            prev_b = e_val[pl.ds(le + 1, 1)][0].astype(jnp.int32)
            ev2 = jnp.maximum(prev_b, ee[5])
            nxt1 = e_val[pl.ds(le + 2, 1)][0].astype(jnp.int32)
            nxt2 = e_val[pl.ds(le + 3, 1)][0].astype(jnp.int32)
            max_e2 = jnp.where(init, max_e,
                               jnp.maximum(nxt1, nxt2) - 1)
            cxp = cx_val[pl.ds(le + 1, 1)][0].astype(jnp.int32)
            cxv2 = cxp | ((rho1 & _u32(2)) >> 1).astype(jnp.int32)
            cq0b1 = cx_val[pl.ds(le + 2, 1)][0].astype(jnp.int32)
            cq0b2 = cx_val[pl.ds(le + 3, 1)][0].astype(jnp.int32)
            c_q0n = (cq0b1 + (cq0b2 << 2)).astype(_U32)

            idx1 = tbase + ((c_q1 << 8) + (rho1 << 4) + eps1) \
                .astype(jnp.int32)
            tuple1 = _tbl_lookup(vlct, idx1, 32)
            vlc = _append(vlc, tuple1 >> _u32(8),
                          jnp.where(live & second,
                                    (tuple1 >> _u32(4)) & _u32(7),
                                    _u32(0)).astype(jnp.int32))
            mel, mrun, mk = mel_event(live & second & (c_q1 == 0),
                                      rho1 != 0, mel, mrun, mk)
            for k in range(4):
                m = jnp.where(((rho1 >> _u32(k)) & _u32(1)) != 0,
                              (Uq1.astype(_U32)
                               - ((tuple1 >> _u32(k)) & _u32(1))),
                              _u32(0))
                m = lax.bitcast_convert_type(
                    jnp.minimum(m.astype(jnp.int32), 31), _U32)
                m = jnp.where(live & second, m, _u32(0))
                ms = _append(ms, ss[4 + k], m.astype(jnp.int32))

            # state written by quad1 only when it exists
            e_val[pl.ds(le + 1, 1)] = jnp.where(
                second, ev2.astype(_U32),
                e_val[pl.ds(le + 1, 1)][0])[None]
            e_val[pl.ds(le + 2, 1)] = jnp.where(
                second, ee[7].astype(_U32),
                e_val[pl.ds(le + 2, 1)][0])[None]
            cx_val[pl.ds(le + 1, 1)] = jnp.where(
                second, cxv2.astype(_U32),
                cx_val[pl.ds(le + 1, 1)][0])[None]
            cx_val[pl.ds(le + 2, 1)] = jnp.where(
                second, (rho1 & _u32(8)) >> 3,
                cx_val[pl.ds(le + 2, 1)][0])[None]
            max_e = jnp.where(second, max_e2, max_e)

            # ---- u codes ----
            melu_present = live & init & (u_q0 > 0) & (u_q1 > 0)
            melu_bit = jnp.minimum(u_q0, u_q1) > 2
            mel, mrun, mk = mel_event(melu_present, melu_bit, mel,
                                      mrun, mk)
            p0a, l0a, s0a, sl0a = uvlc_gather(u_q0 - 2)
            p1a, l1a, s1a, sl1a = uvlc_gather(u_q1 - 2)
            p0b, l0b, s0b, sl0b = uvlc_gather(u_q0)
            p1b, l1b, s1b, sl1b = uvlc_gather(u_q1)
            caseA = init & (u_q0 > 2) & (u_q1 > 2)
            caseB = init & (u_q0 > 2) & (u_q1 > 0) & ~caseA
            c2 = jnp.where(caseA, p0a, p0b)
            L2 = jnp.where(caseA, l0a, l0b)
            c3 = jnp.where(caseA, p1a,
                           jnp.where(caseB,
                                     (u_q1 - 1).astype(_U32), p1b))
            L3 = jnp.where(caseA, _u32(0) + l1a,
                           jnp.where(caseB, _u32(1), l1b))
            c4 = jnp.where(caseA, s0a, s0b)
            L4 = jnp.where(caseA, sl0a, sl0b)
            c5 = jnp.where(caseA, s1a, jnp.where(caseB, _u32(0), s1b))
            L5 = jnp.where(caseA, sl1a,
                           jnp.where(caseB, _u32(0), sl1b))
            for cw, ll in ((c2, L2), (c3, L3), (c4, L4), (c5, L5)):
                vlc = _append(vlc, cw,
                              jnp.where(live, ll, _u32(0))
                              .astype(jnp.int32))
            # STATIC flush scheduling: each dynamic control-flow
            # region (a lax.cond gate or a dynamic-range fori_loop)
            # costs ~1.8 us on v5e regardless of its work — with
            # per-pair cond-gated flushes that overhead was ~75% of
            # the kernel (xprof: 12.0 ms vs 3.2 ms with static page
            # loops).  The pair loop therefore runs as an outer loop
            # over 4-pair groups with the 4 pairs UNROLLED, so flush
            # points are static: MagSgn+VLC after pairs 1 and 3 of
            # each group (2-pair gap: MagSgn nb <= 31+496 fits the
            # 17-limb window, VLC nb <= 31+80 < 160), MEL after pair
            # 3 (4-pair gap: nb <= 31+72 < 160).
            if fl_ms:
                ms = _flush_many(ms, msw, ws, 16)
            if fl_vlc:
                vlc = _flush_many(vlc, vlcw, wv, 3)
            if fl_mel:
                mel = _flush_many(mel, melw, wm, 3)

            # next pair's context
            c_q = jnp.where(
                init,
                jnp.where(second, (rho1 >> 1) | (rho1 & _u32(1)),
                          _u32(0)),
                jnp.where(second,
                          c_q0n | ((rho1 & _u32(4)) >> 1)
                          | ((rho1 & _u32(8)) >> 2),
                          c_q1_base))
            return (mel, vlc, ms, mrun, mk, c_q, max_e)

        carry = (mel, vlc, ms, mrun, mk, c_q, max_e)
        if interp:
            # interpret mode (the CPU test path) executes the traced
            # body per element, so the 4x-unrolled group loop below
            # is several times slower there; flush every pair through
            # a compact per-pair fori instead.  Same primitives and
            # byte-identical output (flush cadence never changes
            # word placement) — only the Mosaic-compiled schedule
            # differs, and that one is pinned by on-device oracle
            # byte-parity checks.
            def pair_all(j, carry):
                return pair_once(j, carry, True, True, True)

            carry = lax.fori_loop(0, pairs, pair_all, carry)
        else:
            G, R = pairs // 4, pairs % 4

            def pair_group(g, carry):
                j0 = 4 * g
                carry = pair_once(j0, carry, False, False, False)
                carry = pair_once(j0 + 1, carry, False, False, False)
                carry = pair_once(j0 + 2, carry, False, False, False)
                carry = pair_once(j0 + 3, carry, True, True, True)
                return carry

            if G:
                carry = lax.fori_loop(0, G, pair_group, carry)
            # static tail (< 4 pairs): flush everything at the
            # tail's last pair so no gap straddles the row boundary
            for i in range(R):
                lastt = i == R - 1
                carry = pair_once(4 * G + i, carry, lastt, lastt,
                                  lastt)
        mel, vlc, ms, mrun, mk, c_q, max_e = carry

        @pl.when(r == qh - 1)
        def _finish():
            mel2, mrun2 = mel, mrun
            # MEL terminate: flush a pending run with a '1'
            # (pack tail, ojph_block_encoder.cpp:412)
            cw = jnp.where(mrun2 > 0, _u32(1), _u32(0))
            ln = jnp.where(mrun2 > 0, 1, 0)
            mel3 = _append(mel2, cw, ln)
            melbits = (mel3[_NLIMB + 1] * 32 + mel3[_NLIMB]) \
                .astype(_U32)
            vlcbits = (vlc[_NLIMB_VLC + 1] * 32
                       + vlc[_NLIMB_VLC]).astype(_U32)
            msbits = (ms[_NLIMB_MS + 1] * 32 + ms[_NLIMB_MS]) \
                .astype(_U32)
            meld = _drain(mel3, melw, wm)
            vlcd = _drain(vlc, vlcw, wv)
            msd = _drain(ms, msw, ws)
            meta_out[0] = melbits
            meta_out[1] = vlcbits
            meta_out[2] = msbits
            meta_out[3] = meld[_NLIMB + 2] | vlcd[_NLIMB_VLC + 2] \
                | msd[_NLIMB_MS + 2]

        @pl.when(r < qh - 1)
        def _carry():
            st_writer(state, _MELW, mel)
            st_writer(state, _VLCW, vlc)
            st_writer(state, _MSW, ms)
            state[_MRUN] = mrun.astype(_U32)
            state[_MK] = mk.astype(_U32)
            state[_CQ] = c_q
            state[_MAXE] = max_e.astype(_U32)

    return kernel


# VMEM working-set budget per lane tile (bytes).  v5e/v5p cores have
# 128 MiB of VMEM; the worst-case dense output planes are the bulk of
# the working set, so the kernel raises Mosaic's scoped limit
# (vmem_limit_bytes below) instead of living under the 16 MiB default.
# Mosaic double-buffers every grid-indexed block, so in/out block rows
# count twice; scratch does not.
_VMEM_BUDGET = 48 << 20
_VMEM_LIMIT = 100 << 20


def _lane_tile(S: int, qw: int, wp: int, wm: int, wv: int,
               ws: int) -> int:
    """Lane-tile size whose per-tile VMEM working set fits the budget
    (the batch axis is tiled by the grid).  Mosaic requires a block's
    sublane dimension to be a multiple of 8 or the full extent, so
    the tile is S itself when it fits, else a multiple of 8 (the
    caller pads S up to a tile multiple)."""
    qw2 = ((qw + 1) // 2) * 2
    io_rows = 2 * wp + 2 + (wm + wv + ws + 4)        # double-buffered
    scratch_rows = _STATE_ROWS_ENC + 2 * (2 * qw2 + 4)
    per_sb = (2 * io_rows + scratch_rows) * 128 * 4
    sb_max = max(1, _VMEM_BUDGET // per_sb)
    if S <= sb_max:
        return S
    return max(8, (sb_max // 8) * 8)


@partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _run_encode_pallas(buf, p, qhl, dims, caps, nlanes,
                       interpret=False):
    """buf [N, hp, wp] u32 sign-magnitude (padded); p [N] int32
    (= 31 - kmax); qhl [N] int32 per-lane quad-height limit (lanes
    stop emitting past their own rows — height-merged groups);
    dims = (qw, qh, wp); caps = (wm, wv, ws) output word-plane
    heights.  Returns (melw, vlcw, msw [N, W*], bits [N, 3] int32,
    ovf [N] bool)."""
    qw, qh, wp = dims
    wm, wv, ws = caps
    S0 = nlanes // 128
    SB = _lane_tile(S0, qw, wp, wm, wv, ws)
    S = -(-S0 // SB) * SB   # pad lanes so the tile divides evenly
    if S != S0:
        padl = (S - S0) * 128
        # zero samples: padded lanes encode as empty blocks
        buf = jnp.pad(buf, ((0, padl), (0, 0), (0, 0)))
        p = jnp.pad(p, (0, padl), constant_values=8)
        qhl = jnp.pad(qhl, (0, padl))   # qhl 0: no emission at all
    n_sb = S // SB

    kern = _make_kernel(qw, qh, SB, wp, wm, wv, ws,
                        interp=interpret)
    vlct, uvt = _enc_tables_chunks()

    # (N, hp, wp) -> (hp, wp, S, 128)
    b = buf.reshape(S, 128, buf.shape[1], wp).transpose(2, 3, 0, 1)

    lane2 = lambda sb, r: (sb, 0)
    const2 = lambda sb, r: (0, 0)
    strm3 = lambda sb, r: (0, sb, 0)
    melw, vlcw, msw, meta = pl.pallas_call(
        kern,
        # grid = (lane tiles, quad rows); rows iterate innermost so
        # the VMEM writer/context state persists across a tile's rows
        grid=(n_sb, qh),
        in_specs=[
            pl.BlockSpec((2, wp, SB, 128), lambda sb, r: (r, 0, sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
            pl.BlockSpec((32, 128), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 128), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((wm, SB, 128), strm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((wv, SB, 128), strm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((ws, SB, 128), strm3, memory_space=pltpu.VMEM),
            pl.BlockSpec((4, SB, 128), strm3, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((wm, S, 128), jnp.uint32),
            jax.ShapeDtypeStruct((wv, S, 128), jnp.uint32),
            jax.ShapeDtypeStruct((ws, S, 128), jnp.uint32),
            jax.ShapeDtypeStruct((4, S, 128), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_STATE_ROWS_ENC, SB, 128),
                       jnp.uint32),                     # writers + ctx
            pltpu.VMEM((2 * ((qw + 1) // 2) * 2 + 4, SB, 128),
                       jnp.uint32),                      # e_val rows
            pltpu.VMEM((2 * ((qw + 1) // 2) * 2 + 4, SB, 128),
                       jnp.uint32),                      # cx_val rows
        ],
    )(b, p.reshape(S, 128), qhl.reshape(S, 128), vlct, uvt)

    # ONE lane-major detranspose for all three streams: each
    # major->minor transpose dispatch costs ~75 ms flat on the v5e
    # regardless of volume, so the planes are concatenated on the
    # word axis first (lane l's words live at [l*wtot + off_s,
    # l*wtot + off_s + cap_s) of the flat view)
    cat = jnp.concatenate([melw, vlcw, msw], axis=0)
    catb = cat.transpose(1, 2, 0).reshape(S * 128, wm + wv + ws) \
        [:nlanes]
    bits = meta[:3].transpose(1, 2, 0).reshape(S * 128, 3) \
        .astype(jnp.int32)[:nlanes]
    ovf = meta[3].reshape(S * 128)[:nlanes] != 0
    return catb, bits, ovf


def encode_cleanup_pallas_cat(buf, p, width: int, height: int,
                              caps, qhl=None,
                              interpret: bool = False):
    """Encode N same-shape blocks into dense unstuffed bit streams,
    returned as ONE concatenated word plane.

    buf [N, hp, wp] uint32 sign-magnitude; p = 31 - kmax [N].
    caps = (wm, wv, ws) static word caps (overflowing lanes are
    flagged for scalar fallback).  qhl: optional [N] per-lane quad
    height ((h_true+1)//2) for height-merged groups; None = every
    lane is full height.  Returns (cat [N, wm+wv+ws] — lane rows
    holding the MEL words at [0, wm), VLC at [wm, wm+wv), MagSgn at
    [wm+wv, wm+wv+ws) — bits [N, 3], ovf [N])."""
    n = buf.shape[0]
    qw = (width + 1) >> 1
    qh = (height + 1) >> 1
    if qhl is None:
        qhl = jnp.full((n,), qh, jnp.int32)
    return _run_encode_pallas(buf, jnp.asarray(p, jnp.int32),
                              jnp.asarray(qhl, jnp.int32),
                              (qw, qh, buf.shape[2]), tuple(caps), n,
                              interpret)


def encode_cleanup_pallas(buf, p, width: int, height: int,
                          caps, qhl=None, interpret: bool = False):
    """Per-stream-plane view of :func:`encode_cleanup_pallas_cat`:
    returns (melw, vlcw, msw word rows [N, W*], bits [N, 3],
    ovf [N]).  The pipeline uses the _cat variant (one detranspose);
    this split keeps the historical kernel API for tests/tools."""
    wm, wv, ws = caps
    cat, bits, ovf = encode_cleanup_pallas_cat(
        buf, p, width, height, caps, qhl=qhl, interpret=interpret)
    return (cat[:, :wm], cat[:, wm:wm + wv], cat[:, wm + wv:],
            bits, ovf)
