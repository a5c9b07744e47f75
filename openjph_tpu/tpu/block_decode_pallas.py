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
of its own stream) has no native TPU primitive; a word fetch is a
mask-multiply-reduce over the whole word plane (cost ~ W vregs).
That makes fetch COUNT the kernel's cost driver, so readers use a
160-bit five-limb window refilled adaptively: `refill_to(target)`
fetches only while some lane is short (an any-lane scalar condition
skips the whole fetch otherwise), which makes global fetch work track
actual stream consumption instead of the worst case per step.  The
2048-entry VLC tables are gathered through Mosaic's native 128-lane
dynamic_gather in 16 chunk passes.
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


# Page height for the gated stream fetch.  A fetch is a
# mask-multiply-reduce over word-plane rows (per-lane divergent reads
# have no native primitive); scanning all W rows per trip is the
# kernel's cost driver, so the scan is gated to the 32-row pages that
# contain some NEEDY lane's word index.  Lanes advance at similar
# rates within a tile (and the host packs lanes sorted by stream
# length), so the needy span is typically 1-3 pages out of ~24.
_PAGE = 32

# Refill trips executed with their own any-gate before the remaining
# worst-case trips drop behind a single shared gate (steady-state
# refills consume 1-2 words; see _refill_to).
_HEAD_TRIPS = 2


def _fetch(words_ref, wi, nwords: int, need=None):
    """words_ref (W,S,128) with W % _PAGE == 0; wi (S,128) int32 ->
    word per lane (clamped onto the guard words).  ``need`` masks the
    lanes whose result will be consumed; non-needy lanes may get
    garbage (the caller selects against them)."""
    wic = jnp.minimum(wi, nwords - 1)
    if need is None or nwords <= _PAGE:
        iota = lax.broadcasted_iota(jnp.int32, (nwords,) + wi.shape, 0)
        m = iota == wic[None]
        wsel = jnp.where(m, lax.bitcast_convert_type(words_ref[:],
                                                     jnp.int32), 0)
        return lax.bitcast_convert_type(jnp.sum(wsel, axis=0), _U32)
    pmin = jnp.min(jnp.where(need, wic, nwords - 1)) // _PAGE
    pmax = jnp.max(jnp.where(need, wic, 0)) // _PAGE

    def body(pg, acc):
        rows = words_ref[pl.ds(pg * _PAGE, _PAGE)]
        iota = lax.broadcasted_iota(jnp.int32, (_PAGE,) + wi.shape, 0) \
            + pg * _PAGE
        m = iota == wic[None]
        wsel = jnp.where(m, lax.bitcast_convert_type(rows, jnp.int32),
                         0)
        return acc + jnp.sum(wsel, axis=0)

    acc = lax.fori_loop(pmin, pmax + 1, body,
                        jnp.zeros(wi.shape, jnp.int32))
    return lax.bitcast_convert_type(acc, _U32)


# ---------------------------------------------------------------------------
# Five-limb (160-bit) bit window, consumed LSB-first from limb 0.
# State tuple: (w0..w4, nb, wi); nb = valid bits, wi = next word index.
# NB: min/max/clip stay in int32 — unsigned min/max crashes the Mosaic
# compiler on this target.
# ---------------------------------------------------------------------------

_NLIMB = 5


def _reader_zero(S):
    z = jnp.zeros((S, 128), _U32)
    zi = jnp.zeros((S, 128), jnp.int32)
    return (z, z, z, z, z, zi, zi)


def _adv(st, n):
    """Consume n in [0, 32] bits (n may vary per lane)."""
    w = list(st[:_NLIMB])
    nb, wi = st[_NLIMB], st[_NLIMB + 1]
    n = n.astype(jnp.int32) if hasattr(n, 'astype') \
        else jnp.full_like(nb, n)
    nc = jnp.clip(n, 1, 31).astype(_U32)
    inv = _u32(32) - nc
    out = []
    for k in range(_NLIMB):
        hi_part = (w[k + 1] << inv) if k + 1 < _NLIMB else _u32(0)
        mid = (w[k] >> nc) | hi_part
        full = w[k + 1] if k + 1 < _NLIMB else jnp.zeros_like(w[k])
        out.append(jnp.where(n == 0, w[k],
                             jnp.where(n == 32, full, mid)))
    return (*out, nb - n, wi)


def _push_word(st, wv):
    """Insert 32 fetched bits at position nb (assumes nb <= 128)."""
    w = list(st[:_NLIMB])
    nb, wi = st[_NLIMB], st[_NLIMB + 1]
    limb = nb >> 5
    off = (nb & 31).astype(_U32)
    lo_ins = wv << off
    hi_ins = jnp.where(off == 0, _u32(0),
                       wv >> (_u32(32) - jnp.clip(nb & 31, 1, 31)
                              .astype(_U32)))
    out = []
    for k in range(_NLIMB):
        v = w[k]
        v = jnp.where(limb == k, v | lo_ins, v)
        if k > 0:
            v = jnp.where(limb == k - 1, v | hi_ins, v)
        out.append(v)
    return (*out, nb + 32, wi + 1)


def _refill_to(st, target: int, words_ref, nwords: int):
    """Fetch words until every lane has >= target valid bits.  Each
    trip is skipped entirely (scalar branch) once no lane is short —
    fetch work tracks real consumption, not the worst case.

    In steady state a refill consumes 1-2 words, so trips past
    _HEAD_TRIPS sit behind ONE extra any-gate: the common case pays
    head + 1 cond regions instead of ``trips`` (each any/cond region
    costs ~1-2 us whether or not it fires; batching the fetches
    instead was measured 2x SLOWER — see architecture.md on why
    read-side region-minimization loses)."""
    trips = (target + 31) // 32

    def one_trip(s):
        def fetch(s):
            nd = s[_NLIMB] < target
            wv = _fetch(words_ref, s[_NLIMB + 1], nwords, need=nd)
            pushed = _push_word(s, wv)
            return tuple(jnp.where(nd, p, q) if p.dtype == q.dtype
                         else p
                         for p, q in zip(pushed, s))

        return lax.cond(jnp.any(s[_NLIMB] < target), fetch,
                        lambda s: s, s)

    head = min(trips, _HEAD_TRIPS)
    for _ in range(head):
        st = one_trip(st)
    if trips > head:
        def tail(s):
            for _ in range(trips - head):
                s = one_trip(s)
            return s

        st = lax.cond(jnp.any(st[_NLIMB] < target), tail,
                      lambda s: s, st)
    return st


def _push_bits(st, wv, k):
    """Insert ``k`` (per-lane, 0..32) bits of wv at position nb —
    the variable-length cousin of :func:`_push_word` for the raw
    readers (an unstuffed word carries 32 minus its deleted-bit
    count).  wv must be zero above its k payload bits
    (:func:`_delete_marked` guarantees it)."""
    w = list(st[:_NLIMB])
    nb, wi = st[_NLIMB], st[_NLIMB + 1]
    limb = nb >> 5
    off = (nb & 31).astype(_U32)
    lo_ins = wv << off
    hi_ins = jnp.where(off == 0, _u32(0),
                       wv >> (_u32(32) - jnp.clip(nb & 31, 1, 31)
                              .astype(_U32)))
    out = []
    for j in range(_NLIMB):
        v = w[j]
        v = jnp.where(limb == j, v | lo_ins, v)
        if j > 0:
            v = jnp.where(limb == j - 1, v | hi_ins, v)
        out.append(v)
    return (*out, nb + k, wi + 1)


def _delete_marked(w, d, iters: int):
    """Remove up to ``iters`` marked bits from each word, compacting
    the survivors toward the LSB (same loop as unstuff._delete_marked;
    duplicated here so the kernel has no XLA-module dependency)."""
    for _ in range(iters):
        b = d & (~d + _u32(1))
        mlow = b - _u32(1)
        w2 = (w & mlow) | ((w >> 1) & ~mlow)
        d2 = (d >> 1) & ~mlow
        keep = b == 0
        w = jnp.where(keep, w, w2)
        d = jnp.where(keep, d, d2)
    return w


# Raw-reader stream kinds (in-kernel unstuffing: the fetched word is
# the lane's RAW stuffed bytes; deletion masks follow the reference
# readers — frwd_struct32 / dec_mel_st / rev_struct,
# ojph_block_decoder32.cpp:63-723 — and mirror tpu/unstuff.py, the
# XLA formulation these rules are tested against)
_RAW_MS, _RAW_MEL, _RAW_VLC = 0, 1, 2


def _ingest(kind: int, wv, widx, nbytes, pb, fl):
    """Unstuff one raw word.  wv: fetched LE word; widx: its stream
    word index; nbytes: per-lane stream byte count; pb: previous raw
    byte; fl: previous byte's stuffed/dangle flag.  Returns
    (payload word, payload bit count, pb', fl')."""
    zero = jnp.zeros_like(wv)
    vals = zero
    dmask = zero
    for m in range(4):
        bidx = widx * 4 + m
        valid = bidx < nbytes
        b = (wv >> _u32(8 * m)) & _u32(0xFF)
        if kind == _RAW_MS:
            bv = jnp.where(valid, b, _u32(0xFF))
            carry = jnp.where(valid & (fl != 0), (pb >> _u32(7))
                              & _u32(1), _u32(0))
            stuffed = valid & (pb == 0xFF) & (bidx > 0)
            dmask = dmask | jnp.where(stuffed,
                                      _u32(1) << _u32(8 * m + 7),
                                      _u32(0))
            bv = bv | carry
            fl = stuffed.astype(_U32)
        elif kind == _RAW_MEL:
            bv0 = jnp.where(valid, b, _u32(0xFF))
            stuffed = valid & (pb == 0xFF) & (bidx > 0)
            dmask = dmask | jnp.where(stuffed, _u32(1) << _u32(8 * m),
                                      _u32(0))
            bv = _bitrev8_k(bv0)
        else:  # _RAW_VLC (reversed emission-order view)
            bv = jnp.where(valid, b, _u32(0))
            first = bidx == 0
            last = bidx == (nbytes - 1)
            carry = jnp.where(valid & (fl != 0), (pb >> _u32(7))
                              & _u32(1), _u32(0))
            drop = (~first) & valid & (pb > 0x8F) \
                & ((b & _u32(0x7F)) == 0x7F)
            nib3 = first & valid & (((b >> _u32(4)) & _u32(7)) == 7)
            dang = drop | nib3
            dmask = dmask | jnp.where(dang & ~last,
                                      _u32(1) << _u32(8 * m + 7),
                                      _u32(0))
            dmask = dmask | jnp.where(first & valid,
                                      _u32(0xF) << _u32(8 * m),
                                      _u32(0))
            bv = bv | carry
            fl = dang.astype(_U32)
        vals = vals | (bv << _u32(8 * m))
        pb = b
    k = 32 - lax.population_count(dmask).astype(jnp.int32)
    w = _delete_marked(vals, dmask, 8 if kind == _RAW_VLC else 4)
    return w, k, pb, fl


def _bitrev8_k(b):
    b = ((b & 0xF0) >> 4) | ((b & 0x0F) << 4)
    b = ((b & 0xCC) >> 2) | ((b & 0x33) << 2)
    b = ((b & 0xAA) >> 1) | ((b & 0x55) << 1)
    return b


def _refill_raw(st, bst, target: int, words_ref, nwords: int,
                kind: int, nbytes):
    """Raw-mode refill: fetch + unstuff + variable-length push until
    every lane has >= target bits.  A stuffed MagSgn/MEL word deletes
    at most 1 bit per byte (>= 28 payload bits); a VLC word also
    loses its leading 4-bit nibble (>= 24) — that bound sets the
    worst-case trip count.  Trips past _HEAD_TRIPS share one any-gate
    (see _refill_to)."""
    min_payload = 24 if kind == _RAW_VLC else 28
    trips = (target + min_payload - 1) // min_payload

    def one_trip(flat):
        def fetch(flat):
            s, pb, fl = flat[:7], flat[7], flat[8]
            nd = s[_NLIMB] < target
            wv = _fetch(words_ref, s[_NLIMB + 1], nwords, need=nd)
            w, k, pb2, fl2 = _ingest(kind, wv, s[_NLIMB + 1], nbytes,
                                     pb, fl)
            pushed = _push_bits(s, w, k)
            out = tuple(jnp.where(nd, a, b)
                        for a, b in zip(pushed, s))
            return out + (jnp.where(nd, pb2, pb),
                          jnp.where(nd, fl2, fl))

        return lax.cond(jnp.any(flat[_NLIMB] < target), fetch,
                        lambda x: x, flat)

    flat = tuple(st) + (bst[0], bst[1])
    head = min(trips, _HEAD_TRIPS)
    for _ in range(head):
        flat = one_trip(flat)
    if trips > head:
        def tail(flat):
            for _ in range(trips - head):
                flat = one_trip(flat)
            return flat

        flat = lax.cond(jnp.any(flat[_NLIMB] < target), tail,
                        lambda x: x, flat)
    return flat[:7], (flat[7], flat[8])


def _peek(st):
    return st[0]


def _extract(st, k):
    """Read k (per-lane, 0..31) bits LSB-first; caller refilled."""
    k = k.astype(jnp.int32) if hasattr(k, 'astype') \
        else jnp.full((st[0].shape[0], st[0].shape[1]), k, jnp.int32)
    mask = (_u32(1) << jnp.clip(k, 0, 31).astype(_U32)) - _u32(1)
    mask = jnp.where(k >= 32, _u32(0xFFFFFFFF), mask)
    val = st[0] & mask
    return val, _adv(st, k)


def _bitrev(v, length, maxlen=5):
    r = jnp.zeros_like(v)
    for i in range(maxlen):
        bit = (v >> _u32(i)) & _u32(1)
        pos = (length - 1 - i).astype(jnp.int32)
        r = r | jnp.where(pos >= 0,
                          bit << jnp.clip(pos, 0, 31).astype(_U32),
                          _u32(0))
    return r


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------

# scratch row map inside the (24, S, 128) u32 state buffer
# (raw mode appends 5 byte-state rows: prev byte + flag per stream)
_MEL0, _VLC0, _MS0 = 0, 7, 14          # 7 rows each: w0..w4, nb, wi
_MELK, _RUN, _PVN = 21, 22, 23
_MSPB, _MSPF, _MELPB, _VLCPB, _VLCPF = 24, 25, 26, 27, 28
_STATE_ROWS, _STATE_ROWS_RAW = 24, 29


def _make_kernel(qw: int, qh: int, S: int, wm: int, wv: int, ws: int,
                 width: int, raw: bool = False):
    # _fetch's page-gated path reads whole _PAGE-row slabs: any plane
    # taller than one page must be a page multiple (callers pad via
    # _pad_page; this guards future call sites against OOB pl.ds reads)
    for _w in (wm, wv, ws):
        assert _w <= _PAGE or _w % _PAGE == 0, \
            f'word plane height {_w} not a multiple of _PAGE={_PAGE}'
    pairs = (qw + 1) // 2

    def ld_reader(state, base):
        return tuple(
            state[base + k] if k < _NLIMB
            else state[base + k].astype(jnp.int32)
            for k in range(7))

    def st_reader(state, base, st):
        for k in range(_NLIMB):
            state[base + k] = st[k]
        state[base + 5] = st[5].astype(_U32)
        state[base + 6] = st[6].astype(_U32)

    def mel_get_run(mask, mel, mel_k, run):
        """One masked MEL run decode; consumes <= 6 bits (caller must
        have refilled >= 18 for up to 3 calls per pair)."""
        eva = _mel_exp(jnp.clip(mel_k, 0, 12))
        nbit = jnp.where(mask, 1, 0)
        b = _peek(mel) & ((_u32(1) << nbit.astype(_U32)) - _u32(1))
        mel = _adv(mel, nbit)
        one = mask & (b == 1)
        nev = jnp.where(mask & (b == 0), eva, 0)
        vrev = _peek(mel) & ((_u32(1) << jnp.clip(nev, 0, 31)
                              .astype(_U32)) - _u32(1))
        mel = _adv(mel, nev)
        v = _bitrev(vrev, eva)
        run_one = ((_u32(1) << eva.astype(_U32)) - _u32(1)) << _u32(1)
        run_zero = (v << _u32(1)) + _u32(1)
        new_run = jnp.where(one, run_one, run_zero).astype(jnp.int32)
        new_k = jnp.where(one, jnp.minimum(mel_k + 1, 12),
                          jnp.maximum(mel_k - 1, 0))
        return (jnp.where(mask, new_run, run), mel,
                jnp.where(mask, new_k, mel_k))

    def kernel(*refs):
        if raw:
            (melw, vlcw, msw, p_ref, qhl_ref, msn_ref, shn_ref,
             vlct, uvlct, dec_out, err_out,
             state, inf_prev, inf_cur, u_row, scr, newv) = refs
        else:
            (melw, vlcw, msw, p_ref, qhl_ref, vlct, uvlct,
             dec_out, err_out,
             state, inf_prev, inf_cur, u_row, scr, newv) = refs
        # grid = (lane tiles, quad rows); rows iterate innermost so the
        # VMEM reader/significance state persists across a tile's rows
        # and re-initializes at each tile's row 0
        r = pl.program_id(1)
        zero = jnp.zeros((S, 128), _U32)
        if raw:
            msn = msn_ref[:].astype(jnp.int32)
            shn = shn_ref[:].astype(jnp.int32)

        def refill_mel(mel, mpb, target: int):
            if raw:
                mel, bst = _refill_raw(mel, (mpb, zero), target,
                                       melw, wm, _RAW_MEL, shn)
                return mel, bst[0]
            return _refill_to(mel, target, melw, wm), mpb

        def refill_vlc(vlc, vbst, target: int):
            if raw:
                return _refill_raw(vlc, vbst, target, vlcw, wv,
                                   _RAW_VLC, shn)
            return _refill_to(vlc, target, vlcw, wv), vbst

        def refill_ms(ms, mbst, target: int):
            if raw:
                return _refill_raw(ms, mbst, target, msw, ws,
                                   _RAW_MS, msn)
            return _refill_to(ms, target, msw, ws), mbst

        @pl.when(r == 0)
        def _init():
            state[:] = jnp.zeros_like(state)
            inf_prev[:] = jnp.zeros_like(inf_prev)
            inf_cur[:] = jnp.zeros_like(inf_cur)
            scr[:] = jnp.zeros_like(scr)
            newv[:] = jnp.zeros_like(newv)
            err_out[:] = jnp.zeros_like(err_out)
            # initial refill + first MEL get_run (decoder32.cpp:862)
            mel, mpb0 = refill_mel(_reader_zero(S), zero, 24)
            zi = jnp.zeros((S, 128), jnp.int32)
            run0, mel, melk0 = mel_get_run(
                jnp.ones((S, 128), bool), mel, zi, zi)
            st_reader(state, _MEL0, mel)
            st_reader(state, _VLC0, _reader_zero(S))
            st_reader(state, _MS0, _reader_zero(S))
            state[_MELK] = melk0.astype(_U32)
            state[_RUN] = run0.astype(_U32)
            state[_PVN] = zero
            if raw:
                state[_MELPB] = mpb0

        initial = r == 0
        mel = ld_reader(state, _MEL0)
        vlc = ld_reader(state, _VLC0)
        mel_k = state[_MELK].astype(jnp.int32)
        run = state[_RUN].astype(jnp.int32)
        if raw:
            mel_pb = state[_MELPB]
            vlc_bst = (state[_VLCPB], state[_VLCPF])
        else:
            mel_pb = zero
            vlc_bst = (zero, zero)
        c_q = zero  # reset per row (row_start in the scan version)

        tbl_off = jnp.where(initial, 0, 1024)
        u_off = jnp.where(initial, 0, 320)

        # ---------------- step 1: one quad row (VLC/MEL/UVLC) -----------
        def pair_body(pi, carry):
            vlc, mel, mel_k, run, c_q, vpb, vfl, mpb = carry
            vlc_bst = (vpb, vfl)
            qx2 = pi * 2
            # per-pair worst case: VLC 7+7+15 bits, MEL 3 runs x 6 bits
            vlc, vlc_bst = refill_vlc(vlc, vlc_bst, 32)
            mel, mpb = refill_mel(mel, mpb, 18)
            a0 = inf_prev[pl.ds(qx2, 1)][0]
            a1 = inf_prev[pl.ds(qx2 + 1, 1)][0]
            a2 = inf_prev[pl.ds(qx2 + 2, 1)][0]
            second = (qx2 + 1) < qw

            c_q = jnp.where(initial, c_q,
                            c_q | ((a0 & _u32(0xA0)) << _u32(2))
                            | ((a1 & _u32(0x20)) << _u32(4)))
            idx0 = tbl_off + (c_q + (_peek(vlc) & _u32(0x7F))) \
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
            vlc = _adv(vlc, (t0 & _u32(7)).astype(jnp.int32))

            idx1 = tbl_off + (c_q + (_peek(vlc) & _u32(0x7F))) \
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
            vlc = _adv(vlc, (t1 & _u32(7)).astype(jnp.int32))

            # ---- u decode for the pair (decoder32.cpp:1001-1088) ----
            uvlc_mode = ((t0 & _u32(8)) << _u32(3)) \
                | ((t1 & _u32(8)) << _u32(4))
            needu = initial & (uvlc_mode == 0xC0)
            run = jnp.where(needu, run - 2, run)
            uvlc_mode = jnp.where(needu & (run == -1),
                                  uvlc_mode + _u32(0x40), uvlc_mode)
            run, mel, mel_k = mel_get_run(needu & (run < 0), mel,
                                          mel_k, run)
            uidx = u_off + (uvlc_mode + (_peek(vlc) & _u32(0x3F))) \
                .astype(jnp.int32)
            ue = _tbl_lookup(uvlct, uidx, 6)
            vlc = _adv(vlc, (ue & _u32(7)).astype(jnp.int32))
            ue = ue >> _u32(3)
            length = (ue & _u32(0xF)).astype(jnp.int32)
            tmp, vlc = _extract(vlc, length)
            ue = ue >> _u32(4)
            len0 = (ue & _u32(7)).astype(_U32)
            ue = ue >> _u32(3)
            kappa = jnp.where(initial, _u32(1), _u32(0))
            u0 = kappa + (ue & _u32(7)) + (tmp & ~(_u32(0xFF) << len0))
            u1 = kappa + (ue >> _u32(3)) + (tmp >> len0)
            u1 = jnp.where(second, u1, _u32(0))
            u_row[pl.ds(qx2, 1)] = u0[None]
            u_row[pl.ds(qx2 + 1, 1)] = u1[None]
            return (vlc, mel, mel_k, run, c_q,
                    vlc_bst[0], vlc_bst[1], mpb)

        (vlc, mel, mel_k, run, c_q, vpb, vfl, mpb) = lax.fori_loop(
            0, pairs, pair_body,
            (vlc, mel, mel_k, run, c_q, vlc_bst[0], vlc_bst[1],
             mel_pb))

        st_reader(state, _MEL0, mel)
        st_reader(state, _VLC0, vlc)
        state[_MELK] = mel_k.astype(_U32)
        state[_RUN] = run.astype(_U32)
        if raw:
            state[_MELPB] = mpb
            state[_VLCPB] = vpb
            state[_VLCPF] = vfl

        # ---------------- step 2: MagSgn sample fill --------------------
        ms = ld_reader(state, _MS0)
        ms_bst = (state[_MSPB], state[_MSPF]) if raw else (zero, zero)
        prev_vn = state[_PVN]
        err = err_out[:]
        p = p_ref[:].astype(_U32)
        mmsbp2 = _u32(32) - p
        qhl = qhl_ref[:]
        in_lim = r < qhl

        def quad_body(qx, carry):
            ms, prev_vn, err, mspb, mspf = carry
            # one adaptive refill covers the quad's 4 samples
            # (4 x up to 31 bits = 124 <= 5-limb capacity)
            ms, (mspb, mspf) = refill_ms(ms, (mspb, mspf), 124)
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
                m_n = jnp.where(
                    sig, (U_q - ((q_inf >> _u32(12 + bit)) & _u32(1)))
                    .astype(jnp.int32), 0)
                m_n = jnp.clip(m_n, 0, 31)
                ms_val = _peek(ms)
                ms = _adv(ms, m_n)
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
            return (ms, prev_vn, err, mspb, mspf)

        ms, prev_vn, err, mspb, mspf = lax.fori_loop(
            0, qw, quad_body, (ms, prev_vn, err, ms_bst[0], ms_bst[1]))
        err_out[:] = err
        st_reader(state, _MS0, ms)
        if raw:
            state[_MSPB] = mspb
            state[_MSPF] = mspf

        # rotate rows: inf_prev <- inf_cur, scr <- newv (+ tail), clear
        newv[pl.ds(qw, 1)] = prev_vn[None]
        state[_PVN] = zero
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


# VMEM working-set budget per lane tile (bytes).  v5e/v5p cores have
# 128 MiB of VMEM; the kernel raises Mosaic's scoped limit
# (vmem_limit_bytes below) instead of living under the 16 MiB
# default.  Mosaic double-buffers every grid-indexed block, so
# in/out block rows count twice; scratch does not.
_VMEM_BUDGET = 96 << 20
_VMEM_LIMIT = 126 << 20


def _lane_tile(S: int, qw: int, wm: int, wv: int, ws: int,
               raw: bool = False) -> int:
    """Lane-tile size whose per-tile VMEM working set (stream blocks
    + output row block + scratch) fits the budget — the batch axis is
    tiled by the grid, so total lane count never constrains
    compilation.  Mosaic requires a block's sublane dimension to be a
    multiple of 8 or equal to the full extent, so the tile is either
    S itself (when it fits) or a multiple of 8 (the caller pads S up
    to a multiple of the tile)."""
    qw2 = ((qw + 1) // 2) * 2
    io_rows = (wm + wv + ws) + 2 + qw * 4 + 1       # double-buffered
    if raw:
        io_rows += 2          # msn/shn per-lane input blocks
    scratch_rows = (_STATE_ROWS_RAW if raw else _STATE_ROWS) \
        + 2 * (qw2 + 3) + qw2 + 2 * (qw + 2)
    per_sb = (2 * io_rows + scratch_rows) * 128 * 4
    sb_max = max(1, _VMEM_BUDGET // per_sb)
    if S <= sb_max:
        return S
    return max(8, (sb_max // 8) * 8)


@partial(jax.jit, static_argnums=(7, 8, 9))
def _run_pallas(melw, vlcw, msw, p, qhl, msn, shn, dims, nlanes,
                interpret=False):
    """melw.. [N, W] u32; p, qhl [N] i32; dims=(qw,qh,width);
    nlanes=N.  msn/shn non-None selects the raw (in-kernel unstuff)
    reader mode."""
    qw, qh, width = dims
    S0 = nlanes // 128
    ones = np.uint32(0xFFFFFFFF)
    # word planes padded to _PAGE multiples for the page-gated fetch
    # (pad rows carry each stream's guard fill)
    def _pad_page(w, guard):
        W0 = w.shape[1]
        Wp = -(-W0 // _PAGE) * _PAGE
        if Wp != W0:
            w = jnp.pad(w, ((0, 0), (0, Wp - W0)),
                        constant_values=guard)
        return w
    melw = _pad_page(melw, ones)
    vlcw = _pad_page(vlcw, np.uint32(0))
    msw = _pad_page(msw, ones)
    wm, wv, ws = melw.shape[1], vlcw.shape[1], msw.shape[1]
    raw = msn is not None
    SB = _lane_tile(S0, qw, wm, wv, ws, raw=raw)
    S = -(-S0 // SB) * SB   # pad lanes so the tile divides evenly
    if S != S0:
        padl = (S - S0) * 128
        melw = jnp.pad(melw, ((0, padl), (0, 0)),
                       constant_values=ones)
        vlcw = jnp.pad(vlcw, ((0, padl), (0, 0)))
        msw = jnp.pad(msw, ((0, padl), (0, 0)),
                      constant_values=ones)
        p = jnp.pad(p, (0, padl), constant_values=30)
        qhl = jnp.pad(qhl, (0, padl))  # qhl 0: no error reporting
    n_sb = S // SB

    if raw:
        msn = jnp.pad(msn, (0, S * 128 - nlanes))
        shn = jnp.pad(shn, (0, S * 128 - nlanes))
    kern = _make_kernel(qw, qh, SB, wm, wv, ws, width, raw=raw)

    vlct, uvlct = _tables_chunks()

    def tr(w):
        return w.reshape(S, 128, w.shape[1]).transpose(2, 0, 1)

    qw2 = ((qw + 1) // 2) * 2
    grid = (n_sb, qh)
    strm3 = lambda sb, r: (0, sb, 0)
    lane2 = lambda sb, r: (sb, 0)
    const2 = lambda sb, r: (0, 0)
    lane_in = [jnp.asarray(melw), jnp.asarray(vlcw), jnp.asarray(msw),
               p.reshape(S, 128), qhl.reshape(S, 128)]
    lane_specs = [
        pl.BlockSpec((wm, SB, 128), strm3, memory_space=pltpu.VMEM),
        pl.BlockSpec((wv, SB, 128), strm3, memory_space=pltpu.VMEM),
        pl.BlockSpec((ws, SB, 128), strm3, memory_space=pltpu.VMEM),
        pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
        pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
    ]
    if raw:
        lane_in += [msn.reshape(S, 128), shn.reshape(S, 128)]
        lane_specs += [
            pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
        ]
    dec, err = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=lane_specs + [
            pl.BlockSpec((16, 128), const2, memory_space=pltpu.VMEM),
            pl.BlockSpec((6, 128), const2, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, qw * 4, SB, 128),
                         lambda sb, r: (r, 0, sb, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SB, 128), lane2, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qh, qw * 4, S, 128), jnp.uint32),
            jax.ShapeDtypeStruct((S, 128), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
        scratch_shapes=[
            pltpu.VMEM((_STATE_ROWS_RAW if raw else _STATE_ROWS,
                        SB, 128), jnp.uint32),           # reader state
            pltpu.VMEM((qw2 + 3, SB, 128), jnp.uint32),  # inf_prev
            pltpu.VMEM((qw2 + 3, SB, 128), jnp.uint32),  # inf_cur
            pltpu.VMEM((qw2, SB, 128), jnp.uint32),      # u_row
            pltpu.VMEM((qw + 2, SB, 128), jnp.uint32),   # scr
            pltpu.VMEM((qw + 2, SB, 128), jnp.uint32),   # newv
        ],
    )(tr(lane_in[0]), tr(lane_in[1]), tr(lane_in[2]),
      *lane_in[3:], vlct, uvlct)

    # (qh, qw*4, S, 128) -> [N, 2qh, 2qw]; sample n = dx*2 + dy
    d = dec.reshape(qh, qw, 2, 2, S * 128)       # (r, qx, dx, dy, lane)
    d = d.transpose(4, 0, 3, 1, 2).reshape(S * 128, qh * 2, qw * 2)
    return d[:nlanes], err.reshape(S * 128)[:nlanes] != 0


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
                           None, None,
                           (qw, qh, width), n, interpret)
    return dec[:, :height, :width], err


def decode_cleanup_pallas_raw(melw, vlcw, msw, p, width: int,
                              height: int, qh_lim, msn, shn,
                              interpret: bool = False):
    """Raw-bytes variant: the word planes carry each lane's STUFFED
    bytes (MagSgn prefix forward; the MEL/VLC shared suffix forward /
    reversed — unstuff._lane_words_fwd/_rev views) and the kernel
    unstuffs on the fly in its readers, like the reference's
    dec_mel_st/rev_struct/frwd_struct32 (ojph_block_decoder32.cpp:
    63-723).  msn / shn: per-lane byte counts of the MagSgn prefix
    and the shared suffix.  Replaces the separate XLA unstuff stage
    for single-pass streams (same throughput on v5e — the window
    fetch, shared by both, dominates — but no dense intermediates in
    HBM; see pipeline._raw_t1)."""
    n = melw.shape[0]
    qw = (width + 1) >> 1
    qh = (height + 1) >> 1
    if qh_lim is None:
        qh_lim = jnp.full((n,), qh, jnp.int32)
    dec, err = _run_pallas(melw, vlcw, msw,
                           jnp.asarray(p, jnp.int32),
                           jnp.asarray(qh_lim, jnp.int32),
                           jnp.asarray(msn, jnp.int32),
                           jnp.asarray(shn, jnp.int32),
                           (qw, qh, width), n, interpret)
    return dec[:, :height, :width], err
