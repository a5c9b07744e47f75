"""Batched SigProp + MagRef refinement decode on TPU (JAX lax.scan).

The HT refinement passes (ojph_block_decoder32.cpp:1318-1611) refine
the cleanup result of a codeblock from one extra coded segment:
SigProp reads it forward (zero fill), MagRef reads it backward with
its own unstuffing rule (rev_init_mrp, :517-575).  Like the cleanup
kernel (block_decode.py), the codeblock is the batch axis: the scan
steps walk the 4-row stripes of the block and every step is an
N-lane VPU op.  SigProp's within-group neighbour propagation is
bit-serial over the 16 samples of a 4x4 group (the decision for one
sample feeds the candidacy of the next) and is unrolled as 16 masked
vector steps; the sign read and all of MagRef are parallel bit
deposits (PDEP by cumulative popcount) over a [N, 16/32] axis.

Lanes are individually gated by a per-lane pass count, so a batch can
mix 1-, 2- and 3-pass codeblocks; per-lane true heights support
height-merged groups (rows past a lane's height neither consume bits
nor write samples); per-lane `causal` applies the stripe-causal COD
flag (0x8) of each lane's component.

Bit-exact against coding/decoder.py::_decode_spp_mrp (the scalar
oracle) and transitively against ojph_expand (tests/test_multipass.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .block_decode import (_advance, _peek, _reader_init, _refill,
                           decode_cleanup_core)

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


# spread[k] per row k of a column: the neighbours (same column rows
# k-1..k+1 and next column rows k-1..k+1, plus the sample itself)
# that become SigProp candidates when sample k turns significant
# (ojph_block_decoder32.cpp:1452-1474).
_SPREAD = (0x33, 0x76, 0xEC, 0xC8)
# absolute candidate-spread mask for group bit position pos = 4*col+row
_SPREAD_POS = tuple(_SPREAD[pos & 3] << (pos & ~3) for pos in range(16))

_AR16 = np.arange(16, dtype=np.uint32)
_MASKS16 = ((np.uint32(1) << _AR16) - np.uint32(1))
_AR32 = np.arange(32, dtype=np.uint32)
_MASKS32 = ((np.uint64(1) << _AR32.astype(np.uint64)) - 1) \
    .astype(np.uint32)


def sig_pack(dec, n_sy: int, n_gx: int, h_lim):
    """Pack cleanup significance into [N, n_sy+1, n_gx+1] uint32 with
    bit (4*col+row) of entry (sy, gx) = sample (4sy+row, 4gx+col) != 0;
    one zero pad row/col for the neighbour reads.  ``h_lim`` [N] masks
    rows >= a lane's true height (height-merged batches decode cropped
    garbage there).  Mirrors the rearrangement at
    ojph_block_decoder32.cpp:1333-1356."""
    N, H, W = dec.shape
    rows_ok = jnp.arange(H, dtype=jnp.int32)[None, :, None] \
        < h_lim[:, None, None]
    nz = (dec != 0) & rows_ok
    Hp, Wp = n_sy * 4, n_gx * 4
    nz = jnp.pad(nz, ((0, 0), (0, Hp - H), (0, Wp - W)))
    yy = np.arange(Hp) % 4
    xx = np.arange(Wp) % 4
    wgt = (np.uint32(1) << (xx[None, :] * 4 + yy[:, None])
           .astype(np.uint32))
    contr = jnp.where(nz, jnp.asarray(wgt)[None], _u32(0))
    sig = contr.reshape(N, n_sy, 4, n_gx, 4).sum(axis=(2, 4),
                                                 dtype=_U32)
    return jnp.pad(sig, ((0, 0), (0, 1), (0, 1)))


def _sigprop(dec, spp_w, sig, p, h_lim, causal, do_spp,
             width: int, height: int, n_sy: int, n_gx: int):
    """Significance-propagation pass over [N, height, width] cleanup
    output (ojph_block_decoder32.cpp:1358-1556)."""
    N = dec.shape[0]
    # static per-step inputs: the (sy, gx) raster
    sys_ = np.repeat(np.arange(n_sy), n_gx).astype(np.int32)
    gxs = np.tile(np.arange(n_gx), n_sy).astype(np.int32)
    row_start = (gxs == 0)
    # pattern = pattern0 >> 4*s, s = columns past the block width
    shifts = np.array([4 * max(4 * g + 4 - width, 0) for g in gxs],
                      np.uint32)
    cs_all = sig[:, :, :-1] | (sig[:, :, 1:] << _u32(16))
    cs_s = cs_all[:, :n_sy, :].reshape(N, -1).T          # [steps, N]
    ns_s = cs_all[:, 1:n_sy + 1, :].reshape(N, -1).T
    xs = (jnp.asarray(sys_), jnp.asarray(gxs), jnp.asarray(row_start),
          jnp.asarray(shifts), cs_s, ns_s)

    val16 = _u32(3) << (p.astype(_U32) - _u32(2))        # [N]
    rd0 = _reader_init(N)
    carry0 = (rd0, jnp.zeros((N, n_gx + 1), _U32), jnp.zeros((N,), _U32))

    def step(carry, x):
        sy, gx, row_start, shift, cs, ns = x
        rd, prow, prev = carry
        prev = jnp.where(row_start, _u32(0), prev)
        rl = h_lim - 4 * sy
        pattern0 = jnp.where(
            rl >= 4, _u32(0xFFFF),
            jnp.where(rl == 3, _u32(0x7777),
                      jnp.where(rl == 2, _u32(0x3333),
                                jnp.where(rl == 1, _u32(0x1111),
                                          _u32(0)))))
        pattern = jnp.where(do_spp, pattern0 >> shift, _u32(0))
        p0 = lax.dynamic_slice_in_dim(prow, gx, 1, axis=1)[:, 0]
        p1 = lax.dynamic_slice_in_dim(prow, gx + 1, 1, axis=1)[:, 0]
        ps = p0 | (p1 << _u32(16))
        u = (ps & _u32(0x88888888)) >> _u32(3)
        u = jnp.where(causal, u,
                      u | ((ns & _u32(0x11111111)) << _u32(3)))
        mbr = cs
        mbr = mbr | ((cs & _u32(0x77777777)) << _u32(1))
        mbr = mbr | ((cs & _u32(0xEEEEEEEE)) >> _u32(1))
        mbr = mbr | u
        mbr = mbr | (mbr << _u32(4)) | (mbr >> _u32(4))
        mbr = mbr | (prev >> _u32(12))
        mbr = mbr & pattern & ~cs
        new_sig = mbr
        inv_sig = ~cs & pattern

        rd = _refill(rd, spp_w)
        cwd = _peek(rd)
        cnt = jnp.zeros((N,), jnp.int32)
        # candidate loop: bit-serial over the 16 group samples — each
        # decision spreads new candidates forward within the group
        for pos in range(16):
            take = (new_sig >> _u32(pos)) & _u32(1)
            setb = (take & cwd & _u32(1)) != 0
            new_sig = new_sig & _u32(~(1 << pos) & 0xFFFFFFFF)
            new_sig = jnp.where(setb,
                                new_sig | (_u32(_SPREAD_POS[pos])
                                           & inv_sig),
                                new_sig)
            cwd = jnp.where(take != 0, cwd >> _u32(1), cwd)
            cnt = cnt + take.astype(jnp.int32)
        # sign read: parallel deposit of the next popcount(new_sig)
        # bits at the newly-significant positions
        pc = lax.population_count(new_sig[:, None]
                                  & jnp.asarray(_MASKS16)[None, :])
        newly = ((new_sig[:, None] >> jnp.asarray(_AR16)[None, :])
                 & _u32(1)) != 0
        sgn = (cwd[:, None] >> pc.astype(_U32)) & _u32(1)
        vals = jnp.where(newly, (sgn << _u32(31)) | val16[:, None],
                         _u32(0))
        cnt = cnt + lax.population_count(new_sig).astype(jnp.int32)
        rd = _advance(rd, cnt)

        new_sig = new_sig | cs
        prow = lax.dynamic_update_slice_in_dim(
            prow, (new_sig & _u32(0xFFFF))[:, None], gx, axis=1)
        tt = new_sig & _u32(0xFFFF)
        n16 = tt | ((tt & _u32(0x7777)) << _u32(1)) \
            | ((tt & _u32(0xEEEE)) >> _u32(1))
        prev = (n16 | u) & _u32(0xF000)
        return (rd, prow, prev), vals

    _, vals = lax.scan(step, carry0, xs)
    # [steps, N, 16] with bit order 4*col+row -> [N, 4*n_sy, 4*n_gx]
    v = vals.reshape(n_sy, n_gx, N, 4, 4)       # [sy, gx, n, col, row]
    full = jnp.transpose(v, (2, 0, 4, 1, 3)).reshape(
        N, n_sy * 4, n_gx * 4)[:, :height, :width]
    return jnp.where(full != 0, full, dec)


def _magref(dec, mrp_w, sig, p, do_mrp, width: int, height: int,
            n_sy: int, n_gx: int):
    """Magnitude-refinement pass (ojph_block_decoder32.cpp:1564-1610):
    one backward-read bit per cleanup-significant sample, XORed into
    bits p-1 / p-2."""
    N = dec.shape[0]
    n_g2 = (n_gx + 1) // 2
    sig32_all = sig[:, :n_sy, 0:2 * n_g2:2] \
        | (sig[:, :n_sy, 1:2 * n_g2 + 1:2] << _u32(16))
    sig_s = sig32_all.reshape(N, -1).T                   # [steps, N]

    pu = p.astype(_U32)
    half = _u32(1) << (pu - _u32(2))                     # [N]
    upper = _u32(1) << (pu - _u32(1))
    rd0 = _reader_init(N)

    m32 = jnp.asarray(_MASKS32)[None, :]
    a32 = jnp.asarray(_AR32)[None, :]

    def step(rd, sig32):
        sig32 = jnp.where(do_mrp, sig32, _u32(0))
        rd = _refill(rd, mrp_w)
        cwd = _peek(rd)
        pc = lax.population_count(sig32[:, None] & m32)
        has = ((sig32[:, None] >> a32) & _u32(1)) != 0
        sym = (cwd[:, None] >> pc.astype(_U32)) & _u32(1)
        v = jnp.where(sym != 0, half[:, None],
                      upper[:, None] | half[:, None])
        xor = jnp.where(has, v, _u32(0))
        rd = _advance(rd, lax.population_count(sig32).astype(jnp.int32))
        return rd, xor

    _, xors = lax.scan(step, rd0, sig_s)
    # [steps, N, 32] with bit order 4*col+row over 8 cols
    v = xors.reshape(n_sy, n_g2, N, 8, 4)        # [sy, g2, n, col, row]
    full = jnp.transpose(v, (2, 0, 4, 1, 3)).reshape(
        N, n_sy * 4, n_g2 * 8)[:, :height, :width]
    return dec ^ full


def refine_core(dec, spp_w, mrp_w, p, npasses, h_lim, causal,
                width: int, height: int):
    """Apply SigProp (npasses >= 2) and MagRef (npasses >= 3) to the
    cleanup output ``dec`` [N, height, width]; per-lane gates make
    mixed batches safe.  Traceable (for fusing after
    decode_cleanup_core)."""
    n_sy = (height + 3) >> 2
    n_gx = (width + 3) >> 2
    do_spp = npasses >= 2
    do_mrp = npasses >= 3
    sig = sig_pack(dec, n_sy, n_gx, h_lim)
    out = _sigprop(dec, spp_w, sig, p, h_lim, causal, do_spp,
                   width, height, n_sy, n_gx)
    out = _magref(out, mrp_w, sig, p, do_mrp, width, height,
                  n_sy, n_gx)
    return jnp.where(do_spp[:, None, None], out, dec)


@partial(jax.jit, static_argnums=(9, 10))
def decode_cleanup_refine(mel_w, vlc_w, ms_w, spp_w, mrp_w, p, npasses,
                          h_lim, causal, width: int, height: int):
    """Fused cleanup + SigProp/MagRef decode of N same-width blocks.

    Streams from bitprep/prep_refine_streams; p = 30 - missing_msbs
    [N] int32; npasses [N] int32 (1..3); h_lim [N] true heights;
    causal [N] bool.  Returns (dec [N, height, width] uint32, err [N]).
    """
    qh_lim = (h_lim + 1) >> 1
    dec, err = decode_cleanup_core(mel_w, vlc_w, ms_w, p, width, height,
                                   qh_lim)
    dec = refine_core(dec, spp_w, mrp_w, p, npasses, h_lim, causal,
                      width, height)
    return dec, err


# ---------------------------------------------------------------------------
# Host-side dense-stream prep for the refinement segment
# ---------------------------------------------------------------------------

def prep_refine_streams(datas, lcups, len2s, min_words=None):
    """Batch refine-stream prep: native C++ when available, numpy
    otherwise (same contract as prep_refine_streams_np)."""
    from .. import native
    if native.have_native():
        return native.prep_refine_streams(datas, lcups, len2s,
                                          min_words=min_words)
    return prep_refine_streams_np(datas, lcups, len2s,
                                  min_words=min_words)


def prep_refine_streams_np(datas, lcups, len2s, min_words=None):
    """Build the SigProp (forward, zero fill) and MagRef (backward,
    rev_init_mrp unstuffing) dense word streams for a batch.

    ``datas[i]`` must hold at least ``lcups[i] + len2s[i]`` bytes (the
    refinement segment is data[lcup : lcup+len2]).  Lanes with
    len2 == 0 produce all-zero streams.  Returns dict with 'spp'/'mrp'
    uint32 word arrays [N, W]."""
    from .bitprep import _BIT_IDX_LSB, _compact_bits, _pack_words
    n = len(datas)
    lcups = np.asarray(lcups, dtype=np.int64)
    len2s = np.asarray(len2s, dtype=np.int64)
    max_len = max(1, int(len2s.max())) if n else 1
    buf = np.zeros((n, max_len), dtype=np.uint8)
    for i, d in enumerate(datas):
        l2 = int(len2s[i])
        if l2:
            arr = np.frombuffer(d, dtype=np.uint8)
            buf[i, :l2] = arr[lcups[i]:lcups[i] + l2]

    cols = np.arange(max_len, dtype=np.int64)[None, :]
    valid = cols < len2s[:, None]

    # ---- SigProp forward: LSB-first, 7 bits after 0xFF, zero fill ----
    sb = np.where(valid, buf, 0)
    prev_ff = np.zeros_like(valid)
    prev_ff[:, 1:] = (sb[:, :-1] == 0xFF) & valid[:, :-1]
    bits = ((sb[:, :, None] >> _BIT_IDX_LSB[None, None, :]) & 1) \
        .astype(np.uint8)
    # frwd_struct32 carry: the dropped b7 ORs into the next byte's b0
    bits[:, 1:, 0] |= (prev_ff[:, :-1] & valid[:, 1:]
                       ) * (sb[:, :-1] >> 7).astype(np.uint8)
    keep = np.repeat(valid[:, :, None], 8, axis=2)
    keep[:, :, 7] &= ~prev_ff
    dense, _ = _compact_bits(bits.reshape(n, -1), keep.reshape(n, -1),
                             fill_ones=False)
    spp_w = _pack_words(dense, guard_ones=False)

    # ---- MagRef backward (rev_init_mrp, decoder32.cpp:517-575):
    # bytes from data[lcup+len2-1] downward, LSB-first, bit 7 dropped
    # when the PREVIOUSLY-read byte was > 0x8F (initially treated as
    # true) and this byte's low 7 bits are all ones; the dropped bit
    # ORs into the next byte's b0; zero fill.
    ridx = np.clip(len2s[:, None] - 1 - cols, 0, None)
    rb = np.take_along_axis(buf, ridx, axis=1)
    rb = np.where(valid, rb, 0)
    prev_uns = np.zeros_like(valid)
    prev_uns[:, 0] = True
    prev_uns[:, 1:] = rb[:, :-1] > 0x8F
    drop = valid & prev_uns & ((rb & 0x7F) == 0x7F)
    bits = ((rb[:, :, None] >> _BIT_IDX_LSB[None, None, :]) & 1) \
        .astype(np.uint8)
    bits[:, 1:, 0] |= (drop[:, :-1] & valid[:, 1:]
                       ) * (rb[:, :-1] >> 7).astype(np.uint8)
    keep = np.repeat(valid[:, :, None], 8, axis=2)
    keep[:, :, 7] &= ~drop
    # a bit dropped from the LAST byte stays visible before the zero
    # fill (rev_struct keeps it in tmp)
    lanes = np.arange(n)
    last = np.maximum(len2s - 1, 0)
    tail = (len2s > 0) & drop[lanes, last] \
        & (rb[lanes, last] >> 7).astype(bool)
    all_bits = np.concatenate([bits.reshape(n, -1),
                               tail.astype(np.uint8)[:, None]], axis=1)
    all_keep = np.concatenate([keep.reshape(n, -1), tail[:, None]],
                              axis=1)
    dense, _ = _compact_bits(all_bits, all_keep, fill_ones=False)
    mrp_w = _pack_words(dense, guard_ones=False)

    out = {'spp': spp_w, 'mrp': mrp_w}
    if min_words is not None:
        for k, mw in zip(('spp', 'mrp'), min_words):
            arr = out[k]
            if arr.shape[1] < mw:
                pad = np.zeros((arr.shape[0], mw - arr.shape[1]),
                               np.uint32)
                out[k] = np.concatenate([arr, pad], axis=1)
            elif arr.shape[1] > mw:
                out[k] = np.ascontiguousarray(arr[:, :mw])
    return out
