"""Batched HT cleanup-pass block encoder on TPU (JAX lax.scan).

Encodes N same-width codeblocks of sign-magnitude samples into
per-quad-pair emission records: VLC codewords (table-gathered), MEL
event bits, and MagSgn (value, length) pairs.  The serial byte packing
(MEL adaptive coder, backward VLC with >0x8F stuffing, MagSgn 0xFF
stuffing, fuse termination) runs in C++ on the host
(native/ojtpu_native.cpp:pack_cleanup_segments) — the device does all
the per-sample math, the host does pure byte emission.

Mirrors ojph_encode_codeblock32
(/root/reference/src/core/coding/ojph_block_encoder.cpp:542-1017);
record-for-record parity with coding/encoder.py is enforced by
tests/test_tpu_encode.py via byte-identical final segments.

Height-merged batches: blocks are padded with zero rows; padded rows
would emit spurious MEL events, so the host packer only consumes the
first pairs_real = qh_true * ceil(qw/2) steps of each lane (row-major
step order puts padded rows last).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..coding.tables import get_tables

_U32 = jnp.uint32


def _u32(x):
    return jnp.asarray(x, _U32)


def _enc_tables():
    t = get_tables()
    vlc = jnp.asarray(np.concatenate([t['enc_vlc0'], t['enc_vlc1']])
                      .astype(np.uint32))
    uv = t['enc_uvlc'].astype(np.uint32)  # [75, 6]
    return vlc, (jnp.asarray(uv[:, 0]), jnp.asarray(uv[:, 1]),
                 jnp.asarray(uv[:, 2]), jnp.asarray(uv[:, 3]))


def _qsample(t, p):
    """(sig, e, magsgn value) of one sample (ojph_block_encoder.cpp
    _quad_sample logic; t is uint32 sign-magnitude)."""
    val = ((t + t) >> p) & ~_u32(1)
    sig = val != 0
    v1 = val - _u32(1)
    e = jnp.where(sig, _u32(32) - jax.lax.clz(v1).astype(_U32), _u32(0))
    s = jnp.where(sig, (val - _u32(2)) + (t >> _u32(31)), _u32(0))
    return sig, e, s


def _uvlc_gather(uv, idx):
    pre, pre_len, suf, suf_len = uv
    i = jnp.clip(idx, 0, 74).astype(jnp.int32)
    return (jnp.take(pre, i, mode='clip'), jnp.take(pre_len, i,
                                                    mode='clip'),
            jnp.take(suf, i, mode='clip'), jnp.take(suf_len, i,
                                                    mode='clip'))


@partial(jax.jit, static_argnums=(2, 3))
def encode_cleanup(buf, p, width: int, height: int):
    """Jit wrapper over encode_cleanup_core."""
    return encode_cleanup_core(buf, p, width, height)


def encode_cleanup_core(buf, p, width: int, height: int):
    """Encode N same-shape blocks.

    buf: [N, hp, wp] uint32 sign-magnitude, hp = ceil(h/2)*2,
    wp = ceil(w/4)*4, padding zeroed.  p = 31 - kmax per lane [N]
    int32.  Returns per-step records, step-major:
      mel_e [S, N, 3] int8 (-1 absent), vlc_c [S, N, 6] uint16,
      vlc_l [S, N, 6] uint8, ms_v [S, N, 8] uint32, ms_l [S, N, 8] uint8
    with S = ceil(h/2) * ceil(ceil(w/2)/2) raster pair steps.
    """
    n = buf.shape[0]
    vlc_tbl, uv = _enc_tables()
    qw = (width + 1) >> 1
    qh = (height + 1) >> 1
    pairs = (qw + 1) >> 1
    pu = p.astype(_U32)

    js = np.tile(np.arange(pairs), qh).astype(np.int32)
    qys = np.repeat(np.arange(qh), pairs).astype(np.int32)
    initial = (qys == 0)
    row_start = (js == 0)
    second = (2 * js + 1) < qw
    xs = (jnp.asarray(js), jnp.asarray(qys), jnp.asarray(initial),
          jnp.asarray(row_start), jnp.asarray(second))

    zrow = jnp.zeros((n, qw + 2), jnp.int32)
    carry0 = (jnp.zeros((n,), _U32), zrow, zrow,
              jnp.zeros((n,), jnp.int32))

    def step(carry, x):
        j, qy, init, row_start, second = x
        c_q, e_val, cx_val, max_e = carry

        # ---- row initialization (before the first pair of a row) ----
        ev0 = e_val[:, 0]
        ev1 = e_val[:, 1]
        max_e = jnp.where(row_start, jnp.maximum(ev0, ev1) - 1, max_e)
        cx0 = cx_val[:, 0]
        cx1 = cx_val[:, 1]
        c_q = jnp.where(
            row_start,
            jnp.where(init, _u32(0),
                      (cx0 + (cx1 << 2)).astype(_U32)), c_q)
        e_val = e_val.at[:, 0].set(jnp.where(row_start, 0, ev0))
        cx_val = cx_val.at[:, 0].set(jnp.where(row_start, 0, cx0))

        # ---- fetch the 2x4 sample tile of this pair ----
        tile = jax.lax.dynamic_slice(
            buf, (0, 2 * qy, 4 * j), (n, 2, 4))
        sg = [None] * 8
        ee = [None] * 8
        ss = [None] * 8
        for qi in range(2):
            for k, (r, cc) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
                sig, e, s = _qsample(tile[:, r, 2 * qi + cc], pu)
                sg[qi * 4 + k], ee[qi * 4 + k], ss[qi * 4 + k] = sig, e, s
        rho0 = (sg[0].astype(_U32) | (sg[1].astype(_U32) << 1)
                | (sg[2].astype(_U32) << 2) | (sg[3].astype(_U32) << 3))
        rho1 = (sg[4].astype(_U32) | (sg[5].astype(_U32) << 1)
                | (sg[6].astype(_U32) << 2) | (sg[7].astype(_U32) << 3))
        rho1 = jnp.where(second, rho1, _u32(0))
        emax0 = jnp.maximum(jnp.maximum(ee[0], ee[1]),
                            jnp.maximum(ee[2], ee[3])).astype(jnp.int32)
        emax1 = jnp.maximum(jnp.maximum(ee[4], ee[5]),
                            jnp.maximum(ee[6], ee[7])).astype(jnp.int32)

        # ---- quad 0 ----
        two0 = (rho0 & (rho0 - _u32(1))) != 0
        kappa0 = jnp.where(init, 1,
                           jnp.where(two0, jnp.maximum(1, max_e), 1))
        Uq0 = jnp.maximum(emax0, kappa0)
        u_q0 = (Uq0 - kappa0).astype(jnp.int32)
        eps0 = _u32(0)
        for k in range(4):
            hit = (ee[k].astype(jnp.int32) == emax0) & (ee[k] > 0)
            eps0 = eps0 | (jnp.where((u_q0 > 0) & hit, _u32(1), _u32(0))
                           << _u32(k))
        # e_val / cx_val bookkeeping (quad boundary maxima)
        le = 2 * j
        prev_b = jax.lax.dynamic_slice_in_dim(e_val, le, 1, 1)[:, 0]
        e_val = jax.lax.dynamic_update_slice_in_dim(
            e_val, jnp.maximum(prev_b, ee[1].astype(jnp.int32))[:, None],
            le, 1)
        nxt1 = jax.lax.dynamic_slice_in_dim(e_val, le + 1, 1, 1)[:, 0]
        nxt2 = jax.lax.dynamic_slice_in_dim(e_val, le + 2, 1, 1)[:, 0]
        max_e = jnp.where(init, max_e, jnp.maximum(nxt1, nxt2) - 1)
        e_val = jax.lax.dynamic_update_slice_in_dim(
            e_val, ee[3].astype(jnp.int32)[:, None], le + 1, 1)
        cxp = jax.lax.dynamic_slice_in_dim(cx_val, le, 1, 1)[:, 0]
        cx_val = jax.lax.dynamic_update_slice_in_dim(
            cx_val, (cxp | ((rho0 & _u32(2)) >> 1).astype(jnp.int32))
            [:, None], le, 1)
        cq1b1 = jax.lax.dynamic_slice_in_dim(cx_val, le + 1, 1, 1)[:, 0]
        cq1b2 = jax.lax.dynamic_slice_in_dim(cx_val, le + 2, 1, 1)[:, 0]
        c_q1_base = (cq1b1 + (cq1b2 << 2)).astype(_U32)
        cx_val = jax.lax.dynamic_update_slice_in_dim(
            cx_val, ((rho0 & _u32(8)) >> 3).astype(jnp.int32)[:, None],
            le + 1, 1)

        tbase = jnp.where(init, 0, 2048).astype(jnp.int32)
        idx0 = tbase + ((c_q << 8) + (rho0 << 4) + eps0).astype(jnp.int32)
        tuple0 = jnp.take(vlc_tbl, idx0, mode='clip')
        mel0 = jnp.where(c_q == 0,
                         jnp.where(rho0 != 0, 1, 0), -1).astype(jnp.int8)
        ms_v = []
        ms_l = []
        for k in range(4):
            m = jnp.where(((rho0 >> _u32(k)) & _u32(1)) != 0,
                          (Uq0.astype(_U32)
                           - ((tuple0 >> _u32(k)) & _u32(1))), _u32(0))
            m = jnp.minimum(m, _u32(31))
            ms_v.append(ss[k] & ((_u32(1) << m) - _u32(1)))
            ms_l.append(m.astype(jnp.uint8))

        # ---- quad 1 ----
        # the rho0 neighbour bits join the context only inside the
        # second-quad branch; the bare base feeds the next pair when
        # the second quad is absent (ojph_block_encoder.cpp, c_q chain)
        c_q1 = jnp.where(
            init, (rho0 >> 1) | (rho0 & _u32(1)),
            c_q1_base | ((rho0 & _u32(4)) >> 1)
            | ((rho0 & _u32(8)) >> 2))
        two1 = (rho1 & (rho1 - _u32(1))) != 0
        kappa1 = jnp.where(init, 1,
                           jnp.where(two1, jnp.maximum(1, max_e), 1))
        Uq1 = jnp.maximum(emax1, kappa1)
        u_q1 = jnp.where(second, (Uq1 - kappa1), 0).astype(jnp.int32)
        eps1 = _u32(0)
        for k in range(4):
            hit = (ee[4 + k].astype(jnp.int32) == emax1) & (ee[4 + k] > 0)
            eps1 = eps1 | (jnp.where((u_q1 > 0) & hit, _u32(1), _u32(0))
                           << _u32(k))
        prev_b = jax.lax.dynamic_slice_in_dim(e_val, le + 1, 1, 1)[:, 0]
        e_val2 = jax.lax.dynamic_update_slice_in_dim(
            e_val, jnp.maximum(prev_b, ee[5].astype(jnp.int32))[:, None],
            le + 1, 1)
        nxt1 = jax.lax.dynamic_slice_in_dim(e_val2, le + 2, 1, 1)[:, 0]
        nxt2 = jax.lax.dynamic_slice_in_dim(e_val2, le + 3, 1, 1)[:, 0]
        max_e2 = jnp.where(init, max_e, jnp.maximum(nxt1, nxt2) - 1)
        e_val2 = jax.lax.dynamic_update_slice_in_dim(
            e_val2, ee[7].astype(jnp.int32)[:, None], le + 2, 1)
        cxp = jax.lax.dynamic_slice_in_dim(cx_val, le + 1, 1, 1)[:, 0]
        cx_val2 = jax.lax.dynamic_update_slice_in_dim(
            cx_val, (cxp | ((rho1 & _u32(2)) >> 1).astype(jnp.int32))
            [:, None], le + 1, 1)
        cq0b1 = jax.lax.dynamic_slice_in_dim(cx_val2, le + 2, 1, 1)[:, 0]
        cq0b2 = jax.lax.dynamic_slice_in_dim(cx_val2, le + 3, 1, 1)[:, 0]
        c_q0n = (cq0b1 + (cq0b2 << 2)).astype(_U32)
        cx_val2 = jax.lax.dynamic_update_slice_in_dim(
            cx_val2, ((rho1 & _u32(8)) >> 3).astype(jnp.int32)[:, None],
            le + 2, 1)
        idx1 = tbase + ((c_q1 << 8) + (rho1 << 4) + eps1) \
            .astype(jnp.int32)
        tuple1 = jnp.take(vlc_tbl, idx1, mode='clip')
        mel1 = jnp.where(second & (c_q1 == 0),
                         jnp.where(rho1 != 0, 1, 0), -1).astype(jnp.int8)
        for k in range(4):
            m = jnp.where(((rho1 >> _u32(k)) & _u32(1)) != 0,
                          (Uq1.astype(_U32)
                           - ((tuple1 >> _u32(k)) & _u32(1))), _u32(0))
            m = jnp.minimum(m, _u32(31))
            ms_v.append(ss[4 + k] & ((_u32(1) << m) - _u32(1)))
            ms_l.append(m.astype(jnp.uint8))
        # only emit quad-1 records when it exists
        tuple1 = jnp.where(second, tuple1, _u32(0))

        # next pair's context
        c_q_next = jnp.where(
            init,
            jnp.where(second, (rho1 >> 1) | (rho1 & _u32(1)), _u32(0)),
            jnp.where(second,
                      c_q0n | ((rho1 & _u32(4)) >> 1)
                      | ((rho1 & _u32(8)) >> 2),
                      c_q1_base))
        # state written by quad1 only if it exists
        e_val = jnp.where(second, e_val2, e_val)
        cx_val = jnp.where(second, cx_val2, cx_val)
        max_e = jnp.where(second, max_e2, max_e)

        # ---- u codes (ojph_block_encoder.cpp:763-785) ----
        melu_present = init & (u_q0 > 0) & (u_q1 > 0)
        melu = jnp.where(
            melu_present,
            jnp.where(jnp.minimum(u_q0, u_q1) > 2, 1, 0), -1) \
            .astype(jnp.int8)
        p0a, l0a, s0a, sl0a = _uvlc_gather(uv, u_q0 - 2)
        p1a, l1a, s1a, sl1a = _uvlc_gather(uv, u_q1 - 2)
        p0b, l0b, s0b, sl0b = _uvlc_gather(uv, u_q0)
        p1b, l1b, s1b, sl1b = _uvlc_gather(uv, u_q1)
        caseA = init & (u_q0 > 2) & (u_q1 > 2)
        caseB = init & (u_q0 > 2) & (u_q1 > 0) & ~caseA
        c2 = jnp.where(caseA, p0a, p0b)
        L2 = jnp.where(caseA, l0a, l0b)
        c3 = jnp.where(caseA, p1a,
                       jnp.where(caseB, (u_q1 - 1).astype(_U32), p1b))
        L3 = jnp.where(caseA, l1a, jnp.where(caseB, _u32(1), l1b))
        c4 = jnp.where(caseA, s0a, s0b)
        L4 = jnp.where(caseA, sl0a, sl0b)
        c5 = jnp.where(caseA, s1a, jnp.where(caseB, _u32(0), s1b))
        L5 = jnp.where(caseA, sl1a, jnp.where(caseB, _u32(0), sl1b))

        vlc_c = jnp.stack([tuple0 >> 8, tuple1 >> 8, c2, c3, c4, c5],
                          axis=-1).astype(jnp.uint16)
        vlc_l = jnp.stack([(tuple0 >> 4) & 7,
                           jnp.where(second, (tuple1 >> 4) & 7, _u32(0)),
                           L2, L3, L4, L5], axis=-1).astype(jnp.uint8)
        mel_e = jnp.stack([mel0, mel1, melu], axis=-1)
        msv = jnp.stack(ms_v, axis=-1)
        msl = jnp.stack(ms_l, axis=-1)

        carry = (c_q_next, e_val, cx_val, max_e)
        return carry, (mel_e, vlc_c, vlc_l, msv, msl)

    _, ys = jax.lax.scan(step, carry0, xs)
    return ys
