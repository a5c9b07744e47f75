"""TPU encode pipeline: sample conversion -> color transform -> DWT
pyramid -> quantization -> batched block encoding, fused into one
device graph per tile geometry; byte packing and Tier-2 packetization
stay on the host (C++ / Python).

Mirror image of pipeline.py's decode plan: band planes are carved into
rectangular strips of same-shape codeblocks (one reshape per strip, no
per-block work), batched by block width with height padding, and the
whole tile encodes in a single XLA dispatch.  The device emits
per-quad-pair records; native/ojtpu_native.cpp packs them into cleanup
segments at memcpy speed (pass ordering: ojph_codeblock.cpp:142-175 —
the OpenJPH encoder emits only the cleanup pass).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from .. import native
from ..codec import Encoder
from ..utils import trace
from ..core.t2 import CodedBlock
from ..core.geometry import build_tile, build_tile_grid
from . import color as jclr
from . import dwt as jdwt
from .block_encode import encode_cleanup_core
from .pipeline import _bucket_words, _use_pallas


def _ebucket(n: int) -> int:
    """Word-cap bucket (pow2 then 128-multiples) for encoder output
    planes; static per plan."""
    b = 32
    while b < n and b < 1024:
        b *= 2
    if n <= b:
        return b
    return -(-n // 128) * 128


_CHUNK = 32  # words; every cap is a multiple of 32 (_ebucket)


@partial(jax.jit, static_argnums=(2,))
def _compact_chunks(planes, chunk_idx, Dch: int):
    """Gather the used prefix of every (lane, stream) word row into
    one dense buffer at CHUNK (32-word) granularity: the host
    precomputes the chunk source indices (every segment's dense
    offset is chunk-aligned), so the device does ONE sliced gather —
    no searchsorted, which lowers to second-scale gather chains on
    TPU.  Returns the full (Dch-bucketed) buffer; the caller slices
    the USED prefix before fetching — the pow2 Dch bucket can pad the
    buffer by up to ~33%, which is pure wire waste on the tunnel."""
    src = jnp.concatenate([x.reshape(-1) for x in planes]) \
        .reshape(-1, _CHUNK)
    return jnp.take(src, chunk_idx, axis=0, mode='clip').reshape(-1)


@dataclass
class _EncGroup:
    gid: int
    w: int
    h: int = 0
    # strips: (lane0, nrows, ncols, h_true, band_id, y0, x0)
    strips: list = field(default_factory=list)
    # per lane: (band_id, block_index_in_band, h_true)
    lanes: list = field(default_factory=list)
    p: list = field(default_factory=list)        # 31 - kmax per lane
    thresh: list = field(default_factory=list)   # zero-block threshold
    n_pad: int = 0                               # pallas lane padding
    caps: tuple = (0, 0, 0)                      # dense word caps


@dataclass
class _EncPlan:
    key: tuple
    groups: List[_EncGroup]
    # band_id -> (comp, res, band, kmax, delta, reversible, H, W)
    bands: List[tuple]
    comps: List[tuple]  # per comp: (reversible, bd, sgn, nlt3, res specs)
    mct: bool
    # groups are height-merged width classes on every backend: the
    # pallas kernel gates emission with a per-lane quad-height limit
    # (its qhl input, mirroring the decode kernel), so one kernel per
    # WIDTH covers every block height — no per-(w, h) kernel blowup
    # on odd tile grids; the non-pallas backends run the scan Tier-1
    # (encode_cleanup_core) over the same groups


from .pipeline import _LruCache
_ENC_RUNNERS = _LruCache()


class TpuEncoder(Encoder):
    """Encoder whose DWT + Tier-1 run on the accelerator; falls back
    to the scalar Encoder path when the plan can't cover the stream."""

    def _build_enc_plan(self, geom) -> Optional[_EncPlan]:
        if getattr(self, 'ht_passes', 1) != 1:
            return None  # SigProp/MagRef emission: scalar host path
        groups: Dict[int, _EncGroup] = {}
        bands: List[tuple] = []
        comps = []
        nc = self.siz.num_comps
        for c in range(nc):
            cod = self._get_cod(c)
            rev = cod.is_reversible
            comp = geom.comps[c]
            res_specs = []
            for r in range(comp.num_decomps + 1):
                res = comp.resolutions[r]
                bids = []
                for b in ([0] if r == 0 else [1, 2, 3]):
                    sb = res.bands[b]
                    if sb is None:
                        return None  # DFS: fall back to scalar path
                    if sb.kmax >= 31:
                        return None  # needs the 64-bit path
                    bid = len(bands)
                    bands.append((c, r, b, sb.kmax, float(sb.delta),
                                  rev, sb.rect.h, sb.rect.w))
                    bids.append(bid)
                    run = None  # (lane0, ncols, h_true, y0, x0)
                    for bi, g in enumerate(sb.blocks):
                        # group by width only on every backend:
                        # shorter lanes pad with zero rows; the scan
                        # path's host packer consumes pairs_real
                        # steps per lane, and the pallas kernel gates
                        # emission with its per-lane qhl input, so
                        # one trace/kernel covers every height (odd
                        # tile grids produce dozens of heights)
                        gk = g.rect.w
                        grp = groups.get(gk)
                        if grp is None:
                            grp = _EncGroup(len(groups), g.rect.w)
                            groups[gk] = grp
                        lane = len(grp.lanes)
                        grp.lanes.append((bid, bi, g.rect.h))
                        grp.h = max(grp.h, g.rect.h)
                        grp.p.append(31 - sb.kmax)
                        grp.thresh.append(1 << (31 - sb.kmax))
                        y0 = g.rect.y0 - sb.rect.y0
                        x0 = g.rect.x0 - sb.rect.x0
                        if run is not None \
                                and run[5] == grp.gid \
                                and run[2] == g.rect.h and run[3] == y0 \
                                and run[4] + run[1] * g.rect.w == x0 \
                                and lane == run[0] + run[1]:
                            run = (run[0], run[1] + 1, run[2], run[3],
                                   run[4], run[5])
                        else:
                            if run is not None:
                                grp2 = [gr for gr in groups.values()
                                        if gr.gid == run[5]][0]
                                grp2.strips.append(
                                    (run[0], 1, run[1], run[2], bid,
                                     run[3], run[4]))
                            run = (lane, 1, g.rect.h, y0, x0, grp.gid)
                    if run is not None:
                        grp2 = [gr for gr in groups.values()
                                if gr.gid == run[5]][0]
                        grp2.strips.append((run[0], 1, run[1], run[2],
                                            bid, run[3], run[4]))
                res_specs.append((tuple(bids),
                                  (res.rect.x0 & 1) == 0,
                                  (res.rect.y0 & 1) == 0))
            comps.append((rev, self.siz.comps[c].bit_depth,
                          self.siz.comps[c].is_signed,
                          self.hdr.nlt.type3_for(c), tuple(res_specs),
                          cod.kernel))
        glist = sorted(groups.values(), key=lambda g: g.gid)
        # vertical strip merge
        for g in glist:
            merged = []
            for (lane0, nrows, ncols, h_t, bid, y0, x0) in g.strips:
                if merged:
                    m = merged[-1]
                    if m[4] == bid and m[2] == ncols and m[3] == h_t \
                            and m[6] == x0 and m[5] + m[1] * h_t == y0 \
                            and m[0] + m[1] * m[2] == lane0:
                        merged[-1] = (m[0], m[1] + 1, m[2], m[3], m[4],
                                      m[5], m[6])
                        continue
                merged.append((lane0, nrows, ncols, h_t, bid, y0, x0))
            g.strips = merged
        mct = self.cod.mc_trans == 1 and nc >= 3
        for g in glist:
            # worst-case dense output words per lane for the pallas
            # packer (overflow then cannot happen; flag kept anyway)
            qw = (g.w + 1) >> 1
            qh = (g.h + 1) >> 1
            pairs = (qw + 1) >> 1
            kx = 31 - min(g.p)
            g.caps = (_ebucket(qh * pairs * 18 // 32 + 2),
                      _ebucket(qh * pairs * 34 // 32 + 2),
                      _ebucket(qw * qh * 4 * (kx + 1) // 32 + 2))
            g.n_pad = -(-len(g.lanes) // 128) * 128
        key = (tuple((g.gid, g.w, g.h, len(g.lanes), tuple(g.strips),
                      tuple(g.p), g.caps) for g in glist),
               tuple(bands), tuple(comps), mct)
        return _EncPlan(key, glist, bands, comps, mct)

    def _make_enc_runner(self, plan: _EncPlan, nframes: int = 1,
                         shard=None):
        """Trace the fused encode graph for ``nframes`` same-geometry
        frames batched on a leading axis (a video burst, or the tiles
        of a mosaic).  Group lane batches are frame-major: frame f of
        group g occupies lanes [f*L, (f+1)*L).  ``shard`` (a
        NamedSharding over the frame axis) runs the whole graph
        frame-parallel over a mesh with no collectives."""
        groups, bands, comps, mct = (plan.groups, plan.bands,
                                     plan.comps, plan.mct)
        F = nframes
        use_pallas = _use_pallas()
        if use_pallas:
            from .block_encode_pallas import encode_cleanup_pallas_cat

        def run(*planes):
            # conversion + MCT (inputs arrive in their narrow upload
            # dtype with a leading frame axis; widen on device)
            conv = []
            for ci, (rev, bd, sgn, nlt3, _, _k) in enumerate(comps):
                pl = planes[ci]
                if shard is not None:
                    pl = jax.lax.with_sharding_constraint(pl, shard)
                pl32 = pl.astype(jnp.int32)
                if rev:
                    conv.append(jclr.rev_convert_in(pl32, bd, sgn,
                                                    nlt3))
                else:
                    conv.append(jclr.irv_convert_to_float(
                        pl32, bd, sgn, nlt3))
            if mct:
                if comps[0][0]:
                    y, cb, cr = jclr.rct_forward(conv[0], conv[1],
                                                 conv[2])
                else:
                    y, cb, cr = jclr.ict_forward(conv[0], conv[1],
                                                 conv[2])
                conv[0], conv[1], conv[2] = y, cb, cr

            # DWT pyramids -> per-band smag/val planes
            smag = [None] * len(bands)
            vals = [None] * len(bands)
            for ci, (rev, bd, sgn, nlt3, res_specs,
                     kern) in enumerate(comps):
                cur = conv[ci]
                band_planes = {}
                nres = len(res_specs)
                for r in range(nres - 1, 0, -1):
                    _, h_even, v_even = res_specs[r]
                    ll, hl, lh, hh = jdwt.fwd_dwt2d(cur, h_even, v_even,
                                                    rev, kern)
                    bids, _, _ = res_specs[r]
                    band_planes[bids[0]] = hl
                    band_planes[bids[1]] = lh
                    band_planes[bids[2]] = hh
                    cur = ll
                band_planes[res_specs[0][0][0]] = cur
                for bid, bp in band_planes.items():
                    (_, _, _, kmax, delta, rev_b, _, _) = bands[bid]
                    if rev_b:
                        p32 = bp.astype(jnp.int32)
                        sign = jnp.where(p32 < 0, jnp.uint32(0x80000000),
                                         jnp.uint32(0))
                        v = jnp.abs(p32).astype(jnp.uint32) \
                            << jnp.uint32(31 - kmax)
                        smag[bid] = sign | v
                        vals[bid] = v
                    else:
                        t = jnp.trunc(bp.astype(jnp.float32)
                                      * jnp.float32(1.0 / delta)) \
                            .astype(jnp.int32)
                        sign = jnp.where(t < 0, jnp.uint32(0x80000000),
                                         jnp.uint32(0))
                        v = jnp.abs(t).astype(jnp.uint32)
                        smag[bid] = sign | v
                        vals[bid] = v

            # strips -> group batches -> block encode
            outs = []
            for g in groups:
                wp = ((g.w + 3) // 4) * 4
                hp = ((g.h + 1) // 2) * 2
                pieces = []
                flags = []
                for (lane0, nrows, ncols, h_t, bid, y0, x0) in g.strips:
                    sp = smag[bid][:, y0:y0 + nrows * h_t,
                                   x0:x0 + ncols * g.w]
                    vp = vals[bid][:, y0:y0 + nrows * h_t,
                                   x0:x0 + ncols * g.w]
                    blk = sp.reshape(F, nrows, h_t, ncols, g.w) \
                        .transpose(0, 1, 3, 2, 4) \
                        .reshape(F, nrows * ncols, h_t, g.w)
                    vblk = vp.reshape(F, nrows, h_t, ncols, g.w) \
                        .transpose(0, 1, 3, 2, 4) \
                        .reshape(F, nrows * ncols, h_t, g.w)
                    blk = jnp.pad(blk, ((0, 0), (0, 0), (0, hp - h_t),
                                        (0, wp - g.w)))
                    pieces.append(blk)
                    orv = jax.lax.reduce(
                        vblk, np.uint32(0), jax.lax.bitwise_or, (2, 3))
                    flags.append(orv)
                buf = jnp.concatenate(pieces, axis=1)   # (F, L, h, w)
                orv = jnp.concatenate(flags, axis=1)    # (F, L)
                nz = orv >= jnp.asarray(
                    np.array(g.thresh, np.uint32))[None, :]
                L = buf.shape[1]
                if use_pallas:
                    pad = g.n_pad - L
                    bufp = jnp.pad(buf, ((0, 0), (0, pad), (0, 0),
                                         (0, 0))) \
                        .reshape(F * g.n_pad, hp, wp)
                    pp = jnp.asarray(np.tile(np.pad(
                        np.array(g.p, np.int32), (0, pad),
                        mode='edge'), F))
                    # per-lane quad-height limit: padding lanes get 0
                    # (no emission), short blocks stop at their rows
                    qhl = jnp.asarray(np.tile(np.pad(np.array(
                        [(h_t + 1) // 2 for (_, _, h_t) in g.lanes],
                        np.int32), (0, pad)), F))
                    cat, bits, ovf = encode_cleanup_pallas_cat(
                        bufp, pp, g.w, g.h, g.caps, qhl=qhl)
                    outs.append((cat, bits, nz, ovf))
                else:
                    p = jnp.asarray(np.tile(np.array(g.p, np.int32), F))
                    mel_e, vlc_c, vlc_l, ms_v, ms_l = \
                        encode_cleanup_core(
                            buf.reshape(F * L, hp, wp), p, g.w, g.h)
                    outs.append((mel_e, vlc_c, vlc_l, ms_v, ms_l, nz))
            if use_pallas:
                # one small aux buffer -> one host fetch (the link is
                # latency-dominated)
                aux = jnp.concatenate(
                    [o[1].reshape(-1) for o in outs]
                    + [o[2].reshape(-1).astype(jnp.int32) for o in outs]
                    + [o[3].reshape(-1).astype(jnp.int32)
                       for o in outs])
                return tuple(o[0] for o in outs), aux
            return tuple(outs)

        return jax.jit(run)

    def _encode_tile(self, idx: int, tr, planes: List[np.ndarray]) \
            -> List[bytes]:
        siz = self.siz
        geom = build_tile(self.hdr, idx, tr)
        nc = siz.num_comps
        with trace.stage('encode.plan'):
            plan = self._build_enc_plan(geom)
        if plan is None or not native.have_native():
            return super()._encode_tile(idx, tr, planes)
        # the runner's traced graph AND output structure depend on
        # the pallas mode (tests monkeypatch _USE_PALLAS), so the
        # cache key must carry it or a cached runner from the other
        # mode feeds the wrong consumer
        rk = (plan.key, 1, _use_pallas())
        runner = _ENC_RUNNERS.get(rk)
        if runner is None:
            with trace.stage('encode.compile'):
                runner = self._make_enc_runner(plan, 1)
            _ENC_RUNNERS[rk] = runner

        tplanes = [_narrow_tile_plane(siz, geom, c, planes[c])[None]
                   for c in range(nc)]
        with trace.stage('encode.device'):
            outs = runner(*tplanes)

        # host: pack segments, build the coded-block structure
        coded = _empty_coded(geom, nc)
        with trace.stage('encode.segment_pack'):
            if _use_pallas():
                try:
                    self._consume_pallas_outs(plan, outs, [coded])
                except _PallasOverflow:
                    return super()._encode_tile(idx, tr, planes)
            else:
                self._consume_record_outs(plan, outs, [coded])
            del outs
        with trace.stage('encode.t2'):
            return _tile_packets(self, geom, coded)


    def _consume_record_outs(self, plan, outs, codeds):
        F = len(codeds)
        for gi, g in enumerate(plan.groups):
            mel_e, vlc_c, vlc_l, ms_v, ms_l, nz = outs[gi]
            sw = lambda a: np.asarray(a).swapaxes(0, 1)
            nz = np.asarray(nz).reshape(-1)           # (F*L,)
            pairs = ((g.w + 1) // 2 + 1) // 2
            pairs_real = np.tile(np.array(
                [((h_t + 1) // 2) * pairs for (_, _, h_t) in g.lanes],
                np.int64), F)
            out, lens = native.pack_cleanup_segments(
                sw(mel_e), sw(vlc_c), sw(vlc_l), sw(ms_v), sw(ms_l),
                pairs_real, out_stride=g.h * g.w * 5 + 256)
            L = len(g.lanes)
            for f, coded in enumerate(codeds):
                if coded is None:       # padding frame slot
                    continue
                self._fill_coded(plan, g, coded,
                                 out[f * L:(f + 1) * L],
                                 lens[f * L:(f + 1) * L],
                                 nz[f * L:(f + 1) * L])

    def _consume_pallas_outs(self, plan, outs, codeds):
        """Two-dispatch drain of the pallas encoder: fetch the small
        per-lane aux buffer (bit counts / zero flags / overflow)
        first, then gather only the used word prefixes into one dense
        buffer on device and fetch that.  Lane batches are frame-
        major: frame f of a group occupies lanes [f*n_pad,
        (f+1)*n_pad), real lanes first."""
        F = len(codeds)
        group_planes, aux = outs
        aux = np.asarray(aux)
        pos = 0
        bits_all = []
        for g in plan.groups:
            bits_all.append(aux[pos:pos + F * g.n_pad * 3]
                            .reshape(F * g.n_pad, 3))
            pos += F * g.n_pad * 3
        nz_all = []
        for g in plan.groups:
            nlanes = F * len(g.lanes)
            nz_all.append(aux[pos:pos + nlanes]
                          .reshape(F, len(g.lanes)) != 0)
            pos += nlanes
        for g in plan.groups:
            if aux[pos:pos + F * g.n_pad].any():
                raise _PallasOverflow()
            pos += F * g.n_pad
        planes = []
        cnt_l = []
        sb_l = []
        base = 0
        for gi, g in enumerate(plan.groups):
            cat = group_planes[gi]     # (nl, wm+wv+ws) lane rows
            bits = bits_all[gi]
            nl = F * g.n_pad
            wm, wv, _ws = g.caps
            wtot = sum(g.caps)
            # stream si of lane l sits at flat [base + l*wtot +
            # off[si], ... + cap_si); all offsets stay 32-word
            # aligned (_ebucket caps), as the chunk gather requires
            off = np.array([0, wm, wm + wv], np.int64)
            planes.append(cat)
            lanes = np.arange(nl, dtype=np.int64)[:, None]
            sb_l.append((base + lanes * wtot + off[None, :])
                        .reshape(-1))
            cnt_l.append(((bits.astype(np.int64) + 31) // 32)
                         .reshape(-1))
            base += nl * wtot
        cnts = np.concatenate(cnt_l)
        seg_base = np.concatenate(sb_l)
        # chunk-aligned layout: each segment starts on a 32-word
        # boundary so the device compaction is one chunk gather
        cnt_ch = (cnts + _CHUNK - 1) // _CHUNK
        ch_ends = np.cumsum(cnt_ch)
        ch_off = np.concatenate([[0], ch_ends[:-1]]).astype(np.int64)
        seg_off = ch_off * _CHUNK
        total_ch = int(ch_ends[-1]) if len(ch_ends) else 0
        Dch = max(_bucket_words(max(total_ch, 1)), 4)
        chunk_idx = np.zeros(Dch, np.int32)
        delta = (seg_base // _CHUNK) - ch_off
        chunk_idx[:total_ch] = (np.repeat(delta, cnt_ch)
                                + np.arange(total_ch)).astype(np.int32)
        with trace.stage('encode.pack.fetch'):
            dense_dev = _compact_chunks(tuple(planes),
                                        jnp.asarray(chunk_idx), Dch)
            # fetch ONLY the used prefix (the Dch bucket pads up to
            # ~33%), split in 4 for concurrent draining
            used = total_ch * _CHUNK
            q = -(-used // 4)
            parts = [dense_dev[i * q:min((i + 1) * q, used)]
                     for i in range(4) if i * q < used]
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(4) as pool:
                fetched = list(pool.map(np.asarray, parts))
            dense = np.zeros(Dch * _CHUNK, np.uint32)
            if used:
                np.concatenate(fetched, out=dense[:used])
        at = 0
        for gi, g in enumerate(plan.groups):
            nl = F * g.n_pad
            bits = bits_all[gi]
            meta = np.empty((nl, 6), np.int64)
            meta[:, 0::2] = seg_off[at:at + nl * 3].reshape(nl, 3)
            meta[:, 1::2] = bits
            at += nl * 3
            L = len(g.lanes)
            # stuffing can expand the packed bytes by up to 8/7
            stride = int(bits.sum(axis=1).max()) // 7 + 64
            for f, coded in enumerate(codeds):
                if coded is None:       # padding frame slot
                    continue
                with trace.stage('encode.pack.stuff'):
                    out, lens = native.pack_from_dense(
                        dense,
                        meta[f * g.n_pad:f * g.n_pad + L],
                        out_stride=stride)
                with trace.stage('encode.pack.fill'):
                    self._fill_coded(plan, g, coded, out, lens,
                                     nz_all[gi][f])

    def _fill_coded(self, plan, g, coded, out, lens, nz):
        for lane, (bid, bi, h_t) in enumerate(g.lanes):
            (c, r, b, kmax, _, _, _, _) = plan.bands[bid]
            cb = coded[c][r][b][bi]
            if not nz[lane]:
                continue  # zero block
            if lens[lane] == 0:
                raise _PallasOverflow()
            cb.missing_msbs = kmax - 1
            cb.num_passes = 1
            cb.data = bytes(out[lane, :lens[lane]])
            cb.pass_length[0] = int(lens[lane])


class _PallasOverflow(Exception):
    pass


def encode_tpu(planes, **kwargs) -> bytes:
    """Encode planes into a .j2c codestream on the accelerator.

    Same keyword surface as openjph_tpu.encode."""
    from ..codec import encode as _encode
    import openjph_tpu.codec as _codec
    # reuse the convenience-constructor logic with the TPU encoder class
    old = _codec.Encoder
    try:
        _codec.Encoder = TpuEncoder
        return _encode(planes, **kwargs)
    finally:
        _codec.Encoder = old


def _narrow_dtype_for(siz, c):
    """Smallest upload dtype for component c's samples."""
    bd = siz.comps[c].bit_depth
    sgn = siz.comps[c].is_signed
    if bd <= 8:
        return np.int8 if sgn else np.uint8
    if bd <= 16:
        return np.int16 if sgn else np.uint16
    return np.int32


def _narrow_tile_plane(siz, geom, c, plane):
    """Slice component c's tile plane and narrow to the smallest
    upload dtype; the runner widens on device (the host link is the
    encode bottleneck, BASELINE.md)."""
    comp = geom.comps[c]
    dx, dy = siz.comps[c].dx, siz.comps[c].dy
    ox = comp.rect.x0 - (-(-siz.xosiz // dx))
    oy = comp.rect.y0 - (-(-siz.yosiz // dy))
    tp = plane[oy:oy + comp.rect.h, ox:ox + comp.rect.w]
    return np.ascontiguousarray(tp.astype(_narrow_dtype_for(siz, c)))


def _empty_coded(geom, nc):
    """Fresh coded-block structure for one tile."""
    coded = [[[None] * 4
              for _ in range(geom.comps[c].num_decomps + 1)]
             for c in range(nc)]
    for c in range(nc):
        comp = geom.comps[c]
        for r in range(comp.num_decomps + 1):
            for b in ([0] if r == 0 else [1, 2, 3]):
                sb = comp.resolutions[r].bands[b]
                if sb is not None and not sb.empty:
                    coded[c][r][b] = [CodedBlock() for _ in sb.blocks]
    return coded


def _tile_packets(enc, geom, coded):
    """Emit one tile's packets in progression order, annotated
    (comp, res) for tile-part division (tile::flush prog-order state
    machines, ojph_tile.cpp:584-774)."""
    from ..core.t2 import encode_precinct, precinct_iterator
    cod = enc.cod
    packets = []
    for (c, r, pidx) in precinct_iterator(geom, cod.prog_order):
        res = geom.comps[c].resolutions[r]
        packets.append((c, r, encode_precinct(
            res, pidx, coded[c][r], cod.uses_eph, cod.uses_sop)))
    return packets


_EF_BUCKETS = (8, 4, 2, 1)


class VideoEncoder:
    """Pipelined burst encoder for same-shape frame sequences — the
    encode-side mirror of pipeline.VideoDecoder.

    A burst of F same-shape frames encodes as ONE fused device
    dispatch (frames batched on the runner's leading axis), with
    sample conversion, MCT, the DWT pyramid, quantization and the HT
    cleanup coder all on device; byte packing and Tier-2 run on the
    host, overlapped with the next burst's device compute via the
    prep worker.  Steady-state role of codestream.restart() on the
    encode side (ojph_codestream.h:109-122)."""

    def __init__(self, **enc_kwargs):
        self._kwargs = enc_kwargs
        self._enc = None
        self._inflight = []
        from concurrent.futures import ThreadPoolExecutor
        # stage pipeline: prep (stack/narrow) -> io (upload + device
        # compute + d2h fetch of the coded words + byte packing) ->
        # t2 (packetization + assembly).  The io stage owns all
        # device traffic; splitting it into per-STAGE threads
        # (upload thread + fetch thread) measured ~2x SLOWER on the
        # v5e tunnel (8.6 vs 17 MP/s, round 3) — but TWO whole-burst
        # io workers help: burst k+1's pixel upload rides the
        # opposite link direction of burst k's coded-words download
        # (the tunnel is full-duplex), measured ~1.3x on the same rig
        # (round 5, interleaved A/B: medians 16.0 vs 12.0 MP/s).
        self._prep_pool = ThreadPoolExecutor(max_workers=1)
        self._io_pool = ThreadPoolExecutor(max_workers=2)
        self._t2_pool = ThreadPoolExecutor(max_workers=1)

    def _ensure(self, frame):
        from ..codec import build_encoder, normalize_planes
        planes0 = normalize_planes(frame)
        self._enc = build_encoder(planes0[0].shape, len(planes0),
                                  encoder_cls=TpuEncoder,
                                  **self._kwargs)
        trs = build_tile_grid(self._enc.siz)
        self._single_tile = len(trs) == 1
        if self._single_tile:
            self._geom = build_tile(self._enc.hdr, 0, trs[0])
            self._plan = (self._enc._build_enc_plan(self._geom)
                          if native.have_native() else None)
        else:
            self._plan = None

    def submit(self, frames) -> None:
        """Enqueue a burst (list of (H,W) or (H,W,C) arrays); returns
        immediately, prep/dispatch run on the worker."""
        self._inflight.append(
            self._prep_pool.submit(self._encode_burst, list(frames)))

    def collect(self) -> List[bytes]:
        """Block for and return the oldest burst's codestreams."""
        item = self._inflight.pop(0).result()
        if isinstance(item, list):
            return item          # fallback burst, already encoded
        return item.result()     # final-stage future

    @property
    def depth(self) -> int:
        return len(self._inflight)

    def _encode_burst(self, frames):
        from ..codec import normalize_planes
        if self._enc is None:
            self._ensure(frames[0])
        enc, plan = self._enc, self._plan
        F = len(frames)
        if plan is None or F not in _EF_BUCKETS:
            # fallback: per-frame fused (or scalar) encode
            return [enc.encode(normalize_planes(f)) for f in frames]
        geom = self._geom
        nc = enc.siz.num_comps
        rk = (plan.key, F, _use_pallas())
        runner = _ENC_RUNNERS.get(rk)
        if runner is None:
            with trace.stage('encode.compile'):
                runner = enc._make_enc_runner(plan, F)
            _ENC_RUNNERS[rk] = runner
        with trace.stage('encode.host_prep'):
            stacks = [np.stack([_narrow_tile_plane(
                enc.siz, geom, c, normalize_planes(f)[c])
                for f in frames]) for c in range(nc)]

        def io(stacks=stacks, frames=frames):
            with trace.stage('encode.device'):
                with trace.stage('encode.dev.upload_exec'):
                    outs = runner(*[jax.device_put(s) for s in stacks])
                if _use_pallas():
                    with trace.stage('encode.dev.aux_fetch'):
                        outs = (outs[0], np.asarray(outs[1]))
            codeds = [_empty_coded(geom, nc) for _ in range(F)]
            with trace.stage('encode.segment_pack'):
                if _use_pallas():
                    try:
                        enc._consume_pallas_outs(plan, outs, codeds)
                    except _PallasOverflow:
                        return [enc.encode(normalize_planes(f))
                                for f in frames]
                else:
                    enc._consume_record_outs(plan, outs, codeds)
                del outs
            return codeds
        pfut = self._io_pool.submit(io)

        def t2(pfut=pfut):
            codeds = pfut.result()
            if codeds and isinstance(codeds[0], bytes):
                return codeds    # fallback already produced streams
            with trace.stage('encode.t2'):
                return [enc.assemble([_tile_packets(enc, geom,
                                                    coded)])
                        for coded in codeds]
        return self._t2_pool.submit(t2)


def encode_tpu_batch(frames, **kwargs) -> List[bytes]:
    """Encode many same-shape frames, batched into fused burst
    dispatches (encode-side decode_tpu_batch)."""
    enc = VideoEncoder(**kwargs)
    out = []
    i = 0
    n = len(frames)
    while i < n:
        F = next(f for f in _EF_BUCKETS if f <= n - i)
        enc.submit(frames[i:i + F])
        i += F
    while enc.depth:
        out.extend(enc.collect())
    return out
