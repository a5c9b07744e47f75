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

from .. import native
from ..codec import Encoder
from ..core.t2 import CodedBlock
from ..core.geometry import build_tile, build_tile_grid
from . import color as jclr
from . import dwt as jdwt
from .block_encode import encode_cleanup_core


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


@dataclass
class _EncPlan:
    key: tuple
    groups: List[_EncGroup]
    # band_id -> (comp, res, band, kmax, delta, reversible, H, W)
    bands: List[tuple]
    comps: List[tuple]  # per comp: (reversible, bd, sgn, nlt3, res specs)
    mct: bool


_ENC_RUNNERS: Dict[tuple, object] = {}


class TpuEncoder(Encoder):
    """Encoder whose DWT + Tier-1 run on the accelerator; falls back
    to the scalar Encoder path when the plan can't cover the stream."""

    def _build_enc_plan(self, geom) -> Optional[_EncPlan]:
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
                        grp = groups.get(g.rect.w)
                        if grp is None:
                            grp = _EncGroup(len(groups), g.rect.w)
                            groups[g.rect.w] = grp
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
                          self.hdr.nlt.type3_for(c), tuple(res_specs)))
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
        key = (tuple((g.gid, g.w, g.h, len(g.lanes), tuple(g.strips),
                      tuple(g.p)) for g in glist),
               tuple(bands), tuple(comps), mct)
        return _EncPlan(key, glist, bands, comps, mct)

    def _make_enc_runner(self, plan: _EncPlan):
        groups, bands, comps, mct = (plan.groups, plan.bands,
                                     plan.comps, plan.mct)

        def run(*planes):
            # conversion + MCT
            conv = []
            for ci, (rev, bd, sgn, nlt3, _) in enumerate(comps):
                if rev:
                    conv.append(jclr.rev_convert_in(planes[ci], bd, sgn,
                                                    nlt3))
                else:
                    conv.append(jclr.irv_convert_to_float(
                        planes[ci], bd, sgn, nlt3))
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
            for ci, (rev, bd, sgn, nlt3, res_specs) in enumerate(comps):
                cur = conv[ci]
                band_planes = {}
                nres = len(res_specs)
                for r in range(nres - 1, 0, -1):
                    _, h_even, v_even = res_specs[r]
                    ll, hl, lh, hh = jdwt.fwd_dwt2d(cur, h_even, v_even,
                                                    rev)
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
                    sp = smag[bid][y0:y0 + nrows * h_t,
                                   x0:x0 + ncols * g.w]
                    vp = vals[bid][y0:y0 + nrows * h_t,
                                   x0:x0 + ncols * g.w]
                    blk = sp.reshape(nrows, h_t, ncols, g.w) \
                        .transpose(0, 2, 1, 3) \
                        .reshape(nrows * ncols, h_t, g.w)
                    vblk = vp.reshape(nrows, h_t, ncols, g.w) \
                        .transpose(0, 2, 1, 3) \
                        .reshape(nrows * ncols, h_t, g.w)
                    blk = jnp.pad(blk, ((0, 0), (0, hp - h_t),
                                        (0, wp - g.w)))
                    pieces.append(blk)
                    orv = jax.lax.reduce(
                        vblk, np.uint32(0), jax.lax.bitwise_or, (1, 2))
                    flags.append(orv)
                buf = jnp.concatenate(pieces, axis=0)
                orv = jnp.concatenate(flags, axis=0)
                p = jnp.asarray(np.array(g.p, np.int32))
                nz = orv >= jnp.asarray(np.array(g.thresh, np.uint32))
                mel_e, vlc_c, vlc_l, ms_v, ms_l = encode_cleanup_core(
                    buf, p, g.w, g.h)
                outs.append((mel_e, vlc_c, vlc_l, ms_v, ms_l, nz))
            return tuple(outs)

        return jax.jit(run)

    def _encode_tile(self, idx: int, tr, planes: List[np.ndarray]) \
            -> List[bytes]:
        siz = self.siz
        geom = build_tile(self.hdr, idx, tr)
        nc = siz.num_comps
        plan = self._build_enc_plan(geom)
        if plan is None or not native.have_native():
            return super()._encode_tile(idx, tr, planes)
        runner = _ENC_RUNNERS.get(plan.key)
        if runner is None:
            runner = self._make_enc_runner(plan)
            _ENC_RUNNERS[plan.key] = runner

        tplanes = []
        for c in range(nc):
            comp = geom.comps[c]
            dx, dy = siz.comps[c].dx, siz.comps[c].dy
            ox = comp.rect.x0 - (-(-siz.xosiz // dx))
            oy = comp.rect.y0 - (-(-siz.yosiz // dy))
            tplanes.append(np.ascontiguousarray(
                planes[c][oy:oy + comp.rect.h, ox:ox + comp.rect.w]
                .astype(np.int32)))
        outs = runner(*tplanes)

        # host: pack segments, build the coded-block structure
        coded = [[[None] * 4
                  for _ in range(geom.comps[c].num_decomps + 1)]
                 for c in range(nc)]
        for c in range(nc):
            comp = geom.comps[c]
            for r in range(comp.num_decomps + 1):
                for b in ([0] if r == 0 else [1, 2, 3]):
                    sb = comp.resolutions[r].bands[b]
                    if sb is not None and not sb.empty:
                        coded[c][r][b] = [CodedBlock()
                                          for _ in sb.blocks]
        for gi, g in enumerate(plan.groups):
            mel_e, vlc_c, vlc_l, ms_v, ms_l, nz = outs[gi]
            sw = lambda a: np.asarray(a).swapaxes(0, 1)
            nz = np.asarray(nz)
            pairs = ((g.w + 1) // 2 + 1) // 2
            pairs_real = np.array(
                [((h_t + 1) // 2) * pairs for (_, _, h_t) in g.lanes],
                np.int64)
            out, lens = native.pack_cleanup_segments(
                sw(mel_e), sw(vlc_c), sw(vlc_l), sw(ms_v), sw(ms_l),
                pairs_real, out_stride=g.h * g.w * 5 + 256)
            for lane, (bid, bi, h_t) in enumerate(g.lanes):
                (c, r, b, kmax, _, _, _, _) = plan.bands[bid]
                cb = coded[c][r][b][bi]
                if not nz[lane]:
                    continue  # zero block
                if lens[lane] == 0:  # packer overflow: scalar fallback
                    return super()._encode_tile(idx, tr, planes)
                cb.missing_msbs = kmax - 1
                cb.num_passes = 1
                cb.data = bytes(out[lane, :lens[lane]])
                cb.pass_length[0] = int(lens[lane])

        # emit packets in progression order, annotated (comp, res)
        from ..core.t2 import encode_precinct, precinct_iterator
        packets = []
        cod = self.cod
        for (c, r, pidx) in precinct_iterator(geom, cod.prog_order):
            res = geom.comps[c].resolutions[r]
            packets.append((c, r, encode_precinct(
                res, pidx, coded[c][r], cod.uses_eph, cod.uses_sop)))
        return packets


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
