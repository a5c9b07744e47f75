"""TPU decode pipeline: host Tier-2 parse -> batched block decode ->
dequantization -> inverse DWT -> color, with the device doing all the
sample math.

Structure (SURVEY.md §7 design stance): codeblocks are gathered into
same-shape batches across *all* tiles/components/resolutions and
decoded by the vectorized cleanup kernel (block_decode.py); band
planes are then dequantized and synthesized whole-tile with the
jittable DWT/color ops.  The byte-level Tier-2 machinery stays on the
host (codec.py), exactly where the reference keeps its packet parser
(ojph_precinct.cpp:328-573).

Blocks the JAX kernel cannot handle (SigProp/MagRef passes from
non-OpenJPH encoders, >30 bitplanes) fall back to the scalar decoder.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..codec import Decoder
from ..coding.decoder import decode_codeblock
from . import color as jclr
from . import dwt as jdwt
from . import quant as jq
from .bitprep import prep_cleanup_streams
from .block_decode import decode_cleanup

_MAX_BATCH = 4096


def _bucket(n: int, lo: int = 8) -> int:
    b = lo
    while b < n:
        b *= 2
    return b


class TpuDecoder(Decoder):
    """Decoder whose Tier-1 + reconstruction run on the accelerator."""

    def decode(self) -> List[np.ndarray]:
        self._band_planes: Dict[Tuple[int, int, int, int], np.ndarray] = {}
        self._decode_all_blocks()
        return super().decode()

    # -- batched Tier-1 ----------------------------------------------------
    def _decode_all_blocks(self):
        groups: Dict[Tuple[int, int], List] = {}
        for ti, st in enumerate(self.tiles):
            for c, comp in enumerate(st.geom.comps):
                for r, res in enumerate(comp.resolutions):
                    for b in range(4):
                        sb = res.bands[b]
                        if sb is None or sb.empty:
                            continue
                        key = (ti, c, r, b)
                        plane = np.zeros((sb.rect.h, sb.rect.w),
                                         dtype=np.uint32)
                        self._band_planes[key] = plane
                        coded = st.coded[c][r][b]
                        for g in sb.blocks:
                            cb = coded[g.cb_y * sb.num_cb_x + g.cb_x]
                            if cb is None or not cb.data \
                                    or cb.num_passes == 0 \
                                    or cb.pass_length[0] == 0:
                                continue  # zero block
                            dst = (key, g.rect.y0 - sb.rect.y0,
                                   g.rect.x0 - sb.rect.x0)
                            if cb.num_passes > 1 or cb.missing_msbs >= 30 \
                                    or cb.pass_length[0] < 2:
                                self._scalar_block(cb, g, dst)
                                continue
                            groups.setdefault((g.rect.w, g.rect.h),
                                              []).append((cb, dst))
        for (w, h), items in groups.items():
            for i in range(0, len(items), _MAX_BATCH):
                self._run_batch(w, h, items[i:i + _MAX_BATCH])

    def _scalar_block(self, cb, g, dst):
        key, y0, x0 = dst
        try:
            dec = decode_codeblock(bytes(cb.data), cb.missing_msbs,
                                   cb.num_passes, cb.pass_length[0],
                                   cb.pass_length[1], g.rect.w, g.rect.h)
        except ValueError:
            if self.resilient:
                return
            raise
        self._band_planes[key][y0:y0 + g.rect.h, x0:x0 + g.rect.w] = dec

    def _run_batch(self, w, h, items):
        n = len(items)
        nb = _bucket(n)
        datas = [bytes(cb.data) for cb, _ in items]
        lcups = np.array([cb.pass_length[0] for cb, _ in items], np.int64)
        missings = np.array([cb.missing_msbs for cb, _ in items], np.int32)
        scups = np.array([(d[lc - 1] << 4) + (d[lc - 2] & 0xF)
                          for d, lc in zip(datas, lcups)], np.int64)
        bad = (scups < 2) | (scups > lcups) | (scups > 4079)
        if bad.any():
            if not self.resilient:
                raise ValueError('invalid scup')
            keep = ~bad
            items = [it for it, k in zip(items, keep) if k]
            datas = [d for d, k in zip(datas, keep) if k]
            lcups, missings, scups = (a[keep] for a in
                                      (lcups, missings, scups))
            n = len(items)
            if n == 0:
                return
            nb = _bucket(n)
        # pad the batch by replicating the first block
        pad = nb - n
        datas += [datas[0]] * pad
        lcups = np.concatenate([lcups, np.repeat(lcups[:1], pad)])
        missings = np.concatenate([missings, np.repeat(missings[:1], pad)])
        scups = np.concatenate([scups, np.repeat(scups[:1], pad)])
        streams = prep_cleanup_streams(datas, lcups, scups)
        p = (30 - missings).astype(np.int32)
        dec, err = decode_cleanup(streams['mel'], streams['vlc'],
                                  streams['ms'], p, w, h)
        dec = np.asarray(dec)
        err = np.asarray(err)[:n]
        if err.any() and not self.resilient:
            raise ValueError('U_q exceeds missing_msbs + 2')
        for i, (cb, (key, y0, x0)) in enumerate(items):
            if err[i]:
                continue  # resilient: leave as zero block
            self._band_planes[key][y0:y0 + h, x0:x0 + w] = dec[i]

    # -- reconstruction on device -----------------------------------------
    def _reconstruct_comp(self, st, c: int) -> np.ndarray:
        comp = st.geom.comps[c]
        cod = self.hdr.get_cod(c)
        reversible = cod.is_reversible
        skip = min(self.skip_recon, comp.num_decomps)
        top = comp.num_decomps - skip
        ti = st.geom.idx

        def band(r, b):
            sb = comp.resolutions[r].bands[b]
            raw = self._band_planes.get((ti, c, r, b))
            if raw is None:
                raw = np.zeros((sb.rect.h, sb.rect.w), np.uint32)
            return np.asarray(jq.tx_from_cb(raw, sb.kmax,
                                            float(sb.delta), reversible))

        plane = band(0, 0)
        for r in range(1, top + 1):
            res = comp.resolutions[r]
            plane = np.asarray(jdwt.inv_dwt2d(
                plane, band(r, 1), band(r, 2), band(r, 3),
                (res.rect.x0 & 1) == 0, (res.rect.y0 & 1) == 0,
                reversible))
        return plane

    def decode_tile(self, tile_idx: int) -> List[np.ndarray]:
        st = self.tiles[tile_idx]
        siz = self.hdr.siz
        nc = siz.num_comps
        planes = [self._reconstruct_comp(st, c) for c in range(nc)]
        mct = self.hdr.cod.mc_trans == 1 and nc >= 3
        if mct:
            rev = self.hdr.get_cod(0).is_reversible
            if rev:
                r, g, b = jclr.rct_backward(planes[0], planes[1],
                                            planes[2])
            else:
                r, g, b = jclr.ict_backward(planes[0], planes[1],
                                            planes[2])
            planes[0], planes[1], planes[2] = (np.asarray(r),
                                               np.asarray(g),
                                               np.asarray(b))
        out = []
        for c in range(nc):
            bd = siz.comps[c].bit_depth
            sgn = siz.comps[c].is_signed
            nlt3 = self.hdr.nlt.type3_for(c)
            if self.hdr.get_cod(c).is_reversible:
                out.append(np.asarray(jclr.rev_convert_out(
                    planes[c], bd, sgn, nlt3)).astype(np.int32))
            else:
                out.append(np.asarray(jclr.irv_convert_to_integer(
                    planes[c], bd, sgn, nlt3)).astype(np.int32))
        return out


def decode_tpu(data: bytes, resilient: bool = False,
               skip_res: int = 0) -> List[np.ndarray]:
    """Decode a .j2c codestream on the accelerator."""
    return TpuDecoder(data, resilient=resilient,
                      skipped_res_for_read=skip_res,
                      skipped_res_for_recon=skip_res).decode()
