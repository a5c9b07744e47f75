"""Canvas partition geometry: tiles, resolutions, subbands, codeblocks,
precincts.

This computes, eagerly and host-side, the full coding layout that the
reference builds as a pointer-linked tree during its two-phase arena
allocation (ojph_codestream_local.cpp:113-289, ojph_resolution.cpp:59-459,
ojph_subband.cpp:57-276).  The layout drives both the Tier-2 packet codec
and the batched (TPU) Tier-1 block coding.

All rectangles are half-open on the canvas (reference) coordinate
system of T.800 Annex B.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .markers import MainHeader, Cod, Qcd, Siz
from .types import Rect, ceil_div


@dataclass
class CodeblockGeom:
    """One codeblock: position within its subband."""
    rect: Rect               # in subband coordinates
    cb_x: int                # column index in the subband codeblock grid
    cb_y: int                # row index


@dataclass
class PrecinctBandInfo:
    """Codeblock index range of one subband inside one precinct
    (subband::get_cb_indices, ojph_subband.cpp:224-276)."""
    org_x: int = 0  # first codeblock column (grid index)
    org_y: int = 0
    num_x: int = 0
    num_y: int = 0


@dataclass
class PrecinctGeom:
    x: int                   # precinct column in the resolution grid
    y: int
    img_point: Tuple[int, int]   # top-left on the canvas (for R/P/C orders)
    bands: List[PrecinctBandInfo] = field(default_factory=list)  # 4 entries


@dataclass
class SubbandGeom:
    band_num: int            # 0=LL, 1=HL, 2=LH, 3=HH
    rect: Rect               # band coordinates (T.800 eq. B-15)
    kmax: int = 0
    delta: float = 0.0       # quantization delta (irreversible only)
    num_cb_x: int = 0
    num_cb_y: int = 0
    log_cb_w: int = 0        # xcb' (precinct-clamped)
    log_cb_h: int = 0
    blocks: List[CodeblockGeom] = field(default_factory=list)

    @property
    def empty(self) -> bool:
        return self.rect.empty


@dataclass
class ResolutionGeom:
    res_num: int
    rect: Rect               # resolution coordinates (T.800 eq. B-14)
    bands: List[Optional[SubbandGeom]]   # [LL, HL, LH, HH]; LL only at r=0
    log_pp_w: int
    log_pp_h: int
    num_prec_x: int = 0
    num_prec_y: int = 0
    precincts: List[PrecinctGeom] = field(default_factory=list)
    horz_even: bool = True   # (rect.x0 & 1) == 0
    vert_even: bool = True

    @property
    def num_precincts(self) -> int:
        return self.num_prec_x * self.num_prec_y


@dataclass
class TileCompGeom:
    comp_num: int
    rect: Rect               # component-tile rect
    num_decomps: int
    resolutions: List[ResolutionGeom]  # index r = resolution number


@dataclass
class TileGeom:
    idx: int
    rect: Rect
    comps: List[TileCompGeom]


def band_rect(res: Rect, band_num: int) -> Rect:
    """Subband rectangle from resolution rect (T.800 eq. B-15;
    ojph_resolution.cpp:113-124)."""
    xo, yo = band_num & 1, band_num >> 1
    return Rect((res.x0 - xo + 1) >> 1, (res.y0 - yo + 1) >> 1,
                (res.x1 - xo + 1) >> 1, (res.y1 - yo + 1) >> 1)


def _build_subband(rect: Rect, band_num: int, cod: Cod, qcd: Qcd,
                   res_num: int, reversible: bool) -> SubbandGeom:
    """ojph_subband.cpp:117-221."""
    sb = SubbandGeom(band_num, rect)
    log_ppx, log_ppy = cod.log_precinct_size(res_num)
    x_off = 1 if res_num > 0 else 0
    y_off = 1 if res_num > 0 else 0
    sb.log_cb_w = min(cod.log_block_w, log_ppx - x_off)
    sb.log_cb_h = min(cod.log_block_h, log_ppy - y_off)
    sb.kmax = qcd.get_kmax(res_num, band_num)
    if not reversible:
        d = qcd.get_irrev_delta(res_num, band_num)
        sb.delta = d / float(1 << (31 - sb.kmax))
    if sb.empty:
        return sb
    nb_w, nb_h = 1 << sb.log_cb_w, 1 << sb.log_cb_h
    x_lb = (rect.x0 >> sb.log_cb_w) << sb.log_cb_w
    y_lb = (rect.y0 >> sb.log_cb_h) << sb.log_cb_h
    sb.num_cb_x = ceil_div(rect.x1, nb_w) - (rect.x0 >> sb.log_cb_w)
    sb.num_cb_y = ceil_div(rect.y1, nb_h) - (rect.y0 >> sb.log_cb_h)
    for j in range(sb.num_cb_y):
        cy0 = max(rect.y0, y_lb + j * nb_h)
        cy1 = min(rect.y1, y_lb + (j + 1) * nb_h)
        for i in range(sb.num_cb_x):
            cx0 = max(rect.x0, x_lb + i * nb_w)
            cx1 = min(rect.x1, x_lb + (i + 1) * nb_w)
            sb.blocks.append(CodeblockGeom(Rect(cx0, cy0, cx1, cy1), i, j))
    return sb


def _band_precinct_info(sb: SubbandGeom, res: ResolutionGeom) -> None:
    """Map codeblocks to precincts (ojph_subband.cpp:224-276)."""
    if sb.empty:
        return
    rr = res.rect
    pc_lft = (rr.x0 >> res.log_pp_w) << res.log_pp_w
    pc_top = (rr.y0 >> res.log_pp_h) << res.log_pp_h
    x_shift = 1 if res.res_num > 0 else 0
    y_shift = 1 if res.res_num > 0 else 0
    bx, by = sb.band_num & 1, sb.band_num >> 1
    coly = 0
    for y in range(res.num_prec_y):
        pcy0 = max(rr.y0, pc_top + (y << res.log_pp_h))
        pcy1 = min(rr.y1, pc_top + ((y + 1) << res.log_pp_h))
        pcy0 = (pcy0 - by + (1 << y_shift) - 1) >> y_shift
        pcy1 = (pcy1 - by + (1 << y_shift) - 1) >> y_shift
        yb = ceil_div(pcy1, 1 << sb.log_cb_h) - (pcy0 >> sb.log_cb_h)
        colx = 0
        for x in range(res.num_prec_x):
            pcx0 = max(rr.x0, pc_lft + (x << res.log_pp_w))
            pcx1 = min(rr.x1, pc_lft + ((x + 1) << res.log_pp_w))
            pcx0 = (pcx0 - bx + (1 << x_shift) - 1) >> x_shift
            pcx1 = (pcx1 - bx + (1 << x_shift) - 1) >> x_shift
            xb = ceil_div(pcx1, 1 << sb.log_cb_w) - (pcx0 >> sb.log_cb_w)
            p = res.precincts[y * res.num_prec_x + x]
            p.bands[sb.band_num] = PrecinctBandInfo(colx, coly, xb, yb)
            colx += xb
        coly += yb
    assert colx == sb.num_cb_x and coly == sb.num_cb_y


def _build_resolution(res_rect: Rect, res_num: int, cod: Cod, qcd: Qcd,
                      tile_rect: Rect, comp_dx: int, comp_dy: int,
                      reversible: bool,
                      out: List[Optional[ResolutionGeom]]) -> None:
    """Recursive construction (ojph_resolution.cpp:240-459), BIDIR DWT."""
    log_ppx, log_ppy = cod.log_precinct_size(res_num)
    res = ResolutionGeom(res_num, res_rect, [None] * 4, log_ppx, log_ppy)
    res.horz_even = (res_rect.x0 & 1) == 0
    res.vert_even = (res_rect.y0 & 1) == 0
    out[res_num] = res

    if res_num > 0:
        ll_rect = band_rect(res_rect, 0)
        _build_resolution(ll_rect, res_num - 1, cod, qcd, tile_rect,
                          comp_dx * 2, comp_dy * 2, reversible, out)
        for b in (1, 2, 3):
            res.bands[b] = _build_subband(band_rect(res_rect, b), b, cod,
                                          qcd, res_num, reversible)
    else:
        res.bands[0] = _build_subband(res_rect, 0, cod, qcd, 0, reversible)

    if not res_rect.empty:
        res.num_prec_x = ceil_div(res_rect.x1, 1 << log_ppx) \
            - (res_rect.x0 >> log_ppx)
        res.num_prec_y = ceil_div(res_rect.y1, 1 << log_ppy) \
            - (res_rect.y0 >> log_ppy)
        x_lb = (res_rect.x0 >> log_ppx) << log_ppx
        y_lb = (res_rect.y0 >> log_ppy) << log_ppy
        for y in range(res.num_prec_y):
            ppy0 = y_lb + (y << log_ppy)
            for x in range(res.num_prec_x):
                ppx0 = x_lb + (x << log_ppx)
                # image point for progression ordering
                # (ojph_resolution.cpp:421-439): canvas point of the
                # precinct origin clamped to the tile top-left
                tx = max(comp_dx * ppx0, tile_rect.x0)
                ty = max(comp_dy * ppy0, tile_rect.y0)
                res.precincts.append(
                    PrecinctGeom(x, y, (tx, ty),
                                 [PrecinctBandInfo() for _ in range(4)]))
        for b in range(4):
            if res.bands[b] is not None and not res.bands[b].empty:
                _band_precinct_info(res.bands[b], res)


def build_tile_grid(siz: Siz) -> List[Rect]:
    """Tile rectangles in raster order (ojph_codestream_local.cpp:120-218)."""
    num_x = ceil_div(siz.xsiz - siz.xtosiz, siz.xtsiz)
    num_y = ceil_div(siz.ysiz - siz.ytosiz, siz.ytsiz)
    tiles = []
    for ty in range(num_y):
        y0 = max(siz.yosiz, siz.ytosiz + ty * siz.ytsiz)
        y1 = min(siz.ysiz, siz.ytosiz + (ty + 1) * siz.ytsiz)
        for tx in range(num_x):
            x0 = max(siz.xosiz, siz.xtosiz + tx * siz.xtsiz)
            x1 = min(siz.xsiz, siz.xtosiz + (tx + 1) * siz.xtsiz)
            tiles.append(Rect(x0, y0, x1, y1))
    return tiles


def build_tile(hdr: MainHeader, tile_idx: int, tile_rect: Rect) -> TileGeom:
    """Full coding layout of one tile (ojph_tile.cpp:190-305)."""
    siz = hdr.siz
    comps = []
    for c in range(siz.num_comps):
        cod = hdr.get_cod(c)
        qcd = hdr.get_qcd(c)
        dx, dy = siz.comps[c].dx, siz.comps[c].dy
        crect = Rect(ceil_div(tile_rect.x0, dx), ceil_div(tile_rect.y0, dy),
                     ceil_div(tile_rect.x1, dx), ceil_div(tile_rect.y1, dy))
        nd = cod.num_decomps
        res_list: List[Optional[ResolutionGeom]] = [None] * (nd + 1)
        _build_resolution(crect, nd, cod, qcd, tile_rect, dx, dy,
                          cod.is_reversible, res_list)
        comps.append(TileCompGeom(c, crect, nd, res_list))
    return TileGeom(tile_idx, tile_rect, comps)
