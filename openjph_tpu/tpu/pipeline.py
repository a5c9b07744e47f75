"""TPU decode pipeline: host Tier-2 parse -> one fused device graph
per stream geometry (batched block decode -> scatter -> dequantize ->
inverse DWT -> color -> sample conversion).

Design (SURVEY.md §7): codeblocks are the batch axis.  All blocks with
the same width are merged into one batch — heights are padded to the
group maximum and rows past a block's real quad-row count decode
cropped garbage (the scan is forward-only, so earlier rows are
unaffected) — giving one kernel launch per distinct block width, and
the entire frame decode is a single XLA dispatch.  A `_Plan` captures
the stream geometry; the traced runner is cached per plan key, so
steady-state video decode is: vectorized Tier-2 over record arrays
(host, ~2ms/frame) -> raw segment bytes upload (exactly the coded
size) -> one dispatch that unstuffs on-device (tpu/unstuff.py),
block-decodes, dequantizes, DWT-synthesizes and converts -> frames
stay in HBM (to_device) or stream back.

The byte-level Tier-2 machinery stays on the host (codec.py), exactly
where the reference keeps its packet parser
(ojph_precinct.cpp:328-573).  Streams the fused path cannot handle
(resilient mode, SigProp/MagRef passes from other encoders, >30 bit
planes) fall back to a per-batch path, and per-block scalar decode
below that.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

import os

from ..codec import Decoder
from ..coding.decoder import decode_codeblock
from ..core.markers import Dfs
from ..core.message import warn as _wrn
from ..utils import trace
from . import color as jclr
from . import dwt as jdwt
from . import quant as jq
from .bitprep import prep_cleanup_streams
from .block_decode import decode_cleanup, decode_cleanup_core

_USE_PALLAS: Optional[bool] = None


def _use_pallas() -> bool:
    """Pallas Tier-1 kernels need a real TPU backend; the lax.scan
    path covers CPU (tests) and acts as the fallback."""
    global _USE_PALLAS
    if _USE_PALLAS is None:
        _USE_PALLAS = (jax.default_backend() != 'cpu'
                       and not os.environ.get('OJTPU_NO_PALLAS'))
    return _USE_PALLAS


_DEVICE_UNSTUFF: Optional[bool] = None


def _device_unstuff() -> bool:
    """Unstuff segment bytes ON the accelerator (tpu/unstuff.py): the
    host ships raw coded bytes (the smallest possible transfer — the
    host->device link is the serving bottleneck, BASELINE.md) and
    skips its own unstuff pass.  Default on for real accelerator
    backends; OJTPU_DEVICE_UNSTUFF=1/0 forces (tests exercise both
    paths on CPU)."""
    global _DEVICE_UNSTUFF
    if _DEVICE_UNSTUFF is None:
        env = os.environ.get('OJTPU_DEVICE_UNSTUFF')
        if env is not None:
            _DEVICE_UNSTUFF = env != '0'
        else:
            _DEVICE_UNSTUFF = jax.default_backend() != 'cpu'
    return _DEVICE_UNSTUFF


_RAW_T1: Optional[bool] = None


def _raw_t1() -> bool:
    """Feed the Tier-1 Pallas kernel RAW stuffed bytes and unstuff in
    its readers (block_decode_pallas raw mode) instead of running the
    XLA unstuff stage.  Measured on v5e (config-1 burst): parity with
    the XLA stage (~530 MP/s both) — the shared cost is the per-lane
    window fetch, not the unstuff arithmetic — but the raw path drops
    the dense intermediate planes from HBM, shortens the graph, and
    (since the combined-window fetch) collapses three per-lane window
    gathers into one.  Applies to every group's CLEANUP pass,
    multipass included (the SigProp/MagRef branch derives its streams
    independently); OJTPU_RAW_T1=0 opts out (falls back to the XLA
    unstuff + dense kernel)."""
    global _RAW_T1
    if _RAW_T1 is None:
        _RAW_T1 = os.environ.get('OJTPU_RAW_T1', '1') != '0'
    return _RAW_T1


_MAX_BATCH = 4096


def _narrow_dtype(bd: int, sgn: bool):
    """Smallest dtype holding bd-bit samples (transfer compression)."""
    if bd <= 8:
        return jnp.int8 if sgn else jnp.uint8
    if bd <= 16:
        return jnp.int16 if sgn else jnp.uint16
    return jnp.int32


def _bucket(n: int, lo: int = 8) -> int:
    """Round up to a small set of sizes (pow2 below 256, then multiples
    of 256) so jit variants are bounded but padding waste stays low."""
    b = lo
    while b < n and b < 256:
        b *= 2
    if n <= b:
        return b
    return -(-n // 256) * 256


# ---------------------------------------------------------------------------
# Decode plan: static description of one stream geometry
# ---------------------------------------------------------------------------

@dataclass
class _Group:
    gid: int
    w: int
    h: int = 0                      # max true height (padded target)
    # every geometric block is a member (dead ones decode masked), so
    # lane layout depends only on geometry and the traced runner is
    # reused across frames of a video
    members: list = field(default_factory=list)  # (CodedBlock|None, scup)
    qh_lims: list = field(default_factory=list)  # 0 for dead lanes
    live: list = field(default_factory=list)
    n_pad: int = 0
    words: Tuple[int, int, int] = (0, 0, 0)
    # refine-stream word widths (0, 0) when no lane has SigProp/MagRef
    rwords: Tuple[int, int] = (0, 0)


@dataclass
class _Plan:
    key: tuple
    groups: List[_Group]
    # (gid, lane0, nrows, ncols, h_true, y0, band_id, x0)
    placements: List[tuple]
    # band_id -> (H, W, kmax, delta, reversible)
    bands: List[tuple]
    # per tile: (mct, (comp struct, ...))
    tiles: List[tuple]
    # record-mode per-lane arrays in meta order (pos, lcup, scup, p,
    # qhl); pos == -1 marks a dead/padding lane.  Plans with
    # refinement passes extend this with (npasses, len2, h_true,
    # causal) and set has_refine.
    lanes: object = None
    has_refine: bool = False


class _LruCache(dict):
    """Bounded runner cache: compiled executables are 10s of MB
    each, and adversarial/mutated streams can mint a fresh plan key
    per stream (every key compiles) — an unbounded dict is a memory
    DoS the fuzzer actually hit (LLVM OOM after ~600 corrupt-stream
    compiles).  Real serving workloads use a handful of keys, so a
    small LRU loses nothing (the analogue of the reference fuzz
    targets' work-explosion guards)."""

    def __init__(self, cap: int = 48):
        super().__init__()
        self._cap = cap
        self._order = []
        import threading
        self._lock = threading.Lock()

    def get(self, k, default=None):
        with self._lock:
            if k in self:
                self._order.remove(k)
                self._order.append(k)
                return dict.__getitem__(self, k)
            return default

    def __setitem__(self, k, v):
        with self._lock:
            if k not in self:
                self._order.append(k)
                while len(self._order) > self._cap:
                    old = dict.pop(self, self._order.pop(0))
                    # dropping the wrapper is not enough: jax's
                    # global jit cache holds the compiled executable
                    # until the jitted fn's own cache is cleared
                    try:
                        old.clear_cache()
                    except Exception:  # noqa: BLE001
                        pass
            dict.__setitem__(self, k, v)


_RUNNERS = _LruCache()


def _res_band_list(res, r: int):
    """Bands present at a resolution level under its (possibly
    Part-2 DFS) decomposition type (ojph_resolution.cpp:104-187):
    BIDIR -> HL/LH/HH, H-only -> band 1, V-only -> band 2, NO_DWT ->
    none (pass-through level)."""
    if r == 0:
        return [0]
    dt = res.dwt_type
    if dt == Dfs.BIDIR_DWT:
        return [1, 2, 3]
    if dt == Dfs.HORZ_DWT:
        return [1]
    if dt == Dfs.VERT_DWT:
        return [2]
    return []


def _build_plan(dec: 'TpuDecoder',
                tile_indices=None) -> Optional[_Plan]:
    """Walk the parsed stream; return None if the fused path can't
    handle it (then the slow path runs).  ``tile_indices`` restricts
    the plan to a subset of tiles — per-tile plans of a uniform tile
    grid share one key, which is what lets parallel.tiles batch the
    tiles of a mosaic along the lane axis and shard them over a
    mesh (tile independence, ojph_codestream_local.cpp:120)."""
    if getattr(dec, 'record_t2', False):
        return _build_plan_records(dec, tile_indices)
    resilient = bool(getattr(dec, 'resilient', False))
    warned = False
    groups: Dict[int, _Group] = {}
    placements = []
    bands = []
    tiles = []
    sel = (dec.tiles if tile_indices is None
           else [dec.tiles[i] for i in tile_indices])
    for ti, st in enumerate(sel):
        tile_comps = []
        for c, comp in enumerate(st.geom.comps):
            cod = dec.hdr.get_cod(c)
            rev = cod.is_reversible
            skip = min(dec.skip_recon, comp.num_decomps)
            top = comp.num_decomps - skip
            res_specs = []
            for r in range(top + 1):
                res = comp.resolutions[r]
                bids = []
                for b in _res_band_list(res, r):
                    sb = res.bands[b]
                    bid = len(bands)
                    bands.append((sb.rect.h, sb.rect.w, sb.kmax,
                                  float(sb.delta), rev))
                    bids.append(bid)
                    coded = st.coded[c][r][b]
                    run = None  # (gid, lane0, ncols, h_true, y0, x0)
                    for g in sb.blocks:
                        cb = coded[g.cb_y * sb.num_cb_x + g.cb_x]
                        dead = (cb is None or not cb.data
                                or cb.num_passes == 0
                                or cb.pass_length[0] == 0)
                        scup = 0
                        if not dead:
                            if cb.num_passes > 1 \
                                    or cb.missing_msbs >= 30:
                                return None  # multipass/wide: slow path
                            d = cb.data
                            lc = cb.pass_length[0]
                            if lc < 2 or len(d) < lc:
                                bad = True
                            else:
                                scup = (d[lc - 1] << 4) \
                                    + (d[lc - 2] & 0xF)
                                bad = (scup < 2 or scup > lc
                                       or scup > 4079)
                            if bad:
                                # the reference decodes resiliently in
                                # its one full-speed path by zeroing
                                # the broken block and continuing
                                # (ojph_codeblock.cpp:214-225,
                                # ojph_precinct.cpp:558-568); here the
                                # lane is deadened at plan time
                                if not resilient:
                                    return None
                                if not warned:
                                    _wrn(0x00080006,
                                         'broken codeblock(s) zeroed '
                                         '(resilient)')
                                    warned = True
                                dead = True
                                scup = 0
                        grp = groups.get(g.rect.w)
                        if grp is None:
                            grp = _Group(len(groups), g.rect.w)
                            groups[g.rect.w] = grp
                        lane = len(grp.members)
                        grp.members.append((None, 0) if dead
                                           else (cb, scup))
                        grp.live.append(not dead)
                        grp.h = max(grp.h, g.rect.h)
                        grp.qh_lims.append(
                            0 if dead else (g.rect.h + 1) >> 1)
                        y0 = g.rect.y0 - sb.rect.y0
                        x0 = g.rect.x0 - sb.rect.x0
                        if run is not None and run[0] == grp.gid \
                                and run[3] == g.rect.h \
                                and run[4] == y0 \
                                and run[5] + run[2] * g.rect.w == x0 \
                                and lane == run[1] + run[2]:
                            run = (run[0], run[1], run[2] + 1, run[3],
                                   run[4], run[5])
                        else:
                            if run is not None:
                                placements.append(run + (bid,))
                            run = (grp.gid, lane, 1, g.rect.h, y0, x0)
                    if run is not None:
                        placements.append(run + (bid,))
                h_even = (res.rect.x0 & 1) == 0
                v_even = (res.rect.y0 & 1) == 0
                res_specs.append((tuple(bids), h_even, v_even,
                                  int(res.dwt_type)))
            tile_comps.append((tuple(res_specs), rev,
                               dec.hdr.siz.comps[c].bit_depth,
                               dec.hdr.siz.comps[c].is_signed,
                               dec.hdr.nlt.type3_for(c),
                               cod.kernel))
        nc = dec.hdr.siz.num_comps
        mct = dec.hdr.cod.mc_trans == 1 and nc >= 3
        # narrowing to 8/16-bit is only valid at full reconstruction:
        # skipped-resolution output is LL coefficients with DWT gain,
        # which legitimately exceed the nominal sample range
        tiles.append((mct, tuple(tile_comps), dec.skip_recon == 0))

    glist = sorted(groups.values(), key=lambda g: g.gid)
    for grp in glist:
        # pallas lanes fill (S, 128) vregs -> pad to a 128 multiple
        grp.n_pad = _bucket(len(grp.members),
                            lo=128 if _use_pallas() else 8)
        scups = np.array([m[1] for m in grp.members if m[0] is not None],
                         np.int64)
        lcups = np.array([m[0].pass_length[0] for m in grp.members
                          if m[0] is not None], np.int64)
        if scups.size == 0:
            grp.words = (8, 8, 8)
            continue
        wm = _bucket((int((scups - 1).max()) * 8 + 31) // 32 + 2)
        wv = _bucket((4 + int((scups - 2).max()) * 8 + 31) // 32 + 2)
        ws = _bucket((int((lcups - scups).max()) * 8 + 31) // 32 + 2)
        grp.words = (wm, wv, ws)

    # vertical merge of compatible row strips:
    # (gid, lane0, ncols, h_true, y0, x0, bid) -> add nrows
    merged = []
    for (gid, lane0, ncols, h_t, y0, x0, bid) in placements:
        if merged:
            m = merged[-1]  # (gid, lane0, nrows, ncols, h_t, y0, bid, x0)
            if m[0] == gid and m[6] == bid and m[3] == ncols \
                    and m[4] == h_t and m[7] == x0 \
                    and m[5] + m[2] * h_t == y0 \
                    and m[1] + m[2] * ncols == lane0:
                merged[-1] = (m[0], m[1], m[2] + 1, m[3], m[4], m[5],
                              m[6], m[7])
                continue
        merged.append((gid, lane0, 1, ncols, h_t, y0, bid, x0))

    key = (tuple((g.gid, g.w, g.h, g.n_pad, g.words) for g in glist),
           tuple(merged), tuple(bands), tuple(tiles))
    return _Plan(key, glist, merged, bands, tiles)


# ---------------------------------------------------------------------------
# Record-mode planner: the geometry walk is cached per stream header
# (it is identical for every frame of a video); per-frame work is a
# handful of vectorized numpy passes over the Tier-2 record arrays.
# ---------------------------------------------------------------------------

class _Skel:
    __slots__ = ('groups', 'merged', 'bands', 'tiles')


class _SkelGroup:
    __slots__ = ('gid', 'w', 'h', 'n_pad', 'nm', 'qh_geom', 'h_geom',
                 'causal_geom', 'segs')


_SKELS: 'OrderedDict' = None
_SKELS_LOCK = None


def _plan_skeleton(dec, tile_indices):
    """Geometry-only plan parts (groups' lane layout, placements,
    bands, tiles), cached per (header bytes, skip, tiles, backend).
    Returns None for layouts the fused path can't handle (DFS)."""
    global _SKELS, _SKELS_LOCK
    import threading
    from collections import OrderedDict
    if _SKELS is None:
        _SKELS = OrderedDict()
        _SKELS_LOCK = threading.Lock()
    ck = (bytes(dec.data[:dec.hdr.header_size]), dec.skip_recon,
          None if tile_indices is None else tuple(tile_indices),
          _use_pallas())
    with _SKELS_LOCK:
        if ck in _SKELS:
            _SKELS.move_to_end(ck)
            return _SKELS[ck]
    skel = _build_skeleton(dec, tile_indices)
    with _SKELS_LOCK:
        _SKELS[ck] = skel
        while len(_SKELS) > 32:
            _SKELS.popitem(last=False)
    return skel


def _build_skeleton(dec, tile_indices):
    placements = []
    bands = []
    tiles = []
    groups: Dict[int, _SkelGroup] = {}
    sel_idx = (range(len(dec.tiles)) if tile_indices is None
               else tile_indices)
    for ti in sel_idx:
        st = dec.tiles[ti]
        tile_comps = []
        for c, comp in enumerate(st.geom.comps):
            cod = dec.hdr.get_cod(c)
            rev = cod.is_reversible
            skip = min(dec.skip_recon, comp.num_decomps)
            top = comp.num_decomps - skip
            res_specs = []
            for r in range(top + 1):
                res = comp.resolutions[r]
                bids = []
                for b in _res_band_list(res, r):
                    sb = res.bands[b]
                    bid = len(bands)
                    bands.append((sb.rect.h, sb.rect.w, sb.kmax,
                                  float(sb.delta), rev))
                    bids.append(bid)
                    grp0 = None
                    seg_idx = []
                    seg_qh = []
                    seg_h = []
                    causal = dec.hdr.get_cod(c).vert_causal
                    run = None  # (gid, lane0, ncols, h_true, y0, x0)
                    for g in sb.blocks:
                        grp = groups.get(g.rect.w)
                        if grp is None:
                            grp = _SkelGroup()
                            grp.gid = len(groups)
                            grp.w = g.rect.w
                            grp.h = 0
                            grp.nm = 0
                            grp.qh_geom = []
                            grp.h_geom = []
                            grp.causal_geom = []
                            grp.segs = []
                            groups[g.rect.w] = grp
                        if grp0 is not None and grp is not grp0 \
                                and seg_idx:
                            grp0.segs.append(
                                (ti, c, r, b,
                                 np.asarray(seg_idx, np.int64)))
                            grp0.qh_geom += seg_qh
                            grp0.h_geom += seg_h
                            grp0.causal_geom += [causal] * len(seg_idx)
                            seg_idx, seg_qh, seg_h = [], [], []
                        grp0 = grp
                        lane = grp.nm
                        grp.nm += 1
                        grp.h = max(grp.h, g.rect.h)
                        seg_idx.append(g.cb_y * sb.num_cb_x + g.cb_x)
                        seg_qh.append((g.rect.h + 1) >> 1)
                        seg_h.append(g.rect.h)
                        y0 = g.rect.y0 - sb.rect.y0
                        x0 = g.rect.x0 - sb.rect.x0
                        if run is not None and run[0] == grp.gid \
                                and run[3] == g.rect.h \
                                and run[4] == y0 \
                                and run[5] + run[2] * g.rect.w == x0 \
                                and lane == run[1] + run[2]:
                            run = (run[0], run[1], run[2] + 1, run[3],
                                   run[4], run[5])
                        else:
                            if run is not None:
                                placements.append(run + (bid,))
                            run = (grp.gid, lane, 1, g.rect.h, y0, x0)
                    if run is not None:
                        placements.append(run + (bid,))
                    if grp0 is not None and seg_idx:
                        grp0.segs.append(
                            (ti, c, r, b, np.asarray(seg_idx, np.int64)))
                        grp0.qh_geom += seg_qh
                        grp0.h_geom += seg_h
                        grp0.causal_geom += [causal] * len(seg_idx)
                h_even = (res.rect.x0 & 1) == 0
                v_even = (res.rect.y0 & 1) == 0
                res_specs.append((tuple(bids), h_even, v_even,
                                  int(res.dwt_type)))
            tile_comps.append((tuple(res_specs), rev,
                               dec.hdr.siz.comps[c].bit_depth,
                               dec.hdr.siz.comps[c].is_signed,
                               dec.hdr.nlt.type3_for(c),
                               cod.kernel))
        nc = dec.hdr.siz.num_comps
        mct = dec.hdr.cod.mc_trans == 1 and nc >= 3
        tiles.append((mct, tuple(tile_comps), dec.skip_recon == 0))

    glist = sorted(groups.values(), key=lambda g: g.gid)
    for grp in glist:
        grp.n_pad = _bucket(grp.nm, lo=128 if _use_pallas() else 8)
        grp.qh_geom = np.asarray(grp.qh_geom, np.int32)
        grp.h_geom = np.asarray(grp.h_geom, np.int32)
        grp.causal_geom = np.asarray(grp.causal_geom, bool)

    merged = []
    for (gid, lane0, ncols, h_t, y0, x0, bid) in placements:
        if merged:
            m = merged[-1]
            if m[0] == gid and m[6] == bid and m[3] == ncols \
                    and m[4] == h_t and m[7] == x0 \
                    and m[5] + m[2] * h_t == y0 \
                    and m[1] + m[2] * ncols == lane0:
                merged[-1] = (m[0], m[1], m[2] + 1, m[3], m[4], m[5],
                              m[6], m[7])
                continue
        merged.append((gid, lane0, 1, ncols, h_t, y0, bid, x0))

    skel = _Skel()
    skel.groups = glist
    skel.merged = merged
    skel.bands = bands
    skel.tiles = tiles
    return skel


def _build_plan_records(dec, tile_indices=None) -> Optional[_Plan]:
    """Per-frame plan from the Tier-2 record arrays (record_t2 mode):
    the geometry walk comes from the skeleton cache; this function is
    a few vectorized passes over [lanes]-sized arrays."""
    skel = _plan_skeleton(dec, tile_indices)
    if skel is None:
        return None
    buf = np.frombuffer(dec.data, np.uint8)
    glist = []
    key_groups = []
    pos_l, lcup_l, scup_l, p_l, qhl_l = [], [], [], [], []
    np_l, l2_l, h_l, cs_l = [], [], [], []
    any_refine = False
    for g in skel.groups:
        rows = np.empty((g.nm, 6), np.int32)
        poss = np.empty(g.nm, np.int64)
        at = 0
        for (ti, c, r, b, idx) in g.segs:
            rb, pb = dec.tiles[ti].rec[(c, r)][b]
            k = len(idx)
            rows[at:at + k] = rb[idx]
            poss[at:at + k] = pb[idx]
            at += k
        mm = rows[:, 0]
        npss = rows[:, 1]
        l0 = rows[:, 2]
        l1 = rows[:, 3]
        inc = rows[:, 4]
        nb = rows[:, 5]
        dead = (inc == 0) | (npss == 0) | (l0 == 0) | (nb == 0)
        live = ~dead
        if bool(np.any(live & ((npss > 3) | (mm >= 30) | (l0 < 2)))):
            return None  # >30 planes: slow path
        # reference pass-count clamps (decode_codeblock)
        npss = np.where(live & ((l1 == 0) | (mm >= 29)), 1, npss)
        l1 = np.where(npss <= 1, 0, l1)
        # coded ranges must lie inside the stream: a corrupt header
        # can declare lengths past EOF, and the native pack reads the
        # (pos, l0 [+l1]) ranges with C pointers — bounds-check here,
        # not there (fuzz-found; slow path raises the coded error)
        if bool(np.any(live & (poss + l0 + l1 > buf.shape[0]))):
            return None
        last = np.where(live, poss + l0, 2)
        scup = ((buf[last - 1].astype(np.int32) << 4)
                + (buf[last - 2] & 0xF))
        if bool(np.any(live & ((scup < 2) | (scup > l0)
                               | (scup > 4079)))):
            return None
        pad = g.n_pad - g.nm
        lcup_a = np.where(live, l0, 2).astype(np.int64)
        scup_a = np.where(live, scup, 2).astype(np.int64)
        pos_a = np.where(live, poss, -1)
        p_a = np.where(live, 30 - mm, 30).astype(np.int32)
        qhl_a = np.where(live, g.qh_geom, 0).astype(np.int32)
        np_a = np.where(live, npss, 1).astype(np.int32)
        l2_a = np.where(live, l1, 0).astype(np.int64)
        h_a = np.where(live, g.h_geom, 0).astype(np.int32)
        cs_a = g.causal_geom.copy()
        if pad:
            lcup_a = np.concatenate(
                [lcup_a, np.full(pad, 2, np.int64)])
            scup_a = np.concatenate(
                [scup_a, np.full(pad, 2, np.int64)])
            pos_a = np.concatenate([pos_a, np.full(pad, -1, np.int64)])
            p_a = np.concatenate([p_a, np.full(pad, 30, np.int32)])
            qhl_a = np.concatenate([qhl_a, np.zeros(pad, np.int32)])
            np_a = np.concatenate([np_a, np.ones(pad, np.int32)])
            l2_a = np.concatenate([l2_a, np.zeros(pad, np.int64)])
            h_a = np.concatenate([h_a, np.zeros(pad, np.int32)])
            cs_a = np.concatenate([cs_a, np.zeros(pad, bool)])
        if bool(live.any()):
            smax = int(scup_a[:g.nm][live].max())
            msmax = int((lcup_a[:g.nm] - scup_a[:g.nm])[live].max())
            wm = _bucket(((smax - 1) * 8 + 31) // 32 + 2)
            wv = _bucket((4 + (smax - 2) * 8 + 31) // 32 + 2)
            ws = _bucket((msmax * 8 + 31) // 32 + 2)
            words = (wm, wv, ws)
        else:
            words = (8, 8, 8)
        l2max = int(l2_a.max()) if l2_a.size else 0
        rwords = (0, 0)
        if l2max > 0:
            wr = _bucket((l2max * 8 + 31) // 32 + 3)
            rwords = (wr, wr)
            any_refine = True
        grp = _Group(g.gid, g.w, g.h, members=[None] * g.nm,
                     n_pad=g.n_pad, words=words, rwords=rwords)
        glist.append(grp)
        key_groups.append((g.gid, g.w, g.h, g.n_pad, words, rwords))
        pos_l.append(pos_a)
        lcup_l.append(lcup_a)
        scup_l.append(scup_a)
        p_l.append(p_a)
        qhl_l.append(qhl_a)
        np_l.append(np_a)
        l2_l.append(l2_a)
        h_l.append(h_a)
        cs_l.append(cs_a)
    key = (tuple(key_groups), tuple(skel.merged), tuple(skel.bands),
           tuple(skel.tiles))
    plan = _Plan(key, glist, skel.merged, skel.bands, skel.tiles)
    plan.lanes = (np.concatenate(pos_l), np.concatenate(lcup_l),
                  np.concatenate(scup_l), np.concatenate(p_l),
                  np.concatenate(qhl_l), np.concatenate(np_l),
                  np.concatenate(l2_l), np.concatenate(h_l),
                  np.concatenate(cs_l))
    plan.has_refine = any_refine
    return plan


def _tx_from_cb_j(raw, kmax, delta, reversible):
    """tx_from_cb inline (gen_rev/irv_tx_from_cb32,
    ojph_codestream_gen.cpp:124-168)."""
    mag = raw & jnp.uint32(0x7FFFFFFF)
    neg = (raw >> jnp.uint32(31)).astype(bool)
    if reversible:
        val = (mag >> jnp.uint32(31 - kmax)).astype(jnp.int32)
        return jnp.where(neg, -val, val)
    val = mag.astype(jnp.float32) * jnp.float32(delta)
    return jnp.where(neg, -val, val)


def _make_runner(plan: _Plan, nframes: int = 1, shard=None,
                 device_unstuff: bool = False):
    """Trace the fused decode graph for `nframes` same-geometry frames
    batched along the codeblock lane axis (frame f of group g occupies
    lanes [f*n_pad, (f+1)*n_pad)); reconstruction carries a leading
    frame axis, so a video burst is still one device dispatch.

    ``shard`` (a jax.sharding.NamedSharding over the frame axis)
    constrains the whole graph — Tier-1, dequant, DWT synthesis and
    sample conversion — to run frame-parallel over the mesh with no
    collectives (frames/tiles are independent); the words buffer
    stays replicated (compressed bytes are small next to pixels)."""
    groups, placements, bands, tiles = (plan.groups, plan.placements,
                                        plan.bands, plan.tiles)
    nmembers = [len(g.members) for g in groups]
    npads = [g.n_pad for g in groups]
    widths = [g.w for g in groups]
    heights = [g.h for g in groups]
    F = nframes

    use_pallas = _use_pallas()
    if use_pallas:
        from .block_decode_pallas import decode_cleanup_pallas
    if device_unstuff:
        from .unstuff import (_K, unstuff_mel, unstuff_mrp,
                              unstuff_ms, unstuff_spp, unstuff_vlc)
        # device_unstuff carries the packer's K bucket (True = ceiling)
        uk = _K if device_unstuff is True else int(device_unstuff)
    has_refine = any(g.rwords[0] > 0 for g in groups)
    if has_refine:
        from .block_refine import refine_core
    wordss = [g.words for g in groups]
    rwordss = [g.rwords for g in groups]
    lane_starts = []
    tl = 0
    for g in groups:
        lane_starts.append(tl)
        tl += g.n_pad

    def run(*args):
        rmeta = None
        if device_unstuff:
            buf, = args
            words = buf
            tailn = F * tl * 8 * (2 if has_refine else 1)
            tail = jax.lax.bitcast_convert_type(
                buf[buf.shape[0] - tailn:], jnp.int32)
            if has_refine:
                meta = tail[:F * tl * 8]
                rmeta = tail[F * tl * 8:].reshape(F, tl, 8)
            else:
                meta = tail
        elif has_refine:
            words, meta, rmeta = args
            rmeta = rmeta.reshape(F, tl, 8)
        else:
            words, meta = args
        meta = meta.reshape(F, tl, 8)
        if shard is not None:
            meta = jax.lax.with_sharding_constraint(meta, shard)
            if rmeta is not None:
                rmeta = jax.lax.with_sharding_constraint(rmeta, shard)
        decs = []
        errs = []
        for i, (nm, npad, w, h) in enumerate(
                zip(nmembers, npads, widths, heights)):
            s0 = lane_starts[i]
            mg = meta[:, s0:s0 + npad].reshape(F * npad, 8)

            wm, wv_, ws_ = wordss[i]
            # multipass groups also take the raw cleanup path: the
            # refinement branch below derives SigProp/MagRef
            # independently from the same blob
            raw_t1 = (device_unstuff and use_pallas and _raw_t1())
            if raw_t1:
                # in-kernel unstuffing: ship the RAW stuffed windows
                # straight to the Tier-1 kernel (its readers unstuff
                # on the fly like the reference's
                # dec_mel_st/rev_struct/frwd_struct32); the XLA
                # unstuff stage below disappears entirely, and the
                # three per-stream window gathers collapse into ONE
                # combined fetch per lane (unstuff.derive_raw_views —
                # the gathers were the fused graph's dominant device
                # cost by xprof)
                from .unstuff import derive_raw_views
                lane_off = mg[:, 0]
                ms_n = mg[:, 1]
                sh_n = mg[:, 2]
                ms, mel, vlc = derive_raw_views(
                    words, lane_off, ms_n, sh_n, (wm, wv_, ws_))
            elif device_unstuff:
                # words is the raw segment blob (uint32 view);
                # rebuild the dense windows on-device (meta columns:
                # lane_off, ms_n, sh_n, 0, 0, 0, p, qhl)
                lane_off = mg[:, 0]
                ms_n = mg[:, 1]
                sh_n = mg[:, 2]
                ms = unstuff_ms(words, lane_off, ms_n, ws_, kc=uk)
                mel = unstuff_mel(words, lane_off + ms_n, sh_n, wm,
                                  kc=uk)
                vlc = unstuff_vlc(words, lane_off + ms_n, sh_n, wv_,
                                  kc=uk)
            else:
                def unpack(oc, lc, W, guard):
                    off = mg[:, oc]
                    ln = mg[:, lc]
                    j = jnp.arange(W, dtype=jnp.int32)[None, :]
                    valid = j < ln[:, None]
                    # one contiguous slice per lane (the packer's tail
                    # margin keeps the clipped start from shifting
                    # real payload) — ~3x faster than element gathers
                    from .unstuff import _window
                    wv = _window(words, off, W)
                    return jnp.where(valid, wv, jnp.uint32(guard))

                mel = unpack(0, 1, wm, 0xFFFFFFFF)
                vlc = unpack(2, 3, wv_, 0)
                ms = unpack(4, 5, ws_, 0xFFFFFFFF)
            p = mg[:, 6]
            qhl = mg[:, 7]
            if raw_t1:
                from .block_decode_pallas import \
                    decode_cleanup_pallas_raw
                d, e = decode_cleanup_pallas_raw(mel, vlc, ms, p, w, h,
                                                 qhl, ms_n, sh_n)
            elif use_pallas:
                d, e = decode_cleanup_pallas(mel, vlc, ms, p, w, h, qhl)
            else:
                d, e = decode_cleanup_core(mel, vlc, ms, p, w, h, qhl)
            if rwordss[i][0] > 0:
                # SigProp/MagRef refinement in the same fused graph
                # (tpu/block_refine.py)
                rg = rmeta[:, s0:s0 + npad].reshape(F * npad, 8)
                if device_unstuff:
                    # raw refinement bytes at rg[:,0], length rg[:,1]:
                    # derive both streams on-device
                    spp = unstuff_spp(words, rg[:, 0], rg[:, 1],
                                      rwordss[i][0], kc=uk)
                    mrp = unstuff_mrp(words, rg[:, 0], rg[:, 1],
                                      rwordss[i][1], kc=uk)
                else:
                    def runpack(oc, lc, W):
                        from .unstuff import _window
                        ln = rg[:, lc]
                        valid = jnp.arange(W, dtype=jnp.int32)[None, :] \
                            < ln[:, None]
                        wv = _window(words, rg[:, oc], W)
                        return jnp.where(valid, wv, jnp.uint32(0))

                    spp = runpack(0, 1, rwordss[i][0])
                    mrp = runpack(2, 3, rwordss[i][1])
                d = refine_core(d, spp, mrp, p, rg[:, 4], rg[:, 5],
                                rg[:, 6] != 0, w, h)
            # dead lanes AND broken lanes decode to zero blocks — the
            # latter is the reference's resilient semantics
            # (ojph_codeblock.cpp:214-225); in strict mode the caller
            # raises on the error flags before using the output, so
            # the masking costs strict mode nothing
            ok = (qhl > 0) & jnp.logical_not(e)
            d = jnp.where(ok[:, None, None], d, jnp.uint32(0))
            decs.append(d.reshape(F, npad, h, w))
            errs.append(e.reshape(F, npad)[:, :nm])
        planes = [jnp.zeros((F, H, W), jnp.uint32)
                  for (H, W, _, _, _) in bands]
        for (gid, lane0, nrows, ncols, h_t, y0, bid, x0) in placements:
            w_t = widths[gid]
            d = decs[gid][:, lane0:lane0 + nrows * ncols, :h_t, :w_t]
            strip = d.reshape(F, nrows, ncols, h_t, w_t) \
                .transpose(0, 1, 3, 2, 4) \
                .reshape(F, nrows * h_t, ncols * w_t)
            planes[bid] = jax.lax.dynamic_update_slice(
                planes[bid], strip, (0, y0, x0))
        deq = [_tx_from_cb_j(planes[i], kmax, delta, rev)
               for i, (_, _, kmax, delta, rev) in enumerate(bands)]

        outs = []
        for (mct, comps, narrow_ok) in tiles:
            rec = []
            for (res_specs, rev, bd, sgn, nlt3, kern) in comps:
                plane = deq[res_specs[0][0][0]]
                for (bids, h_even, v_even, dt) in res_specs[1:]:
                    # Part-2 DFS: a level may split both ways, one
                    # way, or not at all (ojph_resolution.cpp:713-949)
                    if dt == Dfs.BIDIR_DWT:
                        plane = jdwt.inv_dwt2d(
                            plane, deq[bids[0]], deq[bids[1]],
                            deq[bids[2]], h_even, v_even, rev, kern)
                    elif dt == Dfs.HORZ_DWT:
                        plane = jdwt.inv_atk_1d(
                            plane, deq[bids[0]], h_even,
                            plane.ndim - 1, kern)
                    elif dt == Dfs.VERT_DWT:
                        plane = jdwt.inv_atk_1d(
                            plane, deq[bids[0]], v_even,
                            plane.ndim - 2, kern)
                    # NO_DWT: pass-through level
                rec.append(plane)
            if mct:
                rev0 = comps[0][1]
                if rev0:
                    r, gg, b = jclr.rct_backward(rec[0], rec[1], rec[2])
                else:
                    r, gg, b = jclr.ict_backward(rec[0], rec[1], rec[2])
                rec[0], rec[1], rec[2] = r, gg, b
            conv = []
            for ci, (res_specs, rev, bd, sgn, nlt3, _) in enumerate(comps):
                if rev:
                    c = jclr.rev_convert_out(rec[ci], bd, sgn, nlt3)
                else:
                    c = jclr.irv_convert_to_integer(rec[ci], bd, sgn,
                                                    nlt3)
                # narrowest host dtype: the device->host link is the
                # decode bottleneck (BASELINE.md), so ship 8/16-bit
                # samples instead of int32 where the depth allows.
                # NOTE the clip makes the fused path return samples in
                # the nominal range (what the reference APPS write,
                # ojph_img_io.cpp clamp) — truncated/lossy streams can
                # reconstruct slightly out of range, where the host
                # Decoder (like the reference LIBRARY's pull())
                # returns the unclamped values
                dt = _narrow_dtype(bd, sgn) if narrow_ok else jnp.int32
                if dt != jnp.int32:
                    lo, hi = ((-(1 << (bd - 1)), (1 << (bd - 1)) - 1)
                              if sgn else (0, (1 << bd) - 1))
                    c = jnp.clip(c, lo, hi)
                c = c.astype(dt)
                if shard is not None:
                    c = jax.lax.with_sharding_constraint(c, shard)
                conv.append(c)
            outs.append(tuple(conv))
        err_all = jnp.concatenate([e.reshape(-1) for e in errs]) \
            if errs else jnp.zeros((1,), bool)
        return err_all, tuple(outs)

    return jax.jit(run)


def _bucket_words(n: int) -> int:
    """Dense-buffer size bucket: pow2 to 256Ki words, then 64Ki-word
    (256KiB) multiples — bounds jit variants while keeping upload
    slack low (the wire is the serving bottleneck; 1MiB granularity
    wasted ~4% of a 1080p burst's upload)."""
    b = 4096
    while b < n and b < (1 << 18):
        b *= 2
    if n <= b:
        return b
    return -(-n // (1 << 16)) * (1 << 16)


def _pack_burst(frames_groups: List[List[dict]]):
    """Pack every stream word of a burst into ONE uint32 buffer and
    the per-lane bookkeeping into ONE int32 buffer: the tunnel to the
    device is latency-dominated (BASELINE.md), so transfer count
    matters more than layout elegance.

    meta columns per lane: mel_off, lm, vlc_off, lv, ms_off, ls, p,
    qhl (offsets absolute into the words buffer; qhl==0 marks a dead
    lane).  Groups with refinement passes pack their SigProp/MagRef
    streams into the same buffer and contribute a second meta plane
    (rmeta: spp_off, lsp, mrp_off, lmr, npasses, h_true, causal, 0);
    the return grows to (words, meta, rmeta)."""
    chunks = []
    metas = []
    rmetas = []
    any_refine = any('spp' in gd for fg in frames_groups for gd in fg)
    maxw = 8  # widest stream window: the buffer's tail margin
    cursor = 0
    for fg in frames_groups:
        for gd in fg:
            cols = []
            keys = [('mel', 'lm'), ('vlc', 'lv'), ('ms', 'ls')]
            if 'spp' in gd:
                keys += [('spp', 'lsp'), ('mrp', 'lmr')]
            for k, lk in keys:
                arr, ln = gd[k], gd[lk]
                w = arr.shape[1]
                maxw = max(maxw, w)
                mask = np.arange(w, dtype=np.int32)[None, :] < ln[:, None]
                chunks.append(arr[mask])
                offs = cursor + np.concatenate(
                    [[0], np.cumsum(ln[:-1], dtype=np.int64)])
                cursor += int(ln.sum())
                cols += [offs.astype(np.int32), ln]
            n = gd['p'].shape[0]
            metas.append(np.stack(cols[:6] + [gd['p'], gd['qhl']],
                                  axis=1))
            if any_refine:
                if 'spp' in gd:
                    rmetas.append(np.stack(
                        cols[6:10] + [gd['np'], gd['ht'], gd['causal'],
                                      np.zeros(n, np.int32)], axis=1))
                else:
                    rmetas.append(np.zeros((n, 8), np.int32))
    words = np.concatenate(chunks)
    # tail margin: the runner's window fetch is a clipped contiguous
    # slice per lane (unstuff._window contract)
    from .unstuff import _ROW
    dpad = _bucket_words(words.size + maxw + _ROW + 2)
    words = np.pad(words, (0, dpad - words.size))
    meta = np.ascontiguousarray(np.concatenate(metas, axis=0),
                                np.int32)
    if any_refine:
        rmeta = np.ascontiguousarray(np.concatenate(rmetas, axis=0),
                                     np.int32)
        return words, meta.reshape(-1), rmeta.reshape(-1)
    return words, meta.reshape(-1)


def _pack_burst_fast(pairs):
    """Native fast path of _pack_burst: per-lane stream words are
    unstuffed by C++ directly at their final dense-buffer positions
    (no padded [N, W] intermediates), threaded over lanes."""
    from .. import native
    datas: list = []
    lc, sc, pp, qq, caps = [], [], [], [], []
    for dec, plan in pairs:
        d, l, scp, ps, qh = dec._lane_info(plan)
        datas += d
        lc.append(l)
        sc.append(scp)
        pp.append(ps)
        qq.append(qh)
        caps.append(np.concatenate(
            [np.repeat(np.asarray(g.words, np.int64)[None, :],
                       g.n_pad, axis=0) for g in plan.groups]))
    lcups = np.concatenate(lc)
    scups = np.concatenate(sc)
    p = np.concatenate(pp)
    qhl = np.concatenate(qq)
    caps = np.concatenate(caps)  # [lanes, 3] word caps (wm, wv, ws)
    lm = np.minimum(caps[:, 0], (scups - 1) * 8 // 32 + 3)
    lv = np.minimum(caps[:, 1], ((scups - 2) * 8 + 4) // 32 + 3)
    ls = np.minimum(caps[:, 2], (lcups - scups) * 8 // 32 + 3)
    tot = lm + lv + ls
    base = np.zeros_like(tot)
    np.cumsum(tot[:-1], out=base[1:])
    meta = np.stack([base, lm, base + lm, lv, base + lm + lv, ls,
                     p.astype(np.int64), qhl.astype(np.int64)],
                    axis=1).astype(np.int32)
    blob = b''.join(datas)
    offsets = np.zeros(len(datas) + 1, np.int64)
    np.cumsum([len(d) for d in datas], out=offsets[1:])
    # tail margin per the runner's clipped-slice window fetch
    from .unstuff import _ROW
    dense = np.zeros(_bucket_words(int(tot.sum())
                                   + int(caps.max()) + _ROW + 2),
                     np.uint32)
    native.prep_cleanup_dense(blob, offsets, lcups, scups, meta, dense)
    return dense, meta.reshape(-1)


def _blob_margin(pairs) -> int:
    """Lead/tail margin (bytes) for device-unstuff blobs: the unstuff
    window fetch is a contiguous slice per lane whose start clips to
    the buffer, so margins of (max stream words + 2) guarantee a
    clipped window never shifts real payload (tpu/unstuff.py)."""
    mw = 8
    for _, p in pairs:
        for g in p.groups:
            mw = max(mw, *g.words, *g.rwords)
            # raw-T1 combined window (unstuff.derive_raw_views):
            # one fetch spans MagSgn + the wider of MEL/VLC
            mw = max(mw, g.words[2] + max(g.words[0], g.words[1]) + 2)
    from .unstuff import _ROW
    return 4 * (mw + _ROW + 2)  # row-aligned window fetch contract


def _pack_device_records(pairs):
    """Record-mode blob pack: per-lane byte positions come straight
    from plan.lanes (no per-codeblock Python objects, no bytes
    copies — the native builder memcpys directly out of each frame's
    stream buffer).  Refine plans append each lane's refinement
    segment d[lcup : lcup+len2] right after its cleanup bytes; the
    accelerator derives the SigProp/MagRef streams from it
    (unstuff_spp / unstuff_mrp)."""
    from .. import native
    refine = pairs[0][1].has_refine
    lcall = np.concatenate([p.lanes[1] for _, p in pairs])
    scall = np.concatenate([p.lanes[2] for _, p in pairs])
    pall = np.concatenate([p.lanes[3] for _, p in pairs])
    qall = np.concatenate([p.lanes[4] for _, p in pairs])
    l2all = (np.concatenate([p.lanes[6] for _, p in pairs])
             if refine else np.zeros_like(lcall))
    lead = _blob_margin(pairs)
    sizes = lcall - 1 + l2all
    base = np.zeros_like(sizes)
    base[0] = lead
    np.cumsum(sizes[:-1], out=base[1:])
    base[1:] += lead
    total = int(sizes.sum()) + 2 * lead
    padded = 4 * _bucket_words(max((total + 3) // 4 + 1, 2))
    blob = np.zeros(padded, np.uint8)
    ptr_l = []
    for dec, plan in pairs:
        pos = plan.lanes[0]
        buf = np.frombuffer(dec.data, np.uint8)
        # dead lanes (pos < 0) get lcup < 2 via the sentinel pointer 0
        ptr_l.append(np.where(pos >= 0, buf.ctypes.data + pos, 0))
    ptrs = np.concatenate(ptr_l)
    lc_eff = np.where(ptrs != 0, lcall, 0)
    ev = native.build_seg_blob_ptrs(ptrs, lc_eff, base, blob)
    dead = ptrs == 0
    if dead.any():
        # canonical dummy segment byte for dead/padding lanes
        blob[base[dead]] = 0x0F
    rinfo = None
    if refine:
        l2_eff = np.where(ptrs != 0, l2all, 0)
        ev2 = native.copy_ranges_ptrs(
            np.where(l2_eff > 0, ptrs + lcall, 0), l2_eff,
            base + lcall - 1, blob)
        ev = np.maximum(ev, ev2)
        npall = np.concatenate([p.lanes[5] for _, p in pairs])
        hall = np.concatenate([p.lanes[7] for _, p in pairs])
        call_ = np.concatenate([p.lanes[8] for _, p in pairs])
        rinfo = (npall, l2all, hall, call_)
    return _finish_device_pack(blob, base, lcall, scall, pall, qall,
                               ev, rinfo)


def _pack(pairs):
    """Pack a burst of (decoder, plan) pairs into (dense words, word
    meta[, refine meta]) for the host-unstuff runner."""
    from .. import native
    if native.have_native() and \
            not any(p.has_refine for _, p in pairs):
        return _pack_burst_fast(pairs)
    return _pack_burst([d._group_arrays(p) for d, p in pairs])


def _pack_auto(pairs):
    """Pack for the preferred runner mode.  Returns (mode, args):
    mode is the unstuff K bucket (a small int; truthy) when byte
    unstuffing runs on-device with a single raw-bytes+meta buffer
    (the smallest upload), or 0 for the host-unstuff path with
    (dense words, word meta) — including the rare fallback when a
    stream's stuffing density would blow the unstuff kernel's
    K-candidate ceiling."""
    if _device_unstuff():
        r = _pack_device(pairs)
        if r is not None:
            args, uk = r
            return uk, args
    return 0, _pack(pairs)


def _finish_device_pack(blob, base, lcups, scups, p, qhl, per_lane,
                        rinfo=None):
    """Shared tail of the device packers: budget check, meta layout
    (lane_off, ms_n, sh_n, 0, 0, 0, p, qhl) and the single-buffer
    concat (meta rides the blob's tail — the tunnel pays a latency
    roundtrip per transfer).  Refine plans append a second meta plane
    (roff, len2, 0, 0, npasses, h_true, causal, 0).  Returns
    ((buf,), K) with K the unstuff kernel's candidate budget sized to
    the burst's worst-case deleted-bit count (the reassembly cost
    scales with K), or None past the ceiling."""
    from . import unstuff
    maxdel = int(np.max(per_lane)) + 6
    if maxdel > unstuff.MAX_DELETED_BITS:
        return None
    uk = unstuff.k_for_deleted_bits(maxdel)
    z = np.zeros_like(base)
    meta = np.stack([base, lcups - scups, scups - 1, z, z, z,
                     p.astype(np.int64), qhl.astype(np.int64)],
                    axis=1).astype(np.int32)
    parts = [blob.view(np.uint32), meta.reshape(-1).view(np.uint32)]
    if rinfo is not None:
        npall, l2all, hall, call_ = rinfo
        rmeta = np.stack([base + lcups - 1, l2all, z, z,
                          npall.astype(np.int64),
                          hall.astype(np.int64),
                          call_.astype(np.int64), z],
                         axis=1).astype(np.int32)
        parts.append(rmeta.reshape(-1).view(np.uint32))
    return (np.concatenate(parts),), uk


def _pack_device(pairs):
    """Raw-segment-bytes layout for on-device unstuffing: each
    lane's blob range is d[0:lcup-1] (byte lcup-2 OR'd 0xF) followed
    by its refinement segment when present; the accelerator derives
    all bitstreams from it (MagSgn = first lcup-scup bytes; MEL/VLC
    share the rest forward/backward; SigProp/MagRef read the
    refinement range forward/backward).  Returns None when any lane's
    worst-case deleted-bit count exceeds unstuff.MAX_DELETED_BITS
    (caller falls back)."""
    from .. import native
    if native.have_native() and \
            all(p.lanes is not None for _, p in pairs):
        return _pack_device_records(pairs)
    if pairs[0][1].has_refine:
        return None  # object-mode multipass: host-unstuff path
    datas: list = []
    lc, sc, pp, qq = [], [], [], []
    for dec, plan in pairs:
        d, l, scp, ps, qh = dec._lane_info(plan)
        datas += d
        lc.append(l)
        sc.append(scp)
        pp.append(ps)
        qq.append(qh)
    lcups = np.concatenate(lc)
    scups = np.concatenate(sc)
    p = np.concatenate(pp)
    qhl = np.concatenate(qq)
    lead = _blob_margin(pairs)
    sizes = lcups - 1
    base = np.zeros_like(sizes)
    base[0] = lead
    np.cumsum(sizes[:-1], out=base[1:])
    base[1:] += lead
    total = int(sizes.sum()) + 2 * lead
    padded = 4 * _bucket_words(max((total + 3) // 4 + 1, 2))
    offsets = np.zeros(len(datas) + 1, np.int64)
    np.cumsum([len(d) for d in datas], out=offsets[1:])
    raw = b''.join(datas)
    if native.have_native():
        blob = native.build_seg_blob(raw, offsets, lcups, scups, base,
                                     padded)
    else:
        blob = np.zeros(padded, np.uint8)
        a = np.frombuffer(raw, np.uint8)
        for i in range(len(datas)):
            lcup = int(lcups[i])
            o = int(base[i])
            blob[o:o + lcup - 1] = a[offsets[i]:offsets[i] + lcup - 1]
            blob[o + lcup - 2] |= 0xF
    # stuffing-density budget: deleted bits per stream <= the lane's
    # count of 0x7F-low bytes (covers 0xFF for MEL/MagSgn and the
    # VLC drop candidates) + 6 (nibble + edges)
    ev = ((blob & 0x7F) == 0x7F).view(np.uint8)
    per_lane = np.add.reduceat(ev, base, dtype=np.int32)
    return _finish_device_pack(blob, base, lcups, scups, p, qhl,
                               per_lane)


class TpuDecoder(Decoder):
    """Decoder whose Tier-1 + reconstruction run on the accelerator.

    Tier-2 runs in record mode (flat numpy arrays, no per-codeblock
    Python objects) — the fused planner/packer consume the arrays
    directly; slow paths materialize CodedBlocks lazily."""

    def __init__(self, data: bytes, **kwargs):
        kwargs.setdefault('record_t2', True)
        super().__init__(data, **kwargs)

    def decode(self) -> List[np.ndarray]:
        if self._any_wide_band():
            # >30 bit planes: 64-bit scalar path (Decoder)
            return Decoder.decode(self)
        with trace.stage('decode.plan'):
            plan = _build_plan(self)
        if plan is not None:
            return self._decode_fast(plan)
        self._band_planes: Dict[Tuple[int, int, int, int], np.ndarray] = {}
        self._decode_all_blocks()
        return self._assemble(
            {st.geom.idx: self.decode_tile(st.geom.idx)
             for st in self.tiles})

    def _any_wide_band(self) -> bool:
        for st in self.tiles:
            for c, comp in enumerate(st.geom.comps):
                if not self.hdr.get_cod(c).is_reversible:
                    continue
                for res in comp.resolutions:
                    for b in range(4):
                        sb = res.bands[b]
                        if sb is not None and not sb.empty \
                                and sb.kmax >= 31:
                            return True
        return False

    # -- fused fast path ---------------------------------------------------
    _DUMMY = b'\x00\x22'  # minimal well-formed segment for dead lanes

    def _group_arrays(self, plan: _Plan) -> List[dict]:
        """Host prep per group: padded word planes + per-lane dense
        lengths (upper bounds; rows carry the correct guard fill
        beyond them) + p/qh_lim."""
        if plan.lanes is None:
            self._materialize_coded()
        out = []
        s0 = 0
        for g in plan.groups:
            refine = g.rwords[0] > 0
            len2s = np_ = hts = caus = None
            if plan.lanes is not None:  # record-mode plan
                posa, lcupa, scupa, pa, qhla = plan.lanes[:5]
                sl = slice(s0, s0 + g.n_pad)
                s0 += g.n_pad
                buf = self.data
                if refine:
                    np_ = plan.lanes[5][sl].copy()
                    len2s = plan.lanes[6][sl].copy()
                    hts = plan.lanes[7][sl].copy()
                    caus = plan.lanes[8][sl].copy()
                    datas = [bytes(buf[posa[i]:posa[i] + lcupa[i]
                                       + plan.lanes[6][i]])
                             if posa[i] >= 0 else self._DUMMY
                             for i in range(sl.start, sl.stop)]
                else:
                    datas = [bytes(buf[posa[i]:posa[i] + lcupa[i]])
                             if posa[i] >= 0 else self._DUMMY
                             for i in range(sl.start, sl.stop)]
                lcups = lcupa[sl].copy()
                scups = scupa[sl].copy()
                miss = (30 - pa[sl]).astype(np.int32)
                qhl = qhla[sl].copy()
            else:
                n = len(g.members)
                pad = g.n_pad - n
                datas = [bytes(m[0].data) if m[0] is not None
                         else self._DUMMY for m in g.members]
                lcups = np.array([m[0].pass_length[0]
                                  if m[0] is not None
                                  else 2 for m in g.members], np.int64)
                miss = np.array([m[0].missing_msbs
                                 if m[0] is not None
                                 else 0 for m in g.members], np.int32)
                scups = np.array([m[1] if m[0] is not None else 2
                                  for m in g.members], np.int64)
                datas += [self._DUMMY] * pad
                lcups = np.concatenate(
                    [lcups, np.full(pad, 2, np.int64)])
                miss = np.concatenate([miss, np.zeros(pad, np.int32)])
                scups = np.concatenate(
                    [scups, np.full(pad, 2, np.int64)])
                qhl = np.concatenate([np.array(g.qh_lims, np.int32),
                                      np.zeros(pad, np.int32)])
            streams = prep_cleanup_streams(datas, lcups, scups,
                                           min_words=g.words)
            wm, wv, ws = g.words
            gd = {
                'mel': streams['mel'], 'vlc': streams['vlc'],
                'ms': streams['ms'],
                'lm': np.minimum(wm, (scups - 1) * 8 // 32 + 3)
                      .astype(np.int32),
                'lv': np.minimum(wv, ((scups - 2) * 8 + 4) // 32 + 3)
                      .astype(np.int32),
                'ls': np.minimum(ws, (lcups - scups) * 8 // 32 + 3)
                      .astype(np.int32),
                'p': (30 - miss).astype(np.int32),
                'qhl': qhl,
            }
            if refine:
                from .block_refine import prep_refine_streams
                ref = prep_refine_streams(datas, lcups, len2s,
                                             min_words=g.rwords)
                wr = g.rwords[0]
                lr = np.minimum(wr, len2s * 8 // 32 + 3) \
                    .astype(np.int32)
                gd.update({'spp': ref['spp'], 'mrp': ref['mrp'],
                           'lsp': lr, 'lmr': lr.copy(),
                           'np': np_.astype(np.int32),
                           'ht': hts.astype(np.int32),
                           'causal': caus.astype(np.int32)})
            out.append(gd)
        return out

    def _lane_info(self, plan: _Plan):
        """Per-lane raw segment info in meta order (groups in gid
        order, members then padding), for the native dense prep."""
        if plan.lanes is not None:  # record-mode plan: slice the data
            pos, lcup, scup, ps, qhl = plan.lanes[:5]
            buf = self.data
            datas = [bytes(buf[pos[i]:pos[i] + lcup[i]])
                     if pos[i] >= 0 else self._DUMMY
                     for i in range(len(pos))]
            return (datas, lcup.copy(), scup.copy(),
                    ps.copy(), qhl.copy())
        self._materialize_coded()
        datas, lcups, scups, ps, qhls = [], [], [], [], []
        for g in plan.groups:
            for m in g.members:
                if m[0] is None:
                    datas.append(self._DUMMY)
                    lcups.append(2)
                    scups.append(2)
                    ps.append(30)
                else:
                    cb = m[0]
                    datas.append(bytes(cb.data))
                    lcups.append(cb.pass_length[0])
                    scups.append(m[1])
                    ps.append(30 - cb.missing_msbs)
            qhls += g.qh_lims
            pad = g.n_pad - len(g.members)
            datas += [self._DUMMY] * pad
            lcups += [2] * pad
            scups += [2] * pad
            ps += [30] * pad
            qhls += [0] * pad
        return (datas, np.asarray(lcups, np.int64),
                np.asarray(scups, np.int64),
                np.asarray(ps, np.int32), np.asarray(qhls, np.int32))


    def _decode_fast(self, plan: _Plan) -> List[np.ndarray]:
        with trace.stage('decode.host_prep'):
            mode, args = _pack_auto([(self, plan)])
        # _use_pallas/_raw_t1 shape the traced graph (tests
        # monkeypatch them) -> they belong in the cache key
        rk = (plan.key, 1, mode, _use_pallas(), _raw_t1())
        runner = _RUNNERS.get(rk)
        if runner is None:
            with trace.stage('decode.compile'):
                runner = _make_runner(plan, 1, device_unstuff=mode)
            _RUNNERS[rk] = runner
        with trace.stage('decode.device'):
            errs, outs = runner(*args)
            if np.asarray(errs).any():
                if not self.resilient:
                    raise ValueError('U_q exceeds missing_msbs + 2')
                # broken lanes were zeroed in-graph (reference
                # resilient semantics, ojph_codeblock.cpp:214-225)
                _wrn(0x00080006,
                     'broken codeblock(s) zeroed (resilient)')
            tile_planes = {
                st.geom.idx: [np.asarray(p)[0] for p in outs[i]]
                for i, st in enumerate(self.tiles)}
        with trace.stage('decode.assemble'):
            return self._assemble(tile_planes)

    # -- slow path (resilient / refinement passes / 64-bit) ---------------
    def _decode_all_blocks(self):
        self._materialize_coded()
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
                            if cb.missing_msbs >= 30 \
                                    or cb.pass_length[0] < 2:
                                self._scalar_block(cb, g, dst)
                                continue
                            # multi-pass blocks batch their cleanup
                            # too; SPP/MRP apply on the batch result
                            groups.setdefault((g.rect.w, g.rect.h),
                                              []).append((cb, dst))
        for (w, h), items in groups.items():
            for i in range(0, len(items), _MAX_BATCH):
                self._run_batch(w, h, items[i:i + _MAX_BATCH])

    def _scalar_block(self, cb, g, dst):
        key, y0, x0 = dst
        causal = self.hdr.get_cod(key[1]).vert_causal
        try:
            dec = decode_codeblock(bytes(cb.data), cb.missing_msbs,
                                   cb.num_passes, cb.pass_length[0],
                                   cb.pass_length[1], g.rect.w, g.rect.h,
                                   stripe_causal=causal)
        except ValueError:
            if self.resilient:
                return
            raise
        self._band_planes[key][y0:y0 + g.rect.h, x0:x0 + g.rect.w] = dec

    def _run_batch(self, w, h, items):
        n = len(items)
        datas = [bytes(cb.data) for cb, _ in items]
        lcups = np.array([cb.pass_length[0] for cb, _ in items], np.int64)
        missings = np.array([cb.missing_msbs for cb, _ in items], np.int32)
        scups = np.array([(d[lc - 1] << 4) + (d[lc - 2] & 0xF)
                          if 2 <= lc <= len(d) else 0
                          for d, lc in zip(datas, lcups)], np.int64)
        npasses = np.array([cb.num_passes for cb, _ in items], np.int32)
        len2s = np.array([cb.pass_length[1] if cb.num_passes > 1 else 0
                          for cb, _ in items], np.int64)
        causal = np.array([self.hdr.get_cod(key[1]).vert_causal
                           for _, (key, _, _) in items], bool)
        # reference pass-count clamps (decode_codeblock / decoder32.cpp)
        npasses = np.where((len2s == 0) | (missings >= 29), 1, npasses)
        len2s = np.where(npasses <= 1, 0, len2s)
        lens = np.array([len(d) for d in datas], np.int64)
        bad = (scups < 2) | (scups > lcups) | (scups > 4079) \
            | (lens < lcups + len2s)
        if bad.any():
            if not self.resilient:
                raise ValueError('invalid scup')
            keep = ~bad
            items = [it for it, k in zip(items, keep) if k]
            datas = [d for d, k in zip(datas, keep) if k]
            lcups, missings, scups, npasses, len2s, causal = \
                (a[keep] for a in (lcups, missings, scups, npasses,
                                   len2s, causal))
            n = len(items)
            if n == 0:
                return
        nb = _bucket(n)
        pad = nb - n
        datas += [datas[0]] * pad
        lcups = np.concatenate([lcups, np.repeat(lcups[:1], pad)])
        missings = np.concatenate([missings, np.repeat(missings[:1], pad)])
        scups = np.concatenate([scups, np.repeat(scups[:1], pad)])
        npasses = np.concatenate([npasses, np.repeat(npasses[:1], pad)])
        len2s = np.concatenate([len2s, np.repeat(len2s[:1], pad)])
        causal = np.concatenate([causal, np.repeat(causal[:1], pad)])
        streams = prep_cleanup_streams(datas, lcups, scups)
        p = (30 - missings).astype(np.int32)
        if npasses.max() > 1:
            # SigProp/MagRef refine on-device in the same dispatch
            # (tpu/block_refine.py; ojph_block_decoder32.cpp:1318-1611)
            from .block_refine import (decode_cleanup_refine,
                                       prep_refine_streams)
            ref = prep_refine_streams(datas, lcups, len2s)
            dec, err = decode_cleanup_refine(
                streams['mel'], streams['vlc'], streams['ms'],
                ref['spp'], ref['mrp'], p, npasses,
                np.full(nb, h, np.int32), causal, w, h)
        else:
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

    # -- slow-path reconstruction (device ops, per-band dispatches) --------
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

        from ..core.markers import Dfs
        kern = cod.kernel
        plane = band(0, 0)
        for r in range(1, top + 1):
            res = comp.resolutions[r]
            t = res.dwt_type
            if t == Dfs.BIDIR_DWT:
                plane = np.asarray(jdwt.inv_dwt2d(
                    plane, band(r, 1), band(r, 2), band(r, 3),
                    (res.rect.x0 & 1) == 0, (res.rect.y0 & 1) == 0,
                    reversible, kern))
            elif t == Dfs.HORZ_DWT:
                plane = np.asarray(jdwt.inv_atk_1d_jit(
                    plane, band(r, 1), (res.rect.x0 & 1) == 0, 1, kern))
            elif t == Dfs.VERT_DWT:
                plane = np.asarray(jdwt.inv_atk_1d_jit(
                    plane, band(r, 2), (res.rect.y0 & 1) == 0, 0, kern))
            # NO_DWT: pass-through level
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


_F_BUCKETS = (8, 4, 2, 1)


class VideoDecoder:
    """Pipelined burst decoder for same-geometry frame sequences.

    submit() parses + packs a burst on the host and dispatches the
    fused graph asynchronously; collect() materializes the oldest
    in-flight burst.  With >=2 bursts in flight, host prep of burst
    k+1, device compute of burst k and the host-ward transfer of
    burst k-1 overlap — the steady-state role of codestream.restart()
    + the reader/worker split in ojph_stream_expand
    (ojph_codestream.h:109-122, stream_expand thread pool).
    """

    def __init__(self, skip_res: int = 0, to_device: bool = False,
                 stage_uploads: bool = True, resilient: bool = False):
        """``to_device=True`` keeps decoded frames in device memory
        (HBM): ``collect_on_device`` returns jax Arrays for a
        downstream on-device consumer (the TPU serving path — decoded
        video feeding a model never crosses the host link).
        ``stage_uploads`` issues explicit device_put before dispatch;
        False passes numpy straight to the jitted call."""
        self.skip_res = skip_res
        self.to_device = to_device
        self.stage_uploads = stage_uploads
        # serving-direction resilience (enable_resilience,
        # ojph_codestream_local.cpp:903): broken blocks decode as
        # zeros IN the fused graph; error flags downgrade to warnings
        self.resilient = resilient
        self._inflight = []
        self._pending_errs = []
        from concurrent.futures import ThreadPoolExecutor
        # one worker per direction: _prep_pool runs parse/pack/upload/
        # dispatch (burst order preserved by the single worker),
        # _pool drains device->host copies.  Both overlap with the
        # caller's thread and with device compute.
        self._pool = ThreadPoolExecutor(max_workers=1)
        self._prep_pool = ThreadPoolExecutor(max_workers=1)
        self._dispatch_pool = ThreadPoolExecutor(max_workers=1)

    def submit(self, streams: List[bytes]) -> None:
        """Enqueue a burst: Tier-2 parse, native bit-unstuff/pack,
        host->device staging and graph dispatch all run on the prep
        worker, so the caller returns immediately and burst k+1's prep
        overlaps burst k's device compute.  Parse errors surface at
        the matching collect()."""
        self._inflight.append(
            self._prep_pool.submit(self._prep_and_dispatch,
                                   list(streams)))

    def _prep_and_dispatch(self, streams: List[bytes]):
        decs = [TpuDecoder(s, skipped_res_for_read=self.skip_res,
                           skipped_res_for_recon=self.skip_res,
                           resilient=self.resilient)
                for s in streams]
        plans = [_build_plan(d) for d in decs]
        if any(p is None for p in plans) or \
                len({p.key for p in plans}) != 1 or \
                len(streams) not in _F_BUCKETS:
            # mixed/fallback burst: decode synchronously
            return [d.decode() for d in decs]
        F = len(streams)
        key = plans[0].key
        with trace.stage('decode.host_prep'):
            mode, args = _pack_auto(list(zip(decs, plans)))
        rk = (key, F, mode, _use_pallas(), _raw_t1())
        runner = _RUNNERS.get(rk)
        if runner is None:
            with trace.stage('decode.compile'):
                runner = _make_runner(plans[0], F, device_unstuff=mode)
            _RUNNERS[rk] = runner
        # upload + dispatch on their own worker: on tunneled backends
        # the dispatch call blocks until its arguments are resident,
        # which would stall THIS (prep) worker for a full wire
        # transfer — burst k+1's parse/pack must overlap burst k's
        # upload, not wait behind it.
        def dispatch(runner=runner, args=args):
            with trace.stage('decode.dispatch'):
                if self.stage_uploads:
                    args = tuple(jax.device_put(a) for a in args)
                return runner(*args)
        dfut = self._dispatch_pool.submit(dispatch)
        if self.to_device:
            return (decs, dfut)
        # drain the device->host copies on a worker thread so the link
        # moves burst k downstream while burst k+1 uploads/computes;
        # collect() then only joins.  (jax fetches are thread-safe;
        # copy_to_host_async is not usable on every backend.)
        fut = self._pool.submit(
            lambda d=dfut: tuple(
                jax.tree_util.tree_map(np.asarray, d.result())))
        return (decs, fut)

    def collect(self) -> List[List[np.ndarray]]:
        """Block for and return the oldest submitted burst's frames."""
        item = self._inflight.pop(0).result()
        if isinstance(item, list):
            return item
        with trace.stage('decode.fetch'):
            decs, fut = item
            errs, outs = fut.result()
            if self.to_device:  # fetched synchronously here
                errs = np.asarray(errs)
                outs = jax.tree_util.tree_map(np.asarray, outs)
        if errs.any():
            if not self.resilient:
                raise ValueError('U_q exceeds missing_msbs + 2')
            _wrn(0x00080006, 'broken codeblock(s) zeroed (resilient)')
        with trace.stage('decode.assemble'):
            results = []
            for fi, d in enumerate(decs):
                tile_planes = {
                    st.geom.idx: [outs[ti][ci][fi]
                                  for ci in range(len(outs[ti]))]
                    for ti, st in enumerate(d.tiles)}
                results.append(d._assemble(tile_planes))
            return results

    def collect_on_device(self):
        """Device-resident variant of :meth:`collect` (requires
        ``to_device=True``): returns ``outs`` where
        ``outs[tile][comp]`` is a jax Array of shape ``(F, H, W)`` in
        HBM (frame axis first, narrow dtype) — hand it straight to the
        on-device consumer; the pixels never cross the link.

        Tier-1 error flags are fetched on the worker thread OFF the
        critical path: a corrupt burst raises at a LATER
        ``collect_on_device``/:meth:`drain_errors` call, not
        necessarily this one (the device arrays of a corrupt burst
        contain zeros for the offending blocks)."""
        item = self._inflight.pop(0).result()
        if isinstance(item, list):
            raise ValueError(
                'burst fell back to host decode (mixed geometry or '
                'unsupported stream); use collect() for this burst')
        decs, dfut = item
        errs, outs = dfut.result()
        # keep the error flags device-resident: a d2h fetch costs a
        # link roundtrip that would stall the upload stream.  They
        # are checked at drain_errors(); to bound memory AND surface
        # corruption within a bounded number of bursts on callers
        # that never drain, force-check the oldest flag once the
        # queue exceeds 16 (one small fetch per 16 bursts).
        self._pending_errs.append(errs)
        while len(self._pending_errs) > 16:
            if np.asarray(self._pending_errs.pop(0)).any():
                if not self.resilient:
                    raise ValueError('U_q exceeds missing_msbs + 2')
                _wrn(0x00080006,
                     'broken codeblock(s) zeroed (resilient)')
        return outs

    def drain_errors(self) -> None:
        """Block until every outstanding Tier-1 error flag is checked;
        raises if any collected burst was corrupt."""
        while self._pending_errs:
            if np.asarray(self._pending_errs.pop(0)).any():
                if not self.resilient:
                    raise ValueError('U_q exceeds missing_msbs + 2')
                _wrn(0x00080006,
                     'broken codeblock(s) zeroed (resilient)')

    @property
    def depth(self) -> int:
        return len(self._inflight)


def decode_tpu_batch(streams: List[bytes], resilient: bool = False,
                     skip_res: int = 0) -> List[List[np.ndarray]]:
    """Decode many codestreams, batching same-geometry frames into one
    device dispatch (video burst decode).

    Frames whose parsed geometry maps to the same plan share a traced
    runner; their codeblock batches are concatenated along the lane
    axis, so Tier-1, DWT and color for the whole burst execute as a
    single graph and transfer in one round trip.  Mixed-geometry
    inputs and fallback streams decode individually.  Equivalent
    steady-state role as codestream.restart() + the frame loop of
    ojph_stream_expand (ojph_codestream.h:109-122).
    """
    decs = [TpuDecoder(s, resilient=resilient,
                       skipped_res_for_read=skip_res,
                       skipped_res_for_recon=skip_res) for s in streams]
    results: List[Optional[list]] = [None] * len(streams)
    by_key: Dict[tuple, list] = {}
    for i, d in enumerate(decs):
        plan = _build_plan(d)
        if plan is None:
            results[i] = d.decode()
            continue
        by_key.setdefault(plan.key, []).append((i, d, plan))
    for key, items in by_key.items():
        pos = 0
        while pos < len(items):
            rem = len(items) - pos
            F = next(f for f in _F_BUCKETS if f <= rem)
            chunk = items[pos:pos + F]
            pos += F
            plan = chunk[0][2]
            mode, args = _pack_auto(
                [(d, pl) for (_, d, pl) in chunk])
            rk = (key, F, mode, _use_pallas(), _raw_t1())
            runner = _RUNNERS.get(rk)
            if runner is None:
                runner = _make_runner(plan, F, device_unstuff=mode)
                _RUNNERS[rk] = runner
            errs, outs = runner(*args)
            if np.asarray(errs).any():
                if not resilient:
                    raise ValueError('U_q exceeds missing_msbs + 2')
                _wrn(0x00080006,
                     'broken codeblock(s) zeroed (resilient)')
            for fi, (i, d, _) in enumerate(chunk):
                tile_planes = {
                    st.geom.idx: [np.asarray(p)[fi] for p in outs[ti]]
                    for ti, st in enumerate(d.tiles)}
                results[i] = d._assemble(tile_planes)
    return results
