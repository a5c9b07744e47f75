"""Tile-sharded mosaic decode — BASELINE.json config 5.

The reference decodes a multi-tile codestream tile by tile on one
CPU (tiles are parsed independently, ojph_codestream_local.cpp:912-
1115; tile grid limits at :120).  On TPU, tile independence is a
*sharding axis*: every tile of a uniform grid has the same plan
geometry, so the tiles of a 100Kx100K mosaic batch along the fused
decoder's frame axis and shard over the device mesh — each chip runs
Tier-1 block decode, dequantization, DWT synthesis and sample
conversion for its slice of the tiles with ZERO collectives.  Only
the (small) compressed words buffer is replicated; decoded pixels
are born sharded in HBM, which is the serving layout a pod-scale
consumer wants (tiles stay put; a model reads its local shard).

Edge tiles (right/bottom rims of an image that does not divide by
the tile size) have a different geometry and therefore a different
plan key; they form their own, smaller shard classes — typically 4
classes total (interior, right rim, bottom rim, corner).
"""
from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.message import warn as _wrn
from ..tpu.pipeline import (TpuDecoder, _bucket, _build_plan,
                            _make_runner, _pack)
from ..utils import trace
from .mesh import make_mesh

from ..tpu.pipeline import _LruCache
_SHARD_RUNNERS = _LruCache()


class _MemoPlans(dict):
    """Compatibility view of MosaicDecoder's per-tile plans: built on
    first access and memoized (external consumers like bench's
    cross-variant unification mutate the returned objects, so they
    must be stable once handed out).  The streaming decode path uses
    `_fresh_plan` instead and never fills this cache."""

    def __init__(self, md):
        super().__init__()
        self._md = md

    def __missing__(self, ti):
        p = self._md._fresh_plan(ti)
        self[ti] = p
        return p

    def values(self):
        for ti in range(len(self._md.dec.tiles)):
            self[ti]
        return super().values()


class MosaicDecoder:
    """Decode a multi-tile codestream with tiles sharded over a mesh.

    ``decode_on_device()`` returns the serving layout: per tile-
    geometry class, a ``(tiles, comps)`` pair where ``comps[c]`` is a
    jax Array of shape ``(T, tile_h, tile_w)`` sharded over the mesh
    along the tile axis, and ``tiles`` lists the tile indices each
    slice holds.  ``decode()`` assembles the full image on the host
    (the correctness/oracle path).
    """

    def __init__(self, data: bytes, mesh: Optional[Mesh] = None,
                 skip_res: int = 0, batch_tiles: int = 64,
                 resilient: bool = False):
        """``batch_tiles``: a geometry class larger than this is
        dispatched in sub-batches, bounding host+device memory by one
        sub-batch's tiles (a 32K/1K mosaic is ONE 1024-tile class —
        unchunked it would materialize the whole gigapixel output at
        once).  ``resilient``: broken blocks decode as zeros in the
        sharded graph (warning, no raise) — the reference's
        enable_resilience semantics at full speed."""
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.ndev = self.mesh.devices.size
        self.batch_tiles = max(batch_tiles, self.ndev)
        self.resilient = resilient
        self.dec = TpuDecoder(data, skipped_res_for_read=skip_res,
                              skipped_res_for_recon=skip_res,
                              resilient=resilient)
        if self.dec._any_wide_band():
            raise ValueError('>30 bit-plane streams take the host '
                             'path; mosaic sharding unsupported')
        # Per-tile plans, grouped into geometry classes.  The raw
        # plan key includes the groups' dense word-buffer buckets,
        # which depend on the tiles' *content* (coded lengths); class
        # membership must be geometry-only, so key on the plan with
        # the word buckets struck out, then unify every class to the
        # elementwise max bucket so one traced runner serves all its
        # tiles.  Per-tile plans are NOT retained — at config-5 scale
        # (10 GP, ~10k tiles) holding them all measured hundreds of
        # MB; each class keeps its max word buckets and plans rebuild
        # per sub-batch (`_fresh_plan`, ~1 ms each in record mode).
        self.classes: List[dict] = []
        self._tile_cls: Dict[int, int] = {}
        by_key: Dict[tuple, dict] = {}
        for ti in range(len(self.dec.tiles)):
            plan = _build_plan(self.dec, (ti,))
            if plan is None:
                raise ValueError(
                    'stream not eligible for the fused path '
                    '(DFS tiles, >30 bit planes, or multi-pass '
                    'without the native Tier-2 record parser); '
                    'use TpuDecoder')
            gk = (tuple((g.gid, g.w, g.h, g.n_pad)
                        for g in plan.groups),) + plan.key[1:]
            cls = by_key.get(gk)
            if cls is None:
                cls = {'idx': len(self.classes), 'tiles': [],
                       'plan': plan,
                       '_w': [list(g.words) for g in plan.groups],
                       '_r': [list(g.rwords) for g in plan.groups]}
                by_key[gk] = cls
                self.classes.append(cls)
            else:
                for i, g in enumerate(plan.groups):
                    w, r = cls['_w'][i], cls['_r'][i]
                    for j in range(3):
                        w[j] = max(w[j], g.words[j])
                    for j in range(2):
                        r[j] = max(r[j], g.rwords[j])
            cls['tiles'].append(ti)
            self._tile_cls[ti] = cls['idx']
        for cls in self.classes:
            cls['wmax'] = [tuple(w) for w in cls.pop('_w')]
            cls['rmax'] = [tuple(r) for r in cls.pop('_r')]
            # a tile whose own blocks are all single-pass still needs
            # refine-mode packing when ANY class member has refinement
            # passes (the shared runner expects rmeta)
            cls['refine'] = any(r[0] > 0 for r in cls['rmax'])
            self._unify(cls, cls['plan'])
        self.tile_plans = _MemoPlans(self)

    def _unify(self, cls, plan):
        """Apply the class-max word buckets + refine mode to a plan
        (every plan of a class must share one key <-> one runner)."""
        for i, g in enumerate(plan.groups):
            g.words = cls['wmax'][i]
            g.rwords = cls['rmax'][i]
        plan.has_refine = cls['refine']
        plan.key = (tuple((g.gid, g.w, g.h, g.n_pad, g.words,
                           g.rwords) for g in plan.groups),) \
            + plan.key[1:]
        return plan

    def _fresh_plan(self, ti: int):
        """Rebuild tile ti's plan (class-unified), uncached."""
        return self._unify(self.classes[self._tile_cls[ti]],
                           _build_plan(self.dec, (ti,)))

    def _runner(self, key, F):
        from ..tpu.pipeline import _raw_t1, _use_pallas
        rk = (key, F, self.mesh, self.axis,
              _use_pallas(), _raw_t1())
        runner = _SHARD_RUNNERS.get(rk)
        if runner is None:
            shard = NamedSharding(self.mesh, P(self.axis))
            with trace.stage('mosaic.compile'):
                runner = _make_runner(
                    self._plan_of(key), F, shard=shard)
            _SHARD_RUNNERS[rk] = runner
        return runner

    def _plan_of(self, key):
        for cls in self.classes:
            if cls['plan'].key == key:
                return cls['plan']
        raise KeyError(key)

    def _run_classes(self):
        """Yield (tile_indices, comps, errs) per geometry-class
        SUB-BATCH (one sharded dispatch each; classes larger than
        batch_tiles split so memory stays bounded)."""
        for cls in self.classes:
            plan, all_tiles = cls['plan'], cls['tiles']
            for at in range(0, len(all_tiles), self.batch_tiles):
                tiles = all_tiles[at:at + self.batch_tiles]
                T = len(tiles)
                # pad the tile batch to a pow2 bucket >= mesh size:
                # keeps the jit-variant count logarithmic and the
                # shard even
                F = max(_bucket(T, lo=8), self.ndev)
                with trace.stage('mosaic.host_prep'):
                    # tile i's lanes are frame-slot i; padding slots
                    # replicate tile 0 (dropped on assembly).  Plans
                    # build fresh per sub-batch and die with it.
                    sub_plans = [self._fresh_plan(ti) for ti in tiles]
                    args = _pack(
                        [(self.dec, p) for p in sub_plans]
                        + [(self.dec, sub_plans[0])] * (F - T))
                    del sub_plans
                runner = self._runner(plan.key, F)
                with trace.stage('mosaic.dispatch'):
                    errs, outs = runner(*args)
                # single-tile plans have exactly one tile entry
                yield list(tiles), outs[0], errs

    def decode_on_device(self):
        """One sharded dispatch per geometry class.  Returns a list
        of ``(tile_indices, comps)``; tile t of the class lives at
        ``comps[c][i]`` where ``i = tile_indices.index(t)`` (entries
        beyond ``len(tile_indices)`` are padding replicas)."""
        return list(self._run_classes())

    def decode(self) -> List[np.ndarray]:
        """Host-assembled full-image planes (bit-exact vs Decoder)."""
        classes = self.decode_on_device()
        tile_planes: Dict[int, List[np.ndarray]] = {}
        for tiles, comps, errs in classes:
            # padding slots replicate tile 0, so they cannot raise a
            # novel error — a blanket any() is exact
            if np.asarray(errs).any():
                if not self.resilient:
                    raise ValueError('U_q exceeds missing_msbs + 2')
                _wrn(0x00080006,
                     'broken codeblock(s) zeroed (resilient)')
            host = [np.asarray(c) for c in comps]
            for i, ti in enumerate(tiles):
                tile_planes[self.dec.tiles[ti].geom.idx] = \
                    [h[i] for h in host]
        return self.dec._assemble(tile_planes)

    def decode_to(self, sink) -> None:
        """Streaming decode: call ``sink(tile_idx, planes)`` for every
        tile WITHOUT assembling the full image — the whole-mosaic
        pixel array never exists on the host, so config-5-scale images
        stay memory-bounded by one geometry class's batch.  ``planes``
        are the tile's component planes cropped to the tile rect, in
        the same sample layout Decoder.decode_tile returns."""
        for tiles, comps, errs in self._run_classes():
            if np.asarray(errs).any():
                if not self.resilient:
                    raise ValueError('U_q exceeds missing_msbs + 2')
                _wrn(0x00080006,
                     'broken codeblock(s) zeroed (resilient)')
            host = [np.asarray(c) for c in comps]
            for i, ti in enumerate(tiles):
                sink(self.dec.tiles[ti].geom.idx,
                     [h[i] for h in host])


def decode_mosaic(data: bytes, mesh: Optional[Mesh] = None,
                  skip_res: int = 0) -> List[np.ndarray]:
    """Tile-sharded decode of a multi-tile stream; returns the
    assembled component planes."""
    return MosaicDecoder(data, mesh, skip_res).decode()


class MosaicEncoder:
    """Tile-sharded encode of a multi-tile image over a mesh —
    encode-side of MosaicDecoder.  Tiles of a uniform grid batch on
    the fused encode runner's frame axis and shard over the mesh
    (one sharded dispatch per tile-geometry class, zero collectives);
    byte packing + Tier-2 + stream assembly run on the host.  The
    output is byte-identical to the sequential encoder's."""

    def __init__(self, mesh: Optional[Mesh] = None,
                 batch_tiles: int = 64, **enc_kwargs):
        self.mesh = mesh or make_mesh()
        self.axis = self.mesh.axis_names[0]
        self.ndev = self.mesh.devices.size
        self.batch_tiles = max(batch_tiles, self.ndev)
        self._kwargs = enc_kwargs

    def encode(self, planes) -> bytes:
        from ..codec import normalize_planes
        from ..tpu.encode_pipeline import _narrow_tile_plane

        planes = normalize_planes(planes)
        nc = len(planes)

        def read_tile(ti, geoms, siz):
            return [_narrow_tile_plane(siz, geoms[ti], c, planes[c])
                    for c in range(nc)]

        return self._encode_common(planes[0].shape, nc, read_tile,
                                   fallback_planes=planes)

    def encode_chunked(self, tile_reader, shape, num_comps: int = 1,
                       out=None) -> bytes:
        """Chunked-ingest encode for images too large to hold resident
        (config 5): ``tile_reader(tile_idx, geom)`` returns the tile's
        per-component planes (tile-local arrays of the tile comp rect
        shape) — read from disk, generated, or fetched on demand.
        Only one geometry class's tile batch is resident at a time.

        ``out``: an open binary file — tile-parts stream to it as
        their class finishes (class order, legal per T.800 A.4.2) and
        the in-memory codestream never exists; returns None.  Without
        ``out`` the assembled bytes are returned."""
        from ..tpu.encode_pipeline import _narrow_dtype_for

        def read_tile(ti, geoms, siz):
            tps = tile_reader(ti, geoms[ti])
            return [np.ascontiguousarray(
                np.asarray(tp).astype(_narrow_dtype_for(siz, c)))
                for c, tp in enumerate(tps)]

        return self._encode_common(shape, num_comps, read_tile,
                                   fallback_planes=None, out=out)

    def _encode_common(self, shape, nc, read_tile, fallback_planes,
                       out=None):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from ..codec import build_encoder
        from ..core.geometry import build_tile, build_tile_grid
        from ..tpu.encode_pipeline import (
            TpuEncoder, _empty_coded, _PallasOverflow, _tile_packets)
        from ..tpu.pipeline import _use_pallas
        from .. import native

        enc = build_encoder(shape, nc,
                            encoder_cls=TpuEncoder, **self._kwargs)
        trs = build_tile_grid(enc.siz)
        geoms = [build_tile(enc.hdr, i, tr)
                 for i, tr in enumerate(trs)]
        # geometry classes (encode plan keys are geometry-only); plans
        # build one at a time and only the per-class representative is
        # kept — holding all per-tile plans measured ~50 KB/tile at
        # config-5 scale (hundreds of MB at 10 GP)
        classes: List[dict] = []
        by_key: Dict[tuple, dict] = {}
        for ti, g in enumerate(geoms):
            plan = (enc._build_enc_plan(g)
                    if native.have_native() else None)
            if plan is None:
                if fallback_planes is None:
                    raise ValueError(
                        'stream not eligible for the fused encode '
                        'path; chunked ingest needs it')
                return enc.encode(fallback_planes)  # scalar; one host
            cls = by_key.get(plan.key)
            if cls is None:
                cls = {'plan': plan, 'tiles': []}
                by_key[plan.key] = cls
                classes.append(cls)
            cls['tiles'].append(ti)
        shard = NamedSharding(self.mesh, P(self.axis))
        if out is not None:
            enc.stream_begin(out)
        all_packets = [None] * len(trs) if out is None else None
        for cls in classes:
            plan, all_tiles = cls['plan'], cls['tiles']
            # sub-batch large classes: memory stays bounded by one
            # batch_tiles chunk's pixel stack + coded planes
            for at in range(0, len(all_tiles), self.batch_tiles):
                tiles = all_tiles[at:at + self.batch_tiles]
                T = len(tiles)
                F = max(_bucket(T, lo=8), self.ndev)
                with trace.stage('mosaic.enc_host_prep'):
                    per_tile = [read_tile(ti, geoms, enc.siz)
                                for ti in tiles]
                    stacks = []
                    for c in range(nc):
                        tps = [pt[c] for pt in per_tile]
                        tps += [tps[0]] * (F - T)
                        stacks.append(np.stack(tps))
                    del per_tile
                rk = (plan.key, F, self.mesh, self.axis,
                      _use_pallas())
                runner = _SHARD_RUNNERS.get(rk)
                if runner is None:
                    with trace.stage('mosaic.enc_compile'):
                        runner = enc._make_enc_runner(plan, F,
                                                      shard=shard)
                    _SHARD_RUNNERS[rk] = runner
                with trace.stage('mosaic.enc_dispatch'):
                    outs = runner(*stacks)
                codeds = [_empty_coded(geoms[ti], nc)
                          for ti in tiles] + [None] * (F - T)
                with trace.stage('mosaic.enc_pack'):
                    if _use_pallas():
                        try:
                            enc._consume_pallas_outs(plan, outs,
                                                     codeds)
                        except _PallasOverflow:
                            if fallback_planes is None:
                                raise
                            return enc.encode(fallback_planes)
                    else:
                        enc._consume_record_outs(plan, outs, codeds)
                    del outs
                with trace.stage('mosaic.enc_t2'):
                    for ti, coded in zip(tiles, codeds):
                        packets = _tile_packets(enc, geoms[ti], coded)
                        if out is None:
                            all_packets[ti] = packets
                        else:
                            enc.stream_tile(out, ti, packets)
        if out is not None:
            enc.stream_end(out)
            return None
        return enc.assemble(all_packets)


def encode_mosaic(planes, mesh: Optional[Mesh] = None,
                  **enc_kwargs) -> bytes:
    """Tile-sharded encode; returns the .j2c codestream."""
    return MosaicEncoder(mesh, **enc_kwargs).encode(planes)
