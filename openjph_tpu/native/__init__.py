"""Native (C++) host kernels, built on demand with g++ and bound via
ctypes.  These cover the byte-level serial work that feeds/drains the
TPU device batches (SURVEY.md §7: byte packing stays on the host, in
C++ when speed matters).

Falls back silently to the numpy implementations when no compiler is
available; callers use `have_native()` / the wrappers below.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, 'ojtpu_native.cpp')
_SO = os.path.join(_DIR, '_ojtpu_native.so')
_lock = threading.Lock()
_lib = None
_failed = False


def _build() -> bool:
    if os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ['g++', '-O3', '-march=native', '-shared', '-fPIC',
             '-o', _SO + '.tmp', _SRC],
            check=True, capture_output=True)
        os.replace(_SO + '.tmp', _SO)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _build():
            _failed = True
            return None
        lib = ctypes.CDLL(_SO)
        lib.prep_cleanup_streams.restype = None
        lib.prep_cleanup_streams.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64]
        lib.prep_refine_streams.restype = None
        lib.prep_refine_streams.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
        lib.prep_cleanup_dense.restype = None
        lib.prep_cleanup_dense.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64]
        lib.t2_parse_packet.restype = ctypes.c_int64
        lib.t2_parse_packet.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.t2_emit_packet.restype = ctypes.c_int64
        lib.t2_emit_packet.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.build_seg_blob.restype = None
        lib.build_seg_blob.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64]
        lib.build_seg_blob_ptrs.restype = None
        lib.build_seg_blob_ptrs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.copy_ranges_ptrs.restype = None
        lib.copy_ranges_ptrs.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64]
        lib.pack_from_dense.restype = None
        lib.pack_from_dense.argtypes = [
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64]
        lib.pack_cleanup_segments.restype = None
        lib.pack_cleanup_segments.argtypes = [
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
        lib.decode_codeblock.restype = ctypes.c_int
        lib.decode_codeblock.argtypes = [
            ctypes.c_void_p] + [ctypes.c_int64] * 7 + \
            [ctypes.c_void_p] * 6
        lib.encode_codeblock.restype = ctypes.c_int64
        lib.encode_codeblock.argtypes = [
            ctypes.c_void_p] + [ctypes.c_int64] * 5 + \
            [ctypes.c_void_p] * 3 + [ctypes.c_void_p, ctypes.c_int64]
        lib.encode_codeblock_batch.restype = None
        lib.encode_codeblock_batch.argtypes = [
            ctypes.c_void_p] * 4 + [ctypes.c_int64] * 3 + \
            [ctypes.c_void_p] * 4 + \
            [ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
        return _lib


def have_native() -> bool:
    return _load() is not None


def prep_cleanup_streams(datas, lcups, scups, min_words=None):
    """Native batch unstuffer; same contract as
    bitprep.prep_cleanup_streams (returns dict of uint32 [N, W]).

    min_words: optional (mel_w, vlc_w, ms_w) lower bounds so callers
    can bucket widths and reuse compiled kernels across frames."""
    lib = _load()
    assert lib is not None
    n = len(datas)
    lcups = np.ascontiguousarray(lcups, dtype=np.int64)
    scups = np.ascontiguousarray(scups, dtype=np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    for i, d in enumerate(datas):
        offsets[i + 1] = offsets[i] + len(d)
    blob = b''.join(bytes(d) for d in datas)
    data = np.frombuffer(blob, dtype=np.uint8)

    def words_for(bits_max):
        return int((bits_max + 31) // 32 + 2)

    mel_w = words_for(int((scups - 1).max()) * 8) if n else 3
    vlc_w = words_for(4 + int((scups - 2).max()) * 8) if n else 3
    ms_w = words_for(int((lcups - scups).max()) * 8) if n else 3
    if min_words is not None:
        mel_w = max(mel_w, min_words[0])
        vlc_w = max(vlc_w, min_words[1])
        ms_w = max(ms_w, min_words[2])
    mel = np.zeros((n, mel_w), dtype=np.uint32)
    vlc = np.zeros((n, vlc_w), dtype=np.uint32)
    ms = np.zeros((n, ms_w), dtype=np.uint32)
    lib.prep_cleanup_streams(
        data.ctypes.data, offsets.ctypes.data, lcups.ctypes.data,
        scups.ctypes.data, n,
        mel.ctypes.data, mel_w, vlc.ctypes.data, vlc_w,
        ms.ctypes.data, ms_w)
    return {'mel': mel, 'vlc': vlc, 'ms': ms}


def prep_refine_streams(datas, lcups, len2s, min_words=None,
                        nthreads: int = 0):
    """Native SigProp/MagRef stream prep; same contract as
    block_refine.prep_refine_streams_np (datas[i] holds at least
    lcups[i] + len2s[i] bytes)."""
    lib = _load()
    assert lib is not None
    n = len(datas)
    lcups = np.ascontiguousarray(lcups, dtype=np.int64)
    len2s = np.ascontiguousarray(len2s, dtype=np.int64)
    # join only the refinement tails (the cleanup prefix is never
    # read here); the C++ sees each lane at offset 0 of its range
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(len2s, out=offsets[1:])
    blob = b''.join(bytes(d[lcups[i]:lcups[i] + len2s[i]])
                    for i, d in enumerate(datas))
    data = np.frombuffer(blob, dtype=np.uint8)
    zeros = np.zeros(n, dtype=np.int64)
    l2max = int(len2s.max()) if n else 0
    w = int((l2max * 8 + 1 + 31) // 32 + 2)
    ws, wm = w, w
    if min_words is not None:
        ws = max(ws, min_words[0])
        wm = max(wm, min_words[1])
    spp = np.zeros((n, ws), dtype=np.uint32)
    mrp = np.zeros((n, wm), dtype=np.uint32)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.prep_refine_streams(
        data.ctypes.data, offsets.ctypes.data, zeros.ctypes.data,
        len2s.ctypes.data, n, spp.ctypes.data, ws,
        mrp.ctypes.data, wm, nthreads)
    return {'spp': spp, 'mrp': mrp}


def t2_parse_packet(data: np.ndarray, pos: int, data_left: int,
                    may_use_sop: bool, uses_eph: bool, skip_data: bool,
                    bands, out_cb, out_pos, st) -> int:
    """Parse one packet header + body ranges (see ojtpu_native.cpp)."""
    lib = _load()
    assert lib is not None
    return int(lib.t2_parse_packet(
        data.ctypes.data, pos, data_left,
        1 if may_use_sop else 0, 1 if uses_eph else 0,
        1 if skip_data else 0,
        bands.ctypes.data, out_cb.ctypes.data, out_pos.ctypes.data,
        st.ctypes.data))


def t2_emit_packet(bands: np.ndarray, recs: np.ndarray,
                   out: np.ndarray) -> int:
    """Emit one packet header (see ojtpu_native.cpp); returns header
    length, -1 on overflow, -2 on unsupported num_passes."""
    lib = _load()
    assert lib is not None
    return int(lib.t2_emit_packet(bands.ctypes.data, recs.ctypes.data,
                                  out.ctypes.data, out.shape[0]))


def build_seg_blob(blob: bytes, offsets, lcups, scups, lane_off,
                   out_size: int, nthreads: int = 0,
                   out: np.ndarray = None) -> np.ndarray:
    """Lay out raw segment bytes for on-device unstuffing: each
    lane's blob range is d[0:lcup-1] with byte lcup-2 OR'd 0xF.
    ``offsets[i]`` is lane i's position in ``blob`` (any extra
    trailing entries are ignored).  Writes into ``out`` when given
    (callers pack multiple frames into one buffer); returns the
    uint8 blob."""
    lib = _load()
    assert lib is not None
    lane_off = np.ascontiguousarray(lane_off, np.int64)
    n = len(lane_off)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lcups = np.ascontiguousarray(lcups, np.int64)
    scups = np.ascontiguousarray(scups, np.int64)
    data = np.frombuffer(blob, dtype=np.uint8)
    if out is None:
        out = np.zeros(out_size, np.uint8)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.build_seg_blob(
        data.ctypes.data, offsets.ctypes.data, lcups.ctypes.data,
        scups.ctypes.data, n, lane_off.ctypes.data,
        out.ctypes.data, nthreads)
    return out


def build_seg_blob_ptrs(src_ptrs, lcups, lane_off, out: np.ndarray,
                        nthreads: int = 0) -> np.ndarray:
    """Pointer-batch blob builder: src_ptrs[i] is the absolute host
    address of lane i's bytes (the caller keeps the owning buffers
    alive).  Returns per-lane 0x7F-low byte counts (the device
    unstuffer's deleted-bit budget), counted during the copy."""
    lib = _load()
    assert lib is not None
    src_ptrs = np.ascontiguousarray(src_ptrs, np.int64)
    lcups = np.ascontiguousarray(lcups, np.int64)
    lane_off = np.ascontiguousarray(lane_off, np.int64)
    n = len(lane_off)
    ev = np.zeros(n, np.int64)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.build_seg_blob_ptrs(
        src_ptrs.ctypes.data, lcups.ctypes.data, n,
        lane_off.ctypes.data, out.ctypes.data, ev.ctypes.data,
        nthreads)
    return ev


def copy_ranges_ptrs(src_ptrs, lens, lane_off, out: np.ndarray,
                     nthreads: int = 0) -> np.ndarray:
    """Copy lane byte ranges (absolute host pointers) into ``out`` at
    lane_off; returns per-lane 0x7F-low counts (unstuff budget)."""
    lib = _load()
    assert lib is not None
    src_ptrs = np.ascontiguousarray(src_ptrs, np.int64)
    lens = np.ascontiguousarray(lens, np.int64)
    lane_off = np.ascontiguousarray(lane_off, np.int64)
    n = len(lane_off)
    ev = np.zeros(n, np.int64)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.copy_ranges_ptrs(src_ptrs.ctypes.data, lens.ctypes.data, n,
                         lane_off.ctypes.data, out.ctypes.data,
                         ev.ctypes.data, nthreads)
    return ev


def prep_cleanup_dense(blob: bytes, offsets, lcups, scups, meta,
                       dense, nthreads: int = 0):
    """Unstuff a lane batch straight into the shared dense word
    buffer at the positions given by meta (see ojtpu_native.cpp)."""
    lib = _load()
    assert lib is not None
    n = len(lcups)
    offsets = np.ascontiguousarray(offsets, np.int64)
    lcups = np.ascontiguousarray(lcups, np.int64)
    scups = np.ascontiguousarray(scups, np.int64)
    meta = np.ascontiguousarray(meta, np.int32)
    data = np.frombuffer(blob, dtype=np.uint8)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.prep_cleanup_dense(
        data.ctypes.data, offsets.ctypes.data, lcups.ctypes.data,
        scups.ctypes.data, n, meta.ctypes.data, dense.ctypes.data,
        nthreads)


def pack_from_dense(dense: np.ndarray, meta: np.ndarray,
                    out_stride: int, nthreads: int = 0):
    """Assemble cleanup segments from device-packed dense bit streams.

    dense: uint32 buffer; meta int64 [n, 6] rows of (mel_off,
    mel_bits, vlc_off, vlc_bits, ms_off, ms_bits).  Returns
    (out [n, out_stride] uint8, lens [n] int64; 0 = overflow)."""
    lib = _load()
    assert lib is not None
    n = meta.shape[0]
    dense = np.ascontiguousarray(dense, np.uint32)
    meta = np.ascontiguousarray(meta, np.int64)
    out = np.zeros((n, out_stride), np.uint8)
    lens = np.zeros(n, np.int64)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.pack_from_dense(n, dense.ctypes.data, meta.ctypes.data,
                        out.ctypes.data, out_stride, lens.ctypes.data,
                        nthreads)
    return out, lens


def pack_cleanup_segments(mel_e, vlc_c, vlc_l, ms_v, ms_l, pairs_real,
                          out_stride):
    """Pack device-emitted records into cleanup segments.

    mel_e [N, S, 3] int8, vlc_c [N, S, 6] uint16, vlc_l [N, S, 6]
    uint8, ms_v [N, S, 8] uint32, ms_l [N, S, 8] uint8, pairs_real [N]
    int64.  Returns (out [N, out_stride] uint8, lens [N] int64);
    lens[i] == 0 flags overflow (caller falls back to the scalar
    encoder).
    """
    lib = _load()
    assert lib is not None
    n, s = mel_e.shape[:2]
    mel_e = np.ascontiguousarray(mel_e, np.int8)
    vlc_c = np.ascontiguousarray(vlc_c, np.uint16)
    vlc_l = np.ascontiguousarray(vlc_l, np.uint8)
    ms_v = np.ascontiguousarray(ms_v, np.uint32)
    ms_l = np.ascontiguousarray(ms_l, np.uint8)
    pairs_real = np.ascontiguousarray(pairs_real, np.int64)
    out = np.zeros((n, out_stride), np.uint8)
    lens = np.zeros(n, np.int64)
    lib.pack_cleanup_segments(
        n, s, s, mel_e.ctypes.data, vlc_c.ctypes.data,
        vlc_l.ctypes.data, ms_v.ctypes.data, ms_l.ctypes.data,
        pairs_real.ctypes.data, out.ctypes.data, out_stride,
        lens.ctypes.data)
    return out, lens


_ENC_TABLES = None


def _enc_tables():
    global _ENC_TABLES
    if _ENC_TABLES is None:
        from ..coding.tables import get_tables
        t = get_tables()
        _ENC_TABLES = (
            np.ascontiguousarray(t['enc_vlc0'], np.uint16),
            np.ascontiguousarray(t['enc_vlc1'], np.uint16),
            np.ascontiguousarray(t['enc_uvlc'], np.uint8))
    return _ENC_TABLES


def encode_codeblock(buf, missing_msbs, width, height, bits=32):
    """C++ scalar HT cleanup-pass encode (port of coding/encoder.py,
    incl. the >30-bit-plane encoder64 regime); returns the cleanup
    segment bytes, or None when the native library is unavailable or
    an internal stream overflowed (caller falls back to Python)."""
    lib = _load()
    if lib is None:
        return None
    vlc0, vlc1, uvlc = _enc_tables()
    b = np.ascontiguousarray(buf[:height, :width], np.uint64)
    # worst case: ~ (bits+2)-bit MagSgn words per sample + header streams
    cap = int(width) * int(height) * (int(bits) // 8 + 3) + 8192
    out = np.empty(cap, np.uint8)
    n = int(lib.encode_codeblock(
        b.ctypes.data, b.shape[1] if b.size else width,
        int(missing_msbs), int(width), int(height), int(bits),
        vlc0.ctypes.data, vlc1.ctypes.data, uvlc.ctypes.data,
        out.ctypes.data, cap))
    if n < 0:
        return None
    return bytes(out[:n])


def encode_codeblock_batch(subs, missing_msbs, bits=32, nthreads=0):
    """Thread-parallel cleanup encode over one subband's codeblocks
    (shared missing_msbs/bits).  ``subs`` are 2D sign-magnitude
    arrays; returns a list of segment bytes with None entries on
    per-block overflow, or None when the native library is
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    vlc0, vlc1, uvlc = _enc_tables()
    n = len(subs)
    offs = np.zeros(n, np.int64)
    ws = np.zeros(n, np.int64)
    hs = np.zeros(n, np.int64)
    total = 0
    maxwh = 0
    for i, s in enumerate(subs):
        h, w = s.shape
        ws[i] = w
        hs[i] = h
        offs[i] = total
        total += w * h
        maxwh = max(maxwh, w * h)
    blob = np.empty(total, np.uint64)
    for i, s in enumerate(subs):
        blob[offs[i]:offs[i] + ws[i] * hs[i]] = \
            np.asarray(s, np.uint64).ravel()
    out_stride = maxwh * (int(bits) // 8 + 3) + 8192
    out = np.empty((n, out_stride), np.uint8)
    lens = np.zeros(n, np.int64)
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    lib.encode_codeblock_batch(
        blob.ctypes.data, offs.ctypes.data, ws.ctypes.data,
        hs.ctypes.data, n, int(missing_msbs), int(bits),
        vlc0.ctypes.data, vlc1.ctypes.data, uvlc.ctypes.data,
        out.ctypes.data, out_stride, lens.ctypes.data, nthreads)
    return [bytes(out[i, :lens[i]]) if lens[i] > 0 else None
            for i in range(n)]


_DEC_ERRORS = {
    -1: (0x00080001, 'invalid scup'),
    -2: (0x00080002, 'wrong codeblock length'),
    -3: (0x00080003, 'more than 3 coding passes not supported'),
    -4: (0x00080004, '64 bits insufficient for this codeblock'),
    -5: (0x00080005, 'U_q exceeds missing_msbs + 2'),
}


def decode_codeblock(coded_data, missing_msbs, num_passes, len1, len2,
                     width, height, stripe_causal=False):
    """C++ scalar HT block decode (port of coding/decoder.py, the
    64-bit-capable host path); returns the sign-magnitude array
    (uint32 for <=30 bit planes, uint64 beyond) or None when the
    native library is unavailable.  Raises ValueError on the same
    malformed-stream conditions as the Python reference."""
    lib = _load()
    if lib is None:
        return None
    from ..coding.tables import get_tables
    t = get_tables()
    data = np.ascontiguousarray(
        np.frombuffer(bytes(coded_data), np.uint8))
    qh = (height + 1) >> 1
    out = np.zeros((qh * 2, width), np.uint64)
    rc = lib.decode_codeblock(
        data.ctypes.data, int(missing_msbs), int(num_passes),
        int(len1), int(len2), int(width), int(height),
        int(bool(stripe_causal)),
        np.ascontiguousarray(t['dec_vlc0'], np.uint16).ctypes.data,
        np.ascontiguousarray(t['dec_vlc1'], np.uint16).ctypes.data,
        np.ascontiguousarray(t['dec_uvlc0'], np.uint16).ctypes.data,
        np.ascontiguousarray(t['dec_uvlc1'], np.uint16).ctypes.data,
        np.ascontiguousarray(t['dec_uvlc0_bias'],
                             np.uint8).ctypes.data,
        out.ctypes.data)
    if rc < 0:
        code, msg = _DEC_ERRORS[rc]
        raise ValueError(f'ojph error 0x{code:08X}: {msg}')
    out = out[:height]
    if missing_msbs < 30:
        return out.astype(np.uint32)
    return out
