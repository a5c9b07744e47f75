"""On-device byte-unstuffing for HT cleanup segments (gather-free).

The decode pipeline's inputs are three byte-stuffed bitstreams per
codeblock (MEL / VLC-backward / MagSgn, ojph_block_decoder32.cpp:
63-723).  Host-side unstuffing inflates the upload (the dense word
windows duplicate the MEL/VLC shared byte range and carry padding)
and costs a host pass over every coded byte.  Here the host ships
each lane's RAW bytes d[0:lcup-1] — exactly the coded size, the MEL
and VLC readers share the suffix d[lcup-scup:lcup-1] — and the
accelerator rebuilds the dense word streams of tpu/bitprep.py.

TPU-first formulation: byte stuffing is a RARE-EVENT single-bit
deletion (a byte after 0xFF carries 7 payload bits; VLC drops bit 7
of a 0x7F-low byte after a >0x8F byte; the VLC nibble byte drops its
low 4-5 bits).  So instead of per-lane variable-length repacking
(gathers — slow on TPU), we:

  1. pack every byte as-if-8-bits into words (pure elementwise),
  2. mark deleted bit positions in a per-word 32-bit mask computed
     from LOCAL byte predicates (the stuffing rule only looks one
     byte back),
  3. compress each word individually (delete-lowest-bit loop, a
     PEXT in ~5 vector steps),
  4. reassemble the variable-width compressed words into the output
     stream with an exclusive prefix sum + K-candidate roll-select
     (deleted bits are rare, so an output word's source window sits
     at most K words ahead of it).

Everything is elementwise/roll/cumsum over (lanes, words) arrays —
VPU-shaped, no gathers except the initial per-lane contiguous word
fetch (the same access pattern the decode kernel's input unpack
already uses).  Streams whose deletion count could exceed the
K-candidate budget (32*(K-2) deleted bits per stream; only crafted
input gets close) must take the host-unstuff path — the packer
checks this (pipeline._pack_device).

Blob layout contract: the window fetch is a contiguous W-word SLICE
per lane (one gather index per lane — ~3x faster than an element
gather on TPU), whose start clips to stay in bounds.  The blob must
therefore carry a LEAD and TAIL margin of at least (max stream words
+ 2) zero words so a clipped window can never shift real payload
(pipeline packers add it; reads into the margins only reach masked /
fill positions).

Bit-exact against bitprep.prep_cleanup_streams_np
(tests/test_unstuff.py).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

_U32 = jnp.uint32

# K-candidate budget of the reassembly select: an output word's first
# source word is at most K-2 words ahead (<= 32*(K-2) deleted bits per
# stream); +2 for the second/third tap.  The packer measures each
# burst's worst-case deleted-bit count and picks the smallest K bucket
# that covers it (stuffing is rare, so K=3 covers typical video and
# the reassembly cost scales with K); _K is the ceiling.
_K = 8
K_BUCKETS = (3, 4, 6, 8)
MAX_DELETED_BITS = 32 * (_K - 2)


def k_for_deleted_bits(maxdel: int) -> int:
    """Smallest K bucket covering ``maxdel`` deleted bits per stream
    (callers add their slack before calling)."""
    need = -(-maxdel // 32) + 2
    for k in K_BUCKETS:
        if k >= need:
            return k
    return _K


def _u32(x):
    return jnp.asarray(x, _U32)


def _bitrev8(b):
    """Reverse the bits of a uint32-held byte (vector ops)."""
    b = ((b & 0xF0) >> 4) | ((b & 0x0F) << 4)
    b = ((b & 0xCC) >> 2) | ((b & 0x33) << 2)
    b = ((b & 0xAA) >> 1) | ((b & 0x55) << 1)
    return b


def _shl(v, n):
    """uint32 shift-left with n in [0, 32] (n == 32 -> 0)."""
    n32 = jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where(n >= 32, _u32(0), v << n32)


def _shr(v, n):
    n32 = jnp.clip(n, 0, 31).astype(_U32)
    return jnp.where(n >= 32, _u32(0), v >> n32)


_ROW = 512  # gather row width (words): wide aligned row slices are
            # the cheapest per-index fetch on TPU (measured ~1.5x
            # faster than 128-word rows, ~4x vs element gathers)
_ROW_BITS = _ROW.bit_length() - 1


def _window(blob32, start_words, n: int):
    """[L, n] contiguous word windows blob32[s : s+n] per lane.

    TPU gathers pay per INDEX, and an index's slice is cheap only
    when it is tile-aligned — so the fetch is a row-aligned 2D gather
    (rows of _ROW words covering the window) followed by a
    log2(_ROW)-stage barrel shifter that rotates each lane's
    super-window left by s % _ROW with static slices + selects (pure
    VPU work, no second gather).  Starts clip to keep slices in
    bounds, so callers must guarantee (via the packer's blob margins,
    >= n + _ROW + 2 words) that a clipped window never shifts real
    payload."""
    size = blob32.shape[0]
    pad = (-size) % _ROW
    if pad:
        blob32 = jnp.concatenate(
            [blob32, jnp.zeros(pad, blob32.dtype)])
    nrows = blob32.shape[0] // _ROW
    b2 = blob32.reshape(nrows, _ROW)
    K = -(-n // _ROW) + 1
    s = jnp.clip(start_words.astype(jnp.int32), 0, size - n)
    row0 = jnp.clip(s >> _ROW_BITS, 0, nrows - K)
    # SINGLE-row take, not a (K, _ROW)-slice lax.gather: multi-row
    # slice gathers lower to a per-index while loop (~1.2 us/index,
    # ~4 ms for a 2 MP burst's lanes); single-row jnp.take hits the
    # fast path (~90x cheaper, measured on v5e)
    idx = (row0[:, None] + jnp.arange(K, dtype=jnp.int32)[None, :]) \
        .reshape(-1)
    sup = jnp.take(b2, idx, axis=0, mode='clip') \
        .reshape(-1, K * _ROW)
    r = (s - (row0 << _ROW_BITS))[:, None]  # residual, [0, _ROW)
    out = sup
    for b in range(_ROW_BITS):
        sh = 1 << b
        shifted = jnp.concatenate([out[:, sh:], out[:, :sh]], axis=1)
        out = jnp.where((r & sh) != 0, shifted, out)
    return out[:, :n]


def _lane_words_fwd(blob32, byte_off, nwords):
    """[L, nwords] uint32 little-endian views of each lane's bytes
    starting at byte_off (any alignment).  blob32 is the uint8 blob
    bitcast to uint32 (little-endian).  Requires the blob's tail
    margin (see module docstring)."""
    w0 = (byte_off >> 2).astype(jnp.int32)
    ph = ((byte_off & 3) * 8).astype(_U32)[:, None]
    w = _window(blob32, w0, nwords + 1)
    lo = w[:, :-1] >> ph
    hi = jnp.where(ph > 0, w[:, 1:] << (_u32(32) - ph), _u32(0))
    return lo | hi


def _lane_words_rev(blob32, byte_off, nbytes, nwords):
    """[L, nwords] uint32 whose byte k is the lane's byte
    (nbytes-1-k) — the reversed (emission-order) VLC view of the
    shared range [byte_off, byte_off+nbytes).  Requires the blob's
    lead margin (see module docstring)."""
    # word j covers reversed bytes 4j..4j+3 = forward addresses
    # byte_off+nbytes-4-4j .. byte_off+nbytes-1-4j; its LE32 at
    # a = byte_off+nbytes-4-4j, byte-swapped.  Fetch the whole
    # contiguous span [w0-nwords, w0+1] once and flip statically.
    a0 = byte_off + nbytes - 4
    w0 = (a0 >> 2).astype(jnp.int32)         # a0 may go negative
    ph = ((a0 & 3) * 8).astype(_U32)[:, None]
    win = _window(blob32, w0 - nwords, nwords + 2)
    wlo = win[:, nwords:0:-1]
    whi = win[:, nwords + 1:1:-1]
    le = (wlo >> ph) | jnp.where(ph > 0, whi << (_u32(32) - ph),
                                 _u32(0))
    return _bswap32(le)


def _byte_shift_words(win, shift_bytes, W_out: int):
    """Per-lane variable byte shift of an [L, N] little-endian word
    window: out word j covers window bytes [shift + 4j, shift + 4j
    + 4).  Whole-word stages are a log2 barrel of static shifts +
    selects (VPU work, no gather); the sub-word residue is one
    lo|hi combine.  Requires N >= (max shift)//4 + W_out + 1."""
    L, N = win.shape
    sw = (shift_bytes >> 2).astype(jnp.int32)[:, None]
    w = win
    b = 1
    while b < N:
        shifted = jnp.concatenate(
            [w[:, b:], jnp.zeros((L, b), w.dtype)], axis=1)
        w = jnp.where((sw & b) != 0, shifted, w)
        b <<= 1
    ph = ((shift_bytes & 3) * 8).astype(_U32)[:, None]
    lo = w[:, :W_out] >> ph
    hi = jnp.where(ph > 0,
                   w[:, 1:W_out + 1] << (_u32(32) - ph), _u32(0))
    return lo | hi


def _bswap32(x):
    return ((x & 0x000000FF) << 24) | ((x & 0x0000FF00) << 8) | \
           ((x & 0x00FF0000) >> 8) | ((x & _u32(0xFF000000)) >> 24)


def derive_raw_views(blob32, byte_off, ms_n, sh_n, words):
    """ONE gather per lane instead of three: each lane's coded bytes
    are CONTIGUOUS in the blob (MagSgn prefix [byte_off, byte_off +
    ms_n) then the MEL/VLC shared suffix [byte_off + ms_n, .. +
    sh_n)), so fetch a single combined word window per lane and
    derive the three raw stream views with in-register variable
    byte shifts — on TPU the window gather lowers to a while loop
    that pays per lane per stream, and it dominated the fused decode
    graph (xprof: ~17 ms of 26 ms for an 8x2 MP burst vs 4.5 ms of
    Tier-1 kernel).  Returns (ms, mel, vlc) word planes identical to
    _lane_words_fwd/_lane_words_rev of the three sub-ranges."""
    wm, wv, ws = words
    N = ws + max(wm, wv) + 2
    w0 = (byte_off >> 2).astype(jnp.int32)
    ph0 = (byte_off & 3).astype(jnp.int32)
    win = _window(blob32, w0, N)
    ms = _byte_shift_words(win, ph0, ws)
    mel = _byte_shift_words(win, ph0 + ms_n, wm)
    # reversed (emission-order) VLC view of the shared range: flip
    # the whole window statically (word reverse + byte swap), then
    # the lane's reversed stream starts at flipped-byte index
    # 4N - (ph0 + ms_n + sh_n)
    flip = _bswap32(win[:, ::-1])
    vlc = _byte_shift_words(flip, 4 * N - (ph0 + ms_n + sh_n), wv)
    return ms, mel, vlc


def _split_bytes(wv):
    """Four [L, W] byte planes of a little-endian word matrix."""
    return (wv & 0xFF, (wv >> 8) & 0xFF, (wv >> 16) & 0xFF,
            (wv >> 24) & 0xFF)


def _delete_marked(w, d, iters: int = 8):
    """Remove up to ``iters`` marked bits from each 32-bit word,
    compacting the remaining bits toward the LSB (delete-lowest-bit
    loop).  8 covers the VLC worst case (the nibble byte deletes 5
    bits and each of the word's other 3 bytes can delete 1); the
    byte-stuffed forward/MRP streams delete at most 1 bit per byte,
    so 4 suffices there."""
    for _ in range(iters):
        b = d & (~d + _u32(1))              # lowest marked bit
        mlow = b - _u32(1)                  # bits below it
        w2 = (w & mlow) | ((w >> 1) & ~mlow)
        d2 = (d >> 1) & ~mlow
        keep = b == 0
        w = jnp.where(keep, w, w2)
        d = jnp.where(keep, d, d2)
    return w


def _assemble(vals, delmask, nvalid_bits, W, fill_ones, k_max: int = _K,
              del_iters: int = 8):
    """vals: [L, Wn] as-if-8-bit packed words; delmask: deleted bit
    positions per word; nvalid_bits: [L] total pre-deletion bits.
    Returns [L, W] compacted output words, filled with ones/zeros
    past each lane's end.  ``k_max`` bounds the candidate window
    (<= 32*(k_max-2) deleted bits per stream — the packer guarantees
    it)."""
    L, Wn = vals.shape
    j32 = jnp.arange(Wn, dtype=jnp.int32)[None, :] * 32
    valid_bits = jnp.clip(nvalid_bits[:, None] - j32, 0, 32)
    # deletions can only be marked on valid bits (callers mask bytes)
    cw = _delete_marked(vals, delmask, del_iters)
    nb = valid_bits - lax.population_count(delmask).astype(jnp.int32)
    pos = jnp.cumsum(nb, axis=1) - nb       # exclusive prefix
    total = pos[:, -1:] + nb[:, -1:]        # [L, 1]
    t32 = jnp.arange(W, dtype=jnp.int32)[None, :] * 32

    def roll_to_w(a, k):
        """a[:, t+k] as a [L, W] array (out-of-range -> sentinel)."""
        pad = jnp.full((L, k_max + 3), np.int32(1 << 30), a.dtype) \
            if a.dtype == jnp.int32 \
            else jnp.zeros((L, k_max + 3), a.dtype)
        ext = jnp.concatenate([a, pad], axis=1)
        return ext[:, k:k + W]

    # k0(t): #candidates k in [0, K] with pos[t+k] <= 32t, minus 1
    k0 = jnp.zeros((L, W), jnp.int32)
    for k in range(k_max + 1):
        k0 = k0 + jnp.where(roll_to_w(pos, k) <= t32, 1, 0)
    k0 = k0 - 1
    # select source words i0 = t + k0, i0+1, i0+2 via where-chains
    pos_sel = jnp.zeros((L, W), jnp.int32)
    cw0 = jnp.zeros((L, W), _U32)
    nb0 = jnp.zeros((L, W), jnp.int32)
    cw1 = jnp.zeros((L, W), _U32)
    nb1 = jnp.zeros((L, W), jnp.int32)
    cw2 = jnp.zeros((L, W), _U32)
    for k in range(k_max + 1):
        m = k0 == k
        pos_sel = jnp.where(m, roll_to_w(pos, k), pos_sel)
        cw0 = jnp.where(m, roll_to_w(cw, k), cw0)
        nb0 = jnp.where(m, roll_to_w(nb, k), nb0)
        cw1 = jnp.where(m, roll_to_w(cw, k + 1), cw1)
        nb1 = jnp.where(m, roll_to_w(nb, k + 1), nb1)
        cw2 = jnp.where(m, roll_to_w(cw, k + 2), cw2)
    sh = t32 - pos_sel                       # in [0, 32)
    a = nb0 - sh                             # bits taken from cw0
    out = _shr(cw0, sh)
    out = out | _shl(cw1, a)
    out = out | _shl(cw2, a + nb1)
    # mask garbage above each contributing word's payload is already
    # zero (deleted bits compact toward LSB leaving zeros on top)
    rem = jnp.clip(total - t32, 0, 32)
    if fill_ones:
        fmask = jnp.where(rem >= 32, _u32(0),
                          _shl(_u32(0xFFFFFFFF), rem))
        out = out | fmask
    else:
        keep = jnp.where(rem >= 32, _u32(0xFFFFFFFF),
                         _shl(_u32(1), rem) - _u32(1))
        out = out & keep
    return out


def unstuff_ms(blob32, byte_off, nbytes, W, fill_ones=True,
               kc=_K):
    """MagSgn: bytes LSB-first, 7 bits after a 0xFF byte (the
    dropped bit is the byte's bit 7), with the dropped bit OR'd into
    the NEXT byte's b0 (frwd_struct32 carry semantics — always 0
    for conformant encoders, but it keeps corrupt input identical
    to the reference reader); ones fill.  ``fill_ones=False`` gives
    the SigProp reader's zero-fill variant (same forward structure,
    fill = 0)."""
    Wn = W
    wv = _lane_words_fwd(blob32, byte_off, Wn)
    k = jnp.arange(Wn, dtype=jnp.int32)[None, :]
    bts = _split_bytes(wv)
    prev = (jnp.pad(bts[3], ((0, 0), (1, 0)))[:, :-1],
            bts[0], bts[1], bts[2])
    delmask = jnp.zeros(wv.shape, _U32)
    vals = jnp.zeros(wv.shape, _U32)
    stuffs = []
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        pv = jnp.where((bidx > 0) & valid, prev[m], 0)
        stuffed = valid & (pv == 0xFF)
        stuffs.append(stuffed)
        delmask = delmask | jnp.where(stuffed,
                                      _u32(1) << (8 * m + 7), _u32(0))
        vals = vals | (jnp.where(valid, bts[m], 0) << (8 * m))
    # carry: a stuffed byte's dropped b7 ORs into the next byte's b0
    pstuff = (jnp.pad(stuffs[3], ((0, 0), (1, 0)))[:, :-1],
              stuffs[0], stuffs[1], stuffs[2])
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        carry = jnp.where(valid & pstuff[m], (prev[m] >> 7) & 1,
                          jnp.zeros_like(prev[m]))
        vals = vals | (carry.astype(_U32) << (8 * m))
    return _assemble(vals, delmask, nbytes * 8, W, fill_ones,
                     k_max=kc, del_iters=4)


def unstuff_spp(blob32, byte_off, nbytes, W, kc=_K):
    """SigProp forward reader: MagSgn structure with zero fill
    (frwd_struct32 with fill=0, ojph_block_decoder32.cpp:581-723)."""
    return unstuff_ms(blob32, byte_off, nbytes, W, fill_ones=False,
                      kc=kc)


def unstuff_mrp(blob32, byte_off, nbytes, W, kc=_K):
    """MagRef backward reader (rev_init_mrp,
    ojph_block_decoder32.cpp:517-575): bytes of
    [byte_off, byte_off+nbytes) read in REVERSE, LSB-first, bit 7
    dropped when the previously-read byte was > 0x8F (the FIRST byte
    read is treated as following one) and this byte's low 7 bits are
    all ones; the dropped bit ORs into the next byte's b0; a bit
    dropped from the LAST byte stays visible before the zero fill."""
    Wn = W
    wv = _lane_words_rev(blob32, byte_off, nbytes, Wn)
    k = jnp.arange(Wn, dtype=jnp.int32)[None, :]
    bts = _split_bytes(wv)
    prev = (jnp.pad(bts[3], ((0, 0), (1, 0)))[:, :-1],
            bts[0], bts[1], bts[2])
    delmask = jnp.zeros(wv.shape, _U32)
    vals = jnp.zeros(wv.shape, _U32)
    dangs = []
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        b = bts[m]
        first = bidx == 0
        last = bidx == (nbytes[:, None] - 1)
        prev_uns = first | (prev[m] > 0x8F)
        drop = valid & prev_uns & ((b & 0x7F) == 0x7F)
        dangs.append(drop)
        delmask = delmask | jnp.where(drop & ~last,
                                      _u32(1) << (8 * m + 7), _u32(0))
        vals = vals | (jnp.where(valid, b, 0) << (8 * m))
    pdang = (jnp.pad(dangs[3], ((0, 0), (1, 0)))[:, :-1],
             dangs[0], dangs[1], dangs[2])
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        carry = jnp.where(valid & pdang[m], (prev[m] >> 7) & 1,
                          jnp.zeros_like(prev[m]))
        vals = vals | (carry.astype(_U32) << (8 * m))
    return _assemble(vals, delmask, nbytes * 8, W, False,
                     k_max=kc, del_iters=4)


def unstuff_mel(blob32, byte_off, nbytes, W, kc=_K):
    """MEL: bytes MSB-first (bit-reversed into the LSB-first dense
    stream), 7 bits after a 0xFF byte (dropping the byte's bit 7 =
    its FIRST emission); ones fill.  The blob's last shared byte
    already carries |= 0xF (build_seg_blob)."""
    Wn = W
    wv = _lane_words_fwd(blob32, byte_off, Wn)
    k = jnp.arange(Wn, dtype=jnp.int32)[None, :]
    bts = _split_bytes(wv)
    prev = (jnp.pad(bts[3], ((0, 0), (1, 0)))[:, :-1],
            bts[0], bts[1], bts[2])
    delmask = jnp.zeros(wv.shape, _U32)
    vals = jnp.zeros(wv.shape, _U32)
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        pv = jnp.where((bidx > 0) & valid, prev[m], 0)
        stuffed = valid & (pv == 0xFF)
        delmask = delmask | jnp.where(stuffed,
                                      _u32(1) << (8 * m), _u32(0))
        vals = vals | (jnp.where(valid, _bitrev8(bts[m]), 0)
                       << (8 * m))
    return _assemble(vals, delmask, nbytes * 8, W, True,
                     k_max=kc, del_iters=4)


def unstuff_vlc(blob32, byte_off, nbytes, W, kc=_K):
    """VLC backward over the shared range [byte_off, byte_off+nbytes)
    read in REVERSE: emission byte 0 is the nibble byte (high nibble
    LSB-first, 3 bits if (nib&7)==7), later bytes emit low 7/8 bits
    (bit 7 dropped when the previous emitted byte was > 0x8F and
    this byte's low 7 bits are all ones; for emission byte 1 the
    previous byte is nib|0xF, which the blob's |= 0xF already
    applied).  Carry rule (rev_struct: tmp |= d << bits): every
    dropped bit ORs into the NEXT byte's b0, and a bit dropped from
    the LAST byte stays visible before the zero fill (modeled by
    keeping it).  Zero fill."""
    Wn = W
    wv = _lane_words_rev(blob32, byte_off, nbytes, Wn)
    k = jnp.arange(Wn, dtype=jnp.int32)[None, :]
    bts = _split_bytes(wv)
    prev = (jnp.pad(bts[3], ((0, 0), (1, 0)))[:, :-1],
            bts[0], bts[1], bts[2])
    delmask = jnp.zeros(wv.shape, _U32)
    vals = jnp.zeros(wv.shape, _U32)
    dangs = []
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        b = bts[m]
        pv = prev[m]
        first = bidx == 0
        last = bidx == (nbytes[:, None] - 1)
        drop = (~first) & valid & (pv > 0x8F) & ((b & 0x7F) == 0x7F)
        nib3 = first & valid & (((b >> 4) & 7) == 7)
        # the would-be-dangled bit (bit 7); kept when this is the
        # last byte so it stays visible before the zero fill
        dangs.append(drop | nib3)
        delmask = delmask | jnp.where((drop | nib3) & ~last,
                                      _u32(1) << (8 * m + 7), _u32(0))
        delmask = delmask | jnp.where(first & valid,
                                      _u32(0xF) << (8 * m), _u32(0))
        vals = vals | (jnp.where(valid, b, 0) << (8 * m))
    # carry: the dropped bit (bit 7 / nibble bit 3) ORs into the
    # next byte's b0
    pdang = (jnp.pad(dangs[3], ((0, 0), (1, 0)))[:, :-1],
             dangs[0], dangs[1], dangs[2])
    for m in range(4):
        bidx = k * 4 + m
        valid = bidx < nbytes[:, None]
        carry = jnp.where(valid & pdang[m], (prev[m] >> 7) & 1,
                          jnp.zeros_like(prev[m]))
        vals = vals | (carry.astype(_U32) << (8 * m))
    return _assemble(vals, delmask, nbytes * 8, W, False,
                     k_max=kc, del_iters=8)
