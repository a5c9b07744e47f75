// Native host kernels for openjph_tpu: byte-level bitstream work that
// feeds the TPU device batches.
//
// prep_cleanup_streams: strip HTJ2K byte-stuffing from a batch of
// cleanup segments into dense LSB-first bit streams packed in uint32
// words (consumption order), one row per codeblock.  Mirrors the
// reader semantics of dec_mel_st / rev_struct / frwd_struct32
// (/root/reference/src/core/coding/ojph_block_decoder32.cpp:63-723);
// see openjph_tpu/tpu/bitprep.py for the stream conventions and the
// slow-path reference implementation.
//
// Build: g++ -O3 -shared -fPIC (driven by openjph_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>

namespace {

struct BitWriter {
  uint32_t* row;
  int64_t pos = 0;  // bit position
  explicit BitWriter(uint32_t* r) : row(r) {}
  inline void push(uint32_t bit) {
    row[pos >> 5] |= bit << (pos & 31);
    ++pos;
  }
  inline void push_bits_lsb(uint32_t v, int n) {  // v's low n bits, LSB first
    for (int j = 0; j < n; ++j) push((v >> j) & 1);
  }
  inline void push_bits_msb(uint32_t v, int hi, int lo) {  // bits hi..lo
    for (int j = hi; j >= lo; --j) push((v >> j) & 1);
  }
};

inline void fill_ones_from(uint32_t* row, int64_t pos, int64_t nwords) {
  // set all bits >= pos to 1 in a row of nwords words
  const int64_t w = pos >> 5;
  const int b = static_cast<int>(pos & 31);
  if (w >= nwords) return;
  row[w] |= (b == 0) ? 0xFFFFFFFFu : ~((1u << b) - 1u);
  for (int64_t k = w + 1; k < nwords; ++k) row[k] = 0xFFFFFFFFu;
}

}  // namespace

extern "C" {

// data: concatenated segment bytes; offsets[i] .. offsets[i]+lcups[i]
// delimit block i.  Output arrays are zero-initialized by the caller
// and have mel_words/vlc_words/ms_words uint32 per row (each including
// >= 2 guard words beyond any real payload).
void prep_cleanup_streams(const uint8_t* data, const int64_t* offsets,
                          const int64_t* lcups, const int64_t* scups,
                          int64_t n, uint32_t* mel_out, int64_t mel_words,
                          uint32_t* vlc_out, int64_t vlc_words,
                          uint32_t* ms_out, int64_t ms_words) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* d = data + offsets[i];
    const int64_t lcup = lcups[i];
    const int64_t scup = scups[i];

    // ---- MEL: bytes [lcup-scup, lcup-1), MSB-first, last |= 0xF ----
    {
      BitWriter bw(mel_out + i * mel_words);
      const uint8_t* seg = d + (lcup - scup);
      const int64_t len = scup - 1;
      uint8_t prev = 0;
      for (int64_t k = 0; k < len; ++k) {
        uint8_t b = seg[k];
        if (k == len - 1) b |= 0xF;
        bw.push_bits_msb(b, (prev == 0xFF) ? 6 : 7, 0);
        prev = b;
      }
      fill_ones_from(mel_out + i * mel_words, bw.pos, mel_words);
    }

    // ---- VLC backward: nibble of d[lcup-2], then bytes downward ----
    {
      BitWriter bw(vlc_out + i * vlc_words);
      const uint8_t nib_byte = d[lcup - 2];
      const uint32_t nib = nib_byte >> 4;
      bw.push_bits_lsb(nib, ((nib & 7) == 7) ? 3 : 4);
      bool unstuff = (nib_byte | 0xF) > 0x8F;
      for (int64_t k = 0; k < scup - 2; ++k) {
        const uint8_t b = d[lcup - 3 - k];
        const int nb = 8 - ((unstuff && ((b & 0x7F) == 0x7F)) ? 1 : 0);
        bw.push_bits_lsb(b, nb);
        unstuff = b > 0x8F;
      }
      // fill is zeros (rows arrive zeroed)
    }

    // ---- MagSgn forward: bytes [0, lcup-scup), LSB-first ----
    {
      BitWriter bw(ms_out + i * ms_words);
      const int64_t len = lcup - scup;
      uint8_t prev = 0;
      for (int64_t k = 0; k < len; ++k) {
        const uint8_t b = d[k];
        bw.push_bits_lsb(b, (prev == 0xFF) ? 7 : 8);
        prev = b;
      }
      fill_ones_from(ms_out + i * ms_words, bw.pos, ms_words);
    }
  }
}

}  // extern "C"
