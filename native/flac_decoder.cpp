// Minimal in-tree FLAC decoder for the host data pipeline.
//
// The reference reads FLAC corpora (LibriTTS distributions, VCTK) through
// soundfile/libsndfile (ref: meldataset.py:149-170).  This image ships no
// libFLAC/libsndfile, so the subset of the FLAC format needed for speech
// corpora is implemented here directly: STREAMINFO parsing, frame headers,
// CONSTANT / VERBATIM / FIXED / LPC subframes, 4- and 5-bit Rice residual
// partitions (incl. escape codes), wasted bits, and left/right/mid-side
// stereo decorrelation.  CRCs are not verified (corrupt files surface as
// decode errors, which the loader's unreadable-audio skip path absorbs).
//
// Exposed C API (ctypes, styletts2_tpu/native.py):
//   flac_stream_info(data, size, &sr, &ch, &bps, &total) -> 0 / -1
//   flac_decode(data, size, out_i32, capacity_frames, &decoded_frames)
//     out is interleaved int32 (sign-extended to bps); returns 0 on success,
//     -1 on parse error, -2 if capacity was exhausted (caller grows + retries).

#include <cstdint>
#include <cstring>

namespace {

struct BitReader {
  const uint8_t* data;
  int64_t size;     // bytes
  int64_t pos = 0;  // bit position
  bool ok = true;

  bool at_end() const { return pos >= size * 8; }

  uint32_t bit() {
    if (pos >= size * 8) {
      ok = false;
      return 0;
    }
    const uint32_t b = (data[pos >> 3] >> (7 - (pos & 7))) & 1u;
    ++pos;
    return b;
  }

  uint64_t bits(int n) {  // n <= 57
    uint64_t v = 0;
    if (n <= 0) return 0;
    if (pos + n > size * 8) {
      ok = false;
      pos = size * 8;
      return 0;
    }
    // fast path: assemble from bytes
    int64_t byte = pos >> 3;
    int shift = pos & 7;
    int need = n + shift;
    int nbytes = (need + 7) >> 3;
    for (int i = 0; i < nbytes; ++i) v = (v << 8) | data[byte + i];
    v >>= (nbytes * 8 - need);
    v &= (n == 64) ? ~0ull : ((1ull << n) - 1);
    pos += n;
    return v;
  }

  int64_t signed_bits(int n) {
    if (n <= 0) return 0;
    uint64_t v = bits(n);
    const uint64_t sign = 1ull << (n - 1);
    return (v & sign) ? static_cast<int64_t>(v) - (1ll << n)
                      : static_cast<int64_t>(v);
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (ok && bit() == 0) {
      if (++q > 1u << 24) {  // corrupt stream guard
        ok = false;
        return 0;
      }
    }
    return q;
  }

  void align_byte() { pos = (pos + 7) & ~7ll; }
};

struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bps = 0;
  uint64_t total_samples = 0;
  int64_t frames_start = 0;  // byte offset of first audio frame
};

bool parse_stream_info(const uint8_t* data, int64_t size, StreamInfo* si) {
  if (size < 42 || std::memcmp(data, "fLaC", 4) != 0) return false;
  int64_t off = 4;
  bool have_streaminfo = false;
  for (;;) {
    if (off + 4 > size) return false;
    const bool last = data[off] & 0x80;
    const uint32_t type = data[off] & 0x7f;
    const uint32_t len = (uint32_t(data[off + 1]) << 16) |
                         (uint32_t(data[off + 2]) << 8) | data[off + 3];
    off += 4;
    if (off + len > size) return false;
    if (type == 0 && len >= 34) {
      const uint8_t* p = data + off;
      si->sample_rate =
          (uint32_t(p[10]) << 12) | (uint32_t(p[11]) << 4) | (p[12] >> 4);
      si->channels = ((p[12] >> 1) & 0x7) + 1;
      si->bps = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      si->total_samples = (uint64_t(p[13] & 0xf) << 32) |
                          (uint64_t(p[14]) << 24) | (uint64_t(p[15]) << 16) |
                          (uint64_t(p[16]) << 8) | p[17];
      have_streaminfo = true;
    }
    off += len;
    if (last) break;
  }
  si->frames_start = off;
  return have_streaminfo && si->sample_rate > 0 && si->channels >= 1 &&
         si->channels <= 8;
}

// UTF-8-style coded frame/sample number (up to 36 bits over 7 bytes)
bool read_coded_number(BitReader& br, uint64_t* out) {
  uint32_t b0 = uint32_t(br.bits(8));
  if (!br.ok) return false;
  int follow;
  uint64_t v;
  if (b0 < 0x80) {
    *out = b0;
    return true;
  } else if ((b0 & 0xe0) == 0xc0) {
    follow = 1;
    v = b0 & 0x1f;
  } else if ((b0 & 0xf0) == 0xe0) {
    follow = 2;
    v = b0 & 0x0f;
  } else if ((b0 & 0xf8) == 0xf0) {
    follow = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xfc) == 0xf8) {
    follow = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xfe) == 0xfc) {
    follow = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xfe) {
    follow = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < follow; ++i) {
    uint32_t b = uint32_t(br.bits(8));
    if (!br.ok || (b & 0xc0) != 0x80) return false;
    v = (v << 6) | (b & 0x3f);
  }
  *out = v;
  return true;
}

constexpr int kMaxBlock = 65535;
constexpr int kMaxOrder = 32;

bool decode_residual(BitReader& br, int32_t* x, int block, int order) {
  const uint32_t method = uint32_t(br.bits(2));
  if (method > 1) return false;
  const int pbits = method == 0 ? 4 : 5;
  const uint32_t escape = method == 0 ? 0xF : 0x1F;
  const uint32_t po = uint32_t(br.bits(4));
  const int parts = 1 << po;
  if ((block >> po) <= 0 || (block % parts) != 0) return false;
  int idx = order;
  for (int p = 0; p < parts; ++p) {
    int n = block >> po;
    if (p == 0) n -= order;
    if (n < 0) return false;
    const uint32_t param = uint32_t(br.bits(pbits));
    if (param == escape) {
      const int raw = int(br.bits(5));
      for (int i = 0; i < n; ++i)
        x[idx++] = int32_t(raw ? br.signed_bits(raw) : 0);
    } else {
      for (int i = 0; i < n; ++i) {
        const uint32_t q = br.unary();
        const uint64_t r = br.bits(int(param));
        const uint64_t u = (uint64_t(q) << param) | r;
        x[idx++] = int32_t((u >> 1) ^ (~(u & 1) + 1));
      }
    }
    if (!br.ok) return false;
  }
  return true;
}

bool decode_subframe(BitReader& br, int32_t* x, int block, int bps) {
  if (br.bit() != 0) return false;  // reserved
  const uint32_t type = uint32_t(br.bits(6));
  int wasted = 0;
  if (br.bit()) wasted = int(br.unary()) + 1;
  if (!br.ok) return false;
  bps -= wasted;
  if (bps <= 0 || bps > 33) return false;

  if (type == 0) {  // CONSTANT
    const int64_t c = br.signed_bits(bps);
    for (int i = 0; i < block; ++i) x[i] = int32_t(c);
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < block; ++i) x[i] = int32_t(br.signed_bits(bps));
  } else if (type >= 8 && type <= 12) {  // FIXED
    const int order = int(type - 8);
    if (order > block) return false;
    for (int i = 0; i < order; ++i) x[i] = int32_t(br.signed_bits(bps));
    if (!decode_residual(br, x, block, order)) return false;
    for (int i = order; i < block; ++i) {
      int64_t p;
      switch (order) {
        case 0: p = 0; break;
        case 1: p = x[i - 1]; break;
        case 2: p = 2ll * x[i - 1] - x[i - 2]; break;
        case 3: p = 3ll * x[i - 1] - 3ll * x[i - 2] + x[i - 3]; break;
        default:
          p = 4ll * x[i - 1] - 6ll * x[i - 2] + 4ll * x[i - 3] - x[i - 4];
      }
      x[i] = int32_t(p + x[i]);
    }
  } else if (type >= 32) {  // LPC, order = type - 31
    const int order = int(type - 31);
    if (order > kMaxOrder || order > block) return false;
    for (int i = 0; i < order; ++i) x[i] = int32_t(br.signed_bits(bps));
    const uint32_t prec_m1 = uint32_t(br.bits(4));
    if (prec_m1 == 0xF) return false;
    const int precision = int(prec_m1) + 1;
    const int shift = int(br.signed_bits(5));
    if (shift < 0) return false;
    int32_t coef[kMaxOrder];
    for (int i = 0; i < order; ++i) coef[i] = int32_t(br.signed_bits(precision));
    if (!decode_residual(br, x, block, order)) return false;
    for (int i = order; i < block; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += int64_t(coef[j]) * x[i - 1 - j];
      x[i] = int32_t((acc >> shift) + x[i]);
    }
  } else {
    return false;
  }
  if (!br.ok) return false;
  if (wasted)
    for (int i = 0; i < block; ++i)
      x[i] = int32_t(uint32_t(x[i]) << wasted);
  return true;
}

}  // namespace

extern "C" {

int flac_stream_info(const uint8_t* data, int64_t size, int32_t* sample_rate,
                     int32_t* channels, int32_t* bps, int64_t* total_samples) {
  StreamInfo si;
  if (!parse_stream_info(data, size, &si)) return -1;
  *sample_rate = int32_t(si.sample_rate);
  *channels = int32_t(si.channels);
  *bps = int32_t(si.bps);
  *total_samples = int64_t(si.total_samples);
  return 0;
}

int flac_decode(const uint8_t* data, int64_t size, int32_t* out,
                int64_t capacity_frames, int64_t* decoded_frames) {
  StreamInfo si;
  *decoded_frames = 0;
  if (!parse_stream_info(data, size, &si)) return -1;
  BitReader br{data + si.frames_start, size - si.frames_start};

  static thread_local int32_t chbuf[8][kMaxBlock];
  int64_t frames = 0;

  while (!br.at_end()) {
    br.align_byte();
    if (br.pos + 32 > br.size * 8) break;  // trailing padding
    // frame sync: 14 bits 0b11111111111110
    const uint32_t sync = uint32_t(br.bits(14));
    if (!br.ok) break;
    if (sync != 0x3FFE) return frames > 0 ? 0 : -1;
    br.bit();  // reserved
    br.bit();  // blocking strategy
    const uint32_t bs_code = uint32_t(br.bits(4));
    const uint32_t sr_code = uint32_t(br.bits(4));
    const uint32_t ch_code = uint32_t(br.bits(4));
    const uint32_t ss_code = uint32_t(br.bits(3));
    br.bit();  // reserved
    uint64_t coded;
    if (!read_coded_number(br, &coded)) return -1;

    int block;
    if (bs_code == 0)
      return -1;
    else if (bs_code == 1)
      block = 192;
    else if (bs_code <= 5)
      block = 576 << (bs_code - 2);
    else if (bs_code == 6)
      block = int(br.bits(8)) + 1;
    else if (bs_code == 7)
      block = int(br.bits(16)) + 1;
    else
      block = 256 << (bs_code - 8);
    if (block > kMaxBlock) return -1;

    if (sr_code == 12)
      br.bits(8);
    else if (sr_code == 13 || sr_code == 14)
      br.bits(16);

    int bps = int(si.bps);
    switch (ss_code) {
      case 0: break;
      case 1: bps = 8; break;
      case 2: bps = 12; break;
      case 4: bps = 16; break;
      case 5: bps = 20; break;
      case 6: bps = 24; break;
      case 7: bps = 32; break;
      default: return -1;
    }
    br.bits(8);  // CRC-8 (unverified)
    if (!br.ok) return -1;

    int nch;
    int mode = 0;  // 0 independent, 1 left/side, 2 right/side, 3 mid/side
    if (ch_code < 8) {
      nch = int(ch_code) + 1;
    } else if (ch_code <= 10) {
      nch = 2;
      mode = int(ch_code) - 7;
    } else {
      return -1;
    }
    if (nch != int(si.channels)) return -1;

    for (int c = 0; c < nch; ++c) {
      int sub_bps = bps;
      if ((mode == 1 && c == 1) || (mode == 2 && c == 0) ||
          (mode == 3 && c == 1))
        sub_bps += 1;  // side channel carries one extra bit
      if (!decode_subframe(br, chbuf[c], block, sub_bps)) return -1;
    }
    br.align_byte();
    br.bits(16);  // CRC-16 (unverified)

    // undo stereo decorrelation
    if (mode == 1) {  // left/side: right = left - side
      for (int i = 0; i < block; ++i) chbuf[1][i] = chbuf[0][i] - chbuf[1][i];
    } else if (mode == 2) {  // right/side: left = right + side
      for (int i = 0; i < block; ++i) chbuf[0][i] = chbuf[1][i] + chbuf[0][i];
    } else if (mode == 3) {  // mid/side
      for (int i = 0; i < block; ++i) {
        int64_t mid = chbuf[0][i], side = chbuf[1][i];
        mid = (mid << 1) | (side & 1);
        chbuf[0][i] = int32_t((mid + side) >> 1);
        chbuf[1][i] = int32_t((mid - side) >> 1);
      }
    }

    if (frames + block > capacity_frames) {
      *decoded_frames = frames;
      return -2;
    }
    for (int i = 0; i < block; ++i)
      for (int c = 0; c < nch; ++c) out[(frames + i) * nch + c] = chbuf[c][i];
    frames += block;
    if (si.total_samples && uint64_t(frames) >= si.total_samples) break;
  }
  *decoded_frames = frames;
  return frames > 0 ? 0 : -1;
}

}  // extern "C"
