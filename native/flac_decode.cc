// Minimal FLAC decoder (no external libraries): enough of the spec to
// decode LibriSpeech's 16-bit mono/stereo streams — STREAMINFO parsing,
// frame headers, constant/verbatim/fixed/LPC subframes, Rice-coded
// residuals, stereo decorrelation. Replaces the libsndfile/libFLAC path of
// the reference's data loader (SURVEY.md §2.5 native-component list).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // bits consumed in current byte (from MSB)
  bool error = false;

  BitReader(const uint8_t* d, size_t n) : data(d), size(n) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t bit() {
    if (byte_pos >= size) {
      error = true;
      return 0;
    }
    uint32_t b = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) {
      bit_pos = 0;
      ++byte_pos;
    }
    return b;
  }

  uint64_t bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | bit();
    return v;
  }

  int64_t signed_bits(int n) {
    uint64_t v = bits(n);
    if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1);
    return (int64_t)v;
  }

  uint32_t unary() {
    uint32_t q = 0;
    while (!error && bit() == 0) ++q;
    return q;
  }

  void align() {
    if (bit_pos) {
      bit_pos = 0;
      ++byte_pos;
    }
  }
};

int64_t rice_read(BitReader& br, int param) {
  uint32_t q = br.unary();
  uint64_t r = br.bits(param);
  uint64_t v = ((uint64_t)q << param) | r;
  return (int64_t)(v >> 1) ^ -(int64_t)(v & 1);
}

bool read_utf8_coded(BitReader& br, uint64_t* out) {
  uint32_t b0 = (uint32_t)br.bits(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    v = b0;
    extra = 0;
  } else if ((b0 & 0xE0) == 0xC0) {
    v = b0 & 0x1F;
    extra = 1;
  } else if ((b0 & 0xF0) == 0xE0) {
    v = b0 & 0x0F;
    extra = 2;
  } else if ((b0 & 0xF8) == 0xF0) {
    v = b0 & 0x07;
    extra = 3;
  } else if ((b0 & 0xFC) == 0xF8) {
    v = b0 & 0x03;
    extra = 4;
  } else if ((b0 & 0xFE) == 0xFC) {
    v = b0 & 0x01;
    extra = 5;
  } else if (b0 == 0xFE) {
    v = 0;
    extra = 6;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.bits(8);
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

bool decode_residual(BitReader& br, int order, int block_size,
                     std::vector<int64_t>& res) {
  uint32_t method = (uint32_t)br.bits(2);
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  int escape = method == 0 ? 15 : 31;
  uint32_t part_order = (uint32_t)br.bits(4);
  uint32_t n_parts = 1u << part_order;
  if (block_size % n_parts) return false;
  int samples_per_part = block_size >> part_order;
  int idx = order;
  for (uint32_t p = 0; p < n_parts; ++p) {
    int count = samples_per_part - (p == 0 ? order : 0);
    if (count < 0) return false;
    int param = (int)br.bits(param_bits);
    if (param == escape) {
      int raw_bits = (int)br.bits(5);
      for (int i = 0; i < count; ++i) res[idx++] = br.signed_bits(raw_bits);
    } else {
      for (int i = 0; i < count; ++i) res[idx++] = rice_read(br, param);
    }
    if (br.error) return false;
  }
  return true;
}

const int kFixedOrders[5][4] = {
    {},
    {1},
    {2, -1},
    {3, -3, 1},
    {4, -6, 4, -1},
};

bool decode_subframe(BitReader& br, int block_size, int bps,
                     std::vector<int64_t>& out) {
  if (br.bit() != 0) return false;  // padding bit
  uint32_t type = (uint32_t)br.bits(6);
  int wasted = 0;
  if (br.bit()) wasted = 1 + (int)br.unary();
  bps -= wasted;
  out.assign(block_size, 0);

  if (type == 0) {  // constant
    int64_t v = br.signed_bits(bps);
    for (int i = 0; i < block_size; ++i) out[i] = v;
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < block_size; ++i) out[i] = br.signed_bits(bps);
  } else if (type >= 8 && type <= 12) {  // fixed, order 0-4
    int order = type - 8;
    for (int i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += kFixedOrders[order][j] * out[i - 1 - j];
      out[i] += pred;
    }
  } else if (type >= 32) {  // LPC
    int order = (int)(type - 31);
    for (int i = 0; i < order; ++i) out[i] = br.signed_bits(bps);
    int precision = (int)br.bits(4) + 1;
    if (precision == 16) return false;  // invalid
    int shift = (int)br.signed_bits(5);
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.signed_bits(precision);
    if (!decode_residual(br, order, block_size, out)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] += pred >> shift;
    }
  } else {
    return false;
  }
  if (wasted) {
    for (int i = 0; i < block_size; ++i) out[i] <<= wasted;
  }
  return !br.error;
}

const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1,   -2,
                             256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
const int kSampleRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                              22050, 24000, 32000,  44100,  48000, 96000,
                              -1,    -2,    -3,     0};

}  // namespace

extern "C" {

long long satpu_read_flac(const char* path, float** out, int* sr_out,
                          int* channels_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::rewind(f);
  std::vector<uint8_t> buf(fsize);
  if (std::fread(buf.data(), 1, fsize, f) != (size_t)fsize) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  if (fsize < 42 || std::memcmp(buf.data(), "fLaC", 4) != 0) return -1;

  size_t pos = 4;
  int stream_sr = 0, stream_ch = 0, stream_bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  while (!last && pos + 4 <= (size_t)fsize) {
    uint8_t h = buf[pos];
    last = h & 0x80;
    int btype = h & 0x7F;
    uint32_t blen = (buf[pos + 1] << 16) | (buf[pos + 2] << 8) | buf[pos + 3];
    pos += 4;
    if (btype == 0 && blen >= 34) {  // STREAMINFO
      const uint8_t* s = buf.data() + pos;
      stream_sr = (s[10] << 12) | (s[11] << 4) | (s[12] >> 4);
      stream_ch = ((s[12] >> 1) & 0x7) + 1;
      stream_bps = (((s[12] & 1) << 4) | (s[13] >> 4)) + 1;
      total_samples = ((uint64_t)(s[13] & 0x0F) << 32) | ((uint64_t)s[14] << 24) |
                      (s[15] << 16) | (s[16] << 8) | s[17];
    }
    pos += blen;
  }
  if (stream_sr == 0 || stream_ch == 0) return -1;

  std::vector<float> pcm;
  if (total_samples) pcm.reserve(total_samples * stream_ch);
  float scale = 1.0f / (float)(1u << (stream_bps - 1));

  BitReader br(buf.data() + pos, fsize - pos);
  std::vector<std::vector<int64_t>> ch(stream_ch);

  while (!br.eof()) {
    br.align();
    // find frame sync
    uint32_t sync = (uint32_t)br.bits(14);
    if (br.error) break;
    if (sync != 0x3FFE) {
      // resync byte-by-byte
      br.bit_pos = 0;
      ++br.byte_pos;
      br.error = false;
      continue;
    }
    br.bit();  // reserved
    br.bit();  // blocking strategy
    uint32_t bs_code = (uint32_t)br.bits(4);
    uint32_t sr_code = (uint32_t)br.bits(4);
    uint32_t ch_code = (uint32_t)br.bits(4);
    uint32_t ss_code = (uint32_t)br.bits(3);
    br.bit();  // reserved
    uint64_t frame_no;
    if (!read_utf8_coded(br, &frame_no)) break;
    int block_size;
    if (bs_code == 6)
      block_size = (int)br.bits(8) + 1;
    else if (bs_code == 7)
      block_size = (int)br.bits(16) + 1;
    else
      block_size = kBlockSizes[bs_code];
    if (block_size <= 0) break;
    if (sr_code == 12)
      br.bits(8);
    else if (sr_code == 13 || sr_code == 14)
      br.bits(16);
    br.bits(8);  // CRC-8

    int bps = stream_bps;
    (void)ss_code;
    int n_ch = stream_ch;
    int assign = (int)ch_code;

    bool ok = true;
    if (assign <= 7) {
      n_ch = assign + 1;
      for (int c = 0; c < n_ch && ok; ++c)
        ok = decode_subframe(br, block_size, bps, ch[c]);
    } else {
      n_ch = 2;
      int side0 = (assign == 9) ? 1 : 0;  // right/side: first is side
      int bps0 = bps + (assign == 9 ? 1 : 0);
      int bps1 = bps + (assign == 8 || assign == 10 ? 1 : 0);
      (void)side0;
      ok = decode_subframe(br, block_size, bps0, ch[0]) &&
           decode_subframe(br, block_size, bps1, ch[1]);
      if (ok) {
        if (assign == 8) {  // left/side
          for (int i = 0; i < block_size; ++i) ch[1][i] = ch[0][i] - ch[1][i];
        } else if (assign == 9) {  // right/side: stored side, right
          for (int i = 0; i < block_size; ++i) ch[0][i] = ch[0][i] + ch[1][i];
        } else if (assign == 10) {  // mid/side
          for (int i = 0; i < block_size; ++i) {
            int64_t mid = ch[0][i], side = ch[1][i];
            mid = (mid << 1) | (side & 1);
            ch[0][i] = (mid + side) >> 1;
            ch[1][i] = (mid - side) >> 1;
          }
        }
      }
    }
    if (!ok) break;
    br.align();
    br.bits(16);  // frame CRC-16

    for (int i = 0; i < block_size; ++i)
      for (int c = 0; c < n_ch; ++c) pcm.push_back((float)ch[c][i] * scale);
    if (total_samples && pcm.size() >= total_samples * stream_ch) break;
  }

  if (pcm.empty()) return -1;
  float* out_buf = (float*)std::malloc(sizeof(float) * pcm.size());
  std::memcpy(out_buf, pcm.data(), sizeof(float) * pcm.size());
  *out = out_buf;
  *sr_out = stream_sr;
  *channels_out = stream_ch;
  return (long long)pcm.size();
}

}  // extern "C"
