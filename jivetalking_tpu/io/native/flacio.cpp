// flacio.cpp — from-scratch FLAC codec (decode + encode), C ABI for ctypes.
//
// Native host-side replacement for the reference's FLAC demux/decode/encode
// path (FFmpeg libavformat/libavcodec reached through cgo; ref:
// internal/audio/reader.go:29-170, internal/processor/encoder.go:21-142).
// The TPU framework streams PCM to/from the device; this codec owns the
// container work on the host.
//
// Decoder: full frame parsing — CONSTANT / VERBATIM / FIXED(0-4) / LPC(1-32)
// subframes, partitioned Rice residuals (4- and 5-bit params + escape),
// independent / left-side / right-side / mid-side channel assignments,
// 8/12/16/20/24-bit samples, fixed and variable blocking.  CRCs are parsed
// but not enforced (tolerant-reader policy, like the reference's lenient
// frame loop).
//
// Encoder: 16-bit PCM, 4096-sample frames (the reference's FLAC encoder
// settings: s16 compression_level=5, frame 4096; ref encoder.go:54-99).
// Per channel per frame the encoder plans CONSTANT, best FIXED (order 0-4)
// and windowed-autocorrelation LPC (Levinson-Durbin, orders up to 8,
// 15-bit quantised coefficients — the level-5 search space) and emits
// whichever costs the fewest EXACT bits; residuals use partitioned Rice
// with per-partition optimal parameter; correct CRC-8/CRC-16 and
// STREAMINFO (MD5 left zero = unknown, permitted by spec).
//
// Build: g++ -O2 -shared -fPIC flacio.cpp -o libflacio.so

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRCs (FLAC: CRC-8 poly 0x07, CRC-16 poly 0x8005, both init 0)
// ---------------------------------------------------------------------------

uint8_t crc8(const uint8_t* data, size_t len) {
  uint8_t crc = 0;
  for (size_t i = 0; i < len; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}

uint16_t crc16(const uint8_t* data, size_t len) {
  uint16_t crc = 0;
  for (size_t i = 0; i < len; ++i) {
    crc ^= (uint16_t)data[i] << 8;
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x8005) : (uint16_t)(crc << 1);
  }
  return crc;
}

// ---------------------------------------------------------------------------
// bit reader
// ---------------------------------------------------------------------------

struct BitReader {
  const uint8_t* data;
  size_t size;
  size_t byte_pos = 0;
  int bit_pos = 0;  // 0..7, MSB first
  bool error = false;

  BitReader(const uint8_t* d, size_t s) : data(d), size(s) {}

  bool eof() const { return byte_pos >= size; }

  uint32_t read_bit() {
    if (byte_pos >= size) { error = true; return 0; }
    uint32_t bit = (data[byte_pos] >> (7 - bit_pos)) & 1u;
    if (++bit_pos == 8) { bit_pos = 0; ++byte_pos; }
    return bit;
  }

  uint64_t read_bits(int n) {
    uint64_t v = 0;
    for (int i = 0; i < n; ++i) v = (v << 1) | read_bit();
    return v;
  }

  int64_t read_signed(int n) {
    uint64_t v = read_bits(n);
    if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ULL << n) - 1);  // sign extend
    return (int64_t)v;
  }

  uint32_t read_unary() {
    uint32_t q = 0;
    while (!error && read_bit() == 0) {
      if (++q > 1u << 24) { error = true; break; }  // corrupt guard
    }
    return q;
  }

  void align() {
    if (bit_pos) { bit_pos = 0; ++byte_pos; }
  }
};

// ---------------------------------------------------------------------------
// bit writer
// ---------------------------------------------------------------------------

struct BitWriter {
  std::vector<uint8_t> buf;
  uint8_t cur = 0;
  int nbits = 0;

  void write_bit(uint32_t b) {
    cur = (uint8_t)((cur << 1) | (b & 1));
    if (++nbits == 8) { buf.push_back(cur); cur = 0; nbits = 0; }
  }
  void write_bits(uint64_t v, int n) {
    for (int i = n - 1; i >= 0; --i) write_bit((uint32_t)((v >> i) & 1));
  }
  void write_unary(uint32_t q) {
    for (uint32_t i = 0; i < q; ++i) write_bit(0);
    write_bit(1);
  }
  void align_zero() {
    while (nbits) write_bit(0);
  }
};

// ---------------------------------------------------------------------------
// decoder
// ---------------------------------------------------------------------------

struct StreamInfo {
  uint32_t sample_rate = 0;
  int channels = 0;
  int bits = 0;
  uint64_t total_samples = 0;
};

// UTF-8-style coded number in frame headers (up to 36 bits)
bool read_utf8_u64(BitReader& br, uint64_t* out) {
  uint32_t b0 = (uint32_t)br.read_bits(8);
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) { *out = b0; return true; }
  else if ((b0 & 0xE0) == 0xC0) { v = b0 & 0x1F; extra = 1; }
  else if ((b0 & 0xF0) == 0xE0) { v = b0 & 0x0F; extra = 2; }
  else if ((b0 & 0xF8) == 0xF0) { v = b0 & 0x07; extra = 3; }
  else if ((b0 & 0xFC) == 0xF8) { v = b0 & 0x03; extra = 4; }
  else if ((b0 & 0xFE) == 0xFC) { v = b0 & 0x01; extra = 5; }
  else if (b0 == 0xFE) { v = 0; extra = 6; }
  else return false;
  for (int i = 0; i < extra; ++i) {
    uint32_t b = (uint32_t)br.read_bits(8);
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

// decode one partitioned-Rice residual into res[0..n)
bool read_residual(BitReader& br, int order, int blocksize, int32_t* res) {
  uint32_t method = (uint32_t)br.read_bits(2);
  if (method > 1) return false;
  int plen = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = (uint32_t)br.read_bits(4);
  uint32_t nparts = 1u << porder;
  if (blocksize % nparts) return false;
  int idx = 0;
  for (uint32_t p = 0; p < nparts; ++p) {
    int count = blocksize >> porder;
    if (p == 0) count -= order;
    if (count < 0) return false;
    uint32_t rice = (uint32_t)br.read_bits(plen);
    if (rice == escape) {
      uint32_t raw = (uint32_t)br.read_bits(5);
      for (int i = 0; i < count; ++i)
        res[idx++] = raw ? (int32_t)br.read_signed(raw) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint32_t q = br.read_unary();
        uint64_t r = rice ? br.read_bits(rice) : 0;
        uint64_t u = ((uint64_t)q << rice) | r;
        res[idx++] = (int32_t)((u >> 1) ^ (~(u & 1) + 1));  // unfold zigzag
        if (br.error) return false;
      }
    }
  }
  return !br.error;
}

void restore_fixed(int order, int blocksize, int64_t* s) {
  // s[] holds warmup in [0,order), residual in [order, blocksize)
  switch (order) {
    case 0: break;
    case 1:
      for (int i = order; i < blocksize; ++i) s[i] += s[i - 1];
      break;
    case 2:
      for (int i = order; i < blocksize; ++i) s[i] += 2 * s[i - 1] - s[i - 2];
      break;
    case 3:
      for (int i = order; i < blocksize; ++i)
        s[i] += 3 * s[i - 1] - 3 * s[i - 2] + s[i - 3];
      break;
    case 4:
      for (int i = order; i < blocksize; ++i)
        s[i] += 4 * s[i - 1] - 6 * s[i - 2] + 4 * s[i - 3] - s[i - 4];
      break;
  }
}

bool decode_subframe(BitReader& br, int blocksize, int bits, int64_t* out) {
  if (br.read_bit() != 0) return false;  // zero pad bit
  uint32_t type = (uint32_t)br.read_bits(6);
  int wasted = 0;
  if (br.read_bit()) {  // wasted-bits flag: unary count-1
    wasted = 1 + (int)br.read_unary();
  }
  bits -= wasted;
  if (bits <= 0 || bits > 33) return false;

  std::vector<int32_t> res(blocksize);

  if (type == 0) {  // CONSTANT
    int64_t v = br.read_signed(bits);
    for (int i = 0; i < blocksize; ++i) out[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (int i = 0; i < blocksize; ++i) out[i] = br.read_signed(bits);
  } else if ((type & 0x38) == 0x08 && (type & 0x07) <= 4) {  // FIXED
    int order = type & 0x07;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bits);
    if (!read_residual(br, order, blocksize, res.data())) return false;
    for (int i = order; i < blocksize; ++i) out[i] = res[i - order];
    restore_fixed(order, blocksize, out);
  } else if (type & 0x20) {  // LPC
    int order = (int)(type & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[i] = br.read_signed(bits);
    uint32_t prec = (uint32_t)br.read_bits(4);
    if (prec == 0xF) return false;
    int precision = (int)prec + 1;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (int i = 0; i < order; ++i) coef[i] = br.read_signed(precision);
    if (!read_residual(br, order, blocksize, res.data())) return false;
    for (int i = order; i < blocksize; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += coef[j] * out[i - 1 - j];
      out[i] = res[i - order] + (pred >> shift);
    }
  } else {
    return false;
  }

  if (wasted)
    for (int i = 0; i < blocksize; ++i) out[i] <<= wasted;
  return !br.error;
}

static const uint32_t kBlockSizes[16] = {
    0, 192, 576, 1152, 2304, 4608, 0, 0,
    256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
static const uint32_t kSampleRates[16] = {
    0, 88200, 176400, 192000, 8000, 16000, 22050, 24000,
    32000, 44100, 48000, 96000, 0, 0, 0, 0};
static const int kSampleBits[8] = {0, 8, 12, 0, 16, 20, 24, 32};

// Parse "fLaC" magic + metadata blocks; fills info, sets *start to the
// first audio frame byte.  Returns true on success.
bool parse_flac_header(const uint8_t* data, size_t size, StreamInfo* info,
                       size_t* start) {
  if (size < 42 || memcmp(data, "fLaC", 4) != 0) return false;
  size_t pos = 4;
  bool last = false;
  bool have_si = false;
  while (!last && pos + 4 <= size) {
    uint8_t hdr = data[pos];
    last = (hdr & 0x80) != 0;
    uint8_t type = hdr & 0x7F;
    uint32_t len = ((uint32_t)data[pos + 1] << 16) | ((uint32_t)data[pos + 2] << 8) |
                   data[pos + 3];
    pos += 4;
    if (type == 0 && len >= 34) {  // STREAMINFO
      const uint8_t* p = data + pos;
      info->sample_rate = ((uint32_t)p[10] << 12) | ((uint32_t)p[11] << 4) | (p[12] >> 4);
      info->channels = ((p[12] >> 1) & 0x7) + 1;
      info->bits = (((p[12] & 1) << 4) | (p[13] >> 4)) + 1;
      info->total_samples = ((uint64_t)(p[13] & 0x0F) << 32) | ((uint64_t)p[14] << 24) |
                            ((uint64_t)p[15] << 16) | ((uint64_t)p[16] << 8) | p[17];
      have_si = true;
    }
    pos += len;
  }
  if (!have_si || pos > size) return false;
  *start = pos;
  return true;
}

// Decode ONE audio frame into per-channel buffers.  Returns the blocksize
// (> 0), 0 on clean end of stream, -1 on error.
long decode_one_frame(BitReader& br, const StreamInfo& info,
                      std::vector<std::vector<int64_t>>& ch) {
  if (br.byte_pos >= br.size) return 0;
  uint32_t sync = (uint32_t)br.read_bits(14);
  if (br.error || br.eof()) return 0;
  if (sync != 0x3FFE) return -1;
  br.read_bit();  // reserved
  uint32_t variable = br.read_bit();
  uint32_t bs_code = (uint32_t)br.read_bits(4);
  uint32_t sr_code = (uint32_t)br.read_bits(4);
  uint32_t ch_code = (uint32_t)br.read_bits(4);
  uint32_t ss_code = (uint32_t)br.read_bits(3);
  br.read_bit();  // reserved
  uint64_t frame_no;
  if (!read_utf8_u64(br, &frame_no)) return -1;
  (void)variable;
  (void)frame_no;

  uint32_t blocksize;
  if (bs_code == 6) blocksize = (uint32_t)br.read_bits(8) + 1;
  else if (bs_code == 7) blocksize = (uint32_t)br.read_bits(16) + 1;
  else blocksize = kBlockSizes[bs_code];
  if (blocksize == 0) return -1;

  if (sr_code == 12) br.read_bits(8);
  else if (sr_code == 13 || sr_code == 14) br.read_bits(16);

  br.read_bits(8);  // CRC-8 (not enforced)

  int bits = ss_code ? kSampleBits[ss_code] : info.bits;
  if (!bits) return -1;

  int nch;
  int assign = 0;  // 0 independent, 1 L/S, 2 R/S, 3 M/S
  if (ch_code < 8) { nch = (int)ch_code + 1; }
  else if (ch_code == 8) { nch = 2; assign = 1; }
  else if (ch_code == 9) { nch = 2; assign = 2; }
  else if (ch_code == 10) { nch = 2; assign = 3; }
  else return -1;
  if (nch != info.channels) return -1;

  for (int c = 0; c < nch; ++c) {
    ch[c].assign(blocksize, 0);
    int sub_bits = bits;
    // side channel carries one extra bit
    if ((assign == 1 && c == 1) || (assign == 2 && c == 0) ||
        (assign == 3 && c == 1))
      sub_bits += 1;
    if (!decode_subframe(br, (int)blocksize, sub_bits, ch[c].data())) return -1;
  }
  br.align();
  br.read_bits(16);  // CRC-16 (not enforced)
  if (br.error) return -1;

  // undo stereo decorrelation
  if (assign == 1) {  // left/side: right = left - side
    for (uint32_t i = 0; i < blocksize; ++i) ch[1][i] = ch[0][i] - ch[1][i];
  } else if (assign == 2) {  // right/side: left = right + side
    for (uint32_t i = 0; i < blocksize; ++i) ch[0][i] = ch[1][i] + ch[0][i];
  } else if (assign == 3) {  // mid/side
    for (uint32_t i = 0; i < blocksize; ++i) {
      int64_t mid = ch[0][i];
      int64_t side = ch[1][i];
      mid = (mid << 1) | (side & 1);
      ch[0][i] = (mid + side) >> 1;
      ch[1][i] = (mid - side) >> 1;
    }
  }
  return (long)blocksize;
}

// returns samples decoded per channel, or -1 on error
long decode_stream(const uint8_t* data, size_t size, StreamInfo* info,
                   std::vector<int32_t>* pcm /* interleaved */) {
  size_t pos = 0;
  if (!parse_flac_header(data, size, info, &pos)) return -1;

  int channels = info->channels;
  pcm->clear();
  if (info->total_samples)
    pcm->reserve((size_t)info->total_samples * channels);

  BitReader br(data, size);
  br.byte_pos = pos;

  std::vector<std::vector<int64_t>> ch(channels);
  long total = 0;

  while (br.byte_pos < size) {
    long blocksize = decode_one_frame(br, *info, ch);
    if (blocksize == 0) break;
    if (blocksize < 0) return total ? total : -1;
    for (long i = 0; i < blocksize; ++i)
      for (int c = 0; c < channels; ++c)
        pcm->push_back((int32_t)ch[c][i]);
    total += blocksize;
    if (info->total_samples && (uint64_t)total >= info->total_samples) break;
  }
  return total;
}

// ---------------------------------------------------------------------------
// encoder (16-bit)
// ---------------------------------------------------------------------------

void compute_fixed_residual(const int32_t* x, int n, int order, int64_t* res) {
  switch (order) {
    case 0:
      for (int i = 0; i < n; ++i) res[i] = x[i];
      break;
    case 1:
      for (int i = order; i < n; ++i) res[i - order] = (int64_t)x[i] - x[i - 1];
      break;
    case 2:
      for (int i = order; i < n; ++i)
        res[i - order] = (int64_t)x[i] - 2 * x[i - 1] + x[i - 2];
      break;
    case 3:
      for (int i = order; i < n; ++i)
        res[i - order] = (int64_t)x[i] - 3 * x[i - 1] + 3 * x[i - 2] - x[i - 3];
      break;
    case 4:
      for (int i = order; i < n; ++i)
        res[i - order] = (int64_t)x[i] - 4 * x[i - 1] + 6 * x[i - 2] -
                         4 * x[i - 3] + x[i - 4];
      break;
  }
}

int best_rice_param(const int64_t* res, int n) {
  if (n == 0) return 0;
  uint64_t sum = 0;
  for (int i = 0; i < n; ++i) sum += res[i] < 0 ? (uint64_t)(-res[i]) : (uint64_t)res[i];
  uint64_t mean = sum / (uint64_t)n;
  int k = 0;
  while (k < 14 && (1ULL << (k + 1)) < mean + 1) ++k;
  return k;
}

void write_rice(BitWriter& bw, const int64_t* res, int n, int k) {
  for (int i = 0; i < n; ++i) {
    uint64_t u = (uint64_t)((res[i] << 1) ^ (res[i] >> 63));  // zigzag
    bw.write_unary((uint32_t)(u >> k));
    if (k) bw.write_bits(u & ((1ULL << k) - 1), k);
  }
}

uint64_t rice_bits(const int64_t* res, int n, int k) {
  uint64_t total = 0;
  for (int i = 0; i < n; ++i) {
    uint64_t u = (uint64_t)((res[i] << 1) ^ (res[i] >> 63));
    total += (u >> k) + 1 + k;
  }
  return total;
}

// Choose the partition order + per-partition Rice params for `res`
// (n total subframe samples, `order` warmup samples missing from the first
// partition).  Returns exact residual-section bit count.
uint64_t plan_partitions(const int64_t* res, int n, int order,
                         int* porder_out, std::vector<int>* ks_out) {
  int porder = 0;
  while (porder < 6 && (n >> (porder + 1)) >= 256 && (n % (1 << (porder + 1))) == 0)
    ++porder;
  while (porder > 0 && (n >> porder) <= order) --porder;
  int nparts = 1 << porder;
  ks_out->assign(nparts, 0);
  uint64_t bits = 2 + 4;   // method + porder fields
  int idx = 0;
  for (int p = 0; p < nparts; ++p) {
    int count = (n >> porder) - (p == 0 ? order : 0);
    int k = best_rice_param(res + idx, count);
    if (k > 14) k = 14;
    // refine around the mean-derived estimate (exact counting)
    uint64_t best = rice_bits(res + idx, count, k);
    for (int dk = -1; dk <= 1; dk += 2) {
      int kk = k + dk;
      if (kk < 0 || kk > 14) continue;
      uint64_t b = rice_bits(res + idx, count, kk);
      if (b < best) { best = b; k = kk; }
    }
    (*ks_out)[p] = k;
    bits += 4 + best;
    idx += count;
  }
  *porder_out = porder;
  return bits;
}

struct SubframePlan {
  int type = 0;            // 0 constant, 1 fixed, 2 lpc
  int order = 0;
  int precision = 0;       // lpc coefficient precision
  int shift = 0;           // lpc quantisation shift
  int32_t qlp[32] = {0};
  std::vector<int64_t> res;
  int porder = 0;
  std::vector<int> ks;
  uint64_t bits = UINT64_MAX;   // total subframe bits (excl. 1 pad bit)
};

void plan_fixed(const int32_t* x, int n, int bits_per_sample, SubframePlan* out) {
  std::vector<int64_t> res(n);
  int max_order = n > 4 ? 4 : (n > 0 ? n - 1 : 0);
  for (int order = 0; order <= max_order; ++order) {
    compute_fixed_residual(x, n, order, res.data());
    int m = n - order;
    int porder;
    std::vector<int> ks;
    uint64_t rbits = plan_partitions(res.data(), n, order, &porder, &ks);
    uint64_t total = 6 + 1 + (uint64_t)order * bits_per_sample + rbits;
    if (total < out->bits) {
      out->type = 1;
      out->order = order;
      out->res.assign(res.begin(), res.begin() + m);
      out->porder = porder;
      out->ks = ks;
      out->bits = total;
    }
  }
}

// Levinson-Durbin on Welch-windowed autocorrelation; FLAC convention:
// x_hat[i] = sum_j a[j] * x[i-j], res = x - (sum qlp[j]*x[i-1-j]) >> shift.
void plan_lpc(const int32_t* x, int n, int bits_per_sample, SubframePlan* out) {
  const int kMaxOrder = 8;       // libFLAC compression_level=5 search depth
  const int kPrecision = 15;
  if (n <= 2 * kMaxOrder) return;

  double ac[kMaxOrder + 1];
  {
    std::vector<double> w(n);
    for (int i = 0; i < n; ++i) {
      double t = (i - (n - 1) / 2.0) / ((n + 1) / 2.0);
      w[i] = (double)x[i] * (1.0 - t * t);   // Welch window
    }
    for (int lag = 0; lag <= kMaxOrder; ++lag) {
      double s = 0.0;
      for (int i = lag; i < n; ++i) s += w[i] * w[i - lag];
      ac[lag] = s;
    }
  }
  if (ac[0] <= 0.0) return;

  double a[kMaxOrder + 1] = {0};
  double lpc[kMaxOrder][kMaxOrder];
  double e = ac[0];
  int computed = 0;
  for (int m = 1; m <= kMaxOrder; ++m) {
    double k = ac[m];
    for (int j = 1; j < m; ++j) k -= a[j] * ac[m - j];
    k /= e;
    double tmp[kMaxOrder + 1];
    for (int j = 1; j < m; ++j) tmp[j] = a[j] - k * a[m - j];
    for (int j = 1; j < m; ++j) a[j] = tmp[j];
    a[m] = k;
    e *= (1.0 - k * k);
    for (int j = 1; j <= m; ++j) lpc[m - 1][j - 1] = a[j];
    computed = m;
    if (e <= 0.0) break;
  }

  std::vector<int64_t> res(n);
  // try a small ladder of orders (the estimate-vs-exact tradeoff libFLAC's
  // level 5 makes); exact bit counting decides
  const int try_orders[] = {2, 4, 6, 8};
  for (int oi = 0; oi < 4; ++oi) {
    int order = try_orders[oi];
    if (order > computed) break;
    const double* coefs = lpc[order - 1];
    double cmax = 0.0;
    for (int j = 0; j < order; ++j) {
      double c = std::fabs(coefs[j]);
      if (c > cmax) cmax = c;
    }
    if (cmax <= 0.0) continue;
    int log2cmax;
    std::frexp(cmax, &log2cmax);                 // cmax in [2^(l-1), 2^l)
    int shift = kPrecision - 1 - log2cmax;
    if (shift > 15) shift = 15;                  // 5-bit field, non-negative
    if (shift < 0) continue;
    int32_t qlp[kMaxOrder];
    double err = 0.0;                            // error-feedback quantiser
    const int32_t qmax = (1 << (kPrecision - 1)) - 1;
    const int32_t qmin = -(1 << (kPrecision - 1));
    for (int j = 0; j < order; ++j) {
      double v = coefs[j] * (double)(1 << shift) + err;
      int32_t q = (int32_t)std::lround(v);
      if (q > qmax) q = qmax;
      if (q < qmin) q = qmin;
      err = v - q;
      qlp[j] = q;
    }
    for (int i = order; i < n; ++i) {
      int64_t pred = 0;
      for (int j = 0; j < order; ++j) pred += (int64_t)qlp[j] * x[i - 1 - j];
      res[i - order] = (int64_t)x[i] - (pred >> shift);
    }
    int porder;
    std::vector<int> ks;
    uint64_t rbits = plan_partitions(res.data(), n, order, &porder, &ks);
    uint64_t total = 6 + 1 + (uint64_t)order * bits_per_sample + 4 + 5 +
                     (uint64_t)order * kPrecision + rbits;
    if (total < out->bits) {
      out->type = 2;
      out->order = order;
      out->precision = kPrecision;
      out->shift = shift;
      for (int j = 0; j < order; ++j) out->qlp[j] = qlp[j];
      out->res.assign(res.begin(), res.begin() + (n - order));
      out->porder = porder;
      out->ks = ks;
      out->bits = total;
    }
  }
}

void write_partitions(BitWriter& bw, const SubframePlan& plan, int n) {
  bw.write_bits(0, 2);       // rice method 0 (4-bit params)
  bw.write_bits((uint64_t)plan.porder, 4);
  int nparts = 1 << plan.porder;
  int idx = 0;
  for (int p = 0; p < nparts; ++p) {
    int count = (n >> plan.porder) - (p == 0 ? plan.order : 0);
    bw.write_bits((uint64_t)plan.ks[p], 4);
    write_rice(bw, plan.res.data() + idx, count, plan.ks[p]);
    idx += count;
  }
}

void encode_subframe(BitWriter& bw, const int32_t* x, int n, int bits) {
  // CONSTANT?
  bool constant = true;
  for (int i = 1; i < n; ++i)
    if (x[i] != x[0]) { constant = false; break; }
  if (constant) {
    bw.write_bits(0, 1);       // pad
    bw.write_bits(0, 6);       // type CONSTANT
    bw.write_bits(0, 1);       // no wasted bits
    bw.write_bits((uint64_t)(uint32_t)x[0] & ((1ULL << bits) - 1), bits);
    return;
  }

  SubframePlan plan;
  plan_fixed(x, n, bits, &plan);
  plan_lpc(x, n, bits, &plan);

  bw.write_bits(0, 1);                        // pad
  if (plan.type == 2) {
    bw.write_bits(0x20 | (uint32_t)(plan.order - 1), 6);   // LPC type
    bw.write_bits(0, 1);                      // no wasted bits
    for (int i = 0; i < plan.order; ++i)
      bw.write_bits((uint64_t)(uint32_t)x[i] & ((1ULL << bits) - 1), bits);
    bw.write_bits((uint64_t)(plan.precision - 1), 4);
    bw.write_bits((uint64_t)plan.shift, 5);
    for (int j = 0; j < plan.order; ++j)
      bw.write_bits((uint64_t)(uint32_t)plan.qlp[j] &
                        ((1ULL << plan.precision) - 1),
                    plan.precision);
  } else {
    bw.write_bits(0x08 | (uint32_t)plan.order, 6);         // FIXED type
    bw.write_bits(0, 1);                      // no wasted bits
    for (int i = 0; i < plan.order; ++i)
      bw.write_bits((uint64_t)(uint32_t)x[i] & ((1ULL << bits) - 1), bits);
  }
  write_partitions(bw, plan, n);
}

void write_utf8_u64(std::vector<uint8_t>& out, uint64_t v) {
  if (v < 0x80) { out.push_back((uint8_t)v); return; }
  int nbytes = 1;
  uint64_t t = v;
  while (t >>= 6) ++nbytes;  // rough count of 6-bit groups
  // FLAC uses the UTF-8 pattern extended to 7 bytes
  static const int lead_bits[8] = {0, 0, 5, 4, 3, 2, 1, 0};
  int total;
  if (v < (1ULL << 11)) total = 2;
  else if (v < (1ULL << 16)) total = 3;
  else if (v < (1ULL << 21)) total = 4;
  else if (v < (1ULL << 26)) total = 5;
  else if (v < (1ULL << 31)) total = 6;
  else total = 7;
  (void)lead_bits;
  (void)nbytes;
  uint8_t lead;
  switch (total) {
    case 2: lead = 0xC0; break;
    case 3: lead = 0xE0; break;
    case 4: lead = 0xF0; break;
    case 5: lead = 0xF8; break;
    case 6: lead = 0xFC; break;
    default: lead = 0xFE; break;
  }
  int shift = 6 * (total - 1);
  out.push_back((uint8_t)(lead | (v >> shift)));
  for (int i = total - 2; i >= 0; --i)
    out.push_back((uint8_t)(0x80 | ((v >> (6 * i)) & 0x3F)));
}

int encode_stream(const int16_t* pcm, long n_samples, int channels,
                  uint32_t sample_rate, std::vector<uint8_t>* out) {
  const int kFrame = 4096;
  const int bits = 16;

  out->clear();
  out->insert(out->end(), {'f', 'L', 'a', 'C'});

  // STREAMINFO (last metadata block)
  uint8_t si[38] = {0};
  si[0] = 0x80;  // last-block | type 0
  si[3] = 34;    // length
  uint8_t* p = si + 4;
  uint32_t last_bs = (uint32_t)(n_samples % kFrame);
  uint32_t minbs = n_samples >= kFrame ? kFrame : (last_bs ? last_bs : kFrame);
  uint32_t maxbs = n_samples >= kFrame ? kFrame : minbs;
  p[0] = minbs >> 8; p[1] = minbs & 0xFF;
  p[2] = maxbs >> 8; p[3] = maxbs & 0xFF;
  // min/max framesize unknown (0)
  p[10] = (uint8_t)(sample_rate >> 12);
  p[11] = (uint8_t)(sample_rate >> 4);
  p[12] = (uint8_t)(((sample_rate & 0xF) << 4) | (((channels - 1) & 0x7) << 1) |
                    (((bits - 1) >> 4) & 1));
  p[13] = (uint8_t)((((bits - 1) & 0xF) << 4) | ((n_samples >> 32) & 0x0F));
  p[14] = (uint8_t)(n_samples >> 24);
  p[15] = (uint8_t)(n_samples >> 16);
  p[16] = (uint8_t)(n_samples >> 8);
  p[17] = (uint8_t)(n_samples);
  // MD5 left zero (unknown)
  out->insert(out->end(), si, si + 38);

  std::vector<int32_t> chbuf;
  uint64_t frame_index = 0;
  for (long start = 0; start < n_samples; start += kFrame, ++frame_index) {
    int bs = (int)(n_samples - start < kFrame ? n_samples - start : kFrame);

    // frame header
    std::vector<uint8_t> hdr;
    BitWriter hw;
    hw.write_bits(0x3FFE, 14);  // sync
    hw.write_bit(0);            // reserved
    hw.write_bit(0);            // fixed blocksize strategy
    uint32_t bs_code;
    bool bs16 = false;
    if (bs == 4096) bs_code = 12;
    else if (bs == 192) bs_code = 1;
    else { bs_code = 7; bs16 = true; }
    hw.write_bits(bs_code, 4);
    uint32_t sr_code;
    bool sr16 = false;
    if (sample_rate == 44100) sr_code = 9;
    else if (sample_rate == 48000) sr_code = 10;
    else if (sample_rate == 32000) sr_code = 8;
    else if (sample_rate == 96000) sr_code = 11;
    else if (sample_rate == 22050) sr_code = 6;
    else if (sample_rate == 24000) sr_code = 7;
    else if (sample_rate == 16000) sr_code = 5;
    else if (sample_rate == 8000) sr_code = 4;
    else { sr_code = 13; sr16 = true; }
    hw.write_bits(sr_code, 4);
    hw.write_bits((uint32_t)(channels - 1), 4);  // independent channels
    hw.write_bits(4, 3);                         // 16-bit
    hw.write_bit(0);                             // reserved
    hw.align_zero();
    hdr = hw.buf;
    write_utf8_u64(hdr, frame_index);
    if (bs16) {
      hdr.push_back((uint8_t)((bs - 1) >> 8));
      hdr.push_back((uint8_t)((bs - 1) & 0xFF));
    }
    if (sr16) {
      hdr.push_back((uint8_t)(sample_rate >> 8));
      hdr.push_back((uint8_t)(sample_rate & 0xFF));
    }
    hdr.push_back(crc8(hdr.data(), hdr.size()));

    // subframes
    BitWriter bw;
    for (int c = 0; c < channels; ++c) {
      chbuf.resize(bs);
      for (int i = 0; i < bs; ++i)
        chbuf[i] = pcm[(start + i) * channels + c];
      encode_subframe(bw, chbuf.data(), bs, bits);
    }
    bw.align_zero();

    std::vector<uint8_t> frame(hdr);
    frame.insert(frame.end(), bw.buf.begin(), bw.buf.end());
    uint16_t c16 = crc16(frame.data(), frame.size());
    frame.push_back((uint8_t)(c16 >> 8));
    frame.push_back((uint8_t)(c16 & 0xFF));
    out->insert(out->end(), frame.begin(), frame.end());
  }
  return 0;
}

std::vector<uint8_t> read_file(const char* path, bool* ok) {
  *ok = false;
  FILE* f = fopen(path, "rb");
  if (!f) return {};
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> data((size_t)sz);
  if (sz && fread(data.data(), 1, (size_t)sz, f) != (size_t)sz) {
    fclose(f);
    return {};
  }
  fclose(f);
  *ok = true;
  return data;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Decode a FLAC file.  On success returns samples-per-channel and fills the
// out params; *pcm_out is malloc'd interleaved int32 (caller frees with
// flac_free).  Returns -1 on failure.
long flac_decode_file(const char* path, int32_t** pcm_out, int* channels,
                      int* sample_rate, int* bits) {
  bool ok;
  std::vector<uint8_t> data = read_file(path, &ok);
  if (!ok) return -1;
  StreamInfo info;
  std::vector<int32_t> pcm;
  long n = decode_stream(data.data(), data.size(), &info, &pcm);
  if (n < 0) return -1;
  *channels = info.channels;
  *sample_rate = (int)info.sample_rate;
  *bits = info.bits;
  int32_t* buf = (int32_t*)malloc(pcm.size() * sizeof(int32_t));
  if (!buf) return -1;
  memcpy(buf, pcm.data(), pcm.size() * sizeof(int32_t));
  *pcm_out = buf;
  return n;
}

// Encode interleaved 16-bit PCM to a FLAC file.  Returns 0 on success.
int flac_encode_file(const char* path, const int16_t* pcm, long n_samples,
                     int channels, int sample_rate) {
  std::vector<uint8_t> out;
  if (encode_stream(pcm, n_samples, channels, (uint32_t)sample_rate, &out) != 0)
    return -1;
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  size_t written = fwrite(out.data(), 1, out.size(), f);
  fclose(f);
  return written == out.size() ? 0 : -1;
}

void flac_free(void* p) { free(p); }

// ---------------------------------------------------------------------------
// streaming decoder: O(frame) host memory for hour-scale inputs (the
// reference's audio reader decodes frame by frame, reader.go:129-170;
// this is its bounded-memory equivalent — the compressed bytes stay
// mapped, decoded PCM leaves in caller-sized chunks)
// ---------------------------------------------------------------------------

struct FlacStream {
  std::vector<uint8_t> data;
  StreamInfo info;
  size_t byte_pos = 0;
  int bit_pos = 0;
  std::vector<std::vector<int64_t>> ch;
  std::vector<int32_t> pending;  // interleaved leftover from the last frame
  size_t pending_pos = 0;        // in int32 units
  long decoded = 0;              // per-channel samples handed out
  bool done = false;
  bool error = false;            // mid-stream frame decode failure
};

// Open for streaming; fills the stream parameters.  NULL on failure.
void* flac_open_stream(const char* path, int* channels, int* sample_rate,
                       int* bits, long* total_samples) {
  bool ok;
  FlacStream* s = new FlacStream();
  s->data = read_file(path, &ok);
  size_t start = 0;
  if (!ok || !parse_flac_header(s->data.data(), s->data.size(), &s->info, &start)) {
    delete s;
    return nullptr;
  }
  s->byte_pos = start;
  s->ch.resize(s->info.channels);
  *channels = s->info.channels;
  *sample_rate = (int)s->info.sample_rate;
  *bits = s->info.bits;
  *total_samples = (long)s->info.total_samples;
  return s;
}

// Decode up to max_samples per-channel samples into `out` (interleaved
// int32, capacity max_samples * channels).  Returns per-channel samples
// written; 0 at end of stream; -1 on error.
long flac_read_stream(void* handle, int32_t* out, long max_samples) {
  FlacStream* s = (FlacStream*)handle;
  if (!s || max_samples <= 0) return -1;
  // a mid-stream frame error is NOT a clean EOF: earlier reads may have
  // returned the frames before the damage (a short read), but every read
  // after the error must fail so the caller reports the file instead of
  // silently mastering the claimed duration with the remainder as silence
  if (s->error) return -1;
  const int nch = s->info.channels;
  long written = 0;  // per-channel samples

  // drain the pending remainder first
  if (s->pending_pos < s->pending.size()) {
    long avail = (long)(s->pending.size() - s->pending_pos) / nch;
    long take = avail < max_samples ? avail : max_samples;
    memcpy(out, s->pending.data() + s->pending_pos,
           (size_t)take * nch * sizeof(int32_t));
    s->pending_pos += (size_t)take * nch;
    written += take;
    if (s->pending_pos >= s->pending.size()) {
      s->pending.clear();
      s->pending_pos = 0;
    }
  }

  BitReader br(s->data.data(), s->data.size());
  br.byte_pos = s->byte_pos;
  br.bit_pos = s->bit_pos;

  while (written < max_samples && !s->done) {
    if (s->info.total_samples &&
        (uint64_t)(s->decoded + written) >= s->info.total_samples) {
      s->done = true;
      break;
    }
    long blocksize = decode_one_frame(br, s->info, s->ch);
    if (blocksize == 0) { s->done = true; break; }
    if (blocksize < 0) {
      s->done = true;
      s->error = true;           // the NEXT read returns -1 (see above)
      if (written == 0) return -1;
      break;
    }
    long fit = max_samples - written;
    long take = blocksize < fit ? blocksize : fit;
    for (long i = 0; i < take; ++i)
      for (int c = 0; c < nch; ++c)
        out[(written + i) * nch + c] = (int32_t)s->ch[c][i];
    if (take < blocksize) {
      s->pending.reserve((size_t)(blocksize - take) * nch);
      for (long i = take; i < blocksize; ++i)
        for (int c = 0; c < nch; ++c)
          s->pending.push_back((int32_t)s->ch[c][i]);
      s->pending_pos = 0;
    }
    written += take;
    s->byte_pos = br.byte_pos;
    s->bit_pos = br.bit_pos;
  }

  s->decoded += written;
  return written;
}

void flac_close_stream(void* handle) { delete (FlacStream*)handle; }

}  // extern "C"
