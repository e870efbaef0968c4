// Native audio loader: multithreaded WAV + FLAC decode + polyphase resample.
//
// Host-side I/O component of the TPU codec framework (the reference delegates
// to torchaudio's C++ kernels via utils/helpers.py:77-93; this is the
// framework's own native equivalent).  Exposed through a C ABI consumed with
// ctypes (simwhisper_codec_tpu/utils/native_loader.py).
//
// Capabilities:
//  - RIFF/WAVE parsing: PCM 8/16/24/32-bit and IEEE float32, any channel
//    count (averaged to mono, matching the reference's mean-mix).
//  - FLAC decoding (full streamable subset: CONSTANT/VERBATIM/FIXED/LPC
//    subframes, Rice methods 0/1 + escapes, all stereo decorrelation modes,
//    8/16/24-bit, CRC-8/CRC-16 verification) — bit-exact twin of the pure-
//    Python decoder in simwhisper_codec_tpu/utils/flac.py, cross-checked in
//    tests/test_flac.py.  The reference reads flac via torchaudio
//    (utils/helpers.py:77-93); LibriSpeech test-clean ships as .flac.
//  - torchaudio-equivalent sinc_interp_hann polyphase resampling
//    (lowpass_filter_width=6, rolloff=0.99), matching
//    simwhisper_codec_tpu/utils/audio_io.py::resample.
//  - Batch API decoding many files across a std::thread pool.
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -o libaudioloader.so audioloader.cpp -lpthread

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
  bool ok = false;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

Wav decode_wav_file(const char* path) {
  Wav out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 44) {
    std::fclose(f);
    return out;
  }
  std::vector<uint8_t> buf((size_t)size);
  if (std::fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return out;
  }
  std::fclose(f);

  if (std::memcmp(buf.data(), "RIFF", 4) != 0 || std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return out;

  uint16_t format = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* data = nullptr;
  uint32_t data_len = 0;

  size_t pos = 12;
  while (pos + 8 <= (size_t)size) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > (size_t)size) chunk_len = (uint32_t)size - (uint32_t)pos - 8;
    if (std::memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      format = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (format == 0xFFFE && chunk_len >= 40) format = rd_u16(body + 24);  // extensible
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  if (!data || !rate || !channels || !bits) return out;

  size_t bytes_per = bits / 8;
  size_t n_frames = data_len / (bytes_per * channels);
  out.samples.resize(n_frames);
  const float inv_ch = 1.0f / (float)channels;

  for (size_t i = 0; i < n_frames; ++i) {
    float acc = 0.f;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* p = data + (i * channels + c) * bytes_per;
      float v = 0.f;
      if (format == 3 && bits == 32) {  // IEEE float
        float fv;
        std::memcpy(&fv, p, 4);
        v = fv;
      } else if (bits == 16) {
        int16_t s = (int16_t)rd_u16(p);
        v = (float)s / 32768.0f;
      } else if (bits == 24) {
        int32_t s = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 | (uint32_t)p[2] << 24) >> 8;
        v = (float)s / 8388608.0f;
      } else if (bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = (float)s / 2147483648.0f;
      } else if (bits == 8) {
        v = ((float)p[0] - 128.0f) / 128.0f;
      }
      acc += v;
    }
    out.samples[i] = acc * inv_ch;
  }
  out.sample_rate = (int)rate;
  out.ok = true;
  return out;
}

// --------------------------------------------------------------------------
// FLAC decoder (twin of simwhisper_codec_tpu/utils/flac.py)
// --------------------------------------------------------------------------

struct CrcTables {
  uint8_t crc8[256];
  uint16_t crc16[256];
  CrcTables() {
    for (int i = 0; i < 256; ++i) {
      uint32_t c8 = (uint32_t)i;
      for (int k = 0; k < 8; ++k) c8 = (c8 & 0x80) ? ((c8 << 1) ^ 0x07) : (c8 << 1);
      crc8[i] = (uint8_t)c8;
      uint32_t c16 = (uint32_t)i << 8;
      for (int k = 0; k < 8; ++k) c16 = (c16 & 0x8000) ? ((c16 << 1) ^ 0x8005) : (c16 << 1);
      crc16[i] = (uint16_t)c16;
    }
  }
};
const CrcTables kCrc;

uint8_t flac_crc8(const uint8_t* p, size_t n) {
  uint8_t c = 0;
  for (size_t i = 0; i < n; ++i) c = kCrc.crc8[c ^ p[i]];
  return c;
}
uint16_t flac_crc16(const uint8_t* p, size_t n) {
  uint16_t c = 0;
  for (size_t i = 0; i < n; ++i) c = (uint16_t)(kCrc.crc16[(c >> 8) ^ p[i]] ^ (c << 8));
  return c;
}

struct FlacBitReader {
  const uint8_t* data;
  size_t size_bits;
  size_t pos = 0;  // bit position
  bool fail = false;

  FlacBitReader(const uint8_t* d, size_t size_bytes, size_t pos_bytes)
      : data(d), size_bits(size_bytes * 8), pos(pos_bytes * 8) {}

  uint64_t read(int n) {
    if (pos + (size_t)n > size_bits) { fail = true; return 0; }
    uint64_t out = 0;
    size_t p = pos;
    int left = n;
    while (left > 0) {
      uint8_t byte = data[p >> 3];
      int avail = 8 - (int)(p & 7);
      int take = avail < left ? avail : left;
      int shift = avail - take;
      out = (out << take) | (uint64_t)((byte >> shift) & ((1u << take) - 1));
      p += (size_t)take;
      left -= take;
    }
    pos = p;
    return out;
  }

  int64_t read_signed(int n) {
    uint64_t v = read(n);
    if (n > 0 && (v & (1ull << (n - 1)))) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  int read_unary() {
    int count = 0;
    while (true) {
      if (pos >= size_bits) { fail = true; return 0; }
      uint8_t byte = data[pos >> 3];
      int rem = 8 - (int)(pos & 7);
      uint8_t chunk = byte & ((1u << rem) - 1);
      if (chunk == 0) { count += rem; pos += (size_t)rem; continue; }
      int bl = 32 - __builtin_clz((uint32_t)chunk);
      int lead = rem - bl;
      count += lead;
      pos += (size_t)(lead + 1);
      return count;
    }
  }

  void align() { pos = (pos + 7) & ~(size_t)7; }
  size_t byte_pos() const { return pos >> 3; }
};

const int kFlacBlockSizes[16] = {0, 192, 576, 1152, 2304, 4608, -1, -2,
                                 256, 512, 1024, 2048, 4096, 8192, 16384, 32768};
const int kFlacSampleRates[16] = {0, 88200, 176400, 192000, 8000, 16000, 22050,
                                  24000, 32000, 44100, 48000, 96000, -1, -2, -3, -4};
const int kFlacSampleSizes[8] = {0, 8, 12, -1, 16, 20, 24, 32};

bool flac_read_utf8(FlacBitReader& br, uint64_t* out) {
  uint64_t first = br.read(8);
  if (br.fail) return false;
  if (first < 0x80) { *out = first; return true; }
  int n_extra = 0;
  uint64_t mask = 0x40;
  while (first & mask) { ++n_extra; mask >>= 1; }
  if (n_extra == 0 || n_extra > 6) return false;
  uint64_t value = first & (mask - 1);
  for (int i = 0; i < n_extra; ++i) {
    uint64_t b = br.read(8);
    if (br.fail || (b & 0xC0) != 0x80) return false;
    value = (value << 6) | (b & 0x3F);
  }
  *out = value;
  return true;
}

bool flac_decode_residual(FlacBitReader& br, int block_size, int order,
                          std::vector<int64_t>& out) {
  int method = (int)br.read(2);
  if (br.fail || method > 1) return false;
  int plen = 4 + method;
  uint32_t escape = (1u << plen) - 1;
  int part_order = (int)br.read(4);
  int n_parts = 1 << part_order;
  if (block_size % n_parts) return false;
  int part_samples = block_size >> part_order;
  out.resize((size_t)(block_size - order));
  size_t idx = 0;
  for (int p = 0; p < n_parts; ++p) {
    int count = part_samples - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = (uint32_t)br.read(plen);
    if (param == escape) {
      int raw_bits = (int)br.read(5);
      for (int i = 0; i < count; ++i)
        out[idx + (size_t)i] = raw_bits ? br.read_signed(raw_bits) : 0;
    } else {
      for (int i = 0; i < count; ++i) {
        uint64_t q = (uint64_t)br.read_unary();
        uint64_t u = param ? ((q << param) | br.read((int)param)) : q;
        out[idx + (size_t)i] = (int64_t)(u >> 1) ^ -(int64_t)(u & 1);
      }
    }
    idx += (size_t)count;
    if (br.fail) return false;
  }
  return true;
}

const int kFixedCoeffs[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool flac_decode_subframe(FlacBitReader& br, int block_size, int bps,
                          std::vector<int64_t>& out) {
  if (br.read(1)) return false;  // padding bit
  int stype = (int)br.read(6);
  int wasted = 0;
  if (br.read(1)) { wasted = br.read_unary() + 1; bps -= wasted; }
  if (br.fail || bps <= 0) return false;
  out.assign((size_t)block_size, 0);
  std::vector<int64_t> res;
  if (stype == 0) {  // CONSTANT
    int64_t v = br.read_signed(bps);
    for (auto& o : out) o = v;
  } else if (stype == 1) {  // VERBATIM
    for (int i = 0; i < block_size; ++i) out[(size_t)i] = br.read_signed(bps);
  } else if (stype >= 8 && stype <= 12) {  // FIXED
    int order = stype - 8;
    for (int i = 0; i < order; ++i) out[(size_t)i] = br.read_signed(bps);
    if (!flac_decode_residual(br, block_size, order, res)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = res[(size_t)(i - order)];
      for (int j = 0; j < order; ++j) acc += kFixedCoeffs[order][j] * out[(size_t)(i - 1 - j)];
      out[(size_t)i] = acc;
    }
  } else if (stype >= 32) {  // LPC
    int order = (stype & 0x1F) + 1;
    for (int i = 0; i < order; ++i) out[(size_t)i] = br.read_signed(bps);
    int prec = (int)br.read(4) + 1;
    if (prec == 16) return false;
    int shift = (int)br.read_signed(5);
    if (shift < 0) return false;
    std::vector<int64_t> coeffs((size_t)order);
    for (int i = 0; i < order; ++i) coeffs[(size_t)i] = br.read_signed(prec);
    if (!flac_decode_residual(br, block_size, order, res)) return false;
    for (int i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (int j = 0; j < order; ++j) acc += coeffs[(size_t)j] * out[(size_t)(i - 1 - j)];
      out[(size_t)i] = (acc >> shift) + res[(size_t)(i - order)];
    }
  } else {
    return false;  // reserved
  }
  if (br.fail) return false;
  if (wasted) for (auto& o : out) o <<= wasted;
  return true;
}

// Decode a whole FLAC stream to mono float (channel mean), like the WAV path.
Wav decode_flac_buffer(const std::vector<uint8_t>& buf) {
  Wav out;
  size_t pos = 0;
  // skip prepended ID3v2 tags (syncsafe size), matching the Python decoder
  while (pos + 10 <= buf.size() && std::memcmp(buf.data() + pos, "ID3", 3) == 0) {
    size_t size = ((size_t)(buf[pos + 6] & 0x7F) << 21) |
                  ((size_t)(buf[pos + 7] & 0x7F) << 14) |
                  ((size_t)(buf[pos + 8] & 0x7F) << 7) |
                  (size_t)(buf[pos + 9] & 0x7F);
    pos += 10 + size;
  }
  if (pos + 42 > buf.size() || std::memcmp(buf.data() + pos, "fLaC", 4) != 0)
    return out;
  pos += 4;
  int si_rate = 0, si_channels = 0, si_bps = 0;
  uint64_t total_samples = 0;
  bool have_si = false, last = false;
  while (!last) {
    if (pos + 4 > buf.size()) return out;
    uint8_t hdr = buf[pos];
    last = (hdr & 0x80) != 0;
    int btype = hdr & 0x7F;
    uint32_t length = ((uint32_t)buf[pos + 1] << 16) | ((uint32_t)buf[pos + 2] << 8) |
                      (uint32_t)buf[pos + 3];
    if (pos + 4 + length > buf.size()) return out;
    if (btype == 0 && length >= 34) {
      FlacBitReader br(buf.data() + pos + 4, length, 0);
      br.read(16); br.read(16); br.read(24); br.read(24);
      si_rate = (int)br.read(20);
      si_channels = (int)br.read(3) + 1;
      si_bps = (int)br.read(5) + 1;
      total_samples = br.read(36);
      have_si = true;
    }
    pos += 4 + length;
  }
  if (!have_si || si_rate <= 0) return out;

  std::vector<std::vector<int64_t>> chans;
  std::vector<int64_t> a, b;
  std::vector<float> mono;
  const float scale = 1.0f / (float)(1ll << (si_bps - 1));
  int sample_rate = si_rate;

  while (pos < buf.size()) {
    // stop at STREAMINFO's sample count when known: tolerate trailing junk
    // (e.g. an appended ID3v1 'TAG' block) like real decoders do
    if (total_samples && mono.size() >= total_samples) break;
    FlacBitReader br(buf.data(), buf.size(), pos);
    if (br.read(14) != 0x3FFE) return out;
    if (br.read(1)) return out;
    br.read(1);  // blocking strategy
    int bs_code = (int)br.read(4);
    int sr_code = (int)br.read(4);
    int ch_code = (int)br.read(4);
    int ss_code = (int)br.read(3);
    if (br.read(1)) return out;
    uint64_t fn;
    if (!flac_read_utf8(br, &fn)) return out;

    int block_size;
    if (bs_code == 0) return out;
    else if (bs_code == 6) block_size = (int)br.read(8) + 1;
    else if (bs_code == 7) block_size = (int)br.read(16) + 1;
    else block_size = kFlacBlockSizes[bs_code];

    if (sr_code == 12) sample_rate = (int)br.read(8) * 1000;
    else if (sr_code == 13) sample_rate = (int)br.read(16);
    else if (sr_code == 14) sample_rate = (int)br.read(16) * 10;
    else if (sr_code == 15) return out;
    else if (sr_code) sample_rate = kFlacSampleRates[sr_code];
    else sample_rate = si_rate;

    int bps = ss_code == 0 ? si_bps : kFlacSampleSizes[ss_code];
    if (bps <= 0) return out;

    size_t header_end = br.byte_pos();
    uint32_t header_crc = (uint32_t)br.read(8);
    if (flac_crc8(buf.data() + pos, header_end - pos) != header_crc) return out;

    int n_ch;
    if (ch_code < 8) {
      n_ch = ch_code + 1;
      chans.assign((size_t)n_ch, {});
      for (int c = 0; c < n_ch; ++c)
        if (!flac_decode_subframe(br, block_size, bps, chans[(size_t)c])) return out;
    } else if (ch_code <= 10) {
      n_ch = 2;
      chans.assign(2, {});
      int extra_a = (ch_code == 9) ? 1 : 0;
      int extra_b = (ch_code == 9) ? 0 : 1;
      if (!flac_decode_subframe(br, block_size, bps + extra_a, a)) return out;
      if (!flac_decode_subframe(br, block_size, bps + extra_b, b)) return out;
      chans[0].resize((size_t)block_size);
      chans[1].resize((size_t)block_size);
      for (int i = 0; i < block_size; ++i) {
        int64_t l, r;
        if (ch_code == 8) { l = a[(size_t)i]; r = a[(size_t)i] - b[(size_t)i]; }
        else if (ch_code == 9) { r = b[(size_t)i]; l = a[(size_t)i] + b[(size_t)i]; }
        else {
          int64_t side = b[(size_t)i];
          int64_t mid = (a[(size_t)i] << 1) | (side & 1);
          l = (mid + side) >> 1;
          r = (mid - side) >> 1;
        }
        chans[0][(size_t)i] = l;
        chans[1][(size_t)i] = r;
      }
    } else {
      return out;
    }

    br.align();
    if (br.fail) return out;
    size_t frame_end = br.byte_pos();
    if (frame_end + 2 > buf.size()) return out;
    uint16_t frame_crc = (uint16_t)(((uint16_t)buf[frame_end] << 8) | buf[frame_end + 1]);
    if (flac_crc16(buf.data() + pos, frame_end - pos) != frame_crc) return out;
    pos = frame_end + 2;

    const float inv_ch = 1.0f / (float)n_ch;
    size_t base = mono.size();
    mono.resize(base + (size_t)block_size);
    for (int i = 0; i < block_size; ++i) {
      float acc = 0.f;
      for (int c = 0; c < n_ch; ++c) acc += (float)chans[(size_t)c][(size_t)i] * scale;
      mono[base + (size_t)i] = acc * inv_ch;
    }
  }
  if (total_samples && mono.size() > total_samples) mono.resize((size_t)total_samples);
  out.samples = std::move(mono);
  out.sample_rate = sample_rate;
  out.ok = true;
  return out;
}

Wav decode_flac_file(const char* path) {
  Wav out;
  FILE* f = std::fopen(path, "rb");
  if (!f) return out;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (size < 42) { std::fclose(f); return out; }
  std::vector<uint8_t> buf((size_t)size);
  if (std::fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    std::fclose(f);
    return out;
  }
  std::fclose(f);
  return decode_flac_buffer(buf);
}

double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// torchaudio-equivalent sinc_interp_hann polyphase resampler
// (lowpass_filter_width=6, rolloff=0.99), twin of
// simwhisper_codec_tpu/utils/audio_io.py::resample.
std::vector<float> resample(const std::vector<float>& x, int sr_in, int sr_out) {
  if (sr_in == sr_out || x.empty()) return x;
  int g = std::gcd(sr_in, sr_out);
  int orig = sr_in / g, nf = sr_out / g;
  const int lpw = 6;
  const double rolloff = 0.99;
  double base = (double)std::min(orig, nf) * rolloff;
  int width = (int)std::ceil((double)lpw * orig / base);
  int K = 2 * width + orig;

  std::vector<double> kernels((size_t)nf * (size_t)K);
  for (int i = 0; i < nf; ++i) {
    for (int k = 0; k < K; ++k) {
      double idx = (double)(k - width) / (double)orig;
      double t = (idx - (double)i / (double)nf) * base;
      t = std::max(-(double)lpw, std::min((double)lpw, t));
      double window = std::cos(t * M_PI / lpw / 2.0);
      window *= window;
      double tp = t * M_PI;
      double sinc = (tp == 0.0) ? 1.0 : std::sin(tp) / tp;
      kernels[(size_t)i * K + (size_t)k] = sinc * window * (base / (double)orig);
    }
  }

  int64_t length = (int64_t)x.size();
  int64_t padded = length + 2 * width + orig;
  int64_t n_frames = (padded - K) / orig + 1;
  int64_t target = (length * nf + orig - 1) / orig;  // ceil
  std::vector<float> y((size_t)target);
  for (int64_t q = 0; q < n_frames; ++q) {
    int64_t start = q * orig - width;  // frame start in unpadded coordinates
    int64_t k0 = start < 0 ? -start : 0;
    int64_t kend = std::min<int64_t>(K, length - start);
    for (int i = 0; i < nf; ++i) {
      int64_t m = q * nf + i;
      if (m >= target) break;
      const double* kr = &kernels[(size_t)i * K];
      double acc = 0.0;
      for (int64_t k = k0; k < kend; ++k)
        acc += (double)x[(size_t)(start + k)] * kr[k];
      y[(size_t)m] = (float)acc;
    }
  }
  return y;
}

struct BatchResult {
  std::vector<std::vector<float>> wavs;
  std::vector<int> status;
};

}  // namespace

extern "C" {

// Decode one file to mono float32 at target_rate.  Returns sample count, or
// -1 on failure.  Caller frees *out with free_buffer.
long audioloader_load(const char* path, int target_rate, float** out) {
  // dispatch on the 4-byte magic: RIFF/WAVE vs fLaC
  Wav w;
  {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    uint8_t magic[4] = {0, 0, 0, 0};
    size_t got = std::fread(magic, 1, 4, f);
    std::fclose(f);
    if (got == 4 && (std::memcmp(magic, "fLaC", 4) == 0 ||
                     std::memcmp(magic, "ID3", 3) == 0))
      w = decode_flac_file(path);
    else
      w = decode_wav_file(path);
  }
  if (!w.ok) return -1;
  std::vector<float> res = resample(w.samples, w.sample_rate, target_rate);
  float* buf = (float*)std::malloc(res.size() * sizeof(float));
  std::memcpy(buf, res.data(), res.size() * sizeof(float));
  *out = buf;
  return (long)res.size();
}

// Batch decode across a thread pool.  outs/lens must hold n entries.
// Returns number of successfully decoded files.
long audioloader_load_batch(const char** paths, long n, int target_rate,
                            int num_threads, float** outs, long* lens) {
  std::atomic<long> next(0), ok_count(0);
  int threads = num_threads > 0 ? num_threads
                                : (int)std::thread::hardware_concurrency();
  threads = std::max(1, std::min<int>(threads, (int)n));

  auto worker = [&]() {
    for (;;) {
      long i = next.fetch_add(1);
      if (i >= n) break;
      long cnt = audioloader_load(paths[i], target_rate, &outs[i]);
      lens[i] = cnt;
      if (cnt >= 0) ok_count.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return ok_count.load();
}

void audioloader_free(float* buf) { std::free(buf); }

// Write mono float32 as 16-bit PCM WAV.  Returns 0 on success.
int audioloader_save_wav(const char* path, const float* samples, long n, int rate) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_len = (uint32_t)(n * 2);
  uint32_t riff_len = 36 + data_len;
  uint8_t hdr[44];
  std::memcpy(hdr, "RIFF", 4);
  std::memcpy(hdr + 8, "WAVEfmt ", 8);
  auto wr32 = [&](int off, uint32_t v) {
    hdr[off] = v & 0xFF; hdr[off + 1] = (v >> 8) & 0xFF;
    hdr[off + 2] = (v >> 16) & 0xFF; hdr[off + 3] = (v >> 24) & 0xFF;
  };
  auto wr16 = [&](int off, uint16_t v) {
    hdr[off] = v & 0xFF; hdr[off + 1] = (v >> 8) & 0xFF;
  };
  wr32(4, riff_len);
  wr32(16, 16);      // fmt chunk size
  wr16(20, 1);       // PCM
  wr16(22, 1);       // mono
  wr32(24, (uint32_t)rate);
  wr32(28, (uint32_t)rate * 2);
  wr16(32, 2);       // block align
  wr16(34, 16);      // bits
  std::memcpy(hdr + 36, "data", 4);
  wr32(40, data_len);
  std::fwrite(hdr, 1, 44, f);

  std::vector<int16_t> pcm((size_t)n);
  for (long i = 0; i < n; ++i) {
    float v = samples[i] * 32768.0f;
    v = std::max(-32768.0f, std::min(32767.0f, v));
    pcm[(size_t)i] = (int16_t)v;
  }
  std::fwrite(pcm.data(), 2, (size_t)n, f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
