// Native audio loader: multithreaded WAV decode + polyphase resample.
//
// Host-side I/O component of the TPU codec framework (the reference delegates
// to torchaudio's C++ kernels via utils/helpers.py:77-93; this is the
// framework's own native equivalent).  Exposed through a C ABI consumed with
// ctypes (simwhisper_codec_tpu/utils/native_loader.py).
//
// Capabilities:
//  - RIFF/WAVE parsing: PCM 8/16/24/32-bit and IEEE float32, any channel
//    count (averaged to mono, matching the reference's mean-mix).
//  - Kaiser-windowed polyphase sinc resampling to the target rate.
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

double bessel_i0(double x) {
  double sum = 1.0, term = 1.0;
  for (int k = 1; k < 32; ++k) {
    term *= (x / (2.0 * k)) * (x / (2.0 * k));
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

// Kaiser-windowed sinc polyphase resampler, scipy.resample_poly-class quality.
std::vector<float> resample(const std::vector<float>& x, int sr_in, int sr_out) {
  if (sr_in == sr_out || x.empty()) return x;
  int g = std::gcd(sr_in, sr_out);
  int up = sr_out / g, down = sr_in / g;

  const int half_zeros = 16;  // zero crossings per side
  double cutoff = 0.5 / std::max(up, down);
  int half_len = half_zeros * std::max(up, down);
  int taps_len = 2 * half_len + 1;
  const double beta = 8.555;  // kaiser beta ~ 85 dB attenuation

  std::vector<double> taps(taps_len);
  double denom = bessel_i0(beta);
  for (int i = 0; i < taps_len; ++i) {
    double t = (double)(i - half_len);
    double sinc = (t == 0.0) ? 2.0 * cutoff
                             : std::sin(2.0 * M_PI * cutoff * t) / (M_PI * t);
    double w = (double)i / (taps_len - 1) * 2.0 - 1.0;
    double kaiser = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - w * w))) / denom;
    taps[i] = sinc * kaiser * up;
  }

  int64_t n_out = ((int64_t)x.size() * up + down - 1) / down;
  std::vector<float> y((size_t)n_out);
  for (int64_t m = 0; m < n_out; ++m) {
    // output sample m is at input position m*down/up
    int64_t num = (int64_t)m * down;
    int64_t n0 = num / up;             // integer input index
    int phase = (int)(num % up);       // fractional position in 1/up units
    double acc = 0.0;
    // taps index j covers input n0 - k where tap position = (k*up + phase)
    for (int64_t n = n0 - half_len / up - 1; n <= n0 + half_len / up + 1; ++n) {
      if (n < 0 || n >= (int64_t)x.size()) continue;
      int64_t tap_idx = half_len + (n0 - n) * up + phase;
      if (tap_idx < 0 || tap_idx >= taps_len) continue;
      acc += (double)x[(size_t)n] * taps[(size_t)tap_idx];
    }
    y[(size_t)m] = (float)acc;
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
  Wav w = decode_wav_file(path);
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
