// Native waveform loader: RIFF/WAV decode + mono downmix + windowed-sinc
// resampling + pad/truncate, GIL-free and batch-threaded.
//
// TPU-native counterpart of the reference's librosa-based data layer
// (src/preprocess/feats_extraction.py:7-38 wraps librosa.load -> mono ->
// pad). librosa/ffmpeg are CPython-bound and GIL-limited; on a TPU host
// the input pipeline must keep up with the device from plain CPU
// threads, so the decode hot path lives here. Python falls back to the
// scipy implementation in data/audio_io.py when no toolchain exists.
//
// Supported containers: RIFF WAVE with PCM u8/s16/s24/s32 and IEEE
// float32/float64 payloads (chunk walker skips LIST/fact/etc).
// Resampler: Hann-windowed sinc interpolation with a 512-samples-per-
// zero-crossing lookup table (16 zero crossings each side, scaled by
// min(1, target/orig) for anti-aliasing on downsample) — the resampy
// "kaiser_fast"-class design, chosen over rational polyphase so any
// rate pair works without factorization.
//
// C ABI (ctypes):
//   t4s_load_wav(path, target_sr, pad_to, out[pad_to], &true_len) -> err
//   t4s_load_wav_batch(paths, n, target_sr, pad_to, out[n*pad_to],
//                      true_len[n], err[n], n_threads)
// err codes: 0 ok, 1 open failed, 2 not a wav, 3 unsupported encoding,
//            4 malformed/truncated.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kZeroCrossings = 16;
constexpr int kTablePrecision = 512;

// Hann-windowed sinc table, built once per process.
struct SincTable {
  std::vector<double> v;
  SincTable() : v(kZeroCrossings * kTablePrecision + 1) {
    const int n = kZeroCrossings * kTablePrecision;
    v[0] = 1.0;
    for (int i = 1; i <= n; ++i) {
      const double x = static_cast<double>(i) / kTablePrecision;  // in crossings
      const double s = std::sin(M_PI * x) / (M_PI * x);
      const double w = 0.5 * (1.0 + std::cos(M_PI * x / kZeroCrossings));
      v[i] = s * w;
    }
  }
  double operator()(double x) const {  // x in zero-crossing units, >= 0
    const double p = x * kTablePrecision;
    const int i = static_cast<int>(p);
    if (i >= kZeroCrossings * kTablePrecision) return 0.0;
    const double f = p - i;
    return v[i] * (1.0 - f) + v[i + 1] * f;
  }
};

const SincTable& sinc_table() {
  static SincTable t;
  return t;
}

struct WavData {
  std::vector<float> samples;  // interleaved
  int channels = 0;
  int sample_rate = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

int decode_wav(const char* path, WavData* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return 1;
  std::vector<uint8_t> buf;
  {
    std::fseek(f, 0, SEEK_END);
    const long sz = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    if (sz < 44) { std::fclose(f); return 2; }
    buf.resize(static_cast<size_t>(sz));
    if (std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
      std::fclose(f);
      return 4;
    }
    std::fclose(f);
  }
  if (std::memcmp(buf.data(), "RIFF", 4) != 0 || std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return 2;

  uint16_t fmt_code = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  size_t pos = 12;
  while (pos + 8 <= buf.size()) {
    const uint32_t chunk_len = rd_u32(&buf[pos + 4]);
    const uint8_t* body = &buf[pos + 8];
    const size_t avail = buf.size() - pos - 8;
    const size_t len = chunk_len < avail ? chunk_len : avail;
    if (std::memcmp(&buf[pos], "fmt ", 4) == 0) {
      if (len < 16) return 4;
      fmt_code = rd_u16(body);
      channels = rd_u16(body + 2);
      sample_rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt_code == 0xFFFE && len >= 40) fmt_code = rd_u16(body + 24);  // extensible
    } else if (std::memcmp(&buf[pos], "data", 4) == 0) {
      data = body;
      data_len = len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are word-aligned
  }
  if (!data || channels == 0 || sample_rate == 0) return 4;

  const size_t bytes_per = bits / 8;
  if (bytes_per == 0) return 3;
  const size_t n = data_len / bytes_per;
  out->samples.resize(n);
  out->channels = channels;
  out->sample_rate = static_cast<int>(sample_rate);

  if (fmt_code == 1 && bits == 16) {
    for (size_t i = 0; i < n; ++i) {
      int16_t v;
      std::memcpy(&v, data + 2 * i, 2);
      out->samples[i] = static_cast<float>(v) / 32768.0f;
    }
  } else if (fmt_code == 1 && bits == 32) {
    for (size_t i = 0; i < n; ++i) {
      int32_t v;
      std::memcpy(&v, data + 4 * i, 4);
      out->samples[i] = static_cast<float>(static_cast<double>(v) / 2147483648.0);
    }
  } else if (fmt_code == 1 && bits == 24) {
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = data + 3 * i;
      int32_t v = (static_cast<int32_t>(p[0]) << 8) | (static_cast<int32_t>(p[1]) << 16) |
                  (static_cast<int32_t>(p[2]) << 24);
      out->samples[i] = static_cast<float>(static_cast<double>(v) / 2147483648.0);
    }
  } else if (fmt_code == 1 && bits == 8) {
    for (size_t i = 0; i < n; ++i)
      out->samples[i] = (static_cast<float>(data[i]) - 128.0f) / 128.0f;
  } else if (fmt_code == 3 && bits == 32) {
    for (size_t i = 0; i < n; ++i) {
      float v;
      std::memcpy(&v, data + 4 * i, 4);
      out->samples[i] = v;
    }
  } else if (fmt_code == 3 && bits == 64) {
    for (size_t i = 0; i < n; ++i) {
      double v;
      std::memcpy(&v, data + 8 * i, 8);
      out->samples[i] = static_cast<float>(v);
    }
  } else {
    return 3;
  }
  return 0;
}

// mono downmix (mean over channels), matching audio_io.to_mono.
void downmix(const WavData& w, std::vector<float>* mono) {
  const size_t frames = w.samples.size() / w.channels;
  mono->resize(frames);
  if (w.channels == 1) {
    std::memcpy(mono->data(), w.samples.data(), frames * sizeof(float));
    return;
  }
  const float inv = 1.0f / static_cast<float>(w.channels);
  for (size_t i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < w.channels; ++c) acc += w.samples[i * w.channels + c];
    (*mono)[i] = static_cast<float>(acc) * inv;
  }
}

long gcd_l(long a, long b) { return b == 0 ? a : gcd_l(b, a % b); }

void resample_sinc(const std::vector<float>& in, int orig_sr, int target_sr,
                   std::vector<float>* out) {
  if (orig_sr == target_sr || in.empty()) {
    *out = in;
    return;
  }
  const double ratio = static_cast<double>(target_sr) / orig_sr;
  const double scale = ratio < 1.0 ? ratio : 1.0;
  const double width = kZeroCrossings / scale;  // taps each side, input units
  const size_t n_out = static_cast<size_t>(std::ceil(in.size() * ratio));
  out->assign(n_out, 0.0f);
  const SincTable& tbl = sinc_table();
  const long n_in = static_cast<long>(in.size());

  // Rational ratio -> polyphase: output t sits at input position
  // base + phase/L with phase = (t*M) mod L, so only L distinct tap
  // vectors exist. Precompute them (L*(2W+2) sinc evals, trivial) and
  // the hot loop becomes a pure FIR dot product — no per-tap window
  // interpolation. Audio rates always reduce to small L (44100->32000:
  // L=320); the direct path below covers pathological ratios.
  const long g = gcd_l(target_sr, orig_sr);
  const long L = target_sr / g, M = orig_sr / g;
  if (L <= 8192) {
    const int w_half = static_cast<int>(std::ceil(width)) + 1;
    const int n_taps = 2 * w_half + 2;
    std::vector<float> taps(static_cast<size_t>(L) * n_taps);
    for (long p = 0; p < L; ++p) {
      const double frac = static_cast<double>(p) / L;
      for (int j = 0; j < n_taps; ++j) {
        const double d = std::fabs((j - w_half - frac) * scale);
        taps[static_cast<size_t>(p) * n_taps + j] = static_cast<float>(tbl(d) * scale);
      }
    }
    for (size_t t = 0; t < n_out; ++t) {
      const long num = static_cast<long>(t) * M;
      const long base = num / L;
      const long phase = num % L;
      const float* tp = &taps[static_cast<size_t>(phase) * n_taps];
      long k0 = base - w_half;
      int j0 = 0;
      if (k0 < 0) { j0 = static_cast<int>(-k0); k0 = 0; }
      long k1 = base - w_half + n_taps - 1;
      if (k1 >= n_in) k1 = n_in - 1;
      float acc = 0.0f;
      const float* src = in.data() + k0;
      const int nk = static_cast<int>(k1 - k0 + 1);
      const float* tw = tp + j0;
      for (int j = 0; j < nk; ++j) acc += src[j] * tw[j];
      (*out)[t] = acc;
    }
    return;
  }

  for (size_t t = 0; t < n_out; ++t) {
    const double x = static_cast<double>(t) / ratio;  // position in input
    long k0 = static_cast<long>(std::ceil(x - width));
    long k1 = static_cast<long>(std::floor(x + width));
    if (k0 < 0) k0 = 0;
    if (k1 >= n_in) k1 = n_in - 1;
    double acc = 0.0;
    for (long k = k0; k <= k1; ++k) {
      const double d = std::fabs((k - x) * scale);
      acc += in[static_cast<size_t>(k)] * tbl(d);
    }
    (*out)[t] = static_cast<float>(acc * scale);
  }
}

int load_one(const char* path, int target_sr, long pad_to, float* out, long* true_len) {
  WavData w;
  const int err = decode_wav(path, &w);
  if (err) return err;
  std::vector<float> mono, res;
  downmix(w, &mono);
  resample_sinc(mono, w.sample_rate, target_sr, &res);
  const long n = static_cast<long>(res.size()) < pad_to ? static_cast<long>(res.size()) : pad_to;
  std::memcpy(out, res.data(), static_cast<size_t>(n) * sizeof(float));
  if (n < pad_to) std::memset(out + n, 0, static_cast<size_t>(pad_to - n) * sizeof(float));
  *true_len = n;
  return 0;
}

}  // namespace

extern "C" {

int t4s_load_wav(const char* path, int target_sr, long pad_to, float* out, long* true_len) {
  return load_one(path, target_sr, pad_to, out, true_len);
}

void t4s_load_wav_batch(const char** paths, long n, int target_sr, long pad_to,
                        float* out, long* true_len, int* err, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = static_cast<int>(n);
  std::atomic<long> next(0);
  auto worker = [&]() {
    long i;
    while ((i = next.fetch_add(1)) < n)
      err[i] = load_one(paths[i], target_sr, pad_to, out + i * pad_to, &true_len[i]);
  };
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
