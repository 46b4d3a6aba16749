// pat_audio: native audio decode + resample runtime.
//
// TPU-native replacement for the decode path the reference delegates to
// torchcodec/FFmpeg (reference core/io.py:42-56; SURVEY.md §2.9): RIFF/WAVE
// parsing (PCM 8/16/24/32 + float32/64), channel downmix, windowed-sinc
// polyphase resampling, and a std::thread batch decoder that feeds pinned
// host buffers for device upload. Exposed through a C ABI consumed via
// ctypes (pyannote_audio_tpu/native).
//
// Build: native/build.sh  (g++ -O3 -march=native -shared -fPIC -pthread)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrBounds = -3;

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int format = 0;  // 1 = pcm, 3 = float
  int64_t num_frames = 0;
  int64_t data_offset = 0;
};

bool parse_header(FILE* f, WavInfo* info) {
  // every header field is untrusted (serve accepts uploads): validate
  // channel count / rate / depth-format combinations and clamp the
  // advertised data size to the bytes actually present so a lying
  // header can neither divide by zero, read past a sample, nor promise
  // a multi-GB allocation. Fuzzed in tests/test_native_fuzz.py.
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  long cur = ftell(f);
  fseek(f, 0, SEEK_END);
  const int64_t file_size = ftell(f);
  fseek(f, cur, SEEK_SET);
  bool have_fmt = false, have_data = false;
  int block_align = 0;
  int64_t data_size = 0;
  while (!(have_fmt && have_data)) {
    unsigned char chunk[8];
    if (fread(chunk, 1, 8, f) != 8) break;
    uint32_t size = chunk[4] | (chunk[5] << 8) | (chunk[6] << 16) |
                    (uint32_t(chunk[7]) << 24);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      // never trust the 32-bit size: a corrupt header must fail cleanly
      // (kErrFormat), not allocate 4GB (bad_alloc escaping the C ABI
      // aborts the process) or read past a sub-16-byte allocation
      if (size < 16 || size > (1u << 20)) return false;
      std::vector<unsigned char> body(size);
      if (fread(body.data(), 1, size, f) != size) return false;
      int fmt = body[0] | (body[1] << 8);
      info->channels = body[2] | (body[3] << 8);
      info->sample_rate = body[4] | (body[5] << 8) | (body[6] << 16) |
                          (int(body[7]) << 24);
      block_align = body[12] | (body[13] << 8);
      info->bits = body[14] | (body[15] << 8);
      if (fmt == 0xFFFE) {
        // WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        // bytes of the SubFormat GUID at offset 24 (after cbSize,
        // wValidBitsPerSample and dwChannelMask)
        if (size >= 40)
          fmt = body[24] | (body[25] << 8);
        else
          fmt = 1;  // truncated extension: assume PCM
      }
      info->format = fmt;
    } else if (memcmp(chunk, "data", 4) == 0) {
      info->data_offset = ftell(f);
      data_size = int64_t(size);
      have_data = true;
      fseek(f, long(int64_t(size) + (size & 1)), SEEK_CUR);
      continue;
    } else {
      fseek(f, long(int64_t(size) + (size & 1)), SEEK_CUR);
    }
    if (info->format != 0) have_fmt = true;
  }
  if (!(have_fmt && have_data)) return false;
  // validate: zero channels / rate or a depth the sample loop cannot
  // address (e.g. float16) would otherwise divide by zero or over-read
  // rates above 1 MHz are corrupt/hostile headers (real audio tops out
  // at 384 kHz) and would size resampler filters off the advertised rate
  if (info->channels < 1 || info->sample_rate < 1 ||
      info->sample_rate > 1000000)
    return false;
  if (info->format == 3) {
    if (info->bits != 32 && info->bits != 64) return false;
  } else if (info->format == 1) {
    if (info->bits != 8 && info->bits != 16 && info->bits != 24 &&
        info->bits != 32)
      return false;
  } else {
    return false;
  }
  const int bytes_per_frame =
      std::max(block_align, info->channels * (info->bits / 8));
  if (bytes_per_frame <= 0) return false;
  // clamp the advertised data size to the bytes actually in the file
  const int64_t avail = std::max<int64_t>(0, file_size - info->data_offset);
  info->num_frames = std::min(data_size, avail) / bytes_per_frame;
  return true;
}

// decode [frame_offset, frame_offset+num_frames) as planar f32
int decode_frames(FILE* f, const WavInfo& info, int64_t frame_offset,
                  int64_t num_frames, float* out) {
  const int bps = info.bits / 8;
  const int ch = info.channels;
  const int64_t stride = int64_t(bps) * ch;
  // clamp the read to the data chunk: bytes after it (LIST/INFO tags)
  // are metadata, not audio — requests past the end zero-fill below
  int64_t avail = info.num_frames - frame_offset;
  if (avail < 0) avail = 0;
  const int64_t want = std::min(num_frames, avail);
  fseek(f, long(info.data_offset + frame_offset * stride), SEEK_SET);
  std::vector<unsigned char> buf(size_t(want * stride));
  size_t got = fread(buf.data(), 1, buf.size(), f);
  int64_t frames = int64_t(got / stride);
  const unsigned char* p = buf.data();
  for (int64_t t = 0; t < frames; ++t) {
    for (int c = 0; c < ch; ++c) {
      const unsigned char* s = p + t * stride + int64_t(c) * bps;
      float v = 0.f;
      if (info.format == 3) {
        if (bps == 4) {
          float fv;
          memcpy(&fv, s, 4);
          v = fv;
        } else {
          double dv;
          memcpy(&dv, s, 8);
          v = float(dv);
        }
      } else if (bps == 2) {
        int16_t iv = int16_t(s[0] | (s[1] << 8));
        v = float(iv) / 32768.f;
      } else if (bps == 3) {
        int32_t iv = s[0] | (s[1] << 8) | (s[2] << 16);
        if (iv >= (1 << 23)) iv -= (1 << 24);
        v = float(iv) / float(1 << 23);
      } else if (bps == 4) {
        int32_t iv;
        memcpy(&iv, s, 4);
        v = float(double(iv) / 2147483648.0);
      } else if (bps == 1) {
        v = (float(s[0]) - 128.f) / 128.f;
      }
      out[int64_t(c) * num_frames + t] = v;
    }
  }
  // zero-fill anything past EOF
  for (int c = 0; c < ch; ++c)
    for (int64_t t = frames; t < num_frames; ++t)
      out[int64_t(c) * num_frames + t] = 0.f;
  return int(frames);
}

inline double sinc(double x) {
  if (std::fabs(x) < 1e-9) return 1.0;
  return std::sin(M_PI * x) / (M_PI * x);
}

}  // namespace

extern "C" {

int pat_wav_info(const char* path, int* sample_rate, int* channels,
                 long long* num_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  WavInfo info;
  bool ok = parse_header(f, &info);
  fclose(f);
  if (!ok) return kErrFormat;
  *sample_rate = info.sample_rate;
  *channels = info.channels;
  *num_frames = info.num_frames;
  return 0;
}

// Decode (a slice of) a wav into planar (channel, time) float32.
// num_frames < 0 means "to end of file". Returns frames decoded or error.
long long pat_wav_decode(const char* path, long long frame_offset,
                         long long num_frames, float* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  WavInfo info;
  if (!parse_header(f, &info)) {
    fclose(f);
    return kErrFormat;
  }
  if (num_frames < 0) num_frames = info.num_frames - frame_offset;
  if (frame_offset < 0 || num_frames < 0) {
    fclose(f);
    return kErrBounds;
  }
  int decoded = decode_frames(f, info, frame_offset, num_frames, out);
  fclose(f);
  // the out buffer always holds num_frames per channel (tail
  // zero-filled); report how many carry real audio, per the contract
  return decoded;
}

// Windowed-sinc polyphase resampler, mono in/out.
// Returns output length or negative error.
long long pat_resample(const float* in, long long in_len, int in_rate,
                       int out_rate, float* out, long long out_capacity) {
  if (in_rate == out_rate) {
    long long n = std::min(in_len, out_capacity);
    memcpy(out, in, size_t(n) * sizeof(float));
    return n;
  }
  int64_t g = std::__gcd((int64_t)in_rate, (int64_t)out_rate);
  int64_t up = out_rate / g, down = in_rate / g;
  int64_t out_len = (in_len * up) / down;
  if (out_len > out_capacity) out_len = out_capacity;

  const int kZeros = 16;  // sinc half-width (in input samples)
  const double cutoff = (up > down) ? 1.0 : double(up) / double(down);

  std::atomic<int64_t> next{0};
  auto worker = [&]() {
    const int64_t kBlock = 4096;
    while (true) {
      int64_t start = next.fetch_add(kBlock);
      if (start >= out_len) break;
      int64_t stop = std::min(start + kBlock, out_len);
      for (int64_t i = start; i < stop; ++i) {
        // output time in input-sample units
        double t = double(i) * double(down) / double(up);
        int64_t t0 = int64_t(std::floor(t));
        double acc = 0.0;
        for (int64_t k = t0 - kZeros + 1; k <= t0 + kZeros; ++k) {
          if (k < 0 || k >= in_len) continue;
          double x = (t - double(k)) * cutoff;
          if (std::fabs(x) >= kZeros) continue;
          // Blackman-Harris window on the sinc
          double w_arg = (t - double(k)) / kZeros;  // in [-1, 1]
          double ww = 0.35875 + 0.48829 * std::cos(M_PI * w_arg) +
                      0.14128 * std::cos(2 * M_PI * w_arg) +
                      0.01168 * std::cos(3 * M_PI * w_arg);
          acc += double(in[k]) * sinc(x) * ww * cutoff;
        }
        out[i] = float(acc);
      }
    }
  };
  unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, 8u);
  std::vector<std::thread> pool;
  for (unsigned i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return out_len;
}

// Batch decode+downmix+resample: n files in parallel into one planar
// buffer of shape (n, max_out_len). Short files are zero-padded.
// lengths[i] receives each file's true output length.
int pat_batch_decode_resample(const char** paths, int n, int target_rate,
                              float* out, long long max_out_len,
                              long long* lengths) {
  std::atomic<int> next{0};
  std::atomic<int> status{0};
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      FILE* f = fopen(paths[i], "rb");
      if (!f) {
        status.store(kErrOpen);
        lengths[i] = 0;
        continue;
      }
      WavInfo info;
      if (!parse_header(f, &info)) {
        fclose(f);
        status.store(kErrFormat);
        lengths[i] = 0;
        continue;
      }
      std::vector<float> planar(size_t(info.num_frames) * info.channels);
      decode_frames(f, info, 0, info.num_frames, planar.data());
      fclose(f);
      // downmix
      std::vector<float> mono(size_t(info.num_frames));
      for (int64_t t = 0; t < info.num_frames; ++t) {
        float acc = 0.f;
        for (int c = 0; c < info.channels; ++c)
          acc += planar[size_t(c) * info.num_frames + t];
        mono[size_t(t)] = acc / float(info.channels);
      }
      float* dst = out + int64_t(i) * max_out_len;
      long long produced = pat_resample(mono.data(), info.num_frames,
                                        info.sample_rate, target_rate,
                                        dst, max_out_len);
      if (produced < 0) produced = 0;
      for (long long t = produced; t < max_out_len; ++t) dst[t] = 0.f;
      lengths[i] = produced;
    }
  };
  unsigned n_threads =
      std::min({unsigned(n), std::thread::hardware_concurrency(), 16u});
  n_threads = std::max(n_threads, 1u);
  std::vector<std::thread> pool;
  for (unsigned i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return status.load();
}

// Block-adaptive 4-bit DPCM transport encoder (the TPU upload codec's
// host half; device half is the segmented-cumsum decode in
// core/inference.py). Layout per 256-sample block: 128 bytes of packed
// code nibbles (code+8 in [1,15]; sample 0's code is always 8 = zero)
// followed by int16 scale and int16 first-sample, little-endian.
// Reconstruction x[i] = x0 + s * sum(codes[1..i]), so the decoder is one
// cumsum — no sequential state. The scale s = max(1, ceil(maxdiff/7))
// guarantees |code| <= 7 (quantize-then-delta: with the step tied to the
// block's max first-difference, closed-loop DPCM degenerates to
// independent quantization K[i] = round(x[i]/s) + delta coding).
// Integer arithmetic matches the numpy fallback bit for bit.
long long pat_dpcm4_encode(const float* wav, long long n,
                           long long padded_n, unsigned char* out) {
  if (padded_n % 256 != 0 || n < 0 || n > padded_n) return kErrBounds;
  const long long nb = padded_n / 256;
  std::atomic<long long> next{0};
  auto worker = [&]() {
    const long long kBatch = 64;  // blocks per grab
    while (true) {
      long long b0 = next.fetch_add(kBatch);
      if (b0 >= nb) break;
      long long b1 = std::min(b0 + kBatch, nb);
      for (long long b = b0; b < b1; ++b) {
        int32_t x[256];
        const long long base = b * 256;
        for (int i = 0; i < 256; ++i) {
          const long long t = base + i;
          if (t < n) {
            // nearbyint = round-half-to-even, matching np.round
            float v = wav[t] * 32768.0f;
            v = std::min(std::max(v, -32768.0f), 32767.0f);
            x[i] = int32_t(std::nearbyint(v));
          } else {
            x[i] = 0;  // silence pad
          }
        }
        int32_t maxdiff = 0;
        for (int i = 1; i < 256; ++i)
          maxdiff = std::max(maxdiff, std::abs(x[i] - x[i - 1]));
        // ceil(maxdiff/7): |slope|/s <= 7 plus <1 of rounding jitter
        // keeps every code in [-7, 7], inside the nibble's [-8, 7]
        const int32_t s = std::max(1, (maxdiff + 6) / 7);
        // K = floor((2x + s) / (2s)) = round-half-up(x/s), exact in ints
        auto quant = [s](int32_t v) {
          const int32_t a = 2 * v + s, d = 2 * s;
          return a >= 0 ? a / d : -((-a + d - 1) / d);
        };
        unsigned char* row = out + b * 132;
        int32_t prev = quant(x[0]);
        const int32_t k0 = prev;
        row[0] = 8;  // low nibble of byte 0: code 0 for sample 0
        for (int i = 1; i < 256; ++i) {
          const int32_t k = quant(x[i]);
          const int32_t c = k - prev + 8;  // in [1, 15]
          prev = k;
          if (i & 1)
            row[i >> 1] |= (unsigned char)(c << 4);
          else
            row[i >> 1] = (unsigned char)c;
        }
        const int32_t x0 = k0 * s;  // = round(x[0]/s)*s, fits int16+s
        const int16_t s16 = int16_t(s);
        const int16_t x16 =
            int16_t(std::min(std::max(x0, -32768), 32767));
        memcpy(row + 128, &s16, 2);
        memcpy(row + 130, &x16, 2);
      }
    }
  };
  unsigned n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, 8u);
  std::vector<std::thread> pool;
  for (unsigned i = 0; i < n_threads; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return nb * 132;
}

}  // extern "C"
