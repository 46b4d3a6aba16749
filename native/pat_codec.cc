// pat_codec: any-format audio decode via FFmpeg libraries.
//
// The reference decodes arbitrary containers/codecs through torchcodec,
// which wraps these same FFmpeg libraries (reference core/io.py:42-56,
// SURVEY.md §2.9). pat_audio.cc keeps the dependency-free RIFF/WAVE fast
// path; this library adds FLAC / MP3 / OGG / M4A / anything-libavformat
// -reads, exposed through a C ABI consumed via ctypes
// (pyannote_audio_tpu/native). Built separately (libpat_codec.so) so a
// missing FFmpeg never disables the WAV path.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC -lavformat -lavcodec
//        -lavutil -lswresample)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavutil/log.h>
}

namespace {

// decoders chat on stderr at info level (e.g. mp3 gapless timestamps);
// only surface real errors
struct QuietLogs {
  QuietLogs() { av_log_set_level(AV_LOG_ERROR); }
} quiet_logs;

constexpr long long kErrOpen = -1;
constexpr long long kErrFormat = -2;
constexpr long long kErrDecode = -3;

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  int stream_index = -1;

  ~Decoder() {
    if (swr) swr_free(&swr);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
  }

  long long open(const char* path) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
      return kErrOpen;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return kErrFormat;
    stream_index =
        av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
    if (stream_index < 0) return kErrFormat;
    AVStream* st = fmt->streams[stream_index];
    const AVCodec* codec = avcodec_find_decoder(st->codecpar->codec_id);
    if (!codec) return kErrFormat;
    ctx = avcodec_alloc_context3(codec);
    if (!ctx || avcodec_parameters_to_context(ctx, st->codecpar) < 0)
      return kErrFormat;
    if (avcodec_open2(ctx, codec, nullptr) < 0) return kErrFormat;
    pkt = av_packet_alloc();
    frame = av_frame_alloc();
    return 0;
  }

  // lazily initialize the converter once the first frame reveals the
  // true sample format/layout
  bool init_swr(const AVFrame* fr) {
    AVChannelLayout out_layout;
    av_channel_layout_copy(&out_layout, &fr->ch_layout);
    int rc = swr_alloc_set_opts2(
        &swr, &out_layout, AV_SAMPLE_FMT_FLT, fr->sample_rate, &out_layout,
        (AVSampleFormat)fr->format, fr->sample_rate, 0, nullptr);
    av_channel_layout_uninit(&out_layout);
    return rc >= 0 && swr_init(swr) >= 0;
  }

  // decode everything into interleaved f32; returns frames or error
  long long decode_all(std::vector<float>* interleaved, int* channels,
                       int* sample_rate) {
    long long total = 0;
    *channels = 0;
    *sample_rate = 0;
    auto drain = [&](AVFrame* fr) -> bool {
      if (*channels == 0) {
        *channels = fr->ch_layout.nb_channels;
        *sample_rate = fr->sample_rate;
        if (!init_swr(fr)) return false;
      }
      int n = fr->nb_samples;
      size_t base = interleaved->size();
      interleaved->resize(base + size_t(n) * *channels);
      uint8_t* out_ptr =
          reinterpret_cast<uint8_t*>(interleaved->data() + base);
      int got = swr_convert(swr, &out_ptr, n,
                            const_cast<const uint8_t**>(fr->extended_data),
                            n);
      if (got < 0) return false;
      interleaved->resize(base + size_t(got) * *channels);
      total += got;
      return true;
    };
    while (av_read_frame(fmt, pkt) >= 0) {
      if (pkt->stream_index == stream_index) {
        if (avcodec_send_packet(ctx, pkt) >= 0) {
          while (avcodec_receive_frame(ctx, frame) >= 0) {
            if (!drain(frame)) {
              av_packet_unref(pkt);
              return kErrDecode;
            }
          }
        }
      }
      av_packet_unref(pkt);
    }
    // flush the decoder
    avcodec_send_packet(ctx, nullptr);
    while (avcodec_receive_frame(ctx, frame) >= 0) {
      if (!drain(frame)) return kErrDecode;
    }
    return *channels > 0 ? total : kErrDecode;
  }
};

}  // namespace

extern "C" {

// Probe container metadata without decoding samples. num_frames is exact
// for lossless containers and a duration-based estimate for lossy ones
// (same contract as torchcodec's metadata, reference core/io.py:74-135).
int pat_codec_info(const char* path, int* sample_rate, int* channels,
                   long long* num_frames) {
  AVFormatContext* fmt = nullptr;
  if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0)
    return int(kErrOpen);
  if (avformat_find_stream_info(fmt, nullptr) < 0) {
    avformat_close_input(&fmt);
    return int(kErrFormat);
  }
  int idx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, nullptr, 0);
  if (idx < 0) {
    avformat_close_input(&fmt);
    return int(kErrFormat);
  }
  AVStream* st = fmt->streams[idx];
  *sample_rate = st->codecpar->sample_rate;
  *channels = st->codecpar->ch_layout.nb_channels;
  long long frames = st->nb_frames > 0 && st->codecpar->frame_size > 0
                         ? st->nb_frames * st->codecpar->frame_size
                         : 0;
  if (st->duration > 0 && st->time_base.den > 0) {
    long long from_duration =
        llround(double(st->duration) * st->time_base.num /
                st->time_base.den * st->codecpar->sample_rate);
    if (from_duration > 0) frames = from_duration;
  } else if (fmt->duration > 0) {
    frames = llround(double(fmt->duration) / AV_TIME_BASE *
                     st->codecpar->sample_rate);
  }
  *num_frames = frames;
  avformat_close_input(&fmt);
  return 0;
}

// Decode the whole file into a malloc'd planar (channel, time) float32
// buffer. Returns the exact frame count (or a negative error); the caller
// owns *out and must release it with pat_codec_free.
long long pat_codec_decode_alloc(const char* path, float** out,
                                 int* channels, int* sample_rate) {
  Decoder dec;
  long long rc = dec.open(path);
  if (rc < 0) return rc;
  std::vector<float> interleaved;
  long long frames = dec.decode_all(&interleaved, channels, sample_rate);
  if (frames < 0) return frames;
  const int ch = *channels;
  float* planar =
      static_cast<float*>(malloc(size_t(frames) * ch * sizeof(float)));
  if (!planar) return kErrDecode;
  for (long long t = 0; t < frames; ++t)
    for (int c = 0; c < ch; ++c)
      planar[(long long)c * frames + t] = interleaved[size_t(t) * ch + c];
  *out = planar;
  return frames;
}

void pat_codec_free(float* buf) { free(buf); }

// Encode a planar (channel, time) float32 buffer into any container
// FFmpeg can guess from the file extension (.flac/.mp3/.ogg/...).
// Returns 0 on success. Used for audio export and to synthesize
// non-WAV test fixtures (no ffmpeg CLI in the environment).
int pat_codec_encode(const char* path, const float* planar,
                     long long frames, int channels, int sample_rate) {
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 ||
      !fmt)
    return int(kErrFormat);
  const AVCodec* codec = avcodec_find_encoder(fmt->oformat->audio_codec);
  AVCodecContext* ctx = nullptr;
  SwrContext* swr = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  int err = int(kErrFormat);

  auto cleanup = [&]() {
    if (swr) swr_free(&swr);
    if (frame) av_frame_free(&frame);
    if (pkt) av_packet_free(&pkt);
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) {
      if (fmt->pb) avio_closep(&fmt->pb);
      avformat_free_context(fmt);
    }
  };
  if (!codec) {
    cleanup();
    return err;
  }
  AVStream* st = avformat_new_stream(fmt, nullptr);
  ctx = avcodec_alloc_context3(codec);
  if (!st || !ctx) {
    cleanup();
    return err;
  }
  ctx->sample_rate = sample_rate;
  av_channel_layout_default(&ctx->ch_layout, channels);
  // prefer float, fall back to whatever the encoder supports
  ctx->sample_fmt = AV_SAMPLE_FMT_NONE;
  if (codec->sample_fmts) {
    for (const AVSampleFormat* p = codec->sample_fmts;
         *p != AV_SAMPLE_FMT_NONE; ++p) {
      if (*p == AV_SAMPLE_FMT_FLTP || *p == AV_SAMPLE_FMT_FLT) {
        ctx->sample_fmt = *p;
        break;
      }
    }
    if (ctx->sample_fmt == AV_SAMPLE_FMT_NONE)
      ctx->sample_fmt = codec->sample_fmts[0];
  } else {
    ctx->sample_fmt = AV_SAMPLE_FMT_FLTP;
  }
  ctx->time_base = AVRational{1, sample_rate};
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(ctx, codec, nullptr) < 0 ||
      avcodec_parameters_from_context(st->codecpar, ctx) < 0) {
    cleanup();
    return err;
  }
  st->time_base = ctx->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) {
    cleanup();
    return int(kErrOpen);
  }
  if (avformat_write_header(fmt, nullptr) < 0) {
    cleanup();
    return err;
  }

  AVChannelLayout layout;
  av_channel_layout_default(&layout, channels);
  if (swr_alloc_set_opts2(&swr, &layout, ctx->sample_fmt, sample_rate,
                          &layout, AV_SAMPLE_FMT_FLTP, sample_rate, 0,
                          nullptr) < 0 ||
      swr_init(swr) < 0) {
    av_channel_layout_uninit(&layout);
    cleanup();
    return err;
  }
  av_channel_layout_uninit(&layout);

  frame = av_frame_alloc();
  pkt = av_packet_alloc();
  const int chunk = ctx->frame_size > 0 ? ctx->frame_size : 4096;
  long long pos = 0;
  err = int(kErrDecode);

  auto write_packets = [&]() -> bool {
    while (true) {
      int rc = avcodec_receive_packet(ctx, pkt);
      if (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) return true;
      if (rc < 0) return false;
      av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
      pkt->stream_index = st->index;
      if (av_interleaved_write_frame(fmt, pkt) < 0) return false;
    }
  };

  bool ok = true;
  while (ok && pos < frames) {
    int n = int(std::min<long long>(chunk, frames - pos));
    frame->format = ctx->sample_fmt;
    av_channel_layout_copy(&frame->ch_layout, &ctx->ch_layout);
    frame->sample_rate = sample_rate;
    frame->nb_samples = n;
    if (av_frame_get_buffer(frame, 0) < 0) {
      ok = false;
      break;
    }
    std::vector<const uint8_t*> src(channels);
    for (int c = 0; c < channels; ++c)
      src[c] = reinterpret_cast<const uint8_t*>(planar +
                                                (long long)c * frames + pos);
    if (swr_convert(swr, frame->extended_data, n, src.data(), n) < 0) {
      ok = false;
      break;
    }
    frame->pts = pos;
    if (avcodec_send_frame(ctx, frame) < 0 || !write_packets()) ok = false;
    av_frame_unref(frame);
    pos += n;
  }
  if (ok) {
    ok = avcodec_send_frame(ctx, nullptr) >= 0 && write_packets();
    if (ok && av_write_trailer(fmt) < 0) ok = false;
  }
  err = ok ? 0 : int(kErrDecode);
  cleanup();
  return err;
}

}  // extern "C"
