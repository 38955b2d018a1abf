// Generic host-side audio demux/decode shim over the system FFmpeg
// libraries (libavformat/libavcodec, Debian 5.1) — the fallback reader for
// containers the package has no dedicated codec for (m4a/AAC, mp4, mka,
// webm, ...).  This mirrors the reference's audio reader surface ("opens
// anything FFmpeg demuxes", ref: internal/audio/reader.go:29-170) while
// keeping ALL DSP in the JAX package: this shim is container I/O only —
// it decodes the FIRST/best audio stream to interleaved float32 at the
// stream's native rate and hands PCM to Python.
//
// Built on demand with g++ (see io/generic.py), linking the distro's
// shared libs; no FFmpeg code is vendored here.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/opt.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct AvReader {
  AVFormatContext *fmt = nullptr;
  AVCodecContext *dec = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *frame = nullptr;
  int stream_index = -1;
  bool draining = false;
  bool done = false;
  std::string codec_name;
  // samples already decoded but not yet handed to the caller
  std::vector<float> pending;
  size_t pending_pos = 0;  // in floats
};

void set_err(char *err, int errlen, const std::string &msg) {
  if (err && errlen > 0) {
    std::snprintf(err, static_cast<size_t>(errlen), "%s", msg.c_str());
  }
}

std::string av_msg(int code) {
  char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
  av_strerror(code, buf, sizeof buf);
  return std::string(buf);
}

// convert one decoded AVFrame (any common sample format, packed or planar)
// to interleaved float32 appended onto out
bool frame_to_float(const AVFrame *f, int channels, std::vector<float> &out) {
  // a mid-stream channel-layout change would make the planar loop read
  // NULL/garbage plane pointers — hard error, not a crash
  if (f->ch_layout.nb_channels != channels) return false;
  const int n = f->nb_samples;
  const auto fmt = static_cast<AVSampleFormat>(f->format);
  const bool planar = av_sample_fmt_is_planar(fmt) != 0;
  const AVSampleFormat base = av_get_packed_sample_fmt(fmt);
  const size_t start = out.size();
  out.resize(start + static_cast<size_t>(n) * channels);
  float *dst = out.data() + start;

  auto sample = [&](int ch, int i) -> const uint8_t * {
    if (planar) {
      return f->extended_data[ch] +
             static_cast<size_t>(i) * av_get_bytes_per_sample(fmt);
    }
    return f->extended_data[0] +
           (static_cast<size_t>(i) * channels + ch) *
               av_get_bytes_per_sample(fmt);
  };

  for (int i = 0; i < n; i++) {
    for (int ch = 0; ch < channels; ch++) {
      const uint8_t *p = sample(ch, i);
      float v;
      switch (base) {
        case AV_SAMPLE_FMT_U8:
          v = (static_cast<int>(*p) - 128) / 128.0f;
          break;
        case AV_SAMPLE_FMT_S16: {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = s / 32768.0f;
          break;
        }
        case AV_SAMPLE_FMT_S32: {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = static_cast<float>(s / 2147483648.0);
          break;
        }
        case AV_SAMPLE_FMT_S64: {
          int64_t s;
          std::memcpy(&s, p, 8);
          v = static_cast<float>(static_cast<double>(s) / 9223372036854775808.0);
          break;
        }
        case AV_SAMPLE_FMT_FLT: {
          std::memcpy(&v, p, 4);
          break;
        }
        case AV_SAMPLE_FMT_DBL: {
          double d;
          std::memcpy(&d, p, 8);
          v = static_cast<float>(d);
          break;
        }
        default:
          return false;
      }
      dst[static_cast<size_t>(i) * channels + ch] = v;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Open `path`, pick the best audio stream, ready a decoder.
// Returns a handle (or nullptr; err filled).  rate/channels are the
// stream's native decode parameters; bits is bits_per_raw_sample (0 for
// lossy codecs).
void *jt_av_open(const char *path, int *rate, int *channels, int *bits,
                 char *err, int errlen) {
  av_log_set_level(AV_LOG_ERROR);  // decoder warnings are not for stdout
  auto *r = new AvReader();
  int rc = avformat_open_input(&r->fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "avformat_open_input: " + av_msg(rc));
    delete r;
    return nullptr;
  }
  rc = avformat_find_stream_info(r->fmt, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "find_stream_info: " + av_msg(rc));
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  const AVCodec *codec = nullptr;
  rc = av_find_best_stream(r->fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (rc < 0 || !codec) {
    set_err(err, errlen, "no decodable audio stream");
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  r->stream_index = rc;
  AVStream *st = r->fmt->streams[r->stream_index];
  r->dec = avcodec_alloc_context3(codec);
  if (!r->dec ||
      avcodec_parameters_to_context(r->dec, st->codecpar) < 0 ||
      avcodec_open2(r->dec, codec, nullptr) < 0) {
    set_err(err, errlen, "decoder init failed");
    if (r->dec) avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  r->pkt = av_packet_alloc();
  r->frame = av_frame_alloc();
  r->codec_name = codec->name ? codec->name : "unknown";

  int ch = r->dec->ch_layout.nb_channels;
  if (ch <= 0) ch = st->codecpar->ch_layout.nb_channels;
  *rate = r->dec->sample_rate;
  *channels = ch;
  *bits = st->codecpar->bits_per_raw_sample;
  if (*rate <= 0 || ch <= 0) {
    set_err(err, errlen, "stream reports no rate/channels");
    av_frame_free(&r->frame);
    av_packet_free(&r->pkt);
    avcodec_free_context(&r->dec);
    avformat_close_input(&r->fmt);
    delete r;
    return nullptr;
  }
  return r;
}

const char *jt_av_codec_name(void *handle) {
  return static_cast<AvReader *>(handle)->codec_name.c_str();
}

// Decode up to max_samples samples-per-channel of interleaved float32 into
// out.  Returns samples-per-channel written; 0 at end of stream; -1 on a
// decode error (mid-stream corruption is an ERROR, not EOF — mirrors
// flacio's hard error contract).
long jt_av_read(void *handle, float *out, long max_samples) {
  auto *r = static_cast<AvReader *>(handle);
  const int channels = r->dec->ch_layout.nb_channels;
  const size_t want = static_cast<size_t>(max_samples) * channels;

  while (r->pending.size() - r->pending_pos < want && !r->done) {
    int rc = avcodec_receive_frame(r->dec, r->frame);
    if (rc == 0) {
      if (r->frame->nb_samples > 0) {
        // compact the consumed prefix before growing
        if (r->pending_pos) {
          r->pending.erase(r->pending.begin(),
                           r->pending.begin() +
                               static_cast<long>(r->pending_pos));
          r->pending_pos = 0;
        }
        if (!frame_to_float(r->frame, channels, r->pending)) {
          return -1;  // unsupported sample format
        }
      }
      av_frame_unref(r->frame);
      continue;
    }
    if (rc == AVERROR_EOF) {
      r->done = true;
      break;
    }
    if (rc != AVERROR(EAGAIN)) {
      return -1;
    }
    if (r->draining) {
      // EAGAIN after flush should not happen; treat as done
      r->done = true;
      break;
    }
    // feed the decoder
    rc = av_read_frame(r->fmt, r->pkt);
    if (rc == AVERROR_EOF) {
      avcodec_send_packet(r->dec, nullptr);
      r->draining = true;
      continue;
    }
    if (rc < 0) {
      return -1;  // demux error mid-stream
    }
    if (r->pkt->stream_index == r->stream_index) {
      rc = avcodec_send_packet(r->dec, r->pkt);
      if (rc < 0 && rc != AVERROR(EAGAIN)) {
        av_packet_unref(r->pkt);
        return -1;
      }
    }
    av_packet_unref(r->pkt);
  }

  const size_t have = r->pending.size() - r->pending_pos;
  const size_t give = have < want ? have : want;
  std::memcpy(out, r->pending.data() + r->pending_pos, give * sizeof(float));
  r->pending_pos += give;
  if (r->pending_pos == r->pending.size()) {
    r->pending.clear();
    r->pending_pos = 0;
  }
  return static_cast<long>(give / channels);
}

void jt_av_close(void *handle) {
  auto *r = static_cast<AvReader *>(handle);
  if (r->frame) av_frame_free(&r->frame);
  if (r->pkt) av_packet_free(&r->pkt);
  if (r->dec) avcodec_free_context(&r->dec);
  if (r->fmt) avformat_close_input(&r->fmt);
  delete r;
}

// TEST-FIXTURE SUPPORT ONLY: encode interleaved float32 -> m4a (native AAC
// encoder + mp4 muxer) so the fallback READ path can be exercised against
// known signals without shipping binary fixtures.  The product never
// encodes lossy audio (output contract is FLAC s16, encoder.go:54-99).
int jt_av_encode_test_m4a(const char *path, const float *pcm, long n, int ch,
                          int rate) {
  av_log_set_level(AV_LOG_ERROR);
  AVFormatContext *fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, nullptr, path) < 0 || !fmt)
    return -1;
  const AVCodec *codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  if (!codec) return -2;
  AVCodecContext *enc = avcodec_alloc_context3(codec);
  enc->sample_rate = rate;
  av_channel_layout_default(&enc->ch_layout, ch);
  enc->sample_fmt = AV_SAMPLE_FMT_FLTP;
  enc->bit_rate = 128000;
  enc->time_base = AVRational{1, rate};
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  if (avcodec_open2(enc, codec, nullptr) < 0) return -3;
  AVStream *st = avformat_new_stream(fmt, nullptr);
  avcodec_parameters_from_context(st->codecpar, enc);
  st->time_base = enc->time_base;
  if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame *f = av_frame_alloc();
  f->format = AV_SAMPLE_FMT_FLTP;
  f->nb_samples = enc->frame_size > 0 ? enc->frame_size : 1024;
  av_channel_layout_copy(&f->ch_layout, &enc->ch_layout);
  f->sample_rate = rate;
  av_frame_get_buffer(f, 0);
  AVPacket *pkt = av_packet_alloc();

  auto drain = [&](bool flush) -> int {
    if (avcodec_send_frame(enc, flush ? nullptr : f) < 0 && !flush) return -6;
    int rc;
    while ((rc = avcodec_receive_packet(enc, pkt)) == 0) {
      av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      av_packet_unref(pkt);
    }
    return (rc == AVERROR(EAGAIN) || rc == AVERROR_EOF) ? 0 : -7;
  };

  long pos = 0;
  int64_t pts = 0;
  int rc = 0;
  while (pos < n && rc == 0) {
    av_frame_make_writable(f);
    const int take =
        static_cast<int>((n - pos) < f->nb_samples ? (n - pos) : f->nb_samples);
    for (int c = 0; c < ch; c++) {
      float *plane = reinterpret_cast<float *>(f->extended_data[c]);
      for (int i = 0; i < take; i++) plane[i] = pcm[(pos + i) * ch + c];
      for (int i = take; i < f->nb_samples; i++) plane[i] = 0.0f;
    }
    f->pts = pts;
    pts += f->nb_samples;
    rc = drain(false);
    pos += take;
  }
  if (rc == 0) rc = drain(true);
  if (rc == 0) av_write_trailer(fmt);

  av_packet_free(&pkt);
  av_frame_free(&f);
  avcodec_free_context(&enc);
  if (fmt->pb) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return rc;
}

}  // extern "C"
