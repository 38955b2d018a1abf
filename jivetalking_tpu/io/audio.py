"""Unified audio open/save facade (the `internal/audio` equivalent).

The reference opens any container FFmpeg can demux (ref:
internal/audio/reader.go:29-170); this rebuild covers the podcast-workflow
containers — FLAC in/out, WAV/AIFF PCM in, and the two lossy source formats
episodes actually arrive in (MP3 via the system libmpg123, Ogg Vorbis via
libvorbisfile) — via the host-side codecs in this package.  Decoded audio
is float32, shape (channels, n).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from . import wav as _wav


@dataclass
class AudioMetadata:
    """Container metadata (ref: internal/audio/reader.go Metadata)."""

    sample_rate: int
    channels: int
    num_samples: int
    duration_secs: float
    format_name: str
    codec_name: str
    bit_depth: int


def open_audio_file(
    path: str, raw_int16: bool = False
) -> tuple[np.ndarray, AudioMetadata]:
    """Decode an audio file fully -> ((channels, n) samples, metadata).

    float32 by default; `raw_int16=True` keeps 16-bit PCM streams as int16
    (half the host memory and half the host->device bytes — the fused
    device programs downmix/convert in-graph), falling back to float32 for
    deeper or float sources."""
    ext = os.path.splitext(path)[1].lower()
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    if ext == ".wav":
        samples, rate = _wav.read_wav(path, raw_int16=raw_int16)
        info = _wav.wav_info(path)
        meta = AudioMetadata(
            sample_rate=rate,
            channels=samples.shape[0],
            num_samples=samples.shape[1],
            duration_secs=samples.shape[1] / rate,
            format_name="wav",
            codec_name=f"pcm_s{info.bits_per_sample}le"
            if info.format_tag == _wav.WAVE_FORMAT_PCM
            else "pcm_f32le",
            bit_depth=info.bits_per_sample,
        )
        return samples, meta
    if ext == ".flac":
        from . import flac as _flac

        samples, rate, bits = _flac.read_flac(path, raw_int16=raw_int16)
        meta = AudioMetadata(
            sample_rate=rate,
            channels=samples.shape[0],
            num_samples=samples.shape[1],
            duration_secs=samples.shape[1] / rate,
            format_name="flac",
            codec_name="flac",
            bit_depth=bits,
        )
        return samples, meta
    if ext in (".aiff", ".aif", ".aifc"):
        from . import aiff as _aiff

        samples, rate, bits = _aiff.read_aiff(path, raw_int16=raw_int16)
        meta = AudioMetadata(
            sample_rate=rate,
            channels=samples.shape[0],
            num_samples=samples.shape[1],
            duration_secs=samples.shape[1] / rate,
            format_name="aiff",
            codec_name=f"pcm_s{bits}be",
            bit_depth=bits,
        )
        return samples, meta
    if ext == ".mp3":
        from . import mp3 as _mp3

        samples, rate, bits = _mp3.read_mp3(path, raw_int16=raw_int16)
        meta = AudioMetadata(
            sample_rate=rate,
            channels=samples.shape[0],
            num_samples=samples.shape[1],
            duration_secs=samples.shape[1] / rate,
            format_name="mp3",
            codec_name="mp3",
            bit_depth=bits,  # 0: lossy, no container quantisation depth
        )
        return samples, meta
    if ext in (".ogg", ".oga", ".opus"):
        codec = "opus" if ext == ".opus" else "vorbis"
        if codec == "vorbis":
            from . import ogg as _ogg

            try:
                samples, rate, bits = _ogg.read_ogg(path, raw_int16=raw_int16)
            except ValueError as vorbis_err:
                # the Ogg container also carries Opus, FLAC and Speex; try
                # the Opus reader, then the generic FFmpeg fallback, and
                # only then surface the original Vorbis diagnostic
                from . import opus as _opus

                try:
                    samples, rate, bits = _opus.read_opus(path, raw_int16=raw_int16)
                    codec = "opus"
                except (ValueError, RuntimeError):
                    from . import generic as _generic

                    try:
                        samples, rate, bits, codec = _generic.read_generic(
                            path, raw_int16=raw_int16
                        )
                    except (ValueError, RuntimeError):
                        raise vorbis_err from None
        else:
            from . import opus as _opus

            samples, rate, bits = _opus.read_opus(path, raw_int16=raw_int16)
        meta = AudioMetadata(
            sample_rate=rate,
            channels=samples.shape[0],
            num_samples=samples.shape[1],
            duration_secs=samples.shape[1] / rate,
            format_name="ogg",
            codec_name=codec,
            bit_depth=bits,
        )
        return samples, meta
    # anything else falls back to the generic reader (native/avio.cpp over
    # the system FFmpeg libs) — the same "opens anything FFmpeg demuxes"
    # surface as the reference (reader.go:29-170), container I/O only
    from . import generic as _generic

    try:
        samples, rate, bits, codec = _generic.read_generic(path, raw_int16=raw_int16)
    except ValueError as exc:
        raise ValueError(
            f"unsupported audio format: {path!r} "
            "(dedicated readers: .wav, .flac, .aiff/.aif/.aifc, .mp3, "
            f".ogg/.oga, .opus; the generic FFmpeg fallback said: {exc})"
        ) from None
    meta = AudioMetadata(
        sample_rate=rate,
        channels=samples.shape[0],
        num_samples=samples.shape[1],
        duration_secs=samples.shape[1] / rate,
        format_name=ext.lstrip(".") or "unknown",
        codec_name=codec,
        bit_depth=bits,
    )
    return samples, meta


def save_flac(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Encode float samples to FLAC s16 (the reference's output contract:
    FLAC s16, compression level 5, 4096-sample frames — ref:
    internal/processor/encoder.go:54-99)."""
    from . import flac as _flac

    _flac.write_flac(path, samples, sample_rate)


def downmix_mono(samples: np.ndarray) -> np.ndarray:
    """Mean over channels -> float32 in [-1, 1] (ref
    `aformat=channel_layouts=mono`, internal/processor/filters.go:607-615).
    int16 input (the raw_int16 decode path) is normalised by 32768."""
    x = np.asarray(samples)
    scale = np.float32(1.0 / 32768.0) if x.dtype == np.int16 else np.float32(1.0)
    if x.ndim == 1:
        return x.astype(np.float32) * scale
    if x.shape[0] == 1:
        return x[0].astype(np.float32) * scale
    return (x.mean(axis=0, dtype=np.float64) * scale).astype(np.float32)
