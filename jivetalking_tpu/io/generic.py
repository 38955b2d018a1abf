"""Generic container fallback reader (native/avio.cpp over the system
FFmpeg libs).

The reference opens anything FFmpeg demuxes (ref: internal/audio/
reader.go:29-170).  The dedicated readers in this package (WAV, FLAC,
AIFF, MP3, Vorbis, Opus) cover the podcast workflow; this fallback closes
the remainder — m4a/AAC, mp4, mka, webm, anything else the distro's
libavformat demuxes — as host-side container I/O only (all DSP stays in
the JAX package).  The shim is our own C++ (built on demand like flacio)
linking the system shared libraries; no FFmpeg code is vendored.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from .native_loader import make_native_loader

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")


def _configure(lib: ctypes.CDLL) -> None:
    lib.jt_av_open.restype = ctypes.c_void_p
    lib.jt_av_open.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.jt_av_read.restype = ctypes.c_long
    lib.jt_av_read.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
    ]
    lib.jt_av_codec_name.restype = ctypes.c_char_p
    lib.jt_av_codec_name.argtypes = [ctypes.c_void_p]
    lib.jt_av_close.restype = None
    lib.jt_av_close.argtypes = [ctypes.c_void_p]


_load = make_native_loader(
    os.path.join(_NATIVE_DIR, "avio.cpp"),
    os.path.join(_NATIVE_DIR, "libavio.so"),
    _configure,
    link_args=("-lavformat", "-lavcodec", "-lavutil"),
)


def is_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def read_generic(
    path: str, raw_int16: bool = False
) -> tuple[np.ndarray, int, int, str]:
    """Decode any FFmpeg-demuxable container's best audio stream ->
    ((channels, n) float32, rate, bit_depth, codec_name).

    bit_depth comes from the container's bits_per_raw_sample (0 for lossy
    codecs).  `raw_int16` is accepted for signature parity but ignored —
    the fallback decodes to float32 (same rationale as the lossy readers:
    quantising would saturate codec overshoot).  A mid-stream decode
    error raises (hard error, mirroring flacio's contract), never a
    silent truncation.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        lib = _load()
    except (OSError, subprocess.CalledProcessError) as exc:
        raise ValueError(
            f"unsupported audio format: {path!r} (the FFmpeg fallback "
            f"reader is unavailable on this host: {exc})"
        ) from exc
    rate = ctypes.c_int(0)
    channels = ctypes.c_int(0)
    bits = ctypes.c_int(0)
    err = ctypes.create_string_buffer(512)
    handle = lib.jt_av_open(
        path.encode(),
        ctypes.byref(rate),
        ctypes.byref(channels),
        ctypes.byref(bits),
        err,
        len(err),
    )
    if not handle:
        raise ValueError(
            f"cannot decode {path!r}: {err.value.decode('utf-8', 'replace')}"
        )
    try:
        codec = (lib.jt_av_codec_name(handle) or b"unknown").decode()
        ch = channels.value
        block = 1 << 18  # samples per channel per read
        buf = np.empty(block * ch, np.float32)
        buf_p = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        chunks: list[np.ndarray] = []
        while True:
            got = int(lib.jt_av_read(handle, buf_p, block))
            if got == 0:
                break
            if got < 0:
                raise ValueError(
                    f"decode error mid-stream in {path!r} (corrupt input)"
                )
            chunks.append(buf[: got * ch].reshape(got, ch).T.copy())
        if not chunks:
            raise ValueError(f"no audio decoded from {path!r}")
        samples = np.ascontiguousarray(np.concatenate(chunks, axis=1))
        return samples, rate.value, max(0, bits.value), codec
    finally:
        lib.jt_av_close(handle)
