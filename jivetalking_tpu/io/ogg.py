"""Ogg Vorbis reader via the system libvorbisfile (ctypes, no compilation).

The reference opens anything FFmpeg demuxes (ref: internal/audio/
reader.go:29-170); Ogg Vorbis is the free-codec counterpart of MP3 in
podcast source archives, so the rebuild decodes it host-side through the
distro's libvorbisfile — the codec's own reference decoder.  Output is
float32 straight from `ov_read_float` (no 16-bit round trip), shape
(channels, n) like every other reader in this package.
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

# OggVorbis_File is an opaque struct owned by libvorbisfile; over-allocate
# generously (real size ~944 bytes on x86-64) — the library only touches
# its own prefix.
_OVFILE_SIZE = 8192


class _VorbisInfo(ctypes.Structure):
    """Leading fields of vorbis_info (codec.h) — layout is part of the
    library's public ABI."""

    _fields_ = [
        ("version", ctypes.c_int),
        ("channels", ctypes.c_int),
        ("rate", ctypes.c_long),
        ("bitrate_upper", ctypes.c_long),
        ("bitrate_nominal", ctypes.c_long),
        ("bitrate_lower", ctypes.c_long),
        ("bitrate_window", ctypes.c_long),
        ("codec_setup", ctypes.c_void_p),
    ]


_lib = None
_load_lock = threading.Lock()


def _load() -> ctypes.CDLL:
    # the global is published only AFTER prototypes are set (the CLI pool
    # opens files from worker threads; a half-initialised library would
    # hand a second thread a c_int-truncated _VorbisInfo pointer)
    global _lib
    if _lib is not None:
        return _lib
    with _load_lock:
        if _lib is not None:
            return _lib
        lib = None
        for name in ("libvorbisfile.so.3", "libvorbisfile.so", "vorbisfile"):
            try:
                lib = ctypes.CDLL(name)
                break
            except OSError:
                continue
        if lib is None:  # pragma: no cover - depends on system
            raise RuntimeError(
                "libvorbisfile not found - Ogg Vorbis decode unavailable on this host"
            )
        lib.ov_fopen.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        lib.ov_fopen.restype = ctypes.c_int
        lib.ov_clear.argtypes = [ctypes.c_void_p]
        lib.ov_clear.restype = ctypes.c_int
        lib.ov_info.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_info.restype = ctypes.POINTER(_VorbisInfo)
        lib.ov_streams.argtypes = [ctypes.c_void_p]
        lib.ov_streams.restype = ctypes.c_long
        lib.ov_pcm_total.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ov_pcm_total.restype = ctypes.c_int64
        lib.ov_read_float.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.POINTER(ctypes.c_float))),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ov_read_float.restype = ctypes.c_long
        _lib = lib
        return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def read_ogg(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int, int]:
    """Decode an Ogg Vorbis file -> ((channels, n) float32, rate, bit_depth 0).

    bit_depth is 0: lossy sources carry no container quantisation depth,
    so the 16-bit noise-floor display clamp downstream stays off.
    `raw_int16` is accepted for reader-signature parity but ignored: the
    flag's contract is "keep 16-bit PCM STREAMS as int16" (a lossless
    transport saving) — Vorbis is not a 16-bit PCM stream, its decode is
    float-native, and quantising here would saturate codec overshoot the
    input true-peak measurement must see (same contract as read_mp3).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    lib = _load()
    vf = ctypes.create_string_buffer(_OVFILE_SIZE)
    rc = lib.ov_fopen(path.encode(), vf)
    if rc != 0:
        raise ValueError(f"not a decodable Ogg Vorbis stream: {path!r} (ov_fopen {rc})")
    try:
        # chained Ogg (concatenated logical streams) may change channel
        # count/rate across links, which would make the fixed (ch, n)
        # layout below read wild channel pointers — reject it up front,
        # like the MP3 reader's locked format table
        n_streams = int(lib.ov_streams(vf))
        if n_streams != 1:
            raise ValueError(
                f"chained Ogg with {n_streams} logical streams is not "
                f"supported: {path!r} (re-encode as a single stream)"
            )
        info = lib.ov_info(vf, -1)
        if not info:
            raise ValueError(f"ov_info failed for {path!r}")
        ch = int(info.contents.channels)
        rate = int(info.contents.rate)
        total = int(lib.ov_pcm_total(vf, -1))
        chunks: list[np.ndarray] = []
        pcm = ctypes.POINTER(ctypes.POINTER(ctypes.c_float))()
        bitstream = ctypes.c_int(0)
        while True:
            got = lib.ov_read_float(vf, ctypes.byref(pcm), 65536, ctypes.byref(bitstream))
            if got == 0:
                break
            if got < 0:
                # OV_HOLE (-3): a corrupt page was skipped - continue with
                # what decodes, mirroring mpg123's lenient policy
                if got == -3:
                    continue
                raise ValueError(f"ov_read_float failed ({got}) for {path!r}")
            block = np.empty((ch, got), np.float32)
            for c in range(ch):
                block[c] = np.ctypeslib.as_array(pcm[c], shape=(got,))
            chunks.append(block)
        if not chunks:
            raise ValueError(f"no audio decoded from {path!r}")
        samples = np.concatenate(chunks, axis=1)
        if 0 < total < samples.shape[1]:
            samples = samples[:, :total]
        # no clipping: codec overshoot above full scale is real signal
        # the input true-peak measurement must see
        return np.ascontiguousarray(samples), rate, 0
    finally:
        lib.ov_clear(vf)
