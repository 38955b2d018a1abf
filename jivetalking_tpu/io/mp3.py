"""MP3 reader via the system libmpg123 (ctypes, no compilation).

The reference opens anything FFmpeg demuxes (ref: internal/audio/
reader.go:29-170); MP3 is by far the most common lossy container podcast
source material arrives in, so the rebuild decodes it host-side through
the distro's mpg123 — the same battle-tested decoder FFmpeg's own mp3
path descends from.  Decode is float32 (mpg123's internal synth output;
no 16-bit round trip), gapless when the stream carries a LAME info tag
(mpg123 default).  `raw_int16=True` requests the decoder's s16 output
instead, matching the WAV/FLAC/AIFF readers' raw path.

Layout: (channels, n) like every other reader in this package.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import threading

import numpy as np

_LIB_CANDIDATES = ("libmpg123.so.0", "libmpg123.so", "mpg123")

# return codes (mpg123.h)
_MPG123_OK = 0
_MPG123_DONE = -12
_MPG123_NEW_FORMAT = -11
_MPG123_NEED_MORE = -10

# encodings (fmt123.h)
_MPG123_ENC_FLOAT_32 = 0x200

# mpg123_param keys/flags (mpg123.h)
_MPG123_ADD_FLAGS = 2
_MPG123_FLAG_QUIET = 0x20
_MPG123_FLAG_FORCE_FLOAT = 0x400

_lib = None
_load_lock = threading.Lock()


def _load() -> ctypes.CDLL:
    # the global is published only AFTER prototypes are set (the CLI pool
    # opens files from worker threads; a half-initialised library would
    # hand a second thread c_int-truncated function pointers)
    global _lib
    if _lib is not None:
        return _lib
    with _load_lock:
        if _lib is not None:
            return _lib
        lib = None
        last = None
        for name in _LIB_CANDIDATES:
            try:
                lib = ctypes.CDLL(name)
                break
            except OSError as exc:  # pragma: no cover - depends on system
                last = exc
        if lib is None:  # pragma: no cover
            found = ctypes.util.find_library("mpg123")
            if found:
                lib = ctypes.CDLL(found)
            else:
                raise RuntimeError(
                    "libmpg123 not found - MP3 decode unavailable on this host"
                ) from last
        # mpg123_init is required before mpg123_new on libmpg123 < 1.27 and
        # a harmless no-op after; call unconditionally when present.
        if hasattr(lib, "mpg123_init"):
            lib.mpg123_init.restype = ctypes.c_int
            lib.mpg123_init()
        lib.mpg123_new.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int)]
        lib.mpg123_new.restype = ctypes.c_void_p
        lib.mpg123_delete.argtypes = [ctypes.c_void_p]
        lib.mpg123_open.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.mpg123_open.restype = ctypes.c_int
        lib.mpg123_close.argtypes = [ctypes.c_void_p]
        lib.mpg123_close.restype = ctypes.c_int
        lib.mpg123_getformat.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mpg123_getformat.restype = ctypes.c_int
        lib.mpg123_format_none.argtypes = [ctypes.c_void_p]
        lib.mpg123_format_none.restype = ctypes.c_int
        lib.mpg123_format.argtypes = [
            ctypes.c_void_p,
            ctypes.c_long,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.mpg123_format.restype = ctypes.c_int
        lib.mpg123_read.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.mpg123_read.restype = ctypes.c_int
        lib.mpg123_param.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_double,
        ]
        lib.mpg123_param.restype = ctypes.c_int
        lib.mpg123_scan.argtypes = [ctypes.c_void_p]
        lib.mpg123_scan.restype = ctypes.c_int
        lib.mpg123_strerror.argtypes = [ctypes.c_void_p]
        lib.mpg123_strerror.restype = ctypes.c_char_p
        _lib = lib
        return lib


def is_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _err(lib, handle, what: str) -> RuntimeError:
    msg = ""
    if handle:
        raw = lib.mpg123_strerror(handle)
        msg = (raw or b"").decode("utf-8", "replace")
    return RuntimeError(f"mpg123 {what} failed: {msg or 'unknown error'}")


def read_mp3(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int, int]:
    """Decode an MP3 file -> ((channels, n) float32 samples, rate, bit_depth 0).

    bit_depth is 0: lossy sources have no container quantisation depth
    (matches FFmpeg's bits_per_raw_sample=0 for mp3), so the 16-bit
    noise-floor display clamp downstream stays off.

    `raw_int16` is accepted for reader-signature parity but ignored: the
    flag's contract is "keep 16-bit PCM STREAMS as int16" (a lossless
    transport saving) — an MP3 is not a 16-bit PCM stream, its decode is
    float-native, and quantising here would saturate codec overshoot
    (hot-mastered material overshoots full scale; the reference measures
    input true peak on the unclipped float decode).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    lib = _load()
    errcode = ctypes.c_int(0)
    handle = lib.mpg123_new(None, ctypes.byref(errcode))
    if not handle:
        raise RuntimeError(f"mpg123_new failed (code {errcode.value})")
    try:
        # decoder flags must precede open: a post-open mpg123_format call
        # does not re-negotiate the already-locked stream format (measured
        # on libmpg123 1.31)
        flags = _MPG123_FLAG_QUIET | _MPG123_FLAG_FORCE_FLOAT
        lib.mpg123_param(handle, _MPG123_ADD_FLAGS, flags, 0.0)
        if lib.mpg123_open(handle, path.encode()) != _MPG123_OK:
            raise _err(lib, handle, "open")
        try:
            rate = ctypes.c_long(0)
            channels = ctypes.c_int(0)
            encoding = ctypes.c_int(0)
            if (
                lib.mpg123_getformat(
                    handle,
                    ctypes.byref(rate),
                    ctypes.byref(channels),
                    ctypes.byref(encoding),
                )
                != _MPG123_OK
            ):
                raise _err(lib, handle, "getformat")
            want_enc = _MPG123_ENC_FLOAT_32
            if encoding.value != want_enc:
                raise RuntimeError(
                    f"mpg123 negotiated encoding {encoding.value:#x}, "
                    f"wanted {want_enc:#x} (libmpg123 built without float?)"
                )
            # lock the negotiated format so a mid-stream rate change errors
            # instead of silently resizing the output
            lib.mpg123_format_none(handle)
            if (
                lib.mpg123_format(handle, rate.value, channels.value, want_enc)
                != _MPG123_OK
            ):
                raise _err(lib, handle, "format")
            # scan the whole stream once: exact sample count for the frame
            # index AND gapless bounds from the LAME tag when present
            lib.mpg123_scan(handle)

            itemsize = 4
            dtype = np.float32
            bufsize = 1 << 20
            buf = (ctypes.c_char * bufsize)()
            done = ctypes.c_size_t(0)
            parts: list[bytes] = []
            while True:
                rc = lib.mpg123_read(handle, buf, bufsize, ctypes.byref(done))
                if done.value:
                    parts.append(bytes(buf[: done.value]))
                if rc == _MPG123_DONE:
                    break
                if rc == _MPG123_NEW_FORMAT:
                    # forced format above means the decoder converts; a NEW
                    # FORMAT here would be a rate change mid-stream, which
                    # the forced table rejects - re-read continues
                    continue
                if rc not in (_MPG123_OK, _MPG123_NEED_MORE):
                    raise _err(lib, handle, "read")
                if rc == _MPG123_NEED_MORE and not done.value:
                    break  # truncated stream: keep what decoded
            raw = b"".join(parts)
            n_items = len(raw) // itemsize
            flat = np.frombuffer(raw, dtype=dtype, count=n_items)
            ch = max(1, channels.value)
            n = n_items // ch
            if n == 0:
                raise ValueError(f"no audio decoded from {path!r}")
            samples = (
                flat[: n * ch].reshape(n, ch).T.copy()
            )  # interleaved -> (channels, n)
            # no clipping: codec overshoot above full scale is real signal
            # the input true-peak measurement must see
            return samples, int(rate.value), 0
        finally:
            lib.mpg123_close(handle)
    finally:
        lib.mpg123_delete(handle)
