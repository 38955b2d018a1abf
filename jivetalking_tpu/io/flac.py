"""FLAC decode/encode via the native C++ codec (ctypes binding).

The codec (native/flacio.cpp) is a from-scratch FLAC implementation — the
host-side native replacement for the reference's FFmpeg FLAC path (ref:
internal/audio/reader.go:29-170 decode; internal/processor/encoder.go:21-142
encode: s16, frame 4096).  The shared library is built on demand with g++
the first time it is needed (no pip/apt available in this environment)."""

from __future__ import annotations

import ctypes
import os

import numpy as np

from .native_loader import make_native_loader

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")


def _configure(lib: ctypes.CDLL) -> None:
    lib.flac_decode_file.restype = ctypes.c_long
    lib.flac_decode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.flac_encode_file.restype = ctypes.c_int
    lib.flac_encode_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.flac_free.restype = None
    lib.flac_free.argtypes = [ctypes.c_void_p]
    lib.flac_open_stream.restype = ctypes.c_void_p
    lib.flac_open_stream.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.flac_read_stream.restype = ctypes.c_long
    lib.flac_read_stream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_long,
    ]
    lib.flac_close_stream.restype = None
    lib.flac_close_stream.argtypes = [ctypes.c_void_p]


_load = make_native_loader(
    os.path.join(_NATIVE_DIR, "flacio.cpp"),
    os.path.join(_NATIVE_DIR, "libflacio.so"),
    _configure,
)


def read_flac(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC file -> ((channels, n) samples, sample_rate, bit_depth).

    Default output is float32 normalised to [-1, 1] by the stream's bit
    depth.  `raw_int16=True` returns the PCM as int16 WITHOUT scaling when
    the stream is 16-bit (the common case): half the host memory and half
    the host->device transfer bytes, with the int16->f32 conversion
    happening in-graph on device (fused._to_mono_f32).  Deeper streams
    (20/24-bit) fall back to float32 so no input precision is lost."""
    lib = _load()
    pcm_ptr = ctypes.POINTER(ctypes.c_int32)()
    channels = ctypes.c_int()
    rate = ctypes.c_int()
    bits = ctypes.c_int()
    n = lib.flac_decode_file(
        path.encode(), ctypes.byref(pcm_ptr), ctypes.byref(channels),
        ctypes.byref(rate), ctypes.byref(bits),
    )
    if n < 0:
        raise ValueError(f"failed to decode FLAC file: {path}")
    try:
        total = n * channels.value
        arr = np.ctypeslib.as_array(pcm_ptr, shape=(total,)).copy()
    finally:
        lib.flac_free(pcm_ptr)
    if raw_int16 and bits.value == 16:
        samples = arr.astype(np.int16).reshape(n, channels.value).T
        return np.ascontiguousarray(samples), rate.value, bits.value
    scale = float(1 << (bits.value - 1))
    samples = (arr.astype(np.float32) / scale).reshape(n, channels.value).T
    return np.ascontiguousarray(samples), rate.value, bits.value


class FlacStreamReader:
    """Bounded-memory FLAC reader: decodes caller-sized chunks through the
    native streaming decoder (the reference reads O(frame),
    internal/audio/reader.go:129-170 — this is the chunked equivalent;
    the compressed bytes stay resident, decoded PCM never does)."""

    def __init__(self, path: str):
        self._lib = _load()
        ch = ctypes.c_int()
        rate = ctypes.c_int()
        bits = ctypes.c_int()
        total = ctypes.c_long()
        self._h = self._lib.flac_open_stream(
            path.encode(), ctypes.byref(ch), ctypes.byref(rate),
            ctypes.byref(bits), ctypes.byref(total),
        )
        if not self._h:
            raise ValueError(f"failed to open FLAC stream: {path}")
        self.channels = ch.value
        self.sample_rate = rate.value
        self.bit_depth = bits.value
        self.total_samples = total.value

    def read(self, max_samples: int, raw_int16: bool = False) -> np.ndarray:
        """Next chunk as (channels, n) with n <= max_samples; empty array at
        end of stream.  float32 in [-1, 1], or int16 when `raw_int16` and
        the stream is 16-bit."""
        if self._h is None:
            raise ValueError("stream closed")
        buf = np.empty(max_samples * self.channels, dtype=np.int32)
        n = self._lib.flac_read_stream(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_samples,
        )
        if n < 0:
            raise ValueError("FLAC stream decode error")
        arr = buf[: n * self.channels].reshape(n, self.channels).T
        if raw_int16 and self.bit_depth == 16:
            return np.ascontiguousarray(arr.astype(np.int16))
        scale = float(1 << (self.bit_depth - 1))
        return np.ascontiguousarray(arr.astype(np.float32) / scale)

    def close(self) -> None:
        if self._h is not None:
            self._lib.flac_close_stream(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def write_flac(path: str, samples: np.ndarray, sample_rate: int) -> None:
    """Encode float32 (channels, n) or (n,) PCM to 16-bit FLAC.

    Atomic publish: sibling dot-temp + rename (ref: file_write.go:13-47)."""
    lib = _load()
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[None, :]
    channels, n = x.shape
    if x.dtype == np.int16:
        interleaved = x.T.reshape(-1)
    else:
        interleaved = np.clip(
            x.astype(np.float32).T.reshape(-1) * 32767.0, -32768, 32767
        ).astype(np.int16)
    interleaved = np.ascontiguousarray(interleaved)

    from .atomic import atomic_publish

    with atomic_publish(path, "flac") as tmp:
        rc = lib.flac_encode_file(
            tmp.encode(),
            interleaved.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            ctypes.c_long(n), ctypes.c_int(channels), ctypes.c_int(sample_rate),
        )
        if rc != 0:
            raise IOError(f"failed to encode FLAC file: {path}")


def flac_info(path: str) -> tuple[int, int, int, int]:
    """(n_samples, channels, sample_rate, bits) from the STREAMINFO header
    (no decode); falls back to a full decode for streams that omit the
    total-sample count."""
    with FlacStreamReader(path) as r:
        if r.total_samples > 0:
            return r.total_samples, r.channels, r.sample_rate, r.bit_depth
    samples, rate, bits = read_flac(path)
    return samples.shape[1], samples.shape[0], rate, bits
