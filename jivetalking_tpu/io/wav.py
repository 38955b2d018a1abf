"""RIFF/WAVE reader + writer over numpy.

Host-side codec layer replacing the reference's libavformat/libavcodec WAV
path (ref: internal/audio/reader.go:29-170).  Supports PCM 16/24/32-bit and
IEEE float32/float64, mono or multichannel, plus WAVE_FORMAT_EXTENSIBLE.
Decoded audio is returned as float32 in [-1, 1] with shape (channels, n).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

WAVE_FORMAT_PCM = 0x0001
WAVE_FORMAT_IEEE_FLOAT = 0x0003
WAVE_FORMAT_EXTENSIBLE = 0xFFFE


@dataclass
class WavInfo:
    sample_rate: int
    channels: int
    bits_per_sample: int
    num_frames: int
    format_tag: int


def _iter_chunks(data: bytes):
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        yield cid, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def read_wav(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int]:
    """Decode a WAV file -> ((channels, n) samples, sample_rate).

    float32 in [-1, 1] by default; `raw_int16=True` keeps 16-bit PCM as
    int16 without scaling (half the memory/transfer bytes; the in-graph
    downmix converts on device) and falls back to float32 otherwise."""
    with open(path, "rb") as f:
        data = f.read()

    fmt = None
    pcm = None
    for cid, body in _iter_chunks(data):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            pcm = body
    if fmt is None or pcm is None:
        raise ValueError(f"{path}: missing fmt/data chunk")

    format_tag, channels, sample_rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if format_tag == WAVE_FORMAT_EXTENSIBLE:
        if len(fmt) < 40:
            raise ValueError("malformed WAVE_FORMAT_EXTENSIBLE fmt chunk")
        format_tag = struct.unpack("<H", fmt[24:26])[0]

    if channels < 1:
        raise ValueError("zero channels")
    bytes_per_sample = bits // 8
    if block_align == 0:
        block_align = bytes_per_sample * channels
    num_frames = len(pcm) // block_align
    pcm = pcm[: num_frames * block_align]

    if format_tag == WAVE_FORMAT_PCM and bits == 16:
        if raw_int16:
            x = np.frombuffer(pcm, dtype="<i2")
        else:
            x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    elif format_tag == WAVE_FORMAT_PCM and bits == 24:
        raw = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3)
        ints = (
            raw[:, 0].astype(np.int32)
            | (raw[:, 1].astype(np.int32) << 8)
            | (raw[:, 2].astype(np.int32) << 16)
        )
        ints = (ints << 8) >> 8  # sign-extend 24 -> 32
        x = ints.astype(np.float32) / 8388608.0
    elif format_tag == WAVE_FORMAT_PCM and bits == 32:
        x = np.frombuffer(pcm, dtype="<i4").astype(np.float32) / 2147483648.0
    elif format_tag == WAVE_FORMAT_PCM and bits == 8:
        x = (np.frombuffer(pcm, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif format_tag == WAVE_FORMAT_IEEE_FLOAT and bits == 32:
        x = np.frombuffer(pcm, dtype="<f4").astype(np.float32)
    elif format_tag == WAVE_FORMAT_IEEE_FLOAT and bits == 64:
        x = np.frombuffer(pcm, dtype="<f8").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format tag={format_tag} bits={bits}")

    x = x.reshape(num_frames, channels).T.copy()
    return x, sample_rate


def wav_info(path: str) -> WavInfo:
    with open(path, "rb") as f:
        data = f.read(65536)
    fmt = None
    data_size = None
    for cid, body in _iter_chunks(data):
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            # body may be truncated; use the declared size
            idx = data.find(b"data")
            data_size = struct.unpack("<I", data[idx + 4 : idx + 8])[0]
        if fmt is not None and data_size is not None:
            break
    if fmt is None:
        raise ValueError(f"{path}: missing fmt chunk")
    format_tag, channels, sample_rate, _, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if format_tag == WAVE_FORMAT_EXTENSIBLE and len(fmt) >= 26:
        format_tag = struct.unpack("<H", fmt[24:26])[0]
    if block_align == 0:
        block_align = (bits // 8) * channels
    frames = (data_size or 0) // max(1, block_align)
    return WavInfo(sample_rate, channels, bits, frames, format_tag)


def write_wav(
    path: str,
    samples: np.ndarray,
    sample_rate: int,
    bits: int = 16,
) -> None:
    """Write float samples (shape (n,) or (channels, n), values in [-1,1]) as PCM WAV."""
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[None, :]
    channels, n = x.shape
    interleaved = np.ascontiguousarray(x.T, dtype=np.float64)
    clipped = np.clip(interleaved, -1.0, 1.0)

    if bits == 16:
        pcm = (clipped * 32767.0).round().astype("<i2").tobytes()
        fmt_tag = WAVE_FORMAT_PCM
    elif bits == 24:
        ints = (clipped * 8388607.0).round().astype(np.int32)
        b = np.empty((ints.size, 3), dtype=np.uint8)
        b[:, 0] = ints.ravel() & 0xFF
        b[:, 1] = (ints.ravel() >> 8) & 0xFF
        b[:, 2] = (ints.ravel() >> 16) & 0xFF
        pcm = b.tobytes()
        fmt_tag = WAVE_FORMAT_PCM
    elif bits == 32:
        pcm = clipped.astype("<f4").tobytes()
        fmt_tag = WAVE_FORMAT_IEEE_FLOAT
    else:
        raise ValueError(f"unsupported bit depth {bits}")

    byte_rate = sample_rate * channels * (bits // 8)
    block_align = channels * (bits // 8)
    header = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
    header += b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_tag, channels, sample_rate, byte_rate, block_align, bits
    )
    header += b"data" + struct.pack("<I", len(pcm))
    with open(path, "wb") as f:
        f.write(header)
        f.write(pcm)
