"""AIFF / AIFF-C (uncompressed PCM) reader.

The reference opens anything FFmpeg demuxes (ref: internal/audio/
reader.go:29-170); the rebuild's surface is the podcast-workflow subset.
AIFF is the macOS-native PCM container voice stems frequently arrive in
(Logic/GarageBand exports), and it is a plain IFF chunk format — this
decodes FORM/AIFF and FORM/AIFC with uncompressed ("NONE" / the
byte-swapped "sowt") 8/16/24/32-bit integer PCM.  Compressed AIFC
codecs raise with the codec named.
"""

from __future__ import annotations

import struct

import numpy as np


def _f80_to_int(b: bytes) -> int:
    """IEEE 754 80-bit extended float -> int (the COMM sample rate)."""
    sign_exp = struct.unpack(">H", b[:2])[0]
    mantissa = struct.unpack(">Q", b[2:10])[0]
    exp = (sign_exp & 0x7FFF) - 16383
    if sign_exp & 0x8000:
        raise ValueError("negative AIFF sample rate")
    if exp == -16383 and mantissa == 0:
        return 0
    return int(round(mantissa * 2.0 ** (exp - 63)))


def _iter_chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid, size = struct.unpack(">4sI", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        yield cid, body
        pos += 8 + size + (size & 1)      # chunks pad to even length


def aiff_info(path: str) -> tuple[int, int, int, int]:
    """(channels, sample_rate, n_frames, bits)."""
    _, meta = _read(path, header_only=True)
    return meta


def read_aiff(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int, int]:
    """Decode an AIFF/AIFC file -> ((channels, n) samples, rate, bits).

    float32 in [-1, 1] by default; `raw_int16=True` keeps 16-bit PCM as
    int16 (the same transfer-width convention as the WAV/FLAC readers)."""
    (samples, rate, bits), _ = _read(path, raw_int16=raw_int16)
    return samples, rate, bits


def _read(path: str, raw_int16: bool = False, header_only: bool = False):
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 12 or data[:4] != b"FORM" or data[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError(f"{path}: not an AIFF/AIFC file")
    is_aifc = data[8:12] == b"AIFC"

    comm = None
    ssnd = None
    for cid, body in _iter_chunks(data):
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
    if comm is None or ssnd is None:
        raise ValueError(f"{path}: missing COMM/SSND chunk")

    channels, n_frames, bits = struct.unpack(">HIH", comm[:8])
    rate = _f80_to_int(comm[8:18])
    little_endian = False
    if is_aifc:
        codec = comm[18:22]
        if codec == b"sowt":
            little_endian = True
        elif codec not in (b"NONE", b"none"):
            raise ValueError(
                f"{path}: unsupported AIFC codec {codec.decode('ascii', 'replace')!r} "
                "(supported: uncompressed PCM 'NONE'/'sowt')"
            )
    if channels < 1 or rate <= 0:
        raise ValueError(f"{path}: malformed COMM chunk")
    if header_only:
        return None, (channels, rate, n_frames, bits)

    offset, _block = struct.unpack(">II", ssnd[:8])
    pcm = ssnd[8 + offset :]
    bps = (bits + 7) // 8
    n = min(n_frames, len(pcm) // (bps * channels))
    pcm = pcm[: n * bps * channels]

    order = "<" if little_endian else ">"
    if bits == 16:
        x = np.frombuffer(pcm, dtype=np.dtype(f"{order}i2")).reshape(n, channels).T
        if raw_int16:
            return (np.ascontiguousarray(x.astype(np.int16)), rate, bits), None
        return ((x.astype(np.float32) / 32768.0), rate, bits), None
    if bits == 8:
        x = np.frombuffer(pcm, dtype=np.int8).reshape(n, channels).T
        return ((x.astype(np.float32) / 128.0), rate, bits), None
    if bits in (24, 32):
        raw = np.frombuffer(pcm, dtype=np.uint8).reshape(n, channels, bps)
        if little_endian:
            raw = raw[:, :, ::-1]
        acc = np.zeros((n, channels), dtype=np.int64)
        for i in range(bps):
            acc = (acc << 8) | raw[:, :, i]
        sign = 1 << (bits - 1)
        acc = (acc ^ sign) - sign          # sign-extend
        scale = float(1 << (bits - 1))
        return ((acc.T.astype(np.float32) / scale), rate, bits), None
    raise ValueError(f"{path}: unsupported AIFF bit depth {bits}")
