"""Ogg Opus reader via the system libogg + libopus (ctypes, no compilation).

The reference opens anything FFmpeg demuxes (ref: internal/audio/
reader.go:29-170); Opus is the modern voice codec podcast masters are
increasingly delivered in.  libogg does the page/packet demux (its own
reference framer), libopus the decode — output is float32 at 48 kHz (the
Opus canonical rate), shape (channels, n), pre-skip and end-trim applied
per RFC 7845 (granulepos semantics).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

_OPAQUE = 8192  # generous over-allocation for opaque libogg structs

_MAX_FRAME = 5760  # 120 ms @ 48 kHz, the largest legal Opus frame
_OPUS_RATE = 48000


class _OggPage(ctypes.Structure):
    _fields_ = [
        ("header", ctypes.c_void_p),
        ("header_len", ctypes.c_long),
        ("body", ctypes.c_void_p),
        ("body_len", ctypes.c_long),
    ]


class _OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", ctypes.c_void_p),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


_libs = None
_load_lock = threading.Lock()


def _load() -> tuple[ctypes.CDLL, ctypes.CDLL]:
    # published only AFTER prototypes are set (worker threads open files)
    global _libs
    if _libs is not None:
        return _libs
    with _load_lock:
        if _libs is not None:
            return _libs
        try:
            ogg = ctypes.CDLL("libogg.so.0")
        except OSError:  # pragma: no cover - depends on system
            raise RuntimeError("libogg not found - Opus decode unavailable")
        try:
            opus = ctypes.CDLL("libopus.so.0")
        except OSError:  # pragma: no cover
            raise RuntimeError("libopus not found - Opus decode unavailable")
        ogg.ogg_sync_init.argtypes = [ctypes.c_void_p]
        ogg.ogg_sync_buffer.argtypes = [ctypes.c_void_p, ctypes.c_long]
        ogg.ogg_sync_buffer.restype = ctypes.c_void_p
        ogg.ogg_sync_wrote.argtypes = [ctypes.c_void_p, ctypes.c_long]
        ogg.ogg_sync_pageout.argtypes = [ctypes.c_void_p, ctypes.POINTER(_OggPage)]
        ogg.ogg_sync_clear.argtypes = [ctypes.c_void_p]
        ogg.ogg_stream_init.argtypes = [ctypes.c_void_p, ctypes.c_int]
        ogg.ogg_stream_pagein.argtypes = [ctypes.c_void_p, ctypes.POINTER(_OggPage)]
        ogg.ogg_stream_packetout.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(_OggPacket),
        ]
        ogg.ogg_stream_clear.argtypes = [ctypes.c_void_p]
        ogg.ogg_page_serialno.argtypes = [ctypes.POINTER(_OggPage)]
        ogg.ogg_page_serialno.restype = ctypes.c_int
        ogg.ogg_page_bos.argtypes = [ctypes.POINTER(_OggPage)]
        ogg.ogg_page_bos.restype = ctypes.c_int
        ogg.ogg_page_granulepos.argtypes = [ctypes.POINTER(_OggPage)]
        ogg.ogg_page_granulepos.restype = ctypes.c_int64
        opus.opus_decoder_create.argtypes = [
            ctypes.c_int32,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        opus.opus_decoder_create.restype = ctypes.c_void_p
        opus.opus_decoder_destroy.argtypes = [ctypes.c_void_p]
        opus.opus_decode_float.argtypes = [
            ctypes.c_void_p,
            ctypes.c_char_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int,
            ctypes.c_int,
        ]
        opus.opus_decode_float.restype = ctypes.c_int
        _libs = (ogg, opus)
        return _libs


def is_available() -> bool:
    try:
        _load()
        return True
    except RuntimeError:
        return False


def _demux_opus_packets(
    path: str, ogg
) -> tuple[list[bytes], int, int, int, float]:
    """Ogg demux -> (audio packets, channels, pre_skip, total_samples,
    output_gain_scale).

    Follows the FIRST logical stream whose BOS packet is OpusHead; other
    grouped streams' pages are skipped by serialno.  A second Opus BOS
    after data starts (chained file) raises, mirroring the Vorbis reader.
    A packet hole (lost/corrupt page) raises — the package-wide hard
    mid-stream-error contract (flacio, ogg.py OV_HOLE handling).
    """
    sync = ctypes.create_string_buffer(_OPAQUE)
    stream = ctypes.create_string_buffer(_OPAQUE)
    page = _OggPage()
    packet = _OggPacket()
    ogg.ogg_sync_init(sync)
    stream_open = False
    serial = None
    channels = pre_skip = None
    gain_scale = 1.0
    header_pkts = 0
    packets: list[bytes] = []
    last_granule = -1
    try:
        with open(path, "rb") as f:
            eof = False
            while not eof:
                data = f.read(1 << 16)
                if not data:
                    eof = True
                else:
                    buf = ogg.ogg_sync_buffer(sync, len(data))
                    ctypes.memmove(buf, data, len(data))
                    ogg.ogg_sync_wrote(sync, len(data))
                while ogg.ogg_sync_pageout(sync, ctypes.byref(page)) == 1:
                    sn = ogg.ogg_page_serialno(ctypes.byref(page))
                    if ogg.ogg_page_bos(ctypes.byref(page)):
                        # peek the BOS page body for the OpusHead magic
                        body = ctypes.string_at(page.body, min(page.body_len, 8))
                        if serial is None and body == b"OpusHead":
                            serial = sn
                            ogg.ogg_stream_init(stream, sn)
                            stream_open = True
                        elif packets:
                            # any new logical stream after audio started is
                            # a chained file (links may change layout)
                            raise ValueError(
                                f"chained Ogg is not supported: {path!r} "
                                "(re-encode as a single stream)"
                            )
                        else:
                            continue  # grouped non-opus stream
                    if serial is None or sn != serial:
                        continue
                    ogg.ogg_stream_pagein(stream, ctypes.byref(page))
                    g = int(ogg.ogg_page_granulepos(ctypes.byref(page)))
                    if g >= 0:
                        last_granule = g
                    while True:
                        rc = ogg.ogg_stream_packetout(stream, ctypes.byref(packet))
                        if rc == 0:
                            break
                        if rc < 0:
                            # a hole (lost/corrupt page) is a hard error,
                            # never a silent audio gap
                            raise ValueError(
                                f"corrupt Ogg Opus stream (packet hole): {path!r}"
                            )
                        raw = ctypes.string_at(packet.packet, packet.bytes)
                        if header_pkts == 0:
                            if not raw.startswith(b"OpusHead") or len(raw) < 19:
                                raise ValueError(
                                    f"malformed OpusHead in {path!r}"
                                )
                            if raw[8] >> 4 != 0:
                                # RFC 7845 §5.1: only the major nibble
                                # signals incompatibility; 0-15 decode fine
                                raise ValueError(
                                    f"incompatible Opus version {raw[8]} in {path!r}"
                                )
                            channels = raw[9]
                            pre_skip = int.from_bytes(raw[10:12], "little")
                            # output gain (Q7.8 dB, signed): RFC 7845 §5.1
                            # says it MUST be applied when decoding
                            gain_q78 = int.from_bytes(raw[16:18], "little", signed=True)
                            if gain_q78:
                                gain_scale = float(10.0 ** (gain_q78 / (20.0 * 256.0)))
                            if raw[18] != 0:
                                raise ValueError(
                                    "Opus mapping family "
                                    f"{raw[18]} (surround) not supported: {path!r}"
                                )
                            header_pkts = 1
                        elif header_pkts == 1:
                            # OpusTags — skipped
                            header_pkts = 2
                        else:
                            packets.append(raw)
    finally:
        if stream_open:
            ogg.ogg_stream_clear(stream)
        ogg.ogg_sync_clear(sync)
    if channels is None:
        raise ValueError(f"not a decodable Ogg Opus stream: {path!r}")
    total = max(0, last_granule - pre_skip) if last_granule >= 0 else -1
    return packets, channels, pre_skip, total, gain_scale


def read_opus(path: str, raw_int16: bool = False) -> tuple[np.ndarray, int, int]:
    """Decode an Ogg Opus file -> ((channels, n) float32, 48000, bit_depth 0).

    bit_depth is 0 (lossy: no container quantisation depth).  `raw_int16`
    is accepted for reader-signature parity but ignored — same contract as
    read_mp3/read_ogg (lossy decode is float-native; quantising would
    saturate codec overshoot).  Output is always 48 kHz, the Opus
    canonical decode rate (the container's `input rate` field is
    informational only, per RFC 7845).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    ogg, opus = _load()
    packets, ch, pre_skip, total, gain_scale = _demux_opus_packets(path, ogg)
    if not packets:
        raise ValueError(f"no audio packets in {path!r}")
    err = ctypes.c_int(0)
    dec = opus.opus_decoder_create(_OPUS_RATE, ch, ctypes.byref(err))
    if not dec or err.value != 0:
        raise RuntimeError(f"opus_decoder_create failed ({err.value})")
    try:
        out = np.empty((_MAX_FRAME * ch,), np.float32)
        out_p = out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        # the final granulepos bounds the decode length up front — write
        # interleaved decode output straight into one buffer (a 1 h file
        # is ~180k packets; per-packet arrays + a giant concatenate would
        # double peak memory)
        cap = (total + pre_skip + _MAX_FRAME) if total >= 0 else None
        flat = np.empty(((cap or 0) * ch,), np.float32)
        chunks: list[np.ndarray] = []
        pos = 0
        for raw in packets:
            got = opus.opus_decode_float(dec, raw, len(raw), out_p, _MAX_FRAME, 0)
            if got < 0:
                raise ValueError(f"opus_decode_float failed ({got}) for {path!r}")
            if not got:
                continue
            if cap is not None:
                if pos + got > cap:  # stream longer than granulepos claims
                    grown = np.empty(((cap + max(got, cap // 2)) * ch,), np.float32)
                    grown[: pos * ch] = flat[: pos * ch]
                    flat, cap = grown, cap + max(got, cap // 2)
                flat[pos * ch : (pos + got) * ch] = out[: got * ch]
                pos += got
            else:
                chunks.append(out[: got * ch].reshape(got, ch).T.copy())
    finally:
        opus.opus_decoder_destroy(dec)
    if cap is not None:
        if pos == 0:
            raise ValueError(f"no audio decoded from {path!r}")
        samples = flat[: pos * ch].reshape(pos, ch).T
    else:
        if not chunks:
            raise ValueError(f"no audio decoded from {path!r}")
        samples = np.concatenate(chunks, axis=1)
    # RFC 7845: drop the encoder priming samples; the final granulepos
    # bounds the real length (end-trim of the last partial frame)
    samples = samples[:, pre_skip:]
    if 0 <= total < samples.shape[1]:
        samples = samples[:, :total]
    if samples.shape[1] == 0:
        raise ValueError(f"no audio decoded from {path!r}")
    samples = np.ascontiguousarray(samples)
    if gain_scale != 1.0:
        # RFC 7845 §5.1 output gain MUST be applied (R128 header gain)
        samples = samples * np.float32(gain_scale)
    # no clipping: codec overshoot above full scale is real signal the
    # input true-peak measurement must see
    return samples, _OPUS_RATE, 0
