"""Test-only lossy-codec fixture encoders (libmp3lame / libvorbisenc via
ctypes).  Product code never encodes lossy audio — the output contract is
FLAC s16 (ref: internal/processor/encoder.go:54-99) — these exist so the
MP3/OGG *read* paths can be exercised against known signals without
shipping binary fixtures.
"""

from __future__ import annotations

import ctypes

import numpy as np


def _try_load(*names):
    for name in names:
        try:
            return ctypes.CDLL(name)
        except OSError:
            continue
    return None


def lame_available() -> bool:
    return _try_load("libmp3lame.so.0", "libmp3lame.so") is not None


def encode_mp3(path: str, samples: np.ndarray, rate: int) -> None:
    """Encode float32 (channels, n) -> CBR 128k MP3 with a LAME info tag
    (the tag carries encoder delay/padding so gapless decoders recover the
    exact sample count)."""
    lib = _try_load("libmp3lame.so.0", "libmp3lame.so")
    if lib is None:
        raise RuntimeError("libmp3lame not found")
    lib.lame_init.restype = ctypes.c_void_p
    for fn in (
        "lame_set_in_samplerate",
        "lame_set_out_samplerate",
        "lame_set_num_channels",
        "lame_set_brate",
        "lame_set_quality",
        "lame_set_mode",
        "lame_set_bWriteVbrTag",
    ):
        getattr(lib, fn).argtypes = [ctypes.c_void_p, ctypes.c_int]
        getattr(lib, fn).restype = ctypes.c_int
    lib.lame_init_params.argtypes = [ctypes.c_void_p]
    lib.lame_init_params.restype = ctypes.c_int
    lib.lame_encode_buffer.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_short),
        ctypes.POINTER(ctypes.c_short),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int,
    ]
    lib.lame_encode_buffer.restype = ctypes.c_int
    lib.lame_encode_flush.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.lame_encode_flush.restype = ctypes.c_int
    lib.lame_get_lametag_frame.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    lib.lame_get_lametag_frame.restype = ctypes.c_size_t
    lib.lame_close.argtypes = [ctypes.c_void_p]

    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    ch, n = x.shape
    pcm = np.clip(x * 32767.0, -32768, 32767).astype(np.int16)
    left = np.ascontiguousarray(pcm[0])
    right = np.ascontiguousarray(pcm[1] if ch > 1 else pcm[0])

    gfp = lib.lame_init()
    try:
        lib.lame_set_in_samplerate(gfp, rate)
        lib.lame_set_out_samplerate(gfp, rate)
        lib.lame_set_num_channels(gfp, ch)
        lib.lame_set_brate(gfp, 128)
        lib.lame_set_quality(gfp, 2)
        lib.lame_set_mode(gfp, 3 if ch == 1 else 1)  # MONO=3, JOINT=1
        lib.lame_set_bWriteVbrTag(gfp, 1)
        if lib.lame_init_params(gfp) < 0:
            raise RuntimeError("lame_init_params failed")
        outsz = int(1.25 * n) + 7200
        out = ctypes.create_string_buffer(outsz)
        wrote = lib.lame_encode_buffer(
            gfp,
            left.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            right.ctypes.data_as(ctypes.POINTER(ctypes.c_short)),
            n,
            out,
            outsz,
        )
        if wrote < 0:
            raise RuntimeError(f"lame_encode_buffer failed ({wrote})")
        data = bytearray(out.raw[:wrote])
        wrote = lib.lame_encode_flush(gfp, out, outsz)
        if wrote < 0:
            raise RuntimeError(f"lame_encode_flush failed ({wrote})")
        data += out.raw[:wrote]
        # the info tag is a placeholder frame at the stream head; rewrite
        # it now that totals are known (this is what makes decode gapless)
        tag = ctypes.create_string_buffer(7200)
        tagsz = lib.lame_get_lametag_frame(gfp, tag, 7200)
        if 0 < tagsz <= len(data):
            data[:tagsz] = tag.raw[:tagsz]
        with open(path, "wb") as f:
            f.write(bytes(data))
    finally:
        lib.lame_close(gfp)


# --- Ogg Vorbis fixture encoder -------------------------------------------

_OPAQUE = 8192  # generous over-allocation for opaque libvorbis/libogg structs


class _OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", ctypes.c_void_p),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


class _OggPage(ctypes.Structure):
    _fields_ = [
        ("header", ctypes.c_void_p),
        ("header_len", ctypes.c_long),
        ("body", ctypes.c_void_p),
        ("body_len", ctypes.c_long),
    ]


def opus_available() -> bool:
    return (
        _try_load("libopus.so.0", "libopus.so") is not None
        and _try_load("libogg.so.0", "libogg.so") is not None
    )


def encode_opus(
    path: str,
    samples: np.ndarray,
    rate: int = 48000,
    output_gain_db: float = 0.0,
) -> None:
    """Encode float32 (channels, n) 48 kHz -> Ogg Opus (20 ms frames).

    Opus encodes at 48 kHz only; callers must resample first.  Writes
    OpusHead (with the encoder's real pre-skip) + OpusTags + audio pages,
    end-trim signalled by the final granulepos per RFC 7845.
    `output_gain_db` writes the OpusHead output-gain field (Q7.8 dB) that
    compliant decoders MUST apply — the loudgain/opusgain R128 mechanism.
    """
    if rate != 48000:
        raise ValueError("encode_opus fixture takes 48 kHz input only")
    ogg = _try_load("libogg.so.0", "libogg.so")
    opus = _try_load("libopus.so.0", "libopus.so")
    if not (ogg and opus):
        raise RuntimeError("libopus/libogg not found")
    opus.opus_encoder_create.argtypes = [
        ctypes.c_int32,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
    ]
    opus.opus_encoder_create.restype = ctypes.c_void_p
    opus.opus_encoder_destroy.argtypes = [ctypes.c_void_p]
    opus.opus_encode_float.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_char_p,
        ctypes.c_int32,
    ]
    opus.opus_encode_float.restype = ctypes.c_int32
    opus.opus_encoder_ctl.restype = ctypes.c_int

    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    ch, n = x.shape
    frame = 960  # 20 ms @ 48 kHz
    err = ctypes.c_int(0)
    enc = opus.opus_encoder_create(48000, ch, 2049, ctypes.byref(err))  # AUDIO
    if not enc or err.value != 0:
        raise RuntimeError(f"opus_encoder_create failed ({err.value})")
    try:
        # OPUS_GET_LOOKAHEAD_REQUEST = 4027: the encoder's real priming.
        # opus_encoder_ctl is variadic — the handle MUST be wrapped in
        # c_void_p or ctypes passes it as a truncated 32-bit int
        lookahead = ctypes.c_int32(0)
        opus.opus_encoder_ctl(
            ctypes.c_void_p(enc), ctypes.c_int(4027), ctypes.byref(lookahead)
        )
        pre_skip = int(lookahead.value)

        gain_q78 = int(round(output_gain_db * 256.0))
        head = (
            b"OpusHead"
            + bytes([1, ch])
            + pre_skip.to_bytes(2, "little")
            + (48000).to_bytes(4, "little")
            + gain_q78.to_bytes(2, "little", signed=True)
            + bytes([0])
        )
        vendor = b"jivetalking-test"
        tags = b"OpusTags" + len(vendor).to_bytes(4, "little") + vendor + (0).to_bytes(4, "little")

        os_ = ctypes.create_string_buffer(_OPAQUE)
        ogg.ogg_stream_init(os_, 4711)
        page = _OggPage()
        # the encoder delays output by its lookahead (= pre_skip); encode
        # enough padding frames that the delayed tail flushes, and let the
        # final granulepos trim the decode back to exactly n
        n_frames = -(-(n + pre_skip) // frame)
        padded = np.zeros((ch, n_frames * frame), np.float32)
        padded[:, :n] = x
        inter = np.ascontiguousarray(padded.T.reshape(-1))
        outbuf = ctypes.create_string_buffer(8192)

        with open(path, "wb") as f:

            def _write_page() -> None:
                f.write(ctypes.string_at(page.header, page.header_len))
                f.write(ctypes.string_at(page.body, page.body_len))

            def _packetin(data: bytes, no: int, granule: int, eos: int) -> None:
                op = _OggPacket()
                buf = ctypes.create_string_buffer(data, len(data))
                op.packet = ctypes.cast(buf, ctypes.c_void_p)
                op.bytes = len(data)
                op.b_o_s = 1 if no == 0 else 0
                op.e_o_s = eos
                op.granulepos = granule
                op.packetno = no
                ogg.ogg_stream_packetin(os_, ctypes.byref(op))

            _packetin(head, 0, 0, 0)
            while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
                _write_page()
            _packetin(tags, 1, 0, 0)
            while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
                _write_page()

            for i in range(n_frames):
                seg = inter[i * frame * ch : (i + 1) * frame * ch]
                wrote = opus.opus_encode_float(
                    enc,
                    seg.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                    frame,
                    outbuf,
                    8192,
                )
                if wrote < 0:
                    raise RuntimeError(f"opus_encode_float failed ({wrote})")
                last = i == n_frames - 1
                # final granulepos = pre_skip + real length: signals the
                # end-trim of the zero-padded tail (RFC 7845 §4.5)
                granule = pre_skip + (n if last else (i + 1) * frame)
                _packetin(outbuf.raw[:wrote], 2 + i, granule, 1 if last else 0)
                while ogg.ogg_stream_pageout(os_, ctypes.byref(page)) != 0:
                    _write_page()
            while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
                _write_page()
        ogg.ogg_stream_clear(os_)
    finally:
        opus.opus_encoder_destroy(enc)


def vorbis_available() -> bool:
    return (
        _try_load("libvorbisenc.so.2", "libvorbisenc.so") is not None
        and _try_load("libvorbis.so.0", "libvorbis.so") is not None
        and _try_load("libogg.so.0", "libogg.so") is not None
    )


def encode_ogg(
    path: str, samples: np.ndarray, rate: int, q: float = 0.6, serial: int = 1
) -> None:
    """Encode float32 (channels, n) -> Ogg Vorbis VBR at quality `q`.
    Chained-file fixtures need distinct `serial` numbers per link (the
    Ogg spec requires it; same-serial concatenation is not a valid chain)."""
    ogg = _try_load("libogg.so.0", "libogg.so")
    vor = _try_load("libvorbis.so.0", "libvorbis.so")
    enc = _try_load("libvorbisenc.so.2", "libvorbisenc.so")
    if not (ogg and vor and enc):
        raise RuntimeError("libvorbis/libogg not found")

    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    ch, n = x.shape

    vi = ctypes.create_string_buffer(_OPAQUE)
    vc = ctypes.create_string_buffer(_OPAQUE)
    vd = ctypes.create_string_buffer(_OPAQUE)
    vb = ctypes.create_string_buffer(_OPAQUE)
    os_ = ctypes.create_string_buffer(_OPAQUE)

    vor.vorbis_info_init(vi)
    enc.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_void_p,
        ctypes.c_long,
        ctypes.c_long,
        ctypes.c_float,
    ]
    if enc.vorbis_encode_init_vbr(vi, ch, rate, ctypes.c_float(q)) != 0:
        raise RuntimeError("vorbis_encode_init_vbr failed")
    vor.vorbis_comment_init(vc)
    vor.vorbis_analysis_init(vd, vi)
    vor.vorbis_block_init(vd, vb)
    ogg.ogg_stream_init(os_, int(serial))

    vor.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float)
    )
    vor.vorbis_analysis_buffer.argtypes = [ctypes.c_void_p, ctypes.c_int]

    h1, h2, h3 = _OggPacket(), _OggPacket(), _OggPacket()
    vor.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h1), ctypes.byref(h2), ctypes.byref(h3)
    )
    page = _OggPage()

    with open(path, "wb") as f:

        def _write_page() -> None:
            f.write(ctypes.string_at(page.header, page.header_len))
            f.write(ctypes.string_at(page.body, page.body_len))

        for hp in (h1, h2, h3):
            ogg.ogg_stream_packetin(os_, ctypes.byref(hp))
        while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
            _write_page()

        op = _OggPacket()
        pos = 0
        block = 4096
        eos_written = False
        while not eos_written:
            take = min(block, n - pos)
            if take > 0:
                bufs = vor.vorbis_analysis_buffer(vd, take)
                for c in range(ch):
                    ctypes.memmove(
                        bufs[c],
                        np.ascontiguousarray(x[c, pos : pos + take]).ctypes.data,
                        take * 4,
                    )
                pos += take
            vor.vorbis_analysis_wrote(vd, take)
            while vor.vorbis_analysis_blockout(vd, vb) == 1:
                vor.vorbis_analysis(vb, None)
                vor.vorbis_bitrate_addblock(vb)
                while vor.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)) == 1:
                    ogg.ogg_stream_packetin(os_, ctypes.byref(op))
                    while ogg.ogg_stream_pageout(os_, ctypes.byref(page)) != 0:
                        _write_page()
                        if ogg.ogg_page_eos(ctypes.byref(page)):
                            eos_written = True
            if take == 0 and not eos_written:
                # analysis drained without an EOS page: flush remainder
                while ogg.ogg_stream_flush(os_, ctypes.byref(page)) != 0:
                    _write_page()
                eos_written = True

    ogg.ogg_stream_clear(os_)
    vor.vorbis_block_clear(vb)
    vor.vorbis_dsp_clear(vd)
    vor.vorbis_comment_clear(vc)
    vor.vorbis_info_clear(vi)


# --- m4a/AAC fixture encoder (via the package's own avio shim) -------------


def m4a_available() -> bool:
    try:
        from jivetalking_tpu.io import generic

        return generic.is_available()
    except Exception:
        return False


def encode_m4a(path: str, samples: np.ndarray, rate: int) -> None:
    """Encode float32 (channels, n) -> m4a/AAC through the test-support
    export of the package's FFmpeg shim (native AAC encoder, mp4 mux)."""
    from jivetalking_tpu.io import generic

    lib = generic._load()
    lib.jt_av_encode_test_m4a.restype = ctypes.c_int
    lib.jt_av_encode_test_m4a.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_long,
        ctypes.c_int,
        ctypes.c_int,
    ]
    x = np.asarray(samples, np.float32)
    if x.ndim == 1:
        x = x[None, :]
    ch, n = x.shape
    inter = np.ascontiguousarray(x.T.reshape(-1))
    rc = lib.jt_av_encode_test_m4a(
        path.encode(),
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n,
        ch,
        rate,
    )
    if rc != 0:
        raise RuntimeError(f"jt_av_encode_test_m4a failed ({rc})")
