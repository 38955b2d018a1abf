import numpy as np
import pytest

from jivetalking_tpu.io import wav as wavio
from jivetalking_tpu.io.audio import downmix_mono, open_audio_file
from jivetalking_tpu.io.synth import SilenceGap, TestAudioOptions, _lcg_noise, generate_test_audio


def test_lcg_matches_scalar_reference():
    # scalar mirror of the Go testutil LCG
    s = 12345
    expect = []
    for _ in range(1000):
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        expect.append((s / 0xFFFFFFFF) * 2.0 - 1.0)
    got = _lcg_noise(1000)
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_roundtrip(tmp_path, bits):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, size=(2, 4410))).astype(np.float32)
    p = str(tmp_path / f"rt{bits}.wav")
    wavio.write_wav(p, x, 44100, bits=bits)
    y, rate = wavio.read_wav(p)
    assert rate == 44100
    assert y.shape == x.shape
    tol = {16: 1e-4, 24: 3e-7, 32: 1e-7}[bits]
    np.testing.assert_allclose(y, x, atol=tol)


def test_generate_test_audio_tone_level(tmp_path):
    p = str(tmp_path / "tone.wav")
    generate_test_audio(
        p, TestAudioOptions(duration_secs=1.0, tone_freq=1000.0, tone_level=-20.0)
    )
    x, meta = open_audio_file(p)
    assert meta.sample_rate == 44100
    assert meta.channels == 1
    mono = downmix_mono(x)
    rms_db = 20 * np.log10(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
    # -20 dBFS sine -> RMS = -23.01 dBFS
    assert abs(rms_db - (-23.01)) < 0.1


def test_generate_test_audio_silence_gap(tmp_path):
    p = str(tmp_path / "gap.wav")
    generate_test_audio(
        p,
        TestAudioOptions(
            duration_secs=2.0,
            tone_freq=440.0,
            tone_level=-20.0,
            silence_gap=SilenceGap(start=0.5, duration=0.5),
        ),
    )
    x, meta = open_audio_file(p)
    sr = meta.sample_rate
    gap = x[0, int(0.6 * sr) : int(0.9 * sr)]
    assert np.max(np.abs(gap)) == 0.0


def test_downmix_stereo_mean():
    x = np.stack([np.ones(10, np.float32), -np.ones(10, np.float32)])
    np.testing.assert_allclose(downmix_mono(x), np.zeros(10), atol=0)


class TestAiff:
    """AIFF/AIFC PCM reader (the macOS-native stem container; ref: the
    reference demuxes via FFmpeg, reader.go:29-170 — this covers the
    uncompressed subset with named errors otherwise)."""

    def _write_aiff(self, path, x_i16, sr, aifc_sowt=False):
        import struct

        n, ch = x_i16.shape[1], x_i16.shape[0]
        inter = x_i16.T.reshape(-1)
        # 80-bit extended float sample rate
        import math

        exp = int(math.floor(math.log2(sr)))
        mant = int(sr / 2.0 ** (exp - 63))
        f80 = struct.pack(">HQ", exp + 16383, mant)
        if aifc_sowt:
            comm = struct.pack(">HIH", ch, n, 16) + f80 + b"sowt" + b"\x00\x00"
            pcm = inter.astype("<i2").tobytes()
            form_type = b"AIFC"
        else:
            comm = struct.pack(">HIH", ch, n, 16) + f80
            pcm = inter.astype(">i2").tobytes()
            form_type = b"AIFF"
        ssnd = struct.pack(">II", 0, 0) + pcm
        chunks = b""
        for cid, body in ((b"COMM", comm), (b"SSND", ssnd)):
            chunks += cid + struct.pack(">I", len(body)) + body
            if len(body) % 2:
                chunks += b"\x00"
        form = b"FORM" + struct.pack(">I", 4 + len(chunks)) + form_type + chunks
        open(path, "wb").write(form)

    def test_roundtrip_and_metadata(self, tmp_path):
        from jivetalking_tpu.io.audio import open_audio_file

        rng = np.random.default_rng(5)
        x = np.clip(np.round(rng.standard_normal((2, 4000)) * 8000),
                    -32768, 32767).astype(np.int16)
        p = str(tmp_path / "s.aiff")
        self._write_aiff(p, x, 44100)
        samples, meta = open_audio_file(p, raw_int16=True)
        assert meta.format_name == "aiff"
        assert meta.sample_rate == 44100
        assert meta.channels == 2
        assert meta.bit_depth == 16
        np.testing.assert_array_equal(samples, x)

    def test_aifc_sowt_little_endian(self, tmp_path):
        from jivetalking_tpu.io.aiff import read_aiff

        rng = np.random.default_rng(6)
        x = np.clip(np.round(rng.standard_normal((1, 2000)) * 8000),
                    -32768, 32767).astype(np.int16)
        p = str(tmp_path / "s.aifc")
        self._write_aiff(p, x, 48000, aifc_sowt=True)
        samples, rate, bits = read_aiff(p, raw_int16=True)
        assert rate == 48000 and bits == 16
        np.testing.assert_array_equal(samples, x)

    def test_compressed_aifc_names_codec(self, tmp_path):
        import struct

        p = str(tmp_path / "c.aifc")
        comm = struct.pack(">HIH", 1, 100, 16) + b"\x40\x0e" + b"\x00" * 8 + b"ulaw"
        ssnd = struct.pack(">II", 0, 0) + b"\x00" * 10
        chunks = b"COMM" + struct.pack(">I", len(comm)) + comm
        chunks += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
        open(p, "wb").write(b"FORM" + struct.pack(">I", 4 + len(chunks))
                            + b"AIFC" + chunks)
        from jivetalking_tpu.io.aiff import read_aiff

        with pytest.raises(ValueError, match="ulaw"):
            read_aiff(p)

    def test_open_nonexistent_path_names_path(self, tmp_path):
        # (ref: TestOpenAudioFile_NonexistentPath, reader_test.go:56):
        # error, never a panic/None return — and the message carries the
        # path so a silent empty error cannot pass
        from jivetalking_tpu.io.audio import open_audio_file

        for ext in (".flac", ".wav", ".mp3", ".aiff"):
            missing = str(tmp_path / f"does-not-exist{ext}")
            with pytest.raises(FileNotFoundError) as ei:
                open_audio_file(missing)
            assert str(ei.value), ext
            assert "does-not-exist" in str(ei.value), ext

    def test_open_empty_path_errors_not_crashes(self):
        # (ref: TestOpenAudioFile_EmptyPath, reader_test.go:110)
        from jivetalking_tpu.io.audio import open_audio_file

        with pytest.raises((FileNotFoundError, ValueError)):
            open_audio_file("")

    @pytest.mark.parametrize("ext", [".wav", ".flac", ".aiff", ".mp3",
                                     ".ogg", ".opus"])
    def test_open_not_audio_data_rejected_cleanly(self, tmp_path, ext):
        # (ref: TestOpenAudioFile_NotAudioData, reader_test.go:84): a real
        # but undecodable file (random bytes, no container) is rejected
        # with a clean non-empty error through EVERY dedicated reader —
        # this drives the open-succeeds/parse-fails branch, not the
        # missing-path one
        from jivetalking_tpu.io.audio import open_audio_file

        junk = str(tmp_path / f"not-audio{ext}")
        open(junk, "wb").write(b"this is not an audio container at all")
        with pytest.raises(Exception) as ei:
            open_audio_file(junk)
        assert not isinstance(ei.value, (SystemExit, KeyboardInterrupt))
        assert str(ei.value), ext

    def test_undecodable_file_names_fallback(self, tmp_path):
        # an extension without a dedicated reader routes to the generic
        # FFmpeg fallback; when that also fails, the error names both the
        # dedicated readers and the fallback's reason
        from jivetalking_tpu.io.audio import open_audio_file

        p = str(tmp_path / "x.m4a")
        open(p, "wb").write(b"\x00\x00\x00\x20ftypM4A ")
        with pytest.raises(ValueError, match="unsupported audio format"):
            open_audio_file(p)
