"""MP3 (libmpg123) and Ogg Vorbis (libvorbisfile) read paths.

The reference opens anything FFmpeg demuxes (ref: internal/audio/
reader.go:29-170); these pin the rebuild's lossy-source coverage.
Fixtures are synthesised in-process through the system encoders
(tests/lossy_fixtures.py) so no binary blobs live in the repo — the
same strategy as the reference's generateTestAudio WAVs (ref:
internal/processor/testutil_test.go:11-135).
"""

import os
import numpy as np
import pytest

from lossy_fixtures import (
    encode_mp3,
    encode_ogg,
    lame_available,
    vorbis_available,
)

RATE = 44100


def _sine(secs: float = 2.0, freq: float = 440.0, rate: int = RATE) -> np.ndarray:
    t = np.arange(int(rate * secs)) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


needs_lame = pytest.mark.skipif(not lame_available(), reason="libmp3lame absent")
needs_vorbis = pytest.mark.skipif(
    not vorbis_available(), reason="libvorbis absent"
)


@needs_lame
class TestMp3Read:
    def test_gapless_roundtrip_mono(self, tmp_path):
        from jivetalking_tpu.io.mp3 import read_mp3

        x = _sine()
        p = str(tmp_path / "a.mp3")
        encode_mp3(p, x, RATE)
        s, rate, bits = read_mp3(p)
        assert rate == RATE and bits == 0
        assert s.shape == (1, x.shape[0])  # LAME tag makes decode gapless
        assert s.dtype == np.float32
        # 128k CBR on a pure sine is near-transparent
        assert np.corrcoef(s[0], x)[0, 1] > 0.999
        assert abs(float(np.abs(s).max()) - 0.5) < 0.1

    def test_stereo_shape(self, tmp_path):
        from jivetalking_tpu.io.mp3 import read_mp3

        x = _sine()
        p = str(tmp_path / "st.mp3")
        encode_mp3(p, np.stack([x, -x]), 48000)
        s, rate, _ = read_mp3(p)
        assert rate == 48000
        assert s.shape[0] == 2

    def test_raw_int16_ignored_stays_float(self, tmp_path):
        # raw_int16's contract is "keep 16-bit PCM STREAMS as int16"; a
        # lossy decode is float-native and must not be quantised (that
        # would saturate codec overshoot the input TP measurement needs)
        from jivetalking_tpu.io.mp3 import read_mp3

        p = str(tmp_path / "a.mp3")
        encode_mp3(p, _sine(), RATE)
        s, _, _ = read_mp3(p, raw_int16=True)
        assert s.dtype == np.float32
        assert abs(float(np.abs(s).max()) - 0.5) < 0.1

    def test_open_audio_file_dispatch(self, tmp_path):
        from jivetalking_tpu.io.audio import open_audio_file

        p = str(tmp_path / "a.mp3")
        encode_mp3(p, _sine(), RATE)
        s, meta = open_audio_file(p)
        assert meta.format_name == "mp3" and meta.codec_name == "mp3"
        # lossy: no container quantisation depth -> the <=16-bit noise
        # floor display clamp downstream must stay off
        assert meta.bit_depth == 0
        assert meta.sample_rate == RATE
        assert meta.num_samples == s.shape[1]

    def test_garbage_raises(self, tmp_path):
        from jivetalking_tpu.io.mp3 import read_mp3

        p = str(tmp_path / "junk.mp3")
        open(p, "wb").write(b"ID3\x00\x00\x00 not audio")
        with pytest.raises((ValueError, RuntimeError)):
            read_mp3(p)

    def test_missing_file_raises(self):
        from jivetalking_tpu.io.mp3 import read_mp3

        with pytest.raises(FileNotFoundError):
            read_mp3("/nonexistent/x.mp3")


@needs_vorbis
class TestOggRead:
    def test_exact_roundtrip_mono(self, tmp_path):
        from jivetalking_tpu.io.ogg import read_ogg

        x = _sine()
        p = str(tmp_path / "a.ogg")
        encode_ogg(p, x, RATE)
        s, rate, bits = read_ogg(p)
        assert rate == RATE and bits == 0
        assert s.shape == (1, x.shape[0])  # granulepos gives exact length
        assert np.corrcoef(s[0], x)[0, 1] > 0.999
        assert abs(float(np.abs(s).max()) - 0.5) < 0.1

    def test_stereo_shape(self, tmp_path):
        from jivetalking_tpu.io.ogg import read_ogg

        x = _sine()
        p = str(tmp_path / "st.ogg")
        encode_ogg(p, np.stack([x, -x]), 48000)
        s, rate, _ = read_ogg(p)
        assert rate == 48000
        assert s.shape[0] == 2
        assert np.corrcoef(s[0], -s[1])[0, 1] > 0.999

    def test_open_audio_file_dispatch(self, tmp_path):
        from jivetalking_tpu.io.audio import open_audio_file

        p = str(tmp_path / "a.oga")
        encode_ogg(p, _sine(), RATE)
        s, meta = open_audio_file(p)
        assert meta.format_name == "ogg" and meta.codec_name == "vorbis"
        assert meta.bit_depth == 0
        assert meta.num_samples == s.shape[1]

    def test_garbage_raises(self, tmp_path):
        from jivetalking_tpu.io.ogg import read_ogg

        p = str(tmp_path / "junk.ogg")
        open(p, "wb").write(b"OggS\x00 not a stream")
        with pytest.raises(ValueError):
            read_ogg(p)

    def test_chained_stream_rejected(self, tmp_path):
        # `cat a.ogg b.ogg` is a valid chained Ogg whose links may change
        # channel layout mid-file; the reader rejects it by name instead
        # of reading wild channel pointers
        from jivetalking_tpu.io.ogg import read_ogg

        a = str(tmp_path / "a.ogg")
        b = str(tmp_path / "b.ogg")
        encode_ogg(a, _sine(1.0), RATE, serial=1)
        x = _sine(1.0)
        encode_ogg(b, np.stack([x, -x]), RATE, serial=2)
        chained = str(tmp_path / "chained.ogg")
        with open(chained, "wb") as f:
            f.write(open(a, "rb").read())
            f.write(open(b, "rb").read())
        with pytest.raises(ValueError, match="chained"):
            read_ogg(chained)


def _speechlike(dbfs: float, secs: float, seed: int = 3) -> np.ndarray:
    """Note-hopping stand-in for speech (a pure sine is a degenerate VAD
    fixture — zero flux reads as room tone; see tests/test_analysis.py)."""
    rng = np.random.default_rng(seed)
    n_notes = int(secs / 0.25)
    freqs = rng.choice([400.0, 700.0, 1100.0, 1600.0, 2200.0], size=n_notes)
    levels = dbfs + rng.uniform(-3.0, 1.0, size=n_notes)
    note_len = int(0.25 * RATE)
    t = np.arange(note_len) / RATE
    out = np.concatenate(
        [
            (10.0 ** (lv / 20.0)) * np.sin(2 * np.pi * f * t)
            for f, lv in zip(freqs, levels)
        ]
    )
    return out[: int(secs * RATE)].astype(np.float32)


@needs_lame
def test_mp3_masters_end_to_end(tmp_path):
    """An MP3 source runs the full product path: open -> downmix -> the
    unfused per-op master (the unit-tested reference path) -> FLAC out."""
    from jivetalking_tpu.io.audio import downmix_mono, open_audio_file
    from jivetalking_tpu.pipeline.process import process_audio

    rng = np.random.default_rng(7)
    x = _speechlike(-22.0, 4.0) + 0.002 * rng.standard_normal(RATE * 4).astype(
        np.float32
    )
    src = str(tmp_path / "ep.mp3")
    encode_mp3(src, x.astype(np.float32), RATE)

    samples, meta = open_audio_file(src)
    mono = downmix_mono(samples)
    res = process_audio(mono, meta.sample_rate, fused=False)
    out = np.asarray(res.output_audio)
    assert out.ndim == 1 and out.size > 0
    assert np.isfinite(out).all()
    assert res.output_rate == 44100
    # the -16 LUFS +/- 0.5 LU contract holds for lossy sources too
    assert (
        abs(res.final.loudness.integrated_lufs - res.normalisation.effective_target_i)
        <= 0.5
    )


needs_opus = pytest.mark.skipif(
    not __import__("lossy_fixtures").opus_available(), reason="libopus absent"
)


@needs_opus
class TestOpusRead:
    def test_exact_roundtrip_mono(self, tmp_path):
        from lossy_fixtures import encode_opus

        from jivetalking_tpu.io.opus import read_opus

        x = _sine(2.0, rate=48000)
        p = str(tmp_path / "a.opus")
        encode_opus(p, x)
        s, rate, bits = read_opus(p)
        assert rate == 48000 and bits == 0
        # pre-skip dropped, granulepos end-trim applied -> exact length
        assert s.shape == (1, x.shape[0])
        assert np.corrcoef(s[0], x)[0, 1] > 0.999
        assert abs(float(np.abs(s).max()) - 0.5) < 0.1

    def test_stereo_shape(self, tmp_path):
        from lossy_fixtures import encode_opus

        from jivetalking_tpu.io.opus import read_opus

        x = _sine(1.0, rate=48000)
        p = str(tmp_path / "st.opus")
        encode_opus(p, np.stack([x, -x]))
        s, rate, _ = read_opus(p)
        assert rate == 48000 and s.shape[0] == 2
        assert np.corrcoef(s[0], -s[1])[0, 1] > 0.999

    def test_open_audio_file_dispatch(self, tmp_path):
        from lossy_fixtures import encode_opus

        from jivetalking_tpu.io.audio import open_audio_file

        p = str(tmp_path / "a.opus")
        encode_opus(p, _sine(1.0, rate=48000))
        s, meta = open_audio_file(p)
        assert meta.format_name == "ogg" and meta.codec_name == "opus"
        assert meta.sample_rate == 48000 and meta.bit_depth == 0
        assert meta.num_samples == s.shape[1]

    def test_ogg_extension_fallback(self, tmp_path):
        # podcasts do ship Opus in .ogg; the dispatcher tries Vorbis then
        # falls back to Opus
        from lossy_fixtures import encode_opus

        from jivetalking_tpu.io.audio import open_audio_file

        p = str(tmp_path / "op.ogg")
        encode_opus(p, _sine(1.0, rate=48000))
        s, meta = open_audio_file(p)
        assert meta.codec_name == "opus"
        assert s.shape[0] == 1

    def test_chained_rejected(self, tmp_path):
        from lossy_fixtures import encode_opus

        from jivetalking_tpu.io.opus import read_opus

        a = str(tmp_path / "a.opus")
        encode_opus(a, _sine(0.5, rate=48000))
        chained = str(tmp_path / "chained.opus")
        with open(chained, "wb") as f:
            f.write(open(a, "rb").read())
            f.write(open(a, "rb").read())
        with pytest.raises(ValueError, match="chained"):
            read_opus(chained)

    def test_garbage_raises(self, tmp_path):
        from jivetalking_tpu.io.opus import read_opus

        p = str(tmp_path / "junk.opus")
        open(p, "wb").write(b"OggS junk that is not a stream")
        with pytest.raises(ValueError):
            read_opus(p)


needs_m4a = pytest.mark.skipif(
    not __import__("lossy_fixtures").m4a_available(),
    reason="FFmpeg fallback shim unavailable",
)


@needs_m4a
class TestGenericFallbackRead:
    """m4a/AAC (and any other FFmpeg-demuxable container) through the
    generic fallback reader (io/generic.py + native/avio.cpp)."""

    def test_m4a_roundtrip_mono(self, tmp_path):
        from lossy_fixtures import encode_m4a

        from jivetalking_tpu.io.audio import open_audio_file

        x = _sine()
        p = str(tmp_path / "a.m4a")
        encode_m4a(p, x, RATE)
        s, meta = open_audio_file(p)
        assert meta.format_name == "m4a" and meta.codec_name == "aac"
        assert meta.sample_rate == RATE
        assert meta.bit_depth == 0  # lossy: no container depth
        # AAC keeps frame-padding at the tail; priming is edit-list trimmed
        assert abs(s.shape[1] - x.shape[0]) < 2048
        n = min(s.shape[1], x.shape[0])
        assert np.corrcoef(s[0, :n], x[:n])[0, 1] > 0.99

    def test_m4a_stereo(self, tmp_path):
        from lossy_fixtures import encode_m4a

        from jivetalking_tpu.io.audio import open_audio_file

        x = _sine(1.0)
        p = str(tmp_path / "st.m4a")
        encode_m4a(p, np.stack([x, -x]), 48000)
        s, meta = open_audio_file(p)
        assert meta.sample_rate == 48000
        assert s.shape[0] == 2

    def test_read_generic_matches_dedicated_mp3(self, tmp_path):
        from lossy_fixtures import encode_mp3

        from jivetalking_tpu.io.generic import read_generic
        from jivetalking_tpu.io.mp3 import read_mp3

        if not lame_available():
            pytest.skip("libmp3lame absent")
        x = _sine()
        p = str(tmp_path / "x.mp3")
        encode_mp3(p, x, RATE)
        a, rate_a, _ = read_mp3(p)
        b, rate_b, _, codec = read_generic(p)
        assert rate_a == rate_b and codec.startswith("mp3")
        n = min(a.shape[1], b.shape[1])
        assert np.corrcoef(a[0, :n], b[0, :n])[0, 1] > 0.9999

    def test_unsupported_names_fallback_error(self, tmp_path):
        from jivetalking_tpu.io.audio import open_audio_file

        p = str(tmp_path / "x.m4a")
        open(p, "wb").write(b"\x00\x00\x00\x20ftypM4A garbage")
        with pytest.raises(ValueError, match="fallback|unsupported"):
            open_audio_file(p)


@needs_opus
def test_opus_header_output_gain_applied(tmp_path):
    """RFC 7845 §5.1: the OpusHead output gain MUST be applied when
    decoding — it is how loudgain/opusgain tag R128 normalisation."""
    from lossy_fixtures import encode_opus

    from jivetalking_tpu.io.opus import read_opus

    x = _sine(1.0, rate=48000)
    plain = str(tmp_path / "plain.opus")
    gained = str(tmp_path / "gained.opus")
    encode_opus(plain, x)
    encode_opus(gained, x, output_gain_db=-6.0)
    a, _, _ = read_opus(plain)
    b, _, _ = read_opus(gained)
    ratio = float(np.abs(b).max() / np.abs(a).max())
    assert abs(ratio - 10.0 ** (-6.0 / 20.0)) < 0.01


class TestTruncationRobustness:
    """Every reader must survive arbitrary truncation of a valid file:
    either decode what exists or raise a clean ValueError/RuntimeError —
    never crash the process (the pool's per-file isolation depends on
    catchable errors, ref: pool.go:210-216)."""

    @pytest.mark.parametrize("frac", [0.02, 0.1, 0.35, 0.7, 0.97])
    def test_truncated_files_never_crash(self, tmp_path, frac):
        from jivetalking_tpu.io.audio import open_audio_file

        x = _sine(1.0, rate=48000)
        fixtures = []
        if lame_available():
            p = str(tmp_path / "t.mp3")
            encode_mp3(p, x, 48000)
            fixtures.append(p)
        if vorbis_available():
            p = str(tmp_path / "t.ogg")
            encode_ogg(p, x, 48000)
            fixtures.append(p)
        from lossy_fixtures import encode_opus, m4a_available, opus_available

        if opus_available():
            p = str(tmp_path / "t.opus")
            encode_opus(p, x)
            fixtures.append(p)
        if m4a_available():
            from lossy_fixtures import encode_m4a

            p = str(tmp_path / "t.m4a")
            encode_m4a(p, x, 48000)
            fixtures.append(p)

        for path in fixtures:
            data = open(path, "rb").read()
            cut = str(tmp_path / ("cut_" + os.path.basename(path)))
            open(cut, "wb").write(data[: max(4, int(len(data) * frac))])
            try:
                s, meta = open_audio_file(cut)
                # partial decode is fine, but it must be sane audio
                assert s.ndim == 2 and np.isfinite(s).all()
            except (ValueError, RuntimeError):
                pass  # clean rejection is equally acceptable
