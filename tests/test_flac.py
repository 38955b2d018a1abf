"""Native FLAC codec tests: encode/decode roundtrips through the C++
library (the host-side native component replacing the reference's FFmpeg
FLAC path)."""

import numpy as np
import pytest

from jivetalking_tpu.io.audio import open_audio_file, save_flac
from jivetalking_tpu.io.flac import read_flac, write_flac

SR = 44100


def _tone(freq, dbfs, secs, sr=SR):
    amp = 10.0 ** (dbfs / 20.0)
    t = np.arange(int(secs * sr)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def _q16(x):
    """The s16 quantisation the encoder applies."""
    return np.clip(np.asarray(x) * 32767.0, -32768, 32767).astype(np.int16).astype(np.float32) / 32768.0


class TestRoundtrip:
    def test_mono_tone(self, tmp_path):
        x = _tone(440.0, -12.0, 2.0)
        path = str(tmp_path / "tone.flac")
        write_flac(path, x, SR)
        y, rate, bits = read_flac(path)
        assert rate == SR and bits == 16
        assert y.shape == (1, len(x))
        # lossless within the s16 quantisation grid (note: decode scales by
        # 2^15 while encode clips at 32767, so compare against the quantised x)
        np.testing.assert_allclose(y[0], _q16(x), atol=1.0 / 32768.0)

    def test_stereo(self, tmp_path):
        left = _tone(440.0, -12.0, 1.0)
        right = _tone(880.0, -18.0, 1.0)
        x = np.stack([left, right])
        path = str(tmp_path / "stereo.flac")
        write_flac(path, x, SR)
        y, rate, bits = read_flac(path)
        assert y.shape == x.shape
        np.testing.assert_allclose(y[0], _q16(left), atol=1.0 / 32768.0)
        np.testing.assert_allclose(y[1], _q16(right), atol=1.0 / 32768.0)

    def test_noise_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        x = (0.5 * rng.standard_normal(3 * SR)).astype(np.float32)
        x = np.clip(x, -1, 1)
        path = str(tmp_path / "noise.flac")
        write_flac(path, x, SR)
        y, _, _ = read_flac(path)
        np.testing.assert_allclose(y[0], _q16(x), atol=1.0 / 32768.0)

    def test_silence_constant_subframes(self, tmp_path):
        x = np.zeros(SR, np.float32)
        path = str(tmp_path / "silence.flac")
        write_flac(path, x, SR)
        y, _, _ = read_flac(path)
        assert np.all(y == 0)

    def test_partial_last_frame(self, tmp_path):
        # length not divisible by the 4096 frame size
        x = _tone(997.0, -20.0, 1.0)[: 4096 * 2 + 1234]
        path = str(tmp_path / "partial.flac")
        write_flac(path, x, SR)
        y, _, _ = read_flac(path)
        assert y.shape[1] == len(x)

    def test_48k_rate(self, tmp_path):
        x = _tone(997.0, -20.0, 0.5, sr=48000)
        path = str(tmp_path / "48k.flac")
        write_flac(path, x, 48000)
        y, rate, _ = read_flac(path)
        assert rate == 48000
        np.testing.assert_allclose(y[0], _q16(x), atol=1.0 / 32768.0)

    def test_odd_rate_header(self, tmp_path):
        # rates outside the header table go through the 16-bit Hz escape
        x = _tone(440.0, -20.0, 0.25, sr=22051)
        path = str(tmp_path / "odd.flac")
        write_flac(path, x, 22051)
        y, rate, _ = read_flac(path)
        assert rate == 22051

    def test_compression_beats_raw(self, tmp_path):
        import os

        x = _tone(100.0, -20.0, 5.0)
        path = str(tmp_path / "c.flac")
        write_flac(path, x, SR)
        raw_bytes = len(x) * 2
        assert os.path.getsize(path) < raw_bytes * 0.9


class TestFacade:
    def test_open_audio_file(self, tmp_path):
        x = _tone(440.0, -12.0, 1.0)
        path = str(tmp_path / "t.flac")
        save_flac(path, x, SR)
        samples, meta = open_audio_file(path)
        assert meta.format_name == "flac"
        assert meta.sample_rate == SR
        assert meta.bit_depth == 16
        assert samples.shape == (1, len(x))

    def test_decode_garbage_raises(self, tmp_path):
        path = str(tmp_path / "bad.flac")
        open(path, "wb").write(b"fLaCgarbagegarbage")
        with pytest.raises(ValueError):
            read_flac(path)

    def test_missing_file_raises(self):
        with pytest.raises((FileNotFoundError, ValueError)):
            open_audio_file("/nonexistent/file.flac")


class TestLpcEncode:
    def test_tonal_content_roundtrips_exactly_and_compresses(self):
        """LPC subframes (windowed-autocorr + Levinson-Durbin, orders <= 8,
        15-bit quantised coefficients — the reference's compression_level=5
        search space, ref encoder.go:54-99) must round-trip bit-exactly and
        beat raw PCM decisively on tonal programme."""
        import os

        from jivetalking_tpu.io.flac import read_flac, write_flac

        sr = 44100
        n = sr * 10
        t = np.arange(n) / sr
        rng = np.random.default_rng(11)
        x = (
            0.2 * np.sin(2 * np.pi * 220 * t)
            + 0.05 * np.sin(2 * np.pi * 1567 * t)
            + 0.002 * rng.standard_normal(n)
        )
        xi = np.clip(np.round(x * 32767), -32768, 32767).astype(np.int16)[None, :]
        path = "/tmp/jt_lpc_roundtrip.flac"
        write_flac(path, xi, sr)
        pcm, rate, bits = read_flac(path)
        assert rate == sr and bits == 16
        ints = np.round(pcm * 32768.0).astype(np.int64)
        np.testing.assert_array_equal(ints, xi.astype(np.int64))
        assert os.path.getsize(path) < 0.62 * xi.size * 2
        os.remove(path)


class TestStreamReader:
    """The bounded-memory streaming decoder must reproduce the whole-file
    decode byte for byte across arbitrary chunk sizes (frame-boundary
    remainder carrying included)."""

    def test_matches_whole_file_decode(self, tmp_path):
        import numpy as np

        from jivetalking_tpu.io.flac import (
            FlacStreamReader,
            read_flac,
            write_flac,
        )

        rng = np.random.default_rng(7)
        sr = 44100
        n = 44100 * 3 + 1234
        x = np.stack([
            0.4 * np.sin(2 * np.pi * 440.0 * np.arange(n) / sr),
            0.1 * rng.standard_normal(n),
        ]).astype(np.float32)
        p = str(tmp_path / "s.flac")
        write_flac(p, x, sr)

        want, rate, bits = read_flac(p)
        with FlacStreamReader(p) as r:
            assert r.sample_rate == rate
            assert r.channels == 2
            assert r.total_samples == n
            # a chunk size that never aligns with the 4096 frame grid
            chunks = []
            while True:
                c = r.read(10_007)
                if c.shape[1] == 0:
                    break
                chunks.append(c)
            got = np.concatenate(chunks, axis=1)
        assert got.shape == want.shape
        np.testing.assert_array_equal(got, want)

    def test_raw_int16_chunks(self, tmp_path):
        import numpy as np

        from jivetalking_tpu.io.flac import (
            FlacStreamReader,
            read_flac,
            write_flac,
        )

        sr = 8000
        n = 20000
        x = (0.3 * np.sin(2 * np.pi * 330.0 * np.arange(n) / sr)).astype(np.float32)
        p = str(tmp_path / "m.flac")
        write_flac(p, x, sr)
        want, _, _ = read_flac(p, raw_int16=True)
        with FlacStreamReader(p) as r:
            a = r.read(6000, raw_int16=True)
            b = r.read(50000, raw_int16=True)
            tail = r.read(100, raw_int16=True)
        assert a.dtype == np.int16
        assert tail.shape[1] == 0
        got = np.concatenate([a, b], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_midstream_corruption_raises_not_eof(self, tmp_path):
        """A frame decode error after >=1 good frame must surface as an
        error on the NEXT read, not read as a clean short EOF: the
        streamed analysis sizes by STREAMINFO total_samples, so a silent
        short read would master the claimed duration with the damaged
        remainder as silence (ADVICE r2: flac_read_stream error flag)."""
        import numpy as np
        import pytest

        from jivetalking_tpu.io.flac import FlacStreamReader, write_flac

        rng = np.random.default_rng(11)
        sr = 44100
        n = sr * 4
        x = (0.3 * rng.standard_normal(n)).astype(np.float32)
        p = str(tmp_path / "corrupt.flac")
        write_flac(p, x, sr)

        raw = bytearray(open(p, "rb").read())
        # stomp a span well past the midpoint of the compressed stream so
        # the first frames decode fine and a later frame is garbage
        lo = len(raw) // 2
        raw[lo : lo + 4096] = bytes([0xFF] * 4096)
        open(p, "wb").write(bytes(raw))

        with FlacStreamReader(p) as r:
            got = 0
            with pytest.raises(ValueError):
                while True:
                    c = r.read(8192)
                    if c.shape[1] == 0:
                        # clean EOF before total_samples => the bug this
                        # test pins (must raise instead)
                        assert got >= r.total_samples, (
                            "mid-stream corruption read as clean EOF")
                        break
                    got += c.shape[1]
            # some good frames decoded before the damage
            assert 0 < got < n


class TestStreamReaderLifecycle:
    """Drain-to-EOF and resource-lifecycle contracts for the streaming
    decoder, mirroring the reference's one audio round-trip test (ref:
    internal/audio/roundtrip_test.go:102-189): EOF is a stable sentinel
    (never an error, never a hang), close releases cleanly and is
    idempotent, and reads after close fail loudly instead of touching a
    freed handle."""

    @staticmethod
    def _tone_flac(tmp_path, sr=44100, secs=0.25):
        import numpy as np

        from jivetalking_tpu.io.flac import write_flac

        n = int(sr * secs)
        # -6 dBFS sine, well clear of clipping (ref :113)
        x = (0.5 * np.sin(2 * np.pi * 440.0 * np.arange(n) / sr)).astype(
            np.float32)
        p = str(tmp_path / "roundtrip.flac")
        write_flac(p, x, sr)
        return p, n, sr

    def test_drain_to_eof_then_eof_is_stable(self, tmp_path):
        """The drain must yield >=1 chunk summing to the encoded sample
        count (lossless round-trip), and a SECOND read at EOF must keep
        returning the empty sentinel — never an error (ref :149-183)."""
        from jivetalking_tpu.io.flac import FlacStreamReader

        p, n, sr = self._tone_flac(tmp_path)
        with FlacStreamReader(p) as r:
            # metadata reflects what was written; duration bounded, not
            # equated (ref :133-147 container-rounding note)
            assert r.sample_rate == sr
            assert r.channels == 1
            assert 0 < r.total_samples / r.sample_rate <= 1.0

            reads, decoded = 0, 0
            while True:
                c = r.read(4096 + 1)  # never aligned with the frame grid
                if c.shape[1] == 0:
                    break
                reads += 1
                decoded += c.shape[1]
            assert reads > 0
            assert decoded == n

            # past-EOF reads keep returning the sentinel, immediately
            for _ in range(3):
                again = r.read(4096)
                assert again.shape[1] == 0

    def test_close_is_idempotent_and_read_after_close_raises(self, tmp_path):
        """Double close must be safe (a double free would crash here, ref
        :185-188) and a read on a closed reader must raise the documented
        error rather than dereference the freed native handle."""
        import pytest

        from jivetalking_tpu.io.flac import FlacStreamReader

        p, _, _ = self._tone_flac(tmp_path)
        r = FlacStreamReader(p)
        assert r.read(1024).shape[1] > 0
        r.close()
        r.close()  # idempotent
        with pytest.raises(ValueError):
            r.read(1024)

    def test_context_manager_closes(self, tmp_path):
        import pytest

        from jivetalking_tpu.io.flac import FlacStreamReader

        p, _, _ = self._tone_flac(tmp_path)
        with FlacStreamReader(p) as r:
            r.read(512)
        with pytest.raises(ValueError):
            r.read(512)


class TestEncodeErrorPaths:
    """(ref: TestApplyLoudnormAndMeasure*RemovesTemp family,
    normalise_test.go:561-937): any failure on the publish path must
    remove the dot-temp — the output directory never accumulates residue,
    and the destination file is never half-written."""

    def test_encode_failure_removes_temp_and_raises(self, tmp_path):
        import numpy as np

        from jivetalking_tpu.io.flac import write_flac

        missing_dir = tmp_path / "nope" / "deeper"
        x = np.zeros(4096, np.float32)
        with pytest.raises(Exception):
            write_flac(str(missing_dir / "out.flac"), x, 44100)
        # parent of the missing dir: nothing appeared anywhere under tmp
        assert list(tmp_path.iterdir()) == []

    def test_success_leaves_no_temp(self, tmp_path):
        import os

        import numpy as np

        from jivetalking_tpu.io.flac import read_flac, write_flac

        out = tmp_path / "out.flac"
        x = (0.25 * np.sin(2 * np.pi * 440 * np.arange(44100) / 44100)).astype(np.float32)
        write_flac(str(out), x, 44100)
        assert out.exists()
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".")]
        decoded, rate, bits = read_flac(str(out))
        assert rate == 44100 and decoded.shape[1] == 44100

    def test_existing_output_replaced_not_appended(self, tmp_path):
        # a second publish atomically REPLACES the destination
        import os

        import numpy as np

        from jivetalking_tpu.io.flac import flac_info, write_flac

        out = tmp_path / "out.flac"
        write_flac(str(out), np.zeros(44100, np.float32), 44100)
        first_size = out.stat().st_size
        write_flac(str(out), np.zeros(22050, np.float32), 44100)
        n, ch, rate, bits = flac_info(str(out))
        assert n == 22050
        assert out.stat().st_size != first_size
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".")]
