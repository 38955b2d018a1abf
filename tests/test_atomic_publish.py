"""Atomic-publish contracts, ported from the reference's processor path
suite (ref: processor_test.go TestCreateSiblingTempPath :64,
TestPublishOutputConcurrentOverwrite :175, TestPublishOutputWrapsRenameError
:227, TestLUFSFilenameValueRoundsNearestWhole :42)."""

import os
import threading

import numpy as np
import pytest

from jivetalking_tpu.io.atomic import atomic_publish, sibling_temp_path
from jivetalking_tpu.io.flac import read_flac, write_flac
from jivetalking_tpu.report.paths import output_audio_path


class TestSiblingTempPath:
    """(ref: TestCreateSiblingTempPath, processor_test.go:64-107)."""

    def test_unique_reserved_marked_siblings(self, tmp_path):
        target = str(tmp_path / "presenter.flac")
        first = sibling_temp_path(target, "processing")
        second = sibling_temp_path(target, "processing")
        try:
            assert first != second
            for t in (first, second):
                assert os.path.dirname(t) == str(tmp_path)     # sibling
                base = os.path.basename(t)
                assert "processing" in base                    # marked
                assert base.startswith(".")                    # dot-hidden
                assert t.endswith(".tmp")
                assert os.path.getsize(t) == 0                 # reserved
        finally:
            for t in (first, second):
                if os.path.exists(t):
                    os.unlink(t)


class TestSeparatorMarkerRejected:
    """(ref: TestCreateSiblingStatsPathRejectsSeparatorMarker,
    file_write_test.go:41-48): a marker carrying a path separator is a
    caller bug — reject it loudly instead of scattering temps into
    subdirectories."""

    def test_separator_marker_raises(self, tmp_path):
        with pytest.raises(ValueError, match="separator"):
            sibling_temp_path(str(tmp_path / "presenter.wav"), "a/b")
        assert os.listdir(tmp_path) == []   # nothing reserved


class TestPublishMovesAndOverwrites:
    """(ref: TestPublishOutputMovesSource, processor_test.go:108-143 and
    TestPublishOutputOverwritesExistingDestination :145-173): a publish
    MOVES its payload — the temp is gone, the destination carries the new
    bytes even over an existing file, and the directory holds nothing else."""

    def test_moves_source_leaves_only_destination(self, tmp_path):
        dst = str(tmp_path / "output.flac")
        with atomic_publish(dst) as tmp:
            with open(tmp, "wb") as f:
                f.write(b"published audio")
        assert not os.path.exists(tmp)
        with open(dst, "rb") as f:
            assert f.read() == b"published audio"
        assert os.listdir(tmp_path) == ["output.flac"]

    def test_overwrites_existing_destination(self, tmp_path):
        dst = str(tmp_path / "output.flac")
        with open(dst, "wb") as f:
            f.write(b"existing audio")
        with atomic_publish(dst) as tmp:
            with open(tmp, "wb") as f:
                f.write(b"new audio")
        assert not os.path.exists(tmp)
        with open(dst, "rb") as f:
            assert f.read() == b"new audio"
        assert os.listdir(tmp_path) == ["output.flac"]


class TestConcurrentOverwrite:
    """(ref: TestPublishOutputConcurrentOverwrite, processor_test.go:175):
    N concurrent publishes of the SAME destination all succeed and the
    survivor is ONE complete payload — never a torn file."""

    N = 12

    def test_last_writer_wins_each_payload_complete(self, tmp_path):
        dst = str(tmp_path / "output.flac")
        payloads = []
        rng = np.random.default_rng(7)
        for i in range(self.N):
            pcm = (rng.standard_normal(4000) * 0.1).astype(np.float32)
            payloads.append(np.clip(np.round(pcm * 32767.0),
                                    -32768, 32767).astype(np.int16))

        errs = []
        start = threading.Barrier(self.N)

        def publish(i):
            try:
                start.wait()
                write_flac(dst, payloads[i], 8000)
            except Exception as e:   # noqa: BLE001 — collected for assert
                errs.append((i, e))

        threads = [threading.Thread(target=publish, args=(i,))
                   for i in range(self.N)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        assert errs == []
        got, rate, _ = read_flac(dst)
        assert rate == 8000
        # read_flac returns float32 (int16 / 32768): recover the exact PCM
        got_i16 = np.round(got[0] * 32768.0).astype(np.int16)
        matched = any(np.array_equal(got_i16, p) for p in payloads)
        assert matched, "destination is not any single writer's payload"
        # no temp residue from the 11 losers
        assert [f for f in os.listdir(tmp_path)
                if f.startswith(".")] == []


class TestRenameErrorContract:
    """(ref: TestPublishOutputWrapsRenameError, processor_test.go:227):
    a failed rename surfaces wrapped with the destination path AND cleans
    the temp."""

    def test_wraps_and_cleans(self, tmp_path, monkeypatch):
        dst = str(tmp_path / "output.txt")
        boom = OSError("injected rename failure")

        def bad_replace(src, d):
            raise boom

        monkeypatch.setattr(os, "replace", bad_replace)
        with pytest.raises(OSError) as ei:
            with atomic_publish(dst) as tmp:
                with open(tmp, "w") as f:
                    f.write("new audio")
        assert dst in str(ei.value)
        assert ei.value.__cause__ is boom
        monkeypatch.undo()
        assert [f for f in os.listdir(tmp_path) if f.startswith(".")] == []
        assert not os.path.exists(dst)

    def test_writer_failure_cleans_temp(self, tmp_path):
        dst = str(tmp_path / "output.txt")
        with pytest.raises(RuntimeError):
            with atomic_publish(dst) as tmp:
                with open(tmp, "w") as f:
                    f.write("partial")
                raise RuntimeError("writer died")
        assert os.listdir(tmp_path) == []


class TestLUFSFilenameValue:
    """(ref: TestLUFSFilenameValueRoundsNearestWhole,
    processor_test.go:42-63): half rounds AWAY from zero (Go math.Round),
    not banker's."""

    @pytest.mark.parametrize("lufs,want", [
        (-16.4, 16),
        (-16.5, 17),
        (-16.6, 17),
        (15.5, 16),
    ])
    def test_rounding(self, lufs, want):
        got = output_audio_path("/x/ep.wav", lufs)
        assert got.endswith(f"-LUFS-{want}-processed.flac"), got
