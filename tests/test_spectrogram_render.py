"""Spectrogram render integration contracts (ref:
internal/processor/spectrogram_integration_test.go:68-124 —
TestGenerateSpectrogramWholeFile, TestGenerateSpectrogramRegion,
TestGenerateSpectrogramDimensionParity): whole-file and region renders
produce decodable PNGs whose dimensions are content- and duration-
independent (frozen 1024x512 canvas + fixed legend), so before/after
pairs always match pixel-for-pixel in size.  The reference's
cancellation case maps to the pool-level cancel (pinned in
tests/test_pool_bounding.py) plus atomic_publish's no-partial-file
contract (tests/test_atomic_publish.py)."""

import numpy as np
import pytest

from jivetalking_tpu.report.spectrogram import (
    HEIGHT,
    WIDTH,
    render_spectrogram_image,
)

SR = 8000


def _tone(secs, sr=SR):
    t = np.arange(int(secs * sr)) / sr
    return (0.2 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)


def _dims(path):
    from PIL import Image

    with Image.open(path) as im:
        im.load()  # decodable, not just a header
        return im.size  # (w, h)


class TestRenderIntegration:
    def test_whole_file_renders_decodable_png(self, tmp_path):
        p = str(tmp_path / "whole.png")
        assert render_spectrogram_image(_tone(6.0), SR, p) == p
        w, h = _dims(p)
        assert h == HEIGHT
        assert w > WIDTH  # canvas + the legend strip

    def test_region_render(self, tmp_path):
        p = str(tmp_path / "region.png")
        render_spectrogram_image(_tone(8.0), SR, p, start=2.0, duration=3.0)
        assert _dims(p)[1] == HEIGHT

    def test_dimension_parity_whole_vs_region(self, tmp_path):
        # (ref: TestGenerateSpectrogramDimensionParity :105)
        whole = str(tmp_path / "whole.png")
        region = str(tmp_path / "region.png")
        x = _tone(8.0)
        render_spectrogram_image(x, SR, whole)
        render_spectrogram_image(x, SR, region, start=2.0, duration=3.0)
        assert _dims(whole) == _dims(region)

    def test_dimension_parity_across_durations_and_rates(self, tmp_path):
        dims = set()
        for i, (secs, sr) in enumerate(((1.0, 8000), (6.0, 8000),
                                        (3.0, 44100))):
            p = str(tmp_path / f"d{i}.png")
            render_spectrogram_image(_tone(secs, sr), sr, p)
            dims.add(_dims(p))
        assert len(dims) == 1, dims

    def test_sub_window_input_no_crash(self, tmp_path):
        # shorter than one STFT window: zero-padded, never a crash
        p = str(tmp_path / "tiny.png")
        render_spectrogram_image(_tone(0.05), SR, p)
        assert _dims(p)[1] == HEIGHT

    def test_failed_render_leaves_no_partial_png(self, tmp_path,
                                                 monkeypatch):
        # (ref: TestGenerateSpectrogramCancellation :85 — an aborted
        # render must leave no partial file; here the abort is a PNG-save
        # failure through atomic_publish's cleanup)
        import PIL.Image

        p = str(tmp_path / "broken.png")

        def boom(self, *a, **k):
            raise OSError("simulated save failure")

        monkeypatch.setattr(PIL.Image.Image, "save", boom)
        with pytest.raises(Exception, match="simulated|broken"):
            render_spectrogram_image(_tone(1.0), SR, p)
        import os

        assert not os.path.exists(p)
        assert not [f for f in os.listdir(tmp_path) if "broken" in f]
