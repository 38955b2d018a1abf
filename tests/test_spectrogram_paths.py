"""Spectrogram naming-contract vectors (ref:
internal/processor/spectrogram_paths_test.go:45-140): the derived image
list is kind-major with one entry per stage per elected kind, every Path
is the exact `<stem>.spectrogram-<kind>-<stage>.png` suffix convention,
and the stored Path is always the RELATIVE basename of the stem.
"""

import pytest

from jivetalking_tpu.report.spectrogram import (
    ANALYSIS_STAGES,
    KIND_ROOMTONE,
    KIND_SPEECH,
    KIND_WHOLE,
    PROCESSING_STAGES,
    derive_spectrogram_images,
    spectrogram_path,
)

STEM = "/tmp/out/episode-LUFS-16-processed"
BASE = "episode-LUFS-16-processed"


def assert_images(got, stem_base, want):
    assert len(got) == len(want), got
    for img, (kind, stage) in zip(got, want):
        assert img["kind"] == kind and img["stage"] == stage, img
        assert img["path"] == f"{stem_base}.spectrogram-{kind}-{stage}.png"
        assert "/" not in img["path"], img["path"]


class TestDeriveSpectrogramImages:
    def test_processing_both_regions(self):
        # (ref: :45-61) 3 kinds x before/after = 6 entries, kind-major
        got = derive_spectrogram_images(STEM, PROCESSING_STAGES, True, True)
        assert_images(got, BASE, [
            (KIND_WHOLE, "before"), (KIND_WHOLE, "after"),
            (KIND_ROOMTONE, "before"), (KIND_ROOMTONE, "after"),
            (KIND_SPEECH, "before"), (KIND_SPEECH, "after"),
        ])

    def test_stem_basename(self):
        # (ref: :62-74) a different directory prefix yields the same
        # relative Paths
        got = derive_spectrogram_images(
            "/srv/podcasts/2026/show-LUFS-16-processed",
            ANALYSIS_STAGES, True, True)
        assert_images(got, "show-LUFS-16-processed", [
            (KIND_WHOLE, "input"),
            (KIND_ROOMTONE, "input"),
            (KIND_SPEECH, "input"),
        ])

    def test_no_room_tone_drops_the_whole_pair(self):
        # (ref: :75-92) all-or-nothing per kind: no half-pair
        got = derive_spectrogram_images(STEM, PROCESSING_STAGES, False, True)
        assert_images(got, BASE, [
            (KIND_WHOLE, "before"), (KIND_WHOLE, "after"),
            (KIND_SPEECH, "before"), (KIND_SPEECH, "after"),
        ])

    def test_analysis_only_single_input_stage(self):
        # (ref: :93-105) one input image per kind, no "after"
        got = derive_spectrogram_images(STEM, ANALYSIS_STAGES, True, True)
        assert_images(got, BASE, [
            (KIND_WHOLE, "input"),
            (KIND_ROOMTONE, "input"),
            (KIND_SPEECH, "input"),
        ])

    def test_whole_only_when_nothing_elected(self):
        # (ref: :106-125, :126-140) no regions -> whole-file only, both
        # stage sets
        got = derive_spectrogram_images(STEM, PROCESSING_STAGES, False, False)
        assert_images(got, BASE, [
            (KIND_WHOLE, "before"), (KIND_WHOLE, "after"),
        ])
        got = derive_spectrogram_images(STEM, ANALYSIS_STAGES, False, False)
        assert_images(got, BASE, [(KIND_WHOLE, "input")])


class TestSpectrogramPathConvention:
    @pytest.mark.parametrize("kind", [KIND_WHOLE, KIND_ROOMTONE, KIND_SPEECH])
    @pytest.mark.parametrize("stage", ["before", "after", "input"])
    def test_suffix_grammar(self, kind, stage):
        # (ref: spectrogram_paths.go:92 naming grammar)
        p = spectrogram_path("stem", kind, stage)
        assert p == f"stem.spectrogram-{kind}-{stage}.png"
