"""Region re-measure contracts on processed audio, ported from the
reference's analyser_output_test.go (291 LoC — the last uncited file in
the analyser test family).

The reference measures output regions by seeking the demuxer 5 s before
the region and metering through an ``atrim``-scoped graph: the seek
target floors at zero and the measured span stays
[start, start+duration) regardless of the seek point, because atrim keys
off file-absolute PTS (ref: analyser_output_test.go:44-118).  Here the
processed PCM is device-resident and a region measure is an exact slice
(jivetalking_tpu/analysis/regions.py), so the seek maths has no
counterpart — the behavioural contract that survives is the ATRIM SCOPE
itself: the measured span is region-absolute, clamps at the file edges,
and is independent of every sample outside it.
"""

import math

import numpy as np
import pytest

from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.regions import measure_region
from jivetalking_tpu.analysis.types import (
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)
from jivetalking_tpu.metering.astats import measure_astats
from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.metering.spectral import measure_spectral
from jivetalking_tpu.pipeline.process import _measure_output, _region_from_fused

SR = 44100


def _noise(dbfs, secs, sr=SR, seed=0):
    rng = np.random.default_rng(seed)
    amp = 10.0 ** (dbfs / 20.0)
    return (amp * rng.standard_normal(int(secs * sr))).astype(np.float32)


def _tone(freq, dbfs, secs, sr=SR):
    amp = 10.0 ** (dbfs / 20.0)
    t = np.arange(int(secs * sr), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.fixture(scope="module")
def signal():
    """12 s: loud tone | quiet noise | mid tone — distinct content on each
    side of the measured window so scope leaks are detectable."""
    return np.concatenate(
        [
            _tone(440.0, -6.0, 4.0),
            _noise(-40.0, 4.0, seed=7),
            _tone(2000.0, -20.0, 4.0),
        ]
    )


class TestRegionWindowAbsolute:
    """The measured span is exactly [start, end) in file-absolute time
    (ref: TestRegionSeekTargetWindowUnchanged,
    analyser_output_test.go:57-118: the atrim window is region-absolute
    and independent of the seek point)."""

    def test_region_equals_direct_segment_measure(self, signal):
        region = Region(start=4.5, end=7.0)
        got = measure_region(signal, SR, region)
        seg = signal[int(round(4.5 * SR)) : int(round(7.0 * SR))]
        ast = measure_astats(seg, SR)
        assert got.rms_level == pytest.approx(ast.rms_level, abs=1e-9)
        assert got.peak_level == pytest.approx(ast.peak_level, abs=1e-9)

    def test_early_region_floors_at_zero(self, signal):
        # ref vector "early region floors seek at zero": a region starting
        # before any pre-roll would fit still measures from sample 0
        got = measure_region(signal, SR, Region(start=0.0, end=2.0))
        seg = signal[: 2 * SR]
        assert got.rms_level == pytest.approx(
            measure_astats(seg, SR).rms_level, abs=1e-9
        )

    def test_region_past_eof_clamps(self, signal):
        n = signal.shape[0]
        got = measure_region(signal, SR, Region(start=10.0, end=99.0))
        seg = signal[int(round(10.0 * SR)) : n]
        assert got is not None
        assert got.peak_level == pytest.approx(
            measure_astats(seg, SR).peak_level, abs=1e-9
        )

    def test_empty_or_inverted_region_returns_none(self, signal):
        assert measure_region(signal, SR, Region(start=5.0, end=5.0)) is None
        assert measure_region(signal, SR, Region(start=7.0, end=5.0)) is None
        assert measure_region(signal, SR, Region(start=999.0, end=1000.0)) is None

    def test_window_width_preserved(self, signal):
        # the measured span has exactly end-start samples (no pre-roll
        # leakage into the window)
        region = Region(start=1.25, end=3.75)
        s = int(round(region.start * SR))
        e = int(round(region.end * SR))
        assert e - s == int(round(region.duration * SR))


class TestRegionScopeIndependence:
    """The reference's seek-then-trim guarantees the meters see ONLY the
    region (the pre-roll is a decode head start that atrim drops before
    the meters).  Device-PCM equivalent: the RegionSample must be
    identical when everything outside the region changes."""

    def test_outside_content_does_not_change_sample(self, signal):
        region = Region(start=4.0, end=8.0)
        a = measure_region(signal, SR, region)

        other = np.concatenate(
            [
                _noise(-3.0, 4.0, seed=11),  # different loud head
                signal[4 * SR : 8 * SR],  # same region content
                _tone(9000.0, -1.0, 4.0),  # different loud tail
            ]
        )
        b = measure_region(other, SR, region)
        for f in (
            "rms_level",
            "peak_level",
            "crest_factor",
            "momentary_lufs",
            "short_term_lufs",
            "true_peak",
            "sample_peak",
        ):
            assert getattr(a, f) == pytest.approx(getattr(b, f), abs=1e-9), f
        assert a.spectral.centroid == pytest.approx(b.spectral.centroid, abs=1e-6)


class TestRegionSampleMapping:
    """Every RegionSample field is sourced from its own measurement axis
    (ref: TestToRegionSample, analyser_output_test.go:131-174 — the
    eight-field copy, with the internal frame counter dropped)."""

    def test_eight_fields_sourced_per_axis(self, signal):
        region = Region(start=4.0, end=8.0)
        got = measure_region(signal, SR, region)
        seg = signal[4 * SR : 8 * SR]

        ast = measure_astats(seg, SR)
        spec = measure_spectral(seg, SR)
        loud = measure_loudness(seg, SR)

        assert got.rms_level == pytest.approx(ast.rms_level, abs=1e-9)
        assert got.peak_level == pytest.approx(ast.peak_level, abs=1e-9)
        # crest factor is derived, never measured separately
        assert got.crest_factor == pytest.approx(
            got.peak_level - got.rms_level, abs=1e-9
        )
        assert got.spectral.centroid == pytest.approx(spec.centroid, rel=1e-6)
        assert got.spectral.found
        assert got.momentary_lufs == pytest.approx(
            float(np.mean(loud.momentary_lufs)), abs=1e-9
        )
        assert got.short_term_lufs == pytest.approx(
            float(np.mean(loud.short_term_lufs)), abs=1e-9
        )
        assert got.true_peak == pytest.approx(loud.true_peak_db, abs=1e-9)
        assert got.sample_peak == pytest.approx(loud.sample_peak_db, abs=1e-9)

    def test_axes_are_distinct(self, signal):
        # rms (astats dBFS) and momentary (LUFS) must not be copies of
        # each other — the two-axis discipline at the RegionSample level
        got = measure_region(signal, SR, Region(start=4.0, end=8.0))
        assert got.rms_level != pytest.approx(got.momentary_lufs, abs=0.01)


class TestRegionPairPresence:
    """Presence routing for the (room tone, speech) region pair
    (ref: TestExtractRegionPair, analyser_output_test.go:176-291):
    absent profiles yield nil regions, present ones carry their exact
    window, and End = Start + Duration."""

    @staticmethod
    def _m(noise: Region | None, speech: Region | None) -> AudioMeasurements:
        m = AudioMeasurements()
        m.vad.noise_region = noise
        if noise is not None:
            m.vad.noise_profile = NoiseProfile(
                start=noise.start, duration=noise.duration
            )
        if speech is not None:
            m.vad.speech_profile = SpeechCandidate(
                region=speech, sample=RegionSample()
            )
        return m

    def test_both_absent(self, signal):
        out = _measure_output(signal, SR, self._m(None, None))
        assert out.room_tone_sample is None
        assert out.speech_sample is None

    def test_noise_only(self, signal):
        out = _measure_output(signal, SR, self._m(Region(4.0, 4.5), None))
        assert out.room_tone_sample is not None
        assert out.speech_sample is None

    def test_speech_only(self, signal):
        out = _measure_output(signal, SR, self._m(None, Region(5.0, 8.0)))
        assert out.room_tone_sample is None
        assert out.speech_sample is not None

    def test_both_present(self, signal):
        out = _measure_output(
            signal, SR, self._m(Region(4.0, 4.4), Region(8.0, 11.0))
        )
        assert out.room_tone_sample is not None
        assert out.speech_sample is not None

    def test_end_is_start_plus_duration(self):
        r = Region(start=2.0, end=2.5)
        assert r.end == pytest.approx(r.start + r.duration)
        r2 = Region(start=3.0, end=3.75)
        assert r2.duration == pytest.approx(0.75)

    def test_fused_presence_gate(self):
        # the fused masters route region presence the same way: an absent
        # profile is masked out in-graph and gated to None on unpack
        d = {"rms": 0.1, "peak": 0.5, "tp": 0.5, "momentary": -20.0}
        assert _region_from_fused(d, present=False) is None
        got = _region_from_fused(d, present=True)
        assert got is not None
        assert got.rms_level == pytest.approx(20.0 * math.log10(0.1))
        assert got.crest_factor == pytest.approx(
            got.peak_level - got.rms_level
        )
