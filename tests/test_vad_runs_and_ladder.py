"""Reference-vector mirrors: the speech-run builder's edge cases, the
noise-floor fallback ladder, and golden-refinement bounds.

Sources: buildSpeechRuns (ref: analyser_vad.go:473-548 — hysteresis
entry/exit, the loud-gap veto guard, the neutral zone, bridge tolerance),
gapToleranceIntervals (:405-444), assignInputNoiseFloor /
assignInputMeasurementSuggestions (ref: analyser.go:442-528), and
refineToSubregion (ref: analyser_candidates_shared.go:29-82).
"""

import math

import numpy as np
import pytest

from jivetalking_tpu.analysis.analyser import (
    AudioMeasurements,
    _assign_input_noise_floor,
    _assign_reduction_headroom,
)
from jivetalking_tpu.analysis.types import Region
from jivetalking_tpu.analysis.vad import (
    build_speech_runs,
    gap_tolerance_intervals,
    refine_to_subregion,
    score_interval_window_rms,
)

from tests.test_vad_vectors import HOP, build_intervals

SPLIT = -40.0
MARGIN = 2.0          # high = -38, low = -42
MIN_RUN = 40          # 10 s at 0.25 s hop


def _levels(*segments):
    """Concatenate (count, level) segments into one momentary array."""
    return np.concatenate([np.full(c, lv, dtype=np.float64)
                           for c, lv in segments])


class TestBuildSpeechRuns:
    """ref: buildSpeechRuns, analyser_vad.go:473-548."""

    def test_enter_requires_high_threshold(self):
        # >= split but < split+margin never STARTS a run (hysteresis entry)
        iv = build_intervals(_levels((50, -39.0)))
        assert build_speech_runs(iv, SPLIT, MARGIN, tol=4) == []
        iv2 = build_intervals(_levels((50, -37.0)))
        runs = build_speech_runs(iv2, SPLIT, MARGIN, tol=4)
        assert len(runs) == 1

    def test_loud_gap_veto_ends_run_at_last_speech(self):
        # a loud (>= split) interval that FAILS the spectral veto ends the
        # run exactly at the last speech interval; speech after it starts a
        # second run
        lv = _levels((45, -35.0), (1, -35.0), (45, -35.0))
        entropy = np.full(91, 0.3)
        entropy[45] = 0.9            # veto fail on the interruption
        iv = build_intervals(lv, entropy=entropy)
        runs = build_speech_runs(iv, SPLIT, MARGIN, tol=4)
        assert len(runs) == 2
        assert runs[0].start == pytest.approx(0.0)
        assert runs[0].end == pytest.approx(44 * HOP + HOP)
        assert runs[1].start == pytest.approx(46 * HOP)
        assert runs[1].end == pytest.approx(90 * HOP + HOP)

    def test_quiet_gap_bridged_within_tolerance(self):
        lv = _levels((45, -35.0), (4, -60.0), (45, -35.0))
        iv = build_intervals(lv)
        runs = build_speech_runs(iv, SPLIT, MARGIN, tol=4)
        assert len(runs) == 1
        assert runs[0].end == pytest.approx(93 * HOP + HOP)

    def test_quiet_gap_beyond_tolerance_flushes(self):
        lv = _levels((45, -35.0), (6, -60.0), (45, -35.0))
        iv = build_intervals(lv)
        runs = build_speech_runs(iv, SPLIT, MARGIN, tol=4)
        assert len(runs) == 2
        # flush lands on the LAST SPEECH interval, not the gap
        assert runs[0].end == pytest.approx(44 * HOP + HOP)
        assert runs[1].start == pytest.approx(51 * HOP)

    def test_neutral_zone_held_not_counted_as_gap(self):
        # low <= level < split is hysteresis hold: 10 such intervals exceed
        # the tolerance yet must NOT end the run (only below-low gaps count)
        lv = _levels((45, -35.0), (10, -41.0), (45, -35.0))
        iv = build_intervals(lv)
        runs = build_speech_runs(iv, SPLIT, MARGIN, tol=4)
        assert len(runs) == 1
        assert runs[0].end == pytest.approx(99 * HOP + HOP)

    def test_run_below_minimum_duration_discarded(self):
        # 30 speech intervals = 7.5 s < the 10 s minimum
        lv = _levels((30, -35.0), (60, -60.0))
        iv = build_intervals(lv)
        assert build_speech_runs(iv, SPLIT, MARGIN, tol=4) == []

    def test_trailing_run_flushed_at_stream_end(self):
        lv = _levels((10, -60.0), (45, -35.0))
        iv = build_intervals(lv)
        runs = build_speech_runs(iv, SPLIT, MARGIN, tol=4)
        assert len(runs) == 1
        assert runs[0].start == pytest.approx(10 * HOP)
        assert runs[0].end == pytest.approx(54 * HOP + HOP)


class TestGapToleranceClamp:
    """ref: gapToleranceIntervals, analyser_vad.go:405-444 — p75 of the
    interior gap lengths clamped to [2 s, 10 s] in hops ([8, 40] @ 250 ms)."""

    def _flags_with_gaps(self, gaps):
        flags = []
        for g in gaps:
            flags.extend([True])
            flags.extend([False] * g)
        flags.append(True)
        return np.asarray(flags, dtype=bool)

    def test_interior_p75_within_bounds(self):
        # gaps [8, 10, 12, 40]: nearest-rank p75 = sorted[int(.75*3)] =
        # sorted[2] = 12 (ref percentileOfSorted truncates) -> inside [8, 40]
        flags = self._flags_with_gaps([8, 10, 12, 40])
        assert gap_tolerance_intervals(flags, HOP) == 12

    def test_small_gaps_clamped_to_floor(self):
        flags = self._flags_with_gaps([1, 1, 2, 3])
        assert gap_tolerance_intervals(flags, HOP) == 8

    def test_huge_gaps_clamped_to_ceiling(self):
        flags = self._flags_with_gaps([100, 120, 200])
        assert gap_tolerance_intervals(flags, HOP) == 40

    def test_no_speech_returns_floor(self):
        assert gap_tolerance_intervals(np.zeros(50, dtype=bool), HOP) == 8


def _m(trough=0.0, rms=0.0, input_i=-15.0, input_thresh=-35.0):
    m = AudioMeasurements()
    m.dynamics.rms_trough = trough
    m.dynamics.rms_level = rms
    m.loudness.input_i = input_i
    m.loudness.input_thresh = input_thresh
    return m


class TestNoiseFloorLadder:
    """ref: assignInputNoiseFloor, analyser.go:490-519."""

    def test_tier1_astats_trough(self):
        m = _m(trough=-65.0, rms=-30.0)
        _assign_input_noise_floor(m)
        assert m.noise.floor == -65.0
        assert m.noise.floor_source == "astats"

    def test_tier2_rms_minus_15(self):
        m = _m(trough=0.0, rms=-30.0)
        _assign_input_noise_floor(m)
        assert m.noise.floor == -45.0
        assert m.noise.floor_source == "rms_estimate"

    def test_neg_inf_trough_falls_through(self):
        m = _m(trough=-math.inf, rms=-30.0)
        _assign_input_noise_floor(m)
        assert m.noise.floor_source == "rms_estimate"

    @pytest.mark.parametrize("input_i,offset", [
        (-15.0, 18.0),    # loud tier: InputI > -20
        (-25.0, 12.0),    # mid tier: -30 < InputI <= -20
        (-35.0, 8.0),     # quiet tier
        (-20.0, 12.0),    # boundary: -20 is NOT loud (strict >)
        (-30.0, 8.0),     # boundary: -30 is NOT mid (strict >)
    ])
    def test_tier3_ebur128_estimate(self, input_i, offset):
        m = _m(trough=0.0, rms=0.0, input_i=input_i, input_thresh=-45.0)
        _assign_input_noise_floor(m)
        assert m.noise.floor == pytest.approx(-45.0 - offset)
        assert m.noise.floor_source == "ebur128_estimate"

    def test_clamped_to_minus90_minus30(self):
        m = _m(trough=-120.0)
        _assign_input_noise_floor(m)
        assert m.noise.floor == -90.0
        m2 = _m(trough=-10.0)
        _assign_input_noise_floor(m2)
        assert m2.noise.floor == -30.0


class TestReductionHeadroom:
    """ref: assignInputMeasurementSuggestions, analyser.go:521-528."""

    def test_measured_pair_clamped_0_60(self):
        m = _m(rms=-20.0)
        m.noise.floor = -70.0
        _assign_reduction_headroom(m)
        assert m.noise.reduction_headroom == 50.0
        m.noise.floor = -90.0
        _assign_reduction_headroom(m)
        assert m.noise.reduction_headroom == 60.0
        m.noise.floor = -10.0
        _assign_reduction_headroom(m)
        assert m.noise.reduction_headroom == 0.0

    @pytest.mark.parametrize("input_i,want", [
        (-15.0, 40.0), (-25.0, 25.0), (-35.0, 15.0),
    ])
    def test_fallback_tiers(self, input_i, want):
        m = _m(rms=0.0, input_i=input_i)
        m.noise.floor = 0.0
        _assign_reduction_headroom(m)
        assert m.noise.reduction_headroom == want


class TestGoldenRefinementBounds:
    """ref: refineToSubregion, analyser_candidates_shared.go:29-82 and the
    golden-window bounds (noise 10 s window / 8 s minimum,
    analyser_noise_seed.go:20-24)."""

    def test_short_region_unchanged(self):
        iv = build_intervals(np.full(120, -60.0))
        region = Region(start=0.0, end=8.0)
        got, refined = refine_to_subregion(
            region, iv, 10.0, 8.0, score_interval_window_rms,
            lambda a, b: a < b)
        assert not refined
        assert got.start == region.start and got.end == region.end

    def test_refines_to_window_length_at_quietest_span(self):
        lv = np.full(120, -50.0)
        lv[60:100] = -70.0            # 10 s quiet dip at 15 s
        iv = build_intervals(lv)
        region = Region(start=0.0, end=30.0)
        got, refined = refine_to_subregion(
            region, iv, 10.0, 8.0, score_interval_window_rms,
            lambda a, b: a < b)
        assert refined
        assert got.duration == pytest.approx(10.0)
        assert got.start == pytest.approx(15.0)

    def test_too_few_intervals_below_minimum_unrefined(self):
        iv = build_intervals(np.full(20, -60.0))
        region = Region(start=0.0, end=20 * HOP)   # 5 s of intervals
        # region duration > window forces the refinement attempt; the 8 s
        # minimum (32 intervals) vetoes it
        got, refined = refine_to_subregion(
            Region(start=0.0, end=30.0), iv, 10.0, 8.0,
            score_interval_window_rms, lambda a, b: a < b)
        assert not refined


class TestIsSpeechIntervalVectors:
    """ref: TestIsSpeechInterval, analyser_vad_test.go:518-545 — speech =
    above the split AND inside the voice band AND low entropy."""

    SPLIT = -30.0

    @pytest.mark.parametrize("name,level,centroid,entropy,want", [
        ("above split, in band, low entropy", -20.0, 2000.0, 0.4, True),
        ("above split, out-of-band centroid", -20.0, 8000.0, 0.4, False),
        ("above split, high entropy", -20.0, 2000.0, 0.9, False),
        ("below split, otherwise speech-like", -40.0, 2000.0, 0.4, False),
    ])
    def test_table(self, name, level, centroid, entropy, want):
        from jivetalking_tpu.analysis.vad import (
            interval_levels,
            is_floored,
            passes_spectral_veto,
        )

        iv = build_intervals(np.asarray([level]), centroid=centroid,
                             entropy=entropy)
        lv = interval_levels(iv, "momentary")
        speech = bool(
            (~is_floored(lv))[0] and lv[0] >= self.SPLIT
            and passes_spectral_veto(iv)[0]
        )
        assert speech is want, name


class TestHysteresisMarginScaling:
    """ref: TestHysteresisMargin, analyser_vad_test.go:733-749 — the margin
    is positive and grows with the mode separation."""

    def test_scales_with_separation(self):
        from jivetalking_tpu.analysis.vad import hysteresis_margin

        near = build_intervals(np.concatenate(
            [np.full(40, -40.0), np.full(40, -30.0)]))
        far = build_intervals(np.concatenate(
            [np.full(40, -50.0), np.full(40, -10.0)]))
        split = -30.0
        m_near = hysteresis_margin(near.momentary_lufs, split)
        m_far = hysteresis_margin(far.momentary_lufs, split)
        assert m_near > 0 and m_far > 0
        assert m_far > m_near
