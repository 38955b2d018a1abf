"""Speech-election behavioural vectors ported from the reference's analyser
integration suite (ref: internal/processor/analyser_test.go:264-1027 —
TestGetIntervalsInRange, TestScoreIntervalWindow,
TestMeasureSpeechCandidateFromIntervals, TestFindBestSpeechRegion*,
TestScoreSpeechIntervalWindow, TestRefineToGoldenSpeechSubregion,
TestFindBestSpeechRegion_SNRMarginCheck).  Every expected value and
fixture shape reproduces the reference table."""


import numpy as np
import pytest

from jivetalking_tpu.analysis.intervals import Intervals
from jivetalking_tpu.analysis.types import Region
from jivetalking_tpu.analysis.vad import (
    GOLDEN_SPEECH_WINDOW_DURATION,
    GOLDEN_SPEECH_WINDOW_MINIMUM,
    MIN_VIABLE_SPEECH_SCORE,
    find_best_speech_region,
    measure_speech_candidate,
    refine_to_subregion,
    score_interval_window_rms,
    score_speech_interval_window,
)

HOP = 0.25
SPEC_KEYS = (
    "mean", "variance", "centroid", "spread", "skewness", "kurtosis",
    "entropy", "flatness", "crest", "flux", "slope", "decrease", "rolloff",
)


def make_intervals(
    start: float = 0.0,
    count: int = 0,
    rms: float = -20.0,
    peak: float | np.ndarray = None,
    kurtosis: float = 5.0,
    flatness: float = 0.3,
    centroid: float = 1500.0,
    entropy: float = 0.5,
    rolloff: float = 6000.0,
    flux: float = 0.003,
    momentary: float | None = None,
) -> Intervals:
    """The reference's makeTestIntervals / makeSpeechTestIntervals /
    makeSpeechIntervalsScorable fixtures as one struct-of-arrays builder
    (ref: analyser_test.go:388-402, 836-857)."""
    ts = start + np.arange(count) * HOP
    rms_a = np.full(count, rms, dtype=np.float64)
    peak_a = (np.full(count, rms + 12.0) if peak is None
              else np.broadcast_to(np.asarray(peak, np.float64), (count,)).copy())
    mom = np.full(count, rms if momentary is None else momentary, np.float64)
    spectral = {k: np.zeros(count) for k in SPEC_KEYS}
    spectral["kurtosis"] = np.full(count, kurtosis, np.float64)
    spectral["flatness"] = np.full(count, flatness, np.float64)
    spectral["centroid"] = np.full(count, centroid, np.float64)
    spectral["entropy"] = np.full(count, entropy, np.float64)
    spectral["rolloff"] = np.full(count, rolloff, np.float64)
    spectral["flux"] = np.full(count, flux, np.float64)
    return Intervals(
        timestamp=ts, rms_level=rms_a, peak_level=peak_a,
        momentary_lufs=mom, short_term_lufs=mom.copy(),
        true_peak=peak_a.copy(), sample_peak=peak_a.copy(),
        spectral=spectral, spectral_found=np.ones(count, bool), hop=HOP,
    )


def concat_intervals(*ivs: Intervals) -> Intervals:
    return Intervals(
        timestamp=np.concatenate([i.timestamp for i in ivs]),
        rms_level=np.concatenate([i.rms_level for i in ivs]),
        peak_level=np.concatenate([i.peak_level for i in ivs]),
        momentary_lufs=np.concatenate([i.momentary_lufs for i in ivs]),
        short_term_lufs=np.concatenate([i.short_term_lufs for i in ivs]),
        true_peak=np.concatenate([i.true_peak for i in ivs]),
        sample_peak=np.concatenate([i.sample_peak for i in ivs]),
        spectral={k: np.concatenate([i.spectral[k] for i in ivs]) for k in SPEC_KEYS},
        spectral_found=np.concatenate([i.spectral_found for i in ivs]),
        hop=HOP,
    )


class TestGetIntervalsInRange:
    """(ref: TestGetIntervalsInRange, analyser_test.go:264-333): the
    [start, end) mask over an 80-interval (20 s) table."""

    CASES = [
        ("full range", 0.0, 20.0, 80, 0.0, 19.75),
        ("middle range", 5.0, 15.0, 40, 5.0, 14.75),
        ("no overlap - before", 25.0, 30.0, 0, None, None),
        ("partial overlap at start", 0.0, 2.0, 8, 0.0, 1.75),
    ]

    @pytest.mark.parametrize("name,start,end,want_count,want_first,want_last", CASES)
    def test_vectors(self, name, start, end, want_count, want_first, want_last):
        iv = make_intervals(count=80)
        mask = iv.slice_range(start, end)
        idx = np.flatnonzero(mask)
        assert idx.size == want_count, name
        if want_count:
            assert iv.timestamp[idx[0]] == pytest.approx(want_first), name
            assert iv.timestamp[idx[-1]] == pytest.approx(want_last), name


class TestScoreIntervalWindow:
    """(ref: TestScoreIntervalWindow, analyser_test.go:335-385)."""

    @pytest.mark.parametrize(
        "name,rms_vals,want",
        [
            ("uniform values", [-70, -70, -70, -70], -70.0),
            ("mixed values", [-60, -70, -80, -70], -70.0),
            ("single value", [-65.5], -65.5),
            ("empty returns zero", [], 0.0),
        ],
    )
    def test_vectors(self, name, rms_vals, want):
        iv = make_intervals(count=len(rms_vals))
        if rms_vals:
            iv.rms_level[:] = rms_vals
        got = score_interval_window_rms(iv, np.arange(len(rms_vals)))
        assert got == pytest.approx(want, abs=0.001), name


class TestMeasureSpeechCandidate:
    """(ref: TestMeasureSpeechCandidateFromIntervals,
    analyser_test.go:408-468)."""

    def test_computes_metrics(self):
        iv = make_intervals(count=40, rms=-20.0, peak=-8.0, centroid=1500.0,
                            kurtosis=5.0, flatness=0.3, entropy=0.5)
        iv.peak_level[20] = -5.0   # one hotter interval
        c = measure_speech_candidate(iv, Region(0.0, 10.0))
        assert c is not None
        assert c.sample.rms_level == pytest.approx(-20.0)
        assert c.sample.peak_level == pytest.approx(-5.0)   # max, not mean
        assert c.sample.crest_factor == pytest.approx(-5.0 - (-20.0))
        assert c.sample.spectral.centroid == pytest.approx(1500.0)

    def test_nil_for_empty_range(self):
        iv = make_intervals(count=40, rms=-20.0)
        assert measure_speech_candidate(iv, Region(100.0, 110.0)) is None


class TestFindBestSpeechRegion:
    """(ref: TestFindBestSpeechRegion, analyser_test.go:470-522)."""

    def test_duration_adequacy_saturates(self):
        # uniform speech + no noise profile: SNR saturates for all; the
        # 50 s run must NOT outrank the first adequate 35 s run on length
        iv = make_intervals(count=400, rms=-18.0)
        regions = [Region(0.0, 35.0), Region(40.0, 90.0), Region(95.0, 100.0)]
        best, cands = find_best_speech_region(regions, iv, None)
        assert best is not None
        assert best.start == pytest.approx(0.0)

    def test_nil_for_empty_regions(self):
        iv = make_intervals(count=200, rms=-18.0)
        best, cands = find_best_speech_region([], iv, None)
        assert best is None and cands == []

    def test_stores_all_candidates(self):
        iv = make_intervals(count=400, rms=-18.0)
        best, cands = find_best_speech_region(
            [Region(0.0, 35.0), Region(40.0, 80.0)], iv, None)
        assert len(cands) == 2


class TestFallbackBelowMinScore:
    """(ref: TestFindBestSpeechRegion_AllBelowMinAcceptableScoreFallsBack,
    analyser_test.go:522-602): two short low-SNR runs score under the
    sanity floor; the always-elect fallback still picks the higher one."""

    def test_fallback_elects_highest(self):
        low = make_intervals(start=0.0, count=40, rms=-33.0, peak=-23.0,
                             momentary=-33.0)
        high = make_intervals(start=15.0, count=40, rms=-27.0, peak=-17.0,
                              momentary=-27.0)
        iv = concat_intervals(low, high)
        regions = [Region(0.0, 10.0), Region(15.0, 25.0)]
        best, cands = find_best_speech_region(regions, iv, -35.0)
        assert best is not None
        assert best.start == pytest.approx(15.0)
        assert len(cands) == 2
        for c in cands:
            assert c.score < MIN_VIABLE_SPEECH_SCORE
        assert cands[1].score > cands[0].score


class TestScoreSpeechIntervalWindow:
    """(ref: TestScoreSpeechIntervalWindow, analyser_test.go:603-723):
    band expectations for the 8-term weighted window score."""

    def test_continuous_speech_high_quality(self):
        iv = make_intervals(count=40, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-15.0)
        s = score_speech_interval_window(iv, np.arange(40))
        assert 0.80 <= s <= 1.0

    def test_pause_heavy_high_variance(self):
        iv = make_intervals(count=40, rms=-35.0, flatness=0.8,
                            centroid=7000.0, rolloff=12000.0, flux=0.05)
        iv.spectral["kurtosis"][:] = np.where(np.arange(40) % 2 == 0, 15.0, 1.0)
        s = score_speech_interval_window(iv, np.arange(40))
        assert 0.0 <= s <= 0.40

    def test_empty_returns_zero(self):
        iv = make_intervals(count=0)
        assert score_speech_interval_window(iv, np.arange(0)) == 0.0

    def test_low_kurtosis_flat_spectrum(self):
        iv = make_intervals(count=40, kurtosis=2.0, flatness=0.8,
                            centroid=7000.0, rms=-32.0)
        s = score_speech_interval_window(iv, np.arange(40))
        assert 0.25 <= s <= 0.50

    def test_centroid_at_edge_of_voice_range(self):
        iv = make_intervals(count=40, kurtosis=6.0, flatness=0.1,
                            centroid=4400.0, rms=-15.0)
        s = score_speech_interval_window(iv, np.arange(40))
        assert 0.75 <= s <= 0.95

    def test_quiet_speech_low_rms(self):
        iv = make_intervals(count=40, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-28.0)
        s = score_speech_interval_window(iv, np.arange(40))
        assert 0.75 <= s <= 0.90

    def test_score_clamped_to_unit_interval(self):
        for kw in (dict(kurtosis=20.0, rms=-5.0), dict(kurtosis=0.0, rms=-60.0)):
            iv = make_intervals(count=40, **kw)
            s = score_speech_interval_window(iv, np.arange(40))
            assert 0.0 <= s <= 1.0


class TestRefineToGoldenSubregion:
    """(ref: TestRefineToGoldenSpeechSubregion, analyser_test.go:725-849)."""

    def _refine(self, region, iv):
        return refine_to_subregion(
            region, iv, GOLDEN_SPEECH_WINDOW_DURATION,
            GOLDEN_SPEECH_WINDOW_MINIMUM,
            score_speech_interval_window, lambda a, b: a > b)

    def test_short_region_unchanged(self):
        iv = make_intervals(start=10.0, count=160, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-15.0)
        r, refined = self._refine(Region(10.0, 50.0), iv)
        assert not refined
        assert (r.start, r.duration) == (10.0, 40.0)

    def test_uniform_quality_returns_first_window(self):
        iv = make_intervals(count=480, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-15.0)
        r, refined = self._refine(Region(0.0, 120.0), iv)
        assert refined
        assert r.start == pytest.approx(0.0)
        assert r.duration == pytest.approx(60.0)

    def test_clear_best_window_at_end(self):
        first = make_intervals(start=0.0, count=240, kurtosis=3.0,
                               flatness=0.5, centroid=2000.0, rms=-25.0)
        second = make_intervals(start=60.0, count=240, kurtosis=8.0,
                                flatness=0.08, centroid=2000.0, rms=-12.0)
        iv = concat_intervals(first, second)
        r, refined = self._refine(Region(0.0, 120.0), iv)
        assert refined
        assert r.start == pytest.approx(60.0)
        assert r.duration == pytest.approx(60.0)

    def test_insufficient_intervals_unchanged(self):
        iv = make_intervals(count=100, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-15.0)   # 25 s < 30 s minimum
        r, refined = self._refine(Region(0.0, 90.0), iv)
        assert not refined
        assert (r.start, r.duration) == (0.0, 90.0)

    def test_no_intervals_in_range_unchanged(self):
        iv = make_intervals(count=480, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-15.0)   # covers 0-120 s
        r, refined = self._refine(Region(200.0, 320.0), iv)
        assert not refined
        assert (r.start, r.duration) == (200.0, 120.0)


class TestFindBestWithRefinement:
    """(ref: TestFindBestSpeechRegion_WithRefinement,
    analyser_test.go:849-966)."""

    def test_refines_long_region(self):
        first = make_intervals(start=0.0, count=240, kurtosis=4.0,
                               flatness=0.3, centroid=2000.0, rms=-20.0)
        second = make_intervals(start=60.0, count=240, kurtosis=7.0,
                                flatness=0.1, centroid=2000.0, rms=-14.0)
        iv = concat_intervals(first, second)
        best, cands = find_best_speech_region([Region(0.0, 120.0)], iv, None)
        assert best is not None and cands
        refined = [c for c in cands if c.was_refined]
        assert refined, "expected was_refined=True for the long region"
        c = refined[0]
        assert c.original_start == pytest.approx(0.0)
        assert c.original_duration == pytest.approx(120.0)
        assert c.region.duration <= 60.0 + 1e-9

    def test_does_not_refine_short_region(self):
        iv = make_intervals(count=180, kurtosis=6.0, flatness=0.1,
                            centroid=2000.0, rms=-15.0)
        best, cands = find_best_speech_region([Region(0.0, 45.0)], iv, None)
        assert best is not None
        assert not any(c.was_refined for c in cands)
        assert best.duration == pytest.approx(45.0)

    def test_selects_best_window_from_long_region(self):
        poor1 = make_intervals(start=0.0, count=120, kurtosis=2.0,
                               flatness=0.6, centroid=3500.0, rms=-28.0)
        excellent = make_intervals(start=30.0, count=240, kurtosis=8.0,
                                   flatness=0.05, centroid=2000.0, rms=-12.0)
        poor2 = make_intervals(start=90.0, count=120, kurtosis=2.0,
                               flatness=0.6, centroid=3500.0, rms=-28.0)
        iv = concat_intervals(poor1, excellent, poor2)
        best, _ = find_best_speech_region([Region(0.0, 120.0)], iv, None)
        assert best is not None
        assert 30.0 - 1e-9 <= best.start <= 60.0 + 1e-9
        assert best.duration == pytest.approx(60.0)


class TestSNRMarginCheck:
    """(ref: TestFindBestSpeechRegion_SNRMarginCheck,
    analyser_test.go:966-1027)."""

    def _score_at(self, cands, start):
        for c in cands:
            if c.region.start == pytest.approx(start):
                return c.score
        raise AssertionError("candidate not found")

    def test_wider_snr_margin_scores_higher(self):
        iv = make_intervals(count=140, kurtosis=6.0, flatness=0.1,
                            centroid=1500.0, rms=-20.0)
        regions = [Region(0.0, 35.0)]
        _, wide = find_best_speech_region(regions, iv, -55.0)
        _, narrow = find_best_speech_region(regions, iv, -30.0)
        assert self._score_at(narrow, 0.0) < self._score_at(wide, 0.0)

    def test_nil_profile_saturates_snr(self):
        iv = make_intervals(count=140, kurtosis=6.0, flatness=0.1,
                            centroid=1500.0, rms=-20.0)
        regions = [Region(0.0, 35.0)]
        _, none_c = find_best_speech_region(regions, iv, None)
        _, finite_c = find_best_speech_region(regions, iv, -40.0)
        assert self._score_at(none_c, 0.0) >= self._score_at(finite_c, 0.0) - 1e-12


class TestGroundedScoringLaws:
    """(ref: analyser_candidates_speech_test.go:50-111 —
    TestScoreSpeechCandidateGrounded_SNRMonotonicity /
    _DurationAdequacySaturation / _ConsistencyTieBreak)."""

    FLOOR = -60.0

    @staticmethod
    def _candidate(rms: float, duration: float):
        from jivetalking_tpu.analysis.types import RegionSample, SpeechCandidate

        return SpeechCandidate(region=Region(0.0, duration),
                               sample=RegionSample(rms_level=rms))

    def test_snr_monotonicity(self):
        from jivetalking_tpu.analysis.vad import (
            MIN_SNR_MARGIN,
            score_speech_candidate_grounded as score,
        )

        dur = 45.0
        narrow = score(self._candidate(self.FLOOR + 25.0, dur), self.FLOOR, 0.0)
        wide = score(self._candidate(self.FLOOR + 45.0, dur), self.FLOOR, 0.0)
        assert wide > narrow
        below = score(self._candidate(
            self.FLOOR + MIN_SNR_MARGIN - 10.0, dur), self.FLOOR, 0.0)
        above = score(self._candidate(
            self.FLOOR + MIN_SNR_MARGIN + 5.0, dur), self.FLOOR, 0.0)
        assert below < above

    def test_duration_adequacy_saturates(self):
        from jivetalking_tpu.analysis.vad import (
            SPEECH_DURATION_ADEQUACY_MIN as MIN_DUR,
            score_speech_candidate_grounded as score,
        )

        rms = -20.0      # 40 dB margin, identical SNR for all
        at_min = score(self._candidate(rms, MIN_DUR), self.FLOOR, 0.0)
        well_above = score(self._candidate(rms, MIN_DUR * 3), self.FLOOR, 0.0)
        assert at_min == well_above      # the longer run does NOT outrank
        below = score(self._candidate(rms, MIN_DUR / 2), self.FLOOR, 0.0)
        assert below < at_min

    def test_consistency_tiebreak(self):
        from jivetalking_tpu.analysis.vad import (
            score_speech_candidate_grounded as score,
        )

        c = self._candidate(-20.0, 45.0)
        steady = score(c, self.FLOOR, 1.0)
        noisy = score(c, self.FLOOR, 9.0)
        assert steady > noisy            # lower level variance wins the tie


class TestVoiceActivatedElection:
    """(ref: TestFindBestSpeechRegion_VoiceActivatedCase,
    analyser_candidates_speech_test.go:132-158): the saturating duration
    term does not penalise sparse delivery — a short wide-SNR run beats a
    3x-longer narrow-SNR run."""

    def test_sparse_wide_snr_beats_long_narrow(self):
        from jivetalking_tpu.analysis.vad import SPEECH_DURATION_ADEQUACY_MIN

        min_ivs = int(SPEECH_DURATION_ADEQUACY_MIN / HOP)
        short = make_intervals(start=0.0, count=min_ivs + 4, rms=-18.0,
                               momentary=-18.0)
        short_end = (min_ivs + 4) * HOP
        long_start = short_end + 5.0
        long = make_intervals(start=long_start, count=(min_ivs + 4) * 3,
                              rms=-38.0, momentary=-38.0)
        long_end = long_start + (min_ivs + 4) * 3 * HOP

        iv = concat_intervals(short, long)
        regions = [Region(0.0, short_end), Region(long_start, long_end)]
        best, _ = find_best_speech_region(regions, iv, -60.0)
        assert best is not None
        assert best.start == pytest.approx(0.0), (
            "duration adequacy must saturate — the sparse wide-SNR run wins")


class TestAlwaysElects:
    """(ref: TestFindBestSpeechRegion_AlwaysElects,
    analyser_candidates_speech_test.go:162-184): a lone sub-floor run is
    still elected via the fallback, its score under the sanity floor."""

    def test_lone_subfloor_run_elected(self):
        iv = make_intervals(start=0.0, count=12, rms=-33.0, momentary=-33.0)
        end = 12 * HOP
        best, cands = find_best_speech_region([Region(0.0, end)], iv, -35.0)
        assert best is not None
        assert best.start == pytest.approx(0.0)
        assert len(cands) == 1
        assert cands[0].score < MIN_VIABLE_SPEECH_SCORE


class TestAllBelowSNRMinimumElectsHighest:
    """(ref: TestFindBestSpeechRegion_AllBelowSNRMinimumElectsHighest,
    analyser_candidates_speech_test.go:193-219 — the LMP-81s-martin corpus
    edge): two runs both under MIN_SNR_MARGIN; the scorer ranks within the
    sub-minimum band and elects the HIGHER-SNR run."""

    def test_higher_snr_subminimum_run_wins(self):
        floor = -60.0
        lo = make_intervals(start=0.0, count=74, rms=-49.35, momentary=-49.35)
        lo_end = 74 * HOP
        hi_start = lo_end + 5.0
        hi = make_intervals(start=hi_start, count=81, rms=-48.46,
                            momentary=-48.46)
        hi_end = hi_start + 81 * HOP

        iv = concat_intervals(lo, hi)
        regions = [Region(0.0, lo_end), Region(hi_start, hi_end)]
        best, _ = find_best_speech_region(regions, iv, floor)
        assert best is not None
        assert best.start == pytest.approx(hi_start)
