"""Reference-vector mirrors for the VAD primitive tables
(ref: analyser_vad_test.go:24-520, analyser_noise_seed tests at :359-478).

Complements tests/test_vad_primitives.py (run building, elections,
refinement) with the exact hand-computed vectors the reference pins:
interval counting, Otsu clamping, the floored-fraction boundary, the
noise-floor seed's deterministic tie-break, and gate statistics."""

import math

import numpy as np
import pytest

from jivetalking_tpu.analysis.intervals import Intervals
from jivetalking_tpu.analysis.types import Region
from jivetalking_tpu.analysis.vad import (
    SPEECH_MIN_NOISE_MARGIN_DB,
    VAD_LEVEL_FLOOR_DB,
    VOICE_ACTIVATED_FRACTION,
    clamp_split,
    derive_gate_statistics,
    estimate_noise_floor_seed,
    floored_fraction,
    gap_tolerance_intervals,
    intervals_for_duration,
    is_floored,
    otsu_split_from_levels,
    percentile_floor,
    percentile_of_sorted,
)

HOP = 0.25


def build_intervals(momentary, flux=0.002, centroid=1000.0, entropy=0.3):
    """Intervals table with per-interval control of the veto/seed fields."""
    m = np.asarray(momentary, dtype=np.float64)
    n = m.size

    def arr(v):
        a = np.asarray(v, dtype=np.float64)
        return np.full(n, a, dtype=np.float64) if a.ndim == 0 else a

    spectral = {
        "mean": arr(1e-5), "variance": arr(1e-9), "centroid": arr(centroid),
        "spread": arr(800.0), "skewness": arr(0.5), "kurtosis": arr(6.0),
        "entropy": arr(entropy), "flatness": arr(0.3), "crest": arr(20.0),
        "flux": arr(flux), "slope": arr(0.0), "decrease": arr(0.0),
        "rolloff": arr(5000.0),
    }
    return Intervals(
        timestamp=np.arange(n) * HOP,
        rms_level=m - 2.0,
        peak_level=m + 10.0,
        momentary_lufs=m,
        short_term_lufs=m,
        true_peak=m + 10.0,
        sample_peak=m + 10.0,
        spectral=spectral,
        spectral_found=np.ones(n, dtype=bool),
        hop=HOP,
    )


class TestIntervalsForDuration:
    """(ref: analyser_vad_test.go:24-44)."""

    @pytest.mark.parametrize(
        "duration,hop,want",
        [
            (10.0, 0.25, 40),
            (2.0, 0.25, 8),
            (2.0, 0.10, 20),
            (10.0, 0.10, 100),
            (10.0, 0.0, 0),
        ],
    )
    def test_table(self, duration, hop, want):
        assert intervals_for_duration(duration, hop) == want


class TestOtsuSplit:
    """(ref: analyser_vad_test.go:107-163)."""

    def test_bimodal_valley(self):
        levels = np.sort(np.concatenate([
            -50 + np.arange(40) % 2,
            -18 + np.arange(40) % 2,
        ]).astype(np.float64))
        split = otsu_split_from_levels(levels, 1.0)
        assert -49 < split < -18

    def test_single_mode_stays_within_clamp_bounds(self):
        levels = np.sort((-18 + np.arange(80) % 2).astype(np.float64))
        p75 = percentile_of_sorted(levels, 75)
        noise_floor = -60.0
        split = clamp_split(otsu_split_from_levels(levels, 1.0), noise_floor, p75)
        lower = noise_floor + SPEECH_MIN_NOISE_MARGIN_DB
        assert lower - 0.001 <= split <= p75 + 0.001

    def test_degenerate_low_split_pinned_to_lower_bound(self):
        # with the noise-floor anchor above the raw split, the clamp must pin
        # to seed + 2 dB, never letting a low split admit room tone
        levels = np.sort((-50 + np.arange(80) % 2).astype(np.float64))
        p75 = percentile_of_sorted(levels, 75)
        noise_floor = -48.0
        split = clamp_split(otsu_split_from_levels(levels, 1.0), noise_floor, p75)
        assert split == pytest.approx(noise_floor + SPEECH_MIN_NOISE_MARGIN_DB, abs=0.001)


class TestPercentileFloor:
    """(ref: analyser_vad_test.go:165-188)."""

    def test_equals_configured_percentile(self):
        levels = np.arange(-60.0, 0.0)  # sorted ascending
        got = percentile_floor(levels, -200.0)  # anchor far below
        assert got == percentile_of_sorted(levels, 10.0)

    def test_clamped_to_seed_anchor(self):
        levels = np.asarray([-90.0, -89.0, -88.0, -87.0, -86.0])
        got = percentile_floor(levels, -50.0)
        assert got == -50.0 + SPEECH_MIN_NOISE_MARGIN_DB


class TestFlooredFraction:
    """(ref: analyser_vad_test.go:190-258, 478-516)."""

    def test_gated_slice_flips_true(self):
        iv = build_intervals([-15.0] * 40 + [-130.0] * 40 + [-math.inf] * 20)
        got = floored_fraction(iv)
        assert got == pytest.approx(0.60, abs=0.001)
        assert got >= VOICE_ACTIVATED_FRACTION

    def test_sparse_below_split_stays_false(self):
        # high below-split fraction but ZERO digital-silence intervals
        iv = build_intervals([-55.0] * 70 + [-15.0] * 30)
        assert floored_fraction(iv) == 0.0

    def test_boundary_exactly_020_passes_ge(self):
        iv = build_intervals([-130.0] * 20 + [-15.0] * 80)
        got = floored_fraction(iv)
        assert got == pytest.approx(0.20, abs=0.001)
        assert got >= VOICE_ACTIVATED_FRACTION

    def test_just_under_020_fails_ge(self):
        iv = build_intervals([-130.0] * 19 + [-15.0] * 81)
        got = floored_fraction(iv)
        assert got == pytest.approx(0.19, abs=0.001)
        assert got < VOICE_ACTIVATED_FRACTION


class TestIsFloored:
    """(ref: TestIsFlooredLevel, analyser_vad_test.go:1244)."""

    def test_boundary_and_nonfinite(self):
        levels = np.asarray([VAD_LEVEL_FLOOR_DB, VAD_LEVEL_FLOOR_DB - 1,
                             VAD_LEVEL_FLOOR_DB + 1, -math.inf, math.nan, -20.0])
        got = is_floored(levels)
        assert got.tolist() == [True, True, False, True, True, False]


class TestNoiseFloorSeed:
    """(ref: analyser_vad_test.go:359-477) — the deterministic tie-break and
    floored-exclusion contract of estimateNoiseFloorAndThreshold."""

    def _tied_set(self, order=None):
        # 25 tied score-1.0 intervals (quiet, low flux) at distinct levels,
        # plus 25 louder high-flux intervals that score lower
        levels = np.concatenate([-80.0 + np.arange(25), -30.0 + np.arange(25)])
        flux = np.concatenate([np.full(25, 0.01), np.full(25, 0.50)])
        if order is not None:
            levels, flux = levels[order], flux[order]
        return build_intervals(levels, flux=flux)

    def test_tied_score_order_independent(self):
        floor_a, thresh_a, ok_a = estimate_noise_floor_seed(self._tied_set())
        rng = np.random.default_rng(7)
        order = rng.permutation(50)
        floor_b, thresh_b, ok_b = estimate_noise_floor_seed(self._tied_set(order))
        assert ok_a and ok_b
        assert floor_a == floor_b
        assert thresh_a == thresh_b

    def test_truncation_picks_lowest_rms(self):
        # tied run supplied loudest-first: the tie-break must still keep the
        # lowest levels; seed = max over the kept candidateCount = max(50/5, 8)
        levels = np.concatenate([-56.0 - np.arange(25), -30.0 + np.arange(25)])
        flux = np.concatenate([np.full(25, 0.01), np.full(25, 0.50)])
        floor, _, ok = estimate_noise_floor_seed(build_intervals(levels, flux=flux))
        assert ok
        candidate_count = max(50 // 5, 8)
        assert floor == pytest.approx(-80.0 + (candidate_count - 1), abs=0.001)

    def test_excludes_floored_from_seed(self):
        levels = np.concatenate([
            np.full(3, -130.0),           # digital silence: sorts first, excluded
            -70.0 + np.arange(40),        # real room tone: the only valid source
            -10.0 + np.arange(10),        # louder, sets the medians
        ])
        flux = np.concatenate([np.full(3, 0.01), np.full(40, 0.01), np.full(10, 0.50)])
        floor, _, ok = estimate_noise_floor_seed(build_intervals(levels, flux=flux))
        assert ok
        assert floor > VAD_LEVEL_FLOOR_DB

    def test_all_floored_returns_not_ok(self):
        iv = build_intervals(np.full(15, -130.0), flux=0.01)
        _, _, ok = estimate_noise_floor_seed(iv)
        assert not ok

    def test_too_few_intervals_not_ok(self):
        iv = build_intervals(np.full(9, -60.0))
        _, _, ok = estimate_noise_floor_seed(iv)
        assert not ok


class TestGapTolerance:
    """(ref: analyser_vad_test.go:692-731)."""

    def test_p75_of_interior_gaps_clamped(self):
        flags = []
        for n, v in [(5, True), (4, False), (5, True), (6, False), (5, True),
                     (12, False), (5, True), (30, False), (5, True), (20, False)]:
            flags += [v] * n
        got = gap_tolerance_intervals(np.asarray(flags), HOP)
        # p75 over interior gaps {4,6,12,30} (nearest-rank) = 12, inside [8,40]
        floor = intervals_for_duration(2.0, HOP)
        ceiling = intervals_for_duration(10.0, HOP)
        want = max(floor, min(ceiling, int(round(
            percentile_of_sorted(np.asarray([4.0, 6.0, 12.0, 30.0]), 75)))))
        assert got == want == 12

    def test_no_interior_gap_returns_floor(self):
        flags = np.asarray([True, True, True, False, False])
        assert gap_tolerance_intervals(flags, HOP) == intervals_for_duration(2.0, HOP)


class TestDeriveGateStatistics:
    """(ref: analyser_vad_test.go:950-1158) — hand-computed nearest-rank
    percentiles and the veto/region scoping of the voiced set."""

    SPLIT = -30.0

    def test_hand_computed_percentiles(self):
        # noise: 20 below-split at -60..-41; p95 idx = int(0.95*19) = 18 -> -42
        # voiced: 21 in-region at -25..-5; p10 idx = int(0.10*20) = 2 -> -23
        levels = np.concatenate([-60.0 + np.arange(20), -25.0 + np.arange(21)])
        iv = build_intervals(levels)
        region = Region(20 * HOP, 41 * HOP)
        got = derive_gate_statistics(iv, self.SPLIT, region)
        assert got.voiced_low_percentile == pytest.approx(-23.0, abs=0.001)
        assert got.noise_high_percentile == pytest.approx(-42.0, abs=0.001)
        assert got.separation_db == pytest.approx(19.0, abs=0.001)

    def test_veto_failures_excluded_from_voiced_set(self):
        # 11 speech at -20..-10 (veto passes) + 5 loud in-region non-speech
        # (entropy above ceiling -> veto fails).  p10 over the 11 -> -19
        levels = np.concatenate([-20.0 + np.arange(11), np.full(5, -5.0)])
        entropy = np.concatenate([np.full(11, 0.3), np.full(5, 0.9)])
        iv = build_intervals(levels, entropy=entropy)
        region = Region(0.0, 16 * HOP)
        got = derive_gate_statistics(iv, self.SPLIT, region)
        assert got.voiced_low_percentile == pytest.approx(-19.0, abs=0.001)

    def test_only_in_region_speech_counts(self):
        # out-of-region speech at -25 must not lower the in-region p10 of -15
        levels = np.concatenate([np.full(10, -25.0), np.full(11, -15.0)])
        iv = build_intervals(levels)
        region = Region(10 * HOP, 21 * HOP)
        got = derive_gate_statistics(iv, self.SPLIT, region)
        assert got.voiced_low_percentile == pytest.approx(-15.0, abs=0.001)

    def test_nil_region_leaves_voiced_empty(self):
        # no profile: voiced p10 is the empty-set zero, separation = -noise p95
        iv = build_intervals(-60.0 + np.arange(20))
        got = derive_gate_statistics(iv, self.SPLIT, None)
        assert got.voiced_low_percentile == 0.0
        assert got.noise_high_percentile == pytest.approx(-42.0, abs=0.001)
        assert got.separation_db == pytest.approx(42.0, abs=0.001)


from jivetalking_tpu.analysis.vad import (  # noqa: E402
    MIN_VIABLE_SPEECH_SCORE,
    find_best_speech_region,
    level_variance,
)


class TestFindBestSpeechRegionVectors:
    """(ref: analyser_candidates_speech_test.go:132-219)."""

    def _runs(self, specs):
        """specs: [(n_intervals, level)] separated by 20 quiet intervals;
        returns (iv, [Region])."""
        levels, regions, idx = [], [], 0
        for n, lv in specs:
            start = idx * HOP
            levels += [lv] * n
            idx += n
            regions.append(Region(start, idx * HOP))
            levels += [-75.0] * 20
            idx += 20
        return build_intervals(np.asarray(levels)), regions

    def test_voice_activated_case_sparse_wide_snr_wins(self):
        # a sparse short wide-SNR run beats a long narrow-SNR run: the
        # duration term saturates at the adequacy minimum
        min_iv = int(30.0 / HOP)
        iv, regions = self._runs([(min_iv + 4, -18.0), ((min_iv + 4) * 3, -38.0)])
        best, _ = find_best_speech_region(regions, iv, -60.0)
        assert best is not None
        assert best.start == regions[0].start

    def test_always_elects_sub_floor_fallback(self):
        # a lone 3 s run 2 dB over the floor scores under the 0.3 sanity
        # minimum but must still be elected via the fallback
        iv, regions = self._runs([(12, -33.0)])
        best, candidates = find_best_speech_region(regions, iv, -35.0)
        assert best is not None
        assert best.start == regions[0].start
        assert len(candidates) == 1
        assert candidates[0].score < MIN_VIABLE_SPEECH_SCORE

    def test_all_below_snr_minimum_elects_highest(self):
        # both candidates sit in the sub-minimum SNR band (~10.65 / ~11.54 dB
        # margins); the scorer ranks within the band, electing the higher
        iv, regions = self._runs([(74, -49.35), (81, -48.46)])
        best, _ = find_best_speech_region(regions, iv, -60.0)
        assert best is not None
        assert best.start == regions[1].start


class TestLevelVariance:
    """(ref: analyser_candidates_speech_test.go:221-239)."""

    def test_flat_zero_spread_positive(self):
        flat = build_intervals(np.full(20, -20.0))
        assert level_variance(flat, Region(0.0, 20 * HOP)) <= 1e-9
        spread_levels = np.where(np.arange(20) % 2 == 1, -24.0, -16.0)
        spread = build_intervals(spread_levels.astype(np.float64))
        assert level_variance(spread, Region(0.0, 20 * HOP)) > 1e-9

    def test_empty_region_is_zero(self):
        iv = build_intervals(np.full(10, -20.0))
        assert level_variance(iv, Region(100.0, 110.0)) == 0.0
