"""Deep table tests for the VAD primitives (the reference's
analyser_vad_test.go tier): clamps, hysteresis, run building with the
loud-gap guard, golden refinement, and the grounded election maths."""

import numpy as np
import pytest

from jivetalking_tpu.analysis.intervals import Intervals
from jivetalking_tpu.analysis.types import Region
from jivetalking_tpu.analysis.vad import (
    GOLDEN_SPEECH_WINDOW_DURATION,
    build_speech_runs,
    clamp_split,
    find_best_speech_region,
    grounded_duration_score,
    grounded_snr_score,
    grounded_tiebreak,
    hysteresis_margin,
    intervals_for_duration,
    percentile_floor,
    pick_low_cluster_region,
    refine_to_subregion,
    score_interval_window_rms,
)


def make_intervals(momentary, rms=None, centroid=1000.0, entropy=0.3,
                   kurtosis=6.0, flux=0.002, rolloff=5000.0, hop=0.25):
    """Construct an Intervals table from a momentary-LUFS series."""
    m = np.asarray(momentary, dtype=np.float64)
    n = m.size
    rms_arr = np.asarray(rms, dtype=np.float64) if rms is not None else m - 2.0

    def arr(v):
        return np.full(n, v, dtype=np.float64)

    spectral = {
        "mean": arr(1e-5), "variance": arr(1e-9), "centroid": arr(centroid),
        "spread": arr(800.0), "skewness": arr(0.5), "kurtosis": arr(kurtosis),
        "entropy": arr(entropy), "flatness": arr(0.3), "crest": arr(20.0),
        "flux": arr(flux), "slope": arr(0.0), "decrease": arr(0.0),
        "rolloff": arr(rolloff),
    }
    return Intervals(
        timestamp=np.arange(n) * hop,
        rms_level=rms_arr,
        peak_level=rms_arr + 10.0,
        momentary_lufs=m,
        short_term_lufs=m,
        true_peak=rms_arr + 10.0,
        sample_peak=rms_arr + 10.0,
        spectral=spectral,
        spectral_found=np.ones(n, dtype=bool),
        hop=hop,
    )


class TestClamps:
    def test_intervals_for_duration_rounding(self):
        # (d + hop/2) / hop, truncated (ref: intervalsForDuration)
        assert intervals_for_duration(10.0, 0.25) == 40
        assert intervals_for_duration(0.124, 0.25) == 0
        assert intervals_for_duration(0.126, 0.25) == 1
        assert intervals_for_duration(5.0, 0.0) == 0

    def test_clamp_split_bounds(self):
        # lower = seed + 2; upper = p75; lower wins on inversion
        assert clamp_split(-50.0, -60.0, -30.0) == -50.0
        assert clamp_split(-70.0, -60.0, -30.0) == -58.0   # below lower
        assert clamp_split(-10.0, -60.0, -30.0) == -30.0   # above p75
        assert clamp_split(-40.0, -25.0, -30.0) == -23.0   # inverted: lower wins

    def test_percentile_floor_anchor(self):
        levels = np.sort(np.linspace(-80.0, -40.0, 100))
        # p10 = -76ish; seed anchor raises it when seed+2 is higher
        assert percentile_floor(levels, -90.0) == pytest.approx(-76.36, abs=0.1)
        assert percentile_floor(levels, -70.0) == pytest.approx(-68.0)


class TestHysteresis:
    def test_margin_quarter_of_upper_mode_distance(self):
        lo = np.full(50, -60.0)
        hi = np.full(50, -20.0)
        levels = np.concatenate([lo, hi])
        split = -40.0
        # upper mode centre ~ -19.5 (bin centres); margin = 0.25 * distance
        m = hysteresis_margin(levels, split)
        assert 4.0 < m < 6.0

    def test_fallback_when_no_foreground(self):
        levels = np.full(100, -60.0)
        assert hysteresis_margin(levels, -20.0) == 1.0


class TestRunBuilder:
    def test_min_duration_enforced(self):
        # 8 s of speech (32 intervals) < 10 s minimum -> no region
        m = np.concatenate([np.full(32, -20.0), np.full(60, -60.0)])
        iv = make_intervals(m)
        runs = build_speech_runs(iv, split=-40.0, margin=2.0, tol=8)
        assert runs == []

    def test_long_run_elected(self):
        m = np.concatenate([np.full(60, -20.0), np.full(40, -60.0)])
        iv = make_intervals(m)
        runs = build_speech_runs(iv, split=-40.0, margin=2.0, tol=8)
        assert len(runs) == 1
        assert runs[0].start == 0.0
        assert runs[0].end == pytest.approx(15.0)  # 60 intervals * 0.25

    def test_gap_bridging(self):
        # two 8 s speech spans bridged by a 1.5 s quiet gap -> one run
        m = np.concatenate([
            np.full(32, -20.0), np.full(6, -70.0), np.full(32, -20.0),
            np.full(30, -70.0),
        ])
        iv = make_intervals(m)
        runs = build_speech_runs(iv, split=-40.0, margin=2.0, tol=8)
        assert len(runs) == 1

    def test_gap_exceeding_tolerance_splits(self):
        m = np.concatenate([
            np.full(44, -20.0), np.full(12, -70.0), np.full(44, -20.0),
        ])
        iv = make_intervals(m)
        runs = build_speech_runs(iv, split=-40.0, margin=2.0, tol=8)
        assert len(runs) == 2

    def test_loud_gap_guard_ends_run(self):
        # a loud veto-failing span (entropy too high) inside speech ends the
        # run at the last true speech interval
        m = np.concatenate([np.full(44, -20.0), np.full(10, -20.0), np.full(44, -20.0)])
        iv = make_intervals(m)
        # make the middle span fail the veto via entropy
        iv.spectral["entropy"] = np.concatenate([
            np.full(44, 0.3), np.full(10, 0.9), np.full(44, 0.3)
        ])
        runs = build_speech_runs(iv, split=-40.0, margin=2.0, tol=20)
        assert len(runs) == 2  # guard splits even though tol is generous

    def test_neutral_zone_held(self):
        # intervals between low and split are held (not gaps): speech at -20,
        # neutral dip at -41 with split -40 margin 2 (low = -42)
        m = np.concatenate([np.full(30, -20.0), np.full(20, -41.0), np.full(30, -20.0)])
        iv = make_intervals(m)
        runs = build_speech_runs(iv, split=-40.0, margin=2.0, tol=2)
        assert len(runs) == 1  # dip never counted as gap


class TestRefinement:
    def test_room_tone_refined_to_quietest_window(self):
        # long quiet run with a quieter inner window
        rms = np.concatenate([
            np.full(40, -60.0), np.full(40, -75.0), np.full(40, -60.0),
        ])
        iv = make_intervals(rms + 3.0, rms=rms)
        region = Region(0.0, 30.0)
        refined, ok = refine_to_subregion(
            region, iv, 10.0, 8.0, score_interval_window_rms, lambda a, b: a < b
        )
        assert ok
        assert 9.0 <= refined.start <= 11.0  # lands inside the quiet middle
        assert refined.duration == pytest.approx(10.0)

    def test_short_region_not_refined(self):
        iv = make_intervals(np.full(20, -60.0))
        region = Region(0.0, 5.0)
        refined, ok = refine_to_subregion(
            region, iv, 10.0, 8.0, score_interval_window_rms, lambda a, b: a < b
        )
        assert not ok
        assert refined.start == region.start


class TestLowCluster:
    def test_longest_below_split_run(self):
        m = np.concatenate([
            np.full(40, -20.0), np.full(20, -60.0),
            np.full(20, -20.0), np.full(50, -60.0),
        ])
        iv = make_intervals(m)
        region = pick_low_cluster_region(iv, split=-40.0)
        assert region is not None
        # the longest quiet run is the trailing 50 intervals; golden refined
        # inside it
        assert region.start >= 20.0

    def test_no_below_split(self):
        iv = make_intervals(np.full(50, -20.0))
        assert pick_low_cluster_region(iv, split=-40.0) is None


class TestGroundedScoring:
    def test_snr_monotonic_and_bounds(self):
        assert grounded_snr_score(-5.0) == 0.0
        assert grounded_snr_score(10.0) == pytest.approx(0.25)
        assert grounded_snr_score(20.0) == pytest.approx(0.5)
        assert grounded_snr_score(30.0) == pytest.approx(0.75)
        assert grounded_snr_score(40.0) == 1.0
        assert grounded_snr_score(60.0) == 1.0

    def test_duration_saturates(self):
        assert grounded_duration_score(30.0) == 1.0
        assert grounded_duration_score(300.0) == 1.0   # longer is NOT better
        assert grounded_duration_score(15.0) == pytest.approx(0.5)

    def test_tiebreak_ceiling(self):
        assert grounded_tiebreak(0.0) == pytest.approx(0.02)
        assert grounded_tiebreak(25.0) == 0.0
        assert grounded_tiebreak(100.0) == 0.0

    def test_election_prefers_higher_snr(self):
        # two runs; the second is quieter (lower SNR) -> first elected
        m = np.concatenate([
            np.full(48, -20.0), np.full(20, -70.0), np.full(48, -35.0),
            np.full(20, -70.0),
        ])
        iv = make_intervals(m, rms=m - 2.0)
        runs = [Region(0.0, 12.0), Region(17.0, 29.0)]
        best, candidates = find_best_speech_region(runs, iv, -70.0)
        assert best is not None
        assert best.start == 0.0
        assert len(candidates) == 2
        assert candidates[0].score > candidates[1].score

    def test_long_candidate_golden_refined(self):
        m = np.full(280, -20.0)  # 70 s run
        iv = make_intervals(m)
        runs = [Region(0.0, 70.0)]
        best, candidates = find_best_speech_region(runs, iv, -70.0)
        assert best is not None
        assert best.duration == pytest.approx(GOLDEN_SPEECH_WINDOW_DURATION)
        assert candidates[0].was_refined


class TestSplitInputSelection:
    """The level set feeding the histogram/Otsu split: floored intervals
    are skipped and the axis switch reads the other field
    (ref: TestBuildLevelHistogram, analyser_vad_test.go:46-104)."""

    @staticmethod
    def _bimodal(extra=()):
        # low cluster around -50, empty valley, high cluster around -20
        low = [-50.0 + (i % 3) for i in range(30)]
        high = [-20.0 + (i % 3) for i in range(30)]
        return np.asarray(low + high + list(extra), dtype=np.float64)

    def test_floored_interval_does_not_shift_split(self):
        from jivetalking_tpu.analysis.vad import detect_voice_activity

        clean = make_intervals(self._bimodal())
        with_floored = make_intervals(self._bimodal(extra=[-130.0]))
        seed = -80.0
        a = detect_voice_activity(clean, seed)
        b = detect_voice_activity(with_floored, seed)
        # the -130 interval is below the -115 measurement floor: it must be
        # excluded from the split input, the percentile floor and the p75
        # clamp bound, so every split-derived number is unchanged
        assert b.split == pytest.approx(a.split)
        assert b.floor == pytest.approx(a.floor)
        assert b.margin == pytest.approx(a.margin)
        # and the split still falls in the empty valley between the modes
        assert -48.0 <= a.split <= -23.0

    def test_axis_rms_reads_rms_field(self):
        from jivetalking_tpu.analysis.vad import detect_voice_activity

        # momentary pinned loud (-10) while RMS carries the bimodal shape:
        # on the rms axis every level statistic must come from the RMS field
        rms = self._bimodal()
        iv = make_intervals(np.full(rms.size, -10.0), rms=rms)
        r = detect_voice_activity(iv, -80.0, axis="rms")
        assert -48.0 <= r.split <= -23.0   # in the RMS valley, not near -10
        assert r.floor <= -40.0            # p10 of the RMS set


class TestExtractNoiseProfileSpectralFields:
    """The room-tone profile carries the arithmetic mean of each spectral
    field over its intervals, and the astats Entropy field carries the
    spectral-entropy mean (ref: TestExtractNoiseProfileSpectralFields,
    analyser_vad_test.go:886-948)."""

    def test_per_field_means(self):
        from jivetalking_tpu.analysis.vad import extract_noise_profile

        hop = 0.25
        vals = {  # (interval 0, interval 1) -> clean per-field means
            "mean": (1.0, 3.0), "variance": (2.0, 4.0),
            "centroid": (1400.0, 1600.0), "spread": (300.0, 500.0),
            "skewness": (0.5, 1.5), "kurtosis": (2.0, 4.0),
            "entropy": (0.4, 0.6), "flatness": (0.3, 0.5),
            "crest": (6.0, 10.0), "flux": (0.02, 0.06),
            "slope": (-0.4, -0.2), "decrease": (0.10, 0.14),
            "rolloff": (6000.0, 8000.0),
        }
        spectral = {k: np.asarray(v, dtype=np.float64) for k, v in vals.items()}
        iv = Intervals(
            timestamp=np.asarray([0.0, hop]),
            rms_level=np.asarray([-60.0, -58.0]),
            peak_level=np.asarray([-50.0, -48.0]),
            momentary_lufs=np.asarray([-55.0, -53.0]),
            short_term_lufs=np.asarray([-55.0, -53.0]),
            true_peak=np.asarray([-50.0, -48.0]),
            sample_peak=np.asarray([-50.0, -48.0]),
            spectral=spectral,
            spectral_found=np.ones(2, dtype=bool),
            hop=hop,
        )
        region = Region(0.0, 2 * hop)

        p = extract_noise_profile(region, iv)
        assert p is not None
        # astats Entropy carries the spectral-entropy mean
        assert p.entropy == pytest.approx(0.5, abs=1e-3)
        want = {
            "mean": 2.0, "variance": 3.0, "centroid": 1500.0, "spread": 400.0,
            "skewness": 1.0, "kurtosis": 3.0, "entropy": 0.5, "flatness": 0.4,
            "crest": 8.0, "flux": 0.04, "slope": -0.3, "decrease": 0.12,
            "rolloff": 7000.0,
        }
        for k, w in want.items():
            assert getattr(p.spectral, k) == pytest.approx(w, abs=1e-3), k
        # amplitude carries: RMS mean, peak max, crest = peak - rms
        assert p.peak_level == pytest.approx(-48.0)
        assert p.crest_factor == pytest.approx(11.0)
        # a 0.5 s room tone is well under the 8 s ideal: warning attached
        assert p.extraction_warning is not None
        assert "short room tone region" in p.extraction_warning

    def test_mixed_found_unfound_uses_found_only_mean(self):
        """DELIBERATE DIVERGENCE, pinned: on mixed found/unfound regions the
        profile's spectral fields are the mean over FOUND intervals only.

        The reference's extractNoiseProfileFromIntervals sums every
        interval's Spectral (Found=false rows contribute zero-valued
        fields) and divides by the full count
        (accumulateIntervalMetrics, analyser_candidates_shared.go:132-158)
        — a zero-diluted mean that drags centroid/rolloff toward 0 Hz when
        any interval lacked spectral frames.  This rebuild extends the
        reference's own FRAME-level convention (SpectralAccumulator skips
        Found=false frames, analyser_metrics.go:249-258) to the region
        level instead: unfound intervals never dilute the mean.  On the
        all-found regions the two conventions agree exactly (the case the
        ported vector table above pins)."""
        from jivetalking_tpu.analysis.vad import extract_noise_profile

        hop = 0.25
        names = [
            "mean", "variance", "centroid", "spread", "skewness", "kurtosis",
            "entropy", "flatness", "crest", "flux", "slope", "decrease",
            "rolloff",
        ]
        # interval 0 found (centroid 1400 etc.), interval 1 UNFOUND with
        # zero-valued fields (what the frame extractor emits), interval 2
        # found (centroid 1600 etc.)
        spectral = {
            "mean": [1.0, 0.0, 3.0], "variance": [2.0, 0.0, 4.0],
            "centroid": [1400.0, 0.0, 1600.0], "spread": [300.0, 0.0, 500.0],
            "skewness": [0.5, 0.0, 1.5], "kurtosis": [2.0, 0.0, 4.0],
            "entropy": [0.4, 0.0, 0.6], "flatness": [0.3, 0.0, 0.5],
            "crest": [6.0, 0.0, 10.0], "flux": [0.02, 0.0, 0.06],
            "slope": [-0.4, 0.0, -0.2], "decrease": [0.10, 0.0, 0.14],
            "rolloff": [6000.0, 0.0, 8000.0],
        }
        spectral = {k: np.asarray(v, dtype=np.float64) for k, v in spectral.items()}
        iv = Intervals(
            timestamp=np.asarray([0.0, hop, 2 * hop]),
            rms_level=np.asarray([-60.0, -59.0, -58.0]),
            peak_level=np.asarray([-50.0, -49.0, -48.0]),
            momentary_lufs=np.asarray([-55.0, -54.0, -53.0]),
            short_term_lufs=np.asarray([-55.0, -54.0, -53.0]),
            true_peak=np.asarray([-50.0, -49.0, -48.0]),
            sample_peak=np.asarray([-50.0, -49.0, -48.0]),
            spectral=spectral,
            spectral_found=np.asarray([True, False, True]),
            hop=hop,
        )
        p = extract_noise_profile(Region(0.0, 3 * hop), iv)
        assert p is not None
        # found-only means: the same clean midpoints as the all-found table
        want = {
            "mean": 2.0, "variance": 3.0, "centroid": 1500.0, "spread": 400.0,
            "skewness": 1.0, "kurtosis": 3.0, "entropy": 0.5, "flatness": 0.4,
            "crest": 8.0, "flux": 0.04, "slope": -0.3, "decrease": 0.12,
            "rolloff": 7000.0,
        }
        for k in names:
            assert getattr(p.spectral, k) == pytest.approx(want[k], abs=1e-3), k
        # the reference's zero-diluted mean would read 2/3 of these values
        # (e.g. centroid 1000.0) — pin that we did NOT do that
        assert p.spectral.centroid != pytest.approx(1000.0, abs=1.0)
        # amplitude fields still average over ALL intervals (no found gate
        # exists on the amplitude axis — parity with the reference there)
        assert p.peak_level == pytest.approx(-48.0)
        assert p.crest_factor == pytest.approx(-48.0 - (-59.0))


class TestNoiseFloorSeedEdgeCases:
    """The pre-scan floor seed's truncation/floored-exclusion contracts
    (ref: analyser_vad_test.go TestEstimateNoiseFloorAndThreshold_
    TruncationPicksLowestRMS :397, _ExcludesFlooredFromSeed :433,
    _AllFlooredReturnsNotOK :463; TestFlooredFraction_BoundaryAtThreshold
    :478)."""

    def _seed_intervals(self, levels, fluxes):
        iv = make_intervals(levels)
        iv.spectral["flux"] = np.asarray(fluxes, dtype=np.float64)
        return iv

    def test_truncation_picks_lowest_rms_of_tied_run(self):
        from jivetalking_tpu.analysis.vad import (
            FLOOR_SEED_MIN_COUNT,
            FLOOR_SEED_TOP_DIVISOR,
            estimate_noise_floor_seed,
        )

        # 25 tied room-tone-like intervals in DESCENDING level order
        # (loudest first: an unstable score-only sort would keep these
        # leading loud members and raise the floor), plus 25 louder ones.
        levels = [-56.0 - i for i in range(25)] + [-30.0 + i for i in range(25)]
        fluxes = [0.01] * 25 + [0.50] * 25
        iv = self._seed_intervals(levels, fluxes)
        seed, thresh, ok = estimate_noise_floor_seed(iv)
        assert ok
        count = max(50 // FLOOR_SEED_TOP_DIVISOR, FLOOR_SEED_MIN_COUNT)  # 10
        want = -80.0 + (count - 1)   # the highest RMS among the kept lowest
        assert seed == pytest.approx(want, abs=1e-3)

    def test_floored_intervals_never_seed_the_floor(self):
        from jivetalking_tpu.analysis.vad import (
            VAD_LEVEL_FLOOR_DB,
            estimate_noise_floor_seed,
        )

        # 3 digital-silence gaps (sort first by lowest level, score 1.0)
        # must be EXCLUDED from the seed max; the 40 real room-tone
        # intervals are the only valid source.
        levels = [-130.0] * 3 + [-70.0 + i for i in range(40)] \
            + [-10.0 + i for i in range(10)]
        fluxes = [0.01] * 43 + [0.50] * 10
        iv = self._seed_intervals(levels, fluxes)
        seed, _, ok = estimate_noise_floor_seed(iv)
        assert ok
        assert seed > VAD_LEVEL_FLOOR_DB
        # top-10 by (score desc, level asc) = 3 floored + the 7 quietest
        # real intervals (-70..-64); the seed is their max
        assert seed == pytest.approx(-64.0, abs=1e-6)

    def test_all_floored_returns_not_ok(self):
        from jivetalking_tpu.analysis.vad import (
            SILENCE_THRESHOLD_MIN_INTERVALS,
            estimate_noise_floor_seed,
        )

        n = SILENCE_THRESHOLD_MIN_INTERVALS + 5
        iv = self._seed_intervals([-130.0] * n, [0.01] * n)
        _, _, ok = estimate_noise_floor_seed(iv)
        assert not ok   # never fabricate a floor from digital silence

    @pytest.mark.parametrize("floored,total,want,activated", [
        (20, 100, 0.20, True),    # exactly at the boundary: >= fires
        (19, 100, 0.19, False),   # just under: does not
    ])
    def test_floored_fraction_boundary(self, floored, total, want, activated):
        from jivetalking_tpu.analysis.vad import (
            VOICE_ACTIVATED_FRACTION,
            floored_fraction,
        )

        levels = [-130.0] * floored + [-15.0] * (total - floored)
        iv = make_intervals(levels)
        got = floored_fraction(iv, "momentary")
        assert got == pytest.approx(want, abs=1e-3)
        assert (got >= VOICE_ACTIVATED_FRACTION) is activated


class TestDetectVoiceActivityEndToEnd:
    """One bimodal split feeding every VAD output at once
    (ref: TestDetectVoiceActivity, analyser_vad_test.go:1160-1224, and
    _NoProfileLeavesVoicedPercentileZero :1224-1244)."""

    def _bimodal(self):
        # 60 room-tone intervals near -55, then 80 speech-rich near -16
        levels = [-55.0] * 60 + [-16.0] * 80
        return make_intervals(levels)

    def test_bimodal_stream_populates_every_output(self):
        from jivetalking_tpu.analysis.vad import (
            clamp_split,
            derive_gate_statistics,
            detect_voice_activity,
            interval_levels,
            is_floored,
            otsu_split_from_levels,
            percentile_of_sorted,
        )

        iv = self._bimodal()
        r = detect_voice_activity(iv, noise_floor_seed=-70.0)

        assert r.speech_profile is not None
        assert r.noise_profile is not None
        # the elected room-tone sample is set from the picked region (the
        # run record depends on it)
        assert r.elected_room_tone_sample is not None
        # a sane low floor: below speech, above digital silence
        assert -120.0 < r.floor < -16.0

        g = r.gate_stats
        assert g.voiced_low_percentile != 0
        assert g.noise_high_percentile != 0
        assert g.separation_db > 0

        # the written fields match the direct helper on the same inputs
        level = interval_levels(iv, "momentary")
        levels = np.sort(level[~is_floored(level)])
        split = clamp_split(otsu_split_from_levels(levels), -70.0,
                            percentile_of_sorted(levels, 75))
        want = derive_gate_statistics(iv, split,
                                      r.speech_profile.region, "momentary")
        assert g.voiced_low_percentile == want.voiced_low_percentile
        assert g.noise_high_percentile == want.noise_high_percentile
        assert g.separation_db == want.separation_db

    def test_flat_stream_leaves_voiced_percentile_zero(self):
        from jivetalking_tpu.analysis.vad import detect_voice_activity

        iv = make_intervals([-55.0] * 60)
        r = detect_voice_activity(iv, noise_floor_seed=-70.0)
        assert r.speech_profile is None
        assert r.gate_stats.voiced_low_percentile == 0


class TestScoreIntervalWindowVectors:
    """(ref: TestScoreIntervalWindow, analyser_test.go:335-385): plain
    average of the window's astats-RMS; empty window scores zero."""

    @pytest.mark.parametrize("name,rms_vals,want", [
        ("uniform values", [-70.0, -70.0, -70.0, -70.0], -70.0),
        ("mixed values", [-60.0, -70.0, -80.0, -70.0], -70.0),
        ("single value", [-65.5], -65.5),
        ("empty returns zero", [], 0.0),
    ])
    def test_table(self, name, rms_vals, want):
        if rms_vals:
            iv = make_intervals([v + 2.0 for v in rms_vals], rms=rms_vals)
            idx = np.arange(len(rms_vals))
        else:
            iv = make_intervals([-50.0])
            idx = np.array([], dtype=np.int64)
        got = score_interval_window_rms(iv, idx)
        assert got == pytest.approx(want, abs=1e-3), name


class TestElectSpeechProfileHighestScore:
    """(ref: TestElectSpeechProfile, analyser_vad_test.go:785-833):
    highest-score election, not longest-wins — a shorter run with a wide
    SNR margin must beat a longer, quieter run once both clear the
    duration-adequacy minimum (duration saturates, SNR decides)."""

    def _two_run_intervals(self):
        from jivetalking_tpu.analysis.vad import (
            GAP_TOLERANCE_FLOOR,
            build_speech_runs,
            intervals_for_duration,
        )

        # Run A: 140 intervals (35 s) loud at -16 -> wide SNR over -60.
        # Gap: 20 intervals at -75 splits the runs.
        # Run B: 200 intervals (50 s, LONGER) but quiet at -34.
        momentary = [-16.0] * 140 + [-75.0] * 20 + [-34.0] * 200
        iv = make_intervals(momentary)
        tol = intervals_for_duration(GAP_TOLERANCE_FLOOR, iv.hop)
        runs = build_speech_runs(iv, -45.0, 3.0, tol)
        return iv, runs

    def test_wide_snr_run_beats_longer_quiet_run(self):
        from jivetalking_tpu.analysis.vad import elect_speech_profile

        iv, runs = self._two_run_intervals()
        assert len(runs) == 2, runs
        profile, candidates = elect_speech_profile(runs, iv, -60.0)
        assert profile is not None
        assert candidates
        # run A starts at t=0; the longer run B starts at 160*hop
        assert profile.region.start < 160 * iv.hop
        assert profile.region.start == pytest.approx(0.0, abs=iv.hop * 140)
        # specifically: inside run A, not run B
        assert profile.region.end <= 140 * iv.hop + 1e-9

    def test_contract_fields_populated(self):
        from jivetalking_tpu.analysis.vad import elect_speech_profile

        iv, runs = self._two_run_intervals()
        profile, _ = elect_speech_profile(runs, iv, -60.0)
        assert profile.sample.rms_level != 0.0
        assert profile.sample.crest_factor != 0.0


class TestDetectVoiceActivityNoProfile:
    """(ref: TestDetectVoiceActivity_NoProfileLeavesVoicedPercentileZero,
    analyser_vad_test.go:1224-1243): a flat low-level stream elects no
    speech profile, so the voiced percentile stays zero while the noise
    percentile populates."""

    def test_flat_stream_leaves_voiced_percentile_zero(self):
        from jivetalking_tpu.analysis.vad import detect_voice_activity

        # slight spread so the Otsu split sits above part of the level
        # set (the noise percentile has members); room-tone-like spectra
        # (centroid below the 200 Hz speech band, high entropy) keep the
        # spectral veto from ever flagging speech
        momentary = [-55.0, -57.0, -56.0] * 20
        iv = make_intervals(momentary, centroid=50.0, entropy=0.95)
        res = detect_voice_activity(iv, noise_floor_seed=-70.0)
        assert res.speech_profile is None
        assert res.gate_stats.voiced_low_percentile == 0.0
        assert res.gate_stats.noise_high_percentile != 0.0


class TestNoiseSeedOrderIndependence:
    """(ref: TestEstimateNoiseFloorAndThreshold_TiedScoreOrderIndependent,
    analyser_vad_test.go:359-395): 25 quiet low-flux intervals all tie at
    room-tone score 1.0 across distinct levels; the deterministic tie-break
    (level asc, then index) must make the seeded floor identical for any
    input order."""

    def _tied_set(self):
        quiet = np.arange(-80.0, -55.0)          # 25 tied score-1.0 levels
        loud = np.arange(-30.0, -5.0)            # 25 louder, high-flux
        iv = make_intervals(np.concatenate([quiet, loud]))
        iv.spectral["flux"] = np.concatenate(
            [np.full(25, 0.01), np.full(25, 0.50)])
        return iv

    def test_shuffle_invariant(self):
        from jivetalking_tpu.analysis.vad import estimate_noise_floor_seed

        iv = self._tied_set()
        floor_a, thresh_a, ok_a = estimate_noise_floor_seed(iv)
        assert ok_a

        rng = np.random.default_rng(5)
        perm = rng.permutation(len(iv))
        shuffled = make_intervals(iv.momentary_lufs[perm])
        shuffled.spectral["flux"] = iv.spectral["flux"][perm]
        floor_b, thresh_b, ok_b = estimate_noise_floor_seed(shuffled)
        assert ok_b
        assert floor_a == floor_b
        assert thresh_a == thresh_b


class TestGapToleranceIntervals:
    """(ref: TestGapToleranceIntervals, analyser_vad_test.go:692-731)."""

    HOP = 0.25

    def test_p75_of_interior_gaps_clamped(self):
        from jivetalking_tpu.analysis.vad import (
            GAP_TOLERANCE_CEILING,
            GAP_TOLERANCE_FLOOR,
            gap_tolerance_intervals,
            intervals_for_duration,
            percentile_of_sorted,
        )

        floor = intervals_for_duration(GAP_TOLERANCE_FLOOR, self.HOP)
        ceiling = intervals_for_duration(GAP_TOLERANCE_CEILING, self.HOP)

        flags = []
        for n, v in [(5, True), (4, False), (5, True), (6, False),
                     (5, True), (12, False), (5, True), (30, False),
                     (5, True), (20, False)]:   # trailing tail excluded
            flags.extend([v] * n)
        got = gap_tolerance_intervals(np.asarray(flags), self.HOP)
        # mirror the function's own nearest-rank p75 over the interior
        # gaps {4, 6, 12, 30}, then clamp
        gaps = np.sort(np.array([4.0, 6.0, 12.0, 30.0]))
        want = max(floor, min(ceiling, int(round(
            percentile_of_sorted(gaps, 75)))))
        assert got == want

    def test_no_interior_gap_returns_floor(self):
        from jivetalking_tpu.analysis.vad import (
            GAP_TOLERANCE_FLOOR,
            gap_tolerance_intervals,
            intervals_for_duration,
        )

        floor = intervals_for_duration(GAP_TOLERANCE_FLOOR, self.HOP)
        flags = np.asarray([True, True, True, False, False])
        assert gap_tolerance_intervals(flags, self.HOP) == floor


class TestPickLowClusterRegion:
    """(ref: TestPickLowClusterRegion, analyser_vad_test.go:834-878): with a
    short quiet run, a speech block and a LONG quiet run, the long run is
    picked and the noise profile extracted from it carries the region's
    spectral fields."""

    def test_picks_long_run_and_extracts_profile(self):
        from jivetalking_tpu.analysis.vad import (
            extract_noise_profile,
            pick_low_cluster_region,
        )

        hop = 0.25
        momentary = np.concatenate([
            np.full(10, -60.0),    # short quiet run
            np.full(20, -15.0),    # speech
            np.full(50, -60.0),    # long quiet run — the one to pick
        ])
        iv = make_intervals(momentary, hop=hop)
        long_start = 30 * hop

        region = pick_low_cluster_region(iv, -30.0)
        assert region is not None
        assert region.start >= long_start - 1e-9, (
            "picked the short run, want the long one")

        profile = extract_noise_profile(region, iv)
        assert profile is not None
        # spectral fields come from the picked region's intervals
        assert profile.spectral.centroid == pytest.approx(1000.0)
        assert profile.spectral.centroid != 0
