"""Reference-vector mirrors for the speech-gate tuning tables
(ref: adaptive_test.go TestCalculateSpeechGateThreshold :962-1038 and
TestTuneSpeechGate's threshold/ratio tables :524-700)."""

import math

import pytest

from jivetalking_tpu.adaptive.adapt import (
    AdaptiveDiagnostics,
    GATE_NOISE_MARGIN_DB,
    GATE_SPEECH_MARGIN_DB,
    calculate_speech_gate_threshold,
    tune_speech_gate,
)
from jivetalking_tpu.adaptive.config import default_filter_config
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)

NARROW_GAP_BOUNDARY = GATE_SPEECH_MARGIN_DB + GATE_NOISE_MARGIN_DB  # 12 dB


def _db(lin):
    return 20.0 * math.log10(lin)


class TestCalculateSpeechGateThresholdVectors:
    """ref: adaptive_test.go:962-1038."""

    @pytest.mark.parametrize("name,voiced_p10,separation,want_db", [
        ("wide gap", -34.0, 26.0, -34.0 - GATE_SPEECH_MARGIN_DB),
        ("moderate gap", -40.0, 18.0, -40.0 - GATE_SPEECH_MARGIN_DB),
        ("narrow gap stays on speech side", -42.0, 8.0,
         -42.0 - GATE_SPEECH_MARGIN_DB),
    ])
    def test_threshold_is_p10_minus_margin(self, name, voiced_p10,
                                           separation, want_db):
        threshold, _ = calculate_speech_gate_threshold(voiced_p10, separation)
        assert _db(threshold) == pytest.approx(want_db, abs=0.01), name

    @pytest.mark.parametrize("name,separation,want_narrow", [
        ("very narrow", 8.0, True),
        ("just below boundary", NARROW_GAP_BOUNDARY - 0.1, True),
        ("at boundary is wide", NARROW_GAP_BOUNDARY, False),
        ("wide", 26.0, False),
    ])
    def test_narrow_gap_flips_at_margin_sum(self, name, separation,
                                            want_narrow):
        _, narrow = calculate_speech_gate_threshold(-34.0, separation)
        assert narrow is want_narrow, name

    def test_crossed_gap_does_not_rise_to_clear_noise(self):
        # noise p95 (-46) + noise margin sits ABOVE the speech-side
        # placement (-48); the threshold must stay on the speech side
        voiced_p10 = -42.0
        noise_p95 = -46.0
        separation = voiced_p10 - noise_p95          # 4 dB
        threshold, narrow = calculate_speech_gate_threshold(
            voiced_p10, separation)
        assert narrow
        got_db = _db(threshold)
        assert got_db == pytest.approx(
            voiced_p10 - GATE_SPEECH_MARGIN_DB, abs=0.01)
        assert got_db < noise_p95 + GATE_NOISE_MARGIN_DB


def _m_no_profile(noise_floor, room_tone_peak, room_tone_crest, input_lra):
    m = AudioMeasurements()
    m.noise.floor = noise_floor
    m.loudness.input_lra = input_lra
    m.loudness.input_i = -20.0
    m.vad.noise_profile = NoiseProfile(
        peak_level=room_tone_peak, crest_factor=room_tone_crest, entropy=0.5)
    m.vad.speech_profile = None
    return m


class TestTuneSpeechGateNoProfileVectors:
    """The 5-case no-profile threshold table
    (ref: adaptive_test.go:542-636)."""

    CASES = [
        # name, floor, rt_peak, rt_crest, lra, want_db, tol
        ("clean studio - target threshold", -75.0, -70.0, 10.0, 8.0, -40.0, 1.0),
        ("typical podcast - derived gap", -55.0, -50.0, 10.0, 12.0, -31.0, 1.0),
        ("noisy room - clamped to max", -42.0, -38.0, 10.0, 8.0, -25.0, 1.0),
        ("bleed high crest - peak + 3 dB", -55.0, -48.0, 25.0, 12.0, -45.0, 1.0),
        ("extreme noise - clamped to max", -20.0, -15.0, 25.0, 8.0, -25.0, 0.5),
    ]

    @pytest.mark.parametrize("name,floor,peak,crest,lra,want_db,tol", CASES)
    def test_threshold_table(self, name, floor, peak, crest, lra, want_db, tol):
        cfg = default_filter_config()
        m = _m_no_profile(floor, peak, crest, lra)
        tune_speech_gate(cfg, AdaptiveDiagnostics(), m)
        assert _db(cfg.speech_gate.threshold) == pytest.approx(
            want_db, abs=tol), name

    @pytest.mark.parametrize("lra,want_ratio", [
        (8.0, 2.0),       # narrow LRA -> ratio capped at 2.0
        (12.0, 2.0),
        (14.9, 2.0),
        (15.1, 1.5),      # wide LRA (>15 LU) -> gentle 1.5
        (25.0, 1.5),
    ])
    def test_ratio_from_lra(self, lra, want_ratio):
        cfg = default_filter_config()
        m = _m_no_profile(-55.0, -50.0, 10.0, lra)
        tune_speech_gate(cfg, AdaptiveDiagnostics(), m)
        assert cfg.speech_gate.ratio == pytest.approx(want_ratio)

    def test_fixed_params_pinned(self):
        cfg = default_filter_config()
        m = _m_no_profile(-55.0, -50.0, 10.0, 12.0)
        tune_speech_gate(cfg, AdaptiveDiagnostics(), m)
        assert cfg.speech_gate.attack == 5.0
        assert cfg.speech_gate.release == 200.0
        assert cfg.speech_gate.knee == 3.0
        assert cfg.speech_gate.detection == "rms"


class TestTuneSpeechGateProfileDepth:
    """Depth basis: 14 dB full / 8 dB narrow-gap
    (ref: TestTuneSpeechGateNewBasis, adaptive_test.go:1039-1163)."""

    def _m_profile(self, voiced_p10, separation):
        m = AudioMeasurements()
        m.loudness.input_lra = 10.0
        m.loudness.input_i = -20.0
        m.vad.speech_profile = SpeechCandidate(
            region=Region(0.0, 60.0), sample=RegionSample(rms_level=-24.0))
        m.vad.gate_stats.voiced_low_percentile = voiced_p10
        m.vad.gate_stats.separation_db = separation
        return m

    def test_wide_gap_full_depth(self):
        cfg = default_filter_config()
        d = AdaptiveDiagnostics()
        tune_speech_gate(cfg, d, self._m_profile(-34.0, 26.0))
        assert d.speech_gate_depth_db == 14.0
        assert cfg.speech_gate.range == pytest.approx(10 ** (-14.0 / 20.0))
        assert _db(cfg.speech_gate.threshold) == pytest.approx(-40.0, abs=0.01)
        assert d.speech_gate_clamp_reason == "none"

    def test_narrow_gap_reduced_depth(self):
        cfg = default_filter_config()
        d = AdaptiveDiagnostics()
        tune_speech_gate(cfg, d, self._m_profile(-42.0, 8.0))
        assert d.speech_gate_depth_db == 8.0
        assert cfg.speech_gate.range == pytest.approx(10 ** (-8.0 / 20.0))
        assert _db(cfg.speech_gate.threshold) == pytest.approx(-48.0, abs=0.01)
        assert d.speech_gate_clamp_reason == "narrow_gap"


class TestLevellingCompressorThresholdVectors:
    """ref: adaptive_test.go:1418-1580 (anchor, clamps, peak fallback, the
    full-file-RMS floor matrix with its NaN/Inf/zero fallbacks)."""

    def _m(self, speech_rms=None, full_rms=0.0, peak=0.0):
        m = AudioMeasurements()
        m.dynamics.rms_level = full_rms
        m.dynamics.peak_level = peak
        if speech_rms is not None:
            m.vad.speech_profile = SpeechCandidate(
                region=Region(0, 60), sample=RegionSample(rms_level=speech_rms))
        return m

    def _tune(self, m):
        from jivetalking_tpu.adaptive.adapt import tune_levelling_compressor

        cfg = default_filter_config()
        tune_levelling_compressor(cfg, m)
        return cfg.levelling_compressor.threshold

    def test_speech_rms_anchor(self):
        assert self._tune(self._m(speech_rms=-24.0, full_rms=-32.0,
                                  peak=-6.0)) == pytest.approx(-15.0)

    def test_clamped_high(self):
        assert self._tune(self._m(speech_rms=-10.0, full_rms=-20.0)) == \
            pytest.approx(-6.0)

    def test_clamped_low(self):
        assert self._tune(self._m(speech_rms=-60.0, full_rms=math.nan)) == \
            pytest.approx(-45.0)

    def test_peak_fallback_no_profile(self):
        assert self._tune(self._m(peak=-6.0)) == pytest.approx(-26.0)

    def test_zero_db_peak_accepted(self):
        assert self._tune(self._m(peak=0.0)) == pytest.approx(-20.0)

    def test_invalid_peak_default(self):
        from jivetalking_tpu.adaptive.adapt import COMP_DEFAULT_THRESHOLD

        assert self._tune(self._m(peak=math.nan)) == pytest.approx(
            COMP_DEFAULT_THRESHOLD)

    @pytest.mark.parametrize("name,speech,full,want", [
        ("speech above full-file (floor inert)", -24.0, -40.0, -15.0),
        ("speech below full-file (floor engaged)", -50.0, -40.0, -31.0),
        ("NaN full-file falls back to speech", -24.0, math.nan, -15.0),
        ("Inf full-file falls back to speech", -24.0, math.inf, -15.0),
        ("floor then clamp ceiling", -50.0, -8.0, -6.0),
        ("zero full-file falls back to speech", -24.0, 0.0, -15.0),
        ("neg-Inf full-file falls back to speech", -24.0, -math.inf, -15.0),
    ])
    def test_full_file_rms_floor_matrix(self, name, speech, full, want):
        assert self._tune(self._m(speech_rms=speech, full_rms=full)) == \
            pytest.approx(want, abs=1e-3), name


class TestAdaptConfigOrderIndependence:
    """ref: TestAdaptConfigOrderIndependence, adaptive_test.go:74-146 —
    adapting file A before or after file B must not change A's derived
    parameters (the Base/Effective split: per-file state never leaks
    through the shared seed)."""

    def _warm_no_profile(self):
        m = AudioMeasurements()
        m.loudness.input_i = -42.1
        m.loudness.input_tp = -4.9
        m.loudness.input_lra = 6.0
        m.noise.floor = -58.0
        m.dynamics.peak_level = -10.0
        return m

    def _bright_speech(self):
        m = AudioMeasurements()
        m.loudness.input_i = -20.0
        m.loudness.input_tp = -2.5
        m.loudness.input_lra = 12.0
        m.noise.floor = -60.0
        m.dynamics.peak_level = -6.0
        m.dynamics.rms_level = -30.0
        m.vad.noise_profile = NoiseProfile(
            measured_noise_floor=-60.0, peak_level=-45.0,
            crest_factor=15.0, entropy=0.8)
        m.vad.gate_stats.voiced_low_percentile = -34.0
        m.vad.gate_stats.noise_high_percentile = -55.0
        m.vad.gate_stats.separation_db = 21.0
        m.vad.speech_profile = SpeechCandidate(
            region=Region(0, 60),
            sample=RegionSample(rms_level=-24.0, crest_factor=12.0))
        return m

    def test_order_does_not_change_results(self):
        from jivetalking_tpu.adaptive.adapt import adapt_config

        base = default_filter_config()
        a_first, _ = adapt_config(base, self._warm_no_profile())
        b_after, _ = adapt_config(base, self._bright_speech())

        base2 = default_filter_config()
        b_first, _ = adapt_config(base2, self._bright_speech())
        a_after, _ = adapt_config(base2, self._warm_no_profile())

        for got, want in ((a_first, a_after), (b_first, b_after)):
            assert got.speech_gate.threshold == want.speech_gate.threshold
            assert got.speech_gate.ratio == want.speech_gate.ratio
            assert got.speech_gate.range == want.speech_gate.range
            assert got.levelling_compressor.threshold == \
                want.levelling_compressor.threshold
            assert got.deesser.intensity == want.deesser.intensity
            assert got.noise_reduction.afftdn_noise_floor == \
                want.noise_reduction.afftdn_noise_floor
            assert got.noise_reduction.afftdn_noise_type == \
                want.noise_reduction.afftdn_noise_type
            assert got.rumble_highpass.frequency == want.rumble_highpass.frequency
            assert got.bandlimit_lowpass.frequency == want.bandlimit_lowpass.frequency

    def test_base_seed_untouched_after_both(self):
        import copy

        from jivetalking_tpu.adaptive.adapt import adapt_config

        base = default_filter_config()
        want = copy.deepcopy(base)
        adapt_config(base, self._bright_speech())
        adapt_config(base, self._warm_no_profile())
        assert base == want
