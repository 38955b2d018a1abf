"""Pure-function table tests for the adaptation layer — no audio involved
(mirrors the reference's adaptive_test.go tier)."""

import math

import pytest

from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.adaptive.adapt import (
    build_afftdn_band_noise,
    calculate_speech_gate_ratio,
    calculate_speech_gate_threshold,
    calculate_speech_gate_threshold_no_profile,
    tune_deesser,
    use_custom_afftdn_profile,
)
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    GateStatistics,
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)
from jivetalking_tpu.metering.spectral import SpectralMetrics


def _measurements(**kw) -> AudioMeasurements:
    m = AudioMeasurements()
    m.loudness.input_i = kw.get("input_i", -25.0)
    m.loudness.input_lra = kw.get("input_lra", 10.0)
    m.dynamics.rms_level = kw.get("rms_level", -28.0)
    m.dynamics.peak_level = kw.get("peak_level", -6.0)
    m.noise.floor = kw.get("noise_floor", -60.0)
    m.noise.voice_activated = kw.get("voice_activated", False)
    if kw.get("with_speech", True):
        sample = RegionSample(rms_level=kw.get("speech_rms", -24.0))
        sp = SpeechCandidate(region=Region(0.0, 60.0), sample=sample)
        sp.body_band_rms = kw.get("body_rms", -30.0)
        sp.sib_band_rms = kw.get("sib_rms", -40.0)
        sp.bands_measured = kw.get("bands_measured", True)
        m.vad.speech_profile = sp
    if kw.get("with_noise_profile", True):
        npf = NoiseProfile(
            start=100.0, duration=10.0,
            measured_noise_floor=kw.get("noise_floor", -60.0),
            peak_level=kw.get("room_peak", -55.0),
            crest_factor=kw.get("room_crest", 10.0),
            spectral=SpectralMetrics(flatness=kw.get("room_flatness", 0.6), found=True),
            band_noise=kw.get("band_noise", [-60.0] * 15),
            bands_measured=kw.get("noise_bands_measured", True),
        )
        m.vad.noise_profile = npf
    m.vad.gate_stats = GateStatistics(
        voiced_low_percentile=kw.get("voiced_p10", -30.0),
        noise_high_percentile=kw.get("noise_p95", -55.0),
        separation_db=kw.get("separation", 25.0),
    )
    return m


class TestAfftdn:
    def test_disabled_when_voice_activated(self):
        m = _measurements(voice_activated=True)
        cfg, diag = adapt_config(default_filter_config(), m)
        assert not cfg.noise_reduction.afftdn_enabled
        assert diag.afftdn_disable_reason == "voice_activated"

    def test_nf_tracks_measured_floor_clamped(self):
        # floor inside [-80, -20] passes through
        cfg, _ = adapt_config(default_filter_config(), _measurements(noise_floor=-60.0))
        assert cfg.noise_reduction.afftdn_noise_floor == -60.0
        assert cfg.noise_reduction.afftdn_track_noise is False
        # clamped at -80
        cfg, _ = adapt_config(default_filter_config(), _measurements(noise_floor=-95.0))
        assert cfg.noise_reduction.afftdn_noise_floor == -80.0
        # clamped at -20
        cfg, _ = adapt_config(default_filter_config(), _measurements(noise_floor=-10.0))
        assert cfg.noise_reduction.afftdn_noise_floor == -20.0

    def test_zero_floor_leaves_defaults(self):
        cfg, _ = adapt_config(default_filter_config(), _measurements(noise_floor=0.0))
        assert cfg.noise_reduction.afftdn_noise_floor == 0.0
        assert cfg.noise_reduction.afftdn_track_noise is True

    def test_custom_profile_gates(self):
        # all conditions met -> custom
        m = _measurements(separation=15.0, room_flatness=0.5)
        assert use_custom_afftdn_profile(m)
        cfg, _ = adapt_config(default_filter_config(), m)
        assert cfg.noise_reduction.afftdn_noise_type == "custom"
        assert len(cfg.noise_reduction.afftdn_band_noise) == 15
        # separation too narrow -> white
        m = _measurements(separation=11.0, room_flatness=0.5)
        assert not use_custom_afftdn_profile(m)
        # room tone too tonal -> white
        m = _measurements(separation=15.0, room_flatness=0.3)
        assert not use_custom_afftdn_profile(m)
        # bands not measured -> white
        m = _measurements(separation=15.0, noise_bands_measured=False)
        assert not use_custom_afftdn_profile(m)

    def test_band_noise_shape_relative_to_mean(self):
        bands = [-60.0] * 14 + [math.nan]
        shape = build_afftdn_band_noise(bands)
        assert shape is not None
        assert all(v == 0.0 for v in shape)
        # a band 6 dB above the mean of the others
        bands = [-60.0] * 13 + [-54.0, math.inf]
        shape = build_afftdn_band_noise(bands)
        mean = (13 * -60.0 + -54.0) / 14
        assert shape[13] == pytest.approx(-54.0 - mean)
        assert shape[14] == 0.0
        # clip at +-24
        bands = [-90.0] * 14 + [-10.0]
        shape = build_afftdn_band_noise(bands)
        assert shape[14] == 24.0
        assert build_afftdn_band_noise([]) is None
        assert build_afftdn_band_noise([math.nan] * 15) is None


class TestSpeechGate:
    def test_voiced_anchored_threshold(self):
        thr, narrow = calculate_speech_gate_threshold(-30.0, 25.0)
        assert 20 * math.log10(thr) == pytest.approx(-36.0)
        assert not narrow

    def test_narrow_gap_detection(self):
        _, narrow = calculate_speech_gate_threshold(-30.0, 11.9)
        assert narrow
        _, narrow = calculate_speech_gate_threshold(-30.0, 12.0)
        assert not narrow

    def test_threshold_clamps(self):
        thr, _ = calculate_speech_gate_threshold(-90.0, 25.0)
        assert 20 * math.log10(thr) == pytest.approx(-80.0)
        thr, _ = calculate_speech_gate_threshold(-10.0, 25.0)
        assert 20 * math.log10(thr) == pytest.approx(-25.0)

    def test_ratio_from_lra(self):
        assert calculate_speech_gate_ratio(16.0) == 1.5
        assert calculate_speech_gate_ratio(15.0) == 2.0
        assert calculate_speech_gate_ratio(5.0) == 2.0

    def test_depth_narrow_vs_normal(self):
        cfg, diag = adapt_config(default_filter_config(), _measurements(separation=25.0))
        assert diag.speech_gate_depth_db == 14.0
        assert cfg.speech_gate.range == pytest.approx(10 ** (-14 / 20))
        cfg, diag = adapt_config(default_filter_config(), _measurements(separation=8.0))
        assert diag.speech_gate_depth_db == 8.0
        assert cfg.speech_gate.range == pytest.approx(10 ** (-8 / 20))

    def test_fixed_params(self):
        cfg, _ = adapt_config(default_filter_config(), _measurements())
        g = cfg.speech_gate
        assert (g.attack, g.release, g.knee, g.detection) == (5.0, 200.0, 3.0, "rms")

    def test_no_profile_fallback_noise_floor_path(self):
        # low crest -> min-gap path: floor + 12/(1-1/ratio) vs -40 target
        thr = calculate_speech_gate_threshold_no_profile(-60.0, -55.0, 10.0, 2.0, 9.0)
        # min gap = 12/(1-0.5) = 24 -> -36; max(-36, -40) = -36
        assert 20 * math.log10(thr) == pytest.approx(-36.0)

    def test_no_profile_peak_reference_path(self):
        thr = calculate_speech_gate_threshold_no_profile(-60.0, -50.0, 25.0, 2.0, 9.0)
        assert 20 * math.log10(thr) == pytest.approx(-47.0)
        # extreme lufs gap disables peak branch
        thr = calculate_speech_gate_threshold_no_profile(-60.0, -50.0, 25.0, 2.0, 26.0)
        assert 20 * math.log10(thr) == pytest.approx(-36.0)


class TestDeesser:
    @pytest.mark.parametrize(
        "excess,expected",
        [
            (-7.0, 0.0),
            (-6.0, 0.0),
            (-4.5, 0.3),
            (-3.0, 0.6),
            (-1.5, 0.725),
            (0.0, 0.85),
            (3.0, 0.85),
        ],
    )
    def test_intensity_ramp(self, excess, expected):
        m = _measurements(body_rms=-30.0, sib_rms=-30.0 + excess)
        cfg = default_filter_config()
        tune_deesser(cfg, m)
        assert cfg.deesser.intensity == pytest.approx(expected, abs=1e-9)

    def test_off_without_measured_bands(self):
        m = _measurements(bands_measured=False, sib_rms=0.0, body_rms=-60.0)
        cfg = default_filter_config()
        tune_deesser(cfg, m)
        assert cfg.deesser.intensity == 0.0
        m = _measurements(with_speech=False)
        tune_deesser(cfg, m)
        assert cfg.deesser.intensity == 0.0


class TestLevellingCompressor:
    def test_speech_anchored_threshold(self):
        cfg, _ = adapt_config(
            default_filter_config(), _measurements(speech_rms=-24.0, rms_level=-28.0)
        )
        assert cfg.levelling_compressor.threshold == pytest.approx(-15.0)

    def test_full_file_rms_floors_speech(self):
        # anomalously quiet election raised to full-file RMS
        cfg, _ = adapt_config(
            default_filter_config(), _measurements(speech_rms=-50.0, rms_level=-28.0)
        )
        assert cfg.levelling_compressor.threshold == pytest.approx(-28.0 + 9.0)

    def test_clamps(self):
        cfg, _ = adapt_config(
            default_filter_config(), _measurements(speech_rms=-70.0, rms_level=-70.0)
        )
        assert cfg.levelling_compressor.threshold == -45.0
        cfg, _ = adapt_config(
            default_filter_config(), _measurements(speech_rms=-3.0, rms_level=-3.0)
        )
        assert cfg.levelling_compressor.threshold == -6.0

    def test_no_profile_peak_fallback(self):
        cfg, _ = adapt_config(
            default_filter_config(),
            _measurements(with_speech=False, peak_level=-6.0),
        )
        assert cfg.levelling_compressor.threshold == pytest.approx(-26.0)

    def test_fixed_params(self):
        cfg, _ = adapt_config(default_filter_config(), _measurements())
        c = cfg.levelling_compressor
        assert (c.ratio, c.attack, c.release, c.knee, c.mix, c.makeup) == (
            3.0, 10.0, 200.0, 4.0, 1.0, 0.0,
        )


class TestLevellingCompressorGuardMatrix:
    """The full-file-RMS floor's guard matrix and the peak-fallback edge
    cases (ref: TestTuneLevellingCompressorThresholdFullFileRMSFloor,
    adaptive_test.go:1504-1579; ...AcceptsZeroDBPeak :1478;
    ...FallsBackForInvalidPeak :1491; ...ClampedHigh/Low :1433-1463)."""

    OFFSET = 9.0  # levellingCompressorThresholdSpeechOffsetDB

    @pytest.mark.parametrize(
        "name,speech_rms,full_file_rms,want",
        [
            ("speech above full-file (floor inert)", -24.0, -40.0, -15.0),
            ("speech below full-file (floor engaged)", -50.0, -40.0, -31.0),
            ("NaN full-file falls back to speech", -24.0, math.nan, -15.0),
            ("+Inf full-file falls back to speech", -24.0, math.inf, -15.0),
            ("-Inf full-file falls back to speech", -24.0, -math.inf, -15.0),
            ("zero full-file (unmeasured astats) falls back", -24.0, 0.0, -15.0),
            ("floor then clamp ceiling", -50.0, -8.0, -6.0),
        ],
    )
    def test_full_file_rms_floor_guards(self, name, speech_rms, full_file_rms, want):
        from jivetalking_tpu.adaptive.adapt import tune_levelling_compressor

        m = _measurements(speech_rms=speech_rms)
        m.dynamics.rms_level = full_file_rms
        cfg = default_filter_config()
        tune_levelling_compressor(cfg, m)
        assert cfg.levelling_compressor.threshold == pytest.approx(want, abs=1e-3), name

    def test_speech_rms_clamped_high(self):
        # RMS -10 + 9 = -1, above the -6 ceiling (full-file RMS below, inert)
        from jivetalking_tpu.adaptive.adapt import tune_levelling_compressor

        m = _measurements(speech_rms=-10.0, rms_level=-20.0)
        cfg = default_filter_config()
        tune_levelling_compressor(cfg, m)
        assert cfg.levelling_compressor.threshold == pytest.approx(-6.0, abs=1e-3)

    def test_speech_rms_clamped_low_with_nan_full_file(self):
        # -60 + 9 = -51 below the -45 floor; NaN full-file keeps the floor out
        from jivetalking_tpu.adaptive.adapt import tune_levelling_compressor

        m = _measurements(speech_rms=-60.0)
        m.dynamics.rms_level = math.nan
        cfg = default_filter_config()
        tune_levelling_compressor(cfg, m)
        assert cfg.levelling_compressor.threshold == pytest.approx(-45.0, abs=1e-3)

    def test_accepts_zero_db_peak(self):
        # a 0 dBFS peak is a legitimate measurement: 0 - 20 = -20
        from jivetalking_tpu.adaptive.adapt import tune_levelling_compressor

        m = _measurements(with_speech=False)
        m.dynamics.peak_level = 0.0
        cfg = default_filter_config()
        tune_levelling_compressor(cfg, m)
        assert cfg.levelling_compressor.threshold == pytest.approx(-20.0, abs=1e-3)

    @pytest.mark.parametrize("bad_peak", [math.nan, math.inf, -math.inf])
    def test_invalid_peak_falls_back_to_default(self, bad_peak):
        from jivetalking_tpu.adaptive.adapt import (
            COMP_DEFAULT_THRESHOLD,
            tune_levelling_compressor,
        )

        m = _measurements(with_speech=False)
        m.dynamics.peak_level = bad_peak
        cfg = default_filter_config()
        tune_levelling_compressor(cfg, m)
        assert cfg.levelling_compressor.threshold == pytest.approx(
            COMP_DEFAULT_THRESHOLD, abs=1e-3)


class TestSanitize:
    def test_nan_threshold_reset(self):
        m = _measurements()
        m.vad.gate_stats.voiced_low_percentile = math.nan
        cfg, _ = adapt_config(default_filter_config(), m)
        assert cfg.speech_gate.threshold == 0.01

    def test_base_not_mutated(self):
        base = default_filter_config()
        before = base.levelling_compressor.threshold
        adapt_config(base, _measurements(speech_rms=-24.0))
        assert base.levelling_compressor.threshold == before

    def test_bandlimit_always_on(self):
        cfg, diag = adapt_config(default_filter_config(), _measurements())
        assert cfg.bandlimit_lowpass.enabled
        assert cfg.bandlimit_lowpass.frequency == 20500.0
        assert "band-limit" in diag.bandlimit_lp_reason
