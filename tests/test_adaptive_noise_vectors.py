"""Reference-vector mirrors for the noise-reduction tuning and band-noise
shape maths (ref: adaptive_test.go TestTuneNoiseReduction :1748-1966 and
TestBuildAfftdnBandNoise :1967-2031).  Our bn is a float list rather than
the reference's one-decimal pipe string; the vectors compare the values
the string would have carried."""

import math

import pytest

from jivetalking_tpu.adaptive.adapt import (
    AdaptiveDiagnostics,
    build_afftdn_band_noise,
    tune_noise_reduction,
)
from jivetalking_tpu.adaptive.config import default_filter_config
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import NoiseProfile


def _m(floor=-58.0, voice_activated=False, separation=15.0, flatness=0.6,
       bands_measured=True, band_noise=(-61.0, -60.0, -59.0),
       with_profile=True):
    m = AudioMeasurements()
    m.noise.floor = floor
    m.noise.voice_activated = voice_activated
    m.vad.gate_stats.separation_db = separation
    if with_profile:
        p = NoiseProfile()
        p.spectral.flatness = flatness
        p.bands_measured = bands_measured
        p.band_noise = list(band_noise) if band_noise is not None else None
        m.vad.noise_profile = p
    return m


class TestTuneNoiseReductionVectors:
    def test_voice_activated_disables(self):
        cfg = default_filter_config()
        d = AdaptiveDiagnostics()
        tune_noise_reduction(cfg, d, _m(voice_activated=True))
        assert not cfg.noise_reduction.afftdn_enabled
        assert not d.afftdn_enabled
        assert d.afftdn_disable_reason == "voice_activated"
        assert cfg.noise_reduction.afftdn_noise_floor == 0.0

    def test_measured_floor_sets_nf_tracking_off(self):
        cfg = default_filter_config()
        d = AdaptiveDiagnostics()
        tune_noise_reduction(cfg, d, _m(floor=-58.0, separation=11.0))
        assert cfg.noise_reduction.afftdn_enabled
        assert cfg.noise_reduction.afftdn_noise_floor == -58.0
        assert not cfg.noise_reduction.afftdn_track_noise
        assert d.afftdn_noise_floor_db == -58.0
        assert d.afftdn_enabled

    def test_out_of_range_floor_clamps(self):
        low = default_filter_config()
        tune_noise_reduction(low, AdaptiveDiagnostics(), _m(floor=-120.0))
        assert low.noise_reduction.afftdn_noise_floor == -80.0
        high = default_filter_config()
        tune_noise_reduction(high, AdaptiveDiagnostics(), _m(floor=-5.0))
        assert high.noise_reduction.afftdn_noise_floor == -20.0

    def test_unmeasured_floor_leaves_defaults(self):
        cfg = default_filter_config()
        tune_noise_reduction(cfg, AdaptiveDiagnostics(), _m(floor=0.0))
        assert cfg.noise_reduction.afftdn_enabled
        assert cfg.noise_reduction.afftdn_track_noise
        assert cfg.noise_reduction.afftdn_noise_floor == 0.0

    def test_qualifying_elects_custom_profile(self):
        cfg = default_filter_config()
        d = AdaptiveDiagnostics()
        tune_noise_reduction(cfg, d, _m())
        assert cfg.noise_reduction.afftdn_noise_type == "custom"
        assert cfg.noise_reduction.afftdn_band_noise == pytest.approx(
            [-1.0, 0.0, 1.0])
        assert cfg.noise_reduction.afftdn_noise_floor == -58.0
        assert not cfg.noise_reduction.afftdn_track_noise
        assert d.afftdn_noise_type == "custom"

    def test_trailing_non_finite_band_stays_custom(self):
        cfg = default_filter_config()
        tune_noise_reduction(cfg, AdaptiveDiagnostics(),
                             _m(band_noise=(-61.0, -60.0, -59.0, math.nan)))
        assert cfg.noise_reduction.afftdn_noise_type == "custom"
        bn = cfg.noise_reduction.afftdn_band_noise
        assert bn == pytest.approx([-1.0, 0.0, 1.0, 0.0])
        assert all(math.isfinite(v) for v in bn)

    def test_all_non_finite_bands_white_fallback(self):
        cfg = default_filter_config()
        tune_noise_reduction(
            cfg, AdaptiveDiagnostics(),
            _m(band_noise=(math.nan, -math.inf, math.inf)))
        assert cfg.noise_reduction.afftdn_noise_type == "w"
        assert not cfg.noise_reduction.afftdn_band_noise

    @pytest.mark.parametrize("name,kwargs", [
        ("bands unmeasured", dict(bands_measured=False)),
        ("separation too low", dict(separation=11.0)),
        ("too tonal", dict(flatness=0.40)),
        ("no noise profile", dict(with_profile=False)),
    ])
    def test_non_qualifying_keeps_white(self, name, kwargs):
        cfg = default_filter_config()
        tune_noise_reduction(cfg, AdaptiveDiagnostics(), _m(**kwargs))
        assert cfg.noise_reduction.afftdn_noise_type == "w", name
        assert not cfg.noise_reduction.afftdn_band_noise, name


class TestBuildAfftdnBandNoiseVectors:
    def test_empty_input_yields_none(self):
        assert build_afftdn_band_noise(None) is None
        assert build_afftdn_band_noise([]) is None

    def test_subtracts_mean(self):
        assert build_afftdn_band_noise([-50.0, -40.0, -30.0]) == pytest.approx(
            [-10.0, 0.0, 10.0])

    def test_clips_to_pm24(self):
        assert build_afftdn_band_noise([-100.0, 0.0]) == pytest.approx(
            [-24.0, 24.0])

    def test_trailing_nan_mean_over_finite(self):
        got = build_afftdn_band_noise([-50.0, -40.0, -30.0, math.nan])
        assert got == pytest.approx([-10.0, 0.0, 10.0, 0.0])
        assert all(math.isfinite(v) for v in got)

    def test_interior_inf_excluded_from_mean(self):
        got = build_afftdn_band_noise([-50.0, -math.inf, -30.0])
        assert got == pytest.approx([-10.0, 0.0, 10.0])

    def test_finite_silent_band_is_real_measurement(self):
        # mean of {-120, -40, -40} = -66.67; shapes clip to [-24, +24]
        got = build_afftdn_band_noise([-120.0, -40.0, -40.0])
        assert got == pytest.approx([-24.0, 24.0, 24.0])

    def test_all_non_finite_none(self):
        assert build_afftdn_band_noise([math.nan, math.inf, -math.inf]) is None


class TestSanitizeFloatVectors:
    """ref: TestSanitizeFloat, adaptive_test.go:1164-1261."""

    @pytest.mark.parametrize("val,want", [
        (math.nan, 42.0),
        (math.inf, 42.0),
        (-math.inf, 42.0),
        (0.0, 0.0),
        (-25.5, -25.5),
        (80.0, 80.0),
        (1e-10, 1e-10),
        (1e10, 1e10),
        (-1e-10, -1e-10),
        (-1e10, -1e10),
    ])
    def test_table(self, val, want):
        from jivetalking_tpu.utils.units import sanitize_float

        assert sanitize_float(val, 42.0) == want


class TestSanitizeConfigVectors:
    """ref: TestSanitizeConfig, adaptive_test.go:1262-1417."""

    def test_valid_config_passes_through_unchanged(self):
        import copy

        from jivetalking_tpu.adaptive.adapt import sanitize_config

        cfg = default_filter_config()
        cfg.rumble_highpass.frequency = 100.0
        cfg.speech_gate.threshold = 0.02
        cfg.speech_gate.ratio = 2.0
        cfg.levelling_compressor.threshold = -24.0
        cfg.deesser.intensity = 0.3
        want = copy.deepcopy(cfg)
        sanitize_config(cfg)
        assert cfg == want

    def test_non_finite_values_reset_to_defaults(self):
        from jivetalking_tpu.adaptive.adapt import sanitize_config
        from jivetalking_tpu.adaptive.config import (
            RUMBLE_HP_FREQ,
            NoiseReductionConfig,
            SpeechGateConfig,
        )

        cfg = default_filter_config()
        cfg.rumble_highpass.frequency = math.nan
        cfg.rumble_highpass.width = math.inf
        cfg.noise_reduction.strength = math.nan
        cfg.noise_reduction.afftdn_noise_floor = math.inf
        cfg.speech_gate.threshold = math.nan
        cfg.speech_gate.ratio = math.inf
        sanitize_config(cfg)
        assert cfg.rumble_highpass.frequency == RUMBLE_HP_FREQ
        assert cfg.rumble_highpass.width == 0.707
        assert cfg.noise_reduction.strength == NoiseReductionConfig().strength
        assert cfg.noise_reduction.afftdn_noise_floor == \
            NoiseReductionConfig().afftdn_noise_floor
        assert cfg.speech_gate.threshold == SpeechGateConfig().threshold
        assert cfg.speech_gate.ratio == SpeechGateConfig().ratio
        assert math.isfinite(cfg.speech_gate.threshold)

    def test_custom_type_without_bands_degrades_to_white(self):
        from jivetalking_tpu.adaptive.adapt import sanitize_config

        cfg = default_filter_config()
        cfg.noise_reduction.afftdn_noise_type = "custom"
        cfg.noise_reduction.afftdn_band_noise = []
        sanitize_config(cfg)
        assert cfg.noise_reduction.afftdn_noise_type == "w"

    def test_every_float_field_non_finite_resets_to_defaults(self):
        """The full non-finite matrix: every sanitised float field of every
        typed family set NaN/+Inf/-Inf must come back at its family default
        (ref: 'typed family non-finite values get defaults',
        adaptive_test.go:1295-1366)."""
        from jivetalking_tpu.adaptive.adapt import (
            COMP_DEFAULT_THRESHOLD,
            GATE_DEFAULT_THRESHOLD,
            sanitize_config,
        )
        from jivetalking_tpu.adaptive.config import (
            BANDLIMIT_LP_FREQ,
            RUMBLE_HP_FREQ,
            LevellingCompressorConfig,
            NoiseReductionConfig,
            SpeechGateConfig,
        )

        bad = [math.nan, math.inf, -math.inf]
        cfg = default_filter_config()
        cfg.rumble_highpass.frequency = bad[0]
        cfg.rumble_highpass.width = bad[1]
        cfg.rumble_highpass.mix = bad[2]
        cfg.bandlimit_lowpass.frequency = bad[1]
        cfg.bandlimit_lowpass.width = bad[0]
        cfg.bandlimit_lowpass.mix = bad[2]
        nr = cfg.noise_reduction
        nr.strength, nr.patch_sec, nr.research_sec = bad
        nr.smooth, nr.afftdn_noise_reduction = bad[0], bad[1]
        nr.afftdn_noise_floor = bad[2]
        g = cfg.speech_gate
        g.threshold, g.ratio, g.attack = bad
        g.release, g.range, g.knee = bad
        g.makeup = bad[0]
        lc = cfg.levelling_compressor
        lc.threshold, lc.ratio, lc.attack = bad
        lc.release, lc.makeup, lc.knee = bad

        sanitize_config(cfg)

        assert cfg.rumble_highpass.frequency == RUMBLE_HP_FREQ
        assert cfg.rumble_highpass.width == 0.707
        assert cfg.rumble_highpass.mix == 1.0
        assert cfg.bandlimit_lowpass.frequency == BANDLIMIT_LP_FREQ
        assert cfg.bandlimit_lowpass.width == 0.707
        assert cfg.bandlimit_lowpass.mix == 1.0
        nr_d = NoiseReductionConfig()
        assert nr.strength == nr_d.strength
        assert nr.patch_sec == nr_d.patch_sec
        assert nr.research_sec == nr_d.research_sec
        assert nr.smooth == nr_d.smooth
        assert nr.afftdn_noise_reduction == nr_d.afftdn_noise_reduction
        assert nr.afftdn_noise_floor == nr_d.afftdn_noise_floor
        g_d = SpeechGateConfig()
        assert g.threshold == GATE_DEFAULT_THRESHOLD
        assert g.ratio == g_d.ratio
        assert g.attack == g_d.attack
        assert g.release == g_d.release
        assert g.range == g_d.range
        assert g.knee == g_d.knee
        assert g.makeup == g_d.makeup
        lc_d = LevellingCompressorConfig()
        assert lc.threshold == COMP_DEFAULT_THRESHOLD
        assert lc.ratio == lc_d.ratio
        assert lc.attack == lc_d.attack
        assert lc.release == lc_d.release
        assert lc.makeup == lc_d.makeup
        assert lc.knee == lc_d.knee

    @pytest.mark.parametrize("threshold", [
        math.nan, math.inf, -math.inf, 0.0, -0.5])
    def test_gate_threshold_zero_and_negative_clamp(self, threshold):
        """Gate threshold is a LINEAR amplitude: zero and negative inputs
        are as invalid as non-finite ones and take the default
        (ref: 'gate threshold keeps existing zero and negative clamp
        behaviour', adaptive_test.go:1368-1378)."""
        from jivetalking_tpu.adaptive.adapt import (
            GATE_DEFAULT_THRESHOLD,
            sanitize_config,
        )

        cfg = default_filter_config()
        cfg.speech_gate.threshold = threshold
        sanitize_config(cfg)
        assert cfg.speech_gate.threshold == GATE_DEFAULT_THRESHOLD

    def test_zero_values_for_non_gate_fields_pass_through(self):
        """Zeros are valid for every non-gate float (disabled filters carry
        zeros); only the gate threshold special-cases them
        (ref: adaptive_test.go:1380-1402)."""
        from jivetalking_tpu.adaptive.adapt import sanitize_config

        cfg = default_filter_config()
        cfg.rumble_highpass.frequency = 0.0
        cfg.rumble_highpass.width = 0.0
        cfg.rumble_highpass.mix = 0.0
        cfg.deesser.intensity = 0.0
        cfg.levelling_compressor.ratio = 0.0
        cfg.levelling_compressor.threshold = 0.0
        cfg.speech_gate.threshold = 1e-10
        sanitize_config(cfg)
        assert cfg.rumble_highpass.frequency == 0.0
        assert cfg.rumble_highpass.width == 0.0
        assert cfg.rumble_highpass.mix == 0.0
        assert cfg.deesser.intensity == 0.0
        assert cfg.levelling_compressor.ratio == 0.0
        assert cfg.levelling_compressor.threshold == 0.0
        # tiny-but-positive gate threshold is legal and survives
        assert cfg.speech_gate.threshold == 1e-10

    def test_negative_compressor_threshold_passes_through(self):
        """The compressor threshold is in dB — negative is its NORMAL
        range and must never be 'repaired'
        (ref: adaptive_test.go:1404-1415)."""
        from jivetalking_tpu.adaptive.adapt import sanitize_config

        cfg = default_filter_config()
        cfg.levelling_compressor.threshold = -40.0
        cfg.levelling_compressor.ratio = 3.0
        cfg.speech_gate.threshold = 0.02
        sanitize_config(cfg)
        assert cfg.levelling_compressor.threshold == -40.0
        assert cfg.speech_gate.threshold == 0.02
