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
