"""Pass-2 chain-construction contract — the behavioural port of the
reference's per-filter spec-builder suite (filters_test.go:118-1021:
TestBuildFilterSpec, TestBuildRumbleHighpassFilter :468,
TestBuildSpeechGateFilter :513, TestBuildBandlimitLowPassFilter :570,
TestBuildLevellingCompressorFilter :625, TestBuildDeesserFilter :664,
TestBuildNoiseReductionFilter :726, TestBuildAdeclickFilter :925,
TestFilterOrderRespected :991, TestBuildDownmixFilter :1390,
TestBuildResampleFilter :1530).

The reference pins the emitted FFmpeg spec STRING per config; this
rebuild has no string layer, so each pin lands on the call boundary
instead: a spy over the chain's op functions records which stages run,
in what order, and with exactly which parameters.  That is the same
contract the strings encoded — enabled-toggle gating, stage order, and
parameter pass-through — without touching any device code.
"""

from __future__ import annotations

import numpy as np
import pytest

import jivetalking_tpu.pipeline.normalise as norm_mod
import jivetalking_tpu.pipeline.pass2 as pass2
from jivetalking_tpu.adaptive import default_filter_config
from jivetalking_tpu.pipeline.pass2 import apply_filter_chain, downmix, output_resample

SR = 48000


@pytest.fixture()
def spy(monkeypatch):
    """Replace every chain op with an identity that records (name, kwargs)."""
    calls: list[tuple[str, dict]] = []

    def record(name, passthrough=0):
        def fn(x, *a, **k):
            calls.append((name, k | {f"_arg{i}": v for i, v in enumerate(a)}))
            return x
        return fn

    monkeypatch.setattr(pass2, "apply_nlm", record("anlmdn"))
    monkeypatch.setattr(pass2, "apply_spectral_gate", record("afftdn"))
    monkeypatch.setattr(pass2, "apply_gate", record("agate"))
    monkeypatch.setattr(pass2, "apply_compressor", record("acompressor"))
    monkeypatch.setattr(pass2, "apply_deesser", record("deesser"))

    def fake_sosfilt(sos, x, ir_len=1024):
        calls.append(("biquads", {"n_sections": int(np.asarray(sos).shape[0]),
                                  "ir_len": ir_len}))
        return x

    monkeypatch.setattr(pass2, "sosfilt_fir", fake_sosfilt)
    return calls


def _names(calls):
    return [n for n, _ in calls]


def _kwargs(calls, name):
    return next(k for n, k in calls if n == name)


def _x():
    return np.zeros(256, dtype=np.float32)


class TestFilterOrderRespected:
    """(ref: TestFilterOrderRespected :991 + TestBuildFilterSpec :118) —
    the Pass-2 order is biquads -> anlmdn -> afftdn -> agate ->
    acompressor -> deesser; disabling a stage removes exactly it."""

    def test_full_chain_order(self, spy):
        cfg = default_filter_config()
        cfg.deesser.enabled = True
        cfg.deesser.intensity = 0.5
        apply_filter_chain(_x(), SR, cfg)
        assert _names(spy) == [
            "biquads", "anlmdn", "afftdn", "agate", "acompressor", "deesser"]

    def test_each_toggle_removes_exactly_its_stage(self, spy):
        base_cfg = default_filter_config()
        base_cfg.deesser.enabled = True
        base_cfg.deesser.intensity = 0.5
        apply_filter_chain(_x(), SR, base_cfg)
        full = list(_names(spy))
        for stage, mutate in [
            ("agate", lambda c: setattr(c.speech_gate, "enabled", False)),
            ("acompressor",
             lambda c: setattr(c.levelling_compressor, "enabled", False)),
            ("deesser", lambda c: setattr(c.deesser, "enabled", False)),
        ]:
            spy.clear()
            cfg = default_filter_config()
            cfg.deesser.enabled = True
            cfg.deesser.intensity = 0.5
            mutate(cfg)
            apply_filter_chain(_x(), SR, cfg)
            want = [n for n in full if n != stage]
            assert _names(spy) == want, stage

    def test_noise_reduction_disabled_removes_both(self, spy):
        # (ref: "disabled returns empty" :727 — one toggle owns the
        # anlmdn+afftdn block)
        cfg = default_filter_config()
        cfg.noise_reduction.enabled = False
        apply_filter_chain(_x(), SR, cfg)
        assert "anlmdn" not in _names(spy)
        assert "afftdn" not in _names(spy)

    def test_afftdn_disabled_keeps_anlmdn_only(self, spy):
        # (ref: "afftdn disabled produces anlmdn-only spec" :892)
        cfg = default_filter_config()
        cfg.noise_reduction.afftdn_enabled = False
        apply_filter_chain(_x(), SR, cfg)
        names = _names(spy)
        assert "anlmdn" in names and "afftdn" not in names

    def test_anlmdn_before_afftdn(self, spy):
        # (ref: "anlmdn appears before afftdn" :910)
        cfg = default_filter_config()
        apply_filter_chain(_x(), SR, cfg)
        names = _names(spy)
        assert names.index("anlmdn") < names.index("afftdn")


class TestNoiseReductionParams:
    """(ref: TestBuildNoiseReductionFilter :726) — parameter pass-through
    for the anlmdn/afftdn block."""

    def test_anlmdn_parameters_pass_through(self, spy):
        # (ref: "anlmdn parameters formatted correctly" :766 — the spec
        # string s=0.00001:p=0.0060:r=0.0058:m=11)
        cfg = default_filter_config()
        cfg.noise_reduction.strength = 0.00001
        cfg.noise_reduction.patch_sec = 0.006
        cfg.noise_reduction.research_sec = 0.0058
        cfg.noise_reduction.smooth = 11.0
        apply_filter_chain(_x(), SR, cfg)
        k = _kwargs(spy, "anlmdn")
        assert k["strength"] == 0.00001
        assert k["patch_sec"] == 0.006
        assert k["research_sec"] == 0.0058
        assert k["smooth"] == 11.0

    def test_afftdn_fixed_nr_12(self, spy):
        # (ref: "afftdn clause fixed at nr=12" :790)
        cfg = default_filter_config()
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "afftdn")["nr_db"] == 12.0

    def test_unset_floor_takes_ffmpeg_default(self, spy):
        # (ref: "afftdn nf omitted when unset" :802 — omitting nf leaves
        # FFmpeg's default of -50 dB; this rebuild encodes the same
        # semantic by substituting -50.0 explicitly)
        cfg = default_filter_config()
        cfg.noise_reduction.afftdn_noise_floor = 0.0
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "afftdn")["nf_db"] == -50.0

    def test_set_floor_passes_through(self, spy):
        # (ref: "afftdn nf present and tn=0 when floor set" :816)
        cfg = default_filter_config()
        cfg.noise_reduction.afftdn_noise_floor = -58.0
        cfg.noise_reduction.afftdn_track_noise = False
        apply_filter_chain(_x(), SR, cfg)
        k = _kwargs(spy, "afftdn")
        assert k["nf_db"] == -58.0
        assert k["track_noise"] is False

    def test_custom_profile_ships_band_shape(self, spy):
        # (ref: "afftdn custom profile emits nt=custom:bn..." :828)
        cfg = default_filter_config()
        cfg.noise_reduction.afftdn_noise_type = "custom"
        cfg.noise_reduction.afftdn_band_noise = [0.0, 3.5, -2.0]
        cfg.noise_reduction.afftdn_noise_floor = -58.0
        apply_filter_chain(_x(), SR, cfg)
        k = _kwargs(spy, "afftdn")
        assert k["band_shape_db"] == [0.0, 3.5, -2.0]
        assert k["nf_db"] == -58.0

    def test_white_type_ships_no_band_shape(self, spy):
        # (ref: "afftdn custom with empty bn emits no bn clause" :854 —
        # a non-custom type must never ship a shape)
        cfg = default_filter_config()
        cfg.noise_reduction.afftdn_noise_type = "w"
        cfg.noise_reduction.afftdn_band_noise = [0.0, 3.5]
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "afftdn")["band_shape_db"] is None


class TestGateCompressorDeesserParams:
    """(ref: TestBuildSpeechGateFilter :513,
    TestBuildLevellingCompressorFilter :625, TestBuildDeesserFilter :664)."""

    def test_gate_params_pass_through(self, spy):
        cfg = default_filter_config()
        cfg.speech_gate.threshold = 0.02
        cfg.speech_gate.ratio = 1.5
        cfg.speech_gate.attack = 5.0
        cfg.speech_gate.release = 200.0
        cfg.speech_gate.range = 0.0625
        cfg.speech_gate.knee = 3.0
        cfg.speech_gate.detection = "rms"
        apply_filter_chain(_x(), SR, cfg)
        k = _kwargs(spy, "agate")
        assert k["threshold"] == 0.02
        assert k["ratio"] == 1.5
        assert k["attack_ms"] == 5.0
        assert k["release_ms"] == 200.0
        assert k["range_lin"] == 0.0625
        assert k["knee"] == 3.0
        assert k["detection_rms"] is True

    def test_gate_peak_detection_maps_false(self, spy):
        cfg = default_filter_config()
        cfg.speech_gate.detection = "peak"
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "agate")["detection_rms"] is False

    def test_compressor_params_pass_through(self, spy):
        cfg = default_filter_config()
        cfg.levelling_compressor.threshold = -24.0
        cfg.levelling_compressor.ratio = 3.0
        cfg.levelling_compressor.attack = 10.0
        cfg.levelling_compressor.release = 200.0
        cfg.levelling_compressor.knee = 4.0
        cfg.levelling_compressor.makeup = 0.0
        cfg.levelling_compressor.mix = 1.0
        apply_filter_chain(_x(), SR, cfg)
        k = _kwargs(spy, "acompressor")
        assert k["threshold_db"] == -24.0
        assert k["ratio"] == 3.0
        assert k["attack_ms"] == 10.0
        assert k["release_ms"] == 200.0
        assert k["knee"] == 4.0
        # makeup crosses the dB->linear boundary at the call site
        assert k["makeup"] == pytest.approx(1.0)
        assert k["mix"] == 1.0

    def test_compressor_makeup_db_to_linear(self, spy):
        cfg = default_filter_config()
        cfg.levelling_compressor.makeup = 6.0
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "acompressor")["makeup"] == pytest.approx(
            10.0 ** (6.0 / 20.0))

    def test_deesser_zero_intensity_is_skipped(self, spy):
        # (ref: TestBuildDeesserFilter — i=0 emits no deesser clause)
        cfg = default_filter_config()
        cfg.deesser.enabled = True
        cfg.deesser.intensity = 0.0
        apply_filter_chain(_x(), SR, cfg)
        assert "deesser" not in _names(spy)

    def test_deesser_params_pass_through(self, spy):
        cfg = default_filter_config()
        cfg.deesser.enabled = True
        cfg.deesser.intensity = 0.62
        cfg.deesser.amount = 0.5
        cfg.deesser.frequency = 0.8
        apply_filter_chain(_x(), SR, cfg)
        k = _kwargs(spy, "deesser")
        assert k["intensity"] == 0.62
        assert k["amount"] == 0.5
        assert k["frequency"] == 0.8


class TestBiquadBlock:
    """(ref: TestBuildRumbleHighpassFilter :468,
    TestBuildBandlimitLowPassFilter :570) — the HP/LP pair fuses into one
    SOS cascade; each toggle controls its section count."""

    def test_both_enabled_two_sections(self, spy):
        apply_filter_chain(_x(), SR, default_filter_config())
        assert _kwargs(spy, "biquads")["n_sections"] == 2

    def test_highpass_only(self, spy):
        cfg = default_filter_config()
        cfg.bandlimit_lowpass.enabled = False
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "biquads")["n_sections"] == 1

    def test_lowpass_only(self, spy):
        cfg = default_filter_config()
        cfg.rumble_highpass.enabled = False
        apply_filter_chain(_x(), SR, cfg)
        assert _kwargs(spy, "biquads")["n_sections"] == 1

    def test_none_enabled_no_biquads(self, spy):
        cfg = default_filter_config()
        cfg.rumble_highpass.enabled = False
        cfg.bandlimit_lowpass.enabled = False
        apply_filter_chain(_x(), SR, cfg)
        assert "biquads" not in _names(spy)

    def test_lowpass_above_nyquist_is_dropped(self, spy):
        # the 20.5 kHz band-limit is meaningless at a 32 kHz rate
        # (nyquist 16 k); the section must not be built
        cfg = default_filter_config()
        cfg.rumble_highpass.enabled = False
        apply_filter_chain(_x(), 32000, cfg)
        assert "biquads" not in _names(spy)


class TestDownmixResample:
    """(ref: TestBuildDownmixFilter :1390, TestBuildResampleFilter :1530)."""

    def test_downmix_means_channels(self):
        x = np.stack([np.full(64, 0.5, np.float32),
                      np.full(64, -0.25, np.float32)])
        y = np.asarray(downmix(x))
        assert y.shape == (64,)
        np.testing.assert_allclose(y, 0.125, atol=1e-7)

    def test_downmix_int16_scales_exactly(self):
        x = np.asarray([16384, -32768, 0], dtype=np.int16)
        y = np.asarray(downmix(x))
        np.testing.assert_allclose(y, [0.5, -1.0, 0.0], atol=0)

    def test_resample_same_rate_identity(self):
        cfg = default_filter_config()
        x = np.zeros(128, np.float32)
        y, rate = output_resample(x, cfg.resample.sample_rate, cfg)
        assert rate == cfg.resample.sample_rate
        np.testing.assert_array_equal(np.asarray(y), x)

    def test_resample_disabled_identity(self):
        cfg = default_filter_config()
        cfg.resample.enabled = False
        x = np.zeros(128, np.float32)
        y, rate = output_resample(x, 48000, cfg)
        assert rate == 48000
        np.testing.assert_array_equal(np.asarray(y), x)

    def test_resample_converts_rate(self, monkeypatch):
        seen = {}

        def fake_resample(x, src, dst):
            seen["rates"] = (src, dst)
            return x

        monkeypatch.setattr(pass2, "resample", fake_resample)
        cfg = default_filter_config()
        out, rate = output_resample(np.zeros(128, np.float32), 48000, cfg)
        assert seen["rates"] == (48000, cfg.resample.sample_rate)
        assert rate == cfg.resample.sample_rate


class TestAdeclickCall:
    """(ref: TestBuildAdeclickFilter :925) — Pass 4's adeclick parameter
    pass-through and toggle, at the op-call boundary."""

    @pytest.fixture()
    def declick_spy(self, monkeypatch):
        calls = []

        def fake(x, sr, **k):
            calls.append(k)
            return x

        monkeypatch.setattr(norm_mod, "apply_declick", fake)
        return calls

    def _run(self, cfg):
        rng = np.random.default_rng(0)
        x = (0.05 * rng.standard_normal(SR // 2)).astype(np.float32)
        norm_mod.apply_normalisation(x, SR, cfg)

    def test_default_production_clause(self, declick_spy):
        # adeclick=t=1.7:w=55:o=50:m=s
        self._run(default_filter_config())
        assert declick_spy == [{
            "threshold": 1.7, "window_ms": 55.0, "overlap": 50.0,
            "method": "s"}]

    def test_custom_parameters(self, declick_spy):
        cfg = default_filter_config()
        cfg.adeclick.threshold = 2.0
        cfg.adeclick.window = 100.0
        self._run(cfg)
        assert declick_spy[0]["threshold"] == 2.0
        assert declick_spy[0]["window_ms"] == 100.0

    def test_disabled_not_called(self, declick_spy):
        cfg = default_filter_config()
        cfg.adeclick.enabled = False
        self._run(cfg)
        assert declick_spy == []
