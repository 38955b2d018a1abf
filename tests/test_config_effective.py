"""Base/Effective config boundary + chain-composition contracts — the
behavioural port of the reference's remaining filters_test.go tables
(TestDeriveEffectiveFilterConfig :1107, TestAssembleEffectiveFilterConfig
:1068, TestDefaultFilterConfigSeedOwnershipBoundary :431 +
assertNoStaleEffectiveConfigFields :1146, TestDeriveAdaptiveFilterResult
DeepCopiesFilterOrder :1021, TestBuildFilterSpecBehaviourBaseline :291,
TestBuildRumbleHighpassFilter :468, TestBuildBandlimitLowPassFilter :570).

The reference pins spec STRINGS; this rebuild pins the same contracts at
the dataclass/call boundary: the seed type owns no per-file state, the
derived copy is fully independent, caller targets survive adaptation, and
every default parameter reaches its op in one composed chain call.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

import jivetalking_tpu.pipeline.pass2 as pass2
from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.adaptive.adapt import AdaptiveDiagnostics
from jivetalking_tpu.adaptive.config import (
    PASS2_FILTER_ORDER,
    FilterConfig,
    derive_effective_config,
)
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.pipeline.pass2 import apply_filter_chain

SR = 48000


class TestSeedOwnershipBoundary:
    """(ref: TestDefaultFilterConfigSeedOwnershipBoundary :431 +
    assertNoStaleEffectiveConfigFields :1146) — the config types must not
    own per-file state: pass counters, measurements, clamp reasons, or any
    flattened pre-typed-family field.  Those live on AdaptiveDiagnostics
    and the analyser result, never on the (cloneable, caller-owned) seed."""

    PER_FILE_STATE = {
        "pass_", "measurements", "output_analysis_enabled",
        "bandlimit_lp_reason", "speech_gate_depth_db",
        "speech_gate_dynamic_range", "speech_gate_quiet_speech_estimate",
        "speech_gate_speech_separation", "speech_gate_speech_headroom",
        "speech_gate_threshold_unclamped", "speech_gate_clamp_reason",
    }

    def _all_field_names(self, cls) -> set[str]:
        names = set()
        for f in dataclasses.fields(cls):
            names.add(f.name)
            if dataclasses.is_dataclass(f.type):
                names |= self._all_field_names(f.type)
        return names

    def test_config_owns_no_per_file_state(self):
        cfg_fields = set()
        for f in dataclasses.fields(FilterConfig):
            cfg_fields.add(f.name)
            sub = type(getattr(default_filter_config(), f.name))
            if dataclasses.is_dataclass(sub):
                cfg_fields |= {g.name for g in dataclasses.fields(sub)}
        assert not (cfg_fields & self.PER_FILE_STATE)

    def test_config_families_are_typed_not_flat(self):
        # the seed is composed of typed sub-configs, not flattened fields
        # (ref: staleFlatConfigFieldNames :1168 — e.g. no SpeechGateThreshold
        # at the top level)
        top = {f.name for f in dataclasses.fields(FilterConfig)}
        assert top == {
            "rumble_highpass", "bandlimit_lowpass", "noise_reduction",
            "speech_gate", "levelling_compressor", "deesser", "adeclick",
            "loudnorm", "resample", "filter_order",
        }

    def test_per_file_state_lives_on_diagnostics(self):
        d = {f.name for f in dataclasses.fields(AdaptiveDiagnostics)}
        for name in ("speech_gate_clamp_reason", "speech_gate_threshold_unclamped",
                     "speech_gate_speech_separation", "bandlimit_lp_reason"):
            assert name in d


class TestDeriveEffectiveConfig:
    """(ref: TestDeriveEffectiveFilterConfig :1107 +
    TestDeriveAdaptiveFilterResultDeepCopiesFilterOrder :1021)."""

    def test_caller_overrides_carry_into_derived(self):
        base = default_filter_config()
        base.loudnorm.target_i = -18.0
        base.noise_reduction.afftdn_noise_reduction = 9.0
        derived = derive_effective_config(base)
        assert derived.loudnorm.target_i == -18.0
        assert derived.noise_reduction.afftdn_noise_reduction == 9.0
        assert derived.filter_order == base.filter_order

    def test_derive_never_mutates_base(self):
        base = default_filter_config()
        base.loudnorm.target_i = -18.0
        base.noise_reduction.afftdn_noise_reduction = 9.0
        derived = derive_effective_config(base)
        derived.loudnorm.target_i = -10.0
        derived.noise_reduction.afftdn_noise_reduction = 3.0
        derived.noise_reduction.afftdn_band_noise.append(1.25)
        derived.speech_gate.threshold = 0.5
        derived.resample.sample_rate = 32000
        assert base.loudnorm.target_i == -18.0
        assert base.noise_reduction.afftdn_noise_reduction == 9.0
        assert base.noise_reduction.afftdn_band_noise == []
        assert base.speech_gate.threshold == default_filter_config().speech_gate.threshold
        assert base.resample.sample_rate == 44100

    def test_two_derives_are_independent(self):
        base = default_filter_config()
        a = derive_effective_config(base)
        b = derive_effective_config(base)
        a.noise_reduction.afftdn_band_noise = [1.0, 2.0]
        a.deesser.intensity = 0.7
        assert b.noise_reduction.afftdn_band_noise == []
        assert b.deesser.intensity == 0.0


class TestAdaptAssemblesEffective:
    """(ref: TestAssembleEffectiveFilterConfig :1068) — adaptation writes
    land on the effective copy; caller-set targets survive; the base is
    untouched; per-file reasons surface on the diagnostics."""

    def _measurements(self) -> AudioMeasurements:
        from jivetalking_tpu.analysis.types import (
            GateStatistics,
            NoiseProfile,
            Region,
            RegionSample,
            SpeechCandidate,
        )
        from jivetalking_tpu.metering.spectral import SpectralMetrics

        m = AudioMeasurements()
        m.loudness.input_i = -25.0
        m.loudness.input_lra = 10.0
        m.dynamics.rms_level = -28.0
        m.dynamics.peak_level = -6.0
        m.noise.floor = -60.0
        m.noise.voice_activated = False
        sp = SpeechCandidate(region=Region(0.0, 60.0),
                             sample=RegionSample(rms_level=-24.0))
        sp.body_band_rms = -30.0
        sp.sib_band_rms = -40.0
        sp.bands_measured = True
        m.vad.speech_profile = sp
        m.vad.noise_profile = NoiseProfile(
            start=100.0, duration=10.0, measured_noise_floor=-60.0,
            peak_level=-55.0, crest_factor=10.0,
            spectral=SpectralMetrics(flatness=0.6, found=True),
            band_noise=[-60.0] * 15, bands_measured=True,
        )
        m.vad.gate_stats = GateStatistics(
            voiced_low_percentile=-30.0, noise_high_percentile=-55.0,
            separation_db=25.0,
        )
        return m

    def test_adaptation_mutates_effective_only(self):
        base = default_filter_config()
        base.loudnorm.target_i = -18.0
        base_gate_thr = base.speech_gate.threshold
        eff, diag = adapt_config(base, self._measurements())
        # adaptation moved the gate threshold (voiced p10 − 6 dB path)
        assert eff.speech_gate.threshold != base_gate_thr
        # caller-owned target survives onto the effective copy
        assert eff.loudnorm.target_i == -18.0
        # and the base is untouched
        assert base.speech_gate.threshold == base_gate_thr
        assert base.noise_reduction.afftdn_noise_floor == 0.0
        assert base.loudnorm.target_i == -18.0

    def test_adaptation_diagnostics_carry_per_file_state(self):
        base = default_filter_config()
        _eff, diag = adapt_config(base, self._measurements())
        assert isinstance(diag, AdaptiveDiagnostics)
        assert diag.speech_gate_quiet_speech_estimate != 0.0
        # the config never grew a clamp-reason field
        assert not hasattr(base.speech_gate, "clamp_reason")

    def test_repeated_adapt_from_one_base_is_deterministic(self):
        base = default_filter_config()
        m = self._measurements()
        eff1, _d1 = adapt_config(base, m)
        eff2, _d2 = adapt_config(base, m)
        assert eff1 == eff2


class TestChainDefaultComposition:
    """(ref: TestBuildFilterSpecBehaviourBaseline "default pass 2 chain"
    :297) — the reference pins the FULL default spec string; this pins the
    same thing at the op boundary: one chain call, every stage present in
    order with every default parameter value."""

    @pytest.fixture()
    def spy(self, monkeypatch):
        calls: list[tuple[str, dict]] = []

        def record(name):
            def fn(x, *a, **k):
                calls.append((name, dict(k)))
                return x
            return fn

        monkeypatch.setattr(pass2, "apply_nlm", record("anlmdn"))
        monkeypatch.setattr(pass2, "apply_spectral_gate", record("afftdn"))
        monkeypatch.setattr(pass2, "apply_gate", record("agate"))
        monkeypatch.setattr(pass2, "apply_compressor", record("acompressor"))
        monkeypatch.setattr(pass2, "apply_deesser", record("deesser"))

        def fake_sosfilt(sos, x, ir_len=1024):
            calls.append(("biquads", {"n_sections": int(np.asarray(sos).shape[0])}))
            return x

        monkeypatch.setattr(pass2, "sosfilt_fir", fake_sosfilt)
        return calls

    def test_default_chain_full_parameter_table(self, spy):
        apply_filter_chain(np.zeros(256, np.float32), SR, default_filter_config())
        assert [n for n, _ in spy] == [
            "biquads", "anlmdn", "afftdn", "agate", "acompressor"]
        by = dict(spy)
        assert by["biquads"] == {"n_sections": 2}
        assert by["anlmdn"] == {
            "strength": 0.00001, "patch_sec": 0.0060,
            "research_sec": 0.0020, "smooth": 3.0}
        assert by["afftdn"] == {
            "nr_db": 12.0, "nf_db": -50.0, "band_shape_db": None,
            "track_noise": True}
        assert by["agate"]["threshold"] == 0.01
        assert by["agate"]["ratio"] == 2.0
        assert by["agate"]["attack_ms"] == 5.0
        assert by["agate"]["release_ms"] == 200.0
        assert by["agate"]["range_lin"] == pytest.approx(0.1995, abs=3e-4)
        assert by["agate"]["knee"] == 3.0
        assert by["agate"]["detection_rms"] is True
        assert by["agate"]["makeup"] == 1.0
        assert by["acompressor"]["threshold_db"] == -18.0
        assert by["acompressor"]["ratio"] == 3.0
        assert by["acompressor"]["attack_ms"] == 10.0
        assert by["acompressor"]["release_ms"] == 200.0
        assert by["acompressor"]["knee"] == 4.0
        assert by["acompressor"]["makeup"] == pytest.approx(1.0)
        assert by["acompressor"]["mix"] == 1.0
        # de-esser absent at the default i=0 (ref: "de-esser disabled" row)
        assert "deesser" not in by

    def test_pass2_order_constant_matches_reference(self):
        # (ref: Pass2FilterOrder, filters.go:58-68)
        assert PASS2_FILTER_ORDER == (
            "downmix", "rumble_highpass", "bandlimit_lowpass",
            "noise_reduction", "speech_gate", "levelling_compressor",
            "deesser", "analysis", "resample")


class TestBiquadDesignPassThrough:
    """(ref: TestBuildRumbleHighpassFilter :468 "custom frequency" rows +
    TestBuildBandlimitLowPassFilter :570 "low-pass enabled" tuned row) —
    the configured corner frequency and Q reach the designers."""

    @pytest.fixture()
    def design_spy(self, monkeypatch):
        seen = {}
        real_hp, real_lp = pass2.design_highpass, pass2.design_lowpass

        def hp(freq, sr, q=0.707):
            seen["hp"] = (freq, sr, q)
            return real_hp(freq, sr, q=q)

        def lp(freq, sr, q=0.707):
            seen["lp"] = (freq, sr, q)
            return real_lp(freq, sr, q=q)

        monkeypatch.setattr(pass2, "design_highpass", hp)
        monkeypatch.setattr(pass2, "design_lowpass", lp)
        monkeypatch.setattr(pass2, "sosfilt_fir", lambda sos, x, ir_len=1024: x)
        return seen

    def test_custom_corners_reach_designers(self, design_spy):
        cfg = default_filter_config()
        cfg.rumble_highpass.frequency = 65.0
        cfg.rumble_highpass.width = 0.5
        cfg.bandlimit_lowpass.frequency = 14500.0
        cfg.bandlimit_lowpass.width = 0.5
        cfg.noise_reduction.enabled = False
        cfg.speech_gate.enabled = False
        cfg.levelling_compressor.enabled = False
        cfg.deesser.enabled = False
        apply_filter_chain(np.zeros(256, np.float32), SR, cfg)
        assert design_spy["hp"] == (65.0, SR, 0.5)
        assert design_spy["lp"] == (14500.0, SR, 0.5)

    def test_default_corners(self, design_spy):
        cfg = default_filter_config()
        cfg.noise_reduction.enabled = False
        cfg.speech_gate.enabled = False
        cfg.levelling_compressor.enabled = False
        cfg.deesser.enabled = False
        apply_filter_chain(np.zeros(256, np.float32), SR, cfg)
        assert design_spy["hp"] == (80.0, SR, 0.707)
        assert design_spy["lp"] == (20500.0, SR, 0.707)


class TestTunedVariantRows:
    """(ref: TestBuildFilterSpecBehaviourBaseline "gate tuned" :338 and
    "levelling compressor high-crest tuned values" :357) — the exact tuned
    rows the reference pins as spec strings, at the op boundary."""

    @pytest.fixture()
    def spy(self, monkeypatch):
        calls: list[tuple[str, dict]] = []

        def record(name):
            def fn(x, *a, **k):
                calls.append((name, dict(k)))
                return x
            return fn

        monkeypatch.setattr(pass2, "apply_gate", record("agate"))
        monkeypatch.setattr(pass2, "apply_compressor", record("acompressor"))
        monkeypatch.setattr(pass2, "apply_nlm", record("anlmdn"))
        monkeypatch.setattr(pass2, "apply_spectral_gate", record("afftdn"))
        monkeypatch.setattr(pass2, "sosfilt_fir", lambda sos, x, ir_len=1024: x)
        return calls

    def test_gate_tuned_row(self, spy):
        cfg = default_filter_config()
        cfg.speech_gate.threshold = 0.003162
        cfg.speech_gate.ratio = 3.5
        cfg.speech_gate.attack = 10.5
        cfg.speech_gate.release = 425.0
        cfg.speech_gate.range = 0.0316
        cfg.speech_gate.knee = 4.5
        cfg.speech_gate.detection = "peak"
        cfg.speech_gate.makeup = 1.2
        apply_filter_chain(np.zeros(64, np.float32), SR, cfg)
        k = dict(spy)["agate"]
        assert k == {
            "threshold": 0.003162, "ratio": 3.5, "attack_ms": 10.5,
            "release_ms": 425.0, "range_lin": 0.0316, "knee": 4.5,
            "makeup": 1.2, "detection_rms": False}

    def test_compressor_high_crest_tuned_row(self, spy):
        cfg = default_filter_config()
        cfg.levelling_compressor.threshold = -30.0
        cfg.levelling_compressor.ratio = 4.0
        cfg.levelling_compressor.attack = 10.0
        cfg.levelling_compressor.release = 60.0
        cfg.levelling_compressor.makeup = 0.0
        cfg.levelling_compressor.knee = 6.0
        cfg.levelling_compressor.mix = 0.85
        apply_filter_chain(np.zeros(64, np.float32), SR, cfg)
        k = dict(spy)["acompressor"]
        assert k["threshold_db"] == -30.0
        assert k["ratio"] == 4.0
        assert k["release_ms"] == 60.0
        assert k["knee"] == 6.0
        assert k["mix"] == 0.85
        assert k["makeup"] == pytest.approx(1.0)  # 0 dB -> linear 1.0
