"""Adaptation-layer contract tests — the behavioural port of the
reference's remaining adaptive suite (adaptive_test.go:10-277 effective-
config ownership + behaviour baseline, :277-366 band-limit, :366-524
sibilance/de-esser tables, :636-962 fixed gate parameters, :1580-1748 the
clamp pattern).

The reference's behaviour-baseline test pins the FULL adapted FFmpeg
filter string for two corpus measurement shapes; this rebuild has no
string layer, so the same two fixtures pin every adapted numeric field the
string encoded (thresholds to the same 6-figure linear values, afftdn
floors, fixed gate/compressor parameters).  anlmdn's s/p/r/m STRING
quantisation (r=0.0058, m=11) is an FFmpeg-option formatting detail of the
reference's builder, not a tuned value — the production constants behind
it (strength 1e-5, patch 6 ms, research 2 ms, smooth 3) are pinned
directly (ref: filters.go:96-99).
"""


import pytest

from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.adaptive.adapt import (
    AdaptiveDiagnostics,
    DEESS_INTENSITY_MAX,
    DEESS_INTENSITY_MID,
    tune_bandlimit_lowpass,
    tune_deesser,
    tune_speech_gate,
)
from jivetalking_tpu.adaptive.config import BANDLIMIT_LP_FREQ
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    GateStatistics,
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)
from jivetalking_tpu.metering.spectral import SpectralMetrics
from jivetalking_tpu.utils.units import clamp, db_to_linear, linear_to_db


def _warm_no_profile_measurements() -> AudioMeasurements:
    """(ref: orderIndependenceWarmNoProfileMeasurements,
    adaptive_test.go:166-186)."""
    m = AudioMeasurements()
    m.spectral = SpectralMetrics(
        centroid=6500, decrease=-0.12, skewness=1.6, kurtosis=4.0,
        flatness=0.62, flux=0.008, crest=20.0, rolloff=18000)
    m.dynamics.dynamic_range = 90.0
    m.dynamics.peak_level = -10.0
    m.loudness.input_i = -42.1
    m.loudness.input_tp = -4.9
    m.loudness.input_lra = 6.0
    m.noise.floor = -58.0
    return m


def _bright_speech_measurements() -> AudioMeasurements:
    """(ref: orderIndependenceBrightSpeechMeasurements,
    adaptive_test.go:188-233)."""
    m = AudioMeasurements()
    m.spectral = SpectralMetrics(
        centroid=5000, decrease=0.0, skewness=0.0, kurtosis=9.0,
        flatness=0.38, flux=0.002, crest=45.0, rolloff=15000)
    m.dynamics.dynamic_range = 32.0
    m.dynamics.peak_level = -6.0
    m.dynamics.rms_level = -30.0  # below speech RMS: the floor stays inert
    m.dynamics.zero_crossings_rate = 0.05
    m.loudness.input_i = -20.0
    m.loudness.input_tp = -2.5
    m.loudness.input_lra = 12.0
    m.noise.floor = -60.0
    m.vad.noise_profile = NoiseProfile(
        measured_noise_floor=-60.0, peak_level=-45.0, crest_factor=15.0,
        entropy=0.8)
    # wide voiced gap (21 dB): voiced p10 -34, noise p95 -55
    m.vad.gate_stats = GateStatistics(
        voiced_low_percentile=-34.0, noise_high_percentile=-55.0,
        separation_db=21.0)
    m.vad.speech_profile = SpeechCandidate(
        region=Region(0.0, 10.0),
        sample=RegionSample(
            rms_level=-24.0, crest_factor=12.0,
            spectral=SpectralMetrics(
                centroid=5000, decrease=0.0, skewness=0.0, kurtosis=9.0,
                flux=0.002, rolloff=15000)))
    return m


class TestAdaptConfigReturnsEffectiveConfig:
    """(ref: TestAdaptConfigReturnsEffectiveConfig, adaptive_test.go:10-74)
    — the base seed survives adaptation byte-for-byte; the effective copy
    is isolated; fixed-seed fields pass through unchanged."""

    def _measurements(self):
        m = AudioMeasurements()
        m.spectral = SpectralMetrics(
            centroid=5000, decrease=-0.12, skewness=1.2, kurtosis=4.0, flux=0.01)
        m.dynamics.dynamic_range = 32.0
        m.dynamics.peak_level = -8.0
        m.loudness.input_i = -28.0
        m.loudness.input_tp = -4.0
        m.loudness.input_lra = 9.0
        m.noise.floor = -60.0
        m.vad.noise_profile = NoiseProfile(
            measured_noise_floor=-50.0, entropy=0.8)
        return m

    def test_base_untouched_and_effective_isolated(self):
        base = default_filter_config()
        base.filter_order = ("deesser", "analysis")
        base.rumble_highpass.enabled = True
        base.rumble_highpass.frequency = 95.0
        base.loudnorm.target_i = -18.0

        effective, diagnostics = adapt_config(base, self._measurements())
        assert effective is not None and diagnostics is not None

        # base seed unchanged
        assert base.filter_order == ("deesser", "analysis")
        assert base.rumble_highpass.frequency == 95.0
        assert base.loudnorm.target_i == -18.0

        # effective copies the custom order but shares no state
        assert effective.filter_order == base.filter_order
        assert effective is not base
        assert effective.rumble_highpass is not base.rumble_highpass
        effective.rumble_highpass.frequency = 40.0
        assert base.rumble_highpass.frequency == 95.0

        # the rumble high-pass is fixed and non-adaptive: seed passthrough
        effective2, _ = adapt_config(base, self._measurements())
        assert effective2.rumble_highpass.frequency == 95.0
        assert diagnostics.bandlimit_lp_reason == "20.5 kHz band-limit (always on)"

    def test_adapt_is_pure_in_the_seed(self):
        # (ref: TestAdaptConfigSeedParameterOwnershipBoundary :147) — the
        # seed carries no per-file state: adapting B after A equals
        # adapting B alone (full-field check; the order-independence suite
        # pins the adaptive subset, this pins EVERYTHING)
        seed = default_filter_config()
        adapt_config(seed, _warm_no_profile_measurements())
        after_a, diag_after = adapt_config(seed, _bright_speech_measurements())
        alone, diag_alone = adapt_config(
            default_filter_config(), _bright_speech_measurements())
        assert after_a == alone
        assert diag_after == diag_alone


class TestAdaptBehaviourBaseline:
    """(ref: TestAdaptConfigFilterSpecBehaviourBaseline,
    adaptive_test.go:100-147) — every adapted field the reference's golden
    filter strings encode, pinned to the same values."""

    def test_warm_voice_without_noise_profile(self):
        cfg, diag = adapt_config(default_filter_config(), _warm_no_profile_measurements())
        # highpass=f=80 (seed default), lowpass=f=20500
        assert cfg.rumble_highpass.frequency == 80.0
        assert cfg.bandlimit_lowpass.enabled
        assert cfg.bandlimit_lowpass.frequency == 20500.0
        # anlmdn production constants (ref: filters.go:96-99)
        assert cfg.noise_reduction.strength == pytest.approx(1e-5)
        assert cfg.noise_reduction.patch_sec == pytest.approx(0.0060)
        assert cfg.noise_reduction.research_sec == pytest.approx(0.0020)
        assert cfg.noise_reduction.smooth == pytest.approx(3.0)
        # afftdn=nr=12:nt=w:tn=0:nf=-58
        assert cfg.noise_reduction.afftdn_enabled
        assert cfg.noise_reduction.afftdn_noise_reduction == pytest.approx(12.0)
        assert cfg.noise_reduction.afftdn_noise_type == "w"
        assert not cfg.noise_reduction.afftdn_track_noise
        assert cfg.noise_reduction.afftdn_noise_floor == pytest.approx(-58.0)
        # agate=threshold=0.019953 (-34 dB: floor -58 + 24 dB gap):ratio=2.0:
        #   attack=5:release=200:range=0.1995 (14 dB):knee=3.0:detection=rms
        assert cfg.speech_gate.threshold == pytest.approx(0.019953, abs=5e-7)
        assert cfg.speech_gate.ratio == 2.0
        assert cfg.speech_gate.attack == 5.0
        assert cfg.speech_gate.release == 200.0
        assert cfg.speech_gate.range == pytest.approx(0.1995, abs=5e-5)
        assert cfg.speech_gate.knee == 3.0
        assert cfg.speech_gate.detection == "rms"
        # acompressor=threshold=0.031623 (-30 dB: peak -10 fallback - 20):
        #   ratio=3.0:attack=10:release=200:knee=4.0:mix=1.00
        assert db_to_linear(cfg.levelling_compressor.threshold) == pytest.approx(0.031623, abs=5e-7)
        assert cfg.levelling_compressor.ratio == 3.0
        assert cfg.levelling_compressor.attack == 10.0
        assert cfg.levelling_compressor.release == 200.0
        assert cfg.levelling_compressor.knee == 4.0
        assert cfg.levelling_compressor.mix == 1.0
        # no speech profile -> de-esser stays off (absent from the golden spec)
        assert cfg.deesser.intensity == 0.0

    def test_bright_speech_with_noise_profile(self):
        cfg, diag = adapt_config(default_filter_config(), _bright_speech_measurements())
        # afftdn nf=-60 from the elected room tone's floor
        assert cfg.noise_reduction.afftdn_noise_floor == pytest.approx(-60.0)
        assert cfg.noise_reduction.afftdn_noise_type == "w"  # bands unmeasured
        # agate threshold=0.010000: voiced p10 -34 minus the 6 dB margin
        assert cfg.speech_gate.threshold == pytest.approx(0.010000, abs=5e-7)
        assert cfg.speech_gate.ratio == 2.0  # LRA 12 under the 15 LU wide bar
        assert cfg.speech_gate.range == pytest.approx(0.1995, abs=5e-5)  # wide gap
        assert not diag.speech_gate_narrow_gap
        # acompressor threshold=0.177828 (-15 dB: speech RMS -24 + 9)
        assert db_to_linear(cfg.levelling_compressor.threshold) == pytest.approx(0.177828, abs=5e-7)
        # speech profile with UNMEASURED bands -> de-esser guard keeps OFF
        assert cfg.deesser.intensity == 0.0


class TestTuneBandlimitLowPass:
    """(ref: TestTuneBandlimitLowPass, adaptive_test.go:277-366) — the
    band-limit is unconditional: 20.5 kHz / 2 poles / mix 1.0 for every
    content profile; no adaptive branch survives."""

    CASES = [
        ("clean podcast speech", 9.2, 0.38, 0.002, 45.0, 8809, 3736, -5.66e-05, 0.052),
        ("speech with ultrasonic content", 8.0, 0.40, 0.002, 40.0, 15000, 5000, -3e-05, 0.05),
        ("music sting", 3.5, 0.61, 0.008, 18.0, 16000, 5500, -2e-05, 0.08),
        ("speech over music bed", 5.2, 0.52, 0.004, 27.0, 12000, 4200, -2e-05, 0.06),
        ("dark voice - already limited HF", 7.5, 0.42, 0.002, 35.0, 7000, 3500, -8e-06, 0.05),
        ("speech with HF noise pattern", 8.0, 0.38, 0.002, 40.0, 9000, 3500, -4e-05, 0.12),
    ]

    @pytest.mark.parametrize("name,kurt,flat,flux,crest,rolloff,centroid,slope,zcr", CASES)
    def test_always_on(self, name, kurt, flat, flux, crest, rolloff, centroid, slope, zcr):
        cfg = default_filter_config()
        diag = AdaptiveDiagnostics()
        m = AudioMeasurements()
        m.spectral = SpectralMetrics(
            kurtosis=kurt, flatness=flat, flux=flux, crest=crest,
            rolloff=rolloff, centroid=centroid, slope=slope)
        m.dynamics.zero_crossings_rate = zcr

        tune_bandlimit_lowpass(cfg, diag, m)

        assert cfg.bandlimit_lowpass.enabled, name
        assert cfg.bandlimit_lowpass.frequency == BANDLIMIT_LP_FREQ, name
        assert cfg.bandlimit_lowpass.poles == 2, name
        assert cfg.bandlimit_lowpass.mix == 1.0, name
        assert diag.bandlimit_lp_reason == "20.5 kHz band-limit (always on)", name


class TestTuneDeesser:
    """(ref: TestTuneDeesser + TestSibilanceExcessDB,
    adaptive_test.go:366-524) — piecewise intensity ramp over the
    sibilance excess (sib RMS - body RMS), with the no-profile and
    unmeasured-bands guards."""

    CASES = [
        # (name, body, sib, has_profile, bands_measured, want, tol)
        ("no speech profile - OFF", 0.0, 0.0, False, False, 0.0, 0.0),
        ("clean voice, large body excess - OFF", -20.0, -40.0, True, True, 0.0, 0.0),
        ("boundary: exactly at OFF bar (-6)", -20.0, -26.0, True, True, 0.0, 0.0),
        ("lower ramp midpoint (-4.5)", -20.0, -24.5, True, True, 0.30, 0.001),
        ("mid breakpoint (-3)", -20.0, -23.0, True, True, 0.6, 0.001),
        ("upper ramp midpoint (-1.5)", -20.0, -21.5, True, True, 0.725, 0.001),
        ("cap bar (0)", -20.0, -20.0, True, True, 0.85, 0.001),
        ("above cap (sibilant rivals body)", -20.0, -16.0, True, True, 0.85, 0.001),
        ("unmeasured bands -> OFF", 0.0, 0.0, True, False, 0.0, 0.0),
    ]

    @pytest.mark.parametrize("name,body,sib,has_profile,measured,want,tol", CASES)
    def test_intensity(self, name, body, sib, has_profile, measured, want, tol):
        cfg = default_filter_config()
        cfg.deesser.intensity = 0.0
        m = AudioMeasurements()
        if has_profile:
            m.vad.speech_profile = SpeechCandidate(
                region=Region(0.0, 10.0), sample=RegionSample(),
                body_band_rms=body, sib_band_rms=sib, bands_measured=measured)

        tune_deesser(cfg, m)
        assert cfg.deesser.intensity == pytest.approx(want, abs=max(tol, 1e-12)), name

    def test_ramp_endpoints_pinned(self):
        assert DEESS_INTENSITY_MID == 0.6
        assert DEESS_INTENSITY_MAX == 0.85

    @pytest.mark.parametrize(
        "name,sib,body,want",
        [("sib above body", -12.0, -18.0, 6.0),
         ("sib below body", -24.0, -18.0, -6.0),
         ("equal bands", -15.0, -15.0, 0.0)])
    def test_sibilance_excess_db(self, name, sib, body, want):
        # (ref: TestSibilanceExcessDB :366) — excess = sib - body in dB
        sp = SpeechCandidate(
            region=Region(0.0, 1.0), sample=RegionSample(),
            sib_band_rms=sib, body_band_rms=body, bands_measured=True)
        assert sp.sib_band_rms - sp.body_band_rms == want, name


class TestTuneSpeechGateFixedParams:
    """(ref: TestTuneSpeechGate subtests, adaptive_test.go:636-962) — the
    collapsed fixed parameters: attack 5 ms, release 200 ms, knee 3.0,
    detection rms regardless of content; ratio flips only on the 15 LU LRA
    bar; range emits exactly two depths keyed on the narrow-gap signal."""

    def _gate(self, m):
        cfg = default_filter_config()
        diag = AdaptiveDiagnostics()
        tune_speech_gate(cfg, diag, m)
        return cfg, diag

    @pytest.mark.parametrize("lra,want_ratio", [
        (8.0, 2.0), (14.9, 2.0), (15.0, 2.0), (15.1, 1.5), (20.0, 1.5)])
    def test_ratio_lra_bar(self, lra, want_ratio):
        m = _warm_no_profile_measurements()
        m.loudness.input_lra = lra
        cfg, _ = self._gate(m)
        assert cfg.speech_gate.ratio == want_ratio

    def test_fixed_params_any_content(self):
        for m in (_warm_no_profile_measurements(), _bright_speech_measurements()):
            cfg, _ = self._gate(m)
            assert cfg.speech_gate.attack == 5.0
            assert cfg.speech_gate.release == 200.0
            assert cfg.speech_gate.knee == 3.0
            assert cfg.speech_gate.detection == "rms"

    @pytest.mark.parametrize("separation,want_depth", [
        (21.0, 14.0), (12.0, 14.0), (11.9, 8.0), (5.0, 8.0)])
    def test_range_two_fixed_depths(self, separation, want_depth):
        m = _bright_speech_measurements()
        m.vad.gate_stats.separation_db = separation
        cfg, diag = self._gate(m)
        assert diag.speech_gate_depth_db == want_depth
        assert cfg.speech_gate.range == pytest.approx(db_to_linear(-want_depth))
        # neither depth is ever a full mute
        assert cfg.speech_gate.range > 0.0

    def test_nil_noise_profile_does_not_panic(self):
        # (ref: "Should not panic ... still calculate threshold from noise
        # floor, detection defaults to RMS")
        m = _warm_no_profile_measurements()
        assert m.vad.noise_profile is None
        cfg, _ = self._gate(m)
        assert cfg.speech_gate.detection == "rms"
        assert 0.0 < cfg.speech_gate.threshold < 1.0

    def test_wide_separation_diagnostics(self):
        # voiced p10 -35, noise p95 -62 -> separation 27, threshold -41,
        # narrow-gap stays false (ref: adaptive_test.go:886-912)
        m = _bright_speech_measurements()
        m.vad.gate_stats = GateStatistics(
            voiced_low_percentile=-35.0, noise_high_percentile=-62.0,
            separation_db=27.0)
        cfg, diag = self._gate(m)
        assert linear_to_db(cfg.speech_gate.threshold) == pytest.approx(-41.0, abs=0.01)
        assert not diag.speech_gate_narrow_gap
        assert diag.speech_gate_quiet_speech_estimate == -35.0
        assert diag.speech_gate_speech_separation == 27.0
        assert diag.speech_gate_threshold_unclamped == pytest.approx(-41.0)
        assert diag.speech_gate_speech_headroom == pytest.approx(6.0, abs=0.01)
        assert diag.speech_gate_clamp_reason == "none"

    def test_no_profile_diagnostics_stay_zero(self):
        # (ref: "No SpeechProfile: the voiced-anchored diagnostics stay
        # zero and the no-profile threshold path runs")
        cfg, diag = self._gate(_warm_no_profile_measurements())
        assert diag.speech_gate_quiet_speech_estimate == 0.0
        assert diag.speech_gate_speech_separation == 0.0
        assert diag.speech_gate_threshold_unclamped == 0.0
        assert diag.speech_gate_clamp_reason == ""


class TestClampPattern:
    """(ref: TestClamp, adaptive_test.go:1580-1748) — the shared clamp
    helper the tuners build on, including the real-world parameter ranges."""

    CASES = [
        ("within range", 50.0, 0.0, 100.0, 50.0),
        ("at min boundary", 0.0, 0.0, 100.0, 0.0),
        ("at max boundary", 100.0, 0.0, 100.0, 100.0),
        ("below min", -10.0, 0.0, 100.0, 0.0),
        ("far below min", -1000.0, 0.0, 100.0, 0.0),
        ("above max", 150.0, 0.0, 100.0, 100.0),
        ("far above max", 1e10, 0.0, 100.0, 100.0),
        ("negative range - within", -25.0, -40.0, -10.0, -25.0),
        ("negative range - below", -50.0, -40.0, -10.0, -40.0),
        ("negative range - above", 0.0, -40.0, -10.0, -10.0),
        ("single point - equals", 42.0, 42.0, 42.0, 42.0),
        ("single point - below", 10.0, 42.0, 42.0, 42.0),
        ("single point - above", 100.0, 42.0, 42.0, 42.0),
        ("highpass freq below min", 30.0, 60.0, 120.0, 60.0),
        ("highpass freq above max", 200.0, 60.0, 120.0, 120.0),
        ("noise reduction below min", 2.0, 6.0, 40.0, 6.0),
        ("noise reduction above max", 60.0, 6.0, 40.0, 40.0),
        ("deess intensity below min", -0.1, 0.0, 0.6, 0.0),
        ("deess intensity above max", 0.9, 0.0, 0.6, 0.6),
    ]

    @pytest.mark.parametrize("name,val,lo,hi,want", CASES)
    def test_vectors(self, name, val, lo, hi, want):
        assert clamp(val, lo, hi) == want, name


class TestGateFixedParamInvarianceMatrices:
    """(ref: TestTuneSpeechGate's 'attack is fixed' :668, 'detection is
    fixed rms' :698, 'knee is fixed' :733, 'release is fixed regardless of
    flux, ZCR, and LRA' :841 subtables) — the collapsed gate basis: none
    of the former adaptive inputs (transients, flux, ZCR, room-tone
    entropy/crest, spectral crest, LRA) moves attack/release/knee/
    detection any more.  Every reference row reproduced."""

    def _gate(self, m):
        cfg = default_filter_config()
        tune_speech_gate(cfg, AdaptiveDiagnostics(), m)
        return cfg.speech_gate

    @pytest.mark.parametrize("name,max_diff,flux", [
        ("sharp transients", 0.3, 1.0),
        ("gentle low flux", 0.05, 0.02),
        ("moderate flux", 0.15, 0.1),
    ])
    def test_attack_fixed_across_transient_profiles(self, name, max_diff, flux):
        m = AudioMeasurements()
        m.spectral = SpectralMetrics(flux=flux)
        m.dynamics.max_difference = max_diff
        m.noise.floor = -55.0
        assert self._gate(m).attack == 5.0, name

    @pytest.mark.parametrize("name,entropy,crest", [
        ("tonal noise", 0.2, 10.0),
        ("transient bleed", 0.5, 28.0),
        ("would-be-clean recording", 0.8, 8.0),
    ])
    def test_detection_fixed_rms_across_room_tones(self, name, entropy, crest):
        m = AudioMeasurements()
        m.noise.floor = -55.0
        m.vad.noise_profile = NoiseProfile(
            peak_level=-55.0, crest_factor=crest, entropy=entropy)
        assert self._gate(m).detection == "rms", name

    @pytest.mark.parametrize("name,crest", [
        ("high crest", 40.0),
        ("moderate crest", 25.0),
        ("low crest", 10.0),
    ])
    def test_knee_fixed_across_spectral_crest(self, name, crest):
        m = AudioMeasurements()
        m.spectral = SpectralMetrics(crest=crest)
        m.noise.floor = -55.0
        m.loudness.input_lra = 15.0
        assert self._gate(m).knee == 3.0, name

    @pytest.mark.parametrize("name,flux,zcr,lra", [
        ("sustained speech, wide LRA", 0.005, 0.05, 15.0),
        ("standard speech, wide LRA", 0.02, 0.20, 15.0),
        ("sustained speech, very low LRA", 0.005, 0.05, 7.0),
        ("standard speech, low LRA", 0.02, 0.20, 9.0),
    ])
    def test_release_fixed_across_flux_zcr_lra(self, name, flux, zcr, lra):
        m = AudioMeasurements()
        m.spectral = SpectralMetrics(flux=flux)
        m.dynamics.zero_crossings_rate = zcr
        m.noise.floor = -55.0
        m.loudness.input_lra = lra
        m.vad.noise_profile = NoiseProfile(
            peak_level=-50.0, crest_factor=15.0, entropy=0.005)
        assert self._gate(m).release == 200.0, name

    def test_no_profile_safety_path_threshold_in_bounds(self):
        # (ref: TestTuneSpeechGateNewBasis 'no profile: no-profile safety
        # path cannot place an in-speech threshold' :1106) — with no
        # voiced population the threshold anchors to the noise floor and
        # stays inside the global clamps
        from jivetalking_tpu.adaptive.adapt import (
            GATE_THRESHOLD_MAX_DB,
            GATE_THRESHOLD_MIN_DB,
        )

        m = AudioMeasurements()
        m.loudness.input_i = -22.0
        m.loudness.input_lra = 14.0
        m.noise.floor = -55.0
        cfg = default_filter_config()
        diag = AdaptiveDiagnostics()
        tune_speech_gate(cfg, diag, m)
        got_db = linear_to_db(cfg.speech_gate.threshold)
        assert GATE_THRESHOLD_MIN_DB <= got_db <= GATE_THRESHOLD_MAX_DB
        # voiced-anchored diagnostics stay fresh on the no-profile path
        assert not diag.speech_gate_narrow_gap
        assert diag.speech_gate_quiet_speech_estimate == 0.0
        assert diag.speech_gate_speech_separation == 0.0
        # the no-profile path keeps the full fixed depth
        assert diag.speech_gate_depth_db == 14.0
