"""End-to-end pipeline tests: the minimum slice contract (SURVEY.md §7) —
a full 4-pass master must land at -16 LUFS +-0.5 LU with true peak
<= -1 dBTP (ref: filters.go:76-82, normalise.go:896-898) — plus the
normalisation maths table tests (ref: normalise_test.go tier)."""

import os

import numpy as np
import pytest

from jivetalking_tpu.adaptive import default_filter_config
from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.pipeline import (
    SilentAudioError,
    analyse_only,
    apply_normalisation,
    calculate_limiter_ceiling,
    calculate_linear_mode_target,
    calculate_pre_gain,
    loudnorm_internal_target_tp,
    process_audio,
)

SR = 44100


def _speechlike(dbfs, secs, seed=3, sr=SR):
    rng = np.random.default_rng(seed)
    n_notes = int(secs / 0.25)
    note = int(0.25 * sr)
    t = np.arange(note) / sr
    segs = [
        (10 ** ((dbfs + rng.uniform(-3, 1)) / 20)) * np.sin(2 * np.pi * f * t)
        for f in rng.choice([400, 700, 1100, 1600, 2200], n_notes)
    ]
    return np.concatenate(segs)[: int(secs * sr)].astype(np.float32)


def _noise(dbfs, secs, seed=0, sr=SR):
    rng = np.random.default_rng(seed)
    return (10 ** (dbfs / 20.0) * rng.standard_normal(int(secs * sr))).astype(np.float32)


@pytest.fixture(scope="module")
def podcast_fixture():
    """45 s programme: speech blocks + room tone, quiet capture (-26 dBFS)."""
    return np.concatenate([
        _speechlike(-26.0, 15.0, seed=3),
        _noise(-58.0, 12.0, seed=1),
        _speechlike(-26.0, 15.0, seed=4),
        _noise(-58.0, 3.0, seed=2),
    ])


class TestNormalisationMaths:
    def test_limiter_ceiling_not_needed(self):
        # projected TP below target: no limiting
        ceiling, needed, clamped = calculate_limiter_ceiling(-20.0, -8.0, -16.0, -1.0)
        assert not needed and not clamped

    def test_limiter_ceiling_derivation(self):
        # gain +8 dB, TP -3 -> projected +5 > -1 -> ceiling = -1 - 8 = -9
        ceiling, needed, clamped = calculate_limiter_ceiling(-24.0, -3.0, -16.0, -1.0)
        assert needed and not clamped
        assert ceiling == pytest.approx(-9.0)

    def test_limiter_ceiling_clamp_and_pregain(self):
        # gain +30 dB -> ideal ceiling -31 < -24 -> clamped; pre-gain = 7
        ceiling, needed, clamped = calculate_limiter_ceiling(-46.0, -3.0, -16.0, -1.0)
        assert needed and clamped
        assert ceiling == pytest.approx(-24.0)
        pre, re_derived = calculate_pre_gain(-46.0, -16.0, -1.0)
        assert pre == pytest.approx(7.0)
        assert re_derived == pytest.approx(-24.0)

    def test_internal_tp_makes_cap_inert(self):
        # with internalTP fed to the linear guard the cap collapses to
        # desired + cushion, so desired always passes (ref: normalise.go doc)
        for mi, mtp in [(-30.0, -5.0), (-18.0, -0.5), (-40.0, -12.0)]:
            itp = loudnorm_internal_target_tp(-16.0, mtp, mi)
            eff, offset, ok = calculate_linear_mode_target(mi, mtp, -16.0, itp)
            assert ok
            assert eff == -16.0
            assert offset == pytest.approx(-16.0 - mi)

    def test_silent_audio_rejected(self):
        with pytest.raises(SilentAudioError):
            apply_normalisation(np.zeros(SR * 5, np.float32), SR, default_filter_config())


class TestNormalisationEndToEnd:
    def test_quiet_tone_reaches_target(self):
        x = _speechlike(-30.0, 20.0, seed=7)
        y, res = apply_normalisation(x, SR, default_filter_config())
        final = measure_loudness(np.asarray(y), SR)
        assert abs(final.integrated_lufs - res.effective_target_i) <= 0.5
        assert final.true_peak_db <= -1.0 + 0.05
        assert res.within_target

    def test_loud_file_brought_down(self):
        x = _speechlike(-8.0, 20.0, seed=8)
        y, res = apply_normalisation(x, SR, default_filter_config())
        final = measure_loudness(np.asarray(y), SR)
        assert abs(final.integrated_lufs - (-16.0)) <= 0.6
        assert final.true_peak_db <= -1.0 + 0.05
        assert res.gain_applied_db < 0


class TestProcessAudio:
    def test_full_master_contract(self, podcast_fixture):
        res = process_audio(podcast_fixture, SR)
        # the headline contract: -16 LUFS +-0.5, TP <= -1 dBTP
        out = res.final.loudness
        assert abs(out.integrated_lufs - res.normalisation.effective_target_i) <= 0.5
        assert out.true_peak_db <= -1.0 + 0.05
        assert res.normalisation.within_target
        # full linear target reached on this unexceptional fixture
        assert res.normalisation.effective_target_i == -16.0
        # output format: 44.1 kHz, duration preserved
        assert res.output_rate == 44100
        assert len(res.output_audio) == pytest.approx(len(podcast_fixture), rel=0.01)
        # noise floor improved by the cleanup chain (room-tone region RMS)
        if res.filtered.room_tone_sample and res.measurements.vad.elected_room_tone_sample:
            before = res.measurements.vad.elected_room_tone_sample.rms_level
            after = res.filtered.room_tone_sample.rms_level
            assert after < before + 1.0  # never raises the floor
        assert set(res.pass_timings) == {"analysis", "processing", "normalising"}

    def test_analyse_only(self, podcast_fixture):
        m, eff, diag = analyse_only(podcast_fixture, SR)
        assert m.loudness.input_i < -15.0
        assert eff.speech_gate.threshold > 0
        assert diag.bandlimit_lp_reason

    def test_fused_matches_per_op_path(self, podcast_fixture):
        """Design invariant: the fused whole-pass device program
        (pipeline/fused.py) keeps numerical parity with the per-op module
        chain — the unit-tested reference path (CLAUDE.md invariants;
        measured residual is ~-98 dBFS on this fixture)."""
        a = process_audio(podcast_fixture, SR, fused=True)
        b = process_audio(podcast_fixture, SR, fused=False)
        fa, fb = a.final.loudness, b.final.loudness
        assert abs(fa.integrated_lufs - fb.integrated_lufs) <= 0.05
        assert abs(fa.true_peak_db - fb.true_peak_db) <= 0.05
        assert abs(
            a.normalisation.gain_applied_db - b.normalisation.gain_applied_db
        ) <= 0.05
        assert abs(
            a.filtered.loudness.integrated_lufs - b.filtered.loudness.integrated_lufs
        ) <= 0.05
        n = min(len(a.output_audio), len(b.output_audio))
        d = (a.output_audio[:n].astype(np.float64)
             - b.output_audio[:n].astype(np.float64)) / 32768.0
        resid_db = 20.0 * np.log10(np.sqrt(np.mean(d * d)) + 1e-15)
        assert resid_db <= -60.0


class Test48kDelivery:
    def test_48k_int16_master_delivers_44100(self):
        """48 kHz int16 in -> 44.1 kHz s16 out through the 147/160 polyphase
        delivery resample (ref: aformat=sample_rates=44100:...:s16,
        filters.go:706-710) — the bench fixture's path."""
        sr = 48000
        rng = np.random.default_rng(5)
        secs = 20.0
        n_notes, note = int(secs / 0.25), int(0.25 * sr)
        t = np.arange(note) / sr
        segs = [
            (10 ** ((-24 + rng.uniform(-3, 1)) / 20)) * np.sin(2 * np.pi * f * t)
            for f in rng.choice([400, 700, 1100, 1600, 2200], n_notes)
        ]
        x = np.concatenate(segs)[: int(secs * sr)].astype(np.float32)
        x[int(7 * sr) : int(13 * sr)] = (
            10 ** (-56 / 20) * rng.standard_normal(int(6 * sr))
        ).astype(np.float32)
        xi = np.clip(np.round(x * 32768), -32768, 32767).astype(np.int16)

        res = process_audio(xi, sr)
        assert res.output_rate == 44100
        assert len(res.output_audio) == int(secs * sr) * 147 // 160
        assert res.output_audio.dtype == np.int16
        out = res.final.loudness
        assert abs(out.integrated_lufs - res.normalisation.effective_target_i) <= 0.5
        assert out.true_peak_db <= -1.0 + 0.05


@pytest.mark.skipif(
    not os.environ.get("JIVETALKING_SLOW_TESTS"),
    reason="rate-generality masters compile the fused programs per rate; "
           "opt in with JIVETALKING_SLOW_TESTS=1 (verified 2026-08-17: "
           "96k/32k/22.05k all deliver -16.00 LUFS within target)",
)
class TestRateGenerality:
    @pytest.mark.parametrize("sr", [96000, 32000, 22050])
    def test_any_rate_masters_to_contract(self, sr):
        rng = np.random.default_rng(0)
        x = _speechlike(-24.0, 12.0, seed=5, sr=sr)
        res = process_audio(x, sr)
        assert res.output_rate == 44100
        assert abs(res.normalisation.output_lufs + 16.0) <= 0.5
        assert res.normalisation.within_target


class TestProgressCallbacks:
    """(ref: TestProcessorSeedAndProgressCallbackBoundaries,
    processor_test.go:287): progress fractions stay in [0,1] and the
    stages arrive in pass order."""

    def test_stage_order_and_bounds(self, podcast_fixture):
        calls = []
        process_audio(podcast_fixture, SR,
                      progress=lambda st, fr: calls.append((st, fr)))
        assert calls, "no progress reported"
        stages = [s for s, _ in calls]
        # pass order: analysis before processing before normalising
        assert stages.index("analysis") < stages.index("processing")
        assert stages.index("processing") <= stages.index("normalising")
        assert all(0.0 <= f <= 1.0 for _, f in calls)
        # every stage both starts and completes, and its cadence is
        # monotone non-decreasing (ref: the 0.0 -> 0.99 -> 1.0 cadence
        # guard, TestApplyNormalisationProgressCadenceGuard,
        # normalise_test.go:937-1028)
        for st in ("analysis", "processing", "normalising"):
            fr = [f for s, f in calls if s == st]
            assert 0.0 in fr and 1.0 in fr, st
            assert fr == sorted(fr), f"{st} progress regressed: {fr}"

    def test_on_adapted_fires_with_config(self, podcast_fixture):
        seen = []
        process_audio(podcast_fixture, SR,
                      on_adapted=lambda eff, diag, m: seen.append((eff, diag, m)))
        assert len(seen) == 1
        eff, diag, m = seen[0]
        assert eff.loudnorm.target_i == -16.0
        assert m.duration > 0

    def test_on_limiter_plan_fires_and_matches_result(self, podcast_fixture):
        # the Pass-4 limiter snapshot surfaces mid-run and agrees with the
        # completed NormalisationResult (ref: the LimiterProgressMsg the
        # encoder posts during Pass 4, consumed by WithLimiterProgress —
        # summary_test.go:385)
        seen = []
        res = process_audio(
            podcast_fixture, SR,
            on_limiter_plan=lambda en, ceil: seen.append((en, ceil)))
        assert len(seen) == 1
        enabled, ceiling = seen[0]
        assert enabled == res.normalisation.limiter_enabled
        assert ceiling == pytest.approx(
            res.normalisation.limiter_ceiling_dbtp, abs=1e-4)
