"""Kernel tests for the Pass-2 DSP ops: dynamics, limiter, spectral gate,
NLM, de-esser, resampler, declick.  Mirrors the reference's behaviour
contracts (output metering, not bit-exactness — SURVEY.md §7)."""

import numpy as np
import pytest

from jivetalking_tpu.ops import (
    apply_compressor,
    apply_declick,
    apply_deesser,
    apply_gate,
    apply_limiter,
    apply_nlm,
    apply_spectral_gate,
    attack_release_follower,
    resample,
)

SR = 44100


def sine(freq, dbfs, secs, sr=SR):
    amp = 10.0 ** (dbfs / 20.0)
    t = np.arange(int(secs * sr), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def rms_db(x):
    r = float(np.sqrt(np.mean(np.asarray(x, dtype=np.float64) ** 2)))
    return 20 * np.log10(max(r, 1e-12))


class TestFollower:
    def test_matches_sequential_reference(self):
        # ground truth: the per-sample data-dependent recurrence in numpy
        rng = np.random.default_rng(0)
        d = np.abs(rng.standard_normal(4000)).astype(np.float32)
        ca, cr = 0.05, 0.002
        y_ref = np.zeros_like(d)
        y = 0.0
        for i, v in enumerate(d):
            c = ca if v > y else cr
            y = y + (v - y) * c
            y_ref[i] = y
        y_par = np.asarray(attack_release_follower(d, ca, cr))
        # the fixed point converges exactly (float32 tolerance only)
        err = np.abs(y_par - y_ref) / (np.abs(y_ref) + 1e-6)
        assert np.percentile(err, 99) < 1e-3
        assert np.median(err) < 1e-4

    def test_rises_fast_falls_slow(self):
        d = np.concatenate([np.zeros(1000), np.ones(1000), np.zeros(2000)]).astype(np.float32)
        y = np.asarray(attack_release_follower(d, 0.1, 0.005))
        assert y[1100] > 0.9          # reached within ~100 samples of attack
        assert y[2100] > 0.5          # still decaying 100 samples in
        assert y[3900] < 0.05         # eventually released


class TestGate:
    def test_attenuates_noise_passes_speech(self):
        loud = sine(1000, -20.0, 1.0)
        quiet = sine(1000, -60.0, 1.0)
        x = np.concatenate([loud, quiet, loud])
        thr = 10 ** (-40 / 20.0)
        y = np.asarray(apply_gate(x, SR, threshold=thr, ratio=2.0,
                                  range_lin=10 ** (-14 / 20.0)))
        n = len(loud)
        # loud section ~unchanged
        assert abs(rms_db(y[n // 2 : n]) - rms_db(x[n // 2 : n])) < 0.5
        # quiet section attenuated toward the 14 dB range floor
        mid = slice(n + n // 2, 2 * n)
        drop = rms_db(x[mid]) - rms_db(y[mid])
        assert 8.0 < drop < 15.0

    def test_range_floor_respected(self):
        x = sine(1000, -70.0, 1.0)
        y = np.asarray(apply_gate(x, SR, threshold=10 ** (-40 / 20.0),
                                  range_lin=10 ** (-14 / 20.0)))
        drop = rms_db(x) - rms_db(y)
        assert drop <= 14.2


class TestCompressor:
    def test_compresses_above_threshold(self):
        x = sine(1000, -10.0, 2.0)
        y = np.asarray(apply_compressor(x, SR, threshold_db=-30.0, ratio=3.0))
        # RMS -13 dB is 17 dB over threshold; 3:1 -> out ~ thr + 17/3.
        # The FFmpeg-convention detector (fast attack / slow release on x^2)
        # rides 2-3 dB ABOVE true RMS on a steady sine, adding extra gain
        # reduction -- same behaviour as acompressor, so the tolerance is
        # asymmetric toward over-compression.
        out_rms = rms_db(y[SR:])
        expected = -30.0 + (rms_db(x[SR:]) - (-30.0)) / 3.0
        assert expected - 3.0 < out_rms < expected + 0.5

    def test_below_threshold_unity(self):
        x = sine(1000, -50.0, 1.0)
        y = np.asarray(apply_compressor(x, SR, threshold_db=-20.0, ratio=3.0))
        assert abs(rms_db(y[SR // 2 :]) - rms_db(x[SR // 2 :])) < 0.2


class TestLimiter:
    def test_hard_ceiling(self):
        rng = np.random.default_rng(1)
        x = (0.9 * rng.standard_normal(2 * SR)).astype(np.float32)
        limit = 10 ** (-1.9 / 20.0)
        y = np.asarray(apply_limiter(x, SR, limit=limit, attack_ms=1.0, release_ms=50.0))
        assert float(np.max(np.abs(y))) <= limit + 1e-5

    def test_transparent_below_limit(self):
        x = sine(1000, -20.0, 1.0)
        y = np.asarray(apply_limiter(x, SR, limit=0.5, attack_ms=5.0, release_ms=100.0))
        np.testing.assert_allclose(y, x, atol=1e-5)

    def test_release_recovers(self):
        # a single loud burst then quiet: gain must recover toward unity
        x = np.concatenate([sine(1000, -1.0, 0.1), sine(1000, -30.0, 1.0)])
        y = np.asarray(apply_limiter(x, SR, limit=10 ** (-6 / 20.0),
                                     attack_ms=5.0, release_ms=50.0))
        tail = y[-SR // 2 :]
        xtail = x[-SR // 2 :]
        assert abs(rms_db(tail) - rms_db(xtail)) < 0.3


class TestSpectralGate:
    def test_reduces_noise_floor(self):
        rng = np.random.default_rng(2)
        noise = (10 ** (-50 / 20.0) * rng.standard_normal(2 * SR)).astype(np.float32)
        y = np.asarray(apply_spectral_gate(noise, SR, nr_db=12.0, nf_db=-50.0))
        drop = rms_db(noise) - rms_db(y)
        assert 6.0 < drop < 14.0

    def test_preserves_loud_tone(self):
        x = sine(1000, -20.0, 2.0)
        y = np.asarray(apply_spectral_gate(x, SR, nr_db=12.0, nf_db=-60.0))
        assert abs(rms_db(y) - rms_db(x)) < 0.5

    def test_custom_band_shape(self):
        # noise concentrated at low freq; custom shape boosts low-band model
        rng = np.random.default_rng(3)
        noise = (10 ** (-50 / 20.0) * rng.standard_normal(2 * SR)).astype(np.float32)
        shape = [12.0] * 5 + [0.0] * 10
        y = np.asarray(apply_spectral_gate(noise, SR, nr_db=12.0, nf_db=-50.0,
                                           band_shape_db=shape))
        assert rms_db(y) < rms_db(noise) - 5.0

    def test_track_noise_mode(self):
        rng = np.random.default_rng(4)
        noise = (10 ** (-50 / 20.0) * rng.standard_normal(2 * SR)).astype(np.float32)
        y = np.asarray(apply_spectral_gate(noise, SR, nr_db=12.0, track_noise=True))
        assert rms_db(y) < rms_db(noise) - 4.0


class TestNLM:
    def test_near_transparent_at_min_strength(self):
        x = sine(440, -20.0, 0.5) + sine(1200, -26.0, 0.5)
        y = np.asarray(apply_nlm(x.astype(np.float32), SR))
        assert abs(rms_db(y) - rms_db(x)) < 0.6

    def test_denoises_at_high_strength(self):
        # clean content must be low-frequency relative to the 2 ms research
        # window for NLM averaging to keep signal while cancelling noise
        rng = np.random.default_rng(5)
        clean = sine(100, -20.0, 0.5)
        noisy = clean + (10 ** (-40 / 20.0) * rng.standard_normal(len(clean))).astype(np.float32)
        y = np.asarray(apply_nlm(noisy, SR, strength=0.01))
        resid_in = rms_db(noisy - clean)
        resid_out = rms_db(np.asarray(y) - clean)
        assert resid_out < resid_in - 2.0


class TestDeesser:
    def test_zero_intensity_transparent(self):
        x = sine(7000, -20.0, 0.5)
        y = np.asarray(apply_deesser(x, SR, intensity=0.0))
        np.testing.assert_array_equal(y, x)

    def test_attenuates_sibilance(self):
        # alternating body + sibilant bursts
        body = sine(300, -20.0, 0.25)
        sib = sine(7500, -18.0, 0.25)
        x = np.concatenate([body, sib, body, sib])
        y = np.asarray(apply_deesser(x, SR, intensity=0.85))
        n = len(body)
        sib_in = rms_db(x[n : 2 * n])
        sib_out = rms_db(y[n : 2 * n])
        body_out = rms_db(y[2 * n + n // 2 : 3 * n])
        assert sib_in - sib_out > 2.0          # sibilant burst attenuated
        assert abs(body_out - rms_db(x[2 * n + n // 2 : 3 * n])) < 1.0


class TestResample:
    def test_48k_to_44k1_preserves_tone(self):
        x = sine(1000, -20.0, 1.0, sr=48000)
        y = np.asarray(resample(x, 48000, 44100))
        assert len(y) == pytest.approx(44100, abs=2)
        assert abs(rms_db(y[2000:-2000]) - rms_db(x)) < 0.1
        # frequency preserved: zero crossings per second unchanged
        zc = np.sum(np.diff(np.signbit(y[2000:-2000])) != 0) / (len(y[2000:-2000]) / 44100)
        assert zc == pytest.approx(2000.0, rel=0.01)

    def test_noop_same_rate(self):
        x = sine(1000, -20.0, 0.1)
        y = np.asarray(resample(x, 44100, 44100))
        np.testing.assert_array_equal(y, x)

    def test_no_aliasing(self):
        # 21 kHz tone must not survive 48k->44.1k (above new Nyquist)
        x = sine(21500, -20.0, 1.0, sr=48000)
        y = np.asarray(resample(x, 48000, 44100))
        assert rms_db(y[2000:-2000]) < -55.0


class TestDeclick:
    def test_transparent_without_clicks(self):
        x = sine(1000, -20.0, 0.5)
        y = np.asarray(apply_declick(x, SR))
        assert rms_db(np.asarray(y) - x) < -40.0

    def test_repairs_inserted_clicks(self):
        x = sine(200, -20.0, 0.5)
        clicked = x.copy()
        pos = [5000, 11000, 17000]
        for p in pos:
            clicked[p] = 0.9
        y = np.asarray(apply_declick(clicked, SR))
        for p in pos:
            assert abs(y[p] - x[p]) < 0.05, (p, y[p], x[p])


class TestMatmulPrecision:
    """jax's default matmul precision truncates operands to bf16; every
    audio-path dot/conv must request HIGHEST.  These pin f32-level accuracy
    so a dropped precision= regresses loudly (found 2026-08-16: the
    delivery resample was silently bf16)."""

    def test_banded_conv_is_f32_exact(self):
        from jivetalking_tpu.pipeline.fused import _fft_convolve_full, _constants_for_rate

        chain_ir, kw_ir, _, _ = _constants_for_rate(48000, 80.0, 20500.0)
        rng = np.random.default_rng(0)
        n = 50000
        x = (rng.standard_normal(n) * 0.3).astype(np.float32)
        for ir in (chain_ir, kw_ir):
            want = np.convolve(x.astype(np.float64), np.asarray(ir, np.float64))[:n]
            import jax.numpy as jnp
            got = np.asarray(_fft_convolve_full(jnp.asarray(x), ir, n))
            assert np.max(np.abs(got - want)) < 1e-5

    def test_resample_is_f32_exact(self):
        from jivetalking_tpu.ops.resample import _banded_bank, resample

        rng = np.random.default_rng(1)
        n = 48000
        x = (rng.standard_normal(n) * 0.3).astype(np.float32)
        y = np.asarray(resample(x, 48000, 44100))
        # f64 reference through the same polyphase operands + padding
        L, M = 147, 160
        B, taps = _banded_bank(L, M)
        r_rows = B.shape[0]
        n_out = n * L // M
        nq = -(-n_out // L)
        need = (nq + r_rows) * M
        xp = np.zeros(taps // 2 + n + max(0, need - n - taps // 2) + M)
        xp[taps // 2 : taps // 2 + n] = x.astype(np.float64)
        X = xp[: (nq + r_rows) * M].reshape(nq + r_rows, M)
        out = np.zeros((nq, L))
        for r in range(r_rows):
            out = out + X[r : r + nq] @ np.asarray(B[r], np.float64)
        want = out.reshape(-1)[:n_out]
        assert np.max(np.abs(y - want)) < 1e-5

    def test_nlm_output_tolerates_bf16_distances(self):
        """The NLM distance sliding-sum is the CODIFIED exception to the
        audio-path HIGHEST rule (CLAUDE.md): it runs DEFAULT/bf16 because
        it feeds only the similarity weights exp(-dist/h^2), never
        delivery samples.  On the CPU test mesh precision flags are
        no-ops, so instead of pinning sum exactness (which device bf16
        would violate) this pins the contract that actually matters: the
        END-TO-END NLM output must stay within -40 dB of a float64
        reference even when the distances carry bf16-scale (~0.4%)
        perturbation — the bound a bf16 distance field cannot break."""
        import jax.numpy as jnp

        from jivetalking_tpu.ops.nlm import apply_nlm

        rng = np.random.default_rng(2)
        sr = 44100
        n = 4000
        x = (sine(440, -20.0, n / sr) + 0.01 * rng.standard_normal(n)).astype(np.float32)

        # float64 reference of _nlm_core's exact formulation (single block)
        P = max(1, int(round(0.0060 * sr / 2.0)))
        R = max(1, int(round(0.0020 * sr / 2.0)))
        h = 0.00001 * 10000.0
        h2 = h * h / 3.0
        halo = P + R
        xp = np.zeros(n + 2 * halo)
        xp[halo : halo + n] = x.astype(np.float64)
        w_box = 2 * P + 1
        t = np.arange(n)
        y_ref_num = np.zeros(n)
        y_ref_den = np.zeros(n)
        centre = xp[R : R + n + 2 * P]
        for d in range(-R, R + 1):
            shifted = xp[R + d : R + d + n + 2 * P]
            diff2 = (centre - shifted) ** 2
            dist = np.convolve(diff2, np.ones(w_box))[w_box - 1 : w_box - 1 + n]
            valid = ((t + d) >= 0) & ((t + d) < n)
            w = np.exp(-dist / h2) * valid
            mid = shifted[P : P + n]
            y_ref_num += w * mid
            y_ref_den += w
        y_ref = y_ref_num / np.maximum(y_ref_den, 1e-12)

        got = np.asarray(apply_nlm(jnp.asarray(x), sr))
        err_db = 20 * np.log10(
            max(float(np.sqrt(np.mean((got - y_ref) ** 2))), 1e-12)
            / float(np.sqrt(np.mean(y_ref**2)))
        )
        assert err_db < -40.0, err_db

        # and a bf16-scale perturbation of the distances cannot push the
        # weights past that bound either: amplifying every distance by the
        # worst-case bf16 relative step barely moves the output
        y_pert_num = np.zeros(n)
        y_pert_den = np.zeros(n)
        for d in range(-R, R + 1):
            shifted = xp[R + d : R + d + n + 2 * P]
            diff2 = (centre - shifted) ** 2
            dist = np.convolve(diff2, np.ones(w_box))[w_box - 1 : w_box - 1 + n]
            dist = dist * (1.0 + 2.0 ** -8)     # bf16 mantissa step
            valid = ((t + d) >= 0) & ((t + d) < n)
            w = np.exp(-dist / h2) * valid
            y_pert_num += w * shifted[P : P + n]
            y_pert_den += w
        y_pert = y_pert_num / np.maximum(y_pert_den, 1e-12)
        drift_db = 20 * np.log10(
            max(float(np.sqrt(np.mean((y_pert - y_ref) ** 2))), 1e-12)
            / float(np.sqrt(np.mean(y_ref**2)))
        )
        assert drift_db < -40.0, drift_db


class TestNlmSymmetricParity:
    """The opt-in symmetric-distance NLM (JT_NLM_SYMMETRIC) must reproduce
    the direct formulation: D(t, -d) = D(t-d, +d) is an identity of the
    padded signal, so only box-sum accumulation order may differ."""

    def test_matches_direct_across_blocks(self, monkeypatch):
        import jax.numpy as jnp

        from jivetalking_tpu.ops import nlm as nlm_mod

        rng = np.random.default_rng(5)
        sr = 44100
        n = 4096
        x = (sine(300, -18.0, n / sr) + 0.02 * rng.standard_normal(n)).astype(
            np.float32
        )
        P = max(1, int(round(0.0060 * sr / 2.0)))
        R = max(1, int(round(0.0020 * sr / 2.0)))
        h2 = jnp.float32((0.00001 * 10000.0) ** 2 / 3.0)

        # small block forces multiple scan iterations: block seams exercise
        # the widened halo and the negative rows' reframed reads
        monkeypatch.setattr(nlm_mod, "_NLM_SYMMETRIC", False)
        y_direct = np.asarray(nlm_mod._nlm_core(jnp.asarray(x), h2, P, R, block=1024))
        monkeypatch.setattr(nlm_mod, "_NLM_SYMMETRIC", True)
        y_sym = np.asarray(nlm_mod._nlm_core(jnp.asarray(x), h2, P, R, block=1024))

        assert y_sym.shape == y_direct.shape
        np.testing.assert_allclose(y_sym, y_direct, atol=2e-5, rtol=0)

    def test_single_block_short_signal(self, monkeypatch):
        import jax.numpy as jnp

        from jivetalking_tpu.ops import nlm as nlm_mod

        rng = np.random.default_rng(11)
        x = rng.standard_normal(700).astype(np.float32) * 0.1
        h2 = jnp.float32(1.0)
        monkeypatch.setattr(nlm_mod, "_NLM_SYMMETRIC", False)
        a = np.asarray(nlm_mod._nlm_core(jnp.asarray(x), h2, 8, 5, block=1024))
        monkeypatch.setattr(nlm_mod, "_NLM_SYMMETRIC", True)
        b = np.asarray(nlm_mod._nlm_core(jnp.asarray(x), h2, 8, 5, block=1024))
        np.testing.assert_allclose(b, a, atol=2e-5, rtol=0)
