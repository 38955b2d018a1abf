import numpy as np
import pytest

from jivetalking_tpu.metering import (
    measure_astats,
    measure_loudness,
    measure_spectral,
    true_peak_linear,
)
from jivetalking_tpu.ops.iir import (
    design_highpass,
    design_lowpass,
    sos_impulse_response,
    sosfilt_fir,
    sosfilt_scan,
)


def sine(freq, dbfs, secs, sr, phase=0.0):
    amp = 10.0 ** (dbfs / 20.0)
    t = np.arange(int(secs * sr), dtype=np.float64) / sr
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


# ---------------------------------------------------------------------------
# IIR / FIR machinery
# ---------------------------------------------------------------------------

class TestIIR:
    def test_fir_matches_scan(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(20000).astype(np.float32)
        sos = design_highpass(80.0, 48000.0, q=0.707)
        y_scan = np.asarray(sosfilt_scan(sos, x))
        y_fir = np.asarray(sosfilt_fir(sos, x, ir_len=8192))
        np.testing.assert_allclose(y_fir, y_scan, atol=2e-4)

    def test_highpass_response(self):
        sr = 48000
        sos = design_highpass(80.0, sr, q=0.707)
        # 1 kHz passes ~unity; 20 Hz heavily attenuated
        for freq, lo, hi in [(1000.0, -0.1, 0.1), (20.0, -60.0, -18.0)]:
            x = sine(freq, -20.0, 1.0, sr)
            y = np.asarray(sosfilt_fir(sos, x))
            gain = 20 * np.log10(
                np.sqrt(np.mean(y[sr // 2 :] ** 2)) / np.sqrt(np.mean(x[sr // 2 :] ** 2))
            )
            assert lo <= gain <= hi, (freq, gain)

    def test_lowpass_response(self):
        sr = 48000
        sos = design_lowpass(1000.0, sr, q=0.707)
        x = sine(10000.0, -20.0, 1.0, sr)
        y = np.asarray(sosfilt_fir(sos, x))
        gain = 20 * np.log10(np.sqrt(np.mean(y[sr // 2 :] ** 2)) / np.sqrt(np.mean(x ** 2)) + 1e-12)
        assert gain < -35

    def test_impulse_response_decays(self):
        sos = design_highpass(80.0, 48000.0)
        ir = sos_impulse_response(sos, 8192)
        assert abs(ir[-1]) < 1e-12


# ---------------------------------------------------------------------------
# EBU R128
# ---------------------------------------------------------------------------

class TestLoudness:
    @pytest.mark.parametrize("sr", [44100, 48000])
    def test_997hz_sine_reference_level(self, sr):
        # Tech 3341 case 1 analogue: 997 Hz mono sine at -23 dBFS reads
        # -23 LUFS under the dual-mono convention (+3.01 over plain mono).
        x = sine(997.0, -23.0, 10.0, sr)
        res = measure_loudness(x, sr, dual_mono=True)
        assert abs(res.integrated_lufs - (-23.0)) < 0.1, res.integrated_lufs
        res_plain = measure_loudness(x, sr, dual_mono=False)
        assert abs(res_plain.integrated_lufs - (-26.01)) < 0.1

    def test_gain_linearity(self):
        sr = 48000
        x = sine(997.0, -23.0, 5.0, sr)
        r1 = measure_loudness(x, sr)
        r2 = measure_loudness(x * 10 ** (-10 / 20.0), sr)
        assert abs((r1.integrated_lufs - r2.integrated_lufs) - 10.0) < 0.05

    def test_lra_steady_tone_near_zero(self):
        sr = 48000
        x = sine(997.0, -23.0, 10.0, sr)
        res = measure_loudness(x, sr)
        assert res.lra_lu < 0.5

    def test_gating_ignores_silence(self):
        sr = 48000
        tone = sine(997.0, -23.0, 10.0, sr)
        silence = np.zeros(10 * sr, np.float32)
        res = measure_loudness(np.concatenate([tone, silence]), sr)
        # gated I should stay near -23 despite 50% silence
        assert abs(res.integrated_lufs - (-23.0)) < 0.3

    def test_true_peak_intersample(self):
        # peak between samples: sine at fs/4 with 45deg phase has samples at
        # +-a/sqrt(2) but true peak = a
        sr = 48000
        a = 10 ** (-6.0 / 20.0)
        t = np.arange(sr, dtype=np.float64)
        x = (a * np.sin(2 * np.pi * 0.25 * t + np.pi / 4)).astype(np.float32)
        sp = np.max(np.abs(x))
        tp = float(true_peak_linear(x))
        assert tp > sp * 1.2
        assert abs(20 * np.log10(tp) - (-6.0)) < 0.35

    def test_momentary_series_shape(self):
        sr = 48000
        x = sine(997.0, -23.0, 3.0, sr)
        res = measure_loudness(x, sr)
        # 3s -> 30 blocks -> 27 momentary windows
        assert len(res.momentary_lufs) == 27
        assert abs(res.momentary_max_lufs - (-23.0)) < 0.2


# ---------------------------------------------------------------------------
# astats
# ---------------------------------------------------------------------------

class TestAstats:
    def test_sine_levels(self):
        sr = 48000
        x = sine(1000.0, -20.0, 2.0, sr)
        r = measure_astats(x, sr)
        assert abs(r.rms_level - (-23.01)) < 0.05
        assert abs(r.peak_level - (-20.0)) < 0.05
        assert abs(r.crest_factor - np.sqrt(2)) < 0.01
        assert abs(r.dc_offset) < 1e-4
        # 1 kHz sine at 48 kHz: 2000 crossings/sec -> rate ~2000/48000
        assert abs(r.zero_crossings_rate - 2000.0 / 48000.0) < 1e-3
        assert r.number_of_samples == 2 * sr

    def test_noise_floor_tracks_quiet_window(self):
        sr = 48000
        rng = np.random.default_rng(0)
        loud = (rng.standard_normal(sr) * 0.1).astype(np.float32)
        quiet = (rng.standard_normal(sr) * 0.001).astype(np.float32)
        x = np.concatenate([loud, quiet, loud])
        r = measure_astats(x, sr)
        # noise floor = min sliding-window local peak ~ peak of quiet section
        assert -65 < r.noise_floor < -40

    def test_rms_trough_vs_peak(self):
        sr = 48000
        x = np.concatenate([sine(1000, -40.0, 1.0, sr), sine(1000, -10.0, 1.0, sr)])
        r = measure_astats(x, sr)
        assert abs(r.rms_trough - (-43.01)) < 0.2
        assert abs(r.rms_peak - (-13.01)) < 0.2

    def test_entropy_noise_vs_tone(self):
        sr = 48000
        rng = np.random.default_rng(0)
        noise = (rng.uniform(-0.5, 0.5, sr)).astype(np.float32)
        tone = sine(100.0, -6.0, 1.0, sr)
        rn = measure_astats(noise, sr)
        rt = measure_astats(tone, sr)
        assert rn.entropy > rt.entropy


# ---------------------------------------------------------------------------
# aspectralstats
# ---------------------------------------------------------------------------

class TestSpectral:
    def test_centroid_tracks_tone(self):
        sr = 48000
        x = sine(2000.0, -20.0, 2.0, sr)
        m = measure_spectral(x, sr)
        assert m.found
        assert abs(m.centroid - 2000.0) < 100.0
        assert m.crest > 50  # tonal spectrum is peaky
        assert m.flatness < 0.2

    def test_white_noise_flatness(self):
        sr = 48000
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(2 * sr) * 0.1).astype(np.float32)
        m = measure_spectral(x, sr)
        assert m.flatness > 0.5
        assert 0.3 < m.rolloff / (0.85 * sr / 2) < 1.2

    def test_rolloff_of_tone(self):
        sr = 48000
        x = sine(5000.0, -20.0, 1.0, sr)
        m = measure_spectral(x, sr)
        assert abs(m.rolloff - 5000.0) < 200.0
