"""Independent DSP cross-validation against scipy.signal.

The unit tests elsewhere pin our kernels against hand-derived vectors and
each other; these pin them against a SECOND implementation nobody in this
repo wrote: scipy's exact IIR filters and polyphase resampler.  This is
the closest available stand-in for FFmpeg ground truth (no ffmpeg binary
or soundfile in the image), and it bounds the deliberate approximations:

  * the truncated-IR FIR evaluation of the RBJ/K-weighting biquads vs
    scipy.signal.sosfilt's exact recursion;
  * the gated-loudness pipeline vs an all-numpy BS.1770 built on sosfilt;
  * the 4x polyphase true-peak interpolator vs scipy.signal.resample_poly.
"""

import numpy as np
import pytest
import scipy.signal as sps

from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.metering.kweight import k_weighting_sos
from jivetalking_tpu.metering.truepeak import true_peak_linear
from jivetalking_tpu.ops.iir import (
    cascade,
    design_highpass,
    design_lowpass,
    sos_impulse_response,
)

SR = 48000


def _speechlike(secs=8.0, dbfs=-23.0, seed=5):
    rng = np.random.default_rng(seed)
    n_notes = int(secs / 0.25)
    note = int(0.25 * SR)
    t = np.arange(note) / SR
    segs = [
        (10 ** ((dbfs + rng.uniform(-3, 1)) / 20)) * np.sin(2 * np.pi * f * t)
        for f in rng.choice([400, 700, 1100, 1600, 2200], n_notes)
    ]
    x = np.concatenate(segs)[: int(secs * SR)]
    x += 10 ** (-58 / 20) * rng.standard_normal(x.size)
    return x.astype(np.float32)


class TestTruncatedIRvsScipySosfilt:
    """The production biquads run as truncated-IR FIRs; scipy.signal.sosfilt
    is the exact recursion.  The truncation must be inaudible (< 1e-4 rms
    of a -23 dBFS signal ~= -80 dB error floor)."""

    @pytest.mark.parametrize("design", [
        ("highpass80", lambda: design_highpass(80.0, SR)),
        ("lowpass20500", lambda: design_lowpass(20500.0, SR)),
        ("kweight", lambda: k_weighting_sos(SR)),
        ("chain", lambda: cascade(design_highpass(80.0, SR),
                                  design_lowpass(20500.0, SR))),
    ], ids=lambda p: p[0] if isinstance(p, tuple) else str(p))
    def test_ir_truncation_error(self, design):
        _, make = design
        sos = np.atleast_2d(make())
        x = _speechlike()
        want = sps.sosfilt(sos.astype(np.float64), x.astype(np.float64))
        ir = sos_impulse_response(sos, 4096)
        got = np.convolve(x.astype(np.float64), ir)[: x.size]
        err = np.sqrt(np.mean((got - want) ** 2))
        sig = np.sqrt(np.mean(want ** 2))
        assert err / sig < 1e-4, f"truncated-IR error {20*np.log10(err/sig):.1f} dB"


class TestLoudnessVsScipyReference:
    """measure_loudness vs an independent all-numpy BS.1770-4 built on
    scipy's exact K-weighting recursion: 100 ms blocks, 400 ms momentary
    windows, -70 absolute + (-10 rel) gating, dual-mono doubling."""

    def _reference_lufs(self, x):
        sos = k_weighting_sos(SR).astype(np.float64)
        kx = sps.sosfilt(sos, x.astype(np.float64))
        step = int(0.1 * SR)
        nb = x.size // step
        bp = 2.0 * np.mean(kx[: nb * step].reshape(nb, step) ** 2, axis=1)
        c = np.concatenate([[0.0], np.cumsum(bp)])
        if nb < 4:
            mp = np.array([bp.mean()])
        else:
            mp = (c[4:] - c[:-4]) / 4.0
        ml = -0.691 + 10 * np.log10(np.maximum(mp, 1e-15))
        m1 = ml > -70.0
        mean_p = bp_sum = mp[m1].mean() if m1.any() else 1e-15
        rel = -0.691 + 10 * np.log10(mean_p) - 10.0
        m2 = m1 & (ml > rel)
        gated = mp[m2].mean() if m2.any() else 1e-15
        return -0.691 + 10 * np.log10(gated)

    def test_integrated_within_002_lu(self):
        x = _speechlike(secs=12.0)
        ours = measure_loudness(x, SR).integrated_lufs
        ref = self._reference_lufs(x)
        assert ours == pytest.approx(ref, abs=0.02), (ours, ref)

    def test_gain_invariance(self):
        # a +6 dB gain must move the integrated loudness by exactly +6 LU
        x = _speechlike(secs=10.0, dbfs=-30.0)
        a = measure_loudness(x, SR).integrated_lufs
        b = measure_loudness(2.0 * x, SR).integrated_lufs
        assert b - a == pytest.approx(6.0206, abs=0.05)


class TestTruePeakVsResamplePoly:
    """Our 4x polyphase interpolator vs scipy.signal.resample_poly: both
    estimate the inter-sample peak of a near-Nyquist tone; the two
    windowed-sinc designs must agree within 0.05 dB."""

    def test_intersample_peak_agreement(self):
        t = np.arange(int(0.2 * SR)) / SR
        # 11.9 kHz tone with phase chosen so samples straddle the true peak
        x = (0.5 * np.sin(2 * np.pi * 11900.0 * t + 0.7)).astype(np.float32)
        ours = float(np.asarray(true_peak_linear(x)))
        ref = float(np.max(np.abs(sps.resample_poly(
            x.astype(np.float64), 4, 1, window=("kaiser", 8.0)))))
        assert 20 * np.log10(ours / ref) == pytest.approx(0.0, abs=0.05)

    def test_detects_intersample_excess(self):
        # the sample peak underestimates; the true peak must exceed it for
        # a tone sampled off-peak
        t = np.arange(int(0.1 * SR)) / SR
        x = (0.5 * np.sin(2 * np.pi * (SR / 4.0 - 10.0) * t + 0.4)).astype(np.float32)
        tp = float(np.asarray(true_peak_linear(x)))
        sp = float(np.max(np.abs(x)))
        assert tp >= sp
