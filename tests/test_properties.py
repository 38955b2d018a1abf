"""Property-based invariants for the core DSP primitives (hypothesis).

The reference pins behaviour with hand-picked vectors; these pin the
ALGEBRAIC contracts the vectors sample — the properties that must hold
for every input, not just the tabled ones: limiter ceiling safety, gain
laws bounded and monotone, linear-recurrence exactness vs the sequential
definition, resampler linearity, loudness gain-equivariance.

Design notes: the jitted entry points take static parameters, so tests
either exercise the PURE gain/prefix functions eagerly (no compile per
example) or hold shapes/statics fixed and vary only content (one compile
total, hypothesis varies the data).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from jivetalking_tpu.ops.dynamics import (
    attack_release_follower,
    compressor_gain,
    envelope_coeff,
    gate_gain,
    linear_recurrence,
)
from jivetalking_tpu.ops.limiter import _maxplus_prefix, limiter_core

SR = 44100


def _signal(seed: int, n: int, amp: float) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n).astype(np.float32)
    x += np.sin(2 * np.pi * 997.0 * np.arange(n) / SR).astype(np.float32)
    peak = float(np.abs(x).max()) or 1.0
    return (amp / peak) * x


@st.composite
def signal_and_limit(draw):
    seed = draw(st.integers(0, 2**31 - 1))
    amp = draw(st.floats(0.05, 4.0))
    limit = draw(st.floats(0.05, 1.0))
    return _signal(seed, 4096, amp), limit


class TestLimiterProperties:
    """limiter_core's hard contract: NO output sample exceeds the ceiling
    (gain[t] <= needed[t] = min(1, limit/|x[t]|) by construction)."""

    _jit = staticmethod(
        jax.jit(lambda x, lim: limiter_core(x, lim, 221, 2205.0))
    )

    @settings(max_examples=25, deadline=None)
    @given(signal_and_limit())
    def test_ceiling_never_exceeded(self, sig_lim):
        x, limit = sig_lim
        y = np.asarray(self._jit(jnp.asarray(x), jnp.float32(limit)))
        assert np.abs(y).max() <= limit * (1.0 + 1e-4)

    @settings(max_examples=10, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_quiet_signal_untouched(self, seed):
        # everything under the ceiling by 6 dB passes bit-near-exactly
        x = _signal(seed, 4096, 0.25)
        y = np.asarray(self._jit(jnp.asarray(x), jnp.float32(0.5)))
        np.testing.assert_allclose(y, x, atol=2e-6)


class TestGainLawProperties:
    """gate_gain / compressor_gain algebraic bounds (pure functions)."""

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(0, 2**31 - 1),
        st.floats(0.001, 0.5),   # threshold_lin
        st.floats(1.0, 9.0),     # ratio
        st.floats(1.0, 8.0),     # knee
        st.floats(0.01, 0.9),    # range_lin
    )
    def test_gate_gain_bounded_and_monotone(self, seed, thr, ratio, knee, rng_lin):
        rng = np.random.default_rng(seed)
        env = np.sort(rng.uniform(1e-8, 1.0, 256).astype(np.float32))
        g = np.asarray(gate_gain(jnp.asarray(env), thr, ratio, knee, rng_lin))
        assert np.all(g <= 1.0 + 1e-5)
        assert np.all(g >= rng_lin - 1e-6)
        # louder detector -> never MORE attenuation (downward expander)
        assert np.all(np.diff(g) >= -1e-4)

    @settings(max_examples=30, deadline=None)
    @given(
        st.integers(0, 2**31 - 1),
        st.floats(0.01, 0.7),
        st.floats(1.5, 20.0),
        st.floats(1.0, 8.0),
    )
    def test_compressor_gain_bounded_and_antitone(self, seed, thr, ratio, knee):
        rng = np.random.default_rng(seed)
        env = np.sort(rng.uniform(1e-8, 4.0, 256).astype(np.float32))
        g = np.asarray(compressor_gain(jnp.asarray(env), thr, ratio, knee))
        assert np.all(g <= 1.0 + 1e-5)
        assert np.all(g > 0.0)
        # louder detector -> never LESS gain reduction
        assert np.all(np.diff(g) <= 1e-4)


class TestPrefixPrimitives:
    """The scan-free parallel prefixes ARE the sequential definitions."""

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(0.5, 0.999))
    def test_linear_recurrence_matches_sequential(self, seed, a_val):
        rng = np.random.default_rng(seed)
        n = 1500
        a = np.full(n, a_val, np.float32)
        b = rng.standard_normal(n).astype(np.float32)
        got = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(b)))
        want = np.empty(n, np.float64)
        acc = 0.0
        for i in range(n):
            acc = a_val * acc + float(b[i])
            want[i] = acc
        np.testing.assert_allclose(got, want.astype(np.float32), atol=5e-3)

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(-0.1, -0.0001))
    def test_maxplus_prefix_matches_sequential(self, seed, c):
        rng = np.random.default_rng(seed)
        n = 1500
        v = rng.uniform(-30.0, 0.0, n).astype(np.float32)
        got = np.asarray(_maxplus_prefix(jnp.asarray(v), jnp.float32(c)))
        want = np.empty(n, np.float32)
        acc = -np.inf
        for i in range(n):
            acc = max(float(v[i]), acc + c)
            want[i] = acc
        np.testing.assert_allclose(got, want, atol=1e-3)

    @settings(max_examples=15, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_follower_matches_sequential(self, seed):
        rng = np.random.default_rng(seed)
        n = 1200
        d = np.abs(rng.standard_normal(n)).astype(np.float32)
        ca = envelope_coeff(5.0, SR)
        cr = envelope_coeff(200.0, SR)
        got = np.asarray(attack_release_follower(jnp.asarray(d), ca, cr))
        acc = 0.0
        want = np.empty(n, np.float32)
        for i in range(n):
            c = ca if d[i] > acc else cr
            acc = acc + c * (float(d[i]) - acc)
            want[i] = acc
        np.testing.assert_allclose(got, want, atol=1e-3)


class TestResampleProperties:
    @pytest.fixture(scope="class")
    def resample_48_to_441(self):
        from jivetalking_tpu.ops.resample import resample

        return lambda x: np.asarray(resample(jnp.asarray(x), 48000, 44100))

    @settings(max_examples=8, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(0.1, 2.0))
    def test_linearity(self, resample_48_to_441, seed, scale):
        x = _signal(seed, 9600, 0.3)
        a = resample_48_to_441(x * np.float32(scale))
        b = resample_48_to_441(x) * np.float32(scale)
        np.testing.assert_allclose(a, b, atol=1e-5)

    @settings(max_examples=8, deadline=None)
    @given(st.floats(0.05, 0.9))
    def test_dc_preserved(self, resample_48_to_441, level):
        x = np.full(9600, level, np.float32)
        y = resample_48_to_441(x)
        core = y[500:-500]  # away from the FIR edges
        np.testing.assert_allclose(core, level, rtol=2e-3)


class TestLoudnessProperties:
    @settings(max_examples=5, deadline=None)
    @given(st.floats(-6.0, 6.0))
    def test_gain_equivariance(self, gain_db):
        # I(g*x) = I(x) + g for material well above the -70 gate
        from jivetalking_tpu.metering.ebur128 import measure_loudness

        x = _signal(7, SR * 4, 0.1)
        base = measure_loudness(jnp.asarray(x), SR).integrated_lufs
        g = np.float32(10.0 ** (gain_db / 20.0))
        shifted = measure_loudness(jnp.asarray(x * g), SR).integrated_lufs
        assert shifted == pytest.approx(base + gain_db, abs=0.15)

    @staticmethod
    def _true_peak_reference(x: np.ndarray) -> float:
        """Genuine inter-sample peak: 64x FFT (ideal-sinc) resample."""
        from scipy.signal import resample as fft_resample

        return float(np.abs(fft_resample(x.astype(np.float64), len(x) * 64)).max())

    @settings(max_examples=8, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(0.05, 0.95))
    def test_true_peak_bounds(self, seed, amp):
        # sample peak <= measured TP <= genuine inter-sample peak + ripple.
        # A fixed "sample peak + 1.2 dB" ceiling is NOT an invariant:
        # full-band noise can carry real inter-sample excess beyond any
        # constant (seed=254/amp=0.5 draws 1.81 dB — pinned below), and the
        # 4x BS.1770-style measure correctly reports part of it.  Bound
        # against the 64x ideal-resample reference instead.
        from jivetalking_tpu.metering.truepeak import true_peak_linear

        x = _signal(seed, 8192, amp)
        sp = float(np.abs(x).max())
        tp = float(true_peak_linear(jnp.asarray(x)))
        ref = self._true_peak_reference(x)
        assert tp >= sp - 1e-6
        assert tp <= max(ref, sp) * 10 ** (0.3 / 20.0)

    def test_true_peak_bounds_regression_seed254(self):
        # The draw that falsified the old constant bound (VERDICT r4 Weak #1):
        # genuine inter-sample excess 1.81 dB; the 4x measure reads ~1.40 dB
        # over sample peak — above the old 1.2 dB constant, below the truth.
        from jivetalking_tpu.metering.truepeak import true_peak_linear

        x = _signal(254, 8192, 0.5)
        sp = float(np.abs(x).max())
        tp = float(true_peak_linear(jnp.asarray(x)))
        ref = self._true_peak_reference(x)
        assert ref > sp * 10 ** (1.2 / 20.0)  # the old bound was truly unsound
        assert tp >= sp - 1e-6
        assert tp <= max(ref, sp) * 10 ** (0.3 / 20.0)


class TestFilterProperties:
    """Frequency-selective ops: algebraic behaviour on constructed tones."""

    @settings(max_examples=10, deadline=None)
    @given(st.floats(40.0, 120.0), st.integers(0, 2**31 - 1))
    def test_highpass_rejects_dc_passes_speech(self, corner, seed):
        from jivetalking_tpu.ops.iir import design_highpass, sosfilt_scan

        rng = np.random.default_rng(seed)
        n = SR // 2
        dc = np.full(n, 0.4, np.float32)
        sos = design_highpass(corner, SR)
        y_dc = np.asarray(sosfilt_scan(sos, jnp.asarray(dc)))
        # DC fully rejected after settling
        assert np.abs(y_dc[SR // 4 :]).max() < 0.01
        # 1 kHz (a decade and change above any corner here) passes ~unity
        t = np.arange(n) / SR
        tone = (0.3 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
        y_tone = np.asarray(sosfilt_scan(sos, jnp.asarray(tone)))
        body = y_tone[SR // 4 :]
        assert np.abs(np.abs(body).max() - 0.3) < 0.02

    @settings(max_examples=10, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(0.2, 0.85))
    def test_deesser_attenuates_sibilance_not_body(self, seed, intensity):
        from jivetalking_tpu.ops.deesser import apply_deesser

        n = SR // 2
        t = np.arange(n) / SR
        body = (0.2 * np.sin(2 * np.pi * 500.0 * t)).astype(np.float32)
        sib = (0.2 * np.sin(2 * np.pi * 8000.0 * t)).astype(np.float32)
        y_body = np.asarray(apply_deesser(jnp.asarray(body), SR, intensity=intensity))
        y_sib = np.asarray(apply_deesser(jnp.asarray(sib), SR, intensity=intensity))
        core = slice(n // 4, -n // 4)
        body_ratio = float(
            np.sqrt(np.mean(y_body[core] ** 2) / np.mean(body[core] ** 2))
        )
        sib_ratio = float(
            np.sqrt(np.mean(y_sib[core] ** 2) / np.mean(sib[core] ** 2))
        )
        assert body_ratio > 0.9          # speech body essentially untouched
        assert sib_ratio <= body_ratio + 1e-6  # sibilance never LESS reduced

    @settings(max_examples=6, deadline=None)
    @given(st.integers(0, 2**31 - 1))
    def test_declick_preserves_clean_repairs_impulse(self, seed):
        from jivetalking_tpu.ops.declick import apply_declick

        rng = np.random.default_rng(seed)
        n = SR // 2
        t = np.arange(n) / SR
        clean = (0.2 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
        y_clean = np.asarray(apply_declick(jnp.asarray(clean), SR))
        assert (
            np.sqrt(np.mean((y_clean - clean) ** 2)) < 0.01
        )  # click-free audio passes
        clicked = clean.copy()
        pos = int(rng.integers(n // 4, 3 * n // 4))
        clicked[pos] = 0.99
        y = np.asarray(apply_declick(jnp.asarray(clicked), SR))
        # the impulse is attenuated toward the local waveform
        assert abs(y[pos] - clean[pos]) < abs(clicked[pos] - clean[pos]) * 0.5


class TestNlmProperties:
    @settings(max_examples=8, deadline=None)
    @given(st.integers(0, 2**31 - 1), st.floats(0.05, 2.0))
    def test_output_is_convex_combination(self, seed, h):
        """NLM output is a weighted average of research-window neighbours,
        so it can never leave [min, max] of the (zero-padded) input."""
        from jivetalking_tpu.ops.nlm import _nlm_core

        rng = np.random.default_rng(seed)
        x = (0.5 * rng.standard_normal(2000)).astype(np.float32)
        y = np.asarray(
            _nlm_core(jnp.asarray(x), jnp.float32(h * h), 8, 5, block=1024)
        )
        lo, hi = min(float(x.min()), 0.0), max(float(x.max()), 0.0)
        assert y.min() >= lo - 1e-5
        assert y.max() <= hi + 1e-5
