"""Split-band dynamic de-esser (deesser equivalent).

TPU-native replacement for FFmpeg's `deesser=i=..:m=0.50:f=0.80` (ref spec:
internal/processor/filters.go:921-932; defaults filters.go:504-511 — m is a
~12 dB max-cut depth cap, f=0.80 places the detector corner ~7.5 kHz so it
acts on the sibilant band, not presence).

Behavioural contract (the reference tunes only `i` on a ramp law,
adaptive_deesser.go:13-22): i=0 is bit-transparent; rising i engages
progressively deeper HF-band gain reduction during sibilant bursts, capped
by m.  The reference notes af_deesser applies a pow(i, 5) law to the
intensity, reproduced here.

Design: split the signal at the detector corner with a LINEAR-PHASE
windowed-sinc high-pass (group delay compensated), so high and low bands
are phase-aligned and exactly complementary — attenuating the high band
then recombining genuinely reduces output level (a minimum-phase biquad
split would leave the bands in quadrature and the cut would cancel).
Follow the high-band envelope with the shared parallel attack/release
follower; reduce the high band when it dominates the programme; recombine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .dynamics import attack_release_follower, envelope_coeff
from .iir import fir_convolve_long

_SPLIT_TAPS = 255  # odd -> integer group delay


@functools.lru_cache(maxsize=16)
def _highpass_kernel(corner_hz: float, sample_rate: int) -> np.ndarray:
    """Linear-phase high-pass: delta minus a Hamming windowed-sinc low-pass."""
    n = _SPLIT_TAPS
    m = np.arange(n) - (n - 1) / 2.0
    fc = corner_hz / sample_rate
    lp = 2.0 * fc * np.sinc(2.0 * fc * m) * np.hamming(n)
    lp /= lp.sum()
    hp = -lp
    hp[(n - 1) // 2] += 1.0
    return hp.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("sample_rate", "intensity", "amount", "frequency"))
def _deesser_impl(x, hf, sample_rate: int, intensity: float, amount: float, frequency: float):
    lf = x - hf

    # sibilance detector (high band) + overall programme envelope, as one
    # BATCHED follower: the two independent recurrences share every scan pass
    ca = envelope_coeff(1.0, sample_rate)
    cr = envelope_coeff(30.0, sample_rate)
    envs = attack_release_follower(jnp.stack([jnp.abs(hf), jnp.abs(x)]), ca, cr)
    env, env_all = envs[0], envs[1]

    # pow(i,5) law (ref: adaptive_deesser.go docstring; af_deesser maxdess):
    # at i=0.85 sensitivity ~0.44, at i=0.6 ~0.08 — the audibly-active part
    # of the curve sits above the mid breakpoint, as the reference notes.
    sensitivity = intensity ** 5
    # engage when the high band carries more than (1 - sensitivity) of the
    # programme envelope
    ratio = env / jnp.maximum(env_all, 1e-9)
    excess = jnp.maximum(0.0, ratio - (1.0 - sensitivity))

    # depth cap: amount=0.5 ~ 12 dB max cut (ref: filters.go:509)
    max_cut_db = 24.0 * amount
    min_gain = 10.0 ** (-max_cut_db / 20.0)
    # map excess onto gain [1, min_gain]; the half-sensitivity scale reaches
    # full depth once the high band clearly dominates the programme
    depth = jnp.clip(excess / jnp.maximum(0.5 * sensitivity, 1e-6), 0.0, 1.0)
    gain = 1.0 - depth * (1.0 - min_gain)

    return lf + hf * gain


def apply_deesser(
    x,
    sample_rate: int,
    intensity: float,
    amount: float = 0.50,
    frequency: float = 0.80,
) -> jnp.ndarray:
    """De-ess `x`.  intensity in [0, 1] (reference range [0, 0.85]); i=0
    returns the input unchanged."""
    x = jnp.asarray(x, dtype=jnp.float32)
    if intensity <= 0.0:
        return x
    # detector corner: f maps [0,1] onto the upper spectrum; f=0.80 places
    # the split ~6 kHz at 44.1/48 kHz so the 6-9 kHz sibilant band sits
    # above it (ref: filters.go:510 — "corner ~7.5 kHz, acts on sibilant
    # band not presence")
    corner_hz = min(frequency * sample_rate / 2.0 * 0.34, sample_rate * 0.45)
    kernel = _highpass_kernel(corner_hz, sample_rate)
    delay = (_SPLIT_TAPS - 1) // 2
    # causal convolution then shift left by the group delay -> zero-phase
    hf_causal = fir_convolve_long(
        jnp.concatenate([x, jnp.zeros(delay, x.dtype)]), kernel
    )
    hf = hf_causal[delay:]
    return _deesser_impl(x, hf, sample_rate, float(intensity), float(amount), float(frequency))
