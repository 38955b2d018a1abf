"""Deterministic synthetic test-audio generator.

Behavioural mirror of the reference's `generateTestAudio` (ref:
internal/processor/testutil_test.go:11-135): sine tone + LCG white noise +
optional silence gap at configurable dBFS levels, written as mono 16-bit WAV.
Used by the test suite and by `bench.py` so benchmarks run without fixtures.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .wav import write_wav


@dataclass
class SilenceGap:
    start: float = 0.0
    duration: float = 0.0


@dataclass
class TestAudioOptions:
    __test__ = False  # pytest: fixture options struct, not a test class

    duration_secs: float = 5.0
    sample_rate: int = 44100
    tone_freq: float = 0.0       # Hz; 0 = no tone
    tone_level: float = 0.0      # dBFS (must be < 0 to be audible)
    noise_level: float = 0.0     # dBFS (0 = no noise)
    silence_gap: SilenceGap = field(default_factory=SilenceGap)


def _lcg_noise(n: int, state: int = 12345) -> np.ndarray:
    """Numerical-Recipes LCG, identical sequence to the reference generator,
    computed in closed form:  s_j = a^j s_0 + c * (1 + a + ... + a^{j-1})
    with uint32 wraparound arithmetic (vectorised jump-ahead)."""
    a = np.uint32(1664525)
    c = np.uint32(1013904223)
    s0 = np.uint32(state)
    with np.errstate(over="ignore"):
        pows = np.multiply.accumulate(
            np.full(n, a, dtype=np.uint32), dtype=np.uint32
        )  # a^1..a^n
        geo = np.empty(n, dtype=np.uint32)  # geo[j-1] = sum_{i<j} a^i
        geo[0] = 1
        if n > 1:
            geo[1:] = np.uint32(1) + np.add.accumulate(pows, dtype=np.uint32)[: n - 1]
        states = pows * s0 + c * geo
    return (states.astype(np.float64) / float(0xFFFFFFFF)) * 2.0 - 1.0


def generate_test_audio(path: str, opts: TestAudioOptions) -> str:
    sr = opts.sample_rate or 44100
    dur = opts.duration_secs or 5.0
    n = int(dur * sr)

    tone_amp = 10.0 ** (opts.tone_level / 20.0) if (opts.tone_freq > 0 and opts.tone_level < 0) else 0.0
    noise_amp = 10.0 ** (opts.noise_level / 20.0) if opts.noise_level < 0 else 0.0

    sample = np.zeros(n, dtype=np.float64)
    if tone_amp > 0:
        t = np.arange(n, dtype=np.float64) / sr
        sample += tone_amp * np.sin(2.0 * np.pi * opts.tone_freq * t)
    noise = _lcg_noise(n) if noise_amp > 0 else None
    if noise is not None:
        sample += noise_amp * noise

    gap = opts.silence_gap
    if gap.duration > 0:
        s0 = int(gap.start * sr)
        s1 = min(n, int((gap.start + gap.duration) * sr))
        if noise is not None:
            # gap inherits the noise floor (real-room recording semantics)
            sample[s0:s1] = noise_amp * noise[s0:s1]
        else:
            sample[s0:s1] = 0.0

    sample = np.clip(sample, -1.0, 1.0)
    # reference converts with int16(sample * 32767)
    write_wav(path, sample.astype(np.float32)[None, :], sr, bits=16)
    return path
