import numpy as np
import pytest

from jivetalking_tpu.io import wav as wavio
from jivetalking_tpu.io.audio import downmix_mono, open_audio_file
from jivetalking_tpu.io.synth import SilenceGap, TestAudioOptions, _lcg_noise, generate_test_audio


def test_lcg_matches_scalar_reference():
    # scalar mirror of the Go testutil LCG
    s = 12345
    expect = []
    for _ in range(1000):
        s = (s * 1664525 + 1013904223) & 0xFFFFFFFF
        expect.append((s / 0xFFFFFFFF) * 2.0 - 1.0)
    got = _lcg_noise(1000)
    np.testing.assert_allclose(got, expect, rtol=0, atol=1e-12)


@pytest.mark.parametrize("bits", [16, 24, 32])
def test_wav_roundtrip(tmp_path, bits):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, size=(2, 4410))).astype(np.float32)
    p = str(tmp_path / f"rt{bits}.wav")
    wavio.write_wav(p, x, 44100, bits=bits)
    y, rate = wavio.read_wav(p)
    assert rate == 44100
    assert y.shape == x.shape
    tol = {16: 1e-4, 24: 3e-7, 32: 1e-7}[bits]
    np.testing.assert_allclose(y, x, atol=tol)


def test_generate_test_audio_tone_level(tmp_path):
    p = str(tmp_path / "tone.wav")
    generate_test_audio(
        p, TestAudioOptions(duration_secs=1.0, tone_freq=1000.0, tone_level=-20.0)
    )
    x, meta = open_audio_file(p)
    assert meta.sample_rate == 44100
    assert meta.channels == 1
    mono = downmix_mono(x)
    rms_db = 20 * np.log10(np.sqrt(np.mean(mono.astype(np.float64) ** 2)))
    # -20 dBFS sine -> RMS = -23.01 dBFS
    assert abs(rms_db - (-23.01)) < 0.1


def test_generate_test_audio_silence_gap(tmp_path):
    p = str(tmp_path / "gap.wav")
    generate_test_audio(
        p,
        TestAudioOptions(
            duration_secs=2.0,
            tone_freq=440.0,
            tone_level=-20.0,
            silence_gap=SilenceGap(start=0.5, duration=0.5),
        ),
    )
    x, meta = open_audio_file(p)
    sr = meta.sample_rate
    gap = x[0, int(0.6 * sr) : int(0.9 * sr)]
    assert np.max(np.abs(gap)) == 0.0


def test_downmix_stereo_mean():
    x = np.stack([np.ones(10, np.float32), -np.ones(10, np.float32)])
    np.testing.assert_allclose(downmix_mono(x), np.zeros(10), atol=0)
