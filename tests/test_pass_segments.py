"""Pass-segment sharing and ordering contracts — the behavioural port of
the last unmapped filters_test.go / analyser_test.go items.

- Pass-1 order: downmix runs BEFORE analysis, so a stereo input measures
  identically to its pre-downmixed mono (ref: TestPass1FilterOrder,
  filters_test.go:1588-1617 — Pass1FilterOrder = [Downmix, Analysis]).
- The configured target feeds the analysis segment and ONLY the derived
  offset, never the measurement itself (ref: TestBuildAnalysisFilter,
  filters_test.go:1414-1465 — `target=` comes from Loudnorm.TargetI).
- The analysis segment is SHARED across passes: pass-1 metering and the
  pass-4 verification ride the same dual-mono R128 meter so the two can
  never drift (ref: TestAnalysisSegmentSharedAcrossPasses,
  filters_test.go:1482-1528 — byte-identical astats/aspectralstats specs,
  shared ebur128 prefix with dualmono=true).
- Frame-loop conservation: a full pass touches every input sample exactly
  once (ref: TestRunFilterGraph, analyser_test.go:1243-1296 — passthrough
  filtered-frame count equals input-frame count).

The reference pins FFmpeg filter STRINGS; this rebuild has no string
layer, so each pin lands on the numerical analogue.  The remaining string
contract — the required output format with resample disabled
(TestBuildRequiredOutputFormatFilter, filters_test.go:1573-1586) — is
covered op-level by test_chain_builders.test_resample_disabled_identity
plus the encoder's unconditional s16/4096 pins in test_flac.
"""

import numpy as np
import pytest

from jivetalking_tpu.adaptive import default_filter_config
from jivetalking_tpu.analysis import analyse_audio
from jivetalking_tpu.metering.ebur128 import measure_loudness
from jivetalking_tpu.pipeline.normalise import apply_normalisation

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


@pytest.fixture(scope="module")
def left():
    return _speechlike(-20.0, 5.0, seed=3)


@pytest.fixture(scope="module")
def right():
    return _speechlike(-23.0, 5.0, seed=9)


@pytest.fixture(scope="module")
def mono(left, right):
    return ((left + right) / 2.0).astype(np.float32)


@pytest.fixture(scope="module")
def mono_measurements(mono):
    return analyse_audio(mono, SR)


class TestPass1Order:
    """Downmix precedes analysis (ref: filters_test.go:1588-1617)."""

    def test_stereo_measures_as_downmixed_mono(self, left, right, mono,
                                               mono_measurements):
        m_stereo = analyse_audio(np.stack([left, right]), SR)
        m_mono = mono_measurements
        assert m_stereo.r128.integrated_lufs == pytest.approx(
            m_mono.r128.integrated_lufs, abs=1e-3)
        assert m_stereo.r128.true_peak_db == pytest.approx(
            m_mono.r128.true_peak_db, abs=1e-3)
        assert m_stereo.astats.rms_level == pytest.approx(
            m_mono.astats.rms_level, abs=1e-3)
        # the downmix halves the (uncorrelated) channels: the stereo
        # measurement must NOT read like either input channel alone
        m_left = analyse_audio(left, SR)
        assert abs(m_stereo.r128.integrated_lufs
                   - m_left.r128.integrated_lufs) > 1.0

    def test_duration_counts_samples_not_channels(self, left, right):
        m = analyse_audio(np.stack([left, right]), SR)
        assert m.duration == pytest.approx(5.0)
        assert m.sample_rate == SR


class TestConfiguredTargetFeedsAnalysis:
    """`target=` comes from Loudnorm.TargetI and shifts only the derived
    offset (ref: filters_test.go:1414-1465)."""

    def test_target_offset_tracks_configured_target(self, mono,
                                                    mono_measurements):
        m16 = mono_measurements          # default target_i = -16.0
        m14 = analyse_audio(mono, SR, target_i=-14.0)
        # the measurement itself is target-independent
        assert m14.r128.integrated_lufs == pytest.approx(
            m16.r128.integrated_lufs, abs=1e-9)
        # the derived offset is target_i - input_i for BOTH targets
        assert m16.loudness.target_offset == pytest.approx(
            -16.0 - m16.r128.integrated_lufs, abs=1e-9)
        assert m14.loudness.target_offset == pytest.approx(
            -14.0 - m14.r128.integrated_lufs, abs=1e-9)
        assert m14.loudness.target_offset - m16.loudness.target_offset == (
            pytest.approx(2.0, abs=1e-9))


class TestAnalysisSegmentSharedAcrossPasses:
    """(ref: filters_test.go:1482-1528)."""

    def test_pass1_rides_the_dual_mono_meter(self, mono, mono_measurements):
        m = mono_measurements
        dual = measure_loudness(mono, SR, dual_mono=True)
        plain = measure_loudness(mono, SR, dual_mono=False)
        # the analyser's loudness IS the dual-mono R128 measurement
        # (ref: ebur128=...:dualmono=true in the shared analysis segment)
        assert m.r128.integrated_lufs == pytest.approx(
            dual.integrated_lufs, abs=0.02)
        # and distinctly NOT the plain-mono one (+3.01 LU apart)
        assert abs(m.r128.integrated_lufs - plain.integrated_lufs) > 2.9

    def test_pass4_verification_shares_the_meter(self):
        # same fixture shape as test_normalise_spec's Pass-4 suite so the
        # compiled programs are shared
        x = _speechlike(-30.0, 20.0, seed=7)
        cfg = default_filter_config()
        y, res = apply_normalisation(x, SR, cfg)
        independent = measure_loudness(
            np.asarray(y), SR, dual_mono=cfg.loudnorm.dual_mono)
        # the pass-4 verification is the SAME meter call — exact agreement
        assert res.output_lufs == pytest.approx(
            independent.integrated_lufs, abs=1e-6)
        # drift detector: a plain-mono verification would sit ~3 LU away
        plain = measure_loudness(np.asarray(y), SR, dual_mono=False)
        assert abs(res.output_lufs - plain.integrated_lufs) > 2.9


class TestFrameLoopConservation:
    """Every input sample is touched exactly once (ref:
    analyser_test.go:1243-1296 — passthrough frame-count parity)."""

    def test_astats_counts_every_sample_once(self, mono, mono_measurements):
        m = mono_measurements
        assert m.dynamics.number_of_samples == mono.shape[-1]
        assert m.duration == pytest.approx(mono.shape[-1] / SR)

    def test_stereo_counts_mono_samples(self, left, right):
        m = analyse_audio(np.stack([left, right]), SR)
        assert m.dynamics.number_of_samples == left.shape[-1]
