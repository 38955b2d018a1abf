"""Opt-in end-to-end contract check on a REAL user-supplied recording.

The reference keeps a build-tagged integration tier over real podcast
FLACs (`//go:build integration`, testdata/justfile:28-30) and a
real-fixture benchmark hook (JIVETALKING_BENCH_FIXTURE,
internal/processor/benchmark_test.go:12-60).  No real audio ships in this
repo either; these tests are the equivalent seam: point JT_E2E_FIXTURE at
any decodable episode file and the full master runs with the output
contract asserted.  Without the env var the whole module skips.

    JT_E2E_FIXTURE=/path/to/episode.flac python -m pytest tests/test_real_fixture.py -q

The sibling bench seam is JT_BENCH_FIXTURE for `bench.py` (same idea,
throughput-focused; see docs/USAGE.md).
"""

import os

import numpy as np
import pytest

FIXTURE = os.environ.get("JT_E2E_FIXTURE", "")

pytestmark = pytest.mark.skipif(
    not FIXTURE, reason="set JT_E2E_FIXTURE=/path/to/episode to run the "
    "real-fixture end-to-end tier")


@pytest.fixture(scope="module")
def mastered(tmp_path_factory):
    from jivetalking_tpu.io.audio import open_audio_file
    from jivetalking_tpu.pipeline import process_audio
    from jivetalking_tpu.pipeline.pass2 import downmix

    samples, meta = open_audio_file(FIXTURE, raw_int16=True)
    mono = np.asarray(downmix(samples))
    res = process_audio(mono, meta.sample_rate)
    return res, meta


class TestRealFixtureContract:
    def test_loudness_contract(self, mastered):
        # -16 LUFS +-0.5 LU against the plan's effective target (the
        # clamped-quiet path lowers the target exactly as the reference
        # does; normalise.go:896-898)
        res, _ = mastered
        assert abs(res.final.loudness.integrated_lufs
                   - res.normalisation.effective_target_i) <= 0.5

    def test_true_peak_contract(self, mastered):
        # <= -1 dBTP on the delivered audio (BASELINE.md)
        res, _ = mastered
        assert res.final.loudness.true_peak_dbtp <= -1.0 + 0.1

    def test_within_target_flag(self, mastered):
        res, _ = mastered
        assert res.normalisation.within_target

    def test_delivery_shape(self, mastered):
        res, meta = mastered
        out = np.asarray(res.output_audio)
        # delivery at 44.1 kHz s16 (the FLAC encode contract)
        expected = int(round(meta.duration_secs * res.output_rate))
        assert abs(out.shape[-1] - expected) <= res.output_rate // 10
        assert out.dtype == np.int16
