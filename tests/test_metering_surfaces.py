"""Metering-surface guard, ported from normalise_guard_test.go.

The reference asserts all three production analysis filter builders emit
BOTH ``astats=metadata=1`` and ``ebur128=metadata=1`` — the loudnorm
capture spike depends on both metric families being present on every
metering surface (ref: normalise_guard_test.go:14-55
TestMetadataModeGuard).  The rebuild has no spec strings; the surviving
contract is that each of the three surfaces — Pass-1 analysis, Pass-4
final output, and the region re-measure — carries both the astats-axis
and the ebur128-axis measurements.

The statsfile parse family (normalise_statsfile_test.go) has NO
analogue by design: loudnorm measurement happens in-graph on device and
returns structured scalars, so there is no per-call JSON stats file to
parse, collide, or leak.
"""

import numpy as np
import pytest

from jivetalking_tpu.analysis import analyse_audio
from jivetalking_tpu.analysis.regions import measure_region
from jivetalking_tpu.analysis.types import Region
from jivetalking_tpu.pipeline.process import _measure_output

SR = 44100


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(5)
    amp = 10.0 ** (-20.0 / 20.0)
    return (amp * rng.standard_normal(12 * SR)).astype(np.float32)


class TestMeteringSurfaceGuard:
    def test_analysis_surface_carries_both_axes(self, fixture):
        # buildAnalysisFilter analogue: Pass 1 must return astats AND r128
        m = analyse_audio(fixture, SR)
        assert m.astats is not None, "analysis lost the astats axis"
        assert m.r128 is not None, "analysis lost the ebur128 axis"
        assert np.isfinite(m.astats.rms_level)
        assert np.isfinite(m.r128.integrated_lufs)
        # the two axes are genuinely distinct measurements
        assert m.astats.rms_level != pytest.approx(
            m.r128.integrated_lufs, abs=0.01
        )

    def test_final_output_surface_carries_both_axes(self, fixture):
        # buildLoudnormFilterSpec analogue: the Pass-4 output measurement
        from jivetalking_tpu.analysis.analyser import AudioMeasurements

        out = _measure_output(fixture, SR, AudioMeasurements())
        assert out.astats is not None
        assert out.loudness is not None
        assert np.isfinite(out.astats.rms_level)
        assert np.isfinite(out.loudness.integrated_lufs)

    def test_region_surface_carries_both_axes(self, fixture):
        # outputRegionAnalysisFilterFormat analogue: a RegionSample holds
        # the astats pair (rms/peak dBFS) and the ebur128 pair
        # (momentary/short-term LUFS, true peak dBTP)
        s = measure_region(fixture, SR, Region(start=2.0, end=6.0))
        for f in ("rms_level", "peak_level"):
            assert np.isfinite(getattr(s, f)), f
        for f in ("momentary_lufs", "short_term_lufs", "true_peak"):
            assert np.isfinite(getattr(s, f)), f
