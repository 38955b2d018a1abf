"""Spectral accumulation vectors, ported from the reference's accumulator
suite (ref: analyser_metrics_test.go TestFinalizeSpectral_* :31-152,
TestSpectralAccumulator_* :152-256, TestIntervalAccumulatorFinalize :499;
structure guards :256-341).

The reference accumulates per-frame spectral metadata in a
SpectralAccumulator and averages on finalize.  The rebuild holds the
per-interval spectral table in `Intervals.spectral` (struct-of-arrays) and
averages in `region_sample`; the same vectors must come out of the mask
averaging, field by field — with the repo's pinned found-only convention
for mixed rows (tests/test_vad_primitives.py
::test_mixed_found_unfound_uses_found_only_mean)."""

import dataclasses

import numpy as np
import pytest

from jivetalking_tpu.analysis.intervals import Intervals
from jivetalking_tpu.analysis.types import RegionSample
from jivetalking_tpu.metering.spectral import METRIC_NAMES

# the reference's two-row averaging table (analyser_metrics_test.go:40-100),
# keyed by the repo's metric names
ROW_A = {
    "mean": 2.0, "variance": 4.0, "centroid": 1000.0, "spread": 200.0,
    "skewness": 1.0, "kurtosis": 2.0, "entropy": 0.25, "flatness": 0.10,
    "crest": 1.0, "flux": 0.5, "slope": -0.005, "decrease": 0.1,
    "rolloff": 2000.0,
}
ROW_B = {
    "mean": 8.0, "variance": 16.0, "centroid": 2000.0, "spread": 400.0,
    "skewness": 3.0, "kurtosis": 6.0, "entropy": 1.25, "flatness": 0.40,
    "crest": 5.0, "flux": 1.5, "slope": -0.015, "decrease": 0.3,
    "rolloff": 6000.0,
}
WANT_MEAN = {
    "mean": 5.0, "variance": 10.0, "centroid": 1500.0, "spread": 300.0,
    "skewness": 2.0, "kurtosis": 4.0, "entropy": 0.75, "flatness": 0.25,
    "crest": 3.0, "flux": 1.0, "slope": -0.01, "decrease": 0.2,
    "rolloff": 4000.0,
}


def _intervals(rows, found):
    """Hand-built Intervals table with the given spectral rows."""
    n = len(rows)
    z = np.zeros(n)
    spectral = {
        k: np.array([r.get(k, 0.0) for r in rows]) for k in METRIC_NAMES
    }
    return Intervals(
        timestamp=np.arange(n) * 0.25,
        rms_level=z - 20.0,
        peak_level=z - 10.0,
        momentary_lufs=z - 23.0,
        short_term_lufs=z - 23.0,
        true_peak=z - 9.0,
        sample_peak=z - 10.0,
        spectral=spectral,
        spectral_found=np.asarray(found, dtype=bool),
    )


class TestRegionSpectralAveraging:
    def test_reference_names_all_present(self):
        # the 13 aspectralstats fields of the reference table all exist
        assert set(ROW_A) == set(METRIC_NAMES)

    def test_averages_all_fields(self):
        # (ref: TestFinalizeSpectral_AveragesCorrectly :40 and
        # TestSpectralAccumulator_AveragesAllFields :193)
        iv = _intervals([ROW_A, ROW_B], [True, True])
        s = iv.region_sample(np.array([True, True]))
        for k, want in WANT_MEAN.items():
            assert getattr(s.spectral, k) == pytest.approx(want, abs=1e-9), k
        assert s.spectral.found

    def test_identical_rows_assign_base_value(self):
        # (ref: TestFinalizeSpectral_AssignsBaseSpectral :103)
        row = {k: v for k, v in ROW_A.items()}
        iv = _intervals([row, row, row], [True, True, True])
        s = iv.region_sample(np.ones(3, dtype=bool))
        for k, want in row.items():
            assert getattr(s.spectral, k) == pytest.approx(want, abs=1e-12), k

    def test_zero_found_count_yields_zero_metrics(self):
        # (ref: TestFinalizeSpectral_ZeroFrameCount :31 and
        # TestSpectralAccumulator_ZeroFrameCount :152)
        iv = _intervals([ROW_A, ROW_B], [False, False])
        s = iv.region_sample(np.array([True, True]))
        for k in METRIC_NAMES:
            assert getattr(s.spectral, k) == 0.0, k
        assert not s.spectral.found

    def test_mixed_found_rows_average_found_only(self):
        # (ref: TestSpectralAccumulator_MixedFoundAndUnfound :163 — the
        # unfound row's values never reach the mean; Found latches true)
        big = {k: 100.0 for k in METRIC_NAMES}
        iv = _intervals([big, ROW_A], [False, True])
        s = iv.region_sample(np.array([True, True]))
        for k, want in ROW_A.items():
            assert getattr(s.spectral, k) == pytest.approx(want, abs=1e-12), k
        assert s.spectral.found

    def test_mask_scopes_the_average(self):
        # only rows inside the region mask contribute
        iv = _intervals([ROW_A, ROW_B, {k: 1e6 for k in METRIC_NAMES}],
                        [True, True, True])
        s = iv.region_sample(np.array([True, True, False]))
        assert s.spectral.centroid == pytest.approx(1500.0)


class TestSingleSpectralFieldStructure:
    """(ref: TestIntervalSample_UsesSingleSpectralMetricsField :273,
    TestIntervalSample_HasNoFlatSpectralPrimitiveFields :293,
    TestBaseMetadataAccumulators_UsesSingleSpectralAccumulator :256):
    the sample types carry ONE typed spectral field, never flat
    per-metric duplicates that could drift."""

    def test_region_sample_has_one_spectral_field(self):
        names = [f.name for f in dataclasses.fields(RegionSample)]
        spectral_fields = [n for n in names if "spectral" in n]
        assert spectral_fields == ["spectral"]

    def test_region_sample_has_no_flat_spectral_primitives(self):
        names = {f.name for f in dataclasses.fields(RegionSample)}
        for flat in ("centroid", "flatness", "entropy", "rolloff",
                     "spectral_centroid", "spectral_flatness"):
            assert flat not in names, flat

    def test_intervals_table_keys_match_metric_names(self):
        iv = _intervals([ROW_A], [True])
        assert set(iv.spectral) == set(METRIC_NAMES)
