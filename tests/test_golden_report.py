"""Golden-file report test: the full Markdown report pinned byte-for-byte
from a hand-constructed record (the reference's report_full.md.golden +
golden_test.go pattern).  Regenerate with:

    python -m pytest tests/test_golden_report.py --regen-golden
"""

import os

import pytest

from jivetalking_tpu.report import Timings, render_markdown

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "report_full.md.golden")


def _record() -> dict:
    """A fully-populated synthetic record with fixed provenance."""
    spectral = {
        "mean": 6.89e-06, "variance": 6.24e-09, "centroid_hz": 7073.31,
        "spread_hz": 5254.60, "skewness": 0.85, "kurtosis": 5.16,
        "entropy": 0.0086, "flatness": 0.656, "crest": 31.74,
        "flux": 0.0006, "slope": -1.5e-05, "decrease": -0.0091,
        "rolloff_hz": 13092.45,
    }
    region_sample = {
        "rms_level_dbfs": -84.58, "peak_level_dbfs": -71.22,
        "crest_factor_db": 13.36,
        "momentary_lufs": -82.1, "short_term_lufs": -81.9,
        "true_peak_dbtp": -70.9, "sample_peak_dbfs": -71.22,
        "spectral": dict(spectral),
    }
    return {
        "schema_version": 1,
        "run": {
            "input_file": "EP83-mark.flac",
            "version": "0.1.0",
            "executable": "/usr/local/bin/jivetalking-tpu",
            "processed_at": "2026-06-11T17:20:55+01:00",
            "duration_s": 125.0,
            "sample_rate_hz": 44100,
            "channels": 1,
        },
        "loudness": {
            "target_i_lufs": -16.0,
            "stages": {
                "input": {
                    "integrated_lufs": -35.22, "true_peak_dbtp": -6.21,
                    "lra_lu": 15.01, "thresh_lufs": -45.22,
                    "momentary_lufs": -20.5, "short_term_lufs": -18.2,
                    "sample_peak_dbfs": -6.23, "target_offset_db": 19.22,
                },
                "filtered": {
                    "integrated_lufs": -25.10, "true_peak_dbtp": -19.95,
                    "lra_lu": 9.30, "thresh_lufs": -35.1,
                    "momentary_lufs": -21.0, "short_term_lufs": -22.0,
                    "sample_peak_dbfs": -19.99, "target_offset_db": 9.10,
                },
                "final": {
                    "integrated_lufs": -16.05, "true_peak_dbtp": -2.51,
                    "lra_lu": 7.10, "thresh_lufs": -26.05,
                    "momentary_lufs": -12.3, "short_term_lufs": -13.8,
                    "sample_peak_dbfs": -2.60, "target_offset_db": 0.05,
                },
            },
        },
        "dynamics": {
            "stages": {
                "input": {
                    "rms_level_dbfs": -44.46, "peak_level_dbfs": -6.22,
                    "crest_factor_astats_db": 38.24, "dynamic_range_db": 90.10,
                    "min_level_dbfs": -6.22, "max_level_dbfs": -7.61,
                    "rms_peak_dbfs": -16.14, "rms_trough_dbfs": -87.59,
                    "flat_factor": 0.0, "dc_offset": 0.0,
                    "zero_crossings_rate": 0.0453, "bit_depth": 14.0,
                    "entropy": 0.2357,
                },
            },
        },
        "spectral": {"stages": {"input": dict(spectral)}},
        "noise": {
            "floor_dbfs": -84.58, "floor_source": "vad_percentile",
            "floor_prescan_dbfs": -83.60, "floor_astats_dbfs": None,
            "room_tone_detect_level_dbfs": -82.60, "voice_activated": False,
            "floored_fraction": 0.1234, "reduction_headroom_db": 40.12,
        },
        "regions": {
            "room_tone": {
                "elected": {
                    "start_s": 7.0, "duration_s": 10.0,
                    "measured_floor_dbfs": -84.58, "peak_level_dbfs": -71.22,
                    "crest_factor_db": 13.36, "entropy": 0.0011,
                    **{f"spectral_{k}": v for k, v in spectral.items()},
                },
                "samples": {"input": dict(region_sample)},
            },
            "speech": {
                "elected": {
                    "region": {"start_s": 30.0, "end_s": 90.0, "duration_s": 60.0},
                    "rms_level_dbfs": -45.37, "peak_level_dbfs": -15.46,
                    "crest_factor_db": 29.91, "momentary_lufs": -40.93,
                    "true_peak_dbtp": -13.15,
                    "speech_band_body_rms_dbfs": -48.05,
                    "speech_band_sib_rms_dbfs": -55.87,
                    "voicing_density": 0.856, "score": 0.65,
                },
                "candidates_summary": {"evaluated_count": 3, "elected_score": 0.65},
                "samples": {},
            },
            "gate_statistics": {
                "voiced_low_percentile_dbfs": -52.1,
                "noise_high_percentile_dbfs": -78.4,
                "gate_separation_db": 26.3,
            },
        },
        "interval_summary": {
            "count": 500,
            "rms_distribution": {
                "min_dbfs": -90.1, "p10_dbfs": -84.2, "p25_dbfs": -71.0,
                "p50_dbfs": -52.3, "p75_dbfs": -45.8, "p90_dbfs": -41.2,
                "max_dbfs": -20.9,
            },
            "largest_gap_db": 6.4,
        },
        "filters": {
            "rumble_highpass": {"enabled": True, "frequency": 80.0, "poles": 2,
                                "width": 0.707},
            "bandlimit_lowpass": {"enabled": True, "frequency": 20500.0, "poles": 2},
            "noise_reduction": {
                "enabled": True, "strength": 1e-05, "patch_sec": 0.006,
                "research_sec": 0.002, "smooth": 3.0, "afftdn_enabled": True,
                "afftdn_noise_reduction": 12.0, "afftdn_noise_type": "custom",
                "afftdn_noise_floor": -80.0, "afftdn_track_noise": False,
            },
            "speech_gate": {"threshold_dbfs": -58.1, "ratio": 2.0, "attack": 5.0,
                            "release": 200.0, "range_db": -14.0, "knee": 3.0,
                            "detection": "rms"},
            "levelling_compressor": {"threshold": -35.4, "ratio": 3.0,
                                     "attack": 10.0, "release": 200.0,
                                     "knee": 4.0, "mix": 1.0},
            "deesser": {"intensity": 0.0, "amount": 0.5, "frequency": 0.8},
            "adeclick": {"threshold": 1.7, "window": 55.0, "overlap": 50.0,
                         "method": "s"},
            "diagnostics": {"afftdn_noise_type": "custom",
                            "speech_gate_depth_db": 14.0},
        },
        "normalisation": {
            "input_lufs": -25.10, "input_dbtp": -19.95,
            "output_lufs": -16.05, "output_dbtp": -2.51,
            "gain_applied_db": 9.05, "within_target": True, "skipped": False,
            "requested_target_lufs": -16.0, "effective_target_lufs": -16.0,
            "linear_mode_forced": False, "limiter_enabled": False,
            "ceiling_dbtp": 0.0, "pre_gain_db": 0.0,
        },
    }


def test_full_report_golden(request):
    md = render_markdown(
        _record(),
        Timings(analysis_s=2.0, processing_s=90.0, measuring_s=3.0,
                normalising_s=12.0, realtime_factor=12.5),
    )
    if request.config.getoption("--regen-golden", default=False):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        open(GOLDEN_PATH, "w").write(md)
        pytest.skip("golden regenerated")
    assert os.path.exists(GOLDEN_PATH), "golden missing; run with --regen-golden"
    golden = open(GOLDEN_PATH).read()
    assert md == golden
