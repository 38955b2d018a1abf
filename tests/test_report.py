"""Run-record + Markdown report tests (mirrors the reference's report/*_test.go
tier, including a golden-file pin of the full analysis report shape)."""

import json
import math
import os

import numpy as np
import pytest

from jivetalking_tpu.report import (
    Timings,
    analysis_report_path,
    new_analysis_run_record,
    output_audio_path,
    render_markdown,
    sanitize_json,
    write_interval_sidecar,
    write_run_record,
)
from jivetalking_tpu.analysis import analyse_audio


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


def _noise(dbfs, secs, seed=0, sr=SR):
    rng = np.random.default_rng(seed)
    return (10 ** (dbfs / 20.0) * rng.standard_normal(int(secs * sr))).astype(np.float32)


@pytest.fixture(scope="module")
def measurements():
    x = np.concatenate([
        _speechlike(-22.0, 15.0, seed=3),
        _noise(-56.0, 12.0, seed=1),
        _speechlike(-22.0, 12.0, seed=4),
    ])
    return analyse_audio(x, SR)


class TestSanitize:
    def test_nan_inf_to_null(self):
        d = {"a": math.nan, "b": [1.0, math.inf], "c": {"d": -math.inf, "e": 2.0}}
        out = sanitize_json(d)
        assert out == {"a": None, "b": [1.0, None], "c": {"d": None, "e": 2.0}}

    def test_numpy_types(self):
        out = sanitize_json({"x": np.float32(1.5), "y": np.int64(3),
                             "z": np.array([1.0, math.nan])})
        assert out == {"x": 1.5, "y": 3, "z": [1.0, None]}


class TestAnalysisRecord:
    def test_schema_and_blocks(self, measurements):
        rec = new_analysis_run_record("ep1.wav", measurements)
        assert rec["schema_version"] == 1
        assert rec["run"]["input_file"] == "ep1.wav"
        assert rec["run"]["sample_rate_hz"] == SR
        assert "input" in rec["loudness"]["stages"]
        assert "filtered" not in rec["loudness"]["stages"]
        assert rec["noise"]["floor_source"] == "vad_percentile"
        assert "room_tone" in rec["regions"]
        assert "gate_statistics" in rec["regions"]
        # analysis-only drops processing blocks
        assert "filters" not in rec
        assert "normalisation" not in rec

    def test_json_serialisable(self, measurements):
        rec = new_analysis_run_record("ep1.wav", measurements)
        s = json.dumps(rec)
        assert "NaN" not in s and "Infinity" not in s

    def test_interval_summary(self, measurements):
        rec = new_analysis_run_record("ep1.wav", measurements)
        s = rec["interval_summary"]
        assert s["count"] == len(measurements.intervals)
        dist = s["rms_distribution"]
        assert dist["min_dbfs"] <= dist["p50_dbfs"] <= dist["max_dbfs"]
        assert s["largest_gap_db"] >= 0

    def test_atomic_write(self, measurements, tmp_path):
        rec = new_analysis_run_record("ep1.wav", measurements)
        path = str(tmp_path / "rec.json")
        write_run_record(path, rec)
        assert json.load(open(path))["schema_version"] == 1
        assert not [f for f in os.listdir(tmp_path) if f.startswith(".")]

    def test_interval_sidecar(self, measurements, tmp_path):
        path = str(tmp_path / "rec.intervals.jsonl")
        write_interval_sidecar(path, measurements.intervals)
        lines = open(path).read().splitlines()
        assert len(lines) == len(measurements.intervals)
        row = json.loads(lines[0])
        assert {"timestamp_s", "rms_dbfs", "momentary_lufs"} <= set(row)

    def test_interval_sidecar_flat_spectral_fields(self, measurements, tmp_path):
        # (ref: TestIntervalSampleJSON_PreservesFlatSpectralFields,
        # analyser_test.go:29-132): interval rows flatten spectral metrics
        # as spectral_* keys with NO nested spectral object
        path = str(tmp_path / "rec.intervals.jsonl")
        write_interval_sidecar(path, measurements.intervals)
        row = json.loads(open(path).read().splitlines()[0])
        want_flat = {
            "spectral_mean", "spectral_variance", "spectral_centroid_hz",
            "spectral_spread_hz", "spectral_skewness", "spectral_kurtosis",
            "spectral_entropy", "spectral_flatness", "spectral_crest",
            "spectral_flux", "spectral_slope", "spectral_decrease",
            "spectral_rolloff_hz",
        }
        assert want_flat <= set(row)
        assert "spectral" not in row
        # round-trip: the flat values mirror the in-memory interval table
        iv = measurements.intervals
        from jivetalking_tpu.report.runrecord import _SPECTRAL_KEY
        for k in iv.spectral:
            assert row[f"spectral_{_SPECTRAL_KEY[k]}"] == pytest.approx(
                float(iv.spectral[k][0]), nan_ok=True)


class TestMarkdown:
    def test_analysis_report_sections(self, measurements):
        rec = new_analysis_run_record("ep1.wav", measurements)
        md = render_markdown(rec)
        assert md.startswith("# Audio Processing Report")
        for section in ["## Run", "## Loudness", "## Dynamics", "## Spectral",
                        "## Noise Floor", "## Regions", "## Interval Summary"]:
            assert section in md, section
        # analysis-only drops processing sections
        assert "## Processing Summary" not in md
        assert "## Filter Chain" not in md
        assert "## Normalisation" not in md

    def test_timings_section(self, measurements):
        rec = new_analysis_run_record("ep1.wav", measurements)
        md = render_markdown(rec, Timings(analysis_s=2.0, processing_s=90.0,
                                          normalising_s=12.0, realtime_factor=12.5))
        assert "## Processing Summary" in md
        assert "1m 30s" in md
        assert "12.5x" in md

    def test_digital_silence_and_floor_tokens(self):
        # -inf and <= -120 render the silence token on dB axes; exactly -70
        # LUFS is a real measurement, strictly below is the floor token
        # (ref: mdtable.go:80-131)
        from jivetalking_tpu.report.render import _fmt
        import math

        assert _fmt(-math.inf, "dBFS") == "< -120"
        assert _fmt(-120.0, "dBFS") == "< -120"
        assert _fmt(-119.9, "dBFS") == "-119.90"
        assert _fmt(-math.inf, "LUFS") == "< -70"
        assert _fmt(-70.001, "LUFS") == "< -70"
        assert _fmt(-70.0, "LUFS") == "-70.00"
        assert _fmt(math.nan, "dBFS") == "-"
        assert _fmt(math.inf, "LUFS") == "-"

    def test_placeholder_formatting(self):
        from jivetalking_tpu.report.render import _fmt

        assert _fmt(None) == "-"
        assert _fmt(math.nan) == "-"
        assert _fmt(-130.0, "dBFS") == "< -120"
        assert _fmt(-75.0, "LUFS") == "< -70"
        assert _fmt(True) == "yes"


class TestPaths:
    def test_output_naming(self):
        assert output_audio_path("/x/ep1.flac") == "/x/ep1-LUFS-16-processed.flac"
        assert analysis_report_path("/x/ep1.flac") == "/x/ep1-flac-analysis.md"

    @pytest.mark.parametrize(
        "name,path,want",
        [
            # (ref: TestGenerateLUFSOutputPath, processor_test.go:18-40)
            ("lowercase wav", "/tmp/foo.wav", "/tmp/foo-LUFS-16-processed.flac"),
            ("uppercase WAV", "/tmp/foo.WAV", "/tmp/foo-LUFS-16-processed.flac"),
            ("flac input", "/tmp/foo.flac", "/tmp/foo-LUFS-16-processed.flac"),
            ("mp3 input", "/tmp/foo.mp3", "/tmp/foo-LUFS-16-processed.flac"),
            ("no extension", "/tmp/foo", "/tmp/foo-LUFS-16-processed.flac"),
            ("multi-dot", "/tmp/foo.bar.wav", "/tmp/foo.bar-LUFS-16-processed.flac"),
        ],
    )
    def test_output_naming_extension_table(self, name, path, want):
        assert output_audio_path(path, -16.0) == want, name


class TestCanonicalKeys:
    """The §8.4 canonical key contract (ref: runrecord_tags_test.go:87-163):
    suffixed units everywhere, no legacy un-suffixed keys."""

    WANT = [
        "loudness", "dynamics", "noise", "regions",
        "integrated_lufs", "true_peak_dbtp", "lra_lu", "thresh_lufs",
        "target_offset_db", "momentary_lufs", "short_term_lufs",
        "sample_peak_dbfs",
        "rms_level_dbfs", "peak_level_dbfs", "dynamic_range_db",
        "crest_factor_astats_db", "rms_trough_dbfs", "rms_peak_dbfs",
        "dc_offset", "flat_factor", "zero_crossings_rate", "min_level_dbfs",
        "max_level_dbfs", "bit_depth", "number_of_samples",
        "noise_floor_count", "entropy",
        "floor_dbfs", "floor_source", "floor_prescan_dbfs",
        "floor_astats_dbfs", "reduction_headroom_db",
        "room_tone_detect_level_dbfs", "voice_activated", "floored_fraction",
        "centroid_hz", "spread_hz", "rolloff_hz",
        "voiced_low_percentile_dbfs", "noise_high_percentile_dbfs",
        "gate_separation_db",
        "crest_factor_db",
        "measured_floor_dbfs", "spectral_centroid_hz", "spectral_mean",
        "spectral_variance", "spectral_spread_hz", "spectral_skewness",
        "spectral_entropy", "spectral_crest", "spectral_flux",
        "spectral_slope", "spectral_decrease", "spectral_rolloff_hz",
    ]
    ABSENT = [
        "input_i", "input_tp", "input_lra", "input_thresh",
        "rms_level", "peak_level", "dynamic_range", "crest_factor",
        "target_offset", "momentary_loudness", "short_term_loudness",
        "sample_peak", "floor", "floor_prescan", "floor_astats",
        "reduction_headroom", "room_tone_detect_level", "min_level",
        "max_level", "zero_crossings",
        "spectral_centroid", "spectral_spread", "spectral_rolloff",
        "suggested_gate_threshold", "measured_noise_floor",
    ]

    def _keys(self, tree, keys):
        if isinstance(tree, dict):
            for k, v in tree.items():
                keys.add(k)
                self._keys(v, keys)
        elif isinstance(tree, list):
            for v in tree:
                self._keys(v, keys)
        return keys

    def test_analysis_record_keys(self, measurements):
        rec = sanitize_json(new_analysis_run_record("x.wav", measurements))
        keys = self._keys(rec, set())
        missing = [k for k in self.WANT if k not in keys]
        legacy = [k for k in self.ABSENT if k in keys]
        assert not missing, f"missing canonical keys: {missing}"
        assert not legacy, f"legacy keys present: {legacy}"


class TestOutputPathVectors:
    """(ref: processor_test.go:18-63)."""

    @pytest.mark.parametrize(
        "inp,want",
        [
            ("/tmp/foo.wav", "/tmp/foo-LUFS-16-processed.flac"),
            ("/tmp/foo.WAV", "/tmp/foo-LUFS-16-processed.flac"),
            ("/tmp/foo.flac", "/tmp/foo-LUFS-16-processed.flac"),
            ("/tmp/foo.mp3", "/tmp/foo-LUFS-16-processed.flac"),
            ("/tmp/foo", "/tmp/foo-LUFS-16-processed.flac"),
            ("/tmp/foo.bar.wav", "/tmp/foo.bar-LUFS-16-processed.flac"),
        ],
    )
    def test_naming(self, inp, want):
        assert output_audio_path(inp) == want

    @pytest.mark.parametrize(
        "lufs,nn",
        [(-16.4, 16), (-16.5, 17), (-16.6, 17), (-15.5, 16)],
    )
    def test_filename_value_rounds_half_away(self, lufs, nn):
        assert output_audio_path("/x/a.wav", lufs) == f"/x/a-LUFS-{nn}-processed.flac"


class TestSpectrogramConventions:
    """(ref: spectrogram_paths.go:8-92, sections_spectrograms.go)."""

    def test_path_convention(self):
        from jivetalking_tpu.report.spectrogram import spectrogram_path

        assert (spectrogram_path("ep-LUFS-16-processed", "whole", "before")
                == "ep-LUFS-16-processed.spectrogram-whole-before.png")

    def test_derived_images_all_or_nothing_per_kind(self):
        from jivetalking_tpu.report.spectrogram import (
            ANALYSIS_STAGES,
            PROCESSING_STAGES,
            derive_spectrogram_images,
        )

        imgs = derive_spectrogram_images(
            "/x/ep-LUFS-16-processed", PROCESSING_STAGES,
            has_room_tone=True, has_speech=False)
        assert len(imgs) == 4  # whole + roomtone, before/after each
        assert all(i["path"].startswith("ep-LUFS-16-processed.spectrogram-")
                   for i in imgs)  # relative basenames
        assert {i["kind"] for i in imgs} == {"whole", "roomtone"}

        imgs = derive_spectrogram_images(
            "/x/ep-wav-analysis", ANALYSIS_STAGES,
            has_room_tone=True, has_speech=True)
        assert len(imgs) == 3
        assert {i["stage"] for i in imgs} == {"input"}

    def test_report_section_renders_links(self):
        rec = {
            "run": {"input_file": "ep.wav", "sample_rate_hz": 44100,
                    "channels": 1, "duration_s": 1.0},
            "spectrograms": [
                {"kind": "whole", "stage": "before",
                 "path": "ep-LUFS-16-processed.spectrogram-whole-before.png"},
                {"kind": "whole", "stage": "after",
                 "path": "ep-LUFS-16-processed.spectrogram-whole-after.png"},
            ],
        }
        md = render_markdown(rec)
        assert "## Spectrograms" in md
        assert "![whole before](ep-LUFS-16-processed.spectrogram-whole-before.png)" in md
        # empty list -> no heading
        rec["spectrograms"] = []
        assert "## Spectrograms" not in render_markdown(rec)


class TestDefinitionsCatalogue:
    """ref: report/definitions_test.go — the catalogue is complete, labelled,
    glossed, and unit-tagged wherever the key is dimensioned."""

    def test_spectral_thirteen_covered(self):
        from jivetalking_tpu.report.definitions import DEFINITIONS

        for key in ("mean", "variance", "centroid_hz", "spread_hz",
                    "skewness", "kurtosis", "entropy", "flatness", "crest",
                    "flux", "slope", "decrease", "rolloff_hz"):
            assert key in DEFINITIONS, key

    def test_non_empty_label_and_gloss(self):
        from jivetalking_tpu.report.definitions import DEFINITIONS

        for key, (label, gloss, _unit) in DEFINITIONS.items():
            assert label.strip(), key
            assert gloss.strip(), key
            assert gloss.strip().endswith("."), key

    def test_dimensioned_keys_carry_units(self):
        from jivetalking_tpu.report.definitions import DEFINITIONS

        suffix_unit = {
            "_dbfs": "dBFS", "_dbtp": "dBTP", "_lufs": "LUFS",
            "_lu": "LU", "_hz": "Hz", "_db": "dB", "_s": "s",
        }
        # the reference keeps loudnorm's key name but the semantically
        # correct unit: a loudness offset is LU (definitions.go:72-76)
        exceptions = {"target_offset_db": "LU"}
        for key, (_label, _gloss, unit) in DEFINITIONS.items():
            if key in exceptions:
                assert unit == exceptions[key], key
                continue
            for sfx, want in suffix_unit.items():
                if key.endswith(sfx):
                    assert unit == want, (key, unit, want)
                    break

    def test_core_record_keys_have_definitions(self):
        from jivetalking_tpu.report.definitions import DEFINITIONS

        required = [
            "integrated_lufs", "true_peak_dbtp", "lra_lu", "thresh_lufs",
            "momentary_lufs", "short_term_lufs", "sample_peak_dbfs",
            "rms_level_dbfs", "peak_level_dbfs", "crest_factor_astats_db",
            "dynamic_range_db", "rms_peak_dbfs", "rms_trough_dbfs",
            "flat_factor", "dc_offset", "zero_crossings_rate", "bit_depth",
            "floor_dbfs", "floor_source", "voice_activated",
            "floored_fraction", "reduction_headroom_db",
            "centroid_hz", "spread_hz", "rolloff_hz",
            "start_s", "duration_s", "crest_factor_db",
            "speech_band_body_rms_dbfs", "speech_band_sib_rms_dbfs",
        ]
        missing = [k for k in required if k not in DEFINITIONS]
        assert not missing, missing


class TestSpectrogramSourceAndBounds:
    """Kind→bounds and stage→source resolution rules (ref:
    TestSpectrogramSourceResolution / TestSpectrogramBoundsResolution,
    internal/processor/spectrogram_test.go:170-250).  The rebuild renders
    from in-memory PCM rather than re-decoding files, so the stage→source
    mapping is pinned at the `stage_audio` contract: before/input carry
    the raw input PCM, after carries the processed delivery (at ITS
    rate)."""

    def _record_calls(self, monkeypatch):
        calls = []

        def fake_render(audio, rate, path, start=None, duration=None):
            calls.append({"audio": audio, "rate": rate, "path": path,
                          "start": start, "duration": duration})
            return path

        import jivetalking_tpu.report.spectrogram as sg

        monkeypatch.setattr(sg, "render_spectrogram_image", fake_render)
        return calls

    def test_whole_bounds_are_none_regions_use_election(self, monkeypatch):
        from types import SimpleNamespace

        from jivetalking_tpu.report.spectrogram import render_run_spectrograms

        calls = self._record_calls(monkeypatch)
        render_run_spectrograms(
            "stem", {"before": np.zeros(16)}, 48000,
            noise_region=SimpleNamespace(start=2.0, duration=10.0),
            speech_region=SimpleNamespace(start=30.0, duration=10.0),
        )
        by_kind = {c["path"].split("-")[1]: c for c in calls}
        assert by_kind["whole"]["start"] is None
        assert by_kind["whole"]["duration"] is None
        assert (by_kind["roomtone"]["start"], by_kind["roomtone"]["duration"]) == (2.0, 10.0)
        assert (by_kind["speech"]["start"], by_kind["speech"]["duration"]) == (30.0, 10.0)

    def test_unelected_kinds_are_omitted(self, monkeypatch):
        # no elected profile -> the kind is skipped, never rendered whole
        # (ref: nil_elected_profile guard, spectrogram_test.go:240-249)
        from jivetalking_tpu.report.spectrogram import render_run_spectrograms

        calls = self._record_calls(monkeypatch)
        render_run_spectrograms("stem", {"before": np.zeros(16)}, 48000)
        assert [c["path"] for c in calls] == ["stem.spectrogram-whole-before.png"]

    def test_stage_rate_override(self, monkeypatch):
        # the delivery stage renders at ITS OWN rate (44.1k) while the
        # input stages render at the source rate (the reference re-decodes
        # each source file, picking up its rate implicitly)
        from jivetalking_tpu.report.spectrogram import render_run_spectrograms

        calls = self._record_calls(monkeypatch)
        before, after = np.zeros(16), np.zeros(12)
        render_run_spectrograms(
            "stem", {"before": before, "after": (after, 44100)}, 48000)
        by_stage = {c["path"].rsplit("-", 1)[1]: c for c in calls}
        assert by_stage["before.png"]["rate"] == 48000
        assert by_stage["before.png"]["audio"] is before
        assert by_stage["after.png"]["rate"] == 44100
        assert by_stage["after.png"]["audio"] is after


class TestCandidatesSidecar:
    """(ref: TestWriteCandidatesSidecar_TaggedLines +
    TestCandidateSidecarLine_MarshalNonFiniteNulled,
    runrecord_sidecar_test.go)."""

    def _m(self, scores):
        from jivetalking_tpu.analysis.analyser import AudioMeasurements
        from jivetalking_tpu.analysis.types import (
            Region,
            RegionSample,
            SpeechCandidate,
        )

        m = AudioMeasurements()
        m.vad.speech_candidates = [
            SpeechCandidate(region=Region(10.0 * i, 30.0),
                            sample=RegionSample(rms_level=-24.0),
                            score=s)
            for i, s in enumerate(scores)
        ]
        return m

    def test_one_tagged_line_per_candidate(self, tmp_path):
        from jivetalking_tpu.report.runrecord import write_candidates_sidecar

        path = str(tmp_path / "rec.candidates.jsonl")
        write_candidates_sidecar(path, self._m([9.0, 8.0]))
        lines = open(path).read().splitlines()
        assert len(lines) == 2
        for line in lines:
            obj = json.loads(line)
            assert obj["kind"] == "speech"
            assert "score" in obj  # candidate fields spliced alongside the tag

    def test_non_finite_nulled(self, tmp_path):
        from jivetalking_tpu.report.runrecord import write_candidates_sidecar

        path = str(tmp_path / "rec.candidates.jsonl")
        write_candidates_sidecar(path, self._m([float("nan")]))
        obj = json.loads(open(path).read().splitlines()[0])
        assert obj["score"] is None  # NaN -> null, never literal NaN

    def test_interval_sidecar_non_finite_nulled(self, measurements, tmp_path):
        # (ref: TestIntervalSample_MarshalNonFiniteNulled)
        import copy

        from jivetalking_tpu.report.runrecord import write_interval_sidecar

        iv = copy.deepcopy(measurements.intervals)
        iv.momentary_lufs[0] = float("-inf")
        iv.spectral["flux"][0] = float("nan")
        path = str(tmp_path / "rec.intervals.jsonl")
        write_interval_sidecar(path, iv)
        row = json.loads(open(path).read().splitlines()[0])
        assert row["momentary_lufs"] is None
        assert row["spectral_flux"] is None
