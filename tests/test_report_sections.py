"""Report renderer behavioural vectors ported from the reference's report
suite (ref: internal/report/mdtable_test.go, render_test.go,
sections_test.go, sections_filters_test.go).  The renderer consumes only
the record dict — never re-measures (render.go:1-10)."""

import math

import pytest

from jivetalking_tpu.report.render import (
    Timings,
    _escape_cell,
    _fmt,
    _table,
    render_markdown,
)


def full_record() -> dict:
    """A full processing record covering every section (the shape
    new_run_record emits; values chosen to match the reference's
    fullLoudnessRecord spot values where cited)."""
    stages = {
        "input": {"integrated_lufs": -35.22, "true_peak_dbtp": -19.95,
                  "lra_lu": 7.2, "thresh_lufs": -45.2, "momentary_lufs": -20.1,
                  "short_term_lufs": -25.3, "sample_peak_dbfs": -20.2,
                  "target_offset_db": 19.22},
        "filtered": {"integrated_lufs": -25.10, "true_peak_dbtp": -18.2,
                     "lra_lu": 6.8, "thresh_lufs": -35.1,
                     "momentary_lufs": -18.0, "short_term_lufs": -21.0,
                     "sample_peak_dbfs": -18.5, "target_offset_db": 9.10},
        "final": {"integrated_lufs": -16.05, "true_peak_dbtp": -2.51,
                  "lra_lu": 6.5, "thresh_lufs": -26.1, "momentary_lufs": -9.8,
                  "short_term_lufs": -12.2, "sample_peak_dbfs": -3.1,
                  "target_offset_db": 0.05},
    }
    return {
        "schema_version": 1,
        "run": {"input_file": "EP83-mark.flac", "version": "test",
                "executable": "jivetalking-tpu",
                "processed_at": "2026-06-11T17:20:55+01:00",
                "duration_s": 2856.9, "sample_rate_hz": 44100, "channels": 1},
        "loudness": {"stages": stages},
        "dynamics": {"stages": {
            "input": {"rms_level_dbfs": -40.1, "peak_level_dbfs": -20.2,
                      "crest_factor_astats_db": 19.9, "entropy": 0.55},
        }},
        "spectral": {"stages": {
            "input": {"centroid_hz": 3348.05, "flatness": 0.255,
                      "kurtosis": 12.80, "flux": 0.004},
        }},
        "noise": {"floor_dbfs": -84.58, "floor_source": "vad_percentile",
                  "floor_prescan_dbfs": -83.60, "voice_activated": False,
                  "floored_fraction": 0.1234, "reduction_headroom_db": 40.12},
        "regions": {
            "room_tone": {"elected": {"start_s": 7.0, "duration_s": 10.0,
                                      "measured_floor_dbfs": -84.58,
                                      "peak_level_dbfs": -71.22,
                                      "crest_factor_db": 13.36,
                                      "entropy": 0.0011}},
            "speech": {"elected": {
                "region": {"start_s": 1467.0, "duration_s": 60.0},
                "rms_level_dbfs": -45.37, "peak_level_dbfs": -15.46,
                "crest_factor_db": 29.91, "momentary_lufs": -40.93,
                "true_peak_dbtp": -13.15,
                "speech_band_body_rms_dbfs": -48.05,
                "speech_band_sib_rms_dbfs": -55.87,
                "voicing_density": 0.856, "score": 0.65,
            }, "candidates_summary": {"evaluated_count": 2,
                                      "elected_score": 0.65}},
            "gate_statistics": {"voiced_low_percentile_dbfs": -34.20,
                                "noise_high_percentile_dbfs": -78.50,
                                "gate_separation_db": 44.30},
        },
        "interval_summary": {"count": 20, "rms_distribution": {
            "min_dbfs": -86.0, "p10_dbfs": -80.0, "p50_dbfs": -60.0,
            "p90_dbfs": -35.0, "max_dbfs": -29.0}, "largest_gap_db": 6.0},
        "filters": {
            "rumble_highpass": {"frequency": 80.0, "poles": 2,
                                "width": 0.707, "enabled": True},
            "speech_gate": {"threshold_dbfs": -47.2, "ratio": 2.0,
                            "attack": 5.0, "release": 200.0,
                            "range_db": -14.0, "knee": 3.0,
                            "detection": "rms"},
        },
        "normalisation": {"input_lufs": -25.10, "input_dbtp": -19.95,
                          "output_lufs": -16.05, "output_dbtp": -2.51,
                          "gain_applied_db": 9.05, "within_target": True,
                          "requested_target_lufs": -16.0,
                          "effective_target_lufs": -16.0,
                          "linear_mode_forced": False, "ceiling_dbtp": 0.0,
                          "pre_gain_db": 0.0},
    }


def analysis_record() -> dict:
    rec = full_record()
    rec.pop("filters")
    rec.pop("normalisation")
    for domain in ("loudness", "dynamics", "spectral"):
        stages = rec[domain]["stages"]
        rec[domain]["stages"] = {"input": stages["input"]}
    return rec


class TestMdTable:
    """(ref: TestMdTableStructure / ShortRowPadding / EscapesCellContent /
    EscapeCellPassThrough, mdtable_test.go:11-84)."""

    def test_structure(self):
        got = _table(["Metric", "Value"],
                     [["Integrated", "-16.0"], ["True Peak", "-1.5"],
                      ["LRA", "7.2"]])
        assert got == ("| Metric | Value |\n"
                       "| --- | --- |\n"
                       "| Integrated | -16.0 |\n"
                       "| True Peak | -1.5 |\n"
                       "| LRA | 7.2 |")

    def test_short_row_pads_long_row_truncates(self):
        got = _table(["A", "B"], [["only-a"], ["x", "y", "z"]])
        assert got == ("| A | B |\n"
                       "| --- | --- |\n"
                       "| only-a | - |\n"
                       "| x | y |")

    def test_escapes_pipes_and_newlines(self):
        got = _table(["Metric", "Definition"],
                     [["Peak", "20*log10(max(|min|,|max|))"],
                      ["Multi\nline", "carriage\rreturn"]])
        assert got == ("| Metric | Definition |\n"
                       "| --- | --- |\n"
                       "| Peak | 20*log10(max(\\|min\\|,\\|max\\|)) |\n"
                       "| Multi line | carriage return |")

    def test_escape_passthrough(self):
        assert _escape_cell("Integrated -16.0 LUFS") == "Integrated -16.0 LUFS"


class TestDigitalSilenceBoundaries:
    """(ref: TestIsDigitalSilence, mdtable_test.go:85-104)."""

    @pytest.mark.parametrize("v,want", [
        (-math.inf, "< -120"),
        (-120.0, "< -120"),
        (-120.1, "< -120"),
        (-119.9, "-119.90"),
        (-60.0, "-60.00"),
        (0.0, "0.00"),
    ])
    def test_db_axis(self, v, want):
        assert _fmt(v, "dBFS") == want


class TestSignedTargetOffset:
    """(ref: formatMetricSigned + '+19.22' in TestRenderLoudnessFullStages,
    sections_test.go:145-163)."""

    def test_positive_offset_renders_plus(self):
        md = render_markdown(full_record())
        assert "+19.22" in md
        assert "+9.10" in md
        assert "+0.05" in md

    def test_fmt_signed(self):
        assert _fmt(19.22, "LU", signed=True) == "+19.22"
        assert _fmt(-2.5, "LU", signed=True) == "-2.50"


class TestSectionOrder:
    """(ref: TestRenderMarkdownSectionOrder, render_test.go:42-77)."""

    def test_full_report_order(self):
        md = render_markdown(full_record(), Timings(
            analysis_s=2.0, processing_s=90.0, realtime_factor=12.5))
        order = ["# Audio Processing Report", "## Processing Summary",
                 "## Loudness", "## Dynamics", "## Spectral",
                 "## Noise Floor", "## Regions", "## Interval Summary",
                 "## Filter Chain", "## Normalisation"]
        last = -1
        for heading in order:
            idx = md.find(heading)
            assert idx != -1, heading
            assert idx > last, heading
            last = idx

    def test_header_content(self):
        # (ref: TestRenderHeader, sections_test.go:104-118)
        md = render_markdown(full_record())
        for want in ("EP83-mark.flac", "2026-06-11T17:20:55+01:00",
                     "44.1 kHz", "mono"):
            assert want in md, want

    def test_processing_summary_zero_omitted(self):
        # (ref: TestRenderProcessingSummaryZeroOmitted)
        assert "## Processing Summary" not in render_markdown(
            full_record(), Timings())

    def test_processing_summary_populated(self):
        md = render_markdown(full_record(), Timings(
            analysis_s=2.0, processing_s=90.0, realtime_factor=12.5))
        for want in ("Pass 1 (analysis)", "Pass 2 (filter chain)",
                     "Real-time factor", "12.5x", "1m 30s"):
            assert want in md, want


class TestAnalysisOnly:
    """(ref: TestRenderMarkdownAnalysisOnlyOmitsProcessingSections +
    TestRenderPass1OnlyOmitsStageColumns, render_test.go:78-116,
    sections_test.go:209-220)."""

    def test_omits_processing_sections(self):
        md = render_markdown(analysis_record())
        for banned in ("## Processing Summary", "## Filter Chain",
                       "## Normalisation", "Spectrograms"):
            assert banned not in md, banned
        assert "| Metric | Definition | Input | Filtered | Final |" not in md
        for want in ("# Audio Processing Report", "## Loudness",
                     "## Noise Floor", "## Regions", "## Interval Summary"):
            assert want in md, want

    def test_stage_columns_input_only(self):
        md = render_markdown(analysis_record())
        assert "| Metric | Definition | Input |" in md


class TestNoDanglingHeadings:
    """(ref: TestRenderMarkdownNoDanglingHeadings, render_test.go:117-128)."""

    def test_no_triple_newline(self):
        for rec in (full_record(), analysis_record()):
            md = render_markdown(rec, Timings(analysis_s=1.0))
            assert "\n\n\n" not in md

    def test_nil_record_empty(self):
        # (ref: TestRenderMarkdownNilRecord)
        assert render_markdown({}) == ""
        assert render_markdown(None) == ""


class TestNoInterpretationTokens:
    """(ref: TestRenderNoInterpretationTokens, sections_test.go:239-247):
    the report states numbers, never editorialises."""

    def test_banned_tokens_absent(self):
        md = render_markdown(full_record(), Timings(analysis_s=1.0))
        for banned in ("warm", "bright", "tonal", "broadband", "good",
                       "Character", "✓", "⚠", "❌"):
            assert banned not in md, banned


class TestRegionsAndGateStats:
    """(ref: TestRenderRegionsElected / TestRenderGateStatistics /
    TestRenderSpeechCandidateCountOnly, sections_test.go:359-439)."""

    def test_elected_profiles_render(self):
        md = render_markdown(full_record())
        for want in ("### Room Tone", "### Speech", "-84.58", "-45.37",
                     "1467.00", "60.00"):
            assert want in md, want

    def test_gate_statistics(self):
        md = render_markdown(full_record())
        for want in ("### Gate Statistics", "-34.20", "-78.50", "44.30"):
            assert want in md, want

    def test_candidate_count(self):
        md = render_markdown(full_record())
        assert "Evaluated count" in md
        assert "| Evaluated count | Number of region candidates evaluated. | 2 |" in md


class TestNormalisationNumbers:
    """(ref: TestRenderNormalisationNumbers / NoGlyphs,
    sections_filters_test.go:149-215)."""

    def test_numbers_present(self):
        md = render_markdown(full_record())
        for want in ("-16.00", "9.05", "-25.10", "-2.51"):
            assert want in md, want

    def test_filter_chain_order(self):
        # (ref: TestRenderFiltersChainOrder) — HP before gate
        md = render_markdown(full_record())
        assert md.find("Rumble high-pass") < md.find("Speech gate")


class TestPass1OnlyStageColumns:
    """(ref: TestRenderPass1OnlyOmitsStageColumns, sections_test.go:209)."""

    def test_input_only_headers(self):
        md = render_markdown(analysis_record())
        for section in ("## Loudness", "## Dynamics", "## Spectral"):
            body = md.split(section, 1)[1].split("##", 1)[0]
            header = [ln for ln in body.splitlines() if ln.startswith("| Metric")][0]
            assert "Input" in header
            assert "Filtered" not in header and "Final" not in header

    def test_full_record_has_all_stage_columns(self):
        md = render_markdown(full_record())
        body = md.split("## Loudness", 1)[1].split("##", 1)[0]
        header = [ln for ln in body.splitlines() if ln.startswith("| Metric")][0]
        for col in ("Input", "Filtered", "Final"):
            assert col in header


class TestNaNLeafPlaceholder:
    """(ref: TestRenderNaNLeafPlaceholder, sections_test.go:221): a NaN
    leaf renders the placeholder cell, never 'nan'."""

    def test_nan_renders_placeholder(self):
        rec = analysis_record()
        rec["dynamics"]["stages"]["input"]["rms_trough_dbfs"] = math.nan
        md = render_markdown(rec)
        body = md.split("## Dynamics", 1)[1].split("##", 1)[0]
        row = [ln for ln in body.splitlines() if "trough" in ln.lower()]
        assert row, body
        assert "nan" not in row[0].lower()
        assert "| - |" in row[0].replace("— ", "- ").replace(" -", " -")


class TestSpeechCandidateCountOnly:
    """(ref: TestRenderSpeechCandidateCountOnly, sections_test.go:420):
    the inline record renders a candidate COUNT + elected score, never a
    ranked per-candidate list."""

    def test_count_and_score_only(self):
        md = render_markdown(full_record())
        body = md.split("### Speech", 1)[1]
        assert "**Candidates**" in body
        assert "Evaluated" in body and "| 2 |" in body
        assert "0.65" in body
        for banned in ("Candidate 1", "Candidate 2", "Rank"):
            assert banned not in body, banned


class TestRegionSamplesStages:
    """(ref: TestRenderRegionSamplesStages :440 + NilInputPlaceholder
    :464, adapted to this renderer's omit-when-empty convention)."""

    def test_samples_input_only_in_analysis_mode(self):
        rec = analysis_record()
        rec["regions"]["speech"]["samples"] = {
            "input": {"rms_level_dbfs": -45.4, "peak_level_dbfs": -15.5,
                      "crest_factor_db": 29.9}}
        md = render_markdown(rec)
        body = md.split("### Speech", 1)[1].split("### Gate", 1)[0]
        assert "**Samples**" in body
        table = body.split("**Samples**", 1)[1]
        header = [ln for ln in table.splitlines()
                  if ln.startswith("| Metric")][0]
        assert "Input" in header
        assert "Filtered" not in header and "Final" not in header

    def test_nil_input_does_not_crash(self):
        rec = analysis_record()
        rec["regions"]["room_tone"]["samples"] = {"input": None}
        md = render_markdown(rec)   # must not raise
        assert "### Room Tone" in md

    def test_full_record_samples_all_stages(self):
        rec = full_record()
        sample = {"rms_level_dbfs": -55.0, "peak_level_dbfs": -45.0,
                  "crest_factor_db": 10.0}
        rec["regions"]["room_tone"]["samples"] = {
            "input": dict(sample), "filtered": dict(sample),
            "final": dict(sample)}
        md = render_markdown(rec)
        body = md.split("### Room Tone", 1)[1].split("### Speech", 1)[0]
        table = body.split("**Samples**", 1)[1]
        header = [ln for ln in table.splitlines() if ln.startswith("| Metric")][0]
        for col in ("Input", "Filtered", "Final"):
            assert col in header


class TestIntervalSummarySection:
    """(ref: TestRenderIntervalSummary :481 + NilOmitted :504)."""

    def test_renders_count_percentiles_gap(self):
        md = render_markdown(full_record())
        body = md.split("## Interval Summary", 1)[1].split("##", 1)[0]
        assert "Interval count" in body and "| 20 |" in body
        assert "RMS p50" in body and "RMS p90" in body
        assert "Largest gap" in body
        # catalogue glosses ride along (ref metricDefinition unit suffix)
        assert "Median interval RMS above digital silence. (dBFS)" in body

    def test_nil_summary_omitted(self):
        rec = full_record()
        rec.pop("interval_summary")
        md = render_markdown(rec)
        assert "## Interval Summary" not in md


class TestFormatVectors:
    """Formatter vector tables (ref: mdtable_test.go:106-216)."""

    def test_format_metric_db_floor_tokens(self):
        # (ref: TestFormatMetricDB): digital silence renders '< -120';
        # just above the floor renders the number; NaN/+inf placeholder
        from jivetalking_tpu.report.render import _fmt

        assert _fmt(float("-inf"), "dBFS") == "< -120"
        assert _fmt(-120.0, "dBFS") == "< -120"
        assert _fmt(-130.0, "dBFS") == "< -120"
        assert _fmt(-119.9, "dBFS").startswith("-119.9")
        assert _fmt(float("nan"), "dBFS") == "-"
        assert _fmt(float("inf"), "dBFS") == "-"

    def test_format_metric_lufs_floor_strict(self):
        # (ref: TestFormatMetricLUFS): strictly-below -70 tokens; exactly
        # -70 renders the number
        from jivetalking_tpu.report.render import _fmt

        assert _fmt(-70.1, "LUFS") == "< -70"
        assert _fmt(-70.0, "LUFS").startswith("-70.0")
        assert _fmt(-16.0, "LUFS").startswith("-16.0")
        assert _fmt(float("nan"), "LUFS") == "-"

    def test_format_metric_scientific(self):
        # (ref: TestFormatMetricScientific): tiny non-zero magnitudes go
        # scientific; zero stays fixed-point
        from jivetalking_tpu.report.render import _fmt

        assert _fmt(0.00001) == "1.00e-05"
        assert "e" not in _fmt(0.0)

    def test_format_metric_signed(self):
        # (ref: TestFormatMetricSigned): explicit + for positives and
        # zero; NaN placeholder
        from jivetalking_tpu.report.render import _fmt

        assert _fmt(2.5, signed=True).startswith("+2.5")
        assert _fmt(-1.2, signed=True).startswith("-1.2")
        assert _fmt(0.0, signed=True).startswith("+0.0")
        assert _fmt(float("nan"), signed=True) == "-"

    def test_format_duration(self):
        # (ref: TestFormatDuration)
        from jivetalking_tpu.report.render import _fmt_duration

        assert _fmt_duration(0.5) == "0.5s"
        assert _fmt_duration(12.5) == "12.5s"
        assert _fmt_duration(90.0) == "1m 30s"
        assert _fmt_duration(59 * 60 + 59) == "59m 59s"
        assert _fmt_duration(2 * 3600 + 3 * 60 + 4) == "2h 3m 4s"

    def test_channel_name(self):
        # (ref: TestChannelName)
        from jivetalking_tpu.report.render import _channel_name

        assert _channel_name(1) == "mono"
        assert _channel_name(2) == "stereo"
        assert _channel_name(6) == "6 channels"


class TestSpectrogramSection:
    """(ref: TestRenderSpectrogramsProcessing / AnalysisOnly / Empty /
    NoFFmpegToken, sections_test.go:515-603)."""

    def _images(self, kinds, stages, stem="ep-LUFS-16-processed"):
        return [{"kind": k, "stage": s,
                 "path": f"{stem}.spectrogram-{k}-{s}.png"}
                for k in kinds for s in stages]

    def test_processing_table(self):
        rec = full_record()
        rec["spectrograms"] = self._images(
            ("whole", "roomtone", "speech"), ("before", "after"))
        md = render_markdown(rec)
        for want in (
            "## Spectrograms",
            "| Region | Before | After |",
            "Whole file", "Room tone", "Speech",
            "![whole before](ep-LUFS-16-processed.spectrogram-whole-before.png)",
            "![whole after](ep-LUFS-16-processed.spectrogram-whole-after.png)",
            "![roomtone before](ep-LUFS-16-processed.spectrogram-roomtone-before.png)",
            "![speech after](ep-LUFS-16-processed.spectrogram-speech-after.png)",
        ):
            assert want in md, want
        # processing runs never render an Input column
        spectro = md[md.index("## Spectrograms"):]
        assert "Input" not in spectro.split("##")[1]

    def test_analysis_only_input_column(self):
        rec = analysis_record()
        rec["spectrograms"] = self._images(("whole",), ("input",), stem="show")
        md = render_markdown(rec)
        spectro = md[md.index("## Spectrograms"):]
        assert "| Region | Input |" in spectro
        assert "![whole input](show.spectrogram-whole-input.png)" in spectro
        assert "Before" not in spectro.split("##")[1]

    def test_empty_omitted(self):
        rec = full_record()
        rec["spectrograms"] = []
        assert "## Spectrograms" not in render_markdown(rec)

    def test_no_ffmpeg_tokens(self):
        # (ref: TestRenderSpectrogramsNoFFmpegToken): the section carries
        # no tool internals
        rec = full_record()
        rec["spectrograms"] = self._images(("whole",), ("input",), stem="show")
        md = render_markdown(rec)
        spectro = md[md.index("## Spectrograms"):]
        for banned in ("ffmpeg", "showspectrumpic", "exec"):
            assert banned not in spectro


class TestNoiseFloorSection:
    """(ref: TestRenderNoiseFloor, sections_test.go:327-356)."""

    def test_values_and_source(self):
        md = render_markdown(full_record())
        section = md[md.index("## Noise Floor"):].split("\n## ")[0]
        for want in ("-84.58", "vad_percentile", "40.12", "no", "0.1234"):
            assert want in section, want

    def test_nan_floor_renders_placeholder(self):
        rec = full_record()
        rec["noise"]["floor_prescan_dbfs"] = float("nan")
        md = render_markdown(rec)
        section = md[md.index("## Noise Floor"):].split("\n## ")[0]
        line = next(l for l in section.splitlines() if "prescan" in l.lower()
                    or "Pre-scan" in l)
        assert "| - |" in line

    def test_no_dropped_tokens(self):
        # (ref: TestRenderRegionsNoDroppedTokens): the 1.5 sections drop
        # the legacy Character/verdict tokens
        md = render_markdown(full_record())
        start = md.index("## Noise Floor")
        out = md[start:]
        for banned in ("†", "Character", "(tonal)", "(broadband)",
                       "✓", "⚠", "❌", "SNR"):
            assert banned not in out, banned


class TestFiltersAndSummarySections:
    def test_filters_params_rendered(self):
        # (ref: TestRenderFiltersParams, sections_filters_test.go:115-136)
        md = render_markdown(full_record())
        section = md[md.index("## Filter Chain"):]
        for want in ("| Parameter | Value |", "80", "-47.2", "2.0"):
            assert want in section, want

    def test_filters_analysis_only_empty(self):
        # (ref: TestRenderFiltersAnalysisOnlyEmpty)
        assert "## Filter Chain" not in render_markdown(analysis_record())

    def test_processing_summary_populated(self):
        # (ref: TestRenderProcessingSummaryPopulated): pass rows + the
        # realtime factor with the x suffix
        md = render_markdown(full_record(), Timings(
            analysis_s=2.0, processing_s=90.0, realtime_factor=12.5))
        section = md[md.index("## Processing Summary"):].split("\n## ")[0]
        for want in ("Pass 1 (analysis)", "Pass 2 (filter chain)",
                     "Real-time factor", "12.5x", "1m 30s"):
            assert want in section, want

    def test_loudness_definitions_per_row(self):
        # (ref: TestRenderLoudnessDefinitionPerRow): every loudness row
        # carries its catalogue gloss (escaped)
        from jivetalking_tpu.report.definitions import DEFINITIONS
        from jivetalking_tpu.report.render import _escape_cell

        md = render_markdown(full_record())
        section = md[md.index("## Loudness"):].split("\n## ")[0]
        for key in ("integrated_lufs", "true_peak_dbtp", "lra_lu",
                    "thresh_lufs", "momentary_lufs", "short_term_lufs",
                    "sample_peak_dbfs", "target_offset_db"):
            label, gloss, unit = DEFINITIONS[key]
            assert _escape_cell(gloss) in section, key

    def test_dynamics_and_spectral_definitions_per_row(self):
        # (ref: TestRenderDynamicsAndSpectralDefinitions,
        # sections_test.go:185-207): every dynamics and spectral row
        # carries its catalogue gloss
        from jivetalking_tpu.report.definitions import DEFINITIONS
        from jivetalking_tpu.report.render import _escape_cell

        md = render_markdown(full_record())
        dyn = md[md.index("## Dynamics"):].split("\n## ")[0]
        for key in ("rms_level_dbfs", "peak_level_dbfs",
                    "crest_factor_astats_db", "dynamic_range_db",
                    "flat_factor", "bit_depth", "entropy"):
            label, gloss, unit = DEFINITIONS[key]
            assert _escape_cell(gloss) in dyn, key

        spec = md[md.index("## Spectral"):].split("\n## ")[0]
        for key in ("mean", "variance", "centroid_hz", "spread_hz",
                    "skewness", "kurtosis", "flatness", "crest", "flux",
                    "slope", "decrease", "rolloff_hz"):
            label, gloss, unit = DEFINITIONS[key]
            assert _escape_cell(gloss) in spec, key
