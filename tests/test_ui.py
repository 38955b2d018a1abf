"""Live UI / status box / summary view-model tests (string rendering,
the reference's ui/view_layout_test.go pattern)."""

import io
import time

import numpy as np
import pytest

from jivetalking_tpu.adaptive import adapt_config, default_filter_config
from jivetalking_tpu.analysis.analyser import AudioMeasurements
from jivetalking_tpu.analysis.types import (
    NoiseProfile,
    Region,
    RegionSample,
    SpeechCandidate,
)
from jivetalking_tpu.cli.pool import FileOutcome
from jivetalking_tpu.ui.live import LiveModel, LiveUI, render_frame
from jivetalking_tpu.ui.statusbox import render_analysis_box, render_filter_chain_box
from jivetalking_tpu.ui.summary import AdaptedSummary, new_adapted_summary, with_limiter


def _measurements():
    m = AudioMeasurements()
    m.loudness.input_i = -25.0
    m.loudness.input_tp = -8.0
    m.loudness.input_lra = 9.0
    m.vad.noise_profile = NoiseProfile(measured_noise_floor=-62.0)
    m.vad.elected_room_tone_sample = RegionSample(rms_level=-70.0)
    sp = SpeechCandidate(region=Region(0.0, 60.0), sample=RegionSample(
        rms_level=-24.0, momentary_lufs=-26.0))
    sp.body_band_rms = -30.0
    sp.sib_band_rms = -34.0
    sp.bands_measured = True
    m.vad.speech_profile = sp
    m.vad.gate_stats.voiced_low_percentile = -32.0
    m.vad.gate_stats.separation_db = 25.0
    return m


class TestAdaptedSummary:
    def test_from_adapted_config(self):
        m = _measurements()
        cfg, diag = adapt_config(default_filter_config(), m)
        s = new_adapted_summary(cfg, diag, m)
        assert s.chain_ready
        assert s.highpass_hz == 80.0
        assert s.lowpass_hz == 20500.0
        assert s.denoise_nlm and s.denoise_fft
        assert s.gate_thresh_db == pytest.approx(-38.0)  # voiced p10 -32 - 6
        assert s.has_speech and s.has_noise_floor
        assert s.separation_db == pytest.approx(-24.0 - (-70.0))
        assert s.has_sibilance
        assert s.sibilance_db == pytest.approx(-4.0)
        assert not s.limiter_ready

    def test_nil_inputs_pending(self):
        s = new_adapted_summary(None, None, None)
        assert not s.chain_ready

    def test_with_limiter(self):
        s = with_limiter(AdaptedSummary(chain_ready=True), True, -9.0)
        assert s.limiter_ready and s.limiter_enabled
        assert s.limiter_ceiling == -9.0

    def test_with_limiter_preserves_chain_and_analysis_rows(self):
        # (ref: TestWithLimiter, summary_test.go:364-381) — the limiter
        # merge keeps the existing chain + analysis rows and fills the
        # ceiling
        base = AdaptedSummary(chain_ready=True, gate_thresh_db=-42.1,
                              voice_avg_db=-20.9, comp_thresh_db=-11.9)
        s = with_limiter(base, True, -2.8)
        assert s.limiter_ready and s.limiter_enabled
        assert s.limiter_ceiling == -2.8
        assert s.gate_thresh_db == -42.1
        assert s.voice_avg_db == -20.9
        assert s.comp_thresh_db == -11.9

    def test_with_limiter_disabled_marks_known_disabled(self):
        # (ref: TestWithLimiter's nil-NormResult arm :375-380 and
        # TestWithLimiterProgress's disabled/nil arms :396-406): a
        # known-absent limiter is READY (so the row reads OFF, not ⋯)
        # but not enabled
        s = with_limiter(AdaptedSummary(chain_ready=True), False, 0.0)
        assert s.limiter_ready and not s.limiter_enabled


class TestStatusBoxLayoutDegrade:
    """(ref: TestJoinStatusBoxesNarrowDegrades, statusboxes_test.go:294;
    TestProgressiveLightingBorder :596)."""

    def test_narrow_terminal_stacks_boxes(self):
        from jivetalking_tpu.ui.live import _boxes_for

        s = AdaptedSummary(chain_ready=True)
        wide = _boxes_for(s, cols=160)
        narrow = _boxes_for(s, cols=60)
        # wide: one joined row set — every line carries both boxes
        assert any("Filter Chain" in l and "Analysis" in l for l in wide)
        # narrow: the side-by-side join would wrap, so the boxes stack —
        # both still render, never on one line together
        assert not any("Filter Chain" in l and "Analysis" in l
                       for l in narrow)
        assert any("Filter Chain" in l for l in narrow)
        assert any("Analysis" in l for l in narrow)
        assert len(narrow) > len(wide)
        # no-cols callers (pure string tests) keep the joined layout
        assert len(_boxes_for(s)) == len(wide)

    def test_progressive_lighting_border(self):
        from jivetalking_tpu.ui.statusbox import render_filter_chain_box

        pending = render_filter_chain_box(
            AdaptedSummary(chain_ready=False), color=True)
        lit = render_filter_chain_box(
            AdaptedSummary(chain_ready=True), color=True)
        assert "99;102;241" not in pending
        assert "99;102;241" in lit
        # the plain form never carries SGR either way
        assert "\x1b" not in render_filter_chain_box(
            AdaptedSummary(chain_ready=True))


class TestLimiterProgressRouting:
    """The Pass-4 limiter snapshot path that lights the Limiter row
    DURING processing (ref: TestWithLimiterProgress summary_test.go:385,
    LimiterProgressMsg routing)."""

    def _ui(self):
        import io

        from jivetalking_tpu.ui.live import LiveUI

        return LiveUI(files=["a.flac", "b.flac"], out=io.StringIO())

    def test_snapshot_resolves_limiter_row_during_processing(self):
        ui = self._ui()
        ui.on_adapted_summary("a.flac", AdaptedSummary(
            chain_ready=True, gate_thresh_db=-42.1, voice_avg_db=-20.9))
        ui.on_limiter("a.flac", True, -2.8)
        s = ui.model.rows["a.flac"].summary
        assert s.limiter_ready and s.limiter_enabled
        assert s.limiter_ceiling == -2.8
        # chain + analysis rows preserved; the other file untouched
        assert s.gate_thresh_db == -42.1 and s.voice_avg_db == -20.9
        assert ui.model.rows["b.flac"].summary is None

    def test_disabled_snapshot_reads_off_not_pending(self):
        from jivetalking_tpu.ui.statusbox import render_filter_chain_box

        ui = self._ui()
        ui.on_adapted_summary("a.flac", AdaptedSummary(chain_ready=True))
        ui.on_limiter("a.flac", False, 0.0)
        box = render_filter_chain_box(ui.model.rows["a.flac"].summary)
        limiter_line = next(l for l in box.splitlines() if "Limiter" in l)
        assert "OFF" in limiter_line and "⋯" not in limiter_line

    def test_snapshot_before_summary_and_unknown_path_are_noops(self):
        # (ref: the out-of-range FileIndex no-op,
        # TestAdaptedSummaryMsgUpdate :419-425)
        ui = self._ui()
        ui.on_limiter("a.flac", True, -2.8)   # summary not landed yet
        assert ui.model.rows["a.flac"].summary is None
        ui.on_limiter("nope.flac", True, -2.8)  # unknown file: no crash


class TestStatusBoxes:
    def test_pending_boxes(self):
        s = AdaptedSummary(chain_ready=False)
        box = render_filter_chain_box(s)
        assert "⋯" in box
        assert box.splitlines()[0].startswith("╭─ Filter Chain")

    def test_chain_box_rows(self):
        m = _measurements()
        cfg, diag = adapt_config(default_filter_config(), m)
        s = new_adapted_summary(cfg, diag, m)
        box = render_filter_chain_box(s)
        assert "80 ㎐" in box
        assert "20.5 ㎑" in box
        assert "NLM+FFT" in box
        assert "mono/44.1㎑" in box
        assert "⋯" in box  # limiter still pending

    def test_analysis_box_rows(self):
        from jivetalking_tpu.ui.statusbox import _disp_width

        m = _measurements()
        cfg, diag = adapt_config(default_filter_config(), m)
        s = new_adapted_summary(cfg, diag, m)
        box = render_analysis_box(s)
        assert "-25.0 LUFS" in box
        assert "-8.0" in box
        # all lines equal display width (box alignment; ㏈/㎑ count 2 cells)
        widths = {_disp_width(line) for line in box.splitlines()}
        assert len(widths) == 1


class TestLiveFrame:
    def test_progress_rows(self):
        model = LiveModel(files=["a.flac", "b.flac"])
        model.rows["a.flac"].stage = "processing"
        model.rows["a.flac"].fraction = 0.5
        model.rows["a.flac"].disp_fraction = 0.5   # ticker-eased display
        model.rows["a.flac"].started = time.perf_counter()
        frame = render_frame(model, tick=0)
        assert "a.flac" in frame and "b.flac" in frame
        assert "Pass 2 filter" in frame
        assert "queued" in frame
        assert "█" in frame and "░" in frame

    def test_meter_row_renders_during_processing(self):
        import numpy as np
        from jivetalking_tpu.ui.live import _advance_meter, render_meter

        model = LiveModel(files=["a.flac"])
        row = model.rows["a.flac"]
        row.stage = "processing"
        row.fraction = 0.5
        row.started = time.perf_counter()
        row.levels = np.full(100, -18.0)
        for _ in range(40):
            _advance_meter(row, time.perf_counter())
        frame = render_frame(model, tick=0)
        assert "▐" in frame and "dB" in frame
        # eased level converges to the series value; peak holds at/above it
        assert abs(row.meter_db - (-18.0)) < 1.0
        assert row.peak_db >= row.meter_db - 1e-6
        # the meter block shows a filled bar + the tethered peak marker
        m = render_meter(row.meter_db, row.peak_db)
        assert "█" in m and ("⬑" in m or "⬏" in m)

    def test_peak_hold_decays(self):
        import numpy as np

        from jivetalking_tpu.ui.live import _METER_FLOOR_DB, _advance_meter

        model = LiveModel(files=["a.flac"])
        row = model.rows["a.flac"]
        row.stage = "processing"
        row.fraction = 0.0                 # hold playback at the loud head
        row.levels = np.concatenate([np.full(5, -6.0), np.full(95, -55.0)])
        t = time.perf_counter()
        for _ in range(10):
            _advance_meter(row, t)
        high = row.peak_db
        assert high > -10.0
        # move playback into the quiet tail and let the hold lapse
        row.fraction = 0.9
        for i in range(60):
            _advance_meter(row, t + 2.0 + i * 0.1)
        assert row.peak_db < high
        assert row.meter_db < -40.0
        assert row.meter_db >= _METER_FLOOR_DB

    def test_per_file_status_boxes(self):
        m = _measurements()
        cfg, diag = adapt_config(default_filter_config(), m)
        summary = new_adapted_summary(cfg, diag, m)
        model = LiveModel(files=["a.flac", "b.flac"])
        for f in model.files:
            model.rows[f].stage = "processing"
            model.rows[f].started = time.perf_counter()
        model.rows["a.flac"].summary = summary
        model.rows["b.flac"].summary = summary
        frame = render_frame(model, tick=0)
        # each in-flight file renders its OWN boxes (two box sets)
        assert frame.count("Filter Chain") == 2

    def test_analysis_live_ui_completion_block(self):
        import io as _io

        from jivetalking_tpu.ui.live import AnalysisLiveUI

        out = _io.StringIO()
        ui = AnalysisLiveUI(["x.wav"], out=out, fps=50.0)
        with ui:
            ui.on_file_start("x.wav")
            ui.on_file_complete(FileOutcome(
                path="x.wav", recording_stars=3, recording_label="Good",
                input_lufs=-21.0, input_tp=-6.2, input_lra=4.0))
            time.sleep(0.1)
        text = out.getvalue()
        assert "Recording" in text        # stars row
        assert "Gain" in text             # thermometer row

    def test_done_rows_replace_progress(self):
        model = LiveModel(files=["a.flac"])
        row = model.rows["a.flac"]
        row.done = True
        row.done_box = "✓ a.flac -> out.flac"
        frame = render_frame(model, tick=3)
        assert "✓ a.flac" in frame
        assert "queued" not in frame

    def test_live_ui_lifecycle(self):
        out = io.StringIO()
        ui = LiveUI(["x.flac"], out=out, fps=50.0)
        with ui:
            ui.on_file_start("x.flac")
            ui.on_progress("x.flac", "analysis", 0.3)
            ui.on_file_complete(FileOutcome(
                path="x.flac", output_path="y.flac", quality_stars=5,
                quality_label="Excellent", recording_stars=4,
                recording_label="Great", realtime_factor=10.0))
            time.sleep(0.1)
        text = out.getvalue()
        assert "\x1b[?25l" in text and "\x1b[?25h" in text  # cursor hide/show
        assert "x.flac" in text
        assert ui.model.all_done


class TestGainBar:
    """(ref: GainBar + gainGlyphPosition, ui/views.go:535-611): fill
    aligned to the advice zones — quiet ~1, well-set ~3, clipping 5."""

    def test_zone_fills(self):
        from jivetalking_tpu.ui.console import gain_bar

        assert gain_bar(-21.41).count("▰") == 1     # quiet
        assert gain_bar(-6.0).count("▰") == 3       # well-set target
        assert gain_bar(-0.1).count("▰") >= 4       # hot
        assert gain_bar(0.35).count("▰") == 5       # clipping pins full
        assert gain_bar(-60.0).count("▰") == 1      # floor at one pip
        for tp in (-30.0, -12.0, -6.0, -1.0, 0.5):
            assert len(gain_bar(tp)) == 5

    def test_analysis_summary_includes_bar(self):
        from jivetalking_tpu.cli.pool import FileOutcome
        from jivetalking_tpu.ui.console import render_analysis_summary

        o = FileOutcome(path="ep.wav", input_tp=-6.2, input_lufs=-30.0,
                        input_lra=10.0, recording_stars=4,
                        recording_label="Great")
        out = render_analysis_summary(o)
        assert "Gain" in out and "▰▰▰▱▱" in out
        assert "Level well set." in out


class TestViewport:
    def test_short_frame_unclipped(self):
        from jivetalking_tpu.ui.live import clip_to_viewport

        frame = "a\nb\nc"
        assert clip_to_viewport(frame, height=10) == frame

    def test_tall_frame_tail_with_indicator(self):
        from jivetalking_tpu.ui.live import clip_to_viewport

        frame = "\n".join(f"line{i}" for i in range(40))
        out = clip_to_viewport(frame, height=10)
        lines = out.splitlines()
        assert len(lines) == 10
        assert "earlier line" in lines[0]
        assert lines[-1] == "line39"


from jivetalking_tpu.cli.pool import FileOutcome
from jivetalking_tpu.ui.console import render_done_box


class TestDoneBoxReferenceInvariants:
    """Behavioural invariants ported from the reference's done-box suite
    (ref: view_layout_test.go:152-594), adapted to the plain-string
    renderer: row order, signed unit-less deltas, LUFS-not-dB loudness,
    the 16-bit noise-floor display clamp, and non-hardcoded star bars."""

    def _outcome(self, **kw):
        base = dict(
            path="LMP-81-mark.flac",
            output_path="LMP-81-mark-LUFS-16-processed.flac",
            input_lufs=-30.9, output_lufs=-15.9,
            input_tp=-0.1, output_tp=-2.0,
            input_lra=12.3, output_lra=8.0,
            input_noise_floor=-62.0, output_noise_floor=-80.0,
            quality_stars=4, quality_label="Excellent",
            recording_stars=3, recording_label="Good",
            wall_secs=151.0, realtime_factor=17.9,
        )
        base.update(kw)
        return FileOutcome(**base)

    def test_row_order(self):
        # (ref: TestDoneBoxRowOrder, view_layout_test.go:414-445)
        box = render_done_box(self._outcome())
        order = ["Time", "Loudness", "True peak", "Dynamics", "Noise floor",
                 "Recording", "Processed"]
        last = -1
        for label in order:
            idx = box.find(label)
            assert idx != -1, label
            assert idx > last, label
            last = idx

    def test_loudness_in_lufs_with_signed_delta(self):
        # (ref: TestDoneBoxRendersIndigoLabelledRows:196-207)
        box = render_done_box(self._outcome())
        assert "LUFS" in box
        assert "Δ +15.0" in box
        # the delta carries no unit
        assert "Δ +15.0 LUFS" not in box and "Δ +15.0 dB" not in box

    def test_dynamics_row_cells(self):
        # (ref: TestDoneBoxDynamicsRow, view_layout_test.go:385-409):
        # right-aligned shared-width columns — 8.0 (3 chars) carries two
        # lead spaces after the arrow — and the signed unit-less Δ
        box = render_done_box(self._outcome())
        dyn_line = next(l for l in box.splitlines() if "Dynamics" in l)
        assert "12.3 →   8.0 LU" in dyn_line, dyn_line
        assert "Δ  -4.3" in dyn_line, dyn_line

    def test_true_peak_signed_delta(self):
        # (ref: TestDoneBoxTruePeakRow, view_layout_test.go:358-384):
        # right-aligned signed delta column (Δ %+5.1f)
        box = render_done_box(self._outcome())
        assert "True peak" in box
        assert "Δ  -1.9" in box

    def test_stars_not_hardcoded(self):
        # (ref: the 4-star file must NOT render a 5-star bar, :218-230)
        box = render_done_box(self._outcome())
        assert "★★★★☆" in box
        assert "★★★★★" not in box
        assert "★★★☆☆" in box   # recording 3-of-5

    @pytest.mark.parametrize("floor,want", [
        (float("-inf"), "< -96"),
        (-120.0, "< -96"),
        (-89.0, "-89 ㏈"),
    ])
    def test_noise_floor_display_clamp(self, floor, want):
        # (ref: TestDoneBoxNoiseFloorClamp, view_layout_test.go:326-357;
        # the numeric form is %.0f per formatNoiseFloorCell)
        box = render_done_box(self._outcome(output_noise_floor=floor))
        assert want in box, box

    def test_arrow_columns_align(self):
        # (ref: TestDoneBoxColumnsAlign, view_layout_test.go:452-527):
        # the → sits at the same column on every before→after row
        box = render_done_box(self._outcome())
        arrows = [line.find("→") for line in box.splitlines()
                  if "→" in line and not line.startswith("✓")]
        assert len(arrows) >= 3
        assert len(set(arrows)) == 1, box

    def test_time_row_badge_and_placeholder(self):
        # (ref: TestDoneBoxTimeRow): elapsed clock + ⚡ badge; the
        # placeholder when no timing is available
        box = render_done_box(self._outcome(wall_secs=48.0, realtime_factor=2.5))
        time_line = next(l for l in box.splitlines() if "Time" in l)
        assert "00:48" in time_line and "⚡ 2.5×" in time_line
        box = render_done_box(self._outcome(wall_secs=0.0, realtime_factor=0.0))
        time_line = next(l for l in box.splitlines() if "Time" in l)
        assert "⚡ —×" in time_line and "00:00" in time_line

    def test_time_row_hour_scale_clock(self):
        # hour-scale walls (the chunked master's workload) read HH:MM:SS,
        # the SAME clock as the live Time block — not "92:35"
        from jivetalking_tpu.ui import console, live

        box = render_done_box(
            self._outcome(wall_secs=5555.0, realtime_factor=29.0))
        time_line = next(l for l in box.splitlines() if "Time" in l)
        assert "01:32:35" in time_line and "92:35" not in time_line
        # one duration formatter serves both surfaces
        assert console.format_elapsed is live.format_elapsed

    def test_noise_floor_no_delta(self):
        # (ref: TestDoneBoxNoiseFloorBeforeAfter): input→output arrow, the
        # values, and NO reduction delta (a Δ over '< -96' would mislead)
        box = render_done_box(self._outcome())
        noise_line = next(l for l in box.splitlines() if "Noise floor" in l)
        assert "→" in noise_line
        assert "-62" in noise_line and "-80" in noise_line
        assert "Δ" not in noise_line and "reduced" not in noise_line

    def test_noise_floor_single_end(self):
        # (ref: TestDoneBoxNoiseFloorSingleEnd): one available end shows
        # that value alone, never a broken arrow
        box = render_done_box(self._outcome(input_noise_floor=None))
        line = next(l for l in box.splitlines() if "Noise floor" in l)
        assert "→" not in line and "-80 ㏈" in line
        box = render_done_box(self._outcome(output_noise_floor=None))
        line = next(l for l in box.splitlines() if "Noise floor" in l)
        assert "→" not in line and "-62 ㏈" in line
        box = render_done_box(self._outcome(input_noise_floor=None,
                                            output_noise_floor=None))
        line = next(l for l in box.splitlines() if "Noise floor" in l)
        assert "n/a" in line

    def test_empty_summary_guards_output_only(self):
        # (ref: TestDoneBoxGuardsEmptySummary): unknown input TP/LRA ->
        # output value alone, no misleading before→after
        box = render_done_box(self._outcome(input_tp=None, input_lra=None))
        for label, want in (("True peak", "-2.0 ㏈TP"), ("Dynamics", "8.0 LU")):
            line = next(l for l in box.splitlines() if label in l)
            assert "→" not in line, line
            assert want in line, line

    def test_noise_and_stars_move_together(self):
        # (ref: TestDoneBoxNoiseAndStarsMoveTogether): a cleaner floor
        # comes with more stars; number and stars never contradict
        clean = render_done_box(self._outcome(
            output_noise_floor=-80.0, quality_stars=5, quality_label="Excellent"))
        noisy = render_done_box(self._outcome(
            output_noise_floor=-55.0, quality_stars=4, quality_label="Great"))
        assert "-80 ㏈" in clean and "★★★★★" in clean
        assert "-55 ㏈" in noisy and "★★★★☆" in noisy

    def test_heading_shows_output_path(self):
        box = render_done_box(self._outcome())
        heading = box.splitlines()[0]
        assert "LMP-81-mark-LUFS-16-processed.flac" in heading


class TestStatusBoxReferenceInvariants:
    """(ref: statusboxes_test.go:46-190): pending vs off distinction,
    lit-row values, limiter pending-until-known, sample-rate trimming."""

    def _lit_summary(self):
        # (ref: litSummary, statusboxes_test.go:15-41)
        from jivetalking_tpu.ui.summary import AdaptedSummary

        return AdaptedSummary(
            chain_ready=True, downmix_mono=True, highpass_hz=80.0,
            lowpass_hz=20500.0, denoise_nlm=True, denoise_fft=True,
            gate_thresh_db=-42.1, gate_ratio=2.0, comp_thresh_db=-11.9,
            deesser_on=False, deesser_i=0.0, sample_rate=44100,
            has_speech=True, voice_avg_db=-20.9, has_noise_floor=True,
            noise_floor_db=-68.0, separation_db=47.0, input_lra=8.2,
            true_peak_dbtp=-3.2, has_sibilance=True, sibilance_db=-4.0,
            gate_depth_db=14.0, input_lufs=-24.3,
        )

    def test_pending_box_shows_placeholder_no_values(self):
        # (ref: TestChainBoxPendingRows)
        from jivetalking_tpu.ui.summary import AdaptedSummary

        box = render_filter_chain_box(AdaptedSummary())
        assert "Filter Chain" in box
        assert "⋯" in box
        assert "80 ㎐" not in box
        # every row pending: ○ glyph, no lit ●
        assert "●" not in box and box.count("○") == 8

    def test_lit_rows_show_values(self):
        # (ref: TestChainBoxLitRows)
        box = render_filter_chain_box(self._lit_summary())
        for want in ("mono/44.1㎑", "80 ㎐", "20.5 ㎑", "NLM+FFT",
                     "-42.1 ㏈", "-11.9 ㏈"):
            assert want in box, want

    def test_off_row_distinct_from_pending(self):
        # (ref: TestPendingVsOffRow): the disabled de-esser reads ○ OFF,
        # the not-yet-known limiter reads ○ ⋯
        box = render_filter_chain_box(self._lit_summary())
        deesser_line = next(l for l in box.splitlines() if "De-esser" in l)
        assert "OFF" in deesser_line and "⋯" not in deesser_line
        assert deesser_line.lstrip("│ ").startswith("○")
        limiter_line = next(l for l in box.splitlines() if "Limiter" in l)
        assert "⋯" in limiter_line and "OFF" not in limiter_line

    def test_limiter_lights_during_pass4(self):
        # (ref: TestChainBoxLimiterLitDuringPass4 + TestChainBoxLimiterLit)
        s = with_limiter(self._lit_summary(), enabled=True, ceiling_dbtp=-2.8)
        box = render_filter_chain_box(s)
        limiter_line = next(l for l in box.splitlines() if "Limiter" in l)
        assert "-2.8 ㏈TP" in limiter_line
        assert "⋯" not in limiter_line

    def test_deesser_engaged_shows_intensity(self):
        # (ref: TestChainBoxDeesserEngaged)
        s = self._lit_summary()
        s.deesser_on = True
        s.deesser_i = 0.62
        box = render_filter_chain_box(s)
        assert "i=0.62" in box

    def test_format_sample_rate_trims(self):
        # (ref: TestFormatSampleRate, statusboxes_test.go:93-111)
        from jivetalking_tpu.ui.statusbox import format_sample_rate

        assert format_sample_rate(44100) == "44.1㎑"
        assert format_sample_rate(48000) == "48㎑"
        assert format_sample_rate(20500) == "20.5㎑"

    def test_analysis_box_lit_rows(self):
        # (ref: TestAnalysisBoxLitRows): every row lights to its value,
        # the SNR row carries the inline bar, Noise floor pads to a
        # 2-space gap (label width 13 - len('Noise floor') = 2)
        box = render_analysis_box(self._lit_summary())
        for want in ("SNR Gap", "-20.9 ㏈", "-68 ㏈", "47 ㏈",
                     "8.2 LU → 2.0:1", "-3.2 ㏈TP", "-4 ㏈",
                     "-24.3 LUFS", "14 ㏈"):
            assert want in box, want
        assert "▰" in box
        assert "Noise floor  -68 ㏈" in box

    def test_analysis_box_no_speech_dims(self):
        # (ref: TestAnalysisBoxNoSpeechDims): speech rows show the
        # placeholder, always-available rows still light
        s = self._lit_summary()
        s.has_speech = False
        s.has_sibilance = False
        box = render_analysis_box(s)
        voice_line = next(l for l in box.splitlines() if "Voice avg" in l)
        assert "⋯" in voice_line
        snr_line = next(l for l in box.splitlines() if "SNR Gap" in l)
        assert "⋯" in snr_line and "▰" not in snr_line
        assert "-68 ㏈" in box and "-3.2 ㏈TP" in box

    def test_analysis_box_unmeasured_floor_is_na(self):
        # unmeasured floor shows 'n/a', never a bogus 0 ㏈
        # (ref: renderAnalysisBox noiseFloor, statusboxes.go:352-357)
        s = self._lit_summary()
        s.has_noise_floor = False
        box = render_analysis_box(s)
        floor_line = next(l for l in box.splitlines() if "Noise floor" in l)
        assert "n/a" in floor_line and "0 ㏈" not in floor_line

    def test_analysis_row_order(self):
        # (ref: TestAnalysisRowOrder): True peak (5) -> Gate depth (6) ->
        # Sibilance (7) -> Loudness (8)
        box = render_analysis_box(self._lit_summary())
        idx = {k: box.index(k) for k in
               ("True peak", "Gate depth", "Sibilance", "Loudness")}
        assert idx["True peak"] < idx["Gate depth"] < idx["Sibilance"] < idx["Loudness"]

    def test_border_title_in_top_border(self):
        # (ref: TestBorderTitleInTopBorder): title spliced into the top
        # border, first data row directly beneath
        for render, title, first in (
            (render_filter_chain_box, "Filter Chain", "Downmix"),
            (render_analysis_box, "Analysis", "Voice avg"),
        ):
            lines = render(self._lit_summary()).splitlines()
            assert lines[0].startswith("╭") and lines[0].endswith("╮")
            assert title in lines[0]
            assert first in lines[1], (title, lines[1])

    def test_separation_bar_fill(self):
        # 0-60 dB span over 3 cells (ref: separationBar,
        # statusboxes.go:385-396)
        from jivetalking_tpu.ui.statusbox import separation_bar

        assert separation_bar(0.0) == "▱▱▱"
        assert separation_bar(30.0) == "▰▰▱"
        assert separation_bar(60.0) == "▰▰▰"
        assert separation_bar(999.0) == "▰▰▰"
        assert separation_bar(-5.0) == "▱▱▱"


class TestMeterReferenceInvariants:
    """(ref: progress_bar_test.go:315-703): peak-at-ceiling stays in
    bounds, no peak marker at the floor, the header shows the LEVEL not
    the peak, and the spring physics ease without overshoot."""

    def test_peak_at_ceiling_stays_in_bounds(self):
        # (ref: TestMeterPeakAtCeilingStaysInBounds :315)
        from jivetalking_tpu.ui.live import _METER_WIDTH, render_meter

        lines = render_meter(-3.0, 0.0).splitlines()
        # fixed geometry: the bar is exactly _METER_WIDTH cells between the
        # ▐ ▌ caps; the marker arrow stays in bounds on its own line
        bar = lines[0][lines[0].index("▐") + 1:lines[0].index("▌")]
        assert len(bar) == _METER_WIDTH
        assert "┃" not in bar  # no in-bar glyph — the marker moved below
        assert lines[1].index("⬏") == 1 + (_METER_WIDTH - 1)

    def test_no_peak_marker_at_floor(self):
        # (ref: TestMeterNoPeakMarkerAtFloor :341; floor = -70, the
        # reference's ui.meterFloorDB — encoder_level_test.go:42-93)
        from jivetalking_tpu.ui.live import _METER_FLOOR_DB, render_meter

        row = render_meter(_METER_FLOOR_DB, _METER_FLOOR_DB)
        assert "⬑" not in row and "⬏" not in row
        assert "—" in row  # silent header placeholder

    def test_header_shows_level_not_peak(self):
        # (ref: TestMeterHeaderShowsLevelNotPeak :210)
        from jivetalking_tpu.ui.live import render_meter

        row = render_meter(-23.4, -5.0)
        assert "-23.4" in row
        assert "-5.0" not in row

    def test_progress_spring_eases_without_overshoot(self):
        # (ref: TestProgressSpringEases :568 + no-overshoot contracts)
        from jivetalking_tpu.ui.live import FileRow, _advance_meter

        row = FileRow(path="x")
        row.stage = "processing"
        row.fraction = 1.0
        last = 0.0
        for tick in range(60):
            _advance_meter(row, now=float(tick))
            assert last - 1e-12 <= row.disp_fraction <= 1.0 + 1e-12
            last = row.disp_fraction
        # converges to the target
        assert row.disp_fraction > 0.99

    def test_peak_spring_holds_then_decays(self):
        # (ref: TestPeakSpringInitialisesAtFloor :623, TestPeakSpringEases
        # :635, TestPeakSpringNoOvershoot :672 + the peak-hold contract)
        import numpy as np

        from jivetalking_tpu.ui.live import (
            FileRow,
            _METER_FLOOR_DB,
            _PEAK_HOLD_SECS,
            _advance_meter,
        )

        row = FileRow(path="x")
        assert row.peak_db == _METER_FLOOR_DB  # initialises at the floor
        row.stage = "processing"
        row.fraction = row.disp_fraction = 0.5
        row.levels = np.full(10, -10.0)
        # rise: the meter eases toward the level, the peak rides it
        for tick in range(40):
            _advance_meter(row, now=0.0)
            assert row.peak_db >= row.meter_db - 1e-9  # peak never below level
            assert row.meter_db <= -10.0 + 1e-6       # no overshoot past target
        top = row.peak_db
        assert top == pytest.approx(-10.0, abs=0.5)
        # drop the signal: within the hold window the peak stays pinned
        row.levels = np.full(10, -50.0)
        _advance_meter(row, now=0.5 * _PEAK_HOLD_SECS)
        assert row.peak_db == pytest.approx(top, abs=1e-9)
        # after the hold lapses the peak DECAYS, it does not snap
        before = row.peak_db
        _advance_meter(row, now=10.0)
        assert row.meter_db < before - 1.0
        assert before - 2.0 < row.peak_db < before


class TestSummaryAxisDiscipline:
    """(ref: summary_test.go:122-364): the live analysis box and the done
    box derive the noise floor from ONE resolver, and the SNR gap never
    mixes the astats-RMS and momentary-LUFS axes."""

    def _m(self):
        from jivetalking_tpu.analysis.analyser import AudioMeasurements

        return AudioMeasurements()

    def _speech(self, rms=-22.0, momentary=None):
        from jivetalking_tpu.analysis.types import (
            Region,
            RegionSample,
            SpeechCandidate,
        )

        sample = RegionSample(rms_level=rms)
        if momentary is not None:
            sample.momentary_lufs = momentary
        return SpeechCandidate(region=Region(0.0, 10.0), sample=sample)

    def test_live_box_floor_matches_done_box_floor(self):
        # (ref: TestLiveBoxFloorMatchesDoneBoxFloor :122)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.types import NoiseProfile, RegionSample
        from jivetalking_tpu.quality import input_display_noise_floor_db
        from jivetalking_tpu.ui.summary import new_adapted_summary

        cases = []
        m = self._m()
        m.noise.floor = -85.0  # internal; both surfaces must ignore it
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-73.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-73.0)
        cases.append(("elected room-tone sample", m, True))

        m = self._m()
        m.noise.floor = -85.0
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-70.0)
        cases.append(("no elected sample, momentary field present", m, False))

        m = self._m()
        m.noise.voice_activated = True
        m.noise.floor = -85.0
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-120.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-62.0)
        cases.append(("voice-activated momentary floor", m, True))

        cfg = default_filter_config()
        for name, m, want_floor in cases:
            live = new_adapted_summary(cfg, None, m)
            done, ok = input_display_noise_floor_db(m)
            assert ok is want_floor, name
            assert live.has_noise_floor is ok, name
            if ok:
                assert live.noise_floor_db == done, name
            # the internal momentary floor never leaks into the display
            assert live.noise_floor_db != m.noise.floor, name

    def test_unmeasured_floor_no_separation(self):
        # (ref: TestUnmeasuredFloorNoSeparation :214)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.ui.statusbox import render_analysis_box
        from jivetalking_tpu.ui.summary import new_adapted_summary

        m = self._m()
        m.noise.floor = -85.0
        m.vad.speech_profile = self._speech(rms=-22.0)
        s = new_adapted_summary(default_filter_config(), None, m)
        assert not s.has_noise_floor
        assert s.separation_db == 0
        box = render_analysis_box(s)
        sep_row = [ln for ln in box.splitlines() if "SNR Gap" in ln][0]
        assert "⋯" in sep_row
        assert "0 ㏈" not in sep_row

    def test_separation_same_axis(self):
        # (ref: TestSeparationDBSameAxis :238)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.types import RegionSample
        from jivetalking_tpu.ui.summary import new_adapted_summary

        m = self._m()
        m.noise.floor = -85.0
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-70.0)
        m.vad.speech_profile = self._speech(rms=-22.0)
        s = new_adapted_summary(default_filter_config(), None, m)
        assert s.separation_db == s.voice_avg_db - s.noise_floor_db
        assert s.separation_db == -22.0 - (-70.0)

    def test_voice_activated_momentary_pair(self):
        # (ref: TestSeparationDBVoiceActivatedMomentary :260)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.types import NoiseProfile, RegionSample
        from jivetalking_tpu.ui.summary import new_adapted_summary

        m = self._m()
        m.noise.voice_activated = True
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-120.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-62.0)
        m.vad.speech_profile = self._speech(rms=-22.0, momentary=-24.0)
        s = new_adapted_summary(default_filter_config(), None, m)
        assert s.noise_floor_db == -62.0   # momentary floor, not the -120 sentinel
        assert s.has_noise_floor
        assert s.separation_db == -24.0 - (-62.0)   # momentary pair
        assert s.separation_db == -24.0 - s.noise_floor_db
        assert s.separation_db != s.voice_avg_db - s.noise_floor_db

    def test_not_voice_activated_astats_path(self):
        # (ref: TestSeparationDBNotVoiceActivatedAstats :296)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.types import NoiseProfile, RegionSample
        from jivetalking_tpu.ui.summary import new_adapted_summary

        m = self._m()
        m.noise.voice_activated = False
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-70.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=-62.0)
        m.vad.speech_profile = self._speech(rms=-22.0, momentary=-24.0)
        s = new_adapted_summary(default_filter_config(), None, m)
        assert s.noise_floor_db == -70.0
        assert s.separation_db == s.voice_avg_db - s.noise_floor_db
        assert s.separation_db == -22.0 - (-70.0)

    def test_voice_activated_unmeasured_momentary_floor(self):
        # (ref: TestSeparationDBVoiceActivatedUnmeasuredFloor :323)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.types import NoiseProfile, RegionSample
        from jivetalking_tpu.ui.summary import new_adapted_summary

        m = self._m()
        m.noise.voice_activated = True
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-70.0)
        m.vad.noise_profile = NoiseProfile(measured_noise_floor=0.0)  # unmeasured
        m.vad.speech_profile = self._speech(rms=-22.0, momentary=-24.0)
        s = new_adapted_summary(default_filter_config(), None, m)
        assert s.noise_floor_db == -70.0   # astats fallback
        assert s.separation_db == s.voice_avg_db - s.noise_floor_db
        assert s.separation_db == -22.0 - (-70.0)
        assert s.separation_db != -24.0   # never momentary-vs-0

    def test_nil_guards(self):
        # (ref: TestNewAdaptedSummaryNilGuards :353)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.analyser import AudioMeasurements
        from jivetalking_tpu.ui.summary import new_adapted_summary

        assert not new_adapted_summary(None, None, AudioMeasurements()).chain_ready
        assert not new_adapted_summary(default_filter_config(), None, None).chain_ready


class TestTimelineReferenceInvariants:
    """The Time block: clocks, dot timeline, ⚡ speed badge (ref:
    renderTimeline views.go:231-271; vectors from
    internal/ui/progress_bar_test.go:387-471)."""

    def _row(self, progress, duration, **kw):
        from jivetalking_tpu.ui.live import FileRow

        row = FileRow(path="a.flac", stage="processing", fraction=progress,
                      duration=duration)
        for k, v in kw.items():
            setattr(row, k, v)
        return row

    def test_clocks_and_badge(self):
        # progress 0.5 after 10 s of a 60 s file: elapsed 00:10, projected
        # 00:20, badge (0.5*60)/10 = 3.0x, 4/8 dots filled
        # (ref: TestTimelineClocksAndBadge)
        from jivetalking_tpu.ui.live import render_timeline

        line = render_timeline(self._row(0.5, 60.0), elapsed=10.0)
        assert "00:10" in line
        assert "00:20" in line
        assert "⚡ 3.0×" in line
        assert line.count("▰") == 4 and line.count("▱") == 4

    def test_badge_guards(self):
        # placeholder until duration known, progress > 0.02 AND
        # elapsed > 0.3 s (ref: TestTimelineBadgeGuards)
        from jivetalking_tpu.ui.live import render_timeline

        cases = [
            (0.5, 0.0, 10.0, False),   # no duration
            (0.01, 60.0, 10.0, False),  # progress too low
            (0.5, 60.0, 0.2, False),   # elapsed too short
            (0.5, 60.0, 10.0, True),   # all clear
        ]
        for progress, duration, elapsed, want_num in cases:
            line = render_timeline(self._row(progress, duration), elapsed)
            if want_num:
                assert "⚡ —×" not in line and "×" in line, line
            else:
                assert "⚡ —×" in line, line

    def test_fill_tracks_progress(self):
        # fill = round(progress*8), never overflowing the 8-cell width
        # (ref: TestTimelineFillTracksProgress)
        from jivetalking_tpu.ui.live import _TIMELINE_WIDTH, render_timeline

        for p in (0.0, 0.25, 0.5, 0.99, 1.0):
            line = render_timeline(self._row(p, 60.0), elapsed=5.0)
            want = min(int(p * _TIMELINE_WIDTH + 0.5), _TIMELINE_WIDTH)
            assert line.count("▰") == want, (p, line)
            assert line.count("▰") + line.count("▱") == _TIMELINE_WIDTH

    def test_projected_clock_placeholder(self):
        # --:-- until progress is meaningful
        # (ref: TestTimelineProjectedClockPlaceholder)
        from jivetalking_tpu.ui.live import render_timeline

        assert "--:--" in render_timeline(self._row(0.0, 60.0), elapsed=2.0)

    def test_format_elapsed_rolls_to_hours(self):
        # MM:SS under an hour, HH:MM:SS past it, rounded to the second
        # (ref: formatElapsed, analysis_model.go:223-235)
        from jivetalking_tpu.ui.live import format_elapsed

        assert format_elapsed(0.4) == "00:00"
        assert format_elapsed(59.6) == "01:00"
        assert format_elapsed(125.0) == "02:05"
        assert format_elapsed(3725.0) == "01:02:05"

    def test_timeline_row_renders_in_frame(self):
        # an in-flight row shows its Time block; a queued row does not
        model = LiveModel(files=["a.flac", "b.flac"])
        row = model.rows["a.flac"]
        row.stage = "processing"
        row.fraction = 0.5
        row.duration = 60.0
        row.started = time.perf_counter() - 10.0
        frame = render_frame(model, tick=0)
        assert "▰" in frame and "⚡" in frame
        assert frame.count("▱") <= 8  # only the in-flight row has a timeline


class TestModelRoutingReferenceInvariants:
    """Message routing + ticker invariants (ref: model_routing_test.go:
    index routing, out-of-range safety, spring-only tick, tick stop)."""

    def _ui(self, files=("a.flac", "b.flac")):
        import io

        from jivetalking_tpu.ui.live import LiveUI

        return LiveUI(list(files), out=io.StringIO())

    def test_progress_routes_to_its_row(self):
        # (ref: TestProgressMsgIndexRouting): an update for one file never
        # touches the other's row
        ui = self._ui()
        ui.on_progress("b.flac", "processing", 0.6)
        assert ui.model.rows["b.flac"].fraction == 0.6
        assert ui.model.rows["b.flac"].stage == "processing"
        assert ui.model.rows["a.flac"].fraction == 0.0
        assert ui.model.rows["a.flac"].stage == ""

    def test_complete_routes_to_its_row(self):
        # (ref: TestFileCompleteMsgIndexRouting)
        from jivetalking_tpu.cli.pool import FileOutcome

        ui = self._ui()
        ui.on_file_complete(FileOutcome(path="b.flac", output_path="b-out.flac"))
        assert ui.model.rows["b.flac"].done
        assert not ui.model.rows["a.flac"].done
        assert not ui.model.all_done  # one of two files remains

    def test_unknown_path_is_safe(self):
        # (ref: TestUpdateOutOfRangeSafety): events for a file the UI does
        # not know must not crash or mutate known rows
        from jivetalking_tpu.cli.pool import FileOutcome
        from jivetalking_tpu.ui.live import AnalysisLiveUI
        from jivetalking_tpu.ui.summary import AdaptedSummary

        ui = self._ui()
        ui.on_file_start("ghost.flac")
        ui.on_progress("ghost.flac", "processing", 0.4)
        ui.on_duration("ghost.flac", 60.0)
        ui.on_levels("ghost.flac", [0.0], 0.25)
        ui.on_adapted_summary("ghost.flac", AdaptedSummary())
        ui.on_file_complete(FileOutcome(path="ghost.flac"))
        assert not ui.model.all_done
        assert ui.model.rows["a.flac"].fraction == 0.0
        import io

        aui = AnalysisLiveUI(["a.flac"], out=io.StringIO())
        aui.on_file_complete(FileOutcome(path="ghost.flac"))
        assert not aui.model.all_done

    def test_tick_eases_display_without_mutating_routed_fields(self):
        # (ref: TestMeterTickStepsSpringWithoutMutatingRoutedFields): the
        # ticker moves only the eased display state; stage/fraction stay
        import time as _time

        from jivetalking_tpu.ui.live import _advance_meter

        ui = self._ui()
        ui.on_progress("a.flac", "processing", 0.8)
        row = ui.model.rows["a.flac"]
        row.levels = np.full(10, -18.0)
        before = (row.stage, row.fraction)
        for _ in range(5):
            _advance_meter(row, _time.perf_counter())
        assert (row.stage, row.fraction) == before
        assert row.disp_fraction > 0.0       # eased toward the target
        assert row.meter_db > -60.0          # meter moved

    def test_all_complete_sets_done_flag(self):
        # (ref: TestMeterTickStopsAfterAllComplete): the loop's stop
        # condition trips exactly when the last row completes
        from jivetalking_tpu.cli.pool import FileOutcome

        ui = self._ui()
        ui.on_file_complete(FileOutcome(path="a.flac"))
        assert not ui.model.all_done
        ui.on_file_complete(FileOutcome(path="b.flac"))
        assert ui.model.all_done


class TestOverallProgressFooter:
    """(ref: TestRenderOverallProgressFooter, model_routing_test.go:262-287)."""

    def test_counts_never_cursor(self):
        from jivetalking_tpu.cli.pool import FileOutcome
        from jivetalking_tpu.ui.live import LiveUI, render_overall_progress

        ui = LiveUI(["a.wav", "b.wav", "c.wav"], out=io.StringIO())
        ui.on_file_complete(FileOutcome(path="a.wav", output_path="a-out.wav"))
        ui.on_file_complete(FileOutcome(path="b.wav", error="boom"))
        ui.on_progress("c.wav", "processing", 0.4)
        footer = render_overall_progress(ui.model)
        assert "3" in footer
        assert "1 complete" in footer
        assert "1 failed" in footer
        low = footer.lower()
        assert "file 3 of" not in low and "of 3" not in low

    def test_footer_in_multi_file_frame_only(self):
        multi = LiveModel(files=["a.wav", "b.wav"])
        assert "Processing 2 files" in render_frame(multi, tick=0)
        single = LiveModel(files=["a.wav"])
        assert "Processing 1 files" not in render_frame(single, tick=0)


class TestAnalysisViewGlyphs:
    """(ref: TestAnalysisMessagesDriveViewWithoutSpinner +
    TestAnalysisViewLayout, analysis_model_test.go:265-345): active
    analysis rows carry the ∿ wave glyph, done rows the ✓ → report
    arrow, errored rows ✗; the footer verb is 'Analysing'."""

    def test_wave_glyph_and_verb(self):
        from jivetalking_tpu.cli.pool import FileOutcome
        from jivetalking_tpu.ui.live import AnalysisLiveUI, render_overall_progress

        ui = AnalysisLiveUI(["a.wav", "b.wav", "c.wav"], out=io.StringIO())
        ui.on_file_start("a.wav")
        ui.on_progress("a.wav", "analysis", 0.4)
        ui.on_file_complete(FileOutcome(
            path="b.wav", recording_stars=3, recording_label="Good",
            input_tp=-6.0))
        ui.on_file_complete(FileOutcome(path="c.wav", error="boom"))
        frame = render_frame(ui.model, tick=0)
        assert "∿" in frame                       # active row wave glyph
        assert "✓ b.wav → b-wav-analysis.md" in frame
        assert "✗ c.wav: boom" in frame
        footer = render_overall_progress(ui.model)
        assert footer.startswith("Analysing 3 files")
        assert "1 complete" in footer and "1 failed" in footer

    def test_processing_view_keeps_spinner(self):
        from jivetalking_tpu.ui.live import LiveUI

        ui = LiveUI(["a.flac"], out=io.StringIO())
        ui.on_file_start("a.flac")
        ui.on_progress("a.flac", "processing", 0.2)
        frame = render_frame(ui.model, tick=0)
        assert "∿" not in frame


class TestViewportScrollKeys:
    """Viewport scrolling + quit keys (ref: TestScrollKeysForwardedToViewport,
    TestMouseWheelMovesOffset, TestQuitKeysStillQuitWithViewport,
    TestBuildScrollbar* — adapted to the offset-from-tail viewport)."""

    def _model(self):
        from jivetalking_tpu.ui.live import LiveModel

        return LiveModel(files=["a.wav"])

    def test_scroll_keys_move_offset(self):
        from jivetalking_tpu.ui.live import handle_key

        m = self._model()
        for key, want in (("up", 1), ("k", 2), ("wheel_up", 3),
                          ("pgup", 13), ("down", 12), ("j", 11),
                          ("wheel_down", 10), ("pgdn", 0)):
            assert handle_key(m, key) is None
            assert m.scroll_offset == want, key

    def test_offset_never_negative(self):
        from jivetalking_tpu.ui.live import handle_key

        m = self._model()
        handle_key(m, "down")
        assert m.scroll_offset == 0

    def test_home_end(self):
        from jivetalking_tpu.ui.live import handle_key

        m = self._model()
        handle_key(m, "home")
        assert m.scroll_offset > 1000
        handle_key(m, "end")
        assert m.scroll_offset == 0

    def test_quit_keys(self):
        from jivetalking_tpu.ui.live import handle_key

        m = self._model()
        for key in ("q", "ctrl_c"):
            assert handle_key(m, key) == "quit"
        assert m.scroll_offset == 0   # quit keys do not scroll

    def test_quit_key_fires_on_quit_callback(self):
        import io

        from jivetalking_tpu.ui.live import LiveUI

        fired = []
        ui = LiveUI(["a.wav"], out=io.StringIO(), on_quit=lambda: fired.append(1))
        ui._handle_key("up")
        assert fired == []
        ui._handle_key("q")
        assert fired == [1]

    def test_clip_scrolled_window_and_indicators(self):
        from jivetalking_tpu.ui.live import clip_to_viewport

        frame = "\n".join(f"line{i}" for i in range(30))
        # follow mode: tail + earlier indicator
        tail = clip_to_viewport(frame, height=10, offset=0)
        lines = tail.splitlines()
        assert lines[0] == "… 21 earlier line(s) …"
        assert lines[-1] == "line29" and len(lines) == 10
        # scrolled: window ends `offset` above the tail, both indicators
        mid = clip_to_viewport(frame, height=10, offset=5)
        lines = mid.splitlines()
        assert lines[-1].startswith("… 5 later line(s) …")
        assert lines[-2] == "line24"
        assert lines[0].startswith("…") and "earlier" in lines[0]
        assert len(lines) <= 10
        # offset clamps to the content: scrolled to the very top
        top = clip_to_viewport(frame, height=10, offset=999)
        assert top.splitlines()[0] == "line0"
        # short content never scrolls or decorates
        assert clip_to_viewport("a\nb", height=10, offset=3) == "a\nb"

    def test_decode_keys_sequences(self):
        from jivetalking_tpu.ui.live import _decode_keys

        keys, rest = _decode_keys(
            b"\x1b[A\x1b[B\x1b[5~\x1b[6~\x1b[H\x1b[Fqkj\x03")
        assert keys == ["up", "down", "pgup", "pgdn", "home", "end",
                        "q", "k", "j", "ctrl_c"]
        assert rest == b""

    def test_decode_keys_sgr_wheel_and_partial(self):
        from jivetalking_tpu.ui.live import _decode_keys

        keys, rest = _decode_keys(b"\x1b[<64;10;5M\x1b[<65;10;5M\x1b[<0;3;3M")
        assert keys == ["wheel_up", "wheel_down"]
        assert rest == b""
        # a partial CSI stays buffered for the next read
        keys, rest = _decode_keys(b"\x1b[<64;10")
        assert keys == [] and rest == b"\x1b[<64;10"
        keys, rest = _decode_keys(b"\x1b")
        assert keys == [] and rest == b"\x1b"


class TestAppHeader:
    """The gradient wordmark atop the live view (ref: TestHeaderIsGradient,
    TestHeaderHasNoSubtitle, TestRenderTitleIsStable/DownsamplesNoColor)."""

    def test_frame_leads_with_title(self):
        model = LiveModel(files=["a.flac"])
        model.title = "jivetalking-tpu 🕺"
        lines = render_frame(model, tick=0).splitlines()
        assert lines[0] == "jivetalking-tpu 🕺"
        assert lines[1] == ""            # no subtitle
        # untitled models render no header (pure view tests stay stable)
        assert "🕺" not in render_frame(LiveModel(files=["a.flac"]), tick=0)

    def test_live_ui_title_plain_on_non_tty(self):
        ui = LiveUI(["a.flac"], out=io.StringIO())
        assert ui.model.title == "jivetalking-tpu 🕺"   # no ANSI when piped

    def test_title_gradient_and_stability(self):
        from jivetalking_tpu.cli.styles import render_title

        t1, t2 = render_title(True), render_title(True)
        assert t1 == t2                                  # stable across calls
        assert t1.count("\x1b[38;2;") == len("jivetalking-tpu")
        assert render_title(False) == "jivetalking-tpu"  # downsampled plain


class TestAdaptedSummaryFromConfigVectors:
    """The full config -> summary field-mapping table
    (ref: TestNewAdaptedSummaryFromConfig, summary_test.go:15-94;
    TestNewAdaptedSummaryNoSpeech :94-122)."""

    def _mapped(self):
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.adaptive.adapt import AdaptiveDiagnostics
        from jivetalking_tpu.analysis.analyser import AudioMeasurements
        from jivetalking_tpu.analysis.types import (
            Region,
            RegionSample,
            SpeechCandidate,
        )
        from jivetalking_tpu.ui.summary import new_adapted_summary

        cfg = default_filter_config()
        cfg.resample.sample_rate = 44100
        cfg.rumble_highpass.frequency = 80.0
        cfg.bandlimit_lowpass.frequency = 20500.0
        cfg.noise_reduction.enabled = True
        cfg.noise_reduction.afftdn_enabled = True
        cfg.speech_gate.threshold = 0.0078     # linear ~ -42.1 dB
        cfg.speech_gate.ratio = 2.0
        cfg.levelling_compressor.threshold = -11.9
        cfg.deesser.intensity = 0.0

        m = AudioMeasurements()
        m.noise.floor = -85.0     # internal momentary floor; display-inert
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-68.0)
        m.loudness.input_lra = 8.2
        m.loudness.input_tp = -3.2
        m.loudness.input_i = -24.3
        sp = SpeechCandidate(region=Region(0.0, 10.0),
                             sample=RegionSample(rms_level=-20.9))
        sp.body_band_rms = -30.0
        sp.sib_band_rms = -34.0
        sp.bands_measured = True
        m.vad.speech_profile = sp

        diag = AdaptiveDiagnostics(speech_gate_depth_db=14.0)
        return new_adapted_summary(cfg, diag, m)

    def test_chain_and_mix_mapping(self):
        s = self._mapped()
        assert s.chain_ready
        assert s.downmix_mono and s.sample_rate == 44100
        assert s.highpass_hz == 80.0 and s.lowpass_hz == 20500.0
        assert s.denoise_nlm and s.denoise_fft

    def test_threshold_mappings(self):
        s = self._mapped()
        assert -43.0 < s.gate_thresh_db < -41.0      # ~ -42.1 dB
        assert s.comp_thresh_db == -11.9
        assert not s.deesser_on                      # intensity 0 -> OFF

    def test_analysis_mappings(self):
        s = self._mapped()
        assert s.has_speech and s.voice_avg_db == -20.9
        # displayed floor is the room-tone RMS, never the internal -85
        assert s.noise_floor_db == -68.0
        assert s.separation_db == pytest.approx(-20.9 - (-68.0))
        assert s.has_sibilance
        assert s.sibilance_db == pytest.approx(-34.0 - (-30.0))
        assert s.gate_depth_db == 14.0
        assert s.input_lufs == -24.3
        assert s.input_lra == 8.2
        assert s.true_peak_dbtp == -3.2
        assert s.gate_ratio == 2.0

    def test_limiter_pending_before_with_limiter(self):
        s = self._mapped()
        assert not s.limiter_ready

    def test_no_speech_leaves_speech_rows_unset(self):
        # (ref: TestNewAdaptedSummaryNoSpeech :94)
        from jivetalking_tpu.adaptive import default_filter_config
        from jivetalking_tpu.analysis.analyser import AudioMeasurements
        from jivetalking_tpu.analysis.types import RegionSample
        from jivetalking_tpu.ui.summary import new_adapted_summary

        cfg = default_filter_config()
        cfg.resample.sample_rate = 48000
        m = AudioMeasurements()
        m.noise.floor = -85.0
        m.vad.elected_room_tone_sample = RegionSample(rms_level=-60.0)
        s = new_adapted_summary(cfg, None, m)
        assert s.chain_ready
        assert not s.has_speech and not s.has_sibilance
        assert s.noise_floor_db == -60.0


class TestAnalysisVerdictVectors:
    """The analysis verdict's advice-word table and defensive renders
    (ref: analysis_model_test.go TestAnalysisVerdictRendersScoreAndGain :44,
    TestAnalysisVerdictGainGlyph :74, TestGainBarStyled :120,
    TestAnalysisVerdictCarriesBar :129,
    TestAnalysisVerdictSkippedWithoutMeasurements :152)."""

    def _outcome(self, input_tp, stars=5, label="Excellent"):
        from jivetalking_tpu.cli.pool import FileOutcome

        return FileOutcome(path="ep.wav", input_tp=input_tp,
                           input_lufs=-21.0, input_lra=9.0,
                           recording_stars=stars, recording_label=label)

    @pytest.mark.parametrize("name,input_tp,want_subs", [
        ("fine", -9.0, ["Recording", "★★★★★", "Excellent", "Gain",
                        "Level well set"]),
        ("hot", -0.13, ["Recording", "Gain", "Hot", "Lower input gain"]),
        ("quiet", -21.41, ["Recording", "Gain", "Quiet",
                           "Raise input gain"]),
        ("clipping", 0.4, ["Recording", "Gain", "Clipping",
                           "Lower input gain"]),
    ])
    def test_advice_word_table(self, name, input_tp, want_subs):
        from jivetalking_tpu.ui.console import render_analysis_summary

        view = render_analysis_summary(self._outcome(input_tp))
        for sub in want_subs:
            assert sub in view, f"{name}: missing {sub!r}\n{view}"

    def test_gain_glyph_is_wide_dbtp(self):
        # the advice line speaks ㏈TP like the TUI's true-peak rows
        from jivetalking_tpu.ui.console import render_analysis_summary

        view = render_analysis_summary(self._outcome(-0.13))
        assert "㏈TP" in view

    @pytest.mark.parametrize("input_tp", [-21.41, -9.0, -0.13, 0.4])
    def test_carries_bar_runes_in_every_zone(self, input_tp):
        from jivetalking_tpu.ui.console import render_analysis_summary

        view = render_analysis_summary(self._outcome(input_tp))
        assert "▰" in view or "▱" in view

    def test_gain_bar_styled_when_colour_on(self):
        # (ref: TestGainBarStyled) — colour adds ANSI sequences; the bare
        # runes stay identical once stripped
        import re

        from jivetalking_tpu.ui.console import gain_bar

        styled = gain_bar(-0.1, color=True)
        assert "\033[" in styled
        assert re.sub(r"\033\[[0-9;]*m", "", styled) == gain_bar(-0.1)

    def test_failed_outcome_renders_error_without_verdict(self):
        # (ref: TestAnalysisVerdictSkippedWithoutMeasurements) — a failed
        # row never renders the verdict lines and never raises
        from jivetalking_tpu.cli.pool import FileOutcome
        from jivetalking_tpu.ui.console import render_analysis_summary

        o = FileOutcome(path="ep.wav", error="boom")
        view = render_analysis_summary(o)
        assert "✗" in view and "boom" in view
        assert "Recording" not in view and "Gain" not in view


class TestAnalysisLiveCompletionRouting:
    """Per-file completion routing + session end only on ALL complete
    (ref: analysis_model_test.go TestAnalysisCompleteMsgCounts :197,
    TestAnalysisQuitOnlyOnAllComplete :228,
    TestAnalysisProgressMsgIndexRouting :159)."""

    def _ui(self):
        import io

        from jivetalking_tpu.ui.live import AnalysisLiveUI

        return AnalysisLiveUI(["a.wav", "b.wav"], out=io.StringIO())

    def _outcome(self, path, error=None):
        from jivetalking_tpu.cli.pool import FileOutcome

        return FileOutcome(path=path, error=error, input_tp=-9.0,
                           input_lufs=-21.0, input_lra=9.0,
                           recording_stars=4, recording_label="Great")

    def test_progress_routes_by_path_not_neighbours(self):
        ui = self._ui()
        ui.on_progress("b.wav", "analysis", 0.75)
        assert ui.model.rows["b.wav"].fraction == 0.75
        assert ui.model.rows["a.wav"].fraction == 0.0

    def test_per_file_complete_counts_and_does_not_end_session(self):
        ui = self._ui()
        ui.on_file_complete(self._outcome("a.wav"))
        assert ui.model.rows["a.wav"].done
        assert not ui.model.all_done          # one of two: session continues

        ui.on_file_complete(self._outcome("b.wav", error="boom"))
        assert ui.model.rows["b.wav"].done
        assert ui.model.rows["b.wav"].error == "boom"
        assert ui.model.all_done              # all rows done -> session ends

    def test_error_row_renders_cross_success_renders_summary(self):
        ui = self._ui()
        ui.on_file_complete(self._outcome("a.wav"))
        ui.on_file_complete(self._outcome("b.wav", error="boom"))
        assert "Recording" in ui.model.rows["a.wav"].done_box
        assert "✗" in ui.model.rows["b.wav"].done_box

    def test_unknown_path_completion_is_safe(self):
        # (ref: TestAnalysisUpdateOutOfRangeSafety :344)
        ui = self._ui()
        ui.on_file_complete(self._outcome("zzz.wav"))   # no such row
        assert not ui.model.all_done


class TestProcessingFrameSectionOrder:
    """The frame's section layout: title first, file queue next, the
    overall-totals footer last, no 'file(s)' subtitle
    (ref: TestProcessingViewSectionOrder, view_layout_test.go:57-82 and
    TestProcessingViewOverallProgressContent :82-102 — the repo places the
    totals as a FOOTER rather than the reference's top box, a documented
    layout adaptation; the CONTENT contract is identical)."""

    def _model(self, files=("a.wav", "b.wav")):
        from jivetalking_tpu.ui.live import LiveModel

        m = LiveModel(files=list(files))
        m.title = "Jivetalking"
        return m

    def test_section_order_title_queue_footer(self):
        from jivetalking_tpu.ui.live import render_frame

        frame = render_frame(self._model(), tick=0)
        assert "file(s)" not in frame           # no subtitle
        t = frame.index("Jivetalking")
        q = frame.index("a.wav")
        f = frame.index("complete")
        assert t < q < f, frame

    def test_overall_progress_counts(self):
        from jivetalking_tpu.ui.live import render_frame

        m = self._model(("a.wav", "b.wav", "c.wav"))
        m.rows["a.wav"].done = True
        m.rows["a.wav"].done_box = "done-a"
        frame = render_frame(m, tick=0)
        assert "3 files" in frame
        assert "1 complete" in frame
        assert "0 failed" in frame

    def test_failed_count_separated(self):
        from jivetalking_tpu.ui.live import render_frame

        m = self._model(("a.wav", "b.wav"))
        m.rows["a.wav"].done = True
        m.rows["a.wav"].error = "boom"
        m.rows["a.wav"].done_box = "x"
        frame = render_frame(m, tick=0)
        assert "0 complete" in frame and "1 failed" in frame

    def test_single_file_omits_footer(self):
        from jivetalking_tpu.ui.live import render_frame

        m = self._model(("solo.wav",))
        frame = render_frame(m, tick=0)
        assert "complete" not in frame


class TestJoinStatusBoxes:
    """Side-by-side box composition (ref: TestJoinStatusBoxesLayout
    statusboxes_test.go:236-266, TestJoinStatusBoxesHeightMatch :267-293,
    TestStatusBoxGutterSymmetric :441-490,
    TestStatusBoxCacheByteIdentical :492-527 — determinism in lieu of the
    reference's render cache)."""

    def _summary(self):
        s = AdaptedSummary(chain_ready=True)
        s.downmix_mono = True
        s.sample_rate = 48000
        s.highpass_hz = 80.0
        s.lowpass_hz = 20500.0
        return s

    def test_rows_join_chain_left_analysis_right(self):
        from jivetalking_tpu.ui.live import _boxes_for
        from jivetalking_tpu.ui.statusbox import (
            _disp_width,
            render_analysis_box,
            render_filter_chain_box,
        )

        s = self._summary()
        joined = _boxes_for(s)
        chain = render_filter_chain_box(s).splitlines()
        analysis = render_analysis_box(s).splitlines()
        # the chain box is the left column, the analysis box the right
        assert joined[0].startswith(chain[0])
        assert joined[0].endswith(analysis[0])
        # every joined row has the same display width (the layout is a
        # rectangle regardless of per-row content)
        widths = {_disp_width(r) for r in joined}
        assert len(widths) == 1, widths

    def test_height_match_pads_the_shorter_box(self):
        from jivetalking_tpu.ui.live import _boxes_for
        from jivetalking_tpu.ui.statusbox import (
            render_analysis_box,
            render_filter_chain_box,
        )

        s = self._summary()
        chain = render_filter_chain_box(s).splitlines()
        analysis = render_analysis_box(s).splitlines()
        joined = _boxes_for(s)
        assert len(joined) == max(len(chain), len(analysis))
        # padded rows of the shorter column are spaces, not truncation
        if len(chain) < len(analysis):
            tail = joined[-1]
            assert tail[:len(chain[0])].strip() == ""

    def test_gutter_is_symmetric_two_spaces(self):
        from jivetalking_tpu.ui.live import _boxes_for
        from jivetalking_tpu.ui.statusbox import render_filter_chain_box

        s = self._summary()
        chain = render_filter_chain_box(s).splitlines()
        joined = _boxes_for(s)
        for i, row in enumerate(joined[:len(chain)]):
            assert row[len(chain[i]):len(chain[i]) + 2] == "  ", i

    def test_render_is_byte_identical_across_calls(self):
        from jivetalking_tpu.ui.live import _boxes_for

        s = self._summary()
        assert _boxes_for(s) == _boxes_for(s)


class TestFinalSummaryContent:
    """The completion frame (ref: TestFinalSummaryReturnsCompletionContent,
    view_layout_test.go:102-146) carries the wordmark, the overall totals
    box and every per-file done box — with the retired marketing strings
    gone — and the outcome's TP/LRA/recording quality flow through
    on_file_complete into the rendered box (ref:
    TestFileCompleteMsgCopiesOutputTPAndLRA, view_layout_test.go:636-655;
    TestFileCompleteMsgCopiesRecordingQuality :717-734)."""

    @staticmethod
    def _plain(s):
        import re

        return re.sub(r"\x1b\[[0-9;?]*[a-zA-Z]", "", s)

    def test_completion_frame_content(self):
        ui = LiveUI(["a.wav", "b.wav"], out=io.StringIO())
        ui.on_progress("a.wav", "processing", 0.5)
        ui.on_file_complete(FileOutcome(
            path="a.wav", output_path="a-out.wav", input_lufs=-30.9,
            output_lufs=-15.9, input_tp=-6.0, output_tp=-2.0,
            input_lra=10.0, output_lra=8.0,
            input_noise_floor=-60.0, output_noise_floor=-80.0,
            quality_stars=4, quality_label="Great",
            recording_stars=2, recording_label="Fair"))
        ui.on_file_complete(FileOutcome(
            path="b.wav", output_path="b-out.wav", input_lufs=-20.0,
            output_lufs=-16.0, quality_stars=5, quality_label="Excellent"))
        assert ui.model.all_done

        plain = self._plain(render_frame(ui.model, tick=0))
        # title + overall totals box, matching the live view
        assert "jivetalking-tpu" in plain
        assert "2 files" in plain and "2 complete" in plain
        # per-file done boxes, each naming its OUTPUT file
        assert "a-out.wav" in plain and "b-out.wav" in plain
        # the outcome's output TP and LRA surface in the box (the copy
        # contract): -6.0 -> -2.0 dBTP, 10.0 -> 8.0 LU
        assert "-2.0" in plain and "8.0" in plain
        # both star rows with their own label
        assert "★★☆☆☆" in plain and "Fair" in plain
        assert "★★★★★" in plain and "Excellent" in plain
        # retired strings stay gone
        for gone in ("Processing Complete", "Audacity",
                     "normalized to -16", "level-matched"):
            assert gone not in plain

    def test_error_outcome_counts_failed_not_complete(self):
        # (single-file runs omit the overall footer — pinned elsewhere —
        # so the failed-count grammar is asserted on a two-file run)
        ui = LiveUI(["a.wav", "b.wav"], out=io.StringIO())
        ui.on_file_complete(FileOutcome(path="a.wav", error="boom"))
        ui.on_file_complete(FileOutcome(path="b.wav", output_path="b-out.wav"))
        assert ui.model.all_done
        plain = self._plain(render_frame(ui.model, tick=0))
        assert "1 complete, 1 failed" in plain
        assert "boom" in plain


class TestStatusBoxCache:
    """The per-row status-box render memo (ref: FileProgress.
    statusBoxCache, statusboxes.go; contracts from
    statusboxes_test.go:492-596): cached panels byte-identical to fresh
    renders across the pending/lit/limiter states, re-render on summary
    or width change, and message-path invalidation on the summary and
    limiter callbacks."""

    def _lit(self):
        return AdaptedSummary(
            chain_ready=True, downmix_mono=True, highpass_hz=80.0,
            lowpass_hz=20500.0, denoise_nlm=True, denoise_fft=True,
            gate_thresh_db=-42.1, gate_ratio=2.0, comp_thresh_db=-11.9,
            deesser_on=False, deesser_i=0.0, sample_rate=44100,
            has_speech=True, voice_avg_db=-20.9, has_noise_floor=True,
            noise_floor_db=-68.0, separation_db=47.0, input_lra=8.2,
            true_peak_dbtp=-3.2, has_sibilance=True, sibilance_db=-4.0,
            gate_depth_db=14.0, input_lufs=-24.3,
        )

    def _row(self, summary):
        from jivetalking_tpu.ui.live import FileRow

        row = FileRow(path="a.flac")
        row.summary = summary
        return row

    def test_cached_panel_byte_identical_across_states(self):
        # (ref: TestStatusBoxCacheByteIdentical): pre-Pass-2 pending,
        # during Pass 2 lit, and post-completion limiter-lit — the warm
        # second render must equal a one-shot uncached render exactly
        from jivetalking_tpu.ui.live import _boxes_for, _boxes_for_row

        states = [
            AdaptedSummary(),
            self._lit(),
            with_limiter(self._lit(), enabled=True, ceiling_dbtp=-2.8),
        ]
        for summary in states:
            row = self._row(summary)
            first = _boxes_for_row(row, cols=160)
            assert row.box_cache is not None   # populated by frame 1
            cached = _boxes_for_row(row, cols=160)
            assert cached is first             # frame 2 reused the memo
            assert cached == _boxes_for(summary, cols=160)

    def test_summary_change_re_renders(self):
        # (ref: TestStatusBoxCacheInvalidatesOnSummary): the limiter
        # lighting in place must not serve the stale panel even though
        # the summary OBJECT is unchanged (with_limiter mutates)
        from jivetalking_tpu.ui.live import _boxes_for, _boxes_for_row

        row = self._row(self._lit())
        first = _boxes_for_row(row, cols=160)
        row.summary = with_limiter(row.summary, enabled=True,
                                   ceiling_dbtp=-2.8)
        second = _boxes_for_row(row, cols=160)
        assert second != first
        assert second == _boxes_for(row.summary, cols=160)
        assert any("-2.8" in l for l in second)

    def test_width_change_re_renders(self):
        # (ref: TestStatusBoxCacheInvalidatesOnHeight — the geometry key;
        # here the layout key is the terminal width, whose narrow value
        # stacks the boxes instead of joining them)
        from jivetalking_tpu.ui.live import _boxes_for_row

        row = self._row(self._lit())
        wide = _boxes_for_row(row, cols=160)
        narrow = _boxes_for_row(row, cols=40)
        assert narrow != wide
        assert len(narrow) > len(wide)         # stacked, not joined
        # and the cache now holds the narrow layout
        assert _boxes_for_row(row, cols=40) is narrow

    def test_callbacks_invalidate_message_path(self):
        # (ref: TestModelInvalidatesCacheOnAdaptedSummaryMsg): the
        # summary and limiter callbacks clear the memo outright,
        # independent of the key comparison
        ui = LiveUI(["a.flac"], out=io.StringIO())
        row = ui.model.rows["a.flac"]
        ui.on_adapted_summary("a.flac", self._lit())
        assert row.box_cache is None
        render_frame(ui.model, tick=0)
        assert row.box_cache is not None
        ui.on_limiter("a.flac", enabled=True, ceiling_dbtp=-2.8)
        assert row.box_cache is None
        frame = render_frame(ui.model, tick=0)
        assert "-2.8" in frame
