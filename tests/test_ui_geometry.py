"""Geometry and spring-guard invariants of the live renderer — the
behavioural port of the reference's width/alignment/spring families
(progress_bar_test.go: TestProcessingRowFitsTerminal :548,
TestProgressWidthCapsAtMeterWidth :495, TestProgressBarAlignsWithMeter
:509, TestMeterPeakAtCeilingStaysInBounds :315, TestProgressSpring* :568,
TestPeakSpring* :623-733; statusboxes_test.go: TestJoinStatusBoxesLayout
:236, TestJoinStatusBoxesHeightMatch :267, TestStatusBoxGutterSymmetric
:441).

The reference pins ITS lipgloss design (RGB gradients, superscript peak
labels, pulsing arrows); this rebuild's ticker TUI is a plain-glyph
design, so the portable semantics are pinned instead: fixed display
geometry under every input (including out-of-range), column alignment
across rows, box height/gutter symmetry, and the spring physics guards.
Colour-gradient and superscript pins have no analogue here by design.
"""

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
from jivetalking_tpu.ui.live import (
    _BAR_WIDTH,
    _METER_FLOOR_DB,
    _METER_WIDTH,
    FileRow,
    LiveModel,
    _advance_meter,
    _bar,
    _boxes_for,
    render_frame,
    render_meter,
    render_timeline,
)
from jivetalking_tpu.ui.statusbox import _disp_width
from jivetalking_tpu.ui.summary import new_adapted_summary


def _summary():
    m = AudioMeasurements()
    m.loudness.input_i = -25.0
    m.loudness.input_tp = -8.0
    m.loudness.input_lra = 9.0
    m.vad.noise_profile = NoiseProfile(measured_noise_floor=-62.0)
    m.vad.elected_room_tone_sample = RegionSample(rms_level=-70.0)
    sp = SpeechCandidate(region=Region(0.0, 60.0), sample=RegionSample(
        rms_level=-24.0, momentary_lufs=-26.0))
    sp.bands_measured = True
    m.vad.speech_profile = sp
    m.vad.gate_stats.voiced_low_percentile = -32.0
    m.vad.gate_stats.separation_db = 25.0
    cfg, diag = adapt_config(default_filter_config(), m)
    return new_adapted_summary(cfg, diag, m)


class TestBarGeometry:
    """(ref: TestProgressWidthCapsAtMeterWidth + the ViewAs width pins)."""

    @pytest.mark.parametrize("fraction", [
        0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0,
        -0.5, 1.5, 2.0, -100.0, 100.0,   # out of range must clamp, not spill
    ])
    def test_bar_width_fixed_for_any_fraction(self, fraction):
        bar = _bar(fraction)
        assert len(bar) == _BAR_WIDTH
        assert set(bar) <= {"█", "░"}

    def test_bar_monotone_in_fraction(self):
        fills = [_bar(f).count("█") for f in np.linspace(0, 1, 21)]
        assert fills == sorted(fills)
        assert fills[0] == 0 and fills[-1] == _BAR_WIDTH

    def test_out_of_range_equals_clamped(self):
        # (ref: TestProgressSpringIgnoresOutOfRange — display never reacts
        # to out-of-range inputs beyond the clamp)
        assert _bar(-3.0) == _bar(0.0)
        assert _bar(42.0) == _bar(1.0)


class TestMeterGeometry:
    """(ref: TestMeterPeakAtCeilingStaysInBounds :315 and the meter width
    family)."""

    LEVELS = [-200.0, -60.0, -59.4, -40.0, -20.0, -6.0, -0.5, 0.0, 10.0]

    @pytest.mark.parametrize("level", LEVELS)
    @pytest.mark.parametrize("peak", [-200.0, -60.0, -30.0, -1.0, 0.0, 10.0])
    def test_meter_width_fixed_for_any_input(self, level, peak):
        lines = render_meter(level, peak).splitlines()
        # bar row: ▐ + cells + ▌ + 8-char value field (leading space in
        # %6.1f + ' dB'); the marker line never outgrows the bar row
        assert len(lines[0]) == 2 + _METER_WIDTH + 9, (level, peak, lines)
        for extra in lines[1:]:
            assert len(extra) <= len(lines[0])

    def test_peak_above_ceiling_pins_last_cell(self):
        # (ref: TestMeterPeakAtCeilingStaysInBounds :315) — at/above the
        # 0 dB ceiling the marker flips to the trailing-arrow form with ⬏
        # at the last in-bounds column (cap offset 1 + _METER_WIDTH - 1)
        for peak in (0.0, -0.5, 10.0):
            lines = render_meter(-40.0, peak).splitlines()
            assert len(lines) == 2, lines
            assert "┃" not in lines[0] and "|" not in lines[0]
            assert lines[1].rstrip().endswith("⬏")
            assert lines[1].index("⬏") == 1 + (_METER_WIDTH - 1)

    def test_no_peak_marker_at_or_below_floor(self):
        # (ref: TestMeterNoPeakMarkerAtFloor :341)
        for peak in (_METER_FLOOR_DB, _METER_FLOOR_DB - 20.0):
            out = render_meter(-40.0, peak)
            assert "⬑" not in out and "⬏" not in out
            assert len(out.splitlines()) == 1

    def test_floor_level_renders_placeholder_value(self):
        out = render_meter(_METER_FLOOR_DB, _METER_FLOOR_DB)
        assert "—" in out
        assert "dB" not in out

    def test_level_cells_monotone(self):
        fills = [render_meter(db, _METER_FLOOR_DB).count("█")
                 for db in np.linspace(-59.0, 0.0, 30)]
        assert fills == sorted(fills)


class TestProgressWidthFitsTerminal:
    """(ref: TestProcessingProgressWidthFitsTerminal,
    progress_bar_test.go:472-491 + TestProgressWidthCapsAtMeterWidth
    :496) — the bar shrinks with the terminal between the usability floor
    and its full width; wide terminals keep the full bar."""

    def test_bar_width_clamps_to_terminal(self):
        from jivetalking_tpu.ui.live import (
            _BAR_WIDTH,
            _MIN_BAR_WIDTH,
            _bar_width_for,
        )

        for term in (20, 40, 80, 120, 200):
            w = _bar_width_for(term)
            assert _MIN_BAR_WIDTH <= w <= _BAR_WIDTH, term
            # the row must not overflow unless the bar hit its floor
            from jivetalking_tpu.ui.live import _ROW_OVERHEAD

            if w > _MIN_BAR_WIDTH:
                assert _ROW_OVERHEAD + w <= term, term

    def test_wide_terminals_keep_full_bar(self):
        from jivetalking_tpu.ui.live import _BAR_WIDTH, _bar_width_for

        for term in (120, 200, None):
            assert _bar_width_for(term) == _BAR_WIDTH, term

    def test_rendered_rows_fit_narrow_terminal(self):
        model = LiveModel(files=["a.flac"])
        row = model.rows["a.flac"]
        row.stage = "analysis"
        row.fraction = row.disp_fraction = 0.5
        row.started = time.perf_counter() - 2.0
        frame = render_frame(model, tick=0, cols=70)
        progress_row = next(l for l in frame.splitlines() if ".flac" in l)
        assert _disp_width(progress_row) <= 70, progress_row

    def test_analysis_mode_rows_fit_terminal(self):
        # (ref: TestAnalysisProgressWidthFitsTerminal,
        # progress_bar_test.go:533-544) — the -a analysis UI rides the
        # same width clamp as the processing UI at every terminal size
        import io as _io

        from jivetalking_tpu.ui.live import AnalysisLiveUI

        for term in (20, 40, 80, 120, 200):
            ui = AnalysisLiveUI(["a.wav"], out=_io.StringIO())
            r = ui.model.rows["a.wav"]
            r.stage = "analysis"
            r.fraction = r.disp_fraction = 0.5
            r.started = time.perf_counter() - 2.0
            frame = render_frame(ui.model, tick=0, cols=term)
            progress_row = next(
                l for l in frame.splitlines() if ".wav" in l)
            # rows fit unless the bar already sits at its usability floor
            from jivetalking_tpu.ui.live import (
                _MIN_BAR_WIDTH,
                _ROW_OVERHEAD,
                _bar_width_for,
            )
            if _bar_width_for(term) > _MIN_BAR_WIDTH or (
                    _ROW_OVERHEAD + _MIN_BAR_WIDTH <= term):
                assert _disp_width(progress_row) <= term, (term, progress_row)


class TestRowAlignment:
    """(ref: TestProgressBarAlignsWithMeter :509 +
    TestProcessingRowFitsTerminal :548) — the frame's columns line up
    across rows and every line's display width is bounded and stable."""

    def _model(self, stages):
        model = LiveModel(files=[f"f{i}.flac" for i in range(len(stages))])
        for i, (stage, fraction) in enumerate(stages):
            row = model.rows[f"f{i}.flac"]
            row.stage = stage
            row.fraction = row.disp_fraction = fraction
            row.started = time.perf_counter() - 3.0
            if stage in ("processing", "normalising"):
                row.levels = np.full(8, -23.0)
                row.duration = 300.0
        return model

    def test_bar_columns_align_across_rows(self):
        model = self._model([("analysis", 0.2), ("processing", 0.9),
                             ("normalising", 0.5)])
        frame = render_frame(model, tick=0)
        rows = [l for l in frame.splitlines() if "█" in l or "░" in l]
        progress_rows = [l for l in rows if ".flac" in l]
        assert len(progress_rows) == 3
        bar_cols = {min(l.find("█") if "█" in l else 10**9,
                        l.find("░") if "░" in l else 10**9)
                    for l in progress_rows}
        assert len(bar_cols) == 1, progress_rows

    def test_progress_row_width_constant(self):
        for frac in (0.0, 0.33, 1.0):
            model = self._model([("processing", frac)])
            frame = render_frame(model, tick=0)
            row = frame.splitlines()[0]
            assert _disp_width(row) == _disp_width(
                render_frame(self._model([("processing", 0.5)]),
                             tick=3).splitlines()[0])

    def test_frame_lines_bounded(self):
        model = self._model([("processing", 0.5), ("analysis", 0.1)])
        model.rows["f0.flac"].summary = _summary()
        frame = render_frame(model, tick=1)
        assert max(_disp_width(l) for l in frame.splitlines()) <= 100


class TestTimelineGeometry:
    def test_timeline_width_stable_across_progress(self):
        row = FileRow(path="x", stage="processing", duration=300.0)
        widths = set()
        for frac in (0.05, 0.5, 0.95):
            row.fraction = frac
            line = render_timeline(row, elapsed=10.0)
            # dots field is fixed at 8 cells
            assert line.count("▰") + line.count("▱") == 8
            widths.add(line.count("▰") + line.count("▱"))
        assert widths == {8}

    def test_timeline_fill_clamped_out_of_range(self):
        row = FileRow(path="x", stage="processing", duration=300.0)
        row.fraction = 5.0
        line = render_timeline(row, elapsed=10.0)
        assert line.count("▰") == 8
        row.fraction = -2.0
        line = render_timeline(row, elapsed=10.0)
        assert line.count("▰") == 0


class TestPeakSpringGuards:
    """(ref: TestPeakSpringInitialisesAtFloor :623, TestPeakSpringEases
    :635, TestPeakSpringNoOvershoot :672, TestPeakSpringRisingTargets
    :701, TestPeakSpringIgnoresOutOfRange :733)."""

    def _row(self, levels):
        row = FileRow(path="x", stage="processing")
        row.levels = np.asarray(levels, dtype=np.float64)
        row.fraction = row.disp_fraction = 0.5
        return row

    def test_initialises_at_floor(self):
        row = FileRow(path="x")
        assert row.meter_db == _METER_FLOOR_DB
        assert row.peak_db == _METER_FLOOR_DB

    def test_peak_tracks_rising_levels_without_overshoot(self):
        row = self._row(np.full(8, -10.0))
        t = 0.0
        for _ in range(60):
            t += 1 / 15
            _advance_meter(row, t)
            # never overshoots the target level
            assert row.meter_db <= -10.0 + 1e-9
            assert row.peak_db <= -10.0 + 1e-9
            # peak never lags the eased level
            assert row.peak_db >= row.meter_db - 1e-9
        assert row.meter_db == pytest.approx(-10.0, abs=0.2)
        assert row.peak_db == pytest.approx(-10.0, abs=0.2)

    def test_out_of_range_levels_clamped(self):
        # +20 dB target must clamp to the 0 dB ceiling; -300 to the floor
        hot = self._row(np.full(8, 20.0))
        t = 0.0
        for _ in range(80):
            t += 1 / 15
            _advance_meter(hot, t)
            assert hot.meter_db <= 0.0 + 1e-9
        cold = self._row(np.full(8, -300.0))
        t = 0.0
        for _ in range(80):
            t += 1 / 15
            _advance_meter(cold, t)
            assert cold.meter_db >= _METER_FLOOR_DB - 1e-9

    def test_peak_holds_then_decays_but_never_below_level(self):
        row = self._row(np.full(8, -5.0))
        t = 0.0
        for _ in range(40):
            t += 1 / 15
            _advance_meter(row, t)
        # drop the programme level; the peak holds ~1 s then decays
        row.levels = np.full(8, -50.0)
        peak_at_drop = row.peak_db
        for _ in range(4):
            t += 1 / 15
            _advance_meter(row, t)
        assert row.peak_db == pytest.approx(peak_at_drop)   # inside hold
        for _ in range(120):
            t += 1 / 15
            _advance_meter(row, t)
            assert row.peak_db >= row.meter_db - 1e-9       # never below level
        assert row.peak_db < peak_at_drop - 10.0            # decay happened


class TestStatusBoxJoin:
    """(ref: TestJoinStatusBoxesLayout :236, TestJoinStatusBoxesHeightMatch
    :267, TestStatusBoxGutterSymmetric :441)."""

    def test_joined_boxes_equal_height_and_width(self):
        joined = _boxes_for(_summary())
        assert len(joined) >= 4
        widths = {_disp_width(l) for l in joined}
        assert len(widths) == 1, joined

    def test_two_boxes_side_by_side_with_gutter(self):
        joined = _boxes_for(_summary())
        top = joined[0]
        # two top borders in one line, separated by the two-space gutter
        assert top.count("╭") == 2
        assert "  ╭" in top or "  ╭" in top.replace("╮  ", "  ╭", 1) or "╮  " in top

    def test_gutter_symmetric_borders(self):
        joined = _boxes_for(_summary())
        for line in joined[1:-1]:
            if "│" not in line:
                continue
            # each inner row crosses 4 vertical borders: │..│  │..│
            assert line.count("│") in (2, 4), line

    def test_box_height_padding_is_blank(self):
        # when one box is shorter, its padding lines are pure spaces (the
        # reference pads the shorter box to height-match, :267)
        joined = _boxes_for(_summary())
        for line in joined:
            assert _disp_width(line) == _disp_width(joined[0])


class TestStatusBoxDeterminism:
    """(ref: TestStatusBoxCacheByteIdentical :492 and the cache
    invalidation family, statusboxes_test.go) — this design re-renders
    every tick instead of caching, so the portable contract is purity: the
    same summary renders byte-identically every time, and a changed
    summary changes the bytes."""

    def test_same_summary_renders_byte_identical(self):
        from jivetalking_tpu.ui.statusbox import (
            render_analysis_box,
            render_filter_chain_box,
        )

        s = _summary()
        assert render_filter_chain_box(s) == render_filter_chain_box(s)
        assert render_analysis_box(s) == render_analysis_box(s)
        assert _boxes_for(s) == _boxes_for(s)

    def test_changed_summary_changes_bytes(self):
        from dataclasses import replace

        from jivetalking_tpu.ui.statusbox import render_filter_chain_box

        s = _summary()
        s2 = replace(s, gate_thresh_db=s.gate_thresh_db - 6.0)
        assert render_filter_chain_box(s) != render_filter_chain_box(s2)


class TestMeterFloorMirror:
    """(ref: TestCalculateFrameLevelFloorsAtMeterFloor +
    TestCalculateFrameLevelBelowOldMinus60Floor,
    encoder_level_test.go:42-93) — the meter floor is -70 dB, matching the
    reference's deliberate move off the old -60 clamp: quiet audio at
    -65 dB reads through; below-floor and silent levels clamp at -70
    without -inf garbage."""

    def test_floor_constant_is_minus_seventy(self):
        assert _METER_FLOOR_DB == -70.0

    def test_minus_65_reads_through(self):
        row = FileRow(path="x", stage="processing")
        row.levels = np.full(8, -65.0)
        row.fraction = row.disp_fraction = 0.5
        t = 0.0
        for _ in range(80):
            t += 1 / 15
            _advance_meter(row, t)
        # the old -60 floor would have pinned this at -60
        assert row.meter_db == pytest.approx(-65.0, abs=0.3)
        assert row.meter_db < -60.0

    def test_below_floor_clamps_to_minus_seventy(self):
        for target in (-90.0, -300.0, -float("inf")):
            row = FileRow(path="x", stage="processing")
            row.levels = np.full(8, target)
            row.fraction = row.disp_fraction = 0.5
            t = 0.0
            for _ in range(80):
                t += 1 / 15
                _advance_meter(row, t)
            assert np.isfinite(row.meter_db), target
            assert row.meter_db >= _METER_FLOOR_DB - 1e-9, target

    def test_render_at_minus_65_shows_value_not_placeholder(self):
        out = render_meter(-65.0, -65.0)
        assert "-65.0 dB" in out
        assert "—" not in out
