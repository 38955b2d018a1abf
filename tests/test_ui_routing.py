"""Event-routing contracts for the live UI — the behavioural port of the
reference's model-routing suite (ref: internal/ui/model_routing_test.go:
TestProgressMsgIndexRouting :14, TestFileCompleteMsgIndexRouting :43,
TestUpdateOutOfRangeSafety :65, TestWindowSizeMsgPreservesRoutedFiles :93,
TestRenderOverallProgressFooter :262, TestInitStartsMeterTick :289,
TestMeterTickStepsSpringWithoutMutatingRoutedFields :301,
TestMeterTickStopsAfterAllComplete :335; quit/scroll keys
TestQuitKeysStillQuitWithViewport :166, TestMouseWheelMovesOffset :245).

The Bubble Tea model routes typed messages by file index; this rebuild
routes pool callbacks by path.  Same contracts: events land only on their
file's row, unknown targets are safe no-ops, ticker physics never mutate
routed state, and resize/scroll never lose a row.
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np

from jivetalking_tpu.cli.pool import FileOutcome
from jivetalking_tpu.ui.live import (
    LiveModel,
    LiveUI,
    _advance_meter,
    handle_key,
    render_frame,
    render_overall_progress,
)

FILES = ["a.wav", "b.wav", "c.wav"]


def _ui() -> LiveUI:
    return LiveUI(FILES, out=io.StringIO())


def _outcome(path, error="") -> FileOutcome:
    return FileOutcome(
        path=path, error=error, output_path=path + ".out.flac",
        input_lufs=-30.0, output_lufs=-16.0, input_tp=-2.0, output_tp=-1.9,
        input_lra=10.0, output_lra=8.0, quality_stars=4,
        quality_label="Excellent", recording_stars=3, recording_label="Good",
        wall_secs=10.0, realtime_factor=30.0,
    )


class TestEventRoutingByPath:
    """(ref: TestProgressMsgIndexRouting :14 +
    TestFileCompleteMsgIndexRouting :43)."""

    def test_progress_routes_to_exactly_its_row(self):
        ui = _ui()
        ui.on_progress("b.wav", "processing", 0.4)
        rows = ui.model.rows
        assert rows["b.wav"].stage == "processing"
        assert rows["b.wav"].fraction == 0.4
        assert rows["a.wav"].stage == "" and rows["a.wav"].fraction == 0.0
        assert rows["c.wav"].stage == "" and rows["c.wav"].fraction == 0.0

    def test_stage_change_resets_eased_bar_only_for_its_row(self):
        ui = _ui()
        ui.on_progress("a.wav", "analysis", 1.0)
        ui.model.rows["a.wav"].disp_fraction = 0.9
        ui.model.rows["b.wav"].disp_fraction = 0.7
        ui.on_progress("a.wav", "processing", 0.0)
        assert ui.model.rows["a.wav"].disp_fraction == 0.0
        assert ui.model.rows["b.wav"].disp_fraction == 0.7

    def test_complete_routes_and_counts(self):
        ui = _ui()
        ui.on_file_complete(_outcome("b.wav"))
        assert ui.model.rows["b.wav"].done
        assert not ui.model.rows["a.wav"].done
        assert not ui.model.all_done
        ui.on_file_complete(_outcome("a.wav"))
        ui.on_file_complete(_outcome("c.wav", error="boom"))
        assert ui.model.all_done
        assert ui.model.rows["c.wav"].error == "boom"

    def test_levels_and_duration_route_by_path(self):
        ui = _ui()
        ui.on_levels("c.wav", np.asarray([-30.0, -20.0]), 0.1)
        ui.on_duration("c.wav", 123.0)
        assert ui.model.rows["c.wav"].duration == 123.0
        assert ui.model.rows["c.wav"].levels is not None
        assert ui.model.rows["a.wav"].levels is None
        assert ui.model.rows["a.wav"].duration == 0.0


class TestUnknownTargetSafety:
    """(ref: TestUpdateOutOfRangeSafety :65) — a message for a file this
    UI doesn't know must never crash or change any routed state."""

    def _snapshot(self, ui):
        return {p: dataclasses.replace(r) for p, r in ui.model.rows.items()}

    def test_every_handler_tolerates_unknown_path(self):
        ui = _ui()
        ui.on_progress("a.wav", "processing", 0.5)
        before = self._snapshot(ui)
        ui.on_file_start("ghost.wav")
        ui.on_progress("ghost.wav", "processing", 0.9)
        ui.on_duration("ghost.wav", 5.0)
        ui.on_levels("ghost.wav", np.asarray([-20.0]), 0.1)
        ui.on_limiter("ghost.wav", True, -2.5)
        ui.on_adapted_summary("ghost.wav", None)
        ui.on_file_complete(_outcome("ghost.wav"))
        after = self._snapshot(ui)
        assert after == before
        assert not ui.model.all_done
        assert "ghost.wav" not in ui.model.rows

    def test_frame_still_renders_after_unknown_events(self):
        ui = _ui()
        ui.on_progress("ghost.wav", "processing", 0.9)
        frame = render_frame(ui.model, tick=3, cols=120)
        for f in FILES:
            assert f in frame


class TestResizePreservesRoutedState:
    """(ref: TestWindowSizeMsgPreservesRoutedFiles :93 +
    TestWindowSizeMsgSizesViewport :128) — rendering at any width is pure:
    no row state changes, no row disappears."""

    def test_render_at_many_widths_never_mutates_model(self):
        ui = _ui()
        ui.on_file_start("a.wav")
        ui.on_progress("a.wav", "processing", 0.5)
        ui.on_progress("b.wav", "analysis", 0.2)
        ui.on_file_complete(_outcome("c.wav"))
        before = {p: dataclasses.replace(r) for p, r in ui.model.rows.items()}
        for cols in (38, 60, 80, 120, 250, None):
            frame = render_frame(ui.model, tick=1, cols=cols)
            assert "a.wav" in frame and "b.wav" in frame
        after = {p: dataclasses.replace(r) for p, r in ui.model.rows.items()}
        assert after == before


class TestMeterTickPhysics:
    """(ref: TestMeterTickStepsSpringWithoutMutatingRoutedFields :301 +
    TestMeterTickStopsAfterAllComplete :335)."""

    ROUTED = ("path", "stage", "fraction", "error", "done", "done_box",
              "summary", "duration", "level_hop")

    def test_tick_steps_springs_only(self):
        ui = _ui()
        ui.on_progress("a.wav", "processing", 0.8)
        ui.on_levels("a.wav", np.asarray([-18.0] * 50), 0.25)
        row = ui.model.rows["a.wav"]
        routed_before = {f: getattr(row, f) for f in self.ROUTED}
        disp0, meter0 = row.disp_fraction, row.meter_db
        for i in range(20):
            _advance_meter(row, now=float(i) * 0.07)
        assert {f: getattr(row, f) for f in self.ROUTED} == routed_before
        # the springs moved toward their targets
        assert row.disp_fraction > disp0
        assert row.meter_db > meter0

    def test_tick_converges_monotonically_toward_target(self):
        ui = _ui()
        ui.on_progress("a.wav", "processing", 1.0)
        row = ui.model.rows["a.wav"]
        prev = row.disp_fraction
        for i in range(100):
            _advance_meter(row, now=float(i) * 0.07)
            assert prev <= row.disp_fraction <= 1.0
            prev = row.disp_fraction
        assert row.disp_fraction > 0.95

    def test_ticker_loop_stops_after_all_complete(self):
        # (ref: TestMeterTickStopsAfterAllComplete :335) — the repaint
        # loop exits on its own once every file is done.
        ui = _ui()
        for f in FILES:
            ui.on_file_complete(_outcome(f))
        assert ui.model.all_done
        ui._loop()  # returns instead of spinning: all_done breaks the loop
        assert ui._tick >= 1


class TestFooterAndKeys:
    """(ref: TestRenderOverallProgressFooter :262 — counts, never a
    'file N of M' cursor; quit/scroll keys :166-261)."""

    def test_footer_counts_complete_and_failed(self):
        ui = _ui()
        ui.on_file_complete(_outcome("a.wav"))
        ui.on_file_complete(_outcome("b.wav", error="x"))
        footer = render_overall_progress(ui.model)
        assert "3 files" in footer
        assert "1 complete" in footer
        assert "1 failed" in footer
        assert " of " not in footer

    def test_footer_only_with_multiple_files(self):
        ui = LiveUI(["solo.wav"], out=io.StringIO())
        frame = render_frame(ui.model, tick=0, cols=120)
        assert "1 files" not in frame

    def test_quit_keys_quit_even_while_scrolled(self):
        m = LiveModel(files=FILES)
        m.scroll_offset = 7
        for key in ("q", "ctrl_c", "esc"):
            assert handle_key(m, key) == "quit"
        assert m.scroll_offset == 7  # quit does not touch the viewport

    def test_wheel_and_keys_move_offset_with_floor(self):
        m = LiveModel(files=FILES)
        assert handle_key(m, "wheel_up") is None
        assert m.scroll_offset == 1
        handle_key(m, "pgup")
        assert m.scroll_offset == 11
        handle_key(m, "wheel_down")
        handle_key(m, "pgdn")
        assert m.scroll_offset == 0
        handle_key(m, "wheel_down")      # below floor clamps at 0 (follow)
        assert m.scroll_offset == 0
        handle_key(m, "end")
        assert m.scroll_offset == 0
