"""Console rendering: progress lines, per-file done boxes, final summary.

Behavioural rebuild of the reference's console surfaces (internal/ui):
the no-TTY plain path (ref: cmd/jivetalking/main.go:377-412), the done box
with before->after rows + star scores (ref: internal/ui/views.go:646-860),
and the analysis-mode stars + gain advice (ref: main.go:530-546).  Pure
string rendering, asserted as strings in tests (the reference's TUI-test
pattern, ui/view_layout_test.go)."""

from __future__ import annotations

import math
import os

from ..cli.pool import FileOutcome
from ..quality import gain_advice

STAR_FILLED = "★"
STAR_EMPTY = "☆"


def stars_row(stars: int, label: str) -> str:
    return STAR_FILLED * stars + STAR_EMPTY * (5 - stars) + f"  {label}"


def _fmt_db(v: float | None, unit: str = "") -> str:
    if v is None or not math.isfinite(v):
        return "-"
    return f"{v:.1f}{unit}"


def format_elapsed(secs: float) -> str:
    """MM:SS clock, growing to HH:MM:SS past an hour, rounded to the
    second (ref: formatElapsed, analysis_model.go:223-235).  The one
    duration formatter for both the live Time block and the done box —
    hour-scale walls must read the same in both."""
    total = int(round(max(0.0, secs)))
    h, rem = divmod(total, 3600)
    m, s = divmod(rem, 60)
    if h > 0:
        return f"{h:02d}:{m:02d}:{s:02d}"
    return f"{m:02d}:{s:02d}"


_fmt_wall = format_elapsed


# Column widths for the before→after rows so the →, unit, and Δ line up
# into a mini-table (ref: doneBoxValueWidth/UnitWidth/DeltaWidth,
# views.go:694-699)
_VALUE_W = 5
_UNIT_W = 4
_DELTA_W = 5

UNIT_DB = "㏈"       # the reference's square unit glyphs (statusboxes.go:58-63)
UNIT_DBTP = "㏈TP"


def _unit_col(unit: str) -> str:
    """Pad a unit to _UNIT_W DISPLAY columns (㏈ counts 2 cells)."""
    from .statusbox import _disp_width

    return unit + " " * max(0, _UNIT_W - _disp_width(unit))


def _before_after(before: float, after: float, unit: str) -> str:
    """`%5.1f → %5.1f unit  Δ %+5.1f` (ref: doneBoxBeforeAfterRow,
    views.go:707-713)."""
    return (f"{before:{_VALUE_W}.1f} → {after:{_VALUE_W}.1f} "
            f"{_unit_col(unit)}  Δ {after - before:+{_DELTA_W}.1f}")


def _optional_before_after(unit: str, before, after) -> str:
    """before→after only when a before figure exists; otherwise the output
    figure alone, never a misleading '0.0 →' (ref:
    doneBoxOptionalBeforeAfter, views.go:721-727)."""
    if after is None or not math.isfinite(float(after)):
        return "-"
    if before is not None and math.isfinite(float(before)):
        return _before_after(float(before), float(after), unit)
    return f"{float(after):.1f} {unit}"


# display clamp for the noise-floor rows: anything at/below the 16-bit
# quantisation floor renders "< -96" (ref: noise-floor clamp,
# view_layout_test.go:326-357 — "-inf" and "-120" both display "< -96")
NOISE_FLOOR_DISPLAY_MIN_DB = -96.0


def _noise_floor_cell(floor: float) -> str:
    """Fixed-width floor cell with the '< -96' clamp (ref:
    formatNoiseFloorCell, views.go:735-744)."""
    if floor == -math.inf or floor <= NOISE_FLOOR_DISPLAY_MIN_DB:
        return f"{'< -96':>{_VALUE_W}}"
    return f"{floor:{_VALUE_W}.0f}"


def _noise_floor_row(inp, out) -> str:
    """input→output room-tone floor; NO Δ (the floors are already a
    before/after story and a delta over the '< -96' sentinel would
    mislead); a single available end shows that value alone (ref:
    doneBoxNoiseFloorRow, views.go:746-765)."""
    have_in = inp is not None and not math.isnan(float(inp))
    have_out = out is not None and not math.isnan(float(out))
    if have_in and have_out:
        return (f"{_noise_floor_cell(float(inp))} → "
                f"{_noise_floor_cell(float(out))} {_unit_col(UNIT_DB)}")
    if have_out:
        return f"{_noise_floor_cell(float(out)).strip()} {UNIT_DB}"
    if have_in:
        return f"{_noise_floor_cell(float(inp)).strip()} {UNIT_DB}"
    return "n/a"


def render_done_box(o: FileOutcome) -> str:
    """Per-file completion box (ref: renderDoneBox, views.go:646-860; row
    order Time, Loudness, True peak, Dynamics, Noise floor, Recording,
    Processed per TestDoneBoxRowOrder, view_layout_test.go:414-445)."""
    if o.error:
        return f"✗ {o.path}: {o.error}"
    lines = [f"✓ {o.path} -> {o.output_path}"]
    # Time row: whole-file elapsed clock · ⚡ badge; the placeholder when
    # no timing is available (ref: TestDoneBoxTimeRow)
    badge = "⚡ —×"
    if o.wall_secs > 0 and o.realtime_factor > 0:
        badge = f"⚡ {o.realtime_factor:.1f}×"
    lines.append(f"  {'Time':<14} {_fmt_wall(o.wall_secs)}  ·  {badge}")
    lines.append(f"  {'Loudness':<14} "
                 + _optional_before_after("LUFS", o.input_lufs, o.output_lufs))
    lines.append(f"  {'True peak':<14} "
                 + _optional_before_after(UNIT_DBTP, o.input_tp, o.output_tp))
    lines.append(f"  {'Dynamics':<14} "
                 + _optional_before_after("LU", o.input_lra, o.output_lra))
    lines.append(f"  {'Noise floor':<14} "
                 + _noise_floor_row(o.input_noise_floor, o.output_noise_floor))
    lines.append(f"  {'Recording':<14} {stars_row(o.recording_stars, o.recording_label)}")
    lines.append(f"  {'Processed':<14} {stars_row(o.quality_stars, o.quality_label)}")
    return "\n".join(lines)


def _lerp_clamp(v: float, in_lo: float, in_hi: float, out_lo: float, out_hi: float) -> float:
    t = (v - in_lo) / (in_hi - in_lo)
    return out_lo + max(0.0, min(1.0, t)) * (out_hi - out_lo)


def _gain_glyph_position(input_tp: float) -> float:
    """Input true peak -> [0,1] aligned to the advice zones
    (ref: gainGlyphPosition, ui/views.go:594-611)."""
    if input_tp < -12.0:
        return _lerp_clamp(input_tp, -24.0, -12.0, 0.0, 0.33)
    if input_tp <= -1.0:
        return _lerp_clamp(input_tp, -12.0, -1.0, 0.33, 0.67)
    return _lerp_clamp(input_tp, -1.0, 1.0, 0.67, 1.0)


_GAIN_BAR_WIDTH = 5
# one ANSI colour stop per cell: bright-cyan, blue, green, orange/yellow, red
_GAIN_RAMP = ("\033[96m", "\033[94m", "\033[92m", "\033[93m", "\033[91m")


def gain_bar(input_tp: float, color: bool = False) -> str:
    """Five-cell gain thermometer filled from the input true peak
    (ref: GainBar, ui/views.go:540-572): quiet ~1 cell, well-set ~3,
    clipping pins all 5; floor at one pip so under-recorded still shows."""
    filled = round(_gain_glyph_position(input_tp) * _GAIN_BAR_WIDTH)
    filled = max(1, min(filled, _GAIN_BAR_WIDTH))
    if input_tp >= 0:
        filled = _GAIN_BAR_WIDTH
    cells = []
    for i in range(_GAIN_BAR_WIDTH):
        if i < filled:
            cells.append(f"{_GAIN_RAMP[i]}▰\033[0m" if color else "▰")
        else:
            cells.append("▱")
    return "".join(cells)


def render_analysis_summary(o: FileOutcome) -> str:
    """Analysis-only per-file summary: stars + gain advice
    (ref: main.go:530-546 console stars + gain thermometer)."""
    if o.error:
        return f"✗ {o.path}: {o.error}"
    m = o.measurements
    from ..report.paths import analysis_report_path

    report_name = os.path.basename(analysis_report_path(o.path))
    lines = [f"✓ {os.path.basename(o.path)} → {report_name}"]
    lines.append(f"  {'Loudness':<14} {_fmt_db(o.input_lufs)} LUFS   "
                 f"{'True peak':<10} {_fmt_db(o.input_tp)} dBTP   "
                 f"{'LRA':<4} {_fmt_db(o.input_lra)} LU")
    if m is not None:
        lines.append(f"  {'Noise floor':<14} {_fmt_db(m.noise.floor)} dBFS "
                     f"({m.noise.floor_source})")
        if m.vad.speech_profile is not None:
            r = m.vad.speech_profile.region
            lines.append(f"  {'Speech region':<14} {r.start:.1f}s - {r.end:.1f}s")
    lines.append(f"  {'Recording':<14} {stars_row(o.recording_stars, o.recording_label)}")
    adv = gain_advice(o.input_tp)
    lines.append(f"  {'Gain':<14} {gain_bar(o.input_tp)}  {adv.message()}")
    return "\n".join(lines)


def render_final_summary(outcomes: list[FileOutcome]) -> str:
    """Run-level summary persisted after all files complete
    (ref: FinalSummary, persisted post-alt-screen, main.go:163-167)."""
    done = [o for o in outcomes if not o.error]
    failed = [o for o in outcomes if o.error]
    lines = []
    lines.append(f"Processed {len(done)}/{len(outcomes)} file(s)")
    for o in done:
        lines.append(
            f"  {o.path}: {_fmt_db(o.output_lufs)} LUFS / {_fmt_db(o.output_tp)} dBTP "
            f"{stars_row(o.quality_stars, o.quality_label)}  ({_fmt_wall(o.wall_secs)})"
        )
    for o in failed:
        lines.append(f"  {o.path}: FAILED - {o.error}")
    return "\n".join(lines)


def render_progress_line(path: str, stage: str, fraction: float) -> str:
    """Plain per-stage progress line for the no-TTY path."""
    pct = int(round(100 * max(0.0, min(1.0, fraction))))
    return f"  {path}: {stage} {pct}%"
