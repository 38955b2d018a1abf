"""Live TTY progress renderer.

Behavioural rebuild of the reference's Bubble Tea processing model
(internal/ui/model.go, views.go): per-file rows with a pass timeline,
progress bar and an eased VU meter with peak hold (model.go:87-114,
views.go:359-537), the Filter Chain + Analysis status boxes once
AdaptConfig lands — associated with THEIR file's row, not a shared slot —
per-file done boxes, and a persisted final summary.  The renderer repaints
in place with ANSI cursor movement on a ticker thread, independent of
message arrival (the reference's 60 fps meter tick).

The meter's level signal: the device passes are monolithic kernels rather
than a frame stream, so the pool feeds a level series
(PoolEvents.on_levels) and the ticker plays it back at the row's current
progress position — spring-eased level, 1 s peak hold with decay, exactly
the reference's meter dynamics.  The series starts as the Pass-1 250 ms
interval RMS (all that exists while the cleanup chain runs) and is
REPLACED by the PROCESSED signal's 100 ms momentary series + linear-mode
offset the moment the master's filtered metering lands (stage-A
completion / the chunked plan sync), so the normalising tail meters what
is actually being encoded (ref: encoder.go:235-257).

Thread-safe: pool workers post typed updates (the reference's message
types, messages.go:10-84) under a lock; only the ticker thread writes to
the terminal."""

from __future__ import annotations

import copy
import math
import sys
import threading
import time
from dataclasses import dataclass, field

import re as _re

from .console import format_elapsed, render_analysis_summary, render_done_box
from .statusbox import (
    _disp_width as _cell_width,
    render_analysis_box,
    render_filter_chain_box,
)

_ANSI_SGR_RE = _re.compile(r"\x1b\[[0-9;]*m")


def _disp_width(s: str) -> int:
    """Display columns of a possibly SGR-styled line."""
    return _cell_width(_ANSI_SGR_RE.sub("", s))
from .summary import AdaptedSummary, with_limiter

PASS_LABELS = {
    "analysis": "Pass 1 analyse",
    "processing": "Pass 2 filter",
    "normalising": "Pass 3/4 norm",
}
_SPINNER = "⠋⠙⠹⠸⠼⠴⠦⠧⠇⠏"
_BAR_WIDTH = 24
_TIMELINE_WIDTH = 8          # mini dot timeline cells (ref: views.go:229)
_METER_WIDTH = 30
# The meter silence floor, mirrored from the reference's ui.meterFloorDB
# = -70.0 (model.go:93) and its processor-side mirror meterLevelFloorDB
# (encoder.go:223-226) — the reference deliberately LOWERED this from -60
# so quiet room tone at -65 dB reads through instead of flooring
# (encoder_level_test.go:42-93); pinned by
# tests/test_ui_geometry.py::TestMeterFloorMirror.
_METER_FLOOR_DB = -70.0
_PEAK_HOLD_SECS = 1.0
_PEAK_DECAY_DB = 1.5         # per tick once the hold lapses
_EASE = 0.35                 # spring factor per tick toward the target


@dataclass
class FileRow:
    path: str
    stage: str = ""
    fraction: float = 0.0
    disp_fraction: float = 0.0   # eased toward `fraction` by the ticker
    started: float = 0.0
    done: bool = False
    error: str = ""
    done_box: str = ""
    summary: AdaptedSummary | None = None
    duration: float = 0.0        # audio seconds (drives the ⚡ speed badge)
    levels: object = None        # np.ndarray of dBFS per 250 ms interval
    level_hop: float = 0.25
    meter_db: float = _METER_FLOOR_DB
    peak_db: float = _METER_FLOOR_DB
    peak_at: float = 0.0
    box_cache: object = None     # ((summary copy, cols, color), lines) memo


@dataclass
class LiveModel:
    files: list[str]
    rows: dict = field(default_factory=dict)
    all_done: bool = False
    verb: str = "Processing"     # the -a view says "Analysing"
    glyph: str = ""              # fixed active-row glyph; "" = spinner
                                 # (the -a view's ∿ wave, analysis_model_test.go)
    scroll_offset: int = 0       # lines scrolled up from the tail (0 = follow)
    title: str = ""              # app header line ("" = none; set by LiveUI)
    color: bool = False          # SGR gradients on (TTY + !NO_COLOR)

    def __post_init__(self):
        for f in self.files:
            self.rows[f] = FileRow(path=f)


# --- colour ramps (ref: views.go:291-533; palette styles.go:20-49) ---
_METER_GREEN = (0x00, 0xAA, 0x00)      # cli.ColorGreen — safe zone
_METER_YELLOW = (0xE6, 0xE6, 0x00)     # cli.ColorYellow — mid-warm stop
_METER_ORANGE = (0xFF, 0xA5, 0x00)     # cli.ColorOrange — caution zone
_METER_RED = (0xA4, 0x00, 0x00)        # cli.ColorRed — hot zone
_ORANGE_DIM = (0xB3, 0x5F, 0x00)       # cli.ColorOrangeDim — pulse trough
_GREEN_ZONE_DB = -16.0                 # green→yellow handoff (views.go:322)
_PULSE_HZ = 1.2                        # peak-marker pulse (views.go:520)
_PROGRESS_START = (0x38, 0xBD, 0xF8)   # sky-blue fill start (styles.go:38-41)
_PROGRESS_END = (0x63, 0x66, 0xF1)     # indigo fill end
_TRACK_RGB = (0x44, 0x44, 0x44)        # empty-track dark fill
_SGR_RESET = "\x1b[0m"


def _fg(rgb: tuple[int, int, int]) -> str:
    return f"\x1b[38;2;{rgb[0]};{rgb[1]};{rgb[2]}m"


def _blend1d(n: int, *stops: tuple[int, int, int]) -> list:
    """n colours linearly interpolated across the stops (the reference's
    lipgloss.Blend1D, used by its meter/progress ramps)."""
    if n <= 0:
        return []
    if n == 1:
        return [stops[0]]
    segs = len(stops) - 1
    out = []
    for i in range(n):
        t = i / (n - 1) * segs
        k = min(int(t), segs - 1)
        f = t - k
        a, b = stops[k], stops[k + 1]
        out.append(tuple(int(round(x + (y - x) * f)) for x, y in zip(a, b)))
    return out


_METER_RAMP: list | None = None


def _meter_ramp() -> list:
    """The _METER_WIDTH-cell green→yellow→orange→red VU ramp, built once:
    real VU meters keep green dominant across the low range, so green→
    yellow fills the floor→-16 dB zone and yellow→orange→red is squeezed
    into the hot top ~16 dB (ref: meterRamp, views.go:310-334)."""
    global _METER_RAMP
    if _METER_RAMP is None:
        span = 0.0 - _METER_FLOOR_DB
        gz = int((_GREEN_ZONE_DB - _METER_FLOOR_DB) / span * _METER_WIDTH)
        gz = max(0, min(gz, _METER_WIDTH))
        _METER_RAMP = (
            _blend1d(gz, _METER_GREEN, _METER_YELLOW)
            + _blend1d(_METER_WIDTH - gz, _METER_YELLOW, _METER_ORANGE,
                       _METER_RED))
    return _METER_RAMP


def _colour_runs(chars: list, colors: list) -> str:
    """Style cells, coalescing contiguous same-colour cells into one SGR
    run (ref: renderMeterBar's run flush, views.go:425-456)."""
    parts = []
    run = [chars[0]]
    cur = colors[0]
    for ch, c in zip(chars[1:], colors[1:]):
        if c == cur:
            run.append(ch)
        else:
            parts.append(_fg(cur) + "".join(run))
            run, cur = [ch], c
    parts.append(_fg(cur) + "".join(run))
    return "".join(parts) + _SGR_RESET


_SUPERSCRIPTS = str.maketrans(dict(zip("-.0123456789",
                                       "⁻·⁰¹²³⁴⁵⁶⁷⁸⁹")))


def superscript_value(value: str) -> str:
    """A numeric value in Unicode superscript — '-'→⁻ (U+207B), '.'→·
    (U+00B7), digits→⁰¹²³⁴⁵⁶⁷⁸⁹ — so the peak label and its arrow share
    one marker row, with no dB unit (ref: superscriptValue,
    views.go:291-308)."""
    return value.translate(_SUPERSCRIPTS)


def _pulse_rgb(elapsed: float) -> tuple[int, int, int]:
    """The peak-marker pulse colour: a gentle 1.2 Hz sine between deep and
    full orange, each channel `dim + phase*(bright-dim) + 0.5` so both
    endpoints stay clearly orange (ref: peakMarkerColor,
    views.go:519-533)."""
    phase = 0.5 * (1.0 + math.sin(2.0 * math.pi * _PULSE_HZ * elapsed))
    return tuple(int(a + phase * (b - a) + 0.5)
                 for a, b in zip(_ORANGE_DIM, _METER_ORANGE))


_MIN_BAR_WIDTH = 10          # bar floor on narrow terminals (model.go:25-26)
# fixed display cells around the bar in a progress row: spinner+space,
# 32-char path field+space, 16-char stage field+space, space+5-char
# elapsed+'s' (render_frame's row f-string)
_ROW_OVERHEAD = 1 + 1 + 32 + 1 + 16 + 1 + 1 + 6


def _bar_width_for(cols: int | None) -> int:
    """Adaptive bar width: shrink with the terminal between the usability
    floor and the full width, like the reference's progress SetWidth clamp
    (ref: TestProcessingProgressWidthFitsTerminal,
    progress_bar_test.go:472-491; min/max model.go:18-47).  A row may
    still overflow a very narrow terminal once the bar hits its floor."""
    if cols is None:
        return _BAR_WIDTH
    return min(_BAR_WIDTH, max(_MIN_BAR_WIDTH, cols - _ROW_OVERHEAD))


def _bar(fraction: float, color: bool = False, width: int = _BAR_WIDTH) -> str:
    filled = int(round(width * max(0.0, min(1.0, fraction))))
    if not color:
        return "█" * filled + "░" * (width - filled)
    # sky-blue→indigo gradient stretched across the FILLED cells (the fill
    # edge always reads indigo) over a dark empty track — never the brand
    # red (ref: TestProgressFillIsGradient, progress_bar_test.go:67-113)
    parts = []
    if filled:
        parts.append(_colour_runs(
            ["█"] * filled, _blend1d(filled, _PROGRESS_START, _PROGRESS_END)))
    if filled < width:
        parts.append(_fg(_TRACK_RGB) + "░" * (width - filled)
                     + _SGR_RESET)
    return "".join(parts)


# the shared duration formatter lives in console.py (one clock for the
# live Time block and the done box); imported above for callers/tests


def render_timeline(row: FileRow, elapsed: float) -> str:
    """The Time block: elapsed clock, mini dot timeline filled to the pass
    progress, projected total-pass clock, and a realtime-speed badge
    (ref: renderTimeline, views.go:231-271).

    The badge is (progress × duration) / elapsed with the reference's
    start-up guards (duration known, progress > 0.02, elapsed > 0.3 s).
    The reference additionally un-scales Pass 1's bar progress by
    BandPhaseProgressStart (0.95) because its band phase reserves bar
    headroom after the decode loop (views.go:273-287); here the bands run
    inside the same fused device program and every pass reports a true
    fraction, so the fraction passes through unscaled."""
    progress = max(0.0, min(1.0, row.fraction))
    right = "--:--"
    if progress > 0:
        right = format_elapsed(elapsed / progress)
    filled = max(0, min(_TIMELINE_WIDTH, int(progress * _TIMELINE_WIDTH + 0.5)))
    timeline = "▰" * filled + "▱" * (_TIMELINE_WIDTH - filled)
    badge = "⚡ —×"
    if row.duration > 0 and progress > 0.02 and elapsed > 0.3:
        badge = f"⚡ {progress * row.duration / elapsed:.1f}×"
    return f"{format_elapsed(elapsed)} {timeline} {right}  ·  {badge}"


def _meter_cell(db: float) -> int:
    """dB → 0-based bar cell, clamped to the bar (views.go:373-384)."""
    span = -_METER_FLOOR_DB
    return int(round((max(_METER_FLOOR_DB, min(0.0, db)) - _METER_FLOOR_DB)
                     / span * (_METER_WIDTH - 1)))


def render_meter(level_db: float, peak_db: float, elapsed: float = 0.0,
                 color: bool = False) -> str:
    """The eased VU block: one bar row (gradient-coloured fill + empty
    track, inline level value — the value shows the LEVEL only) and, once
    a peak exists, exactly one peak-marker line beneath it.  The peak is
    never drawn inside the bar: its value is tethered to its column by a
    pulsing up-tip arrow (ref: renderAudioLevelMeter, views.go:359-400;
    marker grammar renderPeakMarker :459-500).  `elapsed` drives the
    marker pulse; `color` gates every SGR sequence so the plain form
    stays string-testable and non-TTY safe."""
    lv = _meter_cell(level_db)
    audible = level_db > _METER_FLOOR_DB + 0.5
    chars = ["█" if (i <= lv and audible) else "░"
             for i in range(_METER_WIDTH)]
    # the ramp colours the bar along its WHOLE length — filled and empty
    # cells alike (ref: renderMeterBar, views.go:411-456)
    bar = _colour_runs(chars, _meter_ramp()) if color else "".join(chars)
    # both branches render exactly 9 display cells so the row never
    # changes width as the level crosses the floor (pinned by
    # tests/test_ui_geometry.py::TestMeterGeometry)
    txt = f"{level_db:6.1f} dB" if audible else "     —   "
    row = "▐" + bar + "▌" + txt
    marker = _render_peak_marker(peak_db, elapsed, color)
    return row + "\n" + marker if marker else row


def _render_peak_marker(peak_db: float, elapsed: float, color: bool) -> str:
    """The single peak-marker line: `⬑ value` with the arrow at the peak
    column, flipping to `value ⬏` when the label would overflow the bar,
    the value in superscript with no unit.  "" while the peak still sits
    at the silence floor so no stray marker renders at column 0
    (ref: renderPeakMarker, views.go:459-500).  The one-space prefix sits
    under the ▐ cap so the arrow lands exactly under its bar cell."""
    if peak_db <= _METER_FLOOR_DB:
        return ""
    pos = _meter_cell(peak_db)
    sup = superscript_value(f"{peak_db:.1f}")
    if color:
        arrow_sgr = _fg(_pulse_rgb(elapsed))
        left = arrow_sgr + "⬑" + _SGR_RESET
        right = arrow_sgr + "⬏" + _SGR_RESET
        value = _fg(_METER_ORANGE) + sup + _SGR_RESET
    else:
        left, right, value = "⬑", "⬏", sup
    # every superscript rune is display width 1, so len(sup) measures
    # display columns (ref: the lipgloss.Width alignment note)
    if pos + len(sup) + 2 <= _METER_WIDTH:
        return " " + " " * pos + left + " " + value
    lead = max(pos - (len(sup) + 1), 0)
    return " " + " " * lead + value + " " + right


def _advance_meter(row: FileRow, now: float) -> None:
    """One ticker step of the meter physics (spring ease + peak hold)."""
    row.disp_fraction += (row.fraction - row.disp_fraction) * _EASE
    target = _METER_FLOOR_DB
    if row.levels is not None and row.stage in ("processing", "normalising"):
        n = len(row.levels)
        if n:
            idx = min(n - 1, int(row.disp_fraction * (n - 1)))
            target = float(max(_METER_FLOOR_DB, min(0.0, row.levels[idx])))
    row.meter_db += (target - row.meter_db) * _EASE
    if row.meter_db >= row.peak_db:
        row.peak_db = row.meter_db
        row.peak_at = now
    elif now - row.peak_at > _PEAK_HOLD_SECS:
        row.peak_db = max(row.meter_db, row.peak_db - _PEAK_DECAY_DB)


def _boxes_for(summary: AdaptedSummary, cols: int | None = None,
               color: bool = False) -> list[str]:
    """The Filter Chain + Analysis boxes joined side-by-side, equalised to
    one height.  On a terminal too narrow for the pair (the side-by-side
    join would wrap and shred the repaint) the boxes degrade to a vertical
    stack instead of overflowing (ref: TestJoinStatusBoxesNarrowDegrades,
    statusboxes_test.go:294 — the reference drops its side boxes; this
    layout's boxes ARE the content, so it stacks them)."""
    chain = render_filter_chain_box(summary, color=color).splitlines()
    analysis = render_analysis_box(summary, color=color).splitlines()
    joined_w = _disp_width(chain[0]) + 2 + _disp_width(analysis[0])
    if cols is not None and joined_w + 2 > cols:  # +2: the row indent
        return chain + analysis
    height = max(len(chain), len(analysis))
    chain += [" " * _disp_width(chain[0])] * (height - len(chain))
    analysis += [" " * _disp_width(analysis[0])] * (height - len(analysis))
    return [a + "  " + b for a, b in zip(chain, analysis)]


def _boxes_for_row(row: FileRow, cols: int | None = None,
                   color: bool = False) -> list[str]:
    """Memoised `_boxes_for`: the boxes re-render only when the summary
    content, terminal width, or colour mode changes — at 15 fps the
    repaint otherwise re-renders two unchanged boxes every tick (ref:
    FileProgress.statusBoxCache, statusboxes.go; contracts pinned by the
    TestStatusBoxCacheByteIdentical family, statusboxes_test.go:492-596).
    The key stores a COPY of the summary because `with_limiter` mutates
    the live object in place — identity alone would serve a stale panel
    after the Pass-4 limiter lights."""
    key = (copy.copy(row.summary), cols, color)
    cache = row.box_cache
    if cache is not None and cache[0] == key:
        return cache[1]
    lines = _boxes_for(row.summary, cols, color)
    row.box_cache = (key, lines)
    return lines


def render_overall_progress(model: LiveModel) -> str:
    """Totals footer: 'Processing N files, M complete, K failed' — counts
    only, never a 'file N of M' cursor (files run concurrently, a cursor
    would lie; ref: renderOverallProgress, views.go:631-641 +
    TestRenderOverallProgressFooter)."""
    rows = model.rows.values()
    complete = sum(1 for r in rows if r.done and not r.error)
    failed = sum(1 for r in rows if r.done and r.error)
    return (f"{model.verb} {len(model.files)} files, "
            f"{complete} complete, {failed} failed")


def render_frame(model: LiveModel, tick: int, cols: int | None = None) -> str:
    """One full repaint of the live view (pure; string-testable).  Each
    in-flight file renders its own row + ITS status boxes + ITS meter
    (ref: per-file association, statusboxes.go:269-396); the overall
    totals footer closes the frame when more than one file runs."""
    lines: list[str] = []
    if model.title:
        # the app header (ref: the gradient wordmark atop the Bubble Tea
        # view, TestHeaderIsGradient / TestHeaderHasNoSubtitle)
        lines.append(model.title)
        lines.append("")
    spin = model.glyph or _SPINNER[tick % len(_SPINNER)]
    bw = _bar_width_for(cols)

    for f in model.files:
        row = model.rows[f]
        if row.done:
            lines.extend(row.done_box.splitlines())
            continue
        stage = PASS_LABELS.get(row.stage, row.stage or "queued")
        elapsed = time.perf_counter() - row.started if row.started else 0.0
        lines.append(
            f"{spin} {row.path:<32} {stage:<16} {_bar(row.disp_fraction if row.stage else 0.0, model.color, bw)} {elapsed:5.0f}s"
        )
        if row.started and row.stage:
            lines.append("  " + render_timeline(row, elapsed))
        if row.levels is not None and row.stage in ("processing", "normalising"):
            lines.extend("  " + l for l in render_meter(
                row.meter_db, row.peak_db, elapsed, model.color).splitlines())
        if row.summary is not None:
            lines.extend("  " + b for b in _boxes_for_row(row, cols,
                                                          model.color))
    if len(model.files) > 1:
        lines.append(render_overall_progress(model))
    return "\n".join(lines)


def clip_to_viewport(frame: str, height: int | None = None,
                     offset: int = 0) -> str:
    """Keep the repaint inside the terminal: when the frame outgrows the
    viewport, show a window `offset` lines above the TAIL (0 = follow the
    active rows, which accumulate below completed boxes) with scroll
    indicators on the hidden side(s) (ref: the Bubble Tea model's
    viewport scrolling, internal/ui/model.go)."""
    import shutil

    rows = height or (shutil.get_terminal_size(fallback=(80, 24)).lines - 1)
    rows = max(3, rows)
    lines = frame.splitlines()
    if len(lines) <= rows:
        return frame
    visible = rows - 1
    offset = max(0, min(int(offset), len(lines) - visible))
    if offset == 0:
        hidden = len(lines) - visible
        return "\n".join([f"… {hidden} earlier line(s) …"] + lines[hidden:])
    end = len(lines) - offset
    if end <= visible:
        # scrolled to the very top: no earlier indicator
        parts = list(lines[:end])
    else:
        start = end - (rows - 2)
        parts = [f"… {start} earlier line(s) …"] + lines[start:end]
    parts.append(f"… {offset} later line(s) … (↓/End follows)")
    return "\n".join(parts)


def handle_key(model: LiveModel, key: str, page: int = 10) -> str | None:
    """Scroll/quit key semantics on the model (ref: the viewport keymap,
    TestScrollKeysForwardedToViewport + TestMouseWheelMovesOffset +
    TestQuitKeysStillQuitWithViewport, model_routing_test.go).  Returns
    "quit" for the quit keys, else None."""
    if key in ("q", "ctrl_c", "esc"):
        return "quit"
    if key in ("up", "k", "wheel_up"):
        model.scroll_offset += 1
    elif key in ("down", "j", "wheel_down"):
        model.scroll_offset -= 1
    elif key == "pgup":
        model.scroll_offset += page
    elif key == "pgdn":
        model.scroll_offset -= page
    elif key in ("home", "g"):
        model.scroll_offset = 1 << 30   # clip_to_viewport clamps to content
    elif key in ("end", "G"):
        model.scroll_offset = 0
    model.scroll_offset = max(0, model.scroll_offset)
    return None


def _decode_keys(buf: bytes) -> tuple[list[str], bytes]:
    """Terminal byte stream -> key names; returns (keys, undecoded rest).
    Understands plain chars, CSI arrows/page keys, and SGR mouse wheel
    (buttons 64/65)."""
    keys: list[str] = []
    i = 0
    while i < len(buf):
        b = buf[i]
        if b != 0x1B:
            ch = chr(b)
            if ch == "\x03":
                keys.append("ctrl_c")
            elif ch in ("q", "k", "j", "g", "G"):
                keys.append(ch)
            i += 1
            continue
        # ESC sequence
        seq = buf[i:]
        if len(seq) == 1:
            break            # partial: wait for more bytes
        if seq[1:2] != b"[":
            keys.append("esc")
            i += 1
            continue
        if seq[2:3] == b"<":  # SGR mouse: ESC [ < b ; x ; y (M|m)
            j = 3
            while j < len(seq) and seq[j:j + 1] not in (b"M", b"m"):
                j += 1
            if j >= len(seq):
                break        # partial
            fields = seq[3:j].split(b";")
            if seq[j:j + 1] == b"M" and fields and fields[0].isdigit():
                btn = int(fields[0])
                if btn == 64:
                    keys.append("wheel_up")
                elif btn == 65:
                    keys.append("wheel_down")
            i += j + 1
            continue
        m = {b"A": "up", b"B": "down", b"H": "home", b"F": "end"}
        if seq[2:3] in m:
            keys.append(m[seq[2:3]])
            i += 3
            continue
        if seq[2:3] in (b"5", b"6"):
            if len(seq) < 4:
                break        # partial
            if seq[3:4] == b"~":
                keys.append("pgup" if seq[2:3] == b"5" else "pgdn")
                i += 4
                continue
            i += 4
            continue
        i += 3 if len(seq) >= 3 else len(seq)
    return keys, buf[i:]


class LiveUI:
    """Ticker-driven ANSI repaint loop; the PoolEvents adapter."""

    def __init__(self, files: list[str], out=None, fps: float = 15.0,
                 on_quit=None):
        self.model = LiveModel(files=files)
        self._out = out or sys.stdout
        self._period = 1.0 / fps
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._last_height = 0
        self._tick = 0
        self._thread: threading.Thread | None = None
        self._key_thread: threading.Thread | None = None
        self._on_quit = on_quit
        from ..cli.styles import color_profile, render_title

        # the renderers always emit truecolor; _paint rewrites the frame
        # per this profile on the way out (the reference's
        # colorprofile.Writer shape, styles_test.go:26-52)
        self._profile = color_profile(self._out)
        self.model.color = self._profile != "none"
        self.model.title = render_title(self.model.color) + " 🕺"

    # --- pool event handlers (the message types) ---
    # Every handler routes by path and tolerates an unknown one: a message
    # for a file this UI doesn't know must never crash the repaint loop
    # (ref: TestUpdateOutOfRangeSafety, model_routing_test.go:65-91).

    def on_file_start(self, path: str) -> None:
        with self._lock:
            row = self.model.rows.get(path)
            if row is not None:
                row.started = time.perf_counter()

    def on_progress(self, path: str, stage: str, fraction: float) -> None:
        with self._lock:
            row = self.model.rows.get(path)
            if row is None:
                return
            if stage != row.stage:
                # new pass: restart the eased bar from the new target's left
                row.disp_fraction = 0.0
            row.stage = stage
            row.fraction = fraction

    def on_adapted_summary(self, path: str, summary: AdaptedSummary) -> None:
        with self._lock:
            row = self.model.rows.get(path)
            if row is not None:
                row.summary = summary
                # message-path invalidation, independent of the key
                # mismatch (ref: TestModelInvalidatesCacheOnAdaptedSummaryMsg)
                row.box_cache = None

    def on_duration(self, path: str, secs: float) -> None:
        with self._lock:
            row = self.model.rows.get(path)
            if row is not None:
                row.duration = float(secs)

    def on_limiter(self, path: str, enabled: bool,
                   ceiling_dbtp: float) -> None:
        """The Pass-4 limiter snapshot resolves the chain box's Limiter
        row (ceiling or OFF) while the file is still processing,
        preserving every other chain/analysis row (ref:
        WithLimiterProgress, summary_test.go:385-407)."""
        with self._lock:
            row = self.model.rows.get(path)
            if row is not None and row.summary is not None:
                row.summary = with_limiter(row.summary, enabled,
                                           ceiling_dbtp)
                row.box_cache = None

    def on_levels(self, path: str, levels_db, hop_secs: float) -> None:
        with self._lock:
            row = self.model.rows.get(path)
            if row is None:
                return
            row.levels = levels_db
            row.level_hop = hop_secs

    def on_file_complete(self, outcome) -> None:
        with self._lock:
            row = self.model.rows.get(outcome.path)
            if row is None:
                return
            row.done = True
            row.error = outcome.error
            row.done_box = render_done_box(outcome)
            if all(r.done for r in self.model.rows.values()):
                self.model.all_done = True

    # --- ticker ---

    def _paint(self) -> None:
        import shutil

        now = time.perf_counter()
        cols = shutil.get_terminal_size(fallback=(120, 24)).columns
        with self._lock:
            for row in self.model.rows.values():
                if not row.done:
                    _advance_meter(row, now)
            frame = render_frame(self.model, self._tick, cols=cols)
            offset = self.model.scroll_offset
        frame = clip_to_viewport(frame, offset=offset)
        if self._profile not in ("truecolor", "none"):
            from ..cli.styles import downsample_sgr

            frame = downsample_sgr(frame, self._profile)
        lines = frame.count("\n") + 1
        if self._last_height:
            self._out.write(f"\x1b[{self._last_height}A\x1b[J")
        self._out.write(frame + "\n")
        self._out.flush()
        self._last_height = lines

    def _loop(self) -> None:
        while not self._stop.is_set():
            self._tick += 1
            self._paint()
            if self.model.all_done:
                break
            time.sleep(self._period)
        self._paint()

    # --- keyboard/mouse input (viewport scrolling + quit keys) ---

    def _handle_key(self, key: str) -> None:
        with self._lock:
            action = handle_key(self.model, key)
        if action == "quit" and self._on_quit is not None:
            self._on_quit()

    def _key_loop(self) -> None:
        """cbreak stdin reader: arrows/PgUp/PgDn/Home/End/vi keys scroll
        the viewport, SGR mouse wheel scrolls, q quits (-> the pool's
        cancel event; ref: the Bubble Tea keymap + mouse support)."""
        import os
        import select
        import termios
        import tty

        fd = sys.stdin.fileno()
        old = termios.tcgetattr(fd)
        tty.setcbreak(fd)
        self._out.write("\x1b[?1000h\x1b[?1006h")  # SGR mouse reporting
        self._out.flush()
        buf = b""
        try:
            while not self._stop.is_set():
                r, _, _ = select.select([fd], [], [], 0.1)
                if not r:
                    continue
                chunk = os.read(fd, 64)
                if not chunk:
                    return
                buf += chunk
                keys, buf = _decode_keys(buf)
                for k in keys:
                    self._handle_key(k)
        finally:
            self._out.write("\x1b[?1006l\x1b[?1000l")
            self._out.flush()
            termios.tcsetattr(fd, termios.TCSADRAIN, old)

    def __enter__(self):
        self._out.write("\x1b[?25l")  # hide cursor
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        try:
            if sys.stdin.isatty():
                self._key_thread = threading.Thread(
                    target=self._key_loop, daemon=True)
                self._key_thread.start()
        except Exception:
            self._key_thread = None
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        if self._key_thread is not None:
            self._key_thread.join(timeout=1.0)
        self._out.write("\x1b[?25h")  # show cursor
        self._out.flush()
        return False


class AnalysisLiveUI(LiveUI):
    """The -a live view: per-file rows while analysing, each completing
    into the stars + gain-thermometer summary block (ref: AnalysisModel,
    internal/ui/analysis_model.go:28-96, views.go:538-614).  Active rows
    carry the ∿ wave glyph and the footer says 'Analysing'
    (analysis_model_test.go:265-345)."""

    def __init__(self, files, out=None, fps: float = 15.0, on_quit=None):
        super().__init__(files, out=out, fps=fps, on_quit=on_quit)
        self.model.verb = "Analysing"
        self.model.glyph = "∿"

    def on_file_complete(self, outcome) -> None:
        with self._lock:
            row = self.model.rows.get(outcome.path)
            if row is None:
                return
            row.done = True
            row.error = outcome.error
            row.done_box = render_analysis_summary(outcome)
            if all(r.done for r in self.model.rows.values()):
                self.model.all_done = True
