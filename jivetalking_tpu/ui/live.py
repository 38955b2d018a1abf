"""Live TTY progress renderer.

Behavioural rebuild of the reference's Bubble Tea processing model
(internal/ui/model.go, views.go): per-file rows with a pass timeline and
progress bar, the Filter Chain + Analysis status boxes once AdaptConfig
lands, per-file done boxes, and a persisted final summary.  The renderer
repaints in place with ANSI cursor movement on a ticker thread,
independent of message arrival (the reference's 60 fps meter tick,
model.go:88-114 — here a 10 Hz repaint; the device passes are monolithic
kernels rather than a frame stream, so there is no per-frame VU signal to
animate).

Thread-safe: pool workers post typed updates (the reference's message
types, messages.go:10-84) under a lock; only the ticker thread writes to
the terminal."""

from __future__ import annotations

import sys
import threading
import time
from dataclasses import dataclass, field

from .console import render_done_box
from .statusbox import render_analysis_box, render_filter_chain_box
from .summary import AdaptedSummary

PASS_LABELS = {
    "analysis": "Pass 1 analyse",
    "processing": "Pass 2 filter",
    "normalising": "Pass 3/4 norm",
}
_SPINNER = "⠋⠙⠹⠸⠼⠴⠦⠧⠇⠏"
_BAR_WIDTH = 24


@dataclass
class FileRow:
    path: str
    stage: str = ""
    fraction: float = 0.0
    started: float = 0.0
    done: bool = False
    error: str = ""
    done_box: str = ""
    summary: AdaptedSummary | None = None


@dataclass
class LiveModel:
    files: list[str]
    rows: dict = field(default_factory=dict)
    all_done: bool = False

    def __post_init__(self):
        for f in self.files:
            self.rows[f] = FileRow(path=f)


def _bar(fraction: float) -> str:
    filled = int(round(_BAR_WIDTH * max(0.0, min(1.0, fraction))))
    return "█" * filled + "░" * (_BAR_WIDTH - filled)


def render_frame(model: LiveModel, tick: int) -> str:
    """One full repaint of the live view (pure; string-testable)."""
    lines: list[str] = []
    spin = _SPINNER[tick % len(_SPINNER)]

    # status boxes from the most recent file with a summary
    summary = None
    for row in model.rows.values():
        if row.summary is not None:
            summary = row.summary
    if summary is not None:
        chain = render_filter_chain_box(summary).splitlines()
        analysis = render_analysis_box(summary).splitlines()
        height = max(len(chain), len(analysis))
        chain += [" " * len(chain[0])] * (height - len(chain))
        analysis += [" " * len(analysis[0])] * (height - len(analysis))
        lines.extend(a + "  " + b for a, b in zip(chain, analysis))
        lines.append("")

    for f in model.files:
        row = model.rows[f]
        if row.done:
            lines.extend(row.done_box.splitlines())
            continue
        stage = PASS_LABELS.get(row.stage, row.stage or "queued")
        elapsed = time.perf_counter() - row.started if row.started else 0.0
        lines.append(
            f"{spin} {row.path:<32} {stage:<16} {_bar(row.fraction)} {elapsed:5.0f}s"
        )
    return "\n".join(lines)


class LiveUI:
    """Ticker-driven ANSI repaint loop; the PoolEvents adapter."""

    def __init__(self, files: list[str], out=None, fps: float = 10.0):
        self.model = LiveModel(files=files)
        self._out = out or sys.stdout
        self._period = 1.0 / fps
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._last_height = 0
        self._tick = 0
        self._thread: threading.Thread | None = None

    # --- pool event handlers (the message types) ---

    def on_file_start(self, path: str) -> None:
        with self._lock:
            self.model.rows[path].started = time.perf_counter()

    def on_progress(self, path: str, stage: str, fraction: float) -> None:
        with self._lock:
            row = self.model.rows[path]
            row.stage = stage
            row.fraction = fraction

    def on_adapted_summary(self, path: str, summary: AdaptedSummary) -> None:
        with self._lock:
            self.model.rows[path].summary = summary

    def on_file_complete(self, outcome) -> None:
        with self._lock:
            row = self.model.rows[outcome.path]
            row.done = True
            row.error = outcome.error
            row.done_box = render_done_box(outcome)
            if all(r.done for r in self.model.rows.values()):
                self.model.all_done = True

    # --- ticker ---

    def _paint(self) -> None:
        with self._lock:
            frame = render_frame(self.model, self._tick)
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

    def __enter__(self):
        self._out.write("\x1b[?25l")  # hide cursor
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=2.0)
        self._out.write("\x1b[?25h")  # show cursor
        self._out.flush()
        return False
