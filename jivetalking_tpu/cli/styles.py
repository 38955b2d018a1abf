"""Styled console printers (ref: internal/cli/help.go, styles.go — the
lipgloss-styled version/error/warning printers).  ANSI SGR only, degrading
to plain text when stdout is not a TTY or NO_COLOR is set."""

from __future__ import annotations

import os
import sys

_RESET = "\x1b[0m"
_BOLD = "\x1b[1m"
_RED = "\x1b[31m"
_YELLOW = "\x1b[33m"
_CYAN = "\x1b[36m"
_DIM = "\x1b[2m"


def _want_color(stream) -> bool:
    if os.environ.get("NO_COLOR"):
        return False
    return hasattr(stream, "isatty") and stream.isatty()


def _style(text: str, *codes: str, stream) -> str:
    if not _want_color(stream):
        return text
    return "".join(codes) + text + _RESET


def print_version(version: str) -> None:
    """(ref: cli.PrintVersion)."""
    print(_style("jivetalking-tpu", _BOLD, _CYAN, stream=sys.stdout)
          + " " + _style(version, _DIM, stream=sys.stdout))


def print_error(msg: str) -> None:
    """(ref: cli.PrintError)."""
    print(_style("error:", _BOLD, _RED, stream=sys.stderr) + f" {msg}",
          file=sys.stderr)


def print_warning(msg: str) -> None:
    """(ref: cli.PrintWarning)."""
    print(_style("warning:", _BOLD, _YELLOW, stream=sys.stderr) + f" {msg}",
          file=sys.stderr)
