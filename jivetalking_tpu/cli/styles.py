"""Styled console printers + help renderer (ref: internal/cli/help.go,
styles.go — the lipgloss-styled version/error/warning printers and the
StyledHelpPrinter over kong).  ANSI SGR only, degrading to plain text when
the stream is not a TTY or NO_COLOR is set."""

from __future__ import annotations

import os
import sys

_RESET = "\x1b[0m"
_BOLD = "\x1b[1m"
_RED = "\x1b[31m"
_YELLOW = "\x1b[33m"
_CYAN = "\x1b[36m"
_DIM = "\x1b[2m"
_ITALIC = "\x1b[3m"

# the reference's brand palette (internal/cli/styles.go:20-49), 24-bit
_ORANGE_RGB = (0xFF, 0xA5, 0x00)     # ColorOrange: sections, warnings
_GREEN_RGB = (0x00, 0xAA, 0x00)      # ColorGreen: flag names
_CYAN_RGB = (0x00, 0xAA, 0xAA)       # ColorCyan: argument names
_CYAN_BRIGHT_RGB = (0x00, 0xD4, 0xFF)  # title gradient start
_SKY_BLUE_RGB = (0x38, 0xBD, 0xF8)     # title gradient end (dark variant)


def _fg(rgb: tuple[int, int, int]) -> str:
    return f"\x1b[38;2;{rgb[0]};{rgb[1]};{rgb[2]}m"


def _want_color(stream) -> bool:
    if os.environ.get("NO_COLOR"):
        return False
    return hasattr(stream, "isatty") and stream.isatty()


def _style(text: str, *codes: str, stream) -> str:
    if not _want_color(stream):
        return text
    return "".join(codes) + text + _RESET


def render_title(color: bool) -> str:
    """The wordmark drawn as a per-letter bright-cyan -> sky-blue gradient
    (ref: cli.RenderTitle, styles.go:74-95)."""
    word = "jivetalking-tpu"
    if not color:
        return word
    n = len(word) - 1
    out = []
    for i, ch in enumerate(word):
        t = i / n
        rgb = tuple(
            int(round(a + (b - a) * t))
            for a, b in zip(_CYAN_BRIGHT_RGB, _SKY_BLUE_RGB)
        )
        out.append(_BOLD + _fg(rgb) + ch + _RESET)
    return "".join(out)


def render_help(parser, stream=None) -> str:
    """Sectioned, colourised help over the argparse model (ref:
    cli.StyledHelpPrinter, help.go:38-135: title, italic description,
    Usage, Arguments, Flags — label styled, help text plain).  Renders
    plain (no ANSI) when the stream is piped or NO_COLOR is set."""
    stream = stream if stream is not None else sys.stdout
    color = _want_color(stream)

    def sec(text: str) -> str:
        return (_BOLD + _fg(_ORANGE_RGB) + text + _RESET) if color else text

    def flag(text: str) -> str:
        return (_BOLD + _fg(_GREEN_RGB) + text + _RESET) if color else text

    def arg(text: str) -> str:
        return (_BOLD + _fg(_CYAN_RGB) + text + _RESET) if color else text

    lines = [render_title(color)]
    desc = (parser.description or "").strip()
    if desc:
        lines.append((_ITALIC + _fg(_ORANGE_RGB) + desc + _RESET) if color else desc)
    lines.append("")
    lines.append(sec("Usage:"))
    lines.append(f"  {parser.prog} [flags] <files> ...")

    positionals, flags = [], []
    for a in parser._actions:  # noqa: SLF001 — argparse's stable model surface
        if a.help == "==SUPPRESS==":
            continue
        if not a.option_strings:
            positionals.append((a.dest, a.help or ""))
            continue
        label = ", ".join(a.option_strings)
        if a.nargs != 0:
            # value-taking flag: --flag=PLACEHOLDER (ref: help.go:123-126)
            placeholder = (a.metavar or a.dest).upper().replace("-", "_")
            label += f"={placeholder}"
        flags.append((label, a.help or ""))

    if positionals:
        lines.append("")
        lines.append(sec("Arguments:"))
        width = max(len(n) for n, _ in positionals)
        for name, help_text in positionals:
            lines.append(f"  {arg(name.ljust(width))}  {help_text}")

    if flags:
        lines.append("")
        lines.append(sec("Flags:"))
        width = max(len(l) for l, _ in flags)
        for label, help_text in flags:
            lines.append(f"  {flag(label.ljust(width))}  {help_text}")

    lines.append("")
    return "\n".join(lines)


def print_help(parser) -> None:
    """(ref: cli.StyledHelpPrinter wired through kong.Help)."""
    print(render_help(parser, sys.stdout))


def print_version(version: str) -> None:
    """(ref: cli.PrintVersion)."""
    print(render_title(_want_color(sys.stdout))
          + " " + _style(version, _DIM, stream=sys.stdout))


def print_error(msg: str) -> None:
    """(ref: cli.PrintError)."""
    print(_style("error:", _BOLD, _RED, stream=sys.stderr) + f" {msg}",
          file=sys.stderr)


def print_warning(msg: str) -> None:
    """(ref: cli.PrintWarning)."""
    print(_style("warning:", _BOLD, _YELLOW, stream=sys.stderr) + f" {msg}",
          file=sys.stderr)
