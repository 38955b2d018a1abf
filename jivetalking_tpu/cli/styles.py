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


# --- terminal colour-profile downsampling -------------------------------
# The renderers always emit truecolor SGR; the WRITE path rewrites it per
# the terminal's capability, like the reference's colorprofile.Writer
# under lipgloss (ref: cli/styles_test.go:26-80 — truecolor must never
# leak to an ANSI/ANSI256/NoTTY terminal, and NoTTY keeps the text).

import re as _re

_SGR_RE = _re.compile(r"\x1b\[([0-9;]*)m")

# the standard 16-colour palette's nominal RGB values, index = SGR code
_ANSI16 = [
    (30, (0, 0, 0)), (31, (205, 0, 0)), (32, (0, 205, 0)),
    (33, (205, 205, 0)), (34, (0, 0, 238)), (35, (205, 0, 205)),
    (36, (0, 205, 205)), (37, (229, 229, 229)),
    (90, (127, 127, 127)), (91, (255, 0, 0)), (92, (0, 255, 0)),
    (93, (255, 255, 0)), (94, (92, 92, 255)), (95, (255, 0, 255)),
    (96, (0, 255, 255)), (97, (255, 255, 255)),
]


def color_profile(stream=None) -> str:
    """The terminal's colour capability: 'truecolor', '256', 'ansi' or
    'none' (non-TTY / NO_COLOR / TERM=dumb), resolved from COLORTERM and
    TERM the way the reference's colorprofile detection does."""
    stream = stream if stream is not None else sys.stdout
    if not _want_color(stream):
        return "none"
    term = os.environ.get("TERM", "")
    if term == "dumb":
        return "none"
    ct = os.environ.get("COLORTERM", "").lower()
    if "truecolor" in ct or "24bit" in ct:
        return "truecolor"
    if "256color" in term:
        return "256"
    return "ansi"


def _rgb_to_256(r: int, g: int, b: int) -> int:
    """Nearest xterm-256 index: greyscale ramp for near-grey colours,
    otherwise the 6x6x6 cube."""
    if abs(r - g) < 8 and abs(g - b) < 8:
        if r < 8:
            return 16
        if r > 248:
            return 231
        return 232 + (r - 8) * 24 // 240
    def q(v):
        return 0 if v < 48 else (1 if v < 115 else (v - 35) // 40)
    return 16 + 36 * q(r) + 6 * q(g) + q(b)


def _rgb_to_16(r: int, g: int, b: int) -> int:
    return min(_ANSI16,
               key=lambda e: (e[1][0] - r) ** 2 + (e[1][1] - g) ** 2
               + (e[1][2] - b) ** 2)[0]


def downsample_sgr(text: str, profile: str) -> str:
    """Rewrite every truecolor `38;2;r;g;b` / `48;2;r;g;b` SGR parameter
    to the profile's nearest representation — 'none' strips ALL SGR while
    keeping the text (ref: TestStyledOutputDownsamplesNoTruecolorLeak /
    ...StripsColorButKeepsTextWhenNoTTY, styles_test.go:26-64)."""
    if profile == "truecolor":
        return text
    if profile == "none":
        return _SGR_RE.sub("", text)

    def rewrite(m):
        params = m.group(1).split(";")
        out = []
        i = 0
        while i < len(params):
            if (params[i] in ("38", "48") and i + 4 < len(params)
                    and params[i + 1] == "2"):
                base = params[i]
                r, g, b = (int(params[i + 2]), int(params[i + 3]),
                           int(params[i + 4]))
                if profile == "256":
                    out += [base, "5", str(_rgb_to_256(r, g, b))]
                else:
                    code = _rgb_to_16(r, g, b)
                    out.append(str(code if base == "38" else code + 10))
                i += 5
            else:
                out.append(params[i])
                i += 1
        return "\x1b[" + ";".join(out) + "m"

    return _SGR_RE.sub(rewrite, text)


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
    # truecolor never leaks to a lesser terminal: rewrite per the
    # stream's profile on the way out (styles_test.go:26-52)
    return downsample_sgr("\n".join(lines), color_profile(stream))


def print_help(parser) -> None:
    """(ref: cli.StyledHelpPrinter wired through kong.Help)."""
    print(render_help(parser, sys.stdout))


def print_version(version: str) -> None:
    """(ref: cli.PrintVersion)."""
    line = (render_title(_want_color(sys.stdout))
            + " " + _style(version, _DIM, stream=sys.stdout))
    print(downsample_sgr(line, color_profile(sys.stdout)))


def print_error(msg: str) -> None:
    """(ref: cli.PrintError)."""
    print(_style("error:", _BOLD, _RED, stream=sys.stderr) + f" {msg}",
          file=sys.stderr)


def print_warning(msg: str) -> None:
    """(ref: cli.PrintWarning)."""
    print(_style("warning:", _BOLD, _YELLOW, stream=sys.stderr) + f" {msg}",
          file=sys.stderr)
