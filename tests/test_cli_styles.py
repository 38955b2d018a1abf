"""String pins for the styled CLI surface, ported from the reference's
internal/cli test files (help_test.go 157 LoC, styles_test.go 151 LoC).

The reference styles through lipgloss + colorprofile downsampling; this
rebuild mirrors that shape: renderers emit truecolor SGR, and the write
path rewrites it per the terminal profile (truecolor/256/ansi/none) via
`downsample_sgr`, so truecolor never leaks to a lesser terminal and
NoTTY keeps the text.  Pins: row grammar, ordering, dedup, gradient
shape/stability, and the full downsampling matrix.
"""

import io
import re


from jivetalking_tpu.cli.main import build_parser
from jivetalking_tpu.cli.styles import render_help, render_title

ANSI = re.compile(r"\x1b\[[0-9;]*m")


class _FakeTTY(io.StringIO):
    def isatty(self):
        return True


def _strip(s: str) -> str:
    return ANSI.sub("", s)


class TestHelpRowGrammar:
    """(ref: TestWriteHelpSectionRendersRows, help_test.go:51-79): header,
    two-space indent, two-space label/help separator, no help text for
    help-less rows."""

    def test_two_space_indent_and_separator(self):
        out = _strip(render_help(build_parser(), io.StringIO()))
        lines = out.splitlines()
        flag_rows = [
            l for l in lines if l.startswith("  ") and l.lstrip().startswith("-")
        ]
        assert flag_rows, "no flag rows rendered"
        for row in flag_rows:
            # exactly two spaces of indent before the label
            assert row[:2] == "  " and row[2] != " "
        # a row with help text separates label and help by exactly two
        # spaces (labels are width-padded, so >= 2 spaces total)
        help_row = next(l for l in flag_rows if "Show this help" in l or "help" in l)
        label_part = help_row[2:].split("  ")[0]
        assert label_part.startswith("-")

    def test_sections_in_order(self):
        out = _strip(render_help(build_parser(), io.StringIO()))
        i_usage = out.index("Usage:")
        i_args = out.index("Arguments:")
        i_flags = out.index("Flags:")
        assert i_usage < i_args < i_flags

    def test_empty_sections_omitted(self):
        # a parser with no positionals must not render an Arguments header
        # (ref: TestWriteHelpSectionEmptyRowsWritesNothing, help_test.go:81-88)
        import argparse

        p = argparse.ArgumentParser(prog="t", add_help=True)
        p.add_argument("--only-flag", action="store_true", help="x")
        out = _strip(render_help(p, io.StringIO()))
        assert "Arguments:" not in out
        assert "Flags:" in out


class TestHelpFlagRows:
    """(ref: TestGetFlagsFormatsLabels / HelpFirstAndDeduplicated,
    help_test.go:90-147)."""

    def test_help_row_first_and_deduplicated(self):
        out = _strip(render_help(build_parser(), io.StringIO()))
        lines = out.splitlines()
        flags_at = lines.index("Flags:")
        first_flag = lines[flags_at + 1].strip()
        assert first_flag.startswith("-h, --help"), first_flag
        help_rows = [l for l in lines if "--help" in l]
        assert len(help_rows) == 1

    def test_value_flag_upcases_placeholder(self):
        out = _strip(render_help(build_parser(), io.StringIO()))
        assert "--jobs=JOBS" in out
        # bool flags carry no placeholder
        assert "--verbose=" not in out

    def test_short_long_join_with_comma(self):
        out = _strip(render_help(build_parser(), io.StringIO()))
        assert re.search(r"-d, --debug", out)
        assert re.search(r"-a, --analyse", out)

    def test_positional_lists_name_and_help(self):
        # (ref: TestGetArgumentsRendersPositionals, help_test.go:149-162)
        out = _strip(render_help(build_parser(), io.StringIO()))
        lines = out.splitlines()
        args_at = lines.index("Arguments:")
        row = lines[args_at + 1]
        assert "files" in row
        assert len(row.split("  ")) >= 2  # label + help text


class TestTitleGradient:
    """(ref: TestRenderTitleIsGradient / IsStable / DownsamplesNoColor,
    styles_test.go:100-146)."""

    def test_multi_colour_gradient_no_brand_red(self):
        title = render_title(color=True)
        colors = set(re.findall(r"38;2;(\d+);(\d+);(\d+)m", title))
        assert len(colors) >= 2, colors
        assert ("164", "0", "0") not in colors  # brand red never colours it

    def test_wordmark_survives_stripping(self):
        assert "jivetalking-tpu" in _strip(render_title(color=True))

    def test_no_color_drops_all_escapes(self):
        plain = render_title(color=False)
        assert "\x1b[" not in plain
        assert plain == "jivetalking-tpu"

    def test_stable_across_calls(self):
        assert render_title(color=True) == render_title(color=True)
        assert render_title(color=True) != ""

    def test_gradient_endpoints_pinned(self):
        title = render_title(color=True)
        colors = re.findall(r"38;2;(\d+);(\d+);(\d+)m", title)
        assert colors[0] == ("0", "212", "255")   # bright cyan start
        assert colors[-1] == ("56", "189", "248")  # sky blue end


class TestPrinterStreams:
    """(ref: styles_test.go downsampling matrix: text survives every
    profile; colour appears only where wanted)."""

    def test_error_and_warning_keep_text_when_piped(self, capsys, monkeypatch):
        from jivetalking_tpu.cli.styles import print_error, print_warning

        monkeypatch.delenv("NO_COLOR", raising=False)
        print_error("boom")
        print_warning("careful")
        err = capsys.readouterr().err
        assert "error: boom" in _strip(err)
        assert "warning: careful" in _strip(err)

    def test_truecolor_preserved_on_truecolor_tty(self, monkeypatch):
        # (ref: TestStyledOutputPreservesTruecolor, styles_test.go:145)
        monkeypatch.setenv("COLORTERM", "truecolor")
        monkeypatch.delenv("NO_COLOR", raising=False)
        out = render_help(build_parser(), _FakeTTY())
        assert "38;2;" in out


class TestColorProfileDownsampling:
    """(ref: TestStyledOutputDownsamplesNoTruecolorLeak /
    ...StripsColorButKeepsTextWhenNoTTY / TestRenderTitleDownsamplesNoColor,
    styles_test.go:26-64,122-143): the renderers emit truecolor; the write
    path rewrites it per the terminal profile, and truecolor never leaks
    to a lesser terminal."""

    STYLED = "\x1b[1;38;2;255;165;0mFlags\x1b[0m plain \x1b[38;2;0;170;0m--debug\x1b[0m"

    def test_no_truecolor_leak_on_lesser_profiles(self):
        from jivetalking_tpu.cli.styles import downsample_sgr

        for profile in ("256", "ansi", "none"):
            out = downsample_sgr(self.STYLED, profile)
            assert "38;2;" not in out, profile
            assert "Flags" in out and "--debug" in out, profile

    def test_none_profile_strips_all_escapes_keeps_text(self):
        from jivetalking_tpu.cli.styles import downsample_sgr

        out = downsample_sgr(self.STYLED, "none")
        assert "\x1b[" not in out
        assert out == "Flags plain --debug"

    def test_256_profile_rewrites_to_indexed(self):
        from jivetalking_tpu.cli.styles import downsample_sgr

        out = downsample_sgr(self.STYLED, "256")
        assert "38;5;" in out
        # non-colour attributes (bold) survive the rewrite
        assert out.startswith("\x1b[1;38;5;")

    def test_ansi_profile_rewrites_to_basic(self):
        from jivetalking_tpu.cli.styles import downsample_sgr

        out = downsample_sgr(self.STYLED, "ansi")
        # no extended-fg parameter survives the basic rewrite
        assert "38;" not in out
        assert re.search(r"\x1b\[1;(3[0-7]|9[0-7])m", out)

    def test_truecolor_profile_is_identity(self):
        from jivetalking_tpu.cli.styles import downsample_sgr

        assert downsample_sgr(self.STYLED, "truecolor") == self.STYLED

    def test_profile_detection(self, monkeypatch):
        from jivetalking_tpu.cli.styles import color_profile

        monkeypatch.delenv("NO_COLOR", raising=False)
        monkeypatch.setenv("COLORTERM", "truecolor")
        monkeypatch.setenv("TERM", "xterm-256color")
        assert color_profile(_FakeTTY()) == "truecolor"
        monkeypatch.delenv("COLORTERM")
        assert color_profile(_FakeTTY()) == "256"
        monkeypatch.setenv("TERM", "vt100")
        assert color_profile(_FakeTTY()) == "ansi"
        monkeypatch.setenv("TERM", "dumb")
        assert color_profile(_FakeTTY()) == "none"
        monkeypatch.setenv("TERM", "xterm-256color")
        assert color_profile(io.StringIO()) == "none"  # non-TTY
        monkeypatch.setenv("NO_COLOR", "1")
        assert color_profile(_FakeTTY()) == "none"

    def test_help_never_leaks_truecolor_on_256_terminal(self, monkeypatch):
        monkeypatch.delenv("NO_COLOR", raising=False)
        monkeypatch.delenv("COLORTERM", raising=False)
        monkeypatch.setenv("TERM", "xterm-256color")
        out = render_help(build_parser(), _FakeTTY())
        assert "38;2;" not in out
        assert "38;5;" in out
