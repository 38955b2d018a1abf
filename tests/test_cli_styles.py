"""String pins for the styled CLI surface, ported from the reference's
internal/cli test files (help_test.go 157 LoC, styles_test.go 151 LoC).

The reference styles through lipgloss + colorprofile downsampling; this
rebuild emits raw SGR and degrades to plain text off-TTY, so the
downsampling matrix collapses to the colour/no-colour pair — the
surviving pins are row grammar, ordering, dedup, gradient shape and
stability.
"""

import io
import re

import pytest

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

    def test_truecolor_preserved_on_tty(self):
        out = render_help(build_parser(), _FakeTTY())
        assert "38;2;" in out
