"""The static-analysis tier (scripts/lint.py) as a pytest gate.

The reference CI runs go vet / gocyclo / ineffassign / golangci-lint as a
separate lint job (ref: SURVEY.md section 4, builder.yml); this image has
no ruff/flake8/mypy, so the repo carries its own stdlib-ast checker and
the suite IS the gate.  Two halves: the checker must find nothing in the
repo, and each rule must actually fire on a known-bad snippet (a linter
that silently stopped detecting would otherwise pass forever).
"""

import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

from lint import lint_file  # noqa: E402


def _lint_snippet(tmp_path, code: str, name: str = "snippet.py") -> list[str]:
    p = tmp_path / name
    p.write_text(textwrap.dedent(code))
    return [m.split(": ", 1)[1] for m in lint_file(p)]


class TestRulesFire:
    def test_unused_import(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "import os\nprint(1)\n")
        assert any(m.startswith("F401") and "'os'" in m for m in msgs)

    def test_used_import_not_flagged(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "import os\nprint(os.sep)\n")
        assert not any(m.startswith("F401") for m in msgs)

    def test_init_reexports_not_flagged(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "from os import sep\n", name="__init__.py")
        assert not any(m.startswith("F401") for m in msgs)

    def test_dunder_all_counts_as_use(self, tmp_path):
        msgs = _lint_snippet(
            tmp_path, "from os import sep\n__all__ = ['sep']\n")
        assert not any(m.startswith("F401") for m in msgs)

    def test_undefined_name(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "def f():\n    return missing_thing\n")
        assert any(m.startswith("F821") and "missing_thing" in m for m in msgs)

    def test_closure_and_comprehension_scopes_resolve(self, tmp_path):
        code = """
        def outer():
            x = 1
            def inner():
                return x
            ys = [x + i for i in range(3)]
            return inner() + sum(ys)
        """
        msgs = _lint_snippet(tmp_path, code)
        assert not any(m.startswith("F821") for m in msgs)

    def test_class_scope_not_visible_to_methods(self, tmp_path):
        code = """
        class C:
            attr = 1
            def m(self):
                return attr
        """
        msgs = _lint_snippet(tmp_path, code)
        assert any(m.startswith("F821") and "'attr'" in m for m in msgs)

    def test_redefinition(self, tmp_path):
        code = """
        def f():
            return 1
        def f():
            return 2
        print(f())
        """
        msgs = _lint_snippet(tmp_path, code)
        assert any(m.startswith("F811") and "'f'" in m for m in msgs)

    def test_decorated_overloads_still_flag_plain_dupes_only(self, tmp_path):
        # property setter pattern: second def IS a legitimate redefinition
        # in python semantics but a different symbol conceptually; the
        # checker intentionally still reports plain same-name defs — the
        # repo convention is distinct names (no typing.overload used).
        msgs = _lint_snippet(tmp_path, "x = 1\nx = 2\nprint(x)\n")
        assert not any(m.startswith("F811") for m in msgs)  # plain rebinds fine

    def test_mutable_default(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "def f(a, b=[]):\n    return a, b\nprint(f(1))\n")
        assert any(m.startswith("B006") for m in msgs)

    def test_bare_except(self, tmp_path):
        code = """
        try:
            pass
        except:
            pass
        """
        msgs = _lint_snippet(tmp_path, code)
        assert any(m.startswith("E722") for m in msgs)

    def test_none_comparison(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "x = 1\nprint(x == None)\n")
        assert any(m.startswith("E711") for m in msgs)

    def test_fstring_without_placeholder(self, tmp_path):
        msgs = _lint_snippet(tmp_path, 'print(f"plain")\n')
        assert any(m.startswith("F502") for m in msgs)

    def test_format_spec_is_not_flagged(self, tmp_path):
        msgs = _lint_snippet(tmp_path, 'v = 1.5\nprint(f"{v:6.1f}")\n')
        assert not any(m.startswith("F502") for m in msgs)

    def test_syntax_error_reported_not_raised(self, tmp_path):
        msgs = _lint_snippet(tmp_path, "def f(:\n")
        assert any(m.startswith("E999") for m in msgs)


def test_repo_is_lint_clean():
    """The gate: scripts/lint.py over the whole repo finds nothing."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "lint.py")],
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, f"lint problems:\n{proc.stdout}{proc.stderr}"
