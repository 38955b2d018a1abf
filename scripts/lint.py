#!/usr/bin/env python
"""Static-analysis tier for the package (stdlib-ast, no third-party deps).

The reference CI runs go vet / gocyclo / ineffassign / golangci-lint
(ref: SURVEY.md section 4; .github/workflows/builder.yml).  This image has
no ruff/flake8/mypy and installs are not allowed, so this implements the
highest-value subset of those checks directly on the AST:

  F401  unused import
  F811  redefinition of an unused name (duplicate def/class in one scope)
  F821  undefined name (scope-aware: module/class/function/comprehension
        chains, globals/nonlocals, wildcard-import and dynamic-scope bailouts)
  F502  f-string without any placeholder
  B006  mutable default argument (list/dict/set literal or call)
  E711  comparison to None with ==/!=
  E722  bare `except:`
  W605  invalid escape sequence in a str literal (via compile warnings)

Usage: python scripts/lint.py [paths...]   (default: jivetalking_tpu/ + the
repo-root entry points).  Exits non-zero on any finding; the test suite
runs it (tests/test_lint.py) so `pytest` IS the lint gate, mirroring the
reference's `just test` + lint CI split.
"""

from __future__ import annotations

import ast
import builtins
import sys
import warnings
from pathlib import Path

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__", "__package__",
                                 "__spec__", "__loader__", "__builtins__",
                                 "__debug__", "__path__", "__annotations__",
                                 "__dict__", "__class__", "__module__",
                                 "__qualname__", "WindowsError"}


class Scope:
    def __init__(self, node, parent, kind):
        self.node = node
        self.parent = parent
        self.kind = kind            # "module" | "function" | "class" | "comp"
        self.bindings: dict[str, ast.AST] = {}
        self.globals: set[str] = set()
        self.nonlocals: set[str] = set()
        self.uses: list[tuple[str, ast.AST]] = []
        self.has_wildcard = False
        self.children: list[Scope] = []
        if parent is not None:
            parent.children.append(self)

    def bind(self, name: str, node: ast.AST):
        self.bindings[name] = node


class Checker(ast.NodeVisitor):
    """One pass building the scope tree + all local checks."""

    def __init__(self, path: str, tree: ast.Module, source: str):
        self.path = path
        self.problems: list[tuple[int, str, str]] = []
        self.module_scope = Scope(tree, None, "module")
        self.scope = self.module_scope
        self.imports: list[tuple[str, ast.AST, Scope]] = []  # (asname, node, scope)
        self._source = source

    def problem(self, node, code, msg):
        self.problems.append((getattr(node, "lineno", 0), code, msg))

    # --- scope plumbing ---

    def _walk_new_scope(self, node, kind):
        outer = self.scope
        self.scope = Scope(node, outer, kind)
        if kind == "function":
            args = node.args
            for a in (list(args.posonlyargs) + list(args.args) +
                      list(args.kwonlyargs) +
                      ([args.vararg] if args.vararg else []) +
                      ([args.kwarg] if args.kwarg else [])):
                self.scope.bind(a.arg, a)
            for d in node.args.defaults + [d for d in node.args.kw_defaults if d]:
                # defaults evaluate in the OUTER scope
                self.scope, tmp = outer, self.scope
                self.visit(d)
                self.scope = tmp
            body = node.body if isinstance(node.body, list) else [node.body]
            for stmt in body:
                self.visit(stmt)
        elif kind == "comp":
            # first generator's iterable evaluates in the OUTER scope
            gens = node.generators
            self.scope, tmp = outer, self.scope
            self.visit(gens[0].iter)
            self.scope = tmp
            for i, g in enumerate(gens):
                self.visit(g.target)
                if i > 0:
                    self.visit(g.iter)
                for cond in g.ifs:
                    self.visit(cond)
            if isinstance(node, ast.DictComp):
                self.visit(node.key)
                self.visit(node.value)
            else:
                self.visit(node.elt)
        else:  # class
            for stmt in node.body:
                self.visit(stmt)
        self.scope = outer

    # --- bindings ---

    def visit_FunctionDef(self, node):
        self._def_like(node)

    def visit_AsyncFunctionDef(self, node):
        self._def_like(node)

    def _def_like(self, node):
        if node.name in self.scope.bindings and isinstance(
            self.scope.bindings[node.name], (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            prev = self.scope.bindings[node.name]
            self.problem(node, "F811",
                         f"redefinition of '{node.name}' (first defined line {prev.lineno})")
        for dec in node.decorator_list:
            self.visit(dec)
        for default in []:
            pass
        if node.returns:
            self.visit(node.returns)
        for a in (node.args.posonlyargs + node.args.args + node.args.kwonlyargs +
                  ([node.args.vararg] if node.args.vararg else []) +
                  ([node.args.kwarg] if node.args.kwarg else [])):
            if a.annotation:
                self.visit(a.annotation)
        # mutable default check
        for d in node.args.defaults + [d for d in node.args.kw_defaults if d]:
            if isinstance(d, (ast.List, ast.Dict, ast.Set)) or (
                isinstance(d, ast.Call) and isinstance(d.func, ast.Name)
                and d.func.id in ("list", "dict", "set")
            ):
                self.problem(d, "B006", f"mutable default argument in '{node.name}'")
        self.scope.bind(node.name, node)
        self._walk_new_scope(node, "function")

    def visit_ClassDef(self, node):
        if node.name in self.scope.bindings and isinstance(
            self.scope.bindings[node.name], (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ):
            prev = self.scope.bindings[node.name]
            self.problem(node, "F811",
                         f"redefinition of '{node.name}' (first defined line {prev.lineno})")
        for dec in node.decorator_list:
            self.visit(dec)
        for base in node.bases + [k.value for k in node.keywords]:
            self.visit(base)
        self.scope.bind(node.name, node)
        self._walk_new_scope(node, "class")

    def visit_Lambda(self, node):
        self._walk_new_scope(node, "function")

    def visit_ListComp(self, node):
        self._walk_new_scope(node, "comp")

    def visit_SetComp(self, node):
        self._walk_new_scope(node, "comp")

    def visit_DictComp(self, node):
        self._walk_new_scope(node, "comp")

    def visit_GeneratorExp(self, node):
        self._walk_new_scope(node, "comp")

    def visit_Import(self, node):
        for alias in node.names:
            name = alias.asname or alias.name.split(".")[0]
            self.scope.bind(name, node)
            self.imports.append((name, node, self.scope))

    def visit_ImportFrom(self, node):
        for alias in node.names:
            if alias.name == "*":
                self.scope.has_wildcard = True
                continue
            name = alias.asname or alias.name
            self.scope.bind(name, node)
            self.imports.append((name, node, self.scope))

    def visit_Global(self, node):
        self.scope.globals.update(node.names)
        for n in node.names:
            self.module_scope.bind(n, node)

    def visit_Nonlocal(self, node):
        self.scope.nonlocals.update(node.names)
        s = self.scope.parent
        while s is not None and s.kind != "function":
            s = s.parent
        if s is not None:
            for n in node.names:
                s.bind(n, node)

    def visit_Name(self, node):
        if isinstance(node.ctx, (ast.Store, ast.Del)):
            self.scope.bind(node.id, node)
        else:
            self.scope.uses.append((node.id, node))

    def visit_ExceptHandler(self, node):
        if node.type is None:
            self.problem(node, "E722", "bare 'except:' (catches SystemExit/KeyboardInterrupt)")
        if node.name:
            self.scope.bind(node.name, node)
        self.generic_visit(node)

    def visit_Compare(self, node):
        for op, comp in zip(node.ops, node.comparators):
            if isinstance(op, (ast.Eq, ast.NotEq)) and (
                (isinstance(comp, ast.Constant) and comp.value is None)
                or (isinstance(node.left, ast.Constant) and node.left.value is None)
            ):
                self.problem(node, "E711", "comparison to None with ==/!= (use is/is not)")
        self.generic_visit(node)

    def visit_JoinedStr(self, node):
        if not any(isinstance(v, ast.FormattedValue) for v in node.values):
            self.problem(node, "F502", "f-string without any placeholder")
        for v in node.values:
            if isinstance(v, ast.FormattedValue):
                self.visit(v)

    def visit_FormattedValue(self, node):
        # format_spec is a nested JoinedStr of constants — not an f-string
        self.visit(node.value)

    def visit_Match(self, node):
        # match-case capture patterns bind names
        self.visit(node.subject)
        for case in node.cases:
            for n in ast.walk(case.pattern):
                if isinstance(n, (ast.MatchAs, ast.MatchStar)) and n.name:
                    self.scope.bind(n.name, n)
                if isinstance(n, ast.MatchMapping) and n.rest:
                    self.scope.bind(n.rest, n)
            if case.guard:
                self.visit(case.guard)
            for stmt in case.body:
                self.visit(stmt)

    # --- resolution ---

    def _resolvable(self, name: str, scope: Scope) -> bool:
        s = scope
        while s is not None:
            if s.has_wildcard:
                return True
            if name in s.globals:
                return name in self.module_scope.bindings or name in BUILTINS
            if s.kind != "class" or s is scope:
                if name in s.bindings:
                    return True
            s = s.parent
            while s is not None and s.kind == "class" and name not in s.bindings:
                # class scopes are skipped for enclosed lookups, handled above
                break
        return name in BUILTINS

    def finish(self):
        wildcard_anywhere = False

        def any_wild(s):
            nonlocal wildcard_anywhere
            if s.has_wildcard:
                wildcard_anywhere = True
            for c in s.children:
                any_wild(c)

        any_wild(self.module_scope)

        used_names: set[str] = set()

        def resolve(s: Scope):
            for name, node in s.uses:
                used_names.add(name)
                if not wildcard_anywhere and not self._resolvable(name, s):
                    self.problem(node, "F821", f"undefined name '{name}'")
            for c in s.children:
                resolve(c)

        resolve(self.module_scope)

        # attribute/submodule uses count toward imports ("import a.b" then a.b.c)
        for name, node, scope in self.imports:
            if name in used_names or name == "_":
                continue
            if name in ("annotations",):  # from __future__ import annotations
                continue
            if scope is self.module_scope and name in getattr(self, "_export_names", set()):
                continue
            # re-export convention: __init__.py imports are public surface
            if self.path.endswith("__init__.py"):
                continue
            self.problem(node, "F401", f"unused import '{name}'")


def collect_exports(tree: ast.Module) -> set[str]:
    """Names in __all__ literals count as used (re-export surface)."""
    out: set[str] = set()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    for el in ast.walk(node.value):
                        if isinstance(el, ast.Constant) and isinstance(el.value, str):
                            out.add(el.value)
    return out


def lint_file(path: Path) -> list[str]:
    src = path.read_text(encoding="utf-8")
    msgs: list[str] = []
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", SyntaxWarning)
        try:
            tree = ast.parse(src, filename=str(path))
            compile(src, str(path), "exec", dont_inherit=True)
        except SyntaxError as e:
            return [f"{path}:{e.lineno}: E999 syntax error: {e.msg}"]
    for w in caught:
        if issubclass(w.category, SyntaxWarning) and "invalid escape" in str(w.message):
            msgs.append(f"{path}:{getattr(w, 'lineno', 0)}: W605 {w.message}")
    checker = Checker(str(path), tree, src)
    checker._export_names = collect_exports(tree)
    checker.visit(tree)
    checker.finish()
    for lineno, code, msg in sorted(checker.problems):
        msgs.append(f"{path}:{lineno}: {code} {msg}")
    return msgs


DEFAULT_TARGETS = ["jivetalking_tpu", "bench.py", "bench_ablation.py",
                   "__graft_entry__.py", "scripts", "tests"]


def main(argv: list[str]) -> int:
    root = Path(__file__).resolve().parent.parent
    targets = [Path(a) for a in argv] or [root / t for t in DEFAULT_TARGETS]
    files: list[Path] = []
    for t in targets:
        if t.is_dir():
            files.extend(sorted(t.rglob("*.py")))
        elif t.suffix == ".py":
            files.append(t)
    all_msgs: list[str] = []
    for f in files:
        all_msgs.extend(lint_file(f))
    for m in all_msgs:
        print(m)
    print(f"lint: {len(files)} files, {len(all_msgs)} problem(s)")
    return 1 if all_msgs else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
