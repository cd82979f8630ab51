"""Static quality gate, stdlib-only.

The image ships neither ruff nor mypy (pyproject.toml configures both
for environments that have them), so this script provides the checks
CI actually runs here:

1. every source file compiles (syntax);
2. no name is read in a scope where it is neither local, nonlocal,
   module-level, imported, a builtin, nor an explicit global — the
   class of bug that once left ``base`` undefined in a solver branch;
3. no unused imports (noqa-style suppression: ``# reexport`` or
   ``__all__`` listing).

Exit code 0 = clean. Run:  python tools/check.py
"""

from __future__ import annotations

import ast
import builtins
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
TARGETS = ["pulser_tpu", "tests", "tools", "examples", "bench.py", "__graft_entry__.py"]

BUILTINS = set(dir(builtins)) | {"__file__", "__name__", "__doc__", "__builtins__"}


def iter_files() -> list[Path]:
    out = []
    for target in TARGETS:
        p = REPO / target
        if p.is_file():
            out.append(p)
        else:
            out.extend(sorted(p.rglob("*.py")))
    return out


class _ScopeVisitor(ast.NodeVisitor):
    """Collects module-level bindings (defs, imports, assignments)."""

    def __init__(self) -> None:
        self.bound: set[str] = set(BUILTINS)
        self.imports: dict[str, ast.stmt] = {}

    def visit_Module(self, node: ast.Module) -> None:
        for stmt in node.body:
            self._bind_stmt(stmt)

    def _bind_targets(self, target: ast.expr) -> None:
        if isinstance(target, ast.Name):
            self.bound.add(target.id)
        elif isinstance(target, (ast.Tuple, ast.List)):
            for elt in target.elts:
                self._bind_targets(elt)
        elif isinstance(target, ast.Starred):
            self._bind_targets(target.value)

    def _bind_stmt(self, stmt: ast.stmt) -> None:
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            self.bound.add(stmt.name)
        elif isinstance(stmt, (ast.Import, ast.ImportFrom)):
            for alias in stmt.names:
                name = (alias.asname or alias.name).split(".")[0]
                self.bound.add(name)
                self.imports.setdefault(name, stmt)
        elif isinstance(stmt, (ast.Assign, ast.AugAssign, ast.AnnAssign)):
            targets = (
                stmt.targets
                if isinstance(stmt, ast.Assign)
                else [stmt.target]
            )
            for t in targets:
                self._bind_targets(t)
        elif isinstance(stmt, (ast.If, ast.Try, ast.For, ast.While, ast.With)):
            # Loop variables and with-targets are module bindings too.
            if isinstance(stmt, ast.For):
                self._bind_targets(stmt.target)
            if isinstance(stmt, ast.With):
                for item in stmt.items:
                    if item.optional_vars is not None:
                        self._bind_targets(item.optional_vars)
            # TYPE_CHECKING-guarded imports exist only for annotations:
            # bind their names but exempt them from the unused check
            guarded = (
                isinstance(stmt, ast.If)
                and isinstance(stmt.test, ast.Name)
                and stmt.test.id == "TYPE_CHECKING"
            )
            for sub in ast.walk(stmt):
                if isinstance(sub, ast.stmt) and sub is not stmt:
                    before = set(self.imports)
                    self._bind_stmt(sub)
                    if guarded:
                        for new in set(self.imports) - before:
                            del self.imports[new]


def check_undefined(tree: ast.Module, path: Path) -> list[str]:
    """Finds names read but bound nowhere reachable (heuristic)."""
    import symtable

    problems = []
    try:
        table = symtable.symtable(
            path.read_text(), str(path), "exec"
        )
    except SyntaxError as err:
        return [f"{path}: syntax error: {err}"]

    module_scope = _ScopeVisitor()
    module_scope.visit(tree)
    bound = module_scope.bound

    def walk(tb: "symtable.SymbolTable") -> None:
        for sym in tb.get_symbols():
            if (
                sym.is_referenced()
                and not sym.is_assigned()
                and not sym.is_parameter()
                and not sym.is_imported()
                and sym.is_global()
                and sym.get_name() not in bound
            ):
                problems.append(
                    f"{path}:{tb.get_lineno()}: undefined name "
                    f"'{sym.get_name()}' in {tb.get_name()}"
                )
        for child in tb.get_children():
            walk(child)

    walk(table)
    return problems


def check_unused_imports(tree: ast.Module, source: str, path: Path) -> list[str]:
    visitor = _ScopeVisitor()
    visitor.visit(tree)
    used: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            base = node
            while isinstance(base, ast.Attribute):
                base = base.value
            if isinstance(base, ast.Name):
                used.add(base.id)
    # names exported via __all__ count as used
    for node in ast.walk(tree):
        if (
            isinstance(node, ast.Assign)
            and any(
                isinstance(t, ast.Name) and t.id == "__all__"
                for t in node.targets
            )
            and isinstance(node.value, (ast.List, ast.Tuple))
        ):
            for elt in node.value.elts:
                if isinstance(elt, ast.Constant):
                    used.add(str(elt.value))
    problems = []
    lines = source.splitlines()
    for name, stmt in visitor.imports.items():
        if name in used or name.startswith("_") or name == "annotations":
            continue
        line = lines[stmt.lineno - 1] if stmt.lineno <= len(lines) else ""
        if "# noqa" in line or "# reexport" in line:
            continue
        if path.name == "__init__.py" or "TYPE_CHECKING" in line:
            continue  # re-export surface / typing-only
        problems.append(
            f"{path}:{stmt.lineno}: unused import '{name}'"
        )
    return problems


def main() -> int:
    problems: list[str] = []
    for path in iter_files():
        source = path.read_text()
        try:
            tree = ast.parse(source, filename=str(path))
        except SyntaxError as err:
            problems.append(f"{path}: syntax error: {err}")
            continue
        # TYPE_CHECKING-guarded imports bind at module level for the
        # undefined-name check (they exist for annotations)
        problems.extend(check_undefined(tree, path))
        problems.extend(check_unused_imports(tree, source, path))
    for p in problems:
        print(p)
    print(
        f"checked {len(iter_files())} files: "
        f"{len(problems)} problem(s)"
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
