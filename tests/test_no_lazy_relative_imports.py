"""Footgun lint (VERDICT r3 item #8): NO lazy relative imports inside
WORKER-SHIPPED function bodies under lauchy_ray/.

Why a test: closures passed to map_batches / map_groups and methods of
actor-pool classes are pickled by value and re-execute their body
imports ON THE WORKER, where the package is not on sys.path when the
driver runs from a foreign cwd — so `from .x import y` there raises
ModuleNotFoundError only in the driver's environment, never under
pytest from /root/repo. This recurred twice (r2 `cross_source_dups`,
fixed in d8aad3e) even after being documented; a lint in CI is the
only durable fix.

Scope: the lint flags relative imports inside (a) NESTED functions —
the shape that gets captured into worker closures — and (b) methods of
any class. Module-top-level functions run on the driver (queries()
entries, stage builders), where a lazy relative import is safe and
deliberately used to break import cycles; if such a function binds the
import into a nested worker fn, the nested fn carries it as a closure
CELL (already resolved), which is fine.
"""

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parent.parent / "lauchy_ray"

FN = (ast.FunctionDef, ast.AsyncFunctionDef)


def _violations(tree: ast.AST, fname: str) -> list[str]:
    out = []

    def scan_fn(node, depth, in_class):
        nested = depth > 0 or in_class
        for stmt in ast.iter_child_nodes(node):
            if isinstance(stmt, FN):
                scan_fn(stmt, depth + 1, in_class=False)
            elif isinstance(stmt, ast.ClassDef):
                walk_class(stmt)
            elif nested:
                for inner in ast.walk(stmt):
                    if (isinstance(inner, ast.ImportFrom)
                            and inner.level >= 1):
                        out.append(
                            f"{fname}:{inner.lineno} lazy relative "
                            f"import inside nested/method "
                            f"{node.name}()")

    def walk_class(cnode):
        for stmt in ast.iter_child_nodes(cnode):
            if isinstance(stmt, FN):
                scan_fn(stmt, 0, in_class=True)
            elif isinstance(stmt, ast.ClassDef):
                walk_class(stmt)

    for stmt in ast.iter_child_nodes(tree):
        if isinstance(stmt, FN):
            scan_fn(stmt, 0, in_class=False)
        elif isinstance(stmt, ast.ClassDef):
            walk_class(stmt)
    return out


def test_detector_catches_seeded_violation():
    bad = ("def q():\n"
           "    def fold(b):\n"
           "        from .mod import thing\n"   # worker-shipped closure
           "        return thing(b)\n"
           "    return fold\n")
    assert _violations(ast.parse(bad), "<seed>") == [
        "<seed>:3 lazy relative import inside nested/method fold()"]
    bad_method = ("class Actor:\n"
                  "    def __call__(self, b):\n"
                  "        from .mod import thing\n"
                  "        return thing(b)\n")
    assert _violations(ast.parse(bad_method), "<seed>") == [
        "<seed>:3 lazy relative import inside nested/method __call__()"]
    ok = ("from .mod import thing\n"
          "def q():\n"
          "    from .other import stage\n"      # driver-level: safe
          "    def fold(b):\n"
          "        import os\n"                 # absolute lazy: safe
          "        return stage(b)\n"           # closure cell: safe
          "    return fold\n")
    assert _violations(ast.parse(ok), "<seed>") == []


def test_no_lazy_relative_imports_in_package():
    found = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text(), filename=str(path))
        found.extend(_violations(tree, str(path.relative_to(PKG.parent))))
    assert not found, "\n".join(found)
