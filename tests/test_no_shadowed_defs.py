"""Guard against shadowed module-level definitions.

Round-5 verdict: ``tests/test_plans.py`` defined
``test_bucketed_join_no_exchange`` twice; Python silently keeps the
second binding, so the first test — which carried a (false) plan
assertion — was never collected, and five rounds of green pytest never
noticed. A shadowed test is worse than a missing one: it pins a claim
in prose while asserting nothing.

This is one AST pass over every ``.py`` file in ``tests/`` and the
package: no module-level ``def``/``class``/assignment name may be
bound twice in the same file (the same check as ruff's F811, which is
not installed in this environment). Conditional redefinition — e.g.
an ``except ImportError`` fallback — is exempt because those bindings
live inside ``if``/``try`` blocks, not at module level.
"""

import ast
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
SCAN_DIRS = ("tests", "flink_engagement_pipeline_spark")


def _module_level_bindings(tree: ast.Module) -> list[tuple[str, int]]:
    """(name, lineno) for every module-level def/class/plain-assign
    binding, in source order. Only direct children of the module are
    considered: a def inside ``if TYPE_CHECKING:`` or ``try:`` is a
    deliberate conditional binding, not a shadowing bug."""
    out: list[tuple[str, int]] = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out.append((node.name, node.lineno))
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name):
                    out.append((tgt.id, node.lineno))
        elif isinstance(node, ast.AnnAssign):
            if isinstance(node.target, ast.Name) and node.value is not None:
                out.append((node.target.id, node.lineno))
    return out


def _duplicates(src: str) -> list[tuple[str, int, int]]:
    seen: dict[str, int] = {}
    dups = []
    for name, lineno in _module_level_bindings(ast.parse(src)):
        if name in seen and name != "_":
            dups.append((name, seen[name], lineno))
        seen[name] = lineno
    return dups


def test_detector_catches_the_round5_shape():
    """Seed case: the exact shape the round-5 shadowing had — two
    same-named module-level tests — must be flagged, and legitimate
    conditional fallbacks must not."""
    shadowed = (
        "def test_x(a):\n    assert a\n\n"
        "def helper():\n    pass\n\n"
        "def test_x(a, b):\n    assert a and b\n"
    )
    assert _duplicates(shadowed) == [("test_x", 1, 7)]
    conditional = (
        "try:\n    import numpy\n"
        "    def impl():\n        return 1\n"
        "except ImportError:\n"
        "    def impl():\n        return 0\n"
    )
    assert _duplicates(conditional) == []


def test_no_shadowed_module_level_names():
    offenders = []
    for d in SCAN_DIRS:
        for path in sorted((REPO / d).rglob("*.py")):
            for name, first, second in _duplicates(path.read_text()):
                offenders.append(
                    f"{path.relative_to(REPO)}: '{name}' bound at line "
                    f"{first} is shadowed by line {second}"
                )
    assert not offenders, "\n".join(offenders)
