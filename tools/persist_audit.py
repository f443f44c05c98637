#!/usr/bin/env python3
"""Cache-lifetime audit (round 12, VERDICT r11 Next 6).

The project rule (docs/SCALE.md "Cache lifetime policy"): every
`.persist()` must either

  (a) be `.unpersist()`-ed inside the same function — the persist is
      a function-local intermediate (maintenance jobs, multi-action
      drivers), OR
  (b) carry a `fence` marker in a comment on the persist statement or
      the line directly above/below it — declaring that the RETURNED
      plan references the cached relation (the broadcast-fence rule),
      so cache ownership transfers to the caller and reclamation is
      the session's job (bench.py / check_oracle clearCache between
      queries; per-job sessions exit; long-lived multi-tenant
      sessions must clearCache on their own cadence).

This makes the policy greppable: an unmarked, never-unpersisted
persist is a leak candidate and fails the audit (exit 1). Run next
to plan_audit at round end.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent / "tgres_spark"


def audit_file(path: Path) -> list[str]:
    src = path.read_text()
    lines = src.splitlines()
    tree = ast.parse(src)
    problems = []

    class FnVisitor(ast.NodeVisitor):
        def _check_fn(self, fn):
            persists = []  # (lineno, target_name or None)
            unpersisted = set()
            for node in ast.walk(fn):
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "persist"
                ):
                    persists.append(
                        (node.lineno, getattr(node, "end_lineno", node.lineno))
                    )
                if (
                    isinstance(node, ast.Call)
                    and isinstance(node.func, ast.Attribute)
                    and node.func.attr == "unpersist"
                ):
                    unpersisted.add(True)
            if not persists:
                return
            n_unp = sum(
                1
                for node in ast.walk(fn)
                if isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "unpersist"
            )
            # every persist needs: a same-function unpersist budget OR
            # a fence marker within one line of the persist call
            unmarked = []
            for ln, end in persists:
                window = lines[max(0, ln - 3): min(len(lines), end + 2)]
                if any("fence" in w for w in window):
                    continue
                unmarked.append(ln)
            if len(unmarked) > n_unp:
                for ln in unmarked[n_unp:]:
                    problems.append(
                        f"{path.relative_to(ROOT.parent)}:{ln} "
                        f"in {fn.name}: persist() with no same-function "
                        "unpersist and no fence marker"
                    )

        def visit_FunctionDef(self, fn):
            self._check_fn(fn)
            self.generic_visit(fn)

        visit_AsyncFunctionDef = visit_FunctionDef

    FnVisitor().visit(tree)
    return problems


def main() -> int:
    problems = []
    for path in sorted(ROOT.rglob("*.py")):
        problems.extend(audit_file(path))
    for p in problems:
        print(f"LEAK {p}")
    n_files = len(list(ROOT.rglob("*.py")))
    print(
        f"== audited {n_files} files, "
        f"{len(problems)} unmarked never-unpersisted persists =="
    )
    return 1 if problems else 0


if __name__ == "__main__":
    sys.exit(main())
