"""Shared plan-shape checks: the single source of truth for the
"no unbounded global Window" guard used by BOTH the CI pin
(tests/test_plan_shapes.py) and the operator tool
(tools/scan_global_windows.py) — two hand-maintained copies drifted
apart within one round (r10 review), which is exactly how a scale
regression slips past one checker while the other stays green.
"""

from __future__ import annotations

# Streaming replays execute eagerly on build (foreachBatch micro-batch
# drains); they are plan-checked by their own batch-equivalence tests.
# Computed, not hand-typed: bump the stop when tN grows.
STREAMING_PREFIXES: tuple[str, ...] = tuple(f"t{i}_" for i in range(7, 19))


def jchildren(node) -> list:
    """Children of a Catalyst TreeNode via py4j."""
    out = []
    it = node.children().iterator()
    while it.hasNext():
        out.append(it.next())
    return out


def subtree_has_limit(node) -> bool:
    """True if a GlobalLimit/LocalLimit bounds this subtree — a global
    Window above a limit runs over at most k rows and is scale-safe."""
    stack = [node]
    while stack:
        n = stack.pop()
        if n.nodeName() in ("GlobalLimit", "LocalLimit"):
            return True
        stack.extend(jchildren(n))
    return False


def unbounded_global_windows(df) -> int:
    """Count Window nodes in the optimized logical plan with an EMPTY
    partitionSpec whose input is not bounded by a limit below them — the
    Exchange SinglePartition + full-sort scale-killer class (r9 verdict
    #1). The scale-safe replacements live in operators/ranks.py."""
    plan = df._jdf.queryExecution().optimizedPlan()
    n_bad = 0
    stack = [plan]
    while stack:
        n = stack.pop()
        if (
            n.nodeName() == "Window"
            and n.partitionSpec().isEmpty()
            and not subtree_has_limit(n)
        ):
            n_bad += 1
        stack.extend(jchildren(n))
    return n_bad
