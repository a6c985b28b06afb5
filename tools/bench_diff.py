"""Per-query bench regression diff: r(N) vs r(N-1), so swing flags no
longer depend on the driver's truncated stdout tail (r9 verdict #8).

Usage:
    python tools/bench_diff.py [old.json new.json]
Defaults to the two newest ``bench_artifacts/BENCH_LOCAL_r*.json``.
Prints queries whose time moved >30% AND >50 ms, sorted by |swing|,
plus totals; exits 0 always (informational).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict:
    return json.load(open(path))


def main() -> int:
    if len(sys.argv) >= 3:
        old_p, new_p = sys.argv[1], sys.argv[2]
    else:
        arts = sorted(
            glob.glob(os.path.join(REPO, "bench_artifacts", "BENCH_LOCAL_r*.json"))
        )
        if len(arts) < 2:
            print("need two bench artifacts to diff", file=sys.stderr)
            return 0
        old_p, new_p = arts[-2], arts[-1]
    old, new = _load(old_p), _load(new_p)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"old: {os.path.basename(old_p)} total={old.get('value')}s "
          f"ratio={old.get('ratio_vs_oracle')}")
    print(f"new: {os.path.basename(new_p)} total={new.get('value')}s "
          f"ratio={new.get('ratio_vs_oracle')}")
    rows = []
    for name in sorted(set(oq) | set(nq)):
        a, b = oq.get(name), nq.get(name)
        if a is None or b is None:
            rows.append((float("inf"), name, a, b, "added" if a is None else "removed"))
            continue
        if b > a * 1.3 + 0.0 and b - a > 0.05:
            rows.append((b / max(a, 1e-6), name, a, b, "slower"))
        elif a > b * 1.3 and a - b > 0.05:
            rows.append((a / max(b, 1e-6), name, a, b, "faster"))
    if not rows:
        print("no per-query swings >30% and >50ms")
        return 0
    rows.sort(reverse=True)
    print(f"{'query':<40} {'old_s':>8} {'new_s':>8}  change")
    for ratio, name, a, b, tag in rows:
        a_s = "-" if a is None else f"{a:.3f}"
        b_s = "-" if b is None else f"{b:.3f}"
        x = "" if tag in ("added", "removed") else f" ({ratio:.1f}x)"
        print(f"{name:<40} {a_s:>8} {b_s:>8}  {tag}{x}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
