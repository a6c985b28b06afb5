"""Merge an sf1 bench run with the round's sf0.1 artifact into
BENCH_LOCAL_r{N}_sf1.json, adding a per-query scaling column (r10
verdict item #3: the headline set was attested only at sf0.1).

scaling = t_sf1 / t_sf0.1 over 10x the data — linear-cost queries land
near 10, sub-linear below; anything far above 10 is a super-linear
suspect to fix or explain.

Usage: python tools/bench_scale_merge.py <sf1.json> <sf01.json> <out.json>
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    sf1_path, sf01_path, out_path = sys.argv[1:4]
    sf1 = json.load(open(sf1_path))
    sf01 = json.load(open(sf01_path))
    base = {**sf01.get("queries", {}), **sf01.get("unpaired_queries", {})}
    merged = {}
    suspects = {}
    for name, t1 in {
        **sf1.get("queries", {}),
        **sf1.get("unpaired_queries", {}),
    }.items():
        t0 = base.get(name)
        scaling = round(t1 / t0, 2) if t0 else None
        merged[name] = {"sf0.1_sec": t0, "sf1_sec": t1, "scaling_10x": scaling}
        # sub-second sf0.1 baselines make the ratio jumpy (fixed overheads
        # shrink relatively at sf1); flag only where real work scales badly
        if scaling is not None and scaling > 12 and t1 > 2.0:
            suspects[name] = merged[name]
    out = {
        "metric": "headline_queries_total_time_sf1",
        "value": sf1.get("value"),
        "unit": "sec",
        "sf": 1.0,
        "sf_dir_note": "deterministic sf1-equivalent corpus "
        "(.scaledata/sf1, tools/scale_probe.py cipher/rotation replicas; "
        "replica 0 byte-identical to sf0.1)",
        "oracle_total_sec": sf1.get("oracle_total_sec"),
        "ratio_vs_oracle": sf1.get("ratio_vs_oracle"),
        "oracle_queries": sf1.get("oracle_queries"),
        "small_sf_paired": sf1.get("small_sf_paired"),
        "queries": merged,
        "superlinear_suspects": suspects,
        "suspect_rule": "scaling_10x > 12 AND sf1 > 2 s (sub-second sf0.1 "
        "baselines are overhead-dominated, so their ratios are not "
        "cost-curve evidence)",
        "methodology": sf1.get("methodology"),
    }
    json.dump(out, open(out_path, "w"), indent=1)
    print(
        f"total {out['value']} s, ratio {out['ratio_vs_oracle']}, "
        f"{len(suspects)} super-linear suspects"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
