"""Confirm-then-execute file-sync CLI (SURVEY §2 X5 + reference entry flow).

The reference's interactive path (``/root/reference/db-sync-gcp/gcs_sync.py:103-127``)
runs a dry-run first, prints what would be copied, asks ``(y/N)``, and only
then executes. Re-expressed here with the same gate around the engine's
anti-join copy plan:

    python -m database_synchronize_tool_spark.cli SRC DST [--yes] [--dry-run]
        [--compare {name,name_size,hash}]

``--yes`` is the non-interactive flag for automation (cron/CI — the reference
has no equivalent, its scheduled variant simply never asks); ``--dry-run``
stops after the report. The prompt reader is injectable for tests.
"""

from __future__ import annotations

import argparse
from collections.abc import Callable
from typing import Any

CONFIRM_PROMPT = "\nDo you want to proceed with the actual sync? (y/N): "


def sync_with_confirmation(
    spark: Any,
    src_root: str,
    dst_root: str,
    confirm: Callable[[str], str] = input,
    assume_yes: bool = False,
    dry_run: bool = False,
    compare: str = "name",
) -> dict[str, Any]:
    """Dry-run report → confirmation gate → execute (reference parity).

    Returns the stats dict plus ``executed``/``cancelled`` flags. Only an
    explicit ``y``/``Y`` answer proceeds — anything else cancels, matching
    the reference's ``response.lower() == 'y'`` check.
    """
    from database_synchronize_tool_spark.sources.filesync import (
        execute_copy,
        local_copier,
        plan_file_sets,
    )

    # ONE plan serves the report and the execution: the to-copy set is
    # frozen (materialized) unless this is a report-only run, so the user
    # confirms exactly the set that gets copied and hash mode pays its
    # full-content listing once, not twice (round-7 review)
    plan = plan_file_sets(
        spark, src_root, dst_root, compare=compare, freeze=not dry_run
    )
    copier = local_copier(src_root, dst_root)
    stats = dict(execute_copy(plan, copier, dry_run=True))
    if dry_run:
        return {**stats, "executed": False, "cancelled": False}
    if not assume_yes:
        response = confirm(CONFIRM_PROMPT)
        if response.strip().lower() != "y":
            return {**stats, "executed": False, "cancelled": True}
    stats = dict(execute_copy(plan, copier, dry_run=False))
    return {**stats, "executed": True, "cancelled": False}


def main(
    argv: list[str] | None = None,
    spark: Any = None,
    confirm: Callable[[str], str] = input,
) -> int:
    """CLI entry. Exit codes: 0 synced (or clean dry-run), 1 cancelled —
    the reference exits 0 on cancel, but a gated automation step should see
    "did not run" as distinct from "ran"; documented divergence."""
    parser = argparse.ArgumentParser(
        prog="spark-file-sync",
        description="One-way file-set sync: dry-run, confirm, execute.",
    )
    parser.add_argument("source", help="source root (local path or mounted URI)")
    parser.add_argument("dest", help="destination root")
    parser.add_argument(
        "--yes", action="store_true", help="skip the confirmation prompt"
    )
    parser.add_argument(
        "--dry-run", action="store_true", help="report only, never copy"
    )
    parser.add_argument(
        "--compare",
        choices=("name", "name_size", "hash"),
        default="name",
        help="join key for the copy plan (default: name — reference parity)",
    )
    args = parser.parse_args(argv)

    if spark is None:
        from database_synchronize_tool_spark.session import get_spark

        spark = get_spark("file-sync-cli")

    result = sync_with_confirmation(
        spark,
        args.source,
        args.dest,
        confirm=confirm,
        assume_yes=args.yes,
        dry_run=args.dry_run,
        compare=args.compare,
    )
    print(
        f"total={result['total_files']} new={result['new_files']} "
        f"existing={result['existing_files']} "
        + ("executed" if result["executed"] else "cancelled" if result["cancelled"] else "dry-run")
    )
    return 1 if result["cancelled"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
