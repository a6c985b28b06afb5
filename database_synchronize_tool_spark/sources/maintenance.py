"""Parquet layout maintenance: small-file compaction (OPTIMIZE-style).

Long-running ingestion (streaming sinks, per-batch upserts, the curated
writer under a small trigger interval) accretes many small files; at
100 TB the cost is real — every reader pays one footer fetch + one task
per file, and the NameNode/object-store listing becomes the bottleneck
before the data does. The fix is the standard bin-packing rewrite:

- ``plan_compaction``: list leaf files per partition directory, report
  which directories are fragmented (more files than
  ``ceil(bytes/target)``). Metadata only — safe to run anywhere, the
  dry-run contract every destructive repo op follows
  (``plan_copy``/X5 precedent).
- ``compact_parquet_dir``: rewrite ONLY the fragmented directories, each
  independently ``repartition(ceil(bytes/target))`` — compaction is
  per-directory, so there is never a global shuffle and partition dirs
  keep their pruning layout. The rewrite goes to a sibling temp dir
  first and swaps in via rename, so a crash mid-compaction leaves the
  original directory untouched (the swap is the only non-atomic window,
  and it is rename-sized).

The row-for-row identity of the rewrite is pinned by test (count and
content hash), as is the file-count reduction.
"""

from __future__ import annotations

import math
import os
import re
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class CompactionPlan:
    root: str
    target_bytes: int
    # directory (relative to root, "" = unpartitioned root) ->
    # (n_files, total_bytes, ideal_files)
    dirs: dict[str, tuple[int, int, int]]

    @property
    def fragmented(self) -> dict[str, tuple[int, int, int]]:
        return {
            d: stats for d, stats in self.dirs.items() if stats[0] > stats[2]
        }


def _leaf_parquet_dirs(root: str) -> dict[str, list[tuple[str, int]]]:
    """Map each directory under root that directly holds parquet files to
    its [(file, bytes)] list. Hidden/metadata files are ignored."""
    out: dict[str, list[tuple[str, int]]] = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        files = [
            f
            for f in filenames
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        ]
        if files:
            rel = os.path.relpath(dirpath, root)
            rel = "" if rel == "." else rel
            out[rel] = [
                (f, os.path.getsize(os.path.join(dirpath, f))) for f in files
            ]
    return out


def plan_compaction(
    root: str, target_bytes: int = 128 << 20
) -> CompactionPlan:
    """Dry-run: which directories need a rewrite, and to how many files."""
    dirs = {}
    for rel, files in _leaf_parquet_dirs(root).items():
        total = sum(sz for _, sz in files)
        ideal = max(1, math.ceil(total / target_bytes))
        dirs[rel] = (len(files), total, ideal)
    return CompactionPlan(root=root, target_bytes=target_bytes, dirs=dirs)


def compact_parquet_dir(
    spark: SparkSession,
    root: str,
    target_bytes: int = 128 << 20,
) -> dict[str, tuple[int, int]]:
    """Rewrite every fragmented leaf directory down to its ideal file
    count. Returns {dir: (files_before, files_after)} for the rewritten
    directories only. Per-directory read→repartition(n)→write: no global
    shuffle, partition-pruning layout preserved, temp-dir + rename swap.
    """
    plan = plan_compaction(root, target_bytes)
    done: dict[str, tuple[int, int]] = {}
    for rel, (n_files, _total, ideal) in plan.fragmented.items():
        src = os.path.join(root, rel) if rel else root
        if rel == "" and len(plan.dirs) > 1:
            # root-level files alongside partition dirs would double-read
            # through the partitioned reader; not a layout this engine
            # writes — skip rather than guess.
            continue
        tmp = f"{src}__compact_{uuid.uuid4().hex[:8]}"
        (
            spark.read.parquet(src)
            .repartition(ideal)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        old = f"{src}__old_{uuid.uuid4().hex[:8]}"
        os.rename(src, old)
        os.rename(tmp, src)
        shutil.rmtree(old)
        after = len(_leaf_parquet_dirs(src).get("", []))
        done[rel] = (n_files, after)
    return done


# --- vacuum: stale-artifact garbage collection ------------------------------

# Artifacts a crashed maintenance/write run can leave behind (and that no
# reader ever references): the compaction temp/old swap directories above,
# and Spark's own in-flight staging dirs. The match is anchored to the
# EXACT generated-name shape — pattern + 8-hex uuid suffix at end of name
# (r9 advice, maintenance.py:169): a bare substring test would rmtree a
# legitimate data directory or partition value that merely contains
# "__old_" (e.g. cell=x__old_v2).
_VACUUM_RE = re.compile(r"(__compact_|__old_)[0-9a-f]{8}$")
_VACUUM_DIRNAMES = ("_temporary",)


@dataclass(frozen=True)
class VacuumPlan:
    root: str
    min_age_s: float
    # absolute path -> (bytes, age_seconds)
    targets: dict[str, tuple[int, float]]

    @property
    def reclaimable_bytes(self) -> int:
        return sum(b for b, _ in self.targets.values())


def _tree_bytes(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def plan_vacuum(
    root: str, min_age_s: float = 24 * 3600.0, *, _now: float | None = None
) -> VacuumPlan:
    """Dry-run VACUUM (Delta-style retention semantics): find directories
    under ``root`` that only a crashed run could have left — compaction
    swap dirs (``*__compact_*``/``*__old_*``) and Spark ``_temporary``
    staging — and that are OLDER than ``min_age_s``. The age gate is the
    crash-safety contract: a live job's in-flight temp dir is always
    younger than the retention window, so vacuum can run concurrently
    with writers (the same reasoning as Delta's
    ``retentionDurationCheck``). Metadata-only; nothing is deleted.
    """
    import time

    now = time.time() if _now is None else _now
    targets: dict[str, tuple[int, float]] = {}
    for dirpath, dirnames, _filenames in os.walk(root):
        for d in list(dirnames):
            full = os.path.join(dirpath, d)
            stale = bool(_VACUUM_RE.search(d)) or d in _VACUUM_DIRNAMES
            if not stale:
                continue
            try:
                age = now - os.path.getmtime(full)
            except OSError:
                continue
            if age >= min_age_s:
                targets[full] = (_tree_bytes(full), age)
            dirnames.remove(d)  # never descend into a target
    return VacuumPlan(root=root, min_age_s=min_age_s, targets=targets)


def vacuum_dir(
    root: str, min_age_s: float = 24 * 3600.0, *, _now: float | None = None
) -> dict[str, int]:
    """Execute the vacuum plan: delete every stale artifact directory the
    dry-run identifies. Returns {path: bytes_reclaimed}. Deletion is
    per-directory ``rmtree`` — data directories are NEVER candidates
    (only the crash-artifact patterns above), so the worst failure mode
    is an artifact surviving until the next run.
    """
    plan = plan_vacuum(root, min_age_s, _now=_now)
    done: dict[str, int] = {}
    for path, (nbytes, _age) in plan.targets.items():
        shutil.rmtree(path, ignore_errors=True)
        if not os.path.exists(path):
            done[path] = nbytes
    return done
