"""Reference-compatible sync configuration (SURVEY §2.1 S9/S10).

Parses the same YAML shape the reference uses
(``/root/reference/db-sync-local/netflix.yaml:1-7``)::

    tables:
      <table_name>:
        sync_config:
          check_column: <col>
          check_type: timestamp | id
          ignore_columns: [<col>, ...]

The GCP variant merges several such files and tags each table with a
``service`` derived from the file stem (``gcp_sync_utils.py:6-28``); we do the
same. Config is driver-side only — it never touches the data plane.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

try:
    import yaml
except ImportError:  # pragma: no cover - baked into the image, but gated
    yaml = None


@dataclass(frozen=True)
class SyncConfig:
    """Per-table sync settings."""

    table: str
    check_column: str
    check_type: str  # 'timestamp' | 'id'
    ignore_columns: tuple[str, ...] = ()
    service: str | None = None
    # engine extensions (absent from the reference):
    merge_keys: tuple[str, ...] = ()  # explicit > discovered PKs
    parity: bool = True  # strict-> watermark (reference T3) vs corrected mode

    def __post_init__(self) -> None:
        if self.check_type not in ("timestamp", "id"):
            raise ValueError(
                f"{self.table}: check_type must be 'timestamp' or 'id', "
                f"got {self.check_type!r}"
            )


def _parse_one(path: str, service: str | None) -> dict[str, SyncConfig]:
    if yaml is None:
        raise RuntimeError("pyyaml is required for YAML sync configs")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    out: dict[str, SyncConfig] = {}
    for name, body in (raw.get("tables") or {}).items():
        sc = (body or {}).get("sync_config") or {}
        out[name] = SyncConfig(
            table=name,
            check_column=sc["check_column"],
            check_type=sc.get("check_type", "timestamp"),
            ignore_columns=tuple(sc.get("ignore_columns") or ()),
            service=service,
            merge_keys=tuple(sc.get("merge_keys") or ()),
            parity=bool(sc.get("parity", True)),
        )
    return out


def load_table_config(*paths: str) -> dict[str, SyncConfig]:
    """Load and merge one or more YAML files. With several files, each
    table is tagged with its file's stem as ``service`` (GCP-variant
    behavior); a single file leaves ``service`` None (local variant)."""
    merged: dict[str, SyncConfig] = {}
    multi = len(paths) > 1
    for p in paths:
        service = os.path.splitext(os.path.basename(p))[0] if multi else None
        for name, cfg in _parse_one(p, service).items():
            if name in merged:
                raise ValueError(f"table {name!r} configured twice")
            merged[name] = cfg
    return merged
