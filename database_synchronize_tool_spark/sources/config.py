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


@dataclass(frozen=True)
class ConnectionConfig:
    """Per-service, per-environment database connection parameters (S10).

    Mirrors the reference's secret shape (``db-sync-gcp/gcp_utils.py:15-71``):
    the ``DB_SECRET_INFO`` env var holds YAML keyed by service, each with a
    ``db:`` block containing ``prod`` / ``stage`` connection entries.
    """

    service: str
    env: str  # 'prod' | 'stage'
    instance_connection_name: str
    database_name: str
    username: str
    password: str

    @property
    def key(self) -> str:
        return f"{self.service}_{self.env}"

    def jdbc_options(self, host: str = "127.0.0.1", port: int = 5432) -> dict[str, str]:
        """Spark JDBC reader options for this connection. The reference dials
        through the Cloud SQL connector; on Spark the same parameters feed
        ``spark.read.format('jdbc')`` against the instance's SQL endpoint
        (or a Cloud SQL auth proxy listening on ``host:port``)."""
        return {
            "url": f"jdbc:postgresql://{host}:{port}/{self.database_name}",
            "user": self.username,
            "password": self.password,
            "driver": "org.postgresql.Driver",
        }


def parse_db_secret_info(
    environ: dict[str, str] | None = None, var: str = "DB_SECRET_INFO"
) -> tuple[dict[str, ConnectionConfig], dict[str, str]]:
    """Parse the ``DB_SECRET_INFO`` env-YAML into per-service connections.

    Returns ``(connections, table_config)`` with the reference's exact
    semantics (``gcp_utils.py:15-71``): connections keyed ``{service}_prod``
    / ``{service}_stage``; services without a ``db`` block are skipped;
    each service's ``table_config`` path (its per-table YAML) is collected
    separately. Raises if the variable is unset or not valid YAML.
    """
    if yaml is None:
        raise RuntimeError("pyyaml is required for DB_SECRET_INFO parsing")
    env = os.environ if environ is None else environ
    raw = env.get(var)
    if not raw:
        raise ValueError(f"{var} environment variable is not set")
    config = yaml.safe_load(raw)
    if not isinstance(config, dict):
        raise ValueError(f"{var} must be a YAML mapping of services")
    connections: dict[str, ConnectionConfig] = {}
    table_config: dict[str, str] = {}
    for service, service_config in config.items():
        if not isinstance(service_config, dict) or "db" not in service_config:
            continue
        if "table_config" in service_config:
            table_config[service] = service_config["table_config"]
        db = service_config["db"]
        for envname in ("prod", "stage"):
            if envname not in db:
                continue
            entry = db[envname]
            conn = ConnectionConfig(
                service=service,
                env=envname,
                instance_connection_name=entry["instance-connection-name"],
                database_name=entry["database-name"],
                username=entry["username"],
                password=entry["password"],
            )
            connections[conn.key] = conn
    return connections, table_config


def discover_bucket_pairs(
    environ: dict[str, str] | None = None,
    source_prefix: str = "SOURCE_GCS_BUCKET_",
    dest_prefix: str = "DEST_GCS_BUCKET_",
) -> list[tuple[str, str]]:
    """Numbered bucket-pair discovery from the environment.

    Reference semantics (``gcp_main.py:12-23``): read ``SOURCE_GCS_BUCKET_1``
    / ``DEST_GCS_BUCKET_1``, ``..._2``, ... and stop at the FIRST index where
    either side is missing or empty (later indices are ignored — gaps
    terminate, they don't skip). Returns ``[(source, dest), ...]``; empty
    list when nothing is configured.
    """
    env = os.environ if environ is None else environ
    pairs: list[tuple[str, str]] = []
    i = 1
    while True:
        source = env.get(f"{source_prefix}{i}")
        dest = env.get(f"{dest_prefix}{i}")
        if not source or not dest:
            break
        pairs.append((source, dest))
        i += 1
    return pairs


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
