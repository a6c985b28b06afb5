"""S10 secret/env config source + its runner wiring (SURVEY §2.1 S10, §2.11).

Mirrors the reference's service/bucket matrix
(``/root/reference/db-sync-gcp/gcp_utils.py:15-71`` secret parsing,
``gcp_main.py:12-23`` gap-terminated bucket numbering): multi-service
secrets, services without a ``db`` block skipped, prod/stage keyed
``{service}_{env}``, and the end-to-end path from ``DB_SECRET_INFO`` to a
running sync (parquet source/sink substituted — no Postgres in the sandbox).
"""

from __future__ import annotations

import os

import pytest

from database_synchronize_tool_spark.runner import (
    plan_secret_syncs,
    run_secret_syncs,
)
from database_synchronize_tool_spark.sources.config import (
    discover_bucket_pairs,
    parse_db_secret_info,
)

SECRET_YAML = """
inventory:
  table_config: {inv_cfg}
  db:
    prod:
      instance-connection-name: proj:region:inv-prod
      database-name: inv
      username: u1
      password: p1
    stage:
      instance-connection-name: proj:region:inv-stage
      database-name: inv_stage
      username: u2
      password: p2
merchant:
  db:
    prod:
      instance-connection-name: proj:region:mer-prod
      database-name: mer
      username: u3
      password: p3
monitoring:
  alerts: true
"""


def env_with_secret(**extra: str) -> dict[str, str]:
    return {"DB_SECRET_INFO": SECRET_YAML.format(inv_cfg="/tmp/inv.yaml"), **extra}


# --- parse_db_secret_info ---------------------------------------------------


def test_multi_service_secret_parses():
    conns, table_cfg = parse_db_secret_info(env_with_secret())
    # inventory has both ends; merchant only prod; monitoring has no db block
    assert set(conns) == {"inventory_prod", "inventory_stage", "merchant_prod"}
    c = conns["inventory_prod"]
    assert c.service == "inventory" and c.env == "prod"
    assert c.instance_connection_name == "proj:region:inv-prod"
    assert c.database_name == "inv" and c.username == "u1" and c.password == "p1"
    assert table_cfg == {"inventory": "/tmp/inv.yaml"}


def test_missing_db_block_service_skipped():
    conns, _ = parse_db_secret_info(env_with_secret())
    assert not any(k.startswith("monitoring") for k in conns)


def test_unset_variable_raises():
    with pytest.raises(ValueError, match="DB_SECRET_INFO"):
        parse_db_secret_info({})


def test_non_mapping_yaml_raises():
    with pytest.raises(ValueError, match="mapping"):
        parse_db_secret_info({"DB_SECRET_INFO": "- just\n- a list\n"})


def test_jdbc_options_shape():
    conns, _ = parse_db_secret_info(env_with_secret())
    opts = conns["inventory_stage"].jdbc_options()
    assert opts["url"] == "jdbc:postgresql://127.0.0.1:5432/inv_stage"
    assert opts["user"] == "u2" and opts["password"] == "p2"
    assert opts["driver"] == "org.postgresql.Driver"


# --- discover_bucket_pairs --------------------------------------------------


def test_bucket_pairs_numbered():
    env = {
        "SOURCE_GCS_BUCKET_1": "s1",
        "DEST_GCS_BUCKET_1": "d1",
        "SOURCE_GCS_BUCKET_2": "s2",
        "DEST_GCS_BUCKET_2": "d2",
    }
    assert discover_bucket_pairs(env) == [("s1", "d1"), ("s2", "d2")]


def test_bucket_pairs_gap_terminates():
    # index 3 missing one side -> 4 ignored even though fully set (reference
    # while-loop semantics, gcp_main.py:12-23)
    env = {
        "SOURCE_GCS_BUCKET_1": "s1",
        "DEST_GCS_BUCKET_1": "d1",
        "SOURCE_GCS_BUCKET_2": "s2",
        "DEST_GCS_BUCKET_2": "d2",
        "SOURCE_GCS_BUCKET_3": "s3",
        "SOURCE_GCS_BUCKET_4": "s4",
        "DEST_GCS_BUCKET_4": "d4",
    }
    assert discover_bucket_pairs(env) == [("s1", "d1"), ("s2", "d2")]


def test_bucket_pairs_empty_value_terminates():
    env = {"SOURCE_GCS_BUCKET_1": "", "DEST_GCS_BUCKET_1": "d1"}
    assert discover_bucket_pairs(env) == []


def test_bucket_pairs_nothing_configured():
    assert discover_bucket_pairs({}) == []


# --- runner wiring ----------------------------------------------------------


TABLE_YAML = """
tables:
  items:
    sync_config:
      check_column: item_id
      check_type: id
      merge_keys: [item_id]
"""


def test_plan_secret_syncs_builds_jdbc_pairs(tmp_path):
    cfg_path = str(tmp_path / "inventory.yaml")
    with open(cfg_path, "w") as f:
        f.write(TABLE_YAML)
    env = {"DB_SECRET_INFO": SECRET_YAML.format(inv_cfg=cfg_path)}
    plans = plan_secret_syncs(env)
    # merchant is prod-only -> skipped; only inventory has both ends
    assert [p.service for p in plans] == ["inventory"]
    plan = plans[0]
    assert plan.prod.url == "jdbc:postgresql://127.0.0.1:5432/inv"
    assert plan.stage.url == "jdbc:postgresql://127.0.0.1:5432/inv_stage"
    assert plan.prod.user == "u1" and plan.stage.user == "u2"
    assert set(plan.configs) == {"items"}
    cfg = plan.configs["items"]
    assert cfg.service == "inventory"  # tagged for C2 grouping
    assert cfg.check_column == "item_id" and cfg.merge_keys == ("item_id",)


def test_run_secret_syncs_end_to_end(spark, tmp_path):
    # full S10 path with parquet stand-ins for the JDBC endpoints: secret ->
    # service plan -> watermark sync -> upserted rows in the stage sink
    from database_synchronize_tool_spark.sources.readers import ParquetSource
    from database_synchronize_tool_spark.sources.sinks import ParquetMergeSink

    cfg_path = str(tmp_path / "inventory.yaml")
    with open(cfg_path, "w") as f:
        f.write(TABLE_YAML)
    src_root, dst_root = str(tmp_path / "prod"), str(tmp_path / "stage")
    os.makedirs(dst_root)
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "item_id int, val string"
    ).write.parquet(os.path.join(src_root, "items.parquet"))

    env = {"DB_SECRET_INFO": SECRET_YAML.format(inv_cfg=cfg_path)}
    results = run_secret_syncs(
        spark,
        env,
        source_for=lambda plan: ParquetSource(src_root),
        sink_for=lambda plan: ParquetMergeSink(dst_root),
    )
    assert [(r.table, r.ok, r.rows_synced) for r in results] == [("items", True, 3)]
    synced = spark.read.parquet(os.path.join(dst_root, "items.parquet"))
    assert sorted(r["item_id"] for r in synced.collect()) == [1, 2, 3]

    # idempotent second run: watermark 3 -> empty delta, sink untouched
    results2 = run_secret_syncs(
        spark,
        env,
        source_for=lambda plan: ParquetSource(src_root),
        sink_for=lambda plan: ParquetMergeSink(dst_root),
    )
    assert [(r.table, r.ok, r.rows_synced) for r in results2] == [("items", True, 0)]


def test_run_secret_syncs_requires_sink_factory(spark):
    # a stage-side sink can't be derived from the secret alone: omitting
    # sink_for must fail loudly, not crash with NoneType-not-callable
    import pytest as _pytest

    with _pytest.raises(ValueError, match="sink_for is required"):
        run_secret_syncs(spark, {"DB_SECRET_INFO": "{}"})
