"""Structured Streaming surface over the events stream (SURVEY §2.9).

The reference's "stream" is a daily-cron high-watermark batch (T1/T4); its
corrected late-data mode (T3) is exactly Spark's watermark semantics. This
module provides the true streaming forms:

- ``read_events_stream``: file-based streaming source over the events
  parquet layout (same schema as the batch table; at 100 TB this is a Kafka
  or file-arrival stream — the transformations are identical).
- tumbling / sliding window aggregation with ``withWatermark`` so state for
  closed windows is dropped instead of growing unboundedly;
- sessionization via ``session_window`` (gap-based, built-in);
- an incremental-sync stream: the T1 pipeline as a streaming MERGE using
  ``foreachBatch`` (each micro-batch goes through the same merge_upsert the
  batch engine uses — one code path for both).

Tests drive these with ``trigger(availableNow=True)`` + memory sink: the
whole backlog is processed as micro-batches, then the query stops — the
batch/stream parity check (results must equal the batch window queries).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import table_path


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Streaming read of the events table layout.

    Schema comes from the batch catalog (a stream can't infer), including the
    nanos->timestamp_ntz normalization, so stream and batch plans see
    identical columns.
    """
    import os

    # RAW footer schema (ts arrives as nanos->bigint under nanosAsLong), not
    # the converted batch schema — the stream applies the same conversion
    # below, after the scan
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    path = table_path(sf_dir, "events")
    if os.path.isfile(path):
        # the file source monitors a directory; a single-file table layout is
        # streamed by watching its parent with a glob filter
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    raw = reader.format("parquet").load(path)
    # the catalog's shared nanos normalization (one rule for batch AND
    # stream — keeps the parity promise if NANO_TS_COLS ever grows)
    from database_synchronize_tool_spark.catalog import convert_nano_ts

    return convert_nano_ts(raw, "events")


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-event-type counts in tumbling windows; watermark bounds state.

    Works on both a stream (late rows beyond the delay are dropped and their
    windows finalized) and a batch frame (watermark is a no-op) — the parity
    tests rely on that duality.
    """
    src = events
    if events.isStreaming:
        # watermarks require TIMESTAMP (an instant); session tz is pinned UTC
        # so ntz<->instant conversion is lossless and batch/stream agree
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark_delay
        )
    return src.groupBy(
        F.window("ts", window_size).alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        # decimal accumulation: order-insensitive, so micro-batch boundaries
        # (and the DuckDB oracle) can't perturb the double result
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
    ).select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Per-user gap-based sessions (session_window: state merges as events
    arrive; the watermark closes sessions whose gap has definitely elapsed)."""
    src = events
    if events.isStreaming:
        src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
            "ts", watermark_delay
        )
    return src.groupBy(
        F.session_window("ts", gap).alias("s"), "user_id"
    ).agg(F.count("*").alias("n_events")).select(
        F.col("s.start").cast("timestamp_ntz").alias("session_start"),
        F.col("s.end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        "n_events",
    )


def stream_merge_into(
    stream: DataFrame,
    keys: Sequence[str],
    apply_batch: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Streaming upsert: every micro-batch flows through ``apply_batch``
    (typically a closure over merge_upsert + a sink) — the streaming twin of
    the T1 incremental pipeline, with exactly-once bookkeeping from the
    checkpoint instead of the destination-probe watermark."""
    writer = stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Drain a bounded stream into the in-memory sink (test harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _source_signature(src_path: str) -> str:
    """Source-file identity (size + mtime; per-file for directory layouts)
    — part of every staging key so regenerated testdata re-stages instead
    of serving stale replay rows."""
    import os

    try:
        st = os.stat(src_path)
        if os.path.isdir(src_path):
            parts = []
            for root_, _dirs, files in os.walk(src_path):
                for f in sorted(files):
                    fst = os.stat(os.path.join(root_, f))
                    parts.append(f"{f}:{fst.st_size}:{fst.st_mtime_ns}")
            return "dir|" + "|".join(parts)
        return f"{st.st_mtime_ns}|{st.st_size}"
    except OSError:
        return "missing"


def _stage_replay_chunks(spark, key_material: str, build_chunks) -> str:
    """Idempotent, atomic staging of replay chunks shared by every
    multibatch reader (r13 review: the events and embeddings readers each
    carried a verbatim copy of this machinery — one replay-discipline fix
    must not need applying twice). ``build_chunks`` is a CALLABLE
    returning the chunk DataFrames in replay order — invoked only when
    staging is actually needed, so the chunk-boundary Spark job (a
    percentile aggregate) is not re-paid on every already-staged call.
    Each chunk is written as one parquet file with ascending mtimes (the
    file source replays oldest-first). First writer wins the atomic
    rename; a concurrent stager's copy is byte-identical (deterministic
    chunking), so losing the race is harmless. Returns the stage dir."""
    import hashlib
    import os
    import shutil

    key = hashlib.md5(key_material.encode()).hexdigest()[:12]
    stage = os.path.join("/tmp", f"spark_graft_replay_{key}")
    done = os.path.join(stage, "_STAGED")
    if not os.path.exists(done):
        tmp = stage + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(tmp, exist_ok=True)
        for i, chunk in enumerate(build_chunks()):
            path = os.path.join(tmp, f"chunk_{i}")
            chunk.coalesce(1).write.mode("overwrite").parquet(path)
            # one data file per chunk dir; ascending mtimes pin replay order
            for root_, _dirs, files in os.walk(path):
                for f in files:
                    os.utime(
                        os.path.join(root_, f),
                        (1_000_000 + i, 1_000_000 + i),
                    )
        open(os.path.join(tmp, "_STAGED"), "w").write("ok")
        shutil.rmtree(stage, ignore_errors=True)
        try:
            os.rename(tmp, stage)
        except OSError:
            # concurrent stager won the rename; its staged copy is
            # byte-identical (deterministic cuts), use it
            if not os.path.exists(done):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    return stage


def _read_staged_stream(spark: SparkSession, stage: str) -> DataFrame:
    import os

    schema = spark.read.parquet(os.path.join(stage, "chunk_0")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(stage)
    )


def read_events_stream_multibatch(
    spark: SparkSession, sf_dir: str, n_chunks: int = 4
) -> DataFrame:
    """Events stream that REALLY arrives as ``n_chunks`` micro-batches.

    The testdata table is one parquet file, so the plain stream drains in a
    single batch and cross-batch state carry is only unit-tested. This
    helper splits the table into ``n_chunks`` time-ordered files under a
    deterministic /tmp staging dir (chunk i = rows in the i-th ts range,
    file mtimes ascending so the file source replays them oldest-first)
    and reads them back with ``maxFilesPerTrigger=1`` — availableNow then
    processes one file per micro-batch, so a stateful operator must carry
    state across batches to answer correctly and the DRIVER's oracle
    comparison attests it, not just the unit suite.

    Staging is idempotent per (sf_dir, n_chunks): re-runs reuse the files
    (atomic rename on first write). Chunk boundaries are percentiles of
    event time, i.e. arrival order == event-time order, the realistic
    replay of an append-only log.
    """
    import os

    from pyspark.sql import functions as F

    from database_synchronize_tool_spark.catalog import load_table

    sig = _source_signature(table_path(sf_dir, "events"))

    def build_chunks():
        batch = load_table(spark, sf_dir, "events")
        # percentile split on event time: equal-ish rows, time-ordered
        qs = [i / n_chunks for i in range(1, n_chunks)]
        cuts = batch.select(
            F.expr(
                "percentile(unix_micros(cast(ts as timestamp)), array("
                + ", ".join(str(q) for q in qs)
                + "))"
            ).alias("c")
        ).collect()[0]["c"]
        bounds = [float("-inf"), *cuts, float("inf")]
        us = F.unix_micros(F.col("ts").cast("timestamp"))
        chunks = []
        for i in range(n_chunks):
            lo, hi = bounds[i], bounds[i + 1]
            # chunk 0 also takes NULL-ts rows explicitly: us(NULL) makes
            # every range predicate NULL, which would silently drop them
            # from all chunks and diverge the replay from the batch reader
            lo_pred = F.lit(True) if lo == float("-inf") else us > F.lit(lo)
            hi_pred = F.lit(True) if hi == float("inf") else us <= F.lit(hi)
            pred = lo_pred & hi_pred
            if i == 0:
                pred = F.col("ts").isNull() | pred
            chunks.append(batch.filter(pred))
        return chunks

    stage = _stage_replay_chunks(
        spark, f"{os.path.abspath(sf_dir)}|{n_chunks}|{sig}", build_chunks
    )
    return _read_staged_stream(spark, stage)


def read_embeddings_stream_multibatch(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 3,
    mod: int = 3,
    rem: int = 2,
) -> DataFrame:
    """Embedding-vector stream that REALLY arrives as ``n_chunks``
    micro-batches — the ingest side of streaming ANN-index maintenance
    (t19). Stages the append subset (``vec_id % mod == rem`` — the slice
    t19's base index deliberately excludes) as ``n_chunks`` vec_id-ordered
    parquet files with ascending mtimes and replays them with
    ``maxFilesPerTrigger=1``, exactly the
    :func:`read_events_stream_multibatch` discipline: availableNow then
    processes one file per micro-batch, so the index-append foreachBatch
    runs once per chunk and cross-batch correctness is attested by the
    driver's oracle comparison, not just the unit suite.

    Staging is idempotent per (sf_dir, n_chunks, mod, rem, source file
    signature) — atomic rename on first write, reused afterwards."""
    import os

    from database_synchronize_tool_spark.catalog import load_table

    sig = _source_signature(table_path(sf_dir, "embeddings"))

    def build_chunks():
        batch = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") % mod == rem
        )
        qs = [i / n_chunks for i in range(1, n_chunks)]
        cuts = batch.select(
            F.expr(
                "percentile(vec_id, array("
                + ", ".join(str(q) for q in qs)
                + "))"
            ).alias("c")
        ).collect()[0]["c"]
        bounds = [float("-inf"), *cuts, float("inf")]
        vid = F.col("vec_id")
        chunks = []
        for i in range(n_chunks):
            lo, hi = bounds[i], bounds[i + 1]
            lo_pred = F.lit(True) if lo == float("-inf") else vid > F.lit(lo)
            hi_pred = F.lit(True) if hi == float("inf") else vid <= F.lit(hi)
            chunks.append(batch.filter(lo_pred & hi_pred))
        return chunks

    stage = _stage_replay_chunks(
        spark,
        f"emb|{os.path.abspath(sf_dir)}|{n_chunks}|{mod}|{rem}|{sig}",
        build_chunks,
    )
    return _read_staged_stream(spark, stage)
