"""Scale-safe global ranking primitives.

A ``Window.orderBy(...)`` with no ``partitionBy`` forces every row through
ONE task (Spark plans ``Exchange SinglePartition`` + a single sort) — fine
at sf0.1, fatal at 100 TB. These helpers provide the two shapes that
replace it everywhere in the declared-query surface:

- :func:`topk_ranked` — global top-k with a rank column: ``orderBy().limit(k)``
  (TakeOrderedAndProject: per-partition heaps, driver merge of k rows) and a
  rank window over the ≤k-row result only.
- :func:`global_row_numbers` — exact global 1-based row numbers over a
  UNIQUE total order via range repartitioning: rows range-partition on the
  sort key (each partition holds a contiguous key range), row-number
  LOCALLY per partition, then add each partition's global offset (the row
  counts of earlier partitions — an ``n_parts``-row broadcast computed
  WITHOUT any window). Parallelism is ``n_parts`` regardless of data
  volume; no single-partition sort anywhere. The same discipline as
  ``plans.approx._doubled_avg_ranks`` (which additionally handles ties —
  here the caller guarantees a unique tiebreak column, so rank ==
  row_number and no tie handling is needed).

Reference parity note: the reference engine has no global-ranking
operator at all (its analytics are psycopg2 round-trips); these exist for
the SURVEY north-star extensions (BM25/RRF retrieval, calibration,
Gini/Lorenz, zone-map layout grading) where the naive Spark expression is
a known scale-killer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_ranked(
    df: DataFrame,
    k: int,
    order_cols: list[Column],
    rank_alias: str = "rank",
) -> DataFrame:
    """Global top-``k`` of ``df`` under ``order_cols`` with a 1-based rank.

    ``orderBy(*order_cols).limit(k)`` plans as TakeOrderedAndProject —
    each partition keeps a k-row heap, the driver merges k·n_parts rows —
    then the rank window runs over the ≤k surviving rows only (bounded by
    construction; the plan-shape sweep in tests/test_plan_shapes.py
    recognizes a global Window above a limit as safe). ``order_cols``
    must include a unique tiebreak so the k-row cut is deterministic.
    """
    top = df.orderBy(*order_cols).limit(k)
    w = Window.orderBy(*order_cols)
    return top.withColumn(rank_alias, F.row_number().over(w))


def global_row_numbers(
    df: DataFrame,
    order_cols: list[Column],
    alias: str = "rn",
    n_parts: int = 32,
) -> DataFrame:
    """Append exact global 1-based row numbers over the UNIQUE total order
    ``order_cols`` without a single-partition sort.

    Range-repartition on the sort order (partition p's keys all precede
    partition p+1's), tag rows with their partition id, row-number locally
    per partition, and add the partition's offset — the summed row counts
    of earlier partitions, an ``n_parts``-row table computed via a tiny
    inequality self-join (NO window, so the plan contains zero global
    Window nodes). The one materialization (scoped_persist) pins a single
    consistent partitioning for both the count pass and the rank pass.

    ``order_cols`` MUST be a unique total order (include a key tiebreak):
    range partitioning never splits equal keys, but uniqueness is what
    makes local row_number + offset equal the global row_number.

    The local pass is sortWithinPartitions + the documented
    ``monotonically_increasing_id`` packing (partition id in the upper 31
    bits, the in-partition record index in the lower 33 — assigned in
    post-sort iteration order), NOT a ``Window.partitionBy(__pid)``: the
    planner cannot see that range partitions already colocate each
    ``__pid``, so the window form inserts a SECOND full Exchange
    hashpartitioning(__pid) on top of the range exchange (r10 review,
    verified in the executed plan — 2x shuffle volume for the primitive
    built to save shuffles). With mii the whole table shuffles exactly
    once; the 33-bit local index caps partitions at 8.6e9 rows, which
    ``n_parts`` sizing controls.
    """
    from database_synchronize_tool_spark.caching import scoped_persist

    part = scoped_persist(
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mii", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mii", 33))
        .withColumn(
            "__lrn", F.col("__mii").bitwiseAND(F.lit((1 << 33) - 1)) + 1
        )
    )
    counts = part.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # mii packs the in-partition record index into 33 bits; a range
    # partition beyond 2^33 rows would overflow __lrn into the partition-id
    # bits and corrupt every rank SILENTLY. The counts pass already has the
    # per-partition sizes, so guard here at zero extra cost — callers must
    # raise n_parts (ADVICE r10). raise_error (not assert_true) keeps the
    # check in the plan because __cnt itself flows into the offsets.
    counts = counts.select(
        "__pid",
        F.when(F.col("__cnt") < F.lit(1 << 33), F.col("__cnt"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("global_row_numbers: range partition holds "),
                    F.col("__cnt").cast("string"),
                    F.lit(" rows (>= 2^33); raise n_parts"),
                )
            ).cast("long")
        )
        .alias("__cnt"),
    )
    earlier = counts.select(
        F.col("__pid").alias("__pid_e"), F.col("__cnt").alias("__cnt_e")
    )
    # offset(p) = Σ counts of partitions with smaller pid; the self-join is
    # n_parts × n_parts rows — driver-trivial, and windowless on purpose.
    offsets = (
        counts.join(
            earlier, F.col("__pid_e") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__cnt_e"), F.lit(0)).alias("__off"))
    )
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(alias, F.col("__lrn") + F.col("__off"))
        .drop("__pid", "__off", "__mii", "__lrn")
    )


def global_running_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: str,
    alias: str,
    n_parts: int = 32,
) -> DataFrame:
    """Append the exact global running sum of ``value_col`` over the UNIQUE
    total order ``order_cols`` without a single-partition sort.

    Same discipline as :func:`global_row_numbers`: range-repartition on the
    order (partition p precedes p+1), run the cumulative sum LOCALLY per
    partition, and add each partition's carry-in — the summed totals of
    earlier partitions, an ``n_parts``-row windowless broadcast. This is
    the sweep-line / prefix-sum shape that survives 100 TB: parallelism is
    ``n_parts`` and no task ever sees more than its key range.

    The local cumulative sum is an Arrow-batched ``mapInPandas`` pass
    carrying the running total across batches — NOT a
    ``Window.partitionBy(__pid)``, which would insert a second full
    Exchange hashpartitioning(__pid) on top of the range exchange (same
    double-shuffle hazard :func:`global_row_numbers` documents); the
    pandas pass is narrow and stays on the range partitioning.
    ``value_col`` must be integer-typed (every caller sums exact BIGINT
    units — the repo's parity discipline anyway); NULLs contribute 0.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    from database_synchronize_tool_spark.caching import scoped_persist

    part = scoped_persist(
        df.repartitionByRange(n_parts, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    totals = part.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    earlier = totals.select(
        F.col("__pid").alias("__pid_e"), F.col("__tot").alias("__tot_e")
    )
    offsets = (
        totals.join(earlier, F.col("__pid_e") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__tot_e"), F.lit(0)).alias("__off"))
    )
    out_schema = StructType(
        list(part.schema.fields) + [StructField("__lcum", LongType())]
    )

    def local_cumsum(batches):
        total = 0
        for pdf in batches:
            vals = pdf[value_col].fillna(0).astype("int64")
            cum = vals.cumsum() + total
            if len(cum):
                total = int(cum.iloc[-1])
            pdf = pdf.copy()
            pdf["__lcum"] = cum
            yield pdf

    cum = part.mapInPandas(local_cumsum, out_schema)
    return (
        cum.join(F.broadcast(offsets), "__pid")
        .withColumn(alias, F.col("__lcum") + F.col("__off"))
        .drop("__pid", "__off", "__lcum")
    )


def grouped_doubled_avg_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    alias: str,
    n_parts: int = 32,
) -> DataFrame:
    """Append ``alias`` = 2·(tie-averaged rank of ``value_col`` within
    ``group_col``) as an exact BIGINT — the scale-safe replacement for
    ``Window.partitionBy(group).orderBy(value)`` rank windows whose
    partition key has BOUNDED NDV (r10 verdict: 3 return flags = 3
    straggler tasks; one huge group single-threads a third of the table
    through a single sorter at 100 TB).

    Shape — ONE data shuffle, the :func:`global_running_sum` discipline
    generalized to per-group tie-averaged ranks:

    - range-repartition on (group, value) so each partition holds a
      contiguous key range (equal (group, value) pairs NEVER split) and
      sort within partitions — parallelism is ``n_parts`` regardless of
      group count;
    - an Arrow-batched ``mapInPandas`` forward scan computes each tie
      group's local doubled average rank ``2·pos + size + 1``
      (= first_rank + last_rank), carrying (current group, emitted-row
      count, trailing unfinished tie group) across batches — NOT a
      ``Window.partitionBy(__pid, g)``, which re-exchanges the whole
      table by hash because the planner can't see range partitions
      already colocate it (the double-shuffle hazard
      :func:`global_row_numbers` documents);
    - each partition's rank offset (rows of the same group in EARLIER
      partitions) comes from a tiny map-side-combined (pid, group) count
      aggregate and a windowless inequality self-join — broadcast back,
      ``alias = local + 2·offset``.

    The only buffered state is one tie group (pathological all-equal
    values degrade to the partition size — the same worst case any
    sort-based rank has). For HIGH-NDV groups keep the plain window:
    parallelism there is the group count itself, and the (pid, group)
    offset table here would stop being tiny.

    ``2·avg_rank = 2·rank_min + ties − 1`` stays integral under ties
    (the repo's cross-engine rank-parity form; see plans/approx.py rank
    statistics), so downstream sufficient statistics remain BIGINT/
    DECIMAL-exact.

    Precondition: ``value_col`` must be NULL-free and NaN-free — the tie
    scan compares values with numpy ``!=`` where NaN != NaN is True, so a
    NaN/NULL would become its own tie group and silently diverge from the
    window form (which ranks NULL/NaN as peers). The scan fails fast with
    a ValueError instead of returning wrong ranks; callers filter or
    coalesce first (current callers rank non-null TPC-H measures).
    """
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    from database_synchronize_tool_spark.caching import scoped_persist

    part = scoped_persist(
        df.repartitionByRange(n_parts, F.col(group_col), F.col(value_col))
        .sortWithinPartitions(group_col, value_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    counts = part.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    earlier = counts.select(
        F.col("__pid").alias("__pid_e"),
        F.col(group_col).alias("__g_e"),
        F.col("__cnt").alias("__cnt_e"),
    )
    offsets = (
        counts.join(
            earlier,
            # eqNullSafe: a NULL group is a real group (the window form
            # ranks it); a null-unsafe condition would zero its offsets
            F.col("__g_e").eqNullSafe(F.col(group_col))
            & (F.col("__pid_e") < F.col("__pid")),
            "left",
        )
        .groupBy("__pid", group_col)
        .agg(F.coalesce(F.sum("__cnt_e"), F.lit(0)).alias("__off"))
    )
    out_schema = StructType(
        list(part.schema.fields) + [StructField("__lr2", LongType())]
    )

    def local_tie_scan(batches):
        import pandas as pd

        carry = None  # trailing tie group of the previous batch
        # current group + rows emitted in it; "started" distinguishes "no
        # group yet" from "current group is NULL" — without it a NULL
        # group spanning two emits would silently reset its rank counter.
        # (NaN group keys would still split — float group columns are not
        # supported here; every caller groups by a string/int dimension.)
        state = {"g": None, "pos": 0, "started": False}

        def same_key(a, b):
            return (a is None and b is None) or (
                a is not None and b is not None and a == b
            )

        def rank_complete(frame):
            gv = frame[group_col].to_numpy()
            vv = frame[value_col].to_numpy()
            n = len(frame)
            changed = np.ones(n, dtype=bool)
            changed[1:] = (gv[1:] != gv[:-1]) | (vv[1:] != vv[:-1])
            starts = np.flatnonzero(changed)
            sizes = np.diff(np.append(starts, n))
            gstart = gv[starts]
            newg = np.ones(len(starts), dtype=bool)
            newg[1:] = gstart[1:] != gstart[:-1]
            cum = np.cumsum(sizes) - sizes  # rows before each tie group
            rs = np.maximum.accumulate(
                np.where(newg, np.arange(len(starts)), 0)
            )
            pos_before = cum - cum[rs]
            if state["started"] and same_key(gstart[0], state["g"]):
                pos_before[rs == 0] += state["pos"]
            r2 = 2 * pos_before + sizes + 1
            state["g"] = gstart[-1]
            state["pos"] = int(pos_before[-1] + sizes[-1])
            state["started"] = True
            out = frame.copy()
            out["__lr2"] = np.repeat(r2, sizes)
            return out

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pdf[value_col].isna().any():
                raise ValueError(
                    "grouped_doubled_avg_ranks: NULL/NaN in value column "
                    f"{value_col!r} — the numpy tie scan would rank each "
                    "NaN as its own tie group (NaN != NaN), diverging from "
                    "window-rank semantics. Filter or coalesce first."
                )
            buf = pd.concat([carry, pdf]) if carry is not None else pdf
            gv = buf[group_col].to_numpy()
            vv = buf[value_col].to_numpy()
            diff = np.flatnonzero((gv != gv[-1]) | (vv != vv[-1]))
            start = int(diff[-1]) + 1 if len(diff) else 0
            carry = buf.iloc[start:]
            if start:
                yield rank_complete(buf.iloc[:start])
        if carry is not None and len(carry):
            yield rank_complete(carry)

    ranked = part.mapInPandas(local_tie_scan, out_schema).alias("__r")
    off = F.broadcast(
        offsets.select(
            F.col("__pid").alias("__pid_o"),
            F.col(group_col).alias("__g_o"),
            "__off",
        )
    )
    return (
        # eqNullSafe on the group: a name-list join would silently DROP
        # every NULL-group row (null-unsafe equality — r11 review)
        ranked.join(
            off,
            (F.col("__r.__pid") == F.col("__pid_o"))
            & F.col(f"__r.{group_col}").eqNullSafe(F.col("__g_o")),
        )
        .withColumn(alias, F.col("__lr2") + F.lit(2) * F.col("__off"))
        .drop("__pid", "__pid_o", "__g_o", "__off", "__lr2")
    )


def grouped_row_numbers(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    alias: str = "rn",
    n_parts: int = 32,
) -> DataFrame:
    """Append per-group 1-based row numbers over the UNIQUE within-group
    order ``order_cols`` — the scale-safe replacement for
    ``row_number().over(Window.partitionBy(group).orderBy(...))`` when
    ``group_col`` has BOUNDED NDV (each group's sort otherwise runs in ONE
    task; see :func:`grouped_doubled_avg_ranks`).

    :func:`global_row_numbers`' single-shuffle discipline, per group:
    range-repartition on (group, *order), sort within partitions, pack
    local row numbers with ``monotonically_increasing_id`` (NOT a
    ``Window.partitionBy(__pid, g)``, which re-exchanges the table), then
    per-group local rn = lrn − first_lrn(pid, group) + 1 (group runs are
    contiguous in the partition sort order) plus the group's offset from
    earlier partitions — both from ONE tiny map-side-combined
    (pid, group) aggregate, windowless inequality self-join, broadcast
    back. ``order_cols`` MUST be unique within each group. The same
    2^33-rows-per-partition mii bound as :func:`global_row_numbers`
    applies, guarded from the stats table at zero extra cost.
    """
    from database_synchronize_tool_spark.caching import scoped_persist

    part = scoped_persist(
        df.repartitionByRange(n_parts, F.col(group_col), *order_cols)
        .sortWithinPartitions(F.col(group_col), *order_cols)
        .withColumn("__mii", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mii", 33))
        .withColumn(
            "__lrn", F.col("__mii").bitwiseAND(F.lit((1 << 33) - 1)) + 1
        )
    )
    stats = part.groupBy("__pid", group_col).agg(
        F.count(F.lit(1)).alias("__cnt"),
        F.min("__lrn").alias("__first"),
    )
    # mii's 33-bit local index: the largest local row number per partition
    # is max(__first + __cnt - 1) — derivable from the tiny stats table,
    # no extra pass over the data (cf. global_row_numbers' guard)
    stats = stats.select(
        "__pid",
        group_col,
        "__cnt",
        F.when(
            F.col("__first") + F.col("__cnt") - 1 < F.lit(1 << 33),
            F.col("__first"),
        )
        .otherwise(
            F.raise_error(
                F.lit(
                    "grouped_row_numbers: a range partition reaches 2^33 "
                    "rows; raise n_parts"
                )
            ).cast("long")
        )
        .alias("__first"),
    )
    earlier = stats.select(
        F.col("__pid").alias("__pid_e"),
        F.col(group_col).alias("__g_e"),
        F.col("__cnt").alias("__cnt_e"),
    )
    offsets = (
        stats.join(
            earlier,
            # eqNullSafe: a NULL group is a real group; null-unsafe
            # equality would zero its offsets and drop its rows below
            F.col("__g_e").eqNullSafe(F.col(group_col))
            & (F.col("__pid_e") < F.col("__pid")),
            "left",
        )
        .groupBy("__pid", group_col, "__first")
        .agg(F.coalesce(F.sum("__cnt_e"), F.lit(0)).alias("__off"))
    )
    part_a = part.alias("__r")
    off = F.broadcast(
        offsets.select(
            F.col("__pid").alias("__pid_o"),
            F.col(group_col).alias("__g_o"),
            "__first",
            "__off",
        )
    )
    return (
        part_a.join(
            off,
            (F.col("__r.__pid") == F.col("__pid_o"))
            & F.col(f"__r.{group_col}").eqNullSafe(F.col("__g_o")),
        )
        .withColumn(
            alias, F.col("__lrn") - F.col("__first") + 1 + F.col("__off")
        )
        .drop("__pid", "__pid_o", "__g_o", "__off", "__mii", "__lrn", "__first")
    )


def ntile_from_rn(rn: Column, n: Column, buckets: int) -> Column:
    """SQL-standard NTILE(buckets) bucket id from a global row number.

    With q = n div buckets and r = n mod buckets, the first r buckets get
    q+1 rows (ANSI semantics — Spark and DuckDB agree). All-integer
    arithmetic, so the assignment is bit-identical to the engines' own
    NTILE over the same unique total order.
    """
    q = F.floor(n / buckets)
    r = n % buckets
    head = r * (q + 1)  # rows covered by the r fat buckets
    return (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rn - 1 - head) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
