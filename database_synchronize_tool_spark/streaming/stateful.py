"""Custom stateful streaming operator: sessionization with
``applyInPandasWithState`` (SURVEY §2.9 T5 — the escape hatch for stateful
semantics ``session_window`` can't express, e.g. per-session derived metrics
or custom eviction policies).

Contract: per user, events extend the current session while gaps stay within
``gap_ms``; an event beyond the gap CLOSES the running session (emitted
downstream) and opens a new one. The newest session stays in the state store
until a later event (or timeout, in continuous deployments) closes it —
bounded state per key, emitted rows are immutable history.

State schema: (session_start_us, last_us, n_events) — three scalars per user,
which is what makes this survive unbounded streams: state size is O(users),
never O(events).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

GAP_MS_DEFAULT = 30 * 60 * 1000

STATE_SCHEMA = StructType(
    [
        StructField("session_start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
    ]
)
OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _close_sessions(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
    watermark_us: int = 0,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0

    closed: list[tuple[int, int, int, int]] = []
    # Buffer EVERY chunk before sorting: one group can arrive as several
    # arrow chunks, and a per-chunk sort would interleave out-of-order
    # events into the state machine (round-7 review — a rewound last_us
    # split sessions and emitted wrong bounds).
    chunks = []
    for pdf in pdfs:
        # late-data policy: Spark does NOT auto-filter late input for
        # arbitrary stateful ops (unlike windowed aggregations) — the guide
        # leaves that to the state function, so enforce it here: a straggler
        # behind the watermark can neither rewind last_us nor inflate counts
        if watermark_us > 0:
            pdf = pdf[pdf["us"] >= watermark_us]
        if len(pdf):
            chunks.append(pdf[["us", "event_id"]])
    if chunks:
        # global event-time order across all chunks of this invocation
        # (deterministic tiebreak on event_id)
        batch = pd.concat(chunks).sort_values(["us", "event_id"])
        for us in batch["us"].to_numpy():
            us = int(us)
            if start is None:
                start, last, n = us, us, 1
            elif us > last:
                if us - last > gap_us:
                    closed.append((user_id, start, last, n))
                    start, last, n = us, us, 1
                else:
                    last, n = us, n + 1
            elif us >= start:
                # CROSS-BATCH disorder inside the current session's span:
                # the event joins the session without moving its bounds
                n += 1
            elif start - us <= gap_us:
                # within gap BEFORE the session: extend it backwards
                start, n = us, n + 1
            else:
                # older than the current session by more than the gap: the
                # prior session is immutable emitted history, so the
                # straggler becomes its own immediately-closed singleton
                # (documented policy; unreachable when a watermark delay
                # covers the disorder)
                closed.append((user_id, us, us, 1))

    if start is not None:
        state.update((start, last, n))
    # else: every row was late-filtered and no prior state exists — writing
    # (None, None, 0) under NoTimeout would leak a dead state entry per
    # late-only key forever (round-7 review)
    yield pd.DataFrame(
        closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
    )


def sessionize_stateful(
    events: DataFrame,
    gap_ms: int = GAP_MS_DEFAULT,
    watermark_delay: str | None = None,
) -> DataFrame:
    """Closed sessions per user via applyInPandasWithState.

    ``events`` must be a streaming frame with (user_id, event_id, ts).
    Output rows are sessions closed by a later event; the trailing open
    session per user remains in state (a production deployment adds an
    event-time timeout to flush it — the state machine is identical).

    ``watermark_delay`` (e.g. ``"10 minutes"``) attaches an event-time
    watermark to the input and makes the state function drop rows older
    than the current watermark (``GroupState.getCurrentWatermarkMs``) — a
    late straggler can never rewind ``last_us`` or inflate a session the
    stream has already moved past. The drop happens INSIDE the operator:
    Spark auto-filters late input only for windowed aggregations, not for
    arbitrary stateful ops, where the guide leaves the policy to the state
    function. Without it (the default, used by the bounded parity tests)
    every row reaches the state machine.
    """
    from pyspark.sql import functions as F

    gap_us = gap_ms * 1000
    prepared = events.select(
        "user_id",
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    if watermark_delay is not None:
        prepared = prepared.withWatermark("ts", watermark_delay)
    prepared = prepared.withColumn("us", F.unix_micros(F.col("ts")))

    with_watermark = watermark_delay is not None

    def fn(key, pdfs, state):
        wm_us = state.getCurrentWatermarkMs() * 1000 if with_watermark else 0
        return _close_sessions(key, pdfs, state, gap_us, wm_us)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


COMPACT_STATE_SCHEMA = StructType(
    [
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("n", LongType()),
    ]
)

COMPACT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("n_events", LongType()),
    ]
)


def compact_latest_stateful(events: DataFrame) -> DataFrame:
    """Streaming CDC compaction: per-key latest row via applyInPandasWithState.

    The streaming twin of :func:`...operators.merge.changelog_compact`: state
    per user_id holds (latest (us, event_id) winner's payload, total rows
    seen), each micro-batch emits the key's CURRENT latest row plus the
    running count. The count is the state-integrity witness — if state were
    lost between batches, the final emission's ``n_events`` could not equal
    the batch COUNT(*) per key, so the declared query's oracle (which checks
    both the winner and the count) detects broken state carry, not just a
    wrong final argmax.

    Winner order is the total order (us, event_id) — same tiebreak contract
    as the batch compactor. Output mode is update (every batch re-emits
    changed keys); the final frame takes each key's max-``n_events`` emission.

    Scale: state is O(keys) scalars, never O(events); a watermark-evicting
    production variant would add a timeout to drop idle keys (state machine
    identical).
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        "event_type",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            us, eid, etype, val, n = state.get
        else:
            us, eid, etype, val, n = -1, -1, None, None, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            # NULL us/event_id rows count toward n_events but can never be
            # the winner (same as the batch compactor's NULLS-FIRST sort);
            # without this dropna, pandas sort_values puts NaN LAST and a
            # NULL-ts row would win — then int(row["us"]) raises
            pdf = pdf.dropna(subset=["us", "event_id"])
            if pdf.empty:
                continue
            # batch-local winner by the (us, event_id) total order —
            # vectorized lexicographic sort, no per-row Python tuples
            row = pdf.sort_values(["us", "event_id"]).iloc[-1]
            cand = (int(row["us"]), int(row["event_id"]))
            if cand > (us, eid):
                us, eid = cand
                etype = row["event_type"]
                # NULL-safe: a changelog payload may carry NULLs
                val = None if pd.isna(row["value"]) else float(row["value"])
        state.update((us, eid, etype, val, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "event_id": [eid],
                "event_type": [etype],
                "value": [val],
                "n_events": [n],
            }
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=COMPACT_OUTPUT_SCHEMA,
        stateStructType=COMPACT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_total", LongType()),
    ]
)
HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("cands", ArrayType(LongType())),
        StructField("n_total", LongType()),
    ]
)


def heavy_hitter_candidates_stateful(
    events: DataFrame, capacity: int
) -> DataFrame:
    """Streaming Misra-Gries per event_type: bounded-state heavy-hitter
    CANDIDATES over an unbounded stream.

    The streaming face of ``operators/sketches.py``: state per key group is
    at most ``capacity`` (user, counter) pairs plus one total — O(capacity),
    never O(distinct users) — merged across micro-batches with the batched
    MG step (add the batch's counts, then subtract the (capacity+1)-th
    largest counter from all and evict non-positives; the Agarwal et al.
    merge lemma keeps the guarantee: every user with global count
    > n_total/(capacity+1) survives). Each batch re-emits the group's
    current candidate array plus the running total (update mode); the
    running total is the state-integrity witness, exactly as in
    :func:`compact_latest_stateful` — the final selection takes the
    max-total emission per group, so lost state shows up as a wrong
    total/candidate set, not silently.

    The candidate set is a recall-1.0 SUPERSET for any threshold
    den <= capacity; the declared query's exact batch verify prunes false
    positives, so the end-to-end output is EXACT and oracle-gradeable —
    a streaming sketch with a hash-checked answer.
    """
    prepared = events.select("event_type", "user_id").dropna()

    def fn(key, pdfs, state):
        import pandas as pd

        if state.exists:
            keys, counts, n_total = state.get
            counters = dict(zip(keys, counts))
        else:
            counters, n_total = {}, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_total += len(pdf)
            for uid, cnt in pdf["user_id"].value_counts().items():
                counters[int(uid)] = counters.get(int(uid), 0) + int(cnt)
            if len(counters) > capacity:
                # batched decrement: subtract the (capacity+1)-th largest
                # count, evict non-positive counters
                thresh = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - thresh for k, v in counters.items() if v > thresh
                }
        state.update(
            (list(counters.keys()), list(counters.values()), n_total)
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "cands": [sorted(counters.keys())],
                "n_total": [n_total],
            }
        )

    return prepared.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_STATE_SCHEMA = StructType(
    [
        StructField("regs", ArrayType(LongType())),
        StructField("mxs", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)
HLL_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("regs", ArrayType(LongType())),
        StructField("mxs", ArrayType(LongType())),
        StructField("n_seen", LongType()),
    ]
)

# Parity constants with operators/membership.py (HLL_P/HLL_M/HLL_W): the
# Python-side hash MUST be the same md5-hex-prefix 60-bit draw so the
# streaming registers are bit-identical to the batch/oracle registers.
_HLL_P, _HLL_W = 8, 52


def hll_registers_stateful(events: DataFrame) -> DataFrame:
    """Streaming HyperLogLog per event_type: distinct-user registers
    maintained across micro-batches with ``applyInPandasWithState``.

    State per key group is the register dict (<= 256 (reg, mx) pairs)
    plus a row counter — O(1) per group regardless of how many distinct
    users stream through. register-wise max is the HLL merge monoid, so
    the streaming accumulation is ORDER-INSENSITIVE: after any replay
    chunking whatsoever, the final registers equal the single-batch
    registers exactly — which is what lets the declared query grade a
    true multi-batch stream against a plain batch SQL oracle, and what
    makes the same code correct when micro-batches arrive out of order
    from 1000 executors. ``n_seen`` is the state-integrity witness
    (max-emission selection downstream, as in
    :func:`heavy_hitter_candidates_stateful`).

    The per-row hash is the repo's portable 60-bit md5 draw
    (hashlib.md5 == Spark md5() == DuckDB md5() on the decimal string
    rendering), with reg/suffix split and rho = 53 - bitlength(suffix)
    exactly as ``operators/membership.hll_registers`` computes JVM-side.
    """
    prepared = events.select("event_type", "user_id").dropna()

    def fn(key, pdfs, state):
        import hashlib

        if state.exists:
            regs, mxs, n_seen = state.get
            registers = dict(zip(regs, mxs))
        else:
            registers, n_seen = {}, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_seen += len(pdf)
            for uid in pdf["user_id"].astype("int64"):
                h = int(
                    hashlib.md5(str(int(uid)).encode()).hexdigest()[:15], 16
                )
                reg = h & ((1 << _HLL_P) - 1)
                suffix = h >> _HLL_P
                rho = (
                    _HLL_W + 1
                    if suffix == 0
                    else _HLL_W + 1 - suffix.bit_length()
                )
                if rho > registers.get(reg, 0):
                    registers[reg] = rho
        regs = sorted(registers.keys())
        mxs = [registers[r] for r in regs]
        state.update((regs, mxs, n_seen))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "regs": [regs],
                "mxs": [mxs],
                "n_seen": [n_seen],
            }
        )

    return prepared.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PS_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("priorities", ArrayType(DoubleType())),
        StructField("n_seen", LongType()),
    ]
)
PS_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("ids", ArrayType(LongType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("priorities", ArrayType(DoubleType())),
        StructField("n_seen", LongType()),
    ]
)


def priority_sample_stateful(events: DataFrame, k: int) -> DataFrame:
    """Streaming weighted reservoir per event_type: the top-(k+1) rows by
    Duffield-Lund-Thorup priority maintained in ``applyInPandasWithState``
    state across micro-batches.

    Third member of the engine's stateful merge-monoid trilogy
    (Misra-Gries counters in t13, HLL registers in t14): top-(k+1)
    selection is itself a merge monoid — the best k+1 of a union equal
    the best k+1 of each part's best k+1 — so the streamed candidate set
    is IDENTICAL to the batch top-(k+1) under any chunking, and a plain
    batch SQL oracle can hash-grade the stream. State is O(k) per group;
    ``n_seen`` is the integrity witness.

    The priority is the same portable draw as
    ``operators/sampling.priority_sample``: w / (md5-60bit(seed ⊕ id)+1),
    one IEEE division — Python, JVM, and DuckDB compute it bit-identically.
    """
    prepared = events.select("event_type", "event_id", "value").dropna()

    def fn(key, pdfs, state):
        import hashlib

        if state.exists:
            ids, weights, priorities, n_seen = state.get
            best = list(zip(ids, weights, priorities))
        else:
            best, n_seen = [], 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            n_seen += len(pdf)
            for eid, w in zip(
                pdf["event_id"].astype("int64"), pdf["value"].astype("float64")
            ):
                h = int(
                    hashlib.md5(
                        ("tps\x01" + str(int(eid))).encode()
                    ).hexdigest()[:15],
                    16,
                )
                best.append((int(eid), float(w), float(w) / (h + 1)))
            best.sort(key=lambda t: (-t[2], t[0]))
            best = best[: k + 1]
        state.update(
            (
                [t[0] for t in best],
                [t[1] for t in best],
                [t[2] for t in best],
                n_seen,
            )
        )
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "ids": [[t[0] for t in best]],
                "weights": [[t[1] for t in best]],
                "priorities": [[t[2] for t in best]],
                "n_seen": [n_seen],
            }
        )

    return prepared.groupBy("event_type").applyInPandasWithState(
        fn,
        outputStructType=PS_OUTPUT_SCHEMA,
        stateStructType=PS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SCD2_STATE_SCHEMA = StructType(
    [
        StructField("cur_type", StringType()),
        StructField("from_us", LongType()),
        StructField("from_eid", LongType()),
        StructField("n_rows", LongType()),
    ]
)
SCD2_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("vfrom_us", LongType()),
        StructField("vfrom_eid", LongType()),
        StructField("vto_us", LongType()),
        StructField("vto_eid", LongType()),
        StructField("is_current", BooleanType()),
        StructField("n_events", LongType()),
    ]
)


def scd2_stateful(events: DataFrame) -> DataFrame:
    """Streaming SCD Type-2 history maintenance: per-user run-length
    versions of ``event_type`` built incrementally across micro-batches
    with ``applyInPandasWithState`` — the streaming twin of
    ``operators/scd.scd2_merge`` (which applies one batch of changes) and
    the write-side producer for ``operators/scd.pit_join``.

    Contract: events per user form a (ts, event_id)-ordered change
    stream; a row whose ``event_type`` differs from the user's current
    version CLOSES that version (``valid_to`` = the new row's position,
    half-open interval — scd2_merge's invariant) and opens a new current
    one. Closed versions are emitted exactly once, in the micro-batch
    where they close — immutable history, safe to append straight to a
    lakehouse table. The open version is re-emitted every batch the key
    appears in (update mode) carrying its accumulated row count
    ``n_events``, which doubles as the state-integrity witness: the
    declared query's oracle checks per-version counts, so lost state
    between batches breaks the hash, not just the final row.

    State per user is FOUR scalars (current type, its start position,
    row count) — O(keys), never O(events); a production deployment adds
    a watermark timeout to evict idle keys, state machine unchanged.

    Ordering: the harness replays time-ordered chunks (equal timestamps
    never split across batches), and within a batch rows are sorted by
    the (us, event_id) total order — so the streamed history equals the
    batch islands oracle deterministically.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    ).filter(
        F.col("user_id").isNotNull()
        & F.col("us").isNotNull()
        & F.col("event_id").isNotNull()
    )

    def fn(key, pdfs, state):
        import numpy as np

        if state.exists:
            cur_type, from_us, from_eid, n_rows = state.get
        else:
            cur_type, from_us, from_eid, n_rows = None, -1, -1, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not rows.empty:
            rows = rows.sort_values(["us", "event_id"])
            types = rows["event_type"].to_numpy()
            uss = rows["us"].to_numpy(dtype="int64")
            eids = rows["event_id"].to_numpy(dtype="int64")
            # run-length segments; seg 0 may extend the open state version
            change = np.empty(len(types), dtype=bool)
            change[0] = cur_type is None or types[0] != cur_type
            change[1:] = types[1:] != types[:-1]
            seg_of = np.cumsum(change)  # 0 => continues the state version
            closed: list[tuple] = []
            start_idx = np.flatnonzero(change)
            for si, idx in enumerate(start_idx):
                # the version open BEFORE this boundary closes here
                prev_n = (
                    n_rows + int(np.count_nonzero(seg_of == 0))
                    if si == 0
                    else int(np.count_nonzero(seg_of == si))
                )
                if si == 0 and cur_type is None:
                    pass  # no open version yet: nothing to close
                else:
                    p_type = cur_type if si == 0 else types[start_idx[si - 1]]
                    p_us = from_us if si == 0 else int(uss[start_idx[si - 1]])
                    p_eid = from_eid if si == 0 else int(eids[start_idx[si - 1]])
                    closed.append(
                        (
                            key[0],
                            p_type,
                            p_us,
                            p_eid,
                            int(uss[idx]),
                            int(eids[idx]),
                            False,
                            prev_n,
                        )
                    )
                if si == len(start_idx) - 1:
                    # last boundary opens the new current version
                    cur_type = types[idx]
                    from_us, from_eid = int(uss[idx]), int(eids[idx])
                    n_rows = int(np.count_nonzero(seg_of == si + 1))
            if len(start_idx) == 0:
                n_rows += len(rows)  # whole batch extends the open version
        state.update((cur_type, from_us, from_eid, n_rows))
        out = closed if not rows.empty else []
        if cur_type is not None:
            out = out + [
                (key[0], cur_type, from_us, from_eid, None, None, True, n_rows)
            ]
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "event_type",
                "vfrom_us",
                "vfrom_eid",
                "vto_us",
                "vto_eid",
                "is_current",
                "n_events",
            ],
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SCD2_OUTPUT_SCHEMA,
        stateStructType=SCD2_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TWA_STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_vmu", LongType()),
        StructField("swdt_mu", LongType()),
        StructField("total_us", LongType()),
        StructField("n_intervals", LongType()),
    ]
)
TWA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_intervals", LongType()),
        StructField("total_us", LongType()),
        StructField("swdt_mu", LongType()),
    ]
)


def twa_stateful(events: DataFrame) -> DataFrame:
    """Streaming time-weighted average: the step-signal integral
    Sigma(v * dt) maintained incrementally across micro-batches with
    ``applyInPandasWithState`` — the streaming twin of the batch
    ``ts_time_weighted_avg`` declared query.

    State per user is FIVE BIGINT scalars: the last event's position and
    quantized value (the open edge of the step function) plus the two
    integral accumulators and the interval count. Because the signal is
    quantized to integer milli-units (same floor discipline as the batch
    query) the accumulators are integer-EXACT, so the streamed integral
    is bit-identical to the batch integral no matter how the replay
    chunks the stream — which is what lets the batch SQL oracle
    hash-grade a true multi-batch run.

    Each batch emits the user's running (n_intervals, total_us, swdt_mu)
    in update mode; n_intervals strictly increases, so the final frame's
    max-witness selection detects lost state the same way t12/t16 do.
    Production note: this is the always-fresh dashboard aggregate over a
    telemetry firehose — O(users) state, no reprocessing of history, and
    the final division to an average happens at READ time, so partial
    emissions stay mergeable integers end to end.
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.floor(F.col("value") * 1000).cast("bigint").alias("v_mu"),
    ).filter(
        F.col("user_id").isNotNull()
        & F.col("us").isNotNull()
        & F.col("event_id").isNotNull()
        & F.col("v_mu").isNotNull()
    )

    def fn(key, pdfs, state):
        if state.exists:
            last_us, last_vmu, swdt, total, n = state.get
        else:
            last_us, last_vmu, swdt, total, n = None, None, 0, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if not rows.empty:
            rows = rows.sort_values(["us", "event_id"])
            for us, vmu in zip(
                rows["us"].astype("int64"), rows["v_mu"].astype("int64")
            ):
                if last_us is not None:
                    dt = int(us) - int(last_us)
                    swdt += int(last_vmu) * dt
                    total += dt
                    n += 1
                last_us, last_vmu = int(us), int(vmu)
        state.update((last_us, last_vmu, swdt, total, n))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_intervals": [n],
                "total_us": [total],
                "swdt_mu": [swdt],
            }
        )

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TWA_OUTPUT_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


FUNNEL_STEPS = ("signup", "view", "click", "purchase")
FUNNEL_STATE_SCHEMA = StructType(
    [StructField(f"t_{s}_us", LongType()) for s in FUNNEL_STEPS]
    + [StructField("n_events", LongType())]
)
FUNNEL_OUTPUT_SCHEMA = StructType(
    [StructField("user_id", LongType())]
    + [StructField(f"t_{s}_us", LongType()) for s in FUNNEL_STEPS]
    + [StructField("n_events", LongType())]
)

_UNSET = -1  # sentinel: event times are epoch micros (>= 0 on any data)


def funnel_minima_stateful(events: DataFrame) -> DataFrame:
    """Streaming funnel sufficient statistics per user: the FIRST-occurrence
    time of each funnel step, maintained across micro-batches.

    The batch funnel (plans/behavior.events_funnel_conversion) reduces each
    user to conditional MIN(ts) per step and derives the strict-sequence
    stage flags from those minima. MIN is a commutative monoid, so the
    streaming face carries exactly 4 longs + a row counter per user —
    O(1) state, merged with ``min`` per batch. Every batch re-emits
    changed users (update mode); ``n_events`` strictly increases and is
    the state-integrity witness (the consumer takes each user's
    max-``n_events`` emission, so lost state between batches surfaces as
    a wrong count/minima, never silently — the t12 contract).

    NULL-ts rows count toward ``n_events`` but can never set a minimum
    (same convention as :func:`compact_latest_stateful`).
    """
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            *mins, n = state.get
            mins = list(mins)
        else:
            mins, n = [_UNSET] * len(FUNNEL_STEPS), 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            n += len(pdf)
            pdf = pdf.dropna(subset=["us"])
            if pdf.empty:
                continue
            for i, step in enumerate(FUNNEL_STEPS):
                sub = pdf.loc[pdf["event_type"] == step, "us"]
                if not sub.empty:
                    m = int(sub.min())
                    if mins[i] == _UNSET or m < mins[i]:
                        mins[i] = m
        state.update((*mins, n))
        out = {"user_id": [key[0]]}
        for i, step in enumerate(FUNNEL_STEPS):
            out[f"t_{step}_us"] = [None if mins[i] == _UNSET else mins[i]]
        out["n_events"] = [n]
        yield pd.DataFrame(out)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
