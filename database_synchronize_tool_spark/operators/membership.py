"""Deterministic membership / frequency / cardinality sketches.

Three classic bounded-state summaries — count-min, Bloom, HyperLogLog —
built so that the ENTIRE computation is reproducible integer arithmetic on
md5-derived hashes. That buys two things at once:

1. **Oracle checkability.** Every sketch here has a line-for-line ANSI-SQL
   twin (the 60-bit md5-hex prefix parses identically via Spark ``conv``
   and DuckDB ``CAST('0x…' AS BIGINT)``), so the declared queries are
   hash-verified end to end — unusual for "approximate" structures, whose
   implementations normally hide engine-specific hashing.
2. **Merge-correct distribution.** All three summaries are commutative
   monoids over their integer state (counter add, bitmap OR, register
   max), so Spark's partial aggregation computes them map-side and merges
   per-key state at the reducer — the shuffle carries O(sketch) bytes per
   group, never O(data). That is the 100 TB story: a count-min sketch of
   a 10^11-token corpus is still depth×width counters; a per-partition
   HLL of 10^10 ids is still 256 registers.

Differences from production sketch libraries (DataSketches etc.), by
design: the hash is md5-derived (slower than murmur/xxhash but available
and bit-identical in both engines), and the HLL estimator is the RAW
HyperLogLog harmonic estimate without the small-range linear-counting
branch (LC needs ``ln``, which is not bit-reproducible across engines;
callers see ``n_zero_registers`` and can apply LC downstream if they
accept float drift).

Reference parity note: the reference system (bxljoy/database-synchronize-
tool) has no sketch layer — these extend the engine for corpus-statistics
work at scales where exact groupBy state is the bottleneck (same
motivation as operators/sketches.py's Misra-Gries pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Separator for seeded hashing: chr(1) is byte-identical in Spark and
# DuckDB utf-8 output, and cannot appear in the seeds used here.
_SEP = "\x01"


def hash60(col: Column) -> Column:
    """Uniform non-negative 60-bit hash: md5 hex prefix parsed as an int.

    Parity contract: equals DuckDB ``CAST('0x' || substr(md5(x),1,15) AS
    BIGINT)`` bit-for-bit (60 bits always fits BIGINT, sign never set).
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def seeded_hash60(col: Column, seed: str) -> Column:
    """Full 60-bit seeded hash (no modulus) — the uniform draw behind
    priority sampling and the hash-family base of ``seeded_bucket``.

    The value is cast to string first: integer→string rendering is
    identical in Spark and DuckDB (``||`` casts implicitly there). Parity
    twin: ``CAST('0x' || substr(md5(seed || chr(1) || CAST(x AS VARCHAR)),
    1, 15) AS BIGINT)``.
    """
    return hash60(F.concat(F.lit(seed + _SEP), col.cast("string")))


def seeded_bucket(col: Column, seed: str, modulus: int) -> Column:
    """``hash60(seed ⊕ value) % modulus`` — one member of a hash family."""
    return seeded_hash60(col, seed) % modulus


# --- count-min sketch -------------------------------------------------------


def cms_build(
    items: DataFrame, col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Count-min sketch of the frequency of ``col`` values (one row per
    occurrence in ``items``). Returns the sketch TABLE: ``(r, bucket,
    cnt)`` with at most depth×width rows — the bounded-state summary.

    Each occurrence increments one counter per hash row; the groupBy
    partial-aggregates map-side, so the shuffle carries at most
    depth×width rows per input partition regardless of key cardinality.
    """
    buckets = F.array(
        *[seeded_bucket(F.col(col), f"cms{r}", width) for r in range(depth)]
    )
    return (
        items.select(F.posexplode(buckets).alias("r", "bucket"))
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_point_estimate(
    sketch: DataFrame, probes: DataFrame, col: str, depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Point-estimate frequencies for ``probes[col]`` from a built sketch:
    est(x) = min over rows r of sketch[r][h_r(x)]. Guarantees est >= true
    count (counters only ever overcount). The sketch side is bounded
    (depth×width) so the lookup join always broadcasts.

    The sketch is LEFT-joined with empty buckets counting as 0 (r9
    advice, membership.py:110): the sketch table only stores hit
    counters, so an inner join would drop a probe whose buckets are all
    empty and inflate the min() for one with some empty buckets — a true
    CMS returns 0 for an unseen value. Probe rows are tagged with a
    unique id before the explode (the bloom_probe discipline) so
    DUPLICATE probe rows each survive with their own estimate instead of
    collapsing.
    """
    tagged = probes.withColumn("__probe_id", F.monotonically_increasing_id())
    pb = tagged.withColumn(
        "__b",
        F.array(
            *[seeded_bucket(F.col(col), f"cms{r}", width) for r in range(depth)]
        ),
    ).select(
        "__probe_id", *probes.columns, F.posexplode("__b").alias("r", "bucket")
    )
    return (
        pb.join(F.broadcast(sketch), ["r", "bucket"], "left")
        .groupBy("__probe_id", *probes.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
        .drop("__probe_id")
    )


def cms_inner_product(sketch_a: DataFrame, sketch_b: DataFrame) -> DataFrame:
    """AMS-style join-size estimate from two count-min sketches built over
    the SAME hash family: for each hash row r the bucket-wise inner
    product Σ_b A[r][b]·B[r][b] upper-bounds the true join size
    Σ_k cA(k)·cB(k) — colliding keys only ever ADD cross terms — so the
    min over rows is the tightest available estimate and still >= exact.
    Expected overcount is n_a·n_b/width per row (Cormode & Muthukrishnan
    2005, §4.2), the knob a planner turns when sizing width.

    Both sketches are bounded (depth×width rows), so the pairing join
    broadcasts and the estimate costs O(depth·width) post-scan: the
    optimizer-statistics primitive — size a join's output BEFORE paying
    its shuffle. Returns one row: ``cms_est`` BIGINT.
    """
    per_row = (
        sketch_a.alias("a")
        .join(F.broadcast(sketch_b.alias("b")), ["r", "bucket"])
        .groupBy("r")
        .agg(F.sum(F.col("a.cnt") * F.col("b.cnt")).alias("ip"))
    )
    return per_row.agg(F.min("ip").cast("bigint").alias("cms_est"))


# --- Bloom filter -----------------------------------------------------------

# 32 bits per BIGINT word: DuckDB's left shift overflows at bit 63, so the
# repo-wide packing convention (simhash, binary-ANN) is 32 data bits per
# 64-bit word — shifts stay in [0, 31] and every mask is positive in both
# engines.
BLOOM_WORD_BITS = 32


def bloom_build(
    members: DataFrame, col: str, m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """Bloom filter over ``members[col]`` as a TABLE of ``(word, mask)``
    rows (m_bits / 32 words max — 128 rows at the default). bit_or is the
    merge monoid, so the build is one map-side-combined aggregation no
    matter how many members stream through.
    """
    bits = F.array(
        *[seeded_bucket(F.col(col), f"bf{j}", m_bits) for j in range(k)]
    )
    return (
        members.select(F.explode(bits).alias("bit"))
        .select(
            (F.col("bit") / BLOOM_WORD_BITS).cast("bigint").alias("word"),
            # expr form: F.shiftleft only accepts a Python-int shift amount
            F.expr(
                f"shiftleft(cast(1 as bigint), "
                f"cast(bit % {BLOOM_WORD_BITS} as int))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("mask"))
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, col: str, m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """Adds ``bloom_hit`` (boolean) to ``probes``: true iff ALL k bits are
    set — i.e. membership per Bloom semantics (no false negatives; false
    positives at the classic (1-e^{-kn/m})^k rate). The filter table is
    bounded, so the probe join is always a broadcast; the per-probe
    explode/agg stays inside one shuffle keyed by the probe row.

    Probe rows are tagged with a unique id before the k-way bit explode
    and regrouped on that id, so DUPLICATE probe rows each come back with
    the correct verdict — grouping on the probe columns alone would
    collapse duplicates into one group whose hit-sum exceeds k, minting a
    false negative (r9 advice, membership.py:206) and silently changing
    the output cardinality.
    """
    bits = F.array(
        *[seeded_bucket(F.col(col), f"bf{j}", m_bits) for j in range(k)]
    )
    tagged = probes.withColumn("__probe_id", F.monotonically_increasing_id())
    pb = tagged.select(
        "__probe_id", *probes.columns, F.explode(bits).alias("bit")
    ).select(
        "__probe_id",
        *probes.columns,
        (F.col("bit") / BLOOM_WORD_BITS).cast("bigint").alias("word"),
        F.expr(
            f"shiftleft(cast(1 as bigint), "
            f"cast(bit % {BLOOM_WORD_BITS} as int))"
        ).alias("mask"),
    )
    hit = (
        F.coalesce(F.col("filter_mask"), F.lit(0)).bitwiseAND(F.col("mask"))
        != 0
    )
    return (
        pb.join(
            F.broadcast(bloom.withColumnRenamed("mask", "filter_mask")),
            "word",
            "left",
        )
        .withColumn("__hit", hit)
        .groupBy("__probe_id", *probes.columns)
        .agg(F.min("__hit").alias("bloom_hit"))
        .drop("__probe_id")
    )


# --- HyperLogLog ------------------------------------------------------------

HLL_P = 8  # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_W = 60 - HLL_P  # suffix bits available for the rho scan
# alpha_256 * m^2 * 2^(W+1): the raw-estimate numerator folded into ONE
# double literal so the estimate is a single IEEE division (cross-engine
# exact). The 2^(W+1) factor matches the scaled harmonic sum below, whose
# per-register terms are 2^(W+1-rho) with rho in [0, W+1] — scaling by
# 2^(W+1) keeps the rho = W+1 term integral (= 1).
# alpha_m = 0.7213 / (1 + 1.079/m) for m >= 128 (Flajolet et al. 2007).
HLL_NUMERATOR = (0.7213 / (1.0 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(
    1 << (HLL_W + 1)
)


def hll_registers(
    items: DataFrame, col: str, group_cols: list[str]
) -> DataFrame:
    """Per-group HLL registers: ``group_cols + (reg, mx)`` where ``mx`` is
    the max rho observed in that register. rho = 53 - bitlength(suffix)
    (the leading-zero count of the 52-bit hash suffix, +1), computed via
    ``bin()`` string length — minimal-length binary rendering is identical
    in Spark and DuckDB. State per group is <= 256 rows regardless of
    input size; max() merges map-side.
    """
    h = hash60(F.col(col).cast("string"))
    # reg / suffix split via integer bit ops — double division would lose
    # exactness above 2^53 on a 60-bit hash.
    reg = h.bitwiseAND(F.lit(HLL_M - 1)).alias("reg")
    suffix = F.shiftright(h, HLL_P)
    rho = F.when(suffix == 0, F.lit(HLL_W + 1)).otherwise(
        F.lit(HLL_W + 1) - F.length(F.bin(suffix))
    )
    return (
        items.select(*group_cols, reg, rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mx"))
    )


def hll_estimate(registers: DataFrame, group_cols: list[str]) -> DataFrame:
    """Raw-HLL harmonic estimate per group from a register table.

    Empty registers count as rho=0, contributing term 2^(W+1) each under
    the 2^(W+1) scaling (per-register terms are 2^(W+1-rho)): the register
    table only has rows for HIT registers, so the sum adds
    (256 - hit_count) * 2^(W+1) for the missing ones — algebraically
    identical to left-joining a full
    0..255 register spine, without materializing it. The final estimate is
    ONE double division of an integer-exact sum, so it hash-matches the
    SQL oracle bit-for-bit.
    """
    term = F.expr(
        f"shiftleft(cast(1 as bigint), cast({HLL_W + 1} - mx as int))"
    )
    return registers.groupBy(*group_cols).agg(
        (
            F.lit(HLL_NUMERATOR)
            / (
                F.sum(term)
                + (F.lit(HLL_M) - F.count(F.lit(1)))
                * F.lit(1 << (HLL_W + 1)).cast("bigint")
            ).cast("double")
        ).alias("hll_est"),
        F.count(F.lit(1)).cast("bigint").alias("n_registers_hit"),
    )
