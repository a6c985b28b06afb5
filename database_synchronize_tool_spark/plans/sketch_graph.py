"""Declared queries: deterministic sketches, graph analytics, record
linkage, skyline, and incremental dedup.

Round-9 extension wave. Everything here follows the repo's parity
contract (registry.py header): md5-hex 60-bit hashes parse identically in
both engines, all sketch state is integer, every division that feeds a
hash-compared column is either explicit floor (integer) or a single IEEE
double op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.operators import dedup as DD
from database_synchronize_tool_spark.operators import graph as G
from database_synchronize_tool_spark.operators import membership as MB
from database_synchronize_tool_spark.plans.registry import declared

# 60-bit md5-hex hash, DuckDB side (parity twin of membership.hash60).
def _h60_sql(expr: str) -> str:
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


# --- count-min sketch -------------------------------------------------------

_CMS_DEPTH, _CMS_WIDTH = 4, 512


@declared(
    "sketch_cms_part_freq",
    oracle=f"""
    WITH occ AS (SELECT l_partkey AS k FROM lineitem),
    b AS (
      SELECT k, r,
             {_h60_sql("'cms' || CAST(r AS VARCHAR) || chr(1) || CAST(k AS VARCHAR)")}
               % {_CMS_WIDTH} AS bucket
      FROM occ CROSS JOIN range({_CMS_DEPTH}) t(r)
    ),
    sketch AS (
      SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY r, bucket
    ),
    exact AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM occ
      GROUP BY k ORDER BY exact_cnt DESC, k LIMIT 30
    ),
    pb AS (
      SELECT k, exact_cnt, r,
             {_h60_sql("'cms' || CAST(r AS VARCHAR) || chr(1) || CAST(k AS VARCHAR)")}
               % {_CMS_WIDTH} AS bucket
      FROM exact CROSS JOIN range({_CMS_DEPTH}) t(r)
    )
    SELECT pb.k AS l_partkey, pb.exact_cnt,
           MIN(coalesce(s.cnt, 0)) AS cms_est
    FROM pb LEFT JOIN sketch s ON s.r = pb.r AND s.bucket = pb.bucket
    GROUP BY pb.k, pb.exact_cnt
    """,
    doc=f"Count-min sketch ({_CMS_DEPTH}x{_CMS_WIDTH}, md5-seeded hash "
    "family) of part order-frequencies, point-estimated for the exact "
    "top-30 parts. The sketch is the bounded-state alternative to a "
    "full-cardinality groupBy: counters partial-aggregate map-side, the "
    "shuffle carries at most depth*width rows per partition no matter how "
    "many distinct keys stream through, and the lookup join broadcasts "
    "the (bounded) sketch. est >= exact always — the overcount IS the "
    "measured quantity. At 100 TB the exact top-30 comes from a prior "
    "heavy-hitters pass (operators/sketches.py); it is exact groupBy here "
    "only because the declared query must be self-contained.",
)
def sketch_cms_part_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k")
    )
    sketch = MB.cms_build(li, "k", _CMS_DEPTH, _CMS_WIDTH)
    exact = (
        li.groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "k")
        .limit(30)
    )
    est = MB.cms_point_estimate(sketch, exact, "k", _CMS_DEPTH, _CMS_WIDTH)
    return est.select(
        F.col("k").alias("l_partkey"), "exact_cnt", "cms_est"
    )


# --- Bloom filter -----------------------------------------------------------

_BLOOM_M, _BLOOM_K = 4096, 3


@declared(
    "sketch_bloom_decontam",
    oracle=f"""
    WITH bits AS (
      SELECT doc_id, lang, text, j,
             {_h60_sql("'bf' || CAST(j AS VARCHAR) || chr(1) || text")}
               % {_BLOOM_M} AS bit
      FROM documents CROSS JOIN range({_BLOOM_K}) t(j)
    ),
    flt AS (
      SELECT bit // 32 AS word,
             bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INT)) AS mask
      FROM bits WHERE doc_id % 100 < 3 GROUP BY 1
    ),
    hits AS (
      SELECT b.doc_id, b.lang, b.text,
             CASE WHEN (coalesce(f.mask, 0)
                        & (CAST(1 AS BIGINT) << CAST(b.bit % 32 AS INT))) <> 0
                  THEN 1 ELSE 0 END AS hit
      FROM bits b LEFT JOIN flt f ON b.bit // 32 = f.word
    ),
    perdoc AS (
      SELECT doc_id, lang, text,
             CASE WHEN SUM(hit) = {_BLOOM_K} THEN 1 ELSE 0 END AS flagged
      FROM hits GROUP BY doc_id, lang, text
    ),
    truth AS (
      SELECT p.*, CASE WHEN p.text IN (
               SELECT text FROM documents WHERE doc_id % 100 < 3
             ) THEN 1 ELSE 0 END AS member
      FROM perdoc p
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(member) AS BIGINT) AS n_members,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           CAST(SUM(CASE WHEN flagged = 1 AND member = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(SUM(CASE WHEN flagged = 1 AND member = 0 THEN 1 ELSE 0 END)
                AS DOUBLE)
             / CAST(COUNT(*) - SUM(member) AS DOUBLE) AS fp_rate
    FROM truth GROUP BY lang
    """,
    doc=f"Bloom-filter decontamination screen: an {_BLOOM_M}-bit / "
    f"{_BLOOM_K}-hash filter over a held-out document set (doc_id%100<3), "
    "probed by the full corpus, rolled up per language as a confusion "
    "report (members / flagged / false-positives / measured FP rate). "
    "Zero false negatives by construction — Bloom's guarantee — so the "
    "filter is a SOUND pre-screen: at 100 TB the ~16 KB filter broadcasts "
    "to every executor and prunes the corpus before the exact "
    "decontamination join ever shuffles (decontam_* queries); the FP rate "
    "column is the knob-tuning feedback. Packs 32 bits/word because "
    "DuckDB's BIGINT shift overflows at bit 63 (repo packing convention).",
)
def sketch_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    members = d.filter(F.col("doc_id") % 100 < 3)
    bloom = MB.bloom_build(members, "text", _BLOOM_M, _BLOOM_K)
    probed = MB.bloom_probe(bloom, d, "text", _BLOOM_M, _BLOOM_K)
    member_texts = members.select("text").distinct()
    truth = probed.join(
        F.broadcast(member_texts.withColumn("__m", F.lit(1))), "text", "left"
    ).select(
        "lang",
        F.col("bloom_hit").cast("int").alias("flagged"),
        F.coalesce(F.col("__m"), F.lit(0)).alias("member"),
    )
    fp = F.sum(
        F.when((F.col("flagged") == 1) & (F.col("member") == 0), 1).otherwise(0)
    )
    return truth.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("member").cast("bigint").alias("n_members"),
        F.sum("flagged").cast("bigint").alias("n_flagged"),
        fp.cast("bigint").alias("n_false_pos"),
        (
            fp.cast("double")
            / (F.count(F.lit(1)) - F.sum("member")).cast("double")
        ).alias("fp_rate"),
    )


# --- HyperLogLog ------------------------------------------------------------


@declared(
    "sketch_hll_distinct_orders",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             {_h60_sql("CAST(l_orderkey AS VARCHAR)")} AS h
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, h % {MB.HLL_M} AS reg,
             CASE WHEN h // {MB.HLL_M} = 0 THEN {MB.HLL_W + 1}
                  ELSE {MB.HLL_W + 1} - length(bin(h // {MB.HLL_M}))
             END AS rho
      FROM h
    ),
    m AS (SELECT l_returnflag, reg, MAX(rho) AS mx FROM r GROUP BY 1, 2),
    s AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(1 AS BIGINT) << CAST({MB.HLL_W + 1} - mx AS INT))
                  AS BIGINT)
               + ({MB.HLL_M} - COUNT(*))
                 * (CAST(1 AS BIGINT) << {MB.HLL_W + 1}) AS denom,
             CAST(COUNT(*) AS BIGINT) AS n_registers_hit
      FROM m GROUP BY l_returnflag
    ),
    x AS (
      SELECT l_returnflag,
             CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT s.l_returnflag, x.exact_distinct,
           {MB.HLL_NUMERATOR!r} / CAST(s.denom AS DOUBLE) AS hll_est,
           s.n_registers_hit
    FROM s JOIN x ON x.l_returnflag = s.l_returnflag
    """,
    doc=f"HyperLogLog distinct-order estimate per return flag ({MB.HLL_M} "
    "registers, raw Flajolet estimator) next to the exact count. The "
    "whole estimator is reproducible: 60-bit md5 hash, register/suffix "
    "split by integer shifts, rho from minimal-binary-string length "
    "(identical in both engines), harmonic sum kept in scaled integers "
    "(2^(53-rho) terms, empty registers folded in algebraically), ONE "
    "double division at the end. No linear-counting branch — ln() is not "
    "bit-reproducible cross-engine; n_registers_hit is exposed so a "
    "consumer can apply it. Scale: per-group state is <= 256 rows merged "
    "by max() map-side — estimating distinct ids over 100 TB shuffles "
    "kilobytes per group instead of the id set.",
)
def sketch_hll_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    regs = MB.hll_registers(li, "l_orderkey", ["l_returnflag"])
    est = MB.hll_estimate(regs, ["l_returnflag"])
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_distinct")
    )
    return est.join(exact, "l_returnflag").select(
        "l_returnflag", "exact_distinct", "hll_est", "n_registers_hit"
    )


@declared(
    "sketch_hll_register_merge",
    oracle=f"""
    WITH h AS (
      SELECT l_returnflag,
             {_h60_sql("CAST(l_orderkey AS VARCHAR)")} AS h
      FROM lineitem
    ),
    r AS (
      SELECT l_returnflag, h % {MB.HLL_M} AS reg,
             CASE WHEN h // {MB.HLL_M} = 0 THEN {MB.HLL_W + 1}
                  ELSE {MB.HLL_W + 1} - length(bin(h // {MB.HLL_M}))
             END AS rho
      FROM h
    ),
    grp AS (SELECT l_returnflag, reg, MAX(rho) AS mx FROM r GROUP BY 1, 2),
    merged AS (SELECT reg, MAX(mx) AS mx FROM grp GROUP BY reg),
    direct AS (SELECT reg, MAX(rho) AS mx FROM r GROUP BY reg),
    me AS (
      SELECT {MB.HLL_NUMERATOR!r} / CAST(
               CAST(SUM(CAST(1 AS BIGINT) << CAST({MB.HLL_W + 1} - mx AS INT))
                    AS BIGINT)
               + ({MB.HLL_M} - COUNT(*))
                 * (CAST(1 AS BIGINT) << {MB.HLL_W + 1}) AS DOUBLE)
             AS est
      FROM merged
    ),
    de AS (
      SELECT {MB.HLL_NUMERATOR!r} / CAST(
               CAST(SUM(CAST(1 AS BIGINT) << CAST({MB.HLL_W + 1} - mx AS INT))
                    AS BIGINT)
               + ({MB.HLL_M} - COUNT(*))
                 * (CAST(1 AS BIGINT) << {MB.HLL_W + 1}) AS DOUBLE)
             AS est
      FROM direct
    ),
    x AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
          FROM lineitem)
    SELECT me.est AS merged_est, de.est AS direct_est,
           me.est = de.est AS merge_exact, x.exact_distinct
    FROM me, de, x
    """,
    doc="HLL mergeability, self-certified: per-return-flag register tables "
    "merged by register-wise max must estimate EXACTLY what a direct "
    "global pass estimates — max is the sketch's merge monoid, so "
    "merge_exact is provably true, and the oracle hash-checks the proof. "
    "This is the property that makes HLL the 100 TB distinct-count "
    "structure: per-partition/per-day/per-source registers roll up "
    "without ever revisiting the data (the same union that would cost a "
    "full re-scan with exact distinct sets).",
)
def sketch_hll_register_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    grp = MB.hll_registers(li, "l_orderkey", ["l_returnflag"])
    merged_regs = grp.groupBy("reg").agg(F.max("mx").alias("mx"))
    direct_regs = MB.hll_registers(li, "l_orderkey", [])
    me = MB.hll_estimate(
        merged_regs.withColumn("g", F.lit(1)), ["g"]
    ).select(F.col("hll_est").alias("merged_est"))
    de = MB.hll_estimate(
        direct_regs.withColumn("g", F.lit(1)), ["g"]
    ).select(F.col("hll_est").alias("direct_est"))
    exact = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("exact_distinct")
    )
    return (
        me.crossJoin(de)
        .withColumn(
            "merge_exact", F.col("merged_est") == F.col("direct_est")
        )
        .crossJoin(exact)
        .select("merged_est", "direct_est", "merge_exact", "exact_distinct")
    )


# --- graph analytics --------------------------------------------------------


def _copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct same-order part pairs (a < b) — the co-purchase graph's
    edge list. Lines-per-order is bounded (<= 7 in TPC-H), so the
    per-order self-join is a bounded in-group expansion, not a skew
    risk."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    a = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("b"))
    return (
        a.join(b, "o").filter(F.col("a") < F.col("b")).select("a", "b")
    )


_COPURCHASE_EDGES_SQL = """
    e AS (
      SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
      FROM lineitem x JOIN lineitem y
        ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey
    )
"""


@declared(
    "graph_triangle_parts",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_SQL},
    tri AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1 JOIN e e2 ON e2.a = e1.b
                JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    nodes AS (SELECT unnest([a, b, c]) AS p_partkey FROM tri)
    SELECT p_partkey, CAST(COUNT(*) AS BIGINT) AS n_tri
    FROM nodes GROUP BY p_partkey
    ORDER BY n_tri DESC, p_partkey LIMIT 20
    """,
    doc="Top-20 parts by triangle participation in the co-purchase graph "
    "(parts sharing an order). Spark runs the DEGREE-ORDERED orientation "
    "(Chiba-Nishizeki 'forward' counting): each undirected edge oriented "
    "low-degree -> high-degree, wedges closed by an oriented-edge "
    "equi-join — out-degree is bounded by O(sqrt(2m)) so the wedge "
    "fan-out survives power-law hubs that would explode the naive "
    "highest-id orientation. The oracle uses the naive a<b<c formulation: "
    "the triangle SET is identical, so the hash check proves the "
    "optimized orientation changes nothing.",
)
def graph_triangle_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = G.undirected_edges(_copurchase_pairs(spark, sf_dir))
    return (
        G.triangle_counts(edges)
        .select(F.col("node").alias("p_partkey"), "n_tri")
        .orderBy(F.col("n_tri").desc(), "p_partkey")
        .limit(20)
    )


@declared(
    "graph_pagerank_parts",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_SQL},
    ed AS (
      SELECT a AS src, b AS dst FROM e
      UNION ALL SELECT b AS src, a AS dst FROM e
    ),
    deg AS (SELECT src AS node, COUNT(*) AS deg FROM ed GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM deg),
    base AS (SELECT ((1000000000000 * {G.PR_DAMP_DEN - G.PR_DAMP_NUM})
                     // {G.PR_DAMP_DEN}) // n AS b FROM n),
    r0 AS (SELECT node, deg, 1000000000000 // n.n AS rank FROM deg, n),
    c1 AS (SELECT ed.dst AS node, CAST(SUM(r0.rank // r0.deg) AS BIGINT) AS s
           FROM r0 JOIN ed ON ed.src = r0.node GROUP BY 1),
    r1 AS (SELECT d.node, d.deg,
                  base.b + ({G.PR_DAMP_NUM} * coalesce(c1.s, 0))
                           // {G.PR_DAMP_DEN} AS rank
           FROM deg d CROSS JOIN base LEFT JOIN c1 ON c1.node = d.node),
    c2 AS (SELECT ed.dst AS node, CAST(SUM(r1.rank // r1.deg) AS BIGINT) AS s
           FROM r1 JOIN ed ON ed.src = r1.node GROUP BY 1),
    r2 AS (SELECT d.node, d.deg,
                  base.b + ({G.PR_DAMP_NUM} * coalesce(c2.s, 0))
                           // {G.PR_DAMP_DEN} AS rank
           FROM deg d CROSS JOIN base LEFT JOIN c2 ON c2.node = d.node),
    c3 AS (SELECT ed.dst AS node, CAST(SUM(r2.rank // r2.deg) AS BIGINT) AS s
           FROM r2 JOIN ed ON ed.src = r2.node GROUP BY 1),
    r3 AS (SELECT d.node,
                  base.b + ({G.PR_DAMP_NUM} * coalesce(c3.s, 0))
                           // {G.PR_DAMP_DEN} AS rank
           FROM deg d CROSS JOIN base LEFT JOIN c3 ON c3.node = d.node)
    SELECT node AS p_partkey, CAST(rank AS BIGINT) AS rank_scaled
    FROM r3 ORDER BY rank DESC, node LIMIT 20
    """,
    doc="Top-20 parts by 3-iteration PageRank (damping 85/100) over the "
    "co-purchase graph, in scaled-integer arithmetic (units of 1e-12, "
    "every division explicit floor) so the iterative computation is "
    "bit-identical across engines AND across partitionings — no float "
    "accumulation-order drift, the classic reason distributed PageRank "
    "results don't reproduce. Each iteration is one edges-ranks equi-join "
    "+ one groupBy (rank table O(V), reuses edge partitioning); the "
    "floor leak is bounded (< deg(u) units/vertex/iter, ~1e-9 of mass) "
    "and documented. Spark runs a DataFrame loop; the oracle unrolls the "
    "same three iterations as chained CTEs.",
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = G.undirected_edges(_copurchase_pairs(spark, sf_dir))
    return (
        G.pagerank_scaled(edges, iterations=3)
        .select(F.col("node").alias("p_partkey"), "rank_scaled")
        .orderBy(F.col("rank_scaled").desc(), "p_partkey")
        .limit(20)
    )


# --- record linkage ---------------------------------------------------------

_OCR_FROM, _OCR_TO = "aeos", "@30$"
_LINK_PREFIX, _LINK_LEV_MAX = 40, 15


@declared(
    "link_fuzzy_noisy_docs",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id + 1000000 AS rec_id, lang,
             translate(substr(text, 1, {_LINK_PREFIX}),
                       '{_OCR_FROM}', '{_OCR_TO}') AS key,
             length(text) // 32 AS lb
      FROM documents
    ),
    clean AS (
      SELECT doc_id AS rec_id, lang, substr(text, 1, {_LINK_PREFIX}) AS key,
             length(text) // 32 AS lb
      FROM documents
    )
    SELECT c.rec_id AS doc_clean, d.rec_id AS doc_noisy,
           CAST(levenshtein(c.key, d.key) AS INT) AS lev_dist
    FROM clean c JOIN dirty d ON c.lang = d.lang AND c.lb = d.lb
    WHERE levenshtein(c.key, d.key) <= {_LINK_LEV_MAX}
    """,
    doc="Blocked fuzzy record linkage through a noisy channel: the corpus "
    "is re-rendered with a deterministic OCR-style character corruption "
    f"(translate {_OCR_FROM!r} -> {_OCR_TO!r}, same doubled-corpus device "
    "as dedup_exact), and clean records link to noisy ones by Levenshtein "
    f"distance <= {_LINK_LEV_MAX} on the {_LINK_PREFIX}-char key, inside "
    "(language, length-band) blocks. The scale shape is the linkage "
    "standard: candidate generation is an equi-join on the blocking key "
    "(never all-pairs), the O(k^2)-per-pair edit distance runs only "
    "inside blocks, and both engines' levenshtein are the plain "
    "Wagner-Fischer distance so the verify is exact integer parity.",
)
def link_fuzzy_noisy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    key = F.substring(F.col("text"), 1, _LINK_PREFIX)
    lb = F.expr("length(text) div 32")
    clean = d.select(
        F.col("doc_id").alias("rec_id"), "lang", key.alias("key"), lb.alias("lb")
    )
    dirty = d.select(
        (F.col("doc_id") + 1000000).alias("rec_id"),
        "lang",
        F.translate(key, _OCR_FROM, _OCR_TO).alias("key"),
        lb.alias("lb"),
    )
    # Per-RECORD character-frequency vectors (computed once per record,
    # never per pair): each edit operation changes the combined character
    # counts by at most 2 (a substitution decrements one class and
    # increments another), so  Σ_c |freq_a(c) - freq_b(c)| <= 2·lev  is a
    # SOUND screen — candidates failing L1 <= 2·max can never pass the
    # verify. The screen is ~30 integer ops per pair vs the O(k²)=1600-cell
    # DP, and as the FIRST conjunct of the pair predicate it short-circuits
    # the DP away for the bulk of the block-candidates (bench: 4.4 s ->
    # sub-second; same pattern as the dedup bitmap screens — result-neutral,
    # so the oracle stays the plain blocked-levenshtein form).
    charset = "abcdefghijklmnopqrstuvwxyz @30$"
    freq = F.array(
        *[
            (
                F.length(F.col("key"))
                - F.length(F.translate(F.col("key"), ch, ""))
            ).cast("int")
            for ch in charset
        ]
    )
    c = clean.withColumn("fv", freq).alias("c")
    n = dirty.withColumn("fv", freq).alias("n")
    l1 = F.aggregate(
        F.zip_with(F.col("c.fv"), F.col("n.fv"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        c.join(
            n,
            (F.col("c.lang") == F.col("n.lang"))
            & (F.col("c.lb") == F.col("n.lb"))
            & (l1 <= 2 * _LINK_LEV_MAX)
            & (F.levenshtein(F.col("c.key"), F.col("n.key")) <= _LINK_LEV_MAX),
        )
        .select(
            F.col("c.rec_id").alias("doc_clean"),
            F.col("n.rec_id").alias("doc_noisy"),
            F.levenshtein(F.col("c.key"), F.col("n.key"))
            .cast("int")
            .alias("lev_dist"),
        )
    )


_LINKB_LEV_MAX = 3  # banded variant threshold: k where pigeonhole banding is sound


@declared(
    "link_fuzzy_banded",
    oracle=f"""
    WITH dirty AS (
      SELECT doc_id + 1000000 AS rec_id, lang,
             translate(substr(text, 1, {_LINK_PREFIX}), 'o', '0') AS key,
             length(text) // 32 AS lb
      FROM documents WHERE length(text) >= 4
    ),
    clean AS (
      SELECT doc_id AS rec_id, lang, substr(text, 1, {_LINK_PREFIX}) AS key,
             length(text) // 32 AS lb
      FROM documents WHERE length(text) >= 4
    )
    SELECT c.rec_id AS doc_clean, d.rec_id AS doc_noisy,
           CAST(levenshtein(c.key, d.key) AS INT) AS lev_dist
    FROM clean c JOIN dirty d ON c.lang = d.lang AND c.lb = d.lb
    WHERE levenshtein(c.key, d.key) <= {_LINKB_LEV_MAX}
    """,
    doc="SUB-QUADRATIC fuzzy record linkage (the production companion to "
    "link_fuzzy_noisy_docs, r11 verdict #2): a light OCR channel "
    f"(translate 'o' -> '0') at lev <= {_LINKB_LEV_MAX} over the "
    f"{_LINK_PREFIX}-char key, where PassJoin-style pigeonhole banding IS "
    "sound — partition the noisy key into k+1 contiguous segments; any "
    "alignment with <= k edits leaves >= 1 segment untouched, and the "
    "untouched segment's image in the clean key starts within +-k of its "
    "own position (net indels before it are <= k). Candidates are an "
    "EQUI-join on (lang, lb, segment_id, noisy_len, segment) between the "
    "segment index (k+1 rows/record) and the probe substrings "
    "((2k+1)-shift x (2k+1)-length window per segment, native exprs, no "
    "UDF); the Levenshtein DP runs only on deduped candidates. Recall is "
    "PROVABLY 1.0, so the oracle stays the plain blocked-lev form and the "
    "value hash itself grades the coverage claim — unlike the "
    f"lev<={_LINK_LEV_MAX} exact query (k/|key|=37%, no sound banding "
    "exists; kept as the small-SF recall oracle), this shape stays linear "
    "in candidates at 100 TB: the block-quadratic clean x dirty join is "
    "replaced by a selective segment equi-join (~10-char keys), the same "
    "move dedup_containment_banded makes on token prefixes.",
)
def link_fuzzy_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") >= 4)
    key = F.substring(F.col("text"), 1, _LINK_PREFIX)
    lb = F.expr("length(text) div 32")
    clean = d.select(
        F.col("doc_id").alias("rec_id"), "lang", key.alias("key"), lb.alias("lb")
    )
    dirty = d.select(
        (F.col("doc_id") + 1000000).alias("rec_id"),
        "lang",
        F.translate(key, "o", "0").alias("key"),
        lb.alias("lb"),
    )
    return fuzzy_link_banded_pairs(clean, dirty, _LINKB_LEV_MAX)


def fuzzy_link_banded_pairs(
    clean: DataFrame, dirty: DataFrame, k: int
) -> DataFrame:
    """PassJoin-banded lev <= ``k`` pairs between two keyed record sets
    (columns ``rec_id, lang, key, lb`` each) — the candidate engine behind
    :func:`link_fuzzy_banded`, split out so recall can be brute-force
    property-tested on short and length-varying keys the testdata never
    exercises. Recall is 1.0 by the segment pigeonhole (docstring above);
    keys shorter than ``k + 1`` chars are assumed filtered by the caller
    (their segments would be empty)."""
    nseg = k + 1
    # segment index over the NOISY side: k+1 even segments per record
    # (segment j of a length-L key starts at (j*L div nseg)+1, 1-based)
    segs = (
        dirty.withColumn("len_b", F.length("key"))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k))))
        .select(
            F.col("rec_id").alias("rid_n"),
            "lang",
            "lb",
            F.col("key").alias("key_n"),
            "len_b",
            "j",
            F.expr(
                f"substring(key, (j * len_b) div {nseg} + 1,"
                f" ((j + 1) * len_b) div {nseg} - (j * len_b) div {nseg})"
            ).alias("seg"),
        )
        .filter(F.length("seg") >= 1)  # degenerate only when len_b < nseg
    )
    # probe substrings over the CLEAN side: for each candidate noisy length
    # (within +-k of the clean length — the length filter lev itself
    # implies) and each segment slot, the clean substring at the segment's
    # position shifted by d in [-k, k]
    probes = (
        clean.withColumn("len_a", F.length("key"))
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(k))))
        .withColumn(
            "len_b",
            F.explode(
                F.expr(f"sequence(greatest(length(key) - {k}, {nseg}),"
                       f" length(key) + {k})")
            ),
        )
        .withColumn("d", F.explode(F.sequence(F.lit(-k), F.lit(k))))
        .withColumn("p", F.expr(f"(j * len_b) div {nseg} + 1 + d"))
        .withColumn(
            "l",
            F.expr(f"((j + 1) * len_b) div {nseg} - (j * len_b) div {nseg}"),
        )
        .filter((F.col("p") >= 1) & (F.col("p") + F.col("l") - 1 <= F.col("len_a")))
        .select(
            F.col("rec_id").alias("rid_c"),
            "lang",
            "lb",
            F.col("key").alias("key_c"),
            "len_b",
            "j",
            F.expr("substring(key, p, l)").alias("seg"),
        )
    )
    cand = (
        probes.join(segs, ["lang", "lb", "j", "len_b", "seg"])
        .select("rid_c", "rid_n", "key_c", "key_n")
        # a pair can match through several (j, d) slots: one DP per pair
        .distinct()
    )
    lev = F.levenshtein(F.col("key_c"), F.col("key_n"))
    return cand.filter(lev <= k).select(
        F.col("rid_c").alias("doc_clean"),
        F.col("rid_n").alias("doc_noisy"),
        lev.cast("int").alias("lev_dist"),
    )


# --- skyline / Pareto frontier ----------------------------------------------


@declared(
    "pareto_order_frontier",
    oracle="""
    WITH pl AS (
      SELECT o_orderpriority, o_totalprice AS p, MAX(o_orderdate) AS dmax
      FROM orders GROUP BY 1, 2
    ),
    run AS (
      SELECT o_orderpriority, p, dmax,
             MAX(dmax) OVER (
               PARTITION BY o_orderpriority ORDER BY p DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS better
      FROM pl
    )
    SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o
    JOIN run r ON r.o_orderpriority = o.o_orderpriority
              AND r.p = o.o_totalprice
    WHERE (r.better IS NULL OR o.o_orderdate > r.better)
      AND o.o_orderdate = r.dmax
    """,
    doc="2D Pareto frontier (skyline) per order priority: orders not "
    "dominated in (totalprice, orderdate) — maximize both — by any other "
    "order of the same priority. Implemented as the O(n log n) sort-based "
    "sweep, NOT the naive O(n^2) NOT-EXISTS: collapse to distinct price "
    "levels (groupBy max-date), one window pass takes the running "
    "max-date over strictly-higher price levels, and a row survives iff "
    "it beats that running max and its own price level's max. Both "
    "engines run the identical sweep, so dominance tie semantics "
    "(equal price+date pairs are mutually non-dominated) agree by "
    "construction. Scale: the window sorts price LEVELS per priority "
    "group, not raw rows, and the join back is an equi-join on "
    "(priority, price).",
)
def pareto_order_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    pl = o.groupBy("o_orderpriority", F.col("o_totalprice").alias("p")).agg(
        F.max("o_orderdate").alias("dmax")
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("p").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = pl.withColumn("better", F.max("dmax").over(w)).alias("r")
    oa = o.alias("o")
    return (
        oa.join(
            run,
            (F.col("o.o_orderpriority") == F.col("r.o_orderpriority"))
            & (F.col("o.o_totalprice") == F.col("r.p")),
        )
        .filter(
            (
                F.col("r.better").isNull()
                | (F.col("o.o_orderdate") > F.col("r.better"))
            )
            & (F.col("o.o_orderdate") == F.col("r.dmax"))
        )
        .select(
            F.col("o.o_orderpriority"),
            F.col("o.o_orderkey"),
            F.col("o.o_totalprice"),
            F.col("o.o_orderdate"),
        )
    )


# --- incremental dedup ------------------------------------------------------


def _incremental_minhash_oracle() -> str:
    from database_synchronize_tool_spark.plans.extensions import (
        _band_union_sql,
        _HASHES_SQL,
        _minhash_cols_sql,
        _sig_matches_sql,
    )

    jacc = (
        "len(list_intersect(sa.sh, sb.sh)) "
        "/ greatest(len(list_distinct(list_concat(sa.sh, sb.sh))), 1)"
    )
    return f"""
    WITH sh AS (
      SELECT doc_id, list_distinct({_HASHES_SQL}) AS sh, {_HASHES_SQL} AS hs
      FROM documents
    ), sigs AS (
      SELECT doc_id, {_minhash_cols_sql()} FROM sh
    ), bands AS (
      {_band_union_sql()}
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_new, b.doc_id AS doc_old
      FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
      WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7
    ), pre AS (
      SELECT doc_new, doc_old
      FROM cand JOIN sigs ga ON ga.doc_id = cand.doc_new
                JOIN sigs gb ON gb.doc_id = cand.doc_old
      WHERE ({_sig_matches_sql()}) >= {DD.MIN_SIG_MATCHES}
    )
    SELECT doc_new, doc_old, jacc FROM (
      SELECT doc_new, doc_old, {jacc} AS jacc
      FROM pre JOIN sh sa ON sa.doc_id = pre.doc_new
               JOIN sh sb ON sb.doc_id = pre.doc_old
    ) WHERE jacc >= 0.8
    """


@declared(
    "dedup_minhash_incremental",
    oracle=None,  # assigned below — needs extensions' SQL builders loaded
    doc="Incremental ingestion dedup: which documents of a NEW batch "
    "(doc_id%10=7) near-duplicate the EXISTING corpus? The bipartite "
    "MinHash-LSH band join a training pipeline runs per batch — the new "
    "side's banded signatures BROADCAST, the corpus streams through the "
    "probe with no corpus-side shuffle at all (vs. the self-join, which "
    "shuffles the entire corpus by band key to compare a sliver of it). "
    "Same signature family and Jaccard >= 0.8 verify as dedup_minhash_lsh "
    "so the oracle reuses its hash SQL with a side split.",
)
def dedup_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    new = d.filter(F.col("doc_id") % 10 == 7)
    corpus = d.filter(F.col("doc_id") % 10 != 7)
    return DD.minhash_lsh_join(new, corpus, threshold=0.8)


def _patch_incremental_oracle() -> None:
    """Late-bind the incremental oracle: its SQL builders live in
    extensions.py, which is loaded by the same registry sweep that loads
    this module — a direct import at decoration time would cycle."""
    from database_synchronize_tool_spark.plans import registry

    q = registry._REGISTRY["dedup_minhash_incremental"]
    registry._REGISTRY["dedup_minhash_incremental"] = registry.Declared(
        q.name, q.builder, _incremental_minhash_oracle(), q.doc
    )


_patch_incremental_oracle()


# --- HLL set algebra (round-9 third wave) ------------------------------------

_W1 = MB.HLL_W + 1


@declared(
    "sketch_hll_intersection",
    oracle=f"""
    WITH s AS (
      SELECT CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                  THEN 'a' ELSE 'b' END AS side,
             {_h60_sql("CAST(o_custkey AS VARCHAR)")} AS h
      FROM orders
    ),
    r AS (
      SELECT side, h % {MB.HLL_M} AS reg,
             CASE WHEN h // {MB.HLL_M} = 0 THEN {_W1}
                  ELSE {_W1} - length(bin(h // {MB.HLL_M}))
             END AS rho
      FROM s
    ),
    m AS (SELECT side, reg, MAX(rho) AS mx FROM r GROUP BY 1, 2),
    mu AS (SELECT reg, MAX(mx) AS mx FROM m GROUP BY 1),
    est AS (
      SELECT side,
             {MB.HLL_NUMERATOR!r} / CAST(
               CAST(SUM(CAST(1 AS BIGINT) << CAST({_W1} - mx AS INT))
                    AS BIGINT)
               + ({MB.HLL_M} - COUNT(*))
                 * (CAST(1 AS BIGINT) << {_W1}) AS DOUBLE) AS est
      FROM m GROUP BY side
    ),
    estu AS (
      SELECT {MB.HLL_NUMERATOR!r} / CAST(
               CAST(SUM(CAST(1 AS BIGINT) << CAST({_W1} - mx AS INT))
                    AS BIGINT)
               + ({MB.HLL_M} - COUNT(*))
                 * (CAST(1 AS BIGINT) << {_W1}) AS DOUBLE) AS est_union
      FROM mu
    ),
    ex AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection FROM (
        SELECT o_custkey FROM orders GROUP BY o_custkey
        HAVING SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                        THEN 1 ELSE 0 END) > 0
           AND SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                        THEN 1 ELSE 0 END) > 0
      )
    )
    SELECT ea.est AS est_a, eb.est AS est_b, estu.est_union,
           ea.est + eb.est - estu.est_union AS est_intersection,
           ex.exact_intersection
    FROM (SELECT est FROM est WHERE side = 'a') ea,
         (SELECT est FROM est WHERE side = 'b') eb, estu, ex
    """,
    doc="HLL set algebra: estimate the customer overlap between the early "
    "(< 1998) and late >= 1998 order eras by inclusion-exclusion — "
    "est(A) + est(B) - est(A union B), where the union sketch is the "
    "register-wise MAX of the two sides' registers (the merge whose "
    "exactness sketch_hll_register_merge proves). The exact overlap "
    "rides along as the witness. This is the 100 TB audience-overlap "
    "query: per-side state is 256 integers, the union costs a register "
    "merge instead of a distinct-join of two id sets. The raw estimator "
    "and the one-double-division discipline are shared with "
    "sketch_hll_distinct_orders; inclusion-exclusion adds two IEEE "
    "adds/subtracts written with the same association on both engines.",
)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cut = F.lit("1998-01-01").cast("timestamp")
    sides = o.select(
        F.when(F.col("o_orderdate") < cut, "a").otherwise("b").alias("side"),
        "o_custkey",
    )
    from database_synchronize_tool_spark.caching import scoped_persist

    # the 512-row register table feeds BOTH the per-side estimates and the
    # union merge — without the persist each branch re-scans orders
    regs = scoped_persist(MB.hll_registers(sides, "o_custkey", ["side"]))
    est = MB.hll_estimate(regs, ["side"])
    pair = est.agg(
        F.max(F.when(F.col("side") == "a", F.col("hll_est"))).alias("est_a"),
        F.max(F.when(F.col("side") == "b", F.col("hll_est"))).alias("est_b"),
    )
    union_regs = regs.groupBy("reg").agg(F.max("mx").alias("mx"))
    est_u = MB.hll_estimate(union_regs, []).select(
        F.col("hll_est").alias("est_union")
    )
    early = F.sum(F.when(F.col("o_orderdate") < cut, 1).otherwise(0))
    late = F.sum(F.when(F.col("o_orderdate") >= cut, 1).otherwise(0))
    exact = (
        o.groupBy("o_custkey")
        .agg(early.alias("e"), late.alias("l"))
        .filter((F.col("e") > 0) & (F.col("l") > 0))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    return (
        pair.crossJoin(F.broadcast(est_u))
        .crossJoin(F.broadcast(exact))
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersection"
            ),
            "exact_intersection",
        )
    )


# --- link prediction: common neighbors / neighborhood Jaccard ----------------

_CN_HOT_CAP = 200  # skip hub parts: fan-out cap for the pair generation
_CN_TOPK = 25


@declared(
    "graph_common_neighbors_topk",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem
    ), pdeg AS (
      SELECT p, CAST(COUNT(*) AS BIGINT) AS dp FROM edges GROUP BY p
    ), kept AS (
      SELECT e.s, e.p FROM edges e JOIN pdeg USING (p)
      WHERE pdeg.dp <= {_CN_HOT_CAP}
    ), sdeg AS (
      SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM kept GROUP BY s
    ), pairs AS (
      SELECT a.s AS supp_a, b.s AS supp_b, CAST(COUNT(*) AS BIGINT) AS common
      FROM kept a JOIN kept b ON a.p = b.p AND a.s < b.s
      GROUP BY 1, 2
    ), scored AS (
      SELECT supp_a, supp_b, common, da.d AS deg_a, db.d AS deg_b,
             CAST(common AS DOUBLE)
               / CAST(da.d + db.d - common AS DOUBLE) AS jaccard
      FROM pairs JOIN sdeg da ON da.s = pairs.supp_a
                 JOIN sdeg db ON db.s = pairs.supp_b
    )
    SELECT supp_a, supp_b, common, deg_a, deg_b, jaccard,
           CAST(rank AS INT) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        ORDER BY jaccard DESC, supp_a, supp_b) AS rank
      FROM scored
    ) WHERE rank <= {_CN_TOPK}
    """,
    doc=f"Link prediction on the supplier–part bipartite graph: top-"
    f"{_CN_TOPK} supplier pairs by neighborhood Jaccard (shared parts / "
    "union of part sets) — the collaborative-filtering / entity-"
    "resolution primitive ('suppliers that stock like you'). Scale "
    "shape: the classic similarity-join discipline — distinct edges "
    f"first, HUB CAP second (parts with > {_CN_HOT_CAP} suppliers are "
    "dropped BEFORE pair generation, bounding the per-part fan-out at "
    "cap^2 — a hub with 1e6 neighbors would otherwise mint 1e12 pairs; "
    "the cap is part of the declared semantics so the oracle mirrors "
    "it), pair counts via one equi-join on part, degrees join back as "
    "broadcasts, global top-k via TakeOrderedAndProject. Jaccard is ONE "
    "exact-integer division; ranking ties break on the (supp_a, supp_b) "
    "key.",
)
def graph_common_neighbors_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from database_synchronize_tool_spark.caching import scoped_persist
    from database_synchronize_tool_spark.operators.ranks import topk_ranked

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p")
    ).distinct()
    pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("dp"))
    kept = scoped_persist(
        edges.join(pdeg.filter(F.col("dp") <= _CN_HOT_CAP), "p").select(
            "s", "p"
        )
    )
    sdeg = kept.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    a, b = kept.alias("a"), kept.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(
            F.col("a.s").alias("supp_a"), F.col("b.s").alias("supp_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("common"))
    )
    da = sdeg.select(F.col("s").alias("supp_a"), F.col("d").alias("deg_a"))
    db = sdeg.select(F.col("s").alias("supp_b"), F.col("d").alias("deg_b"))
    scored = (
        pairs.join(F.broadcast(da), "supp_a")
        .join(F.broadcast(db), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            "common",
            "deg_a",
            "deg_b",
            (
                F.col("common").cast("double")
                / (F.col("deg_a") + F.col("deg_b") - F.col("common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )
    return topk_ranked(
        scored,
        _CN_TOPK,
        [F.col("jaccard").desc(), F.col("supp_a"), F.col("supp_b")],
    ).select(
        "supp_a",
        "supp_b",
        "common",
        "deg_a",
        "deg_b",
        "jaccard",
        F.col("rank").cast("int").alias("rank"),
    )
