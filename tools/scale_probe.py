"""sf1 scale probe for the dedup/ANN family (round-8 verdict, next #8).

The driver ships testdata only up to sf0.1; the 512-bit containment
screen, LSH band parameters, and IVF cell counts were all tuned there.
This tool checks the knees hold one order of magnitude up by generating a
DETERMINISTIC sf1-equivalent corpus under the repo (never touching
/root/testdata) and timing the scale-sensitive queries against it.

Scale-up construction (seeded, idempotent):

- ``documents``: 10 replicas of the sf0.1 table. Each replica applies its
  own random PERMUTATION CIPHER over [a-z]/[A-Z] to every text. A letter
  bijection maps 3-char shingles bijectively, so within a replica every
  pairwise Jaccard/containment value is EXACTLY the sf0.1 value — the
  dup/near-dup structure replicates 10x, while cross-replica texts are
  unrelated word salad (no new near-dup pairs: measured, output counts
  are exactly 10x sf0.1 for every dedup query). NOTE on shingle spaces:
  the ciphers do NOT make replica trigram SETS disjoint — all replicas
  draw from the same 26-letter alphabet, so every shingle's document
  frequency sums across replicas (~10x per shingle). That is the
  REALISTIC model for character-n-gram shingling: the trigram space
  saturates on natural corpora too, so posting lists grow linearly with
  corpus size and posting-list-join candidate volume grows superlinearly.
  The probe therefore measures the saturated-shingle-space regime —
  the regime a 100 TB corpus is actually in — not an artificially
  collision-free one. (Naive row duplication would be WORSE — it would
  also multiply every LSH band bucket and duplicate-pair count 10x.)
- ``embeddings``: 10 replicas, each through its own seeded Haar-random
  ORTHOGONAL rotation. A rotation preserves every within-replica pairwise
  cosine exactly (the semantic-dup/ANN structure replicates 10x verbatim,
  same argument as the letter cipher), while cross-replica cosines are
  ~N(0, 1/sqrt(dim)) — below the 0.35 semantic threshold for all but
  ~0.3% of pairs. Gaussian noise can't do this: at unit norms, noise big
  enough to separate replicas (sigma 0.15+) also wrecks the within-replica
  geometry the probe is supposed to replicate.

Replica 0 is byte-identical to sf0.1 (identity cipher, identity
rotation), so sf0.1 results embed verbatim in the sf1 corpus.

Usage:  python tools/scale_probe.py [--regen]
Prints one JSON line with per-query wall times at sf0.1 and sf1 and the
scaling exponent log10(t1/t0.1); records go to SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".scaledata", "sf1")
N_REPLICAS = 10
ID_STRIDE = 10_000_000

# the scale-sensitive queries the verdict names; everything else in the
# registry is sub-second at sf0.1 and linear by construction.
# containment_prefix LAST: it is the saturated-shingle-space quadratic
# case (hundreds of seconds at sf1) and must not starve the others.
PROBE = (
    "dedup_minhash_lsh",
    "dedup_simhash_banded64",
    "dedup_containment_banded",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_residual_topk",
    "ann_ivf_pq_refine_topk",
    "dedup_semantic_pairs",
    # round-9 third wave corpus queries (documents/embeddings-based, so the
    # replica construction scales them faithfully)
    "text_inverted_index",
    "embedding_zscore_whiten",
    "dedup_containment_prefix",
)

# relational-table probes (orders/lineitem/events replicated 10x by
# generate_relational): the rank/window/temporal wave, whose cost is
# sort/shuffle volume rather than candidate generation.
PROBE_REL = (
    "stats_spearman_rank",
    "stats_weighted_median",
    "stats_auc_mannwhitney",
    "ts_time_weighted_avg",
    "events_rfm_scores",
    "j13_point_in_time_join",
    "stats_cusum_changepoint",
    "profile_column_stats",
)

# round-10 probe wave: (a) the r9-verdict gaps — priority sampling, zone
# maps / data skipping, HLL register merge; (b) every query whose global
# window was rewritten to the range-partitioned two-pass this round — the
# probe verifies the two-pass actually scales (the point of the rewrite).
PROBE_R10 = (
    "sample_weighted_reservoir",
    "sample_weighted_stratified",
    "layout_zonemap_pruning",
    "layout_bloom_skipping",
    "sketch_hll_register_merge",
    "sketch_hll_distinct_orders",
    "stats_calibration_bins",
    "stats_gini_concentration",
    "stats_lorenz_top_share",
    "events_session_concurrency",
    "corpus_drift_ks",
    "window_cume_dist_percent_rank",
    "text_bm25_topk",
    "corpus_bigram_lift_topk",
    "search_hybrid_rrf",
)


def _cipher_table(replica: int) -> dict[int, str]:
    """Per-replica letter bijection; replica 0 = identity."""
    rng = np.random.RandomState(42_000 + replica)
    lo = list("abcdefghijklmnopqrstuvwxyz")
    hi = [c.upper() for c in lo]
    if replica == 0:
        plo, phi = lo, hi
    else:
        plo = [lo[i] for i in rng.permutation(26)]
        phi = [hi[i] for i in rng.permutation(26)]
    return str.maketrans(
        "".join(lo) + "".join(hi), "".join(plo) + "".join(phi)
    )


def generate(force: bool = False) -> None:
    done = os.path.join(DST, "_GENERATED")
    if os.path.exists(done) and not force:
        return
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    d = docs.to_pandas()
    out = []
    for k in range(N_REPLICAS):
        r = d.copy()
        r["doc_id"] = r["doc_id"] + k * ID_STRIDE
        tab = _cipher_table(k)
        r["text"] = r["text"].map(lambda s, t=tab: s.translate(t))
        out.append(r)
    import pandas as pd

    big = pd.concat(out, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(big, preserve_index=False, schema=docs.schema),
        os.path.join(DST, "documents.parquet"),
    )

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    e = emb.to_pandas()
    mat = np.stack(e["embedding"].to_numpy())  # (n, dim) float32
    eout = []
    dim = mat.shape[1]
    for k in range(N_REPLICAS):
        if k == 0:
            rotated = mat
        else:
            rng = np.random.RandomState(99_000 + k)
            # Haar-ish orthogonal matrix: QR of a Gaussian, sign-fixed
            g = rng.normal(size=(dim, dim))
            q, r_ = np.linalg.qr(g)
            q *= np.sign(np.diag(r_))
            rotated = (mat.astype(np.float64) @ q).astype(np.float32)
        r = e.copy()
        r["vec_id"] = r["vec_id"] + k * ID_STRIDE
        r["embedding"] = list(rotated)
        eout.append(r)
    bige = pd.concat(eout, ignore_index=True)
    bige["embedding"] = bige["embedding"].map(
        lambda a: a.astype(np.float32).tolist()
    )
    pq.write_table(
        pa.Table.from_pandas(bige, preserve_index=False, schema=emb.schema),
        os.path.join(DST, "embeddings.parquet"),
    )

    # the probe queries read only documents/embeddings; the rest of the
    # star schema links to the sf0.1 copies so load_table never 404s
    for t in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        link = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), link)
    open(done, "w").write("ok")


# relational 10x replicas (round-9 third/fourth wave probes): key-offset
# copies keep every per-key structure exactly (per-user event sequences,
# per-order lineitems), so rank/window/temporal query OUTPUTS replicate
# 10x while the sort/shuffle volume truly grows 10x — the thing the probe
# measures. Timestamps are NOT shifted: more data in the same time span
# is the realistic firehose model (and keeps CUSUM/TWA spans honest).
_REL_OFFSETS = {
    "supplier": ("s_suppkey",),
    "orders": ("o_orderkey", "o_custkey"),
    "lineitem": ("l_orderkey", "l_partkey", "l_suppkey"),
    "events": ("event_id", "user_id"),
}


def generate_relational(force: bool = False) -> None:
    import pandas as pd

    done = os.path.join(DST, "_GENERATED_REL_V2")
    if os.path.exists(done) and not force:
        return
    for t, keycols in _REL_OFFSETS.items():
        src = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
        schema = src.schema
        base = src.to_pandas()
        out = []
        for k in range(N_REPLICAS):
            r = base.copy()
            for c in keycols:
                # preserve NULLs (nullable user_id): offset only non-null
                r[c] = r[c] + k * ID_STRIDE
            out.append(r)
        big = pd.concat(out, ignore_index=True)
        dst = os.path.join(DST, f"{t}.parquet")
        if os.path.islink(dst):
            os.unlink(dst)
        pq.write_table(
            pa.Table.from_pandas(big, preserve_index=False, schema=schema),
            dst,
        )
    open(done, "w").write("ok")


def main() -> None:
    force = "--regen" in sys.argv
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = tuple(a.split("=", 1)[1].split(","))
    generate(force=force)
    generate_relational(force=force)

    from database_synchronize_tool_spark.caching import cache_scope
    from database_synchronize_tool_spark.catalog import load_table
    from database_synchronize_tool_spark.plans.registry import all_queries
    from database_synchronize_tool_spark.session import get_spark

    # deliberately the PRODUCTION session posture (AQE on): the probe must
    # measure what ships, and the r9 minhash fix exists precisely because
    # an AQE-off probe would have hidden the coalesce-serialization knee
    spark = get_spark("scale_probe", shuffle_partitions=32)
    qs = all_queries()

    # Probe-only variant: the declared dedup_semantic_pairs pins
    # n_cells=16 (its SQL oracle bakes the cell count in), which is the
    # measured quadratic-per-cell case at sf1. The adaptive mode
    # (cells ∝ N) is the documented 100 TB path — measure it too.
    def _semantic_adaptive(spark, sf_dir):
        from database_synchronize_tool_spark.operators.similarity import (
            semantic_dedup_pairs,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        return semantic_dedup_pairs(emb, n_cells=None)

    def _spearman_scalable(spark, sf_dir):
        from pyspark.sql import functions as F

        from database_synchronize_tool_spark.operators.ranks import (
            grouped_doubled_avg_ranks,
        )

        li = load_table(spark, sf_dir, "lineitem")
        g = "l_returnflag"
        r = li.select(g, "l_quantity", "l_extendedprice")
        r = grouped_doubled_avg_ranks(r, g, "l_quantity", "rx2")
        r = grouped_doubled_avg_ranks(r, g, "l_extendedprice", "ry2")
        s_ = r.groupBy(g).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rx2").alias("sx"),
            F.sum("ry2").alias("sy"),
            F.sum(F.col("rx2") * F.col("ry2")).alias("sxy"),
            F.sum(F.col("rx2") * F.col("rx2")).alias("sxx"),
            F.sum(F.col("ry2") * F.col("ry2")).alias("syy"),
        )
        num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        dx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        dy = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
        return s_.select(g, (num / (dx * dy)).alias("spearman_rho"))

    extra = {
        "dedup_semantic_pairs_adaptive": _semantic_adaptive,
        "stats_spearman_scalable": _spearman_scalable,
    }
    result: dict[str, dict[str, float]] = {}
    for sf_name, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
        for t in ("documents", "embeddings", "orders", "lineitem", "events",
                  "supplier"):
            load_table(spark, sf_dir, t).cache().count()
        for name in PROBE + PROBE_REL + PROBE_R10 + tuple(extra):
            if only is not None and name not in only:
                continue
            builder = extra[name] if name in extra else qs[name].builder
            # ONE timed collect per (sf, query): the table cache above
            # removes IO noise, and at sf1 the heavy queries run minutes —
            # a warm-up pass would double the probe cost for a knee
            # measurement that cares about 2x-vs-20x, not 2%.
            with cache_scope():
                t0 = time.perf_counter()
                n = len(builder(spark, sf_dir).collect())
                el = round(time.perf_counter() - t0, 3)
            result.setdefault(name, {})[sf_name] = el
            result[name][f"{sf_name}_rows"] = n
            print(f"# {sf_name} {name}: {el:.3f}s ({n} rows)", file=sys.stderr)
        spark.catalog.clearCache()

    for name, r in result.items():
        if "sf1" in r and "sf0.1" in r:
            r["scaling_x"] = round(r["sf1"] / max(r["sf0.1"], 1e-3), 2)
    print(json.dumps({"probe": result, "replicas": N_REPLICAS}))


if __name__ == "__main__":
    main()
