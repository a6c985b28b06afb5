"""Parity pins for the r16 driver-local exact trainers.

The bounded-corpus local branches of ``train_pq_codebooks_exact`` /
``train_opq_pq_exact`` and the BPE trainers must be BIT-IDENTICAL to their
distributed forms — the optimization moves where the integer arithmetic
runs (one collected copy in the driver instead of 2 Spark jobs per
training round), never what it computes. Each test runs the public
function twice: once normally (local branch, corpus under the cap) and
once with the bounded-collect helper monkeypatched to report overflow
(forcing the distributed loop), and asserts identical rows.
"""

from __future__ import annotations

from database_synchronize_tool_spark.catalog import load_table
from database_synchronize_tool_spark.operators import bpe as BPE
from database_synchronize_tool_spark.operators import similarity as SIM


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_local_pq_trainer_matches_distributed(spark, sf_dir, monkeypatch):
    e = load_table(spark, sf_dir, "embeddings")
    local = _rows(SIM.train_pq_codebooks_exact(e))
    monkeypatch.setattr(SIM, "_collect_bounded_rows", lambda *a, **k: None)
    assert _rows(SIM.train_pq_codebooks_exact(e)) == local


def test_local_residual_pq_trainer_matches_distributed(
    spark, sf_dir, monkeypatch
):
    e = load_table(spark, sf_dir, "embeddings")
    cents = SIM.seed_centroids(e, 16)
    res = SIM.ivf_residuals(e, cents)
    local = _rows(SIM.train_pq_codebooks_exact(res, id_col="vid", vec_col="v"))
    monkeypatch.setattr(SIM, "_collect_bounded_rows", lambda *a, **k: None)
    assert (
        _rows(SIM.train_pq_codebooks_exact(res, id_col="vid", vec_col="v"))
        == local
    )


def test_local_opq_trainer_matches_distributed(spark, sf_dir, monkeypatch):
    e = load_table(spark, sf_dir, "embeddings")
    rot_l, opq_l, plain_l, r_l = SIM.train_opq_pq_exact(e, with_rotation=True)
    rot_l_rows, opq_l_rows, plain_l_rows = (
        _rows(rot_l),
        _rows(opq_l),
        _rows(plain_l),
    )
    monkeypatch.setattr(SIM, "_collect_bounded_rows", lambda *a, **k: None)
    rot_d, opq_d, plain_d, r_d = SIM.train_opq_pq_exact(e, with_rotation=True)
    assert (r_l == r_d).all()
    assert opq_l_rows == _rows(opq_d)
    assert plain_l_rows == _rows(plain_d)
    assert rot_l_rows == _rows(rot_d)


def test_local_bpe_sequential_matches_distributed(spark, sf_dir, monkeypatch):
    d = load_table(spark, sf_dir, "documents")
    merges = _rows(BPE.train_bpe_merges(d, n_merges=6))
    counts = _rows(BPE.bpe_learned_token_counts(d, n_merges=6))
    monkeypatch.setattr(BPE, "_collect_word_freqs", lambda *a, **k: None)
    assert _rows(BPE.train_bpe_merges(d, n_merges=6)) == merges
    assert _rows(BPE.bpe_learned_token_counts(d, n_merges=6)) == counts


def test_local_bpe_batched_matches_distributed(spark, sf_dir, monkeypatch):
    d = load_table(spark, sf_dir, "documents")
    local = _rows(
        BPE.train_bpe_merges_batched(d, n_merges=20, batch_k=8, cand_m=64)
    )
    lcounts = _rows(BPE.bpe_learned_token_counts(d, n_merges=20, batch_k=8))
    monkeypatch.setattr(BPE, "_collect_word_freqs", lambda *a, **k: None)
    assert (
        _rows(BPE.train_bpe_merges_batched(d, n_merges=20, batch_k=8, cand_m=64))
        == local
    )
    assert (
        _rows(BPE.bpe_learned_token_counts(d, n_merges=20, batch_k=8))
        == lcounts
    )


def test_bounded_collect_overflow_returns_none(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    base = e.selectExpr("vec_id AS sid", "CAST(embedding AS array<double>) AS v")
    assert SIM._collect_bounded_rows(base, cap=10) is None
    d = load_table(spark, sf_dir, "documents")
    assert BPE._collect_word_freqs(d, "text", cap=3) is None
