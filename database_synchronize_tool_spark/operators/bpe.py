"""Distributed BPE merge training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public literature).

The engine already COUNTS BPE-ish tokens against a fixed regex vocab
(``functions.text`` / ``text_bpe_token_count``); this module trains the
merge table itself, the way fast BPE trainers do: on the distinct-word
frequency table, not the raw corpus. Reference parity note: the reference
tool has no tokenizer training — this is part of the LLM-data-pipeline
surface the build adds on top (SURVEY.md §6).

Algorithm (canonical): represent each word as a symbol sequence (chars +
a ``</w>`` end marker), then repeat: count adjacent symbol pairs weighted
by word frequency, merge the most frequent pair everywhere, emit it. The
scan-after-merge rule (after merging at position i, continue at i+2) is
implemented as a left fold with the key observation that within one pass
of pair (a, b) a just-merged symbol ``ab`` can never be the LEFT of
another (a, b) merge (``ab != a`` since b is non-empty), so the fold
needs no lookahead state:

    step(acc, x) = acc || x          if last_symbol(acc) = a and x = b
                   acc || ' ' || x   otherwise

— appending WITHOUT the separator IS the merge. The same fold runs as
``F.aggregate`` on the Spark side and ``list_reduce`` in the DuckDB
oracle, so training replays bit-identically (the integer-Lloyd /
Newton-Schulz discipline applied to tokenizer training). Determinism:
integer pair counts, best pair = (count DESC, pair-string ASC) — binary
collation on both engines.

Scale shape: ONE corpus scan builds the (word, freq) table (the only
corpus-sized shuffle); every iteration then costs O(vocabulary) — an
explode+groupBy pair count over distinct words, a 1-row argmax collect
(bounded index metadata), and a narrow fold map. The corpus is never
rescanned; at 100 TB the vocabulary table is what iterates, exactly like
fast word-level BPE trainers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# word split shared with the hashed-bigram selectors (sampling.py) and
# _WORDHASH_SQL: lowercase, split on non-alphanumerics, drop empties
BPE_WORD_SPLIT = "[^a-z0-9]+"
BPE_EOW = "</w>"  # end-of-word marker, per Sennrich et al.


def _fold_str(s, a: str, b: str):
    """Column expression applying one merge (a, b) -> ab to a space-joined
    symbol string — the lookahead-free left fold documented in the module
    docstring."""
    syms = F.split(s, " ")
    return F.aggregate(
        F.slice(syms, 2, F.size(syms) - 1),
        F.element_at(syms, 1),
        lambda acc, x: F.when(
            (F.regexp_extract(acc, "([^ ]*)$", 1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def _train_vocab(
    docs: DataFrame, n_merges: int, text_col: str
) -> tuple[DataFrame, list[tuple]]:
    """Shared training loop: returns the final (word, freq, seq) vocab
    table (persisted) and the merge rows — train_bpe_merges emits the
    rows, bpe-apply consumers join the vocab."""
    from database_synchronize_tool_spark.caching import scoped_persist

    words = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), BPE_WORD_SPLIT),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    cur = scoped_persist(
        words.select(
            "word",
            "freq",
            # "hello" -> "h e l l o </w>" (single-space separated symbols)
            F.concat(
                F.regexp_replace("word", "(.)", "$1 "), F.lit(BPE_EOW)
            ).alias("seq"),
        )
    )
    rows = []
    for step in range(1, n_merges + 1):
        syms = F.split(F.col("seq"), " ")
        pair_counts = (
            cur.select(
                "freq",
                F.explode(
                    # adjacent pairs, OVERLAPPING (runs count each zip
                    # position — the canonical counting statistic)
                    F.transform(
                        F.slice(syms, 1, F.size(syms) - 1),
                        lambda x, i: F.concat(
                            x, F.lit(" "), F.element_at(syms, i + F.lit(2))
                        ),
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pair_counts.orderBy(F.col("cnt").desc(), F.col("pair"))
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"BPE training exhausted all pairs after {step - 1} merges "
                f"(every word is a single symbol); lower n_merges"
            )
        left_sym, right_sym = best[0]["pair"].split(" ")
        cur = scoped_persist(
            cur.withColumn("seq", _fold_str(F.col("seq"), left_sym, right_sym))
        )
        tokens_after = cur.agg(
            F.sum(
                F.size(F.split(F.col("seq"), " ")).cast("bigint")
                * F.col("freq")
            ).alias("t")
        ).collect()[0]["t"]
        rows.append(
            (
                step,
                left_sym,
                right_sym,
                left_sym + right_sym,
                int(best[0]["cnt"]),
                int(tokens_after),
            )
        )
    return cur, rows


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges over the corpus; returns the merge
    table (step, left_sym, right_sym, merged, pair_count, tokens_after)
    — bounded training metadata, like the Lloyd centroid tables.
    ``tokens_after`` is the corpus token count after applying the step's
    merge (freq-weighted symbol count over the vocabulary), the monotone
    compression witness."""
    _, rows = _train_vocab(docs, n_merges, text_col)
    return docs.sparkSession.createDataFrame(
        rows,
        "step int, left_sym string, right_sym string, merged string, "
        "pair_count bigint, tokens_after bigint",
    )


def bpe_learned_token_counts(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token counts under the LEARNED merges — the inference
    side of :func:`train_bpe_merges` consuming its vocab (the 'optionally
    consuming the learned table' leg of the r13 verdict #6): each doc's
    count is the sum, over its word occurrences, of the trained vocab's
    per-word symbol count. One doc->word explode joined against the
    vocab's (word, n_syms) — the vocab is distinct-word-bounded (broadcast
    at moderate scale, an ordinary shuffle join past it), never a per-doc
    re-segmentation."""
    vocab, _ = _train_vocab(docs, n_merges, text_col)
    per_word = vocab.select(
        "word", F.size(F.split("seq", " ")).cast("bigint").alias("n_syms")
    )
    docw = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), BPE_WORD_SPLIT),
                lambda t: t != "",
            )
        ).alias("word"),
    )
    counts = (
        docw.join(per_word, "word")
        .groupBy("doc_id")
        .agg(F.sum("n_syms").cast("bigint").alias("n"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n", F.lit(0)).cast("bigint").alias(
                "n_bpe_tokens_learned"
            ),
        )
    )


def bpe_segment(text, merges: list[tuple[str, str]]):
    """Column expression segmenting ``text`` with a LEARNED merge list
    (the inference side of :func:`train_bpe_merges`): lowercase word
    split, char+``</w>`` init, then the same fold per merge in training
    order. Returns the array of per-word space-joined symbol strings —
    callers count tokens via the summed symbol counts."""
    words = F.filter(F.split(F.lower(text), BPE_WORD_SPLIT), lambda t: t != "")
    seqs = F.transform(
        words,
        lambda w: F.concat(F.regexp_replace(w, "(.)", "$1 "), F.lit(BPE_EOW)),
    )
    for a, b in merges:
        seqs = F.transform(seqs, lambda s: _fold_str(s, a, b))
    return seqs

