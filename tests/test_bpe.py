"""BPE merge training: parity with a canonical reference implementation
(Sennrich et al. 2016 greedy skip-ahead scan), including the repeated-pair
run edge cases the merge fold must get right, and the monotone
compression witness."""

from __future__ import annotations

from collections import Counter

from database_synchronize_tool_spark.operators.bpe import (
    BPE_EOW,
    train_bpe_merges,
)


def _canonical_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference BPE trainer: dict-of-tuples symbol sequences, canonical
    skip-ahead merge scan (after merging at i, continue at i+2)."""
    seqs = {tuple(w) + (BPE_EOW,): f for w, f in word_freqs.items()}
    out = []
    for step in range(1, n_merges + 1):
        counts: Counter = Counter()
        for syms, f in seqs.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), cnt = best
        new_seqs: dict = {}
        for syms, f in seqs.items():
            merged = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    merged.append(a + b)
                    j += 2
                else:
                    merged.append(syms[j])
                    j += 1
            new_seqs[tuple(merged)] = new_seqs.get(tuple(merged), 0) + f
        seqs = new_seqs
        tokens_after = sum(f * len(syms) for syms, f in seqs.items())
        out.append((step, a, b, a + b, cnt, tokens_after))
    return out


def test_train_matches_canonical_reference(spark):
    # run-heavy words exercise the fold's skip-ahead semantics: within one
    # (a, b) pass a just-merged 'ab' must not act as the left of another
    # merge ("aaaa" -> "aa aa", "aaaaa" -> "aa aa a", never "a aaa ...")
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat aaaa"),
            (2, "the cat ran aaaaa abab"),
            (3, "mat mat mat the the banana"),
            (4, "abababab banana cat"),
        ],
        "doc_id long, text string",
    )
    word_freqs: Counter = Counter()
    for _, t in docs.collect():
        for w in t.lower().split():
            word_freqs[w] += 1
    want = _canonical_bpe(dict(word_freqs), 8)
    got = [tuple(r) for r in train_bpe_merges(docs, n_merges=8).collect()]
    assert got == want, (got, want)


def test_tokens_after_is_monotone_and_counts_drop(spark, sf_dir):
    from database_synchronize_tool_spark.catalog import load_table

    d = load_table(spark, sf_dir, "documents").limit(100)
    rows = train_bpe_merges(d, n_merges=5).collect()
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    toks = [r["tokens_after"] for r in rows]
    # each merge removes exactly pair_count-applied symbols, so the
    # corpus token count strictly decreases while merges exist
    assert all(a > b for a, b in zip(toks, toks[1:]))
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in rows)
    assert all(r["pair_count"] > 0 for r in rows)


def test_learned_counts_match_canonical(spark):
    from database_synchronize_tool_spark.operators.bpe import (
        bpe_learned_token_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat aaaa"),
            (2, "the cat ran aaaaa abab"),
            (3, "mat mat mat the the banana"),
            (4, "abababab banana cat"),
            (5, ""),  # wordless doc -> 0 tokens
        ],
        "doc_id long, text string",
    )
    word_freqs: Counter = Counter()
    for _, t in docs.collect():
        for w in t.lower().split():
            word_freqs[w] += 1
    # canonical training, then replay the merge list on each word
    merges = [(a, b) for _, a, b, _, _, _ in _canonical_bpe(dict(word_freqs), 6)]
    vocab: dict[str, int] = {}
    for w in word_freqs:
        syms = list(w) + [BPE_EOW]
        for a, b in merges:
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(a + b)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            syms = out
        vocab[w] = len(syms)
    want = {
        did: sum(vocab[w] for w in t.lower().split())
        for did, t in docs.collect()
    }
    got = {
        r["doc_id"]: r["n_bpe_tokens_learned"]
        for r in bpe_learned_token_counts(docs, n_merges=6).collect()
    }
    assert got == want, (got, want)


def _canonical_batched_bpe(
    word_freqs: dict[str, int], n_merges: int, k: int, m: int
):
    """Reference BATCHED trainer: per round, count pairs, take the top-m
    candidate list, greedily pick up to k symbol-disjoint pairs (left,
    right, and merged symbol all unused), apply all picks, emit slot-
    numbered rows with round-start counts and round-end token totals."""
    seqs = {tuple(w) + (BPE_EOW,): f for w, f in word_freqs.items()}
    out = []
    n_rounds = -(-n_merges // k)
    for rnd in range(n_rounds):
        take = min(k, n_merges - rnd * k)
        counts: Counter = Counter()
        for syms, f in seqs.items():
            for j in range(len(syms) - 1):
                counts[(syms[j], syms[j + 1])] += f
        cands = sorted(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )[:m]
        used: set = set()
        picked = []
        for (a, b), cnt in cands:
            if a in used or b in used or a + b in used:
                continue
            picked.append((a, b, cnt))
            used.update((a, b, a + b))
            if len(picked) >= take:
                break
        for a, b, _ in picked:
            new_seqs: dict = {}
            for syms, f in seqs.items():
                merged = []
                j = 0
                while j < len(syms):
                    if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                        merged.append(a + b)
                        j += 2
                    else:
                        merged.append(syms[j])
                        j += 1
                new_seqs[tuple(merged)] = new_seqs.get(tuple(merged), 0) + f
            seqs = new_seqs
        tokens_after = sum(f * len(syms) for syms, f in seqs.items())
        for slot, (a, b, cnt) in enumerate(picked, 1):
            out.append((rnd * k + slot, a, b, a + b, cnt, tokens_after))
    return out


def test_batched_train_matches_canonical_reference(spark):
    """r15 (verdict #6): the batched trainer's rounds — bounded candidate
    list, greedy symbol-disjoint selection with the merged-symbol guard,
    slot-numbered emission — match a canonical in-memory implementation,
    including the run-heavy fold edge cases and the 'a'+'b'='ab'-exists
    collision the disjointness guard covers."""
    from database_synchronize_tool_spark.operators.bpe import (
        train_bpe_merges_batched,
    )

    texts = [
        "aaaa aaaa aa ab ab ab b",          # self-overlap runs + 'ab' word
        "banana bandana banana",            # shared prefixes
        "low lower lowest low low",         # classic Sennrich example
        "xy xy xyz zyx yx",                 # adjacent-pair collisions
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
    )
    freqs: Counter = Counter()
    for t in texts:
        for w in t.split():
            freqs[w] += 1
    for n, k, m in ((7, 3, 16), (10, 4, 8), (5, 8, 64)):
        want = _canonical_batched_bpe(dict(freqs), n, k, m)
        got = [
            tuple(r)
            for r in train_bpe_merges_batched(
                docs, n_merges=n, batch_k=k, cand_m=m
            ).collect()
        ]
        assert got == want, (n, k, m)


def _canonical_wordpiece(word: str, vocab: set[str], max_piece: int):
    """Reference greedy longest-match-first WordPiece walk."""
    pieces = []
    pos = 0
    while pos < len(word):
        for ln in range(min(max_piece, len(word) - pos), 0, -1):
            c = word[pos : pos + ln]
            if c in vocab:
                break
        pieces.append("##" + c if pos else c)
        pos += ln
    return pieces


def test_wordpiece_segmentation_matches_canonical(spark):
    """r15: the mapInPandas walk == the canonical greedy reference on a
    corpus where the derived vocab is hand-checkable, and the roundtrip
    invariant holds (pieces reassemble the word; every piece in vocab)."""
    from database_synchronize_tool_spark.operators.bpe import (
        WP_MAX_PIECE,
        wordpiece_segment_topwords,
        wordpiece_vocab,
    )

    docs = spark.createDataFrame(
        [(i, "the theme thesis there unthinkable " * 3) for i in range(4)]
        + [(99, "zz")],
        "doc_id bigint, text string",
    )
    vocab = {r["piece"] for r in wordpiece_vocab(docs).collect()}
    # every character of every corpus word is in the vocab
    for w in ("the", "theme", "thesis", "there", "unthinkable", "zz"):
        assert set(w) <= vocab
    rows = {r["word"]: r for r in wordpiece_segment_topwords(docs).collect()}
    assert set(rows) == {"the", "theme", "thesis", "there", "unthinkable", "zz"}
    for w, r in rows.items():
        expect = _canonical_wordpiece(w, vocab, WP_MAX_PIECE)
        got = r["wordpieces"].split(" ")
        assert got == expect, (w, got, expect)
        assert r["n_pieces"] == len(expect)
        # roundtrip: strip '##' marks and the word reassembles
        assert "".join(p.removeprefix("##") for p in got) == w
        assert all(p.removeprefix("##") in vocab for p in got)
    # 'the' is the dominant 3-gram: it must be a single piece
    assert rows["the"]["n_pieces"] == 1
