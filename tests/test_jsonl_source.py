"""read_jsonl: schema-enforced JSONL ingestion with corrupt-record
quarantine — good rows parse, bad lines land in the quarantine frame with
the raw text preserved, and nothing is silently dropped."""

from __future__ import annotations

from database_synchronize_tool_spark.sources.readers import read_jsonl

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    "this is not json at all",
    '{"doc_id": "not-an-int", "text": "type clash", "lang": "en"}',
    '{"doc_id": 5, "text": null, "lang": "de"}',
]


def _write(tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_jsonl_good_and_quarantine_split(spark, tmp_path):
    good, quarantined = read_jsonl(
        spark, _write(tmp_path), "doc_id BIGINT, text STRING, lang STRING"
    )
    g = {r.doc_id: (r.text, r.lang) for r in good.collect()}
    # null field is valid JSON and parses; type-clash + garbage quarantine
    assert g == {1: ("hello world", "en"), 2: ("bonjour", "fr"), 5: (None, "de")}
    q = [r.raw_line for r in quarantined.collect()]
    assert "this is not json at all" in q
    assert any("not-an-int" in l for l in q)
    # audit invariant: nothing dropped
    assert good.count() + quarantined.count() == len(LINES)


def test_jsonl_good_frame_has_no_corrupt_column(spark, tmp_path):
    good, _ = read_jsonl(
        spark, _write(tmp_path), "doc_id BIGINT, text STRING, lang STRING"
    )
    assert "_corrupt_record" not in good.columns
