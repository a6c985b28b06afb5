"""Run the corpus-curation pipeline end to end and write the curated
corpus as partitioned parquet — the runnable demo of the engine's
training-data path.

Usage: python tools/curate.py [sf_dir] [out_dir]
       python tools/curate.py --jsonl corpus.jsonl [out_dir]

With --jsonl the corpus comes from a JSON-lines file (schema doc_id BIGINT,
text STRING, lang STRING, source STRING; bad lines are quarantined and
counted) and the semantic-dedup stage is skipped (no embeddings yet).

Prints ONE JSON line: per-stage row counts plus the output layout, e.g.
    {"stages": {"corpus": 500, ..., "sampled": 318},
     "out": "/tmp/curated", "partitions": ["lang=en", ...]}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from database_synchronize_tool_spark.pipeline import curate_corpus
from database_synchronize_tool_spark.session import get_spark
from database_synchronize_tool_spark.sources.sinks import write_curated_corpus


def main() -> None:
    args = sys.argv[1:]
    spark = get_spark("curate")
    quarantined = None
    if args and args[0] == "--jsonl":
        from database_synchronize_tool_spark.sources.readers import read_jsonl

        path = args[1]
        out = args[2] if len(args) > 2 else "/tmp/curated_corpus"
        good, bad = read_jsonl(
            spark, path, "doc_id BIGINT, text STRING, lang STRING, source STRING"
        )
        quarantined = bad.count()
        result = curate_corpus(spark, docs=good)
    else:
        sf_dir = args[0] if args else "/root/testdata/sf0.01"
        out = args[1] if len(args) > 1 else "/tmp/curated_corpus"
        result = curate_corpus(spark, sf_dir)
    stages = result.counts()
    if quarantined is not None:
        stages["quarantined_lines"] = quarantined
    write_curated_corpus(
        result.sampled, out, partition_by=("lang",), sort_within=("doc_id",)
    )
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    print(json.dumps({"stages": stages, "out": out, "partitions": parts}))


if __name__ == "__main__":
    main()
