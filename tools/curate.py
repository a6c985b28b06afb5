"""Run the corpus-curation pipeline end to end and write the curated
corpus as partitioned parquet — the runnable demo of the engine's
training-data path.

Usage: python tools/curate.py [sf_dir] [out_dir]

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/curated_corpus"
    spark = get_spark("curate")
    result = curate_corpus(spark, sf_dir)
    stages = result.counts()
    write_curated_corpus(
        result.sampled, out, partition_by=("lang",), sort_within=("doc_id",)
    )
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    print(json.dumps({"stages": stages, "out": out, "partitions": parts}))


if __name__ == "__main__":
    main()
