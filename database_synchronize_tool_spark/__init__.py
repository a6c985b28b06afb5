"""database_synchronize_tool_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL/sync service ``bxljoy/database-synchronize-tool``
(see SURVEY.md): incremental high-watermark table sync, keyed merge/upsert,
object-store file-set algebra, and a typed cast/normalize expression library —
plus the large-scale training-data-pipeline surface (dedup, similarity search,
text analysis, multimodal columns) the reference does not have.

Everything is declared through the DataFrame/SQL API so Catalyst handles
predicate pushdown, column pruning, join strategy and AQE; Python UDFs appear
only where semantics genuinely cannot be expressed with built-in functions
(and then only as Arrow-vectorized pandas UDFs).

Layout:
    session        SparkSession factory tuned for the local[32] harness
    catalog        testdata tables (parquet) + temp-view registration
    functions/     scalar expression library (normalize/compat, text, vectors)
    operators/     merge/upsert, watermark delta, dedup, similarity, filesync
    sources/       parquet/listing/JDBC source & sink builders
    plans/         the declared-query registry consumed by __spark_entry__
    streaming/     incremental watermark runner + windowed event queries
    runner         multi-table orchestration (per-table error isolation)
"""

__version__ = "0.1.0"

from database_synchronize_tool_spark.session import get_spark  # noqa: F401
