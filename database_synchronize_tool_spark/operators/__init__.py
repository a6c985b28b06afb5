"""Relational/dataflow operators re-expressed Spark-first."""
