"""canvas_data_2_aws_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference project ``Harvard-University-iCommons/canvas-data-2-aws``
(reference checkout at /root/reference/ contains only LICENSE:1-22; all
behavioral claims derive from the publicly documented Canvas Data 2 /
DAP API and ANSI-SQL replica semantics — see SURVEY.md §0).

Layout
------
- ``session``    SparkSession factory + fixture-table loading/registration
- ``schemas``    explicit server-declared StructTypes (never inferSchema)
- ``functions``  determinism-safe numeric/vector/time helpers
- ``sources``    format decode (parquet / CD2 JSONL envelope / CSV-TSV)
- ``operators``  dataflow operators (merge, as-of join, dedup, similarity,
                 text analysis, multimodal plumbing)
- ``streaming``  Structured Streaming forms (windows, merge sink, dedup)
- ``queries``    graded query definitions + DuckDB oracle SQL (the
                 SURVEY.md §2 correctness contract)
"""

__version__ = "0.1.0"
