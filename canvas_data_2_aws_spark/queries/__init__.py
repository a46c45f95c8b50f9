"""Graded query definitions — one module per SURVEY §2 family.

Each module registers queries via ``registry.graded(name, oracle=...)``.
The Spark side is idiomatic DataFrame API calling into
``canvas_data_2_aws_spark.operators``; the oracle string is the
DuckDB-dialect ANSI-SQL twin. Column aliases match exactly (driver
sorts columns by name before hashing).
"""
