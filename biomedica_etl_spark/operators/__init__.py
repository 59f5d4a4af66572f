"""Operator library: each module exports QUERIES = {name: (fn, oracle_sql)}.

fn(spark, sf_dir) -> DataFrame; oracle_sql is equivalent DuckDB ANSI SQL
over the same parquet tables (None for non-SQL-expressible operators,
which the driver checks rows-only).
"""
