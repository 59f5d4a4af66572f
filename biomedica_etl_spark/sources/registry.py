"""Testdata table loader.

Reference analogue: the manifest CSV scan with header normalization
(``scripts/01_download_filelists.py:34-46``). Parquet scans here are
schema-on-read; Catalyst handles column pruning + predicate pushdown, so
callers simply ``select``/``filter`` and the scan narrows itself
(verify with ``.explain``: ReadSchema / PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
