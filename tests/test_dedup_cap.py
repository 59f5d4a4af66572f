"""LSH bucket df-cap: a degenerate corpus-hot band bucket must be dropped
BEFORE pair expansion (bounded per-task memory at 100 TB), observable via
the dropped-bucket metric, and must not perturb the non-degenerate pairs.

Reference analogue: same posting-list-cap discipline as JACCARD_MAX_DF
(operators/dedup.py) — every large dedup system caps document frequency.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from biomedica_etl_spark.operators import dedup

SF_DIR = "/root/testdata/sf0.001"


def _toy_banded(spark, hot_n: int, small: list[int]):
    hot = spark.range(hot_n).select(
        F.col("id").alias("doc_id"),
        F.lit(0).alias("band"),
        F.lit("hotkey").alias("band_key"),
    )
    cool = spark.createDataFrame(
        [(d, 1, "coolkey") for d in small], "doc_id long, band int, band_key string"
    )
    return hot.unionByName(cool)


def test_hot_bucket_dropped_and_counted(spark):
    banded = _toy_banded(spark, hot_n=200, small=[7, 11, 13])
    obs = Observation("lsh_cap")
    pairs = dedup._band_pairs(banded, max_bucket=64, observation=obs)
    got = sorted(tuple(r) for r in pairs.collect())
    # only the 3-doc bucket expands: C(3,2) pairs; the 200-doc bucket is gone
    assert got == [(7, 11), (7, 13), (11, 13)]
    assert obs.get["dropped_buckets"] == 1
    assert obs.get["max_bucket_size"] == 200


def test_bucket_at_cap_boundary_survives(spark):
    banded = _toy_banded(spark, hot_n=64, small=[1001, 1002])
    pairs = dedup._band_pairs(banded, max_bucket=64)
    # 64-doc bucket is exactly at the cap: kept -> C(64,2) + 1 pairs
    assert pairs.count() == 64 * 63 // 2 + 1


def test_capped_query_equals_base_candidates(spark):
    """The planted 120-doc boilerplate cluster collapses into band buckets
    larger than LSH_MAX_BUCKET, so the capped query's output is exactly the
    base corpus's candidate set — the cap removes the skew bomb, not data."""
    base = sorted(
        tuple(r) for r in dedup.minhash_lsh_candidates(spark, SF_DIR).collect()
    )
    capped = sorted(
        tuple(r) for r in dedup.minhash_lsh_capped(spark, SF_DIR).collect()
    )
    assert capped == base
    assert dedup._HOT_N > dedup.LSH_MAX_BUCKET  # the plant actually exceeds the cap
