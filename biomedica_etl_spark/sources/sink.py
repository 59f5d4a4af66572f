"""Routed, size-capped parquet sink.

The write half of the reference's 3-way routing + shard sizing: records are
routed into per-category outputs (``scripts/01_download_filelists.py:50-63``
splits the manifest into commercial / non-commercial / other file lists) and
each output is rolled into bounded-size shards
(``scripts/06_serilaize_to_webdataset_parallel.py:214-219`` caps records per
tar shard). Spark-first: the route is a PARTITION COLUMN (one directory per
route, readable back with partition pruning) and the shard cap is the
per-task ``maxRecordsPerFile`` write option — the writer rolls files at the
cap with zero extra shuffle.

Scale notes: ``partitionBy(route)`` with few routes and many tasks produces
up to tasks x routes files; callers that need exactly-k files per route
repartition on the route first (``repartition_per_route``), trading one
shuffle for a bounded file count — at 100 TB you pick per job: ingest
pipelines keep the no-shuffle form, publish steps pay the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_routed(
    df: DataFrame,
    path: str,
    route_col: str,
    max_records_per_file: int = 0,
    mode: str = "overwrite",
    repartition_per_route: int | None = None,
) -> None:
    """Write ``df`` partitioned by ``route_col`` with per-file row caps.

    ``max_records_per_file=0`` disables the cap (Spark default).
    ``repartition_per_route`` shuffles to that many writer tasks per route
    value first, bounding the file count to roughly
    ``ceil(rows_per_route / max_records_per_file)`` instead of one file per
    (task, route) pair.
    """
    out = df
    if repartition_per_route is not None:
        # salt within the route so one hot route spreads over k writers.
        # The salt must be a DETERMINISTIC function of the row's data (not
        # monotonically_increasing_id/rand): on a real cluster a shuffle-map
        # retry recomputes its input, and a nondeterministic salt would route
        # rows to different reducers than the already-fetched attempt —
        # silently duplicating or dropping rows in the published output.
        out = out.repartition(
            repartition_per_route,
            F.col(route_col),
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                   F.lit(repartition_per_route)),
        )
    writer = out.write.mode(mode)
    if max_records_per_file > 0:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(route_col).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int,
    mode: str = "overwrite",
) -> None:
    """Write a Spark BUCKETED (and bucket-sorted) table for co-located joins.

    Two tables bucketed the same way on the join key join with ZERO
    exchanges (and with ``sortBy``, zero sorts) — the shuffle is paid once
    at write time and amortized over every subsequent join/aggregation on
    that key. This is the declarative twin of ``CowTable``'s hidden
    bucket partitioning, for the general star-schema case: at 100 TB you
    bucket fact tables on their join keys (e.g. orders and lineitem on
    orderkey) so the recurring nightly joins never reshuffle the big side.
    ``tests/test_plans.py::test_bucketed_join_no_exchange`` pins the plan.
    """
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .saveAsTable(table_name)
    )
