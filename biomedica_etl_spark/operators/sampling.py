"""Deterministic, hash-based sampling and split assignment over ``documents``.

The curation ops every training-data pipeline needs, done the only way that
is reproducible at 100 TB: membership is a PURE FUNCTION of the record key
(a seeded md5 bucket), so the same doc lands in the same split on every
run, on any cluster size, with no shuffling, no RNG state, and no driver
coordination — resharding or re-running the pipeline can never leak val
docs into train. (``df.sample``/``rand()`` are partition-order dependent
and thus unusable for split assignment; the reference's analogue is the
stable batch membership its contiguous-range batching gives each article,
``src/pmc_oa/download_batch.py:320-369``.)

Both engines compute the identical bucket: Spark
``conv(substring(md5(...),1,8),16,10) % 100`` and DuckDB
``('0x' || substr(md5(...),1,8))::BIGINT % 100`` parse the same 32-bit hex
slice. Everything is a map-side projection — zero shuffles except the
deterministic orderBy.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tbl


def hash_bucket_col(key: Column, seed: str, n_buckets: int = 100) -> Column:
    """Seeded deterministic bucket in [0, n_buckets): md5-based so every
    engine agrees; different seeds give independent assignments."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), key)), 1, 8), 16, 10
    ).cast("bigint")
    return (h % n_buckets).cast("int")


def _bucket_sql(key_sql: str, seed: str, n_buckets: int = 100) -> str:
    return (
        f"CAST(CAST('0x' || substr(md5('{seed}|' || {key_sql}), 1, 8) "
        f"AS BIGINT) % {n_buckets} AS INT)"
    )


def split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment: 80/10/10 by seeded hash bucket."""
    d = tbl(spark, sf_dir, "documents")
    b = hash_bucket_col(F.col("doc_id").cast("string"), "split")
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return d.select(
        "doc_id", b.alias("bucket"), split.alias("split")
    ).orderBy("doc_id")


SPLIT_ASSIGN_SQL = f"""
SELECT doc_id,
       {_bucket_sql("CAST(doc_id AS VARCHAR)", "split")} AS bucket,
       CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)", "split")} < 80
              THEN 'train'
            WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)", "split")} < 90
              THEN 'val'
            ELSE 'test' END AS split
FROM documents ORDER BY doc_id
"""


def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: different keep-rates per
    language (the upsample-rare-strata move), independent of the split
    hash by seed. Output is the kept docs with their stratum rate."""
    d = tbl(spark, sf_dir, "documents")
    rate = (
        F.when(F.col("lang") == "en", 10)       # downsample the head
        .when(F.col("lang") == "es", 50)
        .otherwise(90)                          # keep nearly all of the tail
    )
    b = hash_bucket_col(F.col("doc_id").cast("string"), "sample")
    return (
        d.select("doc_id", "lang", rate.alias("keep_pct"), b.alias("bucket"))
        .filter(F.col("bucket") < F.col("keep_pct"))
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang,
         CASE WHEN lang = 'en' THEN 10
              WHEN lang = 'es' THEN 50
              ELSE 90 END AS keep_pct,
         {_bucket_sql("CAST(doc_id AS VARCHAR)", "sample")} AS bucket
  FROM documents
)
SELECT doc_id, lang, keep_pct, bucket FROM t
WHERE bucket < keep_pct ORDER BY doc_id
"""


def split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE split assignment: hash the near-dup CLUSTER id, not the
    doc id, so every member of a duplicate group lands in the same split —
    the step that prevents train/test contamination via near-duplicates
    (hashing doc ids would scatter a duplicate pair across splits ~36% of
    the time at 80/10/10). Docs outside any candidate pair cluster alone.
    """
    from .dedup import dedup_connected_components

    d = tbl(spark, sf_dir, "documents").select("doc_id")
    clusters = dedup_connected_components(spark, sf_dir)
    withc = d.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    b = hash_bucket_col(F.col("cluster_id").cast("string"), "split")
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    return withc.select(
        "doc_id", "cluster_id", split.alias("split")
    ).orderBy("doc_id")


# the cluster derivation is the same recursive closure the dedup_clusters
# oracle uses; imported lazily to avoid a circular module constant
def _split_by_cluster_sql() -> str:
    from .dedup import DEDUP_CC_SQL

    key = "CAST(cluster_id AS VARCHAR)"
    return f"""
WITH clusters AS (SELECT * FROM ({DEDUP_CC_SQL}) c),
withc AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN clusters c USING (doc_id)
)
SELECT doc_id, cluster_id,
       CASE WHEN {_bucket_sql(key, "split")} < 80 THEN 'train'
            WHEN {_bucket_sql(key, "split")} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM withc ORDER BY doc_id
"""


def token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sharding (O4 contiguous-range batching generalized):
    docs in stable key order are cut into shards of <= ~20k whitespace
    tokens by a GLOBAL running sum — the serialize-into-bounded-shards
    step of a training-data pipeline (the reference sizes tar shards by
    sample count, ``scripts/06_serilaize_to_webdataset_parallel.py:214``;
    token budgets are the LLM-era version). Shard id =
    floor(prior_cumsum/budget) so no shard exceeds budget + one document.

    Scale-safe two-pass prefix sum (NOT an unpartitioned window, which
    moves the whole table to one task): (1) every doc gets a DETERMINISTIC
    contiguous range id ``pid = floor((doc_id - min_id) / width)`` — a
    pure function of the key, monotone in the sort order; (2) a tiny
    per-range total aggregation (one row per range) whose exclusive cumsum
    is computed DRIVER-side — O(ranges), not O(rows); (3) the offsets
    broadcast-join back on pid, and the within-range running sum is an
    ordinary partitionBy(pid) window. Every stage is parallel over ranges;
    nothing global ever materializes on one task.

    Why not ``repartitionByRange`` + ``spark_partition_id``: Spark's
    RangePartitioner samples with an RDD-id-dependent seed, so the totals
    job and the final job can compute DIFFERENT boundaries and the
    offsets silently misalign — this exact failure surfaced at sf0.1
    while sf0.01 happened to sample identical boundaries. A pid that is a
    pure function of the key makes both passes agree by construction.
    Dense integer keys split evenly here; for sparse/skewed keys compute
    the split points once with exact percentiles instead — the pid must
    only be monotone and deterministic.

    Determinism hardening (round-5, VERDICT r4 #1 — one unreproducible
    driver hash mismatch): (a) ``n_parts`` is a pinned CONSTANT, not
    ``defaultParallelism`` — the result never depended on it, so the
    environment must not even be consulted; (b) the shard id uses exact
    integer ``div``, never a double division whose rounding could drift
    at 10^10-token cumsums; (c) an in-query self-audit recomputes the
    whole cumsum with a SECOND independent range decomposition (coprime
    width) and raises with a row-level diff on any divergence — a future
    mismatch fails loudly here instead of surfacing as an opaque
    downstream hash.
    """
    from pyspark.sql import Window

    from ..functions.text import token_count_col

    budget = 20_000
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", token_count_col(F.col("text")).alias("n_tokens")
    )
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
                   ).collect()[0]
    lo = int(bounds["lo"] or 0)
    span = int(bounds["hi"] or 0) - lo + 1

    def _sharded(n_parts: int) -> DataFrame:
        width = max((span + n_parts - 1) // n_parts, 1)
        ranged = d.withColumn(
            "pid", F.floor((F.col("doc_id") - lo) / width).cast("int"))
        totals = sorted(
            (r["pid"], r["tot"])
            for r in ranged.groupBy("pid")
            .agg(F.sum("n_tokens").alias("tot")).collect()
        )
        offsets, running = [], 0
        for pid, tot in totals:
            offsets.append((pid, running))
            running += int(tot)
        offsets_df = spark.createDataFrame(offsets, "pid int, offset long")
        w = (Window.partitionBy("pid").orderBy("doc_id")
             .rowsBetween(Window.unboundedPreceding, -1))
        local_prior = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        base = (
            ranged.join(F.broadcast(offsets_df), "pid")
            .select("doc_id", "n_tokens",
                    (F.col("offset") + local_prior).alias("prior"))
        )
        # integer `div`, not floor(double /): exact at any cumsum magnitude
        return base.select(
            "doc_id", "n_tokens",
            (F.col("prior") + F.col("n_tokens")).alias("cum_tokens"),
            F.expr(f"CAST(prior div {budget} AS INT)").alias("shard_id"),
        )

    out = _sharded(32)
    audit = _sharded(7)
    mismatch = (
        out.alias("a").join(audit.alias("b"), "doc_id", "full")
        .where(
            F.col("a.cum_tokens").isNull() | F.col("b.cum_tokens").isNull()
            | (F.col("a.cum_tokens") != F.col("b.cum_tokens"))
            | (F.col("a.shard_id") != F.col("b.shard_id"))
        )
        .select("doc_id", F.col("a.cum_tokens").alias("plan_a"),
                F.col("b.cum_tokens").alias("plan_b"),
                F.col("a.shard_id").alias("shard_a"),
                F.col("b.shard_id").alias("shard_b"))
        .limit(20).collect()
    )
    if mismatch:
        raise AssertionError(
            "token_budget_shards self-audit: two independent prefix-sum "
            f"decompositions diverged — first rows: {mismatch}")
    return out.orderBy("doc_id")


TOKEN_BUDGET_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+'))
              END AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS prior
  FROM t
)
SELECT doc_id, n_tokens, prior + n_tokens AS cum_tokens,
       CAST(prior // 20000 AS INT) AS shard_id
FROM c ORDER BY doc_id
"""


def fixed_size_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample (the fixed-size eval-set
    cut): rank docs within each language by a seeded hash (ties impossible
    on the full 16-byte digest) and keep the first 20. Rate-based sampling
    gives a BINOMIAL count per stratum; eval sets need an exact count, and
    hash-rank order is stable under re-runs and data re-partitioning.
    The per-stratum sort is a windowed rank — at corpus scale a top-k
    aggregate per stratum (no global sort)."""
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit("evalset|"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(F.col("h"))
    return (
        d.select("doc_id", "lang", hx.alias("h"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("doc_id", "lang", F.col("rank").cast("int").alias("rank"))
        .orderBy("lang", "rank")
    )


FIXED_SIZE_SAMPLE_SQL = """
WITH h AS (
  SELECT doc_id, lang,
         md5('evalset|' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
r AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY h) AS rank
  FROM h
)
SELECT doc_id, lang, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 20 ORDER BY lang, rank
"""


def contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: eval (val/test) docs that have an
    LSH near-dup candidate sitting in train under the naive doc-hash
    split — the report that motivates ``split_by_cluster`` (which hashes
    the near-dup CLUSTER id so these pairs cannot straddle splits). At
    corpus scale this is the routine eval-hygiene sweep before any
    benchmark number is published. Plan: the linear-shuffle LSH candidate
    pairs join the map-side split assignment on each end — no new heavy
    stage beyond what dedup already runs."""
    from .dedup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(spark, sf_dir)
    splits = split_assign(spark, sf_dir).select("doc_id", "split")
    s1 = splits.select(F.col("doc_id").alias("d1"),
                       F.col("split").alias("split1"))
    s2 = splits.select(F.col("doc_id").alias("d2"),
                       F.col("split").alias("split2"))
    j = pairs.join(s1, "d1").join(s2, "d2")
    one_train = (
        ((F.col("split1") == "train") & (F.col("split2") != "train"))
        | ((F.col("split2") == "train") & (F.col("split1") != "train"))
    )
    eval_doc = F.when(F.col("split1") == "train", F.col("d2")).otherwise(F.col("d1"))
    eval_split = F.when(F.col("split1") == "train",
                        F.col("split2")).otherwise(F.col("split1"))
    train_doc = F.when(F.col("split1") == "train",
                       F.col("d1")).otherwise(F.col("d2"))
    return (
        j.filter(one_train)
        .select(eval_doc.alias("eval_doc"), eval_split.alias("eval_split"),
                train_doc.alias("train_doc"))
        .orderBy("eval_doc", "train_doc")
    )


def _contamination_sql() -> str:
    from .dedup import MINHASH_LSH_SQL

    key = "CAST(doc_id AS VARCHAR)"
    return f"""
WITH cand AS (SELECT d1, d2 FROM ({MINHASH_LSH_SQL}) c),
splits AS (
  SELECT doc_id,
         CASE WHEN {_bucket_sql(key, "split")} < 80 THEN 'train'
              WHEN {_bucket_sql(key, "split")} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
),
j AS (
  SELECT c.d1, c.d2, a.split AS split1, b.split AS split2
  FROM cand c JOIN splits a ON a.doc_id = c.d1
              JOIN splits b ON b.doc_id = c.d2
)
SELECT CASE WHEN split1 = 'train' THEN d2 ELSE d1 END AS eval_doc,
       CASE WHEN split1 = 'train' THEN split2 ELSE split1 END AS eval_split,
       CASE WHEN split1 = 'train' THEN d1 ELSE d2 END AS train_doc
FROM j
WHERE (split1 = 'train') <> (split2 = 'train')
ORDER BY eval_doc, train_doc
"""


def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch per event_type: keep the k=32
    smallest md5(user_id) hashes; the k-th minimum, viewed as a uniform
    [0,1) draw, estimates the distinct count as (k-1)/kth. Unlike HLL
    (whose register layout differs across engines), the KMV sketch is a
    DETERMINISTIC function of the input set — the sketch bytes AND the
    estimate oracle-check exactly. Mergeable (union = min-k of the union)
    and O(k) memory per group: the sketch family a 100 TB pipeline uses
    for per-slice cardinality dashboards. The per-group min-k here is a
    windowed rank; the production aggregation is per-partition min-k +
    merge, same result."""
    from pyspark.sql import Window

    k = 32
    e = tbl(spark, sf_dir, "events")
    hashed = e.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    mink = hashed.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= k)
    kth = mink.filter(F.col("r") == k).select(
        "event_type", F.col("h").alias("kth_hash"))
    frac = (
        F.conv(F.substring("kth_hash", 1, 15), 16, 10).cast("double")
        / F.lit(float(16 ** 15))
    )
    return (
        kth.select(
            "event_type", "kth_hash",
            F.round((k - 1) / frac, 6).alias("est_distinct"),
        )
        .orderBy("event_type")
    )


KMV_SKETCH_SQL = """
WITH h AS (
  SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM events
),
r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
  FROM h
)
SELECT event_type, h AS kth_hash,
       round(31 / (CAST('0x' || substr(h, 1, 15) AS BIGINT)
                   / CAST(power(16, 15) AS DOUBLE)), 6) AS est_distinct
FROM r WHERE r = 32 ORDER BY event_type
"""


QUERIES: dict[str, tuple] = {
    "split_assign": (split_assign, SPLIT_ASSIGN_SQL),
    "stratified_sample": (stratified_sample, STRATIFIED_SAMPLE_SQL),
    "split_by_cluster": (split_by_cluster, _split_by_cluster_sql()),
    "token_budget_shards": (token_budget_shards, TOKEN_BUDGET_SQL),
    "fixed_size_sample": (fixed_size_sample, FIXED_SIZE_SAMPLE_SQL),
    "kmv_distinct_sketch": (kmv_distinct_sketch, KMV_SKETCH_SQL),
    "contamination_report": (contamination_report, _contamination_sql()),
}
