"""Relational + CDC-primitive operators over the driver testdata.

Each query maps a reference operator (SURVEY.md §2 ids in the docstrings)
to its Spark-first expression, with a DuckDB oracle. All computed columns
are aliased identically on both sides; money aggregates sum via
DECIMAL(18,2) so the result is exact and order-independent (a plain
double sum would hash-differ run to run at scale).

Scale notes embedded per query; the common ones:
- groupBy aggregates get map-side partial aggregation for free;
- small dims are broadcast explicitly (``F.broadcast``) so the big side
  never shuffles;
- anti/semi joins replace the reference's driver-side ``set()`` diffs
  (``src/pmc_oa/download_batch.py:279-316``) with distributed plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tbl


# --- flagship: CDC LWW apply on the events stream table (A2/J3) -----------
def lww_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-LSN last-writer-wins: latest event per user_id (event_id = LSN).

    groupBy + max_by = hash aggregate WITH map-side partial reduce: a hot
    user pre-combines on every input partition; only one row per
    (partition, user) crosses the shuffle. The window-rank alternative
    (lww_via_window) shuffles every raw row — this is the scale path.
    """
    e = tbl(spark, sf_dir, "events")
    val = F.struct("event_type", "value", "ts")
    return (
        e.groupBy("user_id")
        .agg(
            F.max("event_id").alias("last_event_id"),
            F.max_by(val, F.col("event_id")).alias("_w"),
        )
        .select(
            "user_id",
            "last_event_id",
            F.col("_w.event_type").alias("last_event_type"),
            F.col("_w.value").alias("last_value"),
            F.col("_w.ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


LWW_LATEST_SQL = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       value AS last_value, ts AS last_ts
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
ORDER BY user_id
"""


def lww_via_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same LWW semantics via window row_number (reference A2 idiom).

    Kept as the non-partial-agg variant: correct, but shuffles+sorts all
    rows per key — use lww_latest_event_per_user at scale.
    """
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("event_id"))
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        .orderBy("user_id")
    )


def dedup_first_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-preserving first-seen dedup per (user_id, event_type) — A2
    (reference remove_duplicates, src/pmc_oa/build_json.py:828-846)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"),
             F.min_by(F.col("value"), F.col("event_id")).alias("first_value"))
        .orderBy("user_id", "event_type")
    )


DEDUP_FIRST_SEEN_SQL = """
SELECT user_id, event_type,
       min(event_id) AS first_event_id,
       arg_min(value, event_id) AS first_value
FROM events GROUP BY user_id, event_type
ORDER BY user_id, event_type
"""


# --- J1: resume anti-join ---------------------------------------------------
def anti_join_resume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders = manifest MINUS completed-log (reference
    create_subset_based_on_file_diff, src/pmc_oa/download_batch.py:279-316).

    left_anti keeps the build side (orders keys) shuffled once; at scale
    prefer the smaller side as build or pre-bucket both on the key.
    """
    c = tbl(spark, sf_dir, "customer")
    o = (
        tbl(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_name").orderBy("c_custkey")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: customers that do have orders (key-scoped replay)."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_semi").select("c_custkey", "c_mktsegment").orderBy("c_custkey")


SEMI_JOIN_SQL = """
SELECT c_custkey, c_mktsegment FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
ORDER BY c_custkey
"""


# --- J6: broadcast dim joins ------------------------------------------------
def broadcast_enrich_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer counts + balance per region via two explicit broadcast
    joins (reference taxonomy/label dict probes,
    scripts/06_serilaize_to_webdataset_parallel.py:125-157).

    nation/region are tiny dims: broadcast keeps the customer scan
    shuffle-free — at 100 TB the fact side never moves.
    """
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")).alias("total_acctbal"),
        )
        .orderBy("region_name")
    )


BROADCAST_ENRICH_SQL = """
SELECT r_name AS region_name, count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY region_name
"""


# --- P1: isin routing filter -------------------------------------------------
def filter_isin_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way license-split analogue (scripts/01_download_filelists.py:35-63):
    route rows by a derived class column; the filter pushes to the scan."""
    o = tbl(spark, sf_dir, "orders")
    urgent = ["1-URGENT", "2-HIGH"]
    routed = o.withColumn(
        "route",
        F.when(F.col("o_orderpriority").isin(urgent), F.lit("fast"))
        .when(F.col("o_orderpriority") == "3-MEDIUM", F.lit("medium"))
        .otherwise(F.lit("slow")),
    )
    return routed.groupBy("route").agg(F.count("*").alias("n_orders")).orderBy("route")


FILTER_ISIN_SQL = """
SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'fast'
            WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
            ELSE 'slow' END AS route,
       count(*) AS n_orders
FROM orders GROUP BY 1 ORDER BY route
"""


# --- P4: empty-string -> NULL normalize --------------------------------------
def null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """build_json.py:905-920 semantics: ''/whitespace -> NULL, else trimmed."""
    d = tbl(spark, sf_dir, "documents")
    cleaned = F.when(F.trim(F.col("source")) == "", None).otherwise(F.trim(F.col("source")))
    return d.select("doc_id", cleaned.alias("source_clean")).orderBy("doc_id")


NULL_NORMALIZE_SQL = """
SELECT doc_id,
       CASE WHEN trim(source) = '' THEN NULL ELSE trim(source) END AS source_clean
FROM documents ORDER BY doc_id
"""


# --- A1: group-collect ---------------------------------------------------------
def group_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine_paragraphs analogue (src/pmc_oa/build_json.py:794-804): group
    values into a per-key collection; sorted + joined so the result is
    order-deterministic on both engines."""
    d = tbl(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
            F.count("*").alias("n_docs"),
        )
        .orderBy("lang")
    )


GROUP_COLLECT_SQL = """
SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
       count(*) AS n_docs
FROM documents GROUP BY lang ORDER BY lang
"""


# --- A4 / A5 ---------------------------------------------------------------
def count_agg_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineage-style counts per class (reference completeness checks,
    src/pmc_oa/download_batch.py:246-276)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("event_type")
    )


COUNT_AGG_SQL = """
SELECT event_type, count(*) AS n_events, count(DISTINCT user_id) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def cube_order_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority) with grouping_id: every subtotal
    combination in ONE pass — Spark expands the grouping sets before the
    aggregate, so it stays a single partial-agg shuffle (vs 4 separate
    groupBys = 4 scans + 4 shuffles). Subtotal NULLs are folded to 'ALL'
    (the data never holds null status/priority), which also sidesteps the
    engines' opposite default null-sort order. The reference computes its
    per-license/per-journal/global counts as separate passes
    (``src/pmc_oa/download_batch.py:246-276``); this is the one-pass form."""
    o = tbl(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid", "n_orders", "total_price",
        )
        .orderBy("gid", "status", "priority")
    )


CUBE_ROLLUP_SQL = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       grouping(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, status, priority
"""


def max_over_group_next_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_next_index analogue (src/pmc_oa/build_json.py:125-157):
    monotone next id per group = max + 1 (snapshot-id fencing)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg((F.max("event_id") + F.lit(1)).alias("next_index"))
        .orderBy("user_id")
    )


MAX_OVER_GROUP_SQL = """
SELECT user_id, max(event_id) + 1 AS next_index
FROM events GROUP BY user_id ORDER BY user_id
"""


# --- O4: offset-range batching ---------------------------------------------
def offset_range_batching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """create_batch_sequence analogue (src/pmc_oa/download_batch.py:320-369):
    contiguous offset ranges of the log; per-batch bounds for checkpoints."""
    e = tbl(spark, sf_dir, "events")
    b = e.withColumn("batch_id", (F.col("event_id") / F.lit(100)).cast("bigint"))
    return (
        b.groupBy("batch_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("lsn_lo"),
            F.max("event_id").alias("lsn_hi"),
        )
        .orderBy("batch_id")
    )


OFFSET_RANGE_SQL = """
SELECT CAST(event_id // 100 AS BIGINT) AS batch_id, count(*) AS n_events,
       min(event_id) AS lsn_lo, max(event_id) AS lsn_hi
FROM events GROUP BY 1 ORDER BY batch_id
"""


# --- T3: schema-evolution-tolerant union ------------------------------------
def union_all_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) — the schema-evolution union
    (reference concat of evolving record lists, loader_utils.py:82)."""
    e = tbl(spark, sf_dir, "events")
    old = e.filter("event_id < 200").select("event_id", "user_id")
    new = e.filter("event_id >= 200").select("event_id", "user_id", "event_type")
    return old.unionByName(new, allowMissingColumns=True).orderBy("event_id")


UNION_EVOLVED_SQL = """
SELECT event_id, user_id, NULL AS event_type FROM events WHERE event_id < 200
UNION ALL
SELECT event_id, user_id, event_type FROM events WHERE event_id >= 200
ORDER BY event_id
"""


# --- O3: top-k per group ------------------------------------------------------
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via window rank (reference [:20] images per cluster,
    scripts/Labeler/label.py:218-219); deterministic tie-break on event_id."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        e.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .select("event_type", "rank", "event_id", "value")
        .orderBy("event_type", "rank")
    )


TOPK_SQL = """
SELECT event_type, rank, event_id, value FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rank
  FROM events
) WHERE rank <= 3 ORDER BY event_type, rank
"""


# --- windows over time --------------------------------------------------------
def tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (streaming watermark analogue —
    per-partition max(ts) carried in lineage, SURVEY.md §2.8)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"))
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"))
        .orderBy("window_start")
    )


TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, count(*) AS n_events,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1 ORDER BY window_start
"""


def asof_join_latest_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF (point-in-time) join — the operator Spark lacks natively,
    expressed as a composition: every event joins the MOST RECENT error
    event of the same user at-or-before its timestamp (dimension-version
    semantics: 'what was the state when this happened'). Plan: tag + union
    both sides, ONE shuffle on the key, and a running ``last(...,
    ignorenulls)`` over (ts asc, version-first) carries the newest version
    forward — no range join, no per-key Python, cost identical to a
    windowed aggregation. The oracle is DuckDB's NATIVE ``ASOF LEFT
    JOIN``, so the composition is checked against a first-class
    implementation of the semantics."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events")
    ev = e.select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("double").alias("vv"),
        F.lit(None).cast("timestamp").alias("vt"),
        F.lit(0).alias("is_v"),
    )
    vs = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("value").alias("vv"),
        F.col("ts").alias("vt"),
        F.lit(1).alias("is_v"),
    )
    u = ev.unionByName(vs)
    # version rows sort BEFORE the event at an equal timestamp, so the
    # match is inclusive (ts >= vts) like DuckDB's ASOF
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_v").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("err_value", F.last("vv", ignorenulls=True).over(w))
        .withColumn("vts", F.last("vt", ignorenulls=True).over(w))
        .filter("is_v = 0")
        .select("event_id", "user_id", "vts", "err_value")
        .orderBy("event_id")
    )


ASOF_JOIN_SQL = """
WITH v AS (
  SELECT user_id, ts AS vts, value AS err_value
  FROM events WHERE event_type = 'error'
)
SELECT e.event_id, e.user_id, v.vts, v.err_value
FROM events e ASOF LEFT JOIN v
  ON e.user_id = v.user_id AND e.ts >= v.vts
ORDER BY e.event_id
"""


def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: events land in value bands via an inequality
    join against a broadcast ranges table — the right physical strategy
    when the interval side is small (BroadcastNestedLoopJoin over k bands,
    no shuffle of the fact side; with a large interval side you'd bin both
    sides to equi-join keys first)."""
    bands = spark.createDataFrame(
        [(0, "low", 0.0, 10.0), (1, "mid", 10.0, 100.0),
         (2, "high", 100.0, 1e18)],
        "band_id int, band string, lo double, hi double",
    )
    e = tbl(spark, sf_dir, "events")
    return (
        e.join(F.broadcast(bands),
               (e["value"] >= bands["lo"]) & (e["value"] < bands["hi"]),
               "left")
        .select("event_id", "value", "band_id", "band")
        .orderBy("event_id")
    )


RANGE_JOIN_SQL = """
WITH bands(band_id, band, lo, hi) AS (
  VALUES (0, 'low', 0.0, 10.0), (1, 'mid', 10.0, 100.0),
         (2, 'high', 100.0, 1e18)
)
SELECT e.event_id, e.value, b.band_id, b.band
FROM events e LEFT JOIN bands b ON e.value >= b.lo AND e.value < b.hi
ORDER BY e.event_id
"""


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's native ``session_window``: per-user event-time sessions with
    a 30-minute inactivity gap (batch twin of the streaming
    ``stream_sessionize`` stateful operator). The session assignment is a
    single shuffle on (user_id); the oracle re-derives sessions with the
    classic gaps-and-islands SQL (lag + running sum of breaks)."""
    e = tbl(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
             F.max("ts").alias("last_ts"))
        .select("user_id", F.col("w.start").alias("session_start"),
                "n_events", "last_ts")
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
),
grouped AS (
  SELECT user_id, ts,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       count(*) AS n_events, max(ts) AS last_ts
FROM grouped GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# --- TPC-H-style headline queries --------------------------------------------
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy agg; decimal sums for exactness. The
    filter + 6 aggregates run in one WholeStageCodegen pass over the scan."""
    l = tbl(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum((dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast("decimal(28,6)"))
            .cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single agg — the canonical
    predicate-pushdown query. All three predicates reach the parquet scan
    (PushedFilters on shipdate/discount/quantity; row groups outside the
    date window are skipped on footer stats alone), and the surviving
    rows fold in one WholeStageCodegen pass with no shuffle but the
    final single-row combine."""
    l = tbl(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_discount").cast("decimal(18,2)").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((dec("l_extendedprice") * dec("l_discount"))
                  .cast("decimal(28,6)")).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


Q6_SQL = """
SELECT CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1996-01-01'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_top_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective fact join + top-k. customer filter is
    broadcast; lineitem joins orders on the key both sides shuffle on once
    (at scale: bucket both on orderkey to make it shuffle-free)."""
    c = tbl(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))).cast("decimal(28,6)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def enrich_left_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 — enrichment left join with pass-through of unmatched rows.

    Reference: the Entrez enrichment looks up each record's pmid and leaves
    records without a match untouched (``scripts/05_json_to_entrez.py:
    303-330``). Here: events enriched with the customer dimension; events
    whose user has no customer row pass through with a coalesced default.
    The dim side is broadcast, so the fact side never shuffles — at 100 TB
    the fact scan streams straight through map tasks.
    """
    e = tbl(spark, sf_dir, "events")
    c = tbl(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey, "left_outer")
        .select(
            "event_id",
            "user_id",
            F.coalesce("c_mktsegment", F.lit("UNKNOWN")).alias("segment"),
            F.coalesce("c_acctbal", F.lit(0.0)).alias("acctbal"),
            (F.col("c_custkey").isNotNull()).alias("matched"),
        )
        .orderBy("event_id")
    )


ENRICH_LEFT_SQL = """
SELECT event_id, user_id,
       COALESCE(c_mktsegment, 'UNKNOWN') AS segment,
       COALESCE(c_acctbal, 0.0) AS acctbal,
       (c_custkey IS NOT NULL) AS matched
FROM events LEFT JOIN customer ON user_id = c_custkey
ORDER BY event_id
"""


def flatten_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 + F17 — flatten nullable fields into one string (reference
    ``ensure_title``/``concat_abstract``, ``src/pmc_oa/build_json.py:
    509-598``) and a when-chain categorical mapping (``get_license_path_name``,
    ``src/pmc_oa/utils/path_util.py:5-10``). Pure JVM expressions inside
    WholeStageCodegen — the reference does this row-at-a-time in Python.
    """
    c = tbl(spark, sf_dir, "customer")
    seg = F.col("c_mktsegment")
    return c.select(
        "c_custkey",
        F.concat_ws(" ", "c_name", seg).alias("profile"),
        F.when(seg == "BUILDING", "bld")
        .when(seg == "AUTOMOBILE", "auto")
        .when(seg == "MACHINERY", "mach")
        .otherwise("other")
        .alias("seg_short"),
        F.length(F.concat_ws(" ", "c_name", seg)).alias("profile_len"),
    ).orderBy("c_custkey")


FLATTEN_PROFILE_SQL = """
SELECT c_custkey,
       concat_ws(' ', c_name, c_mktsegment) AS profile,
       CASE c_mktsegment WHEN 'BUILDING' THEN 'bld' WHEN 'AUTOMOBILE' THEN 'auto'
            WHEN 'MACHINERY' THEN 'mach' ELSE 'other' END AS seg_short,
       length(concat_ws(' ', c_name, c_mktsegment)) AS profile_len
FROM customer
ORDER BY c_custkey
"""


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table star join (fact lineitem/orders with
    customer, supplier, nation, region dims + the local-supplier
    same-nation predicate). The dims broadcast; the only repartition
    shuffles are lineitem-orders on orderkey and the final tiny group —
    Catalyst's join reordering + broadcast selection produce the plan a
    hand-tuned engine would pick, which is the point of declaring it."""
    c = tbl(spark, sf_dir, "customer")
    o = tbl(spark, sf_dir, "orders")
    l = tbl(spark, sf_dir, "lineitem")
    s = tbl(spark, sf_dir, "supplier")
    n = tbl(spark, sf_dir, "nation")
    r = tbl(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
           ).cast("decimal(28,6)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), (o.o_custkey == c.c_custkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(28,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def rollup_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals via GROUP BY ROLLUP (region -> nation ->
    grand total) — the multi-granularity lineage/metrics dashboard shape
    (A4 generalized; Catalyst expands the rollup into one Expand + one
    aggregate, a single shuffle for every granularity at once — at 100 TB
    that replaces three separate scans of the fact table). Null grouping
    keys from the rollup are labeled explicitly so the oracle's rows match
    byte-for-byte."""
    c = tbl(spark, sf_dir, "customer")
    n = tbl(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name"), F.col("n_regionkey"))
    r = tbl(spark, sf_dir, "region").select(
        F.col("r_regionkey"), F.col("r_name"))
    j = (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
         .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    out = (
        j.rollup("r_name", "n_name")
        .agg(F.count("*").alias("n_customers"),
             F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
             .alias("total_acctbal"))
        .select(
            F.coalesce(F.col("r_name"), F.lit("<ALL>")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("<ALL>")).alias("nation"),
            "n_customers", "total_acctbal",
        )
        .orderBy("region", "nation")
    )
    return out


ROLLUP_SQL = """
SELECT coalesce(r_name, '<ALL>') AS region,
       coalesce(n_name, '<ALL>') AS nation,
       count(*) AS n_customers,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY region, nation
"""


def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long->wide reshape: per user-decile event counts pivoted by event
    type — the feature-matrix assembly step (one row per entity, one
    column per signal) every training pipeline runs before model input.
    With an EXPLICIT value list there is no extra pass to discover the
    pivot values (at scale you always pin them); Catalyst plans the pivot
    as two map-side-partial aggregates — groupBy(key, pivot_col) counts,
    then PivotFirst by key — both shuffles carrying only the tiny
    aggregated relation."""
    e = tbl(spark, sf_dir, "events")
    decile = (F.col("user_id") % 10).cast("int").alias("user_decile")
    out = (
        e.select(decile, "event_type")
        .groupBy("user_decile")
        .pivot("event_type", ["click", "view", "purchase", "login", "logout"])
        .count()
        .na.fill(0)
        .orderBy("user_decile")
    )
    for c in out.columns:
        if c != "user_decile":
            out = out.withColumn(c, F.col(c).cast("long"))
    return out


PIVOT_SQL = """
SELECT CAST(user_id % 10 AS INT) AS user_decile,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'view') AS view,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'login') AS login,
       count(*) FILTER (event_type = 'logout') AS logout
FROM events GROUP BY 1 ORDER BY user_decile
"""


def lag_event_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event time deltas per user (lead/lag window): the
    gap-analysis primitive behind sessionization thresholds and
    rate-limit audits. One hash shuffle on user_id; the per-user sort is
    partition-local. First event per user has no predecessor -> NULL
    delta (kept, so downstream percentile math sees the cohort size)."""
    from pyspark.sql import Window

    e = tbl(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # exact integer microseconds on both engines (epoch-seconds functions
    # truncate/round sub-second parts differently across engines); the
    # stored type is TIMESTAMP_NTZ, so cast through the UTC session zone
    # for unix_micros — a pure reinterpretation, no value shift
    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    return (
        e.select(
            "user_id", "event_id", "ts",
            (us(F.col("ts")) - us(prev)).cast("long").alias("delta_us"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


LAG_DELTAS_SQL = """
SELECT user_id, event_id, ts,
       CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                  ORDER BY ts, event_id))
            AS BIGINT) AS delta_us
FROM events WHERE user_id < 100
ORDER BY user_id, ts, event_id
"""


def percentile_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of order value per event type —
    the latency/size-distribution report shape. Spark's ``percentile``
    (exact, linear interpolation) matches DuckDB's ``quantile_cont``
    definition; results round to 6 dp for stable cross-engine comparison.
    At corpus scale you swap in ``percentile_approx`` (t-digest) and lose
    the exact oracle — this pins the exact semantics the sketch is
    validated against."""
    e = tbl(spark, sf_dir, "events")
    pct = F.expr("percentile(value, array(0.5D, 0.9D, 0.99D))")
    return (
        e.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.element_at("p", 1), 6).alias("p50"),
            F.round(F.element_at("p", 2), 6).alias("p90"),
            F.round(F.element_at("p", 3), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


PERCENTILE_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type ORDER BY event_type
"""


def except_all_unprocessed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference via EXCEPT ALL (T1 with duplicate-count
    semantics): event keys minus an already-processed subset, KEEPING
    multiplicity — the bag-difference form of the resume diff that a
    per-key anti-join cannot express (an anti-join drops every copy of a
    matched key; EXCEPT ALL cancels copy-for-copy). The processed subset
    is a deterministic predicate (never a LIMIT — row pick order differs
    across engines/scans). Plans as one aggregate-style shuffle."""
    e = tbl(spark, sf_dir, "events")
    done = e.filter(
        F.col("event_type").isin("click", "view") & (F.col("event_id") % 3 == 0)
    ).select("user_id", "event_type")
    return (
        e.select("user_id", "event_type")
        .exceptAll(done)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("n_remaining"))
        .orderBy("user_id", "event_type")
    )


EXCEPT_ALL_SQL = """
WITH e AS (SELECT user_id, event_type FROM events),
done AS (
  SELECT user_id, event_type FROM events
  WHERE event_type IN ('click', 'view') AND event_id % 3 = 0
),
rem AS (SELECT * FROM e EXCEPT ALL SELECT * FROM done)
SELECT user_id, event_type, count(*) AS n_remaining
FROM rem GROUP BY user_id, event_type ORDER BY user_id, event_type
"""


# --- positional zip join (SURVEY J8) ------------------------------------------


def _positional_index(df: DataFrame, key: str) -> DataFrame:
    """Global 1-based position of each row under ORDER BY ``key``, without an
    unpartitioned window: (1) deterministic contiguous range id
    ``pid = floor((key - min)/width)`` — a pure function of the key, monotone
    in the sort order; (2) per-range counts, exclusive cumsum driver-side
    (O(ranges)); (3) broadcast offsets + ``row_number`` partitioned by pid.
    Same two-pass discipline as ``token_budget_shards``
    (operators/sampling.py) — nothing global ever lands on one task."""
    from pyspark.sql import Window

    spark = df.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    bounds = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).collect()[0]
    lo = int(bounds["lo"] or 0)
    span = int(bounds["hi"] or 0) - lo + 1
    width = max((span + n_parts - 1) // n_parts, 1)
    ranged = df.withColumn(
        "pid", F.floor((F.col(key) - lo) / width).cast("int"))
    totals = sorted(
        (r["pid"], r["n"])
        for r in ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, running = [], 0
    for pid, n in totals:
        offsets.append((pid, running))
        running += int(n)
    offsets_df = spark.createDataFrame(offsets, "pid int, offset long")
    w = Window.partitionBy("pid").orderBy(key)
    return (
        ranged.join(F.broadcast(offsets_df), "pid")
        .withColumn("pos", F.row_number().over(w) + F.col("offset"))
        .drop("pid", "offset")
    )


def positional_zip_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Align two keyless relations by POSITION — the reference zips feature
    batches with key batches relying on identical iteration order
    (scripts/Labeler/03_get_label_dict.py:56-59). Distributed twin: each
    side gets a scale-safe global position (prefix-sum ``_positional_index``,
    never ``monotonically_increasing_id``/``zipWithIndex``, whose values
    depend on partitioning), then an equi-join on position. Here documents
    (by doc_id) zip with embeddings (by vec_id) — same row counts, as the
    reference's batch lists must be."""
    docs = _positional_index(
        tbl(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    vecs = _positional_index(
        tbl(spark, sf_dir, "embeddings").select("vec_id"), "vec_id")
    return (
        docs.join(vecs, "pos")
        .select("pos", "doc_id", "vec_id")
        .orderBy("pos")
    )


POSITIONAL_ZIP_SQL = """
WITH a AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS pos
  FROM documents
),
b AS (
  SELECT vec_id,
         CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS pos
  FROM embeddings
)
SELECT pos, a.doc_id, b.vec_id
FROM a JOIN b USING (pos)
ORDER BY pos
"""


QUERIES: dict[str, tuple] = {
    "positional_zip_join": (positional_zip_join, POSITIONAL_ZIP_SQL),
    "lww_latest_event_per_user": (lww_latest_event_per_user, LWW_LATEST_SQL),
    "lww_via_window": (lww_via_window, LWW_LATEST_SQL),
    "dedup_first_seen": (dedup_first_seen, DEDUP_FIRST_SEEN_SQL),
    "anti_join_resume": (anti_join_resume, ANTI_JOIN_SQL),
    "semi_join_active": (semi_join_active, SEMI_JOIN_SQL),
    "broadcast_enrich_region": (broadcast_enrich_region, BROADCAST_ENRICH_SQL),
    "filter_isin_route": (filter_isin_route, FILTER_ISIN_SQL),
    "null_normalize": (null_normalize, NULL_NORMALIZE_SQL),
    "group_collect_ordered": (group_collect_ordered, GROUP_COLLECT_SQL),
    "count_agg_metrics": (count_agg_metrics, COUNT_AGG_SQL),
    "cube_order_rollup": (cube_order_rollup, CUBE_ROLLUP_SQL),
    "q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "max_over_group_next_index": (max_over_group_next_index, MAX_OVER_GROUP_SQL),
    "offset_range_batching": (offset_range_batching, OFFSET_RANGE_SQL),
    "union_all_evolved": (union_all_evolved, UNION_EVOLVED_SQL),
    "topk_per_group": (topk_per_group, TOPK_SQL),
    "tumbling_window_counts": (tumbling_window_counts, TUMBLING_SQL),
    "session_window_agg": (session_window_agg, SESSION_WINDOW_SQL),
    "asof_join_latest_version": (asof_join_latest_version, ASOF_JOIN_SQL),
    "range_join_value_bands": (range_join_value_bands, RANGE_JOIN_SQL),
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_revenue": (q3_top_revenue, Q3_SQL),
    "enrich_left_coalesce": (enrich_left_coalesce, ENRICH_LEFT_SQL),
    "flatten_profile": (flatten_profile, FLATTEN_PROFILE_SQL),
    "q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "rollup_metrics": (rollup_metrics, ROLLUP_SQL),
    "pivot_event_counts": (pivot_event_counts, PIVOT_SQL),
    "lag_event_deltas": (lag_event_deltas, LAG_DELTAS_SQL),
    "percentile_metrics": (percentile_metrics, PERCENTILE_SQL),
    "except_all_unprocessed": (except_all_unprocessed, EXCEPT_ALL_SQL),
}
