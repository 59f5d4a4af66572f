"""Deterministic Lloyd's KMeans over the ``embeddings`` table.

The reference's ML-annotate stage clusters DINOv2 features with KMeans /
DBSCAN to label concepts (``src/pmc_oa/`` annotate pipeline; SURVEY §2.10
scoped it to capability notes in round 1 — this closes it for the KMeans
member). Spark-first shape:

- **assignment** is a broadcast join against the K centroids (map-side,
  no shuffle of the corpus) + a min-by over K distances;
- **update** is posexplode -> (cell, dim) sum/count -> re-assemble the
  centroid arrays — two narrow aggregations whose shuffle carries
  K x dims rows, not the corpus;
- the loop is driver-side over immutable DataFrames with the tiny
  centroid relation localCheckpoint()ed per round, exactly the iterative
  pattern of the connected-components operator.

Why INTEGER arithmetic: cross-row float summation order differs between
engines (and across DuckDB's own parallel aggregation runs), so a
float-avg centroid would drift and flip assignments. Scaling components
to micro-units (round(x * 1e6) as bigint) makes every sum exact and
order-free; squared distances stay far inside int64 (|v| <= ~5.3e5,
64 dims -> max dist ~7e13). The DuckDB oracle unrolls the same
fixed number of Lloyd rounds as CTE stages — bit-identical at every step.

Deterministic init: the first K vectors (same stand-in discipline as
ann_ivf_coarse, whose "production build swaps in trained centroids" —
these ARE those trained centroids; chain the two for a trained-IVF index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tbl

_K = 8
_ITERS = 3
_SCALE = 1_000_000
_DIMS = 64

_IDIST = ("cast(aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)), "
          "0L, (acc, d) -> acc + d) as bigint)")


def _int_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings")
    # cast float -> double BEFORE scaling: float32 arithmetic would round
    # differently from DuckDB's double path (the conversion itself is exact)
    return e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            f"cast(round(cast(x as double) * {_SCALE}.0) as bigint))"
        ).alias("v"),
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid per vector; ties break on the lower cell id."""
    scored = vecs.join(F.broadcast(cents)).select(
        "vec_id", "cell",
        F.expr(_IDIST.format(a="v", b="cv")).alias("dist"),
    )
    return scored.groupBy("vec_id").agg(
        F.min_by(F.struct("cell", "dist"),
                 F.struct("dist", "cell")).alias("w")
    ).select("vec_id", F.col("w.cell").alias("cell"),
             F.col("w.dist").alias("dist"))


def _update(assigned: DataFrame, vecs: DataFrame) -> DataFrame:
    """Component-wise integer-floor mean of each cell's members."""
    memb = assigned.join(vecs, "vec_id").select(
        "cell", F.posexplode("v").alias("dim", "val")
    )
    comp = memb.groupBy("cell", "dim").agg(
        F.floor(F.sum("val") / F.count(F.lit(1)).cast("double"))
        .cast("bigint").alias("cvi")
    )
    return comp.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cvi"))),
            lambda s: s["cvi"],
        ).alias("cv")
    )


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K=8 Lloyd's KMeans, 3 update rounds, final assignment + exact
    integer squared distance."""
    vecs = _int_vecs(spark, sf_dir).persist()
    cents = vecs.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("cv")
    )
    for _ in range(_ITERS):
        assigned = _assign(vecs, cents)
        # K x dims rows: checkpoint keeps the per-round plan flat
        cents = _update(assigned, vecs).localCheckpoint()
    out = _assign(vecs, cents).orderBy("vec_id")
    vecs.unpersist()
    return out


def _kmeans_sql() -> str:
    dist = (f"CAST(list_sum(list_transform(range(1, {_DIMS} + 1), "
            "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)")
    parts = [
        f"""v AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}.0)
                                  AS BIGINT)) AS v
  FROM embeddings
)""",
        f"""c0 AS (
  SELECT CAST(vec_id AS INT) AS cell, v AS cv FROM v WHERE vec_id < {_K}
)""",
    ]
    for it in range(_ITERS):
        d = dist.format(a="v.v", b=f"c{it}.cv")
        parts.append(f"""a{it} AS (
  SELECT vec_id, cell, dist FROM (
    SELECT v.vec_id, c{it}.cell, {d} AS dist,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {d} ASC, c{it}.cell ASC) AS rn
    FROM v CROSS JOIN c{it}
  ) WHERE rn = 1
)""")
        parts.append(f"""u{it} AS (
  SELECT a.cell, t.dim,
         CAST(floor(sum(v.v[t.dim]) / CAST(count(*) AS DOUBLE)) AS BIGINT)
           AS cvi
  FROM a{it} a JOIN v USING (vec_id),
       UNNEST(range(1, {_DIMS} + 1)) AS t(dim)
  GROUP BY a.cell, t.dim
)""")
        parts.append(f"""c{it + 1} AS (
  SELECT cell, list(cvi ORDER BY dim) AS cv FROM u{it} GROUP BY cell
)""")
    d_final = dist.format(a="v.v", b=f"c{_ITERS}.cv")
    parts.append(f"""afinal AS (
  SELECT vec_id, cell, dist FROM (
    SELECT v.vec_id, c{_ITERS}.cell, {d_final} AS dist,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY {d_final} ASC, c{_ITERS}.cell ASC) AS rn
    FROM v CROSS JOIN c{_ITERS}
  ) WHERE rn = 1
)""")
    return ("WITH " + ",\n".join(parts)
            + "\nSELECT vec_id, cell, dist FROM afinal ORDER BY vec_id")


KMEANS_SQL = _kmeans_sql()


# --------------------------------------------------------------- DBSCAN
_EPS2 = 1_350_000_000_000  # squared micro-unit distance (~1.16 in float space)
_MIN_NBRS = 2              # minPts = 3 counting the point itself


def dbscan_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic DBSCAN over the embeddings (the reference's
    annotate-stage density clustering, SURVEY §2.10): core points have
    >= minPts-1 neighbors within eps; clusters are connected components of
    the core-core neighbor graph (same min-label loop as dedup_clusters);
    border points take the MIN cluster label among their core neighbors
    (textbook DBSCAN is scan-order-dependent for borders — the min rule is
    the deterministic canonicalization, which a distributed engine needs
    anyway); everything else is noise (cluster_id = -1).

    The neighbor search here is all-pairs on integer distances
    (validation scale, like embedding_near_dup); at corpus scale the pair
    generation swaps for the LSH/IVF bucket pre-filter — every step after
    the edge list is already linear.
    """
    vecs = _int_vecs(spark, sf_dir).persist()
    a = vecs.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    # eager checkpoint: the expensive all-pairs edge list materializes once
    # and the vector cache can be released before the iterative phase
    pairs = (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", F.expr(_IDIST.format(a="va", b="vb")).alias("d"))
        .filter(F.col("d") <= _EPS2)
        .select("i", "j")
        .localCheckpoint()
    )
    vecs.unpersist()
    sym = pairs.unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"))
    )
    nbr_counts = sym.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    core = nbr_counts.filter(F.col("n") >= _MIN_NBRS).select(
        F.col("i").alias("vec_id"))
    # connected components over CORE-CORE edges (min-label propagation)
    cc_edges = (
        sym.join(core.withColumnRenamed("vec_id", "i"), "i")
        .join(core.withColumnRenamed("vec_id", "j"), "j")
        .select("i", "j")
        .localCheckpoint()
    )
    labels = (
        core.select(F.col("vec_id").alias("i"))
        .withColumn("label", F.col("i"))
    )
    # isolated cores (no core neighbor) keep their own id as the label
    while True:
        nbr = (
            cc_edges.join(labels.withColumnRenamed("i", "j"), "j")
            .select("i", "label")
        )
        new_labels = (
            nbr.unionByName(labels)
            .groupBy("i")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "old"), "i")
            .filter(F.col("label") != F.col("old"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    core_labeled = labels.select(
        F.col("i").alias("vec_id"), F.col("label").alias("cluster_id"))
    # borders: non-core points adjacent to a core -> min core cluster label
    border = (
        sym.join(core_labeled.withColumnRenamed("vec_id", "j"), "j")
        .join(core.withColumnRenamed("vec_id", "i"), "i", "left_anti")
        .groupBy(F.col("i").alias("vec_id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
    everyone = _int_vecs(spark, sf_dir).select("vec_id")
    out = (
        everyone
        .join(core_labeled.withColumn("role", F.lit("core")),
              "vec_id", "left")
        .join(border.withColumnRenamed("cluster_id", "b_cluster"),
              "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(
                F.col("role"),
                F.when(F.col("b_cluster").isNotNull(), "border"),
                F.lit("noise"),
            ).alias("role"),
            F.coalesce(F.col("cluster_id"), F.col("b_cluster"), F.lit(-1))
            .cast("bigint").alias("cluster_id"),
        )
        .orderBy("vec_id")
    )
    return out


_DB_DIST = (f"CAST(list_sum(list_transform(range(1, {_DIMS} + 1), "
            "k -> (a.v[k] - b.v[k]) * (a.v[k] - b.v[k]))) AS BIGINT)")
DBSCAN_SQL = f"""
WITH RECURSIVE
v AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {_SCALE}.0)
                                  AS BIGINT)) AS v
  FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS i, b.vec_id AS j
  FROM v a JOIN v b ON a.vec_id < b.vec_id AND {_DB_DIST} <= {_EPS2}
),
sym AS (
  SELECT i, j FROM pairs UNION ALL SELECT j AS i, i AS j FROM pairs
),
core AS (
  SELECT i AS vec_id FROM sym GROUP BY i HAVING count(*) >= {_MIN_NBRS}
),
cce AS (
  SELECT s.i, s.j FROM sym s
  JOIN core ci ON ci.vec_id = s.i
  JOIN core cj ON cj.vec_id = s.j
),
reach(u, w) AS (
  SELECT i, j FROM cce
  UNION
  SELECT r.u, e.j FROM reach r JOIN cce e ON r.w = e.i
),
core_labeled AS (
  SELECT c.vec_id,
         least(c.vec_id, coalesce(min(r.w), c.vec_id)) AS cluster_id
  FROM core c LEFT JOIN reach r ON r.u = c.vec_id
  GROUP BY c.vec_id
),
border AS (
  SELECT s.i AS vec_id, min(cl.cluster_id) AS cluster_id
  FROM sym s
  JOIN core_labeled cl ON cl.vec_id = s.j
  WHERE s.i NOT IN (SELECT vec_id FROM core)
  GROUP BY s.i
)
SELECT e.vec_id,
       CASE WHEN cl.vec_id IS NOT NULL THEN 'core'
            WHEN b.vec_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(coalesce(cl.cluster_id, b.cluster_id, -1) AS BIGINT) AS cluster_id
FROM v e
LEFT JOIN core_labeled cl ON cl.vec_id = e.vec_id
LEFT JOIN border b ON b.vec_id = e.vec_id
ORDER BY e.vec_id
"""


QUERIES: dict[str, tuple] = {
    "kmeans_assign": (kmeans_assign, KMEANS_SQL),
    "dbscan_labels": (dbscan_labels, DBSCAN_SQL),
}
