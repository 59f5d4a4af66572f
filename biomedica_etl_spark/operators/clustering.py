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
_IDOT = ("cast(aggregate(zip_with({a}, {b}, (p, q) -> p * q), 0L, "
         "(acc, t) -> acc + t) as bigint)")


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


def _allpairs_eps_edges(vecs: DataFrame) -> DataFrame:
    """All-pairs eps-neighbor edge list — the oracle-scale baseline
    (quadratic; ``_grid_eps_edges`` is the scale path)."""
    a = vecs.select(F.col("vec_id").alias("i"), F.col("v").alias("va"))
    b = vecs.select(F.col("vec_id").alias("j"), F.col("v").alias("vb"))
    return (
        a.join(b, F.col("i") < F.col("j"))
        .select("i", "j", F.expr(_IDIST.format(a="va", b="vb")).alias("d"))
        .filter(F.col("d") <= _EPS2)
        .select("i", "j")
    )


# grid cell width in micro-units, >= eps = sqrt(_EPS2) ~= 1,161,895: any
# pair within eps differs by <= eps per COORDINATE, so it lands in the
# same or an adjacent cell along every gridded dimension — the grid
# pre-filter is EXACT, not approximate
_CELL_W = 1_200_000
_GRID_DIMS = 2


def _grid_eps_edges(vecs: DataFrame) -> DataFrame:
    """Grid-bucketed eps-neighbor edges — the scale path for the DBSCAN
    candidate generation (VERDICT r2 item 4). Each vector is assigned one
    grid cell on the leading ``_GRID_DIMS`` coordinates (cell width >=
    eps); side A keeps its own cell while side B fans out to the 3^d
    neighboring cells, so the join is KEY-EQUI on the cell id — shuffle
    linear in rows x 3^d, per-cell pair count bounded by local density,
    AQE splits hot cells. Guaranteed-identical output to all-pairs: a
    within-eps pair differs by <= eps per coordinate and therefore by at
    most one cell index per gridded dimension. Probe cells are distinct,
    so each pair is emitted exactly once — no dedup shuffle. At corpus
    scale you grid more dimensions (cost 3^d on the tiny probe side only)
    to keep cell occupancy near the true neighborhood density."""
    cells = vecs.select(
        "vec_id", "v",
        *[F.floor(F.element_at("v", k + 1) / _CELL_W).cast("long").alias(f"c{k}")
          for k in range(_GRID_DIMS)],
    )
    a = cells.select(
        F.col("vec_id").alias("i"), F.col("v").alias("va"),
        *[F.col(f"c{k}").alias(f"k{k}") for k in range(_GRID_DIMS)],
    )
    offsets = F.array(*[
        F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
        for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    ])
    b = cells.select(
        F.col("vec_id").alias("j"), F.col("v").alias("vb"),
        "c0", "c1", F.explode(offsets).alias("o"),
    ).select(
        "j", "vb",
        (F.col("c0") + F.col("o.dx")).alias("k0"),
        (F.col("c1") + F.col("o.dy")).alias("k1"),
    )
    return (
        a.join(b, ["k0", "k1"])
        .filter(F.col("i") < F.col("j"))
        .select("i", "j", F.expr(_IDIST.format(a="va", b="vb")).alias("d"))
        .filter(F.col("d") <= _EPS2)
        .select("i", "j")
    )


def dbscan_labels(
    spark: SparkSession, sf_dir: str, edges: str = "allpairs"
) -> DataFrame:
    """Deterministic DBSCAN over the embeddings (the reference's
    annotate-stage density clustering, SURVEY §2.10): core points have
    >= minPts-1 neighbors within eps; clusters are connected components of
    the core-core neighbor graph (same min-label loop as dedup_clusters);
    border points take the MIN cluster label among their core neighbors
    (textbook DBSCAN is scan-order-dependent for borders — the min rule is
    the deterministic canonicalization, which a distributed engine needs
    anyway); everything else is noise (cluster_id = -1).

    ``edges='allpairs'`` is the quadratic oracle-scale baseline;
    ``edges='grid'`` is the scale path (exact grid pre-filter, identical
    output — see ``_grid_eps_edges``). Every step after the edge list is
    linear in edges either way.
    """
    vecs = _int_vecs(spark, sf_dir).persist()
    edge_fn = _grid_eps_edges if edges == "grid" else _allpairs_eps_edges
    # eager checkpoint: the expensive edge list materializes once and the
    # vector cache can be released before the iterative phase
    pairs = edge_fn(vecs).localCheckpoint()
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


# ------------------------------------------------- trained-IVF ANN chain
_NPROBE_TRAINED = 2


def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index over TRAINED centroids — the composition
    ``ann_ivf_coarse``'s docstring promises: the Lloyd's loop above
    produces the coarse quantizer, then the IVF plan is unchanged
    (broadcast centroids -> map-side assignment -> key-equi cell join,
    query side alone fanning out nprobe=2). All-integer distances, so
    ranking is bit-stable across engines. Reference analogue: the
    annotate pipeline trains KMeans on extracted features and then
    searches within clusters (``scripts/Labeler/02_train_labelers.py``,
    ``scripts/06_serilaize_to_webdataset_parallel.py:125-157``)."""
    from pyspark.sql import Window

    vecs = _int_vecs(spark, sf_dir).persist()
    cents = vecs.filter(F.col("vec_id") < _K).select(
        F.col("vec_id").cast("int").alias("cell"), F.col("v").alias("cv")
    )
    for _ in range(_ITERS):
        cents = _update(_assign(vecs, cents), vecs).localCheckpoint()
    scored = vecs.join(F.broadcast(cents)).select(
        "vec_id", "v", "cell",
        F.expr(_IDIST.format(a="v", b="cv")).alias("dist"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy("dist", "cell")
    ranked = scored.withColumn("rn", F.row_number().over(w_assign))
    assigned = ranked.filter("rn = 1").select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"), "cell")
    q = ranked.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("rn") <= _NPROBE_TRAINED)
    ).select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "cell")
    pairs = q.join(assigned, ["cell"]).filter(
        F.col("neighbor_id") != F.col("query_id"))
    d = F.expr(_IDIST.format(a="qv", b="nv")).alias("d")
    w_rank = Window.partitionBy("query_id").orderBy("d", "neighbor_id")
    out = (
        pairs.select("cell", "query_id", "neighbor_id", d)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter("rank <= 3")
        .orderBy("query_id", "rank")
    )
    vecs.unpersist()
    return out


def _ivf_trained_sql() -> str:
    """KMeans CTE chain + IVF search CTEs — the same unrolled rounds as
    KMEANS_SQL, then assignment/probing off the final centroids."""
    base = KMEANS_SQL
    # reuse everything up to (and including) the final WITH stage; rebuild
    # the tail: ranked assignment with rn kept, probes, pairs, top-3
    head = base[: base.rindex(",\nafinal AS")]
    d_final = (f"CAST(list_sum(list_transform(range(1, {_DIMS} + 1), "
               f"i -> (v.v[i] - c{_ITERS}.cv[i]) * (v.v[i] - c{_ITERS}.cv[i])))"
               " AS BIGINT)")
    pair_d = (f"CAST(list_sum(list_transform(range(1, {_DIMS} + 1), "
              "i -> (q.qv[i] - a.nv[i]) * (q.qv[i] - a.nv[i]))) AS BIGINT)")
    return f"""{head},
ranked AS (
  SELECT v.vec_id, v.v, c{_ITERS}.cell, {d_final} AS dist,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY {d_final} ASC, c{_ITERS}.cell ASC) AS rn
  FROM v CROSS JOIN c{_ITERS}
),
assigned AS (
  SELECT vec_id AS neighbor_id, v AS nv, cell FROM ranked WHERE rn = 1
),
q AS (
  SELECT vec_id AS query_id, v AS qv, cell
  FROM ranked WHERE vec_id % 50 = 0 AND rn <= {_NPROBE_TRAINED}
),
pairs AS (
  SELECT a.cell, q.query_id, a.neighbor_id, {pair_d} AS d
  FROM q JOIN assigned a USING (cell)
  WHERE a.neighbor_id <> q.query_id
)
SELECT cell, query_id, neighbor_id, d, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY d ASC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 3
ORDER BY query_id, rank
"""


ANN_IVF_TRAINED_SQL = _ivf_trained_sql()


# ------------------------------------------------ integer power-method PCA
_PCA_ITERS = 5
_W_SCALE = 10_000      # fixed-point scale of the component vector
_PCA_UNIT = 100        # data in centi-units keeps every product < 2^53,
                       # so the floor(double-division) steps are exact on
                       # both engines (SURVEY §2.10 bit-stability rule)


def pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component by FIXED-ITERATION integer power method —
    closing SURVEY §2.10's PCA note with the same discipline as
    ``kmeans_assign`` (reference: PCA over DINOv2 features,
    ``src/pmc_oa/label_utils/models.py:11-63``). Float eigensolvers are
    not bit-stable across engines; this is: data is centered in exact
    centi-unit integers, the power step w <- X^T (X w) is all-bigint
    (posexplode -> per-dim sum, the kmeans _update shape — shuffle
    carries dims rows, not the corpus), and the per-round rescale divides
    by an integer derived from max|u| via floor() on doubles that are
    exact (< 2^53). Five rounds from e_1, then each vector's
    projection score = dot(x, w) — an exact bigint the DuckDB oracle
    reproduces bit-for-bit with unrolled CTEs."""
    e = tbl(spark, sf_dir, "embeddings")
    cvecs = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> "
            f"cast(round(cast(x as double) * {_PCA_UNIT}.0) as bigint))"
        ).alias("c"),
    )
    means = cvecs.select(F.posexplode("c").alias("dim", "val")).groupBy(
        "dim").agg(
        F.floor(F.sum("val") / F.count(F.lit(1)).cast("double"))
        .cast("bigint").alias("m"))
    mean_arr = means.groupBy().agg(
        F.transform(F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"]).alias("mv"))
    x = cvecs.join(F.broadcast(mean_arr)).select(
        "vec_id", F.expr("zip_with(c, mv, (a, b) -> a - b)").alias("x")
    ).persist()
    wdf = spark.createDataFrame(
        [([_W_SCALE] + [0] * (_DIMS - 1),)], "w array<bigint>")
    dot_xw = _IDOT.format(a="x", b="w")
    for _ in range(_PCA_ITERS):
        scored = x.join(F.broadcast(wdf)).select(
            "x", F.expr(dot_xw).alias("s"))
        u = scored.select(F.posexplode("x").alias("dim", "xi"), "s").groupBy(
            "dim").agg(F.sum(F.col("xi") * F.col("s")).alias("u"))
        uarr = u.groupBy().agg(
            F.transform(F.array_sort(F.collect_list(F.struct("dim", "u"))),
                        lambda s: s["u"]).alias("uv"))
        wdf = uarr.select(
            F.expr(
                "transform(uv, e -> cast(floor(e / greatest(1.0, "
                f"floor(aggregate(uv, 0L, (m, z) -> greatest(m, abs(z))) "
                f"/ {_W_SCALE}.0))) as bigint))"
            ).alias("w")
        ).localCheckpoint()
    out = (
        x.join(F.broadcast(wdf))
        .select("vec_id", F.expr(dot_xw).alias("score"))
        .orderBy("vec_id")
    )
    x.unpersist()
    return out


def _pca_sql() -> str:
    idot = (f"CAST(list_sum(list_transform(range(1, {_DIMS} + 1), "
            "i -> {a}[i] * {b}[i])) AS BIGINT)")
    parts = [
        f"""c AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * {_PCA_UNIT}.0)
                                  AS BIGINT)) AS c
  FROM embeddings
)""",
        f"""mean AS (
  SELECT list(m ORDER BY dim) AS mv FROM (
    SELECT t.dim,
           CAST(floor(sum(c.c[t.dim]) / CAST(count(*) AS DOUBLE)) AS BIGINT)
             AS m
    FROM c, UNNEST(range(1, {_DIMS} + 1)) AS t(dim)
    GROUP BY t.dim
  )
)""",
        f"""x AS (
  SELECT vec_id,
         list_transform(range(1, {_DIMS} + 1), i -> c.c[i] - mean.mv[i]) AS x
  FROM c CROSS JOIN mean
)""",
        f"""w0 AS (
  SELECT list_transform(range(1, {_DIMS} + 1),
                        i -> CASE WHEN i = 1 THEN CAST({_W_SCALE} AS BIGINT)
                                  ELSE CAST(0 AS BIGINT) END) AS w
)""",
    ]
    for it in range(_PCA_ITERS):
        s_d = idot.format(a="x.x", b=f"w{it}.w")
        parts.append(f"""s{it} AS (
  SELECT x.vec_id, x.x, {s_d} AS s FROM x CROSS JOIN w{it}
)""")
        parts.append(f"""u{it} AS (
  SELECT list(u ORDER BY dim) AS uv FROM (
    SELECT t.dim, CAST(sum(s.x[t.dim] * s.s) AS BIGINT) AS u
    FROM s{it} s, UNNEST(range(1, {_DIMS} + 1)) AS t(dim)
    GROUP BY t.dim
  )
)""")
        parts.append(f"""w{it + 1} AS (
  SELECT list_transform(uv, e -> CAST(floor(e / greatest(1.0,
           floor(list_max(list_transform(uv, z -> abs(z)))
                 / {_W_SCALE}.0))) AS BIGINT)) AS w
  FROM u{it}
)""")
    final = idot.format(a="x.x", b=f"w{_PCA_ITERS}.w")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT x.vec_id, {final} AS score"
            f"\nFROM x CROSS JOIN w{_PCA_ITERS} ORDER BY x.vec_id")


PCA_SQL = _pca_sql()


def dbscan_labels_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN with the grid-bucketed candidate generation — same oracle as
    the all-pairs twin because the grid pre-filter is exact."""
    return dbscan_labels(spark, sf_dir, edges="grid")


QUERIES: dict[str, tuple] = {
    "kmeans_assign": (kmeans_assign, KMEANS_SQL),
    "dbscan_labels": (dbscan_labels, DBSCAN_SQL),
    "dbscan_labels_bucketed": (dbscan_labels_bucketed, DBSCAN_SQL),
    "ann_ivf_trained": (ann_ivf_trained, ANN_IVF_TRAINED_SQL),
    "pca_project": (pca_project, PCA_SQL),
}
