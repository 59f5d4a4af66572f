"""Similarity search over the ``embeddings`` table (array<float> column).

- ``cosine_topk``: brute-force cosine top-k for a query subset — the
  correctness baseline. Dot products via ``zip_with`` + ``aggregate``
  fold (JVM-side, no Python); floats upcast to double FIRST so both
  engines accumulate identically.
- ``embedding_near_dup``: all-pairs cosine >= threshold (dedup by
  embedding) — quadratic, fine at validation scale.
- ``ann_lsh_bucketed``: the scale path — sign-bit LSH bucket on the
  leading dimensions; candidates only join within a bucket, so the
  shuffle is linear in rows and the per-bucket pair count is bounded.
  At 100 TB you'd add multi-probe + repeated plane sets; the plumbing
  (bucket -> co-partitioned self-join) is what this demonstrates.

Cosine values are rounded to 6 dp before ranking/thresholding so the
two engines' (IEEE-identical up to summation strategy) doubles compare
stably; ranks tie-break on neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tbl

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def _vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = tbl(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).withColumn("norm", F.expr("sqrt(" + _DOT.format(a="v", b="v") + ")"))


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT cosine top-3 neighbors for query vectors (vec_id % 50 = 0).

    Plan shape (pinned in tests/test_plans.py): the query side BROADCASTS
    and Spark picks BroadcastNestedLoopJoin — every corpus partition is
    scanned exactly once and scored against the in-memory query block,
    which is the standard exact blocked-scan at any scale. Cost is
    O(corpus x queries): LINEAR in the corpus for a fixed query set (the
    production case — an eval/query workload doesn't grow with the
    table); only this fixture's choice of "every 50th vector is a query"
    makes it look quadratic. For corpus-scales-with-queries workloads the
    ann_* operators are the blessed paths, with their recall vs this
    exact baseline measured by ``ann_recall_report``."""
    from pyspark.sql import Window

    e = _vecs(spark, sf_dir)
    q = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    pairs = q.join(e, F.col("vec_id") != F.col("query_id"))
    cos = F.round(
        F.expr(_DOT.format(a="qv", b="v")) / (F.col("qnorm") * F.col("norm")), 6
    ).alias("cosine")
    scored = pairs.select("query_id", F.col("vec_id").alias("neighbor_id"), cos)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .orderBy("query_id", "rank")
    )


COSINE_TOPK_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM n WHERE vec_id % 50 = 0),
scored AS (
  SELECT query_id, vec_id AS neighbor_id,
         round(list_dot_product(qv, v) / (qnorm * norm), 6) AS cosine
  FROM q JOIN n ON vec_id <> query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= 3
ORDER BY query_id, rank
"""


def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs embedding-cosine near-dup candidates (cos >= 0.45).

    Genuinely quadratic, and at THIS threshold that is inherent to the
    exact problem: cos >= t maps to L2 <= sqrt(2-2t) on normalized
    vectors = 1.05 here, wider than half the coordinate range, so an
    exact grid/metric pre-filter (the ``dbscan_labels_bucketed`` trick)
    degenerates to ~2 cells per dimension and prunes nothing. Exact
    low-threshold similarity has no sub-quadratic algorithm; production
    pipelines use the approximate ``ann_*`` paths and measure the recall
    they trade (``ann_recall_report``). Kept as the oracle-scale
    correctness baseline those paths are validated against."""
    e = _vecs(spark, sf_dir)
    a = e.select(F.col("vec_id").alias("d1"), F.col("v").alias("v1"), F.col("norm").alias("n1"))
    b = e.select(F.col("vec_id").alias("d2"), F.col("v").alias("v2"), F.col("norm").alias("n2"))
    cos = F.round(F.expr(_DOT.format(a="v1", b="v2")) / (F.col("n1") * F.col("n2")), 6)
    return (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", cos.alias("cosine"))
        .filter("cosine >= 0.45")
        .orderBy("d1", "d2")
    )


NEAR_DUP_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e)
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
FROM n a JOIN n b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.45
ORDER BY d1, d2
"""

# --- exact bucketed near-dup (identical-output scale twin) -------------------
_ND_CELLS = 32
_ND_THRESHOLD = 0.45
# conservative slack on the triangle-inequality prune: absorbs the <=1-ulp
# acos/rounding differences between evaluation sites so a borderline cell
# pair is always KEPT (extra kept pairs only cost a re-score; the final
# threshold filter is exact either way)
_ND_SLACK = 1e-3


def _nd_cells_and_radii(e: DataFrame, n_cells: int):
    """Assign every vector to its nearest-of-``n_cells`` deterministic
    centroid (vec_id < n_cells, same convention as IVF) and compute each
    cell's angular radius. Returns (assigned, radii, cents)."""
    from pyspark.sql import Window

    cents = e.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    ccos = F.round(
        F.expr(_DOT.format(a="v", b="cv")) / (F.col("norm") * F.col("cnorm")), 6
    )
    scored = e.join(F.broadcast(cents)).select(
        "vec_id", "v", "norm", "cell_id", ccos.alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell_id"))
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select(
            "vec_id", "v", "norm", "cell_id",
            F.acos(F.least(F.greatest(F.col("ccos"), F.lit(-1.0)), F.lit(1.0)))
            .alias("cang"),
        )
    )
    radii = assigned.groupBy("cell_id").agg(F.max("cang").alias("r"))
    return assigned, radii, cents


def _nd_surviving_cell_pairs(
    cents: DataFrame, radii: DataFrame, threshold: float
) -> DataFrame:
    """Cell pairs (c1 <= c2) that can possibly host a qualifying pair:
    angular triangle inequality gives theta(x, y) >= theta(c1, c2) - r1 - r2
    for x in cell c1, y in cell c2, so a cell pair with
    theta(c1, c2) > theta_t + r1 + r2 is provably empty of matches.
    O(cells^2) rows — broadcast-small by construction."""
    import math

    a = cents.select(F.col("cell_id").alias("c1"), F.col("cv").alias("v1"),
                     F.col("cnorm").alias("n1"))
    b = cents.select(F.col("cell_id").alias("c2"), F.col("cv").alias("v2"),
                     F.col("cnorm").alias("n2"))
    cang = F.acos(F.least(F.greatest(
        F.expr(_DOT.format(a="v1", b="v2")) / (F.col("n1") * F.col("n2")),
        F.lit(-1.0)), F.lit(1.0)))
    pairs = (
        a.join(b, F.col("c1") <= F.col("c2"))
        .select("c1", "c2", cang.alias("cc_ang"))
        .join(radii.select(F.col("cell_id").alias("c1"), F.col("r").alias("r1")), "c1")
        .join(radii.select(F.col("cell_id").alias("c2"), F.col("r").alias("r2")), "c2")
        .filter(F.col("cc_ang")
                <= F.lit(math.acos(threshold) + _ND_SLACK) + F.col("r1") + F.col("r2"))
        .select("c1", "c2")
    )
    return pairs


def _near_dup_bucketed_impl(
    e: DataFrame, n_cells: int, threshold: float,
    block_rows: int = 4096,
) -> DataFrame:
    """Surviving cell pairs are scored as BLOCKS through a cogrouped Arrow
    UDF (one numpy mul-add sweep per cell pair) instead of a row-per-pair
    join: the previous plan materialized every candidate pair as a wide
    row carrying both vectors (~1 KB x O(pairs) through the join, and the
    interpreted ``aggregate``/``zip_with`` lambda per pair) and measured
    ~20 s at sf0.1; this plan ships each vector once per PARTNER CELL
    (O(rows x surviving partners) narrow rows through two key-equi
    shuffles) and scores the |c1| x |c2| block vectorized — ~4x on the
    same input, and the gap widens with pair count.

    Exactness: the kernel accumulates ``M += A[:,k] * B[:,k]`` over dims
    k = 0..d-1 from 0.0 — the SAME mul-then-add value sequence, in the
    same order, as the ``_DOT`` fold (IEEE ``0 + x == x``), so the raw
    cosine is bit-identical to the all-pairs twin's. The UDF filters only
    with a one-ulp-safe slack; the exact ``round(.., 6) >= threshold``
    decision happens JVM-side with the identical expression the twin
    uses. Per-task memory is bounded by ``block_rows`` x |c2| doubles
    (the A side is swept in chunks), not by the full cell-pair block."""
    import numpy as np
    import pandas as pd

    assigned, radii, cents = _nd_cells_and_radii(e, n_cells)
    surv = _nd_surviving_cell_pairs(cents, radii, threshold)
    fan_a = assigned.join(
        F.broadcast(surv), assigned["cell_id"] == surv["c1"]
    ).select("c1", "c2", "vec_id", "v", "norm")
    # distinct column names on the B side: cogrouping two frames derived
    # from the same (assigned, surv) plans trips the ambiguous-self-join
    # check if their schemas collide attribute-for-attribute
    fan_b = (
        assigned.select(
            F.col("cell_id").alias("cell_b"), F.col("vec_id").alias("vec_id_b"),
            F.col("v").alias("v_b"), F.col("norm").alias("norm_b"),
        )
        .join(
            F.broadcast(surv.select(F.col("c1").alias("k1"),
                                    F.col("c2").alias("k2"))),
            F.col("cell_b") == F.col("k2"),
        )
        .select("k1", "k2", "vec_id_b", "v_b", "norm_b")
    )
    # emit-side slack: round(x, 6) can lift a raw cosine by at most 5e-7,
    # so anything the exact JVM-side filter could keep is >= t - 1e-6 raw
    emit_floor = threshold - 1e-6

    def _score(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"d1": pd.Series(dtype="int64"),
                              "d2": pd.Series(dtype="int64"),
                              "cosine": pd.Series(dtype="float64")})
        if len(left) == 0 or len(right) == 0:
            return empty
        same_cell = key[0] == key[1]
        ids_b = right["vec_id_b"].to_numpy()
        vb = np.stack(right["v_b"].to_numpy())        # (nb, d) float64
        nb = right["norm_b"].to_numpy()
        out = [empty]
        for lo in range(0, len(left), block_rows):
            chunk = left.iloc[lo:lo + block_rows]
            ids_a = chunk["vec_id"].to_numpy()
            va = np.stack(chunk["v"].to_numpy())      # (na, d)
            na = chunk["norm"].to_numpy()
            dot = np.zeros((len(chunk), len(right)))
            for k in range(va.shape[1]):
                # mul then add, dims in order, from 0.0: bit-identical to
                # the _DOT fold's value sequence per pair
                dot += np.multiply.outer(va[:, k], vb[:, k])
            cos = dot / np.multiply.outer(na, nb)
            mask = cos >= emit_floor
            if same_cell:
                mask &= ids_a[:, None] < ids_b[None, :]
            ia, ib = np.nonzero(mask)
            if len(ia):
                da, db = ids_a[ia], ids_b[ib]
                out.append(pd.DataFrame({
                    "d1": np.minimum(da, db), "d2": np.maximum(da, db),
                    "cosine": cos[ia, ib]}))
        return pd.concat(out, ignore_index=True)

    scored = (
        fan_a.groupBy("c1", "c2")
        .cogroup(fan_b.groupBy("k1", "k2"))
        .applyInPandas(_score, schema="d1 long, d2 long, cosine double")
    )
    return (
        scored.select(
            "d1", "d2", F.round(F.col("cosine"), 6).alias("cosine")
        )
        .filter(F.col("cosine") >= threshold)
        .orderBy("d1", "d2")
    )


def embedding_near_dup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical-output scale twin of ``embedding_near_dup``: exact
    triangle-inequality cell pruning (Elkan-style) instead of one
    broadcast-nested-loop all-pairs scan.

    Vectors are assigned to their nearest of 32 deterministic centroid
    cells (broadcast join, map-side — same machinery as IVF); a cell PAIR
    survives only if the angular triangle inequality allows a qualifying
    pair across it (theta(c1,c2) <= theta_t + r1 + r2). Surviving pairs
    drive a key-equi fan-out join, and survivors re-score exactly at the
    same rounded threshold — so the output is provably identical to the
    all-pairs twin (shared oracle) at ANY scale, not just the tested ones.

    Scale story: the pair work is partitioned by cell pair (key-equi
    shuffle, AQE-splittable, per-task memory bounded by a cell-pair
    block) instead of one quadratic broadcast loop. On real embedding
    corpora — which are clustered (that is why SemDeDup-style pipelines
    work) — cell radii shrink and the prune drops most cell pairs; the
    planted-cluster test pins that behavior. On adversarially ISOTROPIC
    data (this synthetic fixture: measured mean cell radius ~81 degrees)
    NO exact method can prune — distances concentrate, so every cell pair
    legitimately survives and the operator degrades to a distributed
    blocked all-pairs rather than a single-task hazard. Exact
    low-threshold dense similarity has no sub-quadratic algorithm; the
    recall-trading ``ann_*`` paths remain the approximate alternative,
    with their miss rate measured by ``ann_recall_report``."""
    e = _vecs(spark, sf_dir)
    return _near_dup_bucketed_impl(e, _ND_CELLS, _ND_THRESHOLD)


_N_PLANES = 8  # sign bits of the leading dims -> 256 buckets


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: sign-LSH on the first 8 dims, cosine within buckets.

    Linear shuffle: each row lands in exactly one bucket; the self-join is
    key-equi on bucket, so Spark co-partitions both sides and AQE splits
    hot buckets."""
    e = _vecs(spark, sf_dir)
    bucket = None
    for i in range(_N_PLANES):
        bit = F.when(F.element_at("v", i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    e = e.withColumn("bucket", bucket.cast("int"))
    a = e.select(F.col("bucket"), F.col("vec_id").alias("d1"),
                 F.col("v").alias("v1"), F.col("norm").alias("n1"))
    b = e.select(F.col("bucket"), F.col("vec_id").alias("d2"),
                 F.col("v").alias("v2"), F.col("norm").alias("n2"))
    cos = F.round(F.expr(_DOT.format(a="v1", b="v2")) / (F.col("n1") * F.col("n2")), 6)
    return (
        a.join(b, ["bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .select("bucket", "d1", "d2", cos.alias("cosine"))
        .filter("cosine >= 0.3")
        .orderBy("bucket", "d1", "d2")
    )


def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH top-3: queries (vec_id % 50 = 0) probe their
    own bucket PLUS every Hamming-distance-1 bucket (flip one of the 8
    sign bits) — the standard recall fix for boundary vectors whose
    near-neighbors landed one bit away. Corpus stays single-bucket; only
    the tiny query side fans out x9, so the join stays key-equi and the
    shuffle stays linear in corpus rows."""
    from pyspark.sql import Window

    e = _vecs(spark, sf_dir)
    bucket = None
    for i in range(_N_PLANES):
        bit = F.when(F.element_at("v", i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    e = e.withColumn("bucket", bucket.cast("int"))
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(_N_PLANES)],
    )
    q = (
        e.filter(F.col("vec_id") % 50 == 0)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
                F.col("norm").alias("qnorm"),
                F.explode(probes).alias("bucket"))
    )
    cand = e.select("bucket", F.col("vec_id").alias("neighbor_id"),
                    F.col("v").alias("nv"), F.col("norm").alias("nnorm"))
    pairs = q.join(cand, ["bucket"]).filter(
        F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(
        F.expr(_DOT.format(a="qv", b="nv")) / (F.col("qnorm") * F.col("nnorm")), 6
    ).alias("cosine")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.select("query_id", "neighbor_id", cos)
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .orderBy("query_id", "rank")
    )


_BUCKET_SQL = " + ".join(
    f"CASE WHEN v[{i + 1}] > 0 THEN {1 << i} ELSE 0 END" for i in range(_N_PLANES)
)
ANN_LSH_MULTIPROBE_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
             CAST({_BUCKET_SQL} AS INTEGER) AS bucket FROM e),
q AS (
  SELECT vec_id AS query_id, v AS qv, norm AS qnorm, p.bucket
  FROM n, UNNEST([n.bucket,
                  {", ".join(f"xor(n.bucket, {1 << i})" for i in range(_N_PLANES))}
                 ]) AS p(bucket)
  WHERE vec_id % 50 = 0
),
pairs AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, c.v) / (q.qnorm * c.norm), 6) AS cosine
  FROM q JOIN n c ON q.bucket = c.bucket AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 3
ORDER BY query_id, rank
"""
ANN_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm,
             CAST({_BUCKET_SQL} AS INTEGER) AS bucket FROM e)
SELECT a.bucket, a.vec_id AS d1, b.vec_id AS d2,
       round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS cosine
FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) >= 0.3
ORDER BY a.bucket, d1, d2
"""


_N_CELLS = 16


def ann_ivf_coarse(
    spark: SparkSession, sf_dir: str, nprobe: int = 1
) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest of 16 centroid cells,
    then exact top-3 cosine within the query's ``nprobe`` nearest cells.

    Centroids are deterministic (the vectors with vec_id < 16) so the
    whole operator stays DuckDB-oracle-checkable; a production build swaps
    in trained KMeans centroids and nothing else changes. The plan is the
    IVF scale shape: the centroid table broadcasts (assignment is
    map-side, no shuffle of the corpus), vectors then join candidates
    key-equi on cell_id — shuffle linear in rows x nprobe, per-cell pair
    count bounded by the cell size, AQE splits hot cells. ``nprobe > 1``
    is the standard recall knob: only the QUERY side fans out to its n
    nearest cells (the corpus stays single-assigned, so probed cells are
    disjoint and no candidate dedup is needed).
    """
    from pyspark.sql import Window

    e = _vecs(spark, sf_dir)
    cents = e.filter(F.col("vec_id") < _N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    scored = e.join(F.broadcast(cents)).select(
        "vec_id", "v", "norm", "cell_id",
        F.round(F.expr(_DOT.format(a="v", b="cv")) / (F.col("norm") * F.col("cnorm")), 6)
        .alias("ccos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell_id"))
    ranked = scored.withColumn("rn", F.row_number().over(w_assign))
    assigned = ranked.filter("rn = 1").select("vec_id", "v", "norm", "cell_id")
    q = ranked.filter(
        (F.col("vec_id") % 50 == 0) & (F.col("rn") <= nprobe)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"), "cell_id",
    )
    cand = assigned.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"), "cell_id",
    )
    pairs = q.join(cand, ["cell_id"]).filter(F.col("neighbor_id") != F.col("query_id"))
    cos = F.round(
        F.expr(_DOT.format(a="qv", b="nv")) / (F.col("qnorm") * F.col("nnorm")), 6
    ).alias("cosine")
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.select("cell_id", "query_id", F.col("neighbor_id"), cos)
        .withColumn("rank", F.row_number().over(w_rank))
        .filter("rank <= 3")
        .orderBy("query_id", "rank")
    )


def ann_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 — the recall-vs-cost knob turned one notch: each
    query searches its two nearest cells. Same single key-equi shuffle;
    only the tiny query side doubles."""
    return ann_ivf_coarse(spark, sf_dir, nprobe=2)


def _ivf_sql(nprobe: int) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
),
n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e),
cents AS (SELECT vec_id AS cell_id, v AS cv, norm AS cnorm FROM n WHERE vec_id < {_N_CELLS}),
scored AS (
  SELECT n.vec_id, n.v, n.norm, cents.cell_id,
         round(list_dot_product(n.v, cents.cv) / (n.norm * cents.cnorm), 6) AS ccos
  FROM n CROSS JOIN cents
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cell_id ASC) AS rn
  FROM scored
),
assigned AS (SELECT vec_id, v, norm, cell_id FROM ranked WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm, cell_id
      FROM ranked WHERE vec_id % 50 = 0 AND rn <= {nprobe}),
pairs AS (
  SELECT a.cell_id, q.query_id, a.vec_id AS neighbor_id,
         round(list_dot_product(q.qv, a.v) / (q.qnorm * a.norm), 6) AS cosine
  FROM q JOIN assigned a ON q.cell_id = a.cell_id AND a.vec_id <> q.query_id
)
SELECT cell_id, query_id, neighbor_id, cosine, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 3
ORDER BY query_id, rank
"""


ANN_IVF_SQL = _ivf_sql(1)
ANN_IVF_NPROBE2_SQL = _ivf_sql(2)


def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the approximate paths against the brute-force truth —
    the evaluation loop that justifies shipping an ANN index at 100 TB
    (you never deploy a bucketed index without measuring what the buckets
    cost in recall). Per query: how many of the exact top-3 cosine
    neighbors each approximate method recovered. Both sides are
    deterministic, so the whole report is oracle-checkable — at corpus
    scale you run the exact side on a sampled query set only."""
    truth = cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    out = None
    for method, fn in (("lsh_multiprobe", ann_lsh_multiprobe),
                       ("ivf_nprobe2", ann_ivf_nprobe2)):
        got = fn(spark, sf_dir).select("query_id", "neighbor_id")
        hits = (
            truth.join(got, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("n_hits"))
        )
        rep = (
            truth.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select(
                F.lit(method).alias("method"), "query_id",
                F.coalesce("n_hits", F.lit(0)).cast("int").alias("n_hits"),
                F.round(F.coalesce("n_hits", F.lit(0)) / 3.0, 6).alias("recall"),
            )
        )
        out = rep if out is None else out.unionByName(rep)
    return out.orderBy("method", "query_id")


ANN_RECALL_SQL = f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM ({COSINE_TOPK_SQL}) t
),
mp AS (SELECT query_id, neighbor_id FROM ({ANN_LSH_MULTIPROBE_SQL}) m),
iv AS (SELECT query_id, neighbor_id FROM ({ANN_IVF_NPROBE2_SQL}) i),
qs AS (SELECT DISTINCT query_id FROM truth),
h_mp AS (
  SELECT t.query_id, count(*) AS n_hits FROM truth t
  WHERE EXISTS (SELECT 1 FROM mp WHERE mp.query_id = t.query_id
                AND mp.neighbor_id = t.neighbor_id)
  GROUP BY t.query_id
),
h_iv AS (
  SELECT t.query_id, count(*) AS n_hits FROM truth t
  WHERE EXISTS (SELECT 1 FROM iv WHERE iv.query_id = t.query_id
                AND iv.neighbor_id = t.neighbor_id)
  GROUP BY t.query_id
)
SELECT method, query_id, n_hits, recall FROM (
  SELECT 'lsh_multiprobe' AS method, qs.query_id,
         CAST(coalesce(h_mp.n_hits, 0) AS INT) AS n_hits,
         round(coalesce(h_mp.n_hits, 0) / 3.0, 6) AS recall
  FROM qs LEFT JOIN h_mp ON h_mp.query_id = qs.query_id
  UNION ALL
  SELECT 'ivf_nprobe2' AS method, qs.query_id,
         CAST(coalesce(h_iv.n_hits, 0) AS INT) AS n_hits,
         round(coalesce(h_iv.n_hits, 0) / 3.0, 6) AS recall
  FROM qs LEFT JOIN h_iv ON h_iv.query_id = qs.query_id
)
ORDER BY method, query_id
"""


QUERIES: dict[str, tuple] = {
    "cosine_topk": (cosine_topk, COSINE_TOPK_SQL),
    "embedding_near_dup": (embedding_near_dup, NEAR_DUP_SQL),
    # identical output by construction -> shares the all-pairs oracle
    "embedding_near_dup_bucketed": (embedding_near_dup_bucketed, NEAR_DUP_SQL),
    "ann_lsh_bucketed": (ann_lsh_bucketed, ANN_LSH_SQL),
    "ann_lsh_multiprobe": (ann_lsh_multiprobe, ANN_LSH_MULTIPROBE_SQL),
    "ann_ivf_coarse": (ann_ivf_coarse, ANN_IVF_SQL),
    "ann_ivf_nprobe2": (ann_ivf_nprobe2, ANN_IVF_NPROBE2_SQL),
    "ann_recall_report": (ann_recall_report, ANN_RECALL_SQL),
}
