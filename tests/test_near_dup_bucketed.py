"""embedding_near_dup_bucketed: identical output to the all-pairs twin by
construction (triangle-inequality cell pruning is conservative), and the
prune actually fires on clustered data — the 100 TB case, since real
embedding corpora are clustered (isotropic fixtures provably cannot be
pruned by ANY exact method; see the operator docstring).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from biomedica_etl_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"


def test_identical_to_all_pairs_on_fixture(spark):
    base = sorted(tuple(r) for r in sim.embedding_near_dup(spark, SF_DIR).collect())
    bucketed = sorted(
        tuple(r) for r in sim.embedding_near_dup_bucketed(spark, SF_DIR).collect()
    )
    assert bucketed == base
    assert len(base) > 0  # the fixture plants qualifying pairs


def _clustered_vectors(spark, n_clusters=8, per_cluster=40, dim=16):
    """Tight clusters around orthogonal axes: e_k + 0.015*noise, unit-ish
    norms — the shape of a real (semantically clustered) embedding corpus."""
    rng = np.random.default_rng(7)
    rows = []
    # interleave ids across clusters so the deterministic centroid set
    # (vec_id < _ND_CELLS) samples every cluster — matching how a real
    # pipeline would feed trained KMeans centroids into the quantizer
    for j in range(per_cluster):
        for k in range(n_clusters):
            center = np.zeros(dim)
            center[k] = 1.0
            v = center + 0.015 * rng.standard_normal(dim)
            rows.append((j * n_clusters + k, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_prunes_clustered_corpus_and_stays_exact(spark):
    raw = _clustered_vectors(spark)
    e = raw.select(
        "vec_id", F.col("embedding").alias("v")
    ).withColumn("norm", F.expr("sqrt(" + sim._DOT.format(a="v", b="v") + ")"))

    assigned, radii, cents = sim._nd_cells_and_radii(e, sim._ND_CELLS)
    surv = sim._nd_surviving_cell_pairs(cents, radii, sim._ND_THRESHOLD)
    n_cells = cents.count()
    total_pairs = n_cells * (n_cells + 1) // 2
    kept = surv.count()
    # orthogonal tight clusters: cross-cluster cell pairs are provably
    # empty (angle ~90deg >> theta_t + radii) and must be pruned
    assert kept < 0.5 * total_pairs, (kept, total_pairs)

    bucketed = sorted(
        tuple(r)
        for r in sim._near_dup_bucketed_impl(e, sim._ND_CELLS, sim._ND_THRESHOLD).collect()
    )
    # brute-force truth on the same vectors
    a = e.select(F.col("vec_id").alias("d1"), F.col("v").alias("v1"), F.col("norm").alias("n1"))
    b = e.select(F.col("vec_id").alias("d2"), F.col("v").alias("v2"), F.col("norm").alias("n2"))
    cos = F.round(
        F.expr(sim._DOT.format(a="v1", b="v2")) / (F.col("n1") * F.col("n2")), 6
    )
    truth = sorted(
        tuple(r)
        for r in a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", cos.alias("cosine"))
        .filter(F.col("cosine") >= sim._ND_THRESHOLD)
        .collect()
    )
    assert bucketed == truth
    assert len(truth) > 100  # within-cluster pairs all qualify
