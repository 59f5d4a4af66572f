"""SURVEY S5 (tar.gz extract) and J8 (positional zip join).

S5: the archive codec is REAL (stdlib tarfile) — the round-trip query's
oracle hashes the source rows, so any byte lost/duplicated by the
pack/extract path fails the compare. Reference analogue:
src/pmc_oa/download.py:169-181 (unzip_file member walk).

J8: positional alignment without monotonically_increasing_id/zipWithIndex
(whose values depend on partitioning) — the prefix-sum positional index
must be a permutation 1..N under the key order, with every window
partitioned. Reference analogue: scripts/Labeler/03_get_label_dict.py:56-59.
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import functions as F

from biomedica_etl_spark.operators.multimodal import (
    tar_extract_roundtrip,
    _build_tar_group,
)
from biomedica_etl_spark.operators.relational import (
    _positional_index,
    positional_zip_join,
)
from biomedica_etl_spark.sources import tbl

SF_DIR = "/root/testdata/sf0.001"


def test_tar_roundtrip_every_doc_exactly_once(spark):
    out = tar_extract_roundtrip(spark, SF_DIR)
    docs = tbl(spark, SF_DIR, "documents").filter(F.col("text").isNotNull())
    src = {
        r["doc_id"]: (r["md5"], r["nbytes"])
        for r in docs.select(
            "doc_id", F.md5(F.encode("text", "UTF-8")).alias("md5"),
            F.octet_length("text").cast("long").alias("nbytes")).collect()
    }
    got = [(r["doc_id"], r["payload_md5"], r["payload_bytes"]) for r in out.collect()]
    assert len(got) == len(src)  # exactly once, none lost
    assert len({d for d, *_ in got}) == len(got)
    for doc_id, md5, nbytes in got:
        assert src[doc_id] == (md5, nbytes)


def test_tar_blob_is_real_targz(spark):
    """The packed blob is a genuine .tar.gz an external tool could read."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"archive_id": [3, 3], "doc_id": [10, 2],
         "text": ["héllo wörld", ""]}  # unicode + empty payload survive
    )
    blob = _build_tar_group(pdf)["tar"].iloc[0]
    with tarfile.open(fileobj=io.BytesIO(blob), mode="r:gz") as tf:
        members = {m.name: tf.extractfile(m).read() for m in tf.getmembers()}
    # members in doc_id order, content byte-exact
    assert list(members) == ["2.txt", "10.txt"]
    assert members["10.txt"] == "héllo wörld".encode("utf-8")
    assert members["2.txt"] == b""


def test_positional_index_is_permutation_and_partitioned(spark):
    df = tbl(spark, SF_DIR, "documents").select("doc_id")
    n = df.count()
    indexed = _positional_index(df, "doc_id")
    rows = indexed.orderBy("doc_id").collect()
    # permutation 1..N, monotone in the key order
    assert [r["pos"] for r in rows] == list(range(1, n + 1))
    # the window is partitioned (pid), never a global single-task window
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    for spec in plan.split("windowspecdefinition(")[1:]:
        assert spec.startswith("pid"), plan
    assert "hashpartitioning(pid" in plan, plan


def test_positional_zip_join_alignment(spark):
    out = positional_zip_join(spark, SF_DIR).collect()
    docs = sorted(r["doc_id"] for r in
                  tbl(spark, SF_DIR, "documents").select("doc_id").collect())
    vecs = sorted(r["vec_id"] for r in
                  tbl(spark, SF_DIR, "embeddings").select("vec_id").collect())
    expect = [(i + 1, d, v) for i, (d, v) in enumerate(zip(docs, vecs))]
    assert [(r["pos"], r["doc_id"], r["vec_id"]) for r in out] == expect
