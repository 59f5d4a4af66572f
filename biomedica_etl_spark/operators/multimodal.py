"""Multimodal column plumbing: opaque binary payloads + Arrow-batched UDFs.

The reference's image pipeline (hash_image PIL thumbnailing,
``src/pmc_oa/build_json.py:936-985``; WebDataset decode,
``src/pmc_oa/data_loaders/wd_loader.py:5-61``) treats media as bytes plus
typed metadata. Here the Spark-side plumbing is real — binary column,
``mapInPandas`` with Arrow batches, typed output schema, partition-level
batching — while the actual codec step is STUBBED (no image/audio libs in
this container): a deterministic fake decode derived from byte length.

``decode_image_batch`` is the swap-in point: replace the stub body with a
real PIL/libvips call and nothing else changes. Per-batch vectorized
pandas ops only — no per-row Python outside the pandas batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tbl

DECODE_SCHEMA = "doc_id bigint, n_bytes bigint, width int, height int, status string"


def _decode_stub(n_bytes: pd.Series) -> pd.DataFrame:
    """Deterministic fake of a codec: dims derived from payload length.

    REAL IMPLEMENTATION STUB — with PIL available this becomes
    ``Image.open(io.BytesIO(b)).size``; raise if someone expects real
    decoding semantics from the fake.
    """
    return pd.DataFrame(
        {
            "width": (n_bytes % 640 + 16).astype("int32"),
            "height": (n_bytes % 480 + 16).astype("int32"),
            "status": "stub-decoded",
        }
    )


def decode_image_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in, typed metadata batch out.

    Swap ``_decode_stub`` for the real codec (PIL/libvips/ffmpeg) when the
    libs exist; the Arrow plumbing, schema, and batch shape stay as-is.
    """
    for pdf in batches:
        n_bytes = pdf["payload"].map(len).astype("int64")
        meta = _decode_stub(n_bytes)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": n_bytes,
                "width": meta["width"],
                "height": meta["height"],
                "status": meta["status"],
            }
        )


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas decode -> typed metadata + quality gate.

    The oracle can mirror the *stub's* arithmetic in SQL, so this stays a
    fully-checked query even though the codec is fake. Scale: payloads
    stay in executor Arrow batches end-to-end; only metadata columns come
    out, so the downstream shuffle carries no media bytes.
    """
    d = tbl(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    decoded = payloads.mapInPandas(decode_image_batch, DECODE_SCHEMA)
    return (
        decoded.withColumn("passes_gate", (F.col("width") > 20) & (F.col("height") > 20))
        .orderBy("doc_id")
    )


MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(octet_length(encode(text)) % 640 + 16 AS INTEGER) AS width,
       CAST(octet_length(encode(text)) % 480 + 16 AS INTEGER) AS height,
       'stub-decoded' AS status,
       (octet_length(encode(text)) % 640 + 16 > 20
        AND octet_length(encode(text)) % 480 + 16 > 20) AS passes_gate
FROM documents ORDER BY doc_id
"""


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset bigint, frame_hash string"
_FRAME_SIZE = 64  # stub "frame" = fixed-size slice of the payload
_SAMPLE_EVERY = 4


def sample_frames_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with 1->N fan-out: every 4th fixed-size slice of
    the payload becomes a sampled "frame" row (video frame-sampling shape;
    swap the slicing for a real demuxer when ffmpeg exists — the Arrow
    plumbing, 1->N batch shape, and schema stay as-is). The fan-out happens
    inside the Arrow batch — no explode shuffle, and payload bytes never
    leave the executor; only frame metadata comes out."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [],
                                "frame_offset": [], "frame_hash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // _FRAME_SIZE
            for i in range(0, n_frames, _SAMPLE_EVERY):
                off = i * _FRAME_SIZE
                out["doc_id"].append(int(doc_id))
                out["frame_idx"].append(i)
                out["frame_offset"].append(off)
                out["frame_hash"].append(
                    hashlib.md5(
                        payload[off:off + _FRAME_SIZE].encode("utf-8")
                    ).hexdigest()
                )
        yield pd.DataFrame(out)


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> sampled frame rows (deterministic stub demux)."""
    d = tbl(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.col("text").alias("payload"))
    return payloads.mapInPandas(sample_frames_batch, FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


FRAME_SAMPLE_SQL = f"""
WITH p AS (SELECT doc_id, text AS payload FROM documents),
f AS (
  SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
         CAST(i * {_FRAME_SIZE} AS BIGINT) AS frame_offset,
         md5(substring(payload, CAST(i * {_FRAME_SIZE} + 1 AS INTEGER), {_FRAME_SIZE})) AS frame_hash
  FROM p, UNNEST(range(0, length(payload) // {_FRAME_SIZE}, {_SAMPLE_EVERY})) AS t(i)
)
SELECT * FROM f ORDER BY doc_id, frame_idx
"""


RESIZE_SCHEMA = ("doc_id bigint, width int, height int, out_w int, out_h int, "
                 "thumb_hash string")
_TARGET = 224


def resize_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: aspect-preserving thumbnail resize (the
    reference's ``hash_image`` PIL thumbnail step,
    ``src/pmc_oa/build_json.py:936-985``). Dims come from the stub decode;
    the scale math is pure integer floor division so every engine agrees;
    the resample itself is stubbed as an md5 over (payload head, out dims)
    — swap for ``Image.thumbnail`` when PIL exists. Vectorized pandas ops,
    payload never leaves the Arrow batch."""
    import hashlib

    for pdf in batches:
        n_bytes = pdf["payload"].map(len).astype("int64")
        meta = _decode_stub(n_bytes)
        w = meta["width"].astype("int64")
        h = meta["height"].astype("int64")
        # fit the LONG side to _TARGET: scale = TARGET / max(w, h)
        long_side = pd.concat([w, h], axis=1).max(axis=1)
        out_w = (w * _TARGET) // long_side
        out_h = (h * _TARGET) // long_side
        thumb = [
            hashlib.md5(
                (p[:64] + f"{ow}x{oh}").encode("utf-8")
            ).hexdigest()
            for p, ow, oh in zip(pdf["payload"].map(
                lambda b: b.decode("utf-8")), out_w, out_h)
        ]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"].astype("int64"),
            "width": w.astype("int32"),
            "height": h.astype("int32"),
            "out_w": out_w.astype("int32"),
            "out_h": out_h.astype("int32"),
            "thumb_hash": thumb,
        })


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> stub decode -> aspect-preserving resize metadata."""
    d = tbl(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(resize_batch, RESIZE_SCHEMA).orderBy("doc_id")


MULTIMODAL_RESIZE_SQL = f"""
WITH m AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) % 640 + 16 AS BIGINT) AS w,
         CAST(octet_length(encode(text)) % 480 + 16 AS BIGINT) AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST((w * {_TARGET}) // greatest(w, h) AS INTEGER) AS out_w,
       CAST((h * {_TARGET}) // greatest(w, h) AS INTEGER) AS out_h,
       md5(substring(text, 1, 64)
           || CAST((w * {_TARGET}) // greatest(w, h) AS VARCHAR) || 'x'
           || CAST((h * {_TARGET}) // greatest(w, h) AS VARCHAR)) AS thumb_hash
FROM m ORDER BY doc_id
"""


EMBED_SCHEMA = ("doc_id bigint, f0 double, f1 double, f2 double, f3 double")


def embed_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: feature-extraction stub — a deterministic
    4-dim embedding from md5 slices of the payload (swap for a real
    vision/audio encoder; the Arrow batch shape and output schema are what
    a GPU-backed encoder stage would keep). Values are 32-bit hash slices
    scaled to [0, 1) with an exact power-of-two divisor, so both engines
    produce bit-identical doubles."""
    import hashlib

    for pdf in batches:
        feats: dict[str, list] = {"doc_id": [], "f0": [], "f1": [],
                                  "f2": [], "f3": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            hx = hashlib.md5(payload).hexdigest()
            feats["doc_id"].append(int(doc_id))
            for k in range(4):
                feats[f"f{k}"].append(
                    int(hx[8 * k: 8 * k + 8], 16) / 4294967296.0
                )
        yield pd.DataFrame(feats)


def multimodal_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> stub feature extraction (fixed-dim embedding)."""
    d = tbl(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    return payloads.mapInPandas(embed_batch, EMBED_SCHEMA).orderBy("doc_id")


_EMBED_F_SQL = ", ".join(
    f"CAST('0x' || substr(md5(text), {8 * k + 1}, 8) AS BIGINT)"
    f" / 4294967296.0 AS f{k}"
    for k in range(4)
)
MULTIMODAL_EMBED_SQL = f"""
SELECT doc_id, {_EMBED_F_SQL}
FROM documents ORDER BY doc_id
"""


def multimodal_embed_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode -> index loop COMPOSED (reference: feature extraction
    feeds labeler training/search end-to-end,
    ``scripts/Labeler/01_get_features.py`` -> ``02_train_labelers.py``):
    payloads run through the Arrow ``mapInPandas`` encoder stage, then the
    resulting embedding column feeds the bucketed ANN search — the same
    one-bucket-per-row key-equi shape as ``ann_lsh_bucketed``, so the
    shuffle stays linear in rows. Queries (doc_id % 50 = 0) get their
    top-3 nearest neighbors within their bucket by squared distance;
    bucket = quantized leading feature. With a real encoder swapped into
    ``embed_batch`` nothing downstream changes — this row proves the two
    stages compose plan-to-plan."""
    from pyspark.sql import Window

    d = tbl(spark, sf_dir, "documents")
    payloads = d.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))
    emb = payloads.mapInPandas(embed_batch, EMBED_SCHEMA).withColumn(
        "bucket", F.floor(F.col("f0") * 16).cast("int"))
    q = emb.filter(F.col("doc_id") % 50 == 0).select(
        "bucket", F.col("doc_id").alias("query_id"),
        *[F.col(f"f{k}").alias(f"q{k}") for k in range(4)])
    c = emb.select(
        "bucket", F.col("doc_id").alias("neighbor_id"),
        *[F.col(f"f{k}").alias(f"n{k}") for k in range(4)])
    dist2 = F.round(sum(
        (F.col(f"q{k}") - F.col(f"n{k}")) * (F.col(f"q{k}") - F.col(f"n{k}"))
        for k in range(4)), 9)
    w = Window.partitionBy("query_id").orderBy("dist2", "neighbor_id")
    return (
        q.join(c, ["bucket"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("dist2", dist2)
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 3")
        .select("bucket", "query_id", "neighbor_id", "dist2", "rank")
        .orderBy("query_id", "rank")
    )


_EMB_D2 = ("(q.f0 - c.f0) * (q.f0 - c.f0) + (q.f1 - c.f1) * (q.f1 - c.f1)"
           " + (q.f2 - c.f2) * (q.f2 - c.f2) + (q.f3 - c.f3) * (q.f3 - c.f3)")
EMBED_ANN_SQL = f"""
WITH e AS (
  SELECT doc_id, {_EMBED_F_SQL}
  FROM documents
),
b AS (
  SELECT doc_id, f0, f1, f2, f3,
         CAST(floor(f0 * 16) AS INT) AS bucket
  FROM e
),
pairs AS (
  SELECT q.bucket, q.doc_id AS query_id, c.doc_id AS neighbor_id,
         round({_EMB_D2}, 9) AS dist2
  FROM b q JOIN b c ON q.bucket = c.bucket AND c.doc_id <> q.doc_id
  WHERE q.doc_id % 50 = 0
)
SELECT bucket, query_id, neighbor_id, dist2, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY dist2 ASC, neighbor_id ASC) AS rank
  FROM pairs
) WHERE rank <= 3
ORDER BY query_id, rank
"""


# --- tar archive codec (SURVEY S5) -------------------------------------------
#
# The reference unpacks downloaded .tar.gz media archives and walks their
# members (src/pmc_oa/download.py:169-181 unzip_file; :229-267 delete_files).
# The engine treats an archive exactly like any other opaque media payload: a
# binary column whose CODEC runs inside the Arrow batch. tarfile is stdlib, so
# unlike the image codecs this kernel is REAL, which also lets the query prove
# the round-trip: pack documents into in-memory .tar.gz shards, extract the
# members back, and hash the payloads — the oracle hashes the source rows
# directly, so any byte lost or duplicated by the archive path fails the row.
# The member walk is a loop over tar entries INSIDE the batch — inherent to
# the format, same class as a frame loop in a video codec kernel.

_TAR_BUILD_SCHEMA = "archive_id bigint, tar binary"
_TAR_EXTRACT_SCHEMA = "doc_id bigint, payload binary"
_TAR_GROUPS = 64


def _build_tar_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: one group -> one .tar.gz blob (members in
    doc_id order, zeroed metadata so the archive depends only on content)."""
    import io
    import tarfile

    buf = io.BytesIO()
    rows = sorted(zip(pdf["doc_id"], pdf["text"]))
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for doc_id, text in rows:
            data = str(text).encode("utf-8")
            info = tarfile.TarInfo(name=f"{int(doc_id)}.txt")
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))
    return pd.DataFrame(
        {"archive_id": [int(pdf["archive_id"].iloc[0])], "tar": [buf.getvalue()]}
    )


def _extract_tar_members(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: archives in, one row per member out. Payload
    bytes never leave the executor's Arrow batch."""
    import io
    import tarfile

    for pdf in batches:
        ids: list[int] = []
        payloads: list[bytes] = []
        for blob in pdf["tar"]:
            with tarfile.open(fileobj=io.BytesIO(bytes(blob)), mode="r:gz") as tf:
                for m in tf.getmembers():
                    ids.append(int(m.name.removesuffix(".txt")))
                    payloads.append(tf.extractfile(m).read())
        yield pd.DataFrame({"doc_id": ids, "payload": payloads})


def tar_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> pack into 64 .tar.gz shards -> extract members ->
    (doc_id, payload_md5, payload_bytes). Scale: shard assignment is a pure
    hash of the key (pmod), each archive is one group on one task, and the
    extract is a streaming batch codec — nothing global, nothing pairwise.
    Archive sizing at 100 TB is the same target-bytes discipline as the
    sink's shard rotation (cdc/merge.py), not a fixed group count."""
    docs = (
        tbl(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("text").isNotNull())
        .withColumn("archive_id", F.pmod(F.col("doc_id"), F.lit(_TAR_GROUPS)))
    )
    archives = docs.groupBy("archive_id").applyInPandas(
        lambda pdf: _build_tar_group(pdf), _TAR_BUILD_SCHEMA
    )
    members = archives.mapInPandas(_extract_tar_members, _TAR_EXTRACT_SCHEMA)
    return members.select(
        "doc_id",
        F.md5("payload").alias("payload_md5"),
        F.length("payload").cast("long").alias("payload_bytes"),
    ).orderBy("doc_id")


# the oracle hashes the SOURCE rows: equality proves the archive round-trip
# preserved every document's exact bytes, once each
TAR_ROUNDTRIP_SQL = """
SELECT doc_id,
       md5(text) AS payload_md5,
       CAST(strlen(text) AS BIGINT) AS payload_bytes
FROM documents
WHERE text IS NOT NULL
ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "tar_extract_roundtrip": (tar_extract_roundtrip, TAR_ROUNDTRIP_SQL),
    "multimodal_decode": (multimodal_decode, MULTIMODAL_SQL),
    "multimodal_frame_sample": (multimodal_frame_sample, FRAME_SAMPLE_SQL),
    "multimodal_resize": (multimodal_resize, MULTIMODAL_RESIZE_SQL),
    "multimodal_embed": (multimodal_embed, MULTIMODAL_EMBED_SQL),
    "multimodal_embed_ann": (multimodal_embed_ann, EMBED_ANN_SQL),
}
