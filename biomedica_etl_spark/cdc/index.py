"""Incrementally-maintained inverted token index over the transcripts table.

A search-index maintainer is the canonical CDF consumer that NEEDS row
images: when a turn's text changes, the index must retract the OLD text's
postings (tokens the new text no longer contains) and add the new ones —
information the live table alone cannot provide without a full rescan.
``TokenIndex`` keeps a postings table ``(token, conv_id, turn_idx, tf)``
in sync with a ``CowTable`` by consuming ``read_changes_with_images``:

- postings are hash-sharded on ``pmod(xxhash64(token), n_shards)`` — the
  same hidden-partitioning discipline as the main table's conv_id buckets,
  with the same driver-side pure-Python hash twin for O(1) shard pruning
  on lookups (no Spark job to locate a term's shard);
- a refresh rewrites ONLY the shards touched by the window's tokens
  (pre-image AND post-image tokens — both sides name every shard whose
  postings can change); every other shard's files are carried forward BY
  REFERENCE in the version manifest. Refresh cost is
  O(changes + affected-shard postings), never O(index);
- state versions are immutable shard directories + an atomic pointer
  file — the engine's own commit discipline — so a crash mid-refresh
  leaves the previous version intact and a replayed refresh converges to
  the identical state (the fold is a pure function of
  (old postings, image window));
- when the commit chain since the cursor is not feed-serveable (COW
  rewrite, major compaction, rollback — the feed's documented resync
  contract), ``refresh`` falls back to a full rebuild at the target
  snapshot, exactly like any external CDF subscriber. Minor folds are
  served transparently and never force a rebuild.

Scale story at the 10^10-row design point: the steady-state refresh reads
the O(changes) image feed (payload pruned to ``text``), explodes to
tokens (one generated-column explode, no UDF), and joins only the
affected shards' postings — a bounded fraction of the index chosen by the
window's own vocabulary. The bootstrap is one full scan + one shuffle on
(token, key), both linear.

Reference analogue: the reference rebuilds derived search structure by
re-running the whole extract chain (``scripts/02_extract_media.py``
re-filters everything); here the derived structure advances in O(changes).

Tokenization is deliberately SQL-expressible (lower + split on
non-alphanumeric runs, empty tokens dropped, per-row term frequency) so
the DuckDB oracle can recompute the index from the replayed final state.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .table import CowTable
from .xxhash import xxh64_signed

# One split regex, mirrored verbatim in the oracle SQL. Java's split drops
# trailing empty strings while DuckDB's string_split_regex keeps them, so
# BOTH sides filter token <> '' — the only row the engines disagree on.
TOKEN_SPLIT = "[^a-z0-9]+"

POSTING_SCHEMA = T.StructType([
    T.StructField("token", T.StringType()),
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.LongType()),
    T.StructField("tf", T.LongType()),
])


def shard_of(token: str, n_shards: int) -> int:
    """Driver-side shard of a token — bit-identical to the Spark-side
    ``pmod(xxhash64(token), n_shards)`` (pinned by the xxhash twin test
    corpus), so a term lookup prunes to one shard with zero Spark jobs."""
    return xxh64_signed(token.encode("utf-8")) % n_shards


def postings_of(df: DataFrame, n_shards: int) -> DataFrame:
    """(token, conv_id, turn_idx, tf, shard) postings of a keyed DataFrame
    with a ``text`` column. Pure generated-column work: lower + split +
    explode + hash-aggregate — no UDF, stays in WholeStageCodegen."""
    return (
        df.select(
            "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
            F.explode(F.split(F.lower(F.col("text")), TOKEN_SPLIT))
            .alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token", "conv_id", "turn_idx")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("shard", F.pmod(F.xxhash64("token"), F.lit(n_shards)))
    )


class TokenIndex:
    """Sharded inverted index, advanced in O(changes) from the image feed."""

    def __init__(self, root: str, n_shards: int = 16) -> None:
        self.root = root
        self.n_shards = n_shards
        os.makedirs(root, exist_ok=True)

    # --- manifest -------------------------------------------------------

    def _pointer_path(self) -> str:
        return os.path.join(self.root, "pointer.json")

    def _pointer(self) -> dict[str, Any] | None:
        p = self._pointer_path()
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def cursor(self) -> int | None:
        ptr = self._pointer()
        return None if ptr is None else ptr["snapshot_id"]

    def shard_dirs(self) -> dict[int, str]:
        """Current shard -> relative-dir map (absent shard = empty)."""
        ptr = self._pointer()
        if ptr is None:
            return {}
        return {int(k): v for k, v in ptr["shards"].items()}

    def _flip(self, snapshot_id: int, shards: dict[int, str]) -> None:
        tmp = self._pointer_path() + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump({"snapshot_id": int(snapshot_id),
                       "shards": {str(k): v for k, v in shards.items()}}, f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self._pointer_path())
        # GC: single-writer discipline — after the atomic flip every
        # shard dir the new manifest does not reference (superseded
        # versions and crash orphans alike) is garbage
        referenced = set(shards.values())
        for entry in os.listdir(self.root):
            cont = os.path.join(self.root, entry)
            if not (entry.startswith("d-") and os.path.isdir(cont)):
                continue
            for sub in os.listdir(cont):
                rel = f"{entry}/{sub}"
                if sub.startswith("shard=") and rel not in referenced:
                    shutil.rmtree(os.path.join(cont, sub),
                                  ignore_errors=True)
            if not os.listdir(cont):
                try:
                    os.rmdir(cont)
                except OSError:
                    pass

    # --- reads ----------------------------------------------------------

    def read(self, spark: SparkSession,
             shards: list[int] | None = None) -> DataFrame:
        """The postings, optionally pruned to a shard list. Reading the
        shard dirs directly (no discovery over the root) keeps a pruned
        lookup's file listing proportional to the shards it touches."""
        dirs = self.shard_dirs()
        if shards is not None:
            dirs = {k: v for k, v in dirs.items() if k in shards}
        paths = [os.path.join(self.root, v) for v in sorted(dirs.values())]
        if not paths:
            return spark.createDataFrame([], POSTING_SCHEMA)
        return spark.read.schema(POSTING_SCHEMA).parquet(*paths)

    def lookup(self, spark: SparkSession, tokens: list[str]) -> DataFrame:
        """Postings of the given terms. Shards computed DRIVER-side with
        the pure-Python xxh64 twin (microseconds, no job), so a 3-term
        query against a 10^10-posting index plans a scan over at most 3
        shards; within a shard the token-sorted files row-group-prune on
        the ``token = x`` min/max stats."""
        shards = sorted({shard_of(t, self.n_shards) for t in tokens})
        return self.read(spark, shards=shards).filter(
            F.col("token").isin(list(tokens)))

    # --- refresh --------------------------------------------------------

    def _write_shards(self, postings: DataFrame,
                      candidates: list[int]) -> dict[int, str]:
        """Write postings into a fresh immutable container dir, one
        subdirectory per shard, files sorted by token (then key) so term
        lookups row-group-prune. Returns shard -> relative path for the
        shards that actually produced rows (an affected shard whose
        postings all vanished simply drops out of the manifest)."""
        cont = f"d-{uuid.uuid4().hex}"
        out = os.path.join(self.root, cont)
        (postings
         .repartition(max(len(candidates), 1), "shard")
         .sortWithinPartitions("shard", "token", "conv_id", "turn_idx")
         .write.partitionBy("shard").parquet(out))
        written: dict[int, str] = {}
        for sub in os.listdir(out):
            if sub.startswith("shard="):
                written[int(sub.split("=", 1)[1])] = f"{cont}/{sub}"
        return written

    def refresh(self, spark: SparkSession, table: CowTable) -> dict[str, Any]:
        """Advance the index to the table's current snapshot.

        Bootstrap (no cursor) and the resync fallback rebuild every shard
        from one pruned full scan; the steady state consumes the image
        window and rewrites only the shards its tokens (old and new) live
        in, carrying every other shard forward by reference."""
        snap = table.current_snapshot()
        if snap is None:
            raise ValueError("table has no snapshots; create() it first")
        target = snap["snapshot_id"]
        cur = self.cursor()
        if cur == target:
            return {"refreshed": False, "cursor": cur}

        if cur is not None:
            try:
                imgs = table.read_changes_with_images(
                    spark, cur, to_snapshot=target, columns=["text"])
            except ValueError:
                imgs = None  # not feed-serveable -> rebuild below
            if imgs is not None:
                return self._refresh_incremental(spark, imgs, target)

        # bootstrap / rebuild: postings of the full live state, pinned to
        # the target snapshot so concurrent ingest cannot leak rows past
        # the cursor being recorded
        posts = postings_of(
            table.read(spark, snapshot_id=target, columns=["text"]),
            self.n_shards)
        shards = self._write_shards(posts, list(range(self.n_shards)))
        self._flip(target, shards)
        return {"refreshed": True, "cursor": target,
                "mode": "bootstrap" if cur is None else "rebuild",
                "shards_written": len(shards)}

    def _refresh_incremental(self, spark: SparkSession, imgs: DataFrame,
                             target: int) -> dict[str, Any]:
        imgs = imgs.persist()
        try:
            # every shard whose postings can change is named by a token in
            # the window — post-image tokens (additions) AND pre-image /
            # delete tokens (retractions of the old text). Bounded
            # driver-side list, at most n_shards values.
            window_posts = postings_of(imgs, self.n_shards)
            affected = sorted(
                r["shard"]
                for r in window_posts.select("shard").distinct().collect())
            changed_keys = (
                imgs.select(
                    "conv_id",
                    F.col("turn_idx").cast("long").alias("turn_idx"))
                .distinct())
            adds = postings_of(
                imgs.filter(F.col("_change_type")
                            .isin("insert", "update_postimage")),
                self.n_shards)
            if not affected:
                # keys changed but no side carried a token (null/empty
                # text throughout) — no posting can differ
                self._flip(target, self.shard_dirs())
                return {"refreshed": True, "cursor": target,
                        "mode": "incremental", "shards_affected": 0}
            # drop EVERY posting of a changed key within the affected
            # shards (its old tokens all live there, by construction),
            # then add the new rows' postings
            old = self.read(spark, shards=affected).withColumn(
                "shard", F.pmod(F.xxhash64("token"), F.lit(self.n_shards)))
            merged = (
                old.join(changed_keys, ["conv_id", "turn_idx"], "left_anti")
                .unionByName(adds)
            )
            written = self._write_shards(merged, affected)
            shards = self.shard_dirs()
            for s in affected:
                shards.pop(s, None)
            shards.update(written)
            self._flip(target, shards)
            return {"refreshed": True, "cursor": target,
                    "mode": "incremental",
                    "shards_affected": len(affected),
                    "shards_carried": self.n_shards - len(affected)}
        finally:
            imgs.unpersist()
