"""Text scalar functions + text-analysis queries over ``documents``.

Re-expressions of the reference's per-row Python string functions
(SURVEY.md §2.7: F1 extract_id, F2 extract_journal, F3/F5 date parsing)
as native JVM-side column expressions — zero Python in the hot path —
plus the training-data-pipeline text ops (language-ID heuristic, quality
scoring, token counting, fingerprinting). Everything stays inside
WholeStageCodegen; the only shuffle in this module is a final orderBy
for deterministic comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import tbl

# ---------------------------------------------------------------- helpers
STOPWORDS_EN = ["the", "a", "of", "and"]


def extract_id_col(path: Column) -> Column:
    """F1 extract_id (reference src/pmc_oa/download.py:199-209):
    filename stem = last path segment before the first dot."""
    return F.regexp_extract(path, r"([^/]+?)(?:\.[^/.]*)?$", 1)


def token_count_col(text: Column) -> Column:
    """Whitespace token count; empty string counts 0."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+"))).cast("bigint")


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text
    (reference hash_image sha-256 dedup key, src/pmc_oa/build_json.py:936-985,
    applied to text payloads)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


# ---------------------------------------------------------------- queries
def scalar_extracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2-style regex extraction: numeric id from the source tag and
    the first word of the text (extract_journal shape,
    src/pmc_oa/build_json.py:848-862)."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("source"), r"(\d+)", 1).cast("int").alias("source_num"),
        F.regexp_extract(F.col("text"), r"^([a-z]+)", 1).alias("first_word"),
        extract_id_col(F.concat(F.lit("/data/"), F.col("source"), F.lit(".csv"))).alias("stem"),
    ).orderBy("doc_id")


SCALAR_EXTRACTS_SQL = r"""
SELECT doc_id,
       CAST(regexp_extract(source, '(\d+)', 1) AS INTEGER) AS source_num,
       regexp_extract(text, '^([a-z]+)', 1) AS first_word,
       regexp_extract('/data/' || source || '.csv', '([^/]+?)(?:\.[^/.]*)?$', 1) AS stem
FROM documents ORDER BY doc_id
"""


def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F5 ensure_unix analogue (src/pmc_oa/build_json.py:486-506):
    typed date decomposition + unix seconds."""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("order_unix"),
    ).orderBy("o_orderkey")


DATE_PARTS_SQL = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       CAST(month(o_orderdate) AS INTEGER) AS order_month,
       CAST(epoch(o_orderdate) AS BIGINT) AS order_unix
FROM orders ORDER BY o_orderkey
"""


def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting over documents (training-data pipeline op)."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars_actual
FROM documents ORDER BY doc_id
"""


def quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length, mean word length, stopword ratio —
    the P8 quality-gate shape (scripts/06_serilaize_to_webdataset_parallel.py:204)
    generalized to text-corpus curation. Per-row double arithmetic is
    IEEE-deterministic, so no decimal dance needed."""
    d = tbl(spark, sf_dir, "documents")
    n_tokens = token_count_col(F.col("text"))
    stop_re = "\\b(" + "|".join(STOPWORDS_EN) + ")\\b"
    n_stop = F.regexp_count(F.lower(F.col("text")), F.lit(stop_re)).cast("bigint")
    out = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(F.length(F.regexp_replace("text", r"\s+", "")) /
                F.greatest(n_tokens, F.lit(1)), 6).alias("mean_word_len"),
    )
    return out.withColumn(
        "passes_gate",
        (F.col("n_tokens") >= 5) & (F.col("mean_word_len") < 12.0),
    ).orderBy("doc_id")


QUALITY_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
                   ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and)\b')) AS BIGINT) AS n_stopwords,
         length(regexp_replace(text, '\s+', '', 'g')) AS n_nonspace
  FROM documents
)
SELECT doc_id, n_tokens, n_stopwords,
       round(n_stopwords / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(n_nonspace / greatest(n_tokens, 1), 6) AS mean_word_len,
       (n_tokens >= 5 AND round(n_nonspace / greatest(n_tokens, 1), 6) < 12.0) AS passes_gate
FROM t ORDER BY doc_id
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram/stopword language-ID heuristic: score a handful of marker
    words per language, argmax with a fixed tie-break order. (The testdata
    text is synthetic, so this checks the *operator*, not linguistics.)"""
    d = tbl(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    en = F.regexp_count(low, F.lit(r"\b(the|and|of)\b")).cast("bigint")
    es = F.regexp_count(low, F.lit(r"\b(el|la|de|y)\b")).cast("bigint")
    de = F.regexp_count(low, F.lit(r"\b(der|die|und)\b")).cast("bigint")
    pred = (
        F.when((en >= es) & (en >= de), "en")
        .when(es >= de, "es")
        .otherwise("de")
    )
    return d.select(
        "doc_id", en.alias("score_en"), es.alias("score_es"), de.alias("score_de"),
        pred.alias("predicted_lang"),
    ).orderBy("doc_id")


LANG_ID_SQL = r"""
WITH s AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '\b(the|and|of)\b')) AS BIGINT) AS score_en,
         CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|y)\b')) AS BIGINT) AS score_es,
         CAST(len(regexp_extract_all(lower(text), '\b(der|die|und)\b')) AS BIGINT) AS score_de
  FROM documents
)
SELECT doc_id, score_en, score_es, score_de,
       CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
            WHEN score_es >= score_de THEN 'es'
            ELSE 'de' END AS predicted_lang
FROM s ORDER BY doc_id
"""


def fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting for dedup/replay-equality checks."""
    d = tbl(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_col(F.col("text")).alias("fingerprint")).orderBy("doc_id")


FINGERPRINTS_SQL = r"""
SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fingerprint
FROM documents ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "scalar_extracts": (scalar_extracts, SCALAR_EXTRACTS_SQL),
    "date_parts": (date_parts, DATE_PARTS_SQL),
    "token_counts": (token_counts, TOKEN_COUNTS_SQL),
    "quality_scores": (quality_scores, QUALITY_SQL),
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "fingerprints": (fingerprints, FINGERPRINTS_SQL),
}
