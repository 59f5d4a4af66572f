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

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

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
    """Token counting over documents (training-data pipeline op): the
    whitespace count plus a BPE-ish pre-tokenizer count (word runs and
    individual punctuation marks, the GPT-style pre-split) — the cheap
    training-token estimator a corpus budget is planned with."""
    d = tbl(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"\w+|[^\w\s]"))
        .cast("bigint").alias("n_tokens_bpe"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    ).orderBy("doc_id")


TOKEN_COUNTS_SQL = r"""
SELECT doc_id,
       CAST(CASE WHEN trim(text) = '' THEN 0
                 ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT) AS n_tokens_bpe,
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


# ------------------------------------------- scalar pandas UDF (F14)
def normalize_text_udf():
    """F14: the reference's per-row xref/HTML-tag stripper re-expressed as a
    SCALAR pandas UDF (``src/pmc_oa/build_json.py:768-791`` removes
    ``<xref>`` reference tags from captions one string at a time; here each
    invocation normalizes an Arrow batch of ~10k strings with vectorized
    pandas str ops — the §2.9 rule: Python only via Arrow batches, never
    row-at-a-time). Semantics are regex-definable on purpose so DuckDB can
    oracle the exact output: strip tags, collapse whitespace, trim.

    Built lazily (decorating at import time requires an active session for
    return-type resolution)."""

    @pandas_udf("string")
    def normalize(raw: pd.Series) -> pd.Series:
        s = raw.str.replace(r"<[^>]*>", " ", regex=True)
        s = s.str.replace(r"\s+", " ", regex=True)
        return s.str.strip()

    return normalize


def pandas_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each doc's text in deterministic xref-style markup, then strip
    it back out through the scalar pandas UDF."""
    d = tbl(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit('<xref rid="b'), F.col("doc_id").cast("string"), F.lit('">'),
        F.col("source"), F.lit("</xref>  "), F.col("text"),
    )
    return d.select(
        "doc_id", normalize_text_udf()(raw).alias("clean_text")
    ).orderBy("doc_id")


PANDAS_NORMALIZE_SQL = r"""
SELECT doc_id,
       trim(regexp_replace(regexp_replace(
            '<xref rid="b' || CAST(doc_id AS VARCHAR) || '">' || source
              || '</xref>  ' || text,
            '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')) AS clean_text
FROM documents ORDER BY doc_id
"""


# ------------------------------------------- citation date parse (F3/F4)
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_SEASON_MONTH = {"Winter": 1, "Spring": 4, "Summer": 7, "Fall": 10}


def citation_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/F4: the reference's messy citation-date parse
    (``src/pmc_oa/build_json.py:988-1042``): a pub-date string that may be
    'YYYY Mon D', 'YYYY Mon', bare 'YYYY', or 'YYYY <Season>' is parsed
    with regex + a season->month when-chain + defaulted components
    (month -> 1, day -> 1). The messy strings are BUILT deterministically
    from orders (four variants by key mod 4) so both engines parse
    identical inputs; everything stays in WholeStageCodegen."""
    o = tbl(spark, sf_dir, "orders")
    mon_name = F.element_at(
        F.array(*[F.lit(m) for m in _MONTHS]), F.month("o_orderdate")
    )
    season = (
        F.when(F.month("o_orderdate").isin(12, 1, 2), "Winter")
        .when(F.month("o_orderdate").isin(3, 4, 5), "Spring")
        .when(F.month("o_orderdate").isin(6, 7, 8), "Summer")
        .otherwise("Fall")
    )
    year_s = F.year("o_orderdate").cast("string")
    variant = F.pmod(F.col("o_orderkey"), F.lit(4))
    citation = (
        F.when(variant == 0, F.concat_ws(" ", year_s, mon_name,
                                         F.dayofmonth("o_orderdate").cast("string")))
        .when(variant == 1, F.concat_ws(" ", year_s, mon_name))
        .when(variant == 2, year_s)
        .otherwise(F.concat_ws(" ", year_s, season))
    )
    c = o.select("o_orderkey", citation.alias("citation"))

    year = F.regexp_extract("citation", r"(\d{4})", 1).cast("int")
    mon_extract = F.regexp_extract(
        "citation", r"\b(" + "|".join(_MONTHS) + r")\b", 1)
    season_extract = F.regexp_extract(
        "citation", r"\b(Winter|Spring|Summer|Fall)\b", 1)
    mon_from_name = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), mon_extract).cast("int")
    season_chain = None
    for name, m in _SEASON_MONTH.items():
        clause = F.when(season_extract == name, F.lit(m))
        season_chain = clause if season_chain is None else season_chain.when(
            season_extract == name, F.lit(m))
    day = F.regexp_extract("citation", r" (\d{1,2})$", 1)
    return c.select(
        "o_orderkey",
        "citation",
        year.alias("cite_year"),
        F.coalesce(
            F.when(mon_from_name > 0, mon_from_name),
            season_chain,
            F.lit(1),
        ).cast("int").alias("cite_month"),
        F.coalesce(
            F.when(day != "", day.cast("int")), F.lit(1)
        ).cast("int").alias("cite_day"),
    ).orderBy("o_orderkey")


_MON_CASE = " ".join(
    f"WHEN '{m}' THEN {i + 1}" for i, m in enumerate(_MONTHS)
)
_SEASON_CASE = " ".join(
    f"WHEN '{s}' THEN {m}" for s, m in _SEASON_MONTH.items()
)
CITATION_DATE_SQL = rf"""
WITH c AS (
  SELECT o_orderkey,
         CASE CAST(o_orderkey % 4 AS INT)
           WHEN 0 THEN CAST(year(o_orderdate) AS VARCHAR) || ' ' ||
                       strftime(o_orderdate, '%b') || ' ' ||
                       CAST(day(o_orderdate) AS VARCHAR)
           WHEN 1 THEN CAST(year(o_orderdate) AS VARCHAR) || ' ' ||
                       strftime(o_orderdate, '%b')
           WHEN 2 THEN CAST(year(o_orderdate) AS VARCHAR)
           ELSE CAST(year(o_orderdate) AS VARCHAR) || ' ' ||
                CASE WHEN month(o_orderdate) IN (12, 1, 2) THEN 'Winter'
                     WHEN month(o_orderdate) IN (3, 4, 5) THEN 'Spring'
                     WHEN month(o_orderdate) IN (6, 7, 8) THEN 'Summer'
                     ELSE 'Fall' END
         END AS citation
  FROM orders
)
SELECT o_orderkey, citation,
       CAST(regexp_extract(citation, '(\d{{4}})', 1) AS INT) AS cite_year,
       CAST(coalesce(
         nullif(CASE regexp_extract(citation,
                  '\b({"|".join(_MONTHS)})\b', 1) {_MON_CASE} ELSE 0 END, 0),
         nullif(CASE regexp_extract(citation,
                  '\b(Winter|Spring|Summer|Fall)\b', 1) {_SEASON_CASE}
                ELSE 0 END, 0),
         1) AS INT) AS cite_month,
       CAST(coalesce(
         nullif(regexp_extract(citation, ' (\d{{1,2}})$', 1), '')::INT,
         1) AS INT) AS cite_day
FROM c ORDER BY o_orderkey
"""


# ------------------------------------------- token filter from split (F12)
def token_filter_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: split -> per-token predicate filter -> recombine (the
    reference's keep-only-informative-tokens pass over split strings,
    ``src/pmc_oa/build_json.py:848-862`` filters split journal tokens).
    Higher-order ``filter`` keeps the lambda JVM-side."""
    d = tbl(spark, sf_dir, "documents")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    longw = F.filter(ws, lambda w: F.length(w) >= 5)
    return d.select(
        "doc_id",
        F.size(longw).cast("int").alias("n_long_tokens"),
        F.array_join(F.slice(longw, 1, 3), " ").alias("long_preview"),
    ).orderBy("doc_id")


TOKEN_FILTER_SPLIT_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     w -> length(w) >= 5) AS longw
  FROM documents
)
SELECT doc_id,
       CAST(len(longw) AS INT) AS n_long_tokens,
       array_to_string(longw[1:3], ' ') AS long_preview
FROM t ORDER BY doc_id
"""


# ------------------------------------------- key decomposition (F13)
def key_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: decompose a composite '-'-joined record key into its parts and
    re-join a slice (the reference splits tar member keys into batch /
    pmid / position / soft_id and re-joins the tail,
    ``scripts/06_serilaize_to_webdataset_parallel.py:133-137``). The key is
    BUILT deterministically here so both engines decompose identical
    strings; split / element_at / slice / array_join all stay JVM-side."""
    d = tbl(spark, sf_dir, "documents")
    key = F.concat_ws(
        "-", F.col("source"), F.col("doc_id").cast("string"),
        F.col("lang"), F.concat(F.lit("p"), F.col("n_chars").cast("string")),
    )
    parts = F.split(key, "-")
    return d.select(
        "doc_id",
        key.alias("key"),
        F.element_at(parts, 1).alias("batch_part"),
        F.element_at(parts, 2).cast("bigint").alias("id_part"),
        F.array_join(F.slice(parts, 3, 2), "-").alias("soft_id"),
        F.size(parts).cast("int").alias("n_parts"),
    ).orderBy("doc_id")


KEY_DECOMPOSE_SQL = """
WITH k AS (
  SELECT doc_id,
         source || '-' || CAST(doc_id AS VARCHAR) || '-' || lang
           || '-p' || CAST(n_chars AS VARCHAR) AS key
  FROM documents
),
p AS (SELECT doc_id, key, string_split(key, '-') AS parts FROM k)
SELECT doc_id, key,
       parts[1] AS batch_part,
       CAST(parts[2] AS BIGINT) AS id_part,
       array_to_string(parts[3:4], '-') AS soft_id,
       CAST(len(parts) AS INT) AS n_parts
FROM p ORDER BY doc_id
"""


def repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document — the standard
    LLM-corpus filters for boilerplate/spam (duplicate-heavy docs): distinct
    word fraction, duplicate 3-gram fraction, and the most-frequent word's
    share of all words. All JVM-side array expressions over ONE tokenize
    (the top-word count is per-row O(distinct x words) — bounded by doc
    length, not corpus size, so it stays embarrassingly parallel at 100 TB).
    Thresholded to a pass flag the way quality_scores gates P8."""
    d = tbl(spark, sf_dir, "documents")
    ws = F.expr(r"split(trim(lower(text)), '\\s+')")
    base = d.select("doc_id", F.explode(F.array(ws)).alias("ws"))
    grams = F.expr(
        "CASE WHEN size(ws) >= 3 THEN transform(sequence(1, size(ws) - 2), "
        "i -> concat_ws(' ', slice(ws, i, 3))) ELSE array() END")
    scored = base.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.round(F.size(F.array_distinct("ws"))
                / F.greatest(F.size("ws"), F.lit(1)), 6)
        .alias("distinct_word_frac"),
        F.round(
            F.lit(1.0)
            - F.size(F.array_distinct(grams))
            / F.greatest(F.size(grams), F.lit(1)), 6)
        .alias("dup_3gram_frac"),
        F.round(
            F.expr("array_max(transform(array_distinct(ws), "
                   "w -> size(filter(ws, x -> x = w))))")
            / F.greatest(F.size("ws"), F.lit(1)), 6)
        .alias("top_word_frac"),
    )
    return scored.withColumn(
        "passes_repetition_gate",
        (F.col("dup_3gram_frac") <= 0.2) & (F.col("top_word_frac") <= 0.2),
    ).orderBy("doc_id")


REPETITION_SQL = r"""
WITH w AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS ws
  FROM documents
),
g AS (
  SELECT doc_id, ws,
         CASE WHEN len(ws) >= 3
              THEN list_transform(range(1, len(ws) - 1),
                                  i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS grams
  FROM w
),
s AS (
  SELECT doc_id,
         len(ws) AS n_words,
         round(len(list_distinct(ws)) / greatest(len(ws), 1), 6)
           AS distinct_word_frac,
         round(1.0 - len(list_distinct(grams)) / greatest(len(grams), 1), 6)
           AS dup_3gram_frac,
         round(list_max(list_transform(list_distinct(ws),
                 w -> len(list_filter(ws, x -> x = w))))
               / greatest(len(ws), 1), 6) AS top_word_frac
  FROM g
)
SELECT doc_id, n_words, distinct_word_frac, dup_3gram_frac, top_word_frac,
       dup_3gram_frac <= 0.2 AND top_word_frac <= 0.2
         AS passes_repetition_gate
FROM s ORDER BY doc_id
"""


def redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the redaction pass every published training corpus
    runs: emails and phone-shaped numbers replaced with typed placeholder
    tokens, with per-doc redaction counts for the lineage report. Pure
    JVM ``regexp_replace``/``regexp_count`` (WholeStageCodegen; at 100 TB
    this is a free rider on any other full-text pass). The synthetic
    corpus carries no PII, so — same move as dedup_exact's shifted-id
    copies — every 10th doc gets a deterministic contact line appended in
    BOTH engines and the operator provably strips it."""
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\b\d{3}-\d{3}-\d{4}\b"
    d = tbl(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.col("text"),
                     F.lit(" contact user"), F.col("doc_id"),
                     F.lit("@mail.example or call 555-867-5309.")),
        ).otherwise(F.col("text")).alias("text"),
    )
    n_emails = F.regexp_count(F.col("text"), F.lit(email_re)).cast("int")
    n_phones = F.regexp_count(F.col("text"), F.lit(phone_re)).cast("int")
    redacted = F.regexp_replace(
        F.regexp_replace("text", email_re, "<EMAIL>"),
        phone_re, "<PHONE>")
    return (
        seeded.select(
            "doc_id", n_emails.alias("n_emails"), n_phones.alias("n_phones"),
            redacted.alias("redacted_text"))
        .filter((F.col("n_emails") > 0) | (F.col("n_phones") > 0))
        .orderBy("doc_id")
    )


REDACT_PII_SQL = r"""
WITH seeded AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN text || ' contact user' || doc_id
                   || '@mail.example or call 555-867-5309.'
              ELSE text END AS text
  FROM documents
),
r AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
           AS n_emails,
         CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INT)
           AS n_phones,
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g') AS redacted_text
  FROM seeded
)
SELECT doc_id, n_emails, n_phones, redacted_text
FROM r WHERE n_emails > 0 OR n_phones > 0 ORDER BY doc_id
"""


QUERIES: dict[str, tuple] = {
    "scalar_extracts": (scalar_extracts, SCALAR_EXTRACTS_SQL),
    "date_parts": (date_parts, DATE_PARTS_SQL),
    "token_counts": (token_counts, TOKEN_COUNTS_SQL),
    "quality_scores": (quality_scores, QUALITY_SQL),
    "lang_id_heuristic": (lang_id_heuristic, LANG_ID_SQL),
    "fingerprints": (fingerprints, FINGERPRINTS_SQL),
    "pandas_normalize_text": (pandas_normalize_text, PANDAS_NORMALIZE_SQL),
    "citation_date_parse": (citation_date_parse, CITATION_DATE_SQL),
    "token_filter_split": (token_filter_split, TOKEN_FILTER_SPLIT_SQL),
    "key_decompose": (key_decompose, KEY_DECOMPOSE_SQL),
    "repetition_scores": (repetition_scores, REPETITION_SQL),
    "redact_pii": (redact_pii, REDACT_PII_SQL),
}
