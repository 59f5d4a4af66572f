"""Nested-type operators: array<struct> assembly/explosion, map lookup,
JSON round-trip — over the ``events`` table.

The reference's core record is nested — ``figure_set: list[struct]`` and
``context: map<image_id, list[paragraph]>`` assembled per article
(``src/pmc_oa/build_json.py:363-380``, ``:1045-1068``), searched by key
path (``:460-483``, the ``nested_dict_search`` helper = F7), and serialized
to JSON lines (``scripts/06_serilaize_to_webdataset_parallel.py:43-44`` =
F16; payload JSON decode ``build_json.py:327-329`` = S6). This module
re-expresses that whole family as native Spark nested-type expressions:

- assemble:   ``array_sort(collect_list(struct(...)))`` — a REAL
  ``ArrayType(StructType)`` column (not a string join), deterministic
  because the leading struct field (event_id) is unique;
- consume:    ``size`` / ``element_at`` / higher-order ``aggregate`` over
  the array — all JVM-side, no shuffle beyond the one groupBy;
- explode:    ``posexplode`` back to rows with struct-field access;
- search:     ``from_json -> map<string,string>`` + ``element_at`` hit and
  miss (F7), null on absent key, never an error;
- round-trip: ``from_json`` (S6 payload decode) -> typed struct ->
  ``to_json`` (F16) with Spark's compact serialization, string-equal to
  DuckDB's ``to_json(struct_pack(...))``.

Scale notes: per-user arrays are bounded by events-per-user (the reference's
figures-per-article); the single shuffle is the groupBy, with map-side
partial ``collect_list``. Float totals are summed as integer cents IN ARRAY
ORDER on both engines — double summation order would otherwise make the
value-hash flap at the last ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources import tbl


def _assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user array<struct<event_id,event_type,value>>, sorted by the
    unique leading field so the array order is deterministic."""
    e = tbl(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("event_id", "event_type", "value"))
        ).alias("turns")
    )


def nested_assemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-as-nested: build the array<struct>, then consume it with nested
    accessors (size / element_at / higher-order aggregate)."""
    g = _assembled(spark, sf_dir)
    total_cents = F.aggregate(
        "turns",
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.round(x["value"] * 100).cast("long"),
    )
    return g.select(
        "user_id",
        F.size("turns").alias("n_events"),
        F.element_at("turns", 1)["event_type"].alias("first_type"),
        F.element_at("turns", -1)["value"].alias("last_value"),
        total_cents.alias("total_cents"),
    ).orderBy("user_id")


NESTED_ASSEMBLE_SQL = """
WITH g AS (
  SELECT user_id,
         list(struct_pack(event_id := event_id, event_type := event_type,
                          value := value) ORDER BY event_id) AS turns
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(turns) AS INT) AS n_events,
       turns[1].event_type AS first_type,
       turns[len(turns)].value AS last_value,
       CAST(list_sum(list_transform(turns,
            x -> CAST(round(x.value * 100, 0) AS BIGINT))) AS BIGINT)
         AS total_cents
FROM g ORDER BY user_id
"""


def nested_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip the assembly: posexplode the array<struct> back to rows
    with positional index + struct-field access."""
    g = _assembled(spark, sf_dir)
    return (
        g.select("user_id", F.posexplode("turns").alias("pos", "t"))
        .select(
            "user_id",
            F.col("pos").cast("int").alias("pos"),
            F.col("t.event_id").alias("event_id"),
            F.col("t.event_type").alias("event_type"),
            F.col("t.value").alias("value"),
        )
        .orderBy("user_id", "pos")
    )


NESTED_EXPLODE_SQL = """
WITH g AS (
  SELECT user_id,
         list(struct_pack(event_id := event_id, event_type := event_type,
                          value := value) ORDER BY event_id) AS turns
  FROM events GROUP BY user_id
)
SELECT user_id, CAST(i - 1 AS INT) AS pos,
       turns[i].event_id AS event_id,
       turns[i].event_type AS event_type,
       turns[i].value AS value
FROM g, UNNEST(range(1, len(turns) + 1)) AS t(i)
ORDER BY user_id, pos
"""


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 + F16: decode the JSON payload column into a typed struct, then
    re-serialize a projected struct with ``to_json`` — the exact string is
    part of the oracle contract (Spark and DuckDB both emit compact JSON
    with field order preserved)."""
    e = tbl(spark, sf_dir, "events")
    parsed = e.select(
        "event_id",
        "event_type",
        F.from_json(
            "props", T.StructType([T.StructField("k", T.IntegerType())])
        ).alias("p"),
    )
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        F.to_json(
            F.struct(F.col("event_type"), F.col("p.k").alias("k"))
        ).alias("payload_json"),
    ).orderBy("event_id")


JSON_ROUNDTRIP_SQL = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       CAST(to_json(struct_pack(event_type := event_type,
                                k := CAST(json_extract(props, '$.k') AS INT)))
            AS VARCHAR) AS payload_json
FROM events ORDER BY event_id
"""


def nested_field_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 nested-dict search: parse the payload as ``map<string,string>``
    and look keys up with ``element_at`` — a present key yields its value,
    an absent key yields NULL (never an error), the safe-get discipline of
    the reference's ``nested_dict_search``."""
    e = tbl(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    return e.select(
        "event_id",
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.element_at(m, F.lit("missing")).alias("missing_val"),
    ).orderBy("event_id")


NESTED_FIELD_SEARCH_SQL = """
SELECT event_id,
       json_extract_string(props, '$.k') AS k_val,
       json_extract_string(props, '$.missing') AS missing_val
FROM events ORDER BY event_id
"""


def array_filter_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 empty-collection filter + F10 transform-over-typed-array: subset
    each user's turn array with a higher-order ``filter`` lambda (rare
    high-value error events), then DROP users whose filtered array is empty
    — the reference's skip-record-when-collection-empty gate
    (``scripts/06_serilaize_to_webdataset_parallel.py:190-197`` skips
    articles whose figure list came back empty)."""
    g = _assembled(spark, sf_dir)
    errs = F.filter(
        "turns",
        lambda x: (x["event_type"] == "error") & (x["value"] > 90),
    )
    withe = g.select("user_id", errs.alias("errs"))
    return (
        withe.filter(F.size("errs") > 0)
        .select(
            "user_id",
            F.size("errs").alias("n_big_errors"),
            F.element_at("errs", 1)["event_id"].alias("first_err_event"),
        )
        .orderBy("user_id")
    )


ARRAY_FILTER_GATE_SQL = """
WITH g AS (
  SELECT user_id,
         list_filter(
           list(struct_pack(event_id := event_id, event_type := event_type,
                            value := value) ORDER BY event_id),
           x -> x.event_type = 'error' AND x.value > 90) AS errs
  FROM events GROUP BY user_id
)
SELECT user_id,
       CAST(len(errs) AS INT) AS n_big_errors,
       errs[1].event_id AS first_err_event
FROM g WHERE len(errs) > 0
ORDER BY user_id
"""


# --- nXML caption extraction (F15/S6, the reference's largest code mass) -----
_FIG_XML_EXPR = """
transform(sequence(1, cast(1 + doc_id % 3 AS int)), k ->
  concat('<fig id="f', k, '"><caption><p>Figure ', k, ' : <italic>', w,
         '</italic> panel <xref rid="bib', k, '">[', k, ']</xref> end</p>',
         '</caption><graphic href="img_', doc_id, '_', k, '.jpg"/></fig>'))
"""
_FIG_SCHEMA = "body STRUCT<fig: ARRAY<STRUCT<_id: STRING, graphic: STRUCT<_href: STRING>>>>"


def xml_caption_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 closed with Spark 4 XML support: per-image caption extraction
    from an nXML-shaped payload — the reference's single largest stage
    (``src/pmc_oa/build_json.py:601-634`` caption XPath per figure,
    ``:768-791`` xref-preserving paragraph flatten).

    Each document synthesizes a deterministic ``<article><body>`` with
    1-3 ``<fig>`` elements (id + ``<graphic href>`` + a mixed-content
    caption containing ``<italic>`` and ``<xref>``), then the extraction
    recovers every field BY PARSING: ``from_xml`` pulls the typed fig
    array (ids and graphic hrefs from attributes), ``xpath_string``
    flattens each caption's mixed content to text with the xref display
    text preserved in place — exactly the reference's flatten semantics.
    The DuckDB oracle computes the expected output from the base columns
    without XML, so a hash match proves the synthesize->parse round trip.

    Scale: both ``from_xml`` and ``xpath_string`` are JVM expressions
    inside whole-stage codegen — per-row, no shuffle, no Python; at
    100 TB this is a map-only stage over the payload column."""
    d = tbl(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " ").getItem(0).alias("w")
    )
    base = d.select(
        "doc_id",
        F.concat(
            F.lit("<article><body>"),
            F.concat_ws("", F.expr(_FIG_XML_EXPR)),
            F.lit("</body></article>"),
        ).alias("xml"),
    )
    caps = F.array(*[
        F.expr(f"xpath_string(xml, '(//fig)[{i}]/caption/p')") for i in (1, 2, 3)
    ])
    parsed = base.select(
        "doc_id", F.from_xml("xml", _FIG_SCHEMA).alias("p"), caps.alias("caps")
    )
    return (
        parsed.select(
            "doc_id", "caps",
            F.posexplode(F.col("p.body.fig")).alias("pos", "fig"),
        )
        .select(
            "doc_id",
            F.col("fig._id").alias("fig_id"),
            F.col("fig.graphic._href").alias("image_href"),
            F.element_at("caps", F.col("pos") + 1).alias("caption"),
        )
        .orderBy("doc_id", "fig_id")
    )


XML_CAPTION_SQL = """
WITH d AS (
  SELECT doc_id, split_part(trim(text), ' ', 1) AS w, 1 + doc_id % 3 AS n_figs
  FROM documents
),
figs AS (
  SELECT doc_id, w, unnest(range(1, n_figs + 1)) AS k FROM d
)
SELECT doc_id,
       'f' || k AS fig_id,
       'img_' || doc_id || '_' || k || '.jpg' AS image_href,
       'Figure ' || k || ' : ' || w || ' panel [' || k || '] end' AS caption
FROM figs
ORDER BY doc_id, fig_id
"""


QUERIES: dict[str, tuple] = {
    "nested_assemble": (nested_assemble, NESTED_ASSEMBLE_SQL),
    "xml_caption_extract": (xml_caption_extract, XML_CAPTION_SQL),
    "nested_explode": (nested_explode, NESTED_EXPLODE_SQL),
    "json_roundtrip": (json_roundtrip, JSON_ROUNDTRIP_SQL),
    "nested_field_search": (nested_field_search, NESTED_FIELD_SEARCH_SQL),
    "array_filter_gate": (array_filter_gate, ARRAY_FILTER_GATE_SQL),
}
