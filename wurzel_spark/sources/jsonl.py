"""JSONL corpus source → MarkdownDataContract DataFrame.

The interchange format every large-scale text pipeline actually ships —
one JSON object per line — read into the same {md, keywords, url,
metadata} contract as the markdown-folder source (sources/markdown.py),
so everything downstream (splitter, dedup, embedding, sinks) is
source-agnostic. Extends the reference's folder-of-.md ingestion
(ManualMarkdownStep, SURVEY §2.1) with the bulk-corpus shape it never
needed single-tenant.

Scale notes:
  - the schema is DECLARED, never inferred — schema inference reads the
    whole input once before the real scan, a full extra pass at 100 TB;
  - malformed lines land in a ``_corrupt`` column (PERMISSIVE mode) and
    are counted, not crashed on — the skip-don't-fail contract of every
    source here; pass ``on_corrupt='fail'`` to make them fatal instead;
  - field aliasing covers the common wild variants (``text``/``content``
    for the body, ``id``/``source`` feeding the url fallback) so real
    dumps load without a pre-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

JSONL_SCHEMA = T.StructType(
    [
        T.StructField("md", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("content", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("_corrupt", T.StringType()),
    ]
)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    url_prefix: str = "jsonl://",
    on_corrupt: str = "skip",
) -> DataFrame:
    """Read JSONL documents into the MarkdownDataContract schema.

    Body = first non-null of ``md``/``text``/``content`` (rows with none
    are dropped — empty documents carry no contract). url = ``url`` field
    or ``url_prefix + id`` (or ``source``-qualified id). keywords =
    ``keywords`` field, else the first markdown heading, else the id.
    """
    raw = (
        spark.read.schema(JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    if on_corrupt == "fail":
        # Spark refuses to query ONLY the internal corrupt column of a
        # JSON scan — cache first (the documented contract for this mode;
        # fail-mode is a validation pass, so the extra materialization is
        # the point).
        raw = raw.cache()
        n_bad = raw.filter(F.col("_corrupt").isNotNull()).count()
        if n_bad:
            raise ValueError(f"{n_bad} corrupt JSONL lines in {path}")
    body = F.coalesce(F.col("md"), F.col("text"), F.col("content"))
    ident = F.coalesce(F.col("id"), F.col("source"))
    first_heading = F.regexp_extract(body, r"(?m)^#+ (.+)$", 1)
    return (
        raw.filter(F.col("_corrupt").isNull())
        .filter(body.isNotNull() & (F.length(F.trim(body)) > 0))
        .select(
            body.alias("md"),
            F.coalesce(
                F.col("keywords"),
                F.when(first_heading != "", first_heading),
                ident,
            ).alias("keywords"),
            F.coalesce(
                F.col("url"), F.concat(F.lit(url_prefix), F.coalesce(ident, F.lit("")))
            ).alias("url"),
            F.col("metadata"),
        )
    )
