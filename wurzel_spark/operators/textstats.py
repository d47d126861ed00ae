"""Text-analysis operators over a document corpus: per-doc metrics,
language ID, quality scoring, token counting, fingerprinting.

Reference parity: per-doc metrics (wurzel/datacontract/common.py:149-157),
content hashes (wurzel/steps/qdrant/step.py:259-283), whitespace tokenizer
(wurzel/steps/embedding/step.py:35,172-175). The lang-ID / quality scoring
operators are the training-data-pipeline extensions the reference implies
(stopword lists, data/german_stopwords_full.txt) but only does single-node.

All operators are pure `pyspark.sql.functions` column algebra — no UDFs, so
they run inside whole-stage codegen and scale linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wurzel_spark.functions import text as TXT
from wurzel_spark.tables import table

# Whole-word markers per language for the n-gram-heuristic language ID.
# Deterministic, tiny, broadcast by constant-folding (they're literals).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "los", "y", "es"),
    "zh": ("de", "shi", "he", "zai"),
}

# Stopwords for the quality-score stopword ratio (reference ships a German
# stopword list, wurzel/steps/embedding/step.py:71-76; we use a small
# multilingual set as literals).
STOPWORDS = ("the", "a", "an", "and", "or", "of", "in", "is", "to", "der", "die", "le", "el")


def doc_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document metrics — the MarkdownDataContract metric projection
    (common.py:149-157) generalized: char/line/word counts + sha256.
    """
    c = F.col(text_col)
    return df.select(
        "doc_id",
        TXT.char_len(c).alias("char_len"),
        TXT.line_count(c).alias("n_lines"),
        TXT.word_count(c).alias("n_words"),
        TXT.sha256_hex(c).alias("text_sha256"),
    )


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish subword estimate
    (word-piece proxy: ceil(char_len_of_word / 4) per word, a public
    rule-of-thumb for byte-pair encodings).
    """
    c = F.col(text_col)
    ws = TXT.words(c)
    subword = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / F.lit(4.0)).cast("long"),
    )
    return df.select(
        "doc_id",
        F.size(ws).alias("n_tokens_ws"),
        subword.alias("n_tokens_bpe_est"),
        (F.length(c).cast("double") / F.size(ws)).alias("chars_per_token"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID by whole-word marker counts (n-gram heuristic).

    argmax over per-language marker hits with a deterministic tie-break
    (first language in LANG_MARKERS order wins — expressed as a CASE chain
    so the DuckDB oracle is literally the same expression).
    """
    c = F.col(text_col)
    scored = df.select(
        "doc_id",
        "lang",
        *[
            sum(TXT.marker_word_count(c, w) for w in ws).alias(f"score_{lang}")
            for lang, ws in LANG_MARKERS.items()
        ],
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("unknown"))
    for lang in langs:
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        pred.alias("predicted_lang"),
        best.cast("long").alias("best_score"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality metrics: length, punctuation ratio, stopword ratio, digit
    ratio, mean word length — per-row ratios are single divisions of exact
    integers, so cross-engine bit-exact.
    """
    c = F.col(text_col)
    n_words = TXT.word_count(c)
    n_chars = TXT.char_len(c)
    n_punct = n_chars - TXT.char_len(F.regexp_replace(c, r"[.,;:!?]", ""))
    n_digit = n_chars - TXT.char_len(F.regexp_replace(c, r"[0-9]", ""))
    stop_hits = sum(TXT.marker_word_count(c, w) for w in STOPWORDS)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars_computed"),
        n_words.alias("n_words"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_digit.cast("double") / n_chars).alias("digit_ratio"),
        (stop_hits.cast("double") / n_words).alias("stopword_ratio"),
        (n_chars.cast("double") / n_words).alias("chars_per_word"),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: exact sha256 + normalized fingerprint
    (casefold + whitespace collapse) — the cheap first pass of any dedup
    pipeline; at 100 TB this is a pure map stage feeding a hash-groupBy.
    """
    c = F.col(text_col)
    return df.select(
        "doc_id",
        TXT.sha256_hex(c).alias("exact_sha256"),
        TXT.fingerprint(c).alias("normalized_fingerprint"),
    )


# ---------------------------------------------------------------- queries

def q_doc_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_metrics(table(spark, sf_dir, "documents")).orderBy("doc_id")


DOC_METRICS_SQL = """
SELECT doc_id,
       length(text) AS char_len,
       len(string_split(text, chr(10))) AS n_lines,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'), w -> w != '')) AS n_words,
       sha256(text) AS text_sha256
FROM documents ORDER BY doc_id
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(table(spark, sf_dir, "documents")).orderBy("doc_id")


TOKEN_STATS_SQL = """
WITH w AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS ws
  FROM documents
)
SELECT doc_id,
       len(ws) AS n_tokens_ws,
       CAST(list_sum(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS n_tokens_bpe_est,
       CAST(length(text) AS DOUBLE) / len(ws) AS chars_per_token
FROM w ORDER BY doc_id
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_id(table(spark, sf_dir, "documents")).orderBy("doc_id")


def _dd_marker(word: str) -> str:
    pad = f"' ' || trim(regexp_replace(text, '\\s+', ' ', 'g')) || ' '"
    return (
        f"CAST((length({pad}) - length(replace({pad}, ' {word} ', ''))) / {len(word) + 2} AS BIGINT)"
    )


def _lang_id_sql() -> str:
    score_cols = ",\n       ".join(
        " + ".join(_dd_marker(w) for w in ws) + f" AS score_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    langs = list(LANG_MARKERS)
    greatest = "GREATEST(" + ", ".join(f"score_{lang}" for lang in langs) + ")"
    case = "CASE WHEN best = 0 THEN 'unknown' " + " ".join(
        f"WHEN score_{lang} = best THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH scored AS (
  SELECT doc_id, lang,
       {score_cols}
  FROM documents
), best AS (
  SELECT *, {greatest} AS best FROM scored
)
SELECT doc_id, lang AS labeled_lang, {case} AS predicted_lang,
       CAST(best AS BIGINT) AS best_score
FROM best ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(table(spark, sf_dir, "documents")).orderBy("doc_id")


def _quality_sql() -> str:
    stop_sum = " + ".join(_dd_marker(w) for w in STOPWORDS)
    return f"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) AS n_words,
         length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
         {stop_sum} AS stop_hits
  FROM documents
)
SELECT doc_id,
       n_chars AS n_chars_computed,
       n_words,
       CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
       CAST(n_digit AS DOUBLE) / n_chars AS digit_ratio,
       CAST(stop_hits AS DOUBLE) / n_words AS stopword_ratio,
       CAST(n_chars AS DOUBLE) / n_words AS chars_per_word
FROM base ORDER BY doc_id
"""


QUALITY_SQL = _quality_sql()


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(table(spark, sf_dir, "documents")).orderBy("doc_id")


FINGERPRINTS_SQL = """
SELECT doc_id,
       sha256(text) AS exact_sha256,
       sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS normalized_fingerprint
FROM documents ORDER BY doc_id
"""


def q_pipeline_filter_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end composed pipeline under the exact-match gate: quality
    filter → exact dedup (first doc per content hash) → per-source corpus
    stats. This is the canonical training-data-curation shape (score, gate,
    dedup, report) as ONE Catalyst plan: the filter prunes before the dedup
    shuffle, the dedup key is a 64-char hash (never the text), and the final
    stats are exact integer sums.
    """
    from pyspark.sql import Window as W

    docs = table(spark, sf_dir, "documents")
    c = F.col("text")
    n_words = TXT.word_count(c)
    n_chars = TXT.char_len(c)
    n_digit = n_chars - TXT.char_len(F.regexp_replace(c, r"[0-9]", ""))
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        n_words.alias("n_words"),
        n_chars.alias("n_chars"),
        (n_digit.cast("double") / n_chars).alias("digit_ratio"),
    )
    gated = scored.filter((F.col("n_words") >= 20) & (F.col("digit_ratio") <= 0.5))
    w = W.partitionBy(TXT.sha256_hex(c)).orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        deduped.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.sum("n_words")).alias("chars_per_word"),
        )
        .orderBy("source")
    )


PIPELINE_STATS_SQL = """
WITH scored AS (
  SELECT doc_id, source, text,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '')) AS n_words,
         length(text) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
           / length(text) AS digit_ratio
  FROM documents
), gated AS (
  SELECT * FROM scored WHERE n_words >= 20 AND digit_ratio <= 0.5
), deduped AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / SUM(n_words) AS chars_per_word
FROM deduped
GROUP BY source
ORDER BY source
"""


def stratified_sample(
    df: DataFrame,
    group_col: str,
    fraction: float,
    order_col: str,
) -> DataFrame:
    """Deterministic stratified sampling: exactly ceil(fraction × n_g) rows
    per group, chosen by a stable order. Unlike df.sample(), re-runs (and
    re-tries of failed tasks) pick identical rows — the property a
    training-data pipeline needs for reproducible corpus cuts. One window
    shuffle on the group key.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(group_col).orderBy(order_col)
    wc = W.partitionBy(group_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wc))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * F.lit(fraction)))
        .drop("__rn", "__n")
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% per-source deterministic sample of the documents corpus."""
    docs = table(spark, sf_dir, "documents")
    return (
        stratified_sample(docs, "source", 0.10, "doc_id")
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
) WHERE rn <= CEIL(n * 0.10)
ORDER BY doc_id
"""


def q_corpus_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract-metrics aggregation (SURVEY §2.7; reference
    datacontract.py:22-69 sums per-item metrics into corpus totals):
    corpus-level sums of the per-document metric columns, plus a
    consistency check that the stored n_chars column matches the text.
    """
    docs = table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.size(F.split("text", "\n", -1))).alias("total_lines"),
        F.sum((F.col("n_chars") != F.length("text")).cast("long")).alias(
            "n_chars_mismatches"
        ),
    )


CORPUS_METRICS_SQL = """
SELECT COUNT(*) AS total_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       CAST(SUM(LENGTH(text) - LENGTH(REPLACE(text, CHR(10), '')) + 1) AS BIGINT) AS total_lines,
       CAST(SUM(CASE WHEN n_chars != LENGTH(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_mismatches
FROM documents
"""
