"""Round-9 operator tests: stratified priority sampling, unicode
normalization battery, token-budget water-filling, IBAN validation,
bitext margin mining."""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )


def _duck_docs(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR,"
        " lang VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    return con


# --------------------------------------- stratified priority sampling


def test_stratified_sample_is_per_source_global_sample(spark):
    """Each source's stratified sample must equal the GLOBAL priority
    sampler run on that source alone — priorities are row-local, so
    stratification is exactly per-group restriction."""
    from wurzel_spark.operators.selection import (
        priority_sample,
        priority_sample_stratified,
    )

    rows = [(i, "t", f"s{i % 3}", "en", 50 + 13 * i) for i in range(60)]
    docs = _docs(spark, rows)
    strat = priority_sample_stratified(docs, k=4)
    for src in ("s0", "s1", "s2"):
        mine = [
            (r["doc_id"], r["weight"], r["priority_q"], r["est_weight_q3"])
            for r in strat.filter(F.col("source") == src).collect()
        ]
        solo = [
            (r["doc_id"], r["weight"], r["priority_q"], r["est_weight_q3"])
            for r in priority_sample(
                docs.filter(F.col("source") == src), k=4
            ).collect()
        ]
        assert mine == solo, src


def test_stratified_sample_census_degradation(spark):
    """A source with <= k docs keeps everything with tau=0: HT term
    equals the exact weight (est = w*1000)."""
    from wurzel_spark.operators.selection import priority_sample_stratified

    rows = [(i, "t", "tiny", "en", 100 + i) for i in range(3)]
    rows += [(100 + i, "t", "big", "en", 10 + i) for i in range(30)]
    out = priority_sample_stratified(_docs(spark, rows), k=8).collect()
    tiny = [r for r in out if r["source"] == "tiny"]
    assert len(tiny) == 3
    for r in tiny:
        assert r["est_weight_q3"] == float(r["weight"] * 1000)
    assert len([r for r in out if r["source"] == "big"]) == 8


def test_stratified_sample_partitioning_independent(spark):
    from wurzel_spark.operators.selection import priority_sample_stratified

    rows = [(i, "t", f"s{i % 4}", "en", 17 * i + 3) for i in range(80)]
    docs = _docs(spark, rows)
    a = [tuple(r) for r in priority_sample_stratified(docs).collect()]
    b = [tuple(r) for r in priority_sample_stratified(docs.repartition(13)).collect()]
    assert a == b


def test_stratified_sample_plan_has_window_group_limit(spark):
    """The rn<=k+1 filter must reach the scan side as a PARTIAL
    WindowGroupLimit (per-partition per-group top-(k+1) prune before the
    exchange) — the property that bounds the shuffle at
    (k+1)*sources*partitions instead of the corpus."""
    from wurzel_spark.operators.selection import priority_sample_stratified

    rows = [(i, "t", f"s{i % 3}", "en", 11 * i) for i in range(30)]
    plan = priority_sample_stratified(_docs(spark, rows))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


# ------------------------------------------------ unicode normalization


_DIRTY_ROWS = [
    (1, "plain ascii text", "a", "en", 16),
    (2, "zero​width‌ joined‍ here﻿ soft­hyphen", "a", "en", 40),
    (3, "ctrl\x00chars\x01here\x1f and\x7f del", "a", "en", 25),
    (4, "nbsp space vt\x0bff\x0c ideographic　space", "b", "en", 35),
    (5, "ｆｕｌｌｗｉｄｔｈ　ＡＳＣＩＩ：１２３！", "b", "zh", 20),
    (6, None, "b", "en", 0),
]


def test_unicode_clean_docs_fixture_matches_oracle(spark):
    from wurzel_spark.operators.textstats import unicode_clean_docs

    got = [tuple(r) for r in unicode_clean_docs(_docs(spark, _DIRTY_ROWS)).collect()]
    con = _duck_docs(_DIRTY_ROWS)
    exp = [tuple(r) for r in con.execute(e.oracle_sql()["unicode_clean_docs"]).fetchall()]
    assert got == exp


def test_unicode_clean_docs_semantics(spark):
    from wurzel_spark.operators.textstats import unicode_clean_docs

    out = {r["doc_id"]: r for r in unicode_clean_docs(_docs(spark, _DIRTY_ROWS)).collect()}
    assert out[1]["clean_text"] == "plain ascii text"
    assert out[1]["n_removed"] == 0 and out[1]["n_mapped"] == 0
    # zero-width chars removed, words fuse
    assert out[2]["clean_text"] == "zerowidth joined here softhyphen"
    assert out[2]["n_removed"] == 5
    # controls removed
    assert out[3]["clean_text"] == "ctrlcharshere and del"
    # exotic spaces become ASCII space
    assert out[4]["clean_text"] == "nbsp space vt ff  ideographic space"
    assert out[4]["n_mapped"] == 4
    # fullwidth folds to ASCII
    assert out[5]["clean_text"] == "fullwidth ASCII:123!"
    # NULL text -> empty clean
    assert out[6]["clean_text"] == "" and out[6]["n_chars_clean"] == 0


def test_unicode_clean_is_idempotent(spark):
    from wurzel_spark.operators.textstats import unicode_clean_docs

    once = unicode_clean_docs(_docs(spark, _DIRTY_ROWS)).select(
        "doc_id",
        F.col("clean_text").alias("text"),
        F.lit("a").alias("source"),
        F.lit("en").alias("lang"),
        F.lit(0).cast("long").alias("n_chars"),
    ).select("doc_id", "text", "source", "lang", "n_chars")
    twice = {r["doc_id"]: r for r in unicode_clean_docs(once).collect()}
    for doc_id, r in twice.items():
        assert r["n_removed"] == 0 and r["n_mapped"] == 0, doc_id


def test_unicode_clean_stats_fixture_matches_oracle(spark):
    from wurzel_spark.operators.textstats import unicode_clean_stats

    got = [tuple(r) for r in unicode_clean_stats(_docs(spark, _DIRTY_ROWS)).collect()]
    con = _duck_docs(_DIRTY_ROWS)
    exp = [tuple(r) for r in con.execute(e.oracle_sql()["unicode_clean_stats"]).fetchall()]
    assert got == exp
    by_src = {t[0]: t for t in got}
    assert by_src["a"][2] == 2  # docs 2 and 3 affected
    assert by_src["b"][2] == 2  # docs 4 and 5 affected


# ----------------------------------- streaming stratified priority twin


def test_streaming_stratified_priority_matches_batch(spark, tmp_path):
    """Per-batch per-SOURCE top-(k+1) staging == the batch stratified
    sample bit-exactly (the semilattice argument holds group-wise)."""
    from wurzel_spark.operators.selection import priority_sample_stratified
    from wurzel_spark.streaming.priority import priority_stratified_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "ps_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = [
        tuple(r)
        for r in priority_stratified_stream(
            stream, str(tmp_path / "ps_state"), str(tmp_path / "ps_ckpt"),
            compact_every=2,
        ).collect()
    ]
    exp = [tuple(r) for r in priority_sample_stratified(docs).collect()]
    assert got == exp and len(got) > 0


def test_streaming_stratified_replay_is_idempotent(spark, tmp_path):
    from pyspark.sql import Window as W

    from wurzel_spark.operators.selection import priority_scores
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.priority import drain_priority_stratified_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "ps_replay")
    wg = W.partitionBy("source").orderBy(F.col("q").desc(), "doc_id")

    def _stage(df, bid):
        mine = (
            priority_scores(df)
            .withColumn("rn", F.row_number().over(wg))
            .filter(F.col("rn") <= 9)
            .drop("rn")
            .withColumn("src_batch", F.lit(bid))
        )
        write_batch_state(spark, mine, state, bid, ["src_batch", "doc_id"], None)

    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)
    once = [tuple(r) for r in drain_priority_stratified_state(spark, state).collect()]
    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)  # replay
    got = [tuple(r) for r in drain_priority_stratified_state(spark, state).collect()]
    assert got == once and len(once) > 0
