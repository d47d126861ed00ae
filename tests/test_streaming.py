"""Structured Streaming twins: availableNow over static events must match
the batch queries."""

import pytest
from pyspark.sql import functions as F

from wurzel_spark.queries.events import events_hourly_stats, sessionize
from wurzel_spark.streaming.events import hourly_window_agg, read_event_stream, run_available_now
from wurzel_spark.streaming.sessions import sessionize_stream
from wurzel_spark.tables import table


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Events re-written with micro timestamps (streams can't apply the
    nanosAsLong shim) and split into several files to exercise multiple
    micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streaming_hourly_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    assert stream.isStreaming
    agg = hourly_window_agg(stream)
    run_available_now(agg, str(tmp_path / "ckpt"), query_name="t_hourly")
    got = {
        r["hour"]: (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM t_hourly").collect()
    }
    expected = {
        r["hour"]: (r["n_events"], r["sum_value"])
        for r in events_hourly_stats(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for h in expected:
        assert got[h][0] == expected[h][0]
        assert abs(got[h][1] - expected[h][1]) < 1e-6


def test_stateful_sessionize_matches_batch(spark, sf_dir, events_dir, tmp_path):
    stream = read_event_stream(spark, events_dir)
    out = sessionize_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    expected = {
        (r["user_id"], r["event_id"]): r["session_seq"]
        for r in sessionize(spark, sf_dir).collect()
    }
    assert len(got) == len(expected)
    # micro-batch boundaries may reorder users' events ACROSS batches, but
    # within-order arrival (files are time-ordered per partition) keeps
    # session numbering consistent for the overwhelming majority; require
    # exact agreement
    assert got == expected


def test_json_props_stream_matches_batch(spark, sf_dir, tmp_path):
    """AvailableNow streaming of the JSON-props aggregation reproduces the
    batch numbers exactly (summed back over windows)."""
    from pyspark.sql import functions as F

    from wurzel_spark.queries.events import events_json_props
    from wurzel_spark.streaming.events import (
        json_props_agg,
        read_event_stream,
        run_available_now,
    )
    from wurzel_spark.tables import table

    src = str(tmp_path / "events_src")
    table(spark, sf_dir, "events").write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    agg = json_props_agg(stream)
    run_available_now(agg, str(tmp_path / "ckpt"), query_name="json_props_stream")

    streamed = (
        spark.table("json_props_stream")
        .groupBy("event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_k").alias("sum_k"),
            F.min("min_k").alias("min_k"),
            F.max("max_k").alias("max_k"),
        )
        .orderBy("event_type")
        .collect()
    )
    batch = events_json_props(spark, sf_dir).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    """Streaming exact dedup keeps exactly one row per content hash — the
    same distinct-hash set as the batch DropDuplicationStep twin."""
    from pyspark.sql import functions as F

    from wurzel_spark.streaming.dedup import dedup_stream, with_content_hash

    src = str(tmp_path / "docs_src")
    docs = table(spark, sf_dir, "documents")
    # inject exact duplicates (2 copies of every doc) across several files
    docs.unionByName(docs).repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = dedup_stream(with_content_hash(stream), ["content_hash"])
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_docs")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.table("t_dedup_docs")
    expected_hashes = {
        r[0]
        for r in with_content_hash(docs).select("content_hash").distinct().collect()
    }
    assert got.count() == len(expected_hashes)
    assert {r["content_hash"] for r in got.collect()} == expected_hashes


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """At-least-once replay: the same events delivered twice within the
    watermark window come out exactly once."""
    from wurzel_spark.streaming.dedup import dedup_stream_within_watermark
    from wurzel_spark.streaming.events import read_event_stream

    src = str(tmp_path / "events_dup")
    ev = table(spark, sf_dir, "events")
    ev.unionByName(ev).repartition(4).write.mode("overwrite").parquet(src)

    stream = read_event_stream(spark, src)
    out = dedup_stream_within_watermark(stream, ["event_id"], ts_col="ts", delay="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_events")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    n_distinct = ev.select("event_id").distinct().count()
    assert spark.table("t_dedup_events").count() == n_distinct


def test_stateful_funnel_matches_batch(spark, sf_dir, events_dir, tmp_path):
    from wurzel_spark.streaming.funnel import funnel_stream
    from wurzel_spark.queries.events import events_funnel

    stream = read_event_stream(spark, events_dir)
    out = funnel_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_funnel")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT * FROM t_funnel"
    ).collect()
    # latest row per user (availableNow may emit once per micro-batch)
    latest = {r["user_id"]: r for r in rows}
    n_users = len(latest)
    n_viewed = sum(1 for r in latest.values() if r["first_view_us"] is not None)
    n_purchased = sum(1 for r in latest.values() if r["first_purchase_us"] is not None)
    n_converted = sum(1 for r in latest.values() if r["converted"])
    b = events_funnel(spark, sf_dir).collect()[0]
    assert (n_users, n_viewed, n_purchased, n_converted) == (
        b["n_users"], b["n_viewed"], b["n_purchased"], b["n_converted"]
    )


def test_streaming_curation_into_versioned_sink(spark, sf_dir, tmp_path):
    """readStream docs → Gopher+PII filter + dedup → versioned sink via
    foreachBatch; the published collection must equal the batch pipeline's
    result on the same data."""
    import json
    import os

    from pyspark.sql import functions as F

    from wurzel_spark.operators.textstats import gopher_quality_flags, pii_scan
    from wurzel_spark.sinks.versioned import LocalCollectionBackend, VersionedCollectionWriter
    from wurzel_spark.streaming.dedup import curate_stream_to_versioned_sink
    from wurzel_spark.tables import table

    docs_dir = str(tmp_path / "docs_stream")
    docs = table(spark, sf_dir, "documents")
    docs.repartition(2).write.mode("overwrite").parquet(docs_dir)

    root = str(tmp_path / "collections")
    writer = VersionedCollectionWriter(
        backend_factory=lambda: LocalCollectionBackend(root), collection="curated"
    )
    # maxFilesPerTrigger=1 forces MULTIPLE micro-batches (2 parquet parts
    # → ≥2 batches) so the published version must span batches, not just
    # the last one.
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    q = curate_stream_to_versioned_sink(stream, str(tmp_path / "ckpt"), writer)
    q.awaitTermination()

    # batch twin
    keep = gopher_quality_flags(docs).filter(
        F.col("ok_mean_word_len") & F.col("ok_symbol_ratio")
    ).select("doc_id")
    clean = pii_scan(docs).filter(~F.col("pii_flag")).select("doc_id")
    expected = (
        docs.join(keep, "doc_id", "left_semi")
        .join(clean, "doc_id", "left_semi")
        .dropDuplicates(["text"])
        .count()
    )
    assert expected > 0

    # read back the aliased collection
    backend = LocalCollectionBackend(root)
    published = backend.get_alias("curated")
    assert published is not None
    rows = 0
    coll_dir = os.path.join(root, published)
    for fn in os.listdir(coll_dir):
        if fn.endswith(".jsonl"):
            rows += sum(1 for _ in open(os.path.join(coll_dir, fn)))
    assert rows == expected


def test_stateful_cohort_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """Latest per-user cohort row, exploded into the (cohort_week,
    week_offset) grid, must equal batch cohort_retention exactly."""
    import datetime

    from wurzel_spark.queries.events import cohort_retention
    from wurzel_spark.streaming.cohort import cohort_stream

    stream = read_event_stream(spark, events_dir)
    out = cohort_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_cohort")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_cohort"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # memory sink in update mode appends updated rows; latest per user =
    # the one with the SMALLEST cohort (cohort only ever decreases) and,
    # within equal cohorts, the largest offset set — rebuild from all rows
    # the one with the smallest cohort and largest offset set
    grid = {}
    latest = {}
    for r in spark.sql("SELECT * FROM t_cohort").collect():
        cur = latest.get(r["user_id"])
        key = (r["cohort_week_day"], -len(r["week_offsets"]))
        if cur is None or key < (cur["cohort_week_day"], -len(cur["week_offsets"])):
            latest[r["user_id"]] = r
    for r in latest.values():
        cohort = datetime.datetime.utcfromtimestamp(r["cohort_week_day"] * 86400)
        for off in r["week_offsets"]:
            grid[(cohort, off)] = grid.get((cohort, off), 0) + 1
    expected = {
        (r["cohort_week"].replace(tzinfo=None), r["week_offset"]): r["n_active_users"]
        for r in cohort_retention(spark, sf_dir).collect()
    }
    assert grid == expected


def test_streaming_curation_funnel_matches_batch(spark, sf_dir, tmp_path):
    """Cross-batch funnel counts (with the dedup ledger) must equal the
    one-shot batch curation_pipeline_stats on the same corpus."""
    from wurzel_spark.operators.textstats import curation_pipeline_stats
    from wurzel_spark.streaming.curation import curation_funnel_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    d = str(tmp_path / "docs_stream")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)  # force >=3 micro-batches
        .parquet(d)
    )
    got = curation_funnel_stream(stream, str(tmp_path / "ckpt_cur")).collect()
    exp = curation_pipeline_stats(docs).collect()
    as_map = lambda rows: {
        r["source"]: (
            r["n_input"], r["n_gopher_ok"], r["n_pii_ok"], r["n_final"], r["surviving_tokens"]
        )
        for r in rows
    }
    assert as_map(got) == as_map(exp)


def test_streaming_asof_enrich_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """Stream-static as-of enrichment == the batch asof query, under
    multi-micro-batch admission (events_dir is split into 4 files; the
    reader caps files per trigger so parity covers the union-of-batches
    path, not just a single-batch accident)."""
    from wurzel_spark.operators.asof import q_asof_last_order_before_event
    from wurzel_spark.streaming.enrich import asof_enrich_stream
    from wurzel_spark.streaming.events import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    orders = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    out_dir = str(tmp_path / "enriched")
    asof_enrich_stream(
        stream,
        orders,
        out_dir,
        str(tmp_path / "ckpt_asof"),
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        how="inner",
    )
    got = {
        r["event_id"]: (r["user_id"], r["asof_o_orderkey"], float(r["asof_o_totalprice"]))
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        r["event_id"]: (r["user_id"], r["last_orderkey"], float(r["last_order_price"]))
        for r in q_asof_last_order_before_event(spark, sf_dir).collect()
    }
    assert got == expected


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_dir, tmp_path):
    """Native watermarked stream-stream interval join == the batch bucketed
    range join, across micro-batch boundaries (clicks and purchases read
    as SEPARATE streams with small admission caps, so matching pairs
    routinely arrive in different batches — the case foreachBatch twins
    cannot express)."""
    from wurzel_spark.streaming.events import EVENTS_SCHEMA
    from wurzel_spark.streaming.rangejoin import interval_join_stream

    def stream():
        return (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(events_dir)
        )

    purchases = (
        stream()
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pt"))
    )
    clicks = (
        stream()
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("ct"))
    )
    # the watermark is the source's DISORDER bound: replaying static
    # parquet splits is fully unordered (each file spans the whole month),
    # so it must cover the dataset's time span or cross-batch late rows
    # are — correctly — dropped. A live feed would use its real skew bound.
    joined = interval_join_stream(
        purchases, clicks, "user_id", "pt", "ct", lower_s=-3600, upper_s=0,
        watermark="40 days",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("t_interval_join")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT * FROM t_interval_join")
        .groupBy("purchase_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_prev_hour"))
        .collect()
    )
    from wurzel_spark.operators.rangejoin import q_clicks_before_purchase

    expected = q_clicks_before_purchase(spark, sf_dir).collect()
    as_map = lambda rows: {  # noqa: E731
        (r["purchase_id"], r["user_id"]): r["n_clicks_prev_hour"] for r in rows
    }
    assert as_map(got) == as_map(expected)


def test_streaming_decontamination_matches_batch(spark, sf_dir, tmp_path):
    """Stream-vs-static decontamination == the batch operator, under
    multi-micro-batch admission (corpus written as 3 files, one file per
    trigger — parity must hold across the union of batches)."""
    from wurzel_spark.operators.dedup import decontamination_overlap
    from wurzel_spark.streaming.decontam import decontaminate_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 100 == 0)
    corpus = docs.filter(F.col("doc_id") % 100 != 0)
    d = str(tmp_path / "decontam_stream")
    corpus.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    out_dir = str(tmp_path / "decontam_out")
    decontaminate_stream(stream, eval_set, out_dir, str(tmp_path / "ckpt_dec"))
    got = {
        r["doc_id"]: (r["n_spans"], r["n_contaminated"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        r["doc_id"]: (r["n_spans"], r["n_contaminated"])
        for r in decontamination_overlap(corpus, eval_set, n=13).collect()
    }
    assert got == exp


def test_streaming_hll_matches_batch(spark, sf_dir, tmp_path):
    """HLL registers merged across micro-batches == the batch sketch,
    bit-equal (register max-merge is exact), under one-file-per-trigger
    admission forcing a genuinely multi-batch run."""
    from wurzel_spark.operators.sketches import hll_distinct_stats
    from wurzel_spark.streaming.sketch import hll_stream_distinct
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    d = str(tmp_path / "hll_in")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = {
        r["source"]: (r["n_buckets_hit"], r["hll_sum_scaled"], r["hll_estimate"])
        for r in hll_stream_distinct(
            stream, str(tmp_path / "hll_stage"), str(tmp_path / "hll_ckpt")
        ).collect()
    }
    exp = {
        r["source"]: (r["n_buckets_hit"], r["hll_sum_scaled"], r["hll_estimate"])
        for r in hll_distinct_stats(docs).collect()
    }
    assert got == exp  # exact, including the float estimate (same division)


def test_streaming_hll_empty_stream_returns_empty(spark, tmp_path):
    from wurzel_spark.streaming.sketch import hll_stream_distinct

    d = str(tmp_path / "hll_empty_in")
    import os
    os.makedirs(d, exist_ok=True)  # ingest dir exists but has no files
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string, source string")
        .parquet(d)
    )
    out = hll_stream_distinct(
        stream, str(tmp_path / "hll_empty_stage"), str(tmp_path / "hll_empty_ckpt")
    )
    assert out.count() == 0


def test_streaming_cms_matches_batch(spark, sf_dir, tmp_path):
    """CMS cells summed across micro-batches == the batch sketch's
    estimates for the same probe terms, bit-equal (additive int64 cells),
    under one-file-per-trigger admission."""
    from wurzel_spark.operators.sketches import cms_heavy_hitters
    from wurzel_spark.streaming.cms import cms_stream_estimates
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    batch = {r["term"]: r["cms_estimate"] for r in cms_heavy_hitters(docs).collect()}
    terms = sorted(batch)
    d = str(tmp_path / "cms_in")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = {
        r["w"]: r["cms_estimate"]
        for r in cms_stream_estimates(
            stream, terms, str(tmp_path / "cms_stage"), str(tmp_path / "cms_ckpt")
        ).collect()
    }
    assert got == batch


def test_streaming_classifier_scoring_matches_batch(spark, sf_dir, tmp_path):
    """Train offline, score a multi-micro-batch stream — per-doc scores
    bit-equal to batch scoring (same broadcast weights, same kernel)."""
    import pyspark.sql.functions as _F

    from wurzel_spark.operators.classifier import (
        doc_features,
        score_documents,
        train_quality_classifier,
    )
    from wurzel_spark.streaming.classify import score_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    feats = doc_features(docs).join(
        docs.select("doc_id", (_F.col("lang") == "en").cast("long").alias("y")), "doc_id"
    )
    w, b = train_quality_classifier(feats, n_iters=3)
    d = str(tmp_path / "clf_in")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out_dir = str(tmp_path / "clf_out")
    score_stream(stream, w, b, out_dir, str(tmp_path / "clf_ckpt"))
    got = {
        r["doc_id"]: (r["score"], r["pred"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        r["doc_id"]: (r["score"], r["pred"])
        for r in score_documents(doc_features(docs), w, b).collect()
    }
    assert got == exp


def test_streaming_cluster_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Live cluster labels across micro-batches == batch LSH pairs →
    components over the whole corpus, under one-file-per-trigger
    admission (pairs split across batch boundaries must all be found
    via the growing index)."""
    from wurzel_spark.operators.dedup import (
        minhash_dedup_pairs,
        near_dup_cluster_members,
    )
    from wurzel_spark.streaming.clusters import cluster_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents")
    d = str(tmp_path / "clu_in")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in cluster_stream(
            stream,
            str(tmp_path / "clu_index"),
            str(tmp_path / "clu_labels"),
            str(tmp_path / "clu_ckpt"),
        ).collect()
    }
    exp = {
        (r["doc_id"], r["cluster_id"])
        for r in near_dup_cluster_members(
            minhash_dedup_pairs(docs, threshold=0.5).select("id_a", "id_b")
        ).collect()
    }
    assert got == exp


def test_streaming_cms_replay_is_idempotent(spark, sf_dir, tmp_path):
    """At-least-once replay: re-delivering a batch (foreachBatch retry
    after the parquet write, before the checkpoint commit) must not
    double-count its CMS cells — overwrite to batch=N replaces them."""
    from wurzel_spark.streaming.cms import write_batch_cells

    docs = table(spark, sf_dir, "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    stage = str(tmp_path / "cms_replay_stage")
    write_batch_cells(b0, 0, stage)
    write_batch_cells(b1, 1, stage)

    def _merged():
        return {
            (r["i"], r["cell"]): r["c"]
            for r in spark.read.parquet(stage)
            .groupBy("i", "cell")
            .agg(F.sum("c").alias("c"))
            .collect()
        }

    once = _merged()
    write_batch_cells(b0, 0, stage)  # replayed delivery of batch 0
    assert _merged() == once


def test_streaming_classifier_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Replayed micro-batch must replace, not duplicate, its scored rows."""
    import numpy as np

    from wurzel_spark.operators.classifier import N_BUCKETS
    from wurzel_spark.streaming.classify import write_batch_scores

    docs = table(spark, sf_dir, "documents")
    w = np.zeros(N_BUCKETS, dtype=np.float64)
    w[0] = 0.01
    out = str(tmp_path / "clf_replay_out")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    write_batch_scores(b0, 0, w, 0.0, out)
    n_docs = b0.count()
    rows_once = spark.read.parquet(out).count()
    assert rows_once == n_docs
    write_batch_scores(b0, 0, w, 0.0, out)  # replayed delivery
    assert spark.read.parquet(out).count() == n_docs


def test_streaming_cluster_state_compaction(spark, sf_dir, tmp_path):
    """≥20 micro-batches with compact_every=4 must end with O(1) batch
    dirs per state dir and labels identical to the full-batch recompute
    (VERDICT r4 #5)."""
    import os

    from wurzel_spark.operators.dedup import (
        minhash_dedup_pairs,
        near_dup_cluster_members,
    )
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.clusters import cluster_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(120).localCheckpoint()
    d = str(tmp_path / "cluc_in")
    docs.repartition(20).write.mode("overwrite").parquet(d)
    n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert n_files >= 20
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    index_dir = str(tmp_path / "cluc_index")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in cluster_stream(
            stream,
            index_dir,
            str(tmp_path / "cluc_labels"),
            str(tmp_path / "cluc_ckpt"),
            compact_every=4,
        ).collect()
    }
    exp = {
        (r["doc_id"], r["cluster_id"])
        for r in near_dup_cluster_members(
            minhash_dedup_pairs(docs, threshold=0.5).select("id_a", "id_b")
        ).collect()
    }
    assert got == exp
    # state dir count is bounded by the fold cadence, not the batch count
    for sd in (index_dir, index_dir + "_docs"):
        assert len(list_batch_ids(spark, sd)) <= 4
    # every ingested doc's signature survives the folds exactly once
    idx = spark.read.parquet(index_dir)
    assert idx.select("id").distinct().count() == docs.count()
    assert idx.count() == docs.count()


def test_cluster_fold_recovery(spark, tmp_path):
    """recover_fold: a _SUCCESS-marked tmp (crash between the staged fold
    write and the rename) is installed and the stale partitions dropped; a
    markerless tmp (crash mid-write) is discarded with partitions intact."""
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.clusters import _fold_tmp, recover_fold

    state = str(tmp_path / "st")
    rows = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    rows.write.parquet(f"{state}/batch=0")
    rows.write.parquet(f"{state}/batch=1")
    # complete fold staged (superset content), crash before deletes+rename
    rows.write.parquet(_fold_tmp(state))  # parquet commit leaves _SUCCESS
    recover_fold(spark, state, 2)
    assert list_batch_ids(spark, state) == [-3]
    assert spark.read.parquet(state).count() == 2

    # markerless tmp: partial job output — must be discarded
    state2 = str(tmp_path / "st2")
    rows.write.parquet(f"{state2}/batch=0")
    import os

    os.makedirs(_fold_tmp(state2))
    with open(_fold_tmp(state2) + "/part-broken.parquet", "w") as f:
        f.write("not parquet")
    recover_fold(spark, state2, 1)
    assert list_batch_ids(spark, state2) == [0]
    assert not os.path.exists(_fold_tmp(state2))


def test_streaming_snapshot_diff_matches_batch(spark, sf_dir, tmp_path):
    """New snapshot delivered one file per trigger == the batch diff
    (removed detection requires the drain barrier; added/changed must
    survive arbitrary batch splits)."""
    from wurzel_spark.operators.snapshots import snapshot_diff
    from wurzel_spark.streaming.snapshots import snapshot_diff_stream

    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") % 13 != 5).select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [v2]")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    d = str(tmp_path / "snap_in")
    new.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(new.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = {
        (r["doc_id"], r["status"])
        for r in snapshot_diff_stream(
            stream, old, str(tmp_path / "snap_stage"), str(tmp_path / "snap_ckpt")
        ).collect()
    }
    exp = {(r["doc_id"], r["status"]) for r in snapshot_diff(old, new).collect()}
    assert got == exp and len(got) > 0


def test_streaming_novelty_matches_batch_with_compaction(spark, sf_dir, tmp_path):
    """Novelty staged across many micro-batches (fold cadence 3) ==
    the batch ngram_novelty over the whole corpus, bit-equal — and the
    shingle state dir count stays bounded by the fold cadence."""
    from wurzel_spark.operators.dedup import ngram_novelty
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.novelty import novelty_stream

    docs = table(spark, sf_dir, "documents").limit(150).localCheckpoint()
    d = str(tmp_path / "nov_in")
    docs.repartition(8).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "nov_state")
    got = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in novelty_stream(
            stream, state, str(tmp_path / "nov_ckpt"), compact_every=3
        ).collect()
    }
    exp = {
        r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty"])
        for r in ngram_novelty(docs).collect()
    }
    assert got == exp
    assert len(list_batch_ids(spark, state)) <= 3


def test_streaming_compressibility_matches_batch(spark, sf_dir, tmp_path):
    """Row-local scoring per micro-batch == the batch operator, bit-equal
    (deterministic zlib level + same entropy kernel)."""
    from wurzel_spark.operators.textstats import compressibility_stats
    from wurzel_spark.streaming.compress import compressibility_stream

    docs = table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    d = str(tmp_path / "cmp_in")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out_dir = str(tmp_path / "cmp_out")
    compressibility_stream(stream, out_dir, str(tmp_path / "cmp_ckpt"))
    got = {
        r["doc_id"]: (r["n_bytes"], r["zlib_ratio"], r["char_entropy"])
        for r in spark.read.parquet(out_dir).collect()
    }
    exp = {
        r["doc_id"]: (r["n_bytes"], r["zlib_ratio"], r["char_entropy"])
        for r in compressibility_stats(docs).collect()
    }
    assert got == exp


def test_streaming_cms_compaction_and_replay(spark, sf_dir, tmp_path):
    """r6 staging audit: CMS cells on the fold protocol — 3-file stream
    at fold cadence 2 keeps the dir count bounded, a batch re-delivered
    AFTER its fold committed changes nothing (provenance dedup at the
    drain), and estimates stay bit-equal to the batch sketch."""
    from wurzel_spark.operators.sketches import cms_heavy_hitters
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.cms import (
        cms_stream_estimates,
        drain_cms_cells,
        write_batch_cells,
    )
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    batch = {
        r["term"]: r["cms_estimate"] for r in cms_heavy_hitters(docs).collect()
    }
    terms = sorted(batch)
    d = str(tmp_path / "cmsc_in")
    docs.repartition(3).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    stage = str(tmp_path / "cmsc_stage")
    got = {
        r["w"]: r["cms_estimate"]
        for r in cms_stream_estimates(
            stream, terms, stage, str(tmp_path / "cmsc_ckpt"), compact_every=2
        ).collect()
    }
    assert got == batch
    assert len(list_batch_ids(spark, stage)) <= 2
    # redeliver batch 0 after the folds: sums must not change
    import pyspark.sql.functions as _F

    first_batch = docs.limit(0)  # re-stage SOME batch's docs under id 0
    some = docs.filter(_F.col("doc_id") % 3 == 0)
    write_batch_cells(some, 0, stage, compact_every=2)
    before = {(r["i"], r["cell"]): r["c"] for r in drain_cms_cells(spark, stage).collect()}
    write_batch_cells(some, 0, stage, compact_every=2)  # replay again
    after = {(r["i"], r["cell"]): r["c"] for r in drain_cms_cells(spark, stage).collect()}
    assert before == after


def test_streaming_hll_compaction_matches_batch(spark, sf_dir, tmp_path):
    """r6 staging audit: HLL registers on the fold protocol (max-merge
    fold) — bounded dirs, estimates bit-equal to the batch operator."""
    from wurzel_spark.operators.sketches import hll_distinct_stats
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.sketch import hll_stream_distinct
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    batch = {
        r["source"]: (r["n_buckets_hit"], r["hll_estimate"])
        for r in hll_distinct_stats(docs).select(
            "source", "n_buckets_hit", "hll_estimate"
        ).collect()
    }
    d = str(tmp_path / "hllc_in")
    docs.repartition(5).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    stage = str(tmp_path / "hllc_stage")
    got = {
        r["source"]: (r["n_buckets_hit"], r["hll_estimate"])
        for r in hll_stream_distinct(
            stream, stage, str(tmp_path / "hllc_ckpt"), compact_every=2
        ).collect()
    }
    assert got == batch
    assert len(list_batch_ids(spark, stage)) <= 2


def test_streaming_curation_ledger_compaction(spark, sf_dir, tmp_path):
    """r6 staging audit: the curation dedup ledger folds — funnel counts
    still match the batch twin and the ledger dir count stays bounded."""
    from wurzel_spark.operators.textstats import q_curation_pipeline
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.curation import curation_funnel_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(150).localCheckpoint()
    d = str(tmp_path / "curc_in")
    docs.repartition(6).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    ledger = str(tmp_path / "curc_ledger")
    got = {
        r["source"]: (r["n_input"], r["n_gopher_ok"], r["n_pii_ok"], r["n_final"],
                      r["surviving_tokens"])
        for r in curation_funnel_stream(
            stream, str(tmp_path / "curc_ckpt"), ledger_dir=ledger, compact_every=2
        ).collect()
    }
    from wurzel_spark.operators.textstats import curation_pipeline_stats

    exp = {
        r["source"]: (r["n_input"], r["n_gopher_ok"], r["n_pii_ok"], r["n_final"],
                      r["surviving_tokens"])
        for r in curation_pipeline_stats(docs).collect()
    }
    assert got == exp
    assert len(list_batch_ids(spark, ledger)) <= 2


def test_curate_stream_staging_folds(spark, tmp_path):
    """r6 staging audit: the versioned-sink curate staging folds with the
    ORDER-AWARE reduction (min doc_id per content hash) — the published
    set is identical to an unfolded run and keeps the min-id copies."""
    from wurzel_spark.sinks.versioned import LocalCollectionBackend, VersionedCollectionWriter
    from wurzel_spark.streaming.dedup import curate_stream_to_versioned_sink

    texts = [
        "a perfectly reasonable document with normal words here",
        "another quite ordinary document body of text content",
        "a third document with enough clean words to survive",
    ]
    rows = [(i, texts[i % 3], "en", "s") for i in range(12)]  # dups across batches
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    d = str(tmp_path / "cur_in")
    docs.repartition(6).write.mode("overwrite").parquet(d)

    def run(compact_every, tag):
        import json as _json
        import os as _os

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d)
        )
        root = str(tmp_path / f"coll_{tag}")
        writer = VersionedCollectionWriter(
            backend_factory=lambda: LocalCollectionBackend(root), collection="kb"
        )
        curate_stream_to_versioned_sink(
            stream,
            str(tmp_path / f"cur_ckpt_{tag}"),
            writer,
            staging_dir=str(tmp_path / f"cur_stage_{tag}"),
            compact_every=compact_every,
        )
        published = LocalCollectionBackend(root).get_alias("kb")
        out = set()
        coll_dir = _os.path.join(root, published)
        for fn in _os.listdir(coll_dir):
            if fn.endswith(".jsonl"):
                for line in open(_os.path.join(coll_dir, fn)):
                    r = _json.loads(line)
                    out.add((r["doc_id"], r["text"]))
        return out

    folded = run(2, "folded")
    plain = run(None, "plain")
    assert folded == plain
    assert {i for i, _ in folded} == {0, 1, 2}  # min doc_id per content


def test_streaming_event_drift_matches_batch(spark, sf_dir, tmp_path):
    """r6: day-over-day PSI maintained over micro-batches (fold cadence
    2, one file per trigger) == the batch event_type_drift bit-exactly —
    both call psi_from_type_counts, and the provenance-deduped count
    sums reassemble each day exactly however batches split it."""
    from wurzel_spark.queries.events import event_type_drift
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.drift import event_drift_stream
    from wurzel_spark.tables import table as _table

    ev = _table(spark, sf_dir, "events")
    d = str(tmp_path / "drift_in")
    ev.repartition(5).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "drift_state")
    got = {
        str(r["day"]): (r["n_events"], r["psi_q20"])
        for r in event_drift_stream(
            stream, state, str(tmp_path / "drift_ckpt"), compact_every=2
        ).collect()
    }
    exp = {
        str(r["day"]): (r["n_events"], r["psi_q20"])
        for r in event_type_drift(spark, sf_dir).collect()
    }
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2


def test_streaming_chunk_dedup_matches_batch(spark, sf_dir, tmp_path):
    """r6: CDC chunk accounting over micro-batches (fold cadence 2) ==
    the batch chunk_dedup_stats bit-exactly, and a redelivered batch
    after its fold collapses at the drain key-dedup."""
    from wurzel_spark.operators.chunking import (
        chunk_dedup_stats,
        content_defined_chunks,
    )
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.chunks import chunk_dedup_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(120).localCheckpoint()
    d = str(tmp_path / "chk_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "chk_state")
    got = chunk_dedup_stream(
        stream, state, str(tmp_path / "chk_ckpt"), min_size=16, avg_size=64,
        max_size=256, compact_every=2,
    ).collect()[0]
    exp = chunk_dedup_stats(
        content_defined_chunks(docs, min_size=16, avg_size=64, max_size=256)
    ).collect()[0]
    assert tuple(got) == tuple(exp)
    assert len(list_batch_ids(spark, state)) <= 2
    # redeliver one batch's chunks under a positive id after the folds
    import pyspark.sql.functions as _F

    some = docs.filter(_F.col("doc_id") % 4 == 0)
    chunks = content_defined_chunks(some, min_size=16, avg_size=64, max_size=256)
    write_batch_state(spark, chunks, state, 1, ["doc_id", "chunk_idx"], 2)
    from wurzel_spark.streaming.chunks import chunk_dedup_stream as _  # noqa: F401
    # drain again directly (replaying the read path)
    staged = (
        spark.read.parquet(state)
        .select("doc_id", "chunk_idx", "chunk_len", "chunk_hash")
        .dropDuplicates(["doc_id", "chunk_idx"])
    )
    again = chunk_dedup_stats(staged).collect()[0]
    assert tuple(again) == tuple(exp)


def test_streaming_exact_substring_matches_batch(spark, sf_dir, tmp_path):
    """r7: ExactSubstr window state staged over micro-batches (fold
    cadence 2) == batch exact_substring_removal bit-exactly — the
    duplicated set is a full-corpus property, so a pair split across
    batches must still be found at drain."""
    from wurzel_spark.operators.substrings import exact_substring_removal
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.substrings import exact_substring_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(120).localCheckpoint()
    d = str(tmp_path / "sub_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "sub_state")
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in exact_substring_stream(
            stream, state, str(tmp_path / "sub_ckpt"), compact_every=2
        ).collect()
    }
    exp = {r["doc_id"]: tuple(r)[1:] for r in exact_substring_removal(docs).collect()}
    assert got == exp and len(got) == 120
    # some doc must actually have removals for the parity to mean anything
    assert any(r[3] > 0 for r in exp.values())
    assert len(list_batch_ids(spark, state)) <= 2


def test_streaming_exact_substring_cross_batch_pair(spark, tmp_path):
    """Two copies of one 25-token span admitted in DIFFERENT batches:
    neither batch alone contains a duplicate, the drain must flag both."""
    from wurzel_spark.streaming.substrings import exact_substring_stream

    span = " ".join(f"tok{i}" for i in range(25))
    docs = spark.createDataFrame(
        [(1, span + " tailone extra words here"), (2, "lead in words " + span)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "xb_in")
    # one file per doc → maxFilesPerTrigger=1 admits them in separate batches
    docs.filter(F.col("doc_id") == 1).coalesce(1).write.mode("overwrite").parquet(d)
    docs.filter(F.col("doc_id") == 2).coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in exact_substring_stream(
            stream, str(tmp_path / "xb_state"), str(tmp_path / "xb_ckpt")
        ).collect()
    }
    assert out[1]["n_removed_tokens"] == 25 and out[2]["n_removed_tokens"] == 25
    assert out[1]["n_runs"] == 1 and out[2]["n_runs"] == 1


def test_streaming_sample_quantiles_match_batch(spark, sf_dir, tmp_path):
    """r7: bottom-k quantile sketch staged over micro-batches == the
    batch estimator's est columns bit-exactly (min-k semilattice)."""
    from wurzel_spark.operators.sketches import hash_sample_quantile_eval
    from wurzel_spark.streaming.quantiles import sample_quantile_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(300).localCheckpoint()
    d = str(tmp_path / "sq_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = sorted(
        map(
            tuple,
            sample_quantile_stream(
                stream,
                str(tmp_path / "sq_state"),
                str(tmp_path / "sq_ckpt"),
                k=32,
                compact_every=2,
            ).collect(),
        )
    )
    exp = sorted(
        tuple(r)
        for r in hash_sample_quantile_eval(docs, k=32)
        .select("source", "p1000", "sample_k", "est")
        .collect()
    )
    assert got == exp and len(got) > 0


def test_streaming_quality_sweep_matches_batch(spark, sf_dir, tmp_path):
    """r7: additive score-bucket partials staged over micro-batches ==
    the batch yield curve bit-exactly (integer sums are admission-order
    independent)."""
    from wurzel_spark.operators.textstats import quality_threshold_sweep
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.quality import quality_sweep_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    d = str(tmp_path / "qs_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "qs_state")
    got = sorted(
        map(
            tuple,
            quality_sweep_stream(
                stream, state, str(tmp_path / "qs_ckpt"), compact_every=2
            ).collect(),
        )
    )
    exp = sorted(map(tuple, quality_threshold_sweep(docs).collect()))
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2


def test_streaming_event_anomalies_match_batch(spark, sf_dir, tmp_path):
    """r7: additive hourly-count partials staged over micro-batches ==
    the batch median/MAD anomaly gate bit-exactly — an hour split across
    batches must sum before the order statistics read it."""
    from wurzel_spark.queries.events import anomalies_from_hourly, event_hourly_counts
    from wurzel_spark.streaming.anomalies import event_anomaly_stream
    from wurzel_spark.tables import table as _table

    ev = _table(spark, sf_dir, "events").localCheckpoint()
    d = str(tmp_path / "ea_in")
    # repartition by nothing time-aligned: hours straddle batches
    ev.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = sorted(
        map(
            tuple,
            event_anomaly_stream(
                stream, str(tmp_path / "ea_state"), str(tmp_path / "ea_ckpt"),
                compact_every=2,
            ).collect(),
        )
    )
    exp = sorted(map(tuple, anomalies_from_hourly(event_hourly_counts(ev)).collect()))
    assert got == exp and len(got) > 0


def test_streaming_fof_matches_batch(spark, sf_dir, tmp_path):
    """r7: vocabulary-sized type-count partials with the AGGREGATING
    fold == the batch Good-Turing histogram bit-exactly; the fold keeps
    state at one row per live type (asserted on the folded dir)."""
    from wurzel_spark.operators.textstats import term_freq_of_freq
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.fof import fof_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    d = str(tmp_path / "ff_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "ff_state")
    got = sorted(
        map(
            tuple,
            fof_stream(stream, state, str(tmp_path / "ff_ckpt"), compact_every=2)
            .collect(),
        )
    )
    exp = sorted(map(tuple, term_freq_of_freq(docs).collect()))
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2
    # the aggregating fold leaves ≤ one row per (source, type)
    staged = spark.read.parquet(state)
    n_rows = staged.count()
    n_keys = staged.select("source", "h").distinct().count()
    # at most one un-folded trailing batch may duplicate a key
    assert n_rows <= 2 * n_keys


def test_streaming_fertility_matches_batch(spark, sf_dir, tmp_path):
    """r8: additive per-(source,lang) fertility partials staged over
    micro-batches == the batch tokenizer_fertility_stats bit-exactly,
    with replay idempotence (a re-delivered batch overwrites its own
    partition) and bounded state dirs."""
    from wurzel_spark.operators.textstats import tokenizer_fertility_stats
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.fertility import (
        drain_fertility_state,
        fertility_stream,
    )
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    d = str(tmp_path / "fert_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "fert_state")
    got = sorted(
        map(
            tuple,
            fertility_stream(
                stream, state, str(tmp_path / "fert_ckpt"), compact_every=2
            ).collect(),
        )
    )
    exp = sorted(map(tuple, tokenizer_fertility_stats(docs).collect()))
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2
    # replay idempotence: restage SOME batch under an id already seen
    import pyspark.sql.functions as _F

    from wurzel_spark.operators.textstats import fertility_sums
    from wurzel_spark.streaming._state import write_batch_state

    some = docs.filter(_F.col("doc_id") % 4 == 0)
    mine = fertility_sums(some).withColumn("src_batch", _F.lit(0))
    write_batch_state(
        spark, mine, state, 0, ["src_batch", "source", "lang"], 2
    )
    before = sorted(map(tuple, drain_fertility_state(spark, state).collect()))
    write_batch_state(
        spark, mine, state, 0, ["src_batch", "source", "lang"], 2
    )
    after = sorted(map(tuple, drain_fertility_state(spark, state).collect()))
    assert before == after


def test_streaming_index_matches_batch(spark, sf_dir, tmp_path):
    """r8: per-batch posting partials (the materialized index itself)
    staged over micro-batches == the batch inverted_index_stats
    bit-exactly, with replay idempotence and bounded state dirs."""
    from wurzel_spark.operators.textstats import (
        index_postings,
        inverted_index_stats,
    )
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.index import drain_index_state, index_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    d = str(tmp_path / "idx_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "idx_state")
    got = sorted(
        map(
            tuple,
            index_stream(
                stream, state, str(tmp_path / "idx_ckpt"), compact_every=2
            ).collect(),
        )
    )
    exp = sorted(map(tuple, inverted_index_stats(docs).collect()))
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2
    # replay: restage one batch's postings under an already-seen id twice
    import pyspark.sql.functions as _F

    some = docs.filter(_F.col("doc_id") % 4 == 0)
    mine = index_postings(some).withColumn("src_batch", _F.lit(0))
    write_batch_state(spark, mine, state, 0, ["src_batch", "h", "doc_id"], 2)
    before = sorted(map(tuple, drain_index_state(spark, state).collect()))
    write_batch_state(spark, mine, state, 0, ["src_batch", "h", "doc_id"], 2)
    after = sorted(map(tuple, drain_index_state(spark, state).collect()))
    assert before == after


def test_streaming_calibration_and_auc_match_batch(spark, sf_dir, tmp_path):
    """r8: one staged score-label histogram serves BOTH eval drains —
    calibration bins and exact AUC — bit-equal to the batch operators,
    replay-idempotent, bounded dirs."""
    from wurzel_spark.operators.textstats import (
        score_auc_stats,
        score_calibration_bins,
        score_label_hist,
    )
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.calibration import (
        calibration_stream,
        drain_auc_state,
    )
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(200).localCheckpoint()
    d = str(tmp_path / "cal_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "cal_state")
    bins, auc = calibration_stream(
        stream, state, str(tmp_path / "cal_ckpt"), compact_every=2
    )
    assert sorted(map(tuple, bins.collect())) == sorted(
        map(tuple, score_calibration_bins(docs).collect())
    )
    assert sorted(map(tuple, auc.collect())) == sorted(
        map(tuple, score_auc_stats(docs).collect())
    )
    assert len(list_batch_ids(spark, state)) <= 2
    # replay idempotence
    import pyspark.sql.functions as _F

    some = docs.filter(_F.col("doc_id") % 4 == 0)
    mine = score_label_hist(some).withColumn("src_batch", _F.lit(0))
    write_batch_state(spark, mine, state, 0, ["src_batch", "source", "q1000"], 2)
    before = sorted(map(tuple, drain_auc_state(spark, state).collect()))
    write_batch_state(spark, mine, state, 0, ["src_batch", "source", "q1000"], 2)
    after = sorted(map(tuple, drain_auc_state(spark, state).collect()))
    assert before == after
