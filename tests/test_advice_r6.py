"""Regression tests for the round-6 ADVICE findings.

Each test pins the FIXED behavior against the advisor's failure scenario:
apply_changeset duplicate-id semantics (change_seq last-wins + explicit
validation), env-override type coercion so Argo and local manifest runs
pass identical kwargs, and the unconditional TEI checkpoint so a second
action never re-POSTs to the embedding server. (The bench.py assert and
the __spark_entry__ window-marker findings are pinned by
test_contract_consistency.py and the r7 rotation respectively.)
"""

import os

import pytest
from pyspark.sql import functions as F


# --------------------------------------------- ADVICE #2: apply_changeset

def _base(spark):
    return spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three")], "doc_id long, text string"
    )


def test_apply_changeset_change_seq_last_wins(spark):
    """Same id upserted twice WITH change_seq: the highest seq wins and
    exactly one row comes out — the docstring's promised reduction."""
    from wurzel_spark.operators.snapshots import apply_changeset

    changes = spark.createDataFrame(
        [
            (2, "upsert", "two-v1", 10),
            (2, "upsert", "two-v2", 20),
            (4, "upsert", "four", 5),
        ],
        "doc_id long, op string, text string, change_seq long",
    )
    out = apply_changeset(_base(spark), changes).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in out] == [
        (1, "one"), (2, "two-v2"), (3, "three"), (4, "four"),
    ]


def test_apply_changeset_change_seq_delete_then_upsert(spark):
    """Last op by seq is an upsert after an earlier delete → the row
    survives with the upserted text; the reverse order deletes it."""
    from wurzel_spark.operators.snapshots import apply_changeset

    schema = "doc_id long, op string, text string, change_seq long"
    up_last = spark.createDataFrame(
        [(3, "delete", None, 1), (3, "upsert", "three-v2", 2)], schema
    )
    out = apply_changeset(_base(spark), up_last).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in out] == [
        (1, "one"), (2, "two"), (3, "three-v2"),
    ]
    del_last = spark.createDataFrame(
        [(3, "upsert", "three-v2", 1), (3, "delete", None, 2)], schema
    )
    out = apply_changeset(_base(spark), del_last).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["text"]) for r in out] == [(1, "one"), (2, "two")]


def test_apply_changeset_validate_unique_raises(spark):
    """No change_seq + duplicate id + validate_unique=True → ValueError
    naming the offending id (the advisor's silent-duplicate scenario)."""
    from wurzel_spark.operators.snapshots import apply_changeset

    changes = spark.createDataFrame(
        [(2, "upsert", "a"), (2, "upsert", "b")],
        "doc_id long, op string, text string",
    )
    with pytest.raises(ValueError, match="duplicate ids.*2"):
        apply_changeset(_base(spark), changes, validate_unique=True)
    # unique changeset passes validation untouched
    ok = spark.createDataFrame(
        [(2, "upsert", "two-v2")], "doc_id long, op string, text string"
    )
    out = apply_changeset(_base(spark), ok, validate_unique=True)
    assert out.count() == 3


# ------------------------------------- ADVICE #3: env override coercion

def test_env_settings_coerces_to_manifest_types(tmp_path):
    """generate_argo exports settings as strings; env_settings must hand
    the step function the SAME native types a local run passes."""
    from wurzel_spark.manifest import Manifest

    yaml_text = """
pipeline: {name: demo}
steps:
  tune:
    uses: wurzel_spark.manifest:_resolve
    settings:
      n_parts: 8
      threshold: 0.5
      enabled: true
      tags: ["a", "b"]
      label: plain
"""
    m = Manifest.from_yaml(yaml_text)
    overrides = {
        "TUNE__N_PARTS": "32",
        "TUNE__THRESHOLD": "0.25",
        "TUNE__ENABLED": "false",
        "TUNE__TAGS": '["x"]',
        "TUNE__LABEL": "other",
        "TUNE__EXTRA": "free",  # no manifest default → stays a string
    }
    old = {k: os.environ.get(k) for k in overrides}
    os.environ.update(overrides)
    try:
        s = m.env_settings("tune")
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.update({k: v})
    assert s["n_parts"] == 32 and isinstance(s["n_parts"], int)
    assert s["threshold"] == 0.25 and isinstance(s["threshold"], float)
    assert s["enabled"] is False
    assert s["tags"] == ["x"]
    assert s["label"] == "other"
    assert s["extra"] == "free"


def test_env_settings_bad_numeric_override_raises(tmp_path):
    from wurzel_spark.manifest import Manifest

    m = Manifest.from_yaml(
        "pipeline: {name: demo}\n"
        "steps:\n"
        "  tune:\n"
        "    uses: wurzel_spark.manifest:_resolve\n"
        "    settings: {n_parts: 8}\n"
    )
    os.environ["TUNE__N_PARTS"] = "not-a-number"
    try:
        with pytest.raises(ValueError):
            m.env_settings("tune")
    finally:
        del os.environ["TUNE__N_PARTS"]


# --------------------------------- ADVICE #5: TEI fetch-exactly-once

def test_tei_embed_stage_two_actions_one_fetch(spark, tmp_path):
    """fail_if_all_fail=False + two downstream actions: the server must
    see each text exactly once (the unconditional checkpoint), not once
    per action — the advisor's replayed-mapInPandas scenario."""
    from tests.test_tei_embedding import _chunks
    from wurzel_spark.operators.embedding import tei_embed_stage
    from wurzel_spark.testing import FakeTEISession, read_fake_tei_log

    log = str(tmp_path / "tei_log")
    factory = lambda: FakeTEISession(log_dir=log)  # noqa: E731
    res = tei_embed_stage(
        _chunks(spark).coalesce(1),
        "http://tei:80",
        prefix="query: ",
        batch_size=4,
        session_factory=factory,
        fail_if_all_fail=False,
    )
    assert res.count() == 10
    assert res.count() == 10  # second action: no replay
    calls = read_fake_tei_log(log)
    embedded = sum(
        len(c["body"]["inputs"]) for c in calls if c["path"] == "/embed"
    )
    assert embedded == 10, f"texts POSTed {embedded} times for 10 docs"
