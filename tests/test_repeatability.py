"""Repeatability contract (reference tests/steps/repeatability.py:22-36):
running the same pipeline twice must produce byte-identical artifacts.

This is the property the whole determinism design serves: ordered writes,
stable row_number ids, hash embeddings, no runtime randomness.
"""

import hashlib
import json

from wurzel_spark.operators.embedding import embed_stage
from wurzel_spark.operators.splitter import split_stage
from wurzel_spark.sources.markdown import read_markdown_folder


def _artifact_hash(spark, path: str) -> str:
    df = spark.read.parquet(path)
    rows = [json.dumps(r.asDict(recursive=True), sort_keys=True, default=str) for r in df.collect()]
    return hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()


def _run_once(spark, md_folder: str, out: str) -> str:
    docs = read_markdown_folder(spark, md_folder)
    chunks = split_stage(
        docs.dropDuplicates(["md"]), token_limit=32, token_limit_buffer=8, token_limit_min=4
    )
    emb = embed_stage(chunks, dim=16)
    emb.orderBy("url", "embedding_input_text").write.mode("overwrite").parquet(out)
    return _artifact_hash(spark, out)


def test_pipeline_is_repeatable(spark, md_folder, tmp_path):
    h1 = _run_once(spark, md_folder, str(tmp_path / "run1"))
    h2 = _run_once(spark, md_folder, str(tmp_path / "run2"))
    assert h1 == h2
