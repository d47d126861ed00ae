"""TEI HTTP embedding backend against a fake transport (reference
wurzel/steps/embedding/huggingface.py:43-153 + step.py:263-272), the same
no-network pattern as tests/test_http_backends.py.

The fake (wurzel_spark.testing.FakeTEISession) records every request to a
shared log dir — worker processes get pickled copies, so in-memory call
lists would never reach the driver — letting the tests enumerate the
batching and assert the /info-driven prefix. Failures are scripted by
content marker (deterministic across processes)."""

import math

import pytest

from wurzel_spark.operators.embedding import (
    DEFAULT_PREFIX_MAP,
    EmbeddingAPIError,
    TEIClient,
    embed_stage,
    prefix_for_model,
    tei_embed_stage,
)
from wurzel_spark.testing import FakeHTTPResp, FakeTEISession, read_fake_tei_log


def _chunks(spark, n=10, poison=()):
    rows = [
        (
            f"text number {i}" + (" FAILME" if i in poison else ""),
            f"kw{i}",
            f"http://d/{i}",
            None,
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "md string, keywords string, url string, metadata map<string,string>"
    )


def test_tei_batches_and_prefix_from_info(spark, tmp_path):
    """10 chunks at batch_size=4 → exactly 3 /embed posts with the E5
    prefix prepended to every input, after ONE driver-side /info."""
    log = str(tmp_path / "tei_log")
    factory = lambda: FakeTEISession(log_dir=log)  # noqa: E731
    out = tei_embed_stage(
        _chunks(spark).coalesce(1),
        "http://tei:80",
        batch_size=4,
        session_factory=factory,
    ).collect()
    assert len(out) == 10
    assert all(len(r["vector"]) == 4 for r in out)
    calls = read_fake_tei_log(log)
    infos = [c for c in calls if c["path"] == "/info"]
    embeds = [c for c in calls if c["path"] == "/embed"]
    assert len(infos) == 1  # discovery once, on the driver
    assert sorted(len(c["body"]["inputs"]) for c in embeds) == [2, 4, 4]
    assert all(
        t.startswith("query: ") for c in embeds for t in c["body"]["inputs"]
    )  # huggingface.py:140-152 prefix map hit for e5-*


def test_tei_skips_failed_batches_keeps_rest(spark, tmp_path):
    """A 500 on one batch drops exactly that WHOLE batch's rows — batch
    granularity, not row granularity — and the run continues
    (step.py:263-267's skip-and-warn). Row 5 is poisoned; rows 4-7 share
    its batch and all drop."""
    factory = lambda: FakeTEISession()  # noqa: E731
    out = tei_embed_stage(
        _chunks(spark, poison={5}).coalesce(1),
        "http://tei:80",
        batch_size=4,
        session_factory=factory,
    )
    kept = {r["url"] for r in out.collect()}
    assert kept == {f"http://d/{i}" for i in (0, 1, 2, 3, 8, 9)}


def test_tei_raises_when_all_batches_fail(spark):
    """step.py:270-272: if every row was skipped, the stage fails loudly
    instead of returning an empty 'success'."""
    factory = lambda: FakeTEISession()  # noqa: E731
    with pytest.raises(RuntimeError, match="all 10 embeddings got skipped"):
        tei_embed_stage(
            _chunks(spark, poison=set(range(10))).coalesce(1),
            "http://tei:80",
            batch_size=4,
            session_factory=factory,
        )


def test_tei_unmapped_model_is_fatal():
    """No prefix-mapping match must raise (huggingface.py:186-191's
    UnrecoverableFatalException), not silently embed unprefixed."""
    with pytest.raises(ValueError, match="no prefix mapping"):
        prefix_for_model("all-MiniLM-L6-v2", DEFAULT_PREFIX_MAP)
    assert prefix_for_model("multilingual-e5-large", DEFAULT_PREFIX_MAP) == "query: "


def test_tei_explicit_prefix_skips_discovery(spark, tmp_path):
    """An explicit prefix bypasses /info entirely — offline-configured
    deployments don't need the info endpoint."""
    log = str(tmp_path / "tei_log2")
    factory = lambda: FakeTEISession(model_id="no-mapping-for-this", log_dir=log)  # noqa: E731
    out = tei_embed_stage(
        _chunks(spark, n=3).coalesce(1),
        "http://tei:80",
        prefix="passage: ",
        batch_size=8,
        session_factory=factory,
    ).collect()
    assert len(out) == 3
    calls = read_fake_tei_log(log)
    assert not any(c["path"] == "/info" for c in calls)
    assert all(
        t.startswith("passage: ")
        for c in calls
        if c["path"] == "/embed"
        for t in c["body"]["inputs"]
    )


class _Broken:
    """Driver-side-only transport for the error taxonomy (never pickled)."""

    def __init__(self, mode):
        self.mode = mode

    def request(self, method, url, json=None, timeout=None, **kw):
        if self.mode == "status":
            return FakeHTTPResp(status=503)
        if self.mode == "json":
            return FakeHTTPResp(raw="not json {")
        if self.mode == "conn":
            raise ConnectionError("refused")
        if self.mode == "shape":
            return FakeHTTPResp(body=[[1.0], [2.0]])  # 2 vectors for 1 input
        if self.mode == "noinfo":
            return FakeHTTPResp(body={"version": "1.0"})
        raise AssertionError(self.mode)


def test_tei_client_error_taxonomy():
    """Non-200, bad JSON, transport exceptions, and shape mismatches all
    surface as the skippable EmbeddingAPIError (huggingface.py:96-115);
    /info structure errors are fatal, not skippable."""
    c = TEIClient("http://tei:80", session_factory=lambda: _Broken("status"))
    with pytest.raises(EmbeddingAPIError, match="status_code 503"):
        c.embed(["x"])
    c = TEIClient("http://tei:80", session_factory=lambda: _Broken("json"))
    with pytest.raises(EmbeddingAPIError, match="invalid json"):
        c.embed(["x"])
    c = TEIClient("http://tei:80", session_factory=lambda: _Broken("conn"))
    with pytest.raises(EmbeddingAPIError, match="request failed"):
        c.embed(["x"])
    c = TEIClient("http://tei:80", session_factory=lambda: _Broken("shape"))
    with pytest.raises(EmbeddingAPIError, match="vectors for 1 inputs"):
        c.embed(["x"])
    c = TEIClient("http://tei:80", session_factory=lambda: _Broken("noinfo"))
    with pytest.raises(ValueError, match="missing model_id"):
        c.model_id()


def test_embed_stage_tei_dispatch_matches_contract(spark):
    """embed_stage(backend='tei') produces the same EmbeddingResult shape
    as the hash backend — a user can switch backends without downstream
    changes (the §2.5 contract)."""
    from wurzel_spark.contracts import EMBEDDING_RESULT

    factory = lambda: FakeTEISession()  # noqa: E731
    out = embed_stage(
        _chunks(spark, n=4),
        backend="tei",
        url="http://tei:80",
        session_factory=factory,
    )
    EMBEDDING_RESULT.validate(out)
    hash_out = embed_stage(_chunks(spark, n=4))
    assert out.columns == hash_out.columns
    rows = out.collect()
    assert len(rows) == 4 and all(math.isfinite(r["vector"][0]) for r in rows)
