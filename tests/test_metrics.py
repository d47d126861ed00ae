"""Prometheus-parity metrics rendering (reference
wurzel/middlewares/prometheus/prometheus.py:70-120)."""

import os

from wurzel_spark.metrics import (
    file_pusher,
    push_reports,
    render_exposition,
    resolve_run_id,
)
from wurzel_spark.stage import StageReport


def test_render_exposition_shape():
    reports = [
        StageReport(stage="Source-Split", rows_out=48, seconds=1.25),
        StageReport(stage="Source-Split-Embed", rows_out=None, seconds=0.5),
    ]
    txt = render_exposition(
        reports,
        run_id="run42",
        now=1000.0,
        contract_metrics={"Source-Split": {"md_char_len": 5400.0}},
    )
    assert '# TYPE wurzel_step_duration_seconds gauge' in txt
    assert 'wurzel_step_result_items{step_name="Source-Split",run_id="run42"} 48' in txt
    assert 'wurzel_step_duration_seconds{step_name="Source-Split",run_id="run42"} 1.250000' in txt
    # rows_out=None -> no result_items line for that stage
    assert 'wurzel_step_result_items{step_name="Source-Split-Embed"' not in txt
    assert (
        'wurzel_step_datacontract_metric{step_name="Source-Split",run_id="run42",metric="md_char_len"} 5400.0'
        in txt
    )


def test_run_id_resolution(spark, monkeypatch):
    assert resolve_run_id(run_id="explicit") == "explicit"
    monkeypatch.setenv("WURZEL_RUN_ID", "from-env")
    assert resolve_run_id() == "from-env"
    monkeypatch.delenv("WURZEL_RUN_ID")
    assert resolve_run_id(spark) == spark.sparkContext.applicationId


def test_file_pusher_roundtrip(tmp_path):
    out = tmp_path / "metrics.prom"
    payload = push_reports(
        [StageReport(stage="S", rows_out=1, seconds=0.1)],
        push=file_pusher(str(out)),
        run_id="r1",
    )
    assert out.read_text() == payload
    assert "wurzel_step_status" in payload


def test_label_escaping():
    txt = render_exposition(
        [StageReport(stage='we"ird\nstage', rows_out=1, seconds=0.0)], run_id="r"
    )
    assert 'we\\"ird\\nstage' in txt


class _FakeResp:
    def __init__(self, status_code=200, text=""):
        self.status_code = status_code
        self.text = text


class _FakeSession:
    def __init__(self, status=200):
        self.calls = []
        self.status = status

    def put(self, url, data=None, headers=None, timeout=None):
        self.calls.append({"url": url, "data": data, "headers": headers, "timeout": timeout})
        return _FakeResp(self.status)


def test_http_pusher_puts_exposition_to_gateway_path():
    from wurzel_spark.metrics import http_pusher

    sess = _FakeSession()
    push = http_pusher(
        "localhost:9091", job="nightly job", grouping={"run_id": "r/1"},
        session_factory=lambda: sess,
    )
    push("wurzel_step_status{} 1\n")
    (call,) = sess.calls
    # scheme prepended, job and grouping segments URL-encoded
    assert call["url"] == "http://localhost:9091/metrics/job/nightly%20job/run_id/r%2F1"
    assert call["data"] == b"wurzel_step_status{} 1\n"
    assert call["headers"]["Content-Type"].startswith("text/plain")


def test_http_pusher_swallows_gateway_failure_by_default():
    import pytest

    from wurzel_spark.metrics import http_pusher

    down = _FakeSession(status=502)
    push = http_pusher("gw:9091", session_factory=lambda: down)
    push("x 1\n")  # must not raise (reference logs a warning)
    strict = http_pusher("gw:9091", session_factory=lambda: down, swallow_errors=False)
    with pytest.raises(RuntimeError):
        strict("x 1\n")


def test_middleware_chain_pushes_through_fake_gateway():
    """End-to-end: prometheus middleware wired with http_pusher over a fake
    transport — the payload that reaches the 'gateway' carries the stage
    gauges (reference parity: middleware __exit__ push_to_gateway)."""
    from wurzel_spark.metrics import http_pusher
    from wurzel_spark.middleware import MiddlewareChain, StepContext, prometheus

    sess = _FakeSession()
    mw = prometheus(push=http_pusher("gw:9091", session_factory=lambda: sess))
    ctx = StepContext("count_stage", {}, run_id="r9")
    assert MiddlewareChain([mw]).execute(ctx, lambda c: "ok") == "ok"
    (call,) = sess.calls
    body = call["data"].decode()
    assert call["url"] == "http://gw:9091/metrics/job/wurzel_spark"
    assert 'step_name="count_stage"' in body
    assert "wurzel_step_duration_seconds" in body
