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
