"""Observability parity with the reference's PrometheusMiddleware
(wurzel/middlewares/prometheus/prometheus.py:70-120) — per-stage gauges

  wurzel_step_input_items / wurzel_step_result_items /
  wurzel_step_duration_seconds / wurzel_step_status /
  wurzel_step_timestamp_seconds / wurzel_step_datacontract_metric

labeled ``(step_name, run_id)`` and pushed to a Prometheus pushgateway.

Spark shape: StageReports (stage.py) already carry rows/seconds per stage;
this module renders them in Prometheus text exposition format and hands the
payload to a pluggable ``push`` callable (HTTP POST to a pushgateway in
production, a file or list in tests). The run_id mirrors WURZEL_RUN_ID
(executors/runtime_context.py): explicit argument > env > Spark application
id — so cron re-runs are distinguishable in the gauge series.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

_GAUGES = (
    "wurzel_step_input_items",
    "wurzel_step_result_items",
    "wurzel_step_duration_seconds",
    "wurzel_step_status",
    "wurzel_step_timestamp_seconds",
)


def resolve_run_id(spark: SparkSession | None = None, run_id: str | None = None) -> str:
    if run_id:
        return run_id
    env = os.environ.get("WURZEL_RUN_ID")
    if env:
        return env
    if spark is not None:
        return spark.sparkContext.applicationId
    return "local"


def _esc(v: str) -> str:
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def render_exposition(
    reports,
    run_id: str,
    now: float | None = None,
    contract_metrics: dict[str, dict[str, float]] | None = None,
) -> str:
    """StageReports → Prometheus text format. ``reports`` is the
    Pipeline.run(with_reports=True) list; rows_out may be None when the
    caller skipped counting (counting costs an action)."""
    ts = now if now is not None else time.time()
    lines: list[str] = []
    for g in _GAUGES:
        lines.append(f"# TYPE {g} gauge")
    for r in reports:
        labels = f'step_name="{_esc(r.stage)}",run_id="{_esc(run_id)}"'
        if r.rows_out is not None:
            lines.append(f"wurzel_step_result_items{{{labels}}} {r.rows_out}")
        lines.append(f"wurzel_step_duration_seconds{{{labels}}} {r.seconds:.6f}")
        lines.append(f"wurzel_step_status{{{labels}}} 1")
        lines.append(f"wurzel_step_timestamp_seconds{{{labels}}} {ts:.3f}")
    for stage, metrics in (contract_metrics or {}).items():
        for metric, value in metrics.items():
            lines.append(
                "wurzel_step_datacontract_metric"
                f'{{step_name="{_esc(stage)}",run_id="{_esc(run_id)}",metric="{_esc(metric)}"}} {value}'
            )
    return "\n".join(lines) + "\n"


def file_pusher(path: str) -> Callable[[str], None]:
    def push(payload: str) -> None:
        with open(path, "w", encoding="utf-8") as f:
            f.write(payload)

    return push


def http_pusher(gateway_url: str, job: str = "wurzel_spark") -> Callable[[str], None]:  # pragma: no cover - needs gateway
    """POST to a Prometheus pushgateway (the reference pushes per step run)."""
    import requests

    def push(payload: str) -> None:
        requests.put(
            f"{gateway_url.rstrip('/')}/metrics/job/{job}",
            data=payload.encode("utf-8"),
            timeout=10,
        ).raise_for_status()

    return push


def push_reports(
    reports,
    push: Callable[[str], None],
    spark: SparkSession | None = None,
    run_id: str | None = None,
    contract_metrics: dict[str, dict[str, float]] | None = None,
) -> str:
    payload = render_exposition(
        reports, resolve_run_id(spark, run_id), contract_metrics=contract_metrics
    )
    push(payload)
    return payload
