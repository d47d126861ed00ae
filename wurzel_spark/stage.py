"""Stage & Pipeline: wurzel's TypedStep/DAG re-expressed as DataFrame
composition (SURVEY §7 guiding decisions).

A Stage is (name, in_contract, out_contract, fn: DataFrame -> DataFrame);
sources take SparkSession instead. Chaining stages just composes functions —
the "DAG" is the Catalyst plan, so there is no scheduler, no per-step
process, no mandatory disk round-trip (SURVEY §3.2: the reference's DVC/Argo
compile step becomes a no-op).

What survives from the reference's executor:
  - static composition check (typed_step.py:261-275) → contract compatibility
  - dynamic run-time validation (base_executor.py:322-325) → Contract.validate
  - History lineage (core/history.py:16, stamped into sink payloads,
    qdrant/step.py:99) → a literal `history` column, '-'-joined stage names
  - per-stage reports {inputs, results, time} (base_executor.py:348-362)
    → StageReport
  - deterministic output ordering before persist (base_executor.py:67-87)
    → Pipeline.save orders by the first column
  - optional per-stage Parquet materialization (DVC inspectability /
    incremental re-runs, SURVEY §3.2) → materialize_dir
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wurzel_spark.contracts import Contract, StaticTypeError


@dataclass
class StageReport:
    """Parity with wurzel's StepReport (base_executor.py:53-64)."""

    stage: str
    rows_out: int | None
    seconds: float


@dataclass
class Stage:
    name: str
    fn: Callable[[DataFrame], DataFrame]
    in_contract: Contract | None = None
    out_contract: Contract | None = None

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.in_contract is not None:
            self.in_contract.validate(df)
        out = self.fn(df)
        if self.out_contract is not None:
            self.out_contract.validate(out)
        return out


@dataclass
class Pipeline:
    """A source plus an ordered list of stages.

    ``>>`` appends a stage (wurzel's WZ(StepA) >> WZ(StepB), core/step.py:47-52)
    with the static contract check at composition time.
    """

    source: Callable[[SparkSession], DataFrame]
    stages: list[Stage] = field(default_factory=list)
    reports: list[StageReport] = field(default_factory=list)

    def __rshift__(self, stage: Stage) -> "Pipeline":
        if (
            self.stages
            and self.stages[-1].out_contract is not None
            and stage.in_contract is not None
            and not self.stages[-1].out_contract.is_compatible_with(stage.in_contract)
            and not stage.in_contract.is_compatible_with(self.stages[-1].out_contract)
        ):
            raise StaticTypeError(
                f"cannot chain {self.stages[-1].name} "
                f"({self.stages[-1].out_contract.name}) into {stage.name} "
                f"({stage.in_contract.name})"
            )
        return Pipeline(self.source, [*self.stages, stage], self.reports)

    def history(self) -> str:
        """Lineage string: '-'-joined stage names (core/history.py:16)."""
        return "-".join(s.name for s in self.stages)

    def _stage_key(self, prev_key: str, st: Stage) -> str:
        """Cache key chain: upstream key + stage name + stage fn source.
        Mirrors DVC's dependency checksums (SURVEY §4: stage deps = upstream
        outputs + step source file) — editing a stage's code invalidates its
        cache and everything downstream."""
        import hashlib
        import inspect

        try:
            src = inspect.getsource(st.fn)
        except (OSError, TypeError):  # builtins / C callables / REPL lambdas
            src = st.name
        return hashlib.sha256(f"{prev_key}|{st.name}|{src}".encode()).hexdigest()

    def run(
        self,
        spark: SparkSession,
        materialize_dir: str | None = None,
        with_reports: bool = False,
        incremental: bool = False,
        cache_fingerprint: str = "",
    ) -> DataFrame:
        """Compose all stages into one Catalyst plan.

        With ``materialize_dir``, each stage's output is persisted to
        Parquet and re-read (wurzel's per-step artifact dirs / DVC stage
        cache) — inspectable and incrementally re-runnable, at the cost of
        breaking plan fusion. Default is full fusion.

        With ``incremental=True`` (requires ``materialize_dir``), a stage
        whose stored cache key matches is NOT recomputed — its Parquet
        output is read back instead, and computation resumes at the first
        stage whose key changed. This is the reference's cross-run DVC
        memoization (backend_dvc.py:182-237) without the per-step process
        model. ``cache_fingerprint`` should identify the source inputs
        (e.g. a content/snapshot hash); leaves with always-fresh inputs can
        pass a changing fingerprint (DVC's ``always_changed``).
        """
        df = self.source(spark)
        key = f"src|{cache_fingerprint}"
        for st in self.stages:
            key = self._stage_key(key, st)
            t0 = time.perf_counter()
            if materialize_dir:
                path = os.path.join(materialize_dir, st.name)
                keyfile = os.path.join(path, "_wurzel_cache_key")
                if incremental and os.path.isfile(keyfile):
                    with open(keyfile, encoding="utf-8") as f:
                        if f.read().strip() == key:
                            df = spark.read.parquet(path)
                            if with_reports:
                                self.reports.append(
                                    StageReport(
                                        f"{st.name} (cached)",
                                        df.count() if with_reports else None,
                                        time.perf_counter() - t0,
                                    )
                                )
                            continue
                df = st(df)
                df.write.mode("overwrite").parquet(path)
                # Spark readers ignore underscore-prefixed files in the dir.
                with open(keyfile, "w", encoding="utf-8") as f:
                    f.write(key)
                df = spark.read.parquet(path)
            else:
                df = st(df)
            if with_reports:
                self.reports.append(
                    StageReport(
                        st.name,
                        df.count() if materialize_dir or with_reports else None,
                        time.perf_counter() - t0,
                    )
                )
        return df.withColumn("history", F.lit(self.history()))

    def save(self, df: DataFrame, path: str, fmt: str = "parquet") -> None:
        """Deterministic persist: sort by first column before writing
        (the reference's output-sorting contract, base_executor.py:67-87) —
        makes artifacts content-hash comparable across runs.
        """
        first = df.columns[0]
        df.orderBy(first).write.mode("overwrite").format(fmt).save(path)


def self_consuming_source(
    read_input: Callable[[SparkSession], DataFrame | None],
    own_output_path: str,
) -> Callable[[SparkSession], DataFrame]:
    """SelfConsumingLeafStep parity (wurzel/executors/self_consuming_step.py
    :12-27, base_executor.py:290-297): a leaf that, when its external input
    is unavailable or empty, re-reads its OWN previous persisted output —
    the reference uses this for sources whose upstream is flaky (keep
    serving yesterday's corpus rather than emptying the knowledge base).

    ``read_input`` returns None (or raises) when no fresh input exists.
    """

    def src(spark: SparkSession) -> DataFrame:
        try:
            df = read_input(spark)
        except Exception:  # noqa: BLE001 - unavailable input falls back
            df = None
        if df is not None and len(df.take(1)) > 0:
            return df
        return spark.read.parquet(own_output_path)

    return src
