"""Round-12 optimization probe: time named queries and capture plans.

For each named query (default: the heavy head of BENCH_DETAIL.json) this
runs the bench methodology (untimed warmup, then N timed ``count()``
samples, median + min reported) and optionally a noop-sink sample
(guide §1.4 — computes every column, isolating computation from the
count()'s column pruning), then writes ``plans/<round>/<name>_<tag>.txt`` (--round, default r13)
with the ``explain("formatted")`` output.

Usage:
  python tools/opt_probe.py [--tag before|after] [--noop] [--samples N] name...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wurzel_spark import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--round", default="r13")
    args = ap.parse_args()

    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("opt_probe")
    qs = entry_mod.queries()

    def _gc_tick() -> None:
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    # Warmup all requested queries first (JIT/codegen/footers are session
    # costs, same as bench.py).
    for name in args.names:
        fn = qs.get(name)
        if fn is None:
            print(f"!! unknown query: {name}")
            continue
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        fn(spark, args.sf_dir).count()
        _gc_tick()

    for name in args.names:
        fn = qs.get(name)
        if fn is None:
            continue
        samples = []
        n = 0
        for _ in range(args.samples):
            _gc_tick()
            spark.sparkContext.setJobDescription(f"timed:{name}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
        med = sorted(samples)[len(samples) // 2]
        line = f"{name}: median {med:.3f}s min {min(samples):.3f}s of {[round(s, 3) for s in samples]} ({n} rows)"
        if args.noop:
            _gc_tick()
            spark.sparkContext.setJobDescription(f"noop:{name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            line += f" noop {time.perf_counter() - t0:.3f}s"
        print(line)
        if not args.no_plan:
            df = fn(spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(txt)


if __name__ == "__main__":
    main()
