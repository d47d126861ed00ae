"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at the given sf dir, then compares:
  - row count
  - column names (sorted)
  - order-insensitive value equality (rows sorted by all columns), exact
    for non-floats, and for floats both exact-bitwise and a reported max
    absolute deviation so float drift is visible before the driver sees it.

Usage: python tools/verify_local.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")


def to_rows(df_pandas):
    cols = sorted(df_pandas.columns)
    pdf = df_pandas[cols]
    rows = [tuple(norm(v) for v in row) for row in pdf.itertuples(index=False, name=None)]
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # numpy scalars → python
    if hasattr(v, "item") and not isinstance(v, (list, tuple, dict, str, bytes)):
        try:
            return v.item()
        except Exception:
            return v
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(norm(x) for x in v)
    return v


def compare(name, spark_pdf, duck_pdf) -> bool:
    ok = True
    if len(spark_pdf) != len(duck_pdf):
        print(f"  [{name}] ROWCOUNT MISMATCH spark={len(spark_pdf)} duck={len(duck_pdf)}")
        ok = False
    scols, srows = to_rows(spark_pdf)
    dcols, drows = to_rows(duck_pdf)
    if scols != dcols:
        print(f"  [{name}] COLUMN MISMATCH spark={scols} duck={dcols}")
        return False
    if not ok:
        return False
    max_dev = 0.0
    exact = True
    for sr, dr in zip(srows, drows):
        for a, b in zip(sr, dr):
            if a is not None and b is not None and type(a) is not type(b):
                # The driver stringifies values before hashing, so 12 vs 12.0
                # is a hash failure even though Python's == says equal
                # (classic trap: DuckDB SUM(int) → HUGEINT → pandas float64).
                print(
                    f"  [{name}] TYPE MISMATCH {a!r} ({type(a).__name__}) vs"
                    f" {b!r} ({type(b).__name__}) — driver hash WILL fail"
                )
                ok = False
                break
            if a == b:
                continue
            if isinstance(a, float) and isinstance(b, float):
                dev = abs(a - b)
                max_dev = max(max_dev, dev)
                exact = False
                if dev > 1e-6 * max(1.0, abs(a), abs(b)) and dev > 1e-9:
                    print(f"  [{name}] FLOAT DRIFT {a!r} vs {b!r} (dev={dev})")
                    ok = False
            elif isinstance(a, tuple) and isinstance(b, tuple):
                if a != b:
                    print(f"  [{name}] ARRAY MISMATCH {str(a)[:80]} vs {str(b)[:80]}")
                    ok = False
            else:
                print(f"  [{name}] VALUE MISMATCH {a!r} ({type(a).__name__}) vs {b!r} ({type(b).__name__})")
                ok = False
        if not ok:
            break
    if ok and not exact:
        print(f"  [{name}] WARNING: values equal only within tolerance (max_dev={max_dev}) — driver hash may fail")
    return ok


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from wurzel_spark import get_spark

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"pass {name}: rows={len(sdf)} (no oracle — rows-only check)")
            n_pass += 1
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if compare(name, sdf, ddf):
            print(f"pass {name}: rows={len(sdf)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
