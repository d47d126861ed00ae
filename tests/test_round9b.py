"""Round-9 late-session operator tests: t-closeness release, retrieval
nDCG/MRR eval, blocked-Levenshtein entity resolution, market-basket
part affinity, readability scoring."""

import duckdb
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )


def _duck_docs(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR,"
        " lang VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    return con


# --------------------------------------------------- t-closeness release


def _tvd_reference(rows, quasi="source", sensitive="lang"):
    """Exact-Fraction TVD per quasi group, the Li et al. categorical EMD."""
    from collections import Counter
    from fractions import Fraction

    per = Counter((r[2], r[3]) for r in rows)  # (source, lang)
    glob = Counter(r[3] for r in rows)
    n_total = len(rows)
    out = {}
    for src in sorted({r[2] for r in rows}):
        n_g = sum(c for (s, _), c in per.items() if s == src)
        tvd = Fraction(0)
        for lang, c_v in glob.items():
            c_gv = per.get((src, lang), 0)
            tvd += abs(Fraction(c_gv, n_g) - Fraction(c_v, n_total))
        out[src] = tvd / 2
    return out


def test_tcloseness_matches_fraction_reference(spark):
    """The cleared-denominator integer form must equal floor(1000·TVD)
    computed with exact rationals, including groups MISSING some global
    sensitive values (the closed-form absent tail)."""
    from wurzel_spark.operators.textstats import tcloseness_release

    rows = [
        # s0: mirrors the global mixture (low TVD) — 4 en, 2 de, 2 fr
        *[(i, "t", "s0", l, 10) for i, l in enumerate(["en"] * 4 + ["de"] * 2 + ["fr"] * 2)],
        # s1: all-en skew (high TVD, missing de/fr entirely)
        *[(100 + i, "t", "s1", "en", 10) for i in range(8)],
        # s2: inverted mixture
        *[(200 + i, "t", "s2", l, 10) for i, l in enumerate(["de"] * 5 + ["fr"] * 3)],
    ]
    ref = _tvd_reference(rows)
    got = {
        r["source"]: (r["n_docs"], r["max_tvd_permille"])
        for r in tcloseness_release(
            _docs(spark, rows), max_permille=2000  # gate off: raw distances
        ).collect()
    }
    for src, tvd in ref.items():
        assert got[src][1] == int(1000 * tvd), (src, tvd, got[src])


def test_tcloseness_suppression_reconciles_totals(spark):
    """Groups past the threshold coalesce into __suppressed__ and doc
    totals reconcile — the kanon/ldiversity release convention."""
    from wurzel_spark.operators.textstats import tcloseness_release

    rows = [
        *[(i, "t", "s0", l, 10) for i, l in enumerate(["en"] * 4 + ["de"] * 4)],
        *[(100 + i, "t", "skew1", "en", 10) for i in range(8)],
        *[(200 + i, "t", "skew2", "de", 10) for i in range(8)],
    ]
    out = {
        r["source"]: (r["n_docs"], r["n_merged_groups"])
        for r in tcloseness_release(_docs(spark, rows), max_permille=300).collect()
    }
    assert "__suppressed__" in out
    assert out["__suppressed__"] == (16, 2)
    assert sum(n for n, _ in out.values()) == len(rows)


def test_tcloseness_cross_engine_fixture(spark):
    """Planted-skew fixture must hash-identically through the oracle SQL."""
    rows = [
        *[(i, "t", "s0", l, 10) for i, l in enumerate(["en"] * 6 + ["de"] * 3 + ["fr"])],
        *[(100 + i, "t", "s1", "de", 10) for i in range(7)],
        *[(200 + i, "t", "s2", l, 10) for i, l in enumerate(["fr"] * 4 + ["en"] * 4)],
    ]
    from wurzel_spark.operators.textstats import tcloseness_release

    mine = sorted(
        (r["source"], r["n_docs"], r["max_tvd_permille"], r["n_merged_groups"])
        for r in tcloseness_release(_docs(spark, rows)).collect()
    )
    con = _duck_docs(rows)
    oracle = sorted(
        tuple(r) for r in con.execute(e.oracle_sql()["tcloseness_release"]).fetchall()
    )
    assert mine == oracle
