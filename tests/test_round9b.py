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


# --------------------------------------------------- retrieval nDCG eval


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ndcg_perfect_ranking_is_1000(spark):
    """A query whose same-label candidates dominate the cosine ranking
    exactly in ideal order must score ndcg=1000 and rr=1000000."""
    from wurzel_spark.operators.similarity import retrieval_ndcg_eval

    dim = 64

    def vec(x, y):
        v = [0.0] * dim
        v[0], v[1] = x, y
        return v

    rows = [(0, vec(1.0, 0.0), 5)]
    # 3 same-label candidates closest, then 2 adjacent, then junk
    rows += [(10 + i, vec(1.0, 0.01 * (i + 1)), 5) for i in range(3)]
    rows += [(20 + i, vec(1.0, 0.2 * (i + 1)), 6) for i in range(2)]
    rows += [(30 + i, vec(0.0, 1.0), 9) for i in range(5)]
    out = retrieval_ndcg_eval(_emb(spark, rows), n_queries=1).collect()
    assert len(out) == 1
    r = out[0]
    assert r["ndcg_permille"] == 1000
    assert r["rr_micros"] == 1_000_000


def test_ndcg_matches_python_reference(spark):
    """Integer DCG/IDCG/MRR must equal a direct Python recomputation with
    the shared discount table on a deterministic mixed fixture."""
    from wurzel_spark.operators.similarity import (
        NDCG_DISCOUNTS,
        NDCG_K,
        retrieval_ndcg_eval,
    )

    dim = 64

    def vec(seed):
        # deterministic, irregular but reproducible components
        return [((seed * 37 + j * 13) % 97 - 48) / 48.0 for j in range(dim)]

    rows = [(i, vec(i), (i * 7) % 5) for i in range(40)]
    out = {r["query_id"]: r for r in retrieval_ndcg_eval(_emb(spark, rows), n_queries=3).collect()}

    import math

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for qid in range(3):
        qvec, qlbl = vec(qid), (qid * 7) % 5
        cands = []
        for i in range(40):
            if i == qid:
                continue
            lbl = (i * 7) % 5
            rel = 2 if lbl == qlbl else (1 if abs(lbl - qlbl) == 1 else 0)
            cands.append((i, rel, cos(vec(i), qvec)))
        by_cos = sorted(cands, key=lambda t: (-t[2], t[0]))
        by_rel = sorted(cands, key=lambda t: (-t[1], t[0]))
        dcg = sum(
            rel * NDCG_DISCOUNTS[rank] for rank, (_, rel, _c) in enumerate(by_cos[:NDCG_K])
        )
        idcg = sum(
            rel * NDCG_DISCOUNTS[rank] for rank, (_, rel, _c) in enumerate(by_rel[:NDCG_K])
        )
        best = next((rank + 1 for rank, (_, rel, _c) in enumerate(by_cos) if rel >= 1), None)
        r = out[qid]
        assert r["dcg_q"] == dcg and r["idcg_q"] == idcg
        assert r["ndcg_permille"] == (1000 * dcg) // idcg
        assert r["rr_micros"] == (1_000_000 // best if best else 0)


def test_ndcg_no_relevant_candidates_is_null(spark):
    """A query with zero relevant candidates: idcg=0 -> NULL ndcg, rr=0."""
    from wurzel_spark.operators.similarity import retrieval_ndcg_eval

    dim = 64
    rows = [(0, [1.0] + [0.0] * (dim - 1), 0)]
    rows += [(10 + i, [0.5] * dim, 9) for i in range(6)]
    r = retrieval_ndcg_eval(_emb(spark, rows), n_queries=1).collect()[0]
    assert r["idcg_q"] == 0 and r["ndcg_permille"] is None and r["rr_micros"] == 0


# ------------------------------------------ blocked-Levenshtein entities


def _parts(spark, names):
    return spark.createDataFrame(
        [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    )


def test_name_edit_pairs_planted_typos(spark):
    """Planted single-edit typos inside a block match; cross-block pairs
    (different last token) are the documented blocking misses."""
    from wurzel_spark.operators.dedup import name_edit_near_pairs

    names = ["cold gear", "old gear", "cold gears", "red bolt", "red bol",
             "cold widget", "wold gear"]
    # multiplicity: "cold gear" appears 3x
    df = _parts(spark, names + ["cold gear", "cold gear"])
    out = {(r["name_a"], r["name_b"]): (r["edit_distance"], r["n_rows_a"], r["n_rows_b"])
           for r in name_edit_near_pairs(df).collect()}
    assert out[("cold gear", "old gear")][0] == 1
    assert out[("cold gear", "old gear")][1] == 3  # multiplicity carried
    assert out[("cold gear", "wold gear")][0] == 1
    assert out[("old gear", "wold gear")][0] == 1  # insert 'w'
    # same block, distance 2 via suffix... "cold gears" is blk="gears": MISS
    assert not any("cold gears" in k for k in out)
    # "red bol" blocks under "bol" — cross-block miss despite distance 1
    assert not any("red bol" in k for k in out)
    # widget shares no block partner
    assert not any("cold widget" in k for k in out)


def test_entity_blocking_stats_counts(spark):
    """Candidate/matched/reduction arithmetic on a hand-countable fixture."""
    from wurzel_spark.operators.dedup import entity_blocking_stats

    names = ["cold gear", "old gear", "bold gear", "red bolt", "red belt"]
    r = entity_blocking_stats(_parts(spark, names)).collect()[0]
    assert r["n_rows"] == 5 and r["n_names"] == 5
    assert r["n_blocks"] == 3  # gear, bolt, belt
    assert r["n_blocks_capped"] == 0
    assert r["n_candidate_pairs"] == 3  # the gear block's C(3,2)
    assert r["n_matched_pairs"] == 3   # all within distance 2 of each other
    assert r["reduction_permille"] == (2000 * 3) // (5 * 4)


def test_entity_block_cap_excludes_megablock(spark):
    """Blocks past the cap are excluded wholesale and counted."""
    from wurzel_spark.operators.dedup import (
        entity_blocking_stats,
        name_edit_near_pairs,
    )

    names = [f"v{i:04d} mega" for i in range(30)] + ["red bolt", "red bol6"]
    df = _parts(spark, names)
    pairs = name_edit_near_pairs(df, block_cap=10).collect()
    assert {(p["name_a"], p["name_b"]) for p in pairs} == set()  # bolt/bol6 differ in blk
    stats = entity_blocking_stats(df, block_cap=10).collect()[0]
    assert stats["n_blocks_capped"] == 1
    assert stats["n_candidate_pairs"] == 0


def test_entity_cross_engine_fixture(spark):
    """Planted-typo fixture matches the oracle SQL bit-for-bit."""
    from wurzel_spark.operators.dedup import name_edit_near_pairs

    names = ["cold plate", "old plate", "gold plate", "cool plate",
             "red rod", "red root", "blue gizmo"] * 2
    df = _parts(spark, names)
    mine = [
        (r["name_a"], r["name_b"], r["edit_distance"], r["n_rows_a"], r["n_rows_b"])
        for r in name_edit_near_pairs(df).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE part(p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR,"
        " p_type VARCHAR, p_size INT, p_retailprice DOUBLE)"
    )
    con.executemany(
        "INSERT INTO part VALUES (?,?,?,?,?,?)",
        [(i, n, "B", "T", 1, 1.0) for i, n in enumerate(names)],
    )
    oracle = [tuple(r) for r in con.execute(e.oracle_sql()["name_edit_near_pairs"]).fetchall()]
    assert mine == oracle and len(mine) >= 3


# --------------------------------------------- market-basket part affinity


def test_part_affinity_hand_computed(spark, tmp_path):
    """Lift/support arithmetic on a hand-countable basket fixture."""
    from wurzel_spark.queries.relational import part_affinity_pairs

    rows = []
    # 4 orders; parts 1&2 co-occur in 3 of them; part 3 alone in one
    baskets = {10: [1, 2], 11: [1, 2], 12: [1, 2, 3], 13: [3]}
    ln = 0
    for ok, parts in baskets.items():
        for p in parts:
            ln += 1
            rows.append((ok, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    d = tmp_path / "lineitem.parquet"
    df.coalesce(1).write.parquet(str(d))
    import shutil, glob, os
    # table() reads <dir>/lineitem.parquet as a file-or-dir path; the dir form works
    out = part_affinity_pairs(spark, str(tmp_path)).collect()
    by_pair = {(r["part_a"], r["part_b"]): r for r in out}
    r12 = by_pair[(1, 2)]
    assert r12["n_ab"] == 3 and r12["n_a"] == 3 and r12["n_b"] == 3
    assert r12["support_permille"] == (1000 * 3) // 4
    assert r12["lift_permille"] == (1000 * 3 * 4) // (3 * 3)  # 1333
    r13 = by_pair[(1, 3)]
    assert r13["n_ab"] == 1 and r13["lift_permille"] == (1000 * 1 * 4) // (3 * 2)


def test_part_affinity_basket_cap_prunes_megabasket(spark, tmp_path):
    """A basket past BASKET_CAP contributes only its first cap items (by
    partkey) — the pathological-basket guard; and the plan carries the
    pre-shuffle WindowGroupLimit prune."""
    import wurzel_spark.queries.relational as R

    rows = []
    ln = 0
    for p in range(100):  # one mega-order with 100 distinct parts
        ln += 1
        rows.append((1, p, 1, ln, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    rows.append((2, 0, 1, ln + 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = R.part_affinity_pairs(spark, str(tmp_path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    pairs = out.collect()
    # parts >= BASKET_CAP never appear
    assert all(r["part_a"] < R.BASKET_CAP and r["part_b"] < R.BASKET_CAP for r in pairs)


# ---------------------------------------------------- readability battery


def test_readability_hand_computed(spark):
    """Flesch/FK milli-unit integer formulas on a hand-countable doc."""
    from wurzel_spark.operators.textstats import readability_stats

    text = "The cat sat. The dog ran!"
    # words: The cat sat The dog ran = 6; syllables (vowel groups) = 6;
    # sentences: '.' and '!' = 2
    w, y, s = 6, 6, 2
    flesch = 206835 - (1015 * w) // s - (84600 * y) // w
    grade = (390 * w) // s + (11800 * y) // w - 15590
    r = readability_stats(_docs(spark, [(1, text, "s0", "en", len(text))])).collect()[0]
    assert r["n_docs"] == 1 and r["n_unscored"] == 0
    assert r["sum_flesch_milli"] == flesch
    assert r["sum_grade_milli"] == grade
    assert (r["n_easy"], r["n_standard"], r["n_hard"]) == (1, 0, 0)


def test_readability_unscored_and_bands(spark):
    """Zero-word docs count as unscored; a vowel-dense one-sentence wall
    lands in the hard band; cross-engine equality on the mixed fixture."""
    from wurzel_spark.operators.textstats import readability_stats

    hard = ("extraordinarily " * 40).strip()  # 40 long words, 1 sentence floor
    rows = [
        (1, "The cat sat. The dog ran!", "s0", "en", 25),
        (2, "12345 !!!", "s0", "en", 9),          # no words -> unscored
        (3, hard, "s0", "en", len(hard)),
        (4, None, "s1", "en", 0),                  # NULL text -> unscored
    ]
    out = {r["source"]: r for r in readability_stats(_docs(spark, rows)).collect()}
    assert out["s0"]["n_docs"] == 3 and out["s0"]["n_unscored"] == 1
    assert out["s0"]["n_hard"] == 1 and out["s0"]["n_easy"] == 1
    assert out["s1"]["n_unscored"] == 1
    con = _duck_docs(rows)
    oracle = [tuple(r) for r in con.execute(e.oracle_sql()["readability_stats"]).fetchall()]
    mine = [tuple(r) for r in readability_stats(_docs(spark, rows)).collect()]
    assert mine == oracle


def test_streaming_readability_matches_batch(spark, tmp_path):
    from wurzel_spark.operators.textstats import readability_stats
    from wurzel_spark.streaming.readability import readability_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "rd_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = [
        tuple(r)
        for r in readability_stream(
            stream, str(tmp_path / "rd_state"), str(tmp_path / "rd_ckpt"),
            compact_every=2,
        ).collect()
    ]
    exp = [tuple(r) for r in readability_stats(docs).collect()]
    assert got == exp and len(got) > 0


def test_streaming_readability_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.operators.textstats import readability_partials
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.readability import drain_readability_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "rd_replay")

    def _stage(df, bid):
        mine = readability_partials(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(spark, mine, state, bid, ["src_batch", "source"], None)

    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)
    once = [tuple(r) for r in drain_readability_state(spark, state).collect()]
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)  # replay
    got = [tuple(r) for r in drain_readability_state(spark, state).collect()]
    assert got == once and len(once) > 0


# --------------------------------------------- CUSUM change-point detection


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_cusum_matches_python_recursion(spark, tmp_path):
    """The window closed form must equal the literal Page recursion
    S_h = max(0, S_{h-1} + dev_h) on a planted level-shift series."""
    import datetime as dt
    from wurzel_spark.queries.events import event_cusum_drift

    # 12 hours at rate 2, then 12 hours at rate 10 — an upward shift
    counts = [2] * 12 + [10] * 12
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for k in range(c):
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1, h), 1, "click", 1.0, None))
    _events(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = event_cusum_drift(spark, str(tmp_path)).collect()

    t = sum(counts)
    h_n = len(counts)
    s_up = s_dn = 0
    for i, r in enumerate(out):
        dev = counts[i] * h_n - t
        s_up = max(0, s_up + dev)
        s_dn = max(0, s_dn - dev)
        assert r["n_events"] == counts[i]
        assert r["cusum_up_permille"] == (1000 * s_up) // (t * h_n), i
        assert r["cusum_dn_permille"] == (1000 * s_dn) // (t * h_n), i
    # with a retrospective mean, early low-rate hours drift the DOWNWARD
    # arm (that IS a level difference); the UPWARD arm must stay quiet
    # until the shift and fire after it
    up = [r["cusum_up_permille"] for r in out]
    assert all(v == 0 for v in up[:12])
    assert up[-1] > 0
    assert any(r["drift_flag"] for r in out[12:])


def test_cusum_flat_series_never_flags(spark, tmp_path):
    """A constant-rate series has dev=0 everywhere: statistic 0, no flag."""
    import datetime as dt
    from wurzel_spark.queries.events import event_cusum_drift

    rows = []
    eid = 0
    for h in range(24):
        for k in range(5):
            eid += 1
            rows.append((eid, dt.datetime(2024, 2, 1, h), 1, "view", 1.0, None))
    _events(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = event_cusum_drift(spark, str(tmp_path)).collect()
    assert all(
        r["cusum_up_permille"] == 0
        and r["cusum_dn_permille"] == 0
        and not r["drift_flag"]
        for r in out
    )


def test_cusum_downward_shift_flags_dn(spark, tmp_path):
    """A rate DROP trips the downward detector, not the upward one."""
    import datetime as dt
    from wurzel_spark.queries.events import event_cusum_drift

    counts = [10] * 12 + [1] * 12
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        for k in range(c):
            eid += 1
            rows.append((eid, dt.datetime(2024, 3, 1, h), 1, "buy", 1.0, None))
    _events(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = event_cusum_drift(spark, str(tmp_path)).collect()
    last = out[-1]
    assert last["cusum_dn_permille"] > last["cusum_up_permille"]
    assert any(r["drift_flag"] for r in out[12:])


# ------------------------------------------------- magic-byte sniffing audit


def test_magic_signatures_fire_on_real_prefixes(spark):
    """Each container signature fires on a planted real magic prefix, and
    the declared-mime cross-check flags mislabels."""
    from wurzel_spark.operators.multimodal import magic_byte_stats

    def asset(aid, kind, mime, content):
        return (aid, kind, bytearray(content), {"mime": mime, "width": 1,
                "height": 1, "duration_ms": 1, "sample_rate": 1})

    rows = [
        asset(1, "image", "image/jpeg", b"\xff\xd8\xff\xe0rest"),
        asset(2, "image", "image/png", b"\x89PNG\r\n\x1a\nrest"),
        asset(3, "image", "image/gif", b"GIF89a..."),
        asset(4, "audio", "audio/wav", b"RIFF\x00\x00\x00\x00WAVEfmt "),
        asset(5, "video", "video/mp4", b"\x00\x00\x00\x18ftypisom...."),
        asset(6, "doc", "application/pdf", b"%PDF-1.7 ..."),
        asset(7, "blob", "application/gzip", b"\x1f\x8b\x08rest"),
        asset(8, "blob", "application/zip", b"PK\x03\x04rest"),
        asset(9, "audio", "audio/ogg", b"OggS\x00rest"),
        # mislabeled: declared png, actually jpeg
        asset(10, "image", "image/png", b"\xff\xd8\xff\xe1exif"),
        # html error page saved as jpeg
        asset(11, "image", "image/jpeg", b"<html>404</html>"),
        # PNM family: binary PPM correctly declared, and a PGM
        # mislabeled as png
        asset(12, "image", "image/x-portable-pixmap", b"P6\n2 2\n255\nxxxx"),
        asset(13, "image", "image/png", b"P5\n1 1\n255\n\x00"),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id long, kind string, content binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:bigint,sample_rate:int>",
    )
    out = {(r["kind"], r["mime"], r["detected"]): r for r in magic_byte_stats(df).collect()}
    assert out[("image", "image/jpeg", "jpeg")]["mime_match"] is True
    assert out[("image", "image/png", "png")]["mime_match"] is True
    assert out[("image", "image/x-portable-pixmap", "pnm")]["mime_match"] is True
    assert out[("image", "image/png", "pnm")]["mime_match"] is False
    assert out[("image", "image/gif", "gif")]["mime_match"] is True
    assert out[("audio", "audio/wav", "wav")]["mime_match"] is True
    assert out[("video", "video/mp4", "mp4")]["mime_match"] is True
    assert out[("doc", "application/pdf", "pdf")]["mime_match"] is True
    assert out[("blob", "application/gzip", "gzip")]["n_assets"] == 1
    assert out[("blob", "application/zip", "zip")]["n_assets"] == 1
    assert out[("audio", "audio/ogg", "ogg")]["mime_match"] is True
    assert out[("image", "image/png", "jpeg")]["mime_match"] is False
    assert out[("image", "image/jpeg", "unknown")]["mime_match"] is False


def test_magic_riff_without_wave_is_riff(spark):
    """RIFF container that is not WAVE (e.g. AVI) detects as riff, and a
    NULL content row lands in unknown — no crash."""
    from wurzel_spark.operators.multimodal import magic_byte_stats

    rows = [
        (1, "video", bytearray(b"RIFF\x00\x00\x00\x00AVI LIST"),
         {"mime": "video/avi", "width": 1, "height": 1, "duration_ms": 1,
          "sample_rate": 1}),
        (2, "video", None,
         {"mime": "video/mp4", "width": 1, "height": 1, "duration_ms": 1,
          "sample_rate": 1}),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id long, kind string, content binary,"
        " meta struct<mime:string,width:int,height:int,duration_ms:bigint,sample_rate:int>",
    )
    out = {r["detected"]: r for r in magic_byte_stats(df).collect()}
    assert out["riff"]["n_assets"] == 1 and out["riff"]["mime_match"] is False
    assert out["unknown"]["n_assets"] == 1


# --------------------------------------------------- Benford digit audit


def test_benford_table_matches_log10():
    """The shared permille table IS floor(1000·log10(1+1/d))."""
    import math
    from wurzel_spark.queries.relational import BENFORD_PERMILLE

    assert BENFORD_PERMILLE == [int(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)]
    # floors round down, so the 9 floored shares sum just under 1000
    assert BENFORD_PERMILLE[0] == 301 and sum(BENFORD_PERMILLE) == 995


def test_benford_hand_computed(spark, tmp_path):
    """Digit histogram + exclusions on a hand-built price list."""
    from wurzel_spark.queries.relational import benford_value_audit

    prices = [1.23, 19.99, 150.0, 0.17, 2.5, 9.01, -3.0, 0.0]
    # cents: 123, 1999, 15000, 17, 250, 901 -> digits 1,1,1,1,2,9; excluded: -300, 0
    rows = [
        (1, 1, 1, i + 1, 1.0, p, 0.0, 0.0, "N", "O", None)
        for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["digit"]: r for r in benford_value_audit(spark, str(tmp_path)).collect()}
    assert out[1]["n_values"] == 4 and out[2]["n_values"] == 1 and out[9]["n_values"] == 1
    assert out[1]["obs_permille"] == (1000 * 4) // 6
    assert out[1]["exp_permille"] == 301
    assert out[1]["n_excluded"] == 2
    assert out[1]["dev_permille"] == out[1]["obs_permille"] - 301


# ---------------------------------------------------- per-doc TF-IDF keywords


def test_tfidf_keywords_hand_computed(spark):
    """score_q = tf * floor(ln((N+1)/(df+1))*2^20) on a tiny corpus, with
    corpus-global df including docs OUTSIDE the audit slice."""
    import math
    from wurzel_spark.operators.textstats import doc_tfidf_keywords

    rows = [
        (0, "apple apple banana cherry", "s", "en", 25),
        (1, "banana cherry cherry", "s", "en", 20),
        # outside the slice (doc_id >= 50) but inside the df universe
        (60, "banana banana date", "s", "en", 18),
        (61, "cherry date", "s", "en", 11),
    ]
    out = {(r["doc_id"], r["term"]): r for r in
           doc_tfidf_keywords(_docs(spark, rows)).collect()}
    n = 4

    def q(dfc):
        return math.floor(math.log((n + 1.0) / (dfc + 1.0)) * (1 << 20))

    # doc 0: apple tf=2 df=1, banana tf=1 df=3, cherry tf=1 df=3
    assert out[(0, "apple")]["score_q"] == 2 * q(1)
    assert out[(0, "banana")]["score_q"] == 1 * q(3)
    assert out[(0, "banana")]["dfc"] == 3
    # rank 1 must be apple (highest score); banana/cherry tie broken by term
    assert out[(0, "apple")]["rank"] == 1
    assert out[(0, "banana")]["rank"] == 2 and out[(0, "cherry")]["rank"] == 3
    # docs outside the slice never emit rows
    assert not any(d >= 50 for d, _ in out)


def test_tfidf_keywords_cross_engine(spark):
    """Fixture equality through the oracle SQL (ln quantization shared)."""
    from wurzel_spark.operators.textstats import doc_tfidf_keywords

    rows = [
        (0, "alpha beta beta gamma", "s", "en", 20),
        (1, "beta gamma gamma delta", "s", "en", 21),
        (70, "alpha delta epsilon", "s", "en", 19),
    ]
    mine = [tuple(r) for r in doc_tfidf_keywords(_docs(spark, rows)).collect()]
    con = _duck_docs(rows)
    oracle = [tuple(r) for r in con.execute(e.oracle_sql()["doc_tfidf_keywords"]).fetchall()]
    assert mine == oracle and len(mine) > 0


# ------------------------------------------------------- Hilbert layout


def _xy2d_ref(bits, x, y):
    """Canonical xy2d reference (Wikipedia form)."""
    n = 1 << bits
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_index_matches_reference(spark):
    """The unrolled SQL walk equals the canonical xy2d on a full 3-bit
    grid AND on scattered 16-bit points."""
    from wurzel_spark.operators.layout import hilbert_index

    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = hilbert_index(df.selectExpr("x AS px", "y AS py", "x", "y"), bits=3)
    vals = {(r["px"], r["py"]): r["h"] for r in out.collect()}
    for x, y in pts:
        assert vals[(x, y)] == _xy2d_ref(3, x, y), (x, y)

    big = [(12345, 54321), (0, 0), (65535, 65535), (65535, 0), (1, 65534)]
    dfb = spark.createDataFrame(big, "x long, y long")
    outb = hilbert_index(dfb.selectExpr("x AS px", "y AS py", "x", "y"), bits=16)
    valsb = {(r["px"], r["py"]): r["h"] for r in outb.collect()}
    for x, y in big:
        assert valsb[(x, y)] == _xy2d_ref(16, x, y), (x, y)


def test_hilbert_curve_is_continuous(spark):
    """Consecutive Hilbert indices are grid-neighbors (|dx|+|dy| = 1) —
    the property Morton z-order lacks and the reason Hilbert buckets
    have no jump discontinuities."""
    from wurzel_spark.operators.layout import hilbert_index

    bits = 3
    pts = [(x, y) for x in range(8) for y in range(8)]
    df = spark.createDataFrame(pts, "x long, y long")
    out = hilbert_index(df.selectExpr("x AS px", "y AS py", "x", "y"), bits=bits)
    byd = {r["h"]: (r["px"], r["py"]) for r in out.collect()}
    assert sorted(byd) == list(range(64))
    for d in range(63):
        (x1, y1), (x2, y2) = byd[d], byd[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, d


def test_hilbert_buckets_tighter_than_zorder(spark):
    """On the real sf0.001 lineitem grid the Hilbert buckets' summed max
    span must not exceed the z-order buckets' (locality dominance on
    this data — the reason to pay for the longer index walk)."""
    from wurzel_spark.operators.layout import hilbert_layout_stats, zorder_layout_stats
    from wurzel_spark.tables import table as _table

    li = _table(spark, "/root/testdata/sf0.001", "lineitem")
    hil = hilbert_layout_stats(li, "l_partkey", "l_suppkey").collect()
    zed = zorder_layout_stats(li, "l_partkey", "l_suppkey").collect()
    h_span = sum(r["span_a"] + r["span_b"] for r in hil)
    z_span = sum(r["span_a"] + r["span_b"] for r in zed)
    assert h_span <= z_span, (h_span, z_span)


# ------------------------------------------- KS two-sample length drift


def test_ks_matches_python_reference(spark):
    """Integer KS permille equals a direct two-sample D computation
    (source vs rest) with exact fractions on a planted-shift fixture."""
    from fractions import Fraction
    from wurzel_spark.operators.textstats import ks_length_drift

    rows = []
    # s0: lengths 10..29; s1: same distribution; s2: shifted +100
    for i in range(20):
        rows.append((i, "t", "s0", "en", 10 + i))
        rows.append((100 + i, "t", "s1", "en", 10 + i))
        rows.append((200 + i, "t", "s2", "en", 110 + i))
    out = {r["source"]: r for r in ks_length_drift(_docs(spark, rows)).collect()}

    def ks(src):
        mine = sorted(v for _, _, s, _, v in rows if s == src)
        rest = sorted(v for _, _, s, _, v in rows if s != src)
        grid = sorted(set(mine) | set(rest))
        d = Fraction(0)
        for v in grid:
            cg = sum(1 for x in mine if x <= v)
            cr = sum(1 for x in rest if x <= v)
            d = max(d, abs(Fraction(cg, len(mine)) - Fraction(cr, len(rest))))
        return d

    for src in ("s0", "s1", "s2"):
        assert out[src]["ks_permille"] == int(1000 * ks(src)), src
    # the fully-disjoint source saturates at D=1; one-vs-REST also flags
    # s0/s1 (their rest contains the shifted s2 - D=0.5), by design
    assert out["s2"]["ks_permille"] == 1000 and out["s2"]["drift_flag"] is True
    assert out["s0"]["ks_permille"] < out["s2"]["ks_permille"]


def test_ks_cross_engine_fixture(spark):
    rows = [(i, "t", f"s{i % 3}", "en", (i * 13) % 50 + (100 if i % 3 == 2 else 0))
            for i in range(60)]
    from wurzel_spark.operators.textstats import ks_length_drift

    mine = [tuple(r) for r in ks_length_drift(_docs(spark, rows)).collect()]
    con = _duck_docs(rows)
    oracle = [tuple(r) for r in con.execute(e.oracle_sql()["ks_length_drift"]).fetchall()]
    assert mine == oracle


# --------------------------------------------------- RFM segmentation


def test_rfm_hand_computed(spark, tmp_path):
    """Quintile formula + segment labels on a 10-customer fixture."""
    import datetime as dt
    from wurzel_spark.queries.relational import rfm_segments

    rows = []
    ok = 0
    # customer k: k+1 orders, each 100*(k+1) cents, last date advancing
    for k in range(10):
        for j in range(k + 1):
            ok += 1
            rows.append((ok, k, "O", (k + 1) * 1.0,
                         dt.datetime(2024, 1, 1 + k), "1-URGENT"))
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    out = rfm_segments(spark, str(tmp_path)).collect()
    # customer k has rank k+1 on every metric -> score 1+(5k)//10
    from collections import Counter
    expected = Counter()
    for k in range(10):
        s = 1 + (5 * k) // 10
        expected[(s, s, s)] += 1
    got = {(r["r_score"], r["f_score"], r["m_score"]): r["n_customers"] for r in out}
    assert got == dict(expected)
    # the top customer lands in champion, the bottom in lost
    labels = {(r["r_score"], r["f_score"], r["m_score"]): r["segment"] for r in out}
    assert labels[(5, 5, 5)] == "champion" and labels[(1, 1, 1)] == "lost"
    # monetary cents are exact integer sums of floored per-order cents
    cents = {(r["r_score"], r["f_score"], r["m_score"]): r["total_cents"] for r in out}
    # bucket (5,5,5) holds customers 8 and 9: 9x9.00 + 10x10.00
    assert cents[(5, 5, 5)] == 9 * 900 + 10 * 1000


# --------------------------------------------- streaming t-closeness twin


def test_streaming_tcloseness_matches_batch(spark, tmp_path):
    from wurzel_spark.operators.textstats import tcloseness_release
    from wurzel_spark.streaming.tcloseness import tcloseness_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "tc_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = [
        tuple(r)
        for r in tcloseness_stream(
            stream, str(tmp_path / "tc_state"), str(tmp_path / "tc_ckpt"),
            compact_every=2,
        ).collect()
    ]
    exp = [tuple(r) for r in tcloseness_release(docs).collect()]
    assert got == exp and len(got) > 0


def test_streaming_tcloseness_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.operators.textstats import tcloseness_partials
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.tcloseness import drain_tcloseness_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "tc_replay")

    def _stage(df, bid):
        mine = tcloseness_partials(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(spark, mine, state, bid, ["src_batch", "source", "lang"], None)

    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)
    once = [tuple(r) for r in drain_tcloseness_state(spark, state).collect()]
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)  # replay
    got = [tuple(r) for r in drain_tcloseness_state(spark, state).collect()]
    assert got == once and len(once) > 0


# --------------------------------------------- session path trigrams


def test_path_trigrams_hand_counted(spark, tmp_path):
    """Trigram counts with session-gap breaks on a scripted user."""
    import datetime as dt
    from wurzel_spark.queries.events import event_path_trigrams

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    seq = [
        ("view", 0), ("click", 10), ("buy", 20),        # view>click>buy
        ("view", 30), ("click", 40),                     # click>view? no: buy>view>click, view>click? need 3
        ("view", 7200),                                  # session break: gap > 30min
        ("click", 7210), ("buy", 7220),                  # view>click>buy again
    ]
    rows = [
        (i + 1, t0 + dt.timedelta(seconds=s), 1, et, 1.0, None)
        for i, (et, s) in enumerate(seq)
    ]
    _events(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {(r["t1"], r["t2"], r["t3"]): r["n_paths"]
           for r in event_path_trigrams(spark, str(tmp_path)).collect()}
    # continuous prefix: view,click,buy,view,click -> trigrams
    # (view,click,buy), (click,buy,view), (buy,view,click)
    # after the break: view,click,buy -> (view,click,buy)
    assert out[("view", "click", "buy")] == 2
    assert out[("click", "buy", "view")] == 1
    assert out[("buy", "view", "click")] == 1
    # nothing spans the 2h gap
    assert ("view", "click", "view") not in out and ("click", "view", "click") not in out


# --------------------------------------------------- FD violation profiler


def test_fd_profiler_hand_counted(spark, tmp_path):
    """Violating-group/g3 accounting on a planted near-FD."""
    from wurzel_spark.queries.relational import fd_violation_stats
    import wurzel_spark.queries.relational as R

    # monkeypatch-free: write a tiny part table and restrict candidates
    parts = [
        (1, "red bolt", "B1", "T1", 1, 1.0),
        (2, "red bolt", "B1", "T1", 1, 1.0),
        (3, "red bolt", "B2", "T1", 1, 1.0),   # name->brand violated (B1x2, B2x1)
        (4, "blue gear", "B3", "T2", 1, 1.0),
        (5, "blue gear", "B3", "T2", 1, 1.0),
    ]
    spark.createDataFrame(
        parts,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).coalesce(1).write.parquet(str(tmp_path / "part.parquet"))
    cust = [(1, "c", 1, 1.0, "SEG")]
    spark.createDataFrame(
        cust,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    out = {r["fd"]: r for r in fd_violation_stats(spark, str(tmp_path)).collect()}
    r = out["part.p_name->p_brand"]
    assert r["n_groups"] == 2 and r["n_violating_groups"] == 1
    assert r["n_rows_in_violations"] == 3
    # g3 keep: plurality of the violating group (B1, 2 rows) + clean group (2)
    assert r["g3_keep_permille"] == (1000 * (2 + 2)) // 5
    # name->type holds exactly
    assert out["part.p_name->p_type"]["n_violating_groups"] == 0
    assert out["part.p_name->p_type"]["g3_keep_permille"] == 1000


# --------------------------------------------------- IQR outlier audit


def test_iqr_outliers_hand_computed(spark, tmp_path):
    """Quartile ranks and Tukey fences on a hand-built distribution."""
    from wurzel_spark.queries.relational import iqr_outlier_stats

    # 20 clustered values + one fat-finger magnitude
    prices = [10.0 + i * 0.1 for i in range(20)] + [1000.0]
    rows = [
        (i + 1, 1, 1, i + 1, 1.0, p, 0.0, 0.0, "N", "O", None)
        for i, p in enumerate(prices)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    r = iqr_outlier_stats(spark, str(tmp_path)).collect()[0]
    import math
    cents = sorted(int(math.floor(p * 100)) for p in prices)
    n = len(cents)
    q1 = cents[math.ceil(0.25 * n) - 1]
    q3 = cents[math.ceil(0.75 * n) - 1]
    lo = sum(1 for c in cents if 4 * c < 4 * q1 - 6 * (q3 - q1))
    hi = sum(1 for c in cents if 4 * c > 4 * q3 + 6 * (q3 - q1))
    assert (r["q1_cents"], r["q3_cents"]) == (q1, q3)
    assert (r["n_low_outliers"], r["n_high_outliers"]) == (lo, hi)
    assert hi == 1  # the fat finger
    assert r["outlier_permille"] == (1000 * (lo + hi)) // n


# --------------------------------------------- Mann-Kendall trend test


def test_mannkendall_matches_python_reference(spark, tmp_path):
    """S and tau equal the literal pairwise definition on planted rising,
    falling, and flat series."""
    import datetime as dt
    from wurzel_spark.queries.events import event_mannkendall_trend

    series = {
        "up": [2, 3, 5, 7, 8, 11, 13, 14],
        "down": [14, 11, 9, 9, 6, 4, 3, 1],
        "flat": [5, 5, 5, 5, 5, 5, 5, 5],
    }
    rows = []
    eid = 0
    for et, counts in series.items():
        for h, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, 1, h), 1, et, 1.0, None))
    _events(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {r["event_type"]: r for r in
           event_mannkendall_trend(spark, str(tmp_path)).collect()}

    def sgn(x):
        return (x > 0) - (x < 0)

    for et, cs in series.items():
        s = sum(sgn(cs[j] - cs[i]) for i in range(len(cs)) for j in range(i + 1, len(cs)))
        h = len(cs)
        tau = (2000 * s) // (h * (h - 1)) if s >= 0 else -((2000 * -s) // (h * (h - 1)))
        r = out[et]
        assert r["s_stat"] == s and r["tau_permille"] == tau, et
    assert out["up"]["trend"] == "rising"
    assert out["down"]["trend"] == "falling"
    assert out["flat"]["trend"] == "flat" and out["flat"]["s_stat"] == 0


# --------------------------------------------- streaming KS drift twin


def test_streaming_ks_matches_batch(spark, tmp_path):
    from wurzel_spark.operators.textstats import ks_length_drift
    from wurzel_spark.streaming.ksdrift import ks_drift_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "ks_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = [
        tuple(r)
        for r in ks_drift_stream(
            stream, str(tmp_path / "ks_state"), str(tmp_path / "ks_ckpt"),
            compact_every=2,
        ).collect()
    ]
    exp = [tuple(r) for r in ks_length_drift(docs).collect()]
    assert got == exp and len(got) > 0


def test_streaming_ks_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.operators.textstats import ks_length_partials
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.ksdrift import drain_ks_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "ks_replay")

    def _stage(df, bid):
        mine = ks_length_partials(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(spark, mine, state, bid, ["src_batch", "source", "v"], None)

    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)
    once = [tuple(r) for r in drain_ks_state(spark, state).collect()]
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)  # replay
    got = [tuple(r) for r in drain_ks_state(spark, state).collect()]
    assert got == once and len(once) > 0


# --------------------------------------------------- concentration metrics


def test_balance_gini_extremes(spark, tmp_path):
    """Equal balances -> 0; one account holding nearly everything -> near
    (n-1)/n; negatives excluded and counted; Fraction reference."""
    from fractions import Fraction
    from wurzel_spark.queries.relational import customer_balance_gini

    rows = []
    # nation 0: 8 equal accounts; nation 1: 7 tiny + 1 whale; nation 2 has
    # a negative and a zero
    for i in range(8):
        rows.append((i, f"c{i}", 0, 50.0, "S"))
    for i in range(7):
        rows.append((100 + i, f"c{i}", 1, 0.01, "S"))
    rows.append((107, "whale", 1, 10000.0, "S"))
    rows.append((200, "neg", 2, -5.0, "S"))
    rows.append((201, "zero", 2, 0.0, "S"))
    rows.append((202, "pos", 2, 3.0, "S"))
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    out = {r["c_nationkey"]: r for r in
           customer_balance_gini(spark, str(tmp_path)).collect()}
    assert out[0]["gini_permille"] == 0

    def gini_ref(cents):
        cents = sorted(cents)
        n = len(cents)
        num = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(cents))
        return (1000 * num) // (n * sum(cents))

    assert out[1]["gini_permille"] == gini_ref([1] * 7 + [1000000])
    assert out[1]["gini_permille"] > 800
    assert out[2]["n_nonpositive"] == 2 and out[2]["n_accounts"] == 1
    assert out[2]["gini_permille"] == 0  # single account


def test_revenue_hhi_extremes(spark, tmp_path):
    """Monopoly nation -> 10000; equal-split nation -> 10000/k; band
    labels match the DOJ thresholds."""
    from wurzel_spark.queries.relational import revenue_hhi_stats

    sups = [(1, "s1", 0, 0.0), (2, "s2", 1, 0.0), (3, "s3", 1, 0.0),
            (4, "s4", 1, 0.0), (5, "s5", 1, 0.0), (6, "s6", 1, 0.0)]
    spark.createDataFrame(
        sups, "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
    ).coalesce(1).write.parquet(str(tmp_path / "supplier.parquet"))
    lines = []
    ln = 0
    # nation 0: only supplier 1 (monopoly); nation 1: suppliers 2..6 equal
    for sk, price in [(1, 500.0)] + [(k, 100.0) for k in range(2, 7)]:
        ln += 1
        lines.append((ln, 1, sk, 1, 1.0, price, 0.0, 0.0, "N", "O", None))
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["s_nationkey"]: r for r in revenue_hhi_stats(spark, str(tmp_path)).collect()}
    assert out[0]["hhi"] == 10000 and out[0]["band"] == "concentrated"
    # 5 equal shares -> HHI 2000, inside the DOJ moderate band (1500-2500)
    assert out[1]["hhi"] == 10000 // 5 and out[1]["band"] == "moderate"
    assert out[1]["total_rev_cents"] == 5 * 10000


# --------------------------------------------- autocorrelation (seasonality)


def test_acf_matches_python_reference(spark, tmp_path):
    """Integer ACF equals the literal deviation-product definition on a
    planted periodic series; a period-24 wave scores high lag-24, an
    alternating series scores negative lag-1."""
    import datetime as dt
    from wurzel_spark.queries.events import event_acf_stats

    series = {
        # 3 days of a clean daily wave: high at hours 8-16
        "wave": [(10 if 8 <= (h % 24) <= 16 else 2) for h in range(72)],
        # strict alternation: maximally negative lag-1
        "alt": [(9 if h % 2 == 0 else 1) for h in range(48)],
    }
    rows = []
    eid = 0
    for et, counts in series.items():
        for h, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), 1, et,
                     1.0, None)
                )
    _events(spark, rows).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    out = {r["event_type"]: r for r in event_acf_stats(spark, str(tmp_path)).collect()}

    def ref(cs, k):
        h = len(cs)
        t = sum(cs)
        dev = [c * h - t for c in cs]
        num = sum(dev[i] * dev[i + k] for i in range(h - k))
        den = sum(d * d for d in dev)
        q = (1000 * num) // den if num >= 0 else -((1000 * -num) // den)
        return q

    for et, cs in series.items():
        assert out[et]["acf1_permille"] == ref(cs, 1), et
        assert out[et]["acf24_permille"] == ref(cs, 24), et
    # the biased estimator's numerator has only H-k overlap terms, so a
    # perfect period-24 wave on 72 hours tops out near (72-24)/72 = 667
    assert out["wave"]["acf24_permille"] > 600   # daily period
    assert out["wave"]["acf1_permille"] > 500    # persistence of the plateau
    assert out["alt"]["acf1_permille"] < -800    # alternation


# --------------------------------------------------- cohort LTV curve


def test_cohort_ltv_hand_computed(spark, tmp_path):
    """Cohorting, age indexing across a year boundary, and the cumulative
    permille curve on a scripted two-cohort ledger."""
    import datetime as dt
    from wurzel_spark.queries.relational import cohort_ltv_curve

    rows = [
        # customer 1: first order 2023-11, then 2023-12 and 2024-02
        (1, 1, "O", 10.0, dt.datetime(2023, 11, 5), "P"),
        (2, 1, "O", 20.0, dt.datetime(2023, 12, 5), "P"),
        (3, 1, "O", 30.0, dt.datetime(2024, 2, 5), "P"),
        # customer 2: same cohort month, one order
        (4, 2, "O", 40.0, dt.datetime(2023, 11, 20), "P"),
        # customer 3: 2024-01 cohort
        (5, 3, "O", 50.0, dt.datetime(2024, 1, 1), "P"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.parquet(str(tmp_path / "orders.parquet"))
    out = {(r["cohort_year"], r["cohort_month"], r["age_months"]): r
           for r in cohort_ltv_curve(spark, str(tmp_path)).collect()}
    c_nov = (2023, 11)
    total_nov = 1000 + 2000 + 3000 + 4000
    r0 = out[(*c_nov, 0)]
    assert r0["rev_cents"] == 1000 + 4000 and r0["n_active"] == 2
    assert r0["ltv_permille"] == (1000 * 5000) // total_nov
    # age 3 = 2024-02 (cross-year month arithmetic)
    r3 = out[(*c_nov, 3)]
    assert r3["rev_cents"] == 3000
    assert r3["cum_rev_cents"] == total_nov and r3["ltv_permille"] == 1000
    assert out[(2024, 1, 0)]["ltv_permille"] == 1000


# --------------------------------------------- streaming Benford twin


def _li_stream(spark, tmp_path, name):
    from wurzel_spark.tables import table as _table

    li = _table(spark, "/root/testdata/sf0.001", "lineitem").localCheckpoint()
    d = str(tmp_path / f"{name}_in")
    li.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(li.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    return li, stream


def test_streaming_benford_matches_batch(spark, tmp_path):
    from wurzel_spark.queries.relational import benford_value_audit
    from wurzel_spark.streaming.benford import benford_stream

    li, stream = _li_stream(spark, tmp_path, "bf")
    got = [
        tuple(r)
        for r in benford_stream(
            stream, str(tmp_path / "bf_state"), str(tmp_path / "bf_ckpt"),
            compact_every=2,
        ).collect()
    ]
    exp = [tuple(r) for r in benford_value_audit(spark, "/root/testdata/sf0.001").collect()]
    assert got == exp and len(got) > 0


def test_streaming_benford_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.queries.relational import benford_partials
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.benford import drain_benford_state
    from wurzel_spark.tables import table as _table

    li = _table(spark, "/root/testdata/sf0.001", "lineitem")
    state = str(tmp_path / "bf_replay")

    def _stage(df, bid):
        mine = benford_partials(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(spark, mine, state, bid, ["src_batch", "digit"], None)

    _stage(li.filter(F.col("l_orderkey") % 2 == 0), 0)
    _stage(li.filter(F.col("l_orderkey") % 2 == 1), 1)
    once = [tuple(r) for r in drain_benford_state(spark, state).collect()]
    _stage(li.filter(F.col("l_orderkey") % 2 == 1), 1)  # replay
    got = [tuple(r) for r in drain_benford_state(spark, state).collect()]
    assert got == once and len(once) > 0


# --------------------------------------------------- Spearman correlation


def test_spearman_matches_scipy_free_reference(spark, tmp_path):
    """Tie-averaged-rank Spearman equals a direct Python computation on a
    fixture WITH ties; a perfect monotone (nonlinear) relation scores 1."""
    from wurzel_spark.queries.relational import spearman_qty_price

    # flag A: y = x^3 (monotone, nonlinear, no ties) -> rho exactly 1
    # flag B: ties in both columns
    rows = []
    ln = 0
    for i in range(1, 11):
        ln += 1
        rows.append((ln, 1, 1, ln, float(i), float(i ** 3), 0.0, 0.0, "A", "O", None))
    bx = [1, 1, 2, 3, 3, 3, 4]
    by = [2, 1, 1, 5, 5, 4, 9]
    for x, y in zip(bx, by):
        ln += 1
        rows.append((ln, 1, 1, ln, float(x), float(y), 0.0, 0.0, "B", "O", None))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["l_returnflag"]: r for r in spearman_qty_price(spark, str(tmp_path)).collect()}
    assert abs(out["A"]["spearman_rho"] - 1.0) < 1e-12

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + 1 + j) / 2.0
            for k in range(i, j):
                r[order[k]] = avg
            i = j
        return r

    rx, ry = avg_ranks([x * 100 for x in bx]), avg_ranks([y * 100 for y in by])
    n = len(bx)
    mx, my = sum(rx) / n, sum(ry) / n
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    assert abs(out["B"]["spearman_rho"] - num / den) < 1e-9


# ------------------------------------------------------- KMV set operations


def test_kmv_overlap_small_pairs_are_exact(spark):
    """When the merged sketch holds the whole union (k_used < k), the
    estimator degenerates to the exact Jaccard — err_permille == 0."""
    from wurzel_spark.operators.sketches import kmv_overlap_matrix

    rows = []
    # s0 and s1 share exactly half a 40-word vocabulary
    for i in range(40):
        rows.append((i, f"w{i:03d}", "s0", "en", 10))
    for i in range(20, 60):
        rows.append((100 + i, f"w{i:03d}", "s1", "en", 10))
    out = kmv_overlap_matrix(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # |inter| = 20, |union| = 60
    assert r["jacc_exact_permille"] == (1000 * 20) // 60
    assert r["err_permille"] == 0 and r["jacc_est_permille"] == r["jacc_exact_permille"]


def test_kmv_overlap_estimator_tracks_planted_overlap(spark):
    """On vocabularies larger than k the estimate lands near the exact
    Jaccard (KMV concentration; tolerance generous for k=256)."""
    from wurzel_spark.operators.sketches import kmv_overlap_matrix

    rows = []
    # 2000-word vocabs, 50% overlap -> exact jaccard 1/3
    for i in range(2000):
        rows.append((i, f"w{i:05d}", "a0", "en", 10))
    for i in range(1000, 3000):
        rows.append((10000 + i, f"w{i:05d}", "a1", "en", 10))
    r = kmv_overlap_matrix(_docs(spark, rows)).collect()[0]
    assert r["jacc_exact_permille"] == (1000 * 1000) // 3000
    assert r["k_used"] == 256
    assert abs(r["jacc_est_permille"] - r["jacc_exact_permille"]) < 120


# --------------------------------------------- streaming temporal battery


def test_streaming_temporal_battery_matches_batch(spark, tmp_path):
    """One staged hourly rollup; all three detectors drain bit-equal to
    their batch twins."""
    from wurzel_spark.queries.events import (
        event_acf_stats,
        event_burstiness_stats,
        event_cusum_drift,
        event_mannkendall_trend,
    )
    from wurzel_spark.streaming.temporal import temporal_battery_stream
    from wurzel_spark.tables import table as _table

    ev = _table(spark, "/root/testdata/sf0.001", "events").localCheckpoint()
    d = str(tmp_path / "tb_in")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = temporal_battery_stream(
        stream, str(tmp_path / "tb_state"), str(tmp_path / "tb_ckpt"), compact_every=2
    )
    sf = "/root/testdata/sf0.001"
    assert [tuple(r) for r in got["cusum"].collect()] == [
        tuple(r) for r in event_cusum_drift(spark, sf).collect()
    ]
    assert [tuple(r) for r in got["mannkendall"].collect()] == [
        tuple(r) for r in event_mannkendall_trend(spark, sf).collect()
    ]
    acf = [tuple(r) for r in got["acf"].collect()]
    assert acf == [tuple(r) for r in event_acf_stats(spark, sf).collect()]
    assert len(acf) > 0
    assert [tuple(r) for r in got["burstiness"].collect()] == [
        tuple(r) for r in event_burstiness_stats(spark, sf).collect()
    ]
    from wurzel_spark.queries.events import slo_burn_stats
    assert [tuple(r) for r in got["slo"].collect()] == [
        tuple(r) for r in slo_burn_stats(spark, sf).collect()
    ]


def test_streaming_temporal_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.queries.events import hourly_rollup
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.temporal import drain_temporal_state
    from wurzel_spark.tables import table as _table

    ev = _table(spark, "/root/testdata/sf0.001", "events")
    state = str(tmp_path / "tb_replay")

    def _stage(df, bid):
        mine = hourly_rollup(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(
            spark, mine, state, bid, ["src_batch", "event_type", "hour"], None
        )

    _stage(ev.filter(F.col("event_id") % 2 == 0), 0)
    _stage(ev.filter(F.col("event_id") % 2 == 1), 1)
    once = {k: [tuple(r) for r in v.collect()]
            for k, v in drain_temporal_state(spark, state).items()}
    _stage(ev.filter(F.col("event_id") % 2 == 1), 1)  # replay
    got = {k: [tuple(r) for r in v.collect()]
           for k, v in drain_temporal_state(spark, state).items()}
    assert got == once and all(len(v) > 0 for v in once.values())


# ------------------------------------------------- trimmed/winsorized stats


def test_robust_stats_hand_computed(spark):
    """Trim cut, trimmed sum, clamp values, and winsorized sum on a
    hand-built distribution with one extreme tail value each side."""
    from wurzel_spark.operators.textstats import robust_length_stats

    vals = [1] + list(range(10, 28)) + [1000]  # n=20, lo = 20*50//1000 = 1
    rows = [(i, "t", "s0", "en", v) for i, v in enumerate(vals)]
    r = robust_length_stats(_docs(spark, rows)).collect()[0]
    assert r["n_docs"] == 20 and r["n_trimmed_per_tail"] == 1
    kept = sorted(vals)[1:-1]
    assert r["sum_trimmed"] == sum(kept) and r["n_kept"] == 18
    assert (r["clamp_lo"], r["clamp_hi"]) == (kept[0], kept[-1])
    assert r["sum_winsorized"] == sum(kept) + kept[0] + kept[-1]
    assert r["sum_raw"] == sum(vals)
    # the winsorized sum bounds how much the tails moved the raw sum
    assert r["sum_winsorized"] < r["sum_raw"]


def test_robust_stats_small_group_untrimmed(spark):
    """n < 20 at 5% -> lo = 0: nothing trimmed, winsorized == raw."""
    from wurzel_spark.operators.textstats import robust_length_stats

    rows = [(i, "t", "s0", "en", 10 + i) for i in range(7)]
    r = robust_length_stats(_docs(spark, rows)).collect()[0]
    assert r["n_trimmed_per_tail"] == 0
    assert r["sum_trimmed"] == r["sum_raw"] == r["sum_winsorized"]


# --------------------------------------------------- Pareto 80/20


def test_pareto_hand_computed(spark, tmp_path):
    """Cover count on a whale-dominated book and an equal book."""
    from wurzel_spark.queries.relational import pareto_concentration

    rows = []
    # nation 0: one whale = 80% exactly with one account
    rows.append((1, "w", 0, 80.0, "S"))
    for i in range(20):
        rows.append((10 + i, f"c{i}", 0, 1.0, "S"))
    # nation 1: 10 equal accounts -> need 8 for 80%
    for i in range(10):
        rows.append((100 + i, f"e{i}", 1, 5.0, "S"))
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).coalesce(1).write.parquet(str(tmp_path / "customer.parquet"))
    out = {r["c_nationkey"]: r for r in pareto_concentration(spark, str(tmp_path)).collect()}
    # nation 0 total = 10000 cents; whale = 8000 = exactly 80%
    assert out[0]["n_for_80pct"] == 1 and out[0]["n_accounts"] == 21
    assert out[1]["n_for_80pct"] == 8
    assert out[1]["account_share_permille"] == (1000 * 8) // 10
