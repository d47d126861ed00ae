"""Z-order layout: Morton interleave, clustered write, skip-stats
(operators/layout.py)."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from wurzel_spark.operators import layout


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long")
    out = df.select(
        "a", "b", layout.interleave_bits(F.col("a"), F.col("b")).alias("z")
    ).collect()
    got = {(r["a"], r["b"]): r["z"] for r in out}
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1      # bit 0 of a → z bit 0
    assert got[(0, 1)] == 2      # bit 0 of b → z bit 1
    # a=3 (011), b=5 (101): z bits: a0=1,b0=1,a1=1,b1=0,a2=0,b2=1 → 100111 = 39
    assert got[(3, 5)] == 39


def test_zorder_write_bounds_both_dims_per_file(spark, tmp_path):
    # 64x64 grid; z-order clustering must bound BOTH dims per file,
    # unlike a plain sort on x (which leaves y spanning the full range).
    rows = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, "x long, y long")
    zpath = str(tmp_path / "zorder")
    layout.zorder_write(df, zpath, "x", "y", n_files=16, bits=6)

    spans = []
    for f in glob.glob(zpath + "/*.parquet"):
        t = pq.read_table(f)
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        if xs:
            spans.append((max(xs) - min(xs), max(ys) - min(ys)))
    assert spans
    # every file covers a narrow square: both spans well under the full 63
    assert max(s[0] for s in spans) <= 31
    assert max(s[1] for s in spans) <= 31


def test_layout_stats_match_bucket_partition(spark):
    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = layout.zorder_layout_stats(df, "x", "y", bits=16).collect()
    assert sum(r["n_rows"] for r in out) == 1024
    for r in out:
        assert r["span_a"] == r["max_a"] - r["min_a"]
        assert r["min_a"] >= 0 and r["min_b"] >= 0


def test_compact_write_sizes_file_count(spark, tmp_path):
    from wurzel_spark.operators.layout import compact_write

    df = spark.createDataFrame(
        [(i, "x" * 1000) for i in range(2000)], "id long, payload string"
    ).repartition(32)  # fragmented input: 32 partitions for ~2 MB of data
    p = str(tmp_path / "compact")
    n = compact_write(df, p, target_mb=1)
    files = glob.glob(p + "/*.parquet")
    assert n == len(files)
    assert 1 <= n <= 4  # ~2 MB at 1 MB target, not 32 input partitions
    assert spark.read.parquet(p).count() == 2000


def test_compact_write_empty_input(spark, tmp_path):
    from wurzel_spark.operators.layout import compact_write

    df = spark.createDataFrame([], "id long, payload string")
    p = str(tmp_path / "compact_empty")
    assert compact_write(df, p) == 0
    assert spark.read.parquet(p).count() == 0


def test_zorder_write_clusters_large_key_domain(spark, tmp_path):
    # keys far above 2^bits: without range normalization the low bits
    # alias and every file spans the whole domain
    rows = [(x * 15_625, y * 31_250) for x in range(64) for y in range(32)]
    df = spark.createDataFrame(rows, "x long, y long")  # x to 1M, y to 1M
    p = str(tmp_path / "zorder_big")
    layout.zorder_write(df, p, "x", "y", n_files=16, bits=8)
    spans = []
    for f in glob.glob(p + "/*.parquet"):
        t = pq.read_table(f)
        xs, ys = t["x"].to_pylist(), t["y"].to_pylist()
        if xs:
            spans.append((max(xs) - min(xs), max(ys) - min(ys)))
    full_x, full_y = 63 * 15_625, 31 * 31_250
    assert max(s[0] for s in spans) <= full_x // 2
    assert max(s[1] for s in spans) <= full_y // 2


def test_write_training_shards_deterministic_balanced(spark, sf_dir, tmp_path):
    """One epoch materialized as shards: balanced ±1, one parquet file per
    shard, deterministic across runs, union == corpus."""
    import glob

    from wurzel_spark.operators.layout import write_training_shards
    from wurzel_spark.tables import table as _table

    docs = _table(spark, sf_dir, "documents").limit(100)
    out = str(tmp_path / "shards")
    write_training_shards(docs, out, n_shards=4)
    sizes = {}
    for s in range(4):
        files = glob.glob(f"{out}/shard={s}/*.parquet")
        assert len(files) == 1, files  # one file per shard
        sizes[s] = spark.read.parquet(f"{out}/shard={s}").count()
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == 100
    all_rows = spark.read.parquet(out)
    assert all_rows.select("doc_id").distinct().count() == 100
    first = {
        (r["doc_id"], r["shard"], r["shuffle_pos"]) for r in all_rows.collect()
    }
    # second run writes byte-identical assignments
    out2 = str(tmp_path / "shards2")
    write_training_shards(docs, out2, n_shards=4)
    second = {
        (r["doc_id"], r["shard"], r["shuffle_pos"])
        for r in spark.read.parquet(out2).collect()
    }
    assert first == second


def test_training_shard_stats_balance(spark, sf_dir):
    from wurzel_spark.operators.layout import q_training_shard_stats

    rows = q_training_shard_stats(spark, sf_dir).collect()
    assert len(rows) == 8
    counts = [r["n_docs"] for r in rows]
    assert max(counts) - min(counts) <= 1
    assert all(r["n_tokens"] > 0 for r in rows)
