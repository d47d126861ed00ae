"""Similarity search: brute-force correctness + LSH/IVF recall."""

from pyspark.sql import functions as F

from wurzel_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    lsh_topk,
)
from wurzel_spark.tables import table


def test_brute_force_topk_matches_local(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    got = brute_force_topk(emb, q, k=5).collect()
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    # local recompute
    import numpy as np

    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    qv = vecs[0]
    sims = {
        vid: float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))
        for vid, v in vecs.items()
        if vid != 0
    }
    expected = [vid for vid, _ in sorted(sims.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]
    assert [r["neighbor_id"] for r in got] == expected


def test_lsh_topk_recall(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    planes = [r["embedding"] for r in emb.filter(F.col("vec_id") < 3).orderBy("vec_id").collect()]
    exact = brute_force_topk(emb, q, k=10).collect()
    approx = lsh_topk(emb, q, planes, k=10).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact_sets[q_] & approx_sets.get(q_, set())) / len(exact_sets[q_])
        for q_ in exact_sets
    ]
    # 3 hyperplanes → 8 buckets over 500 vectors; recall is partial but must
    # be well above random (10/500 = 2%)
    assert sum(recalls) / len(recalls) > 0.2


def test_ivf_assign_covers_all(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8)
    cells = ivf_assign(emb, cents)
    assert cells.count() == emb.count()
    n_cells = cells.select("cell").distinct().count()
    assert 1 < n_cells <= 8


def test_ivf_topk_recall(spark, sf_dir):
    from pyspark.sql import functions as F

    from wurzel_spark.operators.similarity import brute_force_topk, ivf_topk
    from wurzel_spark.tables import table

    emb = table(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < 8)
    query = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, query, k=10).collect()
    approx = ivf_topk(emb, query, centroids, k=10, nprobe=3).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # every query must return k candidates from its probed cells, and the
    # probe must recover a nontrivial share of the exact neighbors
    assert all(len(v) == 10 for v in approx_sets.values())
    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) > 0.2


def test_cosine_lsh_pairs_subset_of_exact_and_no_nested_loop(spark, sf_dir):
    from wurzel_spark.operators.similarity import (
        cosine_exact_pairs,
        cosine_lsh_near_dup_pairs,
    )

    emb = table(spark, sf_dir, "embeddings")
    planes = [
        r["embedding"] for r in emb.filter(F.col("vec_id") < 24).orderBy("vec_id").collect()
    ]
    lsh = cosine_lsh_near_dup_pairs(emb, planes, bands=4, threshold=0.5)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan  # equi band join, no cartesian
    got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in lsh.collect()}
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_exact_pairs(emb, threshold=0.5).collect()
    }
    assert set(got) <= set(exact)  # LSH verification is exact → no false positives
    for pair, sim in got.items():
        assert abs(sim - exact[pair]) < 1e-12


def test_cosine_lsh_pairs_find_planted_duplicate(spark):
    from wurzel_spark.operators.similarity import cosine_lsh_near_dup_pairs

    # 40 corpus vectors + a planted near-identical pair (ids 100, 101)
    import numpy as np

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(16)], 0) for i in range(40)]
    base = rng.randn(16)
    rows.append((100, [float(x) for x in base], 0))
    rows.append((101, [float(x) for x in base + 0.01 * rng.randn(16)], 0))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    planes = [r[0] for r in emb.filter(F.col("vec_id") < 24).select("embedding").orderBy("vec_id").collect()]
    got = {(r["id_a"], r["id_b"]) for r in cosine_lsh_near_dup_pairs(emb, planes, bands=4, threshold=0.9).collect()}
    assert (100, 101) in got
