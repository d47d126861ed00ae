"""Generate an sf1-scale probe dataset (~10x the driver's bench sf) for
the linear-scaling demonstration (VERDICT r3 #9).

The driver's testdata tops out at sf0.1 (5k documents / 2k embeddings);
the 100 TB claims in the dedup docstrings are about SHAPE (map-side
combine, bounded fan-out, no single-partition windows), and the cheapest
honest check below a real cluster is a ~10x local blow-up: linear-shape
operators should grow wall-clock ~linearly (bounded by the shuffle
constant), not quadratically.

Generation derives from the driver's own sf0.1 tables (never modified —
read-only inputs) so token/length/dup-rate distributions match what the
bench measures: each source doc is replicated REPLICAS times; copy 0 is
verbatim (keeping the exact-dup rate), later copies get i word-position
edits (keeping a realistic near-dup band: Jaccard ≈ 1 - i/words).
Deterministic (seeded per doc) so repeated probes are comparable.

Usage: python tools/gen_scale_probe.py [out_dir] [replicas]
Writes documents/embeddings/events/orders parquet under out_dir
(default /tmp/sfprobe, replicas=10 → 50k docs / 20k embeddings / 1M
events / 1.5M orders with a 10x-scaled custkey domain).
"""

from __future__ import annotations

import sys

import duckdb

SRC = "/root/testdata/sf0.1"


def main(out_dir: str = "/tmp/sfprobe", replicas: int = 10) -> None:
    con = duckdb.connect()
    con.execute("SELECT setseed(0.42)")
    n_docs = con.execute(f"SELECT count(*) FROM '{SRC}/documents.parquet'").fetchone()[0]
    # copy r of doc d -> doc_id = d + r*n_docs; r>0 rewrites r word
    # positions (position p_i -> a vocab word drawn from the doc itself,
    # rotated) so near-dup similarity decays smoothly with r.
    con.execute(
        f"""
        COPY (
          WITH src AS (
            SELECT doc_id, text, lang, source,
                   list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x != '') AS ws
            FROM '{SRC}/documents.parquet'
          ), rep AS (
            SELECT s.doc_id + r.r * {n_docs} AS doc_id,
                   CASE WHEN r.r = 0 THEN s.text
                        ELSE array_to_string(
                          list_transform(range(1, len(s.ws) + 1),
                            i -> CASE WHEN (hash(s.doc_id * 131 + i) % len(s.ws))
                                           < r.r
                                      THEN s.ws[1 + ((i + r.r * 7) % len(s.ws))]
                                      ELSE s.ws[i] END), ' ')
                   END AS text,
                   s.lang, s.source
            FROM src s, (SELECT unnest(range({replicas})) AS r) r
          )
          SELECT doc_id, text, lang, source, length(text) AS n_chars
          FROM rep ORDER BY doc_id
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n_vec = con.execute(f"SELECT count(*) FROM '{SRC}/embeddings.parquet'").fetchone()[0]
    dim = con.execute(
        f"SELECT len(embedding) FROM '{SRC}/embeddings.parquet' LIMIT 1"
    ).fetchone()[0]
    # replica r jitters each component by a tiny deterministic hash-derived
    # delta: same cluster geometry, 10x the points.
    con.execute(
        f"""
        COPY (
          SELECT e.vec_id + r.r * {n_vec} AS vec_id,
                 CASE WHEN r.r = 0 THEN e.embedding
                      ELSE list_transform(range(1, {dim} + 1),
                        i -> e.embedding[i]
                             + ((hash(e.vec_id * 977 + i * 31 + r.r) % 1000)::BIGINT
                                - 500) * 1e-5)::FLOAT[]
                 END AS embedding,
                 e.label
          FROM '{SRC}/embeddings.parquet' e,
               (SELECT unnest(range({replicas})) AS r) r
          ORDER BY vec_id
        ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    # events: replica r shifts event ids and jitters users so per-day
    # volumes scale ~linearly while the day×type grid (what the drift
    # operator's state is sized by) stays identical — the honest scale-up
    # for event-family probes (r6).
    n_ev = con.execute(f"SELECT count(*) FROM '{SRC}/events.parquet'").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT e.event_id + r.r * {n_ev} AS event_id,
                 e.ts,
                 e.user_id + r.r * 100000 AS user_id,
                 e.event_type, e.value, e.props
          FROM '{SRC}/events.parquet' e,
               (SELECT unnest(range({replicas})) AS r) r
          ORDER BY event_id
        ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    # orders: replica r shifts order AND customer keys so the CUSTOMER
    # population scales with the data — what the two-phase rfm ranks are
    # sized by (r11; the old global-window rfm was excluded from the
    # probe, the restructure is exactly what this measures).
    n_ok, n_ck = con.execute(
        f"SELECT MAX(o_orderkey) + 1, MAX(o_custkey) + 1 FROM '{SRC}/orders.parquet'"
    ).fetchone()
    con.execute(
        f"""
        COPY (
          SELECT o.* REPLACE (o.o_orderkey + r.r * {n_ok} AS o_orderkey,
                              o.o_custkey + r.r * {n_ck} AS o_custkey)
          FROM '{SRC}/orders.parquet' o,
               (SELECT unnest(range({replicas})) AS r) r
          ORDER BY o_orderkey
        ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)
        """
    )
    # lineitem: l_orderkey shifts in lockstep with the scaled orders and
    # l_suppkey shifts so the SUPPLIER population scales too — the
    # bipartite purchase graph (supplier_pagerank) then grows 10x in
    # nodes AND edges, the honest blow-up for the graph family (r12).
    n_sk = con.execute(
        f"SELECT MAX(l_suppkey) + 1 FROM '{SRC}/lineitem.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT l.* REPLACE (l.l_orderkey + r.r * {n_ok} AS l_orderkey,
                              l.l_suppkey + r.r * {n_sk} AS l_suppkey)
          FROM '{SRC}/lineitem.parquet' l,
               (SELECT unnest(range({replicas})) AS r) r
          ORDER BY l_orderkey
        ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
        """
    )
    print(
        f"wrote {out_dir}: {n_docs * replicas} docs, {n_vec * replicas} "
        f"embeddings, {n_ev * replicas} events, "
        f"{replicas}x orders (custkey domain scaled {replicas}x), "
        f"{replicas}x lineitem (suppkey domain scaled {replicas}x)"
    )


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    import os

    os.makedirs(out, exist_ok=True)
    main(out, rep)
