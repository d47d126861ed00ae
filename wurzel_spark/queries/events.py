"""Event-stream queries (batch form) over the ``events`` table.

The reference has no streaming (SURVEY §1.3) — cron-batch is its freshness
model. We provide these as batch queries here, and the same computations as
Structured Streaming jobs in ``wurzel_spark.streaming`` (watermarked windows
over readStream) for the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wurzel_spark.tables import table

SESSION_GAP_SECONDS = 30 * 60


def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation: count, distinct users, exact value sum.

    value is a full-precision double → summing via DECIMAL(28,10) keeps the
    result order-independent (double sums are not associative).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
"""


def events_type_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style): per-user event-type counts.
    One shuffle on user_id; the per-type counts are map-side partial aggs.
    """
    ev = table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return (
        ev.groupBy("user_id")
        .agg(
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            cnt("signup"),
            cnt("error"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("user_id")
    )


EVENTS_TYPES_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       COUNT(*) AS n_total
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on >30-min inactivity gaps.

    Declarative form of the classic stateful-streaming operator: lag() to
    detect gaps, running sum of gap flags for the session id. All integer
    arithmetic on epoch-micros → cross-engine exact. The streaming twin
    (applyInPandasWithState) lives in wurzel_spark.streaming.sessions.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            is_new.alias("is_new_session"),
        )
        .withColumn(
            "session_seq",
            F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .select("user_id", "event_id", "session_seq")
        .orderBy("user_id", "event_id")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM flagged
ORDER BY user_id, event_id
"""


def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON handling: extract ``props.$.k`` per event and
    aggregate per event type. JSON parsing stays JVM-side
    (get_json_object); at scale this is pure map work feeding the same
    one-shuffle aggregate as any groupBy.
    """
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: per user, first occurrence of each step (conditional
    min over epoch micros — integer, cross-engine exact) and whether the
    user converted view → purchase in order. One shuffle on user_id.
    """
    ev = table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(
            F.when(F.col("event_type") == t, F.unix_micros(F.col("ts")))
        ).alias(f"first_{t}_us")

    per_user = ev.groupBy("user_id").agg(first_ts("view"), first_ts("purchase"))
    converted = (
        F.col("first_view_us").isNotNull()
        & F.col("first_purchase_us").isNotNull()
        & (F.col("first_view_us") < F.col("first_purchase_us"))
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.col("first_view_us").isNotNull().cast("long")).alias("n_viewed"),
        F.sum(F.col("first_purchase_us").isNotNull().cast("long")).alias("n_purchased"),
        F.sum(converted.cast("long")).alias("n_converted"),
    )


EVENTS_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view_us,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase_us
  FROM events
  GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN first_view_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_viewed,
       CAST(SUM(CASE WHEN first_purchase_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchased,
       CAST(SUM(CASE WHEN first_view_us IS NOT NULL AND first_purchase_us IS NOT NULL
                 AND first_view_us < first_purchase_us THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM per_user
"""


def events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical (continuous-aggregate) rollup: daily stats computed by
    RE-AGGREGATING an hourly pre-aggregate instead of the raw events. At
    100 TB the hourly rollup is what you materialize (timescale-style
    continuous aggregate); dashboards re-aggregate the tiny rollup. Exact
    because the partial states are decomposable (counts + decimal sums —
    no distinct, no percentile). Oracle computes daily straight from raw:
    agreement proves the two-level aggregation is lossless.
    """
    ev = table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(28,10)")).alias("sum_value_dec"),
        )
    )
    return (
        hourly.groupBy(F.date_trunc("day", "hour").alias("day"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.count(F.lit(1)).alias("n_hours"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
        )
        .orderBy("day")
    )


EVENTS_DAILY_SQL = """
SELECT date_trunc('day', ts) AS day,
       COUNT(*) AS n_events,
       COUNT(DISTINCT date_trunc('hour', ts)) AS n_hours,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the week of their
    FIRST event; each (cohort_week, week_offset) cell counts the distinct
    cohort members active that week. The standard product-analytics
    readout, and a representative two-level aggregation: a per-user min, a
    broadcastable cohort map joined back to the fact stream, then a
    distinct-count grid. All integers — cross-engine exact.

    Scale shape: the per-user first-event aggregate and the final
    (cohort, offset) count are both key-partitioned hash aggregates with
    map-side partials; the cohort map joins back on user_id (at 100 TB:
    sort-merge on the same hash partitioning, reused exchange).
    """
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            F.expr("datediff(week, cohort_week) div 7").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH ev AS (
  SELECT user_id, date_trunc('week', ts) AS week FROM events
), first AS (
  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id
)
SELECT f.cohort_week,
       date_diff('day', f.cohort_week, e.week) // 7 AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active_users
FROM ev e JOIN first f ON e.user_id = f.user_id
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------- distribution drift

_PSI_SCALE = float(1 << 20)


def event_type_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day population-stability index of the event-type mix —
    the standard streaming-data drift alarm (a PSI above ~0.2 means the
    traffic composition shifted enough to re-examine upstream). For a
    training-data pipeline this is the "did the source change under us"
    gate run on every ingest snapshot.

    Per day d with add-one smoothing over the GLOBAL type set T:
    ``p_t = (c(d,t)+1)/(n(d)+|T|)``, and
    ``psi(d) = Σ_t (p_t − q_t)·ln(p_t/q_t)`` against the previous day's
    q. Exactness: counts are exact ints; each per-type component is
    floor-scaled to 2^20 fixed-point and the per-day sum is an INTEGER
    sum — no float accumulation order to disagree on (the bm25/PMI
    convention, extended to a sum of logs).

    Scale shape: one (day, type) aggregate, the full day×type grid by
    cross join (|T| is tiny), one lag window per type, one grouped int
    sum. Nothing here is corpus-sized after the first aggregate.
    """
    ev = table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("c"))
    return psi_from_type_counts(counts)


def psi_from_type_counts(counts: DataFrame) -> DataFrame:
    """Day-over-day PSI from a (day, event_type, c) count table — the
    shared core of :func:`event_type_drift` and its streaming twin
    (streaming/drift.py), so the two cannot diverge."""
    days = counts.select("day").distinct()
    types = counts.select("event_type").distinct()
    # |T| rides the plan as a broadcast 1-row aggregate instead of a
    # separate count() driver job (which re-ran the whole counts subtree
    # as an extra pass over the input)
    n_types_df = types.agg(F.count(F.lit(1)).alias("__n_types"))
    grid = (
        days.crossJoin(F.broadcast(types))
        .join(counts, ["day", "event_type"], "left")
        .select("day", "event_type", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    totals = grid.groupBy("day").agg(F.sum("c").alias("n"))
    g = grid.join(totals, "day").crossJoin(F.broadcast(n_types_df))
    w = W.partitionBy("event_type").orderBy("day")
    p = (F.col("c") + F.lit(1)).cast("double") / (
        F.col("n") + F.col("__n_types")
    ).cast("double")
    paired = (
        g.withColumn("p", p)
        .withColumn("q", F.lag("p").over(w))
        .filter(F.col("q").isNotNull())
    )
    comp = F.floor(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * F.lit(_PSI_SCALE)
    ).cast("long")
    return (
        paired.withColumn("comp_q20", comp)
        .groupBy("day")
        .agg(
            F.sum(F.col("c")).alias("n_events"),
            F.sum("comp_q20").alias("psi_q20"),
        )
        .orderBy("day")
    )


EVENT_TYPE_DRIFT_SQL = f"""
WITH counts AS (
  SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT d.day, t.event_type, COALESCE(c.c, 0) AS c
  FROM (SELECT DISTINCT day FROM counts) d
  CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
  LEFT JOIN counts c ON c.day = d.day AND c.event_type = t.event_type
), nt AS (
  SELECT COUNT(DISTINCT event_type) AS n_types FROM counts
), g AS (
  SELECT grid.day, grid.event_type, grid.c,
         SUM(grid.c) OVER (PARTITION BY grid.day) AS n,
         nt.n_types
  FROM grid, nt
), paired AS (
  SELECT day, event_type, c,
         CAST(c + 1 AS DOUBLE) / CAST(n + n_types AS DOUBLE) AS p,
         LAG(CAST(c + 1 AS DOUBLE) / CAST(n + n_types AS DOUBLE))
           OVER (PARTITION BY event_type ORDER BY day) AS q
  FROM g
)
SELECT day,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(SUM(CAST(FLOOR((p - q) * ln(p / q) * {_PSI_SCALE!r}) AS BIGINT)) AS BIGINT) AS psi_q20
FROM paired
WHERE q IS NOT NULL
GROUP BY day
ORDER BY day
"""


# ----------------------------------------------------- anomaly hours

ANOMALY_MAD_K = 3


def event_hour_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly flags over the hourly count series:
    an (event_type, hour) is anomalous when |count − median| >
    {ANOMALY_MAD_K}·MAD, with median and MAD both the house rank-ceil
    order statistic (value at 1-based rank ceil(n/2) ascending) — a
    definition every engine reproduces bit-exactly, unlike mean/stddev
    gates that need float accumulation.  The monitoring readout a
    pipeline puts behind ingest: a bot burst or an outage hour trips the
    gate without a labeled baseline, and MAD ignores the outliers that
    would inflate a stddev gate (50% breakdown point).

    Scale shape: one grouped hourly aggregation (map-side combined),
    then two windows partitioned by event_type over the HOURLY table —
    rows = types × hours, already metadata-sized relative to the event
    stream.  All comparisons exact int64; no output floats.
    """
    ev = table(spark, sf_dir, "events")
    return anomalies_from_hourly(event_hourly_counts(ev))


def event_hourly_counts(ev: DataFrame) -> DataFrame:
    """(event_type, hour, c) — the one event-stream-sized pass, and the
    ADDITIVE staging unit of the streaming twin (streaming/anomalies.py)."""
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("c"))


def anomalies_from_hourly(hourly: DataFrame) -> DataFrame:
    """The metadata-sized median/MAD tail shared with the streaming twin."""
    wt = W.partitionBy("event_type")
    ranked = hourly.withColumn(
        "__rn", F.row_number().over(wt.orderBy("c", "hour"))
    ).withColumn("__n", F.count(F.lit(1)).over(wt))
    med = (
        ranked.filter(F.col("__rn") == F.ceil(F.col("__n") / 2).cast("int"))
        .select("event_type", F.col("c").alias("med"))
    )
    dev = hourly.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("c") - F.col("med"))
    )
    dranked = dev.withColumn(
        "__rn", F.row_number().over(wt.orderBy("adev", "hour"))
    ).withColumn("__n", F.count(F.lit(1)).over(wt))
    mad = (
        dranked.filter(F.col("__rn") == F.ceil(F.col("__n") / 2).cast("int"))
        .select("event_type", F.col("adev").alias("mad"))
    )
    return (
        dev.join(mad, "event_type")
        .filter(F.col("adev") > ANOMALY_MAD_K * F.col("mad"))
        .select(
            "event_type",
            "hour",
            F.col("c").alias("n_events"),
            F.col("med").alias("median_events"),
            F.col("mad").alias("mad_events"),
        )
        .orderBy("event_type", "hour")
    )


EVENT_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), ranked AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, hour) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly
), med AS (
  SELECT event_type, c AS med FROM ranked
  WHERE rn = CAST(CEIL(n / 2.0) AS INT)
), dev AS (
  SELECT h.event_type, h.hour, h.c, m.med, ABS(h.c - m.med) AS adev
  FROM hourly h JOIN med m ON m.event_type = h.event_type
), dranked AS (
  SELECT event_type, adev,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY adev, hour) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, adev AS mad FROM dranked
  WHERE rn = CAST(CEIL(n / 2.0) AS INT)
)
SELECT d.event_type AS event_type, d.hour AS hour,
       d.c AS n_events, d.med AS median_events, x.mad AS mad_events
FROM dev d JOIN mad x ON x.event_type = d.event_type
WHERE d.adev > {ANOMALY_MAD_K} * x.mad
ORDER BY d.event_type, d.hour
"""


# ------------------------------------------------ join-size estimation

JOIN_EST_RATE_BITS = 3  # deterministic 1/8 key sample


def join_size_estimate(
    ev: DataFrame, key_col: str = "user_id", type_col: str = "event_type"
) -> DataFrame:
    """Pre-join explosion audit: per event type, the EXACT self-join
    cardinality on ``key_col`` (Σ c_k² — what sessionization/funnel
    self-joins would actually materialize) next to a sampled ESTIMATE
    from a deterministic 1/8 key sample (keys whose md5-prefix hash ≡ 0
    mod 8, scaled ×8) — the estimator a planner can afford BEFORE paying
    the full per-key count. err_permille quantifies the estimator on
    this corpus; a hot key (one user = half the events) shows up as
    exact_pairs ≫ n_rows and is the signal to salt before joining.

    Exactness: per-key squares run in decimal(38,0) Spark / HUGEINT
    oracle (c² passes 2^63 once one key holds ~3e9 rows); pair counts
    publish as DOUBLE (same exact integer → same double, the
    max_norm2q precedent); err_permille stays an exact integer.

    Scale shape (audit configuration): ONE corpus shuffle — the
    (type, key) count — checkpointed for its two consumers; everything
    above is key-distinct-sized. The production path flips the order
    (filter the 1/8 key sample FIRST, then count), paying 1/8 of the
    shuffle and skipping the exact branch entirely."""
    from wurzel_spark.operators.dedup import md5_prefix_hash

    counts = (
        ev.groupBy(type_col, key_col)
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)  # feeds the exact AND sampled branches
    )
    sq = (F.col("c").cast("decimal(38,0)") * F.col("c")).alias("sq")
    exact = counts.select(type_col, "c", sq).groupBy(type_col).agg(
        F.sum("c").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("sq").alias("exact_pairs"),
    )
    h = md5_prefix_hash(F.col(key_col).cast("string"))
    sampled = (
        counts.filter(F.pmod(h, F.lit(1 << JOIN_EST_RATE_BITS)) == 0)
        .select(type_col, "c", sq)
        .groupBy(type_col)
        .agg(
            (F.sum("sq") * F.lit(1 << JOIN_EST_RATE_BITS)).alias("est_pairs"),
        )
    )
    return (
        exact.join(sampled, type_col, "left")
        .select(
            F.col(type_col).alias("event_type"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("exact_pairs").cast("double").alias("exact_pairs"),
            F.coalesce(F.col("est_pairs"), F.lit(0))
            .cast("double")
            .alias("est_pairs"),
            F.expr(
                "CAST(div(abs(CAST(coalesce(est_pairs, 0) AS DECIMAL(38,0))"
                " - exact_pairs) * 1000, exact_pairs) AS BIGINT)"
            ).alias("err_permille"),
        )
        .orderBy("event_type")
    )


def q_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return join_size_estimate(table(spark, sf_dir, "events"))


JOIN_SIZE_EST_SQL = f"""
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY event_type, user_id
), exact AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS n_rows,
         COUNT(*) AS n_keys,
         SUM(CAST(c AS HUGEINT) * c) AS exact_pairs
  FROM counts GROUP BY event_type
), sampled AS (
  SELECT event_type,
         SUM(CAST(c AS HUGEINT) * c) * {1 << JOIN_EST_RATE_BITS} AS est_pairs
  FROM counts
  WHERE CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % {1 << JOIN_EST_RATE_BITS} = 0
  GROUP BY event_type
)
SELECT e.event_type AS event_type, e.n_rows, e.n_keys,
       CAST(e.exact_pairs AS DOUBLE) AS exact_pairs,
       CAST(COALESCE(s.est_pairs, 0) AS DOUBLE) AS est_pairs,
       CAST((ABS(COALESCE(s.est_pairs, 0) - e.exact_pairs) * 1000)
            // e.exact_pairs AS BIGINT) AS err_permille
FROM exact e LEFT JOIN sampled s ON e.event_type = s.event_type
ORDER BY e.event_type
"""


# ------------------------------------------- event transition matrix


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts between event types within a
    user's session continuity (gap ≤ SESSION_GAP_SECONDS, the sessionize
    convention): per (from_type, to_type) the transition count and its
    row-normalized permille — the product-analytics "what happens after
    X" matrix, and the drift baseline a bot-detection or funnel change
    is compared against.

    Exactness: ordering ties break on event_id, the permille is integer
    floor-div of exact counts. Scale shape: one window per user (lag),
    one grouped count, one from_type-grain window for the row sums —
    the matrix is |types|² rows."""
    ev = table(spark, sf_dir, "events")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    trans = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
            gap_us.alias("gap_us"),
        )
        .filter(
            F.col("from_type").isNotNull()
            & (F.col("gap_us") <= SESSION_GAP_SECONDS * 1_000_000)
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    wrow = W.partitionBy("from_type")
    return (
        trans.withColumn("row_total", F.sum("n_transitions").over(wrow))
        .select(
            "from_type",
            "to_type",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.expr("div(1000 * n_transitions, row_total)").alias("prob_permille"),
        )
        .orderBy("from_type", "to_type")
    )


EVENT_TRANSITION_SQL = f"""
WITH lagged AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER w AS from_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), trans AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
  FROM lagged
  WHERE from_type IS NOT NULL AND gap_us <= {SESSION_GAP_SECONDS * 1_000_000}
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       (1000 * n_transitions) // CAST(SUM(n_transitions) OVER (PARTITION BY from_type) AS BIGINT) AS prob_permille
FROM trans
ORDER BY from_type, to_type
"""


# --------------------------------------------- behavioral diversity (Gini)


def user_type_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral diversity: exact-integer Gini impurity of the
    user's event-type distribution — 0‰ = a single-type account (bot
    signature: all clicks), approaching (1−1/k)·1000‰ = uniform over k
    types (organic usage). The per-account feature behind engagement
    scoring and bot triage, computed WITHOUT entropy's logarithm so both
    engines agree bit-for-bit: gini = 1 − Σp² clears denominators to
    (T² − Σc²)·1000 // T² — counts are exact ints, the square passes
    int64 only at T > 3B events per user (decimal/HUGEINT anyway).

    Scale shape: one (user, type) grouped count, one user-grain
    re-aggregate — both map-side combinable; output is |users| rows."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    agg = per.groupBy("user_id").agg(
        F.sum("c").cast("decimal(38,0)").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)")).alias(
            "sum_c2"
        ),
    )
    return agg.select(
        "user_id",
        F.col("t").cast("long").alias("n_events"),
        "n_types",
        F.expr("CAST(div((t * t - sum_c2) * 1000, t * t) AS BIGINT)").alias(
            "gini_permille"
        ),
    ).orderBy("user_id")


USER_TYPE_GINI_SQL = """
WITH per AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY user_id, event_type
), agg AS (
  SELECT user_id, SUM(c) AS t, COUNT(*) AS n_types, SUM(c * c) AS sum_c2
  FROM per GROUP BY user_id
)
SELECT user_id,
       CAST(t AS BIGINT) AS n_events,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(((t * t - sum_c2) * 1000) // (t * t) AS BIGINT) AS gini_permille
FROM agg ORDER BY user_id
"""


# --------------------------------------------- CUSUM change-point detection

CUSUM_FLAG_PERMILLE = 50


def event_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point statistic over each event type's
    hourly count series — the classic Page (1954) drift detector next to
    the distributional [[event_type_drift]] (PSI compares two windows;
    CUSUM localizes WHEN the rate shifted). The recursion
    ``S_h = max(0, S_{h−1} + dev_h)`` has the closed form
    ``S_h = P_h − min(0, min_{j≤h} P_j)`` (prefix sum minus running
    prefix minimum), so the whole statistic is two running windows —
    no iteration, no recursive CTE.

    Exactness: deviations clear the mean's denominator —
    ``dev_h = c_h·H − T`` (T = type total, H = observed hours), so P is
    an exact integer in count·hour units and the normalized statistic is
    ``1000·S // (T·H)`` with non-negative operands. decimal/HUGEINT:
    c_h·H reaches ~10¹⁸ at 100 TB event counts. Hour buckets are the
    OBSERVED hours of the type (the materialized-rollup grain of
    [[events_daily_from_hourly]]); a silent hour reads as a gap, not a
    zero — the downward detector catches rate DROPS via dev's negative
    drift across the remaining buckets.

    Scale shape: one corpus-grain grouped count to the (type, hour)
    rollup; everything after is windows over rollup-sized rows
    partitioned by type."""
    return cusum_from_rollup(hourly_rollup(table(spark, sf_dir, "events")))


def hourly_rollup(ev: DataFrame) -> DataFrame:
    """(event_type, hour) counts — the shared ADDITIVE input of the
    temporal battery (CUSUM / Mann–Kendall / ACF) and the staged unit of
    their streaming twins (streaming/temporal.py)."""
    return ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))


def cusum_from_rollup(hourly: DataFrame) -> DataFrame:
    """Window tail over the hourly rollup (shared with the drain)."""
    from pyspark.sql import Window as W

    wt = W.partitionBy("event_type")
    enriched = hourly.select(
        "event_type",
        "hour",
        "c",
        F.sum("c").over(wt).alias("t"),
        F.count(F.lit(1)).over(wt).cast("decimal(38,0)").alias("h_n"),
    )
    wrun = wt.orderBy("hour").rowsBetween(W.unboundedPreceding, W.currentRow)
    run = enriched.select(
        "event_type",
        "hour",
        "c",
        "t",
        "h_n",
        F.sum(F.col("c") * F.col("h_n") - F.col("t")).over(wrun).alias("p"),
    ).select(
        "*",
        F.least(F.lit(0).cast("decimal(38,0)"), F.min("p").over(wrun)).alias("m_lo"),
        F.greatest(F.lit(0).cast("decimal(38,0)"), F.max("p").over(wrun)).alias("m_hi"),
    )
    return run.select(
        "event_type",
        "hour",
        F.col("c").cast("long").alias("n_events"),
        F.expr("CAST(div(1000 * (p - m_lo), t * h_n) AS BIGINT)").alias(
            "cusum_up_permille"
        ),
        F.expr("CAST(div(1000 * (m_hi - p), t * h_n) AS BIGINT)").alias(
            "cusum_dn_permille"
        ),
        (
            F.expr(f"div(1000 * (p - m_lo), t * h_n) > {CUSUM_FLAG_PERMILLE}")
            | F.expr(f"div(1000 * (m_hi - p), t * h_n) > {CUSUM_FLAG_PERMILLE}")
        ).alias("drift_flag"),
    ).orderBy("event_type", "hour")


EVENT_CUSUM_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), enriched AS (
  SELECT event_type, hour, c,
         SUM(c) OVER (PARTITION BY event_type) AS t,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS h_n
  FROM hourly
), run AS (
  SELECT event_type, hour, c, t, h_n,
         SUM(c * h_n - t) OVER w AS p
  FROM enriched
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), extrema AS (
  SELECT event_type, hour, c, t, h_n, p,
         LEAST(CAST(0 AS HUGEINT), MIN(p) OVER w) AS m_lo,
         GREATEST(CAST(0 AS HUGEINT), MAX(p) OVER w) AS m_hi
  FROM run
  WINDOW w AS (PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, hour, CAST(c AS BIGINT) AS n_events,
       CAST((1000 * (p - m_lo)) // (t * h_n) AS BIGINT) AS cusum_up_permille,
       CAST((1000 * (m_hi - p)) // (t * h_n) AS BIGINT) AS cusum_dn_permille,
       ((1000 * (p - m_lo)) // (t * h_n) > {CUSUM_FLAG_PERMILLE}
        OR (1000 * (m_hi - p)) // (t * h_n) > {CUSUM_FLAG_PERMILLE}) AS drift_flag
FROM extrema ORDER BY event_type, hour
"""


# --------------------------------------------- session path trigrams

PATH_TOP_K = 25


def event_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K 3-step behavioral paths: (type → type → type) trigrams
    within session continuity — the path-analysis readout one step above
    [[event_transition_matrix]]'s first-order Markov view (second-order
    structure is where funnels show their real shape: A→B→buy vs
    C→B→buy separate here, never in the pair matrix).

    Exactness: both lag gaps must sit inside the session window (the
    sessionize convention); counts are exact ints and permille shares
    clear against the trigram total; the top-K sort key (n desc, then
    the three types) is total so LIMIT is deterministic.

    Scale shape: ONE window partitioned by user (two lags from the same
    ordered partition — one shuffle), a grouped count, and a TopK sort
    over |type|³-bounded rows."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # prev_gap derives from lag-1/lag-2 epochs directly — a lag OF a
    # lagged expression would be a nested window call (DuckDB rejects it)
    us = F.unix_micros(F.col("ts"))
    lagged = ev.select(
        F.col("event_type").alias("t3"),
        F.lag("event_type").over(w).alias("t2"),
        F.lag("event_type", 2).over(w).alias("t1"),
        (us - F.lag(us).over(w)).alias("gap_us"),
        (F.lag(us).over(w) - F.lag(us, 2).over(w)).alias("prev_gap_us"),
    )
    tri = (
        lagged.filter(
            F.col("t1").isNotNull()
            & (F.col("gap_us") <= SESSION_GAP_SECONDS * 1_000_000)
            & (F.col("prev_gap_us") <= SESSION_GAP_SECONDS * 1_000_000)
        )
        .groupBy("t1", "t2", "t3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
    )
    w_tot = W.partitionBy()
    return (
        tri.withColumn("total", F.sum("n_paths").over(w_tot))
        .select(
            "t1",
            "t2",
            "t3",
            "n_paths",
            F.expr("div(1000 * n_paths, total)").alias("share_permille"),
        )
        .orderBy(F.desc("n_paths"), "t1", "t2", "t3")
        .limit(PATH_TOP_K)
    )


EVENT_PATH_SQL = f"""
WITH lagged AS (
  SELECT event_type AS t3,
         LAG(event_type) OVER w AS t2,
         LAG(event_type, 2) OVER w AS t1,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us,
         LAG(epoch_us(ts)) OVER w - LAG(epoch_us(ts), 2) OVER w AS prev_gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tri AS (
  SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n_paths
  FROM lagged
  WHERE t1 IS NOT NULL
    AND gap_us <= {SESSION_GAP_SECONDS * 1_000_000}
    AND prev_gap_us <= {SESSION_GAP_SECONDS * 1_000_000}
  GROUP BY t1, t2, t3
)
SELECT t1, t2, t3, n_paths,
       CAST((1000 * n_paths) // SUM(n_paths) OVER () AS BIGINT) AS share_permille
FROM tri
ORDER BY n_paths DESC, t1, t2, t3
LIMIT {PATH_TOP_K}
"""


# --------------------------------------------- Mann-Kendall trend test

MK_TREND_PERMILLE = 200


def event_mannkendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event type over the hourly
    count series — the distribution-free trend detector (Mann 1945,
    Kendall 1975) that completes the temporal battery: [[event_cusum_drift]]
    localizes a LEVEL SHIFT, this scores sustained monotonic DRIFT that
    never shifts abruptly (slow decay of an event type, creeping bot
    growth). S = Σ_{i<j} sgn(c_j − c_i); Kendall's τ normalizes by the
    pair count.

    Exactness: S and the pair count are exact integers;
    ``tau_permille = sign(S) · (2000·|S|) div (H·(H−1))`` keeps every
    division non-negative (div truncates toward zero while the floor
    identity floors — they diverge on negatives, the centroid lesson).

    Scale shape: the O(H²) pair join runs on the HOURLY ROLLUP
    (rollup-sized, bounded by the time span — never the event corpus);
    one corpus-grain grouped count feeds it."""
    return mannkendall_from_rollup(hourly_rollup(table(spark, sf_dir, "events")))


def mannkendall_from_rollup(hourly: DataFrame) -> DataFrame:
    """Pair-join tail over the hourly rollup (shared with the drain)."""
    hourly = hourly.select("event_type", "hour", F.col("c").cast("long").alias("c"))
    a = hourly.select("event_type", F.col("hour").alias("h1"), F.col("c").alias("c1"))
    b = hourly.select("event_type", F.col("hour").alias("h2"), F.col("c").alias("c2"))
    pairs = a.join(b, "event_type").filter(F.col("h1") < F.col("h2"))
    agg = pairs.groupBy("event_type").agg(
        F.sum(F.signum(F.col("c2") - F.col("c1")).cast("long")).alias("s_stat"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    hn = hourly.groupBy("event_type").agg(F.count(F.lit(1)).cast("long").alias("n_hours"))
    out = agg.join(hn, "event_type").select(
        "event_type",
        "n_hours",
        "s_stat",
        F.expr(
            "CAST(CASE WHEN s_stat >= 0 THEN div(2000 * s_stat, n_hours * (n_hours - 1))"
            " ELSE -div(2000 * -s_stat, n_hours * (n_hours - 1)) END AS BIGINT)"
        ).alias("tau_permille"),
    )
    return out.select(
        "event_type",
        "n_hours",
        "s_stat",
        "tau_permille",
        F.expr(
            f"CASE WHEN tau_permille > {MK_TREND_PERMILLE} THEN 'rising'"
            f" WHEN tau_permille < -{MK_TREND_PERMILLE} THEN 'falling'"
            f" ELSE 'flat' END"
        ).alias("trend"),
    ).orderBy("event_type")


MANNKENDALL_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), pairs AS (
  SELECT a.event_type,
         CAST(SUM(SIGN(b.c - a.c)) AS BIGINT) AS s_stat,
         CAST(COUNT(*) AS BIGINT) AS n_pairs
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.hour < b.hour
  GROUP BY a.event_type
), hn AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours
  FROM hourly GROUP BY event_type
), scored AS (
  SELECT p.event_type, hn.n_hours, p.s_stat,
         CAST(CASE WHEN s_stat >= 0
                   THEN (2000 * s_stat) // (n_hours * (n_hours - 1))
                   ELSE -((2000 * -s_stat) // (n_hours * (n_hours - 1)))
                   END AS BIGINT) AS tau_permille
  FROM pairs p JOIN hn ON hn.event_type = p.event_type
)
SELECT event_type, n_hours, s_stat, tau_permille,
       CASE WHEN tau_permille > {MK_TREND_PERMILLE} THEN 'rising'
            WHEN tau_permille < -{MK_TREND_PERMILLE} THEN 'falling'
            ELSE 'flat' END AS trend
FROM scored ORDER BY event_type
"""


# --------------------------------------------- autocorrelation (seasonality)

ACF_LAGS = (1, 24)


def event_acf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of each event type's hourly count series at
    k = 1 (persistence) and k = 24 (daily seasonality) — the readout
    that completes the temporal battery: [[event_cusum_drift]] finds
    level SHIFTS, [[event_mannkendall_trend]] sustained TREND, this
    finds PERIODICITY (a strong lag-24 on 'click' is organic diurnal
    traffic; a bot swarm is flat).

    Exactness: deviations clear the mean — ``dev_t = c_t·H − T`` — so
    ``r_k = Σ dev_t·dev_{t+k} / Σ dev²`` is a ratio of exact integers
    (numerator may be negative: the division sign-splits so every
    floor-div sees non-negative operands). decimal(38,0) bounds the
    series at Σdev² < 10³⁸ — holds beyond 10⁹ events/hour over 10⁵
    hours, far past a 100 TB event table. Lags are POSITIONAL over the
    observed-hour series (the rollup grain), matching the CUSUM
    convention for gaps.

    Scale shape: one corpus-grain rollup, then per-type ordered windows
    (lead) over rollup-sized rows and one grouped aggregate."""
    return acf_from_rollup(hourly_rollup(table(spark, sf_dir, "events")))


def acf_from_rollup(hourly: DataFrame) -> DataFrame:
    """Lead-window tail over the hourly rollup (shared with the drain)."""
    from pyspark.sql import Window as W

    wt = W.partitionBy("event_type")
    wo = wt.orderBy("hour")
    dev = hourly.select(
        "event_type",
        "hour",
        (F.col("c") * F.count(F.lit(1)).over(wt) - F.sum("c").over(wt)).alias("dev"),
    )
    leads = dev.select(
        "event_type",
        "dev",
        *[F.lead("dev", k).over(wo).alias(f"dev_{k}") for k in ACF_LAGS],
    )
    agg = leads.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum(F.col("dev") * F.col("dev")).alias("den"),
        *[
            F.sum(F.col("dev") * F.col(f"dev_{k}")).alias(f"num_{k}")
            for k in ACF_LAGS
        ],
    )
    def acf(k: int):
        return F.expr(
            f"CAST(CASE WHEN den > 0 THEN"
            f" CASE WHEN num_{k} >= 0 THEN div(1000 * num_{k}, den)"
            f" ELSE -div(1000 * -num_{k}, den) END END AS BIGINT)"
        ).alias(f"acf{k}_permille")

    return agg.select("event_type", "n_hours", *[acf(k) for k in ACF_LAGS]).orderBy(
        "event_type"
    )


def _acf_sql() -> str:
    lead_cols = ",\n         ".join(
        f"LEAD(dev, {k}) OVER (PARTITION BY event_type ORDER BY hour) AS dev_{k}"
        for k in ACF_LAGS
    )
    num_cols = ",\n         ".join(
        f"SUM(dev * dev_{k}) AS num_{k}" for k in ACF_LAGS
    )
    acf_cols = ",\n       ".join(
        f"CAST(CASE WHEN den > 0 THEN"
        f" CASE WHEN num_{k} >= 0 THEN (1000 * num_{k}) // den"
        f" ELSE -((1000 * -num_{k}) // den) END END AS BIGINT) AS acf{k}_permille"
        for k in ACF_LAGS
    )
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), dev AS (
  SELECT event_type, hour,
         c * COUNT(*) OVER (PARTITION BY event_type)
           - SUM(c) OVER (PARTITION BY event_type) AS dev
  FROM hourly
), leads AS (
  SELECT event_type, dev,
         {lead_cols}
  FROM dev
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_hours,
         SUM(dev * dev) AS den,
         {num_cols}
  FROM leads GROUP BY event_type
)
SELECT event_type, n_hours,
       {acf_cols}
FROM agg ORDER BY event_type
"""


EVENT_ACF_SQL = _acf_sql()


# --------------------------------------------- burstiness (Fano factor)

BURSTY_PERMILLE = 2000
REGULAR_PERMILLE = 500


def event_burstiness_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index of dispersion (Fano factor, variance/mean) of each event
    type's hourly arrival counts over its DENSE hour span — the
    dispersion leg of the temporal battery: [[event_cusum_drift]] finds
    level SHIFTS, [[event_mannkendall_trend]] TREND, [[event_acf_stats]]
    PERIODICITY, and this scores BURSTINESS — a Poisson arrival process
    has D ≈ 1; batchy/bot traffic (bursts then silence) has D ≫ 1;
    rate-limited/metered traffic has D ≪ 1. Unlike the positional
    detectors, silent hours are real zeros here (a type that fires 10⁶
    events in one hour of a month is the canonical burst), so the span
    h_span = max_hour − min_hour + 1 denominates, and the s2/t sums are
    unaffected by the absent rows (they contribute 0 to both).

    Exactness: with T = Σc, S2 = Σc² and H = h_span, the sample
    variance over the dense H-length series is (H·S2 − T²)/(H·(H−1))
    and the mean T/H, so D = (H·S2 − T²)/((H−1)·T) — a ratio of exact
    integers, non-negative by Cauchy–Schwarz (T² ≤ n_active·S2 ≤ H·S2),
    emitted as ``div(1000·(H·S2 − T²), (H−1)·T)``. decimal(38,0) bound:
    1000·H·S2 < 10³⁸ holds past 10⁹ events/hour over 10⁵ hours.
    Single-hour types (H = 1) have no variance: NULL + 'single-hour'.

    Scale shape: ONE corpus-grain rollup (map-side combinable) then a
    rollup-sized grouped aggregate; shares [[hourly_rollup]] with the
    battery, so the streaming twin drains from the same staged state."""
    return burstiness_from_rollup(hourly_rollup(table(spark, sf_dir, "events")))


def burstiness_from_rollup(hourly: DataFrame) -> DataFrame:
    """Grouped-aggregate tail over the hourly rollup (shared with the
    streaming drain)."""
    eh = F.expr("div(unix_micros(hour), 3600000000)")
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_hours"),
        F.sum("c").alias("t"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
        F.min(eh).alias("h_lo"),
        F.max(eh).alias("h_hi"),
    )
    scored = agg.select(
        "event_type",
        "n_active_hours",
        "t",
        "s2",
        (F.col("h_hi") - F.col("h_lo") + F.lit(1)).cast("decimal(38,0)").alias("h_span"),
    ).select(
        "event_type",
        F.col("h_span").cast("long").alias("span_hours"),
        "n_active_hours",
        F.col("t").cast("long").alias("n_events"),
        F.expr(
            "CAST(CASE WHEN h_span > 1"
            " THEN div(1000 * (h_span * s2 - t * t), (h_span - 1) * t)"
            " END AS BIGINT)"
        ).alias("dispersion_permille"),
    )
    return scored.select(
        "event_type",
        "span_hours",
        "n_active_hours",
        "n_events",
        "dispersion_permille",
        F.expr(
            f"CASE WHEN dispersion_permille IS NULL THEN 'single-hour'"
            f" WHEN dispersion_permille > {BURSTY_PERMILLE} THEN 'bursty'"
            f" WHEN dispersion_permille < {REGULAR_PERMILLE} THEN 'regular'"
            f" ELSE 'poisson-like' END"
        ).alias("label"),
    ).orderBy("event_type")


EVENT_BURSTINESS_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_active_hours,
         SUM(c) AS t,
         SUM(c * c) AS s2,
         MIN(epoch_us(hour) // 3600000000) AS h_lo,
         MAX(epoch_us(hour) // 3600000000) AS h_hi
  FROM hourly GROUP BY event_type
), scored AS (
  SELECT event_type,
         CAST(h_hi - h_lo + 1 AS HUGEINT) AS h_span,
         n_active_hours, t, s2
  FROM agg
), disp AS (
  SELECT event_type,
         CAST(h_span AS BIGINT) AS span_hours,
         n_active_hours,
         CAST(t AS BIGINT) AS n_events,
         CAST(CASE WHEN h_span > 1
                   THEN (1000 * (h_span * s2 - t * t)) // ((h_span - 1) * t)
              END AS BIGINT) AS dispersion_permille
  FROM scored
)
SELECT event_type, span_hours, n_active_hours, n_events, dispersion_permille,
       CASE WHEN dispersion_permille IS NULL THEN 'single-hour'
            WHEN dispersion_permille > {BURSTY_PERMILLE} THEN 'bursty'
            WHEN dispersion_permille < {REGULAR_PERMILLE} THEN 'regular'
            ELSE 'poisson-like' END AS label
FROM disp ORDER BY event_type
"""


# --------------------------------------------- Theil–Sen robust slope

SEN_QUANTILES = (100, 500, 900)  # permille ranks: robust slope interval


def event_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust slope per event type over the hourly count
    series — the MAGNITUDE complement to [[event_mannkendall_trend]]
    (MK scores whether a monotonic drift exists; Sen's estimator says
    how many events/hour it gains or loses, immune to outlier hours
    that wreck an OLS fit — Sen 1968, the standard pairing).  The
    p10/p90 slope quantiles bound the estimate (a wide interval = the
    trend is not uniform across the span).

    Exactness: each pairwise slope is quantized ONCE as
    ``sign-split div(1000·(c2−c1), eh2−eh1)`` (true epoch-hour distance,
    always > 0; the numerator may be negative so the division
    sign-splits — div truncates, floor floors, the centroid lesson);
    quantiles of the quantized slopes are exact rank-based values at
    ``ceil(p·n)`` (the house quantile definition), so every emitted
    number is an integer both engines agree on bit-for-bit.  Pairs run
    over OBSERVED hours with real time distance (the MK convention for
    the pair set; [[event_burstiness_stats]] is where silent hours are
    zeros, because dispersion — not slope — is where silence carries
    information).

    Scale shape: the O(H²) pair join runs on the HOURLY ROLLUP
    (rollup-sized, bounded by the time span, never the event corpus);
    one corpus-grain grouped count feeds it; one rank window per type
    over pair-count rows."""
    return theil_sen_from_rollup(hourly_rollup(table(spark, sf_dir, "events")))


def theil_sen_from_rollup(hourly: DataFrame) -> DataFrame:
    """Pair-join + rank-window tail over the hourly rollup (shared with
    the streaming drain)."""
    eh = F.expr("div(unix_micros(hour), 3600000000)")
    hourly = hourly.select(
        "event_type", eh.alias("eh"), F.col("c").cast("long").alias("c")
    )
    a = hourly.select("event_type", F.col("eh").alias("h1"), F.col("c").alias("c1"))
    b = hourly.select("event_type", F.col("eh").alias("h2"), F.col("c").alias("c2"))
    pairs = (
        a.join(b, "event_type")
        .filter(F.col("h1") < F.col("h2"))
        .select(
            "event_type",
            F.expr(
                "CAST(CASE WHEN c2 >= c1 THEN div(1000 * (c2 - c1), h2 - h1)"
                " ELSE -div(1000 * (c1 - c2), h2 - h1) END AS BIGINT)"
            ).alias("slope_q"),
        )
    )
    w = W.partitionBy("event_type").orderBy("slope_q")
    ranked = pairs.select(
        "event_type",
        "slope_q",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n_pairs"),
    )
    picks = [
        F.max(
            F.when(
                F.col("rn")
                == F.expr(f"CAST(div({p} * n_pairs + 999, 1000) AS BIGINT)"),
                F.col("slope_q"),
            )
        ).alias(f"slope_p{p}")
        for p in SEN_QUANTILES
    ]
    out = ranked.groupBy("event_type").agg(
        F.max("n_pairs").cast("long").alias("n_pairs"), *picks
    )
    return out.select(
        "event_type",
        "n_pairs",
        F.col(f"slope_p{SEN_QUANTILES[1]}").alias("sen_slope_q"),
        F.col(f"slope_p{SEN_QUANTILES[0]}").alias("slope_p10_q"),
        F.col(f"slope_p{SEN_QUANTILES[2]}").alias("slope_p90_q"),
    ).orderBy("event_type")


def _theil_sen_sql() -> str:
    picks = ",\n         ".join(
        f"MAX(CASE WHEN rn = CAST(({p} * n_pairs + 999) // 1000 AS BIGINT)"
        f" THEN slope_q END) AS slope_p{p}"
        for p in SEN_QUANTILES
    )
    return f"""
WITH hourly AS (
  SELECT event_type,
         epoch_us(date_trunc('hour', ts)) // 3600000000 AS eh,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, epoch_us(date_trunc('hour', ts)) // 3600000000
), pairs AS (
  SELECT a.event_type,
         CAST(CASE WHEN b.c >= a.c THEN (1000 * (b.c - a.c)) // (b.eh - a.eh)
              ELSE -((1000 * (a.c - b.c)) // (b.eh - a.eh)) END AS BIGINT)
           AS slope_q
  FROM hourly a JOIN hourly b
    ON a.event_type = b.event_type AND a.eh < b.eh
), ranked AS (
  SELECT event_type, slope_q,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY slope_q) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs
), agg AS (
  SELECT event_type,
         CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
         {picks}
  FROM ranked GROUP BY event_type
)
SELECT event_type, n_pairs,
       slope_p{SEN_QUANTILES[1]} AS sen_slope_q,
       slope_p{SEN_QUANTILES[0]} AS slope_p10_q,
       slope_p{SEN_QUANTILES[2]} AS slope_p90_q
FROM agg ORDER BY event_type
"""


THEIL_SEN_SQL = _theil_sen_sql()


# --------------------------------- chi-square independence (Cramér's V)

CRAMER_STRONG_PERMILLE = 90   # V² ≥ 0.09  ⇔  V ≥ 0.3
CRAMER_WEAK_PERMILLE = 10     # V² ≥ 0.01  ⇔  V ≥ 0.1


def event_hour_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test of event_type × hour-of-day with
    Cramér's V — "does traffic SHAPE depend on event type?" in one
    effect-size number.  [[event_acf_stats]] scores each type's own
    periodicity; this scores whether the types' daily profiles DIFFER
    (V ≈ 0: every type follows the same diurnal curve, hour is
    uninformative for routing/sampling; V large: types have distinct
    clocks — a bot type that fires flat while users sleep shows up
    here).

    Exactness (log-free, sqrt-free): the textbook Σ(o−e)²/e collapses
    to ``chi² = N·Σ_cells o²/(r·c) − N`` where absent cells contribute
    ZERO — no absent-cell tail to close (the tcloseness lesson handled;
    this identity sidesteps it).  Quantized per cell as
    ``div(1000·N·o², r·c)`` and summed: every term floors a
    non-negative integer ratio, so both engines agree bit-for-bit and
    the total undershoots the true chi² by < #cells permille;
    ``GREATEST(·−1000·N, 0)`` clamps the flooring's possible −#cells.
    Effect size ``V² = chi²/(N·(min(R,C)−1))`` is emitted as permille
    (V² not V — no square root ever runs); decimal(38,0) bound:
    1000·N·o² < 10³⁸ holds past 10¹² events.  Degenerate single-row or
    single-column tables have no independence question: NULL +
    'undefined'.

    Scale shape: ONE corpus-grain grouped count to (type × 24) cells
    (map-side combinable), then windows and one aggregate over
    cell-grain rows."""
    ev = table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("long").alias("hod")
    ).agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("o"))
    wt = W.partitionBy("event_type")
    wh = W.partitionBy("hod")
    wg = W.partitionBy()
    scored = cells.select(
        "event_type",
        "hod",
        "o",
        F.sum("o").over(wt).alias("r"),
        F.sum("o").over(wh).alias("c"),
        F.sum("o").over(wg).alias("n"),
    ).select(
        "event_type",
        "hod",
        "n",
        F.expr("div(1000 * n * o * o, r * c)").alias("term"),
    )
    agg = scored.groupBy().agg(
        F.max("n").cast("decimal(38,0)").alias("n"),
        F.countDistinct("event_type").cast("decimal(38,0)").alias("n_types"),
        F.countDistinct("hod").cast("decimal(38,0)").alias("n_buckets"),
        F.sum("term").alias("term_sum"),
    )
    out = agg.select(
        F.col("n").cast("long").alias("n_events"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("n_buckets").cast("long").alias("n_hour_buckets"),
        ((F.col("n_types") - 1) * (F.col("n_buckets") - 1))
        .cast("long")
        .alias("dof"),
        F.expr("CAST(greatest(term_sum - 1000 * n, 0) AS DECIMAL(38,0))").alias(
            "chi2_raw"
        ),
        F.expr(
            "CAST(CASE WHEN least(n_types, n_buckets) > 1"
            " THEN div(greatest(term_sum - 1000 * n, 0),"
            "          n * (least(n_types, n_buckets) - 1))"
            " END AS BIGINT)"
        ).alias("cramer_v2_permille"),
    ).select(
        "n_events",
        "n_types",
        "n_hour_buckets",
        "dof",
        F.col("chi2_raw").cast("long").alias("chi2_permille"),
        "cramer_v2_permille",
        F.expr(
            f"CASE WHEN cramer_v2_permille IS NULL THEN 'undefined'"
            f" WHEN cramer_v2_permille >= {CRAMER_STRONG_PERMILLE} THEN 'strong'"
            f" WHEN cramer_v2_permille >= {CRAMER_WEAK_PERMILLE} THEN 'weak'"
            f" ELSE 'negligible' END"
        ).alias("assoc_label"),
    )
    return out


EVENT_INDEPENDENCE_SQL = f"""
WITH cells AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         CAST(COUNT(*) AS HUGEINT) AS o
  FROM events GROUP BY event_type, hour(ts)
), scored AS (
  SELECT event_type, hod,
         SUM(o) OVER () AS n,
         (1000 * SUM(o) OVER () * o * o)
           // (SUM(o) OVER (PARTITION BY event_type)
               * SUM(o) OVER (PARTITION BY hod)) AS term
  FROM cells
), agg AS (
  SELECT MAX(n) AS n,
         CAST(COUNT(DISTINCT event_type) AS HUGEINT) AS n_types,
         CAST(COUNT(DISTINCT hod) AS HUGEINT) AS n_buckets,
         SUM(term) AS term_sum
  FROM scored
), out AS (
  SELECT CAST(n AS BIGINT) AS n_events,
         CAST(n_types AS BIGINT) AS n_types,
         CAST(n_buckets AS BIGINT) AS n_hour_buckets,
         CAST((n_types - 1) * (n_buckets - 1) AS BIGINT) AS dof,
         CAST(greatest(term_sum - 1000 * n, 0) AS BIGINT) AS chi2_permille,
         CAST(CASE WHEN least(n_types, n_buckets) > 1
                   THEN greatest(term_sum - 1000 * n, 0)
                        // (n * (least(n_types, n_buckets) - 1))
              END AS BIGINT) AS cramer_v2_permille
  FROM agg
)
SELECT n_events, n_types, n_hour_buckets, dof, chi2_permille,
       cramer_v2_permille,
       CASE WHEN cramer_v2_permille IS NULL THEN 'undefined'
            WHEN cramer_v2_permille >= {CRAMER_STRONG_PERMILLE} THEN 'strong'
            WHEN cramer_v2_permille >= {CRAMER_WEAK_PERMILLE} THEN 'weak'
            ELSE 'negligible' END AS assoc_label
FROM out
"""


# --------------------------------------------- weekly retention curve


def user_retention_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over the EVENT stream: users cohorted by
    first-seen epoch week, the share still active N weeks later — the
    behavioral-analytics staple ([[cohort_retention]]'s orders-side
    monthly grid has no events-side twin until this; purchase cadence
    and product usage retain differently, and growth teams read both).

    Exactness: epoch week = ``div(epoch_day, 7)`` on integer epoch days
    (no week-of-year calendar semantics to cross-match — ISO weeks
    disagree across engines at year boundaries); age = week − cohort
    week; every cell is a distinct-user count and cohort size is the
    age-0 cell (every user is active in their own first week by
    construction, so retention_permille(0) = 1000 — the built-in sanity
    diagonal).

    Scale shape: one corpus-grain distinct fold to (user, week) grain,
    a user-grain min, then a (cohort, age)-grain count — all
    map-side-combinable after the user_id shuffle."""
    ev = table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr(
            "div(div(unix_micros(CAST(ts AS TIMESTAMP)), 86400000000), 7)"
        ).alias("week"),
    ).distinct()
    w0 = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    cells = (
        uw.join(w0, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("age_weeks"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_retained"))
    )
    sizes = cells.filter(F.col("age_weeks") == 0).select(
        "cohort_week", F.col("n_retained").alias("cohort_size")
    )
    return (
        cells.join(sizes, "cohort_week")
        .select(
            "cohort_week",
            "age_weeks",
            "n_retained",
            "cohort_size",
            F.expr("div(1000 * n_retained, cohort_size)").alias(
                "retention_permille"
            ),
        )
        .orderBy("cohort_week", "age_weeks")
    )


RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_us(ts) // 86400000000) // 7 AS week
  FROM events
), w0 AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
), cells AS (
  SELECT w0.cohort_week, uw.week - w0.cohort_week AS age_weeks,
         CAST(COUNT(*) AS BIGINT) AS n_retained
  FROM uw JOIN w0 ON uw.user_id = w0.user_id
  GROUP BY w0.cohort_week, uw.week - w0.cohort_week
), sizes AS (
  SELECT cohort_week, n_retained AS cohort_size FROM cells WHERE age_weeks = 0
)
SELECT c.cohort_week, c.age_weeks, c.n_retained, s.cohort_size,
       CAST((1000 * c.n_retained) // s.cohort_size AS BIGINT)
         AS retention_permille
FROM cells c JOIN sizes s ON s.cohort_week = c.cohort_week
ORDER BY c.cohort_week, c.age_weeks
"""


# --------------------------------------------- funnel step latency

FUNNEL_STEPS = ("view", "click", "purchase")
LATENCY_QUANTILES = (500, 900)


def funnel_latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution per adjacent funnel step pair
    (view→click, click→purchase): median and p90 seconds between a
    user's FIRST occurrence of each step, over users who performed the
    steps in order — [[events_funnel]] counts WHO converts, this says
    HOW LONG conversion takes (the number an SLA or a remarketing-delay
    decision actually needs).

    Exactness: first-occurrence epochs are conditional integer mins
    (the funnel convention); latencies are integer SECONDS
    ``div(Δus, 10⁶)`` (non-negative by the in-order filter); quantiles
    are exact rank-based values at integer-ceiling ranks (the Theil–Sen
    convention); SUMS emitted beside counts.

    Scale shape: one user-grain conditional aggregate (map-side
    combinable), then per-step-pair rank windows over converting-user
    rows (the order_gap_stats cost class)."""
    from pyspark.sql import Window as W

    ev = table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(
                F.when(
                    F.col("event_type") == t,
                    F.expr("unix_micros(CAST(ts AS TIMESTAMP))"),
                )
            ).alias(f"t_{t}")
            for t in FUNNEL_STEPS
        ]
    )
    legs = []
    for a, b in zip(FUNNEL_STEPS, FUNNEL_STEPS[1:]):
        legs.append(
            firsts.filter(
                F.col(f"t_{a}").isNotNull()
                & F.col(f"t_{b}").isNotNull()
                & (F.col(f"t_{a}") < F.col(f"t_{b}"))
            ).select(
                F.lit(f"{a}->{b}").alias("leg"),
                F.expr(f"div(t_{b} - t_{a}, 1000000)").alias("lat_s"),
            )
        )
    lat = legs[0]
    for l in legs[1:]:
        lat = lat.unionByName(l)
    wl = W.partitionBy("leg").orderBy("lat_s")
    ranked = lat.select(
        "leg",
        "lat_s",
        F.row_number().over(wl).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("leg")).alias("n_users"),
    )
    picks = [
        F.max(
            F.when(
                F.col("rn") == F.expr(f"CAST(div({p} * n_users + 999, 1000) AS BIGINT)"),
                F.col("lat_s"),
            )
        ).alias(f"lat_p{p}_s")
        for p in LATENCY_QUANTILES
    ]
    return (
        ranked.groupBy("leg")
        .agg(
            F.max("n_users").cast("long").alias("n_users"),
            F.sum("lat_s").cast("long").alias("lat_sum_s"),
            *picks,
        )
        .orderBy("leg")
    )


def _funnel_latency_sql() -> str:
    legs = []
    for a, b in zip(FUNNEL_STEPS, FUNNEL_STEPS[1:]):
        legs.append(f"""
  SELECT '{a}->{b}' AS leg, (t_{b} - t_{a}) // 1000000 AS lat_s
  FROM firsts WHERE t_{a} IS NOT NULL AND t_{b} IS NOT NULL AND t_{a} < t_{b}""")
    mins = ",\n         ".join(
        f"MIN(CASE WHEN event_type = '{t}' THEN epoch_us(ts) END) AS t_{t}"
        for t in FUNNEL_STEPS
    )
    picks = ",\n       ".join(
        f"MAX(CASE WHEN rn = ({p} * n_users + 999) // 1000"
        f" THEN lat_s END) AS lat_p{p}_s"
        for p in LATENCY_QUANTILES
    )
    union = "\n  UNION ALL".join(legs)
    return f"""
WITH firsts AS (
  SELECT user_id,
         {mins}
  FROM events GROUP BY user_id
), lat AS ({union}
), ranked AS (
  SELECT leg, lat_s,
         ROW_NUMBER() OVER (PARTITION BY leg ORDER BY lat_s) AS rn,
         COUNT(*) OVER (PARTITION BY leg) AS n_users
  FROM lat
)
SELECT leg,
       CAST(MAX(n_users) AS BIGINT) AS n_users,
       CAST(SUM(lat_s) AS BIGINT) AS lat_sum_s,
       {picks}
FROM ranked GROUP BY leg ORDER BY leg
"""


FUNNEL_LATENCY_SQL = _funnel_latency_sql()


# --------------------------------------------- last-touch attribution

ATTRIBUTION_WINDOW_S = 30 * 60  # the sessionize gap: a touch older is organic


def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the user's most
    recent non-purchase event within the attribution window (the
    sessionize gap), else counts as organic — the marketing-analytics
    staple that [[events_funnel]] (who converts) and
    [[funnel_latency_stats]] (how fast) lead up to: WHICH touch gets
    the credit.

    Exactness: the preceding touch comes from ``last(..., ignorenulls)``
    over the user-ordered frame ending 1 row before the purchase —
    deterministic because the frame order (ts, event_id) is total; the
    window test is an integer microsecond comparison; every output is a
    count or floor-div permille.

    Scale shape: ONE user-partitioned ordered window over the event
    stream (two conditional last() calls from the same frame), then a
    ≤|types|-row grouped count."""
    ev = table(spark, sf_dir, "events")
    us = F.expr("unix_micros(CAST(ts AS TIMESTAMP))")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    touch_type = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    touch_us = F.last(
        F.when(F.col("event_type") != "purchase", us), ignorenulls=True
    ).over(w)
    purchases = (
        ev.select(
            "event_type",
            (us).alias("p_us"),
            touch_type.alias("t_type"),
            touch_us.alias("t_us"),
        )
        .filter(F.col("event_type") == "purchase")
        .select(
            F.when(
                F.col("t_us").isNotNull()
                & (F.col("p_us") - F.col("t_us") <= ATTRIBUTION_WINDOW_S * 1_000_000),
                F.col("t_type"),
            )
            .otherwise(F.lit("organic"))
            .alias("attributed_to")
        )
    )
    wt = W.partitionBy()
    return (
        purchases.groupBy("attributed_to")
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
        .withColumn("total", F.sum("n_purchases").over(wt))
        .select(
            "attributed_to",
            "n_purchases",
            F.expr("div(1000 * n_purchases, total)").alias("share_permille"),
        )
        .orderBy("attributed_to")
    )


ATTRIBUTION_SQL = f"""
WITH touched AS (
  SELECT event_type,
         epoch_us(ts) AS p_us,
         LAST_VALUE(CASE WHEN event_type != 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS t_type,
         LAST_VALUE(CASE WHEN event_type != 'purchase' THEN epoch_us(ts) END
                    IGNORE NULLS) OVER w AS t_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), attributed AS (
  SELECT CASE WHEN t_us IS NOT NULL
              AND p_us - t_us <= {ATTRIBUTION_WINDOW_S * 1_000_000}
              THEN t_type ELSE 'organic' END AS attributed_to
  FROM touched WHERE event_type = 'purchase'
), counts AS (
  SELECT attributed_to, CAST(COUNT(*) AS BIGINT) AS n_purchases
  FROM attributed GROUP BY attributed_to
)
SELECT attributed_to, n_purchases,
       CAST((1000 * n_purchases) // SUM(n_purchases) OVER () AS BIGINT)
         AS share_permille
FROM counts ORDER BY attributed_to
"""


# --------------------------------------------- SLO burn-rate alerts

SLO_TARGET_PERMILLE = 20   # error budget: 2% of events may be errors
SLO_FAST_BURN = 6          # 1h AND 6h both > 6x target -> page
SLO_SLOW_BURN = 3          # 6h AND 24h both > 3x target -> ticket
SLO_WINDOWS = (6, 24)      # trailing observed-hour window lengths


def slo_burn_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window error burn-rate readout (the SRE-workbook alert
    shape): per hour, the error share over the hour itself and the
    trailing 6 h / 24 h observed-hour windows, with the fast-burn (page)
    and slow-burn (ticket) flags — [[event_cusum_drift]] localizes a
    rate SHIFT in any one type; this reads the 'error' type against an
    explicit BUDGET, the on-call contract.

    Exactness: error shares are ``div(1000·e, t)`` over exact rollup
    counts; trailing windows are POSITIONAL over observed hours (the
    ACF/CUSUM convention — silent hours carry no traffic and no error
    budget); both burn tests are integer comparisons with the budget
    cleared (``1000·e·1 > BURN·TARGET·t`` avoids dividing at all in the
    flag path... emitted shares divide once for the readout).

    Scale shape: one corpus-grain rollup collapsed to hour grain, then
    ONE ordered window over hour-grain rows (rollup-sized — bounded by
    the time span, never the corpus)."""
    return slo_burn_from_rollup(hourly_rollup(table(spark, sf_dir, "events")))


SLO_BURN_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS BIGINT) AS t_h,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
           AS e_h
  FROM events GROUP BY date_trunc('hour', ts)
), win AS (
  SELECT hour, t_h, e_h,
         SUM(t_h) OVER (ORDER BY hour ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS t6,
         SUM(e_h) OVER (ORDER BY hour ROWS BETWEEN 5 PRECEDING AND CURRENT ROW) AS e6,
         SUM(t_h) OVER (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS t24,
         SUM(e_h) OVER (ORDER BY hour ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS e24
  FROM hourly
)
SELECT hour, t_h, e_h,
       CAST((1000 * e_h) // t_h AS BIGINT) AS err_permille,
       CAST((1000 * e6) // t6 AS BIGINT) AS err6_permille,
       CAST((1000 * e24) // t24 AS BIGINT) AS err24_permille,
       1000 * e_h > {SLO_FAST_BURN * SLO_TARGET_PERMILLE} * t_h
         AND 1000 * e6 > {SLO_FAST_BURN * SLO_TARGET_PERMILLE} * t6 AS fast_burn,
       1000 * e6 > {SLO_SLOW_BURN * SLO_TARGET_PERMILLE} * t6
         AND 1000 * e24 > {SLO_SLOW_BURN * SLO_TARGET_PERMILLE} * t24 AS slow_burn
FROM win ORDER BY hour
"""


def slo_burn_from_rollup(hourly_typed: DataFrame) -> DataFrame:
    """Window tail over the (event_type, hour) rollup (shared with the
    streaming drain — the temporal battery's state feeds this too)."""
    hourly = hourly_typed.groupBy("hour").agg(
        F.sum("c").cast("long").alias("t_h"),
        F.sum(F.when(F.col("event_type") == "error", F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("e_h"),
    )
    wo = W.partitionBy().orderBy("hour")
    windows = hourly.select(
        "hour",
        "t_h",
        "e_h",
        *[
            c
            for k in SLO_WINDOWS
            for c in (
                F.sum("t_h").over(wo.rowsBetween(-(k - 1), 0)).alias(f"t{k}"),
                F.sum("e_h").over(wo.rowsBetween(-(k - 1), 0)).alias(f"e{k}"),
            )
        ],
    )
    tgt = SLO_TARGET_PERMILLE
    return windows.select(
        "hour",
        "t_h",
        "e_h",
        F.expr("div(1000 * e_h, t_h)").alias("err_permille"),
        F.expr("div(1000 * e6, t6)").alias("err6_permille"),
        F.expr("div(1000 * e24, t24)").alias("err24_permille"),
        F.expr(
            f"1000 * e_h > {SLO_FAST_BURN * tgt} * t_h"
            f" AND 1000 * e6 > {SLO_FAST_BURN * tgt} * t6"
        ).alias("fast_burn"),
        F.expr(
            f"1000 * e6 > {SLO_SLOW_BURN * tgt} * t6"
            f" AND 1000 * e24 > {SLO_SLOW_BURN * tgt} * t24"
        ).alias("slow_burn"),
    ).orderBy("hour")


# --------------------------------------------- value percentiles

VALUE_QUANTILES = (500, 900, 990)


def value_percentiles_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of the event value per type — the latency-percentile
    dashboard row (the single most-read ops query there is), done with
    EXACT rank-based quantiles instead of an approximate sketch:
    [[events_hourly_stats]] sums value, this distributes it.

    Exactness: values quantize ONCE to milli-units (``floor(value·1000)``
    — floor, not cast, the house rule) so ranking and the emitted
    numbers are integers; quantiles are values at integer-ceiling ranks
    (the Theil–Sen convention); NULL/NaN values are excluded and
    counted (NaN ordering differs across engines — they never reach the
    rank window).

    Scale shape: one rank window per type over the event stream (the
    robust_length_stats cost class — range-partitioned at scale; the
    exact-quantile audit configuration next to the sketch family's
    hash_sample_quantiles scale path)."""
    return value_percentiles_from_hist(
        value_hist(table(spark, sf_dir, "events"))
    )


def value_hist(ev: DataFrame) -> DataFrame:
    """(event_type, v_milli) counts — ADDITIVE across any corpus split,
    so it is also the staged unit of the streaming twin
    (streaming/percentiles.py).  Value-grain, not row-grain: the state
    and the rank window scale with DISTINCT values, not events."""
    vals = ev.select(
        "event_type",
        F.expr("CAST(floor(value * 1000) AS BIGINT)").alias("v_milli"),
        "value",
    ).filter(
        F.col("v_milli").isNotNull()
        & ~F.isnan(F.col("value"))
        # +/-Inf excluded like NaN: DuckDB's CAST(floor(inf*1000) AS
        # BIGINT) raises, Spark's non-ANSI cast saturates to Long.MAX —
        # neither is a value; both engines drop and count them together.
        & (F.abs(F.col("value")) != float("inf"))
    )
    return vals.groupBy("event_type", "v_milli").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def value_percentiles_from_hist(hist: DataFrame) -> DataFrame:
    """Cumulative-rank tail over the value histogram (shared with the
    streaming drain): quantile = smallest value whose cumulative count
    reaches the integer-ceiling rank."""
    wt = W.partitionBy("event_type").orderBy("v_milli")
    cum = hist.select(
        "event_type",
        "v_milli",
        "c",
        F.sum("c").over(wt).alias("cum"),
        F.sum("c").over(W.partitionBy("event_type")).alias("n"),
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"CAST(div({p} * n + 999, 1000) AS BIGINT)"),
                F.col("v_milli"),
            )
        ).alias(f"p{p}_milli")
        for p in VALUE_QUANTILES
    ]
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n_values"),
            F.sum(F.col("v_milli") * F.col("c")).cast("long").alias("sum_milli"),
            *picks,
        )
        .orderBy("event_type")
    )


def _value_percentiles_sql() -> str:
    picks = ",\n       ".join(
        f"MIN(CASE WHEN cum >= ({p} * n + 999) // 1000"
        f" THEN v_milli END) AS p{p}_milli"
        for p in VALUE_QUANTILES
    )
    return f"""
WITH vals AS (
  SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS v_milli
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(value) AND NOT isinf(value)
), hist AS (
  SELECT event_type, v_milli, CAST(COUNT(*) AS BIGINT) AS c
  FROM vals GROUP BY event_type, v_milli
), cum AS (
  SELECT event_type, v_milli, c,
         SUM(c) OVER (PARTITION BY event_type ORDER BY v_milli) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_values,
       CAST(SUM(v_milli * c) AS BIGINT) AS sum_milli,
       {picks}
FROM cum GROUP BY event_type ORDER BY event_type
"""


VALUE_PERCENTILES_SQL = _value_percentiles_sql()


# --------------------------------------------- bot triage composite

BOT_MONOTYPE_PERMILLE = 900   # one type ≥ 90% of the user's events
BOT_BURST_X = 10              # peak hour ≥ 10× the user's own hourly mean
BOT_CLOCKWORK_PERMILLE = 500  # ≥ 50% of events at one minute-of-hour
BOT_MIN_EVENTS = 20           # below this, flags are noise: unscored


def bot_score_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite bot-triage scoreboard: three per-user behavioral flags
    — MONOTYPE (one event type dominates: scrapers click, humans mix),
    BURST (the user's peak hour dwarfs their own mean rate:
    [[event_burstiness_stats]]' dispersion read at USER grain), and
    CLOCKWORK (events concentrate on one minute-of-hour: cron fires at
    :00, people don't) — summed to a 0–3 score with user counts per
    score and per-flag prevalence.  The corpus-level detectors say THAT
    something is off; this is the per-account gate a ban pipeline
    consumes.

    Exactness: every flag is a cleared integer comparison over exact
    counts (``1000·max_type ≥ 900·n``, ``peak·h_active ≥ 10·n``,
    ``1000·max_minute ≥ 500·n``); users under {BOT_MIN_EVENTS} events
    are 'unscored' (score −1) rather than silently flag-free.

    Scale shape: three (user × small-domain) grouped counts sharing the
    user_id shuffle key, folded to user grain, one ≤5-row scoreboard."""
    return bot_score_from_partials(bot_partials(table(spark, sf_dir, "events")))


def bot_partials(ev: DataFrame) -> DataFrame:
    """(user_id, kind, k, c) long-format counts over the three flag
    domains (kind 't' = event_type, 'h' = epoch hour, 'm' = minute-of-
    hour) — ADDITIVE across any corpus split, so this is also the staged
    unit of the streaming twin (streaming/botscore.py)."""
    base = ev.select(
        "user_id",
        "event_type",
        F.expr("div(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)").alias("eh"),
        F.minute("ts").alias("moh"),
    )
    long = (
        base.select("user_id", F.lit("t").alias("kind"),
                    F.col("event_type").alias("k"))
        .unionByName(
            base.select("user_id", F.lit("h").alias("kind"),
                        F.col("eh").cast("string").alias("k")))
        .unionByName(
            base.select("user_id", F.lit("m").alias("kind"),
                        F.col("moh").cast("string").alias("k")))
    )
    return long.groupBy("user_id", "kind", "k").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )


def bot_score_from_partials(p: DataFrame) -> DataFrame:
    """Score tail over the summed partials (shared with the drain)."""
    per_kind = p.groupBy("user_id", "kind").agg(
        F.sum("c").cast("long").alias("n"),
        F.max("c").cast("long").alias("mx"),
        F.count(F.lit(1)).cast("long").alias("kk"),
    )
    per_user = per_kind.groupBy("user_id").agg(
        *[
            F.max(F.when(F.col("kind") == kd, F.col(col))).alias(f"{col}_{kd}")
            for kd in ("t", "h", "m")
            for col in ("n", "mx", "kk")
        ]
    ).select(
        "user_id",
        F.col("n_t").alias("n"),
        F.expr(f"1000 * mx_t >= {BOT_MONOTYPE_PERMILLE} * n_t").alias("f_mono"),
        F.expr(f"mx_h * kk_h >= {BOT_BURST_X} * n_h").alias("f_burst"),
        F.expr(f"1000 * mx_m >= {BOT_CLOCKWORK_PERMILLE} * n_m").alias("f_clock"),
    ).select(
        "user_id",
        F.expr(
            f"CASE WHEN n < {BOT_MIN_EVENTS} THEN -1"
            " ELSE CAST(f_mono AS INT) + CAST(f_burst AS INT)"
            " + CAST(f_clock AS INT) END"
        ).cast("long").alias("bot_score"),
        F.expr(f"n >= {BOT_MIN_EVENTS} AND f_mono").alias("mono"),
        F.expr(f"n >= {BOT_MIN_EVENTS} AND f_burst").alias("burst"),
        F.expr(f"n >= {BOT_MIN_EVENTS} AND f_clock").alias("clock"),
    )
    wt = W.partitionBy()
    return (
        per_user.groupBy("bot_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum(F.col("mono").cast("long")).cast("long").alias("n_monotype"),
            F.sum(F.col("burst").cast("long")).cast("long").alias("n_burst"),
            F.sum(F.col("clock").cast("long")).cast("long").alias("n_clockwork"),
        )
        .withColumn("total", F.sum("n_users").over(wt))
        .select(
            "bot_score",
            "n_users",
            F.expr("div(1000 * n_users, total)").alias("share_permille"),
            "n_monotype",
            "n_burst",
            "n_clockwork",
        )
        .orderBy("bot_score")
    )


BOT_SCORE_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type,
         epoch_us(ts) // 3600000000 AS eh,
         minute(ts) AS moh
  FROM events
), by_type AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_t, CAST(MAX(c) AS BIGINT) AS max_t,
         CAST(COUNT(*) AS BIGINT) AS k_t
  FROM (SELECT user_id, event_type, COUNT(*) AS c FROM ev
        GROUP BY user_id, event_type) GROUP BY user_id
), by_hour AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_h, CAST(MAX(c) AS BIGINT) AS max_h,
         CAST(COUNT(*) AS BIGINT) AS k_h
  FROM (SELECT user_id, eh, COUNT(*) AS c FROM ev
        GROUP BY user_id, eh) GROUP BY user_id
), by_min AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_m, CAST(MAX(c) AS BIGINT) AS max_m,
         CAST(COUNT(*) AS BIGINT) AS k_m
  FROM (SELECT user_id, moh, COUNT(*) AS c FROM ev
        GROUP BY user_id, moh) GROUP BY user_id
), per_user AS (
  SELECT t.user_id,
         CASE WHEN t.n_t < {BOT_MIN_EVENTS} THEN -1
              ELSE CAST(1000 * t.max_t >= {BOT_MONOTYPE_PERMILLE} * t.n_t AS INT)
                 + CAST(h.max_h * h.k_h >= {BOT_BURST_X} * h.n_h AS INT)
                 + CAST(1000 * m.max_m >= {BOT_CLOCKWORK_PERMILLE} * m.n_m AS INT)
              END AS bot_score,
         t.n_t >= {BOT_MIN_EVENTS}
           AND 1000 * t.max_t >= {BOT_MONOTYPE_PERMILLE} * t.n_t AS mono,
         t.n_t >= {BOT_MIN_EVENTS}
           AND h.max_h * h.k_h >= {BOT_BURST_X} * h.n_h AS burst,
         t.n_t >= {BOT_MIN_EVENTS}
           AND 1000 * m.max_m >= {BOT_CLOCKWORK_PERMILLE} * m.n_m AS clock
  FROM by_type t
  JOIN by_hour h ON h.user_id = t.user_id
  JOIN by_min m ON m.user_id = t.user_id
), board AS (
  SELECT CAST(bot_score AS BIGINT) AS bot_score,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CASE WHEN mono THEN 1 ELSE 0 END) AS BIGINT) AS n_monotype,
         CAST(SUM(CASE WHEN burst THEN 1 ELSE 0 END) AS BIGINT) AS n_burst,
         CAST(SUM(CASE WHEN clock THEN 1 ELSE 0 END) AS BIGINT) AS n_clockwork
  FROM per_user GROUP BY bot_score
)
SELECT bot_score, n_users,
       CAST((1000 * n_users) // SUM(n_users) OVER () AS BIGINT) AS share_permille,
       n_monotype, n_burst, n_clockwork
FROM board ORDER BY bot_score
"""


# --------------------------------------------- DAU/WAU/MAU stickiness

WAU_DAYS = 7
MAU_DAYS = 30


def active_user_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth dashboard's top row: per day, DAU / trailing-7d WAU /
    trailing-30d MAU, the DAU/MAU stickiness ratio, and the
    new-vs-returning split — [[user_retention_curve]] reads cohorts,
    this reads the aggregate pulse (stickiness ≈ 1000·DAU/MAU is THE
    engagement north-star metric).

    Exactness: integer epoch days; the trailing windows are built by
    EXPLODING each distinct (user, day) pair to the ≤30 future days it
    contributes to and equi-joining on the target day (a BETWEEN range
    join would be a nested-loop hazard; the explode is rollup-grain ×30,
    never event-grain), then conditional COUNT(DISTINCT) per target day;
    'new' means first-ever appearance (min day per user).  Target days
    inner-join the observed-day panel, so the ramp past the corpus edge
    never emits phantom rows.

    Scale shape: one corpus-grain distinct fold to (user, day), a
    user-grain min, a ×30 rollup-grain explode, one grouped aggregate
    with three conditional distincts — all keyed shuffles, no
    broadcast-nested-loop anywhere."""
    ev = table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.expr("div(unix_micros(CAST(ts AS TIMESTAMP)), 86400000000)").alias("day"),
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("day").alias("first_day"))
    days = uw.select("day").distinct()
    contrib = (
        uw.select(
            "user_id",
            "day",
            F.explode(F.sequence(F.lit(0), F.lit(MAU_DAYS - 1))).alias("off"),
        )
        .select("user_id", "day", (F.col("day") + F.col("off")).alias("d"), "off")
        .join(days.withColumnRenamed("day", "d"), "d")
    )
    per_day = contrib.groupBy("d").agg(
        F.countDistinct(F.when(F.col("off") == 0, F.col("user_id"))).cast("long").alias("dau"),
        F.countDistinct(F.when(F.col("off") < WAU_DAYS, F.col("user_id"))).cast("long").alias("wau"),
        F.countDistinct("user_id").cast("long").alias("mau"),
    )
    new_per_day = (
        uw.join(first, "user_id")
        .filter(F.col("day") == F.col("first_day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
    )
    return (
        per_day.join(new_per_day.withColumnRenamed("day", "d"), "d", "left")
        .select(
            F.col("d").alias("day"),
            "dau",
            "wau",
            "mau",
            F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new"),
            (F.col("dau") - F.coalesce("n_new", F.lit(0))).cast("long").alias("n_returning"),
            F.expr("div(1000 * dau, mau)").alias("stickiness_permille"),
        )
        .orderBy("day")
    )


STICKINESS_SQL = f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
), first_day AS (
  SELECT user_id, MIN(day) AS first_day FROM uw GROUP BY user_id
), days AS (
  SELECT DISTINCT day AS d FROM uw
), contrib AS (
  SELECT uw.user_id, uw.day, uw.day + t.off AS d, t.off
  FROM uw, (SELECT UNNEST(range({MAU_DAYS})) AS off) t
  JOIN days ON days.d = uw.day + t.off
), per_day AS (
  SELECT d,
         CAST(COUNT(DISTINCT CASE WHEN off = 0 THEN user_id END) AS BIGINT) AS dau,
         CAST(COUNT(DISTINCT CASE WHEN off < {WAU_DAYS} THEN user_id END) AS BIGINT) AS wau,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
  FROM contrib GROUP BY d
), new_per_day AS (
  SELECT uw.day AS d, CAST(COUNT(*) AS BIGINT) AS n_new
  FROM uw JOIN first_day f ON f.user_id = uw.user_id AND uw.day = f.first_day
  GROUP BY uw.day
)
SELECT p.d AS day, p.dau, p.wau, p.mau,
       COALESCE(n.n_new, 0) AS n_new,
       p.dau - COALESCE(n.n_new, 0) AS n_returning,
       CAST((1000 * p.dau) // p.mau AS BIGINT) AS stickiness_permille
FROM per_day p LEFT JOIN new_per_day n ON n.d = p.d
ORDER BY p.d
"""


# ------------------------------------------ transition predictability

PREDICTABLE_PERMILLE = 300   # gini below this -> next step is near-scripted


def transition_predictability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How PREDICTABLE is the next step after each event type — the Gini
    impurity of every row of [[event_transition_matrix]] (log-free
    entropy analog, the [[user_type_gini]] convention at transition
    grain): impurity 0 means X is always followed by the same type (a
    scripted flow or a bot), high impurity means genuinely open
    behavior.  The one-number-per-row summary the |types|² matrix is
    usually squinted at for.

    Exactness: gini = (T² − Σc²)·1000 div T² over exact session-bounded
    transition counts (decimal(38,0)/HUGEINT for the squares); the top
    next-step and its share ride along with a deterministic (count
    desc, to_type) tie-break.

    Scale shape: the transition matrix's own cost (one user window +
    one grouped count), then |types|-grain algebra."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    trans = (
        ev.select(
            F.col("event_type").alias("to_type"),
            F.lag("event_type").over(w).alias("from_type"),
            gap_us.alias("gap_us"),
        )
        .filter(
            F.col("from_type").isNotNull()
            & (F.col("gap_us") <= SESSION_GAP_SECONDS * 1_000_000)
        )
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("c"))
    )
    wr = W.partitionBy("from_type").orderBy(F.desc("c"), "to_type")
    rows = trans.withColumn("rn", F.row_number().over(wr))
    agg = rows.groupBy("from_type").agg(
        F.sum("c").alias("t"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("s2"),
        F.max(F.when(F.col("rn") == 1, F.col("to_type"))).alias("top_next"),
        F.max(F.when(F.col("rn") == 1, F.col("c"))).alias("top_c"),
        F.count(F.lit(1)).cast("long").alias("n_next_types"),
    )
    return agg.select(
        "from_type",
        F.col("t").cast("long").alias("n_transitions"),
        "n_next_types",
        "top_next",
        F.expr("div(1000 * top_c, t)").alias("top_share_permille"),
        F.expr("CAST(div((t * t - s2) * 1000, t * t) AS BIGINT)").alias(
            "gini_permille"
        ),
        F.expr(
            f"CAST(div((t * t - s2) * 1000, t * t) AS BIGINT)"
            f" < {PREDICTABLE_PERMILLE}"
        ).alias("scripted_flag"),
    ).orderBy("from_type")


TRANSITION_PREDICT_SQL = f"""
WITH lagged AS (
  SELECT event_type AS to_type,
         LAG(event_type) OVER w AS from_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), trans AS (
  SELECT from_type, to_type, CAST(COUNT(*) AS HUGEINT) AS c
  FROM lagged
  WHERE from_type IS NOT NULL AND gap_us <= {SESSION_GAP_SECONDS * 1_000_000}
  GROUP BY from_type, to_type
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY from_type
                               ORDER BY c DESC, to_type) AS rn
  FROM trans
), agg AS (
  SELECT from_type,
         SUM(c) AS t,
         SUM(c * c) AS s2,
         MAX(CASE WHEN rn = 1 THEN to_type END) AS top_next,
         MAX(CASE WHEN rn = 1 THEN c END) AS top_c,
         CAST(COUNT(*) AS BIGINT) AS n_next_types
  FROM ranked GROUP BY from_type
)
SELECT from_type,
       CAST(t AS BIGINT) AS n_transitions,
       n_next_types,
       top_next,
       CAST((1000 * top_c) // t AS BIGINT) AS top_share_permille,
       CAST(((t * t - s2) * 1000) // (t * t) AS BIGINT) AS gini_permille,
       CAST(((t * t - s2) * 1000) // (t * t) AS BIGINT)
         < {PREDICTABLE_PERMILLE} AS scripted_flag
FROM agg ORDER BY from_type
"""


# --------------------------------------------- peak concurrency


def peak_concurrency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-session load per hour: how many sessions (and users)
    were ACTIVE in each hour — the capacity-planning readout
    ([[events_hourly_stats]] counts events, which undercounts quiet
    long sessions and overcounts bursts; connection pools and license
    seats are sized on CONCURRENCY).  A session spanning three hours
    loads all three.

    Exactness: sessions are the sessionize convention (per-user gap
    split, integer epoch micros); each session explodes to the epoch
    hours in [first_hour, last_hour] (integer sequence — bounded by the
    session's real duration, and a session only spans hours it has
    events near by the gap bound); counts are exact.

    Scale shape: one user window (the sessionize pass), a session-grain
    min/max fold, a bounded hour explode, one grouped count per hour —
    plus the event-grain hourly count for the ratio column."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    w2 = W.partitionBy("user_id").orderBy("us", "event_id")
    sess = (
        ev.select(
            "user_id",
            "event_id",
            us.alias("us"),
            is_new.alias("is_new"),
        )
        .withColumn(
            "session_seq",
            F.sum("is_new").over(w2.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.expr("div(min(us), 3600000000)").alias("h_lo"),
            F.expr("div(max(us), 3600000000)").alias("h_hi"),
        )
    )
    active = sess.select(
        "user_id",
        F.explode(F.sequence(F.col("h_lo"), F.col("h_hi"))).alias("eh"),
    )
    conc = active.groupBy("eh").agg(
        F.count(F.lit(1)).cast("long").alias("n_active_sessions"),
        F.countDistinct("user_id").cast("long").alias("n_active_users"),
    )
    ev_hour = ev.groupBy(
        F.expr("div(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000)").alias("eh")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return (
        conc.join(ev_hour, "eh", "left")
        .select(
            "eh",
            "n_active_sessions",
            "n_active_users",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("eh")
    )


PEAK_CONCURRENCY_SQL = f"""
WITH base AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
), flagged AS (
  SELECT user_id, us, event_id,
         CASE WHEN us - LAG(us) OVER w IS NULL
              OR us - LAG(us) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), numbered AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
), sess AS (
  SELECT user_id, session_seq,
         MIN(us) // 3600000000 AS h_lo,
         MAX(us) // 3600000000 AS h_hi
  FROM numbered GROUP BY user_id, session_seq
), active AS (
  SELECT user_id, UNNEST(range(h_lo, h_hi + 1)) AS eh FROM sess
), conc AS (
  SELECT eh,
         CAST(COUNT(*) AS BIGINT) AS n_active_sessions,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active_users
  FROM active GROUP BY eh
), ev_hour AS (
  SELECT epoch_us(ts) // 3600000000 AS eh, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY epoch_us(ts) // 3600000000
)
SELECT c.eh, c.n_active_sessions, c.n_active_users,
       COALESCE(e.n_events, 0) AS n_events
FROM conc c LEFT JOIN ev_hour e ON e.eh = c.eh
ORDER BY c.eh
"""


# --------------------------------------------- seasonality strength


def seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each type's hourly-count variance the hour-of-day
    profile EXPLAINS — the one-way-ANOVA η² (length_anova's algebra on
    the rollup) with hour-of-day as the factor: [[event_acf_stats]]'
    lag-24 says periodicity EXISTS, this says how much of the variance
    it owns (η² ≈ 1000: a pure clock; ≈ 0: the daily profile is
    noise).  The number that decides whether an anomaly detector should
    deseasonalize before thresholding.

    Exactness: the ANOVA scatter split on exact rollup counts —
    ``ssb = GREATEST(Σ_g div(s_g², n_g) − div(S², N), 0)`` per type
    (per-group flooring, χ² convention), η² and F as floor-div
    permilles; groups are the type's OBSERVED (hod, count) rows (the
    positional-series convention of the battery).

    Scale shape: the shared corpus rollup, then (type × 24)-grain
    algebra — nothing beyond the battery's own cost."""
    hourly = hourly_rollup(table(spark, sf_dir, "events")).select(
        "event_type",
        F.hour("hour").cast("long").alias("hod"),
        F.col("c").cast("decimal(38,0)").alias("c"),
    )
    g = hourly.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_g"),
        F.sum("c").alias("s_g"),
        F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias("s2_g"),
    )
    tail = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("k"),
        F.sum("n_g").alias("n"),
        F.sum("s_g").alias("s"),
        F.sum("s2_g").alias("s2"),
        F.sum(F.expr("div(s_g * s_g, n_g)")).alias("gsum"),
    )
    split = tail.select(
        "event_type",
        "k",
        "n",
        F.expr("CAST(greatest(gsum - div(s * s, n), 0) AS DECIMAL(38,0))").alias(
            "ssb"
        ),
        F.expr("CAST(s2 - gsum AS DECIMAL(38,0))").alias("ssw"),
    )
    return split.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("k").cast("long").alias("n_hod_groups"),
        F.expr(
            "CAST(CASE WHEN ssb + ssw > 0 THEN div(1000 * ssb, ssb + ssw)"
            " END AS BIGINT)"
        ).alias("eta2_permille"),
        F.expr(
            "CAST(CASE WHEN k > 1 AND ssw > 0"
            " THEN div(1000 * ssb * (n - k), ssw * (k - 1)) END AS BIGINT)"
        ).alias("f_permille"),
    ).orderBy("event_type")


SEASONALITY_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(COUNT(*) AS HUGEINT) AS c
  FROM events GROUP BY event_type, date_trunc('hour', ts)
), g AS (
  SELECT event_type, CAST(hour(hour) AS BIGINT) AS hod,
         CAST(COUNT(*) AS HUGEINT) AS n_g,
         SUM(c) AS s_g,
         SUM(c * c) AS s2_g
  FROM hourly GROUP BY event_type, hour(hour)
), tail AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS k,
         SUM(n_g) AS n, SUM(s_g) AS s, SUM(s2_g) AS s2,
         SUM((s_g * s_g) // n_g) AS gsum
  FROM g GROUP BY event_type
), split AS (
  SELECT event_type, k, n,
         GREATEST(gsum - (s * s) // n, 0) AS ssb,
         s2 - gsum AS ssw
  FROM tail
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       CAST(k AS BIGINT) AS n_hod_groups,
       CAST(CASE WHEN ssb + ssw > 0 THEN (1000 * ssb) // (ssb + ssw)
            END AS BIGINT) AS eta2_permille,
       CAST(CASE WHEN k > 1 AND ssw > 0
            THEN (1000 * ssb * (n - k)) // (ssw * (k - 1)) END AS BIGINT)
         AS f_permille
FROM split ORDER BY event_type
"""


# --------------------------------------------- user activity histogram


def user_activity_fof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-of-frequencies of user activity in power-of-two bands:
    how many users had 1, 2–3, 4–7, … events — the engagement histogram
    ([[term_freq_of_freq]]'s Zipf readout at USER grain) whose shape IS
    the product story: a long 1-event head is drive-by traffic, a fat
    high band is whales (or bots — cross-read [[bot_score_stats]]).

    Exactness: the band is ``length(bin(k))`` (exact ceil-log2 of the
    integer event count — the column_encoding convention, no log in
    either engine); band bounds are 2^(b−1) … 2^b − 1; every output is
    a count or floor-div permille.

    Scale shape: one user-grain count (map-side combinable) then a
    ≤64-row band aggregate."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("k")
    )
    wt = W.partitionBy()
    return (
        per_user.groupBy(F.expr("CAST(length(bin(k)) AS BIGINT)").alias("band"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.sum("k").cast("long").alias("n_events"),
            F.min("k").cast("long").alias("min_events"),
            F.max("k").cast("long").alias("max_events"),
        )
        .withColumn("total_users", F.sum("n_users").over(wt))
        .withColumn("total_events", F.sum("n_events").over(wt))
        .select(
            "band",
            "n_users",
            "min_events",
            "max_events",
            F.expr("div(1000 * n_users, total_users)").alias("user_share_permille"),
            F.expr("div(1000 * n_events, total_events)").alias(
                "event_share_permille"
            ),
        )
        .orderBy("band")
    )


USER_FOF_SQL = """
WITH per_user AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM events GROUP BY user_id
), banded AS (
  SELECT CAST(length(bin(k)) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(k) AS BIGINT) AS n_events,
         CAST(MIN(k) AS BIGINT) AS min_events,
         CAST(MAX(k) AS BIGINT) AS max_events
  FROM per_user GROUP BY 1
)
SELECT band, n_users, min_events, max_events,
       CAST((1000 * n_users) // SUM(n_users) OVER () AS BIGINT)
         AS user_share_permille,
       CAST((1000 * n_events) // SUM(n_events) OVER () AS BIGINT)
         AS event_share_permille
FROM banded ORDER BY band
"""


# --------------------------------------------- session duration

SESSION_DUR_QUANTILES = (500, 900)


def session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-length distribution: exact p50/p90 duration seconds, the
    single-event (bounce) share, and events-per-session — the
    engagement-depth readout beside [[peak_concurrency_stats]]' load
    view (same sessions, the other axis: how LONG do people stay).

    Exactness: sessions per the sessionize convention; durations are
    integer seconds ``div(max_us − min_us, 10⁶)``; quantiles are exact
    rank-based values over a duration HISTOGRAM (the value_percentiles
    shape — the rank window scales with distinct durations).

    Scale shape: the sessionize window + a session-grain fold + a
    duration-histogram rank."""
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(
        gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1
    ).otherwise(0)
    w2 = W.partitionBy("user_id").orderBy("us", "event_id")
    sess = (
        ev.select("user_id", "event_id", us.alias("us"), is_new.alias("is_new"))
        .withColumn(
            "session_seq",
            F.sum("is_new").over(w2.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ev"),
            F.expr("div(max(us) - min(us), 1000000)").alias("dur_s"),
        )
    )
    hist = sess.groupBy("dur_s").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.sum("n_ev").cast("long").alias("ev"),
        F.sum((F.col("n_ev") == 1).cast("long")).cast("long").alias("bounces"),
    )
    wd = W.partitionBy().orderBy("dur_s")
    cum = hist.select(
        "dur_s",
        "c",
        "ev",
        "bounces",
        F.sum("c").over(wd).alias("cum"),
        F.sum("c").over(W.partitionBy()).alias("n"),
    )
    picks = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"CAST(div({p} * n + 999, 1000) AS BIGINT)"),
                F.col("dur_s"),
            )
        ).alias(f"dur_p{p}_s")
        for p in SESSION_DUR_QUANTILES
    ]
    return cum.groupBy().agg(
        F.max("n").cast("long").alias("n_sessions"),
        F.sum("ev").cast("long").alias("n_events"),
        F.sum("bounces").cast("long").alias("n_bounces"),
        *picks,
    ).select(
        "n_sessions",
        "n_events",
        "n_bounces",
        F.expr("div(1000 * n_bounces, n_sessions)").alias("bounce_permille"),
        F.expr("div(100 * n_events, n_sessions)").alias("events_per_session_centi"),
        f"dur_p{SESSION_DUR_QUANTILES[0]}_s",
        f"dur_p{SESSION_DUR_QUANTILES[1]}_s",
    )


SESSION_DURATION_SQL = f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN us - LAG(us) OVER w IS NULL
              OR us - LAG(us) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS is_new
  FROM base WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), numbered AS (
  SELECT user_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
), sess AS (
  SELECT user_id, session_seq,
         CAST(COUNT(*) AS BIGINT) AS n_ev,
         (MAX(us) - MIN(us)) // 1000000 AS dur_s
  FROM numbered GROUP BY user_id, session_seq
), hist AS (
  SELECT dur_s, CAST(COUNT(*) AS BIGINT) AS c,
         CAST(SUM(n_ev) AS BIGINT) AS ev,
         CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS bounces
  FROM sess GROUP BY dur_s
), cum AS (
  SELECT dur_s, c, ev, bounces,
         SUM(c) OVER (ORDER BY dur_s) AS cum,
         SUM(c) OVER () AS n
  FROM hist
)
SELECT CAST(MAX(n) AS BIGINT) AS n_sessions,
       CAST(SUM(ev) AS BIGINT) AS n_events,
       CAST(SUM(bounces) AS BIGINT) AS n_bounces,
       CAST((1000 * SUM(bounces)) // MAX(n) AS BIGINT) AS bounce_permille,
       CAST((100 * SUM(ev)) // MAX(n) AS BIGINT) AS events_per_session_centi,
       MIN(CASE WHEN cum >= (500 * n + 999) // 1000 THEN dur_s END) AS dur_p500_s,
       MIN(CASE WHEN cum >= (900 * n + 999) // 1000 THEN dur_s END) AS dur_p900_s
FROM cum
"""
