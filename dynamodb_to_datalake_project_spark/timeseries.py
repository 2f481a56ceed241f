"""Time-series operators Spark lacks as built-ins: as-of join,
gap-based sessionization, bucketed range join.

All three are expressed so the expensive step is a SINGLE bounded-key
shuffle — the shapes that survive 100 TB:

- as-of join: union both sides tagged, ONE window per key carries the
  last right-side value forward (`last(..., ignorenulls)`), filter the
  left tag back out. No join at all — the naive per-row "max ts <= t"
  subquery is a quadratic range join; the union-window form is one
  exchange on the key and a linear pass.
- sessionization: lag + running sum over one (user, time) window —
  session ids assigned in a single pass, aggregated with one more
  bounded-key shuffle.
- range join: equi-join on (key, time-bucket) after exploding each
  anchor to the few buckets its window spans — the cross product never
  materializes; candidate volume is |anchors| × buckets_per_window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_col: str,
    tiebreak: str,
    out_value: str = "asof_value",
) -> DataFrame:
    """For each left row, the most recent `value_col` from `right`
    with right.ts <= left.ts (inclusive), per `key`.

    Union-tag + window instead of a range join: right rows sort before
    left rows at equal timestamps (tag 0 < 1, giving the inclusive
    bound), `tiebreak` (a unique right-side column) makes same-ts
    right rows deterministic. Returns the left frame's columns plus
    `out_value`.
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None).cast(right.schema[value_col].dataType).alias("__v"),
    )
    r = right.select(
        *[
            (F.col(key) if c == key else F.lit(None).cast(left.schema[c].dataType)).alias(c)
            for c in lcols
        ],
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__tag"),
        F.col(tiebreak).alias("__tb"),
        F.col(value_col).alias("__v"),
    )
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__tag", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = l.unionByName(r)
    out = u.withColumn(out_value, F.last("__v", ignorenulls=True).over(w))
    return out.filter(F.col("__tag") == 1).select(*lcols, out_value)


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str,
    order_tiebreak: str,
    gap_us: int,
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event of the same `key` exceeds `gap_us` microseconds.
    Returns (key, session_num, session_start, session_end, n_events) —
    one ordered window pass plus one bounded-key aggregation.
    """
    w = Window.partitionBy(key).orderBy(ts_col, order_tiebreak)
    t = F.unix_micros(F.col(ts_col))
    gap = t - F.lag(t).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    run = Window.partitionBy(key).orderBy(ts_col, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    numbered = events.withColumn("session_num", F.sum(new_sess).over(run))
    return numbered.groupBy(key, "session_num").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
    )


def range_join_bucketed(
    anchors: DataFrame,
    events: DataFrame,
    key: str,
    anchor_ts: str,
    event_ts: str,
    window_us: int,
    anchor_id: str,
) -> DataFrame:
    """Count events per anchor with event_ts in (anchor_ts,
    anchor_ts + window_us), joined on `key`.

    Scale path: each event belongs to one fixed time bucket of width
    `window_us`; an anchor's window spans at most 2 such buckets, so the
    anchor side explodes ×2 and the join is a plain equi-join on
    (key, bucket) with the exact range applied after. Candidate volume
    is bounded by bucket co-membership — the inequality-only join Spark
    would otherwise plan (BroadcastNestedLoop / cartesian) never forms.
    Anchors with zero followers are absent (inner-join semantics).
    """
    a_t = F.unix_micros(F.col(anchor_ts))
    e_t = F.unix_micros(F.col(event_ts))
    a = anchors.select(
        F.col(anchor_id).alias("__aid"),
        F.col(key).alias("__k"),
        a_t.alias("__at"),
        F.explode(
            F.sequence(
                F.floor(a_t / window_us), F.floor((a_t + window_us) / window_us)
            )
        ).alias("__b"),
    )
    e = events.select(
        F.col(key).alias("__k"),
        e_t.alias("__et"),
        F.floor(e_t / window_us).alias("__b"),
    )
    return (
        a.join(e, ["__k", "__b"])
        .filter((F.col("__et") > F.col("__at")) & (F.col("__et") < F.col("__at") + window_us))
        .groupBy(F.col("__aid").alias(anchor_id), F.col("__k").alias(key))
        .agg(F.count("*").alias("n_follow"))
    )


# ---------------------------------------------------------------------------
# Catalog entries
# ---------------------------------------------------------------------------


@query(
    "asof_last_click",
    oracle="""
    WITH u AS (
      SELECT user_id, ts AS t, 0 AS tag, event_id, value FROM events
      WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, ts, 1, event_id, NULL FROM events
      WHERE event_type = 'purchase'
    ), w AS (
      SELECT *, last_value(value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
      FROM u
    )
    SELECT event_id AS purchase_id, user_id, t AS purchase_ts, asof_value
    FROM w WHERE tag = 1
    """,
)
def q_asof_last_click(spark, sf_dir):
    """As-of join: for every purchase, the value of the user's most
    recent click at or before it (NULL when no prior click) — the
    feature-attribution shape. Union-window form: zero joins, one
    exchange on user_id."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="purchase_ts",
        right_ts="ts",
        value_col="value",
        tiebreak="event_id",
    )


@query(
    "sessionization",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  > 1800000000 THEN 1
                  WHEN lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_num
      FROM g
    )
    SELECT user_id, CAST(session_num AS BIGINT) AS session_num,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_num
    """,
)
def q_sessionization(spark, sf_dir):
    """Gap-based sessionization (30-minute inactivity gap) over the
    event stream — the user-journey segmentation every behavioral
    pipeline needs; one window pass + one bounded-key aggregation."""
    ev = load_table(spark, sf_dir, "events")
    return sessionize(
        ev, key="user_id", ts_col="ts", order_tiebreak="event_id",
        gap_us=1800 * 1_000_000,
    ).withColumn("session_num", F.col("session_num").cast("long"))


@query(
    "range_join_follow_events",
    oracle="""
    SELECT a.event_id AS signup_id, a.user_id, count(*) AS n_follow
    FROM events a JOIN events e
      ON e.user_id = a.user_id
     AND epoch_us(e.ts) > epoch_us(a.ts)
     AND epoch_us(e.ts) < epoch_us(a.ts) + 3600000000
    WHERE a.event_type = 'signup'
    GROUP BY 1, 2
    """,
)
def q_range_join_follow(spark, sf_dir):
    """Range join: events-within-1-hour-after-each-signup, per user —
    the activation-funnel count. Bucketed equi-join; the inequality
    cross product never materializes."""
    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), "user_id", "ts"
    )
    return range_join_bucketed(
        anchors, ev, key="user_id", anchor_ts="ts", event_ts="ts",
        window_us=3600 * 1_000_000, anchor_id="signup_id",
    )


def combine_rollup_partials(
    stored: DataFrame, delta: DataFrame, keys: list[str], merge_agg=None
) -> DataFrame:
    """Continuous-aggregate maintenance step: merge a micro-batch's
    partial aggregates into the stored partials. Cost ∝ |rollup keys|,
    NEVER ∝ raw history: the raw event table is not rescanned.

    Every non-key column must be MERGEABLE: additive columns (counts,
    exact-decimal sums) merge via the default `F.sum`; non-additive
    mergeable summaries supply their own combine aggregate through
    `merge_agg` — a {column: fn(col_name) -> Column} mapping, e.g.
    `{"users_hll": F.hll_union_agg}` for DataSketches HLL distinct
    sketches (COUNT DISTINCT itself is NOT mergeable, which is exactly
    why the sketch column is stored instead).

    Reference parity: the reference keeps no aggregates at all (every
    Athena query rescans, README.rst "Analytics query"); this is the
    Spark-native continuous-aggregate upgrade, same shape as
    `rollup_timeseries`'s re-aggregation but incremental."""
    partial_cols = [c for c in stored.columns if c not in keys]
    merge_agg = merge_agg or {}
    return (
        stored.unionByName(delta)
        .groupBy(*keys)
        .agg(
            *[
                (merge_agg[c](c) if c in merge_agg else F.sum(c)).alias(c)
                for c in partial_cols
            ]
        )
    )


@query(
    "rollup_incremental",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY hour, event_type
    """,
)
def q_rollup_incremental(spark, sf_dir):
    """Incremental materialized-rollup refresh, driver-proved: events
    before 2024-01-20 play the stored rollup, the rest play the
    arriving CDC micro-batch; the batch's partials merge additively
    into the stored partials. The oracle aggregates ALL raw events
    directly — hash-equality proves refresh(stored, batch) ==
    full_recompute, the invariant that lets a 100 TB event table keep
    its dashboards incremental. Exact-decimal sums make the additive
    merge bit-stable in any accumulation order."""
    from dynamodb_to_datalake_project_spark.lake import load_table as _lt

    ev = _lt(spark, sf_dir, "events")
    cut = F.lit("2024-01-20 00:00:00").cast("timestamp")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("sum_value"),
        )

    # NULL-ts rows fall out of BOTH < and >= branches while the oracle
    # aggregates them into a NULL hour group — route them into the
    # stored branch so refresh == full_recompute holds on any fixture.
    stored = partials(ev.filter((F.col("ts") < cut) | F.col("ts").isNull()))
    batch = partials(ev.filter(F.col("ts") >= cut))
    merged = combine_rollup_partials(stored, batch, ["hour", "event_type"])
    return merged.select(
        "hour",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
    )


def funnel_conversion(
    events: DataFrame,
    steps: "list[str]",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel: how many users completed step k of
    `steps` STRICTLY AFTER completing step k-1 (the product-analytics
    primitive; order matters — a purchase before signup does not
    count). Returns (step_order, step, n_users), one row per step.

    Earliest-completion semantics: a user's step-k time is the
    earliest step-k event after their step-(k-1) time. Earliest
    completion is optimal here — delaying a prefix step can only
    shrink the set of valid later events — so this computes the same
    user set as "any monotone subsequence of the steps exists",
    making the result order-independent and exactly SQL-replayable.

    Scale shape: per step, one pushed-down type filter + one
    user-keyed min-aggregation + one user-keyed join against the
    previous stage (a user-sized, not event-sized, table). Every
    shuffle keys on the same user column so a real cluster reuses the
    partitioning across all k stages; nothing is ever windowed over
    the raw event stream and no per-user event array is collected."""
    if not steps:
        raise ValueError("funnel_conversion: empty step list")
    stage = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    sizes = [("1: " + steps[0], stage)]
    for k, s in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == s)
            .join(stage.select(user_col, F.col("t").alias("prev_t")), user_col)
            .filter(F.col(ts_col) > F.col("prev_t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        sizes.append((f"{k}: {s}", nxt))
        stage = nxt
    counts = None
    for label, df in sizes:
        one = df.agg(F.count("*").cast("long").alias("n_users")).select(
            F.lit(int(label.split(":")[0])).cast("long").alias("step_order"),
            F.lit(label.split(": ")[1]).alias("step"),
            "n_users",
        )
        counts = one if counts is None else counts.unionByName(one)
    return counts.orderBy("step_order")


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY e.user_id
    ), s4 AS (
      SELECT e.user_id, MIN(e.ts) AS t FROM events e
      JOIN s3 ON s3.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY e.user_id
    )
    SELECT CAST(1 AS BIGINT) AS step_order, 'signup' AS step,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
    UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
    UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM s3)
    UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4)
    ORDER BY step_order
    """,
)
def q_funnel_conversion(spark, sf_dir):
    """signup → view → click → purchase funnel over the events table,
    strict temporal ordering per user. The oracle chains the same
    earliest-completion CTEs; counts are integral so the match is
    exact."""
    ev = load_table(spark, sf_dir, "events")
    return funnel_conversion(ev, ["signup", "view", "click", "purchase"])


def retention_cohorts(
    events: DataFrame, user_col: str = "user_id", ts_col: str = "ts"
) -> DataFrame:
    """Weekly retention cohorts: users grouped by the ISO week of
    their FIRST event; one row per (cohort_week, week_offset) with
    the number of cohort users active that week — the classic
    retention triangle. All date arithmetic (week truncation, offset
    division by 7) is integral, so the result is exact.

    Scale shape: one user-keyed min-agg builds the user→cohort map
    (user-sized), the activity table is distinct (user, week) pairs
    (bounded by users × weeks, far under raw events), and the join
    keys on the user column like every other stage here. Raw events
    are scanned exactly once per leg; no windows."""
    first = events.groupBy(user_col).agg(
        F.to_date(F.date_trunc("week", F.min(ts_col))).alias("cohort_week")
    )
    act = events.select(
        user_col, F.to_date(F.date_trunc("week", F.col(ts_col))).alias("wk")
    ).distinct()
    return (
        act.join(first, user_col)
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH first AS (
      SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    )
    SELECT f.cohort_week,
           CAST(datediff('day', f.cohort_week, a.wk) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act a JOIN first f ON f.user_id = a.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_retention_cohorts(spark, sf_dir):
    """Weekly retention triangle over the events table: cohort by
    first-activity week, count active cohort members at each week
    offset. Integral date arithmetic on both sides — exact match."""
    ev = load_table(spark, sf_dir, "events")
    return retention_cohorts(ev)


@query(
    "session_paths_topk",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_num
      FROM o
    ), p AS (
      SELECT user_id, session_num,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, session_num
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM p GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT 20
    """,
)
def q_session_paths_topk(spark, sf_dir):
    """Top-20 user-journey paths: gap-sessionize (30 min), concatenate
    each session's ordered event types into a path string, count
    identical journeys — the path-analysis primitive behind funnel
    DISCOVERY (funnel_conversion measures a KNOWN sequence; this finds
    which sequences exist). Ordering inside a session is
    (ts, event_id)-deterministic via array_sort over structs; the
    top-20 is a heap with a full tie-break. Scale shape: one user-
    keyed window pass, one (user, session)-keyed agg (bounded keys),
    one path-keyed count with map-side partials — raw events are
    scanned once."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    gap = t - F.lag(t).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    numbered = ev.withColumn("session_num", F.sum(new_sess).over(run))
    paths = numbered.groupBy("user_id", "session_num").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(20)
    )


@query(
    "session_basket_lift",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS NULL THEN 1
                  WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS new_sess
      FROM events
    ), s AS (
      SELECT user_id, event_type,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_num
      FROM o
    ), st AS (
      SELECT DISTINCT user_id, session_num, event_type FROM s
    ), n AS (
      SELECT CAST(COUNT(DISTINCT (user_id, session_num)) AS BIGINT)
        AS n_sessions FROM st
    ), item AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM st GROUP BY 1
    ), pair AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM st a JOIN st b
        ON a.user_id = b.user_id AND a.session_num = b.session_num
       AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT p.type_a, p.type_b, p.n_both, ia.n AS n_a, ib.n AS n_b,
           n.n_sessions,
           CAST(p.n_both AS DOUBLE) * CAST(n.n_sessions AS DOUBLE)
             / (CAST(ia.n AS DOUBLE) * CAST(ib.n AS DOUBLE)) AS lift
    FROM pair p
    JOIN item ia ON ia.event_type = p.type_a
    JOIN item ib ON ib.event_type = p.type_b
    CROSS JOIN n
    ORDER BY type_a, type_b
    """,
)
def q_session_basket_lift(spark, sf_dir):
    """Market-basket association between event types at SESSION grain:
    lift(a,b) = P(a,b) / (P(a)·P(b)) over session baskets — >1 means
    the events co-occur beyond chance (cross-sell/journey affinity;
    `pmi_top_bigrams` is the adjacency-grain cousin over text). All
    counts integral; lift is one multiply-divide of exact counts, so
    the doubles hash-match. Scale shape: one user-keyed window pass,
    one distinct on (user, session, type) — baskets bounded by
    sessions × distinct types — then a session-keyed self-join of
    that BOUNDED basket table, never of raw events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))
    gap = t - F.lag(t).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800 * 1_000_000), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    st = (
        ev.withColumn("session_num", F.sum(new_sess).over(run))
        .select("user_id", "session_num", "event_type")
        .distinct()
    )
    n = st.select("user_id", "session_num").distinct().agg(
        F.count("*").cast("long").alias("n_sessions")
    )
    item = st.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a, b = st.alias("a"), st.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.session_num") == F.col("b.session_num"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_both"))
    )
    ia = item.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    ib = item.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        pair.join(ia, "type_a")
        .join(ib, "type_b")
        .crossJoin(n)
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            "n_sessions",
            (
                F.col("n_both").cast("double") * F.col("n_sessions").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


@query(
    "w5_sliding_time_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
    FROM (
      SELECT event_id, user_id, value,
             CAST(epoch_us(ts) // 1000000 AS BIGINT) AS sec
      FROM events
    )
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
)
def q_w5_sliding_time_window(spark, sf_dir):
    """Trailing-1-hour per-user features via a RANGE (time-interval)
    window frame — the rate-limiting / velocity-feature shape a ROWS
    frame cannot express (the row count inside an hour varies). The
    frame is anchored on integer epoch SECONDS on both engines, so
    frame membership is identical by construction (RANGE includes all
    equal-timestamp peers — order-insensitive, no tiebreak needed);
    the windowed sum is exact-decimal. One user-keyed window pass,
    the sessionization shuffle budget."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("sec"))
        .rangeBetween(-3600, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            (F.unix_micros("ts") / 1_000_000).cast("long").alias("sec"),
        )
        .select(
            "event_id",
            "user_id",
            F.count("*").over(w).cast("long").alias("n_1h"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("sum_1h"),
        )
        .orderBy("event_id")
    )

def gapfill_resample(
    events: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    bucket_us: int,
) -> DataFrame:
    """Resample an irregular series onto a regular grid and fill the
    gaps — the hypertable `time_bucket_gapfill` + `locf` + `interpolate`
    shape. Per (key, bucket): n_obs and the exact-decimal bucket mean;
    then a dense per-key spine from the first to the last observed
    bucket, LOCF via `last(ignorenulls)` and linear interpolation from
    the straddling observed buckets.

    Scale path: the raw-event pass is ONE (key, bucket) hash
    aggregation; everything after (spine build, left join, fill
    windows) runs on the bucket table, which is smaller than the raw
    events by the per-bucket event multiplicity and bounded by
    keys x time-span/bucket. Nothing rescans or reshuffles raw events.
    Gap rows are interior by construction (the spine spans observed
    buckets), so both interpolation neighbors always exist.
    """
    t = F.unix_micros(F.col(ts_col))
    obs = (
        events.select(
            F.col(key),
            F.floor(t / F.lit(bucket_us)).cast("long").alias("bucket"),
            F.col(value_col).cast("decimal(18,2)").alias("__v"),
        )
        .groupBy(key, "bucket")
        .agg(
            F.count("*").alias("n_obs"),
            (F.sum("__v").cast("double") / F.count("*")).alias("__avg"),
        )
    )
    spine = (
        obs.groupBy(key)
        .agg(F.min("bucket").alias("__mn"), F.max("bucket").alias("__mx"))
        .select(key, F.explode(F.sequence("__mn", "__mx")).alias("bucket"))
    )
    w_prev = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(key)
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    pb = F.when(F.col("__avg").isNotNull(), F.col("bucket"))
    j = (
        spine.join(obs, [key, "bucket"], "left")
        .withColumn("__pv", F.last("__avg", ignorenulls=True).over(w_prev))
        .withColumn("__pb", F.last(pb, ignorenulls=True).over(w_prev))
        .withColumn("__nv", F.first("__avg", ignorenulls=True).over(w_next))
        .withColumn("__nb", F.first(pb, ignorenulls=True).over(w_next))
    )
    lerp = F.col("__pv") + (F.col("__nv") - F.col("__pv")) * (
        (F.col("bucket") - F.col("__pb")).cast("double")
        / (F.col("__nb") - F.col("__pb")).cast("double")
    )
    return j.select(
        key,
        "bucket",
        F.timestamp_micros(F.col("bucket") * F.lit(bucket_us)).alias("bucket_ts"),
        F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        F.col("__pv").alias("v_locf"),
        F.when(F.col("__avg").isNotNull(), F.col("__avg"))
        .otherwise(lerp)
        .alias("v_interp"),
    )


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH obs AS (
      SELECT user_id,
             CAST(floor(epoch_us(ts) / 21600000000.0) AS BIGINT) AS bucket,
             count(*) AS n_obs,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
               AS avg_v
      FROM events GROUP BY 1, 2
    ), spine AS (
      SELECT user_id, unnest(generate_series(mn, mx)) AS bucket
      FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx
            FROM obs GROUP BY 1)
    ), j AS (
      SELECT s.user_id, s.bucket, o.n_obs, o.avg_v
      FROM spine s LEFT JOIN obs o
        ON s.user_id = o.user_id AND s.bucket = o.bucket
    ), f AS (
      SELECT user_id, bucket, n_obs, avg_v,
             last_value(avg_v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN avg_v IS NOT NULL THEN bucket END
                        IGNORE NULLS) OVER wp AS pb,
             first_value(avg_v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN avg_v IS NOT NULL THEN bucket END
                         IGNORE NULLS) OVER wn AS nb
      FROM j
      WINDOW wp AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket,
           make_timestamp(bucket * 21600000000) AS bucket_ts,
           CAST(coalesce(n_obs, 0) AS BIGINT) AS n_obs,
           pv AS v_locf,
           CASE WHEN avg_v IS NOT NULL THEN avg_v
                ELSE pv + (nv - pv) *
                     (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
           END AS v_interp
    FROM f
    """,
)
def q_ts_gapfill_locf(spark, sf_dir):
    """Gap-filled 6-hour resample of the event value series per user:
    dense time grid, LOCF fill AND linear interpolation — the
    hypertable rollup the brief names, the shape dashboards and
    training-feature grids need. Both engines compute the bucket mean
    as one exact-decimal sum over an explicit double division, and the
    interpolation as the same IEEE expression, so the hash match is
    exact. One raw-event shuffle; all fill logic on the bucket table."""
    ev = load_table(spark, sf_dir, "events")
    return gapfill_resample(
        ev, key="user_id", ts_col="ts", value_col="value",
        bucket_us=6 * 3600 * 1_000_000,
    )
