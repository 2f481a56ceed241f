"""Relational query surface (SURVEY.md §2.2-2.7): scans, filters,
joins, aggregations, windows, sorts, set ops, scalar functions.

Everything here is declarative DataFrame API — Catalyst handles
predicate pushdown, column pruning, join strategy (broadcast hints on
known-small dims), and AQE handles runtime re-planning. Query literals
are fixed (deterministic) and sit inside the fixtures' value ranges at
every scale factor (lineitem ship 1995-2001, orders 1995-2001, events
2024-01).

Float determinism policy (oracle comparison is an exact value hash):
- NEVER `round()` doubles — Spark (HALF_UP over the shortest decimal
  repr) and DuckDB (binary arithmetic) disagree on .005-boundary
  values.
- Per-row arithmetic on doubles is bit-identical across engines (same
  IEEE ops, same order) → emit raw.
- SUMs of non-integral doubles are order-dependent → cast operands to
  exact DECIMAL on BOTH sides, sum exactly, cast the total to double.
- AVG = exact-sum-as-double / count: one deterministic division.
- Sums of integral-valued doubles (l_quantity) are exact in fp at any
  order → raw sum is safe.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table

#: exact-money type: covers |x| < 1e10 with cent precision
MONEY = "decimal(12,2)"
#: 0.xx factors (discount/tax)
PCT = "decimal(4,2)"


def money_sum(col) -> F.Column:
    """Order-independent exact sum of a 2-decimal money double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(MONEY)).cast("double")


# ---------------------------------------------------------------------------
# Flagship aggregation (A1/A3-family; TPC-H Q1 shape)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
                    * CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS sum_charge,
           sum(l_quantity) / count(*) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(MONEY)
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast(PCT)).cast(PCT)
    one_plus_tax = (F.lit(1) + F.col("l_tax").cast(PCT)).cast(PCT)
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * one_minus_disc).cast("double").alias("sum_disc_price"),
            F.sum(price * one_minus_disc * one_plus_tax).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / n).alias("avg_qty"),
            (F.sum(price).cast("double") / n).alias("avg_price"),
            (F.sum(F.col("l_discount").cast(PCT)).cast("double") / n).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Scans / filters (S1, P5, F1, F3)
# ---------------------------------------------------------------------------


@query(
    "s1_scan_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00' AND l_discount > 0.05
    """,
)
def q_scan_pushdown(spark, sf_dir):
    """Projection + predicate that must reach the parquet scan
    (PushedFilters on l_shipdate/l_discount; ReadSchema of 6 columns).
    Revenue is raw per-row double arithmetic — bit-identical across
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@query(
    "f1_cdc_event_filter",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type <> 'error' AND value > 0
    """,
)
def q_cdc_event_filter(spark, sf_dir):
    """F1: the reference drops REMOVE CDC events
    (dynamodb_stream_consumer.py:38-39); same shape on the events
    fixture."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter((F.col("event_type") != "error") & (F.col("value") > 0)).select(
        "event_id", "user_id", "event_type", "value"
    )


@query(
    "f3_time_range_prune",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-20 00:00:00'
    GROUP BY event_type
    """,
)
def q_time_range_prune(spark, sf_dir):
    """F3: the reference's manual S3 key-range selection
    (incremental_load_orchestration.py:194-225) becomes a time-range
    predicate Catalyst can prune partitions/row-groups with."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20 00:00:00").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Joins (J2): star join with broadcast dims, semi/anti
# ---------------------------------------------------------------------------


@query(
    "j2_star_join_revenue",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue,
           count(*) AS n_rows
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_star_join_revenue(spark, sf_dir):
    """Multi-way star join. Dims (region/nation) are broadcast —
    lineitem⋈orders is the only shuffle pair, and AQE may convert even
    that to broadcast at small SF. Filters push below the joins."""
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast(MONEY)
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast(PCT)).cast(PCT)
    return (
        region.join(nation, nation.n_regionkey == region.r_regionkey)
        .join(customer, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .join(lineitem, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("n_name")
        .agg(
            F.sum(price * one_minus_disc).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "j3_semi_anti_join",
    oracle="""
    SELECT c_mktsegment, 'with_orders' AS cohort, count(*) AS n_customers
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    UNION ALL
    SELECT c_mktsegment, 'without_orders' AS cohort, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_semi_anti_join(spark, sf_dir):
    customer = load_table(spark, sf_dir, "customer")
    okeys = load_table(spark, sf_dir, "orders").select("o_custkey")
    on = customer.c_custkey == okeys.o_custkey
    semi = (
        customer.join(okeys, on, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .withColumn("cohort", F.lit("with_orders"))
    )
    anti = (
        customer.join(okeys, on, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
        .withColumn("cohort", F.lit("without_orders"))
    )
    return semi.unionByName(anti).select("c_mktsegment", "cohort", "n_customers")


# ---------------------------------------------------------------------------
# Aggregations (A2, A5) + grouping sets
# ---------------------------------------------------------------------------


@query(
    "a2_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark, sf_dir):
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@query(
    "a5_agg_stats",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
           min(o_totalprice) AS min_price,
           max(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def q_agg_stats(spark, sf_dir):
    n = F.count("*")
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            money_sum("o_totalprice").alias("sum_price"),
            (money_sum("o_totalprice") / n).alias("avg_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@query(
    "a6_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
    )


@query(
    "a7_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           count(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(money_sum("o_totalprice").alias("sum_price"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Window family beyond W1/W2 (dedup.py): running aggs, lag/lead
# ---------------------------------------------------------------------------


@query(
    "w3_window_family",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_value,
           lag(event_type, 1)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
    FROM events
    """,
)
def q_window_family(spark, sf_dir):
    """Running sums go through DECIMAL: engines may use different frame
    accumulation structures (DuckDB segment trees vs Spark sequential),
    so only exact arithmetic is comparable."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_value"),
        F.lag("event_type", 1).over(w).alias("prev_type"),
        F.lead("event_type", 1).over(w).alias("next_type"),
        F.row_number().over(w).cast("long").alias("seq"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits (O1/O2) and set operations
# ---------------------------------------------------------------------------


@query(
    "o1_topn_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def q_topn_orders(spark, sf_dir):
    """Global top-N: Spark plans TakeOrderedAndProject — per-partition
    heap + driver merge of N, never a full global sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "set_intersect_except",
    oracle="""
    SELECT user_id FROM (
      (SELECT user_id FROM events WHERE event_type = 'purchase'
       INTERSECT
       SELECT user_id FROM events WHERE event_type = 'click')
      EXCEPT
      SELECT user_id FROM events WHERE event_type = 'error'
    )
    """,
)
def q_set_intersect_except(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    uid = lambda t: ev.filter(F.col("event_type") == t).select("user_id")  # noqa: E731
    return uid("purchase").intersect(uid("click")).subtract(uid("error"))


# ---------------------------------------------------------------------------
# Scalar function surface (C1-C12)
# ---------------------------------------------------------------------------


@query(
    "c_scalar_funcs",
    oracle="""
    SELECT c_custkey,
           md5(c_name) AS name_md5,
           upper(substr(c_name, 1, 8)) AS name_prefix,
           lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nation_pad,
           abs(c_acctbal) AS abs_bal,
           CAST(length(c_mktsegment) AS BIGINT) AS seg_len,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_key
    FROM customer
    """,
)
def q_scalar_funcs(spark, sf_dir):
    """C1/C2/C5/C12 + casts: concat, substring, zero-pad, md5,
    arithmetic — the reference's scalar surface (SURVEY §2.7) in one
    projection."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nation_pad"),
        F.abs("c_acctbal").alias("abs_bal"),
        F.length("c_mktsegment").cast("long").alias("seg_len"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_key"),
    )


@query(
    "c3_datetime_funcs",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y-%m-%d') AS d,
           date_trunc('minute', ts) AS minute_bucket,
           ts + INTERVAL 1 MINUTE AS ts_plus_1m,
           least(ts, TIMESTAMP '2024-01-15 00:00:00') AS ts_capped,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(hour(ts) AS BIGINT) AS h
    FROM events
    """,
)
def q_datetime_funcs(spark, sf_dir):
    """C3/C4/C10: parse/format, truncation, interval arithmetic,
    least — the timestamp manipulation surface."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("d"),
        F.date_trunc("minute", F.col("ts")).alias("minute_bucket"),
        (F.col("ts") + F.expr("INTERVAL 1 MINUTE")).alias("ts_plus_1m"),
        F.least(F.col("ts"), F.lit("2024-01-15 00:00:00").cast("timestamp")).alias("ts_capped"),
        F.year("ts").cast("long").alias("y"),
        F.hour("ts").cast("long").alias("h"),
    )


@query(
    "c7_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_value
    FROM events
    GROUP BY k_val
    """,
)
def q_json_extract(spark, sf_dir):
    """C7: semi-structured JSON payload extraction (the events fixture's
    `props` column), then aggregate on the extracted key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").cast("long").alias("k_val"), "value"
        )
        .groupBy("k_val")
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count("*")).alias(
                "avg_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Event-time bucketing (T2 batch shape)
# ---------------------------------------------------------------------------


@query(
    "t2_tumbling_window",
    oracle="""
    SELECT date_trunc('minute', ts) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY window_start, event_type
    """,
)
def q_tumbling_window(spark, sf_dir):
    """T2: 1-minute tumbling event-time windows, batch form (the
    streaming form over the same semantics lives in cdc.py and is
    covered by streaming tests)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 minute").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# Extended window family: ranking, frames (W2 family completion)
# ---------------------------------------------------------------------------


@query(
    "w4_ranking_family",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(rank()       OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS rnk,
           CAST(dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS BIGINT) AS quartile,
           first_value(event_id) OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS top_event
    FROM events WHERE event_type IN ('purchase', 'signup')
    """,
)
def q_ranking_family(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("value").desc(), F.col("event_id"))
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.first("event_id").over(w).alias("top_event"),
    )


# ---------------------------------------------------------------------------
# Pivot (wide aggregation)
# ---------------------------------------------------------------------------


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'error')    AS error,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup
    FROM events GROUP BY user_id
    """,
)
def q_pivot_event_counts(spark, sf_dir):
    """Pivot: per-user event-type count matrix. Spark's pivot() with an
    explicit value list is a single hash aggregation (no extra pass to
    discover values)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "error", "signup"]
    out = ev.groupBy("user_id").pivot("event_type", types).count()
    # pivot yields nullable counts; DuckDB FILTER yields 0 — normalize
    return out.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in types]
    )


# ---------------------------------------------------------------------------
# Sessionization (gap-based) — lag + running conditional sum
# ---------------------------------------------------------------------------


@query(
    "sessionize_events",
    oracle="""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), s AS (
      SELECT user_id, event_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM g
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_seq
    """,
)
def q_sessionize_events(spark, sf_dir):
    """Sessionization: a session breaks after a 30-minute idle gap.
    lag -> new-session flag -> running sum = session id; then one
    aggregation per (user, session). Single shuffle on user_id reused
    by both windows and the final group-by."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: cast('long') floors to seconds, which can
    # disagree with the oracle's full-precision INTERVAL comparison for
    # gaps inside the (1800s, 1801s) truncation window
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    sess = ev.withColumn("new_session", new_session).withColumn(
        "session_seq",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


# ---------------------------------------------------------------------------
# As-of join (Spark has no native one: composition via ignore-nulls
# last_value over a unioned, event-ordered frame)
# ---------------------------------------------------------------------------


@query(
    "asof_join_views",
    oracle="""
    WITH tagged AS (
      SELECT user_id, event_id, ts, event_type,
             last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_view_ts
      FROM events
    )
    SELECT user_id, event_id, ts, prev_view_ts
    FROM tagged WHERE event_type = 'purchase'
    """,
)
def q_asof_join_views(spark, sf_dir):
    """As-of join: for each purchase, the most recent strictly-earlier
    'view' of the same user. Expressed as ignore-nulls last_value over
    an event-ordered window — one shuffle on user_id, no range-join
    blowup (the classic Spark workaround for a missing ASOF JOIN)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_view = F.last(
        F.when(F.col("event_type") == "view", F.col("ts")), ignorenulls=True
    ).over(w)
    return (
        ev.withColumn("prev_view_ts", prev_view)
        .filter(F.col("event_type") == "purchase")
        .select("user_id", "event_id", "ts", "prev_view_ts")
    )


# ---------------------------------------------------------------------------
# Exact percentiles (A-family completion)
# ---------------------------------------------------------------------------


@query(
    "a8_percentiles",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5)  AS median_price,
           quantile_cont(o_totalprice, 0.95) AS p95_price
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`): both sort the group and interpolate the same two
    order statistics — deterministic across engines."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95_price"),
        )
    )


# ---------------------------------------------------------------------------
# Per-file accounting (A4/S2) and approximate aggregates — rows-only
# ---------------------------------------------------------------------------


@query(
    "a4_per_file_counts",
    oracle="""
    SELECT 'lineitem.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS item_count
    FROM lineitem
    """,
)
def q_per_file_counts(spark, sf_dir):
    """A4: manifest-style per-data-file row counts
    (vendor/aws_dynamodb_export_to_s3.py:42,74,339) via
    input_file_name() — Spark's file index replaces the manifest.

    Paths are relativized to basenames on the Spark side, and every
    fixture table is a single parquet file, so the oracle pins the
    (basename, exact count) pair — upgrading this from rows-only to
    hash-checked. On a multi-file table the Spark side stays genuinely
    per-file (one row per file)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.input_file_name().alias("file"))
        .agg(F.count("*").alias("item_count"))
        .select(F.regexp_extract("file", r"([^/]+)$", 1).alias("file_name"), "item_count")
    )


@query(
    "a9_approx_aggs",
    oracle="""
    SELECT count(*) AS n,
           count(DISTINCT l_orderkey) AS n_orders_exact,
           TRUE AS hll_ok,
           TRUE AS median_ok
    FROM lineitem
    """,
)
def q_approx_aggs(spark, sf_dir):
    """Approximate aggregates for interactive scale: HLL distinct +
    quantile sketch. Sketch *values* are engine-specific, so the
    driver-checkable contract is: exact columns (count, exact distinct)
    plus tolerance booleans — HLL within 15% (3x the default rsd=0.05)
    of the exact distinct, sketch median within 2% of the exact
    interpolated median (accuracy=10000 bounds rank error to n/10000).
    The oracle asserts the same exact values and literal TRUEs."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        (
            F.abs(
                F.approx_count_distinct("l_orderkey")
                - F.countDistinct("l_orderkey")
            )
            <= 0.15 * F.countDistinct("l_orderkey")
        ).alias("hll_ok"),
        (
            F.abs(
                F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
                - F.expr("percentile(l_extendedprice, 0.5)")
            )
            <= 0.02 * F.expr("percentile(l_extendedprice, 0.5)")
        ).alias("median_ok"),
    )


# ---------------------------------------------------------------------------
# SQL-API surface (Athena parity, SURVEY §3.3): spark.sql over
# registered views — same Catalyst plan as the DataFrame form
# ---------------------------------------------------------------------------


@query(
    "sql_late_orders",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00')
    GROUP BY o_orderpriority
    """,
)
def q_sql_late_orders(spark, sf_dir):
    """Analytics through the SQL entry point (spark.sql + temp views),
    with a correlated EXISTS that Catalyst rewrites to a semi join —
    replaces the reference's Athena string-SQL path (athena.py:16-64)
    with no polling or CSV hop."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders_v o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00')
        GROUP BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# Join+agg+topN combinations (TPC-H Q3/Q10 shapes)
# ---------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter -> two joins -> grouped
    revenue -> global top-10. Customer filter cuts the build side
    before the join; top-N is TakeOrderedAndProject."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-03-15 00:00:00").cast("timestamp")
    )
    price = F.col("l_extendedprice").cast(MONEY)
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast(PCT)).cast(PCT)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(price * one_minus_disc).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue
    FROM customer JOIN nation ON c_nationkey = n_nationkey
                  JOIN orders ON o_custkey = c_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue report over returned items —
    broadcast nation dim, selective date window, top-20 customers."""
    customer = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    price = F.col("l_extendedprice").cast(MONEY)
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast(PCT)).cast(PCT)
    return (
        customer.join(nation, customer.c_nationkey == nation.n_nationkey)
        .join(orders, orders.o_custkey == customer.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(price * one_minus_disc).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


# ---------------------------------------------------------------------------
# Unpivot / melt (wide -> long)
# ---------------------------------------------------------------------------


@query(
    "unpivot_metrics",
    oracle="""
    SELECT o_orderkey, metric, val FROM (
      SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
      UNION ALL
      SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val FROM orders
    ) WHERE o_orderkey % 100 = 0
    """,
)
def q_unpivot_metrics(spark, sf_dir):
    """Unpivot (wide->long) via the native melt operator — the inverse
    of pivot_event_counts; stack() is the SQL spelling."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return orders.select(
        "o_orderkey", F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    ).melt(
        ids=["o_orderkey"],
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="val",
    )


# ---------------------------------------------------------------------------
# Grouping sets (explicit) and array-aggregation functions
# ---------------------------------------------------------------------------


@query(
    "a10_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS (beyond rollup/cube): per-flag, per-status
    and grand-total aggregates in one pass."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "agg_array_funcs",
    oracle="""
    SELECT user_id,
           CAST(len(list_distinct(list(event_type))) AS BIGINT) AS n_types,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS type_csv
    FROM events GROUP BY user_id
    """,
)
def q_agg_array_funcs(spark, sf_dir):
    """Array-valued aggregation: collect_set + array_sort makes the
    nondeterministic collection order canonical on both engines; the
    sorted set is emitted as its CSV rendering (`type_csv`) — scalar
    columns only, so external row canonicalizers that sort on every
    column never see a raw array (an ndarray cell is unhashable for
    pandas sort/factorize)."""
    ev = load_table(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.size(types).cast("long").alias("n_types"),
        F.array_join(types, ",").alias("type_csv"),
    )


# ---------------------------------------------------------------------------
# Two-level timeseries rollup (continuous-aggregate / hypertable shape)
# ---------------------------------------------------------------------------


@query(
    "rollup_timeseries",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY day, event_type
    """,
)
def q_rollup_timeseries(spark, sf_dir):
    """Hypertable-style continuous aggregate: daily rollup computed by
    RE-AGGREGATING hourly partials (count-of-counts, sum-of-sums in
    exact decimal), not by rescanning raw events — the pattern that
    keeps a 100 TB event table's dashboards O(hours), with correctness
    proven against the direct daily oracle."""
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
        ).agg(
            F.count("*").alias("pn"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("pv"),
        )
    )
    return (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day"), "event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            F.sum("pv").cast("double").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# Grouped-map Pandas operator (applyInPandas)
# ---------------------------------------------------------------------------


@query(
    "grouped_pct_rank",
    oracle="""
    SELECT user_id, event_id,
           CASE WHEN cnt > 1
                THEN (rn - 1) * 1.0 / (cnt - 1)
                ELSE 0.0 END AS pct_rank
    FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY value, event_id) AS rn,
             count(*)     OVER (PARTITION BY user_id) AS cnt
      FROM events
    )
    """,
)
def q_grouped_pct_rank(spark, sf_dir):
    """Grouped-map Pandas operator (`applyInPandas`): per-user
    percentile rank of event value, computed with numpy inside an Arrow
    batch per group. Rank arithmetic is pure integers, so the Python
    path is bit-comparable to the window-function oracle — the pattern
    for custom per-group logic (normalization, resampling, model
    scoring) that built-ins can't express."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def pct_rank(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["value", "event_id"]).reset_index(drop=True)
        n = len(pdf)
        ranks = (
            pdf.index.to_numpy() / (n - 1) if n > 1 else [0.0] * n
        )
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "event_id": pdf["event_id"],
                "pct_rank": ranks,
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        pct_rank, schema="user_id long, event_id long, pct_rank double"
    )


# ---------------------------------------------------------------------------
# Explicit A1/O2/O3 parity (athena.py preview surface)
# ---------------------------------------------------------------------------


@query(
    "a1_count_preview",
    oracle="""
    SELECT (SELECT count(*) FROM lineitem) AS n_lineitem,
           (SELECT count(*) FROM orders)   AS n_orders
    """,
)
def q_count_preview(spark, sf_dir):
    """A1: the reference's preview COUNT(*) (athena.py:75-81), two
    tables in one row."""
    li_n = load_table(spark, sf_dir, "lineitem").count()
    o_n = load_table(spark, sf_dir, "orders").count()
    return spark.createDataFrame([(li_n, o_n)], "n_lineitem long, n_orders long")


@query(
    "o3_reverse_listing",
    oracle="""
    SELECT event_id, ts FROM events
    ORDER BY ts DESC, event_id DESC LIMIT 50
    """,
)
def q_reverse_listing(spark, sf_dir):
    """O3: newest-first listing — the reference fakes this with
    `(1e9 - seq)` file names (incremental_load_orchestration.py:163-176);
    a descending sort + limit needs no naming trick."""
    return (
        load_table(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(50)
        .select("event_id", "ts")
    )


# ---------------------------------------------------------------------------
# Outer-join completeness (left/full with null-side handling)
# ---------------------------------------------------------------------------


@query(
    "j4_outer_join",
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.n_orders, 0) AS n_orders,
           CASE WHEN o.n_orders IS NULL THEN 'inactive' ELSE 'active' END AS status
    FROM customer c
    LEFT OUTER JOIN (
      SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
    ) o ON o.o_custkey = c.c_custkey
    """,
)
def q_outer_join(spark, sf_dir):
    """Left outer join with null-side handling: every customer with
    their order count, zero-filled — aggregate-then-join keeps the
    build side small (one row per customer with orders), not
    join-then-aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    joined = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left_outer"
    )
    return joined.select(
        "c_custkey",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "inactive").otherwise("active").alias("status"),
    )


@query(
    "a5_fixed_chunking",
    oracle="""
    SELECT chunk, count(*) AS n_files,
           min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
    FROM (
      SELECT o_orderkey,
             CAST(floor((row_number() OVER (ORDER BY o_orderkey) - 1) / 100)
                  AS BIGINT) AS chunk
      FROM orders
    ) GROUP BY chunk
    """,
)
def q_fixed_chunking(spark, sf_dir):
    """A5: the reference's coordinator chunks work into groups of 100
    for Lambda fan-out (grouper_list, coordinator lambda:22-41). Spark's
    task splitting makes this unnecessary, but the equivalent
    fixed-size chunk assignment is one window expression."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        orders.select(
            "o_orderkey",
            F.floor((F.row_number().over(w) - 1) / 100).cast("long").alias("chunk"),
        )
        .groupBy("chunk")
        .agg(
            F.count("*").alias("n_files"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
    )


@query(
    "a11_variance_stats",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           sx / n AS mean_value,
           (sxx - sx * sx / n) / (n - 1) AS var_value
    FROM s WHERE n > 1
    """,
)
def q_variance_stats(spark, sf_dir):
    """Variance/stddev family, engine-exact: sums of x and x² in exact
    decimal, then the two-pass-free variance formula evaluated in a
    fixed double expression — built-in var_samp would accumulate doubles
    in engine-specific orders."""
    ev = load_table(spark, sf_dir, "events")
    xd = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    # n > 1 guard: a single-row group divides by zero, which Spark
    # (NULL) and DuckDB (NaN) disagree on
    return s.filter(F.col("n") > 1).select(
        "event_type",
        "n",
        (F.col("sx") / F.col("n")).alias("mean_value"),
        ((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_value"
        ),
    )


@query(
    "events_anomaly_flags",
    oracle="""
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sx,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                  AS DOUBLE) AS sxx
      FROM events GROUP BY event_type
    ), p AS (
      SELECT event_type, sx / n AS mean_v,
             sqrt((sxx - sx * sx / n) / (n - 1)) AS sd_v
      FROM s WHERE n > 1
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN abs((e.value - p.mean_v) / p.sd_v) > 2.5 THEN 1 ELSE 0 END
             AS is_anomaly
    FROM events e JOIN p ON e.event_type = p.event_type
    """,
)
def q_events_anomaly_flags(spark, sf_dir):
    """Analytic composition: per-type mean/stddev derived once
    (engine-exact decimal sums), broadcast-joined back onto the event
    stream, each row z-scored and flagged — the aggregate-then-enrich
    pattern that avoids a second scan-wide window."""
    ev = load_table(spark, sf_dir, "events")
    xd = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(xd * xd).cast("double").alias("sxx"),
    )
    p = s.filter(F.col("n") > 1).select(
        "event_type",
        (F.col("sx") / F.col("n")).alias("mean_v"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias(
            "sd_v"
        ),
    )
    return ev.join(F.broadcast(p), "event_type").select(
        "event_id",
        "event_type",
        "value",
        F.when(
            F.abs((F.col("value") - F.col("mean_v")) / F.col("sd_v")) > 2.5, 1
        )
        .otherwise(0)
        .alias("is_anomaly"),
    )


@query(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name ASC
    """,
)
def q_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: six-way star join (two tiny dims broadcast,
    customer-nation = supplier-nation locality predicate) -> per-nation
    revenue. The nation/region joins broadcast; the fact-side joins
    shuffle on their keys; Catalyst reorders the dim filters ahead of
    the fact join so only one year of orders reaches the shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    price = F.col("l_extendedprice").cast(MONEY)
    one_minus_disc = (F.lit(1) - F.col("l_discount").cast(PCT)).cast(PCT)
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supplier,
            (li.l_suppkey == supplier.s_suppkey)
            & (customer.c_nationkey == supplier.s_nationkey),
        )
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(price * one_minus_disc).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@query(
    "q18_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey
      FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      JOIN big      ON big.l_orderkey = o_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered aggregate feeds a semi-style
    join back to the fact table, then customer enrichment and top-100.
    The `big` aggregate and the final per-order aggregate share the
    l_orderkey partitioning, so AQE plans the second agg without a
    fresh exchange; top-100 is TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast(MONEY)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(customer, orders.o_custkey == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(qty).cast("double").alias("total_qty"))
        .withColumn("o_totalprice", F.col("o_totalprice").cast("double"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@query(
    "q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_priority_late_ship(spark, sf_dir):
    """TPC-H Q4 shape (adapted: no l_commitdate in the fixture, the
    EXISTS predicate is ship-after-order instead): correlated EXISTS
    becomes a LEFT SEMI join with a non-equi conjunct. The quarter
    filter prunes orders before the shuffle; the semi join never
    materializes lineitem columns, so the shuffle payload is just
    (o_orderkey, o_orderdate, o_orderpriority)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(rev) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(year FROM l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS rev
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q_nation_volume(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    ship year. The nation dim joins twice under different roles (both
    broadcast); the disjunctive nation-pair predicate sits above both
    so Catalyst can still broadcast the 25-row dim and evaluate the OR
    post-join. Fact joins shuffle on orderkey/custkey only."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    rev = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(PCT)
    ).cast(PCT)
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        supplier.join(li, supplier.s_suppkey == li.l_suppkey)
        .join(orders, orders.o_orderkey == li.l_orderkey)
        .join(customer, customer.c_custkey == orders.o_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT CAST(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                / CAST(sum(rev) AS DOUBLE) AS DOUBLE) AS promo_pct
    FROM (
      SELECT p_type,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    )
    """,
)
def q_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional-aggregate ratio (promo revenue
    share for one ship month). part broadcasts into the month-pruned
    lineitem scan; the two sums come out of ONE aggregate (no second
    pass); division happens once on exact decimal totals cast to
    double, so the oracle hash is bit-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(PCT)
    ).cast(PCT)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(MONEY))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_pct")
        )
    )


@query(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q_supplier_variety(spark, sf_dir):
    """TPC-H Q16 shape (adapted: lineitem stands in for the absent
    partsupp as the part-supplier relation): distinct-supplier counts
    per (brand, type, size), excluding suppliers in the complaint set
    via LEFT ANTI join. The part filters cut before the join; the
    anti-join side (negative-balance suppliers) broadcasts; the
    count(DISTINCT) plans as the standard two-phase expand/agg."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@query(
    "q19_disjunctive_pushdown",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_pushdown(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs predicate across both join sides.
    Catalyst derives the single-side residuals — the quantity envelope
    (1..30) pushes to the lineitem scan and the brand/size envelope to
    the part scan — before evaluating the full disjunction post-join;
    part broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    rev = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(PCT)
    ).cast(PCT)
    disj = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(disj)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), best AS (
      SELECT l_partkey, min(unit_cost) AS min_cost FROM cost GROUP BY l_partkey
    )
    SELECT p_partkey, p_name, p_type,
           s_name, CAST(s_acctbal AS DOUBLE) AS s_acctbal,
           unit_cost
    FROM cost
      JOIN best ON cost.l_partkey = best.l_partkey AND unit_cost = min_cost
      JOIN part ON p_partkey = cost.l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 15 AND p_type = 'STANDARD'
    ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
    LIMIT 100
    """,
)
def q_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: no partsupp fixture — observed unit
    price from lineitem stands in for ps_supplycost): the correlated
    "supplier with the minimum cost for this part" subquery becomes a
    per-(part,supplier) MIN aggregate plus a per-part MIN joined back
    on equality. Both aggregates hash-partition on l_partkey, so the
    back-join is co-partitioned (no extra exchange under AQE); part and
    supplier are broadcast dims; per-row double division and MIN are
    order-independent, so the double equality join is deterministic.
    The selective part predicate is applied BELOW the aggregation as a
    broadcast semi-join (a per-part MIN is unchanged by dropping other
    parts), so the wide agg runs over ~p_selectivity of lineitem
    instead of all of it — the difference between aggregating 100 TB
    and aggregating the slice you asked about.
    Reference parity: relational surface beyond the reference's scans
    (SURVEY §2.2), same discipline as q18/q4."""
    li = load_table(spark, sf_dir, "lineitem")
    wanted = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey")
    )
    li = li.join(F.broadcast(wanted), li.l_partkey == wanted.p_partkey, "left_semi")
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = (
        cost.groupBy("l_partkey")
        .agg(F.min("unit_cost").alias("min_cost"))
        .withColumnRenamed("l_partkey", "b_partkey")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
        .select("p_partkey", "p_name", "p_type")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    return (
        cost.join(
            best,
            (cost.l_partkey == best.b_partkey)
            & (cost.unit_cost == best.min_cost),
        )
        .join(F.broadcast(part), cost.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supplier), cost.l_suppkey == F.col("s_suppkey"))
        .select(
            "p_partkey",
            "p_name",
            "p_type",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "unit_cost",
        )
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc(), F.col("s_name").asc())
        .limit(100)
    )


@query(
    "q11_value_concentration",
    oracle="""
    WITH val AS (
      SELECT l_partkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS part_value
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, part_value
    FROM val
    WHERE part_value > 0.0005 * (SELECT sum(part_value) FROM val)
    ORDER BY part_value DESC, l_partkey ASC
    """,
)
def q_value_concentration(spark, sf_dir):
    """TPC-H Q11 shape: per-key value share against a global-total
    scalar subquery in HAVING. The per-part aggregate is computed once
    and reused for both the rows and the threshold (self-referencing
    scalar); the one-row total broadcasts into the filter, so the only
    real shuffle is the single l_partkey aggregation. Exact DECIMAL
    sums on both engines make the threshold comparison deterministic.

    Scale note: the total is re-aggregated from the (already small,
    |parts|-row) per-part frame, not from lineitem a second time."""
    li = load_table(spark, sf_dir, "lineitem")
    val = (
        li.groupBy("l_partkey")
        .agg(F.sum(F.col("l_extendedprice").cast(MONEY)).cast("double").alias("part_value"))
    )
    total = val.agg(F.sum("part_value").alias("__total"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("part_value") > 0.0005 * F.col("__total"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
                  AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_rev
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_rev = (SELECT max(total_rev) FROM rev)
    ORDER BY s_suppkey
    """,
)
def q_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue view + "equal to the maximum of the
    view" scalar subquery. The quarterly revenue aggregate is built
    once; its one-row MAX broadcasts back as the equality filter
    (Spark reuses the shuffle output of `rev` for both consumers
    under AQE). Exact DECIMAL revenue sums make the double equality
    against the max deterministic on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    rev_expr = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(PCT)
    ).cast(PCT)
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(rev_expr).cast("double").alias("total_rev"))
    )
    mx = rev.agg(F.max("total_rev").alias("__mx"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__mx"))
        .join(F.broadcast(supplier), rev.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_qty_revenue",
    oracle="""
    WITH pa AS (
      SELECT l_partkey, sum(l_quantity) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN pa ON pa.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.9 * avg_qty
    """,
)
def q_small_qty_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part AVG(quantity) subquery
    gating a revenue aggregate. The correlated subquery becomes a
    per-part aggregate joined back to lineitem on l_partkey — both
    sides hash-partition on the same key, so AQE plans the back-join
    without re-exchanging the aggregate. The brand filter broadcasts
    BELOW the per-part aggregate too (a per-part AVG is unchanged by
    dropping other parts' rows), so both passes over lineitem read
    only the brand's slice. avg_qty is exact (integral-valued double
    sum, single division), so the 0.9*avg threshold is bit-identical
    across engines."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    )
    pa = (
        li.groupBy("l_partkey")
        .agg((F.sum("l_quantity") / F.count("*")).alias("avg_qty"))
        .withColumnRenamed("l_partkey", "a_partkey")
    )
    return (
        li.join(pa, li.l_partkey == pa.a_partkey)
        .filter(F.col("l_quantity") < 0.9 * F.col("avg_qty"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(MONEY)).cast("double") / 7.0)
            .alias("avg_yearly")
        )
    )


@query(
    "q21_sole_late_supplier",
    oracle="""
    WITH late AS (
      SELECT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 365 DAY
    ), ns AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS nsupp
      FROM lineitem GROUP BY l_orderkey
    ), nl AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS nlate
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM late
      JOIN ns ON ns.l_orderkey = late.l_orderkey
      JOIN nl ON nl.l_orderkey = late.l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
    WHERE nsupp >= 2 AND nlate = 1
    GROUP BY s_name
    ORDER BY numwait DESC, s_name ASC
    LIMIT 100
    """,
)
def q_sole_late_supplier(spark, sf_dir):
    """TPC-H Q21 shape (adapted: "late" = shipped >365 days after the
    order date; the fixture has no commit/receipt dates): suppliers
    solely responsible for late multi-supplier orders. The classic
    EXISTS(other supplier) / NOT EXISTS(other LATE supplier) pair of
    correlated self-joins is re-expressed as per-order aggregates
    (distinct-supplier count, distinct-LATE-supplier count) —
    semantically identical (nlate=1 and the outer row being late ⇔ no
    OTHER late supplier) but without quadratic correlated self-joins.
    The late-supplier count is a collect_set window over the SAME
    `late` frame (one exchange on l_orderkey, no recomputed
    lineitem⋈orders subtree — a groupBy+join-back would evaluate the
    join twice since Spark shares no CTE subplans); `ns` reuses that
    l_orderkey partitioning for a co-partitioned join; supplier
    broadcasts at the end, after the aggregates have shrunk the row
    count."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .withColumn(
            "nlate",
            F.size(F.collect_set("l_suppkey").over(Window.partitionBy("l_orderkey"))),
        )
    )
    ns = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("nsupp")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        late.join(ns, "l_orderkey")
        .filter((F.col("nsupp") >= 2) & (F.col("nlate") == 1))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@query(
    "q22_dormant_customers",
    oracle="""
    WITH pool AS (
      SELECT c_custkey, c_nationkey, c_acctbal
      FROM customer
      WHERE c_nationkey IN (1, 3, 5, 7, 9) AND c_acctbal > 0
    ), thr AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*)
               AS avg_bal
      FROM pool
    )
    SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM pool, thr
    WHERE c_acctbal > avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = pool.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape (adapted: nationkey stands in for the phone
    country code; "no orders at all" would be empty in the fixture, so
    the anti-join is against RECENT orders — same NOT EXISTS shape
    with a pushed-down predicate inside): above-average-balance
    customers with no recent orders. The average-balance scalar
    subquery broadcasts as a one-row frame; the NOT EXISTS is a left
    anti join against the date-pruned orders projection (two columns
    cross the shuffle). Threshold determinism: exact DECIMAL sum,
    single double division on both engines."""
    pool = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9) & (F.col("c_acctbal") > 0))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    thr = pool.agg(
        (F.sum(F.col("c_acctbal").cast(MONEY)).cast("double") / F.count("*"))
        .alias("avg_bal")
    )
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        pool.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(MONEY)).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + scalar aggregate, zero joins.
    All four predicates push to the parquet scan (PushedFilters); the
    plan is scan -> partial agg -> single-row final agg, the cheapest
    possible shape and fully whole-stage-codegen. Revenue sums exact
    DECIMAL products, cast to double once."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(MONEY) * F.col("l_discount").cast(PCT))
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q8_market_share",
    oracle="""
    WITH v AS (
      SELECT EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) AS volume,
             n2.n_name AS supp_nation
      FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT CAST(o_year AS BIGINT) AS o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM v GROUP BY o_year ORDER BY o_year
    """,
)
def q_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's market share of a part type inside
    one region, by order year. Seven relations; every dim (part is
    filtered first, nation x2, region, supplier) broadcasts, so the
    only shuffles are the fact-fact joins on orderkey/custkey. Share =
    conditional decimal sum / total decimal sum out of ONE aggregate,
    divided once as doubles — bit-stable vs the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(PCT)
    ).cast(PCT)
    nation3 = F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
        F.lit(0).cast(MONEY)
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(nation3).cast("double") / F.sum(volume).cast("double")).alias(
                "mkt_share"
            )
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT nation, CAST(o_year AS BIGINT) AS o_year,
           CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2))
             - CAST(p_retailprice AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2))
               * CAST(0.5 AS DECIMAL(2,1)) AS amount
      FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q_product_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: the fixture has no partsupp, so supply
    cost is proxied as 0.5 x p_retailprice x quantity): profit on
    'widget' parts per supplier nation per year. The p_name LIKE
    filter prunes part BEFORE its broadcast; supplier+nation broadcast;
    the only shuffle is lineitem><orders on orderkey, reused by nothing
    downstream bigger than a (25 nations x 7 years)-key aggregate.
    Amount is exact decimal arithmetic summed exactly, one double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("widget"))
        .select("p_partkey", "p_retailprice")
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    amount = F.col("l_extendedprice").cast(MONEY) * (
        F.lit(1) - F.col("l_discount").cast(PCT)
    ).cast(PCT) - F.col("p_retailprice").cast(MONEY) * F.col("l_quantity").cast(
        MONEY
    ) * F.lit(0.5).cast("decimal(2,1)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q12_late_priority_count",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def q_late_priority_count(spark, sf_dir):
    """TPC-H Q12 shape (adapted: the fixture has no
    shipmode/commitdate/receiptdate, so linestatus stands in for the
    ship mode and 'late' means shipped >90 days after ordering):
    high- vs low-priority counts of late lines per group. The
    shipdate range prunes the lineitem scan; the cross-table lateness
    predicate evaluates post-join (it can't push down); both
    conditional counts come out of ONE aggregate over a 2-key group."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "q13_order_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
      GROUP BY c_custkey
    )
    GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def q_order_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    excluding one order class INSIDE the outer-join condition (so
    excluded-only customers still appear with c_count=0 — the
    semantics that make this a LEFT JOIN with a join-condition filter,
    not a WHERE). Two aggregates: the first shuffles on custkey, the
    second on the tiny c_count domain (tens of keys)."""
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    return (
        customer.join(
            orders,
            (customer.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q20_stock_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_suppkey, l_partkey,
             sum(l_quantity) AS total_qty,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                      THEN l_quantity ELSE 0 END) AS qty_1996
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%'
      GROUP BY l_suppkey, l_partkey
    )
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey IN (2, 4, 6)
      AND EXISTS (SELECT 1 FROM shipped
                  WHERE l_suppkey = s_suppkey AND qty_1996 > 0.3 * total_qty)
    ORDER BY s_suppkey
    """,
)
def q_stock_promotion(spark, sf_dir):
    """TPC-H Q20 shape (adapted: lineitem stands in for partsupp, and
    'excess availability' means one year's shipments exceed 30% of the
    part's all-time shipments from that supplier): suppliers in a
    nation set with a heavily-promoted 'red' part. The p_name prefix
    filter prunes part before broadcast; ONE aggregate computes both
    the year-window and all-time quantity sums (no second lineitem
    pass, unlike the textbook nested-subquery plan); the qualifying
    (suppkey) set reaches supplier as a LEFT SEMI join. Quantity sums
    are integral doubles — exact at any accumulation order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    in_1996 = (
        F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    ) & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum("l_quantity").alias("total_qty"),
            F.sum(F.when(in_1996, F.col("l_quantity")).otherwise(0.0)).alias(
                "qty_1996"
            ),
        )
        .filter(F.col("qty_1996") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey").isin(2, 4, 6)
    )
    return (
        supplier.join(shipped, supplier.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "agg_argmax_family",
    oracle="""
    SELECT user_id,
           arg_max(event_type, event_id) AS latest_type,
           arg_min(event_type, event_id) AS first_type,
           arg_max(value, event_id) AS latest_value,
           CAST(max(event_id) AS BIGINT) AS max_event_id,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def q_agg_argmax_family(spark, sf_dir):
    """max_by/min_by (SQL arg_max/arg_min) — the modern one-pass
    'attribute of the extreme row' aggregates that replace the
    self-join-on-max antipattern. Keyed on the UNIQUE event_id so the
    argmax row is deterministic on both engines. One hash aggregate,
    one shuffle on user_id, no join, no window."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.max_by("event_type", "event_id").alias("latest_type"),
            F.min_by("event_type", "event_id").alias("first_type"),
            F.max_by("value", "event_id").alias("latest_value"),
            F.max("event_id").cast("long").alias("max_event_id"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id")
    )
