"""Data-quality audit operators: referential-integrity orphan scan and
one-pass column profiling.

The reference validates its lake with a single row-count/column-count
compare (`s2_operate.py:24` — DynamoDB 58,318×13 vs Hudi 52,596×13);
these operators generalize that "did the copy lose rows?" check into
the audits a 100 TB lake actually runs:

- referential audit: one LEFT ANTI join per foreign key, each a plain
  shuffled-hash/broadcast join Catalyst plans freely; results union
  into a relation-level scorecard. Anti joins prune to the join keys
  (ReadSchema is 1-2 columns), so each check scans a fraction of the
  table bytes.
- column profile: null count / distinct count / min / max for every
  profiled column in ONE aggregation pass (no per-column jobs — the
  naive "loop over columns, run describe()" launches k jobs and k scans;
  this is exactly one scan). Distincts use exact count(DISTINCT) here;
  at 100 TB swap to approx_count_distinct (a9 shows that path).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table


def orphan_counts(
    child: DataFrame, parent: DataFrame, fk: str, pk: str, relation: str
) -> DataFrame:
    """(relation, n_child, n_orphans) for one FK edge via LEFT ANTI."""
    n_child = child.select(F.count("*").alias("n_child"))
    orphans = (
        child.select(F.col(fk).alias(pk))
        .join(parent.select(pk), pk, "left_anti")
        .select(F.count("*").alias("n_orphans"))
    )
    return (
        n_child.crossJoin(orphans)
        .select(F.lit(relation).alias("relation"), "n_child", "n_orphans")
    )


def referential_audit(edges: list[tuple[DataFrame, DataFrame, str, str, str]]) -> DataFrame:
    """Union of orphan scorecards over every FK edge."""
    parts = [orphan_counts(*e) for e in edges]
    return reduce(DataFrame.unionByName, parts)


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Long-format column profile in one aggregation pass:
    (column, n_rows, n_null, n_distinct, min_str, max_str)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) as (column, n_rows, n_null, n_distinct, min_str, max_str)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
                    for c in cols
                ),
            )
        )
    )
    return stacked


# ---------------------------------------------------------------------------
# Catalog entries
# ---------------------------------------------------------------------------


@query(
    "referential_audit",
    oracle="""
    SELECT 'lineitem->orders' AS relation,
           (SELECT count(*) FROM lineitem) AS n_child,
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans
    UNION ALL
    SELECT 'lineitem->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM part p
                               WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT count(*) FROM orders),
           (SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey))
    """,
)
def q_referential_audit(spark, sf_dir):
    """FK orphan scorecard over the lake's core relations — the
    generalized form of the reference's row-count compare."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    cust = load_table(spark, sf_dir, "customer")
    return referential_audit(
        [
            (li, orders, "l_orderkey", "o_orderkey", "lineitem->orders"),
            (li, part, "l_partkey", "p_partkey", "lineitem->part"),
            (orders, cust, "o_custkey", "c_custkey", "orders->customer"),
        ]
    )


@query(
    "column_profile",
    oracle="""
    SELECT 'o_orderstatus' AS column, count(*) AS n_rows,
           count(*) - count(o_orderstatus) AS n_null,
           count(DISTINCT o_orderstatus) AS n_distinct,
           min(CAST(o_orderstatus AS VARCHAR)) AS min_str,
           max(CAST(o_orderstatus AS VARCHAR)) AS max_str
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           min(CAST(o_orderpriority AS VARCHAR)),
           max(CAST(o_orderpriority AS VARCHAR))
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           min(CAST(o_custkey AS VARCHAR)), max(CAST(o_custkey AS VARCHAR))
    FROM orders
    """,
)
def q_column_profile(spark, sf_dir):
    """One-scan long-format profile of three `orders` columns (null /
    distinct / min / max) — the schema-drift tripwire run after every
    load."""
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(orders, ["o_orderstatus", "o_orderpriority", "o_custkey"])


def linear_fit(
    df: DataFrame, x_col: str, y_col: str, group_cols: "list[str]"
) -> DataFrame:
    """Per-group ordinary-least-squares fit y = intercept + slope·x via
    the normal equations — the cheap trend/calibration primitive
    (price-per-unit drift, throughput-vs-size curves) computed in ONE
    aggregation pass, no ML library, no iteration.

    Determinism contract (the catalog float policy): inputs are
    cent-scaled to EXACT integers (round(v*100) — the fixtures are
    2-dp doubles, and rounding the IEEE-identical product of identical
    doubles is engine-identical), the five moments are integer/decimal
    sums (accumulation-order-free; the product moments Σx², Σxy, Σy²
    are summed as DECIMAL(38,0) because each product reaches ~5e10 on
    lineitem and an int64 SUM would overflow near ~1.8e8 rows — sf30 —
    while DuckDB's 128-bit SUM would not), and slope/intercept/r² are
    plain double arithmetic on those exact scalars — identical
    expression trees on both engines, so raw doubles hash-match with
    no rounding. The common ×100 scaling cancels in slope and r²;
    intercept is unscaled by one exact division at the end.

    Scale shape: one scan, one bounded-key hash aggregation with
    map-side partials; five sums per group is the entire state."""
    x = F.round(F.col(x_col) * 100).cast("long")
    y = F.round(F.col(y_col) * 100).cast("long")
    agg = df.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(38,0)")).cast("double").alias("sxx"),
        F.sum((x * y).cast("decimal(38,0)")).cast("double").alias("sxy"),
        F.sum((y * y).cast("decimal(38,0)")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_xn = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_yn = nd * F.col("syy") - F.col("sy") * F.col("sy")
    # degenerate groups get NULL, not an ANSI divide-by-zero: constant
    # x leaves the slope undefined; constant y leaves r2 undefined
    # (cov is 0 there, so 0/0)
    slope = F.when(var_xn != 0, cov_n / var_xn)
    return agg.select(
        *group_cols,
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / nd / F.lit(100.0)).alias(
            "intercept"
        ),
        F.when(
            (var_xn != 0) & (var_yn != 0), cov_n * cov_n / (var_xn * var_yn)
        ).alias("r2"),
    )


@query(
    "stats_linear_fit",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS sy,
             CAST(SUM(CAST(CAST(ROUND(l_quantity * 100) AS BIGINT)
                      * CAST(ROUND(l_quantity * 100) AS BIGINT)
                      AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(CAST(ROUND(l_quantity * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                      * CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx = 0 THEN NULL
                ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / (CAST(n AS DOUBLE) * sxx - sx * sx) END AS slope,
           CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx = 0 THEN NULL
                ELSE (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                       / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                     / CAST(n AS DOUBLE) / 100.0 END AS intercept,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) = 0
                     OR (CAST(n AS DOUBLE) * syy - sy * sy) = 0 THEN NULL
                ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
                     * (CAST(n AS DOUBLE) * sxy - sx * sy)
                     / ((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)) END AS r2
    FROM m
    ORDER BY l_returnflag
    """,
)
def q_stats_linear_fit(spark, sf_dir):
    """OLS fit of extendedprice against quantity per returnflag —
    slope recovers the average unit price, r² how linear the pricing
    is. Cent-scaled integer moments + identical double expression
    trees on both sides make the raw doubles hash-match; the oracle
    spells the same normal-equation algebra in SQL."""
    li = load_table(spark, sf_dir, "lineitem")
    return linear_fit(
        li, "l_quantity", "l_extendedprice", ["l_returnflag"]
    ).orderBy("l_returnflag")


def corr_matrix(df: DataFrame, cols: "list[str]") -> DataFrame:
    """Pairwise Pearson correlations in ONE aggregation pass: all
    per-column and per-pair cent-scaled integer moments aggregate
    together (2c + c(c+1)/2 sums — map-side partials, bounded state),
    then each r is plain double algebra on the exact scalars, so raw
    doubles hash-match (same contract as `linear_fit`, which is the
    c=2 special case with an intercept). Long-format output: one row
    per unordered column pair."""
    scaled = {c: F.round(F.col(c) * 100).cast("long") for c in cols}
    aggs = [F.count("*").cast("long").alias("n")]
    for c in cols:
        aggs.append(F.sum(scaled[c]).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum((scaled[c] * scaled[c]).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"ss_{c}")
        )
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        aggs.append(
            F.sum((scaled[a] * scaled[b]).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"sp_{a}_{b}")
        )
    m = df.agg(*aggs)
    out = None
    for a, b in pairs:
        nd = F.col("n").cast("double")
        cov = nd * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = nd * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = nd * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        row = m.select(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col("n"),
            F.when((va != 0) & (vb != 0), cov / F.sqrt(va * vb)).alias("pearson_r"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("col_a", "col_b")


@query(
    "stats_corr_matrix",
    oracle="""
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE) AS s_q,
        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) AS s_p,
        CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS s_d,
        CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)
                 * CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE) AS ss_q,
        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) AS ss_p,
        CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)
                 * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS ss_d,
        CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)
                 * CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE) AS sp_qp,
        CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)
                 * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS sp_qd,
        CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                 * CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE) AS sp_pd
      FROM lineitem
    )
    SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, n,
           CASE WHEN (CAST(n AS DOUBLE)*ss_q - s_q*s_q) = 0
                  OR (CAST(n AS DOUBLE)*ss_p - s_p*s_p) = 0 THEN NULL
             ELSE (CAST(n AS DOUBLE)*sp_qp - s_q*s_p)
                  / SQRT((CAST(n AS DOUBLE)*ss_q - s_q*s_q)
                         * (CAST(n AS DOUBLE)*ss_p - s_p*s_p)) END AS pearson_r
    FROM m
    UNION ALL
    SELECT 'l_quantity', 'l_discount', n,
           CASE WHEN (CAST(n AS DOUBLE)*ss_q - s_q*s_q) = 0
                  OR (CAST(n AS DOUBLE)*ss_d - s_d*s_d) = 0 THEN NULL
             ELSE (CAST(n AS DOUBLE)*sp_qd - s_q*s_d)
                  / SQRT((CAST(n AS DOUBLE)*ss_q - s_q*s_q)
                         * (CAST(n AS DOUBLE)*ss_d - s_d*s_d)) END
    FROM m
    UNION ALL
    SELECT 'l_extendedprice', 'l_discount', n,
           CASE WHEN (CAST(n AS DOUBLE)*ss_p - s_p*s_p) = 0
                  OR (CAST(n AS DOUBLE)*ss_d - s_d*s_d) = 0 THEN NULL
             ELSE (CAST(n AS DOUBLE)*sp_pd - s_p*s_d)
                  / SQRT((CAST(n AS DOUBLE)*ss_p - s_p*s_p)
                         * (CAST(n AS DOUBLE)*ss_d - s_d*s_d)) END
    FROM m
    ORDER BY col_a, col_b
    """,
)
def q_stats_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix over (quantity, extendedprice,
    discount) in one lineitem pass — the drift-detection companion to
    `column_profile` (a correlation that moves between loads signals
    upstream schema or unit changes). Exact integer moments; r is
    double algebra incl. one SQRT of a product of exact-scalar
    differences — same tree both engines, hash-matched."""
    li = load_table(spark, sf_dir, "lineitem")
    return corr_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])
