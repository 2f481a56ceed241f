"""Multi-dimensional data layout: Z-order (Morton) clustering and its
measurable payoff, file-skipping on per-file min/max statistics.

The reference lake partitions by one derived key
(glue_jobs/initial_load.py:124-154 writes `pk`-partitioned parquet);
a query filtering on any OTHER column scans everything. Z-ordering is
the standard lakehouse answer (Delta OPTIMIZE ZORDER BY, Iceberg
sort orders): interleave the bits of several normalized columns so
that range predicates on ANY of them touch a bounded band of files.
This module is that operator, Spark-first:

- `morton2`: pure-Catalyst 2-column bit interleave (five
  shift/mask spreading steps per column — no UDF, whole-stage
  codegen keeps it in the JVM);
- `zorder_bucket_stats`: normalized dims -> z-value -> NTILE file
  assignment -> per-file min/max stats, i.e. exactly the footer
  stats a scan planner prunes on. NTILE (a deterministic global
  sort) stands in for `repartitionByRange(z)` so the DuckDB oracle
  can replay file assignment bit-for-bit; at cluster scale the
  plan swaps NTILE for repartitionByRange — same band structure,
  no global sort, sampled boundaries;
- `zorder_prune_gain`: replays diagonal box probes against the
  per-file stats under BOTH layouts (z-order vs single-column
  sort) and counts files a min/max-pruning scanner must touch —
  the number that justifies the shuffle at 100 TB.

Relation to `lake.zorder_write`: that is the production WRITE path
(quantile-bucketed ranks — skew-proof — + repartitionByRange, real
parquet files, footer stats verified by `lake.overlapping_files`).
This module is the oracle-checked ANALYSIS twin: min-max
normalization and NTILE placement are deliberately deterministic so
DuckDB replays the exact interleave and file assignment bit-for-bit,
and the pruning payoff becomes a hash-checked catalog query instead
of a test-only observation. Same curve, two verification regimes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: spreading masks for a 16-bit -> 32-bit Morton interleave
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)

BITS = 16  #: per-dimension resolution (16 bits x 2 dims = 32-bit z)


def _spread16(c: Column) -> Column:
    """Interleave zeros between the low 16 bits of `c` (Morton
    spreading): 0babcd -> 0b0a0b0c0d, five shift/mask steps, all
    Catalyst arithmetic."""
    out = c.bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        out = (out.bitwiseOR(F.shiftleft(out, shift))).bitwiseAND(
            F.lit(mask)
        )
    return out


def morton2(x: Column, y: Column) -> Column:
    """The 32-bit Morton code of two 16-bit normalized dimensions:
    bit i of x lands at position 2i, bit i of y at 2i+1."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1))


def _sql_spread16(expr: str) -> str:
    """The same spreading chain as `_spread16`, as ANSI SQL text —
    the oracle must compute bit-identical z-values."""
    out = f"({expr} & 65535)"
    for shift, mask in _SPREAD:
        out = f"((({out} | ({out} << {shift}))) & {mask})"
    return out


def morton2_sql(x: str, y: str) -> str:
    return f"({_sql_spread16(x)} | ({_sql_spread16(y)} << 1))"


def _normalize(c: Column, cmin: Column, cmax: Column) -> Column:
    """Min-max scale into [0, 2^BITS): integer arithmetic only so
    Spark and the oracle agree exactly."""
    span = F.greatest(cmax - cmin, F.lit(1))
    scaled = ((c - cmin) * F.lit((1 << BITS) - 1)) / span
    return F.floor(scaled).cast("long")


_NORM_SQL = (
    "CAST(FLOOR((({c} - {mn}) * 65535.0) / GREATEST({mx} - {mn}, 1))"
    " AS BIGINT)"
)


def zorder_bucket_stats(
    orders: DataFrame, n_files: int = 64
) -> DataFrame:
    """Assign every row of `orders` to one of `n_files` files in
    Z-order over (o_custkey, o_orderkey) and emit the per-file
    min/max footer stats a pruning scanner would consult.

    Plan: one broadcast of the 1-row min/max frame, the Morton code
    as pure Catalyst arithmetic, one global NTILE sort (the
    oracle-replayable stand-in for `repartitionByRange(z)` — see
    module docstring), one group-by. No UDFs anywhere."""
    dims = orders.select(
        F.col("o_custkey").alias("cust"), F.col("o_orderkey").alias("ok")
    )
    bounds = dims.agg(
        F.min("cust").alias("cmin"), F.max("cust").alias("cmax"),
        F.min("ok").alias("kmin"), F.max("ok").alias("kmax"),
    )
    z = dims.crossJoin(F.broadcast(bounds)).withColumn(
        "z",
        morton2(
            _normalize(F.col("cust"), F.col("cmin"), F.col("cmax")),
            _normalize(F.col("ok"), F.col("kmin"), F.col("kmax")),
        ),
    )
    w = Window.orderBy("z", "ok")
    return (
        z.withColumn("file_id", F.ntile(n_files).over(w).cast("long"))
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("cust").alias("cust_min"),
            F.max("cust").alias("cust_max"),
            F.min("ok").alias("ok_min"),
            F.max("ok").alias("ok_max"),
        )
        .orderBy("file_id")
    )


_BUCKET_SQL_BODY = """
WITH b AS (
  SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
         min(o_orderkey) AS kmin, max(o_orderkey) AS kmax
  FROM orders
), z AS (
  SELECT o_custkey AS cust, o_orderkey AS ok,
         {z_expr} AS z
  FROM orders, b
), f AS (
  SELECT cust, ok,
         CAST(NTILE({n_files}) OVER (ORDER BY z, ok) AS BIGINT)
           AS file_id
  FROM z
)
SELECT file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(cust) AS cust_min, max(cust) AS cust_max,
       min(ok) AS ok_min, max(ok) AS ok_max
FROM f
GROUP BY file_id
"""


def bucket_stats_oracle(n_files: int = 64) -> str:
    z_expr = morton2_sql(
        _NORM_SQL.format(c="o_custkey", mn="cmin", mx="cmax"),
        _NORM_SQL.format(c="o_orderkey", mn="kmin", mx="kmax"),
    )
    return (
        _BUCKET_SQL_BODY.format(z_expr=z_expr, n_files=n_files)
        + " ORDER BY file_id"
    )


def zorder_prune_gain(
    orders: DataFrame, n_files: int = 64, n_probes: int = 10
) -> DataFrame:
    """For `n_probes` diagonal box predicates (decile j of custkey ×
    decile j of orderkey), count the files a min/max-pruning scan
    must read under (a) the Z-order layout and (b) a plain
    single-column sort by orderkey. Emits one row per probe with
    both counts — z-order's whole value proposition, measured on
    its own file stats. Both layouts use the same NTILE file
    assignment so the comparison is apples-to-apples."""
    dims = orders.select(
        F.col("o_custkey").alias("cust"), F.col("o_orderkey").alias("ok")
    )
    bounds = dims.agg(
        F.min("cust").alias("cmin"), F.max("cust").alias("cmax"),
        F.min("ok").alias("kmin"), F.max("ok").alias("kmax"),
    )
    z = dims.crossJoin(F.broadcast(bounds)).withColumn(
        "z",
        morton2(
            _normalize(F.col("cust"), F.col("cmin"), F.col("cmax")),
            _normalize(F.col("ok"), F.col("kmin"), F.col("kmax")),
        ),
    )
    stats_z = (
        z.withColumn(
            "file_id",
            F.ntile(n_files).over(Window.orderBy("z", "ok")).cast("long"),
        )
        .groupBy("file_id")
        .agg(
            F.min("cust").alias("cust_min"), F.max("cust").alias("cust_max"),
            F.min("ok").alias("ok_min"), F.max("ok").alias("ok_max"),
        )
    )
    stats_lin = (
        z.withColumn(
            "file_id",
            F.ntile(n_files).over(Window.orderBy("ok", "cust")).cast("long"),
        )
        .groupBy("file_id")
        .agg(
            F.min("cust").alias("cust_min"), F.max("cust").alias("cust_max"),
            F.min("ok").alias("ok_min"), F.max("ok").alias("ok_max"),
        )
    )
    spark = orders.sparkSession
    def edge(lo: str, hi: str, k: Column) -> Column:
        # floor division on positives: Spark and DuckDB agree exactly
        return F.col(lo) + F.floor(
            ((F.col(hi) - F.col(lo) + 1) * k) / F.lit(n_probes)
        ).cast("long")

    # three probe shapes cycle: custkey-only (linear layout must read
    # EVERY file — its sort key is unconstrained), orderkey-only
    # (linear's best case), and a diagonal box on both dims
    p = F.col("probe")
    cust_constrained = (p % 3 == 0) | (p % 3 == 2)
    ok_constrained = (p % 3 == 1) | (p % 3 == 2)
    probes = spark.range(n_probes).select(
        F.col("id").cast("long").alias("probe")
    ).crossJoin(F.broadcast(bounds)).select(
        "probe",
        F.when(cust_constrained, edge("cmin", "cmax", p))
        .otherwise(F.col("cmin")).alias("c_lo"),
        F.when(cust_constrained, edge("cmin", "cmax", p + 1))
        .otherwise(F.col("cmax") + 1).alias("c_hi"),
        F.when(ok_constrained, edge("kmin", "kmax", p))
        .otherwise(F.col("kmin")).alias("k_lo"),
        F.when(ok_constrained, edge("kmin", "kmax", p + 1))
        .otherwise(F.col("kmax") + 1).alias("k_hi"),
    )

    def scanned(stats: DataFrame, name: str) -> DataFrame:
        hit = (
            (F.col("cust_max") >= F.col("c_lo"))
            & (F.col("cust_min") < F.col("c_hi"))
            & (F.col("ok_max") >= F.col("k_lo"))
            & (F.col("ok_min") < F.col("k_hi"))
        )
        counted = (
            probes.join(F.broadcast(stats), hit)
            .groupBy("probe")
            .agg(F.count(F.lit(1)).alias(name))
        )
        # a probe overlapping zero files must still emit its row
        return probes.select("probe").join(counted, "probe", "left").select(
            "probe", F.coalesce(F.col(name), F.lit(0)).alias(name)
        )

    return (
        scanned(stats_z, "files_zorder")
        .join(scanned(stats_lin, "files_linear"), "probe")
        .orderBy("probe")
    )


_PRUNE_SQL = """
WITH b AS (
  SELECT min(o_custkey) AS cmin, max(o_custkey) AS cmax,
         min(o_orderkey) AS kmin, max(o_orderkey) AS kmax
  FROM orders
), z AS (
  SELECT o_custkey AS cust, o_orderkey AS ok, {z_expr} AS z
  FROM orders, b
), fz AS (
  SELECT cust, ok,
         NTILE({n_files}) OVER (ORDER BY z, ok) AS file_id
  FROM z
), fl AS (
  SELECT cust, ok,
         NTILE({n_files}) OVER (ORDER BY ok, cust) AS file_id
  FROM z
), sz AS (
  SELECT file_id, min(cust) AS cust_min, max(cust) AS cust_max,
         min(ok) AS ok_min, max(ok) AS ok_max
  FROM fz GROUP BY file_id
), sl AS (
  SELECT file_id, min(cust) AS cust_min, max(cust) AS cust_max,
         min(ok) AS ok_min, max(ok) AS ok_max
  FROM fl GROUP BY file_id
), p AS (
  SELECT CAST(u.probe AS BIGINT) AS probe,
         CASE WHEN u.probe % 3 IN (0, 2)
              THEN cmin + CAST(FLOOR(((cmax - cmin + 1) * u.probe)
                / {n_probes}) AS BIGINT)
              ELSE cmin END AS c_lo,
         CASE WHEN u.probe % 3 IN (0, 2)
              THEN cmin + CAST(FLOOR(((cmax - cmin + 1) * (u.probe + 1))
                / {n_probes}) AS BIGINT)
              ELSE cmax + 1 END AS c_hi,
         CASE WHEN u.probe % 3 IN (1, 2)
              THEN kmin + CAST(FLOOR(((kmax - kmin + 1) * u.probe)
                / {n_probes}) AS BIGINT)
              ELSE kmin END AS k_lo,
         CASE WHEN u.probe % 3 IN (1, 2)
              THEN kmin + CAST(FLOOR(((kmax - kmin + 1) * (u.probe + 1))
                / {n_probes}) AS BIGINT)
              ELSE kmax + 1 END AS k_hi
  FROM b, (SELECT unnest(range(0, {n_probes})) AS probe) u
)
SELECT p.probe,
       (SELECT CAST(count(*) AS BIGINT) FROM sz
        WHERE sz.cust_max >= p.c_lo AND sz.cust_min < p.c_hi
          AND sz.ok_max >= p.k_lo AND sz.ok_min < p.k_hi)
         AS files_zorder,
       (SELECT CAST(count(*) AS BIGINT) FROM sl
        WHERE sl.cust_max >= p.c_lo AND sl.cust_min < p.c_hi
          AND sl.ok_max >= p.k_lo AND sl.ok_min < p.k_hi)
         AS files_linear
FROM p
ORDER BY p.probe
"""


def prune_gain_oracle(n_files: int = 64, n_probes: int = 10) -> str:
    z_expr = morton2_sql(
        _NORM_SQL.format(c="o_custkey", mn="cmin", mx="cmax"),
        _NORM_SQL.format(c="o_orderkey", mn="kmin", mx="kmax"),
    )
    return _PRUNE_SQL.format(
        z_expr=z_expr, n_files=n_files, n_probes=n_probes
    )


def _register() -> None:
    from dynamodb_to_datalake_project_spark.catalog import query
    from dynamodb_to_datalake_project_spark.lake import load_table

    @query("zorder_layout_stats", oracle=bucket_stats_oracle())
    def q_zorder_layout_stats(spark, sf_dir):
        """Z-order clustering of orders over (custkey, orderkey):
        Morton codes in pure Catalyst, NTILE file assignment, and
        the per-file min/max footer stats a pruning scanner reads.
        The oracle recomputes the interleave bit-for-bit in SQL."""
        return zorder_bucket_stats(load_table(spark, sf_dir, "orders"))

    @query("zorder_prune_gain", oracle=prune_gain_oracle())
    def q_zorder_prune_gain(spark, sf_dir):
        """File-skipping payoff of the Z-order layout: per diagonal
        box probe, the number of files a min/max-pruning scan reads
        under Z-order vs a single-column sort. files_zorder stays a
        near-constant band while files_linear degrades toward
        all-files on the non-sorted dimension — the measured reason
        to pay the clustering shuffle at 100 TB."""
        return zorder_prune_gain(load_table(spark, sf_dir, "orders"))


_register()
