"""Lake IO (S9/S10/S11/S12) and physical-plan shape assertions.

The plan tests pin the properties that matter at 100 TB: filters reach
the parquet scan, small dims broadcast, global top-N never does a full
sort, scans only read projected columns.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark import catalog, lake
from dynamodb_to_datalake_project_spark.catalog import QUERIES

catalog.load_all()

SF_DIR = "/root/testdata/sf0.001"


def test_partitioned_json_sink_roundtrip(spark, tmp_path):
    """S9: CDC-drop layout year=…/minute=… readable back with partition
    columns recovered from the path."""
    df = spark.createDataFrame(
        [("a", 1, "2024", "01"), ("b", 2, "2024", "02")],
        ["id", "v", "year", "month"],
    )
    out = str(tmp_path / "drops")
    lake.write_json_lines(df, out, partition_by=["year", "month"])
    assert glob.glob(os.path.join(out, "year=2024", "month=01", "*.json"))
    back = spark.read.json(out)
    # partition type inference is disabled engine-wide (see session.py):
    # zero-padded partition values must survive as strings
    assert {(r.id, r.year, r.month) for r in back.collect()} == {
        ("a", "2024", "01"), ("b", "2024", "02")
    }


def test_gzip_json_sink(spark, tmp_path):
    df = spark.createDataFrame([("x", 1)], ["id", "v"])
    out = str(tmp_path / "gz")
    lake.write_json_lines(df, out, gzip=True)
    assert glob.glob(os.path.join(out, "*.json.gz"))
    assert spark.read.json(out).first().id == "x"


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    out = str(tmp_path / "csv")
    lake.write_csv(df, out)
    back = lake.read_csv(spark, out, schema="k int, s string")
    assert sorted((r.k, r.s) for r in back.collect()) == [(1, "a"), (2, "b")]


def test_register_table_and_sql(spark, tmp_path):
    """S12: catalog registration replaces Hudi hive-sync; partitions
    discoverable, table queryable through spark.sql."""
    df = spark.createDataFrame(
        [("a", "2024", 1.0), ("b", "2025", 2.0)], ["id", "year", "v"]
    )
    path = str(tmp_path / "tbl")
    lake.write_table(df, path, partition_by=["year"])
    lake.register_table(spark, "t_reg_test", path)
    got = spark.sql(
        "SELECT id, v FROM default.t_reg_test WHERE year = '2025'"
    ).collect()
    assert [(r.id, r.v) for r in got] == [("b", 2.0)]
    spark.sql("DROP TABLE default.t_reg_test")


def test_scan_pushdown_plan(spark):
    plan = QUERIES["s1_scan_pushdown"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "l_discount" in plan.split("PushedFilters")[1][:200]
    # column pruning: scan schema must not include untouched columns
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema


def test_star_join_broadcasts_dims(spark):
    df = QUERIES["j2_star_join_revenue"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_topn_avoids_global_sort(spark):
    df = QUERIES["o1_topn_orders"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_approx_aggs_within_tolerance(spark):
    row = QUERIES["a9_approx_aggs"](spark, SF_DIR).first()
    exact = (
        lake.load_table(spark, SF_DIR, "lineitem")
        .agg(F.countDistinct("l_orderkey").alias("d"))
        .first()
        .d
    )
    assert row.n_orders_exact == exact
    # the query itself asserts HLL within 3 sigma / sketch-median
    # within 2% — both must come back TRUE (they are what the DuckDB
    # oracle hash-checks as literal TRUEs)
    assert row.hll_ok and row.median_ok


def test_manifest_driven_scan(spark, tmp_path):
    """S2: scan exactly the files listed in manifest-files.json —
    a file in the prefix but absent from the manifest is not read."""
    import json

    d = tmp_path / "exp"
    d.mkdir()
    (d / "f1.json").write_text('{"k": 1}\n')
    (d / "f2.json").write_text('{"k": 2}\n')
    (d / "orphan.json").write_text('{"k": 99}\n')
    (d / "manifest-files.json").write_text(
        json.dumps({"dataFileS3Key": "f1.json", "itemCount": 1}) + "\n"
        + json.dumps({"dataFileS3Key": "f2.json", "itemCount": 1}) + "\n"
    )
    paths = lake.manifest_paths(spark, str(d / "manifest-files.json"))
    assert len(paths) == 2
    got = lake.read_json_lines(spark, paths, schema="k long")
    assert sorted(r.k for r in got.collect()) == [1, 2]


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketed co-located join: both sides bucketed by the join key ->
    SortMergeJoin with zero Exchange in the plan."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = lake.load_table(spark, SF_DIR, "orders")
        li = lake.load_table(spark, SF_DIR, "lineitem")
        lake.write_bucketed_table(orders, "b_orders", ["o_orderkey"], 4, ["o_orderkey"])
        lake.write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 4, ["l_orderkey"])
        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_uuid_generation(spark):
    """C8: unique id generation (uuid()) — the reference names CDC drop
    files uuid4().hex (dynamodb_stream_consumer.py:81)."""
    ids = [r.u for r in spark.range(100).select(F.expr("uuid()").alias("u")).collect()]
    assert len(set(ids)) == 100


def test_compact_partitions(spark, tmp_path):
    """Many small files per partition -> exactly one after compaction,
    with identical data and untouched filtered-out partitions."""
    path = str(tmp_path / "frag")
    # write 5 separate appends -> 5+ files per partition
    for i in range(5):
        spark.createDataFrame(
            [(f"r{i}-{j}", "2024-01-0%d" % (j + 1)) for j in range(2)],
            ["v", "day"],
        ).write.mode("append").partitionBy("day").parquet(path)
    day1 = os.path.join(path, "day=2024-01-01")
    assert len(glob.glob(os.path.join(day1, "*.parquet"))) >= 5
    before = set(r.v for r in spark.read.parquet(path).collect())

    lake.compact_partitions(spark, path, ["day"], partition_filter=F.col("day") == "2024-01-01")
    assert len(glob.glob(os.path.join(day1, "*.parquet"))) == 1
    # untouched partition keeps its file count
    day2 = os.path.join(path, "day=2024-01-02")
    assert len(glob.glob(os.path.join(day2, "*.parquet"))) >= 5
    assert set(r.v for r in spark.read.parquet(path).collect()) == before

    lake.compact_partitions(spark, path, ["day"])
    assert len(glob.glob(os.path.join(day2, "*.parquet"))) == 1
    assert set(r.v for r in spark.read.parquet(path).collect()) == before


def test_rate_limited_compaction(spark, tmp_path):
    """plan_compaction ranks worst-fragmented partitions first and the
    bounded run compacts ONLY the planned ones; backlog drains across
    runs."""
    path = str(tmp_path / "ratelim")
    # day-01: 6 files, day-02: 3 files, day-03: 1 file (never planned)
    for day, nfiles in (("2024-01-01", 6), ("2024-01-02", 3), ("2024-01-03", 1)):
        for i in range(nfiles):
            spark.createDataFrame(
                [(f"{day}-{i}", day)], ["v", "day"]
            ).write.mode("append").partitionBy("day").parquet(path)

    plan = lake.plan_compaction(path, max_partitions_per_run=1)
    assert [(p["day"], n) for p, n in plan] == [("2024-01-01", 6)]
    before = set(r.v for r in spark.read.parquet(path).collect())

    # run 1: only the worst partition is rewritten
    assert lake.compact_worst_partitions(spark, path, ["day"], max_partitions_per_run=1) == 1
    files = lambda d: len(glob.glob(os.path.join(path, f"day={d}", "*.parquet")))
    assert files("2024-01-01") == 1
    assert files("2024-01-02") == 3
    # run 2 drains the backlog; single-file partition is never touched
    assert lake.compact_worst_partitions(spark, path, ["day"], max_partitions_per_run=5) == 1
    assert files("2024-01-02") == 1
    assert files("2024-01-03") == 1
    assert lake.compact_worst_partitions(spark, path, ["day"]) == 0
    assert set(r.v for r in spark.read.parquet(path).collect()) == before


def test_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """A linear (ts-sorted) layout prunes only ts; the z-ordered layout
    prunes files on BOTH clustered columns via parquet footer stats."""
    ev = lake.load_table(spark, SF_DIR, "events").select("user_id", "value", "ts")
    n_files = 16

    linear = str(tmp_path / "linear")
    (
        ev.repartitionByRange(n_files, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(linear)
    )
    zord = str(tmp_path / "zord")
    lake.write_zordered_table(ev, zord, ["user_id", "value"], n_files=n_files)

    # same rows either way
    assert spark.read.parquet(zord).count() == ev.count()

    # narrow slice in each clustered dimension
    lo_u, hi_u = 10, 12
    lo_v, hi_v = 1.0, 2.0
    z_u, tot_z = lake.overlapping_files(zord, "user_id", lo_u, hi_u)
    z_v, _ = lake.overlapping_files(zord, "value", lo_v, hi_v)
    l_u, tot_l = lake.overlapping_files(linear, "user_id", lo_u, hi_u)
    l_v, _ = lake.overlapping_files(linear, "value", lo_v, hi_v)
    assert tot_z == n_files and tot_l == n_files
    # ts-sorted layout: user_id/value stats span (nearly) everything ->
    # no useful pruning on either non-sort dimension
    assert l_u == n_files and l_v >= n_files - 1
    # z-order: each dimension alone prunes a strict subset...
    assert z_u < n_files and z_v < n_files
    # ...and the conjunctive (both-dimension) scan — the case z-order
    # exists for — touches only a small fraction of the files
    import pyarrow.parquet as pq

    def _frange(f, col):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        mn = mx = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mn = st.min if mn is None else min(mn, st.min)
            mx = st.max if mx is None else max(mx, st.max)
        return mn, mx

    both = 0
    for f in glob.glob(os.path.join(zord, "*.parquet")):
        u, v = _frange(f, "user_id"), _frange(f, "value")
        if u[1] >= lo_u and u[0] <= hi_u and v[1] >= lo_v and v[0] <= hi_v:
            both += 1
    assert both <= n_files // 4
