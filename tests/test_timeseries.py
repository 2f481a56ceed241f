"""Edge semantics of the time-series operators (hand-built frames).

Covers what the catalog oracles can't isolate: the inclusive as-of
bound at equal timestamps, NULL when no prior right row, same-ts
right-side tiebreak, exact session-gap boundary, and the strict open
interval of the bucketed range join (including the cross-bucket case).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.timeseries import (
    asof_join,
    range_join_bucketed,
    sessionize,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("p1", "u1", _ts("2024-01-01 10:00:00")),  # equal-ts click → inclusive
            ("p2", "u1", _ts("2024-01-01 11:00:00")),  # later → latest click
            ("p3", "u2", _ts("2024-01-01 09:00:00")),  # no prior click → NULL
        ],
        "purchase_id string, user_id string, purchase_ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 09:30:00"), "c1", 1.0),
            ("u1", _ts("2024-01-01 10:00:00"), "c2", 2.0),  # ties p1's ts
            ("u1", _ts("2024-01-01 10:00:00"), "c3", 3.0),  # same ts, higher tiebreak
            ("u2", _ts("2024-01-01 12:00:00"), "c4", 4.0),  # after p3
        ],
        "user_id string, ts timestamp, event_id string, value double",
    )
    return left, right


def test_asof_inclusive_bound_and_tiebreak(frames):
    left, right = frames
    out = {
        r["purchase_id"]: r["asof_value"]
        for r in asof_join(
            left, right, key="user_id", left_ts="purchase_ts", right_ts="ts",
            value_col="value", tiebreak="event_id",
        ).collect()
    }
    # equal-ts click counts (inclusive); among same-ts clicks the highest
    # tiebreak (c3) wins as "last"
    assert out == {"p1": 3.0, "p2": 3.0, "p3": None}


def test_sessionize_gap_boundary(spark):
    # gap of exactly gap_us does NOT split; gap_us+1 does
    ev = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:00"), "e1"),
            ("u1", _ts("2024-01-01 00:30:00"), "e2"),  # == 1800 s gap → same session
            ("u1", _ts("2024-01-01 01:00:01"), "e3"),  # 1801 s gap → new session
        ],
        "user_id string, ts timestamp, event_id string",
    )
    rows = sessionize(
        ev, key="user_id", ts_col="ts", order_tiebreak="event_id",
        gap_us=1800 * 1_000_000,
    ).collect()
    by_sess = {int(r["session_num"]): r["n_events"] for r in rows}
    assert by_sess == {1: 2, 2: 1}


def test_range_join_strict_open_interval(spark):
    anchors = spark.createDataFrame(
        [("a1", "u1", _ts("2024-01-01 00:00:30"))],  # window spans two buckets
        "anchor_id string, user_id string, ts timestamp",
    )
    events = spark.createDataFrame(
        [
            ("u1", _ts("2024-01-01 00:00:30")),  # == anchor ts → excluded (strict >)
            ("u1", _ts("2024-01-01 00:00:31")),  # in window, same bucket
            ("u1", _ts("2024-01-01 00:01:29")),  # in window, NEXT bucket
            ("u1", _ts("2024-01-01 00:01:30")),  # == anchor+window → excluded (strict <)
            ("u2", _ts("2024-01-01 00:00:31")),  # wrong key
        ],
        "user_id string, ts timestamp",
    )
    rows = range_join_bucketed(
        anchors, events, key="user_id", anchor_ts="ts", event_ts="ts",
        window_us=60 * 1_000_000, anchor_id="anchor_id",
    ).collect()
    assert len(rows) == 1 and rows[0]["n_follow"] == 2


def test_funnel_strict_ordering_semantics(spark):
    """The funnel must count only users whose steps occur in strict
    temporal order: a purchase BEFORE signup must not convert, and
    the earliest-completion rule must still find a valid later event
    when one exists."""
    import pytest as _pt

    from dynamodb_to_datalake_project_spark.timeseries import funnel_conversion

    rows = [
        # user 1: clean in-order funnel
        (1, "2024-01-01 10:00:00", "signup"),
        (1, "2024-01-01 11:00:00", "view"),
        (1, "2024-01-02 09:00:00", "purchase"),
        # user 2: purchase BEFORE signup — must stop at view
        (2, "2024-01-03 10:00:00", "purchase"),
        (2, "2024-01-04 10:00:00", "signup"),
        (2, "2024-01-04 11:00:00", "view"),
        # user 3: early view before signup, but a second view after —
        # earliest-completion must use the later one and convert
        (3, "2024-01-01 08:00:00", "view"),
        (3, "2024-01-01 09:00:00", "signup"),
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 11:00:00", "purchase"),
        # user 4: never signs up
        (4, "2024-01-01 10:00:00", "view"),
        (4, "2024-01-01 11:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_s", "event_type"]).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    got = {
        r.step: r.n_users
        for r in funnel_conversion(ev, ["signup", "view", "purchase"]).collect()
    }
    assert got == {"signup": 3, "view": 3, "purchase": 2}
    with _pt.raises(ValueError, match="empty step list"):
        funnel_conversion(ev, [])


def test_retention_cohort_offsets(spark):
    """Offset arithmetic: a user first active in week 0 and again two
    weeks later lands in (cohort, 0) and (cohort, 2); a second-cohort
    user stays in their own row."""
    from dynamodb_to_datalake_project_spark.timeseries import retention_cohorts

    rows = [
        (1, "2024-01-01 10:00:00"),  # Monday, week A
        (1, "2024-01-15 10:00:00"),  # week A + 2
        (2, "2024-01-02 10:00:00"),  # week A too
        (3, "2024-01-08 10:00:00"),  # week B cohort
    ]
    ev = spark.createDataFrame(rows, ["user_id", "ts_s"]).select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts")
    )
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_gapfill_locf_and_interpolation(spark):
    """Hand-built series with a 2-bucket interior gap: the spine is
    dense from first to last observed bucket, LOCF carries the last
    bucket MEAN, and interpolation is linear in bucket index between
    the straddling observed buckets."""
    from dynamodb_to_datalake_project_spark.timeseries import gapfill_resample

    ev = spark.createDataFrame(
        [
            # key a: buckets 0 (two obs, mean 2.0), 3 (one obs 8.0)
            ("a", _ts("2024-01-01 00:10:00"), 1.0),
            ("a", _ts("2024-01-01 00:50:00"), 3.0),
            ("a", _ts("2024-01-01 03:30:00"), 8.0),
            # key b: single bucket → single-row spine, no gaps
            ("b", _ts("2024-01-01 05:00:00"), 7.0),
        ],
        "k string, ts timestamp, value double",
    )
    out = gapfill_resample(ev, "k", "ts", "value", bucket_us=3600 * 1_000_000)
    rows = {(r["k"], r["bucket"]): r for r in out.collect()}
    base = 473352  # floor(epoch_us(2024-01-01 00:00) / 3600e6)
    assert set(rows) == {("a", base + i) for i in range(4)} | {("b", base + 5)}
    a0, a1, a2, a3 = (rows[("a", base + i)] for i in range(4))
    assert (a0["n_obs"], a0["v_locf"], a0["v_interp"]) == (2, 2.0, 2.0)
    # interior gap rows: LOCF holds 2.0; interpolation walks 2.0 → 8.0
    assert (a1["n_obs"], a1["v_locf"], a1["v_interp"]) == (0, 2.0, 4.0)
    assert (a2["n_obs"], a2["v_locf"], a2["v_interp"]) == (0, 2.0, 6.0)
    assert (a3["n_obs"], a3["v_locf"], a3["v_interp"]) == (1, 8.0, 8.0)
    assert rows[("b", base + 5)]["v_interp"] == 7.0
    # bucket_ts round-trips the grid
    assert a1["bucket_ts"] == _ts("2024-01-01 01:00:00")
