"""Unit tests for operators/temporal.py: as-of join semantics
(inclusivity, ties, tolerance, missing-match nulls) and bucketed range
join boundaries (inclusive start, exclusive end, bucket-straddling
matches)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.operators.temporal import (
    asof_join,
    range_join_bucketed,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _asof(spark, left_rows, right_rows, **kw):
    left = spark.createDataFrame(left_rows, "id bigint, k bigint, ts timestamp")
    right = spark.createDataFrame(right_rows, "k bigint, rts timestamp, rv double")
    kw.setdefault("on", ["k"])
    kw.setdefault("left_ts", "ts")
    kw.setdefault("right_ts", "rts")
    kw.setdefault("right_cols", ["rv"])
    out = asof_join(left, right, **kw)
    return {r["id"]: (r["asof_ts"], r["rv"]) for r in out.collect()}


def test_asof_picks_latest_at_or_before(spark):
    got = _asof(
        spark,
        [(1, 10, _ts("2024-01-01T00:10:00")), (2, 10, _ts("2024-01-01T00:25:00"))],
        [
            (10, _ts("2024-01-01T00:00:00"), 1.0),
            (10, _ts("2024-01-01T00:20:00"), 2.0),
            (10, _ts("2024-01-01T00:30:00"), 3.0),
        ],
    )
    assert got[1] == (_ts("2024-01-01T00:00:00"), 1.0)
    assert got[2] == (_ts("2024-01-01T00:20:00"), 2.0)


def test_asof_equal_timestamp_is_inclusive(spark):
    got = _asof(
        spark,
        [(1, 10, _ts("2024-01-01T00:20:00"))],
        [(10, _ts("2024-01-01T00:20:00"), 7.0)],
    )
    assert got[1] == (_ts("2024-01-01T00:20:00"), 7.0)


def test_asof_no_prior_match_is_null(spark):
    got = _asof(
        spark,
        [(1, 10, _ts("2024-01-01T00:00:00")), (2, 99, _ts("2024-01-01T09:00:00"))],
        [(10, _ts("2024-01-01T00:05:00"), 1.0)],
    )
    assert got[1] == (None, None)  # right row is later
    assert got[2] == (None, None)  # key never appears on the right


def test_asof_tolerance_nulls_stale_matches(spark):
    got = _asof(
        spark,
        [(1, 10, _ts("2024-01-01T01:00:00")), (2, 10, _ts("2024-01-01T00:01:00"))],
        [(10, _ts("2024-01-01T00:00:00"), 1.0)],
        tolerance_seconds=600,
    )
    assert got[1] == (None, None)  # 1 h back > 10 min tolerance
    assert got[2] == (_ts("2024-01-01T00:00:00"), 1.0)


def test_asof_matches_duckdb_asof_on_events(spark, sf_dir):
    """The j6 query's operator output must agree with DuckDB's native
    ASOF JOIN row-for-row (already hash-checked via the oracle; this
    pins the operator directly at unit level for one user)."""
    import duckdb

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    left = ev.filter((F.col("event_type") == "view") & (F.col("user_id") == 3)).select(
        "event_id", "user_id", "ts"
    )
    right = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") == 3))
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(F.max("event_id").alias("ref_event_id"))
    )
    got = {
        r["event_id"]: r["ref_event_id"]
        for r in asof_join(
            left, right, ["user_id"], "ts", "pts", ["ref_event_id"]
        ).collect()
    }
    want = {
        eid: ref
        for eid, ref in duckdb.sql(
            f"""
            WITH e AS (SELECT * FROM '{sf_dir}/events.parquet' WHERE user_id = 3),
            r AS (SELECT user_id, ts AS pts, max(event_id) AS ref
                  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts)
            SELECT l.event_id, r.ref
            FROM (SELECT * FROM e WHERE event_type = 'view') l
            ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.pts
            """
        ).fetchall()
    }
    assert got == want


def _range(spark, left_rows, right_rows, window_seconds=60):
    left = spark.createDataFrame(left_rows, "id bigint, k bigint, ts timestamp")
    right = spark.createDataFrame(right_rows, "rid bigint, k bigint, ts timestamp")
    out = range_join_bucketed(
        left, right, ["k"], "ts", "ts", window_seconds=window_seconds
    )
    pairs = {(r["id"], r["r_rid"]) for r in out.collect()}
    return pairs


def test_range_join_boundaries(spark):
    t0 = _ts("2024-01-01T00:00:30")
    pairs = _range(
        spark,
        [(1, 10, t0)],
        [
            (100, 10, t0),  # == start: included
            (101, 10, t0 + dt.timedelta(seconds=59)),  # inside
            (102, 10, t0 + dt.timedelta(seconds=60)),  # == end: excluded
            (103, 10, t0 - dt.timedelta(seconds=1)),  # before: excluded
            (104, 99, t0),  # other key: excluded
        ],
    )
    assert pairs == {(1, 100), (1, 101)}


def test_range_join_matches_across_bucket_boundary(spark):
    # window [00:00:50, 00:01:50) straddles the minute buckets 0 and 1;
    # the right row at 00:01:10 lives in bucket 1 and must still match.
    pairs = _range(
        spark,
        [(1, 10, _ts("2024-01-01T00:00:50"))],
        [(100, 10, _ts("2024-01-01T00:01:10"))],
    )
    assert pairs == {(1, 100)}


def test_range_join_no_duplicate_matches(spark):
    # A right row in the SAME bucket as the left anchor must appear
    # exactly once even though the left side explodes to two buckets.
    out_pairs = _range(
        spark,
        [(1, 10, _ts("2024-01-01T00:00:00"))],
        [(100, 10, _ts("2024-01-01T00:00:30"))],
    )
    assert out_pairs == {(1, 100)}
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T00:00:00"))], "id bigint, k bigint, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T00:00:30"))], "rid bigint, k bigint, ts timestamp"
    )
    assert (
        range_join_bucketed(left, right, ["k"], "ts", "ts", window_seconds=60).count()
        == 1
    )


def test_asof_plan_single_exchange(spark):
    """The as-of join must cost ONE shuffle (the union window on keys) —
    not a join exchange per side plus a window exchange."""
    import contextlib
    import io

    left = spark.createDataFrame([(1, 10, _ts("2024-01-01T00:00:00"))],
                                 "id bigint, k bigint, ts timestamp")
    right = spark.createDataFrame([(10, _ts("2024-01-01T00:00:00"), 1.0)],
                                  "k bigint, rts timestamp, rv double")
    out = asof_join(left, right, ["k"], "ts", "rts", ["rv"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    # count node-detail headers "(n) Exchange" — the node name also
    # appears in the tree rendering, which would double-count
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert len(re.findall(r"\(\d+\) Window", p)) == 1
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_range_join_plan_is_hash_join(spark):
    """The bucketed range join must plan as an equi hash join — the raw
    theta predicate would plan BroadcastNestedLoopJoin (quadratic)."""
    import contextlib
    import io

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.createDataFrame([(1, 10, _ts("2024-01-01T00:00:00"))],
                                     "id bigint, k bigint, ts timestamp")
        right = spark.createDataFrame([(100, 10, _ts("2024-01-01T00:00:30"))],
                                      "rid bigint, k bigint, ts timestamp")
        out = range_join_bucketed(left, right, ["k"], "ts", "ts", 60)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        p = buf.getvalue()
        assert "SortMergeJoin" in p or "ShuffledHashJoin" in p
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_asof_forward_direction(spark):
    got = _asof(
        spark,
        [(1, 10, _ts("2024-01-01T00:10:00")), (2, 10, _ts("2024-01-01T00:31:00"))],
        [
            (10, _ts("2024-01-01T00:20:00"), 2.0),
            (10, _ts("2024-01-01T00:30:00"), 3.0),
        ],
        direction="forward",
    )
    assert got[1] == (_ts("2024-01-01T00:20:00"), 2.0)  # next at-or-after
    assert got[2] == (None, None)  # nothing after 00:31


def test_asof_forward_tolerance_and_tie(spark):
    got = _asof(
        spark,
        [(1, 10, _ts("2024-01-01T00:00:00")), (2, 10, _ts("2024-01-01T00:20:00"))],
        [(10, _ts("2024-01-01T00:20:00"), 9.0)],
        direction="forward",
        tolerance_seconds=600,
    )
    assert got[1] == (None, None)  # 20 min ahead > 10 min tolerance
    assert got[2] == (_ts("2024-01-01T00:20:00"), 9.0)  # tie inclusive


def test_asof_null_timestamps_match_nothing(spark):
    """A null left_ts matches nothing in EITHER direction, and a null
    right_ts row is never carried (regression: .desc() sorted null
    left_ts last, where it matched the earliest right row; a null
    right_ts payload was carried from wherever nulls sorted)."""
    from kafka_metrics_exporter_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [("k", "2024-01-01 00:05:00"), ("k", None)],
        "k string, lts string",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    right = spark.createDataFrame(
        [("k", "2024-01-01 00:01:00", 1.0), ("k", None, 99.0)],
        "k string, rts string, payload double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    for direction in ("backward", "forward"):
        out = {
            (r["k"], str(r["lts"])): r["payload"]
            for r in asof_join(
                left, right, ["k"], "lts", "rts", ["payload"],
                direction=direction,
            ).collect()
        }
        assert out[("k", "None")] is None, direction
        # the null-ts right row must never be the carried payload
        assert out[("k", "2024-01-01 00:05:00")] in (1.0, None)
        if direction == "backward":
            assert out[("k", "2024-01-01 00:05:00")] == 1.0
