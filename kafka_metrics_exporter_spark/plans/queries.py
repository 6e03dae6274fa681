"""The engine's named query suite (SURVEY.md §2) with DuckDB oracles.

Each query re-expresses one operator family from the reference's
normalization dataflow or dashboard query corpus on the driver's
TPC-H-ish tables (TESTDATA.md): `events` stands in for the metric
time-series (series key = ``user_id``/``event_type``, event-time =
``ts``, numeric value = ``value``), `lineitem`/`orders` for the
high-cardinality fact tables, the small dims for catalogs.

Determinism rules (driver hashes values after sorting columns by name):
- every computed column is aliased identically in Spark and SQL;
- double aggregates are ``round(x, 4)`` on both sides;
- timestamps are emitted as ``yyyy-MM-dd HH:mm:ss`` strings;
- every ranking/limit has a total-order tiebreaker (SURVEY §7.3).

Scale notes (100 TB readiness) per query are in the docstrings; the
common principles: aggregate before join where possible, broadcast
dims, never collect, keep expressions JVM-side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.operators.relational import (
    latest_per_key,
    rate_per_second,
    top_k_per_group,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a test table; normalize timestamp physical types to plain
    (UTC-instant) Spark timestamps.

    The driver's parquet has shipped `ts` two ways across rounds:
    TIMESTAMP(NANOS) (rejected by Spark's reader unless `nanosAsLong`
    maps it to raw-nano bigints, which we then truncate to micros —
    identical to DuckDB's nanos→micros read) and TIMESTAMP(MICROS)
    without the UTC flag (read as TIMESTAMP_NTZ, which Spark refuses to
    cast to DOUBLE for epoch math).  Both normalize to TIMESTAMP here;
    the session timezone is pinned UTC so the NTZ→LTZ cast preserves
    the wall-clock value and epoch casts agree with DuckDB.
    """
    from kafka_metrics_exporter_spark.session import ensure_worker_imports

    ensure_worker_imports(spark)  # foreign driver sessions: ship the pkg zip
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


def _r4(c) -> F.Column:
    return F.round(c, 4)


def _lsum(col) -> F.Column:
    """Order-independent exact sum, scaled-int form: quantize each
    double to 8 decimals with ``floor(x·1e8 + 0.5)`` (identical IEEE
    ops in Spark and DuckDB — no round() tie ambiguity) and accumulate
    the exact integral DECIMAL(38,0).  Integer addition is associative,
    so any partitioning/ordering yields the identical total — the same
    determinism DECIMAL(28,10) accumulation gave round 3, but ~1.6×
    faster: the per-row double→BigDecimal cast dominated a1_a4/a7
    (VERDICT r3 perf item; BASELINE.md round-4 note).  Kept integral
    mid-plan so ordering/threshold comparisons stay exact.
    SQL twin: SUM(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT))
    (DuckDB accumulates BIGINT into an exact HUGEINT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.floor(c * F.lit(100000000.0) + F.lit(0.5)).cast("decimal(38,0)"))


def _dsum(col) -> F.Column:
    """``_lsum`` surfaced as a double: descale by 1e8 AFTER the exact
    integral sum, emitted UNROUNDED — the comparison layer rounds both
    sides once with a single rule (in-engine round() disagrees between
    Spark and DuckDB on exact halves; see w11_rollup_cascade).  The
    8-decimal quantum is the engine's documented summation resolution.
    SQL twin: (CAST(SUM(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT))
    AS DOUBLE) / 100000000.0)."""
    return _lsum(col).cast("double") / F.lit(100000000.0)


_TS_FMT = "yyyy-MM-dd HH:mm:ss"


# ---------------------------------------------------------------------------
# A1-A4: grouped sum/avg/max/min/count — the Kibana terms-bucket metric
# family (reference ELK/jmx_dashboard.json:284,102,158; SURVEY §2.4).
# ---------------------------------------------------------------------------
@query(
    "a1_a4_grouped_metrics",
    """
    SELECT l_returnflag, l_linestatus,
           (CAST(SUM(CAST(floor(l_quantity * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0)      AS sum_qty,
           (CAST(SUM(CAST(floor(l_extendedprice * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_base_price,
           (CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0)
                                                                        AS sum_disc_price,
           (CAST(SUM(CAST(floor(l_quantity * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) / COUNT(*)
                                                                        AS avg_qty,
           round(MAX(l_extendedprice), 4)                    AS max_price,
           round(MIN(l_extendedprice), 4)                    AS min_price,
           COUNT(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a1_a4_grouped_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A4 over lineitem (TPC-H Q1 shape).

    Scale: single hash-aggregate with map-side partial agg; the filter
    and 7-column projection push into the parquet scan.  Grouping key
    cardinality is tiny (~6), so AQE coalesces post-shuffle partitions.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum("l_quantity").alias("sum_qty"),
            _dsum("l_extendedprice").alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "sum_disc_price"
            ),
            (_dsum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            _r4(F.max("l_extendedprice")).alias("max_price"),
            _r4(F.min("l_extendedprice")).alias("min_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# A5: count-distinct — Kibana `cardinality` of topic/partition/clientId
# (reference ELK/jmx_dashboard.json:260,414,428).
# ---------------------------------------------------------------------------
@query(
    "a5_count_distinct",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS distinct_users,
           COUNT(*)                AS n_events
    FROM events GROUP BY event_type
    """,
)
def a5_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct (oracle-checkable). At 100 TB the same query would
    use approx_count_distinct (ES cardinality is HLL anyway) — provided
    as a5_approx_count_distinct (rows-only check)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "a5_approx_count_distinct",
    """
    SELECT event_type, 1 AS within_tol
    FROM events GROUP BY event_type
    """,
)
def a5_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 scale path: single-pass HLL sketch — in production approx-only
    (no distinct-expand shuffle).  The HLL estimate itself is
    engine-specific, so the DRIVER row pins the bounded-relative-error
    contract instead (VERDICT r6 item 3): the query emits, per group,
    whether |approx − exact|/exact ≤ 5%, and the oracle asserts that
    bound holds by emitting constant 1 — a deterministic hash-checkable
    row (the exact side is itself hash-verified by a5_count_distinct).
    tests/test_queries_oracle.py::test_a5_approx_within_5pct_of_exact
    keeps the tighter per-group pytest pin."""
    ev = _t(spark, sf_dir, "events")
    # Dedup the (group, value) pairs FIRST, then sketch (optimization
    # r16, guide §2.3): mixing countDistinct with approx_count_distinct
    # in one agg made Spark key the partial aggregate by
    # (event_type, user_id) and ship a 1639-word HLL++ buffer PER PAIR
    # through the exchange (plan: Results [1641] at the first
    # HashAggregate).  Over distinct pairs the HLL estimate is
    # bit-identical (register updates are max-based, duplicates are
    # no-ops) and the exact side is a plain count — the exchange now
    # carries narrow pairs, not sketches.
    return (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", 0.01).alias("_approx"),
            F.count("user_id").alias("_exact"),
        )
        .select(
            "event_type",
            F.when(
                F.abs(F.col("_approx") - F.col("_exact"))
                / F.col("_exact").cast("double")
                <= F.lit(0.05),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("within_tol"),
        )
    )


@query(
    "scale_salted_agg",
    """
    SELECT event_type,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value,
           COUNT(*)             AS n
    FROM events GROUP BY event_type
    """,
)
def scale_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 under key skew: two-stage salted aggregation (operators/
    scale.py).  Stage 1 groups by (key, salt) so no reducer sees more
    than ~1/16 of the hottest key; stage 2 recombines 16 partials per
    key — identical results to the direct groupBy (the oracle is the
    unsalted SQL), different shuffle shape.  The skew insurance for
    aggregations AQE's skew-join handling doesn't cover."""
    from kafka_metrics_exporter_spark.operators.scale import salted_sum_count

    ev = _t(spark, sf_dir, "events")
    out = salted_sum_count(ev, ["event_type"], "value", salt_buckets=16)
    return out.select(
        "event_type",
        (F.col("sum_value").cast("double") / F.lit(100000000.0)).alias("sum_value"),
        "n",
    )


# ---------------------------------------------------------------------------
# A6/W4: latest-value per key — Kibana top_hits size=1 by createdDateTime
# desc (reference ELK/jmx_dashboard.json:88,186,242,452).
# ---------------------------------------------------------------------------
@query(
    "a6_latest_value",
    """
    SELECT event_type, user_id, round(value, 4) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def a6_latest_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest sample per series. One shuffle on the series key; at scale
    WindowExec's rank-limit pushdown keeps per-partition state to 1 row."""
    ev = _t(spark, sf_dir, "events")
    return latest_per_key(ev, ["event_type"], "ts", ["event_id"]).select(
        "event_type",
        "user_id",
        _r4(F.col("value")).alias("value"),
        F.date_format("ts", _TS_FMT).alias("ts_s"),
    )


@query(
    "w4_latest_per_user",
    """
    SELECT user_id, event_type, round(value, 4) AS value,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def w4_latest_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return latest_per_key(ev, ["user_id"], "ts", ["event_id"]).select(
        "user_id",
        "event_type",
        _r4(F.col("value")).alias("value"),
        F.date_format("ts", _TS_FMT).alias("ts_s"),
    )


# ---------------------------------------------------------------------------
# A7: multi-key grouped tables (terms × terms × metrics drill-downs,
# reference ELK/jmx_dashboard.json:130,186,368).
# ---------------------------------------------------------------------------
@query(
    "a7_multikey_drilldown",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           COUNT(*) AS n_items,
           (CAST(SUM(CAST(floor(l_extendedprice * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS revenue
    FROM lineitem
    GROUP BY 1, 2, 3
    """,
)
def a7_multikey_drilldown(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_returnflag",
        "l_linestatus",
        F.year("l_shipdate").cast("int").alias("ship_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        _dsum("l_extendedprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# A8: having-filter on aggregate (`sum by (...)(x) > 0`, reference
# Kafka_Connect_Dashboard.json:656).
# ---------------------------------------------------------------------------
@query(
    "a8_having",
    """
    SELECT o_custkey,
           (CAST(SUM(CAST(floor(o_totalprice * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS total_spend,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING SUM(CAST(floor(o_totalprice * 100000000.0 + 0.5) AS BIGINT)) > 30000000000000
    """,
)
def a8_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            _lsum("o_totalprice").alias("_total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        # exact integral filter at the scaled threshold: no ulp flip
        .filter(F.col("_total") > F.lit(30000000000000))
        .select(
            "o_custkey",
            (F.col("_total").cast("double") / F.lit(100000000.0)).alias("total_spend"),
            "n_orders",
        )
    )


# ---------------------------------------------------------------------------
# A9 + W3/O4: aggregate-of-aggregate + global top-k
# (`topk(5, avg by (connector)(batch_size_avg))`, reference
# Kafka_Connect_Dashboard.json:877).
# ---------------------------------------------------------------------------
@query(
    "a9_topk_of_avg",
    """
    SELECT user_id,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) / COUNT(*) AS avg_value
    FROM events
    GROUP BY user_id
    ORDER BY (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) / COUNT(*) DESC,
             user_id ASC
    LIMIT 5
    """,
)
def a9_topk_of_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agg stage shuffles on user_id; the global top-5 is a
    TakeOrderedAndProject (per-partition heap + driver merge of 5 rows),
    no full sort at any scale."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg((_dsum("value") / F.count(F.lit(1))).alias("_avg"))
        .orderBy(F.col("_avg").desc(), F.col("user_id").asc())
        .limit(5)
        .select("user_id", F.col("_avg").alias("avg_value"))
    )


# ---------------------------------------------------------------------------
# A10: sum-without (group-complement; `sum without (instance)(...)`,
# reference Kafka_Connect_Dashboard.json:166,481).
# ---------------------------------------------------------------------------
@query(
    "a10_sum_without",
    """
    SELECT event_type,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def a10_sum_without(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `sum without (user_id)` ≡ group by the complement of the
    label set; the label universe here is {event_type, user_id}."""
    ev = _t(spark, sf_dir, "events")
    labels = {"event_type", "user_id"}
    keep = sorted(labels - {"user_id"})
    return ev.groupBy(*keep).agg(_dsum("value").alias("total_value"))


# ---------------------------------------------------------------------------
# W1: tumbling time buckets (Kibana date_histogram on createdDateTime,
# reference ELK/jmx_dashboard.json:102,116,340).
# ---------------------------------------------------------------------------
@query(
    "w1_tumbling_window",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS bucket_start,
           event_type,
           CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def w1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """window() keeps event-time semantics identical between this batch
    plan and the streaming pipeline (same logical plan, + watermark)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), F.col("event_type"))
        .agg(_r4(F.sum("value")).alias("sum_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("bucket_start"),
            "event_type",
            "sum_value",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# W2: rate() — per-second derivative with counter-reset clamp
# (reference Kafka_Brokers_Dashboard.json:540,949; semantics per SURVEY §7.2).
# ---------------------------------------------------------------------------
@query(
    "w2_rate",
    """
    WITH d AS (
      SELECT event_type, value, ts,
             lag(value) OVER w AS pv,
             lag(ts)    OVER w AS pts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT event_type,
           CAST(SUM(CAST(
             (CASE WHEN value >= pv THEN value - pv ELSE value END)
             / ((epoch_us(ts) - epoch_us(pts)) / 1000000.0)
             AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS avg_rate,
           COUNT(*) AS n_samples
    FROM d
    WHERE pts IS NOT NULL AND epoch_us(ts) > epoch_us(pts)
    GROUP BY event_type
    """,
)
def w2_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treats each user's event stream as a counter series.  One shuffle
    on the series key for the lag window, then a reduce-side agg; at
    scale the series key (host × mbean) is high-cardinality, so the
    window partitioning is well-spread."""
    ev = _t(spark, sf_dir, "events")
    rated = rate_per_second(
        ev, ["user_id"], "ts", "value", tiebreakers=["event_id"]
    )
    return (
        rated.filter(F.col("rate_per_sec").isNotNull())
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.col("rate_per_sec").cast("decimal(38,18)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_rate"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


# ---------------------------------------------------------------------------
# W3: top-k per group (PromQL topk(k, ...) by group, reference
# Kafka_Brokers_Dashboard.json:1046).
# ---------------------------------------------------------------------------
@query(
    "w3_topk_per_group",
    """
    WITH s AS (
      SELECT event_type, user_id,
             SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, user_id,
           (CAST(total AS DOUBLE) / 100000000.0) AS total_value
    FROM s
    QUALIFY row_number() OVER (
      PARTITION BY event_type ORDER BY total DESC, user_id ASC) <= 3
    """,
)
def w3_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sums = ev.groupBy("event_type", "user_id").agg(_lsum("value").alias("total"))
    top = top_k_per_group(sums, ["event_type"], "total", 3, tiebreakers=["user_id"])
    return top.select(
        "event_type",
        "user_id",
        (F.col("total").cast("double") / F.lit(100000000.0)).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# A11: percentile surfacing — the reference ships JMX percentile attrs
# (quantile label, kafka.yml:133-140) and Kibana averages them; the
# self-computed analog is exact interpolated percentiles per group.
# ---------------------------------------------------------------------------
@query(
    "a11_percentile",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (matches DuckDB quantile_cont),
    computed in ONE pass via the array form — three scalar percentile
    aggregates would buffer/sort the group three times.  At 100 TB the
    same query swaps percentile → approx_percentile (t-digest,
    single-pass mergeable sketch) — same plan shape."""
    li = _t(spark, sf_dir, "lineitem")
    pcts = F.percentile("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("_p"))
        .select(
            "l_returnflag",
            _r4(F.col("_p").getItem(0)).alias("p50_price"),
            _r4(F.col("_p").getItem(1)).alias("p95_price"),
            _r4(F.col("_p").getItem(2)).alias("p99_price"),
        )
    )


@query(
    "a11b_approx_percentile",
    """
    SELECT l_returnflag, 1 AS within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a11b_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 scale path: approx_percentile (t-digest) — single-pass,
    mergeable, O(accuracy) memory per group instead of buffering the
    whole group like exact percentile.  The t-digest estimate is
    engine-specific, so the DRIVER row pins the bounded-relative-error
    contract instead (VERDICT r6 item 3): the query emits, per group,
    whether every estimate is within 1% of the exact percentile
    computed in the same pass, and the oracle asserts the bound holds
    by emitting constant 1 (the exact side is itself hash-verified by
    a11_percentile).  tests/test_queries_oracle.py::
    test_a11b_approx_within_tolerance_of_exact keeps the per-estimate
    pytest pin."""
    li = _t(spark, sf_dir, "lineitem")
    probs = F.array(F.lit(0.5), F.lit(0.95), F.lit(0.99))
    agg = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", probs, 10000).alias("_a"),
        F.percentile("l_extendedprice", probs).alias("_e"),
    )
    relerr = F.zip_with(
        F.col("_a"), F.col("_e"), lambda a, e: F.abs(a - e) / F.abs(e)
    )
    return agg.select(
        "l_returnflag",
        F.when(F.array_max(relerr) <= F.lit(0.01), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("within_tol"),
    )


# ---------------------------------------------------------------------------
# Query-time series join: PromQL binary ops join series on identical
# label sets (`bytesin + bytesout`, reference Kafka_Brokers_Dashboard
# .json:949; ZooKeeper_Dashboard.json:387) — pivot-then-add.
# ---------------------------------------------------------------------------
@query(
    "qtj_series_arith",
    """
    SELECT user_id,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) FILTER (event_type = 'click')
                AS DOUBLE) / 100000000.0) AS clicks_total,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) FILTER (event_type = 'view')
                AS DOUBLE) / 100000000.0) AS views_total,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) FILTER (event_type = 'click')
                + SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) FILTER (event_type = 'view')
                AS DOUBLE) / 100000000.0) AS combined
    FROM events
    GROUP BY user_id
    HAVING SUM(value) FILTER (event_type = 'click') IS NOT NULL
       AND SUM(value) FILTER (event_type = 'view') IS NOT NULL
    """,
)
def qtj_series_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL `a + b` inner-join semantics: only series present on both
    sides survive.  Pivot-then-add = one aggregate, no self-join."""
    ev = _t(spark, sf_dir, "events")
    dec = F.floor(F.col("value") * F.lit(100000000.0) + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    clicks = F.sum(F.when(F.col("event_type") == "click", dec))
    views = F.sum(F.when(F.col("event_type") == "view", dec))
    return (
        ev.groupBy("user_id")
        .agg(clicks.alias("_c"), views.alias("_v"))
        .filter(F.col("_c").isNotNull() & F.col("_v").isNotNull())
        .select(
            "user_id",
            (F.col("_c").cast("double") / F.lit(100000000.0)).alias("clicks_total"),
            (F.col("_v").cast("double") / F.lit(100000000.0)).alias("views_total"),
            ((F.col("_c") + F.col("_v")).cast("double") / F.lit(100000000.0)).alias(
                "combined"
            ),
        )
    )


# ---------------------------------------------------------------------------
# A9 variant: sum of per-group top-k (`sum by (topic)(topk(3, ...))`,
# reference Kafka_Brokers_Dashboard.json:1046) — agg over a ranking.
# ---------------------------------------------------------------------------
@query(
    "a9b_sum_of_topk",
    """
    WITH s AS (
      SELECT event_type, user_id,
             SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS total
      FROM events GROUP BY 1, 2
    ),
    t AS (
      SELECT event_type, total FROM s
      QUALIFY row_number() OVER (
        PARTITION BY event_type ORDER BY total DESC, user_id ASC) <= 3
    )
    SELECT event_type,
           (CAST(SUM(total) AS DOUBLE) / 100000000.0) AS top3_total
    FROM t GROUP BY event_type
    """,
)
def a9b_sum_of_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sums = ev.groupBy("event_type", "user_id").agg(_lsum("value").alias("total"))
    top = top_k_per_group(sums, ["event_type"], "total", 3, tiebreakers=["user_id"])
    return top.groupBy("event_type").agg(
        (F.sum("total").cast("double") / F.lit(100000000.0)).alias("top3_total")
    )


# ---------------------------------------------------------------------------
# W7: session windows — gap-based sessionization (available free in
# Spark; absent in the reference but part of its window family, §2.5).
# ---------------------------------------------------------------------------
@query(
    "w7_session_window",
    """
    WITH o AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pts
      FROM events
    ),
    m AS (
      SELECT *, CASE WHEN pts IS NULL
                       OR epoch_us(ts) - epoch_us(pts) > 30 * 60 * 1000000
                     THEN 1 ELSE 0 END AS new_session
      FROM o
    ),
    s AS (
      SELECT *, SUM(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS UNBOUNDED PRECEDING) AS session_id
      FROM m
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value
    FROM s GROUP BY user_id, session_id
    """,
)
def w7_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30m) per user.  In streaming mode the same
    expression runs with a watermark; the oracle reproduces the gap
    semantics with island detection (lag + running sum)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), _dsum("value").alias("sum_value"))
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT).alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "w7b_sliding_window",
    """
    WITH x AS (
      SELECT event_type, value,
             time_bucket(INTERVAL '12 hours', ts) AS b
      FROM events
    ),
    w AS (
      SELECT event_type, value, b AS ws FROM x
      UNION ALL
      SELECT event_type, value, b - INTERVAL '12 hours' AS ws FROM x
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value,
           COUNT(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def w7b_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) windows: 1-day width, 12-hour slide — each
    event lands in exactly width/slide = 2 windows.  Spark's window()
    expands the overlap before the aggregate (one explode + one
    shuffle); the oracle replays that expansion as a 2-way UNION ALL of
    12-hour buckets (both engines epoch-align sub-day buckets, DuckDB
    via time_bucket's 2000-01-03 origin, a whole number of days from
    the epoch)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 day", "12 hours").alias("w"), F.col("event_type")
        )
        .agg(_dsum("value").alias("sum_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format("w.start", _TS_FMT).alias("window_start"),
            "event_type",
            "sum_value",
            "n",
        )
    )


@query(
    "w8_frame_specs",
    """
    SELECT user_id, event_id,
           -- DuckDB SUM(BIGINT) widens to HUGEINT (float64 via pandas);
           -- cast back so both engines hash as int64
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS event_seq,
           round(MAX(value) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS max3
    FROM events WHERE event_type = 'purchase'
    """,
)
def w8_frame_specs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame specs beyond the reference's W2-W4 (SURVEY §2.5
    marks them "built-in if needed"): per-series running total, row
    sequence number, and a 3-row trailing max.  One shuffle on the
    series key serves all three frames (same window spec → one Window
    physical node); the event_type filter is pushed to the parquet
    scan.  The running SUM accumulates integers (floored cents) —
    engines disagree on float accumulation order inside sliding
    frames, integer sums are exact in both."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(F.floor(F.col("value") * 100).cast("long"))
        .over(running)
        .alias("running_cents"),
        F.count(F.lit(1)).over(running).alias("event_seq"),
        _r4(F.max("value").over(last3)).alias("max3"),
    )


# ---------------------------------------------------------------------------
# W9: regex label matcher composed with rate+sum — PromQL
# `sum by(type) (rate(x{request=~"Produce|FetchConsumer|FetchFollower"}[5m]))`
# (reference Prometheus/jmxexporter_configs/grafana/dashboards/
# Kafka_Brokers_Dashboard.json:1304).  PromQL `=~` is fully anchored, so
# the match is `^(?:alt1|alt2)$`, not contains.
# ---------------------------------------------------------------------------
@query(
    "w9_regex_label_rate_sum",
    """
    WITH f AS (
      SELECT * FROM events
      WHERE regexp_full_match(event_type, 'click|view|purchase')
    ), d AS (
      SELECT event_type, value, ts,
             lag(value) OVER w AS pv,
             lag(ts)    OVER w AS pts
      FROM f
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    )
    SELECT event_type,
           round(SUM(CAST(
             (CASE WHEN value >= pv THEN value - pv ELSE value END)
             / ((epoch_us(ts) - epoch_us(pts)) / 1000000.0)
             AS DECIMAL(38,18))), 4) AS sum_rate,
           COUNT(*) AS n_samples
    FROM d
    WHERE pts IS NOT NULL AND epoch_us(ts) > epoch_us(pts)
    GROUP BY event_type
    """,
)
def w9_regex_label_rate_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex label filter → per-series rate → sum by label.

    Scale: the rlike filter is a deterministic JVM predicate evaluated
    at the scan (no UDF), pruning the series BEFORE the lag-window
    shuffle — at 100 TB the label filter typically keeps a small
    fraction of series, so filtering pre-shuffle is the whole game.
    One shuffle on the series key, then a reduce-side agg on the label.
    """
    ev = _t(spark, sf_dir, "events")
    matched = ev.filter(F.col("event_type").rlike("^(?:click|view|purchase)$"))
    rated = rate_per_second(
        matched, ["user_id"], "ts", "value", tiebreakers=["event_id"]
    )
    # the rate doubles are bit-identical on both engines, but summing
    # them in different orders drifts by ulps and round(4) flips on
    # boundary rows at larger SFs — cast each rate to DECIMAL(38,18)
    # first (tie-free: rate expansions never terminate at digit 18) so
    # the sum is exact and associative, then round the DECIMAL
    return (
        rated.filter(F.col("rate_per_sec").isNotNull())
        .groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("rate_per_sec").cast("decimal(38,18)")), 4)
            .cast("double")
            .alias("sum_rate"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )


# ---------------------------------------------------------------------------
# W10: non-empty-label filter + topk-of-rate in one composed query —
# PromQL `topk(3, sum by(topic) (rate(x{topic!=""}[5m])))` (reference
# Kafka_Brokers_Dashboard.json:1046 filters `{topic != ""}` before
# ranking).  The label is derived from the props JSON payload with an
# empty band, so the non-empty filter is genuinely selective.
# ---------------------------------------------------------------------------
@query(
    "w10_topk_rate_nonempty",
    """
    WITH lab AS (
      SELECT *, CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
                     THEN '' ELSE 'topic-' ||
                          CAST(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS VARCHAR)
                END AS topic
      FROM events
    ), f AS (
      SELECT * FROM lab WHERE topic <> ''
    ), d AS (
      SELECT topic, value, ts,
             lag(value) OVER w AS pv,
             lag(ts)    OVER w AS pts
      FROM f
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), s AS (
      SELECT topic,
             SUM(CAST((CASE WHEN value >= pv THEN value - pv ELSE value END)
                 / ((epoch_us(ts) - epoch_us(pts)) / 1000000.0)
                 AS DECIMAL(38,18))) AS sum_rate
      FROM d
      WHERE pts IS NOT NULL AND epoch_us(ts) > epoch_us(pts)
      GROUP BY topic
    )
    SELECT topic, CAST(round(sum_rate, 4) AS DOUBLE) AS sum_rate
    FROM s
    QUALIFY row_number() OVER (ORDER BY sum_rate DESC, topic ASC) <= 3
    """,
)
def w10_topk_rate_nonempty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{label != ""} → rate → sum by label → topk(3).

    Scale: label derivation (get_json_object) and the non-empty filter
    are scan-side JVM expressions; the only shuffles are the series-key
    window and the small label agg.  topk over an already-aggregated
    label table is a TakeOrderedAndProject — no extra shuffle.  The
    single-partition ranking window is safe because its input is the
    label-cardinality aggregate, not the fact table.
    """
    ev = _t(spark, sf_dir, "events")
    k = F.expr("try_cast(get_json_object(props, '$.k') as bigint)")
    lab = ev.withColumn(
        "topic",
        F.when(F.pmod(k, F.lit(7)) == 0, F.lit("")).otherwise(
            F.concat(F.lit("topic-"), F.pmod(k, F.lit(7)).cast("string"))
        ),
    )
    f = lab.filter(F.col("topic") != "")
    rated = rate_per_second(f, ["user_id"], "ts", "value", tiebreakers=["event_id"])
    # decimal-exact rate sum (see w9): keeps both the VALUE and the
    # topk RANKING deterministic across summation orders
    sums = (
        rated.filter(F.col("rate_per_sec").isNotNull())
        .groupBy("topic")
        .agg(F.sum(F.col("rate_per_sec").cast("decimal(38,18)")).alias("sum_rate"))
    )
    top = top_k_per_group(sums, [], "sum_rate", 3, tiebreakers=["topic"])
    return top.select(
        "topic", F.round("sum_rate", 4).cast("double").alias("sum_rate")
    )


# ---------------------------------------------------------------------------
# P1-P5 end-to-end: the normalizer itself under oracle check — Jolokia
# envelopes are synthesized from `part` rows, pushed through
# normalize_scrapes, and the oracle states what normalization must
# produce, computed independently from the base columns.
# ---------------------------------------------------------------------------
@query(
    "p2_normalize_pipeline",
    """
    SELECT 'kafka.server:type=' || p_brand || ',name=' || replace(p_type, ' ', '')
             AS mbean_name,
           'kafka.server' AS bean_domain,
           'KafkaBroker' AS server_type,
           'h' || CAST(p_partkey % 5 AS VARCHAR) || ':8778' AS host_name,
           p_brand AS prop_type,
           replace(p_type, ' ', '') AS prop_name,
           CAST(p_size AS DOUBLE) AS count_value,
           round(p_retailprice, 4) AS retail_value
    FROM part
    WHERE p_partkey % 97 <> 0
    """,
)
def p2_normalize_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build RAW_SCRAPE_SCHEMA envelopes (exact-read shape, one per
    part row; every 97th marked HTTP-500 to exercise the P4 drop),
    normalize, project the pivoted fields."""
    from kafka_metrics_exporter_spark.operators.normalize import normalize_scrapes

    p = _t(spark, sf_dir, "part")
    mbean = F.concat(
        F.lit("kafka.server:type="),
        F.col("p_brand"),
        F.lit(",name="),
        F.regexp_replace("p_type", " ", ""),
    )
    body = F.to_json(
        F.struct(
            F.struct(mbean.alias("mbean"), F.lit("read").alias("type")).alias(
                "request"
            ),
            F.lit(200).alias("status"),
            F.struct(
                F.col("p_size").alias("Count"),
                F.col("p_retailprice").alias("Retail"),
            ).alias("value"),
        )
    )
    raw = p.select(
        F.concat(
            F.lit("http://h"),
            (F.col("p_partkey") % 5).cast("string"),
            F.lit(":8778/jolokia/read/"),
            mbean,
        ).alias("target_url"),
        F.lit("KafkaBroker").alias("server_type"),
        F.lit(1700000000000).cast("long").alias("execution_ts"),
        F.when(F.col("p_partkey") % 97 == 0, 500).otherwise(200).alias("http_status"),
        body.alias("body"),
    )
    m = normalize_scrapes(raw)
    return m.select(
        "mbean_name",
        "bean_domain",
        "server_type",
        "host_name",
        F.col("bean_props").getItem("type").alias("prop_type"),
        F.col("bean_props").getItem("name").alias("prop_name"),
        F.col("num_attributes").getItem("Count").alias("count_value"),
        _r4(F.col("num_attributes").getItem("Retail")).alias("retail_value"),
    )


# ---------------------------------------------------------------------------
# J1: cross join — servers × mbean-patterns catalog build
# (reference Code/main.py:197-202, itertools.product).
# ---------------------------------------------------------------------------
@query(
    "j1_cross_join",
    """
    SELECT r.r_name AS server_group, b.p_brand AS pattern
    FROM region r CROSS JOIN (SELECT DISTINCT p_brand FROM part) b
    """,
)
def j1_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both sides are catalog-small; Spark plans BroadcastNestedLoopJoin.
    This op only ever runs on config-sized inputs (scrape catalog)."""
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("server_group"))
    b = _t(spark, sf_dir, "part").select(F.col("p_brand").alias("pattern")).distinct()
    return r.crossJoin(b)


# ---------------------------------------------------------------------------
# J2: broadcast lookup join — URL → server_type catalog lookup
# (reference Code/JMXScraper.py:50-52).
# ---------------------------------------------------------------------------
@query(
    "j2_broadcast_lookup",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_orders,
           (CAST(SUM(CAST(floor(o.o_totalprice * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j2_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × small dim: explicit broadcast() removes the fact-side
    shuffle — at 100 TB the orders scan streams map-side through the
    hash join, and only the 5-row agg shuffles."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _dsum("o_totalprice").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J3/O2: union-by-name merge of heterogeneous source lists
# (reference Code/main.py:48-63; CLI ∪ K8s-discovered).
# ---------------------------------------------------------------------------
@query(
    "j3_union_byname",
    """
    SELECT src, key_id, COUNT(*) AS n FROM (
      SELECT 'orders' AS src, o_custkey AS key_id, o_orderpriority AS extra
      FROM orders
      UNION ALL
      SELECT 'customer' AS src, c_custkey AS key_id, NULL AS extra
      FROM customer
    ) GROUP BY src, key_id
    """,
)
def j3_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName(allowMissingColumns=True) reproduces the reference's
    merge of lists with differing fields; missing columns null-fill."""
    o = _t(spark, sf_dir, "orders").select(
        F.lit("orders").alias("src"),
        F.col("o_custkey").alias("key_id"),
        F.col("o_orderpriority").alias("extra"),
    )
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("src"), F.col("c_custkey").alias("key_id")
    )
    u = o.unionByName(c, allowMissingColumns=True)
    return u.groupBy("src", "key_id").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# J5: explode with parent columns (Connect task fan-out,
# reference Code/ConnectRESTMetrics.py:130-139).
# ---------------------------------------------------------------------------
@query(
    "j5_explode_parent_child",
    """
    SELECT word, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    """,
)
def j5_explode_parent_child(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode() keeps parent columns (doc_id) exactly like the
    reference's task-row denormalization keeps connector fields."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    ).filter(F.col("word") != "")
    return words.groupBy("word").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# O1: distinct / dedup of the scrape catalog
# (reference Code/JMXScraper.py:41,64-67).
# ---------------------------------------------------------------------------
@query(
    "o1_distinct",
    """
    SELECT DISTINCT event_type, user_id FROM events
    """,
)
def o1_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_type", "user_id").distinct()


# ---------------------------------------------------------------------------
# O3: set difference / anti join — "discovered types not in known set"
# (reference Code/main.py:65-69).
# ---------------------------------------------------------------------------
@query(
    "o3_anti_join",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
    """,
)
def o3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no recent orders — left_anti with the filter pushed
    into the right-side scan; at scale AQE flips build sides if the
    filtered side stays small."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# O4: sort + limit (Kibana "Top 50 Topics" terms size,
# reference ELK/jmx_dashboard.json:410).
# ---------------------------------------------------------------------------
@query(
    "o4_sort_limit",
    """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def o4_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_custkey", _r4(F.col("o_totalprice")).alias("o_totalprice"))
    )


# ---------------------------------------------------------------------------
# O5: intersect — absent in the reference (SURVEY §2.6), provided for
# set-op completeness: customers active in BOTH halves of the window.
# ---------------------------------------------------------------------------
@query(
    "o5_intersect",
    """
    SELECT o_custkey FROM orders
    WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def o5_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    cut = F.lit("1997-01-01").cast("timestamp")
    early = o.filter(F.col("o_orderdate") < cut).select("o_custkey")
    late = o.filter(F.col("o_orderdate") >= cut).select("o_custkey")
    return early.intersect(late)


# ---------------------------------------------------------------------------
# P1 (oracle form): ObjectName pivot on constructed mbean strings —
# the same split/extract the normalizer does, checkable in SQL
# (reference Code/JMXScraper.py:99-106).
# ---------------------------------------------------------------------------
@query(
    "p1_objectname_pivot",
    """
    WITH m AS (
      SELECT p_partkey,
             'kafka.server:type=' || p_brand || ',name=' ||
             replace(p_type, ' ', '') || ',part=' || CAST(p_partkey AS VARCHAR)
             AS mbean
      FROM part
    )
    SELECT p_partkey, mbean,
           string_split(mbean, ':')[1] AS bean_domain,
           regexp_extract(mbean, 'type=([^,]+)', 1) AS bean_type,
           regexp_extract(mbean, 'name=([^,]+)', 1) AS bean_name
    FROM m
    """,
)
def p1_objectname_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    m = p.select(
        "p_partkey",
        F.concat(
            F.lit("kafka.server:type="),
            F.col("p_brand"),
            F.lit(",name="),
            F.regexp_replace("p_type", " ", ""),
            F.lit(",part="),
            F.col("p_partkey").cast("string"),
        ).alias("mbean"),
    )
    props = F.str_to_map(
        F.substring_index("mbean", ":", -1), F.lit(","), F.lit("=")
    )
    return m.select(
        "p_partkey",
        "mbean",
        F.substring_index("mbean", ":", 1).alias("bean_domain"),
        props.getItem("type").alias("bean_type"),
        props.getItem("name").alias("bean_name"),
    )


# ---------------------------------------------------------------------------
# §2.7 rule-driven rewriting: the ordered first-match-wins rule compiler
# applied to synthesized MBean match strings (rule semantics from the
# reference's Prometheus/jmxexporter_configs/configs/kafka.yml).
# ---------------------------------------------------------------------------
_RULES_PERSEC = r"kafka.(\w+)<type=(.+), name=(.+)PerSec\w*><>Count"
_RULES_PCTL = r"kafka.(\w+)<type=(.+), name=(.+), (.+)=(.*)><>(\d+)thPercentile"
_RULES_VALUE = r"kafka.(\w+)<type=(.+), name=(.+)><>Value"


@query(
    "rules_rewrite",
    f"""
    WITH m AS (
      SELECT p_partkey, p_size,
        CASE CAST(p_partkey % 3 AS INT)
          WHEN 0 THEN 'kafka.server<type=' || p_brand || ', name=' ||
                      replace(p_type, ' ', '') || 'PerSec><>Count: ' ||
                      CAST(p_size AS VARCHAR)
          WHEN 1 THEN 'kafka.server<type=' || p_brand || ', name=' ||
                      replace(p_type, ' ', '') || '><>Value: ' ||
                      CAST(p_size AS VARCHAR)
          ELSE 'kafka.network<type=' || p_brand || ', name=' ||
               replace(p_type, ' ', '') || ', request=Fetch><>99thPercentile: ' ||
               CAST(p_size AS VARCHAR)
        END AS ms
      FROM part
    )
    SELECT p_partkey,
      CASE
        WHEN regexp_matches(ms, '^(?:{_RULES_PERSEC})')
        THEN lower(regexp_replace('kafka_brokers_' || regexp_extract(ms, '^(?:{_RULES_PERSEC})', 1)
             || '_' || regexp_extract(ms, '^(?:{_RULES_PERSEC})', 2)
             || '_' || regexp_extract(ms, '^(?:{_RULES_PERSEC})', 3) || '_total', '[^a-zA-Z0-9_]', '_', 'g'))
        WHEN regexp_matches(ms, '^(?:{_RULES_PCTL})')
        THEN lower(regexp_replace('kafka_brokers_' || regexp_extract(ms, '^(?:{_RULES_PCTL})', 1)
             || '_' || regexp_extract(ms, '^(?:{_RULES_PCTL})', 2)
             || '_' || regexp_extract(ms, '^(?:{_RULES_PCTL})', 3), '[^a-zA-Z0-9_]', '_', 'g'))
        WHEN regexp_matches(ms, '^(?:{_RULES_VALUE})')
        THEN lower(regexp_replace('kafka_brokers_' || regexp_extract(ms, '^(?:{_RULES_VALUE})', 1)
             || '_' || regexp_extract(ms, '^(?:{_RULES_VALUE})', 2)
             || '_' || regexp_extract(ms, '^(?:{_RULES_VALUE})', 3), '[^a-zA-Z0-9_]', '_', 'g'))
      END AS metric_name,
      CASE
        WHEN regexp_matches(ms, '^(?:{_RULES_PERSEC})') THEN 'COUNTER'
        ELSE 'GAUGE'
      END AS metric_type,
      CASE
        WHEN regexp_matches(ms, '^(?:{_RULES_PCTL})')
        THEN '0.' || regexp_extract(ms, '^(?:{_RULES_PCTL})', 6)
      END AS quantile,
      round(CAST(p_size AS DOUBLE), 4) AS value
    FROM m
    """,
)
def rules_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-match-wins rule chain compiled to one CaseWhen expression —
    evaluation order survives optimization, everything JVM-side.  At
    scale this is a narrow per-row transform: no shuffle, codegen'd."""
    from kafka_metrics_exporter_spark.rules.compiler import RewriteRule, compile_rules

    rules = [
        RewriteRule(
            pattern=_RULES_PERSEC,
            name_tmpl="kafka_brokers_$1_$2_$3_total",
            metric_type="COUNTER",
        ),
        RewriteRule(
            pattern=_RULES_PCTL,
            name_tmpl="kafka_brokers_$1_$2_$3",
            metric_type="GAUGE",
            labels_tmpl={"$4": "$5", "quantile": "0.$6"},
        ),
        RewriteRule(
            pattern=_RULES_VALUE,
            name_tmpl="kafka_brokers_$1_$2_$3",
            metric_type="GAUGE",
        ),
    ]
    apply_rules = compile_rules(rules, lowercase=True)

    p = _t(spark, sf_dir, "part")
    fam = (F.col("p_partkey") % 3).cast("int")
    clean_type = F.regexp_replace("p_type", " ", "")
    size_s = F.col("p_size").cast("string")
    ms = (
        F.when(
            fam == 0,
            F.concat(
                F.lit("kafka.server<type="), F.col("p_brand"), F.lit(", name="),
                clean_type, F.lit("PerSec><>Count: "), size_s,
            ),
        )
        .when(
            fam == 1,
            F.concat(
                F.lit("kafka.server<type="), F.col("p_brand"), F.lit(", name="),
                clean_type, F.lit("><>Value: "), size_s,
            ),
        )
        .otherwise(
            F.concat(
                F.lit("kafka.network<type="), F.col("p_brand"), F.lit(", name="),
                clean_type, F.lit(", request=Fetch><>99thPercentile: "), size_s,
            )
        )
    )
    out = p.select(
        "p_partkey",
        apply_rules(ms, F.col("p_size").cast("double")).alias("_rw"),
    )
    return out.select(
        "p_partkey",
        F.col("_rw.metric_name").alias("metric_name"),
        F.col("_rw.metric_type").alias("metric_type"),
        F.element_at("_rw.labels", "quantile").alias("quantile"),
        _r4(F.col("_rw.value")).alias("value"),
    )


# ---------------------------------------------------------------------------
# §2.8 scalar-function pack: string/json/date/math in one projection
# (reference Code/JMXScraper.py:100-126, Code/main.py:189-217).
# ---------------------------------------------------------------------------
@query(
    "p_scalar_pack",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
           strftime(ts, '%Y-%m-%d') AS event_date,
           upper(event_type) AS event_type_u,
           event_type || '@' || CAST(user_id AS VARCHAR) AS series_key,
           round(value * 0.001, 6) AS value_scaled,
           CASE WHEN regexp_matches(event_type, '^(click|view)$')
                THEN 1 ELSE 0 END AS is_impression
    FROM events
    """,
)
def p_scalar_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.upper("event_type").alias("event_type_u"),
        F.concat_ws("@", "event_type", F.col("user_id").cast("string")).alias(
            "series_key"
        ),
        # valueFactor scaling (reference connect.yml:6-12); ×0.001 keeps
        # the product off exact round-half boundaries (unlike /1024,
        # which is exact in binary and trips HALF_UP-vs-half-even
        # divergence between Spark and DuckDB)
        F.round(F.col("value") * 0.001, 6).alias("value_scaled"),
        F.when(F.col("event_type").rlike("^(click|view)$"), 1)
        .otherwise(0)
        .alias("is_impression"),
    )


# ---------------------------------------------------------------------------
# J6/J7: temporal joins (beyond reference — SURVEY §2.3 lists as-of /
# range joins as absent there; a metrics store needs both to align
# samples with state-change events).  Operators in operators/temporal.py.
# ---------------------------------------------------------------------------
@query(
    "j6_asof_join",
    """
    WITH r AS (
      SELECT user_id, ts AS pts,
             max(event_id) AS ref_event_id,
             round(arg_max(value, event_id), 4) AS ref_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view')
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           r.ref_event_id, r.ref_value,
           round(epoch(l.ts) - epoch(r.pts), 4) AS asof_lag_sec
    FROM l ASOF LEFT JOIN r
      ON l.user_id = r.user_id AND l.ts >= r.pts
    """,
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every 'view' event gains the latest
    'purchase' of the same user at-or-before it (the align-sample-to-
    last-deploy/config-change pattern).

    Scale: union–carry-forward (operators/temporal.py) — ONE shuffle of
    |L|+|R| rows on user_id, no range explode, no per-key collect; the
    right side is pre-aggregated to one row per (user_id, ts) so ties
    are deterministic on both engines."""
    from kafka_metrics_exporter_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    right = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.col("ts").alias("pts"))
        .agg(
            F.max("event_id").alias("ref_event_id"),
            _r4(F.max_by("value", "event_id")).alias("ref_value"),
        )
    )
    joined = asof_join(
        left,
        right,
        on=["user_id"],
        left_ts="ts",
        right_ts="pts",
        right_cols=["ref_event_id", "ref_value"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "ref_event_id",
        "ref_value",
        _r4(F.col("ts").cast("double") - F.col("asof_ts").cast("double")).alias(
            "asof_lag_sec"
        ),
    )


@query(
    "j7_range_join",
    """
    WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    r AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'),
    agg AS (
      SELECT l.event_id,
             count(r.event_id) AS n_follow,
             (CAST(coalesce(SUM(CAST(floor(r.value * 100000000.0 + 0.5) AS BIGINT)), 0) AS DOUBLE) / 100000000.0)
               AS sum_follow
      FROM l LEFT JOIN r
        ON r.user_id = l.user_id
       AND r.ts >= l.ts AND r.ts < l.ts + INTERVAL 1 HOUR
      GROUP BY l.event_id
    )
    SELECT l.event_id, l.user_id,
           strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           agg.n_follow, agg.sum_follow
    FROM l JOIN agg USING (event_id)
    """,
)
def j7_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: for each 'purchase', count/sum the same user's
    'click' events in the following hour.

    Scale: bucketed equi-join (operators/temporal.py) — left rows
    expand to exactly 2 candidate (user, hour-bucket) keys, so the join
    is a shuffled hash join on (user_id, bucket), never the
    BroadcastNestedLoopJoin a raw theta predicate plans as; DuckDB's
    IEJoin oracle checks the identical semantics."""
    from kafka_metrics_exporter_spark.operators.temporal import range_join_bucketed

    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    right = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    matched = range_join_bucketed(
        left, right, on=["user_id"], left_ts="ts", right_ts="ts", window_seconds=3600
    )
    agg = matched.groupBy("event_id").agg(
        F.count("r_event_id").alias("n_follow"),
        F.coalesce(_dsum("r_value"), F.lit(0.0)).alias("sum_follow"),
    )
    return (
        left.join(agg, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", _TS_FMT).alias("ts_s"),
            F.coalesce("n_follow", F.lit(0)).alias("n_follow"),
            F.coalesce("sum_follow", F.lit(0.0)).alias("sum_follow"),
        )
    )


# ---------------------------------------------------------------------------
# A12: rollup with grouping id — the multi-level drill-down the Kibana
# dashboards express as nested terms buckets plus a dashboard-level
# total (reference ELK/jmx_dashboard.json:130,186 drill-downs).
# ---------------------------------------------------------------------------
@query(
    "a12_rollup",
    """
    SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
           coalesce(l_linestatus, 'ALL') AS linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS grp_id,
           (CAST(SUM(CAST(floor(l_quantity * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals in one pass: rollup computes (flag, status),
    (flag), and grand-total rows in a single partial-agg-friendly plan
    instead of three scans + union.  grouping_id disambiguates real
    nulls from rollup nulls (both engines put the first rollup column
    in the most significant bit)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("grp_id"),
            _dsum("l_quantity").alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "grp_id",
            "sum_qty",
            "n",
        )
    )


# ---------------------------------------------------------------------------
# O6: semi join — "keep rows with a match, never duplicate" (the
# complement of O3's anti join; reference Code/main.py:65-69 set logic).
# ---------------------------------------------------------------------------
@query(
    "o6_semi_join",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderpriority = '1-URGENT')
    """,
)
def o6_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with ≥1 urgent order.  left_semi short-circuits on the
    first probe hit and never multiplies rows — at scale the filtered
    orders side stays the build side (AQE), and the priority filter is
    pushed to the parquet scan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# W11: hypertable-style rollup cascade (beyond reference) — continuous-
# aggregate downsampling: raw → 1-minute partials → 1-hour rollup,
# where each level RE-AGGREGATES the previous level's partials
# (sum-of-sums, min-of-mins, count-of-counts; avg derived at read time
# as sum/count).  This is how a metrics store keeps years of history
# queryable: the raw tier ages out, the coarse tiers stay cheap.
# ---------------------------------------------------------------------------
@query(
    "w11_rollup_cascade",
    """
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) AS sum_value,
           COUNT(*)   AS n,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           (CAST(SUM(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100000000.0) / COUNT(*) AS avg_value
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def w11_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hourly level of the cascade, computed FROM the minute-level
    partials — the oracle aggregates raw directly, so the hash match
    proves re-aggregation is lossless.

    Scale: the minute tier shuffles raw once on (key, minute); the hour
    tier shuffles only minute partials (~1/60th the rows).  avg is NOT
    carried as a partial (not re-aggregable) — it is derived sum/count
    at the final level, the invariant that makes cascades correct."""
    ev = _t(spark, sf_dir, "events")
    # exact integral partials (_lsum): integer addition is EXACT and
    # associative, so the cascade's sum-of-sums equals a direct sum
    # bit-for-bit — with double partials the two summation orders
    # differ by an ulp and round(4) flips on boundary rows (observed:
    # 57.1488 vs 57.1487)
    minute = ev.groupBy(
        "event_type", F.date_trunc("minute", "ts").alias("minute_ts")
    ).agg(
        _lsum("value").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    hour = minute.groupBy(
        "event_type", F.date_trunc("hour", "minute_ts").alias("hour_ts")
    ).agg(
        F.sum("s").alias("s"),
        F.sum("n").alias("n"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
    # every double here is BIT-IDENTICAL across engines (exact decimal
    # sums, min/max of the same set, one division of identical
    # operands) — so emit them UNROUNDED: an in-engine round(4) is two
    # different rounding implementations (Spark rounds the shortest
    # decimal repr half-up; DuckDB rounds a scaled multiply) and they
    # disagree on exact halves like 65.99125 — the comparison layer
    # rounds both sides once with a single rule instead
    return hour.select(
        "event_type",
        F.date_format("hour_ts", _TS_FMT).alias("hour_s"),
        (F.col("s").cast("double") / F.lit(100000000.0)).alias("sum_value"),
        F.col("n"),
        F.col("mn").alias("min_value"),
        F.col("mx").alias("max_value"),
        ((F.col("s").cast("double") / F.lit(100000000.0)) / F.col("n")).alias(
            "avg_value"
        ),
    )


# ---------------------------------------------------------------------------
# W12: the STREAMING cascade's own chained-window shape (VERDICT r7
# item 7) — w11 above proves hour-from-minute re-aggregation with
# date_trunc keys; this row drives streaming/pipeline.py's
# cascade_rollup FUNCTION itself (F.window → F.window_time → F.window,
# Spark's chained-window support) in batch mode, so the exact operator
# the streaming tier runs gets a driver-verified differential row, not
# just a pytest pin.
# ---------------------------------------------------------------------------
@query(
    "w12_window_time_cascade",
    """
    WITH scaled AS (
      SELECT event_type, ts,
             CAST(CAST(floor(value * 100000000.0 + 0.5) AS BIGINT) AS DOUBLE)
               AS sv
      FROM events
    )
    SELECT event_type,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
           SUM(sv) / 100000000.0 AS sum_value,
           COUNT(*) AS n,
           MIN(sv) / 100000000.0 AS min_value,
           MAX(sv) / 100000000.0 AS max_value,
           (SUM(sv) / COUNT(*)) / 100000000.0 AS avg_value
    FROM scaled
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def w12_window_time_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cascade_rollup`` (streaming/pipeline.py) applied to the events
    table as a batch frame (``withWatermark`` is a no-op on batch):
    raw → 1-minute ``F.window`` partials → 1-hour window OVER
    ``F.window_time`` of the fine tier — the chained-window plan the
    streaming hypertable cascade executes, where the coarse state
    holds only fine partials (1/60th the rows).  The oracle aggregates
    raw directly per hour, so the hash match proves the chained
    windows land every sample in the same hour bucket AND that the
    re-aggregation (sum-of-sums, min-of-mins, derived avg) is
    lossless.

    Exactness: values are pre-scaled to integral doubles (exact,
    associative addition below 2^53 — per-group sums reach ~1e13 at
    sf0.1), and the oracle mirrors the avg's division order
    ``(s / n) / scale`` so every double is bit-identical."""
    from kafka_metrics_exporter_spark.streaming.pipeline import cascade_rollup

    ev = _t(spark, sf_dir, "events").select(
        "ts",
        F.col("event_type").alias("series"),
        F.floor(F.col("value") * 100000000.0 + F.lit(0.5))
        .cast("double")
        .alias("value"),
    )
    _, coarse = cascade_rollup(ev)
    return coarse.select(
        F.col("series").alias("event_type"),
        F.date_format("window_start", _TS_FMT).alias("hour_s"),
        (F.col("s") / F.lit(100000000.0)).alias("sum_value"),
        F.col("n"),
        (F.col("mn") / F.lit(100000000.0)).alias("min_value"),
        (F.col("mx") / F.lit(100000000.0)).alias("max_value"),
        ((F.col("s") / F.col("n")) / F.lit(100000000.0)).alias("avg_value"),
    )


# ---------------------------------------------------------------------------
# O7: multiset set-ops — EXCEPT ALL / INTERSECT ALL keep duplicate
# cardinality (O3/O5's distinct forms collapse it), the form catalog
# reconciliation needs when multiplicity matters.
# ---------------------------------------------------------------------------
@query(
    "o7_except_all",
    """
    SELECT o_custkey, o_orderpriority FROM orders
    EXCEPT ALL
    SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
)
def o7_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: a customer with three open urgent orders
    and one filled keeps two copies — exceptAll preserves multiplicity
    via a counted hash-agg under the hood (one shuffle), where a
    distinct EXCEPT would collapse to one row."""
    o = _t(spark, sf_dir, "orders")
    left = o.select("o_custkey", "o_orderpriority")
    right = o.filter(F.col("o_orderstatus") == "F").select(
        "o_custkey", "o_orderpriority"
    )
    return left.exceptAll(right)


# ---------------------------------------------------------------------------
# Round 10: driver-verifiable streaming (W5/W6 registry form)
# ---------------------------------------------------------------------------
@query(
    "streaming_state_replay",
    """
    WITH e AS (
      SELECT event_type, ts, CAST(floor(value) AS BIGINT) AS value_i
      FROM events
    ),
    wm AS (
      SELECT (epoch_us(MAX(ts)) // 1000 - 3600000) * 1000 AS wm_us FROM e
    ),
    w AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
               AS ws,
             COUNT(*) AS n,
             CAST(SUM(value_i) AS BIGINT) AS total
      FROM e GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start_s,
           n, total
    FROM w, wm
    WHERE epoch_us(ws) + 86400000000 <= wm.wm_us
    """,
)
def streaming_state_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming surface, driver-verified (VERDICT r9 item 7): a
    REAL Structured Streaming run of the W1 tumbling-window rollup —
    three time-ordered micro-batches over the events table, event-time
    watermark (1 h), append-mode finalization, state eviction — whose
    sink output is returned as the result
    (streaming/pipeline.py replay_windowed_rollup).

    The twin is the batch equivalence that makes streaming checkable:
    with time-ordered batches nothing is late, so the emitted set is
    exactly the day windows whose end ≤ final watermark = max event
    time (ms-truncated, Spark's watermark precision) − 1 h — a plain
    aggregate + filter in SQL, independent of micro-batch slicing.
    Counts and integral value sums are exact in both engines.

    Scale: the replayed plan IS the production streaming plan —
    watermark-bounded per-(key, window) state, map-side partial
    aggregation per micro-batch, append emission; only the
    file-split scaffolding is harness."""
    from kafka_metrics_exporter_spark.streaming.pipeline import (
        replay_windowed_rollup,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor("value").cast("long").alias("value_i"),
    )
    out = replay_windowed_rollup(spark, ev)
    return out.select(
        "event_type",
        F.date_format("window_start", _TS_FMT).alias("window_start_s"),
        "n",
        "total",
    )


@query(
    "streaming_session_replay",
    """
    WITH e AS (
      SELECT CAST(user_id % 25 AS BIGINT) AS skey, ts,
             CAST(floor(value) AS BIGINT) AS value_i
      FROM events
    ),
    wm AS (
      SELECT (epoch_us(MAX(ts)) // 1000 - 3600000) * 1000 AS wm_us FROM e
    ),
    d AS (
      SELECT skey, ts, value_i,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
                  THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY skey ORDER BY ts)
    ),
    i AS (
      SELECT skey, ts, value_i,
             SUM(brk) OVER (PARTITION BY skey ORDER BY ts) AS isl
      FROM d
    ),
    s AS (
      SELECT skey, MIN(ts) AS session_start, MAX(ts) AS last_ev,
             COUNT(*) AS n, CAST(SUM(value_i) AS BIGINT) AS total
      FROM i GROUP BY skey, isl
    )
    SELECT skey,
           strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start_s,
           strftime(last_ev + INTERVAL 2 HOUR,
                    '%Y-%m-%d %H:%M:%S') AS session_end_s,
           n, total
    FROM s, wm
    WHERE epoch_us(last_ev) + 7200000000 <= wm.wm_us
    """,
)
def streaming_session_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION windows through the real streaming engine (the W7
    streaming form, driver-verified like streaming_state_replay):
    per 25-way user cohort, events closer than 2 h merge into one
    session; the replay runs three time-ordered micro-batches, so
    Spark's session-MERGING state (unlike tumbling windows, sessions
    grown in different micro-batches must coalesce) executes for real,
    and append mode emits each session when the watermark passes its
    end (last event + 2 h — Spark merges at exactly gap distance,
    boundary pinned in the harness tests).

    Twin: batch gaps-and-islands sessionization (break when the
    successive gap EXCEEDS 2 h) filtered to sessions whose end ≤ max
    event time (ms) − 1 h — the same slicing-independence argument as
    the tumbling replay.  Counts and integral sums exact."""
    from kafka_metrics_exporter_spark.streaming.pipeline import (
        replay_session_rollup,
    )

    ev = _t(spark, sf_dir, "events").select(
        (F.col("user_id") % 25).cast("long").alias("skey"),
        "ts",
        F.floor("value").cast("long").alias("value_i"),
    )
    out = replay_session_rollup(spark, ev, gap="2 hours", delay="1 hour")
    return out.select(
        "skey",
        F.date_format("session_start", _TS_FMT).alias("session_start_s"),
        F.date_format("session_end", _TS_FMT).alias("session_end_s"),
        "n",
        "total",
    )


# ---------------------------------------------------------------------------
# Round 11: driver-verifiable streaming alerting (the alert_rules form)
# ---------------------------------------------------------------------------
@query(
    "streaming_alerts_replay",
    """
    WITH g AS (
      -- daily latest-value gauge per event_type (argmax by ts, value)
      SELECT event_type AS etype,
             max(struct_pack(us := epoch_us(ts), v := value, t := ts)) AS p
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    m AS (
      SELECT etype, p.t AS ts, p.v AS value,
             epoch_us(p.t) / 1000000.0 AS td
      FROM g
    ),
    b AS (SELECT MIN(td) AS lo, MAX(td) AS hi FROM m),
    -- the replay harness' slice id: a pure function of event time
    s AS (
      SELECT etype, ts, value,
             CAST(least(floor((td - lo)
               / (CASE WHEN hi > lo THEN hi - lo ELSE 1.0 END) * 4), 3)
               AS INT) AS batch_id
      FROM m, b
    ),
    -- one CYCLE per NON-EMPTY slice: the replay harness writes no file
    -- for an empty slice, so foreachBatch renumbers batches densely —
    -- cycle ids are the dense rank of the present slices, and the
    -- state machine's "consecutive" means consecutive CYCLES (an
    -- engine cycle never sees an empty frame; code-review r11)
    cyc AS (
      SELECT batch_id, MAX(epoch_us(ts)) AS hw_us,
             CAST(row_number() OVER (ORDER BY batch_id) - 1 AS INT)
               AS cycle_id
      FROM s GROUP BY batch_id
    ),
    snap AS (
      -- per cycle: newest PASSING sample per series
      SELECT c.cycle_id AS batch_id, etype,
             max(struct_pack(us := epoch_us(ts), v := value)) AS p
      FROM s JOIN cyc c USING (batch_id)
      WHERE value > 60.0 GROUP BY 1, 2
    ),
    hw AS (SELECT cycle_id AS batch_id, hw_us FROM cyc),
    runs AS (
      -- consecutive-presence islands: a series absent from a cycle
      -- drops from state, so active_since restarts with the next run
      SELECT batch_id, etype, p,
             SUM(CASE WHEN prev_b IS NULL OR prev_b < batch_id - 1
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY etype ORDER BY batch_id) AS isl
      FROM (SELECT batch_id, etype, p,
                   lag(batch_id) OVER (PARTITION BY etype
                                       ORDER BY batch_id) AS prev_b
            FROM snap)
    ),
    isl2 AS (
      SELECT batch_id, etype, p,
             MIN(batch_id) OVER (PARTITION BY etype, isl) AS first_b
      FROM runs
    )
    SELECT i.batch_id, i.etype, 'page' AS severity,
           strftime(make_timestamp(i.p.us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           i.p.v AS value,
           CASE WHEN h.hw_us - h0.hw_us >= 604800000000
                THEN 'firing' ELSE 'pending' END AS alertstate
    FROM isl2 i
    JOIN hw h ON h.batch_id = i.batch_id
    JOIN hw h0 ON h0.batch_id = i.first_b
    """,
)
def streaming_alerts_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus ALERTING through the real streaming engine
    (VERDICT r10 item 6): a daily latest-value gauge per event_type
    streams through four time-ordered micro-batches, each a
    rule-manager evaluation cycle of ``kme_daily_latest > 60`` with
    ``for: 7d`` — the pending→firing state machine carries the
    label-keyed `active_since` across cycles in batch-versioned
    parquet state, a series missing from a cycle resets (Prometheus's
    reset-on-missing-evaluation), and every cycle's emitted alert
    frame lands in the result tagged with its batch id
    (streaming/pipeline.py alert_rules + replay_alert_rules).

    At this data's shape the ~7.5-day cycle spacing makes every run's
    first cycle 'pending' and every continuation 'firing', and the
    threshold leaves gaps, so all three transitions (new-pending,
    pending→firing, firing→reset→pending) occur at the gate SF.

    Twin: unlike the windowed/session replays the emitted set DEPENDS
    on the slicing — a cycle is the evaluation unit, as in Prometheus
    — so the oracle reconstructs the cycles from the harness' slice
    function (a pure function of event time, bit-identical IEEE
    arithmetic in both engines), then replays the state machine as
    gaps-and-islands over consecutive-cycle presence runs anchored at
    each cycle's event-time high-water mark.

    Scale: the replayed plan IS the production alerting plan —
    per-cycle instant evaluation over the batch, a broadcast state
    join (one row per ACTIVE series, never per sample), idempotent
    batch-versioned state rewrites; only the file-split scaffolding is
    harness."""
    from kafka_metrics_exporter_spark.streaming.pipeline import (
        replay_alert_rules,
    )

    ev = _t(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("__d"))
        .agg(
            F.max(
                F.struct(
                    F.unix_micros(F.col("ts")).alias("us"),
                    F.col("value").alias("v"),
                )
            ).alias("p")
        )
        .select(
            F.lit("kme_daily_latest").alias("name"),
            F.col("event_type").alias("etype"),
            F.timestamp_micros(F.col("p.us")).alias("ts"),
            F.col("p.v").alias("value"),
        )
    )
    rules = """
groups:
- name: replay
  rules:
  - alert: HighDailyLatest
    expr: kme_daily_latest > 60
    for: 7d
    labels:
      severity: page
"""
    out = replay_alert_rules(spark, daily, rules, n_batches=4)
    if out is None:  # not assert: must survive python -O (review r11)
        raise RuntimeError("streaming_alerts_replay: no cycle emitted")
    return out.select(
        "batch_id",
        "etype",
        "severity",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
        "alertstate",
    )
