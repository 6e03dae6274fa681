"""Oracle-checked queries driven through the Kibana front end
(kibana/): the reference's ELK dashboard aggregations
(ELK/jmx_dashboard.json:88-452, 27 saved visualizations) are compiled
from their native visState JSON to DataFrame plans and evaluated
against an ES-document view of the events table, with DuckDB twins
re-implementing the same agg semantics by hand — the ES-side mirror of
plans/promql_queries.py.

Determinism: the summed/averaged metric field is ``value_i =
floor(value)`` — integer-valued doubles sum exactly in both engines
regardless of summation order, so avg/sum metrics are bit-identical
(the same count-derived trick as the promql metrics view; raw ``value``
stays available for max, which is order-independent anyway).
top_hits ties on the sort field are broken by ``event_id`` (the
compiler's ``tiebreak=`` hook — ES leaves them unresolved; SURVEY §7.3
total-order rule).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.functions.stats import (
    sql_ks_two_sided_p as _SQL_KS_TWO,
    sql_t_pvalue_ctes,
)
from kafka_metrics_exporter_spark.kibana import compile_visualization
from kafka_metrics_exporter_spark.plans.queries import _TS_FMT, _t, query


def _es_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as the flattened ES documents the reference's sink writes
    (one doc per sample: keyword fields, numeric attrs, createdDateTime)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_type",
        F.col("user_id").cast("string").alias("user_id"),
        F.floor("value").alias("value_i"),
        "value",
        "ts",
        "event_id",
    )


_ES_DOCS_SQL = """
      SELECT event_type, CAST(user_id AS VARCHAR) AS user_id,
             floor(value) AS value_i, value, ts, event_id
      FROM events
"""


def _vis(aggs: list[dict], vis_type: str = "table") -> dict:
    return {"visState": json.dumps({"title": "t", "type": vis_type, "aggs": aggs})}


# ES/Kibana auto-interval ladder as a SQL CASE: the smallest "nice"
# interval that fits the span into at most 50 buckets — the oracle
# twin of auto_interval_us(span, 50).  Imported from the compiler so
# the oracle can never drift from the engine's ladder.
from kafka_metrics_exporter_spark.kibana.compiler import (  # noqa: E402
    _AUTO_LADDER_US as _LADDER_US,
)

_LADDER_CASE = (
    "CASE "
    + " ".join(f"WHEN sp <= {iv * 50} THEN {iv}" for iv in _LADDER_US[:-1])
    + f" ELSE {_LADDER_US[-1]} END"
)


@query(
    "kibana_terms_metrics",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    agg AS (
      SELECT event_type,
             SUM(value_i) AS total_v,
             AVG(value_i) AS avg_v,
             MAX(value)   AS max_v,
             COUNT(DISTINCT user_id) AS users
      FROM d GROUP BY event_type
    )
    SELECT event_type, total_v, avg_v, max_v, users
    FROM agg
    QUALIFY row_number() OVER (ORDER BY total_v DESC, event_type ASC) <= 3
    """,
)
def kibana_terms_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terms bucket ordered by a metric + the full simple-metric family
    — the "Connect - Overall Status" / "Busy Topics" shape
    (ELK/jmx_dashboard.json: terms orderBy=metric-id, avg/sum/max/
    cardinality metrics), compiled from the visState JSON."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "2", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type.keyword", "size": 3,
                             "order": "desc", "orderBy": "1",
                             "customLabel": "event_type"}},
                {"id": "1", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total_v"}},
                {"id": "3", "type": "avg", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "avg_v"}},
                {"id": "4", "type": "max", "schema": "metric",
                 "params": {"field": "value", "customLabel": "max_v"}},
                {"id": "5", "type": "cardinality", "schema": "metric",
                 "params": {"field": "user_id.keyword", "customLabel": "users"}},
            ]
        )
    )
    return plan.evaluate(_es_docs(spark, sf_dir))


@query(
    "kibana_date_histogram",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    span AS (
      SELECT MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS sp FROM d
    ),
    iv AS (SELECT {_LADDER_CASE} AS iv FROM span),
    b AS (
      SELECT make_timestamp((epoch_us(d.ts) // i.iv) * i.iv) AS bucket,
             user_id, value_i
      FROM d, iv i
    ),
    agg AS (
      SELECT bucket, user_id, AVG(value_i) AS avg_v
      FROM b GROUP BY bucket, user_id
    ),
    series AS (
      SELECT 'series' AS branch,
             strftime(bucket, '%Y-%m-%d %H:%M:%S') AS when_s,
             user_id AS key, CAST(NULL AS BIGINT) AS n, avg_v AS val
      FROM agg
      QUALIFY row_number() OVER (
        PARTITION BY bucket ORDER BY avg_v DESC, user_id ASC) <= 5
    ),
    -- round 12: min_doc_count branches over a SPARSE subset (hourly
    -- buckets with real gaps at every SF)
    sparse AS (
      SELECT * FROM d WHERE CAST(user_id AS BIGINT) % 97 = 0
    ),
    hb AS (
      SELECT make_timestamp((epoch_us(ts) // 3600000000) * 3600000000)
               AS hb, user_id, value_i
      FROM sparse
    ),
    hagg AS (
      SELECT hb, CAST(COUNT(*) AS BIGINT) AS n, SUM(value_i) AS total
      FROM hb GROUP BY 1
    ),
    bounds AS (
      -- extended_bounds widen the fill span beyond the data (both
      -- endpoints are exact hour multiples): 2023-12-31T12:00Z ..
      -- 2024-01-31T06:00Z
      SELECT LEAST(MIN(epoch_us(hb)), 1704024000000000) AS lo,
             GREATEST(MAX(epoch_us(hb)), 1706680800000000) AS hi
      FROM hagg
    ),
    grid AS (
      SELECT make_timestamp(CAST(unnest(range(lo, hi + 1, 3600000000))
               AS BIGINT)) AS hb
      FROM bounds
    ),
    -- min_doc_count=0: zero-fill between first and last populated key
    -- (count 0, sum 0.0 on empty buckets — ES's empty-bucket values)
    fillb AS (
      SELECT 'fill' AS branch,
             strftime(grid.hb, '%Y-%m-%d %H:%M:%S') AS when_s,
             '' AS key, COALESCE(hagg.n, 0) AS n,
             COALESCE(hagg.total, 0.0) AS val
      FROM grid LEFT JOIN hagg ON grid.hb = hagg.hb
    ),
    -- min_doc_count=2 on the OUTER histogram above a terms series:
    -- the filter is the bucket's OWN-LEVEL count across terms
    hu AS (
      SELECT hb, user_id, CAST(COUNT(*) AS BIGINT) AS n
      FROM hb GROUP BY 1, 2
    ),
    mdc2 AS (
      SELECT 'mdc2' AS branch,
             strftime(hb, '%Y-%m-%d %H:%M:%S') AS when_s,
             user_id AS key, n, CAST(NULL AS DOUBLE) AS val
      FROM (SELECT *, SUM(n) OVER (PARTITION BY hb) AS lvl FROM hu)
      WHERE lvl >= 2
    )
    SELECT * FROM series UNION ALL SELECT * FROM fillb
    UNION ALL SELECT * FROM mdc2
    """,
)
def kibana_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_histogram with ``interval: "auto"`` under the REAL ES
    auto-interval semantics (the round-7 default: the smallest "nice"
    ladder interval fitting the data span into ≤50 buckets — real
    Kibana resolves auto from the time picker and never reads the
    customInterval field the corpus leaves at its 2h default) with a
    nested terms series bucket ordered by the avg metric — the
    "ZooKeeper - Heap Usage" line-chart shape, compiled from visState.
    The oracle derives the interval from the same span with the same
    ladder (one 1-row min/max agg on each side).

    Round 12 adds ES ``min_doc_count`` over a sparse subset whose
    hourly buckets have REAL gaps at every SF: ``fill`` (=0) ZERO-FILLS
    the empty buckets between the first and last populated key — count
    0, sum 0.0, ES's empty-bucket values — via a span/interval-bounded
    grid per parent (bucket-table-sized, never doc-sized); ``mdc2``
    (=2, on the OUTER histogram above a terms series) filters buckets
    by their own-level doc count summed across the inner terms; the
    fill branch also pins ``extended_bounds`` (the ES param a time
    picker uses to force chart-range buckets), widening the grid half
    a day before and six hours past the data span."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "2", "type": "date_histogram", "schema": "segment",
                 "params": {"field": "ts", "interval": "auto",
                             "customInterval": "2h", "min_doc_count": 1,
                             "customLabel": "when"}},
                {"id": "3", "type": "terms", "schema": "group",
                 "params": {"field": "user_id.keyword", "size": 5,
                             "order": "desc", "orderBy": "1",
                             "customLabel": "user_id"}},
                {"id": "1", "type": "avg", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "avg_v"}},
            ],
            vis_type="line",
        )
    )
    docs = _es_docs(spark, sf_dir)
    out = plan.evaluate(docs)
    series = out.select(
        F.lit("series").alias("branch"),
        F.date_format("when", _TS_FMT).alias("when_s"),
        F.col("user_id").alias("key"),
        F.lit(None).cast("long").alias("n"),
        F.col("avg_v").alias("val"),
    )
    # round 12 (min_doc_count): a sparse subset gives hourly buckets
    # REAL gaps at every SF — min_doc_count=0 zero-fills them (count 0,
    # sum 0.0, ES's empty-bucket values), and min_doc_count=2 above a
    # terms series filters by the bucket's own-level count
    sparse = docs.filter(F.col("user_id").cast("long") % 97 == 0)
    fill = compile_visualization(
        _vis(
            [
                {"id": "2", "type": "date_histogram", "schema": "segment",
                 "params": {"field": "ts", "customInterval": "1h",
                             "min_doc_count": 0, "customLabel": "when",
                             "extended_bounds": {
                                 "min": 1704024000000,   # 2023-12-31T12:00Z
                                 "max": 1706680800000,   # 2024-01-31T06:00Z
                             }}},
                {"id": "1", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
            ]
        )
    ).evaluate(sparse, auto_interval_buckets=None)
    fill = fill.select(
        F.lit("fill").alias("branch"),
        F.date_format("when", _TS_FMT).alias("when_s"),
        F.lit("").alias("key"),
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("double").alias("val"),
    )
    mdc2 = compile_visualization(
        _vis(
            [
                {"id": "2", "type": "date_histogram", "schema": "segment",
                 "params": {"field": "ts", "customInterval": "1h",
                             "min_doc_count": 2, "customLabel": "when"}},
                {"id": "4", "type": "terms", "schema": "group",
                 "params": {"field": "user_id.keyword", "size": 10000,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "uid"}},
                {"id": "1", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
            ]
        )
    ).evaluate(sparse, auto_interval_buckets=None)
    mdc2 = mdc2.select(
        F.lit("mdc2").alias("branch"),
        F.date_format("when", _TS_FMT).alias("when_s"),
        F.col("uid").alias("key"),
        F.col("n").cast("long").alias("n"),
        F.lit(None).cast("double").alias("val"),
    )
    return series.unionByName(fill).unionByName(mdc2)


@query(
    "kibana_top_hits_latest",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    r AS (
      SELECT event_type, value, user_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM d
    ),
    base AS (
      SELECT event_type, value AS last_value, user_id AS last_user
      FROM r WHERE rn = 1
    ),
    a3 AS (
      SELECT event_type, AVG(value) AS avg_top3
      FROM r WHERE rn <= 3 GROUP BY 1
    ),
    u2 AS (
      SELECT event_type,
             string_agg(user_id, ', ' ORDER BY rn) AS users_top2
      FROM r WHERE rn <= 2 GROUP BY 1
    )
    SELECT base.event_type, last_value, last_user, avg_top3, users_top2
    FROM base JOIN a3 USING (event_type) JOIN u2 USING (event_type)
    """,
)
def kibana_top_hits_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """top_hits(size=1, sort createdDateTime desc) — Kibana's
    latest-value metric (28 of the corpus's 33 top_hits aggs are this
    exact shape) over a terms bucket, compiled from visState; ties on
    the sort timestamp break by event_id via the ``tiebreak=`` hook —
    plus, round 12 (VERDICT r11 item 7), two size>1 Top Hit metrics:
    the top-3 values averaged and the top-2 user_ids ", "-concatenated
    in sort order, folding the row_number()<=size rank the engine now
    compiles for multi-hit panels.  The tiebreak inherits the sort
    direction (event_id DESC under ts DESC), so hit 1 of N is always
    the size-1 answer."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "2", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type.keyword", "size": 100,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "event_type"}},
                {"id": "1", "type": "top_hits", "schema": "metric",
                 "params": {"field": "value", "aggregate": "average",
                             "size": 1, "sortField": "ts",
                             "sortOrder": "desc", "customLabel": "last_value"}},
                {"id": "3", "type": "top_hits", "schema": "metric",
                 "params": {"field": "user_id.keyword", "aggregate": "concat",
                             "size": 1, "sortField": "ts",
                             "sortOrder": "desc", "customLabel": "last_user"}},
                {"id": "4", "type": "top_hits", "schema": "metric",
                 "params": {"field": "value", "aggregate": "average",
                             "size": 3, "sortField": "ts",
                             "sortOrder": "desc", "customLabel": "avg_top3"}},
                {"id": "5", "type": "top_hits", "schema": "metric",
                 "params": {"field": "user_id.keyword", "aggregate": "concat",
                             "size": 2, "sortField": "ts",
                             "sortOrder": "desc", "customLabel": "users_top2"}},
            ]
        )
    )
    return plan.evaluate(_es_docs(spark, sf_dir), tiebreak="event_id")


@query(
    "kibana_median",
    f"""
    WITH d AS ({_ES_DOCS_SQL})
    SELECT event_type,
           round(quantile_cont(value_i, 0.5), 4) AS med_p50,
           round(quantile_cont(value, 0.25), 4) AS pct_p25,
           round(quantile_cont(value, 0.75), 4) AS pct_p75,
           round(quantile_cont(value, 0.95), 4) AS pct_p95,
           -- round 12: value_count (non-null field values) and
           -- weighted_avg (integral value x integral weight products
           -- sum exactly -> bit-identical ratio)
           CAST(COUNT(user_id) AS BIGINT) AS n_users,
           SUM(value_i * CAST(user_id AS DOUBLE))
             / SUM(CAST(user_id AS DOUBLE)) AS wavg_v,
           CAST(mad(value_i) AS DOUBLE) AS mad_v,
           round(MIN(value), 4) AS bp_min,
           round(quantile_cont(value, 0.25), 4) AS bp_q1,
           round(quantile_cont(value, 0.5), 4) AS bp_q2,
           round(quantile_cont(value, 0.75), 4) AS bp_q3,
           round(MAX(value), 4) AS bp_max
    FROM d GROUP BY event_type
    """,
)
def kibana_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``median`` (modelled as percentiles([50]), one output column
    — kibana/compiler.py's round-6 addition) plus a multi-percent
    ``percentiles`` agg over a terms bucket, compiled from visState.
    The engine computes exact interpolated percentiles in ONE
    F.percentile array pass per agg (matching DuckDB quantile_cont);
    ES itself would t-digest — the approx_percentile swap is the
    documented 100 TB path, same plan shape (a11/a11b pattern).
    Round 12 adds ES ``value_count`` (non-null field values — here the
    user_id, so it differs from doc count only via nulls, which the
    unit test pins) and ``weighted_avg`` (sum(v·w)/sum(w), value_i
    weighted by the numeric user_id — integral products sum exactly,
    so the ratio is bit-identical across engines) and
    ``median_absolute_deviation`` (median(|v − median|), two exact
    grouped percentile passes on the same keys; DuckDB's mad() is the
    literal twin — ES itself t-digests both medians) and ``boxplot``
    (min/q1/q2/q3/max in the same single hash-agg pass)."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "2", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type.keyword", "size": 100,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "event_type"}},
                {"id": "1", "type": "median", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "med"}},
                {"id": "3", "type": "percentiles", "schema": "metric",
                 "params": {"field": "value", "percents": [25, 75, 95],
                             "customLabel": "pct"}},
                {"id": "4", "type": "value_count", "schema": "metric",
                 "params": {"field": "user_id.keyword",
                             "customLabel": "n_users"}},
                {"id": "5", "type": "weighted_avg", "schema": "metric",
                 "params": {"value": {"field": "value_i"},
                             "weight": {"field": "user_id.keyword"},
                             "customLabel": "wavg_v"}},
                {"id": "6", "type": "median_absolute_deviation",
                 "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "mad_v"}},
                {"id": "7", "type": "boxplot", "schema": "metric",
                 "params": {"field": "value", "customLabel": "bp"}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select(
        "event_type",
        F.round(F.col("med_p50"), 4).alias("med_p50"),
        F.round(F.col("pct_p25"), 4).alias("pct_p25"),
        F.round(F.col("pct_p75"), 4).alias("pct_p75"),
        F.round(F.col("pct_p95"), 4).alias("pct_p95"),
        F.col("n_users").cast("long").alias("n_users"),
        F.col("wavg_v").cast("double").alias("wavg_v"),
        F.col("mad_v").cast("double").alias("mad_v"),
        F.round(F.col("bp_min"), 4).alias("bp_min"),
        F.round(F.col("bp_q1"), 4).alias("bp_q1"),
        F.round(F.col("bp_q2"), 4).alias("bp_q2"),
        F.round(F.col("bp_q3"), 4).alias("bp_q3"),
        F.round(F.col("bp_max"), 4).alias("bp_max"),
    )


@query(
    "kibana_histogram_stats",
    """
    WITH r(k, lo, hi) AS (
      VALUES ('*-10', NULL, 10.0), ('10-26', 10.0, 26.0), ('25-*', 25.0, NULL)
    ),
    b AS (
      SELECT r.k AS qty_range,
             floor(l.l_extendedprice / 10000) * 10000 AS price_b,
             l.l_quantity AS q
      FROM lineitem l, r
      WHERE (r.lo IS NULL OR l.l_quantity >= r.lo)
        AND (r.hi IS NULL OR l.l_quantity < r.hi)
    ),
    agg AS (
      SELECT qty_range, price_b,
             COUNT(q) AS qty_count,
             MIN(q) AS qty_min,
             MAX(q) AS qty_max,
             AVG(q) AS qty_avg,
             SUM(q) AS qty_sum,
             SUM(q * q) AS qty_sum_of_squares,
             SUM(q * q) / COUNT(q) - (SUM(q) / COUNT(q)) * (SUM(q) / COUNT(q))
               AS qty_variance,
             sqrt(SUM(q * q) / COUNT(q)
                  - (SUM(q) / COUNT(q)) * (SUM(q) / COUNT(q)))
               AS qty_std_deviation,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM b GROUP BY 1, 2
    )
    -- extended_stats_bucket of the doc count across the price
    -- histogram, per range bucket: the same population formulas over
    -- the integral per-bucket counts
    SELECT qty_range, price_b, qty_count, qty_min, qty_max, qty_avg,
           qty_sum, qty_sum_of_squares, qty_variance, qty_std_deviation,
           n,
           CAST(COUNT(n) OVER w AS BIGINT) AS esb_count,
           MIN(CAST(n AS DOUBLE)) OVER w AS esb_min,
           MAX(CAST(n AS DOUBLE)) OVER w AS esb_max,
           AVG(CAST(n AS DOUBLE)) OVER w AS esb_avg,
           SUM(CAST(n AS DOUBLE)) OVER w AS esb_sum,
           SUM(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w
             AS esb_sum_of_squares,
           SUM(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w
               / CAST(COUNT(n) OVER w AS DOUBLE)
             - (SUM(CAST(n AS DOUBLE)) OVER w
                / CAST(COUNT(n) OVER w AS DOUBLE))
               * (SUM(CAST(n AS DOUBLE)) OVER w
                  / CAST(COUNT(n) OVER w AS DOUBLE)) AS esb_variance,
           sqrt(SUM(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) OVER w
                  / CAST(COUNT(n) OVER w AS DOUBLE)
                - (SUM(CAST(n AS DOUBLE)) OVER w
                   / CAST(COUNT(n) OVER w AS DOUBLE))
                  * (SUM(CAST(n AS DOUBLE)) OVER w
                     / CAST(COUNT(n) OVER w AS DOUBLE)))
             AS esb_std_deviation
    FROM agg
    WINDOW w AS (PARTITION BY qty_range)
    """,
)
def kibana_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 ES bucket/metric additions in one visState: a
    ``range`` bucket over l_quantity (half-open [from, to), with an
    OVERLAPPING pair so a 25-quantity line lands in two buckets — ES's
    multi-match explode), a nested numeric ``histogram`` over
    l_extendedprice (floor(v/10000)·10000, ES's exact formula), and an
    ``extended_stats`` metric.  Variance is ES's documented
    sum_of_squares/count − mean² (population) derived from the exact
    partials — l_quantity is integral, so count/min/max/sum/sum_sq are
    exact and the derived avg/variance/stddev divisions are
    bit-identical to the oracle replaying the same formula.

    Round 13 adds the ``extended_stats_bucket`` SIBLING over the doc
    count across the price histogram per range bucket — the same
    population formulas over the integral per-bucket counts, one
    grouped aggregation joined back."""
    li = _t(spark, sf_dir, "lineitem")
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "range", "schema": "bucket",
                 "params": {"field": "l_quantity", "customLabel": "qty_range",
                             "ranges": [
                                 {"to": 10}, {"from": 10, "to": 26},
                                 {"from": 25},
                             ]}},
                {"id": "2", "type": "histogram", "schema": "bucket",
                 "params": {"field": "l_extendedprice", "interval": 10000,
                             "customLabel": "price_b"}},
                {"id": "3", "type": "extended_stats", "schema": "metric",
                 "params": {"field": "l_quantity", "customLabel": "qty"}},
                {"id": "4", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
                {"id": "5", "type": "extended_stats_bucket",
                 "schema": "metric",
                 "params": {"metricAgg": "4", "customLabel": "esb"}},
            ]
        )
    )
    return plan.evaluate(li)


@query(
    "kibana_pipeline",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    b AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
               AS day
      FROM d
    ),
    agg AS (
      SELECT event_type, day, COUNT(*) AS count FROM b GROUP BY 1, 2
    ),
    -- parent pipelines reduce FIRST (declared before the selector),
    -- over the full day sequence
    win AS (
      SELECT event_type, day, count,
             CAST(count AS DOUBLE) - lag(CAST(count AS DOUBLE)) OVER w
               AS d_count,
             SUM(CAST(count AS DOUBLE)) OVER (
               w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_count,
             AVG(CAST(count AS DOUBLE)) OVER (
               w ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS m_count
      FROM agg
      WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    -- the bucket_selector declared NEXT drops odd-count days, so the
    -- avg_bucket declared AFTER it averages only the survivors
    -- (request-order reduction, round 11.5)
    filt AS (SELECT * FROM win WHERE count % 2 = 0)
    SELECT event_type, strftime(day, '%Y-%m-%d %H:%M:%S') AS day_s, count,
           d_count, c_count, m_count,
           AVG(CAST(count AS DOUBLE)) OVER (PARTITION BY event_type)
             AS sel_avg,
           CAST(count AS DOUBLE)
             / SUM(CAST(count AS DOUBLE)) OVER (PARTITION BY event_type)
             AS pct
    FROM filt
    """,
)
def kibana_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES parent pipeline aggregations (round 8): a terms × daily
    date_histogram bucket tree whose implicit doc-count feeds
    ``derivative``, ``cumulative_sum``, and ``moving_avg`` (ES
    moving_fn shift=0 semantics: the 3 buckets BEFORE the current one,
    exclusive) — the classic "requests per day, day-over-day change,
    running total, smoothed trend" Kibana panel.  The pipeline windows
    partition by the terms bucket and order by the histogram key, so
    the sequence op runs over the already-aggregated bucket table
    (days × types rows), never the raw docs.  Counts are integral:
    lag-subtraction, running sums, and the ≤3-term averages are all
    exact, hash-identical to the SQL window twin.

    Round 11.5 — same-level pipelines now reduce in REQUEST order
    (removing the ADVICE-r9 documented divergence): a bucket_selector
    declared after the parent pipelines drops odd-count days, and the
    avg_bucket declared AFTER the selector averages only the
    survivors (the fixed phase order would have fed it every
    bucket).

    Round 13 adds the ES ``normalize`` pipeline agg
    (method=percent_of_sum) declared after the selector: each
    surviving day's share of its type's surviving total — computed as
    a grouped level aggregation broadcast-joined back (never an
    unpartitioned window), a single IEEE division of integral sums on
    both engines."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type", "size": 10,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "event_type"}},
                {"id": "2", "type": "date_histogram", "schema": "bucket",
                 "params": {"field": "ts", "interval": "1d",
                             "customLabel": "day"}},
                {"id": "3", "type": "derivative", "schema": "metric",
                 "params": {"metricAgg": "_count", "customLabel": "d_count"}},
                {"id": "4", "type": "cumulative_sum", "schema": "metric",
                 "params": {"metricAgg": "_count", "customLabel": "c_count"}},
                {"id": "5", "type": "moving_avg", "schema": "metric",
                 "params": {"metricAgg": "_count", "window": 3,
                             "customLabel": "m_count"}},
                {"id": "6", "type": "bucket_selector", "schema": "metric",
                 "params": {"buckets_path": {"c": "_count"},
                             "script": "params.c % 2 == 0"}},
                {"id": "7", "type": "avg_bucket", "schema": "metric",
                 "params": {"metricAgg": "_count",
                             "customLabel": "sel_avg"}},
                {"id": "8", "type": "normalize", "schema": "metric",
                 "params": {"metricAgg": "_count",
                             "method": "percent_of_sum",
                             "customLabel": "pct"}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select(
        "event_type",
        F.date_format("day", _TS_FMT).alias("day_s"),
        "count",
        "d_count",
        "c_count",
        "m_count",
        "sel_avg",
        "pct",
    )


@query(
    "kibana_sibling_sort",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    b AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 86400000000) * 86400000000) AS day,
             value_i
      FROM d
    ),
    agg AS (
      SELECT event_type, day, SUM(value_i) AS sv FROM b GROUP BY 1, 2
    ),
    sib AS (
      SELECT event_type, day, sv,
             AVG(CAST(sv AS DOUBLE)) OVER (PARTITION BY event_type) AS avg_sv,
             MAX(CAST(sv AS DOUBLE)) OVER (PARTITION BY event_type) AS max_sv,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY sv DESC, day ASC) AS rn
      FROM agg
    )
    SELECT event_type, strftime(day, '%Y-%m-%d %H:%M:%S') AS day_s,
           sv, avg_sv, max_sv
    FROM sib WHERE rn <= 3
    """,
)
def kibana_sibling_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sibling pipeline aggs + bucket_sort (round 8): per event_type,
    the daily sum of value_i, its across-days avg_bucket / max_bucket
    (computed over ALL days — ES computes siblings before bucket_sort's
    response-shaping truncation), then bucket_sort keeps each type's
    top-3 days by that sum.  The "busiest days vs the average day"
    panel.  value_i is integral so the sums and the ≤150-term averages
    are exact in both engines.

    Scale shape: one hash agg (type × day), sibling = one grouped agg
    over ~types rows broadcast-joined back, bucket_sort = row_number
    over the per-type partition of the already-aggregated bucket table
    — no window ever touches raw events."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type", "size": 10,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "event_type"}},
                {"id": "2", "type": "date_histogram", "schema": "bucket",
                 "params": {"field": "ts", "interval": "1d",
                             "customLabel": "day"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "sv"}},
                {"id": "4", "type": "avg_bucket", "schema": "metric",
                 "params": {"metricAgg": "3", "customLabel": "avg_sv"}},
                {"id": "5", "type": "max_bucket", "schema": "metric",
                 "params": {"metricAgg": "3", "customLabel": "max_sv"}},
                {"id": "6", "type": "bucket_sort", "schema": "metric",
                 "params": {"sortField": "3", "order": "desc", "size": 3}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select(
        "event_type",
        F.date_format("day", _TS_FMT).alias("day_s"),
        "sv",
        "avg_sv",
        "max_sv",
    )


@query(
    "kibana_bucket_script",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    agg AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
               AS day,
             SUM(value_i) AS total, COUNT(*) AS n
      FROM d GROUP BY 1, 2
    )
    SELECT event_type, strftime(day, '%Y-%m-%d %H:%M:%S') AS day_s,
           total, n,
           (CAST(total AS DOUBLE) + 1) / (CAST(n AS DOUBLE) * 2) AS rate
    FROM agg
    WHERE CAST(n AS DOUBLE) >= 3 AND CAST(total AS DOUBLE) / CAST(n AS DOUBLE) > 1
    """,
)
def kibana_bucket_script(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``bucket_script`` + ``bucket_selector`` pipelines (round 9):
    a terms × daily date_histogram bucket tree where a painless script
    computes a smoothed per-doc rate ``(total + 1) / (n * 2)`` per
    bucket and a selector keeps only buckets with ``n >= 3 &&
    total / n > 1`` — the canonical "derived ratio + drop sparse
    buckets" ES response shaping.  The script compiles to ONE Column
    expression (kibana/compiler.py::compile_bucket_script): scan-local
    arithmetic over the already-aggregated bucket table, no Python, no
    extra shuffle.  value_i is integral so the divisions are single
    IEEE ops — bit-identical to the SQL twin."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type", "size": 10,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "event_type"}},
                {"id": "2", "type": "date_histogram", "schema": "bucket",
                 "params": {"field": "ts", "interval": "1d",
                             "customLabel": "day"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
                {"id": "4", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
                {"id": "5", "type": "bucket_script", "schema": "metric",
                 "params": {"buckets_path": {"t": "3", "c": "4"},
                             "script": "(params.t + 1) / (params.c * 2)",
                             "customLabel": "rate"}},
                {"id": "6", "type": "bucket_selector", "schema": "metric",
                 "params": {"buckets_path": {"t": "3", "c": "4"},
                             "script":
                             "params.c >= 3 && params.t / params.c > 1"}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select(
        "event_type",
        F.date_format("day", _TS_FMT).alias("day_s"),
        "total",
        "n",
        "rate",
    )


@query(
    "kibana_serial_stats",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    agg AS (
      SELECT event_type,
             make_timestamp((epoch_us(ts) // 86400000000) * 86400000000)
               AS day,
             SUM(value_i) AS total
      FROM d GROUP BY 1, 2
    ),
    sd AS (
      SELECT event_type, day, total,
             CAST(total AS DOUBLE)
               - lag(CAST(total AS DOUBLE), 2) OVER w AS sd2
      FROM agg WINDOW w AS (PARTITION BY event_type ORDER BY day)
    ),
    sib AS (
      SELECT event_type,
             CAST(COUNT(CAST(total AS DOUBLE)) AS BIGINT) AS st_count,
             MIN(CAST(total AS DOUBLE)) AS st_min,
             MAX(CAST(total AS DOUBLE)) AS st_max,
             AVG(CAST(total AS DOUBLE)) AS st_avg,
             SUM(CAST(total AS DOUBLE)) AS st_sum,
             list_extract(list_sort(list(CAST(total AS DOUBLE))),
               CAST(floor(0.50 * (COUNT(*) - 1) + 0.5) AS INTEGER) + 1)
               AS pb_p50,
             list_extract(list_sort(list(CAST(total AS DOUBLE))),
               CAST(floor(0.95 * (COUNT(*) - 1) + 0.5) AS INTEGER) + 1)
               AS pb_p95
      FROM agg GROUP BY 1
    )
    SELECT sd.event_type, strftime(sd.day, '%Y-%m-%d %H:%M:%S') AS day_s,
           sd.total, sd.sd2, sib.st_count, sib.st_min, sib.st_max,
           sib.st_avg, sib.st_sum, sib.pb_p50, sib.pb_p95
    FROM sd JOIN sib USING (event_type)
    """,
)
def kibana_serial_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``serial_diff`` + ``stats_bucket`` + ``percentiles_bucket``
    pipelines (round 9): per event type, the daily sum's 2-bucket
    serial difference (seasonality-adjusted change; the first 2
    buckets are NULL like ES) alongside the five stats-bucket columns
    and nearest-rank 50/95 bucket percentiles computed ACROSS the days
    and repeated per row — the ES response shape.

    Scale shape: serial_diff is a lag window over the already-
    aggregated bucket table partitioned by the terms bucket; the
    sibling stats are ONE grouped aggregation joined back broadcast
    (one row per outer bucket).  Sums of integral value_i → exact
    doubles; percentiles select the sorted bucket value at index
    round(p/100·(n-1)) — ES percentiles_bucket does not interpolate
    (ADVICE r10 fix); the twin replays the identical floor(x+0.5)
    index arithmetic over a sorted DuckDB list."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "terms", "schema": "bucket",
                 "params": {"field": "event_type", "size": 10,
                             "order": "asc", "orderBy": "_term",
                             "customLabel": "event_type"}},
                {"id": "2", "type": "date_histogram", "schema": "bucket",
                 "params": {"field": "ts", "interval": "1d",
                             "customLabel": "day"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
                {"id": "4", "type": "serial_diff", "schema": "metric",
                 "params": {"metricAgg": "3", "lag": 2,
                             "customLabel": "sd2"}},
                {"id": "5", "type": "stats_bucket", "schema": "metric",
                 "params": {"metricAgg": "3", "customLabel": "st"}},
                {"id": "6", "type": "percentiles_bucket", "schema": "metric",
                 "params": {"metricAgg": "3", "percents": [50, 95],
                             "customLabel": "pb"}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select(
        "event_type",
        F.date_format("day", _TS_FMT).alias("day_s"),
        "total", "sd2", "st_count", "st_min", "st_max", "st_avg",
        "st_sum", "pb_p50", "pb_p95",
    )


@query(
    "kibana_significant_terms",
    f"""
    WITH d AS (
      SELECT event_type, CAST(user_id % 13 AS VARCHAR) AS cohort,
             floor(value) AS value_i
      FROM events
    ),
    t AS (
      SELECT cohort,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS doc_count,
             COUNT(*) AS bg_count,
             AVG(CASE WHEN event_type = 'click' THEN value_i END) AS avg_vi
      FROM d GROUP BY 1
    ),
    tot AS (
      SELECT SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS subset,
             COUNT(*) AS superset
      FROM d
    ),
    scored AS (
      SELECT cohort, CAST(doc_count AS BIGINT) AS doc_count,
             CAST(bg_count AS BIGINT) AS bg_count,
             (CAST(doc_count AS DOUBLE) / CAST(subset AS DOUBLE)
              - CAST(bg_count AS DOUBLE) / CAST(superset AS DOUBLE))
             * ((CAST(doc_count AS DOUBLE) / CAST(subset AS DOUBLE))
                / (CAST(bg_count AS DOUBLE) / CAST(superset AS DOUBLE)))
               AS score,
             avg_vi
      FROM t, tot WHERE doc_count >= 3
    )
    SELECT cohort, doc_count, bg_count, round(score, 6) AS score, avg_vi
    FROM scored WHERE score > 0
    ORDER BY score DESC, cohort ASC LIMIT 5
    """,
)
def kibana_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``significant_terms`` (round 9): user cohorts (user_id % 13)
    whose share of click events is anomalously high vs the whole event
    stream, ES's default JLH score ``(fg% − bg%) · (fg% / bg%)`` with
    min_doc_count 3, top 5, plus a per-cohort avg metric over the
    FOREGROUND rows.  The foreground is the engine's explicit
    ``foreground`` query_string param (Kibana derives it from the
    dashboard search bar — a relational engine has no ambient query).

    Scale shape: ONE term-keyed hash agg computes fg and bg counts
    together (each row carries a boolean flag), set sizes are a 1-row
    broadcast, the top-5 cut is TakeOrdered.  Exact integer counts →
    single-IEEE-op score, bit-identical to the twin."""
    docs = _es_docs(spark, sf_dir).withColumn(
        "cohort", (F.col("user_id").cast("long") % 13).cast("string")
    )
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "significant_terms", "schema": "bucket",
                 "params": {"field": "cohort", "size": 5,
                             "foreground": "event_type: click",
                             "customLabel": "cohort"}},
                {"id": "2", "type": "avg", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "avg_vi"}},
            ]
        )
    )
    out = plan.evaluate(docs)
    return out.select(
        "cohort", "doc_count", "bg_count",
        F.round("score", 6).alias("score"), "avg_vi",
    )


@query(
    "kibana_composite",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    agg AS (
      SELECT event_type AS etype,
             make_timestamp((epoch_us(ts) // 21600000000) * 21600000000)
               AS slot,
             SUM(value_i) AS total, COUNT(*) AS n
      FROM d
      WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT etype, strftime(slot, '%Y-%m-%d %H:%M:%S') AS slot_s, total, n
    FROM agg
    WHERE etype > 'click' OR (etype = 'click' AND slot > TIMESTAMP '2024-01-20 06:00:00')
    ORDER BY etype ASC, slot ASC LIMIT 25
    """,
)
def kibana_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``composite`` aggregation (round 9): one page of the
    (event_type × 6h slot) bucket space, resumed from an ``after``
    cursor — the agg ES users reach for when a terms ``size`` cap
    makes exports lossy.  The after-predicate is a pure function of
    the grouping keys so it pushes below the aggregation (each page
    scans only keys past the cursor) and the page cut is a
    TakeOrdered: pagination over a 100 TB relation never materializes
    more than one page of buckets.  The cursor lands mid-span
    (2024-01-20 inside the table's January data) so the
    same-key-later-slot branch of the lexicographic predicate is
    genuinely exercised at the gate SFs.  Integral sums → exact."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "composite", "schema": "bucket",
                 "params": {
                     "sources": [
                         {"etype": {"terms": {"field": "event_type"}}},
                         {"slot": {"date_histogram": {"field": "ts",
                                                      "interval": "6h"}}},
                     ],
                     "size": 25,
                     "after": ["click", "2024-01-20 06:00:00"],
                 }},
                {"id": "2", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
                {"id": "3", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select(
        "etype",
        F.date_format("slot", _TS_FMT).alias("slot_s"),
        "total",
        "n",
    )


@query(
    "kibana_composite_histogram",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    agg AS (
      SELECT event_type AS etype,
             floor(value / 25.0) * 25.0 AS vb,
             SUM(value_i) AS total, CAST(COUNT(*) AS BIGINT) AS n
      FROM d
      WHERE event_type IS NOT NULL AND value IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT etype, vb, total, n
    FROM agg
    WHERE etype > 'error' OR (etype = 'error' AND vb > 250.0)
    ORDER BY etype ASC, vb ASC LIMIT 30
    """,
)
def kibana_composite_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``composite`` with a NUMERIC ``histogram`` source (built
    round 15, registered round 16 per VERDICT r15 item 2): one page of
    the (event_type × 25-wide value bucket) space resumed from an
    ``after`` cursor landing mid-key ('error', 250.0) so the
    same-key-later-bucket branch of the lexicographic predicate is
    exercised — the numeric sibling of kibana_composite's
    date_histogram source.  Histogram keys are ES-exact
    floor(v/interval)*interval doubles (negatives bucket downward).

    Scale: the after-predicate is a pure function of the grouping keys
    so it pushes below the aggregation; the page cut is a TakeOrdered —
    pagination never materializes more than one page of buckets."""
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "composite", "schema": "bucket",
                 "params": {
                     "sources": [
                         {"etype": {"terms": {"field": "event_type"}}},
                         {"vb": {"histogram": {"field": "value",
                                               "interval": 25}}},
                     ],
                     "size": 30,
                     "after": ["error", 250.0],
                 }},
                {"id": "2", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
                {"id": "3", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
            ]
        )
    )
    out = plan.evaluate(_es_docs(spark, sf_dir))
    return out.select("etype", "vb", "total", F.col("n").cast("long").alias("n"))


@query(
    "kibana_rare_multi_terms",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    -- rare_terms over floor(value²): if value is ~uniform the key
    -- density thins as 1/(2·√k), so the high keys form a genuine long
    -- tail at every SF (800 / 4.1k / 7.5k rare keys at the gate SFs)
    rare AS (
      SELECT 'rare' AS branch,
             CAST(CAST(floor(value * value) AS BIGINT) AS VARCHAR) AS key,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(value_i) AS DOUBLE) AS total
      FROM d GROUP BY 2 HAVING COUNT(*) <= 2
    ),
    mt AS (
      SELECT event_type || '|' || CAST(CAST(user_id AS BIGINT) % 5 AS VARCHAR)
               AS key,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(value_i) AS DOUBLE) AS total
      FROM d GROUP BY 1
    ),
    -- multi_terms size cut = orderBy(count desc, key asc).limit —
    -- row_number semantics, exactly the engine's top-level rank path
    multi AS (
      SELECT 'multi' AS branch, key, n_docs, total FROM mt
      QUALIFY row_number() OVER (ORDER BY n_docs DESC, key ASC) <= 10
    ),
    -- round 12: METRIC-ordered multi_terms (orderBy a sum sub-agg) —
    -- the cut ranks by the ordering metric, key tiebreak, like terms
    multi_sum AS (
      SELECT 'multi_sum' AS branch, key, n_docs, total FROM mt
      QUALIFY row_number() OVER (ORDER BY total DESC, key ASC) <= 4
    )
    SELECT * FROM rare UNION ALL SELECT * FROM multi
    UNION ALL SELECT * FROM multi_sum
    """,
)
def kibana_rare_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``rare_terms`` + ``multi_terms`` (round 11.5), one branch
    each through the real visState front end: rare_terms keeps the
    long-tail keys (doc count ≤ 2) of a synthesized zipf-ish key
    (floor(value²) — density thins as 1/(2√k) under a ~uniform value),
    the exact form of what ES computes with a CuckooFilter
    approximation; multi_terms buckets the (event_type, user_id % 5)
    tuple under ES's '|'-joined key_as_string, doc-count-ordered with
    the size-10 cut, plus — round 12 — a METRIC-ordered branch (orderBy
    the sum sub-agg, size 4) exercising the terms rank path over the
    tuple key.

    Scale shape: rare_terms joins the key-count frame back KEY-KEYED —
    never a broadcast (the qualifying set is the long tail, i.e. MOST
    keys; the optimizer/AQE picks the join strategy) — unlike terms'
    top-N semi-join whose survivor side is provably small; multi_terms
    reuses the terms ranking machinery verbatim (one hash agg +
    TakeOrdered + broadcast semi-join).  Exact integral sums and
    counts → bit-identical twins."""
    docs = (
        _es_docs(spark, sf_dir)
        .withColumn(
            "vkey",
            F.floor(F.col("value") * F.col("value"))
            .cast("long")
            .cast("string"),
        )
        .withColumn(
            "ubucket", (F.col("user_id").cast("long") % 5).cast("string")
        )
    )
    rare = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "rare_terms", "schema": "bucket",
                 "params": {"field": "vkey", "max_doc_count": 2,
                             "customLabel": "key"}},
                {"id": "2", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n_docs"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
            ]
        )
    ).evaluate(docs)
    multi = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "multi_terms", "schema": "bucket",
                 "params": {"terms": [{"field": "event_type"},
                                       {"field": "ubucket"}],
                             "size": 10, "customLabel": "key"}},
                {"id": "2", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n_docs"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
            ]
        )
    ).evaluate(docs)

    def shape(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.lit(tag).alias("branch"),
            "key",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total").cast("double").alias("total"),
        )

    multi_sum = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "multi_terms", "schema": "bucket",
                 "params": {"terms": [{"field": "event_type"},
                                       {"field": "ubucket"}],
                             "size": 4, "orderBy": "3", "order": "desc",
                             "customLabel": "key"}},
                {"id": "2", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n_docs"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "value_i", "customLabel": "total"}},
            ]
        )
    ).evaluate(docs)

    return (
        shape(rare, "rare")
        .unionByName(shape(multi, "multi"))
        .unionByName(shape(multi_sum, "multi_sum"))
    )


@query(
    "kibana_query_string",
    r"""
    WITH d AS (SELECT * FROM documents),
    -- ONE flags row per document: each branch predicate named once so
    -- the 'other' bucket (ES other_bucket, round 11.5 — documents
    -- matching NO filter) is the literal conjunction of negations and
    -- cannot drift from the per-branch predicates
    f AS (
      SELECT n_chars,
             -- fuzzy ~1 is restricted Damerau-Levenshtein; at k=1 it
             -- is EXACTLY levenshtein<=1 OR one-adjacent-transposition
             -- equality (a transposition spends the whole budget), so
             -- the oracle enumerates the three adjacent swaps
             (levenshtein(source, 'src5') <= 1
                OR source IN ('rsc5', 'scr5', 'sr5c')) AS b_fuzzy_src,
             (levenshtein(source, 'rsc5') <= 1
                OR source IN ('src5', 'rcs5', 'rs5c')) AS b_fuzzy_transposed,
             regexp_matches(source, '^src.*2$') AS b_wild_mid,
             -- the boundary/gap classes replay the engine's Unicode
             -- emission exactly (\b/\w are ASCII in both engines)
             (regexp_matches(text, '(?:^|{NW})data{NW}+(?:{W}+{NW}+){0,2}window(?:$|{NW})')
                OR regexp_matches(text, '(?:^|{NW})window{NW}+(?:{W}+{NW}+){0,0}data(?:$|{NW})')) AS b_prox,
             (regexp_matches(text,
               '(?:(?:^|{NW})window{NW}+(?:{W}+{NW}+){0}data{NW}+(?:{W}+{NW}+){0,2}scan(?:$|{NW})|(?:^|{NW})window{NW}+(?:{W}+{NW}+){1}data{NW}+(?:{W}+{NW}+){0,1}scan(?:$|{NW})|(?:^|{NW})window{NW}+(?:{W}+{NW}+){2}data{NW}+(?:{W}+{NW}+){0,0}scan(?:$|{NW}))')
                OR regexp_matches(text, '(?:^|{NW})window{NW}+(?:{W}+{NW}+){0}scan{NW}+(?:{W}+{NW}+){0,0}data(?:$|{NW})')
                OR regexp_matches(text, '(?:^|{NW})data{NW}+(?:{W}+{NW}+){0}window{NW}+(?:{W}+{NW}+){0,0}scan(?:$|{NW})')) AS b_prox3,
             -- prox5 is a SEMANTIC twin, not a regex replay: the
             -- probed column is constructed from (lang, doc_id % 4)
             -- with per-variant displacement costs 0 / 2 / 1 / 12
             -- against the 5-word probe at slop 2, so the ground
             -- truth is exactly lang='en' minus the reversal variant
             (lang = 'en' AND doc_id % 4 != 3) AS b_prox5,
             regexp_matches(
               regexp_replace(text, '\bdata\b', 'dätä', 'g'),
               '(?:^|{NW})dätä{NW}+(?:{W}+{NW}+){0,1}window(?:$|{NW})') AS b_prox_unicode,
             (CAST(n_chars AS DOUBLE) >= 200
                AND CAST(n_chars AS DOUBLE) <= 300 AND lang = 'en') AS b_boosted_en,
             ((lang = 'en' OR lang = 'de') AND source LIKE 'src1%') AS b_complex
      FROM d
    )
    SELECT 'fuzzy_src' AS qs, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM f WHERE b_fuzzy_src HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'fuzzy_transposed', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_fuzzy_transposed HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'wild_mid', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_wild_mid HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'prox', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_prox HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'prox3', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_prox3 HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'prox5', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_prox5 HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'prox_unicode', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_prox_unicode HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'boosted_en', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_boosted_en HAVING COUNT(*) > 0
    UNION ALL
    SELECT 'complex', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE b_complex HAVING COUNT(*) > 0
    UNION ALL
    -- COALESCE(flag, FALSE): a NULL predicate (NULL probed column)
    -- matches nothing on the Spark side (the when() emits no label),
    -- so under three-valued logic the doc must still land in 'other'
    -- (second-review 11.5)
    SELECT 'other', COUNT(*), CAST(SUM(n_chars) AS BIGINT)
    FROM f WHERE NOT COALESCE(b_fuzzy_src, FALSE)
             AND NOT COALESCE(b_fuzzy_transposed, FALSE)
             AND NOT COALESCE(b_wild_mid, FALSE)
             AND NOT COALESCE(b_prox, FALSE)
             AND NOT COALESCE(b_prox3, FALSE)
             AND NOT COALESCE(b_prox5, FALSE)
             AND NOT COALESCE(b_prox_unicode, FALSE)
             AND NOT COALESCE(b_boosted_en, FALSE)
             AND NOT COALESCE(b_complex, FALSE)
    HAVING COUNT(*) > 0
    """.replace("{W}", r"[\p{L}\p{N}_]").replace("{NW}", r"[^\p{L}\p{N}_]"),
)
def kibana_query_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The completed Lucene ``query_string`` grammar (rounds 10-11)
    driven end-to-end through a filters-bucket visualization over the
    documents table: fuzzy (``source: src5~1`` → restricted
    Damerau-Levenshtein ≤ 1, round 11 — ``rsc5~1`` matches ``src5``
    purely via the transposition credit plain Levenshtein lacks),
    interior wildcard (``source: src*2`` → anchored regex), phrase
    proximity with token boundaries and out-of-order permutations
    (``"data window"~2``, ``"window data scan"~2`` — each permutation
    pays its displacement, the rest buys gaps), a boosted term inside
    a boolean+range clause (``^2`` parsed and dropped — filters score
    nothing), and prefix wildcard under parenthesized OR.  Reference
    parity: ELK dashboards express search-bar filters as query_string
    inputs (ELK/jmx_dashboard.json filters buckets); this exercises
    the grammar beyond the corpus subset.

    Round 11.5 — ES ``other_bucket`` collects the documents matching
    NO filter under the ``other`` key (the oracle's flags CTE makes
    the other branch the literal conjunction of negations, so it
    cannot drift from the per-branch predicates), and two branches
    over DERIVED columns exercise the removed divergences: ``prox5`` probes a 5-word phrase against a
    column constructed from (lang, doc_id % 4) whose four variants
    cost displacement 0 (declared order), 2 (adjacent swap), 1 (one
    intervening word), and 12 (full reversal — out of budget) against
    slop 2, so its twin is SEMANTIC (``lang = 'en' AND doc_id % 4 !=
    3``) rather than a regex replay; ``prox_unicode`` rewrites the
    token ``data`` to ``dätä`` and probes across a non-ASCII word
    edge, exercising the Unicode token-boundary class.

    Scale shape: every predicate compiles to a scan-local JVM
    expression (length guard + thresholded levenshtein short-circuit
    before the O(len²) OSA fold, rlike, range) — one explode over
    matched labels, one hash aggregation on the label key; no Python,
    no second corpus pass.  The twin replays identical regexes where
    it replays regexes at all (the Unicode word class ``[\\p{L}\\p{N}
    _]`` is spelled identically in java.util.regex and RE2; ``\\b``
    would be ASCII-only in both) and replays fuzzy k=1 via the exact
    identity: OSA ≤ 1 ⟺ levenshtein ≤ 1 OR the value is one adjacent
    transposition of the probe (a transposition spends the whole
    budget, and unlike unrestricted Damerau nothing may land inside
    the pair)."""
    docs = (
        _t(spark, sf_dir, "documents")
        .withColumn(
            "meta",
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.col("lang"), F.lit(" doc from the corpus")),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(F.lit("doc "), F.col("lang"), F.lit(" from the corpus")),
            )
            .when(
                F.col("doc_id") % 4 == 2,
                F.concat(F.col("lang"), F.lit(" doc x from the corpus")),
            )
            .otherwise(F.concat(F.lit("corpus the from doc "), F.col("lang"))),
        )
        .withColumn("text_u", F.regexp_replace("text", r"\bdata\b", "dätä"))
    )
    qs = {
        "fuzzy_src": "source: src5~1",
        "fuzzy_transposed": "source: rsc5~1",
        "wild_mid": "source: src*2",
        "prox": 'text: "data window"~2',
        "prox3": 'text: "window data scan"~2',
        "prox5": 'meta: "en doc from the corpus"~2',
        "prox_unicode": 'text_u: "dätä window"~1',
        "boosted_en": "n_chars: [200 TO 300] AND lang: en^2",
        "complex": "(lang: en OR lang: de) AND source: src1*",
    }
    plan = compile_visualization(
        _vis(
            [
                {"id": "1", "type": "filters", "schema": "bucket",
                 "params": {"customLabel": "qs",
                            # ES other_bucket (round 11.5): documents
                            # matching NO filter land in 'other'
                            # instead of dropping
                            "other_bucket": True,
                            "other_bucket_key": "other",
                            "filters": [
                     {"label": lbl,
                      "input": {"query": {"query_string": {"query": q}}}}
                     for lbl, q in qs.items()
                 ]}},
                {"id": "2", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n_docs"}},
                {"id": "3", "type": "sum", "schema": "metric",
                 "params": {"field": "n_chars", "customLabel": "sum_chars"}},
            ]
        )
    )
    out = plan.evaluate(docs)
    return out.select("qs", "n_docs", F.col("sum_chars").cast("long").alias("sum_chars"))


# ES auto_date_histogram ladder as SQL — imported from the compiler so
# the oracle can never drift from the engine's ladder (same pattern as
# _LADDER_CASE above).  Mirrors es_auto_date_interval_us(lo, hi, 40):
# the smallest rounding whose bucket count over the FLOORED endpoints
# fits (ADVICE r13 — ES rounds keys before counting, so the count is
# hi//iv - lo//iv + 1, not span//iv + 1).
from kafka_metrics_exporter_spark.kibana.compiler import (  # noqa: E402
    _ES_AUTO_LADDER_US,
)

_ES_LADDER_CASE_40 = (
    "CASE "
    + " ".join(
        f"WHEN hi // {iv} - lo // {iv} + 1 <= 40 THEN {iv}"
        for iv in _ES_AUTO_LADDER_US
    )
    + " END"
)


@query(
    "kibana_filter_missing_auto",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    flt AS (
      SELECT 'filter' AS branch, 'big' AS key,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(value_i) AS val
      FROM d WHERE value_i > 200
      HAVING COUNT(*) > 0
    ),
    dm AS (
      SELECT CASE WHEN CAST(user_id AS BIGINT) % 3 = 0 THEN NULL
                  ELSE event_type END AS opt_src, value_i
      FROM d
    ),
    miss AS (
      SELECT 'missing' AS branch, 'nosrc' AS key,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(value_i) AS val
      FROM dm WHERE opt_src IS NULL
      HAVING COUNT(*) > 0
    ),
    span AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM d
    ),
    iv AS (SELECT {_ES_LADDER_CASE_40} AS iv FROM span),
    auto AS (
      SELECT 'auto' AS branch,
             strftime(make_timestamp((epoch_us(d.ts) // i.iv) * i.iv),
                      '%Y-%m-%d %H:%M:%S') AS key,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(value_i) AS val
      FROM d, iv i GROUP BY 2
    ),
    -- significant_text over the documents corpus: distinct tokens per
    -- doc (doc frequency), JLH vs the whole corpus, DOC-count sizes
    docsrc AS (
      SELECT doc_id, CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS fg,
             text
      FROM documents
    ),
    tot AS (SELECT SUM(fg) AS subset, COUNT(*) AS superset FROM docsrc),
    tokd AS (
      SELECT DISTINCT doc_id, fg, tok
      FROM (SELECT doc_id, fg,
                   unnest(regexp_split_to_array(
                     lower(text), '[^\\p{{L}}\\p{{N}}]+')) AS tok
            FROM docsrc)
      WHERE tok != ''
    ),
    pt AS (
      SELECT tok, CAST(SUM(fg) AS BIGINT) AS doc_count,
             COUNT(*) AS bg_count
      FROM tokd GROUP BY tok
    ),
    sc AS (
      SELECT tok, doc_count,
             (doc_count / CAST(subset AS DOUBLE)
                - bg_count / CAST(superset AS DOUBLE))
             * ((doc_count / CAST(subset AS DOUBLE))
                / (bg_count / CAST(superset AS DOUBLE))) AS score
      FROM pt, tot WHERE doc_count >= 5
    ),
    sigtext AS (
      SELECT 'sigtext' AS branch, tok AS key, doc_count AS n,
             score AS val
      FROM sc WHERE score > 0
      ORDER BY score DESC, tok ASC LIMIT 10
    ),
    -- adjacency_matrix: per-doc filter flags, singleton + pair cells
    adjf AS (
      SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS fa,
             CASE WHEN value_i >= 100 THEN 1 ELSE 0 END AS fb,
             CASE WHEN value_i < 10 THEN 1 ELSE 0 END AS fc,
             value_i
      FROM d
    ),
    adj AS (
      SELECT 'adj' AS branch, cell AS key,
             CAST(COUNT(*) AS BIGINT) AS n, SUM(value_i) AS val
      FROM (
        SELECT 'click' AS cell, value_i FROM adjf WHERE fa = 1
        UNION ALL SELECT 'big', value_i FROM adjf WHERE fb = 1
        UNION ALL SELECT 'small', value_i FROM adjf WHERE fc = 1
        -- pair keys in ES's LEXICOGRAPHIC filter order (ADVICE r13):
        -- big < click < small, regardless of declaration order
        UNION ALL SELECT 'big&click', value_i FROM adjf
          WHERE fb = 1 AND fa = 1
        UNION ALL SELECT 'big&small', value_i FROM adjf
          WHERE fb = 1 AND fc = 1
        UNION ALL SELECT 'click&small', value_i FROM adjf
          WHERE fa = 1 AND fc = 1
      ) GROUP BY cell HAVING COUNT(*) > 0
    ),
    -- string_stats entropy of `source` per lang: char-keyed counts,
    -- H = log2(T) - sum(c*log2 c)/T, ROUNDED to 4 decimals (the ~12
    -- irrational c*log2 c terms sum in engine-specific order)
    sschars AS (
      SELECT lang, ch, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT lang, unnest(string_split(source, '')) AS ch
            FROM documents WHERE source IS NOT NULL)
      WHERE ch != '' GROUP BY lang, ch
    ),
    ss AS (
      SELECT 'sstats' AS branch, lang AS key,
             (SELECT CAST(COUNT(source) AS BIGINT) FROM documents dd
              WHERE dd.lang = sschars.lang) AS n,
             ROUND(log2(CAST(SUM(c) AS DOUBLE))
                   - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
                     / CAST(SUM(c) AS DOUBLE), 4) AS val
      FROM sschars GROUP BY lang
    ),
    -- variable_width_histogram: quantile-seeded deterministic Lloyd
    -- (3 rounds, centroids rounded to 6 decimals each round) unrolled
    -- step for step; empty clusters keep their previous centroid
    vwh_c0 AS (
      SELECT list_transform(
               quantile_cont(value_i, [0.0625, 0.1875, 0.3125, 0.4375, 0.5625, 0.6875, 0.8125, 0.9375]),
               c -> round(c, 6)) AS cents
      FROM d
    ),
    vwh_a1 AS (
      SELECT value_i,
             list_position(
               list_transform(vwh_c0.cents, c -> abs(value_i - c)),
               list_min(
                 list_transform(vwh_c0.cents, c -> abs(value_i - c)))
             ) AS cl
      FROM d, vwh_c0
    ),
    vwh_u1 AS (
      SELECT cl, round(AVG(value_i), 6) AS c FROM vwh_a1 GROUP BY cl
    ),
    vwh_c1 AS (
      SELECT array_agg(coalesce(u.c, p.cents[g.i]) ORDER BY g.i) AS cents
      FROM generate_series(1, 8) AS g(i)
      CROSS JOIN vwh_c0 p
      LEFT JOIN vwh_u1 u ON u.cl = g.i
    ),
    vwh_a2 AS (
      SELECT value_i,
             list_position(
               list_transform(vwh_c1.cents, c -> abs(value_i - c)),
               list_min(
                 list_transform(vwh_c1.cents, c -> abs(value_i - c)))
             ) AS cl
      FROM d, vwh_c1
    ),
    vwh_u2 AS (
      SELECT cl, round(AVG(value_i), 6) AS c FROM vwh_a2 GROUP BY cl
    ),
    vwh_c2 AS (
      SELECT array_agg(coalesce(u.c, p.cents[g.i]) ORDER BY g.i) AS cents
      FROM generate_series(1, 8) AS g(i)
      CROSS JOIN vwh_c1 p
      LEFT JOIN vwh_u2 u ON u.cl = g.i
    ),
    vwh_a3 AS (
      SELECT value_i,
             list_position(
               list_transform(vwh_c2.cents, c -> abs(value_i - c)),
               list_min(
                 list_transform(vwh_c2.cents, c -> abs(value_i - c)))
             ) AS cl
      FROM d, vwh_c2
    ),
    vwh_u3 AS (
      SELECT cl, round(AVG(value_i), 6) AS c FROM vwh_a3 GROUP BY cl
    ),
    vwh_c3 AS (
      SELECT array_agg(coalesce(u.c, p.cents[g.i]) ORDER BY g.i) AS cents
      FROM generate_series(1, 8) AS g(i)
      CROSS JOIN vwh_c2 p
      LEFT JOIN vwh_u3 u ON u.cl = g.i
    ),
    vwh_af AS (
      SELECT value_i,
             list_position(
               list_transform(vwh_c3.cents, c -> abs(value_i - c)),
               list_min(
                 list_transform(vwh_c3.cents, c -> abs(value_i - c)))
             ) AS cl
      FROM d, vwh_c3
    ),
    vwh AS (
      SELECT 'vwh' AS branch,
             CAST(CAST(c3.cents[cl] AS DECIMAL(18,6)) AS VARCHAR) AS key,
             CAST(COUNT(*) AS BIGINT) AS n,
             MAX(value_i) AS val
      FROM vwh_af, vwh_c3 c3
      GROUP BY c3.cents[cl]
    ),
    all_branches AS (
      SELECT * FROM flt UNION ALL SELECT * FROM miss
      UNION ALL SELECT * FROM auto UNION ALL SELECT * FROM sigtext
      UNION ALL SELECT * FROM adj UNION ALL SELECT * FROM ss
      UNION ALL SELECT * FROM vwh
    )
    SELECT * FROM all_branches
    """,
)
def kibana_filter_missing_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 bucket-vocabulary tier: the ES single ``filter`` agg
    (one named bucket of query-matching docs — the narrowing wrapper
    around sub-aggs), the ``missing`` bucket (docs LACKING a field,
    the complement of the terms null-drop), and ``auto_date_histogram``
    (ES picks the interval from its OWN rounding ladder so the
    populated span fits ``buckets`` inclusively — distinct from
    Kibana's auto-interval ladder).  One branch each over the events
    documents; the oracle re-derives the interval from the same span
    with the same imported ladder.  A fourth branch runs
    ``significant_text`` over the documents corpus (src0 as the
    foreground): distinct standard-analyzer tokens per doc, JLH
    scoring, DOC-count set sizes.  A fifth branch runs
    ``adjacency_matrix`` (three query_string filters → singleton and
    '&'-pair cells in ES's LEXICOGRAPHIC filter order — ADVICE r13 —
    explode-and-aggregate like the filters bucket),
    and a sixth runs ``string_stats`` over the documents' source field
    per lang (entropy rounded to 4 decimals — the char-keyed partial
    products sum in engine-specific order), and a seventh runs
    ``variable_width_histogram`` over the event values (quantile-seeded
    deterministic 3-round Lloyd, centroids 6-decimal-rounded each
    round so the ENTIRE trained clustering is SQL-replayable — the
    rare_terms/ANN determinism stance where ES is shard-order
    approximate).

    Scale: filter/missing are scan-local predicates fused into the
    single hash aggregation (no extra shuffle); auto interval needs
    one 1-row min/max probe — identical cost shape to the corpus's
    auto-interval date_histograms."""
    docs = _es_docs(spark, sf_dir)
    docs2 = _t(spark, sf_dir, "documents")

    def _flt():
        flt = compile_visualization(_vis([
            {"id": "1", "type": "filter", "schema": "bucket",
             "params": {"query": "value_i:>200", "customLabel": "big"}},
            {"id": "2", "type": "count", "schema": "metric",
             "params": {"customLabel": "n"}},
            {"id": "3", "type": "sum", "schema": "metric",
             "params": {"field": "value_i", "customLabel": "val"}},
        ])).evaluate(docs)
        return flt.select(
            F.lit("filter").alias("branch"), F.col("big").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"),
        )

    def _miss():
        # `missing` needs a field with real gaps: derive one (docs of
        # every third user lack it) — deterministic in both engines
        dm = docs.withColumn(
            "opt_src",
            F.when(
                F.col("user_id").cast("long") % 3 == 0,
                F.lit(None).cast("string"),
            )
            .otherwise(F.col("event_type")),
        )
        miss = compile_visualization(_vis([
            {"id": "1", "type": "missing", "schema": "bucket",
             "params": {"field": "opt_src", "customLabel": "nosrc"}},
            {"id": "2", "type": "count", "schema": "metric",
             "params": {"customLabel": "n"}},
            {"id": "3", "type": "sum", "schema": "metric",
             "params": {"field": "value_i", "customLabel": "val"}},
        ])).evaluate(dm)
        return miss.select(
            F.lit("missing").alias("branch"), F.col("nosrc").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"),
        )

    def _auto():
        auto = compile_visualization(_vis([
            {"id": "1", "type": "auto_date_histogram", "schema": "bucket",
             "params": {"field": "ts", "buckets": 40,
                        "customLabel": "when"}},
            {"id": "2", "type": "count", "schema": "metric",
             "params": {"customLabel": "n"}},
            {"id": "3", "type": "sum", "schema": "metric",
             "params": {"field": "value_i", "customLabel": "val"}},
        ])).evaluate(docs)
        return auto.select(
            F.lit("auto").alias("branch"),
            F.date_format("when", _TS_FMT).alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"),
        )

    def _sigtext():
        # round-13 significant_text branch over the documents corpus
        sigtext = compile_visualization(_vis([
            {"id": "1", "type": "significant_text", "schema": "bucket",
             "params": {"field": "text", "size": 10, "min_doc_count": 5,
                        "foreground": "source:src0",
                        "customLabel": "tok"}},
        ])).evaluate(docs2)
        return sigtext.select(
            F.lit("sigtext").alias("branch"),
            F.col("tok").alias("key"),
            F.col("doc_count").cast("long").alias("n"),
            F.col("score").cast("double").alias("val"),
        )

    def _adj():
        adj = compile_visualization(_vis([
            {"id": "1", "type": "adjacency_matrix", "schema": "bucket",
             "params": {"filters": {"click": "event_type:click",
                                    "big": "value_i:>=100",
                                    "small": "value_i:<10"},
                        "customLabel": "cell"}},
            {"id": "2", "type": "count", "schema": "metric",
             "params": {"customLabel": "n"}},
            {"id": "3", "type": "sum", "schema": "metric",
             "params": {"field": "value_i", "customLabel": "val"}},
        ])).evaluate(docs)
        return adj.select(
            F.lit("adj").alias("branch"), F.col("cell").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"),
        )

    def _sstats():
        sstats = compile_visualization(_vis([
            {"id": "1", "type": "terms", "schema": "bucket",
             "params": {"field": "lang", "size": 100, "order": "asc",
                        "orderBy": "_term", "customLabel": "lang"}},
            {"id": "2", "type": "string_stats", "schema": "metric",
             "params": {"field": "source", "customLabel": "ss"}},
        ])).evaluate(docs2)
        return sstats.select(
            F.lit("sstats").alias("branch"), F.col("lang").alias("key"),
            F.col("ss_count").cast("long").alias("n"),
            F.round(F.col("ss_entropy"), 4).alias("val"),
        )

    def _vwh():
        vwh = compile_visualization(_vis([
            {"id": "1", "type": "variable_width_histogram",
             "schema": "bucket",
             "params": {"field": "value_i", "buckets": 8,
                        "customLabel": "cent"}},
            {"id": "2", "type": "count", "schema": "metric",
             "params": {"customLabel": "n"}},
            {"id": "3", "type": "max", "schema": "metric",
             "params": {"field": "value_i", "customLabel": "val"}},
        ])).evaluate(docs)
        return vwh.select(
            F.lit("vwh").alias("branch"),
            F.col("cent").cast("decimal(18,6)").cast("string").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"),
        )

    # measured: a thread-pool build (the kibana_stats_tests stance) is
    # SLOWER here — these branches run eager compiler-side pre-pass
    # jobs (auto ladder min/max, vwh Lloyd rounds) that contend rather
    # than overlap — so the branches build sequentially
    branches = [
        f() for f in (_flt, _miss, _auto, _sigtext, _adj, _sstats, _vwh)
    ]
    out = branches[0]
    for b_ in branches[1:]:
        out = out.unionByName(b_)
    return out


@query(
    "kibana_rate_top_metrics",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    db AS (
      SELECT make_timestamp((epoch_us(ts) // 86400000000)
               * 86400000000) AS day, value_i, user_id
      FROM d
    ),
    base AS (
      -- rate factors chosen exact-in-binary: week/day = 7, day/day =
      -- 1, unit-omitted = 1 (rates per the histogram's own interval)
      SELECT day,
             SUM(value_i) * 7.0 AS sum_rate,
             CAST(COUNT(*) AS DOUBLE) AS doc_rate,
             CAST(COUNT(value_i) AS DOUBLE) AS vc_rate
      FROM db GROUP BY day
    ),
    -- exact cumulative_cardinality: a user counts in its FIRST day
    firstd AS (SELECT user_id, MIN(day) AS day FROM db GROUP BY user_id),
    news AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n FROM firstd
             GROUP BY day),
    rates AS (
      SELECT 'rate' AS branch,
             strftime(base.day, '%Y-%m-%d %H:%M:%S') AS key,
             sum_rate, doc_rate, vc_rate,
             SUM(COALESCE(news.n, 0))
               OVER (ORDER BY base.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_users,
             CAST(NULL AS VARCHAR) AS last_v,
             CAST(NULL AS VARCHAR) AS top2
      FROM base LEFT JOIN news ON base.day = news.day
    ),
    ranked AS (
      SELECT event_type, value_i, row_number() OVER (
        PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
      FROM d
    ),
    tm AS (
      SELECT 'top_metrics' AS branch, event_type AS key,
             CAST(NULL AS DOUBLE) AS sum_rate,
             CAST(NULL AS DOUBLE) AS doc_rate,
             CAST(NULL AS DOUBLE) AS vc_rate,
             CAST(NULL AS BIGINT) AS cum_users,
             CAST(CAST(MAX(CASE WHEN rn = 1 THEN value_i END) AS BIGINT)
                  AS VARCHAR) AS last_v,
             string_agg(CAST(CAST(value_i AS BIGINT) AS VARCHAR), ','
                        ORDER BY rn) AS top2
      FROM ranked WHERE rn <= 2 GROUP BY event_type
    )
    SELECT * FROM rates UNION ALL SELECT * FROM tm
    """,
)
def kibana_rate_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round 13 metric-vocabulary tier: the ES ``rate`` agg (per-unit
    rate of a sum / value count / doc count inside each date_histogram
    bucket, scaled by unit/interval against the histogram's RESOLVED
    interval) and ``top_metrics`` (the metric field values of the
    top-N docs by sort — size 1 rides the main aggregation as
    max_by/min_by, size 2 emits a sort-ordered array, rendered here as
    a ','-join for the SQL twin).  Rate units are chosen so every
    factor is exact in binary (week/day = 7, day/day = 1), keeping the
    hashes bit-identical.

    Scale: rate is pure column algebra on the existing hash
    aggregation; top_metrics size>1 is the top_hits bounded rank
    window (row_number <= size per bucket) — no global sort, join-back
    bucket-keyed."""
    docs = _es_docs(spark, sf_dir)
    rates = compile_visualization(_vis([
        {"id": "1", "type": "date_histogram", "schema": "bucket",
         "params": {"field": "ts", "customInterval": "1d",
                    "customLabel": "day"}},
        {"id": "2", "type": "rate", "schema": "metric",
         "params": {"field": "value_i", "unit": "week",
                    "customLabel": "sum_rate"}},
        {"id": "3", "type": "rate", "schema": "metric",
         "params": {"unit": "day", "customLabel": "doc_rate"}},
        {"id": "4", "type": "rate", "schema": "metric",
         "params": {"field": "value_i", "mode": "value_count",
                    "customLabel": "vc_rate"}},
        {"id": "5", "type": "cardinality", "schema": "metric",
         "params": {"field": "user_id", "customLabel": "day_users"}},
        {"id": "6", "type": "cumulative_cardinality", "schema": "metric",
         "params": {"metricAgg": "5", "customLabel": "cum_users"}},
    ])).evaluate(docs, auto_interval_buckets=None)
    rates = rates.select(
        F.lit("rate").alias("branch"),
        F.date_format("day", _TS_FMT).alias("key"),
        F.col("sum_rate").cast("double").alias("sum_rate"),
        F.col("doc_rate").cast("double").alias("doc_rate"),
        F.col("vc_rate").cast("double").alias("vc_rate"),
        F.col("cum_users").cast("long").alias("cum_users"),
        F.lit(None).cast("string").alias("last_v"),
        F.lit(None).cast("string").alias("top2"),
    )
    tm = compile_visualization(_vis([
        {"id": "1", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "etype"}},
        {"id": "2", "type": "top_metrics", "schema": "metric",
         "params": {"fields": ["value_i"], "sortField": "ts",
                    "sortOrder": "desc", "customLabel": "last"}},
        {"id": "3", "type": "top_metrics", "schema": "metric",
         "params": {"fields": ["value_i"], "sortField": "ts",
                    "sortOrder": "desc", "size": 2,
                    "customLabel": "top"}},
    ])).evaluate(docs, tiebreak="event_id")
    tm = tm.select(
        F.lit("top_metrics").alias("branch"),
        F.col("etype").alias("key"),
        F.lit(None).cast("double").alias("sum_rate"),
        F.lit(None).cast("double").alias("doc_rate"),
        F.lit(None).cast("double").alias("vc_rate"),
        F.lit(None).cast("long").alias("cum_users"),
        F.col("last_value_i").cast("string").alias("last_v"),
        F.concat_ws(
            ",", F.transform(F.col("top_value_i"),
                             lambda v: v.cast("string"))
        ).alias("top2"),
    )
    return rates.unionByName(tm)


@query(
    "kibana_matrix_stats",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    -- power sums in DECIMAL(38,6) fixed point — the engine's
    -- partition-order-independent totals; per-row powers are exact
    -- doubles (integral inputs < ~9.7e3)
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value_i AS DECIMAL(38,6))) AS x1,
             SUM(CAST(value_i * value_i AS DECIMAL(38,6))) AS x2,
             SUM(CAST(value_i * value_i * value_i
                      AS DECIMAL(38,6))) AS x3,
             SUM(CAST(value_i * value_i * value_i * value_i
                      AS DECIMAL(38,6))) AS x4,
             SUM(CAST(CAST(user_id AS DOUBLE)
                      AS DECIMAL(38,6))) AS y1,
             SUM(CAST(CAST(user_id AS DOUBLE) * CAST(user_id AS DOUBLE)
                      AS DECIMAL(38,6))) AS y2,
             SUM(CAST(value_i * CAST(user_id AS DOUBLE)
                      AS DECIMAL(38,6))) AS xy
      FROM d
      WHERE value_i IS NOT NULL AND user_id IS NOT NULL
      GROUP BY event_type
    ),
    m AS (
      SELECT event_type, n,
             CAST(x1 AS DOUBLE) / n AS mx,
             CAST(x2 AS DOUBLE)
               - n * (CAST(x1 AS DOUBLE) / n)
                   * (CAST(x1 AS DOUBLE) / n) AS m2x,
             CAST(y1 AS DOUBLE) / n AS my,
             CAST(y2 AS DOUBLE)
               - n * (CAST(y1 AS DOUBLE) / n)
                   * (CAST(y1 AS DOUBLE) / n) AS m2y,
             CAST(xy AS DOUBLE)
               - n * (CAST(x1 AS DOUBLE) / n)
                   * (CAST(y1 AS DOUBLE) / n) AS c2
      FROM s
    )
    SELECT event_type, n AS doc_count,
           round(mx, 6) AS v_mean,
           round(m2x / (n - 1.0), 6) AS v_variance,
           round(my, 6) AS u_mean,
           round(m2y / (n - 1.0), 6) AS u_variance,
           round(c2 / (n - 1.0), 6) AS vu_covariance,
           round(c2 / sqrt(m2x * m2y), 6) AS vu_correlation
    FROM m
    """,
)
def kibana_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``matrix_stats`` (round 14): cross-field covariance /
    correlation with ES's MatrixStatsResults formulas (variance =
    M2/(n−1), covariance = C2/(n−1), correlation = C2/√(M2ᵢM2ⱼ))
    over a terms bucket — the "does consumer lag correlate with
    request rate" panel a metrics user builds.

    Determinism/scale: the moments ride the main hash aggregation as
    Σx..Σx⁴/Σxy power sums carried in DECIMAL(38,6) fixed point —
    per-row powers are exact doubles for these integral fields, and
    the fixed-point SUM is partition-order-independent (AQE / task
    retry safe), so the derived doubles are bit-identical in any
    engine replaying the same formula; outputs additionally rounded
    to 6 decimals.  One scan, one shuffle, no Python.  Skewness /
    kurtosis are exercised by the unit pin (test_matrix_stats,
    hand-computed); this row hashes the covariance family."""
    docs = _es_docs(spark, sf_dir)
    out = compile_visualization(_vis([
        {"id": "1", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "event_type"}},
        {"id": "2", "type": "matrix_stats", "schema": "metric",
         "params": {"fields": ["value_i", "user_id"],
                    "customLabel": "mx"}},
    ])).evaluate(docs)
    return out.select(
        "event_type",
        F.col("mx_doc_count").cast("long").alias("doc_count"),
        F.round("mx_value_i_mean", 6).alias("v_mean"),
        F.round("mx_value_i_variance", 6).alias("v_variance"),
        F.round("mx_user_id_mean", 6).alias("u_mean"),
        F.round("mx_user_id_variance", 6).alias("u_variance"),
        F.round("mx_value_i_user_id_covariance", 6).alias("vu_covariance"),
        F.round("mx_value_i_user_id_correlation", 6).alias("vu_correlation"),
    )


@query(
    "kibana_moving_percentiles",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    b AS (
      SELECT make_timestamp((epoch_us(ts) // 86400000000)
               * 86400000000) AS day, value
      FROM d
    ),
    idx AS (
      SELECT day, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS i
      FROM (SELECT DISTINCT day FROM b)
    ),
    bd AS (SELECT idx.i, b.value FROM b JOIN idx USING (day)),
    cur AS (
      SELECT i, round(quantile_cont(value, 0.5), 4) AS p50,
             round(quantile_cont(value, 0.9), 4) AS p90
      FROM bd GROUP BY i
    ),
    win AS (
      SELECT t.i, round(quantile_cont(s.value, 0.5), 4) AS mp50,
             round(quantile_cont(s.value, 0.9), 4) AS mp90
      FROM idx t LEFT JOIN bd s ON s.i BETWEEN t.i - 3 AND t.i - 1
      GROUP BY t.i
    )
    SELECT strftime(idx.day, '%Y-%m-%d %H:%M:%S') AS day_s,
           cur.p50, cur.p90, win.mp50, win.mp90
    FROM idx JOIN cur USING (i) JOIN win USING (i)
    """,
)
def kibana_moving_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``moving_percentiles`` (round 14): a 3-bucket window sliding
    across the daily histogram, reporting the window's p50/p90 next to
    the per-bucket percentiles — the smoothed-latency-percentile panel.
    ES merges the per-bucket t-digest sketches; this engine is EXACT
    over the window's raw doc values (the documented exact-vs-approx
    stance).  moving_fn shift=0 semantics: the 3 buckets BEFORE the
    current one; the first bucket's empty window emits null.

    Scale shape: the bucket-index map is bucket-table-sized and
    broadcast; each doc explodes into <= window(3) target indices —
    the documented, bounded fan-out — then ONE grouped percentile per
    target bucket; never a corpus-sized window state."""
    docs = _es_docs(spark, sf_dir)
    out = compile_visualization(_vis([
        {"id": "1", "type": "date_histogram", "schema": "bucket",
         "params": {"field": "ts", "customInterval": "1d",
                    "customLabel": "day"}},
        {"id": "2", "type": "percentiles", "schema": "metric",
         "params": {"field": "value", "percents": [50, 90],
                    "customLabel": "p"}},
        {"id": "3", "type": "moving_percentiles", "schema": "metric",
         "params": {"metricAgg": "2", "window": 3, "customLabel": "mp"}},
    ])).evaluate(docs, auto_interval_buckets=None)
    return out.select(
        F.date_format("day", _TS_FMT).alias("day_s"),
        F.round("p_p50", 4).alias("p50"),
        F.round("p_p90", 4).alias("p90"),
        F.round("mp_p50", 4).alias("mp50"),
        F.round("mp_p90", 4).alias("mp90"),
    )


#: the categorize_text log line (shared by the exact and merged rows):
#: events become the ES documents the reference's sink writes, rendered
#: as a log message whose digit-bearing tokens (event id, user id,
#: latency) must never define a category.
def _ct_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _es_docs(spark, sf_dir).withColumn(
        "msg",
        F.concat(
            F.col("event_type"), F.lit(" event "),
            F.col("event_id").cast("string"), F.lit(" for user "),
            F.col("user_id"), F.lit(" took "),
            F.col("value_i").cast("long").cast("string"), F.lit(" ms"),
        ),
    )


_CT_CATS0_SQL = f"""
    WITH d AS ({_ES_DOCS_SQL}),
    msgs AS (
      SELECT event_type || ' event ' || CAST(event_id AS VARCHAR)
               || ' for user ' || user_id || ' took '
               || CAST(value_i AS VARCHAR) || ' ms' AS msg,
             value_i, user_id
      FROM d
    ),
    cats0 AS (
      SELECT array_to_string(
               list_filter(
                 string_split_regex(lower(msg), '[^a-z0-9]+'),
                 t -> t <> '' AND NOT regexp_matches(t, '[0-9]')
               ), ' ') AS cat,
             value_i, user_id
      FROM msgs
    )
"""


@query(
    "kibana_categorize_text",
    f"""
    {_CT_CATS0_SQL},
    cats AS (
      SELECT cat, CAST(COUNT(*) AS BIGINT) AS doc_count,
             AVG(CAST(value_i AS DOUBLE)) AS avg_vi,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM cats0 WHERE cat <> '' GROUP BY cat
    )
    SELECT cat, doc_count, round(avg_vi, 4) AS avg_vi, n_users
    FROM cats ORDER BY doc_count DESC, cat ASC LIMIT 10
    """,
)
def kibana_categorize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``categorize_text``, EXACT patterns (round 14; split from
    the merged branch in round 16 per VERDICT r15 item 3 so each
    workload has its own baseline): log lines bucket by their
    token-sequence pattern after dropping every digit-bearing token
    (ES ML categorization's rule that numbers — ids, latencies,
    timestamps — never define a category); each event_type yields one
    pattern.  Round 16 adds metric sub-aggs (VERDICT r15 item 4): an
    avg and an exact cardinality ride the SAME single hash aggregation
    as the doc_count.

    Scale: scan-local column algebra for the key, ONE hash aggregation,
    TakeOrdered size cut."""
    out = compile_visualization(_vis([
        {"id": "1", "type": "categorize_text", "schema": "bucket",
         "params": {"field": "msg", "size": 10, "customLabel": "cat"}},
        {"id": "2", "type": "avg", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "avg_vi"}},
        {"id": "3", "type": "cardinality", "schema": "metric",
         "params": {"field": "user_id", "customLabel": "n_users"}},
    ])).evaluate(_ct_docs(spark, sf_dir))
    return out.select(
        "cat",
        F.col("doc_count").cast("long").alias("doc_count"),
        F.round("avg_vi", 4).alias("avg_vi"),
        F.col("n_users").cast("long").alias("n_users"),
    )


@query(
    "kibana_categorize_text_merged",
    f"""
    {_CT_CATS0_SQL},
    cats AS (
      SELECT cat, CAST(COUNT(*) AS BIGINT) AS doc_count,
             SUM(CAST(value_i AS DOUBLE)) AS s_vi,
             CAST(COUNT(value_i) AS BIGINT) AS c_vi,
             MAX(CAST(value_i AS DOUBLE)) AS m_vi
      FROM cats0 WHERE cat <> '' GROUP BY cat
    ),
    -- the engine's deterministic similarity merge replayed —
    -- same-length positional similarity >= 0.7, frequency-seeded
    -- attachment (doc_count desc, key asc), 6 pointer-jump
    -- self-compositions (depth 64, the engine's bound), unanimity-
    -- wildcard keys; metric partials (sum/count/max) ride every hop
    pats AS (
      SELECT cat, doc_count, s_vi, c_vi, m_vi,
             string_split(cat, ' ') AS toks,
             len(string_split(cat, ' ')) AS l
      FROM cats
    ),
    prs AS (
      SELECT a.cat AS p, b.cat AS q, b.doc_count AS qc
      FROM pats a JOIN pats b ON a.l = b.l
      WHERE CAST(len(list_filter(range(1, a.l + 1),
            i -> a.toks[i] = b.toks[i])) AS DOUBLE)
            / CAST(a.l AS DOUBLE) >= 0.7
    ),
    rp0 AS (SELECT p, q AS rep FROM (
      SELECT p, q,
             row_number() OVER (PARTITION BY p
                                ORDER BY qc DESC, q ASC) AS rn
      FROM prs) t WHERE rn = 1),
    rp1 AS (SELECT a.p, b.rep FROM rp0 a JOIN rp0 b ON a.rep = b.p),
    rp2 AS (SELECT a.p, b.rep FROM rp1 a JOIN rp1 b ON a.rep = b.p),
    rp3 AS (SELECT a.p, b.rep FROM rp2 a JOIN rp2 b ON a.rep = b.p),
    rp4 AS (SELECT a.p, b.rep FROM rp3 a JOIN rp3 b ON a.rep = b.p),
    rp5 AS (SELECT a.p, b.rep FROM rp4 a JOIN rp4 b ON a.rep = b.p),
    rp6 AS (SELECT a.p, b.rep FROM rp5 a JOIN rp5 b ON a.rep = b.p),
    memb AS (
      SELECT r.rep, pt.toks, pt.l, pt.doc_count,
             pt.s_vi, pt.c_vi, pt.m_vi
      FROM rp6 r JOIN pats pt ON r.p = pt.cat
    ),
    grouped AS (
      SELECT rep, list(toks) AS tls, max(l) AS l,
             sum(doc_count) AS n,
             sum(s_vi) AS s_vi, sum(c_vi) AS c_vi, max(m_vi) AS m_vi
      FROM memb GROUP BY rep
    ),
    mk AS (
      SELECT array_to_string(list_transform(range(1, l + 1),
               i -> CASE WHEN len(list_distinct(
                              list_transform(tls, tk -> tk[i]))) = 1
                    THEN tls[1][i] ELSE '*' END), ' ') AS cat,
             n, s_vi, c_vi, m_vi
      FROM grouped
    ),
    merged AS (
      SELECT cat, CAST(sum(n) AS BIGINT) AS doc_count,
             sum(s_vi) AS s_vi, CAST(sum(c_vi) AS BIGINT) AS c_vi,
             max(m_vi) AS m_vi
      FROM mk GROUP BY cat
    )
    SELECT cat, doc_count,
           round(CASE WHEN c_vi > 0 THEN s_vi / c_vi END, 4) AS avg_vi,
           m_vi AS max_vi
    FROM merged ORDER BY doc_count DESC, cat ASC LIMIT 10
    """,
)
def kibana_categorize_text_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``categorize_text`` with ``similarity_threshold: 70``
    (round 15; its own registry row since round 16 per VERDICT r15
    item 3 — the 2.5× bench step of running a second doc-scale branch
    was hiding inside the exact row's baseline): the engine's
    DETERMINISTIC merge semantic (same-length positional similarity,
    frequency-seeded attachment, pointer-jump closure, unanimity-
    wildcard keys; see CategorizeTextBucket) where ES's drain-style
    algorithm is shard/arrival-order sensitive.  On this corpus the
    five per-type patterns agree on 5/6 positions, so they merge into
    '* event for user took ms'.  Round 16 adds metric sub-aggs
    (VERDICT r15 item 4): avg (sum+count partials) and max merge
    through the rep closure — the oracle replays every partial hop.

    Scale: exact aggregation first collapses the corpus; the merge is
    quadratic in CATEGORIES per token-length (category-scale, never
    doc-scale), and the pointer jumps are self-joins of a
    category-sized relation."""
    out = compile_visualization(_vis([
        {"id": "1", "type": "categorize_text", "schema": "bucket",
         "params": {"field": "msg", "size": 10,
                    "similarity_threshold": 70, "customLabel": "cat"}},
        {"id": "2", "type": "avg", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "avg_vi"}},
        {"id": "3", "type": "max", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "max_vi"}},
    ])).evaluate(_ct_docs(spark, sf_dir))
    return out.select(
        "cat",
        F.col("doc_count").cast("long").alias("doc_count"),
        F.round("avg_vi", 4).alias("avg_vi"),
        F.col("max_vi").alias("max_vi"),
    )


@query(
    "kibana_filter_missing_auto_prod",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    span AS (
      SELECT MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi FROM d
    ),
    iv AS (SELECT {_ES_LADDER_CASE_40} AS iv FROM span)
    SELECT strftime(make_timestamp((epoch_us(d.ts) // i.iv) * i.iv),
                    '%Y-%m-%d %H:%M:%S') AS when_s,
           CAST(COUNT(*) AS BIGINT) AS n, SUM(value_i) AS val
    FROM d, iv i GROUP BY 1
    """,
)
def kibana_filter_missing_auto_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of the round-13 vocabulary row (VERDICT
    r13 item 4): ONE auto_date_histogram branch — a single 1-row
    min/max interval probe + one hash aggregation — split out of the
    seven-branch ``kibana_filter_missing_auto`` attestation row so the
    bench attributes each shape separately; the breadth row keeps
    hashing all seven branches."""
    docs = _es_docs(spark, sf_dir)
    out = compile_visualization(_vis([
        {"id": "1", "type": "auto_date_histogram", "schema": "bucket",
         "params": {"field": "ts", "buckets": 40, "customLabel": "when"}},
        {"id": "2", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "3", "type": "sum", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "val"}},
    ])).evaluate(docs)
    return out.select(
        F.date_format("when", _TS_FMT).alias("when_s"),
        F.col("n").cast("long").alias("n"),
        F.col("val").cast("double").alias("val"),
    )


@query(
    "kibana_query_string_prod",
    """
    SELECT 'complex' AS qs, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    WHERE (lang = 'en' OR lang = 'de') AND source LIKE 'src1%'
    HAVING COUNT(*) > 0
    """,
)
def kibana_query_string_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION shape of the ten-clause Lucene query_string
    attestation row (VERDICT r13 item 4): ONE realistic boolean +
    wildcard clause compiled to a scan-local predicate fused into a
    single hash aggregation — the filter-bar query a dashboard user
    actually types; the breadth row keeps hashing all ten clause
    classes."""
    docs = _t(spark, sf_dir, "documents")
    out = compile_visualization(_vis([
        {"id": "1", "type": "filters", "schema": "bucket",
         "params": {"customLabel": "qs", "filters": [
             {"label": "complex",
              "input": {"query": {"query_string": {
                  "query": "(lang: en OR lang: de) AND source: src1*"}}}},
         ]}},
        {"id": "2", "type": "count", "schema": "metric",
         "params": {"customLabel": "n_docs"}},
        {"id": "3", "type": "sum", "schema": "metric",
         "params": {"field": "n_chars", "customLabel": "sum_chars"}},
    ])).evaluate(docs)
    return out.select(
        "qs", "n_docs", F.col("sum_chars").cast("long").alias("sum_chars")
    )


@query(
    "kibana_stats_tests",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    -- per-side power sums in DECIMAL(38,6) fixed point (the
    -- matrix_stats determinism argument)
    sa AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value_i AS DECIMAL(38,6))) AS s1,
             SUM(CAST(value_i * value_i AS DECIMAL(38,6))) AS s2
      FROM d WHERE event_type = 'click' AND value_i IS NOT NULL
    ),
    sb AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value_i AS DECIMAL(38,6))) AS s1,
             SUM(CAST(value_i * value_i AS DECIMAL(38,6))) AS s2
      FROM d WHERE event_type = 'error' AND value_i IS NOT NULL
    ),
    sp AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value_i - CAST(user_id AS DOUBLE)
                      AS DECIMAL(38,6))) AS s1,
             SUM(CAST((value_i - CAST(user_id AS DOUBLE))
                      * (value_i - CAST(user_id AS DOUBLE))
                      AS DECIMAL(38,6))) AS s2
      FROM d WHERE value_i IS NOT NULL AND user_id IS NOT NULL
    ),
    m AS (
      SELECT sa.n AS na, sb.n AS nb,
             CAST(sa.s1 AS DOUBLE) / sa.n AS ma,
             CAST(sb.s1 AS DOUBLE) / sb.n AS mb,
             (CAST(sa.s2 AS DOUBLE)
               - sa.n * (CAST(sa.s1 AS DOUBLE) / sa.n)
                      * (CAST(sa.s1 AS DOUBLE) / sa.n))
               / (sa.n - 1.0) AS va,
             (CAST(sb.s2 AS DOUBLE)
               - sb.n * (CAST(sb.s1 AS DOUBLE) / sb.n)
                      * (CAST(sb.s1 AS DOUBLE) / sb.n))
               / (sb.n - 1.0) AS vb
      FROM sa, sb
    ),
    w AS (
      SELECT na, nb, va / na AS sea, vb / nb AS seb,
             ma - mb AS dm, va, vb FROM m
    ),
    pm AS (
      SELECT n, CAST(s1 AS DOUBLE) / n AS mean,
             (CAST(s2 AS DOUBLE)
               - n * (CAST(s1 AS DOUBLE) / n)
                   * (CAST(s1 AS DOUBLE) / n)) / (n - 1.0) AS var
      FROM sp
    ),
    smp AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value_i) AS val
      FROM d
      WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':42'),
                                 1, 15)) AS BIGINT) % 1000000 < 100000
      GROUP BY event_type
    ),
    -- diversified_sampler: <= 3 docs per user, lowest md5(id ':' 7)
    -- residues first (id tiebreak) — the engine's QUALIFY twin
    dvs AS (
      SELECT event_type, value_i FROM (
        SELECT event_type, value_i,
               row_number() OVER (
                 PARTITION BY user_id
                 ORDER BY CAST(('0x' || substr(
                     md5(CAST(event_id AS VARCHAR) || ':7'), 1, 15))
                   AS BIGINT) ASC,
                   CAST(event_id AS VARCHAR) ASC) AS rn
        FROM d)
      WHERE rn <= 3
    ),
    dsmp AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(value_i) AS val
      FROM dvs GROUP BY event_type
    ),
    -- frequent_item_sets: exact apriori over field=value items,
    -- CLOSED sets only, support = count/total (division-then-compare
    -- in both engines)
    fb AS (
      SELECT row_number() OVER () AS id, event_type,
             CASE WHEN value_i >= 100 THEN 'big' ELSE 'small' END
               AS vclass,
             'u' || CAST(CAST(user_id AS BIGINT) % 3 AS VARCHAR)
               AS uclass
      FROM d
    ),
    ftot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM fb),
    fitems AS (
      SELECT id, 'event_type=' || event_type AS it FROM fb
        WHERE event_type IS NOT NULL
      UNION ALL SELECT id, 'vclass=' || vclass FROM fb
        WHERE vclass IS NOT NULL
      UNION ALL SELECT id, 'uclass=' || uclass FROM fb
        WHERE uclass IS NOT NULL
    ),
    fl1 AS (
      SELECT it, CAST(COUNT(*) AS BIGINT) AS n FROM fitems GROUP BY it
      HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT t FROM ftot) >= 0.05
    ),
    ffit AS (SELECT id, it FROM fitems
             WHERE it IN (SELECT it FROM fl1)),
    fpr AS (
      SELECT a.id, a.it AS i1, b2.it AS i2
      FROM ffit a JOIN ffit b2 USING (id) WHERE a.it < b2.it
    ),
    fl2 AS (
      SELECT i1, i2, CAST(COUNT(*) AS BIGINT) AS n
      FROM fpr GROUP BY i1, i2
      HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT t FROM ftot) >= 0.05
    ),
    ftr AS (
      SELECT p.id, p.i1, p.i2, c.it AS i3
      FROM fpr p JOIN ffit c USING (id) WHERE c.it > p.i2
    ),
    fl3 AS (
      SELECT i1, i2, i3, CAST(COUNT(*) AS BIGINT) AS n
      FROM ftr GROUP BY i1, i2, i3
      HAVING CAST(COUNT(*) AS DOUBLE) / (SELECT t FROM ftot) >= 0.05
    ),
    fc1 AS (
      SELECT it, n FROM fl1 l WHERE NOT EXISTS (
        SELECT 1 FROM fl2
        WHERE (fl2.i1 = l.it OR fl2.i2 = l.it) AND fl2.n = l.n)
    ),
    fc2 AS (
      SELECT i1, i2, n FROM fl2 l WHERE NOT EXISTS (
        SELECT 1 FROM fl3 WHERE fl3.n = l.n AND
          ((fl3.i1 = l.i1 AND fl3.i2 = l.i2)
           OR (fl3.i1 = l.i1 AND fl3.i3 = l.i2)
           OR (fl3.i2 = l.i1 AND fl3.i3 = l.i2)))
    ),
    fsets AS (
      SELECT it AS key, n FROM fc1
      UNION ALL SELECT i1 || ', ' || i2, n FROM fc2
      UNION ALL SELECT i1 || ', ' || i2 || ', ' || i3, n FROM fl3
    ),
    fis AS (
      SELECT 'fis' AS branch, key, n,
             CAST(n AS DOUBLE) / (SELECT t FROM ftot) AS val
      FROM fsets ORDER BY n DESC, key ASC LIMIT 20
    )
    SELECT 'ttest' AS branch, 'welch_t' AS key,
           CAST(NULL AS BIGINT) AS n,
           round(dm / sqrt(sea + seb), 6) AS val FROM w
    UNION ALL
    SELECT 'ttest', 'welch_df', CAST(NULL AS BIGINT),
           round(((sea + seb) * (sea + seb))
                 / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)), 6)
    FROM w
    UNION ALL
    SELECT 'ttest', 'pooled_t', CAST(NULL AS BIGINT),
           round(dm / sqrt((((na - 1.0) * va + (nb - 1.0) * vb)
                            / (na + nb - 2.0))
                           * (1.0 / na + 1.0 / nb)), 6)
    FROM w
    UNION ALL
    SELECT 'ttest', 'pooled_df', CAST(NULL AS BIGINT), na + nb - 2.0 FROM w
    UNION ALL
    SELECT 'ttest', 'paired_t', CAST(NULL AS BIGINT),
           round(mean / sqrt(var / n), 6) FROM pm
    UNION ALL
    SELECT 'ttest', 'paired_df', CAST(NULL AS BIGINT), n - 1.0 FROM pm
    UNION ALL
    -- round 15: ES's actual returned value — the two-sided p-value
    -- (Student-t CDF of the exact (t, df) pair, recursive-CTE twin of
    -- the engine's Lanczos + continued-fraction Column math)
    SELECT 'ttest', 'welch_p', CAST(NULL AS BIGINT), round(q.p, 6)
    FROM {sql_t_pvalue_ctes(
        "(SELECT dm / sqrt(sea + seb) AS t,"
        " ((sea + seb) * (sea + seb))"
        " / (sea * sea / (na - 1.0) + seb * seb / (nb - 1.0)) AS df"
        " FROM w)", "t", "df")} q
    UNION ALL
    SELECT 'ttest', 'pooled_p', CAST(NULL AS BIGINT), round(q.p, 6)
    FROM {sql_t_pvalue_ctes(
        "(SELECT dm / sqrt((((na - 1.0) * va + (nb - 1.0) * vb)"
        " / (na + nb - 2.0)) * (1.0 / na + 1.0 / nb)) AS t,"
        " na + nb - 2.0 AS df FROM w)", "t", "df")} q
    UNION ALL
    SELECT 'ttest', 'paired_p', CAST(NULL AS BIGINT), round(q.p, 6)
    FROM {sql_t_pvalue_ctes(
        "(SELECT mean / sqrt(var / n) AS t, n - 1.0 AS df FROM pm)",
        "t", "df")} q
    UNION ALL
    SELECT 'sampler', event_type, n, CAST(val AS DOUBLE) FROM smp
    UNION ALL
    SELECT 'dsampler', event_type, n, CAST(val AS DOUBLE) FROM dsmp
    UNION ALL
    SELECT branch, key, n, val FROM fis
    """,
)
def kibana_stats_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``t_test`` + ``random_sampler`` (round 14).  Branch 1-9:
    Welch (ES default), pooled and paired t between the click/error
    populations' value_i (paired pairs value_i with the numeric
    user_id) — the engine emits (t, df) AND, since round 15, ES's
    actual returned value: the two-sided p (Student-t CDF as Column
    math — Lanczos lgamma + incomplete-beta continued fraction,
    ``functions/stats.py`` — replayed in DuckDB by the recursive-CTE
    twin ``sql_t_pvalue_ctes``, so the former documented divergence is
    closed); moments ride the hash agg as DECIMAL(38,6) power
    sums, outputs rounded to 6.  Branch 10+: ``random_sampler`` at
    probability 0.1 / seed 42 over the explicit event_id identity —
    the md5-residue keep-set is bit-reproducible across cluster
    layouts and engines where ES's shard-relative doc-id hash is not
    (the rare_terms/ANN determinism stance); terms + count + sum run
    over the sample and emit RAW sample-scale values — the engine
    never multiplies by 1/probability (the no-scaling stance
    documented on RandomSamplerBucket, ADVICE r14; population
    estimates are a client-side scalar).

    Branch 'dsampler' (r14b, zero-slot extension on this NEW row):
    ``diversified_sampler`` capping the sample at 3 docs PER USER via
    the lowest md5(event_id ':' 7) residues — deterministic where ES
    keeps per-shard top-scored docs; terms + count + sum run over the
    de-dominated sample (the "one hot user must not dominate" agg).

    Scale: all branches are single-scan shapes; random_sampler IS the
    100 TB shape — the scan-local residue filter cuts the
    aggregation's input by 10× before any shuffle — and
    diversified_sampler adds one hash-partitioned rank window whose
    per-key state is a counter, never doc bodies.

    Each branch evaluation re-reads the pruned columnar scan rather
    than sharing a persisted frame — measured FASTER here (7.6 vs
    5.3 s at sf0.1): caching the wide string projection costs more
    than four column-pruned parquet scans; the one persist that pays
    is fis's tiny aggregated set table (compiler-side)."""
    docs = _es_docs(spark, sf_dir)

    def _tt_branch():
        return compile_visualization(_vis([
        {"id": "1", "type": "t_test", "schema": "metric",
         "params": {"a": {"field": "value_i", "filter": "event_type:click"},
                    "b": {"field": "value_i", "filter": "event_type:error"},
                    "customLabel": "welch"}},
        {"id": "2", "type": "t_test", "schema": "metric",
         "params": {"a": {"field": "value_i", "filter": "event_type:click"},
                    "b": {"field": "value_i", "filter": "event_type:error"},
                    "type": "homoscedastic", "customLabel": "pooled"}},
        {"id": "3", "type": "t_test", "schema": "metric",
         "params": {"a": {"field": "value_i"}, "b": {"field": "user_id"},
                    "type": "paired", "customLabel": "paired"}},
    ])).evaluate(docs)

    def _tt_rows():
        tt = _tt_branch()
        # ONE pass unpivots the six t-test outputs — six separate
        # selects from `tt` would recompute the aggregation six times
        # (measured ~3 s of the row's cost before this explode)
        return tt.select(F.explode(F.array(*[
            F.struct(
                F.lit(key).alias("k"), F.round(key, 6).alias("v")
            )
            for key in ("welch_t", "welch_df", "welch_p", "pooled_t",
                        "pooled_df", "pooled_p", "paired_t", "paired_df",
                        "paired_p")
        ])).alias("kv")).select(
            F.lit("ttest").alias("branch"), F.col("kv.k").alias("key"),
            F.lit(None).cast("long").alias("n"),
            F.col("kv.v").alias("val"),
        )

    def _smp_rows():
        smp = compile_visualization(_vis([
        {"id": "1", "type": "random_sampler", "schema": "bucket",
         "params": {"probability": 0.1, "seed": 42,
                    "id_field": "event_id", "customLabel": "s"}},
        {"id": "2", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "etype"}},
        {"id": "3", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "4", "type": "sum", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "val"}},
    ])).evaluate(docs)
        return smp.select(
            F.lit("sampler").alias("branch"), F.col("etype").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"))

    def _dsmp_rows():
        dsmp = compile_visualization(_vis([
        {"id": "1", "type": "diversified_sampler", "schema": "bucket",
         "params": {"field": "user_id", "max_docs_per_value": 3,
                    "seed": 7, "id_field": "event_id",
                    "customLabel": "ds"}},
        {"id": "2", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "etype"}},
        {"id": "3", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "4", "type": "sum", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "val"}},
    ])).evaluate(docs)
        return dsmp.select(
            F.lit("dsampler").alias("branch"), F.col("etype").alias("key"),
            F.col("n").cast("long").alias("n"),
            F.col("val").cast("double").alias("val"))

    def _fis_rows():
        fdocs = docs.withColumn(
            "vclass",
            F.when(F.col("value_i") >= 100, F.lit("big"))
            .otherwise(F.lit("small")),
        ).withColumn(
            "uclass",
            F.concat(
                F.lit("u"),
                (F.col("user_id").cast("long") % 3).cast("string"),
            ),
        )
        fis_out = compile_visualization(_vis([
            {"id": "1", "type": "frequent_item_sets", "schema": "bucket",
             "params": {"fields": ["event_type", "vclass", "uclass"],
                        "minimum_support": 0.05, "size": 20,
                        "customLabel": "set"}},
        ])).evaluate(fdocs)
        return fis_out.select(
            F.lit("fis").alias("branch"), F.col("set").alias("key"),
            F.col("doc_count").cast("long").alias("n"),
            F.col("support").alias("val"))

    # The four branches are independent plan builds (the fis branch
    # also runs its two compiler-side jobs) over the same pruned scan
    # — build them from a thread pool so the driver-side Catalyst
    # analysis overlaps (optimization r16, guide §2.6; py4j releases
    # the GIL on socket waits).  Union order is fixed by the list, so
    # the result is identical to the sequential build.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [
            pool.submit(f)
            for f in (_tt_rows, _smp_rows, _dsmp_rows, _fis_rows)
        ]
        rows = [f.result() for f in futs]
    out = rows[0]
    for r_ in rows[1:]:
        out = out.unionByName(r_)
    return out


# cumulative reference CDF for the ks_test row's fractions variant —
# computed by the SAME Python loop the compiler runs, then injected
# into the oracle as repr() literals so the two engines share the
# exact doubles (0.4 + 0.3 is 0.7000000000000001 in IEEE — spelling
# 0.7 in the SQL would hash-diverge)
_KS_FRACTIONS = (0.4, 0.3, 0.2, 0.1)
_KS_TCDF = []
_cum = 0.0
for _f in _KS_FRACTIONS:
    _cum += _f
    _KS_TCDF.append(_cum / 1.0)


@query(
    "kibana_bucket_correlation",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    b AS (
      SELECT event_type,
             floor(CAST(CAST(user_id AS BIGINT) %4 AS DOUBLE) / 1.0)
               * 1.0 AS ub,
             CAST(COUNT(*) AS BIGINT) AS n,
             AVG(value_i) AS av
      FROM d GROUP BY 1, 2
    ),
    -- per-outer-bucket pivot in ub order: the oracle twin of the
    -- engine's key-sorted array fold (sequential left-to-right sums)
    pv AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CASE WHEN ub = 0.0 THEN CAST(n AS DOUBLE) END) AS c0,
             SUM(CASE WHEN ub = 1.0 THEN CAST(n AS DOUBLE) END) AS c1,
             SUM(CASE WHEN ub = 2.0 THEN CAST(n AS DOUBLE) END) AS c2,
             SUM(CASE WHEN ub = 3.0 THEN CAST(n AS DOUBLE) END) AS c3,
             SUM(CASE WHEN ub = 0.0 THEN av END) AS a0,
             SUM(CASE WHEN ub = 1.0 THEN av END) AS a1,
             SUM(CASE WHEN ub = 2.0 THEN av END) AS a2,
             SUM(CASE WHEN ub = 3.0 THEN av END) AS a3
      FROM b GROUP BY 1
    ),
    -- count_correlation, the engine's membership-Pearson formula with
    -- indicator constants x̄ = 37.5, Σf·e² − x̄² = 718.75 folded like
    -- the compiler folds them (expectations [10,20,40,80], uniform
    -- fractions, doc_count 1e6)
    corr AS (
      SELECT event_type, m,
             (c0 * 10.0 + c1 * 20.0 + c2 * 40.0 + c3 * 80.0) AS sxy,
             (c0 + c1 + c2 + c3) AS nt,
             (a0 * 10.0 + a1 * 20.0 + a2 * 40.0 + a3 * 80.0) AS sxy2,
             (a0 + a1 + a2 + a3) AS nt2
      FROM pv
    ),
    r AS (
      SELECT event_type,
             CASE WHEN m = 4 AND nt > 0 AND nt < 1000000.0 THEN
               (sxy / 1000000.0 - 37.5 * (nt / 1000000.0))
               / sqrt(718.75 * ((nt / 1000000.0)
                                * (1.0 - nt / 1000000.0)))
             END AS corr_c,
             CASE WHEN m = 4 AND nt2 > 0 AND nt2 < 1000000.0 THEN
               (sxy2 / 1000000.0 - 37.5 * (nt2 / 1000000.0))
               / sqrt(718.75 * ((nt2 / 1000000.0)
                                * (1.0 - nt2 / 1000000.0)))
             END AS corr_a
      FROM corr
    )
    SELECT b.event_type, b.ub, b.n, round(b.av, 6) AS av,
           round(r.corr_c, 9) AS corr_c, round(r.corr_a, 9) AS corr_a
    FROM b JOIN r ON b.event_type = r.event_type
    """,
)
def kibana_bucket_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES x-pack ``bucket_correlation`` / ``count_correlation``
    (round 15): per event_type, the membership-Pearson between a
    literal indicator (expectations [10,20,40,80] over a 1e6-doc
    population) and the user_id%4 histogram's doc counts (corr_c) AND
    its avg(value_i) metric sequence (corr_a — the non-count
    buckets_path).

    Scale/determinism: ONE grouped collect of the key-sorted inner
    (key, value) pairs per outer bucket — bucket-table-sized by
    construction — broadcast-joined back; Σe·y and Σy fold over the
    SORTED array (fixed summation order, bit-deterministic for the
    non-integral avg path where a hash-agg double sum is partition-
    order-dependent); indicator moments are compile-time constants.
    The oracle pivots the bucket table and replays the identical
    left-to-right arithmetic."""
    docs = _es_docs(spark, sf_dir).withColumn(
        "ub", (F.col("user_id").cast("long") % 4).cast("double")
    )
    out = compile_visualization(_vis([
        {"id": "1", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "event_type"}},
        {"id": "2", "type": "histogram", "schema": "bucket",
         "params": {"field": "ub", "interval": 1, "customLabel": "ub"}},
        {"id": "3", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "4", "type": "avg", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "av"}},
        {"id": "5", "type": "bucket_correlation", "schema": "metric",
         "params": {"buckets_path": "_count",
                    "function": {"count_correlation": {"indicator": {
                        "expectations": [10, 20, 40, 80],
                        "doc_count": 1000000}}},
                    "customLabel": "corr_c"}},
        {"id": "6", "type": "bucket_correlation", "schema": "metric",
         "params": {"buckets_path": "4",
                    "function": {"count_correlation": {"indicator": {
                        "expectations": [10, 20, 40, 80],
                        "doc_count": 1000000}}},
                    "customLabel": "corr_a"}},
    ])).evaluate(docs)
    return out.select(
        "event_type", "ub", F.col("n").cast("long").alias("n"),
        F.round("av", 6).alias("av"),
        F.round("corr_c", 9).alias("corr_c"),
        F.round("corr_a", 9).alias("corr_a"),
    )


@query(
    "kibana_ks_test",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    b AS (
      SELECT event_type,
             floor(CAST(CAST(user_id AS BIGINT) %4 AS DOUBLE) / 1.0)
               * 1.0 AS ub,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM d GROUP BY 1, 2
    ),
    pv AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS m,
             SUM(CASE WHEN ub = 0.0 THEN CAST(n AS DOUBLE) END) AS c0,
             SUM(CASE WHEN ub = 1.0 THEN CAST(n AS DOUBLE) END) AS c1,
             SUM(CASE WHEN ub = 2.0 THEN CAST(n AS DOUBLE) END) AS c2,
             SUM(CASE WHEN ub = 3.0 THEN CAST(n AS DOUBLE) END) AS c3
      FROM b GROUP BY 1
    ),
    -- ECDF vs reference-CDF max deviations, the engine's sorted fold
    -- replayed: cumulative counts left-to-right, uniform tcdf j/4 and
    -- the fractions tcdf as the SAME Python-computed doubles
    dev AS (
      SELECT event_type, m,
             (c0 + c1 + c2 + c3) AS n,
             greatest((c0) / (c0 + c1 + c2 + c3) - 1.0 / 4.0,
                      (c0 + c1) / (c0 + c1 + c2 + c3) - 2.0 / 4.0,
                      (c0 + c1 + c2) / (c0 + c1 + c2 + c3) - 3.0 / 4.0,
                      (c0 + c1 + c2 + c3) / (c0 + c1 + c2 + c3)
                        - 4.0 / 4.0) AS udp,
             greatest(1.0 / 4.0 - (c0) / (c0 + c1 + c2 + c3),
                      2.0 / 4.0 - (c0 + c1) / (c0 + c1 + c2 + c3),
                      3.0 / 4.0 - (c0 + c1 + c2) / (c0 + c1 + c2 + c3),
                      4.0 / 4.0 - (c0 + c1 + c2 + c3)
                        / (c0 + c1 + c2 + c3)) AS udm,
             greatest((c0) / (c0 + c1 + c2 + c3) - {_KS_TCDF[0]!r},
                      (c0 + c1) / (c0 + c1 + c2 + c3) - {_KS_TCDF[1]!r},
                      (c0 + c1 + c2) / (c0 + c1 + c2 + c3)
                        - {_KS_TCDF[2]!r},
                      (c0 + c1 + c2 + c3) / (c0 + c1 + c2 + c3)
                        - {_KS_TCDF[3]!r}) AS fdp,
             greatest({_KS_TCDF[0]!r} - (c0) / (c0 + c1 + c2 + c3),
                      {_KS_TCDF[1]!r} - (c0 + c1) / (c0 + c1 + c2 + c3),
                      {_KS_TCDF[2]!r} - (c0 + c1 + c2)
                        / (c0 + c1 + c2 + c3),
                      {_KS_TCDF[3]!r} - (c0 + c1 + c2 + c3)
                        / (c0 + c1 + c2 + c3)) AS fdm
      FROM pv
    ),
    lamt AS (
      SELECT event_type, m, n, udp, udm, fdp, fdm,
             sqrt(n) * greatest(udp, udm) AS lam,
             sqrt(n) * greatest(fdp, fdm) AS lam2
      FROM dev
    ),
    p2 AS (
      SELECT event_type,
             CASE WHEN m = 4 AND n > 0 THEN
               round(least(exp(-2.0 * n * udp * udp), 1.0), 6)
             END AS ks_u_greater,
             CASE WHEN m = 4 AND n > 0 THEN
               round(least(exp(-2.0 * n * udm * udm), 1.0), 6)
             END AS ks_u_less,
             CASE WHEN m = 4 AND n > 0 THEN
               round({_SQL_KS_TWO("lam")}, 6)
             END AS ks_u_two_sided,
             CASE WHEN m = 4 AND n > 0 THEN
               round(least(exp(-2.0 * n * fdp * fdp), 1.0), 6)
             END AS ks_f_greater,
             CASE WHEN m = 4 AND n > 0 THEN
               round({_SQL_KS_TWO("lam2")}, 6)
             END AS ks_f_two_sided
      FROM lamt
    )
    SELECT * FROM p2
    """,
)
def kibana_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES x-pack ``bucket_count_ks_test`` (round 15): per event_type,
    the one-sample KS of the user_id%4 histogram's doc-count ECDF
    against (a) the uniform reference — less / greater / two_sided —
    and (b) explicit fractions [0.4,0.3,0.2,0.1] — greater /
    two_sided.  One-sided p = exp(−2nD²); two-sided = the Kolmogorov
    dual series (functions/stats.py), SQL twin via
    ``sql_ks_two_sided_p``.  ``sampling_method: "uniform"`` is
    explicit — ES's default upper_tail reweighting rejects loudly
    (documented divergence).

    Scale: the same ONE grouped key-sorted collect per outer bucket as
    bucket_correlation (bucket-table-sized, broadcast join-back, no
    window); all p math is post-aggregation Column algebra."""
    docs = _es_docs(spark, sf_dir).withColumn(
        "ub", (F.col("user_id").cast("long") % 4).cast("double")
    )
    out = compile_visualization(_vis([
        {"id": "1", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "event_type"}},
        {"id": "2", "type": "histogram", "schema": "bucket",
         "params": {"field": "ub", "interval": 1, "customLabel": "ub"}},
        {"id": "3", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "4", "type": "bucket_count_ks_test", "schema": "metric",
         "params": {"buckets_path": "_count",
                    "sampling_method": "uniform",
                    "customLabel": "ks_u"}},
        {"id": "5", "type": "bucket_count_ks_test", "schema": "metric",
         "params": {"buckets_path": "_count",
                    "sampling_method": "uniform",
                    "fractions": list(_KS_FRACTIONS),
                    "alternative": ["greater", "two_sided"],
                    "customLabel": "ks_f"}},
    ])).evaluate(docs)
    return out.select(
        "event_type",
        F.round("ks_u_greater", 6).alias("ks_u_greater"),
        F.round("ks_u_less", 6).alias("ks_u_less"),
        F.round("ks_u_two_sided", 6).alias("ks_u_two_sided"),
        F.round("ks_f_greater", 6).alias("ks_f_greater"),
        F.round("ks_f_two_sided", 6).alias("ks_f_two_sided"),
    ).distinct()


@query(
    "kibana_sampler",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    -- deterministic sampler twin: the 500 lowest md5(id ':' seed)
    -- residues, id tiebreak — the engine's TakeOrdered replayed
    smp AS (
      SELECT * FROM d
      ORDER BY CAST(('0x' || substr(
                 md5(CAST(event_id AS VARCHAR) || ':11'), 1, 15))
               AS BIGINT) ASC,
               CAST(event_id AS VARCHAR) ASC
      LIMIT 500
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(value_i) AS val
    FROM smp GROUP BY 1
    """,
)
def kibana_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES plain ``sampler`` (round 15): terms + count + sum run over
    the 500 "best" documents — deterministic residue top-k (lowest
    md5(event_id ':' 11), id tiebreak) where ES keeps per-shard
    top-SCORED docs (dataclass docstring documents the divergence;
    the random_/diversified_sampler determinism stance).

    Scale: ONE TakeOrderedAndProject at k = shard_size — per-task
    bounded heaps, no full sort, no shuffle of the corpus; the
    downstream aggregation reads <= 500 rows at any corpus size
    (ES's own "bound the expensive sub-agg" intent)."""
    docs = _es_docs(spark, sf_dir)
    out = compile_visualization(_vis([
        {"id": "1", "type": "sampler", "schema": "bucket",
         "params": {"shard_size": 500, "seed": 11,
                    "id_field": "event_id", "customLabel": "s"}},
        {"id": "2", "type": "terms", "schema": "bucket",
         "params": {"field": "event_type", "size": 100, "order": "asc",
                    "orderBy": "_term", "customLabel": "event_type"}},
        {"id": "3", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "4", "type": "sum", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "val"}},
    ])).evaluate(docs)
    return out.select(
        "event_type", F.col("n").cast("long").alias("n"),
        F.col("val").cast("double").alias("val"),
    )


# ip_range oracle constants, derived from stdlib ipaddress (the same
# parse the engine uses) so the twin can never drift: the v4-mapped
# base ::ffff:0:0 and the 2001:db8:: prefix base.
import ipaddress as _ipaddress  # noqa: E402

_IP_V4MAP = int(_ipaddress.ip_address("::ffff:0:0"))
_IP_DB8_BASE = int(_ipaddress.ip_address("2001:db8::"))


@query(
    "kibana_ip_range",
    f"""
    WITH d AS ({_ES_DOCS_SQL}),
    -- the engine's 128-bit mapped-space conversion replayed (round 16:
    -- v4 and v6 share Lucene's space, v4 at ::ffff:a.b.c.d =
    -- {_IP_V4MAP} + u32): docs alternate by event_id % 3 between a
    -- plain dotted-quad, the SAME address spelled ::ffff:..., and a
    -- 2001:db8::x:y v6; endpoints are the parse-time ipaddress
    -- conversions (HUGEINT holds the sub-2^127 constants used here)
    ips AS (
      SELECT event_type, value_i,
             CASE WHEN CAST(event_id AS BIGINT) % 3 = 2
               THEN CAST('{_IP_DB8_BASE}' AS HUGEINT)
                    + (CAST(user_id AS BIGINT) % 65536) * 65536
                    + (CAST(event_id AS BIGINT) % 65536)
               ELSE CAST('{_IP_V4MAP}' AS HUGEINT) + 167772160
                    + (CAST(user_id AS BIGINT) % 200) * 65536
                    + (CAST(value_i AS BIGINT) % 250) * 256
                    + (CAST(event_id AS BIGINT) % 256)
             END AS ipn
      FROM d
    ),
    m AS (
      SELECT r.key, i.value_i
      FROM ips i
      JOIN (VALUES
        ('10.0.0.0-10.100.0.0', CAST('{_IP_V4MAP + 167772160}' AS HUGEINT),
                                CAST('{_IP_V4MAP + 174325760}' AS HUGEINT)),
        ('10.64.0.0/10',        CAST('{_IP_V4MAP + 171966464}' AS HUGEINT),
                                CAST('{_IP_V4MAP + 176160768}' AS HUGEINT)),
        ('low',                 NULL,
                                CAST('{_IP_V4MAP + 171048960}' AS HUGEINT)),
        ('10.10.0.0-*',         CAST('{_IP_V4MAP + 168427520}' AS HUGEINT),
                                NULL),
        ('2001:db8::/32',       CAST('{_IP_DB8_BASE}' AS HUGEINT),
                                CAST('{_IP_DB8_BASE + (1 << 96)}' AS HUGEINT)),
        ('lower-half-db8',      CAST('{_IP_DB8_BASE}' AS HUGEINT),
                                CAST('{_IP_DB8_BASE + 0x8000 * 65536}' AS HUGEINT))
      ) r(key, lo, hi)
      ON (r.lo IS NULL OR i.ipn >= r.lo)
         AND (r.hi IS NULL OR i.ipn < r.hi)
    )
    SELECT key AS r, CAST(COUNT(*) AS BIGINT) AS n,
           SUM(value_i) AS val
    FROM m GROUP BY 1
    """,
)
def kibana_ip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES ``ip_range`` (round 15; IPv6 + cross-family since round 16,
    VERDICT r15 item 5): from/to AND CIDR-mask ranges over a derived
    IP column that cycles through THREE spellings by event_id % 3 —
    plain 10.{user_id%200}.{value_i%250}.{event_id%256}, the same
    address as v4-mapped ``::ffff:...`` text (must bucket identically:
    one unified 128-bit space, like ES), and a
    ``2001:db8::{{user_id%65536:x}}:{{event_id%65536:x}}`` IPv6.
    Half-open endpoints, overlap-explode, ES key conventions (mask
    string / from-to / custom key); the open-ended ``10.10.0.0-*``
    range also captures every v6 doc — the unified-space semantic ES
    itself has.

    Scale: the address parse is scan-local column math ONCE per doc
    (dotted horner or v6 split/pad/conv into two biased 64-bit words);
    ranges are parse-time integer literals, so the bucket explode is
    the exact RangeBucket cost shape — no UDF, no join, one hash
    aggregation."""
    docs = _es_docs(spark, sf_dir)
    v4 = F.concat_ws(
        ".",
        F.lit("10"),
        (F.col("user_id").cast("long") % 200).cast("string"),
        (F.col("value_i").cast("long") % 250).cast("string"),
        (F.col("event_id").cast("long") % 256).cast("string"),
    )
    docs = docs.withColumn(
        "ip",
        F.when(F.col("event_id").cast("long") % 3 == 2,
               F.format_string(
                   "2001:db8::%x:%x",
                   F.col("user_id").cast("long") % 65536,
                   F.col("event_id").cast("long") % 65536,
               ))
        .when(F.col("event_id").cast("long") % 3 == 1,
              F.concat(F.lit("::ffff:"), v4))
        .otherwise(v4),
    )
    out = compile_visualization(_vis([
        {"id": "1", "type": "ip_range", "schema": "bucket",
         "params": {"field": "ip", "ranges": [
             {"from": "10.0.0.0", "to": "10.100.0.0"},
             {"mask": "10.64.0.0/10"},
             {"key": "low", "to": "10.50.0.0"},
             {"from": "10.10.0.0"},
             {"mask": "2001:db8::/32"},
             {"key": "lower-half-db8", "from": "2001:db8::",
              "to": "2001:db8::8000:0"},
         ], "customLabel": "r"}},
        {"id": "2", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
        {"id": "3", "type": "sum", "schema": "metric",
         "params": {"field": "value_i", "customLabel": "val"}},
    ])).evaluate(docs)
    return out.select(
        "r", F.col("n").cast("long").alias("n"),
        F.col("val").cast("double").alias("val"),
    )
