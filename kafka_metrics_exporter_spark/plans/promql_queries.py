"""Oracle-checked queries driven through the PromQL front end
(promql/): the reference's dashboards speak PromQL (49 expressions,
Prometheus/jmxexporter_configs/grafana/dashboards/*.json), so these
entries compile corpus-shaped expression STRINGS with
promql.compile_promql and evaluate them against a metrics-shaped view
of the events table — proving the text→plan→result path end-to-end
against DuckDB SQL that re-implements the PromQL semantics by hand.

The metrics view rolls events up to a scrape-aligned grid
(name=event_type, label=user_id, one sample per grain): dashboards
always query step-aligned series, and the grid gives vector arithmetic
its cross-series ts alignment.  The sample value is the event COUNT
per cell (a message counter, like the corpus's *_total metrics) —
counts are exact in double, so every derived rate/sum is bit-identical
across engines regardless of each engine's summation order (a
SUM(value) cell sample diverged by 1 ulp and flipped a round(4)
boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.plans.queries import _TS_FMT, _r4, _t, query
from kafka_metrics_exporter_spark.promql import compile_promql


def _finish_cached(out: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize the (small) final frame once with an eager
    localCheckpoint, then release the shared persisted views backing it
    (ADVICE r5: queries that persist()'d their metrics view leaked the
    cache into executor memory for the rest of the 91-query suite —
    unpersisting before materialization would instead discard the
    shared-scan benefit).  The checkpoint blocks are result-sized and
    reclaimed by the ContextCleaner once the frame is dropped."""
    from kafka_metrics_exporter_spark.plans.fingerprint import (
        stash_pre_checkpoint,
    )

    checkpointed = out.localCheckpoint(eager=True)
    for c in cached:
        c.unpersist()
    # the checkpoint scan hides the real plan from post-hoc explain —
    # stash the logical frame so plan pins / PLANS.json fingerprint the
    # plan that actually executed (best-effort helper, falls back to
    # the checkpointed frame's plan if the attribute can't be set)
    return stash_pre_checkpoint(checkpointed, out)


def _metrics_view(spark: SparkSession, sf_dir: str, grain: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("name"),
        F.col("user_id").cast("string").alias("user_id"),
        F.date_trunc(grain, F.col("ts")).alias("ts"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))


_METRICS_SQL = """
      SELECT event_type AS name, CAST(user_id AS VARCHAR) AS user_id,
             date_trunc('{grain}', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2, 3
"""

# max_gap_us mirrors the compiler's range-window guard: a successive
# pair farther apart than the PromQL window yields no rate point.
_RATE_SQL = """
      SELECT user_id, ts,
             (CASE WHEN value >= pv THEN value - pv ELSE value END)
               / ((epoch_us(ts) - epoch_us(pts)) / 1000000.0) AS value
      FROM (
        SELECT user_id, ts, value,
               lag(value) OVER w AS pv, lag(ts) OVER w AS pts
        FROM {src} WINDOW w AS (PARTITION BY user_id ORDER BY ts)
      ) WHERE pts IS NOT NULL AND epoch_us(ts) > epoch_us(pts)
        AND epoch_us(ts) - epoch_us(pts) <= {max_gap_us}
"""


@query(
    "promql_topk_rate",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click' AND user_id <> ''),
    rate AS ({_RATE_SQL.format(src="c", max_gap_us=2 * 3600 * 1000000)}),
    tk AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY ts
                                ORDER BY value DESC, user_id ASC) AS rn
      FROM rate
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(SUM(value), 4) AS value
    FROM tk WHERE rn <= 3
    GROUP BY user_id, ts
    """,
)
def promql_topk_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (user_id) (topk(3, rate(click{user_id!=""}[2h])))` — the
    corpus's sum-of-topk-of-rate shape (reference
    Kafka_Brokers_Dashboard.json:1046) compiled from the PromQL string.
    The oracle hand-implements the same pinned semantics (successive-
    delta rate with reset clamp, per-instant topk with label
    tiebreaker)."""
    plan = compile_promql('sum by (user_id) (topk(3, rate(click{user_id!=""}[2h])))')
    out = plan.evaluate(_metrics_view(spark, sf_dir, "hour"))
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        _r4(F.col("value")).alias("value"),
    )


@query(
    "promql_vector_math",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="day")}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    v AS (SELECT * FROM m WHERE name = 'view'),
    rc AS ({_RATE_SQL.format(src="c", max_gap_us=2 * 86400 * 1000000)}),
    rv AS ({_RATE_SQL.format(src="v", max_gap_us=2 * 86400 * 1000000)}),
    summed AS (
      SELECT rc.user_id, rc.ts, SUM(rc.value + rv.value) AS value
      FROM rc JOIN rv ON rc.user_id = rv.user_id AND rc.ts = rv.ts
      GROUP BY rc.user_id, rc.ts
    ),
    scaled AS (SELECT user_id, ts, value / 1024 AS value FROM summed),
    tk AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY ts
                                ORDER BY value DESC, user_id ASC) AS rn
      FROM scaled
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(value, 6) AS value
    FROM tk WHERE rn <= 5
    """,
)
def promql_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`topk(5, sum by (user_id) (rate(click[2d]) + rate(view[2d])) /
    1024)` — the corpus's topk-of-summed-rates-with-unit-scaling shape
    (reference Kafka_Connect_Dashboard.json:1062).  Exercises vector-
    vector `+` (equi-join on shared labels + ts), scalar division, agg,
    and per-instant ranking, all compiled from the string."""
    plan = compile_promql(
        "topk(5, sum by (user_id) (rate(click[2d]) + rate(view[2d])) / 1024)"
    )
    out = plan.evaluate(_metrics_view(spark, sf_dir, "day"))
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.round(F.col("value"), 6).alias("value"),
    )


_STEP_US = 1800 * 1_000_000  # 30m grid step
_WIN_US = 7200 * 1_000_000  # [2h] range window

def _xrate_ctes(step_us: int, win_us: int) -> str:
    """Shared CTE chain ending in ``xr(user_id, t_us, value)`` — the
    grid-mode extrapolated rate of click{user_id!=""}[win] at the given
    step, replicated operation-for-operation from promql/range_eval.py
    so the doubles are bit-identical.  Used by promql_rate_extrapolated
    and the composite grid oracles (topk-of-rate)."""
    win_s = win_us / 1_000_000.0
    return f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT user_id, epoch_us(ts) AS s_us, value
          FROM m WHERE name = 'click' AND user_id <> ''),
    r AS (
      SELECT user_id, s_us, value, lag(value) OVER w AS pv
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY s_us)
    ),
    cor AS (
      SELECT user_id, s_us, value,
             value + SUM(CASE WHEN pv IS NOT NULL AND value < pv
                              THEN pv ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS corrected
      FROM r
    ),
    b AS (
      SELECT ((MIN(epoch_us(ts)) + {step_us} - 1) // {step_us}) * {step_us}
               AS g_lo,
             (MAX(epoch_us(ts)) // {step_us}) * {step_us} AS g_hi
      FROM m
    ),
    x AS (
      SELECT user_id, s_us, value, corrected,
             unnest(range(t_lo, t_hi + 1, {step_us})) AS t_us
      FROM (
        SELECT cor.*,
               greatest(((s_us + {step_us} - 1) // {step_us}) * {step_us},
                        b.g_lo) AS t_lo,
               least(((s_us + {win_us} - 1) // {step_us}) * {step_us},
                     b.g_hi) AS t_hi
        FROM cor, b
      ) WHERE t_lo <= t_hi
    ),
    g AS (
      SELECT user_id, t_us,
             COUNT(*) AS cnt,
             MIN(s_us) AS first_us, MAX(s_us) AS last_us,
             arg_min(corrected, s_us) AS first_c,
             arg_max(corrected, s_us) AS last_c,
             arg_min(value, s_us) AS first_raw
      FROM x GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    e AS (
      SELECT user_id, t_us,
             last_c - first_c AS raw_delta,
             (last_us - first_us) / 1000000.0 AS sampled,
             (first_us - (t_us - {win_us})) / 1000000.0 AS dur_start,
             (t_us - last_us) / 1000000.0 AS dur_end,
             ((last_us - first_us) / 1000000.0) / CAST(cnt - 1 AS DOUBLE)
               AS avg_dur,
             first_raw
      FROM g
    ),
    f AS (
      SELECT user_id, t_us, raw_delta, sampled, dur_end, avg_dur,
             CASE WHEN raw_delta > 0 AND first_raw >= 0
                       AND sampled * (first_raw / raw_delta) < dur_start
                  THEN sampled * (first_raw / raw_delta)
                  ELSE dur_start END AS dur_start2
      FROM e
    ),
    xr AS (
      SELECT user_id, t_us,
             raw_delta * ((sampled
               + (CASE WHEN dur_start2 >= avg_dur * 1.1
                       THEN avg_dur / 2.0 ELSE dur_start2 END)
               + (CASE WHEN dur_end >= avg_dur * 1.1
                       THEN avg_dur / 2.0 ELSE dur_end END))
               / sampled) / {win_s} AS value
      FROM f
    )
"""


@query(
    "promql_rate_extrapolated",
    _xrate_ctes(_STEP_US, _WIN_US)
    + """
    SELECT user_id,
           strftime(make_timestamp(t_us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           value
    FROM xr
    """,
)
def promql_rate_extrapolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(click{user_id!=""}[2h])` in RANGE-QUERY mode (30 m step
    grid): Prometheus's window-extrapolated counter rate — reset-
    corrected first→last delta per ``(t-2h, t]`` window, edge
    extrapolation with the 1.1×-average-spacing threshold and the
    counter-zero cap, divided by the window (the semantics behind every
    `rate(...[1m|5m])` panel in the reference's
    Kafka_Brokers_Dashboard.json:540,949,1778).  The DuckDB twin
    replicates the sample→instant expansion and the extrapolation
    arithmetic operation-for-operation, so the doubles match
    bit-for-bit before the comparison layer's rounding."""
    plan = compile_promql('rate(click{user_id!=""}[2h])')
    out = plan.evaluate_range(
        _metrics_view(spark, sf_dir, "hour"), step_seconds=1800.0
    )
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


@query(
    "promql_rate_instant",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT user_id, epoch_us(ts) AS s_us, value
          FROM m WHERE name = 'click' AND user_id <> ''),
    r AS (
      SELECT user_id, s_us, value, lag(value) OVER w AS pv
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY s_us)
    ),
    cor AS (
      SELECT user_id, s_us, value,
             value + SUM(CASE WHEN pv IS NOT NULL AND value < pv
                              THEN pv ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY s_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS corrected
      FROM r
    ),
    g AS (
      SELECT user_id, s_us, corrected AS last_c,
             COUNT(*) OVER w AS cnt,
             first_value(s_us) OVER w AS first_us,
             first_value(corrected) OVER w AS first_c,
             first_value(value) OVER w AS first_raw
      FROM cor
      WINDOW w AS (PARTITION BY user_id ORDER BY s_us
                   RANGE BETWEEN {_WIN_US - 1} PRECEDING AND CURRENT ROW)
    ),
    e AS (
      SELECT user_id, s_us,
             last_c - first_c AS raw_delta,
             (s_us - first_us) / 1000000.0 AS sampled,
             (first_us - (s_us - {_WIN_US})) / 1000000.0 AS dur_start,
             ((s_us - first_us) / 1000000.0) / CAST(cnt - 1 AS DOUBLE)
               AS avg_dur,
             first_raw
      FROM g WHERE cnt >= 2
    ),
    f AS (
      SELECT user_id, s_us, raw_delta, sampled, avg_dur,
             CASE WHEN raw_delta > 0 AND first_raw >= 0
                       AND sampled * (first_raw / raw_delta) < dur_start
                  THEN sampled * (first_raw / raw_delta)
                  ELSE dur_start END AS dur_start2
      FROM e
    )
    SELECT user_id,
           strftime(make_timestamp(s_us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           raw_delta * ((sampled
             + (CASE WHEN dur_start2 >= avg_dur * 1.1
                     THEN avg_dur / 2.0 ELSE dur_start2 END))
             / sampled) / {_WIN_US / 1_000_000.0} AS value
    FROM f
    """,
)
def promql_rate_instant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate(click{user_id!=""}[2h])` in sample-instant mode with the
    OPT-IN extrapolated kernel (``evaluate(..., extrapolated_rate=
    True)``, round 12 — VERDICT r11 item 6 closing the last PromQL
    divergence): Prometheus's extrapolatedRate evaluated at each sample
    timestamp, so the (t-2h, t] window always ends ON a sample and only
    the start edge extrapolates (dur_end ≡ 0).  Distinct from
    promql_rate_extrapolated (same kernel on a 30 m step GRID with both
    edges live) and from every other rate row (pinned successive-delta
    kernel).  The DuckDB twin hand-computes the same reset-corrected
    cumulative counter and a RANGE-frame window over integer micros,
    operation for operation, so the doubles are bit-identical before
    the comparison layer's rounding."""
    plan = compile_promql('rate(click{user_id!=""}[2h])')
    out = plan.evaluate(
        _metrics_view(spark, sf_dir, "hour"), extrapolated_rate=True
    )
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


@query(
    "promql_topk_rate_grid",
    _xrate_ctes(7200 * 1_000_000, 2 * 86400 * 1_000_000)
    + """
    , tk AS (
      SELECT user_id, t_us, value,
             row_number() OVER (PARTITION BY t_us
                                ORDER BY value DESC, user_id ASC) AS rn
      FROM xr
    )
    SELECT user_id,
           strftime(make_timestamp(t_us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(SUM(value), 4) AS value
    FROM tk WHERE rn <= 3
    GROUP BY user_id, t_us
    """,
)
def promql_topk_rate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (user_id) (topk(3, rate(click{user_id!=""}[2d])))` in
    RANGE-QUERY mode — the corpus's sum-of-topk-of-rate panel shape
    (reference Kafka_Brokers_Dashboard.json:1046) evaluated on a 2 h
    step grid with a [2d] window (wide enough that dozens of series
    qualify per instant and topk(3) genuinely cuts), proving the
    composite structural nodes (topk ranking, aggregation) compose over
    window-extrapolated grid leaves exactly as they do over sample
    instants.  The oracle stacks per-instant ranking + grouping on the
    shared bit-identical xr CTE."""
    plan = compile_promql(
        'sum by (user_id) (topk(3, rate(click{user_id!=""}[2d])))'
    )
    out = plan.evaluate_range(
        _metrics_view(spark, sf_dir, "hour"), step_seconds=7200.0
    )
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        _r4(F.col("value")).alias("value"),
    )


@query(
    "promql_quantile_agg",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click')
    SELECT strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(quantile_cont(value, 0.9), 4) AS value
    FROM c GROUP BY ts
    """,
)
def promql_quantile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`quantile(0.9, click)` — the cross-series percentile at each
    instant, compiled from the string; DuckDB's quantile_cont is the
    same interpolated definition as Spark's percentile (parity already
    pinned by a11)."""
    plan = compile_promql("quantile(0.9, click)")
    out = plan.evaluate(_metrics_view(spark, sf_dir, "hour"))
    return out.select(
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        _r4(F.col("value")).alias("value"),
    )


@query(
    "promql_histogram_quantile",
    """
    WITH g AS (
      SELECT event_type, date_trunc('hour', ts) AS ts,
             CAST(COUNT(*) FILTER (value <= 50)  AS DOUBLE) AS c50,
             CAST(COUNT(*) FILTER (value <= 100) AS DOUBLE) AS c100,
             CAST(COUNT(*) FILTER (value <= 200) AS DOUBLE) AS c200,
             CAST(COUNT(*) AS DOUBLE) AS cinf
      FROM events GROUP BY 1, 2
    ),
    r AS (SELECT *, 0.9 * cinf AS rank FROM g WHERE cinf > 0)
    SELECT event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(CASE
             WHEN c50 >= rank  THEN 0.0 + (50.0 - 0.0) * (rank - 0.0) / (c50 - 0.0)
             WHEN c100 >= rank THEN 50.0 + (100.0 - 50.0) * (rank - c50) / (c100 - c50)
             WHEN c200 >= rank THEN 100.0 + (200.0 - 100.0) * (rank - c100) / (c200 - c100)
             ELSE 200.0
           END, 4) AS value
    FROM r
    """,
)
def promql_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`histogram_quantile(0.9, ev_bucket)` compiled from the string
    over cumulative le-buckets built from events (le ∈ {50,100,200,
    +Inf} per (event_type, hour)) — the oracle hand-implements
    Prometheus's interpolation rules as a CASE chain with the exact
    same operand order, so the doubles match bit-for-bit."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("ts")
    ).agg(
        F.count_if(F.col("value") <= 50).cast("double").alias("c50"),
        F.count_if(F.col("value") <= 100).cast("double").alias("c100"),
        F.count_if(F.col("value") <= 200).cast("double").alias("c200"),
        F.count(F.lit(1)).cast("double").alias("cinf"),
    )
    buckets = g.select(
        F.lit("ev_bucket").alias("name"),
        "ts",
        "event_type",
        F.explode(
            F.map_from_arrays(
                F.array(F.lit("50"), F.lit("100"), F.lit("200"), F.lit("+Inf")),
                F.array("c50", "c100", "c200", "cinf"),
            )
        ).alias("le", "value"),
    )
    out = compile_promql("histogram_quantile(0.9, ev_bucket)").evaluate(buckets)
    return out.select(
        "event_type",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        _r4(F.col("value")).alias("value"),
    )


@query(
    "promql_deriv_predict",
    """
    WITH m AS (
      SELECT event_type AS name, CAST(user_id AS VARCHAR) AS user_id,
             date_trunc('day', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2, 3
    ),
    f AS (SELECT * FROM m WHERE name = 'click'),
    x AS (
      SELECT user_id, ts, value,
             (epoch_us(ts) - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
               / 1000000.0 AS x
      FROM f
    ),
    -- textbook regression sums over the trailing 7d range, mirroring
    -- the engine's explicit-sum formula operation for operation: on
    -- the daily grid every sum is an exact double, so slope and the
    -- prediction are bit-identical across engines
    s AS (
      SELECT user_id, ts, x,
             COUNT(*) OVER w * 1.0 AS n,
             SUM(x) OVER w AS sx, SUM(value) OVER w AS sy,
             SUM(x * value) OVER w AS sxy, SUM(x * x) OVER w AS sxx
      FROM x
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 604799999999 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(sy / n + ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                          * (x + 86400.0 - sx / n), 4) AS value
    FROM s WHERE n * sxx - sx * sx > 0
    """,
)
def promql_deriv_predict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`predict_linear(click[7d], 86400)` — tomorrow's projected daily
    click count per user from a least-squares fit over the trailing
    week — compiled from the string.  The engine computes the slope
    from explicit window sums (see _eval_deriv) so the DuckDB twin's
    identical formula yields bit-identical doubles on the daily grid."""
    m = _metrics_view(spark, sf_dir, "day")
    out = compile_promql("predict_linear(click[7d], 86400)").evaluate(m)
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        _r4(F.col("value")).alias("value"),
    )


@query(
    "promql_resets_changes",
    """
    WITH m AS (
      SELECT event_type AS name, CAST(user_id AS VARCHAR) AS user_id,
             date_trunc('hour', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2, 3
    ),
    f AS (SELECT * FROM m WHERE name = 'click'),
    p AS (
      SELECT user_id, ts, value,
             lag(value) OVER w AS pv, lag(epoch_us(ts)) OVER w AS pus
      FROM f WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts))
    ),
    -- exact Prometheus semantics (both endpoints inside (t-w, t]): a
    -- qualifying pair is "active" for t in [s_us, p_us + w), counted
    -- with a +1/-1 event sweep, exactly mirroring _eval_resets_changes
    flagged AS (
      SELECT user_id, ts, epoch_us(ts) AS us, pus,
             CASE WHEN pus IS NOT NULL
                       AND epoch_us(ts) - pus < 172800000000::BIGINT
                       AND value < pv THEN 1 ELSE 0 END AS r_hit,
             CASE WHEN pus IS NOT NULL
                       AND epoch_us(ts) - pus < 172800000000::BIGINT
                       AND value <> pv THEN 1 ELSE 0 END AS c_hit
      FROM p
    ),
    ev AS (
      SELECT user_id, NULL::TIMESTAMP AS ts, us AS e_us,
             r_hit AS dr, c_hit AS dc, 0 AS is_base
      FROM flagged WHERE r_hit = 1 OR c_hit = 1
      UNION ALL
      SELECT user_id, NULL::TIMESTAMP, pus + 172800000000::BIGINT,
             -r_hit, -c_hit, 0
      FROM flagged WHERE r_hit = 1 OR c_hit = 1
      UNION ALL
      SELECT user_id, ts, us, 0, 0, 1 FROM flagged
    ),
    c AS (
      SELECT user_id, ts, is_base,
             SUM(dr) OVER w AS nr, SUM(dc) OVER w AS nc
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY e_us, is_base
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(nr AS DOUBLE) AS n_resets,
           CAST(nc AS DOUBLE) AS n_changes
    FROM c WHERE is_base = 1
    """,
)
def promql_resets_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`resets(click[2d])` and `changes(click[2d])` compiled from the
    strings and joined on (series, instant) — counter-stability
    diagnostics over the hourly grid.  Exact Prometheus both-endpoints
    window semantics (instant and grid mode agree since round 5).
    Exact integer counts: zero cross-engine float freedom, so the
    oracle is bit-trivial."""
    # two compiled plans share the view — persist so the events scan +
    # hourly aggregation run once, not per operand
    m = _metrics_view(spark, sf_dir, "hour").persist()
    r = compile_promql("resets(click[2d])").evaluate(m).select(
        "user_id", "ts", F.col("value").alias("n_resets")
    )
    c = compile_promql("changes(click[2d])").evaluate(m).select(
        "user_id", "ts", F.col("value").alias("n_changes")
    )
    out = r.join(c, ["user_id", "ts"])
    return _finish_cached(
        out.select(
            "user_id",
            F.date_format("ts", _TS_FMT).alias("ts_s"),
            "n_resets",
            "n_changes",
        ),
        m,
    )


@query(
    "promql_quantile_last_over_time",
    """
    WITH m AS (
      SELECT event_type AS name, CAST(user_id AS VARCHAR) AS user_id,
             date_trunc('hour', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2, 3
    ),
    f AS (SELECT user_id, ts, epoch_us(ts) AS us, value FROM m WHERE name = 'click')
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(quantile_cont(value, 0.9) OVER w, 4) AS q90,
           max_by(value, us) OVER w AS last_value
    FROM f
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 172799999999 PRECEDING AND CURRENT ROW)
    """,
)
def promql_quantile_last_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`quantile_over_time(0.9, click[2d])` and
    `last_over_time(click[2d])` compiled from the strings and joined on
    (series, instant).  quantile_over_time is percentile_cont over the
    trailing range (linear interpolation — the same cross-engine
    convention a11_percentile pins); last_over_time picks the newest
    sample in the window."""
    m = _metrics_view(spark, sf_dir, "hour").persist()
    q = compile_promql("quantile_over_time(0.9, click[2d])").evaluate(m).select(
        "user_id", "ts", _r4(F.col("value")).alias("q90")
    )
    last = compile_promql("last_over_time(click[2d])").evaluate(m).select(
        "user_id", "ts", F.col("value").alias("last_value")
    )
    out = q.join(last, ["user_id", "ts"])
    return _finish_cached(
        out.select(
            "user_id",
            F.date_format("ts", _TS_FMT).alias("ts_s"),
            "q90",
            "last_value",
        ),
        m,
    )


_LB_US = 3600 * 1_000_000  # 1h selector lookback for the hourly buckets


@query(
    "promql_histogram_quantile_grid",
    f"""
    WITH g AS (
      SELECT event_type, epoch_us(date_trunc('hour', ts)) AS us,
             CAST(COUNT(*) FILTER (value <= 50)  AS DOUBLE) AS c50,
             CAST(COUNT(*) FILTER (value <= 100) AS DOUBLE) AS c100,
             CAST(COUNT(*) FILTER (value <= 200) AS DOUBLE) AS c200,
             CAST(COUNT(*) AS DOUBLE) AS cinf
      FROM events GROUP BY 1, 2
    ),
    b AS (
      SELECT ((MIN(us) + {_STEP_US} - 1) // {_STEP_US}) * {_STEP_US} AS g_lo,
             (MAX(us) // {_STEP_US}) * {_STEP_US} AS g_hi
      FROM g
    ),
    x AS (
      SELECT event_type, us, unnest(range(t_lo, t_hi + 1, {_STEP_US})) AS t_us
      FROM (
        SELECT g.event_type, g.us,
               greatest(((g.us + {_STEP_US} - 1) // {_STEP_US}) * {_STEP_US},
                        b.g_lo) AS t_lo,
               least(((g.us + {_LB_US} - 1) // {_STEP_US}) * {_STEP_US},
                     b.g_hi) AS t_hi
        FROM g, b
      ) WHERE t_lo <= t_hi
    ),
    -- lookback pick: the newest source hour covering each grid instant
    l AS (SELECT event_type, t_us, MAX(us) AS src_us FROM x GROUP BY 1, 2),
    j AS (
      SELECT l.event_type, l.t_us, g.c50, g.c100, g.c200, g.cinf
      FROM l JOIN g ON g.event_type = l.event_type AND g.us = l.src_us
    ),
    r AS (SELECT *, 0.9 * cinf AS rank FROM j WHERE cinf > 0)
    SELECT event_type,
           strftime(make_timestamp(t_us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(CASE
             WHEN c50 >= rank  THEN 0.0 + (50.0 - 0.0) * (rank - 0.0) / (c50 - 0.0)
             WHEN c100 >= rank THEN 50.0 + (100.0 - 50.0) * (rank - c50) / (c100 - c50)
             WHEN c200 >= rank THEN 100.0 + (200.0 - 100.0) * (rank - c100) / (c200 - c100)
             ELSE 200.0
           END, 4) AS value
    FROM r
    """,
)
def promql_histogram_quantile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`histogram_quantile(0.9, ev_bucket)` in RANGE-QUERY mode: the
    cumulative le-bucket series (le ∈ {{50,100,200,+Inf}} per
    (event_type, hour), as in promql_histogram_quantile) evaluated on
    the 30 m step grid with a 1 h selector lookback — every bucket
    series picks its newest sample inside (t-1h, t], then Prometheus's
    bucket interpolation runs per grid instant.  Proves the structural
    histogram node composes over grid-evaluated lookback leaves; the
    oracle replicates the instant expansion, the newest-hour pick, and
    the interpolation CASE chain with identical operand order."""
    ev = _t(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("ts")
    ).agg(
        F.count_if(F.col("value") <= 50).cast("double").alias("c50"),
        F.count_if(F.col("value") <= 100).cast("double").alias("c100"),
        F.count_if(F.col("value") <= 200).cast("double").alias("c200"),
        F.count(F.lit(1)).cast("double").alias("cinf"),
    )
    buckets = g.select(
        F.lit("ev_bucket").alias("name"),
        "ts",
        "event_type",
        F.explode(
            F.map_from_arrays(
                F.array(F.lit("50"), F.lit("100"), F.lit("200"), F.lit("+Inf")),
                F.array("c50", "c100", "c200", "cinf"),
            )
        ).alias("le", "value"),
    )
    out = compile_promql("histogram_quantile(0.9, ev_bucket)").evaluate_range(
        buckets, step_seconds=1800.0, lookback_seconds=3600.0
    )
    return out.select(
        "event_type",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        _r4(F.col("value")).alias("value"),
    )


_METRICS2_SQL = """
      SELECT event_type AS name, CAST(user_id AS VARCHAR) AS user_id,
             CAST(user_id % 5 AS VARCHAR) AS region,
             date_trunc('hour', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events GROUP BY 1, 2, 3, 4
"""


def _metrics2_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-label series frame (user_id + derived region) — the shape
    vector matching needs: the sides of the join carry different label
    sets."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("name"),
        F.col("user_id").cast("string").alias("user_id"),
        (F.col("user_id") % 5).cast("string").alias("region"),
        F.date_trunc("hour", F.col("ts")).alias("ts"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))


@query(
    "promql_vector_matching",
    f"""
    WITH m AS ({_METRICS2_SQL}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    v AS (SELECT region, ts, SUM(value) AS rv
          FROM m WHERE name = 'view' GROUP BY 1, 2)
    SELECT c.user_id, c.region,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(c.value / v.rv, 6) AS value
    FROM c JOIN v ON c.region = v.region AND c.ts = v.ts
    """,
)
def promql_vector_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`click / on(region) group_left sum by (region) (view)` — each
    user's clicks as a fraction of their region's total views at the
    same instant: PromQL many-to-one vector matching (`group_left`)
    compiled to an equi-join on (region, ts) where the many side keeps
    its full label set.  Exact count arithmetic → bit-identical
    doubles; the oracle is the same two-relation join.

    Round 16 (VERDICT r15 item 7): the expression is now written in
    Prometheus 3.x UTF-8 quoted-name syntax over DOTTED metric names
    (``web.click``/``web.view``) and a DASHED label name
    (``data-centre``) — ``{{"web.click"}} / on("data-centre")
    group_left sum by ("data-centre") ({{"web.view"}})`` — the same
    relation under OTel-style naming, so the oracle is unchanged and
    the grammar's quoted selectors, quoted on() and quoted by() all
    ride a driver-verified row (round-trip property + engine-contract
    rejections in tests/test_promql.py::test_utf8_quoted_names)."""
    m = (
        _metrics2_view(spark, sf_dir)
        .withColumn("name", F.concat(F.lit("web."), F.col("name")))
        .withColumnRenamed("region", "data-centre")
    )
    plan = compile_promql(
        '{"web.click"} / on("data-centre") group_left '
        'sum by ("data-centre") ({"web.view"})'
    )
    out = plan.evaluate(m)
    return out.select(
        "user_id",
        F.col("data-centre").alias("region"),
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.round(F.col("value"), 6).alias("value"),
    )


@query(
    "promql_vector_compare",
    f"""
    WITH m AS ({_METRICS2_SQL}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    v AS (SELECT region, ts, SUM(value) / 100 AS rv
          FROM m WHERE name = 'view' GROUP BY 1, 2)
    SELECT c.user_id, c.region,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           c.value
    FROM c JOIN v ON c.region = v.region AND c.ts = v.ts
    WHERE c.value > v.rv
    """,
)
def promql_vector_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`click > on(region) group_left sum by (region) (view) / 100`
    — vector-vector comparison with many-to-one matching: Prometheus's
    comparison FILTER semantics (engine.go's comparison branch) keep
    the many (left) side's elements — full label set, left value —
    where the matched comparison holds.  Alert-rule shape: "users
    whose clicks exceed 1% of their region's views this hour".
    Exercises the Cmp vector-rhs grammar, group_left comparison
    routing, and the scalar-division rewrite in one expression; exact
    count arithmetic keeps the doubles bit-identical to the SQL twin,
    so the comparison can't straddle a float boundary."""
    plan = compile_promql(
        "click > on(region) group_left sum by (region) (view) / 100"
    )
    out = plan.evaluate(_metrics2_view(spark, sf_dir))
    return out.select(
        "user_id",
        "region",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


@query(
    "promql_set_ops",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT user_id, ts, value FROM m WHERE name = 'click'),
    v AS (SELECT user_id, ts, value FROM m WHERE name = 'view'),
    in_both AS (
      SELECT c.* FROM c WHERE EXISTS (
        SELECT 1 FROM v WHERE v.user_id = c.user_id AND v.ts = c.ts)
    ),
    only_click AS (
      SELECT c.* FROM c WHERE NOT EXISTS (
        SELECT 1 FROM v WHERE v.user_id = c.user_id AND v.ts = c.ts)
    ),
    merged AS (
      SELECT * FROM c
      UNION ALL
      SELECT v.* FROM v WHERE NOT EXISTS (
        SELECT 1 FROM c WHERE c.user_id = v.user_id AND c.ts = v.ts)
    )
    SELECT 'and' AS op, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value FROM in_both
    UNION ALL
    SELECT 'unless', user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), value
    FROM only_click
    UNION ALL
    SELECT 'or', user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), value FROM merged
    """,
)
def promql_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three PromQL set operators over the same pair of series,
    stacked into one frame tagged by `op`: `click and view` (instants
    where the user also viewed — left-semi join), `click unless view`
    (left-anti join), `click or view` (left wins, right fills the
    gaps).  Values are exact counts, so every engine agrees
    bit-for-bit; the oracle mirrors each operator with EXISTS / NOT
    EXISTS / union-anti SQL.

    The shared metrics view is persisted: the three operators reference
    the click/view series six times, and without the cache each branch
    re-scans and re-aggregates the events table (6× the scan cost for
    identical partials — at 100 TB the difference between one pass and
    six)."""
    m = _metrics_view(spark, sf_dir, "hour").persist()
    parts = []
    for op in ("and", "unless", "or"):
        out = compile_promql(f"click {op} view").evaluate(m)
        parts.append(
            out.select(
                F.lit(op).alias("op"),
                "user_id",
                F.date_format("ts", _TS_FMT).alias("ts_s"),
                "value",
            )
        )
    return _finish_cached(
        parts[0].unionByName(parts[1]).unionByName(parts[2]), m
    )


@query(
    "promql_count_values",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click')
    SELECT CAST(CAST(value AS BIGINT) AS VARCHAR) AS n_events,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(COUNT(*) AS DOUBLE) AS value
    FROM c GROUP BY 1, 2
    """,
)
def promql_count_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`count_values("n_events", click)` — the per-instant histogram of
    sample values (how many users clicked exactly k times each hour):
    the value itself becomes a label, formatted Prometheus-style
    (integral doubles print without the trailing .0, which is exactly
    the oracle's double→BIGINT→VARCHAR chain on these count-valued
    samples).  Exact integer counts — zero float freedom."""
    m = _metrics_view(spark, sf_dir, "hour")
    out = compile_promql('count_values("n_events", click)').evaluate(m)
    return out.select(
        "n_events",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
    )


@query(
    "promql_subquery",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    -- inner sum(click) on the 1 h subquery grid: hour-truncated sample
    -- timestamps are exactly grid-aligned and the 5 m default lookback
    -- only reaches the sample's own instant, so the grid evaluation
    -- degenerates to the plain hourly sum (hand-derived; the engine
    -- computes it through the generic lookback expansion)
    inner_g AS (
      SELECT epoch_us(ts) AS t_us, SUM(value) AS value
      FROM c GROUP BY ts
    )
    SELECT strftime(make_timestamp(t_us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           MAX(value) OVER (ORDER BY t_us
                            RANGE BETWEEN 172799999999 PRECEDING
                                      AND CURRENT ROW) AS value
    FROM inner_g
    """,
)
def promql_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_over_time(sum(click)[2d:1h])` — a Prometheus SUBQUERY: the
    inner aggregate is evaluated on its own aligned 1 h step grid
    (lookback selectors, range_eval.GridLeaf) and the resulting
    synthetic samples feed the outer trailing-2d max exactly like
    selector samples.  On hour-truncated data the inner grid evaluation
    reduces to the plain hourly sum, which the oracle replays with a
    window MAX; every value is an exact integer count."""
    m = _metrics_view(spark, sf_dir, "hour")
    out = compile_promql("max_over_time(sum(click)[2d:1h])").evaluate(m)
    return out.select(
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
    )


@query(
    "promql_at_offset",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    u AS (SELECT DISTINCT ts FROM m),
    c AS (SELECT * FROM m WHERE name = 'click'),
    -- @ T with T = the click series' newest hour: each user's value
    -- as of T (the newest sample at or before T)
    snap AS (
      SELECT user_id, max_by(value, ts) AS pin
      FROM c
      WHERE ts <= (SELECT max(ts) FROM c)
      GROUP BY user_id
    ),
    -- offset -1d: the sample taken at t surfaces at instant t - 1d
    off AS (SELECT user_id, ts - INTERVAL 1 DAY AS ts, value FROM c),
    -- grid-mode branch (round 11.5): T' = newest click hour MINUS 30
    -- minutes, deliberately OFF the 1h step grid.  Exact @ anchoring
    -- means sum_over_time(click[1d] @ T') sums the samples in the
    -- exact left-open window (T'−1d, T'] — the hours t_max−24h
    -- through t_max−1h, EXCLUDING the t_max hour itself (the r11
    -- snap-to-grid would have included it) — per user; integral
    -- counts, so the sum over users is exact on both engines
    tmax AS (SELECT max(epoch_us(ts)) AS mx FROM c),
    atw AS (
      SELECT user_id, SUM(value) AS sv
      FROM c, tmax
      WHERE epoch_us(ts) >  mx - 1800000000 - 86400000000
        AND epoch_us(ts) <= mx - 1800000000
      GROUP BY user_id
    ),
    -- sum() over an EMPTY pinned vector is an empty result in PromQL,
    -- not a NULL row — guard the cross join below
    pinv AS (SELECT SUM(sv) AS v FROM atw),
    -- the engine's evaluation grid: hour instants aligned over the
    -- WHOLE metrics frame's span (all names, hour grain → both ends
    -- already aligned)
    grid AS (
      SELECT unnest(generate_series((SELECT min(ts) FROM m),
                                    (SELECT max(ts) FROM m),
                                    INTERVAL 1 HOUR)) AS ts
    )
    SELECT 'off_minus_at' AS branch, o.user_id,
           strftime(o.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           o.value - s.pin AS value
    FROM off o
    JOIN snap s USING (user_id)
    JOIN u USING (ts)
    UNION ALL
    SELECT 'grid_at', '', strftime(grid.ts, '%Y-%m-%d %H:%M:%S'), pinv.v
    FROM grid, pinv WHERE pinv.v IS NOT NULL
    """,
)
def promql_at_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`click offset -1d - click @ T` — the round-6 grammar additions
    working together: a NEGATIVE offset (the forward-looking comparison
    idiom — tomorrow's sample surfaces at today's instant) minus the
    per-user value pinned at fixed time T via the `@` modifier
    (Prometheus's fixed-evaluation-time semantics: one snapshot per
    series broadcast across the whole instant universe).  T is the
    click series' newest hour, derived from the data so the query is
    self-contained at any SF; a dashboard would pass its own epoch
    literal.  Values are exact integer-count differences — no float
    freedom.

    Round 11.5 (CHANGED — removes the ADVICE-r6 documented
    divergence): a second branch runs in RANGE mode with an anchor 30
    minutes OFF the 1-hour step grid —
    ``sum(sum_over_time(click[1d] @ T−30m))``.  Exact @ anchoring
    evaluates the inner expression on a one-instant grid pinned at
    exactly T−30m, so the window is the exact (T−30m−1d, T−30m] —
    excluding the t_max hour itself; the r11 engine would have
    snapped to the newest grid instant ≤ T−30m (t_max, grid-aligned)
    and summed a window that INCLUDES it."""
    m = _metrics_view(spark, sf_dir, "hour")
    t_max = (
        m.filter(F.col("name") == "click")
        .agg(F.max(F.unix_micros(F.col("ts"))))
        .first()[0]
    )
    expr = f"click offset -1d - click @ {t_max // 1_000_000}"
    out = compile_promql(expr).evaluate(m)
    branch1 = out.select(
        F.lit("off_minus_at").alias("branch"),
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
    )
    t_off = t_max // 1_000_000 - 1800  # half an hour off the grid
    g = compile_promql(
        f"sum(sum_over_time(click[1d] @ {t_off}))"
    ).evaluate_range(m, 3600.0)
    branch2 = g.select(
        F.lit("grid_at").alias("branch"),
        F.lit("").alias("user_id"),
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
    )
    return branch1.unionByName(branch2)


@query(
    "promql_clamp_sort",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click')
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           LEAST(GREATEST(value * 3, 4), 5) AS value
    FROM c
    """,
)
def promql_clamp_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sort_desc(clamp(click * 3, 4, 5))` — two-sided clamp (both
    bounds bite on the 1-or-2-count hourly data scaled by 3) under
    sort_desc, Prometheus's display ordering (an ORDER BY on the final
    frame; the driver's comparison is order-insensitive, so the oracle
    pins the values and the sort exercises the compiled plan path)."""
    m = _metrics_view(spark, sf_dir, "hour")
    out = compile_promql("sort_desc(clamp(click * 3, 4, 5))").evaluate(m)
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
    )


@query(
    "promql_round_scalar",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    tot AS (SELECT ts, SUM(value) AS tot FROM c GROUP BY ts)
    SELECT c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           floor(c.value / t.tot * (1.0 / 0.0001) + 0.5) / (1.0 / 0.0001) AS value
    FROM c JOIN tot t ON c.ts = t.ts
    """,
)
def promql_round_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`round(click / scalar(sum(click)), 0.0001)` — each user's share
    of the hour's total clicks via Prometheus's scalar() (a
    single-element vector as a per-instant scalar, combining with any
    vector by the evaluation instant alone) under round()'s
    half-up-to-nearest-multiple rule.  Both sides use Prometheus
    funcRound's reciprocal form floor(v*(1/n)+0.5)/(1/n) (ADVICE r6)
    so the doubles stay bit-identical."""
    m = _metrics_view(spark, sf_dir, "hour")
    out = compile_promql("round(click / scalar(sum(click)), 0.0001)").evaluate(m)
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "value",
    )


@query(
    "promql_holt_winters",
    f"""
    WITH RECURSIVE m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    samples AS (
      SELECT w.user_id, w.ts AS wts, s.ts, s.value,
             row_number() OVER (PARTITION BY w.user_id, w.ts
                                ORDER BY s.ts) AS i,
             COUNT(*) OVER (PARTITION BY w.user_id, w.ts) AS n
      FROM c w JOIN c s ON s.user_id = w.user_id
       AND epoch_us(s.ts) > epoch_us(w.ts) - 14400000000
       AND s.ts <= w.ts
    ),
    fold AS (
      SELECT user_id, wts, i, n, value AS s, CAST(NULL AS DOUBLE) AS b
      FROM samples WHERE i = 1
      UNION ALL
      SELECT f.user_id, f.wts, x.i, x.n,
             CASE WHEN x.i = 2
                  THEN 0.3 * x.value + 0.7 * (f.s + (x.value - f.s))
                  ELSE 0.3 * x.value + 0.7 * (f.s + f.b) END,
             CASE WHEN x.i = 2
                  THEN x.value - f.s
                  ELSE 0.6 * ((0.3 * x.value + 0.7 * (f.s + f.b)) - f.s)
                       + 0.4 * f.b END
      FROM fold f
      JOIN samples x ON x.user_id = f.user_id AND x.wts = f.wts
                    AND x.i = f.i + 1
    )
    SELECT user_id, strftime(wts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(s, 6) AS value
    FROM fold WHERE i = n AND n >= 2
    """,
)
def promql_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`holt_winters(click[4h], 0.3, 0.6)` — double exponential
    smoothing over each sample's trailing (t-4h, t] window (Prometheus
    funcHoltWinters; the round-6 JVM-side F.aggregate fold at
    promql/compiler.py holt_winters_fold).  The oracle replays the
    identical recursion per window with a recursive CTE in the SAME
    floating-point op order (level s0=x0; trend inits from x1-x0 with
    the trend update skipped on that step; thereafter
    s1 = sf*x + (1-sf)*(s+b), b = tf*(s1-s) + (1-tf)*b), and windows
    with < 2 samples yield no point on both sides.  Scale: the engine
    side is one RANGE window collect_list + a codegen'd fold — no
    Python, no self-join; the oracle's O(w^2) self-join exists only to
    make the fold SQL-replayable."""
    m = _metrics_view(spark, sf_dir, "hour")
    out = compile_promql("holt_winters(click[4h], 0.3, 0.6)").evaluate(m)
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.round(F.col("value"), 6).alias("value"),
    )


@query(
    "promql_calendar",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click')
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(epoch_us(ts) / 1000000.0 AS DOUBLE) AS epoch_s,
           CAST(EXTRACT(hour FROM ts) * 10000
                + dayofweek(ts) * 100
                + EXTRACT(day FROM ts) AS DOUBLE) AS cal,
           CAST((EXTRACT(year FROM ts) - 2000) * 10000
                + EXTRACT(month FROM ts) * 100
                + EXTRACT(day FROM last_day(ts)) AS DOUBLE) AS ym
    FROM c
    """,
)
def promql_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 calendar family end-to-end: ``timestamp()`` (each
    element's sample epoch as its value) plus
    ``hour/day_of_week/day_of_month`` and
    ``year/month/days_in_month`` applied to timestamp()-valued vectors
    (Prometheus's v=vector(time()) convention: the VALUE is a UTC
    epoch), packed into digit fields via scalar arithmetic and
    label-matched vector addition.  day_of_week is 0=Sunday in both
    Prometheus and DuckDB's dayofweek(); Spark's 1=Sunday is shifted in
    the compiler.  Three compiled expressions joined on (user_id, ts)
    — the join is on the same hourly click frame, broadcast-sized at
    test SF and key-partitioned at scale."""
    m = _metrics_view(spark, sf_dir, "hour")
    epoch = compile_promql("timestamp(click)").evaluate(m)
    cal = compile_promql(
        "hour(timestamp(click)) * 10000"
        " + day_of_week(timestamp(click)) * 100"
        " + day_of_month(timestamp(click))"
    ).evaluate(m)
    ym = compile_promql(
        "(year(timestamp(click)) - 2000) * 10000"
        " + month(timestamp(click)) * 100"
        " + days_in_month(timestamp(click))"
    ).evaluate(m)
    out = (
        epoch.select("user_id", "ts", F.col("value").alias("epoch_s"))
        .join(cal.select("user_id", "ts", F.col("value").alias("cal")),
              ["user_id", "ts"])
        .join(ym.select("user_id", "ts", F.col("value").alias("ym")),
              ["user_id", "ts"])
    )
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "epoch_s",
        "cal",
        "ym",
    )


@query(
    "promql_trig_group",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT * FROM m WHERE name = 'click')
    SELECT user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(atan(sin(value / 7) * cos(value / 3)) + pi(), 6) AS value
    FROM c
    """,
)
def promql_trig_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`atan(sin(click / 7) * cos(click / 3)) + group by (user_id)
    (click) * pi()` — the round-7 grammar additions end-to-end: the
    trigonometric function family (element-wise, vector×vector label
    join between the sin/cos terms), pi() as a scalar literal, and
    group() as an existence aggregate (1.0 per populated group, so the
    oracle's `+ pi()` is exact).  round(…, 6) on both sides absorbs
    any last-ulp libm-vs-java.lang.Math divergence in the trig
    kernels."""
    m = _metrics_view(spark, sf_dir, "hour")
    out = compile_promql(
        "atan(sin(click / 7) * cos(click / 3))"
        " + group by (user_id) (click) * pi()"
    ).evaluate(m)
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.round(F.col("value"), 6).alias("value"),
    )


_RULES_YAML = """
groups:
- name: engagement
  interval: 1h
  rules:
  - record: region:click:sum
    expr: sum by (region) (click)
  - alert: HighRegionClicks
    expr: region:click:sum > 1
    for: 2h
"""


@query(
    "promql_rules_group",
    f"""
    WITH m AS ({_METRICS2_SQL}),
    rec AS (SELECT region, ts, SUM(value) AS value
            FROM m WHERE name = 'click' GROUP BY 1, 2),
    hits AS (SELECT region, ts, value FROM rec WHERE value > 1),
    marks AS (
      SELECT region, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 3600
                  THEN epoch(ts) END AS mark
      FROM hits WINDOW w AS (PARTITION BY region ORDER BY ts)),
    runs AS (
      SELECT region, ts, value,
             MAX(mark) OVER (PARTITION BY region ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS run_start
      FROM marks)
    SELECT region, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CASE WHEN epoch(ts) - run_start >= 7200
                THEN 'firing' ELSE 'pending' END AS alertstate,
           value
    FROM runs
    """,
)
def promql_rules_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus rule-group evaluation end-to-end (promql/rules.py):
    a recording rule (`region:click:sum = sum by (region) (click)`)
    materialized into the series frame, then an alerting rule that
    SELECTS THE RECORDED SERIES (`region:click:sum > 1`, for: 2h) —
    the sequential in-group chaining of rules/manager.go — with the
    pending→firing state machine on the 1h evaluation grid: an element
    fires once present continuously for ≥ 2h (two steps after its
    run's first instant); a missed instant resets the run.  The
    threshold is sized to the test data (ADVICE r7: `> 40` made the
    golden row EMPTY at sf0.01, verifying nothing): `> 1` emits both
    pending and firing rows at sf0.01+, so the driver differential
    actually exercises the state machine.

    The oracle mirrors the whole ladder in SQL: grouped sum → filter →
    gaps-and-islands (lag + running MAX of run marks) → the for-
    threshold CASE.  Hour-truncated counts keep every double exact and
    the grid degenerate-free (samples hour-aligned, lookback 300s <
    step 3600s, so grid instants coincide with sample hours)."""
    from kafka_metrics_exporter_spark.promql.rules import evaluate_rules

    res = evaluate_rules(_RULES_YAML, _metrics2_view(spark, sf_dir))["engagement"]
    al = res.alerts["HighRegionClicks"]
    return al.select(
        "region",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "alertstate",
        F.col("value"),
    )


@query(
    "openmetrics_roundtrip",
    f"""
    WITH m AS ({_METRICS2_SQL})
    SELECT name, user_id, region,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
    FROM m
    """,
)
def openmetrics_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus exposition-format source/sink
    (sources/openmetrics.py): serialize the metrics view to text lines
    (`name{{user_id="…",region="…"}} <value> <ts_ms>`) and parse them
    back with the quote-aware JVM decoder — the round trip is the
    identity, so the oracle is the view itself.  Counts are integral
    doubles and hour-truncated timestamps are exact in epoch-millis,
    so serialize→parse is bit-exact; the whole path is codegen
    expressions (regexp_extract/map_from_arrays), zero Python —
    pinned by tests/test_openmetrics.py's EvalPython plan assert."""
    from kafka_metrics_exporter_spark.sources.openmetrics import (
        exposition_lines,
        labels_to_columns,
        parse_exposition,
    )

    m = _metrics2_view(spark, sf_dir)
    text = exposition_lines(m, label_cols=["user_id", "region"])
    back = labels_to_columns(parse_exposition(text), ["user_id", "region"])
    return back.select(
        "name",
        "user_id",
        "region",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


@query(
    "promql_label_functions",
    f"""
    WITH m AS ({_METRICS2_SQL}),
    c AS (SELECT * FROM m WHERE name = 'click'),
    rewritten AS (
      SELECT CASE WHEN region IN ('0', '1', '2')
                  THEN 'z' || region ELSE '' END AS zone,
             user_id, ts, value
      FROM c
    ),
    joined AS (
      SELECT zone || '-' || user_id AS ukey, ts, value FROM rewritten
    )
    SELECT ukey, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           SUM(value) AS value
    FROM joined GROUP BY 1, 2
    """,
)
def promql_label_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`sum by (ukey) (label_join(label_replace(click, "zone", "z$1",
    "region", "([0-2])"), "ukey", "-", "zone", "user_id"))` — the two
    relabeling functions end-to-end (VERDICT r7 missing item 1): an
    anchored capture-substitution deriving `zone` (regions 3/4 don't
    match, so their zone stays empty — the Prometheus pass-through
    branch), a separator join building a composite key, then grouping
    BY THE DERIVED LABEL.  Both compile to pure string Column
    expressions (`regexp_replace`/`concat_ws`) inside the existing
    scan→aggregate shape: no extra shuffle beyond the final group-by,
    no new plan nodes — the oracle mirrors the rewrite with CASE/||.
    Exact count sums keep the doubles bit-identical."""
    plan = compile_promql(
        'sum by (ukey) (label_join(label_replace('
        'click, "zone", "z$1", "region", "([0-2])"), '
        '"ukey", "-", "zone", "user_id"))'
    )
    out = plan.evaluate(_metrics2_view(spark, sf_dir))
    return out.select(
        "ukey",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


@query(
    "promql_over_time_pack",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT user_id, ts, value FROM m WHERE name = 'click'),
    win AS (
      SELECT user_id, ts,
             list_sort(list(value) OVER w3) AS ls,
             struct_extract(
               max(struct_pack(v := value, u := epoch_us(ts))) OVER w3,
               'u') AS umax,
             struct_extract(
               min(struct_pack(u := epoch_us(ts), v := value)) OVER w2,
               'v') AS first_v,
             min(epoch_us(ts)) OVER w2 AS ufirst
      FROM c
      WINDOW
        w3 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 10799999999 PRECEDING AND CURRENT ROW),
        w2 AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 7199999999 PRECEDING AND CURRENT ROW)
    ),
    med AS (
      SELECT user_id, ts, ls, umax, first_v, ufirst,
             (ls[(len(ls) + 1) // 2] + ls[len(ls) // 2 + 1]) / 2.0 AS m0
      FROM win
    ),
    dev AS (
      SELECT user_id, ts, umax, first_v, ufirst,
             list_sort(list_transform(ls, x -> abs(x - m0))) AS ds
      FROM med
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           (ds[(len(ds) + 1) // 2] + ds[len(ds) // 2 + 1]) / 2.0 AS mad_v,
           umax / 1000000.0 AS tsmax_s,
           first_v,
           ufirst / 1000000.0 AS tsfirst_s
    FROM dev
    """,
)
def promql_over_time_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 Prometheus-3.x *_over_time family over the hourly
    click series: ``mad_over_time(click[3h])`` (median absolute
    deviation — sort_array/transform/element_at codegen, no UDFs),
    ``ts_of_max_over_time(click[3h])`` (float epoch seconds of the
    last sample carrying the window max), and
    ``first_over_time(click[2h])``, and — round 13 —
    ``ts_of_first_over_time(click[2h])`` (the first sample's float
    epoch seconds, Prometheus 3.5's experimental timestamp twin of
    first_over_time), joined on (user_id, ts).

    The oracle replays each kernel with DuckDB list/struct windows:
    the same trailing left-open RANGE frame, list_sort + two-middle
    interpolation for both medians, lexicographic struct max/min for
    the argmax picks.  Counts are integral so every median/deviation
    lands on an exact .25 grid and the argmax seconds are whole —
    bit-identical doubles, no rounding."""
    m = _metrics_view(spark, sf_dir, "hour").persist()
    mad = compile_promql("mad_over_time(click[3h])").evaluate(m)
    tmax = compile_promql("ts_of_max_over_time(click[3h])").evaluate(m)
    fst = compile_promql("first_over_time(click[2h])").evaluate(m)
    tfst = compile_promql("ts_of_first_over_time(click[2h])").evaluate(m)
    out = (
        mad.select("user_id", "ts", F.col("value").alias("mad_v"))
        .join(
            tmax.select("user_id", "ts", F.col("value").alias("tsmax_s")),
            ["user_id", "ts"],
        )
        .join(
            fst.select("user_id", "ts", F.col("value").alias("first_v")),
            ["user_id", "ts"],
        )
        .join(
            tfst.select("user_id", "ts", F.col("value").alias("tsfirst_s")),
            ["user_id", "ts"],
        )
        .select(
            "user_id",
            F.date_format("ts", _TS_FMT).alias("ts_s"),
            "mad_v",
            "tsmax_s",
            "first_v",
            "tsfirst_s",
        )
    )
    return _finish_cached(out, m)


@query(
    "promql_limit_sample",
    f"""
    WITH m AS ({_METRICS_SQL.format(grain="hour")}),
    c AS (SELECT user_id, ts, value FROM m WHERE name = 'click'),
    h AS (
      SELECT user_id, ts, value,
             ('0x' || substr(md5(user_id), 1, 8))::BIGINT / 4294967296.0
               AS hv
      FROM c
    ),
    rk AS (
      SELECT user_id, ts, value,
             row_number() OVER (PARTITION BY ts ORDER BY user_id) AS rn
      FROM c
    )
    SELECT 'in' AS part, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
    FROM h WHERE hv < 0.5
    UNION ALL
    SELECT 'out', user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), value
    FROM h WHERE hv >= 0.5
    UNION ALL
    SELECT 'k', user_id, strftime(ts, '%Y-%m-%d %H:%M:%S'), value
    FROM rk WHERE rn <= 3
    """,
)
def promql_limit_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``limit_ratio(0.5, click)`` / ``limit_ratio(-0.5, click)`` /
    ``limitk(3, sort_by_label(click, "user_id"))`` stacked into one
    frame tagged by ``part`` — the Prometheus-3.x sampling
    aggregations with their deterministic engine semantics fully
    replayed by SQL: the ratio hash is the first-8-hex-chars of
    md5(label tuple) over 2^32 (both engines compute the identical
    value), so the in/out parts are an EXACT partition of the series
    (the Prometheus r / r−1 pair property); limitk keeps the 3 first
    series per instant in label order (row_number twin).
    sort_by_label wraps the limitk operand to pin the presentation op
    inside a larger compiled plan (ordering itself is invisible to the
    hash compare, which sorts rows).

    Scale: limit_ratio is a scan-local predicate — zero shuffle, the
    100 TB way to sample a series universe; limitk is one rank window
    partitioned by ts."""
    m = _metrics_view(spark, sf_dir, "hour").persist()
    parts = []
    for tag, expr in (
        ("in", "limit_ratio(0.5, click)"),
        ("out", "limit_ratio(-0.5, click)"),
        ("k", 'limitk(3, sort_by_label(click, "user_id"))'),
    ):
        out = compile_promql(expr).evaluate(m)
        parts.append(
            out.select(
                F.lit(tag).alias("part"),
                "user_id",
                F.date_format("ts", _TS_FMT).alias("ts_s"),
                "value",
            )
        )
    return _finish_cached(parts[0].unionByName(parts[1]).unionByName(parts[2]), m)


@query(
    "promql_time_macros",
    _xrate_ctes(3600 * 1_000_000, 4 * 3600 * 1_000_000)
    + """
    SELECT user_id,
           strftime(make_timestamp(t_us), '%Y-%m-%d %H:%M:%S') AS ts_s,
           value
    FROM xr
    """,
)
def promql_time_macros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana built-in time macros end-to-end (round 8):
    `rate(click{user_id!=""}[$__rate_interval])` with the macro bound
    by promql/variables.py time_macros(step=1h, scrape=1h — an
    hourly-rollup lake's effective scrape cadence) — Grafana's
    documented `max(step + scrape, 4 × scrape)` resolves to a [4h]
    window, interpolated textually before parse exactly as the
    frontend does, then range-evaluated on the matching 1 h grid.  The
    oracle replays the extrapolated-rate arithmetic at (3600 s,
    14400 s) — a different (step, window) pair from
    promql_rate_extrapolated's (1800 s, 7200 s), so the macro
    arithmetic is what's under test, not a cached shape."""
    from kafka_metrics_exporter_spark.promql.variables import time_macros

    macros = time_macros(
        range_seconds=86400.0, step_seconds=3600.0, scrape_interval_seconds=3600.0
    )
    plan = compile_promql(
        'rate(click{user_id!=""}[$__rate_interval])', variables=macros
    )
    out = plan.evaluate_range(
        _metrics_view(spark, sf_dir, "hour"), step_seconds=3600.0
    )
    return out.select(
        "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


def _metrics_info_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metrics frame with Prometheus-convention IDENTIFYING labels
    (instance/job) plus a ``target_info`` info metric carrying data
    labels (env, version) — the shape the 3.x ``info()`` function
    joins.  user_id plays the instance; instances with user_id % 7 = 0
    deliberately have NO target_info series, exercising the
    enrichment's pass-through path."""
    ev = _t(spark, sf_dir, "events")
    samples = (
        ev.groupBy(
            F.col("event_type").alias("name"),
            F.col("user_id").cast("string").alias("instance"),
            F.date_trunc("hour", F.col("ts")).alias("ts"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("job", F.lit("events"))
        .withColumn("env", F.lit(None).cast("string"))
        .withColumn("version", F.lit(None).cast("string"))
    )
    info = (
        ev.filter(F.col("user_id") % 7 != 0)
        .select(
            F.lit("target_info").alias("name"),
            F.col("user_id").cast("string").alias("instance"),
            F.date_trunc("hour", F.col("ts")).alias("ts"),
            F.lit("events").alias("job"),
            (F.col("user_id") % 3).cast("string").alias("env"),
            F.concat(F.lit("v"), (F.col("user_id") % 2).cast("string")).alias(
                "version"
            ),
        )
        .distinct()
        .withColumn("value", F.lit(1.0))
    )
    return samples.select(info.columns).unionByName(info)


@query(
    "promql_info_join",
    """
    WITH c AS (
      SELECT CAST(user_id AS VARCHAR) AS instance,
             date_trunc('hour', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
      FROM events WHERE event_type = 'click' GROUP BY 1, 2
    ),
    i AS (
      SELECT DISTINCT CAST(user_id AS VARCHAR) AS instance,
             date_trunc('hour', ts) AS ts,
             CAST(user_id % 3 AS VARCHAR) AS env,
             'v' || CAST(user_id % 2 AS VARCHAR) AS version
      FROM events WHERE user_id % 7 <> 0
    )
    SELECT COALESCE(i.env, '') AS env, COALESCE(i.version, '') AS version,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           SUM(c.value) AS value
    FROM c LEFT JOIN i ON c.instance = i.instance AND c.ts = i.ts
    GROUP BY 1, 2, 3
    """,
)
def promql_info_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus 3.x ``info()`` (experimental, funcInfo): click
    samples enriched with target_info's data labels then aggregated by
    them — `sum by (env, version) (info(click))`.  Instances without a
    target_info series pass through with env/version absent ("" under
    the engine's canonical form) and aggregate into their own group:
    info() is an ENRICHMENT (left join), not a filter.  Exact count
    arithmetic → bit-identical sums.

    Scale shape: the info side is one row per scrape target per
    instant — catalog-sized, broadcast — so enrichment adds no shuffle
    of the sample side; the only data shuffle is the final sum-by."""
    plan = compile_promql("sum by (env, version) (info(click))")
    out = plan.evaluate(_metrics_info_view(spark, sf_dir))
    return out.select(
        "env",
        "version",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.col("value"),
    )


# ---------------------------------------------------------------------------
# Round 10: Prometheus 3.x native histograms
# ---------------------------------------------------------------------------
def _nh_sql(factor: float, hschema: int) -> str:
    """One complete native-histogram DuckDB-twin block for a given
    schema (``factor`` = 2^schema): the long-attested schema-0 text
    with every bucket-index (``ceil(log2(v) * factor)``) and
    bucket-bound (``power(2.0, idx / factor)``) expression
    parameterized.  factor 1.0 leaves the schema-0 doubles bit-for-bit
    (``x * 1.0`` and ``x / 1.0`` are exact), so the original hashes
    are unchanged; factor 8.0 is schema 3, the Prometheus 3.x default
    (VERDICT r11 item 5).  Float stance, documented: schema-0 bounds
    are pow(2, int) — exact; schema-3 bounds evaluate fractional
    pow/log2 in each engine's libm, which agree to <= 1 ulp on this
    platform and are absorbed by the comparison layer's 4-decimal
    rounding — hash-attested empirically at sf0.001/0.01/0.1."""
    f = repr(float(factor))
    body = _NH_BLOCK.replace("{f}", f).replace("{hschema}", str(int(hschema)))
    return "( " + body + " )"


_NH_BLOCK = r"""
    WITH b AS (
      -- NaN first: a user hit by both arms (user_id % 291 = 0) is a
      -- NaN observation, mirroring the engine's when-chain order
      SELECT event_type AS etype, date_trunc('day', ts) AS ts,
             CASE WHEN user_id % 97 = 0 THEN 'NaN'::DOUBLE
                  WHEN user_id % 3 = 0 THEN -value ELSE value END AS v
      FROM events
    ),
    cls AS (
      -- sign group 2 = NaN observations (count-only; no bucket, sum
      -- poisoned) — the isnan arm must come first: DuckDB, like
      -- Spark, compares NaN greater than everything
      SELECT etype, ts, v,
             CASE WHEN isnan(v) THEN 2
                  WHEN v > 0.1 THEN 1 WHEN v >= -0.1 THEN 0 ELSE -1 END AS sgn,
             CASE WHEN isnan(v) THEN NULL
                  WHEN v > 0.1 THEN CAST(ceil(log2(v) * {f}) AS INT)
                  WHEN v < -0.1 THEN CAST(ceil(log2(-v) * {f}) AS INT) END AS idx
      FROM b
    ),
    per AS (
      SELECT etype, ts, sgn, idx, CAST(COUNT(*) AS DOUBLE) AS c,
             SUM(CASE WHEN sgn = 2 THEN 0
                      ELSE CAST(floor(v * 100000000.0 + 0.5) AS BIGINT)
                 END) AS sv
      FROM cls GROUP BY 1, 2, 3, 4
    ),
    cell AS (
      SELECT etype, ts, SUM(c) AS cnt,
             CASE WHEN SUM(CASE WHEN sgn = 2 THEN c ELSE 0 END) > 0
                  THEN 'NaN'::DOUBLE
                  ELSE CAST(SUM(sv) AS DOUBLE) / 100000000.0 END AS vsum,
             SUM(CASE WHEN sgn = 0 THEN c ELSE 0 END) AS zc,
             BOOL_OR(sgn = 1) AS has_pos,
             BOOL_OR(sgn = -1) AS has_neg
      FROM per GROUP BY 1, 2
    ),
    -- ONE value-ascending span list per cell: negative buckets in
    -- reverse idx order (bound nearest zero clamped to -zt), the zero
    -- bucket with the promql/quantile.go bound adjustment, positive
    -- buckets (lower clamped to zt) — the engine's _bucket_spans
    spans AS (
      SELECT p.etype, p.ts, p.c, p.sgn,
             CASE WHEN p.sgn = -1 THEN -p.idx ELSE COALESCE(p.idx, 0) END AS ok,
             CASE WHEN p.sgn = -1 THEN -power(2.0, p.idx / {f})
                  WHEN p.sgn = 0 THEN
                    CASE WHEN NOT cell.has_neg AND cell.has_pos
                         THEN 0.0 ELSE -0.1 END
                  ELSE greatest(power(2.0, (p.idx - 1) / {f}), 0.1) END AS lo,
             CASE WHEN p.sgn = -1 THEN least(-power(2.0, (p.idx - 1) / {f}), -0.1)
                  WHEN p.sgn = 0 THEN
                    CASE WHEN NOT cell.has_pos AND cell.has_neg
                         THEN 0.0 ELSE 0.1 END
                  ELSE power(2.0, p.idx / {f}) END AS hi
      FROM per p JOIN cell USING (etype, ts)
      WHERE p.sgn != 2  -- NaN observations occupy no bucket
    ),
    walk AS (
      SELECT s.etype, s.ts, s.lo, s.hi, s.c, s.sgn, s.ok,
             COALESCE(SUM(s.c) OVER w, 0) - s.c AS cum_prev,
             0.9 * cell.cnt AS rank
      FROM spans s JOIN cell USING (etype, ts)
      WINDOW w AS (PARTITION BY s.etype, s.ts ORDER BY s.sgn, s.ok)
    ),
    pick AS (
      SELECT etype, ts,
             lo + (hi - lo) * (rank - cum_prev) / c AS qv
      FROM walk
      WHERE c > 0 AND cum_prev + c >= rank
      QUALIFY row_number() OVER (PARTITION BY etype, ts
                                 ORDER BY sgn, ok) = 1
    ),
    -- NaN observations inflate cnt without occupying a bucket, so a
    -- rank past the bucketed mass has no crossing span: clamp to the
    -- highest populated upper bound, like the engine's hist_quantile
    lastb AS (
      SELECT etype, ts, MAX(hi) AS hi_max FROM spans WHERE c > 0
      GROUP BY 1, 2
    ),
    frac AS (
      SELECT etype, ts,
             CAST(SUM(CAST(floor(
               greatest(0.0, least(64.0, hi) - greatest(1.0, lo))
                 / (hi - lo) * c * 100000000.0 + 0.5) AS BIGINT))
               AS DOUBLE) / 100000000.0 AS inside_pos,
             CAST(SUM(CAST(floor(
               greatest(0.0, least(-1.0, hi) - greatest(-64.0, lo))
                 / (hi - lo) * c * 100000000.0 + 0.5) AS BIGINT))
               AS DOUBLE) / 100000000.0 AS inside_neg
      FROM spans GROUP BY 1, 2
    ),
    stdv AS (
      -- Prometheus funcHistogramStdDev: observations at the bucket's
      -- GEOMETRIC midpoint (negated on the negative side, 0 for the
      -- zero-straddling bucket); accumulated in span order via
      -- list_reduce to mirror the engine's fold order
      SELECT s.etype, s.ts,
             list_reduce(
               list_prepend(0.0,
                 list(s.c
                      * (CASE WHEN s.hi <= 0 THEN -sqrt(s.lo * s.hi)
                              WHEN s.lo >= 0 THEN sqrt(s.lo * s.hi)
                              ELSE 0.0 END - cell.vsum / cell.cnt)
                      * (CASE WHEN s.hi <= 0 THEN -sqrt(s.lo * s.hi)
                              WHEN s.lo >= 0 THEN sqrt(s.lo * s.hi)
                              ELSE 0.0 END - cell.vsum / cell.cnt)
                      ORDER BY s.sgn, s.ok)),
               (a, b) -> a + b) / cell.cnt AS stdvar
      FROM spans s JOIN cell USING (etype, ts)
      GROUP BY s.etype, s.ts, cell.vsum, cell.cnt
    )
    SELECT {hschema} AS hschema, cell.etype,
           strftime(cell.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           cell.cnt AS n_obs,
           cell.vsum / cell.cnt AS avg_v,
           COALESCE(pick.qv, lastb.hi_max) AS q90,
           -- an all-NaN cell has no spans (frac/stdv rows absent):
           -- fraction is 0 (nothing provably inside any range) and
           -- stddev is NaN (the mean is NaN), matching the engine's
           -- hist_fraction/hist_stdvar contract exactly
           COALESCE(frac.inside_pos, 0.0) / cell.cnt AS frac_1_64,
           COALESCE(frac.inside_neg, 0.0) / cell.cnt AS frac_neg,
           CASE WHEN isnan(cell.vsum) THEN 'NaN'::DOUBLE
                ELSE sqrt(stdv.stdvar) END AS stddev_v
    FROM cell
    LEFT JOIN pick USING (etype, ts)
    LEFT JOIN lastb USING (etype, ts)
    LEFT JOIN frac USING (etype, ts)
    LEFT JOIN stdv USING (etype, ts)
    """


@query(
    "promql_native_histogram",
    _nh_sql(1.0, 0) + "\n    UNION ALL\n" + _nh_sql(8.0, 3),
)
def promql_native_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus 3.x native histograms end-to-end, FULL schema
    (VERDICT r9 item 4; negative buckets round 11): events roll up
    into one sparse-exponential-bucket histogram SAMPLE per
    (event_type, day) — schema 0, zero_threshold 0.1, and every third
    user's observations NEGATED so all three bucket regions populate
    (negative buckets, the zero bucket via the 0.01-valued
    observations, positive buckets), and every 97th user's poisoned to
    NaN (round 11.5 — the spec's NaN treatment: count increments, sum
    becomes NaN, no bucket; at sf0.001 one cell is 40% NaN, pushing
    the 0.9-rank past the bucketed mass so the quantile tail clamp is
    genuinely exercised) — and the native-histogram PromQL
    functions evaluate over the sketch through the real front end:
    histogram_count, histogram_avg (sum/count),
    histogram_quantile(0.9, ·) dispatched on the `hist` column (the
    same function name serves classic `le` series elsewhere in the
    suite), histogram_fraction over a positive range (1, 64) AND a
    negative range (-64, -1), and histogram_stddev
    (geometric-midpoint estimator, negated on the negative side).

    Scale shape: the builder is two hash aggregations (obs →
    (cell, sign, idx) counts → per-cell arrays); every function is a
    scan-local F.aggregate fold over the row's own unified
    value-ascending span list (_bucket_spans — negative buckets
    reversed, zero-bucket bounds per promql/quantile.go, positive
    buckets) — zero additional shuffles, no Python.  The five
    evaluations share one persisted sketch table; the twin re-derives
    the identical span list relationally (window cumulative +
    crossing-span interpolation over the same ordering key).
    Determinism: integral bucket counts, pow(2, int) bounds, fold in
    span order on both engines, fraction contributions quantized to 8
    decimals before the order-independent integer sum."""
    from kafka_metrics_exporter_spark.promql.native_hist import (
        native_histogram_table,
    )

    ev = _t(spark, sf_dir, "events")
    signed = (
        F.when((F.col("user_id") % 97) == 0, F.lit(float("nan")))
        .when((F.col("user_id") % 3) == 0, -F.col("value"))
        .otherwise(F.col("value"))
    )
    samples = ev.select(
        F.lit("jmx_latency").alias("name"),
        F.col("event_type").alias("etype"),
        F.date_trunc("day", F.col("ts")).alias("ts"),
        signed.alias("value"),
    )
    exprs = {
        "n_obs": "histogram_count(jmx_latency)",
        "avg_v": "histogram_avg(jmx_latency)",
        "q90": "histogram_quantile(0.9, jmx_latency)",
        "frac_1_64": "histogram_fraction(1, 64, jmx_latency)",
        "frac_neg": "histogram_fraction(-64, -1, jmx_latency)",
        "stddev_v": "histogram_stddev(jmx_latency)",
    }
    # round 12 (VERDICT r11 item 5): the SAME six functions evaluate
    # over TWO sketch resolutions — schema 0 (pow-of-2 buckets, exact
    # bounds) and schema 3 (Prometheus 3.x's default, 8 buckets per
    # octave, fractional-pow bounds; see _nh_sql for the float stance).
    # The builder INPUT (scan + sign/NaN classification) is shared:
    # persisted once, both schema legs aggregate from it (VERDICT r12
    # item 6 — only the per-schema idx math differs between legs).
    samples = samples.persist()
    parts, sketches = [], [samples]
    # The 12 per-function evaluations are independent LAZY plan builds
    # over the two persisted sketch tables — each costs ~0.25 s of
    # driver-side py4j/Catalyst analysis and zero cluster work, so
    # build them from a small thread pool (optimization r16, guide
    # §2.6 applied to plan construction: py4j releases the GIL on the
    # socket wait, so analysis overlaps).  Join order below is
    # unchanged, so the final plan — and the result — is identical to
    # the sequential build.
    from concurrent.futures import ThreadPoolExecutor

    def _build(args):
        ht_, alias_, text_ = args
        return alias_, (
            compile_promql(text_)
            .evaluate(ht_)
            .withColumnRenamed("value", alias_)
        )

    with ThreadPoolExecutor(max_workers=6) as pool:
        for hschema in (0, 3):
            ht = native_histogram_table(
                samples, ["name", "etype"], schema=hschema,
                zero_threshold=0.1,
            ).persist()
            sketches.append(ht)
            built = dict(
                pool.map(_build, [(ht, a, t) for a, t in exprs.items()])
            )
            out = None
            for alias in exprs:
                part = built[alias]
                out = part if out is None else out.join(part, ["etype", "ts"])
            parts.append(out.withColumn("hschema", F.lit(hschema)))
    out = parts[0].unionByName(parts[1]).select(
        "hschema",
        "etype",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        "n_obs", "avg_v", "q90", "frac_1_64", "frac_neg", "stddev_v",
    )
    return _finish_cached(out, *sketches)
