"""Differential test for the PromQL compiler: random expressions from
the agg-over-selector subset are compiled to Spark AND translated to
DuckDB SQL directly from the AST by an independent mini code
generator; both run on the same metrics view of the events table and
must agree row-for-row.  Complements the hand-written oracle queries
(which pin 4 fixed shapes) with breadth across matcher/grouping
combinations."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.promql import compile_promql
from kafka_metrics_exporter_spark.promql.parser import Agg, Cmp, Selector, parse

LABELS = ["event_type", "user_id"]

_AGG_SQL = {
    "sum": "SUM(value)",
    "avg": "AVG(value)",
    "min": "MIN(value)",
    "max": "MAX(value)",
    "count": "CAST(COUNT(*) AS DOUBLE)",
    "stddev": "coalesce(stddev_pop(value), 0)",
}


def _sql_for(ast, metrics_cte: str) -> str:
    """Independent AST → DuckDB translation for Agg(Selector) (+Cmp)."""
    cmp_clause = ""
    if isinstance(ast, Cmp):
        cmp_clause = f"HAVING {_AGG_SQL[ast.expr.op]} {ast.op} {ast.threshold!r}"
        ast = ast.expr
    assert isinstance(ast, Agg) and isinstance(ast.expr, Selector)
    sel = ast.expr
    preds = [f"name = '{sel.name}'"]
    for m in sel.matchers:
        col = f"coalesce({m.label}, '')"
        if m.op == "=":
            preds.append(f"{col} = '{m.value}'")
        elif m.op == "!=":
            preds.append(f"{col} <> '{m.value}'")
        elif m.op == "=~":
            preds.append(f"regexp_matches({col}, '^(?:{m.value})$')")
        else:
            preds.append(f"NOT regexp_matches({col}, '^(?:{m.value})$')")
    if ast.by is not None:
        out = list(ast.by)
    elif ast.without is not None:
        out = sorted(set(LABELS) - set(ast.without))
    else:
        out = []  # bare agg drops every label
    group_cols = ", ".join([*out, "ts"]) if out else "ts"
    sel_cols = ", ".join([*out, "strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s"])
    return f"""
    WITH m AS ({metrics_cte})
    SELECT {sel_cols}, round({_AGG_SQL[ast.op]}, 4) AS value
    FROM m WHERE {" AND ".join(preds)}
    GROUP BY {group_cols} {cmp_clause}
    """


_METRICS_CTE = """
  SELECT event_type AS name, event_type, CAST(user_id AS VARCHAR) AS user_id,
         date_trunc('hour', ts) AS ts, CAST(COUNT(*) AS DOUBLE) AS value
  FROM events GROUP BY 1, 2, 3, 4
"""

# 24 expressions sweeping agg ops × grouping modes × matcher ops.
# (name rides along as an `event_type` label so `by (event_type)`
# grouping is expressible.)
EXPRS = [
    'sum by (user_id) (click)',
    'avg by (user_id) (view)',
    'min by (user_id) (error)',
    'max by (user_id) (signup)',
    'count by (user_id) (purchase)',
    'stddev by (user_id) (click)',
    'sum (click)',
    'count (view)',
    'sum without (user_id) (click)',
    'sum without (event_type) (error)',
    'sum by (user_id) (click{user_id != ""})',
    'sum by (user_id) (click{user_id = "7"})',
    'avg by (user_id) (view{user_id =~ "1[0-9]"})',
    'count by (user_id) (error{user_id !~ "[0-5].*"})',
    'max by (user_id) (signup{user_id =~ "2|4|6"})',
    'sum by (user_id) (click) > 3',
    'count by (user_id) (view) >= 2',
    'sum (purchase) < 100',
    'avg by (user_id) (click{user_id != "3"})',
    'stddev (error)',
    'min (signup{user_id =~ ".*1"})',
    'sum by (event_type) (click)',
    'count without (user_id, event_type) (view)',
    'avg (purchase{user_id !~ "9.*"})',
]


@pytest.fixture(scope="module")
def metrics_view(spark, sf_dir):
    from kafka_metrics_exporter_spark.plans.queries import _t

    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        F.col("event_type").alias("name"),
        F.col("event_type"),
        F.col("user_id").cast("string").alias("user_id"),
        F.date_trunc("hour", F.col("ts")).alias("ts"),
    ).agg(F.count(F.lit(1)).cast("double").alias("value"))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("expr", EXPRS)
def test_compiled_expr_matches_duckdb(expr, spark, metrics_view, duck):
    ast = parse(expr)
    spark_out = compile_promql(expr).evaluate(metrics_view)
    inner = ast.expr if isinstance(ast, Cmp) else ast
    if inner.by is not None:
        out_labels = list(inner.by)
    elif inner.without is not None:
        out_labels = sorted(set(LABELS) - set(inner.without))
    else:
        out_labels = []
    shaped = spark_out.select(
        *out_labels,
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 4).alias("value"),
    )
    got = {tuple(r) for r in shaped.collect()}
    want = {tuple(r) for r in duck.execute(_sql_for(ast, _METRICS_CTE)).fetchall()}
    assert got == want, (expr, len(got), len(want))


# ---------------------------------------------------------------------------
# Rate differential: sum-by over compiled rate() vs an independent
# epoch_us lag-window translation (bit-exact after the integer-micros
# hardening).
# ---------------------------------------------------------------------------
RATE_EXPRS = [
    ("click", '=', None),
    ("view", None, None),
    ("error", "!=", "7"),
    ("purchase", "=~", "[0-4].*"),
]


@pytest.mark.parametrize("name,op,val", RATE_EXPRS)
def test_compiled_rate_matches_duckdb(name, op, val, spark, metrics_view, duck):
    matcher = ""
    pred = ""
    if op == "=":
        matcher, pred = '{user_id != ""}', "AND coalesce(user_id, '') <> ''"
    elif op == "!=":
        matcher, pred = f'{{user_id != "{val}"}}', f"AND coalesce(user_id,'') <> '{val}'"
    elif op == "=~":
        matcher, pred = (
            f'{{user_id =~ "{val}"}}',
            f"AND regexp_matches(coalesce(user_id,''), '^(?:{val})$')",
        )
    # [2d] window: wide enough for the events cadence yet narrow enough
    # that month-spanning gaps exercise the max-sample-gap null path;
    # the oracle mirrors the same delta_t <= window bound below.
    expr = f"sum by (user_id) (rate({name}{matcher}[2d]))"
    spark_out = compile_promql(expr).evaluate(metrics_view)
    shaped = spark_out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 4).alias("value"),
    )
    got = {tuple(r) for r in shaped.collect()}
    sql = f"""
    WITH m AS ({_METRICS_CTE}),
    f AS (SELECT * FROM m WHERE name = '{name}' {pred}),
    d AS (
      SELECT event_type, user_id, ts, value,
             lag(value) OVER w AS pv, lag(ts) OVER w AS pts
      FROM f WINDOW w AS (PARTITION BY event_type, user_id ORDER BY ts)
    )
    SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           round(SUM((CASE WHEN value >= pv THEN value - pv ELSE value END)
                 / ((epoch_us(ts) - epoch_us(pts)) / 1000000.0)), 4) AS value
    FROM d WHERE pts IS NOT NULL AND epoch_us(ts) > epoch_us(pts)
      AND (epoch_us(ts) - epoch_us(pts)) <= 172800000000::BIGINT
    GROUP BY user_id, ts
    """
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, (expr, len(got), len(want))


# ---------------------------------------------------------------------------
# Set-operator + vector-matching differential: compiled plans vs
# independent EXISTS / join translations over the same sides.
# ---------------------------------------------------------------------------
SETOP_CASES = [
    ("sum by (user_id) (click)", "and", "sum by (user_id) (view)"),
    ("sum by (user_id) (click)", "unless", "sum by (user_id) (purchase)"),
    ("sum by (user_id) (error)", "or", "sum by (user_id) (signup)"),
]


@pytest.mark.parametrize("l,op,r", SETOP_CASES)
def test_setop_matches_duckdb(l, op, r, spark, metrics_view, duck):
    expr = f"({l}) {op} ({r})"
    spark_out = compile_promql(expr).evaluate(metrics_view)
    shaped = spark_out.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 4).alias("value"),
    )
    got = {tuple(rr) for rr in shaped.collect()}
    lsql = f"({_sql_for(parse(l), _METRICS_CTE)})"
    rsql = f"({_sql_for(parse(r), _METRICS_CTE)})"
    if op == "and":
        sql = f"""SELECT a.* FROM {lsql} a WHERE EXISTS (
            SELECT 1 FROM {rsql} b
            WHERE b.user_id = a.user_id AND b.ts_s = a.ts_s)"""
    elif op == "unless":
        sql = f"""SELECT a.* FROM {lsql} a WHERE NOT EXISTS (
            SELECT 1 FROM {rsql} b
            WHERE b.user_id = a.user_id AND b.ts_s = a.ts_s)"""
    else:
        sql = f"""SELECT a.* FROM {lsql} a
            UNION ALL
            SELECT b.* FROM {rsql} b WHERE NOT EXISTS (
              SELECT 1 FROM {lsql} a2
              WHERE a2.user_id = b.user_id AND a2.ts_s = b.ts_s)"""
    want = {tuple(rr) for rr in duck.execute(sql).fetchall()}
    assert got == want, (expr, len(got), len(want))


def test_vector_matching_matches_duckdb(spark, metrics_view, duck):
    """One-to-one on(user_id) and many-to-one group_left against the
    same independent join translation (left side keeps event_type as a
    constant extra label, so group_left genuinely carries a column the
    match keys do not)."""
    l = "sum by (event_type, user_id) (click)"
    r = "sum by (user_id) (view)"
    lsql = f"({_sql_for(parse(l), _METRICS_CTE)})"
    rsql = f"({_sql_for(parse(r), _METRICS_CTE)})"

    one = compile_promql(f"({l}) / on(user_id) ({r})").evaluate(metrics_view)
    got = {
        tuple(rr)
        for rr in one.select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.round("value", 4).alias("value"),
        ).collect()
    }
    want = {
        tuple(rr)
        for rr in duck.execute(
            f"""SELECT a.user_id, a.ts_s, round(a.value / b.value, 4)
            FROM {lsql} a JOIN {rsql} b
            ON a.user_id = b.user_id AND a.ts_s = b.ts_s"""
        ).fetchall()
    }
    assert got == want and got

    # group_left() with the explicit empty include list: a bare
    # `group_left (expr)` would grab the parens as the include list
    # (the same ambiguity Prometheus's own grammar has)
    many = compile_promql(
        f"({l}) / on(user_id) group_left() ({r})"
    ).evaluate(metrics_view)
    got2 = {
        tuple(rr)
        for rr in many.select(
            "event_type",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            F.round("value", 4).alias("value"),
        ).collect()
    }
    want2 = {
        tuple(rr)
        for rr in duck.execute(
            f"""SELECT a.event_type, a.user_id, a.ts_s,
                   round(a.value / b.value, 4)
            FROM {lsql} a JOIN {rsql} b
            ON a.user_id = b.user_id AND a.ts_s = b.ts_s"""
        ).fetchall()
    }
    assert got2 == want2 and got2
