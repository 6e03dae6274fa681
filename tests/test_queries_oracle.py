"""Oracle-checked operator tests (SURVEY.md §5 strategy item 1): every
declared query must match its DuckDB oracle at sf0.001 (the driver
re-runs the same gate at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from kafka_metrics_exporter_spark.plans.oracle import compare, register_views

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    register_views(con, sf_dir)
    yield con
    con.close()


def test_every_oracle_key_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert sdf is not None
        return
    odf = duck.execute(ORACLES[name]).df()
    problems = compare(sdf, odf)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"event_type", "total_value", "n_events", "latest_value"} <= set(
        df.columns
    )


def test_a5_approx_within_5pct_of_exact(spark, sf_dir):
    """Driver-visible evidence for the no_oracle a5 row: the HLL
    estimate (rsd=0.01) stays within 5% of the exact per-group
    cardinality — the bound ES's own HLL `cardinality` agg documents."""
    approx = {
        r["event_type"]: r["approx_distinct_users"]
        for r in QUERIES["a5_approx_count_distinct"](spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["distinct_users"]
        for r in QUERIES["a5_count_distinct"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) / ex <= 0.05, (et, approx[et], ex)


def test_a11b_approx_within_tolerance_of_exact(spark, sf_dir):
    """Driver-visible evidence for the no_oracle a11b row: every
    t-digest percentile estimate (accuracy=10000) stays within 1%
    relative error of the exact interpolated percentile per group."""
    cols = ["p50_price", "p95_price", "p99_price"]
    approx = {
        r["l_returnflag"]: [r[c] for c in cols]
        for r in QUERIES["a11b_approx_percentile"](spark, sf_dir).collect()
    }
    exact = {
        r["l_returnflag"]: [r[c] for c in cols]
        for r in QUERIES["a11_percentile"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)
    for flag, ex in exact.items():
        for a, e in zip(approx[flag], ex):
            assert abs(a - e) / e <= 0.01, (flag, a, e)
