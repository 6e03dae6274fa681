"""Reusable relational operators matching the reference's dashboard
query semantics (SURVEY.md §2.4-2.6).

These are thin, plan-shaped helpers: each returns a DataFrame built
only from built-in expressions so Catalyst can push filters through
them and AQE can re-plan the shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """A6/W4 latest-value per key: Kibana ``top_hits`` size=1 sorted by
    ``createdDateTime desc`` (reference ELK/jmx_dashboard.json:88,186,242,452).

    Deterministic under timestamp ties via explicit ``tiebreakers``
    (SURVEY §7 hard-part 3).  Implemented as a ranking window — one
    shuffle on ``keys``; at scale the partition count follows
    ``spark.sql.shuffle.partitions`` and AQE coalescing.
    """
    order = [F.col(ts_col).desc()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: Column | str,
    k: int,
    descending: bool = True,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """W3 ``topk(k, …)`` per group (reference Grafana PromQL, e.g.
    Prometheus/…/Kafka_Brokers_Dashboard.json:1046).

    ``row_number`` (not ``rank``) keeps output cardinality exactly
    k·groups, matching PromQL topk.  The rank window shuffles once on
    ``group_cols``; Spark's WindowExec applies a per-partition top-k
    (rank limit) pushdown when the filter is on ``row_number``.

    An EMPTY ``group_cols`` (global top-k) never uses a window: the
    partition spec would be empty and Spark moves the whole relation to
    one task; ``orderBy().limit(k)`` gives the identical row set as a
    TakeOrderedAndProject — per-partition top-k partials merged on the
    driver, no shuffle concentration (same rule as the Kibana
    compiler's top-level ordered terms).
    """
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    order = [oc.desc() if descending else oc.asc()]
    order += [F.col(t).asc() for t in tiebreakers]
    if not group_cols:
        return df.orderBy(*order).limit(k)
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def rate_per_second(
    df: DataFrame,
    series_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """W2 PromQL-style ``rate(counter[…])``: per-second derivative of a
    monotonic counter with counter-reset handling (reference dashboards,
    e.g. Prometheus/…/Kafka_Brokers_Dashboard.json:540,949).

    Semantics pinned per SURVEY §7 hard-part 2: exact successive-sample
    delta (no PromQL extrapolation); counter resets (negative deltas)
    clamp the delta to the post-reset value, like Prometheus.  Returns
    the input plus ``rate_per_sec`` (null for each series' first sample).
    """
    order = [F.col(ts_col).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(c) for c in series_cols]).orderBy(*order)
    prev_v = F.lag(value_col).over(w)
    prev_ts = F.lag(ts_col).over(w)
    delta_v = F.when(
        F.col(value_col) >= prev_v, F.col(value_col) - prev_v
    ).otherwise(F.col(value_col))  # counter reset: restart from 0
    # seconds via EXACT integer-micros subtraction, then ONE division —
    # casting each timestamp to double first loses ~1e-7 s per endpoint
    # (epoch doubles have 2.4e-7 ulp), which drifts every rate by ~1e-6
    # relative vs an integer-exact oracle and visibly skews big sums of
    # rates; this form matches epoch_us()-style SQL bit-for-bit
    delta_t = (
        (F.unix_micros(F.col(ts_col)) - F.unix_micros(prev_ts)) / F.lit(1_000_000.0)
    )
    return df.withColumn(
        "rate_per_sec",
        F.when(prev_ts.isNull() | (delta_t <= 0), F.lit(None).cast("double")).otherwise(
            delta_v / delta_t
        ),
    )
