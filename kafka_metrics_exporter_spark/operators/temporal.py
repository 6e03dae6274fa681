"""Temporal join operators: as-of (nearest-prior) join and bucketed
range join.

The reference has no temporal joins (SURVEY §2.3 "absent" list), but a
metrics store feeding dashboards needs both constantly: align every
sample with the latest config/deploy event for its series (as-of), and
aggregate the events that fall inside a trailing window anchored at
another stream's rows (range).  Neither exists as a Spark built-in, so
these are compositions of existing DataFrame ops — no UDFs, no
``collect()``, and crucially NO range-explode of the big side.

Scale design (100 TB):

- ``asof_join`` is the union–carry-forward form: tag both inputs, union
  them, and run ONE window over (keys) ordered by time, carrying the
  last right-side payload forward.  Cost = one shuffle of |L|+|R| rows
  on the join keys — the same shuffle a plain equi-join would pay — and
  per-row state is a single struct.  The naive alternatives either
  explode (|L|×|R| per key for a theta join) or collect per-key arrays.
  This is the distributed form of pandas ``merge_asof`` / Flink's
  event-time temporal join.
- ``range_join_bucketed`` equi-joins on (keys, time-bucket) with the
  left side expanded to the two candidate buckets that can contain its
  window (window length ≤ bucket width ⇒ exactly 2), then applies the
  exact range predicate.  Cost = 2|L|+|R| shuffled rows instead of the
  per-key cross product a raw ``l.ts <= r.ts < l.ts+w`` join plans as
  (BroadcastNestedLoopJoin — quadratic and driver-broadcast-bound).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ATS = "__asof_ts"
_SIDE = "__asof_side"
_RPAY = "__asof_right"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join: each left row gains the ``right_cols`` of the right
    row with the greatest ``right_ts`` ≤ ``left_ts`` (direction
    "backward", the default) or the smallest ``right_ts`` ≥ ``left_ts``
    (direction "forward") for the same ``on`` keys — null when no such
    row, or when it is further away than ``tolerance_seconds``.

    Right rows that tie on (keys, right_ts) are resolved by the ORDER of
    the union window, which is not deterministic — pre-aggregate the
    right side to one row per (keys, ts) (e.g. ``max_by``) when ties are
    possible, as plans/queries.py's asof query does.

    Null semantics: a null ``left_ts`` sorts first and matches nothing
    (= SQL unknown-comparison).  Null join KEYS, however, fall into one
    window partition and DO match each other — unlike an equi-join;
    filter null keys out first if SQL join semantics are required.
    """
    keys = list(on)
    lcols = left.columns
    l2 = left.select(
        *lcols,
        F.col(left_ts).alias(_ATS),
        F.lit(1).alias(_SIDE),
        F.lit(None)
        .cast(
            "struct<"
            + ", ".join(f"`{c}`: {dict(right.dtypes)[c]}" for c in right_cols)
            + ">"
        )
        .alias(_RPAY),
    )
    # a right row with an unknown timestamp can never be "the latest
    # prior/next row" — drop it, or its payload would be carried from
    # wherever nulls happen to sort
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(_ATS),
        F.lit(0).alias(_SIDE),
        F.struct(*[F.col(c) for c in right_cols]).alias(_RPAY),
    ).select(*lcols, _ATS, _SIDE, _RPAY)

    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: direction must be backward/forward, got {direction!r}")
    # Right rows sort BEFORE left rows at an equal timestamp (side 0 < 1)
    # so the boundary is inclusive in either direction; "forward" simply
    # walks time descending so the carry holds the NEXT right row.
    # nulls FIRST under either direction: a null timestamp must sort
    # before every right row so it carries nothing (plain .desc() puts
    # nulls LAST, where a null left_ts would wrongly match the earliest
    # right row)
    ts_order = (
        F.col(_ATS).asc_nulls_first()
        if direction == "backward"
        else F.col(_ATS).desc_nulls_first()
    )
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(_RPAY, ignorenulls=True).over(w)
    carried_ts = F.last(F.when(F.col(_SIDE) == 0, F.col(_ATS)), ignorenulls=True).over(w)

    # Both carries share one window spec → a single Window node after
    # the one hash-partition Exchange (asserted in tests/test_temporal.py).
    out = (
        l2.union(r2.select(*l2.columns))
        .select("*", carried.alias("__carried"), carried_ts.alias("__carried_ts"))
        .filter(F.col(_SIDE) == 1)
    )
    if tolerance_seconds is not None:
        gap = F.col(_ATS).cast("double") - F.col("__carried_ts").cast("double")
        in_tol = (gap if direction == "backward" else -gap) <= F.lit(tolerance_seconds)
        out = out.withColumn(
            "__carried", F.when(in_tol, F.col("__carried"))
        ).withColumn("__carried_ts", F.when(in_tol, F.col("__carried_ts")))
    return out.select(
        *lcols,
        F.col("__carried_ts").alias("asof_ts"),
        *[F.col(f"__carried.{c}").alias(c) for c in right_cols],
    )


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Inner join of each left row with every right row of the same
    ``on`` keys whose ``right_ts`` falls in ``[left_ts, left_ts +
    window_seconds)``.  Right columns are returned under a ``r_``
    prefix; callers aggregate per left row.

    The bucket width equals the window length, so a left window spans at
    most two buckets — the left side is expanded to exactly those two
    (keys, bucket) candidates and the join is a plain equi-join that
    Catalyst plans as a shuffled hash join (or broadcast, if one side is
    small), never a nested-loop theta join.
    """
    keys = list(on)
    lb = F.floor(F.col(left_ts).cast("double") / F.lit(window_seconds))
    rb = F.floor(F.col(right_ts).cast("double") / F.lit(window_seconds)).alias("__bucket")

    l2 = left.withColumn("__bucket", F.explode(F.array(lb, lb + 1)))
    # a right row with an unknown timestamp can never be "the latest
    # prior/next row" — drop it, or its payload would be carried from
    # wherever nulls happen to sort
    right = right.filter(F.col(right_ts).isNotNull())
    r2 = right.select(
        *[F.col(k).alias(f"__rk_{k}") for k in keys],
        rb,
        *[
            F.col(c).alias(f"r_{c}")
            for c in right.columns
            if c not in keys
        ],
    )
    cond = [l2["__bucket"] == r2["__bucket"]] + [
        l2[k] == r2[f"__rk_{k}"] for k in keys
    ]
    joined = l2.join(r2, cond, "inner").filter(
        (F.col(f"r_{right_ts}") >= F.col(left_ts))
        & (
            F.col(f"r_{right_ts}").cast("double")
            < F.col(left_ts).cast("double") + F.lit(window_seconds)
        )
    )
    return joined.drop("__bucket", *[f"__rk_{k}" for k in keys])
