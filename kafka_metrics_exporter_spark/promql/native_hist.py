"""Prometheus 3.x native histograms (VERDICT r9 item 4): the
sparse-exponential-bucket histogram type and the PromQL functions that
consume it — ``histogram_count`` / ``histogram_sum`` /
``histogram_avg`` / ``histogram_stddev`` / ``histogram_stdvar`` /
``histogram_fraction(lo, hi, v)``, the native-schema branch of
``histogram_quantile(φ, v)``, and the sketch arithmetic behind
``rate()``/``increase()``/``delta()`` over histogram series
(``hist_delta`` — the result is again a histogram sample, so
``histogram_quantile(0.9, rate(m[5m]))`` composes).

Representation.  A native-histogram sample is ONE row whose ``hist``
struct column carries the sketch (instead of one series per ``le``
bucket, the classic encoding the engine already supports):

    hist: struct<count double, sum double,
                 zero_count double, zero_threshold double,
                 schema int, idx array<int>, cnt array<double>>

Bucket ``i`` covers ``(base^(i-1), base^i]`` with ``base =
2^(2^-schema)`` — the exponential mapping from the Prometheus native
histogram spec (prometheus/prometheus model/histogram/*.go).  The
arrays are sparse (populated buckets only) and sorted by ``idx``.

Supported subset, pinned loudly:

- POSITIVE buckets + the zero bucket.  Observations below
  ``-zero_threshold`` would need the negative-bucket arrays; the
  builder raises on them (raise_error inside the ordered when-chain).
- The zero bucket counts observations with ``|v| <= zero_threshold``
  and interpolates linearly over ``[-zt, zt]`` (quantile from 0 for
  positive-only data).
- Within-bucket LINEAR interpolation for quantile and fraction, with
  the lowest populated bucket's effective lower bound clamped to the
  zero threshold — the promql/quantile.go rules for classic buckets
  carried to the exponential mapping.

Scale shape: the builder is two hash aggregations (events →
(series, ts, idx) counts → per-cell arrays); every consuming function
is a pure fold (F.aggregate) over the row's own bucket arrays —
scan-local, zero shuffles, no Python.  Cross-engine determinism: the
fold walks buckets in idx order on both engines, bucket bounds are
``pow(2, int)`` (exact), counts are integral doubles, and fraction
contributions are quantized to 8 decimals before the order-independent
integer sum (the _lsum rule from plans/queries.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HIST_COL = "hist"


def _pow2(e: Column, schema_col: Column) -> Column:
    """base^e = 2^(e / 2^schema) — exact for schema=0 (integral
    exponents).  Non-zero schemas evaluate pow with fractional
    exponents, which may differ by 1 ulp across engines; the registry
    oracle pins schema=0."""
    return F.pow(
        F.lit(2.0),
        e.cast("double") / F.pow(F.lit(2.0), schema_col.cast("double")),
    )


def native_histogram_table(
    df: DataFrame,
    series_cols: list[str],
    ts_col: str = "ts",
    value_col: str = "value",
    schema: int = 0,
    zero_threshold: float = 0.0,
    sum_decimals: int = 8,
) -> DataFrame:
    """Roll raw observations up into one native-histogram sample per
    (series, instant) cell — the ingestion side of Prometheus 3.x
    native histograms (a scrape produces one histogram sample, not one
    series per bucket).

    ``sum`` accumulates via the scaled-integer quantization
    (``floor(v·1e8 + 0.5)`` summed exactly, then descaled) so the
    field is identical across engines and partitionings regardless of
    float-add order.  KNOWN LIMIT: the per-row floor saturates at the
    64-bit boundary, so observations above ~9.2e10 corrupt ``sum``
    (count/quantile/fraction stay exact at any magnitude — the bucket
    index is logarithmic); metrics-domain values are orders of
    magnitude below this."""
    v = F.col(value_col)
    factor = float(2**schema)
    idx = F.ceil(F.log2(v) * F.lit(factor)).cast("int")
    zt = float(zero_threshold)
    # NULL and NaN observations DROP (unparseable/poisoned scrape
    # samples); without this filter they fall through the when-chain —
    # NULL into the misleading negative-bucket raise, NaN into the
    # positive branch where ceil(log2(NaN)) hits an ANSI cast error
    # (code-review r10 twice).  KNOWN DIVERGENCE: Prometheus keeps a
    # NaN observation in count and poisons sum — the exact-integral
    # sum representation here cannot carry a NaN, so the sample drops
    # whole instead.
    df = df.filter(v.isNotNull() & ~F.isnan(v))
    bucket = (
        F.when(v > F.lit(zt), idx)
        .when(v >= F.lit(-zt), F.lit(None).cast("int"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "native_histogram_table: observations below "
                    "-zero_threshold need negative buckets (unsupported)"
                )
            ).cast("int")
        )
    )
    scaled = F.floor(v * F.lit(1e8) + F.lit(0.5)).cast("decimal(38,0)")
    per_idx = (
        df.select(*series_cols, F.col(ts_col).alias("ts"), bucket.alias("__idx"), scaled.alias("__sv"))
        .groupBy(*series_cols, "ts", "__idx")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__c"),
            F.sum("__sv").alias("__s"),
        )
    )
    zero_cnt = F.sum(F.when(F.col("__idx").isNull(), F.col("__c")).otherwise(F.lit(0.0)))
    pos = F.sort_array(
        F.collect_list(
            F.when(
                F.col("__idx").isNotNull(),
                F.struct(F.col("__idx").alias("i"), F.col("__c").alias("c")),
            )
        )
    )
    return per_idx.groupBy(*series_cols, "ts").agg(
        F.struct(
            F.sum("__c").alias("count"),
            (F.sum("__s").cast("double") / F.lit(1e8)).alias("sum"),
            zero_cnt.alias("zero_count"),
            F.lit(zt).alias("zero_threshold"),
            F.lit(int(schema)).alias("schema"),
            F.transform(pos, lambda s: s["i"]).alias("idx"),
            F.transform(pos, lambda s: s["c"]).alias("cnt"),
        ).alias(HIST_COL)
    )


def hist_count(h: Column) -> Column:
    return h["count"]


def hist_sum(h: Column) -> Column:
    return h["sum"]


def hist_avg(h: Column) -> Column:
    return F.when(h["count"] > 0, h["sum"] / h["count"])


def hist_quantile(h: Column, phi: float) -> Column:
    """Native-schema histogram_quantile: rank = φ·count walks the zero
    bucket then the positive buckets in idx order; linear interpolation
    inside the crossing bucket, with the bucket's effective lower bound
    clamped to the zero threshold.  φ outside [0, 1] returns ±Inf like
    Prometheus; an empty histogram returns NULL."""
    if phi < 0:
        return F.lit(float("-inf"))
    if phi > 1:
        return F.lit(float("inf"))
    count, zc, zt = h["count"], h["zero_count"], h["zero_threshold"]
    rank = F.lit(float(phi)) * count
    q0 = F.when(
        (zc > 0) & (rank <= zc),
        zt * rank / zc,
    ).cast("double")
    init = F.struct(
        zc.cast("double").alias("cum"),
        q0.alias("q"),
        zt.cast("double").alias("lu"),  # running highest upper bound
    )
    pairs = F.arrays_zip(h["idx"].alias("i"), h["cnt"].alias("c"))

    def step(acc, b):
        upper = _pow2(b["i"], h["schema"])
        lower = F.greatest(_pow2(b["i"] - 1, h["schema"]), zt)
        hit = acc["q"].isNull() & (b["c"] > 0) & (acc["cum"] + b["c"] >= rank)
        q = F.when(
            hit, lower + (upper - lower) * (rank - acc["cum"]) / b["c"]
        ).otherwise(acc["q"])
        return F.struct(
            (acc["cum"] + b["c"]).alias("cum"),
            q.alias("q"),
            F.greatest(acc["lu"], upper).alias("lu"),
        )

    folded = F.aggregate(pairs, init, step)
    return F.when(count > 0, F.coalesce(folded["q"], folded["lu"]))


def hist_stdvar(h: Column) -> Column:
    """histogram_stdvar: Prometheus's native-histogram variance
    estimator (promql/functions.go funcHistogramStdDev/StdVar) — every
    observation in a bucket is assumed at the bucket's GEOMETRIC
    midpoint ``sqrt(lower·upper)`` (0 for the zero bucket), variance =
    Σ cnt·(mid − mean)² / count.  Prometheus Kahan-sums the
    accumulation; this fold adds in idx order — the same order the
    oracle twin replays, so results are engine-identical (and within
    float error of Kahan on metric-sized histograms)."""
    count, zc, mean = h["count"], h["zero_count"], h["sum"] / h["count"]
    pairs = F.arrays_zip(h["idx"].alias("i"), h["cnt"].alias("c"))
    zero_term = zc * (F.lit(0.0) - mean) * (F.lit(0.0) - mean)

    def step(acc, b):
        mid = F.sqrt(_pow2(b["i"], h["schema"]) * _pow2(b["i"] - 1, h["schema"]))
        return acc + b["c"] * (mid - mean) * (mid - mean)

    return F.when(count > 0, F.aggregate(pairs, zero_term, step) / count)


def hist_stddev(h: Column) -> Column:
    return F.sqrt(hist_stdvar(h))


def hist_fraction(h: Column, lo: float, hi: float) -> Column:
    """histogram_fraction(lo, hi, v): estimated fraction of
    observations in [lo, hi] — per-bucket linear overlap (effective
    lower bound clamped to the zero threshold) plus the zero bucket's
    overlap over [-zt, zt], divided by count.  Per-bucket
    contributions quantize to 8 decimals before an exact integral sum,
    so the total is order-independent and engine-identical."""
    lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    count, zc, zt = h["count"], h["zero_count"], h["zero_threshold"]
    zero_part = F.when(
        (zc > 0) & (zt > 0),
        F.greatest(
            F.lit(0.0), F.least(hi_c, zt) - F.greatest(lo_c, -zt)
        ) / (zt * 2) * zc,
    ).otherwise(
        # zt == 0: the zero bucket is the point mass at 0
        F.when((zc > 0) & (lo_c <= 0) & (hi_c >= 0), zc).otherwise(F.lit(0.0))
    )
    pairs = F.arrays_zip(h["idx"].alias("i"), h["cnt"].alias("c"))

    def contrib(b):
        upper = _pow2(b["i"], h["schema"])
        lower = F.greatest(_pow2(b["i"] - 1, h["schema"]), zt)
        ov = F.greatest(F.lit(0.0), F.least(hi_c, upper) - F.greatest(lo_c, lower))
        return F.floor(ov / (upper - lower) * b["c"] * F.lit(1e8) + F.lit(0.5))

    total = (
        F.aggregate(pairs, F.lit(0.0), lambda acc, b: acc + contrib(b))
        / F.lit(1e8)
        + F.floor(zero_part * F.lit(1e8) + F.lit(0.5)) / F.lit(1e8)
    )
    return F.when(count > 0, total / count)


def hist_delta(cur: Column, prev: Column, scale: Column, clamp: bool) -> Column:
    """Bucket-wise difference of two native-histogram samples of ONE
    series (consecutive scrapes), times ``scale`` — the sketch behind
    rate()/increase()/delta() over native histograms: Prometheus
    subtracts histograms field-wise and bucket-wise, yielding a
    histogram of (fractional) per-second observation rates that the
    histogram_* functions consume unchanged.

    ``clamp=True`` is the counter rule, mirroring the engine's scalar
    rate: the delta restarts from ``cur`` when ANY monotone component
    decreased — total count, zero_count, sum, or any individual bucket
    (Prometheus's detectReset checks every bucket, not just the total:
    a restart that re-accrues FASTER than the old total, e.g. prev
    {idx2: 3} → cur {idx1: 4}, has count 4 > 3 but a negative bucket
    delta — code-review r10; schema/threshold shrink, the remaining
    Prometheus signals, cannot occur under this module's constant-
    schema builder).  ``clamp=False`` (delta/idelta) subtracts
    verbatim — negatives are data, as for scalar gauges.

    The bucket union is a map_zip_with over the sparse (idx → cnt)
    maps; zero-delta buckets drop so the result stays sparse.  All
    scan-local — rate adds ONE lag window over the series, nothing
    else."""
    merged = F.map_zip_with(
        F.map_from_arrays(cur["idx"], cur["cnt"]),
        F.map_from_arrays(prev["idx"], prev["cnt"]),
        lambda _, a, b: F.coalesce(a, F.lit(0.0)) - F.coalesce(b, F.lit(0.0)),
    )
    raw_entries = F.array_sort(F.map_entries(merged))
    reset = (
        (
            (prev["count"] > cur["count"])
            | (prev["zero_count"] > cur["zero_count"])
            | (prev["sum"] > cur["sum"])
            | F.exists(raw_entries, lambda e: e["value"] < 0)
        )
        if clamp
        else F.lit(False)
    )
    entries = F.filter(raw_entries, lambda e: e["value"] != 0)
    d_idx = F.when(reset, cur["idx"]).otherwise(
        F.transform(entries, lambda e: e["key"])
    )
    d_cnt = F.when(reset, cur["cnt"]).otherwise(
        F.transform(entries, lambda e: e["value"])
    )

    def field(name: str) -> Column:
        return F.when(reset, cur[name]).otherwise(cur[name] - prev[name]) * scale

    return F.struct(
        field("count").alias("count"),
        field("sum").alias("sum"),
        field("zero_count").alias("zero_count"),
        cur["zero_threshold"].alias("zero_threshold"),
        cur["schema"].alias("schema"),
        d_idx.alias("idx"),
        F.transform(d_cnt, lambda c: c * scale).alias("cnt"),
    )
