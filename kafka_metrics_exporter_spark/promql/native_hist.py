"""Prometheus 3.x native histograms (VERDICT r9 item 4; negative
buckets completed round 11): the sparse-exponential-bucket histogram
type and the PromQL functions that consume it — ``histogram_count`` /
``histogram_sum`` / ``histogram_avg`` / ``histogram_stddev`` /
``histogram_stdvar`` / ``histogram_fraction(lo, hi, v)``, the
native-schema branch of ``histogram_quantile(φ, v)``, and the sketch
arithmetic behind ``rate()``/``increase()``/``delta()`` over histogram
series (``hist_delta`` — the result is again a histogram sample, so
``histogram_quantile(0.9, rate(m[5m]))`` composes).

Representation.  A native-histogram sample is ONE row whose ``hist``
struct column carries the sketch (instead of one series per ``le``
bucket, the classic encoding the engine already supports):

    hist: struct<count double, sum double,
                 zero_count double, zero_threshold double,
                 schema int, idx array<int>, cnt array<double>,
                 nidx array<int>, ncnt array<double>>

Positive bucket ``i`` covers ``(base^(i-1), base^i]`` and negative
bucket ``i`` covers ``[-base^i, -base^(i-1))`` with ``base =
2^(2^-schema)`` — the exponential mapping from the Prometheus native
histogram spec (prometheus/prometheus model/histogram/*.go).  The
arrays are sparse (populated buckets only) and sorted by ``idx``;
``nidx`` ascending means ascending MAGNITUDE, so value-ascending walks
traverse the negative arrays in reverse.

Semantics, pinned loudly:

- The full 3.x observation domain: negative buckets, the zero bucket
  (``|v| <= zero_threshold``), and positive buckets.  Every consuming
  function walks ONE unified value-ascending span list
  (``_bucket_spans``), mirroring FloatHistogram.AllBucketIterator.
- Zero-bucket bounds follow promql/quantile.go exactly: nominally
  ``[-zt, zt]``; clamped to ``[0, zt]`` when the sample has positive
  but no negative buckets, to ``[-zt, 0]`` when it has negative but no
  positive buckets (both quantile AND fraction — Prometheus applies
  the same adjustment in histogramQuantile and histogramFraction).
- Within-bucket LINEAR interpolation for quantile and fraction, with
  the populated bound nearest zero clamped to ±zero_threshold — the
  promql/quantile.go rules carried to the exponential mapping.
- stddev/stdvar assume each observation at its bucket's GEOMETRIC
  midpoint (negated on the negative side, 0 for a zero-straddling
  bucket), per funcHistogramStdDev.

Scale shape: the builder is two hash aggregations (events →
(series, ts, sign, idx) counts → per-cell arrays); every consuming
function is a pure fold (F.aggregate) over the row's own bucket arrays
— scan-local, zero shuffles, no Python.  Cross-engine determinism: the
fold walks spans in value order on both engines, bucket bounds are
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
    exponents, which may differ by <= 1 ulp across engines' libm; the
    registry oracle hash-attests schema 0 (bit-exact) AND schema 3
    (Prometheus 3.x's default — round 12, the ulp slack absorbed by
    the comparison layer's 4-decimal rounding; see plans/
    promql_queries.py _nh_sql for the documented float stance)."""
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
    series per bucket).  Observations above ``zero_threshold`` land in
    positive buckets, below ``-zero_threshold`` in negative buckets
    (round 11 — the builder previously raised on them), the rest in
    the zero bucket.  NaN observations increment ``count``, poison
    ``sum`` to NaN, and land in no bucket (the spec's treatment; round
    11.5) — consumers therefore see a histogram whose bucketed mass
    can be smaller than ``count``, exactly like Prometheus.

    ``sum`` accumulates via the scaled-integer quantization
    (``floor(v·1e8 + 0.5)`` summed exactly, then descaled) so the
    field is identical across engines and partitionings regardless of
    float-add order.  KNOWN LIMIT: the per-row floor saturates at the
    64-bit boundary, so observations beyond ~±9.2e10 corrupt ``sum``
    (count/quantile/fraction stay exact at any magnitude — the bucket
    index is logarithmic); metrics-domain values are orders of
    magnitude below this."""
    v = F.col(value_col)
    factor = float(2**schema)
    zt = float(zero_threshold)
    # NULL observations DROP (an unparseable scrape sample never
    # happened).  NaN observations follow the Prometheus native
    # histogram spec: they increment ``count``, poison ``sum`` to NaN,
    # and land in NO bucket — tracked here as sign group 2 (round
    # 11.5; r11 dropped them whole, a documented divergence).  The
    # NaN arm must be FIRST in every chain below: Spark compares NaN
    # greater than everything, so it would otherwise fall into the
    # positive branch where ceil(log2(NaN)) hits an ANSI cast error
    # (code-review r10 twice).
    df = df.filter(v.isNotNull())
    nan = F.isnan(v)
    sign = (
        F.when(nan, F.lit(2))
        .when(v > F.lit(zt), F.lit(1))
        .when(v >= F.lit(-zt), F.lit(0))
        .otherwise(F.lit(-1))
    )
    bucket = (
        F.when(nan, F.lit(None).cast("int"))
        .when(v > F.lit(zt), F.ceil(F.log2(v) * F.lit(factor)).cast("int"))
        .when(v >= F.lit(-zt), F.lit(None).cast("int"))
        .otherwise(F.ceil(F.log2(-v) * F.lit(factor)).cast("int"))
    )
    scaled = (
        F.when(nan, F.lit(0.0))
        .otherwise(F.floor(v * F.lit(1e8) + F.lit(0.5)))
        .cast("decimal(38,0)")
    )
    per_idx = (
        df.select(
            *series_cols,
            F.col(ts_col).alias("ts"),
            sign.alias("__sgn"),
            bucket.alias("__idx"),
            scaled.alias("__sv"),
        )
        .groupBy(*series_cols, "ts", "__sgn", "__idx")
        .agg(
            F.count(F.lit(1)).cast("double").alias("__c"),
            F.sum("__sv").alias("__s"),
        )
    )
    zero_cnt = F.sum(
        F.when(F.col("__sgn") == 0, F.col("__c")).otherwise(F.lit(0.0))
    )
    nan_cnt = F.sum(
        F.when(F.col("__sgn") == 2, F.col("__c")).otherwise(F.lit(0.0))
    )

    def side(sgn: int) -> Column:
        return F.sort_array(
            F.collect_list(
                F.when(
                    F.col("__sgn") == sgn,
                    F.struct(F.col("__idx").alias("i"), F.col("__c").alias("c")),
                )
            )
        )

    pos, neg = side(1), side(-1)
    return per_idx.groupBy(*series_cols, "ts").agg(
        F.struct(
            F.sum("__c").alias("count"),
            # any NaN observation poisons sum (the spec's NaN arithmetic),
            # while the non-NaN mass still sums exactly via the scaled
            # integers — partitioning-independent either way
            F.when(nan_cnt > 0, F.lit(float("nan")))
            .otherwise(F.sum("__s").cast("double") / F.lit(1e8))
            .alias("sum"),
            zero_cnt.alias("zero_count"),
            F.lit(zt).alias("zero_threshold"),
            F.lit(int(schema)).alias("schema"),
            F.transform(pos, lambda s: s["i"]).alias("idx"),
            F.transform(pos, lambda s: s["c"]).alias("cnt"),
            F.transform(neg, lambda s: s["i"]).alias("nidx"),
            F.transform(neg, lambda s: s["c"]).alias("ncnt"),
        ).alias(HIST_COL)
    )


def hist_count(h: Column) -> Column:
    return h["count"]


def hist_sum(h: Column) -> Column:
    return h["sum"]


def hist_avg(h: Column) -> Column:
    return F.when(h["count"] > 0, h["sum"] / h["count"])


def _bucket_spans(h: Column) -> Column:
    """The sample's buckets as ONE value-ascending array of
    ``struct<lo double, hi double, c double>`` — negative buckets in
    reverse idx order (most negative first, bound nearest zero clamped
    to ``-zt``), then the zero bucket with the promql/quantile.go
    bound adjustment, then positive buckets (lower bound clamped to
    ``zt``).  This mirrors FloatHistogram.AllBucketIterator, so every
    consuming function is one uniform fold."""
    zt = h["zero_threshold"].cast("double")
    zc = h["zero_count"].cast("double")
    has_pos = F.size(h["idx"]) > 0
    has_neg = F.size(h["nidx"]) > 0
    neg = F.transform(
        F.reverse(F.arrays_zip(h["nidx"].alias("i"), h["ncnt"].alias("c"))),
        lambda b: F.struct(
            (-_pow2(b["i"], h["schema"])).alias("lo"),
            F.least(-_pow2(b["i"] - 1, h["schema"]), -zt).alias("hi"),
            b["c"].cast("double").alias("c"),
        ),
    )
    z_lo = F.when(~has_neg & has_pos, F.lit(0.0)).otherwise(-zt)
    z_hi = F.when(~has_pos & has_neg, F.lit(0.0)).otherwise(zt)
    zero = F.when(
        zc > 0,
        F.array(F.struct(z_lo.alias("lo"), z_hi.alias("hi"), zc.alias("c"))),
    ).otherwise(F.array().cast("array<struct<lo:double,hi:double,c:double>>"))
    pos = F.transform(
        F.arrays_zip(h["idx"].alias("i"), h["cnt"].alias("c")),
        lambda b: F.struct(
            F.greatest(_pow2(b["i"] - 1, h["schema"]), zt).alias("lo"),
            _pow2(b["i"], h["schema"]).alias("hi"),
            b["c"].cast("double").alias("c"),
        ),
    )
    return F.concat(neg, zero, pos)


def hist_quantile(h: Column, phi: float) -> Column:
    """Native-schema histogram_quantile: rank = φ·count walks the
    unified span list (negative → zero → positive, value-ascending);
    linear interpolation inside the crossing span.  φ outside [0, 1]
    returns ±Inf like Prometheus; an empty histogram returns NULL.
    NaN observations inflate ``count`` without occupying a bucket
    (see native_histogram_table), so a rank past the bucketed mass
    clamps to the highest populated upper bound — the same clamp an
    over-the-top rank takes in promql/quantile.go."""
    if phi < 0:
        return F.lit(float("-inf"))
    if phi > 1:
        return F.lit(float("inf"))
    count = h["count"]
    rank = F.lit(float(phi)) * count
    init = F.struct(
        F.lit(0.0).alias("cum"),
        F.lit(None).cast("double").alias("q"),
        F.lit(None).cast("double").alias("lu"),  # running highest upper
    )

    def step(acc, b):
        hit = acc["q"].isNull() & (b["c"] > 0) & (acc["cum"] + b["c"] >= rank)
        q = F.when(
            hit,
            b["lo"] + (b["hi"] - b["lo"]) * (rank - acc["cum"]) / b["c"],
        ).otherwise(acc["q"])
        return F.struct(
            (acc["cum"] + b["c"]).alias("cum"),
            q.alias("q"),
            F.when(b["c"] > 0, F.greatest(F.coalesce(acc["lu"], b["hi"]), b["hi"]))
            .otherwise(acc["lu"])
            .alias("lu"),
        )

    folded = F.aggregate(_bucket_spans(h), init, step)
    return F.when(count > 0, F.coalesce(folded["q"], folded["lu"]))


def hist_stdvar(h: Column) -> Column:
    """histogram_stdvar: Prometheus's native-histogram variance
    estimator (promql/functions.go funcHistogramStdDev/StdVar) — every
    observation in a bucket is assumed at the bucket's GEOMETRIC
    midpoint ``sqrt(lower·upper)``, negated on the negative side and 0
    for a zero-straddling bucket, variance = Σ cnt·(mid − mean)² /
    count.  Prometheus Kahan-sums the accumulation; this fold adds in
    value order — the same order the oracle twin replays, so results
    are engine-identical (and within float error of Kahan on
    metric-sized histograms)."""
    count, mean = h["count"], h["sum"] / h["count"]

    def step(acc, b):
        mid = (
            F.when(b["hi"] <= 0, -F.sqrt(b["lo"] * b["hi"]))
            .when(b["lo"] >= 0, F.sqrt(b["lo"] * b["hi"]))
            .otherwise(F.lit(0.0))
        )
        return acc + b["c"] * (mid - mean) * (mid - mean)

    # a NaN sum (any NaN observation) poisons the mean and therefore
    # the variance — stated explicitly because a histogram whose
    # observations were ALL NaN has zero spans, where the fold would
    # otherwise return its 0.0 init instead of the NaN every populated
    # span would have produced (code-review 11.5)
    return F.when(
        count > 0,
        F.when(F.isnan(h["sum"]), F.lit(float("nan"))).otherwise(
            F.aggregate(_bucket_spans(h), F.lit(0.0), step) / count
        ),
    )


def hist_stddev(h: Column) -> Column:
    return F.sqrt(hist_stdvar(h))


def hist_fraction(h: Column, lo: float, hi: float) -> Column:
    """histogram_fraction(lo, hi, v): estimated fraction of
    observations in [lo, hi] — per-span linear overlap over the
    unified span list (zero-bucket bounds adjusted exactly like
    quantile — Prometheus applies the same rule in histogramFraction),
    divided by count.  A zero-width span (zt = 0 zero bucket) is a
    point mass, counted when it lies inside [lo, hi].  Per-span
    contributions quantize to 8 decimals before an exact integral sum,
    so the total is order-independent and engine-identical.  NaN
    observations sit in no bucket, so they dilute the fraction (full
    count in the denominator); a histogram whose observations were ALL
    NaN has fraction 0 in every range — nothing provably inside."""
    lo_c, hi_c = F.lit(float(lo)), F.lit(float(hi))
    count = h["count"]

    def contrib(b):
        ov = F.greatest(
            F.lit(0.0), F.least(hi_c, b["hi"]) - F.greatest(lo_c, b["lo"])
        )
        frac = F.when(
            b["hi"] > b["lo"], ov / (b["hi"] - b["lo"]) * b["c"]
        ).otherwise(
            F.when((lo_c <= b["lo"]) & (hi_c >= b["hi"]), b["c"]).otherwise(
                F.lit(0.0)
            )
        )
        return F.floor(frac * F.lit(1e8) + F.lit(0.5))

    total = (
        F.aggregate(
            _bucket_spans(h), F.lit(0.0), lambda acc, b: acc + contrib(b)
        )
        / F.lit(1e8)
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
    on EITHER side (Prometheus's detectReset checks every bucket, not
    just the total: a restart that re-accrues FASTER than the old
    total, e.g. prev {idx2: 3} → cur {idx1: 4}, has count 4 > 3 but a
    negative bucket delta — code-review r10; schema/threshold shrink,
    the remaining Prometheus signals, cannot occur under this module's
    constant-schema builder).  NOTE: a decreasing ``sum`` is a reset
    signal only while observations are non-negative; with negative
    buckets in play Prometheus drops the sum test, and so does this
    function when either sample carries negative buckets.
    ``clamp=False`` (delta/idelta) subtracts verbatim — negatives are
    data, as for scalar gauges.

    The bucket union is a map_zip_with over the sparse (idx → cnt)
    maps, once per side; zero-delta buckets drop so the result stays
    sparse.  All scan-local — rate adds ONE lag window over the
    series, nothing else."""

    def side_delta(pos: bool):
        fi, fc = ("idx", "cnt") if pos else ("nidx", "ncnt")
        merged = F.map_zip_with(
            F.map_from_arrays(cur[fi], cur[fc]),
            F.map_from_arrays(prev[fi], prev[fc]),
            lambda _, a, b: F.coalesce(a, F.lit(0.0)) - F.coalesce(b, F.lit(0.0)),
        )
        return F.array_sort(F.map_entries(merged))

    raw_pos, raw_neg = side_delta(True), side_delta(False)
    has_negatives = (F.size(cur["nidx"]) > 0) | (F.size(prev["nidx"]) > 0)
    reset = (
        (
            (prev["count"] > cur["count"])
            | (prev["zero_count"] > cur["zero_count"])
            | ((prev["sum"] > cur["sum"]) & ~has_negatives)
            | F.exists(raw_pos, lambda e: e["value"] < 0)
            | F.exists(raw_neg, lambda e: e["value"] < 0)
        )
        if clamp
        else F.lit(False)
    )

    def arrays(raw, fi, fc):
        entries = F.filter(raw, lambda e: e["value"] != 0)
        d_idx = F.when(reset, cur[fi]).otherwise(
            F.transform(entries, lambda e: e["key"])
        )
        d_cnt = F.when(reset, cur[fc]).otherwise(
            F.transform(entries, lambda e: e["value"])
        )
        return d_idx, F.transform(d_cnt, lambda c: c * scale)

    p_idx, p_cnt = arrays(raw_pos, "idx", "cnt")
    n_idx, n_cnt = arrays(raw_neg, "nidx", "ncnt")

    def field(name: str) -> Column:
        return F.when(reset, cur[name]).otherwise(cur[name] - prev[name]) * scale

    return F.struct(
        field("count").alias("count"),
        field("sum").alias("sum"),
        field("zero_count").alias("zero_count"),
        cur["zero_threshold"].alias("zero_threshold"),
        cur["schema"].alias("schema"),
        p_idx.alias("idx"),
        p_cnt.alias("cnt"),
        n_idx.alias("nidx"),
        n_cnt.alias("ncnt"),
    )
