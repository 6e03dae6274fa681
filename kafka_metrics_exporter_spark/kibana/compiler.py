"""Kibana visState agg JSON → DataFrame compiler.

The reference's ELK dashboard (ELK/jmx_dashboard.json:88-452, 27
visualizations) drives Kibana aggregations over the flattened metric
documents the exporter writes to Elasticsearch.  This module compiles
exactly that agg vocabulary to Spark plans:

- **bucket aggs** (schema ``bucket``/``segment``/``group``/``split``/
  ``row``): ``terms`` (group by a field, keep the top ``size`` terms
  per parent bucket, ordered by the term itself or by a metric),
  ``date_histogram`` (fixed-interval time buckets; Kibana's
  ``interval: auto`` derives the bucket width from the data's time
  span exactly as ES does — see ``DateHistogramBucket`` — with
  ``customInterval`` honored when the panel pins one), ``filters``
  (named query_string predicates; a document
  lands in every bucket it matches).
- **metric aggs** (schema ``metric``): ``avg``/``max``/``sum``,
  ``cardinality`` (exact countDistinct by default for oracle parity;
  ``evaluate(..., approx_cardinality=True)`` switches every
  cardinality — metric and terms-ordering — to HLL
  ``approx_count_distinct``, which is what ES itself computes and what
  a 100 TB deployment should run), and ``top_hits`` with
  ``size: 1`` (the corpus's only size): the latest value per bucket by
  ``sortField``/``sortOrder``, with the ``aggregate`` label
  (average/concat/sum/max) degenerate over a single hit.

Compiled output is one DataFrame: bucket key columns (aliased from
``customLabel``) then metric columns.  Everything is built-in Column
expressions — one hash aggregation over the bucket keys; a terms
bucket ordered by a metric adds one aggregation at that bucket's level
joined back (broadcast — term cardinality ≤ ``size`` per parent); a
terms bucket ordered by ``_term`` is a rank window.  No UDFs, no
collects, so plans scale exactly like the hand-written A*/W* suite.

Determinism: ES leaves top_hits ties on equal sort values unresolved;
this compiler breaks them by a caller-named tiebreak column
(``tiebreak=``) so results are stable under any partitioning — the
documented engine choice (SURVEY §7.3 total-order rule).

query_string subset (the corpus uses only these): ``field: value`` →
equality on the resolved field; a bare quoted ``"phrase"`` → substring
match on the resolver's default search field.
"""

from __future__ import annotations

import json
import math
import re
import unicodedata
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.functions.scalars import osa_distance
from kafka_metrics_exporter_spark.functions.stats import (
    ks_two_sided_p_col,
    t_two_sided_p_col,
)

_BUCKET_SCHEMAS = {"bucket", "segment", "group", "split", "row"}

_INTERVAL_UNITS_US = {
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60 * 1_000_000,
    "h": 3600 * 1_000_000,
    "d": 86400 * 1_000_000,
    "w": 7 * 86400 * 1_000_000,
}


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class TermsBucket:
    field: str
    size: int
    order: str  # 'asc' | 'desc'
    order_by: str  # '_term' | agg id | 'custom'
    label: str
    # for order_by == 'custom' (orderAgg) or a metric agg id: the
    # ordering metric, resolved at parse time
    order_metric: tuple[str, str] | None = None  # (op, field)
    # ES `missing`: docs without the field land in THIS bucket value
    # instead of dropping (round 12; None = drop, ES's default)
    missing: str | None = None


@dataclass(frozen=True)
class SignificantTermsBucket:
    """ES ``significant_terms`` (round 9): terms of ``field`` whose
    frequency in a FOREGROUND document set is anomalously high vs the
    whole relation (the background), scored with ES's default JLH:
    ``(fg% − bg%) · (fg% / bg%)``, keeping only positively-scored terms
    with ``doc_count ≥ min_doc_count`` (ES default 3), top ``size`` by
    score.  Kibana derives the foreground from the dashboard's search
    bar; a relational engine has no ambient query, so the foreground
    query_string is an explicit ``foreground`` param — same subset
    grammar as the ``filters`` bucket."""

    field: str
    size: int
    foreground: str  # query_string defining the foreground set
    label: str
    min_doc_count: int = 3


@dataclass(frozen=True)
class SignificantTextBucket:
    """ES ``significant_text`` (round 13): significant_terms over
    FREE TEXT — each document contributes its DISTINCT analyzed tokens
    (doc-frequency semantics), scored with the same JLH against the
    background corpus.  Tokenization is the standard-analyzer shape:
    lowercase, split on non-letter/non-digit runs.  Set sizes are DOC
    counts (one 1-row aggregate over the doc frame), not token counts.
    ES's ``filter_duplicate_text`` near-dup suppression is not
    modelled — requesting it raises (corpus-level near-dup handling is
    llmdata/dedup's job).  Like ES, no sub-aggregations."""

    field: str
    size: int
    foreground: str
    label: str
    min_doc_count: int = 3


@dataclass(frozen=True)
class CategorizeTextBucket:
    """ES ``categorize_text`` (round 14), the DETERMINISTIC core:
    log-pattern buckets keyed by the message's token sequence after
    the categorization tokenizer — lowercase standard-analyzer tokens
    (significant_text's tokenization) with every token CONTAINING A
    DIGIT dropped, exactly ES's ML-categorization rule that numbers
    ('user 4032', latencies, timestamps) never define a category.
    Buckets order by doc_count desc then key asc, size-cut like terms.

    ``similarity_threshold < 100`` (round 15) enables category
    MERGING — deterministic and order-independent where ES's
    drain-style algorithm is shard/arrival-order sensitive (the
    rare_terms/ANN determinism stance), so the semantic is this
    engine's own, precisely documented:

    1. exact token-pattern buckets aggregate first (the threshold=100
       relation — category-scale, not doc-scale);
    2. two same-LENGTH patterns are similar when their positionally
       matching token fraction >= threshold/100 (different lengths
       never merge; ES's token weighting is not modelled);
    3. every pattern attaches to its best-ranked similar pattern
       (doc_count desc, key asc — frequency-seeded, the drain seed
       rule made deterministic), a rank-decreasing pointer map whose
       closure is resolved by 6 pointer-jumping rounds (chains up to
       2^6 = 64 categories; deeper chains would leave intermediates
       unresolved — far beyond any real log corpus, documented);
    4. a merged category's key keeps the positionally-UNANIMOUS
       member tokens and wildcards '*' elsewhere; its doc_count is
       the member sum.  Distinct roots that collapse to the same
       wildcard key coalesce (relational output is keyed by the
       pattern string).

    Cost: the pairwise similarity join is quadratic in CATEGORIES per
    token-length (the aggregated pattern table), never in documents —
    the exact-pattern aggregation has already collapsed the corpus.

    Metric sub-aggs (round 16): avg/min/max/sum/count nest under the
    pattern buckets in BOTH threshold paths (exact: one hash agg;
    merged: decomposable partials combined through the rep closure);
    cardinality only at threshold=100 (not a decomposable partial).

    DEFAULT DIVERGENCE: ``similarity_threshold`` defaults to 100
    (exact patterns) where ES defaults to 70 — a request omitting the
    parameter gets exact bucketing here, ES-style drain merging there.
    Deliberate: exact patterns are this engine's deterministic
    baseline semantic, and the merge semantic itself already diverges
    (order-independent vs drain); pass 70 explicitly for ES-shaped
    merging (ADVICE r15)."""

    field: str
    size: int
    label: str
    similarity_threshold: int = 100


@dataclass(frozen=True)
class FrequentItemSetsBucket:
    """ES ``frequent_item_sets`` (round 14): the co-occurring
    field=value combinations with support >= ``minimum_support`` —
    "which broker AND which error class fail together".  ES runs a
    per-shard approximate eclat (shard-order sensitive); this engine
    is EXACT apriori, deterministic and SQL-replayable (the
    rare_terms/ANN stance), bounded by construction: each document
    contributes at most ONE item per scalar field, so per-doc
    combination fan-out is C(#fields, k) — a constant — and every
    level is one hash aggregation over item-tuple keys.  Like ES,
    only CLOSED sets return (a set is dropped when a superset has the
    SAME doc count); sets order by doc_count desc then key asc,
    size-cut.  Set size is capped at 3 (and by #fields), loudly.

    Flattening divergence (documented): ES returns the set as a
    field→values map; the flattened relation keys it as the sorted
    'field=value' items joined by ', '."""

    fields: tuple[str, ...]
    min_support: float
    min_set_size: int
    size: int
    label: str


@dataclass(frozen=True)
class CompositeBucket:
    """ES ``composite`` aggregation (round 9): paginate ALL buckets of
    a multi-source key tuple in deterministic key order — the agg ES
    users reach for when a terms agg's ``size`` cap makes full exports
    lossy.  Each source is a (field, kind) pair, kind ``terms``,
    ``date_histogram`` (with ``interval``) or — round 15 — numeric
    ``histogram`` (fixed ``interval``, the HistogramBucket
    floor-keyed formula); pages advance with ``after`` = the last key
    tuple of the previous page, compared lexicographically (every
    source ascending, ES's default order).  This is an ES API-level
    agg (not exposed in classic visState); the param shape here
    mirrors the ES request body."""

    # (name, field, kind, interval) — interval is epoch-us for
    # date_histogram, the numeric bucket width for histogram, 0 for
    # terms
    sources: tuple[tuple[str, str, str, float], ...]
    size: int
    label: str
    after: tuple | None = None


@dataclass(frozen=True)
class DateHistogramBucket:
    field: str
    interval_us: int
    label: str
    # ES min_doc_count (round 12): 1 (default here) emits populated
    # buckets only — the natural relational shape; 0 ZERO-FILLS the
    # empty buckets between each parent bucket's first and last
    # populated key (ES's own agg default), supported for the
    # INNERMOST histogram (an empty OUTER bucket has no child rows, so
    # the flattened relation cannot represent it — loud error); >= 2
    # filters buckets by their own-level doc count.
    min_doc_count: int = 1
    # ES extended_bounds (round 12): widen the min_doc_count=0 fill
    # grid beyond the populated span — (min_us, max_us) epoch micros;
    # only meaningful with min_doc_count=0 (like ES, where the docs
    # call it out explicitly)
    extended_bounds: "tuple[int, int] | None" = None
    # the panel declared ``interval: "auto"`` — interval_us holds the
    # customInterval/1h fallback.  Since round 7 evaluate() derives the
    # interval from the time range BY DEFAULT (real ES/Kibana
    # semantics, ~50 target buckets); auto_interval_buckets=None
    # restores the legacy customInterval pin.
    auto: bool = False
    # ES ``auto_date_histogram`` (round 13): pick the interval from
    # ES's OWN rounding ladder so the populated span yields at most
    # this many buckets (ES default 10).  Orthogonal to Kibana's
    # auto-interval (different ladder, data-span-driven, no override
    # from evaluate()); None = a plain date_histogram.
    auto_buckets: "int | None" = None


@dataclass(frozen=True)
class FiltersBucket:
    filters: tuple[tuple[str, str], ...]  # (label, query_string)
    label: str
    # ES other_bucket: collect documents matching NO filter under this
    # key (round 11.5); None = drop them, ES's default
    other_key: "str | None" = None


@dataclass(frozen=True)
class VariableWidthHistogramBucket:
    """ES ``variable_width_histogram`` (round 13): dynamically-sized
    numeric buckets targeting ``buckets`` clusters.  ES's algorithm is
    a shard-local streaming cluster merge — approximate AND
    order-dependent; this engine substitutes a DETERMINISTIC
    quantile-seeded Lloyd iteration (3 rounds, centroids rounded to 6
    decimals each round so the whole trained clustering is
    bit-replayable in SQL — the same determinism-over-approximation
    stance as rare_terms and the md5-residue ANN training).  The
    bucket key column is the final cluster centroid; nested metrics
    aggregate per cluster as usual.  Must be the OUTERMOST bucket (the
    clustering is computed over the whole relation, like ES, which
    rejects it under other bucketing aggs).  Scale note: the exact
    quantile seeding is the oracle-parity path; a 100 TB deployment
    seeds with percentile_approx — every later step is scan-local
    assignment plus k-row aggregates either way."""

    field: str
    buckets: int
    label: str


@dataclass(frozen=True)
class AdjacencyMatrixBucket:
    """ES ``adjacency_matrix`` (round 13): named query_string filters
    → one bucket per matching filter plus one per matching PAIR, keyed
    ``a&b`` (the ``separator`` param) with the names in LEXICOGRAPHIC
    order — ES sorts the keyed filters before building intersection
    keys, independent of declaration order (ADVICE r14); the parse
    site applies the sort so ``filters`` here is pre-sorted.  A document
    explodes into every singleton and pair bucket it belongs to; ES
    caps the filter count (default 100) — enforced here."""

    filters: tuple[tuple[str, str], ...]  # (name, query_string)
    label: str
    separator: str = "&"


@dataclass(frozen=True)
class MultiTermsBucket:
    """ES ``multi_terms`` (round 11.5): a terms bucket over a TUPLE of
    fields, keyed by the '|'-joined key_as_string exactly as ES renders
    it; ordered by doc count (default), the joined key (``_key``), or —
    round 12, like terms — a sub-aggregation metric / custom orderAgg,
    with the joined key as tiebreak, size-cut like terms.  Docs missing
    ANY of the fields drop (ES ignores them).  ``order_by``/
    ``order_metric`` mirror TermsBucket so the shared ranking loop
    handles both."""

    fields: tuple[str, ...]
    size: int
    order: str  # asc | desc
    label: str
    order_by: str = "_count"  # ranking loop: any non-_term = metric path
    order_metric: tuple[str, str] = ("count", "")


@dataclass(frozen=True)
class RareTermsBucket:
    """ES ``rare_terms`` (round 11.5): the long-tail complement of
    terms — keep the keys whose doc count within the parent bucket is
    ≤ ``max_doc_count`` (ES caps it at 100).  ES computes this with a
    CuckooFilter approximation at scale; this engine is exact, the
    same documented exact-vs-approx stance as cardinality/percentiles.
    Response ordering (count ascending in ES) is presentation-only —
    the relational result is unordered."""

    field: str
    max_doc_count: int
    label: str


@dataclass(frozen=True)
class FilterBucket:
    """ES single ``filter`` agg (round 13): one named bucket holding
    the documents that match a query_string — the narrowing wrapper ES
    users put around sub-aggs.  The flattened relation keeps a constant
    key column (the bucket's name) so the output shape matches every
    other bucket level; docs not matching drop (ES: they are simply
    outside the bucket)."""

    query: str
    label: str


@dataclass(frozen=True)
class MissingBucket:
    """ES ``missing`` bucket agg (round 13): the single bucket of
    documents that LACK the field — the complement of every
    field-keyed bucket's null-drop.  Constant key column like
    :class:`FilterBucket`."""

    field: str
    label: str


@dataclass(frozen=True)
class RateAgg:
    """ES ``rate`` metric agg (round 13): per-``unit`` rate of a sum
    (``mode="sum"``), of the number of field values
    (``mode="value_count"``), or of documents (no field) inside each
    date_histogram bucket: ``bucket_value * unit / bucket_interval``.
    Valid only nested under a (auto_)date_histogram, like ES; the
    interval is the innermost date_histogram's RESOLVED interval, so
    auto mode scales correctly.  Count-family: zero-fills to 0."""

    field: str  # "" = doc-count rate
    unit_us: int
    mode: str  # "sum" | "value_count"
    label: str


@dataclass(frozen=True)
class TopMetricsAgg:
    """ES ``top_metrics`` (round 13): the metric field values of the
    top ``size`` documents by ``sort_field`` — what Kibana's "last
    value" reads.  size 1 rides the main hash aggregation as
    max_by/min_by per field (one scalar column ``label_field`` each);
    size > 1 ranks with the same deterministic-tiebreak window as
    top_hits and emits one ARRAY column per field, sort-ordered."""

    fields: tuple[str, ...]
    sort_field: str
    sort_order: str  # 'desc' | 'asc'
    label: str
    size: int = 1

    def column_names(self) -> list[str]:
        return [f"{self.label}_{_slug(f)}" for f in self.fields]


@dataclass(frozen=True)
class MetricAgg:
    op: str  # avg | min | max | sum | cardinality | count | value_count
    field: str
    label: str


@dataclass(frozen=True)
class StringStatsAgg:
    """ES ``string_stats`` (round 13): count of non-null values,
    min/max/avg byte-..character-length, and the Shannon entropy (log
    base 2) of the bucket's character distribution.  Lengths ride the
    main hash aggregation; entropy is one char-keyed aggregation
    (map-side combine shrinks the shuffle to <= charset x buckets
    rows) joined back, using the single-pass identity
    H = log2(T) - (1/T)*sum(c*log2(c)).  ES's ``show_distribution``
    response option is not modelled (reject loudly)."""

    field: str
    label: str

    def column_names(self) -> list[str]:
        return [
            f"{self.label}_{n}"
            for n in ("count", "min_length", "max_length", "avg_length",
                      "entropy")
        ]


@dataclass(frozen=True)
class MatrixStatsAgg:
    """ES ``matrix_stats`` (round 14): cross-field numeric statistics
    over a tuple of fields — per-field mean / variance / skewness /
    kurtosis plus the pairwise covariance and correlation matrices,
    with ES's exact formulas (aggs-matrix-stats module,
    ``MatrixStatsResults``): variance = M2/(n−1), skewness =
    √n·M3/M2^1.5, kurtosis = n·M4/M2², covariance = C2/(n−1),
    correlation = C2/√(M2ᵢ·M2ⱼ), where M{2,3,4}/C2 are central
    moments.  A document missing ANY of the fields is excluded from
    the whole matrix (ES's default listwise deletion; the ``missing``
    per-field defaults are not modelled — documented).

    The moments ride the main hash aggregation as power sums
    Σx/Σx²/Σx³/Σx⁴/Σxy carried in DECIMAL(38,6) fixed point: the
    per-row powers are computed in double (exact for integral |x| ≲
    9.7e3 — the row-level product fits 2^53) and the fixed-point SUM
    is partition-order-independent, so the result survives AQE / task
    retry re-summation on a real cluster — the repo-wide
    deterministic-totals stance.  Degenerate cases emit null: n<2 for
    the (n−1)-normalized stats, M2=0 for skewness/kurtosis/
    correlation."""

    fields: tuple[str, ...]
    label: str

    def column_names(self) -> list[str]:
        cols = [f"{self.label}_doc_count"]
        for f in self.fields:
            s = _slug(f)
            cols += [
                f"{self.label}_{s}_{n}"
                for n in ("mean", "variance", "skewness", "kurtosis")
            ]
        for i in range(len(self.fields)):
            for j in range(i + 1, len(self.fields)):
                si, sj = _slug(self.fields[i]), _slug(self.fields[j])
                cols += [
                    f"{self.label}_{si}_{sj}_covariance",
                    f"{self.label}_{si}_{sj}_correlation",
                ]
        return cols


@dataclass(frozen=True)
class TTestAgg:
    """ES ``t_test`` (round 14): Student's t between two populations —
    ``paired`` (per-doc differences of two fields), ``homoscedastic``
    (pooled variance) and ``heteroscedastic`` (Welch, ES's default;
    populations selected by query_string filters).  The moments ride
    the main hash aggregation as DECIMAL(38,6) power sums like
    matrix_stats — partition-order-independent totals.

    Like ES, the agg emits the two-sided P-VALUE (``<label>_p``, round
    15): the Student-t CDF over the exact (t, df) pair, evaluated as
    pure Column math — Lanczos lgamma + fixed-depth incomplete-beta
    continued fraction (``functions/stats.py``), pinned against an
    independent adaptive-Simpson integration of the t density to ~10
    significant digits and replayed exactly in SQL via a recursive-CTE
    twin (``sql_t_pvalue_ctes``).  ``<label>_t`` / ``<label>_df`` stay
    exposed (ES keeps them internal) so the CDF inputs remain
    auditable.  Degenerate inputs (n<2 per side, zero variance) emit
    null."""

    a_field: str
    b_field: str
    label: str
    test_type: str  # paired | homoscedastic | heteroscedastic
    a_filter: str = ""  # query_string; "" selects all docs
    b_filter: str = ""

    def column_names(self) -> list[str]:
        return [f"{self.label}_t", f"{self.label}_df", f"{self.label}_p"]


@dataclass(frozen=True)
class BucketStatsTestAgg:
    """ES x-pack sibling significance pipelines (round 15):
    ``bucket_correlation`` (function ``count_correlation``) and
    ``bucket_count_ks_test`` — the stats-plugin companions to t_test /
    matrix_stats.  Both read the INNERMOST bucket level's metric
    sequence per outer bucket and reduce it against a client-provided
    indicator, via ONE grouped collect of the (key, value) pairs per
    outer bucket (bucket-table-sized by construction — the sibling-agg
    shape, never a window) broadcast-joined back; every downstream
    formula is JVM-side higher-order-array Column math.

    Alignment (documented): indicator entries pair with the RETURNED
    innermost buckets in ASCENDING KEY order — deterministic and
    engine-independent where ES pairs by response order (identical for
    the histogram/date_histogram/range request shapes the ES docs
    show).  An outer bucket whose returned inner-bucket count differs
    from the indicator length emits null (ES throws request-wide; a
    distributed plan can't throw per-row — the loud relational
    stance).

    bucket_correlation/count_correlation: ES's documented membership
    reading — the Pearson correlation between the indicator metric x
    (expectations e_i, population weights f_i = fractions or 1/m, over
    a population of ``doc_count`` docs) and the per-doc Bernoulli
    "lands in this outer bucket" variable whose per-inner-bucket counts
    are the buckets_path values y_i:
    r = (Σe_i·y_i/N − x̄·ȳ) / sqrt((Σf_i·e_i² − x̄²)·ȳ(1−ȳ)),
    x̄ = Σf_i·e_i, ȳ = Σy_i/N.  x̄/Σf·e² are compile-time constants
    (the indicator is a literal); only Σy and Σe·y touch data.

    bucket_count_ks_test: one-sample KS of the doc-count ECDF against
    the cumulative ``fractions`` (uniform when omitted).  Alternatives
    follow the scipy one-sample convention, documented: ``greater`` =
    ECDF above the reference somewhere (D⁺ = max(ECDF−TCDF), p =
    exp(−2nD⁺²)); ``less`` = ECDF below (D⁻, mirrored); ``two_sided``
    = Kolmogorov survival at √n·max(D⁺,D⁻) (functions/stats.py dual
    series).  Only ``sampling_method: "uniform"`` is modelled — ES's
    default ``upper_tail`` reweighting is an x-pack sampling detail of
    significant-terms pipelines; requesting it (or omitting the
    parameter) rejects loudly rather than silently diverging (the
    categorize_text stance)."""

    op: str  # bucket_correlation | bucket_count_ks_test
    source_label: str
    label: str
    expectations: tuple[float, ...] = ()  # bucket_correlation indicator
    fractions: tuple[float, ...] = ()     # both aggs; () = uniform
    doc_count: int = 0                    # bucket_correlation indicator
    alternatives: tuple[str, ...] = ()    # ks_test output columns
    seq: int = 0

    def column_names(self) -> list[str]:
        if self.op == "bucket_correlation":
            return [self.label]
        return [f"{self.label}_{alt}" for alt in self.alternatives]


@dataclass(frozen=True)
class RandomSamplerBucket:
    """ES ``random_sampler`` (round 14): run the sub-aggregations over
    a random subset of documents — ES's own answer to the 100 TB
    problem.  ES hashes shard-relative doc ids with an optional seed
    (NOT reproducible across shard layouts); this engine is strictly
    more deterministic: the keep-set is the md5 residue of an explicit
    ``id_field`` mixed with a REQUIRED ``seed`` (``md5(id ':' seed)``
    — the llmdata deterministic-sampling machinery, exact SQL twin),
    so the same probability/seed reproduces the same sample on any
    cluster layout, AQE re-plan, or engine.  ES's probability contract
    is enforced: 0 < p <= 0.5, or exactly 1.  Must be the FIRST
    bucket agg (ES requires top level); it adds no key column — a
    transparent filter the remaining buckets/metrics aggregate over.

    NO-SCALING stance (documented, ADVICE r14): sub-aggregation
    outputs are the RAW sample-scale values — this engine does not
    multiply count-like outputs by 1/probability.  ES's x-pack
    SamplingContext up-scales some internal consumers, and Kibana
    rescales in the UI layer; which outputs arrive pre-scaled is an
    implementation detail that has changed across ES versions, so
    this engine picks the invariant the SQL twin can replay exactly:
    what you aggregate over the sample is what you get.  A user
    needing population estimates multiplies by 1/probability — a
    client-side scalar on an already-tiny result."""

    probability: float
    seed: int
    id_field: str
    label: str


@dataclass(frozen=True)
class DiversifiedSamplerBucket:
    """ES ``diversified_sampler`` (round 14): run the sub-aggregations
    over a sample capped at ``max_docs_per_value`` documents per
    de-duplication key — the "don't let one hot user dominate the
    sample" agg.  ES keeps the top-scored docs per shard (shard-order
    sensitive, score-dependent); this engine is strictly
    deterministic: within each key the kept docs are the first
    ``max_docs_per_value`` by md5(id ':' seed) residue (id tiebreak) —
    the random_sampler determinism stance, reproducible across
    cluster layouts and engines, exact SQL twin (QUALIFY row_number).
    Must be the FIRST bucket agg (ES: sampler aggs cannot be nested);
    adds no key column.  Cost: one hash-partitioned rank window on the
    dedup key — the per-key state is a counter, never doc bodies."""

    field: str  # de-duplication key
    max_docs_per_value: int
    seed: int
    id_field: str
    label: str


@dataclass(frozen=True)
class SamplerBucket:
    """ES plain ``sampler`` (round 15): run the sub-aggregations over
    the ``shard_size`` "best" documents.  ES keeps the top-SCORED docs
    per shard (score- and shard-layout-sensitive; with no scoring
    query the order is arbitrary); this engine is strictly
    deterministic: the GLOBAL ``shard_size`` docs with the lowest
    md5(id ':' seed) residues, id tiebreak — the random_/diversified_
    sampler determinism stance with the same explicit seed + id_field
    contract, exact SQL twin (ORDER BY residue, id LIMIT shard_size).
    Must be the FIRST bucket agg (ES: sampler aggs cannot be nested);
    adds no key column — a transparent filter.

    Cost: ONE TakeOrderedAndProject at k = shard_size — each task
    keeps a bounded heap, never a full sort; the downstream
    aggregation then reads <= shard_size rows regardless of corpus
    size (ES's own "bound the expensive sub-agg" intent)."""

    shard_size: int
    seed: int
    id_field: str
    label: str


@dataclass(frozen=True)
class IpRangeBucket:
    """ES ``ip_range`` bucket (round 15; IPv6 since round 16): half-open
    [from, to) ranges over an IP-string field, plus CIDR ``mask``
    entries (a /p mask is the range [network_address, network_address
    + 2^(bits-p))).  Both forms normalize at PARSE time (stdlib
    ``ipaddress``) into Lucene's unified 128-bit space — IPv4
    addresses and CIDRs map to ``::ffff:a.b.c.d`` (v4-mapped), exactly
    how ES's ``ip`` field stores and compares both families — so a v6
    range can cover v4 docs and vice versa, like ES.  Evaluation is
    pure integer Column math: the doc address parses ONCE per row
    (dotted-quad horner, or RFC-4291 v6 — compressed ``::`` and
    embedded v4 tails included — via split/pad/base-16 conv) into two
    64-bit words each BIASED by −2^63 (signed long order == unsigned
    word order; the packed-words pattern of the binary-ANN popcount
    path), then the RangeBucket overlap-explode compares
    lexicographically over (hi, lo).  Keys follow ES: the declared
    ``key``, else the mask string, else ``from-to`` with ``*`` for
    open ends.

    A malformed address EXCLUDES the doc from every range (ES's ip
    field type rejects it at index time — an engine reading raw
    strings can only drop it, loudly documented rather than silently
    bucketing garbage).  ``ranges`` endpoints are 128-bit mapped-space
    ints; an exclusive end of 2^128 (e.g. ``::/0``) is stored as None
    (unbounded)."""

    field: str
    ranges: tuple[tuple[str, int | None, int | None], ...]  # (key, lo, hi)
    label: str


@dataclass(frozen=True)
class GeoGridBucket:
    """ES ``geohash_grid`` / ``geotile_grid`` (round 16 — the last
    documented exclusion family): grid-cell buckets over a geo_point
    field, which this engine models as a ``struct<lat:double,
    lon:double>`` column (ES's geo_point is exactly that pair; a
    relational engine makes the pair explicit).  Keys are ES's own:
    geohash — the precision-length base-32 string (classic Morton
    interleave of the lon/lat bisection bits, lon first); geotile —
    ``"z/x/y"`` Web-Mercator slippy-map tiles with ES's ±85.05112878
    latitude clamp.  Both keys are PURE Column math unrolled at
    compile time (≤ 60 shift/mask/add terms + base-32 chars — the
    static-combinatorics stance), bound evaluate-once.  Docs with a
    missing/out-of-range coordinate drop, like ES rejects them at
    index time.  Cells rank doc_count desc (key asc tiebreak) with
    the ``size`` cut through the SAME terms ranking machinery
    (top-level: TakeOrdered + broadcast semi-join; nested:
    dense_rank).  ``bounds`` (ES's map-viewport param) restricts the
    bucketed docs to a top_left/bottom_right box BEFORE keying — a
    scan-local predicate Catalyst pushes down (antimeridian-crossing
    boxes, left > right, reject loudly — documented)."""

    field: str
    precision: int
    size: int
    label: str
    kind: str  # "geohash" | "geotile"
    bounds: tuple[float, float, float, float] | None = None  # t, l, b, r
    # the terms ranking loop's protocol: grids order by doc_count desc
    order: str = "desc"
    order_by: str = "_count"

    @property
    def order_metric(self) -> tuple[str, str]:
        return ("count", "")


@dataclass(frozen=True)
class GeoDistanceBucket:
    """ES ``geo_distance`` (round 16): half-open [from, to) rings
    around an origin point, keyed like range buckets (declared key,
    else ``from-to`` with ``*``); a doc lands in EVERY matching ring
    (ES allows overlaps) — the RangeBucket overlap-explode over the
    haversine arc distance in METERS with Lucene's mean earth radius
    (6371008.7714 m, what ES's arc distance uses).  The distance is
    scan-local trig evaluated ONCE per doc (``_bind1``); ranges
    normalize to meters at parse (``unit: km`` supported)."""

    field: str
    origin: tuple[float, float]  # (lat, lon)
    ranges: tuple[tuple[str, float | None, float | None], ...]
    label: str


@dataclass(frozen=True)
class NestedBucket:
    """ES ``nested`` (round 16 — with the geo family, the exclusion
    list's other half): switches the aggregation context to the
    sub-documents of an ``array<struct>`` column.  Relationally that
    is ONE explode — the array column is replaced by one struct row
    per element, so every later agg in the request addresses nested
    fields as ``path.sub`` through the ordinary struct-path resolver
    and doc_count means NESTED docs, exactly ES's in-context
    semantics.  Parent-level fields keep resolving (their values
    replicate per element, which is also ES's behavior inside a
    nested context).  Docs with an empty/null array contribute no
    nested docs (plain explode).

    Bounds (loud): must be the FIRST bucket agg (the sampler
    precedent — it changes the relation's cardinality for everything
    after it); one nested context per request (ES's multi-level
    nesting would be further explodes — not modelled)."""

    path: str
    label: str


@dataclass(frozen=True)
class ReverseNestedAgg:
    """ES ``reverse_nested`` (round 16), the metric form: the PARENT
    doc_count inside a nested context — "how many root documents have
    at least one element in this bucket" — as an exact
    countDistinct of an EXPLICIT root-id field (ES tracks root docs
    through Lucene doc ids; a relational engine needs the key named —
    the sampler/diversified-sampler determinism contract).

    Scope (documented): ES's reverse_nested is a bucket that can hold
    parent-level metric sub-aggs; those would double-count over the
    exploded relation in a single pass and are NOT modelled — this
    engine emits the bucket's doc_count (the overwhelmingly common
    use), loudly parse-bound to that shape."""

    id_field: str
    label: str


@dataclass(frozen=True)
class GeoBoundsAgg:
    """ES ``geo_bounds`` (round 16): the bucket's bounding box —
    top = max lat, bottom = min lat, left = min lon, right = max lon,
    riding the main hash aggregation.  DOCUMENTED DIVERGENCE: ES
    defaults ``wrap_longitude: true`` (the smallest box may cross the
    antimeridian, computed from a longitude-gap scan); this engine
    implements the non-wrapping box only and requires
    ``wrap_longitude: false`` EXPLICITLY — for data not straddling
    ±180 the results are identical, and a silent non-wrap default
    would mis-box Pacific datasets."""

    field: str
    label: str

    def column_names(self) -> list[str]:
        return [f"{self.label}_{k}" for k in ("top", "left", "bottom", "right")]


@dataclass(frozen=True)
class GeoCentroidAgg:
    """ES ``geo_centroid`` (round 16): the arithmetic mean lat/lon of
    the bucket's valid points plus the contributing-point count —
    ES's own definition (DocValueFormat GEO centroid is the running
    mean of the encoded coordinates; this engine averages the decoded
    doubles, identical up to encoding quantization far below the
    4-decimal hash contract)."""

    field: str
    label: str

    def column_names(self) -> list[str]:
        return [f"{self.label}_{k}" for k in ("lat", "lon", "count")]


@dataclass(frozen=True)
class BoxplotAgg:
    """ES ``boxplot`` (round 12): min / q1 / q2 / q3 / max in ONE hash
    aggregation pass (exact interpolated quartiles where ES t-digests
    — the documented exact-vs-approx stance)."""

    field: str
    label: str

    def column_names(self) -> list[str]:
        return [f"{self.label}_{k}" for k in ("min", "q1", "q2", "q3", "max")]


@dataclass(frozen=True)
class MadAgg:
    """ES ``median_absolute_deviation`` (round 12): median(|v −
    median(v)|) per bucket.  ES computes both medians on a TDigest;
    this engine is exact interpolated percentiles — the same
    documented exact-vs-approx stance as median/percentiles (DuckDB's
    ``mad()`` replays it exactly).  Two grouped percentile passes over
    the SAME bucket keys (the second reuses the first shuffle's
    partitioning) + a bucket-keyed join-back — never doc-sized state
    per group."""

    field: str
    label: str


@dataclass(frozen=True)
class WeightedAvgAgg:
    """ES ``weighted_avg`` (round 12): sum(value·weight) / sum(weight)
    over the docs carrying BOTH fields (ES skips a doc missing either
    one unless a ``missing`` default is configured — the defaults are
    not modelled; absent fields drop the doc, loudly documented)."""

    value_field: str
    weight_field: str
    label: str


@dataclass(frozen=True)
class PercentilesAgg:
    """ES ``percentiles`` metric: one output column per percent,
    ``<label>_p<percent>``.  Exact interpolated percentiles by default
    (ES computes a t-digest approximation; the exact form hash-matches
    oracles and the ``approx_percentile`` swap is the documented scale
    path, same pattern as the a11/a11b pair)."""

    field: str
    percents: tuple[float, ...]
    label: str

    def column_names(self) -> list[str]:
        def fmt(p: float) -> str:
            s = f"{p:g}".replace(".", "_")
            return f"{self.label}_p{s}"

        return [fmt(p) for p in self.percents]


@dataclass(frozen=True)
class PercentileRanksAgg:
    """ES ``percentile_ranks`` metric: for each probe value, the
    percentage of observations ≤ that value — one output column per
    probe, ``<label>_r<value>``.  Computed as the EXACT empirical CDF
    (100·count(x ≤ v)/count(x)); ES's t-digest additionally
    interpolates between centroids, so tiny divergences are possible
    near sparse value gaps — same exact-over-sketch trade the
    ``percentiles`` metric documents."""

    field: str
    values: tuple[float, ...]
    label: str

    def column_names(self) -> list[str]:
        def fmt(v: float) -> str:
            s = f"{v:g}".replace(".", "_").replace("-", "m")
            return f"{self.label}_r{s}"

        return [fmt(v) for v in self.values]


@dataclass(frozen=True)
class TopHitsAgg:
    """Kibana's Top Hit metric: the top ``size`` documents by
    ``sort_field`` folded into one cell with ``aggregate``.  size 1
    (28 of the corpus's 33 top_hits aggs) rides the main hash
    aggregation as max_by/min_by; size > 1 (round 12) ranks the
    deterministic-tiebreak order with ``row_number() <= size`` and
    folds the survivors — concat joins them ", "-separated in sort
    order, exactly how Kibana renders the hit list."""

    field: str
    aggregate: str  # average | concat | sum | max | min
    sort_field: str
    sort_order: str  # 'desc' | 'asc'
    label: str
    size: int = 1


@dataclass(frozen=True)
class HistogramBucket:
    """ES ``histogram`` bucket (round 8): numeric fixed-interval
    bucketing — key = floor(value / interval) · interval, ES's exact
    formula (negative values land in the bucket BELOW zero, which
    truncation would get wrong)."""

    field: str
    interval: float
    label: str
    min_doc_count: int = 1  # same contract as DateHistogramBucket
    extended_bounds: "tuple[float, float] | None" = None


@dataclass(frozen=True)
class RangeBucket:
    """ES ``range`` bucket (round 8): half-open [from, to) ranges; a
    document lands in EVERY range that contains it (ES allows
    overlaps), so compilation explodes the match array like
    FiltersBucket.  Missing ``from``/``to`` are open ends; keys follow
    ES's ``from-to`` convention (``*`` for an open end) unless the
    range declares a ``key``."""

    field: str
    ranges: tuple[tuple[str, float | None, float | None], ...]  # (key, lo, hi)
    label: str


@dataclass(frozen=True)
class DateRangeBucket:
    """ES ``date_range`` bucket (round 8): half-open [from, to) ranges
    over a timestamp field; like :class:`RangeBucket`, a document lands
    in EVERY matching range.  Endpoints are ISO date/datetime strings
    (date math is not supported — the replay engine evaluates fixed
    exports); keys follow ES's ``from-to`` convention unless the range
    declares a ``key``."""

    field: str
    ranges: tuple[tuple[str, str | None, str | None], ...]  # (key, lo, hi)
    label: str


@dataclass(frozen=True)
class StatsAgg:
    """ES ``stats`` / ``extended_stats`` metric: one aggregation pass
    emitting count/min/max/avg/sum columns (extended adds
    sum_of_squares, variance and std_deviation — POPULATION statistics,
    ES's definition)."""

    field: str
    label: str
    extended: bool = False

    def column_names(self) -> list[str]:
        names = ["count", "min", "max", "avg", "sum"]
        if self.extended:
            names += ["sum_of_squares", "variance", "std_deviation"]
        return [f"{self.label}_{n}" for n in names]


@dataclass(frozen=True)
class PipelineAgg:
    """ES parent pipeline aggs (round 8): ``derivative``,
    ``cumulative_sum``, ``moving_avg``/``moving_fn`` over the buckets
    of the INNERMOST histogram/date_histogram, per outer bucket.
    ``source_label`` names the sibling metric column the buckets_path
    resolved to.  moving_avg's window follows ES moving_fn shift=0:
    the ``window`` buckets BEFORE the current one, exclusive — the
    first bucket emits NULL, like derivative."""

    op: str  # derivative | cumulative_sum | moving_avg | serial_diff | *_bucket
    source_label: str
    label: str
    window: int = 5  # moving_avg window / serial_diff lag
    percents: tuple[float, ...] = ()  # percentiles_bucket only
    seq: int = 0  # position in the request (same-level reduce order)

    def column_names(self) -> list[str]:
        if self.op == "stats_bucket":
            return [
                f"{self.label}_{n}" for n in ("count", "min", "max", "avg", "sum")
            ]
        if self.op == "extended_stats_bucket":
            return [
                f"{self.label}_{n}"
                for n in ("count", "min", "max", "avg", "sum",
                          "sum_of_squares", "variance", "std_deviation")
            ]
        if self.op == "percentiles_bucket" or self.op.startswith(
            "moving_percentiles:"
        ):
            return [
                f"{self.label}_p{f'{p:g}'.replace('.', '_')}"
                for p in self.percents
            ]
        return [self.label]


#: sibling pipeline ops — aggregate a metric ACROSS the innermost
#: bucket level, per outer bucket (ES avg_bucket & friends).  Unlike
#: the parent sequence ops above they need no ordering, so they run as
#: one grouped aggregation joined back, never a window.
SIBLING_OPS = {"avg_bucket": F.avg, "sum_bucket": F.sum,
               "min_bucket": F.min, "max_bucket": F.max}

#: ES ``normalize`` pipeline-agg methods (round 13) — the exact
#: formula table from the ES docs, applied per OUTER bucket across the
#: innermost level.  Degenerate denominators (single-value level for
#: the rescale family, zero stddev, zero sum) emit null — the loud
#: relational stance, never a fabricated 0.
_NORMALIZE_METHODS = (
    "rescale_0_1", "rescale_0_100", "percent_of_sum", "mean",
    "z-score", "softmax",
)

#: multi-column sibling ops (round 9): ``stats_bucket`` emits the five
#: stats columns, ``percentiles_bucket`` one column per percent.  ES
#: percentiles_bucket is exact but does NOT interpolate — it returns
#: the sorted bucket value at index round(p/100·(n-1)) (nearest rank;
#: unlike the t-digest `percentiles` metric, which approximates AND
#: interpolates).  Same grouped-aggregation-joined-back shape as
#: SIBLING_OPS, with the sorted value array selected post-join.
MULTI_SIBLING_OPS = {"stats_bucket", "percentiles_bucket",
                     "extended_stats_bucket"}


@dataclass(frozen=True)
class BucketScriptAgg:
    """ES ``bucket_script`` / ``bucket_selector`` pipelines (round 9):
    evaluate a painless ARITHMETIC script over sibling metric values
    per bucket — script adds a computed column, selector FILTERS the
    buckets where the (boolean) script is false.  The supported script
    subset is the expression grammar ES documents for these aggs:
    ``params.X`` path variables, numeric literals, ``+ - * / %``,
    comparisons, ``&& || !`` and parentheses (no loops/defs — those
    never appear in bucket scripts).  Nulls propagate like ES
    ``gap_policy: skip``: a bucket missing any input yields null
    (script) / is dropped (selector)."""

    op: str  # bucket_script | bucket_selector
    paths: tuple[tuple[str, str], ...]  # (param name, resolved metric label)
    script: str
    label: str
    seq: int = 0  # position in the request (same-level reduce order)


_SCRIPT_TOKEN_RE = re.compile(
    r"\s*(params\.\w+|\d+\.\d+|\d+|>=|<=|==|!=|&&|\|\||[()+\-*/%!><])"
)


def compile_bucket_script(script: str, binding: dict[str, str]) -> Column:
    """Compile the painless expression subset to ONE Column expression
    (precedence: ``||`` < ``&&`` < ``== !=`` < ``> >= < <=`` <
    ``+ -`` < ``* / %`` < unary ``- !``).  ``binding`` maps param
    names to resolved metric column names; every reference casts to
    double so integer metric columns divide like painless doubles."""
    toks: list[str] = []
    i = 0
    while i < len(script):
        m = _SCRIPT_TOKEN_RE.match(script, i)
        if m is None:
            if script[i:].strip():
                raise ValueError(
                    f"kibana: unsupported bucket script token at "
                    f"{script[i:]!r}"
                )
            break
        toks.append(m.group(1))
        i = m.end()
    pos = 0

    def peek() -> str | None:
        return toks[pos] if pos < len(toks) else None

    def eat() -> str:
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def primary() -> Column:
        t = peek()
        if t is None:
            raise ValueError(f"kibana: truncated bucket script {script!r}")
        if t == "(":
            eat()
            e = or_()
            if peek() != ")":
                raise ValueError(f"kibana: unbalanced parens in {script!r}")
            eat()
            return e
        if t == "-":
            eat()
            return -primary()
        if t == "!":
            eat()
            return ~primary().cast("boolean")
        eat()
        if t.startswith("params."):
            name = t[len("params."):]
            if name not in binding:
                raise ValueError(
                    f"kibana: script references params.{name} with no "
                    f"buckets_path entry"
                )
            return F.col(binding[name]).cast("double")
        return F.lit(float(t))

    def binop(sub, ops):
        def go() -> Column:
            left = sub()
            while peek() in ops:
                op = eat()
                left = ops[op](left, sub())
            return left

        return go

    # painless arithmetic is Java double arithmetic: x/0 → ±Inf, 0/0 →
    # NaN, x%0 → NaN — but Spark 4 ANSI mode THROWS on a zero divisor
    # even for doubles (found by the bucket-script property test), so
    # / and % reuse the PromQL compiler's CaseWhen-guarded IEEE forms.
    # A NULL input short-circuits FIRST: the guards' fall-through
    # branches would otherwise turn x/null into ±Inf instead of the
    # null the gap_policy:skip contract promises (code-review r9).
    from kafka_metrics_exporter_spark.promql.compiler import (
        _bin_div,
        _bin_mod,
    )

    def _null_prop(fn):
        def go(a: Column, b: Column) -> Column:
            return F.when(
                a.isNull() | b.isNull(), F.lit(None).cast("double")
            ).otherwise(fn(a, b))

        return go

    mul = binop(primary, {
        "*": lambda a, b: a * b,
        "/": _null_prop(_bin_div),
        "%": _null_prop(_bin_mod),
    })
    add = binop(mul, {"+": lambda a, b: a + b, "-": lambda a, b: a - b})
    cmp_ = binop(add, {
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
    })
    eq = binop(cmp_, {"==": lambda a, b: a == b, "!=": lambda a, b: a != b})
    and_ = binop(eq, {"&&": lambda a, b: a & b})
    or_ = binop(and_, {"||": lambda a, b: a | b})

    out = or_()
    if pos != len(toks):
        raise ValueError(
            f"kibana: trailing script input {toks[pos:]!r} in {script!r}"
        )
    return out


@dataclass(frozen=True)
class BucketSortAgg:
    """ES ``bucket_sort`` pipeline (round 8): order the innermost
    buckets per outer bucket by a sibling metric (or ``_key``, the
    bucket key itself) and truncate to ``[from_, from_ + size)``.
    Truncation is response-shaping only — sibling aggs at the same
    level are computed over the FULL bucket list first, matching ES."""

    sort_label: str  # resolved metric column, or "_key"
    order: str  # asc | desc
    size: int
    from_: int = 0


Bucket = (TermsBucket | DateHistogramBucket | FiltersBucket | HistogramBucket
          | RangeBucket | DateRangeBucket | IpRangeBucket
          | SignificantTermsBucket
          | SignificantTextBucket
          | CompositeBucket | MultiTermsBucket | RareTermsBucket
          | FilterBucket | MissingBucket | AdjacencyMatrixBucket
          | VariableWidthHistogramBucket
          | GeoGridBucket | GeoDistanceBucket | NestedBucket)
Metric = (MetricAgg | TopHitsAgg | PercentilesAgg | PercentileRanksAgg
          | StatsAgg | WeightedAvgAgg | MadAgg | BoxplotAgg
          | RateAgg | TopMetricsAgg | StringStatsAgg
          | GeoBoundsAgg | GeoCentroidAgg | ReverseNestedAgg)


@dataclass(frozen=True)
class VisState:
    title: str
    vis_type: str
    buckets: tuple[Bucket, ...]
    metrics: tuple[Metric, ...]
    pipelines: tuple[PipelineAgg, ...] = ()
    bucket_sort: BucketSortAgg | None = None
    scripts: tuple[BucketScriptAgg, ...] = ()
    stats_pipelines: tuple[BucketStatsTestAgg, ...] = ()


def _bind1(expr: Column, f) -> Column:
    """Evaluate ``expr`` ONCE per row and feed it to ``f`` as a lambda
    leaf: ``get(transform(array(expr), f), 0)``.  Catalyst's project
    collapsing inlines withColumn intermediates into every consumer —
    an expression referenced N times is EVALUATED N times (the
    ip_range horner ran its regex+split ~60x per row before this; the
    KS fold was embedded in all ~40 Kolmogorov series terms, blowing
    the codegen tree).  A lambda variable is a real variable: bound
    once, referenced as a leaf."""
    return F.get(F.transform(F.array(expr), f), 0)


def _slug(s: str) -> str:
    s = re.sub(r"[^A-Za-z0-9]+", "_", s.strip()).strip("_").lower()
    return s or "col"


# ---------------------------------------------------------------------------
# ip_range 128-bit address math (round 16: IPv6)
# ---------------------------------------------------------------------------
#: Lucene/ES store IPv4 as v4-mapped IPv6 (::ffff:a.b.c.d), making ONE
#: 128-bit comparison space for both families.
_V4_MAPPED_BASE = 0xFFFF00000000
_M64 = (1 << 64) - 1
#: word bias: unsigned-64 order == signed-64 order after subtracting
#: 2^63 (the packed-words stance of llmdata/similarity's binary ANN)
_BIAS64 = 1 << 63

_V4_RE = r"^\d{1,3}(\.\d{1,3}){3}$"
#: RFC-4291 textual v6 over hex groups (the embedded v4 tail is
#: expanded to two hex groups BEFORE this regex applies): the classic
#: 9-alternative grammar — full 8 groups, or 1-7 leading groups + '::',
#: '::'-compressed interiors, and the bare/leading-'::' forms.
_V6_RE = (
    r"^(([0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,7}:"
    r"|([0-9A-Fa-f]{1,4}:){1,6}:[0-9A-Fa-f]{1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,5}(:[0-9A-Fa-f]{1,4}){1,2}"
    r"|([0-9A-Fa-f]{1,4}:){1,4}(:[0-9A-Fa-f]{1,4}){1,3}"
    r"|([0-9A-Fa-f]{1,4}:){1,3}(:[0-9A-Fa-f]{1,4}){1,4}"
    r"|([0-9A-Fa-f]{1,4}:){1,2}(:[0-9A-Fa-f]{1,4}){1,5}"
    r"|[0-9A-Fa-f]{1,4}:(:[0-9A-Fa-f]{1,4}){1,6}"
    r"|:((:[0-9A-Fa-f]{1,4}){1,7}|:))$"
)


def _ip128_struct(ip_s: Column) -> Column:
    """IP string → ``struct(hi, lo)``: the address's 128-bit value in
    the v4-mapped unified space, split into two 64-bit words, each
    biased by −2^63 so plain signed-long comparison reproduces
    unsigned 128-bit order.  NULL for malformed input (the doc then
    matches no range).  Pure Column math, evaluated by the caller
    through :func:`_bind1` so the parse runs ONCE per row:

    - dotted-quad: octet split + validate + horner (the round-15 path),
      landed at ``::ffff:a.b.c.d``;
    - v6: an embedded v4 tail expands to two hex groups first
      (format_string, JVM-side), the RFC-4291 grammar validates, then
      split on '::' / pad with zero groups to 8 / per-group base-16
      ``conv`` / two biased-horner words.  Group values are ≤ 0xFFFF,
      so the biased horner ``(((g0−2^15)·2^16+g1)·2^16+g2)·2^16+g3``
      spans exactly [−2^63, 2^63) — no ANSI overflow."""

    def _v4_words(ps):
        o = [F.get(ps, i).cast("long") for i in range(4)]
        ok = F.lit(True)
        for oc in o:
            ok = ok & (oc <= 255)
        u32 = ((o[0] * 256 + o[1]) * 256 + o[2]) * 256 + o[3]
        return F.when(
            ok,
            F.struct(
                F.lit(-_BIAS64).alias("hi"),
                (F.lit(_V4_MAPPED_BASE - _BIAS64) + u32).alias("lo"),
            ),
        )

    def _v6_words(padded):
        def g(i):
            return F.conv(F.get(padded, i), 16, 10).cast("long")

        def word(a, b, c, d_):
            return (
                ((a - F.lit(32768)) * 65536 + b) * 65536 + c
            ) * 65536 + d_

        return F.struct(
            word(g(0), g(1), g(2), g(3)).alias("hi"),
            word(g(4), g(5), g(6), g(7)).alias("lo"),
        )

    def _v6_from_groups(s2):
        parts = F.split(s2, "::")

        def _with_parts(pa):
            l_arr = F.filter(
                F.split(F.get(pa, 0), ":"), lambda x: x != ""
            )
            r_arr = F.when(
                F.size(pa) == 2,
                F.filter(F.split(F.get(pa, 1), ":"), lambda x: x != ""),
            ).otherwise(F.array().cast("array<string>"))
            padded = F.concat(
                l_arr,
                F.array_repeat(
                    F.lit("0"),
                    F.lit(8) - F.size(l_arr) - F.size(r_arr),
                ),
                r_arr,
            )
            return _bind1(padded, _v6_words)

        return _bind1(parts, _with_parts)

    def _v4_tail_expand(ps):
        # a.b.c.d tail -> '%x:%x' of (a*256+b, c*256+d); invalid
        # octets null the concat, which nulls the whole parse
        o = [F.get(ps, i).cast("long") for i in range(4)]
        ok = F.lit(True)
        for oc in o:
            ok = ok & (oc <= 255)
        return F.when(
            ok,
            F.format_string(
                "%x:%x", o[0] * 256 + o[1], o[2] * 256 + o[3]
            ),
        )

    tail_re = r"^(.*:)(\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3})$"
    # bind the extracted tail once (optimization r16): the empty check
    # and the split both referenced it, so the tail regex ran twice on
    # top of the group-1 extract — 3 evaluations of the same pattern
    s2 = _bind1(
        F.regexp_extract(ip_s, tail_re, 2),
        lambda tail: F.when(tail == "", ip_s).otherwise(
            F.concat(
                F.regexp_extract(ip_s, tail_re, 1),
                _bind1(F.split(tail, r"\."), _v4_tail_expand),
            )
        ),
    )
    return F.when(
        ip_s.rlike(_V4_RE), _bind1(F.split(ip_s, r"\."), _v4_words)
    ).when(
        ip_s.contains(":"),
        _bind1(
            s2,
            lambda s2b: F.when(
                s2b.rlike(_V6_RE), _v6_from_groups(s2b)
            ),
        ),
    )


def _ip128_bounds(v: int) -> tuple[int, int]:
    """128-bit endpoint → its two biased signed-64 word literals."""
    return (v >> 64) - _BIAS64, (v & _M64) - _BIAS64


# ---------------------------------------------------------------------------
# geo column math (round 16)
# ---------------------------------------------------------------------------
_GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"
#: Lucene GeoUtils.EARTH_MEAN_RADIUS (meters) — what ES arc distance uses
_EARTH_MEAN_RADIUS_M = 6371008.7714
#: Web-Mercator latitude bound (ES GeoTileUtils.LATITUDE_MASK)
_MERCATOR_LAT = 85.0511287798066


def _geo_lat_lon(col: Column) -> tuple[Column, Column]:
    """geo_point contract: a ``struct<lat:double, lon:double>``
    column (ES's geo_point IS that pair; the relational engine makes
    it explicit)."""
    return col.getField("lat").cast("double"), col.getField("lon").cast(
        "double"
    )


def _geo_valid(lat: Column, lon: Column) -> Column:
    """ES rejects out-of-range coordinates at index time; an engine
    reading raw structs drops them (the ip_range malformed-doc
    stance)."""
    return (
        lat.isNotNull() & lon.isNotNull()
        & (lat >= -90.0) & (lat <= 90.0)
        & (lon >= -180.0) & (lon <= 180.0)
    )


def geohash_column(lat: Column, lon: Column, precision: int) -> Column:
    """The textbook geohash: bisect lon/lat alternately (lon takes the
    first and every odd bit), 5 bits per base-32 character.  Closed
    form: the cell indices are ``floor((lon+180)/360 · 2^lonbits)``
    (clamped at the top edge so +90/+180 land in the last cell, as
    every geohash encoder does) Morton-interleaved to ``5·precision``
    bits — unrolled at COMPILE time into static shift/mask/add terms
    and bound evaluate-once before the base-32 rendering."""
    n = 5 * precision
    lonbits = (n + 1) // 2
    latbits = n // 2
    lonv = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lonbits)))
        .cast("long"),
        F.lit((1 << lonbits) - 1),
    )
    latv = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << latbits)))
        .cast("long"),
        F.lit((1 << latbits) - 1),
    )

    def _interleave(lonb: Column, latb: Column) -> Column:
        inter = None
        for j in range(lonbits):
            t = F.shiftright(lonb, lonbits - 1 - j).bitwiseAND(F.lit(1)) * F.lit(
                1 << (n - 1 - 2 * j)
            )
            inter = t if inter is None else inter + t
        for j in range(latbits):
            t = F.shiftright(latb, latbits - 1 - j).bitwiseAND(F.lit(1)) * F.lit(
                1 << (n - 2 - 2 * j)
            )
            inter = inter + t
        return inter

    alphabet = F.array(*[F.lit(c) for c in _GEOHASH32])

    def _chars(iv: Column) -> Column:
        cs = []
        for k in range(precision):
            d = F.shiftright(iv, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31))
            cs.append(F.element_at(alphabet, (d + F.lit(1)).cast("int")))
        return F.concat(*cs)

    # bind the cell indices AND the interleave once each — the chars
    # would otherwise re-evaluate the full bit sum per character
    return _bind1(
        F.struct(lonv.alias("lo"), latv.alias("la")),
        lambda c: _bind1(_interleave(c["lo"], c["la"]), _chars),
    )


def geotile_column(lat: Column, lon: Column, zoom: int) -> Column:
    """ES ``geotile_grid`` key ``"z/x/y"``: standard Web-Mercator
    slippy tiles, latitude clamped to ±85.0511287798 like
    GeoTileUtils; x/y clamp into [0, 2^z) at the edges."""
    import math as _math

    cells = 1 << zoom
    lat_c = F.greatest(
        F.least(lat, F.lit(_MERCATOR_LAT)), F.lit(-_MERCATOR_LAT)
    )
    x = F.least(
        F.greatest(
            F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(cells))),
            F.lit(0),
        ),
        F.lit(cells - 1),
    ).cast("long")
    y = F.least(
        F.greatest(
            F.floor(
                (F.lit(1.0) - F.asinh(F.tan(F.radians(lat_c))) / F.lit(_math.pi))
                / F.lit(2.0)
                * F.lit(float(cells))
            ),
            F.lit(0),
        ),
        F.lit(cells - 1),
    ).cast("long")
    return F.concat_ws(
        "/", F.lit(str(zoom)), x.cast("string"), y.cast("string")
    )


def haversine_meters(lat: Column, lon: Column, olat: float, olon: float) -> Column:
    """Arc distance to a fixed origin in meters — haversine on
    Lucene's mean earth radius (ES's arc distance)."""
    import math as _math

    p1 = F.radians(lat)
    l1 = F.radians(lon)
    sp = F.sin((p1 - F.lit(_math.radians(olat))) / F.lit(2.0))
    sl = F.sin((l1 - F.lit(_math.radians(olon))) / F.lit(2.0))
    a = sp * sp + F.cos(p1) * F.lit(_math.cos(_math.radians(olat))) * sl * sl
    return F.lit(2.0 * _EARTH_MEAN_RADIUS_M) * F.asin(F.sqrt(a))


def _bound_us(v) -> int:
    """extended_bounds endpoint → epoch micros: ES accepts epoch
    MILLIS numbers or date strings; ISO strings parse here.  ES treats
    tz-naive date strings as UTC (no per-request timezone here), so a
    naive ``fromisoformat`` result is pinned to UTC before ``.timestamp()``
    — mirroring ``_to_us`` — rather than inheriting the host's zone."""
    if isinstance(v, (int, float)):
        return int(v) * 1000
    import datetime as _dt

    parsed = _dt.datetime.fromisoformat(str(v))
    if parsed.tzinfo is None:
        parsed = parsed.replace(tzinfo=_dt.timezone.utc)
    return int(parsed.timestamp() * 1_000_000)


def _parse_interval_us(params: dict) -> tuple[int, bool]:
    interval = params.get("interval", "auto")
    auto = interval == "auto"
    if auto:
        interval = params.get("customInterval") or "1h"
    m = re.fullmatch(r"(\d+)(ms|[smhdw])", interval)
    if not m:
        raise ValueError(f"kibana: unsupported date_histogram interval {interval!r}")
    return int(m.group(1)) * _INTERVAL_UNITS_US[m.group(2)], auto


# Kibana's auto-interval ladder (calculate_auto_time_expression): the
# "nice" fixed intervals the UI rounds to.  Calendar units (month/year)
# are excluded — fixed-interval epoch bucketing can't express them, and
# the corpus never reaches spans where they'd win.
_AUTO_LADDER_US = [
    1_000,  # 1ms
    10_000,
    100_000,
    500_000,
    1_000_000,  # 1s
    5_000_000,
    10_000_000,
    30_000_000,
    60_000_000,  # 1m
    5 * 60_000_000,
    10 * 60_000_000,
    30 * 60_000_000,
    3_600_000_000,  # 1h
    3 * 3_600_000_000,
    12 * 3_600_000_000,
    86_400_000_000,  # 1d
    7 * 86_400_000_000,  # 1w
]


def auto_interval_us(span_us: int, target_buckets: int) -> int:
    """ES/Kibana auto-interval: the smallest ladder interval that fits
    the time span into at most ``target_buckets`` buckets (Kibana
    targets ~50 per panel)."""
    if target_buckets < 1:
        raise ValueError("kibana: auto interval needs target_buckets >= 1")
    for iv in _AUTO_LADDER_US:
        if span_us <= iv * target_buckets:
            return iv
    return _AUTO_LADDER_US[-1]


# ES auto_date_histogram's rounding ladder (AutoDateHistogramAggregation
# Builder.buildRoundings): unit × innerIntervals, FIXED units only —
# the calendar roundings (months, years) cannot be expressed as epoch
# arithmetic, so a span that needs them raises instead of silently
# bucketing wrong (same stance as the Kibana auto ladder above).
_ES_AUTO_LADDER_US = [
    n * u
    for u, inners in (
        (1_000_000, (1, 5, 10, 30)),             # seconds
        (60_000_000, (1, 5, 10, 30)),            # minutes
        (3_600_000_000, (1, 3, 12)),             # hours
        (86_400_000_000, (1, 7)),                # days (7d = ES "week")
    )
    for n in inners
]


# ES rate-agg units (fixed-length only: month/quarter/year are
# calendar units — rejected at parse, same stance as the ladders).
_RATE_UNIT_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def es_auto_date_interval_us(
    lo_us: int, hi_us: int, target_buckets: int
) -> int:
    """ES ``auto_date_histogram`` interval choice: the smallest ladder
    interval whose bucket count over the populated span stays within
    ``target_buckets``.  ES rounds the endpoint KEYS before counting,
    so the count comes from the floored endpoints —
    ``hi//iv - lo//iv + 1`` — not from ``span//iv + 1``: a raw span
    that fits can still straddle one extra bucket boundary once both
    endpoints are floored (ADVICE r13)."""
    if target_buckets < 1:
        raise ValueError(
            "kibana: auto_date_histogram needs buckets >= 1"
        )
    for iv in _ES_AUTO_LADDER_US:
        if (hi_us // iv) - (lo_us // iv) + 1 <= target_buckets:
            return iv
    raise ValueError(
        "kibana: auto_date_histogram span needs calendar intervals "
        "(months/years), which fixed-interval epoch bucketing cannot "
        "express — raise 'buckets' or use a date_histogram"
    )


# The only metric ops the terms/multi_terms ranking loop (step 3 of
# _evaluate) can order by — an ALLOWLIST, not a denylist: any other op
# (top_hits, median, percentiles, stats, and the round-12 additions
# value_count / weighted_avg / median_absolute_deviation / boxplot)
# must fail here at parse time with a clean error, not a KeyError deep
# in the ranking loop (ADVICE r12).
_ORDERABLE_METRIC_OPS = ("count", "avg", "min", "max", "sum", "cardinality")


def _order_metric_checked(
    bucket_kind: str, order_by: str, op: str, field
) -> tuple[str, str]:
    if op not in _ORDERABLE_METRIC_OPS:
        raise ValueError(
            f"kibana: {bucket_kind} orderBy={order_by!r} must reference a "
            f"simple metric agg ({'/'.join(_ORDERABLE_METRIC_OPS)}), "
            f"got {op!r}"
        )
    if op != "count" and not field:
        raise ValueError(
            f"kibana: {bucket_kind} orderBy={order_by!r} metric {op!r} "
            f"needs a field"
        )
    return (op, field)


def parse_vis_state(vis_state: str | dict) -> VisState:
    """Parse a Kibana ``visState`` (JSON string or dict) into the agg
    AST.  Disabled aggs are skipped, bucket order is preserved (it
    defines the grouping nesting), metrics keep their declaration
    order."""
    state = json.loads(vis_state) if isinstance(vis_state, str) else vis_state
    aggs = [a for a in state.get("aggs", []) if a.get("enabled", True)]
    by_id = {a["id"]: a for a in aggs}
    buckets: list[Bucket] = []
    metrics: list[Metric] = []
    pipelines_raw: list[tuple[str, str, str, int]] = []  # (op, path, label, window)
    bucket_sort_raw: tuple[str, str, int, int] | None = None  # (path, order, size, from)
    scripts_raw: list[tuple[str, dict, str, str]] = []  # (op, paths, script, label)
    # (op, path, label, expectations, fractions, doc_count, alts, seq)
    stats_tests_raw: list[tuple] = []
    for _seq, a in enumerate(aggs):
        p = a.get("params", {})
        schema = a.get("schema", "metric")
        label = _slug(p.get("customLabel") or f'{a["type"]}_{a["id"]}')
        if a["type"] == "terms":
            order_by = str(p.get("orderBy", "_term"))
            order_metric = None
            if order_by == "custom":
                oa = p.get("orderAgg", {})
                order_metric = _order_metric_checked(
                    "terms", order_by,
                    oa.get("type", "avg"), oa.get("params", {}).get("field"),
                )
            elif order_by != "_term":
                tgt = by_id.get(order_by)
                if tgt is None:
                    raise ValueError(
                        f"kibana: terms orderBy={order_by!r} must reference a "
                        f"simple metric agg (count/avg/min/max/sum/cardinality)"
                    )
                order_metric = _order_metric_checked(
                    "terms", order_by, tgt["type"], tgt["params"].get("field")
                )
            buckets.append(
                TermsBucket(
                    field=p["field"],
                    size=int(p.get("size", 5)),
                    order=p.get("order", "desc"),
                    order_by=order_by,
                    label=label,
                    order_metric=order_metric,
                    missing=(
                        str(p["missing"]) if p.get("missing") is not None
                        else None
                    ),
                )
            )
        elif a["type"] == "composite":
            raw_sources = p.get("sources")
            if not isinstance(raw_sources, list) or not raw_sources:
                raise ValueError(
                    "kibana: composite needs a non-empty 'sources' list"
                )
            srcs = []
            for src in raw_sources:
                # ES-proper source shape: {name: {kind: {...}}}
                if not isinstance(src, dict) or len(src) != 1:
                    raise ValueError(
                        f"kibana: composite source must be a one-entry "
                        f"{{name: {{kind: ...}}}} dict, got {src!r}"
                    )
                sname, body = next(iter(src.items()))
                if not isinstance(body, dict) or len(body) != 1:
                    raise ValueError(
                        f"kibana: bad composite source body {body!r}"
                    )
                kind, spec = next(iter(body.items()))
                if kind == "terms":
                    srcs.append((sname, str(spec["field"]), "terms", 0))
                elif kind == "date_histogram":
                    iv, auto = _parse_interval_us(
                        {"interval": spec.get("interval", "1h")}
                    )
                    if auto:
                        raise ValueError(
                            "kibana: composite date_histogram needs a "
                            "fixed interval (no ambient time picker)"
                        )
                    srcs.append((sname, str(spec["field"]), "date_histogram", iv))
                elif kind == "histogram":
                    h_iv = float(spec.get("interval", 0))
                    if h_iv <= 0:
                        raise ValueError(
                            "kibana: composite histogram needs a "
                            "positive numeric interval"
                        )
                    srcs.append(
                        (sname, str(spec["field"]), "histogram", h_iv)
                    )
                else:
                    raise ValueError(
                        f"kibana: unsupported composite source kind {kind!r}"
                    )
            after = p.get("after")
            if after is not None:
                if not isinstance(after, (list, tuple)) or len(after) != len(srcs):
                    raise ValueError(
                        "kibana: composite 'after' must list one value "
                        "per source (the last key tuple of the previous "
                        "page)"
                    )
                after = tuple(after)
            buckets.append(
                CompositeBucket(
                    sources=tuple(srcs),
                    size=int(p.get("size", 10)),
                    label=label,
                    after=after,
                )
            )
        elif a["type"] == "significant_terms":
            fg = p.get("foreground") or p.get("fg")
            if not isinstance(fg, str) or not fg.strip():
                raise ValueError(
                    "kibana: significant_terms needs an explicit "
                    "'foreground' query_string param (Kibana derives the "
                    "foreground from the dashboard search bar; this "
                    "engine has no ambient query)"
                )
            buckets.append(
                SignificantTermsBucket(
                    field=p["field"],
                    size=int(p.get("size", 5)),
                    foreground=fg,
                    label=label,
                    min_doc_count=int(p.get("min_doc_count", 3)),
                )
            )
        elif a["type"] == "variable_width_histogram":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: variable_width_histogram must be a bucket agg"
                )
            nb = int(p.get("buckets", 10))
            if not 1 <= nb <= 100:
                raise ValueError(
                    "kibana: variable_width_histogram buckets must be "
                    "in [1, 100]"
                )
            buckets.append(
                VariableWidthHistogramBucket(
                    field=p["field"], buckets=nb, label=label
                )
            )
        elif a["type"] == "adjacency_matrix":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: adjacency_matrix must be a bucket agg"
                )
            raw_flt = p.get("filters") or {}
            if isinstance(raw_flt, dict):
                pairs = list(raw_flt.items())
            else:
                pairs = [
                    (f.get("label") or f"filter_{i}",
                     f["input"]["query"]["query_string"]["query"]
                     if isinstance(f.get("input"), dict) else f["query"])
                    for i, f in enumerate(raw_flt)
                ]
            if not pairs:
                raise ValueError(
                    "kibana: adjacency_matrix needs at least one filter"
                )
            if len(pairs) > 100:
                # ES indices.query.bool.max_clause_count-backed default
                raise ValueError(
                    "kibana: adjacency_matrix supports at most 100 filters"
                )
            sep = str(p.get("separator", "&"))
            names = [str(k) for k, _ in pairs]
            if len(set(names)) != len(names):
                raise ValueError(
                    "kibana: adjacency_matrix filter names must be unique"
                )
            if any(sep in n for n in names):
                raise ValueError(
                    "kibana: adjacency_matrix filter names must not "
                    "contain the separator"
                )
            buckets.append(
                AdjacencyMatrixBucket(
                    # ES's AdjacencyMatrixAggregationBuilder sorts the
                    # keyed filters lexicographically before building
                    # intersection keys ("internally we want to have a
                    # fixed order of filters"), so 'big&hasB' — never
                    # 'hasB&big' — regardless of declaration order
                    # (ADVICE r13)
                    filters=tuple(
                        sorted(
                            ((str(k), str(q)) for k, q in pairs),
                            key=lambda kv: kv[0],
                        )
                    ),
                    label=label,
                    separator=sep,
                )
            )
        elif a["type"] == "significant_text":
            fg = p.get("foreground") or p.get("fg")
            if not isinstance(fg, str) or not fg.strip():
                raise ValueError(
                    "kibana: significant_text needs an explicit "
                    "'foreground' query_string param (same contract as "
                    "significant_terms)"
                )
            if p.get("filter_duplicate_text"):
                raise ValueError(
                    "kibana: significant_text filter_duplicate_text is "
                    "not modelled — run the corpus through "
                    "llmdata/dedup first"
                )
            buckets.append(
                SignificantTextBucket(
                    field=p["field"],
                    size=int(p.get("size", 5)),
                    foreground=fg,
                    label=label,
                    min_doc_count=int(p.get("min_doc_count", 3)),
                )
            )
        elif a["type"] == "categorize_text":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: categorize_text must be a bucket agg"
                )
            if not p.get("field"):
                raise ValueError("kibana: categorize_text needs a field")
            sim = int(p.get("similarity_threshold", 100))
            if not 1 <= sim <= 100:
                raise ValueError(
                    "kibana: categorize_text similarity_threshold "
                    "must be in [1, 100]"
                )
            buckets.append(
                CategorizeTextBucket(
                    field=p["field"],
                    size=int(p.get("size", 10)),
                    label=label,
                    similarity_threshold=sim,
                )
            )
        elif a["type"] == "random_sampler":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: random_sampler must be a bucket agg"
                )
            if buckets:
                raise ValueError(
                    "kibana: random_sampler must be the first (top-"
                    "level) bucket agg, like ES"
                )
            prob = float(p.get("probability", 0))
            # ES's own contract: (0, 0.5] or exactly 1
            if not (0 < prob <= 0.5 or prob == 1.0):
                raise ValueError(
                    "kibana: random_sampler probability must be in "
                    "(0, 0.5] or exactly 1"
                )
            if p.get("seed") is None:
                # ES generates a seed when absent — non-reproducible;
                # the deterministic stance requires one explicitly
                raise ValueError(
                    "kibana: random_sampler needs an explicit seed "
                    "(deterministic, replayable sampling)"
                )
            if not p.get("id_field"):
                raise ValueError(
                    "kibana: random_sampler needs id_field — ES hashes "
                    "shard-relative doc ids (not reproducible); the "
                    "deterministic twin hashes an explicit doc identity"
                )
            buckets.append(
                RandomSamplerBucket(
                    probability=prob,
                    seed=int(p["seed"]),
                    id_field=str(p["id_field"]),
                    label=label,
                )
            )
        elif a["type"] == "sampler":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: sampler must be a bucket agg")
            if buckets:
                raise ValueError(
                    "kibana: sampler must be the first (top-level) "
                    "bucket agg, like ES"
                )
            shard_size = int(p.get("shard_size", 100))  # ES default
            if shard_size < 1:
                raise ValueError(
                    "kibana: sampler shard_size must be >= 1"
                )
            if p.get("seed") is None or not p.get("id_field"):
                # ES keeps per-shard top-SCORED docs — score- and
                # layout-sensitive; the deterministic twin needs an
                # explicit identity + seed (random_sampler stance)
                raise ValueError(
                    "kibana: sampler needs an explicit seed and "
                    "id_field (deterministic residue top-k where ES "
                    "keeps per-shard top-scored docs)"
                )
            buckets.append(
                SamplerBucket(
                    shard_size=shard_size,
                    seed=int(p["seed"]),
                    id_field=str(p["id_field"]),
                    label=label,
                )
            )
        elif a["type"] == "ip_range":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: ip_range must be a bucket agg")
            if not p.get("field"):
                raise ValueError("kibana: ip_range needs a field")
            import ipaddress as _ip

            def _ip_int(s, what):
                # v4 and v6 share Lucene's 128-bit space: v4 maps to
                # ::ffff:a.b.c.d (how ES's ip field compares both
                # families), so cross-family ranges work like ES
                try:
                    addr = _ip.ip_address(str(s))
                except ValueError as e:
                    raise ValueError(
                        f"kibana: ip_range {what} {s!r} is not a valid "
                        f"IP address"
                    ) from e
                return int(addr) + (
                    _V4_MAPPED_BASE if addr.version == 4 else 0
                )

            ipranges: list[tuple[str, int | None, int | None]] = []
            for r in p.get("ranges", []):
                if r.get("mask"):
                    try:
                        net = _ip.ip_network(str(r["mask"]), strict=False)
                    except ValueError as e:
                        raise ValueError(
                            f"kibana: ip_range mask {r['mask']!r} is "
                            f"not a valid CIDR"
                        ) from e
                    base = int(net.network_address) + (
                        _V4_MAPPED_BASE if net.version == 4 else 0
                    )
                    end = base + net.num_addresses
                    ipranges.append((
                        str(r.get("key") or r["mask"]),
                        base,
                        # ::/0 ends at 2^128: unbounded above
                        None if end >= (1 << 128) else end,
                    ))
                    continue
                lo = (
                    _ip_int(r["from"], "from")
                    if r.get("from") is not None else None
                )
                hi = (
                    _ip_int(r["to"], "to")
                    if r.get("to") is not None else None
                )
                key = str(
                    r.get("key")
                    or f"{r.get('from') or '*'}-{r.get('to') or '*'}"
                )
                ipranges.append((key, lo, hi))
            if not ipranges:
                raise ValueError(
                    "kibana: ip_range needs at least one range"
                )
            buckets.append(
                IpRangeBucket(
                    field=p["field"], ranges=tuple(ipranges), label=label
                )
            )
        elif a["type"] in ("geohash_grid", "geotile_grid"):
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(f"kibana: {a['type']} must be a bucket agg")
            if not p.get("field"):
                raise ValueError(f"kibana: {a['type']} needs a field")
            kind = "geohash" if a["type"] == "geohash_grid" else "geotile"
            prec = int(p.get("precision", 5 if kind == "geohash" else 7))
            lo, hi = (1, 12) if kind == "geohash" else (0, 29)
            if not lo <= prec <= hi:
                raise ValueError(
                    f"kibana: {a['type']} precision must be in "
                    f"[{lo}, {hi}] (ES's own bound)"
                )
            gbounds = None
            if p.get("bounds") is not None:
                bb = p["bounds"]
                try:
                    tl, br = bb["top_left"], bb["bottom_right"]
                    gbounds = (
                        float(tl["lat"]), float(tl["lon"]),
                        float(br["lat"]), float(br["lon"]),
                    )
                except (TypeError, KeyError) as exc:
                    raise ValueError(
                        f"kibana: {a['type']} bounds needs "
                        "{top_left: {lat, lon}, bottom_right: "
                        "{lat, lon}}"
                    ) from exc
                t_, l_, b_, r_ = gbounds
                if not (t_ >= b_):
                    raise ValueError(
                        f"kibana: {a['type']} bounds top_left.lat must "
                        "be >= bottom_right.lat"
                    )
                if not (l_ <= r_):
                    raise ValueError(
                        f"kibana: {a['type']} bounds crossing the "
                        "antimeridian (left > right) is not modelled "
                        "(documented; split the viewport into two "
                        "requests)"
                    )
            buckets.append(
                GeoGridBucket(
                    field=p["field"],
                    precision=prec,
                    size=int(p.get("size", 10000)),
                    label=label,
                    kind=kind,
                    bounds=gbounds,
                )
            )
        elif a["type"] == "geo_distance":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: geo_distance must be a bucket agg")
            if not p.get("field"):
                raise ValueError("kibana: geo_distance needs a field")
            org = p.get("origin")
            if isinstance(org, dict) and "lat" in org and "lon" in org:
                origin = (float(org["lat"]), float(org["lon"]))
            elif isinstance(org, str) and "," in org:
                a_, b_ = org.split(",", 1)
                origin = (float(a_), float(b_))
            else:
                raise ValueError(
                    "kibana: geo_distance needs an origin — "
                    "{'lat': .., 'lon': ..} or a 'lat,lon' string"
                )
            if not (-90 <= origin[0] <= 90 and -180 <= origin[1] <= 180):
                raise ValueError(
                    f"kibana: geo_distance origin {origin} out of range"
                )
            unit = str(p.get("unit", "m"))
            if unit not in ("m", "km"):
                raise ValueError(
                    "kibana: geo_distance unit must be 'm' or 'km' "
                    "(other ES suffixes are not modelled)"
                )
            scale = 1000.0 if unit == "km" else 1.0
            granges: list[tuple[str, float | None, float | None]] = []
            for r in p.get("ranges", []):
                lo_ = float(r["from"]) * scale if r.get("from") is not None else None
                hi_ = float(r["to"]) * scale if r.get("to") is not None else None
                key = str(
                    r.get("key")
                    or f"{r.get('from') if r.get('from') is not None else '*'}"
                       f"-{r.get('to') if r.get('to') is not None else '*'}"
                )
                granges.append((key, lo_, hi_))
            if not granges:
                raise ValueError("kibana: geo_distance needs at least one range")
            buckets.append(
                GeoDistanceBucket(
                    field=p["field"], origin=origin,
                    ranges=tuple(granges), label=label,
                )
            )
        elif a["type"] == "nested":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: nested must be a bucket agg")
            if not p.get("path"):
                raise ValueError("kibana: nested needs a path")
            if "." in str(p["path"]):
                raise ValueError(
                    "kibana: nested path must be a top-level "
                    "array<struct> column (this engine's flattened "
                    "doc model; deeper paths are further explodes — "
                    "not modelled)"
                )
            if buckets:
                raise ValueError(
                    "kibana: nested must be the first bucket agg (it "
                    "switches the aggregation context for everything "
                    "after it; ES's deeper nesting is not modelled)"
                )
            buckets.append(NestedBucket(path=str(p["path"]), label=label))
        elif a["type"] == "reverse_nested":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: reverse_nested is modelled as a metric — "
                    "the parent doc_count (parent-level metric "
                    "sub-aggs would double-count over the exploded "
                    "relation and are not modelled)"
                )
            if not p.get("id_field"):
                raise ValueError(
                    "kibana: reverse_nested needs an explicit "
                    "'id_field' naming the root-document key (ES "
                    "tracks root docs via Lucene doc ids; a "
                    "relational engine needs the key named)"
                )
            metrics.append(
                ReverseNestedAgg(id_field=str(p["id_field"]), label=label)
            )
        elif a["type"] == "diversified_sampler":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: diversified_sampler must be a bucket agg"
                )
            if buckets:
                raise ValueError(
                    "kibana: diversified_sampler must be the first "
                    "(top-level) bucket agg, like ES"
                )
            if not p.get("field"):
                raise ValueError(
                    "kibana: diversified_sampler needs the de-dup field"
                )
            mdpv = int(p.get("max_docs_per_value", 1))
            if mdpv < 1:
                raise ValueError(
                    "kibana: diversified_sampler max_docs_per_value "
                    "must be >= 1"
                )
            if p.get("seed") is None or not p.get("id_field"):
                raise ValueError(
                    "kibana: diversified_sampler needs an explicit seed "
                    "and id_field (deterministic, replayable sampling — "
                    "see random_sampler)"
                )
            buckets.append(
                DiversifiedSamplerBucket(
                    field=str(p["field"]),
                    max_docs_per_value=mdpv,
                    seed=int(p["seed"]),
                    id_field=str(p["id_field"]),
                    label=label,
                )
            )
        elif a["type"] == "frequent_item_sets":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: frequent_item_sets must be a bucket agg"
                )
            raw_ff = p.get("fields") or []
            fis_fields = tuple(
                str(f["field"] if isinstance(f, dict) else f)
                for f in raw_ff
            )
            if len(fis_fields) < 2:
                raise ValueError(
                    "kibana: frequent_item_sets needs at least two fields"
                )
            if len(set(fis_fields)) != len(fis_fields):
                raise ValueError(
                    "kibana: frequent_item_sets fields must be distinct"
                )
            fis_sup = float(p.get("minimum_support", 0.1))
            if not 0 < fis_sup <= 1:
                raise ValueError(
                    "kibana: frequent_item_sets minimum_support must be "
                    "in (0, 1]"
                )
            fis_mss = int(p.get("minimum_set_size", 1))
            if not 1 <= fis_mss <= 3:
                raise ValueError(
                    "kibana: frequent_item_sets minimum_set_size must "
                    "be in [1, 3] (set size is capped at 3)"
                )
            buckets.append(
                FrequentItemSetsBucket(
                    fields=fis_fields,
                    min_support=fis_sup,
                    min_set_size=fis_mss,
                    size=int(p.get("size", 10)),
                    label=label,
                )
            )
        elif a["type"] == "date_histogram":
            interval_us, auto = _parse_interval_us(p)
            mdc = int(p.get("min_doc_count", 1))
            if mdc < 0:
                raise ValueError("kibana: min_doc_count must be >= 0")
            eb = p.get("extended_bounds")
            # Kibana writes an EMPTY extended_bounds stub ({}) on every
            # date_histogram (the corpus's six all do) — only a dict
            # carrying BOTH endpoints means the user set bounds
            if not eb or eb.get("min") is None or eb.get("max") is None:
                eb = None
            if eb is not None:
                if mdc != 0:
                    raise ValueError(
                        "kibana: extended_bounds needs min_doc_count=0 "
                        "(without zero-fill it changes nothing — ES docs "
                        "make the same pairing explicit)"
                    )
                eb = (_bound_us(eb["min"]), _bound_us(eb["max"]))
                if eb[0] > eb[1]:
                    raise ValueError("kibana: extended_bounds min > max")
            buckets.append(
                DateHistogramBucket(
                    field=p["field"],
                    interval_us=interval_us,
                    label=label,
                    min_doc_count=mdc,
                    extended_bounds=eb,
                    auto=auto,
                )
            )
        elif a["type"] == "multi_terms":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: multi_terms must be a bucket agg")
            raw_terms = p.get("terms") or p.get("fields") or []
            flds = tuple(
                str(t["field"]) if isinstance(t, dict) else str(t)
                for t in raw_terms
            )
            if len(flds) < 2:
                raise ValueError(
                    "kibana: multi_terms needs at least two fields"
                )
            order = str(p.get("order", "desc"))
            if order not in ("asc", "desc"):
                raise ValueError("kibana: multi_terms order must be asc|desc")
            # ES orders multi_terms buckets exactly like terms: by doc
            # count (default), by the key tuple (_key), or by a
            # sub-aggregation metric / custom orderAgg — resolved here
            # the same way as the terms branch so the shared ranking
            # loop (step 3) handles both (round 12; metric ordering
            # previously raised).
            order_by = str(p.get("orderBy", "_count"))
            order_metric: "tuple[str, str] | None" = ("count", "")
            if order_by in ("_key", "_term"):
                order_by = "_term"  # ranking loop: key path (joined)
            elif order_by == "custom":
                oa = p.get("orderAgg", {})
                order_metric = _order_metric_checked(
                    "multi_terms", order_by,
                    oa.get("type", "avg"), oa.get("params", {}).get("field"),
                )
            elif order_by != "_count":
                tgt = by_id.get(order_by)
                if tgt is None:
                    raise ValueError(
                        f"kibana: multi_terms orderBy={order_by!r} must "
                        f"reference a simple metric agg "
                        f"(count/avg/min/max/sum/cardinality)"
                    )
                order_metric = _order_metric_checked(
                    "multi_terms", order_by,
                    tgt["type"], tgt["params"].get("field"),
                )
            buckets.append(
                MultiTermsBucket(
                    fields=flds, size=int(p.get("size", 10)),
                    order=order, label=label,
                    order_by=order_by, order_metric=order_metric,
                )
            )
        elif a["type"] == "rare_terms":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: rare_terms must be a bucket agg")
            mdc = int(p.get("max_doc_count", 1))
            if not 1 <= mdc <= 100:
                # ES rejects max_doc_count above 100 (precision bound)
                raise ValueError(
                    "kibana: rare_terms max_doc_count must be in [1, 100]"
                )
            buckets.append(
                RareTermsBucket(
                    field=p["field"], max_doc_count=mdc, label=label
                )
            )
        elif a["type"] == "filters":
            flt = tuple(
                (
                    _slug(f.get("label") or f"filter_{i}"),
                    f["input"]["query"]["query_string"]["query"],
                )
                for i, f in enumerate(p.get("filters", []))
            )
            other_key = None
            # ES: setting other_bucket_key implicitly enables
            # other_bucket (second-review 11.5)
            if p.get("other_bucket") or p.get("other_bucket_key") is not None:
                other_key = _slug(str(p.get("other_bucket_key", "_other_")))
                if other_key in {lbl for lbl, _ in flt}:
                    # ES keeps '_other_' distinct from a filter LABELED
                    # 'other'; this engine's slugged label space cannot,
                    # so a collision would silently merge non-matching
                    # docs into a real bucket — reject loudly
                    raise ValueError(
                        f"kibana: other_bucket key {other_key!r} collides "
                        f"with a filter label after slugging — rename one"
                    )
            buckets.append(
                FiltersBucket(filters=flt, label=label, other_key=other_key)
            )
        elif a["type"] == "filter":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: filter must be a bucket agg")
            q = p.get("query")
            if q is None and isinstance(p.get("filter"), dict):
                # ES-request shape: {"filter": {"query_string": {...}}}
                # / Kibana's {"filter": {"query": ..., "language": ..}}
                q = p["filter"].get("query")
            if not isinstance(q, str) or not q.strip():
                raise ValueError("kibana: filter agg needs a query string")
            buckets.append(FilterBucket(query=q, label=label))
        elif a["type"] == "missing":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: missing must be a bucket agg")
            if not p.get("field"):
                raise ValueError("kibana: missing agg needs a field")
            buckets.append(MissingBucket(field=p["field"], label=label))
        elif a["type"] == "auto_date_histogram":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: auto_date_histogram must be a bucket agg"
                )
            nb = int(p.get("buckets", 10))
            if nb < 1:
                raise ValueError(
                    "kibana: auto_date_histogram buckets must be >= 1"
                )
            buckets.append(
                DateHistogramBucket(
                    field=p["field"],
                    interval_us=_INTERVAL_UNITS_US["h"],  # pre-resolve stub
                    label=label,
                    auto_buckets=nb,
                )
            )
        elif a["type"] == "rate":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: rate cannot be a bucket agg")
            unit = str(p.get("unit", "")) or None
            if unit is not None and unit not in _RATE_UNIT_US:
                raise ValueError(
                    f"kibana: rate unit must be one of "
                    f"{sorted(_RATE_UNIT_US)}, got {unit!r}"
                )
            mode = str(p.get("mode", "sum"))
            if mode not in ("sum", "value_count"):
                raise ValueError(
                    "kibana: rate mode must be sum|value_count"
                )
            if mode == "value_count" and not p.get("field"):
                raise ValueError(
                    "kibana: rate mode=value_count needs a field"
                )
            metrics.append(
                RateAgg(
                    field=p.get("field", "") or "",
                    # unit omitted: ES rates per the histogram's own
                    # interval — factor 1, marked with unit_us=0
                    unit_us=_RATE_UNIT_US[unit] if unit else 0,
                    mode=mode,
                    label=label,
                )
            )
        elif a["type"] == "top_metrics":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: top_metrics cannot be a bucket agg")
            raw_fields = p.get("fields") or (
                [p["field"]] if p.get("field") else []
            )
            if isinstance(raw_fields, (str, dict)):
                raw_fields = [raw_fields]
            flds2 = tuple(
                f["field"] if isinstance(f, dict) else str(f)
                for f in raw_fields
            )
            if not flds2:
                raise ValueError("kibana: top_metrics needs metric fields")
            tm_size = int(p.get("size", 1))
            if not 1 <= tm_size <= 100:
                # ES caps top_metrics size at 10 by default (index
                # setting raises it); keep a hard sanity bound
                raise ValueError(
                    "kibana: top_metrics size must be in [1, 100]"
                )
            sort_p = p.get("sort")
            if isinstance(sort_p, dict):
                (tm_sf, tm_so), = sort_p.items()
            elif p.get("sortField"):
                tm_sf = p["sortField"]
                tm_so = p.get("sortOrder", "desc")
            else:
                # ES requires an explicit sort on top_metrics; a
                # silent default would only surface later as an
                # unresolved-column error deep in evaluate (ADVICE r13)
                raise ValueError(
                    "kibana: top_metrics needs an explicit sort "
                    "('sort': {field: order} or sortField/sortOrder)"
                )
            if tm_so not in ("asc", "desc"):
                raise ValueError("kibana: top_metrics sort must be asc|desc")
            metrics.append(
                TopMetricsAgg(
                    fields=flds2, sort_field=tm_sf, sort_order=tm_so,
                    label=label, size=tm_size,
                )
            )
        elif a["type"] == "percentiles":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: percentiles cannot be a bucket agg")
            percents = tuple(
                float(pc)
                for pc in p.get("percents", [1, 5, 25, 50, 75, 95, 99])
            )
            metrics.append(
                PercentilesAgg(field=p["field"], percents=percents, label=label)
            )
        elif a["type"] == "percentile_ranks":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: percentile_ranks cannot be a bucket agg"
                )
            if not p.get("values"):
                raise ValueError("kibana: percentile_ranks needs 'values'")
            metrics.append(
                PercentileRanksAgg(
                    field=p["field"],
                    # order-preserving dedupe: ES accepts duplicate
                    # probe values and dedupes the response keys; a
                    # duplicate output alias would make the final
                    # select ambiguous (code-review r10)
                    values=tuple(dict.fromkeys(float(v) for v in p["values"])),
                    label=label,
                )
            )
        elif a["type"] == "median":
            # ES models median as percentiles([50]); one output column
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: median cannot be a bucket agg")
            metrics.append(
                PercentilesAgg(field=p["field"], percents=(50.0,), label=label)
            )
        elif a["type"] in (
            "avg", "min", "max", "sum", "cardinality", "count", "value_count"
        ):
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(f"kibana: {a['type']} cannot be a bucket agg")
            if a["type"] == "value_count" and not p.get("field"):
                raise ValueError("kibana: value_count needs a field")
            metrics.append(
                MetricAgg(op=a["type"], field=p.get("field", ""), label=label)
            )
        elif a["type"] == "string_stats":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: string_stats cannot be a bucket agg"
                )
            if not p.get("field"):
                raise ValueError("kibana: string_stats needs a field")
            if p.get("show_distribution"):
                raise ValueError(
                    "kibana: string_stats show_distribution is not "
                    "modelled"
                )
            metrics.append(StringStatsAgg(field=p["field"], label=label))
        elif a["type"] == "matrix_stats":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: matrix_stats cannot be a bucket agg"
                )
            raw_mx = p.get("fields") or []
            if isinstance(raw_mx, str):
                raw_mx = [raw_mx]
            mx_fields = tuple(str(f) for f in raw_mx)
            if len(mx_fields) < 2:
                raise ValueError(
                    "kibana: matrix_stats needs at least two fields"
                )
            if len(set(mx_fields)) != len(mx_fields):
                raise ValueError(
                    "kibana: matrix_stats fields must be distinct"
                )
            if p.get("missing"):
                raise ValueError(
                    "kibana: matrix_stats per-field missing defaults "
                    "are not modelled — documents missing any field "
                    "drop (ES's default)"
                )
            metrics.append(MatrixStatsAgg(fields=mx_fields, label=label))
        elif a["type"] == "t_test":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: t_test cannot be a bucket agg")
            side_a, side_b = p.get("a") or {}, p.get("b") or {}
            if not side_a.get("field") or not side_b.get("field"):
                raise ValueError(
                    "kibana: t_test needs a.field and b.field"
                )
            tt_type = str(p.get("type", "heteroscedastic"))
            if tt_type not in (
                "paired", "homoscedastic", "heteroscedastic"
            ):
                raise ValueError(
                    "kibana: t_test type must be paired|homoscedastic|"
                    "heteroscedastic"
                )
            if tt_type == "paired" and (
                side_a.get("filter") or side_b.get("filter")
            ):
                # ES rejects filters on a paired t_test — the pairs
                # come from the same documents by definition
                raise ValueError(
                    "kibana: paired t_test must not have filters"
                )
            metrics.append(
                TTestAgg(
                    a_field=str(side_a["field"]),
                    b_field=str(side_b["field"]),
                    a_filter=str(side_a.get("filter") or ""),
                    b_filter=str(side_b.get("filter") or ""),
                    test_type=tt_type,
                    label=label,
                )
            )
        elif a["type"] == "boxplot":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: boxplot cannot be a bucket agg")
            if not p.get("field"):
                raise ValueError("kibana: boxplot needs a field")
            metrics.append(BoxplotAgg(field=p["field"], label=label))
        elif a["type"] == "geo_bounds":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: geo_bounds cannot be a bucket agg")
            if not p.get("field"):
                raise ValueError("kibana: geo_bounds needs a field")
            if p.get("wrap_longitude", True):
                raise ValueError(
                    "kibana: geo_bounds wrap_longitude=true (ES's "
                    "default antimeridian-crossing box) is not "
                    "modelled — pass wrap_longitude: false explicitly "
                    "for the non-wrapping box (identical unless the "
                    "data straddles ±180)"
                )
            metrics.append(GeoBoundsAgg(field=p["field"], label=label))
        elif a["type"] == "geo_centroid":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: geo_centroid cannot be a bucket agg"
                )
            if not p.get("field"):
                raise ValueError("kibana: geo_centroid needs a field")
            metrics.append(GeoCentroidAgg(field=p["field"], label=label))
        elif a["type"] == "median_absolute_deviation":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(
                    "kibana: median_absolute_deviation cannot be a "
                    "bucket agg"
                )
            if not p.get("field"):
                raise ValueError(
                    "kibana: median_absolute_deviation needs a field"
                )
            metrics.append(MadAgg(field=p["field"], label=label))
        elif a["type"] == "weighted_avg":
            if schema in _BUCKET_SCHEMAS:
                raise ValueError("kibana: weighted_avg cannot be a bucket agg")
            try:
                vf = p["value"]["field"]
                wf = p["weight"]["field"]
            except (KeyError, TypeError):
                raise ValueError(
                    "kibana: weighted_avg needs value.field and "
                    "weight.field"
                ) from None
            if "missing" in p.get("value", {}) or "missing" in p.get(
                "weight", {}
            ):
                raise ValueError(
                    "kibana: weighted_avg missing-defaults are not "
                    "modelled — docs lacking either field drop"
                )
            metrics.append(
                WeightedAvgAgg(value_field=vf, weight_field=wf, label=label)
            )
        elif a["type"] == "top_hits":
            th_size = int(p.get("size", 1))
            if th_size < 1:
                raise ValueError("kibana: top_hits size must be >= 1")
            th_agg = p.get("aggregate", "average")
            if th_agg not in ("average", "concat", "sum", "max", "min"):
                raise ValueError(
                    f"kibana: top_hits aggregate {th_agg!r} not supported"
                )
            metrics.append(
                TopHitsAgg(
                    field=p["field"],
                    aggregate=th_agg,
                    sort_field=p.get("sortField", "createdDateTime"),
                    sort_order=p.get("sortOrder", "desc"),
                    label=label,
                    size=th_size,
                )
            )
        elif a["type"] == "histogram":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: histogram must be a bucket agg")
            interval = float(p.get("interval", 1))
            if interval <= 0:
                raise ValueError("kibana: histogram interval must be > 0")
            mdc = int(p.get("min_doc_count", 1))
            if mdc < 0:
                raise ValueError("kibana: min_doc_count must be >= 0")
            eb = p.get("extended_bounds")
            if not eb or eb.get("min") is None or eb.get("max") is None:
                eb = None  # empty Kibana stub (see date_histogram above)
            if eb is not None:
                if mdc != 0:
                    raise ValueError(
                        "kibana: extended_bounds needs min_doc_count=0 "
                        "(without zero-fill it changes nothing — ES docs "
                        "make the same pairing explicit)"
                    )
                eb = (float(eb["min"]), float(eb["max"]))
                if eb[0] > eb[1]:
                    raise ValueError("kibana: extended_bounds min > max")
            buckets.append(
                HistogramBucket(
                    field=p["field"], interval=interval, label=label,
                    min_doc_count=mdc, extended_bounds=eb,
                )
            )
        elif a["type"] == "range":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: range must be a bucket agg")

            def _end(r, k):
                return float(r[k]) if r.get(k) is not None else None

            def _key(r):
                # range keys are bucket VALUES, not column names — no
                # slugging, keep ES's literal `from-to` form
                if r.get("key"):
                    return str(r["key"])
                lo, hi = r.get("from"), r.get("to")
                return (
                    f"{'*' if lo is None else f'{float(lo):g}'}-"
                    f"{'*' if hi is None else f'{float(hi):g}'}"
                )

            ranges = tuple(
                (_key(r), _end(r, "from"), _end(r, "to"))
                for r in p.get("ranges", [])
            )
            if not ranges:
                raise ValueError("kibana: range agg needs at least one range")
            buckets.append(RangeBucket(field=p["field"], ranges=ranges, label=label))
        elif a["type"] == "date_range":
            if schema not in _BUCKET_SCHEMAS:
                raise ValueError("kibana: date_range must be a bucket agg")

            def _dkey(r):
                if r.get("key"):
                    return str(r["key"])
                lo, hi = r.get("from"), r.get("to")
                return f"{lo if lo is not None else '*'}-{hi if hi is not None else '*'}"

            dranges = tuple(
                (
                    _dkey(r),
                    str(r["from"]) if r.get("from") is not None else None,
                    str(r["to"]) if r.get("to") is not None else None,
                )
                for r in p.get("ranges", [])
            )
            if not dranges:
                raise ValueError("kibana: date_range agg needs at least one range")
            buckets.append(
                DateRangeBucket(field=p["field"], ranges=dranges, label=label)
            )
        elif a["type"] in ("stats", "extended_stats"):
            if schema in _BUCKET_SCHEMAS:
                raise ValueError(f"kibana: {a['type']} cannot be a bucket agg")
            metrics.append(
                StatsAgg(
                    field=p["field"],
                    label=label,
                    extended=(a["type"] == "extended_stats"),
                )
            )
        elif a["type"] in ("derivative", "cumulative_sum", "moving_avg", "moving_fn"):
            op = "moving_avg" if a["type"] == "moving_fn" else a["type"]
            if a["type"] == "moving_fn":
                # honor the MovingFunctions script instead of silently
                # averaging (code-review r9: a max() panel replayed as
                # a mean with no error).  No script keeps ES's
                # unweightedAvg default.
                script = p.get("script") or ""
                if isinstance(script, dict):
                    script = script.get("source", "")
                m = re.search(r"MovingFunctions\.(\w+)\s*\(", script)
                fn = m.group(1) if m else ("unweightedAvg" if not script.strip() else None)
                mapped = {"unweightedAvg": "moving_avg", "max": "moving_max",
                          "min": "moving_min", "sum": "moving_sum"}
                if fn not in mapped:
                    raise ValueError(
                        f"kibana: unsupported moving_fn script {script!r} "
                        f"(supported: MovingFunctions.unweightedAvg/max/"
                        f"min/sum)"
                    )
                op = mapped[fn]
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            pipelines_raw.append(
                (op, path, label, int(p.get("window", 5)), (), _seq)
            )
        elif a["type"] == "serial_diff":
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            lag = int(p.get("lag", 1))
            if lag < 1:
                raise ValueError("kibana: serial_diff lag must be >= 1")
            pipelines_raw.append(("serial_diff", path, label, lag, (), _seq))
        elif a["type"] == "cumulative_cardinality":
            # ES cumulative_cardinality (round 13): the running count
            # of distinct field values across the histogram's buckets.
            # buckets_path must name a cardinality agg (like ES, which
            # merges its HLL sketches cumulatively; this engine is
            # exact via first-seen buckets — the documented
            # exact-vs-approx stance).
            path = str(p.get("metricAgg") or p.get("buckets_path") or "")
            tgt = by_id.get(path)
            if tgt is None or tgt["type"] != "cardinality":
                raise ValueError(
                    "kibana: cumulative_cardinality buckets_path must "
                    "reference a cardinality agg"
                )
            pipelines_raw.append(
                ("cumulative_cardinality", path, label, 0, (), _seq)
            )
        elif a["type"] == "moving_percentiles":
            # ES moving_percentiles (round 14): slide a window across
            # the histogram buckets and report the percentiles of the
            # merged window.  buckets_path must name a percentiles agg
            # (like ES); window is REQUIRED (like ES); shift follows
            # moving_fn (0 = the `window` buckets BEFORE the current
            # one, exclusive; window = shift includes the current).
            # The shift rides the op string, normalize:-style.
            path = str(p.get("metricAgg") or p.get("buckets_path") or "")
            tgt = by_id.get(path)
            if tgt is None or tgt["type"] != "percentiles":
                raise ValueError(
                    "kibana: moving_percentiles buckets_path must "
                    "reference a percentiles agg"
                )
            if p.get("window") is None:
                raise ValueError(
                    "kibana: moving_percentiles needs an explicit "
                    "window (ES requires it)"
                )
            mp_window = int(p["window"])
            if mp_window < 1:
                raise ValueError("kibana: moving window must be >= 1")
            pipelines_raw.append(
                (
                    f"moving_percentiles:{int(p.get('shift', 0))}",
                    path, label, mp_window, (), _seq,
                )
            )
        elif a["type"] == "normalize":
            # ES normalize pipeline agg (round 13): rescale a sibling
            # metric ACROSS the innermost bucket level, per outer
            # bucket — the op string carries the method
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            method = str(p.get("method", ""))
            if method not in _NORMALIZE_METHODS:
                raise ValueError(
                    f"kibana: normalize method must be one of "
                    f"{sorted(_NORMALIZE_METHODS)}, got {method!r}"
                )
            pipelines_raw.append(
                (f"normalize:{method}", path, label, 0, (), _seq)
            )
        elif a["type"] == "bucket_correlation":
            # ES x-pack bucket_correlation (round 15): the only
            # function is count_correlation; its indicator carries the
            # per-bucket metric expectations, optional population
            # fractions, and the TOTAL doc_count the bucket counts
            # were drawn from (all literals — validated here, folded
            # into compile-time constants at evaluation)
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            fn = p.get("function") or {}
            if set(fn) != {"count_correlation"}:
                raise ValueError(
                    "kibana: bucket_correlation supports exactly the "
                    "count_correlation function (like ES)"
                )
            ind = (fn["count_correlation"] or {}).get("indicator") or {}
            exps = tuple(float(x) for x in ind.get("expectations") or ())
            if len(exps) < 2:
                raise ValueError(
                    "kibana: bucket_correlation indicator needs at "
                    "least two expectations"
                )
            fracs = tuple(float(x) for x in ind.get("fractions") or ())
            if fracs and len(fracs) != len(exps):
                raise ValueError(
                    "kibana: bucket_correlation fractions must match "
                    "expectations in length"
                )
            if fracs and (any(f < 0 for f in fracs) or sum(fracs) <= 0):
                raise ValueError(
                    "kibana: bucket_correlation fractions must be "
                    "non-negative with a positive sum"
                )
            bc_n = int(ind.get("doc_count") or 0)
            if bc_n <= 0:
                raise ValueError(
                    "kibana: bucket_correlation indicator needs "
                    "doc_count > 0 (the population the bucket counts "
                    "are drawn from)"
                )
            stats_tests_raw.append(
                ("bucket_correlation", path, label, exps, fracs, bc_n,
                 (), _seq)
            )
        elif a["type"] == "bucket_count_ks_test":
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            alts = tuple(
                str(x) for x in p.get("alternative")
                or ("less", "greater", "two_sided")
            )
            bad = [x for x in alts if x not in ("less", "greater",
                                                "two_sided")]
            if bad or len(set(alts)) != len(alts):
                raise ValueError(
                    "kibana: bucket_count_ks_test alternative must be "
                    "distinct values from less|greater|two_sided"
                )
            if str(p.get("sampling_method") or "") != "uniform":
                # ES defaults to upper_tail — an x-pack reweighting of
                # significant-terms sampling this engine does not
                # model; require the explicit uniform stance
                raise ValueError(
                    "kibana: bucket_count_ks_test supports only "
                    "sampling_method 'uniform' (explicit; ES's default "
                    "upper_tail reweighting is not modelled)"
                )
            ks_fracs = tuple(float(x) for x in p.get("fractions") or ())
            if ks_fracs and (
                any(f < 0 for f in ks_fracs) or sum(ks_fracs) <= 0
            ):
                raise ValueError(
                    "kibana: bucket_count_ks_test fractions must be "
                    "non-negative with a positive sum"
                )
            stats_tests_raw.append(
                ("bucket_count_ks_test", path, label, (), ks_fracs, 0,
                 alts, _seq)
            )
        elif a["type"] in SIBLING_OPS:
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            pipelines_raw.append((a["type"], path, label, 0, (), _seq))
        elif a["type"] in MULTI_SIBLING_OPS:
            path = str(p.get("metricAgg") or p.get("buckets_path") or "_count")
            percents: tuple[float, ...] = ()
            if a["type"] == "percentiles_bucket":
                percents = tuple(
                    float(x) for x in p.get("percents", (1, 5, 25, 50, 75, 95, 99))
                )
                if not percents or not all(0 <= x <= 100 for x in percents):
                    raise ValueError(
                        "kibana: percentiles_bucket percents must be in [0, 100]"
                    )
            pipelines_raw.append((a["type"], path, label, 0, percents, _seq))
        elif a["type"] in ("bucket_script", "bucket_selector"):
            script = p.get("script")
            if isinstance(script, dict):
                script = script.get("source")
            if not isinstance(script, str) or not script.strip():
                raise ValueError(f"kibana: {a['type']} needs a script")
            paths = p.get("buckets_path")
            if not isinstance(paths, dict) or not paths:
                raise ValueError(
                    f"kibana: {a['type']} needs a buckets_path map"
                )
            scripts_raw.append((a["type"], dict(paths), script, label, _seq))
        elif a["type"] == "bucket_sort":
            if bucket_sort_raw is not None:
                raise ValueError("kibana: at most one bucket_sort per vis")
            size = int(p.get("size", 10))
            from_ = int(p.get("from", 0))
            if size < 1 or from_ < 0:
                raise ValueError("kibana: bucket_sort needs size >= 1, from >= 0")
            bucket_sort_raw = (
                str(p.get("sortField") or p.get("buckets_path") or "_key"),
                str(p.get("order", "desc")),
                size,
                from_,
            )
        else:
            raise ValueError(f"kibana: unsupported agg type {a['type']!r}")
    pipelines: list[PipelineAgg] = []
    bucket_sort: BucketSortAgg | None = None
    scripts: list[BucketScriptAgg] = []
    stats_pipelines: list[BucketStatsTestAgg] = []
    if pipelines_raw or bucket_sort_raw or scripts_raw or stats_tests_raw:
        label_of = {}
        for m in metrics:
            label_of[m.label] = m.label
        for a in aggs:
            lbl = _slug(
                a.get("params", {}).get("customLabel") or f'{a["type"]}_{a["id"]}'
            )
            label_of.setdefault(a["id"], lbl)
        needs_count = (
            any(path == "_count" for _, path, _, _, _, _ in pipelines_raw)
            or (bucket_sort_raw is not None and bucket_sort_raw[0] == "_count")
            or any(
                p == "_count"
                for _, paths, _, _, _ in scripts_raw
                for p in paths.values()
            )
            or any(st[1] == "_count" for st in stats_tests_raw)
        )
        if needs_count:
            # the implicit doc-count metric, materialized only when a
            # buckets_path actually references it
            if not any(
                isinstance(m, MetricAgg) and m.op == "count" for m in metrics
            ):
                # first unused name: a metric or bucket customLabel'd
                # 'count' would otherwise produce two columns aliased
                # 'count' and an AMBIGUOUS_REFERENCE at evaluate time
                # (code-review r9)
                taken = {m.label for m in metrics} | {b.label for b in buckets}
                cname = "count"
                n = 2
                while cname in taken:
                    cname = f"count_{n}"
                    n += 1
                metrics.append(MetricAgg(op="count", field="", label=cname))
            label_of["_count"] = next(
                m.label
                for m in metrics
                if isinstance(m, MetricAgg) and m.op == "count"
            )

        def _resolve_path(op: str, path: str) -> str:
            """buckets_path → the SINGLE materialized metric column it
            names.  Multi-column metrics (stats/extended_stats,
            percentiles, top_hits) reject at parse time — without this
            the eager validation passes on the agg's LABEL and the
            evaluation crashes later with UNRESOLVED_COLUMN
            (code-review r9)."""
            src = label_of.get(str(path))
            single = src is not None and any(
                isinstance(m, MetricAgg) and m.label == src for m in metrics
            )
            if not single:
                raise ValueError(
                    f"kibana: {op} buckets_path {path!r} does not "
                    f"resolve to a single-column sibling metric agg "
                    f"(stats/percentiles/top_hits sub-paths are not "
                    f"supported)"
                )
            return src

        for op, path, label, window, percents, seq_ in pipelines_raw:
            if op.startswith("moving_percentiles:"):
                # references a MULTI-column percentiles agg (ES's own
                # contract) — bypass the single-column _resolve_path
                # and carry the source's percents so the output
                # columns mirror the referenced agg's keys
                mp_lbl = label_of.get(str(path))
                mp_src = next(
                    (m for m in metrics
                     if isinstance(m, PercentilesAgg) and m.label == mp_lbl),
                    None,
                )
                if mp_src is None:
                    raise ValueError(
                        "kibana: moving_percentiles buckets_path must "
                        "reference a percentiles agg"
                    )
                pipelines.append(
                    PipelineAgg(
                        op=op, source_label=mp_lbl, label=label,
                        window=window, percents=mp_src.percents, seq=seq_,
                    )
                )
                continue
            src = _resolve_path(op, path)
            if op.startswith("moving_") and window < 1:
                raise ValueError("kibana: moving window must be >= 1")
            pipelines.append(
                PipelineAgg(
                    op=op, source_label=src, label=label, window=window,
                    percents=percents, seq=seq_,
                )
            )
        for (op, path, label, exps, fracs, bc_n, alts,
             seq_) in stats_tests_raw:
            stats_pipelines.append(
                BucketStatsTestAgg(
                    op=op, source_label=_resolve_path(op, path),
                    label=label, expectations=exps, fractions=fracs,
                    doc_count=bc_n, alternatives=alts, seq=seq_,
                )
            )
        for op, paths, script, label, seq_ in scripts_raw:
            resolved = [
                (param, _resolve_path(op, path))
                for param, path in paths.items()
            ]
            # compile eagerly so a bad script fails at parse time, not
            # mid-evaluation (the Column is rebuilt per-evaluate below)
            compile_bucket_script(script, dict(resolved))
            scripts.append(
                BucketScriptAgg(
                    op=op, paths=tuple(resolved), script=script, label=label,
                    seq=seq_,
                )
            )
        if bucket_sort_raw is not None:
            path, order, size, from_ = bucket_sort_raw
            if path == "_key":
                sort_label = "_key"
            else:
                sort_label = label_of.get(path)
                if sort_label is None or not any(
                    m.label == sort_label for m in metrics
                ):
                    raise ValueError(
                        f"kibana: bucket_sort sortField {path!r} does not "
                        f"resolve to a sibling metric agg"
                    )
            if order not in ("asc", "desc"):
                raise ValueError("kibana: bucket_sort order must be asc|desc")
            bucket_sort = BucketSortAgg(
                sort_label=sort_label, order=order, size=size, from_=from_
            )
    if any(isinstance(m, ReverseNestedAgg) for m in metrics) and not any(
        isinstance(b, NestedBucket) for b in buckets
    ):
        raise ValueError(
            "kibana: reverse_nested is only meaningful inside a nested "
            "context — add the nested bucket agg first, like ES "
            "requires"
        )
    return VisState(
        title=state.get("title", ""),
        vis_type=state.get("type", ""),
        buckets=tuple(buckets),
        metrics=tuple(metrics),
        pipelines=tuple(pipelines),
        bucket_sort=bucket_sort,
        scripts=tuple(scripts),
        stats_pipelines=tuple(stats_pipelines),
    )


# ---------------------------------------------------------------------------
# compilation
# ---------------------------------------------------------------------------
class KibanaPlan:
    """Compiled visualization; :meth:`evaluate` with the documents DF."""

    def __init__(self, state: VisState):
        self.state = state

    @staticmethod
    def _merge_categories(
        cats: DataFrame,
        label: str,
        threshold: int,
        size: int,
        partials: tuple = (),
    ) -> DataFrame:
        """categorize_text similarity merging (round 15) over the
        ALREADY-AGGREGATED pattern table — the deterministic semantic
        documented on :class:`CategorizeTextBucket`: same-length
        positional similarity, frequency-seeded attachment, 6
        pointer-jump rounds, unanimity-wildcard keys.  Every operation
        is category-scale (patterns × patterns per length, patterns ×
        tokens), never doc-scale.

        Execution shape: fully LAZY, one plan, nothing persisted —
        the pointer-jump self-joins double the LOGICAL lineage per
        round, but every doubled subtree is the identical exchange and
        Spark's ReuseExchange/ReuseSubquery executes the doc-scale
        exact aggregation once (measured: an eager
        persist-per-round variant paid a fresh AQE compile of the
        doubled plan each round and ran 4x slower).  ``size`` is
        accepted for signature stability with the caller's
        TakeOrdered cut.

        ``partials`` (round 16, metric sub-aggs): ``(column_name,
        combiner)`` pairs — per-exact-pattern metric partials already
        aggregated in ``cats`` that must ride the merge.  Each
        combiner (F.sum / F.min / F.max — associative, so re-combining
        when two merged groups collapse to the same wildcard key is
        sound) is applied at both category-scale groupBys; the caller
        finalizes (e.g. avg = sum/count) AFTER the merge."""
        del size  # the caller applies the orderBy().limit() cut
        t = threshold / 100.0
        # Truncate the doc-scale lineage ONCE before the pointer-jump
        # rounds (optimization r16, guide §3.3: very large plans make
        # planning itself the bottleneck — materialize intermediates).
        # `cats` is the already-aggregated pattern table
        # (category-scale, tens-to-thousands of rows), so the eager
        # localCheckpoint is one tiny job; without it each of the 6
        # self-join rounds DOUBLES a lineage that bottoms out in the
        # doc-scale tokenize+aggregate (2^7 copies for Catalyst/AQE to
        # analyze — ReuseExchange deduped the execution but not the
        # compile).  The r15 "persist variant 4× slower" measurement
        # persisted per round against the full doc-scale plan; with the
        # lineage cut the remaining rounds are category-scale joins.
        cats = cats.localCheckpoint(eager=True)
        pats = cats.select(
            F.col(label).alias("__ct_p"),
            F.split(F.col(label), " ").alias("__ct_toks"),
            F.size(F.split(F.col(label), " ")).alias("__ct_len"),
            F.col("doc_count").alias("__ct_n"),
            *[F.col(pn) for pn, _ in partials],
        )
        left = pats.select(
            F.col("__ct_p").alias("p"), F.col("__ct_toks").alias("ptoks"),
            F.col("__ct_len").alias("__ct_len"),
        )
        right = pats.select(
            F.col("__ct_p").alias("q"), F.col("__ct_toks").alias("qtoks"),
            F.col("__ct_len").alias("__ct_len"),
            F.col("__ct_n").alias("qc"),
        )
        match = F.aggregate(
            F.zip_with(
                F.col("ptoks"), F.col("qtoks"),
                lambda a, b_: F.when(a == b_, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )
        pairs = (
            left.join(right, "__ct_len")
            .withColumn("__ct_m", match)
            .filter(
                F.col("__ct_m").cast("double")
                / F.col("__ct_len").cast("double")
                >= F.lit(t)
            )
        )
        # rep(p): best-ranked similar pattern (doc_count desc, key
        # asc) — min_by over (-count, key); p matches itself, so rep
        # always exists and rank(rep(p)) <= rank(p): the pointer map
        # is acyclic and rank-decreasing
        rep = pairs.groupBy("p").agg(
            F.min_by(
                F.col("q"),
                F.struct(
                    (-F.col("qc")).alias("nc"), F.col("q").alias("q")
                ),
            ).alias("rep")
        )
        # same lineage cut for the pointer map: rep is category-sized
        # (one row per pattern) and the 6 jump rounds double ITS
        # lineage too — one more tiny eager job keeps the final plan at
        # 2^6 checkpoint-leaf scans instead of 2^6 copies of the
        # pairs-join subtree
        rep = rep.localCheckpoint(eager=True)
        for _ in range(6):  # closure for chains up to 2^6 = 64
            hop = rep.select(
                F.col("p").alias("__ct_hp"), F.col("rep").alias("__ct_hr")
            )
            rep = (
                rep.join(hop, rep["rep"] == hop["__ct_hp"], "left")
                .select(
                    "p",
                    F.coalesce(F.col("__ct_hr"), F.col("rep")).alias("rep"),
                )
            )
        memb = rep.join(
            pats,
            rep["p"] == pats["__ct_p"],
        ).select(
            "rep", "__ct_toks", "__ct_len", "__ct_n",
            *[pn for pn, _ in partials],
        )
        grouped = memb.groupBy("rep").agg(
            F.collect_list("__ct_toks").alias("tls"),
            F.max("__ct_len").alias("l"),
            F.sum("__ct_n").alias("doc_count"),
            *[fn(pn).alias(pn) for pn, fn in partials],
        )
        # unanimity-wildcard key: per position, the member token when
        # every member agrees, else '*' (collect_list order is
        # irrelevant — tls[0] is read only under unanimity)
        merged_key = F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.col("l") - 1),
                lambda i: F.when(
                    F.size(
                        F.array_distinct(
                            F.transform(
                                F.col("tls"), lambda tk: F.get(tk, i)
                            )
                        )
                    )
                    == 1,
                    F.get(F.element_at(F.col("tls"), 1), i),
                ).otherwise(F.lit("*")),
            ),
            " ",
        )
        return (
            grouped.withColumn(label, merged_key)
            .groupBy(label)
            .agg(
                F.sum("doc_count").alias("doc_count"),
                *[fn(pn).alias(pn) for pn, fn in partials],
            )
        )

    @staticmethod
    def _simple_metric_expr(m, value_col, count_expr: Column, count_distinct):
        """The simple-metric subset (count/cardinality/avg/sum/min/max)
        shared by the composite and significant_terms paths — ONE place
        for the op→expression mapping and the cast-to-double rule (ES
        numerics are doubles; a long sum also hash-diverges from the
        SQL twins).  ``value_col`` is the (possibly foreground-gated)
        input column; cardinality keeps the raw type — it may
        legitimately count strings."""
        if m.op == "count":
            return count_expr.alias(m.label)
        if m.op == "cardinality":
            return count_distinct(value_col).alias(m.label)
        if m.op in ("avg", "sum", "min", "max"):
            fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[m.op]
            return fn(value_col.cast("double")).alias(m.label)
        raise ValueError(
            f"kibana: this bucket agg supports simple metric aggs only "
            f"(count/avg/sum/min/max/cardinality), not {m.op!r}"
        )

    def _evaluate_composite(
        self,
        df: DataFrame,
        b: CompositeBucket,
        resolve,
        count_distinct,
    ) -> DataFrame:
        """composite: group by the full source-key tuple, page in
        lexicographic key order from the ``after`` tuple.  The
        after-predicate pushes BELOW the aggregation (it's a pure
        function of the grouping keys), so each page scans only the
        keys past the cursor, and the page cut itself is a TakeOrdered
        — pagination over a 100 TB relation never materializes more
        than ``size`` buckets per request.  Docs with a null source
        key drop (ES ``missing_bucket: false``, the default)."""
        s = self.state
        key_cols: list[tuple[str, Column]] = []
        for name, field, kind, interval in b.sources:
            col = resolve(field)
            if kind == "terms":
                key_cols.append((name, col.cast("string")))
            elif kind == "histogram":
                # ES's exact histogram key: floor(v / interval) *
                # interval (negatives bucket DOWNWARD, like
                # HistogramBucket)
                v = col.cast("double")
                key_cols.append(
                    (
                        name,
                        F.floor(v / F.lit(interval)).cast("double")
                        * F.lit(interval),
                    )
                )
            else:
                us = F.unix_micros(col.cast("timestamp"))
                key_cols.append(
                    (name, F.timestamp_micros(us - F.pmod(us, int(interval))))
                )
        for name, col in key_cols:
            df = df.withColumn(name, col)
        for name, _ in key_cols:
            df = df.filter(F.col(name).isNotNull())
        if b.after is not None:
            # after values normalize per source kind: ES returns
            # date_histogram keys as EPOCH-MILLIS numbers in the
            # after_key, and a bare number vs a timestamp column is an
            # AnalysisException (code-review r9); ISO strings cast.
            def _after_lit(i: int) -> Column:
                val = b.after[i]
                if b.sources[i][2] == "date_histogram":
                    if isinstance(val, (int, float)):
                        return F.timestamp_millis(F.lit(int(val)))
                    return F.lit(val).cast("timestamp")
                if b.sources[i][2] == "histogram":
                    return F.lit(float(val))
                return F.lit(val)

            # strictly-after, lexicographic over the source order:
            # (k1 > a1) OR (k1 = a1 AND k2 > a2) OR ...
            pred = None
            for i, (name, _) in enumerate(key_cols):
                clause = F.col(name) > _after_lit(i)
                for j in range(i):
                    pname = key_cols[j][0]
                    clause = (F.col(pname) == _after_lit(j)) & clause
                pred = clause if pred is None else pred | clause
            df = df.filter(pred)
        names = [n for n, _ in key_cols]
        aggs_, metric_labels = [], []
        metrics = list(s.metrics) or [MetricAgg(op="count", field="", label="count")]
        for m in metrics:
            if not isinstance(m, MetricAgg):
                raise ValueError(
                    "kibana: composite supports simple metric aggs only"
                )
            aggs_.append(
                self._simple_metric_expr(
                    m,
                    resolve(m.field) if m.field else F.lit(None),
                    F.count(F.lit(1)),
                    count_distinct,
                )
            )
            metric_labels.append(m.label)
        out = df.groupBy(*[F.col(n) for n in names]).agg(*aggs_)
        out = out.orderBy(*[F.col(n).asc() for n in names]).limit(b.size)
        return out.select(*names, *metric_labels)

    def _evaluate_significant(
        self,
        df: DataFrame,
        b: SignificantTermsBucket,
        resolve,
        count_distinct,
        default_search_field,
    ) -> DataFrame:
        """significant_terms: ONE scan computes both frequencies (each
        row carries a foreground flag, so fg doc_count = sum(flag) and
        bg_count = count(*) come out of the same term-keyed hash agg);
        set sizes are a 1-row broadcast, scoring is row-local
        arithmetic over exact integers, and the top-``size`` cut is a
        TakeOrdered — no second pass over the documents, no
        term-keyed re-shuffle.  Metric aggs evaluate over the
        FOREGROUND rows per term (ES nests them under each bucket) via
        conditional aggregation in the same pass."""
        s = self.state
        fg = _query_string_pred(
            b.foreground, resolve, df, default_search_field
        )
        base = df.withColumn(b.label, resolve(b.field).cast("string")).withColumn(
            "__fg", fg
        )
        metric_aggs = []
        for m in s.metrics:
            if not isinstance(m, MetricAgg):
                raise ValueError(
                    "kibana: significant_terms supports simple metric "
                    "aggs only (count/avg/sum/min/max/cardinality)"
                )
            col = (
                F.when(F.col("__fg"), resolve(m.field))
                if m.field
                else F.lit(None)
            )
            metric_aggs.append(
                self._simple_metric_expr(
                    m, col, F.sum(F.col("__fg").cast("long")), count_distinct
                )
            )
        per_term = base.groupBy(b.label).agg(
            F.sum(F.col("__fg").cast("long")).alias("doc_count"),
            F.count(F.lit(1)).alias("bg_count"),
            *metric_aggs,
        )
        # set sizes roll up from the catalog-sized per-term table (the
        # term partition is exhaustive), not from a second corpus scan
        # (code-review r9: an independent base.agg() re-scanned the
        # documents and re-evaluated the foreground predicate)
        totals = per_term.agg(
            F.sum("doc_count").alias("__subset"),
            F.sum("bg_count").alias("__superset"),
        )
        # ES drops docs missing the field from term buckets but still
        # counts them in the subset/superset set sizes (ADVICE r9) —
        # totals above roll up ALL per_term rows including the
        # NULL-key group; only the bucket OUTPUT excludes it.
        kept = per_term.filter(
            F.col(b.label).isNotNull()
            & (F.col("doc_count") >= max(int(b.min_doc_count), 1))
        ).crossJoin(F.broadcast(totals))
        fgp = F.col("doc_count").cast("double") / F.col("__subset").cast("double")
        bgp = F.col("bg_count").cast("double") / F.col("__superset").cast("double")
        scored = kept.withColumn("score", (fgp - bgp) * (fgp / bgp)).filter(
            F.col("score") > 0  # ES keeps only positively-significant terms
        )
        out = scored.orderBy(
            F.col("score").desc(), F.col(b.label).asc()
        ).limit(b.size)
        return out.select(
            b.label, "doc_count", "bg_count", "score",
            *[m.label for m in s.metrics],
        )

    def _evaluate_significant_text(
        self, df: DataFrame, b: SignificantTextBucket, resolve,
        default_search_field,
    ) -> DataFrame:
        """significant_text: standard-analyzer tokens (lowercase,
        non-letter/digit splits), DISTINCT per document — ES's
        doc-frequency semantics — then the significant_terms JLH over
        one token-keyed hash aggregation.  Set sizes are DOC counts
        from a 1-row aggregate over the doc frame (token totals would
        overcount multi-token docs); the token explode is the same
        scan-local array algebra as llmdata's shingle passes — the
        shuffle carries (token, flag) pairs only."""
        fg = _query_string_pred(
            b.foreground, resolve, df, default_search_field
        )
        base = df.withColumn("__fg", fg)
        totals = base.agg(
            F.sum(F.col("__fg").cast("long")).alias("__subset"),
            F.count(F.lit(1)).alias("__superset"),
        )
        tokens = F.array_distinct(
            F.split(F.lower(resolve(b.field).cast("string")),
                    r"[^\p{L}\p{N}]+")
        )
        per_term = (
            base.select("__fg", F.explode(tokens).alias(b.label))
            .filter(F.col(b.label) != "")
            .groupBy(b.label)
            .agg(
                F.sum(F.col("__fg").cast("long")).alias("doc_count"),
                F.count(F.lit(1)).alias("bg_count"),
            )
        )
        kept = per_term.filter(
            F.col("doc_count") >= max(int(b.min_doc_count), 1)
        ).crossJoin(F.broadcast(totals))
        fgp = (
            F.col("doc_count").cast("double") / F.col("__subset").cast("double")
        )
        bgp = (
            F.col("bg_count").cast("double") / F.col("__superset").cast("double")
        )
        scored = kept.withColumn("score", (fgp - bgp) * (fgp / bgp)).filter(
            F.col("score") > 0
        )
        out = scored.orderBy(
            F.col("score").desc(), F.col(b.label).asc()
        ).limit(b.size)
        return out.select(b.label, "doc_count", "bg_count", "score")

    def evaluate(
        self,
        df: DataFrame,
        resolve=None,
        tiebreak: str | None = None,
        default_search_field: str | None = None,
        approx_cardinality: bool = False,
        cardinality_rsd: float = 0.01,
        auto_interval_buckets: int | None = 50,
        auto_range: "tuple | None" = None,
        vwh_approx_seed: bool = False,
    ) -> DataFrame:
        resolve = resolve or _default_resolver(df)
        s = self.state
        # ES's cardinality agg IS a HyperLogLog sketch; the exact form
        # is the default here so results hash-match the DuckDB oracle,
        # the approx form is the scale path (one pass, fixed memory,
        # mergeable partials — tolerance-pinned like a5_approx)
        if approx_cardinality:
            count_distinct = lambda c: F.approx_count_distinct(c, rsd=cardinality_rsd)  # noqa: E731
        else:
            count_distinct = F.countDistinct

        comp = [b for b in s.buckets if isinstance(b, CompositeBucket)]
        if comp:
            if len(s.buckets) != 1:
                raise ValueError(
                    "kibana: composite must be the only bucket agg (ES "
                    "forbids nesting it)"
                )
            if s.pipelines or s.scripts or s.bucket_sort is not None:
                raise ValueError(
                    "kibana: composite does not compose with pipeline aggs"
                )
            return self._evaluate_composite(df, comp[0], resolve, count_distinct)

        sig = [b for b in s.buckets if isinstance(b, SignificantTermsBucket)]
        if sig:
            if len(s.buckets) != 1:
                raise ValueError(
                    "kibana: significant_terms must be the only bucket agg"
                )
            if s.pipelines or s.scripts or s.bucket_sort is not None:
                raise ValueError(
                    "kibana: significant_terms does not compose with "
                    "pipeline aggs"
                )
            return self._evaluate_significant(
                df, sig[0], resolve, count_distinct, default_search_field
            )

        sigt = [b for b in s.buckets if isinstance(b, SignificantTextBucket)]
        if sigt:
            if len(s.buckets) != 1:
                raise ValueError(
                    "kibana: significant_text must be the only bucket agg"
                )
            if s.metrics or s.pipelines or s.scripts or s.bucket_sort:
                raise ValueError(
                    "kibana: significant_text supports no sub-aggregations "
                    "(like ES)"
                )
            return self._evaluate_significant_text(
                df, sigt[0], resolve, default_search_field
            )

        ct = [b for b in s.buckets if isinstance(b, CategorizeTextBucket)]
        if ct:
            if len(s.buckets) != 1:
                raise ValueError(
                    "kibana: categorize_text must be the only bucket agg"
                )
            if s.pipelines or s.scripts or s.bucket_sort:
                raise ValueError(
                    "kibana: categorize_text composes with simple "
                    "metric sub-aggs only (no pipeline/script/"
                    "bucket_sort aggs)"
                )
            b = ct[0]
            # category key: lowercase standard-analyzer tokens with
            # every digit-bearing token dropped (ES ML categorization:
            # numbers never define a category) — scan-local column
            # algebra, then ONE hash aggregation + TakeOrdered limit
            toks = F.split(
                F.lower(resolve(b.field).cast("string")),
                r"[^\p{L}\p{N}]+",
            )
            key = F.array_join(
                F.filter(
                    toks,
                    lambda t: (t != "") & ~t.rlike(r"\p{N}"),
                ),
                " ",
            )
            keyed = df.withColumn(b.label, key).filter(
                F.col(b.label) != ""
            )
            # metric sub-aggs (round 16, VERDICT r15 item 4): ES nests
            # avg/min/max/sum/cardinality/count under pattern buckets.
            # Exact path: finalize in the one hash aggregation.
            # Merged path: decomposable partials (sum/min/max, avg as
            # sum+count) aggregate per exact pattern, then combine
            # through the rep join and finalize after the unanimity
            # key — still category-scale past the first agg.
            # Cardinality is NOT decomposable through partial merge:
            # reject it loudly under threshold < 100.
            for m in s.metrics:
                if not isinstance(m, MetricAgg) or m.op not in (
                    "count", "avg", "sum", "min", "max", "cardinality",
                ):
                    raise ValueError(
                        "kibana: categorize_text supports simple metric "
                        "sub-aggs only (count/avg/sum/min/max/"
                        "cardinality)"
                    )
            if b.similarity_threshold >= 100:
                aggs_ = [F.count(F.lit(1)).alias("doc_count")]
                for m in s.metrics:
                    aggs_.append(
                        self._simple_metric_expr(
                            m,
                            resolve(m.field) if m.field else F.lit(None),
                            F.count(F.lit(1)),
                            count_distinct,
                        )
                    )
                cats = keyed.groupBy(b.label).agg(*aggs_)
            else:
                partial_aggs: list[Column] = [
                    F.count(F.lit(1)).alias("doc_count")
                ]
                combiners: list[tuple[str, object]] = []
                finals: list[Column] = []
                for i, m in enumerate(s.metrics):
                    if m.op == "cardinality":
                        raise ValueError(
                            "kibana: categorize_text cardinality does "
                            "not merge under similarity_threshold < 100 "
                            "(distinct counts are not decomposable "
                            "partials); use similarity_threshold=100"
                        )
                    val = (
                        resolve(m.field) if m.field else F.lit(None)
                    ).cast("double")
                    if m.op == "count":
                        finals.append(F.col("doc_count").alias(m.label))
                    elif m.op == "avg":
                        sn, cn = f"__ctm{i}_s", f"__ctm{i}_c"
                        partial_aggs += [
                            F.sum(val).alias(sn),
                            F.count(val).alias(cn),
                        ]
                        combiners += [(sn, F.sum), (cn, F.sum)]
                        finals.append(
                            F.when(
                                F.col(cn) > 0, F.col(sn) / F.col(cn)
                            ).alias(m.label)
                        )
                    else:  # sum / min / max
                        fn = {"sum": F.sum, "min": F.min, "max": F.max}[
                            m.op
                        ]
                        pn = f"__ctm{i}_{m.op}"
                        partial_aggs.append(fn(val).alias(pn))
                        combiners.append((pn, fn))
                        finals.append(F.col(pn).alias(m.label))
                cats = keyed.groupBy(b.label).agg(*partial_aggs)
                cats = self._merge_categories(
                    cats, b.label, b.similarity_threshold, b.size,
                    partials=tuple(combiners),
                )
                cats = cats.select(b.label, "doc_count", *finals)
            return cats.orderBy(
                F.col("doc_count").desc(), F.col(b.label).asc()
            ).limit(b.size)

        fis = [
            b for b in s.buckets if isinstance(b, FrequentItemSetsBucket)
        ]
        if fis:
            if len(s.buckets) != 1:
                raise ValueError(
                    "kibana: frequent_item_sets must be the only bucket "
                    "agg"
                )
            if s.metrics or s.pipelines or s.scripts or s.bucket_sort:
                raise ValueError(
                    "kibana: frequent_item_sets carries only its "
                    "doc_count/support (sub-aggregations are not "
                    "modelled)"
                )
            b = fis[0]
            # EXACT apriori, ZERO joins on the doc axis: each document
            # carries at most one item per scalar field, so ALL its
            # k<=3 item combinations are generated scan-locally from
            # the sorted per-doc item array (the adjacency_matrix
            # slice/transform trick, C(#fields, k) elements — a
            # constant), then ONE explode + ONE hash aggregation keyed
            # by the item-set array counts every level at once.
            # Support compares count/total >= min_support with the
            # SAME division-then-compare in the SQL twin.  The total
            # rides the plan as a one-row broadcast cross-join (the
            # bnl_join_onerow shape) instead of a plan-build
            # df.count() — one job, not two (VERDICT r14 nit); an
            # empty relation now yields an empty result (no items →
            # no sets), ES's own response shape.
            tot = df.agg(
                F.count(F.lit(1)).cast("double").alias("__fis_total")
            )
            # the field list is STATIC, so the per-doc combinations are
            # enumerated at COMPILE time (itertools over field subsets,
            # k <= 3) into shallow guarded expressions — the nested
            # slice/transform formulation codegen'd multi-second
            # first-run compiles; this one is C(#fields, <=3) flat
            # whens.  array_sort keys each set lexicographically.
            from itertools import combinations as _combs

            if len(b.fields) > 8:
                raise ValueError(
                    "kibana: frequent_item_sets supports at most 8 "
                    "fields (C(8,3) static combinations)"
                )
            item = {
                f_: F.concat(
                    F.lit(f_ + "="), resolve(f_).cast("string")
                )
                for f_ in b.fields
            }
            combos = []
            for k_ in (1, 2, 3):
                for sub in _combs(b.fields, k_):
                    cond = resolve(sub[0]).isNotNull()
                    for f_ in sub[1:]:
                        cond = cond & resolve(f_).isNotNull()
                    combos.append(
                        F.when(
                            cond,
                            F.array_sort(
                                F.array(*[item[f_] for f_ in sub])
                            ),
                        )
                    )
            ex = df.select(
                F.explode(
                    F.array_compact(F.array(*combos))
                ).alias("__ks")
            )
            c = (
                ex.groupBy("__ks")
                .agg(F.count(F.lit(1)).alias("__n"))
                .crossJoin(F.broadcast(tot))
                .filter(
                    F.col("__n").cast("double") / F.col("__fis_total")
                    >= F.lit(b.min_support)
                )
                .withColumn("__sz", F.size("__ks"))
            )
            # the closedness pass references this table five times
            # (three level slices + two subset explosions) — persist
            # the AGGREGATED relation (<= sum_k C(#fields,k)/
            # min_support rows, bounded by the support filter) so the
            # doc-scale explode+aggregate runs once, not five times
            c = c.persist()
            c.count()
            # closedness (like ES): drop a set when a superset has the
            # SAME doc count — level k anti-joins the (k-subset, count)
            # explosion of level k+1; both sides are the already-
            # aggregated (frequent-set, count) table, never doc-sized
            k0, k1, k2 = (F.col("__ks").getItem(i) for i in range(3))
            sub2 = c.filter(F.col("__sz") == 2).select(
                F.explode(
                    F.array(F.array(k0), F.array(k1))
                ).alias("__ks_s"),
                F.col("__n").alias("__sn"),
            )
            sub3 = c.filter(F.col("__sz") == 3).select(
                F.explode(
                    F.array(
                        F.array(k0, k1), F.array(k0, k2),
                        F.array(k1, k2),
                    )
                ).alias("__ks_s"),
                F.col("__n").alias("__sn"),
            )
            closed = None
            for lvl, subs in ((1, sub2), (2, sub3), (3, None)):
                cur = c.filter(F.col("__sz") == lvl)
                if subs is not None:
                    cur = cur.join(
                        subs,
                        (cur["__ks"] == subs["__ks_s"])
                        & (cur["__n"] == subs["__sn"]),
                        "left_anti",
                    )
                closed = cur if closed is None else closed.unionByName(cur)
            out = closed.filter(
                F.col("__sz") >= b.min_set_size
            ).select(
                F.array_join("__ks", ", ").alias(b.label),
                F.col("__sz").alias("set_size"),
                F.col("__n").alias("doc_count"),
                (
                    F.col("__n").cast("double") / F.col("__fis_total")
                ).alias("support"),
            )
            out = out.orderBy(
                F.col("doc_count").desc(), F.col(b.label).asc()
            ).limit(b.size)
            # the size-cut output is <= b.size rows by construction:
            # materialize it eagerly so the persisted set table can be
            # UNPERSISTED before returning — a long-lived session
            # (streaming kibana_panels replays evaluate per
            # micro-batch) no longer accumulates cached relations
            # (ADVICE r14)
            rows_local = out.collect()
            c.unpersist(blocking=False)
            return df.sparkSession.createDataFrame(
                rows_local, schema=out.schema
            )

        # 1) bucket key columns (+ filters explode)
        key_names: list[str] = []
        # doc-frame snapshots taken AT each rare_terms bucket's level:
        # inner buckets below it may EXPLODE rows (overlapping ranges,
        # multi-match filters) or DROP them (null-key filters), which
        # would corrupt the rare doc count if taken afterwards
        # (code-review 11.5)
        rare_src: dict[str, DataFrame] = {}
        # (date_)histogram min_doc_count >= 2 counts the bucket's FULL
        # own-level doc count in ES — including docs that later vanish
        # from the flattened relation because an INNER terms/multi_terms
        # size cut pruned their bucket tuple, an inner rare_terms
        # long-tail filter removed it, or an inner null-key filter
        # (terms / multi_terms / histogram) dropped the doc outright.
        # The cheap path (window-sum of leaf counts at step 3c) is only
        # exact when nothing below the histogram can drop rows; when
        # something can, snapshot the doc frame AT the histogram's
        # level — keys[:i+1] materialized, no inner filter applied yet —
        # and step 3c counts that frame instead (ADVICE r12).
        mdc_precut: set[str] = {
            b.label
            for i, b in enumerate(s.buckets)
            if isinstance(b, (DateHistogramBucket, HistogramBucket))
            and b.min_doc_count >= 2
            and any(
                isinstance(
                    inner,
                    (TermsBucket, MultiTermsBucket, RareTermsBucket,
                     HistogramBucket, FilterBucket, MissingBucket),
                )
                for inner in s.buckets[i + 1:]
            )
        }
        mdc_src: dict[str, DataFrame] = {}
        # filter/missing buckets DROP docs from the flattened relation;
        # a terms/multi_terms ABOVE them ordered by doc count or a
        # metric would then rank on the narrowed set, while ES ranks on
        # the terms bucket's own (pre-sub-agg) doc count — reject the
        # combination loudly rather than rank differently (round 13;
        # key-ordered terms are unaffected: the key is drop-invariant)
        for bi, bb in enumerate(s.buckets):
            if isinstance(bb, TermsBucket) and bb.order_by == "_term":
                continue
            if isinstance(bb, MultiTermsBucket) and bb.order_by == "_term":
                continue
            if isinstance(bb, (TermsBucket, MultiTermsBucket)) and any(
                isinstance(inner, (FilterBucket, MissingBucket))
                for inner in s.buckets[bi + 1:]
            ):
                raise ValueError(
                    f"kibana: a filter/missing bucket below the "
                    f"count/metric-ordered terms bucket {bb.label!r} "
                    f"would distort its ranking doc counts — order by "
                    f"_key or move the filter above it"
                )
        # auto mode resolves a date_histogram's interval at evaluate
        # time — the zero-fill grid (min_doc_count 0) must step by the
        # RESOLVED interval, captured here per bucket label
        resolved_interval_us: dict[str, int] = {}
        for b in s.buckets:
            if isinstance(b, RandomSamplerBucket):
                # transparent deterministic filter, no key column: keep
                # a doc iff md5(id ':' seed) residue falls below the
                # probability cut — scan-local, reproducible across
                # cluster layouts / AQE re-plans / engines (the
                # llmdata md5_residue machinery; exact SQL twin)
                from kafka_metrics_exporter_spark.llmdata.similarity import (
                    md5_residue,
                )

                keep_key = F.concat(
                    resolve(b.id_field).cast("string"),
                    F.lit(":"), F.lit(str(b.seed)),
                )
                df = df.filter(
                    md5_residue(keep_key) % F.lit(1_000_000)
                    < F.lit(int(round(b.probability * 1_000_000)))
                )
                continue
            if isinstance(b, SamplerBucket):
                # transparent deterministic top-k: the shard_size docs
                # with the lowest md5(id ':' seed) residues (id
                # tiebreak) — ONE TakeOrderedAndProject (bounded
                # per-task heaps), never a full sort; ES keeps
                # per-shard top-scored docs instead (dataclass
                # docstring documents the divergence)
                from kafka_metrics_exporter_spark.llmdata.similarity import (
                    md5_residue,
                )

                sp_id = resolve(b.id_field).cast("string")
                sp_res = md5_residue(
                    F.concat(sp_id, F.lit(":"), F.lit(str(b.seed)))
                )
                df = df.orderBy(sp_res.asc(), sp_id.asc()).limit(
                    b.shard_size
                )
                continue
            if isinstance(b, DiversifiedSamplerBucket):
                # per-dedup-key cap: keep the first max_docs_per_value
                # docs by md5(id ':' seed) residue (id tiebreak) —
                # deterministic where ES is shard-order/score
                # sensitive.  One hash-partitioned rank window on the
                # key; per-key state is a counter, never doc bodies.
                from kafka_metrics_exporter_spark.llmdata.similarity import (
                    md5_residue,
                )

                ds_id = resolve(b.id_field).cast("string")
                ds_res = md5_residue(
                    F.concat(ds_id, F.lit(":"), F.lit(str(b.seed)))
                )
                ds_w = Window.partitionBy(
                    resolve(b.field).cast("string")
                ).orderBy(ds_res.asc(), ds_id.asc())
                df = (
                    df.withColumn("__ds_rn", F.row_number().over(ds_w))
                    .filter(F.col("__ds_rn") <= b.max_docs_per_value)
                    .drop("__ds_rn")
                )
                continue
            if isinstance(b, NestedBucket):
                # context switch: ONE explode replaces the array
                # column with a struct per element; later fields
                # resolve as path.sub via the ordinary struct-path
                # resolver, doc_count now means NESTED docs (ES's
                # in-context semantics); empty/null arrays drop
                df = df.withColumn(b.path, F.explode(resolve(b.path)))
                continue
            if isinstance(b, TermsBucket):
                v = resolve(b.field).cast("string")
                if b.missing is not None:
                    # ES `missing`: docs without the field land in this
                    # bucket value instead of dropping (round 12)
                    v = F.coalesce(v, F.lit(b.missing))
                # ES drops docs missing the field from terms buckets
                # (it never emits a null-keyed bucket) — round 12;
                # previously a NULL key survived into a bucket row
                df = df.withColumn(b.label, v).filter(
                    F.col(b.label).isNotNull()
                )
            elif isinstance(b, DateHistogramBucket):
                # fixed-interval bucketing on epoch micros (date_trunc
                # can't express "2h"); pmod keeps it exact integer math
                us = F.unix_micros(resolve(b.field).cast("timestamp"))
                interval_us = b.interval_us
                if b.auto_buckets is not None:
                    # ES auto_date_histogram: the interval comes from
                    # the POPULATED span via ES's own rounding ladder
                    # (one 1-row min/max aggregation, the same probe
                    # shape as Kibana auto mode below)
                    row = df.agg(
                        F.min(us).alias("lo"), F.max(us).alias("hi")
                    ).first()
                    interval_us = es_auto_date_interval_us(
                        row["lo"] or 0, row["hi"] or 0, b.auto_buckets
                    )
                elif b.auto and auto_interval_buckets is not None:
                    # real ES auto-interval semantics (the DEFAULT
                    # since round 7 — the corpus's six date_histograms
                    # all say interval:"auto", which real Kibana
                    # resolves from the time picker, never from the
                    # unused customInterval field): derive the interval
                    # from the request time range — or, if none was
                    # passed, from the data span (one 1-row min/max
                    # agg, what Kibana reads off its time picker).
                    # auto_interval_buckets=None opts back into the
                    # legacy customInterval pin.
                    if auto_range is not None:
                        lo, hi = (_to_us(x) for x in auto_range)
                    else:
                        row = df.agg(
                            F.min(us).alias("lo"), F.max(us).alias("hi")
                        ).first()
                        lo, hi = row["lo"], row["hi"]
                    span = max(0, (hi or 0) - (lo or 0))
                    interval_us = auto_interval_us(span, auto_interval_buckets)
                resolved_interval_us[b.label] = interval_us
                df = df.withColumn(
                    b.label,
                    F.timestamp_micros(us - F.pmod(us, F.lit(interval_us))),
                )
            elif isinstance(b, MultiTermsBucket):
                # key_as_string: the '|'-joined field tuple as ES
                # renders multi_terms keys — with embedded separators
                # ESCAPED (backslash doubles, '|' → '\|') so the join stays a
                # BIJECTION of the tuple: ES keys on the value array,
                # and a plain join would collapse ('a|b','c') with
                # ('a','b|c') into one bucket (code-review 11.5).  For
                # separator-free data the key renders exactly like ES.
                # Docs missing ANY field drop first (concat_ws would
                # silently skip the NULL and alias distinct tuples).
                parts = [
                    F.regexp_replace(
                        resolve(f).cast("string"), r"([\\|])", r"\\$1"
                    )
                    for f in b.fields
                ]
                raw = [resolve(f).cast("string") for f in b.fields]
                keep = raw[0].isNotNull()
                for prt in raw[1:]:
                    keep = keep & prt.isNotNull()
                df = df.filter(keep).withColumn(
                    b.label, F.concat_ws("|", *parts)
                )
            elif isinstance(b, FilterBucket):
                df = df.filter(
                    _query_string_pred(
                        b.query, resolve, df, default_search_field
                    )
                ).withColumn(b.label, F.lit(b.label))
            elif isinstance(b, MissingBucket):
                df = df.filter(resolve(b.field).isNull()).withColumn(
                    b.label, F.lit(b.label)
                )
            elif isinstance(b, RareTermsBucket):
                v = resolve(b.field).cast("string")
                df = df.filter(v.isNotNull()).withColumn(b.label, v)
                rare_src[b.label] = df
            elif isinstance(b, VariableWidthHistogramBucket):
                if b is not s.buckets[0]:
                    raise ValueError(
                        "kibana: variable_width_histogram must be the "
                        "outermost bucket (ES rejects it under other "
                        "bucketing aggs)"
                    )
                v = resolve(b.field).cast("double")
                df = df.filter(v.isNotNull())
                k = b.buckets
                probes = [(i + 0.5) / k for i in range(k)]
                # exact quantile seeding is the oracle-parity
                # default; vwh_approx_seed=True switches to
                # percentile_approx — the 100 TB path (the later
                # rounds are identical either way: scan-local
                # assignment + k-row aggregates)
                seed_fn = (
                    (lambda c_, ps: F.percentile_approx(
                        c_, ps, F.lit(10000)))
                    if vwh_approx_seed
                    else F.percentile
                )
                # the Lloyd rounds re-read ONLY this one column: train
                # on a persisted 1-column projection so the doc scan
                # (and any upstream filters/joins) runs once, not once
                # per round + once for seeding (VERDICT r13 item 2)
                proj = df.select(v.alias("__v")).persist()
                row = proj.agg(
                    seed_fn(
                        F.col("__v"),
                        F.array(*[F.lit(p_) for p_ in probes]),
                    ).alias("c")
                ).first()
                if row["c"] is None:
                    proj.unpersist(blocking=False)
                    raise ValueError(
                        "kibana: variable_width_histogram over an "
                        "empty relation"
                    )
                # centroids round to 6 decimals after seeding and
                # after every update: the sums are exact (scaled
                # integral inputs aside, avg = exact-sum / count), so
                # the rounding pins the one interpolated step and
                # keeps every assignment bit-replayable in SQL
                cents = [round(float(c), 6) for c in row["c"]]

                def _assign(cs):
                    dists = F.array(*[F.abs(v - F.lit(c)) for c in cs])
                    # argmin, FIRST index on ties (list_position twin)
                    return F.array_position(dists, F.array_min(dists))

                # each Lloyd round is ONE executor-side partial-sum
                # pass (the train_pq_codebooks pattern,
                # llmdata/similarity.py): every partition emits <= k
                # (cluster, sum, count) rows — no shuffle, no
                # groupBy — and the driver merges the partials in
                # SORTED order so the fold is bit-deterministic.
                # numpy argmin(|v - c|) (first index on ties) is the
                # exact IEEE twin of the SQL _assign above, so the
                # trained centroids stay SQL-replayable.
                import numpy as np
                import pandas as pd

                def _round_partials(cs_list):
                    cs = np.asarray(cs_list, dtype="float64")

                    def go(batches):
                        for pdf in batches:
                            if len(pdf) == 0:
                                continue
                            vv = pdf["__v"].to_numpy(dtype="float64")
                            cl = np.abs(
                                vv[:, None] - cs[None, :]
                            ).argmin(axis=1)
                            cls, sums, ns = [], [], []
                            for c in np.unique(cl):
                                m = cl == c
                                cls.append(int(c))
                                sums.append(float(vv[m].sum()))
                                ns.append(int(m.sum()))
                            yield pd.DataFrame(
                                {"cl": cls, "s": sums, "n": ns}
                            )

                    return proj.mapInPandas(
                        go, "cl int, s double, n long"
                    ).collect()

                for _ in range(3):
                    acc: dict[int, tuple[float, int]] = {}
                    for r in sorted(
                        _round_partials(cents),
                        key=lambda r: (r["cl"], r["n"], r["s"]),
                    ):
                        s0, n0 = acc.get(r["cl"], (0.0, 0))
                        acc[r["cl"]] = (s0 + r["s"], n0 + r["n"])
                    # an emptied cluster keeps its previous centroid
                    cents = [
                        round(acc[i][0] / acc[i][1], 6)
                        if i in acc else c
                        for i, c in enumerate(cents)
                    ]
                proj.unpersist(blocking=False)
                df = df.withColumn(
                    b.label,
                    F.element_at(
                        F.array(*[F.lit(c) for c in cents]),
                        _assign(cents).cast("int"),
                    ),
                )
            elif isinstance(b, AdjacencyMatrixBucket):
                # singleton buckets for every matching filter + pair
                # buckets 'a&b' for every matching pair — b.filters is
                # pre-sorted lexicographically at parse time (ES's
                # fixed filter order, ADVICE r13), so i < j here IS
                # name order.  Scan-local array algebra, then one
                # explode; a doc matching k filters contributes
                # k + k(k-1)/2 rows, k <= 100 by the parse-time cap
                matches = F.array_compact(
                    F.array(
                        *[
                            F.when(
                                _query_string_pred(
                                    q, resolve, df, default_search_field
                                ),
                                F.lit(name),
                            )
                            for name, q in b.filters
                        ]
                    )
                )
                pair_keys = F.flatten(
                    F.transform(
                        matches,
                        lambda x, i: F.transform(
                            F.slice(
                                matches, i + F.lit(2),
                                F.greatest(
                                    F.size(matches) - i - 1, F.lit(0)
                                ),
                            ),
                            lambda y: F.concat_ws(b.separator, x, y),
                        ),
                    )
                )
                df = df.withColumn(
                    b.label, F.explode(F.concat(matches, pair_keys))
                )
            elif isinstance(b, FiltersBucket):
                # a doc lands in EVERY filter bucket it matches; with
                # other_bucket set, a doc matching NOTHING lands in the
                # other bucket instead of dropping (ES other_bucket)
                matches = F.array_compact(
                    F.array(
                        *[
                            F.when(
                                _query_string_pred(q, resolve, df, default_search_field),
                                F.lit(lbl),
                            )
                            for lbl, q in b.filters
                        ]
                    )
                )
                if b.other_key is not None:
                    # bind the match array ONCE (optimization r16): the
                    # when/otherwise referenced it twice, so every
                    # filter predicate (fuzzy folds, proximity scans)
                    # evaluated twice per row
                    matches = _bind1(
                        matches,
                        lambda m: F.when(
                            F.size(m) == 0, F.array(F.lit(b.other_key))
                        ).otherwise(m),
                    )
                df = df.withColumn(b.label, F.explode(matches))
            elif isinstance(b, HistogramBucket):
                # ES: key = floor(value / interval) * interval (floor,
                # not truncation — negatives bucket downward); docs
                # missing the field drop, like the range/date_range
                # buckets (code-review r9: a NULL key used to survive
                # into a bucket row ES never emits)
                v = resolve(b.field).cast("double")
                df = df.filter(v.isNotNull()).withColumn(
                    b.label,
                    F.floor(v / F.lit(b.interval)).cast("double")
                    * F.lit(b.interval),
                )
            elif isinstance(b, RangeBucket):
                # half-open [from, to); a doc lands in EVERY matching
                # range (ES allows overlaps) — same explode shape as
                # FiltersBucket
                v = resolve(b.field).cast("double")

                def _in_range(lo, hi):
                    pred = F.lit(True)
                    if lo is not None:
                        pred = pred & (v >= F.lit(lo))
                    if hi is not None:
                        pred = pred & (v < F.lit(hi))
                    return pred

                matches = F.array_compact(
                    F.array(
                        *[
                            F.when(_in_range(lo, hi), F.lit(key))
                            for key, lo, hi in b.ranges
                        ]
                    )
                )
                df = df.withColumn(b.label, F.explode(matches))
            elif isinstance(b, IpRangeBucket):
                # IP string -> two biased 64-bit words ONCE per row
                # (the whole parse bound as a lambda leaf — project
                # collapsing would otherwise re-run it once per range
                # predicate), then the RangeBucket overlap-explode
                # comparing (hi, lo) lexicographically against the
                # parse-time 128-bit endpoints; malformed addresses
                # stay null and match no range
                ip_s = resolve(b.field).cast("string")

                # factory binds the captured ranges: pyspark derives a
                # HOF lambda's arity from the Python signature, so
                # default-arg closures would mis-arity the callback
                def _make_ip_matches(_ranges):
                    def _ip_matches(w):
                        hi_w, lo_w = w["hi"], w["lo"]

                        def _ge(v):  # (hi_w, lo_w) >= v, unsigned-128
                            h, l_ = _ip128_bounds(v)
                            return (hi_w > F.lit(h)) | (
                                (hi_w == F.lit(h)) & (lo_w >= F.lit(l_))
                            )

                        def _lt(v):
                            h, l_ = _ip128_bounds(v)
                            return (hi_w < F.lit(h)) | (
                                (hi_w == F.lit(h)) & (lo_w < F.lit(l_))
                            )

                        def _in_iprange(lo, hi):
                            pred = hi_w.isNotNull()
                            if lo is not None:
                                pred = pred & _ge(lo)
                            if hi is not None:
                                pred = pred & _lt(hi)
                            return pred

                        return F.array_compact(
                            F.array(
                                *[
                                    F.when(_in_iprange(lo, hi), F.lit(key))
                                    for key, lo, hi in _ranges
                                ]
                            )
                        )

                    return _ip_matches

                ip_matches = _bind1(
                    _ip128_struct(ip_s), _make_ip_matches(b.ranges)
                )
                df = df.withColumn(b.label, F.explode(ip_matches))
            elif isinstance(b, GeoGridBucket):
                # grid key = pure Column math over the geo_point
                # struct, unrolled at compile time; invalid/missing
                # coordinates drop (ES rejects them at index) — the
                # size/doc_count rank rides the terms loop below
                g_lat, g_lon = _geo_lat_lon(resolve(b.field))
                g_keep = _geo_valid(g_lat, g_lon)
                if b.bounds is not None:
                    # viewport restriction BEFORE keying — scan-local,
                    # pushes into the source like any filter
                    t_, l_, b_2, r_ = b.bounds
                    g_keep = (
                        g_keep
                        & (g_lat <= F.lit(t_)) & (g_lat >= F.lit(b_2))
                        & (g_lon >= F.lit(l_)) & (g_lon <= F.lit(r_))
                    )
                df = df.filter(g_keep).withColumn(
                    b.label,
                    geohash_column(g_lat, g_lon, b.precision)
                    if b.kind == "geohash"
                    else geotile_column(g_lat, g_lon, b.precision),
                )
            elif isinstance(b, GeoDistanceBucket):
                # haversine meters to the origin evaluated ONCE per
                # doc, then the RangeBucket overlap-explode
                g_lat, g_lon = _geo_lat_lon(resolve(b.field))
                dist = F.when(
                    _geo_valid(g_lat, g_lon),
                    haversine_meters(g_lat, g_lon, *b.origin),
                )

                def _make_geo_matches(_ranges):
                    def _geo_matches(dv):
                        def rng(lo, hi):
                            pred = dv.isNotNull()
                            if lo is not None:
                                pred = pred & (dv >= F.lit(lo))
                            if hi is not None:
                                pred = pred & (dv < F.lit(hi))
                            return pred

                        return F.array_compact(
                            F.array(
                                *[
                                    F.when(rng(lo, hi), F.lit(key))
                                    for key, lo, hi in _ranges
                                ]
                            )
                        )

                    return _geo_matches

                df = df.withColumn(
                    b.label,
                    F.explode(_bind1(dist, _make_geo_matches(b.ranges))),
                )
            elif isinstance(b, DateRangeBucket):
                # half-open [from, to) over timestamps, overlap-explode
                # like RangeBucket; endpoints parse once as literals
                tv = resolve(b.field).cast("timestamp")

                def _in_drange(lo, hi):
                    pred = tv.isNotNull()
                    if lo is not None:
                        pred = pred & (tv >= F.lit(lo).cast("timestamp"))
                    if hi is not None:
                        pred = pred & (tv < F.lit(hi).cast("timestamp"))
                    return pred

                dmatches = F.array_compact(
                    F.array(
                        *[
                            F.when(_in_drange(lo, hi), F.lit(key))
                            for key, lo, hi in b.ranges
                        ]
                    )
                )
                df = df.withColumn(b.label, F.explode(dmatches))
            key_names.append(b.label)
            if b.label in mdc_precut:
                mdc_src[b.label] = df

        # 2) one hash aggregation over the full bucket-key tuple.
        # A visualization with bucket aggs only carries Kibana's
        # implicit doc-count metric ("Count" in the UI).
        metrics = s.metrics or (MetricAgg(op="count", field="", label="count"),)
        agg_exprs = []
        multi_hits: list[TopHitsAgg] = []
        multi_tms: list[TopMetricsAgg] = []
        mad_aggs: list[MadAgg] = []
        ss_aggs: list[StringStatsAgg] = []
        for m in metrics:
            if isinstance(m, PercentilesAgg):
                # one exact interpolated percentile sketch per agg; the
                # array is unpacked into per-percent columns at the end
                agg_exprs.append(
                    F.percentile(
                        resolve(m.field).cast("double"),
                        F.array(*[F.lit(p / 100.0) for p in m.percents]),
                    ).alias(m.label)
                )
                continue
            if isinstance(m, PercentileRanksAgg):
                # exact empirical CDF per probe value; counts ignore
                # missing-field docs like every ES metric.  The
                # denominator guard matters under Spark 4 ANSI: a
                # bucket whose docs all miss the field has count 0 and
                # an unguarded division THROWS (code-review r10) — ES
                # emits null there
                v = resolve(m.field).cast("double")
                agg_exprs.extend(
                    F.when(
                        F.count(v) > 0,
                        F.count(F.when(v <= F.lit(val), F.lit(1)))
                        .cast("double")
                        / F.count(v)
                        * F.lit(100.0),
                    ).alias(n)
                    for val, n in zip(m.values, m.column_names())
                )
                continue
            if isinstance(m, StatsAgg):
                v = resolve(m.field).cast("double")
                names = m.column_names()
                exprs = [
                    F.count(v),
                    F.min(v),
                    F.max(v),
                    F.avg(v),
                    F.sum(v),
                ]
                if m.extended:
                    exprs.append(F.sum(v * v))
                agg_exprs.extend(
                    e.alias(n) for e, n in zip(exprs, names)
                )
                continue
            if isinstance(m, BoxplotAgg):
                v = resolve(m.field).cast("double")
                names = m.column_names()
                agg_exprs.append(F.min(v).alias(names[0]))
                agg_exprs.append(
                    F.percentile(
                        v, F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
                    ).alias(f"__bp_{m.label}")
                )
                agg_exprs.append(F.max(v).alias(names[4]))
                continue
            if isinstance(m, ReverseNestedAgg):
                # parent doc_count: exact distinct of the explicit
                # root key (count_distinct honors approx_cardinality
                # mode like every cardinality in this compiler)
                agg_exprs.append(
                    count_distinct(resolve(m.id_field)).alias(m.label)
                )
                continue
            if isinstance(m, GeoBoundsAgg):
                gb_lat, gb_lon = _geo_lat_lon(resolve(m.field))
                gb_ok = _geo_valid(gb_lat, gb_lon)
                gb_lat = F.when(gb_ok, gb_lat)
                gb_lon = F.when(gb_ok, gb_lon)
                names = m.column_names()
                agg_exprs += [
                    F.max(gb_lat).alias(names[0]),   # top
                    F.min(gb_lon).alias(names[1]),   # left
                    F.min(gb_lat).alias(names[2]),   # bottom
                    F.max(gb_lon).alias(names[3]),   # right
                ]
                continue
            if isinstance(m, GeoCentroidAgg):
                gc_lat, gc_lon = _geo_lat_lon(resolve(m.field))
                gc_ok = _geo_valid(gc_lat, gc_lon)
                gc_lat = F.when(gc_ok, gc_lat)
                gc_lon = F.when(gc_ok, gc_lon)
                names = m.column_names()
                agg_exprs += [
                    F.avg(gc_lat).alias(names[0]),
                    F.avg(gc_lon).alias(names[1]),
                    F.count(gc_lat).alias(names[2]),
                ]
                continue
            if isinstance(m, MadAgg):
                # needs the per-bucket median FIRST — two grouped
                # passes joined back after the main hash agg (below)
                mad_aggs.append(m)
                continue
            if isinstance(m, WeightedAvgAgg):
                v = resolve(m.value_field).cast("double")
                w = resolve(m.weight_field).cast("double")
                both = v.isNotNull() & w.isNotNull()
                wsum = F.sum(F.when(both, w))
                agg_exprs.append(
                    # ANSI guard: an all-missing bucket has weight-sum
                    # null/0 — ES emits null there, never a div error
                    F.when(
                        wsum > 0,
                        F.sum(F.when(both, v * w)) / wsum,
                    ).alias(m.label)
                )
                continue
            if isinstance(m, StringStatsAgg):
                v = resolve(m.field).cast("string")
                ln = F.length(v)
                names = m.column_names()
                agg_exprs += [
                    F.count(v).alias(names[0]),
                    F.min(ln).alias(names[1]),
                    F.max(ln).alias(names[2]),
                    F.avg(ln.cast("double")).alias(names[3]),
                ]
                ss_aggs.append(m)  # entropy joined back below
                continue
            if isinstance(m, MatrixStatsAgg):
                # power sums Σx..Σx⁴/Σxy ride the main hash agg in
                # DECIMAL(38,6) (partition-order-independent totals —
                # survives AQE/retry re-summation); a doc missing ANY
                # field is excluded from the whole matrix (ES default)
                mx_cols = [resolve(f_).cast("double") for f_ in m.fields]
                mx_ok = mx_cols[0].isNotNull()
                for c_ in mx_cols[1:]:
                    mx_ok = mx_ok & c_.isNotNull()

                def _dsum(e, _ok=mx_ok):
                    return F.sum(F.when(_ok, e).cast("decimal(38,6)"))

                agg_exprs.append(
                    F.count(F.when(mx_ok, F.lit(1))).alias(
                        f"{m.label}_doc_count"
                    )
                )
                for f_, c_ in zip(m.fields, mx_cols):
                    sl = _slug(f_)
                    agg_exprs += [
                        _dsum(c_).alias(f"__mx_{m.label}_{sl}_s1"),
                        _dsum(c_ * c_).alias(f"__mx_{m.label}_{sl}_s2"),
                        _dsum(c_ * c_ * c_).alias(f"__mx_{m.label}_{sl}_s3"),
                        _dsum(c_ * c_ * c_ * c_).alias(
                            f"__mx_{m.label}_{sl}_s4"
                        ),
                    ]
                for i_ in range(len(m.fields)):
                    for j_ in range(i_ + 1, len(m.fields)):
                        si = _slug(m.fields[i_])
                        sj = _slug(m.fields[j_])
                        agg_exprs.append(
                            _dsum(mx_cols[i_] * mx_cols[j_]).alias(
                                f"__mx_{m.label}_{si}_{sj}_p"
                            )
                        )
                continue
            if isinstance(m, TTestAgg):
                # per-side (or per-pair) DECIMAL(38,6) power sums ride
                # the main hash agg (the matrix_stats determinism
                # argument); population filters are scan-local
                # query_string predicates
                tva = resolve(m.a_field).cast("double")
                tvb = resolve(m.b_field).cast("double")
                if m.test_type == "paired":
                    tok = tva.isNotNull() & tvb.isNotNull()
                    td = tva - tvb
                    agg_exprs += [
                        F.count(F.when(tok, F.lit(1))).alias(
                            f"__tt_{m.label}_n"),
                        F.sum(F.when(tok, td).cast("decimal(38,6)"))
                        .alias(f"__tt_{m.label}_s1"),
                        F.sum(F.when(tok, td * td).cast("decimal(38,6)"))
                        .alias(f"__tt_{m.label}_s2"),
                    ]
                else:
                    pa = (
                        _query_string_pred(
                            m.a_filter, resolve, df, default_search_field
                        ) if m.a_filter else F.lit(True)
                    ) & tva.isNotNull()
                    pb = (
                        _query_string_pred(
                            m.b_filter, resolve, df, default_search_field
                        ) if m.b_filter else F.lit(True)
                    ) & tvb.isNotNull()
                    for side, pred, val in (
                        ("a", pa, tva), ("b", pb, tvb),
                    ):
                        agg_exprs += [
                            F.count(F.when(pred, F.lit(1))).alias(
                                f"__tt_{m.label}_n{side}"),
                            F.sum(F.when(pred, val).cast("decimal(38,6)"))
                            .alias(f"__tt_{m.label}_s1{side}"),
                            F.sum(
                                F.when(pred, val * val)
                                .cast("decimal(38,6)")
                            ).alias(f"__tt_{m.label}_s2{side}"),
                        ]
                continue
            if isinstance(m, RateAgg):
                # rate = bucket value · unit / interval, against the
                # INNERMOST (auto_)date_histogram's resolved interval
                # (ES: rate must sit under a date_histogram)
                dhs = [
                    bb for bb in s.buckets
                    if isinstance(bb, DateHistogramBucket)
                ]
                if not dhs:
                    raise ValueError(
                        "kibana: rate agg requires an enclosing "
                        "(auto_)date_histogram bucket"
                    )
                iv_us = resolved_interval_us[dhs[-1].label]
                factor = (m.unit_us / iv_us) if m.unit_us else 1.0
                if not m.field:
                    base = F.count(F.lit(1)).cast("double")
                elif m.mode == "value_count":
                    base = F.count(resolve(m.field)).cast("double")
                else:
                    # sum-family: an all-null bucket rates 0, like ES
                    base = F.coalesce(
                        F.sum(resolve(m.field).cast("double")), F.lit(0.0)
                    )
                agg_exprs.append((base * F.lit(factor)).alias(m.label))
                continue
            if isinstance(m, TopMetricsAgg):
                if m.size > 1:
                    # ranked + joined after the main hash agg (below,
                    # sharing the top_hits window shape)
                    multi_tms.append(m)
                    continue
                sort_col = resolve(m.sort_field)
                # ES skips documents whose sort field is missing; an
                # unguarded struct is non-null even with a null field,
                # and Spark's nulls-first-on-asc would make min_by pick
                # exactly those docs (ADVICE r13).  A NULL ordering
                # value makes max_by/min_by skip the row.
                order = F.when(
                    sort_col.isNotNull(),
                    F.struct(
                        sort_col.alias("s"),
                        *([resolve(tiebreak).alias("t")]
                          if tiebreak else []),
                    ),
                )
                pick = F.max_by if m.sort_order == "desc" else F.min_by
                agg_exprs.extend(
                    pick(resolve(f_), order).alias(n_)
                    for f_, n_ in zip(m.fields, m.column_names())
                )
                continue
            if isinstance(m, MetricAgg):
                if m.op == "count":
                    agg_exprs.append(F.count(F.lit(1)).alias(m.label))
                    continue
                if m.op == "value_count":
                    # ES value_count: non-null field VALUES, not docs
                    agg_exprs.append(
                        F.count(resolve(m.field)).alias(m.label)
                    )
                    continue
                val = resolve(m.field)
                fn = {
                    "avg": lambda c: F.avg(c.cast("double")),
                    "min": lambda c: F.min(c.cast("double")),
                    "max": lambda c: F.max(c.cast("double")),
                    "sum": lambda c: F.sum(c.cast("double")),
                    "cardinality": count_distinct,
                }[m.op]
                agg_exprs.append(fn(val).alias(m.label))
            else:  # TopHitsAgg
                if m.size > 1:
                    # ranked + joined after the main hash agg (below)
                    multi_hits.append(m)
                    continue
                sort_col = resolve(m.sort_field)
                order = F.struct(
                    sort_col.alias("s"),
                    *( [resolve(tiebreak).alias("t")] if tiebreak else [] ),
                )
                pick = F.max_by if m.sort_order == "desc" else F.min_by
                val = resolve(m.field)
                if m.aggregate in ("average", "sum", "max"):
                    val = val.cast("double")
                agg_exprs.append(pick(val, order).alias(m.label))
        # an INNERMOST rare_terms bucket's doc count rides the main
        # aggregation as a hidden column — its groups ARE the rare
        # level, so no second scan/shuffle/join is needed (step 3b
        # filters and drops it; code-review 11.5)
        if s.buckets and isinstance(s.buckets[-1], RareTermsBucket):
            agg_exprs.append(
                F.count(F.lit(1)).alias(f"__rt_{s.buckets[-1].label}")
            )
        # (date_)histogram min_doc_count != 1 (round 12): each needs
        # its own-level doc count — a hidden leaf count rolled up by a
        # keys[:i+1] window at step 3c.  Validated here, loudly:
        # an explode-type bucket nested BELOW the histogram would
        # inflate the level count (a doc lands in several range/filter
        # buckets), and a zero-filled EMPTY bucket above other buckets
        # has no child rows — the flattened relation cannot represent
        # it, so min_doc_count=0 requires the histogram innermost.
        mdc_buckets = [
            (i, b)
            for i, b in enumerate(s.buckets)
            if isinstance(b, (DateHistogramBucket, HistogramBucket))
            and b.min_doc_count != 1
        ]
        for i, b in mdc_buckets:
            exploding = [
                inner.label
                for inner in s.buckets[i + 1:]
                if isinstance(
                    inner,
                    (FiltersBucket, RangeBucket, DateRangeBucket,
                     IpRangeBucket, AdjacencyMatrixBucket),
                )
            ]
            if exploding:
                raise ValueError(
                    f"kibana: min_doc_count on {b.label!r} cannot sit above "
                    f"row-exploding buckets {exploding} — the level doc "
                    f"count would be inflated"
                )
            if b.min_doc_count == 0 and i != len(s.buckets) - 1:
                raise ValueError(
                    f"kibana: min_doc_count=0 needs {b.label!r} to be the "
                    f"innermost bucket — an empty bucket above other "
                    f"buckets has no child rows in the flattened result"
                )
            agg_exprs.append(F.count(F.lit(1)).alias(f"__mdc_{b.label}"))
        if not agg_exprs:
            # every metric deferred to the multi-hit join below — the
            # bucket frame still needs one aggregate to exist
            agg_exprs.append(F.count(F.lit(1)).alias("__th_docs"))
        out = df.groupBy(*[F.col(k) for k in key_names]).agg(*agg_exprs)
        # top_hits with size > 1 (round 12): ES's top_hits returns the
        # top-N documents by sort order and Kibana's Top Hit metric
        # folds them with the chosen aggregate.  The N survivors per
        # bucket come from the deterministic-tiebreak rank
        # (row_number() <= size) — nested under buckets the window
        # partitions by the full bucket-key tuple, so the rank
        # distributes; a bucketless panel takes orderBy().limit(size)
        # (TakeOrderedAndProject) instead of an unpartitioned window —
        # the same global-sort-free argument as the top-level terms
        # cut.  The fold then joins back on the bucket keys (broadcast-
        # sized per bucket: <= size rows contribute).
        for m in multi_hits:
            sort_col = resolve(m.sort_field)
            # the tiebreak inherits the sort direction — exactly the
            # size-1 path's max_by/min_by struct comparison, so the
            # first of N hits is always the size-1 answer
            d = (lambda c: c.desc()) if m.sort_order == "desc" else (
                lambda c: c.asc()
            )
            order_cols = [
                d(sort_col),
                *([d(resolve(tiebreak))] if tiebreak else []),
            ]
            if key_names:
                thw = Window.partitionBy(
                    *[F.col(k) for k in key_names]
                ).orderBy(*order_cols)
                ranked = df.withColumn("__rn", F.row_number().over(thw))
                ranked = ranked.filter(F.col("__rn") <= m.size)
            else:
                ranked = (
                    df.orderBy(*order_cols)
                    .limit(m.size)
                    # <= size rows by construction, so the rank that
                    # orders the concat fold is bounded (the
                    # pipe_dsir_resample argument)
                    .withColumn(
                        "__rn", F.row_number().over(Window.orderBy(*order_cols))
                    )
                )
            val = resolve(m.field)
            if m.aggregate == "concat":
                # sort-order-stable ", "-join, exactly Kibana's render
                fold = F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.struct(
                                    F.col("__rn").alias("r"),
                                    val.cast("string").alias("v"),
                                )
                            )
                        ),
                        lambda h: h["v"],
                    ),
                    ", ",
                )
            else:
                fold = {
                    "average": F.avg, "sum": F.sum,
                    "max": F.max, "min": F.min,
                }[m.aggregate](val.cast("double"))
            per = ranked.groupBy(*[F.col(k) for k in key_names]).agg(
                fold.alias(m.label)
            )
            if key_names:
                out = out.join(per, key_names, "left")
            else:
                out = out.crossJoin(F.broadcast(per))
        # top_metrics with size > 1 (round 13): the same
        # deterministic-tiebreak rank window as top_hits, but instead
        # of folding, each metric field becomes a sort-ordered ARRAY
        # of the top-N documents' values — exactly the `top` list ES
        # returns.  Join-back is bucket-keyed; <= size rows contribute
        # per bucket.
        for m in multi_tms:
            sort_col = resolve(m.sort_field)
            # ES skips docs missing the sort field (ADVICE r13 — see
            # the size-1 max_by/min_by guard above); filter before the
            # rank window so nulls-first-on-asc can't rank them
            tm_df = df.filter(sort_col.isNotNull())
            d = (lambda c: c.desc()) if m.sort_order == "desc" else (
                lambda c: c.asc()
            )
            order_cols = [
                d(sort_col),
                *([d(resolve(tiebreak))] if tiebreak else []),
            ]
            if key_names:
                tmw = Window.partitionBy(
                    *[F.col(k) for k in key_names]
                ).orderBy(*order_cols)
                ranked = tm_df.withColumn("__rn", F.row_number().over(tmw))
                ranked = ranked.filter(F.col("__rn") <= m.size)
            else:
                ranked = (
                    tm_df.orderBy(*order_cols)
                    .limit(m.size)
                    # <= size rows by construction: bounded window
                    .withColumn(
                        "__rn",
                        F.row_number().over(Window.orderBy(*order_cols)),
                    )
                )
            folds = [
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__rn").alias("r"),
                                resolve(f_).alias("v"),
                            )
                        )
                    ),
                    lambda h: h["v"],
                ).alias(n_)
                for f_, n_ in zip(m.fields, m.column_names())
            ]
            per = ranked.groupBy(*[F.col(k) for k in key_names]).agg(*folds)
            if key_names:
                out = out.join(per, key_names, "left")
            else:
                out = out.crossJoin(F.broadcast(per))
        # string_stats entropy (round 13): one char-keyed aggregation
        # over the doc frame per agg — H = log2(T) - (1/T)*sum(c*log2 c)
        # in a single pass — joined back bucket-keyed (one row per
        # bucket); a bucketless panel folds to one row broadcast.
        for m in ss_aggs:
            v = resolve(m.field).cast("string")
            ent_name = m.column_names()[4]
            chars = df.filter(v.isNotNull()).select(
                *[F.col(k) for k in key_names],
                F.explode(F.split(v, "(?!$)")).alias("__ch"),
            ).filter(F.col("__ch") != "")
            cc = chars.groupBy(
                *[F.col(k) for k in key_names], F.col("__ch")
            ).agg(F.count(F.lit(1)).alias("__c"))
            t = F.sum("__c").cast("double")
            ent_expr = (
                F.log2(t) - F.sum(F.col("__c") * F.log2("__c")) / t
            ).alias(ent_name)
            if key_names:
                ent = cc.groupBy(*[F.col(k) for k in key_names]).agg(ent_expr)
                out = out.join(ent, key_names, "left")
            else:
                out = out.crossJoin(F.broadcast(cc.agg(ent_expr)))

        # median_absolute_deviation (round 12): pass 1 computes each
        # bucket's median, pass 2 the median of absolute deviations —
        # both grouped on the SAME keys (the second groupBy reuses the
        # first shuffle's partitioning; the median join-back is
        # bucket-table-sized) — then a bucket-keyed join onto the main
        # frame.  A bucketless panel folds to one row via global aggs
        # + one-row broadcasts.
        for m in mad_aggs:
            v = resolve(m.field).cast("double")
            if key_names:
                med = df.groupBy(*[F.col(k) for k in key_names]).agg(
                    F.percentile(v, F.lit(0.5)).alias("__med")
                )
                dev = df.join(med, key_names)
                madf = dev.groupBy(*[F.col(k) for k in key_names]).agg(
                    F.percentile(
                        F.abs(v - F.col("__med")), F.lit(0.5)
                    ).alias(m.label)
                )
                out = out.join(madf, key_names, "left")
            else:
                med = df.agg(F.percentile(v, F.lit(0.5)).alias("__med"))
                dev = df.crossJoin(F.broadcast(med))
                madf = dev.agg(
                    F.percentile(
                        F.abs(v - F.col("__med")), F.lit(0.5)
                    ).alias(m.label)
                )
                out = out.crossJoin(F.broadcast(madf))
        if "__th_docs" in out.columns:
            out = out.drop("__th_docs")
        for m in metrics:
            if isinstance(m, BoxplotAgg):
                names = m.column_names()
                arr = F.col(f"__bp_{m.label}")
                out = (
                    out.withColumn(names[1], arr.getItem(0))
                    .withColumn(names[2], arr.getItem(1))
                    .withColumn(names[3], arr.getItem(2))
                    .drop(f"__bp_{m.label}")
                )
            if isinstance(m, MatrixStatsAgg):
                # ES MatrixStatsResults formulas from the exact
                # fixed-point power sums: M2/M3/M4/C2 central moments
                # derived in double; degenerate cases null (n<2 for
                # the (n−1)-normalized stats, M2=0 for shape stats)
                n = F.col(f"{m.label}_doc_count").cast("double")
                mx_mean: dict[str, Column] = {}
                mx_m2: dict[str, Column] = {}
                for f_ in m.fields:
                    sl = _slug(f_)
                    s1 = F.col(f"__mx_{m.label}_{sl}_s1").cast("double")
                    s2 = F.col(f"__mx_{m.label}_{sl}_s2").cast("double")
                    s3 = F.col(f"__mx_{m.label}_{sl}_s3").cast("double")
                    s4 = F.col(f"__mx_{m.label}_{sl}_s4").cast("double")
                    mean = s1 / n
                    m2 = s2 - n * mean * mean
                    m3 = s3 - F.lit(3.0) * mean * s2 \
                        + F.lit(2.0) * n * mean * mean * mean
                    m4 = s4 - F.lit(4.0) * mean * s3 \
                        + F.lit(6.0) * mean * mean * s2 \
                        - F.lit(3.0) * n * mean * mean * mean * mean
                    mx_mean[f_], mx_m2[f_] = mean, m2
                    out = out.withColumn(
                        f"{m.label}_{sl}_mean", F.when(n > 0, mean)
                    ).withColumn(
                        f"{m.label}_{sl}_variance",
                        F.when(n >= 2, m2 / (n - F.lit(1.0))),
                    ).withColumn(
                        f"{m.label}_{sl}_skewness",
                        F.when(m2 > 0, F.sqrt(n) * m3 / F.pow(m2, 1.5)),
                    ).withColumn(
                        f"{m.label}_{sl}_kurtosis",
                        F.when(m2 > 0, n * m4 / (m2 * m2)),
                    )
                for i_ in range(len(m.fields)):
                    for j_ in range(i_ + 1, len(m.fields)):
                        fi, fj = m.fields[i_], m.fields[j_]
                        si, sj = _slug(fi), _slug(fj)
                        p = F.col(
                            f"__mx_{m.label}_{si}_{sj}_p"
                        ).cast("double")
                        c2 = p - n * mx_mean[fi] * mx_mean[fj]
                        out = out.withColumn(
                            f"{m.label}_{si}_{sj}_covariance",
                            F.when(n >= 2, c2 / (n - F.lit(1.0))),
                        ).withColumn(
                            f"{m.label}_{si}_{sj}_correlation",
                            F.when(
                                (mx_m2[fi] > 0) & (mx_m2[fj] > 0),
                                c2 / F.sqrt(mx_m2[fi] * mx_m2[fj]),
                            ),
                        )
                out = out.drop(
                    *[c for c in out.columns
                      if c.startswith(f"__mx_{m.label}_")]
                )
            if isinstance(m, TTestAgg):
                # derive (t, df) from the exact fixed-point sums; ES's
                # p-value is the Student-t CDF of exactly this pair
                # (see the dataclass docstring for the divergence note)
                if m.test_type == "paired":
                    n = F.col(f"__tt_{m.label}_n").cast("double")
                    s1 = F.col(f"__tt_{m.label}_s1").cast("double")
                    s2 = F.col(f"__tt_{m.label}_s2").cast("double")
                    mean = s1 / n
                    var = (s2 - n * mean * mean) / (n - F.lit(1.0))
                    ok = (n >= 2) & (var > 0)
                    t_stat = mean / F.sqrt(var / n)
                    df_val = n - F.lit(1.0)
                else:
                    na = F.col(f"__tt_{m.label}_na").cast("double")
                    nb = F.col(f"__tt_{m.label}_nb").cast("double")
                    ma = F.col(f"__tt_{m.label}_s1a").cast("double") / na
                    mb = F.col(f"__tt_{m.label}_s1b").cast("double") / nb
                    va_ = (
                        F.col(f"__tt_{m.label}_s2a").cast("double")
                        - na * ma * ma
                    ) / (na - F.lit(1.0))
                    vb_ = (
                        F.col(f"__tt_{m.label}_s2b").cast("double")
                        - nb * mb * mb
                    ) / (nb - F.lit(1.0))
                    if m.test_type == "homoscedastic":
                        sp2 = (
                            (na - F.lit(1.0)) * va_
                            + (nb - F.lit(1.0)) * vb_
                        ) / (na + nb - F.lit(2.0))
                        ok = (na >= 2) & (nb >= 2) & (sp2 > 0)
                        t_stat = (ma - mb) / F.sqrt(
                            sp2 * (F.lit(1.0) / na + F.lit(1.0) / nb)
                        )
                        df_val = na + nb - F.lit(2.0)
                    else:  # heteroscedastic (Welch, ES default)
                        sea = va_ / na
                        seb = vb_ / nb
                        se2 = sea + seb
                        ok = (na >= 2) & (nb >= 2) & (se2 > 0)
                        t_stat = (ma - mb) / F.sqrt(se2)
                        df_val = (se2 * se2) / (
                            sea * sea / (na - F.lit(1.0))
                            + seb * seb / (nb - F.lit(1.0))
                        )
                out = out.withColumn(
                    f"{m.label}_t", F.when(ok, t_stat)
                ).withColumn(f"{m.label}_df", F.when(ok, df_val))
                # ES's returned value: the two-sided p — the Student-t
                # CDF of the (t, df) columns just materialized (plain
                # column refs keep the CF expression compact; null
                # t/df propagate).  Pure Column math, inside
                # whole-stage codegen — see functions/stats.py.
                out = out.withColumn(
                    f"{m.label}_p",
                    t_two_sided_p_col(
                        F.col(f"{m.label}_t"), F.col(f"{m.label}_df")
                    ),
                )
                out = out.drop(
                    *[c for c in out.columns
                      if c.startswith(f"__tt_{m.label}_")]
                )
            if isinstance(m, StatsAgg) and m.extended:
                # ES's DOCUMENTED definition: variance =
                # sum_of_squares/count − mean² (population), std = √var
                # — derived here from the exact partials instead of
                # var_pop, so on integral inputs the doubles are
                # bit-identical to any engine replaying the formula
                # (Welford-style var_pop aggregates diverge by ulps)
                cnt = F.col(f"{m.label}_count")
                tot = F.col(f"{m.label}_sum")
                ss = F.col(f"{m.label}_sum_of_squares")
                var = ss / cnt - (tot / cnt) * (tot / cnt)
                out = out.withColumn(f"{m.label}_variance", var).withColumn(
                    f"{m.label}_std_deviation", F.sqrt(var)
                )

        # 3) per-level terms size/order enforcement, outermost first.
        # A TOP-LEVEL terms bucket never uses a window: the windowed
        # relation would be the term × inner-bucket TUPLE table and
        # `Window.partitionBy(F.lit(1))` constant-folds to an EMPTY
        # partition spec — Spark moves the whole relation to one task
        # ("No Partition Defined for Window operation").  Instead the
        # top-N TERMS are picked from the one-row-per-term relation with
        # orderBy().limit() (TakeOrderedAndProject — ≤ size rows, no
        # shuffle concentration) and semi-joined back (broadcast: the
        # survivor side is ≤ size rows by construction).  Nested terms
        # keep the window — its partition spec (the parent bucket keys)
        # is real, so the rank distributes.
        for i, b in enumerate(s.buckets):
            if not isinstance(
                b, (TermsBucket, MultiTermsBucket, GeoGridBucket)
            ):
                continue
            prefix = key_names[:i]
            direction = (lambda c: c.desc()) if b.order == "desc" else (lambda c: c.asc())
            if b.order_by == "_term":
                order_cols = [direction(F.col(b.label))]
                if not prefix:
                    top_terms = (
                        out.select(b.label).distinct().orderBy(*order_cols).limit(b.size)
                    )
                    out = out.join(F.broadcast(top_terms), [b.label], "left_semi")
                    continue
            else:
                op, fld = b.order_metric
                # the ordering metric is computed at THIS bucket's level
                # (over the raw docs), not from leaf partials — matches
                # ES, and stays exact for non-decomposable ops like
                # cardinality
                if op == "cardinality":
                    ord_expr = count_distinct(resolve(fld))
                elif op == "count":
                    ord_expr = F.count(F.lit(1))
                else:
                    ord_expr = {
                        "avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum
                    }[op](resolve(fld).cast("double"))
                lvl = df.groupBy(*[F.col(c) for c in prefix + [b.label]]).agg(
                    ord_expr.alias("__ord")
                )
                order_cols = [direction(F.col("__ord")), F.col(b.label).asc()]
                if not prefix:
                    top_terms = lvl.orderBy(*order_cols).limit(b.size).select(b.label)
                    out = out.join(F.broadcast(top_terms), [b.label], "left_semi")
                    continue
                out = out.join(F.broadcast(lvl), prefix + [b.label], "left")
            w = Window.partitionBy(*[F.col(c) for c in prefix]).orderBy(*order_cols)
            # dense_rank, NOT row_number: the frame rows are bucket
            # TUPLES (this term × every inner bucket), and ES's size
            # keeps the top-N TERMS with all their children.  The order
            # columns are constant within a term and distinct across
            # terms (the term itself is the tiebreak), so dense_rank is
            # exactly the term's rank repeated on each of its rows.
            out = (
                out.withColumn("__rn", F.dense_rank().over(w))
                .filter(F.col("__rn") <= b.size)
                .drop("__rn", "__ord")
            )

        # 4) parent pipeline aggs (round 8): sequence over the
        # INNERMOST histogram/date_histogram buckets, one window per
        # outer-bucket group.  When outer buckets exist the window
        # partitions by them; a bare histogram's window relation is the
        # already-aggregated bucket table (time-span / interval rows,
        # not docs) — the same bounded-by-construction argument as
        # promql_subquery's grid window.
        _sib_ops = SIBLING_OPS.keys() | MULTI_SIBLING_OPS

        def _apply_parents(out: DataFrame, run: list[PipelineAgg]) -> DataFrame:
            seq = [
                b.label
                for b in s.buckets
                if isinstance(b, (DateHistogramBucket, HistogramBucket))
            ]
            if not seq:
                raise ValueError(
                    "kibana: pipeline aggs need a histogram or "
                    "date_histogram bucket"
                )
            seq_label = seq[-1]
            outer = [k for k in key_names if k != seq_label]
            w = Window.partitionBy(*[F.col(c) for c in outer]).orderBy(
                F.col(seq_label).asc()
            )
            for pl in run:
                src = F.col(pl.source_label).cast("double")
                if pl.op == "derivative":
                    expr = src - F.lag(src).over(w)
                elif pl.op == "serial_diff":
                    # ES serial_diff: value minus the value `lag`
                    # buckets earlier (lag=1 ≡ derivative); the first
                    # `lag` buckets emit NULL
                    expr = src - F.lag(src, pl.window).over(w)
                elif pl.op == "cumulative_sum":
                    expr = F.sum(src).over(
                        w.rowsBetween(Window.unboundedPreceding, 0)
                    )
                else:  # moving_* — ES moving_fn shift=0: the window
                    # buckets BEFORE the current one, exclusive
                    mfn = {"moving_avg": F.avg, "moving_max": F.max,
                           "moving_min": F.min, "moving_sum": F.sum}[pl.op]
                    expr = mfn(src).over(w.rowsBetween(-pl.window, -1))
                out = out.withColumn(pl.label, expr)
            return out

        def _apply_siblings(out: DataFrame, run: list[PipelineAgg]) -> DataFrame:
            # sibling pipeline aggs: aggregate a metric ACROSS the
            # innermost bucket level, one value per outer bucket,
            # repeated on each inner row.  Grouped aggregation +
            # broadcast join-back (the sibling side is one row per
            # OUTER bucket — small by construction), never a window:
            # with no outer bucket a window would constant-fold to an
            # empty partition spec and move the whole relation into one
            # task; the global-agg + one-row broadcast shape stays
            # distributed (bnl_join_onerow).
            if not key_names:
                raise ValueError("kibana: sibling pipeline aggs need a bucket agg")
            outer = key_names[:-1]
            aggs_ = []
            pb_extract: list[tuple[str, str, float]] = []
            for pl in run:
                src = F.col(pl.source_label).cast("double")
                if pl.op in ("stats_bucket", "extended_stats_bucket"):
                    names = pl.column_names()
                    aggs_ += [
                        F.count(src).alias(names[0]),
                        F.min(src).alias(names[1]),
                        F.max(src).alias(names[2]),
                        F.avg(src).alias(names[3]),
                        F.sum(src).alias(names[4]),
                    ]
                    if pl.op == "extended_stats_bucket":
                        # POPULATION statistics from exact partials,
                        # the same formulas as the extended_stats
                        # metric agg (ES's definition)
                        n_ = F.count(src).cast("double")
                        ssq = F.sum(src * src)
                        var = ssq / n_ - (F.sum(src) / n_) * (F.sum(src) / n_)
                        aggs_ += [
                            ssq.alias(names[5]),
                            var.alias(names[6]),
                            F.sqrt(var).alias(names[7]),
                        ]
                elif pl.op == "percentiles_bucket":
                    # ES percentiles_bucket does NOT interpolate: it
                    # returns the nearest input value, picked from the
                    # sorted bucket values at index
                    # round(p/100 * (n-1)) (ADVICE r9; the previous
                    # F.percentile linear interpolation could emit
                    # values ES never produces).  Collect the sorted
                    # value array per outer bucket (bounded by the
                    # inner bucket count — sibling inputs are already
                    # aggregated buckets, not raw rows) and select
                    # after the join-back.
                    arr_name = f"__pbarr_{pl.label}"
                    aggs_.append(
                        F.array_sort(F.collect_list(src)).alias(arr_name)
                    )
                    pb_extract += [
                        (arr_name, n, p)
                        for p, n in zip(pl.percents, pl.column_names())
                    ]
                else:
                    aggs_.append(SIBLING_OPS[pl.op](src).alias(pl.label))
            if outer:
                sib = out.groupBy(*[F.col(c) for c in outer]).agg(*aggs_)
                out = out.join(F.broadcast(sib), outer, "left")
            else:
                out = out.crossJoin(F.broadcast(out.agg(*aggs_)))
            for arr_name, col_name, p in pb_extract:
                arr = F.col(arr_name)
                # floor(x + 0.5) is Java's Math.round — the exact ES
                # index formula, identical IEEE ops in the SQL twin
                idx = F.floor(
                    F.lit(p / 100.0) * (F.size(arr) - 1).cast("double")
                    + F.lit(0.5)
                ).cast("int")
                out = out.withColumn(col_name, F.get(arr, idx))
            return out.drop(*{a for a, _, _ in pb_extract})

        def _apply_statstest(
            out: DataFrame, run: list[BucketStatsTestAgg]
        ) -> DataFrame:
            # sibling significance pipelines (round 15): ONE grouped
            # collect of the innermost (key, value) pairs per outer
            # bucket — bucket-table-sized by construction (the
            # percentiles_bucket collect shape, never a window) —
            # broadcast-joined back; correlation / KS formulas are
            # JVM-side higher-order-array Column math over the
            # collected sequence.  Indicator moments (x̄, Σf·e²,
            # cumulative reference CDF) fold to Python constants at
            # compile time: the indicator is a request literal.
            if not key_names:
                raise ValueError(
                    "kibana: bucket_correlation / bucket_count_ks_test "
                    "need a bucket agg"
                )
            seq_label = key_names[-1]
            outer = key_names[:-1]
            aggs_ = []
            for st in run:
                src = F.col(st.source_label).cast("double")
                aggs_.append(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(seq_label).alias("k"),
                                src.alias("v"),
                            )
                        )
                    ).alias(f"__bst_{st.label}_arr")
                )
            if outer:
                sib = out.groupBy(*[F.col(c) for c in outer]).agg(*aggs_)
                out = out.join(F.broadcast(sib), outer, "left")
            else:
                out = out.crossJoin(F.broadcast(out.agg(*aggs_)))
            drop: list[str] = []
            for st in run:
                arr = F.col(f"__bst_{st.label}_arr")
                drop += [f"__bst_{st.label}_arr", f"__bst_{st.label}_n"]
                vals = F.transform(arr, lambda s: s["v"])
                # the total folds over the KEY-SORTED array — a fixed
                # summation order, so non-integral metric paths stay
                # bit-deterministic where F.sum would be partition-
                # order-dependent
                out = out.withColumn(
                    f"__bst_{st.label}_n",
                    F.aggregate(vals, F.lit(0.0), lambda a, v: a + v),
                )
                n = F.col(f"__bst_{st.label}_n")
                if st.op == "bucket_correlation":
                    mlen = len(st.expectations)
                    fs = st.fractions or tuple(1.0 / mlen
                                               for _ in range(mlen))
                    fsum = sum(fs)
                    fs = tuple(f_ / fsum for f_ in fs)
                    xmean = sum(
                        f_ * e for f_, e in zip(fs, st.expectations)
                    )
                    xvar = sum(
                        f_ * e * e for f_, e in zip(fs, st.expectations)
                    ) - xmean * xmean
                    nn = float(st.doc_count)
                    exp_arr = F.array(
                        *[F.lit(float(e)) for e in st.expectations]
                    )
                    sxy = F.aggregate(
                        F.zip_with(vals, exp_arr, lambda v, e: v * e),
                        F.lit(0.0),
                        lambda acc, z: acc + z,
                    )
                    ymean = n / F.lit(nn)
                    cov = sxy / F.lit(nn) - F.lit(xmean) * ymean
                    yvar = ymean * (F.lit(1.0) - ymean)
                    ok = (
                        (F.size(arr) == F.lit(mlen))
                        & F.lit(xvar > 0)
                        & (n > 0) & (n < F.lit(nn))
                    )
                    out = out.withColumn(
                        st.label,
                        F.when(ok, cov / F.sqrt(F.lit(xvar) * yvar)),
                    )
                    continue
                # bucket_count_ks_test: running ECDF-vs-reference max
                # deviations in ONE array fold (acc = index, running
                # count, D+, D-)
                if st.fractions:
                    tot = sum(st.fractions)
                    cum, tcdf = 0.0, []
                    for f_ in st.fractions:
                        cum += f_
                        tcdf.append(cum / tot)
                    tcdf_arr = F.array(*[F.lit(x) for x in tcdf])
                    size_ok = F.size(arr) == F.lit(len(st.fractions))

                    def _tc(j, _ta=tcdf_arr):  # j: 1-based element idx
                        return F.element_at(_ta, j)
                else:
                    size_ok = F.size(arr) > 0

                    def _tc(j, _a=arr):
                        return j.cast("double") / F.size(_a).cast(
                            "double"
                        )

                # acc["i"] = 1-based index of the element being folded
                zero = F.struct(
                    F.lit(1).alias("i"), F.lit(0.0).alias("c"),
                    F.lit(-1.0).alias("dp"), F.lit(-1.0).alias("dm"),
                )

                def _make_step(_n, _tcf):
                    # factory binds the total + reference-CDF lookup:
                    # pyspark counts a lambda's parameters, so default-
                    # arg closures would mis-arity the HOF callback
                    def _step(acc, v):
                        ec = (acc["c"] + v) / _n
                        tc = _tcf(acc["i"])
                        return F.struct(
                            (acc["i"] + 1).alias("i"),
                            (acc["c"] + v).alias("c"),
                            F.greatest(acc["dp"], ec - tc).alias("dp"),
                            F.greatest(acc["dm"], tc - ec).alias("dm"),
                        )

                    return _step

                res = F.aggregate(vals, zero, _make_step(n, _tc))
                ok = size_ok & (n > 0)

                # the fold result binds as a lambda leaf: inlined, the
                # two_sided Kolmogorov series would embed the whole
                # fold in each of its ~40 terms (codegen-tree blowup —
                # see _bind1)
                def _make_ks_p(_n, _alts):
                    def _ks_p(s):  # arity 1: pyspark HOF callback
                        dp, dm = s["dp"], s["dm"]
                        lam = F.sqrt(_n) * F.greatest(dp, dm)
                        cols = []
                        for alt in _alts:
                            if alt == "greater":
                                p = F.exp(F.lit(-2.0) * _n * dp * dp)
                            elif alt == "less":
                                p = F.exp(F.lit(-2.0) * _n * dm * dm)
                            else:
                                p = ks_two_sided_p_col(lam)
                            cols.append(
                                F.least(p, F.lit(1.0)).alias(alt)
                            )
                        return F.struct(*cols)

                    return _ks_p

                ps = _bind1(res, _make_ks_p(n, st.alternatives))
                for alt in st.alternatives:
                    out = out.withColumn(
                        f"{st.label}_{alt}", F.when(ok, ps[alt])
                    )
            return out.drop(*drop)

        def _apply_cumcard(out: DataFrame, run: list[PipelineAgg]) -> DataFrame:
            # ES cumulative_cardinality (round 13), exact: a value
            # contributes +1 in its FIRST-seen innermost bucket per
            # outer group; the running distinct count is the
            # cumulative sum of those first-seen counts over the
            # histogram sequence.  Two value-keyed aggregations (the
            # same doc-scale cost class as the cardinality agg it
            # reads) + a bucket-table window — the window relation is
            # the aggregated bucket table, the _apply_parents
            # bounded-by-construction argument.
            if not key_names or not isinstance(
                s.buckets[-1], (DateHistogramBucket, HistogramBucket)
            ):
                raise ValueError(
                    "kibana: cumulative_cardinality needs an innermost "
                    "histogram/date_histogram bucket"
                )
            if any(
                sc.op == "bucket_selector" and sc.seq < min(pl.seq for pl in run)
                for sc in s.scripts
            ):
                raise ValueError(
                    "kibana: cumulative_cardinality after a "
                    "bucket_selector is not supported — the running "
                    "count would disagree with the surviving buckets"
                )
            seq_label = key_names[-1]
            outer = key_names[:-1]
            w = Window.partitionBy(*[F.col(c) for c in outer]).orderBy(
                F.col(seq_label).asc()
            ).rowsBetween(Window.unboundedPreceding, 0)
            # first-seen buckets are computed against the SURVIVING
            # bucket keys, not the raw doc frame: a min_doc_count>=2
            # histogram can drop the bucket where a value first
            # appeared, and ES — merging the per-RETURNED-bucket HLL
            # sketches cumulatively — counts that value in its first
            # surviving bucket instead of never (ADVICE r13).  The
            # surviving-key relation is bucket-table-sized: broadcast.
            surviving = F.broadcast(
                out.select(
                    *[F.col(c) for c in outer + [seq_label]]
                ).distinct()
            )
            for pl in run:
                m = next(
                    mm for mm in s.metrics
                    if isinstance(mm, MetricAgg)
                    and mm.label == pl.source_label
                )
                val = resolve(m.field)
                first = df.filter(val.isNotNull()).join(
                    surviving, outer + [seq_label], "semi"
                ).groupBy(
                    *[F.col(c) for c in outer], val.alias("__cc_v")
                ).agg(F.min(F.col(seq_label)).alias(seq_label))
                news = first.groupBy(
                    *[F.col(c) for c in outer + [seq_label]]
                ).agg(F.count(F.lit(1)).alias("__cc_new"))
                out = out.join(news, outer + [seq_label], "left")
                out = out.withColumn(
                    pl.label,
                    F.sum(F.coalesce(F.col("__cc_new"), F.lit(0))).over(w),
                ).drop("__cc_new")
            return out

        def _apply_movperc(out: DataFrame, run: list[PipelineAgg]) -> DataFrame:
            # ES moving_percentiles (round 14): slide a window across
            # the innermost histogram's RETURNED bucket sequence and
            # report the window's percentiles.  ES merges the
            # per-bucket t-digest sketches; this engine is EXACT,
            # recomputing interpolated percentiles over the raw doc
            # values of the window's buckets — the documented
            # exact-vs-approx stance (percentiles / cumulative_
            # cardinality).  moving_fn shift semantics: shift=0 → the
            # `window` buckets BEFORE the current one, exclusive;
            # shift=window includes the current bucket.
            #
            # Scale shape: the bucket-index map is bucket-table-sized
            # (broadcast); each doc explodes into <= window target
            # indices (bounded fan-out — the window param is the
            # documented amplification factor), then ONE grouped
            # percentile per (outer, target) key.  Empty windows emit
            # null.  Indexing over the SURVIVING bucket table means a
            # min_doc_count cut or earlier bucket_selector shortens
            # the sequence exactly as ES's pipeline (which runs on the
            # returned buckets) sees it.
            if not key_names or not isinstance(
                s.buckets[-1], (DateHistogramBucket, HistogramBucket)
            ):
                raise ValueError(
                    "kibana: moving_percentiles needs an innermost "
                    "histogram/date_histogram bucket"
                )
            seq_label = key_names[-1]
            outer = key_names[:-1]
            w_idx = Window.partitionBy(
                *[F.col(c) for c in outer]
            ).orderBy(F.col(seq_label).asc())
            out = out.withColumn("__mp_i", F.row_number().over(w_idx))
            idx = F.broadcast(
                out.select(
                    *[F.col(c) for c in outer + [seq_label, "__mp_i"]]
                )
            )
            for pl in run:
                shift = int(pl.op.split(":", 1)[1])
                m = next(
                    mm for mm in s.metrics
                    if isinstance(mm, PercentilesAgg)
                    and mm.label == pl.source_label
                )
                val = resolve(m.field).cast("double")
                docs = df.filter(val.isNotNull()).withColumn(
                    "__mp_v", val
                ).join(idx, outer + [seq_label])
                # a doc in bucket index j serves result buckets
                # i ∈ [j+1-shift, j+window-shift]
                tgt = docs.withColumn(
                    "__mp_t",
                    F.explode(
                        F.sequence(
                            F.col("__mp_i") + F.lit(1 - shift),
                            F.col("__mp_i") + F.lit(pl.window - shift),
                        )
                    ),
                )
                per = tgt.groupBy(
                    *[F.col(c) for c in outer],
                    F.col("__mp_t").alias("__mp_i"),
                ).agg(
                    F.percentile(
                        F.col("__mp_v"),
                        F.array(*[F.lit(p_ / 100.0) for p_ in m.percents]),
                    ).alias("__mp_arr")
                )
                out = out.join(per, outer + ["__mp_i"], "left")
                for k_, name in enumerate(pl.column_names()):
                    out = out.withColumn(
                        name, F.col("__mp_arr").getItem(k_)
                    )
                out = out.drop("__mp_arr")
            return out.drop("__mp_i")

        def _apply_normalize(out: DataFrame, run: list[PipelineAgg]) -> DataFrame:
            # ES normalize (round 13): rescale each bucket's metric by
            # level statistics computed ACROSS the innermost bucket
            # level per outer bucket.  Same distributed shape as the
            # sibling aggs — one grouped aggregation over the bucket
            # table joined back (broadcast-safe: one row per OUTER
            # bucket), never an unpartitioned window.  Only the
            # statistics the batched methods need are aggregated;
            # degenerate denominators emit null.
            if not key_names:
                raise ValueError("kibana: normalize needs a bucket agg")
            outer = key_names[:-1]
            aggs_ = []
            for pl in run:
                src = F.col(pl.source_label).cast("double")
                method = pl.op.split(":", 1)[1]
                t = f"__nz_{pl.label}"
                if method in ("rescale_0_1", "rescale_0_100", "mean"):
                    aggs_ += [F.min(src).alias(f"{t}_min"),
                              F.max(src).alias(f"{t}_max")]
                if method in ("mean", "z-score"):
                    aggs_.append(F.avg(src).alias(f"{t}_avg"))
                if method == "z-score":
                    aggs_.append(F.stddev_pop(src).alias(f"{t}_std"))
                if method == "percent_of_sum":
                    aggs_.append(F.sum(src).alias(f"{t}_sum"))
                if method == "softmax":
                    aggs_.append(F.sum(F.exp(src)).alias(f"{t}_esum"))
            if outer:
                lvl = out.groupBy(*[F.col(c) for c in outer]).agg(*aggs_)
                out = out.join(F.broadcast(lvl), outer, "left")
            else:
                out = out.crossJoin(F.broadcast(out.agg(*aggs_)))
            drop: set[str] = set()
            for pl in run:
                src = F.col(pl.source_label).cast("double")
                method = pl.op.split(":", 1)[1]
                t = f"__nz_{pl.label}"
                if method in ("rescale_0_1", "rescale_0_100", "mean"):
                    rng = F.col(f"{t}_max") - F.col(f"{t}_min")
                    num = (
                        src - F.col(f"{t}_avg")
                        if method == "mean"
                        else src - F.col(f"{t}_min")
                    )
                    expr = F.when(rng != 0, num / rng)
                    if method == "rescale_0_100":
                        expr = expr * F.lit(100.0)
                    drop |= {f"{t}_min", f"{t}_max"}
                    if method == "mean":
                        drop.add(f"{t}_avg")
                elif method == "z-score":
                    expr = F.when(
                        F.col(f"{t}_std") != 0,
                        (src - F.col(f"{t}_avg")) / F.col(f"{t}_std"),
                    )
                    drop |= {f"{t}_avg", f"{t}_std"}
                elif method == "percent_of_sum":
                    expr = F.when(
                        F.col(f"{t}_sum") != 0, src / F.col(f"{t}_sum")
                    )
                    drop.add(f"{t}_sum")
                else:  # softmax
                    expr = F.when(
                        F.col(f"{t}_esum") != 0, F.exp(src) / F.col(f"{t}_esum")
                    )
                    drop.add(f"{t}_esum")
                out = out.withColumn(pl.label, expr)
            return out.drop(*drop)

        # 3b) rare_terms: keep the keys whose TOTAL doc count within
        # their parent bucket is ≤ max_doc_count.  An INNERMOST rare
        # bucket needs no extra pass: the main aggregation's groups ARE
        # the rare level, so its doc count rode along as a hidden
        # column (see step 2).  A rare bucket with buckets nested
        # BELOW it counts its own-level snapshot frame instead (inner
        # explodes/filters must not distort the count) and joins back
        # KEY-KEYED: the qualifying set is the LONG TAIL — potentially
        # MOST keys — so unlike the top-N semi-join above (survivor
        # side provably ≤ size rows) nothing here may broadcast; the
        # optimizer picks the strategy (AQE-safe at any cardinality).
        for i, b in enumerate(s.buckets):
            if not isinstance(b, RareTermsBucket):
                continue
            rt_col = f"__rt_{b.label}"
            if rt_col in out.columns:
                out = out.filter(
                    F.col(rt_col) <= b.max_doc_count
                ).drop(rt_col)
                continue
            prefix = key_names[:i]
            lvl = rare_src[b.label].groupBy(
                *[F.col(c) for c in prefix + [b.label]]
            ).agg(F.count(F.lit(1)).alias("__rt"))
            out = (
                out.join(lvl, prefix + [b.label], "left")
                .filter(F.col("__rt") <= b.max_doc_count)
                .drop("__rt")
            )

        # 3c) (date_)histogram min_doc_count (round 12).  >= 2: keep
        # buckets whose OWN-LEVEL doc count reaches the threshold,
        # ES's filter applied before pipeline aggs see the frame.  The
        # count is the window-sum of leaf counts over the keys up to
        # this bucket when nothing below can drop rows (exact: no
        # exploding bucket sits below, validated at step 2), else a
        # pre-cut level count joined from the mdc_src snapshot
        # (ADVICE r12: inner size cuts / null drops must not shrink
        # the histogram's own doc count).  == 0:
        # ZERO-FILL the innermost histogram — per parent bucket,
        # generate the full key grid between the first and last
        # populated key (exactly ES's fill span without
        # extended_bounds), left-join the real rows on, and give empty
        # buckets doc_count/cardinality/sum 0 with every other metric
        # null (ES's empty-bucket values).  The grid is bounded by
        # span/interval per parent — bucket-table-sized, never
        # doc-sized; pipelines below then run over the filled grid,
        # deriving the same values ES derives across empty buckets.
        for i, b in mdc_buckets:
            cnt_col = f"__mdc_{b.label}"
            if b.min_doc_count >= 2:
                lvl_keys = key_names[: i + 1]
                if b.label in mdc_src:
                    # inner buckets can DROP rows (terms/multi_terms
                    # size cut or null-key filter, rare_terms long
                    # tail, histogram null drop) — the leaf window-sum
                    # would undercount, so the level count comes from
                    # the pre-cut snapshot taken at this bucket's
                    # level (ADVICE r12).  Level-bucket-sized relation
                    # joined on the level keys; like rare_terms, the
                    # qualifying side is unbounded (a time axis), so
                    # no forced broadcast — AQE picks the strategy.
                    lvl = mdc_src[b.label].groupBy(
                        *[F.col(k) for k in lvl_keys]
                    ).agg(F.count(F.lit(1)).alias("__lvl"))
                    out = (
                        out.join(lvl, lvl_keys, "left")
                        .filter(F.col("__lvl") >= b.min_doc_count)
                        .drop("__lvl", cnt_col)
                    )
                    continue
                lvl_cnt = (
                    F.col(cnt_col)
                    if lvl_keys == key_names
                    else F.sum(cnt_col).over(
                        Window.partitionBy(*[F.col(k) for k in lvl_keys])
                    )
                )
                out = out.withColumn("__lvl", lvl_cnt).filter(
                    F.col("__lvl") >= b.min_doc_count
                ).drop("__lvl", cnt_col)
                continue
            # min_doc_count == 0: zero-fill (b is innermost)
            out = out.drop(cnt_col)
            prefix = key_names[:-1]
            gb = (
                out.groupBy(*[F.col(k) for k in prefix])
                if prefix
                else out.groupBy()
            )
            if isinstance(b, DateHistogramBucket):
                step = resolved_interval_us[b.label]
                lo_agg = F.unix_micros(F.min(b.label))
                hi_agg = F.unix_micros(F.max(b.label))
                if b.extended_bounds is not None:
                    # ES: buckets cover the union of the populated span
                    # and the (interval-floored) extended bounds
                    eb_lo, eb_hi = (
                        (x // step) * step for x in b.extended_bounds
                    )
                    lo_agg = F.least(lo_agg, F.lit(eb_lo))
                    hi_agg = F.greatest(hi_agg, F.lit(eb_hi))
                bounds = gb.agg(
                    lo_agg.alias("__lo"), hi_agg.alias("__hi")
                )
                grid = bounds.select(
                    *prefix,
                    F.explode(
                        F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
                    ).alias("__g"),
                ).select(
                    *prefix, F.timestamp_micros(F.col("__g")).alias(b.label)
                )
            else:
                iv = float(b.interval)
                # reconstruct keys with the SAME double op as the
                # bucketing formula (ordinal · interval), so the join
                # hits populated keys bit-for-bit
                m0_agg = F.round(F.min(b.label) / F.lit(iv)).cast("long")
                m1_agg = F.round(F.max(b.label) / F.lit(iv)).cast("long")
                if b.extended_bounds is not None:
                    import math as _math

                    m0_agg = F.least(
                        m0_agg,
                        F.lit(int(_math.floor(b.extended_bounds[0] / iv))),
                    )
                    m1_agg = F.greatest(
                        m1_agg,
                        F.lit(int(_math.floor(b.extended_bounds[1] / iv))),
                    )
                bounds = gb.agg(
                    m0_agg.alias("__m0"), m1_agg.alias("__m1")
                )
                grid = bounds.select(
                    *prefix,
                    F.explode(
                        F.sequence(F.col("__m0"), F.col("__m1"))
                    ).alias("__m"),
                ).select(
                    *prefix,
                    (F.col("__m").cast("double") * F.lit(iv)).alias(b.label),
                )
            out_cols = out.columns
            filled = grid.join(out, prefix + [b.label], "left")
            dtypes = dict(filled.dtypes)
            zero_names: list[str] = []
            for m in metrics:
                if isinstance(m, MetricAgg) and m.op in (
                    # count-family aggs: ES returns 0 (not null) on an
                    # empty bucket — value_count included (ADVICE r12)
                    "count", "cardinality", "sum", "value_count"
                ):
                    zero_names.append(m.label)
                elif isinstance(m, RateAgg):
                    # count/sum-family: an empty bucket rates 0 (ES)
                    zero_names.append(m.label)
                elif isinstance(m, StringStatsAgg):
                    zero_names.append(m.column_names()[0])
                elif isinstance(m, StatsAgg):
                    cn = m.column_names()
                    zero_names += [cn[0], cn[4]] + (
                        [cn[5]] if m.extended else []
                    )
            for n_ in zero_names:
                filled = filled.withColumn(
                    n_, F.coalesce(F.col(n_), F.lit(0).cast(dtypes[n_]))
                )
            out = filled.select(*[F.col(c) for c in out_cols])

        # 4) same-level pipeline reduction in REQUEST order (round
        # 11.5 — previously a fixed parents → siblings → scripts →
        # selectors phase order, a documented divergence since ADVICE
        # r9): ES reduces same-level pipeline aggs in the order the
        # request declares them, so a bucket_selector declared before
        # a sibling agg (stats_bucket/avg_bucket/...) filters that
        # sibling's input, and a selector before a derivative leaves
        # gaps its lag window then skips over.  Consecutive runs of
        # the same kind batch into one window pass / one grouped
        # aggregation, so a request in the classic order compiles to
        # the identical plan (and values) the fixed phases produced.
        #
        # Parent windows: sequence over the INNERMOST histogram /
        # date_histogram buckets, one window per outer-bucket group.
        # When outer buckets exist the window partitions by them; a
        # bare histogram's window relation is the already-aggregated
        # bucket table (time-span / interval rows, not docs) — the
        # same bounded-by-construction argument as promql_subquery's
        # grid window.
        stages: list[tuple[str, object]] = sorted(
            [
                (
                    "sibling" if pl.op in _sib_ops
                    else "normalize" if pl.op.startswith("normalize:")
                    else "cumcard" if pl.op == "cumulative_cardinality"
                    else "movperc"
                    if pl.op.startswith("moving_percentiles:")
                    else "parent",
                    pl,
                )
                for pl in s.pipelines
            ]
            + [(sc.op, sc) for sc in s.scripts]
            + [("statstest", st) for st in s.stats_pipelines],
            key=lambda t: t[1].seq,
        )
        i = 0
        while i < len(stages):
            kind, stage = stages[i]
            if kind in ("parent", "sibling", "normalize", "cumcard",
                        "movperc", "statstest"):
                run = [stage]
                while i + 1 < len(stages) and stages[i + 1][0] == kind:
                    i += 1
                    run.append(stages[i][1])
                out = (
                    _apply_parents(out, run)
                    if kind == "parent"
                    else _apply_siblings(out, run)
                    if kind == "sibling"
                    else _apply_normalize(out, run)
                    if kind == "normalize"
                    else _apply_cumcard(out, run)
                    if kind == "cumcard"
                    else _apply_movperc(out, run)
                    if kind == "movperc"
                    else _apply_statstest(out, run)
                )
            elif kind == "bucket_script":
                # per-bucket painless arithmetic over sibling metric
                # values — pure Column expression: scan-local, no
                # shuffle, no Python
                out = out.withColumn(
                    stage.label,
                    compile_bucket_script(stage.script, dict(stage.paths)),
                )
            else:  # bucket_selector — gap_policy skip: null script
                # inputs drop the bucket
                pred = compile_bucket_script(stage.script, dict(stage.paths))
                out = out.filter(pred.cast("boolean"))
            i += 1

        # 4c) bucket_sort: order the innermost buckets per outer bucket
        # and keep [from_, from_+size).  Computed AFTER sibling aggs —
        # ES's truncation is response-shaping only.  Nested: row_number
        # over the outer partition (distributed, one rank per outer
        # group).  Top-level: TakeOrdered limit(from+size) — never a
        # global window over the full relation — then a rank over the
        # ≤ from+size survivors only when an offset must be dropped.
        if s.bucket_sort is not None:
            bs = s.bucket_sort
            if not key_names:
                raise ValueError("kibana: bucket_sort needs a bucket agg")
            inner_label = key_names[-1]
            sort_col = (
                F.col(inner_label) if bs.sort_label == "_key"
                else F.col(bs.sort_label)
            )
            direction = sort_col.desc() if bs.order == "desc" else sort_col.asc()
            order_cols = [direction, F.col(inner_label).asc()]
            outer = key_names[:-1]
            if outer:
                w = Window.partitionBy(*[F.col(c) for c in outer]).orderBy(
                    *order_cols
                )
                out = (
                    out.withColumn("__bs", F.row_number().over(w))
                    .filter(
                        (F.col("__bs") > bs.from_)
                        & (F.col("__bs") <= bs.from_ + bs.size)
                    )
                    .drop("__bs")
                )
            else:
                out = out.orderBy(*order_cols).limit(bs.from_ + bs.size)
                if bs.from_:
                    w = Window.orderBy(*order_cols)
                    out = (
                        out.withColumn("__bs", F.row_number().over(w))
                        .filter(F.col("__bs") > bs.from_)
                        .drop("__bs")
                    )

        final_cols: list[Column] = [F.col(k) for k in key_names]
        for m in metrics:
            if isinstance(m, PercentilesAgg):
                final_cols.extend(
                    F.col(m.label).getItem(i).alias(name)
                    for i, name in enumerate(m.column_names())
                )
            elif isinstance(
                m, (StatsAgg, PercentileRanksAgg, BoxplotAgg, TopMetricsAgg,
                    StringStatsAgg, MatrixStatsAgg, TTestAgg,
                    GeoBoundsAgg, GeoCentroidAgg)
            ):
                final_cols.extend(F.col(n) for n in m.column_names())
            else:
                final_cols.append(F.col(m.label))
        final_cols.extend(
            F.col(n) for pl in s.pipelines for n in pl.column_names()
        )
        final_cols.extend(
            F.col(n)
            for st in s.stats_pipelines
            for n in st.column_names()
        )
        final_cols.extend(
            F.col(sc.label) for sc in s.scripts if sc.op == "bucket_script"
        )
        return out.select(*final_cols)


def _to_us(x) -> int:
    """Epoch micros from a datetime or epoch-seconds number."""
    import datetime as _dt

    if isinstance(x, _dt.datetime):
        if x.tzinfo is None:
            x = x.replace(tzinfo=_dt.timezone.utc)
        return int(round(x.timestamp() * 1_000_000))
    return int(round(float(x) * 1_000_000))


def compile_visualization(saved_object: dict) -> KibanaPlan:
    """Compile one exported visualization saved-object (the elements of
    ELK/jmx_dashboard.json with ``_type == "visualization"``)."""
    src = saved_object.get("_source", saved_object)
    return KibanaPlan(parse_vis_state(src["visState"]))


# ---------------------------------------------------------------------------
# field resolution + query_string subset
# ---------------------------------------------------------------------------
def _default_resolver(df: DataFrame):
    cols = set(df.columns)

    def resolve(field: str) -> Column:
        base = field[: -len(".keyword")] if field.endswith(".keyword") else field
        if base in cols:
            return F.col(f"`{base}`")
        if "." in base:
            root, rest = base.split(".", 1)
            if root in cols:
                # struct path or map lookup on a flattened-attrs column
                return F.col(root)[rest]
        raise ValueError(f"kibana: cannot resolve field {field!r}")

    return resolve


def _query_string_pred(
    q: str, resolve, df: DataFrame, default_search_field: str | None
) -> Column:
    """Lucene query_string subset → one boolean Column.

    The two original forms match FIRST, verbatim (``field: value`` with
    the value running to end-of-string — multi-word unquoted values
    keep working — and a bare ``"phrase"`` against the default search
    field); anything else parses as the boolean grammar added in
    round 9: ``AND``/``OR``/``NOT``/parentheses over terms
    ``field:value``, ``field:"exact phrase"``, ``field:prefix*``,
    ``field:*`` (existence), ``field:>n / >=n / <n / <=n`` (numeric),
    and ``field:[a TO b]`` (inclusive range) — the operators real
    Kibana search bars (and significant_terms foregrounds) use.

    Round 10 completes the Lucene term syntax:

    - **wildcards** anywhere in the value (``foo*bar``, ``fo?o``,
      ``*log``): ``*``/``?`` compile to an anchored regex — a
      non-trailing ``*`` previously fell through to silent literal
      equality (ADVICE r9); leading wildcards are allowed, matching
      query_string's ``allow_leading_wildcard`` default;
    - **fuzzy** ``value~`` / ``value~N`` (N ≤ 2, Lucene's cap): edit
      distance on the whole keyword value, like every term match in
      this subset.  Round 11: restricted Damerau-Levenshtein (optimal
      string alignment — adjacent transposition costs 1), the metric
      Lucene's fuzzy automata implement, so ``ab~1`` matches ``ba``;
      see ``functions.scalars.osa_distance``;
    - **proximity** ``"w1 w2"~N``: sloppy-phrase match with ONE
      phrase-wide slop budget (regex-compiled, so it stays a
      scan-local JVM predicate).  Out-of-order matches for phrases of
      ANY length (round 11 capped this at 4 words; 11.5 removed the
      cap) — each permutation of the words costs its total
      displacement (Σ|position moved|; an adjacent transposition
      costs 2, Lucene's documented sloppy-phrase cost) and may spend
      the remaining budget on intervening words.  Words match on
      Unicode token boundaries (``[^\\p{L}\\p{N}_]`` edges — ``\\b``
      is ASCII-only in both evaluating engines), not raw substrings
      (ADVICE r10: ``"error disk"~1`` must not match ``terror
      disk``).  Word-count × slop combos whose expansion passes the
      500-branch bound raise loudly;
    - **boost** ``term^2``: parsed and DROPPED.  In a filter context
      ES computes no scores, so ignoring the boost is the exact
      behavior, not an approximation.  Boosts on parenthesized groups
      are not lexed (errors loudly)."""
    q = q.strip()
    m = re.fullmatch(r'([\w.@-]+)\s*:\s*"?([^"]+)"?', q)
    if (
        m
        and not re.search(r"\b(AND|OR|NOT)\b|[()]", q)
        # range/comparison/wildcard/fuzzy/boost/existence values belong
        # to the grammar, not the legacy literal-equality fast path
        and not re.fullmatch(r"\[.*\]|[<>]=?.*|.*[*?~^].*", m.group(2).strip())
    ):
        return resolve(m.group(1)).cast("string") == m.group(2)
    m = re.fullmatch(r'"([^"]*)"', q)
    if m:
        if not default_search_field:
            raise ValueError(
                f"kibana: bare-phrase query_string {q!r} needs default_search_field"
            )
        # token-boundary phrase match, slop 0 (round 11, ADVICE r10 —
        # Lucene analyzes phrases into tokens; '"RUN"' must not match
        # 'RUNNING' as a raw substring)
        return _qs_proximity(
            resolve(default_search_field).cast("string"), m.group(1), 0
        )
    return _qs_parse(q, resolve, default_search_field)


_QS_SUFFIX = r"(?:~\d*)?(?:\^\d+(?:\.\d+)?)?"
_QS_TOKEN_RE = re.compile(
    r"\s*(\(|\)|AND\b|OR\b|NOT\b"
    r'|[\w.@-]+\s*:\s*(?:"[^"]*"' + _QS_SUFFIX + r"|\[[^\]]+\]|[^\s()]+)"
    r'|"[^"]*"' + _QS_SUFFIX + r")"
)


def _qs_wildcard_regex(val: str) -> str:
    """Lucene wildcard value → anchored regex (``*`` → ``.*``, ``?`` →
    ``.``, everything else escaped).  The tokens used here (escapes,
    ``.*``, anchors) mean the same thing to Spark's rlike
    (java.util.regex) and DuckDB's regexp_matches (RE2), so oracle
    twins replay the identical pattern."""
    out = ["^"]
    for ch in val:
        out.append(".*" if ch == "*" else "." if ch == "?" else re.escape(ch))
    out.append("$")
    return "".join(out)


# Unicode word-character class shared by every token-boundary and gap
# pattern below.  java.util.regex and RE2 both spell Unicode general
# categories \p{L} / \p{N} identically (including inside character
# classes), so oracle twins replay the identical pattern — unlike \w /
# \W / \b, which BOTH engines evaluate ASCII-only (the earlier round-11
# state of this module used \b and therefore matched non-ASCII-edged
# words leniently; this removes that divergence).  Underscore joins
# words like Lucene's StandardTokenizer (UAX#29 ExtendNumLet).
_QS_WORD = r"[\p{L}\p{N}_]"
_QS_NONWORD = r"[^\p{L}\p{N}_]"


def _qs_is_word_char(ch: str) -> bool:
    """Mirror of _QS_WORD for the boundary-emit decision — must agree
    with what the EVALUATING engines consider a word character, which
    python's Unicode ``\\w`` does not quite (it admits marks the
    \\p{L}\\p{N} class rejects)."""
    return ch == "_" or unicodedata.category(ch)[0] in ("L", "N")


def _qs_boundary(word: str, side: str) -> str:
    """Token-boundary assertion for one edge of an escaped word —
    emitted only when the edge character is a word character (a
    boundary against a symbol edge would invert the test).  ADVICE
    r10: without this, phrase words matched as raw substrings ('error
    disk' inside 'terror disk').

    ``\\b`` is ASCII-only in both evaluating engines (java.util.regex
    without UNICODE_CHARACTER_CLASS, RE2 always) and RE2 has no
    lookaround, so the boundary is a CONSUMING alternation over the
    Unicode word class instead: ``(?:^|[^\\p{L}\\p{N}_])`` anchors or
    eats exactly one separator character.  Consuming is safe because
    every caller runs an unanchored substring search (rlike /
    regexp_matches) and the assertion sits at the pattern edge, where
    nothing else needs the consumed character."""
    raw = re.sub(r"\\(.)", r"\1", word)  # unescape to inspect edges
    if not raw:
        return word
    if side == "left":
        return (
            (f"(?:^|{_QS_NONWORD})" + word) if _qs_is_word_char(raw[0]) else word
        )
    return (
        (word + f"(?:$|{_QS_NONWORD})") if _qs_is_word_char(raw[-1]) else word
    )


def _qs_branch_count(n_gaps: int, budget: int) -> int:
    """Branches _qs_ordered_slop_regex emits for one word order: the
    compositions of ≤ budget over the first n_gaps-1 gaps (the last
    gap absorbs the remainder as a range) — stars and bars."""
    return math.comb(budget + n_gaps - 1, max(n_gaps - 1, 0))


def _qs_compositions(n_slots: int, budget: int):
    """Tuples of ``n_slots`` non-negative ints with sum ≤ ``budget``,
    in lexicographic order (the order the r10 product() enumeration
    emitted the surviving tuples, so alternation order is stable).
    Work is proportional to OUTPUT size — the caller bounds that
    arithmetically via _qs_branch_count, so a hostile slop never
    drives a (budget+1)^k loop (code-review r10: 'a b c'~1e8 hung the
    driver building ~1e8 branch strings)."""
    if n_slots == 0:
        yield ()
        return
    for head in range(budget + 1):
        for tail in _qs_compositions(n_slots - 1, budget - head):
            yield (head,) + tail


def _qs_ordered_slop_regex(words: list[str], budget: int) -> str:
    """Ordered sloppy-phrase regex with a TOTAL intervening-word budget
    shared across all gaps — Lucene's slop is one phrase-wide budget,
    not a per-gap allowance (code-review r10: `"a b c"~1` must NOT
    match 'a x b y c', which spends 2).  The first k-2 gaps enumerate
    exact counts (alternation over the compositions of the budget) and
    the last gap takes the remainder as a {0,rest} range; for two-word
    phrases this degenerates to the single-branch {0,budget} form.
    The first and last words carry token-boundary assertions; interior
    word edges are already bounded by the mandatory Unicode-separator
    gaps (``[^\\p{L}\\p{N}_]+``, which also makes intervening-word
    counting tokenize non-ASCII words as ONE word, like Lucene's
    analyzer — ASCII ``\\w``/``\\W`` counted 'héllo' as two)."""
    words = [
        _qs_boundary(w, "left") if k == 0 else w for k, w in enumerate(words)
    ]
    words = [
        _qs_boundary(w, "right") if k == len(words) - 1 else w
        for k, w in enumerate(words)
    ]
    n_gaps = len(words) - 1
    if _qs_branch_count(n_gaps, budget) > 500:
        raise ValueError(
            f"kibana: proximity phrase of {len(words)} words with slop "
            f"{budget} expands past the supported regex size"
        )
    branches = []
    for lead in _qs_compositions(n_gaps - 1, budget):
        used = sum(lead)
        gaps = [rf"{_QS_NONWORD}+(?:{_QS_WORD}+{_QS_NONWORD}+){{{g}}}" for g in lead]
        gaps.append(
            rf"{_QS_NONWORD}+(?:{_QS_WORD}+{_QS_NONWORD}+){{0,{budget - used}}}"
        )
        branches.append("".join(w + g for w, g in zip(words, gaps)) + words[-1])
    return "|".join(branches) if len(branches) == 1 else "(?:" + "|".join(branches) + ")"


def _qs_displacement_orders(n: int, slop: int):
    """Permutations of ``range(n)`` whose total displacement
    ``Σ_k |σ[k] − k|`` is ≤ slop, yielded as (perm, cost) in
    lexicographic order (identity first).  An explicit-stack DFS (a
    recursive one hit Python's recursion limit on 1000+-word pasted
    phrases — code-review 11.5) assigns document positions left to
    right; three prunes keep the walk proportional to the FEASIBLE set
    instead of n! (which is what lets the r11 four-word permutation
    cap go away):

    - a source can only land within ``slop`` of its home position;
    - a source that has fallen ``slop+1`` behind the cursor can never
      be placed again — dead branch;
    - every still-unplaced source j ≤ pos owes at least ``pos+1−j``
      future budget; the partial cost plus that floor must fit.
    """
    if n == 0:
        yield (), 0
        return
    used = [False] * n
    perm: list[int] = []
    spent = 0

    def candidates(pos: int, cur_spent: int):
        dead = pos - slop - 1
        if dead >= 0 and not used[dead]:
            return
        for i in range(max(0, pos - slop), min(n, pos + slop + 1)):
            if used[i]:
                continue
            owed = sum(
                pos + 1 - j
                for j in range(max(0, pos - slop), pos + 1)
                if not used[j] and j != i
            )
            if cur_spent + abs(i - pos) + owed <= slop:
                yield i

    stack = [candidates(0, 0)]
    while stack:
        pos = len(stack) - 1
        i = next(stack[-1], None)
        if i is None:
            stack.pop()
            if perm:
                last = perm.pop()
                used[last] = False
                spent -= abs(last - (len(perm)))
            continue
        used[i] = True
        perm.append(i)
        spent += abs(i - pos)
        if len(perm) == n:
            yield tuple(perm), spent
            used[i] = False
            perm.pop()
            spent -= abs(i - pos)
        else:
            stack.append(candidates(pos + 1, spent))


def _qs_proximity(strcol: Column, phrase: str, slop: int) -> Column:
    """Sloppy phrase ``"w1 w2"~N`` with ONE phrase-wide slop budget
    (exact Lucene budget semantics via _qs_ordered_slop_regex —
    scan-local rlikes, no tokenizer state).

    Out-of-order matching (round 11, word-count cap removed in 11.5):
    every permutation of the words may match; a permutation σ (the
    declared index of the word at each document position) first pays
    its total displacement ``Σ_k |σ[k] - k|`` out of the budget and
    may spend the remainder on intervening words.  For an adjacent
    transposition the cost is 2 — Lucene's documented sloppy-phrase
    transposition cost ("ab"~2 matches "ba"), which this formula
    generalizes (full 3-word reversal costs 4).  The displacement
    bound prunes the permutation walk to the feasible set, so long
    phrases with small slops stay a handful of rlikes; the TOTAL
    branch count across all orders is bounded arithmetically at 5000
    before any regex is built, so a hostile word-count × slop combo
    raises loudly instead of compiling a megabyte regex.  The total
    bound is 10× the per-order bound so that every phrase the ordered
    r11 engine accepted still compiles (a 4-word slop-21 phrase
    expands to ~3k branches across its 24 orders — code-review 11.5
    caught the first cut capping the total at 500, which silently
    regressed those).  Duplicate words make distinct permutations
    collide on the same regex; branches dedupe on the pattern
    string."""
    words = [re.escape(w) for w in phrase.split()]
    if not words:
        # Lucene's parser drops an empty phrase — in a filter context
        # it matches NOTHING.  Raising here broke whole-dashboard
        # compiles for a user-cleared '""' search box, and the old
        # contains('') match-ALL was the opposite of Lucene
        # (code-review r11).
        return F.lit(False)
    if len(words) == 1:
        return strcol.rlike(
            _qs_boundary(_qs_boundary(words[0], "left"), "right")
        )
    n_gaps = len(words) - 1
    orders: list[tuple[list[str], int]] = []
    total_branches = 0
    for perm, cost in _qs_displacement_orders(len(words), slop):
        residual = slop - cost
        total_branches += _qs_branch_count(n_gaps, residual)
        if total_branches > 5000:
            raise ValueError(
                f"kibana: proximity phrase of {len(words)} words with "
                f"slop {slop} expands past the supported regex size"
            )
        orders.append(([words[i] for i in perm], residual))
    seen: set[str] = set()
    pred = None
    for seq, budget in orders:
        pattern = _qs_ordered_slop_regex(seq, budget)
        if pattern in seen:
            continue
        seen.add(pattern)
        leg = strcol.rlike(pattern)
        pred = leg if pred is None else (pred | leg)
    return pred


def _qs_term(term: str, resolve, default_search_field) -> Column:
    # boost ^N binds last and only affects scoring; filters score
    # nothing, so stripping it is exact (see _query_string_pred)
    m = re.fullmatch(r"(.+?)\^\d+(?:\.\d+)?", term, re.DOTALL)
    if m:
        term = m.group(1)
    if term.startswith('"'):
        if not default_search_field:
            raise ValueError(
                f"kibana: bare-phrase query_string {term!r} needs "
                f"default_search_field"
            )
        strcol = resolve(default_search_field).cast("string")
        m = re.fullmatch(r'"([^"]*)"~(\d*)', term)
        if m:
            return _qs_proximity(strcol, m.group(1), int(m.group(2) or 0))
        # plain quoted phrase = slop-0 proximity (token boundaries,
        # round 11 — see _query_string_pred)
        return _qs_proximity(strcol, term[1:-1], 0)
    field, _, val = term.partition(":")
    col = resolve(field.strip())
    val = val.strip()
    # \d* not \d+: bare `f:"a b"~` means slop 0, exactly like the
    # default-field form below (code-review r10: the two spellings of
    # the same Lucene input diverged — one parsed, one raised)
    m = re.fullmatch(r'"([^"]*)"(?:~(\d*))?', val)
    if m:
        if m.group(2) is None:
            return col.cast("string") == m.group(1)
        return _qs_proximity(col.cast("string"), m.group(1), int(m.group(2) or 0))
    if val == "*":
        return col.isNotNull()
    m = re.fullmatch(r"\[\s*(\S+)\s+TO\s+(\S+)\s*\]", val, re.IGNORECASE)
    if m:
        lo, hi = m.group(1), m.group(2)
        c = col.cast("double")
        pred = F.lit(True)
        if lo != "*":
            pred = pred & (c >= float(lo))
        if hi != "*":
            pred = pred & (c <= float(hi))
        return pred
    m = re.fullmatch(r"(>=|<=|>|<)(-?\d+(?:\.\d+)?)", val)
    if m:
        c = col.cast("double")
        op, num = m.group(1), float(m.group(2))
        return {">": c > num, ">=": c >= num,
                "<": c < num, "<=": c <= num}[op]
    m = re.fullmatch(r"([^~\s]+)~(\d*)", val)
    if m:
        word, n = m.group(1), m.group(2)
        max_edits = int(n) if n else 2  # bare ~ is Lucene's default 2
        if max_edits > 2:
            raise ValueError(
                f"kibana: fuzzy distance {max_edits} in {term!r} — Lucene "
                f"caps fuzzy queries at 2 edits"
            )
        if "*" in word or "?" in word:
            raise ValueError(
                f"kibana: wildcard inside fuzzy term {term!r} is not "
                f"valid Lucene syntax"
            )
        # Restricted Damerau-Levenshtein (round 11) — Lucene's actual
        # fuzzy metric credits adjacent transpositions.  Cheap legs
        # first so the O(len²) OSA fold only evaluates on near-miss
        # rows: a length-difference guard (|Δlen| > k can never match)
        # then the thresholded JVM levenshtein (banded O(k·len),
        # early-exits above the cap; lev ≥ osa so a lev hit IS an osa
        # hit) — codegen short-circuits the disjunction left-to-right.
        s = col.cast("string")
        return (
            (F.abs(F.length(s) - F.lit(len(word))) <= F.lit(max_edits))
            & (
                (F.levenshtein(s, F.lit(word), max_edits) >= 0)
                | (osa_distance(s, F.lit(word)) <= F.lit(max_edits))
            )
        )
    if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
        return col.cast("string").startswith(val[:-1])
    if "*" in val or "?" in val:
        return col.cast("string").rlike(_qs_wildcard_regex(val))
    if "~" in val or "^" in val:
        raise ValueError(
            f"kibana: unsupported '~'/'^' placement in query_string "
            f"term {term!r} (fuzzy is value~N with numeric N ≤ 2; boost "
            f"is a trailing ^N)"
        )
    return col.cast("string") == val


def _qs_parse(q: str, resolve, default_search_field) -> Column:
    toks: list[str] = []
    i = 0
    while i < len(q):
        m = _QS_TOKEN_RE.match(q, i)
        if m is None:
            if q[i:].strip():
                raise ValueError(f"kibana: unsupported query_string {q!r}")
            break
        toks.append(m.group(1).strip())
        i = m.end()
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def eat():
        nonlocal pos
        t = toks[pos]
        pos += 1
        return t

    def primary() -> Column:
        t = peek()
        if t is None:
            raise ValueError(f"kibana: truncated query_string {q!r}")
        if t == "(":
            eat()
            e = or_()
            if peek() != ")":
                raise ValueError(f"kibana: unbalanced parens in {q!r}")
            eat()
            return e
        if t == "NOT":
            eat()
            return ~primary()
        if t in ("AND", "OR", ")"):
            raise ValueError(f"kibana: unexpected {t!r} in {q!r}")
        return _qs_term(eat(), resolve, default_search_field)

    def and_() -> Column:
        left = primary()
        while peek() == "AND":
            eat()
            left = left & primary()
        return left

    def or_() -> Column:
        left = and_()
        while peek() == "OR":
            eat()
            left = left | and_()
        return left

    out = or_()
    if pos != len(toks):
        raise ValueError(f"kibana: trailing query_string input in {q!r}")
    return out


def compile_export(
    saved_objects: "list | dict", dashboard: str | None = None
) -> "dict[str, KibanaPlan]":
    """Compile every visualization of a Kibana saved-objects EXPORT
    (the shape of ELK/jmx_dashboard.json: a list of ``_type ==
    "visualization"`` / ``"dashboard"`` objects) — the whole-dashboard
    twin of promql.compile_dashboard (round 7).

    ``dashboard`` narrows to one dashboard's panels (matched by its
    ``_source.title``; panel membership comes from the dashboard
    object's ``panelsJSON`` id list).  Markdown/navigation panels (no
    aggs) are skipped — they carry nothing to query.  Keys are the
    visualization titles, suffixed ``#<n>`` on duplicates.
    """
    import json as _json

    objs = saved_objects if isinstance(saved_objects, list) else [saved_objects]
    wanted_ids = None
    if dashboard is not None:
        dash_obj = next(
            (
                o
                for o in objs
                if o.get("_type") == "dashboard"
                and o.get("_source", {}).get("title") == dashboard
            ),
            None,
        )
        if dash_obj is None:
            raise ValueError(f"kibana: no dashboard titled {dashboard!r} in export")
        panels = _json.loads(dash_obj["_source"].get("panelsJSON", "[]"))
        # legacy exports embed the vis id per panel; newer (7.x+)
        # exports carry panelRefName entries resolved through the
        # object-level references list
        refs = {
            r.get("name"): r.get("id")
            for r in dash_obj.get("references", [])
            if r.get("type") == "visualization"
        }
        wanted_ids = set()
        for p in panels:
            vid = p.get("id") or refs.get(p.get("panelRefName"))
            if vid is not None:
                wanted_ids.add(vid)
        if panels and not wanted_ids:
            raise ValueError(
                f"kibana: dashboard {dashboard!r} has {len(panels)} panels "
                f"but none resolve to a visualization id (unsupported "
                f"panelsJSON shape?)"
            )
    plans: dict[str, KibanaPlan] = {}
    for o in objs:
        if o.get("_type") != "visualization":
            continue
        if wanted_ids is not None and o.get("_id") not in wanted_ids:
            continue
        plan = compile_visualization(o)
        if not plan.state.buckets and not plan.state.metrics:
            continue  # markdown/navigation panel
        key = o.get("_source", {}).get("title") or o.get("_id", "vis")
        # duplicate titles: first unused "#<n>" suffix (never clobbers
        # an existing plan, even if a title literally ends in "#<n>")
        if key in plans:
            n = 2
            while f"{key} #{n}" in plans:
                n += 1
            key = f"{key} #{n}"
        plans[key] = plan
    return plans
