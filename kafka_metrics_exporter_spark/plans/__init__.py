"""Query registry assembly.

Imports execute the ``@query`` decorators in each module, filling
``QUERIES`` / ``ORACLE_SQL`` in definition order; ``_reorder`` then
rewrites both dicts so the driver's CORRECTNESS gate — which records
only the FIRST 50 ``queries()`` entries in registration order — sees
the entries that most need fresh verification this round.

Window policy (VERDICT r3 item 1): every query that has never had a
driver CORRECTNESS row, plus queries whose implementation changed this
round, goes in slots 1-50; long-green core queries rotate out (they
stay pinned by GOLDEN.json hashes and the pytest oracle harness).
``tests/test_registry_window.py`` asserts the policy so a new query
can't silently land outside the window.
"""

from kafka_metrics_exporter_spark.plans.queries import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
)
from kafka_metrics_exporter_spark.plans import llm_queries  # noqa: E402,F401  (registers)
from kafka_metrics_exporter_spark.plans import promql_queries  # noqa: E402,F401  (registers)
from kafka_metrics_exporter_spark.plans import kibana_queries  # noqa: E402,F401  (registers)

# Driver-side cap on recorded CORRECTNESS entries (observed r1-r3).
CORRECTNESS_WINDOW = 50

# The round this registry state targets.  tools/record_golden.py stamps
# this into GOLDEN.json, and tests/test_registry_window.py asserts the
# stamp matches — so every out-of-window exemption below is backed by a
# GOLDEN re-record from THIS round's code, machine-checked (ADVICE r6:
# exemptions must not be comment-only).
CURRENT_ROUND = 16

# Explicit first-window ordering for ROUND 16.
#
# The r15 gate RAN (CORRECTNESS_r15.json: 50/50 green), so the rotation
# executes as the r15 verdict ordered (item 1):
#   - the 21 r11-latest rows — the entire >=4-gate-run ledger tail —
#     promote, lifting the ledger floor to r12-latest (the r15 work
#     order's burn-down target);
#   - of the 48 queries whose latest driver row is r14 (two gate-runs
#     old, enumerated by test_rotation_promotes_stale_rows as
#     r14-minus-r15), 21 PROMOTE, 1 re-enters as CHANGED
#     (promql_vector_matching — rewritten in Prometheus 3.x quoted
#     UTF-8 syntax), and 26 demote into STALE_OUT_OF_WINDOW, each with
#     an in-window sibling pinning the same machinery (justifications
#     below);
#   - 5 new registrations (VERDICT r15 items 2/3: the bigram-LM
#     perplexity + CCNet terciles built in r15, pack_chunks_bpe, the
#     composite numeric-histogram source, and the categorize_text
#     merged branch split into its own row) and 2 more semantic
#     changes (categorize_text split + metric sub-aggs; ip_range
#     IPv6) claim the rest.
#
# Slot arithmetic: 21 r11-tail + 21 promotions + 5 new + 3 changed
# = 50; 48 r14-latest candidates - 21 promoted - 1 changed = 26
# demotions.  Out-of-window debt after this rotation: the 50
# r15-verified rows (1 run old), the 26 demoted r14 rows (2 runs),
# r15's 13 demotions (3 runs) and r14's 15 r12-latest demotions (4
# runs — burned to zero next round); every out-of-window row is
# re-attested this round via tools/check_oracle.py at sf0.01 AND
# sf0.1 (BASELINE.md round-16 addendum), replayed against its DuckDB
# oracle at sf0.001 by tests/test_queries_oracle.py every session, and
# hash-pinned by the round-16 FULL GOLDEN re-record.

# Queries with no driver CORRECTNESS row in any EXISTING correctness
# file — must be in-window.
NEW_THIS_ROUND: list[str] = [
    # round-16 registrations of the r15-built LM machinery (VERDICT
    # r15 item 2): corpus-self-trained interpolated bigram perplexity
    # and CCNet head/middle/tail terciles
    "text_perplexity",
    "ccnet_buckets",
    # merge-BPE-denominated context packing (VERDICT r15 item 2)
    "pack_chunks_bpe",
    # composite numeric-histogram source page (VERDICT r15 item 2)
    "kibana_composite_histogram",
    # the categorize_text threshold-70 branch split into its own row
    # with its own baseline (VERDICT r15 item 3), carrying the new
    # avg/max metric sub-aggs through the merge partials (item 4)
    "kibana_categorize_text_merged",
]

# Queries whose engine semantics changed this round — re-verification
# required even though an older row is green (ADVICE r4).
CHANGED_THIS_ROUND: list[str] = [
    # r16 (VERDICT r15 items 3+4): the row now carries ONLY the exact
    # branch (merged split out above) and gains avg + exact-cardinality
    # metric sub-aggs in the single hash aggregation.
    "kibana_categorize_text",
    # r16 (VERDICT r15 item 5): IPv6 — addresses normalize into the
    # unified v4-mapped 128-bit space (two biased 64-bit words); the
    # row cycles plain/v4-mapped/2001:db8:: spellings with v6 +
    # cross-family ranges.
    "kibana_ip_range",
    # r16 (VERDICT r15 item 7): the group_left expression is rewritten
    # in Prometheus 3.x quoted UTF-8 syntax (dotted metric names,
    # dashed label name) — same relation, same oracle; also this row's
    # r14-latest promotion.
    "promql_vector_matching",
]

CHANGED_OUT_OF_WINDOW: list[str] = []

# r14-latest queries the 50-slot arithmetic cannot fit once the 21
# r11-tail promotions (VERDICT r15 item 1's floor lift) + 5 new + 3
# changed claimed their slots (48 r14-latest candidates + 21 + 5 + 3 =
# 77 candidates for 50 slots -> 26 demotions).  Selection: code
# untouched since their green r14 row AND an in-window sibling
# exercising the same machinery; every one is replayed against its
# DuckDB oracle at sf0.001 by tests/test_queries_oracle.py EVERY
# session, re-attested at sf0.01 and sf0.1 via tools/check_oracle.py
# this round, and hash-pinned by the round-16 FULL GOLDEN re-record.
STALE_OUT_OF_WINDOW: list[str] = [
    # grouped-agg substrate pinned by kibana_composite_histogram (NEW:
    # one hash aggregation over a key tuple + sum/count metrics)
    "a1_a4_grouped_metrics",
    # exact cardinality pinned in-window by kibana_categorize_text's
    # new cardinality sub-agg (CHANGED); the HLL <=5% contract stays
    # pytest-pinned
    "a5_approx_count_distinct",
    # argmax-by-key (max_by) machinery pinned by kibana_rate_top_metrics
    # (promotion — top_metrics IS sort-by-argmax)
    "a6_latest_value",
    # multi-key tuple groupBy pinned by kibana_composite_histogram
    # (NEW — terms x histogram source tuple)
    "a7_multikey_drilldown",
    # post-aggregation filter pinned by kibana_rare_multi_terms
    # (promotion — rare_terms IS a HAVING count<=2 cut)
    "a8_having",
    # multi-branch union-by-name pinned by kibana_rare_multi_terms
    # (promotion — three branch relations union into one result)
    "j3_union_byname",
    # distinct = the degenerate hash agg, pinned by o5_intersect
    # (r11-tail promotion — intersect is distinct-based in both engines)
    "o1_distinct",
    # TakeOrdered sort+limit pinned by kibana_composite_histogram
    # (NEW — the composite page cut is the same physical operator)
    "o4_sort_limit",
    # LeftSemi pinned by o3_anti_join (r11-tail promotion, the LeftAnti
    # twin) and pipe_fuzzy_decontaminate's semi-join keep-set (tail)
    "o6_semi_join",
    # time-floor bucket aggregation pinned by kibana_filter_missing_auto
    # (promotion — auto_date_histogram is the same floor-div bucketing)
    "w1_tumbling_window",
    # per-group rank cut pinned by embed_ivf_topk (r11-tail promotion —
    # top-k per probe is the same rank-window machinery)
    "w3_topk_per_group",
    # window frame specs pinned by kibana_serial_stats +
    # kibana_moving_percentiles (promotions — moving windows over
    # bucket tables are rowsBetween frames)
    "w8_frame_specs",
    # rate + grouped-sum machinery pinned by w2_rate (promotion, the
    # reset-clamp core); regex label matchers ride the promql pytest
    # corpus and promql_vector_matching's matcher path (CHANGED)
    "w9_regex_label_rate_sum",
    # digest-groupBy survivor semantics pinned by dedup_minhash_lsh
    # (promotion — md5-derived hashes, same survivor rule) and driven
    # end-to-end every session by the curate CLI pytest
    "dedup_exact",
    # star-round label-prop: the banded pair-gen side is pinned by
    # dedup_minhash_lsh (promotion); the star rounds went green r15 at
    # sf-scale via dedup_components_star / dedup_minhash_components
    "dedup_components",
    # shingle-containment machinery pinned by pipe_fuzzy_decontaminate
    # (r11-tail promotion — the same shingle inverted-index shape)
    "dedup_substring",
    # rolling-hash/content-hash projection pinned by dedup_minhash_lsh
    # (promotion — md5-shingle hashing is the same scan-local shape)
    "doc_fingerprint",
    # PQ codebook machinery pinned by embed_quantize + embed_ivf_topk
    # (r11-tail promotions); the ivfpq composition went green r15
    "embed_pq_topk",
    # blocked-matmul cosine kernel pinned by embed_ivf_topk +
    # embed_near_dup_lsh (r11-tail promotions, same scoring kernel)
    "embed_near_dup_cosine",
    # Arrow multimodal plumbing pinned by multimodal_audio +
    # multimodal_features (r11-tail promotions, same mapInPandas shape)
    "multimodal_resize",
    # exact n-gram decontamination pinned by pipe_fuzzy_decontaminate
    # (r11-tail promotion, the fuzzy superset); Bloom variant green r15
    "pipe_decontaminate",
    # md5-residue deterministic selection pinned by pipe_weighted_sample
    # (r11-tail promotion, the same content-addressed sampler)
    "pipe_split",
    # aggregation over quality_columns/token metrics pinned by
    # text_gopher_quality + text_repetition (r11-tail promotions)
    "text_corpus_report",
    # the single-branch production twin of kibana_filter_missing_auto
    # (promotion — the breadth row covers this row's one branch)
    "kibana_filter_missing_auto_prod",
    # exact interpolated percentile machinery pinned by a11_percentile
    # (r11-tail promotion) + kibana_moving_percentiles (promotion)
    "kibana_median",
    # the histogram_quantile rank-interpolation kernel pinned by
    # promql_native_histogram (promotion — the same kernel over native
    # buckets); the classic-bucket grid row went green r15
    "promql_histogram_quantile",
]

WINDOW_PRIORITY = [
    # -- round-16 registrations + semantic changes claim slots here ----
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
    # -- latest driver row is r11 (4 gate-runs old): full tail burn-down
    "a11_percentile",
    "embed_ivf_topk",
    "embed_near_dup_lsh",
    "embed_quantize",
    "j2_broadcast_lookup",
    "kibana_bucket_script",
    "kibana_sibling_sort",
    "multimodal_audio",
    "multimodal_features",
    "o3_anti_join",
    "o5_intersect",
    "pipe_domain_mix",
    "pipe_fuzzy_decontaminate",
    "pipe_global_shuffle",
    "pipe_sliding_chunks",
    "pipe_weighted_sample",
    "promql_deriv_predict",
    "qtj_series_arith",
    "text_gopher_quality",
    "text_langid",
    "text_repetition",
    # -- latest driver row is r14 (2 gate-runs old): the 21 promotions
    # scraper / relational / streaming core
    "streaming_state_replay",
    "j6_asof_join",
    "w2_rate",
    "a12_rollup",
    "p2_normalize_pipeline",
    "p_scalar_pack",
    "dedup_minhash_lsh",
    # PromQL surface
    "promql_clamp_sort",
    "promql_count_values",
    "promql_holt_winters",
    "promql_native_histogram",
    "promql_rate_extrapolated",
    "promql_subquery",
    "promql_time_macros",
    # Kibana surface
    "kibana_filter_missing_auto",
    "kibana_matrix_stats",
    "kibana_serial_stats",
    "kibana_rare_multi_terms",
    "kibana_rate_top_metrics",
    "kibana_moving_percentiles",
    "kibana_query_string_prod",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
