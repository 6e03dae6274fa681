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
CURRENT_ROUND = 8

# Explicit first-window ordering for ROUND 8.  Composition (the r7
# verdict's rotation ask, executed):
#   - the 7 queries whose latest driver row is r5 (the r7
#     STALE_OUT_OF_WINDOW demotions — their rows would go three rounds
#     old this round, so they promote first);
#   - 30 of the 47 queries whose latest driver row is r6 (they sat
#     after slot 50 in the r7 window); the slot arithmetic forces 17
#     demotions (7 + 47 + 11 new + 2 changed = 67 > 50), listed in
#     STALE_OUT_OF_WINDOW with their per-query justification;
#   - queries NEW this round (the PromQL label-function /
#     over-time-pack / limit-sample registry rows, the w12
#     chained-window cascade, and the two Kibana bucket/pipeline
#     queries);
#   - queries whose results or oracle CHANGED this round
#     (promql_rules_group: alert threshold re-sized so the driver
#     differential exercises pending AND firing rows — ADVICE r7;
#     openmetrics_roundtrip: quote-aware label parsing +
#     timestamp_unit on the parse path).
# Everything not listed keeps definition order after these (all have
# green r7 rows).
#
# ROTATION POLICY for round 9+: swap again — promote the r7-latest set
# (now sitting after slot 50) plus NEW_THIS_ROUND/CHANGED_THIS_ROUND,
# demote this round's verified set.  test_registry_window.py enforces
# that never-verified and changed queries always land in-window, and
# that every *_OUT_OF_WINDOW exemption has a CURRENT_ROUND GOLDEN row.

# Queries first registered this round — must be in-window.
NEW_THIS_ROUND = [
    "promql_label_functions",  # label_replace / label_join (VERDICT r7)
    "promql_over_time_pack",  # Prometheus 3.x over-time function pack
    "promql_limit_sample",  # limitk / limit_ratio experimental aggs
    "w12_window_time_cascade",  # chained-window cascade (VERDICT r7 item 7)
    "kibana_histogram_stats",  # range x histogram x extended_stats
    "kibana_pipeline",  # derivative / cumulative_sum / moving_avg
    "dedup_url",  # URL canonicalization + exact dedup (crawl first pass)
    "pipe_global_shuffle",  # deterministic seeded shard+rank shuffle
    "kibana_sibling_sort",  # avg/max_bucket siblings + bucket_sort
    "text_gopher_quality",  # Gopher line-based repetition/format rules
    "promql_time_macros",  # Grafana $__interval/$__rate_interval/$__range
]

# Queries whose engine semantics, plan shape, or oracle SQL changed
# this round — must be re-verified by the driver even though they have
# green rows (pinned by test_registry_window.py).  NOT listed, with
# reasons: promql_vector_compare uses filter-mode comparisons only —
# the ADVICE r7 bool-mode label fix rewrote the bool branch of
# _eval_cmp and left the filter branch byte-identical; dedup_passage
# calls passage_dup_stats — the ADVICE r7 fix touched only
# drop_duplicated_passages (pytest-pinned, not in this query's path);
# no registry query compiles `^`, so the Pow(±1, ±Inf) guard reaches
# no driver row (pytest-pinned in test_promql.py).
CHANGED_THIS_ROUND = [
    "promql_rules_group",  # alert threshold >40 -> >1 (ADVICE r7): the
    # r7 row compared empty-vs-empty; re-verify with 373 real rows
    "openmetrics_roundtrip",  # parse path rewritten: quote-aware label
    # block, exemplar stripping, float timestamps via timestamp_unit
]

# Changed queries that did NOT fit the 50-slot window (none this
# round — both changed queries are in-window above).
CHANGED_OUT_OF_WINDOW: list[str] = []

# r6-latest queries demoted to make the slot arithmetic fit (their
# driver row goes two rounds old this round; the CURRENT_ROUND GOLDEN
# re-record and the pytest oracle replay cover them, machine-checked).
# Selection criteria: code untouched since their last green row AND a
# second non-driver pin (plan pin, property test, or composition of
# independently verified stages).
STALE_OUT_OF_WINDOW = [
    # untouched since r3; bit-identical-to-unsalted property pin
    "scale_salted_agg",
    # r7's CHANGED_OUT_OF_WINDOW entry: compiled expression proven
    # identical then, untouched since
    "promql_clamp_sort",
    # deterministic fake-codec paths untouched since r4/r5; each is
    # pytest-pinned and the Arrow plumbing is shared with
    # multimodal_channel_stats (green r7)
    "multimodal_features",
    "multimodal_resize",
    "multimodal_frames",
    "multimodal_audio",
    # scan-local hash expressions untouched since r4; zero-shuffle
    # plans pinned in PLANS.json
    "pipe_split",
    "pipe_stratified_sample",
    "pipe_weighted_sample",
    # narrow md5 projection untouched since r3
    "doc_fingerprint",
    # single BroadcastHashJoin untouched since r1, plan-pinned
    "j2_broadcast_lookup",
    # composition of dedup_minhash_lsh (promoted this round) and the
    # connected-components stages (green r7 as dedup_components/_star)
    "dedup_minhash_components",
    # pure column exprs untouched since r3; langid_sql differential
    # pytest twin re-runs every session
    "text_langid",
    # chunk-count-only expansion untouched since r6; shares the
    # running-sum machinery with pipe_pack_chunks (promoted this round)
    "pipe_sliding_chunks",
    # deterministic quantization arithmetic untouched since r6,
    # pytest-pinned round-trip error bounds
    "embed_quantize",
    # pure column exprs untouched since r6; same line/word-repetition
    # family as the new text_gopher_quality row (in-window), pytest
    # oracle replay re-runs every session
    "text_repetition",
    # least-squares deriv/predict_linear kernel untouched since r6;
    # its grid-expansion machinery (range_eval instant expansion) is
    # re-exercised in-window by promql_time_macros and
    # promql_rate_extrapolated; pytest oracle replay re-runs every
    # session
    "promql_deriv_predict",
]

WINDOW_PRIORITY = [
    # -- latest driver row is r5 (the 7 r7 demotions, promoted first) --
    "j1_cross_join",
    "j3_union_byname",
    "j5_explode_parent_child",
    "o1_distinct",
    "o3_anti_join",
    "o4_sort_limit",
    "o5_intersect",
    # -- latest driver row is r6 (35 of 47; 12 demoted above) ---------
    "a7_multikey_drilldown",
    "a8_having",
    "a11_percentile",
    "qtj_series_arith",
    "w7_session_window",
    "p1_objectname_pivot",
    "rules_rewrite",
    "j7_range_join",
    "w11_rollup_cascade",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "embed_near_dup_lsh",
    "embed_ivf_topk",
    "embed_cluster_dedup",
    "pipe_pack_chunks",
    "pipe_decontaminate",
    "text_quality_gate",
    "text_redact",
    "pipe_corpus_build",
    "text_token_rarity",
    "pipe_fuzzy_decontaminate",
    "pipe_bloom_decontaminate",
    "text_tfidf_topk",
    "promql_topk_rate",
    "promql_quantile_agg",
    "promql_histogram_quantile",
    "promql_resets_changes",
    "promql_at_offset",
    "kibana_terms_metrics",
    "kibana_top_hits_latest",
    # -- new / changed in round 8 -----------------------------------------
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
