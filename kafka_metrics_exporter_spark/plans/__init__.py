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
CURRENT_ROUND = 12

# Explicit first-window ordering for ROUND 12.
#
# The r11 gate RAN (CORRECTNESS_r11.json: 50/50 green), so the rotation
# executes as the r11 verdict ordered (items 1-2):
#   - of the 48 queries whose latest driver row is r10 (two gate-runs
#     old, enumerated by test_rotation_promotes_stale_rows as
#     r10-minus-r11), 40 PROMOTE into the window and 8 demote into
#     STALE_OUT_OF_WINDOW, each with an in-window sibling pinning the
#     same machinery (justifications below);
#   - the 8 freed slots + the 2 natural free slots (50 - 48) go to the
#     round-12 registration (1 new), the 4 semantic changes (one of
#     them, kibana_top_hits_latest, itself an r6-debt promotion — the
#     oldest rows in the ledger at 5 gate-runs), and 5 more r6-debt
#     promotions (a8_having, promql_histogram_quantile,
#     promql_topk_rate, multimodal_resize, pipe_decontaminate) —
#     burning 6 of the 19 r6-latest rows (VERDICT r11 item 2).
#
# Out-of-window debt after this rotation: the 50 r11-verified (1 run
# old), the 8 demoted r10 rows, 13 remaining r6-latest, 8 r7-latest
# and 8 r9-latest — every one re-attested this round via
# tools/check_oracle.py at sf0.1 (see BASELINE.md round-12 addendum)
# and carrying a per-session pytest oracle replay at sf0.001 plus a
# GOLDEN.json hash pin.

# Queries with no driver CORRECTNESS row in any EXISTING correctness
# file — must be in-window.
NEW_THIS_ROUND: list[str] = [
    # instant-mode extrapolated rate (VERDICT r11 item 6): the opt-in
    # extrapolatedRate kernel at SAMPLE instants, closing the last
    # documented PromQL batch-mode divergence
    "promql_rate_instant",
]

# Queries whose engine semantics changed this round — re-verification
# required even though an older row is green (ADVICE r4).
CHANGED_THIS_ROUND: list[str] = [
    # r12: info()'s fail-closed conflict check folded into the single
    # catalog-sized job that materializes the broadcast join side
    # (VERDICT r11 What's-wrong #3) — same results, new plan shape
    "promql_info_join",
    # r12: METRIC-ordered multi_terms (orderBy a sub-agg / custom
    # orderAgg / _key, VERDICT r11 item 4) — the registry row gains a
    # sum-ordered size-4 branch
    "kibana_rare_multi_terms",
    # r12: schema-3 native histograms hash-attested (VERDICT r11 item
    # 5) — the registry row evaluates all six functions over BOTH a
    # schema-0 and a schema-3 sketch (documented float stance in
    # _nh_sql)
    "promql_native_histogram",
    # r12: top_hits size > 1 (VERDICT r11 item 7) — row_number()<=size
    # rank + aggregate fold; the registry row gains avg-of-top-3 and
    # concat-of-top-2 metrics.  Also an r6-debt promotion (latest
    # driver row r6, 5 gate-runs old)
    "kibana_top_hits_latest",
    # r12.5: ES min_doc_count on (date_)histogram buckets (0 =
    # zero-fill the innermost histogram's empty buckets, ES's agg
    # default; >= 2 = own-level count filter) and the terms `missing`
    # param + null-key drop — the registry row gains fill/mdc2
    # branches over a sparse hourly subset with real gaps.  Already an
    # r10→r12 promotion, so the CHANGED declaration costs no slot.
    "kibana_date_histogram",
    # r12.5: ES value_count (non-null field values) + weighted_avg
    # (sum(v·w)/sum(w), fail-null on zero weight) +
    # median_absolute_deviation (two exact grouped percentile passes;
    # DuckDB mad() twin) + boxplot (min/q1/q2/q3/max, one pass) — the
    # registry row gains all the new columns.
    # Already an r10→r12 promotion: no slot cost.
    "kibana_median",
]

CHANGED_OUT_OF_WINDOW: list[str] = []

# r10-latest queries the 50-slot arithmetic cannot fit once the
# round-12 registration + changes + the r6-debt promotions claimed
# their slots (48 r10-latest candidates + 6 r6-debt promotions + 1 new
# + 4 changed — one changed row is itself an r6-debt promotion — = 58
# candidates for 50 slots → 8 demotions).  Selection: code untouched
# since their green r10 row AND an in-window sibling exercising the
# same machinery; every one is replayed against its DuckDB oracle at
# sf0.001 by tests/test_queries_oracle.py EVERY session, re-attested
# at sf0.1 via tools/check_oracle.py this round, and hash-pinned by
# the round-12 GOLDEN re-record.
STALE_OUT_OF_WINDOW: list[str] = [
    # same histogram_quantile bucket-walk kernel pinned in-window by
    # promql_histogram_quantile (the r6-debt promotion it trades for);
    # grid machinery pinned by promql_rate_extrapolated +
    # promql_subquery (both in-window)
    "promql_histogram_quantile_grid",
    # same topk-of-rate composite: the sample-instant twin
    # promql_topk_rate is promoted (r6 debt); the grid extrapolation
    # kernel is pinned by promql_rate_extrapolated (in-window) and the
    # per-instant ranking by w3_topk_per_group (in-window)
    "promql_topk_rate_grid",
    # same Arrow mapInPandas decode plumbing pinned by
    # multimodal_resize (the r6-debt promotion it trades for) and
    # multimodal_audio machinery verified r11
    "multimodal_channel_stats",
    # agg-of-agg machinery pinned in-window by a9_topk_of_avg (the
    # other direction) and the rank cut by w3_topk_per_group — demoted
    # for a8_having (r6-debt promotion)
    "a9b_sum_of_topk",
    # connected-components machinery pinned by dedup_components
    # (in-window); the star variant's code is untouched since its
    # green r10 row — demoted for pipe_decontaminate (r6 debt)
    "dedup_components_star",
    # set-op join machinery pinned by o6_semi_join (in-window);
    # multiset except is its inverse join — demoted for
    # promql_rate_instant (new)
    "o7_except_all",
    # window-agg family pinned by w1_tumbling_window + w8_frame_specs
    # (both in-window) — demoted for the promql_native_histogram
    # CHANGED slot
    "w7b_sliding_window",
    # vector-binop join machinery pinned by promql_vector_matching +
    # promql_vector_math (both in-window); the comparison filter is a
    # compiled-expression variant pinned by test_promql — demoted for
    # the promql_info_join CHANGED slot
    "promql_vector_compare",
]

WINDOW_PRIORITY = [
    # -- round-12 registration + semantic changes claim slots here -------
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
    # -- latest driver row is r6 (5 gate-runs old): oldest-debt rows (5) --
    "a8_having",
    "promql_histogram_quantile",
    "promql_topk_rate",
    "multimodal_resize",
    "pipe_decontaminate",
    # -- latest driver row is r10 (2 gate-runs old): the 40 promotions ----
    # aggregations / windows / joins
    "a1_a4_grouped_metrics",
    "a5_approx_count_distinct",
    "a6_latest_value",
    "a9_topk_of_avg",
    "a11b_approx_percentile",
    "a12_rollup",
    "j6_asof_join",
    "o6_semi_join",
    "w1_tumbling_window",
    "w2_rate",
    "w3_topk_per_group",
    "w4_latest_per_user",
    "w8_frame_specs",
    "w9_regex_label_rate_sum",
    "p2_normalize_pipeline",
    "p_scalar_pack",
    # dedup / embedding family
    "dedup_components",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_passage",
    "dedup_simhash",
    "dedup_substring",
    "embed_cosine_topk",
    "embed_near_dup_cosine",
    "embed_pq_topk",
    # text + streaming
    "text_corpus_report",
    "streaming_session_replay",
    "streaming_state_replay",
    # PromQL surface
    "promql_count_values",
    "promql_holt_winters",
    "promql_quantile_last_over_time",
    "promql_rate_extrapolated",
    "promql_subquery",
    "promql_vector_matching",
    "promql_vector_math",
    # Kibana surface
    "kibana_serial_stats",
    "kibana_significant_terms",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
