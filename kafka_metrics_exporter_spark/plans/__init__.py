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
CURRENT_ROUND = 10

# Explicit first-window ordering for ROUND 10.
#
# The r9 gate RAN (CORRECTNESS_r09.json: 50/50 green), so the rotation
# planned at round 9 executes exactly as documented there:
#   - the 48 queries whose latest driver row is r7 (two gate-runs old,
#     enumerated by test_rotation_promotes_stale_rows as r07-minus-r09)
#     all PROMOTE into the window;
#   - the 50 queries verified fresh in r9 all DEMOTE (their rows are
#     one gate-run old — the youngest debt in the ledger);
#   - the 2 remaining free slots (50 - 48) go to the oldest-debt
#     sketch anchors dedup_minhash_lsh / dedup_simhash (latest row r6,
#     three gate-runs old — VERDICT r9 item 2 asks for exactly these).
# Round-10 registrations and ADVICE-driven semantic changes claim
# window slots as they land, each trading one demotion of an
# r7-latest query into STALE_OUT_OF_WINDOW with a per-query
# justification (the cap in test_registry_window.py tracks the
# arithmetic).
#
# Out-of-window debt after this rotation: the 50 r9-verified (1 run
# old), the 23 remaining r6-latest (3 runs old; all re-attested this
# round via tools/check_oracle.py at sf0.1 — see BASELINE.md round-10
# addendum) — every one carries a per-session pytest oracle replay at
# sf0.001 plus a GOLDEN.json hash pin recorded from this round's code.

# Queries with no driver CORRECTNESS row in any EXISTING correctness
# file — must be in-window.  Round-10 registrations append here as
# they land.
NEW_THIS_ROUND = [
    # full Lucene query_string grammar: fuzzy/proximity/boost/wildcards
    "kibana_query_string",
    # exact-substring dedup (suffix-array family, Lee et al. 2021)
    "dedup_substring",
    # Prometheus 3.x native histograms (count/sum/avg/quantile/fraction)
    "promql_native_histogram",
    # real Structured Streaming replay, driver-verified vs a batch twin
    "streaming_state_replay",
    # session-window streaming replay (cross-batch session merging)
    "streaming_session_replay",
    # product-quantization ANN (Jégou et al. 2011), SQL-replayable training
    "embed_pq_topk",
]

# Queries whose engine semantics changed this round — re-verification
# required even though an older row is green (ADVICE r4).
CHANGED_THIS_ROUND = [
    # ADVICE r9: percentiles_bucket switched from linear interpolation
    # to ES's documented nearest-rank selection — values change.
    "kibana_serial_stats",
    # ADVICE r9: NULL-keyed groups (docs missing the field) are now
    # excluded from significant_terms bucket output, matching ES.
    "kibana_significant_terms",
]

CHANGED_OUT_OF_WINDOW: list[str] = []

# r7-latest queries the 50-slot arithmetic cannot fit once round-10
# registrations + changes claimed their slots (48 promotions + 6 new +
# 2 changed + 2 anchor promotions = 58 candidates for 50 slots → 8
# demotions).  Selection: code untouched since their green r7 row AND
# an in-window sibling exercising the same machinery; every one is
# replayed against its DuckDB oracle at sf0.001 by
# tests/test_queries_oracle.py EVERY session, re-attested at sf0.1 via
# tools/check_oracle.py this round, and hash-pinned by the round-10
# GOLDEN re-record.
STALE_OUT_OF_WINDOW = [
    # pure deterministic scalar pack (sin/cos/atan2/deg/rad), untouched
    # since its green r7 row; compiled-expression pins in
    # test_promql.py — demoted for dedup_substring
    "promql_trig_group",
    # same scalar family as promql_trig_group (round/scalar/abs),
    # untouched since r7 — demoted for streaming_state_replay
    "promql_round_scalar",
    # pure deterministic calendar scalars (minute/hour/day_of_*/...),
    # untouched since r7; compiled-expression pins in test_promql.py —
    # demoted for streaming_session_replay
    "promql_calendar",
    # single sum-without-one-key aggregation, untouched since r7;
    # a1_a4/a12 exercise the same grouped-agg machinery in-window —
    # demoted for embed_pq_topk
    "a10_sum_without",
    # and/or/unless set ops, untouched since r7;
    # promql_vector_matching (in-window) exercises the same match-key
    # machinery — demoted for promql_native_histogram
    "promql_set_ops",
    # single exact groupBy+countDistinct; its HLL sibling
    # a5_approx_count_distinct stays in-window with the exact-leg
    # attestation — demoted for kibana_query_string
    "a5_count_distinct",
    # composition of w2_rate + w3_topk machinery, both in-window —
    # demoted for kibana_serial_stats (changed)
    "w10_topk_rate_nonempty",
    # pure column expressions; text_corpus_report (in-window)
    # aggregates the same metric columns — demoted for
    # kibana_significant_terms (changed)
    "text_metrics",
]

WINDOW_PRIORITY = [
    # -- round-10 registrations + semantic changes claim slots here -------
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
    # -- latest driver row is r6 (3 gate-runs old): sketch anchors (2) -----
    "dedup_minhash_lsh",
    "dedup_simhash",
    # -- latest driver row is r7 (2 gate-runs old): the 48 promotions ------
    # reference-surface aggregations/windows/joins/set-ops
    "a1_a4_grouped_metrics",
    "a5_approx_count_distinct",
    "a6_latest_value",
    "a9_topk_of_avg",
    "a9b_sum_of_topk",
    "a11b_approx_percentile",
    "a12_rollup",
    "w1_tumbling_window",
    "w2_rate",
    "w3_topk_per_group",
    "w4_latest_per_user",
    "w7b_sliding_window",
    "w8_frame_specs",
    "w9_regex_label_rate_sum",
    "j6_asof_join",
    "o6_semi_join",
    "o7_except_all",
    "p2_normalize_pipeline",
    "p_scalar_pack",
    # dedup / embedding family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_passage",
    "dedup_components",
    "dedup_components_star",
    "embed_cosine_topk",
    "embed_near_dup_cosine",
    # text + multimodal
    "text_corpus_report",
    "multimodal_channel_stats",
    # PromQL surface
    "promql_count_values",
    "promql_histogram_quantile_grid",
    "promql_holt_winters",
    "promql_quantile_last_over_time",
    "promql_rate_extrapolated",
    "promql_subquery",
    "promql_topk_rate_grid",
    "promql_vector_compare",
    "promql_vector_matching",
    "promql_vector_math",
    # Kibana surface
    "kibana_date_histogram",
    "kibana_median",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
