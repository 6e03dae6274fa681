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

# Explicit first-window ordering for ROUND 5.  Composition (the r4
# verdict's rotation ask, executed):
#   - the 31 queries whose latest driver row is r3 (they sat after slot
#     50 in the r4 window) — promoted so no query's driver row is more
#     than one round old;
#   - queries NEW this round (grid-mode composites, star CC);
#   - queries whose engine semantics or oracle CHANGED this round
#     (resets/changes both-endpoints rule, last_over_time determinism);
#   - r4-verified canaries filling the window to 50 (front-end and
#     dedup paths touched by this round's refactors).
# Everything not listed keeps definition order after these (all have
# green r4 rows).
#
# ROTATION POLICY for round 6+: swap again — promote the r4-latest set
# (now sitting after slot 50) plus NEW_THIS_ROUND/CHANGED_THIS_ROUND,
# demote this round's verified set.  test_registry_window.py enforces
# that never-verified and changed queries always land in-window.

# Queries first registered this round — must be in-window.
NEW_THIS_ROUND = [
    "promql_topk_rate_grid",
    "promql_histogram_quantile_grid",
    "dedup_components_star",
    "promql_vector_matching",
    "promql_set_ops",
    "pipe_fuzzy_decontaminate",
    "promql_count_values",
    "promql_subquery",
    "multimodal_channel_stats",
    "text_corpus_report",
]

# Queries whose engine semantics or oracle SQL changed this round —
# must be re-verified by the driver even though they have green rows
# (ADVICE r4: the r4 window dropped changed queries; now pinned by
# test_registry_window.py::test_changed_queries_land_in_window).
CHANGED_THIS_ROUND = [
    "promql_resets_changes",  # both-endpoints window rule + new oracle
    "promql_quantile_last_over_time",  # deterministic last tie-break
]

WINDOW_PRIORITY = [
    # -- latest driver row is r3 (31 queries) -----------------------------
    "a5_count_distinct",
    "a5_approx_count_distinct",
    "a6_latest_value",
    "w4_latest_per_user",
    "a9_topk_of_avg",
    "a10_sum_without",
    "w1_tumbling_window",
    "w3_topk_per_group",
    "a11b_approx_percentile",
    "a9b_sum_of_topk",
    "w7b_sliding_window",
    "w8_frame_specs",
    "w9_regex_label_rate_sum",
    "w10_topk_rate_nonempty",
    "j1_cross_join",
    "j3_union_byname",
    "j5_explode_parent_child",
    "o1_distinct",
    "o3_anti_join",
    "o4_sort_limit",
    "o5_intersect",
    "p_scalar_pack",
    "j6_asof_join",
    "a12_rollup",
    "o6_semi_join",
    "o7_except_all",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "embed_near_dup_cosine",
    "embed_cosine_topk",
    "text_metrics",
    # -- new / changed in round 5 -----------------------------------------
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
    # -- r4-verified canaries on this round's touched paths ---------------
    "kibana_terms_metrics",
    "promql_rate_extrapolated",
    "dedup_minhash_lsh",
    "dedup_components",
    "a1_a4_grouped_metrics",
    "w2_rate",
    "p2_normalize_pipeline",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
