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

# Explicit first-window ordering.  Composition:
#   - the 23 queries registered after `text_metrics` in r3 (never had a
#     driver row: llmdata tail + promql suite);
#   - queries whose engine code or oracle changed in round 4 (new
#     oracles for the sketch pipelines, new kibana/range front ends,
#     embed_cluster_dedup);
#   - core queries kept as regression canaries for this round's decimal
#     / rate work.
# Everything not listed keeps its definition order after these.
#
# ROTATION POLICY for round 5+: once CORRECTNESS_r4 lands, every query
# in the registry has a driver row in r3 ∪ r4.  Next round, swap this
# list: promote the 28 queries whose latest row is r3 (they sit after
# slot 50 now) plus anything new/changed into the window, and demote
# this round's verified set to the tail — keeping every query's most
# recent driver row at most one round old.  test_registry_window.py
# enforces that new/changed queries always land in-window.
WINDOW_PRIORITY = [
    # -- never driver-verified (r3 slots 51-73) ---------------------------
    "text_langid",
    "doc_fingerprint",
    "multimodal_features",
    "pipe_split",
    "pipe_stratified_sample",
    "pipe_pack_chunks",
    "pipe_decontaminate",
    "multimodal_resize",
    "multimodal_frames",
    "text_quality_gate",
    "text_redact",
    "pipe_weighted_sample",
    "pipe_corpus_build",
    "dedup_minhash_components",
    "multimodal_audio",
    "text_token_rarity",
    "text_repetition",
    "embed_quantize",
    "pipe_sliding_chunks",
    "promql_topk_rate",
    "promql_vector_math",
    "promql_quantile_agg",
    "promql_histogram_quantile",
    # -- new in round 4 ---------------------------------------------------
    "promql_rate_extrapolated",
    "promql_deriv_predict",
    "promql_resets_changes",
    "promql_quantile_last_over_time",
    "kibana_terms_metrics",
    "kibana_date_histogram",
    "kibana_top_hits_latest",
    # -- changed in round 4 (new oracle / new semantics) ------------------
    "dedup_simhash",
    "dedup_minhash_lsh",
    "embed_near_dup_lsh",
    "embed_ivf_topk",
    "embed_cluster_dedup",
    # -- round-4 regression canaries (decimal-accumulation rework etc.) ---
    "a1_a4_grouped_metrics",
    "a7_multikey_drilldown",
    "a8_having",
    "scale_salted_agg",
    "qtj_series_arith",
    "w7_session_window",
    "w11_rollup_cascade",
    "w2_rate",
    "a11_percentile",
    "j2_broadcast_lookup",
    "j7_range_join",
    "p1_objectname_pivot",
    "p2_normalize_pipeline",
    "rules_rewrite",
    "dedup_components",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
