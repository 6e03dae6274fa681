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
CURRENT_ROUND = 15

# Explicit first-window ordering for ROUND 15.
#
# The r14 gate RAN (CORRECTNESS_r14.json: 50/50 green), so the rotation
# executes as the r14 verdict ordered (item 1):
#   - of the 48 queries whose latest driver row is r13 (two gate-runs
#     old, enumerated by test_rotation_promotes_stale_rows as
#     r13-minus-r14), 35 PROMOTE into the window and 13 demote into
#     STALE_OUT_OF_WINDOW, each with an in-window sibling pinning the
#     same machinery (justifications below);
#   - the 8 r10-latest rows — the entire >=4-gate-run ledger tail —
#     promote (a9b_sum_of_topk, dedup_components_star,
#     multimodal_channel_stats, o7_except_all,
#     promql_histogram_quantile_grid, promql_topk_rate_grid,
#     promql_vector_compare, w7b_sliding_window), lifting the ledger
#     floor to r11-latest;
#   - 5 new registrations (the round-15 vocabulary: bucket_correlation
#     / bucket_count_ks_test / sampler / ip_range, plus the merge-BPE
#     token counter) and 2 semantic changes (t_test now emits ES's
#     p-value; categorize_text merges below threshold 100) claim the
#     rest.
#
# Slot arithmetic: 35 promotions + 8 r10-tail + 5 new + 2 changed = 50.
# Out-of-window debt after this rotation: the 50 r14-verified rows
# (1 run old), the 13 demoted r13 rows (2 runs), last round's 15 r12
# demotions (3 runs) and 21 r11 demotions (4 runs); every out-of-window
# row is re-attested this round via tools/check_oracle.py at sf0.01 AND
# sf0.1 (BASELINE.md round-15 addendum), replayed against its DuckDB
# oracle at sf0.001 by tests/test_queries_oracle.py every session, and
# hash-pinned by the round-15 FULL GOLDEN re-record.

# Queries with no driver CORRECTNESS row in any EXISTING correctness
# file — must be in-window.
NEW_THIS_ROUND: list[str] = [
    # round-15 ES x-pack sibling significance pipelines (VERDICT r14
    # item 2): membership-Pearson bucket_correlation and the one-sample
    # KS test over bucket doc counts
    "kibana_bucket_correlation",
    "kibana_ks_test",
    # round-15 remaining reachable ES vocabulary (VERDICT r14 item 6):
    # plain sampler (deterministic residue top-k) and ip_range
    # (from/to + CIDR masks over IPv4, uint32 Column math)
    "kibana_sampler",
    "kibana_ip_range",
    # round-15 merge-table BPE token counting (VERDICT r14 item 7):
    # Sennrich-trained table, GPT-2 greedy encoder in one mapInPandas
    # pass, recursive-CTE DuckDB twin over unique words
    "text_bpe_tokens",
]

# Queries whose engine semantics changed this round — re-verification
# required even though an older row is green (ADVICE r4).
CHANGED_THIS_ROUND: list[str] = [
    # r15 (VERDICT r14 item 3): t_test now emits ES's actual returned
    # value — the two-sided p (Lanczos + incomplete-beta CF Column
    # math, recursive-CTE SQL twin); the row gains welch_p/pooled_p/
    # paired_p branches.  Also carries the frequent_item_sets plan fold
    # (support denominator rides the plan; eager-materialize +
    # unpersist — ADVICE r14).
    "kibana_stats_tests",
    # r15 (VERDICT r14 item 4): similarity_threshold < 100 now compiles
    # to the deterministic frequency-seeded merge (pointer-jump
    # closure, unanimity-wildcard keys); the row gains the 'merged'
    # branch and its output schema changed.
    "kibana_categorize_text",
]

CHANGED_OUT_OF_WINDOW: list[str] = []

# r13-latest queries the 50-slot arithmetic cannot fit once the 8
# r10-tail promotions (VERDICT r14 item 1) + 5 new + 2 changed claimed
# their slots (48 r13-latest candidates + 8 + 5 + 2 = 63 candidates
# for 50 slots -> 13 demotions).  Selection: code untouched since
# their green r13 row AND an in-window sibling exercising the same
# machinery; every one is replayed against its DuckDB oracle at
# sf0.001 by tests/test_queries_oracle.py EVERY session, re-attested
# at sf0.01 and sf0.1 via tools/check_oracle.py this round, and
# hash-pinned by the round-15 FULL GOLDEN re-record.
STALE_OUT_OF_WINDOW: list[str] = [
    # PromQL scalar-function pack compile path pinned by
    # promql_round_scalar (in-window promotion)
    "promql_trig_group",
    # calendar scalars share the same scalar-call compile path
    # (promql_round_scalar); fixed-timestamp evaluation pinned by
    # promql_at_offset (in-window promotion)
    "promql_calendar",
    # topk-of-rate grid machinery pinned by promql_topk_rate_grid
    # (r10-tail promotion, in-window)
    "w10_topk_rate_nonempty",
    # broadcast-bench blocked-matmul cosine kernel pinned by
    # embed_cluster_dedup (in-window promotion, same kernel)
    "embed_decontaminate",
    # thresholds over the same quality_columns pinned by text_metrics
    # (in-window promotion)
    "text_quality_gate",
    # scan-local text Column algebra (regexp_replace chain) pinned by
    # text_metrics (in-window promotion, same module)
    "text_redact",
    # two-stage partial->final aggregation shape pinned by
    # a9b_sum_of_topk (r10-tail promotion, in-window)
    "scale_salted_agg",
    # the query_string predicate compiler is exercised in-window by
    # kibana_stats_tests' t_test population filters (CHANGED)
    "kibana_query_string",
    # fixed-interval date bucketing pinned by kibana_pipeline
    # (in-window promotion — its pipeline aggs ride a date_histogram)
    "kibana_date_histogram",
    # terms bucket + metrics machinery pinned by
    # kibana_bucket_correlation (NEW — terms x histogram x metrics)
    "kibana_terms_metrics",
    # numeric histogram bucketing pinned by kibana_ks_test (NEW — the
    # histogram bucket table is its input relation)
    "kibana_histogram_stats",
    # md5-residue deterministic keep-set pinned by kibana_sampler
    # (NEW, same residue machinery)
    "pipe_stratified_sample",
    # array-explode denormalize shape pinned by kibana_ip_range (NEW —
    # overlap-explode of range matches)
    "j5_explode_parent_child",
]

WINDOW_PRIORITY = [
    # -- round-15 registrations + semantic changes claim slots here ----
    *NEW_THIS_ROUND,
    *CHANGED_THIS_ROUND,
    # -- latest driver row is r10 (4 gate-runs old): full tail burn-down
    "a9b_sum_of_topk",
    "dedup_components_star",
    "multimodal_channel_stats",
    "o7_except_all",
    "promql_histogram_quantile_grid",
    "promql_topk_rate_grid",
    "promql_vector_compare",
    "w7b_sliding_window",
    # -- latest driver row is r13 (2 gate-runs old): the 35 promotions
    # aggregation / relational / scraper core
    "a10_sum_without",
    "a5_count_distinct",
    "j1_cross_join",
    "j7_range_join",
    "openmetrics_roundtrip",
    "p1_objectname_pivot",
    "rules_rewrite",
    "streaming_alerts_replay",
    "w11_rollup_cascade",
    "w12_window_time_cascade",
    "w7_session_window",
    # dedup / embedding / pipeline family
    "dedup_minhash_components",
    "dedup_url",
    "embed_binary_topk",
    "embed_cluster_dedup",
    "embed_ivfpq_topk",
    "multimodal_frames",
    "pipe_bloom_decontaminate",
    "pipe_corpus_build",
    "pipe_dsir_resample",
    "pipe_pack_chunks",
    "text_metrics",
    "text_tfidf_topk",
    "text_token_rarity",
    # PromQL surface
    "promql_at_offset",
    "promql_label_functions",
    "promql_limit_sample",
    "promql_over_time_pack",
    "promql_quantile_agg",
    "promql_resets_changes",
    "promql_round_scalar",
    "promql_rules_group",
    "promql_set_ops",
    # Kibana surface
    "kibana_composite",
    "kibana_pipeline",
]


def _reorder() -> None:
    for d in (QUERIES, ORACLE_SQL):
        items = dict(d)
        ordered = {n: items[n] for n in WINDOW_PRIORITY if n in items}
        ordered.update({n: v for n, v in items.items() if n not in ordered})
        d.clear()
        d.update(ordered)


_reorder()
