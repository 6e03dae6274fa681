"""Physical-plan quality pins (SURVEY §4): pushdown, broadcast joins,
and no accidental Python evaluation in JVM-only paths.  These are the
properties that keep the same code fast at 100 TB; pin them so a
refactor can't silently regress the plan shape."""

from __future__ import annotations

import contextlib
import io

import pytest

from kafka_metrics_exporter_spark.plans.queries import QUERIES


def plan_of(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_a1_filter_and_columns_pushed(spark, sf_dir):
    p = plan_of(spark, sf_dir, "a1_a4_grouped_metrics")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    # projection pruned to the 6 needed columns — no full-row scan
    read_schema = next(l for l in p.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read_schema and "l_shipdate" in read_schema
    # partial (map-side) + final aggregate around one exchange
    assert p.count("HashAggregate") >= 2


def test_j2_uses_broadcast_hash_join(spark, sf_dir):
    p = plan_of(spark, sf_dir, "j2_broadcast_lookup")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_o3_anti_join_pushes_date_filter(spark, sf_dir):
    p = plan_of(spark, sf_dir, "o3_anti_join")
    assert "LeftAnti" in p
    assert "GreaterThanOrEqual(o_orderdate" in p


def test_jvm_only_queries_have_no_python_eval(spark, sf_dir):
    for name in [
        "a1_a4_grouped_metrics",
        "w2_rate",
        "rules_rewrite",
        "p_scalar_pack",
        "dedup_ngram_jaccard",
        "text_langid",
    ]:
        p = plan_of(spark, sf_dir, name)
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_topk_is_take_ordered_not_global_sort(spark, sf_dir):
    p = plan_of(spark, sf_dir, "a9_topk_of_avg")
    assert "TakeOrderedAndProject" in p


def test_blocked_near_dup_has_single_shuffle(spark, sf_dir):
    """Blocked matmul: exactly one exchange (the pair_key groupBy) —
    vectors must not flow through a join shuffle."""
    import kafka_metrics_exporter_spark.plans  # noqa: F401  (registers llm queries)

    p = plan_of(spark, sf_dir, "embed_near_dup_cosine")
    # repartition (input spread) + groupBy pair_key; no join exchanges
    assert "Join" not in p
    assert p.count("+- Exchange") <= 2  # scan-spread + pair_key groupBy


def test_minhash_signatures_have_no_shuffle(spark, sf_dir):
    """Per-doc signature computation is shuffle-free apart from the
    input-spreading repartition."""
    from kafka_metrics_exporter_spark.llmdata.dedup import (
        minhash_signatures_from_docs,
    )
    from kafka_metrics_exporter_spark.plans.queries import _t

    import contextlib, io

    df = minhash_signatures_from_docs(_t(spark, sf_dir, "documents"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "HashAggregate" not in p and "Join" not in p
    assert p.count("+- Exchange") == 1  # only the round-robin input spread


def test_corpus_build_is_two_shuffles(spark, sf_dir):
    """pipe_corpus_build (gate → dedup → split) must cost exactly the
    two shuffles its docstring claims: the dedup digest groupBy and the
    survivor semi-join — the split/token columns are row-local."""
    import contextlib
    import io
    import re

    from kafka_metrics_exporter_spark.plans import QUERIES

    out = QUERIES["pipe_corpus_build"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    p = buf.getvalue()
    n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
    n_bcast = len(re.findall(r"\(\d+\) BroadcastExchange", p))
    # broadcast of the survivor side replaces a shuffle pair; either
    # plan shape is ≤ 2 data movements
    assert n_exchange + n_bcast <= 3, p[:2000]
    assert "CartesianProduct" not in p


def test_round4_front_end_queries_are_jvm_only(spark, sf_dir):
    """The PromQL range mode and every compiled Kibana query must stay
    pure Column plans — a front-end compiler that emitted Python eval
    would silently forfeit codegen at scale."""
    import kafka_metrics_exporter_spark.plans  # noqa: F401  (registers)
    from kafka_metrics_exporter_spark.plans import QUERIES as ALL_Q

    for name in [
        "promql_rate_extrapolated",
        "promql_deriv_predict",
        "promql_resets_changes",
        "promql_quantile_last_over_time",
        "kibana_terms_metrics",
        "kibana_date_histogram",
        "kibana_top_hits_latest",
    ]:
        df = ALL_Q[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_kibana_terms_metrics_is_single_aggregation(spark, sf_dir):
    """A terms+metrics table vis compiles to ONE hash aggregation over
    the bucket keys (partial+final around one exchange), not an
    aggregate per metric column."""
    import kafka_metrics_exporter_spark.plans  # noqa: F401
    from kafka_metrics_exporter_spark.plans import QUERIES as ALL_Q
    import re

    df = ALL_Q["kibana_terms_metrics"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    # two-phase count-distinct (2) and the metric-order level
    # aggregation — the documented compiler shape; the order metric
    # must come back broadcast, never via sort-merge join
    n_exchange = len(re.findall(r"\(\d+\) Exchange", p))
    assert n_exchange <= 4, p
    assert "BroadcastHashJoin" in p and "SortMergeJoin" not in p
    # round 6 (VERDICT r5 item 1): the top-level terms pick is a
    # TakeOrderedAndProject over the one-row-per-term aggregate plus a
    # broadcast LeftSemi join back — NO window at all (the previous
    # WindowGroupLimit-guarded single-partition rank is gone)
    assert "TakeOrderedAndProject" in p
    assert not re.search(r"\bWindow\b", p), p
    assert "LeftSemi" in p


def test_round5_matching_setop_queries_are_jvm_only(spark, sf_dir):
    """Vector matching and set operators compile to pure join plans —
    no Python eval, no cartesian product; the set-op semi/anti joins
    must be real semi/anti joins."""
    import re

    import kafka_metrics_exporter_spark.plans  # noqa: F401  (registers)
    from kafka_metrics_exporter_spark.plans import QUERIES as ALL_Q

    for name in [
        "promql_vector_matching",
        "promql_set_ops",
        "promql_topk_rate_grid",
        "promql_histogram_quantile_grid",
    ]:
        df = ALL_Q[name](spark, sf_dir)
        # eagerly-checkpointed results stash the executed plan
        df = getattr(df, "_pre_checkpoint", df)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name
        assert "CartesianProduct" not in p, name
    df = ALL_Q["promql_set_ops"](spark, sf_dir)
    df = getattr(df, "_pre_checkpoint", df)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert re.search(r"LeftSemi", p), "and must compile to a semi join"
    assert re.search(r"LeftAnti", p), "unless/or must compile to anti joins"


def test_fuzzy_decontaminate_broadcasts_the_benchmark_side(spark, sf_dir):
    """The 100 TB claim in llmdata/pipeline.py::fuzzy_decontaminate:
    the benchmark band buckets come in as a BROADCAST join (no shuffle
    of the training side for candidate generation), no Python eval
    outside the two Arrow signature scans, no cartesian product."""
    import re

    import kafka_metrics_exporter_spark.plans  # noqa: F401  (registers)
    from kafka_metrics_exporter_spark.plans import QUERIES as ALL_Q

    df = ALL_Q["pipe_fuzzy_decontaminate"](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    # EVERY join is broadcast — the training corpus is never shuffled
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # the only Python stages are the fused Arrow shingle+minhash scans
    # (one per corpus side) — nothing row-at-a-time
    assert "BatchEvalPython" not in p


def test_subquery_and_count_values_are_jvm_only(spark, sf_dir):
    import kafka_metrics_exporter_spark.plans  # noqa: F401  (registers)
    from kafka_metrics_exporter_spark.plans import QUERIES as ALL_Q

    for name in ["promql_subquery", "promql_count_values"]:
        df = ALL_Q[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        p = buf.getvalue()
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name
        assert "CartesianProduct" not in p, name


def test_stash_pre_checkpoint_with_and_without_attribute(spark):
    """VERDICT r6 item 7: the _pre_checkpoint hand-off lives behind
    stash_pre_checkpoint and plan_string falls back to the frame's own
    plan when the attribute is absent — fingerprinting works either
    way, and a frame that rejects attribute assignment degrades
    instead of crashing."""
    from kafka_metrics_exporter_spark.plans.fingerprint import (
        plan_fingerprint,
        plan_string,
        stash_pre_checkpoint,
    )

    from pyspark.sql import functions as F

    df = spark.range(10).groupBy((F.col("id") % 2).alias("k")).count()
    ck = df.localCheckpoint(eager=True)

    # without the stash: the checkpoint scan's own plan (no aggregate)
    assert "HashAggregate" not in plan_string(ck)
    fp_plain = plan_fingerprint(ck)

    # with the stash: the executed plan is recovered
    stashed = stash_pre_checkpoint(ck, df)
    assert stashed is ck
    assert "HashAggregate" in plan_string(stashed)
    assert plan_fingerprint(stashed)["exchange"] >= 1 >= fp_plain["exchange"]

    # a frame-like object that rejects attribute assignment: silently
    # skipped, fingerprint falls back to its own plan
    class Slotted:
        __slots__ = ("_jdf",)

        def __init__(self, jdf):
            self._jdf = jdf

    s = Slotted(ck._jdf)
    assert stash_pre_checkpoint(s, df) is s
    assert "HashAggregate" not in plan_string(s)
