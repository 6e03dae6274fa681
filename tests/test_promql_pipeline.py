"""Full-engine integration: raw Jolokia envelopes → normalize (P1-P5)
→ YAML rule rewriting (§2.7) → PromQL series view → a VERBATIM corpus
expression (reference Kafka_Brokers_Dashboard.json:1046 shape) compiled
and evaluated — the complete text-to-result path a reference user's
dashboard would take, with hand-computed expected rates."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.operators import normalize_scrapes
from kafka_metrics_exporter_spark.promql import compile_promql
from kafka_metrics_exporter_spark.rules import load_rules_file, rewrite_metrics
from kafka_metrics_exporter_spark.schema import RAW_SCRAPE_SCHEMA

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

T0_MS = 1700000000000
T1_MS = T0_MS + 60_000

CORPUS_EXPR = (
    'sum by (topic) (topk(3, '
    'rate(kafka_brokers_server_brokertopicmetrics_messagesin_total{topic != ""}[1m])))'
)


def _body(counts: dict[str, int], bytes_out: int) -> str:
    value = {
        f"kafka.server:type=BrokerTopicMetrics,name=MessagesInPerSec,topic={t}": {
            "Count": c
        }
        for t, c in counts.items()
    }
    # a topic-less series: must be excluded by {topic != ""}
    value["kafka.server:type=BrokerTopicMetrics,name=BytesOutPerSec"] = {
        "Count": bytes_out
    }
    return json.dumps(
        {"request": {"mbean": "kafka.server:*", "type": "read"}, "status": 200,
         "value": value}
    )


def test_corpus_expr_over_normalized_rewritten_metrics(spark):
    url = "http://kafka1:49901/jolokia/read/kafka.server:*"
    raw = spark.createDataFrame(
        [
            (url, "KafkaBroker", T0_MS, 200, _body({"t1": 1000, "t2": 500}, 10)),
            (url, "KafkaBroker", T1_MS, 200, _body({"t1": 7000, "t2": 800}, 400)),
        ],
        RAW_SCRAPE_SCHEMA,
    )
    metrics = normalize_scrapes(raw)

    rules, lower = load_rules_file(os.path.join(FIX, "kafka_rules.yml"))
    rewritten = rewrite_metrics(metrics, rules, lowercase=lower)

    series = rewritten.select(
        F.col("metric_name").alias("name"),
        F.col("created_ts").alias("ts"),
        "value",
        F.coalesce(F.element_at("labels", "topic"), F.lit("")).alias("topic"),
        F.col("host_name").alias("instance"),
        F.col("server_type").alias("job"),
    )
    # the rule chain really produced the corpus's metric name
    assert (
        series.filter(
            F.col("name") == "kafka_brokers_server_brokertopicmetrics_messagesin_total"
        ).count()
        == 4  # 2 topics × 2 polls
    )

    out = compile_promql(CORPUS_EXPR).evaluate(series)
    got = {r["topic"]: r["value"] for r in out.collect()}
    # rate over the 60 s poll gap: t1 (7000-1000)/60, t2 (800-500)/60;
    # the topic-less BytesOut series is filtered by the matcher
    assert got == {"t1": pytest.approx(100.0), "t2": pytest.approx(5.0)}


CONNECT_EXPR = "sum by ( connector) (kafka_connect_task_error_total_record_errors) > 0"


def _connect_body(errors: dict[tuple[str, int], int]) -> str:
    value = {
        f"kafka.connect:type=task-error-metrics,connector={c},task={t}": {
            "total-record-errors": n
        }
        for (c, t), n in errors.items()
    }
    return json.dumps(
        {"request": {"mbean": "kafka.connect:*", "type": "read"}, "status": 200,
         "value": value}
    )


def test_connect_rest_corpus_expr_end_to_end(spark):
    """VERDICT r6 item 6 — the Connect-REST sibling of the Jolokia
    thread above: one micro-batch merging the worker's Jolokia scrape
    (task-error-metrics beans) with the two-phase REST status scan
    (S3 list→detail, J5 explode; reference Code/ConnectRESTMetrics.py),
    rules-rewritten (fixture twin of configs/connect.yml), then the
    VERBATIM corpus expression (reference
    Kafka_Connect_Dashboard.json:656 family, including its quirky
    '( connector)' spacing) compiled and evaluated with pinned
    values."""
    from kafka_metrics_exporter_spark.streaming.pipeline import with_connect_rest

    url = "http://connect1:8083/jolokia/read/kafka.connect:*"
    raw = spark.createDataFrame(
        [
            (
                url,
                "KafkaConnect",
                T0_MS,
                200,
                _connect_body(
                    {("s3-sink", 0): 3, ("s3-sink", 1): 2, ("jdbc-source", 0): 0}
                ),
            )
        ],
        RAW_SCRAPE_SCHEMA,
    )
    metrics = normalize_scrapes(raw)
    merged = with_connect_rest(
        metrics,
        ["http://connect1:8083"],
        fetcher="tests.fake_connect:fetch",
        execution_ts=T0_MS,
    )
    # the REST phase really fanned out: connector-status rows for both
    # connectors, task rows exploded with parent fields (J5)
    rest_rows = merged.filter(
        F.col("mbean_name").startswith("kafka.connect.api.rest:")
    ).collect()
    assert {r["bean_props"]["connector"] for r in rest_rows} == {
        "s3-sink", "jdbc-source"
    }
    assert (
        sum(1 for r in rest_rows if "task-id=" in r["mbean_name"]) == 2
    )  # s3-sink's two tasks

    rules, lower = load_rules_file(os.path.join(FIX, "connect_rules.yml"))
    rewritten = rewrite_metrics(merged, rules, lowercase=lower)
    series = rewritten.select(
        F.col("metric_name").alias("name"),
        F.col("created_ts").alias("ts"),
        "value",
        F.coalesce(F.element_at("labels", "connector"), F.lit("")).alias(
            "connector"
        ),
        F.col("host_name").alias("instance"),
        F.col("server_type").alias("job"),
    )
    # the rule chain produced the corpus's metric name for every task
    assert (
        series.filter(
            F.col("name") == "kafka_connect_task_error_total_record_errors"
        ).count()
        == 3
    )

    out = compile_promql(CONNECT_EXPR).evaluate(series)
    got = {r["connector"]: r["value"] for r in out.collect()}
    # s3-sink: 3 + 2 across tasks; jdbc-source's 0 filtered by > 0
    assert got == {"s3-sink": 5.0}
