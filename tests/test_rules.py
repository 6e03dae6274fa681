"""Rule-engine conformance (SURVEY.md §5 item 3, FIXTURES.md §5):
input-MBean → expected (name, labels, value, type), including
first-match-wins ordering, percentile→quantile mapping, value
constants, valueFactor, and label-name captures."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.rules import (
    build_match_string,
    compile_rules,
    load_rules_file,
    rewrite_metrics,
)
from kafka_metrics_exporter_spark.rules.compiler import (  # noqa: F811
    RewriteRule,
    load_rules_file,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _apply(spark, rules_file, cases):
    """cases: list of (domain, props{k:v ordered}, attr, value_str).
    Returns list of rewrite dicts (None where unmatched)."""
    rules, lower = load_rules_file(os.path.join(FIX, rules_file))
    rows = [
        (domain, list(props.items()), attr, val)
        for domain, props, attr, val in cases
    ]
    df = spark.createDataFrame(
        rows,
        "domain string, props array<struct<key:string,value:string>>, attr string, val string",
    )
    out = df.withColumn(
        "_m",
        build_match_string(
            F.col("domain"),
            F.map_from_entries("props"),
            F.col("attr"),
            F.col("val"),
        ),
    ).withColumn(
        "_rw", compile_rules(rules, lower)(F.col("_m"), F.col("val").try_cast("double"))
    )
    return [r["_rw"].asDict() if r["_rw"] is not None else None for r in out.collect()]


def test_kafka_counter_and_gauge_families(spark):
    [persec_kv, persec, gauge, pctl] = _apply(
        spark,
        "kafka_rules.yml",
        [
            (
                "kafka.server",
                {"type": "BrokerTopicMetrics", "name": "MessagesInPerSec", "topic": "t1"},
                "Count",
                "123",
            ),
            (
                "kafka.server",
                {"type": "BrokerTopicMetrics", "name": "BytesOutPerSec"},
                "Count",
                "77",
            ),
            (
                "kafka.server",
                {"type": "ReplicaManager", "name": "UnderReplicatedPartitions"},
                "Value",
                "0",
            ),
            (
                "kafka.network",
                {"type": "RequestMetrics", "name": "TotalTimeMs", "request": "Produce"},
                "99thPercentile",
                "7.0",
            ),
        ],
    )
    assert persec_kv["metric_name"] == "kafka_brokers_server_brokertopicmetrics_messagesin_total"
    assert persec_kv["metric_type"] == "COUNTER"
    assert persec_kv["labels"] == {"topic": "t1", "serverType": "KafkaBrokers"}
    assert persec_kv["value"] == 123.0

    assert persec["metric_name"] == "kafka_brokers_server_brokertopicmetrics_bytesout_total"
    assert gauge["metric_name"] == "kafka_brokers_server_replicamanager_underreplicatedpartitions"
    assert gauge["metric_type"] == "GAUGE"

    # percentile attr → quantile label (label-name capture + "0.$n")
    assert pctl["metric_name"] == "kafka_brokers_network_requestmetrics_totaltimems"
    assert pctl["labels"] == {
        "request": "Produce",
        "quantile": "0.99",
        "serverType": "KafkaBrokers",
    }
    assert pctl["value"] == 7.0


def test_first_match_wins_special_over_generic(spark):
    [special] = _apply(
        spark,
        "kafka_rules.yml",
        [
            (
                "kafka.server",
                {
                    "type": "FetcherLagMetrics",
                    "name": "ConsumerLag",
                    "clientId": "ReplicaFetcherThread-0-1",
                    "topic": "t1",
                    "partition": "0",
                },
                "Value",
                "42",
            )
        ],
    )
    # the generic kv-gauge rule also matches, but the special rule is
    # first in the file: name must NOT carry the generic $3 segment
    assert special["metric_name"] == "kafka_brokers_server_fetcherlagmetrics_consumerlag"
    assert special["labels"]["topic"] == "t1"
    assert special["labels"]["partition"] == "0"
    assert special["labels"]["clientId"] == "ReplicaFetcherThread-0-1"


def test_connect_value_factor_and_info_metrics(spark):
    [start_time, version_info, status] = _apply(
        spark,
        "connect_rules.yml",
        [
            ("kafka.connect", {"type": "app-info", "client-id": "c1"}, "start-time-ms", "1700000000000"),
            ("kafka.producer", {"type": "app-info", "client-id": "p1"}, "version", "2.3.1"),
            (
                "kafka.connect",
                {"type": "connector-task-metrics", "connector": "s3-sink", "task": "0"},
                "status",
                "running",
            ),
        ],
    )
    # valueFactor 0.001: ms → s
    assert start_time["metric_name"] == "kafka_connect_connect_start_time_seconds"
    assert start_time["value"] == pytest.approx(1700000000.0)

    # value: 1 constant + label captured from the VALUE portion
    assert version_info["metric_name"] == "kafka_connect_producer_version_info"
    assert version_info["value"] == 1.0
    assert version_info["labels"] == {"clientId": "p1", "version": "2.3.1"}

    # string state → constant-1 metric with status label
    assert status["value"] == 1.0
    assert status["labels"] == {"connector": "s3-sink", "task": "0", "status": "running"}


def test_zookeeper_hierarchy_and_counter_priority(spark):
    [root, packets, member_gauge, unmatched] = _apply(
        spark,
        "zookeeper_rules.yml",
        [
            ("org.apache.ZooKeeperService", {"name0": "ReplicatedServer_part1"}, "QuorumSize", "3"),
            (
                "org.apache.ZooKeeperService",
                {"name0": "ReplicatedServer_part1", "name1": "replica.1", "name2": "Follower"},
                "PacketsReceived",
                "100",
            ),
            (
                "org.apache.ZooKeeperService",
                {"name0": "ReplicatedServer_part1", "name1": "replica.1", "name2": "Follower"},
                "NodeCount",
                "5",
            ),
            ("java.lang", {"type": "Memory"}, "ObjectPendingFinalizationCount", "0"),
        ],
    )
    assert root["metric_name"] == "zookeeper_quorumsize"
    # Packets rule (earlier) wins over the generic member gauge; its
    # name template uses $5 (memberType) exactly as the shipped config
    assert packets["metric_name"] == "zookeeper_follower_total"
    assert packets["metric_type"] == "COUNTER"
    assert packets["labels"] == {
        "replicaId": "1",
        "memberType": "Follower",
        "serverType": "Zookeeper",
    }
    assert member_gauge["metric_name"] == "zookeeper_nodecount"
    assert member_gauge["labels"]["memberType"] == "Follower"
    # non-zookeeper domain: no rule fires
    assert unmatched is None


def test_rewrite_metrics_end_to_end(spark):
    """normalized metrics DF → rewritten metric rows, incl. unmatched
    fallback naming."""
    rules, lower = load_rules_file(os.path.join(FIX, "kafka_rules.yml"))
    metrics = spark.createDataFrame(
        [
            (
                "kafka.server:type=BrokerTopicMetrics,name=MessagesInPerSec,topic=t1",
                "kafka.server",
                "KafkaBroker",
                "b1:8778",
                1700000000000,
                [("type", "BrokerTopicMetrics"), ("name", "MessagesInPerSec"), ("topic", "t1")],
                [("Count", "123"), ("MeanRate", "4.2")],
            )
        ],
        "mbean_name string, bean_domain string, server_type string, host_name string,"
        "created_ms long, props array<struct<key:string,value:string>>,"
        "attrs array<struct<key:string,value:string>>",
    ).select(
        "mbean_name",
        "bean_domain",
        "server_type",
        "host_name",
        F.timestamp_millis("created_ms").alias("created_ts"),
        F.map_from_entries("props").alias("bean_props"),
        F.map_from_entries("attrs").alias("attributes"),
    )

    out = {r["metric_name"]: r for r in rewrite_metrics(metrics, rules, lower).collect()}
    assert set(out) == {"kafka_brokers_server_brokertopicmetrics_messagesin_total"}
    assert out["kafka_brokers_server_brokertopicmetrics_messagesin_total"]["value"] == 123.0

    with_fallback = {
        r["metric_name"]: r
        for r in rewrite_metrics(metrics, rules, lower, keep_unmatched=True).collect()
    }
    # MeanRate doesn't match any Count/Value/percentile rule → default name
    assert "kafka_server_brokertopicmetrics_messagesinpersec_t1_meanrate" in with_fallback
    assert with_fallback["kafka_server_brokertopicmetrics_messagesinpersec_t1_meanrate"]["value"] == 4.2


def test_mid_string_pattern_matches_like_jmx_exporter(spark):
    """jmx_exporter compiles ^.*(?:p).*$ + matches() — a pattern that
    starts mid-string (no domain anchor) must still select the rule."""
    from kafka_metrics_exporter_spark.rules.compiler import (
        RewriteRule,
        compile_rules,
    )

    rules = [
        RewriteRule(
            pattern=r"name=(\w+)PerSec><>Count",  # no leading domain
            name_tmpl="unanchored_$1",
        )
    ]
    df = spark.createDataFrame(
        [("kafka.server<type=BrokerTopicMetrics, name=MessagesInPerSec><>Count: 5",)],
        ["m"],
    )
    row = df.withColumn(
        "r", compile_rules(rules, lowercase=False)(F.col("m"), F.lit(5.0))
    ).collect()[0]
    assert row["r"] is not None
    assert row["r"]["metric_name"] == "unanchored_MessagesIn"


def test_unmatched_default_name_honors_lowercase_flag(spark):
    """lowercaseOutputName=false keeps the default (unmatched) metric
    name's original case, like every other metric name."""
    metrics = spark.createDataFrame(
        [
            (
                "java.lang:type=Memory",
                "java.lang",
                "KafkaBroker",
                "b1:8778",
                1700000000000,
                [("type", "Memory")],
                [("HeapUsage", "42")],
            )
        ],
        "mbean_name string, bean_domain string, server_type string, host_name string,"
        "created_ms long, props array<struct<key:string,value:string>>,"
        "attrs array<struct<key:string,value:string>>",
    ).select(
        "mbean_name",
        "bean_domain",
        "server_type",
        "host_name",
        F.timestamp_millis("created_ms").alias("created_ts"),
        F.map_from_entries("props").alias("bean_props"),
        F.map_from_entries("attrs").alias("attributes"),
    )
    no_match_rules = [RewriteRule(pattern="doesnotmatchanything", name_tmpl="x")]
    kept = rewrite_metrics(
        metrics, no_match_rules, lowercase=False, keep_unmatched=True
    ).collect()
    assert [r["metric_name"] for r in kept] == ["java_lang_Memory_HeapUsage"]
    lowered = rewrite_metrics(
        metrics, no_match_rules, lowercase=True, keep_unmatched=True
    ).collect()
    assert [r["metric_name"] for r in lowered] == ["java_lang_memory_heapusage"]


def test_rules_plan_is_pure_catalyst(spark):
    rules, lower = load_rules_file(os.path.join(FIX, "kafka_rules.yml"))
    df = spark.createDataFrame([("kafka.server<type=A, name=BPerSec><>Count: 1",)], ["m"])
    out = df.withColumn("r", compile_rules(rules, lower)(F.col("m"), F.lit(1.0)))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
