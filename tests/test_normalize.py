"""Golden normalization tests (SURVEY.md §5 item 2, FIXTURES.md §1-2).

Fixed Jolokia envelopes → expected normalized rows; timestamps injected
as data so outputs are byte-stable.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row

from kafka_metrics_exporter_spark.operators import normalize_scrapes, to_json_records
from kafka_metrics_exporter_spark.schema import RAW_SCRAPE_SCHEMA

POLL_MS = 1700000000000

WILDCARD_BODY = json.dumps(
    {
        "request": {"mbean": "kafka.server:*", "type": "read"},
        "status": 200,
        "timestamp": POLL_MS // 1000,
        "value": {
            "kafka.server:type=BrokerTopicMetrics,name=MessagesInPerSec,topic=t1": {
                "Count": 123,
                "MeanRate": 4.2,
                "OneMinuteRate": 3.9,
            },
            "kafka.server:type=ReplicaManager,name=UnderReplicatedPartitions": {
                "Value": 0
            },
        },
    }
)

EXACT_BODY = json.dumps(
    {
        "request": {"mbean": "java.lang:type=Memory", "type": "read"},
        "status": 200,
        "value": {
            "HeapMemoryUsage": {"init": 1, "used": 2, "committed": 3, "max": 4},
            "ObjectPendingFinalizationCount": 0,
        },
    }
)

FAILED_BODY = json.dumps({"request": {"mbean": "kafka.server:*"}, "status": 404})

NO_COLON_BODY = json.dumps(
    {
        "request": {"mbean": "version", "type": "read"},
        "status": 200,
        "value": {"agent": "1.6.2", "protocol": "7.2"},
    }
)


def _raw_df(spark, rows):
    return spark.createDataFrame(rows, RAW_SCRAPE_SCHEMA)


@pytest.fixture(scope="module")
def normalized(spark):
    rows = [
        ("http://kafka1:49901/jolokia/read/kafka.server:*", "KafkaBroker", POLL_MS, 200, WILDCARD_BODY),
        ("http://kafka1:49901/jolokia/read/java.lang:type=Memory", "KafkaBroker", POLL_MS, 200, EXACT_BODY),
        ("http://kafka2:49901/jolokia/read/kafka.server:*", "KafkaBroker", POLL_MS, 500, WILDCARD_BODY),
        ("http://kafka3:49901/jolokia/read/kafka.server:*", "KafkaBroker", POLL_MS, 200, FAILED_BODY),
        ("http://zk1:8778/jolokia/version", "ZooKeeper", POLL_MS, 200, NO_COLON_BODY),
    ]
    df = normalize_scrapes(_raw_df(spark, rows))
    return {r["mbean_name"]: r for r in df.collect()}, df


def test_row_count_one_per_mbean(normalized):
    rows, _ = normalized
    # 2 wildcard mbeans + 1 exact + 1 no-colon; failed HTTP + failed
    # Jolokia status dropped (P4)
    assert len(rows) == 4


def test_objectname_pivot(normalized):
    rows, _ = normalized
    r = rows["kafka.server:type=BrokerTopicMetrics,name=MessagesInPerSec,topic=t1"]
    assert r["bean_domain"] == "kafka.server"
    assert r["bean_props"] == {
        "type": "BrokerTopicMetrics",
        "name": "MessagesInPerSec",
        "topic": "t1",
    }
    assert r["num_attributes"]["Count"] == 123.0
    assert r["num_attributes"]["MeanRate"] == pytest.approx(4.2)
    assert r["attributes"]["Count"] == "123"


def test_metadata_injection(normalized):
    rows, _ = normalized
    r = rows["kafka.server:type=ReplicaManager,name=UnderReplicatedPartitions"]
    assert r["server_type"] == "KafkaBroker"
    assert r["host_name"] == "kafka1:49901"
    assert r["created_ms"] == POLL_MS
    assert r["created_ts"].year >= 2023


def test_exact_bean_rewrap_and_nested_composite(normalized):
    rows, _ = normalized
    r = rows["java.lang:type=Memory"]
    assert r["bean_domain"] == "java.lang"
    assert r["bean_props"] == {"type": "Memory"}
    # nested composite survives as JSON string (dotted-path queryable)
    heap = json.loads(r["attributes"]["HeapMemoryUsage"])
    assert heap["used"] == 2
    # composite is not in the numeric projection; scalar attr is
    assert "HeapMemoryUsage" not in r["num_attributes"]
    assert r["num_attributes"]["ObjectPendingFinalizationCount"] == 0.0


def test_no_colon_key(normalized):
    rows, _ = normalized
    r = rows["version"]
    assert r["bean_domain"] is None
    assert r["bean_props"] == {}
    assert r["attributes"]["agent"] == "1.6.2"


def test_json_round_trip(normalized, spark):
    _, df = normalized
    out = {json.loads(r["value"])["mbeanName"]: json.loads(r["value"]) for r in to_json_records(df).collect()}
    doc = out["kafka.server:type=BrokerTopicMetrics,name=MessagesInPerSec,topic=t1"]
    assert doc["injectedServerType"] == "KafkaBroker"
    assert doc["injectedHostName"] == "kafka1:49901"
    assert doc["topic"] == "t1"
    assert doc["Count"] == "123"
    assert doc["createdDateTime"] == str(POLL_MS)


def test_normalizer_plan_has_no_python_udf(normalized):
    _, df = normalized
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
