from __future__ import annotations

import json

from kafka_metrics_exporter_spark.sinks.es_setup import (
    bootstrap_elasticsearch,
    index_template_body,
    kibana_index_pattern_body,
)


def test_template_types_only_created_datetime():
    body = index_template_body()
    assert body["index_patterns"] == ["kafka-jmx-logs-*"]
    assert body["mappings"]["properties"] == {"createdDateTime": {"type": "date"}}


def test_bootstrap_puts_template_pattern_and_dashboards():
    calls = []
    put = lambda path, body: calls.append((path, json.loads(body))) or True  # noqa: E731
    results = bootstrap_elasticsearch(
        put, dashboard_objects=[{"id": "jmx-dash", "type": "dashboard"}]
    )
    assert all(results.values())
    paths = [p for p, _ in calls]
    assert paths == [
        "_template/kafka-jmx-logs-template",
        ".kibana/_doc/index-pattern:kafka-jmx-logs-*",
        ".kibana/_doc/jmx-dash",
    ]
    assert kibana_index_pattern_body()["attributes"]["timeFieldName"] == "createdDateTime"
