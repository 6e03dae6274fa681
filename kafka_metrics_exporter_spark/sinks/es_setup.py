"""Sink DDL bootstrap (SURVEY §2.1 S7): one-time Elasticsearch/Kibana
setup the reference performs on startup — PUT an index template typing
``createdDateTime`` as a date over the daily-index pattern, PUT the
Kibana index-pattern, and replay saved dashboard objects
(reference Code/ElasticSearchAppender.py:43-79).

Pure functions + a pluggable PUT callable: the payload builders are unit
tested; the HTTP step is the same urllib shape as sinks.es_bulk.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from kafka_metrics_exporter_spark.sinks.es_bulk import INDEX_PREFIX

TEMPLATE_NAME = "kafka-jmx-logs-template"
KIBANA_INDEX_PATTERN = INDEX_PREFIX + "*"


def index_template_body(shards: int = 1, replicas: int = 1) -> dict:
    """Dynamic mapping with only the scrape timestamp explicitly typed —
    the reference's schema-dynamic contract (ElasticSearchAppender.py:53-54;
    SURVEY §1.1 'schema-dynamic')."""
    return {
        "index_patterns": [KIBANA_INDEX_PATTERN],
        "settings": {
            "number_of_shards": shards,
            "number_of_replicas": replicas,
        },
        "mappings": {
            "properties": {
                "createdDateTime": {"type": "date"},
            }
        },
    }


def kibana_index_pattern_body(time_field: str = "createdDateTime") -> dict:
    return {
        "attributes": {
            "title": KIBANA_INDEX_PATTERN,
            "timeFieldName": time_field,
        }
    }


def bootstrap_elasticsearch(
    put: Callable[[str, str], bool],
    dashboard_objects: list[dict] | None = None,
) -> dict[str, bool]:
    """Run the three setup PUTs via the supplied ``put(path, body_json)``
    callable.  Returns per-step success flags."""
    results = {
        "index_template": put(
            f"_template/{TEMPLATE_NAME}", json.dumps(index_template_body())
        ),
        "kibana_index_pattern": put(
            f".kibana/_doc/index-pattern:{KIBANA_INDEX_PATTERN}",
            json.dumps(kibana_index_pattern_body()),
        ),
    }
    for i, obj in enumerate(dashboard_objects or []):
        # saved-objects exports key by `_id` (the reference's
        # ELK/jmx_dashboard.json shape); programmatic objects by `id`
        obj_id = obj.get("_id") or obj.get("id") or f"dashboard-{i}"
        results[f"saved_object:{obj_id}"] = put(
            f".kibana/_doc/{obj_id}", json.dumps(obj)
        )
    return results


def http_put(es_url: str, timeout: float = 30.0):
    """urllib PUT factory (same retry-free shape as the reference's
    setup path — setup either succeeds or the daemon proceeds anyway)."""
    import urllib.request

    def put(path: str, body: str) -> bool:
        req = urllib.request.Request(  # noqa: S310
            f"{es_url.rstrip('/')}/{path}",
            data=body.encode("utf-8"),
            headers={"Content-Type": "application/json"},
            method="PUT",
        )
        try:
            with urllib.request.urlopen(req, timeout=timeout):  # noqa: S310
                return True
        except Exception:  # noqa: BLE001
            return False

    return put
