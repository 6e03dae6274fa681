"""Deterministic fake Kafka Connect REST endpoint for tests
(FIXTURES.md §3 shapes)."""

from __future__ import annotations

import json

_STATUS = {
    "s3-sink": {
        "name": "s3-sink",
        "type": "sink",
        "connector": {"state": "RUNNING", "worker_id": "w1:8083"},
        "tasks": [
            {"id": 0, "state": "RUNNING", "worker_id": "w1:8083"},
            {"id": 1, "state": "RUNNING", "worker_id": "w2:8083"},
        ],
    },
    "jdbc-source": {
        "name": "jdbc-source",
        "type": "source",
        "connector": {"state": "PAUSED", "worker_id": "w1:8083"},
        "tasks": [],
    },
}


def fetch(url: str, timeout: float = 10.0) -> str | None:
    if url.endswith("/connectors"):
        return json.dumps(sorted(_STATUS))
    for name, doc in _STATUS.items():
        if url.endswith(f"/connectors/{name}/status"):
            return json.dumps(doc)
    return None
