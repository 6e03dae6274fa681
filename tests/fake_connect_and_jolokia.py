"""Combined fake fetcher: Jolokia reads + Connect REST endpoints."""

from __future__ import annotations

from kafka_metrics_exporter_spark.sources.fetchers import fake_jolokia_fetcher
from tests.fake_connect import fetch as connect_fetch


def fetch(url: str, timeout: float = 10.0) -> str | None:
    if "/jolokia/" in url:
        return fake_jolokia_fetcher(url, timeout)
    return connect_fetch(url, timeout)
