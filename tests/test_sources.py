"""Source tests: catalog build (J1/O1/O3), Jolokia DataSource (S1/S2),
Connect REST two-phase scan (S3/J4/J5), K8s catalog provider (S4/P6/P7)."""

from __future__ import annotations

import json

import pytest

from kafka_metrics_exporter_spark.operators import normalize_scrapes
from kafka_metrics_exporter_spark.sources.connect_rest import (
    connect_rest_scan,
    status_to_jmx_records,
)
from kafka_metrics_exporter_spark.sources.jolokia import (
    build_url_catalog,
    read_jolokia,
)
from kafka_metrics_exporter_spark.sources.k8s_catalog import (
    build_selectors,
    merge_server_lists,
    pods_to_catalog,
)

FAKE = "kafka_metrics_exporter_spark.sources.fetchers:fake_jolokia_fetcher"


# --- catalog build ---------------------------------------------------------
def test_build_url_catalog_cross_product_and_default_beans():
    cat = build_url_catalog({"KafkaBroker": ["kafka1:49901", "kafka2:49901"]})
    urls = [u for _, u in cat]
    # 2 hosts × (1 broker pattern + 1 common default) = 4, deduped
    assert len(urls) == 4
    assert "http://kafka1:49901/jolokia/read/kafka.*:*" in urls
    assert "http://kafka1:49901/jolokia/read/java.lang:type=Memory" in urls


def test_build_url_catalog_unknown_type_gets_default_pattern():
    cat = build_url_catalog({"Discovered": ["10.0.0.5:8778"]}, common_mbeans=[])
    assert cat == [("Discovered", "http://10.0.0.5:8778/jolokia/read/kafka.*:*")]


def test_build_url_catalog_dedupes():
    cat = build_url_catalog(
        {"KafkaBroker": ["kafka1:49901", "kafka1:49901"]}, common_mbeans=[]
    )
    assert len(cat) == 1


# --- Jolokia DataSource ----------------------------------------------------
@pytest.fixture(scope="module")
def jolokia_batch(spark):
    cat = build_url_catalog(
        {"KafkaBroker": ["kafka1:49901"], "ZooKeeper": ["zk1:8778"]}
    )
    return read_jolokia(spark, cat, fetcher=FAKE).cache()


def test_jolokia_source_scans_every_url(jolokia_batch):
    rows = jolokia_batch.collect()
    assert len(rows) == 4  # one row per catalog URL
    assert all(r["http_status"] == 200 for r in rows)
    assert {r["server_type"] for r in rows} == {"KafkaBroker", "ZooKeeper"}


def test_jolokia_source_normalizes_end_to_end(jolokia_batch):
    m = normalize_scrapes(jolokia_batch)
    rows = m.collect()
    assert len(rows) > 4  # wildcard reads expand to multiple mbeans
    by_domain = {r["bean_domain"] for r in rows}
    assert "kafka.server" in by_domain and "java.lang" in by_domain
    assert all(r["host_name"] in ("kafka1:49901", "zk1:8778") for r in rows)


def test_jolokia_source_streaming_microbatch(spark, tmp_path):
    cat = build_url_catalog({"KafkaBroker": ["kafka1:49901"]}, common_mbeans=[])
    stream = read_jolokia(spark, cat, fetcher=FAKE, streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jolokia_smoke")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM jolokia_smoke").collect()
    assert len(out) == 1 and out[0]["http_status"] == 200


# --- Connect REST ----------------------------------------------------------
def test_connect_rest_scan_two_phase(spark):
    scan = connect_rest_scan(
        spark,
        ["http://connect1:8083"],
        fetcher="tests.fake_connect:fetch",
        execution_ts=1700000000000,
    )
    rows = {r["mbean_name"]: r for r in scan.collect()}
    # s3-sink has 2 tasks → 2 task rows; jdbc-source has none → 1 row
    assert len(rows) == 3
    task0 = rows[
        "kafka.connect.api.rest:type=rest-api-metrics,connector=s3-sink,"
        "connector-type=sink,task-id=0"
    ]
    assert task0["attributes"]["connector-status"] == "RUNNING"
    assert task0["attributes"]["task-status"] == "RUNNING"
    assert task0["bean_props"]["connector"] == "s3-sink"
    assert task0["server_type"] == "KafkaConnect"
    assert task0["host_name"] == "connect1:8083"
    conn_only = rows[
        "kafka.connect.api.rest:type=rest-api-metrics,connector=jdbc-source,"
        "connector-type=source"
    ]
    assert conn_only["attributes"] == {"connector-status": "PAUSED"}


def test_status_to_jmx_records_explode_keeps_parent(spark):
    status = spark.createDataFrame(
        [
            (
                "http://c:8083",
                "conn-a",
                "sink",
                "RUNNING",
                "w1:8083",
                [(0, "RUNNING", "w1:8083"), (1, "FAILED", "w2:8083")],
            )
        ],
        "endpoint string, name string, connector_type string, connector_state string,"
        "connector_worker_id string, tasks array<struct<id:long,state:string,worker_id:string>>",
    )
    rows = status_to_jmx_records(status).collect()
    assert len(rows) == 2
    assert all("connector=conn-a" in r["mbean_name"] for r in rows)
    states = {r["attributes"]["task-status"] for r in rows}
    assert states == {"RUNNING", "FAILED"}


# --- Basic auth + TLS options (S3 auth; reference
# Code/ConnectRESTMetrics.py:99-111 HTTPBasicAuth + session.verify) --------
@pytest.fixture(scope="module")
def auth_server():
    """Local HTTP server that 401s unless Authorization matches
    Basic base64('scott:tiger'); serves a minimal Connect REST API."""
    import base64
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    expected = "Basic " + base64.b64encode(b"scott:tiger").decode()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.headers.get("Authorization") != expected:
                self.send_response(401)
                self.end_headers()
                return
            if self.path == "/connectors":
                body = json.dumps(["s3-sink"])
            elif self.path == "/connectors/s3-sink/status":
                body = json.dumps(
                    {
                        "name": "s3-sink",
                        "type": "sink",
                        "connector": {"state": "RUNNING", "worker_id": "w1:8083"},
                        "tasks": [
                            {"id": 0, "state": "RUNNING", "worker_id": "w1:8083"}
                        ],
                    }
                )
            else:
                body = json.dumps({"status": 200, "value": 1.0})
            data = body.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):  # quiet
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_fetcher_sends_basic_auth(auth_server):
    from kafka_metrics_exporter_spark.sources.fetchers import http_fetcher

    # no creds → 401 → skip-and-continue None
    assert http_fetcher(auth_server + "/connectors", 5.0) is None
    body = http_fetcher(
        auth_server + "/connectors", 5.0, user="scott", password="tiger"
    )
    assert json.loads(body) == ["s3-sink"]
    # wrong password → None, not an exception
    assert (
        http_fetcher(auth_server + "/connectors", 5.0, user="scott", password="x")
        is None
    )


def test_connect_rest_scan_with_auth(spark, auth_server):
    scan = connect_rest_scan(
        spark,
        [auth_server],
        execution_ts=1700000000000,
        user="scott",
        password="tiger",
    )
    rows = scan.collect()
    assert len(rows) == 1
    assert rows[0]["attributes"]["task-status"] == "RUNNING"
    # without creds the secured cluster yields nothing (every call 401s)
    empty = connect_rest_scan(spark, [auth_server], execution_ts=1700000000000)
    assert empty.count() == 0


def test_jolokia_datasource_threads_auth_options(spark, auth_server):
    """auth_user/auth_password options reach the executor-side fetcher."""
    cat = [("KafkaBroker", auth_server + "/jolokia/read/java.lang:type=Memory")]
    rows = read_jolokia(
        spark, cat, user="scott", password="tiger"
    ).collect()
    assert len(rows) == 1 and rows[0]["http_status"] == 200
    denied = read_jolokia(spark, cat).collect()
    assert denied[0]["http_status"] == 599  # fetch failed without creds


# --- K8s catalog -----------------------------------------------------------
def test_pods_to_catalog_annotation_gating():
    pods = [
        {"pod_ip": "10.0.0.1", "phase": "Running",
         "annotations": {"jolokia/is_enabled": "true", "jolokia/port": "8778"}},
        {"pod_ip": "10.0.0.2", "phase": "Running",
         "annotations": {"jolokia/is_enabled": "true", "jolokia/port": "8778",
                         "jolokia/server_type": "KafkaBroker"}},
        {"pod_ip": "10.0.0.3", "phase": "Running", "annotations": {}},  # not enabled
        {"pod_ip": "10.0.0.4", "phase": "Pending",
         "annotations": {"jolokia/is_enabled": "true", "jolokia/port": "8778"}},
        {"pod_ip": "10.0.0.5", "phase": "Running",
         "annotations": {"jolokia/is_enabled": "true"}},  # no port
    ]
    cat = pods_to_catalog(pods)
    assert cat == {
        "Discovered": ["http://10.0.0.1:8778"],
        "KafkaBroker": ["http://10.0.0.2:8778"],
    }


def test_selectors_force_running_phase():
    labels, fields = build_selectors({"app": "kafka"}, {"spec.nodeName": "n1"})
    assert labels == "app=kafka"
    assert "status.phase=Running" in fields and "spec.nodeName=n1" in fields


def test_merge_server_lists_union_and_new_types():
    merged = merge_server_lists(
        {"KafkaBroker": ["http://k1:1", "http://k2:1"]},
        {"KafkaBroker": ["http://k2:1", "http://k3:1"], "KSQL": ["http://q1:1"]},
    )
    assert merged["KafkaBroker"] == ["http://k1:1", "http://k2:1", "http://k3:1"]
    assert merged["KSQL"] == ["http://q1:1"]


def test_connect_endpoints_ride_the_datasource(spark):
    """Connect REST endpoints become extra source partitions emitting a
    synthetic Jolokia envelope that the stock normalizer consumes."""
    from kafka_metrics_exporter_spark.sources.jolokia import read_jolokia

    cat = build_url_catalog({"KafkaBroker": ["kafka1:49901"]}, common_mbeans=[])
    raw = read_jolokia(
        spark,
        cat,
        fetcher="tests.fake_connect_and_jolokia:fetch",
        connect_endpoints=["http://connect1:8083"],
    )
    rows = raw.collect()
    assert len(rows) == 2  # 1 jolokia URL + 1 connect endpoint
    m = normalize_scrapes(raw)
    by_domain = {}
    for r in m.collect():
        by_domain.setdefault(r["bean_domain"], []).append(r)
    assert "kafka.connect.api.rest" in by_domain
    connect_rows = by_domain["kafka.connect.api.rest"]
    assert len(connect_rows) == 3  # 2 task rows + 1 connector-only row
    assert all(r["server_type"] == "KafkaConnect" for r in connect_rows)
    assert any(
        r["bean_props"].get("task-id") == "0"
        and r["attributes"]["task-status"] == "RUNNING"
        for r in connect_rows
    )
