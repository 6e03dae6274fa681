"""Jolokia polling source (SURVEY §2.1 S1/S2) as a PySpark DataSource.

The reference scatters one HTTP GET per scrape URL over a thread pool
and gathers results into an in-memory snapshot
(reference Code/JMXScraper.py:120-183).  Here the scrape catalog
becomes input partitions of a custom Python DataSource (Spark 4 public
API): each partition fetches one URL batch on an executor, so the
thread-pool fan-out is replaced by Spark task parallelism — on a
1000-executor cluster the same code polls 100k endpoints per trigger
with no driver bottleneck.

Batch:   spark.read.format("jolokia").option(...).load()
Stream:  spark.readStream.format("jolokia")...  (one poll per micro-
         batch; the reference's poll gate, Code/JMXScraper.py:186-197,
         maps to trigger(processingTime=...)).

Rows use schema.RAW_SCRAPE_SCHEMA; pipe into operators.normalize_scrapes.
"""

from __future__ import annotations

import itertools
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from kafka_metrics_exporter_spark.schema import RAW_SCRAPE_SCHEMA

DEFAULT_MBEANS: dict[str, list[str]] = {
    # per-server-type poll patterns (reference Code/main.py:144-153)
    "ZooKeeper": ["org.apache.ZooKeeperService:*"],
    "KafkaBroker": ["kafka.*:*"],
    "KafkaConnect": ["kafka.*:*"],
    "KSQL": ["kafka.*:*", "io.confluent.*:*"],
}
# appended for every unique host (reference Code/main.py:152-153,
# Code/JMXScraper.py:21 default_JMX_fetch)
DEFAULT_COMMON_MBEANS = ["java.lang:type=Memory"]


def build_url_catalog(
    servers: dict[str, list[str]],
    mbeans: dict[str, list[str]] | None = None,
    common_mbeans: list[str] | None = None,
) -> list[tuple[str, str]]:
    """servers × mbean-patterns → deduped scrape URL catalog.

    Reproduces return_url_set's cross product (reference
    Code/main.py:197-202, J1), the default-bean append per unique host
    (Code/JMXScraper.py:57-67), unknown-server-type defaulting
    (Code/main.py:65-69, O3) and the final dedupe (O1).

    Returns ordered (server_type, url) pairs — catalog-sized data, built
    driver-side exactly like the reference, then broadcast by the source.
    """
    mbeans = {**DEFAULT_MBEANS, **(mbeans or {})}
    common = common_mbeans if common_mbeans is not None else DEFAULT_COMMON_MBEANS
    out: list[tuple[str, str]] = []
    for server_type, hosts in servers.items():
        patterns = mbeans.get(server_type, ["kafka.*:*"])  # Discovered default
        for host, pattern in itertools.product(hosts, patterns + common):
            base = host if "://" in host else f"http://{host}"
            out.append((server_type, f"{base.rstrip('/')}/jolokia/read/{pattern}"))
    seen: set[tuple[str, str]] = set()
    deduped = []
    for pair in out:
        if pair not in seen:
            seen.add(pair)
            deduped.append(pair)
    return deduped


class _UrlPartition(InputPartition):
    def __init__(self, server_type: str, url: str, execution_ts: int, kind: str = "jolokia"):
        self.server_type = server_type
        self.url = url
        self.execution_ts = execution_ts
        self.kind = kind  # "jolokia" HTTP GET | "connect" two-phase REST


def _read_partition(
    part: _UrlPartition,
    fetcher_ref: str,
    timeout: float,
    fetcher_opts: dict | None = None,
):
    opts = fetcher_opts or {}
    if part.kind == "connect":
        # two-phase REST scan collapsed into a synthetic Jolokia body
        # (S3/J4; reference Code/ConnectRESTMetrics.py:143-169)
        from kafka_metrics_exporter_spark.sources.connect_rest import (
            connect_snapshot_body,
        )

        body = connect_snapshot_body(part.url, fetcher_ref, timeout, fetcher_opts=opts)
    else:
        from kafka_metrics_exporter_spark.sources.fetchers import resolve_fetcher

        fetcher = resolve_fetcher(fetcher_ref)
        body = fetcher(part.url, timeout, **opts)
    status = 200 if body is not None else 599
    # RAW_SCRAPE_SCHEMA order: target_url, server_type, execution_ts, status, body
    yield (part.url, part.server_type, part.execution_ts, status, body)


class _JolokiaReaderMixin:
    def __init__(self, options: dict):
        self.options = options
        catalog_json = options.get("catalog")
        if not catalog_json:
            raise ValueError(
                "jolokia source requires .option('catalog', json) — "
                "a JSON list of [server_type, url] pairs "
                "(see build_url_catalog)"
            )
        self.catalog: list[tuple[str, str]] = [
            (t, u) for t, u in json.loads(catalog_json)
        ]
        self.fetcher_ref = options.get(
            "fetcher", "kafka_metrics_exporter_spark.sources.fetchers:http_fetcher"
        )
        self.timeout = float(options.get("timeout", "10"))
        self.connect_endpoints: list[str] = json.loads(
            options.get("connect_endpoints", "[]")
        )
        # basic auth + TLS verify (reference Code/ConnectRESTMetrics.py:
        # 99-111: HTTPBasicAuth + session.verify, default off)
        self.fetcher_opts: dict = {}
        if "auth_user" in options:
            self.fetcher_opts["user"] = options["auth_user"]
            self.fetcher_opts["password"] = options.get("auth_password", "")
        if options.get("tls_verify", "false").lower() in ("true", "1"):
            self.fetcher_opts["tls_verify"] = True
        # K8s pod discovery (S4, reference Code/main.py:120-133):
        # `discovery` is a module:attr ref to a pod lister called with
        # `discovery_kwargs` — the default CLI wiring points it at
        # k8s_catalog.discover_pods_k8s.  Resolution happens in
        # _partitions, i.e. ON EVERY TRIGGER, reproducing the
        # reference's per-cycle pod-list refresh (Code/main.py:274-282):
        # a pod added mid-stream joins the next micro-batch's scrape
        # set.  Catalog-sized, driver-side work, like the reference.
        self.discovery_ref = options.get("discovery")
        self.discovery_kwargs: dict = json.loads(
            options.get("discovery_kwargs", "{}")
        )
        self.discovery_annotations: dict = json.loads(
            options.get("discovery_annotations", "{}")
        )
        self.discovery_mbeans: dict = json.loads(options.get("mbeans", "{}"))
        self.common_mbeans = (
            json.loads(options["common_mbeans"])
            if "common_mbeans" in options
            else None
        )

    def _discovered_catalog(self) -> list[tuple[str, str]]:
        from kafka_metrics_exporter_spark.sources.fetchers import resolve_fetcher
        from kafka_metrics_exporter_spark.sources.k8s_catalog import (
            pods_to_catalog,
        )

        lister = resolve_fetcher(self.discovery_ref)
        pods = lister(**self.discovery_kwargs)
        discovered = pods_to_catalog(pods, **self.discovery_annotations)
        return build_url_catalog(
            discovered,
            mbeans=self.discovery_mbeans or None,
            common_mbeans=self.common_mbeans,
        )

    def _partitions(self, execution_ts: int):
        catalog = list(self.catalog)
        if self.discovery_ref:
            # CLI-provided ∪ freshly-discovered, deduped in order
            # (merge_server_lists semantics at URL granularity)
            catalog = list(
                dict.fromkeys([*catalog, *self._discovered_catalog()])
            )
        parts = [_UrlPartition(t, u, execution_ts) for t, u in catalog]
        parts += [
            _UrlPartition("KafkaConnect", ep, execution_ts, kind="connect")
            for ep in self.connect_endpoints
        ]
        return parts


class JolokiaBatchReader(_JolokiaReaderMixin, DataSourceReader):
    def partitions(self):
        return self._partitions(int(time.time() * 1000))

    def read(self, partition: _UrlPartition):
        yield from _read_partition(
            partition, self.fetcher_ref, self.timeout, self.fetcher_opts
        )


class JolokiaStreamReader(_JolokiaReaderMixin, DataSourceStreamReader):
    """One poll cycle per micro-batch.  The offset is the poll counter;
    each trigger stamps a fresh execution timestamp (the reference's
    wall-clock stamping, Code/JMXScraper.py:96, isolated to the source
    boundary so everything downstream is deterministic)."""

    def initialOffset(self):
        return {"poll": 0, "ts": int(time.time() * 1000)}

    def latestOffset(self):
        return {"poll": int(time.time() * 1000), "ts": int(time.time() * 1000)}

    def partitions(self, start: dict, end: dict):
        return self._partitions(int(end["ts"]))

    def read(self, partition: _UrlPartition):
        yield from _read_partition(
            partition, self.fetcher_ref, self.timeout, self.fetcher_opts
        )

    def commit(self, end: dict):
        pass


class JolokiaDataSource(DataSource):
    """spark.read/readStream.format("jolokia")

    Options:
      catalog       — JSON [[server_type, url], ...] (build_url_catalog)
      fetcher       — "module:attr" fetcher ref (default stdlib urllib GET)
      timeout       — per-call seconds (default 10, reference Code/main.py:117)
      auth_user     — basic-auth user (reference ConnectRESTMetrics.py:104-109)
      auth_password — basic-auth password
      tls_verify    — "true" to verify TLS certs (default false, like the
                      reference's session.verify)
      discovery     — "module:attr" pod-lister ref; resolved EVERY trigger
                      so the scrape set follows the cluster (reference
                      Code/main.py:274-282 per-cycle refresh)
      discovery_kwargs      — JSON kwargs for the lister (label/field
                              selectors, kube context)
      discovery_annotations — JSON kwargs for pods_to_catalog (annotation
                              name overrides, Code/main.py:124-129)
      mbeans        — JSON {server_type: [pattern, ...]} per-type poll
                      patterns for DISCOVERED servers
                      (--jmx-*-poll-mbean, Code/main.py:144-151)
      common_mbeans — JSON [pattern, ...] appended per discovered host
    """

    @classmethod
    def name(cls) -> str:
        return "jolokia"

    def schema(self) -> str:
        return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in RAW_SCRAPE_SCHEMA)

    def reader(self, schema) -> JolokiaBatchReader:
        return JolokiaBatchReader(self.options)

    def streamReader(self, schema) -> JolokiaStreamReader:
        return JolokiaStreamReader(self.options)


def register_jolokia_source(spark: SparkSession) -> None:
    spark.dataSource.register(JolokiaDataSource)


def read_jolokia(
    spark: SparkSession,
    catalog: list[tuple[str, str]],
    fetcher: str | None = None,
    timeout: float = 10.0,
    streaming: bool = False,
    connect_endpoints: list[str] | None = None,
    user: str | None = None,
    password: str | None = None,
    tls_verify: bool = False,
    discovery: str | None = None,
    discovery_kwargs: dict | None = None,
    discovery_annotations: dict | None = None,
    mbeans: dict | None = None,
    common_mbeans: list | None = None,
) -> DataFrame:
    register_jolokia_source(spark)
    reader = spark.readStream if streaming else spark.read
    r = (
        reader.format("jolokia")
        .option("catalog", json.dumps(list(catalog)))
        .option("timeout", str(timeout))
    )
    if fetcher:
        r = r.option("fetcher", fetcher)
    if connect_endpoints:
        r = r.option("connect_endpoints", json.dumps(list(connect_endpoints)))
    if user is not None:
        r = r.option("auth_user", user).option("auth_password", password or "")
    if tls_verify:
        r = r.option("tls_verify", "true")
    if discovery:
        r = r.option("discovery", discovery).option(
            "discovery_kwargs", json.dumps(discovery_kwargs or {})
        ).option(
            "discovery_annotations", json.dumps(discovery_annotations or {})
        )
        if mbeans:
            r = r.option("mbeans", json.dumps(mbeans))
        if common_mbeans is not None:
            r = r.option("common_mbeans", json.dumps(list(common_mbeans)))
    return r.load()
