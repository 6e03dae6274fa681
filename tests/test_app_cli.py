"""Daemon CLI (SURVEY §3.1 entry): arg validation and a full --once
cycle through catalog → stream → daily-parquet sink."""

from __future__ import annotations

import pytest

from kafka_metrics_exporter_spark.app import build_catalog, build_parser, main

FAKE = "kafka_metrics_exporter_spark.sources.fetchers:fake_jolokia_fetcher"


def test_requires_a_source():
    with pytest.raises(SystemExit):
        main(["--sink-parquet", "/tmp/never-used"])


def test_requires_a_sink():
    with pytest.raises(SystemExit):
        main(["--jmx-kafka-server", "k1:1"])


def test_catalog_from_args():
    args = build_parser().parse_args(
        ["--jmx-kafka-server", "k1:49901", "--jmx-zk-server", "z1:8778",
         "--sink-parquet", "/tmp/x"]
    )
    cat = build_catalog(args)
    types = {t for t, _ in cat}
    assert types == {"KafkaBroker", "ZooKeeper"}
    assert any(u.endswith("java.lang:type=Memory") for _, u in cat)


def test_once_cycle_to_parquet(spark, tmp_path):
    rc = main(
        [
            "--jmx-kafka-server", "kafka1:49901",
            "--fetcher", FAKE,
            "--sink-parquet", str(tmp_path / "out"),
            "--checkpoint", str(tmp_path / "ckpt"),
            "--once",
        ],
        spark=spark,
    )
    assert rc == 0
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() > 0
    assert {r["bean_domain"] for r in back.select("bean_domain").distinct().collect()} == {
        "kafka.server",
        "java.lang",
    }
