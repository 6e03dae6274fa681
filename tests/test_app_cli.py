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


def test_query_mode_requires_metrics_path():
    with pytest.raises(SystemExit):
        main(["--query-promql", "sum(up)"])


def test_query_mode_promql_instant_and_range(spark, tmp_path, capsys):
    rows = [
        ("click", "2024-01-01 00:00:00", 0.0, "u1"),
        ("click", "2024-01-01 00:01:00", 60.0, "u1"),
        ("click", "2024-01-01 00:02:00", 120.0, "u1"),
    ]
    df = spark.createDataFrame(rows, "name string, ts string, value double, user_id string")
    df = df.withColumn("ts", df["ts"].cast("timestamp"))
    path = str(tmp_path / "metrics")
    df.write.parquet(path)

    rc = main(
        ["--query-metrics", path, "--query-promql",
         'sum by (user_id) (rate(click[5m]))'],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "u1" in out and "1.0" in out  # 60/min counter -> 1.0/s

    rc = main(
        ["--query-metrics", path, "--query-promql",
         'sum by (user_id) (rate(click[2m]))', "--query-step", "60"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "u1" in out

    # round 12: opt-in instant-mode extrapolation — at t=2m the (0,2m]
    # window holds samples 1m/2m only (0m is excluded by the half-open
    # window), rawDelta=60 over 60 s sampled with a zero-capped start
    # extension -> 120/120 = 1.0; the flag must not error and must
    # emit points
    rc = main(
        ["--query-metrics", path, "--query-promql",
         "rate(click[2m])", "--query-extrapolated-rate"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "u1" in out and "1.0" in out


def test_query_mode_kibana_vis(spark, tmp_path, capsys):
    import json as _json

    rows = [("h1", 10.0), ("h1", 30.0), ("h2", 5.0)]
    df = spark.createDataFrame(rows, "host string, v double")
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    vis = {"_type": "visualization", "_source": {"title": "t", "visState": _json.dumps({
        "type": "table",
        "aggs": [
            {"id": "1", "type": "avg", "schema": "metric", "params": {"field": "v"}},
            {"id": "2", "type": "terms", "schema": "bucket",
             "params": {"field": "host.keyword", "size": 5,
                        "order": "asc", "orderBy": "_term"}},
        ]})}}
    vis_path = tmp_path / "vis.json"
    vis_path.write_text(_json.dumps([vis]))
    rc = main(
        ["--query-metrics", path, "--query-kibana-vis", str(vis_path)],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "h1" in out and "20.0" in out


def test_query_mode_range_with_request_window(spark, tmp_path, capsys):
    import datetime as dt

    rows = [
        ("click", f"2024-01-01 00:0{i}:00", float(i), "u1") for i in range(6)
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "name string, ts string, value double, user_id string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "metrics_rw")
    df.write.parquet(path)
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp()
    rc = main(
        [
            "--query-metrics", path,
            "--query-promql", "click",
            "--query-step", "60",
            "--query-start", str(base + 120),
            "--query-end", str(base + 180),
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    # only the two requested instants appear
    assert "00:02:00" in out and "00:03:00" in out
    assert "00:01:00" not in out and "00:04:00" not in out


def test_query_mode_kibana_auto_interval(spark, tmp_path, capsys):
    """--query-auto-interval opts an interval:auto panel into real ES
    auto-interval semantics; with --query-start/--query-end the grid
    derives from the request range (1 day @ 50 buckets -> 30m)."""
    import datetime as dt
    import json as _json

    rows = [
        ("2024-04-01 10:00:00", 10.0),
        ("2024-04-01 10:40:00", 30.0),
        ("2024-04-01 12:10:00", 5.0),
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "ts string, v double").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    path = str(tmp_path / "docs")
    df.write.parquet(path)
    vis = {"_type": "visualization", "_source": {"title": "t", "visState": _json.dumps({
        "type": "line",
        "aggs": [
            {"id": "2", "type": "date_histogram", "schema": "segment",
             "params": {"field": "ts", "interval": "auto",
                         "customInterval": "2h", "customLabel": "When"}},
            {"id": "1", "type": "sum", "schema": "metric",
             "params": {"field": "v", "customLabel": "Total"}},
        ]})}}
    vis_path = tmp_path / "vis.json"
    vis_path.write_text(_json.dumps([vis]))
    base = dt.datetime(2024, 4, 1, tzinfo=dt.timezone.utc).timestamp()
    rc = main(
        [
            "--query-metrics", path,
            "--query-kibana-vis", str(vis_path),
            "--query-auto-interval", "50",
            "--query-start", str(base),
            "--query-end", str(base + 86400),
        ],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    # 30m buckets: 10:00 (10), 10:30 (30), 12:00 (5) — NOT the 2h pin
    assert "2024-04-01 10:30:00" in out
    assert "2024-04-01 12:00:00" in out


def test_query_mode_time_macros(spark, tmp_path, capsys):
    """--query-start/--query-end/--query-step bind the Grafana built-in
    time macros (round 8): $__rate_interval resolves via
    max(step + scrape, 4 x scrape) before parse."""
    import json as _json

    from pyspark.sql import functions as F

    rows = [
        ("click", "2024-01-01 00:%02d:00" % m, float(m * 60), "u1")
        for m in range(0, 10)
    ]
    df = spark.createDataFrame(
        rows, "name string, ts string, value double, user_id string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    path = str(tmp_path / "metrics")
    df.write.parquet(path)
    start = df.agg(F.min("ts")).collect()[0][0].timestamp()

    rc = main(
        ["--query-metrics", path,
         "--query-promql", 'sum by (user_id) (rate(click[$__rate_interval]))',
         "--query-step", "60", "--query-start", str(start),
         "--query-end", str(start + 540), "--query-scrape-interval", "60"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "u1" in out and "1.0" in out  # 60/min counter -> 1.0/s

    # dashboard path binds the same macros
    dash = {"title": "d", "panels": [
        {"title": "p", "type": "timeseries",
         "targets": [{"expr": "rate(click[$__rate_interval])", "refId": "A"}]},
    ]}
    dpath = str(tmp_path / "dash.json")
    with open(dpath, "w") as fh:
        _json.dump(dash, fh)
    rc = main(
        ["--query-metrics", path, "--query-dashboard", dpath,
         "--query-step", "60", "--query-start", str(start),
         "--query-end", str(start + 540), "--query-scrape-interval", "60"],
        spark=spark,
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "rate(click[4m])" in out  # max(60+60, 240) = 4m, shown in == line
