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
