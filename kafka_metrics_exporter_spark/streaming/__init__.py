from kafka_metrics_exporter_spark.streaming.pipeline import (  # noqa: F401
    streaming_metrics,
    windowed_rollup,
)
