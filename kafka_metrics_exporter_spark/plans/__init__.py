from kafka_metrics_exporter_spark.plans.queries import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
)
