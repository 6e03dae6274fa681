from kafka_metrics_exporter_spark.plans.queries import (  # noqa: F401
    ORACLE_SQL,
    QUERIES,
)
from kafka_metrics_exporter_spark.plans import llm_queries  # noqa: E402,F401  (registers)
from kafka_metrics_exporter_spark.plans import promql_queries  # noqa: E402,F401  (registers)
