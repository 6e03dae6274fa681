from kafka_metrics_exporter_spark.operators.normalize import (  # noqa: F401
    normalize_scrapes,
    to_json_records,
)
from kafka_metrics_exporter_spark.operators.relational import (  # noqa: F401
    latest_per_key,
    rate_per_second,
    top_k_per_group,
)
