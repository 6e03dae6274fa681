from kafka_metrics_exporter_spark.functions.scalars import (  # noqa: F401
    host_from_url,
    objectname_domain,
    objectname_props,
    url_normalize_col,
)
