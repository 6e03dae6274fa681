from kafka_metrics_exporter_spark.sources.jolokia import (  # noqa: F401
    JolokiaDataSource,
    build_url_catalog,
    register_jolokia_source,
)
