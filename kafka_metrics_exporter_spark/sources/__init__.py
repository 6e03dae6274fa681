from kafka_metrics_exporter_spark.sources.jolokia import (  # noqa: F401
    JolokiaDataSource,
    build_url_catalog,
    register_jolokia_source,
)
from kafka_metrics_exporter_spark.sources.openmetrics import (  # noqa: F401
    exposition_lines,
    labels_to_columns,
    parse_exposition,
)
