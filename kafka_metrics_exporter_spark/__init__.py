"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `waliaabhishek/kafka_metrics_exporter`.

The reference is a stateless JMX/Jolokia → Kafka/Elasticsearch metrics ETL
daemon whose analytical query corpus lives in its shipped dashboards
(see SURVEY.md).  This package re-expresses every capability Spark-first:

- ``schema``     — canonical ``metrics`` DataFrame schema (SURVEY §1.3)
- ``operators``  — normalization (P1-P5) and relational helpers (A/W/O ops)
- ``functions``  — scalar Column-expression pack (SURVEY §2.8)
- ``plans``      — the named query suite + DuckDB oracle SQL
- ``rules``      — JMX-exporter YAML rule compiler → Catalyst expression chain
- ``sources``    — Jolokia / Connect-REST / K8s-catalog sources
- ``sinks``      — Kafka sink options, ES-bulk foreachBatch writer
- ``streaming``  — structured-streaming pipeline wiring
- ``llmdata``    — large-scale training-data ops (dedup, ANN, text, multimodal)
"""

__version__ = "0.1.0"
