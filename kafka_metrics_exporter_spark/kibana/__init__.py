"""Kibana saved-object front end: parse the agg definitions inside a
Kibana visualization's ``visState`` JSON (the reference ships 27 of
them in ELK/jmx_dashboard.json) and compile each to a DataFrame plan —
the ES-side twin of the promql/ front end, so both dashboard corpora
compile their own queries."""

from kafka_metrics_exporter_spark.kibana.compiler import (
    KibanaPlan,
    compile_export,
    compile_visualization,
    parse_vis_state,
)

__all__ = [
    "KibanaPlan",
    "compile_export",
    "compile_visualization",
    "parse_vis_state",
]
