"""PromQL-subset front end: parse the reference's dashboard
expressions and compile them to DataFrame plans over the engine's
normalized metric series (SURVEY §2.4-2.5 — the 49 Grafana `"expr"`
strings in Prometheus/jmxexporter_configs/grafana/dashboards/*.json
are this engine's query corpus)."""

from kafka_metrics_exporter_spark.promql.compiler import (
    PromQLPlan,
    compile_promql,
    evaluate_streaming,
)
from kafka_metrics_exporter_spark.promql.dashboard import (
    compile_dashboard,
    dashboard_exprs,
    dashboard_targets,
    dashboard_variables,
)
from kafka_metrics_exporter_spark.promql.parser import parse
from kafka_metrics_exporter_spark.promql.range_eval import evaluate_range
from kafka_metrics_exporter_spark.promql.rules import (
    evaluate_group,
    evaluate_rules,
    parse_rule_groups,
)
from kafka_metrics_exporter_spark.promql.variables import interpolate_variables

__all__ = [
    "PromQLPlan",
    "compile_dashboard",
    "compile_promql",
    "dashboard_exprs",
    "dashboard_targets",
    "dashboard_variables",
    "evaluate_group",
    "evaluate_range",
    "evaluate_rules",
    "evaluate_streaming",
    "interpolate_variables",
    "parse",
    "parse_rule_groups",
]
