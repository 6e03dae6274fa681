from kafka_metrics_exporter_spark.rules.compiler import (  # noqa: F401
    RewriteRule,
    build_match_string,
    compile_rules,
    load_rules_file,
    parse_rules_yaml,
    rewrite_metrics,
)
