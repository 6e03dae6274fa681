"""Differential test: the compiled CaseWhen rule chain vs an
independent Python model of jmx_exporter matching semantics
(``^.*(?:p).*$`` + matches() first-match-wins, $n substitution,
safeName, lowercase, value consts, valueFactor) over randomized
ObjectNames.

One Spark job scores all cases; the Python model evaluates them
independently with the stdlib `re` engine."""

from __future__ import annotations

import os
import random
import re

import pytest
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.rules import compile_rules, load_rules_file

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

_DOLLAR = re.compile(r"\$(\d+)")


def _py_template(tmpl: str, m: re.Match) -> str:
    return _DOLLAR.sub(lambda g: m.group(int(g.group(1))) or "", tmpl)


def _py_safe(s: str) -> str:
    return re.sub(r"[^a-zA-Z0-9_]", "_", s)


def py_rewrite(rules, lowercase, match_str, num_value):
    """Independent reference implementation of the rule semantics."""
    for rule in rules:
        # jmx_exporter: Pattern.compile("^.*(?:p).*$") + matches();
        # re.match of the same compiled form (ending in $) is equivalent
        m = re.match(rule.compiled_pattern, match_str)
        if not m:
            continue
        name = None
        if rule.name_tmpl is not None:
            name = _py_safe(_py_template(rule.name_tmpl, m))
            if lowercase:
                name = name.lower()
        labels = {
            _py_safe(_py_template(k, m)): _py_template(v, m)
            for k, v in rule.labels_tmpl.items()
        }
        if rule.value_tmpl is not None:
            try:
                value = float(_py_template(rule.value_tmpl, m))
            except ValueError:
                value = None
        else:
            value = num_value
        if value is not None and rule.value_factor != 1.0:
            value *= rule.value_factor
        return {
            "metric_name": name,
            "labels": labels,
            "value": value,
            "metric_type": rule.metric_type,
        }
    return None


def _random_cases(rng: random.Random, n: int) -> list[tuple[str, float]]:
    domains = ["kafka.server", "kafka.network", "kafka.producer", "java.lang",
               "org.apache.ZooKeeperService"]
    types = ["BrokerTopicMetrics", "RequestMetrics", "app-info",
             "connector-task-metrics", "ReplicaManager", "Weird Type"]
    names = ["MessagesInPerSec", "BytesOutPerSec", "TotalTimeMs",
             "UnderReplicatedPartitions", "Consumer Lag"]
    attrs = ["Count", "Value", "99thPercentile", "75thPercentile", "MeanRate",
             "start-time-ms", "status"]
    cases = []
    for _ in range(n):
        domain = rng.choice(domains)
        props = [f"type={rng.choice(types)}"]
        if rng.random() < 0.8:
            props.append(f"name={rng.choice(names)}")
        if rng.random() < 0.5:
            props.append(f"topic=t{rng.randint(0, 5)}")
        if rng.random() < 0.3:
            props.append(f"partition={rng.randint(0, 3)}")
        attr = rng.choice(attrs)
        val = round(rng.uniform(0, 1000), 2)
        match_str = f"{domain}<{', '.join(props)}><>{attr}: {val}"
        cases.append((match_str, val))
    return cases


@pytest.mark.parametrize("rules_file", ["kafka_rules.yml", "zookeeper_rules.yml"])
def test_compiled_chain_matches_python_model(spark, rules_file):
    rules, lower = load_rules_file(os.path.join(FIX, rules_file))
    cases = _random_cases(random.Random(42), 300)

    df = spark.createDataFrame(cases, "m string, v double")
    out = df.withColumn(
        "_rw", compile_rules(rules, lower)(F.col("m"), F.col("v"))
    ).collect()

    mismatches = []
    for row in out:
        expected = py_rewrite(rules, lower, row["m"], row["v"])
        got = row["_rw"].asDict() if row["_rw"] is not None else None
        if got is not None:
            got = {
                "metric_name": got["metric_name"],
                "labels": dict(got["labels"]),
                "value": got["value"],
                "metric_type": got["metric_type"],
            }
        if got != expected:
            mismatches.append((row["m"], expected, got))
    assert not mismatches, f"{len(mismatches)} divergences, first: {mismatches[0]}"
