"""Prometheus recording & alerting rule groups, evaluated on the
engine (round 7).

The reference delegates rule evaluation to a real Prometheus server
(its jmxexporter configs feed one — Prometheus/jmxexporter_configs);
this module closes that loop for the Spark engine: parse the standard
``groups:`` rule-file YAML (prometheus/docs/configuration/recording_rules),
compile each ``expr`` with the PromQL front end, and evaluate a group
the way Prometheus's rule manager does —

- **Sequentially within a group**: each rule is evaluated against the
  state left by the rules before it, so a later rule (or an alert) can
  reference an earlier rule's ``record`` name — the canonical
  aggregation-ladder idiom (``instance:x:rate`` → ``job:x:rate``).
- **Recording rules** materialize their result as new series: the
  vector renamed to ``record``, the rule's static ``labels`` attached
  (overriding result labels of the same name, per rules/recording.go).
- **Alerting rules** track Prometheus's pending→firing state machine
  on the evaluation grid: an element is *pending* while present and
  *firing* once it has been present CONTINUOUSLY for ``for:`` — i.e.
  at every grid instant of its current run for at least that long
  (rules/alerting.go: ``activeAt`` is the run's first evaluation, the
  state flips when ``ts − activeAt ≥ for``).  A missed instant resets
  the run, exactly like a rule evaluation that drops the element.
  Firing/pending alerts are ALSO fed back as the synthetic
  ``ALERTS{alertname=…, alertstate=…}`` series, so downstream rules
  can query them (Prometheus exposes the same series).
- **Annotations** render the two template forms dashboards actually
  use — ``{{ $value }}`` and ``{{ $labels.<name> }}`` — JVM-side as a
  ``concat`` of literals and columns (full Go templating is out of
  scope; unknown constructs pass through verbatim).

Scale design (100 TB): each rule's evaluation is the existing
range_eval plan (explode-to-grid, no non-equi joins); group chaining
is a ``unionByName`` of narrow (name, labels, ts, value) frames — no
shuffle beyond what each expression already does.  Alert state is one
window per series keyed by the FULL label set (high cardinality — the
partitioning Prometheus's per-series state map implies), with a
gaps-and-islands run computation instead of per-row Python.  Nothing
collects to the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.promql.compiler import (
    _META_COLS,
    compile_promql,
)
from kafka_metrics_exporter_spark.promql.parser import _duration_seconds

_METRIC_NAME_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")
_LABEL_NAME_RE = re.compile(r"^[a-zA-Z_][a-zA-Z0-9_]*$")


def _dur(value, what: str) -> float:
    """Rule-file durations: Prometheus accepts bare numbers (seconds)
    and the duration syntax (``2h``, ``90s``, compound ``1h30m``)."""
    if value is None:
        return 0.0
    if isinstance(value, (int, float)):
        return float(value)
    text = str(value).strip()
    if not text:
        return 0.0
    total, pos = 0.0, 0
    for m in re.finditer(r"(\d+(?:\.\d+)?)(ms|[smhdwy])", text):
        if m.start() != pos:
            break
        total += _duration_seconds(m.group(1) + ("s" if m.group(2) == "y" else m.group(2)))
        if m.group(2) == "y":
            total += float(m.group(1)) * (31536000.0 - 1.0)
        pos = m.end()
    if pos != len(text):
        raise ValueError(f"promql rules: bad {what} duration {value!r}")
    return total


@dataclass(frozen=True)
class RecordingRule:
    record: str
    expr: str
    labels: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class AlertingRule:
    alert: str
    expr: str
    for_seconds: float = 0.0
    labels: tuple[tuple[str, str], ...] = ()
    annotations: tuple[tuple[str, str], ...] = ()


@dataclass(frozen=True)
class RuleGroup:
    name: str
    interval_seconds: float | None
    rules: tuple = field(default_factory=tuple)


def _labels_tuple(raw, what: str) -> tuple[tuple[str, str], ...]:
    if raw is None:
        return ()
    if not isinstance(raw, dict):
        raise ValueError(f"promql rules: {what} must be a mapping")
    out = []
    for k, v in raw.items():
        if not _LABEL_NAME_RE.match(str(k)):
            raise ValueError(f"promql rules: bad label name {k!r} in {what}")
        out.append((str(k), str(v)))
    return tuple(out)


def parse_rule_groups(yaml_text: str) -> list[RuleGroup]:
    """Parse a Prometheus rule file (the ``groups:`` YAML).  Every
    ``expr`` is compiled eagerly so a syntax error fails at load time,
    like promtool check rules."""
    import yaml

    doc = yaml.safe_load(yaml_text)
    if not isinstance(doc, dict) or "groups" not in doc:
        raise ValueError("promql rules: rule file needs a top-level `groups:` list")
    groups: list[RuleGroup] = []
    for g in doc["groups"] or []:
        name = g.get("name")
        if not name:
            raise ValueError("promql rules: every group needs a name")
        rules: list = []
        for r in g.get("rules") or []:
            has_record, has_alert = "record" in r, "alert" in r
            if has_record == has_alert:
                raise ValueError(
                    f"promql rules: rule in group {name!r} must have exactly "
                    f"one of record/alert"
                )
            expr = r.get("expr")
            if not expr:
                raise ValueError(f"promql rules: rule in group {name!r} has no expr")
            compile_promql(str(expr))  # fail fast on bad PromQL
            if has_record:
                rec = str(r["record"])
                if not _METRIC_NAME_RE.match(rec):
                    raise ValueError(f"promql rules: bad record name {rec!r}")
                if "for" in r or "annotations" in r:
                    raise ValueError(
                        f"promql rules: record {rec!r} cannot carry "
                        f"for/annotations"
                    )
                rules.append(
                    RecordingRule(
                        record=rec,
                        expr=str(expr),
                        labels=_labels_tuple(r.get("labels"), f"record {rec!r}"),
                    )
                )
            else:
                rules.append(
                    AlertingRule(
                        alert=str(r["alert"]),
                        expr=str(expr),
                        for_seconds=_dur(r.get("for"), f"alert {r['alert']!r}"),
                        labels=_labels_tuple(r.get("labels"), f"alert {r['alert']!r}"),
                        annotations=_labels_tuple(
                            r.get("annotations"), f"alert {r['alert']!r} annotations"
                        ),
                    )
                )
        groups.append(
            RuleGroup(
                name=str(name),
                interval_seconds=(
                    _dur(g["interval"], f"group {name!r} interval")
                    if g.get("interval") is not None
                    else None
                ),
                rules=tuple(rules),
            )
        )
    return groups


_TEMPLATE_RE = re.compile(r"\{\{\s*\$(value|labels\.([a-zA-Z_][a-zA-Z0-9_]*))\s*\}\}")


def render_template(text: str, label_cols: set[str]) -> Column:
    """``{{ $value }}`` / ``{{ $labels.x }}`` as a concat of literals
    and columns.  An unknown label renders empty (Prometheus renders
    Go's zero value); anything else passes through verbatim."""
    parts: list[Column] = []
    pos = 0
    for m in _TEMPLATE_RE.finditer(text):
        if m.start() > pos:
            parts.append(F.lit(text[pos : m.start()]))
        if m.group(1) == "value":
            parts.append(F.col("value").cast("string"))
        else:
            lab = m.group(2)
            parts.append(
                F.coalesce(F.col(lab), F.lit("")).cast("string")
                if lab in label_cols
                else F.lit("")
            )
        pos = m.end()
    if pos < len(text):
        parts.append(F.lit(text[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts)


def _grid_kwargs(start, end) -> dict:
    kw: dict = {}
    if start is not None or end is not None:
        kw["start"] = start
        kw["end"] = end
    return kw


def _as_series(out: DataFrame, name: str, static: tuple, metrics_cols: list[str]) -> DataFrame:
    """Shape a rule result (labels…, ts, value) into the engine's
    series schema (name, ts, value, labels…), attaching static rule
    labels (overriding same-named result labels, per recording.go)."""
    # three batched column passes, not 1 + |static| + |missing|
    # analysis round-trips (guide §plan-build, r17); the missing-label
    # fill references df.columns AFTER the static labels land
    df = out.withColumns(
        {"name": F.lit(name), **{k: F.lit(v) for k, v in static}}
    )
    missing = {c: F.lit("") for c in metrics_cols if c not in df.columns}
    # align to the target frame: missing labels are empty strings (the
    # engine's missing-label convention), extra labels ride along
    return df.withColumns(missing) if missing else df


def _union_series(metrics: DataFrame, series: DataFrame) -> DataFrame:
    merged = metrics.unionByName(series, allowMissingColumns=True)
    label_cols = [c for c in merged.columns if c not in _META_COLS]
    # labels absent on one side arrive as NULL — normalize to the
    # missing-label empty string so selector matchers behave
    return merged.select(
        "name",
        "ts",
        "value",
        *[F.coalesce(F.col(c), F.lit("")).alias(c) for c in label_cols],
    )


def evaluate_alert_states(
    out: DataFrame,
    step_seconds: float,
    for_seconds: float,
) -> DataFrame:
    """Pending→firing on the evaluation grid: gaps-and-islands per
    series.  ``run start`` is the newest instant whose predecessor is
    missing (gap > step); the element fires once ``ts − run_start ≥
    for``.  One window per full-label-set series — the same keying as
    Prometheus's active-alert map."""
    label_cols = [c for c in out.columns if c not in _META_COLS]
    step_us = int(round(step_seconds * 1_000_000))
    for_us = int(round(for_seconds * 1_000_000))
    w = Window.partitionBy(*[F.col(c) for c in label_cols]).orderBy(
        F.unix_micros(F.col("ts"))
    )
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    run_mark = F.when(prev.isNull() | (us - prev > step_us), us)
    df = out.withColumn("__run_mark", run_mark)
    # run marks are increasing with ts, so a running MAX is the current
    # run's start (no ignorenulls-last_value dependence)
    run_start = F.max(F.col("__run_mark")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn(
            "alertstate",
            F.when(us - run_start >= F.lit(for_us), F.lit("firing")).otherwise(
                F.lit("pending")
            ),
        )
        .drop("__run_mark")
    )


@dataclass(frozen=True)
class GroupResult:
    metrics: DataFrame  # input ∪ recorded series ∪ ALERTS
    recorded: dict  # record name -> series DataFrame
    alerts: dict  # alert name -> state DataFrame (labels…, ts, value, alertstate, annotation_*)


def evaluate_group(
    group: RuleGroup,
    metrics: DataFrame,
    step_seconds: float | None = None,
    start=None,
    end=None,
) -> GroupResult:
    """Evaluate one rule group on the step grid (step = explicit
    argument, else the group's ``interval:``, else Prometheus's 1m
    default), sequentially so later rules see earlier outputs."""
    step = step_seconds or group.interval_seconds or 60.0
    kw = _grid_kwargs(start, end)
    cur = metrics
    recorded: dict[str, DataFrame] = {}
    alerts: dict[str, DataFrame] = {}
    for rule in group.rules:
        plan = compile_promql(rule.expr)
        out = plan.evaluate_range(cur, step, **kw)
        if isinstance(rule, RecordingRule):
            series = _as_series(out, rule.record, rule.labels, list(cur.columns))
            recorded[rule.record] = series
            cur = _union_series(cur, series)
        else:
            if rule.labels:
                out = out.withColumns({k: F.lit(v) for k, v in rule.labels})
            states = evaluate_alert_states(out, step, rule.for_seconds)
            label_set = {c for c in states.columns if c not in _META_COLS} - {
                "alertstate"
            }
            if rule.annotations:
                states = states.withColumns({
                    f"annotation_{k}": render_template(v, label_set)
                    for k, v in rule.annotations
                })
            alerts[rule.alert] = states
            alert_series = _as_series(
                states.withColumn("alertname", F.lit(rule.alert))
                .withColumn("value", F.lit(1.0))
                .drop(*[c for c in states.columns if c.startswith("annotation_")]),
                "ALERTS",
                (),
                list(cur.columns),
            )
            cur = _union_series(cur, alert_series)
    return GroupResult(metrics=cur, recorded=recorded, alerts=alerts)


def evaluate_rules(
    yaml_text: str,
    metrics: DataFrame,
    step_seconds: float | None = None,
    start=None,
    end=None,
) -> dict[str, GroupResult]:
    """Whole rule file: every group evaluated independently against the
    input metrics (groups are isolated in Prometheus too — only rules
    WITHIN a group see each other's fresh output)."""
    return {
        g.name: evaluate_group(g, metrics, step_seconds, start=start, end=end)
        for g in parse_rule_groups(yaml_text)
    }
