"""Prometheus rule-group evaluation (promql/rules.py): YAML parsing,
recording-rule materialization, sequential in-group chaining, the
pending→firing `for:` state machine on the evaluation grid, ALERTS
feedback series, and annotation templating — hand-computed pins.
"""

from __future__ import annotations

import datetime as dt

import pytest

from kafka_metrics_exporter_spark.promql.rules import (
    AlertingRule,
    RecordingRule,
    _dur,
    evaluate_group,
    evaluate_rules,
    parse_rule_groups,
)

_YAML = """
groups:
- name: g
  interval: 1h
  rules:
  - record: region:m:val
    expr: sum by (region) (m)
    labels:
      source: rules
  - alert: High
    expr: region:m:val > 50
    for: 1h
    labels:
      severity: page
    annotations:
      summary: "{{ $labels.region }} high at {{ $value }}"
"""


@pytest.fixture(scope="module")
def hourly(spark):
    t0 = dt.datetime(2024, 1, 1)
    vals = {"e": [10.0, 60.0, 70.0, 80.0, 20.0], "w": [90.0, 90.0, 10.0, 90.0, 90.0]}
    rows = [
        ("m", t0 + dt.timedelta(hours=h), v, region)
        for region, series in vals.items()
        for h, v in enumerate(series)
    ]
    return spark.createDataFrame(
        rows, "name string, ts timestamp, value double, region string"
    )


def test_parse_rule_groups_shapes():
    groups = parse_rule_groups(_YAML)
    assert len(groups) == 1
    g = groups[0]
    assert g.name == "g" and g.interval_seconds == 3600.0
    rec, al = g.rules
    assert isinstance(rec, RecordingRule) and rec.record == "region:m:val"
    assert rec.labels == (("source", "rules"),)
    assert isinstance(al, AlertingRule) and al.for_seconds == 3600.0
    assert al.annotations == (("summary", "{{ $labels.region }} high at {{ $value }}"),)


def test_parse_rule_errors():
    for bad, frag in [
        ("groups:\n- rules: []\n", "name"),
        ("groups:\n- name: g\n  rules:\n  - expr: m\n", "record/alert"),
        ("groups:\n- name: g\n  rules:\n  - record: a b\n    expr: m\n", "record name"),
        (
            "groups:\n- name: g\n  rules:\n  - record: r\n    expr: m\n    for: 1h\n",
            "for",
        ),
        ("groups:\n- name: g\n  rules:\n  - alert: A\n    expr: 'sum by ('\n", ""),
        ("foo: 1\n", "groups"),
    ]:
        with pytest.raises((ValueError, SyntaxError)):
            parse_rule_groups(bad)


def test_duration_forms():
    assert _dur("1h30m", "t") == 5400.0
    assert _dur(90, "t") == 90.0
    assert _dur("2h", "t") == 7200.0
    assert _dur("1y", "t") == 31536000.0
    assert _dur(None, "t") == 0.0
    with pytest.raises(ValueError):
        _dur("1parsec", "t")


def test_group_end_to_end_states(hourly):
    res = evaluate_rules(_YAML, hourly)["g"]
    # --- recording rule: renamed, static label attached -------------
    rec = res.recorded["region:m:val"]
    rows = {
        (r["region"], r["ts"].hour, r["value"], r["name"], r["source"])
        for r in rec.collect()
    }
    assert ("e", 1, 60.0, "region:m:val", "rules") in rows
    assert len(rows) == 10  # 2 regions x 5 hours (lookback < step)
    # --- alert state machine ----------------------------------------
    al = res.alerts["High"]
    got = {
        (r["region"], r["ts"].hour): (r["alertstate"], r["value"], r["severity"])
        for r in al.collect()
    }
    assert got == {
        # e: >50 at hours 1,2,3 — pending at 1, firing from 2
        ("e", 1): ("pending", 60.0, "page"),
        ("e", 2): ("firing", 70.0, "page"),
        ("e", 3): ("firing", 80.0, "page"),
        # w: run h0-h1 (pending, firing), gap at h2 RESETS, run h3-h4
        ("w", 0): ("pending", 90.0, "page"),
        ("w", 1): ("firing", 90.0, "page"),
        ("w", 3): ("pending", 90.0, "page"),
        ("w", 4): ("firing", 90.0, "page"),
    }
    # --- annotation templating ---------------------------------------
    ann = {
        (r["region"], r["ts"].hour): r["annotation_summary"] for r in al.collect()
    }
    assert ann[("e", 1)] == "e high at 60.0"
    # --- ALERTS feedback series --------------------------------------
    alerts_rows = [
        r
        for r in res.metrics.filter("name = 'ALERTS'").collect()
    ]
    assert len(alerts_rows) == 7
    assert {r["alertname"] for r in alerts_rows} == {"High"}
    assert all(r["value"] == 1.0 for r in alerts_rows)
    firing = [r for r in alerts_rows if r["alertstate"] == "firing"]
    assert len(firing) == 4


def test_chained_rule_sees_alerts_series(hourly):
    """A later rule can aggregate the ALERTS series emitted by an
    earlier alert in the same group — the feedback loop Prometheus
    exposes."""
    yaml_text = _YAML + """
  - record: alerts:firing:count
    expr: sum by (alertstate) (ALERTS{alertstate="firing"})
"""
    res = evaluate_rules(yaml_text, hourly)["g"]
    rec = res.recorded["alerts:firing:count"]
    got = {(r["ts"].hour, r["value"]) for r in rec.collect()}
    # firing at h1 (w), h2 (e), h3 (e), h4 (w) → count 1 each
    assert got == {(1, 1.0), (2, 1.0), (3, 1.0), (4, 1.0)}


def test_for_zero_fires_immediately(hourly):
    groups = parse_rule_groups(
        "groups:\n- name: z\n  interval: 1h\n  rules:\n"
        "  - alert: Any\n    expr: m > 85\n"
    )
    res = evaluate_group(groups[0], hourly)
    states = {r["alertstate"] for r in res.alerts["Any"].collect()}
    assert states == {"firing"}


def test_explicit_step_and_range(hourly):
    """step_seconds overrides the group interval; start/end pin the
    grid like a dashboard request."""
    groups = parse_rule_groups(_YAML)
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    res = evaluate_group(
        groups[0],
        hourly,
        step_seconds=3600.0,
        start=t0,
        end=t0 + dt.timedelta(hours=2),
    )
    al = res.alerts["High"]
    hours = {r["ts"].hour for r in al.collect()}
    assert hours <= {0, 1, 2}
