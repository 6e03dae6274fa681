"""Whole-dashboard replay: compile every panel of a Grafana dashboard
JSON into PromQL plans (round 7).

The reference ships three dashboards
(Prometheus/jmxexporter_configs/grafana/dashboards/*.json, 49 `expr`
targets total); the corpus tests prove each expression individually —
this module is the user-facing composition: load the dashboard, bind
its template variables, get one compiled plan per panel target, ready
for ``evaluate`` / ``evaluate_range`` or the streaming
``promql_panels`` wiring.  Panels nest (Grafana rows carry a
``panels`` list), targets carry ``refId``; a panel key is
``"<title> [<refId>]"`` with the refId dropped when a title has only
one target.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from kafka_metrics_exporter_spark.promql.compiler import (
    PromQLPlan,
    compile_promql,
)


@dataclass(frozen=True)
class PanelTarget:
    title: str
    ref_id: str
    expr: str

    @property
    def key(self) -> str:
        return f"{self.title} [{self.ref_id}]"


def _load(dashboard) -> dict:
    if isinstance(dashboard, str):
        return json.loads(dashboard)
    return dashboard


def dashboard_targets(dashboard) -> list[PanelTarget]:
    """Every (panel, target) pair carrying a non-empty ``expr``, in
    panel order, recursing into row panels — both the modern top-level
    ``panels`` list and the legacy (schemaVersion < 16)
    ``rows[].panels`` layout."""
    d = _load(dashboard)
    out: list[PanelTarget] = []

    def walk(panels):
        for p in panels or []:
            title = p.get("title") or p.get("type", "panel")
            for i, t in enumerate(p.get("targets", [])):
                expr = (t.get("expr") or "").strip()
                if expr:
                    # refId fallback letters by PANEL-local position, so
                    # keys are stable against unrelated panel edits
                    out.append(
                        PanelTarget(
                            title=title,
                            ref_id=str(
                                t.get("refId", chr(ord("A") + (i % 26)))
                            ),
                            expr=expr,
                        )
                    )
            walk(p.get("panels"))

    walk(d.get("panels"))
    for row in d.get("rows") or []:  # legacy layout
        walk(row.get("panels"))
    return out


def dashboard_variables(dashboard) -> list[str]:
    """Names of the dashboard's declared template variables
    (``templating.list``) — what a caller must bind (or accept
    literal-regex passthrough for, the documented unbound behavior)."""
    d = _load(dashboard)
    return [
        v["name"]
        for v in d.get("templating", {}).get("list", [])
        if v.get("name")
    ]


def dashboard_exprs(
    dashboard,
    variables: dict | None = None,
    time_range: tuple[float, float, float] | None = None,
    scrape_interval_seconds: float = 15.0,
) -> dict[str, str]:
    """Panel key → interpolated expression TEXT — the input shape
    ``streaming.pipeline.promql_panels`` takes, so a dashboard drops
    onto a live stream in one line:

        promql_panels(stream, dashboard_exprs(dash, vars), emit, ckpt)

    ``time_range``/``scrape_interval_seconds`` bind the Grafana
    built-in time macros exactly as :func:`compile_dashboard` does —
    a streamed dashboard using ``$__rate_interval`` needs them too.
    """
    # compile_dashboard interpolates before parse, and PromQLPlan keeps
    # the post-interpolation text as .source — also proving each text
    # parses before it reaches a stream
    return {
        key: plan.source
        for key, plan in compile_dashboard(
            dashboard,
            variables=variables,
            time_range=time_range,
            scrape_interval_seconds=scrape_interval_seconds,
        ).items()
    }


def compile_dashboard(
    dashboard,
    variables: dict | None = None,
    time_range: tuple[float, float, float] | None = None,
    scrape_interval_seconds: float = 15.0,
) -> dict[str, PromQLPlan]:
    """Compile every panel target to a :class:`PromQLPlan`, binding
    Grafana template variables first (promql/variables.py rules).

    ``time_range`` = (start_epoch_s, end_epoch_s, step_seconds) binds
    the built-in time macros ($__interval, $__rate_interval, $__range,
    _s/_ms forms) exactly as Grafana's frontend does before the query
    ships — pass the same (start, end, step) to ``evaluate_range`` so
    the macro values and the evaluation grid agree.  Explicit
    ``variables`` entries win over macros (test hook; the ``__``
    namespace is Grafana-reserved).

    Keys are panel titles, suffixed with ``[refId]`` only where a
    title has several targets — stable, human-readable, and unique.
    """
    if time_range is not None:
        from kafka_metrics_exporter_spark.promql.variables import time_macros

        start, end, step = time_range
        variables = {
            **time_macros(
                float(end) - float(start), float(step), scrape_interval_seconds
            ),
            **(variables or {}),
        }
    targets = dashboard_targets(dashboard)
    multi = {
        t.title for t in targets if sum(x.title == t.title for x in targets) > 1
    }
    plans: dict[str, PromQLPlan] = {}
    for t in targets:
        key = t.key if t.title in multi else t.title
        # duplicate title+refId: first unused "#<n>" suffix (never
        # clobbers an existing plan, even if a title literally ends
        # in "#<n>")
        if key in plans:
            n = 2
            while f"{key} #{n}" in plans:
                n += 1
            key = f"{key} #{n}"
        plans[key] = compile_promql(t.expr, variables=variables)
    return plans
