"""Grafana template-variable interpolation (VERDICT r6 item 3).

The reference's dashboards embed Grafana template variables in their
PromQL (`instance=~"$ServerName"`, 8 occurrences in
Prometheus/.../ZooKeeper_Dashboard.json; variable definitions live in
the dashboard's ``templating.list``).  Grafana substitutes these
client-side before the query reaches Prometheus, so an engine replaying
a dashboard needs the same pre-pass before parse — the raw ``$var``
text happens to be valid PromQL regex, but it matches nothing real.

Supported occurrence syntaxes (all three Grafana forms):
``$var``, ``${var}``, ``[[var]]``.

Value rendering follows Grafana's Prometheus-datasource formatting:

- ``str`` — inserted verbatim (single-value variable).
- ``list[str]`` — multi-value: regex alternation ``(a|b)`` with each
  element regex-escaped, Grafana's "regex" format for multi/All
  variables inside ``=~`` matchers (re.escape escapes a superset of
  Grafana's metacharacter list — harmless inside a character match).
- ``None`` or the literal ``"$__all"`` — the All option: ``.*``.

The builtin ``$__all`` token itself interpolates to ``.*``.  Unknown
variables are left untouched — they parse as literal regex text, the
documented pre-round-7 behavior, so corpus conformance sweeps that
bind nothing keep working.
"""

from __future__ import annotations

import re

_VAR_RE = re.compile(
    r"\$\{(?P<braced>[A-Za-z_][A-Za-z0-9_]*)\}"
    r"|\$(?P<plain>[A-Za-z_][A-Za-z0-9_]*)"
    r"|\[\[(?P<bracket>[A-Za-z_][A-Za-z0-9_]*)\]\]"
)


def _render(value) -> str:
    if value is None or value == "$__all":
        return ".*"
    if isinstance(value, (list, tuple)):
        # Grafana stores an All selection on a MULTI-value variable as
        # ["$__all"] — the sentinel must win even inside a list (and a
        # repeated --query-var always produces a list)
        if not value or "$__all" in value:
            return ".*"
        return "(" + "|".join(re.escape(str(v)) for v in value) + ")"
    return str(value)


def interpolate_variables(text: str, variables: dict | None) -> str:
    """Substitute Grafana template variables in a PromQL expression.

    ``variables`` maps bare names (no ``$``) to values; see the module
    docstring for rendering rules.  Unknown names pass through
    unchanged.
    """
    if not variables:
        variables = {}

    def sub(m: re.Match) -> str:
        name = m.group("braced") or m.group("plain") or m.group("bracket")
        if name == "__all":
            return ".*"
        if name in variables:
            return _render(variables[name])
        return m.group(0)

    return _VAR_RE.sub(sub, text)


# ---------------------------------------------------------------- round 8:
# Grafana BUILT-IN time macros ($__interval, $__rate_interval, $__range
# and their _ms/_s forms).  Grafana's frontend computes these from the
# panel time range + datasource scrape interval and substitutes them
# textually before the query reaches Prometheus — dashboard replay
# needs the identical pre-pass (the macros appear in most real-world
# dashboards as `rate(x[$__rate_interval])`).

_DUR_UNITS = (
    ("y", 365 * 86400),
    ("w", 7 * 86400),
    ("d", 86400),
    ("h", 3600),
    ("m", 60),
    ("s", 1),
)


def render_duration(seconds: float) -> str:
    """Seconds → the shortest valid PromQL duration literal, composed
    greedily from the largest whole units (75 → ``1m15s``, 21600 →
    ``6h``, 0.5 → ``500ms``).  Sub-millisecond remainders round to ms;
    zero/negative renders ``0s`` (Grafana clamps, never emits empty)."""
    if seconds <= 0:
        return "0s"
    ms_total = round(seconds * 1000)
    if ms_total == 0:
        return "0s"
    whole, ms = divmod(ms_total, 1000)
    parts = []
    for unit, span in _DUR_UNITS:
        if whole >= span:
            n, whole = divmod(whole, span)
            parts.append(f"{n}{unit}")
    if ms:
        parts.append(f"{ms}ms")
    return "".join(parts)


def time_macros(
    range_seconds: float,
    step_seconds: float,
    scrape_interval_seconds: float = 15.0,
) -> dict[str, str]:
    """The Grafana built-in variable map for one panel evaluation.

    - ``$__interval`` — the panel step (Grafana: range / max data
      points, snapped; the replay caller passes the step it will hand
      to ``evaluate_range``, so the macro and the grid always agree);
    - ``$__rate_interval`` — ``max(step + scrape_interval, 4 ×
      scrape_interval)``, Grafana's documented formula guaranteeing a
      rate window that always spans ≥2 scrape samples;
    - ``$__range`` — the full panel range; ``_s``/``_ms`` variants are
      bare integers for use in value math.

    Merge the result into ``interpolate_variables``'s map (explicit
    user bindings win — the ``__`` namespace is reserved by Grafana,
    overriding is a test hook, not a user path).
    """
    rate_s = max(step_seconds + scrape_interval_seconds, 4 * scrape_interval_seconds)
    return {
        "__interval": render_duration(step_seconds),
        "__interval_ms": str(int(round(step_seconds * 1000))),
        "__rate_interval": render_duration(rate_s),
        "__rate_interval_ms": str(int(round(rate_s * 1000))),
        "__range": render_duration(range_seconds),
        "__range_s": str(int(round(range_seconds))),
        "__range_ms": str(int(round(range_seconds * 1000))),
    }
