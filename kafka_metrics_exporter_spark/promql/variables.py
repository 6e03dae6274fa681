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
