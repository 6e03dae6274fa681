"""Fake K8s pod lister for daemon-discovery tests (FIXTURES.md §4 pod
shape).  The jolokia source resolves and CALLS the lister on every
trigger in a separate long-lived Python worker process, so state must
travel through the filesystem: the lister reads the JSON pod list at
``state_path`` — a test adds a pod mid-stream by rewriting that file
and watches the next micro-batch pick it up.

``state_path`` arrives either as a direct kwarg (library-level tests)
or smuggled through the field-selector dict (CLI-level tests, where
only --jmx-k8s-*-filter values reach the lister)."""

from __future__ import annotations

import json
import os


def list_pods(
    state_path: str | None = None,
    label_selectors: dict | None = None,
    field_selectors: dict | None = None,
    context: str | None = None,
    **_kwargs,
) -> list[dict]:
    path = state_path or (field_selectors or {}).get("state_path")
    if not path or not os.path.exists(path):
        return []
    return json.loads(open(path).read())
