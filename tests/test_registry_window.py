"""Window policy guard: the driver records only the first
``CORRECTNESS_WINDOW`` entries of ``queries()`` (observed r1-r3), so
every query that has no prior driver CORRECTNESS row MUST be
registered inside that window or it ships unverified.
"""

from __future__ import annotations

import json
import os

from kafka_metrics_exporter_spark.plans import (
    CORRECTNESS_WINDOW,
    ORACLE_SQL,
    QUERIES,
    WINDOW_PRIORITY,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Names that had a green (or rows-only) row in CORRECTNESS_r03.json —
# frozen here so the assertion doesn't drift when the driver writes
# newer CORRECTNESS files into the repo.
_R3_VERIFIED = {
    json_name
    for json_name in json.load(open(os.path.join(REPO, "CORRECTNESS_r03.json")))
}


def test_window_priority_names_exist():
    missing = [n for n in WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"WINDOW_PRIORITY references unknown queries: {missing}"


def test_window_priority_fits():
    assert len(WINDOW_PRIORITY) <= CORRECTNESS_WINDOW


def test_priority_prefix_is_respected():
    head = list(QUERIES)[: len(WINDOW_PRIORITY)]
    assert head == [n for n in WINDOW_PRIORITY if n in QUERIES]


def test_unverified_queries_land_in_window():
    """Any query without a prior driver row (new this round, or pushed
    out of the r3 window) must sit in the first CORRECTNESS_WINDOW
    slots so the driver verifies it this round."""
    window = set(list(QUERIES)[:CORRECTNESS_WINDOW])
    never_verified = [n for n in QUERIES if n not in _R3_VERIFIED]
    outside = [n for n in never_verified if n not in window]
    assert not outside, (
        f"queries with no driver CORRECTNESS row are outside the "
        f"first-{CORRECTNESS_WINDOW} window: {outside}"
    )


def test_oracle_order_mirrors_queries():
    qs = [n for n in QUERIES if n in ORACLE_SQL]
    assert qs == list(ORACLE_SQL)
