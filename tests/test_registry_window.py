"""Window policy guard: the driver records only the first
``CORRECTNESS_WINDOW`` entries of ``queries()`` (observed r1-r3), so
every query that has no prior driver CORRECTNESS row MUST be
registered inside that window or it ships unverified.
"""

from __future__ import annotations

import json
import os

from kafka_metrics_exporter_spark.plans import (
    CHANGED_THIS_ROUND,
    CORRECTNESS_WINDOW,
    NEW_THIS_ROUND,
    ORACLE_SQL,
    QUERIES,
    WINDOW_PRIORITY,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Names with a driver CORRECTNESS row in any completed round — frozen
# to the specific files so the assertion doesn't drift when the driver
# writes newer CORRECTNESS files into the repo.
_VERIFIED = {
    json_name
    for fname in (
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
        "CORRECTNESS_r05.json",
    )
    for json_name in json.load(open(os.path.join(REPO, fname)))
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
    """Any query without a prior driver row (new this round) must sit
    in the first CORRECTNESS_WINDOW slots so the driver verifies it
    this round."""
    window = set(list(QUERIES)[:CORRECTNESS_WINDOW])
    never_verified = [n for n in QUERIES if n not in _VERIFIED]
    outside = [n for n in never_verified if n not in window]
    assert not outside, (
        f"queries with no driver CORRECTNESS row are outside the "
        f"first-{CORRECTNESS_WINDOW} window: {outside}"
    )
    # and the declared new-query list is complete: a query the driver
    # has never seen MUST be declared NEW_THIS_ROUND
    undeclared = [
        n for n in never_verified if n not in NEW_THIS_ROUND
    ]
    assert not undeclared, (
        f"queries with no driver row missing from NEW_THIS_ROUND: "
        f"{undeclared}"
    )


def test_changed_queries_land_in_window():
    """ADVICE r4: queries whose engine semantics or oracle changed this
    round must be re-verified by the driver — being green in an OLD
    round does not cover new code.  The changed list is maintained in
    plans/__init__.py next to the window."""
    window = set(list(QUERIES)[:CORRECTNESS_WINDOW])
    missing = [
        n for n in NEW_THIS_ROUND + CHANGED_THIS_ROUND if n not in window
    ]
    assert not missing, (
        f"new/changed queries outside the first-{CORRECTNESS_WINDOW} "
        f"window: {missing}"
    )


def test_oracle_order_mirrors_queries():
    qs = [n for n in QUERIES if n in ORACLE_SQL]
    assert qs == list(ORACLE_SQL)
