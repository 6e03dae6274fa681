"""Window policy guard: the driver records only the first
``CORRECTNESS_WINDOW`` entries of ``queries()`` (observed r1-r3), so
every query that has no prior driver CORRECTNESS row MUST be
registered inside that window or it ships unverified.
"""

from __future__ import annotations

import json
import os

from kafka_metrics_exporter_spark.plans import (
    CHANGED_OUT_OF_WINDOW,
    CHANGED_THIS_ROUND,
    CORRECTNESS_WINDOW,
    CURRENT_ROUND,
    NEW_THIS_ROUND,
    ORACLE_SQL,
    QUERIES,
    STALE_OUT_OF_WINDOW,
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
        "CORRECTNESS_r06.json",
        "CORRECTNESS_r07.json",
        "CORRECTNESS_r09.json",
        "CORRECTNESS_r10.json",
        "CORRECTNESS_r11.json",
        "CORRECTNESS_r12.json",
        "CORRECTNESS_r13.json",
        "CORRECTNESS_r14.json",
        "CORRECTNESS_r15.json",
        "CORRECTNESS_r16.json",
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


def test_rotation_promotes_stale_rows():
    """The rotation policy itself, machine-checked: every query whose
    latest driver row is one gate-run old (present in the
    second-most-recent correctness file but not the most recent one)
    must be promoted into this round's window — except the declared
    STALE_OUT_OF_WINDOW demotions.

    The ledger walks back to the two most recent EXISTING files rather
    than assuming r(N-1)/r(N-2): round 8's driver gate emitted no
    CORRECTNESS_r08.json, so at round 9 the comparison is r07 vs r06 —
    a skipped gate must not crash the check, and a query's row is only
    as fresh as the last gate that actually RAN."""
    existing = sorted(
        int(f[len("CORRECTNESS_r"):-len(".json")])
        for f in os.listdir(REPO)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    assert len(existing) >= 2, "rotation check needs two correctness files"
    prev = set(
        json.load(
            open(os.path.join(REPO, f"CORRECTNESS_r{existing[-1]:02d}.json"))
        )
    )
    prev2 = set(
        json.load(
            open(os.path.join(REPO, f"CORRECTNESS_r{existing[-2]:02d}.json"))
        )
    )
    stale = (prev2 - prev) & set(QUERIES)
    window = set(list(QUERIES)[:CORRECTNESS_WINDOW])
    missing = sorted(stale - window - set(STALE_OUT_OF_WINDOW))
    assert not missing, (
        f"queries with a two-round-old driver row neither promoted nor "
        f"declared STALE_OUT_OF_WINDOW: {missing}"
    )


def test_out_of_window_exemptions_have_fresh_golden():
    """ADVICE r6: out-of-window exemptions must be machine-checked, not
    comment-only.  Every CHANGED_OUT_OF_WINDOW / STALE_OUT_OF_WINDOW
    query must have a GOLDEN.json row recorded from THIS round's code —
    each row carries its own round stamp (ADVICE r10: the file-level
    stamp attests only the last FULL record; a partial re-record no
    longer freshens carried-forward hashes), so bumping CURRENT_ROUND
    without re-recording fails here per query."""
    exempt = CHANGED_OUT_OF_WINDOW + STALE_OUT_OF_WINDOW
    if not exempt:
        return
    golden = json.load(open(os.path.join(REPO, "GOLDEN.json")))
    missing = [n for n in exempt if n not in golden["queries"]]
    assert not missing, f"exempt queries missing from GOLDEN.json: {missing}"
    stale_stamp = [
        n
        for n in exempt
        if golden["queries"][n].get("round", golden.get("round"))
        != CURRENT_ROUND
    ]
    assert not stale_stamp, (
        f"out-of-window exemptions whose GOLDEN row was not re-recorded "
        f"under CURRENT_ROUND {CURRENT_ROUND}: {stale_stamp} — re-run "
        f"tools/record_golden.py"
    )
    # exemptions are exceptional: they must not silently grow past the
    # slot arithmetic that forced them (round 16: 50 slots vs 48
    # r14-latest candidates + 21 r11-tail promotions — the verdict's
    # full >=4-run burn-down — + 5 new + 3 changed = 77 candidates,
    # forcing 26 demotions; no CHANGED_OUT_OF_WINDOW this round)
    assert len(exempt) <= 26, exempt
