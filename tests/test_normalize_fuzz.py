"""Fuzz the normalizer: arbitrary hostile scrape bodies must never crash
the pipeline — failed scrapes drop, valid ones normalize (reference
skip-and-continue semantics, Code/JMXScraper.py:163-165).

Hypothesis generates the corpus; all examples run in ONE Spark job
(per-example jobs would be minutes of overhead)."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_metrics_exporter_spark.operators import normalize_scrapes
from kafka_metrics_exporter_spark.schema import RAW_SCRAPE_SCHEMA

# one corpus, many shapes: garbage text, wrong-typed JSON, deep nesting,
# metacharacters in mbean names, missing fields
_BODY = st.one_of(
    st.text(max_size=80),
    st.none(),
    st.builds(
        lambda mbean, status, value: json.dumps(
            {"request": {"mbean": mbean}, "status": status, "value": value}
        ),
        mbean=st.text(
            alphabet="abcXYZ0189:=,.*<>$[]()\\ ", min_size=0, max_size=40
        ),
        status=st.sampled_from([200, 404, None, "200"]),
        value=st.one_of(
            st.none(),
            st.integers(),
            st.text(max_size=20),
            st.dictionaries(
                st.text(alphabet="abc:=,*", min_size=1, max_size=20),
                st.one_of(
                    st.integers(),
                    st.floats(allow_nan=False, allow_infinity=False),
                    st.text(max_size=10),
                    st.dictionaries(st.text(min_size=1, max_size=5), st.integers(), max_size=3),
                ),
                max_size=4,
            ),
        ),
    ),
)


@settings(max_examples=1, deadline=None)
@given(bodies=st.lists(_BODY, min_size=150, max_size=150))
def test_normalizer_never_crashes_on_hostile_bodies(spark, bodies):
    rows = [
        (f"http://h{i % 7}:8778/jolokia/read/x", "KafkaBroker", 1700000000000, 200, b)
        for i, b in enumerate(bodies)
    ]
    out = normalize_scrapes(spark.createDataFrame(rows, RAW_SCRAPE_SCHEMA)).collect()
    # every surviving row carries the injected metadata
    for r in out:
        assert r["host_name"].startswith("h")
        assert r["created_ms"] == 1700000000000
        assert r["mbean_name"] is not None
