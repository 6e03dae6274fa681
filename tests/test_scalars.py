"""Scalar helper coverage: P9 URL normalization, P8 netloc, composite
dotted-path extraction, and the CLI poll-interval floor (W5)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.app import JMX_POLL_FLOOR_SECS, build_parser
from kafka_metrics_exporter_spark.functions import (
    host_from_url,
    objectname_domain,
    objectname_props,
    url_normalize_col,
)
from kafka_metrics_exporter_spark.operators.normalize import composite_field


def _one(spark, value: str, col):
    return spark.createDataFrame([(value,)], ["u"]).select(col(F.col("u")).alias("x")).first()["x"]


@pytest.mark.parametrize(
    ("raw", "expected"),
    [
        ("kafka1:49901", "http://kafka1:49901"),
        ("http://kafka1:49901//jolokia//read", "http://kafka1:49901/jolokia/read"),
        ("https://h:1/a/b", "https://h:1/a/b"),
    ],
)
def test_url_normalize(spark, raw, expected):
    assert _one(spark, raw, url_normalize_col) == expected


def test_host_from_url_with_jolokia_path(spark):
    assert (
        _one(spark, "http://kafka1:49901/jolokia/read/kafka.*:*", host_from_url)
        == "kafka1:49901"
    )


def test_objectname_helpers(spark):
    mbean = "kafka.server:type=BrokerTopicMetrics,name=X,topic=t1"
    assert _one(spark, mbean, objectname_domain) == "kafka.server"
    props = _one(spark, mbean, objectname_props)
    assert props == {"type": "BrokerTopicMetrics", "name": "X", "topic": "t1"}
    assert _one(spark, "no-colon-here", objectname_props) == {}


def test_composite_field_dotted_path(spark):
    heap = json.dumps({"init": 1, "used": 42, "committed": 3, "max": 4})
    df = spark.createDataFrame([([("HeapMemoryUsage", heap)],)], "attrs array<struct<key:string,value:string>>")
    df = df.select(F.map_from_entries("attrs").alias("attributes"))
    row = df.select(composite_field("HeapMemoryUsage", "used")).first()
    assert row["HeapMemoryUsage.used"] == 42.0


def test_poll_interval_floor():
    args = build_parser().parse_args(
        ["--jmx-kafka-server", "k:1", "--sink-parquet", "/tmp/x", "--poll-interval", "5"]
    )
    assert max(args.poll_interval, JMX_POLL_FLOOR_SECS) == 15  # reference floor


def test_objectname_value_containing_equals(spark):
    """ObjectName values may contain '=': the pivot must split each
    key-property at the FIRST '=' only, like the reference's
    split('=', 1) (Code/JMXScraper.py:113-115)."""
    props = _one(spark, "d:k1=v1=extra,k2=v2", objectname_props)
    assert props == {"k1": "v1=extra", "k2": "v2"}


def _osa_ref(a: str, b: str) -> int:
    """Reference optimal-string-alignment DP (restricted
    Damerau-Levenshtein), straight from the textbook recurrence."""
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            d[i][j] = min(
                d[i - 1][j] + 1, d[i][j - 1] + 1, d[i - 1][j - 1] + cost
            )
            if (
                i > 1
                and j > 1
                and a[i - 1] == b[j - 2]
                and a[i - 2] == b[j - 1]
            ):
                d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
    return d[n][m]


def test_osa_distance_differential(spark):
    """The Catalyst nested-fold OSA (functions.scalars.osa_distance)
    must agree with the reference DP on an adversarial corpus:
    transpositions, edits inside transposed pairs (the restricted-DL
    corner where unrestricted Damerau differs), repeats, and empties.
    One Spark job for the whole grid keeps this fast."""
    import itertools

    from kafka_metrics_exporter_spark.functions.scalars import osa_distance

    alphabet = "abc"
    strings = [""] + [
        "".join(t)
        for n in (1, 2, 3, 4)
        for t in itertools.product(alphabet, repeat=n)
    ]
    # full 121²-pair grid is overkill; take a deterministic slice plus
    # the known corner cases
    pairs = [(x, y) for x in strings[::3] for y in strings[::5]]
    pairs += [("ca", "abc"), ("ab", "ba"), ("abcd", "badc"),
              ("aa", "aa"), ("abab", "baba"), ("xy", "yx")]
    df = spark.createDataFrame(pairs, "a string, b string")
    got = df.select("a", "b", osa_distance(F.col("a"), F.col("b")).alias("d")).collect()
    for r in got:
        assert r["d"] == _osa_ref(r["a"], r["b"]), (r["a"], r["b"], r["d"])
