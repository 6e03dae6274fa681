"""Pins for llmdata/lm.py — interpolated bigram perplexity.

1. Hand-computed corpus: every count, probability and the final ppl
   derived by hand in the test body.
2. Engine parity: the Spark plan and the DuckDB twin agree per doc to
   the 4-decimal value-hash contract on the sf0.001 documents table.
3. Independent Python replay: a dict-based reference implementation
   (no Spark, no SQL) matches both.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from kafka_metrics_exporter_spark.llmdata import lm


def ref_ppl(doc_texts: dict) -> dict:
    """Pure-Python reference: same model, plain floats (no fixed-point
    — agreement bound is therefore ~1e-8 on mean log, far inside the
    test tolerances)."""
    toks = {d: [t for t in text.lower().split() if t] for d, text in
            doc_texts.items()}
    uni: dict[str, int] = {}
    big: dict[tuple, int] = {}
    ctx: dict[str, int] = {}
    for ts in toks.values():
        for t in ts:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    T, V = sum(uni.values()), len(uni)
    out = {}
    for d, ts in toks.items():
        pairs = list(zip(ts, ts[1:]))
        if not pairs:
            out[d] = (0, None)
            continue
        s = 0.0
        for a, b in pairs:
            p = (
                lm.LAMBDA * (big[(a, b)] + lm.ADD_K)
                / (ctx[a] + lm.ADD_K * V)
                + (1 - lm.LAMBDA) * (uni[b] + lm.ADD_K)
                / (T + lm.ADD_K * V)
            )
            s += math.log(p)
        out[d] = (len(pairs), math.exp(-s / len(pairs)))
    return out


@pytest.fixture(scope="module")
def spark():
    from kafka_metrics_exporter_spark.session import get_spark

    return get_spark(
        app_name="lm-test", master="local[4]", shuffle_partitions=4
    )


def test_bigram_perplexity_hand_computed(spark):
    # corpus: "a b a b" / "a b" / "c" (no bigrams)
    # uni: a=3 b=3 c=1, T=7, V=3; big: (a,b)=3 (b,a)=1; ctx: a=3 b=1
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["ppl"])
           for r in lm.bigram_perplexity(docs).collect()}
    p_ab = 0.75 * (3 + 1) / (3 + 3) + 0.25 * (3 + 1) / (7 + 3)
    p_ba = 0.75 * (1 + 1) / (1 + 3) + 0.25 * (3 + 1) / (7 + 3)

    def q(x):  # the engine's 1e-8 fixed-point quantization
        return math.floor(math.log(x) * 1e8 + 0.5) / 1e8

    ppl1 = math.exp(-(q(p_ab) * 2 + q(p_ba)) / 3)
    ppl2 = math.exp(-q(p_ab) / 1)
    assert got[1][0] == 3 and got[1][1] == pytest.approx(ppl1, rel=1e-12)
    assert got[2][0] == 1 and got[2][1] == pytest.approx(ppl2, rel=1e-12)
    assert got[3] == (0, None)  # no bigram positions: null, not 0


def test_bigram_perplexity_engines_and_reference_agree(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    got = {r["doc_id"]: (r["n_bigrams"], r["ppl"])
           for r in lm.bigram_perplexity(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    sql = {r[0]: (r[1], r[2]) for r in
           con.execute(lm.bigram_perplexity_sql()).fetchall()}
    ref = ref_ppl({r["doc_id"]: r["text"] for r in docs.collect()})
    assert set(got) == set(sql) == set(ref)
    for d in got:
        assert got[d][0] == sql[d][0] == ref[d][0], d
        if ref[d][1] is None:
            assert got[d][1] is None and sql[d][1] is None
            continue
        # engine-vs-engine: identical fixed-point sums up to ln() ulps
        assert got[d][1] == pytest.approx(sql[d][1], rel=1e-9), d
        # vs the unquantized reference: 1e-8-scale quantization bound
        assert got[d][1] == pytest.approx(ref[d][1], rel=1e-6), d
    # sanity: a repetitive doc scores LOWER perplexity than the corpus
    # median (the filter's actual use)
    ppls = sorted(v[1] for v in got.values() if v[1] is not None)
    assert ppls[0] < ppls[len(ppls) // 2]


def test_zero_token_docs_and_ws_class_parity(spark):
    """ADVICE r15 regressions: (a) empty / whitespace-only documents
    must emit null ppl, not crash the slice with length -1; (b) the
    tokenizer's whitespace class is spelled explicitly so a vertical
    tab splits identically in Spark (Java regex) and the DuckDB twin
    (RE2, whose \\s excludes \\x0B)."""
    rows = [
        (1, ""),                 # zero tokens: empty string
        (2, "   "),              # zero tokens: spaces only
        (3, " \t\n\x0b\f\r "),   # zero tokens: every class member
        (4, "a\x0bb a\x0bb"),    # \x0B splits -> tokens a b a b
        (5, "a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["ppl"])
           for r in lm.bigram_perplexity(docs).collect()}
    for d in (1, 2, 3):
        assert got[d] == (0, None), (d, got[d])
    assert got[4][0] == 3  # "a b a b" has 3 bigram positions
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = {r[0]: (r[1], r[2]) for r in
           con.execute(lm.bigram_perplexity_sql()).fetchall()}
    ref = ref_ppl(dict(rows))  # Python split() also splits \x0b
    assert set(got) == set(sql) == set(ref)
    for d in got:
        assert got[d][0] == sql[d][0] == ref[d][0], d
        if ref[d][1] is None:
            assert got[d][1] is None and sql[d][1] is None, d
        else:
            assert got[d][1] == pytest.approx(sql[d][1], rel=1e-9), d
            assert got[d][1] == pytest.approx(ref[d][1], rel=1e-6), d
    # ccnet_buckets inherits the fix: zero-token docs bucket unscored
    tb = {r["doc_id"]: r["bucket"]
          for r in lm.ccnet_buckets(docs).collect()}
    assert tb[1] == tb[2] == tb[3] == "unscored"


def test_ccnet_buckets(spark):
    """Tercile bucketing: engine vs DuckDB twin on the fixture corpus,
    plus a tiny corpus where the cuts are hand-derivable and the
    unscored path fires."""
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    got = {r["doc_id"]: r["bucket"]
           for r in lm.ccnet_buckets(docs).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/documents.parquet')"
    )
    sql = {r[0]: r[3] for r in
           con.execute(lm.ccnet_buckets_sql()).fetchall()}
    assert got == sql
    from collections import Counter
    c = Counter(got.values())
    n = sum(v for k, v in c.items() if k != "unscored")
    # terciles: each scored bucket holds about a third
    for k in ("head", "middle", "tail"):
        assert abs(c[k] - n / 3) <= max(3, 0.05 * n), c
    # unscored path: a no-bigram doc never joins a tercile
    tiny = spark.createDataFrame(
        [(1, "a b a b"), (2, "z q"), (3, "c")],
        "doc_id long, text string")
    tb = {r["doc_id"]: r["bucket"]
          for r in lm.ccnet_buckets(tiny).collect()}
    assert tb[3] == "unscored"
    assert set(tb[d] for d in (1, 2)) <= {"head", "middle", "tail"}
