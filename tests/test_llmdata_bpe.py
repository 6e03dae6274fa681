"""Differential pins for llmdata/bpe.py — the merge-BPE token counter
has no SQL twin (the greedy merge loop is not SQL-expressible), so
correctness is pinned by an INDEPENDENT reference implementation with
a different control structure: the reference walks the merge list in
rank order and restarts from rank 0 after every successful
application, which is semantically identical to the encoder's
"always merge the lowest-ranked pair present" greedy loop but shares
none of its code shape."""

from __future__ import annotations

import random

import pytest

from kafka_metrics_exporter_spark.llmdata import bpe


def ref_encode(word: str, merges) -> list[str]:
    parts = list(word)
    changed = True
    while changed:
        changed = False
        for a, b in merges:  # rank order; restart after a hit
            out, i, found = [], 0, False
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                    found = True
                else:
                    out.append(parts[i])
                    i += 1
            if found:
                parts = out
                changed = True
                break
    return parts


def ref_count(text: str) -> int:
    return sum(
        len(ref_encode(w, bpe.MERGES)) for w in bpe._PRETOKEN.findall(text)
    )


def test_merge_table_snapshot():
    """The built-in table is part of the tokenizer's identity: seed or
    training-rule drift must fail loudly, not silently re-tokenize
    every budget."""
    assert len(bpe.MERGES) == 256
    assert bpe.MERGES[:12] == (
        ("e", "r"), ("t", "h"), ("i", "n"), ("r", "e"), ("s", "t"),
        ("e", "n"), ("a", "n"), ("o", "u"), ("a", "r"), ("o", "n"),
        ("a", "t"), ("o", "r"),
    )
    # training is deterministic: retraining from the seed reproduces
    # the table exactly
    assert (
        tuple(
            bpe.train_bpe_merges(
                bpe._seed_word_freqs(bpe.SEED_TEXT), bpe.NUM_MERGES
            )
        )
        == bpe.MERGES
    )


def test_encoder_differential_seed_words():
    for w in sorted(bpe._seed_word_freqs(bpe.SEED_TEXT)):
        assert bpe.encode_len(w) == len(ref_encode(w, bpe.MERGES)), w


def test_encoder_differential_random_strings():
    rng = random.Random(77)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789.,!?-"
    for _ in range(300):
        w = "".join(
            rng.choice(alphabet) for _ in range(rng.randint(1, 24))
        )
        for part in bpe._PRETOKEN.findall(w):
            assert bpe.encode_len(part) == len(
                ref_encode(part, bpe.MERGES)
            ), part


def test_count_pins_and_bounds():
    assert bpe.count_tokens("") == 0
    assert bpe.count_tokens("the quick brown fox") == 6
    assert bpe.encode_len("the") == 1  # whole seed word merged
    for text in (
        "latency was 125 milliseconds, error rate 0.25 percent!",
        "The engineer restarts the connector; messages flow again.",
    ):
        n = bpe.count_tokens(text)
        pre = bpe._PRETOKEN.findall(text)
        assert n == ref_count(text)
        # merges only shrink within words: between one token per
        # pre-token and one per character
        assert len(pre) <= n <= sum(len(w) for w in pre)


def test_spark_map_matches_driver_reference(spark_local):
    d = spark_local.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = bpe.with_bpe_token_count(d.select("doc_id", "text")).toPandas()
    sample = out.sample(n=min(25, len(out)), random_state=5)
    texts = {
        r["doc_id"]: r["text"]
        for r in d.select("doc_id", "text").collect()
    }
    for _, row in sample.iterrows():
        assert row["n_bpe_tokens"] == ref_count(texts[row["doc_id"]])
    assert out["n_bpe_tokens"].notna().all()


@pytest.fixture(scope="module")
def spark_local():
    from kafka_metrics_exporter_spark.session import get_spark

    return get_spark(
        app_name="bpe-test", master="local[4]", shuffle_partitions=4
    )


def test_pack_chunks_bpe_matches_driver_replay(spark_local):
    """pack_chunks_bpe: chunk assignment replayed driver-side with the
    same counter — per lang, docs in id order cut at the running-total
    boundary."""
    from kafka_metrics_exporter_spark.llmdata.pipeline import (
        pack_chunks_bpe,
    )

    d = spark_local.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "lang", "text")
    budget = 512
    out = pack_chunks_bpe(d, budget).toPandas()
    rows = sorted(
        ((r["lang"], r["doc_id"], r["text"]) for r in d.collect()),
    )
    cum: dict[str, int] = {}
    want: dict[int, int] = {}
    counts: dict[int, int] = {}
    for lang, doc_id, text in rows:
        n = bpe.count_tokens(text)
        before = cum.get(lang, 0)
        want[doc_id] = before // budget
        counts[doc_id] = n
        cum[lang] = before + n
    got = {r["doc_id"]: (r["chunk_id"], r["n_bpe_tokens"])
           for _, r in out.iterrows()}
    assert len(got) == len(want)
    for doc_id, chunk in want.items():
        assert got[doc_id] == (chunk, counts[doc_id]), doc_id


def test_pretokenizer_ascii_whitespace_parity():
    """\\s is pinned to the ASCII set (re.ASCII): Python's unicode \\s
    would swallow NBSP where the Java-regex/RE2 twins (ASCII \\s) count
    it as a punctuation token — all three engines must read the same
    pattern identically."""
    import duckdb

    text = "a b"  # NBSP between letters
    py = bpe._PRETOKEN.findall(text)
    duck = duckdb.connect().execute(
        "SELECT regexp_extract_all(?, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')",
        [text],
    ).fetchone()[0]
    assert py == duck == ["a", " ", "b"]
    assert bpe.count_tokens(text) == 3
