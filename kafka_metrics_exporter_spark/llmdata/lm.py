"""Corpus-self-trained n-gram language-model perplexity — the CCNet-
style LM quality filter as a real log-likelihood (the token_rarity row
documents its integer-frequency statistic as "an intentional
deterministic stand-in for unigram logprob"; this module removes the
stand-in with the engine's fixed-point-sum determinism tool).

Model (all public textbook machinery — Jelinek-Mercer interpolation
over add-k-smoothed counts, trained on the scored corpus itself):

    P(w2 | w1) = lam * (B(w1,w2) + k) / (C(w1) + k*V)
               + (1 - lam) * (U(w2) + k) / (T + k*V)

with U/T the unigram counts/total, B the adjacent-bigram counts,
C(w1) = sum_w2 B(w1, w2) the context totals, V the vocabulary size,
lam = 0.75, k = 1.  A document's score is the perplexity over its
n-1 bigram positions:  ppl = exp(-(1/n) * sum log P).

Determinism: each position's log P quantizes to 1e-8 fixed point
(``floor(x*1e8 + 0.5)`` — identical IEEE ops in Spark and DuckDB) and
the per-document sum accumulates the exact integers, so any
partitioning/ordering yields the identical total (the plans._lsum
stance).  Cross-engine ln() may differ by ulps BEFORE quantization; a
flipped fixed-point unit moves a document's mean log by 1e-8 — far
below the 4-decimal value-hash contract the oracle gate applies.

Scale shape (the token_rarity cost class, one step up):
- bigram extraction is SCAN-LOCAL (zip of two array slices, one
  explode) — no self-join on position;
- count tables are token-keyed hash aggregations with map-side
  partials (Zipf-hot words combine before the shuffle);
- scoring joins the doc-scale pair stream against the aggregated
  count tables on (w1,w2) / w1 / w2 — the count side of each join is
  key-unique, so hot probe keys hash-join without build-side skew;
- T and V ride a one-row broadcast (the keys=[] aggregate shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: interpolation weight on the bigram term and the add-k constant —
#: fixed model identity, shared with the SQL twin.
LAMBDA = 0.75
ADD_K = 1.0

_Q = 100_000_000.0  # 1e-8 fixed point, the plans._lsum scale

#: Explicit whitespace class shared by BOTH engines.  Java's ``\s``
#: includes vertical tab ``\x0B`` while RE2's (the DuckDB twin's
#: ``string_split_regex``) does not — the exact cross-engine
#: regex-class hazard ``bpe.py`` documents.  Spelling the class out
#: (Java's default ``\s`` membership) makes the two tokenizers
#: byte-identical; ``tests/test_llmdata_lm.py`` pins the parity.
WS_CLASS = "[ \\t\\n\\x0B\\f\\r]+"


def _tokens(text):  # lowercased whitespace tokens, empties dropped
    return F.filter(F.split(F.lower(text), WS_CLASS), lambda t: t != "")


def bigram_perplexity(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document interpolated bigram perplexity over the corpus's
    own counts.  Returns (id_col, n_bigrams, ppl); documents with
    fewer than two tokens emit a null ppl (no bigram positions — the
    loud relational stance, never a fabricated score)."""
    toks = docs.select(F.col(id_col), _tokens(F.col(text_col)).alias("__ts"))
    # adjacent pairs, scan-local: zip(arr[:-1], arr[1:]).  The slice
    # LENGTH clamps at 0: a zero-token doc (empty / whitespace-only
    # text) would otherwise hand F.slice a length of -1 and Spark
    # raises INVALID_PARAMETER_VALUE.LENGTH — the clamp keeps the
    # documented contract (null ppl for < 2 tokens) for 0-token docs
    # too, matching the DuckDB twin's graceful empty list slice.
    bg_len = F.greatest(F.size("__ts") - F.lit(1), F.lit(0))
    pairs = toks.select(
        id_col,
        F.explode(
            F.zip_with(
                F.slice(F.col("__ts"), 1, bg_len),
                F.slice(F.col("__ts"), 2, bg_len),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg"),
    ).select(id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    uni = (
        toks.select(F.explode("__ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("u"))
    )
    tv = uni.agg(
        F.sum("u").cast("double").alias("__t"),
        F.count(F.lit(1)).cast("double").alias("__v"),
    )
    big = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("b"))
    ctx = pairs.groupBy("w1").agg(F.count(F.lit(1)).alias("c"))
    scored = (
        pairs.join(big, ["w1", "w2"])
        .join(ctx, "w1")
        .join(uni.select(F.col("w").alias("w2"), "u"), "w2")
        .crossJoin(F.broadcast(tv))
    )
    p = (
        F.lit(LAMBDA)
        * (F.col("b") + F.lit(ADD_K))
        / (F.col("c") + F.lit(ADD_K) * F.col("__v"))
        + F.lit(1.0 - LAMBDA)
        * (F.col("u") + F.lit(ADD_K))
        / (F.col("__t") + F.lit(ADD_K) * F.col("__v"))
    )
    # 1e-8 fixed-point quantization BEFORE the per-doc sum: integer
    # addition is associative, so the total is partition-order-
    # independent (plans._lsum)
    ql = F.floor(F.log(p) * F.lit(_Q) + F.lit(0.5)).cast("decimal(38,0)")
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(ql).alias("__qsum"),
    )
    ppl = F.exp(
        -(F.col("__qsum").cast("double") / F.lit(_Q))
        / F.col("n_bigrams").cast("double")
    )
    out = per_doc.select(id_col, "n_bigrams", ppl.alias("ppl"))
    # docs with < 2 tokens have no pair rows: restore them with null
    # ppl via a left join from the full id set
    return (
        docs.select(id_col)
        .join(out, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.col("ppl"),
        )
    )


def ccnet_buckets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """CCNet's actual output shape: head / middle / tail quality
    buckets by perplexity TERCILES (CCNet trains KenLM on Wikipedia
    and buckets Common Crawl by the 33/67 percentile cuts; this
    engine's LM is the corpus-self-trained bigram model above —
    documented divergence, same bucketing machinery).

    Scale: the tercile thresholds are ONE exact-percentile aggregation
    over the scored relation (a 1-row result riding a broadcast
    cross-join — the keys=[] aggregate shape), then a scan-local CASE;
    no window, no sort of the corpus.  Documents without a score
    (< 2 tokens) bucket as 'unscored' rather than silently joining a
    tercile."""
    scored = bigram_perplexity(docs, text_col=text_col, id_col=id_col)
    # the scored relation feeds the tercile-cut aggregate AND the
    # bucketed output — without the persist the ENTIRE perplexity
    # pipeline (tokenize, three count joins, per-doc sum) executed
    # twice per run (optimization r16).  INTENTIONALLY not unpersisted
    # here (ADVICE r16): the returned frame is lazy and still reads
    # the cache, so an eager unpersist would discard the shared scan
    # before the caller's action.  Long-lived sessions that call this
    # repeatedly should spark.catalog.clearCache() between runs (the
    # bench harness does); the cache is doc-count rows of
    # (id, ppl, n_tokens), not corpus text.
    scored = scored.persist()
    cuts = scored.filter(F.col("ppl").isNotNull()).agg(
        F.percentile(F.col("ppl"), F.lit(1.0 / 3.0)).alias("__c1"),
        F.percentile(F.col("ppl"), F.lit(2.0 / 3.0)).alias("__c2"),
    )
    out = scored.crossJoin(F.broadcast(cuts))
    bucket = (
        F.when(F.col("ppl").isNull(), F.lit("unscored"))
        .when(F.col("ppl") <= F.col("__c1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("__c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return out.select(
        id_col, "n_bigrams", "ppl", bucket.alias("bucket")
    )


def ccnet_buckets_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`ccnet_buckets`: quantile_cont matches
    Spark's exact interpolated ``percentile``."""
    inner = bigram_perplexity_sql(table, text_col, id_col)
    return f"""
    WITH scored AS ({inner}),
    cuts AS (
      SELECT quantile_cont(ppl, 1.0/3.0) AS c1,
             quantile_cont(ppl, 2.0/3.0) AS c2
      FROM scored WHERE ppl IS NOT NULL
    )
    SELECT s.{id_col}, s.n_bigrams, s.ppl,
           CASE WHEN s.ppl IS NULL THEN 'unscored'
                WHEN s.ppl <= c.c1 THEN 'head'
                WHEN s.ppl <= c.c2 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM scored s CROSS JOIN cuts c
    """


def bigram_perplexity_sql(
    table: str = "documents", text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of :func:`bigram_perplexity` — the same counts,
    interpolation constants and 1e-8 fixed-point log summation."""
    # WS_CLASS verbatim: DuckDB plain string literals pass backslashes
    # through to RE2 untouched, so the Spark and SQL tokenizers share
    # one explicit whitespace class (RE2's \s lacks \x0B, Java's has it).
    toks = (
        f"list_filter(string_split_regex(lower({text_col}), '{WS_CLASS}'),"
        f" x -> x <> '')"
    )
    return f"""
    WITH tk AS (
      SELECT {id_col}, {toks} AS ts FROM {table}
    ),
    pairs AS (
      SELECT {id_col}, z[1] AS w1, z[2] AS w2 FROM (
        SELECT {id_col},
               unnest(list_zip(ts[1:len(ts)-1], ts[2:len(ts)])) AS z
        FROM tk
      )
    ),
    uni AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS u FROM (
        SELECT unnest(ts) AS w FROM tk) GROUP BY w
    ),
    tv AS (
      SELECT CAST(SUM(u) AS DOUBLE) AS t,
             CAST(COUNT(*) AS DOUBLE) AS v
      FROM uni
    ),
    big AS (
      SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS b
      FROM pairs GROUP BY w1, w2
    ),
    ctx AS (
      SELECT w1, CAST(COUNT(*) AS BIGINT) AS c FROM pairs GROUP BY w1
    ),
    scored AS (
      SELECT p.{id_col},
             CAST(floor(ln(
               {LAMBDA!r} * (bg.b + {ADD_K!r}) / (cx.c + {ADD_K!r} * tv.v)
               + {1.0 - LAMBDA!r} * (un.u + {ADD_K!r})
                 / (tv.t + {ADD_K!r} * tv.v)
             ) * 100000000.0 + 0.5) AS HUGEINT) AS ql
      FROM pairs p
      JOIN big bg ON p.w1 = bg.w1 AND p.w2 = bg.w2
      JOIN ctx cx ON p.w1 = cx.w1
      JOIN uni un ON p.w2 = un.w
      CROSS JOIN tv
    ),
    per_doc AS (
      SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             SUM(ql) AS qsum
      FROM scored GROUP BY {id_col}
    )
    SELECT d.{id_col},
           CAST(COALESCE(pd.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           exp(-(CAST(pd.qsum AS DOUBLE) / 100000000.0)
               / CAST(pd.n_bigrams AS DOUBLE)) AS ppl
    FROM {table} d
    LEFT JOIN per_doc pd ON d.{id_col} = pd.{id_col}
    """
