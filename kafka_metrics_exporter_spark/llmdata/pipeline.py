"""Training-data pipeline plumbing: deterministic splits, stratified
(per-domain) sampling, sequence packing, and benchmark decontamination.

These are the corpus-assembly steps downstream of dedup/quality in a
100 TB pipeline.  All selection here is CONTENT-ADDRESSED (md5 of the
document id), never `rand()`/`.sample()`: a hash decision is
reproducible across runs, stable under Spark task retries and
re-partitioning, and — unlike a seeded `.sample()` — independent of
partition layout, so the same document lands in the same split on any
cluster.  (See similarity.py's mean probe for an observed
`.sample(seed=...)` nondeterminism.)

Every operator is pure Column expressions (JVM codegen; the one
exception is decontamination's reuse of dedup.shingles, which is
Arrow-batched) and every one has a DuckDB-expressible twin in
plans/llm_queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_metrics_exporter_spark.llmdata.dedup import shingles

#: 16-bit bucket space — fractions resolve to 1/65536 granularity.
N_BUCKETS = 65536


def hash_bucket(id_col: Column) -> Column:
    """Uniform bucket in [0, 65536) from the md5 of the id's string
    form.  md5 (not xxhash64) because the oracle must reproduce it:
    DuckDB computes the identical digest, and the 4-hex-char prefix
    converts with conv()/'0x' cast on each side."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10).cast("int")


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
) -> DataFrame:
    """Assign each row a split label by hash-bucket range.  Weights are
    cumulative thresholds over the 16-bit bucket space, so a document's
    split is a pure function of its id — growing the corpus never
    reshuffles existing assignments (critical: a doc drifting from
    train to val across dataset versions contaminates the eval)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(F.col(id_col))
    expr = None
    acc = 0.0
    # iterate in dict order; last split takes the remainder so the
    # thresholds always cover the full bucket space
    splits = list(weights.items())
    for name, w in splits[:-1]:
        acc += w
        cond = b < int(acc * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_keep(
    df: DataFrame,
    fractions: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Domain-mixing downsample: keep each stratum at its target rate
    (e.g. cap boilerplate-heavy domains, upweight rare languages).
    Filter is a literal when-chain on the hash bucket — no join, no
    shuffle; Catalyst pushes it into the scan."""
    b = hash_bucket(F.col(id_col))
    rate = None
    for stratum, frac in fractions.items():
        cond = F.col(stratum_col) == stratum
        lim = F.lit(int(frac * N_BUCKETS))
        rate = F.when(cond, lim) if rate is None else rate.when(cond, lim)
    rate = (
        F.lit(int(default_fraction * N_BUCKETS))
        if rate is None
        else rate.otherwise(int(default_fraction * N_BUCKETS))
    )
    return df.filter(b < rate)


def pack_chunks(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    part_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequential context-window packing: within each partition key,
    documents are laid end-to-end in id order and cut into chunks of
    ~``budget`` tokens (a document starts a new chunk when the running
    total before it has filled the current one).  This is the
    deterministic streaming form of sequence packing — greedy best-fit
    packs ~1% tighter but is order-dependent and unstable under
    re-partitioning, which matters more at 100 TB than the 1%.

    The window partitions by ``part_col``: parallelism = #partition
    keys.  At scale, pack per (part_col, shard) with shard =
    hash_bucket % K to bound any one window's row count; the chunk ids
    then namespace by shard exactly as they namespace by lang here."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    return df.select(
        F.col(id_col),
        F.col(part_col),
        F.col(token_col),
        F.floor((cum - F.col(token_col)) / F.lit(budget)).alias("chunk_id"),
    )


def pack_chunks_bpe(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    part_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`pack_chunks` with merge-BPE-denominated budgets
    (round 15, VERDICT r14 item 7): ONE mapInPandas Arrow pass appends
    the deterministic merge-table token count (``llmdata/bpe.py`` —
    the way training corpora are actually measured), then the standard
    order-stable packing window cuts ~``budget``-token chunks.  Same
    cost shape as the whitespace-denominated path plus one narrow
    zero-shuffle Arrow pass; correctness is pinned by the bpe module's
    independent-reference differential tests plus a driver-side packing
    replay (tests/test_llmdata_bpe.py)."""
    from kafka_metrics_exporter_spark.llmdata.bpe import (
        with_bpe_token_count,
    )

    counted = with_bpe_token_count(
        df.select(id_col, part_col, text_col), text_col, "n_bpe_tokens"
    )
    return pack_chunks(
        counted, budget, token_col="n_bpe_tokens",
        part_col=part_col, id_col=id_col,
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training documents sharing any word ``n``-gram with a held-out
    benchmark corpus (the standard eval-leakage sweep; 8-13-gram overlap
    is the usual test).  The benchmark shingle set is tiny relative to
    the corpus — broadcast it, so the sweep is one scan of the corpus
    shingles with a map-side semi-join probe: no shuffle of the 100 TB
    side at all."""
    doc_sh = shingles(docs, text_col, id_col, n)
    bench_sh = shingles(benchmark, text_col, id_col, n).select("shingle").distinct()
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumn("is_contaminated", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("is_contaminated", F.lit(False)).alias("is_contaminated"),
        )
    )


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    num_bits: int = 1 << 23,
    num_probes: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """:func:`decontaminate` behind a BLOOM pre-filter — identical
    output (the exact verify removes every false positive), different
    scale shape: at 100 TB even the benchmark's distinct-shingle TABLE
    can be too big to ship as a broadcast hash join (a few hundred
    million 8-grams ≈ multi-GB hash relation per executor), while the
    same membership set fits a ~100 MB bitmap.  The corpus-side probe
    is FUSED into the Arrow shingling pass — each worker tests every
    gram against the broadcast bitmap with one vectorized numpy lookup
    and emits only bloom-positive (doc_id, gram) rows, so the 99%+
    negative grams never leave the scan: no join, no shuffle, no
    materialized corpus shingle table.  Survivors (a sliver) then pass
    the exact broadcast semi-join verify, which removes bloom false
    positives — the flags are exactly ``decontaminate``'s.

    Gram hashing is the engine's standard md5-low-8-bytes (DuckDB twin:
    ``md5_number_upper``); the k probe positions derive from the one
    64-bit hash by Kirsch-Mitzenmacher double hashing.
    """
    import numpy as np

    spark = docs.sparkSession
    m = int(num_bits)
    k = int(num_probes)
    if m < 64 or k < 1:
        raise ValueError("bloom_decontaminate: need num_bits >= 64, num_probes >= 1")
    n_words = m // 64 + 1
    # benchmark side: each partition builds its own bitmap over its
    # grams (bit-set is idempotent, so no distinct pass is needed) and
    # the driver ORs the per-partition bitmaps — the driver receives
    # numPartitions × m/8 bytes, NEVER the gram strings themselves
    # (collecting the distinct grams would ship the same multi-GB
    # relation the bloom exists to avoid)
    from kafka_metrics_exporter_spark.llmdata.dedup import _shingle_list

    shingle_of = _shingle_list

    def build(batches):
        import hashlib

        import pandas as pd

        bm = np.zeros(n_words, dtype=np.uint64)
        for pdf in batches:
            for _vid, text in zip(pdf[id_col], pdf[text_col]):
                gs = shingle_of(text, n)
                if not gs:
                    continue
                hs = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
                        for g in gs
                    ),
                    dtype="uint64",
                    count=len(gs),
                )
                lo = hs & np.uint64(0xFFFFFFFF)
                hi = hs >> np.uint64(32)
                for i in range(k):
                    pos = (lo + np.uint64(i) * hi) % np.uint64(m)
                    np.bitwise_or.at(
                        bm,
                        (pos >> np.uint64(6)).astype(np.int64),
                        np.uint64(1) << (pos & np.uint64(63)),
                    )
        yield pd.DataFrame({"bm": [bm.tobytes()]})

    parts = (
        benchmark.select(F.col(id_col), F.col(text_col))
        .mapInPandas(build, "bm binary")
        .collect()
    )
    bitmap = np.zeros(n_words, dtype=np.uint64)
    for r in parts:
        bitmap |= np.frombuffer(r["bm"], dtype=np.uint64)
    bc = spark.sparkContext.broadcast(bitmap)
    import hashlib

    def probe(batches):
        import pandas as pd

        bm = bc.value
        for pdf in batches:
            ids, out_grams = [], []
            for vid, text in zip(pdf[id_col], pdf[text_col]):
                gs = shingle_of(text, n)
                if not gs:
                    continue
                h = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
                        for g in gs
                    ),
                    dtype="uint64",
                    count=len(gs),
                )
                glo = h & np.uint64(0xFFFFFFFF)
                ghi = h >> np.uint64(32)
                hit = np.ones(len(gs), dtype=bool)
                for i in range(k):
                    pos = (glo + np.uint64(i) * ghi) % np.uint64(m)
                    word = bm[(pos >> np.uint64(6)).astype(np.int64)]
                    hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
                for j in np.flatnonzero(hit):
                    ids.append(vid)
                    out_grams.append(gs[j])
            yield pd.DataFrame({"doc_id": ids, "shingle": out_grams})

    par = spark.sparkContext.defaultParallelism
    candidates = (
        docs.repartition(par)
        .select(F.col(id_col), F.col(text_col))
        .mapInPandas(probe, f"doc_id {dict(docs.dtypes)[id_col]}, shingle string")
    )
    # exact verify: bloom false positives die here, so the flags are
    # bit-identical to the plain exact sweep.  The left side is the
    # bloom-positive SLIVER; no broadcast hint — AQE picks broadcast
    # when the benchmark shingle relation is small and a shuffle
    # semi-join when it is exactly the multi-GB case the bitmap exists
    # for (the sliver side shuffles cheaply either way).
    bench_sh = shingles(benchmark, text_col, id_col, n).select("shingle")
    hits = (
        candidates.join(bench_sh, "shingle", "left_semi")
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return (
        docs.select(F.col(id_col))
        .join(hits.withColumn("is_contaminated", F.lit(True)), id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("is_contaminated", F.lit(False)).alias("is_contaminated"),
        )
    )


def fuzzy_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """NEAR-duplicate eval-leakage sweep: flag training documents whose
    n-gram Jaccard against ANY benchmark document reaches ``threshold``
    — the fuzzy complement of :func:`decontaminate`, which only catches
    verbatim n-gram overlap and misses reformatted/partially-edited
    leaks (the standard recipe in LLM training reports: 13-gram exact
    sweep + MinHash near-dup sweep).

    Scale design: the benchmark side (eval sets — thousands of docs,
    not billions) is tiny, so its band-bucket table and shingle-hash
    sets are BROADCAST.  The training corpus is scanned ONCE through
    the fused Arrow shingle+minhash pass, probes the broadcast buckets
    map-side, and verifies candidates with an in-row
    ``array_intersect`` — the only shuffle of training-side data is the
    final per-doc max over the (tiny) verified-candidate set.  No
    self-join, no shuffle of the 100 TB side.

    Output: one row per training doc — (id, is_contaminated,
    max_jaccard, matched_bench) with NULL jaccard/match for clean docs;
    ties on jaccard resolve to the smallest benchmark id
    (deterministic under any partitioning).
    """
    from kafka_metrics_exporter_spark.llmdata.dedup import (
        band_hash_array,
        minhash_doc_table,
    )

    rows_per_band = num_hashes // bands
    bench_tbl = minhash_doc_table(benchmark, num_hashes, text_col, id_col, n)
    bench_buckets = bench_tbl.select(
        F.col("doc_id").alias("bench_id"),
        F.col("hs").alias("_bhs"),
        F.posexplode(band_hash_array(bands, rows_per_band)).alias(
            "band", "bucket"
        ),
    )
    train_tbl = minhash_doc_table(docs, num_hashes, text_col, id_col, n)
    train_buckets = train_tbl.select(
        "doc_id",
        "hs",
        F.posexplode(band_hash_array(bands, rows_per_band)).alias(
            "band", "bucket"
        ),
    )
    cand = train_buckets.join(
        F.broadcast(bench_buckets), ["band", "bucket"], "inner"
    )
    # a (doc, bench) pair colliding in k bands appears k times; verify
    # is recomputed per collision (bounded by `bands`) instead of
    # paying a dedup shuffle — the per-doc max collapses duplicates
    inter = F.size(F.array_intersect("hs", "_bhs")).cast("double")
    jac = inter / (
        F.size("hs") + F.size("_bhs") - F.size(F.array_intersect("hs", "_bhs"))
    ).cast("double")
    ver = (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_id", "bench_id", "jaccard")
    )
    # deterministic winner: max jaccard, ties broken by the SMALLEST
    # bench id — argmin over (-jaccard, bench_id) struct ordering, so
    # the tie-break works for any orderable id type (ADVICE r5: the
    # previous arithmetic bench-id negation failed analysis for
    # non-numeric id columns); jaccard itself is always a double
    best = ver.groupBy("doc_id").agg(
        F.max("jaccard").alias("max_jaccard"),
        F.min_by(
            "bench_id",
            F.struct(
                (-F.col("jaccard")).alias("nj"), F.col("bench_id").alias("b")
            ),
        ).alias("matched_bench"),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        # flagged docs are a sliver of the corpus (leaks are the
        # exception) — broadcast the verdicts so the final attach is
        # map-side too: the training side is never shuffled at all
        .join(F.broadcast(best), "doc_id", "left")
        .select(
            F.col("doc_id").alias(id_col),
            F.col("max_jaccard").isNotNull().alias("is_contaminated"),
            "max_jaccard",
            "matched_bench",
        )
    )


def sliding_chunks(
    df: DataFrame,
    window: int = 256,
    stride: int = 192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping token-window chunking — the context-window prep step
    for RAG indexes and long-document training (stride < window keeps
    boundary context in two chunks).  One row per (doc, chunk) with the
    token offset and length; the final partial window is kept when it
    adds ≥1 new token.

    Pure array expressions: the token count projects once, then
    ``sequence`` enumerates chunk starts — no explode of the tokens
    themselves, so the shuffle-free row expansion is #chunks, not
    #tokens."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda x: x != "")
    base = df.select(F.col(id_col), F.size(toks).alias("n_toks"))
    n_chunks = F.when(
        F.col("n_toks") <= window, F.lit(1)
    ).otherwise(
        F.ceil((F.col("n_toks") - F.lit(window)) / F.lit(stride)).cast("int") + 1
    )
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    return base.select(
        id_col,
        "n_toks",
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    ).select(
        id_col,
        "chunk_idx",
        "start_tok",
        F.least(F.lit(window), F.col("n_toks") - F.col("start_tok")).alias("chunk_toks"),
        "n_toks",
    )


def seeded_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 16,
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization
    (round 8): every row gets a ``shard`` (its output file) and ``pos``
    (its rank within the shard), both pure functions of (seed, id).

    Why not ``orderBy(rand(seed))``: a seeded rand() is a function of
    partition layout — two clusters (or one cluster before/after AQE
    coalescing) produce different orders from the same seed, so the
    "same" training run isn't.  A content-addressed residue gives the
    identical permutation on any cluster, any partitioning, any retry.

    Scale shape: the residue is a scan-local md5 projection; the ONLY
    shuffle is the window's hash partitioning on ``shard`` (n_shards
    groups, each ~rows/n_shards — the residue is uniform, so no skew),
    matching exactly the layout a sharded write wants: one sorted
    partition per output shard, zero extra exchanges.  Epoch N+1 is
    ``seed+1`` — a full reshuffle with zero state carried between
    epochs.
    """
    from kafka_metrics_exporter_spark.llmdata.similarity import md5_residue

    r = md5_residue(
        F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    out = df.withColumn("__r", r).withColumn(
        "shard", (F.col("__r") % n_shards).cast("int")
    )
    if n_partitions is not None:
        # pre-partition on shard BEFORE the rank window: the window's
        # required ClusteredDistribution(shard) is then already
        # satisfied, so the rank reuses this one exchange instead of
        # adding its own — write_training_shards passes n_shards here
        # so its whole plan really is ONE exchange (code-review r9:
        # the old repartition AFTER the window paid a second
        # full-data shuffle, doubling shuffle I/O at scale)
        out = out.repartition(n_partitions, F.col("shard"))
    w = Window.partitionBy("shard").orderBy(F.col("__r").asc(), F.col(id_col).asc())
    return out.withColumn("pos", F.row_number().over(w)).drop("__r")


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 16,
    format: str = "json",
) -> None:
    """Materialize :func:`seeded_shuffle` as training-ready shard files:
    ``path/shard=K/`` holds shard K's rows in shuffle order.

    One exchange end-to-end: ``repartition(n_shards, shard)`` feeds the
    same hash partitioning the rank window needs AND the partitionBy
    writer — each task sorts its own shard locally (``sortWithinPartitions``
    re-uses the window's sort, no second exchange) and writes exactly
    one file per shard directory.  A trainer streams ``shard=K``
    sequentially and gets the deterministic (seed, id) order back.
    """
    out = seeded_shuffle(
        df, id_col=id_col, seed=seed, n_shards=n_shards,
        n_partitions=n_shards,
    )
    (
        out.sortWithinPartitions("shard", "pos")
        .write.partitionBy("shard")
        .mode("overwrite")
        .format(format)
        .save(path)
    )


def _gram_list(text: Column) -> Column:
    """Lowercased unigrams + space-joined bigrams — the hashed feature
    space of DSIR (Xie et al. 2023, "Data Selection for Language Models
    via Importance Resampling"); the paper uses hashed uni+bigrams."""
    from kafka_metrics_exporter_spark.llmdata.text import ws_tokens

    toks = F.transform(ws_tokens(text), F.lower)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), n1),
        F.slice(toks, F.lit(2), n1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.concat(toks, bigrams)


def _gram_bucket(gram: Column, n_buckets: int) -> Column:
    """md5-derived feature bucket, reproducible in DuckDB as
    ``('0x' || substr(md5(gram), 1, 15))::BIGINT % n_buckets``."""
    return (F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long") % n_buckets)


def dsir_importance(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): score every raw
    document by how much more likely its hashed n-gram features are
    under a small high-quality TARGET corpus than under the raw corpus
    itself, then draw ``k`` documents via deterministic Gumbel-top-k —
    sampling proportional to the importance weight without ever
    materializing a global sample.

    Per feature bucket ``b`` (md5(gram) % n_buckets):
      ``lp(b) = ln((c[b] + 1) / (T + n_buckets))``  (add-one smoothing)
    Per document: ``score = Σ_b n_b · (lp_target(b) − lp_source(b))``,
    i.e. the log importance weight of the doc's gram multiset.

    Determinism across engines: the per-bucket terms are each ONE
    IEEE expression, and the per-doc sum folds the terms in bucket
    order (``array_sort`` + ``aggregate`` here ≡ ``list_sort`` +
    ``list_reduce`` in the DuckDB twin), so the doubles are
    bit-identical — float Σ is order-sensitive, an unordered SUM()
    diverges between engines.  The Gumbel key derives its uniform from
    the doc id's md5 (content-addressed like every sampler in this
    module), never rand().

    Scale shape: one gram-keyed explode feeding two hash aggregations
    (per-doc-bucket counts, per-bucket corpus counts); the bucket
    table is ``n_buckets`` rows → broadcast join; totals are 1-row
    broadcasts.  The only non-broadcast shuffle carries (doc, bucket)
    pairs — bounded by n_buckets per doc, uniform keys.  No Python.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_gram_list(F.col(text_col))).alias("gram"),
    ).withColumn("b", _gram_bucket(F.col("gram"), n_buckets))
    tgrams = target.select(
        F.explode(_gram_list(F.col(text_col))).alias("gram")
    ).withColumn("b", _gram_bucket(F.col("gram"), n_buckets))

    # ONE explode+md5 pass over the corpus: the per-(doc, bucket)
    # aggregation both feeds the per-doc scoring AND rolls up into the
    # per-bucket corpus counts (Σ_doc n = c_s) — re-deriving c_s from
    # the raw grams would scan and hash the whole corpus a second time
    # (measured ~2× on the sf0.1 bench).
    # persisted: two consumers (the bucket-count rollup builds its own
    # broadcast job, then the scoring join re-reads it) would otherwise
    # each re-run the explode; bench.py clears the cache between suite
    # queries, the established pattern for shared dedup intermediates
    doc_bucket = (
        grams.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("n")).persist()
    )
    # the two count tables are ≤ n_buckets rows each but BOTH have two
    # consumers (the per-bucket likelihood join and the 1-row total) —
    # unpersisted, the target explode+aggregate scanned the target
    # corpus TWICE and src_counts re-aggregated the cached (doc, b)
    # relation twice (optimization r17, plan read: two `Scan parquet`
    # leaves for the target subtree; guide §5).  Bucket-table-sized
    # cache, never doc-scale.
    src_counts = doc_bucket.groupBy("b").agg(F.sum("n").alias("c_s")).persist()
    tgt_counts = tgrams.groupBy("b").agg(F.count(F.lit(1)).alias("c_t")).persist()
    totals = (
        src_counts.agg(F.sum("c_s").alias("t_s"))
        .crossJoin(tgt_counts.agg(F.sum("c_t").alias("t_t")))
    )
    buckets = (
        src_counts.join(tgt_counts, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double")
                    / (F.col("t_t") + n_buckets).cast("double")
                )
                - F.log(
                    (F.col("c_s") + 1).cast("double")
                    / (F.col("t_s") + n_buckets).cast("double")
                )
            ).alias("lr"),
        )
    )

    per_doc_bucket = doc_bucket.join(F.broadcast(buckets), "b").select(
        "doc_id",
        "b",
        (F.col("n").cast("double") * F.col("lr")).alias("term"),
        "n",
    )
    folded = per_doc_bucket.groupBy("doc_id").agg(
        F.sum("n").alias("n_grams"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("b", "term"))),
                lambda x: x["term"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("raw_score"),
    )
    # Gumbel-top-k: key = log-weight + Gumbel(0,1); uniform from the
    # 52-bit md5 residue of the doc id, shifted into (0, 1) open.
    u = (
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
         .cast("double") + 1.0)
        / float((1 << 52) + 2)
    )
    keyed = folded.select(
        "doc_id",
        "n_grams",
        F.round("raw_score", 6).alias("score"),
        F.round(F.col("raw_score") - F.log(-F.log(u)), 6).alias("sample_key"),
    )
    # TakeOrdered (sort + limit fuses driver-side over per-partition
    # top-k) bounds the relation to k rows BEFORE ranking, so the
    # unpartitioned row_number window sorts k rows, never the corpus.
    topk = keyed.orderBy(F.col("sample_key").desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "n_grams", "score", "sample_key", "rank"
    )


def dsir_importance_sql(
    n_buckets: int = 4096,
    k: int = 50,
    target_pred: str = "source = 'src0'",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`dsir_importance`, generated from the same
    spec so tokenization, smoothing arithmetic, fold order, rounding,
    and tie-breaks match operation for operation."""
    grams = f"""
      SELECT doc_id, source, unnest(list_concat(ws,
               list_transform(range(1, len(ws)),
                              i -> ws[i] || ' ' || ws[i + 1]))) AS gram
      FROM (SELECT doc_id, source,
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '') AS ws
            FROM {table})
    """
    return f"""
    WITH g AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(gram), 1, 15))::BIGINT % {n_buckets} AS b
      FROM ({grams})
    ),
    sc AS (SELECT b, COUNT(*) AS c_s FROM g WHERE NOT ({target_pred}) GROUP BY b),
    tc AS (SELECT b, COUNT(*) AS c_t FROM g WHERE {target_pred} GROUP BY b),
    tot AS (SELECT (SELECT SUM(c_s) FROM sc) AS t_s,
                   (SELECT SUM(c_t) FROM tc) AS t_t),
    lr AS (
      SELECT sc.b,
             ln(CAST(COALESCE(tc.c_t, 0) + 1 AS DOUBLE)
                / CAST(t_t + {n_buckets} AS DOUBLE))
             - ln(CAST(sc.c_s + 1 AS DOUBLE)
                  / CAST(t_s + {n_buckets} AS DOUBLE)) AS lr
      FROM sc LEFT JOIN tc USING (b), tot
    ),
    db AS (
      SELECT doc_id, b, COUNT(*) AS n FROM g WHERE NOT ({target_pred})
      GROUP BY doc_id, b
    ),
    folded AS (
      SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_grams,
             -- list_prepend(0.0) makes the left fold start 0.0 + t1,
             -- matching Spark's F.aggregate zero exactly (0.0 + x ≡ x
             -- in IEEE, but the fold ORDER is load-bearing)
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(
                   list_sort(list((b, CAST(n AS DOUBLE) * lr))),
                   x -> CAST(x[2] AS DOUBLE))),
               (acc, x) -> acc + x) AS raw_score
      FROM db JOIN lr USING (b) GROUP BY doc_id
    ),
    keyed AS (
      SELECT doc_id, n_grams, round(raw_score, 6) AS score,
             round(raw_score - ln(-ln(
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                     AS BIGINT) + 1.0) / {float((1 << 52) + 2)!r})), 6)
               AS sample_key
      FROM folded
    )
    SELECT doc_id, n_grams, score, sample_key,
           CAST(row_number() OVER (ORDER BY sample_key DESC, doc_id ASC)
                AS INT) AS rank
    FROM keyed
    QUALIFY rank <= {k}
    """


def domain_mix(
    docs: DataFrame,
    budgets: dict[str, int],
    domain_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
    n_shards: int = 1024,
) -> DataFrame:
    """Token-budget corpus mixing: per domain, take documents in the
    content-addressed shuffle order until the domain's token budget is
    reached — the "data mixing" step that turns per-domain sampling
    weights into an actual training corpus.  A document is kept while
    the running token total BEFORE it is under budget, so the first
    document to cross the line is included (budgets are met, never
    starved by one long doc).  Domains without a budget entry are
    excluded.

    Selection is a pure function of (seed, id) — the same
    content-addressing contract as every sampler in this module — so
    growing the corpus never reshuffles which documents an existing
    budget selects until the budget line itself moves.

    Scale shape: the naive form is a running-sum window over EACH
    WHOLE DOMAIN — one reducer per domain, useless at 100 TB with a
    handful of domains.  Instead the shuffle order is sharded
    (``md5(seed, id) % n_shards``): within-(domain, shard) running
    sums distribute across n_shards× domain tasks, and each shard's
    global offset comes from a (domains × n_shards)-row total frame —
    catalog-sized, windowed and broadcast back.  Global running sum =
    shard offset + within-shard running sum, exactly, because the
    global order IS (shard, residue, id)."""
    from kafka_metrics_exporter_spark.llmdata.similarity import md5_residue
    from kafka_metrics_exporter_spark.llmdata.text import token_counts

    if not budgets:
        raise ValueError("domain_mix: budgets must name at least one domain")
    r = md5_residue(
        F.concat_ws("\x1f", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    budget_expr = None
    for dom, b in budgets.items():
        cond = F.col(domain_col) == dom
        budget_expr = (
            F.when(cond, int(b))
            if budget_expr is None
            else budget_expr.when(cond, int(b))
        )
    # NARROW projection (id/domain/residue/tokens/budget — the text
    # never survives the select) persisted once: the running-sum window
    # and the shard-totals rollup are two consumers, and an unpersisted
    # lineage would re-scan and re-tokenize the corpus for each
    # (code-review r9; same two-consumer rationale as dsir_importance's
    # doc_bucket persist — bench.py clears the cache between queries)
    base = (
        docs.withColumn("__budget", budget_expr)
        .filter(F.col("__budget").isNotNull())
        .select(
            F.col(id_col),
            F.col(domain_col),
            r.alias("__r"),
            (r % n_shards).cast("int").alias("__shard"),
            token_counts(F.col(text_col))["n_ws_tokens"].alias("__n_tokens"),
            F.col("__budget"),
        )
        .persist()
    )
    w_in = Window.partitionBy(domain_col, "__shard").orderBy(
        F.col("__r").asc(), F.col(id_col).asc()
    )
    within = base.withColumn(
        "__cum_in",
        F.sum("__n_tokens").over(
            w_in.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    shard_totals = base.groupBy(domain_col, "__shard").agg(
        F.sum("__n_tokens").alias("__shard_sum")
    )
    w_sh = Window.partitionBy(domain_col).orderBy(F.col("__shard").asc())
    offsets = shard_totals.withColumn(
        "__offset",
        F.coalesce(
            F.sum("__shard_sum").over(
                w_sh.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select(domain_col, "__shard", "__offset")
    joined = within.join(F.broadcast(offsets), [domain_col, "__shard"])
    out = joined.withColumn(
        "cum_tokens", F.col("__offset") + F.col("__cum_in")
    ).filter(
        F.col("cum_tokens") - F.col("__n_tokens") < F.col("__budget")
    )
    return out.select(
        F.col(id_col),
        F.col(domain_col),
        F.col("__n_tokens").alias("n_tokens"),
        F.col("cum_tokens"),
    )
