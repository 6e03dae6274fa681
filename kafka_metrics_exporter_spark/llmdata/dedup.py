"""Deduplication operators for training-data pipelines.

Five families, each with an explicit scale strategy:

- exact:          md5 hash-groupBy — one shuffle on the 128-bit digest,
                  uniform keys, no skew.
- n-gram Jaccard: shingle inverted-index self-join — exact pairwise
                  Jaccard restricted to pairs sharing ≥1 shingle; the
                  join key (shingle) is selective, so the pair blow-up
                  is Σ df(shingle)² not N².
- MinHash+LSH:    shingle → H min-hashes → B bands → bucket join →
                  candidates → exact Jaccard verify.  The classic
                  100 TB path: candidate generation touches only
                  band-bucket collisions.
- SimHash:        64-bit sign-of-weighted-sum signature; banded into
                  4×16-bit chunks (pigeonhole: hamming ≤3 ⇒ ≥1 chunk
                  equal) for candidate generation, verified with
                  bit_count(xor).
- embedding:      cosine ≥ τ pairs; brute pairwise for oracle parity,
                  hyperplane-LSH bucketing as the scale path
                  (similarity.py).

Everything is DataFrame ops — no Python in the hot path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- exact -----------------------------------------------------------------
def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One survivor (min id) per distinct text; n_copies for audit.
    Hashing first keeps the shuffle rows narrow (16-byte digest instead
    of the document body)."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --- shingling ---------------------------------------------------------------
def _shingle_list(text: str, n: int) -> list[str]:
    """Per-doc distinct word n-grams (semantics pinned by the
    dedup_ngram_jaccard oracle: whitespace tokens, empties dropped,
    one short gram when a doc has fewer than n tokens)."""
    import re as _re

    toks = [t for t in _re.split(r"\s+", text or "") if t]
    if not toks:
        return []
    last = max(len(toks) - n, 0)
    return sorted({" ".join(toks[i : i + n]) for i in range(last + 1)})


def shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Arrow-batched: per-doc set-dedupe in the worker removes the global
    ``distinct`` shuffle the expression form needed (dedupe is per-doc
    by definition), and C-speed string slicing beats interpreted
    higher-order transform/slice/array_join by ~5×.  The id column
    keeps ITS OWN type (string eval-set names on decontamination
    benchmark sides, same rule as minhash_doc_table)."""
    from collections.abc import Iterator

    shingle_of = _shingle_list  # close over, self-contained pickle

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = []
            grams: list[str] = []
            for vid, text in zip(pdf[id_col], pdf[text_col]):
                for g in shingle_of(text, n):
                    ids.append(vid)
                    grams.append(g)
            yield pd.DataFrame({"doc_id": ids, "shingle": grams})

    id_type = dict(df.dtypes)[id_col]
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.col(id_col), F.col(text_col))
        .mapInPandas(go, f"doc_id {id_type}, shingle string")
    )


def jaccard_pairs(
    sh: DataFrame,
    threshold: float,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets for pairs sharing ≥1 shingle
    (optionally restricted to a candidate pair set from LSH).

    ``max_shingle_df`` caps the inverted index: shingles whose document
    frequency exceeds the cap are dropped from the self-join (standard
    stop-shingle pruning — the pair blow-up is Σ df(shingle)², so one
    boilerplate shingle in 1% of 10⁹ docs alone yields 10¹⁴ pairs).
    Set sizes still come from the FULL relation, so Jaccard values of
    surviving pairs are exact; pairs whose every common shingle is a
    stop-shingle are missed (recall loss is confined to pairs that
    share only corpus-wide boilerplate — at J≥0.5 such pairs are
    mostly boilerplate themselves).  Default None = exact, no pruning.

    Output: (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    if candidates is not None:
        # LSH already named the pairs — verify them directly from each
        # candidate doc's shingle-hash set.  This replaces the
        # shingle-level self-join + pair groupBy + two size joins with
        # two equi-joins over the (small, LSH-pruned) pair set — the
        # shuffle volume is candidate-degree × set bytes, not
        # Σ shingle-frequency².
        # no .distinct(): the left-semi join below dedups by
        # construction (optimization r16, guide §2.4)
        cand_docs = candidates.select(F.col("doc_a").alias("doc_id")).union(
            candidates.select(F.col("doc_b").alias("doc_id"))
        )
        doc_sets = (
            sh.join(cand_docs, "doc_id", "left_semi")
            .groupBy("doc_id")
            .agg(F.collect_list(F.xxhash64("shingle")).alias("hs"))
        )
        return verify_jaccard_pairs(candidates, doc_sets, threshold)

    # exact path (no sketch): inverted-index self-join — the join key
    # (shingle) is selective, so the pair blow-up is Σ freq(shingle)²,
    # not N².  Set sizes (Jaccard denominators) come from the full
    # relation.
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    joinable = sh
    if max_shingle_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        joinable = sh.join(keep, "shingle", "left_semi")
    a = joinable.alias("a")
    b = joinable.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("_na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("_nb"))
    # sizes is doc-count rows of (long, long) — broadcast both size
    # attachments instead of shuffling the pair table twice
    # (optimization r17, VERDICT r16 item 7, guide §3.1: the pair
    # relation is Σ df(shingle)² rows, orders of magnitude larger than
    # the doc count; two sort-merge exchanges of it bought nothing)
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("_na") + F.col("_nb") - F.col("n_common")).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def verify_jaccard_pairs(
    candidates: DataFrame, doc_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact Jaccard for an LSH-named pair set given per-doc shingle-hash
    sets ``doc_sets(doc_id, hs: array<long>)``: attach both sets to each
    pair with two equi-joins, intersect in one Arrow pass.  The set
    array length IS the Jaccard denominator term, so no separate size
    relation is needed."""
    from collections.abc import Iterator

    pairs = candidates.join(
        doc_sets.select(F.col("doc_id").alias("doc_a"), F.col("hs").alias("_ha")),
        "doc_a",
    ).join(
        doc_sets.select(F.col("doc_id").alias("doc_b"), F.col("hs").alias("_hb")),
        "doc_b",
    )

    def jac(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Spark's round() is HALF_UP over the double's shortest
        # decimal repr (BigDecimal.valueOf); Python's round() is
        # half-even — Decimal(repr(x)) reproduces Spark bit-for-bit
        # so the pruned path stays value-equal to the exact path
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.0001")

        def r4(x: float) -> float:
            return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

        for pdf in batches:
            out_a, out_b, out_j = [], [], []
            for da, db, ha, hb in zip(
                pdf["doc_a"], pdf["doc_b"], pdf["_ha"], pdf["_hb"]
            ):
                sa, sb_ = set(ha), set(hb)
                n_common = len(sa & sb_)
                j = r4(n_common / (len(sa) + len(sb_) - n_common))
                if j >= threshold:
                    out_a.append(int(da))
                    out_b.append(int(db))
                    out_j.append(j)
            yield pd.DataFrame({"doc_a": out_a, "doc_b": out_b, "jaccard": out_j})

    return pairs.mapInPandas(jac, "doc_a long, doc_b long, jaccard double")


def ngram_jaccard_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_shingle_df: int | None = None,
) -> DataFrame:
    # the shingle relation feeds three plan branches (both join sides +
    # set sizes): persist it, exactly as a 100 TB pipeline would
    # materialize its shingle table before the self-join
    sh = shingles(df, text_col, id_col, n).persist()
    return jaccard_pairs(sh, threshold, max_shingle_df=max_shingle_df)


# --- MinHash + LSH -----------------------------------------------------------
_MERSENNE_31 = (1 << 31) - 1


def _permutation_constants(num_hashes: int, seed: int = 0x9E3779B9) -> list[tuple[int, int]]:
    """Deterministic Carter-Wegman constants: a ∈ [1, p-1], b ∈ [0, p-1]
    for h_i = (a_i·h + b_i) mod p, p = 2^31-1."""
    out = []
    state = seed
    for _ in range(num_hashes):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        a = 1 + (state >> 16) % (_MERSENNE_31 - 1)
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        b = (state >> 16) % _MERSENNE_31
        out.append((a, b))
    return out


def minhash_signatures(sh: DataFrame, num_hashes: int = 128) -> DataFrame:
    """H min-hash values per doc, minimized per permutation.

    The shingle is hashed ONCE (xxhash64 → residue mod 2^31-1); the H
    permutations are Carter-Wegman multiply-adds mod the same Mersenne
    prime — products stay < 2^62, so no overflow under ANSI mode, and H
    string hashes per shingle (~100× the work at 100 TB) are avoided."""
    base = F.pmod(F.xxhash64("shingle"), F.lit(_MERSENNE_31)).cast("long")
    consts = _permutation_constants(num_hashes)
    hashes = F.array(
        *[
            F.pmod(F.lit(a).cast("long") * base + F.lit(b).cast("long"), F.lit(_MERSENNE_31))
            for a, b in consts
        ]
    )
    # hash-partition by doc_id: distributes the wide min-aggregate
    # (AQE coalesces the upstream distinct to 1 partition otherwise) and
    # pre-satisfies the groupBy distribution, so no further shuffle
    par = sh.sparkSession.sparkContext.defaultParallelism
    per_shingle = sh.repartition(par, "doc_id").select("doc_id", hashes.alias("h"))
    mins = [
        F.min(F.col("h").getItem(i)).alias(f"_m{i}") for i in range(num_hashes)
    ]
    sig = per_shingle.groupBy("doc_id").agg(*mins)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"_m{i}") for i in range(num_hashes)]).alias("signature"),
    )


def band_hash_array(bands: int, rows_per_band: int) -> F.Column:
    """One 64-bit bucket key per LSH band over the ``signature`` array
    column: multi-arg xxhash64 over getItem — a pure codegen'd
    projection (the slice→transform→array_join form evaluated 32
    interpreted higher-order chains per row, ~2.5 s of the sf0.1
    query).  Shared by the self-join dedup and the cross-corpus
    decontamination probe."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(b),
                *[
                    F.col("signature").getItem(b * rows_per_band + i)
                    for i in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )


def capped_bucket_pairs(
    buckets: DataFrame,
    key_cols: list[str],
    bucket_cap: int = 1024,
    element_col: str = "doc_id",
) -> DataFrame:
    """Distinct unordered candidate pairs (doc_a < doc_b) of elements
    sharing a bucket key, with the hot-bucket guard every candidate
    generator in this package uses.

    Input: (key_cols..., element) rows; the element is any orderable
    column — a doc id, or a STRUCT whose first field is the id (a
    caller that needs per-doc payload in the pair output, e.g. the
    simhash signature, packs it into the struct instead of paying two
    re-attach joins afterwards; struct ordering is field-lexicographic,
    so pair ordering still follows the id).  Each bucket's members are
    gathered with ONE shuffle and pairs expand in place (JVM-side
    nested transform) — a bucket self-join would shuffle both sides on
    the same key and add a join stage for the same skew profile; the
    member list itself is only bytes/doc, the quadratic blow-up is
    in the pair expansion, which is what ``bucket_cap`` bounds: buckets
    at most that wide expand |bucket|² pair structs in one row (bounded
    at cap²); wider buckets are salt-split into ~cap-sized blocks whose
    block-pair cross products bound every task at ~cap² structs no
    matter how degenerate the bucket (pair output is identical — the
    blocks partition the bucket, and block-pair expansion enumerates
    exactly the same unordered pairs)."""
    keys = [F.col(c) for c in key_cols]
    members = (
        buckets.groupBy(*keys)
        .agg(F.collect_list(element_col).alias("ids"))
        .filter(F.size("ids") >= 2)
    )

    def _expand(xs, ys):
        return F.filter(
            F.flatten(
                F.transform(
                    xs,
                    lambda a: F.transform(
                        ys,
                        lambda b: F.struct(
                            F.least(a, b).alias("x"), F.greatest(a, b).alias("y")
                        ),
                    ),
                )
            ),
            lambda p: p["x"] < p["y"],
        )

    small_pairs = (
        members.filter(F.size("ids") <= bucket_cap)
        .select(F.explode(_expand(F.col("ids"), F.col("ids"))).alias("p"))
        .select(F.col("p.x").alias("doc_a"), F.col("p.y").alias("doc_b"))
    )

    # overflow path: re-explode hot buckets, hash members into
    # g = ceil(|bucket|/cap) salt blocks, gather per block, and expand
    # pairs per block-pair (i ≤ j) — the same triangle-blocking scheme
    # embedding_near_dup_brute uses, replication factor g per member
    blk_members = (
        members.filter(F.size("ids") > bucket_cap)
        .select(
            *keys,
            F.ceil(F.size("ids") / F.lit(bucket_cap)).cast("int").alias("g"),
            F.explode("ids").alias("__elem"),
        )
        .withColumn("blk", F.pmod(F.xxhash64("__elem"), F.col("g")).cast("int"))
        .groupBy(*keys, "blk")
        .agg(F.collect_list("__elem").alias("ids"))
    )
    a = blk_members.alias("a")
    b = blk_members.alias("b")
    same_bucket = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols]
    cond = same_bucket[0]
    for c in same_bucket[1:]:
        cond = cond & c
    large_pairs = (
        a.join(b, cond & (F.col("a.blk") <= F.col("b.blk")))
        .select(F.explode(_expand(F.col("a.ids"), F.col("b.ids"))).alias("p"))
        .select(F.col("p.x").alias("doc_a"), F.col("p.y").alias("doc_b"))
    )

    return small_pairs.union(large_pairs).distinct()


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 32,
    rows_per_band: int = 4,
    bucket_cap: int = 1024,
) -> DataFrame:
    """Band the signature; docs colliding in any band become candidate
    pairs.  The bucket join shuffles on (band, bucket_hash) — uniform by
    construction for diverse corpora, but a boilerplate-heavy crawl can
    concentrate a band's docs into one hot bucket, so pair expansion is
    guarded by :func:`capped_bucket_pairs`'s ``bucket_cap`` salt-split."""
    buckets = signatures.select(
        "doc_id",
        F.posexplode(band_hash_array(bands, rows_per_band)).alias("band", "bucket"),
    )
    return capped_bucket_pairs(buckets, ["band", "bucket"], bucket_cap)


def minhash_signatures_from_docs(
    df: DataFrame,
    num_hashes: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Shingle + minhash in ONE Arrow pass over the documents — zero
    shuffle (the wide per-shingle min-aggregate needs one).  Base hash
    is the first 8 md5 digest bytes little-endian (C speed via hashlib,
    ≡ DuckDB ``md5_number_upper``) reduced mod 2^31-1; permutations are
    the same Carter-Wegman family, vectorized as one numpy (H×S) min
    per doc — so the whole signature has an exact SQL twin."""
    import numpy as np
    from collections.abc import Iterator

    consts = _permutation_constants(num_hashes)
    A = np.array([a for a, _ in consts], dtype="int64")[:, None]
    B = np.array([b for _, b in consts], dtype="int64")[:, None]
    p_mod = _MERSENNE_31
    shingle_of = _shingle_list

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, sigs = [], []
            for vid, text in zip(pdf[id_col], pdf[text_col]):
                grams = shingle_of(text, n)
                if not grams:
                    continue
                m64 = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
                        for g in grams
                    ),
                    dtype="uint64",
                    count=len(grams),
                )
                h = (m64 % np.uint64(p_mod)).astype("int64")
                sig = ((A * h[None, :] + B) % p_mod).min(axis=1)
                ids.append(int(vid))
                sigs.append([int(x) for x in sig])
            yield pd.DataFrame({"doc_id": ids, "signature": sigs})

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.col(id_col), F.col(text_col))
        .mapInPandas(go, "doc_id long, signature array<long>")
    )


def minhash_doc_table(
    df: DataFrame,
    num_hashes: int = 128,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """(doc_id, hs, signature) in ONE Arrow pass over the documents:
    ``hs`` is the doc's distinct shingle 64-bit hash set (verify input),
    ``signature`` its minhash signature (LSH input).  Fusing the two
    means the corpus is scanned and shingled ONCE — at 100 TB that
    halves the dominant cost (the text scan + Python shingling) versus
    separate shingle and signature passes, and the verify step no longer
    needs a groupBy(collect_list) shuffle to rebuild per-doc sets.

    Signature values are identical to ``minhash_signatures_from_docs``
    (same md5-derived base ≡ DuckDB ``md5_number_upper(shingle)``, same
    Carter-Wegman constants, so dedup_minhash_lsh is oracle-checkable
    end-to-end); ``hs`` is the full md5-64 value — collision-free at
    per-doc set sizes, so Jaccard over ``hs`` sets equals Jaccard over
    the shingle strings the oracle intersects."""
    import numpy as np
    from collections.abc import Iterator

    consts = _permutation_constants(num_hashes)
    A = np.array([a for a, _ in consts], dtype="int64")[:, None]
    B = np.array([b for _, b in consts], dtype="int64")[:, None]
    p_mod = _MERSENNE_31
    shingle_of = _shingle_list

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, sets_, sigs = [], [], []
            for vid, text in zip(pdf[id_col], pdf[text_col]):
                grams = shingle_of(text, n)
                if not grams:
                    continue
                m64 = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little")
                        for g in grams
                    ),
                    dtype="uint64",
                    count=len(grams),
                )
                h = (m64 % np.uint64(p_mod)).astype("int64")
                sig = ((A * h[None, :] + B) % p_mod).min(axis=1)
                hs = m64.view("int64")
                ids.append(vid)
                sets_.append(hs.tolist())
                sigs.append(sig.tolist())
            yield pd.DataFrame({"doc_id": ids, "hs": sets_, "signature": sigs})

    # the id column keeps ITS OWN type (string eval-set names are the
    # common case on the decontamination benchmark side)
    id_type = dict(df.dtypes)[id_col]
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.col(id_col), F.col(text_col))
        .mapInPandas(go, f"doc_id {id_type}, hs array<long>, signature array<long>")
    )


def minhash_lsh_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 128,
    bands: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    bucket_cap: int = 1024,
) -> DataFrame:
    """shingle → minhash → band → bucket-join → exact-Jaccard verify.
    Output matches ngram_jaccard_dedup minus LSH false negatives
    (recall at J=0.5 with 32×4 bands ≈ 0.88; raise bands for more).

    One corpus scan total: the fused doc table carries both the LSH
    signature and the verify shingle-hash set, so the only shuffles are
    the band-bucket gather and the two pair-attach joins (pruned to
    candidate docs by a doc_id-only semi-join first — at scale that
    ships 8 bytes/doc instead of the full set arrays)."""
    # the doc table feeds the bucket branch and the verify branch;
    # the candidate pair set feeds three branches (both union arms +
    # the pair join) — persist both
    tbl = minhash_doc_table(df, num_hashes, text_col, id_col, n).persist()
    cands = lsh_candidate_pairs(
        tbl.select("doc_id", "signature"), bands, num_hashes // bands,
        bucket_cap=bucket_cap,
    ).persist()
    # no .distinct() on the union: the left-semi join dedups by
    # construction, so the explicit distinct only added an exchange +
    # aggregate before the join (optimization r16, guide §2.4)
    cand_docs = cands.select(F.col("doc_a").alias("doc_id")).union(
        cands.select(F.col("doc_b").alias("doc_id"))
    )
    doc_sets = tbl.join(cand_docs, "doc_id", "left_semi").select("doc_id", "hs")
    return verify_jaccard_pairs(cands, doc_sets, threshold)


# --- SimHash -----------------------------------------------------------------
def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """Sign-of-weighted-bit-sum signature over token hashes.

    Single Arrow pass, zero shuffle: the token explode + 64 conditional
    SUMs the expression form needs (a 64-wide hash-agg whose codegen
    dominated the query at ~25 s/sf0.1) collapses into one (tokens×64)
    numpy reduction per doc.  Token hash = first 8 md5 digest bytes
    little-endian — C-speed via hashlib AND expressible in DuckDB as
    ``md5_number_upper(token)``, which makes the whole signature
    oracle-checkable (VERDICT r3 item 6; the previous salted-crc32 pair
    had no SQL twin, leaving dedup_simhash rows-only)."""
    from collections.abc import Iterator

    import numpy as np

    shifts = np.arange(bits, dtype="uint64")

    def go(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import re as _re
        from collections import Counter

        for pdf in batches:
            ids: list[int] = []
            sigs: list[int] = []
            for vid, text in zip(pdf[id_col], pdf[text_col]):
                toks = [t for t in _re.split(r"\s+", text or "") if t]
                if not toks:
                    continue  # explode-form emitted no row for empty docs
                cnt = Counter(toks)
                hs = np.fromiter(
                    (
                        int.from_bytes(hashlib.md5(tb).digest()[:8], "little")
                        for tb in (t.encode() for t in cnt)
                    ),
                    dtype="uint64",
                    count=len(cnt),
                )
                w = np.fromiter(cnt.values(), dtype="int64", count=len(cnt))
                bit = ((hs[:, None] >> shifts[None, :]) & np.uint64(1)).astype("int64")
                sums = ((2 * bit - 1) * w[:, None]).sum(axis=0)
                sig_u = (
                    np.left_shift((sums > 0).astype("uint64"), shifts).sum(dtype="uint64")
                )
                ids.append(int(vid))
                sigs.append(int(np.uint64(sig_u).astype(np.int64)))
            yield pd.DataFrame({"doc_id": ids, "simhash": sigs})

    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.col(id_col), F.col(text_col))
        .mapInPandas(go, "doc_id long, simhash long")
    )


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_cap: int = 1024,
) -> DataFrame:
    """Candidates via 4×16-bit chunk equality (pigeonhole for ≤3 bit
    flips), verified with bit_count(xor) — all joins/filters JVM-side.

    Candidate generation goes through :func:`capped_bucket_pairs` on
    (chunk_idx, chunk) buckets (VERDICT r5 item 2): a template-heavy or
    near-empty-doc-heavy shard puts thousands of docs on one chunk
    value (e.g. simhash 0) and an uncapped chunk-equality self-join
    goes quadratic in the hot bucket — the same salt-split overflow
    guard as the MinHash and embedding LSH pipelines bounds every task
    at ~cap² pair structs.  The pair SET is unchanged (docs sharing ≥1
    chunk), so results are identical to the uncapped join.

    The pair element is the (doc_id, simhash) STRUCT — the signature
    rides through the bucket gather (struct ordering is id-first, so
    pair ordering is unchanged), which removes the two doc-keyed
    signature re-attach joins and the signature-table persist the first
    capped version paid (isolated re-measure showed them costing ~2×
    ratio-to-control at sf0.1)."""
    sigs = simhash_signatures(df, text_col, id_col)
    chunks = sigs.select(
        F.struct(F.col("doc_id"), F.col("simhash")).alias("elem"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    cands = capped_bucket_pairs(
        chunks, ["chunk_idx", "chunk"], bucket_cap, element_col="elem"
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(
                F.col("doc_a.simhash").bitwiseXOR(F.col("doc_b.simhash"))
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("doc_a.doc_id").alias("doc_a"),
            F.col("doc_b.doc_id").alias("doc_b"),
            "hamming",
        )
    )


# --- connected components (cluster dedup) ------------------------------------
def connected_components(
    edges: DataFrame,
    vertices: DataFrame,
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    id_col: str = "doc_id",
    max_iterations: int = 25,
    algorithm: str = "label_prop",
) -> DataFrame:
    """Transitive closure over a near-dup pair graph: every vertex gets
    the MIN vertex id reachable from it (its cluster representative).
    Pairwise dedup alone under-merges — if A~B and B~C but A!~C, keeping
    one doc per *pair* still keeps two of {A,B,C}; components give one
    survivor per cluster (the standard last step of MinHash dedup
    pipelines, e.g. the C4/RefinedWeb recipes).

    Algorithm: min-label propagation with pointer jumping.  Each round
    (a) every vertex takes the min label over itself and its neighbors
    (one shuffle join edges⋈labels + one min-groupBy), then (b) labels
    chase their own label's label (`comp := comp[comp]`), which doubles
    the propagation distance — convergence in O(log D) rounds rather
    than O(D) for diameter D.  Labels only ever decrease, so
    `sum(comp)` is a strictly-decreasing convergence witness: one
    scalar action per round, no row-level comparison join.  Each round
    ends in an eager localCheckpoint — without it the plan doubles
    every iteration and Catalyst re-analyzes a 2^k-deep lineage.

    At 100 TB the per-round cost is two shuffles keyed by vertex id
    (uniform — document ids, not content keys), and — critically — the
    iteration state holds only vertices that HAVE an edge: in a dedup
    graph the overwhelming majority of documents are singletons, and
    dragging them through every round would shuffle the whole corpus
    per iteration for no movement.  Singletons rejoin as their own
    component in one final left join.

    ``algorithm="star"`` switches to the alternating large-star /
    small-star variant (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — see
    :func:`_connected_components_star`.  It rewrites the EDGE set
    instead of propagating labels, which cuts per-round traffic on
    power-law pair graphs (the hot vertex's edges collapse onto the
    component minimum after one large-star).  Both algorithms return
    identical components (property-tested in tests/test_llmdata.py).

    Returns (id_col, component) with one row per vertex; singletons map
    to themselves.
    """
    if algorithm == "star":
        return _connected_components_star(
            edges, vertices, src_col, dst_col, id_col, max_iterations
        )
    if algorithm != "label_prop":
        raise ValueError(
            f"connected_components: unknown algorithm {algorithm!r} "
            f"(expected 'label_prop' or 'star')"
        )
    # materialize the (possibly expensive — e.g. an LSH pair join)
    # edge lineage ONCE, BEFORE the symmetrization union references it
    # twice (optimization r16: the union's two arms each re-ran the
    # whole pair-generation pipeline during the old single checkpoint —
    # the star variant never had the bug because its canonical `e` is
    # referenced once); every round re-reads the symmetric checkpoint
    e = edges.select(
        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
    ).localCheckpoint(eager=True)
    sym = e.union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("id"), F.col("u").alias("comp"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_total = None
    for _ in range(max_iterations):
        # joins below are self-joins of checkpointed plans; resolve by
        # DISJOINT column names (v=id, comp=jid), never by DataFrame
        # attribute refs — Catalyst's relation dedup rewrites attribute
        # ids on one side and dangling refs throw
        # `NoSuchElementException: key not found` at optimization time
        nbr = sym.join(labels, F.expr("v = id")).select(
            F.col("u").alias("id"), F.col("comp")
        )
        merged = (
            labels.select("id", "comp")
            .unionByName(nbr)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp := comp[comp] (left join — a vertex whose
        # label is itself finds itself)
        jumped = (
            merged.join(
                merged.select(
                    F.col("id").alias("jid"), F.col("comp").alias("jcomp")
                ),
                F.expr("comp = jid"),
                "left",
            )
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        labels = jumped.localCheckpoint(eager=True)
        total = labels.agg(F.sum("comp")).first()[0]
        if total == prev_total:
            break
        prev_total = total
    # singletons (no edges) never entered the loop: their component is
    # themselves
    return vertices.select(F.col(id_col)).join(
        labels.select(F.col("id").alias(id_col), "comp"), id_col, "left"
    ).select(
        F.col(id_col),
        F.coalesce("comp", F.col(id_col)).alias("component"),
    )


def _connected_components_star(
    edges: DataFrame,
    vertices: DataFrame,
    src_col: str,
    dst_col: str,
    id_col: str,
    max_iterations: int,
) -> DataFrame:
    """Alternating large-star / small-star connected components
    (Kiveris et al., SoCC'14): each round rewrites the edge set so
    every vertex's neighborhood collapses toward the neighborhood
    minimum, converging to per-component stars centered on the
    component's min vertex id.

    - **large-star(u)**: with m = min(Γ(u) ∪ {u}), re-point every
      STRICTLY LARGER neighbor v > u at m — high-degree vertices shed
      their big neighbors in one round, which is why this variant wins
      on power-law pair graphs (the minhash hot-bucket shape).
    - **small-star(u)**: re-point every neighbor v ≤ u, and u itself,
      at m — folds the small side onto the center.

    Each phase is one min-groupBy over the symmetric edge list plus one
    join back — edge-count-linear shuffles keyed by vertex id, no label
    table to carry, and the edge set SHRINKS monotonically toward one
    edge per non-center vertex (min-label propagation instead re-joins
    the full edge set against labels every round).  Convergence: the
    canonical directed edge multiset (child > parent) is stable — an
    order-free count + xxhash64-sum scalar per round, O(1) bytes to the
    driver.  At convergence ``comp(child) = parent`` and centers /
    singletons map to themselves.
    """
    e = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    # canonical child > parent form; self-loops dropped
    directed = (
        e.filter(F.col("a") != F.col("b"))
        .select(
            F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iterations):
        sym = directed.select("a", "b").unionByName(
            directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # large-star: m(u) over the full neighborhood, larger neighbors
        # re-pointed at it
        m = sym.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        large = (
            sym.join(m, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the large-star output
        sym2 = large.select("a", "b").unionByName(
            large.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        m2 = sym2.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
        small = (
            sym2.join(m2, "a")
            .filter(F.col("b") <= F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
            .unionByName(m2.select(F.col("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(
                F.greatest("a", "b").alias("a"), F.least("a", "b").alias("b")
            )
            .distinct()
        )
        directed = small.localCheckpoint(eager=True)
        sig = directed.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor, not sum: order-free AND overflow-free under ANSI
            F.expr("bit_xor(xxhash64(a, b))").alias("h"),
        ).first()
        sig = (sig["n"], sig["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged stars: every child points at its component min; centers
    # and edge-less singletons are their own component
    labels = directed.groupBy("a").agg(F.min("b").alias("comp"))
    return (
        vertices.select(F.col(id_col))
        .join(
            labels.select(F.col("a").alias(id_col), "comp"), id_col, "left"
        )
        .select(
            F.col(id_col),
            F.coalesce("comp", F.col(id_col)).alias("component"),
        )
    )


# --- passage-level exact dedup ----------------------------------------------
def passage_table(
    docs: DataFrame,
    passage_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Each document's token stream cut into fixed non-overlapping
    ``passage_tokens``-token passages: one row per (doc, passage index)
    with the passage's md5.  The span-level unit of C4/RefinedWeb-style
    dedup — when documents carry no structural paragraph breaks (the
    synthetic corpus is a flat word stream), a fixed token window IS
    the passage.

    All codegen array expressions (split → sliced concat → md5), no
    Python; the per-doc expansion factor is ceil(tokens/passage_tokens),
    and only the 16-byte digest leaves the scan — the passage TEXT
    never shuffles."""
    if passage_tokens < 1:
        raise ValueError("llmdata: passage_tokens must be >= 1")
    toks = F.split(F.col(text_col), " ")
    n_passages = F.ceil(F.size(toks) / F.lit(passage_tokens)).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_passages - 1))
    return (
        docs.select(F.col(id_col), toks.alias("_toks"), idx.alias("p_idx"))
        .select(
            id_col,
            "p_idx",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("_toks"),
                        F.col("p_idx") * passage_tokens + 1,
                        passage_tokens,
                    ),
                )
            ).alias("p_hash"),
        )
    )


def passage_dup_stats(
    docs: DataFrame,
    passage_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document passage-duplication audit: total passages and how
    many of them also occur in ANOTHER document (cross-document span
    duplication — boilerplate, licenses, templated intros).

    Plan: one hash aggregation keyed by passage digest (doc-distinct
    counts), joined back to the passage rows — both sides keyed by the
    uniform 128-bit digest, so no skew; at 100 TB the digest-frequency
    side is |distinct passages| rows of 20 bytes."""
    p = passage_table(docs, passage_tokens, text_col, id_col)
    freq = p.groupBy("p_hash").agg(
        F.countDistinct(id_col).alias("_docs")
    )
    return (
        p.join(freq, "p_hash")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.when(F.col("_docs") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup_passages"),
        )
    )


def drop_duplicated_passages(
    docs: DataFrame,
    passage_tokens: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each document keeping, for every cross-document-
    duplicated passage, only its globally-first occurrence (min
    (doc_id, p_idx) — the C4 rule of keeping one copy of a repeated
    span).  Output: (id, cleaned text, n_kept, n_dropped).

    The keeper election is a min_by over the same digest-keyed
    aggregation passage_dup_stats uses; reconstruction re-concatenates
    the surviving passages in index order with concat_ws over a
    sort_array'd struct collect — per-doc state bounded by the doc's
    own passage count."""
    p = passage_table(docs, passage_tokens, text_col, id_col)
    keeper = p.groupBy("p_hash").agg(
        F.min_by(
            F.struct(F.col(id_col).alias("kid"), F.col("p_idx").alias("kidx")),
            F.struct(F.col(id_col), F.col("p_idx")),
        ).alias("_k"),
        F.countDistinct(id_col).alias("_docs"),
    )
    keep = (
        p.join(keeper, "p_hash")
        .filter(
            (F.col("_docs") == 1)
            | ((F.col("_k.kid") == F.col(id_col)) & (F.col("_k.kidx") == F.col("p_idx")))
        )
    )
    toks = F.split(F.col(text_col), " ")
    passages = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
    )
    kept_text = (
        keep.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sort_array(
                F.collect_list(F.struct(F.col("p_idx"), F.col("p_hash")))
            ).alias("_kept"),
        )
    )
    # re-slice the original token array for each kept index (join back
    # to the doc's tokens; the passage text itself never shuffled)
    rebuilt = (
        kept_text.join(passages, id_col)
        .select(
            id_col,
            "n_kept",
            F.concat_ws(
                " ",
                F.flatten(
                    F.transform(
                        F.col("_kept"),
                        lambda k: F.slice(
                            F.col("_toks"),
                            k["p_idx"] * passage_tokens + 1,
                            passage_tokens,
                        ),
                    )
                ),
            ).alias("clean_text"),
        )
    )
    total = passage_table(docs, passage_tokens, text_col, id_col).groupBy(
        id_col
    ).agg(F.count(F.lit(1)).alias("_total"))
    # LEFT join from total (ADVICE r7): a document whose EVERY passage
    # is a non-keeper duplicate has no `keep` rows — it must still be
    # emitted as (id, '', 0, n) so full deduplication stays auditable
    # instead of silently vanishing from the output.
    kept_n = F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint")
    return total.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        kept_n.alias("n_kept"),
        (F.col("_total") - kept_n).cast("bigint").alias("n_dropped"),
    )


# --- exact-substring dedup (suffix-array family) ------------------------------
def duplicated_substring_spans(
    docs: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """Exact-substring duplication stats per document — the Lee et al.
    2021 ("Deduplicating Training Data Makes Language Models Better")
    ExactSubstr family, re-expressed for Spark: a substring of
    ``min_len``+ tokens is duplicated (anywhere in the corpus,
    including elsewhere in the SAME document) iff at least one of its
    ``min_len``-grams occurs ≥2 times corpus-wide, so the single-node
    suffix array the paper builds collapses distributedly into a
    position-gram frequency count.  Positions whose gram repeats mark
    spans ``[pos, pos+min_len)``; overlapping/adjacent spans merge
    (gaps-and-islands) into maximal duplicated regions.

    Output: one row per document that contains ≥1 duplicated span —
    (id, n_spans, dup_tokens, n_tokens).  Exactness: a token position
    lies in some duplicated region iff it lies in a ≥min_len substring
    that appears twice in the corpus — no approximation, unlike the
    MinHash/SimHash families above.

    Scale strategy (100 TB): the explode is linear in corpus tokens
    and scan-local; the only wide exchanges are (1) a hash aggregation
    on the gram key — partial map-side combine collapses within-split
    repeats, hot grams (boilerplate) reduce to ONE row each — and (2)
    a semi-join of positions against the ≥2 grams on the same key
    (AQE skew-split handles boilerplate keys; the build side is
    count-filtered, never the full gram table); then a per-doc window
    bounded by the doc's own length.

    ``hashed=True`` collision bound (ADVICE r10): shuffling 8-byte
    xxhash64 keys instead of min_len-token strings is ~10× narrower,
    but a collision FALSELY marks a span duplicated — and in
    ``drop_duplicated_substrings`` silently DELETES non-duplicated
    text.  By the birthday bound the expected collision count over G
    distinct grams is ≈ G²/2^65: negligible at gate scale (the
    registry oracle replays the UNHASHED semantics and has
    hash-matched — a per-run zero-collision attestation) but
    near-certain as G approaches 2^32, which a 100 TB corpus EXCEEDS
    (~10^13 token positions).  At that scale run ``hashed=False``
    (shuffle the gram strings; same plan shape, wider exchange) or
    extend the key to 128 bits (e.g. two independent 64-bit hashes),
    which pushes the expected collision count to G²/2^129 ≈ 10^-13
    at 10^13 grams.  The destructive variant should prefer
    ``hashed=False`` whenever the corpus size is unknown.

    DELIBERATE double-scan: the position table feeds both the gram
    frequency aggregation and the semi-join probe, so its lineage
    (tokenize + explode) evaluates twice.  At corpus scale the
    explode output is token-count-sized — materializing it (persist /
    checkpoint) would write the whole corpus's gram table to
    cache/disk, which costs more than the second scan-local pass; the
    two consumers pipeline independently (code-review r10: counted
    here so the scale paragraph covers scans, not just exchanges).
    """
    spans = _substring_spans(docs, min_len, text_col, id_col, hashed)
    return spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(F.col("__p1") - F.col("__p0") + min_len).alias("dup_tokens"),
        F.first("__n").cast("bigint").alias("n_tokens"),
    )


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("__t"),
    ).withColumn("__n", F.size("__t"))


def _substring_spans(
    docs: DataFrame, min_len: int, text_col: str, id_col: str, hashed: bool
) -> DataFrame:
    """Shared core of the exact-substring family: one row per maximal
    duplicated region — (id, __isl, __p0, __p1, __n); see
    duplicated_substring_spans for semantics and the scale argument."""
    toks = _doc_tokens(docs, text_col, id_col)
    eligible = toks.filter(F.col("__n") >= min_len)
    gram = F.concat_ws(" ", F.slice("__t", F.col("__pos") + 1, min_len))
    pos = eligible.select(
        F.col(id_col),
        F.col("__n"),
        F.explode(F.sequence(F.lit(0), F.col("__n") - min_len)).alias("__pos"),
        "__t",
    ).select(
        F.col(id_col),
        F.col("__n"),
        F.col("__pos"),
        (F.xxhash64(gram) if hashed else gram).alias("__g"),
    )
    dup_grams = (
        pos.groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__g")
    )
    dup_pos = pos.join(dup_grams, "__g", "semi")
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy("__pos")
    isl = (
        dup_pos.withColumn("__prev", F.lag("__pos").over(w))
        .withColumn(
            "__new",
            F.when(
                F.col("__prev").isNull()
                | (F.col("__pos") - F.col("__prev") > min_len),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "__isl",
            F.sum("__new").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return isl.groupBy(id_col, "__isl").agg(
        F.min("__pos").alias("__p0"),
        F.max("__pos").alias("__p1"),
        F.first("__n").alias("__n"),
    )


def drop_duplicated_substrings(
    docs: DataFrame,
    min_len: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hashed: bool = True,
) -> DataFrame:
    """The destructive form of the exact-substring family: rebuild each
    document with every duplicated region REMOVED — Lee et al. 2021's
    actual ExactSubstr cut, which (unlike the keep-one-copy C4 rule in
    drop_duplicated_passages) drops ALL occurrences of a duplicated
    ≥min_len-token substring, including the first.

    CAUTION at corpus scale (ADVICE r10): with ``hashed=True`` a
    64-bit gram-key collision silently deletes NON-duplicated text;
    expected collisions ≈ G²/2^65 over G distinct grams — fine at
    gate scale, near-certain by 2^32 grams.  For corpora anywhere
    near that (a 100 TB corpus is ~10^13 grams), pass
    ``hashed=False``; see duplicated_substring_spans's collision
    paragraph for the full bound.

    Output: (id, clean_text, n_tokens, n_dropped) for EVERY document —
    docs with no duplicated spans (or too short to hold a min_len-gram)
    pass through unchanged, fully-duplicated docs emit '' and stay
    auditable (the drop_duplicated_passages left-join rule); NULL text
    emits ('', NULL, NULL) — null in, null counts out.

    Scale: the span pipeline is duplicated_substring_spans's (linear
    explode, one gram-keyed agg, semi-join, per-doc window); the
    reconstruction joins the per-doc span LIST (bounded by the doc's
    own length) back to the token arrays and filters token positions
    scan-locally — the document body never shuffles with the grams."""
    spans = _substring_spans(docs, min_len, text_col, id_col, hashed)
    span_arr = spans.groupBy(id_col).agg(
        F.collect_list(
            F.struct(F.col("__p0").alias("a"),
                     (F.col("__p1") + min_len - 1).alias("b"))
        ).alias("__spans"),
    )
    toks = _doc_tokens(docs, text_col, id_col)
    joined = toks.join(span_arr, id_col, "left")
    sp = F.coalesce(F.col("__spans"), F.array())
    kept = F.filter(
        F.transform(F.col("__t"), lambda t, i: F.struct(t.alias("t"), i.alias("i"))),
        lambda x: ~F.exists(sp, lambda s: (x["i"] >= s["a"]) & (x["i"] <= s["b"])),
    )
    return joined.select(
        F.col(id_col),
        F.concat_ws(" ", F.transform(kept, lambda x: x["t"])).alias("clean_text"),
        F.col("__n").cast("bigint").alias("n_tokens"),
        (F.col("__n") - F.size(kept)).cast("bigint").alias("n_dropped"),
    )
