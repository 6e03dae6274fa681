"""LLM-data-pipeline queries (SURVEY §7 PR 6) with DuckDB oracles where
SQL-expressible.  MinHash-LSH and SimHash run on md5-derived hashes so
even the sketch pipelines have exact SQL twins; only the truly
non-replayable sketches (random-hyperplane LSH, trained IVF) stay
rows-only, recall-tested in tests/test_llmdata.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.llmdata import (
    dedup,
    multimodal,
    pipeline,
    similarity,
)
from kafka_metrics_exporter_spark.llmdata.text import (
    fingerprint_column,
    langid_column,
    langid_sql,
    quality_columns,
    quality_gate,
    quality_gate_sql,
    quality_sql,
    token_counts,
)
from kafka_metrics_exporter_spark.plans.queries import _t, query

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    """
    SELECT md5(text) AS text_hash,
           CAST(min(doc_id) AS BIGINT) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-groupBy exact dedup: shuffle carries 16-byte digests, not
    document bodies; uniform keys → no skew at any scale."""
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    -- one short gram for sub-n-token docs, exactly like _shingle_list
    -- (list_slice clamps; a fixed len>=n filter silently dropped them)
    s AS (SELECT doc_id, unnest(range(greatest(len(ws) - 2, 1))) AS i, ws
          FROM w WHERE len(ws) >= 1),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(ws, i + 1, i + 3), ' ') AS shingle
           FROM s),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs (≥0.5) via the shingle inverted-index
    self-join — pair blow-up is Σ df(shingle)², not N²; the selective
    shingle key keeps it linear-ish on real corpora."""
    return dedup.ngram_jaccard_dedup(_t(spark, sf_dir, "documents"), threshold=0.5)


# Shared by dedup_components (min-label propagation) and
# dedup_components_star (large-star/small-star): both algorithms must
# produce the identical component labeling this recursive-CTE
# min-reachability oracle computes.
_CC_ORACLE_SQL = """
    WITH RECURSIVE w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    -- one short gram for sub-n-token docs, exactly like _shingle_list
    -- (list_slice clamps; a fixed len>=n filter silently dropped them)
    s AS (SELECT doc_id, unnest(range(greatest(len(ws) - 2, 1))) AS i, ws
          FROM w WHERE len(ws) >= 1),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(ws, i + 1, i + 3), ' ') AS shingle
           FROM s),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ),
    edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
              UNION ALL
              SELECT doc_b, doc_a FROM pairs),
    reach(u, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.u WHERE r.lbl < e.v
    )
    SELECT u AS doc_id,
           MIN(lbl) AS component,
           MIN(lbl) = u AS is_survivor
    FROM reach GROUP BY u
    """


@query("dedup_components", _CC_ORACLE_SQL)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-level dedup: transitive closure over the exact 3-gram
    Jaccard pair graph (A~B, B~C ⇒ {A,B,C} one cluster), one survivor
    (min doc_id) per component.  Spark side: O(log D) min-label
    propagation with pointer jumping (dedup.connected_components);
    oracle side: recursive CTE min-reachability over the same pairs."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_dedup(docs, threshold=0.5)
    labels = dedup.connected_components(pairs, docs)
    return labels.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_survivor"),
    )


@query("dedup_components_star", _CC_ORACLE_SQL)
def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same clustering as dedup_components but via the alternating
    large-star/small-star edge-rewrite algorithm (Kiveris et al.,
    SoCC'14; dedup._connected_components_star) — the power-law-graph
    lever named since round 3.  Identical oracle: both algorithms must
    agree bit-for-bit on the component labeling."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_dedup(docs, threshold=0.5)
    labels = dedup.connected_components(pairs, docs, algorithm="star")
    return labels.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_survivor"),
    )


# The full MinHash-LSH pipeline has an exact SQL twin because every
# stage is deterministic arithmetic over md5-derived shingle hashes:
# base = md5_number_upper(shingle) % (2^31-1) (≡ first 8 md5 digest
# bytes little-endian, the Spark side's hashlib value), signature_i =
# min over shingles of Carter-Wegman (a_i·h + b_i) mod p with the same
# published constants, and two docs are LSH candidates iff some band's
# 4-value signature slice is equal (the Spark side buckets on
# xxhash64(band, slice) — equal-slice ≡ equal-hash modulo 2^-64
# collisions).  Candidates then pass the same exact-Jaccard ≥ τ verify
# as the ngram oracle.
_MINHASH_A = "[" + ",".join(str(a) for a, _ in dedup._permutation_constants(128)) + "]"
_MINHASH_B = "[" + ",".join(str(b) for _, b in dedup._permutation_constants(128)) + "]"

# Shared replay of the engine's shingle→md5-base-hash→Carter-Wegman→
# band pipeline, through the per-doc band slices (relation ``bands``).
_MINHASH_BANDS_CTE = f"""
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    -- one short gram for sub-n-token docs, exactly like _shingle_list
    -- (list_slice clamps; a fixed len>=n filter silently dropped them)
    s AS (SELECT doc_id, unnest(range(greatest(len(ws) - 2, 1))) AS i, ws
          FROM w WHERE len(ws) >= 1),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(ws, i + 1, i + 3), ' ') AS shingle
           FROM s),
    hh AS (SELECT doc_id,
                  CAST(md5_number_upper(shingle) % 2147483647 AS BIGINT) AS h
           FROM sh),
    consts AS (SELECT {_MINHASH_A}::BIGINT[] AS A, {_MINHASH_B}::BIGINT[] AS B),
    ph AS (
      SELECT doc_id, ii.i AS i, MIN((A[ii.i + 1] * h + B[ii.i + 1]) % 2147483647) AS m
      FROM hh, (SELECT unnest(range(128)) AS i) ii, consts
      GROUP BY doc_id, ii.i
    ),
    sig AS (SELECT doc_id, list(m ORDER BY i) AS sg FROM ph GROUP BY doc_id),
    bands AS (
      SELECT doc_id, bb.b AS b, sg[bb.b * 4 + 1 : bb.b * 4 + 4] AS sl
      FROM sig, (SELECT unnest(range(32)) AS b) bb
    )
"""

_MINHASH_PAIRS_CTE = f"""{_MINHASH_BANDS_CTE},
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.b = b.b AND a.sl = b.sl AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    lsh_pairs AS (
      SELECT i.doc_a, i.doc_b,
             round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    )
"""


@query(
    "dedup_minhash_lsh",
    f"WITH {_MINHASH_PAIRS_CTE} SELECT doc_a, doc_b, jaccard FROM lsh_pairs",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) → 32×4 LSH bands → bucket-join candidates → exact
    Jaccard verify.  The 100 TB path: candidate generation only touches
    band-bucket collisions.  Recall vs the exact query is pinned in
    tests/test_llmdata.py; since the md5-base hash switch the pipeline
    is ALSO exactly reproduced by the SQL twin above (no more
    rows-only driver check)."""
    return dedup.minhash_lsh_dedup(_t(spark, sf_dir, "documents"), threshold=0.5)


@query(
    "dedup_simhash",
    """
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS tok
      FROM documents
    ),
    tc AS (SELECT doc_id, tok, COUNT(*) AS w FROM toks GROUP BY 1, 2),
    th AS (SELECT doc_id, w, md5_number_upper(tok) AS h FROM tc),
    bits AS (SELECT doc_id, h, w, unnest(range(64)) AS b FROM th),
    sums AS (
      SELECT doc_id, b,
             SUM(CASE WHEN (h >> CAST(b AS UTINYINT)) & 1 = 1
                      THEN w ELSE -w END) AS s
      FROM bits GROUP BY 1, 2
    ),
    sig AS (
      -- pack sign bits in the SIGNED domain (bit 63 contributes
      -- -2^63), so the per-doc sum IS the two's-complement long the
      -- Spark side emits
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0
                           THEN CASE WHEN b = 63 THEN -9223372036854775808
                                     ELSE CAST(1 AS BIGINT) << CAST(b AS INT)
                                END
                           ELSE 0 END) AS BIGINT) AS simhash
      FROM sums GROUP BY doc_id
    ),
    chunks AS (
      SELECT doc_id, simhash, c.i AS chunk_idx,
             (simhash >> CAST(c.i * 16 AS INT)) & 65535 AS chunk
      FROM sig, (SELECT unnest(range(4)) AS i) c
    ),
    cands AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.simhash AS sig_a, b.simhash AS sig_b
      FROM chunks a JOIN chunks b
        ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk
           AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cands
    WHERE bit_count(xor(sig_a, sig_b)) <= 3
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash, 4×16-bit chunk candidates (pigeonhole for
    hamming ≤ 3), bit_count(xor) verify.  Token hash = first 8 md5
    bytes little-endian ≡ DuckDB's ``md5_number_upper``, so the ENTIRE
    signature pipeline — tokenize, weight, bit sums, sign pack, chunk
    join, hamming — has an exact SQL twin (was rows-only with the
    crc32 hash)."""
    out = dedup.simhash_near_dups(_t(spark, sf_dir, "documents"), max_hamming=3)
    return out.select("doc_a", "doc_b", F.col("hamming").cast("int").alias("hamming"))


@query(
    "embed_near_dup_cosine",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(list_dot_product(a.v, b.v) /
                 (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))),
                 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.45
    """,
)
def embed_near_dup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute pairwise cosine ≥ τ (oracle baseline).  The scale path is
    embed_near_dup_lsh below — hyperplane buckets prune the N² pair
    space before the exact check."""
    return similarity.embedding_near_dup_brute(
        _t(spark, sf_dir, "embeddings"), threshold=0.45
    )


# The hyperplane-LSH near-dup has an exact SQL twin as well: the 16
# LCG-derived hyperplanes are data-independent constants (embedded
# below as repr-round-tripped DOUBLE literals — bit-identical on
# parse), the bias-centering mean is taken over an md5-residue sample
# both engines compute the same way, and candidates are same-band
# same-bucket signature collisions verified by exact cosine.  The only
# cross-engine freedom left is float summation ORDER in the dot
# products (numpy pairwise vs sequential SQL, ~1e-15 relative) — it
# could flip a sign bit only for a vector whose projection lands
# within ~1e-14 of a cut, vanishingly unlikely for continuous
# embeddings and absent at the gate SFs (verified hash-equal).
_ELSH_PLANES = "[" + ",".join(
    "[" + ",".join(repr(x) for x in row) + "]"
    for row in similarity.hyperplanes(64, 16)
) + "]::DOUBLE[][]"


@query(
    "embed_near_dup_lsh",
    f"""
    WITH e AS (SELECT vec_id AS vid, embedding::DOUBLE[] AS v FROM embeddings),
    probe AS (
      SELECT * FROM e
      WHERE ('0x' || substr(md5(CAST(vid AS VARCHAR)), 1, 15))::BIGINT % 20 = 0
    ),
    mu_src AS (
      SELECT * FROM probe
      UNION ALL
      SELECT * FROM e WHERE NOT EXISTS (SELECT 1 FROM probe)
    ),
    mu AS (
      SELECT dd.d AS d, AVG(v[dd.d + 1]) AS m
      FROM mu_src, (SELECT unnest(range(64)) AS d) dd
      GROUP BY dd.d
    ),
    planes AS (SELECT {{_ELSH_PLANES}} AS P),
    bias AS (
      SELECT jj.j AS j, SUM(P[jj.j + 1][mu.d + 1] * mu.m) AS b
      FROM mu, (SELECT unnest(range(16)) AS j) jj, planes
      GROUP BY jj.j
    ),
    sig AS (
      SELECT e.vid, e.v,
             CAST(SUM(CASE WHEN list_dot_product(e.v, P[bias.j + 1]) > bias.b
                           THEN CAST(1 AS BIGINT) << CAST(bias.j AS INT)
                           ELSE 0 END) AS BIGINT) AS sig
      FROM e, bias, planes
      GROUP BY e.vid, e.v
    ),
    bands AS (
      SELECT vid, v, bb.band AS band,
             CASE WHEN bb.band = 0 THEN sig & 255 ELSE (sig >> 8) & 255 END AS bucket
      FROM sig, (SELECT unnest(range(2)) AS band) bb
    ),
    cand AS (
      SELECT DISTINCT a.vid AS vec_a, b.vid AS vec_b, a.v AS x, b.v AS y
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vid < b.vid
    ),
    scored AS (
      SELECT vec_a, vec_b,
             list_dot_product(x, y) /
             (sqrt(list_dot_product(x, x)) * sqrt(list_dot_product(y, y))) AS c
      FROM cand
    )
    SELECT vec_a, vec_b, round(c, 4) AS cosine FROM scored WHERE c >= 0.45
    """.replace("{_ELSH_PLANES}", _ELSH_PLANES),
)
def embed_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane (sign-projection) LSH near-dup: mean-centered 16-bit
    signatures, two 8-bit bands, exact cosine within buckets.  The
    100 TB path — replication factor 2, bucket_cap-bounded tasks —
    now ALSO hash-verified against the SQL twin above (the sample
    predicate switch from xxhash64 to md5-residue made the bucketing
    replayable; was rows-only)."""
    return similarity.embedding_near_dup_lsh(
        _t(spark, sf_dir, "embeddings"), threshold=0.45
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------
def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


@query(
    "embed_cosine_topk",
    """
    WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    s AS (
      SELECT e.vec_id,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv) /
                   (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
      FROM embeddings e, q
    )
    SELECT vec_id, cosine FROM s ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: scan + per-partition heap
    (TakeOrderedAndProject) — no shuffle, no corpus collect."""
    return similarity.brute_force_topk(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir), k=10
    )


@query(
    "embed_binary_topk",
    """
    WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    -- exact-arithmetic per-dim mean thresholds: int64 sum of the
    -- 1e6-scaled components (add-order independent), ONE double
    -- division — bit-identical to the engine's mapInPandas partials
    thr AS (
      SELECT dd.d AS d,
             CAST(SUM(CAST(floor(v[dd.d + 1] * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
               / CAST((SELECT COUNT(*) FROM e) * 1000000 AS BIGINT) AS t
      FROM e, (SELECT unnest(range(64)) AS d) dd
      GROUP BY dd.d
    ),
    -- sign-bit code packed into two 32-bit words (bit d of word w is
    -- v[32w+d] > thr[32w+d]) — Σ 2^d·bit equals the engine's Horner fold
    bits AS (
      SELECT e.id, e.v,
             CAST(SUM(CASE WHEN thr.d < 32 AND e.v[thr.d + 1] > thr.t
                           THEN CAST(1 AS BIGINT) << CAST(thr.d AS INT)
                           ELSE 0 END) AS BIGINT) AS w0,
             CAST(SUM(CASE WHEN thr.d >= 32 AND e.v[thr.d + 1] > thr.t
                           THEN CAST(1 AS BIGINT) << CAST(thr.d - 32 AS INT)
                           ELSE 0 END) AS BIGINT) AS w1
      FROM e, thr GROUP BY e.id, e.v
    ),
    q AS (SELECT w0 AS qw0, w1 AS qw1, v AS qv FROM bits WHERE id = 0),
    cand AS (
      SELECT b.id, b.v,
             CAST(bit_count(xor(b.w0, q.qw0))
                  + bit_count(xor(b.w1, q.qw1)) AS BIGINT) AS hamming
      FROM bits b, q
      ORDER BY hamming ASC, b.id ASC LIMIT 200
    )
    SELECT c.id AS vec_id, c.hamming,
           round(list_dot_product(c.v, q.qv) /
                 (sqrt(list_dot_product(c.v, c.v))
                  * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
    FROM cand c, q
    ORDER BY cosine DESC, vec_id ASC LIMIT 10
    """,
)
def embed_binary_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (round 11.5): 1 bit/dim sign codes
    against exact-arithmetic per-dim corpus-mean thresholds, Hamming
    prefilter to 200 candidates (popcount of XOR over two packed
    words), exact cosine rerank — the asymmetric two-stage layout
    modern vector stores default to at billion scale, and the
    cheapest-possible index build (one narrow scan; no training loop,
    unlike the IVF/PQ/IVF-PQ rows it complements).

    Scale shape: thresholds reduce as exact int64 partials (≤1 row per
    Arrow batch); code fold + XOR + popcount are scan-local JVM column
    algebra; the candidate cut is a per-partition top-200 heap
    (TakeOrderedAndProject, no shuffle); the rerank touches 200 rows.
    Determinism: bits compare doubles both engines derive identically,
    Hamming is integral, rerank rounds to 4 before the id tie-break.
    tests pin recall ≥ 0.7 vs brute force and exact parity when the
    prefilter is disabled (n_candidates = corpus size)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.binary_topk(
        emb, _query_vec(spark, sf_dir), k=10, n_candidates=200
    )


def _km_assign_sql(base: str, prev_cent: str, out: str) -> str:
    """THE k-means assignment CTE, shared by every training-unroll
    oracle (IVF, cluster-dedup, PQ, IVF-PQ — code-review r11: three
    hand-maintained copies risked forking the (dist, cell) tie-break
    that mirrors numpy argmin's first index, part of the SQL-replay
    contract)."""
    return f"""{out} AS (
      SELECT a.id, a.v, cc.cell
      FROM {base} a CROSS JOIN {prev_cent} cc
      QUALIFY row_number() OVER (
        PARTITION BY a.id
        ORDER BY -2.0 * list_dot_product(a.v, cc.c) + list_dot_product(cc.c, cc.c) ASC,
                 cc.cell ASC) = 1
    )"""


def _km_means_sql(assigned: str, out: str, width: int) -> str:
    """THE per-dimension AVG centroid CTE pair (see _km_assign_sql)."""
    return f"""{out}_m AS (
      SELECT cell, dd.d AS d, AVG(v[dd.d + 1]) AS m
      FROM {assigned}, (SELECT unnest(range({width})) AS d) dd
      GROUP BY cell, dd.d
    ),
    {out} AS (SELECT cell, list(m ORDER BY d) AS c FROM {out}_m GROUP BY cell)"""


def _kmeans_ctes(n_cells: int, iters: int, dim: int) -> tuple[list[str], str]:
    """Shared unrolled k-means training CTEs (see _ivf_oracle_sql for
    the replay rationale); returns (cte_parts, final_centroid_cte)."""

    def assign(prev_cent: str, out: str) -> str:
        return _km_assign_sql("e", prev_cent, out)

    def means(assigned: str, out: str) -> str:
        return _km_means_sql(assigned, out, dim)

    parts = [
        f"""e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
    a0 AS (
      SELECT id, v,
             CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
                  % {n_cells} AS INT) AS cell
      FROM e
    )""",
        means("a0", "cent0"),
    ]
    for i in range(1, iters + 1):
        parts.append(assign(f"cent{i - 1}", f"a{i}"))
        parts.append(means(f"a{i}", f"cent{i}"))
    parts.append(assign(f"cent{iters}", "fa"))
    return parts, f"cent{iters}"


def _ivf_oracle_sql(
    n_cells: int = 16, iters: int = 3, nprobe: int = 4, k: int = 10, dim: int = 64
) -> str:
    """SQL replay of the ENTIRE IVF pipeline — including the k-means
    training.  Training is iterative but has a FIXED round count, so it
    unrolls into chained CTEs: md5-residue init cells, then per round a
    dim-wise AVG centroid table and a QUALIFY-row_number argmin
    re-assignment ((dist, cell) ordering == numpy argmin's first-index
    tie-break over the cell-sorted centroid matrix).  Probe = nprobe
    nearest final centroids to the query vector, exact cosine rerank.
    Cross-engine float freedom is summation order inside AVG /
    list_dot_product (~1e-16), which could only flip an assignment for
    a vector equidistant to two centroids at that precision — absent
    at the gate SF (verified bit-equal) and measure-zero in general."""
    parts, fc = _kmeans_ctes(n_cells, iters, dim)
    # splice the probe/rerank tail before the shared final assignment
    fa = parts.pop()
    parts.append("q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)")
    parts.append(f"""probe AS (
      SELECT cc.cell
      FROM {fc} cc, q
      ORDER BY list_dot_product(
                 list_transform(range(1, {dim} + 1), i -> qv[i] - cc.c[i]),
                 list_transform(range(1, {dim} + 1), i -> qv[i] - cc.c[i])) ASC,
               cc.cell ASC
      LIMIT {nprobe}
    )""")
    parts.append(fa)
    parts.append(f"""cand AS (SELECT fa.* FROM fa JOIN probe USING (cell)),
    scored AS (
      SELECT id AS vec_id,
             round(list_dot_product(v, qv) /
                   (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))),
                   4) AS cosine
      FROM cand, q
    )""")
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, cosine FROM scored ORDER BY cosine DESC, vec_id ASC LIMIT {k}"
    )


def _cluster_dedup_oracle_sql(
    n_cells: int = 16, iters: int = 3, dim: int = 64
) -> str:
    """SQL replay of embed_cluster_dedup: the shared k-means training
    unroll, then one survivor (min id) + size per final cell."""
    parts, _fc = _kmeans_ctes(n_cells, iters, dim)
    parts.append("""per_cell AS (
      SELECT cell, COUNT(*) AS cell_size, MIN(id) AS survivor
      FROM fa GROUP BY cell
    )""")
    return (
        "WITH " + ",\n    ".join(parts)
        + """
    SELECT fa.id AS vec_id, fa.cell,
           per_cell.cell_size,
           fa.id = per_cell.survivor AS is_survivor
    FROM fa JOIN per_cell USING (cell)"""
    )


@query("embed_ivf_topk", _ivf_oracle_sql())
def embed_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF: k-means-lite coarse cells, probe 4/16 cells, exact rerank —
    scan prunes to nprobe/ncells of the corpus; recall vs brute force
    pinned in tests.  Since the md5-residue init switch the training
    replay is deterministic, so even this "trained" index is
    hash-verified against the unrolled SQL twin (was rows-only)."""
    return similarity.ivf_topk(
        _t(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir),
        k=10,
        n_cells=16,
        nprobe=4,
    )


@query("embed_cluster_dedup", _cluster_dedup_oracle_sql())
def embed_cluster_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (SemDeDup-style) cluster dedup: k-means cells over the
    embedding space, one survivor per cell — removes semantically
    redundant documents that share no bytes/shingles, the coarse pass
    a hash dedup can't do.  Same deterministic training as
    embed_ivf_topk, so the whole query is hash-verified against the
    unrolled SQL replay."""
    out = similarity.cluster_dedup(
        _t(spark, sf_dir, "embeddings"), n_cells=16, iters=3
    )
    return out.select(
        "vec_id", "cell", "cell_size", "is_survivor"
    )


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------
_QUALITY_SQL_COLS = ",\n           ".join(
    f"{expr} AS {name}" for name, expr in quality_sql("text").items()
)


@query(
    "text_metrics",
    f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT)
             AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
             AS n_bpe_tokens,
           {_QUALITY_SQL_COLS}
    FROM documents
    """,
)
def text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    tc = token_counts(F.col("text"))
    qc = quality_columns(F.col("text"))
    return d.select(
        "doc_id",
        tc["n_ws_tokens"].alias("n_ws_tokens"),
        tc["n_bpe_tokens"].alias("n_bpe_tokens"),
        *[c.alias(n) for n, c in qc.items()],
    )


@query(
    "text_langid",
    f"""
    SELECT doc_id, lang,
           {langid_sql('text')} AS lang_pred
    FROM documents
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID; Spark expression and SQL twin are both
    generated from the same word lists (llmdata.text.LANG_MARKERS)."""
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", langid_column(F.col("text")).alias("lang_pred"))


@query(
    "doc_fingerprint",
    """
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text),
               '[^A-Za-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_column(F.col("text")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------
_MM_FEATURE_SQL = ",\n           ".join(
    f"((checksum >> {2 * i}) % 251) / 251.0 AS f{i}" for i in range(8)
)


@query(
    "multimodal_features",
    f"""
    WITH m AS (
      SELECT doc_id AS media_id,
             'image' AS media_type,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             ('0x' || substr(md5(text), 1, 12))::BIGINT AS checksum
      FROM documents
    )
    SELECT media_id, media_type, n_bytes, checksum,
           CAST(64 + checksum % 64 AS INT) AS width,
           CAST(64 + (checksum >> 8) % 64 AS INT) AS height,
           CAST(1 + (checksum >> 16) % 8 AS INT) AS n_frames,
           {_MM_FEATURE_SQL}
    FROM m
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: wrap document text bytes as media
    content, extract features through the Arrow-batched decode stub —
    the exact shape a PIL/libav decoder plugs into.

    The feature vector is exploded to scalar ``f0..f7`` doubles so the
    result is hash-stable for external canonicalizers (a raw
    ``array<double>`` cell can't be sorted/factorized by pandas); the
    md5-derived decode stub makes every field DuckDB-expressible."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_binary_column(
        d, payload_col="text", id_col="doc_id", media_type="image", source_col="source"
    )
    feats = multimodal.extract_features(media, decoder="fake")
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        "checksum",
        "width",
        "height",
        "n_frames",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(8)],
    )


# ---------------------------------------------------------------------------
# Corpus assembly: splits / mixing / packing / decontamination
# (llmdata/pipeline.py).  Selection is content-addressed — md5 bucket
# of the id — so both engines compute the identical assignment.
# ---------------------------------------------------------------------------

_BUCKET_SQL = "CAST(('0x' || substr(md5(doc_id::VARCHAR), 1, 4)) AS INT)"


@query(
    "pipe_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_BUCKET_SQL} < 58982 THEN 'train'
                WHEN {_BUCKET_SQL} < 62259 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def pipe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by md5 bucket of the
    doc id — reproducible across runs/clusters and stable as the corpus
    grows (no doc ever drifts between splits)."""
    return pipeline.deterministic_split(
        _t(spark, sf_dir, "documents"),
        weights={"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("doc_id", "split")


@query(
    "pipe_stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_BUCKET_SQL} <
          CASE lang WHEN 'zh' THEN 65536 WHEN 'en' THEN 32768
                    WHEN 'es' THEN 16384 WHEN 'de' THEN 16384
                    ELSE 6553 END
    """,
)
def pipe_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: keep all zh, half of en, a quarter of es/de, 10%
    of the rest — a literal when-chain on the hash bucket, pushed into
    the scan (no join, no shuffle)."""
    return pipeline.stratified_keep(
        _t(spark, sf_dir, "documents"),
        fractions={"zh": 1.0, "en": 0.5, "es": 0.25, "de": 0.25},
        default_fraction=0.1,
    ).select("doc_id", "lang")


@query(
    "pipe_pack_chunks",
    """
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_tokens
      FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens) / 512.0) AS BIGINT) AS chunk_id
    FROM t
    """,
)
def pipe_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential context-window packing: per-language running token
    total in doc-id order, cut every 512 tokens.  Window parallelism =
    #languages here; at scale the partition key gains a hash shard (see
    pipeline.pack_chunks docstring)."""
    d = _t(spark, sf_dir, "documents")
    d = d.withColumn("n_tokens", token_counts(F.col("text"))["n_ws_tokens"])
    return pipeline.pack_chunks(d, budget=512).select(
        "doc_id", "lang", "n_tokens", "chunk_id"
    )


@query(
    "pipe_decontaminate",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(greatest(len(ws) - 3, 1))) AS i, ws
          FROM w WHERE len(ws) >= 1),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(ws, i + 1, i + 4), ' ') AS shingle
           FROM s),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    hits AS (SELECT DISTINCT doc_id FROM sh
             WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM bench))
    SELECT d.doc_id, h.doc_id IS NOT NULL AS is_contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """,
)
def pipe_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-leakage sweep: flag training docs sharing any word n-gram
    with the benchmark slice (doc_id % 97 = 0 stands in for a held-out
    eval set).  Real pipelines sweep 8-13-grams; the synthetic corpus's
    near-dup overlap window is short, so the query pins n=4 (8 hits at
    sf0.01, ~700 at sf0.1 — enough true flags to make the hash check
    meaningful).  The benchmark shingle set broadcasts, so the corpus
    side is one scan + map-side semi-join — no shuffle of the big
    side."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return pipeline.decontaminate(train, bench, n=4)


@query(
    "multimodal_resize",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             ('0x' || substr(md5(text), 1, 12))::BIGINT AS checksum
      FROM documents
    ),
    dims AS (
      SELECT media_id, checksum,
             CAST(64 + checksum % 64 AS INT) AS src_w,
             CAST(64 + (checksum >> 8) % 64 AS INT) AS src_h
      FROM m
    ),
    px AS (
      SELECT media_id, src_w, src_h,
             (checksum % 251 + 7 * ((r.ri * src_h) // 32)
              + 13 * ((c.cj * src_w) // 32)) % 256 AS v
      FROM dims, range(32) r(ri), range(32) c(cj)
    )
    SELECT media_id,
           MIN(src_w) AS src_width, MIN(src_h) AS src_height,
           CAST(32 AS INT) AS width, CAST(32 AS INT) AS height,
           AVG(v) AS mean_intensity
    FROM px GROUP BY media_id
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize to 32×32 over binary media rows: real
    index-map gather + mean reduction per Arrow batch; only the pixel
    decode is the deterministic integer-formula stub, which is why the
    oracle can re-enumerate the resized grid cell-by-cell (integer
    sums are float64-exact, so the means match bit-for-bit)."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_binary_column(
        d, payload_col="text", id_col="doc_id", media_type="image", source_col="source"
    )
    return multimodal.resize_images(media, width=32, height=32)


@query(
    "multimodal_frames",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             ('0x' || substr(md5(text), 1, 12))::BIGINT AS checksum
      FROM documents
    ),
    dims AS (
      SELECT media_id, checksum,
             CAST(64 + checksum % 64 AS INT) AS w,
             CAST(64 + (checksum >> 8) % 64 AS INT) AS h,
             CAST(1 + (checksum >> 16) % 8 AS INT) AS n_frames
      FROM m
    ),
    frames AS (
      SELECT media_id, w, h, checksum, CAST(f.f AS INT) AS frame_idx
      FROM dims, range(8) f(f)
      WHERE f.f < n_frames AND f.f % 2 = 0
    ),
    px AS (
      SELECT media_id, w, h, frame_idx,
             (checksum % 251 + 7 * r.ri + 13 * c.cj + 17 * frame_idx) % 256 AS v
      FROM frames, range(128) r(ri), range(128) c(cj)
      WHERE r.ri < h AND c.cj < w
    )
    SELECT media_id, frame_idx,
           MIN(w) AS width, MIN(h) AS height,
           AVG(v) AS mean_intensity
    FROM px GROUP BY media_id, frame_idx
    """,
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling at cadence 2 (frames 0, 2, 4, …): per-frame
    explode and mean reduction are real; frame pixels come from the
    deterministic stub so each sampled frame's statistic is
    oracle-checkable."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_binary_column(
        d, payload_col="text", id_col="doc_id", media_type="video", source_col="source"
    )
    return multimodal.sample_frames(media, every_n=2)


_GATE_SQL = quality_gate_sql("text")


@query(
    "text_quality_gate",
    f"""
    SELECT doc_id,
           {_GATE_SQL["keep"]} AS keep,
           {_GATE_SQL["reject_reason"]} AS reject_reason
    FROM documents
    """,
)
def text_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed quality gate: keep/reject with the FIRST failing rule
    as the reason (ordered when-chain = first-match-wins), the decision
    step between cheap per-doc metrics and expensive dedup.  Both
    engines evaluate the same rule spec (text.QUALITY_GATE_RULES)."""
    d = _t(spark, sf_dir, "documents")
    gate = quality_gate(F.col("text"))
    return d.select(
        "doc_id",
        gate["keep"].alias("keep"),
        gate["reject_reason"].alias("reject_reason"),
    )


# ---------------------------------------------------------------------------
# PII-style masking + weighted sampling (round 3)
# ---------------------------------------------------------------------------

_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"


@query(
    "text_redact",
    f"""
    WITH r AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                            '[0-9]+', '<NUM>', 'g') AS redacted,
             len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
             len(regexp_extract_all(text, '[0-9]+')) AS n_nums
      FROM documents
    )
    SELECT doc_id, md5(redacted) AS redacted_hash,
           CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_nums AS BIGINT) AS n_nums,
           n_emails + n_nums > 0 AS changed
    FROM r
    """,
)
def text_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style masking: emails then digit runs replaced with typed
    placeholder tokens — the scrubbing step between raw crawl and
    training corpus.  Pure regexp_replace/regexp_count Column exprs
    (JVM codegen, no UDF); emits md5(redacted) rather than the body so
    the checked result stays narrow at any scale."""
    d = _t(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), F.lit(_EMAIL_RE), F.lit("<EMAIL>")),
        F.lit("[0-9]+"),
        F.lit("<NUM>"),
    )
    n_emails = F.regexp_count(F.col("text"), F.lit(_EMAIL_RE)).cast("bigint")
    n_nums = F.regexp_count(F.col("text"), F.lit("[0-9]+")).cast("bigint")
    return d.select(
        "doc_id",
        F.md5(redacted).alias("redacted_hash"),
        n_emails.alias("n_emails"),
        n_nums.alias("n_nums"),
        ((n_emails + n_nums) > 0).alias("changed"),
    )


@query(
    "pipe_weighted_sample",
    f"""
    WITH w AS (
      SELECT doc_id,
             least(1.0, n_chars / 2000.0) AS weight
      FROM documents
    )
    SELECT doc_id, round(weight, 4) AS weight
    FROM w
    WHERE {_BUCKET_SQL} < CAST(floor(weight * 65536) AS INT)
    """,
)
def pipe_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-weight deterministic sampling: keep probability
    proportional to a per-row score (here length-derived — in a real
    pipeline, quality or source-temperature weight).  Same
    content-addressed md5 bucket as pipe_split, so the decision is a
    pure row-local function — no shuffle, reproducible on any cluster,
    and the complement of the categorical stratified_keep."""
    d = _t(spark, sf_dir, "documents")
    weight = F.least(F.lit(1.0), F.col("n_chars") / F.lit(2000.0))
    keep = pipeline.hash_bucket(F.col("doc_id")) < F.floor(weight * F.lit(65536))
    return d.withColumn("weight", weight).filter(keep).select(
        "doc_id", F.round("weight", 4).alias("weight")
    )


# ---------------------------------------------------------------------------
# End-to-end corpus build + LSH-pairs components (round 3)
# ---------------------------------------------------------------------------


@query(
    "pipe_corpus_build",
    f"""
    WITH gated AS (
      SELECT doc_id, text,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_tokens
      FROM documents
      WHERE {_GATE_SQL["keep"]}
    ),
    survivors AS (
      SELECT md5(text) AS h, min(doc_id) AS doc_id
      FROM gated GROUP BY md5(text)
    )
    SELECT g.doc_id,
           CAST(g.n_tokens AS BIGINT) AS n_tokens,
           CASE WHEN {_BUCKET_SQL.replace('doc_id', 'g.doc_id')} < 58982 THEN 'train'
                WHEN {_BUCKET_SQL.replace('doc_id', 'g.doc_id')} < 62259 THEN 'val'
                ELSE 'test' END AS split
    FROM gated g JOIN survivors s USING (doc_id)
    """,
)
def pipe_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The assembled pipeline as ONE declarative plan: quality gate →
    exact-dedup survivors → deterministic split → token budget, ending
    in (doc_id, n_tokens, split).  Catalyst fuses the gate into the
    scan, the dedup is one digest-keyed shuffle, the split/token
    columns are row-local exprs — at 100 TB this whole corpus build is
    two shuffles (dedup groupBy + the survivor semi-join)."""
    from kafka_metrics_exporter_spark.llmdata.dedup import exact_dedup

    d = _t(spark, sf_dir, "documents")
    gate = quality_gate(F.col("text"))
    gated = d.filter(gate["keep"])
    survivors = exact_dedup(gated).select(F.col("survivor_id").alias("doc_id"))
    kept = gated.join(survivors, "doc_id", "left_semi")
    kept = kept.withColumn("n_tokens", token_counts(F.col("text"))["n_ws_tokens"])
    out = pipeline.deterministic_split(
        kept, weights={"train": 0.9, "val": 0.05, "test": 0.05}
    )
    return out.select("doc_id", "n_tokens", "split")


@query(
    "dedup_minhash_components",
    f"""
    WITH RECURSIVE {_MINHASH_PAIRS_CTE},
    edges AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
              UNION ALL
              SELECT doc_b, doc_a FROM lsh_pairs),
    reach(u, lbl) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.u WHERE r.lbl < e.v
    )
    SELECT u AS doc_id,
           MIN(lbl) AS component,
           MIN(lbl) = u AS is_survivor
    FROM reach GROUP BY u
    """,
)
def dedup_minhash_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production-scale cluster dedup: MinHash-LSH candidate pairs
    (bucketed, never all-pairs) → exact-Jaccard verify → connected
    components → one survivor per near-dup cluster.  This is
    dedup_components with the quadratic exact pair generation swapped
    for the sketch path — the composition C4/RefinedWeb-style pipelines
    run at corpus scale.  Agreement with the exact-pair components is
    pinned in tests/test_llmdata.py (identical clusters wherever LSH
    recalls the pair; never merges non-near-dup docs)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_dedup(docs, threshold=0.5)
    labels = dedup.connected_components(pairs, docs)
    return labels.select(
        "doc_id",
        "component",
        (F.col("component") == F.col("doc_id")).alias("is_survivor"),
    )


@query(
    "multimodal_audio",
    """
    WITH m AS (
      SELECT doc_id AS media_id,
             ('0x' || substr(md5(text), 1, 12))::BIGINT AS checksum
      FROM documents
    ),
    dims AS (
      SELECT media_id, checksum,
             CAST(8000 + (checksum % 3) * 4000 AS INT) AS sample_rate,
             CAST(2048 + checksum % 2048 AS INT) AS n_samples
      FROM m
    ),
    wins AS (
      SELECT media_id, checksum, sample_rate, CAST(w.w AS INT) AS window_idx
      FROM dims, range(8) w(w)
      WHERE (w.w + 1) * 512 <= n_samples
    ),
    sm AS (
      SELECT media_id, sample_rate, window_idx,
             abs((checksum % 251 + 11 * (window_idx * 512 + s.s)) % 256 - 128) AS a
      FROM wins, range(512) s(s)
    )
    SELECT media_id, window_idx,
           MIN(sample_rate) AS sample_rate,
           AVG(a) AS mean_abs,
           MAX(a) AS peak
    FROM sm GROUP BY media_id, window_idx
    """,
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing over binary media rows: 512-sample windows with
    mean-|amplitude| and peak per window.  Windowing/explode/reduction
    are real Arrow-batch work; PCM comes from the deterministic stub so
    the oracle re-enumerates every window sample-by-sample (integer
    sums exact in float64; 512 is a power of two, so the mean divides
    exactly)."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_binary_column(
        d, payload_col="text", id_col="doc_id", media_type="audio", source_col="source"
    )
    return multimodal.audio_windows(media, window=512)


@query(
    "text_token_rarity",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS tok
      FROM documents
    ),
    vocab AS (SELECT tok, COUNT(*) AS df FROM tok GROUP BY tok)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           round(SUM(v.df) * 1.0 / COUNT(*), 4) AS mean_tok_freq,
           MIN(v.df) AS min_tok_freq
    FROM tok t JOIN vocab v USING (tok)
    GROUP BY t.doc_id
    """,
)
def text_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency scoring — the CCNet/LM-quality-filter shape
    (score each document by how typical its tokens are; rare-token-
    heavy docs are OCR noise or gibberish, common-token walls are
    boilerplate).  The statistic is the mean corpus document frequency
    of the doc's tokens plus the hapax detector min(df); integer sums
    keep it bit-identical across engines, unlike a log-likelihood whose
    FP summation order diverges (an intentional deterministic stand-in
    for unigram logprob — same ranking signal under Zipf).

    Scale: token explode → vocab groupBy (token-keyed shuffle, partial
    aggs) → frequency-attach join (token-keyed — vocab of a 100 TB
    corpus is too big to broadcast; both sides shuffle on token, AQE
    handles the Zipf skew) → per-doc aggregate."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    vocab = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    return (
        tok.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("df") / F.count(F.lit(1)), 4).alias("mean_tok_freq"),
            F.min("df").alias("min_tok_freq"),
        )
    )


@query(
    "text_repetition",
    """
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> '')) AS tok
      FROM documents
    ),
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    g AS (
      SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS gram
      FROM (SELECT doc_id, unnest(range(len(ws) - 1)) AS i, ws FROM w WHERE len(ws) >= 2)
    ),
    gc AS (SELECT doc_id, gram, COUNT(*) AS c FROM g GROUP BY doc_id, gram),
    per_doc AS (
      SELECT doc_id, SUM(c) AS n_grams, MAX(c) AS max_gram_count
      FROM gc GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_grams AS BIGINT) AS n_grams,
           CAST(max_gram_count AS BIGINT) AS max_gram_count,
           round(max_gram_count * 1.0 / n_grams, 4) AS top_gram_frac
    FROM per_doc
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition — the Gopher/MassiveText quality
    signal (a high fraction of the doc being one repeated bigram marks
    boilerplate, menus, and degenerate generations).  Per doc: total
    bigram count, the most frequent bigram's count, and its fraction.
    Integer counts and a single division keep both engines
    bit-identical.

    Scale: the groupBy keys are (doc_id, gram) — cardinality bounded by
    corpus token count, uniformly distributed, partial-agg friendly; no
    join, two aggregations."""
    d = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda x: x != "")
    # materialize the token array ONCE per row; pairing adjacent tokens
    # via zip_with over two slices keeps gram construction O(tokens) —
    # an element_at(toks, i) inside the transform lambda re-evaluates
    # the split per gram (O(tokens^2)/doc: benched 4.7 s -> this form)
    ws = d.select("doc_id", toks.alias("ws"))
    grams = ws.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.zip_with(
                    F.slice("ws", 1, F.size("ws") - 1),
                    F.slice("ws", 2, F.size("ws") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("gram"),
    )
    gc = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
    return gc.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.max("c").alias("max_gram_count"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_gram_frac"),
    )


@query(
    "embed_quantize",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    m AS (
      SELECT vec_id, v,
             list_max(list_transform(v, x -> abs(x))) AS maxabs
      FROM e
    ),
    q AS (
      SELECT vec_id, v, maxabs,
             list_transform(
               v,
               x -> CAST(floor(x * (CASE WHEN maxabs > 0
                                         THEN 127.0 / maxabs ELSE 0 END) + 0.5)
                         AS INT)) AS qv
      FROM m
    ),
    d AS (
      SELECT vec_id, v, maxabs, qv,
             list_transform(qv, x -> x * (maxabs / 127.0)) AS deq
      FROM q
    )
    SELECT vec_id,
           CAST(len(qv) AS INT) AS n_dims,
           round(maxabs / 127.0, 6) AS scale_inv,
           CAST(list_sum(qv) AS BIGINT) AS sum_q,
           round(list_dot_product(v, deq) /
                 nullif(sqrt(list_dot_product(v, v))
                        * sqrt(list_dot_product(deq, deq)), 0), 4) AS cos_deq
    FROM d
    """,
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8 scalar quantization + fidelity audit: per-vector symmetric
    scale, half-up rounding, and the cosine between each original and
    its dequantized form (the 4× compression a 100 TB embedding store
    ships with; cos_deq ≈ 0.99+ is the usual acceptance bar)."""
    q = similarity.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return similarity.quantization_fidelity(q)


@query(
    "pipe_sliding_chunks",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
               AS n_toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, n_toks,
             CASE WHEN n_toks <= 64 THEN 1
                  ELSE CAST(ceil((n_toks - 64) / 48.0) AS INT) + 1 END AS n_chunks
      FROM t
    ),
    x AS (
      -- per-row unnest: exact n_chunks rows per document, no fixed cap
      -- (a fixed range(64) silently under-enumerated long documents)
      SELECT doc_id, n_toks, unnest(range(n_chunks)) AS i FROM n
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(i * 48 AS INT) AS start_tok,
           CAST(least(64, n_toks - i * 48) AS INT) AS chunk_toks,
           n_toks
    FROM x
    """,
)
def pipe_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token windows at stride 48 over each document —
    RAG/long-context chunk prep; row expansion is #chunks per doc, the
    token arrays never explode."""
    return pipeline.sliding_chunks(
        _t(spark, sf_dir, "documents"), window=64, stride=48
    ).select("doc_id", "chunk_idx", "start_tok", "chunk_toks", "n_toks")


@query(
    "pipe_fuzzy_decontaminate",
    f"""
    WITH {_MINHASH_BANDS_CTE},
    cand AS (
      SELECT DISTINCT t.doc_id AS doc_id, b.doc_id AS bench_id
      FROM bands t JOIN bands b ON t.b = b.b AND t.sl = b.sl
      WHERE t.doc_id % 29 <> 0 AND b.doc_id % 29 = 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_id, c.bench_id, COUNT(*) AS n_common
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_id
      JOIN sh b2 ON b2.doc_id = c.bench_id AND b2.shingle = a.shingle
      GROUP BY 1, 2
    ),
    ver AS (
      SELECT i.doc_id, i.bench_id,
             n_common * 1.0 / (sa.n + sb.n - n_common) AS jaccard
      FROM inter i
      JOIN sizes sa ON i.doc_id = sa.doc_id
      JOIN sizes sb ON i.bench_id = sb.doc_id
      WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= 0.5
    ),
    agg AS (SELECT doc_id, MAX(jaccard) AS mj FROM ver GROUP BY doc_id),
    mt AS (
      SELECT v.doc_id, a.mj, MIN(v.bench_id) AS mb
      FROM ver v JOIN agg a ON v.doc_id = a.doc_id AND v.jaccard = a.mj
      GROUP BY 1, 2
    )
    SELECT d.doc_id,
           (mt.doc_id IS NOT NULL) AS is_contaminated,
           round(mt.mj, 4) AS max_jaccard,
           mt.mb AS matched_bench
    FROM (SELECT doc_id FROM documents WHERE doc_id % 29 <> 0) d
    LEFT JOIN mt ON d.doc_id = mt.doc_id
    """,
)
def pipe_fuzzy_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH NEAR-duplicate decontamination of a training split
    against a benchmark split (doc_id % 29 == 0 plays the eval set):
    flags training docs with 3-gram Jaccard ≥ 0.5 against any
    benchmark doc, reporting the best-matching benchmark id.  The
    benchmark band buckets + shingle sets are broadcast, so the
    training side is one fused Arrow scan with a map-side probe — no
    shuffle of the big side (llmdata/pipeline.py::fuzzy_decontaminate).
    Exact SQL twin via the shared md5/Carter-Wegman band replay; ties
    resolve to the smallest benchmark id in both engines."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 29 == 0)
    train = docs.filter(F.col("doc_id") % 29 != 0)
    out = pipeline.fuzzy_decontaminate(train, bench, threshold=0.5)
    return out.select(
        "doc_id",
        "is_contaminated",
        F.round("max_jaccard", 4).alias("max_jaccard"),
        "matched_bench",
    )


@query(
    "multimodal_channel_stats",
    """
    WITH m AS (
      SELECT ('0x' || substr(md5(text), 1, 12))::BIGINT AS checksum
      FROM documents
    ),
    x AS (
      SELECT ch.i AS channel,
             (checksum >> CAST(2 * ch.i AS INT)) % 251 AS k
      FROM m, (SELECT unnest(range(8)) AS i) ch
    )
    SELECT CAST(channel AS INT) AS channel,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(k * k) AS BIGINT) AS sumsq_k,
           MIN(k) AS min_k,
           MAX(k) AS max_k,
           round(SUM(k) * 1.0 / COUNT(*), 6) AS mean_k
    FROM x GROUP BY channel
    """,
)
def multimodal_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-normalization statistics per feature channel
    (multimodal.channel_stats over the decode stub's 8-dim features),
    emitted in the exact-integer domain: the stub's feature values are
    k/251 with k an md5-derived integer, so round(v·251) recovers k
    exactly and every aggregate (counts, sums, min/max, and the
    sum/count mean — a division of exact integers) is bit-identical
    across engines with no float-summation freedom."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.attach_binary_column(
        d, payload_col="text", id_col="doc_id", media_type="image"
    )
    feats = multimodal.extract_features(media, decoder="fake")
    x = feats.select(
        F.posexplode("feature").alias("channel", "v")
    ).withColumn("k", F.round(F.col("v") * 251).cast("long"))
    return (
        x.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.col("k") * F.col("k")).alias("sumsq_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .select(
            "channel",
            "n",
            "sum_k",
            "sumsq_k",
            "min_k",
            "max_k",
            F.round(F.col("sum_k") / F.col("n"), 6).alias("mean_k"),
        )
    )


@query(
    "text_corpus_report",
    f"""
    WITH x AS (
      SELECT {langid_sql('text')} AS lang,
             source,
             len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
               AS n_toks,
             CASE WHEN {quality_gate_sql('text')['keep']} THEN 1 ELSE 0 END
               AS keep
      FROM documents
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_keep,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           round(quantile_cont(n_toks, 0.5), 4) AS p50_tokens,
           round(quantile_cont(n_toks, 0.95), 4) AS p95_tokens,
           MIN(n_toks) AS min_tokens,
           MAX(n_toks) AS max_tokens
    FROM x GROUP BY lang, source
    """,
)
def text_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation dashboard in ONE plan: per detected language quality-gate pass counts, the token budget, and interpolated
    token-length percentiles — the summary a data team reads before
    committing a corpus to training.  Composes langid + token counting
    + the quality gate + exact percentiles in a single scan and one
    hash aggregation on the (tiny) language key; both the langid CASE
    chain and the gate SQL are GENERATED from the same rule constants
    the Column implementation uses, so the twin can't drift."""
    from kafka_metrics_exporter_spark.llmdata.text import (
        langid_column as _lang,
        quality_gate as _gate,
        token_counts as _tc,
    )

    d = _t(spark, sf_dir, "documents")
    t = F.col("text")
    base = d.select(
        _lang(t).alias("lang"),
        F.col("source"),
        _tc(t)["n_ws_tokens"].alias("n_toks"),
        _gate(t)["keep"].cast("int").alias("keep"),
    )
    return base.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("keep").alias("n_keep"),
        F.sum("n_toks").alias("total_tokens"),
        F.round(F.percentile(F.col("n_toks"), F.lit(0.5)), 4).alias("p50_tokens"),
        F.round(F.percentile(F.col("n_toks"), F.lit(0.95)), 4).alias("p95_tokens"),
        F.min("n_toks").alias("min_tokens"),
        F.max("n_toks").alias("max_tokens"),
    )


@query(
    "pipe_bloom_decontaminate",
    """
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws
      FROM documents
    ),
    s AS (SELECT doc_id, unnest(range(greatest(len(ws) - 3, 1))) AS i, ws
          FROM w WHERE len(ws) >= 1),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(list_slice(ws, i + 1, i + 4), ' ') AS shingle
           FROM s),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    hits AS (SELECT DISTINCT doc_id FROM sh
             WHERE doc_id % 97 <> 0 AND shingle IN (SELECT shingle FROM bench))
    SELECT d.doc_id, h.doc_id IS NOT NULL AS is_contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN hits h USING (doc_id)
    """,
)
def pipe_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pipe_decontaminate's exact flags through the BLOOM pre-filter
    path (llmdata/pipeline.py::bloom_decontaminate): the benchmark
    shingle set becomes a broadcast BITMAP probed inside the Arrow
    shingling pass — bloom-negative grams (the overwhelming majority)
    never leave the scan — and the sliver of positives passes the exact
    broadcast semi-join verify, which kills bloom false positives.  The
    oracle is therefore the SAME exact-overlap SQL: identical flags by
    construction, different (bitmap-not-hash-table) 100 TB shape."""
    d = _t(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    train = d.filter(F.col("doc_id") % 97 != 0)
    return pipeline.bloom_decontaminate(train, bench, n=4)


def _tfidf_oracle() -> str:
    from kafka_metrics_exporter_spark.llmdata.text import tfidf_topk_sql

    return tfidf_topk_sql(k=5)


@query("text_tfidf_topk", _tfidf_oracle())
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per document by smoothed TF-IDF (sklearn's
    ln((N+1)/(df+1))+1 idf) — keyword extraction over the corpus, all
    built-in Column ops: two token-keyed aggregations, a 1-row-build
    term join (AQE skew-split absorbs stopword keys), a broadcast
    corpus-count, and a doc-keyed rank window.  The oracle is GENERATED
    from the same spec (llmdata/text.py::tfidf_topk_sql) so the
    tokenization, arithmetic order, rounding, and tie-break match
    operation for operation."""
    from kafka_metrics_exporter_spark.llmdata.text import tfidf_topk

    return tfidf_topk(_t(spark, sf_dir, "documents"), k=5)


@query(
    "dedup_passage",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    p AS (
      SELECT doc_id, CAST(u.i AS INT) AS p_idx,
             md5(array_to_string(
               list_slice(toks, CAST(u.i AS BIGINT) * 20 + 1,
                          CAST(u.i AS BIGINT) * 20 + 20), ' ')) AS p_hash
      FROM t, UNNEST(range(CAST(ceil(len(toks) / 20.0) AS BIGINT))) AS u(i)
    ),
    freq AS (
      SELECT p_hash, COUNT(DISTINCT doc_id) AS docs FROM p GROUP BY p_hash
    )
    SELECT p.doc_id,
           COUNT(*) AS n_passages,
           CAST(SUM(CASE WHEN freq.docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_passages
    FROM p JOIN freq USING (p_hash)
    GROUP BY p.doc_id
    """,
)
def dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level (fixed 20-token window) cross-document span
    duplication audit — the C4/RefinedWeb span-dedup unit when docs
    carry no structural paragraphs (llmdata/dedup.py passage_dup_stats;
    drop_duplicated_passages is the destructive form, pytest-pinned).
    Scale: passages shuffle as 16-byte digests only (the passage text
    never leaves the scan); both the frequency agg and the join back
    are keyed by the uniform digest — no skew.  The oracle replays the
    identical chunking with list_slice/md5 in SQL."""
    out = dedup.passage_dup_stats(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_passages").cast("bigint").alias("n_passages"),
        "n_dup_passages",
    )


# ---------------------------------------------------------------------------
# Round 8: URL-level dedup and deterministic global shuffle
# ---------------------------------------------------------------------------

# Deterministic messy-URL synthesis over documents: three raw variants
# per canonical target (uppercase host + default port + tracking param /
# plain / double-slash + trailing slash + fragment), so the dedup is
# only correct if the canonicalizer actually normalizes every step.
# Replayed verbatim in the oracle.
_URL_SPARK = (
    "CASE CAST(doc_id % 3 AS INT) "
    "WHEN 0 THEN concat('HTTPS://WWW.', source, '.Example.COM:443/p/', "
    "CAST(doc_id % 40 AS STRING), '?utm_source=feed&q=', CAST(doc_id % 7 AS STRING)) "
    "WHEN 1 THEN concat('https://', source, '.example.com/p/', "
    "CAST(doc_id % 40 AS STRING), '?q=', CAST(doc_id % 7 AS STRING)) "
    "ELSE concat('https://', source, '.example.com//p//', "
    "CAST(doc_id % 40 AS STRING), '/?q=', CAST(doc_id % 7 AS STRING), '#sec') "
    "END"
)
_URL_DUCK = (
    "CASE CAST(doc_id % 3 AS INT) "
    "WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/p/' || "
    "CAST(doc_id % 40 AS VARCHAR) || '?utm_source=feed&q=' || CAST(doc_id % 7 AS VARCHAR) "
    "WHEN 1 THEN 'https://' || source || '.example.com/p/' || "
    "CAST(doc_id % 40 AS VARCHAR) || '?q=' || CAST(doc_id % 7 AS VARCHAR) "
    "ELSE 'https://' || source || '.example.com//p//' || "
    "CAST(doc_id % 40 AS VARCHAR) || '/?q=' || CAST(doc_id % 7 AS VARCHAR) || '#sec' "
    "END"
)


def _dedup_url_oracle() -> str:
    from kafka_metrics_exporter_spark.llmdata.text import canonicalize_url_sql

    return f"""
    WITH u AS (
      SELECT doc_id, {_URL_DUCK} AS url FROM documents
    ),
    c AS (SELECT doc_id, {canonicalize_url_sql("url")} AS canonical_url FROM u)
    SELECT canonical_url,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_docs
    FROM c GROUP BY 1
    """


@query("dedup_url", _dedup_url_oracle())
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup (round 8): canonicalize the URL column
    (llmdata/text.py canonicalize_url — scheme/host lowering, default
    ports, www., slash runs, tracking params, param sort), then keep
    min(doc_id) per canonical form.  The crawl pipeline's FIRST dedup
    pass: a pure key-column groupBy, no document bytes touched.

    100 TB: one hash aggregation keyed by the canonical URL (uniform —
    hosts shard across the keyspace); the canonicalizer is a scan-local
    regexp chain inside codegen, so the only shuffle is the final
    groupBy.  Reference parity: URL normalization per
    Code/KafkaMetrics.py:61-70's metric-path normalization, promoted to
    the web-crawl key domain."""
    from kafka_metrics_exporter_spark.llmdata.text import canonicalize_url

    docs = _t(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    c = u.select("doc_id", canonicalize_url(F.col("url")).alias("canonical_url"))
    return c.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        F.count(F.lit(1)).alias("n_docs"),
    )


@query(
    "pipe_global_shuffle",
    """
    WITH r AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('7' || chr(31) || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               AS res
      FROM documents
    ),
    s AS (
      SELECT doc_id, lang, CAST(res % 8 AS INT) AS shard,
             ROW_NUMBER() OVER (PARTITION BY res % 8 ORDER BY res, doc_id) AS pos
      FROM r
    )
    SELECT shard, pos, doc_id, lang FROM s
    """,
)
def pipe_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering
    (round 8): shard + within-shard rank as pure functions of
    (seed, doc_id) via the md5 residue — identical permutation on any
    cluster/partitioning/retry, unlike orderBy(rand(seed)) which
    depends on partition layout.  Epoch N+1 = seed+1, zero state.

    100 TB: scan-local residue projection; the single shuffle is the
    window's hash partitioning on shard — n_shards groups sized
    rows/n_shards (uniform residue, no skew), which is exactly the
    layout a sharded training-file write wants (one sorted partition
    per output file, zero extra exchanges)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    out = pipeline.seeded_shuffle(docs, id_col="doc_id", seed=7, n_shards=8)
    return out.select("shard", "pos", "doc_id", "lang")


def _text_gopher_oracle() -> str:
    from kafka_metrics_exporter_spark.llmdata.text import gopher_sql

    lined = "replace(text, 'batch ', 'batch' || chr(10))"
    cols = gopher_sql(lined)
    sel = ", ".join(f"{e} AS {n}" for n, e in cols.items())
    return f"SELECT doc_id, lang, {sel} FROM documents"


@query("text_gopher_quality", _text_gopher_oracle())
def text_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition/format rules (Rae et al. 2021 §A1.1) as a
    registry row (round 8): bullet/ellipsis line fractions, exact
    duplicate-line fraction, symbol-per-word and alphabetic-word
    ratios.  The synthetic corpus is single-line, so the query derives
    deterministic multi-line text first (newline after every 'batch '
    token — plain replace, replayed verbatim by the oracle), which
    makes n_lines and dup_line_ratio genuinely non-trivial: repeated
    'batch batch' runs produce duplicate lines.

    Scale shape: pure scan-local array/regexp expressions inside
    codegen — zero shuffles, zero Python; the line split never leaves
    the row."""
    from kafka_metrics_exporter_spark.llmdata.text import gopher_columns

    docs = _t(spark, sf_dir, "documents")
    lined = F.replace(F.col("text"), F.lit("batch "), F.lit("batch\n"))
    cols = gopher_columns(lined)
    return docs.select(
        "doc_id", "lang", *[c.alias(n) for n, c in cols.items()]
    )


def _dsir_oracle() -> str:
    from kafka_metrics_exporter_spark.llmdata.pipeline import (
        dsir_importance_sql,
    )

    return dsir_importance_sql(n_buckets=4096, k=50)


@query("pipe_dsir_resample", _dsir_oracle())
def pipe_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023) as a registry row
    (round 9): score raw documents by the log likelihood ratio of
    their hashed uni+bigram features under a high-quality target slice
    (source = 'src0' plays the Wikipedia-like target) vs the raw
    corpus, then sample 50 docs by deterministic Gumbel-top-k.  The
    oracle is GENERATED from the same spec
    (llmdata/pipeline.py::dsir_importance_sql) so tokenization,
    smoothing arithmetic, FOLD ORDER (the per-doc float sum is an
    ordered fold — an unordered SUM() diverges between engines),
    rounding, and tie-breaks match operation for operation.

    Scale shape: one gram explode into two hash aggregations; the
    bucket likelihood table is 4096 rows → broadcast; totals are 1-row
    broadcasts; the only data-sized shuffle carries (doc, bucket)
    pairs.  Top-k is TakeOrdered; the rank window sees k rows, never
    the corpus."""
    from kafka_metrics_exporter_spark.llmdata.pipeline import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        n_buckets=4096,
        k=50,
    )


@query(
    "embed_decontaminate",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bench AS (
      SELECT * FROM e
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 23 = 0
    ),
    corpus AS (
      SELECT * FROM e
      WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 23 <> 0
    ),
    scored AS (
      SELECT c.vec_id, b.vec_id AS bench_id,
             list_dot_product(c.v, b.v) /
             (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v)))
               AS cs
      FROM corpus c JOIN bench b ON true
    ),
    best AS (
      SELECT vec_id, bench_id, cs,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cs DESC, bench_id ASC) AS rn
      FROM scored
    )
    SELECT vec_id, bench_id, round(cs, 4) AS cosine
    FROM best WHERE rn = 1 AND cs >= 0.30
    """,
)
def embed_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic (embedding-space) benchmark decontamination (round 9):
    the md5-residue %23 slice of the embeddings table plays the held-out
    eval set; every other vector is flagged when its best benchmark
    cosine reaches 0.30, reported with the best-matching benchmark id.
    Complements the verbatim n-gram sweeps (pipe_decontaminate /
    _bloom): paraphrased leakage shares no 8-gram but stays close in
    embedding space.

    Scale shape: the eval set collects ONCE into a normalized numpy
    matrix (O(|bench|), eval sets are small by definition) and
    broadcasts; the corpus is one Arrow-batched scan doing a
    batch × |bench| matmul — zero shuffles, zero corpus-sized
    movement.  See similarity.embedding_decontaminate for the
    cross-engine float-tie caveat (same class as
    embed_near_dup_cosine's)."""
    emb = _t(spark, sf_dir, "embeddings")
    pred = similarity.md5_residue(F.col("vec_id")) % 23 == 0
    return similarity.embedding_decontaminate(
        emb.filter(~pred), emb.filter(pred), threshold=0.30
    )


@query(
    "pipe_domain_mix",
    """
    WITH base AS (
      SELECT doc_id, lang,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_tokens,
             ('0x' || substr(md5('0' || chr(31) || CAST(doc_id AS VARCHAR)),
                             1, 15))::BIGINT AS r,
             CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 2000
                       WHEN 'zh' THEN 1500 END AS budget
      FROM documents
    ),
    f AS (SELECT *, r % 1024 AS shard FROM base WHERE budget IS NOT NULL),
    c AS (
      SELECT doc_id, lang, n_tokens, budget,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY shard, r, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM f
    )
    SELECT doc_id, lang, n_tokens, cum_tokens
    FROM c WHERE cum_tokens - n_tokens < budget
    """,
)
def pipe_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (round 9): per language, take
    documents in content-addressed shuffle order until the domain's
    token budget fills (en 8000 / de 2000 / zh 1500; fr and es carry
    no budget and are excluded) — the data-mixing step that turns
    sampling weights into an actual training corpus.  The running sum
    is computed as shard-offset + within-(lang, shard) running sum —
    see llmdata/pipeline.py::domain_mix for why the naive
    one-window-per-domain form would serialize each domain into a
    single task at 100 TB.  The oracle's single global window is the
    SAME total order (shard, residue, id), so the integer token sums
    are hash-identical."""
    docs = _t(spark, sf_dir, "documents")
    return pipeline.domain_mix(
        docs, budgets={"en": 8000, "de": 2000, "zh": 1500}, seed=0
    )


# ---------------------------------------------------------------------------
# Round 10: exact-substring dedup (suffix-array family, Lee et al. 2021)
# ---------------------------------------------------------------------------
@query(
    "dedup_substring",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    e AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) >= 6),
    pos AS (
      SELECT doc_id, n, i - 1 AS pos, array_to_string(t[i:i+5], ' ') AS gram
      FROM e, LATERAL unnest(generate_series(1, n - 5)) AS u(i)
    ),
    dup AS (SELECT gram FROM pos GROUP BY gram HAVING COUNT(*) >= 2),
    dpos AS (SELECT p.doc_id, p.pos, p.n FROM pos p JOIN dup USING (gram)),
    isl AS (
      SELECT doc_id, pos, n,
             SUM(CASE WHEN prev IS NULL OR pos - prev > 6 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (SELECT doc_id, pos, n,
                   lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
            FROM dpos)
    ),
    spans AS (
      SELECT doc_id, island, MIN(pos) AS p0, MAX(pos) AS p1,
             any_value(n) AS n
      FROM isl GROUP BY 1, 2
    )
    SELECT doc_id,
           COUNT(*) AS n_spans,
           CAST(SUM(p1 - p0 + 6) AS BIGINT) AS dup_tokens,
           CAST(any_value(n) AS BIGINT) AS n_tokens
    FROM spans GROUP BY doc_id
    """,
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication (Lee et al. 2021 ExactSubstr — the
    suffix-array dedup family; VERDICT r9 item 3): per document, the
    maximal regions covered by ≥6-token substrings that occur twice
    anywhere in the corpus.  The paper's single-node suffix array
    becomes a distributed position-gram frequency count — exact, not
    a sketch: a ≥L-token substring repeats iff one of its L-grams
    repeats (llmdata/dedup.py duplicated_substring_spans).

    Scale: linear scan-local explode; ONE hash agg on 8-byte xxhash64
    gram keys (map-side combine collapses boilerplate); a semi-join of
    positions against the count≥2 grams (AQE skew-split for hot
    boilerplate keys — never an all-pairs stage); per-doc
    gaps-and-islands window bounded by doc length.  The oracle replays
    the UNHASHED gram semantics — a hash-match is also a zero-collision
    attestation for xxhash64 on this corpus."""
    out = dedup.duplicated_substring_spans(
        _t(spark, sf_dir, "documents"), min_len=6
    )
    return out.select("doc_id", "n_spans", "dup_tokens", "n_tokens")


# ---------------------------------------------------------------------------
# Round 10: product quantization ANN (Jégou et al. 2011)
# ---------------------------------------------------------------------------
def _pq_oracle_sql(
    m_sub: int = 8,
    n_codes: int = 16,
    iters: int = 2,
    rerank: int = 100,
    k: int = 10,
    dim: int = 64,
) -> str:
    """SQL replay of the ENTIRE PQ pipeline — the per-subspace k-means
    training (the embed_ivf_topk unroll run on each vector slice),
    the code assignment, the ADC ranking (per-code ||q_s − c||²
    constants summed in subspace order — the same accumulation order
    the engine's driver-side lookup tables use), the top-``rerank``
    cut, and the exact-cosine rerank.  Float freedom is the k-means
    AVG summation order, the freedom embed_ivf_topk's oracle documents
    and the gate verifies bit-equal."""
    d_sub = dim // m_sub
    parts = [
        "ef AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)",
    ]

    def assign(pfx: str, prev_cent: str, out: str) -> str:
        return _km_assign_sql(f"e{pfx}", prev_cent, out)

    def means(pfx: str, assigned: str, out: str) -> str:
        return _km_means_sql(assigned, out, d_sub)

    for s in range(m_sub):
        pfx = f"s{s}"
        lo = s * d_sub + 1
        parts.append(
            f"e{pfx} AS (SELECT id, v[{lo}:{lo + d_sub - 1}] AS v FROM ef)"
        )
        parts.append(f"""a0{pfx} AS (
      SELECT id, v,
             CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
                  % {n_codes} AS INT) AS cell
      FROM e{pfx}
    )""")
        parts.append(means(pfx, f"a0{pfx}", f"cent0{pfx}"))
        for i in range(1, iters + 1):
            parts.append(assign(pfx, f"cent{i - 1}{pfx}", f"a{i}{pfx}"))
            parts.append(means(pfx, f"a{i}{pfx}", f"cent{i}{pfx}"))
        parts.append(assign(pfx, f"cent{iters}{pfx}", f"fa{pfx}"))
        # the subspace's ADC term: ||q_s - c||² of the ASSIGNED code
        parts.append(f"""d{pfx} AS (
      SELECT fa{pfx}.id,
             list_dot_product(
               list_transform(range(1, {d_sub} + 1),
                              i -> qv[{lo} - 1 + i] - cc.c[i]),
               list_transform(range(1, {d_sub} + 1),
                              i -> qv[{lo} - 1 + i] - cc.c[i])) AS d
      FROM fa{pfx} JOIN cent{iters}{pfx} cc USING (cell), q
    )""")
    # per-subspace ADC terms join on id and sum in subspace order —
    # the accumulation order the engine's F.get-table chain uses
    adc_sum = " + ".join(f"ds{s}.d" for s in range(m_sub))
    join_tail = " ".join(
        f"JOIN ds{s} USING (id)" for s in range(1, m_sub)
    )
    parts.append(f"""cand AS (
      SELECT ds0.id
      FROM ds0 {join_tail}
      ORDER BY {adc_sum} ASC, ds0.id ASC
      LIMIT {rerank}
    )""")
    parts.append(f"""scored AS (
      SELECT ef.id AS vec_id,
             round(list_dot_product(ef.v, qv) /
                   (sqrt(list_dot_product(ef.v, ef.v)) *
                    sqrt(list_dot_product(qv, qv))), 4) AS cosine
      FROM cand JOIN ef USING (id), q
    )""")
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, cosine FROM scored "
        f"ORDER BY cosine DESC, vec_id ASC LIMIT {k}"
    )


@query("embed_pq_topk", _pq_oracle_sql())
def embed_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011; the FAISS PQ/ADC
    family): 8 per-subspace 16-code k-means codebooks encode each
    64-dim vector as 8 bytes; candidates rank by the asymmetric
    distance (per-code lookup constants summed in subspace order,
    scan-local) and the top 100 rerank by exact cosine
    (llmdata/similarity.py train_pq_codebooks/pq_topk).  Recall@10 vs
    brute force pinned ≥ 0.7 in tests (measured 1.0 at the gate SF).

    Scale: encoding is one Arrow matmul scan (at 100 TB the codes are
    precomputed columns — the ANN scan reads 8 BYTES per vector, an
    8× compression over even the int8-quantized embeddings); the ADC
    cut is a TakeOrdered; only the rerank set touches full vectors.
    Deterministic md5-residue training makes the ENTIRE trained index
    SQL-replayable — same contract as embed_ivf_topk."""
    return similarity.pq_topk(
        _t(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir),
        k=10,
        m_sub=8,
        n_codes=16,
        iters=2,
        rerank=100,
    )


# ---------------------------------------------------------------------------
# Round 11: IVF-PQ composed ANN (FAISS IVFPQ layout)
# ---------------------------------------------------------------------------
def _ivfpq_oracle_sql(
    n_cells: int = 16,
    coarse_iters: int = 2,
    nprobe: int = 12,
    m_sub: int = 8,
    n_codes: int = 16,
    pq_iters: int = 2,
    rerank: int = 200,
    k: int = 10,
    dim: int = 64,
) -> str:
    """SQL replay of the ENTIRE IVF-PQ pipeline: the coarse k-means
    unroll (embed_ivf_topk's pattern), the residual frame (vector
    minus its cell centroid), the per-subspace residual-PQ training
    unroll (embed_pq_topk's pattern run on residual slices), the
    probe, the per-cell ADC (the query's residual against EACH
    vector's own coarse cell), the top-``rerank`` cut, and the exact
    cosine rerank.  Float freedom is the k-means AVG summation order —
    the same freedom the IVF and PQ oracles document and the gate
    verifies bit-equal."""
    d_sub = dim // m_sub

    assign = _km_assign_sql
    means = _km_means_sql

    parts = [
        "e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        "q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)",
        f"""a0 AS (
      SELECT id, v,
             CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
                  % {n_cells} AS INT) AS cell
      FROM e
    )""",
        means("a0", "cent0", dim),
    ]
    for i in range(1, coarse_iters + 1):
        parts.append(assign("e", f"cent{i - 1}", f"a{i}"))
        parts.append(means(f"a{i}", f"cent{i}", dim))
    fc = f"cent{coarse_iters}"
    parts.append(assign("e", fc, "fa"))
    # residuals against the assigned coarse centroid
    parts.append(f"""r AS (
      SELECT fa.id, fa.cell AS ccell,
             list_transform(range(1, {dim} + 1), i -> fa.v[i] - cc.c[i]) AS v
      FROM fa JOIN {fc} cc USING (cell)
    )""")
    for s in range(m_sub):
        pfx = f"s{s}"
        lo = s * d_sub + 1
        parts.append(
            f"e{pfx} AS (SELECT id, v[{lo}:{lo + d_sub - 1}] AS v FROM r)"
        )
        parts.append(f"""p0{pfx} AS (
      SELECT id, v,
             CAST(('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT
                  % {n_codes} AS INT) AS cell
      FROM e{pfx}
    )""")
        parts.append(means(f"p0{pfx}", f"pc0{pfx}", d_sub))
        for i in range(1, pq_iters + 1):
            parts.append(assign(f"e{pfx}", f"pc{i - 1}{pfx}", f"p{i}{pfx}"))
            parts.append(means(f"p{i}{pfx}", f"pc{i}{pfx}", d_sub))
        parts.append(assign(f"e{pfx}", f"pc{pq_iters}{pfx}", f"pf{pfx}"))
        # the subspace's per-vector ADC term: the query's residual
        # against the vector's OWN coarse cell, minus the assigned code
        parts.append(f"""d{pfx} AS (
      SELECT pf.id,
             list_dot_product(
               list_transform(range(1, {d_sub} + 1),
                 i -> (qv[{lo} - 1 + i] - co.c[{lo} - 1 + i]) - pc.c[i]),
               list_transform(range(1, {d_sub} + 1),
                 i -> (qv[{lo} - 1 + i] - co.c[{lo} - 1 + i]) - pc.c[i])) AS d
      FROM pf{pfx} pf
      JOIN fa USING (id)
      JOIN {fc} co ON co.cell = fa.cell
      JOIN pc{pq_iters}{pfx} pc ON pc.cell = pf.cell, q
    )""")
    parts.append(f"""probe AS (
      SELECT cc.cell
      FROM {fc} cc, q
      ORDER BY list_dot_product(
                 list_transform(range(1, {dim} + 1), i -> qv[i] - cc.c[i]),
                 list_transform(range(1, {dim} + 1), i -> qv[i] - cc.c[i])) ASC,
               cc.cell ASC
      LIMIT {nprobe}
    )""")
    adc_sum = " + ".join(f"ds{s}.d" for s in range(m_sub))
    join_tail = " ".join(f"JOIN ds{s} USING (id)" for s in range(1, m_sub))
    parts.append(f"""cand AS (
      SELECT ds0.id
      FROM ds0 {join_tail}
      JOIN fa USING (id)
      JOIN probe ON probe.cell = fa.cell
      ORDER BY {adc_sum} ASC, ds0.id ASC
      LIMIT {rerank}
    )""")
    parts.append("""scored AS (
      SELECT e.id AS vec_id,
             round(list_dot_product(e.v, qv) /
                   (sqrt(list_dot_product(e.v, e.v)) *
                    sqrt(list_dot_product(qv, qv))), 4) AS cosine
      FROM cand JOIN e USING (id), q
    )""")
    return (
        "WITH " + ",\n    ".join(parts)
        + f"\n    SELECT vec_id, cosine FROM scored "
        f"ORDER BY cosine DESC, vec_id ASC LIMIT {k}"
    )


@query("embed_ivfpq_topk", _ivfpq_oracle_sql())
def embed_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composed ANN (Jégou et al. 2011; the FAISS IVFPQ layout,
    the standard billion-scale index): 16 coarse k-means cells, each
    vector's RESIDUAL against its cell centroid product-quantized by
    one shared set of 8 × 16-code codebooks; the query probes the 12
    nearest cells, ranks members by the per-cell asymmetric distance,
    and the top 200 rerank by exact cosine
    (llmdata/similarity.py ivfpq_topk).

    Recall, measured honestly on this ISOTROPIC synthetic corpus (the
    worst case for cell pruning — cosine neighbours scatter uniformly
    across cells): at equal code budget and NO pruning
    (nprobe = n_cells) residual-PQ recall@10 = 1.0, equal to the
    embed_pq_topk row (residual encoding quantizes at least as well as
    raw-vector encoding); the production point 12/16 trades a 25% scan
    cut for recall@10 = 0.9 at the gate SF — the standard IVF knob,
    pinned ≥ 0.7 in tests alongside the no-pruning equality.

    Scale: at 100 TB cell assignment and the 8 code bytes are
    precomputed columns with the table PARTITIONED BY CELL — the probe
    is partition pruning (reads 12/16 of the corpus here, and on real
    clustered embeddings far less at equal recall), the pruned scan
    reads 8 bytes per vector, the ADC cut is a TakeOrdered, and only
    200 candidates touch full vectors.  Training: ONE Arrow scan per
    k-means round (coarse and all-subspace-PQ alike); md5-residue
    init keeps the ENTIRE trained index — cells, residuals, codebooks,
    per-cell ADC — SQL-replayable, same contract as embed_ivf_topk
    and embed_pq_topk."""
    return similarity.ivfpq_topk(
        _t(spark, sf_dir, "embeddings"),
        _query_vec(spark, sf_dir),
        k=10,
        n_cells=16,
        nprobe=12,
        m_sub=8,
        n_codes=16,
        coarse_iters=2,
        pq_iters=2,
        rerank=200,
    )


# ---------------------------------------------------------------------------
# merge-table BPE token counting (round 15)
# ---------------------------------------------------------------------------
from kafka_metrics_exporter_spark.llmdata import bpe as _bpe  # noqa: E402

#: the built-in merge table as a DuckDB MAP literal ('a|b' -> rank) —
#: generated from the SAME module constant the engine encodes with, so
#: the oracle can never drift from the Spark implementation.  Merge
#: symbols come only from letter/digit runs (single-punct pre-tokens
#: have no pairs), so neither quotes nor '|' can appear in a key.
_BPE_RANKS_MAP = "MAP([{}], [{}])".format(
    ", ".join(f"'{a}|{b}'" for a, b in _bpe.MERGES),
    ", ".join(str(i) for i in range(len(_bpe.MERGES))),
)


@query(
    "text_bpe_tokens",
    f"""
    WITH RECURSIVE dw AS (
      SELECT doc_id,
             unnest(regexp_extract_all(
               text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w
      FROM documents
    ),
    wtab AS (SELECT DISTINCT w FROM dw),
    -- the GPT-2 greedy encoder as a recursion over UNIQUE words: each
    -- step merges the leftmost occurrence of the lowest-ranked
    -- adjacent pair.  One-at-a-time is exactly the all-occurrences
    -- algorithm: a pair containing a just-created token must have a
    -- HIGHER rank than the merge that created it (training order), so
    -- the minimum-rank pair stays the same until exhausted, and
    -- leftmost-first equals the left-to-right sweep.
    rec AS (
      SELECT w, list_transform(range(1, length(w) + 1), i -> w[i])
               AS parts
      FROM wtab
      UNION ALL
      SELECT w,
        list_concat(
          list_concat(
            parts[1 : best.i - 1],
            [parts[best.i] || parts[best.i + 1]]),
          parts[best.i + 2 : len(parts)]) AS parts
      FROM (
        SELECT w, parts,
          list_sort(list_transform(range(1, len(parts)),
            i -> {{'r': coalesce(map_extract({_BPE_RANKS_MAP},
                           parts[i] || '|' || parts[i + 1])[1],
                         999999),
                  'i': i}}))[1] AS best
        FROM rec WHERE len(parts) > 1
      ) t
      WHERE best.r < 999999
    ),
    -- rows shrink monotonically: the shortest state per word is the
    -- fixpoint (no applicable merge)
    wn AS (
      SELECT w, n FROM (
        SELECT w, len(parts) AS n,
               row_number() OVER (PARTITION BY w
                                  ORDER BY len(parts) ASC) AS rn
        FROM rec) t
      WHERE rn = 1
    )
    SELECT d.doc_id,
           CAST(COALESCE(SUM(wn.n), 0) AS BIGINT) AS n_bpe_tokens,
           CAST(COUNT(dw.w) AS BIGINT) AS n_pre_tokens
    FROM documents d
    LEFT JOIN dw ON d.doc_id = dw.doc_id
    LEFT JOIN wn ON dw.w = wn.w
    GROUP BY d.doc_id
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-table BPE token counting (round 15): per-document token
    counts under the built-in deterministic merge table
    (``llmdata/bpe.py`` — Sennrich training on the embedded seed,
    GPT-2 greedy encoding) next to the regex pre-token count, so
    training-data budgets are denominated the way corpora are actually
    measured.

    Engine: ONE mapInPandas Arrow pass (the merge loop is not Column
    math; Python only at the sanctioned Arrow map boundary), per-word
    LRU cache makes each task word-table-bound.  Oracle: the SAME
    greedy semantics as a recursive CTE over UNIQUE words (leftmost
    lowest-rank merge per step — provably identical to the
    all-occurrences sweep, see the SQL comment), ranks injected from
    the module's own MERGES constant.  Differential pins against an
    independent restart-from-rank-0 reference in
    tests/test_llmdata_bpe.py.

    Scale: the Arrow pass is a narrow zero-shuffle per-document
    transform; vocabulary grows sublinearly (Heaps' law), so the
    cache keeps per-task work near O(unique words)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = _bpe.with_bpe_token_count(d)
    return out.select(
        "doc_id",
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.size(
            F.regexp_extract_all(
                F.col("text"), F.lit(_bpe.BPE_TOKEN_RE), F.lit(0)
            )
        ).cast("long").alias("n_pre_tokens"),
    )


# ---------------------------------------------------------------------------
# corpus-self-trained bigram-LM perplexity (round 16 — built r15,
# registered per VERDICT r15 item 2)
# ---------------------------------------------------------------------------
from kafka_metrics_exporter_spark.llmdata import lm as _lm  # noqa: E402


@query(
    "text_perplexity",
    f"""
    SELECT doc_id, n_bigrams, round(ppl, 4) AS ppl
    FROM ({_lm.bigram_perplexity_sql()})
    """,
)
def text_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated bigram-LM perplexity (CCNet-style quality filter,
    trained on the scored corpus itself — ``llmdata/lm.py``): the real
    log-likelihood the token_rarity row's integer statistic stood in
    for.  Each bigram position's log P quantizes to 1e-8 fixed point
    before the per-document sum, so the score is partition-order
    independent and the DuckDB twin reproduces it bit-for-bit up to
    ln() ulps below the 4-decimal hash contract.

    Scale: bigram extraction is scan-local (array zip + one explode);
    the count tables are token-keyed hash aggs with map-side partials
    (Zipf-hot keys combine before the shuffle); scoring joins the pair
    stream against key-unique count tables; T and V ride a one-row
    broadcast."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = _lm.bigram_perplexity(d)
    return out.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round("ppl", 4).alias("ppl"),
    )


@query(
    "ccnet_buckets",
    f"""
    SELECT doc_id, bucket FROM ({_lm.ccnet_buckets_sql()})
    """,
)
def ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's output shape: head / middle / tail terciles by bigram-LM
    perplexity (CCNet buckets Common Crawl by KenLM-on-Wikipedia
    perplexity cuts; this engine's LM is the corpus-self-trained model
    of ``text_perplexity`` — documented divergence, same bucketing).
    Documents with < 2 tokens bucket 'unscored', never a fabricated
    score.

    The bucket column alone rides the hash (the ppl doubles are hashed
    by text_perplexity); the tercile cuts are ONE exact-percentile
    aggregation broadcast back over the scored relation — no corpus
    sort, no window."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return _lm.ccnet_buckets(d).select("doc_id", "bucket")


@query(
    "pack_chunks_bpe",
    f"""
    WITH RECURSIVE dw AS (
      SELECT doc_id, lang,
             unnest(regexp_extract_all(
               text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS w
      FROM documents
    ),
    wtab AS (SELECT DISTINCT w FROM dw),
    -- the text_bpe_tokens greedy encoder verbatim (leftmost
    -- lowest-rank merge per step over UNIQUE words)
    rec AS (
      SELECT w, list_transform(range(1, length(w) + 1), i -> w[i])
               AS parts
      FROM wtab
      UNION ALL
      SELECT w,
        list_concat(
          list_concat(
            parts[1 : best.i - 1],
            [parts[best.i] || parts[best.i + 1]]),
          parts[best.i + 2 : len(parts)]) AS parts
      FROM (
        SELECT w, parts,
          list_sort(list_transform(range(1, len(parts)),
            i -> {{'r': coalesce(map_extract({_BPE_RANKS_MAP},
                           parts[i] || '|' || parts[i + 1])[1],
                         999999),
                  'i': i}}))[1] AS best
        FROM rec WHERE len(parts) > 1
      ) t
      WHERE best.r < 999999
    ),
    wn AS (
      SELECT w, n FROM (
        SELECT w, len(parts) AS n,
               row_number() OVER (PARTITION BY w
                                  ORDER BY len(parts) ASC) AS rn
        FROM rec) t
      WHERE rn = 1
    ),
    counts AS (
      SELECT d.doc_id, d.lang,
             CAST(COALESCE(SUM(wn.n), 0) AS BIGINT) AS n_bpe_tokens
      FROM documents d
      LEFT JOIN dw ON d.doc_id = dw.doc_id
      LEFT JOIN wn ON dw.w = wn.w
      GROUP BY d.doc_id, d.lang
    )
    SELECT doc_id, lang, n_bpe_tokens,
           CAST(floor((SUM(n_bpe_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - n_bpe_tokens) / 512.0) AS BIGINT) AS chunk_id
    FROM counts
    """,
)
def pack_chunks_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing with merge-BPE-denominated budgets
    (``llmdata/pipeline.py pack_chunks_bpe`` — built r15, registered
    per VERDICT r15 item 2): one mapInPandas Arrow pass appends the
    deterministic merge-table token count, then the order-stable
    packing window cuts 512-token chunks per language.  The oracle
    reuses the text_bpe_tokens recursive-CTE greedy encoder verbatim
    and DuckDB's own running-sum window, so BOTH stages — the Python
    Arrow boundary and the packing Column math — are cross-engine
    hash-pinned in one row.

    Scale: the Arrow pass is narrow and zero-shuffle; the window
    partitions by lang (shard the key by hash_bucket % K at 100 TB,
    see pipeline.pack_chunks)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return pipeline.pack_chunks_bpe(d, budget=512).select(
        "doc_id", "lang",
        F.col("n_bpe_tokens").cast("long").alias("n_bpe_tokens"),
        F.col("chunk_id").cast("long").alias("chunk_id"),
    )
