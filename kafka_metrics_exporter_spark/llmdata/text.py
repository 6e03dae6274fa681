"""Text analysis for training-data pipelines: tokenization, quality
scoring, language identification, fingerprinting.

All pure Column expressions (JVM-side, codegen'd): at 100 TB these are
narrow per-document transforms with zero shuffle.  Each operator has a
SQL twin generated from the SAME constants (word lists, regexes) so the
DuckDB oracle can't drift from the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# whitespace tokens vs a BPE-ish segmentation (letters / digits /
# single punctuation marks), shared by Spark + SQL twins
WS_TOKEN_RE = r"\s+"
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

PUNCT_RE = "[^A-Za-z0-9\\s]"
ALPHA_RE = "[A-Za-z]"

# tiny marker-word lists for the n-gram/stopword language heuristic;
# ties break by list order (en > de > fr > es > zh)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "a"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "los", "las", "y", "es", "un"],
    "zh": ["de", "shi", "le", "zai", "he", "you"],
}

STOPWORDS = LANG_MARKERS["en"]


def ws_tokens(text: Column) -> Column:
    """Whitespace tokens with empties dropped (split on ``\\s+`` leaves
    a leading/trailing '' for padded text)."""
    return F.filter(F.split(text, WS_TOKEN_RE), lambda t: t != "")


def token_counts(text: Column) -> dict[str, Column]:
    return {
        "n_ws_tokens": F.size(ws_tokens(text)).cast("bigint"),
        # idx=0: whole-match extraction (the pattern has no groups)
        "n_bpe_tokens": F.size(
            F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))
        ).cast("bigint"),
    }


def quality_columns(text: Column) -> dict[str, Column]:
    """Length / punctuation / stopword heuristics (the standard cheap
    quality gates a pretraining pipeline runs before expensive stages)."""
    toks = ws_tokens(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), F.lit(0)))
    n_alpha = F.size(F.regexp_extract_all(text, F.lit(ALPHA_RE), F.lit(0)))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    nz = lambda c: F.greatest(c, F.lit(1))  # noqa: E731
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "mean_token_len": F.round(
            (n_chars - (n_tokens - 1)) / nz(n_tokens).cast("double"), 4
        ),
        "alpha_ratio": F.round(n_alpha / nz(n_chars).cast("double"), 4),
        "punct_ratio": F.round(n_punct / nz(n_chars).cast("double"), 4),
        "stopword_ratio": F.round(n_stop / nz(n_tokens).cast("double"), 4),
    }


def langid_column(text: Column) -> Column:
    """Marker-word language ID: score each language by marker hits over
    the lowercased token set, argmax with deterministic tie order."""
    toks = F.transform(ws_tokens(text), F.lower)

    def contains(words: list[str]):
        # single-param lambda: a 2-arg lambda would be treated as the
        # (element, index) form by higher-order filter()
        return lambda t: t.isin(list(words))

    scores = {
        lang: F.size(F.filter(toks, contains(words)))
        for lang, words in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            # strictly greater than every EARLIER lang (tie → earlier wins),
            # greater-or-equal than every LATER lang
            c = (
                scores[lang] > scores[other]
                if langs.index(other) < langs.index(lang)
                else scores[lang] >= scores[other]
            )
            cond = c if cond is None else (cond & c)
        best = (
            F.when(cond, F.lit(lang)) if best is None else best.when(cond, F.lit(lang))
        )
    return best.otherwise(F.lit(langs[0]))


def fingerprint_column(text: Column) -> Column:
    """Document fingerprint: md5 over the casefolded, punctuation-
    stripped, whitespace-collapsed text — robust to formatting noise,
    byte-identical across engines."""
    normalized = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), PUNCT_RE, ""), WS_TOKEN_RE, " "
        )
    )
    return F.md5(normalized)


# --- SQL twins (DuckDB) generated from the same constants -----------------
def langid_sql(text_expr: str = "text") -> str:
    toks = f"list_transform(list_filter(string_split_regex({text_expr}, '\\s+'), x -> x <> ''), x -> lower(x))"
    score = lambda words: (  # noqa: E731
        f"len(list_filter({toks}, x -> x IN ({', '.join(repr(w) for w in words)})))"
    )
    langs = list(LANG_MARKERS)
    branches = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">" if langs.index(other) < langs.index(lang) else ">="
            conds.append(f"{score(LANG_MARKERS[lang])} {op} {score(LANG_MARKERS[other])}")
        branches.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[0]}' END"


def quality_sql(text_expr: str = "text") -> dict[str, str]:
    toks = f"list_filter(string_split_regex({text_expr}, '\\s+'), x -> x <> '')"
    stop_in = ", ".join(repr(w) for w in STOPWORDS)
    return {
        "n_chars": f"CAST(length({text_expr}) AS BIGINT)",
        "n_tokens": f"CAST(len({toks}) AS BIGINT)",
        "mean_token_len": (
            f"round((length({text_expr}) - (len({toks}) - 1)) * 1.0 / "
            f"greatest(len({toks}), 1), 4)"
        ),
        "alpha_ratio": (
            f"round(len(regexp_extract_all({text_expr}, '[A-Za-z]')) * 1.0 / "
            f"greatest(length({text_expr}), 1), 4)"
        ),
        "punct_ratio": (
            f"round(len(regexp_extract_all({text_expr}, '[^A-Za-z0-9\\s]')) * 1.0 / "
            f"greatest(length({text_expr}), 1), 4)"
        ),
        "stopword_ratio": (
            f"round(len(list_filter({toks}, x -> lower(x) IN ({stop_in}))) * 1.0 / "
            f"greatest(len({toks}), 1), 4)"
        ),
    }


# --- quality gate (composed keep/reject decision) --------------------------
#: (reason, metric, op, threshold) — evaluated IN ORDER; the first
#: failing rule names the rejection.  One spec drives both the Column
#: chain and the SQL twin, so the engines cannot drift.
QUALITY_GATE_RULES: list[tuple[str, str, str, float]] = [
    ("too_short", "n_tokens", "<", 20),
    ("too_long", "n_tokens", ">", 85),
    ("low_alpha", "alpha_ratio", "<", 0.5),
    ("high_punct", "punct_ratio", ">", 0.2),
]


def quality_gate(text: Column) -> dict[str, Column]:
    """Keep/reject decision with the first failing rule as the reason —
    the gate a pretraining pipeline runs between cheap metrics and
    expensive dedup.  Ordered ``when`` chain: Catalyst guarantees
    evaluation order, mirroring first-match-wins rule semantics."""
    q = quality_columns(text)
    reason = None
    for name, metric, op, thr in QUALITY_GATE_RULES:
        cond = q[metric] < thr if op == "<" else q[metric] > thr
        reason = (
            F.when(cond, F.lit(name)) if reason is None else reason.when(cond, name)
        )
    reason = reason.otherwise(F.lit(None).cast("string"))
    return {"keep": reason.isNull(), "reject_reason": reason}


def quality_gate_sql(text_expr: str = "text") -> dict[str, str]:
    """DuckDB twin of quality_gate, generated from the same rule spec."""
    q = quality_sql(text_expr)
    branches = " ".join(
        f"WHEN {q[metric]} {op} {thr} THEN '{name}'"
        for name, metric, op, thr in QUALITY_GATE_RULES
    )
    reason = f"CASE {branches} ELSE NULL END"
    return {"keep": f"({reason}) IS NULL", "reject_reason": reason}


def tfidf_topk(
    df,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Per-document top-``k`` terms by smoothed TF-IDF — the standard
    keyword-extraction / topic-fingerprint pass of a curation pipeline.

    Definitions (sklearn's smooth variant, deterministic):
      tf(t, d)  = occurrences of lowercased whitespace token t in d
      idf(t)    = ln((N + 1) / (df(t) + 1)) + 1, N = corpus doc count
      score     = round(tf · idf, 6)
    Top-k per doc by (score desc, term asc) — fully tie-broken.

    Scale shape: two token-keyed hash aggregations (per-doc tf, corpus
    df) and one join tf⋈df on the term.  Stopword terms make that join
    key skewed, but the build side is ONE row per term so the hot
    partition's work is linear in its tf rows (AQE skew-split applies);
    the corpus size N is a broadcast 1-row aggregate, and the top-k
    rank windows on doc_id — uniform.  No Python anywhere.
    """
    toks = F.transform(ws_tokens(F.col(text_col)), F.lower)
    tokens = df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
    tf = tokens.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("__n"))
    from pyspark.sql.window import Window as _W

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("__n") + 1).cast("double") / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
        .drop("__n")
    )
    w = _W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .select("doc_id", "term", "tf", "df", "score")
    )


def tfidf_topk_sql(k: int = 5, text_expr: str = "text") -> str:
    """DuckDB twin of :func:`tfidf_topk` over the ``documents`` view —
    identical tokenization, idf formula, arithmetic order, rounding,
    and tie-break."""
    toks = (
        f"list_transform(list_filter(string_split_regex({text_expr}, '\\s+'),"
        f" x -> x <> ''), x -> lower(x))"
    )
    return f"""
    WITH t AS (
      SELECT doc_id, unnest({toks}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             round(tf.tf * (ln(CAST(n.n_docs + 1 AS DOUBLE) / (dfreq.df + 1)) + 1.0), 6) AS score
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score
    FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term ASC) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


# ---------------------------------------------------------------- round 8:
# URL canonicalization (CommonCrawl-style URL dedup key).

#: query params dropped before comparison — tracking/session noise that
#: makes byte-identical pages look distinct (the classic CC dedup trap).
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref|sessionid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute URL for exact URL-level dedup —
    the first dedup pass of a web-crawl pipeline (cheaper than any
    content hash: no document bytes touched, just the key column).

    Steps (each a JVM regexp/string expression, RE2-compatible so the
    DuckDB twin below replays them verbatim):

    - trim, drop the ``#fragment``;
    - lowercase scheme and authority (path/query stay case-sensitive —
      ``/Page`` and ``/page`` are different resources);
    - strip a leading ``www.`` and the scheme's default port
      (``:80`` http, ``:443`` https);
    - collapse ``//`` runs in the path, drop a trailing slash
      (``/a/b/`` ≡ ``/a/b``; bare authority keeps no slash);
    - drop tracking params (``utm_*``, ``gclid``, ``fbclid``, ``ref``,
      ``sessionid``), then SORT the survivors — param order is
      transport noise.

    Malformed input (no ``scheme://``) passes through trimmed and
    de-fragmented only, never null — a dedup key must be total.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    auth = F.lower(F.regexp_extract(rest, r"^([^/?]*)", 1))
    auth = F.regexp_replace(auth, r"^www\.", "")
    auth = F.when(scheme == "http", F.regexp_replace(auth, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(auth, r":443$", "")).otherwise(auth)
    )
    pathq = F.regexp_replace(rest, r"^[^/?]*", "")
    path = F.regexp_replace(pathq, r"\?.*$", "")
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    q = F.regexp_extract(pathq, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda kv: (kv != "") & ~kv.rlike(_TRACKING_PARAM_RE),
        )
    )
    qs = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        auth,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)


def canonicalize_url_sql(url_expr: str = "url") -> str:
    """DuckDB twin of :func:`canonicalize_url` — the same RE2 regexp
    chain, step for step, so the oracle verifies the canonicalization
    semantics (not just the dedup arithmetic)."""
    u = f"regexp_replace(trim({url_expr}), '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.\\-]*://', '')"
    auth0 = f"regexp_replace(lower(regexp_extract({rest}, '^([^/?]*)', 1)), '^www\\.', '')"
    auth = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({auth0}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({auth0}, ':443$', '') "
        f"ELSE {auth0} END"
    )
    pathq = f"regexp_replace({rest}, '^[^/?]*', '')"
    path = (
        f"regexp_replace(regexp_replace(regexp_replace({pathq}, '\\?.*$', ''),"
        f" '/{{2,}}', '/', 'g'), '/$', '')"
    )
    q = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    qs = (
        f"array_to_string(list_sort(list_filter(string_split({q}, '&'),"
        f" x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_PARAM_RE}'))), '&')"
    )
    return (
        f"CASE WHEN {scheme} = '' THEN {u} ELSE "
        f"{scheme} || '://' || {auth} || {path} || "
        f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END END"
    )


# ---------------------------------------------------------------- round 8:
# Gopher repetition/format rules (Rae et al. 2021, §A1.1 — the public
# line-based quality filters; complements quality_columns' char/token
# heuristics with the LINE-level signals they can't see).

#: symbols whose density flags boilerplate/markup (Gopher: "#" and
#: ellipsis vs words).
_GOPHER_SYMBOL_RE = r"(#|\.\.\.|…)"
_GOPHER_BULLET_RE = r"^\s*([-*•‣▪]|\d+[.)])\s"
_GOPHER_ELLIPSIS_RE = r"(\.\.\.|…)\s*$"


def gopher_columns(text: Column) -> dict[str, Column]:
    """Line- and word-level Gopher quality metrics, all JVM array/regexp
    expressions over one ``split('\\n')`` — no shuffle, no Python:

    - ``bullet_line_ratio`` / ``ellipsis_line_ratio``: fraction of
      lines starting with a bullet / ending with an ellipsis;
    - ``dup_line_ratio``: 1 − distinct/total lines (the cheap exact
      form of Gopher's duplicate-line filter);
    - ``symbol_word_ratio``: ``#``/ellipsis occurrences per word;
    - ``alpha_word_ratio``: fraction of words containing at least one
      alphabetic character.
    """
    lines = F.filter(F.split(text, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    toks = ws_tokens(text)
    n_words = F.size(toks)
    nz = lambda c: F.greatest(c, F.lit(1)).cast("double")  # noqa: E731
    n_bullet = F.size(F.filter(lines, lambda ln: ln.rlike(_GOPHER_BULLET_RE)))
    n_ellip = F.size(F.filter(lines, lambda ln: ln.rlike(_GOPHER_ELLIPSIS_RE)))
    n_sym = F.size(F.regexp_extract_all(text, F.lit(_GOPHER_SYMBOL_RE), F.lit(0)))
    n_alpha_w = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return {
        "n_lines": n_lines.cast("bigint"),
        "bullet_line_ratio": F.round(n_bullet / nz(n_lines), 4),
        "ellipsis_line_ratio": F.round(n_ellip / nz(n_lines), 4),
        "dup_line_ratio": F.round(
            (n_lines - F.size(F.array_distinct(lines))) / nz(n_lines), 4
        ),
        "symbol_word_ratio": F.round(n_sym / nz(n_words), 4),
        "alpha_word_ratio": F.round(n_alpha_w / nz(n_words), 4),
    }


def gopher_sql(text_expr: str = "text") -> dict[str, str]:
    """DuckDB twin of :func:`gopher_columns` (same RE2 patterns)."""
    lines = (
        f"list_filter(string_split({text_expr}, chr(10)), ln -> trim(ln) <> '')"
    )
    toks = f"list_filter(string_split_regex({text_expr}, '\\s+'), t -> t <> '')"
    n_lines = f"len({lines})"
    n_words = f"len({toks})"
    nz = lambda c: f"CAST(greatest({c}, 1) AS DOUBLE)"  # noqa: E731
    n_bullet = (
        f"len(list_filter({lines}, ln -> regexp_matches(ln, '{_GOPHER_BULLET_RE}')))"
    )
    n_ellip = (
        f"len(list_filter({lines}, ln -> regexp_matches(ln, '{_GOPHER_ELLIPSIS_RE}')))"
    )
    n_sym = f"len(regexp_extract_all({text_expr}, '{_GOPHER_SYMBOL_RE}'))"
    n_alpha_w = f"len(list_filter({toks}, t -> regexp_matches(t, '[A-Za-z]')))"
    return {
        "n_lines": f"CAST({n_lines} AS BIGINT)",
        "bullet_line_ratio": f"round({n_bullet} / {nz(n_lines)}, 4)",
        "ellipsis_line_ratio": f"round({n_ellip} / {nz(n_lines)}, 4)",
        "dup_line_ratio": (
            f"round(({n_lines} - len(list_distinct({lines}))) / {nz(n_lines)}, 4)"
        ),
        "symbol_word_ratio": f"round({n_sym} / {nz(n_words)}, 4)",
        "alpha_word_ratio": f"round({n_alpha_w} / {nz(n_words)}, 4)",
    }


def c4_clean_lines(
    text: Column, min_words: int = 5
) -> dict[str, Column]:
    """C4's line-level cleanup (Raffel et al. 2020 §2.2) as pure
    column expressions — the CLEANING counterpart of the Gopher
    FILTERS above: instead of scoring the document, rewrite it.

    Per line, keep only lines that
      - end in terminal punctuation (. ! ? or a closing quote after
        one),
      - have at least ``min_words`` whitespace words,
      - don't contain "lorem ipsum" or the word "javascript"
        (case-insensitive), and
      - don't contain a curly brace (code);
    then drop EXACT duplicate lines within the document, keeping the
    first occurrence (C4 dedups three-sentence spans across the corpus
    — that pass is dedup_passage/drop_duplicated_passages; this is the
    in-document rule).

    Returns ``clean_text`` plus audit columns.  Everything is
    scan-local array algebra (split → filter → first-occurrence filter
    → rejoin): zero shuffles, zero Python; the within-doc
    first-occurrence dedup is ``array_position(l, x) == index`` —
    order-preserving, unlike a sort-based distinct.
    """
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda ln: (
            ln.rlike('[.!?]["”’]?\\s*$')
            & (F.size(ws_tokens(ln)) >= min_words)
            & ~F.lower(ln).contains("lorem ipsum")
            & ~F.lower(ln).rlike("\\bjavascript\\b")
            & ~ln.contains("{")
            & ~ln.contains("}")
        ),
    )
    deduped = F.filter(
        kept,
        lambda ln, i: F.array_position(kept, ln) == i + F.lit(1),
    )
    return {
        "clean_text": F.array_join(deduped, "\n"),
        "n_lines": F.size(lines).cast("bigint"),
        "n_kept_lines": F.size(deduped).cast("bigint"),
        "n_dropped_rule": (F.size(lines) - F.size(kept)).cast("bigint"),
        "n_dropped_dup": (F.size(kept) - F.size(deduped)).cast("bigint"),
    }


def c4_clean_lines_sql(
    text_expr: str = "text", min_words: int = 5
) -> dict[str, str]:
    """DuckDB twin of :func:`c4_clean_lines`, generated from the same
    rule spec so the line predicates, first-occurrence dedup, and
    rejoin match operation for operation."""
    lines = f"string_split({text_expr}, chr(10))"
    pred = (
        "regexp_matches(ln, '[.!?][\"”’]?\\s*$') "
        "AND len(list_filter(string_split_regex(ln, '\\s+'), "
        f"w -> w <> '')) >= {min_words} "
        "AND NOT contains(lower(ln), 'lorem ipsum') "
        "AND NOT regexp_matches(lower(ln), '\\bjavascript\\b') "
        "AND NOT contains(ln, '{') AND NOT contains(ln, '}')"
    )
    kept = f"list_filter({lines}, ln -> {pred})"
    dedup = (
        f"list_filter({kept}, (ln, i) -> list_position({kept}, ln) = i)"
    )
    return {
        # COALESCE: DuckDB's array_to_string yields NULL for an empty
        # list where Spark's array_join yields ''
        "clean_text": f"COALESCE(array_to_string({dedup}, chr(10)), '')",
        "n_lines": f"CAST(len({lines}) AS BIGINT)",
        "n_kept_lines": f"CAST(len({dedup}) AS BIGINT)",
        "n_dropped_rule": f"CAST(len({lines}) - len({kept}) AS BIGINT)",
        "n_dropped_dup": f"CAST(len({kept}) - len({dedup}) AS BIGINT)",
    }
