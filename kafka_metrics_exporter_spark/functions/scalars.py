"""Scalar Column function pack (SURVEY §2.8) — the reusable string/URL/
ObjectName helpers shared by the normalizer, sources, and query suite.
All JVM-side expressions (codegen'd; no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/?#]+)"


def host_from_url(url: Column) -> Column:
    """`host:port` netloc from a URL (P8; reference Code/JMXScraper.py:122-124).
    Regexp instead of parse_url: Jolokia read paths contain `:*` which
    java.net.URI refuses to parse a port out of."""
    return F.regexp_extract(url, _NETLOC_RE, 1)


def url_normalize_col(url: Column) -> Column:
    """P9 (reference Code/main.py:199): default the scheme to http,
    collapse duplicate slashes outside the scheme separator."""
    with_scheme = F.when(url.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), url).otherwise(
        F.concat(F.lit("http://"), url)
    )
    return F.regexp_replace(with_scheme, r"(?<!:)/{2,}", "/")


def objectname_domain(mbean: Column) -> Column:
    """ObjectName domain — text before the first ':' (P1;
    reference Code/JMXScraper.py:100); null when there is no ':'."""
    return F.when(F.instr(mbean, ":") > 0, F.substring_index(mbean, ":", 1))


def objectname_props(mbean: Column) -> Column:
    """ObjectName key-properties as map<string,string> in original order
    (P1; reference Code/JMXScraper.py:101,113-115); empty map when there
    is no ':' (reference :107-112 no-colon edge)."""
    props_str = F.substr(mbean, F.instr(mbean, ":") + 1)
    return F.when(
        F.instr(mbean, ":") > 0,
        F.str_to_map(props_str, F.lit(","), F.lit("=")),
    ).otherwise(F.create_map().cast("map<string,string>"))


def _chars(s: Column) -> Column:
    """``'abc'`` → ``['a','b','c']`` without relying on split-by-empty
    edge semantics: explicit 1-based substring over a sequence."""
    return F.transform(
        F.sequence(F.lit(1), F.length(s)), lambda i: s.substr(i, F.lit(1))
    )


def osa_distance(a: Column, b: Column) -> Column:
    """Optimal-string-alignment (restricted Damerau-Levenshtein)
    distance: Levenshtein edits plus adjacent-character transposition
    as a single edit, with no substring edited twice — the metric
    Lucene's fuzzy automata implement (Schulz & Mihov 2002), i.e. what
    Elasticsearch fuzzy ``~N`` means.  ``'ab'→'ba'`` is 1 here, 2 in
    plain Levenshtein; unlike UNRESTRICTED Damerau-Levenshtein
    (DuckDB's ``damerau_levenshtein``) an edit may not land inside a
    transposed pair, so ``'ca'→'abc'`` is 3 here but 2 there.

    Pure column algebra: the classic three-row DP runs as a nested
    JVM-side fold — ``aggregate`` over the characters of ``a``
    carrying the previous two DP rows, an inner ``aggregate`` over
    positions of ``b`` building each row left-to-right — so the whole
    expression stays inside Catalyst (no Python, no UDF).  Cost is
    O(|a|·|b|) interpreted expression steps per row: intended for
    short keyword values (fuzzy probes are user-typed terms and the
    engine caps fuzzy at 2 edits like Lucene; callers pre-filter with
    a length-difference guard and a thresholded ``levenshtein``
    short-circuit, so the fold only runs on near-miss rows).

    NULL in either side propagates to NULL, like ``levenshtein``.
    """
    ach, bch = _chars(a), _chars(b)
    n, m = F.length(a), F.length(b)
    row0 = F.sequence(F.lit(0), m)  # DP row for i=0: [0, 1, .., m]
    big = F.lit(2147483647)  # +inf sentinel; never added to

    def step(acc: Column, ac: Column) -> Column:
        i = acc["i"] + F.lit(1)
        newrow = F.aggregate(
            F.sequence(F.lit(1), m),  # m >= 1 guaranteed by outer guard
            F.array(i),
            lambda r, j: F.concat(
                r,
                F.array(
                    F.least(
                        # deletion of a[i] / insertion of b[j] /
                        # match-or-substitute (element_at is 1-based;
                        # DP index j maps to element j+1 of the row)
                        F.element_at(acc["p"], j + F.lit(1)) + F.lit(1),
                        F.element_at(r, F.lit(-1)) + F.lit(1),
                        F.element_at(acc["p"], j)
                        + F.when(ac == F.element_at(bch, j), F.lit(0)).otherwise(
                            F.lit(1)
                        ),
                        # adjacent transposition: a[i-1..i] == b[j], b[j-1]
                        # reversed; guarded so element_at never sees an
                        # out-of-range index under ANSI
                        F.when(
                            (i >= F.lit(2))
                            & (j >= F.lit(2))
                            & (ac == F.element_at(bch, j - F.lit(1)))
                            & (
                                F.element_at(ach, i - F.lit(1))
                                == F.element_at(bch, j)
                            ),
                            F.element_at(acc["pp"], j - F.lit(1)) + F.lit(1),
                        ).otherwise(big),
                    )
                ),
            ),
        )
        return F.struct(
            acc["p"].alias("pp"), newrow.alias("p"), i.alias("i")
        )

    folded = F.aggregate(
        ach,
        F.struct(row0.alias("pp"), row0.alias("p"), F.lit(0).alias("i")),
        step,
        lambda acc: F.element_at(acc["p"], m + F.lit(1)),
    )
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
        .when(n == F.lit(0), m)
        .when(m == F.lit(0), n)
        .otherwise(folded)
    )
