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
