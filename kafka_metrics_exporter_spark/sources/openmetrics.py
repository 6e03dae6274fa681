"""Prometheus exposition-format / OpenMetrics text source and sink
(round 7).

The reference's metrics ultimately surface through a Prometheus
exposition endpoint (the jmx_exporter configs under
Prometheus/jmxexporter_configs feed one); scraped dumps and
remote-storage exports of that format are a natural lake format for
this engine.  This module parses and serializes the text format —
``name{label="value",…} <value> [<timestamp_ms>]`` — ENTIRELY
JVM-side, so a 100 TB directory of scrape files decodes inside
whole-stage codegen with zero Python in the hot path:

- **Labels** are extracted with ``regexp_extract_all`` over the label
  block using a quote-aware pattern (``ident="(?:\\.|[^"\\])*"``), so
  commas and ``=`` INSIDE quoted values can't split a pair — the
  failure mode of str_to_map-style parsers.  Keys and values come from
  the same match list (two group indexes), so ``map_from_arrays``
  aligns them by construction.
- **Escapes** (``\\\\``, ``\\"``, ``\\n`` — the full set the format
  defines) are decoded with an ordered ``regexp_replace`` chain via a
  NUL sentinel (escaped-backslash first, so ``\\\\n`` round-trips as
  backslash+n, not newline).
- **Values** use Java's round-trippable double formatting both ways;
  ``+Inf``/``-Inf``/``NaN`` are mapped explicitly (Spark's cast
  renders ``Infinity``, which Prometheus's parser would reject).
- Comment/metadata lines (``# HELP``, ``# TYPE``, ``# EOF``) and
  blanks are filtered; a malformed sample line becomes a NULL name and
  is dropped (use ``strict=True`` to keep a ``_corrupt`` column for
  auditing instead).
- **Timestamps** accept both dialects (ADVICE r7): integer or float
  tokens, decoded per ``timestamp_unit`` — ``"ms"`` (Prometheus text
  format, the default) or ``"s"`` (OpenMetrics float seconds).
  OpenMetrics **exemplar** suffixes (``# {trace_id="…"} 0.67 [ts]``)
  are stripped rather than rejecting the line, and their labelsets
  stay out of the sample's ``labels`` map.

``parse_exposition`` takes any one-string-column DataFrame (e.g.
``spark.read.text(dir)`` — file-partitioned, so parsing parallelizes
with the input split count) and yields
``(name, labels map<string,string>, ts timestamp, value double)``;
``exposition_lines`` is the inverse.  ``labels_to_columns`` pivots the
map onto fixed label columns for the engine's series schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one sample line: name [{labels}] value [timestamp] [# {exemplar} …]
# (?s): label values may legally carry RAW line terminators other than
# \n (\r, U+2028, …) — the format only escapes \\ \" \n — and Java's
# `.` excludes terminators by default, which would reject the line.
# The timestamp accepts integers AND floats (ADVICE r7: Prometheus
# text format uses integer ms, OpenMetrics-proper float seconds — the
# old integer-only group silently dropped every OpenMetrics-timestamped
# line); the units are the caller's ``timestamp_unit``.  An OpenMetrics
# exemplar suffix (``# {trace_id="…"} 0.67 [ts]``) is matched and
# DISCARDED — the label block is non-greedy so the exemplar's labelset
# can't bleed into group 2.
_LINE_RE = (
    r"(?s)^([a-zA-Z_:][a-zA-Z0-9_:]*)"  # 1: metric name
    # 2: label block — quote-aware (bare chars or quoted strings), so a
    # ``}`` INSIDE a quoted value doesn't close the block and the
    # block's real closing brace stops BEFORE an exemplar's ``{``
    r'(?:\{((?:[^"{}]|"(?:\\.|[^"\\])*")*)\})?'
    r"\s+([^\s#]+)"  # 3: value (never contains '#')
    r"(?:\s+(-?\d+(?:\.\d+)?))?"  # 4: optional timestamp (int or float)
    r"(?:\s+#\s+\{.*)?"  # exemplar suffix: stripped
    r"\s*$"
)
_PAIR_RE = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:\\.|[^"\\])*)"'
_SENTINEL = "\x00"


def _unescape(col: Column) -> Column:
    """``\\\\`` → ``\\``, ``\\"`` → ``"``, ``\\n`` → newline — decoded
    through a sentinel so an escaped backslash never re-combines with a
    following character (``\\\\n`` must yield backslash+n).

    Every pattern is a LITERAL string, so this is plain ``replace``
    (StringReplace), not ``regexp_replace`` (optimization r16, guide
    §1.2 per-task work: the regex engine priced every label value of
    every line; literal replace is a substring scan).  Replacement
    order and left-to-right non-overlapping semantics are identical."""
    c = F.replace(col, F.lit("\\\\"), F.lit(_SENTINEL))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    return F.replace(c, F.lit(_SENTINEL), F.lit("\\"))


def _escape(col: Column) -> Column:
    # literal-pattern replace, same rationale as _unescape
    c = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    return F.replace(c, F.lit("\n"), F.lit("\\n"))


def _parse_value(v: Column) -> Column:
    """Prometheus value tokens: decimal/scientific doubles plus
    ``+Inf``/``-Inf``/``Inf``/``NaN`` (case-insensitive)."""
    lower = F.lower(v)
    return (
        F.when(lower.isin("+inf", "inf"), F.lit(float("inf")))
        .when(lower == "-inf", F.lit(float("-inf")))
        .when(lower == "nan", F.lit(float("nan")))
        # try_cast: a malformed token becomes NULL (flagged/dropped by
        # the caller) instead of an ANSI-mode cast error killing the job
        .otherwise(v.try_cast("double"))
    )


def _format_value(v: Column) -> Column:
    return (
        F.when(F.isnan(v), F.lit("NaN"))
        .when(v == float("inf"), F.lit("+Inf"))
        .when(v == float("-inf"), F.lit("-Inf"))
        .otherwise(v.cast("string"))
    )


def parse_exposition(
    lines: DataFrame,
    column: str = "value",
    default_ts=None,
    strict: bool = False,
    timestamp_unit: str = "ms",
) -> DataFrame:
    """Exposition text lines → ``(name, labels, ts, value)``.

    ``default_ts`` (a Column, datetime, or ISO string) fills samples
    that carry no timestamp — the common scrape-dump case where the
    scrape time lives in the file path or a sidecar (pass e.g.
    ``F.col("scrape_ts")`` after attaching it from
    ``input_file_name()``).  Without it, timestamp-less samples get a
    NULL ts.  ``strict=True`` keeps malformed sample lines in a
    ``_corrupt`` column instead of dropping them.

    ``timestamp_unit`` (ADVICE r7): the two text formats disagree —
    Prometheus exposition timestamps are **milliseconds** (``"ms"``,
    the default, matching :func:`exposition_lines`), OpenMetrics-proper
    are **float seconds** (``"s"``).  Either unit accepts integer AND
    fractional tokens (decoded at microsecond precision — exact
    through year ~2250 within double's 53-bit mantissa).  OpenMetrics
    exemplar suffixes (``# {trace_id="…"} 0.67``) are recognized and
    stripped; their labelsets never reach the ``labels`` map."""
    scale = {"ms": 1_000, "s": 1_000_000}
    if timestamp_unit not in scale:
        raise ValueError(
            f"timestamp_unit must be 'ms' or 's', got {timestamp_unit!r}"
        )
    line = F.trim(F.col(column))
    # Evaluate-once barrier (optimization r16, guide §7.2 duplicated
    # subtrees): ``shuffle`` of a singleton array is the identity on
    # values but NON-DETERMINISTIC to the optimizer, so CollapseProject
    # cannot inline the upstream line expression (for the roundtrip
    # path, the whole serializer) into every downstream consumer — the
    # filter + parse projections were re-evaluating it 3+ times per
    # row before this.
    body = lines.select(
        F.get(F.shuffle(F.array(line)), 0).alias("__line")
    ).filter(
        (F.length("__line") > 0) & ~F.col("__line").startswith("#")
    )
    # ONE evaluation of the (quote-aware, backtracking-priced) line
    # regex yields name+value+ts sentinel-joined, and a SECOND yields
    # the label block (which may legally contain anything, so it can't
    # ride the sentinel join).  The name/ts charsets ([a-zA-Z0-9_:],
    # digits) cannot contain the \x01 sentinel, but the value group
    # ([^\s#]) CAN — such lines split into more than three fields and
    # are rejected by the size(head)==3 guard below (ADVICE r9; before
    # that guard they parsed and were dropped at the value cast).
    # This replaces four per-group regexp_extract evaluations of the
    # same pattern (observed 1.68× on the roundtrip bench after the r8
    # quote-aware rewrite made each evaluation pricier).
    #
    # Match detection (code-review r9): the replacement is prefixed
    # with a \x02 marker, so a line the pattern does NOT match passes
    # through unchanged and fails `startswith(\x02)` — without the
    # marker, garbage input that already CONTAINS raw \x01 bytes could
    # split into three plausible fields and fabricate a sample.  A raw
    # line that itself starts with \x02 is rejected up front (a legal
    # sample line starts with a name character), closing the remaining
    # spoof: no accepted line can both carry the marker and have
    # bypassed the regex.
    replaced = F.regexp_replace("__line", _LINE_RE, "\x02$1\x01$3\x01$4")
    if default_ts is None:
        fill_ts = F.lit(None).cast("timestamp")
    elif isinstance(default_ts, Column):
        fill_ts = default_ts.cast("timestamp")
    else:
        fill_ts = F.lit(default_ts).cast("timestamp")

    def _once(expr: Column, f) -> Column:
        # lambda-bind: evaluate ``expr`` once per row, reference it as
        # a variable leaf (optimization r16 — the head/replaced/block
        # expressions were inlined into every consumer, re-running the
        # backtracking-priced line regex ~10x per row; now each regex
        # evaluates exactly once)
        return F.get(F.transform(F.array(expr), f), 0)

    def _fields(rep: Column) -> Column:
        matched = rep.startswith("\x02") & ~F.col("__line").startswith(
            "\x02"
        )

        def _with_head(head: Column) -> Column:
            raw_name = F.get(head, 0)
            name = F.when(
                matched
                & (F.size(head) == 3)
                & raw_name.rlike("^[a-zA-Z_:][a-zA-Z0-9_:]*$"),
                raw_name,
            )
            raw_val = F.coalesce(F.get(head, 1), F.lit(""))
            raw_ts = F.coalesce(F.get(head, 2), F.lit(""))

            def _with_block(block: Column) -> Column:
                return F.struct(
                    F.when(name != "", name).alias("name"),
                    # pairs come from the captured label BLOCK, not the
                    # whole line: an exemplar's labelset must not bleed
                    # into the sample's map
                    F.map_from_arrays(
                        F.regexp_extract_all(block, F.lit(_PAIR_RE), 1),
                        F.transform(
                            F.regexp_extract_all(block, F.lit(_PAIR_RE), 2),
                            _unescape,
                        ),
                    ).alias("labels"),
                    F.when(
                        raw_ts != "",
                        F.timestamp_micros(
                            # round, don't truncate: 0.123s is inexact
                            # in binary, and truncation would turn
                            # …123000µs into …122999µs
                            F.round(
                                raw_ts.try_cast("double")
                                * scale[timestamp_unit]
                            ).cast("long")
                        ),
                    )
                    .otherwise(fill_ts)
                    .alias("ts"),
                    _parse_value(raw_val).alias("value"),
                )

            return _once(
                F.regexp_extract("__line", _LINE_RE, 2), _with_block
            )

        return _once(F.split(F.substr(rep, F.lit(2)), "\x01"), _with_head)

    # second evaluate-once barrier: the parsed struct materializes once
    # per row; the field-extraction projection above it stays cheap
    # column references instead of N copies of the parse tree
    parsed = body.select(
        F.get(F.shuffle(F.array(_once(replaced, _fields))), 0).alias("__p"),
        F.col("__line"),
    ).select(
        F.col("__p.name").alias("name"),
        F.col("__p.labels").alias("labels"),
        F.col("__p.ts").alias("ts"),
        F.col("__p.value").alias("value"),
        F.col("__line"),
    )
    if strict:
        return parsed.select(
            "name",
            "labels",
            "ts",
            "value",
            F.when(F.col("name").isNull() | F.col("value").isNull(), F.col("__line"))
            .alias("_corrupt"),
        )
    return parsed.filter(
        F.col("name").isNotNull() & F.col("value").isNotNull()
    ).drop("__line")


def labels_to_columns(df: DataFrame, label_names: list[str]) -> DataFrame:
    """Pivot the ``labels`` map onto fixed columns (the engine's series
    schema); a missing label becomes the empty string, the engine's
    missing-label convention."""
    return df.select(
        "name",
        "ts",
        "value",
        *[
            F.coalesce(F.element_at("labels", n), F.lit("")).alias(n)
            for n in label_names
        ],
    )


def exposition_lines(
    df: DataFrame,
    label_cols: list[str] | None = None,
    include_timestamp: bool = True,
    timestamp_unit: str = "ms",
) -> DataFrame:
    """Series frame → one exposition line per sample (column
    ``value``), the inverse of :func:`parse_exposition`.  Labels come
    from ``label_cols`` (empty-string labels are omitted, mirroring the
    missing-label convention) or from a ``labels`` map column.
    ``timestamp_unit="ms"`` renders Prometheus integer milliseconds;
    ``"s"`` renders OpenMetrics float seconds (millisecond-precision
    plain decimal, never scientific notation)."""
    if timestamp_unit not in ("ms", "s"):
        raise ValueError(
            f"timestamp_unit must be 'ms' or 's', got {timestamp_unit!r}"
        )
    if label_cols is None:
        pairs = F.map_entries(F.col("labels"))
        rendered = F.array_join(
            F.transform(
                pairs,
                lambda e: F.concat(
                    e["key"], F.lit('="'), _escape(e["value"]), F.lit('"')
                ),
            ),
            ",",
        )
    else:
        parts = [
            F.when(
                F.col(c) != "",
                F.concat(F.lit(c + '="'), _escape(F.col(c)), F.lit('"')),
            )
            for c in label_cols
        ]
        rendered = F.array_join(F.array_compact(F.array(*parts)), ",")
    block = F.when(rendered != "", F.concat(F.lit("{"), rendered, F.lit("}"))).otherwise(
        F.lit("")
    )
    pieces = [F.col("name"), block, F.lit(" "), _format_value(F.col("value"))]
    if include_timestamp:
        ms = F.unix_millis(F.col("ts"))
        if timestamp_unit == "ms":
            ts_txt = ms.cast("string")
        else:
            # floor-consistent split so pre-epoch instants render
            # correctly: ms == sec*1000 + frac with frac in [0, 1000)
            sec = F.floor(ms / F.lit(1000.0)).cast("long")
            frac = F.pmod(ms, F.lit(1000)).cast("int")
            ts_txt = F.concat(
                sec.cast("string"),
                F.lit("."),
                F.lpad(frac.cast("string"), 3, "0"),
            )
        pieces += [
            F.when(
                F.col("ts").isNotNull(), F.concat(F.lit(" "), ts_txt)
            ).otherwise(F.lit(""))
        ]
    return df.select(F.concat(*pieces).alias("value"))
