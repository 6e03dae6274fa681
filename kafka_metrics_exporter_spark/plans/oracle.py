"""Order-insensitive result comparison used by tools/check_oracle.py and
tests — mirrors the driver's row-count + column-set + value-hash gate."""

from __future__ import annotations

import hashlib

import pandas as pd

DUCKDB_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, stringify objects, round floats, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif "float" in str(df[c].dtype):
            df[c] = df[c].round(4)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> str:
    body = df.to_csv(index=False, float_format="%.4f").encode()
    return hashlib.sha256(body).hexdigest()[:16]


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of discrepancies (empty = match)."""
    s, o = canon(spark_pdf), canon(oracle_pdf)
    problems: list[str] = []
    if len(s) != len(o):
        problems.append(f"rows {len(s)} vs {len(o)}")
    if list(s.columns) != list(o.columns):
        problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
    elif len(s) == len(o) and value_hash(s) != value_hash(o):
        problems.append("value-hash mismatch")
        diffs = s.compare(o)
        if not diffs.empty:
            problems.append(f"first diffs:\n{diffs.head(5)}")
    return problems


def register_views(con, sf_dir: str) -> None:
    for t in DUCKDB_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
