"""Synthesize the sf1 scale-attestation tables (round 15): 10 replicas
of /root/testdata/sf0.1 with per-replica key offsets so id/user
cardinality scales with volume, replica-suffixed document text so
dedup rows see scaled-but-similar duplicate structure (not 10x exact
copies), and per-vector deterministic embedding offsets that break
exact cross-replica duplicates while keeping the cluster geometry.
TPC-H side tables are copied as-is (the attestation rows read
events/documents/embeddings).

Usage: python tools/make_scale_data.py [dst_dir]   (default .scale/sf1)
Then:  SPARK_GRAFT_SF_DIR=<dst> python bench.py <rows...>
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.1"


def main() -> None:
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".scale", "sf1"
    )
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
    COPY (
      SELECT e.event_id + r.k * 100000000 AS event_id, e.ts,
             e.user_id + r.k * 1500 AS user_id, e.event_type,
             e.value, e.props
      FROM read_parquet('{SRC}/events.parquet') e, range(10) r(k)
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT d.doc_id + r.k * 10000000 AS doc_id,
             CASE WHEN r.k = 0 THEN d.text
                  ELSE d.text || ' replica ' || r.k || ' of '
                       || d.doc_id END AS text,
             d.lang, d.source,
             CAST(length(CASE WHEN r.k = 0 THEN d.text
                  ELSE d.text || ' replica ' || r.k || ' of '
                       || d.doc_id END) AS BIGINT) AS n_chars
      FROM read_parquet('{SRC}/documents.parquet') d, range(10) r(k)
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)
    """)
    con.execute(f"""
    COPY (
      SELECT e.vec_id + r.k * 10000000 AS vec_id,
             CASE WHEN r.k = 0 THEN e.embedding
                  ELSE list_transform(e.embedding,
                    x -> CAST(x + ((e.vec_id % 17) - 8) * 0.02
                                + r.k * 0.003 AS FLOAT)) END AS embedding,
             e.label
      FROM read_parquet('{SRC}/embeddings.parquet') e, range(10) r(k)
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)
    """)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    print(f"wrote sf1 attestation tables to {dst}")


if __name__ == "__main__":
    main()
