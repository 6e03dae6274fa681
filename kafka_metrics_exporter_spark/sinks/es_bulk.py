"""Elasticsearch bulk sink (SURVEY §2.1 S6) as a foreachBatch writer.

The reference serializes each batch as ES bulk NDJSON
(``{"index":{"_type":"doc"}}\\n<doc>`` pairs) and bulk-POSTs into a
daily index ``kafka-jmx-logs-YYYY-MM-DD`` with retry ≤10
(reference Code/ElasticSearchAppender.py:85-112).

Here the NDJSON assembly is a distributed Column expression (grouped by
target index × hash chunk, so payload size per executor row is bounded
at any scale), and the bulk POST runs executor-side via
``foreachPartition`` through a pluggable I/O callback — tests exercise
the full pipeline with a capturing poster, and the parquet stand-in
writer partitions by ``date(created_ts)`` exactly like daily indexes
partition the reference's data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.operators.normalize import flat_json_column

INDEX_PREFIX = "kafka-jmx-logs-"  # reference Code/ElasticSearchAppender.py:109
_ACTION_LINE = '{"index":{"_type":"doc"}}'  # reference :88-91


def to_bulk_ndjson(metrics: DataFrame, n_chunks: int = 32) -> DataFrame:
    """metrics rows → one row per (daily index, chunk, NDJSON payload).

    The chunk column ``pmod(xxhash64(doc), n_chunks)`` splits each
    day's payload across ``n_chunks`` hash buckets, so no single
    executor row ever holds a whole day of NDJSON: per-payload bytes ≈
    day_bytes / n_chunks (the per-doc hash balances within a few
    percent).  Size n_chunks so that lands in the ES bulk sweet spot
    (5-15 MB per request); the groupBy shuffles only
    (index_name, chunk, doc) triples, all JVM-side.
    """
    docs = metrics.select(
        F.concat(F.lit(INDEX_PREFIX), F.date_format("created_ts", "yyyy-MM-dd")).alias(
            "index_name"
        ),
        flat_json_column().alias("doc"),
    )
    return docs.withColumn("chunk", F.pmod(F.xxhash64("doc"), F.lit(n_chunks))).groupBy(
        "index_name", "chunk"
    ).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.collect_list("doc"),
                lambda d: F.concat(F.lit(_ACTION_LINE + "\n"), d),
            ),
        ).alias("payload"),
        F.count(F.lit(1)).alias("n_docs"),
    )


def http_bulk_poster(es_url: str, timeout: float = 30.0, max_retries: int = 10):
    """POST one NDJSON payload to ``{es_url}/{index}/_bulk`` with the
    reference's retry policy (Code/ElasticSearchAppender.py:100-103)."""
    import time
    import urllib.request

    def post(index_name: str, payload: str) -> bool:
        body = (payload + "\n").encode("utf-8")
        req = urllib.request.Request(  # noqa: S310
            f"{es_url.rstrip('/')}/{index_name}/_bulk",
            data=body,
            headers={"Content-Type": "application/x-ndjson"},
            method="POST",
        )
        for attempt in range(max_retries):
            try:
                with urllib.request.urlopen(req, timeout=timeout):  # noqa: S310
                    return True
            except Exception:  # noqa: BLE001
                time.sleep(min(2**attempt * 0.1, 5.0))
        return False

    return post


def es_bulk_foreach_batch(
    poster: Callable[[str, str], bool],
    n_chunks: int = 32,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch hook: assemble chunked bulk payloads distributed and
    POST them from ``foreachPartition`` — the I/O happens executor-side,
    next to the data, and no payload ever crosses to the driver.  The
    poster callable is cloudpickled to the workers, so it must be
    self-contained (``http_bulk_poster`` is)."""

    def write(batch_df: DataFrame, batch_id: int) -> None:
        payloads = to_bulk_ndjson(batch_df, n_chunks=n_chunks)

        def _post_partition(rows) -> None:
            for row in rows:
                poster(row["index_name"], row["payload"])

        payloads.foreachPartition(_post_partition)

    return write


def write_daily_parquet(metrics: DataFrame, path: str) -> None:
    """Test/offline stand-in: parquet partitioned by event date — the
    same partition pruning a daily ES index gives Kibana queries."""
    (
        metrics.withColumn("event_date", F.date_format("created_ts", "yyyy-MM-dd"))
        .write.partitionBy("event_date")
        .mode("append")
        .parquet(path)
    )
