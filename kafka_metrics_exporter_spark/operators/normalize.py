"""Normalization dataflow: raw Jolokia scrape envelope → canonical metrics.

Re-expresses, as pure Catalyst Column expressions (no Python UDFs), the
per-record normalization the reference performs imperatively:

- P4 HTTP/Jolokia status filter      (reference Code/JMXScraper.py:127-130)
- P5 exact-bean rewrap               (reference Code/JMXScraper.py:131-137)
- P1 ObjectName pivot                (reference Code/JMXScraper.py:99-106,113-115)
- P2 metadata injection              (reference Code/JMXScraper.py:96,104-110)
- P8 URL host projection             (reference Code/JMXScraper.py:26-47,122-124)
- P3 record serialization            (reference Code/JMXScraper.py:111,116)

Nested composite attribute values (JMX CompositeData such as
``HeapMemoryUsage``) stay as JSON strings inside ``attributes`` —
matching the reference, whose recursive flattener is dead code
(reference Code/ReusableCodes.py:16-22; consumers use dotted paths).
Extract them with ``get_json_object(attributes['HeapMemoryUsage'],
'$.used')``.

Everything here is a narrow (per-row) transformation: no shuffle is
introduced, so at 100 TB it scales linearly with input partitions and
stays inside one WholeStageCodegen span up to the ``explode``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.functions.scalars import (
    host_from_url as _host_name,
)
from kafka_metrics_exporter_spark.functions.scalars import (
    objectname_domain,
    objectname_props,
)
from kafka_metrics_exporter_spark.functions.scalars import (
    url_normalize_col as normalize_url,  # noqa: F401  (public re-export, P9)
)

_MAP_SS = "map<string,string>"


def normalize_scrapes(raw: DataFrame) -> DataFrame:
    """Raw scrape envelopes (schema.RAW_SCRAPE_SCHEMA) → metrics rows
    (schema.METRICS_SCHEMA).

    One Jolokia response body may carry many MBeans (wildcard read) or a
    single one (exact read, rewrapped per P5).  The returned DataFrame
    has one row per (mbean, scrape), exactly like the reference's
    "one message per metric per poll per server" contract
    (reference Code/main.py:173-174).
    """
    jolokia_status = F.get_json_object("body", "$.status").cast("int")
    request_mbean = F.get_json_object("body", "$.request.mbean")
    value_json = F.get_json_object("body", "$.value")

    parsed = (
        raw
        # P4: drop failed scrapes (HTTP-level and Jolokia-level status)
        .filter(F.col("http_status") == 200)
        .withColumn("_jolokia_status", jolokia_status)
        .filter(F.col("_jolokia_status") == 200)
        .withColumn("_request_mbean", request_mbean)
        .withColumn("_value_json", value_json)
        # P5: exact (non-wildcard) reads return the attribute payload
        # bare; rewrap as {mbean: payload} so downstream shape is uniform.
        # The null guard is the FIRST when-branch (CaseWhen evaluates in
        # order) so unparseable/empty bodies can never reach the
        # map constructor, regardless of how Catalyst reorders filter
        # conjuncts — a failed scrape is skipped, not retried
        # (reference Code/JMXScraper.py:163-165).
        .withColumn(
            "_bean_map",
            F.when(
                F.col("_request_mbean").isNull() | F.col("_value_json").isNull(),
                F.lit(None).cast(f"map<string,string>"),
            )
            .when(
                F.col("_request_mbean").contains("*"),
                F.from_json("_value_json", _MAP_SS),
            )
            .otherwise(
                F.map_from_arrays(
                    F.array(F.col("_request_mbean")),
                    F.array(F.col("_value_json")),
                )
            ),
        )
        .filter(F.col("_bean_map").isNotNull() & (F.map_keys("_bean_map") != F.array()))
    )

    exploded = parsed.select(
        F.col("target_url"),
        F.col("server_type"),
        F.col("execution_ts"),
        F.explode("_bean_map").alias("mbean_name", "_attrs_json"),
    )

    # P1: ObjectName pivot — domain before the first ':', key-properties
    # after it as a map.  An MBean key with no ':' yields a record with
    # only injected metadata (reference Code/JMXScraper.py:107-112).
    bean_domain = objectname_domain(F.col("mbean_name"))
    bean_props = objectname_props(F.col("mbean_name"))

    # Attribute bag: JSON objects parse to a map (nested composites stay
    # JSON strings); bare scalars become {'value': scalar}.
    attrs_is_object = F.trim("_attrs_json").startswith("{")
    attributes = F.when(attrs_is_object, F.from_json("_attrs_json", _MAP_SS)).otherwise(
        F.map_from_arrays(F.array(F.lit("value")), F.array(F.col("_attrs_json")))
    )

    out = exploded.select(
        F.col("mbean_name"),
        bean_domain.alias("bean_domain"),
        # P2: injected metadata
        F.col("server_type"),
        _host_name(F.col("target_url")).alias("host_name"),
        F.timestamp_millis("execution_ts").alias("created_ts"),
        F.col("execution_ts").alias("created_ms"),
        bean_props.alias("bean_props"),
        attributes.alias("attributes"),
    ).withColumn(
        # numeric projection for aggregation: attribute values castable
        # to double (booleans -> 1/0 like JMX numeric gauges are kept out;
        # the reference ships raw types, we additionally expose numerics)
        "num_attributes",
        F.map_filter(
            F.transform_values(
                "attributes", lambda _, v: v.try_cast("double")
            ),
            lambda _, v: v.isNotNull(),
        ),
    )
    return out


def flat_json_column() -> Column:
    """P3: Column serializing a metrics row to the reference's flat JSON
    shape — MBean attributes + ObjectName key-properties + injected
    metadata merged into one document (reference Code/JMXScraper.py:91-117).
    Nested composites remain nested (JSON strings re-embedded)."""
    flat = F.map_concat(
        F.col("attributes"),
        F.col("bean_props"),
        F.map_from_arrays(
            F.array(
                F.lit("mbeanName"),
                F.lit("injectedBeanName"),
                F.lit("createdDateTime"),
                F.lit("injectedServerType"),
                F.lit("injectedHostName"),
            ),
            F.array(
                F.col("mbean_name"),
                F.col("bean_domain"),
                F.col("created_ms").cast("string"),
                F.col("server_type"),
                F.col("host_name"),
            ),
        ),
    )
    return F.to_json(flat)


def to_json_records(metrics: DataFrame) -> DataFrame:
    """P3 as a one-column DataFrame (Kafka value shape)."""
    return metrics.select(flat_json_column().alias("value"))


def composite_field(attr: str, path: str, dtype: str = "double") -> Column:
    """Typed dotted-path extraction from a nested composite attribute.

    The reference ships JMX CompositeData nested (its flattener is dead
    code, Code/ReusableCodes.py:16-22) and dashboards query dotted paths
    like ``HeapMemoryUsage.used`` (ELK/jmx_dashboard.json:106).  Usage:

        metrics.select(composite_field("HeapMemoryUsage", "used"))
    """
    return (
        F.get_json_object(F.col("attributes").getItem(attr), f"$.{path}")
        .try_cast(dtype)
        .alias(f"{attr}.{path}")
    )
