"""Structured-Streaming pipeline wiring (SURVEY §3.1 step 5 mapping).

The reference's unbounded poll loop — fetch snapshot, fan out to sinks,
sleep POLL_WAIT (reference Code/main.py:262-287) — becomes:

    readStream("jolokia") → normalize_scrapes → [persisted per batch]
        ├─ writeStream kafka  (S5)
        └─ foreachBatch ES bulk (S6)
    trigger(processingTime=...)  ≙ the poll gate (Code/JMXScraper.py:186-197)

Watermarking is a NEW capability (the reference is stateless and emits
wall-clock records, SURVEY §2.5 W6): Spark requires it for state
cleanup on windowed aggregations, and it pins the late-data policy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_metrics_exporter_spark.operators.normalize import normalize_scrapes
from kafka_metrics_exporter_spark.sources.jolokia import read_jolokia


def streaming_metrics(
    spark: SparkSession,
    catalog: list[tuple[str, str]],
    fetcher: str | None = None,
    timeout: float = 10.0,
    connect_endpoints: list[str] | None = None,
    user: str | None = None,
    password: str | None = None,
    tls_verify: bool = False,
    discovery: str | None = None,
    discovery_kwargs: dict | None = None,
    discovery_annotations: dict | None = None,
    mbeans: dict | None = None,
    common_mbeans: list | None = None,
) -> DataFrame:
    """Streaming normalized-metrics DataFrame: one poll cycle per
    micro-batch over the scrape catalog; Connect REST endpoints ride
    as extra source partitions emitting synthetic Jolokia envelopes.
    With ``discovery`` set (a module:attr pod-lister ref), the catalog
    is re-resolved EVERY trigger — the reference's per-cycle K8s pod
    refresh (Code/main.py:274-282): a pod added mid-stream appears in
    the next micro-batch's scrape set."""
    raw = read_jolokia(
        spark,
        catalog,
        fetcher=fetcher,
        timeout=timeout,
        streaming=True,
        connect_endpoints=connect_endpoints,
        user=user,
        password=password,
        tls_verify=tls_verify,
        discovery=discovery,
        discovery_kwargs=discovery_kwargs,
        discovery_annotations=discovery_annotations,
        mbeans=mbeans,
        common_mbeans=common_mbeans,
    )
    return normalize_scrapes(raw)


def windowed_rollup(
    metrics: DataFrame,
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
    value_key: str = "Count",
) -> DataFrame:
    """W1 streaming form: tumbling event-time windows over a numeric
    attribute, grouped by (server_type, host, bean domain).

    Same logical plan as the batch w1_tumbling_window query — that is
    the point of declaring everything as DataFrame ops: batch and
    streaming share plans, only the source/trigger differ.  The
    watermark bounds state: at 1000-executor scale the window state
    store holds (hosts × domains × windows-in-watermark) entries, not
    unbounded history.
    """
    return (
        metrics.withWatermark("created_ts", watermark)
        .filter(F.col("num_attributes").getItem(value_key).isNotNull())
        .groupBy(
            F.window("created_ts", window_duration).alias("w"),
            F.col("server_type"),
            F.col("host_name"),
            F.col("bean_domain"),
        )
        .agg(
            F.sum(F.col("num_attributes").getItem(value_key)).alias("sum_value"),
            F.max(F.col("num_attributes").getItem(value_key)).alias("max_value"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "server_type",
            "host_name",
            "bean_domain",
            "sum_value",
            "max_value",
            "n_samples",
        )
    )


def latest_rollup(metrics: DataFrame) -> DataFrame:
    """A6 streaming form: latest sample per (server, host, mbean) —
    Kibana's pervasive top_hits size=1 (reference ELK/jmx_dashboard
    .json:88,186,242,452) as an update-mode streaming aggregate.

    ``max_by(value-struct, (ts, tiebreak))`` keeps exactly one row of
    state per series; emit with outputMode("update") so sinks receive a
    row whenever a series' latest changes — the live-dashboard
    semantics.  (The batch twin is operators.latest_per_key.)
    """
    ordering = F.struct(F.col("created_ts"), F.col("mbean_name"))
    payload = F.struct(
        F.col("created_ts").alias("latest_ts"),
        F.col("num_attributes").alias("latest_attributes"),
    )
    return (
        metrics.groupBy("server_type", "host_name", "mbean_name")
        .agg(F.max_by(payload, ordering).alias("_latest"))
        .select(
            "server_type",
            "host_name",
            "mbean_name",
            F.col("_latest.latest_ts").alias("latest_ts"),
            F.col("_latest.latest_attributes").alias("latest_attributes"),
        )
    )


def with_connect_rest(
    metrics_batch: DataFrame,
    endpoints: list[str],
    fetcher: str = "kafka_metrics_exporter_spark.sources.fetchers:http_fetcher",
    timeout: float = 10.0,
    execution_ts: int | None = None,
) -> DataFrame:
    """Merge Connect REST status metrics into a (micro-)batch of
    normalized Jolokia metrics — the reference folds the REST snapshot
    into the scraper's data structure each cycle
    (reference Code/JMXScraper.py:166-183).  Use inside foreachBatch:

        .foreachBatch(lambda df, _id: sink(with_connect_rest(df, eps)))
    """
    from kafka_metrics_exporter_spark.sources.connect_rest import connect_rest_scan

    rest = connect_rest_scan(
        metrics_batch.sparkSession,
        endpoints,
        fetcher=fetcher,
        timeout=timeout,
        execution_ts=execution_ts,
    )
    if not rest.columns:  # no connectors discovered
        return metrics_batch
    return metrics_batch.unionByName(rest, allowMissingColumns=True)


def run_pipeline_once(
    spark: SparkSession,
    catalog: list[tuple[str, str]],
    output_path: str,
    checkpoint: str,
    fetcher: str | None = None,
) -> None:
    """One availableNow micro-batch through the full pipeline into the
    parquet stand-in sink — the compose-style integration smoke
    (SURVEY §5)."""
    from kafka_metrics_exporter_spark.sinks.es_bulk import write_daily_parquet

    metrics = streaming_metrics(spark, catalog, fetcher=fetcher)
    q = (
        metrics.writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda df, _id: write_daily_parquet(df, output_path))
        .start()
    )
    q.awaitTermination()


def promql_panels(
    stream: DataFrame,
    exprs: dict[str, str],
    emit,
    checkpoint: str,
    trigger: dict | None = None,
    step_seconds: float | None = None,
    range_seconds: float | None = None,
    lookback_seconds: float | None = None,
):
    """Grafana-on-live-stream: evaluate compiled PromQL panel
    expressions over each micro-batch of the normalized metrics stream
    (reference: the Grafana dashboards in Prometheus/jmxexporter_configs
    rendered over the exporter's live series).

    The full grammar applies per micro-batch — foreachBatch hands a
    BATCH DataFrame to each panel plan, so rate/topk/vector matching
    (the shapes ``evaluate_streaming`` cannot express in a single
    watermarked aggregation) all work, evaluated over the poll cycle's
    snapshot exactly as a dashboard refresh would.  Expressions are
    compiled ONCE at wiring time (parse errors surface before the
    query starts); the batch is persisted across panels so the scrape
    scan runs once per cycle, not once per panel, and unpersisted
    before the next trigger.

    Two evaluation modes (VERDICT r6 item 4):

    - ``step_seconds=None`` (default): instant mode — each panel over
      the batch's own sample instants.
    - ``step_seconds`` set: RANGE mode, what Grafana actually issues on
      refresh — an aligned step grid over the trailing
      ``range_seconds`` window anchored at the batch's event-time
      high-water mark (its max sample ts, the stream's watermark
      proxy; one 1-row agg per batch).  Late rows older than the
      window fall off the grid — the same drop a real Grafana refresh
      applies, pinned in tests.  With ``range_seconds=None`` the grid
      spans the batch's own time extent instead (the self-contained
      form).  ``lookback_seconds`` is the staleness window per grid
      instant (Prometheus's 5m default).

    ``emit(name, result_df, batch_id)`` receives each panel's result —
    a sink adapter (ES bulk, Kafka, parquet) in production, a collector
    in tests.  Returns the started StreamingQuery."""
    import datetime as dt

    from pyspark.sql import functions as F

    from kafka_metrics_exporter_spark.promql import compile_promql

    plans = {name: compile_promql(text) for name, text in exprs.items()}

    def _range_kwargs(df: DataFrame) -> dict | None:
        kw: dict = {}
        if lookback_seconds is not None:
            kw["lookback_seconds"] = lookback_seconds
        if range_seconds is not None:
            hi = df.agg(F.max("ts").alias("hi")).first()["hi"]
            if hi is None:  # empty batch: nothing to anchor, no grid
                return None
            kw["start"] = hi - dt.timedelta(seconds=range_seconds)
            kw["end"] = hi
        return kw

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        df = df.persist()
        try:
            if step_seconds is None:
                for name, plan in plans.items():
                    emit(name, plan.evaluate(df), batch_id)
                return
            kw = _range_kwargs(df)
            if kw is None:
                return
            for name, plan in plans.items():
                emit(
                    name,
                    plan.evaluate_range(df, step_seconds, **kw),
                    batch_id,
                )
        finally:
            df.unpersist()

    return (
        stream.writeStream.trigger(**(trigger or {"availableNow": True}))
        .option("checkpointLocation", checkpoint)
        .foreachBatch(batch_fn)
        .start()
    )


def kibana_panels(
    stream: "DataFrame",
    visualizations: dict,
    emit,
    checkpoint: str,
    trigger: dict | None = None,
    **evaluate_kwargs,
):
    """Kibana-on-live-stream — the ES-side twin of :func:`promql_panels`
    (round 7): compiled visualization plans evaluated over each
    micro-batch of the documents stream, exactly what a Kibana
    dashboard refresh computes against the continuously-written index.

    ``visualizations`` maps panel key → saved-object dict (or a whole
    ``kibana.compile_export`` result of already-compiled KibanaPlans).
    Compilation happens ONCE at wiring time; ``evaluate_kwargs``
    (tiebreak=, default_search_field=, auto_interval_buckets=, ...)
    pass through to every panel's evaluate.  ``emit(name, result_df,
    batch_id)`` receives each panel's aggregation table per batch."""
    from kafka_metrics_exporter_spark.kibana import compile_visualization
    from kafka_metrics_exporter_spark.kibana.compiler import KibanaPlan

    plans = {
        name: vis if isinstance(vis, KibanaPlan) else compile_visualization(vis)
        for name, vis in visualizations.items()
    }

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        df = df.persist()
        try:
            for name, plan in plans.items():
                emit(name, plan.evaluate(df, **evaluate_kwargs), batch_id)
        finally:
            df.unpersist()

    return (
        stream.writeStream.trigger(**(trigger or {"availableNow": True}))
        .option("checkpointLocation", checkpoint)
        .foreachBatch(batch_fn)
        .start()
    )


def streaming_dedup(
    docs: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of llmdata.dedup's
    hash-groupBy (an ingest pipeline dedups as documents ARRIVE, not in
    a nightly batch).  ``dropDuplicatesWithinWatermark`` keeps one row
    per key and expires its per-key state once the watermark passes the
    key's last sighting, so state is bounded by the dedup horizon —
    O(keys per watermark window), not O(all keys ever) — which is what
    makes it runnable forever on a 100 TB/day firehose.

    Keys default to the md5 of the payload column ``text`` (digest
    state, not bodies — same trick as the batch exact dedup).
    """
    if key_cols is None:
        docs = docs.withColumn("text_hash", F.md5(F.col("text")))
        key_cols = ["text_hash"]
    return docs.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def cascade_rollup(
    metrics: DataFrame,
    value_col: str = "value",
    key_col: str = "series",
    ts_col: str = "ts",
    fine: str = "1 minute",
    coarse: str = "1 hour",
    watermark: str = "2 minutes",
) -> tuple[DataFrame, DataFrame]:
    """Streaming hypertable cascade: the fine tier aggregates raw
    samples into re-aggregable partials (sum/count/min/max); the coarse
    tier aggregates the FINE tier's windows via ``window_time`` —
    Spark's chained-window support — so the expensive raw stream is
    read once and the coarse tier's state holds only fine partials
    (1/60th the rows at 1m→1h).  Returns (fine_df, coarse_df); avg is
    derived sum/count at read time, the invariant that keeps cascades
    correct (w11_rollup_cascade is the batch twin).

    Sink the coarse tier in APPEND mode: chained stateful aggregations
    are exactly the shape Spark's global-watermark correctness check
    rejects in complete/update mode — append emits each coarse window
    once, when the watermark passes its end."""
    fine_df = (
        metrics.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, fine).alias("w"), F.col(key_col))
        .agg(
            F.sum(value_col).alias("s"),
            F.count(F.lit(1)).alias("n"),
            F.min(value_col).alias("mn"),
            F.max(value_col).alias("mx"),
        )
    )
    coarse_df = (
        fine_df.groupBy(
            F.window(F.window_time("w"), coarse).alias("w"), F.col(key_col)
        )
        .agg(
            F.sum("s").alias("s"),
            F.sum("n").alias("n"),
            F.min("mn").alias("mn"),
            F.max("mx").alias("mx"),
        )
        .select(
            key_col,
            F.col("w.start").alias("window_start"),
            "s",
            "n",
            "mn",
            "mx",
            (F.col("s") / F.col("n")).alias("avg"),
        )
    )
    return fine_df, coarse_df


def alert_rules(
    stream: DataFrame,
    rules_yaml: str,
    emit,
    checkpoint: str,
    state_dir: str,
    trigger: dict | None = None,
    keep_state_versions: int = 2,
    max_broadcast_state_rows: int = 1_000_000,
):
    """Prometheus alerting on the live stream (round 7): each
    micro-batch is one rule-manager evaluation cycle — the trigger
    cadence plays the role of Prometheus's group ``interval:`` loop
    (rules/manager.go), so the pending→firing ``for:`` state machine
    must CARRY ACROSS batches where the batch-mode evaluator
    (promql/rules.py) walks a grid.

    Per batch, per group (sequential, like batch mode): recording rules
    evaluate in instant mode and union into the cycle's frame; each
    alerting rule then

    1. evaluates its expr and keeps each label set's NEWEST sample —
       one element per series, the cycle's evaluation snapshot;
    2. joins the (tiny) persisted state — one row per active series —
       to recover ``active_since``: present-in-state series keep their
       first-seen evaluation time, new series anchor at this batch's
       event-time high-water mark (one 1-row agg per batch, the same
       watermark proxy promql_panels uses);
    3. fires once ``hw − active_since ≥ for`` — and a series ABSENT
       from this cycle's snapshot simply drops out of the new state,
       which is exactly Prometheus's reset-on-missing-evaluation;
    4. rewrites the state under a batch-versioned directory
       (``state_dir/<group>/<alert>/v<batch_id>``) so a replayed batch
       is idempotent and a crash between write and commit re-reads the
       previous version; only the newest ``keep_state_versions`` are
       retained.

    State is label-keyed and distributed (a parquet per alert — one row
    per ACTIVE series, not per sample), every step is a DataFrame op,
    and nothing but the 1-row high-water agg touches the driver.
    ``emit(group, alert, states_df, batch_id)`` receives the cycle's
    alert frame (labels…, ts, value, alertstate, annotation_*).

    ``state_dir`` goes through the Hadoop FileSystem API (VERDICT r7
    item 4), so it may be ``hdfs://``, ``s3a://``, or any scheme the
    cluster's Hadoop conf resolves — version listing and pruning are
    ``FileSystem.listStatus``/``delete``, never driver-local POSIX
    calls.  Each version directory is named ``v<batch_id>-<rows>``; the
    recorded row count lets the next cycle decide broadcast-vs-shuffle
    for the state join WITHOUT an extra counting job: a sane alert's
    active-series set is broadcast-tiny, but it is unbounded in
    principle, so above ``max_broadcast_state_rows`` (default 1 M rows
    — tens of MB of label strings) the join falls back to a plain
    equi-join and lets AQE pick the strategy."""
    from kafka_metrics_exporter_spark.promql import compile_promql
    from kafka_metrics_exporter_spark.promql.rules import (
        AlertingRule,
        _as_series,
        _union_series,
        parse_rule_groups,
        render_template,
    )

    groups = parse_rule_groups(rules_yaml)
    plans = {
        (g.name, i): compile_promql(r.expr)
        for g in groups
        for i, r in enumerate(g.rules)
    }

    def _state_base(group: str, alert: str) -> str:
        safe = f"{group}/{alert}".replace(" ", "_")
        return f"{state_dir}/{safe}"

    def _list_versions(spark, base: str):
        """``(fs, [(batch_id, rows, path_str), …])`` sorted by batch id
        — via ``Path.getFileSystem`` on the session's Hadoop conf, so
        any configured scheme works.  ``rows`` is parsed from the
        ``v<batch>-<rows>`` directory name (None for a legacy
        ``v<batch>`` layout)."""
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(base)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if not fs.exists(path):
            return fs, []
        versions = []
        for st in fs.listStatus(path):
            name = st.getPath().getName()
            if not name.startswith("v"):
                continue
            bid, _, rows = name[1:].partition("-")
            if not bid.isdigit():
                continue
            versions.append(
                (int(bid), int(rows) if rows.isdigit() else None,
                 st.getPath().toString())
            )
        versions.sort(key=lambda t: t[0])
        return fs, versions

    def _read_state(spark, group: str, alert: str, batch_id: int):
        """Newest state version STRICTLY BEFORE ``batch_id`` →
        ``(DataFrame, row_count)`` or ``(None, 0)``.  The bound makes a
        replayed micro-batch idempotent: without it, a batch that
        crashed after writing its state but before the checkpoint
        commit would re-run READING ITS OWN pre-crash output as the
        prior state, double-advancing the pending→firing clocks
        (code-review r9).  A legacy unnamed-count version pays one tiny
        counting job; the normal path is metadata-only."""
        _, versions = _list_versions(spark, _state_base(group, alert))
        versions = [v for v in versions if v[0] < batch_id]
        if not versions:
            return None, 0
        _, rows, path = versions[-1]
        df = spark.read.parquet(path)
        return df, rows if rows is not None else df.count()

    def _write_state(
        df: DataFrame, group: str, alert: str, batch_id: int, rows: int
    ):
        spark = df.sparkSession
        base = _state_base(group, alert)
        fs, versions = _list_versions(spark, base)
        jvm = spark._jvm
        # a REPLAYED batch replaces its own version: a pre-crash
        # attempt with a different row count lands in a different dir
        # name (v<batch>-<rows>), and a same-bid sibling would tie in
        # the version sort nondeterministically while consuming the
        # prune budget (code-review r9)
        for bid, _, path in versions:
            if bid == batch_id:
                fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)
        # size-adaptive file fan-out (optimization r17, guide §6): the
        # state frame inherits the cycle's shuffle partitioning (cpus-
        # many), so a handful of active series scattered into a
        # 32-task write job and as many near-empty files, re-listed
        # and re-opened every cycle.  The row count is already known
        # here; below the broadcast threshold (tens of MB of label
        # strings at most) one file is strictly better — above it,
        # keep the parallel write.
        if rows <= max_broadcast_state_rows:
            df = df.coalesce(1)
        df.write.mode("overwrite").parquet(f"{base}/v{batch_id}-{rows}")
        fs, versions = _list_versions(spark, base)
        keep = {v[0] for v in versions[-keep_state_versions:]}
        for bid, _, path in versions:
            if bid not in keep:
                fs.delete(jvm.org.apache.hadoop.fs.Path(path), True)

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        # persist FIRST so the 1-row high-water agg doubles as the cache
        # materialization — every rule evaluation then reads the cached
        # batch instead of paying a second source scan (optimization
        # r16, guide §1.2/§5: one pass per cycle over the batch)
        df = df.persist()
        try:
            hw = df.agg(
                F.max(F.unix_micros(F.col("ts"))).alias("hw")
            ).first()["hw"]
            if hw is None:  # empty cycle: no evaluation, state untouched
                return
            for g in groups:
                cur = df
                # each rule's persisted cycle frame stays cached until
                # the END of the group: the ALERTS feedback series built
                # from it is consumed by LATER rules in the group, and
                # unpersisting per-rule forced those consumers to
                # recompute the full snap join against a state parquet
                # _write_state may already have pruned (ADVICE r16)
                group_persisted: list[DataFrame] = []
                for i, rule in enumerate(g.rules):
                    out = plans[(g.name, i)].evaluate(cur)
                    if not isinstance(rule, AlertingRule):
                        series = _as_series(
                            out, rule.record, rule.labels, list(cur.columns)
                        )
                        cur = _union_series(cur, series)
                        continue
                    # the rule's OWN output columns replace any
                    # same-named labels riding in from an earlier
                    # alert's ALERTS feedback union — Prometheus
                    # overwrites alertstate and the rule labels on the
                    # alert's output, and keeping them in label_cols
                    # duplicated the result columns AND put NULL-valued
                    # feedback labels into the state key, where a plain
                    # equi-join dropped the state every cycle
                    # (code-review r11: alert-after-alert groups)
                    reserved = {
                        "alertstate",
                        *(k for k, _ in rule.labels),
                        *(f"annotation_{k}" for k, _ in rule.annotations),
                    }
                    label_cols = [
                        c
                        for c in out.columns
                        if c not in ("ts", "value") and c not in reserved
                    ]
                    # the cycle's snapshot: newest sample per series
                    snap = out.groupBy(*label_cols).agg(
                        F.max(
                            F.struct(
                                F.unix_micros(F.col("ts")).alias("__us"),
                                F.col("value").alias("__v"),
                            )
                        ).alias("__p")
                    )
                    prior, prior_rows = _read_state(
                        spark, g.name, rule.alert, batch_id
                    )
                    if prior is not None and label_cols:
                        # cardinality guard: the active-series set is
                        # broadcast-tiny for sane alerts but unbounded
                        # in principle — above the threshold, skip the
                        # broadcast hint and let AQE pick the strategy
                        side = (
                            F.broadcast(prior)
                            if prior_rows <= max_broadcast_state_rows
                            else prior
                        )
                        # null-safe equality: a series may legitimately
                        # carry NULL label values (e.g. alertname on
                        # non-ALERTS series when the group unions
                        # feedback) — a plain equi-join would never
                        # match them and silently reset active_since
                        sn, pr = snap.alias("__s"), side.alias("__pr")
                        cond = None
                        for c in label_cols:
                            leg = F.col(f"__s.{c}").eqNullSafe(
                                F.col(f"__pr.{c}")
                            )
                            cond = leg if cond is None else (cond & leg)
                        snap = sn.join(pr, on=cond, how="left").select(
                            "__s.*", F.col("__pr.active_since_us")
                        )
                    elif prior is not None:
                        # label-less alert: state is a single row
                        snap = snap.crossJoin(F.broadcast(prior))
                    else:
                        snap = snap.withColumn(
                            "active_since_us", F.lit(None).cast("long")
                        )
                    state = snap.select(
                        *label_cols,
                        F.col("__p.__us").alias("__us"),
                        F.col("__p.__v").alias("value"),
                        F.coalesce(
                            F.col("active_since_us"), F.lit(hw)
                        ).alias("active_since_us"),
                    )
                    for_us = int(round(rule.for_seconds * 1_000_000))
                    states = state.withColumn(
                        "alertstate",
                        F.when(
                            F.lit(hw) - F.col("active_since_us") >= for_us,
                            F.lit("firing"),
                        ).otherwise(F.lit("pending")),
                    )
                    # batched adds: two analysis passes, not
                    # |labels| + |annotations| (guide §plan-build, r17)
                    if rule.labels:
                        states = states.withColumns(
                            {k: F.lit(v) for k, v in rule.labels}
                        )
                    if rule.annotations:
                        states = states.withColumns({
                            f"annotation_{k}": render_template(
                                v, set(label_cols)
                            )
                            for k, v in rule.annotations
                        })
                    # ONE persisted frame + ONE count materializes the
                    # cycle BEFORE the state rewrite; the emitted result
                    # and the new state are both narrow projections of
                    # it (optimization r16: the previous shape persisted
                    # and counted result and new_state separately — two
                    # counting jobs and a recomputed snap join per rule
                    # per cycle for the same rows)
                    states = states.persist()
                    n_state = states.count()
                    result = states.select(
                        *label_cols,
                        *[k for k, _ in rule.labels],
                        F.timestamp_micros(F.col("__us")).alias("ts"),
                        "value",
                        "alertstate",
                        *[f"annotation_{k}" for k, _ in rule.annotations],
                    )
                    new_state = states.select(
                        *label_cols, "active_since_us"
                    )
                    _write_state(
                        new_state, g.name, rule.alert, batch_id, n_state
                    )
                    emit(g.name, rule.alert, result, batch_id)
                    group_persisted.append(states)
                    # feed ALERTS back for later rules in the group
                    alert_series = _as_series(
                        states.select(
                            *label_cols,
                            *[k for k, _ in rule.labels],
                            F.timestamp_micros(F.col("__us")).alias("ts"),
                            F.lit(1.0).alias("value"),
                            "alertstate",
                        ).withColumn("alertname", F.lit(rule.alert)),
                        "ALERTS",
                        (),
                        list(cur.columns),
                    )
                    cur = _union_series(cur, alert_series)
                for p in group_persisted:
                    p.unpersist()
        finally:
            df.unpersist()

    return (
        stream.writeStream.trigger(**(trigger or {"availableNow": True}))
        .option("checkpointLocation", checkpoint)
        .foreachBatch(batch_fn)
        .start()
    )


def replay_windowed_rollup(
    spark: SparkSession,
    events: DataFrame,
    n_batches: int = 3,
    window: str = "1 day",
    delay: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value_i",
) -> DataFrame:
    """Deterministic micro-batch replay of the W1 streaming rollup —
    the registry-checkable form of this module's always-on pipelines
    (VERDICT r9 item 7: the streaming surface was pytest-only).

    A REAL Structured Streaming query runs start to finish: the input
    is range-split by event time into ``n_batches`` parquet files with
    ascending mtimes, a file-source stream with ``maxFilesPerTrigger=1``
    + ``Trigger.AvailableNow`` processes them as separate micro-batches
    (per-batch window state, watermark advancement, append-mode
    finalization, state eviction — the full stateful machinery), and
    the function returns the windows the sink actually received.

    Why the result is deterministic and batch-mirrorable: files are
    time-ordered, so event time is monotone ACROSS batches and the
    watermark (trailing ``delay``) never drops a late row; append mode
    emits exactly the windows whose end ≤ final watermark = max event
    time (ms) − delay.  That set depends only on the DATA, never on
    the micro-batch slicing — so a batch query over the same rows
    (aggregate all, keep windows with end ≤ max_ts − delay) is an
    exact twin, which is what makes the streaming path driver-
    verifiable against DuckDB rather than pytest-only.

    Scale: the replay IS the production plan — per-key-and-window
    state bounded by the watermark horizon, append finalization; only
    the file-split scaffolding is test-harness."""
    stream, meta = _replayed_stream(spark, events, n_batches, ts_col)
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("window_start"),
            "n",
            "total",
        )
    )
    return _run_replay(spark, agg, meta)


def _replayed_stream(
    spark: SparkSession, events: DataFrame, n_batches: int, ts_col: str
) -> DataFrame:
    """The replay harness' source half: range-split ``events`` by event
    time into ``n_batches`` files with ascending mtimes (one
    repartition-by-value pass) and open them as a file-source stream
    with ``maxFilesPerTrigger=1`` — each file becomes one micro-batch,
    in event-time order, so event time is monotone across batches and
    a trailing watermark never drops a row.  The written file count
    rides on the returned frame for _run_replay's progress assertion."""
    import os
    import tempfile
    import time as _time

    base = tempfile.mkdtemp(prefix="kme_replay_")
    in_dir = os.path.join(base, "in")
    os.makedirs(in_dir)
    lo, hi = (
        events.agg(
            F.min(F.col(ts_col).cast("double")),
            F.max(F.col(ts_col).cast("double")),
        ).first()
    )
    span = (hi - lo) or 1.0
    ts_d = F.col(ts_col).cast("double")
    # ONE pass writes every slice: the slice id is a pure function of
    # event time, repartition-by-value co-locates each slice in one
    # task, and partitionBy emits exactly one file per slice dir —
    # n_batches filter+coalesce jobs collapse into a single scan
    slice_id = F.least(
        F.floor((ts_d - F.lit(lo)) / F.lit(span) * n_batches).cast("int"),
        F.lit(n_batches - 1),
    )
    stage = os.path.join(base, "stage")
    (
        events.withColumn("__slice", slice_id)
        .repartition(n_batches, "__slice")
        .write.partitionBy("__slice")
        .mode("overwrite")
        .parquet(stage)
    )
    n_files = 0
    for i in range(n_batches):
        sdir = os.path.join(stage, f"__slice={i}")
        if not os.path.isdir(sdir):
            continue  # degenerate data (e.g. single-instant): empty slice
        src = [f for f in os.listdir(sdir) if f.endswith(".parquet")]
        assert len(src) == 1, (i, src)
        dst = os.path.join(in_dir, f"b{i}.parquet")
        os.rename(os.path.join(sdir, src[0]), dst)
        # ascending mtimes pin the file-source processing order to the
        # event-time order, keeping event time monotone across batches
        t = _time.time() + i - n_batches
        os.utime(dst, (t, t))
        n_files += 1
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )
    return stream, {"base": base, "n_files": n_files}


def _run_replay(spark: SparkSession, agg: DataFrame, meta: dict) -> DataFrame:
    """The replay harness' sink half: drive the aggregated stream to a
    parquet sink with Trigger.AvailableNow in append mode and return
    what the sink received.  A replay that finalizes nothing (every
    window/session still open at the final watermark) returns an EMPTY
    frame with the aggregation's schema — the bare parquet read would
    fail schema inference on a data-less sink directory
    (code-review r10)."""
    import os

    out_dir = os.path.join(meta["base"], "out")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(meta["base"], "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_progress = len(q.recentProgress)
    assert n_progress >= meta["n_files"], (
        f"replay ran {n_progress} micro-batches, expected >= {meta['n_files']}"
    )
    has_data = os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    )
    if not has_data:
        return spark.createDataFrame([], agg.schema)
    return spark.read.parquet(out_dir)


def replay_session_rollup(
    spark: SparkSession,
    events: DataFrame,
    n_batches: int = 3,
    gap: str = "2 hours",
    delay: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "skey",
    value_col: str = "value_i",
) -> DataFrame:
    """Deterministic micro-batch replay of SESSION windows (the W7
    streaming form): per key, events closer than ``gap`` merge into
    one session; Spark's session-window state MERGES sessions across
    micro-batches and append mode finalizes a session once the
    watermark passes its end (last event + gap — the instant it can no
    longer be extended).

    Same determinism argument as replay_windowed_rollup: time-ordered
    batches keep event time monotone, so nothing is late and the
    emitted set is exactly the sessions of a BATCH sessionization
    (gaps-and-islands) whose end ≤ final watermark = max event time
    (ms) − delay — independent of the micro-batch slicing, hence
    twin-checkable in SQL.  Output: (key, session_start, session_end,
    n, total)."""
    stream, meta = _replayed_stream(spark, events, n_batches, ts_col)
    agg = (
        stream.withWatermark(ts_col, delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("total"),
        )
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n",
            "total",
        )
    )
    return _run_replay(spark, agg, meta)


def replay_alert_rules(
    spark: SparkSession,
    metrics: DataFrame,
    rules_yaml: str,
    n_batches: int = 4,
    ts_col: str = "ts",
) -> DataFrame | None:
    """Deterministic micro-batch replay of the ALERTING pipeline
    (VERDICT r10 item 6: `alert_rules` was pytest-only) — the
    registry-checkable form of the pending→firing `for:` state machine.

    A REAL foreachBatch streaming query runs start to finish over the
    `_replayed_stream` file slices: each micro-batch is one Prometheus
    rule-manager evaluation cycle, the label-keyed alert state persists
    under batch-versioned parquet between cycles, and every cycle's
    emitted alert frame (labels, newest passing sample, pending/firing)
    is appended to a parquet sink tagged with its batch id.

    Unlike the windowed/session replays, the emitted set here DEPENDS
    on the slicing — a cycle is the unit of evaluation, exactly as in
    Prometheus, where the rule interval decides what each evaluation
    sees.  The slice id is a pure function of event time
    (`_replayed_stream`), so a batch twin can reconstruct every cycle:
    per (slice, series) take the newest passing sample, carry
    `active_since` over consecutive-slice presence runs
    (gaps-and-islands), anchor new runs at the slice's event-time
    high-water mark, and fire once `hw − active_since ≥ for` — the
    same state machine, replayed relationally.

    Returns the union of emitted frames with a `batch_id` column, or
    None when no cycle emitted anything (no passing sample anywhere).

    Scale: the replay IS the production alerting plan — per-cycle
    instant evaluation, a broadcast-sized state join (one row per
    ACTIVE series), batch-versioned idempotent state writes; only the
    file-split scaffolding is harness."""
    import os

    stream, meta = _replayed_stream(spark, metrics, n_batches, ts_col)
    out_dir = os.path.join(meta["base"], "alerts")

    def emit(group: str, alert: str, result: DataFrame, batch_id: int) -> None:
        # tag each frame with its rule identity — a multi-rule YAML
        # emits every alert into this one union, and two alerts with
        # identical label columns would otherwise be indistinguishable
        # (code-review r11)
        (
            result.withColumn("batch_id", F.lit(batch_id))
            .withColumn("rule_group", F.lit(group))
            .withColumn("alertname", F.lit(alert))
            .write.mode("append")
            .parquet(out_dir)
        )

    q = alert_rules(
        stream,
        rules_yaml,
        emit,
        checkpoint=os.path.join(meta["base"], "chk"),
        state_dir=os.path.join(meta["base"], "state"),
    )
    q.awaitTermination()
    n_progress = len(q.recentProgress)
    assert n_progress >= meta["n_files"], (
        f"alert replay ran {n_progress} micro-batches, "
        f"expected >= {meta['n_files']}"
    )
    has_data = os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    )
    if not has_data:
        return None
    # alerts with DIFFERENT label sets append different schemas into
    # the union dir; mergeSchema reconciles them (absent labels read
    # as NULL) instead of silently adopting one file's schema
    return spark.read.option("mergeSchema", "true").parquet(out_dir)
