"""Structured-Streaming front-end for the extraction pipeline.

The reference is request/response (no streaming — SURVEY.md section
2.8) and the north_rule specifies batch with checkpoint resume; this
module exists because the same DataFrame plan runs unchanged as a
stream: ``run_extraction`` is narrow transformations + mapInPandas,
all streaming-compatible. Use case: continuous ingestion of new WARC
drops into the extractions table.

``trigger(availableNow=True)`` gives batch-like one-shot draining with
streaming checkpoints — the recommended pattern for incremental
backfills.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..config import DEFAULT_CONFIG, ExtractionConfig
from ..plans.pipeline import run_extraction
from ..schema import PAGES_SCHEMA


def run_extraction_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    # repartition is not stream-safe pre-agg in all modes; the stream
    # path relies on source file splitting for parallelism
    stream_cfg = cfg if cfg.repartition is None else ExtractionConfig(
        **{**cfg.__dict__, "repartition": None}
    )
    out = run_extraction(stream, stream_cfg)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_rate_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Watermarked tumbling-window per-host page counts — the
    streaming twin of plans/metrics.host_quality_metrics. Late pages
    inside the watermark update their window; older ones are dropped
    (state stays bounded — the property that matters on an unbounded
    WARC firehose)."""
    from pyspark.sql import functions as F

    from ..plans.salting import host_of

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    agg = (
        stream.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            host_of(F.col("url")).alias("host"),
        )
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")  # windows emit once their watermark passes
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def dedup_url_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming exact dedup by url: re-crawled pages arriving within
    the watermark are dropped, state is evicted after it. The
    streaming analog of operators/dedup.exact_dedup keyed on url —
    upstream of the extraction stream this makes reprocessing
    idempotent per crawl window."""
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    deduped = stream.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        ["url"]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def user_sessions_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming session windows: gap-merged per-user sessions with
    watermark-bounded state. Append mode emits a session once the
    watermark passes its end (last event + gap) — the emission rule
    the oracle reconstructs arithmetically, so BOTH the session merge
    and the finalization semantics sit under the bit-exact gate. The
    streaming twin of the batch q_session_windows."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("session_window"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("w_start"),
            F.col("session_window.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
    )
    writer = (
        agg.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def extraction_to_snapshot_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    cfg: ExtractionConfig = DEFAULT_CONFIG,
    available_now: bool = True,
) -> StreamingQuery:
    """Continuous extraction committed into the snapshot-versioned
    table (plans/snapstore.SnapshotTable) via foreachBatch — one
    append SNAPSHOT per micro-batch, so every drained batch is an
    atomic, time-travelable table version (the Iceberg streaming-sink
    pattern). Exactly-once: the commit is TAGGED with the epoch id, so
    a batch replayed after a crash-before-checkpoint returns the
    already-committed snapshot instead of double-appending — the
    foreachBatch idempotence contract the Structured Streaming guide
    requires of the sink."""
    from ..plans.snapstore import SnapshotTable

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    stream_cfg = cfg if cfg.repartition is None else ExtractionConfig(
        **{**cfg.__dict__, "repartition": None}
    )
    out = run_extraction(stream, stream_cfg)
    table = SnapshotTable(spark, table_path)
    # scope the idempotence tag to THIS logical stream: epoch ids
    # restart at 0 for a fresh checkpoint, so a bare epoch tag would
    # make a second stream into the same table silently drop its
    # batches. The checkpoint dir is stable across restarts of the
    # same query and distinct for new ones (Delta's txnAppId pattern).
    import hashlib as _hashlib

    stream_id = _hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:12]

    def commit_batch(batch_df, epoch_id: int) -> None:
        table.commit(batch_df, "append", tag=f"{stream_id}-epoch-{epoch_id}")

    writer = (
        out.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def host_running_totals_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 4,
) -> StreamingQuery:
    """Custom stateful operator via ``applyInPandasWithState``:
    per-host RUNNING totals (pages, bytes) maintained across
    micro-batches — cumulative state that windowed aggregation cannot
    express. Each micro-batch emits the updated running row per host
    touched; state is one tiny tuple per host (bounded by host
    cardinality, not input size)."""
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from ..plans.salting import host_of

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    hosts = stream.select(
        host_of(F.col("url")).alias("host"),
        F.coalesce(F.length("html"), F.lit(0)).alias("n_bytes"),
    )

    def update(key, pdfs, state: GroupState):
        (host,) = key
        pages, total = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            pages += len(pdf)
            total += int(pdf["n_bytes"].sum())
        state.update((pages, total))
        yield pd.DataFrame(
            {"host": [host], "total_pages": [pages], "total_bytes": [total]}
        )

    out = hosts.groupBy("host").applyInPandasWithState(
        update,
        outputStructType="host string, total_pages long, total_bytes long",
        stateStructType="total_pages long, total_bytes long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def recrawl_merge_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    key_col: str = "doc_id",
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming re-crawl UPSERT: each micro-batch MERGEs into the
    snapshot table by key (plans/snapstore.SnapshotTable.merge) —
    revised documents replace their previous version file-granularly,
    unseen keys insert, and every batch is a time-travelable
    snapshot. Exactly-once via the same checkpoint-scoped epoch tag
    as extraction_to_snapshot_stream. This is the daily-recrawl sink:
    per-batch cost scales with the touched files, not the table."""
    import hashlib as _hashlib

    from ..plans.snapstore import SnapshotTable

    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_dir)
    )
    table = SnapshotTable(spark, table_path)
    stream_id = _hashlib.md5(checkpoint_dir.encode("utf-8")).hexdigest()[:12]

    def commit_batch(batch_df, epoch_id: int) -> None:
        table.merge(batch_df, key_col, tag=f"{stream_id}-epoch-{epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cms_register_stream(
    spark: SparkSession,
    input_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Streaming Count-Min maintenance (the sketch-mergeability
    payoff): each micro-batch aggregates its own token counts,
    sketches them, and writes the register DELTA to an epoch-keyed
    subdirectory. Replayed batches overwrite the same path —
    idempotent, the foreachBatch contract — and the sketch "as of
    now" is the groupBy-SUM merge of every delta on disk, valid
    because CMS cells merge by addition (operators/sketches.py).
    State never grows past D*W cells per epoch file, and no epoch
    ever rewrites another's output — contrast with the snapshot sink
    above, which needs a tag protocol because its commits share one
    table."""
    from pyspark.sql import functions as F

    from ..functions.textstats import tokens
    from ..operators.sketches import cms_registers

    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def commit_batch(batch_df, epoch_id: int) -> None:
        counts = (
            batch_df.select(F.explode(tokens(F.col("text"))).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        cms_registers(counts).write.mode("overwrite").parquet(
            f"{registers_dir}/epoch_{epoch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_registers(spark: SparkSession, registers_dir: str):
    """Merge every epoch delta into the current sketch — one
    groupBy-SUM, the same operation merge_cms_registers applies to
    batch halves."""
    from pyspark.sql import functions as F

    deltas = spark.read.parquet(f"{registers_dir}/epoch_*")
    return deltas.groupBy("row", "bucket").agg(
        F.sum("cell").cast("long").alias("cell")
    )


def incremental_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    store_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.9,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Streaming near-duplicate detection against a growing signature
    store — the continuous-ingestion form of the dedup layer: each
    micro-batch (a recrawl drop) emits its near-dup pairs against
    everything ingested before it, then adds its own signatures to
    the store. The union of every epoch's pairs equals the one-shot
    all-pairs truth for ANY batch slicing (the incremental invariant
    operators/dedup.incremental_minhash_near_dup pins: old-vs-old
    pairs were emitted by earlier epochs, batch-internal and
    batch-vs-store pairs are emitted now, and a doc never re-enters a
    later batch).

    Replay-deterministic by construction, with NO tag protocol:
    both outputs are epoch-keyed subdirectories (``epoch=N``), and
    the store state a batch deduplicates against is the PARTITION-
    PRUNED ``epoch < N`` slice — so a crashed-and-replayed epoch
    recomputes from exactly the state its first attempt saw, even if
    that attempt already wrote this epoch's signatures. Contrast with
    recrawl_merge_stream, whose shared-table sink needs epoch tags.

    Per-epoch cost is O(batch x bands) candidates + verification
    shingling over candidate ids only — corpus-size-independent, the
    property that makes the plan survive a petabyte-scale backlog.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import (
        incremental_minhash_near_dup,
        minhash_signatures,
    )

    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    jvm_path = spark._jvm.org.apache.hadoop.fs.Path

    def commit_batch(batch_df, epoch_id: int) -> None:
        jpath = jvm_path(store_dir)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            stored = (
                spark.read.parquet(store_dir)
                .where(F.col("epoch") < epoch_id)
                .select("doc_id", "band_keys", "text_md5")
            )
        else:
            stored = spark.createDataFrame(
                [], "doc_id bigint, band_keys array<bigint>, text_md5 string"
            )
        corpus = spark.read.parquet(input_dir)
        pairs = incremental_minhash_near_dup(
            batch_df, stored, corpus, threshold=threshold
        )
        pairs.select("id_a", "id_b", "jaccard").write.mode("overwrite").parquet(
            f"{pairs_dir}/epoch={epoch_id}"
        )
        sigs = minhash_signatures(batch_df).join(
            batch_df.select(
                "doc_id", F.md5(F.encode(F.col("text"), "UTF-8")).alias("text_md5")
            ),
            "doc_id",
        )
        sigs.write.mode("overwrite").parquet(f"{store_dir}/epoch={epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hll_register_stream(
    spark: SparkSession,
    input_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Streaming HyperLogLog maintenance: each micro-batch sketches
    its own rows into per-source registers and writes them to an
    epoch-keyed subdirectory; the sketch "as of now" is the
    groupBy-MAX merge of every epoch file. Strictly easier than the
    CMS stream above: register merge is max (idempotent AND
    commutative), so even a double-applied epoch — not just a
    replayed-then-overwritten one — could not skew the estimate.
    State per epoch is bounded by sources x 256 registers."""
    from ..operators.sketches import hll_registers

    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def commit_batch(batch_df, epoch_id: int) -> None:
        hll_registers(batch_df, ["source"], "doc_id").write.mode(
            "overwrite"
        ).parquet(f"{registers_dir}/epoch_{epoch_id}")

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_registers(spark: SparkSession, registers_dir: str):
    """Merge every epoch's registers into the current sketch — one
    groupBy-MAX, the same operation merge_hll_registers applies to
    batch halves."""
    from pyspark.sql import functions as F

    deltas = spark.read.parquet(f"{registers_dir}/epoch_*")
    keys = [c for c in deltas.columns if c not in ("bucket", "mreg")]
    return deltas.groupBy(*keys, "bucket").agg(F.max("mreg").alias("mreg"))


def bucket_count_stream(
    spark: SparkSession,
    input_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    bucket_us: int = 3_600_000_000,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Streaming maintenance of the per-(type, time-bucket) count
    table that feeds the integer-sigma anomaly rule
    (operators/eventstats.anomalies_from_counts): each micro-batch
    writes its own count DELTA to an epoch-keyed subdirectory —
    replays overwrite the same path (idempotent, the cms_register_
    stream contract) and counts merge by addition, so the one-shot
    table equals the groupBy-SUM of the deltas under ANY batch
    slicing. The anomaly STATISTICS (mean/variance) are computed
    from the merged table at read time, never incrementally —
    sum-of-squares does not merge across epochs that touch the same
    bucket, and recomputing it from the (small) bucket table is one
    cheap agg."""
    from ..operators.eventstats import bucket_counts

    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )

    def commit_batch(batch_df, epoch_id: int) -> None:
        bucket_counts(batch_df, bucket_us).write.mode("overwrite").parquet(
            f"{registers_dir}/epoch_{epoch_id}"
        )

    writer = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_bucket_counts(spark: SparkSession, registers_dir: str):
    """Merge every epoch's count delta into the current bucket table
    — one groupBy-SUM (counts commute across any slicing)."""
    from pyspark.sql import functions as F

    deltas = spark.read.parquet(f"{registers_dir}/epoch_*")
    return deltas.groupBy("event_type", "bucket_us_start").agg(
        F.sum("n_events").alias("n_events")
    )


def user_tier_dim(events_batch):
    """The static enrichment dimension for ``enriched_events_stream``:
    per-user lifetime activity tier (0/1/2 by total event count —
    integer thresholds chosen inside the harness's 49..88
    events-per-user band so all three tiers are inhabited).
    Computed ONCE from the batch
    table; at scale this is the slowly-changing dim a warehouse
    maintains separately."""
    from pyspark.sql import functions as F

    return events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_total")
    ).select(
        "user_id",
        F.when(F.col("n_total") >= 75, 2)
        .when(F.col("n_total") >= 60, 1)
        .otherwise(0)
        .cast("int")
        .alias("tier"),
    )


def enriched_events_stream(
    spark: SparkSession,
    input_dir: str,
    dim_df,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """Stream-static enrichment: the event stream inner-joins a
    BROADCAST static dimension (no state store, no watermark — the
    static side is re-resolvable per micro-batch, which is exactly
    what stream-static joins are for), then each micro-batch writes
    its per-(tier, event_type) count/decimal-sum DELTA to an
    epoch-keyed path. Replays overwrite their own epoch (idempotent,
    the cms/bucket-stream contract); counts and exact decimal sums
    both merge by addition, so the merged table equals the one-shot
    batch join under any batch slicing."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(input_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    enriched = stream.join(F.broadcast(dim_df), "user_id")

    def commit_batch(batch_df, epoch_id: int) -> None:
        (
            batch_df.groupBy("tier", "event_type")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
            )
            .write.mode("overwrite")
            .parquet(f"{out_dir}/epoch_{epoch_id}")
        )

    writer = (
        enriched.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_enriched_totals(spark: SparkSession, out_dir: str):
    """Merge the epoch deltas into the current (tier, event_type)
    totals — counts and exact decimal sums both commute."""
    from pyspark.sql import functions as F

    deltas = spark.read.parquet(f"{out_dir}/epoch_*")
    return deltas.groupBy("tier", "event_type").agg(
        F.sum("n_events").cast("long").alias("n_events"),
        F.sum("sum_value").cast("double").alias("total_value"),
    )


def stream_stream_click_attribution(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_us: int = 1_800_000_000,
    watermark_delay: str = "3650 days",
    available_now: bool = True,
    max_files_per_trigger: int = 2,
) -> StreamingQuery:
    """STREAM-STREAM inner join (the one Structured Streaming join
    class the suite didn't yet exercise): clicks join errors of the
    same user within ``window_us`` after the error — the streaming
    twin of the batch ``range_join`` catalog query, sharing its
    oracle. Both sides are event-time streams of the SAME staged
    corpus; Spark buffers each side in the state store and emits a
    pair exactly ONCE when its partner arrives, so the union of
    epoch outputs equals the one-shot batch join under any file
    slicing.

    The watermark bounds the buffered state: a side's rows older
    than max(event time) - delay are evicted, and a pair whose
    partner arrives later than that is silently DROPPED — which is
    correct streaming semantics but nondeterministic under replay
    slicing. Here the delay is set beyond the corpus's total time
    span so eviction can never fire and the result is a pure
    function of the data; a production deployment sets it to the
    real out-of-orderness bound. Epoch outputs are overwrite-keyed
    (replay-idempotent, the cms/bucket contract)."""
    from pyspark.sql import functions as F

    schema = spark.read.parquet(input_dir).schema

    def _src():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir)
        )

    clicks = (
        _src()
        .where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").cast("timestamp").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark_delay)
    )
    errors = (
        _src()
        .where(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id").alias("e_user_id"),
            F.col("ts").cast("timestamp").alias("error_ts"),
        )
        .withWatermark("error_ts", watermark_delay)
    )
    joined = clicks.join(
        errors,
        (F.col("c_user_id") == F.col("e_user_id"))
        & (F.col("click_ts") >= F.col("error_ts"))
        & (
            F.unix_micros(F.col("click_ts"))
            <= F.unix_micros(F.col("error_ts")) + F.lit(window_us)
        ),
        "inner",
    ).select(
        "click_id",
        "error_id",
        F.col("c_user_id").alias("user_id"),
        F.unix_micros(F.col("click_ts")).alias("click_ts_us"),
        F.unix_micros(F.col("error_ts")).alias("error_ts_us"),
        (
            F.unix_micros(F.col("click_ts")) - F.unix_micros(F.col("error_ts"))
        ).alias("delta_us"),
    )

    def commit_batch(batch_df, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/epoch_{epoch_id}"
        )

    writer = (
        joined.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_stream_join_pairs(spark: SparkSession, out_dir: str):
    """Union the epoch outputs — each matched pair was emitted in
    exactly one epoch, so plain concatenation IS the join result."""
    return spark.read.parquet(f"{out_dir}/epoch_*")
