"""Structured Streaming windowed aggregation over the events table.

The reference is purely batch (SURVEY.md §2.8); this is the streaming
façade's analytical face: the same hourly rollup the batch contract
computes (evt_window_agg), expressed as a ``readStream`` → watermarked
event-time window → ``availableNow`` micro-batch into a memory sink.
Because ``availableNow`` drains everything currently on disk, the
streaming result must equal the batch result row-for-row — which is
exactly what the DuckDB oracle checks.

At production scale the memory sink becomes a partitioned table sink and
the trigger a continuous schedule; watermark + append mode then bound
state: closed windows are emitted and dropped from the state store, so
state size is O(active windows), independent of stream length.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hourly_agg(stream: DataFrame, watermark: str) -> DataFrame:
    """Shared watermarked hourly (window, event_type) rollup."""
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.window(F.col("ts"), "1 hour").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_hourly_rollup(
    spark: SparkSession,
    events_path: str,
    watermark: str = "2 hours",
) -> DataFrame:
    """Hourly (window, event_type) rollup of an events parquet location as
    ONE availableNow micro-batch drain; returns the materialized result.

    outputMode('complete') is used so the final (still-open) hour is
    emitted too — with append mode the watermark would hold it back and
    the drain of a static fixture would under-report the last window; the
    watermark is still declared because it is what bounds state in a
    long-running deployment of the same query."""
    schema = spark.read.parquet(events_path).schema
    # parquet timestamps arrive as TIMESTAMP_NTZ; event-time watermarks
    # require TIMESTAMP (the session-zoned type) — cast in _hourly_agg
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = _hourly_agg(stream, watermark)
    name = f"evt_stream_{uuid.uuid4().hex[:12]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_hourly_rollup_append(
    spark: SparkSession,
    events_path: str,
    store,
    table: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
) -> list[dict]:
    """The PRODUCTION shape of the rollup: append mode, so the watermark
    actually closes windows and DROPS their state (state size = O(open
    windows), independent of stream length — complete mode rewrites every
    window every batch and is fixture-drain only), with each emission of
    closed windows committed as one atomic TableStore snapshot via
    ``foreachBatch`` (exactly-once: the checkpoint replays an uncommitted
    batch, and a replayed ``commit`` just supersedes the orphaned files,
    which no manifest references).

    One ``availableNow`` drain per call; call again after new files land —
    the checkpoint carries the watermark and window state across drains,
    so windows only emit once, when the watermark passes their end.
    Returns the drain's progress dicts (state-store rows, watermark) so
    callers/tests can assert the state bound."""
    schema = spark.read.parquet(events_path).schema
    stream = spark.readStream.schema(schema).parquet(events_path)
    agg = _hourly_agg(stream, watermark)

    def _commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stage = f"stream_rollup_batch_{batch_id}"
        # exactly-once needs BOTH halves: a crash before the manifest write
        # leaves orphaned staging files no manifest references (safe), and a
        # crash AFTER the manifest write but before the streaming checkpoint
        # records the batch replays _commit with the same batch_id — the
        # lineage stage marker detects that and skips the duplicate append.
        man = store.manifest(table)
        if man and any(l.get("stage") == stage for l in man.get("lineage", [])):
            return
        store.commit(
            batch_df.withColumn("hour_key", F.date_format("hour_bucket", "yyyyMMddHH")),
            table,
            partition_col="hour_key",
            stage=stage,
        )

    q = (
        agg.writeStream.foreachBatch(_commit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return [p for p in q.recentProgress]
