"""Streaming exact-dedup over an event stream.

The training-pipeline shape: an ingest stream carries repeated
observations of the same logical key (re-sent events, re-crawled pages,
re-ingested images) and the pipeline must emit each key exactly once
without holding unbounded state. ``dropDuplicatesWithinWatermark`` is
the Spark-native operator for this: first arrival of a key is emitted
immediately (append mode — dedup rows are not held back the way window
aggregates are), and key state is EVICTED once the event-time watermark
passes the key's timestamp — state is O(keys within the watermark
horizon), independent of stream length. Plain ``dropDuplicates`` on a
stream keeps every key forever and is the scale-killer this module
exists to avoid.

Determinism contract: the output carries the KEY COLUMNS ONLY. Which
physical row arrives first is race-dependent across partitions, so
emitting payload columns would make the result nondeterministic; the
key set itself is exactly the batch ``select distinct`` — which is what
the DuckDB oracle checks after an availableNow drain whose watermark
horizon covers the fixture's whole span. A production deployment with a
tight horizon deliberately re-admits keys older than the horizon
(re-crawl semantics); the contract drain pins the horizon-covers-all
case where streaming == batch row-for-row.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_dedup_keys(
    spark: SparkSession,
    events_path: str,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    watermark: str = "45 days",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Drain ``events_path`` as an availableNow stream and emit each
    distinct key tuple exactly once; returns the materialized result.
    ``max_files_per_trigger`` splits the drain into multiple micro-batches
    (tests use it to drive the watermark forward between files and pin
    the state-eviction semantics)."""
    schema = spark.read.parquet(events_path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_path)
    stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    deduped = (
        stream.withWatermark(ts_col, watermark)
        .select(*keys, ts_col)
        .dropDuplicatesWithinWatermark(list(keys))
        .select(*keys)
    )
    name = f"evt_dedup_stream_{uuid.uuid4().hex[:12]}"
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
