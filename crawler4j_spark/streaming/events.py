"""Structured Streaming pipelines over the events stream table.

Genuine ``readStream`` → transform → ``writeStream`` pipelines (watermarked
windowed aggregation; stateful sessionization via applyInPandasWithState)
for the streaming side of the engine: the shapes a production deployment
runs continuously, validated here with the file source + availableNow
trigger so tests are hermetic and bounded.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

__all__ = [
    "read_events_stream",
    "windowed_counts",
    "sessionize_stateful",
    "run_to_memory",
]

def read_events_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """File-source stream over the events parquet directory (schema inferred
    from the static table — the SS file source needs it up front)."""
    static = spark.read.parquet(events_dir)
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(events_dir)
        # parquet stores TIMESTAMP_NTZ; watermarks need event-time TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def windowed_counts(stream: DataFrame) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data tolerated 1h):
    the canonical streaming agg shape."""
    return (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


_SESSION_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("session_events", IntegerType()),
])

_SESSION_STATE = StructType([
    StructField("count", IntegerType()),
    StructField("last_ts", LongType()),
])

_GAP_S = 1800


def _session_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: per-user event counter with 30-min gap
    session splits — the applyInPandasWithState shape the reference's
    per-host/per-seed in-memory maps become in streaming deployments."""
    (user_id,) = key
    if state.hasTimedOut:
        count, _last = state.get if state.exists else (0, 0)
        state.remove()
        yield pd.DataFrame({"user_id": [user_id], "session_events": [count]})
        return
    count, last_ts = state.get if state.exists else (0, 0)
    closed: list[int] = []
    for pdf in pdfs:
        for ts in sorted(int(t.timestamp()) for t in pdf["ts"]):
            if last_ts and ts - last_ts > _GAP_S:
                closed.append(count)
                count = 0
            count += 1
            last_ts = ts
    state.update((count, last_ts))
    state.setTimeoutDuration(_GAP_S * 1000)
    if closed:
        yield pd.DataFrame({
            "user_id": [user_id] * len(closed),
            "session_events": closed,
        })


def sessionize_stateful(stream: DataFrame) -> DataFrame:
    return (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn, _SESSION_OUT, _SESSION_STATE,
            "update", GroupStateTimeout.ProcessingTimeTimeout)
    )


def run_to_memory(
    df: DataFrame, name: str, checkpoint_dir: str, output_mode: str = "update"
):
    """Run a streaming query to completion on available data (availableNow)
    into an in-memory sink; returns the finished query."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q
