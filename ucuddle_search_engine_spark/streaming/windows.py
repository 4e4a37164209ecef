"""Windowed streaming aggregation with late-data handling.

The reference has no stream operators (its crawl loop is a polling batch
driver, crawler/main.go:451-515) — this module is part of the
training-data-pipeline surface: continuous event telemetry (ingest counters,
crawl rates — what the reference logs per iteration at crawler/main.go:504-513)
as a Structured Streaming query with a watermark for late events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def windowed_event_counts(events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """(window, event_type) → count + Σvalue; watermark bounds state for late
    rows. Works identically on a batch or streaming DataFrame (plan parity)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


def stream_event_counts(spark: SparkSession, events_dir: str, checkpoint_dir: str, queryName: str = "event_counts"):
    """File-source streaming variant writing to an in-memory sink (tests/demo);
    production swaps source/sink for kafka/parquet without touching the agg."""
    src = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    agg = windowed_event_counts(src)
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(queryName)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
