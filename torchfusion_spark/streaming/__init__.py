"""Structured Streaming operators over the events table.

The reference exposes no streaming (SURVEY §2-C: none in DataFusion use);
this is the driver-mandated extension path. Batch parity note: each
streaming op here has the same semantics as a batch query, which is what
the oracle checks when one is registered.

Local tests drive these with the parquet file-source + memory sink and
``processAllAvailable`` (guide: Structured Streaming section); in
production the source swaps to Kafka/files-on-arrival with the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (nanos ts rebuilt, as in
    sources.load_tables)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = (
        "event_id bigint, ts bigint, user_id bigint, event_type string, "
        "value double, props string"
    )
    return (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")  # file source wants a dir
        .parquet(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )


def windowed_counts(spark: SparkSession, sf_dir: str, window: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts per event_type with a watermark — the
    canonical streaming aggregation. Run to completion over the bounded
    source and return the final result as a batch DataFrame."""
    agg = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    name = "tf_stream_windowed_counts"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("window_start", "event_type")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup on event_id within the watermark
    (dropDuplicatesWithinWatermark) — the streaming arm of the dedup
    family."""
    stream = (
        _event_stream(spark, sf_dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    name = "tf_stream_dedup_counts"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("event_type")
