"""Streaming operators: batch-parity for the windowed agg (covered in
test_extensions), streaming dedup, and the custom stateful operator."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_stream_dedup_counts_match_batch(spark, tables):
    from torchfusion_spark import streaming

    got = {r.event_type: r.n for r in streaming.stream_dedup(spark, tables).collect()}
    want = {
        r.event_type: r.n
        for r in spark.table("events")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_stateful_user_stats_match_batch(spark, tables):
    from torchfusion_spark import streaming

    got = {r.user_id: (r.n_events, r.total_value) for r in
           streaming.stateful_user_stats(spark, tables).collect()}
    want = {
        r.user_id: (r.n, r.total)
        for r in spark.table("events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")) / F.lit(100.0)
            ).alias("total"),
        )
        .collect()
    }
    # exact equality: the stateful operator keeps integer hundredths in
    # state, so the emitted double is order-independent
    assert got == want


def test_exactly_once_sink_idempotent_rerun(spark, tables, tmp_path):
    """foreachBatch idempotent sink: a second full replay (same bounded
    source, fresh stream) leaves the sink EXACTLY as after the first run
    — batch-keyed dynamic partition overwrite, no duplicate rows — and
    the content matches the batch aggregation."""
    from pyspark.sql import functions as F

    from torchfusion_spark import streaming

    sf_dir = tables  # the fixture's sf dir — must match spark.table("events")
    out = str(tmp_path / "stream_sink")
    first = streaming.exactly_once_sink(spark, sf_dir, out).drop("batch").toPandas()
    second = streaming.exactly_once_sink(spark, sf_dir, out).drop("batch").toPandas()

    key = ["window_start", "event_type"]
    a = first.sort_values(key).reset_index(drop=True)
    b = second.sort_values(key).reset_index(drop=True)
    assert a.equals(b), "replay must be a no-op rewrite, not an append"

    batch = (
        spark.table("events")
        .withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.expr("CAST(value * 100 AS BIGINT)")).alias("cents"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "cents")
        .toPandas()
        .sort_values(key)
        .reset_index(drop=True)
    )
    assert a[["n", "cents"]].astype("int64").equals(batch[["n", "cents"]].astype("int64"))
