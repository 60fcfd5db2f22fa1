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
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for u, (n, total) in want.items():
        assert got[u][0] == n
        assert abs(got[u][1] - total) < 0.05  # python-float vs spark-double sum order
