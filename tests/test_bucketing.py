"""Bucketed-table co-located join: the 100 TB layout primitive. Writing
both sides bucketed by the join key into the same bucket count must let
Spark join them with ZERO shuffle exchanges (bucket-pairwise reads), and
the result must match the plain join."""

from __future__ import annotations

import contextlib
import io
import os

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def _executed_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tables):
    from torchfusion_spark.sources.sinks import write_bucketed

    write_bucketed(
        spark.table("orders").select("o_orderkey", "o_orderpriority"),
        "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        spark.table("lineitem").select("l_orderkey", "l_quantity"),
        "b_lineitem", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"],
    )
    # force the shuffle-visible SMJ path: broadcast would also avoid a
    # shuffle but wouldn't prove the bucketing co-location
    with _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        j = spark.table("b_lineitem").join(
            spark.table("b_orders"), F.expr("l_orderkey = o_orderkey")
        )
        plan = _executed_plan(j)
        assert "Exchange" not in plan, plan
        n_bucketed = j.count()

    plain = spark.table("lineitem").join(
        spark.table("orders"), F.expr("l_orderkey = o_orderkey")
    )
    assert n_bucketed == plain.count()

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_li_osr_stage_is_session_scoped(spark, tables):
    """r16 optimization-round rules: the q21 bucketed rollup must NOT be
    a cross-run artifact — the staged dir is pid-scoped (a new process
    always rebuilds from the parquet inputs, so the build cost is always
    inside the benched staging_warm_sec), while WITHIN a session the
    memo makes every later call registration-free (write_bucketed
    poisoned to prove it) and the bucketed layout reads exchange-free."""
    import torchfusion_spark.sources.sinks as sinks
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.plans.relational2 import _staged_li_by_order

    rel = _staged_li_by_order(spark)
    path = spark.sql(f"DESCRIBE TABLE EXTENDED {rel}").filter(
        "col_name = 'Location'"
    ).first().data_type.removeprefix("file:")
    # pid-scoped dir: no content-keyed cross-process reuse, and no
    # _TF_BUILT reuse marker for a second process to trust
    assert path.rstrip("/").endswith(f"_{os.getpid()}"), path
    assert not os.path.exists(os.path.join(path, "_TF_BUILT"))
    rows1 = REGISTRY["q21_waiting_supplier"].builder(spark, tables).collect()

    # same session, memo warm: a second call must not rebuild
    real = sinks.write_bucketed

    def _poisoned(*a, **k):
        raise AssertionError("memo-warm call rebuilt the staged table")

    sinks.write_bucketed = _poisoned
    try:
        rel2 = _staged_li_by_order(spark)
    finally:
        sinks.write_bucketed = real
    assert rel2 == rel
    # the staged table reads bucketed: the order-level rollup runs with
    # no Exchange below its aggregation
    agg = spark.table(rel2).groupBy("l_orderkey").count()
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan
    rows2 = REGISTRY["q21_waiting_supplier"].builder(spark, tables).collect()
    assert rows1 == rows2
