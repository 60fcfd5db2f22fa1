"""Driver-contract smoke: entry() produces rows; every oracle key exists in
queries(); a sample of registry queries runs at sf0.001."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_queries_and_oracles_align():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    for sql in oracles.values():
        assert isinstance(sql, str) and "SELECT" in sql.upper()


# queries the driver's 50-row budget certified green in rounds 1-2
# (CORRECTNESS_r01/r02) — round 3's rotation policy moves these OUT of the
# top 50 so the budget certifies first-time surface instead
_PRIOR_DRIVER_GREEN = {
    "torch_inference_classes", "argmax_embeddings", "argmax_constructed_array",
    "values_inline_table", "fn_cast_try_cast", "fn_conditional", "fn_math",
    "fn_string_basics", "fn_array_ops", "fn_struct_map", "fn_json",
    "filter_like_family", "select_distinct", "sort_limit_offset",
    "pipeline_corpus_clean", "join_left_outer", "join_right_outer",
    "join_semi", "join_theta", "join_using", "sample_hash_stratified",
    "agg_distinct_count", "agg_approx", "agg_collect_set", "agg_cube",
    "win_running_sum", "win_lag_lead", "win_range_interval_frame",
    "win_groups_frame_rewrite", "setop_union_all", "setop_intersect_all",
    "subq_correlated_scalar", "subq_not_in", "lateral_subquery",
    "udaf_grouped_agg", "udtf_word_positions", "pivot_status_by_priority",
    "unpivot_stack", "skew_salted_agg", "skew_salted_join",
    "text_quality_stats", "cte_recursive", "dedup_exact", "sim_cosine_topk",
    "multimodal_features", "q1_pricing_summary",
}

# the round-2 failures whose fixes round 3's driver run must certify
_R02_FIXES = [
    "fn_time_bucket", "events_sessionize", "events_rollup_two_level",
    "events_range_join", "events_retention", "stream_windowed_counts",
]


def test_priority_order_is_total_and_stable():
    """Driver keys: sorted order == insertion order == priority order; the
    prefix strips back to exactly the registry names; every PRIORITY entry
    exists (no stale names); the round-3 rotation policy holds — fixes
    lead, and the 50-row budget goes to first-time names, not re-certs."""
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.plans.priority import PRIORITY

    keys = list(entry_mod.queries())
    assert keys == sorted(keys)
    names = [k.split("_", 1)[1] for k in keys]
    assert set(names) == set(REGISTRY) and len(names) == len(REGISTRY)
    assert len(set(PRIORITY)) == len(PRIORITY)
    assert set(PRIORITY) <= set(REGISTRY)
    # the round-2 failures are certified first
    assert names[: len(_R02_FIXES)] == _R02_FIXES
    # the rest of the budget is first-time surface: nothing already
    # driver-certified green occupies a top-50 slot
    assert not (_PRIOR_DRIVER_GREEN & set(names[:50]))
    # and at least 20 first-time names get their first driver row
    first_time = [n for n in names[:50] if n not in _PRIOR_DRIVER_GREEN and n not in _R02_FIXES]
    assert len(first_time) >= 20


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"vec_id", "predicted", "label"} <= set(df.columns)


def test_sample_queries_run(spark, tables):
    qs = entry_mod.queries()
    by_name = {k.split("_", 1)[1]: fn for k, fn in qs.items()}
    for name in ["q1_pricing_summary", "join_full_outer", "win_ranking", "fn_json"]:
        df = by_name[name](spark, tables)
        assert df.count() >= 0


def test_registry_builder_tunes_host_session(spark, tables):
    """A host session carrying Spark defaults (the driver's) gets the
    engine's runtime confs applied by any registry builder."""
    spark._tf_runtime_tuned = False
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    from torchfusion_spark.plans import REGISTRY

    REGISTRY["select_distinct"].builder(spark, tables)
    assert spark.conf.get("spark.sql.shuffle.partitions") != "200"
    assert spark.conf.get("spark.sql.parquet.aggregatePushdown") == "true"
