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


def _driver_green_names() -> set[str]:
    """Names with a green driver row in any committed CORRECTNESS_r*.json —
    derived from the artifacts rather than pinned, so each round's rotation
    test checks the *policy* (budget goes to never-certified names) against
    the actual certification history."""
    import json
    import re
    from glob import glob
    from pathlib import Path

    green: set[str] = set()
    for p in sorted(glob(str(Path(__file__).resolve().parent.parent / "CORRECTNESS_r*.json"))):
        for key, row in json.load(open(p)).items():
            if (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
            ):
                green.add(re.sub(r"^c\d+_", "", key))
    return green


def test_priority_order_is_total_and_stable():
    """Driver keys: sorted order == insertion order == priority order; the
    prefix strips back to exactly the registry names; every PRIORITY entry
    exists (no stale names); the rotation policy holds — the 50-row driver
    budget goes to names without a green CORRECTNESS row, not re-certs."""
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.plans.priority import PRIORITY

    keys = list(entry_mod.queries())
    assert keys == sorted(keys)
    names = [k.split("_", 1)[1] for k in keys]
    assert set(names) == set(REGISTRY) and len(names) == len(REGISTRY)
    assert len(set(PRIORITY)) == len(PRIORITY)
    assert set(PRIORITY) <= set(REGISTRY)
    # nothing already driver-certified green occupies a top-50 slot while
    # uncertified names remain (the re-cert tail may enter only once every
    # name has a row)
    green = _driver_green_names()
    uncertified = set(names) - green
    if len(uncertified) >= 50:
        assert not (green & set(names[:50]))
    else:
        assert uncertified <= set(names[: max(50, len(uncertified))])


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
