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


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"vec_id", "predicted", "label"} <= set(df.columns)


def test_sample_queries_run(spark, tables):
    qs = entry_mod.queries()
    for name in ["q1_pricing_summary", "join_full_outer", "win_ranking", "fn_json"]:
        df = qs[name](spark, tables)
        assert df.count() >= 0
