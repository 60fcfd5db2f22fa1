"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's golden e2e shape,
src/lib.rs:164-170: CREATE FUNCTION ... LANGUAGE TORCH → SELECT
argmax(model(features))). ``queries()``/``oracle_sql()`` expose the full
operator registry from ``torchfusion_spark.plans`` (SURVEY.md §2 coverage).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.session import configure

    configure(spark)
    return REGISTRY["torch_inference_classes"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Keys are ``c{rank:03d}_{name}``: a stable coverage-priority prefix
    (``torchfusion_spark/plans/priority.py``) so a budget-capped run —
    alphabetical or insertion-order — tests one witness of every component
    before the second witness of any. The suffix is the canonical name used
    by bench.py / tools/verify_local.py / tests.
    """
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.plans.priority import prioritized_names

    return {key: REGISTRY[name].builder for key, name in prioritized_names(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted → rows-only check)."""
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.plans.priority import prioritized_names

    return {
        key: REGISTRY[name].oracle
        for key, name in prioritized_names(REGISTRY)
        if REGISTRY[name].oracle is not None
    }
