"""Registry for named queries with DuckDB oracles.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus an optional
ANSI-SQL oracle string DuckDB runs on the same parquet views. Column
names/aliases must be identical on both sides (driver hashes values after
sorting columns by name).

Determinism discipline (so value-hashes match bitwise):
* money/quantity sums go through DECIMAL casts (exact, order-independent),
  then CAST(... AS DOUBLE) at the end;
* order-dependent float aggregates (stddev/corr/...) are rounded on both
  sides;
* every ORDER BY carries a unique tie-break key when row order feeds a
  window/limit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator registering a builder under ``name`` with its oracle SQL."""

    def wrap(fn: Builder) -> Builder:
        def bound(spark: SparkSession, sf_dir: str) -> DataFrame:
            from torchfusion_spark.session import tune_runtime
            from torchfusion_spark.sources import load_tables

            tune_runtime(spark)  # host session may carry Spark defaults
            load_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        REGISTRY[name] = Query(name=name, builder=bound, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return bound

    return wrap
