"""Query plan library — the engine's demonstrable operator surface.

Every operator family from SURVEY.md §2 (Tier B: demonstrated by the
reference's SQL; Tier C: the engine surface DataFusion ships and Spark
matches; Tier D: driver-mandated extensions) is witnessed by a named
query here, each with a DuckDB oracle where SQL-expressible.

Import side effect: importing this package populates ``REGISTRY``.
"""

from torchfusion_spark.plans.registry import REGISTRY, Query, query

from torchfusion_spark.plans import relational  # noqa: E402,F401
from torchfusion_spark.plans import relational2  # noqa: E402,F401
from torchfusion_spark.plans import functions_sweep  # noqa: E402,F401
from torchfusion_spark.plans import inference  # noqa: E402,F401
from torchfusion_spark.plans import extensions  # noqa: E402,F401
from torchfusion_spark.plans import tpch_extra  # noqa: E402,F401
from torchfusion_spark.plans import udf_surface  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
