"""Flagship reference-parity queries: argmax + torch-function inference
(SURVEY §2-A) in the exact e2e shape of the reference's golden test
(src/lib.rs:164-170): scan → project(UDF chains) → limit.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from torchfusion_spark.functions import argmax
from torchfusion_spark.plans.registry import query


@query(
    "argmax_embeddings",
    """
    SELECT vec_id,
           CAST(list_indexof(embedding, list_aggregate(embedding, 'max')) AS INT) - 1 AS inferred,
           label
    FROM embeddings ORDER BY vec_id LIMIT 100
    """,
    doc="reference argmax UDF (src/argmax.rs): 0-based first-max index, as a pure "
    "Catalyst expression (no Python boundary)",
)
def argmax_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.table("embeddings")
    return (
        e.select("vec_id", argmax("embedding").alias("inferred"), "label")
        .orderBy("vec_id")
        .limit(100)
    )


@query(
    "argmax_constructed_array",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(list_indexof([l_quantity, l_extendedprice / 1000, l_discount * 100, l_tax * 100],
                list_aggregate([l_quantity, l_extendedprice / 1000, l_discount * 100, l_tax * 100], 'max')) AS INT) - 1 AS best_idx
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 300
    """,
    doc="argmax over a SQL-constructed array literal — the reference's "
    "`argmax(iris([sl,sw,pl,pw]))` path (README.md:65, src/lib.rs:167)",
)
def argmax_constructed_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = spark.table("lineitem")
    arr = F.array(
        F.col("l_quantity"),
        F.col("l_extendedprice") / 1000,
        F.col("l_discount") * 100,
        F.col("l_tax") * 100,
    )
    return (
        l.select("l_orderkey", "l_linenumber", argmax(arr).alias("best_idx"))
        .orderBy("l_orderkey", "l_linenumber")
        .limit(300)
    )


_MODEL_PATH: str | None = None


def _demo_model_path() -> str:
    global _MODEL_PATH
    if _MODEL_PATH is None or not os.path.exists(_MODEL_PATH):
        from torchfusion_spark.models.fixtures import write_demo_model

        path = os.path.join(tempfile.gettempdir(), "torchfusion_demo_mlp.npz")
        write_demo_model(path)
        _MODEL_PATH = path
    return _MODEL_PATH


@query(
    "torch_inference_classes",
    None,  # model inference is not SQL-expressible in DuckDB → rows-only check;
    # determinism is separately pinned by tests/test_models.py vs the numpy oracle
    doc="the reference's flagship: CREATE FUNCTION ... LANGUAGE TORCH, then "
    "SELECT argmax(model(features)) — batched vectorized inference via "
    "iterator pandas UDF (src/udf.rs:20-287 semantics)",
)
def torch_inference_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from torchfusion_spark.engine import Engine

    eng = Engine(spark)
    eng.sql("SET torchfusion.batch_size = 256")
    eng.sql(
        f"CREATE OR REPLACE FUNCTION tf_demo_classifier(FLOAT[]) RETURNS FLOAT[] "
        f"LANGUAGE TORCH AS '{_demo_model_path()}'"
    )
    return eng.sql(
        """
        SELECT vec_id,
               argmax(tf_demo_classifier(embedding)) AS predicted,
               label
        FROM embeddings ORDER BY vec_id LIMIT 100
        """
    )
