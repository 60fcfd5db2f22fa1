"""The UDF surface beyond scalar pandas_udf (SURVEY §2-C UDF row):
UDAF via GROUPED_AGG pandas_udf, grouped-map via applyInPandas, and a
Python UDTF — each oracle-checked.

Determinism discipline: Python-side float accumulation visits rows in
partition order, which no SQL oracle can reproduce bit-exactly, so the
UDAF sums integer cents (exact in int64 on both sides) and the grouped
map emits differences of doubles with exact 2-decimal representations
(single subtraction — no accumulation order at all).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from torchfusion_spark.plans.registry import query


@query(
    "udaf_grouped_agg",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="user-defined aggregate as a GROUPED_AGG pandas_udf (Arrow-batched, "
    "partial-per-partition like any UDAF); integer-cents accumulation so "
    "the result is order-independent and hash-exact vs the oracle",
)
def udaf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    @pandas_udf("bigint")
    def total_cents(price: pd.Series) -> int:
        return int(price.mul(100).round().astype("int64").sum())

    return (
        spark.table("lineitem")
        .groupBy("l_returnflag")
        .agg(total_cents("l_extendedprice").alias("total_cents"))
        .orderBy("l_returnflag")
    )


@query(
    "applyinpandas_spread",
    """
    SELECT l_returnflag, l_orderkey, l_linenumber,
           l_extendedprice - MIN(l_extendedprice) OVER (PARTITION BY l_returnflag) AS price_over_min
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    """,
    doc="grouped-map applyInPandas: per-group transform with the whole "
    "group as one pandas frame (custom normalization shape); exact "
    "double subtraction, so the window-function oracle hash-matches. "
    "One-quarter slice: the witness shape is identical, the Python "
    "round-trip and gate canonicalization don't pay for 60k rows",
)
def applyinpandas_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    def spread(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["l_returnflag", "l_orderkey", "l_linenumber"]].copy()
        out["price_over_min"] = pdf["l_extendedprice"] - pdf["l_extendedprice"].min()
        return out

    return (
        spark.table("lineitem")
        .filter("l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'")
        .groupBy("l_returnflag")
        .applyInPandas(
            spread,
            schema="l_returnflag string, l_orderkey bigint, l_linenumber int, price_over_min double",
        )
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber")
    )


@query(
    "udtf_word_positions",
    """
    SELECT doc_id, CAST(pos AS INT) AS pos, word
    FROM (
        SELECT doc_id, unnest(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) AS word,
               unnest(range(1, len(string_split(translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'), ' ')) + 1)) AS pos
        FROM documents WHERE doc_id < 50)
    WHERE word <> ''
    ORDER BY doc_id, pos
    """,
    doc="Python UDTF (Spark 3.5+ table function): one input row → N output "
    "rows via LATERAL join, the tokenizer shape; oracle = unnest",
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    import string

    _ASCII_FOLD = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)

    @udtf(returnType="pos int, word string")
    class WordPositions:
        def eval(self, text: str):
            if text is None:
                return
            # ASCII-only fold, mirroring the oracle's translate() —
            # Python str.lower() follows the Java-style unicode case
            # map ('İ' -> 'i' + combining dot) that the engines
            # disagree on (r11 lower_ascii discipline)
            folded = text.translate(_ASCII_FOLD)
            for i, w in enumerate(folded.split(" ")):
                if w:
                    yield i + 1, w

    spark.udtf.register("word_positions", WordPositions)
    return spark.sql(
        """
        SELECT d.doc_id, w.pos, w.word
        FROM documents d, LATERAL word_positions(d.text) w
        WHERE d.doc_id < 50
        ORDER BY d.doc_id, w.pos
        """
    )
