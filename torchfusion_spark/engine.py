"""The SQL front door — ``Engine.sql()``.

Spark SQL has no ``FunctionFactory`` hook and no ``LANGUAGE TORCH``; the
engine recognizes exactly the statement shapes the reference adds and
delegates everything else to ``spark.sql()`` untouched (so the full Spark
SQL surface is the engine surface, the way DataFusion's was the
reference's — SURVEY §0 layer B):

* ``CREATE [OR REPLACE] FUNCTION <name>([arg] T[]) [RETURNS R[]]
  LANGUAGE TORCH AS '<uri>'``  → model registry (reference src/lib.rs:23-100)
* ``SET torchfusion.<key> = <value>``  → validated config set
  (reference src/config.rs:38-57)
* references to ``information_schema.df_settings`` → rewritten to a
  settings view (torchfusion namespace + engine confs), emulating
  DataFusion's df_settings (reference src/config.rs:59-78, README.md:97-108)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from torchfusion_spark import config as tf_config

# SQL array-type token (FLOAT[] / ARRAY<FLOAT>) → Spark DDL type. Default
# item type Float32 when omitted, as in the reference (src/lib.rs:35-49).
_SQL_TYPE_MAP = {
    "float": "float",
    "real": "float",
    "double": "double",
    "int": "int",
    "integer": "int",
    "bigint": "bigint",
    "long": "bigint",
}

_CREATE_FUNCTION_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?FUNCTION\s+(?P<name>[A-Za-z_]\w*)\s*"
    r"\(\s*(?P<args>[^)]*)\s*\)\s*"
    r"(?:RETURNS\s+(?P<ret>[A-Za-z]+\s*\[\s*\]|ARRAY\s*<\s*[A-Za-z]+\s*>)\s+)?"
    r"LANGUAGE\s+TORCH"
    r"(?:\s+AS\s+(?P<body>'[^']*'|\S+))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_SET_TORCH_RE = re.compile(
    r"^\s*SET\s+(?P<key>torchfusion\.\w+)\s*=\s*(?P<value>.+?)\s*;?\s*$",
    re.IGNORECASE,
)

# The reference's table DDL (src/lib.rs:148-150, README.md:42). Spark
# without Hive support rejects STORED AS; translate to USING <format>.
_EXTERNAL_TABLE_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?EXTERNAL\s+TABLE\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"STORED\s+AS\s+(?P<fmt>\w+)\s+"
    r"LOCATION\s+(?P<loc>'[^']*')\s*;?\s*$",
    re.IGNORECASE,
)

_DF_SETTINGS_RE = re.compile(r"information_schema\.df_settings", re.IGNORECASE)

# DataFusion's EXPLAIN ANALYZE (execute + annotated plan). Spark has no
# SQL-level equivalent; emulate: run the query, return the final
# (AQE-resolved) physical plan plus execution counters.
_EXPLAIN_ANALYZE_RE = re.compile(
    r"^\s*EXPLAIN\s+ANALYZE\s+(?P<q>.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)


def _parse_array_type(token: str | None) -> str:
    """``FLOAT[]`` / ``ARRAY<FLOAT>`` / bare ``FLOAT`` → Spark DDL array type."""
    if not token:
        return "array<float>"
    t = token.strip().lower().rstrip(";")
    m = re.match(r"^array\s*<\s*(\w+)\s*>$", t)
    if m:
        item = m.group(1)
    elif t.endswith("[]"):
        item = t[:-2].strip()
    else:
        item = t
    return f"array<{_SQL_TYPE_MAP.get(item, 'float')}>"


class Engine:
    """Session wrapper: ``Engine(spark).sql(text)`` is the user entry point,
    the analogue of ``ctx.sql`` on the reference's configured context."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        from torchfusion_spark.session import configure

        configure(spark)

    # -- statement handlers -------------------------------------------------

    def _create_torch_function(self, m: re.Match) -> DataFrame:
        from torchfusion_spark.models.registry import register_torch_udf

        body = m.group("body")
        if not body or not (body.startswith("'") and body.endswith("'")):
            # reference: config_err "model file should be specified" (src/lib.rs:58-61)
            raise ValueError("model file should be specified")
        uri = body[1:-1]
        args = (m.group("args") or "").strip()
        # arg may be "FLOAT[]" or "name FLOAT[]"; only the type matters
        arg_type_token = args.split()[-1] if args else None
        input_type = _parse_array_type(arg_type_token)
        ret_token = m.group("ret")
        # reference: return item type defaults to the input item type (src/lib.rs:46-49)
        return_type = _parse_array_type(ret_token) if ret_token else input_type
        register_torch_udf(
            self.spark, m.group("name"), uri, input_type=input_type, return_type=return_type
        )
        return self.spark.createDataFrame(
            [(m.group("name"), uri, input_type, return_type)],
            "function string, model string, input string, returns string",
        )

    def _set_torch_option(self, m: re.Match) -> DataFrame:
        key, value = m.group("key"), m.group("value").strip().strip("'\"")
        tf_config.set_option(self.spark, key, value)
        return self.spark.createDataFrame([(key, value)], "key string, value string")

    def settings(self) -> DataFrame:
        """The df_settings emulation: torchfusion.* entries (with the
        reference's descriptions) plus every engine conf from ``SET -v``."""
        torch_rows = tf_config.settings_df(self.spark)
        engine_rows = (
            self.spark.sql("SET -v")
            .select(
                F.col("key").alias("name"),
                F.col("value").cast("string").alias("value"),
                F.col("meaning").alias("description"),
            )
        )
        return torch_rows.unionByName(engine_rows)

    def _explain_analyze(self, query_text: str) -> DataFrame:
        """Execute, then return the final physical plan (AQE-resolved, so
        runtime re-plans are visible — the analyze half DataFusion shows as
        per-operator metrics) with execution counters appended."""
        import time

        df = self.sql(query_text)  # recursive dispatch: df_settings etc. apply
        t0 = time.time()
        n = df.count()
        elapsed_ms = round((time.time() - t0) * 1000, 1)
        plan = df._jdf.queryExecution().executedPlan().toString()
        summary = f"== Analyzed: {n} rows, {elapsed_ms} ms =="
        return self.spark.createDataFrame(
            [(f"{plan}\n{summary}",)], "plan string"
        )

    # -- dispatch -----------------------------------------------------------

    def sql(self, text: str) -> DataFrame:
        m = _EXPLAIN_ANALYZE_RE.match(text)
        if m:
            return self._explain_analyze(m.group("q"))
        m = _CREATE_FUNCTION_RE.match(text)
        if m:
            return self._create_torch_function(m)
        m = _SET_TORCH_RE.match(text)
        if m:
            return self._set_torch_option(m)
        m = _EXTERNAL_TABLE_RE.match(text)
        if m:
            fmt = m.group("fmt").lower()
            if fmt == "arrow":
                # DataFusion's STORED AS ARROW (reference src/lib.rs:128
                # default features); Spark has no arrow-file datasource, so
                # route through the IPC reader (sources/arrow_ipc.py)
                from torchfusion_spark.sources.arrow_ipc import read_arrow_ipc

                name = m.group("name")
                read_arrow_ipc(self.spark, m.group("loc")[1:-1]).createOrReplaceTempView(name)
                return self.spark.table(name)
            return self.spark.sql(
                f"CREATE OR REPLACE TEMPORARY VIEW {m.group('name')} "
                f"USING {fmt} OPTIONS (path {m.group('loc')})"
            )
        if _DF_SETTINGS_RE.search(text):
            self.settings().createOrReplaceTempView("df_settings")
            text = _DF_SETTINGS_RE.sub("df_settings", text)
        return self.spark.sql(text)
