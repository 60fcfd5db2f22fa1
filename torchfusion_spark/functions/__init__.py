"""Scalar function library.

``argmax`` reproduces the reference UDF (reference src/argmax.rs:1-120):
0-based index of the maximum array element, first-max-wins on ties,
accepting float/double/int/bigint arrays. The reference returns UInt32;
Spark has no unsigned types so we return ``int`` (documented difference).

Unlike the reference (a Rust SIMD kernel), these are pure Catalyst column
expressions — they run inside whole-stage codegen on the JVM with **no
Python boundary**, so they vectorize and scale with executor cores for
free. Registered both as Python helpers and as SQL UDFs so ``sql()``
queries resolve them by name, like the reference's function registry
(src/lib.rs:134).

NaN note: Spark's ``array_max`` treats NaN as greater than any number;
the reference's SIMD argmax ignores NaN. Semantics match on NaN-free
data (all fixtures); documented here per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


def argmax(v: ColumnOrName) -> Column:
    """0-based index of the max element; first occurrence wins on ties.

    ``array_position`` is 1-based and returns the first match, matching the
    reference's first-max-wins semantics (src/argmax.rs:101-119). Null/empty
    arrays yield NULL (the reference has no null handling at all).
    """
    v = _col(v)
    return (F.array_position(v, F.array_max(v)) - F.lit(1)).cast("int").alias("argmax")


def argmin(v: ColumnOrName) -> Column:
    """0-based index of the min element (companion to argmax)."""
    v = _col(v)
    return (F.array_position(v, F.array_min(v)) - F.lit(1)).cast("int").alias("argmin")


def vec_dot(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Dot product of two numeric arrays, JVM-side (zip_with + aggregate)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def vec_norm(a: ColumnOrName) -> Column:
    """L2 norm of a numeric array."""
    return F.sqrt(
        F.aggregate(_col(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_similarity(a: ColumnOrName, b: ColumnOrName) -> Column:
    """Cosine similarity of two numeric arrays (JVM-side, no UDF)."""
    return vec_dot(a, b) / (vec_norm(a) * vec_norm(b))


# SQL UDF definitions (Spark SQL scalar functions — stay in codegen).
# Inputs declared ARRAY<DOUBLE>; Catalyst coerces float/int arrays, the same
# analyzer-inserted cast the reference relies on (SURVEY §1.2, src/udf.rs:108-115).
_SQL_FUNCTIONS = {
    "argmax": (
        "CREATE OR REPLACE TEMPORARY FUNCTION argmax(v ARRAY<DOUBLE>) RETURNS INT "
        "RETURN CAST(array_position(v, array_max(v)) AS INT) - 1"
    ),
    "argmin": (
        "CREATE OR REPLACE TEMPORARY FUNCTION argmin(v ARRAY<DOUBLE>) RETURNS INT "
        "RETURN CAST(array_position(v, array_min(v)) AS INT) - 1"
    ),
    "vec_dot": (
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_dot(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) "
        "RETURNS DOUBLE RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    ),
    "vec_norm": (
        "CREATE OR REPLACE TEMPORARY FUNCTION vec_norm(a ARRAY<DOUBLE>) "
        "RETURNS DOUBLE RETURN sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x))"
    ),
    "cosine_similarity": (
        "CREATE OR REPLACE TEMPORARY FUNCTION cosine_similarity(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>) "
        "RETURNS DOUBLE RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) "
        "/ (sqrt(aggregate(a, 0D, (acc, x) -> acc + x * x)) * sqrt(aggregate(b, 0D, (acc, x) -> acc + x * x)))"
    ),
}


def register_all(spark: SparkSession) -> None:
    """Register the SQL-callable function library into the session."""
    for ddl in _SQL_FUNCTIONS.values():
        spark.sql(ddl)
