"""argmax parity with np.argmax (reference src/argmax.rs semantics:
0-based, first-max-wins) — property-tested via hypothesis on the column
expression, plus Spark-side checks of SQL registration and type coverage."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from torchfusion_spark import functions as tff


@st.composite
def float_arrays(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    return draw(
        st.lists(
            st.floats(
                min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False, width=32
            ),
            min_size=n,
            max_size=n,
        )
    )


@pytest.fixture(scope="module")
def argmax_eval(spark):
    from pyspark.sql import functions as F

    def run(arrays: list[list[float]]) -> list[int]:
        df = spark.createDataFrame([(a,) for a in arrays], "v array<double>")
        return [r.am for r in df.select(tff.argmax("v").alias("am")).collect()]

    return run


@settings(max_examples=20, deadline=None)
@given(st.lists(float_arrays(), min_size=1, max_size=8))
def test_argmax_matches_numpy(argmax_eval, arrays):
    got = argmax_eval(arrays)
    expected = [int(np.argmax(np.array(a))) for a in arrays]
    assert got == expected


def test_argmax_first_max_wins(argmax_eval):
    # ties: argminmax (reference) and np.argmax both return the first max
    assert argmax_eval([[1.0, 3.0, 3.0, 2.0]]) == [1]
    assert argmax_eval([[5.0, 5.0]]) == [0]


def test_argmax_int_arrays(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([([3, 9, 2],), ([7, 1, 8],)], "v array<int>")
    got = [r.am for r in df.select(tff.argmax("v").alias("am")).collect()]
    assert got == [1, 2]


def test_argmax_sql_registration(spark, engine):
    # resolvable by name from SQL, like the reference registry (src/lib.rs:134)
    row = engine.sql("SELECT argmax(array(1.0, 9.0, 3.0)) AS am").collect()[0]
    assert row.am == 1
    row = engine.sql("SELECT argmin(array(1.0, 9.0, 3.0)) AS am").collect()[0]
    assert row.am == 0


def test_argmax_null_and_empty(spark):
    df = spark.createDataFrame([(None,)], "v array<double>")
    assert df.select(tff.argmax("v").alias("am")).collect()[0].am is None


def test_vector_helpers(engine):
    row = engine.sql(
        "SELECT vec_dot(array(1.0,2.0), array(3.0,4.0)) AS d, "
        "vec_norm(array(3.0,4.0)) AS n, "
        "cosine_similarity(array(1.0,0.0), array(1.0,0.0)) AS c"
    ).collect()[0]
    assert row.d == 11.0 and row.n == 5.0 and abs(row.c - 1.0) < 1e-12


def test_argmax_nan_divergence_pinned(spark):
    """DOCUMENTED divergence from the reference (functions/__init__.py
    header): the reference's SIMD argmax skips NaN via partial_cmp
    returning None (src/argmax.rs:101-119 — a NaN element never becomes
    the max), while Spark's array_max treats NaN as greater than any
    number, so a NaN element WINS here. This test pins the Spark-side
    behavior so the divergence stays load-bearing-documented; if it ever
    fails, either Spark changed NaN ordering or someone 'fixed' argmax —
    both must update the docs."""
    import math

    from torchfusion_spark import functions as tff

    df = spark.createDataFrame(
        [([1.0, float("nan"), 3.0],), ([float("nan"), 1.0, 2.0],), ([5.0, 4.0, 3.0],)],
        "v array<double>",
    )
    got = [r.am for r in df.select(tff.argmax("v").alias("am")).collect()]
    # Spark: NaN wins -> indexes 1, 0; reference would give 2, 2
    assert got == [1, 0, 0]
    # SQL registration path agrees with the column-expression path
    df.createOrReplaceTempView("nan_probe")
    sql_got = [r.am for r in spark.sql("SELECT argmax(v) AS am FROM nan_probe").collect()]
    assert sql_got == got
