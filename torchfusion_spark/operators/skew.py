"""Skew-handling primitives for hot keys (SURVEY §2-D scale discipline).

AQE's skew-join splitting (enabled in the session factory) covers most
cases at runtime; these operators are the explicit fallback for *known*
hot keys, where pre-salting beats runtime splitting:

* ``salted_aggregate`` — two-phase aggregation: shuffle on (key, salt)
  first so no single reducer owns a hot key, then combine the partials.
  Exact for decomposable aggregates (sum/count/min/max).
* ``salted_join`` — big side gets a per-row salt, small side is
  replicated across all salts; the join key becomes (key, salt), fanning
  a hot key's rows across n reducers. Replication factor n on the small
  side is the price; n = expected skew factor.

Both are result-identical to their unsalted forms — which is exactly
what their oracle queries assert.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted partial → final) aggregation.

    ``aggs`` maps output name → aggregate expression for the partial
    phase; partials are recombined with SUM, so pass sum/count-style
    aggregates (count becomes a sum of partial counts)."""
    salted = df.withColumn("_salt", F.monotonically_increasing_id() % n_salts)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in aggs]
    )


def salted_join(
    big: DataFrame, small: DataFrame, key: str, n_salts: int = 8, how: str = "inner"
) -> DataFrame:
    """Equi-join with the hot-key fan-out: big side salted per row, small
    side replicated across salts."""
    big_s = big.withColumn("_salt", (F.monotonically_increasing_id() % n_salts).cast("int"))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    small_s = small.withColumn("_salt", salts)
    return big_s.join(small_s, [key, "_salt"], how).drop("_salt")
