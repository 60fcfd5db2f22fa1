"""Write paths — the reference's ``INSERT INTO`` / ``COPY ... TO``
surface (SURVEY §2-C sources/sinks) expressed as Spark writers.

Parquet is the default interchange format (columnar, predicate pushdown
on re-read); CSV/JSON writers cover the export formats DataFusion's
``COPY TO`` supports. ORC is Spark-native extra. Partitioned writes are
the 100 TB layout primitive (hive-style directories → partition pruning
on read)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def copy_to(df: DataFrame, path: str, fmt: str = "parquet", mode: str = "overwrite",
            partition_by: list[str] | None = None, **options) -> None:
    """COPY <rel> TO '<path>' (FORMAT <fmt>) equivalent."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def read_back(spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None,
              **options) -> DataFrame:
    reader = spark.read.format(fmt)
    if schema:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-clustered) managed table — the co-located-join
    layout primitive at 100 TB: two tables bucketed by the same key into
    the same bucket count join WITHOUT a shuffle on either side (Spark
    reads matching buckets pairwise), and bucket pruning serves point
    lookups. Optional per-bucket sort also removes the sort from
    sort-merge joins on re-read.

    This is the DataFusion-absent piece of the sources/sinks row that
    matters most at scale: partitioning handles low-cardinality prune
    keys, bucketing handles high-cardinality join keys."""
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
