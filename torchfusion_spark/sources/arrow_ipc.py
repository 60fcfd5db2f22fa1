"""Arrow IPC (Feather V2) file source/sink.

DataFusion's ``CREATE EXTERNAL TABLE ... STORED AS ARROW`` accepts Arrow
IPC files (reference `src/lib.rs:128` default features enable the arrow
format); Spark ships no arrow-file datasource, so this closes the gap
with Spark-native plumbing:

* read — ``binaryFile`` source (one row per file, non-splittable) →
  ``mapInArrow`` decoding each file's record batches executor-side. The
  Arrow schema is read from the FIRST file's footer on the driver (footer
  read only, not data) and mapped to the Spark schema, mirroring how
  DataFusion infers the table schema from the file.
* write — ``mapInArrow`` writes one ``part-*.arrow`` file per partition
  from the executor, streaming batches through ``pyarrow.ipc.new_file``
  with zero row-to-JVM round trips.

Scale notes: one file = one task on read (IPC files are not block
splittable — same constraint DataFusion has), so write partition-sized
files; parallelism = file count. All byte handling is Arrow-native
(no per-row Python).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def _first_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    names = sorted(n for n in os.listdir(path) if n.endswith(".arrow"))
    if not names:
        raise FileNotFoundError(f"no .arrow files under {path!r}")
    return os.path.join(path, names[0])


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Arrow IPC files as a DataFrame."""
    from pyspark.sql.pandas.types import from_arrow_schema

    with pa.ipc.open_file(_first_file(path)) as rd:
        arrow_schema = rd.schema
    spark_schema = from_arrow_schema(arrow_schema)

    glob = path if os.path.isfile(path) else os.path.join(path, "*.arrow")
    files = spark.read.format("binaryFile").load(glob).select("content")

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for buf in batch.column(0):
                with pa.ipc.open_file(pa.BufferReader(buf.as_py())) as rd:
                    for i in range(rd.num_record_batches):
                        yield rd.get_batch(i)

    return files.mapInArrow(decode, schema=spark_schema)


def write_arrow_ipc(df: DataFrame, path: str) -> int:
    """Write one Arrow IPC file per partition under ``path``; returns the
    number of files written. Executor-local writes — point ``path`` at
    shared storage on a real cluster."""
    os.makedirs(path, exist_ok=True)

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writer = None
        fname = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
        n = 0
        for batch in batches:
            if writer is None:
                writer = pa.ipc.new_file(fname, batch.schema)
            writer.write_batch(batch)
            n += batch.num_rows
        if writer is not None:
            writer.close()
        yield pa.RecordBatch.from_pydict(
            {"file": [fname if n else ""], "n_rows": [n]},
            schema=pa.schema([("file", pa.string()), ("n_rows", pa.int64())]),
        )

    out = df.mapInArrow(encode, schema="file string, n_rows bigint")
    return out.filter("n_rows > 0").count()


def _upcast_f16(t: pa.DataType) -> pa.DataType:
    """float16 → float32, recursing through list/fixed_size_list/struct."""
    if t == pa.float16():
        return pa.float32()
    if pa.types.is_fixed_size_list(t):
        return pa.list_(_upcast_f16(t.value_type), t.list_size)
    if pa.types.is_list(t):
        return pa.list_(_upcast_f16(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([f.with_type(_upcast_f16(f.type)) for f in t])
    return t


def read_parquet_float16(spark: SparkSession, path: str) -> DataFrame:
    """Read parquet containing FLOAT16 columns, upcast to float.

    The reference's argmax accepts ``Float16Array`` directly
    (`src/argmax.rs:72-75`); Spark's parquet reader rejects the FLOAT16
    logical type outright (``PARQUET_TYPE_ILLEGAL``), so half-precision
    embeddings are ingested here: ``binaryFile`` fan-out (one file = one
    task) → executor-side pyarrow decode → exact float16→float32 upcast
    (every half value is representable in float) — same results as the
    reference, wider in-memory storage (SURVEY §1.2, README "Known engine
    differences").
    """
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    first = path if os.path.isfile(path) else _first_parquet(path)
    src_schema = pq.read_schema(first)
    out_schema = pa.schema([f.with_type(_upcast_f16(f.type)) for f in src_schema])
    spark_schema = from_arrow_schema(out_schema)

    glob = path if os.path.isfile(path) else os.path.join(path, "*.parquet")
    files = spark.read.format("binaryFile").load(glob).select("content")

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for buf in batch.column(0):
                table = pq.read_table(pa.BufferReader(buf.as_py()))
                for rb in table.cast(out_schema).to_batches():
                    yield rb

    return files.mapInArrow(decode, schema=spark_schema)


def _first_parquet(path: str) -> str:
    names = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
    if not names:
        raise FileNotFoundError(f"no .parquet files under {path!r}")
    return os.path.join(path, names[0])
