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


def _first_with_suffix(path: str, suffix: str) -> str:
    """First file under ``path`` with ``suffix`` (or ``path`` itself if it
    is a file) — the footer-read target for driver-side schema sniffing."""
    if os.path.isfile(path):
        return path
    names = sorted(n for n in os.listdir(path) if n.endswith(suffix))
    if not names:
        raise FileNotFoundError(f"no {suffix} files under {path!r}")
    return os.path.join(path, names[0])


def read_arrow_ipc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory of Arrow IPC files as a DataFrame."""
    from pyspark.sql.pandas.types import from_arrow_schema

    with pa.ipc.open_file(_first_with_suffix(path, ".arrow")) as rd:
        arrow_schema = rd.schema
    spark_schema = from_arrow_schema(arrow_schema)

    glob = path if os.path.isfile(path) else os.path.join(path, "*.arrow")
    files = spark.read.format("binaryFile").load(glob).select("content")

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for buf in batch.column(0):
                # as_buffer: zero-copy view over the binaryFile content —
                # as_py() would duplicate every file's bytes in Python
                with pa.ipc.open_file(pa.BufferReader(buf.as_buffer())) as rd:
                    for i in range(rd.num_record_batches):
                        yield rd.get_batch(i)

    return files.mapInArrow(decode, schema=spark_schema)


def write_arrow_ipc(df: DataFrame, path: str) -> tuple[int, int]:
    """Write one Arrow IPC file per non-empty partition under ``path``;
    returns ``(n_files, n_rows)`` — both tallied during the write itself,
    so sinks (COPY) never re-read the output just to count it.
    Executor-local writes — point ``path`` at shared storage on a real
    cluster.

    Task-failure safety: each partition streams into a ``.inprogress``
    temp name invisible to the reader's ``*.arrow`` glob and is renamed
    only after a successful close — a killed task leaves no footer-less
    partial for ``pa.ipc.open_file`` to choke on, and a retried task's
    fresh uuid never duplicates a file the failed attempt already
    published. An empty relation publishes ONE schema-only file from the
    driver so the write/read pair round-trips emptiness instead of
    crashing schema inference."""
    os.makedirs(path, exist_ok=True)

    def encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        writer = None
        tmp = final = None
        n = 0
        try:
            for batch in batches:
                if writer is None:
                    final = os.path.join(path, f"part-{uuid.uuid4().hex}.arrow")
                    tmp = final + ".inprogress"
                    writer = pa.ipc.new_file(tmp, batch.schema)
                writer.write_batch(batch)
                n += batch.num_rows
            if writer is not None:
                writer.close()
                writer = None
                os.rename(tmp, final)
        finally:
            if writer is not None:  # error path: drop the partial file
                writer.close()
                try:
                    os.remove(tmp)
                except OSError:
                    pass
        yield pa.RecordBatch.from_pydict(
            {"file": [final if n else ""], "n_rows": [n]},
            schema=pa.schema([("file", pa.string()), ("n_rows", pa.int64())]),
        )

    out = df.mapInArrow(encode, schema="file string, n_rows bigint")
    res = out.selectExpr(
        "count(if(n_rows > 0, 1, NULL)) AS files", "coalesce(sum(n_rows), 0) AS rows"
    ).collect()[0]
    n_files, n_rows = int(res["files"]), int(res["rows"])
    if n_files == 0:
        from pyspark.sql.pandas.types import to_arrow_schema

        with pa.ipc.new_file(
            os.path.join(path, "part-empty.arrow"), to_arrow_schema(df.schema)
        ):
            pass
        n_files = 1
    return n_files, n_rows


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

    first = _first_with_suffix(path, ".parquet")
    src_schema = pq.read_schema(first)
    out_schema = pa.schema([f.with_type(_upcast_f16(f.type)) for f in src_schema])
    spark_schema = from_arrow_schema(out_schema)

    glob = path if os.path.isfile(path) else os.path.join(path, "*.parquet")
    files = spark.read.format("binaryFile").load(glob).select("content")

    def decode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            for buf in batch.column(0):
                table = pq.read_table(pa.BufferReader(buf.as_buffer()))
                for rb in table.cast(out_schema).to_batches():
                    yield rb

    return files.mapInArrow(decode, schema=spark_schema)
