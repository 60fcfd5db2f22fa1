"""Format-drift canary: the driver's testdata has shipped ``events.ts`` in
two parquet vintages — INT64 TIMESTAMP(NANOS) (round 1) and plain
microsecond no-timezone ``timestamp[us]`` (round 2, which Spark 4 infers as
TIMESTAMP_NTZ and which silently broke every ``unix_micros(ts)`` consumer
plus the streaming reader). This test writes BOTH vintages and asserts the
batch reader and the streaming reader normalize each to a proper TIMESTAMP
with identical epoch values, so the next regeneration fails loudly HERE
instead of crashing the round bench (round-2 postmortem, VERDICT.md)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

# naive wall-clock instants, interpreted as UTC by engine convention
_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0),
    dt.datetime(2024, 1, 1, 0, 5, 30),
    dt.datetime(2024, 1, 2, 12, 0, 0, 250_000),
]
_EPOCH_MICROS = [
    int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000) for t in _TS
]


def _write_events(dir_path: str, unit: str) -> None:
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([10, 20, 30], pa.int64()),
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    # version 2.6 preserves TIMESTAMP(NANOS); µs stays timestamp[us] no-tz
    pq.write_table(table, f"{dir_path}/events.parquet", version="2.6")


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_read_table_normalizes_both_vintages(spark, tmp_path, unit):
    d = tmp_path / f"batch_{unit}"
    d.mkdir()
    _write_events(str(d), unit)
    # verify the fixture wrote the vintage it claims to
    assert str(pq.read_schema(f"{d}/events.parquet").field("ts").type) == f"timestamp[{unit}]"

    from torchfusion_spark.sources import read_table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = read_table(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp", f"{unit}: ts read as {dict(df.dtypes)['ts']}"
    # unix_micros is exactly the call that broke on NTZ; also pins the values
    got = [
        r["m"]
        for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("m")).collect()
    ]
    assert got == _EPOCH_MICROS


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_event_stream_normalizes_both_vintages(spark, tmp_path, unit):
    d = tmp_path / f"stream_{unit}"
    d.mkdir()
    _write_events(str(d), unit)

    from torchfusion_spark.streaming import _event_stream, _run_to_memory

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = _event_stream(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    agg = stream.agg(
        F.min(F.unix_micros("ts")).alias("lo"), F.max(F.unix_micros("ts")).alias("hi")
    )
    row = _run_to_memory(spark, agg, f"tf_canary_{unit}", "complete").collect()[0]
    # the round-2 failure mode produced ~1970 values (µs div 1000); pin exact
    assert (row["lo"], row["hi"]) == (min(_EPOCH_MICROS), max(_EPOCH_MICROS))


def test_nanos_sniff_handles_part_file_directory(spark, tmp_path):
    """ADVICE r06: a table shipped as a DIRECTORY of part files (which
    spark.read.parquet accepts) must still have its TIMESTAMP(NANOS)
    columns detected — pq.read_schema can't open a directory, and the
    old blanket except returned (), silently leaving ts as bigint."""
    d = tmp_path / "events.parquet"  # table path IS the directory
    d.mkdir()
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(_TS, pa.timestamp("ns")),
        }
    )
    pq.write_table(table, str(d / "part-00000.parquet"), version="2.6")

    from torchfusion_spark.sources import _nanos_ts_columns, read_table

    assert _nanos_ts_columns(str(d)) == ("ts",)
    df = read_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r["m"]
        for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("m")).collect()
    ]
    assert got == _EPOCH_MICROS
