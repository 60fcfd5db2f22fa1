"""Multimodal columns (SURVEY §2-D): opaque binary payloads + typed
metadata, with decode / feature-extraction as Arrow-batched
``mapInPandas`` operators.

The container has no image/audio libraries, so the *decode* step is
stubbed exactly as mandated: a clearly-marked NotImplementedError path
for real codecs, and a deterministic byte-level feature extractor whose
Spark-side plumbing (binary Arrow batches, schema, batch shape) is real
and whose outputs a SQL oracle can reproduce independently.

Scale: mapInPandas streams Arrow batches — constant memory per task, no
shuffle; partitioning follows the input. Real image decode would slot
into `_decode_real` with zero plumbing changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, first_byte int, last_byte int, checksum16 int"
)


def attach_payload(spark: SparkSession) -> DataFrame:
    """documents → (doc_id, payload binary, meta struct<mime, n_bytes>).

    The multimodal table shape: payload is an opaque binary column (here
    utf-8 bytes standing in for image/audio), metadata is typed."""
    d = spark.table("documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_real(payload: bytes, mime: str):  # pragma: no cover - env has no codecs
    """Real decode path — image/audio libs are not in this container."""
    raise NotImplementedError(
        f"decoding {mime!r} requires codec libraries (PIL/torchaudio) not present; "
        "install them and route decode here — the Spark plumbing is unchanged"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Deterministic byte-level features via mapInPandas (Arrow batches)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1),
                    "last_byte": payloads.map(lambda b: b[-1] if len(b) else -1),
                    "checksum16": payloads.map(lambda b: sum(b[:16]) % 256),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def features_query(spark: SparkSession) -> DataFrame:
    return extract_features(attach_payload(spark)).orderBy("doc_id")


# DuckDB oracle: reproduces the byte-level features straight from the text
# (payload is its utf-8 encoding; the corpus is ASCII so char code = byte).
FEATURES_ORACLE = """
SELECT doc_id,
       'text/plain' AS mime,
       octet_length(encode(text)) AS n_bytes,
       CASE WHEN length(text) > 0 THEN unicode(substr(text, 1, 1)) ELSE -1 END AS first_byte,
       CASE WHEN length(text) > 0 THEN unicode(substr(text, length(text), 1)) ELSE -1 END AS last_byte,
       CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, least(length(text), 16) + 1),
                              i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
           (a, x) -> a + x) % 256 AS INT) AS checksum16
FROM documents ORDER BY doc_id
"""
