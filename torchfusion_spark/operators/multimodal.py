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
    utf-8 bytes standing in for image/audio), metadata is typed.

    Fanned out first: the local documents parquet is one split, and every
    downstream op here is per-row Python work — the one case where a
    single-partition input serializes the whole job. Width adapts to the
    row count (cpu_fanout): full parallelism at scale, a handful of tasks
    for the small correctness-gate inputs."""
    from torchfusion_spark.session import cpu_fanout

    d = cpu_fanout(spark.table("documents"))
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
            # a NULL text row arrives as payload None — the row must come
            # through with SQL semantics (NULL n_bytes/checksum, the CASE
            # ELSE -1 for the byte probes), not die in len(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": payloads.map(len, na_action="ignore"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if b is not None and len(b) else -1
                    ),
                    "last_byte": payloads.map(
                        lambda b: b[-1] if b is not None and len(b) else -1
                    ),
                    "checksum16": payloads.map(
                        lambda b: sum(b[:16]) % 256, na_action="ignore"
                    ),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)


def features_query(spark: SparkSession) -> DataFrame:
    return extract_features(attach_payload(spark)).orderBy("doc_id")


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int, frame_sum int"
FRAME_BYTES = 32
FRAME_EVERY = 4  # sample every 4th frame


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame-sampling plumbing (video stand-in): the payload is a stream
    of fixed-size frames; emit every ``FRAME_EVERY``-th frame's metadata.
    One input row fans out to N output rows — the mapInPandas shape real
    video frame extraction uses (decoder would replace the byte slicing)."""
    step = FRAME_BYTES * FRAME_EVERY

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in ("doc_id", "frame_idx", "frame_offset", "frame_sum")}
            for did, b in zip(pdf["doc_id"], pdf["payload"]):
                if b is None:  # NULL payload: no frames (oracle: range(NULL) unnests to 0 rows)
                    continue
                for idx, off in enumerate(range(0, len(b), step)):
                    rows["doc_id"].append(did)
                    rows["frame_idx"].append(idx)
                    rows["frame_offset"].append(off)
                    rows["frame_sum"].append(sum(b[off : off + FRAME_BYTES]) % 65536)
            yield pd.DataFrame(rows)

    return df.mapInPandas(op, schema=FRAME_SCHEMA)


def frames_query(spark: SparkSession) -> DataFrame:
    return sample_frames(attach_payload(spark)).orderBy("doc_id", "frame_idx")


# Oracle: same frame slicing straight off the text (ASCII ⇒ byte == char code).
FRAMES_ORACLE = f"""
WITH f AS (
    SELECT doc_id, text, length(text) AS n,
           unnest(range(0, (length(text) + {FRAME_BYTES * FRAME_EVERY} - 1) // {FRAME_BYTES * FRAME_EVERY})) AS i
    FROM documents)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       CAST(i * {FRAME_BYTES * FRAME_EVERY} AS INT) AS frame_offset,
       CAST(list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(
                   range(i * {FRAME_BYTES * FRAME_EVERY} + 1,
                         least(i * {FRAME_BYTES * FRAME_EVERY} + {FRAME_BYTES}, n) + 1),
                   j -> CAST(unicode(substr(text, CAST(j AS INT), 1)) AS BIGINT))),
           (a, x) -> a + x) % 65536 AS INT) AS frame_sum
FROM f ORDER BY doc_id, frame_idx
"""


THUMB_WIDTH = 16
# thumb serialized to a csv string: the driver's canonicalizer can't hash
# list cells, and a 16-int vector survives the round-trip losslessly
RESIZE_SCHEMA = "doc_id bigint, thumb string"


def byte_thumbnail(df: DataFrame) -> DataFrame:
    """Resize plumbing (image stand-in): downsample the payload to a
    fixed-width vector by stride sampling — the decode→resize→features
    UDF shape with the codec call stubbed to byte arithmetic."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for b in pdf["payload"]:
                n = len(b) if b is not None else 0  # NULL → '' (oracle's COALESCE arm)
                if n == 0:
                    thumbs.append("")
                    continue
                stride = -(-n // THUMB_WIDTH)
                thumbs.append(
                    ",".join(str(b[j * stride]) for j in range(THUMB_WIDTH) if j * stride < n)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "thumb": thumbs})

    return df.mapInPandas(op, schema=RESIZE_SCHEMA)


def thumbnail_query(spark: SparkSession) -> DataFrame:
    return byte_thumbnail(attach_payload(spark)).orderBy("doc_id")


RESIZE_ORACLE = f"""
SELECT doc_id,
       COALESCE(array_to_string(list_transform(
           list_filter(range(0, {THUMB_WIDTH}),
                       j -> j * ((length(text) + {THUMB_WIDTH - 1}) // {THUMB_WIDTH}) < length(text)),
           j -> CAST(unicode(substr(text,
                    CAST(j * ((length(text) + {THUMB_WIDTH - 1}) // {THUMB_WIDTH}) + 1 AS INT),
                    1)) AS INT)), ','), '') AS thumb
FROM documents ORDER BY doc_id
"""


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
