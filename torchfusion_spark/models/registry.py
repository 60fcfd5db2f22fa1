"""Model fetch + UDF registration (reference: TorchFunctionFactory,
src/lib.rs:23-100).

Flow (mirrors SURVEY §3.1): fetch bytes through a store abstraction on the
driver → snapshot ``torchfusion.*`` config (freeze-at-create,
src/lib.rs:81-94) → ``sc.broadcast`` the bytes so each executor ships them
once → iterator-form pandas UDF with a per-worker predictor cache, inner
mini-batch loop of ``batch_size`` rows (src/udf.rs:191-222 semantics via
models.batching) → ``spark.udf.register``.

The declared return type is honored exactly — the reference's
``(f64, f64)`` arm silently returns f32 (src/udf.rs:49-57); we fix that
quirk per SURVEY §2-A2.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from urllib.parse import urlparse

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import _parse_datatype_string

from torchfusion_spark.config import TorchConfig

_SPARK_TO_NUMPY = {
    "float": np.float32,
    "double": np.float64,
    "int": np.int32,
    "bigint": np.int64,
}


def _element_dtype(array_type_ddl: str) -> np.dtype:
    """Extract the numpy dtype of the array element from a DDL string.

    Analogue of the reference's optimistic ``find_item_type``
    (src/lib.rs:102-116): defaults to float32 when unparseable.
    """
    inner = array_type_ddl.strip().lower()
    if inner.startswith("array<") and inner.endswith(">"):
        inner = inner[len("array<") : -1]
    return np.dtype(_SPARK_TO_NUMPY.get(inner, np.float32))


def fetch_bytes(uri: str) -> bytes:
    """Read a model artifact from local FS / file:// / s3:// / http(s)://.

    The object-store-registry analogue (src/lib.rs:64-77; S3 wiring
    src/lib.rs:203-216). S3 credentials come from the standard AWS env/
    config chain; the optional deps are import-gated.
    """
    parsed = urlparse(uri)
    scheme = parsed.scheme
    if scheme in ("", "file"):
        path = parsed.path if scheme == "file" else uri
        with open(path, "rb") as f:
            return f.read()
    if scheme == "s3":
        try:
            import boto3
        except ImportError as e:  # pragma: no cover - env without boto3
            raise ImportError("s3:// model URIs require boto3") from e
        client_kwargs = {}
        if os.environ.get("AWS_ENDPOINT_URL"):
            client_kwargs["endpoint_url"] = os.environ["AWS_ENDPOINT_URL"]
        s3 = boto3.client("s3", **client_kwargs)
        obj = s3.get_object(Bucket=parsed.netloc, Key=parsed.path.lstrip("/"))
        return obj["Body"].read()
    if scheme in ("http", "https"):
        from urllib.request import urlopen

        with urlopen(uri) as r:  # noqa: S310 - explicit user-supplied URI
            return r.read()
    raise ValueError(f"unsupported model URI scheme: {scheme!r} ({uri})")


# Per-WORKER predictor cache (module-level: Spark reuses Python worker
# processes across tasks, so this dict outlives a task). Keyed by a
# driver-generated registration token — unique per registration, so
# CREATE OR REPLACE with new bytes gets a fresh entry while every task of
# one registration shares one deserialized model instead of re-loading
# per task (src/udf.rs loads once per UDF instance; 32 partitions ≠ 32
# torch.jit.loads).
_PREDICTOR_CACHE: dict[tuple, object] = {}


def _worker_predictor(bc, uri: str, reg_token: str, device: str, cuda_device: int):
    from torchfusion_spark.models.backends import load_predictor

    key = (reg_token, device, cuda_device)
    p = _PREDICTOR_CACHE.get(key)
    if p is None:
        if len(_PREDICTOR_CACHE) >= 8:  # bound worker memory across re-registrations
            _PREDICTOR_CACHE.clear()
        p = load_predictor(bc.value, uri, device, cuda_device)
        _PREDICTOR_CACHE[key] = p
    return p


def register_torch_udf(
    spark: SparkSession,
    name: str,
    uri: str,
    input_type: str = "array<float>",
    return_type: str = "array<float>",
) -> None:
    """Create and register the inference UDF ``name(array<I>) -> array<R>``.

    Matches the reference signature: exactly one array argument
    (src/udf.rs:108-115), deterministic/immutable (Spark default), output
    row width set by the model (src/udf.rs:242-245).
    """
    cfg = TorchConfig.from_spark(spark)  # freeze-at-create (src/lib.rs:81-94)
    model_bytes = fetch_bytes(uri)
    bc = spark.sparkContext.broadcast(model_bytes)
    import uuid

    reg_token = uuid.uuid4().hex  # per-registration worker-cache key
    in_dtype = _element_dtype(input_type)
    out_dtype = _element_dtype(return_type)
    batch_size = cfg.batch_size
    device, cuda_device = cfg.device, cfg.cuda_device

    def infer(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        from torchfusion_spark.models.batching import create_batched, flatten_batched

        predictor = _worker_predictor(bc, uri, reg_token, device, cuda_device)
        for series in it:
            if series.empty:
                yield pd.Series([], dtype=object)
                continue
            # flat values + Arrow-style offsets, so the mini-batch loop IS
            # models.batching — the kernels the reference's unit tests
            # translate against, not a parallel re-implementation
            arrs = series.to_numpy()
            offsets = np.zeros(len(arrs) + 1, dtype=np.int64)
            np.cumsum([len(a) for a in arrs], out=offsets[1:])
            values = np.concatenate(arrs).astype(in_dtype, copy=False)
            outs = [predictor(b) for b in create_batched(values, offsets, batch_size)]
            flat, _ = flatten_batched(outs)
            y = flat.reshape(len(arrs), -1).astype(out_dtype, copy=False)
            yield pd.Series(list(y))

    udf = F.pandas_udf(infer, returnType=_parse_datatype_string(return_type))
    spark.udf.register(name, udf)
