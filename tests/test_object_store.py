"""Object-store path tests without network — the sandbox analogue of the
reference's gated MinIO integration test (reference src/lib.rs:199-267),
which registers an S3 store for both the external table and the model URI.
Here: ``fetch_bytes`` URI dispatch against a mocked boto3 client, and
``configure_s3`` Hadoop-conf wiring for s3a:// table paths."""

from __future__ import annotations

import sys
import types

import pytest


class _FakeBody:
    def __init__(self, data: bytes):
        self._data = data

    def read(self) -> bytes:
        return self._data


class _FakeS3Client:
    def __init__(self, store: dict, calls: list, **kwargs):
        self._store = store
        self.kwargs = kwargs
        calls.append(kwargs)

    def get_object(self, Bucket: str, Key: str):
        return {"Body": _FakeBody(self._store[(Bucket, Key)])}


@pytest.fixture()
def fake_boto3(monkeypatch):
    """Install a minimal boto3 stand-in so the s3:// arm is exercised
    without the dependency or network."""
    store: dict = {}
    calls: list = []
    mod = types.ModuleType("boto3")
    mod.client = lambda service, **kw: _FakeS3Client(store, calls, **kw)
    monkeypatch.setitem(sys.modules, "boto3", mod)
    return store, calls


def test_fetch_bytes_s3_dispatch(fake_boto3, monkeypatch):
    from torchfusion_spark.models.registry import fetch_bytes

    store, calls = fake_boto3
    store[("models", "simple/model.pt")] = b"\x00torch-bytes"
    monkeypatch.delenv("AWS_ENDPOINT_URL", raising=False)
    assert fetch_bytes("s3://models/simple/model.pt") == b"\x00torch-bytes"
    assert calls[-1] == {}  # default AWS chain, no endpoint override


def test_fetch_bytes_s3_custom_endpoint(fake_boto3, monkeypatch):
    """MinIO-style deployments point AWS_ENDPOINT_URL at the local store —
    the analogue of the reference's endpoint registration
    (src/lib.rs:203-216)."""
    from torchfusion_spark.models.registry import fetch_bytes

    store, calls = fake_boto3
    store[("bucket", "m.pt")] = b"abc"
    monkeypatch.setenv("AWS_ENDPOINT_URL", "http://localhost:9000")
    assert fetch_bytes("s3://bucket/m.pt") == b"abc"
    assert calls[-1] == {"endpoint_url": "http://localhost:9000"}


def test_fetch_bytes_local_and_file_uri(tmp_path):
    from torchfusion_spark.models.registry import fetch_bytes

    p = tmp_path / "model.bin"
    p.write_bytes(b"localbytes")
    assert fetch_bytes(str(p)) == b"localbytes"
    assert fetch_bytes(f"file://{p}") == b"localbytes"


def test_fetch_bytes_unknown_scheme():
    from torchfusion_spark.models.registry import fetch_bytes

    with pytest.raises(ValueError, match="unsupported model URI scheme"):
        fetch_bytes("gopher://nope/model.pt")


def test_configure_s3_wires_hadoop_conf(spark):
    from torchfusion_spark.sources import configure_s3

    configure_s3(
        spark,
        endpoint="http://localhost:9000",
        access_key="AK",
        secret_key="SK",
        path_style=True,
    )
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    assert conf.get("fs.s3a.endpoint") == "http://localhost:9000"
    assert conf.get("fs.s3a.access.key") == "AK"
    assert conf.get("fs.s3a.secret.key") == "SK"
    assert conf.get("fs.s3a.path.style.access") == "true"


@pytest.mark.parametrize(
    ("device", "probe"),
    [("cpu", None), ("cuda", "_has_cuda"), ("mps", "_has_mps"), ("vulkan", "_has_vulkan")],
)
def test_device_validation_recognizes_all_backends(monkeypatch, device, probe):
    """cpu/cuda/mps/vulkan are all *recognized* (reference
    src/config.rs:82-92); availability gates acceptance, and an available
    backend round-trips through validate()."""
    from torchfusion_spark import config as tf_config

    if probe is not None:
        monkeypatch.setattr(tf_config, probe, lambda: True)
    assert tf_config.validate("torchfusion.device", device) == device
    if probe is not None:
        monkeypatch.setattr(tf_config, probe, lambda: False)
        with pytest.raises(tf_config.TorchConfigError, match="not supported"):
            tf_config.validate("torchfusion.device", device)


def test_device_validation_rejects_unknown():
    from torchfusion_spark import config as tf_config

    with pytest.raises(tf_config.TorchConfigError, match="not supported"):
        tf_config.validate("torchfusion.device", "tpu")
