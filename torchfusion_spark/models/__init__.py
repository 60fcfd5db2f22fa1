"""Model registry + inference backends (the reference's layer A).

``register_torch_udf`` is the Spark analogue of the reference's
``TorchFunctionFactory`` + ``TorchUdf`` (src/lib.rs:23-100,
src/udf.rs:20-287): fetch model bytes from a URI through a pluggable
store layer, freeze the ``torchfusion.*`` config at create time, and
register an Arrow-vectorized scalar UDF ``name(array<float>) ->
array<float>`` that runs batched forward passes.
"""

from torchfusion_spark.models.backends import load_predictor
from torchfusion_spark.models.registry import fetch_bytes, register_torch_udf

__all__ = ["fetch_bytes", "load_predictor", "register_torch_udf"]
