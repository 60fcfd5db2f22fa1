"""Deterministic model fixtures (FIXTURES.md §3).

The reference ships ``model/iris.spt`` — a TorchScript MLP
Linear→ReLU→Linear→ReLU→Linear (4→3). Torch is absent here, so the golden
tests use a same-shaped MLP with weights fixed by seed, saved in the
``.npz`` format that :mod:`torchfusion_spark.models.backends` executes.
The same weights are usable from plain numpy as the oracle.
"""

from __future__ import annotations

import io

import numpy as np


def mlp_weights(
    in_dim: int = 64, hidden: int = 32, out_dim: int = 10, seed: int = 7
) -> list[tuple[np.ndarray, np.ndarray]]:
    rng = np.random.default_rng(seed)
    dims = [in_dim, hidden, hidden, out_dim]
    return [
        (
            rng.standard_normal((dims[i + 1], dims[i]), dtype=np.float32) / np.sqrt(dims[i]),
            rng.standard_normal(dims[i + 1], dtype=np.float32) * 0.1,
        )
        for i in range(len(dims) - 1)
    ]


def mlp_bytes(in_dim: int = 64, hidden: int = 32, out_dim: int = 10, seed: int = 7) -> bytes:
    buf = io.BytesIO()
    arrays = {}
    for i, (w, b) in enumerate(mlp_weights(in_dim, hidden, out_dim, seed)):
        arrays[f"W{i}"] = w
        arrays[f"b{i}"] = b
    np.savez(buf, **arrays)
    return buf.getvalue()


def write_demo_model(path: str, in_dim: int = 64, hidden: int = 32, out_dim: int = 10, seed: int = 7) -> str:
    with open(path, "wb") as f:
        f.write(mlp_bytes(in_dim, hidden, out_dim, seed))
    return path


def oracle_predict(x: np.ndarray, in_dim: int = 64, hidden: int = 32, out_dim: int = 10, seed: int = 7) -> np.ndarray:
    """Reference forward pass for tests (same math as the npz backend)."""
    out = x.astype(np.float32)
    layers = mlp_weights(in_dim, hidden, out_dim, seed)
    for j, (w, b) in enumerate(layers):
        out = out @ w.T + b
        if j != len(layers) - 1:
            out = np.maximum(out, 0.0)
    return out
