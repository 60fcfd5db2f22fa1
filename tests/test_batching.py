"""Unit tests replicating the reference's batching/flatten expectations
(src/udf.rs:289-398) — pure numpy, no Spark."""

from __future__ import annotations

import numpy as np

from torchfusion_spark.models.batching import create_batched, flatten_batched


def test_should_create_tensor():
    # reference src/udf.rs:299-352: 8 rows × 2 values, batch_size=3
    values = np.array([0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7], dtype=np.int32)
    offsets = np.array([0, 2, 4, 6, 8, 10, 12, 14, 16])
    batches = list(create_batched(values, offsets, 3))
    assert [b.shape for b in batches] == [(3, 2), (3, 2), (2, 2)]
    np.testing.assert_array_equal(batches[0], [[0, 0], [1, 1], [2, 2]])
    np.testing.assert_array_equal(batches[2], [[6, 6], [7, 7]])


def test_should_flatten_tensor_0():
    # reference src/udf.rs:354-375: 4×3 tensor → offsets [0,3,6,9,12]
    t = np.arange(12, dtype=np.float32).reshape(4, 3)
    flat, offsets = flatten_batched([t])
    np.testing.assert_array_equal(flat, np.arange(12, dtype=np.float32))
    np.testing.assert_array_equal(offsets, [0, 3, 6, 9, 12])


def test_should_flatten_tensor_1():
    # reference src/udf.rs:377-397: 2×2 tensor → offsets [0,2,4]
    t = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    flat, offsets = flatten_batched([t])
    np.testing.assert_array_equal(flat, [1.0, 2.0, 3.0, 4.0])
    np.testing.assert_array_equal(offsets, [0, 2, 4])


def test_batching_roundtrip_multiple_batches():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    offsets = np.arange(0, 44, 4)
    batches = list(create_batched(x.reshape(-1), offsets, 3))
    flat, out_offsets = flatten_batched(batches)
    np.testing.assert_array_equal(flat, x.reshape(-1))
    np.testing.assert_array_equal(out_offsets, offsets)
