"""Golden e2e inference tests — the Spark analogue of the reference's
src/lib.rs:143-197 test: table → CREATE FUNCTION ... LANGUAGE TORCH →
argmax(model(features)) vs a known oracle; plus batch-size invariance
(reference loop semantics src/udf.rs:250-287 demand output independent of
batch_size) and freeze-at-create config semantics (src/lib.rs:81-94)."""

from __future__ import annotations

import numpy as np
import pytest

from torchfusion_spark.models.fixtures import mlp_bytes, oracle_predict, write_demo_model


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    return write_demo_model(str(tmp_path_factory.mktemp("models") / "demo.npz"))


def _predicted(engine, fn_name: str, limit: int = 50):
    rows = engine.sql(
        f"SELECT vec_id, argmax({fn_name}(embedding)) AS cls FROM embeddings "
        f"ORDER BY vec_id LIMIT {limit}"
    ).collect()
    return {r.vec_id: r.cls for r in rows}


def _oracle_classes(spark, limit: int = 50):
    pdf = spark.table("embeddings").orderBy("vec_id").limit(limit).toPandas()
    x = np.stack(pdf["embedding"].to_numpy())
    return dict(zip(pdf["vec_id"], oracle_predict(x).argmax(axis=1)))


def test_golden_inference_matches_numpy_oracle(engine, tables, model_path):
    engine.sql("SET torchfusion.batch_size = 32")
    engine.sql(f"CREATE FUNCTION golden_clf(FLOAT[]) RETURNS FLOAT[] LANGUAGE TORCH AS '{model_path}'")
    assert _predicted(engine, "golden_clf") == _oracle_classes(engine.spark)


@pytest.mark.parametrize("batch_size", [1, 3, 7, 64])
def test_batch_size_invariance(engine, tables, model_path, batch_size):
    engine.sql(f"SET torchfusion.batch_size = {batch_size}")
    engine.sql(
        f"CREATE OR REPLACE FUNCTION clf_b{batch_size}(FLOAT[]) RETURNS FLOAT[] "
        f"LANGUAGE TORCH AS '{model_path}'"
    )
    assert _predicted(engine, f"clf_b{batch_size}") == _oracle_classes(engine.spark)


def test_freeze_at_create(engine, tables, model_path):
    # config changes after CREATE FUNCTION must not affect an existing function
    engine.sql("SET torchfusion.batch_size = 4")
    engine.sql(f"CREATE OR REPLACE FUNCTION frozen_clf(FLOAT[]) RETURNS FLOAT[] LANGUAGE TORCH AS '{model_path}'")
    before = _predicted(engine, "frozen_clf", 20)
    engine.sql("SET torchfusion.batch_size = 999")
    assert _predicted(engine, "frozen_clf", 20) == before


def test_declared_return_type_honored(engine, tables, model_path):
    # reference quirk: (f64,f64) silently returns f32 (src/udf.rs:49-57);
    # we honor the declaration instead (SURVEY §2-A2)
    engine.sql(
        f"CREATE OR REPLACE FUNCTION clf_f64(DOUBLE[]) RETURNS DOUBLE[] LANGUAGE TORCH AS '{model_path}'"
    )
    schema = engine.sql("SELECT clf_f64(embedding) AS out FROM embeddings LIMIT 1").schema
    assert schema["out"].dataType.simpleString() == "array<double>"


def test_missing_model_body_errors(engine):
    with pytest.raises(ValueError, match="model file should be specified"):
        engine.sql("CREATE FUNCTION broken(FLOAT[]) RETURNS FLOAT[] LANGUAGE TORCH")


def test_npz_backend_predict_shapes():
    from torchfusion_spark.models.backends import load_predictor

    p = load_predictor(mlp_bytes(), "demo.npz")
    out = p(np.zeros((5, 64), dtype=np.float32))
    assert out.shape == (5, 10)


def test_registry_flagship_matches_numpy_oracle(spark, tables):
    """The REGISTRY entry itself (not a lookalike flow): the driver only
    rows-checks `torch_inference_classes` (model inference isn't
    SQL-expressible in DuckDB), so this pins the registered builder's
    predictions to the numpy oracle — the stronger witness the rows-only
    gate can't provide."""
    from conftest import SF_DIR

    from torchfusion_spark.plans import REGISTRY

    pdf = REGISTRY["torch_inference_classes"].builder(spark, SF_DIR).toPandas()
    got = dict(zip(pdf["vec_id"], pdf["predicted"]))

    emb = spark.table("embeddings").orderBy("vec_id").limit(100).toPandas()
    x = np.stack(emb["embedding"].to_numpy())
    expected = dict(zip(emb["vec_id"], oracle_predict(x).argmax(axis=1)))
    assert got == expected
