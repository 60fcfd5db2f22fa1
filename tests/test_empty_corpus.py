"""Degenerate-input sweep: every pipeline operator must behave on an
EMPTY corpus and on a 1-row corpus — the cold-start / freshly-filtered
shard cases a production pipeline hits constantly (first ingest batch, a
filter that drops everything, a shard holding a single doc).

"Behave" = return a well-formed (possibly empty) DataFrame with the
usual schema, never throw. Operators with mathematically undefined
empty-input results (k-means needs >= k vectors) are asserted to raise a
CLEAR error, not a deep Spark internals traceback.

Mechanics: a scratch sf_dir holding n-row slices of every table is fed
straight through the registry builders — the same (spark, sf_dir) path
the driver uses, so load_tables re-registration and every staged-memo
generation key exercise their real rebuild logic.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# pipeline operators whose input is the documents / embeddings / events
# corpus; every one must yield a schema-stable result on a degenerate
# corpus without throwing
DOC_OPS = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_clusters",
    "dedup_minhash_clusters_star",
    "multimodal_dedup",
    "multimodal_frame_dedup",
    "dedup_containment",
    "dedup_substring",
    "pipeline_dedup_canonical",
    "text_quality_stats",
    "text_lang_id",
    "text_token_count",
    "text_fingerprint",
    "text_top_tokens",
    "text_repetition",
    "text_entropy",
    "text_pii_redact",
    "text_decontaminate",
    "text_decontaminate_bloom",
    "text_dup_gram_fraction",
    "text_winnow_fingerprint",
    "corpus_bpe_pairs",
    "sample_weighted_topk",
    "sample_group_quota",
    "sample_hash_stratified",
    "sample_train_split",
    "corpus_token_budget",
    "corpus_pack_sequences",
    "corpus_chunk_overlap",
    "corpus_shuffle_shards",
    "pipeline_corpus_clean",
    "corpus_source_filter",
    "text_bm25_topk",
    "retrieval_rrf_fusion",
    "pipeline_rag_context",
    "text_lm_perplexity",
    "sample_dsir_importance",
    "corpus_strip_dup_spans",
    "corpus_strip_boilerplate_lines",
    "text_decontaminate_spans",
    "text_gopher_rules",
    "dedup_url_canonical",
    "dedup_url_incremental",
    "pipeline_quality_gate",
    "corpus_url_filter",
    "sample_temperature_mixture",
    "text_quality_classifier",
    "pipeline_quality_ensemble",
    "corpus_bpe_train",
    "corpus_bpe_apply",
    "sample_upsample_epochs",
    "pipeline_pretrain_corpus",
]
EMB_OPS = [
    "sim_cosine_topk",
    "sim_cosine_near_dup",
    "sim_cosine_near_dup_lsh",
    "sim_near_dup_collapse",
    "sim_quantize_int8",
    "sim_ann_recall_audit",
]
EVENT_OPS = [
    "events_histogram",
    "events_sessionize",
    "events_funnel",
    "events_retention",
]

# operators that legitimately emit rows from an empty corpus: global
# aggregates (a COUNT/SUM over nothing is one row of zeros/NULLs)
GLOBAL_AGG_OK = {
    "text_dup_gram_fraction",
    "corpus_token_budget",
    # the recall audit is a COUNT rollup: an empty corpus yields its 3
    # method rows with zero counts and NULL (zero-guarded) recall
    "sim_ann_recall_audit",
}


def _make_degenerate_dir(src: str, dst: str, n_rows: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{src}/{t}.parquet")
        pq.write_table(tbl.slice(0, n_rows), f"{dst}/{t}.parquet")


@pytest.fixture()
def restore_real_tables(spark, tables):
    """Builders below point the session at scratch sf_dirs; re-point at
    the real fixture data afterwards so later tests see it."""
    yield
    spark._tf_tables_loaded = None
    from torchfusion_spark.sources import load_tables

    load_tables(spark, tables)


@pytest.mark.parametrize("n_rows", [0, 1])
def test_pipeline_operators_on_degenerate_corpus(
    spark, tables, tmp_path, restore_real_tables, n_rows
):
    from torchfusion_spark.plans import REGISTRY

    deg = str(tmp_path / f"deg{n_rows}")
    _make_degenerate_dir(tables, deg, n_rows)

    failures = {}
    for name in DOC_OPS + EMB_OPS + EVENT_OPS:
        try:
            df = REGISTRY[name].builder(spark, deg)
            rows = df.count()
            assert rows >= 0
            assert df.columns  # schema survives emptiness
            if n_rows == 0 and name not in GLOBAL_AGG_OK:
                assert rows == 0, f"fabricated {rows} rows from empty input"
        except Exception as exc:  # noqa: BLE001 — collect, assert once
            failures[name] = f"{type(exc).__name__}: {exc}"[:160]
    assert not failures, failures


def test_streams_on_empty_source(spark, tables, tmp_path, restore_real_tables):
    """Streaming cold start: a micro-batch pipeline over an EMPTY events
    source must complete its (zero) batches and emit an empty result
    with the usual schema — the first-deploy state of every streaming
    job, before any event has arrived."""
    from torchfusion_spark import streaming

    deg = str(tmp_path / "deg_stream")
    _make_degenerate_dir(tables, deg, 0)
    wc = streaming.windowed_counts(spark, deg)
    assert wc.count() == 0
    assert wc.columns  # schema survives a zero-batch run
    st = streaming.stateful_user_stats(spark, deg)
    assert st.count() == 0
    dd = streaming.stream_dedup(spark, deg)
    assert dd.count() == 0
    le = streaming.late_eviction(spark, deg)
    assert le.count() == 0  # zero-batch replay: no windows finalized
    ld = streaming.late_dedup(spark, deg)
    assert ld.count() == 0  # zero rows: nothing to dedup or emit
    stt = streaming.stateful_session_timeout(spark, deg)
    assert stt.count() == 0  # no rows -> no sessions, no timers to fire
    assert stt.columns == [
        "user_id", "session_start", "session_end", "n_events", "total_cents",
    ]
    eo = streaming.exactly_once_sink(spark, deg, str(tmp_path / "deg_sink"))
    assert eo.count() == 0
    assert eo.columns == ["window_start", "event_type", "n", "cents", "batch"]


def test_kmeans_on_empty_embeddings_degrades_gracefully(
    spark, tables, tmp_path, restore_real_tables
):
    """k-means over an empty relation: no vectors -> no centroids -> an
    EMPTY schema-stable result, not a stage crash (the trainer's
    broadcast-argmin and reduce stages are all empty-safe)."""
    from torchfusion_spark.operators import similarity
    from torchfusion_spark.sources import load_tables

    deg = str(tmp_path / "deg_kmeans")
    _make_degenerate_dir(tables, deg, 0)
    spark._tf_tables_loaded = None
    load_tables(spark, deg)
    df = similarity.kmeans(spark)
    assert df.count() == 0
    assert set(df.columns) == {"c_id", "dim", "cval", "n_members"}
