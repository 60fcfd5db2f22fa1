"""NULL-bearing corpus parity: pipeline operators on data with NULL
text / NULL embeddings / NULL event values must neither crash nor
diverge from the DuckDB oracle.

The NULL classes fixed in round 6 were all engine-specific code paths
(mapInPandas len(None), numpy NaN→INT64_MIN, window NULL-ordering,
NULL-vector k-means training); the shared-SQL operators are parity-safe
by construction. This sweep pins a representative operator from each
family against its oracle on a corpus where every 7th text, every 11th
embedding, and every 7th event value is NULL — the realistic dirty-data
state of a 100 TB ingest."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

NULL_OPS = [
    # family representative per NULL-risk class
    "text_quality_stats",       # shared-SQL scan over NULL text
    "dedup_exact",              # md5(NULL) grouping
    "dedup_minhash_lsh",        # staged shingle pipeline skips NULL docs
    "dedup_containment",        # staged inverted index
    "sample_hash_stratified",   # hash of doc_id, NULL-text rows kept
    "sim_cosine_topk",          # NULL embeddings excluded at norm_cte
    "sim_kmeans",               # iterative trainer vs unrolled oracle
    "sim_semantic_dedup",       # cluster-confined quadratic
    "events_histogram",         # NULL value bucketing
    "events_sessionize",        # NULL ts already excluded (ts is clean here)
    "fn_time_bucket",           # DECIMAL agg over NULL values
    "multimodal_features",      # mapInPandas NULL payload guards
    "multimodal_dedup",         # NULL/empty payloads emit no fingerprint row
    "multimodal_frame_dedup",   # NULL/empty payloads emit no frames at all
    "text_gopher_rules",        # every rule's array/regex arithmetic on NULL text
    "dedup_url_canonical",      # NULL source → NULL canonical_url → singleton (ADVICE r08)
    "dedup_url_incremental",    # NULL-canonical batch docs stay singletons; never indexed
    "corpus_url_filter",        # NULL source → NULL url; rules must not cross-mark NULLs
    "pipeline_quality_gate",    # NULL source fails closed with reason 'source'
    "text_quality_classifier",  # NULL-text docs labeled but absent from tf → absent from scores
    "pipeline_quality_ensemble",  # composition over the same NULL-pruned tf relation
    "corpus_bpe_train",         # word rollup over the NULL-pruned tf relation
    "corpus_bpe_apply",         # learned merges + segmentation over the same
    "sample_upsample_epochs",   # mixture plan over NULL-pruned tokens; NULL-text docs still fan out
    "sim_near_dup_collapse",    # NULL embeddings excluded at norm_cte before bucketing
    "text_lm_perplexity",       # per-lang cuts joined null-safely; NULL-lang group kept (ADVICE r10)
    "retrieval_rrf_fusion",     # BM25 side NULL-text-pruned tf; dense side NULL-emb-pruned norms
    "pipeline_rag_context",     # NULL-text hits contribute no context and no budget charge
    "pipeline_pretrain_corpus",  # full composition over NULL text/source/lang
    "corpus_strip_boilerplate_lines",  # NULL text → 0-line row fingerprinting ''
    "sim_ann_recall_audit",     # every component over the NULL-emb-pruned norms
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    src = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    dst = str(tmp_path_factory.mktemp("null_corpus"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    docs = pq.read_table(f"{src}/documents.parquet")
    texts = docs.column("text").to_pylist()
    for i in range(0, len(texts), 7):
        texts[i] = None
    # NULL sources too (ADVICE r08): more than one per URL-page bucket so
    # a regression that groups NULL canonical_urls together (marking
    # unrelated NULL-source docs as URL duplicates of each other) diverges
    # from the singleton semantics both dialects now generate
    sources = docs.column("source").to_pylist()
    for i in range(0, len(sources), 13):
        sources[i] = None
    # NULL langs too (ADVICE r10 #3): per-language quantile cuts join the
    # cut points back onto the scored docs — a plain equi-join on lang
    # silently drops the NULL-lang group on BOTH dialects (invisible to
    # the parity hash), so the join must be null-safe and this fixture
    # must exercise it. Stride 17 is coprime with 7 so most NULL-lang
    # docs keep non-NULL text and therefore appear in the tf relation.
    langs = docs.column("lang").to_pylist()
    for i in range(0, len(langs), 17):
        langs[i] = None
    cols = {n: docs.column(n) for n in docs.column_names}
    cols["text"] = pa.array(texts, pa.string())
    cols["source"] = pa.array(sources, pa.string())
    cols["lang"] = pa.array(langs, pa.string())
    pq.write_table(pa.table(cols), f"{dst}/documents.parquet")
    ev = pq.read_table(f"{src}/events.parquet")
    vals = ev.column("value").to_pylist()
    for i in range(0, len(vals), 7):
        vals[i] = None
    cols = {n: ev.column(n) for n in ev.column_names}
    cols["value"] = pa.array(vals, pa.float64())
    pq.write_table(pa.table(cols), f"{dst}/events.parquet")
    emb = pq.read_table(f"{src}/embeddings.parquet")
    arrs = emb.column("embedding").to_pylist()
    for i in range(0, len(arrs), 11):
        arrs[i] = None
    cols = {n: emb.column(n) for n in emb.column_names}
    cols["embedding"] = pa.array(arrs, emb.column("embedding").type)
    pq.write_table(pa.table(cols), f"{dst}/embeddings.parquet")
    return dst


def _canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.astype(str).sort_values(by=list(df.columns)).reset_index(drop=True)


def test_null_corpus_parity(spark, tables, null_sf_dir):
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.sources import load_tables

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{null_sf_dir}/{t}.parquet'")
    spark._tf_tables_loaded = None
    load_tables(spark, null_sf_dir)
    failures = {}
    try:
        for name in NULL_OPS:
            q = REGISTRY[name]
            try:
                sp = q.builder(spark, null_sf_dir).toPandas()
                du = con.execute(q.oracle).fetchdf()
                a, b = _canon(sp), _canon(du)
                if len(a) != len(b):
                    failures[name] = f"rowcount {len(a)} vs {len(b)}"
                elif not a.equals(b):
                    failures[name] = f"{int((a != b).any(axis=1).sum())} differing rows"
            except Exception as exc:  # noqa: BLE001 — collect, assert once
                failures[name] = f"{type(exc).__name__}: {exc}"[:160]
    finally:
        spark._tf_tables_loaded = None
        load_tables(spark, tables)
    assert not failures, failures


def test_null_source_urls_are_singletons(spark, tables, null_sf_dir):
    """ADVICE r08: NULL-source docs get a NULL canonical_url; both engines
    group NULLs together in a window PARTITION BY, so without the
    COALESCE-to-doc_id singleton rule the second NULL-source doc is marked
    kept=false as a "duplicate" of an unrelated doc. Cross-engine parity
    cannot catch this (both sides run the same generated SQL), so the
    singleton semantics are pinned directly: every NULL-canonical row must
    be its own keeper."""
    from torchfusion_spark.operators.dedup import url_canonical_dedup_sql
    from torchfusion_spark.sources import load_tables

    spark._tf_tables_loaded = None
    load_tables(spark, null_sf_dir)
    try:
        rows = spark.sql(url_canonical_dedup_sql("spark")).collect()
    finally:
        spark._tf_tables_loaded = None
        load_tables(spark, tables)
    null_rows = [r for r in rows if r.canonical_url is None]
    assert len(null_rows) >= 2, "fixture must produce multiple NULL-source docs"
    for r in null_rows:
        assert r.keeper_doc_id == r.doc_id, r
        assert r.kept is True, r


def test_null_lang_docs_survive_perplexity(spark, tables, null_sf_dir):
    """ADVICE r10 #3: the per-language tercile cuts are joined back onto
    the scored docs; a plain equi-join on lang drops the NULL-lang group
    on BOTH dialects, so the parity hash cannot catch it. Pin the
    semantics directly: every doc with NULL lang but non-NULL text must
    appear in text_lm_perplexity's output (in its own NULL-lang tercile
    group), exactly as the old NTILE PARTITION BY lang kept it."""
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.sources import load_tables

    spark._tf_tables_loaded = None
    load_tables(spark, null_sf_dir)
    try:
        expected = {
            r.doc_id
            for r in spark.sql(
                "SELECT doc_id FROM documents WHERE lang IS NULL AND text IS NOT NULL"
            ).collect()
        }
        rows = REGISTRY["text_lm_perplexity"].builder(spark, null_sf_dir).collect()
    finally:
        spark._tf_tables_loaded = None
        load_tables(spark, tables)
    assert len(expected) >= 2, "fixture must produce multiple NULL-lang docs with text"
    got = {r.doc_id for r in rows if r.lang is None}
    assert expected <= got, sorted(expected - got)[:10]
    for r in rows:
        if r.lang is None:
            assert r.ppl_bucket in ("head", "middle", "tail"), r
