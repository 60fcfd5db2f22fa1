"""Property tests for the two newest hash pipelines:

- Bloom decontamination == exact decontamination on randomized corpora
  (no false negatives by construction; false positives removed by the
  verify join — the equality must survive adversarial token overlap).
- Banded SimHash candidates are COMPLETE for hamming <= 2: against the
  SQL-computed signatures, a brute-force O(n^2) Python pass must find
  exactly the pairs the exploded-band equi-join reports (pigeonhole:
  2 flips over 4 bands leave >= 2 bands intact).

Both run the real Spark SQL against a Python model of the same
semantics, so a dialect/arithmetic drift (hash width, shift direction,
band indexing) fails here rather than at the oracle gate."""

from __future__ import annotations

import itertools
import random

import pytest


def _mk_docs(seed: int, n_docs: int = 40) -> list[tuple[int, str]]:
    """Random word docs with deliberate overlap: a shared pool of small
    words so 3-gram collisions across docs are common (the adversarial
    case for banding/bloom logic)."""
    rng = random.Random(seed)
    pool = [f"w{i}" for i in range(25)]
    docs = []
    for doc_id in range(n_docs):
        n = rng.randint(3, 30)
        docs.append((doc_id, " ".join(rng.choice(pool) for _ in range(n))))
    return docs


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_bloom_decontaminate_equals_exact_on_random_corpus(spark, seed):
    from torchfusion_spark.operators import textstats

    df = spark.createDataFrame(_mk_docs(seed), "doc_id bigint, text string")
    df.createOrReplaceTempView("documents")
    try:
        exact = {
            (r.doc_id, r.n_overlap)
            for r in spark.sql(textstats.decontaminate_sql("spark")).collect()
        }
        bloom = {
            (r.doc_id, r.n_overlap)
            for r in spark.sql(textstats.decontaminate_bloom_sql("spark")).collect()
        }
        assert bloom == exact
    finally:
        spark.catalog.dropTempView("documents")
        # load_tables is memoized per (session, sf_dir); the memo now lies
        # (we clobbered the documents view) — clear it so the next caller
        # re-registers the real tables
        if hasattr(spark, "_tf_tables_loaded"):
            del spark._tf_tables_loaded


@pytest.mark.parametrize("seed", [3, 11])
def test_simhash_banding_complete_vs_bruteforce(spark, seed):
    from torchfusion_spark.operators import dedup

    docs = _mk_docs(seed, n_docs=60)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    df.createOrReplaceTempView("__prop_docs")
    try:
        sigs = {
            r.doc_id: r.simhash
            for r in spark.sql(
                dedup.simhash_sig_sql("spark", rel="__prop_docs")
            ).collect()
        }
        # brute force over the SQL-computed signatures
        expect = {
            (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
            for a, b in itertools.combinations(sorted(sigs), 2)
            if bin(sigs[a] ^ sigs[b]).count("1") <= 2
        }
        # cap disabled: completeness must hold before hot-bucket pruning
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in spark.sql(
                dedup.simhash_body_sql(
                    "spark", f"({dedup.simhash_sig_sql('spark', rel='__prop_docs')})",
                    max_bucket=1_000_000,
                )
            ).collect()
        }
        assert got == expect
    finally:
        spark.catalog.dropTempView("__prop_docs")
