"""Deduplication operators (SURVEY §2-D): exact, MinHash-LSH, SimHash,
blocked n-gram Jaccard. Each emits one SQL plan per dialect
(``spark`` / ``duck``) from shared fragments — the oracle runs the very
same algorithm, so the correctness gate checks real equivalence.

Scale design (100 TB):
* exact dedup — one shuffle on the content hash; row_number keeps the
  smallest id (deterministic winner), no driver-side state.
* MinHash-LSH — signatures computed in one pass (no shuffle), band keys
  exploded (×8 rows), ONE shuffle on (band, band_key); candidate pairs
  only within buckets (no quadratic blow-up); verification re-joins the
  shingle sets by id. Skewed buckets (boilerplate text) would salt or
  cap bucket size before the self-join at production scale.
* SimHash — one pass per doc; candidates via 8-bit band equality.
* n-gram Jaccard — quadratic verifier confined to (lang, length-bucket)
  blocks; intended for within-block confirmation, not global sweep.
"""

from __future__ import annotations

from torchfusion_spark.operators import sqlgen as G


def exact_dedup_sql(d: str) -> str:
    """Keep the lowest doc_id per exact content hash (md5 of text)."""
    return """
    SELECT doc_id, text_md5 FROM (
        SELECT doc_id, md5(text) AS text_md5,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents)
    WHERE rn = 1 ORDER BY doc_id
    """


def _shingle_cte(d: str, n: int = 3, rel: str = "documents") -> str:
    sh = G.word_shingles("text", n, d)
    return f"SELECT doc_id, {sh} AS shingles FROM {rel}"


def hashed_shingle_sql(d: str, rel: str = "documents") -> str:
    """(doc_id, hx): distinct word-3-gram shingles hashed to int56 — the
    one expensive pass (string building + md5); everything downstream is
    integer arithmetic."""
    return f"""
    SELECT doc_id, {G.shingle_hashes('shingles', d)} AS hx FROM ({_shingle_cte(d, rel=rel)})
    WHERE {G.arr_size('shingles', d)} > 0
    """


def minhash_body_sql(d: str, hs_rel: str, threshold: float) -> str:
    """The pipeline downstream of the hashed-shingle relation
    ``hs_rel(doc_id, hx)``: 16 min-hashes → 8 band keys exploded → bucket
    self-join candidates → Jaccard verification over the hashed shingle
    sets (identical on the oracle; hash collisions are ~2^-56)."""
    sig_select = f"{G.minhash_sig_array('hx', d)} AS sig"
    bands = G.band_exprs("sig", d)
    if d == "spark":
        structs = ", ".join(
            f"named_struct('band', {i}, 'bkey', {b})" for i, b in enumerate(bands)
        )
        band_rel = (
            f"SELECT doc_id, band, bkey FROM sig "
            f"LATERAL VIEW inline(array({structs})) AS band, bkey"
        )
    else:
        structs = ", ".join("{'band': %d, 'bkey': %s}" % (i, b) for i, b in enumerate(bands))
        band_rel = (
            f"SELECT doc_id, UNNEST(bl, recursive := true) "
            f"FROM (SELECT doc_id, [{structs}] AS bl FROM sig)"
        )
    inter = G.arr_intersect_size("x.hx", "y.hx", d)
    union = G.arr_union_size("x.hx", "y.hx", d)
    return f"""
    WITH sig AS (SELECT doc_id, {sig_select} FROM {hs_rel}),
    bands AS ({band_rel}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT id_a, id_b,
               ROUND(CAST({inter} AS DOUBLE) / {union}, 6) AS jaccard
        FROM cand
        JOIN {hs_rel} x ON x.doc_id = id_a
        JOIN {hs_rel} y ON y.doc_id = id_b)
    WHERE jaccard >= {threshold}
    ORDER BY id_a, id_b
    """


def minhash_lsh_sql(d: str, threshold: float = 0.6) -> str:
    """Single-statement form (the DuckDB oracle; also a valid Spark plan).

    Note for Spark execution prefer :func:`minhash_lsh` below — the
    hashed-shingle CTE is referenced 4× (two band sides + two verify
    sides) and Catalyst inlines CTEs, recomputing it each time; the
    staged builder caches it.
    """
    body = minhash_body_sql(d, "hs", threshold)
    return body.replace("WITH sig AS", f"WITH hs AS ({hashed_shingle_sql(d)}),\n    sig AS", 1)


def minhash_lsh(spark, threshold: float = 0.6):
    """Spark-side staged execution: materialize the hashed-shingle relation
    once (it is ~1% of the input; at 100 TB this is persist-to-disk or a
    checkpoint), then run the band/verify pipeline over the cached view.

    The input is repartitioned first: a single small parquet file arrives
    as ONE partition and shingling is CPU-bound — without the fan-out the
    whole stage runs on one core (at cluster scale the input already has
    enough splits; the repartition is then a no-op-sized shuffle)."""
    from torchfusion_spark.session import default_parallelism

    docs = spark.table("documents").repartition(default_parallelism())
    docs.createOrReplaceTempView("__minhash_docs")
    hs = spark.sql(hashed_shingle_sql("spark", rel="__minhash_docs")).cache()
    hs.count()  # materialize before the self-join races both sides into the fill
    hs.createOrReplaceTempView("__minhash_hs")
    return spark.sql(minhash_body_sql("spark", "__minhash_hs", threshold))


def simhash_sql(d: str, bits: int = 32, max_hamming: int = 2) -> str:
    """32-bit SimHash per doc + near-dup pairs via 8-bit band collision
    and Hamming verification."""
    toks = G.arr_distinct(G.split_ws("lower(text)", d), d)
    hashes = G.transform("toks", f"t -> {G.hash56('t', d)}", d)
    bit_terms = []
    for b in range(bits):
        ones = G.arr_size(G.afilter("hashes", f"h -> ({G.shr('h', str(b), d)} & 1) = 1", d), d)
        bit_terms.append(f"(CASE WHEN 2 * {ones} > n THEN CAST({1 << b} AS BIGINT) ELSE 0 END)")
    simhash = " + ".join(bit_terms)
    ham = f"bit_count({G.xor('a.simhash', 'b.simhash', d)})"
    band_match = " OR ".join(
        f"(({G.shr('a.simhash', str(8 * i), d)} & 255) = ({G.shr('b.simhash', str(8 * i), d)} & 255))"
        for i in range(bits // 8)
    )
    return f"""
    WITH t AS (SELECT doc_id, {toks} AS toks FROM documents),
    h AS (SELECT doc_id, {hashes} AS hashes, {G.arr_size('toks', d)} AS n FROM t),
    s AS (SELECT doc_id, {simhash} AS simhash FROM h WHERE n > 0)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST({ham} AS INT) AS hamming
    FROM s a JOIN s b ON a.doc_id < b.doc_id AND ({band_match})
    WHERE {ham} <= {max_hamming}
    ORDER BY id_a, id_b
    """


def ngram_jaccard_sql(d: str, n: int = 5, threshold: float = 0.7) -> str:
    """Character-n-gram Jaccard near-dup within (lang, length-bucket)
    blocks — the bounded quadratic verifier."""
    gs = G.char_shingles("text", n, d)
    idiv = "div" if d == "spark" else "//"
    inter = G.arr_intersect_size("a.gs", "b.gs", d)
    union = G.arr_union_size("a.gs", "b.gs", d)
    return f"""
    WITH g AS (
        SELECT doc_id, lang, n_chars {idiv} 64 AS len_bucket, {gs} AS gs
        FROM documents)
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST({inter} AS DOUBLE) / {union}, 6) AS jaccard
        FROM g a JOIN g b
          ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id)
    WHERE jaccard >= {threshold}
    ORDER BY id_a, id_b
    """
