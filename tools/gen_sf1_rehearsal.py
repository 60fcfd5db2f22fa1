"""Generate the synthetic sf1 rehearsal dataset (BASELINE.md round-4).

Builds ~TPC-H-sf1-sized data from the driver's sf0.1 testdata: dims are
copied, facts are replicated ``COPIES``× with shifted primary keys so
join cardinalities scale like a real fact-table scale-up (dims fixed,
facts 10×). Documents get a per-copy text tag (near-dup-heavy corpus —
the dedup operators see realistic candidate growth instead of pure exact
dups) and embeddings get σ=0.02 per-copy Gaussian noise (near-neighbor
structure for the similarity family).

Usage: python tools/gen_sf1_rehearsal.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 → .scratch/sf1 (gitignored). Then:
  SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1 python bench.py
  BASELINE_DUCKDB_OUT=.scratch/duckdb_sf1.json \
      python tools/duckdb_baseline.py $PWD/.scratch/sf1 1
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10
DIMS = ("region", "nation", "customer", "supplier", "part")


def _shift(tbl: pa.Table, col: str, off: int) -> pa.Table:
    arr = tbl[col]
    return tbl.set_column(
        tbl.schema.get_field_index(col), col, pc.add(arr, pa.scalar(off, type=arr.type))
    )


def _replicate_shifted(tbl: pa.Table, key: str) -> pa.Table:
    span = pc.max(tbl[key]).as_py() + 1
    return pa.concat_tables(_shift(tbl, key, i * span) for i in range(COPIES))


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".scratch", "sf1")
    os.makedirs(dst, exist_ok=True)

    for t in DIMS:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")

    orders = pq.read_table(f"{src}/orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    okey_span = pc.max(orders["o_orderkey"]).as_py() + 1
    # orderkeys shift consistently across orders/lineitem so the join
    # holds; custkey/partkey/suppkey still reference the unscaled dims
    pq.write_table(
        pa.concat_tables(_shift(orders, "o_orderkey", i * okey_span) for i in range(COPIES)),
        f"{dst}/orders.parquet",
    )
    pq.write_table(
        pa.concat_tables(_shift(li, "l_orderkey", i * okey_span) for i in range(COPIES)),
        f"{dst}/lineitem.parquet",
    )

    pq.write_table(
        _replicate_shifted(pq.read_table(f"{src}/events.parquet"), "event_id"),
        f"{dst}/events.parquet",
    )

    docs = pq.read_table(f"{src}/documents.parquet")
    span = pc.max(docs["doc_id"]).as_py() + 1
    parts = []
    for i in range(COPIES):
        d = _shift(docs, "doc_id", i * span)
        if i:
            tag = f" copytag{i}"
            txt = pc.binary_join_element_wise(d["text"], pa.scalar(tag), "")
            d = d.set_column(d.schema.get_field_index("text"), "text", txt)
            if "n_chars" in d.schema.names:
                nc = pc.add(d["n_chars"], pa.scalar(len(tag), type=d["n_chars"].type))
                d = d.set_column(d.schema.get_field_index("n_chars"), "n_chars", nc)
        parts.append(d)
    pq.write_table(pa.concat_tables(parts), f"{dst}/documents.parquet")

    emb = pq.read_table(f"{src}/embeddings.parquet")
    span = pc.max(emb["vec_id"]).as_py() + 1
    rng = np.random.default_rng(42)
    arr = emb["embedding"].combine_chunks()
    if arr.null_count:
        # a synthesized uniform-offset rebuild would silently shift every
        # vector after the first NULL — fail loudly instead
        raise ValueError(
            "embeddings contain NULL rows; the rehearsal perturbation "
            "assumes dense vectors"
        )
    vals = np.asarray(arr.flatten(), dtype=np.float32)
    # reuse the SOURCE offsets (exact even for ragged rows, and the right
    # offset width) rather than synthesizing uniform int32 ones
    offsets = (
        arr.offsets
        if hasattr(arr, "offsets")
        else pa.array(
            np.arange(0, len(vals) + 1, arr.type.list_size, dtype=np.int64)
        )
    )
    parts = []
    for i in range(COPIES):
        e = _shift(emb, "vec_id", i * span)
        if i:
            noise = rng.normal(0, 0.02, size=vals.shape).astype(np.float32)
            pert = pa.ListArray.from_arrays(offsets, pa.array(vals + noise, type=pa.float32()))
            e = e.set_column(
                e.schema.get_field_index("embedding"), "embedding", pert.cast(e["embedding"].type)
            )
        parts.append(e)
    pq.write_table(pa.concat_tables(parts), f"{dst}/embeddings.parquet")

    for t in DIMS + ("orders", "lineitem", "events", "documents", "embeddings"):
        print(t, pq.ParquetFile(f"{dst}/{t}.parquet").metadata.num_rows)


if __name__ == "__main__":
    main()
