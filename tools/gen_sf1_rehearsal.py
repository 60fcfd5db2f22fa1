"""Generate the synthetic sf1 rehearsal dataset (BASELINE.md round-4).

Builds ~TPC-H-sf1-sized data from the driver's sf0.1 testdata: dims are
copied, facts are replicated ``COPIES``× with shifted primary keys so
join cardinalities scale like a real fact-table scale-up (dims fixed,
facts 10×). Documents get a per-copy text tag (near-dup-heavy corpus —
the dedup operators see realistic candidate growth instead of pure exact
dups) and embeddings get σ=0.02 per-copy Gaussian noise (near-neighbor
structure for the similarity family).

Round-7 (VERDICT r06 item 1): the rehearsal is SKEWED by default —
uniform replication never exercised the AQE skew-join story or the
hot-bucket caps that SCALE.md's 100 TB arguments lean on. Real corpora
are Zipfian, so deterministic hot keys are injected:
  * hot customer  — ~1% of orders reassigned to one custkey
                    (o_orderkey % 100 == 7);
  * hot orderkey  — ~0.5% of lineitems reassigned to one orderkey
                    (row % 200 == 0) → a fat join/agg key;
  * hot event user — ~5% of events reassigned to one user_id
                    (event_id % 20 == 3) → a fat sessionize partition;
  * boilerplate paragraph — a fixed 40-word paragraph prepended to ~5%
    of documents (doc_id % 20 == 11) → hot shingles/band buckets, so the
    MinHash/SimHash bucket caps and the containment df-prune ENGAGE;
  * hot embedding cluster — ~5% of vectors (vec_id % 20 == 5) replaced
    by one fixed vector + tiny noise → a hot LSH bucket / IVF list.
All rules are key-modulus deterministic (reproducible without an RNG
ordering dependency). Pass --uniform to reproduce the old unskewed
build.

Usage: python tools/gen_sf1_rehearsal.py [src_sf_dir] [dst_dir] [--uniform] [--copies=N]
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

# one fixed 40-word paragraph — long enough that every word-3-gram window
# inside it is identical across the docs that carry it (hot shingles), and
# longer than SUBSTRING_K so the substring operator sees a real hot span
BOILERPLATE = (
    "this document is provided as is without warranty of any kind either "
    "expressed or implied including but not limited to the implied "
    "warranties of merchantability and fitness for a particular purpose "
    "the entire risk arising out of use remains with you"
)


def _shift(tbl: pa.Table, col: str, off: int) -> pa.Table:
    arr = tbl[col]
    return tbl.set_column(
        tbl.schema.get_field_index(col), col, pc.add(arr, pa.scalar(off, type=arr.type))
    )


def _replicate_shifted(tbl: pa.Table, key: str) -> pa.Table:
    span = pc.max(tbl[key]).as_py() + 1
    return pa.concat_tables(_shift(tbl, key, i * span) for i in range(COPIES))


def _reassign_mod(tbl: pa.Table, rule_col: str, mod: int, residue: int, target_col: str, value) -> pa.Table:
    """Deterministically reassign ``target_col`` to ``value`` on rows where
    ``rule_col % mod == residue`` — the Zipfian hot-key injection."""
    vals = np.asarray(tbl[rule_col].combine_chunks())
    mask = pa.array((vals % mod) == residue)
    col = tbl[target_col]
    hot = pc.if_else(mask, pa.scalar(value, type=col.type), col)
    return tbl.set_column(tbl.schema.get_field_index(target_col), target_col, hot)


def main() -> None:
    global COPIES
    args = [a for a in sys.argv[1:] if a != "--uniform" and not a.startswith("--copies")]
    skew = "--uniform" not in sys.argv[1:]
    for a in sys.argv[1:]:
        # --copies=30 scales the replication factor (VERDICT r12 item 2:
        # the cap-behavior trend needs a SECOND skewed scale point; the
        # key-modulus skew rules are replication-invariant, so hot-key
        # FRACTIONS hold while absolute hot-bucket sizes grow with the
        # corpus -- exactly the growth the caps must bound)
        if a.startswith("--copies="):
            COPIES = int(a.split("=", 1)[1])
    src = args[0] if len(args) > 0 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dst = args[1] if len(args) > 1 else os.path.join(repo, ".scratch", "sf1")
    os.makedirs(dst, exist_ok=True)

    for t in DIMS:
        pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")

    orders = pq.read_table(f"{src}/orders.parquet")
    li = pq.read_table(f"{src}/lineitem.parquet")
    okey_span = pc.max(orders["o_orderkey"]).as_py() + 1
    # orderkeys shift consistently across orders/lineitem so the join
    # holds; custkey/partkey/suppkey still reference the unscaled dims
    orders_out = pa.concat_tables(
        _shift(orders, "o_orderkey", i * okey_span) for i in range(COPIES)
    )
    li_out = pa.concat_tables(_shift(li, "l_orderkey", i * okey_span) for i in range(COPIES))
    if skew:
        hot_cust = pc.min(orders["o_custkey"]).as_py()
        orders_out = _reassign_mod(orders_out, "o_orderkey", 100, 7, "o_custkey", hot_cust)
        # hot orderkey: ~0.5% of lineitems collapse onto one EXISTING
        # orderkey (residue 7 keeps it among the hot customer's orders) —
        # a fat orders⋈lineitem join key and a fat groupBy(l_orderkey) key.
        # The (l_orderkey, l_linenumber) PRIMARY KEY must survive the
        # reassignment (several registry queries key on it — a duplicate
        # key makes them nondeterministic across engines), so reassigned
        # rows get fresh linenumbers 1000, 1001, ... within the hot order.
        hot_okey = 7 if 7 < okey_span else pc.min(li["l_orderkey"]).as_py()
        row_idx = np.arange(li_out.num_rows, dtype=np.int64)
        hot_mask = (row_idx % 200) == 0
        okeys = np.array(li_out["l_orderkey"].combine_chunks(), dtype=np.int64)
        lnums = np.array(li_out["l_linenumber"].combine_chunks())
        okeys[hot_mask] = hot_okey
        lnums[hot_mask] = 1000 + np.arange(int(hot_mask.sum()))
        li_out = li_out.set_column(
            li_out.schema.get_field_index("l_orderkey"),
            "l_orderkey",
            pa.array(okeys, type=li_out["l_orderkey"].type),
        )
        li_out = li_out.set_column(
            li_out.schema.get_field_index("l_linenumber"),
            "l_linenumber",
            pa.array(lnums, type=li_out["l_linenumber"].type),
        )
    pq.write_table(orders_out, f"{dst}/orders.parquet")
    pq.write_table(li_out, f"{dst}/lineitem.parquet")

    ev_out = _replicate_shifted(pq.read_table(f"{src}/events.parquet"), "event_id")
    if skew:
        hot_user = pc.min(ev_out["user_id"]).as_py()
        ev_out = _reassign_mod(ev_out, "event_id", 20, 3, "user_id", hot_user)
    pq.write_table(ev_out, f"{dst}/events.parquet")

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
    docs_out = pa.concat_tables(parts)
    if skew:
        # boilerplate paragraph on ~5% of docs: every doc carrying it
        # shares its word-3-grams → hot shingles (containment df-prune),
        # hot MinHash/SimHash band buckets (bucket caps), one hot
        # substring span shared corpus-wide
        mask = pa.array((np.asarray(docs_out["doc_id"].combine_chunks()) % 20) == 11)
        pre = pc.binary_join_element_wise(
            pa.scalar(BOILERPLATE), docs_out["text"], " "
        )
        txt = pc.if_else(mask, pre, docs_out["text"])
        docs_out = docs_out.set_column(
            docs_out.schema.get_field_index("text"), "text", txt
        )
        if "n_chars" in docs_out.schema.names:
            nc = pc.if_else(
                mask,
                pc.add(
                    docs_out["n_chars"],
                    pa.scalar(len(BOILERPLATE) + 1, type=docs_out["n_chars"].type),
                ),
                docs_out["n_chars"],
            )
            docs_out = docs_out.set_column(
                docs_out.schema.get_field_index("n_chars"), "n_chars", nc
            )
    pq.write_table(docs_out, f"{dst}/documents.parquet")

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
    emb_out = pa.concat_tables(parts)
    if skew:
        # hot embedding cluster: ~5% of vectors collapse onto the first
        # source vector plus tiny noise — one hot sign-LSH bucket / IVF
        # list, and a fat SemDeDup cluster. Offset-driven (no fixed-dim
        # reshape): the base path above explicitly preserves ragged rows,
        # so this block must too — hot rows take the base vector's
        # length, cold rows keep theirs, and the offsets are rebuilt
        # from the new per-row lengths.
        n_rows = emb_out.num_rows
        lst = emb_out["embedding"].combine_chunks()
        flat = np.asarray(lst.flatten(), dtype=np.float32)
        off = (
            np.asarray(lst.offsets, dtype=np.int64)
            if hasattr(lst, "offsets")
            else np.arange(0, len(flat) + 1, lst.type.list_size, dtype=np.int64)
        )
        off = off - off[0]  # raw offsets of a sliced array need not start at 0
        lens = np.diff(off)
        base = flat[off[0] : off[1]]  # copy-0 row 0 == the first source vector
        hot_mask = (np.asarray(emb_out["vec_id"].combine_chunks()) % 20) == 5
        n_hot = int(hot_mask.sum())
        new_lens = np.where(hot_mask, len(base), lens)
        new_off = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(new_lens, out=new_off[1:])
        new_flat = np.empty(int(new_off[-1]), dtype=np.float32)
        cold_src = ~np.repeat(hot_mask, lens)
        cold_dst = ~np.repeat(hot_mask, new_lens)
        new_flat[cold_dst] = flat[cold_src]
        hot_block = base[None, :] + rng.normal(0, 0.005, size=(n_hot, len(base))).astype(
            np.float32
        )
        new_flat[~cold_dst] = hot_block.reshape(-1)
        hot_arr = pa.ListArray.from_arrays(
            pa.array(new_off), pa.array(new_flat, type=pa.float32())
        )
        emb_out = emb_out.set_column(
            emb_out.schema.get_field_index("embedding"),
            "embedding",
            hot_arr.cast(emb_out["embedding"].type),
        )
    pq.write_table(emb_out, f"{dst}/embeddings.parquet")

    for t in DIMS + ("orders", "lineitem", "events", "documents", "embeddings"):
        print(t, pq.ParquetFile(f"{dst}/{t}.parquet").metadata.num_rows)


if __name__ == "__main__":
    main()
