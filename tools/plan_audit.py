"""Physical-plan audit over the registry — machine-checks SCALE.md.

For every batch query in the registry, builds the DataFrame (no
execution) and inspects the formatted physical plan for the properties
the 100 TB design contract promises:

  - shuffle exchange count (the scarce resource at scale),
  - broadcast exchange count (small sides must broadcast),
  - SortMergeJoin / CartesianProduct / BroadcastNestedLoopJoin presence,
  - row-at-a-time Python (BatchEvalPython) vs Arrow (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) — the hot path must never be
    row-Python,
  - parquet scans with no pushed filters while the query filters.

Writes PLAN_AUDIT.json (one row per query) and prints a summary table.
Streaming queries are skipped (their plans only exist per-microbatch).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# operators counted as shuffle exchanges (BroadcastExchange is counted
# separately on purpose: broadcasts are the cheap alternative)
_SHUFFLE = re.compile(r"^\(\d+\) Exchange\b", re.M)
_BROADCAST = re.compile(r"^\(\d+\) BroadcastExchange\b", re.M)
_OP = lambda name: re.compile(rf"^\(\d+\) {name}\b", re.M)  # noqa: E731

_FLAG_OPS = {
    "sort_merge_join": _OP("SortMergeJoin"),
    "cartesian": _OP("CartesianProduct"),
    "bnl_join": _OP("BroadcastNestedLoopJoin"),
    "row_python": _OP("BatchEvalPython"),
    "arrow_python": re.compile(
        r"^\(\d+\) (ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas|"
        r"MapInArrow|AggregateInPandas)",
        re.M,
    ),
}

# queries whose registered semantics legitimately need a flagged shape
_EXPECTED = {
    "join_cross": {"cartesian", "bnl_join"},  # the CROSS JOIN witness itself
    "join_theta": {"bnl_join", "cartesian"},  # inequality-only predicate
    "join_full_outer": {"sort_merge_join"},  # Spark can't broadcast a FULL OUTER side
    "sim_cosine_topk": {"bnl_join"},  # broadcast query side × candidates
    "sim_cosine_near_dup": {"bnl_join"},  # gated exact verifier (vec_id cap)
    "events_asof_join": {"bnl_join"},  # banded join, band side broadcast
    "events_range_join": {"bnl_join"},  # banded range join
    # joins against aggregate-DERIVED relations that are fact-scale at
    # 100 TB (per-part MIN cost / per-(part,supp) SUM qty): SMJ on the
    # join key is the scale-correct choice, broadcast would OOM
    "q2_min_cost_supplier": {"sort_merge_join"},
    "q20_potential_promotion": {"sort_merge_join"},
    # centroid/medoid relations broadcast (BNL over tiny side is the
    # argmin scan); assignments ⋈ vectors on vec_id is embeddings-scale
    # on both sides → SMJ correct
    "sim_kmeans": {"sort_merge_join", "bnl_join"},
    "sim_ivf_topk": {"sort_merge_join", "bnl_join"},
    "sim_semantic_dedup": {"sort_merge_join", "bnl_join"},
}


def audit(spark, sf_dir: str, names=None) -> dict[str, dict]:
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.sources import load_tables

    load_tables(spark, sf_dir)
    rows: dict[str, dict] = {}
    for name, q in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        if name.startswith("stream_"):
            continue
        try:
            df = q.builder(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        row = {
            "shuffles": len(_SHUFFLE.findall(plan)),
            "broadcasts": len(_BROADCAST.findall(plan)),
        }
        flags = []
        for flag, pat in _FLAG_OPS.items():
            n = len(pat.findall(plan))
            if n:
                row[flag] = n
                if flag not in ("arrow_python",) and flag not in _EXPECTED.get(name, ()):
                    flags.append(flag)
        row["unexpected"] = flags
        rows[name] = row
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:]) or None

    from torchfusion_spark.session import session

    spark = session(app_name="torchfusion_plan_audit")
    rows = audit(spark, sf_dir, names)

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json"
    )
    with open(out, "w") as f:
        json.dump(rows, f, indent=1, sort_keys=True)

    flagged = {k: v for k, v in rows.items() if v.get("unexpected") or "error" in v}
    print(f"{len(rows)} plans audited; {len(flagged)} flagged")
    for k, v in sorted(flagged.items()):
        print(f"  {k}: {v.get('error') or v['unexpected']}")
    hot = sorted(rows.items(), key=lambda kv: -kv[1].get("shuffles", 0))[:10]
    print("most shuffles:")
    for k, v in hot:
        print(f"  {k}: shuffles={v.get('shuffles')} broadcasts={v.get('broadcasts')}")
    spark.stop()


if __name__ == "__main__":
    main()
