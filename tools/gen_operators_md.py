"""Generate OPERATORS.md — the navigable inventory of every registry
query: driver rank, family, oracle kind, per-plan shuffle/broadcast
counts (from PLAN_AUDIT.json when present), and the one-line doc.

Regenerate after adding operators:  python tools/gen_operators_md.py
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FAMILIES = [
    ("tpch", r"q\d+_"),
    ("inference", r"(torch_|argmax_)"),
    ("function", r"fn_"),
    ("join", r"join_"),
    ("aggregate", r"agg_"),
    ("window", r"win_"),
    ("set-op", r"setop_"),
    ("subquery", r"(subq_|lateral_|cte_)"),
    ("relational", r"(values_|filter_|select_|sort_|pivot_|unpivot_)"),
    ("udf", r"(udaf_|udtf_|applyinpandas_)"),
    ("dedup", r"dedup_"),
    ("similarity", r"sim_"),
    ("text", r"text_"),
    ("corpus", r"(corpus_|pipeline_|sample_)"),
    ("events", r"events_"),
    ("streaming", r"stream_"),
    ("skew", r"skew_"),
    ("multimodal", r"multimodal_"),
]


def family(name: str) -> str:
    for fam, pat in _FAMILIES:
        if re.match(pat, name):
            return fam
    return "other"


def main() -> None:
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.plans.priority import prioritized_names

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    audit_path = os.path.join(root, "PLAN_AUDIT.json")
    audit = {}
    if os.path.exists(audit_path):
        with open(audit_path) as f:
            audit = json.load(f)

    lines = [
        "# OPERATORS.md — generated registry inventory",
        "",
        "One row per registry query (`torchfusion_spark/plans/`). Rank is the",
        "driver's coverage-priority key (`c{rank}_{name}` in `__spark_entry__`).",
        "Oracle: `hash` = DuckDB value-hash-checked, `rows` = rows-only check.",
        "Shuffle/broadcast counts come from `PLAN_AUDIT.json`",
        "(`tools/plan_audit.py`; `-` for streaming queries, whose plans exist",
        "per-microbatch). Regenerate: `python tools/gen_operators_md.py`.",
        "",
        "Family contracts:",
        "",
        "- **similarity (`sim_*`)** — every surface reads the shared",
        "  `norm_cte` relation, which DROPS NULL-vector and ZERO-NORM rows at",
        "  the root: cosine is undefined at norm 0 and the ANSI division",
        "  would raise (r14 structural fix), so a direction-less vector",
        "  participates in no similarity op and emits no row anywhere in the",
        "  family (`sim_semantic_dedup` / `sim_kmeans` included). The",
        "  per-corpus exclusion counts are measured by",
        "  `tools/skew_caps_report.py` (`similarity_norm_exclusions`).",
        "",
        "| rank | query | family | oracle | shuffles | broadcasts | what it is |",
        "|---|---|---|---|---|---|---|",
    ]
    for key, name in prioritized_names(REGISTRY):
        q = REGISTRY[name]
        rank = int(key.split("_", 1)[0][1:])
        a = audit.get(name, {})
        sh = a.get("shuffles", "-")
        bc = a.get("broadcasts", "-")
        oracle = "hash" if q.oracle is not None else "rows"
        doc = (q.doc or "").replace("|", "\\|").replace("\n", " ")
        lines.append(f"| {rank} | `{name}` | {family(name)} | {oracle} | {sh} | {bc} | {doc} |")

    with open(os.path.join(root, "OPERATORS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote OPERATORS.md ({len(REGISTRY)} queries)")


if __name__ == "__main__":
    main()
