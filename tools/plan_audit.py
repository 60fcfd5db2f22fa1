"""Physical-plan audit over the registry — machine-checks SCALE.md.

For every batch query in the registry, builds the DataFrame and WALKS
the physical plan tree (via the JVM plan object, stopping at
InMemoryTableScan / checkpointed-RDD scans so staged relations'
already-materialized lineage isn't double-counted — a formatted-explain
regex would count it) for the properties the 100 TB design contract
promises. The audited FINAL plan is built without execution, but staged
builders (kmeans, containment, the cached signature/norm relations)
eagerly execute their *staging* actions (cache fills, localCheckpoints)
while the DataFrame is being built — an audit run therefore does real
Spark work for those queries; only the audited downstream plan is
unexecuted (ADVICE r03 clarification):

  - shuffle exchange count (the scarce resource at scale),
  - broadcast exchange count (small sides must broadcast),
  - SortMergeJoin / CartesianProduct / BroadcastNestedLoopJoin presence,
  - row-at-a-time Python (BatchEvalPython) vs Arrow (ArrowEvalPython /
    MapInPandas / FlatMapGroupsInPandas) — the hot path must never be
    row-Python.

Writes PLAN_AUDIT.json (one row per query) and prints a summary table.
Streaming queries are skipped (their plans only exist per-microbatch).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_FLAG_NAMES = {
    "SortMergeJoin": "sort_merge_join",
    "CartesianProduct": "cartesian",
    "BroadcastNestedLoopJoin": "bnl_join",
    "BatchEvalPython": "row_python",
    "ArrowEvalPython": "arrow_python",
    "MapInPandas": "arrow_python",
    "FlatMapGroupsInPandas": "arrow_python",
    "MapInArrow": "arrow_python",
    "AggregateInPandas": "arrow_python",
    "__global_window__": "global_window",
}

# staged-relation boundaries: lineage below these is already materialized
_LEAF_MARKERS = ("InMemoryTableScan", "Scan ExistingRDD")

# queries whose registered semantics legitimately need a flagged shape
_EXPECTED = {
    "join_cross": {"cartesian", "bnl_join"},  # the CROSS JOIN witness itself
    "join_theta": {"bnl_join", "cartesian"},  # inequality-only predicate
    "join_full_outer": {"sort_merge_join"},  # Spark can't broadcast a FULL OUTER side
    "sim_cosine_topk": {"bnl_join"},  # broadcast query side × candidates
    "retrieval_rrf_fusion": {"bnl_join"},  # dense side = the sim_cosine_topk shape
    "pipeline_rag_context": {"bnl_join"},  # embeds the fusion (same dense side)
    "sim_cosine_near_dup": {"bnl_join"},  # gated exact verifier (vec_id cap)
    "events_asof_join": {"bnl_join"},  # banded join, band side broadcast
    "events_range_join": {"bnl_join"},  # banded range join
    # (q2/q20 whitelists removed in round 4: their builders now produce
    # single-exchange window/distinct forms with no SMJ at either scale)
    # centroid/medoid relations broadcast (BNL over tiny side is the
    # argmin scan); assignments ⋈ vectors on vec_id is embeddings-scale
    # on both sides → SMJ correct
    # 1-row corpus-total relation CROSS JOINed back onto the per-source
    # aggregate (|sources| rows) — a broadcast of a single row, the same
    # shape as a scalar subquery
    "corpus_source_filter": {"bnl_join"},
    # the composed gate embeds corpus_source_filter verbatim — the same
    # 1-row corpus-total broadcast is its only BNL
    "pipeline_quality_gate": {"bnl_join"},
    # same 1-row-stats cross-join shape: BM25's (n_docs, tot_tokens) and
    # the LM's (t_tokens, v_size) corpus totals broadcast back as a
    # single row onto the scored relation
    "text_bm25_topk": {"bnl_join"},
    "text_lm_perplexity": {"bnl_join"},
    "sample_dsir_importance": {"bnl_join"},
    # the classifier's 1-row totals (pos/neg sums, bucket-universe size,
    # bias prior) cross-join back onto the ≤64Ki weight relation and the
    # per-doc scores — single-row broadcasts, the corpus_source_filter
    # shape; the corpus-sized joins are doc_id-keyed SMJ-free (tf cached,
    # weights broadcast by hint)
    "text_quality_classifier": {"bnl_join"},
    # the ensemble composes the classifier and the LM scorer verbatim —
    # it inherits exactly their whitelisted 1-row-totals cross joins and
    # adds only a doc_id-keyed join of the two doc-sized score relations.
    # Its gate-scale SMJ allowance is CONDITIONAL (ADVICE r11 #2): see
    # _ensemble_smj_justified below — granted only while the null-safe
    # spelling that justifies it is actually in the generated SQL.
    "pipeline_quality_ensemble": {"bnl_join"},
    # (corpus_bpe_train needs no whitelist: the Spark side is the
    # checkpointed round loop — its audited final plan is the tiny merge
    # table; per-round work runs in staging actions like
    # dedup_minhash_clusters')
    # the apply path joins each learned merge pair as a 1-ROW literal
    # relation (LEFT JOIN ON true → broadcast nested loop over a single
    # row — the corpus_source_filter stats shape) onto the VOCAB-sized
    # symbol stream; no corpus-sized BNL exists (per-word counts
    # broadcast-hash-join onto tf)
    "corpus_bpe_apply": {"bnl_join"},
    "sim_kmeans": {"sort_merge_join", "bnl_join"},
    "sim_ivf_topk": {"sort_merge_join", "bnl_join"},
    "sim_semantic_dedup": {"sort_merge_join", "bnl_join"},
    # the recall audit composes sim_cosine_topk (bnl: broadcast query
    # side), sim_ivf_topk (smj+bnl, whitelisted above), the GATED exact
    # pair verifier (bnl, vec_id cap) and the capped LSH pair join; the
    # FULL OUTER hit-count joins add SMJs over RESULT-sized relations
    # (top-k lists and threshold pairs), never the corpus
    "sim_ann_recall_audit": {"sort_merge_join", "bnl_join"},
    # -- global_window whitelist (detector added in r10 after the VERDICT
    # r9 scorer-NTILE fix; an unlisted global window = the scale-killer
    # class and must fail the audit). Every entry below is a window over
    # a BOUNDED relation, never the corpus:
    # SQL-surface witnesses: the unpartitioned frame IS the semantics
    # being certified (DataFusion window-function parity)
    "win_percent_cume": {"global_window"},
    "win_range_frame": {"global_window"},
    # global TopK rank over the DISTINCT adjacent-pair counts — a
    # vocabulary-pair-sized relation (grows with vocab, not corpus rows)
    "corpus_bpe_pairs": {"global_window"},
    # COUNT(*)/SUM() OVER () on the per-source / per-language aggregate —
    # ≤|sources| / ≤|langs| rows by construction (textstats.py:1220,1270)
    "corpus_mixture_plan": {"global_window"},
    "sample_temperature_mixture": {"global_window"},
    "sample_upsample_epochs": {"global_window"},
    # the pretraining composition (VERDICT r9 item 4): its survivor-set
    # joins (documents ⋈ url-filter ⋈ url-keeper ⋈ ensemble ⋈ decontam)
    # are doc_id-keyed with BOTH sides corpus-scale — co-partitioned SMJ
    # is the 100 TB plan (the quality_gate/ensemble class); its only
    # global windows are the embedded temperature-mixture normalizer
    # over the ≤|langs|-row rollup (the sample_upsample_epochs class) —
    # the corpus-scale pack prefix-sum stays partitioned by (lang, shard)
    "pipeline_pretrain_corpus": {"sort_merge_join", "global_window"},
}


def _plan_counts(df) -> Counter:
    """Operator counts from a JVM walk of the physical plan that WILL
    execute, descending through the AQE wrapper via ``initialPlan()``
    (the post-EnsureRequirements plan — ``inputPlan()`` predates exchange
    insertion and has no Exchange nodes) and stopping at
    InMemoryTableScan / checkpointed-RDD leaves: their lineage is already
    materialized, so counting it (as any formatted-explain text parse
    does — cached relations re-print their whole plan, including nested
    AQE Final/Initial sections at misleading indentation) double-charges
    staged relations. Expression subqueries (scalar/IN) are walked too —
    their exchanges execute like any other."""
    counts: Counter = Counter()

    def walk(node) -> None:
        name = node.nodeName()
        if name in ("Window", "WindowGroupLimit", "WindowInPandas"):
            # a window with NO partition spec moves the whole input into
            # ONE task — the VERDICT r9 scale-killer class (the scorer
            # NTILEs). Detect it structurally: WindowExecBase exposes
            # partitionSpec(); an empty one is the global sort.
            try:
                if node.partitionSpec().isEmpty():
                    counts["__global_window__"] += 1
            except Exception:  # noqa: BLE001 — WindowGroupLimit has no spec accessor on some versions
                pass
        if name == "AdaptiveSparkPlan":
            # AdaptiveSparkPlanExec exposes no children() — if the inner
            # plan accessor fails, record a VISIBLE marker instead of
            # falling through to an empty walk that would report the
            # query as a falsely clean 0-shuffle plan
            for accessor in ("initialPlan", "executedPlan"):
                try:
                    walk(getattr(node, accessor)())
                    return
                except Exception:  # noqa: BLE001 — try the next accessor
                    continue
            counts["__aqe_unresolved__"] += 1
            return
        counts[name.strip()] += 1
        if any(m in name for m in _LEAF_MARKERS):
            return
        try:
            subs = node.subqueries()
            for i in range(subs.length()):
                walk(subs.apply(i))
        except Exception:  # noqa: BLE001 — not all nodes expose subqueries
            pass
        children = node.children()
        for i in range(children.length()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return counts


# Disposition table for audits at FACT scale (sf >= 0.1): joins that
# broadcast at gate sf but legitimately show SortMergeJoin/cartesian in
# the STATIC plan once a side outgrows the 10 MB threshold. Two classes,
# kept separate so the gate-sf audit (where SMJ = missed broadcast)
# stays strict:
#   scale-plan  — both join sides grow with the corpus (LSH/shingle/
#                 bucket self-joins, fact⋈fact); SMJ on the join key IS
#                 the intended 100 TB plan, broadcast would OOM.
#   aqe-runtime — the flagged side is a filtered/aggregated sliver whose
#                 STATIC size estimate is pessimistic; AQE re-plans the
#                 join to broadcast at runtime (measured at sf1 — see
#                 SCALE.md round-4 section).
_EXPECTED_AT_SCALE = {
    # scale-plan
    "dedup_containment": {"sort_merge_join"},      # stop-shingle anti-join once
    # the stop list outgrows broadcast (round 6: pair gen is in-row, the
    # old inverted-index row self-join is gone)
    "dedup_minhash_lsh": {"sort_merge_join"},      # band + verify self-joins
    "dedup_ngram_jaccard": {"sort_merge_join"},    # blocked self-join
    # (dedup_substring dropped in round 8: duplicated-gram marking is now
    # a MIN/MAX window over the gram hash — the grams ⋈ dup-grams SMJ no
    # longer exists at any scale, 2 shuffles total)
    "corpus_strip_dup_spans": {"sort_merge_join"},  # the strip tail:
    # token-stream ANTI covered positions and base ⋈ rebuilt-text are
    # both-sides-corpus-scale joins on (doc_id, tpos) keys — SMJ is the
    # plan you want at 100 TB (the r8 window rewrite removed the
    # grams ⋈ owner-grams join, not these)
    "text_decontaminate_spans": {"sort_merge_join"},  # shares the strip
    # tail: the token-stream ANTI join and base ⋈ rebuilt-text grow with
    # the corpus on both sides (the benchmark probe side stays broadcast)
    "corpus_strip_boilerplate_lines": {"sort_merge_join"},  # base ⋈
    # rebuilt-text: two doc-keyed relations that both grow with the
    # corpus — the co-partitioned doc_id join IS the 100 TB plan (the
    # hot-line probe side keeps its BROADCAST anti-join; measured at
    # sf1: 1 broadcast + this one SMJ)
    "pipeline_quality_gate": {"sort_merge_join"},  # gopher ⋈ url-keeper:
    # two doc-keyed relations that both grow with the corpus — the
    # co-partitioned doc_id join IS the 100 TB plan (the source gate
    # side stays broadcast)
    "pipeline_quality_ensemble": {"sort_merge_join"},  # classifier scores
    # ⋈ perplexity scores: two doc-sized relations that both grow with
    # the corpus — the co-partitioned doc_id join IS the 100 TB plan
    # (the classifier's internal weight/label joins keep their
    # broadcasts; only the final composition join scales)
    "sim_cosine_near_dup_lsh": {"sort_merge_join"},  # bucket self-join
    "text_dup_gram_fraction": {"sort_merge_join"},   # gram self-join
    "q3_shipping_priority": {"sort_merge_join"},   # lineitem ⋈ orders
    "q4_order_priority": {"sort_merge_join"},      # orders ⋉ lineitem
    "q18_large_volume_customer": {"sort_merge_join"},  # HAVING-survivor side is
    # fact-derived (grows with orders) — measured at sf1: AQE keeps the SMJ
    "sim_cosine_near_dup": {"cartesian"},          # gated exact verifier (vec_id cap)
    # the recall audit embeds the gated exact verifier verbatim — the same
    # vec_id-capped (AUDIT_PAIR_SAMPLE) inequality self-join plans as a
    # CartesianProduct once the norms relation outgrows broadcast; every
    # other join in the audit is result-sized
    "sim_ann_recall_audit": {"cartesian"},
    # aqe-runtime: the probe/benchmark side is bounded by the benchmark
    # suite, not the corpus — statically estimated at table size (SMJ),
    # re-planned to broadcast by AQE once its true size is known
    "text_decontaminate": {"sort_merge_join"},
    "text_decontaminate_bloom": {"sort_merge_join"},
}


def _at_scale(sf_dir: str) -> bool:
    """Whether ``sf_dir`` holds sf >= 0.1 data, decided from the lineitem
    parquet footer row count (sf0.1 = ~600k lineitem rows) rather than by
    parsing a scale factor out of the directory name — a custom dir name
    (``sf1_rehearsal``, any path) must not silently flip the expectation
    set (ADVICE r04). ``PLAN_AUDIT_AT_SCALE=0|1`` overrides."""
    env = os.environ.get("PLAN_AUDIT_AT_SCALE")
    if env is not None:
        return env.strip().lower() not in ("0", "false", "no", "")
    try:
        import pyarrow.parquet as pq

        rows = pq.ParquetFile(os.path.join(sf_dir, "lineitem.parquet")).metadata.num_rows
        return rows >= 500_000
    except Exception as e:  # noqa: BLE001
        print(f"plan_audit: cannot read lineitem footer under {sf_dir} ({e}); "
              "assuming small-scale expectations (set PLAN_AUDIT_AT_SCALE to override)")
        return False


def _ensemble_smj_justified() -> bool:
    """pipeline_quality_ensemble's gate-scale SMJ allowance exists ONLY
    because the null-safe per-lang cuts join (Spark ``<=>``, ADVICE r10
    #3) in the LM scorer blocks Catalyst's static size estimate for the
    ppl side, so it stops auto-broadcasting it at sf0.01 (AQE re-plans
    to broadcast at runtime when the side really is small; at scale SMJ
    is the intended plan anyway). Gate the allowance on that spelling
    being present in the generated SQL: if the null-safe join is ever
    removed, a genuinely-small side that stops broadcasting is a
    regression again and the audit must flag it (ADVICE r11 #2)."""
    from torchfusion_spark.operators.textstats import quality_ensemble_sql

    return "<=>" in quality_ensemble_sql("spark")


def audit(spark, sf_dir: str, names=None) -> dict[str, dict]:
    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.sources import load_tables

    at_scale = _at_scale(sf_dir)
    load_tables(spark, sf_dir)
    rows: dict[str, dict] = {}
    for name, q in sorted(REGISTRY.items()):
        if names and name not in names:
            continue
        if name.startswith("stream_"):
            continue
        try:
            counts = _plan_counts(q.builder(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — audit must cover the rest
            rows[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            continue
        row = {
            "shuffles": counts.get("Exchange", 0) + counts.get("ShuffleQueryStage", 0),
            "broadcasts": counts.get("BroadcastExchange", 0)
            + counts.get("BroadcastQueryStage", 0),
        }
        expected = set(_EXPECTED.get(name, ()))
        if at_scale:
            expected |= _EXPECTED_AT_SCALE.get(name, set())
        if name == "pipeline_quality_ensemble" and _ensemble_smj_justified():
            expected.add("sort_merge_join")
        flags = []
        for op, flag in _FLAG_NAMES.items():
            n = counts.get(op, 0)
            if n:
                row[flag] = row.get(flag, 0) + n
                if flag not in ("arrow_python",) and flag not in expected:
                    if flag not in flags:
                        flags.append(flag)
        if counts.get("__aqe_unresolved__"):
            flags.append("aqe_plan_unreadable")  # audit row is incomplete, not clean
        row["unexpected"] = flags
        rows[name] = row
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = set(sys.argv[2:]) or None

    from torchfusion_spark.session import session

    spark = session(app_name="torchfusion_plan_audit")
    rows = audit(spark, sf_dir, names)

    out = os.environ.get("PLAN_AUDIT_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.json"
    )
    if names and os.path.exists(out):
        # partial re-measure (explicit name filter): merge into the full
        # artifact instead of clobbering it — tests derive their shuffle
        # ceilings from every recorded entry. Entries whose query no
        # longer exists in the registry are pruned, so a rename can't
        # leave a ghost row that tests keep consuming.
        from torchfusion_spark.plans import REGISTRY

        with open(out) as f:
            merged = {k: v for k, v in json.load(f).items() if k in REGISTRY}
        merged.update(rows)
        rows_out = merged
    else:
        rows_out = rows
    with open(out, "w") as f:
        json.dump(rows_out, f, indent=1, sort_keys=True)

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
