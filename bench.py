"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Headline set: the TPC-H-shaped queries (scan/join/agg/window/TopK paths)
plus the inference flagship — the plans whose physical shape matters at
100 TB (shuffle count, broadcast choice, pushdown).

Round-6 methodology (VERDICT r05 items 5+6): each query runs twice and
reports its best ("queries") plus |run1-run2| ("spread") so scheduler
jitter at the sub-second floor is distinguishable from a real
regression; streaming witnesses are timed but reported in a separate
"streaming" section and excluded from "value" and the DuckDB ratio —
micro-batch machinery vs a batch GROUP BY is not a plan comparison.

Round-7 methodology (VERDICT r06 items 3/4/7): "cold" publishes each
query's FIRST-run time so per-query warm/cold attribution is explicit,
AND the prewarm now stages every session-memoized relation the headline
set reads — including the minhash cluster labels, whose connected-
components checkpoint loop previously ran inside the first timed query
(per-call nonce scoping isolates the loop's scratch; the memoized label
RELATION it produces is prewarmable like any other staged relation, so
its cost is charged to staging_warm_sec, not hidden in `cold`/`spread`);
the complete payload is also written to BENCH_LOCAL.json (the driver
records only a stdout tail, which truncated most r6 per-query rows);
the streaming section adds input_rows + rows_per_sec throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_revenue_forecast",
    "q10_returned_items",
    "q14_promo_revenue",
    "q18_large_volume_customer",
    "q19_disjunctive_predicates",
    "q9_product_profit",
    "q13_customer_distribution",
    "win_running_sum",
    "agg_distinct_count",
    "fn_time_bucket",
    "argmax_embeddings",
    "torch_inference_classes",
    "dedup_exact",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_cosine_near_dup_lsh",
    "text_quality_stats",
    "pipeline_corpus_clean",
    "events_range_join",
    "sim_quantize_int8",
    "events_sessionize",
    "sim_semantic_dedup",
    "events_retention",
    "corpus_pack_sequences",
    "corpus_chunk_overlap",
    # round-4 derivation rewrites — benched so a plan regression shows
    # up as a timing regression too, not just an audit flag
    "q2_min_cost_supplier",
    "q17_small_quantity_revenue",
    "q20_potential_promotion",
    "q21_waiting_supplier",
    # round-5 widening: the remaining judge-tracked scale-path operators
    # (inverted-index containment, Bloom decontamination, the full
    # clusters->canonical pipeline) and a streaming witness, so every
    # 100 TB-critical family carries per-round timing accountability
    "dedup_containment",
    "text_decontaminate_bloom",
    "pipeline_dedup_canonical",
    # round-7 addition: exact-substring dedup (the last member of the
    # mandated dedup family) — benched from day one
    "dedup_substring",
    # round-7 addition: per-source (domain-level) quality gate — benched
    # from day one; its fingerprint shuffle is the corpus-wide dup check
    "corpus_source_filter",
    # round-7 addition: the substring-dedup ACTION step (strip duplicated
    # spans, keep the earliest occurrence, rebuild the cleaned corpus)
    "corpus_strip_dup_spans",
    # round-7 addition: span-level benchmark decontamination (drop the
    # quote, keep the doc) — shares the strip/rebuild tail
    "text_decontaminate_spans",
    # round-7 additions: BM25 keyword retrieval + CCNet-style LM quality
    # scoring — both read the session-staged unigram-tf relation
    "text_bm25_topk",
    "text_lm_perplexity",
    # round-13 addition: hybrid retrieval fusion (RRF over the BM25 +
    # dense cosine top-k lists) — reads both staged relations
    "retrieval_rrf_fusion",
    # round-13 addition: RAG context assembly over the fused hits (lead
    # chunks, greedy char-budget prefix, ordered rebuild + content hash)
    "pipeline_rag_context",
    # round-7 addition: DSIR importance weighting — same staged relation
    "sample_dsir_importance",
    # round-7 addition: Gopher quality-rule filter — the cheapest shape
    # in the family (one scan, zero shuffles), benched from day one
    "text_gopher_rules",
    # round-8 additions: URL-canonicalization dedup (single keeper-window
    # shuffle), the LSH mega-cluster collapse (bounded output where
    # the pair query is C(n,2)), and the composed FineWeb-style quality
    # gate (gopher ∧ source ∧ url-keeper, reason-coded) — benched from
    # day one
    "dedup_url_canonical",
    "sim_near_dup_collapse",
    "pipeline_quality_gate",
    "corpus_url_filter",
    "sample_temperature_mixture",
    # round-9 additions: the trained model-based quality gate (NB
    # log-odds over the shared hashed feature space, broadcast weights)
    # and the Nemotron-CC-style quality-signal ensemble composed over it
    # — benched from day one; both read the session-staged tf relation
    "text_quality_classifier",
    "pipeline_quality_ensemble",
    # round-9 additions: the iterative BPE merge trainer (3 greedy-merge
    # rounds on the vocab-sized symbol stream; word rollup from the
    # staged tf relation) and its inference half (apply the learned
    # merges, per-doc compression stats)
    "corpus_bpe_train",
    "corpus_bpe_apply",
    # round-9 addition: the upsample materializer (temperature-mixture
    # repeat factors → concrete per-doc epoch copies; broadcast plan +
    # scan-speed fan-out)
    "sample_upsample_epochs",
    # round-10 addition: incremental URL dedup against the persisted
    # seen-set (index build memoized per corpus; the benched cost is the
    # batch canonicalize + broadcast probe — the recurring-ingest shape)
    "dedup_url_incremental",
    # round-11 addition: the end-to-end pretraining corpus assembly
    # (filter → dedup → ensemble → decontaminate → mixture → upsample →
    # pack, composed over the shared staged/checkpointed relations) —
    # the benched cost is the composition over already-staged inputs
    "pipeline_pretrain_corpus",
    # round-12 addition: the O(log n)-rounds star-contraction clusters
    # variant (deep/chain graphs) — benched from day one; the SIGNATURE
    # relation is session-staged, so the benched cost is the banded LSH
    # pair join plus the contraction loop (re-run every call on purpose —
    # the loop is the thing this witness times)
    "dedup_minhash_clusters_star",
    # round-12 addition: perceptual payload dedup (byte aHash via Arrow
    # scan + the SimHash banded Hamming tail) — benched from day one
    "multimodal_dedup",
    # round-13 addition: frame-level perceptual dedup (sampled-frame
    # aHash → packed-key banded tail → containment-shape doc verdict)
    "multimodal_frame_dedup",
    # round-14 addition: C4-style line-level boilerplate removal (the
    # third dedup granularity; map-combinable line-hash rollup +
    # broadcast anti-join probe) — benched from day one; the LINE
    # relation is session-staged, so the benched cost is the rollup,
    # probe and per-doc rebuild
    "corpus_strip_boilerplate_lines",
    # round-15 addition: the ANN recall audit (IVF recall@k vs exact
    # top-k; capped-LSH pair recall overall and on the >=0.42 near-dup
    # band) — the measured price of the r14 hot-bucket cap, benched from
    # day one; reads the staged norms + bucket relations
    "sim_ann_recall_audit",
]

# Streaming witnesses carry round-over-round timing accountability but are
# excluded from the DuckDB-comparable ratio (VERDICT r05 item 6): a
# micro-batch pipeline's wall-clock vs a batch GROUP BY is machinery
# overhead, not a query-plan comparison.
STREAMING = [
    "stream_windowed_counts",
    # round-7 widening: a stateful aggregation and a stream-stream join
    # so the throughput section covers the state-store and dual-watermark
    # paths, not just the stateless tumbling window
    "stream_stateful_user_stats",
    "stream_stream_join",
    # round-13 addition: the watermark/late-data eviction witnesses
    # (3-file backdated replays, append mode) — the windowed-agg and
    # dedup state-eviction paths benched
    "stream_late_eviction",
    "stream_late_dedup",
    # round-14 addition: the event-time TIMER path (session-timeout state
    # machine — ListState-shaped group state + event-time timeout) — the
    # state/throughput row covers the timer-driven eviction path
    "stream_session_timeout",
]


def parse_sf(sf_dir: str) -> float:
    """Best-effort scale factor from a dir name like .../sf0.1 — never
    crashes: a path merely containing 'sf' (or a suffix like
    sf1_rehearsal) yields its numeric part or 0.0, not a ValueError at
    startup. Shared with tools/duckdb_baseline.py; plan_audit detects
    scale from parquet footers instead (the robust path, ADVICE r04) —
    here sf is a report label only, so the name parse is acceptable."""
    import re

    m = re.search(r"sf(\d+(?:\.\d+)?)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else 0.0


def claim_stdout() -> int:
    """Reserve the real stdout for the single JSON result line.

    Round-15's BENCH artifact failed to parse at the driver boundary
    (BENCH_r15.json parsed: null) even though the bench printed its line,
    so per VERDICT r16 item 2 the contract is now enforced at the fd
    level: fd 1 is redirected onto stderr for the WHOLE run — the JVM,
    py4j, Ivy, any child process and any stray Python print() inherit
    the redirect — and the saved real stdout fd is used exactly once,
    by emit_result(). Call before the JVM starts so it inherits fd 1's
    new target.
    """
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    return real_stdout


def emit_result(real_stdout: int, payload: dict) -> None:
    """Write the one-line JSON contract to the reserved stdout fd."""
    os.write(real_stdout, (json.dumps(payload) + "\n").encode())
    os.close(real_stdout)


def main() -> None:
    real_stdout = claim_stdout()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = parse_sf(sf_dir)

    from torchfusion_spark.plans import REGISTRY
    from torchfusion_spark.session import session

    spark = session(app_name="torchfusion_bench")

    # Warm the JVM once so timings measure the queries, not first-query
    # JIT: parquet footers, then one tiny query through each hot codegen
    # path (decimal aggregate, broadcast join, window) over LIMITed rows.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from torchfusion_spark.sources import load_tables

    try:
        load_tables(spark, sf_dir)
        li = spark.table("lineitem").limit(10_000)
        (
            li.join(spark.table("orders").limit(1_000), F.expr("l_orderkey = o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).alias("s"))
            .withColumn("r", F.row_number().over(Window.orderBy("l_returnflag")))
            .count()
        )
    except Exception:  # noqa: BLE001 — warmup is best-effort, never fatal
        pass

    # Pre-warm the session-staged relations OUTSIDE the timed region
    # (VERDICT r03 item 2): __sim_norms and the MinHash signature are
    # memoized per session and shared by whole query families; billing
    # their one-time build to whichever family member happens to run
    # first made sim_cosine_topk look 55× slower than its steady-state
    # plan. The build cost is still reported (staging_warm_sec below) —
    # it is paid once per session, amortized across every family query.
    staging_warm = time.perf_counter()
    staging_components: dict = {}
    try:
        # The staging schedule (builders, dependency phases, pool width
        # and its rationale) lives in torchfusion_spark/staging.py — ONE
        # copy shared with tools/perf_probe.py (code-review r16: the two
        # hand-duplicated lists drifted).
        from torchfusion_spark.staging import prewarm_staging

        # Per-relation itemization (VERDICT r15 item 4): each component's
        # number is its own wall-clock UNDER the concurrent schedule
        # (threads share the local[32] scheduler, so components overlap
        # and the sum exceeds staging_warm_sec — the per-row figure says
        # which relations dominate the bill, the total says what a cold
        # session actually pays).
        def _timed(name, fn, *a):
            t0 = time.perf_counter()
            fn(*a)
            staging_components[name] = round(time.perf_counter() - t0, 4)

        prewarm_staging(spark, timed=_timed)
    except Exception as exc:  # noqa: BLE001 — prewarm is best-effort, never
        # fatal, but never SILENT either: an aborted prewarm shifts the
        # unstaged relations' build cost into the first timed queries,
        # which corrupts the warm/cold attribution the bench publishes —
        # the payload must say so (code-review r07 finding)
        staging_error = f"{type(exc).__name__}: {exc}"
    else:
        staging_error = None
    staging_warm = round(time.perf_counter() - staging_warm, 4)

    # Per-query fault isolation (round-2 postmortem: one AnalysisException
    # aborted the whole bench and the round published no timings). A broken
    # query costs its own row in `errors`; the JSON summary always prints.
    #
    # Best-of-2 per query (VERDICT r05 item 5): n=1 cold timing cannot
    # distinguish scheduler jitter from a real regression at the sf0.1
    # sub-second floor. Each query runs twice; `queries` reports the best,
    # `spread` reports |run1 - run2| so a noisy row is visibly noisy.
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    colds: dict[str, float] = {}
    errors: dict[str, str] = {}

    def run_timed(name: str) -> None:
        runs: list[float] = []
        try:
            # inside the try: a stale HEADLINE entry (renamed/removed
            # registry query) must record an error row, not KeyError the
            # whole bench into publishing nothing (round-2 postmortem)
            q = REGISTRY[name]
            for _ in range(2):
                t0 = time.perf_counter()
                df = q.builder(spark, sf_dir)
                n = df.count()  # full materialization without driver collect
                assert n >= 0
                runs.append(time.perf_counter() - t0)
            timings[name] = round(min(runs), 4)
            spreads[name] = round(abs(runs[0] - runs[1]), 4)
            # explicit warm/cold attribution (VERDICT r06 item 3): run 1
            # carries any per-query first-use cost staging_warm_sec does
            # not cover — publishing it per query means the reader never
            # has to reverse-engineer the cold path from `spread`
            colds[name] = round(runs[0], 4)
        except Exception as exc:  # noqa: BLE001 — isolate, record, continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]

    for name in HEADLINE:
        run_timed(name)
    streaming_timings: dict[str, float] = {}
    streaming_spreads: dict[str, float] = {}
    streaming_colds: dict[str, float] = {}
    for name in STREAMING:
        run_timed(name)
        if name in timings:
            streaming_timings[name] = timings.pop(name)
            streaming_spreads[name] = spreads.pop(name)
            streaming_colds[name] = colds.pop(name)

    # streaming throughput (VERDICT r06 item 7): rows/sec over the input
    # cardinality so round-over-round streaming comparisons measure data
    # throughput, not just micro-batch machinery overhead
    try:
        stream_input_rows = spark.table("events").count()
    except Exception:  # noqa: BLE001
        stream_input_rows = None
    streaming_rps = {
        k: round(stream_input_rows / v, 1)
        for k, v in streaming_timings.items()
        if stream_input_rows and v > 0
    }

    total = round(sum(timings.values()), 4)
    payload = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "spread": spreads,
        "cold": colds,
        "sf": sf,
        "queries_ok": len(timings) + len(streaming_timings),
        "queries_failed": len(errors),
        "staging_warm_sec": staging_warm,
        # per-relation build wall-clock under the concurrent prewarm
        # schedule (components overlap; see the _timed note) — VERDICT
        # r15 item 4's itemization
        "staging_components": dict(sorted(staging_components.items())),
        **({"staging_error": staging_error} if staging_error else {}),
        "streaming": {
            "queries": streaming_timings,
            "spread": streaming_spreads,
            "cold": streaming_colds,
            "input_rows": stream_input_rows,
            "rows_per_sec": streaming_rps,
            # state-store footprint of each witness's final progress
            # (rows + bytes from stateOperators, recorded by the runner,
            # keyed by the memory-sink name minus its tf_ prefix):
            # round-over-round growth here flags an unbounded keyspace
            # long before it OOMs an executor (VERDICT r7 item 5)
            "state": {
                k.removeprefix("tf_"): v
                for k, v in getattr(spark, "_tf_stream_state", {}).items()
            },
            "total_sec": round(sum(streaming_timings.values()), 4),
        },
    }
    if errors:
        payload["errors"] = errors

    # measured stand-in for the (unpublished) reference baseline: DuckDB
    # running the same queries' oracle SQL at the same sf, recorded by
    # tools/duckdb_baseline.py — ratio > 1 means Spark is slower overall
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_DUCKDB.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        if base.get("sf") == sf and base.get("queries"):
            common = [k for k in base["queries"] if k in timings]
            spark_total = sum(timings[k] for k in common)
            duck_total = sum(base["queries"][k] for k in common)
            payload["baseline"] = {
                "engine": "duckdb",
                "common_queries": len(common),
                "duckdb_total_sec": round(duck_total, 4),
                "spark_total_sec": round(spark_total, 4),
                "ratio_spark_over_duckdb": round(spark_total / duck_total, 3) if duck_total else None,
                # gate math in one field (VERDICT r04 item 8): the ratio
                # with the one-time staging build FULLY charged to this
                # run — the conservative bound; the steady-state ratio
                # above amortizes it across the session's query families
                "ratio_with_staging": round((spark_total + staging_warm) / duck_total, 3)
                if duck_total
                else None,
            }

    # the driver keeps only a tail window of stdout (BENCH_r06 lost ~22 of
    # 36 per-query timings to truncation — VERDICT r06 item 4): persist
    # the COMPLETE payload to a repo artifact so round-over-round
    # per-query comparison never depends on the driver's tail window.
    # Only the canonical sf0.1 run writes it — a quick sf0.01 smoke run
    # must not clobber the round-comparison record with mismatched-scale
    # numbers (non-canonical runs write a sf-suffixed scratch file).
    name = "BENCH_LOCAL.json" if sf == 0.1 else f"BENCH_LOCAL_sf{sf}.json.scratch"
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), name)
    try:
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except Exception:  # noqa: BLE001 — the stdout line is the contract
        pass

    emit_result(real_stdout, payload)
    spark.stop()


if __name__ == "__main__":
    main()
