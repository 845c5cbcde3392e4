"""Dump `.explain("formatted")` physical plans for the bench headline
queries into PLANS.md, each preceded by the plan-shape properties the
repo's tests pin (broadcasts, pushdown, partial aggregation, exchange
counts) — the artifact of the "explain and iterate until it's the plan
you'd want" loop.

Plans are captured at sf0.001 (plan SHAPE is scale-free for these
queries: the same hints, pushdowns, and join strategies are asserted
by tests/test_plan_shapes.py; only AQE's runtime coalescing differs
at larger inputs).

Usage: python scripts/dump_plans.py [sf_dir] [out_md]
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from knovexlite_spark.session import get_spark

NOTES = {
    "q1_filter_project": "filter + projection reach the parquet scan "
    "(PushedFilters / pruned ReadSchema); no exchange before the sort.",
    "q3_multiway_join": "dimension sides broadcast; the single shuffle "
    "is the fact-side aggregation.",
    "q7_grouped_agg": "partial (map-side) HashAggregate before the "
    "exchange, final after — combinable aggregation.",
    "q11_topk_window": "per-key window top-k: one hash-partitioned "
    "exchange on the window key, rank filter above it.",
    "q23_local_supplier_revenue": "6-way join: all dims broadcast; the "
    "only shuffles are lineitem⋈orders and the final group.",
    "q12_window_frame": "running frame over (key, time): single "
    "exchange on the partition key.",
    "q18_tumbling_window": "tumbling event windows as a grouped agg on "
    "the truncated timestamp — partial agg + one exchange.",
    "cq_paths": "EFO chain query: anchored constant pushed to the scan "
    "as EqualTo, broadcast joins along the chain (plan-shape-pinned).",
    "cq9_samenation": "cyclic EFO query: broadcast dims, equi-joins "
    "only (no cartesian anywhere).",
    "dedup_exact": "content-hash dedup: partial/final HashAggregate "
    "pair — map-side combinable (plan-shape-pinned).",
    "dedup_minhash": "signature agg (partial mins before the exchange), "
    "stateless per-row band explode (one read of the signature frame), "
    "banded candidate equi-join, broadcast pair list into the verify "
    "join (plan-shape-pinned).  100%-density self-union fixture, "
    "restriction off (the configuration where restriction cannot help).",
    "dedup_minhash_default": "the SHIPPED default path at ~10% baseline "
    "duplicate density: identical signature/band chain, then the "
    "candidate-doc semi-join restriction (restrict_verify=True — the "
    "asymmetric-risk default; pair list lazily checkpointed, broadcast "
    "into the restriction and verify joins) so verification shingles "
    "only candidate docs.  The adaptive 'auto' mode exists but is "
    "deliberately not default — crossover and decision-cost "
    "measurements in SCALE.md.",
    "text_quality": "pure column expressions over the scan — a single "
    "WholeStageCodegen span, zero exchanges.",
    "ann_topk": "brute: broadcast query batch, partition-local top-k "
    "partials; IVF: fused assign+probe+score kernel (no corpus "
    "self-join).",
    "lang_id": "one regexp scan per language, argmax in-row — zero "
    "exchanges.",
    "pii_scrub": "four regexp_count scans + chained ordered "
    "regexp_replace on the planted text — map-only JVM regex inside "
    "one codegen span; the only exchange is the count/redaction "
    "column join on doc_id.",
    "substr_dedup": "substring-level span dedup: window-start explode "
    "(map-side generator) + ONE combinable span-frequency "
    "HashAggregate (partial_count before the exchange), left-semi hot "
    "join, output-scaled per-doc hit collection, higher-order token "
    "rebuild — no cartesian/NLJ anywhere (plan-shape-pinned).",
    "domain_cap": "per-domain cap: one URL_RE regexp_extract per doc "
    "(map-only), hash-rank row_number window partitioned by domain "
    "for the capped branch, union with the uncapped no-URL branch; "
    "the windowless hash-rate mode is the skew-proof variant.",
    "ngram_ppl": "bigram-LM train + perplexity score: one combinable "
    "n-gram HashAggregate (partial_count) for the model, broadcast "
    "model join into the per-doc log-prob aggregation — no cartesian, "
    "model table vocabulary-bounded.",
    "semantic_dedup": "SemDeDup: kmeans_fit runs eagerly (driver-loop "
    "Lloyd, one job per iteration) before this lazy plan; the plan "
    "itself is the map-only multi-probe assign kernel, per-cell "
    "applyInPandas GEMM pair search (cell hash exchange only — no "
    "cartesian), and the pointer-jumping CC closure's hash joins.",
    "bm25_topk": "BM25: postings/df/dl HashAggregates (partial_count "
    "before each exchange), query-term and stats sides BROADCAST into "
    "the scoring join, one combinable (query, doc) partial_sum, "
    "per-query window top-k — candidate-sized everywhere, no "
    "cartesian except the broadcast 1-row corpus-scalar join.",
    "clf_score": "hashed-feature classifier: training runs eagerly "
    "(3 driver-looped epochs, ONE Spark job each — broadcast-weight "
    "margin join, combinable gradient groupBy, parameter-sized "
    "collect) before this lazy plan; the plan itself is the "
    "broadcast-model scoring pass — one explode + combinable per-doc "
    "margin sum, empty docs restored at bias via a left join.",
    "rrf_fuse": "hybrid retrieval fusion: both candidate generators "
    "(BM25 + dense brute) feed a candidate-sized union; the fusion "
    "tail is ONE exchange hashed on query_id alone (the subset key "
    "satisfies the (query, doc) aggregation AND the re-rank window — "
    "no composite exchange, plan-shape-pinned), rrf_scaled as exact "
    "integer division.",
    "pagerank": "5 synchronous power steps, ONE job each: edges join "
    "the node-sized rank frame, combinable groupBy(dst) partial sum "
    "(hub skew collapses map-side), node-spine left join; "
    "localCheckpoint per step truncates the iterative lineage — the "
    "plan shown is the final step's.",
    "gk_quantile": "from-scratch mergeable quantile summary, scale "
    "form: per-group builds sort LOCALLY after one hash exchange on "
    "the group key (no rangepartitioning anywhere — pinned); the "
    "32-group merge runs as a fan_in=8 tree, each round ONE Window "
    "over the summary-sized frame with windows partitioned by batch; "
    "compress + everything downstream is KB-sized.  (The per-round "
    "localCheckpoint truncates lineage, so the plan shown is the "
    "final round + compress.)",
    "gk_by_key": "per-key quantiles (round 11): ONE combinable "
    "groupBy(key, v) is the only row-sized stage (partial_sum before "
    "its exchange), then every window partitions by the business key "
    "— per-key cumulative-rank build, per-key band compress, "
    "broadcast rational-fraction crossJoin, per-(key, frac) "
    "row_number pick; 1024 keys answered in one pass, no "
    "rangepartitioning, no driver loop.",
    "mg_heavy_hitters": "Misra-Gries heavy hitters over the real "
    "token stream (round 11): map-only token explode, ONE combinable "
    "groupBy(src, item) (partial_count before the exchange — the "
    "only row-sized aggregation), per-source top-m windows on the "
    "distinct-item frame, merge + trim + top-k on the P*m summary "
    "frame.  Since round 12 the build is lazily localCheckpointed "
    "before mg_summary's auto-route source collect, so the visible "
    "plan is the merge over the (P*m-row) checkpoint scan — the "
    "collect and BOTH merge branches share one build derivation.",
    "ts_resample": "Hypertable-style resample + gap fill (round 11): "
    "ONE combinable groupBy(user, 15-min bucket), per-key (min,max) "
    "bounds on the aggregated frame, two-level sequence explode for "
    "the dense spine (no generated array beyond 4096 elements), left "
    "join back, zero/ffill via a window PARTITIONED BY the key — "
    "never a global sort, never a single-partition window.",
    "mg_local_hh": "Bounded-memory heavy hitters (round 12): the A/B "
    "twin of mg_heavy_hitters.  One round-robin exchange of COMPACT "
    "document rows (pre-explode, local[32] parallelism only — file "
    "splits make it unnecessary at corpus scale), then the token "
    "explode and the Misra-Gries summarize run MAP-ONLY inside "
    "MapInPandas (chunk-per-Arrow-batch py_mg kernels, O(batch + m) "
    "memory); everything after the build — source collect, merge "
    "tree, top-k — moves only <= P*m summary rows.  No distinct-"
    "token shuffle exists anywhere in the plan (the exact-count "
    "build's groupBy(src, item) is the cost this form removes).",
    "ts_rolling": "Moving aggregates over the dense series (round 12): "
    "the ts_resample chain plus trailing 8-bucket rolling "
    "sum/avg/max and a span-windowed EWMA (explicit lag chain) — all "
    "windows PARTITION BY user ORDER BY bucket, exactly the fill "
    "windows' spec, so the rolling stage adds ZERO exchanges (the "
    "A/B delta vs ts_resample is pure window evaluation).",
    "gk_local_quantile": "Bounded-memory quantile summary (round 13): "
    "the A/B twin of gk_quantile.  One round-robin exchange of the "
    "compact single-column value rows (local[32] parallelism only — "
    "file splits make it unnecessary at corpus scale), then the "
    "build runs MAP-ONLY inside MapInPandas (vectorized py_gk chunk "
    "kernels cascading through a bounded in-memory merge tree, "
    "O(batch + fan*k*log chunks) memory); everything after — source "
    "collect, merge tree, compress — moves only <= P*k bracket rows. "
    "No per-group sort-window pass over raw rows exists anywhere "
    "(the windowed build's per-source sorts are the cost this form "
    "removes).",
    "gk_local_by_key": "Per-key bounded-memory quantiles (round 13): "
    "the A/B twin of gk_by_key.  One round-robin exchange of compact "
    "(key, cents) rows (local[32] parallelism aid), then a DICT of "
    "per-key cascades summarizes MAP-ONLY inside MapInPandas "
    "(buffered per-key chunking, O(cap + keys*fan*k*log) memory); "
    "the per-key merge TREE combines <= keys*P*k bracket rows with "
    "windows partitioned by (key, batch).  No (key, v)-sized groupBy "
    "anywhere.  At sf0.1 the summary frame (keys x P x k rows) makes "
    "this form SLOWER than the windowed build — the honest decision "
    "rule: it wins when distinct (key, value) cardinality grows with "
    "the data, not when keys*P*k exceeds the distinct-value count.",
    "mg_keyed_hh": "Exact-count per-key heavy hitters (round 13): top "
    "tokens per language — ONE combinable groupBy(lang, src, token) "
    "is the only row-sized pass (partial_count before its exchange), "
    "then per-(key, src) top-m windows on the distinct-token frame, "
    "per-key merge (counter sums + distinct-(src, err) totals + "
    "per-key re-trim window), per-key top-k.  Right at moderate "
    "vocabularies; the A/B twin removes the distinct-(key, token) "
    "shuffle for open ones.",
    "mg_local_keyed": "Open-vocabulary per-key heavy hitters (round "
    "13): the A/B twin of mg_keyed_hh.  One exchange of compact "
    "(lang, text) rows pre-explode (local[32] parallelism only), "
    "then the token explode and a DICT of per-language Misra-Gries "
    "kernel states run MAP-ONLY inside MapInPandas "
    "(O(keys_in_partition*m + batch) memory); mg_merge_by_key "
    "combines <= keys*P*m summary rows with ONE key-hashed exchange "
    "and per-key trim windows — no (key, token)-sized shuffle "
    "anywhere in the plan.",
    "corpus_profile": "One-pass multi-sketch profiler (round 14): GK "
    "quantile cascades, Misra-Gries heavy hitters, HLL registers, and "
    "column stats from a SINGLE lineitem scan — one exchange (the "
    "local[32] repartition parallelism aid), then ONE MapInPandas "
    "folding all three kernel families per partition; the only output "
    "is the tall summary frame (<= P*(k+m+2^p+cols) rows).  The "
    "three_pass A/B member pays one scan per family instead — at "
    "100 TB the scan is the dominant cost, so the profiler's saving "
    "is ~the full corpus read times (families - 1).",
    "bpe_encode": "BPE encode throughput (round 14): ONE scan of "
    "documents -> ArrowEvalPython/MapInPandas kernel with the merge "
    "ranks BROADCAST (vocab-sized, never shuffled) and a per-task "
    "word cache — no exchange anywhere; tokenizer cost scales "
    "embarrassingly with input splits.  Merges are learned once per "
    "sf_dir on the driver over the vocab-sized frequency table (the "
    "documented scalable split) and cached, so the row times encode.",
    "gk_local_noex": "gk_summary_local in its DESIGNED shape (round "
    "14): scan -> MapInPandas with ZERO exchange before the kernels — "
    "the only moving data is <= P*k bracket rows through the "
    "broadcast-rank merge tree.  The frozen gk_local_quantile row "
    "keeps its r13 repartition(32) for comparability; measurement "
    "showed that exchange costs more than the parallelism it buys at "
    "every scale (sf0.1 through 24x), and without it the local build "
    "beats the exact windowed build by mins at 6x and 24x.",
    "bpe_encode_real": "the TRANSFERABLE BPE number (round 15): same "
    "encode plan shape as bpe_encode (checkpointed-corpus scan -> "
    "MapInPandas, broadcast ranks, no exchange; the final agg is the "
    "summary-sized counter fold), but over a deterministic synthetic "
    "corpus with a realistic 30k-word zipf vocabulary, an 8,192-merge "
    "table from the incremental trainer, and a 4,096-entry word cache "
    "SMALLER than the vocabulary — sustained misses keep the "
    "per-new-word merge loop on the measured path (the r14 row's "
    "31-word template vocabulary made it a cache-hit-path number; "
    "that row stays for comparability).  The cachefull A/B member "
    "holds the whole vocabulary; the delta is the miss-path cost.",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"
    )
    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    import bench

    qs = bench.headline_queries()
    sections = []
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue().rstrip()
        # strip the volatile plan-id / file-path noise so diffs are
        # meaningful across rounds
        plan = re.sub(r"\[plan_id=\d+\]", "", plan)
        plan = re.sub(r"Location: \S+", "Location: <sf_dir>", plan)
        note = NOTES.get(name, "")
        sections.append(f"## {name}\n\n{note}\n\n```\n{plan}\n```\n")
    header = (
        "# PLANS — physical plans of the bench headline queries\n\n"
        "Generated by `python scripts/dump_plans.py` (explain(\"formatted\")\n"
        f"at {sf_dir}; regenerate after plan-affecting changes).  Each\n"
        "section notes the plan-shape property the test suite pins —\n"
        "tests/test_plan_shapes.py asserts these structurally, so a\n"
        "regression fails CI, not just this document.\n\n"
    )
    with open(out_path, "w") as f:
        f.write(header + "\n".join(sections))
    print(f"wrote {out_path} ({len(sections)} plans)")


if __name__ == "__main__":
    main()
