"""Engine-wide physical-plan audit: sweep EVERY registered batch key
for the plan shapes that break at scale, and pin the result.

The recursion lesson this round (`recursive_bfs_hops` passed sf0.01
and died at 10x on RECURSION_ROW_LIMIT) is the motivation: per-key
plan-shape tests cover the shapes we thought to assert; this sweep
asserts three scale smells over the WHOLE registry so a new operator
can't quietly introduce one:

- **CartesianProduct** — unbounded pair blow-up;
- **BroadcastNestedLoopJoin** — per-row re-scan of the build side
  (acceptable ONLY when the build side is provably tiny/bounded);
- **global Window** — ``Window``/``WindowGroupLimit`` with an EMPTY
  partitionSpec: the whole relation sorts through ONE task
  (acceptable ONLY on relations bounded by something other than data
  volume: an alphabet, a calendar, |groups| after aggregation).

Every occurrence must be in ALLOWLIST with its boundedness argument,
or the audit fails (tests/test_plan_audit.py). Streaming keys drain
to materialized results inside the builder, so their returned plan is
a checkpoint scan — they are listed as "materialized" and their plan
shapes are covered by tests/test_plan_shapes.py + test_streaming.py.

Writes PLAN_AUDIT.json. Usage: python tools/plan_audit.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")

# keys whose builders run a streaming drain / sink write and return a
# materialized (localCheckpoint'd) result — no batch plan to audit
MATERIALIZED_PREFIXES = ("cdc_stream_", "stream_")
MATERIALIZED_KEYS = {
    "cdc_incremental_merge",
    "cdc_drift_merge",
    "stream_minhash_ingest",
    "pyds_sink_roundtrip",
    "pyds_stream_sink_roundtrip",
    "partitioned_sink_roundtrip",
    "bayeux_live_roundtrip",
    "bayeux_stream_roundtrip",
    "bayeux_multi_topic",
    "compaction_execute",
}

# smell -> {key: boundedness argument}. An entry here is a DOCUMENTED
# exception: the flagged structure is bounded by something other than
# data volume.
ALLOWLIST: dict[str, dict[str, str]] = {
    "global_window": {
        "token_budget_allocation": "three windows over the |sources|-row aggregate (share, remainder rank, leftover) — metadata relation, thousands of rows at 100 TB, never the corpus (same class as mixture_reweight)",
        "bpe_merge_step": "window over distinct char pairs — bounded by alphabet^2 (~1k rows); documented in its docstring",
        "compaction_bin_pack": "bin-pack walk over one row per date partition — metadata scale, not data scale",
        "concurrency_sweepline": "day-offset running sum over one row per day — calendar-sized by construction (the data-proportional sum is day-partitioned)",
        "join_cardinality_estimate": "top-K contributor rank: WindowGroupLimit pre-limits each partition to K before the single-partition final, so one task sees K*partitions rows, not |keys|",
        "mixture_reweight": "share window over one row per source",
        "rfm_segmentation": "three ntile windows over the per-USER aggregate — the documented cardinality cliff (users << purchase events)",
        "tpch_q15_top_supplier": "max over the per-supplier revenue view — |suppliers| rows after aggregation (the TPC-H view-then-max shape)",
        "hybrid_search_rrf": "rank row_numbers over the per-leg fusion pools — each leg is TakeOrderedAndProject-cut to FUSE_POOL=100 rows BEFORE the window, so the single partition holds <=100 rows at any corpus size",
        "curation_funnel_report": "the round-10 token_budget stage composes token_budget_allocation's largest-remainder windows over the |sources|-row aggregate — the same metadata-relation class as that key's own entry",
    },
    "bnlj": {
        "ann_ivf_topk": "build side = N_QUERIES x N_PROBE probed-centroid pairs — constants of the query, not the corpus",
        "ann_ivf_pq_topk": "build sides = the N_QUERIES-row probe/LUT relation and the (avgdl-class) query set for refinement — query constants, not the corpus (same class as ann_ivf_topk)",
        "ann_eval_ndcg": "contains the audited ann_ivf_pq_topk + topk_cosine_sim subplans — their query-constant build sides, nothing new",
        "hybrid_search_rrf": "dense-leg probe = ONE embedding row; bm25 corpus scalar — one-row build sides",
        "ivf_train_centroids": "build side = the k=16-row refined quantizer relation — index constants, not the corpus (same class as ann_ivf_topk)",
        "ivf_index_merge": "build side = the N_CENTROIDS=16-row broadcast quantizer in the delta branch's ivf_assignments (the state branch reads index parquet, no scoring) — index constants, not the corpus (same class as ivf_train_centroids)",
        "bigram_lm_score": "corpus log-prob scalar — one-row build side",
        "bigram_pmi": "two corpus-total scalars — one-row build sides",
        "bm25_score": "corpus stats (N, avgdl) scalar — one row",
        "contrastive_pair_mining": "anchor set bounded by the configured query count",
        "dsir_importance_weights": "corpus feature-total scalars (r_total, t_total) crossed into the 1024-row bucket model — one-row build side",
        "heavy_hitters_sketch": "stream-total scalar for the error bound — one row",
        "join_cardinality_estimate": "join-size total scalar — one row",
        "ann_eval_recall": "three scalar count relations cross-joined into the one-row recall report (same class as lsh_eval_pr)",
        "lsh_eval_pr": "three scalar count relations cross-joined into the one-row report",
        "nb_token_classifier": "model scalars (vocab size, class token totals, doc priors) — one-row build sides crossed into the broadcast LLR relation and the final score",
        "pagerank_step": "node-count / teleport scalar — one row",
        "pca_power_iter": "max-|w| normalizer scalar per iteration — one-row build sides (the quantizer itself, same class as bigram_lm_score's corpus scalar)",
        "pca_project_residual": "the power-iteration normalizer scalars plus the vᵀv scalar, each one row, repeated across the shared-subplan branches (x feeds t, rsq and xsq) — every build side is a single-row relation",
        "stupid_backoff_score": "corpus token-total scalar N — one-row build side crossed into the unigram model and the OOV floor",
        "quantile_bucketize": "build side is ONE row of three percentile boundaries",
        "range_join_bands": "build side is the fixed price-band table — |bands| rows by construction",
        "rfm_segmentation": "recency anchor scalar (max purchase ts) — one row",
        "tfidf_top_terms": "document-count scalar for IDF — one row",
        "topk_cosine_sim": "build side is the N_QUERIES row query set (bounded constant)",
        "tpch_q11_important_stock": "value-share threshold scalar — one row (the spec's correlated scalar subquery)",
        "tpch_q22_dormant_customers": "average-balance scalar — one row (the spec's scalar subquery)",
        "wau_mau_stickiness": "max-week clip scalar — one row (the MAU window itself is a narrow explode, rewritten off a range join after this sweep flagged it)",
        "curation_funnel_report": "the round-10 dsir_select stage composes dsir_importance_weights' corpus-total scalars (r_total, t_total) — one-row build sides, the same class as that key's own entry",
    },
    "cartesian": {},
}


def audit_one(df) -> dict:
    plan = df._jdf.queryExecution().sparkPlan()
    counters = {"global_window": 0, "bnlj": 0, "cartesian": 0, "exchanges": 0}

    def walk(node):
        name = node.nodeName()
        if "Window" in name:
            try:
                if node.partitionSpec().isEmpty():
                    counters["global_window"] += 1
            except Exception:
                pass
        if "BroadcastNestedLoop" in name:
            counters["bnlj"] += 1
        if "CartesianProduct" in name:
            counters["cartesian"] += 1
        if name == "Exchange":
            counters["exchanges"] += 1
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(plan)
    return counters


def run() -> dict:
    from sfdc_cdc_aws_spark.registry import load_all
    from sfdc_cdc_aws_spark.session import get_session

    spark = get_session("plan-audit")
    specs = load_all()
    report: dict = {"sf": SF, "keys": {}, "violations": []}
    for name in sorted(specs):
        if name.startswith(MATERIALIZED_PREFIXES) or name in MATERIALIZED_KEYS:
            report["keys"][name] = "materialized"
            continue
        row = audit_one(specs[name].fn(spark, SF))
        report["keys"][name] = row
        for smell in ("global_window", "bnlj", "cartesian"):
            if row[smell] > 0 and name not in ALLOWLIST[smell]:
                report["violations"].append({"key": name, "smell": smell, **row})
    # allowlist hygiene: every allowlisted key must actually exhibit
    # its smell (stale entries hide future regressions)
    stale = [
        (smell, key)
        for smell, keys in ALLOWLIST.items()
        for key in keys
        if not (
            isinstance(report["keys"].get(key), dict)
            and report["keys"][key][smell] > 0
        )
    ]
    report["stale_allowlist"] = [f"{s}:{k}" for s, k in stale]
    return report


def main() -> None:
    report = run()
    out = os.path.join(REPO, "PLAN_AUDIT.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(
        f"audited {len(report['keys'])} keys: "
        f"{len(report['violations'])} violations, "
        f"{len(report['stale_allowlist'])} stale allowlist entries"
    )
    for v in report["violations"]:
        print("VIOLATION", v)
    for s in report["stale_allowlist"]:
        print("STALE", s)
    print("wrote", out)


if __name__ == "__main__":
    main()
