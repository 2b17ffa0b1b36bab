"""Regenerate PLANS.md — formatted physical plans of the flagship
query shapes, with the properties each plan is expected to show.

Run: python tools/gen_plans_md.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from sfdc_cdc_aws_spark.plans.introspect import plan_string  # noqa: E402
from sfdc_cdc_aws_spark.registry import load_all  # noqa: E402
from sfdc_cdc_aws_spark.session import get_session  # noqa: E402

SF = "/root/testdata/sf0.001"

SHOWCASE = {
    "allpairs_prefix_jaccard": (
        "AllPairs prefix filtering: the checkpointed shingle relation "
        "scans once; df joins back broadcast-or-hash on (lang, h); the "
        "candidate join touches PREFIX rows only (hot shingles fall "
        "outside every prefix), and the verify stage joins candidate "
        "pairs to per-doc sorted hash arrays with `array_intersect` in "
        "codegen — no posting-list pair explosion anywhere."
    ),
    "minhash_index_merge": (
        "incremental index maintenance as a partial-aggregate merge: "
        "TWO parquet index scans (corpus + arrival delta — no document "
        "text anywhere in the plan), map-side-partial bucket aggregates "
        "on each, one exchange on (band_id, bucket), and the merge "
        "re-aggregation (sum/bit_xor/min/max are all mergeable)."
    ),
    "editdist_verify_neardup": (
        "the near-dup VERIFY stage: exact Levenshtein runs only on the "
        "LSH-bounded candidate pairs — two fetch-by-id joins bring the "
        "texts to the pairs, the O(n*m) distance stays JVM-side codegen, "
        "and no plan node touches all-pairs space."
    ),
    "cdc_latest_snapshot": (
        "max_by aggregate with a map-side partial (`partial_max_by`) and a "
        "single hash-partition exchange on the group key — the shuffle "
        "carries combined per-key state, never the raw changelog."
    ),
    "tpch_q3_shipping": (
        "lineitem date filter pushed into the parquet scan "
        "(`PushedFilters`), filtered customer dim broadcast, top-k as "
        "`TakeOrderedAndProject` (no global sort)."
    ),
    "minhash_lsh_dedup": (
        "signatures computed narrow (one fold over hashed shingles), one "
        "exchange to group LSH buckets, pairs generated inside the bucket "
        "rows — no self-join, no cross join."
    ),
    "topk_cosine_sim": (
        "query vectors broadcast (`BroadcastNestedLoopJoin` over a 10-row "
        "build side); corpus scans once with the dot product in codegen; "
        "per-query top-k window over |Q|·k candidates only."
    ),
    "exists_subquery_suite": (
        "correlated EXISTS / NOT EXISTS decorrelated to LeftSemi and "
        "LeftAnti joins on the same key."
    ),
    "skew_salted_join": (
        "the salted join key `(o_orderkey, salt)` visible in the join "
        "condition; the build side replicated via `explode(sequence(...))`."
    ),
    "tpch_q5_local_supply": (
        "the 6-table join with every dim side `BroadcastHashJoin` and only "
        "lineitem⋈orders as a non-broadcast join; the order-date range "
        "filter pushed into the orders scan (`PushedFilters`)."
    ),
    "topk_cosine_numpy": (
        "the Arrow fast path: a `MapInPandas`/`ArrowEvalPython` stage doing "
        "the BLAS matmul with partial top-k, then one exchange of only "
        "|partitions|·|Q|·k candidate rows into the final window."
    ),
    "tpch_q1_pricing_summary": (
        "the canonical scan-bound aggregate: pushed date filter, one "
        "map-side-partial hash aggregate, a shuffle of ~4 group rows."
    ),
    "tpch_q21_sole_fault_supplier": (
        "both correlated subqueries decorrelated into ONE per-order "
        "distinct-supplier aggregate; lineitem shuffles twice on orderkey "
        "(aggregate + R-row stream) instead of being re-probed per row; "
        "supplier broadcast."
    ),
    "winnow_fingerprints": (
        "MOSS winnowing as JVM window machinery: lead-built shingles, "
        "ROWS-frame min, one hash exchange of 24-byte (doc, pos, hash) "
        "rows — no Python stage anywhere."
    ),
    "kmeans_lloyd_step": (
        "elementwise centroid means as posexplode + map-side-partial "
        "aggregate: the shuffle carries k·d partial sums, never vectors."
    ),
    "tpch_q2_min_cost_supplier": (
        "the correlated scalar-MIN decorrelated: broadcast part filter "
        "below lineitem's one grouping exchange, broadcast dim tree, and "
        "the per-part min as a window over the aggregated relation."
    ),
    "tpch_q11_important_stock": (
        "HAVING vs a scalar subquery without re-scanning: the grand total "
        "is a broadcast one-row aggregate of the per-part relation, applied "
        "as a `BroadcastNestedLoopJoin` filter."
    ),
    "dup_span_coverage": (
        "exact-substring coverage with spans travelling as 16-byte "
        "(hash, doc) rows; the per-hash distinct-doc count and the "
        "occurrence join share the same hash partitioning."
    ),
    "gopher_quality_rules": (
        "rule-based quality gating as a map-only pass: zero exchanges, "
        "documents scan pruned to doc_id+text, every gate a codegen "
        "expression."
    ),
    "skew_key_report": (
        "join-key skew diagnostics from map-side-partial counts — the "
        "shuffle carries (key, partial) pairs, then one row per key space "
        "leaves the second aggregate."
    ),
    "ngram_novelty": (
        "per-doc distinct gram hashes built narrow (`array_distinct` "
        "inside the row, before the explode); one exchange of 16-byte "
        "(hash, doc) pairs feeds both the first-writer window and the "
        "per-doc rollup."
    ),
    "compaction_bin_pack": (
        "the scan collapses to one row per date partition at a map-side "
        "partial; the running-offset window and bin rollup run over the "
        "metadata-sized relation (a deliberate single-partition window)."
    ),
    "ivm_agg_merge": (
        "both maintenance branches prune their scan with the cut "
        "predicate (`PushedFilters` on o_orderdate); the merge shuffle "
        "carries one row per (branch, month) — mergeable partials, no "
        "history rescan."
    ),
    "snapshot_diff": (
        "ONE shuffle for both snapshot epochs: a single hash aggregate "
        "computes `max(struct)` for the full feed and a `when`-guarded "
        "`max(struct)` for the cut epoch side-by-side (both with "
        "map-side partials), so the changelog is scanned once and the "
        "exchange carries unique keys — no window, no self-join of two "
        "snapshot subqueries (that is the oracle's slow form)."
    ),
    "file_skipping_plan": (
        "metadata-scale planning: one map-side-partial min/max/count "
        "collapses the scan to a row per partition; every predicate "
        "verdict evaluates over the |partitions|-row manifest."
    ),
    "bloom_filter_join": (
        "InjectRuntimeFilter at work: `bloom_filter_agg` builds the "
        "filter over the selective side's keys and `might_contain` "
        "probes beneath the fact scan — rows of non-qualifying orders "
        "die before the join exchange."
    ),
    "scd2_temporal_probe_join": (
        "per-row AS-OF temporal join planned as an EQUI hash join on "
        "(entity, uid) with the interval containment as join residual — "
        "never a nested-loop over probes x versions; probes broadcast."
    ),
    "recursive_bfs_hops": (
        "Spark 4 recursive CTE (`UnionLoopExec`): each step an equi-join "
        "of the frontier against the edge list with per-step DISTINCT "
        "bounding rows by NODE count — the form that survives 10x where "
        "the path-materializing variant hit RECURSION_ROW_LIMIT."
    ),
    "concurrency_sweepline": (
        "distributed prefix sum: per-timestamp delta aggregate (map-side "
        "partial), day-partitioned running-sum windows, and a "
        "calendar-sized day-offset broadcast — no data-proportional "
        "relation ever sorts in a single task."
    ),
    "lateral_join_topn": (
        "correlated LATERAL subquery decorrelated to WindowGroupLimit "
        "partial+final around the exchange — per-group top-k at "
        "shuffle-parallel cost, nation dim broadcast."
    ),
    "replay_gap_report": (
        "gaps-and-islands WITHOUT the global row_number sort: island ends "
        "found by a shuffle-parallel left-anti self-join on (type, r+1), "
        "min/max/count as map-side partials."
    ),
}


def main() -> None:
    spark = get_session("plans")
    specs = load_all()
    lines = [
        "# PLANS — physical plans of the flagship shapes",
        "",
        "Generated by `tools/gen_plans_md.py` at sf0.001 (plan shapes are",
        "scale-invariant; AQE may re-plan exchanges at runtime). Each",
        "section states the property the plan must show; the plan-shape",
        "tests (`tests/test_plan_shapes.py`) assert the same properties",
        "mechanically.",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = specs[name].fn(spark, SF)
        lines += [
            f"## `{name}`",
            "",
            f"**Expected shape:** {why}",
            "",
            "```",
            plan_string(df, "formatted").strip(),
            "```",
            "",
        ]
    # protocol / algorithm write-ups that aren't single-query plans
    # live in docs/plans_appendix.md so regeneration never drops them
    import os

    appendix = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "plans_appendix.md",
    )
    if os.path.exists(appendix):
        with open(appendix) as f:
            lines += [f.read().rstrip(), ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans + appendix)")


if __name__ == "__main__":
    main()
