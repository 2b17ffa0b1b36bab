"""Benchmark harness: run every registered query end-to-end at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and print ONE JSON
line with per-query wall seconds.

Execution is forced with the noop sink (full plan runs, nothing
collected to the driver) — the honest analog of writing to a lake.
Each query runs once warm (after a session-wide warmup) — rerun with
SPARK_GRAFT_BENCH_REPEAT>1 for best-of-N.
"""

from __future__ import annotations

import json
import os
import sys
import time

from sfdc_cdc_aws_spark.registry import load_all
from sfdc_cdc_aws_spark.session import get_session

# The engine's headline queries, reported first on the stdout line.
HEADLINE_ORDER = [
    "cdc_latest_snapshot",
    "cdc_stream_pipeline",
    "cdc_incremental_merge",
    "cdc_stream_stateful_counts",
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping",
    "tpch_q5_local_supply",
    "tpch_q9_product_profit",
    "tpch_q18_big_orders",
    "tpch_q21_sole_fault_supplier",
    "exact_dedup_docs",
    "minhash_lsh_dedup",
    "ngram_jaccard_dedup",
    "simhash_dedup",
    "sentence_dedup",
    "dedup_clusters",
    "embedding_neardup",
    "rhp_lsh_neardup",
    "topk_cosine_sim",
    "topk_cosine_numpy",
    "ann_ivf_topk",
    "contamination_check",
    "stream_minhash_ingest",
    "skew_salted_join",
    "bucketed_colocated_join",
    "token_count_bpe",
    "lang_id",
    "quality_score",
    "gopher_quality_rules",
    "bm25_score",
    "tfidf_top_terms",
    "pack_sequences",
    "dup_span_coverage",
    "winnow_fingerprints",
    "agg_suite",
    "window_rank_suite",
    "join_suite",
    "asof_event_order",
    # round-5 showcases
    "scd2_temporal_probe_join",
    "recursive_bfs_hops",
    "concurrency_sweepline",
    "lsh_eval_pr",
    "leakage_safe_split",
    "ivm_join_delta",
    "cdc_stream_sliding",
    "cdc_stream_outer_join",
    "pyds_sink_roundtrip",
    "variant_suite",
    "udtf_chunk_expand",
]

# The driver keeps only the last ~2000 bytes of stdout, so the
# one-line JSON must fit that budget or it records parsed:null
# (rounds 1-3 all overflowed with the full 140+-query map). The
# stdout line therefore carries a char-budgeted headline subset; the
# COMPLETE per-query map goes to BENCH_FULL.json beside this script,
# and every timing is also on stderr. tests/test_bench_contract.py
# pins the budget.
STDOUT_QUERY_BUDGET = 1500  # chars for the "queries" object


def build_stdout_line(
    timings: dict[str, float],
    sf: float,
    total: float,
    master: str,
    prewarm_sec: float = 0.0,
) -> str:
    """The single driver-parseable stdout line: headline queries
    first, then alphabetical fill, truncated to the char budget.
    ``prewarm_sec`` is the UNTIMED ensure_* fixture-materialization
    cost (round-14 verdict item 8: the driver captures it per run so
    the key walls + prewarm accounting stays auditable)."""
    headline: dict[str, float] = {}
    used = 2
    for name in HEADLINE_ORDER + sorted(set(timings) - set(HEADLINE_ORDER)):
        if name not in timings:
            continue
        entry_len = len(json.dumps({name: timings[name]}, separators=(",", ":"))) - 1
        if used + entry_len > STDOUT_QUERY_BUDGET:
            break
        headline[name] = timings[name]
        used += entry_len
    return json.dumps(
        {
            "metric": "total_query_wall_sec",
            "value": total,
            "unit": "sec",
            "queries": headline,
            "sf": sf,
            "n_queries": len(timings),
            "n_reported": len(headline),
            "full": "BENCH_FULL.json",
            "master": master,
            "prewarm_sec": prewarm_sec,
        },
        separators=(",", ":"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # best-of-3 by default: round-2 showed a ~1.2-1.4x unpinned drift
    # band with repeat=1; min-of-N makes unchanged-code timings stable.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_session("bench")

    specs = load_all()
    # warmup, not measured: JIT + parquet footer caches via the batch
    # flagship; the streaming wire feed for $SF (input prep — the
    # stream's source data existing is a precondition, not query
    # work); and one tiny stateful drain at sf0.001 so state-store
    # init + Python worker spawn aren't billed to the first streaming
    # query that happens to run.
    specs["cdc_latest_snapshot"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    specs["cdc_stream_stateful_counts"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()
    # materialize every ensure_* fixture UNTIMED (round-13 verdict item
    # 5: a regenerated source fingerprint otherwise bills index/landing
    # rebuilds to whichever key touches the builder first). The regen
    # cost is recorded as its own artifact field, not inside key walls.
    from sfdc_cdc_aws_spark.prewarm import prewarm_materializations

    t0 = time.perf_counter()
    prewarm = prewarm_materializations(spark, sf_dir)
    prewarm_total = round(time.perf_counter() - t0, 3)
    print(f"  [prewarm] {prewarm_total}s: {prewarm}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in sorted(specs):
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 4)
        print(f"  {name}: {best:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json")
    with open(full_path, "w") as f:
        json.dump(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "master": spark.sparkContext.master,
                "prewarm_sec": prewarm_total,
                "prewarm": prewarm,
            },
            f,
            separators=(",", ":"),
        )
        f.write("\n")

    print(
        build_stdout_line(
            timings, sf, total, spark.sparkContext.master, prewarm_total
        )
    )


if __name__ == "__main__":
    main()
