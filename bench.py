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
    from sfdc_cdc_aws_spark.streaming.job import ensure_landing

    ensure_landing(spark, sf_dir)
    specs["cdc_stream_stateful_counts"].fn(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

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
    # compact separators keep the one-line JSON inside the driver's
    # bounded stdout tail (round 1's pretty-printed line overflowed it);
    # 4-decimal timings so sub-10ms queries don't record 0.0
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_queries": len(timings),
                "master": spark.sparkContext.master,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
