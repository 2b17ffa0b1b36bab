"""sf1-equivalent TPC-H lane → BENCH_SF1.json (round-5 item 8).

Runs every ``tpch_*`` registered key at sf0.1 and at the 10×-scaled
TPC-H fixture (``tools/gen_scale_fixture.py --tpch --out .scale/sf1``
— lineitem ~6M rows, the sf1 shape) and records the wall ratio per
key.  The claim under test: the PLAN SHAPES hold one more decade up —
every ratio should be ≤~linear (≤ ~10× for scan-bound keys, far less
for aggregate-bound ones whose group cardinality is scale-invariant).

Timing methodology: best-of-2 per key per SF in one warm session,
noop sink (bench.py's execution discipline).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")


def main() -> int:
    from sfdc_cdc_aws_spark.registry import load_all
    from sfdc_cdc_aws_spark.session import get_session

    if not os.path.isdir(SF1):
        print(f"missing {SF1}; run: python tools/gen_scale_fixture.py "
              f"--tpch --k 10 --out .scale/sf1")
        return 2
    spark = get_session("bench_sf1")
    specs = {k: v for k, v in load_all().items() if k.startswith("tpch_")}
    # warmup both fixtures (footer caches, JIT)
    specs["tpch_q1_pricing_summary"].fn(spark, SF01).write.format("noop").mode(
        "overwrite"
    ).save()
    specs["tpch_q1_pricing_summary"].fn(spark, SF1).write.format("noop").mode(
        "overwrite"
    ).save()

    def timed(fn, sf):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    keys = {}
    for name in sorted(specs):
        a = timed(specs[name].fn, SF01)
        b = timed(specs[name].fn, SF1)
        keys[name] = {"sf01_s": a, "sf1_s": b, "ratio": round(b / a, 2)}
        print(f"  {name}: {a}s -> {b}s ({keys[name]['ratio']}x)", flush=True)

    ratios = sorted(v["ratio"] for v in keys.values())
    artifact = {
        "metric": "tpch_sf1_lane",
        "sf01": SF01,
        "sf1": SF1,
        "n_keys": len(keys),
        "data_scale": 10,
        "median_ratio": ratios[len(ratios) // 2],
        "max_ratio": {"key": max(keys, key=lambda k: keys[k]["ratio"]),
                      "ratio": ratios[-1]},
        "superlinear": sorted(k for k, v in keys.items() if v["ratio"] > 10.5),
        "keys": keys,
    }
    with open(os.path.join(REPO, "BENCH_SF1.json"), "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote BENCH_SF1.json: median {artifact['median_ratio']}x, "
          f"max {artifact['max_ratio']}, superlinear={artifact['superlinear']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
