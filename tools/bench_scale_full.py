"""Full-registry 10× lane → BENCH_SCALE_FULL.json (round-6 verdict
item 3: ~175 of 210 keys had plan-shape arguments but no MEASURED
scale point).

Runs EVERY registered key at sf0.1 and at the complete 10× fixture
(``tools/gen_scale_fixture.py --tpch --k 10 --out .scale/sf1`` — all
fact tables replicated with consistent key shifts, dims shared), and
records the wall ratio per key.  The claim under test: every plan
shape holds one more decade up — ratios should be ≤~linear (≤ ~10×
for scan-bound keys, far less for aggregate keys whose group
cardinality is scale-invariant; streaming drains are dominated by
start/stop machinery, see STREAM_DRAIN.json).

Superlinear keys (ratio > SUPERLINEAR_BAR) are named in the artifact;
keys whose superlinearity is a property of the FIXTURE, not the plan
(pair-space growth by construction) carry their explanation in
``EXPLAINED_SUPERLINEAR`` — anything else lands in
``superlinear_unexplained``, which tests/test_scale_stress.py pins
empty.

Timing methodology: best-of-2 per key per SF in one warm session,
noop sink (bench.py's execution discipline).  Use ``--keys k1,k2``
to re-run a subset into the existing artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".scale", "sf1")
OUT = os.path.join(REPO, "BENCH_SCALE_FULL.json")

SUPERLINEAR_BAR = 10.5

# fixture-constructed quadratic growth, not plan defects: the 10×
# documents replicas are GRADED NEAR-DUPLICATES of their originals
# (that is the point of the fixture — it must stress the dedup
# family), so every pair-emitting key's true output grows ~K² in the
# near-dup families. The uncapped DuckDB oracles pay the same growth
# (SCALE_STRESS.json proves MATCH at this scale).
EXPLAINED_SUPERLINEAR = {
    "ngram_jaccard_dedup": "pair space grows ~170× by fixture construction "
    "(K near-dup replicas per doc → K² family pairs); oracle pays the same",
    "lsh_eval_pr": "runs BOTH pair pipelines (banded LSH + shingle index) "
    "on the ~170× pair space; composition of explained keys",
    "editdist_verify_neardup": "exact Levenshtein on the ~K²-grown LSH "
    "candidate set; candidate growth is the fixture's, not the plan's. "
    "Since round 9 the verify stage budgets itself at "
    "EDIT_VERIFY_BUDGET=20000 hash-ranked candidates (observed, "
    "oracle-mirrored), so the lane pays ~20k Levenshteins here "
    "instead of the fixture's 171,911",
    "dup_span_coverage": "span overlap over the K²-grown candidate pair "
    "set; same pair-space class",
    "minhash_estimate_accuracy": "signature agreement audited per LSH "
    "candidate pair; same pair-space class",
    "embedding_neardup": "IVF cells hold K× members around identical "
    "centroids by construction → Σ cell² grows ~K²; oracle pays the same",
    "fuzzy_entity_match": "replicas shift c_custkey but keep c_name "
    "verbatim, so every (nation, prefix) block gains K× identical "
    "members → Σ block² grows ~K² and true match output grows ~K²; "
    "oracle pays the same (in production exact dedup upstream removes "
    "verbatim-name replicas before fuzzy matching)",
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default=None,
                    help="comma-separated subset to (re)run")
    args = ap.parse_args()

    from sfdc_cdc_aws_spark.registry import load_all
    from sfdc_cdc_aws_spark.session import get_session
    from sfdc_cdc_aws_spark.streaming.job import ensure_landing

    if not os.path.isdir(SF1):
        print(f"missing {SF1}; run: python tools/gen_scale_fixture.py "
              f"--tpch --k 10 --out .scale/sf1")
        return 2
    spark = get_session("bench_scale_full")
    specs = load_all()
    subset = set(args.keys.split(",")) if args.keys else None

    # warmup both fixtures: footer caches, JIT, streaming landing dirs,
    # one tiny stateful drain so state-store/Python-worker spin-up
    # isn't billed to the first streaming key (bench.py discipline)
    for sf in (SF01, SF1):
        specs["cdc_latest_snapshot"].fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        ensure_landing(spark, sf)
    specs["cdc_stream_stateful_counts"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()

    def timed(fn, sf):
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 4)

    keys = {}
    if subset and os.path.exists(OUT):
        with open(OUT) as f:
            keys = json.load(f)["keys"]
    for name in sorted(specs):
        if subset and name not in subset:
            continue
        a = timed(specs[name].fn, SF01)
        b = timed(specs[name].fn, SF1)
        keys[name] = {"sf01_s": a, "sf1_s": b, "ratio": round(b / a, 2)}
        print(f"  {name}: {a}s -> {b}s ({keys[name]['ratio']}x)", flush=True)

    ratios = sorted(v["ratio"] for v in keys.values())
    superlinear = sorted(
        k for k, v in keys.items() if v["ratio"] > SUPERLINEAR_BAR
    )
    artifact = {
        "metric": "full_registry_scale_lane",
        "sf01": SF01,
        "sf1": SF1,
        "n_keys": len(keys),
        "data_scale": 10,
        "median_ratio": ratios[len(ratios) // 2],
        "p90_ratio": ratios[int(len(ratios) * 0.9)],
        "max_ratio": {"key": max(keys, key=lambda k: keys[k]["ratio"]),
                      "ratio": ratios[-1]},
        "superlinear": superlinear,
        "superlinear_explained": {
            k: EXPLAINED_SUPERLINEAR[k]
            for k in superlinear
            if k in EXPLAINED_SUPERLINEAR
        },
        "superlinear_unexplained": [
            k for k in superlinear if k not in EXPLAINED_SUPERLINEAR
        ],
        "keys": keys,
    }
    with open(OUT, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote BENCH_SCALE_FULL.json: n={artifact['n_keys']}, "
          f"median {artifact['median_ratio']}x, p90 {artifact['p90_ratio']}x, "
          f"max {artifact['max_ratio']}, "
          f"unexplained={artifact['superlinear_unexplained']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
