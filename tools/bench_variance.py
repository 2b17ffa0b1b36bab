"""Run-to-run bench noise band → BENCH_VARIANCE.json.

Round-5 verdict item 3: BASELINE.md prose kept drifting from driver
artifacts because single-pass timings carry unquantified noise.  This
tool runs ``bench.py`` N times as FRESH PROCESSES under the DRIVER'S
OWN methodology (bench.py defaults: one warm session, best-of-3 per
key — exactly what produced BENCH_r{N}.json), cold JVM each run, and
aggregates the committed noise band:

    python tools/bench_variance.py [n_runs]   # default 3
    python tools/bench_variance.py --one      # accumulate one run
                                              # (re-aggregates each call)

``--one`` appends to .bench_runs.json so long campaigns can be run
as several short invocations; the artifact is rewritten every call.

Artifact: per-key {min, med, max, spread} plus the run totals.  Any
cross-round comparison whose ratio is inside a key's observed spread
is noise by definition; BASELINE.md's measured sections must cite
this band instead of adjudicating single-pass deltas by eye.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


RUNS_PATH = os.path.join(REPO, ".bench_runs.json")


def _one_run(env, full_path):
    subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        env=env,
        check=True,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    with open(full_path) as f:
        return json.load(f)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)  # bench.py defaults
    full_path = os.path.join(REPO, "BENCH_FULL.json")

    accumulate = len(sys.argv) > 1 and sys.argv[1] == "--one"
    stored = []
    if os.path.exists(RUNS_PATH):
        with open(RUNS_PATH) as f:
            stored = json.load(f)
    if accumulate:
        print("=== bench run (fresh process, driver methodology)", flush=True)
        full = _one_run(env, full_path)
        stored.append({"total": full["value"], "queries": full["queries"]})
        with open(RUNS_PATH, "w") as f:
            json.dump(stored, f)
        print(f"    total {full['value']}s ({len(stored)} runs accumulated)", flush=True)
    else:
        n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
        stored = []
        for i in range(n_runs):
            print(f"=== bench run {i + 1}/{n_runs} (fresh process)", flush=True)
            full = _one_run(env, full_path)
            stored.append({"total": full["value"], "queries": full["queries"]})
            print(f"    total {full['value']}s", flush=True)
        with open(RUNS_PATH, "w") as f:
            json.dump(stored, f)

    runs = [r["queries"] for r in stored]
    totals = [r["total"] for r in stored]
    n_runs = len(stored)
    if n_runs < 2:
        print("fewer than 2 runs accumulated; artifact deferred")
        return 0

    keys = sorted(set().union(*[set(r) for r in runs]))
    per_key = {}
    for k in keys:
        vals = sorted(r[k] for r in runs if k in r)
        per_key[k] = {
            "min": vals[0],
            "med": round(statistics.median(vals), 4),
            "max": vals[-1],
            "spread": round(vals[-1] / vals[0], 3) if vals[0] > 0 else None,
        }
    spreads = sorted(
        (v["spread"], k) for k, v in per_key.items() if v["spread"] is not None
    )
    artifact = {
        "sf_dir": sf_dir,
        "n_runs": n_runs,
        "mode": "fresh process per run, bench.py defaults (best-of-3 per key in one warm session) — the driver's own methodology",
        "totals_sec": totals,
        "total_spread": round(max(totals) / min(totals), 3),
        "p50_key_spread": spreads[len(spreads) // 2][0] if spreads else None,
        "p90_key_spread": spreads[int(len(spreads) * 0.9)][0] if spreads else None,
        "max_key_spread": {"key": spreads[-1][1], "spread": spreads[-1][0]}
        if spreads
        else None,
        "queries": per_key,
    }
    out = os.path.join(REPO, "BENCH_VARIANCE.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(
        f"wrote BENCH_VARIANCE.json: totals {totals}, "
        f"p50 spread {artifact['p50_key_spread']}, "
        f"p90 {artifact['p90_key_spread']}, max {artifact['max_key_spread']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
