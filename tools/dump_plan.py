"""Dump `.explain("formatted")` for registered keys to plans/<dir>/.

    python tools/dump_plan.py --dir=plans/r14 --suffix=after KEY [KEY ...]

Runs under the bench session confs at $SPARK_GRAFT_SF_DIR so the dump
matches what the bench executes (the round-14 before/after plan
artifacts the optimization log cites).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_dir = "plans/r14"
    suffix = "after"
    keys = []
    for a in sys.argv[1:]:
        if a.startswith("--dir="):
            out_dir = a.split("=", 1)[1]
        elif a.startswith("--suffix="):
            suffix = a.split("=", 1)[1]
        else:
            keys.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sfdc_cdc_aws_spark.registry import load_all
    from sfdc_cdc_aws_spark.session import get_session
    from sfdc_cdc_aws_spark.prewarm import prewarm_materializations

    spark = get_session("dump_plan")
    prewarm_materializations(spark, sf_dir)
    specs = load_all()
    os.makedirs(os.path.join(REPO, out_dir), exist_ok=True)
    jvm = spark.sparkContext._jvm
    for key in keys:
        df = specs[key].fn(spark, sf_dir)
        txt = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(REPO, out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} chars)")


if __name__ == "__main__":
    main()
