"""Driver contract for the spark-graft builder (PySpark target).

Backed by the sfdc_cdc_aws_spark engine: every implemented operator
from SURVEY.md §2 registers a (Spark builder, DuckDB oracle) pair in
``sfdc_cdc_aws_spark.registry``; this module just exposes the
registry in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sfdc_cdc_aws_spark.registry import load_all

FLAGSHIP = "cdc_latest_snapshot"
SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's correctness harness checks the first ~50 entries of
# ``queries()``. To get every registered query a driver row — and then
# keep *re*-verifying the whole surface on a rotation — order the
# registry by when each key last earned a green driver row, derived
# from the committed CORRECTNESS_r0N.json artifacts (no hand-kept
# lists to drift): never-verified keys first, then least-recently-
# verified. Rows-only keys (no oracle SQL by design) count their
# recorded rows-only driver row as verification, so they rotate like
# every other key.
_REPO_DIR = __import__("os").path.dirname(__import__("os").path.abspath(__file__))


def _last_verified_round() -> dict[str, int]:
    import glob
    import json
    import os
    import re

    has_oracle = {
        name: spec.oracle is not None for name, spec in load_all().items()
    }
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(_REPO_DIR, "CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)\.json$", os.path.basename(path))
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("rows_match") and not row.get("err")
            # rows-only keys (no oracle SQL by design) count as
            # verified when the driver recorded their row count —
            # that IS their whole check, so they rotate like the rest
            # instead of camping at the head as "never verified".
            # But if a key HAS an oracle now, only hash-green rows
            # count: a key upgraded from rows-only to oracle-backed
            # re-sorts to the head until its hash is on record.
            rows_only = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and not has_oracle.get(key, False)
            )
            if green or rows_only:
                last[key] = max(last.get(key, 0), rnd)
    return last


def _rotation_order(names: list[str]) -> list[str]:
    last = _last_verified_round()
    return sorted(names, key=lambda n: (last.get(n, -1), n))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is SURVEY.md §2.7's ``cdc_latest_snapshot`` — the
    latest non-deleted record per Id over the CDC change feed, i.e.
    the lake-side table the whole reference pipeline exists to
    produce (README.md:3-5; UIND stamping app.py:102).
    """
    specs = load_all()
    return specs[FLAGSHIP].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    rotation-ordered so every key earns a driver CORRECTNESS row
    across rounds (see _rotation_order)."""
    specs = load_all()
    return {name: specs[name].fn for name in _rotation_order(list(specs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    specs = load_all()
    return {
        name: specs[name].oracle
        for name in _rotation_order(list(specs))
        if specs[name].oracle is not None
    }
