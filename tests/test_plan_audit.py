"""The engine-wide plan audit (tools/plan_audit.py): the committed
artifact must be violation-free with a non-stale allowlist, and the
audit machinery itself stays live on a known-shape subset so a
refactor can't silently break the walker."""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_committed_audit_is_clean():
    with open(os.path.join(REPO, "PLAN_AUDIT.json")) as f:
        rep = json.load(f)
    assert rep["violations"] == []
    assert rep["stale_allowlist"] == []
    # the sweep actually covered the registry (materialized streaming
    # keys included as entries)
    assert len(rep["keys"]) >= 190


def test_audit_walker_detects_known_shapes(spark):
    from sfdc_cdc_aws_spark.registry import load_all
    from tools.plan_audit import SF, audit_one

    specs = load_all()
    # a deliberate global window on a bounded relation
    assert audit_one(specs["bpe_merge_step"].fn(spark, SF))["global_window"] >= 1
    # a deliberate bounded-build BNLJ
    assert audit_one(specs["quantile_bucketize"].fn(spark, SF))["bnlj"] >= 1
    # and a clean shape shows neither
    clean = audit_one(specs["cdc_latest_snapshot"].fn(spark, SF))
    assert clean["global_window"] == 0
    assert clean["bnlj"] == 0
    assert clean["cartesian"] == 0
