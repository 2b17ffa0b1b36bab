"""Every registered query with an oracle must match it — the same
check the driver runs at sf0.01, executed here at sf0.001 for speed
(set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 to run it full)."""

from __future__ import annotations

import os

import pytest

from sfdc_cdc_aws_spark.registry import load_all
from tests.oracle import compare

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

SPECS = load_all()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, PARITY_SF)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
    else:
        compare(df, spec.oracle, PARITY_SF)
