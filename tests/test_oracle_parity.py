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


def test_media_decode_empty_doc_parity(spark, tmp_path):
    """Round-6 ADVICE: an EMPTY document (n_chars=0) must not diverge —
    before the greatest(n,1) floor the Spark side emitted a zero-unit
    row while the oracle's generate_series(0,-1) dropped the doc
    entirely.  Fixture covers both media branches (even=wav, odd=ppm)
    at n=0 plus a normal doc."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sfdc_cdc_aws_spark.sources.tables import TABLES, table_path

    src = "/root/testdata/sf0.001"
    fix = str(tmp_path / "sf_empty")
    os.makedirs(fix)
    for t in TABLES:
        if t != "documents":
            os.symlink(table_path(src, t), table_path(fix, t))
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["", "", "xyz"],
            "lang": ["en", "en", "en"],
            "source": ["fixture", "fixture", "fixture"],
            "n_chars": pa.array([0, 0, 3], pa.int64()),
        }
    )
    pq.write_table(tbl, table_path(fix, "documents"))
    spec = SPECS["media_decode_roundtrip"]
    compare(spec.fn(spark, fix), spec.oracle, fix)
