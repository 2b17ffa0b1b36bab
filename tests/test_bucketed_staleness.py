"""Bucketed-table cache must key on source CONTENT, not just name:
regenerating the source parquet has to re-bucket, not serve the copy
from a previous run that the persistent metastore still remembers."""

from __future__ import annotations

import os
import shutil

from sfdc_cdc_aws_spark.operators.sinks import bucketed_colocated_join

SRC = "/root/testdata/sf0.001"


def _totals(spark, sf_dir):
    return {
        r["c_mktsegment"]: r["n_orders"]
        for r in bucketed_colocated_join(spark, sf_dir).collect()
    }


def test_regenerated_source_rebuckets(spark, tmp_path):
    sf_dir = tmp_path / "sfX"
    sf_dir.mkdir()
    for t in ("orders", "customer"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), sf_dir / f"{t}.parquet")

    before = _totals(spark, str(sf_dir))
    assert sum(before.values()) > 0

    # regenerate the source: drop half the orders (new mtime + size)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{sf_dir}/orders.parquet') "
        f"WHERE o_orderkey % 2 = 0) TO '{sf_dir}/orders.parquet' (FORMAT PARQUET)"
    )
    after = _totals(spark, str(sf_dir))
    assert sum(after.values()) < sum(before.values()), (
        "stale bucketed table served after source regeneration"
    )
