"""Streaming quality gate: the observe() metrics must account for
every arriving row (n_in = corpus size, n_pass = oracle's pass count,
drops visible), across multiple micro-batches."""

from __future__ import annotations

import duckdb

from sfdc_cdc_aws_spark.streaming import quality_gate as qg

SF = "/root/testdata/sf0.001"


def test_gate_metrics_account_for_every_row(spark):
    out = qg.stream_quality_gate(spark, SF)
    n_pass_rows = sum(r.n_docs for r in out.collect())

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    n_total = con.sql("SELECT count(*) FROM documents").fetchone()[0]

    m = qg.LAST_GATE_METRICS
    assert m["n_in"] == n_total, m
    assert m["n_pass"] == n_pass_rows, m
    assert m["n_dropped"] == n_total - n_pass_rows and m["n_dropped"] > 0, m
    # the landing is 4 files at maxFilesPerTrigger=2 — the drain must
    # actually micro-batch (a single-batch drain would not exercise
    # the cross-batch metric summation)
    assert m["n_batches"] >= 2, m
