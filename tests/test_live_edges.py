"""Live-edge stubs: the cdc_wire DataSource (replayId offsets) and
the batched mapInPandas lookup client."""

from __future__ import annotations

import pandas as pd
import pytest

from sfdc_cdc_aws_spark.operators.pipeline import enrich_join
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.sources.cdc_feed import changes
from sfdc_cdc_aws_spark.sources.live import (
    HAS_DATASOURCE_API,
    REPLAY_FROM_TIP,
    register_cdc_wire,
    snapshot_fetcher,
    soql_enrich,
)
from sfdc_cdc_aws_spark.streaming.job import ensure_landing, parse_wire

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not HAS_DATASOURCE_API, reason="needs pyspark>=4 DataSource API"
)


def test_cdc_wire_batch_read(spark):
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    df = spark.read.format("cdc_wire").option("path", landing).load()
    n_events = load_table(spark, SF, "events").count()
    assert df.count() == n_events
    # replay ids are the stream offsets: unique and complete
    assert df.select("replay_id").distinct().count() == n_events
    # and the payload parses through the shared wire parser
    parsed = parse_wire(df.drop("replay_id"))
    assert parsed.count() == changes(spark, SF).count()


def test_cdc_wire_stream_earliest(spark, tmp_path):
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    q = (
        spark.readStream.format("cdc_wire")
        .option("path", landing)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == load_table(spark, SF, "events").count()


def test_cdc_wire_stream_from_tip_sees_nothing(spark, tmp_path):
    """REPLAY_FROM_TIP (-1): a new subscription starts at the current
    end of stream (EmpConnector.java:104) — a static landing dir
    yields zero rows."""
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    q = (
        spark.readStream.format("cdc_wire")
        .option("path", landing)
        .option("replay_from", str(REPLAY_FROM_TIP))
        .load()
        .writeStream.format("memory")
        .queryName("tip_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table("tip_test").count() == 0


def test_soql_enrich_matches_join(spark):
    """The mapInPandas batched-lookup client returns exactly what the
    broadcast enrichment join returns (T12 ≡ S6+T14 semantics)."""
    ch = changes(spark, SF).where("change_type <> 'DELETE'")
    snap_pdf: pd.DataFrame = load_table(spark, SF, "customer").toPandas()
    fetch = snapshot_fetcher(snap_pdf, "c_custkey")
    schema = (
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string, record_id string, UIND string"
    )
    got = soql_enrich(ch, fetch, schema, batch_size=50)
    want = enrich_join(spark, SF)
    g = sorted(
        tuple(r) for r in got.select("record_id", "c_custkey", "c_name", "UIND").collect()
    )
    w = sorted(
        tuple(r)
        for r in want.selectExpr(
            "record_id", "c_custkey", "c_name", "uind AS UIND"
        ).collect()
    )
    assert g == w
