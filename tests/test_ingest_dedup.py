"""Streaming ingest-dedup: arrival probes against the corpus band
index must be deterministic across drains and independent of how the
file source chops the landing into micro-batches."""

from __future__ import annotations

import os

from sfdc_cdc_aws_spark.streaming.ingest_dedup import (
    ensure_doc_landing,
    stream_minhash_ingest,
)

SF = "/root/testdata/sf0.001"


def test_landing_idempotent(spark):
    a = ensure_doc_landing(spark, SF)
    mtime = os.path.getmtime(os.path.join(a, "_SUCCESS"))
    b = ensure_doc_landing(spark, SF)
    assert a == b
    assert os.path.getmtime(os.path.join(b, "_SUCCESS")) == mtime


def test_two_drains_identical(spark):
    """Fresh checkpoint per drain — the verdict set must not depend
    on drain history or micro-batch boundaries."""
    r1 = sorted(map(tuple, stream_minhash_ingest(spark, SF).collect()))
    r2 = sorted(map(tuple, stream_minhash_ingest(spark, SF).collect()))
    assert r1 == r2
    assert len(r1) > 0
