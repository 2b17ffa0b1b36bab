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


def test_stream_ann_ingest_stateless_and_deterministic(spark):
    """The ANN admission screen must be STATELESS (append mode, no
    state stores — probe selection is a narrow expression, not a
    window/agg) and drain-deterministic across fresh checkpoints."""
    from sfdc_cdc_aws_spark.streaming import job
    from sfdc_cdc_aws_spark.streaming.ingest_ann import stream_ann_ingest

    r1 = sorted(map(tuple, stream_ann_ingest(spark, SF).collect()))
    state = job.LAST_DRAIN_STATE.get("ann_ingest")
    assert state is None or state.get("max_state_rows", 0) == 0, state
    r2 = sorted(map(tuple, stream_ann_ingest(spark, SF).collect()))
    assert r1 == r2
    # screening verdicts are (new, corpus) pairs with admitted cosine
    for new_vec, corpus_vec, cos_sim in r1:
        assert new_vec % 4 == 0 and corpus_vec % 4 != 0
        assert cos_sim >= 0.3
