"""Per-artifact cache-rev constants (round-13 verdict item 6): each
ensure_* family must key its fixture cache by ITS OWN rev constant, so
bumping one family's rev invalidates exactly that family's caches and
leaves the siblings' intact — the failure mode being pinned is a
signature/election change that bumps a SHARED constant (or forgets to
bump anything) and silently serves a stale sibling cache.
"""

from __future__ import annotations

import pytest

from sfdc_cdc_aws_spark.streaming import ingest_dedup as mod

SRC = "/root/testdata/sf0.001"

#: (rev constant, builder) — every ensure_* in ingest_dedup that keys
#: a fixture dir by a rev constant
FAMILIES = [
    ("_BAND_INDEX_REV", mod.ensure_band_index),
    ("_DOC_LANDING_REV", mod.ensure_doc_landing),
    ("_BAND_DELTA_REV", mod.ensure_band_delta),
    ("_CC_STATE_REV", mod.ensure_cc_state),
    ("_KEEP_BEST_REV", mod.ensure_keep_best_state),
    ("_ADMIT_REV", mod.ensure_admit_landing),
]


@pytest.mark.parametrize("rev_name,builder", FAMILIES, ids=[f[0] for f in FAMILIES])
def test_rev_bump_invalidates_exactly_its_own_family(
    spark, monkeypatch, rev_name, builder
):
    baseline = {rn: b(spark, SRC) for rn, b in FAMILIES}
    monkeypatch.setattr(mod, rev_name, "vtest")
    bumped = builder(spark, SRC)
    assert "vtest" in bumped, (
        f"{builder.__name__} does not key its cache by {rev_name}"
    )
    for other_rev, other_builder in FAMILIES:
        if other_rev == rev_name:
            continue
        unchanged = other_builder(spark, SRC)
        assert unchanged == baseline[other_rev], (
            f"bumping {rev_name} moved {other_builder.__name__}'s cache "
            f"— the families share a rev constant"
        )
