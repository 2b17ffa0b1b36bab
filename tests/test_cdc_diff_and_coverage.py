"""Invariant tests for the round-4 additions beyond the oracle hash:
snapshot_diff's apply-the-diff contract, shard contiguity, entropy /
OOV bounds, and the pruning asymmetry of the zone-map planner.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.cdc_analytics import DIFF_CUT_MS, snapshot_diff
from sfdc_cdc_aws_spark.operators.maintenance import file_skipping_plan
from sfdc_cdc_aws_spark.operators.text import char_entropy, oov_rate
from sfdc_cdc_aws_spark.operators.training import N_SHARDS, global_shuffle_shard
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.sources.cdc_feed import changes

from .conftest import SF_ORACLE, SF_SMOKE


def _live_keys(spark, sf_dir, cut_ms=None):
    """Live (entity, uid) keys of the snapshot at a replay cut."""
    ch = changes(spark, sf_dir)
    if cut_ms is not None:
        ch = ch.where(F.col("commit_ts_ms") < cut_ms)
    last = ch.groupBy("entity_name", "uid").agg(
        F.max(F.struct("commit_ts_ms", "replay_id", "change_type")).alias("b")
    )
    rows = last.where(F.col("b.change_type") != "DELETE").collect()
    return {(r.entity_name, r.uid) for r in rows}


import pytest


@pytest.mark.parametrize(
    "cut_ms",
    [
        1_704_672_000_000,  # 2024-01-08
        DIFF_CUT_MS,        # 2024-01-16 (the registered oracle's cut)
        1_706_054_400_000,  # 2024-01-24
    ],
)
def test_snapshot_diff_applies_a_to_b(spark, cut_ms):
    """THE diff contract at any epoch boundary: live(B) =
    (live(A) - DELETEs) | INSERTs, and UPDATE keys are live on both
    sides."""
    a = _live_keys(spark, SF_ORACLE, cut_ms)
    b = _live_keys(spark, SF_ORACLE)
    diff = snapshot_diff(spark, SF_ORACLE, cut_ms).collect()
    key = lambda r: (r.entity_name, int(r.record_id[3:]))  # noqa: E731
    ins = {key(r) for r in diff if r.diff_type == "INSERT"}
    upd = {key(r) for r in diff if r.diff_type == "UPDATE"}
    dele = {key(r) for r in diff if r.diff_type == "DELETE"}
    assert ins and upd and dele, "degenerate diff fixture"
    assert (a - dele) | ins == b
    assert upd <= (a & b)
    assert not (ins & dele) and not (ins & upd) and not (upd & dele)
    # every UPDATE/DELETE names the old version; INSERT the new one
    for r in diff:
        assert r.new_replay_id is not None
        if r.diff_type in ("UPDATE", "DELETE"):
            assert r.old_replay_id is not None
            assert r.new_replay_id != r.old_replay_id


def test_global_shuffle_shard_contiguous_positions(spark):
    rows = global_shuffle_shard(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard_id < N_SHARDS
        by_shard.setdefault(r.shard_id, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_char_entropy_bounds(spark):
    rows = char_entropy(spark, SF_SMOKE).collect()
    hi = math.log(26) + 1e-6
    assert rows
    for r in rows:
        assert 0.0 <= r.char_entropy <= hi
        if r.n_alpha <= 1:
            assert r.char_entropy == 0.0


def test_oov_rate_bounds_and_token_conservation(spark):
    rows = oov_rate(spark, SF_SMOKE).collect()
    for r in rows:
        assert 0 <= r.n_oov <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    # token totals conserve vs a direct count
    direct = (
        load_table(spark, SF_SMOKE, "documents")
        .select(
            F.size(
                F.filter(
                    F.split(F.lower("text"), r"\W+"), lambda x: x != F.lit("")
                )
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.n_tokens for r in rows) == direct


def test_file_skipping_prunes_by_date_only(spark):
    plan = file_skipping_plan(spark, SF_ORACLE).collect()
    assert plan
    for r in plan:
        # conjunctive must_read never exceeds any single-predicate verdict
        assert r.must_read == (r.read_date and r.read_price and r.read_key)
        assert r.read_date == ("1996-01" <= r.part_key <= "1996-12")
    # the asymmetry the op exists to show: the date dimension prunes
    # (layout-aligned), the uncorrelated dimensions prune ~nothing
    n = len(plan)
    assert sum(r.read_date for r in plan) < n
    assert sum(r.read_price for r in plan) >= n - 1
    assert sum(r.read_key for r in plan) >= n - 1


def test_tombstone_purge_never_touches_live_keys(spark):
    from sfdc_cdc_aws_spark.operators.cdc_analytics import (
        PURGE_BEFORE_MS,
        tombstone_purge_plan,
    )

    purge = tombstone_purge_plan(spark, SF_ORACLE).collect()
    assert purge, "degenerate purge fixture"
    live = _live_keys(spark, SF_ORACLE)
    purged = {(r.entity_name, int(r.record_id[3:])) for r in purge}
    assert not (purged & live)
    for r in purge:
        assert r.deleted_at_ms < PURGE_BEFORE_MS
        assert r.n_lifetime_changes >= 1


def test_media_dedup_groups_are_real_duplicates(spark):
    from sfdc_cdc_aws_spark.operators.multimodal import media_dedup_exact

    groups = media_dedup_exact(spark, SF_ORACLE).collect()
    # every doc_id ≡ 7 (mod 10) re-uploads doc_id-1's bytes, so there
    # is one duplicate group per such pair (unless source texts merge)
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id").collect()
    ids = {r.doc_id for r in docs}
    expected_pairs = sum(1 for i in ids if i % 10 == 7 and i - 1 in ids)
    assert groups and len(groups) <= expected_pairs
    assert sum(g.n_copies - 1 for g in groups) == expected_pairs
    for g in groups:
        assert g.n_copies >= 2
        # keeper is the original upload: consecutive ids never both ≡7
        assert g.keeper_doc_id % 10 != 7
        assert g.n_mimes == 2  # doc_id and doc_id-1 always differ mod 3


def test_rfm_tiles_balanced_and_bounded(spark):
    from sfdc_cdc_aws_spark.operators.events import RFM_TILES, rfm_segmentation

    rows = rfm_segmentation(spark, SF_ORACLE).collect()
    n_purchasers = (
        load_table(spark, SF_ORACLE, "events")
        .where(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .count()
    )
    assert len(rows) == n_purchasers
    for dim in ("r_tile", "f_tile", "m_tile"):
        sizes: dict[int, int] = {}
        for r in rows:
            t = getattr(r, dim)
            assert 1 <= t <= RFM_TILES
            sizes[t] = sizes.get(t, 0) + 1
        assert max(sizes.values()) - min(sizes.values()) <= 1, dim
    assert all(r.segment == f"{r.r_tile}{r.f_tile}{r.m_tile}" for r in rows)


def test_pq_assign_codes_and_error_bounds(spark):
    from sfdc_cdc_aws_spark.operators.similarity import PQ_K, PQ_M, pq_assign

    rows = pq_assign(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        codes = [getattr(r, f"code{m}") for m in range(PQ_M)]
        assert all(0 <= c < PQ_K for c in codes)
        assert r.recon_err >= 0.0


def test_join_estimate_matches_actual_join_size(spark):
    """The predicted cardinality must equal the real join's row count
    — the estimate is exact for equi-joins by construction."""
    from sfdc_cdc_aws_spark.operators.relational3 import (
        join_cardinality_estimate,
    )

    est = join_cardinality_estimate(spark, SF_SMOKE).collect()
    assert est
    predicted = est[0].total_rows
    ev = load_table(spark, SF_SMOKE, "events")
    orders = load_table(spark, SF_SMOKE, "orders")
    actual = ev.join(orders, F.col("user_id") == F.col("o_custkey")).count()
    assert predicted == actual
    assert sum(r.share for r in est) <= 1.0 + 1e-6


def test_triangle_count_matches_direct_enumeration(spark):
    """Per-doc triangle counts must equal a direct Python enumeration
    over the same candidate-pair edge list."""
    import collections
    import itertools

    from sfdc_cdc_aws_spark.operators.dedup import (
        minhash_lsh_dedup,
        triangle_count,
    )

    edges = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_dedup(spark, SF_SMOKE).collect()
    }
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
    want: dict[int, int] = collections.defaultdict(int)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            for d in (a, b, c):
                want[d] += 1
    got = {r.doc_id: r.n_triangles for r in triangle_count(spark, SF_SMOKE).collect()}
    assert got == dict(want)
    assert sum(got.values()) % 3 == 0


def test_quality_ablation_counts_consistent(spark):
    from sfdc_cdc_aws_spark.operators.curation import quality_rule_ablation

    rows = quality_rule_ablation(spark, SF_SMOKE).collect()
    assert {r.rule for r in rows} == {
        "word_count", "mean_word_len", "stopwords",
    }
    n_docs = rows[0].n_docs
    n_fail_any = n_docs - rows[0].n_pass_all
    assert sum(r.n_fail_only for r in rows) <= n_fail_any
    for r in rows:
        assert 0 <= r.n_fail_only <= r.n_fail <= n_fail_any


def test_contrastive_pairs_label_contract(spark):
    from sfdc_cdc_aws_spark.operators.similarity import (
        CONTRA_NEG,
        CONTRA_POS,
        contrastive_pair_mining,
    )

    labels = {
        r.vec_id: r.label
        for r in load_table(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "label")
        .collect()
    }
    rows = contrastive_pair_mining(spark, SF_SMOKE).collect()
    assert rows
    per = {}
    for r in rows:
        assert r.cand_id != r.query_id
        same = labels[r.cand_id] == labels[r.query_id]
        assert (r.role == "pos") == same
        per.setdefault((r.query_id, r.role), []).append(r.rnk)
    for (q, role), rnks in per.items():
        cap = CONTRA_POS if role == "pos" else CONTRA_NEG
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= cap


def test_semantic_prune_never_prunes_pivots(spark):
    from sfdc_cdc_aws_spark.operators.similarity import (
        PRUNE_COS,
        ensure_ivf_index,
        semantic_prune,
    )

    pruned = semantic_prune(spark, SF_SMOKE).collect()
    assert pruned
    idx = ensure_ivf_index(spark, SF_SMOKE).select("cent_id", "vec_id").collect()
    pivot_of = {}
    members = {}
    for r in idx:
        members.setdefault(r.cent_id, set()).add(r.vec_id)
        pivot_of[r.cent_id] = min(pivot_of.get(r.cent_id, r.vec_id), r.vec_id)
    for r in pruned:
        assert r.cos_sim >= PRUNE_COS
        assert r.pivot_id == pivot_of[r.cent_id]
        assert r.vec_id != r.pivot_id
        assert r.vec_id in members[r.cent_id]


def test_time_travel_agrees_with_diff_epoch_a(spark):
    """Cross-operator consistency: the SCD2 time-travel read at the
    diff cut must return exactly snapshot_diff's epoch-A live keys —
    two independent derivations of 'state as of T' from the log."""
    from sfdc_cdc_aws_spark.operators.cdc_analytics import (
        ASOF_TS_MS,
        scd2_time_travel,
    )

    assert ASOF_TS_MS == DIFF_CUT_MS
    asof = {
        (r.entity_name, int(r.record_id[3:]))
        for r in scd2_time_travel(spark, SF_ORACLE).collect()
    }
    assert asof == _live_keys(spark, SF_ORACLE, DIFF_CUT_MS)
