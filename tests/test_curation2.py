"""Round-9 curation family: structural invariants beyond the oracle
hash (the oracle proves value equality; these pin the semantics the
values must obey)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_funnel_stages_monotonic(spark):
    """Every funnel stage is a subset of the previous one: doc and
    token counts must be non-increasing, stage 0 must equal the raw
    corpus, and at least one stage must actually drop something (a
    funnel that filters nothing verifies nothing)."""
    from sfdc_cdc_aws_spark.operators.curation2 import curation_funnel_report
    from sfdc_cdc_aws_spark.sources import load_table

    from sfdc_cdc_aws_spark.operators.curation2 import FUNNEL_TOKEN_BUDGET

    rows = {
        r.stage: r for r in curation_funnel_report(spark, SF).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3, 4, 5, 6]
    raw = load_table(spark, SF, "documents").count()
    assert rows[0].n_docs == raw
    for s in range(1, 7):
        assert rows[s].n_docs <= rows[s - 1].n_docs, s
        assert rows[s].n_tokens <= rows[s - 1].n_tokens, s
    assert rows[6].n_docs < rows[0].n_docs
    # every stage must actually drop something at this fixture —
    # a stage nothing hits verifies nothing (dsir_select and
    # token_budget were added round 10; the budget must BIND)
    for s in (1, 2, 4, 5, 6):
        assert rows[s].n_docs < rows[s - 1].n_docs, s
    assert 0 < rows[6].n_tokens <= FUNNEL_TOKEN_BUDGET


def test_domain_cap_kept_counts(spark):
    """kept rows per source == min(cap, source size); ranks are a
    permutation of 1..n within each source."""
    from collections import Counter

    from sfdc_cdc_aws_spark.operators.curation2 import (
        DOMAIN_CAP,
        domain_cap_sample,
    )

    rows = domain_cap_sample(spark, SF).collect()
    per_src = Counter(r.source for r in rows)
    kept = Counter(r.source for r in rows if r.kept)
    for src, n in per_src.items():
        assert kept[src] == min(DOMAIN_CAP, n), src
        rks = sorted(r.rk for r in rows if r.source == src)
        assert rks == list(range(1, n + 1)), src


def test_stupid_backoff_levels_account_for_all_trigrams(spark):
    """n_hit3+n_hit2+n_hit1+n_hit0 == n_tri on every holdout doc, and
    backoff must actually fire somewhere (a held-out corpus whose
    every trigram was seen in the seed verifies nothing)."""
    from sfdc_cdc_aws_spark.operators.lm import stupid_backoff_score

    rows = stupid_backoff_score(spark, SF).collect()
    assert rows, "holdout docs with >=3 tokens must exist"
    for r in rows:
        assert r.n_hit3 + r.n_hit2 + r.n_hit1 + r.n_hit0 == r.n_tri, r
        assert r.lm_score < 0  # log-probs of a stochastic model
    assert sum(r.n_hit2 + r.n_hit1 + r.n_hit0 for r in rows) > 0


def test_pca_residual_orthogonality_invariants(spark):
    """var_removed in [0,1]; residual norm never exceeds the vector
    norm (res_norm² = (1-var_removed)·‖x‖²); the dominant direction
    must explain a nonzero fraction somewhere."""
    from sfdc_cdc_aws_spark.operators.linalg import pca_project_residual

    rows = pca_project_residual(spark, SF).collect()
    assert rows
    assert any(r.var_removed > 0 for r in rows)
    for r in rows:
        assert -1e-6 <= r.var_removed <= 1.0 + 1e-6, r
        assert r.res_norm >= 0, r


def test_ccnet_buckets_are_even_terciles_per_lang(spark):
    """Per language: tercile sizes differ by at most one (ntile
    contract), keep == (bucket <= 2), fluent docs rank strictly
    ahead of less-fluent ones (bucket-1 min fluency >= bucket-3 max),
    and seed docs never appear."""
    from sfdc_cdc_aws_spark.operators.lm import (
        SB_SEED_LT,
        SB_SEED_MOD,
        ccnet_perplexity_buckets,
    )

    rows = ccnet_perplexity_buckets(spark, SF).collect()
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        assert r.doc_id % SB_SEED_MOD >= SB_SEED_LT, "seed doc scored"
        assert r.keep == (r.bucket <= 2), r
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = [sum(1 for r in rs if r.bucket == b) for b in (1, 2, 3)]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        head = [r.hit_sum / r.n_bi for r in rs if r.bucket == 1]
        tail = [r.hit_sum / r.n_bi for r in rs if r.bucket == 3]
        if head and tail:
            assert min(head) >= max(tail), lang
