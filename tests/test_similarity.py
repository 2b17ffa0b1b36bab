"""Quality bounds for the APPROXIMATE similarity/dedup operators.

Oracle parity proves each approximate operator computes its own
definition exactly; these tests prove the approximations are WORTH
running — recall against the exact answer is bounded below, so a
tuning change that silently destroys recall fails CI even though the
operator still matches its oracle.
"""

from __future__ import annotations

import pytest

from sfdc_cdc_aws_spark.registry import load_all

SF = "/root/testdata/sf0.01"

SPECS = load_all()


@pytest.fixture(scope="module")
def exact_topk(spark):
    df = SPECS["topk_cosine_sim"].fn(spark, SF)
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_topk_recall(spark, exact_topk):
    """IVF with nprobe=2 of 16 cells must find a solid majority of the
    true top-k (random embeddings are the adversarial case for IVF —
    real clustered data does better)."""
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SPECS["ann_ivf_topk"].fn(spark, SF).collect()
    }
    recall = len(got & exact_topk) / len(exact_topk)
    assert recall >= 0.35, f"IVF recall collapsed: {recall:.2f}"


def test_numpy_topk_is_exact(spark, exact_topk):
    """The BLAS path is exact brute force — identical pair set to the
    HOF-fold implementation, not just oracle-identical."""
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in SPECS["topk_cosine_numpy"].fn(spark, SF).collect()
    }
    assert got == exact_topk


def test_rhp_lsh_finds_top_cosine_pairs(spark):
    """RHP-LSH near-dup candidates must recover most of the highest-
    cosine pairs found by IVF-cell blocking (the two blockers are
    independent, so agreement on the top pairs is a real signal)."""
    ivf = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in SPECS["embedding_neardup"].fn(spark, SF).collect()
    }
    rhp = {
        (r["vec_a"], r["vec_b"])
        for r in SPECS["rhp_lsh_neardup"].fn(spark, SF).collect()
    }
    top_ivf = {p for p, c in ivf.items() if c >= 0.35}
    if not top_ivf:
        pytest.skip("no strong pairs at this SF")
    recall = len(rhp & top_ivf) / len(top_ivf)
    assert recall >= 0.5, f"RHP-LSH missed too many strong pairs: {recall:.2f}"
