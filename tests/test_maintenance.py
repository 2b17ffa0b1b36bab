"""Invariant tests for the round-4 maintenance/curation operators —
properties the oracle hash can't express (conservation, ordering,
bounds), per the no-weak-tests rule in SURVEY.md §5.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.curation import (
    MIX_CAP,
    mixture_reweight,
    ngram_novelty,
)
from sfdc_cdc_aws_spark.operators.maintenance import (
    COMPACT_TARGET_ROWS,
    compaction_bin_pack,
    ivm_agg_merge,
)
from sfdc_cdc_aws_spark.sources import load_table

from .conftest import SF_ORACLE, SF_SMOKE


def test_compaction_conserves_rows_and_orders_bins(spark):
    # sf0.01 (~60k lineitem rows, ~8 bins) so the cross-bin
    # invariants actually bite; sf0.001 fits in a single bin.
    plan = compaction_bin_pack(spark, SF_ORACLE).orderBy("bin_id").collect()
    li_rows = load_table(spark, SF_ORACLE, "lineitem").count()
    assert sum(r.total_rows for r in plan) == li_rows, "rows lost by the plan"
    # Next-fit keeps date ranges contiguous and disjoint across bins.
    for prev, nxt in zip(plan, plan[1:]):
        assert prev.last_part < nxt.first_part
    # Next-fit closes bin i only once the running offset passes
    # (i+1)*target, so each non-final cumulative total crosses it.
    cum = 0
    for i, r in enumerate(plan[:-1]):
        cum += r.total_rows
        assert cum >= (i + 1) * COMPACT_TARGET_ROWS


def test_ivm_merge_equals_direct_rollup(spark):
    merged = ivm_agg_merge(spark, SF_SMOKE)
    direct = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy(
            F.substring(F.col("o_orderdate").cast("string"), 1, 7).alias(
                "order_month"
            )
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("revenue"),
        )
    )
    m = {r.order_month: r for r in merged.collect()}
    d = {r.order_month: r for r in direct.collect()}
    assert set(m) == set(d)
    for k in d:
        assert m[k].n_orders == d[k].n_orders
        assert abs(m[k].revenue - d[k].revenue) < 1e-6 * max(1.0, abs(d[k].revenue))


def test_ngram_novelty_bounds_and_first_doc(spark):
    rows = ngram_novelty(spark, SF_SMOKE).collect()
    assert rows, "empty novelty result"
    for r in rows:
        assert 0.0 <= r.novelty_frac <= 1.0
        assert 0 <= r.n_novel <= r.n_ngrams
    # The lowest doc_id can only ever see itself as first writer.
    first = min(rows, key=lambda r: r.doc_id)
    assert first.novelty_frac == 1.0


def test_mixture_weights_capped_and_shares_sum(spark):
    rows = mixture_reweight(spark, SF_SMOKE).collect()
    assert abs(sum(r.actual_share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert 0 < r.weight <= MIX_CAP
        if r.capped:
            assert r.weight == MIX_CAP


def test_stats_merge_equals_direct_variance(spark):
    """The mergeability contract: yearly variance assembled from
    monthly (n, mean, M2) partials must match a direct single-pass
    var_pop to float precision."""
    import math

    from sfdc_cdc_aws_spark.operators.maintenance import (
        STATS_SCALE,
        incremental_stats_merge,
    )

    merged = {
        r.yr: (r.n, r.mean_scaled, r.var_scaled)
        for r in incremental_stats_merge(spark, SF_ORACLE).collect()
    }
    direct = {
        r.yr: (r.n, r.mean_d, r.var_d)
        for r in (
            load_table(spark, SF_ORACLE, "orders")
            .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
            .agg(
                F.count("*").alias("n"),
                F.avg(F.col("o_totalprice") / STATS_SCALE).alias("mean_d"),
                F.var_pop(F.col("o_totalprice") / STATS_SCALE).alias("var_d"),
            )
            .collect()
        )
    }
    assert merged.keys() == direct.keys()
    for yr in merged:
        nm, mm, vm = merged[yr]
        nd, md, vd = direct[yr]
        assert nm == nd
        assert math.isclose(mm, md, abs_tol=1e-6)
        assert math.isclose(vm, vd, abs_tol=1e-6)
