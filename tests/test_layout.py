"""Z-order layout: the pruning claim, asserted from parquet footers.

A single-column-sorted layout prunes only its sort column; the
Morton/z-order layout clusters BOTH dimensions, so file min/max
stats skip files for predicates on either."""

from __future__ import annotations

import datetime
import glob
import os

import pyarrow.parquet as pq

from sfdc_cdc_aws_spark.operators.layout import (
    BOX_CUST,
    BOX_DAYS,
    Z_FILES,
    ensure_zorder_layout,
)
from sfdc_cdc_aws_spark.sources import load_table

SF = "/root/testdata/sf0.001"
EPOCH = datetime.datetime(1995, 1, 1)


def _day(ts):
    base = EPOCH if isinstance(ts, datetime.datetime) else EPOCH.date()
    return (ts - base).days


def _file_stats(d):
    out = []
    for f in glob.glob(os.path.join(d, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}

        def mm(c):
            s = [md.row_group(g).column(cols[c]).statistics for g in range(md.num_row_groups)]
            return min(x.min for x in s), max(x.max for x in s)

        out.append((mm("o_custkey"), mm("o_orderdate")))
    return out


def _hits_box(stats):
    return sum(
        1
        for (cmin, cmax), (dmin, dmax) in stats
        if not (
            cmax < BOX_CUST[0]
            or cmin > BOX_CUST[1]
            or _day(dmax) < BOX_DAYS[0]
            or _day(dmin) > BOX_DAYS[1]
        )
    )


def _hits_cust(stats):
    return sum(
        1
        for (cmin, cmax), _ in stats
        if not (cmax < BOX_CUST[0] or cmin > BOX_CUST[1])
    )


def test_zorder_prunes_both_dimensions(spark):
    zdir = ensure_zorder_layout(spark, SF)
    ddir = "/tmp/sfdc_zorder_datecmp_test"
    (
        load_table(spark, SF, "orders")
        .repartitionByRange(Z_FILES, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(ddir)
    )
    z, dt = _file_stats(zdir), _file_stats(ddir)
    # the non-sort dimension: date-sorted files ALL overlap any custkey
    # range; the z-order layout skips the majority
    assert _hits_cust(dt) == len(dt)
    assert _hits_cust(z) < len(z) // 2
    # the 2-D box: z-order never reads more files than the single-sort
    assert _hits_box(z) <= _hits_box(dt)
    assert _hits_box(z) < len(z) // 2


def test_range_sorted_layout_skips_out_of_window_files(spark):
    """The shipdate-sorted lineitem copy: files are disjoint
    contiguous date runs, so the quarter predicate overlaps only a
    small fraction of files (footer min/max check — the same stats
    the reader's file skipping uses)."""
    from sfdc_cdc_aws_spark.operators.layout import (
        SHIP_LO,
        SHIP_HI,
        ensure_range_sorted_layout,
    )

    d = ensure_range_sorted_layout(spark, SF)
    lo = datetime.datetime.fromisoformat(SHIP_LO)
    hi = datetime.datetime.fromisoformat(SHIP_HI)
    n_files, n_hit = 0, 0
    for f in glob.glob(os.path.join(d, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        if md.num_rows == 0:
            continue
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats = [
            md.row_group(g).column(cols["l_shipdate"]).statistics
            for g in range(md.num_row_groups)
        ]
        fmin = min(s.min for s in stats)
        fmax = max(s.max for s in stats)
        n_files += 1
        if not (fmax < lo or fmin >= hi):
            n_hit += 1
    assert n_files >= 16, f"expected a multi-file layout, got {n_files}"
    # a 3-month window over a ~7-year span should hit only a few runs
    assert n_hit <= max(2, n_files // 4), (
        f"{n_hit}/{n_files} files overlap the window — files are not "
        "contiguous date runs"
    )
