"""Property-based test (SURVEY.md §5 item 4): for ANY sequence of
CREATE/UPDATE/DELETE changes, the engine's latest-per-key reduction
must equal a sequential dictionary replay — the semantics the
reference's downstream consumers assume (latest record per Id,
tombstones excluded; README.md:16-20).

The generator is the seeded, templated-row spirit of the reference's
bulk-load helper (worker/helpers/bulk-load.py:55-65) driven by
Hypothesis instead of hard-coded loops.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

CHANGE_TYPES = ("CREATE", "UPDATE", "DELETE")

# one change: (key, change_type_idx); commit order = list position
changes_strategy = st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(0, 2)),
    min_size=1,
    max_size=60,
)


def replay_dict(seq):
    """The spec: sequential replay, last writer wins, DELETE tombstones
    suppress the key until a later non-DELETE change."""
    state: dict[int, str] = {}
    for pos, (key, ct_idx) in enumerate(seq):
        state[key] = (CHANGE_TYPES[ct_idx], pos)
    return {
        k: (uind, pos)
        for k, (uind, pos) in state.items()
        if uind != "DELETE"
    }


@given(seq=changes_strategy)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_latest_snapshot_equals_sequential_replay(spark, seq):
    rows = [
        (key, CHANGE_TYPES[ct_idx], pos) for pos, (key, ct_idx) in enumerate(seq)
    ]
    df = spark.createDataFrame(rows, "uid int, change_type string, replay_id int")
    got = {
        r["uid"]: (r["uind"], r["replay_id"])
        for r in (
            df.groupBy("uid")
            .agg(
                F.max_by(
                    F.struct("change_type", "replay_id"), F.col("replay_id")
                ).alias("last")
            )
            .select(
                "uid",
                F.col("last.change_type").alias("uind"),
                F.col("last.replay_id").alias("replay_id"),
            )
            .where(F.col("uind") != "DELETE")
            .collect()
        )
    }
    assert got == replay_dict(seq)


# one change: (key, change_type_idx); ts = commit position, so cuts
# land between any two changes. UNDELETE included: liveness must
# treat it as live (SURVEY §7).
DIFF_CHANGE_TYPES = ("CREATE", "UPDATE", "DELETE", "UNDELETE")

diff_strategy = st.tuples(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=7), st.integers(0, 3)),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=41),
)


def _live(seq, upto):
    state = {}
    for pos, (key, ct) in enumerate(seq[:upto]):
        state[key] = (DIFF_CHANGE_TYPES[ct], pos)
    return {k: pos for k, (ct, pos) in state.items() if ct != "DELETE"}


@given(args=diff_strategy)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_snapshot_diff_spec_for_any_sequence_and_cut(spark, args):
    """For ANY change sequence and ANY cut: the diff's INSERT/UPDATE/
    DELETE sets are exactly the set differences of the two sequential
    replays — the spec of snapshot-based replication."""
    from sfdc_cdc_aws_spark.operators.cdc_analytics import diff_changes

    seq, cut = args
    rows = [
        ("e", key, DIFF_CHANGE_TYPES[ct], pos, pos)
        for pos, (key, ct) in enumerate(seq)
    ]
    ch = spark.createDataFrame(
        rows, "entity_name string, uid long, change_type string, "
        "commit_ts_ms long, replay_id long"
    )
    got = diff_changes(ch, cut).collect()
    a, b = _live(seq, cut), _live(seq, len(seq))
    want_ins = {k for k in b if k not in a}
    want_del = {k for k in a if k not in b}
    want_upd = {k for k in b if k in a and a[k] != b[k]}
    ins = {int(r.record_id[3:]) for r in got if r.diff_type == "INSERT"}
    dele = {int(r.record_id[3:]) for r in got if r.diff_type == "DELETE"}
    upd = {int(r.record_id[3:]) for r in got if r.diff_type == "UPDATE"}
    assert ins == want_ins and dele == want_del and upd == want_upd
    for r in got:
        if r.diff_type == "UPDATE":
            assert r.old_replay_id == a[int(r.record_id[3:])]
            assert r.new_replay_id == b[int(r.record_id[3:])]
