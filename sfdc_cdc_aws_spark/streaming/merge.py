"""Incremental latest-snapshot maintenance (the MERGE INTO analog).

The lake view the reference promises its consumers — "latest full
record per Id" (SURVEY.md §2.7) — maintained incrementally from the
stream instead of recomputed: per micro-batch, reduce the batch to
its latest-per-key rows, merge against the persisted state, and swap.

Delta/Iceberg are not on this classpath (TESTDATA container), so the
merge is emulated with the classic anti-join-free formulation:
``union → max_by per key → atomic directory swap``. With Delta the
``write`` below becomes ``MERGE INTO ... WHEN MATCHED UPDATE``, and
file-level pruning replaces the full-state rewrite; the streaming
side (checkpoint, foreachBatch, per-batch reduction) is unchanged.
Tombstones stay IN the state (a later batch must not resurrect an
older pre-delete row); readers filter ``change_type <> 'DELETE'``
(``current()`` below).

Crash safety: the swap is two renames, which cannot be jointly
atomic on a filesystem, so the protocol uses FIXED names
(``<state>__stage`` / ``<state>__old``) and ``_recover()`` repairs
any interrupted swap before the state is next read: a crash after
``state → old`` but before ``stage → state`` rolls back to ``old``
(the interrupted batch's epoch was never committed to the streaming
checkpoint — foreachBatch commits only after ``upsert`` returns — so
the batch replays and re-merges). Without this, that crash window
silently dropped ALL accumulated state while the checkpoint kept
marking earlier batches done.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEY = ("entity_name", "uid")
_ORDER = ("commit_ts_ms", "replay_id")


def _latest_per_key(df: DataFrame) -> DataFrame:
    payload = [c for c in df.columns if c not in _KEY]
    return (
        df.groupBy(*_KEY)
        .agg(
            F.max_by(F.struct(*payload), F.struct(*_ORDER)).alias("last")
        )
        .select(*_KEY, *[F.col(f"last.{c}").alias(c) for c in payload])
    )


class IncrementalSnapshot:
    """Parquet-backed latest-per-key state with atomic swap updates."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir

    @property
    def _stage(self) -> str:
        return f"{self.state_dir}__stage"

    @property
    def _old(self) -> str:
        return f"{self.state_dir}__old"

    def _valid(self, path: str) -> bool:
        return os.path.exists(os.path.join(path, "_SUCCESS"))

    def _recover(self) -> None:
        """Repair an interrupted swap (idempotent, called before every
        read/exists/upsert). Exactly one of three states is possible:
        swap never started (no-op), crashed mid-swap (state missing,
        old present → roll back), or crashed after the swap before
        cleanup (both present → finish the cleanup)."""
        if not self._valid(self.state_dir) and self._valid(self._old):
            if os.path.exists(self.state_dir):  # a torn, _SUCCESS-less dir
                shutil.rmtree(self.state_dir)
            os.rename(self._old, self.state_dir)
        elif self._valid(self.state_dir) and os.path.exists(self._old):
            shutil.rmtree(self._old)

    def exists(self) -> bool:
        self._recover()
        return self._valid(self.state_dir)

    def read(self) -> DataFrame:
        self._recover()
        return self.spark.read.parquet(self.state_dir)

    def current(self) -> DataFrame:
        """Consumer view: latest non-deleted record per key."""
        return self.read().where(F.col("change_type") != "DELETE")

    def upsert(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        # reduce the incoming batch before touching state: the merge
        # input is (distinct keys in batch), not (rows in batch)
        delta = _latest_per_key(batch_df)
        merged = (
            _latest_per_key(self.read().unionByName(delta)) if self.exists() else delta
        )
        # the state relation is bounded by live-key cardinality, not by
        # stream volume — collapse the post-agg shuffle partitions so
        # each swap writes a few right-sized files instead of
        # shuffle.partitions shards (coalesce is narrow: no extra
        # shuffle). A 100 TB deployment would partition this by entity
        # and date instead; the per-call knob keeps the same shape.
        # mode=overwrite also clears any stage dir a crash left behind.
        merged.coalesce(4).write.mode("overwrite").parquet(self._stage)
        if os.path.exists(self.state_dir):
            os.rename(self.state_dir, self._old)
        os.rename(self._stage, self.state_dir)
        if os.path.exists(self._old):
            shutil.rmtree(self._old)

    def attach(self, change_stream: DataFrame, checkpoint: str):
        """Maintain the snapshot from a streaming change feed."""
        return (
            change_stream.writeStream.foreachBatch(
                lambda df, epoch: self.upsert(df, epoch)
            )
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
