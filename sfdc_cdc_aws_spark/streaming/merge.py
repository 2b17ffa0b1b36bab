"""Incremental latest-snapshot maintenance (the MERGE INTO analog).

The lake view the reference promises its consumers — "latest full
record per Id" (SURVEY.md §2.7) — maintained incrementally from the
stream instead of recomputed: per micro-batch, reduce the batch to
its latest-per-key rows, merge against the persisted state, and
publish. Tombstones stay IN the state (a later batch must not
resurrect an older pre-delete row); readers filter
``change_type <> 'DELETE'`` (``current()`` below).

Commit protocol: WRITE-AUDIT-PUBLISH over a version manifest — the
same discipline Delta/Iceberg implement with their transaction logs,
reduced to its essentials for a plain-parquet state dir:

- WRITE: each upsert stages the merged state into a fresh, numbered
  epoch directory (``epoch_NNNNNN``). Staged data is INVISIBLE — no
  reader resolves it, no matter how many files have landed — so a
  crash at any point mid-write (including between partition files)
  leaves only ignorable garbage that the next attempt's
  ``mode=overwrite`` clears.
- AUDIT: before publishing, the staged epoch is read back and checked
  against the state invariants (Spark's ``_SUCCESS`` commit marker
  present; key uniqueness — this IS a latest-per-key relation). A
  failed audit raises and never publishes: bad data cannot become
  current.
- PUBLISH: the ``MANIFEST`` file (JSON: epoch number + audited row
  count) is written to a temp name, fsync'd, and ``os.replace``d into
  place — a single atomic rename, the only mutation readers can ever
  observe. The directory fd is fsync'd after the rename so the
  publish survives power loss, not just process death.

Readers PIN the manifest: ``read()`` resolves MANIFEST once and scans
exactly that epoch directory. There is no repair-on-read, no window
where the state path doesn't exist (the fault of the previous
rename-dance protocol this replaces), and a reader concurrent with a
crashed writer sees the old epoch or — after a successful publish —
the new one, never a mix. The previous epoch is retained
(``keep_epochs``) so the published history supports point-in-time
reads (``read_epoch``/``epochs``) — the commit-protocol backbone
under the ``snapshot_diff``/``scd2_time_travel`` family.

Exactly-once composition: ``foreachBatch`` commits the streaming
checkpoint only after ``upsert`` returns, so any crash before PUBLISH
leaves the manifest on the prior epoch and the batch replays —
re-merging is idempotent (``_latest_per_key`` is a max, and replayed
rows lose to themselves).

With Delta/Iceberg on the classpath this class collapses to
``MERGE INTO ... WHEN MATCHED UPDATE`` and file-level pruning
replaces the full-state rewrite; the streaming side (checkpoint,
foreachBatch, per-batch reduction) is unchanged.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_KEY = ("entity_name", "uid")
_ORDER = ("commit_ts_ms", "replay_id")

MANIFEST_NAME = "MANIFEST"


def _latest_per_key(df: DataFrame) -> DataFrame:
    payload = [c for c in df.columns if c not in _KEY]
    return (
        df.groupBy(*_KEY)
        .agg(
            F.max_by(F.struct(*payload), F.struct(*_ORDER)).alias("last")
        )
        .select(*_KEY, *[F.col(f"last.{c}").alias(c) for c in payload])
    )


class AuditError(RuntimeError):
    """Staged epoch violated a state invariant; nothing was published."""


class IncrementalSnapshot:
    """Parquet-backed latest-per-key state with manifest-pinned
    write-audit-publish commits (see module docstring)."""

    def __init__(self, spark: SparkSession, state_dir: str, keep_epochs: int = 2):
        self.spark = spark
        self.state_dir = state_dir
        self.keep_epochs = max(1, keep_epochs)

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.state_dir, MANIFEST_NAME)

    def _read_manifest(self) -> dict | None:
        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return None

    def _epoch_dir(self, n: int) -> str:
        return os.path.join(self.state_dir, f"epoch_{n:06d}")

    # -- read side (pure: no repair, no mutation) --------------------------

    def exists(self) -> bool:
        return self._read_manifest() is not None

    def epochs(self) -> list[int]:
        """Published epoch numbers still on disk (ascending); the last
        is current, earlier ones serve point-in-time reads."""
        m = self._read_manifest()
        if m is None:
            return []
        out = []
        for name in sorted(os.listdir(self.state_dir)):
            if name.startswith("epoch_"):
                n = int(name.split("_", 1)[1])
                if n <= m["epoch"]:
                    out.append(n)
        return out

    def read(self) -> DataFrame:
        m = self._read_manifest()
        if m is None:
            raise FileNotFoundError(f"no published state at {self.state_dir}")
        return self.spark.read.parquet(self._epoch_dir(m["epoch"]))

    def read_epoch(self, n: int) -> DataFrame:
        """Point-in-time read of a retained published epoch."""
        if n not in self.epochs():
            raise FileNotFoundError(
                f"epoch {n} not retained (have {self.epochs()})"
            )
        return self.spark.read.parquet(self._epoch_dir(n))

    def current(self) -> DataFrame:
        """Consumer view: latest non-deleted record per key."""
        return self.read().where(F.col("change_type") != "DELETE")

    # -- write side --------------------------------------------------------

    def _audit(self, staged: str) -> dict:
        """Read the staged epoch back and enforce the state invariants.
        Raises AuditError (nothing published) on violation."""
        if not os.path.exists(os.path.join(staged, "_SUCCESS")):
            raise AuditError(f"staged epoch {staged} has no _SUCCESS marker")
        df = self.spark.read.parquet(staged)
        n = df.count()
        n_keys = df.select(*_KEY).distinct().count()
        if n != n_keys:
            raise AuditError(
                f"staged epoch {staged} breaks latest-per-key: "
                f"{n} rows over {n_keys} distinct keys"
            )
        return {"rows": n}

    @staticmethod
    def _fsync_dir_files(staged: str) -> None:
        """fsync every staged data file + the epoch dir: the manifest
        fsync alone is not durability — a power loss after a durable
        MANIFEST but before the kernel flushes the parquet pages would
        pin a torn epoch forever. (On HDFS/S3 the store's close/commit
        semantics replace this; the local-FS path must do it itself.)"""
        for root, _dirs, files in os.walk(staged):
            for f in files:
                fd = os.open(os.path.join(root, f), os.O_RDONLY)
                try:
                    os.fsync(fd)
                finally:
                    os.close(fd)
        dfd = os.open(staged, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _publish(self, epoch: int, audit: dict) -> None:
        """Atomically flip MANIFEST to the audited epoch (fsync'd temp
        file + os.replace; directory fsync for rename durability)."""
        tmp = self._manifest_path + ".tmp"
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
        try:
            os.write(fd, json.dumps({"epoch": epoch, **audit}).encode())
            os.fsync(fd)
        finally:
            os.close(fd)
        os.replace(tmp, self._manifest_path)
        dfd = os.open(self.state_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    def _gc(self, current: int) -> None:
        """Drop epochs older than the retention window. Best-effort: a
        crash here just leaves an extra old epoch for the next GC."""
        for n in self.epochs():
            if n <= current - self.keep_epochs:
                shutil.rmtree(self._epoch_dir(n), ignore_errors=True)

    def upsert(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        # reduce the incoming batch before touching state: the merge
        # input is (distinct keys in batch), not (rows in batch)
        delta = _latest_per_key(batch_df)
        manifest = self._read_manifest()
        if manifest is None:
            merged, next_epoch = delta, 0
        else:
            # ADDITIVE-ONLY schema evolution: a feed that grows a
            # column mid-stream (the CDC reality — new entity fields
            # appear whenever the source object changes) merges with
            # the old state's missing side nulled, and the state
            # schema widens at the next publish. A delta that DROPS a
            # column the state carries is rejected before any write:
            # allowMissingColumns would quietly null the evolved
            # column on every refreshed key (newer rows win the
            # max_by), which is a silent data regression, not
            # evolution. Retyping still fails in unionByName itself.
            state = self.read()
            dropped = set(state.columns) - set(delta.columns)
            if dropped:
                raise AuditError(
                    f"delta drops state columns {sorted(dropped)}; "
                    "schema evolution is additive-only"
                )
            merged = _latest_per_key(
                state.unionByName(delta, allowMissingColumns=True)
            )
            next_epoch = manifest["epoch"] + 1
        os.makedirs(self.state_dir, exist_ok=True)
        staged = self._epoch_dir(next_epoch)
        # WRITE. The state relation is bounded by live-key cardinality,
        # not stream volume — collapse the post-agg shuffle partitions
        # so each epoch is a few right-sized files (coalesce is narrow:
        # no extra shuffle). A 100 TB deployment partitions this by
        # entity and date instead; the shape is the same.
        # mode=overwrite clears any torn stage a crash left behind at
        # this epoch number (it was never published, so it is garbage).
        merged.coalesce(4).write.mode("overwrite").parquet(staged)
        self._fsync_dir_files(staged)  # data durable BEFORE the manifest
        audit = self._audit(staged)  # AUDIT: raises → nothing published
        self._publish(next_epoch, audit)  # PUBLISH: the one atomic flip
        self._gc(next_epoch)

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
