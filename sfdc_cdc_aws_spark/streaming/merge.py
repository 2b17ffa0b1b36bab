"""Incremental latest-snapshot maintenance (the MERGE INTO analog).

The lake view the reference promises its consumers — "latest full
record per Id" (SURVEY.md §2.7) — maintained incrementally from the
stream instead of recomputed: per micro-batch, reduce the batch to
its latest-per-key rows, merge against the persisted state, and
publish. Tombstones stay IN the state (a later batch must not
resurrect an older pre-delete row); readers filter
``change_type <> 'DELETE'`` (``current()`` below).

Commit protocol: WRITE-AUDIT-PUBLISH with OPTIMISTIC CONCURRENCY —
the discipline Delta/Iceberg implement with their transaction logs
(put-if-absent on the next log entry), reduced to its essentials for
a plain-parquet state dir:

- WRITE: each attempt pins the manifest it read (its BASE epoch) and
  stages the merged state into a fresh UNIQUELY-NAMED stage directory
  (``stage_<token>``). Staged data is INVISIBLE — no reader resolves
  it, no matter how many files have landed — so a crash at any point
  mid-write leaves only ignorable garbage; concurrent writers can
  never clobber each other's stage.
- AUDIT: before publishing, the staged epoch is read back and checked
  against the state invariants (Spark's ``_SUCCESS`` commit marker
  present; key uniqueness — this IS a latest-per-key relation). A
  failed audit raises and never publishes: bad data cannot become
  current.
- COMMIT (validate-and-swap): the winner for epoch N is elected by
  ``os.rename(stage_dir, epoch_NNNNNN)`` — atomic put-if-absent on a
  POSIX directory entry (rename onto an existing non-empty dir fails
  with ENOTEMPTY). A writer whose base manifest went stale loses the
  rename, raises :class:`CommitConflict`, discards its stage, and
  RETRIES the whole merge against the new current epoch — the
  lost-update anomaly is structurally impossible, no writer lock
  held during the (long) write phase.
- PUBLISH: the ``MANIFEST`` file (JSON: epoch number + audited row
  count) is written to a temp name, fsync'd, and ``os.replace``d into
  place under a short ``flock`` critical section with a MONOTONIC
  guard (never move the pointer backwards) — so two racing publishers
  cannot regress a reader's view. The directory fd is fsync'd after
  the rename so the publish survives power loss. A winner that
  crashes between COMMIT and PUBLISH leaves a fully-durable epoch dir
  one ahead of the manifest; the next writer's conflict handler
  detects it (``_SUCCESS`` present, epoch == manifest+1), re-audits,
  rolls the manifest forward, and retries its own merge on top —
  crash recovery is just another conflict.

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
import uuid
from contextlib import contextmanager

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


class CommitConflict(RuntimeError):
    """Another writer committed the epoch this attempt raced for; the
    attempt's stage was discarded and the caller should retry against
    the new current state."""


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
        row = df.agg(
            F.count("*").alias("n"),
            F.count_distinct(*[F.col(c) for c in _KEY]).alias("k"),
        ).collect()[0]  # ONE audit job, not a count + a distinct-count
        n, n_keys = row["n"], row["k"]
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
        file + os.replace; directory fsync for rename durability).
        Guarded by a short ``flock`` critical section with a MONOTONIC
        check: two racing publishers (a slow winner and a conflict
        handler helping it forward, or two helpers) can never move the
        pointer backwards, so reads never regress."""
        with self._state_lock():
            current = self._read_manifest()
            if current is not None and current["epoch"] >= epoch:
                return  # an equal-or-newer publish already landed
            tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex[:8]}"
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

    @contextmanager
    def _state_lock(self):
        """Short exclusive critical section over the state dir (flock:
        released by the kernel on crash — no stale-lock recovery
        needed). Held only around metadata mutations (rename, manifest
        flip, torn-slot sweep), NEVER around data writes — writers
        spend the long write/audit phase lock-free; that is what makes
        the concurrency optimistic."""
        import fcntl

        fd = os.open(
            os.path.join(self.state_dir, ".manifest.lock"),
            os.O_WRONLY | os.O_CREAT,
            0o644,
        )
        try:
            fcntl.flock(fd, fcntl.LOCK_EX)
            yield
        finally:
            os.close(fd)

    def _commit(self, staged: str, next_epoch: int) -> None:
        """Validate-and-swap: atomically claim ``epoch_<next>`` by
        renaming the stage dir onto it. POSIX rename onto an existing
        non-empty directory fails (ENOTEMPTY/EEXIST) — exactly the
        put-if-absent Delta's log commit needs — so of N racing
        writers exactly one wins the epoch; losers raise
        :class:`CommitConflict` with their stage already discarded.
        The lock only serializes this rename against the recovery
        sweep; contending committers are decided by the rename itself."""
        try:
            with self._state_lock():
                os.rename(staged, self._epoch_dir(next_epoch))
        except OSError:
            shutil.rmtree(staged, ignore_errors=True)
            raise CommitConflict(
                f"epoch {next_epoch} was committed by a concurrent writer"
            ) from None

    def _recover_orphan_epoch(self) -> None:
        """Post-conflict repair, two cases on the slot manifest+1:

        - complete epoch dir (``_SUCCESS`` present): a winner crashed
          between COMMIT and PUBLISH — re-audit and roll the manifest
          forward (help must not publish what the dead writer
          wouldn't have; the monotonic publish makes double-help a
          no-op).
        - torn dir without ``_SUCCESS`` (external tampering / legacy
          protocol remains — a v2 crash cannot produce this): it was
          never published and never can be; swept aside under the
          lock so no concurrent committer's rename can interleave
          with the check."""
        m = self._read_manifest()
        nxt = 0 if m is None else m["epoch"] + 1
        orphan = self._epoch_dir(nxt)
        with self._state_lock():
            has_success = os.path.exists(os.path.join(orphan, "_SUCCESS"))
            if not has_success and os.path.isdir(orphan):
                torn = f"{orphan}.torn.{uuid.uuid4().hex[:8]}"
                os.rename(orphan, torn)
            else:
                torn = None
        if torn is not None:
            shutil.rmtree(torn, ignore_errors=True)
        elif has_success:
            audit = self._audit(orphan)
            self._publish(nxt, audit)

    def _gc(self, current: int) -> None:
        """Drop epochs older than the retention window. Best-effort: a
        crash here just leaves an extra old epoch for the next GC.
        Retention is also the laggard-tolerance knob: a writer that
        falls more than ``keep_epochs`` commits behind mid-write loses
        its base scan and retries via CommitConflict (see _attempt) —
        size ``keep_epochs`` to writer concurrency to keep that rare."""
        for n in self.epochs():
            if n <= current - self.keep_epochs:
                shutil.rmtree(self._epoch_dir(n), ignore_errors=True)

    # Every conflict means ANOTHER writer advanced the log, so the
    # SYSTEM always makes progress; the budget only bounds one
    # writer's patience under sustained contention. 4 writers racing
    # 3 commits each can cost a single writer >5 losses (observed in
    # test_occ_threaded_writer_storm), hence the generous budget plus
    # a short jittered backoff to break retry lockstep.
    MAX_COMMIT_ATTEMPTS = 25

    def upsert(self, batch_df: DataFrame, epoch_id: int = 0) -> None:
        """Merge a batch into the state with optimistic concurrency:
        each attempt pins the manifest it read, stages + audits, then
        validate-and-swaps the epoch; a lost race re-merges against
        the winner's state and tries again (bounded attempts)."""
        import random
        import time

        # reduce the incoming batch before touching state: the merge
        # input is (distinct keys in batch), not (rows in batch)
        delta = _latest_per_key(batch_df)
        last_err: CommitConflict | None = None
        for attempt in range(self.MAX_COMMIT_ATTEMPTS):
            try:
                return self._attempt(delta)
            except CommitConflict as e:
                last_err = e
                self._recover_orphan_epoch()  # crash-between-commit-and-publish
                time.sleep(random.uniform(0, 0.05) * min(attempt, 4))
        raise last_err  # contended beyond the retry budget

    def _attempt(self, delta: DataFrame) -> None:
        manifest = self._read_manifest()  # the pinned BASE epoch
        if manifest is None:
            merged, next_epoch, base_dir = delta, 0, None
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
            # Scan the PINNED epoch dir directly (not read(), which
            # would re-resolve the manifest and could silently pin a
            # newer epoch than next_epoch assumes).
            base_dir = self._epoch_dir(manifest["epoch"])
            state = self.spark.read.parquet(base_dir)
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
        # WRITE into a unique stage (concurrent writers cannot collide;
        # a crash leaves only invisible stage garbage, never a torn
        # epoch dir). The state relation is bounded by live-key
        # cardinality, not stream volume — collapse the post-agg
        # shuffle partitions so each epoch is a few right-sized files
        # (coalesce is narrow: no extra shuffle). A 100 TB deployment
        # partitions this by entity and date instead; the shape is the
        # same.
        staged = os.path.join(self.state_dir, f"stage_{uuid.uuid4().hex[:12]}")
        try:
            merged.coalesce(4).write.mode("overwrite").parquet(staged)
            self._fsync_dir_files(staged)  # data durable BEFORE commit
            audit = self._audit(staged)  # AUDIT: raises → nothing published
        except Exception as e:
            shutil.rmtree(staged, ignore_errors=True)
            # A laggard whose base epoch was GC'd by a faster writer
            # (commits >= keep_epochs ahead during this attempt's long
            # write phase) sees its lazy scan fail mid-stage. That is a
            # CONCURRENCY outcome, not a data error: surface it as
            # CommitConflict so upsert's retry loop re-reads the
            # manifest and re-merges against the survivor epoch.
            if base_dir is not None and not os.path.isdir(base_dir):
                raise CommitConflict(
                    f"base epoch {manifest['epoch']} was garbage-collected "
                    "by a concurrent writer during the write phase"
                ) from e
            raise
        self._commit(staged, next_epoch)  # COMMIT: the atomic CAS
        self._publish(next_epoch, audit)  # PUBLISH: flip the manifest
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
