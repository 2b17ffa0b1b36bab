"""Live-edge connectors, re-expressed for Spark.

Two pieces of the reference are *edges* rather than queries:

* the Bayeux/CometD subscription with replay offsets
  (EmpConnector.java:187-203, ReplayExtension.java:39-82) →
  :class:`CDCWireDataSource`, a Python DataSource-API streaming
  source whose offset IS the replayId, honoring the reference's
  REPLAY_FROM_EARLIEST=-2 / REPLAY_FROM_TIP=-1 constants
  (EmpConnector.java:103-104);
* the batched SOQL enrichment loop (app.py:75-113: BATCH_SIZE chunks,
  INTERVAL sleep) → :func:`soql_enrich`, an Arrow-batched
  ``mapInPandas`` client that chunks ids per partition and calls a
  pluggable fetch function — the real REST client in production, a
  deterministic snapshot-backed fake in tests.

Neither touches the network here; the seams where a live deployment
plugs in credentials/endpoints are the ``fetch_fn`` callable and the
landing-dir path option.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

REPLAY_FROM_EARLIEST = -2  # EmpConnector.java:103
REPLAY_FROM_TIP = -1  # EmpConnector.java:104


class AuthError(RuntimeError):
    """Authentication failed and re-authentication did not recover it
    (the terminal branch of EmpConnector's 401/403 handling)."""


# The reauth seam (EmpConnector.java:322-346: 401/403 listeners force
# reauthenticate + resubscribe; BearerTokenProvider.java:14-40): a
# *token provider* is registered by name and referenced from the
# source's string-only option map — the same indirection a real
# deployment uses (credentials config, not credentials in the plan).
# ``provider()`` returns a fresh token; ``validator(token)`` says
# whether it is still accepted (a prod impl checks expiry / probes the
# endpoint; tests flip it to simulate mid-stream 401s).
_TOKEN_PROVIDERS: dict[str, tuple[Callable[[], str], Callable[[str], bool]]] = {}


def register_token_provider(
    name: str,
    provider: Callable[[], str],
    validator: Callable[[str], bool] | None = None,
) -> None:
    """Register at *module import time* (e.g. in a module shipped via
    ``spark.submit.pyFiles`` and imported from a startup hook): Python
    data-source readers are constructed in a separate worker process,
    so the registry must be populated by imports that run there too —
    the same reason the option map carries the provider's *name*."""
    _TOKEN_PROVIDERS[name] = (provider, validator or (lambda _t: True))


def _scan_file(
    fpath: str, corrupt_policy: str = "fail"
) -> list[tuple[int, str, str]]:
    """Wire records of ONE landing file → sorted
    [(replay_id, partitionKey, data)] — the per-task unit of the
    partitioned batch reader.

    ``corrupt_policy``: a record that fails JSON/base64 decoding or
    lacks the replayId either fails the task (``"fail"``, the
    default — corruption is loud) or is dropped (``"skip"`` — the
    100 TB posture, where one poisoned record must not wedge a
    backfill; the streaming pipeline's analog is
    :func:`streaming.job.split_corrupt`'s dead-letter side)."""
    import base64

    rows: list[tuple[int, str, str]] = []
    with open(fpath) as f:
        for line in f:
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
                env = json.loads(base64.b64decode(rec["data"]))
                rows.append(
                    (int(env["event"]["replayId"]), rec["partitionKey"], rec["data"])
                )
            except (ValueError, KeyError, TypeError):
                if corrupt_policy != "skip":
                    raise
    rows.sort()
    return rows


def _scan_landing(path: str) -> list[tuple[int, str, str]]:
    """Read every wire record under the landing dir → sorted
    [(replay_id, partitionKey, data)]. Driver-side helper for the
    simple stream reader (the stub stands in for a server cursor)."""
    rows: list[tuple[int, str, str]] = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".json"):
            continue
        rows.extend(_scan_file(os.path.join(path, fname)))
    rows.sort()
    return rows


try:  # the Python DataSource API needs pyspark >= 4
    from dataclasses import dataclass

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamWriter,
        DataSourceWriter,
        InputPartition,
        SimpleDataSourceStreamReader,
        WriterCommitMessage,
    )

    @dataclass
    class _WireCommit(WriterCommitMessage):
        """Per-partition commit message: the staged file plus the PUT
        accounting (picklable — it travels executor → driver)."""

        staged: str
        records: int
        put_batches: int

    class _WireBatchReader(DataSourceReader):
        """Batch read of the landing dir, ONE TASK PER FILE: the
        ``partitions()`` half of the DataSource reader API — without
        it every file funnels through a single task (the default lone
        ``InputPartition(None)``), which is exactly the
        single-consumer bottleneck the reference's one-subscriber
        design has (KinesisExample.java:45). Files are the natural
        split unit because the landing layout is range-partitioned by
        replayId (streaming/job.py `ensure_landing`), so each task
        reads a contiguous offset range."""

        def __init__(self, options):
            self.path = options["path"]
            self.corrupt_policy = options.get("corrupt_policy", "fail")

        def partitions(self):
            return [
                InputPartition(os.path.join(self.path, f))
                for f in sorted(os.listdir(self.path))
                if f.endswith(".json")
            ] or [InputPartition(None)]

        def read(self, partition):
            if partition.value is None:
                return
            for replay_id, pk, data in _scan_file(
                partition.value, self.corrupt_policy
            ):
                yield (replay_id, pk, data)

    class _WireStreamReader(SimpleDataSourceStreamReader):
        """Offset = last replayId delivered — exactly the reference's
        replay map (ReplayExtension.java:31-50). On (re)start the
        initial offset comes from the ``replay_from`` option: -2 all
        history, -1 only new events, or a concrete replayId."""

        def __init__(self, options):
            self.path = options["path"]
            self.replay_from = int(options.get("replay_from", REPLAY_FROM_EARLIEST))
            self.auth_name = options.get("token_provider")
            self._token: str | None = None

        def _ensure_auth(self) -> None:
            """EmpConnector.java:322-346 as a guard before every scan:
            if the current token is no longer valid, reauthenticate
            once and resubscribe. Because the offset (replayId) lives
            in the checkpoint, NOT in the connection, the resubscribe
            resumes exactly where the failed scan would have — no
            events lost or reprocessed across an auth outage."""
            if self.auth_name is None:  # sandbox: no auth configured
                return
            provider, validator = _TOKEN_PROVIDERS[self.auth_name]
            if self._token is not None and validator(self._token):
                return
            self._token = provider()  # reauthenticate
            if not validator(self._token):
                raise AuthError(
                    f"token provider {self.auth_name!r} returned an invalid token"
                )

        def initialOffset(self):
            if self.replay_from == REPLAY_FROM_EARLIEST:
                return {"replay_id": -1}
            if self.replay_from == REPLAY_FROM_TIP:
                rows = _scan_landing(self.path)
                return {"replay_id": rows[-1][0] if rows else -1}
            return {"replay_id": self.replay_from}

        def read(self, start: dict):
            self._ensure_auth()
            last = start["replay_id"]
            rows = [r for r in _scan_landing(self.path) if r[0] > last]
            end = {"replay_id": rows[-1][0] if rows else last}
            return iter(rows), end

        def readBetweenOffsets(self, start: dict, end: dict):
            self._ensure_auth()
            return iter(
                r
                for r in _scan_landing(self.path)
                if start["replay_id"] < r[0] <= end["replay_id"]
            )

    FIREHOSE_PUT_CAP = 500  # records per PutRecordBatch (the service limit)

    def _drop_job_stage(path: str, job: str) -> None:
        """Remove ONE job's staging dir, then the shared ``_staged``
        parent iff no other job is mid-flight (best-effort rmdir)."""
        import shutil as _shutil

        _shutil.rmtree(os.path.join(path, "_staged", job), ignore_errors=True)
        try:
            os.rmdir(os.path.join(path, "_staged"))
        except OSError:  # another job's stage still in flight, or gone
            pass

    class _WireBatchWriter(DataSourceWriter):
        """The Firehose-analog sink (KinesisExample.java:137-148 /
        worker/template.yaml:101-113) as a Python DataSource WRITER
        with the API's full two-phase commit:

        - executors stage their partition's records under a
          PER-JOB stage ``<path>/_staged/<job>/`` in PUT batches of
          at most ``put_batch_size`` (defaults to Firehose's
          500-record PutRecordBatch cap — the seam where a real
          client's ``firehose.put_record_batch`` call goes).  The job
          token is minted once on the driver and pickled to every
          task, so two concurrent jobs (or a batch append racing the
          stream sink) can never delete each other's in-flight staged
          files (round-5 ADVICE);
        - the driver's ``commit`` renames every staged file into the
          landing dir (names carry the job token, so appends never
          collide) and only then drops the ``_SUCCESS`` marker —
          readers (``_scan_landing`` keys on ``.json``) never observe
          a torn write because staged files don't match the reader's
          suffix.  In OVERWRITE mode the new files are published
          FIRST and the previous publish's files deleted after: a
          crash mid-commit can transiently leave old+new visible
          (an at-least-once anomaly the retry cleans up) but never
          the round-5-ADVICE failure of NEITHER publish visible;
        - ``abort`` deletes only this job's stage, leaving the
          landing dir and other jobs' stages untouched — a failed
          job publishes nothing.
        """

        def __init__(self, options, overwrite: bool):
            import uuid as _uuid

            self.path = options["path"]
            self.put_cap = int(options.get("put_batch_size", FIREHOSE_PUT_CAP))
            self.overwrite = overwrite
            # driver-minted, shared by every pickled task of this job
            self.job = options.get("staging_token") or _uuid.uuid4().hex[:12]

        def write(self, iterator) -> "_WireCommit":
            import uuid as _uuid

            staged_dir = os.path.join(self.path, "_staged", self.job)
            os.makedirs(staged_dir, exist_ok=True)
            fname = os.path.join(staged_dir, f"{_uuid.uuid4().hex}.staged")
            records = 0
            puts = 0
            with open(fname, "w") as f:
                batch: list[str] = []

                def flush() -> None:
                    nonlocal puts
                    # a real client ships `batch` via PutRecordBatch
                    # here; the sandbox stand-in appends the same
                    # payload to the staged file
                    f.write("".join(batch))
                    puts += 1
                    batch.clear()

                for row in iterator:
                    batch.append(
                        json.dumps(
                            {"partitionKey": row.partitionKey, "data": row.data}
                        )
                        + "\n"
                    )
                    records += 1
                    if len(batch) >= self.put_cap:
                        flush()
                if batch:
                    flush()
            return _WireCommit(staged=fname, records=records, put_batches=puts)

        def commit(self, messages) -> None:
            # overwrite = publish-first, delete-after: snapshot the
            # previous publish BEFORE adding our files, rename ours in
            # (job token uniquifies names — a mode("append") job ADDs
            # files, never os.replace over an earlier publish), then
            # remove the snapshot.  A crash between the two phases
            # leaves old+new (retryable), never an empty landing dir.
            # Concurrent OVERWRITE commits are SERIALIZED by a flock:
            # two unserialized overwriters would each snapshot a
            # `previous` missing the other's files and leave the UNION
            # of both publishes permanently visible (round-6 ADVICE).
            # Appends stay lock-free — their names never collide.
            import fcntl

            lock_fd = None
            if self.overwrite:
                os.makedirs(self.path, exist_ok=True)
                lock_fd = os.open(
                    os.path.join(self.path, ".overwrite.lock"),
                    os.O_WRONLY | os.O_CREAT,
                    0o644,
                )
                fcntl.flock(lock_fd, fcntl.LOCK_EX)
            try:
                previous = (
                    [f for f in os.listdir(self.path) if f.endswith(".json")]
                    if self.overwrite
                    else []
                )
                for i, m in enumerate(messages):
                    os.replace(
                        m.staged,
                        os.path.join(self.path, f"put-{self.job}-{i:05d}.json"),
                    )
                with open(os.path.join(self.path, "_SUCCESS"), "w"):
                    pass
                for old in previous:
                    try:
                        os.remove(os.path.join(self.path, old))
                    except FileNotFoundError:  # already gone
                        pass
            finally:
                if lock_fd is not None:
                    os.close(lock_fd)  # releases the flock
            _drop_job_stage(self.path, self.job)

        def abort(self, messages) -> None:
            _drop_job_stage(self.path, self.job)

    class _WireStreamWriter(DataSourceStreamWriter):
        """The streaming half of the Firehose sink: per micro-batch,
        executors stage PUT batches exactly like the batch writer, and
        the driver `commit(messages, batchId)` publishes them under
        epoch-numbered names plus a ``_batch_<id>_COMMITTED`` marker.
        Exactly-once composition: the marker is written BEFORE the
        checkpoint advances, and a replayed batch (same batchId after
        a crash between publish and checkpoint commit) finds its
        marker, discards its re-staged files, and publishes nothing —
        the idempotent-sink discipline `foreachBatch` sinks implement
        by hand (streaming/merge.py), here inside the DataSource
        writer API itself."""

        def __init__(self, options, overwrite: bool):
            import uuid as _uuid

            self.path = options["path"]
            self.put_cap = int(options.get("put_batch_size", FIREHOSE_PUT_CAP))
            self.overwrite = overwrite
            # per-query stage: a stream sink never collides with a
            # concurrent batch writer's (or another stream's) stage
            self.job = _uuid.uuid4().hex[:12]

        def write(self, iterator) -> "_WireCommit":
            return _WireBatchWriter(
                {
                    "path": self.path,
                    "put_batch_size": str(self.put_cap),
                    "staging_token": self.job,
                },
                overwrite=False,
            ).write(iterator)

        def _marker(self, batch_id: int) -> str:
            return os.path.join(self.path, f"_batch_{batch_id:08d}_COMMITTED")

        def commit(self, messages, batchId: int) -> None:
            if os.path.exists(self._marker(batchId)):  # replayed batch
                for m in messages:
                    if m is not None and os.path.exists(m.staged):
                        os.remove(m.staged)
                return
            for i, m in enumerate(messages):
                if m is None:
                    continue
                os.replace(
                    m.staged,
                    os.path.join(self.path, f"put-{batchId:08d}-{i:05d}.json"),
                )
            with open(self._marker(batchId), "w"):
                pass
            _drop_job_stage(self.path, self.job)

        def abort(self, messages, batchId: int) -> None:
            _drop_job_stage(self.path, self.job)

    class CDCWireDataSource(DataSource):
        """``spark.read/readStream.format("cdc_wire")`` source for the
        Kinesis-shaped wire records, with replayId-based resume —
        and ``df.write/writeStream.format("cdc_wire")`` sink with the
        Firehose PUT-batch shape (batched two-phase commit; epoch
        markers make streaming commits idempotent under replay)."""

        @classmethod
        def name(cls) -> str:
            return "cdc_wire"

        def schema(self) -> str:
            return "replay_id bigint, partitionKey string, data string"

        def reader(self, schema):
            return _WireBatchReader(self.options)

        def simpleStreamReader(self, schema):
            return _WireStreamReader(self.options)

        def writer(self, schema, overwrite: bool):
            return _WireBatchWriter(self.options, overwrite)

        def streamWriter(self, schema, overwrite: bool):
            return _WireStreamWriter(self.options, overwrite)

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover - older pyspark
    CDCWireDataSource = None  # type: ignore[assignment]
    HAS_DATASOURCE_API = False


def register_cdc_wire(spark: SparkSession) -> None:
    if not HAS_DATASOURCE_API:  # pragma: no cover
        raise NotImplementedError("Python DataSource API requires pyspark >= 4")
    spark.dataSource.register(CDCWireDataSource)


# ---------------------------------------------------------------------------
# batched point-lookup client (S6 + T14 + T15 at the live edge)
# ---------------------------------------------------------------------------

FetchFn = Callable[[str, list[str]], pd.DataFrame]


def snapshot_fetcher(snapshot_pdf: pd.DataFrame, id_col: str) -> FetchFn:
    """Deterministic stand-in for the SOQL REST call: answers
    ``SELECT <all fields> WHERE Id IN (...)`` from a local pandas
    snapshot, exactly the contract of ``sf.query_all`` (app.py:97-99).
    A production fetcher holds a REST session per executor (the Spark
    analog of the Lambda's module-scope login, app.py:9-39)."""

    def fetch(entity_name: str, ids: list[str]) -> pd.DataFrame:
        return snapshot_pdf[snapshot_pdf[id_col].isin(ids)]

    return fetch


def soql_enrich(
    changes_df: DataFrame,
    fetch_fn: FetchFn,
    result_schema: str,
    batch_size: int = 50,  # worker/template.yaml:59
    interval_s: float = 0.0,  # worker/template.yaml:60 (1s deployed)
) -> DataFrame:
    """The worker's enrichment loop as a distributed operator: within
    each Arrow batch, dedup ids per entity, slice into ``batch_size``
    chunks (app.py:75), call ``fetch_fn`` per chunk, optionally sleep
    ``interval_s`` between calls (app.py:112-113), stamp ``UIND``
    (app.py:102). Chunking/rate limiting exist to respect the remote
    API — on parquet snapshots the broadcast join (T12) replaces this
    entirely."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for entity, grp in pdf.groupby("entity_name"):
                # one output row per change; each distinct id fetched once
                # per batch (the reference's in-event dedup, app.py:65-72)
                pairs = grp[["record_id", "uid", "change_type"]]
                ids = pairs["uid"].drop_duplicates().tolist()
                for i in range(0, len(ids), batch_size):
                    chunk = ids[i : i + batch_size]
                    fetched = fetch_fn(entity, chunk)
                    if len(fetched):
                        out = fetched.merge(
                            pairs.rename(columns={"uid": "_uid"}),
                            left_on=fetched.columns[0],
                            right_on="_uid",
                        ).drop(columns=["_uid"])
                        out["UIND"] = out.pop("change_type")
                        yield out
                    if interval_s:
                        time.sleep(interval_s)

    return changes_df.mapInPandas(run, schema=result_schema)
