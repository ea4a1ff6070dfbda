"""Job-state control table (ops J1/J2/H1/Z1).

Reference: Redis hash per job with every mutation guarded by a Lua
compare-and-set on job_instance_id (state/redis.rs:25-42,184-236); fields
job_state.rs:38-50; key `ingest:job:{symbol}:{date}`
(backfill_service.rs:87); heartbeat staleness 300 s
(backfill_service.rs:13); stale-instance writes rejected (Z1,
redis.rs:198-200).

Spark-native design: one JSON state file per job_key in a control
directory, mutated via write-tmp → atomic rename — the same commit
primitive the docs mandate for data files (IDD.md:26-28). Every mutation
is a true compare-and-set: a per-key `O_CREAT|O_EXCL` lockfile serializes
the read→fence-check→write critical section (two concurrent writers can
never interleave between the check and the commit — the race the
reference's Lua script closes, state/redis.rs:25-42), and every committed
state carries a monotonically increasing ``version`` so lost updates are
detectable. On a production cluster this table is a Delta table and each
mutation a conditional `MERGE ... ON job_key AND job_instance_id =
expected` (0 rows matched == StaleInstance); the file-per-key layout
keeps the same interface without requiring an ACID table format in this
environment. ``as_dataframe`` exposes the table to Spark for supervisor
queries (stalled scan, H1).
"""

from __future__ import annotations

import contextlib
import datetime as dt
import json
import os
import tempfile
import time
import uuid
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

HEARTBEAT_TIMEOUT_S = 300  # reference backfill_service.rs:13

PENDING, RUNNING, COMPLETED, FAILED = "PENDING", "RUNNING", "COMPLETED", "FAILED"


class JobAlreadyRunningError(Exception):
    pass


class StaleInstanceError(Exception):
    pass


class ControlTableCorruptError(Exception):
    """A state file exists but does not parse — surfaced with the path
    and remediation instead of a bare JSONDecodeError that would wedge
    every operation on the key with no explanation (r10 review).  The
    documented recovery: inspect, then delete the named file; the next
    initialize_job() re-creates the job (cursor restarts from day start —
    ingestion is idempotent by instance-stamped filenames, IDD:181,227)."""


@dataclass
class JobState:
    job_key: str
    status: str
    job_instance_id: str
    cursor: int  # unix-ms high-water mark
    end_time: int
    heartbeat_at: float  # unix seconds
    critical_ranges: list[dict] = field(default_factory=list)
    last_error_type: str | None = None
    version: int = 0  # bumped on every committed mutation (CAS audit trail)


def job_key(symbol: str, date: str) -> str:
    """`ingest:job:{symbol}:{date}` (backfill_service.rs:87)."""
    return f"ingest:job:{symbol}:{date}"


class ControlTable:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, key: str) -> str:
        # percent-encoding is BIJECTIVE and filesystem-safe: the old
        # ':'→'_' rewrite collided 'A:B' with 'A_B' (two jobs sharing one
        # CAS record) and crashed outright on '/'-bearing symbols like
        # BTC/USD (r10 review)
        from urllib.parse import quote

        return os.path.join(self.root, quote(key, safe="") + ".json")

    def get(self, key: str) -> JobState | None:
        path = self._path(key)
        # One-time migration from the pre-percent-encoding ':'→'_' filename
        # scheme: without it a job last written by an older version would
        # silently re-initialize with a reset cursor (get() misses the
        # legacy name) while as_dataframe kept listing the orphaned legacy
        # file — a ghost duplicate of the same job_key.  The legacy name is
        # AMBIGUOUS ('A:B' and 'A_B' collide — the very bug percent-encoding
        # fixed), so a candidate only migrates if its CONTENT names this
        # exact job_key; otherwise it is some other job's canonical file
        # and must not be hijacked.  The rename is atomic; a concurrent
        # reader losing the race just finds the file already moved.
        if not os.path.exists(path):
            legacy = os.path.join(self.root, key.replace(":", "_") + ".json")
            if legacy != path and os.path.exists(legacy):
                try:
                    with open(legacy) as f:
                        data = json.load(f)
                except FileNotFoundError:
                    data = None  # another reader migrated it first
                except (OSError, json.JSONDecodeError,
                        UnicodeDecodeError) as ex:
                    # A corrupt candidate CANNOT be attributed (the name is
                    # ambiguous between 'A:B' and 'A_B') — fail LOUDLY with
                    # remediation rather than silently re-initializing a
                    # cursor that may belong to this very job (r11 review).
                    raise ControlTableCorruptError(
                        f"unreadable legacy job-state file {legacy!r} ({ex});"
                        f" it may hold state for {key!r} — inspect and delete"
                        " or rename it to re-initialize"
                    ) from ex
                owner = data.get("job_key") if isinstance(data, dict) else None
                if data is not None and owner is None:
                    raise ControlTableCorruptError(
                        f"legacy job-state file {legacy!r} carries no job_key;"
                        f" it may hold state for {key!r} — inspect and delete"
                        " or rename it to re-initialize"
                    )
                if owner == key:
                    try:
                        os.replace(legacy, path)
                    except FileNotFoundError:
                        pass  # another reader migrated it first
        try:
            with open(path) as f:
                return JobState(**json.load(f))
        except FileNotFoundError:
            return None
        except (json.JSONDecodeError, TypeError) as ex:
            raise ControlTableCorruptError(
                f"unreadable job-state file {path!r} ({ex}); inspect and "
                "delete it to re-initialize the job"
            ) from ex

    def _write(self, st: JobState) -> None:
        st.version += 1
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(asdict(st), f)
            # fsync data before the rename and the directory after it:
            # without both, a crash can publish a zero-length or partial
            # file under the final name — "atomic commit" only holds
            # across power loss if the data precedes the name (r10 review)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._path(st.job_key))  # atomic commit (IDD.md:26-28)
        dfd = os.open(self.root, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)

    @contextlib.contextmanager
    def _locked(self, key: str, timeout_s: float = 5.0):
        """Per-key critical section via ``flock(LOCK_EX)`` on a lockfile.

        The kernel grants the exclusive lock to exactly one holder and
        releases it automatically when the holding process dies — so there
        is no stale-lock state to detect and no break-the-lock window for
        two waiters to race through (an unlink-based stale-break has an
        unavoidable TOCTOU: a waiter can delete a FRESH lock another
        waiter just created). The lockfile itself is never unlinked.
        Waiters poll non-blocking every 1 ms up to ``timeout_s``.
        """
        import fcntl

        lock = self._path(key) + ".lock"
        fd = os.open(lock, os.O_CREAT | os.O_RDWR)
        deadline = time.monotonic() + timeout_s
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except BlockingIOError:
                    if time.monotonic() > deadline:
                        raise TimeoutError(f"lock contention on {key}")
                    time.sleep(0.001)
            try:
                yield
            finally:
                fcntl.flock(fd, fcntl.LOCK_UN)
        finally:
            os.close(fd)

    # -- J1: init / stale takeover (backfill_service.rs:82-115) ------------

    def initialize_job(
        self,
        key: str,
        day_start_ms: int,
        end_time_ms: int,
        now: float | None = None,
        heartbeat_timeout_s: int = HEARTBEAT_TIMEOUT_S,
    ) -> JobState:
        now = now if now is not None else dt.datetime.now(dt.timezone.utc).timestamp()
        with self._locked(key):
            st = self.get(key)
            if st is not None and st.status == RUNNING:
                if now - st.heartbeat_at <= heartbeat_timeout_s:
                    raise JobAlreadyRunningError(key)
                # stale takeover: new instance id, cursor preserved
                st.job_instance_id = str(uuid.uuid4())
                st.heartbeat_at = now
                self._write(st)
                return st
            if st is not None and st.status in (COMPLETED, FAILED, PENDING):
                st.status = RUNNING
                st.job_instance_id = str(uuid.uuid4())
                st.heartbeat_at = now
                self._write(st)
                return st
            st = JobState(
                job_key=key,
                status=RUNNING,
                job_instance_id=str(uuid.uuid4()),
                cursor=day_start_ms - 1,  # backfill_service.rs:105
                end_time=end_time_ms,
                heartbeat_at=now,
            )
            self._write(st)
            return st

    # -- J2/Z1: fenced mutations (atomic CAS, state/redis.rs:25-42) --------

    def _fenced(self, key: str, instance_id: str) -> JobState:
        st = self.get(key)
        if st is None or st.job_instance_id != instance_id:
            raise StaleInstanceError(key)
        return st

    def _mutate(self, key: str, instance_id: str, apply) -> None:
        """CAS: fence-check and commit under the per-key lock — a zombie
        holding a stale instance id can never interleave between another
        writer's check and write (Z1, redis.rs:198-200)."""
        with self._locked(key):
            st = self._fenced(key, instance_id)
            apply(st)
            self._write(st)

    def update_cursor(self, key: str, instance_id: str, cursor_ms: int) -> None:
        def apply(st: JobState) -> None:
            st.cursor = max(st.cursor, cursor_ms)  # HWM never regresses

        self._mutate(key, instance_id, apply)

    def update_status(
        self, key: str, instance_id: str, status: str, error_type: str | None = None
    ) -> None:
        def apply(st: JobState) -> None:
            st.status = status
            st.last_error_type = error_type

        self._mutate(key, instance_id, apply)

    def add_critical_range(
        self, key: str, instance_id: str, start: str, end: str
    ) -> None:
        """Record a failed day range on the job state (the reference's
        ``critical_ranges`` field, job_state.rs:38-50) so a retry re-plans
        it even though the cursor HWM has moved past it — the cursor alone
        cannot distinguish "day done" from "a later day done"."""
        rng = {"start": start, "end": end}

        def apply(st: JobState) -> None:
            if rng not in st.critical_ranges:
                st.critical_ranges.append(rng)

        self._mutate(key, instance_id, apply)

    def remove_critical_range(
        self, key: str, instance_id: str, start: str, end: str
    ) -> None:
        rng = {"start": start, "end": end}

        def apply(st: JobState) -> None:
            st.critical_ranges = [r for r in st.critical_ranges if r != rng]

        self._mutate(key, instance_id, apply)

    def heartbeat(self, key: str, instance_id: str, now: float | None = None) -> None:
        hb = now if now is not None else dt.datetime.now(dt.timezone.utc).timestamp()

        def apply(st: JobState) -> None:
            st.heartbeat_at = hb

        self._mutate(key, instance_id, apply)

    # -- H1: supervisor view ----------------------------------------------

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        states = []
        for fn in sorted(os.listdir(self.root)):
            if fn.endswith(".json"):
                path = os.path.join(self.root, fn)
                try:
                    with open(path) as f:
                        states.append(json.load(f))
                except json.JSONDecodeError as ex:
                    raise ControlTableCorruptError(
                        f"unreadable job-state file {path!r} ({ex}); "
                        "inspect and delete it to re-initialize the job"
                    ) from ex
        schema = (
            "job_key STRING, status STRING, job_instance_id STRING, cursor BIGINT, "
            "end_time BIGINT, heartbeat_at DOUBLE, "
            "critical_ranges ARRAY<MAP<STRING,STRING>>, last_error_type STRING, "
            "version BIGINT"
        )
        return spark.createDataFrame(
            [
                (
                    s["job_key"], s["status"], s["job_instance_id"], s["cursor"],
                    s["end_time"], s["heartbeat_at"], s.get("critical_ranges", []),
                    s.get("last_error_type"), s.get("version", 0),
                )
                for s in states
            ],
            schema,
        )

    def stalled_jobs(
        self, spark: SparkSession, now: float | None = None,
        heartbeat_timeout_s: int = HEARTBEAT_TIMEOUT_S,
    ) -> DataFrame:
        """`status='RUNNING' AND heartbeat_at < now - threshold` (H1)."""
        from pyspark.sql import functions as F

        now = now if now is not None else dt.datetime.now(dt.timezone.utc).timestamp()
        return self.as_dataframe(spark).where(
            (F.col("status") == RUNNING)
            & (F.col("heartbeat_at") < F.lit(now - heartbeat_timeout_s))
        )
