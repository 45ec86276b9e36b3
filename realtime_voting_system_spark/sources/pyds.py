"""Pure-Python Spark DataSource: the vote-event stream WITHOUT Kafka.

The reference's transport is Kafka (README.md:110-118; producer
data_generator.py:151-157) — unavailable in this environment (no broker,
no connector jar; NOTES.md). Spark 4's Python Data Source API closes the
gap natively: ``vote_stream`` is a streaming source that emits the SAME
deterministic vote events the generator would publish, so every streaming
job (dedup → aggregate → sink) runs end-to-end with
``spark.readStream.format("vote_stream")`` and no external system.

Determinism contract: event ``i`` is a pure function of ``i`` (md5-based
candidate pick mirroring sources/generator.py's weighted shares; timestamps
stride 1 s from a fixed epoch). ``readBetweenOffsets`` replays any offset
range bit-identically, which is exactly the property Structured Streaming
needs for exactly-once recovery (WAL-ed offsets → deterministic replay).

Scale: a SimpleDataSourceStreamReader reads on the driver — right for a
demo/test transport (the reference's nominal rate is ≤100 events/s). A
production feed swaps in the partitioned ``DataSourceStreamReader`` or
real Kafka; every downstream job is source-agnostic.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

_EPOCH = datetime(2024, 1, 1, 10, 0, 0, tzinfo=timezone.utc)
_CANDIDATES = [("c1", 45), ("c2", 35), ("c3", 20)]  # generator.py shares
_STATES = ["CA", "TX", "NY", "FL", "WA"]


def late_shift(
    i: int,
    late_every: int = 0,
    late_by: int = 0,
    very_late_every: int = 0,
    very_late_by: int = 0,
) -> int:
    """Seconds to SUBTRACT from event i's base timestamp — the planted
    out-of-order arrival pattern for watermark/late-data tests (ST6).
    Pure function of i, so replay determinism is untouched. Very-late
    takes precedence (the pattern that must be beyond any reasonable
    watermark allowance); i=0 is never shifted (it anchors the clock)."""
    if i > 0 and very_late_every and i % very_late_every == 0:
        return very_late_by
    if i > 0 and late_every and i % late_every == 0:
        return late_by
    return 0


def burst_shift(i: int, burst_size: int = 0, burst_gap_s: int = 0) -> int:
    """Seconds to SUBTRACT from event i's base timestamp so event times
    arrive in BURSTS: groups of ``burst_size`` consecutive events spaced
    1 s apart, each burst starting ``burst_gap_s`` after the previous
    burst's START — the activity-pause-activity shape session windows
    (ST9) exist to segment. The shift is negative when the gap stretches
    the timeline (event time = i − shift = ⌊i/B⌋·G + i mod B). Pure
    function of i — replay determinism untouched."""
    if not burst_size:
        return 0
    return i - ((i // burst_size) * burst_gap_s + (i % burst_size))


def vote_event(i: int, shift: int = 0) -> tuple:
    """The i-th vote event (pure function of (i, shift) — replayable);
    ``shift`` seconds are subtracted from the base timestamp (late
    arrival: the event's position in the stream is i, its event time is
    older)."""
    h = int(hashlib.md5(f"vote:{i}".encode()).hexdigest()[:8], 16)
    pick, total = h % 100, 0
    for cid, share in _CANDIDATES:
        total += share
        if pick < total:
            candidate = cid
            break
    voter = f"v{i:08d}"
    state = _STATES[h // 100 % len(_STATES)]
    ts = (_EPOCH + timedelta(seconds=i - shift)).replace(tzinfo=None)
    return (f"vote-{i:08d}", voter, candidate, state, ts)


class VoteStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.max_rows = int(options.get("max_rows", 0))  # 0 = unbounded
        self.late = (
            int(options.get("late_every", 0)),
            int(options.get("late_by", 0)),
            int(options.get("very_late_every", 0)),
            int(options.get("very_late_by", 0)),
        )
        # replay pattern (ST7 dedup tests): stream position i carries an
        # exact REPLAY of event i-replay_offset (same vote_id/voter/
        # candidate/event time — the duplicate delivery a consumer must
        # drop). Pure function of i — replay determinism untouched.
        self.replay_every = int(options.get("replay_every", 0))
        self.replay_offset = int(options.get("replay_offset", 5))
        # burst timing (ST9/ST30 session tests): see burst_shift
        self.burst = (
            int(options.get("burst_size", 0)),
            int(options.get("burst_gap_s", 0)),
        )

    def _event(self, j: int) -> tuple:
        if (
            self.replay_every
            and j >= self.replay_offset
            and j % self.replay_every == 0
            and j > 0
        ):
            j = j - self.replay_offset
        return vote_event(
            j, late_shift(j, *self.late) + burst_shift(j, *self.burst)
        )

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i = int(start["i"])
        end = i + self.rows_per_batch
        if self.max_rows:
            end = min(end, self.max_rows)
        return iter([self._event(j) for j in range(i, end)]), {"i": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [self._event(j) for j in range(int(start["i"]), int(end["i"]))]
        )


class VoteStreamDataSource(DataSource):
    """``spark.dataSource.register(VoteStreamDataSource)`` then
    ``spark.readStream.format("vote_stream")...`` — options:
    rows_per_batch (default 50), max_rows (0 = unbounded)."""

    @classmethod
    def name(cls) -> str:
        return "vote_stream"

    def schema(self) -> str:
        return (
            "vote_id string, voter_id string, candidate_id string, "
            "address_state string, voted_at timestamp"
        )

    def simpleStreamReader(self, schema):
        return VoteStreamReader(self.options)


def register(spark) -> None:
    """Register the transport; the MODULE is pickled by value so the
    worker that instantiates the DataSource never needs this package on
    its import path — the same self-containment contract every Arrow
    closure in this repo keeps (an external driver's workers cannot
    import the package; only stdlib + pyspark refs remain by-reference)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(VoteStreamDataSource)


# ---------------------------------------------------------------------------
# X97 scale form — the PARTITIONED stream reader: offsets ranged on the
# driver, rows generated on EXECUTORS (the production shape the Simple
# reader's docstring points at; Kafka's reader has the same split —
# driver tracks offsets, executors fetch partitions)
# ---------------------------------------------------------------------------


from pyspark.sql.datasource import (  # noqa: E402
    DataSourceStreamReader,
    InputPartition,
)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int, late: tuple):
        self.start, self.end, self.late = start, end, late


class VoteStreamDistReader(DataSourceStreamReader):
    """Partitioned streaming reader: ``latestOffset`` advances the row
    cursor on the driver (rows_per_batch per trigger, capped at
    max_rows); ``partitions`` slices each [start, end) offset range into
    ``num_partitions`` contiguous sub-ranges; ``read`` runs ON THE
    EXECUTORS, generating each slice's events independently (pure
    function of the index — the same determinism contract as the Simple
    reader, so recovery replays bit-identically). This is the reader
    shape that scales: the driver touches only offsets, event
    construction is distributed."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 50))
        self.max_rows = int(options.get("max_rows", 0))
        self.num_partitions = int(options.get("num_partitions", 4))
        # backlog_rows: this many events are ALREADY AVAILABLE when the
        # query starts (a queued-up topic). The first latestOffset()
        # reports the whole backlog at once — which is what
        # Trigger.AvailableNow keys on to drain-and-terminate (ST22).
        # 0 = live-feed behavior (advance rows_per_batch per trigger).
        self.backlog_rows = int(options.get("backlog_rows", 0))
        # id_offset: event identities start at this index (offsets stay
        # 0-based) — two instances with disjoint [offset, offset+max)
        # ranges model independent regional feeds for stream-union (ST23)
        self.id_offset = int(options.get("id_offset", 0))
        self.late = (
            int(options.get("late_every", 0)),
            int(options.get("late_by", 0)),
            int(options.get("very_late_every", 0)),
            int(options.get("very_late_by", 0)),
        )
        self._cur = 0

    def initialOffset(self) -> dict:
        return {"i": 0}

    def latestOffset(self) -> dict:
        if self.backlog_rows and self._cur < self.backlog_rows:
            # clamp to max_rows: a backlog larger than the total cap must
            # not generate events past the intended bound (advisor r5)
            backlog = self.backlog_rows
            if self.max_rows:
                backlog = min(backlog, self.max_rows)
            self._cur = backlog
            return {"i": backlog}
        nxt = self._cur + self.rows_per_batch
        if self.max_rows:
            nxt = min(nxt, self.max_rows)
        self._cur = nxt
        return {"i": nxt}

    def partitions(self, start: dict, end: dict):
        o = self.id_offset
        s, e = int(start["i"]) + o, int(end["i"]) + o
        if e <= s:
            return [_RangePartition(s, s, self.late)]
        n = max(1, self.num_partitions)
        step = max(1, -(-(e - s) // n))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, e), self.late)
            for lo in range(s, e, step)
        ]

    def read(self, partition):
        # executor-side: generate this slice's events
        for j in range(partition.start, partition.end):
            yield vote_event(j, late_shift(j, *partition.late))

    def commit(self, end: dict) -> None:
        pass  # nothing external to ack — events are synthesized


class VoteStreamDistDataSource(DataSource):
    """``spark.readStream.format("vote_stream_dist")`` — the partitioned
    form of vote_stream: same schema, same deterministic events, but
    read() fans out across executors (num_partitions option, default 4)."""

    @classmethod
    def name(cls) -> str:
        return "vote_stream_dist"

    def schema(self) -> str:
        return (
            "vote_id string, voter_id string, candidate_id string, "
            "address_state string, voted_at timestamp"
        )

    def streamReader(self, schema):
        return VoteStreamDistReader(self.options)


def register_dist(spark) -> None:
    """Register the partitioned transport (pickle-by-value — same
    self-containment contract as register())."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(VoteStreamDistDataSource)


# ---------------------------------------------------------------------------
# X97 write side — a Python DataSource STREAMING SINK with exactly-once
# file commits (the custom-connector twin of the reference's Kafka
# producer target topics, README.md:116-118)
# ---------------------------------------------------------------------------


class _FileCommit(WriterCommitMessage):
    """WriterCommitMessage carrying the files a task wrote."""

    def __init__(self, files):
        self.files = files


class VoteSinkWriter(DataSourceStreamWriter):
    """DataSourceStreamWriter: each task writes its partition's rows to a
    UNIQUELY-NAMED json-lines file under ``path/_staged`` (task attempts
    never collide, so retries are safe); the driver's ``commit`` then
    records the batch's file list in ``path/_commits/<batchId>.json`` —
    the atomic publish. A reader that honors the manifest (read_committed
    below) sees each micro-batch exactly once no matter how many task
    retries or speculative attempts staged duplicate files; ``abort``
    leaves only unreferenced staging files, which never become visible.
    This is the same two-phase pattern Spark's own file sink uses (tasks
    stage, driver commits a manifest), expressed through the Spark 4
    Python DataSource writer API."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("vote_sink requires a path option")

    def write(self, iterator):
        # executes on the worker: stage this partition's rows
        import json
        import os
        import uuid

        from pyspark import TaskContext

        staged = os.path.join(self.path, "_staged")
        os.makedirs(staged, exist_ok=True)
        ctx = TaskContext.get()
        fname = os.path.join(
            staged,
            f"part-{ctx.partitionId()}-{ctx.taskAttemptId()}-"
            f"{uuid.uuid4().hex}.jsonl",
        )
        n = 0
        with open(fname, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _FileCommit([fname] if n else [])

    def commit(self, messages, batchId):
        import json
        import os

        commits = os.path.join(self.path, "_commits")
        os.makedirs(commits, exist_ok=True)
        files = [f for m in messages if m is not None for f in m.files]
        tmp = os.path.join(commits, f".{batchId}.json.tmp")
        out = os.path.join(commits, f"{batchId}.json")
        with open(tmp, "w") as fh:
            json.dump({"batchId": batchId, "files": files}, fh)
        os.replace(tmp, out)  # atomic publish

    def abort(self, messages, batchId):
        import os

        for m in messages:
            if m is None:
                continue
            for f in m.files:
                try:
                    os.remove(f)
                except OSError:
                    pass


class VoteSinkDataSource(DataSource):
    """``spark.dataSource.register(VoteSinkDataSource)`` then
    ``df.writeStream.format("vote_sink").option("path", dir)`` —
    json-lines micro-batch files published through per-batch commit
    manifests (exactly-once for manifest-honoring readers)."""

    @classmethod
    def name(cls) -> str:
        return "vote_sink"

    def streamWriter(self, schema, overwrite):
        return VoteSinkWriter(self.options)


def read_committed(spark, path: str, schema: str):
    """Batch-read ONLY the rows whose files appear in a commit manifest —
    the consumer contract of vote_sink (staged-but-uncommitted files are
    invisible, exactly like unacked Kafka messages)."""
    import glob
    import json as _json
    import os

    files = []
    for man in sorted(glob.glob(os.path.join(path, "_commits", "*.json"))):
        with open(man) as fh:
            files.extend(_json.load(fh)["files"])
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def register_sink(spark) -> None:
    """Register the sink (pickle-by-value — same self-containment
    contract as register())."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(VoteSinkDataSource)
