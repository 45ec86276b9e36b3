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

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

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

    def _event(self, j: int) -> tuple:
        if (
            self.replay_every
            and j >= self.replay_offset
            and j % self.replay_every == 0
            and j > 0
        ):
            j = j - self.replay_offset
        return vote_event(j, late_shift(j, *self.late))

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
