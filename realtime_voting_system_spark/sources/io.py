"""Format-agnostic batch IO (SURVEY §2.1 S1/S7; §1.2 schema discipline).

One reader/writer pair over parquet / CSV / JSON lines. The engine never
infers schemas (the reference declares DDL, setup_database.py:52-117) —
every read takes an explicit StructType except parquet, whose footer IS the
schema. CSV covers the reference's export sink (app.py:373
``votes_data.to_csv``); JSON covers the Kafka envelope files
(streaming/envelope.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_FORMATS = ("parquet", "orc", "csv", "json")


def read(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | None = None,
) -> DataFrame:
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    reader = spark.read
    if fmt in ("parquet", "orc"):  # self-describing footers ARE the schema
        return reader.format(fmt).load(path)
    if schema is None:
        raise ValueError(f"{fmt} reads require an explicit schema (§1.2)")
    reader = reader.schema(schema)
    if fmt == "csv":
        return reader.option("header", True).csv(path)
    return reader.json(path)


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
) -> None:
    """Columnar-first writer. ``partition_by`` is the scale lever — the
    analog of the reference's B-tree indexes (setup_database.py:109-115):
    partitioning by e.g. date(voted_at) turns time predicates into
    partition pruning instead of index seeks."""
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {_FORMATS}")
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "json":
        writer.json(path)
    else:  # parquet / orc — columnar, self-describing
        writer.format(fmt).save(path)


def scratch_dir(prefix: str = "rtvs_") -> str:
    """A fresh scratch directory for EPHEMERAL per-query artifacts —
    streaming-gate checkpoints, staged index roots, temp parquet —
    that are discarded when the query returns. Placement (guide §6,
    I/O layout): scratch that needs no durability belongs on the
    fastest medium available, so this prefers a RAM-backed dir
    ($SPARK_GRAFT_SCRATCH if set, else /dev/shm when present, else
    the system tempdir). Measured r12 on this rig: a streaming gate's
    per-micro-batch state-store + WAL commits against disk /tmp ran
    21-46 s per gate with erratic variance; the identical gate against
    /dev/shm ran 11-12 s, stable. Durable deployments point their
    checkpoints/index roots at real storage explicitly — nothing
    long-lived is ever placed here."""
    import os
    import tempfile

    base = os.environ.get("SPARK_GRAFT_SCRATCH")
    if base is None and os.path.isdir("/dev/shm"):
        base = "/dev/shm/rtvs_scratch"
    if base:
        os.makedirs(base, exist_ok=True)
        return tempfile.mkdtemp(prefix=prefix, dir=base)
    return tempfile.mkdtemp(prefix=prefix)


def jdbc_options(
    url: str,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetch_size: int | None = None,
) -> dict[str, str]:
    """spark.read.format("jdbc") option map (SURVEY §2.1 S1's second half:
    the engine-side equivalent of the reference's live Postgres scans,
    app.py:16-22 psycopg2.connect → SELECT).

    Pure function so the wiring is unit-testable without a database.
    Scale levers, mirroring the parquet path's pushdown discipline:
    - ``table`` (dbtable) lets Catalyst push filters AND column pruning
      into the remote WHERE/SELECT; prefer it over ``query`` (a
      pre-materialized subquery Spark treats as opaque).
    - ``partition_column``/``lower_bound``/``upper_bound``/
      ``num_partitions`` split the scan into range-predicate partitions —
      the only way a JDBC read parallelizes; without them the whole table
      streams through ONE task. Spark requires all four together and
      forbids combining them with ``query``.
    - ``fetch_size`` bounds per-round-trip rows (Postgres default 0 means
      full materialization driver-side in the JDBC client — always set it
      for big tables).
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table/query is required")
    part_opts = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(o is not None for o in part_opts) and (
        any(o is None for o in part_opts)
    ):
        raise ValueError(
            "partition_column, lower_bound, upper_bound, num_partitions "
            "must be set together"
        )
    if query is not None and partition_column is not None:
        raise ValueError("partitioned reads require table, not query")
    opts = {"url": url}
    if table is not None:
        opts["dbtable"] = table
    if query is not None:
        opts["query"] = query
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    if partition_column is not None:
        opts["partitionColumn"] = partition_column
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    if fetch_size is not None:
        opts["fetchsize"] = str(fetch_size)
    return opts


def read_jdbc(spark: SparkSession, url: str, **kwargs) -> DataFrame:
    """JDBC source (S1): ``read_jdbc(spark, url, table="votes",
    partition_column="id", ...)``. Execution needs the vendor driver jar
    on the classpath and a live database — absent in the test
    environment, so tests cover jdbc_options wiring; this loader is the
    thin assembly on top."""
    return spark.read.format("jdbc").options(**jdbc_options(url, **kwargs)).load()


def export_csv(df: DataFrame, path: str) -> None:
    """S7 — the dashboard's CSV export (app.py:373), distributed write
    (one file per partition; callers wanting a single file coalesce(1) —
    a deliberate driver-side choice, never the default)."""
    write(df, path, fmt="csv")


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    fmt: str = "parquet",
    target_file_mb: int = 128,
    target_files: int | None = None,
) -> int:
    """Small-file compaction: rewrite a directory of many small files into
    ~``target_file_mb`` outputs (or exactly ``target_files`` when given —
    the fixed-count mode the s12 gate exercises). The maintenance job
    every long-running ingest needs — streaming sinks and frequent
    micro-batches produce file counts that dominate scan planning time
    long before data size does (driver-side file listing + per-file open
    cost at 100 TB).

    Size-based mode uses the on-disk byte count (compressed), so the
    output count is deterministic for a given input, not sampled. Writes
    to ``out_path`` (never in place — the swap is the caller's atomic
    rename) and returns the partition count used. ``repartition``
    (round-robin, one shuffle) rather than ``coalesce``: coalesce(n)
    would chain whole upstream partitions skewed into each output task,
    while the shuffle yields evenly-sized files — the knob that matters
    when the result is read thousands of times.

    Local paths and self-describing formats only: sizing walks the local
    filesystem (a remote URI would measure 0 bytes and funnel everything
    through one task — fail fast instead; remote deployments size via the
    FileSystem API), and csv/json would need a schema ``read`` here never
    has.
    """
    import math
    import os

    if fmt not in ("parquet", "orc"):
        raise ValueError(f"compact supports parquet/orc, not {fmt!r}")
    if target_files is not None:
        n = max(1, target_files)
    else:
        if "://" in path and not path.startswith("file://"):
            raise ValueError(
                f"compact requires a local path; got {path!r} "
                "(sizing is os.walk-based)"
            )
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if not f.startswith(("_", ".")):
                    total += os.path.getsize(os.path.join(root, f))
        n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = read(spark, path, fmt)
    df.repartition(n).write.mode("overwrite").format(fmt).save(out_path)
    return n


def write_zordered(
    df: DataFrame,
    path: str,
    zcol_a: str,
    zcol_b: str,
    lo_a: float,
    hi_a: float,
    lo_b: float,
    hi_b: float,
    n_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """OPTIMIZE ZORDER for plain parquet: write ``df`` as ``n_files``
    files range-partitioned and sorted by the Morton interleave of the
    two named columns (operators/layout.zorder_key over bucketize_range).

    Why: parquet scan pruning works off per-file/row-group min-max stats.
    A table sorted on one column prunes only on that column; Z-order
    clustering bounds BOTH columns per file, so selective filters on
    either (or both) skip most files — at 100 TB the difference between
    reading a few files and listing them all. The zkey is dropped before
    the write: it's layout, not data.

    repartitionByRange samples the zkey to build balanced range bounds —
    file sizes stay even regardless of key skew (a fixed modulo split
    would not); sortWithinPartitions keeps row-group stats tight inside
    each file.
    """
    from pyspark.sql import functions as F

    from ..operators.layout import bucketize_range, zorder_key

    zkey = zorder_key(
        bucketize_range(F.col(zcol_a), lo_a, hi_a, 256),
        bucketize_range(F.col(zcol_b), lo_b, hi_b, 256),
    )
    (
        df.withColumn("__zkey", zkey)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )


def read_text_corpus(
    spark: SparkSession,
    path: str,
    whole_files: bool = True,
) -> DataFrame:
    """Raw text → `documents`-shaped input: one row per FILE
    (``whole_files=True``, the crawl-dump layout) or per LINE (line
    corpora). ``doc_id`` is CONTENT-ADDRESSED — md5 of the file path
    (file mode) or of (path, line text, occurrence ordinal among
    identical lines) folded to a positive long — deterministic across
    runs, executors, and partition layouts, unlike
    monotonically_increasing_id, which would break replayed pipelines.
    Line mode therefore does NOT preserve source line ORDER (the text
    source has no row index); ids are stable, order is not a contract.

    Scale: wholetext reads each file in one task (fine for crawl shards
    ≤ a few hundred MB; line mode splits normally); the id derivation is
    a pure projection plus, in line mode, one per-file window.
    ``source_path`` is kept for lineage.
    """
    from pyspark.sql import functions as F

    if whole_files:
        raw = (
            spark.read.text(path, wholetext=True)
            .select(
                F.input_file_name().alias("source_path"),
                F.col("value").alias("text"),
            )
        )
        key = F.md5(F.col("source_path"))
    else:
        from pyspark.sql.window import Window

        raw = (
            spark.read.text(path)
            .select(
                F.input_file_name().alias("source_path"),
                F.col("value").alias("text"),
            )
            .withColumn(
                "__line",
                F.row_number().over(
                    Window.partitionBy("source_path").orderBy(F.col("text"))
                ),
            )
        )
        key = F.md5(F.concat_ws("#", "source_path", F.col("__line")))
    out = raw.withColumn(
        "doc_id",
        F.pmod(
            F.conv(F.substring(key, 1, 15), 16, 10).cast("long"),
            F.lit(2**62),
        ),
    )
    return out.select("doc_id", "text", "source_path")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    dynamic: bool = True,
) -> None:
    """Partitioned-parquet writer with DYNAMIC partition overwrite (X129):
    ``mode("overwrite")`` replaces ONLY the partitions present in ``df``,
    leaving every other partition untouched — the idempotent daily-load
    contract (re-running a day's job rewrites that day, never truncates
    the table, which is exactly what static overwrite would do).

    At 100 TB this plus partition pruning IS the table layout story: facts
    partition by event date (the SURVEY §1.4 index analog), loads replace
    single dates, queries prune to the dates they filter on.
    """
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set(
        "spark.sql.sources.partitionOverwriteMode",
        "dynamic" if dynamic else "static",
    )
    try:
        df.write.partitionBy(*partition_cols).mode("overwrite").parquet(path)
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        else:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read (X130): ``mergeSchema`` unions the column
    sets of every file footer, so a table whose producer added columns
    over time reads as ONE relation — old files surface NULL for columns
    they predate. The batch twin of the streaming envelope's
    forward-compatible parse (from_json yields NULL for absent fields).

    Scale note: mergeSchema reads every footer at planning time — on a
    million-file table pin the merged schema explicitly once evolution
    settles (read(schema=...)); this entry point is for the evolving
    ingest edge."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def union_evolved(older: DataFrame, newer: DataFrame) -> DataFrame:
    """Union two schema-generations of a table by column NAME, not
    position: columns missing from either side become NULL (the
    allowMissingColumns contract). Plain ``union`` is positional and
    silently mismatches evolved schemas — the classic correctness trap
    this wrapper exists to avoid."""
    return older.unionByName(newer, allowMissingColumns=True)




class AuditFailure(Exception):
    """Raised by write_audit_publish when a rule fails — nothing was
    published; the staged version dir is left for inspection."""

    def __init__(self, report_rows):
        self.report = report_rows
        bad = [r["rule"] for r in report_rows if r["n_violations"] > 0]
        super().__init__(f"audit failed: {bad}")


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    rules,
    fmt: str = "parquet",
):
    """Write-Audit-Publish: stage ``df`` as a new immutable version dir
    under ``root``, audit the STAGED FILES (read back — what was
    actually written, not the in-memory plan), and only then flip the
    ``_PUBLISHED`` pointer to it via an atomic rename. Readers
    (``read_published``) resolve the pointer, so they see either the
    previous version or the new one — never a partial write, never
    un-audited data. A failed audit raises :class:`AuditFailure` and
    leaves the pointer untouched (the staged dir remains for
    inspection). This is the commit protocol every table format
    (Delta/Iceberg) builds on — swap a pointer, keep old versions
    readable for in-flight queries — expressed with nothing but files.

    ``rules`` are expectation (name, ANSI predicate) pairs
    (operators/expectations: NULL counts as a violation). The audit is
    ONE aggregate scan over the staged data regardless of rule count.

    Returns the audit report rows (tiny: one per rule).
    """
    import json
    import os
    import uuid

    from ..operators.expectations import rule_aggs, rule_report

    version = f"v-{uuid.uuid4().hex}"
    vdir = os.path.join(root, version)
    write(df, vdir, fmt)
    staged = read(spark, vdir, fmt)
    report = rule_report(
        staged.groupBy().agg(*rule_aggs(rules)), rules
    ).collect()
    if any(r["n_violations"] > 0 for r in report):
        raise AuditFailure(report)
    append_published(root, version)
    return report


def append_published(root: str, version: str) -> int:
    """Atomically append ``version`` to the ``_PUBLISHED`` pointer's
    history and swap the pointer to it; returns the new seq. The
    commit half of the WAP protocol, shared by table publishes
    (write_audit_publish) and index publishes (similarity
    publish_index).

    The pointer carries the full publish HISTORY (seq → version), so
    time travel (read_version) resolves past versions from the same
    atomically-swapped file — no separate log that could race the
    pointer; pre-history pointers load as an empty history.
    The read-modify-write of the history is serialized by an
    exclusive flock on a sidecar lock file: without it a concurrent
    publisher's history entry could be silently dropped and seq
    numbers could duplicate (each os.replace stays atomic either
    way, but atomic-last-wins is not enough once the pointer carries
    appended state). flock is advisory and per-filesystem — on a
    shared posix mount this is the whole story; an object store
    would need a CAS or catalog lock, which is exactly what Delta
    (LogStore) and Iceberg (catalog) add at this seam."""
    import fcntl
    import json
    import os
    import uuid

    ptr = os.path.join(root, "_PUBLISHED")
    lock_path = os.path.join(root, "._PUBLISHED.lock")
    with open(lock_path, "a+") as lock_fh:
        fcntl.flock(lock_fh, fcntl.LOCK_EX)
        history: list = []
        if os.path.exists(ptr):
            with open(ptr) as fh:
                prev = json.load(fh)
            history = list(prev.get("history", []))
            if not history and "version" in prev:
                history = [{"seq": 1, "version": prev["version"]}]
        seq = (history[-1]["seq"] + 1) if history else 1
        history.append({"seq": seq, "version": version})
        # unique tmp suffix so a crashed publisher's leftover tmp can
        # never be half-written into by a later one; os.replace keeps
        # the pointer swap itself atomic for readers
        tmp = os.path.join(root, f"._PUBLISHED.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {"version": version, "seq": seq, "history": history}, fh
            )
        os.replace(tmp, ptr)  # atomic publish
        # lock released by the with-block close (flock drops on close)
    return seq


def resolve_published(
    root: str, seq: int | None = None, version: str | None = None
) -> str:
    """Resolve a version name from the ``_PUBLISHED`` pointer: HEAD
    when neither seq nor version is given, else the history entry the
    1-based ``seq`` or explicit ``version`` tag names. Duplicate seqs
    (pre-lock pointers only) resolve latest-wins; unknown seq/version
    raises KeyError."""
    import json
    import os

    with open(os.path.join(root, "_PUBLISHED")) as fh:
        ptr = json.load(fh)
    if seq is None and version is None:
        return ptr["version"]
    history = ptr.get("history", [])
    if not history and "version" in ptr:
        history = [{"seq": 1, "version": ptr["version"]}]
    if seq is not None:
        match = [h["version"] for h in history if h["seq"] == seq][-1:]
    else:
        match = [h["version"] for h in history if h["version"] == version]
    if not match:
        raise KeyError(
            f"no published version with "
            f"{'seq ' + str(seq) if seq is not None else version!r}"
        )
    return match[0]


def read_published(spark: SparkSession, root: str, fmt: str = "parquet"):
    """Read the version the ``_PUBLISHED`` pointer names — staged or
    audit-failed versions are invisible (the reader contract of
    write_audit_publish)."""
    import json
    import os

    with open(os.path.join(root, "_PUBLISHED")) as fh:
        version = json.load(fh)["version"]
    return read(spark, os.path.join(root, version), fmt)


def read_version(
    spark: SparkSession,
    root: str,
    seq: int | None = None,
    version: str | None = None,
    fmt: str = "parquet",
):
    """Time travel over a write_audit_publish root: read the version the
    pointer's publish history records under ``seq`` (1-based publish
    order) or an explicit ``version`` tag — the as-of-version read that
    completes the WAP table-format family (overwrite / compact / GC /
    publish → time travel). Unknown seq/version raises ``KeyError``; a
    version the history names but ``gc_versions`` has since removed
    raises ``FileNotFoundError`` — travel is bounded by retention, as
    in every table format."""
    import json
    import os

    if (seq is None) == (version is None):
        raise ValueError("pass exactly one of seq / version")
    vdir = os.path.join(root, resolve_published(root, seq, version))
    if not os.path.isdir(vdir):
        raise FileNotFoundError(
            f"version {os.path.basename(vdir)} is in the history but its "
            f"data was garbage-collected (gc_versions retention)"
        )
    return read(spark, vdir, fmt)


def gc_staged(path: str, grace_seconds: float = 3600.0) -> list[str]:
    """Garbage-collect vote_sink staging: delete ``path/_staged`` files
    referenced by NO commit manifest (aborted/duplicate task attempts
    that never became visible) once older than ``grace_seconds`` — the
    grace window keeps in-flight batches safe (their files exist before
    their manifest does). Returns the deleted paths. The maintenance
    companion every two-phase-commit sink needs: without it, retries
    and speculative attempts accumulate invisible files forever."""
    import glob
    import json
    import os
    import time

    # realpath-normalize both sides: manifests may record the sink path
    # under a different spelling (trailing slash, relative vs absolute)
    # than the caller passes here, and raw string comparison would then
    # delete committed files after the grace window (advisor r5)
    committed: set[str] = set()
    for man in glob.glob(os.path.join(path, "_commits", "*.json")):
        with open(man) as fh:
            committed.update(
                os.path.realpath(f) for f in json.load(fh)["files"]
            )
    cutoff = time.time() - grace_seconds
    deleted = []
    for f in glob.glob(os.path.join(path, "_staged", "*")):
        if os.path.realpath(f) not in committed and os.path.getmtime(f) <= cutoff:
            os.remove(f)
            deleted.append(f)
    return deleted


def gc_versions(root: str, keep: int = 1) -> list[str]:
    """Garbage-collect write_audit_publish versions: remove version dirs
    that are neither the published one nor among the ``keep`` most
    recent others (quarantined audit failures, superseded loads).
    Returns the removed dirs. ``keep`` > 0 preserves a short undo
    window — the poor man's time travel the WAP layout makes safe,
    since readers only ever resolve the pointer."""
    import json
    import os
    import shutil

    with open(os.path.join(root, "_PUBLISHED")) as fh:
        published = json.load(fh)["version"]
    others = sorted(
        (
            d
            for d in os.listdir(root)
            if d.startswith("v-") and d != published
        ),
        key=lambda d: os.path.getmtime(os.path.join(root, d)),
        reverse=True,
    )
    removed = []
    for d in others[keep:]:
        shutil.rmtree(os.path.join(root, d))
        removed.append(os.path.join(root, d))
    return removed
