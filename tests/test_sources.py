"""IO round-trips (S1/S7), geo layer (S6/J6), and constraint operators
(§1.4) — each vs an explicit expectation or a DuckDB oracle on the same
files."""

from __future__ import annotations

from datetime import datetime

import duckdb
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from realtime_voting_system_spark.operators import integrity
from realtime_voting_system_spark.sources import generator, geo, io as rio


def _sample(spark):
    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("ts", TimestampType()),
        ]
    )
    rows = [
        (1, "alpha", datetime(2024, 11, 5, 8, 0)),
        (2, "beta", datetime(2024, 11, 5, 9, 30)),
        (3, None, datetime(2024, 11, 5, 10, 15)),
    ]
    return spark.createDataFrame(rows, schema), schema


def test_io_roundtrip_all_formats(spark, tmp_path):
    df, schema = _sample(spark)
    for fmt in ("parquet", "csv", "json"):
        path = str(tmp_path / fmt)
        rio.write(df, path, fmt=fmt)
        back = rio.read(spark, path, fmt=fmt, schema=schema)
        assert sorted(back.collect()) == sorted(df.collect()), fmt


def test_io_partitioned_write_prunes(spark, tmp_path):
    df, _ = _sample(spark)
    path = str(tmp_path / "byname")
    rio.write(df.filter(F.col("name").isNotNull()), path, partition_by=("name",))
    back = spark.read.parquet(path)
    plan = back.filter(F.col("name") == "alpha")._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 2
    # partition filter must prune at scan, not post-filter
    assert "PartitionFilters: [isnotnull(name" in plan


def test_export_csv_matches_source(spark, tmp_path):
    df, schema = _sample(spark)
    path = str(tmp_path / "export")
    rio.export_csv(df, path)
    back = rio.read(spark, path, fmt="csv", schema=schema)
    assert sorted(back.collect()) == sorted(df.collect())


def test_geo_merge_keeps_all_states(spark):
    star = generator.generate_star(spark, n_voters=300, seed=21)
    votes_by_state = (
        star["vote"]
        .join(star["voter"], "voter_id")
        .groupBy("address_state")
        .agg(F.count("*").alias("vote_count"))
    )
    merged = geo.merge_votes_geo(geo.us_states(spark), votes_by_state)
    assert merged.count() == 50  # LEFT join: every state survives (J6)
    total_merged = merged.agg(F.sum("vote_count")).collect()[0][0]
    assert total_merged == star["vote"].count()
    zero_states = merged.filter(F.col("vote_count") == 0).count()
    covered = votes_by_state.count()
    assert zero_states == 50 - covered


def test_geo_merge_matches_duckdb(spark, tmp_path):
    star = generator.generate_star(spark, n_voters=300, seed=22)
    votes_by_state = (
        star["vote"]
        .join(star["voter"], "voter_id")
        .groupBy("address_state")
        .agg(F.count("*").alias("vote_count"))
    )
    vpath, spath = str(tmp_path / "v.parquet"), str(tmp_path / "s.parquet")
    votes_by_state.coalesce(1).write.parquet(vpath)
    geo.us_states(spark).coalesce(1).write.parquet(spath)
    got = {
        (r["state_name"], r["vote_count"])
        for r in geo.merge_votes_geo(
            spark.read.parquet(spath), spark.read.parquet(vpath)
        ).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.sql(
            f"""
            SELECT s.state_name, COALESCE(v.vote_count, 0) AS vote_count
            FROM '{spath}/*.parquet' s
            LEFT JOIN '{vpath}/*.parquet' v
              ON s.state_name = v.address_state
            """
        ).fetchall()
    }
    assert got == want


def test_geojson_feature_read(spark, tmp_path):
    import json

    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"name": "Ohio", "abbr": "OH"},
                "geometry": {"type": "Point", "coordinates": [-82.9, 40.4]},
            },
            {
                "type": "Feature",
                "properties": {"name": "Texas", "abbr": "TX"},
                "geometry": {"type": "Point", "coordinates": [-99.9, 31.9]},
            },
        ],
    }
    p = tmp_path / "states.geojson"
    p.write_text(json.dumps(fc))
    df = geo.load_geojson_features(
        spark, str(p), {"state_name": "name", "state_abbr": "abbr"}
    )
    rows = {(r["state_name"], r["state_abbr"]) for r in df.collect()}
    assert rows == {("Ohio", "OH"), ("Texas", "TX")}
    assert df.filter(F.col("geometry_json").contains("Point")).count() == 2


# --- integrity -------------------------------------------------------------


def _dup_votes(spark):
    rows = [
        ("v1", "A", "c1", datetime(2024, 11, 5, 8, 0)),
        ("v2", "A", "c2", datetime(2024, 11, 5, 9, 0)),  # dup voter, later
        ("v3", "B", "c1", datetime(2024, 11, 5, 8, 30)),
        ("v4", "C", "cX", datetime(2024, 11, 5, 8, 45)),  # orphan candidate
    ]
    schema = StructType(
        [
            StructField("vote_id", StringType()),
            StructField("voter_id", StringType()),
            StructField("candidate_id", StringType()),
            StructField("voted_at", TimestampType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_dedup_on_key_first_wins(spark):
    votes = _dup_votes(spark)
    kept = integrity.dedup_on_key(votes, ["voter_id"], order_by="voted_at")
    got = {r["voter_id"]: r["vote_id"] for r in kept.collect()}
    assert got == {"A": "v1", "B": "v3", "C": "v4"}


def test_unique_violations(spark):
    votes = _dup_votes(spark)
    v = integrity.unique_violations(votes, ["voter_id"]).collect()
    assert [(r["voter_id"], r["n_rows"]) for r in v] == [("A", 2)]


def test_fk_violations_and_enforce(spark):
    votes = _dup_votes(spark)
    cands = spark.createDataFrame(
        [("c1",), ("c2",)], StructType([StructField("candidate_id", StringType())])
    )
    orphans = integrity.fk_violations(votes, cands, "candidate_id")
    assert [r["vote_id"] for r in orphans.collect()] == ["v4"]
    clean = integrity.enforce_fk(votes, cands, "candidate_id")
    assert {r["vote_id"] for r in clean.collect()} == {"v1", "v2", "v3"}


def test_generated_star_is_consistent(spark):
    """The §1.4 constraints hold on generator output (the analog of the
    reference's verify_setup smoke check)."""
    star = generator.generate_star(spark, n_voters=400, seed=31)
    assert integrity.unique_violations(star["vote"], ["voter_id"]).count() == 0
    assert (
        integrity.unique_violations(star["voter"], ["registration_number"]).count()
        == 0
    )
    assert integrity.fk_violations(star["vote"], star["voter"], "voter_id").count() == 0
    assert (
        integrity.fk_violations(
            star["vote"], star["candidate"], "candidate_id"
        ).count()
        == 0
    )


# ---------------------------------------------------------------------------
# JDBC option wiring (S1's Postgres-scan half — no live DB in this env,
# so the pure option builder carries the contract)
# ---------------------------------------------------------------------------


def test_jdbc_options_table_mode():
    opts = rio.jdbc_options(
        "jdbc:postgresql://db:5432/voting",
        table="votes",
        user="u",
        password="p",
        driver="org.postgresql.Driver",
        fetch_size=10000,
    )
    assert opts == {
        "url": "jdbc:postgresql://db:5432/voting",
        "dbtable": "votes",
        "user": "u",
        "password": "p",
        "driver": "org.postgresql.Driver",
        "fetchsize": "10000",
    }


def test_jdbc_options_partitioned_scan():
    opts = rio.jdbc_options(
        "jdbc:postgresql://db/voting",
        table="votes",
        partition_column="id",
        lower_bound=0,
        upper_bound=1_000_000,
        num_partitions=32,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"


def test_jdbc_options_rejects_bad_combinations():
    import pytest

    with pytest.raises(ValueError):
        rio.jdbc_options("jdbc:x")  # neither table nor query
    with pytest.raises(ValueError):
        rio.jdbc_options("jdbc:x", table="t", query="SELECT 1")  # both
    with pytest.raises(ValueError):
        rio.jdbc_options("jdbc:x", table="t", partition_column="id")  # partial
    with pytest.raises(ValueError):
        rio.jdbc_options(  # query + partitioning is a Spark error
            "jdbc:x", query="SELECT 1", partition_column="id",
            lower_bound=0, upper_bound=1, num_partitions=2,
        )


def test_voters_uuid_variant(spark):
    """F10: uuid() ids are well-formed v4 and unique; the deterministic
    default is unchanged for oracle replay."""
    import re

    rows = generator.voters(spark, n=200, uuid_ids=True).select(
        "voter_id"
    ).collect()
    ids = [r.voter_id for r in rows]
    assert len(set(ids)) == 200
    pat = re.compile(
        r"^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"
    )
    assert all(pat.match(i) for i in ids), ids[:3]
    det = generator.voters(spark, n=3).select("voter_id").collect()
    assert [r.voter_id for r in det] == [
        "voter-0000000000", "voter-0000000001", "voter-0000000002"
    ]


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC sink/source (built into Spark, columnar + self-describing like
    parquet) — write/read must preserve rows and schema."""
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    path = str(tmp_path / "nation.orc")
    rio.write(nation, path, fmt="orc")
    back = rio.read(spark, path, fmt="orc")
    assert back.schema == nation.schema
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, nation.collect())
    )


def test_compact_reduces_file_count(spark, tmp_path):
    import os

    src, out = str(tmp_path / "many"), str(tmp_path / "compacted")
    df = spark.range(0, 10000).withColumnRenamed("id", "k")
    df.repartition(24).write.parquet(src)
    n_before = sum(
        1 for f in os.listdir(src) if f.endswith(".parquet")
    )
    n_parts = rio.compact(spark, src, out, target_file_mb=128)
    n_after = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_before == 24 and n_parts == 1 and n_after == 1
    assert spark.read.parquet(out).count() == 10000


def test_read_text_corpus_deterministic_ids(spark, tmp_path):
    """File mode: one doc per file, same ids on re-read; line mode: one
    doc per line with unique content-addressed ids, stable across reads
    and partitioning."""
    import os

    d = tmp_path / "corpus"
    os.makedirs(d)
    (d / "a.txt").write_text("hello world\nhello world\nsecond line\n")
    (d / "b.txt").write_text("another document body\n")

    whole1 = rio.read_text_corpus(spark, str(d)).collect()
    whole2 = rio.read_text_corpus(spark, str(d)).collect()
    assert len(whole1) == 2
    assert {(r.doc_id, r.text) for r in whole1} == {
        (r.doc_id, r.text) for r in whole2
    }
    assert all(r.doc_id >= 0 for r in whole1)

    lines1 = rio.read_text_corpus(spark, str(d), whole_files=False).collect()
    lines2 = rio.read_text_corpus(spark, str(d), whole_files=False).collect()
    assert len(lines1) == 4
    assert len({r.doc_id for r in lines1}) == 4  # dup lines get distinct ids
    assert {(r.doc_id, r.text) for r in lines1} == {
        (r.doc_id, r.text) for r in lines2
    }


# ---------------------------------------------------------------------------
# write_partitioned — dynamic partition overwrite (X129)
# ---------------------------------------------------------------------------


def test_dynamic_partition_overwrite_replaces_only_present_partitions(
    spark, tmp_path
):
    """Re-loading one day must rewrite THAT day and leave other days
    untouched — the idempotent daily-load contract. Static overwrite
    would truncate the whole table (also asserted, as the trap)."""
    p = str(tmp_path / "fact")
    day1 = [(1, "2024-01-01"), (2, "2024-01-01")]
    day2 = [(3, "2024-01-02")]
    df = spark.createDataFrame(day1 + day2, "id long, dt string")
    rio.write_partitioned(df, p, ["dt"])
    # reload day 2 with corrected data
    fix = spark.createDataFrame([(30, "2024-01-02")], "id long, dt string")
    rio.write_partitioned(fix, p, ["dt"])
    # partition-column values are type-inferred on read (string → date)
    got = {(r.id, str(r.dt)) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "2024-01-01"), (2, "2024-01-01"), (30, "2024-01-02")}
    # the session conf is restored afterwards (no cross-query leakage)
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        != "dynamic"
    )
    # static overwrite, for contrast, drops day 1
    rio.write_partitioned(fix, p, ["dt"], dynamic=False)
    got2 = {(r.id, str(r.dt)) for r in spark.read.parquet(p).collect()}
    assert got2 == {(30, "2024-01-02")}


def test_schema_evolution_merge_and_union(spark, tmp_path):
    """X130: mergeSchema surfaces late-added columns as NULL for old
    files; union_evolved aligns by name where positional union would
    mismatch."""
    p = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v1.write.parquet(p + "/gen=1")
    v2 = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    )
    v2.write.parquet(p + "/gen=2")
    merged = rio.read_merged_schema(spark, p)
    assert set(merged.columns) >= {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[1] is None and rows[2] == 0.5
    u = rio.union_evolved(v1, v2)
    assert set(u.columns) == {"id", "name", "score"}
    got = {(r.id, r.name, r.score) for r in u.collect()}
    assert got == {(1, "a", None), (2, "b", 0.5)}


def test_write_audit_publish_versions_and_pointer(spark, sf_dir, tmp_path):
    """WAP mechanics: a passing audit flips the pointer; a failing audit
    leaves the pointer AND the previous version readable; every staged
    version dir is immutable on disk (old readers unaffected)."""
    import json
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_voting_system_spark.sources.io import (
        AuditFailure,
        read_published,
        write_audit_publish,
    )

    root = str(tmp_path / "wap")
    os.makedirs(root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    report = write_audit_publish(
        spark, ev, root, rules=[("id_present", "event_id IS NOT NULL")]
    )
    assert all(r["n_violations"] == 0 for r in report)
    with open(os.path.join(root, "_PUBLISHED")) as fh:
        v1 = json.load(fh)["version"]
    n_full = ev.count()
    assert read_published(spark, root).count() == n_full

    # failing audit: report names the rule, pointer must not move
    with _pytest.raises(AuditFailure) as exc:
        write_audit_publish(
            spark,
            ev.filter(F.col("event_id") % 2 == 0),
            root,
            rules=[("impossible", "value > 1e300")],
        )
    assert "impossible" in str(exc.value)
    with open(os.path.join(root, "_PUBLISHED")) as fh:
        assert json.load(fh)["version"] == v1
    assert read_published(spark, root).count() == n_full
    # both version dirs exist: published + quarantined-staged
    vdirs = [d for d in os.listdir(root) if d.startswith("v-")]
    assert len(vdirs) == 2


def test_gc_staged_removes_only_unreferenced_after_grace(spark, tmp_path):
    """Sink GC: uncommitted staged files older than the grace window are
    removed; committed files and fresh files survive."""
    import json
    import os
    import time

    from realtime_voting_system_spark.sources.io import gc_staged

    root = str(tmp_path / "sink")
    staged = os.path.join(root, "_staged")
    commits = os.path.join(root, "_commits")
    os.makedirs(staged)
    os.makedirs(commits)
    committed = os.path.join(staged, "part-committed.jsonl")
    orphan_old = os.path.join(staged, "part-orphan-old.jsonl")
    orphan_new = os.path.join(staged, "part-orphan-new.jsonl")
    for f in (committed, orphan_old, orphan_new):
        with open(f, "w") as fh:
            fh.write("{}\n")
    with open(os.path.join(commits, "0.json"), "w") as fh:
        json.dump({"batchId": 0, "files": [committed]}, fh)
    old = time.time() - 7200
    os.utime(committed, (old, old))  # committed: old but referenced
    os.utime(orphan_old, (old, old))  # orphan past grace: collected
    deleted = gc_staged(root, grace_seconds=3600)
    assert deleted == [orphan_old]
    assert os.path.exists(committed) and os.path.exists(orphan_new)
    assert not os.path.exists(orphan_old)


def test_gc_versions_keeps_published_and_recent(spark, sf_dir, tmp_path):
    """WAP GC: the published version always survives; older non-published
    versions beyond `keep` are removed; read_published still works."""
    import os

    from pyspark.sql import functions as F

    from realtime_voting_system_spark.sources.io import (
        AuditFailure,
        gc_versions,
        read_published,
        write_audit_publish,
    )

    root = str(tmp_path / "wap")
    os.makedirs(root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    write_audit_publish(spark, ev, root, rules=[("t", "1 = 1")])
    # two quarantined audit failures pile up
    for _ in range(2):
        try:
            write_audit_publish(
                spark, ev.filter(F.col("event_id") % 2 == 0), root,
                rules=[("impossible", "value > 1e300")],
            )
        except AuditFailure:
            pass
    n = ev.count()
    assert read_published(spark, root).count() == n
    removed = gc_versions(root, keep=1)
    assert len(removed) == 1  # 2 quarantined - 1 kept
    vdirs = [d for d in os.listdir(root) if d.startswith("v-")]
    assert len(vdirs) == 2  # published + 1 kept
    assert read_published(spark, root).count() == n


def test_read_version_time_travel_and_isolation(spark, sf_dir, tmp_path):
    """s16 mechanics: the pointer carries the publish history; seq/tag
    resolution returns EXACTLY the pinned version's rows after later
    publishes (pointer isolation); unknown seq raises KeyError; a
    GC'd-but-remembered version raises FileNotFoundError; a failed
    audit appends nothing to the history."""
    import json
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from realtime_voting_system_spark.sources.io import (
        AuditFailure,
        gc_versions,
        read_published,
        read_version,
        write_audit_publish,
    )

    root = str(tmp_path / "wap_tt")
    os.makedirs(root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "value"
    )
    v1_rows = ev.filter(F.col("event_id") % 3 == 0)
    rules = [("id_present", "event_id IS NOT NULL")]
    write_audit_publish(spark, v1_rows, root, rules=rules)
    n1 = v1_rows.count()
    # a failed audit must not enter the history
    try:
        write_audit_publish(
            spark, ev, root, rules=[("impossible", "value > 1e300")]
        )
    except AuditFailure:
        pass
    write_audit_publish(spark, ev, root, rules=rules)
    with open(os.path.join(root, "_PUBLISHED")) as fh:
        ptr = json.load(fh)
    assert ptr["seq"] == 2
    assert [h["seq"] for h in ptr["history"]] == [1, 2]
    # pointer isolation: the as-of read is v1's rows, HEAD is v2's
    assert read_version(spark, root, seq=1).count() == n1
    assert read_version(
        spark, root, version=ptr["history"][0]["version"]
    ).count() == n1
    assert read_published(spark, root).count() == ev.count()
    with _pytest.raises(KeyError):
        read_version(spark, root, seq=99)
    with _pytest.raises(ValueError):
        read_version(spark, root)
    # GC the non-published version (keep=0): history still names it,
    # but travel is bounded by retention
    removed = gc_versions(root, keep=0)
    assert any(ptr["history"][0]["version"] in r for r in removed)
    with _pytest.raises(FileNotFoundError):
        read_version(spark, root, seq=1)
    assert read_published(spark, root).count() == ev.count()


def test_concurrent_publish_history_serialized(spark, sf_dir, tmp_path):
    """Advisor r10 (medium): the publish history is a read-modify-write
    on the pointer, serialized by an exclusive flock — N concurrent
    publishers must produce N history entries with unique consecutive
    seqs (before the lock, a racer's entry could be silently dropped
    and seqs could duplicate)."""
    import json
    import os
    import threading

    from realtime_voting_system_spark.sources.io import (
        write_audit_publish,
    )

    root = str(tmp_path / "wap_conc")
    os.makedirs(root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id"
    ).limit(10)
    errs: list = []

    def pub():
        try:
            write_audit_publish(
                spark, ev, root, rules=[("ok", "event_id IS NOT NULL")]
            )
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    threads = [threading.Thread(target=pub) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    with open(os.path.join(root, "_PUBLISHED")) as fh:
        ptr = json.load(fh)
    seqs = [h["seq"] for h in ptr["history"]]
    assert seqs == [1, 2, 3, 4]
    assert len({h["version"] for h in ptr["history"]}) == 4


def test_read_version_duplicate_seq_latest_wins(spark, sf_dir, tmp_path):
    """Pointers written before the publish lock can carry duplicate
    seqs; read_version must resolve them deterministically — the
    LATEST history entry wins (list order is publish order)."""
    import json
    import os

    from pyspark.sql import functions as F

    from realtime_voting_system_spark.sources.io import (
        read_version,
        write_audit_publish,
    )

    root = str(tmp_path / "wap_dupseq")
    os.makedirs(root)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    rules = [("ok", "event_id IS NOT NULL")]
    write_audit_publish(spark, a, root, rules=rules)
    write_audit_publish(spark, b, root, rules=rules)
    ptr_path = os.path.join(root, "_PUBLISHED")
    with open(ptr_path) as fh:
        ptr = json.load(fh)
    # simulate the pre-lock torn history: both entries claim seq 1
    ptr["history"] = [
        {"seq": 1, "version": ptr["history"][0]["version"]},
        {"seq": 1, "version": ptr["history"][1]["version"]},
    ]
    with open(ptr_path, "w") as fh:
        json.dump(ptr, fh)
    assert read_version(spark, root, seq=1).count() == b.count()
