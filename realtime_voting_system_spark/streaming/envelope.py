"""Kafka-style JSON envelope (SURVEY §2.1 S2-S4, §2.8 F9).

The reference produces JSON messages keyed by record id
(reference/src/data_generator.py:151-157 voters, :246-252 votes:
``producer.send(topic, key=vote_id, value=json.dumps(vote))``). The engine's
equivalent is a (key STRING, value STRING) envelope built/parsed entirely
JVM-side (`to_json(struct(*))` / `from_json`) — one narrow projection each
way, no Python in the hot path.

The same envelope works over every transport: Kafka rows expose key/value
binary columns; file-based streams (used in tests — no broker in the test
environment) are JSON-lines files of ``{"key": ..., "value": "..."}``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

ENVELOPE = StructType(
    [StructField("key", StringType()), StructField("value", StringType())]
)


def to_envelope(df: DataFrame, key_col: str) -> DataFrame:
    """(key, value=json of ALL columns) — S2/S3's serialize step."""
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )


def parse_envelope(df: DataFrame, schema: StructType) -> DataFrame:
    """Typed columns out of the value JSON — S4's deserialize step.

    ``from_json`` is permissive: malformed JSON yields a NULL struct, which
    we keep as NULL-columned rows (the reference's consumer would crash;
    an engine must not). Filter on a non-null key column downstream.
    """
    return df.select(
        F.from_json(F.col("value").cast("string"), schema).alias("r")
    ).select("r.*")


def write_envelope_json(df: DataFrame, path: str, key_col: str) -> None:
    """Batch-write envelope rows as JSON-lines (the test transport)."""
    to_envelope(df, key_col).write.mode("append").json(path)


def read_envelope_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream of envelope JSON → typed rows (ST1).

    Source parallelism = #files (the analog of Kafka partitions,
    README.md:110-118 provisions 1 partition/topic; we do better by
    default). maxFilesPerTrigger bounds micro-batch size the way
    ``maxOffsetsPerTrigger`` does on Kafka.
    """
    reader = spark.readStream.schema(ENVELOPE)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return parse_envelope(reader.json(path), schema)


def kafka_reader_options(
    servers: str,
    topic: str,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool | None = None,
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """readStream.format("kafka") option map — the reference consumer's
    subscription (README.md:110-118: voters_topic / votes_topic, bootstrap
    broker:29092). Pure function so the wiring is unit-testable without a
    broker: ``subscribe`` (not assign — partition discovery stays dynamic),
    ``startingOffsets`` for replay-vs-tail, ``maxOffsetsPerTrigger`` to
    bound micro-batch size (the Kafka analog of maxFilesPerTrigger),
    ``failOnDataLoss=false`` for retention-expired replays."""
    opts = {
        "kafka.bootstrap.servers": servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if fail_on_data_loss is not None:
        opts["failOnDataLoss"] = "true" if fail_on_data_loss else "false"
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_writer_options(
    servers: str, topic: str, checkpoint: str
) -> dict[str, str]:
    """writeStream.format("kafka") option map (the output-topic side:
    aggregated_votes_per_candidate / aggregated_turnout_by_location,
    README.md:116,118). Exactly-once to the checkpoint; at-least-once into
    Kafka (standard sink semantics — consumers dedup on key)."""
    return {
        "kafka.bootstrap.servers": servers,
        "topic": topic,
        "checkpointLocation": checkpoint,
    }


def read_kafka_stream(
    spark: SparkSession,
    servers: str,
    topic: str,
    schema: StructType,
    starting_offsets: str = "latest",
    fail_on_data_loss: bool | None = None,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Kafka transport → typed rows (ST1/S4). Requires the
    spark-sql-kafka package on the classpath and a live broker — neither
    exists in the test environment, so execution is covered by the file
    transport (read_envelope_stream, same parse path) and the option
    wiring by tests/test_streaming.py::test_kafka_option_wiring."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        servers, topic, starting_offsets, fail_on_data_loss,
        max_offsets_per_trigger,
    ).items():
        reader = reader.option(k, v)
    return parse_envelope(reader.load(), schema)


def write_stream_to_kafka(
    df: DataFrame,
    key_col: str,
    servers: str,
    topic: str,
    checkpoint: str,
    output_mode: str = "update",
):
    """writeStream → Kafka topic via the envelope projection (to_envelope
    emits the key/value string columns the Kafka sink expects). Gated on
    broker availability like read_kafka_stream; the envelope itself is
    batch-tested in both directions."""
    writer = to_envelope(df, key_col).writeStream.format("kafka")
    for k, v in kafka_writer_options(servers, topic, checkpoint).items():
        writer = writer.option(k, v)
    return writer.outputMode(output_mode).start()


def parse_envelope_quarantined(df: DataFrame, schema: StructType, key_field: str):
    """ST18: parse with a quarantine lane — the engine-side analog of the
    reference's insert-failure rollback (data_generator.py:255-258): a
    malformed value must neither crash the consumer nor silently become
    an all-NULL row that poisons downstream aggregates.

    Returns ``(parsed, quarantined)``: rows whose JSON parses AND carry a
    non-null ``key_field`` flow typed into ``parsed``; everything else
    lands in ``quarantined`` with the RAW key/value preserved for replay
    or inspection (quarantine-then-replay is the operational contract —
    dropping the bytes would make the failure unrecoverable).

    Both lanes are stateless projections/filters of the same scan, so the
    split works identically on a stream (each lane gets its own sink) and
    in batch (pytest asserts the lanes partition the input exactly).
    """
    raw = df.select(
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    parsed_struct = F.from_json(F.col("value"), schema)
    tagged = raw.withColumn("r", parsed_struct)
    ok = tagged.filter(F.col(f"r.{key_field}").isNotNull())
    bad = tagged.filter(F.col(f"r.{key_field}").isNull()).select(
        "key", "value"
    )
    return ok.select("r.*"), bad
