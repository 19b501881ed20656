"""S6: the push-ingest stream as Structured Streaming.

Reference: Flask POST /index → mp.Queue → N forked workers that encode and
insert forever (indexingService.py:197-202, indexServiceContentSite.py:90-155,
265-268).  Semantics: unbounded, stateless per message, no watermark, payload
is pre-chunked (chunk_no defaults to 1, timestamp defaults to now,
:125-141).

Spark recast: ``readStream`` (file/kafka/rate source) → the SAME batch
transformations (validate → embed) → ``foreachBatch`` append, with
``checkpointLocation`` supplying exactly-once file-sink semantics in place of
the reference's at-most-once queue.  We deliberately add NO stateful
windows/watermarks the reference lacks (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..functions.udfs import embed_udf, validate_chunk_udf

# the reference's POST payload fields (indexServiceContentSite.py:104-155)
INGEST_SCHEMA = StructType(
    [
        StructField("content_site_name", StringType()),
        StructField("src_path", StringType()),
        StructField("content_path", StringType()),
        StructField("text_chunk", StringType()),
        StructField("chunk_no", IntegerType()),
        StructField("last_edit_date", TimestampType()),
        StructField("tags", StringType()),
        StructField("title", StringType()),
    ]
)


def transform_batch(df: DataFrame) -> DataFrame:
    """The per-message worker logic as one declarative chain: defaults
    (chunk_no=1, now()), T5 validation, batch embedding."""
    return (
        df.withColumn("chunk_no", F.coalesce(F.col("chunk_no"), F.lit(1)))
        .withColumn("last_edit_date", F.coalesce(F.col("last_edit_date"), F.current_timestamp()))
        .withColumn("text_chunk", validate_chunk_udf(F.col("text_chunk")))
        .withColumn("embedding", embed_udf(F.col("text_chunk")))
        .withColumn("vector_embedding_date", F.current_timestamp())
    )


def start_ingest_stream(
    spark: SparkSession,
    source_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """File-source variant (each JSON file = a burst of POSTs).  Returns the
    StreamingQuery; callers awaitTermination.  foreachBatch writes parquet —
    swap for an Iceberg append on a real catalog."""
    stream = (
        spark.readStream.schema(INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        transform_batch(batch_df).write.mode("append").parquet(sink_dir)

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_ingest_stream_socket(
    spark: SparkSession,
    host: str,
    port: int,
    sink_dir: str,
    checkpoint_dir: str,
):
    """Socket-source variant: one JSON document per line over TCP — the
    closest in-sandbox stand-in for the reference's HTTP POST push queue
    (indexingService.py:197-202): a network listener feeding the same
    validate→embed→append chain.  At-most-once on the source side (socket
    has no replay), exactly-once from foreachBatch+checkpoint onward —
    matching the reference's mp.Queue semantics."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    parsed = raw.select(F.from_json(F.col("value"), INGEST_SCHEMA).alias("m")).select("m.*")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        transform_batch(batch_df).write.mode("append").parquet(sink_dir)

    return (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def start_ingest_stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    sink_dir: str,
    checkpoint_dir: str,
    starting_offsets: str = "latest",
):
    """Kafka-source variant — the production shape of the push stream (the
    reference's Flask POST endpoint becomes a Kafka producer; this is the
    consumer side).  Requires the ``spark-sql-kafka-0-10`` package on the
    classpath (``spark-submit --packages
    org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``) — absent in
    this sandbox, so constructing the reader raises AnalysisException at
    ``load()``; the code path itself is the deliverable and is exercised by
    the socket twin above (identical parse→transform→sink chain)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), INGEST_SCHEMA).alias("m")
    ).select("m.*")

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        transform_batch(batch_df).write.mode("append").parquet(sink_dir)

    return (
        parsed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
