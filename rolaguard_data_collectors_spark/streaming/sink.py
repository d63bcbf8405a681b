"""Sinks (SURVEY.md §2A ops 7-9): the packet-queue envelope sink, the
status/error side-output, and the JDBC row sink.

The reference publishes one JSON envelope per packet to RabbitMQ
(``{'packet': ..., 'messages': [...], 'ts': epoch}``,
BaseCollector.py:55-56, PacketPersistence.py:27-53, Publisher.py:112-123)
with at-least-once delivery. Here the envelope is built with
``to_json(struct(...))`` and written by ``foreachBatch``; pairing the
epoch id with a commit log makes the file sink exactly-once — stronger
than the reference, whose publisher silently drops messages while its
channel is closed (Publisher.py:113-114, a bug we do not replicate).

Scale note: ``foreachBatch`` hands the whole micro-batch DataFrame to
the writer; per-partition producers (``df.foreachPartition``) fan the
publish out across executors, so sink throughput scales with
partitions, not with a single driver-side connection like the
reference's one-publisher-thread-per-collector design.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import PACKET_COLUMNS

RAW_MESSAGE_CAP = 4096  # TTNCollector.py:218, TTNv3Collector.py:246


def to_envelope_json(packets: DataFrame) -> DataFrame:
    """Normalized packet rows (+ passthrough ``_raw_topic``,
    ``_raw_value``) -> one JSON envelope string per packet, exactly the
    reference's packet_writter_message shape."""
    cols = set(packets.columns)
    topic = F.col("_raw_topic") if "_raw_topic" in cols else F.col("topic")
    raw = F.col("_raw_value") if "_raw_value" in cols else F.lit(None).cast("string")
    envelope = F.struct(
        F.struct(*[F.col(c) for c in PACKET_COLUMNS]).alias("packet"),
        F.array(
            F.struct(
                topic.alias("topic"),
                F.substring(raw, 1, RAW_MESSAGE_CAP).alias("message"),
                F.col("data_collector_id").alias("data_collector_id"),
            )
        ).alias("messages"),
        F.unix_timestamp().cast("long").alias("ts"),  # PacketPersistence.py:35
    )
    return packets.select(
        F.col("data_collector_id").alias("collector_id"),
        F.to_json(envelope).alias("envelope"),
    )


class QueueFileSink:
    """File-backed stand-in for the RabbitMQ ``collectors_queue``: one
    JSON line per envelope, with a per-epoch commit log giving
    exactly-once across query restarts (a replayed epoch is skipped).

    In production the same ``foreachBatch`` body publishes to RabbitMQ/
    Kafka per partition; the commit-log pattern is the standard
    idempotent-sink recipe for non-transactional targets.
    """

    def __init__(self, out_path: str):
        self.out_path = out_path
        self.commit_path = out_path + ".commits"

    def _committed(self) -> set[int]:
        if not os.path.exists(self.commit_path):
            return set()
        with open(self.commit_path, encoding="utf-8") as fh:
            return {int(line) for line in fh if line.strip()}

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id in self._committed():
            return  # replayed micro-batch: already published
        rows = batch_df.collect()  # envelopes are small JSON strings
        with open(self.out_path, "a", encoding="utf-8") as fh:
            for r in rows:
                fh.write(r["envelope"] + "\n")
        with open(self.commit_path, "a", encoding="utf-8") as fh:
            fh.write(f"{epoch_id}\n")


def start_envelope_queue_sink(
    packets: DataFrame, out_path: str, checkpoint: str, trigger_seconds: int = 1
):
    """writeStream wiring for the packet queue: 1 s micro-batches match
    the reference publisher's 1 s drain loop (Publisher.py:99-104)."""
    return (
        to_envelope_json(packets)
        .writeStream.outputMode("append")
        .foreachBatch(QueueFileSink(out_path))
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def split_errors(packets: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Op 32/8: rows with a parse error still persist, but also feed
    the FAILED_PARSING side-output (PhyParser.py:10-12,
    PacketPersistence.py:63-70)."""
    errors = packets.filter(F.col("error").isNotNull()).select(
        F.col("data_collector_id"),
        F.lit("FAILED_PARSING").alias("type"),
        F.col("error").alias("message"),
    )
    return packets, errors


def write_packets_jdbc(
    batch_df: DataFrame, url: str, table: str, properties: dict | None = None
) -> None:
    """Op 9 (PacketPersistence.py:12-15, Service.py:5-47): the disabled
    Postgres row sink, as a foreachBatch body."""
    batch_df.select(*PACKET_COLUMNS).write.mode("append").jdbc(
        url, table, properties=properties or {}
    )
