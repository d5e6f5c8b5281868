"""A true message-bus notification source (reference S1,
``ReadFromPubSub`` main.py:446-449) as a PLUGGABLE Spark data source via
the Python Data Source API (Spark 4) — not a file-source subsumption.

The bus is modeled as an append-only log directory: each message is one
JSON line ``{"uri": ..., "ts": ...}`` in a lexically-ordered file (the
shape of a Pub/Sub-Lite / Kafka-file-export bus). The stream reader
tracks a CONSUMED-MESSAGE OFFSET checkpointed by Spark, so restarts
resume exactly where they left off; ``readBetweenOffsets`` replays a
committed range verbatim on recovery — at-least-once delivery with
offset-deterministic replay, which is exactly the contract
``dedup_within_watermark`` downstream is built for
(streaming/pipeline.py run_notification_stream).

A production deployment swaps the directory scan for its bus client;
offset dict shape and the read/replay split stay the same.

Register + use::

    spark.dataSource.register(NotificationBusDataSource)
    spark.readStream.format("notification_bus").option("path", log_dir).load()
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Tuple

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader


def _scan_messages(path: str) -> list[tuple[str, str]]:
    """All messages in log order: files sorted lexically, lines in file
    order. Returns (uri, ts_string) tuples."""
    out: list[tuple[str, str]] = []
    for fname in sorted(os.listdir(path)):
        if not fname.endswith(".jsonl"):
            continue
        with open(os.path.join(path, fname), "r", encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                msg = json.loads(line)
                out.append((msg["uri"], msg["ts"]))
    return out


class NotificationBusStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self.path = options["path"]

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        msgs = _scan_messages(self.path)
        new = msgs[start["index"]:]
        return iter(new), {"index": start["index"] + len(new)}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # recovery replay of a committed range — must return the SAME
        # messages the original read returned (the log is append-only,
        # so a slice by offset is deterministic)
        msgs = _scan_messages(self.path)
        return iter(msgs[start["index"]:end["index"]])


class NotificationBusDataSource(DataSource):
    """``format("notification_bus")`` — streaming source of
    (uri string, ts timestamp-as-string) notification messages."""

    @classmethod
    def name(cls) -> str:
        return "notification_bus"

    def schema(self) -> str:
        return "uri string, ts string"

    def simpleStreamReader(self, schema) -> NotificationBusStreamReader:
        return NotificationBusStreamReader(self.options)


def read_notification_bus(spark, log_dir: str):
    """Register (idempotent) + open the bus stream with ``ts`` cast to a
    proper timestamp — ready for ``run_notification_stream``."""
    from pyspark.sql import functions as F

    spark.dataSource.register(NotificationBusDataSource)
    raw = spark.readStream.format("notification_bus").option(
        "path", log_dir
    ).load()
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))
