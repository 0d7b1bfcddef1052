"""Custom connector via the Python DataSource API (Spark 4).

The reference's only "connector" is a driver-side pandas generator loaded
through the warehouse API (`/root/reference/data_gen/
generate_and_load_script.py:174-193`). A Spark-native engine instead makes
generation/ingestion a *source*: partitioned, executor-side, plannable.
This module implements that generator as a registered DataSource —
`spark.read.format("synth_events")` — demonstrating the public extension
point any bespoke feed (internal API, message log, proprietary format)
plugs into.

Scale: the driver only plans partition descriptors (one small object per
split); each executor generates/reads its slice independently — the same
contract a real connector uses for HDFS splits or Kafka offset ranges.
Determinism: rows derive from (partition_id, row_id) hashes only, so any
retry or speculative task regenerates identical data.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

SCHEMA_DDL = "event_id bigint, user_id bigint, event_type string, value double"
EVENT_TYPES = ("view", "click", "purchase", "error")


def _h(x: int) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)


class _SynthPartition(InputPartition):
    def __init__(self, pid: int, start: int, end: int):
        self.pid, self.start, self.end = pid, start, end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "4"))
        self.n_users = int(options.get("users", "50"))

    def partitions(self):
        per = -(-self.n_rows // self.n_parts)  # ceil
        return [
            _SynthPartition(i, i * per, min((i + 1) * per, self.n_rows))
            for i in range(self.n_parts)
            if i * per < self.n_rows
        ]

    def read(self, partition: _SynthPartition):
        for rid in range(partition.start, partition.end):
            h = _h(rid)
            yield (
                rid,
                h % self.n_users,
                EVENT_TYPES[(h >> 8) % len(EVENT_TYPES)],
                round((h % 100000) / 100.0, 2),
            )


class SynthEventsSource(DataSource):
    """spark.read.format("synth_events").option("rows", N).load()"""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema) -> SynthEventsReader:
        return SynthEventsReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(SynthEventsSource)
