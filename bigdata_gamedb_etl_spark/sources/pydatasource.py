"""Custom connector via the Python Data Source API (Spark 4).

When no JVM connector exists for a feed (an internal REST export, a
bespoke binary log, a vendor SDK), Spark 4 lets the connector live in
Python: a `DataSource` subclass declares schema + partitions, and each
partition's `read()` runs in an executor Python worker — planned and
parallelized like any scan (the DataFrame on top composes with joins,
aggregation, AQE, and the rest of the engine).

`SyntheticEventsDataSource` is the proof-of-plumbing instance: a
deterministic seedless event generator (values derive from the row id,
so every engine and every rerun produces identical rows) partitioned
into `num_partitions` independent splits — the shape any real
Python-backed connector takes.

Register once per session, then read:

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("num_partitions", 8)
          .option("rows_per_partition", 1000).load())
"""

from __future__ import annotations

import sys

from pyspark import cloudpickle
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Ship this module BY VALUE: the registered DataSource class is
# cloudpickled to executor Python workers, which inherit the DRIVER
# process's cwd — on a real harness launched outside /root/repo the
# reference-pickled class dies with ModuleNotFoundError at scan time
# (found by running the suite from /tmp, r10; same fix as
# operators/multimodal.py and streaming/windowed.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


class _Partition(InputPartition):
    def __init__(self, index: int, rows: int):
        self.index = index
        self.rows = rows


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.num_partitions = int(options.get("num_partitions", 4))
        self.rows_per_partition = int(options.get("rows_per_partition", 100))

    def partitions(self):
        return [
            _Partition(i, self.rows_per_partition) for i in range(self.num_partitions)
        ]

    def read(self, partition: _Partition):
        base = partition.index * partition.rows
        for i in range(partition.rows):
            event_id = base + i
            # all fields derive arithmetically from event_id: rerun- and
            # engine-deterministic, no RNG state
            yield (
                event_id,
                event_id % 997,
                _EVENT_TYPES[event_id % len(_EVENT_TYPES)],
                round((event_id * 7919 % 10_000) / 100.0, 2),
            )


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _Reader(self.options)
