"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource`) — the
user-defined source surface, exercised end to end.

Why it matters for this engine: the reference's inputs arrive through
whatever transport a deployment has (queues, APIs, proprietary
formats); Spark 4's Python DataSource API is the sanctioned way to
mount such a feed as a PLANNED, PARTITIONED scan — each
``InputPartition`` becomes one task, rows stream out of a generator
(Arrow-batched by the runtime), and the rest of the engine composes
on top unchanged. This module proves the plumbing with a
deterministic synthetic source whose rows are a pure function of the
row id via the repo's portable md5 device — so the DuckDB oracle can
replay the ENTIRE source and the gate hash-matches actual read
results, not just shapes.

Scale notes: ``partitions`` controls task parallelism exactly like
file splits; the generator yields per row but the runtime batches to
Arrow, so the per-row Python cost is the source's own (this source is
for plumbing-verification and tests — a production feed would do I/O
here). No driver-side materialization anywhere.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)


def _bucket(i: int, width: int) -> int:
    """Portable row derivation: first 8 md5 hex chars of the decimal
    id, mod width — DuckDB twin:
    ``('0x' || substr(md5(cast(i as varchar)), 1, 8))::BIGINT % width``.
    """
    h = int(hashlib.md5(str(i).encode("ascii")).hexdigest()[:8], 16)
    return h % width


class _Part(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SynthReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", "1000"))
        self.parts = max(1, int(options.get("partitions", "4")))
        self.width = int(options.get("width", "1000"))

    def partitions(self):
        step = (self.n + self.parts - 1) // self.parts
        return [
            _Part(s, min(s + step, self.n))
            for s in range(0, self.n, step)
        ]

    def read(self, partition: _Part):
        for i in range(partition.start, partition.end):
            yield (i, _bucket(i, self.width))


class SynthBucketDataSource(DataSource):
    """``spark.read.format("feat_synth").option("n", ...).load()`` —
    rows ``(id, bucket)`` with ``bucket = md5_long32(str(id)) %
    width``; options: ``n`` rows, ``partitions`` splits, ``width``
    bucket domain."""

    @classmethod
    def name(cls) -> str:
        return "feat_synth"

    def schema(self) -> str:
        return "id bigint, bucket bigint"

    def reader(self, schema):
        return _SynthReader(self.options)


def register(spark) -> None:
    """Idempotently register the source with this session."""
    spark.dataSource.register(SynthBucketDataSource)
