"""Custom external data source via the Python DataSource V2 API — the
Spark-native equivalent of the reference's generic external-scan surface:

  * DataSourceScanNode + ExternalDataSource API with prepare/open/getNext/
    close and predicate-pushdown offers
    (be/src/exec/data-source-scan-node.cc:362;
     ext-data-source/api/.../v1/ExternalDataSource.java:27-59)

This implementation is a deterministic synthetic-documents generator with:
  * partitioned reads (InputPartition per shard — the splits the reference's
    scheduler would assign to backends),
  * filter pushdown (`pushFilters` accepts EqualTo/GreaterThan/LessThan on
    doc_id, mirroring the reference API's accepted-conjuncts protocol: the
    source reports which filters it consumed; Spark re-applies the rest).

Register with spark.dataSource.register(SyntheticDocsDataSource), then
spark.read.format("synthetic_docs").option("n_docs", ...).load().
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_WORDS = (
    "spark scan join filter agg sort merge hash batch stream row column "
    "table query data key value group window part order line customer"
).split()


@dataclass
class _Shard(InputPartition):
    start: int
    end: int  # exclusive


def _doc_text(doc_id: int) -> str:
    """Deterministic word-soup text for doc_id (md5-seeded)."""
    h = hashlib.md5(f"doc{doc_id}".encode()).digest()
    n = 20 + h[0] % 30
    out = []
    for i in range(n):
        hh = hashlib.md5(f"doc{doc_id}w{i}".encode()).digest()
        out.append(_WORDS[hh[0] % len(_WORDS)])
    return " ".join(out)


class SyntheticDocsReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_shards = int(options.get("n_shards", 8))
        self.lo = 0
        self.hi = self.n_docs  # exclusive

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume range predicates on doc_id; yield back what we can't
        handle (Spark re-applies those above the scan) — the same
        accepted-conjuncts contract as the reference's ExternalDataSource
        prepare() call."""
        for f in filters:
            handled = False
            if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)):
                (col,) = f.attribute
                if col == "doc_id" and isinstance(f.value, int):
                    v = f.value
                    if isinstance(f, EqualTo):
                        self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                    elif isinstance(f, GreaterThan):
                        self.lo = max(self.lo, v + 1)
                    elif isinstance(f, GreaterThanOrEqual):
                        self.lo = max(self.lo, v)
                    elif isinstance(f, LessThan):
                        self.hi = min(self.hi, v)
                    elif isinstance(f, LessThanOrEqual):
                        self.hi = min(self.hi, v + 1)
                    handled = True
            elif isinstance(f, IsNotNull):
                handled = True  # nothing is null here
            if not handled:
                yield f

    def partitions(self) -> list[_Shard]:
        span = max(1, (self.hi - self.lo + self.n_shards - 1) // self.n_shards)
        return [
            _Shard(s, min(s + span, self.hi))
            for s in range(self.lo, self.hi, span)
        ] or [_Shard(0, 0)]

    def read(self, partition: _Shard):
        for doc_id in range(partition.start, partition.end):
            text = _doc_text(doc_id)
            yield (doc_id, text, len(text))


class SyntheticDocsStreamReader(SimpleDataSourceStreamReader):
    """Streaming read of the SAME source (DataSource V2 streaming API): the
    offset is the next unread doc_id, each micro-batch advances it by
    docs_per_batch until n_docs is exhausted. One source class serving
    batch AND stream mirrors the reference's scan-node abstraction over
    sources (data-source-scan-node.cc serves both exec modes from one
    prepare/open/getNext contract).

    SimpleDataSourceStreamReader (not the partitioned reader) so the reader
    holds NO position state of its own: read(start) derives everything from
    the offset Spark hands it out of the checkpointed offset log, and
    readBetweenOffsets replays any committed range deterministically —
    restart cannot regress or re-emit (a stateful latestOffset counter
    would restart at 0 and replay delivered docs)."""

    def __init__(self, schema: StructType, options):
        self.n_docs = int(options.get("n_docs", 100))
        self.per_batch = int(options.get("docs_per_batch", 10))

    def initialOffset(self) -> dict:
        return {"doc_id": 0}

    def _rows(self, start: int, end: int):
        return [(doc_id, _doc_text(doc_id), len(_doc_text(doc_id)))
                for doc_id in range(start, end)]

    def read(self, start: dict):
        s = start["doc_id"]
        e = min(s + self.per_batch, self.n_docs)
        return iter(self._rows(s, e)), {"doc_id": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["doc_id"], end["doc_id"]))

    def commit(self, end: dict) -> None:
        pass  # offsets are positional; nothing external to acknowledge


class SyntheticDocsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_docs"

    def schema(self) -> str:
        return "doc_id bigint, text string, n_chars int"

    def reader(self, schema: StructType) -> SyntheticDocsReader:
        return SyntheticDocsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SyntheticDocsStreamReader:
        return SyntheticDocsStreamReader(schema, self.options)
