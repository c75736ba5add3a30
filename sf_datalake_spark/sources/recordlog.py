"""``recordlog`` — a custom Spark batch source for length-prefixed
binary record files, built on the Spark 4 Python DataSource API.

The format is the minimal shape of TFRecord / WARC-style training-data
containers: a 4-byte magic, then per record a u32 key length, the utf-8
key, a u32 payload length, and the raw payload bytes.  Exactly the kind
of proprietary container a 100 TB corpus arrives in — and the point of
this module: ingesting one needs NO JVM code, just a registered Python
``DataSource`` whose reader yields Arrow-friendly tuples.

Scale design: one input partition per file (the natural parallel unit
of a record container — records are length-prefixed, not seekable, so
a file is the smallest independently-scannable chunk; producers shard
output into many files for parallelism, as every TFRecord pipeline
does).  The reader streams records sequentially per file with O(record)
memory and never materializes a file in memory.  Column pruning and
filters stay in Spark above the source — the payload column is an
opaque ``binary``, the same contract as ``multimodal.assets``.

No DuckDB twin can read this format, but the round-trip query
(``recordlog_roundtrip``) is still ORACLED: the oracle recomputes the
expected keys/lengths/md5s from the source table the records were
written from.
"""

from __future__ import annotations

import glob
import os
import struct
from collections.abc import Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

RECORD_MAGIC = b"RLG1"


def write_recordlog(path: str, records: Iterable[tuple[str, bytes]]) -> int:
    """Write ``(key, payload)`` records to one recordlog file; returns
    the record count. Producer-side helper (tests, converters)."""
    n = 0
    with open(path, "wb") as f:
        f.write(RECORD_MAGIC)
        for key, payload in records:
            kb = key.encode("utf-8")
            f.write(struct.pack("<I", len(kb)))
            f.write(kb)
            f.write(struct.pack("<I", len(payload)))
            f.write(payload)
            n += 1
    return n


def read_recordlog_records(path: str) -> Iterator[tuple[str, bytes, int]]:
    """Yield ``(key, payload, offset)`` from one recordlog file,
    streaming (O(record) memory). Raises on a bad magic or a truncated
    record — corrupt containers fail loudly, never silently short."""
    with open(path, "rb") as f:
        if f.read(4) != RECORD_MAGIC:
            raise ValueError(f"{path}: bad recordlog magic")
        while True:
            offset = f.tell()
            head = f.read(4)
            if not head:
                return
            if len(head) < 4:
                raise ValueError(f"{path}: truncated key length at {offset}")
            (klen,) = struct.unpack("<I", head)
            kb = f.read(klen)
            plen_b = f.read(4)
            if len(kb) < klen or len(plen_b) < 4:
                raise ValueError(f"{path}: truncated record at {offset}")
            (plen,) = struct.unpack("<I", plen_b)
            payload = f.read(plen)
            if len(payload) < plen:
                raise ValueError(f"{path}: truncated payload at {offset}")
            yield kb.decode("utf-8"), payload, offset


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _RecordLogReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordlog requires a path")

    def partitions(self):
        pattern = (
            os.path.join(self.path, "*.rlog")
            if os.path.isdir(self.path)
            else self.path
        )
        files = sorted(glob.glob(pattern))
        if not files:
            raise FileNotFoundError(f"no recordlog files match {pattern}")
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        fname = os.path.basename(partition.path)
        for key, payload, offset in read_recordlog_records(partition.path):
            yield key, payload, offset, fname


class _RecordLogStreamReader(DataSourceStreamReader):
    """Micro-batch reader over a growing directory of ``*.rlog`` files.

    Offsets are positions in the SORTED file listing — records are
    immutable once written and producers add whole new files (the
    append-only contract of every record-container pipeline), so
    "how many files, in name order" is a complete, replayable offset.
    Each micro-batch gets one partition per new file; commit is a
    no-op (files are the durable log — nothing to acknowledge).
    Late-arriving files sorting BEFORE the committed frontier would be
    skipped, like Spark's own file source without `latestFirst`; name
    shards monotonically (part-00001, …) as producers already do.
    """

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("recordlog requires a path")

    def _files(self):
        return sorted(glob.glob(os.path.join(self.path, "*.rlog")))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(self._files())}

    def partitions(self, start: dict, end: dict):
        files = self._files()[start["index"] : end["index"]]
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition):
        if not partition.path:
            return
        fname = os.path.basename(partition.path)
        for key, payload, offset in read_recordlog_records(partition.path):
            yield key, payload, offset, fname

    def commit(self, end: dict) -> None:
        pass


class RecordLogDataSource(DataSource):
    """``spark.read.format("recordlog").load(path)`` — path may be a
    directory (all ``*.rlog`` inside, one partition each) or a file;
    ``spark.readStream.format("recordlog").load(dir)`` tails the
    directory with file-granular offsets."""

    @classmethod
    def name(cls) -> str:
        return "recordlog"

    def schema(self) -> str:
        return "key string, payload binary, offset bigint, file string"

    def reader(self, schema):
        return _RecordLogReader(self.options)

    def streamReader(self, schema):
        return _RecordLogStreamReader(self.options)


def register_recordlog(spark) -> None:
    """Idempotently register the source with a session."""
    spark.dataSource.register(RecordLogDataSource)
