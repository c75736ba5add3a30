"""Tests for the custom recordlog Python DataSource (Spark 4
DataSource API): format round-trip, per-file partitioning, corruption
handling."""

from __future__ import annotations

import os
import struct

import pytest

from sf_datalake_spark.sources import (
    read_recordlog_records,
    register_recordlog,
    write_recordlog,
)
from sf_datalake_spark.sources.recordlog import RECORD_MAGIC


def test_recordlog_format_roundtrip(tmp_path):
    p = str(tmp_path / "x.rlog")
    recs = [("a", b""), ("key2", b"\x00\xff" * 10), ("c", b"plain")]
    assert write_recordlog(p, recs) == 3
    got = [(k, v) for k, v, _ in read_recordlog_records(p)]
    assert got == recs
    # offsets are monotonically increasing and start after the magic
    offs = [o for _, _, o in read_recordlog_records(p)]
    assert offs[0] == len(RECORD_MAGIC) and offs == sorted(offs)


def test_recordlog_corruption_fails_loudly(tmp_path):
    p = str(tmp_path / "bad.rlog")
    with open(p, "wb") as f:
        f.write(b"NOPE")
    with pytest.raises(ValueError, match="magic"):
        list(read_recordlog_records(p))
    p2 = str(tmp_path / "trunc.rlog")
    with open(p2, "wb") as f:
        f.write(RECORD_MAGIC)
        f.write(struct.pack("<I", 3))
        f.write(b"ke")  # truncated key
    with pytest.raises(ValueError, match="truncated"):
        list(read_recordlog_records(p2))


def test_recordlog_spark_reader_partitions_and_binary(spark, tmp_path):
    write_recordlog(str(tmp_path / "s1.rlog"), [("1", b"abc"), ("2", b"\x01\x02")])
    write_recordlog(str(tmp_path / "s2.rlog"), [("3", b"")])
    register_recordlog(spark)
    df = spark.read.format("recordlog").load(str(tmp_path))
    assert df.rdd.getNumPartitions() == 2  # one per file
    rows = {r["key"]: r for r in df.collect()}
    assert bytes(rows["2"]["payload"]) == b"\x01\x02"
    assert bytes(rows["3"]["payload"]) == b""
    assert rows["1"]["file"] == "s1.rlog"
    # missing path errors loudly
    with pytest.raises(Exception):
        spark.read.format("recordlog").load(str(tmp_path / "nope")).collect()


def test_recordlog_stream_incremental_offsets(spark, tmp_path):
    """The streaming reader tails the directory with file-granular
    offsets: a second availableNow run from the same checkpoint
    processes ONLY files added since the first drain."""
    src = tmp_path / "stream"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    write_recordlog(str(src / "part-00000.rlog"), [("a", b"1"), ("b", b"2")])
    write_recordlog(str(src / "part-00001.rlog"), [("c", b"3")])
    register_recordlog(spark)

    sink = str(tmp_path / "sink")

    def drain():
        q = (
            spark.readStream.format("recordlog").load(str(src))
            .writeStream.format("parquet").option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        return {r["key"] for r in spark.read.parquet(sink).collect()}

    assert drain() == {"a", "b", "c"}
    # new file arrives; same checkpoint -> only the delta is appended
    write_recordlog(str(src / "part-00002.rlog"), [("d", b"4")])
    assert drain() == {"a", "b", "c", "d"}
    # exactly-once: a replay of old files would have duplicated a/b/c
    assert spark.read.parquet(sink).count() == 4
