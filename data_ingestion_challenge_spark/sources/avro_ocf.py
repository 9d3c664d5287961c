"""Avro Object Container File source/sink in pure Python.

The reference speaks Avro on the wire; this container has neither the
spark-avro jar (external module) nor a Python avro package, so the
format support here is implemented directly against the PUBLIC Avro
1.11 specification (container-file layout + binary encoding,
avro.apache.org/docs — magic `Obj\\x01`, varint-zigzag longs,
length-prefixed utf-8 strings, little-endian doubles, sync-marker
delimited null-codec blocks).  That keeps the wire format REAL — the
gate moves actual Avro bytes, not a stub — while staying inside the
container's dependency budget.

Spark integration:
- writer: `write_avro_ocf(df, out_dir)` — executor-side mapInPandas
  partition writer, one .avro file per input partition.
- reader: `AvroOcfDataSource` (Spark 4 Python DataSource API, same
  pattern as sources/eventlog.py) — one InputPartition per file, rows
  streamed block-by-block; plus `read_avro_ocf(spark, path)`.

Scale notes: files are the parallel unit (N files → N-way scan);
decode is Python-side — the honest trade for jar-less format support.
On a cluster with the spark-avro jar, sources/files.read_avro is the
vectorized JVM path; the two read the same files.

Supported schema subset: flat records of long / double / string —
exactly the wire-event shape.  Anything else raises with an
actionable message (this is a wire-format gate, not a general codec).
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition)
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructType)

_MAGIC = b"Obj\x01"

# ---------------------------------------------------------- encoding


def _enc_long(n: int) -> bytes:
    """Zigzag + varint (Avro `long`): spec example — 27 encodes to
    0x36, -1 to 0x01, 1 to 0x02."""
    n = int(n)  # numpy int64 would silently wrap under << near 2^62
    z = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1 | 1)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _enc_long(len(raw)) + raw


def _enc_double(f: float) -> bytes:
    return struct.pack("<d", f)


def _dec_long(buf: io.BufferedReader) -> int:
    shift = 0
    z = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("truncated varint")
        b = byte[0]
        z |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1)


def _dec_str(buf: io.BufferedReader) -> str:
    n = _dec_long(buf)
    return buf.read(n).decode("utf-8")


def _dec_double(buf: io.BufferedReader) -> float:
    return struct.unpack("<d", buf.read(8))[0]


_ENC = {"long": _enc_long, "double": _enc_double, "string": _enc_str}
_DEC = {"long": _dec_long, "double": _dec_double, "string": _dec_str}
_AVRO_TYPE = {LongType: "long", DoubleType: "double",
              StringType: "string"}


def _avro_schema(schema: StructType, name: str = "row") -> dict:
    fields = []
    for f in schema.fields:
        t = _AVRO_TYPE.get(type(f.dataType))
        if t is None:
            raise ValueError(
                f"avro_ocf supports long/double/string; field "
                f"{f.name} is {f.dataType.simpleString()}")
        fields.append({"name": f.name, "type": t})
    return {"type": "record", "name": name, "fields": fields}


def _sync_for(schema_json: str) -> bytes:
    """Deterministic per-schema sync marker: task retries rewrite
    byte-identical files."""
    return hashlib.md5(b"avro-ocf-sync:"
                       + schema_json.encode()).digest()


def write_ocf(path: str, schema_json: str, rows,
              block_rows: int = 4096) -> int:
    """Write one .avro container file (null codec).  `rows` iterates
    tuples in schema field order.  Returns rows written."""
    sch = json.loads(schema_json)
    encs = [_ENC[f["type"]] for f in sch["fields"]]
    sync = _sync_for(schema_json)
    n_total = 0
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        meta = {"avro.schema": schema_json.encode(),
                "avro.codec": b"null"}
        fh.write(_enc_long(len(meta)))
        for k, v in sorted(meta.items()):
            fh.write(_enc_str(k))
            fh.write(_enc_long(len(v)) + v)
        fh.write(_enc_long(0))
        fh.write(sync)
        block = bytearray()
        n_block = 0

        def _flush():
            nonlocal block, n_block
            if n_block:
                fh.write(_enc_long(n_block))
                fh.write(_enc_long(len(block)))
                fh.write(block)
                fh.write(sync)
                block = bytearray()
                n_block = 0

        for row in rows:
            for enc, v in zip(encs, row):
                block += enc(v)
            n_block += 1
            n_total += 1
            if n_block >= block_rows:
                _flush()
        _flush()
    return n_total


def read_ocf(path: str):
    """Yield tuples from one .avro container file (null codec)."""
    with open(path, "rb") as fh:
        if fh.read(4) != _MAGIC:
            raise ValueError(f"{path}: not an Avro container file")
        meta = {}
        while True:
            n = _dec_long(fh)
            if n == 0:
                break
            if n < 0:
                # Spec's negative-count map block: abs(n) entries are
                # preceded by a long giving the block's byte size.
                _dec_long(fh)
            for _ in range(abs(n)):
                k = _dec_str(fh)
                vlen = _dec_long(fh)
                meta[k] = fh.read(vlen)
        codec = meta.get("avro.codec", b"null")
        if codec != b"null":
            raise ValueError(f"{path}: codec {codec!r} not supported")
        sch = json.loads(meta["avro.schema"])
        decs = [_DEC[f["type"]] for f in sch["fields"]]
        sync = fh.read(16)
        while True:
            try:
                n_rows = _dec_long(fh)
            except EOFError:
                return
            _dec_long(fh)  # block byte size (unused with null codec)
            for _ in range(n_rows):
                yield tuple(dec(fh) for dec in decs)
            if fh.read(16) != sync:
                raise ValueError(f"{path}: sync marker mismatch")


# ------------------------------------------------- Spark integration


def write_avro_ocf(df: DataFrame, out_dir: str) -> int:
    """Executor-side Avro sink: each input partition writes one
    part-<id>.avro into out_dir.  Returns total rows written; drops a
    _SUCCESS marker for idempotent scaffold reuse."""
    import pandas as pd
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    schema_json = json.dumps(_avro_schema(df.schema))
    names = [f.name for f in df.schema.fields]

    def _write(batches):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")

        def _rows():
            for pdf in batches:
                yield from pdf[names].itertuples(index=False, name=None)

        yield pd.DataFrame({"written": [write_ocf(path, schema_json,
                                                  _rows())]})

    total = (df.mapInPandas(_write, "written long")
             .agg(F.sum("written").alias("n")).collect()[0]["n"])
    open(os.path.join(out_dir, "_SUCCESS"), "w").close()
    return int(total or 0)


@dataclass
class _AvroFilePartition(InputPartition):
    path: str


class AvroOcfReader(DataSourceReader):
    def __init__(self, options):
        import glob
        self._paths = sorted(glob.glob(options["path"] + "/*.avro"))

    def partitions(self):
        return [_AvroFilePartition(p) for p in self._paths]

    def read(self, partition: _AvroFilePartition):
        yield from read_ocf(partition.path)


class AvroOcfDataSource(DataSource):
    """spark.read.format("avro_ocf").schema(ddl).load(dir) — register
    with spark.dataSource.register(AvroOcfDataSource) first."""

    @classmethod
    def name(cls) -> str:
        return "avro_ocf"

    def reader(self, schema: StructType) -> AvroOcfReader:
        return AvroOcfReader(self.options)


def read_avro_ocf(spark: SparkSession, path: str,
                  schema: str) -> DataFrame:
    """Batch-read a directory of .avro container files with an
    EXPLICIT schema (same contract as every sources/files reader)."""
    spark.dataSource.register(AvroOcfDataSource)
    return (spark.read.format("avro_ocf").schema(schema)
            .load(path))
