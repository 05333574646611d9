"""From-scratch Apache Avro Object Container File codec (r05 wave 35)
— the last big-data interchange format the repo did not speak, built
the way WAV / PNG / MVT / TIFF / TFRecord were: from the PUBLIC spec
only (Apache Avro 1.11 specification, "Binary encoding" + "Object
Container Files"; no avro library exists in this container).

Binary encoding (spec §Binary Encoding):
    int/long   zigzag        ((n << 1) ^ (n >> 63)) as base-128 varint
    double     8 bytes IEEE-754 little-endian
    boolean    1 byte (0/1)
    string     long(byte length) + UTF-8 bytes
    bytes      long(length) + raw bytes
    null       zero bytes
    record     concatenation of its fields in schema order
    map        blocks: long(count) k/v pairs ... long(0) terminator

Container layout (spec §Object Container Files):
    magic 'Obj\\x01'
  | file-metadata map ('avro.schema' = schema JSON,
                       'avro.codec'  = 'null' | 'deflate')
  | 16-byte sync marker
  | data blocks: long(record count), long(serialized size),
                 records (deflate codec = RFC 1951 RAW deflate,
                 no zlib header), sync marker

The sync marker here is DETERMINISTIC (md5 of the schema JSON) so
shard bytes are a pure function of their rows — the repeatable-export
property every sink in this repo keeps.

Supported field types: long, int, double, boolean, string, bytes,
and the nullable union ["null", T] (branch index as long). That set
covers every harness table column.
"""

from __future__ import annotations

import hashlib
import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n < 0 else n << 1


def _unzigzag(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def write_long(buf: bytearray, n: int) -> None:
    u = _zigzag(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_long(f) -> int:
    u = 0
    shift = 0
    while True:
        b = f.read(1)[0]
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(u)
        shift += 7


def _write_value(buf: bytearray, typ, v) -> None:
    if isinstance(typ, list):  # nullable union ["null", T]
        if v is None:
            write_long(buf, typ.index("null"))
            return
        branch = 1 if typ[0] == "null" else 0
        write_long(buf, branch)
        _write_value(buf, typ[branch], v)
    elif typ in ("long", "int"):
        write_long(buf, int(v))
    elif typ == "double":
        buf.extend(struct.pack("<d", float(v)))
    elif typ == "boolean":
        buf.append(1 if v else 0)
    elif typ == "string":
        raw = v.encode("utf-8")
        write_long(buf, len(raw))
        buf.extend(raw)
    elif typ == "bytes":
        write_long(buf, len(v))
        buf.extend(v)
    else:
        raise NotImplementedError(f"avro type {typ!r}")


def _read_value(f, typ):
    if isinstance(typ, list):
        branch = typ[read_long(f)]
        return None if branch == "null" else _read_value(f, branch)
    if typ in ("long", "int"):
        return read_long(f)
    if typ == "double":
        return struct.unpack("<d", f.read(8))[0]
    if typ == "boolean":
        return f.read(1)[0] == 1
    if typ == "string":
        return f.read(read_long(f)).decode("utf-8")
    if typ == "bytes":
        return bytes(f.read(read_long(f)))
    raise NotImplementedError(f"avro type {typ!r}")


def _field_type(field: dict):
    return field["type"]


def encode_records(schema: dict, records) -> bytes:
    """Serialize dict records under a record schema (fields in schema
    order, per the spec: a record is just its fields concatenated)."""
    buf = bytearray()
    fields = schema["fields"]
    for rec in records:
        for fld in fields:
            _write_value(buf, _field_type(fld), rec[fld["name"]])
    return bytes(buf)


def _sync_marker(schema_json: str) -> bytes:
    return hashlib.md5(schema_json.encode("utf-8")).digest()


def write_avro(path: str, schema: dict, records, codec: str = "null",
               block_records: int = 1000) -> None:
    """Write an Object Container File: header, then one data block per
    ``block_records`` slice (real files carry many blocks — the reader
    must walk the block chain, so the fixture does too)."""
    schema_json = json.dumps(schema, sort_keys=True, separators=(",", ":"))
    sync = _sync_marker(schema_json)
    out = bytearray(MAGIC)
    meta = {"avro.schema": schema_json.encode("utf-8"),
            "avro.codec": codec.encode("utf-8")}
    write_long(out, len(meta))
    for k in sorted(meta):
        kb = k.encode("utf-8")
        write_long(out, len(kb))
        out.extend(kb)
        write_long(out, len(meta[k]))
        out.extend(meta[k])
    write_long(out, 0)  # metadata map terminator
    out.extend(sync)
    records = list(records)
    for i in range(0, len(records), block_records):
        chunk = records[i:i + block_records]
        payload = encode_records(schema, chunk)
        if codec == "deflate":
            # spec: RFC 1951 raw deflate, no zlib header/checksum
            payload = zlib.compress(payload, 6)[2:-4]
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        write_long(out, len(chunk))
        write_long(out, len(payload))
        out.extend(payload)
        out.extend(sync)
    with open(path, "wb") as fh:
        fh.write(out)


def read_avro(blob: bytes):
    """Parse an Object Container File -> (schema dict, list of dict
    records).  Verifies magic and every block's sync marker."""
    f = io.BytesIO(blob)
    if f.read(4) != MAGIC:
        raise ValueError("not an avro object container file")
    meta = {}
    while True:
        count = read_long(f)
        if count == 0:
            break
        for _ in range(abs(count)):
            k = f.read(read_long(f)).decode("utf-8")
            meta[k] = f.read(read_long(f))
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = f.read(16)
    fields = schema["fields"]
    records = []
    while True:
        head = f.read(1)
        if not head:
            break
        f.seek(-1, io.SEEK_CUR)
        n = read_long(f)
        size = read_long(f)
        payload = f.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise NotImplementedError(f"avro codec {codec!r}")
        pf = io.BytesIO(payload)
        for _ in range(n):
            records.append(
                {fld["name"]: _read_value(pf, _field_type(fld))
                 for fld in fields}
            )
        if pf.read(1):
            raise ValueError("trailing bytes inside avro block")
        if f.read(16) != sync:
            raise ValueError("avro sync marker mismatch")
    return schema, records
