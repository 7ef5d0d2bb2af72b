"""Pure-Python Avro binary codec for flat record schemas.

The container has no spark-avro jar and no network to vendor one, so
the JVM ``from_avro``/``to_avro`` path (the preferred, codegen'd route
— use it on any real cluster) is unavailable here. This module
implements the Avro 1.x BINARY ENCODING from the public specification
(https://avro.apache.org/docs/1.11.1/specification/#binary-encoding)
for the subset the reference's decoder handles — flat records of
primitives plus nullable ``["null", T]`` unions (the reference leaves
Avro logical types ``todo!()``: crates/core/src/formats/decoders/
avro.rs:17-54) — and exposes it as an Arrow-batched ``mapInPandas``
decode/encode so the Kafka Avro path EXECUTES in this container
instead of gating on the jar.

Wire facts implemented (all from the spec):
- int/long: variable-length zigzag varint (0→0x00, -1→0x01, 1→0x02,
  2→0x03, -64→0x7f, 64→0x80 0x01).
- float/double: 4/8 bytes little-endian IEEE-754.
- boolean: one byte 0/1. null: zero bytes.
- bytes/string: long length prefix, then raw bytes (UTF-8 for string).
- union: long index of the branch, then the branch's encoding.
- record: field encodings concatenated in schema order, no framing.

Scale posture: the fallback decodes in Python (Arrow-batched, not
per-row pickling), ~10× slower than the JVM decoder — fine for the
test container and modest topics, but on a production cluster ship
the spark-avro package and the JVM path in sources/kafka.py is taken
automatically.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Iterator

_PRIMITIVES = {
    "null",
    "boolean",
    "int",
    "long",
    "float",
    "double",
    "bytes",
    "string",
}

_SPARK_TYPES = {
    "boolean": "boolean",
    "int": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "bytes": "binary",
    "string": "string",
}


def _field_type(t: Any) -> tuple[str, bool]:
    """Normalize a field's schema to (primitive_name, nullable).

    Accepts a primitive name, ``{"type": name}``, or a two-branch
    union ``["null", T]`` / ``[T, "null"]``. Anything else (nested
    records, arrays, maps, enums, fixed, logical types) is rejected —
    the same surface the reference decoder supports."""
    if isinstance(t, dict):
        t = t.get("type")
    if isinstance(t, list):
        branches = [b.get("type") if isinstance(b, dict) else b for b in t]
        if len(branches) == 2 and "null" in branches:
            other = branches[0] if branches[1] == "null" else branches[1]
            if other in _PRIMITIVES and other != "null":
                return other, True
        raise ValueError(f"unsupported Avro union: {t!r}")
    if t in _PRIMITIVES and t != "null":
        return t, False
    raise ValueError(f"unsupported Avro type: {t!r}")


def parse_schema(avro_schema: str | dict) -> list[tuple[str, str, bool]]:
    """Parse a flat-record Avro schema JSON into
    ``[(field_name, primitive, nullable), ...]`` in schema order."""
    s = json.loads(avro_schema) if isinstance(avro_schema, str) else avro_schema
    if s.get("type") != "record" or "fields" not in s:
        raise ValueError("avro_codec supports flat record schemas only")
    return [
        (f["name"], *_field_type(f["type"])) for f in s["fields"]
    ]


def spark_ddl(avro_schema: str | dict) -> str:
    """The Spark DDL schema string for the decoded record."""
    return ", ".join(
        f"{name} {_SPARK_TYPES[prim]}"
        for name, prim, _ in parse_schema(avro_schema)
    )


# -- binary primitives ------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    u &= 0xFFFFFFFFFFFFFFFF
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    u = 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def encode_value(prim: str, v: Any) -> bytes:
    if prim == "boolean":
        return b"\x01" if v else b"\x00"
    if prim in ("int", "long"):
        return _zigzag_encode(int(v))
    if prim == "float":
        return struct.pack("<f", float(v))
    if prim == "double":
        return struct.pack("<d", float(v))
    if prim == "string":
        b = str(v).encode("utf-8")
        return _zigzag_encode(len(b)) + b
    if prim == "bytes":
        b = bytes(v)
        return _zigzag_encode(len(b)) + b
    raise ValueError(f"unsupported primitive {prim!r}")


def decode_value(prim: str, buf: bytes, pos: int) -> tuple[Any, int]:
    if prim == "boolean":
        return buf[pos] != 0, pos + 1
    if prim in ("int", "long"):
        return _zigzag_decode(buf, pos)
    if prim == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if prim == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if prim in ("string", "bytes"):
        n, pos = _zigzag_decode(buf, pos)
        raw = bytes(buf[pos : pos + n])
        return (raw.decode("utf-8") if prim == "string" else raw), pos + n
    raise ValueError(f"unsupported primitive {prim!r}")


# -- record codec ------------------------------------------------------


def encode_record(fields: list[tuple[str, str, bool]], row: dict) -> bytes:
    """One record → Avro binary, matching ``to_avro``'s framing for a
    non-nullable struct (no header; fields back-to-back). Nullable
    fields write the union branch index (0 = null first, per the
    canonical ["null", T] order this codec normalizes to)."""
    out = bytearray()
    for name, prim, nullable in fields:
        v = row.get(name)
        if nullable:
            if v is None:
                out += _zigzag_encode(0)
                continue
            out += _zigzag_encode(1)
        elif v is None:
            raise ValueError(f"field {name!r} is not nullable but got None")
        out += encode_value(prim, v)
    return bytes(out)


def decode_record(
    fields: list[tuple[str, str, bool]], buf: bytes
) -> dict[str, Any]:
    pos = 0
    row: dict[str, Any] = {}
    for name, prim, nullable in fields:
        if nullable:
            idx, pos = _zigzag_decode(buf, pos)
            if idx == 0:
                row[name] = None
                continue
        row[name], pos = decode_value(prim, buf, pos)
    if pos != len(buf):
        raise ValueError(
            f"trailing bytes after record: consumed {pos} of {len(buf)}"
        )
    return row


# -- Spark plumbing ----------------------------------------------------


def decode_avro_python(raw, avro_schema: str, value_col: str = "value"):
    """``(value binary)`` → typed columns via the pure-Python codec in
    ``mapInPandas`` (Arrow batches, no per-row pickling). Corrupt
    payloads yield a NULL row, not a task death — the 100 TB posture
    used by the multimodal decoders. Column order/types mirror the
    JVM ``from_avro`` path exactly (parity-tested)."""
    import pandas as pd

    fields = parse_schema(avro_schema)
    names = [f[0] for f in fields]
    ddl = spark_ddl(avro_schema)

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for payload in pdf[value_col]:
                try:
                    rows.append(decode_record(fields, bytes(payload)))
                except Exception:
                    rows.append({n: None for n in names})
            yield pd.DataFrame(rows, columns=names)

    return raw.select(value_col).mapInPandas(_decode, ddl)


def encode_avro_python(df, avro_schema: str):
    """Typed columns → ``(value binary)`` rows with the pure-Python
    encoder — the fallback twin of ``to_avro(struct(*))``."""
    import pandas as pd

    fields = parse_schema(avro_schema)
    names = [f[0] for f in fields]

    def _encode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            vals = [
                encode_record(fields, {n: (None if pd.isna(r[n]) else r[n]) for n in names})
                for r in pdf[names].to_dict("records")
            ]
            yield pd.DataFrame({"value": vals})

    return df.mapInPandas(_encode, "value binary")
