"""Pure-Python Avro *binary* codec for flat record schemas.

The spark-avro module is not in this container (and there is no
network to fetch it), so the JVM ``from_avro``/``to_avro`` path can
never execute here. This module implements the Avro binary encoding
itself — from the public Apache Avro 1.11 specification ("Binary
encoding": zigzag-varint ints/longs, little-endian IEEE floats,
length-prefixed strings/bytes, union = branch index + value, record =
fields in declaration order) — for the flat record schemas this repo
and the reference use (/root/reference/schemas/*.avsc are all flat
records of string/int/long/float fields).

Scope: primitive fields (null, boolean, int, long, float, double,
string, bytes) and 2-branch ``["null", T]`` unions. That covers every
fixture schema; nested records/arrays/maps raise cleanly.

Spec compliance is unit-tested against the worked examples in the
Avro specification (zigzag table, the ``"foo"`` string encoding) in
tests/test_streaming.py, so these bytes interoperate with any real
Avro reader given the same writer schema.

sources/avro_io.py uses this codec as the Arrow-batched fallback when
the spark-avro jar is absent — same wire bytes, Python-side speed.
"""

from __future__ import annotations

import json
import struct


def _zigzag_encode(n: int) -> bytes:
    """Avro long: zigzag then base-128 varint, little-ends first."""
    u = (n << 1) ^ (n >> 63)
    u &= (1 << 64) - 1
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
    u, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        u |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    n = (u >> 1) ^ -(u & 1)
    return n, pos


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double",
               "string", "bytes"}


def parse_fields(schema: str | dict) -> list[tuple[str, str, bool]]:
    """Flat-record schema → [(field_name, base_type, nullable)].

    ``["null", T]`` (either order) becomes (name, T, True); any other
    union or complex type raises — this codec is deliberately scoped
    to the wire shapes the fixtures use.
    """
    sch = json.loads(schema) if isinstance(schema, str) else schema
    if sch.get("type") != "record":
        raise ValueError(f"only record schemas supported, got {sch.get('type')}")
    fields: list[tuple[str, str, bool]] = []
    for f in sch["fields"]:
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            branches = [b for b in t if b != "null"]
            if len(t) != 2 or "null" not in t or len(branches) != 1:
                raise ValueError(f"unsupported union {t} for field {f['name']}")
            t, nullable = branches[0], True
        if not isinstance(t, str) or t not in _PRIMITIVES:
            raise ValueError(f"unsupported type {t!r} for field {f['name']}")
        fields.append((f["name"], t, nullable))
    return fields


def _encode_value(val, typ: str) -> bytes:
    if typ == "null":
        return b""
    if typ == "boolean":
        return b"\x01" if val else b"\x00"
    if typ in ("int", "long"):
        return _zigzag_encode(int(val))
    if typ == "float":
        return struct.pack("<f", float(val))
    if typ == "double":
        return struct.pack("<d", float(val))
    if typ == "string":
        raw = str(val).encode("utf-8")
        return _zigzag_encode(len(raw)) + raw
    if typ == "bytes":
        raw = bytes(val)
        return _zigzag_encode(len(raw)) + raw
    raise ValueError(f"unsupported type {typ}")


def encode_record(values: tuple, fields: list[tuple[str, str, bool]]) -> bytes:
    """One record → Avro binary body (no container/framing — the bare
    datum bytes a Kafka value carries under a schema registry, minus
    the registry's 5-byte preamble)."""
    out = bytearray()
    for val, (_, typ, nullable) in zip(values, fields):
        if nullable:
            if val is None:
                out += _zigzag_encode(0)   # union branch 0 = null
                continue
            out += _zigzag_encode(1)       # union branch 1 = value
        elif val is None:
            raise ValueError("null in non-nullable field")
        out += _encode_value(val, typ)
    return bytes(out)


def decode_record(buf: bytes, fields: list[tuple[str, str, bool]]) -> tuple:
    vals = []
    pos = 0
    for _, typ, nullable in fields:
        if nullable:
            branch, pos = _zigzag_decode(buf, pos)
            if branch == 0:
                vals.append(None)
                continue
        if typ == "null":
            vals.append(None)
        elif typ == "boolean":
            vals.append(buf[pos] == 1)
            pos += 1
        elif typ in ("int", "long"):
            v, pos = _zigzag_decode(buf, pos)
            vals.append(v)
        elif typ == "float":
            vals.append(struct.unpack_from("<f", buf, pos)[0])
            pos += 4
        elif typ == "double":
            vals.append(struct.unpack_from("<d", buf, pos)[0])
            pos += 8
        elif typ == "string":
            n, pos = _zigzag_decode(buf, pos)
            vals.append(buf[pos:pos + n].decode("utf-8"))
            pos += n
        elif typ == "bytes":
            n, pos = _zigzag_decode(buf, pos)
            vals.append(bytes(buf[pos:pos + n]))
            pos += n
        else:
            raise ValueError(f"unsupported type {typ}")
    if pos != len(buf):
        raise ValueError(f"trailing bytes: read {pos} of {len(buf)}")
    return tuple(vals)


# --- Schema resolution (reader != writer) -------------------------------
#
# The Avro spec's "Schema Resolution" rules for flat records: fields
# are matched by NAME; reader-only fields take their declared default;
# writer-only fields are decoded (to advance the stream) and dropped;
# primitive promotions are int→long/float/double, long→float/double,
# float→double, string↔bytes. This is what a schema-registry consumer
# does when topics carry years of drifted writer versions — the
# reference's publisher resolves per-topic schemas from a live
# registry (services/kafka_event_publisher.py:17-40), so the reader
# side must tolerate added/removed/widened fields.

_PROMOTABLE = {
    ("int", "long"), ("int", "float"), ("int", "double"),
    ("long", "float"), ("long", "double"), ("float", "double"),
    ("string", "bytes"), ("bytes", "string"),
}


def _default_value(default, typ: str):
    """JSON default (as written in the .avsc) → Python value. Per the
    spec, bytes/fixed defaults are JSON strings whose Unicode
    codepoints 0-255 map to byte values (latin-1)."""
    if default is None:
        return None
    if typ == "boolean":
        return bool(default)
    if typ in ("int", "long"):
        return int(default)
    if typ in ("float", "double"):
        return float(default)
    if typ == "string":
        return str(default)
    if typ == "bytes":
        return str(default).encode("latin-1")
    raise ValueError(f"unsupported default for type {typ}")


def _promote(v, wtyp: str, rtyp: str):
    if v is None or wtyp == rtyp:
        return v
    if rtyp in ("long",):
        return int(v)
    if rtyp in ("float", "double"):
        return float(v)
    if rtyp == "bytes":            # string → bytes
        return str(v).encode("utf-8")
    if rtyp == "string":           # bytes → string
        return bytes(v).decode("utf-8")
    raise ValueError(f"no promotion {wtyp} → {rtyp}")


def resolve_schemas(writer_schema: str | dict, reader_schema: str | dict):
    """Build a resolution plan (writer_fields, actions): ``actions``
    has one entry per READER field, either ``("copy", widx, wtyp,
    rtyp, r_nullable)`` or ``("default", value)``. Raises on
    unresolvable schemas (type mismatch without a legal promotion, or
    a reader-only field with no default) — matching the spec's "error"
    outcomes."""
    wf = parse_fields(writer_schema)
    rsch = (json.loads(reader_schema) if isinstance(reader_schema, str)
            else reader_schema)
    rf = parse_fields(rsch)
    widx = {n: i for i, (n, _, _) in enumerate(wf)}
    json_defaults = {f["name"]: f["default"]
                     for f in rsch["fields"] if "default" in f}
    actions = []
    for rname, rtyp, rnull in rf:
        if rname in widx:
            i = widx[rname]
            wtyp = wf[i][1]
            if wtyp != rtyp and (wtyp, rtyp) not in _PROMOTABLE:
                raise ValueError(
                    f"field {rname}: writer {wtyp} is not promotable to "
                    f"reader {rtyp}"
                )
            actions.append(("copy", i, wtyp, rtyp, rnull))
        elif rname in json_defaults:
            actions.append(
                ("default", _default_value(json_defaults[rname], rtyp))
            )
        else:
            raise ValueError(
                f"reader field {rname} is absent from the writer schema "
                "and declares no default — unresolvable per the Avro spec"
            )
    return wf, actions


def decode_record_resolved(buf: bytes, writer_fields, actions) -> tuple:
    """Decode one datum written with the WRITER schema into the READER
    field layout: writer-only fields are decoded and dropped, defaults
    fill reader-only fields, promotions widen in place. A null in a
    field the reader declares non-nullable raises (the spec's branch
    mismatch)."""
    vals = decode_record(buf, writer_fields)
    out = []
    for action in actions:
        if action[0] == "default":
            out.append(action[1])
            continue
        _, i, wtyp, rtyp, rnull = action
        v = vals[i]
        if v is None and not rnull:
            raise ValueError(
                f"null in writer field {writer_fields[i][0]} but the "
                "reader declares it non-nullable"
            )
        out.append(_promote(v, wtyp, rtyp))
    return tuple(out)


_SPARK_TYPES = {"null": "string", "boolean": "boolean", "int": "int",
                "long": "long", "float": "float", "double": "double",
                "string": "string", "bytes": "binary"}


def spark_ddl(fields: list[tuple[str, str, bool]]) -> str:
    """The decoded frame's Spark schema for a parsed field list."""
    return ", ".join(f"{n} {_SPARK_TYPES[t]}" for n, t, _ in fields)
