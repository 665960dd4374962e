"""Protobuf wire-format primitives (stdlib only).

No protobuf library ships in this environment, so the wire format is
implemented directly — it is four wire types: varint, fixed64,
length-delimited, fixed32 (developers.google.com/protocol-buffers/docs/
encoding). Consumers hand-write per-message field descriptors:
serving/avatica_proto.py (Avatica protocol) and log/request_log.py
(MahaRequestLog.proto records).
"""

from __future__ import annotations

import struct
from typing import Any

# ------------------------------------------------------------ wire format
_WT_VARINT, _WT_FIXED64, _WT_LEN, _WT_FIXED32 = 0, 1, 2, 5


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = data[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _field(num: int, wt: int, payload: bytes) -> bytes:
    return _uvarint((num << 3) | wt) + payload


def f_varint(num: int, n: int) -> bytes:
    if not n:
        return b""  # proto3 default elision
    return _field(num, _WT_VARINT, _uvarint(n & 0xFFFFFFFFFFFFFFFF))


def f_sint64(num: int, n: int) -> bytes:
    return b"" if n == 0 else _field(num, _WT_VARINT, _uvarint(_zigzag(n)))


def f_bool(num: int, v: bool) -> bytes:
    return f_varint(num, 1 if v else 0)


def f_len(num: int, b: bytes) -> bytes:
    return b"" if not b else _field(num, _WT_LEN, _uvarint(len(b)) + b)


def f_str(num: int, s: str) -> bytes:
    return f_len(num, s.encode("utf-8"))


def _len_always(num: int, b: bytes) -> bytes:
    """Length-delimited field emitted even when empty (nested messages
    whose presence matters, unlike proto3 scalar defaults)."""
    return _field(num, _WT_LEN, _uvarint(len(b)) + b)


def f_double(num: int, v: float) -> bytes:
    if v == 0.0 and not (v != v):  # elide +0.0, keep NaN explicit
        return b""
    return _field(num, _WT_FIXED64, struct.pack("<d", v))


def decode_fields(data: bytes) -> dict[int, list[tuple[int, Any]]]:
    """Generic decode: field number -> [(wire type, raw value)]."""
    out: dict[int, list[tuple[int, Any]]] = {}
    i = 0
    while i < len(data):
        tag, i = _read_uvarint(data, i)
        num, wt = tag >> 3, tag & 7
        if wt == _WT_VARINT:
            v, i = _read_uvarint(data, i)
        elif wt == _WT_FIXED64:
            v = struct.unpack_from("<q", data, i)[0]
            i += 8
        elif wt == _WT_LEN:
            ln, i = _read_uvarint(data, i)
            v = data[i:i + ln]
            i += ln
        elif wt == _WT_FIXED32:
            v = struct.unpack_from("<i", data, i)[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(num, []).append((wt, v))
    return out


def _first(fields: dict, num: int, default: Any = None) -> Any:
    vals = fields.get(num)
    return vals[0][1] if vals else default


def _s(fields: dict, num: int, default: str = "") -> str:
    v = _first(fields, num)
    return v.decode("utf-8") if isinstance(v, (bytes, bytearray)) else default


