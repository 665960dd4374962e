"""Property tests for the stdlib protobuf wire codec
(maha_spark/core/protowire.py) shared by the Avatica handler and the
request-log proto writer."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from maha_spark.core.protowire import (
    _read_uvarint, _unzigzag, _uvarint, _zigzag, decode_fields, f_bool,
    f_double, f_len, f_sint64, f_str, f_varint,
)


@given(st.integers(min_value=0, max_value=(1 << 64) - 1))
def test_uvarint_roundtrip(n):
    v, i = _read_uvarint(_uvarint(n), 0)
    assert v == n and i == len(_uvarint(n))


@given(st.integers(min_value=-(1 << 63), max_value=(1 << 63) - 1))
def test_zigzag_roundtrip(n):
    assert _unzigzag(_zigzag(n)) == n


@settings(max_examples=200)
@given(st.text(max_size=200), st.integers(min_value=1, max_value=500_000),
       st.booleans(),
       st.floats(allow_nan=False, allow_infinity=False))
def test_message_roundtrip(s, n, b, d):
    msg = (f_str(1, s) + f_varint(2, n) + f_bool(3, b) + f_double(4, d)
           + f_sint64(5, -n) + f_len(6, s.encode()))
    f = decode_fields(msg)
    if s:
        assert f[1][0][1].decode() == s
        assert f[6][0][1] == s.encode()
    assert f[2][0][1] == n
    assert bool(f.get(3, [(0, 0)])[0][1]) == b
    if d != 0.0:
        import struct
        assert struct.unpack("<d", struct.pack("<q", f[4][0][1]))[0] == d
    assert _unzigzag(f[5][0][1]) == -n
