"""Varint32 framing tests (mirror of reference test/runtests.jl:100-111,157-163)."""

import pytest

from snappy_tpu.core import varint
from snappy_tpu.core.errors import CorruptInputError


def test_roundtrip_powers_of_two():
    for i in range(31):
        v = 1 << i
        enc = varint.encode32(v)
        val, end = varint.parse32(enc, 0)
        assert val == v
        assert end == len(enc)
        assert len(enc) == varint.encoded_length(v)


def test_roundtrip_edge_values():
    for v in [0, 1, 127, 128, 16383, 16384, (1 << 21) - 1, 1 << 21, (1 << 28) - 1, 1 << 28, (1 << 32) - 1]:
        val, end = varint.parse32(varint.encode32(v), 0)
        assert val == v


def test_truncated_varint_raises():
    with pytest.raises(CorruptInputError):
        varint.parse32(bytes([0xF0]), 0)


def test_too_long_varint_raises():
    with pytest.raises(CorruptInputError):
        varint.parse32(bytes([0x80, 0x80, 0x80, 0x80, 0x80, 0x0A]), 0)


def test_overflow_on_fifth_byte_raises():
    with pytest.raises(CorruptInputError):
        varint.parse32(bytes([0xFB, 0xFF, 0xFF, 0xFF, 0x7F]), 0)


def test_parse_at_offset():
    buf = b"\x00" + varint.encode32(300)
    val, end = varint.parse32(buf, 1)
    assert val == 300
    assert end == 1 + 2


def test_encode_out_of_range():
    with pytest.raises(ValueError):
        varint.encode32(1 << 32)
    with pytest.raises(ValueError):
        varint.encode32(-1)
