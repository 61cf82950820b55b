"""Corrupted-data / security battery (mirror of reference test/runtests.jl:62-123)."""

import pytest

from snappy_tpu.cpu import oracle
from snappy_tpu.core.errors import CorruptInputError

from conftest import read_testdata


def test_bitflip_raises():
    comp = bytearray(oracle.compress(b"making sure we don't crash with corrupted input"))
    assert len(comp) > 3
    comp[1] = (~comp[1]) & 0xFF
    comp[3] = comp[2]
    with pytest.raises(CorruptInputError):
        oracle.uncompress(bytes(comp))


def test_header_lies_zero_length():
    # Body decodes to 100k but the header claims 0 bytes.
    comp = bytearray(oracle.compress(b"A" * 100000))
    comp[0] = comp[1] = comp[2] = comp[3] = 0
    with pytest.raises(CorruptInputError):
        oracle.uncompress(bytes(comp))


def test_header_lies_two_megabytes():
    comp = bytearray(oracle.compress(b"A" * 100000))
    comp[0] = comp[1] = comp[2] = 0xFF
    comp[3] = 0x00
    with pytest.raises(CorruptInputError):
        oracle.uncompress(bytes(comp))


@pytest.mark.parametrize("name", ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"])
def test_baddata_fuzz_files(name):
    raw = read_testdata(name)
    ulen, _ = oracle.uncompressed_length(raw)
    assert ulen < (1 << 20)
    with pytest.raises(CorruptInputError):
        oracle.uncompress(raw)


@pytest.mark.parametrize(
    "raw",
    [
        bytes([0xF0]),
        bytes([0x80, 0x80, 0x80, 0x80, 0x80, 0x0A]),
        bytes([0xFB, 0xFF, 0xFF, 0xFF, 0x7F]),
    ],
)
def test_corrupt_varint_header_raises(raw):
    with pytest.raises(CorruptInputError):
        oracle.uncompress(raw)


@pytest.mark.parametrize(
    "raw",
    [
        # header 0x40 (claims 64 bytes), copy1 with offset==0, length 5
        bytes([0x40, 0x12, 0x00, 0x00]),
        # header 0x05, same corrupt copy
        bytes([0x05, 0x12, 0x00, 0x00]),
    ],
)
def test_zero_offset_copy_raises(raw):
    # Guard against the offset==0 infinite-loop class of bugs
    # (reference test/runtests.jl:113-122).
    with pytest.raises(CorruptInputError):
        oracle.uncompress(raw)


def test_copy_before_start_raises():
    # A copy whose offset reaches before the output start.
    raw = bytes([0x10, 0x00, 0x61, 0x09, 0x20, 0x00])  # lit 'a', copy1 off=32 len 6
    with pytest.raises(CorruptInputError):
        oracle.uncompress(raw)


def test_literal_overruns_input_raises():
    # Literal claims 40 bytes but stream ends.
    raw = bytes([0x30, (39 << 2), 0x61, 0x62])
    with pytest.raises(CorruptInputError):
        oracle.uncompress(raw)


def test_truncated_stream_raises():
    comp = oracle.compress(b"hello world hello world hello world")
    with pytest.raises(CorruptInputError):
        oracle.uncompress(comp[: len(comp) // 2])
