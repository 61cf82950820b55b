"""CPU oracle codec tests (mirror of reference test/runtests.jl testsets 1,2,4
plus the bit-exact cross-implementation decode the reference lacks)."""

import numpy as np
import pytest

from snappy_tpu.cpu import oracle
from snappy_tpu.core.constants import CHAR_TABLE, max_compressed_length

from conftest import CORPUS_FILES, CORPUS_SMALL, read_testdata


def test_char_table_spot_values():
    # Spot-check the derived LUT against hand-computed entries of the format
    # spec (len | offset_hi<<8 | taglen<<11).
    assert CHAR_TABLE[0x00] == 0x0001  # literal len 1
    assert CHAR_TABLE[0x01] == 0x0804  # copy1 len 4, 1 extra byte
    assert CHAR_TABLE[0x02] == 0x1001  # copy2 len 1, 2 extra bytes
    assert CHAR_TABLE[0x03] == 0x2001  # copy4 len 1, 4 extra bytes
    assert CHAR_TABLE[0xF0] == 0x0801  # literal, 1-byte length follows
    assert CHAR_TABLE[0xFC] == 0x2001  # literal, 4-byte length follows
    assert CHAR_TABLE[0xFF] == 0x2040  # copy4 len 64
    assert CHAR_TABLE[0xFD] == 0x0F0B  # copy1 len 11, offset_hi 7
    assert CHAR_TABLE[0xFE] == 0x1040  # copy2 len 64


@pytest.mark.parametrize("name", CORPUS_FILES)
def test_corpus_roundtrip(name):
    raw = read_testdata(name)
    comp = oracle.compress(raw)
    assert comp != raw  # not identity
    assert len(comp) <= max_compressed_length(len(raw))
    out = oracle.uncompress(comp)
    assert out == raw


def test_alice29_foreign_stream_bit_exact():
    # alice29.snappy was produced by a *different* conformant encoder; decoding
    # it bit-exactly proves wire compatibility beyond round-tripping.
    comp = read_testdata("alice29.snappy")
    raw = read_testdata("alice29.txt")
    assert oracle.uncompress(comp) == raw


SIMPLE_STRINGS = [
    b"",
    b"a",
    b"ab",
    b"abc",
    b"aaaaaaa" + b"b" * 16 + b"aaaaa" + b"abc",
    b"aaaaaaa" + b"b" * 256 + b"aaaaa" + b"abc",
    b"aaaaaaa" + b"b" * 2047 + b"aaaaa" + b"abc",
    b"aaaaaaa" + b"b" * 65536 + b"aaaaa" + b"abc",
    b"abcaaaaaaa" + b"b" * 65536 + b"aaaaa" + b"abc",
]


@pytest.mark.parametrize("raw", SIMPLE_STRINGS, ids=[str(i) for i in range(len(SIMPLE_STRINGS))])
def test_simple_strings_roundtrip(raw):
    comp = oracle.compress(raw)
    assert oracle.uncompress(comp) == raw


def test_max_blowup_roundtrip(rng):
    # Dense 4-byte copies: 20000 random words then their mirror
    # (reference test/runtests.jl:147-154).
    words = rng.integers(0, 1 << 32, size=20000, dtype=np.uint32)
    raw = np.concatenate([words, words[::-1]]).view(np.uint8).tobytes()
    comp = oracle.compress(raw)
    assert len(comp) <= max_compressed_length(len(raw))
    assert oracle.uncompress(comp) == raw


def test_random_generated_roundtrip(rng):
    # Synthetic compressible data: random words from a small dictionary
    # (reference test/runtests.jl:35-60; fewer rounds, scalar oracle is slow).
    dictionary = [rng.integers(0, 256, size=rng.integers(1, 17), dtype=np.uint8) for _ in range(64)]
    for _ in range(6):
        n_words = int(rng.integers(1, 1 << 13))
        raw = np.concatenate([dictionary[rng.integers(0, 64)] for _ in range(n_words)]).tobytes()
        comp = oracle.compress(raw)
        assert oracle.uncompress(comp) == raw


def test_empty_input():
    comp = oracle.compress(b"")
    assert comp == b"\x00"
    assert oracle.uncompress(comp) == b""


def test_string_input_convenience():
    comp = oracle.compress("hello hello hello hello")
    assert oracle.uncompress(comp) == b"hello hello hello hello"


def test_rle_overlapping_copies():
    # offset < length copies exercise the RLE expansion path.
    for n in [5, 17, 64, 100, 1000]:
        raw = b"x" * n
        assert oracle.uncompress(oracle.compress(raw)) == raw
    raw = b"ab" * 5000
    assert oracle.uncompress(oracle.compress(raw)) == raw
