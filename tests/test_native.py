"""Native C++ codec tests: differential vs the CPU oracle + corruption battery."""

import numpy as np
import pytest

from snappy_tpu.core.errors import CorruptInputError
from snappy_tpu.cpu import oracle

from conftest import CORPUS_FILES, read_testdata

native = pytest.importorskip("snappy_tpu.native.runtime")

pytestmark = pytest.mark.skipif(not native.available(), reason="native codec unavailable")


@pytest.mark.parametrize("name", CORPUS_FILES)
def test_corpus_roundtrip_and_oracle_equivalence(name):
    raw = read_testdata(name)
    comp = native.compress(raw)
    assert native.uncompress(comp) == raw
    # The native encoder implements the identical parse as the oracle:
    # compressed streams must match byte for byte.
    assert comp == oracle.compress(raw)
    # And both decoders accept each other's output bit-exactly.
    assert oracle.uncompress(comp) == raw


def test_foreign_stream_bit_exact():
    comp = read_testdata("alice29.snappy")
    assert native.uncompress(comp) == read_testdata("alice29.txt")


def test_empty_and_small():
    for raw in [b"", b"a", b"ab", b"abc", b"a" * 100]:
        assert native.uncompress(native.compress(raw)) == raw


@pytest.mark.parametrize("name", ["baddata1.snappy", "baddata2.snappy", "baddata3.snappy"])
def test_baddata_raises(name):
    with pytest.raises(CorruptInputError):
        native.uncompress(read_testdata(name))


def test_corrupt_streams_raise():
    for raw in [
        bytes([0xF0]),
        bytes([0x40, 0x12, 0x00, 0x00]),  # offset==0 copy
        bytes([0x05, 0x12, 0x00, 0x00]),
        bytes([0x30, 39 << 2, 0x61, 0x62]),  # literal overruns input
    ]:
        with pytest.raises(CorruptInputError):
            native.uncompress(raw)


def test_header_lies():
    comp = bytearray(native.compress(b"A" * 100000))
    comp[0] = comp[1] = comp[2] = comp[3] = 0
    with pytest.raises(CorruptInputError):
        native.uncompress(bytes(comp))


def test_truncated_tag_at_end():
    # A multi-byte tag truncated by the stream end must not overread.
    raw = bytes([0x10, 0xF8])  # claims 16 bytes, 4-byte-length literal tag, no length bytes
    with pytest.raises(CorruptInputError):
        native.uncompress(raw)


def test_random_roundtrip(rng):
    dictionary = [rng.integers(0, 256, size=rng.integers(1, 17), dtype=np.uint8) for _ in range(64)]
    for _ in range(25):
        n_words = int(rng.integers(1, 1 << 14))
        raw = np.concatenate([dictionary[rng.integers(0, 64)] for _ in range(n_words)]).tobytes()
        comp = native.compress(raw)
        assert native.uncompress(comp) == raw
        assert comp == oracle.compress(raw)
