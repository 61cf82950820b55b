"""XLA parallel encoder tests: validity, density vs baseline, round trips.

The format gives encoders parse freedom (the reference itself diverges from
libsnappy by a few bytes, reference README.md:29); what we require is
(a) every stream decodes bit-exactly by independent decoders, and
(b) compressed size <= the libsnappy-equivalent baseline on every input
(BASELINE.md build target).
"""

import numpy as np
import pytest

from snappy_tpu.cpu import oracle
from snappy_tpu.core.constants import max_compressed_length
from snappy_tpu.ops import host as xh

from conftest import CORPUS_SMALL, read_testdata


def check_stream(raw: bytes):
    comp = xh.compress(raw)
    assert len(comp) <= max_compressed_length(len(raw))
    # Decode with both independent decoders.
    assert oracle.uncompress(comp) == raw
    assert xh.uncompress(comp) == raw
    return comp


@pytest.mark.parametrize("name", CORPUS_SMALL)
def test_corpus_small_roundtrip_and_density(name):
    raw = read_testdata(name)
    comp = check_stream(raw)
    assert len(comp) <= len(oracle.compress(raw)), "larger than libsnappy-equivalent baseline"


@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"a",
        b"ab",
        b"abc",
        b"aab",
        b"hello hello hello hello world world",
        b"x" * 16,
        b"x" * 1000,
        b"ab" * 5000,
        b"abcd" * 16384,  # exactly 64 KiB of period-4 data
        b"aaaaaaa" + b"b" * 2047 + b"aaaaa" + b"abc",
        b"aaaaaaa" + b"b" * 65536 + b"aaaaa" + b"abc",  # block boundary
        bytes(range(256)) * 16,
    ],
    ids=[str(i) for i in range(13)],
)
def test_simple_roundtrip(raw):
    check_stream(raw)


def test_native_decoder_accepts_xla_streams():
    nat = pytest.importorskip("snappy_tpu.native.runtime")
    if not nat.available():
        pytest.skip("native codec unavailable")
    for name in CORPUS_SMALL:
        raw = read_testdata(name)
        assert nat.uncompress(xh.compress(raw)) == raw


def test_max_blowup(rng):
    words = rng.integers(0, 1 << 32, size=20000, dtype=np.uint32)
    raw = np.concatenate([words, words[::-1]]).view(np.uint8).tobytes()
    comp = check_stream(raw)
    assert len(comp) <= max_compressed_length(len(raw))


def test_random_generated(rng):
    dictionary = [rng.integers(0, 256, size=rng.integers(1, 17), dtype=np.uint8) for _ in range(64)]
    for _ in range(5):
        n_words = int(rng.integers(1, 1 << 12))
        raw = np.concatenate([dictionary[rng.integers(0, 64)] for _ in range(n_words)]).tobytes()
        comp = check_stream(raw)
        assert len(comp) <= len(oracle.compress(raw))


def test_multi_block_stream():
    # >MAX_BATCH_BLOCKS blocks exercises the chunked host driver.
    raw = (b"The quick brown fox jumps over the lazy dog. " * 40000)[: 17 * 65536 + 123]
    check_stream(raw)
