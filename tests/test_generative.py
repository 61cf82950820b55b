"""50-round generative battery + differential corrupt-stream fuzzer.

Mirrors the reference's randomized dictionary-word streams
(reference test/runtests.jl:35-60: 50 byte-API rounds + 50 String rounds of
up to 65536 random <=16-byte words) against the XLA device path, and adds
what the reference never had: a mutation fuzzer asserting all backends
AGREE accept/reject (and byte-for-byte output on accept) over corrupted
streams — raw snappy has no checksum, so a flip inside literal data must
decode identically everywhere, while structural damage must raise
everywhere.
"""

import numpy as np
import pytest

from snappy_tpu.core.errors import CorruptInputError
from snappy_tpu.cpu import oracle
from snappy_tpu.ops import host as xh

from conftest import read_testdata


def _dictionary(rng):
    return [rng.integers(0, 256, size=int(rng.integers(1, 17)), dtype=np.uint8) for _ in range(64)]


def _words_stream(rng, dictionary, n_words):
    return np.concatenate([dictionary[int(rng.integers(0, 64))] for _ in range(n_words)]).tobytes()


def test_generative_50_rounds_bytes():
    """50 rounds, word counts log-uniform in [1, 65536] (the reference's
    rand(1:65536) hits huge streams ~half the time; log-uniform keeps the
    battery under CI budget while still crossing the 64 KiB block boundary
    in many rounds)."""
    rng = np.random.default_rng(2024)
    dictionary = _dictionary(rng)
    crossed_block = 0
    for _ in range(50):
        n_words = int(np.exp(rng.uniform(0, np.log(65536))))
        raw = _words_stream(rng, dictionary, n_words)
        if len(raw) > 65536:
            crossed_block += 1
        comp = xh.compress(raw)
        assert xh.uncompress(comp) == raw
        assert oracle.uncompress(comp) == raw
        assert len(comp) <= len(oracle.compress(raw))
    assert crossed_block >= 3  # the battery must exercise multi-block streams


def test_generative_50_rounds_str():
    """String-API rounds (reference test/runtests.jl:50-60)."""
    rng = np.random.default_rng(77)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "x", "zz", "snappy" * 2]
    for _ in range(50):
        n_words = int(np.exp(rng.uniform(0, np.log(16384))))
        s = " ".join(words[int(rng.integers(0, len(words)))] for _ in range(n_words))
        comp = xh.compress(s)
        assert xh.uncompress(comp) == s.encode()


def _decode_all(comp: bytes):
    """Run every backend; return list of (name, outcome) where outcome is
    the decoded bytes or the string 'reject'."""
    outcomes = []
    for name, fn in _backends():
        try:
            outcomes.append((name, fn(comp)))
        except CorruptInputError:
            outcomes.append((name, "reject"))
    return outcomes


def _backends():
    b = [("oracle", oracle.uncompress), ("xla", xh.uncompress)]
    try:
        from snappy_tpu.native import runtime as nat

        if nat.available():
            def native_u(comp):
                try:
                    return nat.uncompress(comp)
                except Exception as e:  # native maps all corruption to CorruptInputError
                    raise CorruptInputError(str(e))

            b.append(("native", native_u))
    except Exception:
        pass
    return b


def test_differential_corrupt_fuzzer():
    """All backends must agree accept/reject (and bytes on accept) for
    mutated streams. 120 single-byte mutations + 30 truncations over two
    corpus seeds."""
    rng = np.random.default_rng(99)
    seeds = [read_testdata("sample-tweet.json"), read_testdata("html")[:30000]]
    checked = agreed_rejects = 0
    for raw in seeds:
        comp = bytearray(xh.compress(raw))
        for _ in range(60):
            pos = int(rng.integers(0, len(comp)))
            old = comp[pos]
            comp[pos] = int(rng.integers(0, 256))
            outcomes = _decode_all(bytes(comp))
            kinds = {o if isinstance(o, str) else "accept" for _, o in outcomes}
            assert len(kinds) == 1, f"backends disagree at byte {pos}: {[(n, o if isinstance(o, str) else len(o)) for n, o in outcomes]}"
            if "accept" in kinds:
                datas = {o for _, o in outcomes}
                assert len(datas) == 1, f"accepting backends decode differently at byte {pos}"
            else:
                agreed_rejects += 1
            checked += 1
            comp[pos] = old
        for _ in range(15):
            cut = int(rng.integers(1, len(comp)))
            outcomes = _decode_all(bytes(comp[:cut]))
            kinds = {o if isinstance(o, str) else "accept" for _, o in outcomes}
            assert len(kinds) == 1, f"backends disagree on truncation at {cut}"
            checked += 1
    assert checked == 150 and agreed_rejects > 10
