"""Pallas sequential-tag decoder: differential tests vs the CPU oracle.

Runs in interpret mode on the CPU test platform; the same kernel compiles
for TPU (Mosaic) where it is the device decode fast path.
"""

import numpy as np
import pytest

from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.cpu import oracle
from snappy_tpu.ops import pallas_decode

from conftest import read_testdata


def encoder(raw: bytes) -> bytes:
    try:
        from snappy_tpu.native import runtime as nat

        if nat.available():
            return nat.compress(raw)
    except Exception:
        pass
    return oracle.compress(raw)


def block_streams(raw: bytes):
    """Per-64KiB-block headerless tag streams + uncompressed lengths."""
    streams, ulens = [], []
    for i in range(0, max(len(raw), 1), BLOCK_SIZE):
        chunk = raw[i : i + BLOCK_SIZE]
        comp = encoder(chunk)
        _, start = oracle.uncompressed_length(np.frombuffer(comp, np.uint8))
        streams.append(np.frombuffer(comp, np.uint8)[start:])
        ulens.append(len(chunk))
    return streams, ulens


def run_decode(streams, ulens, out_size=BLOCK_SIZE):
    import jax.numpy as jnp

    cmax = max(len(s) for s in streams) + pallas_decode.COMP_PAD
    buf = np.zeros((len(streams), cmax), np.uint8)
    for i, s in enumerate(streams):
        buf[i, : len(s)] = s
    clens = np.array([len(s) for s in streams], np.int32)
    fn = pallas_decode.decode_blocks_jit(cmax, out_size, interpret=True)
    out, ok, total = fn(
        jnp.asarray(buf), jnp.asarray(clens), jnp.asarray(np.array(ulens, np.int32))
    )
    return np.asarray(out), np.asarray(ok), np.asarray(total)


@pytest.mark.parametrize("name", ["html", "fireworks.jpeg", "paper-100k.pdf", "urls.10K"])
def test_corpus_blocks_bit_exact(name):
    raw = read_testdata(name)[: 4 * BLOCK_SIZE]
    streams, ulens = block_streams(raw)
    out, ok, total = run_decode(streams, ulens)
    assert ok.all(), f"decode flagged corrupt on {name}"
    got = b"".join(bytes(out[i, : ulens[i]]) for i in range(len(streams)))
    assert got == raw


@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"a",
        b"hello hello hello hello world world",
        b"x" * 1000,
        b"ab" * 5000,
        b"q" * 65536,  # full-block offset-1 RLE: maximal chunk doubling
        bytes(range(256)) * 16,
        b"abcdefg" * 9363,  # period-7 RLE
    ],
    ids=[str(i) for i in range(8)],
)
def test_simple_blocks(raw):
    streams, ulens = block_streams(raw)
    out, ok, total = run_decode(streams, ulens)
    assert ok.all()
    got = b"".join(bytes(out[i, : ulens[i]]) for i in range(len(streams)))
    assert got == raw


def test_copy4_and_long_offsets():
    # COPY_4 decode support (reference src/internal.jl:24-31): 4 literals
    # then a COPY_4 of len 4 offset 4. Headerless stream.
    stream = np.frombuffer(
        bytes([0x0C, 97, 98, 99, 100, 0x0F, 4, 0, 0, 0]), np.uint8
    )
    out, ok, total = run_decode([stream], [8], out_size=128)
    assert ok.all() and bytes(out[0, :8]) == b"abcdabcd"


@pytest.mark.parametrize(
    "body",
    [
        bytes([0x12, 0x00, 0x00]),  # copy offset==0
        bytes([0x61, 0x09, 0x20, 0x00]),  # copy reaches before output start
        bytes([39 << 2, 0x61, 0x62]),  # literal overruns input
        bytes([0xF8]),  # truncated long-form literal tag
        bytes([0x01]),  # truncated copy tag (missing offset byte)
    ],
)
def test_corrupt_blocks_flagged(body):
    stream = np.frombuffer(body, np.uint8)
    out, ok, total = run_decode([stream], [64], out_size=128)
    assert not ok.any()


def test_wrong_claimed_length_flagged():
    comp = encoder(b"A" * 1000)
    _, start = oracle.uncompressed_length(np.frombuffer(comp, np.uint8))
    stream = np.frombuffer(comp, np.uint8)[start:]
    out, ok, total = run_decode([stream], [999], out_size=1024)
    assert not ok.any()
    out, ok, total = run_decode([stream], [1024], out_size=1024)
    assert not ok.any()


def test_batched_mixed_blocks():
    blocks = [b"hello world " * 100, b"z" * 5000, bytes(range(256)) * 8, b"ab" * 700]
    streams, ulens = [], []
    for raw in blocks:
        s, u = block_streams(raw)
        streams += s
        ulens += u
    out, ok, total = run_decode(streams, ulens, out_size=8192)
    assert ok.all()
    for i, raw in enumerate(blocks):
        assert bytes(out[i, : len(raw)]) == raw


class TestChainFold:
    """Same-offset COPY_2 chain folding (parse_cmds): the drain-record
    merge must be invisible in the decoded bytes for every chain shape."""

    @staticmethod
    def _copy2(length, off):
        return bytes([0x02 | ((length - 1) << 2), off & 0xFF, off >> 8])

    @staticmethod
    def _copy1(length, off):
        assert 4 <= length <= 11 and off < 2048
        return bytes([0x01 | ((length - 4) << 2) | ((off >> 8) << 5), off & 0xFF])

    @staticmethod
    def _lit(data):
        n = len(data)
        assert n <= 60
        return bytes([(n - 1) << 2]) + data

    def _check(self, body: bytes, expect: bytes):
        out, ok, total = run_decode(
            [np.frombuffer(body, np.uint8)], [len(expect)], out_size=BLOCK_SIZE
        )
        assert ok.all() and int(total[0]) == len(expect)
        assert bytes(out[0, : len(expect)]) == expect

    def test_emit_style_chain_64_64_60_rem(self):
        base = bytes(range(37)) * 2  # 74-byte seed
        body = self._lit(base[:60]) + self._lit(base[60:])
        # 202-byte match at offset 74 = 64+64+60+14 chunks, all same f
        body += self._copy2(64, 74) + self._copy2(64, 74) + self._copy2(60, 74) + self._copy2(14, 74)
        # expected bytes: out[i] = out[i-74] for 202 bytes
        exp = bytearray(base)
        for _ in range(202):
            exp.append(exp[-74])
        self._check(body, bytes(exp))

    def test_chain_with_copy1_tail(self):
        base = b"abcdefghij" * 2
        body = self._lit(base) + self._copy2(64, 20) + self._copy1(8, 20)
        exp = bytearray(base)
        for _ in range(72):
            exp.append(exp[-20])
        self._check(body, bytes(exp))

    def test_different_offset_chain_does_not_merge_wrong(self):
        base = bytes(range(60))
        body = self._lit(base) + self._copy2(64, 30) + self._copy2(64, 29)
        exp = bytearray(base)
        for _ in range(64):
            exp.append(exp[-30])
        for _ in range(64):
            exp.append(exp[-29])
        self._check(body, bytes(exp))

    def test_rle_folded_chain(self):
        # f=1 runs: fold makes n=128 RLE records through the hazard path
        body = self._lit(b"x") + self._copy2(64, 1) + self._copy2(64, 1) + self._copy2(64, 1) + self._copy2(33, 1)
        self._check(body, b"x" * (1 + 64 * 3 + 33))

    def test_odd_chain_lengths(self):
        for k in (1, 2, 3, 5, 8):
            base = bytes((i * 7) & 0xFF for i in range(70))
            body = self._lit(base[:60]) + self._lit(base[60:])
            body += b"".join(self._copy2(64, 70) for _ in range(k)) + self._copy2(7, 70)
            exp = bytearray(base)
            for _ in range(64 * k + 7):
                exp.append(exp[-70])
            self._check(body, bytes(exp))

    def test_corrupt_mid_chain_truncation_flagged(self):
        base = bytes(range(60))
        body = self._lit(base) + self._copy2(64, 30) + self._copy2(64, 30)
        # truncate inside the second copy tag: stream must flag corrupt
        out, ok, total = run_decode(
            [np.frombuffer(body[:-1], np.uint8)], [60 + 128], out_size=BLOCK_SIZE
        )
        assert not ok.all()
