"""Pallas greedy encoder: round-trip + density tests (interpret mode)."""

import numpy as np
import pytest

from snappy_tpu.core import varint
from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.cpu import oracle
from snappy_tpu.ops import pallas_encode

from conftest import read_testdata


def encode_blocks(raw: bytes, block_size=BLOCK_SIZE):
    import jax.numpy as jnp

    n = len(raw)
    nb = max(-(-n // block_size), 1)
    buf = np.zeros((nb, block_size + pallas_encode.ENC_PAD), np.uint8)
    blens = np.zeros(nb, np.int32)
    for i in range(nb):
        chunk = raw[i * block_size : (i + 1) * block_size]
        buf[i, : len(chunk)] = np.frombuffer(chunk, np.uint8)
        blens[i] = len(chunk)
    fn = pallas_encode.encode_blocks_jit(block_size, interpret=True)
    out, olens = fn(jnp.asarray(buf), jnp.asarray(blens))
    out, olens = np.asarray(out), np.asarray(olens)
    return [out[i, : olens[i]].tobytes() for i in range(nb)]


def roundtrip(raw: bytes) -> bytes:
    streams = encode_blocks(raw)
    full = varint.encode32(len(raw)) + b"".join(streams)
    return oracle.uncompress(np.frombuffer(full, np.uint8))


@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"a",
        b"abc",
        b"hello hello hello hello world world",
        b"x" * 1000,
        b"ab" * 5000,
        bytes(range(256)) * 8,
        b"abcdefg" * 1000,
        np.random.default_rng(7).integers(0, 256, 3000).astype(np.uint8).tobytes(),
    ],
    ids=[str(i) for i in range(9)],
)
def test_roundtrip_simple(raw):
    assert roundtrip(raw) == raw


@pytest.mark.parametrize("name", ["html", "sample-tweet.json", "fireworks.jpeg"])
def test_roundtrip_corpus(name):
    raw = read_testdata(name)[: 2 * BLOCK_SIZE]
    assert roundtrip(raw) == raw


def test_block_boundary():
    raw = (b"q" * 70000) + b"tail" * 10
    assert roundtrip(raw) == raw


@pytest.mark.parametrize("name", ["html", "sample-tweet.json"])
def test_density_vs_native(name):
    """Compressed size must not exceed the libsnappy-equivalent native
    encoder's by more than 2% (exact match-finding usually wins; the
    margin covers the missing lazy-demotion pass)."""
    try:
        from snappy_tpu.native import runtime as nat

        if not nat.available():
            pytest.skip("native codec unavailable")
    except Exception:
        pytest.skip("native codec unavailable")
    raw = read_testdata(name)[: 2 * BLOCK_SIZE]
    ours = sum(len(s) for s in encode_blocks(raw))
    ref = len(nat.compress(raw)) - len(varint.encode32(len(raw)))
    assert ours <= ref * 1.02, f"{name}: pallas {ours} vs native {ref}"
