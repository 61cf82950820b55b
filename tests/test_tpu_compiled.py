"""COMPILED-kernel battery (real TPU only; `pytest -m tpu`).

Every other Pallas test runs interpret=True; these run the Mosaic-compiled
kernels — the binaries the benchmarks time — against exactly the surfaces
corrupt streams stress (guard-row clamps, hazard queue, ok-flag paths;
mirror of reference test/runtests.jl:62-123), plus RLE-deep blocks, a full
corpus batch, the per-file prod-density gate, and the raw-stream fast path.

The driver/bench runs this on hardware: `python -m pytest -m tpu tests/`.
All shapes reuse the benchmark buckets so compiles are shared with bench.py.
"""

import numpy as np
import pytest

import jax

from snappy_tpu.core import varint
from snappy_tpu.core.config import DEFAULT_MIN_PROFIT
from snappy_tpu.core.constants import BLOCK_SIZE
from snappy_tpu.cpu import oracle

from conftest import read_testdata

pytestmark = pytest.mark.tpu

if jax.devices()[0].platform != "tpu":
    pytest.skip("compiled-kernel battery needs a real TPU", allow_module_level=True)

from snappy_tpu.ops import pallas_decode, pallas_encode  # noqa: E402

OUT_SIZE = 1 << 13  # small-block bucket: one compile for the whole battery
CMAX = 8192 + pallas_decode.COMP_PAD


def run_compiled_decode(bodies, ulens, out_size=OUT_SIZE, cmax=CMAX):
    dec = pallas_decode.decode_blocks_jit(cmax, out_size, False)
    nb = len(bodies)
    comp = np.zeros((nb, cmax), np.uint8)
    for i, b in enumerate(bodies):
        comp[i, : len(b)] = np.frombuffer(bytes(b), np.uint8)
    clens = np.array([len(b) for b in bodies], np.int32)
    out, ok, total = dec(
        jax.numpy.asarray(comp),
        jax.numpy.asarray(clens),
        jax.numpy.asarray(np.asarray(ulens, np.int32)),
    )
    return np.asarray(out), np.asarray(ok), np.asarray(total)


def test_compiled_corrupt_battery():
    """All structurally-corrupt block shapes must flag ok=False on Mosaic,
    batched in ONE dispatch (also proves a bad block cannot poison its
    batch neighbours)."""
    corrupt = [
        bytes([0x12, 0x00, 0x00]),  # copy offset==0
        bytes([0x61, 0x09, 0x20, 0x00]),  # copy reaches before output start
        bytes([39 << 2, 0x61, 0x62]),  # literal overruns input
        bytes([0xF8]),  # truncated long-form literal tag
        bytes([0x01]),  # truncated copy tag
        bytes([0x0C, 97, 98, 99, 100, 0x0F, 4, 0, 255, 255]),  # COPY_4 wild offset
    ]
    good = oracle.compress(b"hello world " * 40)
    _, hdr = oracle.uncompressed_length(np.frombuffer(good, np.uint8))
    bodies = corrupt + [good[hdr:]]
    ulens = [64] * len(corrupt) + [480]
    out, ok, total = run_compiled_decode(bodies, ulens)
    assert not ok[: len(corrupt)].any(), ok
    assert ok[-1] and bytes(out[-1, :480]) == b"hello world " * 40


def test_compiled_wrong_claimed_length():
    comp = oracle.compress(b"A" * 1000)
    _, hdr = oracle.uncompressed_length(np.frombuffer(comp, np.uint8))
    body = comp[hdr:]
    out, ok, _ = run_compiled_decode([body, body], [999, 1001])
    assert not ok.any()


def test_compiled_rle_deep_chain():
    """f=1 runs and doubling chains: the hazard queue + in-register periodic
    fill paths, compiled."""
    raws = [
        b"\x00" * 8000,  # pure f=1 run
        b"ab" * 4000,  # f=2 period
        (b"x" * 100 + bytes(range(200))) * 26,  # mixed runs + literals
    ]
    bodies, ulens = [], []
    for raw in raws:
        s = oracle.compress(raw)
        _, hdr = oracle.uncompressed_length(np.frombuffer(s, np.uint8))
        bodies.append(s[hdr:])
        ulens.append(len(raw))
    out, ok, _ = run_compiled_decode(bodies, ulens)
    assert ok.all()
    for i, raw in enumerate(raws):
        assert bytes(out[i, : len(raw)]) == raw


def test_compiled_full_corpus_roundtrip_and_density():
    """Encode the full corpus on-device at prod min_profit; decode it back
    compiled; gate density PER FILE against the native greedy baseline
    (no slack — the README claim, CI-enforced here)."""
    from snappy_tpu.native import runtime as nat

    names = [
        "alice29.txt", "asyoulik.txt", "html", "html_x_4", "urls.10K",
        "fireworks.jpeg", "paper-100k.pdf", "lcet10.txt", "plrabn12.txt",
        "geo.protodata", "kppkn.gtb", "sample-tweet.json", "random1.bin",
        "random2.bin", "random3.bin", "smallrandom1.bin",
    ]
    enc = pallas_encode.encode_blocks_jit(BLOCK_SIZE, False, DEFAULT_MIN_PROFIT)
    dec = pallas_decode.decode_blocks_jit(66048, BLOCK_SIZE, False)
    for name in names:
        raw = read_testdata(name)
        n_blocks = -(-len(raw) // BLOCK_SIZE)
        buf = np.zeros((n_blocks, BLOCK_SIZE + pallas_encode.ENC_PAD), np.uint8)
        blens = np.zeros(n_blocks, np.int32)
        for i in range(n_blocks):
            c = raw[i * BLOCK_SIZE : (i + 1) * BLOCK_SIZE]
            buf[i, : len(c)] = np.frombuffer(c, np.uint8)
            blens[i] = len(c)
        out, olens = enc(jax.numpy.asarray(buf), jax.numpy.asarray(blens))
        out = np.asarray(out)
        olens = np.asarray(olens)
        ours = int(olens.sum())
        theirs = len(nat.compress(raw)) - len(varint.encode32(len(raw))) if nat.available() else None
        if theirs is not None:
            assert ours <= theirs, f"{name}: device {ours} > native {theirs}"

        # compiled decode roundtrip of the device streams
        comp = np.zeros((n_blocks, 66048), np.uint8)
        for i in range(n_blocks):
            comp[i, : olens[i]] = out[i, : olens[i]]
        o2, ok, _ = dec(
            jax.numpy.asarray(comp),
            jax.numpy.asarray(olens),
            jax.numpy.asarray(blens),
        )
        assert np.asarray(ok).all(), name
        got = b"".join(bytes(np.asarray(o2)[i, : blens[i]]) for i in range(n_blocks))
        assert got == raw, name


def test_raw_fast_path_foreign_fixture():
    """alice29.snappy (non-blocking foreign encoder) through the production
    raw path: native segmentation + compiled Pallas block decode."""
    from snappy_tpu.ops import host as xh

    s = read_testdata("alice29.snappy")
    comp = np.frombuffer(s, np.uint8)
    ulen, start = varint.parse32(comp, 0)
    out = xh._uncompress_blocked(comp, ulen, start)
    assert out is not None, "fast path declined a segmentable stream"
    assert out == read_testdata("alice29.txt")


def test_raw_fast_path_native_stream():
    from snappy_tpu.ops import host as xh

    raw = (read_testdata("lcet10.txt") * 2)[: 5 * BLOCK_SIZE + 777]
    from snappy_tpu.native import runtime as nat

    s = nat.compress(raw) if nat.available() else oracle.compress(raw)
    assert xh.uncompress(s) == raw


def test_raw_fast_path_long_literal_and_wide_offset():
    """Round 5: a 70 KiB literal + wide-offset COPY_4 now SEGMENTS (merge +
    17-bit fields) and decodes on the compiled fast path; a 200 KiB literal
    still exceeds the envelope and must fall back to the sequential XLA
    decoder, not raise (round-3 bug: ops/host.py raised on the nak)."""
    from snappy_tpu.native import runtime as nat
    from snappy_tpu.ops import host as xh

    rng = np.random.RandomState(3)
    big = rng.randint(0, 256, 70_000).astype(np.uint8).tobytes()
    body = bytes([62 << 2]) + (len(big) - 1).to_bytes(3, "little") + big
    # wide-offset COPY_4 referencing bytes 69000 back
    body += bytes([(63 << 2) | 3]) + (69_000).to_bytes(4, "little")
    expect = big + big[1000:1064]
    stream = varint.encode32(len(expect)) + body
    if nat.available():
        assert nat.scan_blocks(stream[len(varint.encode32(len(expect))):], len(expect)) is not None
    assert xh.uncompress(stream) == expect

    big2 = rng.randint(0, 256, 200_000).astype(np.uint8).tobytes()
    body2 = bytes([62 << 2]) + (len(big2) - 1).to_bytes(3, "little") + big2
    stream2 = varint.encode32(len(big2)) + body2
    if nat.available():
        assert nat.scan_blocks(body2, len(big2)) is None
    assert xh.uncompress(stream2) == big2
