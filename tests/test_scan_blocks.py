"""Segmentation prepass for raw streams (native scan_blocks): the device
fast path's host half. Reference decode semantics: src/internal.jl:411-466;
block independence: src/Snappy.jl:29-33."""

import numpy as np
import pytest

from snappy_tpu.core import varint
from snappy_tpu.core.errors import CorruptInputError
from snappy_tpu.cpu import oracle

from conftest import read_testdata

nat = pytest.importorskip("snappy_tpu.native.runtime")
if not nat.available():
    pytest.skip("native library unavailable", allow_module_level=True)


def split_decode(stream: bytes) -> bytes:
    """Decode via scan_blocks segmentation + per-segment oracle decode —
    exactly the structure of the TPU fast path, minus the device."""
    ulen, hdr = nat.uncompressed_length(stream)
    body = stream[hdr:]
    scan = nat.scan_blocks(body, ulen)
    assert scan is not None
    starts, oplens = scan
    assert int(oplens.sum()) == ulen
    bounds = list(starts) + [len(body)]
    out = b""
    for i in range(len(starts)):
        out += oracle.uncompress(
            varint.encode32(int(oplens[i])) + body[bounds[i] : bounds[i + 1]]
        )
    return out


@pytest.mark.parametrize("name", ["alice29.txt", "html_x_4", "urls.10K"])
def test_scan_splits_native_streams_bit_exact(name):
    raw = read_testdata(name)
    s = nat.compress(raw)
    assert split_decode(s) == raw


def test_scan_splits_foreign_fixture():
    # alice29.snappy: produced by a foreign snappy implementation.
    s = read_testdata("alice29.snappy")
    assert split_decode(s) == read_testdata("alice29.txt")


def test_scan_block_count_and_offsets_monotonic():
    raw = (read_testdata("alice29.txt") * 3)[: 5 * (1 << 16) + 1234]
    s = nat.compress(raw)
    ulen, hdr = nat.uncompressed_length(s)
    starts, oplens = nat.scan_blocks(s[hdr:], ulen)
    # block-based encoder -> exact 64 KiB segments
    assert len(starts) == 6 and starts[0] == 0
    assert (np.diff(starts) > 0).all()
    assert (oplens[:-1] == 1 << 16).all() and int(oplens[-1]) == 1234


def test_boundary_crossing_literal_makes_long_segment():
    # A VALID stream whose literal spans a 64 KiB output boundary (a
    # non-blocking encoder's stream): the segmenter extends the segment to
    # the next tag boundary instead of declining.
    big = bytes(range(256)) * 512  # 128 KiB
    lit1 = 70000
    body = bytes([62 << 2]) + (lit1 - 1).to_bytes(3, "little") + big[:lit1]
    rem = len(big) - lit1
    body += bytes([62 << 2]) + (rem - 1).to_bytes(3, "little") + big[lit1:]
    stream = varint.encode32(len(big)) + body
    assert oracle.uncompress(stream) == big
    starts, oplens = nat.scan_blocks(body, len(big))
    assert list(oplens) == [lit1, rem]
    assert split_decode(stream) == big


def test_block_crossing_copy_falls_back():
    # Copy whose source reaches behind its block start: block 1 copying
    # bytes produced in block 0. Valid snappy; not block-local.
    blk = bytes([1]) * (1 << 16)
    body = bytes([62 << 2]) + ((1 << 16) - 1).to_bytes(3, "little") + blk
    # 4-byte copy at offset 100 — source is inside block 0, dst in block 1
    body += bytes([0x01 | (0 << 2)]) + bytes([100])  # COPY_1 len=4 off=100
    lit2 = bytes([3 << 2]) + b"abcd"
    body += lit2
    ulen = (1 << 16) + 8
    assert oracle.uncompress(varint.encode32(ulen) + body) == blk + blk[-100 : -100 + 4] + b"abcd"
    assert nat.scan_blocks(body, ulen) is None


def test_corrupt_scan_raises():
    raw = read_testdata("html")
    s = nat.compress(raw)
    ulen, hdr = nat.uncompressed_length(s)
    with pytest.raises(CorruptInputError):
        nat.scan_blocks(s[hdr : hdr + (len(s) - hdr) // 2], ulen)
