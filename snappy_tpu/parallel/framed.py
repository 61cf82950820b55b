"""Framed container: the distributed/parallel-native stream format.

The raw Snappy format is one sequential tag stream — decodable anywhere,
but its tag boundaries are only discoverable by scanning (the reference's
sequential loop, or our pointer-doubling pass). The framed container
records what the raw format throws away: per-block compressed sizes and
checksums. That makes decode embarrassingly parallel (each block is an
independent headerless tag stream), makes the stream resumable at any
block boundary (SURVEY.md §5 checkpoint/resume analogue), and gives
integrity checking the raw format lacks.

Layout (all little-endian):

    magic      8s   b"SNPTPU01"
    flags      u32  bit0 = per-block crc32c of the uncompressed block
    block_size u32  uncompressed bytes per block (last may be short)
    total_len  u64  uncompressed stream length
    n_blocks   u32
    index      n_blocks * u32          compressed byte length per block
    [crcs      n_blocks * u32]         if flags&1
    payload    concatenated headerless block tag streams

The payload blocks are byte-identical to the blocks a raw stream would
contain (reference src/Snappy.jl:29-33 concatenates exactly these), so
``frame_to_raw`` is a pure reframing that never touches block bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..core import varint
from ..core.config import DEFAULT_FRAME_CONFIG, FrameConfig
from ..core.errors import CorruptInputError

MAGIC = b"SNPTPU01"
_HEADER = struct.Struct("<8sIIQI")
FLAG_CRC = 1


class FrameIndex:
    """Parsed frame header + block index (host-side metadata)."""

    __slots__ = ("flags", "block_size", "total_len", "comp_lens", "crcs", "payload_start")

    def __init__(self, flags, block_size, total_len, comp_lens, crcs, payload_start):
        self.flags = flags
        self.block_size = block_size
        self.total_len = total_len
        self.comp_lens = comp_lens
        self.crcs = crcs
        self.payload_start = payload_start

    @property
    def n_blocks(self) -> int:
        return len(self.comp_lens)

    def block_ranges(self) -> list[tuple[int, int]]:
        """(start, end) byte range of each block's tag stream in the frame.

        A resumable reader restarts from the first block whose output it has
        not yet committed — blocks are stateless and idempotent."""
        out = []
        off = self.payload_start
        for cl in self.comp_lens:
            out.append((off, off + int(cl)))
            off += int(cl)
        return out

    def block_ulen(self, i: int) -> int:
        if i < self.n_blocks - 1:
            return self.block_size
        return self.total_len - self.block_size * (self.n_blocks - 1)


def parse_index(frame: bytes, require_payload: bool = True) -> FrameIndex:
    """Parse header + index. ``require_payload=False`` validates the index
    alone (distributed readers fetch payload ranges separately)."""
    if len(frame) < _HEADER.size:
        raise CorruptInputError("frame too short")
    magic, flags, block_size, total_len, n_blocks = _HEADER.unpack_from(frame, 0)
    if magic != MAGIC:
        raise CorruptInputError("bad frame magic")
    if block_size < 1 or block_size > 1 << 16:
        raise CorruptInputError("bad frame block size")
    expect_blocks = -(-total_len // block_size) if total_len else 0
    if n_blocks != expect_blocks:
        raise CorruptInputError("frame block count mismatch")
    off = _HEADER.size
    comp_lens = np.frombuffer(frame, np.uint32, n_blocks, off)
    off += 4 * n_blocks
    crcs = None
    if flags & FLAG_CRC:
        crcs = np.frombuffer(frame, np.uint32, n_blocks, off)
        off += 4 * n_blocks
    if require_payload and off + int(comp_lens.sum()) > len(frame):
        raise CorruptInputError("frame payload truncated")
    return FrameIndex(flags, block_size, total_len, comp_lens, crcs, off)


def build_frame_header(
    comp_lens: list[int],
    crcs: list[int] | None,
    total_len: int,
    config: FrameConfig = DEFAULT_FRAME_CONFIG,
) -> bytes:
    """Header + index only (no payload): what a distributed writer needs to
    place payload slices at their byte offsets (parallel/multihost.py)."""
    flags = FLAG_CRC if config.checksum else 0
    parts = [
        _HEADER.pack(MAGIC, flags, config.block_size, total_len, len(comp_lens)),
        np.array(comp_lens, np.uint32).tobytes(),
    ]
    if config.checksum:
        assert crcs is not None
        parts.append(np.array(crcs, np.uint32).tobytes())
    return b"".join(parts)


def build_frame(
    block_streams: list[bytes], block_raws: list[bytes] | None, total_len: int, config: FrameConfig = DEFAULT_FRAME_CONFIG
) -> bytes:
    """Assemble a frame from per-block tag streams (+ raw blocks for crcs)."""
    crcs = [zlib.crc32(b) for b in block_raws] if config.checksum else None
    header = build_frame_header([len(s) for s in block_streams], crcs, total_len, config)
    return header + b"".join(block_streams)


def verify_crcs_range(idx: FrameIndex, blocks_out: list[bytes], first_block: int) -> None:
    """verify_crcs for a contiguous block slice (distributed decoders check
    only the blocks they own)."""
    if idx.crcs is None:
        return
    for j, b in enumerate(blocks_out):
        i = first_block + j
        if zlib.crc32(b) != int(idx.crcs[i]):
            raise CorruptInputError(f"crc mismatch in block {i}")


def frame_to_raw(frame: bytes) -> bytes:
    """Reframe to the wire-compatible raw stream: varint header + the very
    same block tag streams, concatenated."""
    idx = parse_index(frame)
    if idx.block_size != 1 << 16:
        # Raw snappy decoders assume <=64 KiB offsets; any block_size <= 64K
        # still yields a valid raw stream.
        pass
    parts = [varint.encode32(idx.total_len)]
    for s, e in idx.block_ranges():
        parts.append(frame[s:e])
    return b"".join(parts)


def raw_to_frame(raw: bytes, config: FrameConfig = DEFAULT_FRAME_CONFIG) -> bytes:
    """Reframe a raw stream into a frame.

    Fast path: when the native segmenter finds exact block_size-output
    tag-stream segments (every block-based encoder's streams), the frame
    reuses the segment BYTES verbatim — no re-encode; the stream is
    decoded only to produce the per-block crcs the frame adds (and not
    at all when config.checksum is off). Streams that defeat
    segmentation (boundary-straddling tags, block-crossing copies) fall
    back to decode + re-encode."""
    from ..core import varint as _varint

    seg = None
    if config.block_size == 1 << 16:
        try:
            from ..native import runtime as nat

            if nat.available():
                comp = np.frombuffer(raw, np.uint8)
                ulen, start = _varint.parse32(comp, 0)
                seg = nat.scan_blocks(comp[start:], ulen) if ulen else None
        except ImportError:
            seg = None
    if seg is not None:
        starts, oplens = seg
        body = raw[start:]
        exact = all(int(oplens[i]) == config.block_size for i in range(len(oplens) - 1))
        if exact and len(oplens) > 0:
            bounds = list(int(s) for s in starts) + [len(body)]
            streams = [body[bounds[i] : bounds[i + 1]] for i in range(len(starts))]
            raws = None
            if config.checksum:
                from ..api import uncompress

                out = uncompress(raw)
                raws = [
                    out[i * config.block_size : (i + 1) * config.block_size]
                    for i in range(len(streams))
                ]
            return build_frame(streams, raws, ulen, config)

    from ..api import uncompress
    from .host import compress_framed

    return compress_framed(uncompress(raw), config=config)


def verify_crcs(idx: FrameIndex, blocks_out: list[bytes]) -> None:
    if idx.crcs is None:
        return
    for i, b in enumerate(blocks_out):
        if zlib.crc32(b) != int(idx.crcs[i]):
            raise CorruptInputError(f"crc mismatch in block {i}")
