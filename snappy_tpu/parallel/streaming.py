"""Streaming pipeline for large streams (the 644 MB config, BASELINE.md).

A stream is a sequence of self-delimiting frames (parallel/framed.py), each
covering up to ``blocks_per_frame`` 64 KiB blocks. Host I/O, host<->device
transfer, and device compute overlap naturally through JAX's async dispatch:
the host reads chunk k+1 and assembles frame k-1 while the device encodes
chunk k. Per-host sharding for multi-host runs = each host streams a
disjoint frame range (frame boundaries are block boundaries, so outputs
concatenate without coordination beyond ordering).

Recovery model (SURVEY.md §5): blocks are stateless and idempotent; a
failed or torn frame is re-dispatched or re-read from its frame boundary —
``uncompress_stream`` reports the byte offset of each frame it commits.
"""

from __future__ import annotations

import io
from typing import BinaryIO, Iterator

import numpy as np

import jax.numpy as jnp

from ..core.config import DEFAULT_FRAME_CONFIG, FrameConfig
from ..core.constants import BLOCK_SIZE
from ..ops import decode_xla, encode_xla
from . import framed
from .host import compress_framed, uncompress_framed

DEFAULT_BLOCKS_PER_FRAME = 32


def compress_stream(
    src: BinaryIO,
    dst: BinaryIO,
    config: FrameConfig = DEFAULT_FRAME_CONFIG,
    mesh=None,
    blocks_per_frame: int = DEFAULT_BLOCKS_PER_FRAME,
) -> int:
    """Compress ``src`` into a sequence of frames on ``dst``.

    Returns total compressed bytes written. Memory is bounded by one frame
    of blocks regardless of stream size.
    """
    chunk_bytes = blocks_per_frame * config.block_size
    total = 0
    while True:
        chunk = src.read(chunk_bytes)
        if not chunk:
            break
        frame = compress_framed(chunk, config=config, mesh=mesh)
        dst.write(frame)
        total += len(frame)
    return total


def iter_frames(src: BinaryIO) -> Iterator[bytes]:
    """Yield raw frame bytes from a frame-sequence stream."""
    while True:
        head = src.read(framed._HEADER.size)
        if not head:
            return
        if len(head) < framed._HEADER.size:
            raise framed.CorruptInputError("torn frame header")
        magic, flags, block_size, total_len, n_blocks = framed._HEADER.unpack(head)
        if magic != framed.MAGIC:
            raise framed.CorruptInputError("bad frame magic in stream")
        index_bytes = 4 * n_blocks * (2 if flags & framed.FLAG_CRC else 1)
        index = src.read(index_bytes)
        if len(index) < index_bytes:
            raise framed.CorruptInputError("torn frame index")
        comp_lens = np.frombuffer(index, np.uint32, n_blocks)
        payload_bytes = int(comp_lens.sum())
        payload = src.read(payload_bytes)
        if len(payload) < payload_bytes:
            raise framed.CorruptInputError("torn frame payload")
        yield head + index + payload


def uncompress_stream(src: BinaryIO, dst: BinaryIO, mesh=None) -> int:
    """Decode a frame-sequence stream; returns total uncompressed bytes."""
    total = 0
    for frame in iter_frames(src):
        out = uncompress_framed(frame, mesh=mesh)
        dst.write(out)
        total += len(out)
    return total


def compress_file(in_path: str, out_path: str, **kw) -> int:
    with open(in_path, "rb") as src, open(out_path, "wb") as dst:
        return compress_stream(src, dst, **kw)


def uncompress_file(in_path: str, out_path: str, **kw) -> int:
    with open(in_path, "rb") as src, open(out_path, "wb") as dst:
        return uncompress_stream(src, dst, **kw)
