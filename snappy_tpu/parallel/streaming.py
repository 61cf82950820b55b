"""Streaming pipeline for large streams (the 644 MB config, BASELINE.md).

A stream is a sequence of self-delimiting frames (parallel/framed.py), each
covering up to ``blocks_per_frame`` 64 KiB blocks. The pipeline keeps a
bounded queue of in-flight device dispatches (JAX dispatch is async): while
the device works on chunk k, the host fences/assembles/writes frame k-d and
reads chunk k+1 — real read/compute/write overlap, bounded memory.

Recovery model (SURVEY.md §5): blocks are stateless and idempotent, so a
frame whose decode fails transiently is RE-DISPATCHED once from the frame
bytes still held by the pipeline before the error is raised; a frame that
fails twice is genuinely corrupt. ``uncompress_stream`` counts retries in
``last_stats`` for observability.
"""

from __future__ import annotations

from collections import deque
from typing import BinaryIO, Iterator

import numpy as np

from ..core.config import DEFAULT_FRAME_CONFIG, FrameConfig
from ..core.errors import CorruptInputError
from . import framed
from . import host as _host

DEFAULT_BLOCKS_PER_FRAME = 32
# In-flight device dispatches. 2 = classic double-buffering: one frame being
# assembled on host while the next computes on device.
PIPELINE_DEPTH = 2

#: stats of the most recent uncompress_stream call: {"frames": n, "retries": n}
last_stats: dict = {}


def compress_stream(
    src: BinaryIO,
    dst: BinaryIO,
    config: FrameConfig = DEFAULT_FRAME_CONFIG,
    mesh=None,
    blocks_per_frame: int = DEFAULT_BLOCKS_PER_FRAME,
) -> int:
    """Compress ``src`` into a sequence of frames on ``dst``.

    Returns total compressed bytes written. Memory is bounded by
    PIPELINE_DEPTH+1 frames of blocks regardless of stream size.
    """
    chunk_bytes = blocks_per_frame * config.block_size
    total = 0
    pending: deque = deque()
    eof = False
    while not eof or pending:
        if not eof:
            chunk = src.read(chunk_bytes)
            if chunk:
                pending.append(_host.dispatch_compress(chunk, config=config, mesh=mesh))
            else:
                eof = True
        while pending and (len(pending) > PIPELINE_DEPTH or eof):
            frame = _host.assemble_compress(pending.popleft())
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


def uncompress_stream(src: BinaryIO, dst: BinaryIO, mesh=None, max_retries: int = 1) -> int:
    """Decode a frame-sequence stream; returns total uncompressed bytes.

    A frame whose decode fails is re-dispatched up to ``max_retries`` times
    from its (still held) frame bytes before the error propagates — blocks
    are stateless, so recovery from a transient device fault is re-dispatch.
    """
    global last_stats
    total = 0
    frames = 0
    retries = 0
    retry_exc: str | None = None
    pending: deque = deque()  # (frame_bytes, ticket)

    def commit(frame_bytes, ticket) -> bytes:
        nonlocal retries, retry_exc
        for attempt in range(max_retries + 1):
            try:
                return _host.assemble_uncompress(ticket)
            except CorruptInputError:
                # Data corruption is deterministic: re-decoding the same
                # bytes cannot succeed, so don't waste device work on it.
                raise
            except Exception as e:
                if attempt == max_retries:
                    raise
                retries += 1
                retry_exc = type(e).__name__
                ticket = _host.dispatch_uncompress(frame_bytes, mesh=mesh)
        raise AssertionError("unreachable")

    it = iter_frames(src)
    eof = False
    while not eof or pending:
        if not eof:
            frame = next(it, None)
            if frame is None:
                eof = True
            else:
                pending.append((frame, _host.dispatch_uncompress(frame, mesh=mesh)))
        while pending and (len(pending) > PIPELINE_DEPTH or eof):
            out = commit(*pending.popleft())
            dst.write(out)
            total += len(out)
            frames += 1
    last_stats = {"frames": frames, "retries": retries}
    if retry_exc is not None:
        last_stats["last_retry_exception"] = retry_exc
    return total


def compress_file(in_path: str, out_path: str, **kw) -> int:
    with open(in_path, "rb") as src, open(out_path, "wb") as dst:
        return compress_stream(src, dst, **kw)


def uncompress_file(in_path: str, out_path: str, **kw) -> int:
    with open(in_path, "rb") as src, open(out_path, "wb") as dst:
        return uncompress_stream(src, dst, **kw)
