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


# ---------------------------------------------------------------------------
# Resume-after-kill (SURVEY.md §5 checkpoint/resume): the frame sequence IS
# the checkpoint. Frames are self-delimiting and written in order, so after
# a crash the durable prefix of complete frames is recoverable by scanning,
# and work restarts from the first missing/torn frame — blocks are
# stateless and idempotent, so re-doing a torn frame is always safe.
# ---------------------------------------------------------------------------


def scan_durable_frames(path: str) -> tuple[int, int, int]:
    """Scan a (possibly torn) frame-sequence file.

    Returns (durable_bytes, n_frames, covered_output_bytes): the byte
    length of the longest prefix of COMPLETE frames, how many frames it
    holds, and how many uncompressed bytes they cover. A torn tail (from a
    crash mid-write) is simply not counted. Raises CorruptInputError only
    on a malformed COMPLETE prefix (bad magic with a full header present).
    """
    durable = frames = covered = 0
    try:
        with open(path, "rb") as f:
            while True:
                head = f.read(framed._HEADER.size)
                if len(head) < framed._HEADER.size:
                    break
                magic, flags, block_size, total_len, n_blocks = framed._HEADER.unpack(head)
                if magic != framed.MAGIC:
                    raise framed.CorruptInputError("bad frame magic in stream")
                index_bytes = 4 * n_blocks * (2 if flags & framed.FLAG_CRC else 1)
                index = f.read(index_bytes)
                if len(index) < index_bytes:
                    break
                payload_bytes = int(np.frombuffer(index, np.uint32, n_blocks).sum())
                payload = f.read(payload_bytes)
                if len(payload) < payload_bytes:
                    break
                durable += framed._HEADER.size + index_bytes + payload_bytes
                frames += 1
                covered += total_len
    except FileNotFoundError:
        pass
    return durable, frames, covered


def _full_chunk_prefix(path: str, chunk: int) -> tuple[int, int]:
    """Longest prefix of complete frames that each cover exactly ``chunk``
    input bytes. Returns (durable_bytes, covered_input_bytes); a short or
    torn frame (and everything after it) is not counted — those frames are
    simply re-done on resume (blocks are stateless and idempotent)."""
    durable = covered = 0
    try:
        with open(path, "rb") as f:
            while True:
                head = f.read(framed._HEADER.size)
                if len(head) < framed._HEADER.size:
                    break
                magic, flags, _bs, total_len, n_blocks = framed._HEADER.unpack(head)
                if magic != framed.MAGIC:
                    raise framed.CorruptInputError("bad frame magic in stream")
                index_bytes = 4 * n_blocks * (2 if flags & framed.FLAG_CRC else 1)
                index = f.read(index_bytes)
                if len(index) < index_bytes:
                    break
                payload_bytes = int(np.frombuffer(index, np.uint32, n_blocks).sum())
                payload = f.read(payload_bytes)
                if len(payload) < payload_bytes or total_len != chunk:
                    break
                durable += framed._HEADER.size + index_bytes + payload_bytes
                covered += total_len
    except FileNotFoundError:
        pass
    return durable, covered


def resume_compress_file(
    in_path: str,
    out_path: str,
    config: FrameConfig = DEFAULT_FRAME_CONFIG,
    mesh=None,
    blocks_per_frame: int = DEFAULT_BLOCKS_PER_FRAME,
) -> int:
    """Compress ``in_path`` to a frame sequence at ``out_path``, resuming
    from the last durable frame if a previous run died mid-stream.

    Returns the total compressed size. Restartable any number of times;
    a clean first run is just the empty-resume case."""
    import os

    durable, _, covered = scan_durable_frames(out_path)
    chunk = blocks_per_frame * config.block_size
    if covered % chunk:
        # The durable prefix ends in a short frame. If it completes the
        # input, the previous run finished — return as-is (dropping any
        # torn tail bytes past the durable prefix).
        in_size = os.path.getsize(in_path)
        if covered == in_size:
            if durable != os.path.getsize(out_path):
                fd = os.open(out_path, os.O_RDWR)
                try:
                    os.ftruncate(fd, durable)
                finally:
                    os.close(fd)
            return durable
        # Otherwise more input remains (e.g. the input grew after a
        # finished run, or frame geometry changed between runs): drop the
        # trailing short frame and restart from the longest CHUNK-ALIGNED
        # prefix of full frames — the stream stays restartable any number
        # of times, as the docstring promises.
        durable, covered = _full_chunk_prefix(out_path, chunk)
    with open(in_path, "rb") as src:
        src.seek(covered)
        fd = os.open(out_path, os.O_CREAT | os.O_RDWR, 0o644)
        try:
            os.ftruncate(fd, durable)
        finally:
            os.close(fd)
        with open(out_path, "r+b") as dst:
            dst.seek(durable)
            written = compress_stream(
                src, dst, config=config, mesh=mesh, blocks_per_frame=blocks_per_frame
            )
    return durable + written


def resume_uncompress_file(in_path: str, out_path: str, mesh=None, **kw) -> int:
    """Decode a frame-sequence file, resuming after a kill.

    Progress marker is the OUTPUT file itself: frames decode in order and
    append, so a crash leaves a (possibly torn) prefix; resume truncates
    to the last whole-frame boundary and decodes the remaining frames.
    Returns total uncompressed bytes."""
    import os

    done = 0  # durable output bytes
    try:
        out_size = os.path.getsize(out_path)
    except FileNotFoundError:
        out_size = 0

    with open(in_path, "rb") as src:
        # walk the frame sequence to find the resume point
        skip_frames = 0
        covered = 0
        for frame in iter_frames(src):
            tl = framed._HEADER.unpack_from(frame, 0)[3]
            if covered + tl <= out_size:
                covered += tl
                skip_frames += 1
            else:
                break
        done = covered

    fd = os.open(out_path, os.O_CREAT | os.O_RDWR, 0o644)
    try:
        os.ftruncate(fd, done)
    finally:
        os.close(fd)

    total = done
    with open(in_path, "rb") as src, open(out_path, "r+b") as dst:
        it = iter_frames(src)
        for _ in range(skip_frames):
            next(it)
        dst.seek(done)
        pending: deque = deque()
        eof = False
        while not eof or pending:
            if not eof:
                frame = next(it, None)
                if frame is None:
                    eof = True
                else:
                    pending.append(_host.dispatch_uncompress(frame, mesh=mesh))
            while pending and (len(pending) > PIPELINE_DEPTH or eof):
                out = _host.assemble_uncompress(pending.popleft())
                dst.write(out)
                total += len(out)
    return total
