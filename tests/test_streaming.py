"""Streaming pipeline tests: frame sequences, bounded memory, recovery."""

import io

import numpy as np
import pytest

from snappy_tpu.core.errors import CorruptInputError
from snappy_tpu.parallel import streaming

from conftest import read_testdata


def roundtrip(raw: bytes, **kw) -> bytes:
    src, dst = io.BytesIO(raw), io.BytesIO()
    streaming.compress_stream(src, dst, **kw)
    dst.seek(0)
    out = io.BytesIO()
    n = streaming.uncompress_stream(dst, out)
    assert n == len(raw)
    return out.getvalue()


def test_multi_frame_stream():
    raw = read_testdata("urls.10K") + read_testdata("html_x_4")  # ~1.1 MB, 2 frames
    assert roundtrip(raw) == raw


def test_small_blocks_per_frame():
    raw = read_testdata("html")
    assert roundtrip(raw, blocks_per_frame=1) == raw


def test_empty_stream():
    assert roundtrip(b"") == b""


def test_frame_iteration_offsets():
    raw = read_testdata("html_x_4") * 3  # ~1.2 MB
    src, dst = io.BytesIO(raw), io.BytesIO()
    streaming.compress_stream(src, dst, blocks_per_frame=4)
    dst.seek(0)
    frames = list(streaming.iter_frames(dst))
    assert len(frames) == -(-((len(raw) + 65535) // 65536) // 4)
    # Resume from frame 2 only (recovery: re-dispatch from a frame boundary).
    from snappy_tpu.parallel import uncompress_framed

    partial = b"".join(uncompress_framed(f) for f in frames[2:])
    assert partial == raw[2 * 4 * 65536 :]


def test_torn_stream_raises():
    src, dst = io.BytesIO(b"x" * 300000), io.BytesIO()
    streaming.compress_stream(src, dst)
    data = dst.getvalue()
    for cut in [3, len(data) - 5]:
        with pytest.raises(CorruptInputError):
            out = io.BytesIO()
            streaming.uncompress_stream(io.BytesIO(data[:cut]), out)
