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


def test_transient_frame_failure_recovers(monkeypatch):
    """A frame decode that fails once is re-dispatched and succeeds
    (SURVEY.md §5: blocks are stateless, recovery = re-dispatch)."""
    raw = read_testdata("html_x_4")
    src, dst = io.BytesIO(raw), io.BytesIO()
    streaming.compress_stream(src, dst, blocks_per_frame=2)
    dst.seek(0)

    from snappy_tpu.parallel import host as phost

    real = phost.assemble_uncompress
    fail_once = {"armed": True}

    def flaky(ticket):
        if fail_once["armed"]:
            fail_once["armed"] = False
            raise RuntimeError("injected transient device fault")
        return real(ticket)

    monkeypatch.setattr(phost, "assemble_uncompress", flaky)
    out = io.BytesIO()
    n = streaming.uncompress_stream(dst, out)
    assert n == len(raw) and out.getvalue() == raw
    assert streaming.last_stats["retries"] == 1


def test_corrupt_frame_does_not_retry(monkeypatch):
    """Data corruption is deterministic: the pipeline must NOT burn a
    re-dispatch on CorruptInputError (ADVICE r2) — only transient faults
    retry."""
    raw = read_testdata("html")
    src, dst = io.BytesIO(raw), io.BytesIO()
    streaming.compress_stream(src, dst)
    dst.seek(0)

    from snappy_tpu.parallel import host as phost

    calls = {"n": 0}

    def corrupt(ticket):
        calls["n"] += 1
        raise CorruptInputError("injected corruption")

    monkeypatch.setattr(phost, "assemble_uncompress", corrupt)
    with pytest.raises(CorruptInputError):
        streaming.uncompress_stream(dst, io.BytesIO())
    assert calls["n"] == 1  # no re-dispatch, no second decode


def test_persistent_frame_failure_raises(monkeypatch):
    raw = read_testdata("html")
    src, dst = io.BytesIO(raw), io.BytesIO()
    streaming.compress_stream(src, dst)
    dst.seek(0)

    from snappy_tpu.parallel import host as phost

    def broken(ticket):
        raise RuntimeError("injected permanent fault")

    monkeypatch.setattr(phost, "assemble_uncompress", broken)
    with pytest.raises(RuntimeError):
        streaming.uncompress_stream(dst, io.BytesIO())


def test_torn_stream_raises():
    src, dst = io.BytesIO(b"x" * 300000), io.BytesIO()
    streaming.compress_stream(src, dst)
    data = dst.getvalue()
    for cut in [3, len(data) - 5]:
        with pytest.raises(CorruptInputError):
            out = io.BytesIO()
            streaming.uncompress_stream(io.BytesIO(data[:cut]), out)
