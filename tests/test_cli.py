"""Command-line interface (python -m snappy_tpu): compress/decompress/info
across formats, with format auto-detection and stream resume."""

import numpy as np
import pytest

from snappy_tpu.__main__ import main

from conftest import read_testdata


@pytest.fixture
def sample(tmp_path):
    p = tmp_path / "in.txt"
    p.write_bytes(read_testdata("html") * 3)
    return p


@pytest.mark.parametrize("fmt", ["raw", "framed", "stream"])
def test_roundtrip_formats(fmt, sample, tmp_path, capsys):
    comp = tmp_path / f"c.{fmt}"
    out = tmp_path / f"o.{fmt}"
    assert main(["compress", str(sample), str(comp), "--format", fmt]) == 0
    assert main(["decompress", str(comp), str(out)]) == 0
    assert out.read_bytes() == sample.read_bytes()
    assert main(["info", str(comp)]) == 0
    assert str(len(comp.read_bytes())) in capsys.readouterr().out


def test_stream_resume(sample, tmp_path):
    comp = tmp_path / "c.snpf"
    out = tmp_path / "o.bin"
    assert main(["compress", str(sample), str(comp), "--format", "stream"]) == 0
    out.write_bytes(sample.read_bytes()[:1000])  # torn output from a kill
    assert main(["decompress", str(comp), str(out), "--resume"]) == 0
    assert out.read_bytes() == sample.read_bytes()


def test_single_durable_frame_with_torn_tail_raises(sample, tmp_path):
    """A stream killed while writing its SECOND frame (durable prefix = one
    frame + trailing bytes) must not silently decode to just the first
    frame's data — it raises like the >=2-durable-frame torn case does."""
    comp = tmp_path / "c.snpf"
    out = tmp_path / "o.bin"
    big = tmp_path / "big.bin"
    big.write_bytes(read_testdata("html") * 24)  # ~2.4 MB: two stream frames
    assert main(["compress", str(big), str(comp), "--format", "stream"]) == 0
    from snappy_tpu.parallel import streaming

    full = comp.read_bytes()
    durable, nframes, _ = streaming.scan_durable_frames(str(comp))
    assert nframes >= 2
    first_end = 0
    with open(comp, "rb") as f:
        first_end = len(next(streaming.iter_frames(f)))
    comp.write_bytes(full[: first_end + 40])  # one frame + torn second
    from snappy_tpu.core.errors import CorruptInputError

    with pytest.raises(CorruptInputError):
        main(["decompress", str(comp), str(out)])


def test_auto_format_small_is_raw(sample, tmp_path):
    comp = tmp_path / "c.auto"
    small = tmp_path / "small.txt"
    small.write_bytes(b"hello world " * 10)
    assert main(["compress", str(small), str(comp)]) == 0
    # raw streams don't start with the frame magic
    from snappy_tpu.parallel import framed

    assert comp.read_bytes()[:8] != framed.MAGIC
    out = tmp_path / "o.auto"
    assert main(["decompress", str(comp), str(out)]) == 0
    assert out.read_bytes() == small.read_bytes()
