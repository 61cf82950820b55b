"""Public API surface tests: backend dispatch, convenience types, errors."""

import numpy as np
import pytest

import snappy_tpu

from conftest import read_testdata


def test_default_roundtrip():
    raw = read_testdata("sample-tweet.json")
    assert snappy_tpu.uncompress(snappy_tpu.compress(raw)) == raw


@pytest.mark.parametrize("backend", ["cpu", "native", "xla"])
def test_backend_roundtrip(backend):
    if backend == "native":
        nat = pytest.importorskip("snappy_tpu.native.runtime")
        if not nat.available():
            pytest.skip("native unavailable")
    raw = read_testdata("sample-tweet.json")
    comp = snappy_tpu.compress(raw, backend=backend)
    assert snappy_tpu.uncompress(comp, backend=backend) == raw


def test_cross_backend_streams_decode_everywhere():
    raw = b"cross backend " * 999
    streams = {b: snappy_tpu.compress(raw, backend=b) for b in ["cpu", "xla"]}
    for src, comp in streams.items():
        for dst in ["cpu", "xla"]:
            assert snappy_tpu.uncompress(comp, backend=dst) == raw, (src, dst)


def test_input_types():
    for data in [b"bytes bytes", bytearray(b"bytearray!"), "a string string",
                 np.frombuffer(b"numpy numpy", np.uint8), memoryview(b"memoryview mv")]:
        expect = data.encode() if isinstance(data, str) else bytes(data)
        assert snappy_tpu.uncompress(snappy_tpu.compress(data)) == expect


def test_helpers():
    assert snappy_tpu.max_compressed_length(0) == 32
    assert snappy_tpu.max_compressed_length(65536) == 32 + 65536 + 10922
    comp = snappy_tpu.compress(b"q" * 12345)
    n, hdr = snappy_tpu.uncompressed_length(comp)
    assert n == 12345 and hdr == 2


def test_typed_errors_exported():
    assert issubclass(snappy_tpu.CorruptInputError, snappy_tpu.SnappyError)
    assert issubclass(snappy_tpu.InputTooLargeError, snappy_tpu.SnappyError)
    with pytest.raises(snappy_tpu.CorruptInputError):
        snappy_tpu.uncompress(b"\xf0")
