"""Framed container + distributed (8 virtual device) codec tests.

This is the coverage the reference lacks entirely (SURVEY.md §4: multi-chip
tests via host_platform_device_count): the shard_map block-parallel paths,
ordered output assembly, checksums, resumable index, and raw<->frame
round trips.
"""

import numpy as np
import pytest

import jax

from snappy_tpu.core.errors import CorruptInputError
from snappy_tpu.cpu import oracle
from snappy_tpu.parallel import (
    compress_framed,
    frame_to_raw,
    mesh_1d,
    parse_index,
    uncompress_framed,
)

from conftest import read_testdata

CASES = [
    b"",
    b"hello world " * 100,
    b"z" * 200000,  # multi-block RLE
    bytes(range(256)) * 1024,  # 256 KiB periodic, 4 blocks
]


@pytest.mark.parametrize("i", range(len(CASES)))
def test_frame_roundtrip_single_device(i):
    raw = CASES[i]
    frame = compress_framed(raw)
    assert uncompress_framed(frame) == raw


def test_frame_roundtrip_corpus_file():
    raw = read_testdata("html_x_4")
    frame = compress_framed(raw)
    assert uncompress_framed(frame) == raw
    idx = parse_index(frame)
    assert idx.n_blocks == -(-len(raw) // 65536)
    assert idx.total_len == len(raw)


def test_frame_to_raw_wire_compat():
    # The frame's payload blocks, reframed under a varint header, must be a
    # valid raw stream accepted by the scalar oracle decoder.
    raw = read_testdata("html")
    frame = compress_framed(raw)
    assert oracle.uncompress(frame_to_raw(frame)) == raw


def test_frame_crc_detects_payload_corruption():
    raw = b"The quick brown fox. " * 20000
    frame = bytearray(compress_framed(raw))
    idx = parse_index(bytes(frame))
    s, e = idx.block_ranges()[1]
    # Flip a byte inside a literal body: the raw format would silently
    # mis-decode; the frame crc must catch it.
    frame[e - 3] ^= 0xFF
    with pytest.raises(CorruptInputError):
        uncompress_framed(bytes(frame))


def test_frame_index_resumability():
    raw = read_testdata("html_x_4")
    frame = compress_framed(raw)
    idx = parse_index(frame)
    # Decode only blocks >= 3 via the index (a resuming reader).
    out = []
    for i in range(3, idx.n_blocks):
        s, e = idx.block_ranges()[i]
        from snappy_tpu.core import varint

        stream = varint.encode32(idx.block_ulen(i)) + frame[s:e]
        out.append(oracle.uncompress(stream))
    assert b"".join(out) == raw[3 * 65536 :]


def test_bad_frames_raise():
    with pytest.raises(CorruptInputError):
        parse_index(b"NOTMAGIC" + b"\x00" * 40)
    with pytest.raises(CorruptInputError):
        parse_index(b"\x00" * 4)
    good = compress_framed(b"x" * 100000)
    with pytest.raises(CorruptInputError):
        uncompress_framed(good[: len(good) - 10])  # truncated payload


@pytest.mark.parametrize("gather", [False, True])
def test_mesh_sharded_roundtrip(gather):
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = mesh_1d()
    raw = (read_testdata("html") + read_testdata("sample-tweet.json")) * 8  # ~14 blocks
    frame = compress_framed(raw, mesh=mesh)
    assert uncompress_framed(frame, mesh=mesh) == raw
    # Sharded and single-device frames are identical bit for bit: block
    # order is preserved by the global array layout (the 'ordered gather').
    assert frame == compress_framed(raw)


def test_mesh_sharded_gathered_decode():
    from snappy_tpu.parallel import distributed
    from snappy_tpu.ops import encode_xla, decode_xla

    mesh = mesh_1d()
    raw = read_testdata("urls.10K")
    n = len(raw)
    inp = np.frombuffer(raw, np.uint8)
    nb = distributed.pad_block_count(-(-n // 65536), 8)
    buf = np.zeros((nb, 65536 + encode_xla.ENC_PAD), np.uint8)
    blens = np.zeros(nb, np.int32)
    for i in range(-(-n // 65536)):
        c = inp[i * 65536 : (i + 1) * 65536]
        buf[i, : len(c)] = c
        blens[i] = len(c)
    out, olens = distributed.compress_blocks(buf, blens, mesh, gather=True)
    # gather=True: every device holds the full ordered result.
    assert out.shape[0] == nb
    out, olens = np.asarray(out), np.asarray(olens)
    # Rebuild the raw stream and decode with the oracle.
    from snappy_tpu.core import varint

    stream = varint.encode32(n) + b"".join(
        out[i, : olens[i]].tobytes() for i in range(-(-n // 65536))
    )
    assert oracle.uncompress(stream) == raw


from snappy_tpu.parallel import framed


class TestRawToFrame:
    def _roundtrip(self, raw_bytes, **cfg_kw):
        from snappy_tpu.core.config import FrameConfig
        from snappy_tpu.parallel.host import uncompress_framed

        cfg = FrameConfig(**cfg_kw) if cfg_kw else None
        frame = (
            framed.raw_to_frame(raw_bytes, config=cfg)
            if cfg
            else framed.raw_to_frame(raw_bytes)
        )
        return frame, uncompress_framed(frame)

    def test_native_stream_reframes_verbatim(self):
        """Block-local streams reframe without re-encoding: the frame's
        payload is byte-identical to the raw stream's tag bytes."""
        nat = pytest.importorskip("snappy_tpu.native.runtime")
        if not nat.available():
            pytest.skip("no native lib")
        raw = (read_testdata("alice29.txt") * 2)[: 3 * (1 << 16) + 999]
        s = nat.compress(raw)
        ulen, hdr = nat.uncompressed_length(s)
        frame, out = self._roundtrip(s)
        assert out == raw
        idx = framed.parse_index(frame)
        payload = frame[idx.payload_start :]
        assert payload == s[hdr:]  # verbatim reuse, no re-encode

    def test_foreign_nonblocking_stream_falls_back(self):
        s = read_testdata("alice29.snappy")
        _, out = self._roundtrip(s)
        assert out == read_testdata("alice29.txt")

    def test_no_checksum_config(self):
        nat = pytest.importorskip("snappy_tpu.native.runtime")
        if not nat.available():
            pytest.skip("no native lib")
        raw = read_testdata("html")
        s = nat.compress(raw)
        frame, out = self._roundtrip(s, checksum=False)
        assert out == raw
        assert framed.parse_index(frame).crcs is None
