"""Host-facing wrappers around the XLA codec kernels.

Handles what must stay on host: varint header parsing (it determines the
output allocation), padding to jit-cached shape buckets, device transfer,
and raising typed errors from the device's ``ok`` flag. Mirrors the
structure of the reference API layer (reference src/Snappy.jl:20-52) with
the scalar core swapped for device kernels.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..core import varint
from ..core.errors import CorruptInputError, InputTooLargeError
from ..utils.profiling import trace_annotation
from . import decode_xla


def _as_np(data) -> np.ndarray:
    if isinstance(data, np.ndarray):
        if data.dtype != np.uint8:
            raise TypeError(f"expected uint8 array, got {data.dtype}")
        return data
    if isinstance(data, str):
        data = data.encode("utf-8")
    return np.frombuffer(memoryview(data), dtype=np.uint8)


def _bucket(n: int, floor: int = 256) -> int:
    """Round up to a power of two so jit caches stay small."""
    b = floor
    while b < n:
        b <<= 1
    return b


def uncompress(data) -> bytes:
    """Decode a raw Snappy stream with the parallel XLA decoder."""
    comp = _as_np(data)
    ulen, start = varint.parse32(comp, 0)  # raises CorruptInputError
    nc = _bucket(len(comp))
    nu = _bucket(max(ulen, 1))
    padded = np.zeros(nc + decode_xla.COMP_PAD, dtype=np.uint8)
    padded[: len(comp)] = comp
    fn = decode_xla.decode_padded_jit(nc + decode_xla.COMP_PAD, nu)
    with trace_annotation("snappy.uncompress"):
        out, ok, _ = fn(jnp.asarray(padded), len(comp), ulen, start)
        ok = bool(ok)
    if not ok:
        raise CorruptInputError("corrupt snappy stream")
    return np.asarray(out[:ulen]).tobytes()


def compress(data) -> bytes:
    """Compress to a raw Snappy stream with the parallel XLA encoder."""
    from . import encode_xla  # deferred: heavier trace

    inp = _as_np(data)
    if len(inp) > 0xFFFFFFFF:
        raise InputTooLargeError("input exceeds 2**32-1 bytes")
    with trace_annotation("snappy.compress"):
        return encode_xla.compress_host(inp)
