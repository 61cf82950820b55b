"""Platform-based kernel selection, shared by the single-host and the
mesh-sharded (shard_map) drivers so both run the same best kernel.

On a real TPU the Pallas kernels are the fast path (the XLA data-parallel
codecs fall back to scalar-rate gathers there, ~50x slower); on CPU hosts
and under interpret-mode tests the XLA codecs win. Pallas calls compose
with shard_map, so the sharded path selects identically per shard.
"""

from __future__ import annotations

from . import decode_xla, encode_xla, pallas_decode, pallas_encode


def on_tpu() -> bool:
    try:
        import jax

        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def block_decoder(cmax_padded: int, out_size: int):
    """Best block decoder for the current platform.

    (comp u8[B, cmax_padded], clens i32[B], ulens i32[B]) ->
    (out u8[B, out_size], ok bool[B], total i32[B]).
    """
    if on_tpu() and out_size % pallas_decode.LANES == 0:
        return pallas_decode.decode_blocks_jit(cmax_padded, out_size)
    return decode_xla.decode_blocks_jit(cmax_padded, out_size)


def block_encoder(n_blocks: int, block_size: int, min_profit: int | None = None):
    """Best block encoder for the current platform (see block_decoder; the
    Pallas greedy-parse kernel compresses denser than libsnappy and is the
    only encoder that runs at usable speed on chip). ``min_profit`` is the
    greedy take threshold (None = CodecConfig default)."""
    if min_profit is None:
        from ..core.config import DEFAULT_MIN_PROFIT

        min_profit = DEFAULT_MIN_PROFIT
    if (
        on_tpu()
        and block_size % pallas_encode.LANES == 0
        and block_size <= pallas_encode.BLOCK_SIZE
    ):
        return pallas_encode.encode_blocks_jit(block_size, False, min_profit)
    return encode_xla.encode_blocks_jit(n_blocks)
