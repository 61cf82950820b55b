"""Scalar CPU oracle codec (ground truth for differential testing)."""

from .oracle import compress, uncompress, uncompressed_length

__all__ = ["compress", "uncompress", "uncompressed_length"]
