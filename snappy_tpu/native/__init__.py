"""Native C++ host codec (built on demand, consumed via ctypes)."""

from . import build, runtime  # noqa: F401

__all__ = ["build", "runtime"]
