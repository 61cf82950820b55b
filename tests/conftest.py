"""Test harness config.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported so
multi-chip shard_map/collective paths are exercised without TPU hardware
(SURVEY.md §4: mirror of the reference's single-host CI, plus the multi-chip
simulation the reference lacks).
"""

import os

# Force CPU: the session environment presets JAX_PLATFORMS=axon (the real
# TPU tunnel), where every jit compile is remote (~30s), and its
# sitecustomize registers the plugin at interpreter startup — so the env
# var alone is not enough; override the jax config as well. Tests must be
# hermetic and fast; bench.py is what runs on the real chip.
#
# Exception: SNAPPY_TPU_TEST_TPU=1 keeps the real device so the
# `-m tpu` compiled-kernel battery (tests/test_tpu_compiled.py) can run —
# the driver/bench invokes it that way on hardware.
import jax

if os.environ.get("SNAPPY_TPU_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")
else:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

TESTDATA = os.path.join(os.path.dirname(__file__), "..", "testdata")

CORPUS_FILES = [
    "alice29.txt",
    "asyoulik.txt",
    "html",
    "html_x_4",
    "kppkn.gtb",
    "lcet10.txt",
    "fireworks.jpeg",
    "geo.protodata",
    "paper-100k.pdf",
    "plrabn12.txt",
    "urls.10K",
    "random1.bin",
    "random2.bin",
    "random3.bin",
    "smallrandom1.bin",
    "sample-tweet.json",
]

# Small mixed subset for tests where the slow scalar oracle is the encoder.
CORPUS_SMALL = ["html", "fireworks.jpeg", "paper-100k.pdf", "sample-tweet.json", "smallrandom1.bin"]


@pytest.fixture(scope="session")
def testdata_dir():
    assert os.path.isdir(TESTDATA), f"missing corpus at {TESTDATA}"
    return TESTDATA


def read_testdata(name: str) -> bytes:
    with open(os.path.join(TESTDATA, name), "rb") as f:
        return f.read()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5EED)
