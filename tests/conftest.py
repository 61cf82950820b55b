"""Test harness config.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported so
multi-chip shard_map/collective paths are exercised without TPU hardware
(SURVEY.md §4: mirror of the reference's single-host CI, plus the multi-chip
simulation the reference lacks).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

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
