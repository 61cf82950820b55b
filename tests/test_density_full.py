"""Full-corpus density gate (slow): XLA encoder <= native baseline on every
file — the BASELINE.md build target 'compressed size <= libsnappy per file'."""

import numpy as np
import pytest

from snappy_tpu.ops import host as xh

from conftest import CORPUS_FILES, read_testdata

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("name", CORPUS_FILES)
def test_density_beats_baseline(name):
    nat = pytest.importorskip("snappy_tpu.native.runtime")
    if not nat.available():
        pytest.skip("native unavailable")
    raw = read_testdata(name)
    comp = xh.compress(raw)
    assert nat.uncompress(comp) == raw
    assert len(comp) <= len(nat.compress(raw))
