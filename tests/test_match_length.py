"""Match-length scanner unit battery (mirror of reference test/runtests.jl:166-269).

The reference tests its 64-bit/32-bit word-at-a-time scanner on ~60 exact
cases; our oracle's vectorized scanner must agree on the same cases
(0-based indices here).
"""

import numpy as np

from snappy_tpu.cpu.oracle import _find_match_length


def fml(a: str, b: str, limit: int) -> int:
    a = a.encode("latin-1")
    b = b.encode("latin-1")
    c = np.frombuffer(a + b, dtype=np.uint8)
    return _find_match_length(c, 0, len(a), len(a) + limit)


def test_limit_clamping():
    assert fml("012345", "012345", 6) == 6
    assert fml("01234567abc", "01234567abc", 11) == 11


def test_mismatch_in_tail():
    assert fml("01234567abc", "01234567axc", 9) == 9


def test_edge_cases_tail():
    assert fml("01234567abc!", "01234567abc!", 11) == 11
    assert fml("01234567abc!", "01234567abc?", 11) == 11


def test_first_word_mismatch_positions():
    assert fml("01234567xxxxxxxx", "?1234567xxxxxxxx", 16) == 0
    assert fml("01234567xxxxxxxx", "0?234567xxxxxxxx", 16) == 1
    assert fml("01234567xxxxxxxx", "01237654xxxxxxxx", 16) == 4
    assert fml("01234567xxxxxxxx", "0123456?xxxxxxxx", 16) == 7


def test_mismatch_after_one_block():
    assert fml("abcdefgh01234567xxxxxxxx", "abcdefgh?1234567xxxxxxxx", 24) == 8
    assert fml("abcdefgh01234567xxxxxxxx", "abcdefgh0?234567xxxxxxxx", 24) == 9
    assert fml("abcdefgh01234567xxxxxxxx", "abcdefgh01237654xxxxxxxx", 24) == 12
    assert fml("abcdefgh01234567xxxxxxxx", "abcdefgh0123456?xxxxxxxx", 24) == 15


def test_short_matches_every_position():
    assert fml("01234567", "?1234567", 8) == 0
    assert fml("01234567", "0?234567", 8) == 1
    assert fml("01234567", "01?34567", 8) == 2
    assert fml("01234567", "012?4567", 8) == 3
    assert fml("01234567", "0123?567", 8) == 4
    assert fml("01234567", "01234?67", 8) == 5
    assert fml("01234567", "012345?7", 8) == 6
    assert fml("01234567", "0123456?", 8) == 7
    assert fml("01234567", "0123456?", 7) == 7
    assert fml("01234567!", "0123456??", 7) == 7


def test_hit_limit_in_loops():
    assert fml("xxxxxxabcd", "xxxxxxabcd", 10) == 10
    assert fml("xxxxxxabcd?", "xxxxxxabcd?", 10) == 10
    # The reference marks the C++ null-terminator artifact @test_broken and
    # keeps the explicit-terminator variant (test/runtests.jl:220-228).
    assert fml("xxxxxxabcdef\0", "xxxxxxabcdef\0", 13) == 13


def test_tail_edge_cases():
    assert fml("xxxxxx0123abc!", "xxxxxx0123abc!", 12) == 12
    assert fml("xxxxxx0123abc!", "xxxxxx0123abc?", 12) == 12
    assert fml("xxxxxx0123abc", "xxxxxx0123axc", 13) == 11


def test_mismatch_positions_32bit_style():
    assert fml("xxxxxx0123xxxxxxxx", "xxxxxx?123xxxxxxxx", 18) == 6
    assert fml("xxxxxx0123xxxxxxxx", "xxxxxx0?23xxxxxxxx", 18) == 7
    assert fml("xxxxxx0123xxxxxxxx", "xxxxxx0132xxxxxxxx", 18) == 8
    assert fml("xxxxxx0123xxxxxxxx", "xxxxxx012?xxxxxxxx", 18) == 9
    assert fml("xxxxxx0123", "xxxxxx?123", 10) == 6
    assert fml("xxxxxx0123", "xxxxxx0?23", 10) == 7
    assert fml("xxxxxx0123", "xxxxxx0132", 10) == 8
    assert fml("xxxxxx0123", "xxxxxx012?", 10) == 9


def test_mismatch_after_block_32bit_style():
    assert fml("xxxxxxabcd0123xx", "xxxxxxabcd?123xx", 16) == 10
    assert fml("xxxxxxabcd0123xx", "xxxxxxabcd0?23xx", 16) == 11
    assert fml("xxxxxxabcd0123xx", "xxxxxxabcd0132xx", 16) == 12
    assert fml("xxxxxxabcd0123xx", "xxxxxxabcd012?xx", 16) == 13
    assert fml("xxxxxxabcd0123", "xxxxxxabcd?123", 14) == 10
    assert fml("xxxxxxabcd0123", "xxxxxxabcd0?23", 14) == 11
    assert fml("xxxxxxabcd0123", "xxxxxxabcd0132", 14) == 12
    assert fml("xxxxxxabcd0123", "xxxxxxabcd012?", 14) == 13
