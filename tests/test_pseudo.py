"""Bit-exact parity of the pseudo-DB generator with the reference.

Golden values generated with g++/libstdc++:
    std::mt19937 gen(42); std::uniform_int_distribution<> dist(0,19);
matching /root/reference/src/dbdata.hpp:230-240.
"""

import numpy as np

from cudasw4_tpu.constants import decode
from cudasw4_tpu.db.pseudo import MT19937, make_pseudo_db, uniform_ints

GOLDEN_RAW = [
    1608637542, 3421126067, 4083286876, 787846414,
    3143890026, 3348747335, 2571218620, 2563451924,
]
GOLDEN_DIST = [
    7, 15, 19, 3, 14, 15, 11, 11, 3, 8, 3, 1, 1, 9, 17, 6,
    12, 2, 14, 13, 0, 1, 19, 14, 16, 18, 4, 0, 3, 19, 3, 12,
    6, 12, 10, 0, 8, 0, 5, 10, 12, 7, 2, 0, 5, 19, 7, 4,
    9, 1, 15, 12, 3, 7, 10, 19, 11, 9, 0, 17, 12, 13, 3, 9,
]
GOLDEN_SEQ40 = "GSVDPSKKDHDRRIWEMNPFARVPTYCADVDMEMLAHAQL"


def test_mt19937_raw():
    g = MT19937(42)
    assert [g.next_u32() for _ in range(8)] == GOLDEN_RAW


def test_uniform_int_distribution():
    g = MT19937(42)
    assert uniform_ints(g, 64) == GOLDEN_DIST


def test_mt19937_across_block_boundary():
    g = MT19937(42)
    vals = [g.next_u32() for _ in range(1300)]  # crosses two 624-blocks
    assert all(0 <= v <= 0xFFFFFFFF for v in vals)
    assert len(set(vals)) > 1290  # sanity: essentially all distinct


def test_pseudo_db_sequence():
    db = make_pseudo_db(num=3, length=40)
    assert db.num_sequences == 3
    assert db.total_length == 120
    assert decode(db.chars[:40]) == GOLDEN_SEQ40
    # all copies identical
    assert np.array_equal(db.chars[:40], db.chars[40:80])
    assert list(db.offsets) == [0, 40, 80, 120]


def test_pseudo_db_padding():
    db = make_pseudo_db(num=2, length=41)
    # padded to 44 chars, padding encodes to UNKNOWN (20)
    assert db.offsets[1] == 44
    assert all(c == 20 for c in db.chars[41:44])
    assert db.lengths[0] == 41
