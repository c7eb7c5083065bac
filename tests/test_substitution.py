import numpy as np
import pytest

from cudasw4_tpu import encode, decode, make_scoring_config
from cudasw4_tpu.constants import UNKNOWN
from cudasw4_tpu.substitution import MATRICES_20, MATRICES_FULL, BlosumType


def test_encode_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYV"
    codes = encode(s)
    assert list(codes) == list(range(20))
    assert decode(codes) == s


def test_encode_unknown_and_padding():
    codes = encode("AXZ B*a ")
    # X, Z, space, *, lower-case all map to UNKNOWN in the 20-letter model
    assert codes[0] == 0
    assert all(c == UNKNOWN for c in codes[1:])
    assert decode([UNKNOWN]) == "-"


@pytest.mark.parametrize("name", ["blosum45", "blosum50", "blosum62", "blosum80"])
def test_matrices_symmetric(name):
    m20 = MATRICES_20[name]
    mfull = MATRICES_FULL[name]
    assert m20.shape == (21, 21)
    assert mfull.shape == (25, 25)
    assert np.array_equal(m20, m20.T)
    assert np.array_equal(mfull, mfull.T)
    # cores agree
    assert np.array_equal(m20[:20, :20], mfull[:20, :20])


def test_blosum62_spot_values():
    m = MATRICES_20["blosum62"]
    q = encode("W")[0]
    assert m[q, q] == 11  # W-W
    a = encode("A")[0]
    assert m[a, a] == 4
    assert m[a, encode("R")[0]] == -1
    assert m[a, UNKNOWN] == -4  # low sentinel
    assert m[UNKNOWN, UNKNOWN] == -4


def test_gap_defaults():
    assert (make_scoring_config("blosum62").gop, make_scoring_config("blosum62").gex) == (-11, -1)
    assert (make_scoring_config("blosum45").gop, make_scoring_config("blosum45").gex) == (-13, -2)
    assert (make_scoring_config("blosum50").gop, make_scoring_config("blosum50").gex) == (-13, -2)
    assert (make_scoring_config("blosum80").gop, make_scoring_config("blosum80").gex) == (-10, -1)
    cfg = make_scoring_config("blosum62", gop=-5, gex=-2)
    assert (cfg.gop, cfg.gex) == (-5, -2)
    # plain names are the classic 21-letter mode; _full selects the
    # 25-dim table (the reference full build's plain-name semantics)
    assert cfg.blosum == BlosumType.BLOSUM62_20
    assert make_scoring_config("blosum62_full").blosum == BlosumType.BLOSUM62
