import numpy as np
import pytest

from cudasw4_tpu import encode, make_scoring_config
from cudasw4_tpu.ops.oracle import sw_score_rowvec, sw_score_scalar


def _score(q, s, cfg):
    return sw_score_scalar(encode(q), encode(s), cfg.matrix, cfg.gop, cfg.gex)


def test_identity_alignment():
    cfg = make_scoring_config("blosum62")
    q = "ARNDCQEGHILKMFPSTWYV"
    m = cfg.matrix
    expected = sum(int(m[i, i]) for i in range(20))
    assert _score(q, q, cfg) == expected


def test_empty_and_disjoint():
    cfg = make_scoring_config("blosum62")
    assert _score("AAAA", "", cfg) == 0
    # score is never negative (local alignment)
    assert _score("W", "P", cfg) == 0


def test_single_match():
    cfg = make_scoring_config("blosum62")
    assert _score("W", "W", cfg) == 11


def test_gap_open_and_extend():
    cfg = make_scoring_config("blosum62", gop=-11, gex=-1)
    # WWWW vs WW|gap...|WW : 4 matches (44) minus one gap of length 2:
    # opening -11 then one extension -1 => 8*11 - 12 = 76 if full alignment wins
    q = "WWWWWWWW"
    s = "WWWWCCWWWW"
    got = _score(q, s, cfg)
    assert got == 8 * 11 - 11 - 1 or got > 0  # exact check below vs rowvec
    assert got == 76


def test_rowvec_matches_scalar(rng):
    cfg = make_scoring_config("blosum62")
    for trial in range(5):
        qlen = int(rng.integers(1, 40))
        q = rng.integers(0, 21, size=qlen)
        subs = rng.integers(0, 21, size=(7, int(rng.integers(1, 50))))
        got = sw_score_rowvec(q, subs, cfg.matrix, cfg.gop, cfg.gex)
        want = [sw_score_scalar(q, s, cfg.matrix, cfg.gop, cfg.gex) for s in subs]
        assert list(got) == want


@pytest.mark.parametrize("name", ["blosum45", "blosum50", "blosum80"])
def test_rowvec_other_matrices(rng, name):
    cfg = make_scoring_config(name)
    q = rng.integers(0, 21, size=25)
    subs = rng.integers(0, 21, size=(5, 33))
    got = sw_score_rowvec(q, subs, cfg.matrix, cfg.gop, cfg.gex)
    want = [sw_score_scalar(q, s, cfg.matrix, cfg.gop, cfg.gex) for s in subs]
    assert list(got) == want


def test_rowvec_padding_invariance(rng):
    """Padding with UNKNOWN (letter 20) must not change scores."""
    cfg = make_scoring_config("blosum62")
    q = rng.integers(0, 20, size=30)
    subs = rng.integers(0, 20, size=(4, 40))
    padded = np.full((4, 64), 20, dtype=np.int64)
    padded[:, :40] = subs
    a = sw_score_rowvec(q, subs, cfg.matrix, cfg.gop, cfg.gex)
    b = sw_score_rowvec(q, padded, cfg.matrix, cfg.gop, cfg.gex)
    assert np.array_equal(a, b)
