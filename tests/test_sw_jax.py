import numpy as np
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.ops.sw_jax import score_tiles_jnp


def _pack(subjects, L, NS):
    """Minimal inline packer: subjects list of int arrays -> [T, L, NS]."""
    T = -(-len(subjects) // NS)
    tiles = np.full((T, L, NS), 20, dtype=np.int8)
    for k, s in enumerate(subjects):
        tiles[k // NS, : len(s), k % NS] = s
    return tiles


def _run(query, subjects, cfg, L=None, NS=128, nq=None):
    L = L or max(len(s) for s in subjects)
    L = ((L + 15) // 16) * 16
    tiles = _pack(subjects, L, NS)
    q = np.asarray(query, dtype=np.int32)
    got = score_tiles_jnp(
        jnp.asarray(tiles),
        jnp.asarray(q),
        jnp.asarray(cfg.matrix, dtype=jnp.float32),
        jnp.float32(cfg.gop),
        jnp.float32(cfg.gex),
        jnp.int32(nq if nq is not None else len(q)),
    )
    return np.asarray(got).reshape(-1)[: len(subjects)]


def test_matches_scalar_oracle_random(rng):
    cfg = make_scoring_config("blosum62")
    query = rng.integers(0, 20, size=33)
    subjects = [rng.integers(0, 20, size=int(rng.integers(1, 60))) for _ in range(10)]
    got = _run(query, subjects, cfg)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


@pytest.mark.parametrize("name,gop,gex", [
    ("blosum62", None, None),
    ("blosum45", None, None),
    ("blosum80", -5, -3),
    ("blosum50", -20, -1),
])
def test_matches_oracle_matrices_and_gaps(rng, name, gop, gex):
    cfg = make_scoring_config(name, gop=gop, gex=gex)
    query = rng.integers(0, 21, size=25)
    subjects = [rng.integers(0, 21, size=int(rng.integers(5, 80))) for _ in range(6)]
    got = _run(query, subjects, cfg)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_query_padding_mask(rng):
    """Padded query rows (i >= nq) must not affect scores, whatever the pad."""
    cfg = make_scoring_config("blosum62")
    query = rng.integers(0, 20, size=20)
    subjects = [rng.integers(0, 20, size=40) for _ in range(4)]
    padded_q = np.concatenate([query, rng.integers(0, 20, size=12)])  # junk pad
    a = _run(query, subjects, cfg)
    b = _run(padded_q, subjects, cfg, nq=20)
    assert np.array_equal(a, b)


def test_gap_dominated_alignment():
    """Long gap in subject direction exercises the E-scan correctness."""
    cfg = make_scoring_config("blosum62")
    q = np.array([17, 17], dtype=np.int32)  # W W
    # subject: W ...30 mismatches... W -> best is single W (11) since
    # 22 - 11 - 30 < 11
    s = np.concatenate([[17], np.full(30, 14), [17]]).astype(np.int32)
    got = _run(q, [s], cfg)
    assert int(got[0]) == sw_score_scalar(q, s, cfg.matrix, cfg.gop, cfg.gex)

    # cheap gaps: now bridging pays off
    cfg2 = make_scoring_config("blosum62", gop=-1, gex=0)
    got2 = _run(q, [s], cfg2)
    assert int(got2[0]) == sw_score_scalar(q, s, cfg2.matrix, cfg2.gop, cfg2.gex)
    assert int(got2[0]) == 21  # 11 + 11 - 1


def test_zero_gex():
    cfg = make_scoring_config("blosum62", gop=-3, gex=0)
    rng = np.random.default_rng(7)
    q = rng.integers(0, 20, size=18)
    subjects = [rng.integers(0, 20, size=25) for _ in range(3)]
    got = _run(q, subjects, cfg)
    want = [sw_score_scalar(q, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_multi_tile(rng):
    cfg = make_scoring_config("blosum62")
    query = rng.integers(0, 20, size=15)
    subjects = [rng.integers(0, 20, size=30) for _ in range(300)]  # 3 tiles at NS=128
    got = _run(query, subjects, cfg)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects[:5]]
    assert [int(v) for v in got[:5]] == want
    assert len(got) == 300
