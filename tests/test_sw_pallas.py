"""Pallas kernel correctness (interpret mode on CPU; real TPU covered by
the same code path when CUDASW4_TPU_TEST_TPU=1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.ops.sw_pallas import prepare_query, score_bucket_pallas

ON_TPU = jax.devices()[0].platform == "tpu"


def _run_kernel(query, subjects, cfg, L, NS, T, qcap=128):
    tiles = np.full((T, L, NS), 20, dtype=np.int8)
    for k, s in enumerate(subjects):
        tiles[k // NS, : len(s), k % NS] = s
    qpad, nq = prepare_query(query, qcap=qcap)
    # kernel input is always QCAP-sized in production; tests use a small cap
    params = np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
    out = score_bucket_pallas(
        jnp.asarray(tiles),
        jnp.asarray(qpad),
        jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1)),
        jnp.asarray(params),
        interpret=not ON_TPU,
    )
    return np.asarray(out).reshape(-1)[: len(subjects)]


@pytest.mark.parametrize("L,NS", [(32, 128), (64, 256)])
def test_kernel_matches_oracle(rng, L, NS):
    cfg = make_scoring_config("blosum62")
    n = NS + 3  # spill into a second tile
    T = -(-n // NS)
    subjects = [rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)]
    query = rng.integers(0, 20, size=30)
    got = _run_kernel(query, subjects, cfg, L, NS, T)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_kernel_regression_case():
    """The gap-open off-by-one case (see test_oracle.py)."""
    cfg = make_scoring_config("blosum62")
    subject = np.array([7, 18, 2, 2, 8, 11, 12, 17, 7, 18, 14, 11, 4, 14, 2,
                        1, 14, 4, 13, 11, 8, 9, 2, 6])
    query = np.array([2, 8, 11, 8, 0, 11, 15, 13, 12, 18, 2, 11, 13, 18, 19,
                      8, 0, 15, 17, 19, 14, 1, 19, 14, 19])
    got = _run_kernel(query, [subject], cfg, L=32, NS=128, T=1)
    assert int(got[0]) == 20


def test_kernel_other_matrix(rng):
    cfg = make_scoring_config("blosum45")
    subjects = [rng.integers(0, 21, size=20) for _ in range(5)]
    query = rng.integers(0, 21, size=17)
    got = _run_kernel(query, subjects, cfg, L=32, NS=128, T=1)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_prepare_query_too_long():
    with pytest.raises(ValueError):
        prepare_query(np.zeros(100, dtype=np.int32), qcap=64)
