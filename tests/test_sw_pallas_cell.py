"""Cell-sequential Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.ops.sw_pallas import prepare_query
from cudasw4_tpu.ops.sw_pallas_cell import (
    G,
    NSL,
    SUBJECTS_PER_TILE,
    score_bucket_pallas_cell,
)

ON_TPU = jax.devices()[0].platform == "tpu"


def _run_kernel(query, subjects, cfg, L, T, qcap=128, unroll=4):
    tiles = np.full((T, L, G, NSL), 20, dtype=np.int8)
    for k, s in enumerate(subjects):
        t, r = divmod(k, SUBJECTS_PER_TILE)
        g, lane = divmod(r, NSL)
        tiles[t, : len(s), g, lane] = s
    qpad, nq = prepare_query(query, qcap=qcap)
    params = np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
    out = score_bucket_pallas_cell(
        jnp.asarray(tiles),
        jnp.asarray(qpad),
        jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1)),
        jnp.asarray(params),
        interpret=not ON_TPU,
        unroll=unroll,
    )
    return np.asarray(out).reshape(-1)[: len(subjects)]


@pytest.mark.parametrize("unroll", [2, 4])
def test_cell_kernel_matches_oracle(rng, unroll):
    cfg = make_scoring_config("blosum62")
    L = 32
    n = 40
    subjects = [rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)]
    query = rng.integers(0, 20, size=30)
    got = _run_kernel(query, subjects, cfg, L, T=1, unroll=unroll)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_cell_kernel_multi_tile(rng):
    cfg = make_scoring_config("blosum62")
    L = 16
    n = SUBJECTS_PER_TILE + 7  # spill into a second tile
    subjects = [rng.integers(0, 20, size=int(rng.integers(3, L))) for _ in range(n)]
    query = rng.integers(0, 20, size=12)
    got = _run_kernel(query, subjects, cfg, L, T=2)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_cell_kernel_regression_case():
    """The gap-open off-by-one case (see test_oracle.py)."""
    cfg = make_scoring_config("blosum62")
    subject = np.array([7, 18, 2, 2, 8, 11, 12, 17, 7, 18, 14, 11, 4, 14, 2,
                        1, 14, 4, 13, 11, 8, 9, 2, 6])
    query = np.array([2, 8, 11, 8, 0, 11, 15, 13, 12, 18, 2, 11, 13, 18, 19,
                      8, 0, 15, 17, 19, 14, 1, 19, 14, 19])
    got = _run_kernel(query, [subject], cfg, L=32, T=1)
    assert int(got[0]) == 20


def test_cell_kernel_other_matrix(rng):
    cfg = make_scoring_config("blosum45")
    subjects = [rng.integers(0, 21, size=20) for _ in range(5)]
    query = rng.integers(0, 21, size=17)
    got = _run_kernel(query, subjects, cfg, L=32, T=1)
    want = [sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
    assert [int(v) for v in got] == want


def test_cell_kernel_manual_staging_matches(rng):
    """The manual double-buffered input-staging variant (DMA experiment,
    docs/PERFORMANCE.md) scores identically to the auto-pipelined kernel."""
    from cudasw4_tpu.ops.sw_pallas_cell import score_bucket_pallas_cell_manual

    cfg = make_scoring_config("blosum62")
    L, T = 16, 3
    subjects = [
        rng.integers(0, 20, size=int(rng.integers(3, L)))
        for _ in range(2 * SUBJECTS_PER_TILE + 7)
    ]
    tiles = np.full((T, L, G, NSL), 20, dtype=np.int8)
    for k, s in enumerate(subjects):
        t, r = divmod(k, SUBJECTS_PER_TILE)
        g, lane = divmod(r, NSL)
        tiles[t, : len(s), g, lane] = s
    qpad, nq = prepare_query(rng.integers(0, 20, size=12), qcap=64)
    params = np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    want = score_bucket_pallas_cell(
        jnp.asarray(tiles), jnp.asarray(qpad), mat, jnp.asarray(params),
        interpret=not ON_TPU, exact=True,
    )
    got = score_bucket_pallas_cell_manual(
        jnp.asarray(tiles), jnp.asarray(qpad), mat, jnp.asarray(params),
        interpret=not ON_TPU,
    )
    assert np.array_equal(np.asarray(got), np.asarray(want))
