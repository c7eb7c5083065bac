"""int16-state saturation + exact re-scan escalation.

The default Pallas kernels store DP state as saturating int16 (the
reference's dpx_s16 fast path, /root/reference/src/kernels.cuh:5); any
score >= SAT flags 16-bit overflow and the engine re-scans with int32
state.  These tests shrink SAT so the escalation triggers on tiny inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas_cell, sw_pallas_col
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.ops.sw_pallas import prepare_query

ON_TPU = jax.devices()[0].platform == "tpu"


def test_cell_kernel_saturates_then_exact(rng, monkeypatch):
    monkeypatch.setattr(sw_pallas_cell, "SAT", 30)
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()
    cfg = make_scoring_config("blosum62")
    L = 32
    # identical query/subject -> true score far above SAT=30
    seq = rng.integers(0, 20, size=24)
    tiles = np.full((1, L, 32, 128), 20, dtype=np.int8)
    tiles[0, : len(seq), 0, 0] = seq
    qpad, nq = prepare_query(seq, qcap=128)
    params = np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    want = sw_score_scalar(seq, seq, cfg.matrix, cfg.gop, cfg.gex)
    assert want > 30

    fast = sw_pallas_cell.score_bucket_pallas_cell(
        jnp.asarray(tiles), jnp.asarray(qpad), mat, jnp.asarray(params),
        interpret=not ON_TPU,
    )
    flagged = float(np.asarray(fast).reshape(-1)[0])
    assert flagged >= 30  # overflow is flagged, never silently wrong

    exact = sw_pallas_cell.score_bucket_pallas_cell(
        jnp.asarray(tiles), jnp.asarray(qpad), mat, jnp.asarray(params),
        interpret=not ON_TPU, exact=True,
    )
    assert int(np.asarray(exact).reshape(-1)[0]) == want
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()


def test_col_kernel_saturates_then_exact(rng, monkeypatch):
    monkeypatch.setattr(sw_pallas_cell, "SAT", 30)
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    sw_pallas_col.score_bucket_pallas_col._clear_cache()
    cfg = make_scoring_config("blosum62")
    L = 32
    seq = rng.integers(0, 20, size=28)
    tiles = np.full((1, L, 32, 128), 20, dtype=np.int8)
    tiles[0, : len(seq), 0, 0] = seq
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    want = sw_score_scalar(seq, seq, cfg.matrix, cfg.gop, cfg.gex)
    assert want > 30

    fast = sw_pallas_col.score_bucket_col_any_query(
        jnp.asarray(tiles), seq, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU,
    )
    assert float(np.asarray(fast).reshape(-1)[0]) >= 30

    exact = sw_pallas_col.score_bucket_col_any_query(
        jnp.asarray(tiles), seq, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU, exact=True,
    )
    assert int(np.asarray(exact).reshape(-1)[0]) == want
    sw_pallas_col.score_bucket_pallas_col._clear_cache()
