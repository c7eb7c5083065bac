"""Compute kernels: Pallas TPU (row-streaming + cell-sequential) and the
portable XLA scorer, plus the per-bucket dispatch used by the engine and
the sharded scan (the analog of the reference's kernel dispatch table,
/root/reference/src/cudasw4.cuh:1742-2103 — tile layout picks the kernel
instead of a partId->template map)."""

from __future__ import annotations

import jax.numpy as jnp


def score_bucket(tiles, qpad, mat_flat, mat_f32, params, use_pallas, is_long):
    """Score one bucket's tiles; returns f32 [T, NS].

    Dispatch: 4-D tiles = cell-sequential layout, 3-D = row-streaming;
    ``use_pallas`` False (CPU) or ``is_long`` (chunked long-subject bucket)
    falls back to the portable XLA scorer.
    """
    from . import sw_pallas, sw_pallas_cell
    from .sw_jax import score_tiles_jnp

    if tiles.ndim == 4:
        if use_pallas and not is_long:
            return sw_pallas_cell.score_bucket_pallas_cell(
                tiles, qpad, mat_flat, params
            )
        T, L, g, nsl = tiles.shape
        tiles = tiles.reshape(T, L, g * nsl)
    elif use_pallas and not is_long:
        return sw_pallas.score_bucket_pallas(tiles, qpad, mat_flat, params)
    return score_tiles_jnp(
        tiles,
        qpad,
        mat_f32,
        params[1].astype(jnp.float32),
        params[2].astype(jnp.float32),
        params[0],
    )
