"""Compute kernels: Pallas TPU (row-streaming, cell-sequential,
column-chunked) and the portable XLA scorer, plus the per-bucket dispatch
used by the engine and the sharded scan (the analog of the reference's
kernel dispatch table, /root/reference/src/cudasw4.cuh:1742-2103 — tile
layout picks the kernel instead of a partId->template map)."""

from __future__ import annotations

import os

import jax.numpy as jnp

#: Run every Pallas kernel in interpret mode (pure-XLA emulation).  Lets
#: the engine's Pallas-only code paths (chunked-col carry, batch kernels,
#: sharded scans) execute on CPU in tests; settable via env or monkeypatch.
INTERPRET = os.environ.get("CUDASW4_TPU_INTERPRET", "0") == "1"


def score_bucket(
    tiles, qpad, mat_flat, mat_f32, params, use_pallas, kind,
    exact: bool = False,
):
    """Score one bucket's tiles; returns f32 [T, NS].

    ``kind``: "row" | "cell" | "col" | "jnp".  ``use_pallas`` False (CPU)
    downgrades everything to the portable XLA scorer.  For "col" the
    caller guarantees params[3] (the unroll-padded query row count) is
    <= sw_pallas_col.NQC; longer queries go through
    sw_pallas_col.score_bucket_col_any_query outside the main jit.

    ``exact`` False uses saturating int16 DP state (scores >= SAT flag
    16-bit overflow); True uses full int32 state.
    """
    from . import sw_pallas, sw_pallas_cell, sw_pallas_col
    from .sw_jax import score_tiles_jnp

    if use_pallas and kind == "cell":
        return sw_pallas_cell.score_bucket_pallas_cell(
            tiles, qpad, mat_flat, params, exact=exact, interpret=INTERPRET
        )
    if use_pallas and kind == "col":
        pc = jnp.stack([params[3], params[1], params[2], params[3]])
        q = qpad[: min(sw_pallas_col.NQC, qpad.shape[0])]
        return sw_pallas_col.score_bucket_pallas_col(
            tiles, q, mat_flat, pc, exact=exact, interpret=INTERPRET
        )
    if use_pallas and kind == "row":
        return sw_pallas.score_bucket_pallas(
            tiles, qpad, mat_flat, params, interpret=INTERPRET
        )
    if tiles.ndim == 4:
        T, L, g, nsl = tiles.shape
        tiles = tiles.reshape(T, L, g * nsl)
    return score_tiles_jnp(
        tiles,
        qpad,
        mat_f32,
        params[1].astype(jnp.float32),
        params[2].astype(jnp.float32),
        params[0],
    )


def bucket_kind(bucket, nq_pad: int | None = None) -> str:
    """Effective dispatch kind for a packed bucket.

    Row-layout buckets beyond the single-pass length cap use the portable
    scorer (the reference's many-pass escalation analog); col buckets
    degrade to it when the query exceeds the column kernel's row capacity
    and the caller cannot chunk (pass nq_pad=None when chunking is
    available).
    """
    from . import sw_pallas_col

    if bucket.kernel == "row" and bucket.is_long:
        return "jnp"
    if (
        bucket.kernel == "col"
        and nq_pad is not None
        and nq_pad > sw_pallas_col.NQC
    ):
        return "jnp"
    return bucket.kernel
