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


def batch_col_scores(
    tiles, queries, mat_flat, params, QB: int, R: int, S: int,
    interpret: bool = False, count: int | None = None, scorer=None,
    pad: int | None = None,
):
    """Score a col bucket for a QB-query batch in ceil(QB/S) passes of the
    multi-slot column kernel (one tile stream + LUT build per pass).

    ``queries`` [QB, >=R] int32, ``params`` the batch layout
    [4+2*QB]: _, gop, gex, _, nq_0.., pad_0.. (pads are the unroll-padded
    row counts the slots run).  Yields (scores [S, T, NS], base, take) —
    traced values, usable inside a jit.

    ``count`` limits how many leading slots are actually scored (rounded
    up to S internally; default all QB) — the streaming path uses it to
    skip passes over empty batch slots.  ``scorer`` overrides the kernel
    call (the sharded streaming path passes a shard_map-wrapped one).
    """
    from ..constants import UNKNOWN
    from . import sw_pallas_col

    if scorer is None:
        def scorer(t, q, m, p):
            return sw_pallas_col.score_bucket_pallas_col_batch(
                t, q, m, p, interpret=interpret, exact=True
            )

    limit = QB if count is None else min(QB, count)
    base = 0
    while base < limit:
        take = min(S, QB - base)
        qs = queries[base : base + take, :R]
        pc = params[4 + QB + base : 4 + QB + base + take]
        if take < S:
            qs = jnp.pad(
                qs, ((0, S - take), (0, 0)),
                constant_values=UNKNOWN if pad is None else pad,
            )
            pc = jnp.pad(pc, (0, S - take), constant_values=4)
        pcol = jnp.concatenate([params[:4], pc])
        s = scorer(tiles, qs, mat_flat, pcol)
        yield s, base, take
        base += take


def col_batch_geometry(max_pad: int, QB: int) -> tuple[int, int]:
    """(R, S) for the multi-slot column kernel: R = slot row capacity
    (power of two >= the largest unroll-padded query in the batch), S =
    largest power-of-two slots per pass with total state S*R <=
    COL_BATCH_RMAX (the 32 MB state budget that is stable inside large
    fused programs).  S need not divide QB: batch_col_scores pads the
    final partial group with 4-row pad-letter slots, which is far
    cheaper than the extra full passes an exact-divisor S would take
    (each pass pays a tile stream + LUT build; QB=20 with divisor S=4
    is 5 passes vs 2 at S=16)."""
    from . import sw_pallas_col

    R = 4
    while R < max_pad:
        R *= 2
    cap = max(1, sw_pallas_col.COL_BATCH_RMAX // R)
    S = 1
    while S * 2 <= min(cap, QB):
        S *= 2
    return R, S


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
