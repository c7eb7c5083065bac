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


def col_flat_plan(pads, limit=None, rtot=None, smax=8):
    """Bin-pack batch slots into flat-pool column-kernel passes.

    ``pads``: per-slot unroll-padded query row counts (the batch params'
    second block).  ``limit``: only the first ``limit`` slots are real
    (tail slots of a partial batch are skipped entirely — each pass
    costs a full tile stream + LUT build).  Returns a hashable plan:
    a tuple of passes, each a tuple of (slot, state_row_offset) pairs
    with the pass's *reservations* summing to <= ``rtot`` (default
    sw_pallas_col.NQC) and at most ``smax`` slots (the per-slot
    per-grid-step overhead grows with slot count; 8 measured -7% vs
    singles while saving up to 7 tile streams).

    Reservations and offsets are quantised to FLAT_QUANT rows: offsets
    are baked into the kernel as compile-time constants (a dynamic
    offset measured -12%), so quantising keeps the set of compiled
    kernel variants small across query mixes.

    First-fit decreasing: the reference ladder's ten <= 1024-aa queries
    pack into ~2 passes where a power-of-two (R, S) geometry
    degenerates to one pass *per query* (R sized by the longest slot).
    This is the planner feeding score_bucket_pallas_col_flat — the
    analog of the reference's all-partitions-per-upload batching
    (/root/reference/src/cudasw4.cuh:1742-2103) for mixed query lengths.
    """
    from . import sw_pallas_col
    from .sw_pallas_col import FLAT_QUANT

    if rtot is None:
        rtot = sw_pallas_col.NQC
    n = len(pads) if limit is None else min(int(limit), len(pads))
    order = sorted(range(n), key=lambda i: -int(pads[i]))
    passes: list[list] = []  # [rows_reserved, [(slot, off), ...]]
    for i in order:
        p = int(pads[i])
        if p > rtot:
            raise ValueError(
                f"slot {i} needs {p} state rows > pool {rtot}; the "
                "caller must route queries longer than the pool to the "
                "chunked single-query path"
            )
        r = -(-p // FLAT_QUANT) * FLAT_QUANT
        for entry in passes:
            if entry[0] + r <= rtot and len(entry[1]) < smax:
                entry[1].append((i, entry[0]))
                entry[0] += r
                break
        else:
            passes.append([r, [(i, 0)]])
    return tuple(tuple(e[1]) for e in passes)


def batch_col_scores(
    tiles, queries, mat_flat, params, QB: int, plan,
    interpret: bool = False, scorer=None, pad: int | None = None,
    rtot: int | None = None,
):
    """Score a col bucket for a QB-query batch, one flat-pool kernel pass
    per plan entry (one tile stream + LUT build per pass, shared by all
    of the pass's slots).

    ``queries`` [QB, W] int32 (W <= the state pool rows), ``params`` the
    batch layout [4+2*QB]: _, gop, gex, _, nq_0.., pad_0.. (pads are the
    unroll-padded row counts the slots run), ``plan`` from
    col_flat_plan.  Yields (scores [S_pass, T, NS], slots) — traced
    values, usable inside a jit; ``slots`` is the tuple of batch slots
    scored by this pass (scores row i belongs to slots[i]).

    ``scorer`` overrides the kernel call (the sharded streaming path
    passes a shard_map-wrapped one); it receives the pass's static
    offset tuple as its last argument.
    """
    import numpy as np

    from . import sw_pallas_col

    del pad  # kept for call-site compat; live slots need no pad rows
    if rtot is None:
        rtot = sw_pallas_col.NQC
    if scorer is None:
        def scorer(t, q, m, p, offs):
            fmin = sw_pallas_col.COL_FUSE_MIN_S
            if fmin > 0 and len(offs) >= fmin:
                # Masked-fused row loop: one loop entry per column for
                # the whole pass instead of one per slot, and one
                # compiled program per (S, rtot) instead of per static
                # offset tuple (see COL_FUSE_MIN_S).
                return sw_pallas_col.score_bucket_pallas_col_flat_fused(
                    t, q, m, p, rtot=rtot, interpret=interpret,
                    exact=True,
                )
            return sw_pallas_col.score_bucket_pallas_col_flat(
                t, q, m, p, offs=offs, rtot=rtot, interpret=interpret,
                exact=True,
            )

    for slots_offs in plan:
        idx = [s for s, _ in slots_offs]
        offs = tuple(o for _, o in slots_offs)
        gather = jnp.asarray(np.array(idx, np.int64))
        qs = queries[gather]
        nqp = params[4 + QB + gather]
        pcol = jnp.concatenate([params[:4], nqp])
        s = scorer(tiles, qs, mat_flat, pcol, offs)
        yield s, tuple(idx)


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
