"""Pallas TPU kernel: batched affine-gap Smith-Waterman over packed tiles.

TPU-first design (not a port of the reference's warp-shuffle wavefront —
/root/reference/src/half2_kernels.cuh): instead of anti-diagonal register
tiling with per-lane substitution gathers (fast on GPUs, pathological on
TPUs), we use *inter-sequence* parallelism with a row-streaming recurrence
whose only cross-lane dependency is an exact max-scan:

* A grid step owns one tile: NS independent subjects of padded length L,
  laid out position-major as an [L, NS] int8 block (L on sublanes, NS on
  VPU lanes).  Every elementwise op advances NS alignments at once.
* The query streams through a `fori_loop`; per step the [L, NS] DP state
  advances one query row:
      F  = max(F + gex, H + gop)                  # gap-in-query, vectorised
      Ht = relu(max(shift_j(H) + sub, F))         # H without E
      E  = excl_cummax_j(Ht + gop - (j+1)*gex) + j*gex  # exact lazy-gap scan
      H  = max(Ht, E)
  The scan identity replaces the sequential gap-in-subject recurrence; it is
  exact for gop <= 0 (see ops/sw_jax.py and tests).
* Substitution scores come from a per-tile VMEM lookup table
  SubLUT[letter][j, lane] = B[letter, X[j, lane]] built once per tile with
  compare/select ops (no gathers anywhere), then indexed by the prefetched
  query character each step — the TPU replacement for the reference's
  shared-memory pairwise BLOSUM cache (half2_kernels.cuh:57-65).
* Scores are int32 lanes: exact for all score ranges, so there is no overflow
  escalation pass to manage (the reference needs one for its 16-bit SIMD
  lanes; an int16 double-rate path can reintroduce it later as a pure
  optimisation).

The query (up to QCAP chars) and the 21x21 substitution matrix ride in SMEM
as scalar-prefetch operands, so one compiled kernel serves every query and
scoring config for a given tile geometry (L, NS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ALPHABET_SIZE, UNKNOWN

NEG = -1.0e7

#: Maximum query chars per kernel invocation (SMEM-resident).  Longer
#: queries are processed in chunks with DP state carried between calls.
QCAP = 8192


def _shift_down(x, rows, fill):
    """x[j] -> x[j-rows] along the sublane axis, filling the top with
    ``fill``."""
    L = x.shape[0]
    pad = jnp.full((rows,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([pad, x[: L - rows]], axis=0)


def _excl_cummax(u, neg):
    """Exclusive running max along axis 0 (Hillis-Steele, log2(L) steps)."""
    L = u.shape[0]
    v = _shift_down(u, 1, neg)
    d = 1
    while d < L - 1:
        v = jnp.maximum(v, _shift_down(v, d, neg))
        d *= 2
    return v


def _sw_kernel(params_ref, q_ref, b_ref, x_ref, out_ref, lut_ref, h_ref, f_ref, m_ref, *, L, NS, dtype=jnp.int32, A=ALPHABET_SIZE):
    """One grid step = one tile of NS subjects, full query sweep.

    ``dtype``: DP lane type — int32 by default (scores are integers and i32
    max/add measures faster than f32 on this VPU).
    """
    nq = params_ref[0]
    gop = params_ref[1].astype(dtype)
    gex = params_ref[2].astype(dtype)

    x = x_ref[0]  # [L, NS] int8

    # --- Build SubLUT[t, j, s] = B[t, x[j, s]] without gathers. ---
    # Each LUT plane is base + sum_u onehot_u(x) * (B[t,u]-B[t,20]).
    # Arithmetic select is used instead of jnp.where (which miscompiles with
    # SMEM scalars on this Mosaic version); masks are recomputed per letter
    # rather than hoisted to keep live VMEM temporaries O(1) — the whole
    # build is amortised over the nq-step query sweep.
    # (Mosaic vector arithmetic needs i16/i32; int8 is storage-only.)
    xi = x.astype(jnp.int32)  # i8 compares unsupported; widen once
    for t in range(A):
        base = b_ref[t * A + (A - 1)]
        row = jnp.full((L, NS), base, jnp.int32)
        for u in range(A - 1):
            row = row + (xi == u).astype(jnp.int32) * (
                b_ref[t * A + u] - base
            )
        lut_ref[t] = row.astype(jnp.int8)

    # --- Constant per-column offsets for the lazy-gap scan. ---
    jcol = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0).astype(dtype)
    one = jnp.asarray(1, dtype)
    c1 = gop - (jcol + one) * gex
    c2 = jcol * gex
    neg = jnp.asarray(NEG, dtype)
    zero = jnp.asarray(0, dtype)

    # DP state lives in VMEM scratch (value-carried fori_loop state trips a
    # Mosaic phi-layout bug with splat initialisers on this version).
    h_ref[...] = jnp.zeros((L, NS), dtype)
    f_ref[...] = jnp.full((L, NS), neg, dtype)
    m_ref[...] = jnp.zeros((L, NS), dtype)

    def step(i, _):
        H = h_ref[...]
        qi = q_ref[i]
        sub = lut_ref[qi].astype(dtype)  # [L, NS]
        F = jnp.maximum(f_ref[...] + gex, H + gop)
        Ht = jnp.maximum(jnp.maximum(_shift_down(H, 1, zero) + sub, F), zero)
        E = _excl_cummax(Ht + c1, neg) + c2
        Hn = jnp.maximum(Ht, E)
        h_ref[...] = Hn
        f_ref[...] = F
        m_ref[...] = jnp.maximum(m_ref[...], Hn)
        return 0

    jax.lax.fori_loop(0, nq, step, 0)
    # Output block is (1, 8, NS) to satisfy TPU tiling; broadcast the
    # per-lane max across the 8 sublanes and slice row 0 outside.
    best = jnp.max(m_ref[...], axis=0, keepdims=True).astype(jnp.float32)
    out_ref[0] = jnp.broadcast_to(best, (8, NS))


@functools.partial(
    jax.jit, static_argnames=("interpret",)
)
def score_bucket_pallas(
    tiles: jax.Array,  # int8 [T, L, NS]
    query: jax.Array,  # int32 [QCAP]
    matrix_flat: jax.Array,  # int32 [441]
    params: jax.Array,  # int32 [4]: nq, gop, gex, reserved
    interpret: bool = False,
) -> jax.Array:
    """Scores f32 [T, NS]; one pallas_call, grid over tiles."""
    T, L, NS = tiles.shape
    from .sw_pallas_cell import _alphabet_dim

    A = _alphabet_dim(matrix_flat)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, NS), lambda t, *_: (t, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, NS), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((A, L, NS), jnp.int8),
            pltpu.VMEM((L, NS), jnp.int32),
            pltpu.VMEM((L, NS), jnp.int32),
            pltpu.VMEM((L, NS), jnp.int32),
        ],
    )

    kernel = functools.partial(_sw_kernel, L=L, NS=NS, A=A)
    # Scoped-VMEM budget: LUT (int8) + 3 state arrays (f32) + pipelined input
    # blocks + temporaries of the unrolled scan.  The default 16M scoped
    # limit is too tight for large tiles; request what we actually need.
    elems = L * NS
    vmem_bytes = elems * (A + 2) + 3 * elems * 4 + 24 * elems * 4
    vmem_bytes = max(vmem_bytes, 32 * 1024 * 1024)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, 8, NS), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=int(vmem_bytes)),
        interpret=interpret,
    )(params, query, matrix_flat, tiles)
    return out[:, 0, :]


def prepare_query(query_codes, qcap: int = QCAP, pad: int | None = None):
    """Pad encoded query to [qcap] int32 (padding code, UNKNOWN default) + count."""
    import numpy as np

    q = np.asarray(query_codes, dtype=np.int32)
    nq = len(q)
    if nq > qcap:
        raise ValueError(f"query of length {nq} exceeds kernel capacity {qcap}")
    out = np.full(qcap, UNKNOWN if pad is None else pad, dtype=np.int32)
    out[:nq] = q
    return out, nq
