"""Portable JAX implementation of the bucketed Smith-Waterman scorer.

Same math as the Pallas kernel (ops/sw_pallas.py) expressed with stock jnp
ops, so it runs on any backend.  Used as: (a) the CPU test oracle against
the scalar DP, (b) the fallback path for shapes the kernel does not yet
cover, (c) the multi-chip dry-run body on virtual CPU meshes.

Formulation (one query row per scan step, vectorised over [L, NS]):
    F    = max(F + gex, H + gop)                       # gap along query
    Ht   = relu(max(shift_j(H) + sub, F))              # H without E
    E[j] = max_{k<j}(Ht[k] + gop + (j-k-1)*gex)        # exact lazy-gap scan
         = excl_cummax_j(Ht + gop - (k+1)*gex) + j*gex
    H    = max(Ht, E)
The E identity is exact because a gap extended from an E-derived H never
beats extending the gap that produced it (gop <= 0); see
tests/test_sw_jax.py for the brute-force cross-check.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1.0e7


@functools.partial(jax.jit, static_argnames=("max_valid_q",))
def score_tiles_jnp(
    tiles: jax.Array,  # int8 [T, L, NS] position-major subject chars
    query: jax.Array,  # int32 [Q] encoded query (may include padding)
    matrix: jax.Array,  # f32 [21, 21]
    gop: jax.Array,  # f32 scalar
    gex: jax.Array,  # f32 scalar
    nq: jax.Array,  # int32 scalar: number of real query chars (<= Q)
    max_valid_q: int | None = None,
) -> jax.Array:
    """Scores f32 [T, NS] for one query against all tiles of a bucket."""
    T, L, NS = tiles.shape
    Q = query.shape[0]
    del max_valid_q

    j = jnp.arange(L, dtype=jnp.float32)[None, :, None]  # [1, L, 1]
    c1 = gop - (j + 1.0) * gex
    c2 = j * gex
    tiles_i32 = tiles.astype(jnp.int32)

    def step(carry, qc):
        H, F, M, i = carry
        row = matrix[qc]  # [21]
        sub = jnp.take(row, tiles_i32, axis=0)  # [T, L, NS]
        Fn = jnp.maximum(F + gex, H + gop)
        Hdiag = jnp.concatenate(
            [jnp.zeros((T, 1, NS), jnp.float32), H[:, :-1, :]], axis=1
        )
        Ht = jnp.maximum(jnp.maximum(Hdiag + sub, Fn), 0.0)
        u = Ht + c1
        s_incl = jax.lax.cummax(u, axis=1)
        s = jnp.concatenate(
            [jnp.full((T, 1, NS), NEG, jnp.float32), s_incl[:, :-1, :]], axis=1
        )
        E = s + c2
        Hn = jnp.maximum(Ht, E)
        # Ignore padded query rows (i >= nq): keep the old state.
        active = i < nq
        Hn = jnp.where(active, Hn, H)
        Fn = jnp.where(active, Fn, F)
        Mn = jnp.where(active, jnp.maximum(M, Hn), M)
        return (Hn, Fn, Mn, i + 1), None

    H0 = jnp.zeros((T, L, NS), jnp.float32)
    F0 = jnp.full((T, L, NS), NEG, jnp.float32)
    M0 = jnp.zeros((T, L, NS), jnp.float32)
    (H, F, M, _), _ = jax.lax.scan(step, (H0, F0, M0, jnp.int32(0)), query)
    del H, F
    return jnp.max(M, axis=1)  # [T, NS]


def score_tiles_jnp_chunked(
    tiles, query, matrix, gop, gex, nq, tile_chunk: int = 8
) -> jax.Array:
    """Memory-bounded wrapper: processes tiles in chunks (long buckets)."""
    import numpy as np

    T = tiles.shape[0]
    outs = []
    for t0 in range(0, T, tile_chunk):
        outs.append(
            score_tiles_jnp(tiles[t0 : t0 + tile_chunk], query, matrix, gop, gex, nq)
        )
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]
