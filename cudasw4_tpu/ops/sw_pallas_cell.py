"""Cell-sequential Pallas TPU kernel: scan-free affine Smith-Waterman.

Second-generation kernel (the first, ops/sw_pallas.py, streams query rows
and pays an exclusive-cummax scan over the subject axis every step — about
2/3 of its VPU slots).  This kernel removes the scan entirely by making
*every* (sublane, lane) position an independent subject:

* A tile holds G*NSL = 32*128 = 4096 independent subjects of padded length
  L, laid out as an [L, G, NSL] int8 array: x[j] is a [32, 128] slab of the
  j-th character of all 4096 subjects (int8 VMEM tiles are (32, 128), so
  G=32 wastes nothing).
* The DP sweeps (query row i outer, subject position j inner).  At step
  (i, j) all dependencies are elementwise over the [G, NSL] slab:
      E[i][j] = max(E[i][j-1] + gex, H[i][j-1] + gop)   (registers, carried in j)
      F[i][j] = max(F[i-1][j] + gex, H[i-1][j] + gop)   (row state, VMEM)
      H[i][j] = max(0, H[i-1][j-1] + sub, E, F)          (diag carried in j)
  No cross-lane shifts, no prefix scans — ~17 VPU slots per cell versus ~31
  for the row-streaming kernel.  This is the TPU analog of the reference's
  one-thread-group-per-alignment inter-sequence parallelism
  (/root/reference/src/float_kernels.cuh:1044-1045) rather than its
  anti-diagonal register wavefront.
* Substitution scores come from a per-tile LUT[t][j] = B[t, x[j]] int8 plane
  set, built once per tile with compare/selects and reused for all nq query
  rows (the shared-memory pairwise BLOSUM cache analog,
  /root/reference/src/half2_kernels.cuh:57-65).
* The inner j loop is unrolled by U so one VMEM access moves [U, G, NSL]
  slabs and the scalar core's address arithmetic is amortised.

Scores are int32 lanes: exact for all score ranges (the reference's
dpx_s32/float semantics, /root/reference/src/dpx_s32_kernels.cuh), so no
overflow escalation pass is needed.

VMEM budget per tile geometry (L, 32, 128): X = 4096*L bytes, LUT = 21x,
H/F row state = 2*4L*4096 bytes.  L=256 -> ~31 MB; L=512 -> ~62 MB, inside
a v5e core's 128 MB VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ALPHABET_SIZE, UNKNOWN

NEG = -(1 << 24)  # -inf stand-in; safe from int32 underflow across adds

#: Subject-group sublanes x lanes per slab: the int8 VMEM tile shape.
G = 32
NSL = 128
SUBJECTS_PER_TILE = G * NSL

#: Maximum query chars per kernel invocation (SMEM-resident).
QCAP = 8192


def _sw_cell_kernel(
    params_ref, q_ref, b_ref, x_ref, out_ref, lut_ref, h_ref, f_ref,
    *, L, U, G, NSL, dtype=jnp.int32, neg=NEG
):
    """One grid step = one tile of G*NSL subjects, full query sweep."""
    nq = params_ref[0]
    gop = params_ref[1].astype(dtype)
    gex = params_ref[2].astype(dtype)

    x = x_ref[0]  # [L, G, NSL] int8

    # --- Per-tile substitution LUT: lut[t][j] = B[t, x[j]]. ---
    # Arithmetic select (not jnp.where: SMEM-scalar where miscompiles on
    # some Mosaic versions).  The t loop is a fori_loop, not unrolled:
    # 21 unrolled plane builds put >100 MB of live [L,G,NSL] i32
    # temporaries on the VMEM stack.
    def build_plane(t, _):
        xi = x.astype(jnp.int32)
        base = b_ref[t * ALPHABET_SIZE + UNKNOWN]
        row = jnp.full((L, G, NSL), base, jnp.int32)
        for u in range(UNKNOWN):
            row = row + (xi == u).astype(jnp.int32) * (
                b_ref[t * ALPHABET_SIZE + u] - base
            )
        lut_ref[t] = row.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, ALPHABET_SIZE, build_plane, 0)

    h_ref[...] = jnp.zeros((L, G, NSL), dtype)
    f_ref[...] = jnp.full((L, G, NSL), neg, dtype)

    # Loop-carry initialisers must have a concrete (non-replicated) vector
    # layout or Mosaic rejects the loop phi ("Invalid relayout: ... is
    # replicated in destination but not in source"); loading the zeros just
    # written to h_ref yields one, where a jnp.zeros splat would not.
    zero = h_ref[0]  # [G, NSL] zeros
    negv = zero + jnp.asarray(neg, dtype)
    nsteps = L // U

    def row_step(i, m):
        qi = q_ref[i]

        def col_step(jj, carry):
            hdiag, hleft, ecarry, m = carry
            j0 = jj * U
            hup_s = h_ref[pl.ds(j0, U)]  # [U, G, NSL] = H[i-1, j0:j0+U]
            fup_s = f_ref[pl.ds(j0, U)]
            sub_s = lut_ref[qi, pl.ds(j0, U)].astype(dtype)
            hnew = []
            fnew = []
            for u in range(U):
                hup = hup_s[u]
                e = jnp.maximum(ecarry + gex, hleft + gop)
                f = jnp.maximum(fup_s[u] + gex, hup + gop)
                h = jnp.maximum(hdiag + sub_s[u], jnp.maximum(e, f))
                h = jnp.maximum(h, 0)
                m = jnp.maximum(m, h)
                hnew.append(h)
                fnew.append(f)
                hdiag = hup
                hleft = h
                ecarry = e
            h_ref[pl.ds(j0, U)] = jnp.stack(hnew)
            f_ref[pl.ds(j0, U)] = jnp.stack(fnew)
            return (hdiag, hleft, ecarry, m)

        _, _, _, m = jax.lax.fori_loop(
            0, nsteps, col_step, (zero, zero, negv, m)
        )
        return m

    m = jax.lax.fori_loop(0, nq, row_step, zero)
    out_ref[0] = m.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret", "unroll", "dtype"))
def score_bucket_pallas_cell(
    tiles: jax.Array,  # int8 [T, L, G, NSL]
    query: jax.Array,  # int32 [QCAP]
    matrix_flat: jax.Array,  # int32 [441]
    params: jax.Array,  # int32 [4]: nq, gop, gex, reserved
    interpret: bool = False,
    unroll: int = 4,
    dtype=jnp.int32,
) -> jax.Array:
    """Scores f32 [T, g*nsl]; one pallas_call, grid over tiles."""
    T, L, g, nsl = tiles.shape
    assert g % G == 0 and nsl % NSL == 0, (g, nsl)
    assert L % unroll == 0, (L, unroll)
    neg = NEG if dtype == jnp.int32 else -(1 << 13)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, g, nsl), lambda t, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, nsl), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((ALPHABET_SIZE, L, g, nsl), jnp.int8),
            pltpu.VMEM((L, g, nsl), dtype),
            pltpu.VMEM((L, g, nsl), dtype),
        ],
    )

    kernel = functools.partial(
        _sw_cell_kernel, L=L, U=unroll, G=g, NSL=nsl, dtype=dtype, neg=neg
    )
    elems = L * g * nsl
    # LUT (i8) + X (i8, double-buffered input) + 2 state arrays (i32) +
    # headroom for the LUT build's temporaries (bounded by the fori_loop).
    vmem_bytes = elems * (ALPHABET_SIZE + 2) + 2 * elems * 4 + 4 * elems * 4
    vmem_bytes = min(max(int(vmem_bytes), 32 << 20), 100 << 20)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, g, nsl), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(params, query, matrix_flat, tiles)
    return out.reshape(T, g * nsl)
