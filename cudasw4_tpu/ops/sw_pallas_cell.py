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

DP state defaults to int32 lanes: exact for all score ranges (the
reference's dpx_s32/float semantics,
/root/reference/src/dpx_s32_kernels.cuh).  An int16-state mode with SAT
saturation + exact re-scan escalation (the reference's dpx_s16 +
MAX_ACC_SHORT model) is available via ``exact=False`` but measured slower
on v5e (docs/PERFORMANCE.md).

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

#: int16-state saturation ceiling.  Scores below SAT are exact in the
#: default (int16-state) kernels; a score >= SAT flags 16-bit overflow
#: and triggers an exact int32-state re-scan (the reference's
#: MAX_ACC_SHORT escalation, /root/reference/src/kernels.cuh:5).
SAT = 32000

#: Subject-group sublanes x lanes per slab: the int8 VMEM tile shape.
G = 32
NSL = 128
SUBJECTS_PER_TILE = G * NSL

#: Maximum query chars per kernel invocation (SMEM-resident).
QCAP = 8192

#: Hard SMEM ceiling for one query block.  The query is a scalar-prefetch
#: operand, so the kernel is length-agnostic: beyond QCAP the engine pads
#: the query up in QCAP-sized steps (only SMEM is spent — the DP row loop
#: runs to nq) until this limit, 512 KB of int32 SMEM (the same budget the
#: batch kernel's QB*QCAP_BATCH block is measured to fit).  Queries longer
#: still fall back to the portable scorer.  The reference bounds query
#: length only by int32 (/root/reference/src/config.hpp:26-30); 131072
#: covers every known protein (titin ~35k aa) with ~4x headroom.
QCAP_MAX = 131072

#: Inner-loop unroll (subject positions per VMEM access).  unroll=None in
#: the entry points resolves to this; tunable per TPU generation via
#: gridsearch --emit-config (db/packing.apply_tuning clears jit caches
#: after changing it).  8 since round 5: INTERLEAVED paired A/Bs with the
#: unroll passed as the explicit static arg measured U8 over U4 at
#: +6.0/+0.8/+3.7/+4.1% (batch kernel, L=128/256/512/768, 16x2048-row
#: batches) and +2.3/+1.0/-0.2% (single kernel, short queries) — wins or
#: noise-ties everywhere.  The round-4 "U8 reverses same-day, keep 4"
#: conclusion came from A/Bs that toggled this module global around
#: calls WITHOUT the explicit unroll arg: the jit cache is keyed on
#: unroll=None, so both arms executed whichever program traced first
#: and the "deltas" were pure run-to-run noise.  Any future unroll
#: experiment must pass unroll explicitly (or clear the kernel caches).
DEFAULT_UNROLL = 8


def _alphabet_dim(matrix_flat) -> int:
    """Alphabet size from a flattened [A*A] substitution matrix (21
    classic, 26 full-blosum; static at trace time)."""
    n = matrix_flat.shape[0]
    a = int(round(n ** 0.5))
    assert a * a == n, n
    return a


#: Build the per-tile substitution LUT on the MXU (one-hot x B matmul)
#: instead of the VPU select chain.  Opt-in experiment: the chain costs
#: ~1.3k VPU ops/char (the dominant per-tile fixed cost at short q and
#: ~4% of col-kernel time at full pools); the matmul form costs ~100
#: VPU ops/char (one-hot + int8 convert) plus MXU work the DP loop
#: never uses.  Round-2 rejected an MXU reformulation on padding-waste
#: analysis; this measures it.  Env: CUDASW4_TPU_LUT_MXU=1.
import os as _os

LUT_MXU = _os.environ.get("CUDASW4_TPU_LUT_MXU", "0") == "1"


def build_sub_lut_mxu(x_ref, b_ref, lut_ref, shape, rows: int = 8,
                      A: int = ALPHABET_SIZE):
    """MXU variant of build_sub_lut: lut[t, c] = (B @ onehot(x))[t, c].

    BLOSUM values (|v| <= 17) and the 0/1 one-hot are exact in bf16, so
    the f32 matmul result is integer-exact.  B is assembled from the
    SMEM scalars once per grid step (A*A broadcasts — negligible next
    to the per-chunk work)."""
    L = shape[0]
    tail = shape[1:]
    ec = rows * tail[0] * tail[1]
    nchunks = L // rows
    assert L % rows == 0, (L, rows)

    bmat = jnp.stack([
        jnp.stack([b_ref[t * A + u] for u in range(A)])
        for t in range(A)
    ]).astype(jnp.bfloat16)  # [A, A]

    def build_chunk(i, _):
        lc = i * rows
        x = x_ref[0, pl.ds(lc, rows)].astype(jnp.int32)  # [rows, G, NSL]
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (A,) + (rows,) + tail, 0
        )
        oh = (iota == x[None]).astype(jnp.bfloat16)
        prod = jax.lax.dot_general(
            bmat, oh.reshape(A, ec),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [A, ec] f32, integer-exact
        lut_ref[:, pl.ds(lc, rows)] = (
            prod.astype(jnp.int8).reshape((A, rows) + tail)
        )
        return 0

    jax.lax.fori_loop(0, nchunks, build_chunk, 0)


def build_sub_lut(x_ref, b_ref, lut_ref, shape, rows: int = 8,
                  A: int = ALPHABET_SIZE):
    if LUT_MXU:
        return build_sub_lut_mxu(x_ref, b_ref, lut_ref, shape, rows, A)
    return _build_sub_lut_vpu(x_ref, b_ref, lut_ref, shape, rows, A)


def _build_sub_lut_vpu(x_ref, b_ref, lut_ref, shape, rows: int = 8,
                       A: int = ALPHABET_SIZE):
    """Fill lut_ref[t] = B[t, x] for all t (the per-tile substitution LUT,
    the TPU stand-in for the reference's shared-memory pairwise BLOSUM
    cache, /root/reference/src/half2_kernels.cuh:57-65).

    ``A``: alphabet size — 21 classic or 26 full-blosum (codes 0..24 plus
    the dedicated padding code 25).  The base code of the select chain is
    A-1 (the padding code — its matrix row is constant, so the delta trick
    stays valid in both modes).

    Arithmetic select (not jnp.where: SMEM-scalar where miscompiles on
    some Mosaic versions).  Two structural constraints drive the shape of
    this code: (a) the A plane builds run in a fori_loop, not unrolled —
    unrolled they put >100 MB of live i32 temporaries on the VMEM stack;
    (b) each plane is built in ``rows``-row chunks so the select chain's
    temporaries fit in vector registers — full-plane chains materialise
    every intermediate through VMEM and make the build memory-bound
    (~1.4 ms/tile measured at [512,32,128], ~15x cheaper chunked).
    """
    L = shape[0]
    tail = shape[1:]
    nchunks = L // rows
    assert L % rows == 0, (L, rows)

    def build_chunk(i, _):
        t = i // nchunks
        lc = (i % nchunks) * rows
        xi = x_ref[0, pl.ds(lc, rows)].astype(jnp.int32)
        base = b_ref[t * A + (A - 1)]
        row = jnp.full((rows,) + tail, base, jnp.int32)
        for u in range(A - 1):
            row = row + (xi == u).astype(jnp.int32) * (
                b_ref[t * A + u] - base
            )
        lut_ref[t, pl.ds(lc, rows)] = row.astype(jnp.int8)
        return 0

    jax.lax.fori_loop(0, A * nchunks, build_chunk, 0)


def _run_query_sweeps(
    qrow, nq, h_ref, f_ref, lut_ref, gop, gex, zero, negv,
    U, nsteps, state_dtype
):
    """Full-query DP over the tile held in h_ref/f_ref; returns the running
    max m [G, NSL] int32.

    The ``first`` sweep (query row 0) reads no H/F state — the virtual row
    above is H=0 / F=-inf — which also means the state arrays never need a
    bulk init (a measured ~1.3 ms/tile of splat stores otherwise).  nq==0
    is safe: padded UNKNOWN rows can never raise m (B[UNKNOWN][.] < 0).
    Two-row sweep fusion was tried and measured ~17% SLOWER on v5e
    (register pressure outweighs the halved state traffic).

    ``qrow``: i -> scalar letter index (SMEM read).
    """
    narrow = state_dtype != jnp.int32
    sat = jnp.int32(SAT) if narrow else None

    def make_col_step(qi, first):
        def col_step(jj, carry):
            hdiag, hleft, ecarry, m = carry
            j0 = jj * U
            if not first:
                # Arithmetic is int32; state may ride int16 (the
                # reference's dpx_s16 idea applied to memory, not ALUs).
                hup_s = h_ref[pl.ds(j0, U)].astype(jnp.int32)
                fup_s = f_ref[pl.ds(j0, U)].astype(jnp.int32)
            sub_s = lut_ref[qi, pl.ds(j0, U)].astype(jnp.int32)
            hnew = []
            fnew = []
            for u in range(U):
                hup = zero if first else hup_s[u]
                e = jnp.maximum(ecarry + gex, hleft + gop)
                f = jnp.maximum((negv if first else fup_s[u]) + gex, hup + gop)
                h = jnp.maximum(hdiag + sub_s[u], jnp.maximum(e, f))
                h = jnp.maximum(h, 0)
                m = jnp.maximum(m, h)
                hnew.append(h)
                fnew.append(f)
                hdiag = hup
                hleft = h
                ecarry = e
            hs = jnp.stack(hnew)
            # Saturate H at SAT before narrowing: if any true H reaches
            # SAT then m >= SAT (m tracks the exact int32 pre-clamp
            # value), which flags the tile for an exact int32 re-scan —
            # the reference's 16-bit overflow escalation
            # (/root/reference/src/kernels.cuh:5, MAX_ACC_SHORT).
            # F never needs clamping: H >= 0 and gop < 0 give
            # gop <= F <= SAT + gop < SAT by induction.
            if narrow:
                hs = jnp.minimum(hs, sat)
            h_ref[pl.ds(j0, U)] = hs.astype(state_dtype)
            f_ref[pl.ds(j0, U)] = jnp.stack(fnew).astype(state_dtype)
            return (hdiag, hleft, ecarry, m)

        return col_step

    def row_step(i, m):
        _, _, _, m = jax.lax.fori_loop(
            0, nsteps, make_col_step(qrow(i), False), (zero, zero, negv, m)
        )
        return m

    _, _, _, m = jax.lax.fori_loop(
        0, nsteps, make_col_step(qrow(0), True), (zero, zero, negv, zero)
    )
    return jax.lax.fori_loop(1, nq, row_step, m)


def _sw_cell_kernel(
    params_ref, q_ref, b_ref, x_ref, out_ref, lut_ref, h_ref, f_ref,
    *, L, U, G, NSL, state_dtype=jnp.int16, A=ALPHABET_SIZE
):
    """One grid step = one tile of G*NSL subjects, full query sweep."""
    nq = params_ref[0]
    gop = params_ref[1]
    gex = params_ref[2]

    build_sub_lut(x_ref, b_ref, lut_ref, (L, G, NSL), A=A)

    # Loop-carry initialisers must have a concrete (non-replicated) vector
    # layout or Mosaic rejects the loop phi ("Invalid relayout: ... is
    # replicated in destination but not in source"); deriving them from a
    # VMEM load yields one, where a jnp.zeros splat would not.  (int
    # garbage * 0 == 0, so reading uninitialised scratch is safe here.)
    zero = h_ref[0].astype(jnp.int32) * 0  # [G, NSL] zeros
    negv = zero + NEG

    m = _run_query_sweeps(
        lambda i: q_ref[i], nq, h_ref, f_ref, lut_ref, gop, gex,
        zero, negv, U, L // U, state_dtype,
    )
    out_ref[0] = m.astype(jnp.float32)


def _sw_cell_batch_kernel(
    params_ref, q_ref, b_ref, x_ref, out_ref, lut_ref, h_ref, f_ref,
    *, L, U, G, NSL, QB, state_dtype=jnp.int32, A=ALPHABET_SIZE
):
    """One grid step = one tile of G*NSL subjects x QB queries.

    The tile's substitution LUT is built once and its block is streamed
    from HBM once for the whole query batch, amortising the per-tile
    fixed costs that dominate short-query scans (queries are processed
    sequentially inside the step, reusing the same DP state arrays — the
    first-row peel doubles as the between-queries state reset).
    """
    gop = params_ref[1]
    gex = params_ref[2]

    build_sub_lut(x_ref, b_ref, lut_ref, (L, G, NSL), A=A)

    zero = h_ref[0].astype(jnp.int32) * 0  # [G, NSL] zeros (see above)
    negv = zero + NEG

    def one_query(qb, _):
        nq = params_ref[4 + qb]
        m = _run_query_sweeps(
            lambda i: q_ref[qb, i], nq, h_ref, f_ref, lut_ref, gop, gex,
            zero, negv, U, L // U, state_dtype,
        )
        out_ref[0, qb] = m.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, QB, one_query, 0)


#: Query capacity of the batch kernel's SMEM-resident query block
#: (QB_MAX * QCAP_BATCH * 4B = 512 KB fits v5e SMEM; 8192 = QCAP covers
#: the whole reference benchmark ladder, measured +5-10% over single
#: scans at q=2-5.5k — cell-bucket DBs never fall back to singles).
#: Engines cap batches at min(QCAP_BATCH, col NQC) when the DB has
#: column-kernel buckets (engine._qcap_batch).
QCAP_BATCH = 8192


@functools.partial(
    jax.jit, static_argnames=("interpret", "unroll", "exact")
)
def score_bucket_pallas_cell_batch(
    tiles: jax.Array,  # int8 [T, L, G, NSL]
    queries: jax.Array,  # int32 [QB, QCAP_BATCH] (UNKNOWN-padded)
    matrix_flat: jax.Array,  # int32 [441]
    params: jax.Array,  # int32 [4+QB]: _, gop, gex, _, nq_0..nq_{QB-1}
    interpret: bool = False,
    unroll: int | None = None,
    exact: bool = True,
) -> jax.Array:
    """Scores f32 [QB, T, g*nsl]: QB queries per tile pass."""
    unroll = DEFAULT_UNROLL if unroll is None else unroll
    T, L, g, nsl = tiles.shape
    QB = queries.shape[0]
    A = _alphabet_dim(matrix_flat)
    assert g % G == 0 and nsl % NSL == 0, (g, nsl)
    assert L % unroll == 0, (L, unroll)
    state_dtype = jnp.int32 if exact else jnp.int16
    state_bytes = 4 if exact else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, g, nsl), lambda t, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, QB, g, nsl), lambda t, *_: (t, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((A, L, g, nsl), jnp.int8),
            pltpu.VMEM((L, g, nsl), state_dtype),
            pltpu.VMEM((L, g, nsl), state_dtype),
        ],
    )
    kernel = functools.partial(
        _sw_cell_batch_kernel, L=L, U=unroll, G=g, NSL=nsl, QB=QB,
        state_dtype=state_dtype, A=A,
    )
    elems = L * g * nsl
    vmem_bytes = (
        elems * (A + 2)
        + 2 * elems * state_bytes
        + 4 * elems * 4
        + 2 * QB * g * nsl * 4
    )
    vmem_bytes = min(max(int(vmem_bytes), 32 << 20), 100 << 20)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, QB, g, nsl), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(params, queries, matrix_flat, tiles)
    return out.transpose(1, 0, 2, 3).reshape(QB, T, g * nsl)


def _sw_cell_kernel_manual(
    params_ref, q_ref, b_ref, x_hbm, out_ref, ring, lut_ref, h_ref, f_ref,
    sem, *, L, U, G, NSL, T, state_dtype=jnp.int32, priority=0,
    A=ALPHABET_SIZE
):
    """Cell kernel with manual double-buffered input staging.

    The input tiles stay in HBM (memory_space=ANY); a 2-deep VMEM ring is
    filled by explicit ``make_async_copy`` DMAs: tile t+1's copy is issued
    *before* tile t's LUT build + DP loop, so it overlaps the whole
    compute step regardless of how Mosaic schedules the automatic block
    pipeline (the round-1 diagnosis: the auto-pipelined input DMA runs at
    ~1.5 GB/s against the kernel's VMEM port traffic,
    docs/PERFORMANCE.md).
    """
    t = pl.program_id(0)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def copy(tile_idx, ring_slot):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(tile_idx, 1)], ring.at[ring_slot],
            sem.at[ring_slot],
        )

    @pl.when(t == 0)
    def _():
        copy(0, slot).start(priority=priority)

    @pl.when(t + 1 < T)
    def _():
        copy(t + 1, nxt).start(priority=priority)

    copy(t, slot).wait()

    nq = params_ref[0]
    gop = params_ref[1]
    gex = params_ref[2]
    build_sub_lut(ring.at[slot], b_ref, lut_ref, (L, G, NSL), A=A)
    zero = h_ref[0].astype(jnp.int32) * 0
    negv = zero + NEG
    m = _run_query_sweeps(
        lambda i: q_ref[i], nq, h_ref, f_ref, lut_ref, gop, gex,
        zero, negv, U, L // U, state_dtype,
    )
    out_ref[0] = m.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("interpret", "unroll", "exact", "priority")
)
def score_bucket_pallas_cell_manual(
    tiles: jax.Array,  # int8 [T, L, G, NSL]
    query: jax.Array,  # int32 [QCAP]
    matrix_flat: jax.Array,  # int32 [441]
    params: jax.Array,  # int32 [4]: nq, gop, gex, reserved
    interpret: bool = False,
    unroll: int | None = None,
    exact: bool = True,
    priority: int = 0,
) -> jax.Array:
    """score_bucket_pallas_cell with manual input staging (experiment:
    attack the per-tile DMA starvation, round-1 verdict item 2)."""
    unroll = DEFAULT_UNROLL if unroll is None else unroll
    T, L, g, nsl = tiles.shape
    assert g % G == 0 and nsl % NSL == 0, (g, nsl)
    assert L % unroll == 0, (L, unroll)
    assert unroll >= 2, unroll
    A = _alphabet_dim(matrix_flat)
    state_dtype = jnp.int32 if exact else jnp.int16
    state_bytes = 4 if exact else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, g, nsl), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 1, L, g, nsl), jnp.int8),
            pltpu.VMEM((A, L, g, nsl), jnp.int8),
            pltpu.VMEM((L, g, nsl), state_dtype),
            pltpu.VMEM((L, g, nsl), state_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _sw_cell_kernel_manual, L=L, U=unroll, G=g, NSL=nsl, T=T,
        state_dtype=state_dtype, priority=priority, A=A,
    )
    elems = L * g * nsl
    vmem_bytes = (
        elems * (A + 2)
        + 2 * elems * state_bytes
        + 4 * elems * 4
    )
    vmem_bytes = min(max(int(vmem_bytes), 32 << 20), 100 << 20)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, g, nsl), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(params, query, matrix_flat, tiles)
    return out.reshape(T, g * nsl)


@functools.partial(
    jax.jit, static_argnames=("interpret", "unroll", "exact")
)
def score_bucket_pallas_cell(
    tiles: jax.Array,  # int8 [T, L, G, NSL]
    query: jax.Array,  # int32 [QCAP]
    matrix_flat: jax.Array,  # int32 [441]
    params: jax.Array,  # int32 [4]: nq, gop, gex, reserved
    interpret: bool = False,
    unroll: int | None = None,
    exact: bool = False,
) -> jax.Array:
    """Scores f32 [T, g*nsl]; one pallas_call, grid over tiles.

    Default mode stores DP state as saturating int16: scores < SAT are
    exact; a returned score >= SAT means 16-bit overflow — re-scan with
    ``exact=True`` (full int32 state) for those, mirroring the
    reference's s16 fast path + s32 overflow pass.
    """
    unroll = DEFAULT_UNROLL if unroll is None else unroll
    T, L, g, nsl = tiles.shape
    assert g % G == 0 and nsl % NSL == 0, (g, nsl)
    assert L % unroll == 0, (L, unroll)
    # unroll=1 trips the Mosaic replicated-layout phi bug (a 1-element
    # jnp.stack folds to a splat); production never uses it.
    assert unroll >= 2, unroll
    A = _alphabet_dim(matrix_flat)
    state_dtype = jnp.int32 if exact else jnp.int16
    state_bytes = 4 if exact else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, L, g, nsl), lambda t, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, g, nsl), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((A, L, g, nsl), jnp.int8),
            pltpu.VMEM((L, g, nsl), state_dtype),
            pltpu.VMEM((L, g, nsl), state_dtype),
        ],
    )

    kernel = functools.partial(
        _sw_cell_kernel, L=L, U=unroll, G=g, NSL=nsl,
        state_dtype=state_dtype, A=A,
    )
    elems = L * g * nsl
    # LUT (i8) + X (i8, double-buffered input) + 2 state arrays +
    # headroom for the LUT build's temporaries (bounded by the fori_loop).
    vmem_bytes = (
        elems * (A + 2)
        + 2 * elems * state_bytes
        + 4 * elems * 4
    )
    vmem_bytes = min(max(int(vmem_bytes), 32 << 20), 100 << 20)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, g, nsl), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(params, query, matrix_flat, tiles)
    return out.reshape(T, g * nsl)
