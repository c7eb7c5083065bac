"""Column-chunked Pallas TPU kernel: cell-sequential SW for long subjects.

Companion to ops/sw_pallas_cell.py for buckets whose padded length exceeds
CELL_MAX_L (the cell kernel's per-tile LUT is 21x the tile bytes, so its
VMEM budget caps L).  Same scan-free cell-sequential recurrence and the
same [*, 32, 128]-subject slab layout, but the loop nest is transposed:

* The grid is (tiles, subject-chunks): subject position j streams through
  the kernel LC columns at a time, so subjects of ANY length fit — the
  tile block, its substitution LUT and the DP state are all O(LC), not
  O(L).  DP state persists in VMEM scratch across the chunk axis
  (sequential TPU grid), exactly like the reference's multi-pass kernels
  carry H/E columns between passes
  (/root/reference/src/half2_kernels.cuh:316-468).
* State is per *query row*: Hcol/Ecol [NQC, 32, 128] hold H[i][j-1] and
  E[i][j-1] for every query row i; F and the H diagonal ride in registers
  along the inner i loop.  NQC caps the query rows per invocation.
* Queries longer than NQC are processed in chunks of NQC rows by the
  caller, carrying the bottom-row H/F boundary (one [T, L, 32, 128] i32
  pair per call) through HBM between calls — the analog of the
  reference's 4 GiB global-memory temp (cudasw4.cuh:1928-1947).  The
  ``take_init``/``emit_state`` static flags select the chunk-boundary
  variants; per-call scores combine by max, since every DP cell belongs
  to exactly one (query-chunk, subject-chunk) call.

The caller must pad the query-chunk row count to a multiple of the unroll
factor with UNKNOWN letters; B[UNKNOWN][.] < 0 for every shipped matrix,
so padded rows can never raise any column's running maximum (checked in
substitution.py tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import ALPHABET_SIZE
from .sw_pallas_cell import G, NSL, NEG, SAT, _alphabet_dim, build_sub_lut

#: int16-state stand-in for -inf (E's virtual column init); E >= gop from
#: the first computed column, so any value < gop works.
NEG16 = -20000

#: Subject positions per grid step (all long-bucket lengths are multiples).
#: Tunable per TPU generation via gridsearch --emit-config (packing.apply_tuning).
LC = 128

#: Inner-loop unroll (query rows per VMEM access).  The padding granule
#: for every query-row count fed to the col kernels — engine padding and
#: kernel calls resolve unroll=None to this, so a gridsearch-tuned value
#: stays consistent across the whole pipeline.  8 measured +3.5-4.5%
#: over 4 on v5e across every single/flat config (tools/colunroll.py,
#: round 4: e.g. 300.5 -> 313.4 GCUPS at L=1024 q=3072; 12 is flat);
#: the cell kernel's subject-axis unroll stays 4 (its round-1 sweep).
DEFAULT_UNROLL = 8

import os as _os

#: Query rows per invocation (state = 2 * NQC * 4096 * 4B = 96 MB VMEM at
#: the default 3072, inside the 118 MB request; round-3 A/B on v5e:
#: 3072 beats 2048 by +8% on 3005-aa queries (one pass instead of two)
#: and +2.7% on 5478-aa, no change at <= 2048.  3584 would put the
#: carry-variant request past the 128 MB core.
NQC = int(_os.environ.get("CUDASW4_TPU_COL_NQC", 3072))

#: VMEM request ceiling for the column kernels (v5e core = 128 MB; the
#: NQC=3072 state plus LUT and carry-io blocks measures stable at 118 MB).
_VMEM_CAP = int(_os.environ.get("CUDASW4_TPU_COL_VMEM_CAP", 118 << 20))

#: Ceiling for the carry-in+carry-out exact variant only (see the vmem
#: computation in score_bucket_pallas_col): needs ~123.5 MB at default
#: geometry, verified to compile and run at this request on v5e.
_VMEM_CAP_CARRY = int(
    _os.environ.get("CUDASW4_TPU_COL_VMEM_CAP_CARRY", 127 << 20)
)

#: State-pool rows for flat-pool passes that run FUSED into one XLA
#: program alongside other passes (the mesh-resident batch scan).
#: Round-4 root cause (tools/fusedcrash.py, docs/PERFORMANCE.md "fused
#: big-state crash root-caused"): programs containing >= 64 MB-scratch
#: col kernels stall 80-750 s PER KERNEL at first execution on this
#: remote-compile platform (server-side load/codegen; the identical
#: call runs 0.7 s warm), so ~16 fused 96 MB passes exceeded the
#: worker's patience and surfaced as a "crash" in rounds 2-3.  32 MB
#: (1024 rows int32) never stalls, so fused contexts cap the pool
#: there; the single-chip resident and all streaming paths dispatch one
#: program per pass, whose one-time per-shape cold cost the jit cache
#: amortises, and use the full NQC.
FUSED_RTOT = int(_os.environ.get("CUDASW4_TPU_COL_FUSED_RTOT", 1024))



def _sw_col_kernel(refs, *, LCk, U, take_init, emit_state,
                   state_dtype=jnp.int16, A=ALPHABET_SIZE):
    if take_init and emit_state:
        (params_ref, q_ref, b_ref, x_ref, hin_ref, fin_ref,
         out_ref, hout_ref, fout_ref,
         lut_ref, hcol_ref, ecol_ref, m_ref, dcarry_ref) = refs
    elif take_init:
        (params_ref, q_ref, b_ref, x_ref, hin_ref, fin_ref,
         out_ref, lut_ref, hcol_ref, ecol_ref, m_ref, dcarry_ref) = refs
    elif emit_state:
        (params_ref, q_ref, b_ref, x_ref,
         out_ref, hout_ref, fout_ref,
         lut_ref, hcol_ref, ecol_ref, m_ref, dcarry_ref) = refs
    else:
        (params_ref, q_ref, b_ref, x_ref,
         out_ref, lut_ref, hcol_ref, ecol_ref, m_ref, dcarry_ref) = refs

    nqp = params_ref[0]  # query rows this chunk, multiple of U
    gop = params_ref[1]
    gex = params_ref[2]
    c = pl.program_id(1)

    build_sub_lut(x_ref, b_ref, lut_ref, (LCk, G, NSL), A=A)

    narrow = state_dtype != jnp.int32
    sat = jnp.int32(SAT)

    # Concrete-layout constants (see the sw_pallas_cell phi-layout note;
    # int garbage * 0 == 0, so reading uninitialised scratch is safe).
    zero = m_ref[...] * 0
    negv = zero + NEG
    negs = zero + (NEG16 if narrow else NEG)
    nsteps = nqp // U

    @pl.when(c == 0)
    def _():
        m_ref[...] = zero
        # H[i0-1][-1] = 0: the virtual column left of the subject is all
        # zeros for any query row (local alignment).
        dcarry_ref[...] = zero
        # Init the i-state in register-sized chunks: whole-array splat
        # stores are lowered through an HBM-materialised constant and cost
        # milliseconds per tile; chunked stores run at VMEM speed.  Only
        # rows [0, nqp) are ever read back, but nqp is dynamic, so fill
        # the full NQC extent.
        def izero(i, _):
            hcol_ref[pl.ds(i * U, U)] = jnp.stack(
                [zero.astype(state_dtype)] * U
            )
            ecol_ref[pl.ds(i * U, U)] = jnp.stack(
                [negs.astype(state_dtype)] * U
            )
            return 0

        jax.lax.fori_loop(0, NQC // U, izero, 0)

    m0 = m_ref[...]

    def col_step(j, carry):
        # prev_hinit = H[i0-1][j-1], i.e. the hprev-init of column j-1.
        prev_hinit, m = carry
        if take_init:
            hinit = hin_ref[0, j]  # H[i0-1][j]
            finit = fin_ref[0, j]  # F[i0-1][j]
        else:
            hinit = zero
            finit = negv

        def row_step(ii, icarry):
            hdiag, hprev, freg, m = icarry
            i0 = ii * U
            # int32 arithmetic on int16-resident state (see the cell
            # kernel: the DP loop is VMEM-port-bound, int16 halves it).
            hc_s = hcol_ref[pl.ds(i0, U)].astype(jnp.int32)  # H[i0+u][j-1]
            ec_s = ecol_ref[pl.ds(i0, U)].astype(jnp.int32)  # E[i0+u][j-1]
            hnew = []
            enew = []
            for u in range(U):
                qi = q_ref[i0 + u]
                sub = lut_ref[qi, j].astype(jnp.int32)
                hc = hc_s[u]
                e = jnp.maximum(ec_s[u] + gex, hc + gop)
                f = jnp.maximum(freg + gex, hprev + gop)
                h = jnp.maximum(hdiag + sub, jnp.maximum(e, f))
                h = jnp.maximum(h, 0)
                m = jnp.maximum(m, h)
                hnew.append(h)
                enew.append(e)
                hdiag = hc
                hprev = h
                freg = f
            hs = jnp.stack(hnew)
            if narrow:
                # Saturate before narrowing; m >= SAT flags the overflow
                # (see sw_pallas_cell).  E needs no clamp: gop <= E < SAT.
                hs = jnp.minimum(hs, sat)
            hcol_ref[pl.ds(i0, U)] = hs.astype(state_dtype)
            ecol_ref[pl.ds(i0, U)] = jnp.stack(enew).astype(state_dtype)
            return (hdiag, hprev, freg, m)

        hlast, hbot, fbot, m = jax.lax.fori_loop(
            0, nsteps, row_step, (prev_hinit, hinit, finit, m)
        )
        del hlast
        if emit_state:
            hout_ref[0, j] = hbot  # H[i0+nqp-1][j]
            fout_ref[0, j] = fbot
        return (hinit, m)

    prev_hinit, m = jax.lax.fori_loop(
        0, LCk, col_step, (dcarry_ref[...], m0)
    )
    dcarry_ref[...] = prev_hinit
    m_ref[...] = m
    out_ref[0] = m.astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "take_init", "emit_state", "interpret", "unroll", "exact"
    ),
)
def score_bucket_pallas_col(
    tiles: jax.Array,  # int8 [T, L, G, NSL], L % LC == 0
    query: jax.Array,  # int32 [NQC] chunk of the query (UNKNOWN-padded)
    matrix_flat: jax.Array,  # int32 [441]
    params: jax.Array,  # int32 [4]: nq_pad (multiple of unroll), gop, gex, 0
    state_in=None,  # (hrow, frow) int32 [T, L, G, NSL] from the prior chunk
    take_init: bool = False,
    emit_state: bool = False,
    interpret: bool = False,
    unroll: int | None = None,
    exact: bool = False,
):
    """Scores f32 [T, G*NSL] = per-subject max over this query chunk's rows.

    With ``emit_state`` also returns (hrow, frow) int32 [T, L, G, NSL]: the
    bottom query row's H/F per subject position, the boundary input for the
    next query chunk.  Default mode stores DP state as saturating int16;
    a score >= SAT flags 16-bit overflow — re-run with ``exact=True``.
    """
    unroll = DEFAULT_UNROLL if unroll is None else unroll
    T, L, g, nsl = tiles.shape
    A = _alphabet_dim(matrix_flat)
    assert (g, nsl) == (G, NSL), (g, nsl)
    assert L % LC == 0, L
    assert take_init == (state_in is not None)
    C = L // LC
    state_dtype = jnp.int32 if exact else jnp.int16

    in_specs = [pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0))]
    inputs = [tiles]
    if take_init:
        in_specs += [
            pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0)),
            pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0)),
        ]
        inputs += [state_in[0], state_in[1]]

    out_specs = [pl.BlockSpec((1, g, nsl), lambda t, c, *_: (t, 0, 0))]
    out_shape = [jax.ShapeDtypeStruct((T, g, nsl), jnp.float32)]
    if emit_state:
        out_specs += [
            pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0)),
            pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0)),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((T, L, g, nsl), jnp.int32),
            jax.ShapeDtypeStruct((T, L, g, nsl), jnp.int32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T, C),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((A, LC, g, nsl), jnp.int8),
            pltpu.VMEM((NQC, g, nsl), state_dtype),
            pltpu.VMEM((NQC, g, nsl), state_dtype),
            pltpu.VMEM((g, nsl), jnp.int32),
            pltpu.VMEM((g, nsl), jnp.int32),
        ],
    )

    kernel = functools.partial(
        _sw_col_kernel_entry, LCk=LC, U=unroll,
        take_init=take_init, emit_state=emit_state, state_dtype=state_dtype,
        A=A,
    )
    chunk = LC * g * nsl
    state = NQC * g * nsl * 4 * 2
    io = chunk * (2 + 4 * (2 * int(take_init) + 2 * int(emit_state)))
    vmem_bytes = chunk * A + state + io + 8 * chunk * 4
    # The take+emit exact variant (middle chunks of >= 3-chunk queries,
    # i.e. queries beyond 2*NQC rows) carries BOTH boundary-state io
    # sets and needs ~123.5 MB at the default geometry — above the 118
    # MB cap that every other variant fits (round-5 warmup() exposed
    # this: the shape had never executed on real hardware because the
    # reference ladder tops out at 5478 aa = 2 chunks).  Let it request
    # up to the core's full 128 MB; Mosaic still verifies the fit.
    cap = _VMEM_CAP
    if take_init and emit_state and exact:
        cap = max(cap, _VMEM_CAP_CARRY)
    vmem_bytes = min(max(int(vmem_bytes), 48 << 20), cap)
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(params, query, matrix_flat, *inputs)
    scores = res[0].reshape(T, g * nsl)
    if emit_state:
        return scores, (res[1], res[2])
    return scores


def _sw_col_kernel_entry(*refs, LCk, U, take_init, emit_state, state_dtype,
                         A=ALPHABET_SIZE):
    _sw_col_kernel(refs, LCk=LCk, U=U, take_init=take_init,
                   emit_state=emit_state, state_dtype=state_dtype, A=A)


def pad_query_chunk(codes, unroll: int | None = None, pad: int | None = None):
    """Pad one query chunk to a multiple of ``unroll`` (and at least 1
    slab), returning (qpad [NQC] int32, nq_pad).  ``pad``: padding code
    (UNKNOWN classic, 25 full-blosum)."""
    import numpy as np

    from ..constants import UNKNOWN

    unroll = DEFAULT_UNROLL if unroll is None else unroll
    nq = len(codes)
    assert nq <= NQC, (nq, NQC)
    nq_pad = max(unroll, -(-nq // unroll) * unroll)
    out = np.full(NQC, UNKNOWN if pad is None else pad, dtype=np.int32)
    out[:nq] = codes
    return out, nq_pad


#: HBM budget for the chunked-query boundary-carry temp (H/F bottom rows,
#: 2 x int32 per tile char = 8x the tile bytes).  Buckets whose carry
#: would exceed this are processed in tile groups, each running the full
#: query-chunk loop before the next group starts — the exact analog of
#: the reference's maxTempBytes subject batching for its 4 GiB multi-pass
#: temp (/root/reference/src/cudasw4.cuh:1928-1947).  In+out states live
#: simultaneously (~2x this value per group), and the eager path's
#: lag-1 group pipeline keeps TWO groups live, so peak HBM use is ~4x:
#: 1 GiB keeps the peak ~4 GiB, which coexists with a 2 GiB resident
#: bucket plus batch intermediates on a 16 GiB chip (a 2 GiB budget
#: measured a device fault at 1M x 2048 even before the pipeline).
COL_CARRY_TEMP_BYTES = int(
    _os.environ.get("CUDASW4_TPU_COL_TEMP_BYTES", 1 << 30)
)


def score_bucket_col_any_query(
    tiles, codes, matrix_flat, gop: int, gex: int, unroll: int | None = None,
    interpret: bool = False, exact: bool = False, pad: int | None = None,
    temp_bytes: int | None = None,
):
    """Score a col-layout bucket against a query of any length by chunking
    the query into NQC-row passes with H/F boundary carry through HBM,
    processing tiles in groups that bound the carry temp (see
    COL_CARRY_TEMP_BYTES).

    KEEP IN SYNC with parallel/sharding.py::_col_chunked_local — the
    same tile-group/boundary-carry algorithm inside a shard_map.
    Intentional divergence: this eager path pipelines groups lag-1
    (two groups' carries live, see below), while the shard_map twin
    strictly serializes groups via a fake data dependency (host syncs
    are impossible there, and per-shard tile counts are smaller).
    Changes to the temp budget, carry semantics, or the single-group
    special case must still land in both.

    ``codes``: encoded query (numpy int8/int32, host).  Returns f32
    [T, G*NSL] scores (device array).
    """
    import numpy as np

    unroll = DEFAULT_UNROLL if unroll is None else unroll
    n = len(codes)
    chunks = [codes[s : s + NQC] for s in range(0, n, NQC)] or [codes]
    qps = []
    for chunk in chunks:
        qpad, nq_pad = pad_query_chunk(chunk, unroll, pad=pad)
        qps.append((
            jnp.asarray(qpad),
            jnp.asarray(np.array([nq_pad, gop, gex, 0], dtype=np.int32)),
        ))

    T, L, g, nsl = tiles.shape
    budget = COL_CARRY_TEMP_BYTES if temp_bytes is None else temp_bytes
    per_tile_state = 2 * L * g * nsl * 4
    # tc sizes ONE group's carry at ~budget (in+out states ~2x); the
    # lag-1 pipeline below keeps TWO groups live, so peak HBM use is
    # ~4x the budget — the default 1 GiB budget is set with that
    # multiplier in mind (docs at COL_CARRY_TEMP_BYTES).
    tc = T if len(chunks) == 1 else max(1, min(T, budget // per_tile_state))

    multi = tc < T
    parts = []
    pending = None  # previous group's device scores (lag-1 pipeline)
    for t0 in range(0, T, tc):
        sub = tiles[t0 : t0 + tc]
        best = None
        state = None
        for k, (qpad, params) in enumerate(qps):
            emit = k + 1 < len(qps)
            res = score_bucket_pallas_col(
                sub, qpad, matrix_flat, params,
                state_in=state, take_init=state is not None,
                emit_state=emit, interpret=interpret, unroll=unroll,
                exact=exact,
            )
            if emit:
                scores, state = res
            else:
                scores, state = res, None
            best = scores if best is None else jnp.maximum(best, scores)
        if multi:
            # Lag-1 group pipeline: materialize group i-1 only after
            # dispatching group i, so the host round-trip (score fetch +
            # next-group dispatch, ~tens of ms on a tunneled runtime)
            # overlaps device compute instead of idling it — 16 groups x
            # 6 long queries of sync bubbles cost ~2% of the 1M x 2048
            # sweep config.  Bounded at TWO groups' carry states live
            # (~4x COL_CARRY_TEMP_BYTES peak); it was the original
            # fully-async dispatch — every group's multi-GB carry live
            # at once — that faulted the device in round 2.
            if pending is not None:
                parts.append(np.asarray(pending))
            pending = best
        else:
            parts.append(best)
    if not multi:
        return parts[0]
    if pending is not None:
        parts.append(np.asarray(pending))
    return jnp.asarray(np.concatenate(parts, axis=0))



def _sw_col_flat_kernel(refs, *, LCk, U, S, OFFS, RTOT,
                        state_dtype=jnp.int32, A=ALPHABET_SIZE):
    """Flat-pool multi-query column kernel: S query slots share ONE
    RTOT-row DP state pool via per-slot row offsets.

    A fixed-geometry (R, S) batch kernel gives every slot the same
    power-of-two row capacity R, so one 1000-aa query in a mixed batch
    forces R=1024 and S=1 — i.e. no batching at all for the reference
    ladder.  Here slot qb owns state rows [OFFS[qb], OFFS[qb] + nqp_qb)
    of a single flat pool, so a pass batches any mix of query lengths
    whose row counts *sum* to <= RTOT: each tile block is streamed and
    its LUT built once for the whole pass, the same
    all-partitions-per-upload amortisation as the reference
    (cudasw4.cuh:1742-2103) without its per-partition template geometry.

    Shape discipline from the round-3 A/B ladder (all measured on v5e,
    1M x 1024, vs the single-query kernel's 297-300 GCUPS):
    - slots Python-unrolled; a fori_loop over slots was -16% (idle
      slots pay LCk loop trips per grid step, and the extra nest
      degrades Mosaic's schedule for the live ones);
    - OFFS static; the offsets read from SMEM params cost -12% (the
      dynamic base defeats address induction in the row loop);
    - S = the pass's true slot count; a fixed S=16 output block with
      idle tail slots cost -8-12% (the [S, G, NSL] out block is moved
      every grid step).  Result: S=1 matches singles exactly (300.8),
      S=2 runs 290.8, S=8 278 — a net win over per-query passes
      whenever more than one query shares the tile stream.
    """
    (params_ref, q_ref, b_ref, x_ref, out_ref,
     lut_ref, hcol_ref, ecol_ref, m_ref, dcarry_ref) = refs

    gop = params_ref[1]
    gex = params_ref[2]
    c = pl.program_id(1)

    build_sub_lut(x_ref, b_ref, lut_ref, (LCk, G, NSL), A=A)

    narrow = state_dtype != jnp.int32
    sat = jnp.int32(SAT)
    zero = m_ref[0] * 0
    negv = zero + NEG
    negs = zero + (NEG16 if narrow else NEG)

    for qb in range(S):
        nqp = params_ref[4 + qb]  # rows this slot, multiple of U
        off = OFFS[qb]  # static first state-pool row of this slot
        nsteps = nqp // U

        @pl.when(c == 0)
        def _(qb=qb, off=off, nsteps=nsteps):
            m_ref[qb] = zero
            dcarry_ref[qb] = zero

            # Init only this slot's rows (dynamic trip count): short
            # slots pay O(nqp), unlike a fixed-geometry full-R splat.
            def izero(i, _):
                hcol_ref[pl.ds(off + i * U, U)] = jnp.stack(
                    [zero.astype(state_dtype)] * U
                )
                ecol_ref[pl.ds(off + i * U, U)] = jnp.stack(
                    [negs.astype(state_dtype)] * U
                )
                return 0

            jax.lax.fori_loop(0, nsteps, izero, 0)

        m0 = m_ref[qb]

        def col_step(j, carry, qb=qb, off=off, nsteps=nsteps):
            # prev_hinit is the H diagonal above the slot's first row:
            # identically 0 for local alignment (virtual row), carried
            # through dcarry to keep the proven single-kernel loop
            # structure (Mosaic's schedule is hypersensitive to it).
            prev_hinit, m = carry
            hinit = zero
            finit = negv

            def row_step(ii, icarry):
                hdiag, hprev, freg, m = icarry
                i0 = off + ii * U
                hc_s = hcol_ref[pl.ds(i0, U)].astype(jnp.int32)
                ec_s = ecol_ref[pl.ds(i0, U)].astype(jnp.int32)
                hnew = []
                enew = []
                for u in range(U):
                    qi = q_ref[qb, ii * U + u]
                    sub = lut_ref[qi, j].astype(jnp.int32)
                    hc = hc_s[u]
                    e = jnp.maximum(ec_s[u] + gex, hc + gop)
                    f = jnp.maximum(freg + gex, hprev + gop)
                    h = jnp.maximum(hdiag + sub, jnp.maximum(e, f))
                    h = jnp.maximum(h, 0)
                    m = jnp.maximum(m, h)
                    hnew.append(h)
                    enew.append(e)
                    hdiag = hc
                    hprev = h
                    freg = f
                hs = jnp.stack(hnew)
                if narrow:
                    hs = jnp.minimum(hs, sat)
                hcol_ref[pl.ds(i0, U)] = hs.astype(state_dtype)
                ecol_ref[pl.ds(i0, U)] = jnp.stack(enew).astype(
                    state_dtype
                )
                return (hdiag, hprev, freg, m)

            _, _, _, m = jax.lax.fori_loop(
                0, nsteps, row_step, (prev_hinit, hinit, finit, m)
            )
            return (hinit, m)

        prev_hinit, m = jax.lax.fori_loop(
            0, LCk, col_step, (dcarry_ref[qb], m0)
        )
        dcarry_ref[qb] = prev_hinit
        m_ref[qb] = m
        out_ref[0, qb] = m.astype(jnp.float32)


def _sw_col_flat_kernel_entry(*refs, LCk, U, S, OFFS, RTOT, state_dtype,
                              A=ALPHABET_SIZE):
    _sw_col_flat_kernel(refs, LCk=LCk, U=U, S=S, OFFS=OFFS, RTOT=RTOT,
                        state_dtype=state_dtype, A=A)


#: Flat-pool passes with at least this many slots use the masked-FUSED
#: row loop (one row loop over the concatenated slot queries with
#: per-step boundary masks) instead of S Python-unrolled slot loops.
#: <=0 (the DEFAULT) disables fusion: the round-5 A/B on v5e
#: (tools/colfusebench.py, tools/colfusediag.py) measured the fused
#: kernel 7-11% SLOWER than the slot-unrolled one at every S — and the
#: isolation showed the loss is NOT the boundary machinery: a stripped
#: variant with no masks at all, and a per-column static-offset nest,
#: both still ran 5-10% below the slot-unrolled kernel (Mosaic's
#: schedule for the proven structure degrades under every
#: restructuring, the same hypersensitivity the round-2 LUT-hoist
#: experiment hit).  So the S-slot row-loop-entry tax (~5% at S=3, ~8%
#: at S=6, tools/colunroll.py) is CHEAPER than the fix; ROADMAP item 3
#: is closed by measurement.  The kernel stays available (exact,
#: tested): its compile key is slot-composition-independent — one
#: program per (S, rtot) instead of one per static offset tuple —
#: which may pay on platforms where per-program cold-start cost
#: dominates (see the fused big-state stall writeup) or on TPU
#: generations that schedule the masked loop better.
COL_FUSE_MIN_S = int(_os.environ.get("CUDASW4_TPU_COL_FUSE_MIN_S", 0))


def _sw_col_flat_fused_kernel(refs, *, LCk, U, S, RTOT,
                              state_dtype=jnp.int32, A=ALPHABET_SIZE):
    """Masked-fused flat-pool kernel: ONE row loop walks the S slots'
    concatenated query rows; per-step scalar control marks slot
    boundaries, where the DP carries (hdiag/hprev/freg — the virtual
    row above a slot start is H=0/F=-inf for local alignment) and the
    running max reset via vector selects, and the finished slot's max
    flushes into its m_ref row.

    vs the slot-unrolled kernel (_sw_col_flat_kernel): rows pack
    GAPLESS at the unroll granule (no FLAT_QUANT reservation waste),
    the compile key is (T, L, S, RTOT, unroll, exact) — independent of
    the slot composition, so query mixes share one program (the
    slot-unrolled kernel compiles per static OFFS tuple) — and each
    column pays one row-loop entry instead of S.  The boundary masks
    cost ~4 selects per U rows whether S is 1 or 8, which is why this
    variant only dispatches at S >= COL_FUSE_MIN_S.

    The reference analog of the S-slot sharing is the
    all-partitions-per-upload batching (cudasw4.cuh:1742-2103); the
    boundary-mask trick has no CUDA counterpart (there, independent
    alignments are simply different warps)."""
    (params_ref, q_ref, ctrl_ref, b_ref, x_ref, out_ref,
     lut_ref, hcol_ref, ecol_ref, m_ref) = refs

    nr = params_ref[0]  # total concatenated rows, multiple of U
    gop = params_ref[1]
    gex = params_ref[2]
    c = pl.program_id(1)

    build_sub_lut(x_ref, b_ref, lut_ref, (LCk, G, NSL), A=A)

    narrow = state_dtype != jnp.int32
    sat = jnp.int32(SAT)
    zero = m_ref[0] * 0
    negv = zero + NEG
    negs = zero + (NEG16 if narrow else NEG)
    nsteps = nr // U

    @pl.when(c == 0)
    def _():
        for qb in range(S):
            m_ref[qb] = zero

        def izero(i, _):
            hcol_ref[pl.ds(i * U, U)] = jnp.stack(
                [zero.astype(state_dtype)] * U
            )
            ecol_ref[pl.ds(i * U, U)] = jnp.stack(
                [negs.astype(state_dtype)] * U
            )
            return 0

        jax.lax.fori_loop(0, nsteps, izero, 0)

    def col_step(j, carry):
        def row_step(ii, icarry):
            hdiag, hprev, freg, m = icarry
            i0 = ii * U
            fl = ctrl_ref[ii]  # slot ending at this step's boundary, or -1
            bnd = fl >= 0

            # Flush the finished slot's running max (reads m BEFORE the
            # boundary reset below).  Rare: S-1 stores per column.
            @pl.when(bnd)
            def _(m=m):
                prev = m_ref[pl.ds(fl, 1)]
                m_ref[pl.ds(fl, 1)] = jnp.maximum(prev, m[None])

            # Boundary reset: the virtual row above a slot's first row
            # is H = 0 (both columns) and F = -inf.
            hdiag = jnp.where(bnd, zero, hdiag)
            hprev = jnp.where(bnd, zero, hprev)
            freg = jnp.where(bnd, negv, freg)
            m = jnp.where(bnd, zero, m)

            hc_s = hcol_ref[pl.ds(i0, U)].astype(jnp.int32)
            ec_s = ecol_ref[pl.ds(i0, U)].astype(jnp.int32)
            hnew = []
            enew = []
            for u in range(U):
                qi = q_ref[i0 + u]
                sub = lut_ref[qi, j].astype(jnp.int32)
                hc = hc_s[u]
                e = jnp.maximum(ec_s[u] + gex, hc + gop)
                f = jnp.maximum(freg + gex, hprev + gop)
                h = jnp.maximum(hdiag + sub, jnp.maximum(e, f))
                h = jnp.maximum(h, 0)
                m = jnp.maximum(m, h)
                hnew.append(h)
                enew.append(e)
                hdiag = hc
                hprev = h
                freg = f
            hs = jnp.stack(hnew)
            if narrow:
                hs = jnp.minimum(hs, sat)
            hcol_ref[pl.ds(i0, U)] = hs.astype(state_dtype)
            ecol_ref[pl.ds(i0, U)] = jnp.stack(enew).astype(state_dtype)
            return (hdiag, hprev, freg, m)

        _, _, _, mlast = jax.lax.fori_loop(
            0, nsteps, row_step, (zero, zero, negv, zero)
        )
        # The last slot has no following boundary: flush it here
        # (static index).
        m_ref[S - 1] = jnp.maximum(m_ref[S - 1], mlast)
        return carry

    jax.lax.fori_loop(0, LCk, col_step, 0)
    for qb in range(S):
        out_ref[0, qb] = m_ref[qb].astype(jnp.float32)


def _sw_col_flat_fused_kernel_entry(*refs, LCk, U, S, RTOT, state_dtype,
                                    A=ALPHABET_SIZE):
    _sw_col_flat_fused_kernel(refs, LCk=LCk, U=U, S=S, RTOT=RTOT,
                              state_dtype=state_dtype, A=A)


#: Offset quantum for the flat pool: slot reservations round up to a
#: multiple of this, so the static offset tuples (part of the kernel
#: compile key) take few distinct values across query mixes and the
#: Mosaic compile cache stays bounded.
FLAT_QUANT = 128


@functools.partial(
    jax.jit,
    static_argnames=("offs", "rtot", "interpret", "unroll", "exact"),
)
def score_bucket_pallas_col_flat(
    tiles: jax.Array,  # int8 [T, L, G, NSL], L % LC == 0
    queries: jax.Array,  # int32 [S, W] query slots (pad-letter padded)
    matrix_flat: jax.Array,  # int32 [A*A]
    params: jax.Array,  # int32 [4+S]: _, gop, gex, _, nqp_0..nqp_{S-1}
    offs: tuple = (),  # static state-pool row offset per slot
    rtot: int | None = None,
    interpret: bool = False,
    unroll: int | None = None,
    exact: bool = True,
):
    """Scores f32 [S, T, G*NSL]: S flat-pool slots per tile stream.

    Slot qb runs queries[qb, :nqp_qb] against state rows
    [offs[qb], offs[qb]+nqp_qb); the caller guarantees every nqp is a
    multiple of ``unroll``, offsets are non-overlapping multiples of
    FLAT_QUANT (compile-cache discipline) and offs[qb] + nqp_qb <=
    rtot (default NQC).  See col_flat_plan for the packing."""
    unroll = DEFAULT_UNROLL if unroll is None else unroll
    T, L, g, nsl = tiles.shape
    S, W = queries.shape
    A = _alphabet_dim(matrix_flat)
    RTOT = NQC if rtot is None else rtot
    assert (g, nsl) == (G, NSL), (g, nsl)
    assert L % LC == 0, L
    assert W <= RTOT, (W, RTOT)
    assert len(offs) == S, (offs, S)
    # Static sanity on the pool layout: an offset at/past the pool means
    # the planner overran rtot — the resulting OOB state write faults
    # the TPU worker (nqp is dynamic, so the full offs[qb]+nqp <= rtot
    # contract is the caller's; col_flat_plan guarantees it).
    assert not offs or max(offs) < RTOT, (offs, RTOT)
    C = L // LC
    state_dtype = jnp.int32 if exact else jnp.int16
    state_bytes = 4 if exact else 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0))
        ],
        out_specs=[
            pl.BlockSpec((1, S, g, nsl), lambda t, c, *_: (t, 0, 0, 0))
        ],
        scratch_shapes=[
            pltpu.VMEM((A, LC, g, nsl), jnp.int8),
            pltpu.VMEM((RTOT, g, nsl), state_dtype),
            pltpu.VMEM((RTOT, g, nsl), state_dtype),
            pltpu.VMEM((S, g, nsl), jnp.int32),
            pltpu.VMEM((S, g, nsl), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _sw_col_flat_kernel_entry, LCk=LC, U=unroll, S=S, OFFS=offs,
        RTOT=RTOT, state_dtype=state_dtype, A=A,
    )
    chunk = LC * g * nsl
    state = 2 * RTOT * g * nsl * state_bytes
    vmem_bytes = chunk * A + state + 4 * chunk + 8 * chunk * 4
    vmem_bytes = min(max(int(vmem_bytes), 48 << 20), _VMEM_CAP)
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((T, S, g, nsl), jnp.float32),),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(params, queries, matrix_flat, tiles)
    return res[0].transpose(1, 0, 2, 3).reshape(S, T, g * nsl)


@functools.partial(
    jax.jit,
    static_argnames=("rtot", "interpret", "unroll", "exact"),
)
def score_bucket_pallas_col_flat_fused(
    tiles: jax.Array,  # int8 [T, L, G, NSL], L % LC == 0
    queries: jax.Array,  # int32 [S, W] query slots (pad-letter padded)
    matrix_flat: jax.Array,  # int32 [A*A]
    params: jax.Array,  # int32 [4+S]: _, gop, gex, _, nqp_0..nqp_{S-1}
    rtot: int | None = None,
    interpret: bool = False,
    unroll: int | None = None,
    exact: bool = True,
):
    """Masked-fused twin of score_bucket_pallas_col_flat: same contract
    (scores f32 [S, T, G*NSL]; caller guarantees every nqp is a multiple
    of ``unroll`` and sum(nqp) <= rtot), but slots pack GAPLESS into one
    concatenated row walk — no static offsets, so one compiled program
    serves every slot composition with the same (S, rtot).  Dispatched
    by batch_col_scores for passes with >= COL_FUSE_MIN_S slots."""
    unroll = DEFAULT_UNROLL if unroll is None else unroll
    T, L, g, nsl = tiles.shape
    S, W = queries.shape
    A = _alphabet_dim(matrix_flat)
    RTOT = NQC if rtot is None else rtot
    assert (g, nsl) == (G, NSL), (g, nsl)
    assert L % LC == 0, L
    assert W <= RTOT, (W, RTOT)
    assert RTOT % unroll == 0, (RTOT, unroll)
    C = L // LC
    state_dtype = jnp.int32 if exact else jnp.int16
    state_bytes = 4 if exact else 2
    U = unroll

    # Concatenate the slots' rows gapless (device-side; trivial next to
    # the scan): qcat[starts[qb] + i] = queries[qb, i] for i < nqp_qb,
    # and ctrl[step] = the slot that ENDS at that step boundary (-1
    # elsewhere) — every nqp is a multiple of U, so boundaries only
    # land on step starts.
    nqp = params[4 : 4 + S].astype(jnp.int32)
    rused = jnp.sum(nqp)
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(nqp)[:-1]]
    )
    iw = jnp.arange(W, dtype=jnp.int32)
    tgt = starts[:, None] + iw[None, :]
    valid = iw[None, :] < nqp[:, None]
    tgt = jnp.where(valid, tgt, RTOT)  # out-of-range rows drop
    qcat = (
        jnp.zeros((RTOT,), jnp.int32)
        .at[tgt.reshape(-1)]
        .set(queries.astype(jnp.int32).reshape(-1), mode="drop")
    )
    nst = RTOT // U
    ctrl = (
        jnp.full((nst,), -1, jnp.int32)
        .at[starts[1:] // U]
        .set(jnp.arange(S - 1, dtype=jnp.int32), mode="drop")
    )
    pf = jnp.stack(
        [rused, params[1], params[2], jnp.zeros((), jnp.int32)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(T, C),
        in_specs=[
            pl.BlockSpec((1, LC, g, nsl), lambda t, c, *_: (t, c, 0, 0))
        ],
        out_specs=[
            pl.BlockSpec((1, S, g, nsl), lambda t, c, *_: (t, 0, 0, 0))
        ],
        scratch_shapes=[
            pltpu.VMEM((A, LC, g, nsl), jnp.int8),
            pltpu.VMEM((RTOT, g, nsl), state_dtype),
            pltpu.VMEM((RTOT, g, nsl), state_dtype),
            pltpu.VMEM((S, g, nsl), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _sw_col_flat_fused_kernel_entry, LCk=LC, U=unroll, S=S,
        RTOT=RTOT, state_dtype=state_dtype, A=A,
    )
    chunk = LC * g * nsl
    state = 2 * RTOT * g * nsl * state_bytes
    vmem_bytes = chunk * A + state + 4 * chunk + 8 * chunk * 4
    vmem_bytes = min(max(int(vmem_bytes), 48 << 20), _VMEM_CAP)
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((T, S, g, nsl), jnp.float32),),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
        interpret=interpret,
    )(pf, qcat, ctrl, matrix_flat, tiles)
    return res[0].transpose(1, 0, 2, 3).reshape(S, T, g * nsl)
