"""Isolate the masked-fused flat-pool kernel's overhead (round 5).

The first fused A/B (tools/colfusebench.py) measured the masked-fused
kernel 7-11% SLOWER than the slot-unrolled kernel at every S — even at
S=1, where the boundary machinery never fires.  This tool monkeypatches
kernel variants into score_bucket_pallas_col_flat_fused to attribute
the overhead:

  base    the shipped masked-fused kernel (ctrl read + 4 selects +
          pl.when dynamic flush per step)
  nomask  concatenated row walk with NO boundary machinery at all
          (scores are correct only at S=1 — timing isolates the cost
          of the gapless walk itself)
  noflush ctrl read + 4 selects, but no pl.when/dynamic flush (scores
          correct only at S=1)
  colnest structurally different fusion: ONE column loop containing S
          python-unrolled row loops at STATIC offsets (no masks, fully
          correct for any S) — merges the S column walks the
          slot-unrolled kernel repeats, keeping address induction

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/colfusediag.py
       [L] [T] [reps]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.constants import UNKNOWN
from cudasw4_tpu.ops import sw_pallas_col
from cudasw4_tpu.ops.sw_pallas_col import NEG, NEG16, G, NSL
from cudasw4_tpu.ops.sw_pallas_cell import SAT, build_sub_lut

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T = int(sys.argv[2]) if len(sys.argv) > 2 else 16
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def _fused_variant(refs, *, LCk, U, S, RTOT, state_dtype=jnp.int32,
                   A=21, mode="base"):
    (params_ref, q_ref, ctrl_ref, b_ref, x_ref, out_ref,
     lut_ref, hcol_ref, ecol_ref, m_ref) = refs

    nr = params_ref[0]
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
                [zero.astype(state_dtype)] * U)
            ecol_ref[pl.ds(i * U, U)] = jnp.stack(
                [negs.astype(state_dtype)] * U)
            return 0

        jax.lax.fori_loop(0, nsteps, izero, 0)

    def dp_rows(i0, icarry, qoff=0):
        hdiag, hprev, freg, m = icarry
        hc_s = hcol_ref[pl.ds(i0, U)].astype(jnp.int32)
        ec_s = ecol_ref[pl.ds(i0, U)].astype(jnp.int32)
        hnew = []
        enew = []
        j = dp_rows.j
        for u in range(U):
            qi = q_ref[qoff + i0 + u] if mode == "colnest" else q_ref[i0 + u]
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

    if mode == "colnest":
        # One column loop; S static row loops at static offsets.
        OFFS = _fused_variant.OFFS

        def col_step(j, carry):
            dp_rows.j = j

            for qb in range(S):
                nqp = params_ref[4 + qb]
                off = OFFS[qb]

                def row_step(ii, icarry, off=off):
                    return dp_rows(off + ii * U, icarry)

                _, _, _, m = jax.lax.fori_loop(
                    0, nqp // U, row_step, (zero, zero, negv, m_ref[qb])
                )
                m_ref[qb] = m
            return carry

        jax.lax.fori_loop(0, LCk, col_step, 0)
    else:
        def col_step(j, carry):
            dp_rows.j = j

            def row_step(ii, icarry):
                hdiag, hprev, freg, m = icarry
                if mode != "nomask":
                    fl = ctrl_ref[ii]
                    bnd = fl >= 0
                    if mode == "base":
                        @pl.when(bnd)
                        def _(m=m):
                            prev = m_ref[pl.ds(fl, 1)]
                            m_ref[pl.ds(fl, 1)] = jnp.maximum(
                                prev, m[None])
                    hdiag = jnp.where(bnd, zero, hdiag)
                    hprev = jnp.where(bnd, zero, hprev)
                    freg = jnp.where(bnd, negv, freg)
                    m = jnp.where(bnd, zero, m)
                return dp_rows(ii * U, (hdiag, hprev, freg, m))

            _, _, _, mlast = jax.lax.fori_loop(
                0, nsteps, row_step, (zero, zero, negv, zero)
            )
            m_ref[S - 1] = jnp.maximum(m_ref[S - 1], mlast)
            return carry

        jax.lax.fori_loop(0, LCk, col_step, 0)

    for qb in range(S):
        out_ref[0, qb] = m_ref[qb].astype(jnp.float32)


def main():
    cfg = make_scoring_config("blosum62")
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    rng = np.random.default_rng(42)
    spt = 4096
    n = T * spt
    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    tiles = jnp.asarray(
        data.reshape(T, spt, L).transpose(0, 2, 1).reshape(T, L, 32, 128)
        .copy()
    )
    cu = sw_pallas_col.DEFAULT_UNROLL
    rtot = sw_pallas_col.NQC
    quant = sw_pallas_col.FLAT_QUANT
    real_kernel = sw_pallas_col._sw_col_flat_fused_kernel

    print(f"L={L} T={T} ({n} subjects) rtot={rtot} U={cu} reps={reps}")
    print(f"{'S':>2} {'variant':>8} {'GCUPS':>8} {'vs flat':>8} match")
    for S in (1, 3, 6):
        res = (rtot // S) // quant * quant
        nqp = res
        W = nqp
        queries = [rng.integers(0, 20, size=nqp - 3) for _ in range(S)]
        qarr = np.full((S, W), UNKNOWN, np.int32)
        nqps = np.zeros(S, np.int32)
        offs = []
        for i, q in enumerate(queries):
            qarr[i, : len(q)] = q
            nqps[i] = nqp
            offs.append(i * res)
        params = jnp.asarray(np.concatenate(
            [np.array([0, cfg.gop, cfg.gex, 0], np.int32), nqps]
        ))
        qdev = jnp.asarray(qarr)
        cells = float(S) * nqp * L * n

        def timed(fn):
            ref = np.asarray(fn())
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn())  # materialize: async dispatch otherwise
                ts.append(time.perf_counter() - t0)
            return ref, cells / min(ts) / 1e9

        want, gflat = timed(lambda: sw_pallas_col.score_bucket_pallas_col_flat(
            tiles, qdev, mat, params, offs=tuple(offs), rtot=rtot,
            exact=True,
        ))
        print(f"{S:>2} {'flat':>8} {gflat:>8.1f} {'':>8}")

        for mode in ("base", "nomask", "noflush", "colnest"):
            _fused_variant.OFFS = tuple(offs)
            sw_pallas_col._sw_col_flat_fused_kernel = functools.partial(
                _fused_variant, mode=mode
            )
            sw_pallas_col.score_bucket_pallas_col_flat_fused._clear_cache()
            try:
                got, g = timed(
                    lambda: sw_pallas_col.score_bucket_pallas_col_flat_fused(
                        tiles, qdev, mat, params, rtot=rtot, exact=True,
                    )
                )
                ok = np.array_equal(got, want)
                expect_ok = mode in ("base", "colnest") or S == 1
                flag = "OK" if ok else ("(wrong-by-design)"
                                        if not expect_ok else "MISMATCH!")
                print(f"{S:>2} {mode:>8} {g:>8.1f} "
                      f"{(g / gflat - 1) * 100:>7.1f}% {flag}")
            except Exception as e:
                print(f"{S:>2} {mode:>8} FAILED {str(e)[:80]}")
            finally:
                sw_pallas_col._sw_col_flat_fused_kernel = real_kernel
                sw_pallas_col.score_bucket_pallas_col_flat_fused._clear_cache()


if __name__ == "__main__":
    main()
