"""Experiment: P tiles per grid step for the cell kernel.

If the non-LUT per-tile fixed cost (~0.7 ms/tile, docs/PERFORMANCE.md) is
per-grid-step overhead rather than per-byte DMA time, fetching P tiles per
block and sweeping them in-kernel should cut it ~P-fold.

Usage: python tools/pairbench.py [L] [num_subjects] [qlen] [reps]
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.constants import ALPHABET_SIZE
from cudasw4_tpu.ops import sw_pallas, sw_pallas_cell
from cudasw4_tpu.ops.sw_pallas_cell import (
    G, NSL, NEG, build_sub_lut, _run_query_sweeps,
)


def _kernel_pair(params_ref, q_ref, b_ref, x_ref, out_ref, lut_ref,
                 h_ref, f_ref, *, L, U, P, state_dtype=jnp.int32):
    nq = params_ref[0]
    gop = params_ref[1]
    gex = params_ref[2]
    for s in range(P):
        build_sub_lut(x_ref.at[pl.ds(s, 1)], b_ref, lut_ref, (L, G, NSL))
        zero = h_ref[0].astype(jnp.int32) * 0
        negv = zero + NEG
        m = _run_query_sweeps(
            lambda i: q_ref[i], nq, h_ref, f_ref, lut_ref, gop, gex,
            zero, negv, U, L // U, state_dtype,
        )
        out_ref[s] = m.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("P", "unroll"))
def score_pair(tiles, query, matrix_flat, params, P=2, unroll=4):
    T, L, g, nsl = tiles.shape
    assert T % P == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T // P,),
        in_specs=[
            pl.BlockSpec((P, L, g, nsl), lambda t, *_: (t, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((P, g, nsl), lambda t, *_: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((ALPHABET_SIZE, L, g, nsl), jnp.int8),
            pltpu.VMEM((L, g, nsl), jnp.int32),
            pltpu.VMEM((L, g, nsl), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _kernel_pair, L=L, U=unroll, P=P, state_dtype=jnp.int32
    )
    elems = L * g * nsl
    vmem_bytes = elems * (ALPHABET_SIZE + 2 * P) + 2 * elems * 4 + 4 * elems * 4
    vmem_bytes = min(max(int(vmem_bytes), 32 << 20), 100 << 20)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, g, nsl), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_bytes),
    )(params, query, matrix_flat, tiles)
    return out.reshape(T, g * nsl)


def timeit(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 262144
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    SPT = sw_pallas_cell.SUBJECTS_PER_TILE
    T = n // SPT
    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    tiles = jnp.asarray(
        data.reshape(T, SPT, L).transpose(0, 2, 1).reshape(T, L, 32, 128).copy()
    )

    for qlen in (32, 512):
        qpad, nq = sw_pallas.prepare_query(rng.integers(0, 20, size=qlen))
        params = jnp.asarray(
            np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
        )
        q = jnp.asarray(qpad)
        cells = float(qlen) * L * n

        base = timeit(
            lambda: sw_pallas_cell.score_bucket_pallas_cell(
                tiles, q, mat, params, exact=True
            ),
            reps,
        )
        ref = np.asarray(
            sw_pallas_cell.score_bucket_pallas_cell(
                tiles, q, mat, params, exact=True
            )
        )
        print(
            f"q={qlen:5d} P=1: {base*1e3:8.2f} ms {cells/1e9/base:8.2f} GCUPS"
        )
        for P in (2, 4):
            dt = timeit(lambda: score_pair(tiles, q, mat, params, P=P), reps)
            got = np.asarray(score_pair(tiles, q, mat, params, P=P))
            ok = "OK" if np.array_equal(got, ref) else "MISMATCH"
            print(
                f"q={qlen:5d} P={P}: {dt*1e3:8.2f} ms "
                f"{cells/1e9/dt:8.2f} GCUPS  [{ok}]"
            )


if __name__ == "__main__":
    main()
