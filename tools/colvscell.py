"""Experiment: column kernel vs cell kernel on short-subject buckets.

The cell kernel pays a measured ~2.7 us per (query row, tile) overhead
(loop transition + SMEM reads), which hurts short-L buckets (L=128 runs
at ~120 GCUPS vs 221 at L=512).  The column kernel's transposed nest
puts query rows in the inner loop, so its per-row overhead is tiny — and
it accepts any L % 128 == 0, including the short buckets currently
reserved for the cell kernel.  Same tile layout, directly comparable.

Usage: python tools/colvscell.py [num_subjects] [reps]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas, sw_pallas_cell, sw_pallas_col


def timeit(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    SPT = sw_pallas_cell.SUBJECTS_PER_TILE
    T = n // SPT

    for L in (128, 256, 512):
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        tiles = jnp.asarray(
            data.reshape(T, SPT, L).transpose(0, 2, 1)
            .reshape(T, L, 32, 128).copy()
        )
        for qlen in (128, 512, 1024):
            q = rng.integers(0, 20, size=qlen)
            qpad, nq = sw_pallas.prepare_query(q)
            params = jnp.asarray(
                np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
            )
            qd = jnp.asarray(qpad)
            cells = float(qlen) * L * n

            cell_t = timeit(
                lambda: sw_pallas_cell.score_bucket_pallas_cell(
                    tiles, qd, mat, params, exact=True
                ),
                reps,
            )
            ref = np.asarray(
                sw_pallas_cell.score_bucket_pallas_cell(
                    tiles, qd, mat, params, exact=True
                )
            )
            col_t = timeit(
                lambda: sw_pallas_col.score_bucket_col_any_query(
                    tiles, q, mat, cfg.gop, cfg.gex, exact=True
                ),
                reps,
            )
            got = np.asarray(
                sw_pallas_col.score_bucket_col_any_query(
                    tiles, q, mat, cfg.gop, cfg.gex, exact=True
                )
            )
            ok = "OK" if np.array_equal(got, ref) else "MISMATCH"
            print(
                f"L={L:4d} q={qlen:5d}: cell {cells/1e9/cell_t:7.1f} GCUPS"
                f" ({cell_t*1e3:7.1f} ms) | col {cells/1e9/col_t:7.1f} GCUPS"
                f" ({col_t*1e3:7.1f} ms) [{ok}]"
            )


if __name__ == "__main__":
    main()
