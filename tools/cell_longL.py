"""Experiment: push the cell kernel past CELL_MAX_L=512.

VMEM arithmetic says L=768 int32-state fits a v5e core (LUT 21x tile =
66 MB, X blocks 2 x 3.1 MB, H/F state 25.2 MB ~= 97.5 MB of the 128 MB
core); L=1024 only with int16 state.  The col kernel at L>=768 measured
274-277 GCUPS in the round-2 sweep vs 308-310 for cell at L<=512 — if
the cell kernel holds its rate at 768, the bucket boundary moves.

Usage: python tools/cell_longL.py [num_subjects] [reps]
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

    for L in (640, 768, 896, 1024):
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        tiles = jnp.asarray(
            data.reshape(T, SPT, L).transpose(0, 2, 1)
            .reshape(T, L, 32, 128).copy()
        )
        for qlen in (512, 2048):
            q = rng.integers(0, 20, size=qlen)
            qpad, nq = sw_pallas.prepare_query(q)
            params = jnp.asarray(
                np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
            )
            qd = jnp.asarray(qpad)
            cells = float(qlen) * L * n

            for exact in (True, False):
                label = "i32" if exact else "i16"
                try:
                    cell_t = timeit(
                        lambda: sw_pallas_cell.score_bucket_pallas_cell(
                            tiles, qd, mat, params, exact=exact
                        ),
                        reps,
                    )
                    print(
                        f"L={L:5d} q={qlen:5d} cell/{label}: "
                        f"{cell_t*1e3:8.1f} ms  {cells/1e9/cell_t:6.1f} GCUPS"
                    )
                except Exception as e:
                    print(f"L={L:5d} q={qlen:5d} cell/{label}: FAIL "
                          f"{type(e).__name__}: {str(e)[:160]}")

            try:
                col_t = timeit(
                    lambda: sw_pallas_col.score_bucket_col_any_query(
                        tiles, np.asarray(q, np.int32), mat,
                        cfg.gop, cfg.gex,
                    ),
                    reps,
                )
                print(
                    f"L={L:5d} q={qlen:5d} col/i16 : "
                    f"{col_t*1e3:8.1f} ms  {cells/1e9/col_t:6.1f} GCUPS"
                )
            except Exception as e:
                print(f"L={L:5d} q={qlen:5d} col     : FAIL "
                      f"{type(e).__name__}: {str(e)[:160]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
