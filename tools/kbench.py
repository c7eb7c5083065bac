"""Ad-hoc kernel microbenchmark: row-streaming vs cell-sequential.

Usage: python tools/kbench.py [L] [num_subjects] [qlen] [reps]
Prints GCUPS over real cells (all subjects full length L).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas, sw_pallas_cell


def timeit(fn, reps=3):
    np.asarray(fn())  # warm up / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    qlen = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    qpad, nq = sw_pallas.prepare_query(rng.integers(0, 20, size=qlen))
    params = jnp.asarray(np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32))
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    q = jnp.asarray(qpad)
    cells = float(qlen) * L * n

    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)

    # row kernel layout: [T, L, NS], NS=128
    NS = 128
    T = n // NS
    tiles_row = jnp.asarray(
        data.reshape(T, NS, L).transpose(0, 2, 1).copy()
    )
    dt = timeit(lambda: sw_pallas.score_bucket_pallas(tiles_row, q, mat, params), reps)
    print(f"row  L={L} NS={NS} T={T}: {dt*1e3:8.2f} ms  {cells/1e9/dt:8.2f} GCUPS")

    # cell kernel layout: [T, L, 32, 128]
    SPT = sw_pallas_cell.SUBJECTS_PER_TILE
    Tc = n // SPT
    tiles_cell = jnp.asarray(
        data.reshape(Tc, SPT, L).transpose(0, 2, 1).reshape(Tc, L, 32, 128).copy()
    )
    for U in (2, 4, 8):
        dt = timeit(
            lambda: sw_pallas_cell.score_bucket_pallas_cell(
                tiles_cell, q, mat, params, unroll=U
            ),
            reps,
        )
        print(f"cell L={L} U={U} T={Tc}: {dt*1e3:8.2f} ms  {cells/1e9/dt:8.2f} GCUPS")


if __name__ == "__main__":
    main()
