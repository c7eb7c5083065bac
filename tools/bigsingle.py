"""A/B: cell vs column kernel for LONG single queries on cell-layout
buckets (identical [T, L, 32, 128] tiles — the kernels are
interchangeable wherever L % LC == 0).

tools/lutmxu.py round-4 data showed col single q=3072 (313.4 GCUPS,
U=8) beating cell single q=3072 at L=512 (296.0): the cell kernel pays
its row-loop entry cost every query row over only L/U column steps,
while the col kernel amortises its column-loop entry over up to NQC
rows.  If col wins above some query length, the engine should route
long single scans on cell buckets through the col path — a per-(bucket,
querylength) dispatch table like the reference's partId map
(/root/reference/src/cudasw4.cuh:1767-1800).

Usage: python tools/bigsingle.py [T] [reps]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas_cell, sw_pallas_col
from cudasw4_tpu.ops.sw_pallas import prepare_query


def timeit(fn, reps=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    n = T * 4096

    for L in (256, 512, 768):
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        tiles = jnp.asarray(
            data.reshape(T, 4096, L).transpose(0, 2, 1)
            .reshape(T, L, 32, 128).copy()
        )
        for qlen in (512, 1024, 2048, 3072, 5478):
            q = rng.integers(0, 20, size=qlen)
            cells = float(qlen) * L * n
            qpad, nq = prepare_query(q, qcap=8192)
            params = jnp.asarray(
                np.array([nq, cfg.gop, cfg.gex, 0], np.int32)
            )
            qd = jnp.asarray(qpad)
            tc = timeit(
                lambda: sw_pallas_cell.score_bucket_pallas_cell(
                    tiles, qd, mat, params, exact=True
                ),
                reps,
            )
            # col path: NQC-chunked with boundary carry beyond 3072
            tcol = timeit(
                lambda: sw_pallas_col.score_bucket_col_any_query(
                    tiles, q, mat, cfg.gop, cfg.gex, exact=True
                ),
                reps,
            )
            rc, rcol = cells / 1e9 / tc, cells / 1e9 / tcol
            print(
                f"L={L} q={qlen}: cell {rc:.1f} GCUPS, col {rcol:.1f} "
                f"GCUPS ({rcol/rc-1:+.1%})",
                flush=True,
            )


if __name__ == "__main__":
    main()
