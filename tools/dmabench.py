"""A/B bench: automatic block pipelining vs manual double-buffered input
staging for the cell kernel (round-1 verdict item 2 — per-tile DMA
starvation, docs/PERFORMANCE.md "Known per-tile fixed cost").

Usage: python tools/dmabench.py [L] [num_subjects] [reps]
Sweeps query lengths; at low qlen the per-tile fixed (DMA-bound) cost
dominates, so that is where staging changes should show.
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas, sw_pallas_cell


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

    for qlen in (32, 128, 512):
        qpad, nq = sw_pallas.prepare_query(rng.integers(0, 20, size=qlen))
        params = jnp.asarray(
            np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
        )
        q = jnp.asarray(qpad)
        cells = float(qlen) * L * n

        auto = timeit(
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
            f"q={qlen:5d} auto    : {auto*1e3:8.2f} ms "
            f"{cells/1e9/auto:8.2f} GCUPS"
        )
        for prio in (0, 1):
            man = timeit(
                lambda: sw_pallas_cell.score_bucket_pallas_cell_manual(
                    tiles, q, mat, params, exact=True, priority=prio
                ),
                reps,
            )
            got = np.asarray(
                sw_pallas_cell.score_bucket_pallas_cell_manual(
                    tiles, q, mat, params, exact=True, priority=prio
                )
            )
            ok = "OK" if np.array_equal(got, ref) else "MISMATCH"
            print(
                f"q={qlen:5d} manual p{prio}: {man*1e3:8.2f} ms "
                f"{cells/1e9/man:8.2f} GCUPS  [{ok}]"
            )


if __name__ == "__main__":
    main()
