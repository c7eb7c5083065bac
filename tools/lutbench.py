"""Diagnostic: how much of the cell kernel's per-tile fixed cost is the
substitution-LUT build?  Monkeypatches build_sub_lut to a no-op (scores
become garbage — timing only) and compares against the real kernel.

Usage: python tools/lutbench.py [L] [num_subjects] [reps]
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

    real_build = sw_pallas_cell.build_sub_lut

    for qlen in (32, 128, 512):
        qpad, nq = sw_pallas.prepare_query(rng.integers(0, 20, size=qlen))
        params = jnp.asarray(
            np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
        )
        q = jnp.asarray(qpad)
        cells = float(qlen) * L * n

        def run(u):
            return sw_pallas_cell.score_bucket_pallas_cell(
                tiles, q, mat, params, exact=True, unroll=u
            )

        sw_pallas_cell.build_sub_lut = real_build
        sw_pallas_cell.score_bucket_pallas_cell.clear_cache()
        base = timeit(lambda: run(4), reps)
        print(
            f"q={qlen:5d} with LUT : {base*1e3:8.2f} ms "
            f"{cells/1e9/base:8.2f} GCUPS"
        )
        sw_pallas_cell.build_sub_lut = lambda *a, **k: None
        sw_pallas_cell.score_bucket_pallas_cell.clear_cache()
        nolut = timeit(lambda: run(4), reps)
        print(
            f"q={qlen:5d} no LUT   : {nolut*1e3:8.2f} ms "
            f"(delta {1e3*(base-nolut):.2f} ms, "
            f"{100*(base-nolut)/base:.0f}% of total)"
        )
        sw_pallas_cell.build_sub_lut = real_build


if __name__ == "__main__":
    main()
