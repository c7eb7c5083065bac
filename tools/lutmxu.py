"""A/B: VPU select-chain vs MXU matmul substitution-LUT build.

The LUT build is the dominant per-tile fixed cost (~1.3k VPU ops/char;
48% of tile time at q=32, ~4% of col-kernel time at full 3072-row
pools — docs/PERFORMANCE.md).  build_sub_lut_mxu moves it to the MXU
(one-hot x B matmul, integer-exact in bf16xbf16->f32), which the DP
loop never uses.  Round-2 rejected the idea on padding-waste analysis
without measuring; this measures it on the hot configs.

Usage: python tools/lutmxu.py [T] [reps]
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


def clear():
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()
    sw_pallas_col.score_bucket_pallas_col._clear_cache()
    sw_pallas_col.score_bucket_pallas_col_flat._clear_cache()


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))

    def tiles_for(L, n):
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        return jnp.asarray(
            data.reshape(n // 4096, 4096, L).transpose(0, 2, 1)
            .reshape(n // 4096, L, 32, 128).copy()
        )

    configs = []

    # cell kernel, LUT-light (long q) and LUT-dominated (short q)
    n = T * 4096
    t512 = tiles_for(512, n)
    for qlen in (32, 512, 3072):
        q = rng.integers(0, 20, size=qlen)
        qpad, nq = prepare_query(q)
        params = jnp.asarray(np.array([nq, cfg.gop, cfg.gex, 0], np.int32))
        qd = jnp.asarray(qpad)
        configs.append((
            f"cell L=512 q={qlen}",
            float(qlen) * 512 * n,
            lambda t512=t512, qd=qd, params=params: (
                sw_pallas_cell.score_bucket_pallas_cell(
                    t512, qd, mat, params, exact=True
                )
            ),
        ))

    # col single, full pool (the sweep's >NQC ladder path)
    t1024 = tiles_for(1024, n)
    q = rng.integers(0, 20, size=3072)
    qpad, nq_pad = sw_pallas_col.pad_query_chunk(q)
    qd = jnp.asarray(qpad)
    pcol = jnp.asarray(np.array([nq_pad, cfg.gop, cfg.gex, 0], np.int32))
    configs.append((
        "col single L=1024 q=3072",
        3072.0 * 1024 * n,
        lambda: sw_pallas_col.score_bucket_pallas_col(
            t1024, qd, mat, pcol, exact=True
        ),
    ))

    # col flat 3 x 1024 (the sweep's batch path)
    S = 3
    queries = np.full((S, 1024), 20, np.int32)
    offs = []
    off = 0
    for s in range(S):
        queries[s] = rng.integers(0, 20, size=1024)
        offs.append(off)
        off += 1024
    pflat = jnp.asarray(np.array(
        [0, cfg.gop, cfg.gex, 0, 1024, 1024, 1024], np.int32
    ))
    qf = jnp.asarray(queries)
    configs.append((
        "col flat  L=1024 3x1024",
        3.0 * 1024 * 1024 * n,
        lambda: sw_pallas_col.score_bucket_pallas_col_flat(
            t1024, qf, mat, pflat, offs=tuple(offs)
        ),
    ))

    for name, cells, fn in configs:
        row = {}
        for mxu in (False, True):
            sw_pallas_cell.LUT_MXU = mxu
            clear()
            t = timeit(fn, reps)
            row["mxu" if mxu else "vpu"] = cells / 1e9 / t
        print(
            f"{name}: vpu {row['vpu']:.1f} GCUPS, mxu {row['mxu']:.1f} "
            f"GCUPS ({row['mxu']/row['vpu']-1:+.1%})",
            flush=True,
        )
    sw_pallas_cell.LUT_MXU = False
    clear()


if __name__ == "__main__":
    main()
