"""Differential diagnosis of the flat-kernel big-slot pathology.

tools/fusedcrash.py round-4 finding: ONE score_bucket_pallas_col_flat
call with a single slot spanning the full 3072-row pool executes ~200x
slower than the structurally-identical single-query kernel at the same
state size (which runs 313 GCUPS) — and the round-2/3 "fused crash"
behind FUSED_RTOT was this, multiplied by pass count, not a fusion
problem.  This script varies one factor at a time to find the breaking
dimension: slot row count, pool rows (rtot), slot count, and the
single-query kernel control.

Usage: python tools/colflat_diag.py [T] [timeout_s]
Each config runs in-process with a watchdog print; run under `timeout`.
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas_col
from cudasw4_tpu.ops.sw_pallas_col import (
    pad_query_chunk,
    score_bucket_pallas_col,
    score_bucket_pallas_col_flat,
)


def main():
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    L = 1024
    n = T * 4096
    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    tiles = jnp.asarray(
        data.reshape(T, 4096, L).transpose(0, 2, 1)
        .reshape(T, L, 32, 128).copy()
    )

    def flat(slot_rows, rtot, label):
        S = len(slot_rows)
        W = max(slot_rows)
        queries = np.full((S, W), 20, np.int32)
        offs = []
        off = 0
        for s, r in enumerate(slot_rows):
            queries[s, :r] = rng.integers(0, 20, size=r)
            offs.append(off)
            off += r
        params = jnp.asarray(np.array(
            [0, cfg.gop, cfg.gex, 0] + list(slot_rows), np.int32
        ))
        cells = float(sum(slot_rows)) * L * n
        t0 = time.time()
        out = np.asarray(score_bucket_pallas_col_flat(
            tiles, jnp.asarray(queries), mat, params,
            offs=tuple(offs), rtot=rtot,
        ))
        dt = time.time() - t0
        print(f"{label}: {dt:.1f}s incl compile "
              f"({cells/1e9/dt:.1f} GCUPS)", flush=True)
        return out

    def single(rows, label):
        q = rng.integers(0, 20, size=rows)
        qpad, nq_pad = pad_query_chunk(q)
        params = jnp.asarray(
            np.array([nq_pad, cfg.gop, cfg.gex, 0], np.int32)
        )
        cells = float(rows) * L * n
        t0 = time.time()
        np.asarray(score_bucket_pallas_col(
            tiles, jnp.asarray(qpad), mat, params, exact=True
        ))
        dt = time.time() - t0
        # warm second run: separates compile and the nondeterministic
        # slow-execution mode from steady state
        t0 = time.time()
        np.asarray(score_bucket_pallas_col(
            tiles, jnp.asarray(qpad), mat, params, exact=True
        ))
        dw = time.time() - t0
        print(f"{label}: {dt:.1f}s cold, {dw:.1f}s warm "
              f"({cells/1e9/dw:.1f} GCUPS warm)", flush=True)

    single(3072, "single q=3072 (control, first)")
    flat([1024, 1024, 1024], 3072, "flat 3x1024 rtot=3072 (control)")
    flat([1536, 1536], 3072, "flat 2x1536 rtot=3072")
    flat([2048, 1024], 3072, "flat 2048+1024 rtot=3072")
    flat([2048], 2048, "flat 1x2048 rtot=2048")
    flat([2048], 3072, "flat 1x2048 rtot=3072")
    flat([2560], 3072, "flat 1x2560 rtot=3072")
    flat([3072], 3072, "flat 1x3072 rtot=3072 (the bad one)")
    flat([3072], 3072, "flat 1x3072 rtot=3072 (again, warm)")
    single(3072, "single q=3072 (control, last)")


if __name__ == "__main__":
    main()
