"""A/B: column-kernel DP state dtype (int32 vs saturating int16) at the
peak-sweep col configs (L=1024/2048, /root/reference/runpeakbenchmark.sh).

The col kernels' VMEM traffic per DP cell is 4 state accesses (H/E col
read+write) + 1 LUT read; int16 state halves the dominant 4.  The cell
kernel rejected int16 on v5e (pack/unpack converts cost more than the
halved traffic, docs/PERFORMANCE.md dead ends) but its traffic mix is
different (2 state + 3 slab accesses), so the measurement does not
transfer automatically (VERDICT r03 item 1b).

Usage: python tools/colstate16.py [T] [reps]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas_col
from cudasw4_tpu.ops.sw_pallas_col import (
    score_bucket_pallas_col,
    score_bucket_pallas_col_flat,
    pad_query_chunk,
)


def timeit(fn, reps=3):
    np.asarray(fn())  # compile + warm
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

    for L in (1024, 2048):
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        tiles = jnp.asarray(
            data.reshape(T, 4096, L).transpose(0, 2, 1)
            .reshape(T, L, 32, 128).copy()
        )

        # --- single-query kernel (the >3072-aa ladder path runs this) ---
        for qlen in (1024, 2048):
            q = rng.integers(0, 20, size=qlen)
            qpad, nq_pad = pad_query_chunk(q)
            qd = jnp.asarray(qpad)
            params = jnp.asarray(
                np.array([nq_pad, cfg.gop, cfg.gex, 0], np.int32)
            )
            cells = float(qlen) * L * n
            row = {}
            for exact in (True, False):
                t = timeit(
                    lambda: score_bucket_pallas_col(
                        tiles, qd, mat, params, exact=exact
                    ),
                    reps,
                )
                row["i32" if exact else "i16"] = cells / 1e9 / t
            print(
                f"single L={L} q={qlen}: i32 {row['i32']:.1f} GCUPS, "
                f"i16 {row['i16']:.1f} GCUPS "
                f"({row['i16']/row['i32']-1:+.1%})",
                flush=True,
            )

        # --- flat-pool batch kernel (the 16-query batch path) ---
        for qlens in ([1024, 1024], [1024, 1024, 1024],
                      [512, 512, 512, 512, 512, 512]):
            S = len(qlens)
            W = max(qlens)
            queries = np.full((S, W), 20, np.int32)
            pads = []
            offs = []
            off = 0
            for s, ql in enumerate(qlens):
                queries[s, :ql] = rng.integers(0, 20, size=ql)
                pads.append(max(4, -(-ql // 4) * 4))
                offs.append(off)
                off += -(-pads[-1] // 128) * 128
            params = jnp.asarray(np.array(
                [0, cfg.gop, cfg.gex, 0] + pads, np.int32
            ))
            qd = jnp.asarray(queries)
            cells = float(sum(qlens)) * L * n
            row = {}
            for exact in (True, False):
                t = timeit(
                    lambda: score_bucket_pallas_col_flat(
                        tiles, qd, mat, params, offs=tuple(offs),
                        exact=exact,
                    ),
                    reps,
                )
                row["i32" if exact else "i16"] = cells / 1e9 / t
            print(
                f"flat  L={L} slots={qlens}: i32 {row['i32']:.1f} GCUPS, "
                f"i16 {row['i16']:.1f} GCUPS "
                f"({row['i16']/row['i32']-1:+.1%})",
                flush=True,
            )


if __name__ == "__main__":
    main()
