"""A/B: column-kernel unroll factor + rows-per-pass amortisation curve.

Measures (a) U=4 vs U=8 on the single and flat col kernels, (b) the
single kernel's rate vs rows-per-pass (1024/2048/3072) to size the
per-chunk fixed cost (LUT build + loop entry, amortised over pool rows),
and (c) the flat kernel's slot-structure tax (S x 1024 vs one 3072-row
query).  Informs VERDICT r04 item 1b (lift L=1024/2048 col configs).

Usage: python tools/colunroll.py [T] [reps]
"""

import sys
import time

import numpy as np
import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops.sw_pallas_col import (
    score_bucket_pallas_col,
    score_bucket_pallas_col_flat,
    pad_query_chunk,
)


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

    for L in (1024, 2048):
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        tiles = jnp.asarray(
            data.reshape(T, 4096, L).transpose(0, 2, 1)
            .reshape(T, L, 32, 128).copy()
        )

        for qlen in (1024, 2048, 3072):
            q = rng.integers(0, 20, size=qlen)
            cells = float(qlen) * L * n
            for U in (4, 8, 12):
                qpad, nq_pad = pad_query_chunk(q, unroll=U)
                qd = jnp.asarray(qpad)
                params = jnp.asarray(
                    np.array([nq_pad, cfg.gop, cfg.gex, 0], np.int32)
                )
                t = timeit(
                    lambda: score_bucket_pallas_col(
                        tiles, qd, mat, params, unroll=U, exact=True
                    ),
                    reps,
                )
                print(
                    f"single L={L} q={qlen} U={U}: "
                    f"{cells / 1e9 / t:.1f} GCUPS",
                    flush=True,
                )

        for qlens in ([1024, 1024, 1024], [512] * 6):
            S = len(qlens)
            W = max(qlens)
            cells = float(sum(qlens)) * L * n
            for U in (4, 8, 12, 16):
                queries = np.full((S, W), 20, np.int32)
                pads = []
                offs = []
                off = 0
                for s, ql in enumerate(qlens):
                    queries[s, :ql] = rng.integers(0, 20, size=ql)
                    pads.append(max(U, -(-ql // U) * U))
                    offs.append(off)
                    off += -(-pads[-1] // 128) * 128
                from cudasw4_tpu.ops import sw_pallas_col
                if off > sw_pallas_col.NQC:
                    # Slot reservations overran the state pool (the
                    # caller contract offs[qb]+nqp <= rtot); an OOB
                    # state write faults the TPU worker.  Skip.
                    print(f"flat  L={L} slots x{S} U={U}: skipped "
                          f"(pool overrun {off} > {sw_pallas_col.NQC})",
                          flush=True)
                    continue
                params = jnp.asarray(np.array(
                    [0, cfg.gop, cfg.gex, 0] + pads, np.int32
                ))
                qd = jnp.asarray(queries)
                t = timeit(
                    lambda: score_bucket_pallas_col_flat(
                        tiles, qd, mat, params, offs=tuple(offs), unroll=U
                    ),
                    reps,
                )
                print(
                    f"flat  L={L} slots={qlens[:2]}..x{S} U={U}: "
                    f"{cells / 1e9 / t:.1f} GCUPS",
                    flush=True,
                )


if __name__ == "__main__":
    main()
