"""A/B the masked-fused flat-pool col kernel vs the slot-unrolled one.

Round-5 item (VERDICT r04 next #3 / ROADMAP item 3): a pass with S slots
pays S row-loop entries per column in the slot-unrolled kernel (~5% at
S=3, ~8% at S=6 vs the single-slot rate); the fused variant walks the
concatenated rows once with per-step boundary masks (~4 selects per
unrolled step).  This tool measures both kernels at equal work and
checks bit-exactness between them on the real chip.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/colfusebench.py
       [L] [T] [reps]
"""

import sys
import time

import numpy as np

import jax.numpy as jnp

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.constants import UNKNOWN
from cudasw4_tpu.ops import sw_pallas_col

L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
T = int(sys.argv[2]) if len(sys.argv) > 2 else 32
reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main():
    cfg = make_scoring_config("blosum62")
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    rng = np.random.default_rng(42)
    spt = 4096
    n = T * spt
    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    tiles = jnp.asarray(
        data.reshape(T, spt, L).transpose(0, 2, 1).reshape(T, L, 32, 128)
        .copy()
    )
    cu = sw_pallas_col.DEFAULT_UNROLL
    rtot = sw_pallas_col.NQC
    quant = sw_pallas_col.FLAT_QUANT

    print(f"L={L} T={T} ({n} subjects) rtot={rtot} U={cu} reps={reps}")
    print(f"{'S':>2} {'rows':>6} {'flat GCUPS':>11} {'fused GCUPS':>12} "
          f"{'delta':>7} exact")
    for S in (1, 2, 3, 4, 6, 8):
        # S equal slots filling the pool at quant granularity (the
        # realistic upper-bound composition for this S).
        res = (rtot // S) // quant * quant
        nqp = res  # full reservation: flat has zero quantisation waste
        if nqp < cu:
            continue
        W = nqp
        queries = [rng.integers(0, 20, size=nqp - 3) for _ in range(S)]
        qarr = np.full((S, W), UNKNOWN, np.int32)
        nqps = np.zeros(S, np.int32)
        offs = []
        for i, q in enumerate(queries):
            qarr[i, : len(q)] = q
            nqps[i] = nqp
            offs.append(i * res)
        params = jnp.asarray(np.concatenate(
            [np.array([0, cfg.gop, cfg.gex, 0], np.int32), nqps]
        ))
        qdev = jnp.asarray(qarr)
        cells = float(S) * nqp * L * n

        def run_flat():
            return np.asarray(sw_pallas_col.score_bucket_pallas_col_flat(
                tiles, qdev, mat, params, offs=tuple(offs), rtot=rtot,
                exact=True,
            ))

        def run_fused():
            return np.asarray(
                sw_pallas_col.score_bucket_pallas_col_flat_fused(
                    tiles, qdev, mat, params, rtot=rtot, exact=True,
                )
            )

        a = run_flat()
        b = run_fused()
        ok = np.array_equal(a, b)
        ts_flat, ts_fused = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            run_flat()
            ts_flat.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            run_fused()
            ts_fused.append(time.perf_counter() - t0)
        gf = cells / min(ts_flat) / 1e9
        gu = cells / min(ts_fused) / 1e9
        print(f"{S:>2} {S * nqp:>6} {gf:>11.1f} {gu:>12.1f} "
              f"{(gu / gf - 1) * 100:>6.1f}% {ok}")
        if not ok:
            bad = np.argwhere(a != b)
            print(f"   MISMATCH at {bad[:5]}: flat={a[a != b][:5]} "
                  f"fused={b[a != b][:5]}")


if __name__ == "__main__":
    main()
