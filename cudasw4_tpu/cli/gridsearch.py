"""``gridsearch`` — kernel autotuning harness (CLI).

The TPU analog of the reference's gridsearch tool
(/root/reference/src/gridsearch.cu): where that sweeps CUDA template shapes
(group_size x numRegs) over pseudo databases to produce the kernel dispatch
table, this sweeps the Pallas kernel family (row-streaming / cell-sequential
/ column-chunked), the inner-loop unroll factor and tile geometry over
(subject length x query length) grids, timing the raw bucket kernels on
device.  The winners inform db/packing.py's layout chooser
(choose_bucket_layout) and the kernels' default unroll.

Timing materializes results to host (block_until_ready does not block on
tunneled platforms).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def run(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    lengths = [128, 256, 512, 1024, 2048]
    kernels = ["row", "cell", "col"]
    unrolls = [2, 4, 8]
    qlens = [512]
    num_chars = 32 << 20  # chars per pseudo db (fixed work per config)
    reps = 3
    outfile = None
    i = 0
    while i < len(argv):
        a = argv[i]

        def val():
            nonlocal i
            i += 1
            return argv[i]

        if a == "--lengths":
            lengths = [int(x) for x in val().split(",")]
        elif a == "--kernels":
            kernels = val().split(",")
        elif a == "--unrolls":
            unrolls = [int(x) for x in val().split(",")]
        elif a == "--querylengths":
            qlens = [int(x) for x in val().split(",")]
        elif a == "--chars":
            num_chars = int(val())
        elif a == "--reps":
            reps = int(val())
        elif a == "--of":
            outfile = val()
        elif a == "--help":
            print(
                "Usage: gridsearch [--lengths l1,l2,..] [--kernels row,cell,col]"
                " [--unrolls u1,..] [--querylengths q1,..] [--chars N]"
                " [--reps R] [--of file]"
            )
            return 0
        else:
            print(f"Unexpected arg {a}")
        i += 1

    import jax
    import jax.numpy as jnp

    from .. import make_scoring_config
    from ..ops import sw_pallas, sw_pallas_cell, sw_pallas_col
    from ..ops.sw_jax import score_tiles_jnp

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = make_scoring_config("blosum62")
    mat_flat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    mat_f32 = jnp.asarray(cfg.matrix, dtype=jnp.float32)
    rng = np.random.default_rng(42)

    rows = []
    print(
        f"{'kernel':>6} {'length':>7} {'unroll':>6} {'tiles':>6} {'qlen':>5}"
        f" {'ms':>9} {'GCUPS':>9}"
    )
    best: dict = {}
    for L in lengths:
        spt = sw_pallas_cell.SUBJECTS_PER_TILE
        n = max(spt, (num_chars // (L * spt)) * spt)
        data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
        Tc = n // spt
        tiles_wide = jnp.asarray(
            data.reshape(Tc, spt, L).transpose(0, 2, 1)
            .reshape(Tc, L, 32, 128).copy()
        )
        NSr = 128
        Tr = n // NSr
        tiles_row = jnp.asarray(data.reshape(Tr, NSr, L).transpose(0, 2, 1).copy())

        for qlen in qlens:
            q = rng.integers(0, 20, size=min(qlen, sw_pallas.QCAP))
            qpad, nq = sw_pallas.prepare_query(q)
            qdev = jnp.asarray(qpad)
            cells = float(n) * L * nq
            for kernel in kernels:
                for U in unrolls:
                    try:
                        nq_pad = -(-nq // U) * U
                        params = jnp.asarray(np.array(
                            [nq, cfg.gop, cfg.gex, nq_pad], dtype=np.int32
                        ))
                        if not on_tpu:
                            def once():
                                return np.asarray(score_tiles_jnp(
                                    tiles_row, qdev, mat_f32,
                                    jnp.float32(cfg.gop), jnp.float32(cfg.gex),
                                    jnp.int32(nq),
                                ))
                        elif kernel == "row":
                            if U != unrolls[0]:
                                continue  # row kernel has no unroll knob
                            def once():
                                return np.asarray(sw_pallas.score_bucket_pallas(
                                    tiles_row, qdev, mat_flat, params
                                ))
                        elif kernel == "cell":
                            def once(U=U):
                                return np.asarray(
                                    sw_pallas_cell.score_bucket_pallas_cell(
                                        tiles_wide, qdev, mat_flat, params,
                                        unroll=U,
                                    )
                                )
                        elif kernel == "col":
                            if L % sw_pallas_col.LC:
                                continue
                            def once(U=U):
                                return np.asarray(
                                    sw_pallas_col.score_bucket_col_any_query(
                                        tiles_wide, q, mat_flat,
                                        cfg.gop, cfg.gex, unroll=U,
                                    )
                                )
                        else:
                            print(f"unknown kernel {kernel}")
                            continue

                        once()  # compile + warm
                        times = []
                        for _ in range(reps):
                            t0 = time.perf_counter()
                            once()
                            times.append(time.perf_counter() - t0)
                        dt = min(times)
                        gcups = cells / dt / 1e9
                        T = Tr if kernel == "row" else Tc
                        print(
                            f"{kernel:>6} {L:>7} {U:>6} {T:>6} {nq:>5}"
                            f" {dt*1e3:>9.2f} {gcups:>9.1f}"
                        )
                        rows.append((kernel, L, U, T, nq, dt, gcups))
                        key = (L, nq)
                        if key not in best or gcups > best[key][2]:
                            best[key] = (kernel, U, gcups)
                        if not on_tpu or kernel == "row":
                            break  # unroll sweep is meaningless here
                    except Exception as e:
                        print(
                            f"{kernel:>6} {L:>7} {U:>6} {'-':>6} {qlen:>5}"
                            f" FAILED: {str(e)[:60]}"
                        )

    print("\nBest kernel per (length, querylength):")
    for (L, nq), (kernel, U, gcups) in sorted(best.items()):
        print(f"  L={L:5d} q={nq:5d}: {kernel} unroll={U} ({gcups:.1f} GCUPS)")

    if outfile:
        with open(outfile, "w") as f:
            f.write("kernel\tlength\tunroll\ttiles\tqlen\tseconds\tgcups\n")
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")
    return 0


def main():
    raise SystemExit(run())


if __name__ == "__main__":
    main()
