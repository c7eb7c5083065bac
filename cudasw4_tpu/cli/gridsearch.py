"""``gridsearch`` — kernel geometry autotuner (CLI).

The TPU analog of the reference's gridsearch tool
(/root/reference/src/gridsearch.cu): where that sweeps CUDA template shapes
(group_size x numRegs) over pseudo databases to produce the kernel dispatch
table, this sweeps Pallas tile geometries (subject length L x lanes NS) and
query lengths, timing the raw bucket kernel on device, and reports a GCUPS
table plus the best lanes choice per length.

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
    lanes_list = [128, 256, 512, 1024]
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
        elif a == "--lanes":
            lanes_list = [int(x) for x in val().split(",")]
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
                "Usage: gridsearch [--lengths l1,l2,..] [--lanes n1,n2,..] "
                "[--querylengths q1,..] [--chars N] [--reps R] [--of file]"
            )
            return 0
        else:
            print(f"Unexpected arg {a}")
        i += 1

    import jax
    import jax.numpy as jnp

    from .. import make_scoring_config
    from ..ops import sw_pallas
    from ..ops.sw_jax import score_tiles_jnp

    on_tpu = jax.devices()[0].platform == "tpu"
    cfg = make_scoring_config("blosum62")
    mat_flat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    mat_f32 = jnp.asarray(cfg.matrix, dtype=jnp.float32)
    rng = np.random.default_rng(42)

    rows = []
    print(f"{'length':>7} {'lanes':>6} {'tiles':>6} {'qlen':>5} {'ms':>9} {'GCUPS':>9}")
    best: dict = {}
    for L in lengths:
        for NS in lanes_list:
            T = max(1, num_chars // (L * NS))
            tiles = rng.integers(0, 20, size=(T, L, NS)).astype(np.int8)
            tiles_dev = jnp.asarray(tiles)
            for qlen in qlens:
                try:
                    qpad, nq = sw_pallas.prepare_query(
                        rng.integers(0, 20, size=min(qlen, sw_pallas.QCAP))
                    )
                    params = jnp.asarray(
                        np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
                    )

                    def once(qv):
                        if on_tpu:
                            out = sw_pallas.score_bucket_pallas(
                                tiles_dev, qv, mat_flat, params
                            )
                        else:
                            out = score_tiles_jnp(
                                tiles_dev, qv, mat_f32,
                                jnp.float32(cfg.gop), jnp.float32(cfg.gex),
                                jnp.int32(nq),
                            )
                        return np.asarray(out)

                    once(jnp.asarray(qpad))  # compile + warm
                    times = []
                    for _ in range(reps):
                        q2, _ = sw_pallas.prepare_query(
                            rng.integers(0, 20, size=nq)
                        )
                        qv = jnp.asarray(q2)
                        np.asarray(qv)
                        t0 = time.perf_counter()
                        once(qv)
                        times.append(time.perf_counter() - t0)
                    dt = min(times)
                    gcups = T * L * NS * nq / dt / 1e9
                    print(
                        f"{L:>7} {NS:>6} {T:>6} {nq:>5} {dt*1e3:>9.2f} {gcups:>9.1f}"
                    )
                    rows.append((L, NS, T, nq, dt, gcups))
                    key = (L, nq)
                    if key not in best or gcups > best[key][1]:
                        best[key] = (NS, gcups)
                except Exception as e:
                    print(f"{L:>7} {NS:>6} {'-':>6} {qlen:>5} FAILED: {str(e)[:60]}")

    print("\nBest lanes per (length, querylength):")
    for (L, nq), (NS, gcups) in sorted(best.items()):
        print(f"  L={L:5d} q={nq:5d}: NS={NS:5d} ({gcups:.1f} GCUPS)")

    if outfile:
        with open(outfile, "w") as f:
            f.write("length\tlanes\ttiles\tqlen\tseconds\tgcups\n")
            for r in rows:
                f.write("\t".join(str(x) for x in r) + "\n")
    return 0


def main():
    raise SystemExit(run())


if __name__ == "__main__":
    main()
