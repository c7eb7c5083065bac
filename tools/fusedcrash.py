"""Minimized repro + bisection for the fused big-state col-kernel crash.

Round-2/3 observation (sw_pallas_col.FUSED_RTOT): many flat-pool column
kernels with large VMEM state fused into ONE XLA program crash the TPU
worker at scale — ~6 x 96 MB-state passes die, 3 run fine, and 32 MB
passes were stable at any count — while the same passes dispatched as
their own programs are stable.  The engine caps the mesh-fused pool at
FUSED_RTOT=1024 rows as a workaround, halving batch pool capacity for
1-3k-aa queries on the mesh path.

This tool pins the crash boundary over (state rows x fused pass count):

    one config   : python tools/fusedcrash.py RUN <rows> <npasses> [T]
    full bisection: python tools/fusedcrash.py SWEEP [T]

SWEEP runs each config in a subprocess (a worker crash kills only the
child) and prints an OK/CRASH matrix; it stops a row at the first crash
and probes the device before continuing so a wedged tunnel is reported,
not misread as more crashes.  Findings: docs/PERFORMANCE.md (fused
big-state crash section).  The reference's analog constraint is its
4 GiB temp chunking (/root/reference/src/cudasw4.cuh:1928-1947).
"""

import os
import subprocess
import sys
import time


def run_one(rows: int, npasses: int, T: int) -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cudasw4_tpu import make_scoring_config
    from cudasw4_tpu.ops.sw_pallas_col import score_bucket_pallas_col_flat

    cfg = make_scoring_config("blosum62")
    rng = np.random.default_rng(0)
    L = 1024
    n = T * 4096
    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    tiles = jnp.asarray(
        data.reshape(T, 4096, L).transpose(0, 2, 1)
        .reshape(T, L, 32, 128).copy()
    )
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    # One slot filling the whole pool per pass: state = 2 * rows * 4096 *
    # 4 B of VMEM scratch per pallas_call, npasses calls in ONE jit.
    qs = jnp.asarray(
        rng.integers(0, 20, size=(npasses, 1, rows)).astype(np.int32)
    )
    params = jnp.asarray(
        np.array([0, cfg.gop, cfg.gex, 0, rows], np.int32)
    )

    @jax.jit
    def fused(tiles, qs, mat, params):
        acc = None
        for p in range(npasses):
            s = score_bucket_pallas_col_flat(
                tiles, qs[p], mat, params, offs=(0,), rtot=rows,
            )
            acc = s if acc is None else acc + s
        return acc

    out = np.asarray(fused(tiles, qs, mat, params))
    print(f"OK rows={rows} npasses={npasses} sum={float(out.sum()):.0f}",
          flush=True)


def probe() -> bool:
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; print('DEVOK', jax.devices())"],
        capture_output=True, text=True, timeout=180, env=os.environ,
    )
    return "DEVOK" in r.stdout


def sweep(T: int) -> None:
    results = {}
    for rows in (1024, 2048, 3072):
        for npasses in (2, 3, 4, 6, 8, 12, 16):
            t0 = time.time()
            r = subprocess.run(
                [sys.executable, __file__, "RUN", str(rows),
                 str(npasses), str(T)],
                capture_output=True, text=True, timeout=1800,
                env=os.environ,
            )
            ok = r.returncode == 0 and "OK rows" in r.stdout
            results[(rows, npasses)] = "OK" if ok else "CRASH"
            print(
                f"rows={rows} npasses={npasses}: "
                f"{results[(rows, npasses)]} ({time.time()-t0:.0f}s)"
                + ("" if ok else f"\n--- tail ---\n"
                   + "\n".join((r.stdout + r.stderr).splitlines()[-6:])),
                flush=True,
            )
            if not ok:
                if not probe():
                    print("device DOWN after crash — waiting 120 s",
                          flush=True)
                    time.sleep(120)
                    if not probe():
                        print("device still down; aborting sweep",
                              flush=True)
                        return
                break  # next rows value; larger npasses would also crash
    print("matrix:", results, flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "SWEEP"
    if mode == "RUN":
        run_one(int(sys.argv[2]), int(sys.argv[3]),
                int(sys.argv[4]) if len(sys.argv) > 4 else 64)
    else:
        sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 64)
