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
child) and prints an OK/CRASH/HANG matrix; it stops a row at the first
failure and probes the device before continuing so a wedged tunnel is
reported, not misread as more crashes.  CHAIN re-runs the pathological
configs with serializing data dependencies (the overlap-hypothesis
test — negative).  The reference's analog constraint is its 4 GiB temp
chunking (/root/reference/src/cudasw4.cuh:1928-1947).

ROUND-4 VERDICT (full writeup: docs/PERFORMANCE.md "fused big-state
crash root-caused"): the failure is a COLD-START stall — server-side
program load/codegen deferred to first execution on this
remote-compile platform takes 80-750 s per >= 64 MB-scratch kernel in
the program (client compile() returns in ~1 s; the identical call runs
0.7 s / 300 GCUPS warm), which at 16 fused passes surfaced as a worker
"crash".  FUSED_RTOT=1024 (32 MB, never stalls) stays.
"""

import os
import subprocess
import sys
import time


def run_one(rows: int, npasses: int, T: int, chain: bool = False) -> None:
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
            t = tiles
            if chain and acc is not None:
                # Fake data dependency: serialize the passes inside the
                # program (the _col_chunked_local trick) so XLA cannot
                # overlap two big-VMEM-scratch kernels — the
                # oversubscription-thrash hypothesis test.
                t = tiles + (acc[0, 0, 0] * 0).astype(tiles.dtype)
            s = score_bucket_pallas_col_flat(
                t, qs[p], mat, params, offs=(0,), rtot=rows,
            )
            acc = s if acc is None else acc + s
        return acc

    t0 = time.time()
    compiled = fused.lower(tiles, qs, mat, params).compile()
    tc = time.time() - t0
    print(f"compiled rows={rows} npasses={npasses} chain={chain} "
          f"({tc:.0f}s)", flush=True)
    t0 = time.time()
    out = np.asarray(compiled(tiles, qs, mat, params))
    print(f"OK rows={rows} npasses={npasses} chain={chain} "
          f"sum={float(out.sum()):.0f} (compile {tc:.0f}s + "
          f"exec {time.time()-t0:.1f}s)",
          flush=True)


def probe() -> bool:
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; print('DEVOK', jax.devices())"],
        capture_output=True, text=True, timeout=180, env=os.environ,
    )
    return "DEVOK" in r.stdout


def _child(rows, npasses, T, chain, timeout_s=900):
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, __file__, "RUN", str(rows), str(npasses),
             str(T)] + (["chain"] if chain else []),
            capture_output=True, text=True, timeout=timeout_s,
            env=os.environ,
        )
        ok = r.returncode == 0 and "OK rows" in r.stdout
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-6:])
        verdict = "OK" if ok else "CRASH"
    except subprocess.TimeoutExpired:
        verdict, tail = "HANG", "(child exceeded timeout)"
    print(
        f"rows={rows} npasses={npasses} chain={chain}: {verdict} "
        f"({time.time()-t0:.0f}s)"
        + ("" if verdict == "OK" else f"\n--- tail ---\n{tail}"),
        flush=True,
    )
    if verdict != "OK" and not probe():
        print("device DOWN — waiting 120 s", flush=True)
        time.sleep(120)
        if not probe():
            print("device still down; aborting", flush=True)
            raise SystemExit(1)
    return verdict


def sweep(T: int) -> None:
    results = {}
    for rows in (1024, 2048, 3072):
        for npasses in (2, 3, 4, 6, 8, 12, 16):
            v = _child(rows, npasses, T, chain=False)
            results[(rows, npasses)] = v
            if v != "OK":
                break  # larger npasses would also fail
    print("matrix:", results, flush=True)


def chain_sweep(T: int) -> None:
    """The root-cause A/B: re-run the pathological big-state configs
    with serializing data dependencies between passes.  If chained
    passes run at normal speed, the failure mode is XLA overlapping
    independent big-VMEM-scratch kernels (oversubscription thrash),
    and the engine fix is a dependency chain, not a pool cap."""
    for rows, npasses in ((3072, 2), (3072, 3), (3072, 4), (3072, 6),
                          (2048, 3), (2048, 6), (2048, 16)):
        for chain in (False, True):
            _child(rows, npasses, T, chain=chain)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "SWEEP"
    if mode == "RUN":
        run_one(int(sys.argv[2]), int(sys.argv[3]),
                int(sys.argv[4]) if len(sys.argv) > 4 else 64,
                chain="chain" in sys.argv[5:])
    elif mode == "CHAIN":
        chain_sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    else:
        sweep(int(sys.argv[2]) if len(sys.argv) > 2 else 64)
