"""Host->HBM link bandwidth measurement (round 5, VERDICT item 2).

Streaming mode re-ships the database host->device once per query batch,
so its GCUPS ceiling is a pure function of the link bandwidth and the
transfer codec:

    cells/batch   = Qtot * X          (Qtot = total query residues in
                                       the batch, X = DB residues)
    bytes/batch   = X * bpr           (bpr = bytes shipped per residue:
                                       1.0 raw int8, 32/6/8 = 0.667 b32,
                                       32/7/8 = 0.571 b21)
    GCUPS ceiling = Qtot * BW / bpr / 1e9   (transfer-bound: compute
                                             fully overlapped)

This tool measures BW three ways on the real chip:
  put     jax.device_put of a committed numpy array (bulk path,
          what the resident upload uses)
  jitin   numpy array fed as a jit argument, result materialized (the
          streaming path: the jit-managed input transfer measured 4x
          faster than explicit device_put chaining in round 2)
  unpack  the actual production path: packed int32 chunks through the
          jitted pack5 unpack prologue (amortizes transfer + unpack)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/linkbench.py
       [mb] [reps]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

MB = int(sys.argv[1]) if len(sys.argv) > 1 else 256
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def bw(nbytes, seconds):
    return nbytes / seconds / 1e9


def main():
    rng = np.random.default_rng(0)
    n = MB << 20

    # --- put: committed bulk device_put (int8)
    x8 = rng.integers(0, 20, size=n).astype(np.int8)
    d = jax.device_put(x8)
    d.block_until_ready()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        jax.device_put(x8).block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"put     int8 {MB} MB: {bw(n, min(ts)):6.2f} GB/s "
          f"(median {bw(n, sorted(ts)[len(ts)//2]):6.2f})")

    # --- jitin: jit-argument staging (int8), result is a tiny reduce so
    # the transfer dominates
    @jax.jit
    def f8(a):
        return a[:: 1 << 20].astype(jnp.int32).sum()

    np.asarray(f8(x8))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f8(x8))
        ts.append(time.perf_counter() - t0)
    print(f"jitin   int8 {MB} MB: {bw(n, min(ts)):6.2f} GB/s "
          f"(median {bw(n, sorted(ts)[len(ts)//2]):6.2f})")

    # --- jitin int32 (the packed stream ships int32 words)
    w = n // 4
    x32 = rng.integers(0, 2**31 - 1, size=w, dtype=np.int32)

    @jax.jit
    def f32(a):
        return a[:: 1 << 18].sum()

    np.asarray(f32(x32))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(f32(x32))
        ts.append(time.perf_counter() - t0)
    print(f"jitin  int32 {MB} MB: {bw(n, min(ts)):6.2f} GB/s "
          f"(median {bw(n, sorted(ts)[len(ts)//2]):6.2f})")

    # --- unpack: production pack5 path — packed words in, unpacked tile
    # bytes out, reduced on device so only the transfer+unpack is timed.
    from cudasw4_tpu.ops import pack5

    E = n  # unpacked elements
    cpw, words_for, pack, unpack_jit, _un, _maxc = pack5.CODECS["b32"]
    tiles = rng.integers(0, 20, size=(1, E)).astype(np.int8)
    packed = pack(tiles)

    @jax.jit
    def fu(p):
        t = unpack_jit(p, (1, E))
        return t.reshape(-1)[:: 1 << 20].astype(jnp.int32).sum()

    np.asarray(fu(packed))
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(fu(packed))
        ts.append(time.perf_counter() - t0)
    tb = min(ts)
    print(f"unpack b32   {MB} MB unpacked ({packed.nbytes >> 20} MB "
          f"shipped): {bw(packed.nbytes, tb):6.2f} GB/s wire, "
          f"{bw(n, tb):6.2f} GB/s effective residues")

    # Ceiling table for representative query batches.
    bwire = bw(packed.nbytes, tb)
    print("\nTransfer-bound GCUPS ceiling = Qtot * wire_BW / (32/6/8):")
    for label, qtot in (
        ("16 x 370 aa (small bench)", 16 * 370),
        ("20-query reference ladder", 41752),
        ("14-query mixed set", 13785),
    ):
        print(f"  {label:28s} Qtot={qtot:6d}: "
              f"{qtot * bwire * 1e9 / (32 / 6 / 8) / 1e9:8.1f} GCUPS")


if __name__ == "__main__":
    main()
