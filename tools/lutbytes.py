"""Isolate whether the per-tile fixed cost tracks LUT bytes WRITTEN.

Round-4 pinned the cell/col kernels' per-tile fixed cost on the
substitution LUT's VMEM write traffic (the MXU-build null result:
replacing the build ALU changed nothing, so the ~21x-tile-bytes of
writes must be the binding resource).  VERDICT r04 item 6 asks for a
measured A/B on shrinking the bytes before any packed-LUT engineering.

This tool rebuilds the cell kernel with TRUNCATED LUT builds (A/2 and
A/4 of the 21 planes — scores are garbage, timing only) and times the
single-query kernel at q=32 / q=512 (the configs where the fixed cost
is 48% / 16% of tile time).  If halving the planes halves the
build-attributed time, a 2-letters-per-byte packed LUT (+3 ALU
ops/cell on the DP read) could win at small q; if the cost barely
moves, the write-bytes hypothesis is dead and the lever closes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/lutbytes.py
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas, sw_pallas_cell


def truncated_build(planes: int):
    """A build_sub_lut clone that writes only ``planes`` of the A query
    planes (same per-plane select chain; remaining planes keep garbage
    scratch — fine for timing)."""

    def build(x_ref, b_ref, lut_ref, shape, rows: int = 8, A: int = 21):
        L = shape[0]
        tail = shape[1:]
        nchunks = L // rows

        def build_chunk(i, _):
            t = i // nchunks
            lc = (i % nchunks) * rows
            xi = x_ref[0, pl.ds(lc, rows)].astype(jnp.int32)
            base = b_ref[t * A + (A - 1)]
            row = jnp.full((rows,) + tail, base, jnp.int32)
            for u in range(A - 1):
                row = row + (xi == u).astype(jnp.int32) * (
                    b_ref[t * A + u] - base
                )
            lut_ref[t, pl.ds(lc, rows)] = row.astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, planes * nchunks, build_chunk, 0)

    return build


def main():
    cfg = make_scoring_config("blosum62")
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    rng = np.random.default_rng(42)
    L = 512
    spt = sw_pallas_cell.SUBJECTS_PER_TILE
    n = (128 << 20) // (L * spt) * spt  # 64 tiles at L=512
    data = rng.integers(0, 20, size=(n, L)).astype(np.int8)
    Tc = n // spt
    tiles = jnp.asarray(
        data.reshape(Tc, spt, L).transpose(0, 2, 1)
        .reshape(Tc, L, 32, 128).copy()
    )
    real = sw_pallas_cell.build_sub_lut

    print(f"L={L}, {Tc} tiles; per-tile LUT = 21 x {L*spt >> 20} MB")
    for qlen in (32, 512):
        q = rng.integers(0, 20, size=qlen)
        qpad, nq = sw_pallas.prepare_query(q)
        qdev = jnp.asarray(qpad)
        params = jnp.asarray(np.array(
            [nq, cfg.gop, cfg.gex, -(-nq // 8) * 8], np.int32
        ))
        cells = float(n) * L * nq

        def timed():
            def run():
                return np.asarray(
                    sw_pallas_cell.score_bucket_pallas_cell(
                        tiles, qdev, mat, params, exact=True,
                    )
                )

            run()
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                run()
                ts.append(time.perf_counter() - t0)
            return min(ts)

        base = timed()
        out = [f"q={qlen:4d}: full(21) {base*1e3:7.1f} ms"]
        for planes in (11, 5):
            sw_pallas_cell.build_sub_lut = truncated_build(planes)
            sw_pallas_cell.score_bucket_pallas_cell._clear_cache()
            try:
                t = timed()
            finally:
                sw_pallas_cell.build_sub_lut = real
                sw_pallas_cell.score_bucket_pallas_cell._clear_cache()
            out.append(
                f"planes={planes} {t*1e3:7.1f} ms ({(t-base)*1e3:+.1f})"
            )
        out.append(f"[{cells/base/1e9:.1f} GCUPS full]")
        print("  " + "  ".join(out))


if __name__ == "__main__":
    main()
