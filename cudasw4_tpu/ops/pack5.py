"""5-bit transfer packing: 6 residue codes per int32 word.

Host->device bandwidth is the wall for streaming-mode scans (databases
beyond device memory re-stream host->HBM once per query batch — the
reference's batched copy pipeline, /root/reference/src/cudasw4.cuh:1490+).
Residue codes occupy 5 bits (0..20 classic, 0..25 full-blosum), so
packing 6 codes into each int32 word ships 5.33 bits/char instead of 8 —
a 1.5x cut in streamed bytes.  The device unpacks with int32 shifts in a
tiny jitted prologue (HBM-bandwidth trivial next to the transfer), so
the DP kernels see ordinary int8 tiles and stay untouched.

The reference streams raw converted bytes (dbbatching.cuh) because PCIe
at tens of GB/s is never its bottleneck; on network-attached TPU
runtimes the transfer link is 2-3 orders slower and packing is the
difference between transfer-bound and compute-bound streaming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: Codes per int32 word (5 bits each, bits 0..29; top 2 bits unused so
#: every word is non-negative and right shifts are well-defined).
CPW = 6


def words_for(elems: int) -> int:
    """int32 words per tile for ``elems`` int8 codes."""
    return -(-elems // CPW)


def pack5(tiles: np.ndarray, out: np.ndarray | None = None,
          slab: int = 64) -> np.ndarray:
    """Pack int8 code tiles [T, ...] -> int32 [T, W] (W = words_for(E)).

    Processes ``slab`` tiles at a time so peak temp memory stays at a few
    slabs of int32, not 4x the whole bucket.  ``out`` may be any
    [T, W]-shaped int32 array (e.g. a memmap) to fill in place.
    """
    T = tiles.shape[0]
    E = int(np.prod(tiles.shape[1:]))
    W = words_for(E)
    if out is None:
        out = np.empty((T, W), np.int32)
    if T:
        # Codes >= 32 would corrupt silently; our packers only emit
        # 0..25 (classic pad 20 / full-blosum pad 25).  Sample-check the
        # first slab rather than paying a full extra pass.
        first = np.asarray(tiles[: min(slab, T)])
        assert (
            first.dtype == np.int8
            and int(first.max(initial=0)) < 32
            and int(first.min(initial=0)) >= 0
        ), "pack5 requires non-negative 5-bit codes"
    for t0 in range(0, T, slab):
        t1 = min(t0 + slab, T)
        flat = np.asarray(tiles[t0:t1]).reshape(t1 - t0, E)
        if E != W * CPW:
            flat = np.concatenate(
                [flat, np.zeros((t1 - t0, W * CPW - E), np.int8)], axis=1
            )
        grp = flat.reshape(t1 - t0, W, CPW).astype(np.int32)
        acc = grp[:, :, 0].copy()
        for k in range(1, CPW):
            acc |= grp[:, :, k] << (5 * k)
        out[t0:t1] = acc
    return out


@functools.partial(jax.jit, static_argnames=("shape",))
def unpack5(packed: jax.Array, shape: tuple) -> jax.Array:
    """Device unpack: int32 [T, W] -> int8 [T, *shape].

    Elementwise along the tile axis, so a tile-sharded input yields a
    tile-sharded output (the sharded streaming path unpacks per shard
    with no collectives).
    """
    T, W = packed.shape
    E = int(np.prod(shape))
    shifts = jnp.arange(CPW, dtype=jnp.int32) * 5
    chars = (packed[:, :, None] >> shifts) & 31
    return (
        chars.reshape(T, W * CPW)[:, :E].astype(jnp.int8)
        .reshape((T,) + tuple(shape))
    )


def unpack5_np(packed: np.ndarray, shape: tuple) -> np.ndarray:
    """NumPy reference unpack (tests / host-side checks)."""
    T, W = packed.shape
    E = int(np.prod(shape))
    ks = np.arange(CPW, dtype=np.int32) * 5
    chars = (packed[:, :, None] >> ks) & 31
    return (
        chars.reshape(T, W * CPW)[:, :E].astype(np.int8)
        .reshape((T,) + tuple(shape))
    )
