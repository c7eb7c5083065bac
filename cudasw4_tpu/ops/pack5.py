"""Transfer packing: 6-7 residue codes per int32 word.

Host->device bandwidth is the wall for streaming-mode scans (databases
beyond device memory re-stream host->HBM once per query batch — the
reference's batched copy pipeline, /root/reference/src/cudasw4.cuh:1490+).
Two codecs:

- ``b32`` (5-bit fields): 6 codes/word = 5.33 bits/char, valid for any
  code 0..31 (covers the full-blosum alphabet, pad 25); unpacks with
  shifts.
- ``b21`` (base-21 positional): 7 codes/word = 4.57 bits/char on the
  wire (21^7 < 2^31), valid for the classic alphabet only (codes
  0..20); unpacks with constant-divisor divmods.  14.3% fewer streamed
  bytes than b32, 4.1% above the uniform-alphabet entropy floor
  (log2 21 = 4.39).

The device unpack runs in a tiny jitted prologue (HBM-bandwidth trivial
next to the transfer), so the DP kernels see ordinary int8 tiles and
stay untouched.  The reference streams raw converted bytes
(dbbatching.cuh) because PCIe at tens of GB/s is never its bottleneck;
on network-attached TPU runtimes the transfer link is 2-3 orders slower
and packing is the difference between transfer-bound and compute-bound
streaming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

#: b32: codes per int32 word (5 bits each, bits 0..29; top 2 bits unused
#: so every word is non-negative and right shifts are well-defined).
CPW = 6

#: b21: codes per int32 word (21^7 = 1.80e9 < 2^31: every word fits a
#: non-negative int32).
CPW21 = 7
BASE21 = 21


def words_for(elems: int) -> int:
    """int32 words per tile for ``elems`` int8 codes."""
    return -(-elems // CPW)


def _pack_slabs(tiles, out, cpw, max_code, combine, slab, codec):
    """Shared slab driver for both codecs: validate, zero-pad to a word
    boundary, group into [rows, W, cpw] and let ``combine`` collapse the
    code axis into int32 words.  Processes ``slab`` tiles at a time so
    peak temp memory stays at a few slabs of int32, not 4x the whole
    bucket.  ``out`` may be any [T, W]-shaped int32 array (e.g. a
    memmap) to fill in place.  Every slab is range-checked (ValueError):
    out-of-range codes would corrupt words silently (b32: field bleed;
    b21: int32 overflow breaking the non-negative-word invariant).

    The hot loop runs in C++ when the native library is available
    (native/io.cpp tpusw_pack_b32/b21: measured 1085 vs 169 MB/s for the
    numpy Horner pack — 6.4x, which at trembl scale turns one-time
    packing from minutes into tens of seconds); the numpy path is the
    always-available fallback and the test oracle.
    """
    from ..native import pack_codes_native

    T = tiles.shape[0]
    E = int(np.prod(tiles.shape[1:]))
    W = -(-E // cpw)
    if out is None:
        out = np.empty((T, W), np.int32)
    for t0 in range(0, T, slab):
        t1 = min(t0 + slab, T)
        flat = np.ascontiguousarray(
            np.asarray(tiles[t0:t1]).reshape(t1 - t0, E)
        )
        if flat.dtype != np.int8:
            raise ValueError("transfer pack requires int8 codes")
        dst = out[t0:t1]
        if (
            dst.flags.c_contiguous
            and pack_codes_native(flat, dst, codec)
        ):
            continue  # native path range-checks inline
        if not (
            int(flat.min(initial=0)) >= 0
            and int(flat.max(initial=0)) <= max_code
        ):
            raise ValueError(f"transfer pack requires codes 0..{max_code}")
        if E != W * cpw:
            flat = np.concatenate(
                [flat, np.zeros((t1 - t0, W * cpw - E), np.int8)], axis=1
            )
        grp = flat.reshape(t1 - t0, W, cpw).astype(np.int32)
        out[t0:t1] = combine(grp)
    return out


def pack5(tiles: np.ndarray, out: np.ndarray | None = None,
          slab: int = 64) -> np.ndarray:
    """b32 pack: int8 code tiles [T, ...] -> int32 [T, words_for(E)]."""

    def combine(grp):
        acc = grp[:, :, 0].copy()
        for k in range(1, CPW):
            acc |= grp[:, :, k] << (5 * k)
        return acc

    return _pack_slabs(tiles, out, CPW, 31, combine, slab, "b32")


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


# --------------------------------------------------------------- b21 codec


def words_for21(elems: int) -> int:
    """int32 words per tile for ``elems`` codes in base-21 packing."""
    return -(-elems // CPW21)


def pack21(tiles: np.ndarray, out: np.ndarray | None = None,
           slab: int = 64) -> np.ndarray:
    """Base-21 pack: int8 code tiles [T, ...] -> int32 [T, W21].

    Codes must be 0..20 (classic alphabet incl. pad 20).  Word value =
    sum_k code_k * 21^k (code 0 of each word in the low digits)."""

    def combine(grp):
        acc = grp[:, :, CPW21 - 1].copy()
        for k in range(CPW21 - 2, -1, -1):
            acc *= BASE21
            acc += grp[:, :, k]
        return acc

    return _pack_slabs(tiles, out, CPW21, BASE21 - 1, combine, slab, "b21")


@functools.partial(jax.jit, static_argnames=("shape",))
def unpack21(packed: jax.Array, shape: tuple) -> jax.Array:
    """Device unpack: base-21 int32 [T, W21] -> int8 [T, *shape].

    Constant-divisor divmods (XLA lowers them to multiply-shift);
    elementwise along the tile axis so sharded inputs unpack per shard."""
    T, W = packed.shape
    E = int(np.prod(shape))
    w = packed
    digits = []
    for _ in range(CPW21):
        digits.append((w % BASE21).astype(jnp.int8))
        w = w // BASE21
    chars = jnp.stack(digits, axis=-1)  # [T, W, CPW21]
    return (
        chars.reshape(T, W * CPW21)[:, :E]
        .reshape((T,) + tuple(shape))
    )


def unpack21_np(packed: np.ndarray, shape: tuple) -> np.ndarray:
    """NumPy reference unpack for the b21 codec."""
    T, W = packed.shape
    E = int(np.prod(shape))
    w = packed.astype(np.int64)
    digits = []
    for _ in range(CPW21):
        digits.append((w % BASE21).astype(np.int8))
        w = w // BASE21
    chars = np.stack(digits, axis=-1)
    return (
        chars.reshape(T, W * CPW21)[:, :E]
        .reshape((T,) + tuple(shape))
    )


# ------------------------------------------------------------- codec table

#: codec name -> (codes-per-word, words_for, pack, unpack_jit, unpack_np,
#: max valid code).  ``b21`` needs the classic alphabet; ``b32`` covers
#: full-blosum (pad 25) too.
CODECS = {
    "b32": (CPW, words_for, pack5, unpack5, unpack5_np, 31),
    "b21": (CPW21, words_for21, pack21, unpack21, unpack21_np, BASE21 - 1),
}


def pack_to_tempmm(tiles: np.ndarray, codec: str,
                   rows=None, dir: str | None = None) -> np.ndarray:
    """Pack ``tiles`` with ``codec`` into an anonymous temp-file memmap.

    The one-time resident uploads (engine._upload_bucket_tiles,
    parallel.sharding.shard_bucket_arrays) feed the packed form to a
    jitted device unpack; routing the pack through a disk-backed memmap
    keeps peak host RAM at the slab size instead of ~0.67x the whole
    bucket — the same bounded-RAM discipline as the streaming sidecar
    (engine_streaming._build_stream_pack).  The memmap's pages are
    evictable page cache, so the jit input staging reads them through
    without a second resident copy.

    ``rows``: optional iterable of (start, stop) tile ranges to pack —
    multiprocess uploads pass each host's addressable ranges so a
    process packs only the rows its devices will read (the unwritten
    regions stay sparse-file holes, mirroring the per-host partial tile
    store).  ``dir`` (or CUDASW4_TPU_TMPDIR, or the TMPDIR default)
    picks the backing filesystem; on hosts where the default tmp is
    tmpfs the pages would be RAM-backed, defeating the bounded-RAM
    goal — point the env var at a real disk there.  Any OSError from
    the temp-file path (unwritable dir, disk full) falls back to the
    plain in-RAM pack: packing needs only RAM, so a disk problem must
    not fail the upload."""
    import os
    import tempfile

    cpw, words_for_, pack, _uj, _un, _maxc = CODECS[codec]
    T = int(tiles.shape[0])
    E = int(np.prod(tiles.shape[1:]))
    W = words_for_(E)
    if T == 0 or W == 0:
        return np.zeros((T, W), np.int32)
    spans = [(0, T)] if rows is None else [
        (max(0, int(s)), min(T, int(e))) for s, e in rows
    ]
    try:
        f = tempfile.TemporaryFile(
            prefix="cudasw4_respack_",
            dir=dir or os.environ.get("CUDASW4_TPU_TMPDIR") or None,
        )
        # Reserve the space up front: truncate() alone makes a sparse
        # file, so a full disk would surface later as SIGBUS during
        # memmap page writeback instead of an OSError here — fallocate
        # turns ENOSPC into the in-RAM fallback this except exists for.
        if hasattr(os, "posix_fallocate"):
            import errno

            try:
                os.posix_fallocate(f.fileno(), 0, T * W * 4)
            except OSError as e:
                # Unsupported fs (EOPNOTSUPP/EINVAL): sparse behaviour is
                # the best available there — only real space failures
                # should take the in-RAM fallback.
                if e.errno in (errno.ENOSPC, errno.EDQUOT, errno.EFBIG):
                    raise
        f.truncate(T * W * 4)
        mm = np.memmap(f, np.int32, mode="w+", shape=(T, W))
        for s, e in spans:
            if e > s:
                pack(tiles[s:e], out=mm[s:e])
        return mm
    except OSError:
        if rows is None:
            return pack(tiles)
        out = np.zeros((T, W), np.int32)
        for s, e in spans:
            if e > s:
                pack(tiles[s:e], out=out[s:e])
        return out


def choose_codec(mode: str, pad: int) -> str | None:
    """Map CUDASW4_TPU_STREAM_PACK to a codec: "1" b32 (the
    TPU-validated default), "2" b21 where the alphabet allows (classic
    pad 20; full-blosum pad 25 falls back to b32).  Anything else —
    "0", empty, garbage — disables packing (fail closed: an
    unrecognized value must not silently enable a transfer codec)."""
    if mode == "1":
        return "b32"
    if mode == "2":
        return "b21" if pad < BASE21 else "b32"
    return None
