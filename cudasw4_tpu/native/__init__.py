"""Native (C++) IO acceleration: build-on-demand ctypes bindings.

The shared library is compiled once from io.cpp with the system toolchain
and cached next to the source.  Everything here is optional — every caller
has a pure-Python fallback — and can be disabled with CUDASW4_TPU_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..constants import UNKNOWN

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "io.cpp")
_SO = os.path.join(_HERE, "libtpusw_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO, "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        return None


def get_lib():
    """Returns the loaded ctypes library, or None if unavailable."""
    global _lib, _tried
    if os.environ.get("CUDASW4_TPU_NATIVE", "1") == "0":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.tpusw_parse_fasta.restype = ctypes.c_void_p
        lib.tpusw_parse_fasta.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
        for name in ("tpusw_num_sequences", "tpusw_num_chars", "tpusw_headers_size"):
            getattr(lib, name).restype = ctypes.c_int64
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.tpusw_chars.restype = ctypes.POINTER(ctypes.c_int8)
        lib.tpusw_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        lib.tpusw_lengths.restype = ctypes.POINTER(ctypes.c_int32)
        lib.tpusw_headers.restype = ctypes.POINTER(ctypes.c_char)
        lib.tpusw_header_offsets.restype = ctypes.POINTER(ctypes.c_int64)
        for name in (
            "tpusw_chars", "tpusw_offsets", "tpusw_lengths",
            "tpusw_headers", "tpusw_header_offsets", "tpusw_free_result",
        ):
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.tpusw_stream_open.restype = ctypes.c_void_p
        lib.tpusw_stream_open.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.tpusw_stream_next.restype = ctypes.c_void_p
        lib.tpusw_stream_next.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int,
        ]
        lib.tpusw_stream_close.restype = None
        lib.tpusw_stream_close.argtypes = [ctypes.c_void_p]
        for name in ("tpusw_pack_b32", "tpusw_pack_b21"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int
            fn.argtypes = [
                np.ctypeslib.ndpointer(np.int8, flags="C"),
                ctypes.c_int64, ctypes.c_int64,
                np.ctypeslib.ndpointer(np.int32, flags="C,WRITEABLE"),
            ]
        lib.tpusw_pack_bucket.restype = None
        lib.tpusw_pack_bucket.argtypes = [
            np.ctypeslib.ndpointer(np.int8, flags="C"),
            np.ctypeslib.ndpointer(np.int64, flags="C"),
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int8, flags="C,WRITEABLE"),
            np.ctypeslib.ndpointer(np.int32, flags="C,WRITEABLE"),
            np.ctypeslib.ndpointer(np.int32, flags="C,WRITEABLE"),
            ctypes.c_int8,
        ]
        _lib = lib
        return _lib


def parse_fasta_native(path: str, header_blob: bool = False):
    """Parse+encode+pad a FASTA/FASTQ(.gz) file natively.

    Returns (chars int8[], offsets int64[], lengths int32[], headers)
    or None if the native library is unavailable.  ``headers`` is a
    list[bytes] by default; with ``header_blob=True`` it is a
    (blob uint8[], header_offsets int64[n+1]) pair instead — the makedb
    hot path writes from the blob directly, skipping a million-object
    list plus a re-join.
    """
    lib = get_lib()
    if lib is None:
        return None
    errbuf = ctypes.create_string_buffer(512)
    h = lib.tpusw_parse_fasta(path.encode(), errbuf, len(errbuf))
    if not h:
        raise ValueError(
            f"native FASTA parse failed: {errbuf.value.decode(errors='replace')}"
        )
    try:
        n = lib.tpusw_num_sequences(h)
        nchars = lib.tpusw_num_chars(h)
        hsize = lib.tpusw_headers_size(h)
        # An empty native Buf has a NULL data pointer (no records, or
        # every sequence empty) — as_array would raise on it.
        chars = (
            np.ctypeslib.as_array(lib.tpusw_chars(h), (nchars,)).copy()
            if nchars else np.zeros(0, np.int8)
        )
        offsets = np.ctypeslib.as_array(lib.tpusw_offsets(h), (n + 1,)).copy()
        lengths = (
            np.ctypeslib.as_array(lib.tpusw_lengths(h), (n,)).copy()
            if n else np.zeros(0, np.int32)
        )
        hoffs = np.ctypeslib.as_array(lib.tpusw_header_offsets(h), (n + 1,)).copy()
        if header_blob:
            if hsize:
                blob = np.ctypeslib.as_array(
                    ctypes.cast(
                        lib.tpusw_headers(h), ctypes.POINTER(ctypes.c_uint8)
                    ),
                    (hsize,),
                ).copy()
            else:  # all-empty headers: the native buffer is NULL
                blob = np.zeros(0, np.uint8)
            headers = (blob, hoffs)
        else:
            hblob = (
                ctypes.string_at(lib.tpusw_headers(h), hsize)
                if hsize else b""
            )
            headers = [
                hblob[int(hoffs[i]) : int(hoffs[i + 1])] for i in range(n)
            ]
        return np.asarray(chars, np.int8), offsets, lengths, headers
    finally:
        lib.tpusw_free_result(h)


def _copy_batch(lib, h):
    n = lib.tpusw_num_sequences(h)
    nchars = lib.tpusw_num_chars(h)
    hsize = lib.tpusw_headers_size(h)
    chars = np.ctypeslib.as_array(lib.tpusw_chars(h), (max(nchars, 1),))[
        :nchars
    ].copy()
    offsets = np.ctypeslib.as_array(lib.tpusw_offsets(h), (n + 1,)).copy()
    lengths = np.ctypeslib.as_array(lib.tpusw_lengths(h), (max(n, 1),))[:n].copy()
    hoffs = np.ctypeslib.as_array(lib.tpusw_header_offsets(h), (n + 1,)).copy()
    hblob = ctypes.string_at(lib.tpusw_headers(h), hsize) if hsize else b""
    headers = [hblob[int(hoffs[i]) : int(hoffs[i + 1])] for i in range(n)]
    return chars.astype(np.int8), offsets, lengths, headers


def stream_fasta_native(path: str, chunk_chars: int = 256 << 20):
    """Generator of (chars, offsets, lengths, headers) batches, each
    covering complete records totalling >= chunk_chars padded chars.
    Yields nothing (and returns False via StopIteration value semantics)
    if the native library is unavailable — callers should check
    get_lib() first.
    """
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    errbuf = ctypes.create_string_buffer(512)
    st = lib.tpusw_stream_open(path.encode(), errbuf, len(errbuf))
    if not st:
        raise ValueError(
            f"native FASTA open failed: {errbuf.value.decode(errors='replace')}"
        )
    try:
        while True:
            h = lib.tpusw_stream_next(st, chunk_chars, errbuf, len(errbuf))
            if not h:
                if errbuf.value:
                    raise ValueError(
                        "native FASTA parse failed: "
                        f"{errbuf.value.decode(errors='replace')}"
                    )
                return
            try:
                yield _copy_batch(lib, h)
            finally:
                lib.tpusw_free_result(h)
    finally:
        lib.tpusw_stream_close(st)


def pack_codes_native(flat, out, codec: str) -> bool:
    """Native transfer-pack of one slab: ``flat`` int8 [rows, E] C-
    contiguous codes -> ``out`` int32 [rows, W] (any C-contiguous
    int32 buffer, e.g. a memmap slice).  Returns True on success, False
    when the library is unavailable; raises ValueError on out-of-range
    codes (same contract as the numpy path's assert)."""
    lib = get_lib()
    if lib is None:
        return False
    fn = lib.tpusw_pack_b32 if codec == "b32" else lib.tpusw_pack_b21
    rc = fn(flat, flat.shape[0], flat.shape[1], out)
    if rc != 0:
        raise ValueError(f"transfer pack ({codec}): code out of range")
    return True


def pack_bucket_native(chars, offsets, lengths, start, stop, L, NS,
                       pad=UNKNOWN):
    """Native position-major tile packing; returns (tiles, seq_index,
    seq_lengths) or None if unavailable.  ``pad`` fills tile positions
    past each sequence (UNKNOWN classic, the dedicated padding code in
    full-blosum mode)."""
    lib = get_lib()
    # The blocked-transpose kernel walks 64-subject blocks; any in-repo
    # NS (128/256/4096) divides, but guard the exported helper.
    if lib is None or NS % 64 != 0:
        return None
    count = stop - start
    T = -(-count // NS)
    tiles = np.empty((T, L, NS), dtype=np.int8)
    out_idx = np.empty((T, NS), dtype=np.int32)
    out_len = np.empty((T, NS), dtype=np.int32)
    lib.tpusw_pack_bucket(
        np.ascontiguousarray(chars, dtype=np.int8),
        np.ascontiguousarray(offsets, dtype=np.int64),
        np.ascontiguousarray(lengths, dtype=np.int32),
        start, stop, L, NS, tiles, out_idx, out_len, pad,
    )
    return tiles, out_idx, out_len
