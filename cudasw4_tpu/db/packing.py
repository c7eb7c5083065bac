"""Length-bucketed packing of a database into fixed-shape TPU tiles.

This replaces the reference's 36 length partitions + ragged offsets + batch
copy planner (/root/reference/src/length_partitions.hpp,
/root/reference/src/cudasw4.cuh:1177-1277) with the XLA-friendly equivalent:
every sequence is assigned to the smallest bucket length >= its length, and
each bucket is packed into tiles of shape [L, NS] int8 where

* L  = bucket subject length (padded with UNKNOWN=20, multiple of 16),
* NS = subjects per tile (multiple of 128, the VPU lane width).

Inside a tile, axis 0 is the subject *position* and axis 1 the subject *lane*
("position-major"), which is exactly the layout the Pallas kernel consumes:
one elementwise op over an [L, NS] array advances the DP for NS independent
alignments at once.  Padding lanes carry all-UNKNOWN characters (they can
never raise a local-alignment score) and are masked out via ``seq_index==-1``.

The kernel's compile cache is keyed by (L, NS); the bucket edge list below is
the analog of the reference's 34 template instantiations.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..constants import UNKNOWN

#: Default bucket edges (ascending).  All multiples of 16 (f32 state arrays
#: tile at 8 sublanes; finer buckets cut padding waste more than int8 sublane
#: padding costs).
DEFAULT_BUCKET_EDGES = [
    32, 48, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384, 448,
    512, 640, 768, 896, 1024, 1280, 1536, 1792, 2048,
]

#: Longest bucket handled by the single-pass kernel; longer subjects go to
#: chunked buckets (multiples of LONG_CHUNK).
MAX_SINGLE_PASS = 2048
LONG_CHUNK = 2048

#: Lanes per tile for the row-streaming kernel.  gridsearch autotuning on
#: TPU v5e (2026-08) found NS=128 fastest for every bucket length (smaller
#: tiles pipeline better through the Pallas grid than wide ones); override
#: per deployment with the gridsearch CLI.
MIN_LANES = 128
MAX_LANES = 1024

#: Cell-sequential kernel geometry (ops/sw_pallas_cell.py): 32x128
#: subjects per tile (the int8 VMEM tile shape), tiles stored as
#: [T, L, 32, 128].  Only used up to CELL_MAX_L — beyond that the
#: per-tile substitution LUT (21 x tile bytes) exceeds VMEM and the
#: column-chunked kernel (ops/sw_pallas_col.py, same tile layout, subject
#: axis streamed LC columns at a time) takes over.  768 is the measured
#: v5e ceiling for int32 state (LUT 66 MB + X blocks 6.3 MB + H/F 25.2 MB
#: ~= 98 MB of the 128 MB core; 896 fails to compile), and the cell
#: kernel at L=768 runs ~292 GCUPS single-query vs ~275 for the column
#: kernel (tools/cell_longL.py, round 3).
CELL_SUBJECTS = 4096
CELL_MAX_L = 768
#: Measured v5e speed ratios vs the row-streaming kernel (~155/87 for the
#: cell kernel at L<=512; ~165/58 for the column kernel at L>=640); used
#: to pick the layout that maximises *effective* throughput after padding
#: waste (a bucket with few sequences wastes most of a 4096-subject tile).
#: Override per TPU generation with the env vars after a gridsearch run.
CELL_SPEEDUP = float(os.environ.get("CUDASW4_TPU_CELL_SPEEDUP", 1.75))
COL_SPEEDUP = float(os.environ.get("CUDASW4_TPU_COL_SPEEDUP", 2.8))
#: Relative speed of the portable-XLA fallback used by row-layout buckets
#: longer than MAX_SINGLE_PASS.
JNP_REL_SPEED = 0.05


def apply_tuning(cfg) -> None:
    """Apply a gridsearch-emitted tuning config to the layout chooser
    and the kernels' tunable geometry.

    ``cfg``: a dict (or a path to a JSON file) as written by
    ``gridsearch --emit-config`` — the per-generation feedback loop the
    reference runs by hand-editing its partId->(group_size,numRegs)
    dispatch table from gridsearch output
    (/root/reference/src/gridsearch.cu, /root/reference/src/cudasw4.cuh:1767).

    Recognised keys (unknown keys are ignored so configs stay forward
    compatible; invalid values raise ValueError — a tuning config must
    never silently half-apply):

    - ``cell_speedup`` / ``col_speedup``: measured kernel speed ratios
      vs the row-streaming kernel (floats; feed choose_bucket_layout).
    - ``cell_max_l``: longest bucket the cell kernel handles (multiple
      of 16; the VMEM ceiling differs per TPU generation).
    - ``cell_unroll`` / ``col_unroll``: inner-loop unroll factors
      (ops.sw_pallas_cell/col DEFAULT_UNROLL; col_unroll is also the
      query-row padding granule, threaded through the engine).
    - ``col_nqc``: column-kernel state-pool rows (multiple of 128;
      VMEM-bound per generation).
    - ``col_lc``: column-kernel subject positions per grid step
      (multiple of 128; long-bucket lengths must stay multiples).

    Kernel jit caches are cleared when geometry changes so stale
    unroll=None traces cannot survive a retune.
    """
    global CELL_SPEEDUP, COL_SPEEDUP, CELL_MAX_L
    if isinstance(cfg, (str, os.PathLike)):
        import json

        with open(cfg) as f:
            cfg = json.load(f)
    from ..ops import sw_pallas_cell, sw_pallas_col

    # Validate EVERY key into locals before assigning anything: a bad
    # later key (e.g. valid cell_unroll then garbage col_nqc) must not
    # leave half-applied geometry with stale kernel traces behind the
    # ValueError — callers that catch it rely on the never-half-apply
    # contract documented above.
    pend: dict = {}
    if cfg.get("cell_speedup"):
        pend["cell_speedup"] = float(cfg["cell_speedup"])
    if cfg.get("col_speedup"):
        pend["col_speedup"] = float(cfg["col_speedup"])
    if cfg.get("cell_max_l"):
        v = int(cfg["cell_max_l"])
        if v < 16 or v % 16:
            raise ValueError(f"cell_max_l must be a multiple of 16: {v}")
        pend["cell_max_l"] = v
    if cfg.get("cell_unroll"):
        v = int(cfg["cell_unroll"])
        if v < 2:
            raise ValueError(f"cell_unroll must be >= 2: {v}")
        pend["cell_unroll"] = v
    if cfg.get("col_unroll"):
        v = int(cfg["col_unroll"])
        if v < 1 or v > sw_pallas_col.FLAT_QUANT:
            raise ValueError(f"col_unroll out of range: {v}")
        if sw_pallas_col.FLAT_QUANT % v:
            raise ValueError(
                f"col_unroll must divide FLAT_QUANT "
                f"({sw_pallas_col.FLAT_QUANT}): {v}"
            )
        pend["col_unroll"] = v
    if cfg.get("col_nqc"):
        v = int(cfg["col_nqc"])
        if v < 128 or v % 128:
            raise ValueError(f"col_nqc must be a multiple of 128: {v}")
        pend["col_nqc"] = v
    if cfg.get("col_lc"):
        v = int(cfg["col_lc"])
        if v < 128 or v % 128:
            raise ValueError(f"col_lc must be a multiple of 128: {v}")
        pend["col_lc"] = v

    if "cell_speedup" in pend:
        CELL_SPEEDUP = pend["cell_speedup"]
    if "col_speedup" in pend:
        COL_SPEEDUP = pend["col_speedup"]
    if "cell_max_l" in pend:
        CELL_MAX_L = pend["cell_max_l"]
    geom = False
    if "cell_unroll" in pend:
        geom |= pend["cell_unroll"] != sw_pallas_cell.DEFAULT_UNROLL
        sw_pallas_cell.DEFAULT_UNROLL = pend["cell_unroll"]
    if "col_unroll" in pend:
        geom |= pend["col_unroll"] != sw_pallas_col.DEFAULT_UNROLL
        sw_pallas_col.DEFAULT_UNROLL = pend["col_unroll"]
    if "col_nqc" in pend:
        geom |= pend["col_nqc"] != sw_pallas_col.NQC
        sw_pallas_col.NQC = pend["col_nqc"]
    if "col_lc" in pend:
        geom |= pend["col_lc"] != sw_pallas_col.LC
        sw_pallas_col.LC = pend["col_lc"]
    global _tuning_applied
    _tuning_applied = True
    if geom:
        for fn in (
            sw_pallas_cell.score_bucket_pallas_cell,
            sw_pallas_cell.score_bucket_pallas_cell_batch,
            sw_pallas_col.score_bucket_pallas_col,
            sw_pallas_col.score_bucket_pallas_col_flat,
            sw_pallas_col.score_bucket_pallas_col_flat_fused,
        ):
            fn._clear_cache()


#: Set by apply_tuning: once ANY tuning has been applied in this process
#: (env var, --tuning, or auto), auto_apply_tuning becomes a no-op — an
#: explicit config always wins over the packaged defaults.
_tuning_applied = False


def auto_apply_tuning(device_kind: str, verbose: bool = False) -> str | None:
    """Apply the committed tuning config matching the detected TPU
    generation, if one ships in cudasw4_tpu/tuning/ — the analog of the
    reference's baked partId->(group_size,numRegs) dispatch table being
    the DEFAULT (/root/reference/src/cudasw4.cuh:1767-1800: gridsearch
    results are hand-baked into the source, no flag needed), where this
    build previously required --tuning to pick up its own measurements.

    Returns the applied config path, or None (no match / already tuned /
    opted out via CUDASW4_TPU_AUTO_TUNING=0).  Matching is by the
    config's "platform" field == jax's device_kind for the first
    device.  Never raises: a malformed packaged config is skipped (the
    engine must construct on any platform)."""
    global _tuning_applied
    if _tuning_applied:
        return None
    if os.environ.get("CUDASW4_TPU_AUTO_TUNING", "1") == "0":
        return None
    import glob
    import json

    tdir = os.path.join(os.path.dirname(__file__), "..", "tuning")
    for path in sorted(glob.glob(os.path.join(tdir, "*.json"))):
        try:
            with open(path) as f:
                cfg = json.load(f)
            if cfg.get("platform") != device_kind:
                continue
            apply_tuning(cfg)
        except (OSError, ValueError, TypeError):
            continue
        if verbose:
            print(
                f"Applied committed {device_kind} tuning: "
                f"{os.path.normpath(path)} "
                "(opt out: CUDASW4_TPU_AUTO_TUNING=0)"
            )
        return path
    return None


if os.environ.get("CUDASW4_TPU_TUNING"):
    apply_tuning(os.environ["CUDASW4_TPU_TUNING"])


def ladder_length(length: int) -> int:
    """Padded length for a long-tail (> CELL_MAX_L) 4096-subject group:
    the group's max length rounded up to the column kernel's 128-column
    chunk (coarser granules higher up bound the number of distinct
    compiled shapes across databases).  Round 5 replaced the earlier
    ~1.2x-step ladder: on the 5M-seq sprot-like mix the ladder's
    overshoot (e.g. a 2100-max group padded to 2560) was ~1% of total
    DB padding for zero benefit — the compile cache stays bounded by
    the granule alone (<= 32 + 24 + a handful of values)."""
    if length <= 4096:
        return -(-length // 128) * 128
    if length <= 16384:
        return -(-length // 512) * 512
    return -(-length // 4096) * 4096


def adaptive_edges(num_seqs: int):
    """Fine bucket edges for multi-million-sequence databases, or None
    to keep the classic DEFAULT_BUCKET_EDGES tiers.

    Bucket-edge granularity trades two padding sources: finer edges cut
    per-sequence length padding (~step/2 chars each) but add buckets,
    and every bucket's last tile carries ~NS/2 dead lanes (~L chars
    each) plus per-bucket program overhead.  Measured on the v5e chip
    (round 5, sprot-like log-normal mixes x the 20-query ladder):

    - 5M seqs: 16-step edges 292.4 GCUPS vs classic tiers 279.5 (total
      padding 10.4% -> 6.2% of DB chars; the padding fully accounts for
      the resident-scan gap to the equal-length sweep rate);
    - 500k: 32-step 243.6 vs classic 249.0 — classic WINS;
    - 200k: 64-step 217.2 vs classic 224.1 — classic wins.

    So fine edges only pay where bucket population dwarfs the per-bucket
    costs; the cutoff sits between 500k and 5M and is set at 2M."""
    if num_seqs >= 2_000_000:
        return list(range(16, CELL_MAX_L + 1, 16))
    return None


def lanes_for_length(L: int) -> int:
    return MIN_LANES


def choose_bucket_layout(L: int, count: int) -> tuple[int, str]:
    """Returns (NS, kernel) maximising effective GCUPS for the bucket."""
    row_ns = lanes_for_length(L)
    row_eff = count / (-(-count // row_ns) * row_ns)
    wide_eff = count / (-(-count // CELL_SUBJECTS) * CELL_SUBJECTS)
    if L <= CELL_MAX_L:
        if wide_eff * CELL_SPEEDUP > row_eff:
            return CELL_SUBJECTS, "cell"
        return row_ns, "row"
    # Column kernel needs the subject axis to split into LC-sized chunks.
    from ..ops.sw_pallas_col import LC

    if L % LC == 0:
        row_rel = 1.0 if L <= MAX_SINGLE_PASS else JNP_REL_SPEED
        if wide_eff * COL_SPEEDUP > row_eff * row_rel:
            return CELL_SUBJECTS, "col"
    return row_ns, "row"


def bucket_length_for(length: int, edges=None) -> int:
    """Smallest bucket length >= ``length``."""
    if edges is None:
        edges = DEFAULT_BUCKET_EDGES
    for e in edges:
        if length <= e:
            return e
    # long bucket: round up to a multiple of LONG_CHUNK
    return ((length + LONG_CHUNK - 1) // LONG_CHUNK) * LONG_CHUNK


@dataclass
class PackedBucket:
    """One bucket of the packed database."""

    L: int  # padded subject length
    NS: int  # subjects per tile
    tiles: np.ndarray  # int8, position-major: [T, L, NS] (row kernel) or
    #                    [T, L, 32, NS//32] (cell kernel; flat subject
    #                    index s = g*128 + lane, a pure reshape of [L, NS])
    seq_index: np.ndarray  # int32 [T, NS], global (sorted-db) id, -1 = padding
    lengths: np.ndarray  # int32 [T, NS], real lengths, 0 = padding
    kernel: str = "row"  # "row" | "cell"

    @property
    def num_tiles(self) -> int:
        return self.tiles.shape[0]

    @property
    def num_real(self) -> int:
        return int((self.seq_index >= 0).sum())

    @property
    def is_long(self) -> bool:
        return self.L > MAX_SINGLE_PASS


@dataclass
class PackedDB:
    buckets: list[PackedBucket]
    num_sequences: int
    total_real_chars: int  # sum of real lengths (GCUPS denominator)
    #: Per-bucket [(t_start, t_stop), ...] tile ranges actually present
    #: (partial per-host stores); None = every tile.  Tiles outside the
    #: ranges read as zeros from the sparse store and must never be
    #: consumed — the engine only allows partial stores on the streamed
    #: chunk-sharded path whose local rows the ranges were derived from.
    tile_ranges: list | None = None

    @property
    def total_padded_chars(self) -> int:
        return sum(b.tiles.size for b in self.buckets)



def _pack_slab(chars, offsets, lengths, a, b, L, NS, pad_code):
    """Pack sequences [a, b) into ceil((b-a)/NS) position-major row-layout
    tiles; the single source of the gather/mask/transpose math shared by
    pack_db and pack_db_to_store (byte-identity between the two is
    load-bearing for the tile-store cache contract)."""
    cnt = b - a
    nt = -(-cnt // NS)
    offs = offsets[a:b, None]  # [cnt, 1]
    jj = np.arange(L, dtype=np.int64)[None, :]
    # padded length on disk is a multiple of 4 >= real length
    padlens = ((lengths[a:b] + 3) // 4 * 4)[:, None]
    idx = offs + np.minimum(jj, padlens - 1)
    block = np.take(chars, idx)
    if pad_code == UNKNOWN:
        # On-disk padding bytes within [len, padlen) are already UNKNOWN;
        # masking at padlens keeps byte-parity with the native packer.
        block = np.where(jj < padlens, block, UNKNOWN)
    else:
        block = np.where(jj < lengths[a:b, None], block, pad_code)
    block = block.astype(np.int8)
    slab = np.full((nt * NS, L), pad_code, dtype=np.int8)
    slab[:cnt] = block
    tiles = slab.reshape(nt, NS, L).transpose(0, 2, 1)
    sidx = np.full(nt * NS, -1, dtype=np.int32)
    sidx[:cnt] = np.arange(a, b, dtype=np.int32)
    slen = np.zeros(nt * NS, dtype=np.int32)
    slen[:cnt] = lengths[a:b]
    return tiles, sidx.reshape(nt, NS), slen.reshape(nt, NS)


def pack_db(
    db,
    edges=None,
    slab_tiles: int = 64,
    use_native: bool = True,
    pad_code: int = UNKNOWN,
) -> PackedDB:
    """Pack a length-sorted DBData into buckets of fixed-shape tiles.

    ``db`` needs .chars/.offsets/.lengths (DBData or PseudoDB-adapted).
    Sequences must be sorted by length ascending (the on-disk invariant),
    so each bucket is a contiguous global-index range.

    ``pad_code``: alphabet code for padded positions (UNKNOWN classic;
    25 in full-blosum mode, where on-disk code 20 means 'B' and so every
    position beyond a sequence's real length must carry the dedicated
    padding code instead of the on-disk padding bytes).
    """
    # edges=None flows through to plan_buckets, which picks the
    # database-size-adaptive fine edges (adaptive_edges) or the classic
    # tiers; resolving it here would pin the classic tiers forever.
    lengths = np.asarray(db.lengths, dtype=np.int64)
    offsets = np.asarray(db.offsets, dtype=np.int64)
    chars = db.chars
    n = len(lengths)
    if n and not np.all(lengths[1:] >= lengths[:-1]):
        raise ValueError("database is not sorted by length ascending")

    def pack_range(start, stop, L, NS, kernel):
        count = stop - start
        T = -(-count // NS)

        def finish(tiles, seq_index, seq_lengths):
            if kernel in ("cell", "col"):
                tiles = tiles.reshape(T, L, 32, NS // 32)
            buckets.append(
                PackedBucket(
                    L=L, NS=NS, tiles=tiles, seq_index=seq_index,
                    lengths=seq_lengths, kernel=kernel,
                )
            )

        if use_native:
            from ..native import pack_bucket_native

            native = pack_bucket_native(
                np.asarray(chars), offsets, lengths.astype(np.int32),
                start, stop, L, NS, pad=pad_code,
            )
            if native is not None:
                finish(*native)
                return

        tiles = np.full((T, L, NS), pad_code, dtype=np.int8)
        seq_index = np.full((T, NS), -1, dtype=np.int32)
        seq_lengths = np.zeros((T, NS), dtype=np.int32)

        # Fill tiles in slabs to bound temp memory.
        for t0 in range(0, T, slab_tiles):
            t1 = min(t0 + slab_tiles, T)
            a = start + t0 * NS
            b = min(start + t1 * NS, stop)
            slab, sidx, slen = _pack_slab(
                np.asarray(chars), offsets, lengths, a, b, L, NS, pad_code
            )
            tiles[t0:t1] = slab
            seq_index[t0:t1] = sidx
            seq_lengths[t0:t1] = slen

        finish(tiles, seq_index, seq_lengths)

    buckets: list[PackedBucket] = []
    for start, stop, L, NS, kernel in plan_buckets(lengths, edges):
        pack_range(start, stop, L, NS, kernel)

    return PackedDB(
        buckets=buckets,
        num_sequences=n,
        total_real_chars=int(lengths.sum()),
    )


def plan_buckets(lengths, edges=None):
    """Bucket plan for a length-sorted database: list of
    (start, stop, L, NS, kernel) sequence ranges.

    Short part uses fixed fine-grained edges; the long tail (> CELL_MAX_L)
    packs top-down chunks of CELL_SUBJECTS consecutive sequences, each
    padded to a ladder length just above its longest member, with adjacent
    equal-L chunks merged — near-100% lane occupancy where fixed edges
    would burn most of a 4096-subject tile.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    n = len(lengths)
    if edges is None:
        edges = adaptive_edges(n) or DEFAULT_BUCKET_EDGES
    plan: list[tuple] = []
    start = 0
    for edge in [e for e in edges if e <= CELL_MAX_L]:
        stop = int(np.searchsorted(lengths, edge + 1, side="left"))
        if stop > start:
            NS, kernel = choose_bucket_layout(edge, stop - start)
            plan.append((start, stop, edge, NS, kernel))
        start = stop
    if start < n:
        long_start = start
        chunk_runs: list[list] = []  # [lo, hi, L], descending
        i = n
        while i > long_start:
            j = max(long_start, i - CELL_SUBJECTS)
            L = ladder_length(int(lengths[i - 1]))
            if chunk_runs and chunk_runs[-1][2] == L:
                chunk_runs[-1][0] = j
            else:
                chunk_runs.append([j, i, L])
            i = j
        for lo, hi, L in reversed(chunk_runs):
            NS, kernel = choose_bucket_layout(L, hi - lo)
            plan.append((lo, hi, L, NS, kernel))
    return plan


#: Bump when tile layout / bucket selection changes so stale sidecar
#: caches are ignored.
PACK_FORMAT_VERSION = 6

_KERNEL_CODE = {"row": 0, "cell": 1, "col": 2}
_KERNEL_NAME = {v: k for k, v in _KERNEL_CODE.items()}


def _tiles_bin_path(path: str) -> str:
    return path + ".tiles"


def _norm_ranges(ranges, T: int) -> list:
    """Clip tile ranges to [0, T), drop empties, sort and merge
    overlapping/adjacent — the canonical form stored in manifests and
    compared by the coverage checks."""
    rs = sorted((max(0, int(a)), min(T, int(b))) for a, b in ranges)
    out: list = []
    for a, b in rs:
        if a >= b:
            continue
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def _ranges_cover(have: list, need: list) -> bool:
    """True if every range in ``need`` lies inside some range of
    ``have`` (both normalized: sorted, merged)."""
    i = 0
    for a, b in need:
        while i < len(have) and have[i][1] < b:
            i += 1
        if i == len(have) or have[i][0] > a:
            return False
    return True


def _ranges_subtract(need: list, have: list) -> list:
    """Normalized ``need`` minus normalized ``have``: the ranges still
    to be packed when extending a partial store."""
    out = []
    for a, b in need:
        cur = a
        for c, d in have:
            if d <= cur or c >= b:
                continue
            if c > cur:
                out.append((cur, c))
            cur = max(cur, d)
            if cur >= b:
                break
        if cur < b:
            out.append((cur, b))
    return out


def _bucket_meta_arrays(start: int, stop: int, NS: int, lengths):
    """seq_index/lengths [T, NS] for one bucket, computed analytically —
    byte-identical to stitching _pack_slab outputs (slot s of tile t is
    sequence start + t*NS + s; slab boundaries are NS multiples)."""
    cnt = stop - start
    T = -(-cnt // NS)
    sidx = np.full(T * NS, -1, dtype=np.int32)
    sidx[:cnt] = np.arange(start, stop, dtype=np.int32)
    slen = np.zeros(T * NS, dtype=np.int32)
    slen[:cnt] = lengths[start:stop]
    return sidx.reshape(T, NS), slen.reshape(T, NS)


class _store_build_lock:
    """Interprocess lock serialising tile-store builds: on a multi-chip
    host every process calls set_database with the same pack_cache path,
    and without the lock they would duplicate the pack work (the unique
    tmp names + atomic replace already keep the result consistent)."""

    def __init__(self, path: str):
        self._path = path + ".lock"
        self._f = None

    def __enter__(self):
        import fcntl

        self._f = open(self._path, "w")
        try:
            fcntl.flock(self._f, fcntl.LOCK_EX)
        except OSError:
            # e.g. a filesystem without flock support (NFS ENOLCK):
            # close the fd before propagating or it leaks per retry.
            self._f.close()
            self._f = None
            raise
        return self

    def __exit__(self, *exc):
        import fcntl

        fcntl.flock(self._f, fcntl.LOCK_UN)
        self._f.close()
        return False


def save_packed(packed: PackedDB, path: str,
                pad_code: int = UNKNOWN) -> None:
    """Serialize a PackedDB to a disk-backed tile store: a manifest
    (npz: meta, per-bucket info + seq_index/lengths) at ``path`` plus a
    raw int8 tile file at ``path + ".tiles"``.

    Raw tiles (not npz members) make the store memmap-able per bucket, so
    a streaming engine reads tiles from disk instead of holding the whole
    packed DB in host RAM — the analog of the reference's mmap'd DB +
    bounded pinned buffer (/root/reference/src/dbdata.cpp:46-65,
    mmapbuffer.hpp:332-500).
    """
    arrays = {
        "meta": np.array(
            [PACK_FORMAT_VERSION, packed.num_sequences,
             packed.total_real_chars, len(packed.buckets), pad_code],
            dtype=np.int64,
        ),
    }
    offset = 0
    tmp_bin = f"{_tiles_bin_path(path)}.tmp.{os.getpid()}"
    with open(tmp_bin, "wb") as f:
        for i, b in enumerate(packed.buckets):
            arrays[f"b{i}_idx"] = b.seq_index
            arrays[f"b{i}_len"] = b.lengths
            arrays[f"b{i}_info"] = np.array(
                [b.L, b.NS, _KERNEL_CODE[b.kernel], b.num_tiles, offset],
                np.int64,
            )
            f.write(np.ascontiguousarray(b.tiles).tobytes())
            offset += b.tiles.size
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp_bin, _tiles_bin_path(path))
    os.replace(tmp, path)


def load_packed(path: str, expect_sequences: int, expect_chars: int,
                mmap: bool = True, expect_pad: int = UNKNOWN,
                need_ranges=None):
    """Load a tile store written by save_packed / pack_db_to_store;
    returns None if missing or stale (version, database shape, or
    padding-code mismatch).  ``mmap`` True keeps tiles disk-backed
    (bounded RAM, the default); False loads them eagerly.

    ``need_ranges``: per-bucket tile ranges this caller will consume.
    None requires a complete store; "any" accepts any coverage (the
    store-build extension path inspects what is present); otherwise a
    partial per-host store is accepted iff its recorded ranges cover
    the requested ones."""
    if not os.path.exists(path) or not os.path.exists(_tiles_bin_path(path)):
        return None
    try:
        z = np.load(path)
        ver, nseq, nchars, nb, pad = (int(x) for x in z["meta"])
        if (
            ver != PACK_FORMAT_VERSION
            or nseq != expect_sequences
            or nchars != expect_chars
            or pad != expect_pad
        ):
            return None
        if (
            need_ranges is not None
            and not isinstance(need_ranges, str)
            and len(need_ranges) != nb
        ):
            return None
        bin_path = _tiles_bin_path(path)
        total = os.path.getsize(bin_path)
        flat = np.memmap(bin_path, dtype=np.int8, mode="r", shape=(total,))
        buckets = []
        ranges = []
        partial = False
        for i in range(nb):
            L, NS, kk, T, off = (int(x) for x in z[f"b{i}_info"])
            kernel = _KERNEL_NAME[kk]
            rk = f"b{i}_ranges"
            have = (
                _norm_ranges(
                    [tuple(r) for r in z[rk].reshape(-1, 2)], T
                )
                if rk in z.files
                else [(0, T)] if T else []
            )
            ranges.append(have)
            if have != ([(0, T)] if T else []):
                partial = True
            if need_ranges != "any":
                need = (
                    _norm_ranges(need_ranges[i], T)
                    if need_ranges is not None
                    else [(0, T)] if T else []
                )
                if not _ranges_cover(have, need):
                    return None
            shape = (
                (T, L, 32, NS // 32) if kernel in ("cell", "col")
                else (T, L, NS)
            )
            size = T * L * NS
            tiles = flat[off : off + size].reshape(shape)
            if not mmap:
                tiles = np.array(tiles)
            buckets.append(
                PackedBucket(
                    L=L, NS=NS, tiles=tiles,
                    seq_index=z[f"b{i}_idx"], lengths=z[f"b{i}_len"],
                    kernel=kernel,
                )
            )
        return PackedDB(
            buckets=buckets, num_sequences=nseq, total_real_chars=nchars,
            tile_ranges=ranges if partial else None,
        )
    except Exception:
        return None


def stream_manifest(codec: str, pad_code: int, num_sequences: int,
                    total_chars: int, layout, ranges=None) -> dict:
    """The transfer-pack sidecar manifest (single source of truth for
    the three places that write or validate it: pack_db_to_store's
    inline build, build_stream_sidecar, and the engine's lazy
    _build_stream_pack).  ``layout``: iterable of (L, NS, kernel, T).

    ``ranges``: per-bucket tile ranges actually packed (per-host partial
    sidecars); the key is only emitted when coverage is partial, so full
    manifests stay byte-identical to pre-range ones."""
    from ..ops import pack5 as p5

    words_for = p5.CODECS[codec][1]
    man = {
        "version": 2,
        "codec": codec,
        "pad": int(pad_code),
        "num_sequences": int(num_sequences),
        "total_chars": int(total_chars),
        "buckets": [
            {
                "L": int(L), "NS": int(NS), "kernel": kernel,
                "T": int(T), "W": int(words_for(L * NS)),
            }
            for L, NS, kernel, T in layout
        ],
    }
    if ranges is not None:
        Ts = [int(T) for _, _, _, T in layout]
        norm = [_norm_ranges(r, T) for r, T in zip(ranges, Ts)]
        if norm != [[(0, T)] if T else [] for T in Ts]:
            man["ranges"] = [[[int(a), int(b)] for a, b in r]
                             for r in norm]
    return man


def _packed_layout(packed: PackedDB):
    return [(b.L, b.NS, b.kernel, b.num_tiles) for b in packed.buckets]


def stream_sidecar_fresh(path: str, manifest: dict,
                         need_ranges=None) -> bool:
    """True if <path>.pack5/manifest.json matches ``manifest`` (i.e. the
    transfer-pack sidecar is present and valid for this store) AND its
    recorded tile ranges (absent = complete) cover ``need_ranges``
    (None = complete coverage required; "any" = layout match only, the
    extension path's probe).  Comparison ignores each side's "ranges"
    key — coverage, not equality, is the correctness condition."""
    import json

    try:
        with open(os.path.join(path + ".pack5", "manifest.json")) as f:
            stored = json.load(f)
    except (OSError, ValueError):
        return False
    s_ranges = stored.pop("ranges", None)
    expect = {k: v for k, v in manifest.items() if k != "ranges"}
    if stored != expect:
        return False
    if need_ranges == "any":
        return True
    Ts = [int(b["T"]) for b in expect["buckets"]]
    have = (
        [_norm_ranges(r, T) for r, T in zip(s_ranges, Ts)]
        if s_ranges is not None
        else [[(0, T)] if T else [] for T in Ts]
    )
    if need_ranges is None:
        need = [[(0, T)] if T else [] for T in Ts]
    else:
        if len(need_ranges) != len(Ts):
            return False
        need = [_norm_ranges(r, T) for r, T in zip(need_ranges, Ts)]
    return all(_ranges_cover(h, nd) for h, nd in zip(have, need))


def build_stream_sidecar(
    packed: PackedDB, path: str, stream_codec: str,
    pad_code: int = UNKNOWN, slab_tiles: int = 64,
) -> bool:
    """Build the ``<path>.pack5/`` transfer-pack sidecar from an existing
    (memmap-backed) tile store in one bounded-RAM sequential pass —
    the recovery path when the store itself is fresh but the sidecar is
    missing or stale (e.g. makedb ran --prepack first, --prepackStream
    later).  Returns True when the sidecar was written; False on an
    unwritable directory (best-effort, matching the inline build)."""
    import json

    from ..ops import pack5 as p5

    _cpw, words_for, s_pack = p5.CODECS[stream_codec][:3]
    if int(pad_code) > p5.CODECS[stream_codec][5]:
        raise ValueError(
            f"pad code {pad_code} exceeds codec {stream_codec}"
        )
    sidecar = path + ".pack5"
    man_path = os.path.join(sidecar, "manifest.json")
    try:
        os.makedirs(sidecar, exist_ok=True)
        # Invalidate before touching data files (interrupted builds must
        # never leave a manifest that validates mixed-layout data).
        try:
            os.remove(man_path)
        except FileNotFoundError:
            pass
        for bi, b in enumerate(packed.buckets):
            T = b.num_tiles
            if T == 0:
                continue  # loaders skip T==0 buckets without a file
            W = words_for(b.L * b.NS)
            mm = np.memmap(
                os.path.join(sidecar, f"b{bi}.bin"), np.int32,
                mode="w+", shape=(T, W),
            )
            for t0 in range(0, T, slab_tiles):
                t1 = min(t0 + slab_tiles, T)
                s_pack(np.ascontiguousarray(b.tiles[t0:t1]), out=mm[t0:t1])
            del mm
        manifest = stream_manifest(
            stream_codec, pad_code, packed.num_sequences,
            packed.total_real_chars, _packed_layout(packed),
            # A partial raw store packs zero rows for un-owned tiles;
            # the sidecar must claim only what the store really holds.
            ranges=packed.tile_ranges,
        )
        mtmp = os.path.join(sidecar, f"manifest.tmp.{os.getpid()}")
        with open(mtmp, "w") as mf:
            json.dump(manifest, mf)
        os.replace(mtmp, man_path)
        return True
    except (OSError, ValueError):
        return False


def pack_db_to_store(
    db, path: str, edges=None, slab_tiles: int = 64,
    use_native: bool = True, pad_code: int = UNKNOWN,
    stream_codec: str | None = None, tile_ranges=None,
) -> PackedDB:
    """Pack a length-sorted database directly into a disk-backed tile
    store, holding at most one slab (``slab_tiles`` tiles) of tile data
    in RAM at a time — packing a database far larger than host memory.

    ``stream_codec`` (ops/pack5.py codec name): also build the
    ``<path>.pack5/`` transfer-pack sidecar inline, packing each slab
    while it is hot in RAM.  The engine otherwise builds that sidecar
    lazily on the first streaming set_database by re-reading the entire
    raw tile file from disk — at trembl scale a full extra pass over
    ~100 GB.  Best-effort: a sidecar write failure disables it and the
    raw store build continues.

    ``tile_ranges``: per-plan-bucket [(t_start, t_stop), ...] — pack
    only those tiles into a sparse tile file of full logical size (the
    per-host store: on a multi-host streamed scan each process only
    ever reads its own chunk-shard rows, so packing the rest is wasted
    disk and time — the analog of the reference's per-GPU partition
    assignment, cudasw4.cuh:1087-1144).  The manifest records the
    ranges; a later call with more ranges extends the store in place
    (range union, under the build lock — the shared-path multi-process
    layout).  None packs everything.

    Returns the memmap-backed PackedDB (same result as
    ``save_packed(pack_db(db), path); load_packed(path)``, byte-identical
    store within the packed ranges).
    """
    lengths = np.asarray(db.lengths, dtype=np.int64)
    offsets = np.asarray(db.offsets, dtype=np.int64)
    chars = np.asarray(db.chars)
    n = len(lengths)
    if n and not np.all(lengths[1:] >= lengths[:-1]):
        raise ValueError("database is not sorted by length ascending")
    lengths32 = lengths.astype(np.int32)

    # Reusable slab output buffers (the store loop writes each slab to
    # disk immediately, so fresh per-slab allocations only add page
    # faults — measured 24s -> 4.6s pack time on a 5M-seq DB while the
    # write stream keeps the page cache under reclaim pressure).
    bufs = {"tiles": np.empty(0, np.int8), "meta": np.empty(0, np.int32)}

    def pack_slab(a, b, L, NS):
        """[ceil((b-a)/NS)] tiles covering sequences [a, b) (row layout).

        Returns views into shared buffers — consumed (written/copied)
        before the next call."""
        cnt = b - a
        T = -(-cnt // NS)
        if use_native and NS % 64 == 0:  # blocked kernel's subject step
            from ..native import get_lib

            lib = get_lib()
            if lib is not None:
                if bufs["tiles"].size < T * L * NS:
                    bufs["tiles"] = np.empty(T * L * NS, np.int8)
                if bufs["meta"].size < 2 * T * NS:
                    bufs["meta"] = np.empty(2 * T * NS, np.int32)
                tiles = bufs["tiles"][: T * L * NS].reshape(T, L, NS)
                sidx = bufs["meta"][: T * NS].reshape(T, NS)
                slen = bufs["meta"][T * NS : 2 * T * NS].reshape(T, NS)
                lib.tpusw_pack_bucket(
                    chars, offsets, lengths32, a, b, L, NS,
                    tiles, sidx, slen, pad_code,
                )
                return tiles, sidx, slen
        return _pack_slab(chars, offsets, lengths, a, b, L, NS, pad_code)

    plans = plan_buckets(lengths, edges)
    want_layout = [
        (L, NS, kernel, -(-(stop - start) // NS))
        for start, stop, L, NS, kernel in plans
    ]
    Ts = [T for _, _, _, T in want_layout]
    if tile_ranges is not None and len(tile_ranges) != len(plans):
        raise ValueError(
            f"tile_ranges has {len(tile_ranges)} buckets, plan has "
            f"{len(plans)}"
        )
    full_req = [[(0, T)] if T else [] for T in Ts]
    req = (
        [_norm_ranges(r, T) for r, T in zip(tile_ranges, Ts)]
        if tile_ranges is not None
        else full_req
    )
    partial_req = req != full_req

    with _store_build_lock(path):
        # Another process may have built the store while we waited —
        # but only reuse it if its bucket layout matches the requested
        # edges (a store built under different edges/tuning must
        # rebuild, not silently return).
        prior = load_packed(
            path, n, int(lengths.sum()), expect_pad=pad_code,
            need_ranges="any",
        )
        if prior is not None and _packed_layout(prior) == want_layout:
            have = prior.tile_ranges or full_req
            missing = [_ranges_subtract(r, h) for r, h in zip(req, have)]
            if any(missing):
                # Range-union extension: another host's (or an earlier)
                # build packed different tile ranges into this store —
                # pack only the missing ones in place (data first; the
                # manifest publishes the union afterwards, so a crash
                # mid-extension can never claim unwritten tiles).
                del prior  # release the memmap before writing
                return _extend_store(
                    path, plans, Ts, missing, have, req, pack_slab,
                    slab_tiles, stream_codec, pad_code, n,
                    int(lengths.sum()), want_layout,
                )
            # A matching prior store may still lack the requested
            # transfer-pack sidecar (e.g. it was built without a
            # stream_codec).  Build it from the prior's memmap tiles —
            # one bounded-RAM pass — instead of silently skipping it and
            # leaving the first streaming align to re-read the whole raw
            # tile file lazily.
            if stream_codec is not None:
                manifest = stream_manifest(
                    stream_codec, pad_code, n, int(lengths.sum()),
                    _packed_layout(prior),
                )
                if not stream_sidecar_fresh(
                    path, manifest, need_ranges=req
                ):
                    build_stream_sidecar(
                        prior, path, stream_codec, pad_code=pad_code,
                        slab_tiles=slab_tiles,
                    )
            return prior
        # Inline transfer-pack sidecar (same layout + manifest the engine's
        # _build_stream_pack writes/validates: <path>.pack5/b{i}.bin per
        # bucket + manifest.json).  Stale manifests are removed before any
        # data is overwritten so an interrupted build can never validate.
        sidecar = None
        s_pack = s_words = None
        if stream_codec is not None:
            from ..ops import pack5 as p5

            _cpw, s_words, s_pack = p5.CODECS[stream_codec][:3]
            if int(pad_code) > p5.CODECS[stream_codec][5]:
                raise ValueError(
                    f"pad code {pad_code} exceeds codec {stream_codec}"
                )
            sidecar = path + ".pack5"
            try:
                os.makedirs(sidecar, exist_ok=True)
                try:
                    os.remove(os.path.join(sidecar, "manifest.json"))
                except FileNotFoundError:
                    pass
            except OSError:
                sidecar = None  # best-effort, like the engine's lazy build

        arrays = {}
        offset = 0
        nb = 0
        tmp_bin = f"{_tiles_bin_path(path)}.tmp.{os.getpid()}"
        with open(tmp_bin, "wb") as f:
            if partial_req:
                # Per-host store: sparse file of full logical size —
                # same offsets as a complete store, only the requested
                # ranges' blocks ever hit the disk.
                f.truncate(sum(T * L * NS for (_, _, L, NS, _), T
                               in zip(plans, Ts)))
            for (start, stop, L, NS, kernel), rq in zip(plans, req):
                T = -(-(stop - start) // NS)
                pk_mm = None
                if sidecar and T:
                    W = s_words(L * NS)
                    try:
                        pk_mm = np.memmap(
                            os.path.join(sidecar, f"b{nb}.bin"),
                            np.int32, mode="w+", shape=(T, W),
                        )
                    except (OSError, ValueError):
                        sidecar = None
                if partial_req:
                    # seq_index/lengths are metadata-only (no char reads)
                    # and cover the whole bucket even when only some tile
                    # ranges pack — byte-identical to the stitched
                    # pack_slab outputs of a full build.
                    sidx_all, slen_all = _bucket_meta_arrays(
                        start, stop, NS, lengths32
                    )
                    arrays[f"b{nb}_idx"] = sidx_all
                    arrays[f"b{nb}_len"] = slen_all
                    arrays[f"b{nb}_ranges"] = np.asarray(
                        rq, np.int64
                    ).reshape(-1, 2)
                    for t0r, t1r in rq:
                        lo = start + t0r * NS
                        hi = min(stop, start + t1r * NS)
                        for a in range(lo, hi, slab_tiles * NS):
                            b = min(a + slab_tiles * NS, hi)
                            tiles, _, _ = pack_slab(a, b, L, NS)
                            t0 = (a - start) // NS
                            f.seek(offset + t0 * L * NS)
                            f.write(np.ascontiguousarray(tiles).data)
                            if pk_mm is not None and sidecar:
                                try:
                                    s_pack(
                                        tiles,
                                        out=pk_mm[t0 : t0 + len(tiles)],
                                    )
                                except OSError:
                                    sidecar = None
                else:
                    idx_parts, len_parts = [], []
                    for a in range(start, stop, slab_tiles * NS):
                        b = min(a + slab_tiles * NS, stop)
                        tiles, sidx, slen = pack_slab(a, b, L, NS)
                        # zero-copy write straight from the slab buffer
                        f.write(np.ascontiguousarray(tiles).data)
                        if pk_mm is not None and sidecar:
                            t0 = (a - start) // NS
                            try:
                                s_pack(
                                    tiles, out=pk_mm[t0 : t0 + len(tiles)]
                                )
                            except OSError:
                                sidecar = None
                        idx_parts.append(sidx.copy())
                        len_parts.append(slen.copy())
                    arrays[f"b{nb}_idx"] = np.concatenate(idx_parts)
                    arrays[f"b{nb}_len"] = np.concatenate(len_parts)
                arrays[f"b{nb}_info"] = np.array(
                    [L, NS, _KERNEL_CODE[kernel], T, offset], np.int64
                )
                offset += T * L * NS
                nb += 1
        arrays["meta"] = np.array(
            [PACK_FORMAT_VERSION, n, int(lengths.sum()), nb, pad_code],
            np.int64,
        )
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as fm:
            np.savez(fm, **arrays)
        os.replace(tmp_bin, _tiles_bin_path(path))
        os.replace(tmp, path)
        if sidecar:
            # Same manifest the engine validates in _build_stream_pack;
            # written atomically, data-first, so a crash mid-build leaves
            # an invalid (rebuildable) sidecar, never a lying one.
            import json

            manifest = stream_manifest(
                stream_codec, pad_code, n, int(lengths.sum()),
                [
                    (L, NS, kernel, -(-(stop - start) // NS))
                    for start, stop, L, NS, kernel in plans
                ],
                ranges=req if partial_req else None,
            )
            try:
                mtmp = os.path.join(sidecar, f"manifest.tmp.{os.getpid()}")
                with open(mtmp, "w") as mf:
                    json.dump(manifest, mf)
                os.replace(mtmp, os.path.join(sidecar, "manifest.json"))
            except OSError:
                pass
    return load_packed(
        path, n, int(lengths.sum()), expect_pad=pad_code, need_ranges=req
    )


def _extend_store(path, plans, Ts, missing, have, req, pack_slab,
                  slab_tiles, stream_codec, pad_code, n, nchars,
                  want_layout):
    """Pack ``missing`` tile ranges into an existing (sparse) store in
    place and publish the have∪req range union in the manifest.  Called
    under the build lock by pack_db_to_store; data is written before the
    manifest so an interrupted extension never claims unwritten tiles."""
    sc_fresh = False
    e_words = e_pack = None
    if stream_codec is not None:
        from ..ops import pack5 as p5

        _cpw, e_words, e_pack = p5.CODECS[stream_codec][:3]
        # Layout-only probe: a partial sidecar is extendable in place
        # (rows are tile-indexed); its claimed ranges update below.
        sc_fresh = stream_sidecar_fresh(
            path, stream_manifest(
                stream_codec, pad_code, n, nchars, want_layout
            ),
            need_ranges="any",
        )
    with open(_tiles_bin_path(path), "r+b") as f:
        offset = 0
        for bi, ((start, stop, L, NS, kernel), miss, T) in enumerate(
            zip(plans, missing, Ts)
        ):
            pk_mm = None
            if sc_fresh and miss and T:
                try:
                    pk_mm = np.memmap(
                        os.path.join(path + ".pack5", f"b{bi}.bin"),
                        np.int32, mode="r+", shape=(T, e_words(L * NS)),
                    )
                except (OSError, ValueError):
                    # A half-extended sidecar must not keep validating:
                    # drop the manifest so the tail path rebuilds it.
                    sc_fresh = False
                    try:
                        os.remove(
                            os.path.join(path + ".pack5", "manifest.json")
                        )
                    except OSError:
                        pass
            for t0r, t1r in miss:
                lo = start + t0r * NS
                hi = min(stop, start + t1r * NS)
                for a in range(lo, hi, slab_tiles * NS):
                    b = min(a + slab_tiles * NS, hi)
                    tiles, _, _ = pack_slab(a, b, L, NS)
                    t0 = (a - start) // NS
                    f.seek(offset + t0 * L * NS)
                    f.write(np.ascontiguousarray(tiles).data)
                    if pk_mm is not None:
                        e_pack(tiles, out=pk_mm[t0 : t0 + len(tiles)])
            del pk_mm
            offset += T * L * NS
    z = np.load(path)
    arrays = {k: z[k] for k in z.files}
    for i, (h, r) in enumerate(zip(have, req)):
        arrays[f"b{i}_ranges"] = np.asarray(
            _norm_ranges(list(h) + list(r), Ts[i]), np.int64
        ).reshape(-1, 2)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fm:
        np.savez(fm, **arrays)
    os.replace(tmp, path)
    if sc_fresh:
        # The sidecar's claims grow by exactly the rows written here —
        # its prior coverage may be narrower than the raw store's (e.g.
        # a lazily built per-host sidecar), so union against ITS ranges.
        import json

        man_path = os.path.join(path + ".pack5", "manifest.json")
        try:
            with open(man_path) as mf:
                sc_have = json.load(mf).get("ranges")
            sc_have = (
                [_norm_ranges([tuple(x) for x in r], T)
                 for r, T in zip(sc_have, Ts)]
                if sc_have is not None
                else [[(0, T)] if T else [] for T in Ts]
            )
            union = [
                _norm_ranges(list(h) + list(m), T)
                for h, m, T in zip(sc_have, missing, Ts)
            ]
            mtmp = f"{man_path}.tmp.{os.getpid()}"
            with open(mtmp, "w") as mf:
                json.dump(
                    stream_manifest(
                        stream_codec, pad_code, n, nchars,
                        want_layout, ranges=union,
                    ),
                    mf,
                )
            os.replace(mtmp, man_path)
        except (OSError, ValueError):
            pass  # stale claims under-report; the next check rebuilds
    out = load_packed(
        path, n, nchars, expect_pad=pad_code, need_ranges=req
    )
    if stream_codec is not None and not sc_fresh and out is not None:
        # Sidecar absent or stale for this layout: (re)build it whole —
        # unwritten sparse regions pack as zero rows that the chunk
        # sharding never ships off-host.
        build_stream_sidecar(
            out, path, stream_codec, pad_code=pad_code,
            slab_tiles=slab_tiles,
        )
    return out


def unpack_tile_sequences(bucket: PackedBucket, tile: int) -> list[np.ndarray]:
    """Inverse of packing for one tile (test helper): real sequences only."""
    tiles = bucket.tiles[tile]
    if tiles.ndim == 3:  # cell layout [L, 32, NS//32] -> [L, NS]
        tiles = tiles.reshape(bucket.L, bucket.NS)
    out = []
    for s in range(bucket.NS):
        if bucket.seq_index[tile, s] < 0:
            continue
        ln = int(bucket.lengths[tile, s])
        out.append(tiles[:ln, s].copy())
    return out
