"""Search engine: database residency, per-query scan, top-N merge, stats.

The TPU-native analog of the reference's ``CudaSW4`` orchestrator class
(/root/reference/src/cudasw4.cuh:244-2454).  Where the reference juggles
per-GPU working sets, copy plans, streams and a kernel dispatch table, the
XLA version is one jitted scan function per database: every bucket's tiles
are resident device arrays, the per-bucket Pallas kernels + masking + a
single ``lax.top_k`` fuse into one compiled program, and XLA's async
dispatch replaces the stream machinery.

Scan flow (mirrors cudasw4.cuh:1312-1488 behaviourally):
  encode query -> per-bucket kernel -> concat scores (slot order = global
  length-sorted reference id order) -> mask padding slots -> top_k ->
  gather reference ids -> host.
GCUPS accounting matches makeBenchmarkStats (cudasw4.cuh:2264-2271):
queryLength x sum(real db lengths) / 1e9 / seconds.
"""

from __future__ import annotations

import functools
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def enable_persistent_compilation_cache(path: str | None = None) -> None:
    """Cache compiled kernels on disk (the per-bucket kernel zoo is the
    analog of the reference's precompiled template instantiations).

    Opt-in via the CUDASW4_TPU_CACHE env var: on tunneled/remote-compile
    platforms the serialization round-trip can make first compiles *slower*,
    so the CLI only enables it when the user asks for it.
    """
    path = path or os.environ.get("CUDASW4_TPU_CACHE")
    if not path:
        return
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from .constants import encode
from .db.format import DBData
from .db.packing import PackedDB, pack_db
from .engine_streaming import StreamingEngineMixin
from .ops import bucket_kind, score_bucket, sw_pallas, sw_pallas_cell, sw_pallas_col

from .substitution import ScoringConfig, make_scoring_config


@dataclass
class BenchmarkStats:
    seconds: float = 0.0
    gcups: float = 0.0
    num_overflows: int = 0  # top-k hits that saturated int16 state and
    #                         were re-scored exactly with int32 state


@dataclass
class ScanResult:
    scores: list[int] = field(default_factory=list)
    reference_ids: list[int] = field(default_factory=list)
    stats: BenchmarkStats = field(default_factory=BenchmarkStats)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


#: Fused-batch-program DP-work cap, in cells = (batch query rows) x
#: (cell-bucket chars).  Above it the batch path dispatches each cell
#: bucket as its own program (see _build_batch_scan_fn): a single fused
#: program executing for minutes kills the TPU worker — chip-bisected
#: on the 5M-seq mixed-length config (~2.7e13 cells, ~100+ s, 17 fused
#: cell kernels -> "TPU worker crashed or restarted"), while the
#: ~1.4e13-cell sweep-config programs (~46 s) have always been stable.
BATCH_SPLIT_CELLS = int(float(
    os.environ.get("CUDASW4_TPU_BATCH_SPLIT_CELLS", 2e13)
))


class SearchEngine(StreamingEngineMixin):
    """One-chip database search engine (multi-chip lives in parallel/;
    the streaming pipeline for DBs beyond device memory lives in
    engine_streaming.py)."""

    def __init__(
        self,
        scoring: ScoringConfig | None = None,
        num_top: int = 10,
        backend: str = "auto",
        qcap: int = sw_pallas.QCAP,
        bucket_edges=None,
        mesh=None,
        max_device_bytes: int | None = None,
        stream_chunk_bytes: int = 256 << 20,
        max_batch_sequences: int | None = None,
        verbose: bool = False,
        warmup: bool = False,
    ):
        self.scoring = scoring or make_scoring_config("blosum62")
        self.num_top = num_top
        self.qcap = qcap
        self.bucket_edges = bucket_edges
        self.mesh = mesh  # jax.sharding.Mesh for DB-sharded multi-chip scans
        self.max_device_bytes = max_device_bytes
        self.stream_chunk_bytes = stream_chunk_bytes
        self.max_batch_sequences = max_batch_sequences
        # Pre-execute program shapes at set_database time (--warmup; see
        # warmup()).  Interactive mode turns this on by default.
        self.warmup_on = warmup
        self.streaming = False
        # int16 DP state + overflow escalation (the reference's dpx_s16
        # model).  Off by default: on v5e the i16<->i32 pack/unpack costs
        # more than the halved VMEM traffic saves (measured 1.45x slower);
        # kept as an opt-in experiment for other TPU generations.
        self.state16 = os.environ.get("CUDASW4_TPU_STATE16", "0") == "1"
        # CPU-oracle verifier (the analog of the reference's
        # -DCUDASW_DEBUG_CHECK_CORRECTNESS build,
        # /root/reference/src/cudasw4.cuh:728-756):
        #   CUDASW4_TPU_DEBUG_CHECK=1    re-score each scan's top-N on the
        #                                scalar oracle (usable on real DBs);
        #   CUDASW4_TPU_DEBUG_CHECK=full diff EVERY database score against
        #                                the vectorized oracle, forcing
        #                                num_top to the DB size exactly like
        #                                the reference (cudasw4.cuh:881-887).
        dc = os.environ.get("CUDASW4_TPU_DEBUG_CHECK", "0")
        self.debug_check = (
            None if dc in ("", "0") else
            ("full" if dc.lower() == "full" else "top")
        )
        # Below this many tile bytes a raw transfer beats the
        # pack+unpack round trip (tests lower it to cover the packed
        # resident path on tiny fixtures).
        self._resident_pack_min = 1 << 20
        qbs = os.environ.get("CUDASW4_TPU_QB_STREAM")
        if qbs:
            # May be lowered below QB_MAX (memory-tight hosts shrink the
            # (QB, qcap) query block); scan_batch caps against _qb_cap.
            # Garbage values are ignored (fail closed, like the codec
            # env knob) rather than crashing engine construction.
            try:
                self.QB_STREAM = max(1, int(qbs))
            except ValueError:
                pass
        self.verbose = verbose
        platform = jax.devices()[0].platform
        if backend == "auto":
            backend = "pallas" if platform == "tpu" else "jnp"
        self.backend = backend
        if self.backend == "pallas":
            # Measured per-generation geometry is the DEFAULT, like the
            # reference's baked dispatch table (cudasw4.cuh:1767-1800);
            # an explicit --tuning / CUDASW4_TPU_TUNING wins, opt out
            # with CUDASW4_TPU_AUTO_TUNING=0.
            from .db.packing import auto_apply_tuning

            auto_apply_tuning(
                jax.devices()[0].device_kind, verbose=self.verbose
            )
        # Alphabet padding code: 20 classic, 25 full-blosum (a dedicated
        # code whose matrix row is all-negative — padding must never be
        # able to raise a local-alignment score).
        self._pad = self.scoring.pad_code
        self.db: DBData | None = None
        self.packed: PackedDB | None = None
        self._scan_fn = None
        self._batch_scan_fn = None
        self._total_t0 = None
        self._total_cells = 0.0

    # ------------------------------------------------------------------ DB

    def set_database(self, db: DBData, pack_cache: str | None = None) -> None:
        """Pack and make the database resident.  ``pack_cache``: optional
        sidecar path — packed tiles load from it when fresh and are saved
        to it after packing (pack once per database, not per process)."""
        t0 = time.perf_counter()
        self.db = db
        if self.debug_check == "full" and self.num_top < db.num_sequences:
            # The reference's debug build forces numTop to the DB size so
            # the comparison covers every score (cudasw4.cuh:881-887).
            self.num_top = int(db.num_sequences)
        self._batch_scan_fn = None
        self.streaming = False
        self.packed = None
        # Always drop a previous DB's pinned prefix and packed transfer
        # store: a second set_database that lands on the non-streaming
        # branch must not keep ~budget bytes of stale device arrays (or
        # gigabytes of packed temp memmaps) alive.
        self._resident_chunks = []
        self._res_tiles = {}
        self._stream_pack = None
        self._stream_codec = None
        # ... and the previous DB's fully-resident tile arrays: a second
        # set_database landing on a different branch (e.g. resident ->
        # streaming) must not keep ~0.7x HBM of dead tiles pinned.
        self._bucket_tiles = []
        self._sharded_tiles = None
        self._sharded_idx = None
        self._scan_fn_inner = None
        if pack_cache:
            from .db.packing import (
                load_packed,
                pack_db_to_store,
                plan_buckets,
            )

            # Pre-compute the streaming decision from the bucket plan (no
            # packing required) so the transfer-pack sidecar builds inline
            # with the store — one pass while each slab is hot in RAM,
            # instead of a later full re-read of the raw tile file — and,
            # multiprocess, so the store can be per-host: only the tile
            # ranges this process's chunk shards consume are packed
            # (sparse full-offset file; kill switch
            # CUDASW4_TPU_HOST_RANGES=0).
            stream_codec = None
            tile_ranges = None
            try:
                plans = plan_buckets(
                    np.asarray(db.lengths, np.int64), self.bucket_edges
                )
                padded = sum(
                    (-(-(stop - start) // NS)) * L * NS
                    for start, stop, L, NS, _ in plans
                )
                if padded > self._device_budget() * self._mesh_ndev():
                    from .ops.pack5 import choose_codec

                    stream_codec = choose_codec(
                        os.environ.get("CUDASW4_TPU_STREAM_PACK", "1"),
                        int(self._pad),
                    )
                    if os.environ.get(
                        "CUDASW4_TPU_HOST_RANGES", "1"
                    ) == "1":
                        tile_ranges = self._host_tile_ranges(
                            plans, self._mesh_ndev()
                        )
            except (ValueError, TypeError):
                pass  # unsorted/odd metadata: raw store build decides
            self.packed = load_packed(
                pack_cache, db.num_sequences, int(np.sum(db.lengths)),
                expect_pad=self._pad, need_ranges=tile_ranges,
            )
            if self.packed is not None and self.verbose:
                print(f"Loaded packed tiles from {pack_cache}")
        if self.packed is None and pack_cache:
            # Pack straight into the disk-backed tile store: bounded host
            # RAM (one slab in flight) and the result is memmap-backed, so
            # streaming scans read tiles from disk, not RAM.
            try:
                self.packed = pack_db_to_store(
                    db, pack_cache, edges=self.bucket_edges,
                    pad_code=self._pad, stream_codec=stream_codec,
                    tile_ranges=tile_ranges,
                )
            except OSError:
                self.packed = None  # read-only db dir: cache is best-effort
        if self.packed is None:
            self.packed = pack_db(
                db, edges=self.bucket_edges, pad_code=self._pad
            )
        self._matrix_flat = jnp.asarray(
            self.scoring.matrix.astype(np.int32).reshape(-1)
        )
        self._matrix_f32 = jnp.asarray(self.scoring.matrix, dtype=jnp.float32)
        self._stream_fns = {}
        ndev = self._mesh_ndev()
        if (
            getattr(self.packed, "tile_ranges", None)
            and not self._db_exceeds_device_memory(ndev)
        ):
            # Plan/budget drift: the engine decided *resident* after all,
            # whose tile->device layout differs from the streamed
            # chunk-shard rows the partial per-host store was built for —
            # extend the store to full coverage before any tile is read.
            from .db.packing import pack_db_to_store as _pdts

            self.packed = _pdts(
                db, pack_cache, edges=self.bucket_edges,
                pad_code=self._pad,
            )
        if self._db_exceeds_device_memory(ndev):
            # DBs beyond (per-chip budget x mesh size) stream host->HBM per
            # scan, the analog of the reference's batched copy pipeline
            # (cudasw4.cuh:1490+, double-buffered via XLA async dispatch).
            # On a mesh each streamed chunk's tile axis is sharded, so every
            # chip scores its slice of every chunk — the trembl-scale
            # configuration (DB >> aggregate HBM).
            self.streaming = True
            self._scan_fn = None
            if ndev > 1:
                from jax.sharding import NamedSharding, PartitionSpec

                self._chunk_sharding = NamedSharding(
                    self.mesh, PartitionSpec(self.mesh.axis_names[0])
                )
            from .ops.pack5 import choose_codec

            self._stream_pack = None
            self._stream_codec = choose_codec(
                os.environ.get("CUDASW4_TPU_STREAM_PACK", "1"),
                int(self._pad),
            )
            # Residency first: the transfer pack can then skip the
            # pinned prefix (those rows never stream).
            self._load_resident_prefix(ndev)
            if self._stream_codec:
                # Serialize sidecar builds across processes sharing the
                # pack_cache (a multi-chip host runs one engine process
                # per chip): the freshness check inside
                # _build_stream_pack runs under the lock, turning
                # waiters into fast loads.  Only lock *acquisition*
                # falls back lockless (read-only dir / no-flock fs) —
                # build errors must propagate, not retrigger an
                # unlocked rebuild.
                import contextlib

                from .db.packing import _store_build_lock

                lock = contextlib.nullcontext()
                if pack_cache:
                    try:
                        lock = _store_build_lock(pack_cache + ".pack5.build")
                        lock.__enter__()
                    except OSError:
                        lock = contextlib.nullcontext()
                        lock.__enter__()
                try:
                    self._stream_pack = self._build_stream_pack(pack_cache)
                finally:
                    lock.__exit__(None, None, None)
            if self.verbose:
                print("Database exceeds device memory budget: streaming mode")
        elif ndev > 1:
            self._scan_fn = self._build_sharded_scan_fn()
        else:
            self._bucket_tiles = self._upload_bucket_tiles()
            # Slot -> global reference id map, concatenated in bucket order.
            flat_idx = np.concatenate(
                [b.seq_index.reshape(-1) for b in self.packed.buckets]
            ) if self.packed.buckets else np.zeros(0, np.int32)
            self._flat_idx = jnp.asarray(flat_idx)
            self._valid = jnp.asarray(flat_idx >= 0)
            self._scan_fn = self._build_scan_fn()
        if self.verbose:
            dt = time.perf_counter() - t0
            print(
                f"Database ready: {self.packed.num_sequences} sequences, "
                f"{self.packed.total_real_chars} residues, "
                f"{len(self.packed.buckets)} buckets, pack time {dt:.2f}s"
            )
        if self.warmup_on:
            if self.verbose:
                print(
                    "Warming kernel programs (first-time compile/load; "
                    "cold caches can take minutes)..."
                )
            self.warmup()

    def warmup(self) -> int:
        """Pre-execute the compiled program shapes this database can
        trigger for single scans, so no user query pays first-execution
        costs.  Returns the number of programs warmed.

        Rationale (docs/PERFORMANCE.md "fused big-state crash"): on
        remote-compile platforms the server-side load of a program
        containing a >=64 MB-VMEM-scratch column kernel stalls 80-750 s
        at FIRST execution — so a fresh process's first long query
        (including the reference's latency-sensitive interactive mode,
        /root/reference/src/main.cu:336-424, where all compilation
        happened at build time and first-query latency is never
        pathological) can silently hang for minutes.  The engine knows
        every shape at set_database time: the per-kinds fused scan
        programs (minimal row counts — DP loops stop at the dummy row
        count, so this costs per-tile fixed overhead only) and, for
        each column bucket, the chunked-carry group/boundary variants a
        query beyond the NQC row pool dispatches.

        Streaming and mesh databases warm their common path via one
        tiny scan (per-chunk program shapes are dispatch-driven there);
        the chunked long-query variants are only enumerable on the
        single-chip resident path."""
        if self.packed is None:
            raise RuntimeError("set_database() must be called first")
        t0 = time.perf_counter()
        n = 0
        if self.streaming or self._mesh_ndev() > 1:
            self.scan([0])
            if self.verbose:
                print(
                    f"warmup: 1 {'streaming' if self.streaming else 'mesh'}"
                    f" scan pass ({time.perf_counter() - t0:.1f}s)"
                )
            return 1
        if self.backend != "pallas" or not self.packed.buckets:
            return 0
        qpad, params = self._single_qpad(np.zeros(1, np.int8))
        kinds_base = tuple(bucket_kind(b) for b in self.packed.buckets)
        exact = not self.state16
        for kds in dict.fromkeys(
            (kinds_base, self._single_kinds(self.COL_SINGLE_MIN_ROWS))
        ):
            np.asarray(self._scan_fn_inner(
                jnp.asarray(qpad), jnp.asarray(params),
                tuple(self._bucket_tiles), self._valid, self._flat_idx,
                self._matrix_flat, self._matrix_f32,
                exact=exact, kinds=kds,
            )[0])
            n += 1
            if self.verbose:
                print(
                    f"warmup: scan program {n} "
                    f"({time.perf_counter() - t0:.1f}s)"
                )
        any_col = False
        for tiles, b in zip(self._bucket_tiles, self.packed.buckets):
            if bucket_kind(b) != "col":
                continue
            any_col = True
            n += self._warmup_col_chunked(tiles, t0)
        if any_col:
            # The chunked long-query branch dispatches noncol_fn and
            # finish_fn as separate programs — pre-execute them with
            # minimal inputs (shapes match the real branch exactly).
            noncol_tiles = tuple(
                t for t, b in zip(self._bucket_tiles, self.packed.buckets)
                if bucket_kind(b) != "col"
            )
            parts = list(self._noncol_fn(
                jnp.asarray(qpad), jnp.asarray(params), noncol_tiles,
                self._matrix_flat, self._matrix_f32, exact=exact,
            ))
            pi = iter(parts)
            full = tuple(
                next(pi).reshape(-1)
                if bucket_kind(b) != "col"
                else jnp.zeros(t.shape[0] * t.shape[2] * t.shape[3],
                               jnp.float32)
                for t, b in zip(self._bucket_tiles, self.packed.buckets)
            )
            np.asarray(self._finish_fn(
                full, self._valid, self._flat_idx
            )[0])
            n += 2
            if self.verbose:
                print(
                    "warmup: long-query merge programs "
                    f"({time.perf_counter() - t0:.1f}s)"
                )
        if self.verbose:
            print(
                f"warmup: {n} programs in {time.perf_counter() - t0:.1f}s"
            )
        return n

    def _warmup_col_chunked(self, tiles, t0) -> int:
        """Warm the chunked-query column programs one bucket's tiles can
        dispatch (score_bucket_col_any_query's group/boundary variants),
        each with a minimal dummy row count."""
        from .ops import INTERPRET

        T, L, g, nsl = tiles.shape
        per_tile_state = 2 * L * g * nsl * 4
        tc = max(
            1, min(T, sw_pallas_col.COL_CARRY_TEMP_BYTES // per_tile_state)
        )
        cu = sw_pallas_col.DEFAULT_UNROLL
        qpad = np.full(sw_pallas_col.NQC, self._pad, dtype=np.int32)
        pc = jnp.asarray(np.array(
            [cu, self.scoring.gop, self.scoring.gex, 0], np.int32
        ))
        qdev = jnp.asarray(qpad)
        groups = [min(tc, T)]
        if tc < T and T % tc:
            groups.append(T % tc)
        n = 0
        for gt in groups:
            sub = tiles[:gt]
            zstate = (
                jnp.zeros((gt, L, g, nsl), jnp.int32),
                jnp.zeros((gt, L, g, nsl), jnp.int32),
            )
            for take, emit in ((False, True), (True, True), (True, False)):
                res = sw_pallas_col.score_bucket_pallas_col(
                    sub, qdev, self._matrix_flat, pc,
                    state_in=zstate if take else None, take_init=take,
                    emit_state=emit, interpret=INTERPRET,
                    # unroll is a STATIC jit arg: pass the resolved value
                    # the real path passes (score_bucket_col_any_query
                    # resolves None before calling), or the warmed cache
                    # entry would not be the one real queries hit.
                    unroll=cu, exact=True,
                )
                np.asarray(res[0] if emit else res)
                n += 1
                if self.verbose:
                    print(
                        f"warmup: col L={L} tiles={gt} take={int(take)} "
                        f"emit={int(emit)} "
                        f"({time.perf_counter() - t0:.1f}s)"
                    )
        return n

    @property
    def results_per_query(self) -> int:
        n = self.packed.num_sequences if self.packed else 0
        return max(0, min(self.num_top, n))

    def num_sequences(self) -> int:
        return self.packed.num_sequences if self.packed else 0

    def get_reference_header(self, ref_id: int) -> str:
        return self.db.get_header(int(ref_id))

    def get_reference_length(self, ref_id: int) -> int:
        return int(self.db.lengths[int(ref_id)])

    def get_reference_sequence(self, ref_id: int) -> str:
        from .constants import decode

        return decode(self.db.get_sequence(int(ref_id)))

    # ---------------------------------------------------------------- scan

    #: Single-scan queries with at least this many (unroll-padded) rows
    #: route cell-layout buckets through the COLUMN kernel when they fit
    #: one NQC pass: the col kernel amortises its loop-entry cost over
    #: the whole row pool where the cell kernel pays it per query row —
    #: measured +1.3% at q=512 rising to +3.6% at q=3072 on v5e, but
    #: LOSING 1.5-5.3% beyond NQC (the chunked boundary carry), so the
    #: routing window is [COL_SINGLE_MIN_ROWS, NQC] (tools/bigsingle.py).
    #: The per-(bucket, querylength) choice is the analog of the
    #: reference's partId dispatch (/root/reference/src/cudasw4.cuh:1767).
    COL_SINGLE_MIN_ROWS = 512

    def _single_kinds(self, nq_pad: int) -> tuple:
        kds = []
        for b in self.packed.buckets:
            kd = bucket_kind(b)
            if (
                kd == "cell"
                and self.backend == "pallas"
                and self.COL_SINGLE_MIN_ROWS <= nq_pad <= sw_pallas_col.NQC
                and b.L % sw_pallas_col.LC == 0
            ):
                kd = "col"
            kds.append(kd)
        return tuple(kds)

    def _build_scan_fn(self):
        # NOTE: all database arrays are passed as jit *arguments* — closing
        # over them would bake them into the lowered module as constants
        # (multi-minute lowering and a program as large as the DB).
        kinds = tuple(bucket_kind(b) for b in self.packed.buckets)
        use_pallas = self.backend == "pallas"
        k = self.results_per_query

        def topk(parts, valid, flat_idx):
            if not parts:
                return (jnp.zeros((0,), jnp.float32), jnp.zeros((0,), jnp.int32))
            allscores = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
            allscores = jnp.where(valid, allscores, -1.0)
            # k == 0 (reference --top 0) must still execute the kernels, so
            # the jit always returns >=1 result (empty outputs would let XLA
            # dead-code-eliminate the whole scan); scan() slices to k.
            vals, idx = jax.lax.top_k(allscores, max(1, k))
            return vals, jnp.take(flat_idx, idx)

        @functools.partial(jax.jit, static_argnames=("exact", "kinds"))
        def scan_fn(qpad, params, bucket_tiles, valid, flat_idx, mat_flat,
                    mat_f32, exact=False, kinds=kinds):
            parts = []
            tmaxes = []
            for tiles, kind in zip(bucket_tiles, kinds):
                s = score_bucket(
                    tiles, qpad, mat_flat, mat_f32, params, use_pallas,
                    kind, exact=exact,
                )
                parts.append(s.reshape(-1))
                if not exact:
                    # Per-tile max: >= SAT marks the tile as holding a
                    # saturated int16 score — the overflow *set* the
                    # exact pass re-scores (the reference records
                    # overflowed ids, float_kernels.cuh:1189-1260; our
                    # re-dispatch granule is the tile).
                    tmaxes.append(jnp.max(s, axis=1))
            vals, ids = topk(parts, valid, flat_idx)
            return vals, ids, tuple(tmaxes)

        @functools.partial(jax.jit, static_argnames=("exact",))
        def noncol_fn(qpad, params, tiles_tuple, mat_flat, mat_f32,
                      exact=False):
            return tuple(
                score_bucket(
                    tiles, qpad, mat_flat, mat_f32, params, use_pallas,
                    kind, exact=exact,
                )
                for tiles, kind in zip(
                    tiles_tuple, [kd for kd in kinds if kd != "col"]
                )
            )

        @jax.jit
        def finish_fn(parts, valid, flat_idx):
            return topk(list(parts), valid, flat_idx)

        # Stashed for warmup(): pre-executing a kinds variant needs the
        # inner jitted fn with kinds forced while the row count stays
        # minimal (run() derives kinds from the row count).  noncol_fn
        # and finish_fn are the chunked long-query branch's own
        # programs — on remote-compile platforms even small programs
        # pay several seconds of server-side load at first execution,
        # so warmup pre-executes them too.
        self._scan_fn_inner = scan_fn
        self._noncol_fn = noncol_fn
        self._finish_fn = finish_fn

        def run(qpad, params, codes=None, exact=False):
            nq_pad = int(params[3])
            if (
                use_pallas
                and nq_pad > sw_pallas_col.NQC
                and any(kd == "col" for kd in kinds)
            ):
                # Queries beyond the column kernel's row capacity: col
                # buckets chunk the query with H/F boundary carry (the
                # reference's multi-pass temp analog); the rest run in
                # one jit as usual.
                noncol_tiles = tuple(
                    t for t, kd in zip(self._bucket_tiles, kinds)
                    if kd != "col"
                )
                # Program-size cap (see BATCH_SPLIT_CELLS): a 4-8k-row
                # query over a near-HBM-capacity database would make
                # the fused noncol program execute for minutes and kill
                # the TPU worker; dispatch per bucket above the cap.
                noncol_chars = sum(
                    int(np.prod(t.shape)) for t in noncol_tiles
                )
                if nq_pad * noncol_chars > BATCH_SPLIT_CELLS:
                    noncol_parts = iter([
                        score_bucket(
                            t, qpad, self._matrix_flat, self._matrix_f32,
                            params, use_pallas, kd, exact=exact,
                        )
                        for t, kd in zip(self._bucket_tiles, kinds)
                        if kd != "col"
                    ])
                else:
                    noncol_parts = iter(
                        noncol_fn(
                            qpad, params, noncol_tiles,
                            self._matrix_flat, self._matrix_f32,
                            exact=exact,
                        )
                    )
                from .ops import INTERPRET

                parts = []
                tmaxes = []
                for tiles, kd in zip(self._bucket_tiles, kinds):
                    if kd == "col":
                        s = sw_pallas_col.score_bucket_col_any_query(
                            tiles, codes, self._matrix_flat,
                            self.scoring.gop, self.scoring.gex,
                            exact=exact, interpret=INTERPRET,
                            pad=self._pad,
                        )
                    else:
                        s = next(noncol_parts)
                    parts.append(s.reshape(-1))
                    if not exact:
                        tmaxes.append(jnp.max(s, axis=1))
                vals, ids = finish_fn(
                    tuple(parts), self._valid, self._flat_idx
                )
                return vals, ids, tuple(tmaxes) if not exact else None
            return scan_fn(
                qpad,
                params,
                tuple(self._bucket_tiles),
                self._valid,
                self._flat_idx,
                self._matrix_flat,
                self._matrix_f32,
                exact=exact,
                # Per-query-length kernel routing (COL_SINGLE_MIN_ROWS):
                # long-but-one-pass singles run cell-layout buckets on
                # the column kernel.  A handful of kinds variants ->
                # a handful of compiled programs.
                kinds=(
                    self._single_kinds(nq_pad) if use_pallas else kinds
                ),
            )

        return run

    def _build_sharded_scan_fn(self):
        from .parallel import sharding as sh

        mesh = self.mesh
        ndev = len(mesh.devices.flat)
        sh.pad_tiles_for_mesh(self.packed, ndev, pad=self._pad)
        tiles, seq_idx, _ = sh.shard_bucket_arrays(
            self.packed, mesh, codec=self._resident_codec(),
            pack_min=self._resident_pack_min,
        )
        self._sharded_tiles = tiles
        self._sharded_idx = seq_idx
        kinds = tuple(bucket_kind(b) for b in self.packed.buckets)
        use_pallas = self.backend == "pallas"
        k = self.results_per_query
        fns = {}

        def run(qpad, params, codes=None, exact=False):
            nq = int(params[0])
            # The cell kernel's query is a scalar-prefetch operand, so it
            # accepts any SMEM-fitting length (the caller pads qpad up);
            # only beyond QCAP_MAX — or on the legacy row kernel — do
            # buckets take the portable scorer.  Col buckets never
            # degrade: queries beyond the column kernel's row capacity
            # chunk with shard-local H/F boundary carry.
            kds = kinds
            if nq > self.qcap:
                kds = tuple(
                    "jnp"
                    if kd == "row"
                    or (kd == "cell" and nq > sw_pallas_cell.QCAP_MAX)
                    else kd
                    for kd in kinds
                )
            if use_pallas:
                # Same per-query-length routing as the single-chip path
                # (COL_SINGLE_MIN_ROWS): one-pass-long singles score
                # cell-layout buckets on the column kernel.
                nq_pad0 = int(params[3])
                if (
                    self.COL_SINGLE_MIN_ROWS
                    <= nq_pad0
                    <= sw_pallas_col.NQC
                ):
                    kds = tuple(
                        "col"
                        if kd == "cell" and b.L % sw_pallas_col.LC == 0
                        else kd
                        for kd, b in zip(kds, self.packed.buckets)
                    )
            if (
                use_pallas
                and int(params[3]) > sw_pallas_col.NQC
                and any(kd == "col" for kd in kds)
            ):
                qchunks, pcs = sh.make_query_chunks(
                    codes, self.scoring.gop, self.scoring.gex,
                    pad=self._pad,
                )
                key = ("chunked", len(qchunks), kds, exact)
                if key not in fns:
                    fns[key] = sh.build_sharded_scan_chunked(
                        mesh, kds, use_pallas, k, len(qchunks), exact=exact
                    )
                out = fns[key](
                    qchunks, pcs, qpad, params, tiles, seq_idx,
                    self._matrix_flat, self._matrix_f32,
                )
                if exact:
                    return out[0], out[1], None
                # Replicated per-tile maxes: >= SAT marks the tile for
                # the exact mesh overflow pass (same granularity as the
                # single-chip path).
                return out[0], out[1], tuple(out[2])
            key = (kds, exact)
            if key not in fns:
                fns[key] = sh.build_sharded_scan(
                    mesh, kds, use_pallas, k, exact=exact
                )
            out = fns[key](
                qpad, params, tiles, seq_idx,
                self._matrix_flat, self._matrix_f32,
            )
            if exact:
                return out[0], out[1], None
            return out[0], out[1], tuple(out[2])

        return run

    def _single_qpad(self, codes):
        """Padded query block + params for a single (non-batch) scan.

        Pallas kernels stop their DP loops at nq, so the full-qcap pad
        is free on TPU and buys a single compiled program.  The
        portable jnp scorer walks every padded row, so on that backend
        pad to 256-granular tight length instead (CPU retraces are
        cheap; 8192-row pads measured a ~16x tax on CPU scans).
        """
        nq = len(codes)
        qlen = (
            self.qcap
            if self.backend == "pallas"
            else min(self.qcap, max(256, _round_up(nq, 256)))
        )
        qpad = np.full(qlen, self._pad, dtype=np.int32)
        qpad[:nq] = codes
        # Column-kernel row count, padded to the (tunable) unroll granule.
        cu = sw_pallas_col.DEFAULT_UNROLL
        nq_pad = max(cu, -(-nq // cu) * cu)
        params = np.array(
            [nq, self.scoring.gop, self.scoring.gex, nq_pad], dtype=np.int32
        )
        return qpad, params

    def scan(self, sequence) -> ScanResult:
        """Search one query against the resident database."""
        if self.packed is None:
            raise RuntimeError("set_database() must be called before scan()")
        codes = encode(sequence) if isinstance(sequence, (str, bytes)) else np.asarray(sequence, np.int8)
        nq = len(codes)
        if self.streaming:
            # Streaming scans share the batched streaming pipeline (one
            # entry point for any query length; always exact int32 state —
            # streaming is transfer-bound, so the int16 experiment would
            # only add a second full DB stream on overflow).
            result = self._scan_streaming_batch([codes])[0]
            if self.debug_check:
                self._debug_check_result(codes, result)
            return result
        if nq > self.qcap:
            # Queries longer than the default SMEM query block grow it
            # (cell) or chunk with boundary carry (col) — the analog of
            # the reference's many-pass escalation for extremes.
            return self._scan_long_query(codes)
        qpad, params = self._single_qpad(codes)
        t0 = time.perf_counter()
        overflows = 0
        vals, ids, tmaxes = self._scan_fn(
            qpad, params, codes=codes, exact=not self.state16
        )
        # Materialize to host before stopping the clock: on tunneled
        # platforms block_until_ready returns before execution finishes.
        vals = np.asarray(vals)
        ids = np.asarray(ids)
        if self._has_overflow(vals):
            # 16-bit DP state saturated somewhere: re-score the overflow
            # SET — only the tiles whose max flagged saturation — with
            # exact int32 state and merge (the reference re-launches
            # 32-bit kernels over just the recorded overflow ids,
            # cudasw4.cuh:2117-2186, float_kernels.cuh:1189-1260).  Mesh
            # scans (tmaxes None) re-run the whole scan instead.
            overflows = int((vals >= sw_pallas_cell.SAT).sum())
            merged = (
                self._rescore_overflow(
                    tmaxes, vals, ids, qpad, params, codes
                )
                if tmaxes is not None
                else None
            )
            if merged is not None:
                vals, ids = merged
            else:
                vals, ids, _ = self._scan_fn(
                    qpad, params, codes=codes, exact=True
                )
                vals = np.asarray(vals)
                ids = np.asarray(ids)
        seconds = time.perf_counter() - t0
        k = self.results_per_query
        vals, ids = vals[:k], ids[:k]
        cells = float(nq) * float(self.packed.total_real_chars)
        self._total_cells += cells
        stats = BenchmarkStats(
            seconds=seconds,
            gcups=cells / 1e9 / seconds if seconds > 0 else 0.0,
            num_overflows=overflows,
        )
        result = ScanResult(
            scores=[int(v) for v in np.asarray(vals)],
            reference_ids=[int(i) for i in np.asarray(ids)],
            stats=stats,
        )
        if self.debug_check:
            self._debug_check_result(codes, result)
        return result

    def _debug_check_result(self, codes, result: ScanResult) -> None:
        """Re-score the top-N hits with the scalar CPU oracle and assert
        equality (CUDASW4_TPU_DEBUG_CHECK=1; the reference re-scores the
        whole DB under CUDASW_DEBUG_CHECK_CORRECTNESS — top-N keeps this
        usable on real databases.  =full diffs every score instead)."""
        if self.debug_check == "full":
            return self._debug_check_full(codes, result)
        from .ops.oracle import sw_score_scalar

        for score, ref in zip(result.scores, result.reference_ids):
            want = sw_score_scalar(
                codes, self.db.get_sequence(int(ref)),
                self.scoring.matrix, self.scoring.gop, self.scoring.gex,
            )
            if int(score) != int(want):
                raise AssertionError(
                    f"debug check failed: refId {ref} scored {score}, "
                    f"oracle says {want}"
                )

    def _rescore_overflow(self, tmaxes, vals, ids, qpad, params, codes):
        """Exact-int32 re-score of ONLY the saturated tiles, merged into
        the fast pass's top-k (the analog of the reference's overflow
        reprocessing, which re-launches 32-bit kernels over just the
        recorded overflow ids — /root/reference/src/cudasw4.cuh:2117-2186,
        float_kernels.cuh:1189-1260; our re-dispatch granule is the
        4096-subject tile carrying the flag).

        Merge correctness: an exact score of a saturated subject is
        >= SAT, and every non-saturated score is < SAT, so the true
        top-k is (exact scores of subjects in saturated tiles) merged
        with the fast top-k minus entries from those tiles.  Saturated
        entries can only displace the *tail* of the fast top-k, which
        is exactly what re-sorting the union reproduces.

        Returns (vals, ids), or None when the caller must fall back to
        a full exact re-scan (mesh path with a shard's saturated-tile
        count beyond the overflow buffer cap)."""
        if self._mesh_ndev() > 1 and getattr(
            self, "_sharded_tiles", None
        ) is not None:
            return self._rescore_overflow_mesh(
                tmaxes, vals, ids, qpad, params, codes
            )
        from .ops import INTERPRET

        use_pallas = self.backend == "pallas"
        nq_pad = int(params[3])
        qdev = jnp.asarray(qpad)
        pdev = jnp.asarray(params)
        cand_v: list[np.ndarray] = []
        cand_i: list[np.ndarray] = []
        for b, tiles, tmax in zip(
            self.packed.buckets, self._bucket_tiles, tmaxes
        ):
            sel = np.nonzero(np.asarray(tmax) >= sw_pallas_cell.SAT)[0]
            if sel.size == 0:
                continue
            sub = jnp.take(tiles, jnp.asarray(sel), axis=0)
            if (
                use_pallas
                and b.kernel == "col"
                and nq_pad > sw_pallas_col.NQC
            ):
                s = sw_pallas_col.score_bucket_col_any_query(
                    sub, codes, self._matrix_flat,
                    self.scoring.gop, self.scoring.gex,
                    exact=True, interpret=INTERPRET, pad=self._pad,
                )
            else:
                s = score_bucket(
                    sub, qdev, self._matrix_flat, self._matrix_f32,
                    pdev, use_pallas, bucket_kind(b, nq_pad=nq_pad),
                    exact=True,
                )
            sidx = np.asarray(b.seq_index[sel]).reshape(-1)
            s = np.asarray(s).reshape(-1)
            keep = sidx >= 0
            cand_v.append(s[keep].astype(np.float32))
            cand_i.append(sidx[keep])
        if not cand_v:  # defensive: flag without a flagged tile
            return vals, ids
        sat_i = np.concatenate(cand_i)
        keep = ~np.isin(np.asarray(ids), sat_i)
        allv = np.concatenate([np.asarray(vals)[keep]] + cand_v)
        alli = np.concatenate([np.asarray(ids)[keep]] + cand_i)
        order = np.lexsort((alli, -allv))[: len(vals)]
        return allv[order], alli[order]

    #: Per-shard overflow buffer capacity (tiles): the largest saturated
    #: tile count any shard may re-score through the fixed-capacity mesh
    #: overflow pass; beyond it the engine falls back to a full exact
    #: re-scan.  The analog of the reference's d_overflow_positions
    #: buffer sizing (/root/reference/src/cudasw4.cuh:2117-2186).
    OVF_TILE_CAP = int(os.environ.get("CUDASW4_TPU_OVF_TILE_CAP", 32))

    def _rescore_overflow_mesh(self, tmaxes, vals, ids, qpad, params, codes):
        """Mesh twin of _rescore_overflow: re-score ONLY saturated tiles,
        per shard, through a fixed-capacity shard_map program
        (parallel.sharding.build_sharded_overflow_rescore) and merge its
        gathered (score, id) candidates into the fast top-k.

        Merge rule (no host-side tile->id map needed): fast entries with
        val >= SAT are clamped/suspect and covered by the exact
        candidates, so the true top-k = sort( exact candidates  U
        { fast entries with val < SAT whose id is not a candidate } ).
        Every truly-saturated subject has exact score >= SAT >= any
        clamped value, and at most k of them win, so per-shard top-k
        candidate lists suffice (the standard sharded top-k argument).

        Returns None when any shard's saturated-tile count exceeds
        OVF_TILE_CAP (callers run the full exact re-scan instead)."""
        from .parallel import sharding as sh

        ndev = self._mesh_ndev()
        kinds = tuple(bucket_kind(b) for b in self.packed.buckets)
        use_pallas = self.backend == "pallas"
        nq = int(params[0])
        nq_pad = int(params[3])
        kds = kinds
        if nq > self.qcap:
            kds = tuple(
                "jnp"
                if kd == "row"
                or (kd == "cell" and nq > sw_pallas_cell.QCAP_MAX)
                else kd
                for kd in kinds
            )
        caps = []
        for tmax in tmaxes:
            tm = np.asarray(tmax)
            tl = tm.shape[0] // ndev
            need = int(
                (tm.reshape(ndev, tl) >= sw_pallas_cell.SAT)
                .sum(axis=1).max()
            ) if tl else 0
            if need > min(self.OVF_TILE_CAP, tl):
                return None  # overflow buffer too small: full re-scan
            # Power-of-two quantised per-bucket capacity: the caps tuple
            # is part of the compile key, so distinct overflow patterns
            # reuse a handful of compiled programs.
            cap = 1 if need else 0
            while cap < need:
                cap *= 2
            caps.append(min(cap, tl))
        if not any(caps):
            return np.asarray(vals), np.asarray(ids)
        nchunks = 0
        qc = np.zeros((1, 1), np.int32)
        pc = np.zeros((1, 4), np.int32)
        if (
            use_pallas
            and nq_pad > sw_pallas_col.NQC
            and any(kd == "col" for kd in kds)
        ):
            qc, pc = sh.make_query_chunks(
                codes, self.scoring.gop, self.scoring.gex, pad=self._pad
            )
            nchunks = len(qc)
        if not hasattr(self, "_ovf_fns"):
            self._ovf_fns = {}
        key = (kds, tuple(caps), nchunks)
        if key not in self._ovf_fns:
            self._ovf_fns[key] = sh.build_sharded_overflow_rescore(
                self.mesh, kds, use_pallas, max(self.results_per_query, 1),
                tuple(caps), nchunks=nchunks,
            )
        cv, ci = self._ovf_fns[key](
            qc, pc, qpad, params, self._sharded_tiles, self._sharded_idx,
            tuple(tmaxes), self._matrix_flat, self._matrix_f32,
        )
        cv = np.asarray(cv)
        ci = np.asarray(ci)
        ok = cv >= 0  # invalid candidate slots carry -1
        cv, ci = cv[ok], ci[ok]
        vals = np.asarray(vals)
        ids = np.asarray(ids)
        keep = (vals < sw_pallas_cell.SAT) & ~np.isin(ids, ci)
        allv = np.concatenate([vals[keep], cv])
        alli = np.concatenate([ids[keep], ci])
        order = np.lexsort((alli, -allv))[: len(vals)]
        return allv[order], alli[order]

    def _debug_check_full(self, codes, result: ScanResult) -> None:
        """Diff EVERY database score against the vectorized CPU oracle
        (CUDASW4_TPU_DEBUG_CHECK=full), the exact analog of the
        reference's computeAllScoresCPU_blosum62 comparison
        (/root/reference/src/cudasw4.cuh:728-756).  set_database forced
        num_top to the DB size, so the result carries one (score, id)
        per sequence; a mismatch anywhere — top-N or not — fails."""
        from .ops.oracle import sw_score_rowvec

        n = self.packed.num_sequences
        ids = np.asarray(result.reference_ids, dtype=np.int64)
        if len(result.scores) != n or len(np.unique(ids)) != n:
            raise AssertionError(
                f"full debug check expects one result per sequence: got "
                f"{len(result.scores)} results / {len(np.unique(ids))} "
                f"distinct ids for {n} sequences"
            )
        got = np.zeros(n, dtype=np.int64)
        got[ids] = np.asarray(result.scores, dtype=np.int64)
        lengths = np.asarray(self.db.lengths, dtype=np.int64)
        want = np.zeros(n, dtype=np.int64)
        chunk = 256  # equal-padded batches for the row oracle
        for a in range(0, n, chunk):
            b = min(a + chunk, n)
            lmax = max(1, int(lengths[a:b].max()))
            subs = np.full((b - a, lmax), self._pad, dtype=np.int8)
            for i in range(a, b):
                s = self.db.get_sequence(i)
                subs[i - a, : len(s)] = s
            want[a:b] = sw_score_rowvec(
                codes, subs, self.scoring.matrix,
                self.scoring.gop, self.scoring.gex,
            )
        bad = np.nonzero(got != want)[0]
        if bad.size:
            head = ", ".join(
                f"refId {i}: got {got[i]}, oracle {want[i]}"
                for i in bad[:5]
            )
            raise AssertionError(
                f"full debug check failed for {bad.size}/{n} sequences: "
                f"{head}"
            )

    def _has_overflow(self, vals) -> bool:
        return (
            self.state16
            and self.backend == "pallas"
            and len(vals) > 0
            and float(vals[0]) >= sw_pallas_cell.SAT
        )

    # ----------------------------------------------------------- batching

    #: Queries per batched scan pass (short queries only).  One tile pass
    #: serves the whole batch: the DB block streams from HBM once and the
    #: substitution LUT is built once per tile for all QB_MAX queries,
    #: amortising the per-tile fixed costs that dominate short-query scans.
    #: (QB=16 measured +4% over 8; 32 plateaus.  Unused slots cost ~1 row.)
    QB_MAX = 16

    #: Queries per *streaming* batch pass.  In streaming mode every batch
    #: re-ships the DB host->HBM, so batch capacity divides the dominant
    #: transfer cost directly — larger than QB_MAX is a pure win there
    #: (kernel throughput at QB=20 measured within noise of 16, and the
    #: reference benchmark set is exactly 20 queries: one stream instead
    #: of 16+4).  Env override: CUDASW4_TPU_QB_STREAM.
    QB_STREAM = 20

    @property
    def _qb_cap(self) -> int:
        """Max queries scan_batch/scan_many group into one fused pass."""
        return self.QB_STREAM if self.streaming else self.QB_MAX

    @property
    def _qcap_batch(self) -> int:
        """Batch query capacity: the full QCAP_BATCH SMEM block unless
        the DB has column-kernel buckets, whose batch passes pack query
        row counts into a flat state pool (longer queries run as
        singles: one NQC-row pass, chunked-carry beyond).  The pool is
        NQC rows wherever passes dispatch as their own programs (single
        chip, all streaming) but FUSED_RTOT on the mesh-resident path,
        whose passes fuse into one shard_map program (see
        sw_pallas_col.FUSED_RTOT for the TPU-worker-crash rationale)."""
        if not any(b.kernel == "col" for b in self.packed.buckets):
            return sw_pallas_cell.QCAP_BATCH
        pool = sw_pallas_col.NQC
        if not self.streaming and self._mesh_ndev() > 1:
            pool = min(pool, sw_pallas_col.FUSED_RTOT)
        return min(sw_pallas_cell.QCAP_BATCH, pool)

    def _build_batch_scan_fn(self):
        kinds = tuple(bucket_kind(b) for b in self.packed.buckets)
        use_pallas = self.backend == "pallas"
        k = self.results_per_query
        QB = self.QB_MAX

        if self.mesh is not None and len(self.mesh.devices.flat) > 1:
            from .parallel import sharding as sh

            fns = {}

            def run_sharded(queries, qpad_full, params, plan):
                if plan not in fns:
                    fns[plan] = sh.build_sharded_batch_scan(
                        self.mesh, kinds, use_pallas, k, QB, plan=plan,
                        pad=self._pad, rtot=self._qcap_batch,
                    )
                return fns[plan](
                    queries, qpad_full, params,
                    self._sharded_tiles, self._sharded_idx,
                    self._matrix_flat, self._matrix_f32,
                )

            return run_sharded

        from .ops import INTERPRET, batch_col_scores

        @functools.partial(jax.jit, static_argnames=("cell_pre",))
        def batch_fn(queries, qpad_full, params, bucket_tiles, valid,
                     flat_idx, mat_flat, mat_f32, col_rows=(),
                     cell_rows=(), cell_pre=False):
            per_qb = [[] for _ in range(QB)]
            col_i = 0
            cell_i = 0
            for tiles, kind in zip(bucket_tiles, kinds):
                if use_pallas and kind == "cell":
                    if cell_pre:
                        # Scored eagerly in run() below (big databases):
                        # see the program-size cap there.
                        for qb in range(QB):
                            per_qb[qb].append(
                                cell_rows[cell_i][qb].reshape(-1)
                            )
                        cell_i += 1
                        continue
                    s = sw_pallas_cell.score_bucket_pallas_cell_batch(
                        tiles, queries, mat_flat, params,
                        interpret=INTERPRET,
                    )
                    for qb in range(QB):
                        per_qb[qb].append(s[qb].reshape(-1))
                elif use_pallas and kind == "col":
                    # Scored eagerly in run() below — many big-state col
                    # passes fused into ONE program crash the TPU worker
                    # at scale (sw_pallas_col.FUSED_RTOT); the merge
                    # consumes the precomputed rows.
                    for qb in range(QB):
                        per_qb[qb].append(col_rows[col_i][qb])
                    col_i += 1
                else:
                    for qb in range(QB):
                        pq = jnp.stack([
                            params[4 + qb], params[1], params[2],
                            params[4 + QB + qb],
                        ])
                        s = score_bucket(
                            tiles, qpad_full[qb], mat_flat, mat_f32, pq,
                            use_pallas, kind, exact=True,
                        )
                        per_qb[qb].append(s.reshape(-1))
            rows = jnp.stack([
                jnp.concatenate(p) if len(p) > 1 else p[0] for p in per_qb
            ])
            rows = jnp.where(valid[None, :], rows, -1.0)
            vals, idx = jax.lax.top_k(rows, max(1, k))
            return vals, jnp.take(flat_idx, idx)

        def run(queries, qpad_full, params, plan):
            # Col buckets: one flat-pool pass per plan entry, each
            # dispatched as its OWN program (the stable configuration;
            # XLA async dispatch still pipelines them back-to-back),
            # then the fused merge consumes the row tensors.  Tail
            # slots outside the plan (partial batches) fill with
            # zeros, masked out by _materialize_batch slicing to the
            # real group (verdict item 3; cudasw4.cuh:1742-2103
            # batches all partitions per upload the same way).
            qdev = jnp.asarray(queries)
            pdev = jnp.asarray(params)
            col_rows = []
            for tiles, kind in zip(self._bucket_tiles, kinds):
                if not (use_pallas and kind == "col"):
                    continue
                got = [None] * QB
                for s_part, slots in batch_col_scores(
                    tiles, qdev, self._matrix_flat, pdev, QB, plan,
                    interpret=INTERPRET,
                ):
                    for si, slot in enumerate(slots):
                        got[slot] = s_part[si].reshape(-1)
                ns = tiles.shape[0] * tiles.shape[2] * tiles.shape[3]
                zero = jnp.zeros(ns, jnp.float32)
                col_rows.append(tuple(
                    r if r is not None else zero for r in got
                ))
            # Program-size cap (round 5): the fused batch program's DP
            # work is (batch rows) x (cell-bucket chars).  At 5M-seq
            # mixed-length scale that is a ~100+ s single program
            # execution fusing 17 big-LUT cell kernels, which KILLS the
            # TPU worker ("crashed or restarted") even though every
            # bucket runs fine as its own program (chip-bisected; the
            # ~46 s sweep-config programs are fine).  Above the
            # threshold, dispatch each cell bucket as its own program —
            # XLA async dispatch still pipelines them back-to-back —
            # and keep only the merge fused.
            cell_rows = []
            cell_pre = False
            if use_pallas:
                rows_sum = int(np.sum(np.asarray(params)[4 + QB:])) or 1
                cell_chars = sum(
                    t.shape[0] * t.shape[1] * t.shape[2] * t.shape[3]
                    for t, kd in zip(self._bucket_tiles, kinds)
                    if kd == "cell"
                )
                cell_pre = rows_sum * cell_chars > BATCH_SPLIT_CELLS
            if cell_pre:
                for tiles, kind in zip(self._bucket_tiles, kinds):
                    if kind != "cell":
                        continue
                    cell_rows.append(
                        sw_pallas_cell.score_bucket_pallas_cell_batch(
                            tiles, qdev, self._matrix_flat, pdev,
                            interpret=INTERPRET,
                        )
                    )
            return batch_fn(
                qdev, qpad_full, pdev,
                tuple(self._bucket_tiles), self._valid, self._flat_idx,
                self._matrix_flat, self._matrix_f32,
                col_rows=tuple(col_rows),
                cell_rows=tuple(cell_rows), cell_pre=cell_pre,
            )

        return run

    def _batch_slot_params(self, entries, QB: int, width: int):
        """Assemble the batch kernels' wire layout once for both the
        resident and streaming batch paths: ``entries`` = (slot, codes)
        pairs -> (queries [QB, width], nqs, pads, params [4+2*QB] =
        [0, gop, gex, 0] + nqs + pads)."""
        queries = np.full((QB, width), self._pad, dtype=np.int32)
        nqs = np.zeros(QB, np.int32)
        cu = sw_pallas_col.DEFAULT_UNROLL
        pads = np.full(QB, cu, np.int32)
        for slot, c in entries:
            queries[slot, : len(c)] = c
            nqs[slot] = len(c)
            pads[slot] = max(cu, -(-len(c) // cu) * cu)
        params = np.concatenate(
            [
                np.array(
                    [0, self.scoring.gop, self.scoring.gex, 0], np.int32
                ),
                nqs,
                pads,
            ]
        )
        return queries, nqs, pads, params

    def _dispatch_batch(self, group):
        """Dispatch up to QB_MAX short queries; returns device handles."""
        QB = self.QB_MAX
        if not self.packed.buckets:  # empty database
            return (
                np.zeros((QB, 0), np.float32),
                np.zeros((QB, 0), np.int32),
            )
        if getattr(self, "_batch_scan_fn", None) is None:
            self._batch_scan_fn = self._build_batch_scan_fn()
        qcap_b = self._qcap_batch
        queries, nqs, pads, params = self._batch_slot_params(
            enumerate(group), QB, qcap_b
        )
        # Fallback (non-batch-kernel bucket) query pad: batch queries may
        # legitimately exceed the single-scan qcap — the batch kernel's
        # block is qcap_b wide — so grow this pad when needed (QCAP
        # granularity on Pallas for compile-cache sharing; tight 256
        # steps on jnp, whose scorer walks every padded row).
        qw = self.qcap
        longest = max((len(c) for c in group), default=0)
        if longest > qw:
            gran = (
                sw_pallas_cell.QCAP if self.backend == "pallas" else 256
            )
            qw = min(qcap_b, max(qw, _round_up(longest, gran)))
        qpad_full = np.full((QB, qw), self._pad, dtype=np.int32)
        for i, c in enumerate(group):
            qpad_full[i, : len(c)] = c
        if any(b.kernel == "col" for b in self.packed.buckets):
            from .ops import col_flat_plan

            # Bin-pack only the real slots (each pass costs a full tile
            # stream + LUT build); tail slots of a partial batch get
            # zero rows inside batch_fn, keeping the bucket-concat
            # layout (flat_idx mapping) intact.
            # Pool size matches the path: NQC where passes are their
            # own programs, FUSED_RTOT inside the mesh-fused program
            # (both via _qcap_batch, which also bounds the group).
            plan = col_flat_plan(
                pads, limit=len(group), rtot=self._qcap_batch
            )
        else:
            # Unused without col buckets; pin it so the fused batch
            # program compiles once, not per distinct query mix.
            plan = ()
        return self._batch_scan_fn(queries, qpad_full, params, plan)

    def _materialize_batch(self, vals, ids, group, t0):
        """Turn one batch dispatch into per-query ScanResults (in order).

        Per-query seconds are the batch wall time split proportionally to
        each query's cell count (individual queries are not separately
        observable inside one fused pass)."""
        vals = np.asarray(vals)
        ids = np.asarray(ids)
        seconds = time.perf_counter() - t0
        k = self.results_per_query
        db_chars = float(self.packed.total_real_chars)
        total_cells = sum(len(c) for c in group) * db_chars
        out = []
        for i, c in enumerate(group):
            cells = float(len(c)) * db_chars
            self._total_cells += cells
            q_seconds = (
                seconds * cells / total_cells if total_cells else seconds
            )
            out.append(
                ScanResult(
                    scores=[int(v) for v in vals[i, :k]],
                    reference_ids=[int(r) for r in ids[i, :k]],
                    stats=BenchmarkStats(
                        seconds=q_seconds,
                        gcups=(
                            cells / 1e9 / q_seconds if q_seconds > 0 else 0.0
                        ),
                    ),
                )
            )
        if self.debug_check:
            # The batch kernels' slot/merge plumbing is where batching
            # bugs would live — verify every slot's result, same oracle
            # as single scans (the reference rescores EVERY scan under
            # CUDASW_DEBUG_CHECK_CORRECTNESS, cudasw4.cuh:728-756).
            for c, r in zip(group, out):
                self._debug_check_result(c, r)
        return out

    def scan_batch(self, sequences) -> list[ScanResult]:
        """Scan up to QB_MAX (streaming: QB_STREAM) queries in one fused
        pass (synchronous); returns results in input order.  Resident DBs
        require lengths <= QCAP_BATCH (the batch kernel's SMEM query
        block); streaming DBs take any length (long queries ride the
        same streamed chunks)."""
        group = [
            encode(s) if isinstance(s, (str, bytes)) else np.asarray(s, np.int8)
            for s in sequences
        ]
        if len(group) > self._qb_cap:
            raise ValueError(
                f"scan_batch takes at most {self._qb_cap} queries per "
                f"call (got {len(group)}); use scan_many for larger sets"
            )
        if self.streaming:
            return self._scan_streaming_batch(group)
        too_long = [len(c) for c in group if len(c) > self._qcap_batch]
        if too_long:
            raise ValueError(
                f"scan_batch queries must be <= {self._qcap_batch} "
                f"residues on a resident DB (got {max(too_long)}); use "
                "scan() / scan_many for longer queries"
            )
        t0 = time.perf_counter()
        vals, ids = self._dispatch_batch(group)
        return self._materialize_batch(vals, ids, group, t0)

    def scan_many(self, sequences, window: int = 3):
        """Pipelined scans: yields one ScanResult per input sequence.

        Up to ``window`` queries are dispatched ahead of materialisation so
        host->device submission latency overlaps device compute — the XLA
        analog of the reference's per-query stream overlap.  Falls back to
        synchronous scans for paths that cannot be dispatched ahead
        (streaming DBs, over-capacity queries).
        """
        from collections import deque

        pending = deque()  # ("single"|"batch", payload...)
        # Streaming DBs group on every backend: the batch exists to
        # amortise the host->HBM stream, not just the batch kernel.
        # state16 only disables the resident batch kernels; streaming
        # scans run exact int32 regardless, and falling back to singles
        # there would stream the whole DB once per query (~QB_STREAM x
        # the transfers).
        batching = (
            (self.backend == "pallas" or self.streaming)
            and self.packed is not None
            and (not self.state16 or self.streaming)
        )
        shortbuf: list = []

        def materialize(entry):
            if entry[0] == "batch":
                _, vals, ids, group, t0 = entry
                return self._materialize_batch(vals, ids, group, t0)
            _, vals, ids, tmaxes, nq, t0, qpad, params, codes = entry
            vals = np.asarray(vals)
            ids = np.asarray(ids)
            overflows = 0
            if self._has_overflow(vals):
                overflows = int((vals >= sw_pallas_cell.SAT).sum())
                merged = (
                    self._rescore_overflow(
                        tmaxes, vals, ids, qpad, params, codes
                    )
                    if tmaxes is not None
                    else None
                )
                if merged is not None:
                    vals, ids = merged
                else:
                    vals, ids, _ = self._scan_fn(
                        qpad, params, codes=codes, exact=True
                    )
                    vals = np.asarray(vals)
                    ids = np.asarray(ids)
            seconds = time.perf_counter() - t0
            k = self.results_per_query
            cells = float(nq) * float(self.packed.total_real_chars)
            self._total_cells += cells
            res = ScanResult(
                scores=[int(v) for v in vals[:k]],
                reference_ids=[int(i) for i in ids[:k]],
                stats=BenchmarkStats(
                    seconds=seconds,
                    gcups=cells / 1e9 / seconds if seconds > 0 else 0.0,
                    num_overflows=overflows,
                ),
            )
            if self.debug_check:
                self._debug_check_result(codes, res)
            return [res]

        def flush_shorts():
            """Dispatch buffered short queries; returns finished results
            (streaming mode runs synchronously — the DB streams through
            host memory once per batch)."""
            if not shortbuf:
                return []
            group = list(shortbuf)
            shortbuf.clear()
            if self.streaming:
                return self._scan_streaming_batch(group)
            t0 = time.perf_counter()
            vals, ids = self._dispatch_batch(group)
            pending.append(("batch", vals, ids, group, t0))
            return []

        for sequence in sequences:
            codes = (
                encode(sequence)
                if isinstance(sequence, (str, bytes))
                else np.asarray(sequence, np.int8)
            )
            nq = len(codes)
            batchable = self.streaming or nq <= self._qcap_batch
            if batching and batchable:
                shortbuf.append(codes)
                if len(shortbuf) >= self._qb_cap:
                    yield from flush_shorts()
                    while len(pending) > window:
                        yield from materialize(pending.popleft())
                continue
            yield from flush_shorts()
            if self.streaming or nq > self.qcap:
                while pending:
                    yield from materialize(pending.popleft())
                yield self.scan(codes)
                continue
            qpad, params = self._single_qpad(codes)
            t0 = time.perf_counter()
            vals, ids, tmaxes = self._scan_fn(
                qpad, params, codes=codes, exact=not self.state16
            )
            pending.append(
                ("single", vals, ids, tmaxes, nq, t0, qpad, params, codes)
            )
            if len(pending) > window:
                yield from materialize(pending.popleft())
        yield from flush_shorts()
        while pending:
            yield from materialize(pending.popleft())

    def _resident_codec(self) -> str | None:
        """Transfer codec for *resident* uploads (set_database /
        pinned-prefix device_puts, as opposed to per-scan streaming).
        CUDASW4_TPU_RESIDENT_PACK: "1" b32, "2" b21, "0" raw.

        Default OFF: unlike the per-scan streaming path (where the codec
        measured +8%..+98%), the one-time resident upload measured
        *slower* packed on the tunneled v5e (tools/setdbbench.py best-of:
        raw 12.2s vs b32 21.5s for 1M x 256) — the bulk jnp.asarray
        transfer outruns the jit-input staging at these sizes.  Numerics
        are identical either way (parity tests); re-measure per runtime
        before flipping."""
        from .ops.pack5 import choose_codec

        return choose_codec(
            os.environ.get("CUDASW4_TPU_RESIDENT_PACK", "0"),
            int(self._pad),
        )

    def _upload_bucket_tiles(self) -> list:
        """Host->device upload of every bucket's tiles (single-chip
        resident path).  With the resident codec enabled, tiles ship
        packed (ops/pack5.py) and unpack in a jitted prologue on device:
        1.5-1.75x fewer host->HBM bytes, which on network-attached TPU
        runtimes is most of set_database's wall time for multi-GB DBs.
        The reference's analog is prefetchDBToGpus' bulk H2D of the
        cached region (/root/reference/src/cudasw4.cuh:651) — raw bytes
        there, because PCIe is never its bottleneck."""
        from .ops.pack5 import CODECS

        codec = self._resident_codec()
        out = []
        for b in self.packed.buckets:
            # Tiny buckets transfer faster than the pack+unpack round
            # trip; the memmap-backed store also reads lazily either way.
            if codec is None or b.tiles.size < self._resident_pack_min:
                out.append(jnp.asarray(b.tiles))
                continue
            unpack = CODECS[codec][3]
            # Feed the packed host array straight to the jitted unpack —
            # the jit-managed input transfer is the fast path on this
            # runtime (an explicit device_put chained into a jit call
            # measured 4x slower; see docs/PERFORMANCE.md pack5 notes).
            # Packing goes through a temp memmap so peak host RAM stays
            # slab-bounded for multi-GB buckets.
            from .ops.pack5 import pack_to_tempmm

            out.append(
                unpack(pack_to_tempmm(b.tiles, codec),
                       tuple(b.tiles.shape[1:]))
            )
        return out

    def _mesh_ndev(self) -> int:
        return len(self.mesh.devices.flat) if self.mesh is not None else 1

    def _device_budget(self) -> int:
        """Per-chip device-memory budget in bytes.

        Multi-process meshes always use the conservative constant: the
        streaming-vs-resident decision must be identical on every
        process (they build different collective programs), and
        memory_stats() is only available for addressable devices — its
        per-process fallbacks could diverge.  Pass max_device_bytes for
        an exact process-uniform budget."""
        budget = self.max_device_bytes
        if budget is None:
            if jax.process_count() > 1:
                return 8 << 30
            try:
                stats = jax.devices()[0].memory_stats() or {}
                budget = int(stats.get("bytes_limit", 12 << 30) * 0.7)
            except Exception:
                budget = 8 << 30
        return budget

    def _db_exceeds_device_memory(self, ndev: int = 1) -> bool:
        return self.packed.total_padded_chars > self._device_budget() * ndev

    def _scan_long_query(self, codes) -> ScanResult:
        """Resident-DB scan of a query beyond the engine's default qcap:
        col buckets keep the fast chunked-carry kernel (any query length)
        and cell buckets keep the cell kernel with a grown SMEM query
        block (up to sw_pallas_cell.QCAP_MAX; the DP loop runs to nq, so
        the padding costs nothing); only legacy row buckets and truly
        extreme queries fall back to the portable tile-chunked scorer.
        Streaming DBs never reach here (scan() routes them through the
        streaming pipeline, which handles any length)."""
        from .ops import INTERPRET
        from .ops.sw_jax import score_tiles_jnp_chunked

        nq = len(codes)
        # QCAP-granular padding bounds the jit compile cache (one program
        # per QCAP multiple, not per query length) on the Pallas backend;
        # the portable scorer pays per padded row, so pad tight whenever
        # any bucket will take the portable kind for this query (long row
        # buckets; cell buckets beyond QCAP_MAX — mirroring the sharded
        # run()'s degradation rule; col buckets never degrade, they
        # chunk).
        any_jnp = self.backend != "pallas" or any(
            kd == "jnp" or (kd == "cell" and nq > sw_pallas_cell.QCAP_MAX)
            for kd in (bucket_kind(b) for b in self.packed.buckets)
        )
        if not any_jnp:
            qpad_len = max(self.qcap, _round_up(nq, sw_pallas_cell.QCAP))
        else:
            qpad_len = max(256, _round_up(nq, 256))
        qpad = np.full(qpad_len, self._pad, dtype=np.int32)
        qpad[:nq] = codes
        cu = sw_pallas_col.DEFAULT_UNROLL
        nq_pad = max(cu, -(-nq // cu) * cu)
        t0 = time.perf_counter()
        if self._mesh_ndev() > 1:
            params = np.array(
                [nq, self.scoring.gop, self.scoring.gex, nq_pad], np.int32
            )
            vals, ids, _ = self._scan_fn(qpad, params, codes=codes, exact=True)
            vals = np.asarray(vals)
            ids = np.asarray(ids)
            k = self.results_per_query
            seconds = time.perf_counter() - t0
            cells = float(nq) * float(self.packed.total_real_chars)
            self._total_cells += cells
            return ScanResult(
                scores=[int(v) for v in vals[:k]],
                reference_ids=[int(i) for i in ids[:k]],
                stats=BenchmarkStats(
                    seconds=seconds,
                    gcups=cells / 1e9 / seconds if seconds > 0 else 0.0,
                ),
            )
        qdev = jnp.asarray(qpad)
        gop = jnp.float32(self.scoring.gop)
        gex = jnp.float32(self.scoring.gex)
        use_pallas = self.backend == "pallas"
        parts = []
        params = jnp.asarray(
            np.array(
                [nq, self.scoring.gop, self.scoring.gex, nq_pad], np.int32
            )
        )
        for tiles, b in zip(self._bucket_tiles, self.packed.buckets):
            if use_pallas and b.kernel == "col":
                s = sw_pallas_col.score_bucket_col_any_query(
                    tiles, codes, self._matrix_flat,
                    self.scoring.gop, self.scoring.gex,
                    exact=True, interpret=INTERPRET, pad=self._pad,
                )
            elif (
                use_pallas
                and b.kernel == "cell"
                and nq <= sw_pallas_cell.QCAP_MAX
            ):
                s = sw_pallas_cell.score_bucket_pallas_cell(
                    tiles, qdev, self._matrix_flat, params,
                    exact=True, interpret=INTERPRET,
                )
            else:
                # The portable scorer's lax.scan walks every padded query
                # row, so feed it a tight 256-granular slice — the
                # QCAP-granular pad (8192 steps) only costs nothing on
                # the Pallas kernels, whose DP loops stop at nq.
                qj = qdev[: min(qpad_len, max(256, _round_up(nq, 256)))]
                s = score_tiles_jnp_chunked(
                    tiles if tiles.ndim == 3
                    else tiles.reshape(tiles.shape[0], tiles.shape[1], -1),
                    qj, self._matrix_f32, gop, gex, jnp.int32(nq),
                )
            parts.append(np.asarray(s).reshape(-1))
        flat_idx = np.asarray(self._flat_idx)
        scores = np.concatenate(parts) if parts else np.zeros(0, np.float32)
        scores = np.where(flat_idx >= 0, scores, -1.0)
        k = self.results_per_query
        order = np.lexsort((np.arange(len(scores)), -scores))[:k]
        seconds = time.perf_counter() - t0
        cells = float(nq) * float(self.packed.total_real_chars)
        self._total_cells += cells
        return ScanResult(
            scores=[int(scores[i]) for i in order],
            reference_ids=[int(flat_idx[i]) for i in order],
            stats=BenchmarkStats(
                seconds=seconds,
                gcups=cells / 1e9 / seconds if seconds > 0 else 0.0,
            ),
        )

    # --------------------------------------------------------------- timer

    def total_timer_start(self):
        self._total_t0 = time.perf_counter()
        self._total_cells = 0.0

    def total_timer_stop(self) -> BenchmarkStats:
        seconds = time.perf_counter() - (self._total_t0 or time.perf_counter())
        gcups = self._total_cells / 1e9 / seconds if seconds > 0 else 0.0
        return BenchmarkStats(seconds=seconds, gcups=gcups)

    # ---------------------------------------------------------------- info

    def print_db_info(self):
        p = self.packed
        print(
            f"DB: {p.num_sequences} sequences, {p.total_real_chars} residues"
        )
        print(
            f"Packed: {len(p.buckets)} buckets, padded chars "
            f"{p.total_padded_chars} "
            f"({p.total_padded_chars / max(1, p.total_real_chars):.2f}x)"
        )

    def print_db_length_partitions(self):
        for b in self.packed.buckets:
            print(
                f"  bucket L={b.L:6d} NS={b.NS:5d} tiles={b.num_tiles:6d} "
                f"sequences={b.num_real}"
            )
