"""Streaming scan engine: DBs beyond device memory.

Mixin half of SearchEngine (engine.py) holding the host->HBM streaming
pipeline: fixed-shape chunking of the packed DB (--maxBatchBytes /
--maxBatchSequences, the reference's greedy copy plan,
/root/reference/src/cudasw4.cuh:1177-1277), the partial-residency pinned
prefix (assignBatchesToGpuMem analog, cudasw4.cuh:1087-1144), the 5-bit
transfer-pack sidecar, the prefetch worker thread (the
cudaLaunchHostFunc pinned-copy thread analog, cudasw4.cuh:1649-1707),
and the streamed multi-query batch scan itself.  Split from engine.py
in round 3 (pure refactor): engine.py keeps the resident and sharded
paths plus everything both halves share (ScanResult, batching params,
bucket dispatch).

Nothing here is public API; SearchEngine inherits it all.  Imports from
engine.py happen inside methods (the modules are mutually recursive by
design: engine imports this mixin at class-definition time).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from .ops import bucket_kind, score_bucket, sw_pallas_cell, sw_pallas_col


class StreamingEngineMixin:
    """Streaming scan methods of SearchEngine (see module docstring)."""

    def _host_tile_ranges(self, plans, ndev: int):
        """Per-plan-bucket tile ranges this process's devices consume on
        the streamed chunk-sharded path, or None when every tile is
        needed (single process, or all mesh devices local).

        Streamed chunk rows map 1:1 to tiles (chunk at t0, row r = tile
        t0 + r; _stream_chunks) and shard over mesh positions in order
        (P(axis) over mesh.devices.flat; _put_chunk), so the process
        needs exactly the union over chunks of its local devices' row
        slices.  The pinned resident prefix reuses whole chunk shapes
        with the same sharding, so its rows are covered too.  Feeding
        these to pack_db_to_store builds the per-host store: each host
        packs (and stores) only ~1/num_hosts of the tiles — the analog
        of the reference's per-GPU partition assignment
        (/root/reference/src/cudasw4.cuh:1087-1144)."""
        if ndev <= 1 or jax.process_count() <= 1 or self.mesh is None:
            return None
        from types import SimpleNamespace

        from .db.packing import _norm_ranges

        me = jax.process_index()
        flat = list(self.mesh.devices.flat)
        mine = [i for i, d in enumerate(flat) if d.process_index == me]
        if len(mine) == len(flat):
            return None
        out = []
        for start, stop, L, NS, kernel in plans:
            T = -(-(stop - start) // NS)
            ct = self._chunk_tiles(
                SimpleNamespace(L=L, NS=NS, num_tiles=T), ndev
            )
            per = ct // ndev
            rs = []
            for t0 in range(0, T, ct):
                for d in mine:
                    a = t0 + d * per
                    b = min(t0 + (d + 1) * per, T)
                    if a < b:
                        rs.append((a, b))
            out.append(_norm_ranges(rs, T))
        return out

    def _chunk_tiles(self, b, ndev: int) -> int:
        """Tiles per streamed chunk for one bucket (fixed shape; multiple
        of the mesh size so chunks shard evenly).  Chunks are capped by
        bytes (--maxBatchBytes -> stream_chunk_bytes) AND by sequence
        slots (--maxBatchSequences -> max_batch_sequences), mirroring
        the reference's greedy copy plan, which packs batches up to
        maxBatchBytes/maxBatchSequences whichever binds first
        (/root/reference/src/cudasw4.cuh:1177-1277, options.cpp:121)."""
        from .engine import _round_up

        bytes_per_tile = b.L * b.NS
        ct = max(1, self.stream_chunk_bytes // bytes_per_tile)
        if self.max_batch_sequences is not None:
            ct = min(ct, max(1, self.max_batch_sequences // b.NS))
        ct = max(ndev, ct // ndev * ndev)
        return min(ct, _round_up(b.num_tiles, ndev))

    def _load_resident_prefix(self, ndev: int) -> None:
        """Pin as much of the packed DB in device memory as the budget
        allows; only the remainder streams per batch.  The reference does
        exactly this: batches are assigned to cached GPU memory until it
        is full and only the overflow cycles through the copy buffers
        (cudasw4.cuh:1087-1144 assignBatchesToGpuMem, :1560-1621 buffer
        selection).  All-or-nothing residency wastes the entire HBM when
        the DB is 1.2x the budget; with a prefix pinned, the streamed
        fraction (and its transfer time) shrinks proportionally.

        Chunks are whole streamed-chunk-shaped slices (same compiled
        shapes as the streamed path), stored unpacked int8 (no per-batch
        unpack), tile-sharded on a mesh (seq_index pinned alongside, so
        resident chunks ship zero bytes per scan).  Headroom: at least 4
        stream chunks AND 15% of the budget stay free for in-flight
        transfers, pending score rows and query buffers.  Pinning only
        engages when the budget is trustworthy — an explicit
        max_device_bytes or a device that reports bytes_limit — never on
        the blind 8 GiB fallbacks (pinning gigabytes on a host whose
        memory we cannot see would break the bounded-RAM streaming
        contract).  A device OOM during pinning stops the prefix there
        and streams the rest.  Disable with
        CUDASW4_TPU_STREAM_RESIDENT=0."""
        self._resident_chunks = []
        self._res_tiles = {}
        if os.environ.get("CUDASW4_TPU_STREAM_RESIDENT", "1") != "1":
            return
        multiprocess = jax.process_count() > 1
        if multiprocess and self.max_device_bytes is None:
            # The pin plan must be identical on every process (the scan
            # runs collectives per chunk); only an explicit budget is
            # guaranteed process-uniform.  Per-process memory_stats is
            # not — skip pinning rather than risk divergent plans.
            return
        if self.max_device_bytes is None:
            try:
                stats = jax.devices()[0].memory_stats() or {}
            except Exception:
                stats = {}
            if "bytes_limit" not in stats:
                return  # unknown real memory: do not pin blind
        total_budget = self._device_budget() * ndev
        # Headroom for in-flight streamed chunks: _chunk_tiles floors at
        # ndev tiles per chunk, so a huge-L bucket's actual chunks can
        # far exceed stream_chunk_bytes — reserve for the real maximum.
        max_chunk = max(
            (
                self._chunk_tiles(b, ndev) * b.L * b.NS
                for b in self.packed.buckets
                if b.num_tiles
            ),
            default=self.stream_chunk_bytes,
        )
        budget = min(
            total_budget - 4 * max(max_chunk, self.stream_chunk_bytes),
            int(0.85 * total_budget),
        )
        if budget <= 0:
            return
        used = 0
        oom = False
        for bi, b in enumerate(self.packed.buckets):
            T = b.num_tiles
            if T == 0 or oom:
                continue
            ct = self._chunk_tiles(b, ndev)
            chunk_bytes = ct * b.L * b.NS
            taken = 0
            for t0 in range(0, T, ct):
                t1 = min(t0 + ct, T)
                if t1 - t0 < ct or used + chunk_bytes > budget:
                    # Partial tail chunks stream (they need pad filler);
                    # so does everything past the budget.
                    break
                chunk = np.ascontiguousarray(b.tiles[t0:t1])
                sidx = np.asarray(b.seq_index[t0:t1])
                codec = self._resident_codec()
                if codec is not None and chunk.size >= self._resident_pack_min:
                    # Ship the pin packed, unpack on device (same codec
                    # plumbing as streamed chunks; the unpack is
                    # elementwise along the tile axis so a sharded input
                    # stays sharded).
                    from .ops.pack5 import CODECS

                    pack, unpack = CODECS[codec][2], CODECS[codec][3]
                    chunk = pack(chunk)
                else:
                    codec = None
                try:
                    if ndev > 1:
                        xdev = self._put_sharded(chunk)
                        sdev = self._put_sharded(sidx)
                    else:
                        xdev = chunk if codec else jax.device_put(chunk)
                        sdev = sidx
                    if codec:
                        xdev = unpack(xdev, tuple(b.tiles.shape[1:]))
                    jax.block_until_ready(xdev)
                except RuntimeError:  # XlaRuntimeError (OOM) included
                    if multiprocess:
                        # A silently shrunk pin plan would desync the
                        # per-chunk collectives across processes (hang or
                        # corrupt merge) — fail loud instead.
                        raise
                    oom = True  # keep what fit; stream from here on
                    break
                self._resident_chunks.append((bi, xdev, sdev))
                used += chunk_bytes
                taken = t1
            if taken:
                self._res_tiles[bi] = taken
        if self.verbose and used:
            total = float(self.packed.total_padded_chars)
            print(
                f"Resident prefix: {used/2**30:.2f} GiB pinned on device "
                f"({100.0*used/total:.0f}% of the DB); remainder streams"
                + (" [stopped early: device allocation failed]" if oom
                   else "")
            )

    def _scan_streaming_batch(self, group):
        """Stream the database ONCE for a batch of queries (any length).

        For DBs beyond device memory the host->HBM transfer dominates;
        scoring up to QB_MAX queries per streamed chunk divides it by the
        batch size (the reference re-uploads per query when the DB
        exceeds VRAM, cudasw4.cuh:1490+ — this is strictly better).  On a
        mesh each chunk's tile axis is sharded so every chip scores its
        slice (the reference's multi-GPU copy pipeline, cudasw4.cuh:1560+).
        Queries up to QCAP_BATCH share the multi-query batch kernel; longer
        ones ride the same streamed chunk with per-query kernel calls
        (chunked H/F carry on col buckets; the portable scorer only beyond
        the cell kernel's SMEM query capacity).  Always exact int32 state.
        Returns a list of ScanResults in input order.
        """
        from .engine import BenchmarkStats, ScanResult, _round_up
        from .ops import INTERPRET
        from .parallel import sharding as sh

        if not group:
            return []
        if self.state16 and not getattr(self, "_warned_state16_stream", 0):
            # The reference's int16 fast path re-uploads on overflow; in
            # streaming mode that would double the dominant transfer, so
            # streaming always runs exact int32 — say so instead of
            # silently ignoring the requested kernel family.
            self._warned_state16_stream = True
            import sys as _sys

            print(
                "NOTE: int16 kernel families are ignored in streaming "
                "mode (always exact int32 state)",
                file=_sys.stderr,
            )
        t0 = time.perf_counter()
        # Slot count picks the compiled batch-kernel shape: the QB_MAX
        # shape for resident-sized groups (shared compile cache), the
        # QB_STREAM shape only when a bigger group actually arrives (or
        # QB_STREAM was lowered below QB_MAX to shrink the query block).
        small = min(self.QB_MAX, self.QB_STREAM)
        QB = small if len(group) <= small else self.QB_STREAM
        qcap_b = self._qcap_batch
        n = len(group)
        gop, gex = self.scoring.gop, self.scoring.gex
        ndev = self._mesh_ndev()
        use_pallas = self.backend == "pallas"
        shorts = [i for i, c in enumerate(group) if len(c) <= qcap_b]
        longs = [i for i, c in enumerate(group) if len(c) > qcap_b]

        queries, _nqs_b, pads_b, params_b = self._batch_slot_params(
            ((slot, group[i]) for slot, i in enumerate(shorts)), QB, qcap_b
        )
        pdev = jnp.asarray(params_b)
        qb_dev = jnp.asarray(queries)
        # Full-query pads: kernel-capacity width for kernel paths, plus a
        # wide variant per over-capacity query for the portable scorer.
        # (jnp backend: tight 256-granular width — the portable scorer
        # walks every padded row.)
        if use_pallas:
            qw = self.qcap
        else:
            fits = [len(c) for c in group if len(c) <= self.qcap]
            qw = min(self.qcap, max(256, _round_up(max(fits, default=4), 256)))
        qpad_full = np.full((n, qw), self._pad, dtype=np.int32)
        wide = {}
        for i, c in enumerate(group):
            if len(c) <= self.qcap:
                qpad_full[i, : len(c)] = c
        qfull_dev = jnp.asarray(qpad_full)

        def wide_q(i, granularity):
            # Over-capacity query pads, cached per rounding granularity:
            # QCAP steps for the cell kernel (SMEM-only cost, bounds the
            # compile cache) vs 256 for the portable scorer (its lax.scan
            # walks every padded row, so tight padding matters).
            key = (i, granularity)
            if key not in wide:
                c = group[i]
                w = np.full(
                    _round_up(len(c), granularity), self._pad, np.int32
                )
                w[: len(c)] = c
                wide[key] = jnp.asarray(w)
            return wide[key]
        per_scores: list[list] = [[] for _ in range(n)]
        id_parts: list[np.ndarray] = []
        # ndev > 1: per-chunk device-side candidate merge (per-shard
        # top-k + all_gather -> replicated, fetchable on every process
        # of a multi-host mesh); full sharded score rows cannot be
        # fetched to the host there.
        cand_scores: list[list] = [[] for _ in range(n)]
        cand_ids: list[list] = [[] for _ in range(n)]
        k = self.results_per_query
        pending: list[tuple] = []

        def stream_fn(key, build):
            # shard_map-jitted scorers must be cached across scans or every
            # call would retrace (jit caches by function identity).
            if key not in self._stream_fns:
                self._stream_fns[key] = build()
            return self._stream_fns[key]

        def drain(limit):
            while len(pending) > limit:
                entry = pending.pop(0)
                if entry[0] == "cand":
                    _, vg, ig = entry
                    vg, ig = np.asarray(vg), np.asarray(ig)
                    for i in range(n):
                        cand_scores[i].append(vg[i])
                        cand_ids[i].append(ig[i])
                    continue
                _, rows, sidx = entry
                ids = sidx.reshape(-1)
                keep = ids >= 0
                id_parts.append(ids[keep])
                for i in range(n):
                    per_scores[i].append(
                        np.asarray(rows[i]).reshape(-1)[keep]
                    )

        def score_one(xdev, b, i):
            c = group[i]
            nq = len(c)
            cu = sw_pallas_col.DEFAULT_UNROLL
            nq_pad = max(cu, -(-nq // cu) * cu)
            if (
                use_pallas
                and b.kernel == "col"
                and nq_pad > sw_pallas_col.NQC
            ):
                # Long query on a long-subject bucket: chunk the query
                # with H/F boundary carry instead of the portable scorer.
                if ndev == 1:
                    return sw_pallas_col.score_bucket_col_any_query(
                        xdev, c, self._matrix_flat, gop, gex, exact=True,
                        interpret=INTERPRET, pad=self._pad,
                    )
                qchunks, pcs = sh.make_query_chunks(
                    c, gop, gex, pad=self._pad
                )
                fn = stream_fn(
                    ("colchunk", len(qchunks)),
                    lambda: sh.build_sharded_col_chunked_scorer(
                        self.mesh, len(qchunks), exact=True
                    ),
                )
                return fn(
                    xdev, jnp.asarray(qchunks), jnp.asarray(pcs),
                    self._matrix_flat,
                )
            kind = bucket_kind(b, nq_pad=nq_pad)
            if nq > self.qcap and (
                kind == "row"
                or (kind == "cell" and nq > sw_pallas_cell.QCAP_MAX)
            ):
                kind = "jnp"  # beyond the kernels' SMEM query capacity
            if nq <= self.qcap:
                qdev = qfull_dev[i]
            else:
                # QCAP granularity only buys compile-cache sharing on the
                # Pallas cell kernel (whose DP loop stops at nq); the
                # portable scorer walks every padded row, so jnp pads
                # tight (the scan()/long-query fix, same rationale).
                gran = (
                    sw_pallas_cell.QCAP
                    if use_pallas and kind == "cell"
                    else 256
                )
                qdev = wide_q(i, gran)
            pq = jnp.asarray(np.array([nq, gop, gex, nq_pad], np.int32))
            if ndev == 1:
                return score_bucket(
                    xdev, qdev, self._matrix_flat, self._matrix_f32,
                    pq, use_pallas, kind, exact=True,
                )
            fn = stream_fn(
                ("one", kind),
                lambda: sh.build_sharded_bucket_scorer(
                    self.mesh, kind, use_pallas, exact=True
                ),
            )
            return fn(xdev, qdev, pq, self._matrix_flat, self._matrix_f32)

        for b, chunk, sidx in self._scan_chunks():
            xdev = self._put_chunk(chunk, b.tiles.shape[1:])
            rows: list = [None] * n
            if shorts:
                kind = bucket_kind(b, nq_pad=int(pads_b.max()))
                if use_pallas and kind == "cell":
                    if ndev == 1:
                        sb = sw_pallas_cell.score_bucket_pallas_cell_batch(
                            xdev, qb_dev, self._matrix_flat, pdev,
                            interpret=INTERPRET,
                        )
                    else:
                        fn = stream_fn(
                            "cellbatch",
                            lambda: sh.build_sharded_cell_batch_scorer(
                                self.mesh
                            ),
                        )
                        sb = fn(xdev, qb_dev, self._matrix_flat, pdev)
                    for slot, i in enumerate(shorts):
                        rows[i] = sb[slot]
                elif use_pallas and kind == "col":
                    # Flat-pool column kernel: all shorts share each
                    # streamed chunk's LUT build (verdict item 3).
                    from .ops import batch_col_scores, col_flat_plan

                    plan = col_flat_plan(pads_b, limit=len(shorts))
                    scorer = None
                    if ndev > 1:
                        def scorer(t, q, m, p, offs):
                            from .ops import sw_pallas_col as _spc

                            fmin = _spc.COL_FUSE_MIN_S
                            if fmin > 0 and len(offs) >= fmin:
                                fn = stream_fn(
                                    "colflatfused",
                                    lambda: (
                                        sh
                                        .build_sharded_col_batch_scorer_fused(
                                            self.mesh
                                        )
                                    ),
                                )
                                return fn(t, q, m, p)
                            fn = stream_fn(
                                ("colflat", offs),
                                lambda: (
                                    sh.build_sharded_col_batch_scorer(
                                        self.mesh, offs
                                    )
                                ),
                            )
                            return fn(t, q, m, p)
                    for s_part, slots in batch_col_scores(
                        xdev, qb_dev, self._matrix_flat, pdev, QB, plan,
                        interpret=INTERPRET, scorer=scorer,
                        pad=self._pad,
                    ):
                        for si, slot in enumerate(slots):
                            rows[shorts[slot]] = s_part[si]
                else:
                    for i in shorts:
                        rows[i] = score_one(xdev, b, i)
            for i in longs:
                rows[i] = score_one(xdev, b, i)
            if ndev > 1:
                fn = stream_fn(
                    ("chunkcand", n),
                    lambda: sh.build_sharded_chunk_candidates(
                        self.mesh, n, k
                    ),
                )
                sdev = (
                    sidx if isinstance(sidx, jax.Array)
                    else self._put_sharded(sidx)
                )
                vg, ig = fn(tuple(rows), sdev)
                pending.append(("cand", vg, ig))
            else:
                pending.append(("rows", rows, sidx))
            drain(2)
        drain(0)

        ids = None
        if ndev == 1:  # mesh scans merge via cand_scores/cand_ids only
            ids = (
                np.concatenate(id_parts) if id_parts
                else np.zeros(0, np.int32)
            )
        seconds = time.perf_counter() - t0
        db_chars = float(self.packed.total_real_chars)
        total_cells = sum(len(c) for c in group) * db_chars
        out = []
        for i, c in enumerate(group):
            if ndev > 1:
                scores = (
                    np.concatenate(cand_scores[i])
                    if cand_scores[i]
                    else np.zeros(0, np.float32)
                )
                ids_i_all = (
                    np.concatenate(cand_ids[i])
                    if cand_ids[i]
                    else np.zeros(0, np.int32)
                )
                keep = ids_i_all >= 0
                scores, ids_q = scores[keep], ids_i_all[keep]
            else:
                scores = (
                    np.concatenate(per_scores[i])
                    if per_scores[i]
                    else np.zeros(0, np.float32)
                )
                ids_q = ids
            if k == 0 or len(scores) == 0:
                vals_i, ids_i = np.zeros(0, np.float32), np.zeros(0, np.int32)
            else:
                order = np.lexsort((ids_q, -scores))[:k]
                vals_i, ids_i = scores[order], ids_q[order]
            cells = float(len(c)) * db_chars
            self._total_cells += cells
            q_seconds = (
                seconds * cells / total_cells if total_cells else seconds
            )
            out.append(
                ScanResult(
                    scores=[int(v) for v in vals_i],
                    reference_ids=[int(r) for r in ids_i],
                    stats=BenchmarkStats(
                        seconds=q_seconds,
                        gcups=(
                            cells / 1e9 / q_seconds if q_seconds > 0 else 0.0
                        ),
                    ),
                )
            )
        return out

    def _build_stream_pack(self, pack_cache: str | None):
        """Pack every bucket's tiles for host->HBM streaming
        (ops/pack5.py, codec in ``self._stream_codec``: b32 = 6 codes
        per int32 word, b21 = 7): streamed bytes drop 1.5-1.8x, which is
        the whole ballgame when the host->device link is the streaming
        bottleneck (network-attached TPU runtimes measure tens of MB/s;
        the reference's PCIe never has this problem so it streams raw
        bytes, dbbatching.cuh).

        The packed arrays live in disk-backed memmaps — a reusable
        ``<pack_cache>.pack5/`` sidecar when a cache path is given
        (manifest-validated; packed once per database), else anonymous
        temp files — so host RAM stays bounded.  Returns a per-bucket
        list of (packed [T, W] int32 memmap, packed pad-tile row [W]).
        """
        import json
        import tempfile

        from .ops import pack5 as p5

        codec = self._stream_codec
        _cpw, words_for, pack, _uj, _un, maxc = p5.CODECS[codec]
        assert int(self._pad) <= maxc, (codec, self._pad)
        buckets = self.packed.buckets
        # Total residues distinguishes DBs whose bucket geometry happens
        # to coincide (same validation pair as the main tile cache,
        # db/packing.py load_packed).
        from .db.packing import (
            _packed_layout,
            stream_manifest,
            stream_sidecar_fresh,
        )

        # A per-host partial raw store can only back a sidecar claiming
        # the same ranges — and that is also all this process ever
        # ships (its chunk-shard rows), so coverage of packed.tile_ranges
        # is the correctness condition, not complete coverage.
        own_ranges = getattr(self.packed, "tile_ranges", None)
        expect = stream_manifest(
            codec, int(self._pad), int(self.db.num_sequences),
            int(np.asarray(self.db.lengths, np.int64).sum()),
            _packed_layout(self.packed), ranges=own_ranges,
        )
        sidecar = pack_cache + ".pack5" if pack_cache else None
        fresh = False
        if sidecar:
            man_path = os.path.join(sidecar, "manifest.json")
            fresh = stream_sidecar_fresh(
                pack_cache, expect, need_ranges=own_ranges
            )
            if not fresh:
                # Invalidate BEFORE overwriting bucket files: an
                # interrupted re-pack (e.g. codec switch killed mid-way)
                # must not leave a manifest that validates mixed-layout
                # data on the next run.
                try:
                    os.remove(man_path)
                except OSError:
                    pass
        entries = []
        for bi, b in enumerate(buckets):
            tile_shape = b.tiles.shape[1:]
            E = int(np.prod(tile_shape))
            W = words_for(E)
            T = b.num_tiles
            pad_row = pack(
                np.full((1,) + tuple(tile_shape), self._pad, np.int8)
            )[0]
            if T == 0:
                entries.append((np.empty((0, W), np.int32), pad_row))
                continue
            mm = None
            persistent = False
            if sidecar:
                # The sidecar is best-effort, like the main tile cache: a
                # read-only DB directory or a truncated file falls back
                # to anonymous temp files instead of failing the scan.
                # (np.memmap raises ValueError, not OSError, when the
                # file is smaller than the requested shape.)
                try:
                    path = os.path.join(sidecar, f"b{bi}.bin")
                    if fresh:
                        mm = np.memmap(
                            path, np.int32, mode="r", shape=(T, W)
                        )
                        entries.append((mm, pad_row))
                        continue
                    os.makedirs(sidecar, exist_ok=True)
                    mm = np.memmap(path, np.int32, mode="w+", shape=(T, W))
                    persistent = True
                except (OSError, ValueError):
                    sidecar = None
                    mm = None
                    persistent = False
            if mm is None:
                f = tempfile.TemporaryFile(
                    prefix=f"cudasw4_pack5_b{bi}_"
                )
                f.truncate(T * W * 4)
                mm = np.memmap(f, np.int32, mode="w+", shape=(T, W))
            # Anonymous temp packs skip the pinned resident prefix (those
            # rows never stream; the untouched pages are never even
            # materialized).  A reusable sidecar packs everything — it
            # outlives this engine and must stay budget-independent.
            start = 0 if persistent else self._res_tiles.get(bi, 0)
            if start < T:
                pack(b.tiles[start:], out=mm[start:])
            entries.append((mm, pad_row))
        if sidecar and not fresh:
            try:
                with open(os.path.join(sidecar, "manifest.json"), "w") as f:
                    json.dump(expect, f)
            except OSError:
                pass
        if self.verbose:
            total = sum(mm.nbytes for mm, _ in entries)
            bits = 32.0 / _cpw
            print(
                f"Streaming transfer pack: {codec} tiles "
                f"({bits:.2f} bits/char), {total/2**20:.0f}"
                f" MiB per full stream ({8.0/bits:.2f}x under raw)"
            )
        return entries

    def _put_sharded(self, arr):
        """Host->device transfer of ``arr`` with the chunk sharding
        (parallel.sharding.put_sharded: make_array_from_callback on
        multiprocess meshes so each host reads only its own rows,
        plain device_put single-process)."""
        from .parallel.sharding import put_sharded

        return put_sharded(arr, self._chunk_sharding)

    def _put_chunk(self, chunk, tile_shape=None):
        """Host->device transfer of one streamed chunk (tile-sharded over
        the mesh when one is configured).  int32 chunks are packed
        transfers (ops/pack5.py, codec self._stream_codec): shipped
        packed, unpacked on device into the int8 tiles the kernels
        consume — the unpack is elementwise along the (sharded) tile
        axis, so it runs per shard."""
        from .ops.pack5 import CODECS

        packed = chunk.dtype == jnp.int32 or chunk.dtype == np.int32
        unpack = CODECS[self._stream_codec][3] if packed else None
        if isinstance(chunk, jax.Array):
            # Already on device: the resident prefix (int8 tiles) or a
            # chunk the prefetch worker committed with device_put
            # (round 5) — packed ones still need the on-device unpack.
            if packed:
                return unpack(chunk, tuple(tile_shape))
            return chunk
        if self._mesh_ndev() > 1:
            xdev = self._put_sharded(chunk)
            return unpack(xdev, tuple(tile_shape)) if packed else xdev
        if packed:
            # Prefetch worker off (CUDASW4_TPU_STREAM_PREFETCH=0): feed
            # the host array straight to the jitted unpack — better
            # than an UNFORCED device_put chained into the call, which
            # measured 4x slower in round 2 (the execute stalled on the
            # in-flight transfer).  The fast path is the worker-side
            # FORCED device_put (round 5): the transfer fully overlaps
            # device compute on a second thread (tools/linkbench.py,
            # docs/PERFORMANCE.md streaming speed-of-light).
            return unpack(np.ascontiguousarray(chunk), tuple(tile_shape))
        return jax.device_put(chunk)

    def _stream_chunks(self):
        """Yield (bucket, chunk, chunk_seq_index) with fixed chunk shapes
        per bucket (padding the final partial chunk).  Chunk tile counts
        are multiples of the mesh size so each chunk shards evenly.  With
        the 5-bit transfer pack enabled, ``chunk`` is the packed int32
        representation ([ct, W]); ``_put_chunk`` unpacks on device."""
        ndev = self._mesh_ndev()
        spack = getattr(self, "_stream_pack", None)
        res = getattr(self, "_res_tiles", {})
        for bi, b in enumerate(self.packed.buckets):
            ct = self._chunk_tiles(b, ndev)
            T = b.num_tiles
            if spack is not None:
                src, pad_row = spack[bi]
            else:
                src, pad_row = b.tiles, None
            # The resident prefix (whole ct-sized chunks pinned on
            # device at set_database) never re-streams.
            for t0 in range(res.get(bi, 0), T, ct):
                t1 = min(t0 + ct, T)
                chunk = src[t0:t1]
                sidx = b.seq_index[t0:t1]
                if t1 - t0 < ct:
                    pad = ct - (t1 - t0)
                    if spack is not None:
                        filler = np.broadcast_to(
                            pad_row, (pad,) + pad_row.shape
                        )
                    else:
                        filler = np.full(
                            (pad,) + b.tiles.shape[1:], self._pad, np.int8
                        )
                    chunk = np.concatenate([chunk, filler])
                    sidx = np.concatenate(
                        [sidx, np.full((pad, b.NS), -1, np.int32)]
                    )
                yield b, chunk, sidx

    def _scan_chunks(self):
        """All chunks of one scan pass: the device-resident prefix first
        (no host work at all), then the streamed remainder.  The
        prefetch worker starts immediately, so the first streamed
        chunk's disk page-in overlaps the resident-prefix compute
        instead of stalling the dispatch thread when the prefix runs
        out."""
        stream = self._stream_chunks_prefetched()
        try:
            for bi, xdev, sidx in getattr(self, "_resident_chunks", []):
                yield self.packed.buckets[bi], xdev, sidx
            yield from stream
        finally:
            stream.close()

    def _stream_chunks_prefetched(self, depth: int = 2):
        """`_stream_chunks` with the host-side chunk assembly (memmap/disk
        read, tail padding, contiguity copy) moved onto a worker thread,
        a ``depth``-deep queue ahead of the device.  Streamed tiles live
        in disk-backed memmaps, so without this the page-in of chunk t+1
        sits on the dispatch thread's critical path between device calls
        — the analog of the reference's pinned-copy worker thread
        (cudasw4.cuh:1649-1707, cudaLaunchHostFunc copy path).  Pure
        numpy in the worker; all jax dispatch stays on the caller's
        thread.  The worker starts at CALL time (not first iteration) so
        callers can warm it while doing other work; if the returned
        generator is never iterated, a finalizer stops the thread.
        Disable with CUDASW4_TPU_STREAM_PREFETCH=0."""
        import queue
        import threading
        import weakref

        if os.environ.get("CUDASW4_TPU_STREAM_PREFETCH", "1") != "1":
            return self._stream_chunks()
        q: queue.Queue = queue.Queue(maxsize=depth)
        stop = threading.Event()
        DONE = object()

        def put(item) -> bool:
            # Bounded put that gives up once the consumer is gone, so an
            # aborted scan never leaves the worker blocked holding chunk
            # buffers.
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.5)
                    return True
                except queue.Full:
                    continue
            return False

        # Single-process: also START the host->device transfer on this
        # thread (device_put; the returned handle's bytes spool to the
        # device in the background at the measured link rate while
        # earlier chunks compute).  The queue's depth gives each
        # transfer a full chunk-compute of lead time, so the consumer's
        # execute rarely waits on arrival — unlike round 2's "chain a
        # device_put straight into the jit call", which had zero lead
        # and measured 4x slower.  Do NOT force arrival with a read:
        # a read-back program queues BEHIND the in-flight compute on
        # the device's single execution stream and drains the pipeline
        # (measured -15% vs just handing over the in-flight handle).
        # Mesh chunks keep the consumer-side sharded transfer.  Kill
        # switch: CUDASW4_TPU_STREAM_DEVPUT=0.
        devput = (
            self._mesh_ndev() == 1
            and os.environ.get("CUDASW4_TPU_STREAM_DEVPUT", "1") == "1"
        )

        def worker():
            try:
                for b, chunk, sidx in self._stream_chunks():
                    # Force a real copy: a contiguous memmap slice is a
                    # no-copy view, and the point of this thread is to
                    # take the disk page-in off the dispatch thread.
                    arr = np.array(chunk, copy=True)
                    if devput:
                        arr = jax.device_put(arr)
                    if not put((b, arr, sidx)):
                        return
                put(DONE)
            except BaseException as e:  # propagate to the consumer
                put(e)

        t = threading.Thread(
            target=worker, name="cudasw4-stream-prefetch", daemon=True
        )
        t.start()

        def consume():
            try:
                while True:
                    item = q.get()
                    if item is DONE:
                        break
                    if isinstance(item, BaseException):
                        raise item
                    yield item
            finally:
                stop.set()

        gen = consume()
        # A generator that is never started never runs its finally;
        # stop the worker on GC regardless.
        weakref.finalize(gen, stop.set)
        return gen

