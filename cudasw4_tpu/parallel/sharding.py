"""Multi-chip database sharding and collective top-N merge.

TPU-native replacement for the reference's multi-GPU strategy
(/root/reference/src/cudasw4.cuh:928-1004, 1362-1463): there, each length
partition's sequences are split across GPUs by char count, queries are
broadcast, per-GPU top-k lists are copied peer-to-peer onto a master GPU
and merge-sorted.  Here, every bucket's tile axis is sharded over a 1-D
``jax.sharding.Mesh`` ("d"), the query/params/matrix ride replicated, and a
``shard_map`` program does per-shard scoring + local top-k, then a tiny
``all_gather`` of k candidates per shard (scores+ids, a few KB) and a
replicated final top-k — collectives ride ICI instead of PCIe peer copies,
and the "master GPU" disappears.

Tile-granular sharding of each bucket approximates the reference's
char-balanced split: tiles of one bucket are equal-sized, and every shard
gets the same tile count per bucket (padding tiles are scored but masked).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import UNKNOWN
from ..db.packing import PackedDB
from ..ops import score_bucket


def make_mesh(devices=None, axis: str = "d") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def _merge_topk(scores, ids, k: int, axis: str):
    """Per-shard top-k, then gather k candidates per shard (tiny) and merge.

    k==0 (--top 0 benchmarking) still selects one so the score kernels are
    not dead-code-eliminated; callers slice to k on the way out.  Equal
    scores resolve to the lowest reference id (the engine-wide tie rule,
    docs/PARITY.md): within a shard the concat slot order is ascending-id
    (each bucket's shard slice is a contiguous ascending range and buckets
    cover ascending length-sorted ranges), so per-shard ``top_k`` already
    breaks ties by id; the final merge over the gathered candidates (a few
    dozen elements) sorts explicitly by (-score, id) — shard order alone
    is NOT id order when the DB has more than one bucket."""
    kl = max(1, min(k, scores.shape[0]))
    v, i = jax.lax.top_k(scores, kl)
    ids_sel = jnp.take(ids, i)
    vg = jax.lax.all_gather(v, axis).reshape(-1)
    ig = jax.lax.all_gather(ids_sel, axis).reshape(-1)
    kf = max(1, min(k, vg.shape[0]))
    order = jnp.lexsort((ig, -vg))[:kf]
    return jnp.take(vg, order), jnp.take(ig, order)


def make_query_chunks(codes, gop: int, gex: int, unroll: int | None = None,
                      pad: int | None = None):
    """Split an encoded query into NQC-row chunks for the column kernel's
    boundary-carry multi-pass (qchunks [C, NQC] int32, pcs [C, 4] int32)."""
    from ..ops import sw_pallas_col

    n = len(codes)
    qs, ps = [], []
    for s in range(0, max(n, 1), sw_pallas_col.NQC):
        qpad, nq_pad = sw_pallas_col.pad_query_chunk(
            codes[s : s + sw_pallas_col.NQC], unroll, pad=pad
        )
        qs.append(qpad)
        ps.append([nq_pad, gop, gex, 0])
    return np.stack(qs), np.array(ps, np.int32)


def _col_chunked_local(tiles, qchunks, pcs, mat_flat, nchunks: int, exact):
    """Chunked-query column-kernel scan over one (shard-local) tile array:
    the H/F bottom-row boundary carries between query chunks inside the
    jit, so state never crosses the shard_map (it is per-subject, hence
    per-shard — the analog of the reference's per-GPU 4 GiB temp,
    /root/reference/src/cudasw4.cuh:1928-1947).  Tiles are processed in
    groups bounding the carry temp (COL_CARRY_TEMP_BYTES per shard),
    mirroring the reference's maxTempBytes subject batching.

    KEEP IN SYNC with ops/sw_pallas_col.py::score_bucket_col_any_query
    (the single-device twin).  Intentional divergence: the eager twin
    pipelines groups lag-1 (two groups' carries live at once, hiding
    the host round-trip), while this shard_map body strictly serializes
    groups via a fake data dependency — host syncs are impossible here
    and XLA would otherwise schedule every group's carry live at
    once."""
    from ..ops import INTERPRET, sw_pallas_col

    T, L, g, nsl = tiles.shape
    per_tile = 2 * L * g * nsl * 4
    tc = T if nchunks == 1 else max(
        1, min(T, sw_pallas_col.COL_CARRY_TEMP_BYTES // per_tile)
    )
    parts = []
    prev_best = None
    for t0 in range(0, T, tc):
        sub = tiles[t0 : t0 + tc]
        if prev_best is not None:
            # Serialize tile groups inside the jit: a data dependency on
            # the previous group's result keeps XLA from scheduling two
            # groups' multi-GB carry temps live at once (the eager path
            # host-syncs per group for the same reason).
            sub = sub + (prev_best[0, 0] * 0).astype(sub.dtype)
        best = None
        state = None
        for c in range(nchunks):
            emit = c + 1 < nchunks
            res = sw_pallas_col.score_bucket_pallas_col(
                sub, qchunks[c], mat_flat, pcs[c],
                state_in=state, take_init=c > 0, emit_state=emit,
                exact=exact, interpret=INTERPRET,
            )
            if emit:
                scores, state = res
            else:
                scores = res
            best = scores if best is None else jnp.maximum(best, scores)
        parts.append(best)
        prev_best = best
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def pad_tiles_for_mesh(packed: PackedDB, ndev: int,
                       pad: int = UNKNOWN) -> None:
    """Pad each bucket's tile count to a multiple of ndev (in place), adding
    all-padding tiles (seq_index=-1) that can never win top-k."""
    for b in packed.buckets:
        T = b.tiles.shape[0]
        Tp = ((T + ndev - 1) // ndev) * ndev
        if Tp == T:
            continue
        extra = Tp - T
        b.tiles = np.concatenate(
            [b.tiles, np.full((extra,) + b.tiles.shape[1:], pad, np.int8)]
        )
        b.seq_index = np.concatenate(
            [b.seq_index, np.full((extra, b.NS), -1, np.int32)]
        )
        b.lengths = np.concatenate(
            [b.lengths, np.zeros((extra, b.NS), np.int32)]
        )


def shard_bucket_arrays(packed: PackedDB, mesh: Mesh,
                        codec: str | None = None, pack_min: int = 1 << 20):
    """Device-put every bucket's tiles + seq_index sharded along tiles.

    ``codec`` (ops/pack5.py name): ship tiles packed and unpack on
    device — the unpack is elementwise along the (sharded) tile axis, so
    each chip unpacks its own shard with no collectives.  1.5-1.75x
    fewer host->HBM bytes at set_database time."""
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    put = put_sharded

    def put_tiles(b):
        if codec is None or b.tiles.size < pack_min:
            return put(b.tiles, sh)
        from ..ops.pack5 import CODECS, pack_to_tempmm

        unpack = CODECS[codec][3]
        T = b.tiles.shape[0]
        W = CODECS[codec][1](int(np.prod(b.tiles.shape[1:])))
        # Multiprocess: pack ONLY the rows this process's devices will
        # read back through the callback (the rest stay sparse-file
        # holes) — a full-bucket pack per host costs T*W*4 temp bytes
        # and the whole CPU pack x num_hosts for rows nobody reads.
        rows = (
            addressable_row_ranges(sh, (T, W))
            if jax.process_count() > 1 else None
        )
        return unpack(
            put(pack_to_tempmm(b.tiles, codec, rows=rows), sh),
            tuple(b.tiles.shape[1:]),
        )

    tiles = tuple(put_tiles(b) for b in packed.buckets)
    seq_idx = tuple(put(b.seq_index, sh) for b in packed.buckets)
    return tiles, seq_idx, rep


def put_sharded(arr, sharding):
    """Host->device transfer of ``arr`` under ``sharding``.

    Multiprocess device_put of host data asserts the full value is
    identical on every process — a cross-host broadcast+compare of the
    whole array, which at DB scale is most of set_database, and exactly
    false for per-host partial tile stores (each host materializes only
    its own tile ranges; the rest are sparse-file holes).
    make_array_from_callback reads only each process's own rows (and
    never pages in the rest of a memmap-backed store).  Single-process
    keeps the plain device_put (one transfer, no callback plumbing).
    Shared by the resident shard upload above and the streaming chunk
    path (engine_streaming._put_sharded)."""
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            arr.shape, sharding,
            lambda idx: np.ascontiguousarray(arr[idx]),
        )
    return jax.device_put(arr, sharding)


def addressable_row_ranges(sharding, shape):
    """Merged (start, stop) leading-axis index ranges owned by THIS
    process's devices under ``sharding`` for a ``shape``-d array."""
    spans = []
    for idx in sharding.addressable_devices_indices_map(shape).values():
        sl = idx[0]
        start = 0 if sl.start is None else int(sl.start)
        stop = shape[0] if sl.stop is None else int(sl.stop)
        spans.append((start, stop))
    spans.sort()
    merged: list[list[int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    return [(s, e) for s, e in merged]


def build_sharded_batch_scan(
    mesh: Mesh, kinds: tuple, use_pallas: bool, k: int, QB: int,
    plan=(), pad: int | None = None, rtot: int | None = None,
):
    """Batched variant of build_sharded_scan: scores QB queries per pass
    (cell buckets use the multi-query batch kernel, col buckets the
    flat-pool column kernel — one tile stream for the whole batch), with
    per-query local top-k + all_gather merge.  ``plan`` from
    ops.col_flat_plan.

    Returns jitted (queries [QB, QCAP_BATCH], qpad_full [QB, QCAP],
    params [4+2*QB], tiles_tuple, idx_tuple, mat_flat, mat_f32) ->
    (scores [QB, k], reference_ids [QB, k]) replicated.
    """
    import jax.numpy as jnp

    from ..ops import INTERPRET, batch_col_scores, sw_pallas_cell

    axis = mesh.axis_names[0]

    def body(queries, qpad_full, params, tiles_tuple, idx_tuple,
             mat_flat, mat_f32):
        per_qb = [[] for _ in range(QB)]
        idparts = []
        for tiles, sidx, kind in zip(tiles_tuple, idx_tuple, kinds):
            if use_pallas and kind == "cell":
                s = sw_pallas_cell.score_bucket_pallas_cell_batch(
                    tiles, queries, mat_flat, params, interpret=INTERPRET
                )
                for qb in range(QB):
                    per_qb[qb].append(s[qb].reshape(-1))
            elif use_pallas and kind == "col":
                # Slots outside the plan (partial-batch tails) fill
                # with zeros, discarded when the caller slices to the
                # real group.
                got = [None] * QB
                for s_part, slots in batch_col_scores(
                    tiles, queries, mat_flat, params, QB, plan,
                    interpret=INTERPRET, pad=pad, rtot=rtot,
                ):
                    for si, slot in enumerate(slots):
                        got[slot] = s_part[si].reshape(-1)
                ns = tiles.shape[0] * tiles.shape[2] * tiles.shape[3]
                zero = jnp.zeros(ns, jnp.float32)
                for qb in range(QB):
                    per_qb[qb].append(
                        got[qb] if got[qb] is not None else zero
                    )
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
            idparts.append(sidx.reshape(-1))
        ids = jnp.concatenate(idparts) if len(idparts) > 1 else idparts[0]
        rows = jnp.stack([
            jnp.concatenate(p) if len(p) > 1 else p[0] for p in per_qb
        ])
        vg, ig = _shard_candidates(rows, ids, k, axis)
        kf = max(1, min(k, vg.shape[1]))
        # Ties -> lowest id (see _merge_topk): per-row lexsort over the
        # tiny gathered candidate lists.
        order = jax.vmap(lambda vv, ii: jnp.lexsort((ii, -vv))[:kf])(vg, ig)
        return (
            jnp.take_along_axis(vg, order, axis=1),
            jnp.take_along_axis(ig, order, axis=1),
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_scan(
    mesh: Mesh, kinds: tuple, use_pallas: bool, k: int, exact: bool = False
):
    """Returns jitted (qpad, params, tiles_tuple, idx_tuple, mat_flat,
    mat_f32) -> (scores [k], reference_ids [k]) replicated.

    With ``exact=False`` (int16-state fast pass) a third output is a
    per-bucket tuple of REPLICATED per-tile score maxes [T] — a max >=
    SAT marks the tile as holding a saturated score, the overflow set
    the exact mesh re-score pass targets (build_sharded_overflow_rescore;
    the reference records overflowed ids on every path,
    /root/reference/src/float_kernels.cuh:1189-1260).  One f32 per tile
    rides the all_gather — negligible next to the k-candidate merge."""
    axis = mesh.axis_names[0]

    def body(qpad, params, tiles_tuple, idx_tuple, mat_flat, mat_f32):
        parts, idparts, tmaxes = [], [], []
        for tiles, sidx, kind in zip(tiles_tuple, idx_tuple, kinds):
            s = score_bucket(
                tiles, qpad, mat_flat, mat_f32, params, use_pallas, kind,
                exact=exact,
            )
            parts.append(s.reshape(-1))
            idparts.append(sidx.reshape(-1))
            if not exact:
                tmaxes.append(jax.lax.all_gather(
                    jnp.max(s, axis=1), axis, axis=0, tiled=True
                ))
        scores = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        ids = jnp.concatenate(idparts) if len(idparts) > 1 else idparts[0]
        scores = jnp.where(ids >= 0, scores, -1.0)
        vals, out_ids = _merge_topk(scores, ids, k, axis)
        if exact:
            return vals, out_ids
        return vals, out_ids, tuple(tmaxes)

    out_specs = (P(), P()) if exact else (
        P(), P(), tuple(P() for _ in kinds)
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_scan_chunked(
    mesh: Mesh, kinds: tuple, use_pallas: bool, k: int, nchunks: int,
    exact: bool = False,
):
    """Sharded scan for queries beyond the column kernel's NQC row capacity:
    col buckets run the chunked-query boundary-carry multi-pass per shard
    (no collective — DP state is per-subject); other buckets score with the
    full query as usual.  The reference runs its multi-pass kernels on every
    GPU the same way (/root/reference/src/cudasw4.cuh:1920-2096).

    Returns jitted (qchunks [C, NQC], pcs [C, 4], qpad, params, tiles_tuple,
    idx_tuple, mat_flat, mat_f32) -> (scores [k], ids [k]) replicated.
    """
    axis = mesh.axis_names[0]

    def body(qchunks, pcs, qpad, params, tiles_tuple, idx_tuple,
             mat_flat, mat_f32):
        parts, idparts, tmaxes = [], [], []
        for tiles, sidx, kind in zip(tiles_tuple, idx_tuple, kinds):
            if use_pallas and kind == "col":
                s = _col_chunked_local(
                    tiles, qchunks, pcs, mat_flat, nchunks, exact
                )
            else:
                s = score_bucket(
                    tiles, qpad, mat_flat, mat_f32, params, use_pallas,
                    kind, exact=exact,
                )
            parts.append(s.reshape(-1))
            idparts.append(sidx.reshape(-1))
            if not exact:
                tmaxes.append(jax.lax.all_gather(
                    jnp.max(s, axis=1), axis, axis=0, tiled=True
                ))
        scores = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        ids = jnp.concatenate(idparts) if len(idparts) > 1 else idparts[0]
        scores = jnp.where(ids >= 0, scores, -1.0)
        vals, out_ids = _merge_topk(scores, ids, k, axis)
        if exact:
            return vals, out_ids
        return vals, out_ids, tuple(tmaxes)

    out_specs = (P(), P()) if exact else (
        P(), P(), tuple(P() for _ in kinds)
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_overflow_rescore(
    mesh: Mesh, kinds: tuple, use_pallas: bool, k: int, caps: tuple,
    nchunks: int = 0,
):
    """Exact-int32 mesh re-score of ONLY the saturated tiles.

    The multi-chip analog of the reference's overflow reprocessing
    (/root/reference/src/cudasw4.cuh:2117-2186): per shard and per
    bucket, the ``caps[b]`` tiles with the highest fast-pass maxes are
    gathered by index (a fixed-capacity overflow buffer, like
    d_overflow_positions), re-scored with int32 state, masked down to
    the genuinely saturated ones (tile max >= SAT), and reduced to k
    (score, id) candidates that an all_gather replicates.  The host
    merges them into the fast top-k (engine._rescore_overflow_mesh).
    ``caps[b] == 0`` skips bucket b entirely; the engine picks caps as
    the max per-shard saturated-tile count (power-of-two quantised so
    the compile cache stays small) and falls back to a full exact
    re-scan when a shard exceeds CUDASW4_TPU_OVF_TILE_CAP.

    ``nchunks > 0`` routes col buckets through the chunked-query
    boundary-carry path (queries beyond NQC rows); the two leading
    inputs qchunks/pcs are ignored when 0 (pass 1-element dummies).

    Returns jitted (qchunks, pcs, qpad, params, tiles_tuple, idx_tuple,
    tmax_tuple, mat_flat, mat_f32) -> (cand_scores [ndev*kl],
    cand_ids [ndev*kl]) replicated, invalid slots scored -1.
    """
    from ..ops import sw_pallas_cell

    axis = mesh.axis_names[0]

    def body(qchunks, pcs, qpad, params, tiles_tuple, idx_tuple,
             tmax_tuple, mat_flat, mat_f32):
        sat = float(sw_pallas_cell.SAT)
        cvs, cis = [], []
        for tiles, sidx, tmax, kind, cap in zip(
            tiles_tuple, idx_tuple, tmax_tuple, kinds, caps
        ):
            if cap == 0:
                continue
            tv, sel = jax.lax.top_k(tmax, cap)
            sub = jnp.take(tiles, sel, axis=0)
            if use_pallas and kind == "col" and nchunks:
                s = _col_chunked_local(
                    sub, qchunks, pcs, mat_flat, nchunks, exact=True
                )
            else:
                s = score_bucket(
                    sub, qpad, mat_flat, mat_f32, params, use_pallas,
                    kind, exact=True,
                )
            ssel = jnp.take(sidx.reshape(tmax.shape[0], -1), sel, axis=0)
            valid = (tv >= sat)[:, None] & (ssel >= 0)
            s = jnp.where(valid, s.reshape(ssel.shape), -1.0)
            cvs.append(s.reshape(-1))
            cis.append(ssel.reshape(-1))
        flatv = jnp.concatenate(cvs) if len(cvs) > 1 else cvs[0]
        flati = jnp.concatenate(cis) if len(cis) > 1 else cis[0]
        kl = max(1, min(k, flatv.shape[0]))
        v, i = jax.lax.top_k(flatv, kl)
        ids_sel = jnp.take(flati, i)
        vg = jax.lax.all_gather(v, axis, axis=0, tiled=True)
        ig = jax.lax.all_gather(ids_sel, axis, axis=0, tiled=True)
        return vg, ig

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis),
                  tuple(P(axis) for _ in kinds), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


# ---------------------------------------------------------------- streaming
# Scorers for host->HBM streamed chunks on a mesh: each fixed-shape chunk's
# tile axis is sharded, every chip scores its tiles, and the per-chunk score
# arrays come back tile-sharded (the host-side merge gathers them — scores
# are ~1/L the size of the tiles).  This is the reference's batched copy
# pipeline running identically on every GPU (cudasw4.cuh:1490-2262) mapped
# onto a mesh.


def _shard_candidates(rows, ids, k: int, axis: str):
    """Per-shard candidate reduction shared by the resident batch scan
    and the streamed-chunk merge: mask invalid slots (id < 0) to -1.0
    (SW scores are non-negative), per-row top-k (>= 1 so the kernels are
    never dead-code-eliminated at k=0), map to global ids, all_gather
    along the candidate axis.  rows [n, local], ids [local] ->
    (scores [n, ndev*kl], ids [n, ndev*kl]) replicated."""
    rows = jnp.where((ids >= 0)[None, :], rows, -1.0)
    kl = max(1, min(k, rows.shape[1]))
    v, i = jax.lax.top_k(rows, kl)
    ids_sel = jnp.take(ids, i)
    vg = jax.lax.all_gather(v, axis, axis=1).reshape(rows.shape[0], -1)
    ig = jax.lax.all_gather(ids_sel, axis, axis=1).reshape(
        rows.shape[0], -1
    )
    return vg, ig


def build_sharded_chunk_candidates(mesh: Mesh, n: int, k: int):
    """jitted (rows_tuple of n tile-sharded score arrays, sidx sharded
    the same way) -> (scores [n, ndev*kl], ids [n, ndev*kl]) replicated.

    The multiprocess-safe fetch of one streamed chunk's results: fetching
    tile-sharded scores to the host is impossible on a multi-host mesh
    (non-addressable shards), so each shard reduces to its top-k
    candidates and an ``all_gather`` replicates them (a few KB) — the
    reference's per-GPU top-k + master-GPU merge per batch
    (/root/reference/src/cudasw4.cuh:1362-1463), per streamed chunk.
    Ties at the per-shard boundary resolve to the lowest id because a
    chunk is a contiguous slice of one bucket's tiles, whose slot order
    is ascending-id (see _merge_topk); the host's final
    lexsort((ids, -scores)) over all chunks' candidates applies the
    engine-wide rule.  Invalid (padding) slots carry id -1 and score -1;
    the host filters them."""
    axis = mesh.axis_names[0]

    def body(rows_tuple, sidx):
        ids = sidx.reshape(-1)
        rows = jnp.stack([r.reshape(-1) for r in rows_tuple])
        return _shard_candidates(rows, ids, k, axis)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(tuple(P(axis) for _ in range(n)), P(axis)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_bucket_scorer(
    mesh: Mesh, kind: str, use_pallas: bool, exact: bool = False
):
    """jitted (tiles, qpad, params, mat_flat, mat_f32) -> scores [T, NS]
    with the tile axis sharded in and out."""
    axis = mesh.axis_names[0]

    def body(tiles, qpad, params, mat_flat, mat_f32):
        return score_bucket(
            tiles, qpad, mat_flat, mat_f32, params, use_pallas, kind,
            exact=exact,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_cell_batch_scorer(mesh: Mesh):
    """jitted (tiles, queries, mat_flat, params) -> scores [QB, T, NS]
    via the multi-query cell kernel, tile axis sharded."""
    from ..ops import INTERPRET, sw_pallas_cell

    axis = mesh.axis_names[0]

    def body(tiles, queries, mat_flat, params):
        return sw_pallas_cell.score_bucket_pallas_cell_batch(
            tiles, queries, mat_flat, params, interpret=INTERPRET
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_col_batch_scorer(mesh: Mesh, offs: tuple = ()):
    """jitted (tiles, queries [S, W], mat_flat, params [4+S]) ->
    scores [S, T, NS] via the flat-pool column kernel (static state-pool
    ``offs`` per slot), tile axis sharded (streamed-chunk scorer for
    batches on a mesh)."""
    from ..ops import INTERPRET, sw_pallas_col

    axis = mesh.axis_names[0]

    def body(tiles, queries, mat_flat, params):
        return sw_pallas_col.score_bucket_pallas_col_flat(
            tiles, queries, mat_flat, params, offs=offs,
            interpret=INTERPRET, exact=True,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_col_batch_scorer_fused(mesh: Mesh):
    """Masked-fused twin of build_sharded_col_batch_scorer: slots pack
    gapless into one row walk, so no static offsets — one builder (and
    one compiled program per slot count) serves every composition."""
    from ..ops import INTERPRET, sw_pallas_col

    axis = mesh.axis_names[0]

    def body(tiles, queries, mat_flat, params):
        return sw_pallas_col.score_bucket_pallas_col_flat_fused(
            tiles, queries, mat_flat, params,
            interpret=INTERPRET, exact=True,
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(None, axis),
        check_vma=False,
    )
    return jax.jit(mapped)


def build_sharded_col_chunked_scorer(
    mesh: Mesh, nchunks: int, exact: bool = False
):
    """jitted (tiles, qchunks, pcs, mat_flat) -> scores [T, NS], tile axis
    sharded: the full chunked-query col scan of one streamed chunk, with
    the H/F boundary carry kept shard-local inside the jit."""
    axis = mesh.axis_names[0]

    def body(tiles, qchunks, pcs, mat_flat):
        return _col_chunked_local(
            tiles, qchunks, pcs, mat_flat, nchunks, exact
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=P(axis),
        check_vma=False,
    )
    return jax.jit(mapped)
