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


def pad_tiles_for_mesh(packed: PackedDB, ndev: int) -> None:
    """Pad each bucket's tile count to a multiple of ndev (in place), adding
    all-padding tiles (seq_index=-1) that can never win top-k."""
    for b in packed.buckets:
        T = b.tiles.shape[0]
        Tp = ((T + ndev - 1) // ndev) * ndev
        if Tp == T:
            continue
        extra = Tp - T
        b.tiles = np.concatenate(
            [b.tiles, np.full((extra,) + b.tiles.shape[1:], UNKNOWN, np.int8)]
        )
        b.seq_index = np.concatenate(
            [b.seq_index, np.full((extra, b.NS), -1, np.int32)]
        )
        b.lengths = np.concatenate(
            [b.lengths, np.zeros((extra, b.NS), np.int32)]
        )


def shard_bucket_arrays(packed: PackedDB, mesh: Mesh):
    """Device-put every bucket's tiles + seq_index sharded along tiles."""
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    tiles = tuple(jax.device_put(b.tiles, sh) for b in packed.buckets)
    seq_idx = tuple(jax.device_put(b.seq_index, sh) for b in packed.buckets)
    return tiles, seq_idx, rep


def build_sharded_batch_scan(
    mesh: Mesh, kinds: tuple, use_pallas: bool, k: int, QB: int
):
    """Batched variant of build_sharded_scan: scores QB queries per pass
    (cell buckets use the multi-query batch kernel, one tile stream for
    the whole batch), with per-query local top-k + all_gather merge.

    Returns jitted (queries [QB, QCAP_BATCH], qpad_full [QB, QCAP],
    params [4+2*QB], tiles_tuple, idx_tuple, mat_flat, mat_f32) ->
    (scores [QB, k], reference_ids [QB, k]) replicated.
    """
    import jax.numpy as jnp

    from ..ops import sw_pallas_cell

    axis = mesh.axis_names[0]

    def body(queries, qpad_full, params, tiles_tuple, idx_tuple,
             mat_flat, mat_f32):
        per_qb = [[] for _ in range(QB)]
        idparts = []
        for tiles, sidx, kind in zip(tiles_tuple, idx_tuple, kinds):
            if use_pallas and kind == "cell":
                s = sw_pallas_cell.score_bucket_pallas_cell_batch(
                    tiles, queries, mat_flat, params
                )
                for qb in range(QB):
                    per_qb[qb].append(s[qb].reshape(-1))
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
        rows = jnp.where((ids >= 0)[None, :], rows, -1.0)
        kl = max(1, min(k, rows.shape[1]))
        v, i = jax.lax.top_k(rows, kl)  # [QB, kl]
        ids_sel = jnp.take(ids, i)
        vg = jax.lax.all_gather(v, axis, axis=1).reshape(QB, -1)
        ig = jax.lax.all_gather(ids_sel, axis, axis=1).reshape(QB, -1)
        kf = max(1, min(k, vg.shape[1]))
        vfin, ifin = jax.lax.top_k(vg, kf)
        return vfin, jnp.take_along_axis(ig, ifin, axis=1)

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
    mat_f32) -> (scores [k], reference_ids [k]) replicated."""
    axis = mesh.axis_names[0]

    def body(qpad, params, tiles_tuple, idx_tuple, mat_flat, mat_f32):
        parts, idparts = [], []
        for tiles, sidx, kind in zip(tiles_tuple, idx_tuple, kinds):
            s = score_bucket(
                tiles, qpad, mat_flat, mat_f32, params, use_pallas, kind,
                exact=exact,
            )
            parts.append(s.reshape(-1))
            idparts.append(sidx.reshape(-1))
        scores = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        ids = jnp.concatenate(idparts) if len(idparts) > 1 else idparts[0]
        scores = jnp.where(ids >= 0, scores, -1.0)
        # Local top-k, then gather k candidates per shard (tiny) and merge.
        # k==0 (--top 0 benchmarking) still selects one so the score
        # kernels are not dead-code-eliminated; sliced to k on the way out.
        kl = max(1, min(k, scores.shape[0]))
        v, i = jax.lax.top_k(scores, kl)
        ids_sel = jnp.take(ids, i)
        vg = jax.lax.all_gather(v, axis).reshape(-1)
        ig = jax.lax.all_gather(ids_sel, axis).reshape(-1)
        kf = max(1, min(k, vg.shape[0]))
        vfin, ifin = jax.lax.top_k(vg, kf)
        return vfin, jnp.take(ig, ifin)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)
