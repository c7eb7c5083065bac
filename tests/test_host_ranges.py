"""Per-host tile-store builds (round-2 verdict item 10 / ROADMAP 3).

A multi-host streamed scan only ever reads each process's chunk-shard
rows, so pack_db_to_store(tile_ranges=...) packs just those tiles into a
sparse full-offset file, load_packed validates coverage, and a second
host extends the store in place (range union) when the path is shared.
The reference analog is the per-GPU partition assignment
(/root/reference/src/cudasw4.cuh:1087-1144); the reference never needed
partial *stores* because its hosts share the raw DB file — our packed
tile store is the expensive artifact worth splitting.
"""

import os

import numpy as np
import pytest

from cudasw4_tpu.db.format import DBData
from cudasw4_tpu.db.packing import (
    _norm_ranges,
    _ranges_cover,
    _ranges_subtract,
    load_packed,
    pack_db,
    pack_db_to_store,
    plan_buckets,
    stream_manifest,
    stream_sidecar_fresh,
)


def _mkdb(n=2500, seed=5):
    rng = np.random.default_rng(seed)
    lengths = np.sort(rng.integers(10, 60, size=n)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = rng.integers(0, 20, size=int(offsets[-1])).astype(np.int8)
    return DBData(
        chars=chars, offsets=offsets, lengths=lengths,
        headers=np.frombuffer(b"h" * len(lengths), dtype=np.uint8),
        header_offsets=np.arange(len(lengths) + 1, dtype=np.uint64),
    )


def _plan_tiles(db):
    plans = plan_buckets(np.asarray(db.lengths, np.int64))
    return plans, [-(-(stop - start) // NS)
                   for start, stop, _, NS, _ in plans]


def test_range_helpers():
    assert _norm_ranges([(5, 3), (1, 4), (4, 7), (10, 12)], 11) == [
        (1, 7), (10, 11),
    ]
    assert _ranges_cover([(0, 10)], [(2, 5)])
    assert _ranges_cover([(0, 4), (6, 10)], [(1, 3), (7, 9)])
    assert not _ranges_cover([(0, 4), (6, 10)], [(2, 7)])
    assert _ranges_subtract([(0, 10)], [(2, 5)]) == [(0, 2), (5, 10)]
    assert _ranges_subtract([(3, 8)], [(0, 10)]) == []
    assert _ranges_subtract([(0, 6)], []) == [(0, 6)]


def test_partial_store_build_load_extend(tmp_path):
    db = _mkdb()
    ref = pack_db(db)
    _, Ts = _plan_tiles(db)
    path = str(tmp_path / "store")
    nch = int(np.asarray(db.lengths, np.int64).sum())

    r_lo = [[(0, T // 2)] if T else [] for T in Ts]
    r_hi = [[(T // 2, T)] if T else [] for T in Ts]
    pk = pack_db_to_store(db, path, tile_ranges=r_lo)
    assert pk is not None and pk.tile_ranges is not None
    for b_ref, b_got, rr, T in zip(ref.buckets, pk.buckets, r_lo, Ts):
        for a, b in rr:
            assert np.array_equal(b_ref.tiles[a:b], b_got.tiles[a:b])
        if T and T // 2 < T:  # un-owned tiles are sparse zeros
            assert not np.asarray(b_got.tiles[T // 2:]).any()
        # metadata arrays cover the whole bucket regardless of ranges
        assert np.array_equal(b_ref.seq_index, b_got.seq_index)
        assert np.array_equal(b_ref.lengths, b_got.lengths)
    # the sparse file allocates (well) under its logical size
    st = os.stat(path + ".tiles")
    assert st.st_blocks * 512 < os.path.getsize(path + ".tiles")

    # coverage validation
    assert load_packed(path, db.num_sequences,
                       nch) is None  # full coverage required
    assert load_packed(path, db.num_sequences, nch,
                       need_ranges=r_hi) is None
    assert load_packed(path, db.num_sequences, nch,
                       need_ranges=r_lo) is not None
    assert load_packed(path, db.num_sequences, nch,
                       need_ranges="any") is not None

    # union extension on the shared path: second "host" requests the
    # other halves; afterwards the store is complete and byte-identical
    # to the in-RAM pack
    pk2 = pack_db_to_store(db, path, tile_ranges=r_hi)
    assert pk2 is not None
    full = load_packed(path, db.num_sequences, nch)
    assert full is not None and full.tile_ranges is None
    for b_ref, b_got in zip(ref.buckets, full.buckets):
        assert np.array_equal(
            np.asarray(b_ref.tiles), np.asarray(b_got.tiles)
        )


def test_partial_store_sidecar_claims_only_owned(tmp_path):
    from cudasw4_tpu.ops import pack5

    db = _mkdb(1800, seed=9)
    ref = pack_db(db)
    plans, Ts = _plan_tiles(db)
    layout = [(L, NS, k, T) for (_, _, L, NS, k), T in zip(plans, Ts)]
    path = str(tmp_path / "s")
    nch = int(np.asarray(db.lengths, np.int64).sum())
    codec = "b32"
    _cpw, words_for, _pk, unpack = pack5.CODECS[codec][:4]

    r_lo = [[(0, T // 2)] if T else [] for T in Ts]
    r_hi = [[(T // 2, T)] if T else [] for T in Ts]
    pack_db_to_store(db, path, tile_ranges=r_lo, stream_codec=codec)
    man = stream_manifest(codec, 20, db.num_sequences, nch, layout)
    # partial sidecar: covers its own rows, must NOT validate for the
    # other host's rows or for complete coverage
    assert stream_sidecar_fresh(path, man, need_ranges=r_lo)
    assert not stream_sidecar_fresh(path, man, need_ranges=r_hi)
    assert not stream_sidecar_fresh(path, man)
    # owned rows unpack back to the raw tiles
    for bi, (b_ref, T, rr) in enumerate(zip(ref.buckets, Ts, r_lo)):
        W = words_for(b_ref.L * b_ref.NS)
        mm = np.memmap(path + f".pack5/b{bi}.bin", np.int32,
                       mode="r", shape=(T, W))
        for a, b in rr:
            got = np.asarray(
                unpack(np.asarray(mm[a:b]), tuple(b_ref.tiles.shape[1:]))
            )
            assert np.array_equal(got, b_ref.tiles[a:b])

    # extension brings the sidecar's claims (and rows) to full coverage
    pack_db_to_store(db, path, tile_ranges=r_hi, stream_codec=codec)
    assert stream_sidecar_fresh(path, man)
    for bi, (b_ref, T) in enumerate(zip(ref.buckets, Ts)):
        W = words_for(b_ref.L * b_ref.NS)
        mm = np.memmap(path + f".pack5/b{bi}.bin", np.int32,
                       mode="r", shape=(T, W))
        got = np.asarray(
            unpack(np.asarray(mm), tuple(b_ref.tiles.shape[1:]))
        )
        assert np.array_equal(got, np.asarray(b_ref.tiles))


def test_resident_guard_extends_partial_store(tmp_path):
    """A partial store must never feed the resident path: set_database
    with a budget that makes the DB resident extends the store to full
    coverage before any tile is consumed."""
    from cudasw4_tpu.engine import SearchEngine

    db = _mkdb(1200, seed=3)
    _, Ts = _plan_tiles(db)
    path = str(tmp_path / "g")
    nch = int(np.asarray(db.lengths, np.int64).sum())
    r_lo = [[(0, T // 2)] if T else [] for T in Ts]
    pack_db_to_store(db, path, tile_ranges=r_lo)
    assert load_packed(path, db.num_sequences, nch) is None

    eng = SearchEngine(num_top=5, qcap=64, backend="jnp")
    eng.set_database(db, pack_cache=path)
    assert not eng.streaming
    assert getattr(eng.packed, "tile_ranges", None) is None
    # the on-disk store was extended, not bypassed
    assert load_packed(path, db.num_sequences, nch) is not None

    ref = pack_db(db)
    q = np.random.default_rng(0).integers(0, 20, 30).astype(np.int8)
    oracle = SearchEngine(num_top=5, qcap=64, backend="jnp")
    oracle.set_database(db)
    assert eng.scan(q).scores == oracle.scan(q).scores
    del ref


def test_host_tile_ranges_single_process_is_none():
    from cudasw4_tpu.engine import SearchEngine

    db = _mkdb(600, seed=1)
    plans = plan_buckets(np.asarray(db.lengths, np.int64))
    eng = SearchEngine(num_top=5, qcap=64, backend="jnp")
    assert eng._host_tile_ranges(plans, 1) is None
    # single-process multi-device mesh: all devices local -> None
    import jax

    from cudasw4_tpu.parallel.sharding import make_mesh

    eng2 = SearchEngine(
        num_top=5, qcap=64, backend="jnp",
        mesh=make_mesh(jax.devices()[:2]),
    )
    assert eng2._host_tile_ranges(plans, 2) is None
