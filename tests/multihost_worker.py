"""Worker process for tests/test_multihost.py (not a test module).

Runs one process of a 2-process jax.distributed CPU cluster: builds a
deterministic database, shards it over the global mesh, scans fixed
queries and prints the results.  The parent asserts both workers print
identical output matching the single-process result (SURVEY.md §4
implication (d): multi-host logic must be CPU-testable).
"""

import sys


def main():
    coordinator, nproc, pid, ndev = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])
    )
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={ndev}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from cudasw4_tpu.engine import SearchEngine
    from cudasw4_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        is_primary,
    )

    initialize(coordinator=coordinator, num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.local_devices()) == ndev
    assert len(jax.devices()) == nproc * ndev

    import numpy as np

    from cudasw4_tpu.db.format import DBData

    # Deterministic DB: every process builds the identical array set (the
    # multi-host contract: same DB + same scan order on every process).
    rng = np.random.default_rng(2024)
    lengths = np.sort(rng.integers(5, 80, size=400)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = rng.integers(0, 20, size=int(offsets[-1])).astype(np.int8)
    db = DBData(
        chars=chars,
        offsets=offsets,
        lengths=lengths,
        headers=np.frombuffer(b"h" * len(lengths), dtype=np.uint8),
        header_offsets=np.arange(len(lengths) + 1, dtype=np.uint64),
    )

    engine = SearchEngine(num_top=10, qcap=64, mesh=global_mesh())
    engine.set_database(db)

    qrng = np.random.default_rng(7)
    queries = [qrng.integers(0, 20, n).astype(np.int8) for n in (30, 12, 55)]
    for q in queries:
        res = engine.scan(q)
        print(f"RESULT {pid} {res.scores} {res.reference_ids}", flush=True)
    batch = engine.scan_batch(queries[:2])
    for res in batch:
        print(f"BATCH {pid} {res.scores} {res.reference_ids}", flush=True)

    # Sharded streaming with the 5-bit transfer pack: chunks shard over
    # the same global mesh and each process unpacks its shard.  Both
    # processes share one pack_cache path (argv[5], the single-host
    # multi-process layout): the store-build flock serialises the pack
    # and the loser loads the winner's store.
    os.environ["CUDASW4_TPU_STREAM_PACK"] = "1"
    pack_cache = sys.argv[5] if len(sys.argv) > 5 else None
    seng = SearchEngine(
        num_top=10, qcap=64, mesh=global_mesh(), max_device_bytes=1,
        stream_chunk_bytes=1 << 14,
    )
    seng.set_database(db, pack_cache=pack_cache)
    assert seng.streaming and seng._stream_pack is not None
    sres = seng.scan(queries[0])
    print(f"STREAM {pid} {sres.scores} {sres.reference_ids}", flush=True)

    # Per-host tile store (round-2 verdict item 10): with its own cache
    # path (the per-host local-disk layout) each process packs only its
    # chunk-shard tile ranges — a partial, sparse store — and the
    # streamed scan still matches.  The shared-path engine above
    # exercises the complementary case: both processes request their
    # ranges on ONE path and the second extends the store in place
    # (range union under the build lock).
    if pack_cache:
        own_cache = f"{pack_cache}.host{pid}"
        seng2 = SearchEngine(
            num_top=10, qcap=64, mesh=global_mesh(), max_device_bytes=1,
            stream_chunk_bytes=1 << 14,
        )
        # A larger DB than the main one: with only 1-2 tiles per bucket
        # (the 400-seq DB packs NS=128 tiles) the first process's mesh
        # positions cover every tile and its store is legitimately FULL
        # — partiality needs more tiles per bucket than half the mesh
        # covers per chunk.  ~3200 seqs gives each bucket ~6-8 tiles, so
        # both processes' per-host stores are genuinely partial.
        rng2 = np.random.default_rng(2025)
        lengths2h = np.sort(rng2.integers(5, 80, size=3200)).astype(np.int32)
        padded2h = (lengths2h + 3) // 4 * 4
        offsets2h = np.concatenate(
            [[0], np.cumsum(padded2h)]
        ).astype(np.uint64)
        db2 = DBData(
            chars=rng2.integers(
                0, 20, size=int(offsets2h[-1])
            ).astype(np.int8),
            offsets=offsets2h,
            lengths=lengths2h,
            headers=np.frombuffer(b"h" * len(lengths2h), dtype=np.uint8),
            header_offsets=np.arange(len(lengths2h) + 1, dtype=np.uint64),
        )
        seng2.set_database(db2, pack_cache=own_cache)
        assert seng2.streaming
        if nproc > 1:
            assert seng2.packed.tile_ranges is not None, (
                "per-host store should be partial"
            )
            st = os.stat(own_cache + ".tiles")
            logical = os.path.getsize(own_cache + ".tiles")
            assert st.st_blocks * 512 < logical, (
                st.st_blocks * 512, logical,
            )
        hres = seng2.scan(queries[0])
        print(f"HOSTSTORE {pid} {hres.scores} {hres.reference_ids}",
              flush=True)

    # Chunked-col long query across the distributed mesh: shrink the
    # kernel constants (as dryrun_multichip does) so interpret-mode
    # Pallas stays cheap, force a col bucket, and scan a query spanning
    # 3 NQC chunks.  The H/F boundary carry stays shard-local inside
    # the shard_map; both processes must print identical results.
    import cudasw4_tpu.ops as ops_mod
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.ops import sw_pallas_col

    sw_pallas_col.LC = 16
    sw_pallas_col.NQC = 32
    packing.CELL_MAX_L = 64
    packing.COL_SPEEDUP = 1e9
    ops_mod.INTERPRET = True
    lengths2 = np.concatenate(
        [np.full(40, 30), np.full(12, 80)]
    ).astype(np.int32)
    padded2 = (lengths2 + 3) // 4 * 4
    offsets2 = np.concatenate([[0], np.cumsum(padded2)]).astype(np.uint64)
    chars2 = rng.integers(0, 20, size=int(offsets2[-1])).astype(np.int8)
    from cudasw4_tpu.db.format import DBData as _DBData

    db2 = _DBData(
        chars=chars2, offsets=offsets2, lengths=lengths2,
        headers=np.frombuffer(b"h" * len(lengths2), dtype=np.uint8),
        header_offsets=np.arange(len(lengths2) + 1, dtype=np.uint64),
    )
    assert "col" in {b.kernel for b in packing.pack_db(db2).buckets}
    col_eng = SearchEngine(
        num_top=5, qcap=64, backend="pallas", mesh=global_mesh()
    )
    col_eng.set_database(db2)
    qlong = rng.integers(0, 20, 70).astype(np.int8)  # 3 NQC chunks
    lres = col_eng.scan(qlong)
    print(f"LONGCOL {pid} {lres.scores} {lres.reference_ids}", flush=True)
    print(f"DONE {pid} primary={is_primary()}", flush=True)


if __name__ == "__main__":
    main()
