"""Multi-query batch scanning: the batch cell kernel and engine.scan_batch/
scan_many grouping (one tile pass serves a whole query batch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.db.format import DBData
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.ops import sw_pallas_cell
from cudasw4_tpu.ops.oracle import sw_score_scalar

ON_TPU = jax.devices()[0].platform == "tpu"


def test_batch_cell_kernel_matches_oracle(rng):
    cfg = make_scoring_config("blosum62")
    L, QB = 32, 4
    n = 50
    subjects = [rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)]
    tiles = np.full((1, L, 32, 128), 20, dtype=np.int8)
    for kk, s in enumerate(subjects):
        g, lane = divmod(kk, 128)
        tiles[0, : len(s), g, lane] = s
    queries = [
        rng.integers(0, 20, size=int(rng.integers(4, 40))) for _ in range(3)
    ]  # 3 real + 1 empty padding slot
    qarr = np.full((QB, sw_pallas_cell.QCAP_BATCH), 20, dtype=np.int32)
    nqs = np.zeros(QB, np.int32)
    for i, q in enumerate(queries):
        qarr[i, : len(q)] = q
        nqs[i] = len(q)
    params = np.concatenate(
        [np.array([0, cfg.gop, cfg.gex, 0], np.int32), nqs, np.zeros(QB, np.int32)]
    )
    out = sw_pallas_cell.score_bucket_pallas_cell_batch(
        jnp.asarray(tiles), jnp.asarray(qarr),
        jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1)),
        jnp.asarray(params), interpret=not ON_TPU,
    )
    out = np.asarray(out)  # [QB, T*NS]
    for i, q in enumerate(queries):
        got = out[i].reshape(-1)[: len(subjects)]
        want = [sw_score_scalar(q, s, cfg.matrix, cfg.gop, cfg.gex) for s in subjects]
        assert [int(v) for v in got] == want, f"query {i}"
    assert np.all(out[3] <= 0)  # empty padding query scores nothing


def _make_db(rng, n=300, maxlen=60):
    lengths = np.sort(rng.integers(10, maxlen, size=n)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), 20, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]) : int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    headers = b"".join(f"seq{i}\n".encode() for i in range(n))
    hoffs = np.cumsum([0] + [len(f"seq{i}\n") for i in range(n)]).astype(np.uint64)
    return DBData(
        chars=chars, offsets=offsets, lengths=lengths,
        headers=np.frombuffer(headers, dtype=np.uint8), header_offsets=hoffs,
    )


def test_engine_scan_batch_matches_scan(rng):
    engine = SearchEngine(num_top=5)
    engine.QB_MAX = 4  # keep the CPU-compile cost of the batch jit small
    engine.set_database(_make_db(rng))
    queries = [rng.integers(0, 20, size=int(q)) for q in (12, 30, 55)]
    batch = engine.scan_batch(queries)
    for q, res in zip(queries, batch):
        single = engine.scan(q)
        assert res.scores == single.scores
        assert res.reference_ids == single.reference_ids


def test_engine_scan_batch_query_beyond_qcap(rng):
    """Batch queries may exceed the single-scan qcap (the batch kernel's
    block is _qcap_batch wide); the fallback pad must grow instead of
    crashing with a broadcast ValueError (regression)."""
    engine = SearchEngine(num_top=5, qcap=64)
    engine.QB_MAX = 2
    engine.set_database(_make_db(rng))
    assert engine._qcap_batch > engine.qcap
    long_q = rng.integers(0, 20, size=100)  # qcap < 100 <= _qcap_batch
    short_q = rng.integers(0, 20, size=30)
    batch = engine.scan_batch([long_q, short_q])
    for q, res in zip([long_q, short_q], batch):
        single = engine.scan(q)
        assert res.scores == single.scores
        assert res.reference_ids == single.reference_ids


def test_engine_scan_many_grouping(rng):
    engine = SearchEngine(num_top=3)
    engine.QB_MAX = 4
    engine.set_database(_make_db(rng))
    queries = [rng.integers(0, 20, size=int(rng.integers(8, 80))) for _ in range(7)]
    got = list(engine.scan_many(queries))
    assert len(got) == 7
    for q, res in zip(queries, got):
        single = engine.scan(q)
        assert res.scores == single.scores
        assert res.reference_ids == single.reference_ids


def test_engine_scan_batch_sharded(rng):
    """Batched scans on a multi-chip mesh match single scans."""
    from cudasw4_tpu.parallel.sharding import make_mesh

    engine = SearchEngine(num_top=5, mesh=make_mesh())
    engine.QB_MAX = 2
    engine.set_database(_make_db(rng, n=120))
    queries = [rng.integers(0, 20, size=int(q)) for q in (15, 40)]
    batch = engine.scan_batch(queries)
    for q, res in zip(queries, batch):
        single = engine.scan(q)
        assert res.scores == single.scores
        assert res.reference_ids == single.reference_ids


def test_engine_scan_batch_streaming(rng):
    """Streaming mode (DB beyond device memory) streams the DB once per
    batch; results match resident single scans."""
    db = _make_db(rng, n=200)
    resident = SearchEngine(num_top=4)
    resident.set_database(db)
    streaming = SearchEngine(num_top=4, max_device_bytes=1024,
                             stream_chunk_bytes=4096)
    streaming.QB_MAX = 2
    streaming.set_database(db)
    assert streaming.streaming
    queries = [rng.integers(0, 20, size=int(q)) for q in (20, 45)]
    batch = streaming.scan_batch(queries)
    for q, res in zip(queries, batch):
        single = resident.scan(q)
        assert res.scores == single.scores


def test_engine_scan_batch_streaming_mixed_lengths(rng):
    """Streaming batches accept queries beyond the batch-kernel cap: long
    queries share the streamed chunks via per-query calls."""
    from cudasw4_tpu.ops import sw_pallas_cell

    db = _make_db(rng, n=150)
    resident = SearchEngine(num_top=4)
    resident.set_database(db)
    streaming = SearchEngine(num_top=4, max_device_bytes=1024,
                             stream_chunk_bytes=4096)
    streaming.QB_MAX = 3
    streaming.set_database(db)
    assert streaming.streaming
    long_len = sw_pallas_cell.QCAP_BATCH + 40
    queries = [
        rng.integers(0, 20, size=25),
        rng.integers(0, 20, size=long_len),
        rng.integers(0, 20, size=60),
    ]
    batch = streaming.scan_batch(queries)
    for q, res in zip(queries, batch):
        single = resident.scan(q)
        assert res.scores == single.scores


def test_engine_streaming_partial_residency(rng):
    """A budget that fits part of the DB pins a resident prefix (the
    reference's cached-region model, cudasw4.cuh:1087-1144): streamed
    tiles shrink, results stay identical to the fully-resident engine."""
    # Headroom reserves 4x the largest REAL chunk (tile floor can make
    # chunks exceed stream_chunk_bytes): here max chunk = one 64x128
    # tile = 8 KiB, so the budget must cover 32 KiB headroom plus a
    # pinnable prefix while staying under the ~80 KiB packed DB.
    db = _make_db(rng, n=1600)
    full = SearchEngine(num_top=5)
    full.set_database(db)

    chunk = 2048
    eng = SearchEngine(num_top=5, max_device_bytes=24 * chunk,
                       stream_chunk_bytes=chunk)
    eng.QB_MAX = 2
    eng.set_database(db)
    assert eng.streaming
    assert eng._resident_chunks, "budget should pin a resident prefix"
    res_tiles = sum(eng._res_tiles.values())
    assert res_tiles > 0
    streamed = sum(1 for _ in eng._stream_chunks())
    assert streamed > 0, "DB exceeds budget: a remainder must stream"

    none = SearchEngine(num_top=5, max_device_bytes=24 * chunk,
                        stream_chunk_bytes=chunk)
    import os as _os
    _os.environ["CUDASW4_TPU_STREAM_RESIDENT"] = "0"
    try:
        none.set_database(db)
    finally:
        del _os.environ["CUDASW4_TPU_STREAM_RESIDENT"]
    assert not none._resident_chunks
    assert sum(1 for _ in none._stream_chunks()) > streamed

    queries = [rng.integers(0, 20, size=int(q)) for q in (18, 42)]
    for q in queries:
        want = full.scan(q)
        got = eng.scan(q)
        off = none.scan(q)
        assert got.scores == want.scores
        assert got.reference_ids == want.reference_ids
        assert off.scores == want.scores

    # Re-pointing the engine at a resident-size DB must drop the pinned
    # prefix (stale device arrays would leak ~budget bytes).
    eng.max_device_bytes = None
    eng.set_database(_make_db(rng, n=50))
    assert not eng._resident_chunks and not eng._res_tiles


def test_engine_streaming_qb_stream_one_pass(rng):
    """Streaming mode groups up to QB_STREAM (> QB_MAX) queries so the
    whole reference 20-query ladder ships the DB host->HBM once; results
    still match resident scans."""
    db = _make_db(rng, n=200)
    resident = SearchEngine(num_top=4)
    resident.set_database(db)
    streaming = SearchEngine(num_top=4, max_device_bytes=1024,
                             stream_chunk_bytes=4096)
    streaming.QB_MAX = 3
    streaming.QB_STREAM = 5
    streaming.set_database(db)
    assert streaming.streaming and streaming._qb_cap == 5

    passes = 0
    orig = type(streaming)._stream_chunks

    def counting(self):
        nonlocal passes
        passes += 1
        return orig(self)

    streaming._stream_chunks = counting.__get__(streaming)
    queries = [rng.integers(0, 20, size=int(q)) for q in (12, 22, 33, 44, 55)]
    got = list(streaming.scan_many(queries))
    assert passes == 1  # one group of 5 = one full DB stream
    assert len(got) == 5
    for q, res in zip(queries, got):
        single = resident.scan(q)
        assert res.scores == single.scores
        assert res.reference_ids == single.reference_ids


def test_set_database_drops_previous_resident_tiles(rng):
    """A resident DB followed by a streaming DB on the same engine must
    not keep the first DB's device tile arrays alive (review finding:
    ~0.7x HBM of dead tiles pinned across a resident->streaming
    transition)."""
    eng = SearchEngine(num_top=5)
    eng.set_database(_make_db(rng, n=200))
    assert eng._bucket_tiles
    big = _make_db(rng, n=1600)
    eng.max_device_bytes = 16384
    eng.stream_chunk_bytes = 2048
    eng.set_database(big)
    assert eng.streaming
    assert eng._bucket_tiles == []
    q = rng.integers(0, 20, 30).astype(np.int8)
    full = SearchEngine(num_top=5)
    full.set_database(big)
    want = full.scan(q)
    got = eng.scan(q)
    assert got.scores == want.scores
    assert got.reference_ids == want.reference_ids


def test_scan_batch_cell_split_matches_fused(rng, monkeypatch):
    """Round-5 program-size cap: above BATCH_SPLIT_CELLS the batch path
    dispatches each cell bucket as its own program (a single fused
    program executing minutes of DP kills the TPU worker at 5M-seq
    scale).  Forced on via a threshold of 1, results must be identical
    to the fused path."""
    from cudasw4_tpu import engine as engine_mod
    from cudasw4_tpu import ops

    monkeypatch.setattr(ops, "INTERPRET", True)
    recs = []
    aas = "ARNDCQEGHILKMFPSTWYV"
    for i in range(40):
        ln = int(rng.integers(5, 120))
        recs.append((f"p{i}", "".join(aas[c] for c in rng.integers(0, 20, ln))))
    from cudasw4_tpu.db.fasta import write_fasta
    from cudasw4_tpu.db.format import load_db, make_db
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        fa = os.path.join(td, "db.fa")
        write_fasta(fa, recs)
        make_db(fa, os.path.join(td, "db"))
        db = load_db(os.path.join(td, "db"))
        queries = ["".join(aas[c] for c in rng.integers(0, 20, int(n)))
                   for n in (12, 30, 55)]

        eng = SearchEngine(num_top=5, qcap=64, backend="pallas")
        eng.set_database(db)
        fused = [r.scores for r in eng.scan_batch(queries)]

        monkeypatch.setattr(engine_mod, "BATCH_SPLIT_CELLS", 1)
        eng2 = SearchEngine(num_top=5, qcap=64, backend="pallas")
        eng2.set_database(db)
        split = [r.scores for r in eng2.scan_batch(queries)]
        assert split == fused

        ref = SearchEngine(num_top=5, qcap=64, backend="jnp")
        ref.set_database(db)
        want = [r.scores for r in ref.scan_batch(queries)]
        assert split == want
