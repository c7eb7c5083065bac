import numpy as np
import pytest

from cudasw4_tpu import encode, make_scoring_config
from cudasw4_tpu.db.format import pseudo_to_dbdata, load_db, make_db
from cudasw4_tpu.db.fasta import write_fasta
from cudasw4_tpu.db.pseudo import make_pseudo_db
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.ops.oracle import sw_score_scalar

AAS = "ARNDCQEGHILKMFPSTWYV"


def _random_records(rng, n, max_len=120):
    recs = []
    for i in range(n):
        ln = int(rng.integers(3, max_len))
        recs.append((f"prot{i} desc{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    return recs


def test_scan_pseudo_db():
    engine = SearchEngine(num_top=5, qcap=64)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(10, 50)))
    query = "".join(AAS[c] for c in np.random.default_rng(3).integers(0, 20, 40))
    result = engine.scan(query)
    cfg = engine.scoring
    db = engine.db
    want = sw_score_scalar(encode(query), db.get_sequence(0), cfg.matrix, cfg.gop, cfg.gex)
    assert len(result.scores) == 5
    # all 10 identical sequences share the same score
    assert all(s == want for s in result.scores)
    assert result.stats.gcups > 0
    assert result.stats.num_overflows == 0


def test_scan_real_db_topk_exact(tmp_path, rng):
    recs = _random_records(rng, 60)
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    prefix = str(tmp_path / "db")
    make_db(fa, prefix)
    db = load_db(prefix)

    engine = SearchEngine(num_top=10, qcap=64)
    engine.set_database(db)
    cfg = engine.scoring

    query = "".join(AAS[c] for c in rng.integers(0, 20, 35))
    result = engine.scan(query)

    # brute-force (vectorised) oracle over the whole db
    from cudasw4_tpu.ops.oracle import sw_score_rowvec

    q = encode(query)
    maxlen = int(db.lengths.max())
    padded = np.full((db.num_sequences, maxlen), 20, dtype=np.int64)
    for i in range(db.num_sequences):
        s = db.get_sequence(i)
        padded[i, : len(s)] = s
    all_scores = sw_score_rowvec(q, padded, cfg.matrix, cfg.gop, cfg.gex)
    order = np.lexsort((np.arange(len(all_scores)), -all_scores))
    want_scores = [int(all_scores[i]) for i in order[:10]]
    assert result.scores == want_scores
    # ids must point at sequences with those scores (ties may permute)
    got_ids_scores = [int(all_scores[r]) for r in result.reference_ids]
    assert got_ids_scores == want_scores
    # headers accessible through the engine
    h = engine.get_reference_header(result.reference_ids[0])
    assert h.startswith("prot")


def test_scan_num_top_exceeds_db(rng, tmp_path):
    recs = _random_records(rng, 4)
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    engine = SearchEngine(num_top=10, qcap=64)
    engine.set_database(load_db(str(tmp_path / "db")))
    result = engine.scan("ARNDARND")
    assert len(result.scores) == 4  # min(top, numSequences)


def test_scan_query_beyond_qcap_uses_fallback():
    engine = SearchEngine(qcap=32, num_top=1)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(3, 20)))
    result = engine.scan("A" * 100)  # silently routed to the portable path
    assert len(result.scores) == 1


def test_scan_unknown_residues(rng):
    """Query with X/B/Z etc. (all map to UNKNOWN) still scans correctly."""
    engine = SearchEngine(num_top=3, qcap=64)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(5, 30)))
    result = engine.scan("AXXXBZRN")
    cfg = engine.scoring
    want = sw_score_scalar(
        encode("AXXXBZRN"), engine.db.get_sequence(0), cfg.matrix, cfg.gop, cfg.gex
    )
    assert result.scores[0] == want


def test_total_timer(rng):
    engine = SearchEngine(num_top=1, qcap=64)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(5, 30)))
    engine.total_timer_start()
    engine.scan("ARND")
    engine.scan("WWWW")
    stats = engine.total_timer_stop()
    assert stats.seconds > 0
    assert stats.gcups > 0


def test_long_query_fallback(rng):
    """Queries beyond the kernel qcap take the portable path, exactly."""
    engine = SearchEngine(num_top=3, qcap=32)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(6, 25)))
    cfg = engine.scoring
    long_q = rng.integers(0, 20, size=75)  # > qcap=32
    result = engine.scan(long_q.astype(np.int8))
    want = sw_score_scalar(
        long_q, engine.db.get_sequence(0), cfg.matrix, cfg.gop, cfg.gex
    )
    assert result.scores == [want] * 3
    assert result.stats.gcups > 0


def test_streaming_mode_matches_resident(tmp_path, rng):
    """Tiny max_device_bytes forces streaming; results must be identical."""
    recs = _random_records(rng, 50)
    fa = str(tmp_path / "db.fa")
    from cudasw4_tpu.db.fasta import write_fasta as _wf
    _wf(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))

    resident = SearchEngine(num_top=10, qcap=64)
    resident.set_database(db)
    streaming = SearchEngine(
        num_top=10, qcap=64, max_device_bytes=1024, stream_chunk_bytes=4096
    )
    streaming.set_database(db)
    assert streaming.streaming

    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))
    a = resident.scan(query)
    b = streaming.scan(query)
    assert a.scores == b.scores
    # tie sets must agree
    pairs_a = sorted(zip(a.scores, a.reference_ids))
    for (s1, _), (s2, _) in zip(pairs_a, sorted(zip(b.scores, b.reference_ids))):
        assert s1 == s2


def test_max_batch_sequences_caps_chunks(rng):
    """--maxBatchSequences caps the sequence slots per streamed chunk
    (the second axis of the reference's copy plan, options.cpp:121,
    cudasw4.cuh:1177-1277): a cap changes the observable chunk shapes
    and results stay identical."""
    db = pseudo_to_dbdata(make_pseudo_db(600, 24))

    def chunk_shapes(**kw):
        eng = SearchEngine(
            num_top=5, qcap=64, max_device_bytes=1024,
            stream_chunk_bytes=1 << 20, **kw,
        )
        eng.set_database(db)
        assert eng.streaming
        shapes = [chunk.shape for _b, chunk, _s in eng._stream_chunks()]
        return eng, shapes

    uncapped_eng, uncapped = chunk_shapes()
    # One bucket of 600 seqs at NS>=128: a 256-slot cap must split it.
    capped_eng, capped = chunk_shapes(max_batch_sequences=256)
    assert len(capped) > len(uncapped)
    ns = capped_eng.packed.buckets[0].NS
    assert all(s[0] * ns <= 256 for s in capped)

    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))
    a = uncapped_eng.scan(query)
    b = capped_eng.scan(query)
    assert a.scores == b.scores


def test_scan_batch_rejects_invalid_inputs(rng):
    """scan_batch raises ValueError (not assert: must survive python -O)
    on oversized groups and over-capacity queries."""
    engine = SearchEngine(num_top=2, qcap=32)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(5, 20)))
    with pytest.raises(ValueError, match="at most"):
        engine.scan_batch(["ARNDC"] * (engine._qb_cap + 1))
    with pytest.raises(ValueError, match="residues"):
        engine.scan_batch(["W" * (engine._qcap_batch + 1)])


def test_streaming_long_query(rng):
    engine = SearchEngine(
        num_top=2, qcap=32, max_device_bytes=1024, stream_chunk_bytes=4096
    )
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(5, 20)))
    assert engine.streaming
    result = engine.scan("W" * 100)
    assert len(result.scores) == 2


def test_debug_check_full_catches_non_topn_mismatch(tmp_path, rng,
                                                    monkeypatch):
    """CUDASW4_TPU_DEBUG_CHECK=full re-scores the ENTIRE database on the
    vectorized oracle (the reference's computeAllScoresCPU comparison,
    cudasw4.cuh:728-756) and must catch a planted kernel bug on a
    sequence outside the user's top-N — which the top-N check
    (DEBUG_CHECK=1) passes right over."""
    import jax.numpy as jnp
    import numpy as np

    from cudasw4_tpu.db.fasta import write_fasta as _wf

    # 12 A-rich high scorers + 4 all-W low scorers (query is all-A, and
    # blosum62 A/W = -3, so the W sequences score 0 and sit far outside
    # any small top-N).
    recs = [(f"a{i}", "A" * (20 + i)) for i in range(12)]
    recs += [(f"w{i}", "W" * 30) for i in range(4)]
    fa = str(tmp_path / "db.fa")
    _wf(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    query = "A" * 24

    def plant_bug(engine):
        # Engine-side (device) matrices only: A-vs-W becomes +2, so the
        # all-W sequences score ~48 in the kernel while the CPU oracle
        # still says 0.  A-only sequences are untouched (top-N intact).
        m = np.asarray(engine._matrix_f32).copy()
        m[0, 17] += 5  # A x W
        m[17, 0] += 5
        engine._matrix_f32 = jnp.asarray(m)
        engine._matrix_flat = jnp.asarray(m.astype(np.int32).reshape(-1))

    monkeypatch.setenv("CUDASW4_TPU_DEBUG_CHECK", "1")
    topn = SearchEngine(num_top=3, qcap=64)
    topn.set_database(db)
    plant_bug(topn)
    res = topn.scan(query)  # top-3 are A-sequences: check passes
    assert len(res.scores) == 3

    monkeypatch.setenv("CUDASW4_TPU_DEBUG_CHECK", "full")
    full = SearchEngine(num_top=3, qcap=64)
    full.set_database(db)
    assert full.num_top == db.num_sequences  # forced like the reference
    plant_bug(full)
    with pytest.raises(AssertionError, match="full debug check failed"):
        full.scan(query)

    # and a clean engine passes the full check
    clean = SearchEngine(num_top=3, qcap=64)
    clean.set_database(db)
    ok = clean.scan(query)
    assert len(ok.scores) == db.num_sequences


def test_debug_check_covers_batch_paths(rng, monkeypatch):
    """CUDASW4_TPU_DEBUG_CHECK must verify scan_batch results too
    (VERDICT r03 item 6): the batch kernels' slot/merge plumbing is
    where batching bugs would live, so a planted wrong batch-slot score
    has to be caught — the reference rescores EVERY scan under
    CUDASW_DEBUG_CHECK_CORRECTNESS (cudasw4.cuh:728-756)."""
    from cudasw4_tpu import ops
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.ops import sw_pallas_cell

    monkeypatch.setattr(ops, "INTERPRET", True)
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 99.0)  # force cell layout
    monkeypatch.setenv("CUDASW4_TPU_DEBUG_CHECK", "1")
    engine = SearchEngine(num_top=3, qcap=64, backend="pallas")
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(10, 40)))
    assert engine.packed.buckets[0].kernel == "cell"
    aas = "ARNDCQEGHILKMFPSTWYV"
    queries = [
        "".join(aas[c] for c in rng.integers(0, 20, 24)) for _ in range(3)
    ]

    # Clean engine: the per-slot oracle check passes.
    res = engine.scan_batch(queries)
    assert len(res) == 3

    # Corrupt slot 0 of the batch kernel's output (+1 on every score).
    real = sw_pallas_cell.score_bucket_pallas_cell_batch

    def corrupt(*a, **kw):
        s = real(*a, **kw)
        return s.at[0].add(1.0)

    monkeypatch.setattr(
        sw_pallas_cell, "score_bucket_pallas_cell_batch", corrupt
    )
    engine._batch_scan_fn = None  # retrace with the corrupted kernel
    with pytest.raises(AssertionError, match="debug check failed"):
        engine.scan_batch(queries)

    # scan_many routes short queries through the same batch dispatch —
    # it must be covered too.
    engine2 = SearchEngine(num_top=3, qcap=64, backend="pallas")
    engine2.set_database(pseudo_to_dbdata(make_pseudo_db(10, 40)))
    with pytest.raises(AssertionError, match="debug check failed"):
        list(engine2.scan_many(queries))


def test_empty_database(rng):
    """Zero-sequence DB: scans return empty results without errors."""
    from cudasw4_tpu.db.format import DBData
    from cudasw4_tpu.engine import SearchEngine
    import numpy as np

    db = DBData(
        chars=np.zeros(0, np.int8),
        offsets=np.zeros(1, np.uint64),
        lengths=np.zeros(0, np.int32),
        headers=np.zeros(0, np.uint8),
        header_offsets=np.zeros(1, np.uint64),
    )
    engine = SearchEngine(num_top=10)
    engine.set_database(db)
    res = engine.scan("ARNDC")
    assert res.scores == [] and res.reference_ids == []
    assert list(engine.scan_many(["ARNDC", "WWYV"]))[1].scores == []


@pytest.mark.parametrize("mode", ["1", "2"])
def test_resident_packed_upload_matches_raw(tmp_path, rng, monkeypatch, mode):
    """CUDASW4_TPU_RESIDENT_PACK ships resident tiles packed and unpacks
    on device; scores must be identical to the raw upload path."""
    recs = _random_records(rng, 50)
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))

    monkeypatch.delenv("CUDASW4_TPU_RESIDENT_PACK", raising=False)
    raw = SearchEngine(num_top=10, qcap=64)
    raw.set_database(db)
    a = raw.scan(query)

    monkeypatch.setenv("CUDASW4_TPU_RESIDENT_PACK", mode)
    packed = SearchEngine(num_top=10, qcap=64)
    packed._resident_pack_min = 0  # tiny fixture: force the codec path
    packed.set_database(db)
    b = packed.scan(query)
    assert a.scores == b.scores
    assert sorted(zip(a.scores, a.reference_ids)) == sorted(
        zip(b.scores, b.reference_ids)
    )


def test_resident_prefix_packed_upload(tmp_path, rng, monkeypatch):
    """Partial residency (pinned prefix) with the packed upload enabled
    must match the all-raw resident result.  Budget sized so the
    headroom rule (4 stream chunks + 15%) still leaves room to pin."""
    recs = _random_records(rng, 40_000, max_len=40)
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))

    monkeypatch.setenv("CUDASW4_TPU_RESIDENT_PACK", "0")
    base = SearchEngine(num_top=10, qcap=64)
    base.set_database(db)
    a = base.scan(query)

    monkeypatch.setenv("CUDASW4_TPU_RESIDENT_PACK", "1")
    eng = SearchEngine(
        num_top=10, qcap=64, max_device_bytes=1 << 20,
        stream_chunk_bytes=1 << 17,
    )
    eng._resident_pack_min = 0
    eng.set_database(db)
    assert eng.streaming
    assert eng._resident_chunks, "fixture should pin a prefix"
    b = eng.scan(query)
    assert a.scores == b.scores


@pytest.mark.parametrize("mode,codec", [("1", "b32"), ("2", "b21")])
def test_store_builds_pack5_sidecar_inline(tmp_path, rng, monkeypatch,
                                           mode, codec):
    """A streaming-bound set_database with a pack_cache builds the
    transfer-pack sidecar inline with the tile store (one pass), and the
    engine's lazy builder then validates and reuses it byte-for-byte."""
    import json
    import os as _os

    from cudasw4_tpu.ops.pack5 import CODECS

    recs = _random_records(rng, 200)
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    cache = str(tmp_path / "tilestore")

    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", mode)
    eng = SearchEngine(
        num_top=10, qcap=64, max_device_bytes=1024, stream_chunk_bytes=4096
    )
    eng.set_database(db, pack_cache=cache)
    assert eng.streaming
    man_path = _os.path.join(cache + ".pack5", "manifest.json")
    assert _os.path.exists(man_path)
    with open(man_path) as f:
        man = json.load(f)
    assert man["codec"] == codec and man["version"] == 2
    assert len(man["buckets"]) == len(eng.packed.buckets)
    # Sidecar bins must equal a direct pack of the raw tiles.
    pack = CODECS[codec][2]
    for bi, b in enumerate(eng.packed.buckets):
        if not b.num_tiles:
            continue
        got = np.fromfile(
            _os.path.join(cache + ".pack5", f"b{bi}.bin"), np.int32
        ).reshape(b.num_tiles, -1)
        np.testing.assert_array_equal(got, pack(np.asarray(b.tiles)))
    # ... and the engine must have adopted them as its stream pack.
    assert eng._stream_pack is not None
    # Scores match a resident engine.
    res = SearchEngine(num_top=10, qcap=64)
    res.set_database(db)
    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))
    assert res.scan(query).scores == eng.scan(query).scores


def test_col_routing_window(rng, monkeypatch):
    """Per-querylength kernel routing (COL_SINGLE_MIN_ROWS): one-pass
    long singles route cell-layout buckets to the column kernel; short
    queries and beyond-pool queries stay on the cell kernel
    (tools/bigsingle.py measured the col kernel LOSING beyond one NQC
    pass — the chunked boundary carry)."""
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.ops import sw_pallas_col

    monkeypatch.setattr(packing, "CELL_SPEEDUP", 99.0)
    engine = SearchEngine(num_top=3, qcap=64, backend="pallas")
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(10, 120)))
    b = engine.packed.buckets[0]
    assert b.kernel == "cell" and b.L % sw_pallas_col.LC == 0

    nqc = sw_pallas_col.NQC
    assert engine._single_kinds(256) == ("cell",)       # short: cell
    assert engine._single_kinds(512) == ("col",)        # window start
    assert engine._single_kinds(nqc) == ("col",)        # window end
    assert engine._single_kinds(nqc + 8) == ("cell",)   # beyond pool

    # Buckets whose L is not a multiple of LC never route.
    engine2 = SearchEngine(num_top=3, qcap=64, backend="pallas")
    engine2.set_database(pseudo_to_dbdata(make_pseudo_db(10, 90)))
    b2 = engine2.packed.buckets[0]
    assert b2.kernel == "cell" and b2.L % sw_pallas_col.LC != 0
    assert engine2._single_kinds(1024) == ("cell",)


def test_warmup_covers_long_query_programs(tmp_path, rng, monkeypatch):
    """Round-5 (VERDICT r04 next #4): warmup() pre-executes every
    column-kernel program shape the database can trigger, so a fresh
    process's first long query hits only warm programs (on
    remote-compile platforms a cold big-scratch program stalls
    minutes).  The contract checked here: the (tiles, take, emit)
    program keys a long chunked query dispatches are a subset of the
    keys warmup() executed, and results stay exact."""
    from cudasw4_tpu import ops
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.ops import sw_pallas_col

    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    monkeypatch.setattr(sw_pallas_col, "NQC", 32)
    monkeypatch.setattr(packing, "CELL_MAX_L", 64)
    monkeypatch.setattr(packing, "COL_SPEEDUP", 1e9)
    monkeypatch.setattr(ops, "INTERPRET", True)

    recs = []
    for i in range(10):
        ln = int(rng.integers(70, 127))
        recs.append(
            (f"p{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln)))
        )
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))

    keys = []
    real = sw_pallas_col.score_bucket_pallas_col

    def spy(tiles, *a, take_init=False, emit_state=False, **k):
        keys.append((tiles.shape[0], take_init, emit_state))
        return real(tiles, *a, take_init=take_init,
                    emit_state=emit_state, **k)

    monkeypatch.setattr(sw_pallas_col, "score_bucket_pallas_col", spy)

    eng = SearchEngine(num_top=5, qcap=64, backend="pallas")
    eng.set_database(db)
    assert any(b.kernel == "col" for b in eng.packed.buckets)
    n = eng.warmup()
    assert n >= 4  # 2 scan-kinds programs + 3 chunked variants at least
    warmed = set(keys)
    assert len(warmed) >= 3

    # A 3-chunk query (NQC=32 -> 70 rows) dispatches only warmed keys.
    keys.clear()
    q = "".join(AAS[c] for c in rng.integers(0, 20, 70))
    got = eng.scan(q)
    assert set(keys) <= warmed, (set(keys), warmed)

    ref = SearchEngine(num_top=5, qcap=64, backend="jnp")
    ref.set_database(db)
    assert got.scores == ref.scan(q).scores

    # A short query (single-chunk col program) is also covered.
    keys.clear()
    q2 = "".join(AAS[c] for c in rng.integers(0, 20, 20))
    got2 = eng.scan(q2)
    assert set(keys) <= warmed, (set(keys), warmed)
    assert got2.scores == ref.scan(q2).scores


def test_warmup_via_set_database_flag(tmp_path, rng, monkeypatch):
    """SearchEngine(warmup=True) warms at set_database time (the
    --warmup / --interactive CLI path)."""
    from cudasw4_tpu import ops

    monkeypatch.setattr(ops, "INTERPRET", True)
    recs = _random_records(rng, 12)
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))

    called = []
    monkeypatch.setattr(
        SearchEngine, "warmup", lambda self: called.append(1) or 1
    )
    eng = SearchEngine(num_top=5, qcap=64, warmup=True)
    eng.set_database(db)
    assert called == [1]


def test_long_query_noncol_split_matches_fused(tmp_path, rng, monkeypatch):
    """The chunked long-query branch's program-size cap: per-bucket
    dispatch (forced via a threshold of 1) returns results identical to
    the fused noncol program."""
    from cudasw4_tpu import engine as engine_mod
    from cudasw4_tpu import ops
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.ops import sw_pallas_col

    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    monkeypatch.setattr(sw_pallas_col, "NQC", 32)
    monkeypatch.setattr(packing, "CELL_MAX_L", 64)
    monkeypatch.setattr(packing, "COL_SPEEDUP", 1e9)
    monkeypatch.setattr(ops, "INTERPRET", True)

    recs = []
    for i in range(12):
        ln = int(rng.integers(10, 127))
        recs.append(
            (f"p{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln)))
        )
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    q = "".join(AAS[c] for c in rng.integers(0, 20, 70))  # 3 NQC chunks

    eng = SearchEngine(num_top=5, qcap=64, backend="pallas")
    eng.set_database(db)
    fused = eng.scan(q).scores

    monkeypatch.setattr(engine_mod, "BATCH_SPLIT_CELLS", 1)
    eng2 = SearchEngine(num_top=5, qcap=64, backend="pallas")
    eng2.set_database(db)
    assert eng2.scan(q).scores == fused

    ref = SearchEngine(num_top=5, qcap=64, backend="jnp")
    ref.set_database(db)
    assert fused == ref.scan(q).scores
