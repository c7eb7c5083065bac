import gzip

import numpy as np
import pytest

from cudasw4_tpu.constants import UNKNOWN, decode, encode
from cudasw4_tpu.db.fasta import read_sequences, write_fasta
from cudasw4_tpu.db.format import (
    LENGTH_PARTITION_BOUNDARIES,
    load_db,
    make_db,
    partition_histogram,
    pseudo_to_dbdata,
)
from cudasw4_tpu.db.packing import (
    bucket_length_for,
    pack_db,
    unpack_tile_sequences,
)
from cudasw4_tpu.db.pseudo import make_pseudo_db

RECORDS = [
    ("seq1 first protein", "MKVLAA"),
    ("seq2", "ARNDCQEGHILKMFPSTWYVARNDCQEGHILKMFPSTWYV"),
    ("seq3 short", "WW"),
    ("seq4", "ACDEFGHIKLMNPQRSTVWYACDEFGHIKL"),
]


def test_fasta_roundtrip(tmp_path):
    p = str(tmp_path / "t.fa")
    write_fasta(p, RECORDS)
    got = [(r.header, r.sequence) for r in read_sequences(p)]
    assert got == RECORDS


def test_fasta_multiline_and_gzip(tmp_path):
    p = str(tmp_path / "t.fa.gz")
    content = ">h1 desc here\nMKV\nLAA\n\n>h2\r\nWW\r\n"
    with gzip.open(p, "wt") as f:
        f.write(content)
    got = [(r.header, r.sequence) for r in read_sequences(p)]
    assert got == [("h1 desc here", "MKVLAA"), ("h2", "WW")]


def test_fastq(tmp_path):
    p = str(tmp_path / "t.fq")
    with open(p, "w") as f:
        f.write("@r1 desc\nMKVL\n+\n!!!!\n@r2\nWW\n+r2\n!!\n")
    got = [(r.header, r.sequence) for r in read_sequences(p)]
    assert got == [("r1 desc", "MKVL"), ("r2", "WW")]


def test_makedb_load_roundtrip(tmp_path):
    fa = str(tmp_path / "in.fa")
    write_fasta(fa, RECORDS)
    prefix = str(tmp_path / "db")
    stats = make_db(fa, prefix)
    assert stats["num_sequences"] == 4
    assert stats["num_chars"] == sum(len(s) for _, s in RECORDS)

    db = load_db(prefix)
    assert db.num_sequences == 4
    # sorted by length ascending: seq3 (2), seq1 (6), seq4 (30), seq2 (40)
    assert list(db.lengths) == [2, 6, 30, 40]
    assert db.get_header(0) == "seq3 short"
    assert db.get_header(1) == "seq1 first protein"
    assert decode(db.get_sequence(0)) == "WW"
    assert decode(db.get_sequence(3)) == RECORDS[1][1]
    # padded chars multiple of 4, padding encodes UNKNOWN
    assert db.num_padded_chars % 4 == 0
    seq1_padded = db.chars[int(db.offsets[1]) : int(db.offsets[2])]
    assert len(seq1_padded) == 8
    assert list(seq1_padded[6:]) == [UNKNOWN, UNKNOWN]


def test_metadata_binary_layout(tmp_path):
    fa = str(tmp_path / "in.fa")
    write_fasta(fa, RECORDS)
    prefix = str(tmp_path / "db")
    make_db(fa, prefix)
    raw = open(prefix + "0metadata", "rb").read()
    n = np.frombuffer(raw[:4], dtype=np.int32)[0]
    assert n == len(LENGTH_PARTITION_BOUNDARIES)
    bounds = np.frombuffer(raw[4 : 4 + 4 * n], dtype=np.int32)
    assert list(bounds) == LENGTH_PARTITION_BOUNDARIES
    counts = np.frombuffer(raw[4 + 4 * n :], dtype=np.uint64)
    assert counts.sum() == 4
    # lengths 2,6,30,40 all fall in partition 0 (<=48)
    assert counts[0] == 4


def test_partition_histogram():
    lengths = np.array([10, 48, 49, 64, 100, 8000, 9000], dtype=np.int64)
    h = partition_histogram(lengths)
    assert h.sum() == 7
    assert h[0] == 2  # <=48
    assert h[1] == 2  # 49..64
    assert h[-2] == 1  # 1281..8000
    assert h[-1] == 1  # >8000


def test_pack_pseudo_db():
    pdb = pseudo_to_dbdata(make_pseudo_db(300, 100))
    packed = pack_db(pdb)
    assert packed.num_sequences == 300
    assert packed.total_real_chars == 30000
    assert len(packed.buckets) == 1
    b = packed.buckets[0]
    assert b.L == bucket_length_for(100) == 112
    assert b.num_real == 300
    assert b.tiles.shape[1:] == (b.L, b.NS)
    # Round-trip: every packed sequence matches the original
    seqs = unpack_tile_sequences(b, 0)
    orig = pdb.chars[:100]
    assert np.array_equal(seqs[0], orig)
    # padding lanes are all UNKNOWN
    pad_slots = np.argwhere(b.seq_index < 0)
    if len(pad_slots):
        t, s = pad_slots[0]
        assert np.all(b.tiles[t, :, s] == UNKNOWN)


def test_pack_mixed_lengths(tmp_path, rng):
    # random lengths spanning several buckets, via a real makedb roundtrip
    recs = []
    for i in range(57):
        ln = int(rng.integers(1, 700))
        seq = "".join("ARNDCQEGHILKMFPSTWYV"[c] for c in rng.integers(0, 20, ln))
        recs.append((f"s{i}", seq))
    fa = str(tmp_path / "m.fa")
    write_fasta(fa, recs)
    prefix = str(tmp_path / "db")
    make_db(fa, prefix)
    db = load_db(prefix)
    packed = pack_db(db, slab_tiles=2)
    assert packed.num_sequences == 57
    # every sequence appears exactly once with correct content
    seen = {}
    for b in packed.buckets:
        assert b.L % 16 == 0 and b.NS % 128 == 0
        for t in range(b.num_tiles):
            for s in range(b.NS):
                gid = int(b.seq_index[t, s])
                if gid < 0:
                    continue
                ln = int(b.lengths[t, s])
                assert ln == int(db.lengths[gid])
                assert ln <= b.L
                seen[gid] = b.tiles[t, :ln, s].copy()
    assert len(seen) == 57
    for gid, codes in seen.items():
        assert np.array_equal(codes, db.get_sequence(gid)), gid


def test_pack_long_sequences():
    # sequences longer than MAX_SINGLE_PASS land in long buckets
    from cudasw4_tpu.db.format import DBData

    lengths = np.array([100, 3000, 5000], dtype=np.int32)
    padded = [(ln + 3) // 4 * 4 for ln in lengths]
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), UNKNOWN, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]) : int(offsets[i]) + ln] = np.arange(ln) % 20
    db = DBData(
        chars=chars,
        offsets=offsets,
        lengths=lengths,
        headers=np.zeros(0, dtype=np.uint8),
        header_offsets=np.zeros(4, dtype=np.uint64),
    )
    packed = pack_db(db)
    # top-down long-tail packing: both long sequences share one
    # ladder-length bucket just above the longest member
    Ls = sorted(b.L for b in packed.buckets)
    assert Ls == [112, 5120]
    long_buckets = [b for b in packed.buckets if b.is_long]
    assert len(long_buckets) == 1
    b = long_buckets[0]
    from cudasw4_tpu.db.packing import unpack_tile_sequences

    seqs = unpack_tile_sequences(b, 0)
    assert len(seqs) == 2
    assert np.array_equal(seqs[0], db.get_sequence(1))
    assert np.array_equal(seqs[1], db.get_sequence(2))


def test_packed_sidecar_roundtrip(tmp_path, rng):
    """save_packed/load_packed reproduce the PackedDB exactly and reject
    stale caches."""
    from cudasw4_tpu.db.format import DBData
    from cudasw4_tpu.db.packing import load_packed, pack_db, save_packed

    lengths = np.sort(rng.integers(8, 700, size=120)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), UNKNOWN, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]): int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    db = DBData(chars=chars, offsets=offsets, lengths=lengths,
                headers=np.zeros(0, np.uint8),
                header_offsets=np.zeros(len(lengths) + 1, np.uint64))
    packed = pack_db(db)
    path = str(tmp_path / "tiles.npz")
    save_packed(packed, path)
    loaded = load_packed(path, db.num_sequences, int(lengths.sum()))
    assert loaded is not None
    assert len(loaded.buckets) == len(packed.buckets)
    for a, b in zip(packed.buckets, loaded.buckets):
        assert (a.L, a.NS, a.kernel) == (b.L, b.NS, b.kernel)
        assert np.array_equal(a.tiles, b.tiles)
        assert np.array_equal(a.seq_index, b.seq_index)
        assert np.array_equal(a.lengths, b.lengths)
    # stale: different database shape
    assert load_packed(path, db.num_sequences + 1, int(lengths.sum())) is None


def test_engine_pack_cache(tmp_path, rng):
    from cudasw4_tpu.db.format import DBData
    from cudasw4_tpu.engine import SearchEngine

    lengths = np.sort(rng.integers(8, 120, size=60)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), UNKNOWN, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]): int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    hdr = b"".join(f"s{i}\n".encode() for i in range(60))
    hoffs = np.cumsum([0] + [len(f"s{i}\n") for i in range(60)]).astype(np.uint64)
    db = DBData(chars=chars, offsets=offsets, lengths=lengths,
                headers=np.frombuffer(hdr, np.uint8), header_offsets=hoffs)
    import os

    cache = str(tmp_path / "c.npz")
    e1 = SearchEngine(num_top=3)
    e1.set_database(db, pack_cache=cache)
    assert os.path.exists(cache)
    e2 = SearchEngine(num_top=3)
    e2.set_database(db, pack_cache=cache)  # loads from the sidecar
    # same query through both engines must match exactly
    q = rng.integers(0, 20, 33)
    r1, r2 = e1.scan(q), e2.scan(q)
    assert r1.scores == r2.scores
    assert r1.reference_ids == r2.reference_ids


def test_tile_store_disk_backed(tmp_path, rng):
    """The pack sidecar is a disk-backed tile store: tiles load as memmap
    views (bounded host RAM), pack_db_to_store writes a byte-identical
    store while holding only one slab in RAM, and a streaming engine
    scanning from the store matches the resident in-RAM engine."""
    from cudasw4_tpu.db.format import DBData
    from cudasw4_tpu.db.packing import (
        load_packed, pack_db, pack_db_to_store, save_packed,
    )
    from cudasw4_tpu.engine import SearchEngine

    lengths = np.sort(rng.integers(8, 700, size=150)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), UNKNOWN, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]): int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    db = DBData(chars=chars, offsets=offsets, lengths=lengths,
                headers=np.zeros(0, np.uint8),
                header_offsets=np.zeros(len(lengths) + 1, np.uint64))

    packed = pack_db(db)
    p1 = str(tmp_path / "a.tpupack.npz")
    save_packed(packed, p1)
    loaded = load_packed(p1, db.num_sequences, int(lengths.sum()))
    assert isinstance(loaded.buckets[0].tiles, np.memmap)

    # Slab-streamed packing produces the identical store.
    p2 = str(tmp_path / "b.tpupack.npz")
    packed2 = pack_db_to_store(db, p2, slab_tiles=1)
    assert packed2 is not None
    assert open(p1 + ".tiles", "rb").read() == open(p2 + ".tiles", "rb").read()
    for a, b in zip(packed.buckets, packed2.buckets):
        assert (a.L, a.NS, a.kernel) == (b.L, b.NS, b.kernel)
        assert np.array_equal(a.tiles, b.tiles)
        assert np.array_equal(a.seq_index, b.seq_index)

    # Streaming engine reading tiles from the disk store == resident RAM.
    query = rng.integers(0, 20, 40).astype(np.int8)
    res_engine = SearchEngine(num_top=10)
    res_engine.set_database(db)
    want = res_engine.scan(query)

    s_engine = SearchEngine(num_top=10, max_device_bytes=1,
                            stream_chunk_bytes=1 << 16)
    s_engine.set_database(db, pack_cache=p2)
    assert s_engine.streaming
    assert isinstance(s_engine.packed.buckets[0].tiles, np.memmap)
    got = s_engine.scan(query)
    assert got.scores == want.scores
    assert got.reference_ids == want.reference_ids


def test_tile_store_concurrent_build(tmp_path, rng):
    """Two processes racing to build the same tile store (one engine
    process per chip on a multi-chip host shares the pack_cache): the
    flock serialises the pack, the loser loads the winner's store, and
    the result is byte-identical to a single-process build."""
    import os
    import subprocess
    import sys

    from cudasw4_tpu.db.format import DBData
    from cudasw4_tpu.db.packing import pack_db_to_store

    lengths = np.sort(rng.integers(8, 300, size=400)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), UNKNOWN, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]): int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    db = DBData(chars=chars, offsets=offsets, lengths=lengths,
                headers=np.zeros(0, np.uint8),
                header_offsets=np.zeros(len(lengths) + 1, np.uint64))
    np.save(tmp_path / "chars.npy", chars)
    np.save(tmp_path / "offsets.npy", offsets)
    np.save(tmp_path / "lengths.npy", lengths)

    ref = str(tmp_path / "ref.tpupack.npz")
    pack_db_to_store(db, ref, slab_tiles=2)

    worker = tmp_path / "worker.py"
    worker.write_text(
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})\n"
        "from cudasw4_tpu.db.format import DBData\n"
        "from cudasw4_tpu.db.packing import pack_db_to_store\n"
        f"base = {str(tmp_path)!r}\n"
        "db = DBData(chars=np.load(base + '/chars.npy'),\n"
        "            offsets=np.load(base + '/offsets.npy'),\n"
        "            lengths=np.load(base + '/lengths.npy'),\n"
        "            headers=np.zeros(0, np.uint8),\n"
        "            header_offsets=np.zeros(401, np.uint64))\n"
        "p = pack_db_to_store(db, base + '/race.tpupack.npz', slab_tiles=2)\n"
        "assert p is not None\n"
        "print('WORKER_OK')\n"
    )
    env = {"PATH": os.environ.get("PATH", ""), "PYTHONPATH": ""}
    procs = [
        subprocess.Popen([sys.executable, str(worker)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for _ in range(2)
    ]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err
        assert "WORKER_OK" in out
    race = str(tmp_path / "race.tpupack.npz")
    assert (
        open(ref + ".tiles", "rb").read()
        == open(race + ".tiles", "rb").read()
    )
    # no orphaned tmp files
    leftovers = [f for f in os.listdir(tmp_path) if ".tmp." in f]
    assert leftovers == []


def test_makedb_empty_headers_and_sequences(tmp_path):
    """Bare '>' headers and empty records survive the vectorized writer
    (review finding: an all-empty header stream crashed np.take)."""
    fa = tmp_path / "e.fa"
    fa.write_text(">\nACDEF\n>\nGHIKL\n>\n\n")
    from cudasw4_tpu.db.format import load_db, make_db

    make_db(str(fa), str(tmp_path / "edb"))
    db = load_db(str(tmp_path / "edb"))
    assert db.num_sequences == 3
    assert list(db.lengths) == [0, 5, 5]
    assert db.get_header(0) == ""


def test_tile_store_rebuilds_on_edge_change(tmp_path, rng):
    """pack_db_to_store must not return a prior store built under
    different bucket edges (review finding: the short-circuit only
    validated version/shape/pad)."""
    from cudasw4_tpu.db.format import DBData
    from cudasw4_tpu.db.packing import pack_db_to_store

    lengths = np.sort(rng.integers(8, 120, size=300)).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), UNKNOWN, dtype=np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]): int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    db = DBData(chars=chars, offsets=offsets, lengths=lengths,
                headers=np.zeros(0, np.uint8),
                header_offsets=np.zeros(len(lengths) + 1, np.uint64))
    p = str(tmp_path / "s.tpupack.npz")
    first = pack_db_to_store(db, p, edges=[128])
    second = pack_db_to_store(db, p, edges=[64, 128])
    assert [(b.L, b.NS) for b in first.buckets] != \
        [(b.L, b.NS) for b in second.buckets]
    third = pack_db_to_store(db, p, edges=[64, 128])
    assert [(b.L, b.NS) for b in third.buckets] == \
        [(b.L, b.NS) for b in second.buckets]


def test_adaptive_edges_and_tail_granule():
    """Round-5 padding-waste fix: big databases get finer bucket edges
    (balancing edge padding vs last-tile dead lanes) and the long tail
    rounds to the col kernel's 128-column granule instead of the old
    ~1.2x ladder.  The 5M-seq sprot-like measurement: 10.4% of DB chars
    were padding under the classic tiers, fully accounting for the
    resident-scan gap to the equal-length sweep rate."""
    from cudasw4_tpu.db.packing import (
        CELL_MAX_L,
        adaptive_edges,
        ladder_length,
        plan_buckets,
    )

    assert adaptive_edges(10_000) is None          # classic tiers
    assert adaptive_edges(500_000) is None         # measured: classic wins
    e16 = adaptive_edges(5_000_000)
    assert e16[:3] == [16, 32, 48] and e16[-1] == CELL_MAX_L

    assert ladder_length(2100) == 2176      # 128-granule (was 2560)
    assert ladder_length(4096) == 4096
    assert ladder_length(7553) == 7680      # was 8192
    assert ladder_length(9000) == 9216      # 512-granule
    assert ladder_length(20000) == 20480    # 4096-granule

    # plan_buckets on a synthetic big-n length array picks the fine
    # edges and 128-granule tail, with every tail L a multiple of 128.
    rng = np.random.default_rng(0)
    lengths = np.sort(np.clip(
        rng.lognormal(5.7, 0.55, size=2_100_000), 20, 9000
    ).astype(np.int64))
    plan = plan_buckets(lengths)
    fine = [L for _s, _e, L, _ns, _k in plan if L <= CELL_MAX_L]
    assert all(L % 16 == 0 for L in fine)
    assert len(fine) > 25  # finer than the 17 classic cell edges
    tail = [L for _s, _e, L, _ns, _k in plan if L > CELL_MAX_L]
    assert tail and all(L % 128 == 0 for L in tail)
    # coverage: every sequence fits its bucket
    for s, e, L, _ns, _k in plan:
        assert lengths[e - 1] <= L
    assert plan[0][0] == 0 and plan[-1][1] == len(lengths)


def test_adaptive_edges_scan_exact(rng, monkeypatch, tmp_path):
    """A database packed with the fine adaptive edges returns exactly
    the same scan results as the classic tiers and the portable
    scorer (forced on for a small fixture via monkeypatch)."""
    from cudasw4_tpu import ops
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.db.fasta import write_fasta
    from cudasw4_tpu.db.format import load_db, make_db
    from cudasw4_tpu.engine import SearchEngine

    monkeypatch.setattr(ops, "INTERPRET", True)
    aas = "ARNDCQEGHILKMFPSTWYV"
    recs = []
    for i in range(60):
        ln = int(rng.integers(5, 200))
        recs.append((f"p{i}", "".join(aas[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    q = "".join(aas[c] for c in rng.integers(0, 20, 64))

    classic = SearchEngine(num_top=8, qcap=64, backend="pallas")
    classic.set_database(db)
    want = classic.scan(q)

    monkeypatch.setattr(
        packing, "adaptive_edges",
        lambda n: list(range(16, packing.CELL_MAX_L + 1, 16)),
    )
    eng = SearchEngine(num_top=8, qcap=64, backend="pallas")
    eng.set_database(db)
    assert len(eng.packed.buckets) > len(classic.packed.buckets)
    got = eng.scan(q)
    assert got.scores == want.scores

    ref = SearchEngine(num_top=8, qcap=64, backend="jnp")
    ref.set_database(db)
    assert got.scores == ref.scan(q).scores
