"""5-bit transfer packing (ops/pack5.py) and the packed streaming path.

Streaming mode ships tiles host->HBM at 5.33 bits/residue (6 codes per
int32 word) and unpacks on device; scores must be identical to raw-byte
streaming and to the resident scan.
"""

import os

import numpy as np
import pytest

from cudasw4_tpu.db.fasta import write_fasta
from cudasw4_tpu.db.format import load_db, make_db
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.ops import pack5

AAS = "ARNDCQEGHILKMFPSTWYV"


def test_pack5_roundtrip(rng):
    for shape in [(3, 16, 4, 8), (2, 7, 5), (1, 6), (4, 1)]:
        tiles = rng.integers(0, 26, size=shape).astype(np.int8)
        packed = pack5.pack5(tiles)
        E = int(np.prod(shape[1:]))
        assert packed.shape == (shape[0], pack5.words_for(E))
        assert packed.dtype == np.int32
        assert (packed >= 0).all()  # top bits unused: shifts well-defined
        back = pack5.unpack5_np(packed, shape[1:])
        np.testing.assert_array_equal(back, tiles)
        back_dev = np.asarray(pack5.unpack5(packed, tuple(shape[1:])))
        np.testing.assert_array_equal(back_dev, tiles)


def test_pack21_roundtrip(rng):
    for shape in [(3, 16, 4, 8), (2, 7, 5), (1, 6), (4, 1)]:
        tiles = rng.integers(0, 21, size=shape).astype(np.int8)
        packed = pack5.pack21(tiles)
        E = int(np.prod(shape[1:]))
        assert packed.shape == (shape[0], pack5.words_for21(E))
        assert packed.dtype == np.int32
        assert (packed >= 0).all()  # 21^7 < 2^31
        back = pack5.unpack21_np(packed, shape[1:])
        np.testing.assert_array_equal(back, tiles)
        back_dev = np.asarray(pack5.unpack21(packed, tuple(shape[1:])))
        np.testing.assert_array_equal(back_dev, tiles)


def test_pack21_rejects_out_of_range(rng):
    tiles = np.full((2, 8), 21, np.int8)  # 21 is not a classic code
    with pytest.raises(ValueError):
        pack5.pack21(tiles)


def test_choose_codec():
    assert pack5.choose_codec("0", 20) is None
    assert pack5.choose_codec("1", 20) == "b32"
    assert pack5.choose_codec("2", 20) == "b21"
    assert pack5.choose_codec("2", 25) == "b32"  # full-blosum alphabet
    # Unrecognized values fail closed (no silent codec enablement).
    assert pack5.choose_codec("", 20) is None
    assert pack5.choose_codec("off", 20) is None


def test_pack_range_checked_beyond_first_slab(rng):
    """Out-of-range codes in ANY slab must be rejected (silent word
    corruption otherwise: b32 field bleed, b21 int32 overflow)."""
    tiles = rng.integers(0, 21, size=(130, 8)).astype(np.int8)
    tiles[129, 3] = 25  # beyond the first slab of 64
    with pytest.raises(ValueError):
        pack5.pack21(tiles, slab=64)
    tiles[129, 3] = -1
    with pytest.raises(ValueError):
        pack5.pack5(tiles, slab=64)


def test_pack_native_matches_numpy(rng, monkeypatch):
    """The C++ pack kernels must produce bit-identical words to the
    numpy Horner/shift pack (the test oracle), including tail padding
    and memmap-slice outputs."""
    from cudasw4_tpu import native

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    for codec, maker in (("b32", pack5.pack5), ("b21", pack5.pack21)):
        hi = 26 if codec == "b32" else 21
        tiles = rng.integers(0, hi, size=(37, 11, 5)).astype(np.int8)
        with_native = maker(tiles, slab=16)
        monkeypatch.setenv("CUDASW4_TPU_NATIVE", "0")
        with_numpy = maker(tiles, slab=16)
        monkeypatch.delenv("CUDASW4_TPU_NATIVE")
        np.testing.assert_array_equal(with_native, with_numpy)


def test_pack5_out_and_slab(rng):
    tiles = rng.integers(0, 21, size=(130, 10, 3)).astype(np.int8)
    out = np.zeros((130, pack5.words_for(30)), np.int32)
    got = pack5.pack5(tiles, out=out, slab=7)
    assert got is out
    np.testing.assert_array_equal(
        pack5.unpack5_np(out, (10, 3)), tiles
    )


@pytest.fixture
def db(tmp_path, rng):
    recs = [
        (f"s{i}", "".join(AAS[c] for c in rng.integers(0, 20, int(n))))
        for i, n in enumerate(rng.integers(5, 90, 40))
    ]
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    return load_db(str(tmp_path / "db"))


def _results(eng, qs):
    return [(r.scores, r.reference_ids) for r in eng.scan_batch(qs)]


def test_streaming_packed_matches_raw(db, rng, monkeypatch):
    qs = [rng.integers(0, 20, int(n)).astype(np.int8) for n in (12, 30, 55)]
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "0")
    raw = SearchEngine(num_top=10, qcap=64, max_device_bytes=1)
    raw.set_database(db)
    assert raw.streaming and raw._stream_pack is None
    want = _results(raw, qs)

    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "1")
    eng = SearchEngine(num_top=10, qcap=64, max_device_bytes=1)
    eng.set_database(db)
    assert eng.streaming and eng._stream_pack is not None
    assert _results(eng, qs) == want

    resident = SearchEngine(num_top=10, qcap=64)
    resident.set_database(db)
    assert _results(resident, qs) == want


def test_streaming_b21_matches_raw(db, rng, monkeypatch):
    """CUDASW4_TPU_STREAM_PACK=2 (base-21 codec) must score identically
    to unpacked streaming."""
    qs = [rng.integers(0, 20, int(n)).astype(np.int8) for n in (12, 55)]
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "0")
    raw = SearchEngine(num_top=10, qcap=64, max_device_bytes=1)
    raw.set_database(db)
    want = _results(raw, qs)

    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "2")
    eng = SearchEngine(num_top=10, qcap=64, max_device_bytes=1)
    eng.set_database(db)
    assert eng._stream_codec == "b21"
    assert _results(eng, qs) == want


def test_streaming_prefetch_off_matches_on(db, rng, monkeypatch):
    """The prefetch worker thread only moves host-side chunk assembly;
    results must be identical with it disabled."""
    qs = [rng.integers(0, 20, int(n)).astype(np.int8) for n in (15, 48)]
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PREFETCH", "0")
    off = SearchEngine(num_top=10, qcap=64, max_device_bytes=1)
    off.set_database(db)
    want = _results(off, qs)
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PREFETCH", "1")
    on = SearchEngine(num_top=10, qcap=64, max_device_bytes=1)
    on.set_database(db)
    assert _results(on, qs) == want


def test_streaming_prefetch_propagates_worker_error(db, monkeypatch):
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PREFETCH", "1")
    eng = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
    eng.set_database(db)

    def boom():
        raise RuntimeError("disk gone")
        yield  # pragma: no cover

    eng._stream_chunks = boom
    with pytest.raises(RuntimeError, match="disk gone"):
        eng.scan(np.zeros(8, np.int8))


def test_streaming_pack_sidecar_reuse(db, rng, tmp_path, monkeypatch):
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "1")
    cache = str(tmp_path / "cache")
    q = rng.integers(0, 20, 20).astype(np.int8)

    eng = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
    eng.set_database(db, pack_cache=cache)
    want = eng.scan(q)
    sidecar = cache + ".pack5"
    assert os.path.exists(os.path.join(sidecar, "manifest.json"))

    # Second engine must reuse the sidecar read-only (memmap mode "r").
    eng2 = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
    eng2.set_database(db, pack_cache=cache)
    mm, _pad = eng2._stream_pack[0]
    assert isinstance(mm, np.memmap) and mm.mode == "r"
    got = eng2.scan(q)
    assert got.scores == want.scores
    assert got.reference_ids == want.reference_ids


def test_streaming_pack_sidecar_stale_on_char_change(db, rng, tmp_path,
                                                     monkeypatch):
    """A DB with the same sequence count and bucket geometry but
    different residues must NOT reuse the old sidecar (manifest records
    total_chars)."""
    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "1")
    cache = str(tmp_path / "cache")
    eng = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
    eng.set_database(db, pack_cache=cache)

    import dataclasses

    # One residue shorter in some sequence (stays within its padded
    # slot and keeps the ascending sort): the main tile cache repacks,
    # and the pack5 sidecar must repack with it.
    lengths2 = np.array(db.lengths).copy()
    i = next(
        i for i in range(len(lengths2))
        if lengths2[i] > 5 and (i == 0 or lengths2[i] - 1 >= lengths2[i - 1])
    )
    lengths2[i] -= 1
    db2 = dataclasses.replace(db, lengths=lengths2)
    eng2 = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
    eng2.set_database(db2, pack_cache=str(tmp_path / "cache2"))
    eng3 = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
    eng3.set_database(db2, pack_cache=cache)  # stale sidecar dir
    q = rng.integers(0, 20, 20).astype(np.int8)
    want = eng2.scan(q)
    got = eng3.scan(q)
    assert got.scores == want.scores
    assert got.reference_ids == want.reference_ids


def test_streaming_pack_sidecar_readonly_fallback(db, rng, tmp_path,
                                                  monkeypatch):
    """An unwritable sidecar location must fall back to temp files, not
    fail set_database (cache is best-effort, like the main tile store)."""
    import stat

    monkeypatch.setenv("CUDASW4_TPU_STREAM_PACK", "1")
    rodir = tmp_path / "ro"
    rodir.mkdir()
    os.chmod(rodir, stat.S_IRUSR | stat.S_IXUSR)
    try:
        eng = SearchEngine(num_top=5, qcap=64, max_device_bytes=1)
        eng.set_database(db, pack_cache=str(rodir / "cache"))
        assert eng._stream_pack is not None
        q = rng.integers(0, 20, 20).astype(np.int8)
        ref = SearchEngine(num_top=5, qcap=64)
        ref.set_database(db)
        assert eng.scan(q).scores == ref.scan(q).scores
    finally:
        os.chmod(rodir, stat.S_IRWXU)
