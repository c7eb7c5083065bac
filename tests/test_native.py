"""Native C++ IO library vs pure-Python fallbacks (byte-for-byte)."""

import gzip

import numpy as np
import pytest

from cudasw4_tpu.constants import encode, pad_length
from cudasw4_tpu.db.fasta import read_sequences, write_fasta
from cudasw4_tpu.db.packing import pack_db
from cudasw4_tpu.native import get_lib, pack_bucket_native, parse_fasta_native

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")

AAS = "ARNDCQEGHILKMFPSTWYV"


def _python_reference(path):
    chars, offsets, lengths, headers = [], [0], [], []
    total = 0
    for rec in read_sequences(path):
        padded = rec.sequence + " " * (pad_length(len(rec.sequence)) - len(rec.sequence))
        chars.append(encode(padded))
        total += len(padded)
        offsets.append(total)
        lengths.append(len(rec.sequence))
        headers.append(rec.header.encode("latin-1"))
    return (
        np.concatenate(chars) if chars else np.zeros(0, np.int8),
        np.asarray(offsets, np.int64),
        np.asarray(lengths, np.int32),
        headers,
    )


def _check(path):
    native = parse_fasta_native(path)
    want = _python_reference(path)
    assert native is not None
    assert np.array_equal(native[0], want[0])
    assert np.array_equal(native[1], want[1])
    assert np.array_equal(native[2], want[2])
    assert native[3] == want[3]


def test_parse_plain_fasta(tmp_path, rng):
    recs = []
    for i in range(30):
        ln = int(rng.integers(1, 200))
        recs.append((f"id{i} some description {i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    p = str(tmp_path / "t.fa")
    write_fasta(p, recs)
    _check(p)


def test_parse_gzip_multiline_crlf(tmp_path):
    p = str(tmp_path / "t.fa.gz")
    content = ">h1 desc\r\nMKV\r\nLAA\r\n\r\n>h2\nWWxzj*\n>empty\n>h4\nACDE\n"
    with gzip.open(p, "wt", newline="") as f:
        f.write(content)
    _check(p)


def test_parse_fastq(tmp_path):
    p = str(tmp_path / "t.fq")
    with open(p, "w") as f:
        f.write("@r1 desc\nMKVL\n+\n!!!!\n@r2\nWWAA\nCC\n+r2\n!!!!!!\n@r3\nV\n+\n!\n")
    _check(p)


def test_parse_long_lines(tmp_path, rng):
    # sequence line longer than the 64KB native line buffer
    seq = "".join(AAS[c] for c in rng.integers(0, 20, 200_000))
    p = str(tmp_path / "long.fa")
    with open(p, "w") as f:
        f.write(f">long protein\n{seq}\n>tail\nWW\n")
    _check(p)


def test_parse_missing_file(tmp_path):
    with pytest.raises(ValueError):
        parse_fasta_native(str(tmp_path / "nope.fa"))


def test_pack_bucket_native_matches_python(tmp_path, rng):
    from cudasw4_tpu.db.format import load_db, make_db

    recs = []
    for i in range(137):
        ln = int(rng.integers(1, 300))
        recs.append((f"s{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "m.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    a = pack_db(db, use_native=True)
    b = pack_db(db, use_native=False)
    assert len(a.buckets) == len(b.buckets)
    for x, y in zip(a.buckets, b.buckets):
        assert (x.L, x.NS) == (y.L, y.NS)
        assert np.array_equal(x.tiles, y.tiles)
        assert np.array_equal(x.seq_index, y.seq_index)
        assert np.array_equal(x.lengths, y.lengths)


def test_pack_bucket_native_full_blosum_pad(tmp_path, rng):
    """Native packer honors a non-UNKNOWN pad code (full-blosum mode packs
    with a dedicated padding code so disk UNKNOWN pad bytes are rewritten)."""
    from cudasw4_tpu.db.format import load_db, make_db

    recs = []
    for i in range(200):
        ln = int(rng.integers(1, 300))
        recs.append((f"s{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "m.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    db = load_db(str(tmp_path / "db"))
    for pad in (24, 0):
        a = pack_db(db, use_native=True, pad_code=pad)
        b = pack_db(db, use_native=False, pad_code=pad)
        for x, y in zip(a.buckets, b.buckets):
            assert np.array_equal(x.tiles, y.tiles)
            assert np.array_equal(x.seq_index, y.seq_index)
            assert np.array_equal(x.lengths, y.lengths)


def test_stream_fasta_native_batches(tmp_path, rng):
    """Streaming parse in small batches == whole-file parse."""
    import pytest

    from cudasw4_tpu.native import get_lib, parse_fasta_native, stream_fasta_native

    if get_lib() is None:
        pytest.skip("native library unavailable")
    fa = tmp_path / "s.fa"
    aas = "ARNDCQEGHILKMFPSTWYV"
    with open(fa, "w") as f:
        for i in range(37):
            ln = int(rng.integers(3, 90))
            f.write(f">h{i} x\n")
            seq = "".join(aas[c] for c in rng.integers(0, 20, ln))
            for s in range(0, ln, 17):
                f.write(seq[s:s+17] + "\n")
    whole = parse_fasta_native(str(fa))
    chars_w, offs_w, lens_w, hdrs_w = whole

    chars_p, lens_p, hdrs_p = [], [], []
    for bc, bo, bl, bh in stream_fasta_native(str(fa), chunk_chars=200):
        chars_p.append(bc)
        lens_p.extend(bl)
        hdrs_p.extend(bh)
    assert np.array_equal(np.concatenate(chars_p), chars_w)
    assert list(lens_p) == list(lens_w)
    assert hdrs_p == hdrs_w
