import io
import sys

import numpy as np
import pytest

from cudasw4_tpu.cli import align as align_cli
from cudasw4_tpu.cli import makedb as makedb_cli
from cudasw4_tpu.db.fasta import write_fasta

AAS = "ARNDCQEGHILKMFPSTWYV"


@pytest.fixture
def small_db(tmp_path, rng):
    recs = []
    for i in range(20):
        ln = int(rng.integers(5, 60))
        recs.append((f"sp|P{i:05d}|TEST{i} protein {i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    prefix = str(tmp_path / "db")
    assert makedb_cli.run([fa, prefix]) == 0
    qf = str(tmp_path / "q.fa")
    write_fasta(qf, [("query1 test", "".join(AAS[c] for c in rng.integers(0, 20, 25)))])
    return prefix, qf, recs


def _run_align(args, monkeypatch, engine_kwargs=None):
    # shrink qcap so the portable path stays fast on CPU
    import cudasw4_tpu.engine as eng

    orig = eng.SearchEngine.__init__

    def patched(self, *a, **kw):
        kw.setdefault("qcap", 64)
        orig(self, *a, **kw)

    monkeypatch.setattr(eng.SearchEngine, "__init__", patched)
    return align_cli.run(args)


def test_align_plain_output(small_db, tmp_path, capsys, monkeypatch):
    prefix, qf, recs = small_db
    out = str(tmp_path / "out.txt")
    rc = _run_align(["--query", qf, "--db", prefix, "--top", "5", "--of", out], monkeypatch)
    assert rc == 0
    text = open(out).read()
    lines = text.strip().splitlines()
    assert lines[0].startswith("Query 0, headerquery1 test, length 25, num overflows 0")
    assert len(lines) == 6
    assert lines[1].startswith("Result 0. Score: ")
    assert "referenceId" in lines[1]
    # scores descending
    scores = [int(l.split("Score: ")[1].split(".")[0]) for l in lines[1:]]
    assert scores == sorted(scores, reverse=True)
    console = capsys.readouterr().out
    assert "Processing query file" in console
    assert "Processing query 0 ... Done." in console


def test_align_tsv_output(small_db, tmp_path, monkeypatch):
    prefix, qf, recs = small_db
    out = str(tmp_path / "out.tsv")
    rc = _run_align(
        ["--query", qf, "--db", prefix, "--top", "3", "--tsv", "--of", out], monkeypatch
    )
    assert rc == 0
    lines = open(out).read().strip().splitlines()
    assert lines[0].split("\t") == [
        "Query number", "Query length", "Query header", "Result number",
        "Result score", "Reference length", "Reference header", "Reference ID in DB",
    ]
    assert len(lines) == 4
    row = lines[1].split("\t")
    assert row[0] == "0" and row[1] == "25" and row[2] == "query1 test"
    assert row[3] == "0"
    int(row[4]); int(row[5]); int(row[7])


def test_align_pseudodb(monkeypatch, tmp_path, capsys):
    qf = str(tmp_path / "q.fa")
    write_fasta(qf, [("q", "ARNDCQEGHILKMFPSTWYV")])
    out = str(tmp_path / "o.txt")
    rc = _run_align(
        ["--query", qf, "--pseudodb", "7", "40", "--top", "0", "--of", out, "--verbose"],
        monkeypatch,
    )
    assert rc == 0
    console = capsys.readouterr().out
    assert "GCUPS" in console  # verbose timing
    assert open(out).read() == ""  # --top 0 suppresses result output


def test_align_missing_args(capsys):
    rc = align_cli.run([])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Query is missing" in out
    assert "DB prefix is missing" in out
    assert "Usage:" in out


def test_align_kernel_type_validation(small_db, tmp_path, capsys,
                                      monkeypatch):
    """Invalid kernel-type combinations are rejected with the reference's
    exact error text (/root/reference/src/cudasw4.cuh:590-604, 841-855);
    unknown names coerce to Half2 first like stringToKernelType
    (/root/reference/src/options.cpp:81-86)."""
    prefix, qf, _ = small_db
    base = ["--query", qf, "--db", prefix, "--top", "3",
            "--of", str(tmp_path / "o.txt")]

    # valid combos run fine
    rc = _run_align(base + ["--singlePassType", "DPXs32",
                            "--manyPassType_small", "DPXs16",
                            "--manyPassType_large", "Float",
                            "--overflowType", "DPXs32"], monkeypatch)
    assert rc == 0

    for args, msg in [
        (["--manyPassType_small", "Float"],
         "Invalid manyPassType_small kernel type"),
        (["--manyPassType_large", "Half2"],
         "Invalid manyPassType_large kernel type"),
        (["--overflowType", "DPXs16"],
         "Invalid overflow kernel type"),
        # garbage coerces to Half2, invalid for a 32-bit slot
        (["--manyPassType_large", "NoSuchKernel"],
         "Invalid manyPassType_large kernel type"),
    ]:
        capsys.readouterr()
        rc = _run_align(base + args, monkeypatch)
        out = capsys.readouterr().out
        assert rc == 1
        assert msg in out

    # garbage in a slot where Half2 is valid passes (reference behavior)
    rc = _run_align(base + ["--singlePassType", "NoSuchKernel"],
                    monkeypatch)
    assert rc == 0


def test_align_gap_overrides(small_db, tmp_path, monkeypatch):
    prefix, qf, recs = small_db
    out1, out2 = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    _run_align(["--query", qf, "--db", prefix, "--mat", "blosum45", "--of", out1], monkeypatch)
    _run_align(
        ["--query", qf, "--db", prefix, "--mat", "blosum45", "--gop", "-5", "--gex", "-1", "--of", out2],
        monkeypatch,
    )
    assert open(out1).read() != "" and open(out2).read() != ""


def test_interactive_mode(small_db, tmp_path, monkeypatch, capsys):
    prefix, qf, recs = small_db
    out = str(tmp_path / "o.txt")
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("s ARNDARNDARND\n\nbogus\nexit\n")
    )
    rc = _run_align(["--interactive", "--db", prefix, "--of", out], monkeypatch)
    assert rc == 0
    console = capsys.readouterr().out
    assert "Interactive mode ready" in console
    assert "Unrecognized command: bogus" in console
    assert "Result 0. Score:" in open(out).read()


def test_makedb_usage(capsys):
    assert makedb_cli.run([]) == 0
    assert "Usage:" in capsys.readouterr().out


def test_modifydb_verify_and_lengths(small_db, tmp_path, capsys):
    from cudasw4_tpu.cli import modifydb as modifydb_cli

    prefix, qf, recs = small_db
    assert modifydb_cli.run(["verify", prefix]) == 0
    out = capsys.readouterr().out
    assert out.startswith("OK: 20 sequences")
    assert modifydb_cli.run(["lengthsToI64", prefix]) == 0
    import numpy as np
    lens64 = np.fromfile(prefix + "0lengths_i64", dtype=np.int64)
    lens32 = np.fromfile(prefix + "0lengths", dtype=np.int32)
    assert np.array_equal(lens64, lens32.astype(np.int64))


def test_modifydb_convert_chars(small_db, tmp_path, capsys):
    from cudasw4_tpu.cli import modifydb as modifydb_cli
    import numpy as np
    from cudasw4_tpu.db.format import load_db

    prefix, qf, recs = small_db
    # fabricate a raw-ASCII db: decode the chars file back to letters
    from cudasw4_tpu.constants import DECODE_TABLE
    path = prefix + "0chars"
    codes = np.fromfile(path, dtype=np.int8)
    ascii_chars = DECODE_TABLE[codes.astype(np.uint8)]
    # '-' (unknown/padding) is not a valid input letter; use ' ' like makedb
    ascii_chars[ascii_chars == ord("-")] = ord(" ")
    ascii_chars.tofile(path)
    assert modifydb_cli.run(["verify", prefix]) == 1  # detects raw ASCII
    assert modifydb_cli.run(["convertcharstonumber1", prefix]) == 0
    assert modifydb_cli.run(["verify", prefix]) == 0
    assert np.array_equal(np.fromfile(path, dtype=np.int8), codes)


def test_modifydb_unknown_op(small_db, capsys):
    from cudasw4_tpu.cli import modifydb as modifydb_cli

    prefix, _, _ = small_db
    assert modifydb_cli.run(["frobnicate", prefix]) == 1


def test_makedb_capped_identical(tmp_path, rng):
    """--mem spills to temp files but output is byte-identical
    (the reference's FileBackedUVector mechanism, makedb.cpp:80-103)."""
    import filecmp

    from cudasw4_tpu.cli import makedb as makedb_cli

    fa = tmp_path / "in.fa"
    aas = "ARNDCQEGHILKMFPSTWYV"
    with open(fa, "w") as f:
        for i in range(25):
            ln = int(rng.integers(5, 120))
            f.write(f">s{i} hdr\n")
            f.write("".join(aas[c] for c in rng.integers(0, 20, ln)) + "\n")
    p1 = str(tmp_path / "plain")
    p2 = str(tmp_path / "capped")
    makedb_cli.run([str(fa), p1])
    makedb_cli.run([str(fa), p2, "--mem", "1M", "--tempdir", str(tmp_path)])
    for suf in ("0chars", "0offsets", "0lengths", "0headers",
                "0headeroffsets", "0metadata"):
        assert filecmp.cmp(p1 + suf, p2 + suf, shallow=False), suf


def test_kernel_type_flags_select_state(small_db, tmp_path, monkeypatch, capsys):
    """--dpx / --singlePassType map to the int16-state fast path (the
    reference KernelTypeConfig, options.cpp:154-201); Float/DPXs32 force
    the exact path; results are identical either way."""
    import cudasw4_tpu.engine as eng

    prefix, qf, _ = small_db
    seen = {}
    orig = eng.SearchEngine.set_database

    def spy(self, *a, **kw):
        seen["engine"] = self
        return orig(self, *a, **kw)

    monkeypatch.setattr(eng.SearchEngine, "set_database", spy)
    assert _run_align(["--query", qf, "--db", prefix, "--dpx"], monkeypatch) == 0
    assert seen["engine"].state16 is True
    out_dpx = capsys.readouterr().out
    assert _run_align(
        ["--query", qf, "--db", prefix, "--singlePassType", "Float"],
        monkeypatch,
    ) == 0
    assert seen["engine"].state16 is False
    assert capsys.readouterr().out == out_dpx


def test_gridsearch_tuning_roundtrip(tmp_path, monkeypatch):
    """gridsearch's derive_tuning -> align --tuning feedback loop: emitted
    speed ratios steer choose_bucket_layout (the reference closes this
    loop by hand-editing its dispatch table from gridsearch output)."""
    import json

    from cudasw4_tpu.cli.gridsearch import derive_tuning
    from cudasw4_tpu.db import packing

    # Synthetic sweep rows: cell 3x row at L<=512, col 2x row at L=1024.
    rows = [
        ("row", 256, 2, 8, 512, 0.3, 100.0),
        ("cell", 256, 4, 8, 512, 0.1, 300.0),
        ("cell", 256, 8, 8, 512, 0.2, 150.0),
        ("row", 1024, 2, 8, 512, 0.3, 100.0),
        ("col", 1024, 4, 8, 512, 0.15, 200.0),
    ]
    cfg = derive_tuning(rows)
    assert cfg["cell_speedup"] == 3.0
    assert cfg["col_speedup"] == 2.0
    # best-unroll bookkeeping keeps the winning unroll, not the last run
    cell_best = [b for b in cfg["best"] if b["kernel"] == "cell"][0]
    assert cell_best["unroll"] == 4

    f = tmp_path / "tuning.json"
    f.write_text(json.dumps(cfg))
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 1.75)
    monkeypatch.setattr(packing, "COL_SPEEDUP", 2.8)
    packing.apply_tuning(str(f))
    try:
        assert packing.CELL_SPEEDUP == 3.0
        assert packing.COL_SPEEDUP == 2.0
        # 3900 seqs at L=256: cell eff 3900/4096*3.0 = 2.86 beats row eff
        # ~0.98 under the applied 3x ratio, but loses under 0.5x — the
        # applied ratios really drive the layout choice.
        ns, kernel = packing.choose_bucket_layout(256, 3900)
        assert kernel == "cell"
        packing.apply_tuning({"cell_speedup": 0.5})
        ns, kernel = packing.choose_bucket_layout(256, 3900)
        assert kernel == "row"
    finally:
        packing.CELL_SPEEDUP = 1.75
        packing.COL_SPEEDUP = 2.8


def test_align_tuning_flag(small_db, tmp_path, monkeypatch, capsys):
    """--tuning file.json applies before packing."""
    import json

    from cudasw4_tpu.db import packing

    prefix, qf, _ = small_db
    f = tmp_path / "t.json"
    f.write_text(json.dumps({"cell_speedup": 9.9, "version": 1}))
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 1.75)
    assert _run_align(
        ["--query", qf, "--db", prefix, "--top", "3", "--tuning", str(f)],
        monkeypatch,
    ) == 0
    assert packing.CELL_SPEEDUP == 9.9
    packing.CELL_SPEEDUP = 1.75


def test_makedb_prepack_builds_store_and_sidecar(tmp_path, rng, monkeypatch,
                                                 capsys):
    """--prepackStream builds the tile store + transfer sidecar at db
    build time; align then loads it instead of packing and produces the
    same output as a cold run."""
    import os

    recs = []
    for i in range(15):
        ln = int(rng.integers(5, 60))
        recs.append((f"p{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    prefix = str(tmp_path / "db")
    assert makedb_cli.run([fa, prefix, "--prepackStream", "1K"]) == 0
    store = prefix + "0.tpupack.npz"
    assert os.path.exists(store) and os.path.exists(store + ".tiles")
    assert os.path.exists(os.path.join(store + ".pack5", "manifest.json"))
    store_mtime = os.path.getmtime(store)

    qf = str(tmp_path / "q.fa")
    write_fasta(qf, [("q", "".join(AAS[c] for c in rng.integers(0, 20, 25)))])
    out = str(tmp_path / "out.tsv")
    rc = _run_align(
        ["--query", qf, "--db", prefix, "--top", "5", "--of", out,
         "--maxGpuMem", "1K"],
        monkeypatch,
    )
    assert rc == 0
    # align reused the prepacked store (no rebuild)
    assert os.path.getmtime(store) == store_mtime

    # cold run without the store must agree
    for p in (store, store + ".tiles"):
        os.remove(p)
    out2 = str(tmp_path / "out2.tsv")
    rc = _run_align(
        ["--query", qf, "--db", prefix, "--top", "5", "--of", out2,
         "--maxGpuMem", "1K"],
        monkeypatch,
    )
    assert rc == 0
    assert open(out).read() == open(out2).read()


def test_makedb_prepack_then_prepackstream_builds_sidecar(tmp_path, rng,
                                                          capsys):
    """--prepack first, --prepackStream later: the second run must reuse
    the matching prior store AND build the missing transfer sidecar from
    its memmap tiles (advisor round-2 finding: the early `return prior`
    silently skipped it), and report the sidecar only when written."""
    import os

    recs = []
    for i in range(15):
        ln = int(rng.integers(5, 60))
        recs.append((f"p{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    prefix = str(tmp_path / "db")
    assert makedb_cli.run([fa, prefix, "--prepack"]) == 0
    first = capsys.readouterr().out
    assert "transfer sidecar" not in first
    store = prefix + "0.tpupack.npz"
    assert os.path.exists(store)
    assert not os.path.exists(os.path.join(store + ".pack5", "manifest.json"))
    tiles_mtime = os.path.getmtime(store + ".tiles")

    assert makedb_cli.run([fa, prefix, "--prepackStream", "1K"]) == 0
    second = capsys.readouterr().out
    assert "+ transfer sidecar" in second
    assert os.path.exists(os.path.join(store + ".pack5", "manifest.json"))
    # the store itself was reused, not rebuilt
    assert os.path.getmtime(store + ".tiles") == tiles_mtime

    # the sidecar validates against the engine's streaming manifest
    from cudasw4_tpu.constants import UNKNOWN
    from cudasw4_tpu.db.format import load_db
    from cudasw4_tpu.db.packing import (
        _packed_layout,
        load_packed,
        stream_manifest,
        stream_sidecar_fresh,
    )
    from cudasw4_tpu.ops.pack5 import choose_codec

    db = load_db(prefix)
    packed = load_packed(
        store, db.num_sequences, int(db.lengths.sum()), expect_pad=UNKNOWN
    )
    codec = choose_codec("1", int(UNKNOWN))
    assert stream_sidecar_fresh(
        store,
        stream_manifest(
            codec, int(UNKNOWN), packed.num_sequences,
            packed.total_real_chars, _packed_layout(packed),
        ),
    )


def test_makedb_value_flag_missing_value(tmp_path, rng, capsys):
    """A value-taking flag given last prints USAGE and fails cleanly
    instead of raising IndexError (advisor round-2 finding)."""
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, [("p0", "".join(AAS[c] for c in rng.integers(0, 20, 30)))])
    prefix = str(tmp_path / "db")
    for flag in ("--prepackStream", "--mem", "--tempdir"):
        assert makedb_cli.run([fa, prefix, flag]) == 1
        out = capsys.readouterr().out
        assert "Missing value" in out and "Usage" in out
