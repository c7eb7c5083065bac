"""Full-blosum (25-dim) scoring mode (round-1 verdict item 7).

The reference's CAN_USE_FULL_BLOSUM build scores code 20 as 'B' via the
25-dim tables (/root/reference/src/types.hpp:205-396) and never scores
padded positions (per-sequence exact lengths).  Our tiles score the
padded extent, so full mode packs padding as the dedicated code 25 whose
matrix row is the constant ``low`` — oracle equality on B/X-containing
inputs proves both the mode and the padding safety.
"""

import numpy as np
import pytest

import cudasw4_tpu.ops as ops
from cudasw4_tpu import encode, make_scoring_config
from cudasw4_tpu.db import packing
from cudasw4_tpu.db.fasta import write_fasta
from cudasw4_tpu.db.format import load_db, make_db
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.ops import sw_pallas_col
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.substitution import BlosumType

AAS = "ARNDCQEGHILKMFPSTWYV"


def test_full_config_shape_and_safety():
    for name in ("blosum45", "blosum50", "blosum62", "blosum80"):
        full = make_scoring_config(name + "_full")
        classic = make_scoring_config(name)
        assert full.is_full and not classic.is_full
        assert full.matrix.shape == (26, 26)
        assert classic.matrix.shape == (21, 21)
        assert full.pad_code == 25 and classic.pad_code == 20
        assert np.array_equal(full.matrix, full.matrix.T)
        # Padding row must never be able to raise a local-alignment score.
        assert (full.matrix[25] < 0).all()
        # Code 20 is 'B' in full mode: its row differs from classic "low".
        assert not np.array_equal(full.matrix[20, :20], classic.matrix[20, :20])
        # Core 20x20 identical between modes.
        assert np.array_equal(full.matrix[:20, :20], classic.matrix[:20, :20])
    # Enum semantics: non-_20 enums are full.
    assert make_scoring_config(BlosumType.BLOSUM62).is_full


def _db(tmp_path, rng, with_long=False):
    recs = []
    for i in range(25):
        ln = int(rng.integers(5, 60))
        seq = list(AAS[c] for c in rng.integers(0, 20, ln))
        if i % 3 == 0:  # sprinkle ambiguity codes (encode to 20)
            seq[rng.integers(0, ln)] = "B"
        if i % 5 == 0:
            seq[rng.integers(0, ln)] = "X"
        recs.append((f"s{i}", "".join(seq)))
    if with_long:
        for i in range(8):
            ln = int(rng.integers(66, 90))
            recs.append(
                (f"l{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln)))
            )
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    return load_db(str(tmp_path / "db"))


def _oracle_topk(cfg, db, qcodes, k=10):
    scores = [
        sw_score_scalar(
            qcodes, db.get_sequence(i), cfg.matrix, cfg.gop, cfg.gex
        )
        for i in range(db.num_sequences)
    ]
    order = np.lexsort((np.arange(len(scores)), -np.asarray(scores)))[:k]
    return [int(scores[i]) for i in order]


def test_full_mode_engine_matches_oracle(tmp_path, rng):
    db = _db(tmp_path, rng)
    q = "ARNDBXWW*JZYVARNDCQEG"  # full-alphabet query (B/X/*/J/Z -> 20)
    qcodes = encode(q)
    assert (qcodes == 20).sum() >= 5

    cfg = make_scoring_config("blosum62_full")
    eng = SearchEngine(scoring=cfg, num_top=10, qcap=64, backend="jnp")
    eng.set_database(db)
    got = eng.scan(q)
    assert got.scores == _oracle_topk(cfg, db, qcodes)

    # Classic mode scores the same query differently (B row vs constant
    # low), and also matches its own oracle.
    classic = make_scoring_config("blosum62")
    eng2 = SearchEngine(scoring=classic, num_top=10, qcap=64, backend="jnp")
    eng2.set_database(db)
    got2 = eng2.scan(q)
    assert got2.scores == _oracle_topk(classic, db, qcodes)
    assert got.scores != got2.scores


def test_full_mode_pallas_kernels(tmp_path, rng, monkeypatch):
    """26-plane LUT in the cell/row/col kernels (interpret mode): the
    Pallas engine in full mode equals the portable-scorer engine."""
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    monkeypatch.setattr(sw_pallas_col, "NQC", 32)
    monkeypatch.setattr(packing, "CELL_MAX_L", 64)
    monkeypatch.setattr(packing, "COL_SPEEDUP", 1e9)
    monkeypatch.setattr(ops, "INTERPRET", True)
    db = _db(tmp_path, rng, with_long=True)
    cfg = make_scoring_config("blosum62_full")
    q = "ARNDBXWWYVARNDCQEGBB"

    want = SearchEngine(scoring=cfg, num_top=10, qcap=64, backend="jnp")
    want.set_database(db)
    ref = want.scan(q)
    assert ref.scores == _oracle_topk(cfg, db, encode(q))

    eng = SearchEngine(scoring=cfg, num_top=10, qcap=64, backend="pallas")
    eng.set_database(db)
    got = eng.scan(q)
    assert got.scores == ref.scores

    # Long query through the chunked col path, full alphabet.
    qlong = "".join(
        ("B" if i % 7 == 0 else AAS[c])
        for i, c in enumerate(rng.integers(0, 20, 70))
    )
    assert want.scan(qlong).scores == eng.scan(qlong).scores


def test_full_mode_pack_cache_isolation(tmp_path, rng):
    """Full and classic modes use different padding codes: a store packed
    in one mode must not be loaded by the other."""
    db = _db(tmp_path, rng)
    path = str(tmp_path / "cache.npz")
    cfg = make_scoring_config("blosum62_full")
    eng = SearchEngine(scoring=cfg, num_top=5, qcap=64, backend="jnp")
    eng.set_database(db, pack_cache=path)
    from cudasw4_tpu.db.packing import load_packed

    total = int(np.sum(db.lengths))
    assert load_packed(path, db.num_sequences, total, expect_pad=25) is not None
    assert load_packed(path, db.num_sequences, total, expect_pad=20) is None
