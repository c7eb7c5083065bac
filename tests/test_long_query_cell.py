"""Queries beyond the engine's qcap on cell buckets keep the cell kernel.

The cell kernel's query is a scalar-prefetch (SMEM) operand, so it accepts
any SMEM-fitting length — the engine grows the query block in QCAP steps up
to sw_pallas_cell.QCAP_MAX instead of dropping to the portable scorer
(round-2 roadmap item; the reference bounds query length only by int32,
/root/reference/src/config.hpp:26-30).  These tests poison the portable
scorer to prove the kernel path is taken on all three entry points:
resident single-chip, resident mesh, and streaming.
"""

import jax
import numpy as np
import pytest

import cudasw4_tpu.ops as ops
from cudasw4_tpu.db import packing
from cudasw4_tpu.db.fasta import write_fasta
from cudasw4_tpu.db.format import load_db, make_db
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.ops import sw_jax
from cudasw4_tpu.parallel.sharding import make_mesh

AAS = "ARNDCQEGHILKMFPSTWYV"


@pytest.fixture(scope="module")
def db(tmp_path_factory):
    """Short sequences only -> cell buckets only (no col, no row)."""
    rng = np.random.default_rng(5150)
    recs = [
        (f"s{i}", "".join(AAS[c] for c in rng.integers(0, 20, int(n))))
        for i, n in enumerate(rng.integers(5, 60, 40))
    ]
    d = tmp_path_factory.mktemp("celldb")
    fa = str(d / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(d / "db"))
    return load_db(str(d / "db"))


@pytest.fixture(scope="module")
def query():
    rng = np.random.default_rng(99)
    return rng.integers(0, 20, 100).astype(np.int8)  # > qcap=64 below


@pytest.fixture(scope="module")
def want(db, query):
    eng = SearchEngine(num_top=10, backend="jnp")  # default qcap > 100
    eng.set_database(db)
    return eng.scan(query)


@pytest.fixture
def cellpatch(monkeypatch):
    monkeypatch.setattr(ops, "INTERPRET", True)
    # Small buckets prefer the row layout on padding efficiency; force the
    # cell layout so these tests exercise the cell kernel's long-query
    # path on a tiny DB.
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 1e9)

    def boom(*a, **k):
        raise AssertionError("portable scorer must not run")

    monkeypatch.setattr(sw_jax, "score_tiles_jnp", boom)
    monkeypatch.setattr(sw_jax, "score_tiles_jnp_chunked", boom)


def _assert_same_hits(got, want):
    assert got.scores == want.scores
    ws = {}
    for s, r in zip(want.scores, want.reference_ids):
        ws.setdefault(s, set()).add(r)
    for s, r in zip(got.scores, got.reference_ids):
        assert r in ws[s]


def test_resident_single_chip(db, query, want, cellpatch):
    eng = SearchEngine(num_top=10, qcap=64, backend="pallas")
    eng.set_database(db)
    assert {b.kernel for b in eng.packed.buckets} == {"cell"}
    _assert_same_hits(eng.scan(query), want)


@pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)
def test_resident_mesh(db, query, want, cellpatch):
    mesh = make_mesh(jax.devices()[:2])
    eng = SearchEngine(num_top=10, qcap=64, backend="pallas", mesh=mesh)
    eng.set_database(db)
    assert not eng.streaming
    _assert_same_hits(eng.scan(query), want)


def test_streaming(db, query, want, cellpatch, monkeypatch):
    """Streamed DB, query beyond the batch slot capacity AND the engine
    qcap: rides the streamed chunks through the per-query cell kernel
    with a grown SMEM query block (not the portable scorer)."""
    from cudasw4_tpu.ops import sw_pallas_cell

    monkeypatch.setattr(sw_pallas_cell, "QCAP_BATCH", 64)
    eng = SearchEngine(
        num_top=10, qcap=64, backend="pallas", max_device_bytes=1
    )
    eng.set_database(db)
    assert eng.streaming
    _assert_same_hits(eng.scan(query), want)


def test_beyond_qcap_max_uses_portable(db, query, monkeypatch):
    """Queries beyond QCAP_MAX still score (portable fallback)."""
    from cudasw4_tpu.ops import sw_pallas_cell

    monkeypatch.setattr(ops, "INTERPRET", True)
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 1e9)
    monkeypatch.setattr(sw_pallas_cell, "QCAP_MAX", 80)
    want2 = SearchEngine(num_top=10, backend="jnp")
    want2.set_database(db)
    w = want2.scan(query)
    eng = SearchEngine(num_top=10, qcap=64, backend="pallas")
    eng.set_database(db)
    _assert_same_hits(eng.scan(query), w)
