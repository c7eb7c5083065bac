"""Multi-device DB-sharded scan on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from cudasw4_tpu import encode
from cudasw4_tpu.db.fasta import write_fasta
from cudasw4_tpu.db.format import load_db, make_db, pseudo_to_dbdata
from cudasw4_tpu.db.pseudo import make_pseudo_db
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.parallel.sharding import make_mesh

AAS = "ARNDCQEGHILKMFPSTWYV"

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _db(tmp_path, rng, n=60, max_len=90):
    recs = []
    for i in range(n):
        ln = int(rng.integers(3, max_len))
        recs.append((f"p{i}", "".join(AAS[c] for c in rng.integers(0, 20, ln))))
    fa = str(tmp_path / "db.fa")
    write_fasta(fa, recs)
    make_db(fa, str(tmp_path / "db"))
    return load_db(str(tmp_path / "db"))


def test_sharded_matches_single_device(tmp_path, rng):
    db = _db(tmp_path, rng)
    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))

    single = SearchEngine(num_top=10, qcap=64)
    single.set_database(db)
    want = single.scan(query)

    mesh = make_mesh()
    sharded = SearchEngine(num_top=10, qcap=64, mesh=mesh)
    sharded.set_database(db)
    got = sharded.scan(query)

    assert got.scores == want.scores
    # ids may permute only within equal scores
    ws = {}
    for s, r in zip(want.scores, want.reference_ids):
        ws.setdefault(s, set()).add(r)
    for s, r in zip(got.scores, got.reference_ids):
        assert r in ws[s]


def test_sharded_pseudo_db():
    mesh = make_mesh()
    engine = SearchEngine(num_top=4, qcap=64, mesh=mesh)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(10, 40)))
    result = engine.scan("ARNDCQEGHILKMFPSTWYV")
    assert len(result.scores) == 4
    assert len(set(result.scores)) == 1  # identical sequences
    assert all(r >= 0 for r in result.reference_ids)


def test_sharded_top_exceeds_shard(tmp_path, rng):
    """k larger than any single shard's real sequence count."""
    db = _db(tmp_path, rng, n=10)
    mesh = make_mesh()
    engine = SearchEngine(num_top=10, qcap=64, mesh=mesh)
    engine.set_database(db)
    result = engine.scan("ARND")
    assert len(result.scores) == 10
    assert sorted(result.reference_ids) == list(range(10))


def test_merge_topk_cross_shard_ties():
    """Equal scores across shards resolve to the lowest reference id
    (the engine-wide tie rule) — shard order is not id order when the DB
    has more than one bucket, so the final merge must sort explicitly."""
    import jax.numpy as jnp

    from cudasw4_tpu.parallel.sharding import _merge_topk
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(jax.devices()[:2])
    # shard 0: ids (5000, 7); shard 1: ids (100, 3). Scores tie at 9.
    scores = jnp.asarray([9.0, 5.0, 9.0, 8.0])
    ids = jnp.asarray([5000, 7, 100, 3], dtype=jnp.int32)

    fn = jax.jit(
        jax.shard_map(
            lambda s, i: _merge_topk(s, i, 3, "d"),
            mesh=mesh,
            in_specs=(P("d"), P("d")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    v, i = fn(scores, ids)
    assert [float(x) for x in v] == [9.0, 9.0, 8.0]
    assert [int(x) for x in i] == [100, 5000, 3]


def test_sharded_packed_upload_matches(tmp_path, rng, monkeypatch):
    """Mesh-resident tiles shipped packed (device-side unpack per shard)
    must score identically to the raw sharded upload."""
    db = _db(tmp_path, rng)
    query = "".join(AAS[c] for c in rng.integers(0, 20, 30))

    mesh = make_mesh()
    monkeypatch.setenv("CUDASW4_TPU_RESIDENT_PACK", "0")
    raw = SearchEngine(num_top=10, qcap=64, mesh=mesh)
    raw.set_database(db)
    want = raw.scan(query)

    monkeypatch.setenv("CUDASW4_TPU_RESIDENT_PACK", "1")
    packed = SearchEngine(num_top=10, qcap=64, mesh=mesh)
    packed._resident_pack_min = 0
    packed.set_database(db)
    got = packed.scan(query)
    assert got.scores == want.scores


def test_addressable_row_ranges_merge():
    """Per-host packed uploads read only each process's tile rows
    (advisor r03 item: pack holes elsewhere); the range computation must
    merge the per-device slices of the leading axis."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cudasw4_tpu.parallel.sharding import (
        addressable_row_ranges,
        make_mesh,
    )

    mesh = make_mesh()
    ndev = len(mesh.devices.flat)
    sh = NamedSharding(mesh, P(mesh.axis_names[0]))
    # Single process: every row is addressable -> one merged span.
    T = ndev * 4
    assert addressable_row_ranges(sh, (T, 7)) == [(0, T)]
    # Replicated sharding: every device owns all rows.
    rep = NamedSharding(mesh, P())
    assert addressable_row_ranges(rep, (T, 7)) == [(0, T)]
