"""int16-state saturation + exact re-scan escalation.

The default Pallas kernels store DP state as saturating int16 (the
reference's dpx_s16 fast path, /root/reference/src/kernels.cuh:5); any
score >= SAT flags 16-bit overflow and the engine re-scans with int32
state.  These tests shrink SAT so the escalation triggers on tiny inputs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops import sw_pallas_cell, sw_pallas_col
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.ops.sw_pallas import prepare_query

ON_TPU = jax.devices()[0].platform == "tpu"


def test_cell_kernel_saturates_then_exact(rng, monkeypatch):
    monkeypatch.setattr(sw_pallas_cell, "SAT", 30)
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()
    cfg = make_scoring_config("blosum62")
    L = 32
    # identical query/subject -> true score far above SAT=30
    seq = rng.integers(0, 20, size=24)
    tiles = np.full((1, L, 32, 128), 20, dtype=np.int8)
    tiles[0, : len(seq), 0, 0] = seq
    qpad, nq = prepare_query(seq, qcap=128)
    params = np.array([nq, cfg.gop, cfg.gex, 0], dtype=np.int32)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    want = sw_score_scalar(seq, seq, cfg.matrix, cfg.gop, cfg.gex)
    assert want > 30

    fast = sw_pallas_cell.score_bucket_pallas_cell(
        jnp.asarray(tiles), jnp.asarray(qpad), mat, jnp.asarray(params),
        interpret=not ON_TPU,
    )
    flagged = float(np.asarray(fast).reshape(-1)[0])
    assert flagged >= 30  # overflow is flagged, never silently wrong

    exact = sw_pallas_cell.score_bucket_pallas_cell(
        jnp.asarray(tiles), jnp.asarray(qpad), mat, jnp.asarray(params),
        interpret=not ON_TPU, exact=True,
    )
    assert int(np.asarray(exact).reshape(-1)[0]) == want
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()


def test_engine_rescores_only_saturated_tiles(rng, monkeypatch):
    """One saturating subject triggers exact re-scoring of ONLY its tile,
    not the whole DB (VERDICT round-2 item 3; the reference re-launches
    32-bit kernels over just the recorded overflow ids,
    /root/reference/src/float_kernels.cuh:1189-1260)."""
    from cudasw4_tpu import engine as eng_mod
    from cudasw4_tpu import ops
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.db.format import pseudo_to_dbdata
    from cudasw4_tpu.engine import SearchEngine

    monkeypatch.setattr(ops, "INTERPRET", True)
    monkeypatch.setattr(sw_pallas_cell, "SAT", 30)
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 99.0)  # force cell layout
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()

    # 4199 all-G subjects (score 0 vs an all-W query) + one all-W subject
    # (score 24*11=264 >= SAT): two 4096-lane tiles, exactly one of which
    # saturates.
    from cudasw4_tpu.constants import encode
    from cudasw4_tpu.db.format import DBData

    seqs = [encode("G" * 16) for _ in range(4199)] + [encode("W" * 24)]
    padlens = [-(-len(s) // 4) * 4 for s in seqs]
    chars = np.full(sum(padlens), 20, np.int8)
    offsets = np.zeros(len(seqs) + 1, np.uint64)
    pos = 0
    for i, s in enumerate(seqs):
        chars[pos : pos + len(s)] = s
        offsets[i] = pos
        pos += padlens[i]
    offsets[-1] = pos
    db = DBData(
        chars=chars,
        offsets=offsets,
        lengths=np.array([len(s) for s in seqs], np.int32),
        headers=np.zeros(0, np.uint8),
        header_offsets=np.zeros(len(seqs) + 1, np.uint64),
    )

    calls = []
    real = eng_mod.score_bucket

    def spy(tiles, *a, **kw):
        calls.append((int(tiles.shape[0]), kw.get("exact")))
        return real(tiles, *a, **kw)

    monkeypatch.setattr(eng_mod, "score_bucket", spy)

    engine = SearchEngine(num_top=5, qcap=64, backend="pallas")
    engine.state16 = True
    engine.set_database(db)
    b = engine.packed.buckets[0]
    assert b.kernel == "cell" and b.num_tiles == 2

    calls.clear()
    res = engine.scan("W" * 24)
    # Exactly one exact re-score over exactly one tile (the fast pass
    # traces through the spy too — with exact=False over both tiles).
    assert [(n, ex) for n, ex in calls if ex] == [(1, True)], calls
    assert res.stats.num_overflows == 1
    assert res.scores[0] == 24 * 11  # exact, not the SAT clamp
    assert res.reference_ids[0] == 4199
    assert res.scores[1:] == [0, 0, 0, 0]
    assert res.reference_ids[1:] == [0, 1, 2, 3]

    # A query that saturates nothing must not trigger any re-score
    # (all-C: C/G = -3 and C/W = -2, so every subject scores 0).
    calls.clear()
    res2 = engine.scan("C" * 8)
    assert all(not ex for _n, ex in calls)
    assert res2.stats.num_overflows == 0

    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()


def _tiny_two_tile_db():
    """4199 all-G subjects (score 0 vs an all-W query) + one all-W subject
    (score 24*11=264 >= the shrunken SAT): two 4096-lane tiles, exactly
    one of which saturates."""
    from cudasw4_tpu.constants import encode
    from cudasw4_tpu.db.format import DBData

    seqs = [encode("G" * 16) for _ in range(4199)] + [encode("W" * 24)]
    padlens = [-(-len(s) // 4) * 4 for s in seqs]
    chars = np.full(sum(padlens), 20, np.int8)
    offsets = np.zeros(len(seqs) + 1, np.uint64)
    pos = 0
    for i, s in enumerate(seqs):
        chars[pos : pos + len(s)] = s
        offsets[i] = pos
        pos += padlens[i]
    offsets[-1] = pos
    return DBData(
        chars=chars,
        offsets=offsets,
        lengths=np.array([len(s) for s in seqs], np.int32),
        headers=np.zeros(0, np.uint8),
        header_offsets=np.zeros(len(seqs) + 1, np.uint64),
    )


def test_mesh_rescores_only_saturated_tiles(rng, monkeypatch):
    """Mesh twin of the test above (VERDICT round-3 item 3): on a multi-
    device mesh the int16 fast pass returns replicated per-tile maxes and
    overflow re-scores ONLY the saturated tiles — one tile per shard
    through the fixed-capacity shard_map overflow pass — instead of the
    round-3 full exact re-scan (engine._rescore_overflow_mesh;
    /root/reference/src/cudasw4.cuh:2117-2186)."""
    from cudasw4_tpu import ops
    from cudasw4_tpu.db import packing
    from cudasw4_tpu.engine import SearchEngine
    from cudasw4_tpu.parallel import sharding as sh_mod
    from cudasw4_tpu.parallel.sharding import make_mesh

    monkeypatch.setattr(ops, "INTERPRET", True)
    monkeypatch.setattr(sw_pallas_cell, "SAT", 30)
    monkeypatch.setattr(packing, "CELL_SPEEDUP", 99.0)  # force cell layout
    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()

    calls = []
    real = sh_mod.score_bucket

    def spy(tiles, *a, **kw):
        calls.append((int(tiles.shape[0]), kw.get("exact")))
        return real(tiles, *a, **kw)

    monkeypatch.setattr(sh_mod, "score_bucket", spy)

    mesh = make_mesh()
    ndev = len(mesh.devices.flat)
    engine = SearchEngine(num_top=5, qcap=64, backend="pallas", mesh=mesh)
    engine.state16 = True
    engine.set_database(_tiny_two_tile_db())
    b = engine.packed.buckets[0]
    assert b.kernel == "cell"
    assert b.tiles.shape[0] == ndev  # 2 tiles padded up to the mesh

    calls.clear()
    res = engine.scan("W" * 24)
    # The fast pass traces once per shard-mapped program with the local
    # tile count (T/ndev = 1, exact False); the overflow pass must gather
    # exactly ONE tile per shard (cap 1), exact=True — not T/ndev == all.
    exact_calls = [(n, ex) for n, ex in calls if ex]
    assert exact_calls == [(1, True)], calls
    assert res.stats.num_overflows >= 1
    assert res.scores[0] == 24 * 11  # exact, not the SAT clamp
    assert res.reference_ids[0] == 4199
    assert res.scores[1:] == [0, 0, 0, 0]
    assert res.reference_ids[1:] == [0, 1, 2, 3]

    # No saturation -> no exact pass at all.
    calls.clear()
    res2 = engine.scan("C" * 8)
    assert all(not ex for _n, ex in calls)
    assert res2.stats.num_overflows == 0

    # Overflow buffer exhausted -> full exact re-scan fallback (the
    # reference's behavior when d_overflow_positions would overflow):
    # no new overflow-rescore program is built, results stay exact.
    engine.OVF_TILE_CAP = 0
    n_ovf_programs = len(engine._ovf_fns)
    res3 = engine.scan("W" * 24)
    assert res3.scores[0] == 24 * 11
    assert res3.reference_ids[0] == 4199
    assert len(engine._ovf_fns) == n_ovf_programs

    sw_pallas_cell.score_bucket_pallas_cell._clear_cache()


def test_col_kernel_saturates_then_exact(rng, monkeypatch):
    monkeypatch.setattr(sw_pallas_cell, "SAT", 30)
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    sw_pallas_col.score_bucket_pallas_col._clear_cache()
    cfg = make_scoring_config("blosum62")
    L = 32
    seq = rng.integers(0, 20, size=28)
    tiles = np.full((1, L, 32, 128), 20, dtype=np.int8)
    tiles[0, : len(seq), 0, 0] = seq
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    want = sw_score_scalar(seq, seq, cfg.matrix, cfg.gop, cfg.gex)
    assert want > 30

    fast = sw_pallas_col.score_bucket_col_any_query(
        jnp.asarray(tiles), seq, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU,
    )
    assert float(np.asarray(fast).reshape(-1)[0]) >= 30

    exact = sw_pallas_col.score_bucket_col_any_query(
        jnp.asarray(tiles), seq, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU, exact=True,
    )
    assert int(np.asarray(exact).reshape(-1)[0]) == want
    sw_pallas_col.score_bucket_pallas_col._clear_cache()
