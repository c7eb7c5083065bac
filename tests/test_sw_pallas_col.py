"""Column-chunked Pallas kernel correctness (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cudasw4_tpu import make_scoring_config
from cudasw4_tpu.ops.oracle import sw_score_scalar
from cudasw4_tpu.ops import sw_pallas_col
from cudasw4_tpu.ops.sw_pallas_cell import G, NSL

ON_TPU = jax.devices()[0].platform == "tpu"


def _tiles_from(subjects, L, T):
    tiles = np.full((T, L, G, NSL), 20, dtype=np.int8)
    for k, s in enumerate(subjects):
        t, r = divmod(k, G * NSL)
        g, lane = divmod(r, NSL)
        tiles[t, : len(s), g, lane] = s
    return jnp.asarray(tiles)


def _oracle(query, subjects, cfg):
    return [
        sw_score_scalar(query, s, cfg.matrix, cfg.gop, cfg.gex)
        for s in subjects
    ]


def test_col_kernel_single_chunk_matches_oracle(rng, monkeypatch):
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    L = 48  # 3 subject chunks
    n = 30
    subjects = [rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)]
    query = rng.integers(0, 20, size=33)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_col_any_query(
        _tiles_from(subjects, L, 1), query, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU,
    )
    got = np.asarray(got).reshape(-1)[:n]
    assert [int(v) for v in got] == _oracle(query, subjects, cfg)


def test_col_kernel_query_chunked_matches_oracle(rng, monkeypatch):
    """Queries longer than NQC: boundary H/F carry between calls."""
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    monkeypatch.setattr(sw_pallas_col, "NQC", 24)
    cfg = make_scoring_config("blosum62")
    L = 32
    n = 12
    subjects = [rng.integers(0, 20, size=int(rng.integers(8, L))) for _ in range(n)]
    query = rng.integers(0, 20, size=70)  # 3 chunks of 24 (last partial)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_col_any_query(
        _tiles_from(subjects, L, 1), query, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU,
    )
    got = np.asarray(got).reshape(-1)[:n]
    assert [int(v) for v in got] == _oracle(query, subjects, cfg)


def test_col_kernel_multi_tile(rng, monkeypatch):
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    L = 16
    n = G * NSL + 5
    subjects = [rng.integers(0, 20, size=int(rng.integers(3, L))) for _ in range(n)]
    query = rng.integers(0, 20, size=12)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_col_any_query(
        _tiles_from(subjects, L, 2), query, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU,
    )
    got = np.asarray(got).reshape(-1)[:n]
    assert [int(v) for v in got] == _oracle(query, subjects, cfg)


def test_col_kernel_gap_regression(monkeypatch):
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    subject = np.array([7, 18, 2, 2, 8, 11, 12, 17, 7, 18, 14, 11, 4, 14, 2,
                        1, 14, 4, 13, 11, 8, 9, 2, 6])
    query = np.array([2, 8, 11, 8, 0, 11, 15, 13, 12, 18, 2, 11, 13, 18, 19,
                      8, 0, 15, 17, 19, 14, 1, 19, 14, 19])
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_col_any_query(
        _tiles_from([subject], 32, 1), query, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU,
    )
    assert int(np.asarray(got).reshape(-1)[0]) == 20


def test_col_flat_kernel_matches_oracle(rng, monkeypatch):
    """Flat-pool slots (mixed lengths, shared state pool) share one tile
    stream; per-slot scores are exact."""
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    L = 48  # 3 subject chunks
    n = 25
    subjects = [
        rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)
    ]
    S, W, RTOT = 4, 24, 128
    queries = [rng.integers(0, 20, size=int(ln)) for ln in (7, 24, 13, 20)]
    from cudasw4_tpu.constants import UNKNOWN

    quant = 32  # test-sized FLAT_QUANT so 4 slots fit a 128-row pool
    qarr = np.full((S, W), UNKNOWN, np.int32)
    nqps = np.zeros(S, np.int32)
    offs = []
    off = 0
    # Row counts must be multiples of the kernel's (tunable) unroll —
    # the same granule the engine pads with (DEFAULT_UNROLL).
    cu = sw_pallas_col.DEFAULT_UNROLL
    for s, q in enumerate(queries):
        qarr[s, : len(q)] = q
        nqps[s] = max(cu, -(-len(q) // cu) * cu)
        offs.append(off)
        off += -(-int(nqps[s]) // quant) * quant
    params = jnp.asarray(np.concatenate(
        [np.array([0, cfg.gop, cfg.gex, 0], np.int32), nqps]
    ))
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_pallas_col_flat(
        _tiles_from(subjects, L, 2), jnp.asarray(qarr), mat, params,
        offs=tuple(offs), rtot=RTOT, interpret=not ON_TPU,
    )
    got = np.asarray(got)
    for s, q in enumerate(queries):
        assert [int(v) for v in got[s].reshape(-1)[:n]] == _oracle(
            q, subjects, cfg
        ), f"slot {s}"


def test_col_flat_plan_bin_packing():
    """First-fit-decreasing: mixed ladder row counts pack into few
    passes, offsets are non-overlapping, limit drops tail slots, and
    over-pool queries raise."""
    import pytest

    from cudasw4_tpu.ops import col_flat_plan

    quant = 128  # sw_pallas_col.FLAT_QUANT
    pads = [144, 192, 224, 376, 464, 568, 660, 732, 852, 1000]
    plan = col_flat_plan(pads, rtot=3072)
    assert len(plan) == 2  # ~5.8k reserved rows -> 2 passes of <= 3072
    seen = set()
    for slots in plan:
        rows = 0
        for slot, off in sorted(slots, key=lambda t: t[1]):
            assert off == rows  # dense, non-overlapping reservations
            rows += -(-pads[slot] // quant) * quant
            seen.add(slot)
        assert rows <= 3072
    assert seen == set(range(len(pads)))
    assert col_flat_plan(pads, limit=3, rtot=3072) == (
        ((2, 0), (1, 256), (0, 512)),
    )
    with pytest.raises(ValueError):
        col_flat_plan([4000], rtot=3072)


def test_col_kernel_tile_group_bounded_temp(rng, monkeypatch):
    """Chunked-query scans bound the H/F carry temp by processing tiles
    in groups (the reference's maxTempBytes subject batching analog,
    cudasw4.cuh:1928-1947): a 1-tile-per-group run is still exact."""
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    monkeypatch.setattr(sw_pallas_col, "NQC", 24)
    cfg = make_scoring_config("blosum62")
    L = 32
    n = G * NSL + 9  # 2 tiles
    subjects = [
        rng.integers(0, 20, size=int(rng.integers(8, L))) for _ in range(n)
    ]
    query = rng.integers(0, 20, size=60)  # 3 query chunks of 24
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_col_any_query(
        _tiles_from(subjects, L, 2), query, mat, cfg.gop, cfg.gex,
        interpret=not ON_TPU, temp_bytes=1,  # force 1-tile groups
    )
    got = np.asarray(got).reshape(-1)[:n]
    assert [int(v) for v in got] == _oracle(query, subjects, cfg)


def _fused_params_queries(rng, queries, S, W, cfg):
    from cudasw4_tpu.constants import UNKNOWN

    cu = sw_pallas_col.DEFAULT_UNROLL
    qarr = np.full((S, W), UNKNOWN, np.int32)
    nqps = np.zeros(S, np.int32)
    for s, q in enumerate(queries):
        qarr[s, : len(q)] = q
        nqps[s] = max(cu, -(-len(q) // cu) * cu)
    params = jnp.asarray(np.concatenate(
        [np.array([0, cfg.gop, cfg.gex, 0], np.int32), nqps]
    ))
    return jnp.asarray(qarr), params


def test_col_flat_fused_kernel_matches_oracle(rng, monkeypatch):
    """Masked-fused flat pool (round 5): gapless concatenated rows with
    per-step boundary masks give the same exact per-slot scores as the
    slot-unrolled kernel and the oracle (mixed lengths, multi tile,
    multi subject chunk)."""
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    L = 48  # 3 subject chunks
    n = 25
    subjects = [
        rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)
    ]
    S, W, RTOT = 4, 24, 128
    queries = [rng.integers(0, 20, size=int(ln)) for ln in (7, 24, 13, 20)]
    qarr, params = _fused_params_queries(rng, queries, S, W, cfg)
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    got = sw_pallas_col.score_bucket_pallas_col_flat_fused(
        _tiles_from(subjects, L, 2), qarr, mat, params,
        rtot=RTOT, interpret=not ON_TPU,
    )
    got = np.asarray(got)
    for s, q in enumerate(queries):
        assert [int(v) for v in got[s].reshape(-1)[:n]] == _oracle(
            q, subjects, cfg
        ), f"slot {s}"


def test_col_flat_fused_pool_saturated(rng, monkeypatch):
    """Slots whose rows exactly fill the pool (sum nqp == rtot) and a
    single-slot pass both stay exact in the fused variant."""
    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    L = 32
    n = 10
    subjects = [
        rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)
    ]
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    cu = sw_pallas_col.DEFAULT_UNROLL
    # 3 slots of exactly rtot/3 rows each (all multiples of unroll).
    RTOT = 6 * cu
    queries = [rng.integers(0, 20, size=2 * cu) for _ in range(3)]
    qarr, params = _fused_params_queries(rng, queries, 3, 2 * cu, cfg)
    got = np.asarray(sw_pallas_col.score_bucket_pallas_col_flat_fused(
        _tiles_from(subjects, L, 1), qarr, mat, params,
        rtot=RTOT, interpret=not ON_TPU,
    ))
    for s, q in enumerate(queries):
        assert [int(v) for v in got[s].reshape(-1)[:n]] == _oracle(
            q, subjects, cfg
        ), f"slot {s}"
    # S=1 degenerate case.
    qarr1, params1 = _fused_params_queries(rng, queries[:1], 1, 2 * cu, cfg)
    got1 = np.asarray(sw_pallas_col.score_bucket_pallas_col_flat_fused(
        _tiles_from(subjects, L, 1), qarr1, mat, params1,
        rtot=RTOT, interpret=not ON_TPU,
    ))
    assert [int(v) for v in got1[0].reshape(-1)[:n]] == _oracle(
        queries[0], subjects, cfg
    )


def test_col_flat_fused_int16_saturation(rng, monkeypatch):
    """exact=False keeps the int16 saturation semantics in the fused
    variant: a high-scoring slot clamps at SAT while other slots'
    scores stay exact."""
    from cudasw4_tpu.ops.sw_pallas_cell import SAT

    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    cfg = make_scoring_config("blosum62")
    L = 6416  # long identical subject to overflow int16 (needs > SAT)
    # W (11) * L/16 ... build one long self-match subject
    subj = rng.integers(0, 20, size=L - 16)
    subjects = [subj]
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    cu = sw_pallas_col.DEFAULT_UNROLL
    big = subj[: 6 * cu * 64].reshape(-1)[: 6 * cu]  # prefix of the subject
    small = rng.integers(0, 20, size=cu)
    W = 6 * cu
    queries = [big, small, small]
    qarr, params = _fused_params_queries(rng, queries, 3, W, cfg)
    tiles = _tiles_from(subjects, L, 1)
    exact = np.asarray(sw_pallas_col.score_bucket_pallas_col_flat_fused(
        tiles, qarr, mat, params, rtot=8 * cu, interpret=not ON_TPU,
        exact=True,
    ))
    sat16 = np.asarray(sw_pallas_col.score_bucket_pallas_col_flat_fused(
        tiles, qarr, mat, params, rtot=8 * cu, interpret=not ON_TPU,
        exact=False,
    ))
    # the small slots agree exactly; any saturated value flags >= SAT
    assert np.array_equal(exact[1], sat16[1])
    assert np.array_equal(exact[2], sat16[2])
    w = exact[0].reshape(-1)[0]
    if w >= SAT:
        assert sat16[0].reshape(-1)[0] >= SAT
    else:
        assert np.array_equal(exact[0], sat16[0])


def test_batch_col_scores_dispatches_fused(rng, monkeypatch):
    """batch_col_scores routes passes with >= COL_FUSE_MIN_S slots to the
    fused kernel and smaller passes to the slot-unrolled kernel."""
    from cudasw4_tpu import ops as ops_mod
    from cudasw4_tpu.ops import batch_col_scores, col_flat_plan

    monkeypatch.setattr(sw_pallas_col, "LC", 16)
    monkeypatch.setattr(sw_pallas_col, "COL_FUSE_MIN_S", 3)
    calls = []
    real_fused = sw_pallas_col.score_bucket_pallas_col_flat_fused
    real_flat = sw_pallas_col.score_bucket_pallas_col_flat

    def spy_fused(*a, **k):
        calls.append(("fused", a[1].shape[0]))
        return real_fused(*a, **k)

    def spy_flat(*a, **k):
        calls.append(("flat", a[1].shape[0]))
        return real_flat(*a, **k)

    monkeypatch.setattr(
        sw_pallas_col, "score_bucket_pallas_col_flat_fused", spy_fused
    )
    monkeypatch.setattr(
        sw_pallas_col, "score_bucket_pallas_col_flat", spy_flat
    )

    cfg = make_scoring_config("blosum62")
    L = 32
    n = 8
    subjects = [
        rng.integers(0, 20, size=int(rng.integers(5, L))) for _ in range(n)
    ]
    mat = jnp.asarray(cfg.matrix.astype(np.int32).reshape(-1))
    cu = sw_pallas_col.DEFAULT_UNROLL
    QB = 4
    W = 2 * cu
    queries = [rng.integers(0, 20, size=int(rng.integers(4, W)))
               for _ in range(QB)]
    from cudasw4_tpu.constants import UNKNOWN

    qarr = np.full((QB, W), UNKNOWN, np.int32)
    nqs = np.zeros(QB, np.int32)
    pads = np.zeros(QB, np.int32)
    for i, q in enumerate(queries):
        qarr[i, : len(q)] = q
        nqs[i] = len(q)
        pads[i] = max(cu, -(-len(q) // cu) * cu)
    params = jnp.asarray(np.concatenate(
        [np.array([0, cfg.gop, cfg.gex, 0], np.int32), nqs, pads]
    ))
    tiles = _tiles_from(subjects, L, 1)

    # 3-slot pass -> fused; plan with rtot sized so all 4 fit one pass
    rtot = 1024
    plan = col_flat_plan(pads, rtot=rtot, smax=4)
    got = {}
    for s_part, slots in batch_col_scores(
        tiles, jnp.asarray(qarr), mat, params, QB, plan,
        interpret=not ON_TPU, rtot=rtot,
    ):
        for si, slot in enumerate(slots):
            got[slot] = np.asarray(s_part[si]).reshape(-1)
    assert any(kind == "fused" and s >= 3 for kind, s in calls), calls
    for i, q in enumerate(queries):
        assert [int(v) for v in got[i][:n]] == _oracle(q, subjects, cfg)

    # A 2-slot plan stays on the slot-unrolled kernel.
    calls.clear()
    plan2 = col_flat_plan(pads[:2], rtot=rtot, smax=2)
    for s_part, slots in batch_col_scores(
        tiles, jnp.asarray(qarr[:2]), mat,
        jnp.asarray(np.concatenate([
            np.array([0, cfg.gop, cfg.gex, 0], np.int32),
            nqs[:2], pads[:2],
        ])), 2, plan2, interpret=not ON_TPU, rtot=rtot,
    ):
        pass
    assert all(kind == "flat" for kind, s in calls), calls
