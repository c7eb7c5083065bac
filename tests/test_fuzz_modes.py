"""Cross-mode fuzz: random DBs + queries scored through every engine
entry point (single / batch / streaming / sharded) must agree with the
fully-resident scan, including edge shapes (empty and 1-char queries,
length-1 subjects, duplicate sequences for tie coverage)."""

import jax
import numpy as np

from cudasw4_tpu.db.format import DBData
from cudasw4_tpu.engine import SearchEngine
from cudasw4_tpu.parallel.sharding import make_mesh


def _random_db(rng, n):
    lengths = rng.integers(1, 90, n)
    lengths[rng.integers(0, n, 3)] = 1  # min-length subjects
    lengths = np.sort(lengths).astype(np.int32)
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded)]).astype(np.uint64)
    chars = np.full(int(offsets[-1]), 20, np.int8)
    for i, ln in enumerate(lengths):
        chars[int(offsets[i]): int(offsets[i]) + ln] = rng.integers(0, 20, ln)
    # duplicates -> equal scores exercise the tie rule on every path
    if n >= 6:
        a, b = int(offsets[2]), int(offsets[3])
        span = min(b - a, int(offsets[5] + lengths[5]) - int(offsets[5]))
        chars[int(offsets[5]): int(offsets[5]) + span] = chars[a: a + span]
    return DBData(chars=chars, offsets=offsets, lengths=lengths,
                  headers=np.zeros(0, np.uint8),
                  header_offsets=np.zeros(n + 1, np.uint64))


def test_fuzz_modes_agree(rng):
    for trial in range(3):
        trng = np.random.default_rng(1000 + trial)
        db = _random_db(trng, 150)
        queries = [
            trng.integers(0, 20, int(q)).astype(np.int8)
            for q in (0, 1, 17, 44, 63)
        ]
        base = SearchEngine(num_top=6, qcap=64)
        base.set_database(db)
        want = [(base.scan(q).scores, base.scan(q).reference_ids)
                for q in queries]

        stream = SearchEngine(num_top=6, qcap=64, max_device_bytes=1024,
                              stream_chunk_bytes=2048)
        stream.QB_MAX = 3
        stream.set_database(db)
        assert stream.streaming
        got_b = stream.scan_batch(queries[:3])
        for (ws, wi), r in zip(want[:3], got_b):
            assert r.scores == ws and r.reference_ids == wi, trial

        mesh_eng = SearchEngine(
            num_top=6, qcap=64, mesh=make_mesh(jax.devices()[:2])
        )
        mesh_eng.set_database(db)
        for (ws, wi), q in zip(want, queries):
            r = mesh_eng.scan(q)
            assert r.scores == ws and r.reference_ids == wi, trial

        got_many = list(base.scan_many(queries))
        for (ws, wi), r in zip(want, got_many):
            assert r.scores == ws and r.reference_ids == wi, trial
