"""Streaming-mode A/B bench: 5-bit transfer pack x prefetch thread.

Measures the two streaming-path levers on the real chip (exclusive
access required — never run two TPU jobs at once):

  CUDASW4_TPU_STREAM_PACK      (ops/pack5.py, 1.5x fewer streamed bytes)
  CUDASW4_TPU_STREAM_PREFETCH  (engine._stream_chunks_prefetched)

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/streampackbench.py [small|mixed]

small:  500k x 256 pseudo DB, 16 x len-370 queries (fast, ~2 min/config)
mixed:  5M-seq sprot-like DB, 14-query set incl. four 1.5k-3k aa
        (the docs/PERFORMANCE.md round-2 streaming protocol, ~10+ min/config)
ladder: 2M x 256 pseudo DB, the reference 20-query ladder (144..5478) —
        A/Bs CUDASW4_TPU_QB_STREAM 16 vs 20 (one stream vs 16+4) with
        pack+prefetch on.
partial: 5M-seq sprot-like DB (~2.25 GiB packed) with a 1.5 GiB budget —
        A/Bs CUDASW4_TPU_STREAM_RESIDENT 0 vs 1 (all-streamed vs ~60%
        pinned resident) with pack+prefetch on.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))
import numpy as np  # noqa: E402

MODE = sys.argv[1] if len(sys.argv) > 1 else "small"
REPS = int(os.environ.get("BENCH_REPS", "3"))
#: Optional pack-cache prefix: pre-building the tile store + pack5
#: sidecar (e.g. on CPU while the chip is busy) makes the TPU run's
#: set_database seconds instead of minutes.
CACHE = os.environ.get("STREAMBENCH_CACHE")
if CACHE:
    # Qualify by DB identity so modes don't thrash each other's store
    # (mixed and partial share the same 5M sprot-like DB).
    CACHE = CACHE + "_" + (
        "sprot5m" if MODE in ("mixed", "partial") else MODE
    )

rng = np.random.default_rng(123)
if MODE == "ladder":
    from cudasw4_tpu.db.format import pseudo_to_dbdata
    from cudasw4_tpu.db.pseudo import make_pseudo_db
    from cudasw4_tpu.engine import SearchEngine

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "benchmarks"))
    from make_queries import QUERY_LENGTHS

    db = pseudo_to_dbdata(make_pseudo_db(2_000_000, 256))
    db_chars = float(np.asarray(db.lengths, np.int64).sum())
    queries = [rng.integers(0, 20, q).astype(np.int8) for q in QUERY_LENGTHS]
    cells = sum(QUERY_LENGTHS) * db_chars
    print(f"ladder: DB {db_chars/1e9:.2f}G residues, 20 queries, "
          f"{cells/1e12:.1f}T cells/pass", flush=True)
    os.environ["CUDASW4_TPU_STREAM_PACK"] = "1"
    os.environ["CUDASW4_TPU_STREAM_PREFETCH"] = "1"
    for qb in (16, 20):
        eng = SearchEngine(num_top=10, max_device_bytes=1)
        eng.QB_MAX = 16
        eng.QB_STREAM = qb
        eng.set_database(db, pack_cache=CACHE)
        assert eng.streaming
        list(eng.scan_many([q[:64] for q in queries[:2]]))  # warm
        best = 0.0
        for _ in range(REPS):
            t0 = time.time()
            list(eng.scan_many(queries))
            dt = time.time() - t0
            g = cells / dt / 1e9
            best = max(best, g)
            print(f"  QB_STREAM={qb}: {dt:.2f}s = {g:.1f} GCUPS", flush=True)
        print(f"QB_STREAM={qb} BEST {best:.1f} GCUPS", flush=True)
        del eng
    sys.exit(0)

if MODE == "partial":
    from cudasw4_tpu.engine import SearchEngine
    from dbbench import make_sprotlike_db

    db = make_sprotlike_db(5_000_000)
    db_chars = float(np.asarray(db.lengths, np.int64).sum())
    qlens = [144, 256, 370, 492, 657, 780, 1024, 1500]
    queries = [rng.integers(0, 20, q).astype(np.int8) for q in qlens]
    cells = sum(qlens) * db_chars
    os.environ["CUDASW4_TPU_STREAM_PACK"] = "1"
    os.environ["CUDASW4_TPU_STREAM_PREFETCH"] = "1"
    for flag in ("0", "1"):
        os.environ["CUDASW4_TPU_STREAM_RESIDENT"] = flag
        # 1.5 GiB budget, 64 MiB chunks (headroom 256 MiB) -> ~55% of
        # the ~2.25 GiB packed DB pins resident when flag=1.
        eng = SearchEngine(num_top=10, max_device_bytes=3 << 29,
                           stream_chunk_bytes=64 << 20)
        t0 = time.time()
        eng.set_database(db, pack_cache=CACHE)
        assert eng.streaming
        nres = len(getattr(eng, "_resident_chunks", []))
        print(f"resident={flag} set_db {time.time()-t0:.1f}s "
              f"({nres} chunks pinned)", flush=True)
        eng.scan_batch([q[:64] for q in queries[:2]])  # warm
        best = 0.0
        for _ in range(REPS):
            t0 = time.time()
            eng.scan_batch(queries)
            dt = time.time() - t0
            g = cells / dt / 1e9
            best = max(best, g)
            print(f"  resident={flag}: {dt:.2f}s = {g:.1f} GCUPS",
                  flush=True)
        print(f"resident={flag} BEST {best:.1f} GCUPS", flush=True)
        del eng
    sys.exit(0)

if MODE == "small":
    from cudasw4_tpu.db.format import pseudo_to_dbdata
    from cudasw4_tpu.db.pseudo import make_pseudo_db

    db = pseudo_to_dbdata(make_pseudo_db(500_000, 256))
    qlens = [370] * 16
    budget = 1
else:
    from dbbench import make_sprotlike_db

    db = make_sprotlike_db(5_000_000)
    qlens = [144, 192, 256, 306, 370, 492, 564, 657, 780, 1024,
             1500, 2000, 2500, 3000]
    # Must be below the packed tile bytes (~2.25 GiB at this scale,
    # 1.39x padding) or the engine stays resident and the assert fires.
    budget = 1 << 30

db_chars = float(np.asarray(db.lengths, np.int64).sum())
queries = [rng.integers(0, 20, q).astype(np.int8) for q in qlens]
cells = sum(qlens) * db_chars
print(f"DB {db_chars/1e9:.2f}G residues, {len(qlens)} queries, "
      f"{cells/1e12:.1f}T cells/pass", flush=True)

from cudasw4_tpu.engine import SearchEngine  # noqa: E402

results = {}
for pack in ("0", "1", "2"):  # off / b32 (5-bit) / b21 (base-21)
    for pf in ("0", "1"):
        os.environ["CUDASW4_TPU_STREAM_PACK"] = pack
        os.environ["CUDASW4_TPU_STREAM_PREFETCH"] = pf
        eng = SearchEngine(num_top=10, max_device_bytes=budget)
        t0 = time.time()
        eng.set_database(db, pack_cache=CACHE)
        assert eng.streaming
        print(f"pack={pack} prefetch={pf} set_db {time.time()-t0:.1f}s",
              flush=True)
        eng.scan_batch([q[:64] for q in queries[:2]])  # warm/compile
        best = 0.0
        for _ in range(REPS):
            t0 = time.time()
            eng.scan_batch(queries)
            dt = time.time() - t0
            g = cells / dt / 1e9
            best = max(best, g)
            print(f"  pack={pack} pf={pf}: {dt:.2f}s = {g:.1f} GCUPS",
                  flush=True)
        results[(pack, pf)] = best
        print(f"pack={pack} pf={pf} BEST {best:.1f} GCUPS", flush=True)
        del eng

print("\nsummary (best GCUPS):")
for (pack, pf), g in sorted(results.items()):
    print(f"  pack={pack} prefetch={pf}: {g:.1f}")
