"""End-to-end benchmark on a synthetic DB with a sprot-like length
distribution (log-normal, median ~300) x the reference 20-query ladder.

Usage: python tools/dbbench.py [num_seqs] [reps]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from benchmarks.make_queries import QUERY_LENGTHS
from cudasw4_tpu.db.format import DBData
from cudasw4_tpu.engine import SearchEngine


def make_sprotlike_db(n, seed=7):
    """Synthetic sprot-like DB.  Set DBBENCH_CACHE=<dir> to save/load the
    generated arrays on disk (mmap) — generating 5M sequences costs ~7
    CPU-minutes of rng, which would otherwise precede every bench run."""
    import os

    cache = os.environ.get("DBBENCH_CACHE")
    path = cache and os.path.join(cache, f"sprotlike_{n}_{seed}.npz")
    if path and os.path.exists(path):
        z = np.load(path, mmap_mode="r")
        return DBData(
            chars=z["chars"], offsets=z["offsets"], lengths=z["lengths"],
            headers=z["headers"], header_offsets=z["hoffs"],
        )
    rng = np.random.default_rng(seed)
    lengths = np.clip(
        rng.lognormal(mean=5.7, sigma=0.55, size=n), 20, 35000
    ).astype(np.int32)
    lengths.sort()
    padded = (lengths + 3) // 4 * 4
    offsets = np.concatenate([[0], np.cumsum(padded, dtype=np.int64)]).astype(np.uint64)
    chars = rng.integers(0, 20, size=int(offsets[-1])).astype(np.int8)
    hdr = b"".join(f"s{i}\n".encode() for i in range(n))
    hoffs = np.cumsum([0] + [len(f"s{i}\n") for i in range(n)]).astype(np.uint64)
    db = DBData(
        chars=chars, offsets=offsets, lengths=lengths,
        headers=np.frombuffer(hdr, dtype=np.uint8), header_offsets=hoffs,
    )
    if path:
        os.makedirs(cache, exist_ok=True)
        np.savez(path, chars=chars, offsets=offsets, lengths=lengths,
                 headers=db.headers, hoffs=hoffs)
    return db


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    db = make_sprotlike_db(n)
    db_chars = float(db.lengths.sum())
    print(f"DB: {n} seqs, {db_chars/1e6:.1f}M residues, max len {db.lengths.max()}")

    engine = SearchEngine(num_top=10, verbose=True)
    engine.set_database(db)
    engine.print_db_length_partitions()

    rng = np.random.default_rng(123)
    aas = "ARNDCQEGHILKMFPSTWYV"
    queries = [
        "".join(aas[c] for c in rng.integers(0, 20, q)) for q in QUERY_LENGTHS
    ]
    cells = sum(QUERY_LENGTHS) * db_chars

    print("warmup/compile...")
    t0 = time.perf_counter()
    for _ in engine.scan_many(queries):
        pass
    print(f"first pass (incl. compile): {time.perf_counter()-t0:.1f}s")
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        for _res in engine.scan_many(queries):
            pass
        dt = time.perf_counter() - t0
        g = cells / 1e9 / dt
        best = max(best, g)
        print(f"pass: {dt*1e3:.0f} ms  {g:.2f} GCUPS")
    print(f"BEST sprot-like total: {best:.2f} GCUPS")


if __name__ == "__main__":
    main()
