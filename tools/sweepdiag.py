"""Per-query GCUPS diagnostic for one peak-sweep config.

Prints each ladder query's engine-level rate (batch passes split
proportionally) on a 1M x L pseudo DB — pins where an end-to-end config
loses throughput vs the kernel-level microbenches (tools/colunroll.py).

Usage: python tools/sweepdiag.py [L] [nseq]
"""

import sys
import time

import numpy as np


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nseq = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

    sys.path.insert(0, "/root/repo")
    from benchmarks.make_queries import QUERY_LENGTHS
    from cudasw4_tpu.db.format import pseudo_to_dbdata
    from cudasw4_tpu.db.pseudo import make_pseudo_db
    from cudasw4_tpu.engine import SearchEngine

    rng = np.random.default_rng(123)
    aas = "ARNDCQEGHILKMFPSTWYV"
    queries = [
        "".join(aas[c] for c in rng.integers(0, 20, qlen))
        for qlen in QUERY_LENGTHS
    ]
    engine = SearchEngine(num_top=0)
    t0 = time.perf_counter()
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(nseq, L)))
    print(f"set_database: {time.perf_counter()-t0:.1f}s", flush=True)
    engine.scan(queries[0])
    engine.scan(queries[-1])
    # one warm scan_many pass to compile every batch plan shape
    for _ in engine.scan_many(queries):
        pass
    t0 = time.perf_counter()
    results = []
    for res in engine.scan_many(queries):
        results.append(res)
    total = time.perf_counter() - t0
    cells = 0.0
    for qlen, res in zip(QUERY_LENGTHS, results):
        print(
            f"q={qlen:5d}: {res.stats.gcups:7.1f} GCUPS "
            f"({res.stats.seconds:6.2f}s)",
            flush=True,
        )
        cells += float(qlen) * nseq * L
    print(f"TOTAL: {cells/1e9/total:.1f} GCUPS ({total:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
