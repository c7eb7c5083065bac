"""Benchmark entry point (driver contract: prints ONE JSON line).

Peak-performance protocol modelled on the reference's runpeakbenchmark.sh
(pseudo DB of identical sequences, --top 0): scores a query against a
pseudo database on the real chip and reports sustained GCUPS
(queryLength x dbResidues / 1e9 / seconds, the reference's headline metric,
/root/reference/src/cudasw4.cuh:2264-2271).

vs_baseline normalises against a nominal 1000 GCUPS — the order of
magnitude of the published CUDASW++ 4.0 single-GPU peak on A100-class
hardware (Schmidt et al., BMC Bioinformatics 25:342; no numbers are
committed in the reference repo).
"""

from __future__ import annotations

import json
import os
import sys
import time

NOMINAL_GPU_PEAK_GCUPS = 1000.0


def main() -> None:
    num = int(os.environ.get("BENCH_NUM_SEQS", 200_000))
    length = int(os.environ.get("BENCH_SEQ_LEN", 256))
    qlen = int(os.environ.get("BENCH_QUERY_LEN", 512))
    reps = int(os.environ.get("BENCH_REPS", 3))

    import numpy as np

    from cudasw4_tpu.db.format import pseudo_to_dbdata
    from cudasw4_tpu.db.pseudo import make_pseudo_db
    from cudasw4_tpu.engine import SearchEngine

    engine = SearchEngine(num_top=0)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(num, length)))

    rng = np.random.default_rng(123)
    aas = "ARNDCQEGHILKMFPSTWYV"
    query = "".join(aas[c] for c in rng.integers(0, 20, qlen))

    engine.scan(query)  # compile + warm up
    best = None
    for _ in range(reps):
        r = engine.scan(query)
        if best is None or r.stats.gcups > best:
            best = r.stats.gcups

    print(
        json.dumps(
            {
                "metric": "peak_gcups_single_chip",
                "value": round(best, 2),
                "unit": "GCUPS",
                "vs_baseline": round(best / NOMINAL_GPU_PEAK_GCUPS, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
