"""Benchmark entry point (driver contract: prints ONE JSON line).

Peak-performance protocol modelled on the reference's runpeakbenchmark.sh
(/root/reference/runpeakbenchmark.sh:19-91): pseudo databases of 1M
identical sequences, one per length in {128,256,512,768,1024,2048}, each
scanned by the reference benchmark set's 20 query lengths (144..5478,
see benchmarks/make_queries.py), --top 0 semantics.  Reports the
aggregate GCUPS over the whole sweep (total cells / total seconds;
GCUPS formula /root/reference/src/cudasw4.cuh:826-839) on the real chip.
Per-config lines go to stderr.

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


def _init_devices_watchdog(timeout_s: float = 600.0):
    """Backend init with a hang guard: on a tunneled TPU runtime a dead
    tunnel makes jax.devices() sleep forever (no error).  Emit the JSON
    contract line with an error marker and exit non-zero instead of
    hanging the driver.  First *compiles* are slow but happen after
    device init, so they are not under this timer."""
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            mode = os.environ.get("BENCH_MODE", "sweep")
            name = ("peak_sweep_total_gcups_single_chip"
                    if mode == "sweep" else "peak_total_gcups_single_chip")
            print(json.dumps({
                "metric": name,
                "value": 0.0,
                "unit": "GCUPS",
                "vs_baseline": 0.0,
                "error": f"device init exceeded {timeout_s:.0f}s "
                         "(dead tunnel?)",
            }), flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    import jax

    devs = jax.devices()
    done.set()
    return devs


def _run_config(num, length, queries, reps):
    """Best total GCUPS for one pseudo-DB config (warmed)."""
    from cudasw4_tpu.db.format import pseudo_to_dbdata
    from cudasw4_tpu.db.pseudo import make_pseudo_db
    from cudasw4_tpu.engine import SearchEngine

    engine = SearchEngine(num_top=0)
    engine.set_database(pseudo_to_dbdata(make_pseudo_db(num, length)))
    engine.scan(queries[0])  # compile + warm up
    engine.scan(queries[-1])
    best = 0.0
    best_secs = None
    for _ in range(reps):
        engine.total_timer_start()
        for _res in engine.scan_many(queries):
            pass
        total = engine.total_timer_stop()
        if total.gcups > best:
            best, best_secs = total.gcups, total.seconds
    # total_timer_start resets the cell counter, so after the loop it
    # holds exactly one protocol pass worth of cells.
    cells = engine._total_cells
    return best, best_secs, cells


def main() -> None:
    num = int(os.environ.get("BENCH_NUM_SEQS", 500_000))
    length = int(os.environ.get("BENCH_SEQ_LEN", 256))
    # The default mode is the REFERENCE protocol: the full 1M x
    # {128..2048} pseudo-DB length sweep (runpeakbenchmark.sh:19-91),
    # reported as the aggregate GCUPS (sum cells / sum seconds) — the
    # honest headline, not the friendliest config.  BENCH_MODE=peak
    # keeps the old single-config metric for round-over-round A/Bs.
    mode = os.environ.get("BENCH_MODE", "sweep")
    # Best-of-2 in every mode: round-3's single-rep sweep rows swung -8%
    # on tunnel-day variance (L=256 measured 292.7 there vs 314.8
    # best-of-2 on a quiet chip, docs/PERFORMANCE.md variance note);
    # the ~12 extra chip-minutes buy round-over-round comparability.
    reps = int(os.environ.get("BENCH_REPS", 2))

    import numpy as np

    from benchmarks.make_queries import QUERY_LENGTHS

    _init_devices_watchdog(
        float(os.environ.get("BENCH_INIT_TIMEOUT", 600))
    )
    rng = np.random.default_rng(123)
    aas = "ARNDCQEGHILKMFPSTWYV"
    queries = [
        "".join(aas[c] for c in rng.integers(0, 20, qlen))
        for qlen in QUERY_LENGTHS
    ]

    if mode == "sweep":
        num = int(os.environ.get("BENCH_NUM_SEQS", 1_000_000))
        total_cells = 0.0
        total_secs = 0.0
        for length in (128, 256, 512, 768, 1024, 2048):
            gcups, secs, cells = _run_config(num, length, queries, reps)
            total_cells += cells
            total_secs += secs
            print(
                f"# L={length}: {gcups:.2f} GCUPS ({secs:.1f}s)",
                file=sys.stderr,
            )
        best = total_cells / 1e9 / total_secs
        metric = "peak_sweep_total_gcups_single_chip"
    else:
        best, _, _ = _run_config(num, length, queries, reps)
        metric = "peak_total_gcups_single_chip"

    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(best, 2),
                "unit": "GCUPS",
                "vs_baseline": round(best / NOMINAL_GPU_PEAK_GCUPS, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
