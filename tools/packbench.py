"""Host-side packing throughput benchmark (time-to-first-result path).

Measures the two host stages a cold search pays before the first scan:
  1. pack_db_to_store — raw DB -> disk-backed position-major tile store
     (the reference analog is the length-partitioned batch copy planner,
     /root/reference/src/dbdata.cpp:46-65 + dbbatching.cuh; here packing
     is a one-time cost cached next to the DB).
  2. pack5 sidecar build — tiles -> 5-bit/b21 transfer words for
     streaming mode (ops/pack5.py).

Pure CPU (no TPU needed).  Usage:
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
        DBBENCH_CACHE=/tmp/dbcache python tools/packbench.py [n_seqs]

Run on an otherwise idle host — this box has one core and timings are
meaningless under contention.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from dbbench import make_sprotlike_db

    from cudasw4_tpu.db.packing import pack_db_to_store

    db = make_sprotlike_db(n)
    residues = int(db.lengths.sum())
    print(f"db: {n} seqs, {residues/1e9:.2f}G residues")

    store = tempfile.mkdtemp(prefix="packbench_")
    try:
        t0 = time.perf_counter()
        packed = pack_db_to_store(db, os.path.join(store, "tiles"))
        t1 = time.perf_counter()
        padded = packed.total_padded_chars
        print(
            f"pack_db_to_store: {t1-t0:.1f}s  "
            f"{padded/(t1-t0)/1e6:.0f} MB/s padded out, "
            f"{residues/(t1-t0)/1e6:.0f} MB/s residues in"
        )
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
