"""A/B the packed resident upload (CUDASW4_TPU_RESIDENT_PACK).

Times SearchEngine.set_database + first scan for a resident pseudo DB
with the tile transfer raw vs packed (b32/b21).  The packed path ships
1.5-1.75x fewer host->HBM bytes and unpacks in a jitted prologue on
device — on a network-attached runtime the transfer is most of
set_database's wall time for multi-GB DBs (docs/PERFORMANCE.md).

Run on an exclusive chip:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/setdbbench.py [nseq] [L]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np  # noqa: E402

NSEQ = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
L = int(sys.argv[2]) if len(sys.argv) > 2 else 256
REPS = int(os.environ.get("BENCH_REPS", "2"))

from cudasw4_tpu.db.format import pseudo_to_dbdata  # noqa: E402
from cudasw4_tpu.db.pseudo import make_pseudo_db  # noqa: E402

db = pseudo_to_dbdata(make_pseudo_db(NSEQ, L))
tile_bytes = NSEQ * (-(-L // 16) * 16)
print(f"setdb bench: {NSEQ} x {L} (~{tile_bytes/2**20:.0f} MiB tiles), "
      f"{REPS} reps/mode", flush=True)

rng = np.random.default_rng(7)
query = rng.integers(0, 20, 370).astype(np.int8)

import jax  # noqa: E402

for mode in ("0", "1", "2"):
    os.environ["CUDASW4_TPU_RESIDENT_PACK"] = mode
    best = 1e9
    for _ in range(REPS):
        from cudasw4_tpu.engine import SearchEngine

        eng = SearchEngine(num_top=10)
        t0 = time.time()
        eng.set_database(db)
        assert not eng.streaming, "fixture must stay resident"
        jax.block_until_ready(eng._bucket_tiles)
        dt = time.time() - t0
        best = min(best, dt)
        print(f"  pack={mode}: set_database {dt:.2f}s", flush=True)
        r = eng.scan(query)  # sanity: same top score across modes
        print(f"    top score {r.scores[0]:.0f}", flush=True)
        del eng
    print(f"pack={mode} BEST {best:.2f}s", flush=True)
print("done")
