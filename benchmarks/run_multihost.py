"""Multi-host (pod slice) search example/launcher.

The reference is single-node (CUDA peer access only); this framework
scales across hosts with jax.distributed: every process loads the same
database, the engine shards its tiles over the global mesh, and the
per-shard top-k merge rides ICI within hosts and DCN across them
(SURVEY.md par.2.7's TPU-native design).

Run ONE process per host, e.g. on a v5e-16 (4 hosts):
    python benchmarks/run_multihost.py --db path/db --query q.fa \
        --coordinator host0:8476 --num-processes 4 --process-id $ID

On GCP TPU VMs the coordinator/process arguments are auto-discovered;
just run the same command on every worker without them.
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", required=True)
    ap.add_argument("--query", required=True)
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--coordinator")
    ap.add_argument("--num-processes", type=int)
    ap.add_argument("--process-id", type=int)
    args = ap.parse_args()

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from cudasw4_tpu.db.fasta import read_sequences
    from cudasw4_tpu.db.format import load_db
    from cudasw4_tpu.engine import SearchEngine
    from cudasw4_tpu.parallel.multihost import (
        global_mesh,
        initialize,
        is_primary,
    )

    initialize(
        coordinator=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    engine = SearchEngine(num_top=args.top, mesh=global_mesh())
    engine.set_database(load_db(args.db))

    records = list(read_sequences(args.query))
    engine.total_timer_start()
    for rec, res in zip(records, engine.scan_many(r.sequence for r in records)):
        if is_primary():
            print(f"# {rec.header}")
            for i, (score, ref) in enumerate(
                zip(res.scores, res.reference_ids)
            ):
                print(
                    f"{i}\t{score}\t{engine.get_reference_length(ref)}\t"
                    f"{engine.get_reference_header(ref)}\t{ref}"
                )
    total = engine.total_timer_stop()
    if is_primary():
        print(f"Total {total.seconds:.3f}s {total.gcups:.2f} GCUPS")


if __name__ == "__main__":
    main()
