#!/bin/bash
# Peak-performance benchmark: pseudo databases of 1M identical-length
# sequences x the reference's 20-query set, --top 0 (no output cost).
# Mirrors /root/reference/runpeakbenchmark.sh (kernel-type selection is
# not needed: the TPU engine has a single exact int32 path and picks the
# kernel per bucket automatically).
set -e
cd "$(dirname "$0")/.."

QUERIES=${QUERIES:-benchmarks/allqueries.fasta}
PSEUDOSIZE=${PSEUDOSIZE:-1000000}
OUTDIR=${OUTDIR:-benchmarks/results}
mkdir -p "$OUTDIR"

[ -f "$QUERIES" ] || python benchmarks/make_queries.py "$QUERIES"

for pseudolength in 128 256 512 768 1024 2048; do
    echo "run pseudo $pseudolength"
    python -m cudasw4_tpu.cli.align \
        --query "$QUERIES" --top 0 --verbose --uploadFull --mat blosum62 \
        --pseudodb "$PSEUDOSIZE" "$pseudolength" \
        > "$OUTDIR/results_pseudo_${PSEUDOSIZE}_${pseudolength}.txt" 2>&1
    grep "Total time" "$OUTDIR/results_pseudo_${PSEUDOSIZE}_${pseudolength}.txt" || true
done
