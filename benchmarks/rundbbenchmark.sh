#!/bin/bash
# Real-database benchmarks: sprot / uniref50 / trembl, mirroring
# /root/reference/run{sprot,uniref50,trembl}benchmark.sh.
# Usage: benchmarks/rundbbenchmark.sh [sprot|uniref50|trembl]
set -e
cd "$(dirname "$0")/.."

NAME=${1:-sprot}
case "$NAME" in
  sprot)
    DBSRCURL=https://ftp.expasy.org/databases/uniprot/current_release/knowledgebase/complete/uniprot_sprot.fasta.gz ;;
  uniref50)
    DBSRCURL=https://ftp.uniprot.org/pub/databases/uniprot/uniref/uniref50/uniref50.fasta.gz ;;
  trembl)
    DBSRCURL=https://ftp.expasy.org/databases/uniprot/current_release/knowledgebase/complete/uniprot_trembl.fasta.gz ;;
  *) echo "unknown db $NAME"; exit 1 ;;
esac

DBFOLDER=${DBFOLDER:-benchmarks/benchmarkdbs}
DBSRCFILENAME=$(basename "$DBSRCURL")
DBSRCFULLPATH=$DBFOLDER/$DBSRCFILENAME
DBPREFIX=$DBFOLDER/${NAME}_db
QUERIES=${QUERIES:-benchmarks/allqueries.fasta}
OUTDIR=${OUTDIR:-benchmarks/results}
mkdir -p "$OUTDIR"

[ -f "$QUERIES" ] || python benchmarks/make_queries.py "$QUERIES"
benchmarks/benchmarksetup.sh "$DBFOLDER" "$DBSRCURL" "$DBSRCFILENAME" "$DBSRCFULLPATH" "$DBPREFIX" "$NAME"

python -m cudasw4_tpu.cli.align \
    --query "$QUERIES" --db "$DBPREFIX" --top 0 --verbose --uploadFull \
    --prefetchDBFile --mat blosum62 \
    > "$OUTDIR/results_${NAME}.txt" 2>&1
grep "Total time" "$OUTDIR/results_${NAME}.txt" || true

# One-command real-data parity (BASELINE.md acceptance bar): with
# REF_TSV pointing at a CUDASW++ 4.0 TSV of the same db + queries
# (reference: ./align ... --tsv, main.cu:62-87), re-run top-10 in TSV
# mode and tie-group-compare (tools/tsvcompare.py).
if [ -n "${REF_TSV:-}" ]; then
    python -m cudasw4_tpu.cli.align \
        --query "$QUERIES" --db "$DBPREFIX" --top 10 --tsv \
        --of "$OUTDIR/tsv_${NAME}.tsv" --mat blosum62 \
        > /dev/null 2>&1
    python tools/tsvcompare.py "$REF_TSV" "$OUTDIR/tsv_${NAME}.tsv"
fi
