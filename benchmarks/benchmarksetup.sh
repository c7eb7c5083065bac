#!/bin/bash
# Download a UniProt database and build the packed DB, mirroring
# /root/reference/benchmarksetup.sh.  On air-gapped hosts the download
# fails; set SYNTH_FALLBACK=1 (or pass a preset via SYNTH_PRESET) to
# degrade gracefully to a length-distribution-realistic synthetic DB
# (benchmarks/make_synthetic_db.py) so the pipeline still rehearses
# end-to-end.  Scores from a synthetic DB are NOT comparable to real
# data — parity (docs/PARITY.md, tools/tsvcompare.py) still requires
# the real download.
# args: dbfolder dbsrcurl dbsrcfilename dbsrcfullpath dbprefix [preset]
set -e

DBFOLDER=$1
DBSRCURL=$2
DBSRCFILENAME=$3
DBSRCFULLPATH=$4
DBPREFIX=$5
PRESET=${6:-${SYNTH_PRESET:-sprot}}

mkdir -p "$DBFOLDER"

if [ ! -f "$DBSRCFULLPATH" ]; then
    echo "downloading $DBSRCURL"
    if ! wget -O "$DBSRCFULLPATH" "$DBSRCURL"; then
        rm -f "$DBSRCFULLPATH"
        if [ "${SYNTH_FALLBACK:-0}" = "1" ]; then
            SYNTH_PATH=${DBSRCFULLPATH%.gz}
            SYNTH_PATH=${SYNTH_PATH%.fasta}.synthetic.fasta
            echo "download failed; generating synthetic $PRESET stand-in"
            echo "at $SYNTH_PATH (set SYNTH_SCALE to shrink)"
            python benchmarks/make_synthetic_db.py "$SYNTH_PATH" \
                --preset "$PRESET" --scale "${SYNTH_SCALE:-1}"
            DBSRCFULLPATH=$SYNTH_PATH
        else
            echo "download failed (no network?).  Re-run with"
            echo "SYNTH_FALLBACK=1 for an offline synthetic stand-in."
            exit 1
        fi
    fi
fi

if [ ! -f "${DBPREFIX}0chars" ]; then
    echo "building db $DBPREFIX"
    python -m cudasw4_tpu.cli.makedb "$DBSRCFULLPATH" "$DBPREFIX"
fi
