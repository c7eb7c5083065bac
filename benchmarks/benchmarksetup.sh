#!/bin/bash
# Download a UniProt database and build the packed DB, mirroring
# /root/reference/benchmarksetup.sh.
# args: dbfolder dbsrcurl dbsrcfilename dbsrcfullpath dbprefix
set -e

DBFOLDER=$1
DBSRCURL=$2
DBSRCFILENAME=$3
DBSRCFULLPATH=$4
DBPREFIX=$5

mkdir -p "$DBFOLDER"

if [ ! -f "$DBSRCFULLPATH" ]; then
    echo "downloading $DBSRCURL"
    wget -O "$DBSRCFULLPATH" "$DBSRCURL"
fi

if [ ! -f "${DBPREFIX}0chars" ]; then
    echo "building db $DBPREFIX"
    python -m cudasw4_tpu.cli.makedb "$DBSRCFULLPATH" "$DBPREFIX"
fi
