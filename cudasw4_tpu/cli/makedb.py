"""``makedb`` — build a packed database from FASTA/FASTQ (CLI).

Argument surface matches the reference makedb
(/root/reference/src/makedb.cpp:279-374): input file, output prefix,
optional --mem limit and --tempdir: under a --mem cap the builder
spills batches to temp files and concatenates (db/format.py
make_db_capped), byte-identical to the unbounded path.
"""

from __future__ import annotations

import sys
import time

from ..db.format import make_db
from .align import parse_memory_string

USAGE = """Usage:
  makedb <FASTA/FASTQ filename> pathtodb/dbname [options]
Input file may be gzip'ed. pathtodb must exist.
Options:
    --mem val : Memory limit. Can use suffix K,M,G.
    --tempdir val : Temp directory for temporary files. Must exist.
"""


def run(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(USAGE)
        return 0
    input_path, prefix = argv[0], argv[1]
    mem = None
    tempdir = None
    i = 2
    while i < len(argv):
        if argv[i] == "--mem":
            i += 1
            mem = parse_memory_string(argv[i])
        elif argv[i] == "--tempdir":
            i += 1
            tempdir = argv[i]
        else:
            print(f"Unexpected arg {argv[i]}")
        i += 1

    print("Parsing file")
    t0 = time.perf_counter()
    if mem is not None:
        # Memory-capped: spill encoded bytes to temp files while parsing
        # (the reference's FileBackedUVector mechanism).
        from ..db.format import make_db_capped

        stats = make_db_capped(
            input_path, prefix, mem, tempdir=tempdir,
            progress_every=1_000_000,
        )
    else:
        stats = make_db(input_path, prefix, progress_every=1_000_000)
    dt = time.perf_counter() - t0
    print(f"Number of input sequences:  {stats['num_sequences']}")
    print(f"Number of input characters: {stats['num_chars']}")
    print(f"TIMING: db creation: {dt:.6g} s")
    return 0


def main():
    raise SystemExit(run())


if __name__ == "__main__":
    main()
