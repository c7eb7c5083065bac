"""``makedb`` — build a packed database from FASTA/FASTQ (CLI).

Argument surface matches the reference makedb
(/root/reference/src/makedb.cpp:279-374): input file, output prefix,
optional --mem limit and --tempdir: under a --mem cap the builder
spills batches to temp files and concatenates (db/format.py
make_db_capped), byte-identical to the unbounded path.

Beyond the reference: --prepack builds the TPU tile store at db-build
time (and, with --prepackStream <budget>, the streaming transfer-pack
sidecar inline), moving the one-time pack cost out of the first align
run.
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
    --prepack : Also build the TPU tile store now (one slab of RAM),
        so the first align run loads instead of packing.
    --prepackStream val : With --prepack, per-chip device-memory budget
        (suffix K,M,G).  If the packed DB exceeds it, the streaming
        transfer-pack sidecar is built inline in the same pass.
"""


def run(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(USAGE)
        return 0
    input_path, prefix = argv[0], argv[1]
    mem = None
    tempdir = None
    prepack = False
    prepack_budget = None
    i = 2
    while i < len(argv):
        takes_value = argv[i] in ("--mem", "--tempdir", "--prepackStream")
        if takes_value and i + 1 >= len(argv):
            print(f"Missing value for {argv[i]}")
            print(USAGE)
            return 1
        if argv[i] == "--mem":
            i += 1
            mem = parse_memory_string(argv[i])
        elif argv[i] == "--tempdir":
            i += 1
            tempdir = argv[i]
        elif argv[i] == "--prepack":
            prepack = True
        elif argv[i] == "--prepackStream":
            i += 1
            prepack = True
            prepack_budget = parse_memory_string(argv[i])
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

    if prepack:
        # Same tile-store path align derives from the db prefix, so the
        # first align run validates and loads instead of packing.
        import os

        import numpy as np

        from ..constants import UNKNOWN
        from ..db.format import load_db
        from ..db.packing import (
            _packed_layout,
            pack_db_to_store,
            plan_buckets,
            stream_manifest,
            stream_sidecar_fresh,
        )

        t0 = time.perf_counter()
        db = load_db(prefix)
        store_path = prefix + "0.tpupack.npz"
        stream_codec = None
        if prepack_budget is not None:
            plans = plan_buckets(np.asarray(db.lengths, np.int64))
            padded = sum(
                (-(-(stop - start) // NS)) * L * NS
                for start, stop, L, NS, _ in plans
            )
            if padded > prepack_budget:
                from ..ops.pack5 import choose_codec

                # One source of truth for the padding code: the same
                # UNKNOWN passed to pack_db_to_store below (codec choice
                # must see the pad the manifest will record).
                stream_codec = choose_codec(
                    os.environ.get("CUDASW4_TPU_STREAM_PACK", "1"),
                    int(UNKNOWN),
                )
        store = pack_db_to_store(
            db, store_path, pad_code=UNKNOWN, stream_codec=stream_codec
        )
        dt = time.perf_counter() - t0
        # Report the sidecar only when it actually exists and validates
        # (the build is best-effort; a matching prior store may also have
        # satisfied the request via build_stream_sidecar).
        wrote_sidecar = stream_codec is not None and stream_sidecar_fresh(
            store_path,
            stream_manifest(
                stream_codec, int(UNKNOWN), store.num_sequences,
                store.total_real_chars, _packed_layout(store),
            ),
        )
        extra = " + transfer sidecar" if wrote_sidecar else ""
        print(f"TIMING: tile store{extra}: {dt:.6g} s")
        if stream_codec is not None and not wrote_sidecar:
            print("NOTE: transfer sidecar was not written (directory "
                  "not writable?); the first streaming align will build "
                  "it lazily")
    return 0


def main():
    raise SystemExit(run())


if __name__ == "__main__":
    main()
