"""``modifydb`` — in-place database migrations (CLI).

Operations mirror the reference tool (/root/reference/src/modifydb.cpp):

* ``convertcharstonumber1`` — rewrite a chars file holding raw ASCII amino
  acids into encoded 0..20 codes (in place).
* ``lengthsToI32`` / ``lengthsToI64`` — rewrite the lengths file with a
  different integer width into ``<prefix>0lengths_i32`` / ``_i64``.

Plus one TPU-native addition:

* ``verify`` — validate file consistency (offsets monotone, lengths sorted,
  metadata histogram matches), the equivalent of the reference's internal
  assertValidPartitioning (/root/reference/src/dbdata.cpp:296-342).
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..constants import ENCODE_TABLE
from ..db.format import load_db, partition_histogram

USAGE = "Usage:\n  modifydb operation dbprefix\nOperations: convertcharstonumber1, lengthsToI32, lengthsToI64, verify\n"


def run(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 2:
        print(USAGE)
        return 0
    operation, prefix = argv[0], argv[1]

    if operation == "convertcharstonumber1":
        t0 = time.perf_counter()
        path = prefix + "0chars"
        data = np.memmap(path, dtype=np.uint8, mode="r+")
        chunk = 64 << 20
        for i in range(0, len(data), chunk):
            data[i : i + chunk] = ENCODE_TABLE.view(np.uint8)[data[i : i + chunk]]
        data.flush()
        print(f"# elapsed time (convertcharstonumber1): {time.perf_counter()-t0:.6g}s")
    elif operation in ("lengthsToI32", "lengthsToI64"):
        db = load_db(prefix)
        dtype = np.int32 if operation == "lengthsToI32" else np.int64
        suffix = "_i32" if operation == "lengthsToI32" else "_i64"
        lengths = np.asarray(db.lengths, dtype=np.int64)
        if operation == "lengthsToI32":
            assert lengths.max(initial=0) < 2**31 - 1
        lengths.astype(dtype).tofile(prefix + "0lengths" + suffix)
        print(f"wrote {prefix}0lengths{suffix}")
    elif operation == "verify":
        db = load_db(prefix)
        errors = []
        offs = np.asarray(db.offsets, dtype=np.int64)
        lens = np.asarray(db.lengths, dtype=np.int64)
        if not np.all(np.diff(offs) > 0):
            errors.append("offsets not strictly increasing")
        if not np.all(lens[1:] >= lens[:-1]):
            errors.append("lengths not sorted ascending")
        if not np.all(np.diff(offs) >= lens):
            errors.append("padded extents smaller than lengths")
        if int(offs[-1]) != db.num_padded_chars:
            errors.append("final offset != chars file size")
        if db.num_padded_chars and (
            np.asarray(db.chars).min() < 0 or np.asarray(db.chars).max() > 20
        ):
            errors.append("chars outside encoded range 0..20 (raw ASCII db? "
                          "run convertcharstonumber1)")
        meta_path = prefix + "0metadata"
        try:
            raw = open(meta_path, "rb").read()
            n = np.frombuffer(raw[:4], dtype=np.int32)[0]
            counts = np.frombuffer(raw[4 + 4 * n :], dtype=np.uint64)
            if counts.sum() != db.num_sequences:
                errors.append("metadata histogram total != numSequences")
            expect = partition_histogram(lens)
            if len(counts) == len(expect) and not np.array_equal(counts, expect):
                errors.append("metadata histogram differs from recomputed")
        except OSError:
            errors.append("missing chunk metadata file")
        if errors:
            for e in errors:
                print(f"INVALID: {e}")
            return 1
        print(
            f"OK: {db.num_sequences} sequences, {db.num_chars} residues, "
            f"max length {int(lens.max(initial=0))}"
        )
    else:
        print(f"Unknown operation {operation}")
        print(USAGE)
        return 1
    return 0


def main():
    raise SystemExit(run())


if __name__ == "__main__":
    main()
