"""Generate a protocol-equivalent benchmark query set.

The reference benchmarks all use its ``allqueries.fasta``: 20 real UniProt
queries with lengths 144..5478 (/root/reference/runpeakbenchmark.sh:21,
Readme.md:122-141).  We do not copy that file; this script generates 20
deterministic pseudo-random protein sequences with the same length ladder,
which is equivalent for throughput (GCUPS) measurement.  For score-parity
testing against the reference, point --query at the reference's own
allqueries.fasta instead.

Usage: python benchmarks/make_queries.py [out.fasta]
"""

import sys

import numpy as np

#: Query lengths of the reference benchmark set (allqueries.fasta).
QUERY_LENGTHS = [
    144, 189, 222, 375, 464, 567, 657, 729, 850, 1000,
    1500, 2005, 2504, 3005, 3564, 4061, 4548, 4743, 5147, 5478,
]

AAS = "ARNDCQEGHILKMFPSTWYV"


def make_queries_fasta(path: str, seed: int = 42) -> None:
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        for i, ln in enumerate(QUERY_LENGTHS):
            seq = "".join(AAS[c] for c in rng.integers(0, 20, ln))
            f.write(f">benchquery{i} length {ln}\n")
            for s in range(0, ln, 80):
                f.write(seq[s : s + 80] + "\n")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "allqueries.fasta"
    make_queries_fasta(out)
    print(f"wrote {out}")
