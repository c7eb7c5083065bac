"""Generate the golden parity fixtures (tests/fixtures/).

Writes a deterministic mini database FASTA (with deliberate duplicate
sequences so equal scores exercise the tie rule), a query FASTA, and the
expected top-10 TSV computed with the *scalar oracle* — independent of
the engine — under the engine-wide tie rule: descending score, then
ascending reference id (docs/PARITY.md).  tests/test_golden_tsv.py
asserts the align CLI reproduces this TSV byte-for-byte.

Usage: python tools/make_golden.py
"""

import os

import numpy as np

AAS = "ARNDCQEGHILKMFPSTWYV"
FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")


def main():
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from cudasw4_tpu import encode, make_scoring_config
    from cudasw4_tpu.ops.oracle import sw_score_scalar

    os.makedirs(FIXDIR, exist_ok=True)
    rng = np.random.default_rng(20240817)

    seqs = []
    for i in range(28):
        ln = int(rng.integers(8, 120))
        seqs.append("".join(AAS[c] for c in rng.integers(0, 20, ln)))
    # Duplicates -> guaranteed equal scores (tie-rule coverage).
    seqs[10] = seqs[3]
    seqs[17] = seqs[3]
    seqs[21] = seqs[8]
    # One sequence with ambiguity codes (encode to 20).
    seqs[5] = seqs[5][:4] + "BXZ" + seqs[5][4:]
    recs = [(f"gold{i} fixture", s) for i, s in enumerate(seqs)]

    with open(os.path.join(FIXDIR, "golden_db.fa"), "w") as f:
        for h, s in recs:
            f.write(f">{h}\n{s}\n")

    queries = [
        ("q0 short", "".join(AAS[c] for c in rng.integers(0, 20, 24))),
        ("q1 exact-dup", seqs[3]),  # hits three identical references
        ("q2 medium", "".join(AAS[c] for c in rng.integers(0, 20, 61))),
        ("q3 ambig", "ARNDBXWWYV" * 3),
    ]
    with open(os.path.join(FIXDIR, "golden_queries.fa"), "w") as f:
        for h, s in queries:
            f.write(f">{h}\n{s}\n")

    # The DB on disk is length-sorted (stable): compute the sorted order
    # exactly as makedb does.
    lengths = np.array([len(s) for s in seqs])
    order = np.argsort(lengths, kind="stable")
    sorted_recs = [recs[i] for i in order]

    # Classic 21-letter mode and full-blosum mode (25-dim tables; like
    # the reference's CAN_USE_FULL_BLOSUM build, sequences still encode
    # through ConvertAA_20 so every ambiguity code scores as 'B').
    for mat, fname in (
        ("blosum62", "golden_top10.tsv"),
        ("blosum62_full", "golden_top10_full.tsv"),
    ):
        cfg = make_scoring_config(mat)
        lines = [
            "Query number\tQuery length\tQuery header\tResult number\t"
            "Result score\tReference length\tReference header\t"
            "Reference ID in DB\n"
        ]
        for qid, (qh, qs) in enumerate(queries):
            qc = encode(qs)
            scores = [
                sw_score_scalar(qc, encode(s), cfg.matrix, cfg.gop, cfg.gex)
                for _, s in sorted_recs
            ]
            idx = np.lexsort(
                (np.arange(len(scores)), -np.asarray(scores))
            )[:10]
            for rank, ri in enumerate(idx):
                rh, rs = sorted_recs[ri]
                lines.append(
                    f"{qid}\t{len(qs)}\t{qh}\t{rank}\t{scores[ri]}\t"
                    f"{len(rs)}\t{rh}\t{ri}\n"
                )
        with open(os.path.join(FIXDIR, fname), "w") as f:
            f.writelines(lines)
    print(f"wrote fixtures to {FIXDIR}")


if __name__ == "__main__":
    main()
