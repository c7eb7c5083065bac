"""The real-data parity kit, CI-runnable without network.

BASELINE.md's acceptance bar is bit-exact top-N TSV parity against
CUDASW++ 4.0 on uniprot_sprot; the download needs network, but the
comparison tool (tools/tsvcompare.py) must be proven against a
known-good oracle TSV meanwhile: this test drives the full pipeline —
makedb -> align --tsv -> tsvcompare vs an oracle-generated TSV whose
tie groups are deliberately permuted the way the reference's unstable
thrust sort would (/root/reference/src/cudasw4.cuh:1362-1401) — and
checks that real mismatches are still caught.
"""

import subprocess
import sys

import numpy as np
import pytest

from cudasw4_tpu.constants import encode
from cudasw4_tpu.ops.oracle import sw_score_rowvec
from cudasw4_tpu.substitution import make_scoring_config

sys.path.insert(0, "tools")
import tsvcompare  # noqa: E402

AAS = "ARNDCQEGHILKMFPSTWYV"


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    """makedb + align --tsv over a tie-rich DB; returns (ours_tsv_path,
    oracle rows {q: [(score, rid, rlen, hdr)...]}, tmpdir)."""
    tmp = tmp_path_factory.mktemp("tsvparity")
    rng = np.random.default_rng(11)
    # Duplicated sequences guarantee score ties across distinct ids.
    base = [
        "".join(AAS[c] for c in rng.integers(0, 20, int(n)))
        for n in rng.integers(20, 120, 12)
    ]
    seqs = base + base[:6]  # 18 sequences, 6 duplicate pairs
    db_fa = tmp / "db.fa"
    db_fa.write_text(
        "".join(f">s{i}\n{s}\n" for i, s in enumerate(seqs))
    )
    queries = [
        "".join(AAS[c] for c in rng.integers(0, 20, int(n)))
        for n in (30, 55)
    ]
    q_fa = tmp / "q.fa"
    q_fa.write_text(
        "".join(f">q{i}\n{s}\n" for i, s in enumerate(queries))
    )
    prefix = str(tmp / "db")
    k = 8

    subprocess.run(
        [sys.executable, "-m", "cudasw4_tpu.cli.makedb", str(db_fa),
         prefix],
        check=True, capture_output=True,
    )
    ours = subprocess.run(
        [sys.executable, "-m", "cudasw4_tpu.cli.align", "--query",
         str(q_fa), "--db", prefix, "--top", str(k), "--tsv", "--of",
         str(tmp / "ours.tsv")],
        check=True, capture_output=True, text=True,
    )
    ours_tsv = tmp / "ours.tsv"
    if not ours_tsv.exists():  # --of semantics: TSV on stdout otherwise
        ours_tsv.write_text(ours.stdout)

    # Oracle top-k per query over the length-sorted DB (makedb order =
    # reference id order: stable sort by length).
    cfg = make_scoring_config("blosum62")
    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    sorted_seqs = [seqs[i] for i in order]
    subs = np.full((len(seqs), max(len(s) for s in seqs)), 20, np.int8)
    for i, s in enumerate(sorted_seqs):
        subs[i, : len(s)] = encode(s)
    oracle = {}
    for qi, q in enumerate(queries):
        scores = sw_score_rowvec(
            encode(q), subs, cfg.matrix, cfg.gop, cfg.gex
        )
        rows = sorted(
            ((int(scores[i]), i, len(sorted_seqs[i]), f"s{order[i]}")
             for i in range(len(seqs))),
            key=lambda r: (-r[0], r[1]),
        )[:k]
        oracle[qi] = rows
    return ours_tsv, oracle, tmp, queries


def write_ref_tsv(path, oracle, queries, permute_ties=True, seed=3):
    """Write a reference-format TSV (main.cu:62-87 column layout),
    optionally permuting rows inside each tie group like thrust's
    unstable sort would."""
    rng = np.random.default_rng(seed)
    with open(path, "w") as f:
        f.write(
            "Query number\tQuery length\tQuery header\tResult number"
            "\tResult score\tReference length\tReference header"
            "\tReference ID in DB\n"
        )
        for qi, rows in oracle.items():
            out_rows = []
            i = 0
            while i < len(rows):
                j = i
                while j < len(rows) and rows[j][0] == rows[i][0]:
                    j += 1
                group = rows[i:j]
                if permute_ties and len(group) > 1:
                    group = [group[p] for p in rng.permutation(len(group))]
                out_rows.extend(group)
                i = j
            for rank, (score, rid, rlen, hdr) in enumerate(out_rows):
                f.write(
                    f"{qi}\t{len(queries[qi])}\tq{qi}\t{rank}\t{score}"
                    f"\t{rlen}\t{hdr}\t{rid}\n"
                )


def test_parity_against_oracle_tsv(pipeline):
    """align's TSV passes tie-group parity against an oracle TSV with
    permuted tie rows (the unstable-sort simulation)."""
    ours_tsv, oracle, tmp, queries = pipeline
    ref_tsv = tmp / "ref.tsv"
    write_ref_tsv(ref_tsv, oracle, queries)
    ok, errors, nq = tsvcompare.compare(str(ref_tsv), str(ours_tsv))
    assert ok, errors
    assert nq == len(queries)
    assert tsvcompare.main([str(ref_tsv), str(ours_tsv)]) == 0


def test_parity_catches_score_mismatch(pipeline):
    """A single corrupted score fails the comparison with exit 1."""
    ours_tsv, oracle, tmp, queries = pipeline
    bad = {
        qi: [
            (s + (7 if qi == 0 and rank == 2 else 0), rid, rlen, hdr)
            for rank, (s, rid, rlen, hdr) in enumerate(rows)
        ]
        for qi, rows in oracle.items()
    }
    ref_tsv = tmp / "bad.tsv"
    write_ref_tsv(ref_tsv, bad, queries, permute_ties=False)
    ok, errors, _ = tsvcompare.compare(str(ref_tsv), str(ours_tsv))
    assert not ok
    assert any("score mismatch" in e for e in errors)
    assert tsvcompare.main([str(ref_tsv), str(ours_tsv)]) == 1


def test_parity_catches_wrong_tie_member(pipeline):
    """A non-tail tie group with a different id set fails (strict id-set
    comparison everywhere except the truncated tail group)."""
    ours_tsv, oracle, tmp, queries = pipeline
    rows0 = list(oracle[0])
    # Corrupt an id inside the FIRST tie group only if it is not also
    # the tail group (needs >= 2 groups).
    from collections import Counter

    scores = [r[0] for r in rows0]
    if len(set(scores)) < 2:
        pytest.skip("fixture produced a single tie group")
    first_score = scores[0]
    bad_rows = [
        (s, rid + 1000 if s == first_score and i == 0 else rid, rlen, hdr)
        for i, (s, rid, rlen, hdr) in enumerate(rows0)
    ]
    bad = dict(oracle)
    bad[0] = bad_rows
    ref_tsv = tmp / "badid.tsv"
    write_ref_tsv(ref_tsv, bad, queries, permute_ties=False)
    ok, errors, _ = tsvcompare.compare(str(ref_tsv), str(ours_tsv))
    assert not ok
    assert any("id sets differ" in e for e in errors), errors
