"""Tie-group TSV parity comparison: cudasw4_tpu vs CUDASW++ 4.0.

The acceptance bar (BASELINE.md) is bit-exact top-N scores against the
reference on real data.  Raw line order is NOT the right comparison:
CUDASW4 sorts candidates with thrust ``sort_by_key`` (unstable) before
merging (/root/reference/src/cudasw4.cuh:1362-1401), so equal-score rows
may permute relative to our deterministic descending-score/ascending-id
order (docs/PARITY.md, tie-breaking rule).  This tool therefore compares
per query:

* the ordered score multiset (must match exactly), and
* per tie group (rows sharing a score), the (reference id) SET — except
  the final, truncated-at-top-N tie group, where the two sides may
  legitimately keep different members of the same equal-score family
  (the reference's unstable sort picks arbitrarily); there only the
  score and the row count must agree unless ``--strict-tail`` is given.

Reference lengths are also cross-checked per id when both sides carry
the id (columns per the reference TSV writer,
/root/reference/src/main.cu:62-87, byte-matched by cli/align.py).

Usage:
    python tools/tsvcompare.py REFERENCE.tsv OURS.tsv [--strict-tail]

Exit status 0 = parity, 1 = mismatch (report on stdout), 2 = bad input.
"""

from __future__ import annotations

import sys
from collections import defaultdict

#: Column indices in the reference TSV (main.cu:62-87).
Q_NUM, Q_LEN, Q_HDR, R_NUM, R_SCORE, R_LEN, R_HDR, R_ID = range(8)


def parse_tsv(path: str):
    """-> {query_number: [(score, ref_id, ref_len, ref_header), ...]} in
    file order.  The header line (if present) is skipped."""
    queries: dict[int, list] = defaultdict(list)
    with open(path) as f:
        for ln, line in enumerate(f):
            line = line.rstrip("\n")
            if not line:
                continue
            cols = line.split("\t")
            if ln == 0 and cols and cols[0].strip().lower() == "query number":
                continue
            if len(cols) < 8:
                raise ValueError(
                    f"{path}:{ln + 1}: expected 8 tab-separated columns, "
                    f"got {len(cols)}"
                )
            queries[int(cols[Q_NUM])].append(
                (int(cols[R_SCORE]), int(cols[R_ID]), int(cols[R_LEN]),
                 cols[R_HDR])
            )
    return dict(queries)


def tie_groups(rows):
    """Split score-descending rows into [(score, [(id, len, hdr)...])]."""
    out: list[tuple[int, list]] = []
    for score, rid, rlen, rhdr in rows:
        if not out or out[-1][0] != score:
            out.append((score, []))
        out[-1][1].append((rid, rlen, rhdr))
    return out


def compare_query(q: int, ref_rows, our_rows, strict_tail: bool,
                  errors: list) -> None:
    if [r[0] for r in ref_rows] != [r[0] for r in our_rows]:
        # Ordered score lists differ; report the first divergence.
        rs, os_ = [r[0] for r in ref_rows], [r[0] for r in our_rows]
        if len(rs) != len(os_):
            errors.append(
                f"query {q}: result count differs "
                f"(ref {len(rs)} vs ours {len(os_)})"
            )
            return
        i = next(i for i, (a, b) in enumerate(zip(rs, os_)) if a != b)
        errors.append(
            f"query {q}: score mismatch at rank {i}: "
            f"ref {rs[i]} vs ours {os_[i]}"
        )
        return
    gref = tie_groups(ref_rows)
    gours = tie_groups(our_rows)
    for gi, ((score, mref), (_score2, mours)) in enumerate(
        zip(gref, gours)
    ):
        tail = gi == len(gref) - 1
        ids_ref = {m[0] for m in mref}
        ids_ours = {m[0] for m in mours}
        if ids_ref != ids_ours:
            if tail and not strict_tail:
                # Truncated tie family: unstable reference sort may keep
                # different equal-score members.  Scores + counts already
                # matched; accept.
                continue
            missing = sorted(ids_ref - ids_ours)[:5]
            extra = sorted(ids_ours - ids_ref)[:5]
            errors.append(
                f"query {q}: tie group score={score}: id sets differ "
                f"(ref-only {missing}, ours-only {extra})"
            )
            continue
        # Same ids: lengths (and headers when both non-empty) must agree.
        dref = {m[0]: m[1:] for m in mref}
        for rid, rlen, rhdr in mours:
            wlen, whdr = dref[rid]
            if rlen != wlen:
                errors.append(
                    f"query {q}: refId {rid}: length differs "
                    f"(ref {wlen} vs ours {rlen})"
                )
            elif whdr and rhdr and whdr != rhdr:
                errors.append(
                    f"query {q}: refId {rid}: header differs "
                    f"({whdr!r} vs {rhdr!r})"
                )


def compare(ref_path: str, ours_path: str, strict_tail: bool = False):
    """-> (ok, errors, num_queries)"""
    ref = parse_tsv(ref_path)
    ours = parse_tsv(ours_path)
    errors: list[str] = []
    if set(ref) != set(ours):
        errors.append(
            f"query sets differ: ref-only {sorted(set(ref) - set(ours))}, "
            f"ours-only {sorted(set(ours) - set(ref))}"
        )
        return False, errors, 0
    for q in sorted(ref):
        compare_query(q, ref[q], ours[q], strict_tail, errors)
    return not errors, errors, len(ref)


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    strict = "--strict-tail" in argv
    paths = [a for a in argv if not a.startswith("--")]
    if len(paths) != 2:
        print(__doc__)
        return 2
    try:
        ok, errors, nq = compare(paths[0], paths[1], strict_tail=strict)
    except (OSError, ValueError) as e:
        print(f"ERROR: {e}")
        return 2
    if ok:
        print(f"PARITY OK: {nq} queries, tie-group score/id sets match")
        return 0
    print(f"PARITY FAILED: {len(errors)} mismatches")
    for e in errors[:50]:
        print("  " + e)
    if len(errors) > 50:
        print(f"  ... and {len(errors) - 50} more")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
